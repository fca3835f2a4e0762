"""Search-query compiler: ES bool-query DSL (the subset the reference webapp
emits) -> ``pyspark.sql.Column`` predicate.

The reference compiles widget state into an Elasticsearch query in
``FieldCollection.generateQuery()`` (``services/webapp/src/collections.js:
146-208``) and ships it to Kibana. The full grammar it can ever produce:

- ``{"match_all": {}}``                               (collections.js:147)
- ``{"range": {f: {"gte": lo, "lte": hi}}}``          (collections.js:158-160)
- ``{"range": {f: {"from": ms, "to": ms,
                   "format": "epoch_millis"}}}``      (collections.js:178-184)
- ``{"match": {f: value}}``                           (collections.js:175-177)
- ``{"bool": {"should": [match...],
              "minimum_should_match": 1}}``           (collections.js:161-174)
- ``{"match_phrase_prefix": {f + ".split": text}}``   (collections.js:185-191)
- ``{"query_string": {"query": "f:*" | "*"}}``        (collections.js:78-80)
- all wrapped in ``{"bool": {"must": [...]}}``        (collections.js:194-199)

We accept that grammar (plus ``must_not``/``terms`` for completeness) as a
plain JSON AST and fold it into one Column expression, which Catalyst then
pushes into the Parquet scan. Equality (`match`) is *exact* equality — the
reference's fields are ``not_analyzed`` so ES match degenerates to term
equality; the analyzed path only exists for ``.split`` fields, which we route
through the pinned phrase-prefix semantics (functions/tokenize.py).
"""

from __future__ import annotations

import datetime as _dt
import re as _re
from functools import reduce
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from harmonize_search_analyze_spark.functions.datemath import (
    is_date_math,
    parse_date_math,
)
from harmonize_search_analyze_spark.functions.tokenize import (
    phrase_predicate,
    phrase_prefix_predicate,
)

SPLIT_SUFFIX = ".split"


class QueryCompileError(ValueError):
    pass


def compile_query(
    ast: dict[str, Any] | None, *, now: _dt.datetime | None = None
) -> Column:
    """Compile an ES-DSL JSON AST to a Column predicate (AND of clauses).

    ``now`` anchors any date-math range bounds (``now-20y`` — the literal
    shape of the reference's global time filter, config.js:31-32); defaults
    to current UTC, inject a fixed value for reproducible plans.
    """
    if not ast:
        return F.lit(True)
    if len(ast) != 1:
        raise QueryCompileError(f"query node must have exactly one key: {ast}")
    (kind, body), = ast.items()
    handler = _HANDLERS.get(kind)
    if handler is None:
        raise QueryCompileError(f"unsupported query kind: {kind}")
    if handler in (_range, _bool, _dis_max, _boosting,
                   _constant_score, _wrapper):
        return handler(body, now=now)
    return handler(body)


def _match_all(_body: Any) -> Column:
    return F.lit(True)


def _match_none(_body: Any) -> Column:
    """ES ``match_none``: the empty result set (the filter-context dual
    of match_all)."""
    return F.lit(False)


def _constant_score(
    body: dict[str, Any], *, now: _dt.datetime | None = None
) -> Column:
    """ES ``constant_score``: in a filter context the boost is scoring
    metadata — the wrapped filter IS the predicate. ``now`` threads
    through so pinned date-math inside the filter stays pinned."""
    inner = body.get("filter")
    if inner is None:
        raise QueryCompileError("constant_score requires a filter clause")
    return compile_query(inner, now=now)


def _wrapper(
    body: dict[str, Any], *, now: _dt.datetime | None = None
) -> Column:
    """ES ``wrapper`` query: a base64-encoded JSON query (the wire form
    clients use to smuggle raw DSL through typed APIs) — decoded and
    compiled like any other clause (``now`` threads through)."""
    import base64 as _b64
    import json as _json

    raw = body.get("query")
    if not raw:
        raise QueryCompileError("wrapper requires a base64 query")
    try:
        decoded = _json.loads(_b64.b64decode(raw))
    except Exception as e:
        raise QueryCompileError(f"wrapper query does not decode: {e}") from e
    if not isinstance(decoded, dict):
        raise QueryCompileError("wrapper query must decode to an object")
    return compile_query(decoded, now=now)


def _range(body: dict[str, Any], *, now: _dt.datetime | None = None) -> Column:
    (field, spec), = body.items()
    col = F.col(field)
    is_epoch_millis = spec.get("format") == "epoch_millis"

    def conv(v: Any, upper: bool) -> Any:
        if is_date_math(v):
            # Kibana time-picker strings: "now-20y", "now/d", "2024-01-01||+1M"
            # (config.js:31-32). Upper bounds round UP (lte now/d = end of day).
            return F.lit(
                parse_date_math(v, now=now, round_up=upper)
            ).cast("timestamp")
        if is_epoch_millis:
            # ES datetime ranges arrive as epoch millis (collections.js:180);
            # convert to a UTC timestamp literal for the timestamp column.
            return F.lit(
                _dt.datetime.fromtimestamp(v / 1000.0, tz=_dt.timezone.utc)
            ).cast("timestamp")
        return F.lit(v)

    preds = []
    # ES range params: gte/lte/gt/lt; the deprecated from/to are gte/lte.
    for key, op, upper in (
        ("gte", "__ge__", False), ("from", "__ge__", False),
        ("gt", "__gt__", True),
        ("lte", "__le__", True), ("to", "__le__", True),
        ("lt", "__lt__", False),
    ):
        if spec.get(key) is not None:
            preds.append(getattr(col, op)(conv(spec[key], upper)))
    if not preds:
        return F.lit(True)
    return reduce(lambda a, b: a & b, preds)


def _match(body: dict[str, Any]) -> Column:
    (field, value), = body.items()
    if field.endswith(SPLIT_SUFFIX):
        return phrase_prefix_predicate(field[: -len(SPLIT_SUFFIX)], str(value))
    return F.col(field) == F.lit(value)


def _match_phrase_prefix(body: dict[str, Any]) -> Column:
    (field, value), = body.items()
    if field.endswith(SPLIT_SUFFIX):
        field = field[: -len(SPLIT_SUFFIX)]
    return phrase_prefix_predicate(field, str(value))


def _terms(body: dict[str, Any]) -> Column:
    (field, values), = body.items()
    if isinstance(values, dict):
        # the terms-LOOKUP wire form — list(dict) would silently compile
        # to isin of the spec KEYS ('index', 'id', 'path')
        raise QueryCompileError(
            "terms lookup requires the catalog: use "
            "Catalog.compile_with_lookups"
        )
    return F.col(field).isin(list(values))


def _query_string(body: dict[str, Any]) -> Column:
    """ES ``query_string``. The reference only ever issues '*' and
    'field:*' (collections.js:78-80) — those stay on their original fast
    paths; any OTHER text routes through the full classic-Lucene parser
    (plans/lucene.py, round 4) with ``fields``/``default_field`` backing
    bare terms, then recursively through this compiler."""
    q = body.get("query", "*").strip()
    if q in ("*", ""):
        return F.lit(True)
    if q.endswith(":*") and ":" not in q[:-2] and "(" not in q \
            and " " not in q:
        return F.col(q[:-2]).isNotNull()
    from harmonize_search_analyze_spark.plans.lucene import (
        LuceneParseError,
        parse_lucene,
    )

    fields = body.get("fields") or (
        [body["default_field"]] if body.get("default_field") else None
    )
    try:
        ast = parse_lucene(q, default_fields=fields)
    except LuceneParseError as exc:
        raise QueryCompileError(f"query_string parse error: {exc}") from exc
    return compile_query(ast)


def _term_level_value(spec: Any) -> tuple[str, dict[str, Any]]:
    """ES term-level queries accept both ``{f: v}`` and ``{f: {"value": v,
    ...params}}``; normalize to (value, params)."""
    if isinstance(spec, dict):
        return str(spec["value"]), spec
    return str(spec), {}


def _fuzzy(body: dict[str, Any]) -> Column:
    """ES ``fuzzy`` term query: edit distance <= fuzziness. Term-level —
    no analysis, case-sensitive like the other term queries here.
    ``fuzziness: AUTO`` (the ES default ladder): 0 edits under 3 chars,
    1 through 5 chars, 2 beyond."""
    (field, spec), = body.items()
    value, params = _term_level_value(spec)
    fuzz = params.get("fuzziness", "AUTO")
    if fuzz == "AUTO":
        n = 0 if len(value) < 3 else (1 if len(value) <= 5 else 2)
    else:
        n = int(fuzz)
    if n == 0:
        return F.col(field) == F.lit(value)
    return F.levenshtein(F.col(field), F.lit(value)) <= F.lit(n)


def _wildcard_regex(pattern: str) -> str:
    import re as _re

    return "".join(
        ".*" if ch == "*" else "." if ch == "?" else _re.escape(ch)
        for ch in pattern
    )


def _wildcard(body: dict[str, Any]) -> Column:
    """ES ``wildcard``: ``*`` any sequence, ``?`` one char, anchored at both
    ends (ES matches the WHOLE term). Compiled to one RLIKE — sargable as a
    residual parquet filter, no UDF."""
    (field, spec), = body.items()
    value, _ = _term_level_value(spec)
    return F.col(field).rlike(f"^(?:{_wildcard_regex(value)})$")


def _regexp(body: dict[str, Any]) -> Column:
    """ES ``regexp`` term query — anchored to the full term (ES's Lucene
    regex always is; unanchored fragments need explicit ``.*``)."""
    (field, spec), = body.items()
    value, _ = _term_level_value(spec)
    return F.col(field).rlike(f"^(?:{value})$")


def _prefix(body: dict[str, Any]) -> Column:
    (field, spec), = body.items()
    value, _ = _term_level_value(spec)
    return F.col(field).startswith(value)


def _exists(body: dict[str, Any]) -> Column:
    return F.col(body["field"]).isNotNull()


def _match_phrase(body: dict[str, Any]) -> Column:
    """ES ``match_phrase`` under the pinned ``.split`` tokenizer. The
    default slop=0 ("all words consecutive") stays on the sargable regex
    path; ``{"query": ..., "slop": n}`` with n > 0 routes through the
    intervals position machinery (ordered, max_gaps=slop — Lucene's
    sloppy-phrase measure for non-transposed terms; the transposition
    case counts 2 per swap in Lucene, approximated as gap slack here and
    documented as the deviation)."""
    (field, value), = body.items()
    if field.endswith(SPLIT_SUFFIX):
        field = field[: -len(SPLIT_SUFFIX)]
    slop = 0
    if isinstance(value, dict):
        slop = int(value.get("slop", 0))
        if "query" not in value:
            raise QueryCompileError("match_phrase object form needs 'query'")
        value = value["query"]
    if slop > 0:
        from harmonize_search_analyze_spark.functions.intervals import (
            intervals_match_sql,
        )

        try:
            sql = intervals_match_sql(
                field, str(value), "spark", max_gaps=slop, ordered=True
            )
        except ValueError as e:  # e.g. the 3-term combination cap
            raise QueryCompileError(str(e)) from e
        return F.expr(sql)
    return phrase_predicate(field, str(value))


def _multi_match(body: dict[str, Any]) -> Column:
    """ES ``multi_match`` (best_fields, the default): the match predicate
    applied across several fields, OR-combined. Fields ending in ``.split``
    route through the analyzed phrase-prefix path like ``match`` does; in a
    filter context best_fields/most_fields only differ in scoring, so one
    OR covers the DSL surface the engine models."""
    query = body["query"]
    fields = body.get("fields") or []
    if not fields:
        raise QueryCompileError("multi_match requires a non-empty fields list")
    preds = [_match({f: query}) for f in fields]
    return reduce(lambda a, b: a | b, preds)


def _terms_set(body: dict[str, Any]) -> Column:
    """ES ``terms_set``: match when at least ``minimum_should_match`` of the
    supplied terms are present. On a ``.split`` field each term must appear
    as a full token (the pinned analyzer); on an exact field membership is
    equality, so a single-valued column can match at most one term — msm>1
    then never matches, which is ES's own behavior for non-array keyword
    fields. Compiled as a sum of boolean ints >= msm: one codegen'd
    projection, no explode, no join."""
    (field, spec), = body.items()
    terms = list(spec.get("terms") or [])
    if not terms:
        raise QueryCompileError("terms_set requires a non-empty terms list")
    msm = int(spec.get("minimum_should_match", len(terms)))
    if field.endswith(SPLIT_SUFFIX):
        base = field[: -len(SPLIT_SUFFIX)]
        flags = [phrase_predicate(base, str(t)) for t in terms]
    else:
        flags = [F.col(field) == F.lit(t) for t in terms]
    total = reduce(lambda a, b: a + b, [f.cast("int") for f in flags])
    return total >= F.lit(msm)


def _ids(body: dict[str, Any]) -> Column:
    """ES ``ids`` query. Engine extension: frames carry natural keys rather
    than an ``_id`` metadata field, so the key column is named explicitly
    (``field``, default ``doc_id``)."""
    values = list(body.get("values") or [])
    if not values:
        return F.lit(False)  # ES: ids with no values matches nothing
    return F.col(body.get("field", "doc_id")).isin(values)


def _dis_max(body: dict[str, Any], *, now: _dt.datetime | None = None) -> Column:
    """ES ``dis_max`` in filter context: a document matches if ANY clause
    matches (tie_breaker only shapes scores, not the match set)."""
    queries = body.get("queries") or []
    if not queries:
        raise QueryCompileError("dis_max requires a non-empty queries list")
    return reduce(lambda a, b: a | b, [compile_query(q, now=now) for q in queries])


def _boosting(body: dict[str, Any], *, now: _dt.datetime | None = None) -> Column:
    """ES ``boosting`` in filter context: the match set is the positive
    clause's — ``negative`` only demotes scores (by ``negative_boost``),
    it never filters."""
    pos = body.get("positive")
    if pos is None:
        raise QueryCompileError("boosting requires a positive clause")
    return compile_query(pos, now=now)


def _geo_fields(body: dict[str, Any]) -> tuple[Column, Column]:
    """Engine extension of ES's geo_point contract: frames carry separate
    lat/lon DOUBLE columns, named by the ``fields`` spec (defaults
    lat/lon)."""
    f = body.get("fields") or {}
    return F.col(f.get("lat", "lat")), F.col(f.get("lon", "lon"))


def _geo_bounding_box(body: dict[str, Any]) -> Column:
    """ES ``geo_bounding_box`` query (the Kibana map's pan/zoom filter):
    rows inside the top_left/bottom_right rectangle. A box whose left
    edge lies east of its right edge crosses the antimeridian and wraps
    (OR of the two longitude half-ranges), per ES."""
    lat, lon = _geo_fields(body)
    tl, br = body["top_left"], body["bottom_right"]
    pred = (lat <= F.lit(float(tl["lat"]))) & (lat >= F.lit(float(br["lat"])))
    west, east = float(tl["lon"]), float(br["lon"])
    if west <= east:
        return pred & (lon >= F.lit(west)) & (lon <= F.lit(east))
    return pred & ((lon >= F.lit(west)) | (lon <= F.lit(east)))


def _parse_distance_m(spec: Any) -> float:
    """ES distance strings: bare numbers are meters; km/mi/m suffixes."""
    if isinstance(spec, (int, float)):
        return float(spec)
    s = str(spec).strip().lower()
    for suffix, mult in (("km", 1000.0), ("mi", 1609.344), ("m", 1.0)):
        if s.endswith(suffix):
            return float(s[: -len(suffix)]) * mult
    return float(s)


def _geo_distance(body: dict[str, Any]) -> Column:
    """ES ``geo_distance`` query: rows within ``distance`` of ``origin``
    — the engine's portable haversine (the geo_distance agg's formula),
    one codegen'd expression, sargable on the lat/lon columns' ranges."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        haversine_sql,
    )

    f = body.get("fields") or {}
    origin = body["origin"]
    d = F.expr(
        haversine_sql(
            f.get("lat", "lat"),
            f.get("lon", "lon"),
            (float(origin["lat"]), float(origin["lon"])),
        )
    )
    return d <= F.lit(_parse_distance_m(body["distance"]))


def _strip_split(field: str) -> str:
    return field[: -len(SPLIT_SUFFIX)] if field.endswith(SPLIT_SUFFIX) else field


def _match_bool_prefix(body: dict[str, Any]) -> Column:
    """ES ``match_bool_prefix``: analyze the input; every term matches as a
    full token ANYWHERE in the stream (unlike phrase-prefix's consecutive
    requirement) and the LAST term matches as a token prefix. ES assembles
    the terms as ``should`` clauses (OR) by default; ``operator: "and"``
    requires all. One codegen'd conjunction/disjunction of sargable regex
    predicates — no tokenize-explode, no shuffle."""
    (field, spec), = body.items()
    field = _strip_split(field)
    if isinstance(spec, dict):
        query = str(spec.get("query", ""))
        operator = str(spec.get("operator", "or")).lower()
    else:
        query, operator = str(spec), "or"
    words = [w for w in _re.split(r"[^a-zA-Z0-9]+", query) if w]
    if not words:
        return F.lit(True)
    preds = [phrase_predicate(field, w) for w in words[:-1]]
    preds.append(phrase_prefix_predicate(field, words[-1]))
    combine = (lambda a, b: a & b) if operator == "and" else (lambda a, b: a | b)
    return reduce(combine, preds)


def _combined_fields(body: dict[str, Any]) -> Column:
    """ES ``combined_fields``: term-centric multi-field match — a term
    counts as present if it appears as a token in ANY of the fields (ES
    scores as if the fields were one combined text field); ``operator``
    ("or", the ES default, or "and") combines across terms. All fields
    route through the pinned analyzed-token semantics (ES requires text
    fields sharing one analyzer)."""
    query = str(body.get("query", ""))
    fields = [_strip_split(f) for f in (body.get("fields") or [])]
    if not fields:
        raise QueryCompileError("combined_fields requires a non-empty fields list")
    operator = str(body.get("operator", "or")).lower()
    words = [w for w in _re.split(r"[^a-zA-Z0-9]+", query) if w]
    if not words:
        return F.lit(True)
    per_term = [
        reduce(lambda a, b: a | b, [phrase_predicate(f, w) for f in fields])
        for w in words
    ]
    combine = (lambda a, b: a & b) if operator == "and" else (lambda a, b: a | b)
    return reduce(combine, per_term)


def _simple_query_string(body: dict[str, Any]) -> Column:
    """ES ``simple_query_string`` — the never-throws query grammar. The
    engine pins the subset the Lucene SimpleQueryParser defines over the
    ``.split`` analyzer: whitespace-separated units where ``"..."`` is a
    phrase (consecutive tokens), a trailing ``*`` is a token-prefix, and a
    leading ``-`` prohibits the unit. Positive units combine with
    ``default_operator`` (``"or"``, the ES default); prohibited units are
    always conjunctive NOTs (the bool-query shape ES builds). Everything
    compiles to one codegen'd boolean expression of sargable regexes."""
    query = str(body.get("query", ""))
    fields = [_strip_split(f) for f in (body.get("fields") or [])]
    if not fields:
        raise QueryCompileError(
            "simple_query_string requires a non-empty fields list"
        )
    operator = str(body.get("default_operator", "or")).lower()
    units = _re.findall(r'-?"[^"]*"|[^\s"]+', query)
    pos, neg = [], []
    for unit in units:
        prohibit = unit.startswith("-") and len(unit) > 1
        if prohibit:
            unit = unit[1:]
        if unit.startswith('"') and unit.endswith('"') and len(unit) >= 2:
            text = unit[1:-1]
            mk = phrase_predicate
        elif unit.endswith("*"):
            text = unit[:-1]
            mk = phrase_prefix_predicate
        else:
            text = unit
            mk = phrase_predicate
        if not _re.search(r"[a-zA-Z0-9]", text):
            continue  # ES: unparseable/empty parts are silently dropped
        p = reduce(lambda a, b: a | b, [mk(f, text) for f in fields])
        (neg if prohibit else pos).append(p)
    combine = (lambda a, b: a & b) if operator == "and" else (lambda a, b: a | b)
    out = reduce(combine, pos) if pos else F.lit(True)
    for p in neg:
        # null-safe: a doc whose field is NULL cannot contain the
        # prohibited term, so it must SURVIVE the negation (ES must_not
        # semantics for missing fields); bare ~NULL would filter it out
        out = out & ~F.coalesce(p, F.lit(False))
    return out


def _intervals(body: dict[str, Any]) -> Column:
    """ES ``intervals`` query: position-aware match/any_of/all_of rules
    over the pinned tokenization (functions/intervals.py). Unlike every
    other text predicate this one needs token POSITIONS; it compiles to
    one codegen'd nested-EXISTS expression — still no explode/join."""
    from harmonize_search_analyze_spark.functions.intervals import (
        intervals_sql,
    )

    (field, rule), = body.items()
    field = _strip_split(field)
    try:
        sql = intervals_sql(rule, field, "spark")
    except ValueError as e:
        raise QueryCompileError(str(e)) from e
    return F.expr(sql)


def _sql_literal(v: Any) -> str:
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, str):
        if "'" in v or "\\" in v:
            raise QueryCompileError(
                f"nested literal may not contain quotes/backslashes: {v!r}"
            )
        return f"'{v}'"
    raise QueryCompileError(f"unsupported nested literal: {v!r}")


def nested_pred_sql(
    query: dict[str, Any], path: str, var: str, dialect: str
) -> str:
    """Boolean SQL over one array element ``var`` for the inner query of
    an ES ``nested`` clause. Restricted grammar (term/terms/range/exists +
    bool composition) — the subset that preserves nested semantics as a
    pure lambda predicate; field names must be ``path.sub`` per ES and
    map to struct member access. Dialect-parametric so the DuckDB oracle
    replays the identical predicate."""
    if not isinstance(query, dict) or len(query) != 1:
        raise QueryCompileError(f"nested inner query must have one key: {query!r}")
    (kind, body), = query.items()

    def fld(name: str) -> str:
        prefix = path + "."
        if not name.startswith(prefix):
            raise QueryCompileError(
                f"nested field {name!r} must start with {prefix!r}"
            )
        sub = name[len(prefix):]
        # literal VALUES are already quote-guarded; field NAMES reach the
        # generated lambda verbatim, so they get the same injection gate
        if not _re.fullmatch(r"[A-Za-z0-9_]+(\.[A-Za-z0-9_]+)*", sub):
            raise QueryCompileError(f"invalid nested field name: {name!r}")
        return f"{var}.{sub}"

    if kind in ("term", "match"):
        (name, value), = body.items()
        return f"{fld(name)} = {_sql_literal(value)}"
    if kind == "terms":
        (name, values), = body.items()
        if not values:
            return "FALSE"
        lits = ", ".join(_sql_literal(v) for v in values)
        return f"{fld(name)} IN ({lits})"
    if kind == "range":
        (name, spec), = body.items()
        parts = []
        for key, op in (("gte", ">="), ("gt", ">"), ("lte", "<="), ("lt", "<")):
            if spec.get(key) is not None:
                parts.append(f"{fld(name)} {op} {_sql_literal(spec[key])}")
        return "(" + " AND ".join(parts) + ")" if parts else "TRUE"
    if kind == "exists":
        return f"{fld(body['field'])} IS NOT NULL"
    if kind == "bool":
        parts = []
        for clause in (body.get("must") or []) + (body.get("filter") or []):
            parts.append(nested_pred_sql(clause, path, var, dialect))
        should = [
            nested_pred_sql(c, path, var, dialect)
            for c in body.get("should") or []
        ]
        if should:
            parts.append("(" + " OR ".join(should) + ")")
        for clause in body.get("must_not") or []:
            inner = nested_pred_sql(clause, path, var, dialect)
            parts.append(f"(NOT COALESCE({inner}, FALSE))")
        return "(" + " AND ".join(parts) + ")" if parts else "TRUE"
    raise QueryCompileError(f"unsupported nested inner query: {kind!r}")


def nested_exists_sql(
    path: str, query: dict[str, Any], dialect: str, *, var: str = "__nx"
) -> str:
    """Full nested predicate: at least one element of the ``path`` array
    satisfies ALL inner conditions TOGETHER — the per-object correlation
    flattened fields lose, which is the entire point of ES nested docs."""
    pred = nested_pred_sql(query, path, var, dialect)
    if dialect == "spark":
        return f"exists({path}, {var} -> {pred})"
    return f"len(list_filter({path}, {var} -> {pred})) > 0"


def _nested(body: dict[str, Any]) -> Column:
    """ES ``nested`` query compiled to a single EXISTS lambda over the
    array-of-structs column — one codegen'd projection, no explode."""
    path = body.get("path")
    if not path:
        raise QueryCompileError("nested requires a path")
    query = body.get("query")
    if not query:
        raise QueryCompileError("nested requires a query")
    return F.expr(nested_exists_sql(path, query, "spark"))


def _script(body: dict[str, Any]) -> Column:
    """ES ``script`` query: keep documents where the script evaluates
    true. The painless body maps to one SQL boolean expression (the same
    restricted contract as ``runtime_mappings``); evaluated in-plan, so
    it stays inside whole-stage codegen and composes with sargable
    siblings in the enclosing bool (Catalyst still pushes THOSE to the
    scan)."""
    script = body.get("script", body)
    src = script.get("source") if isinstance(script, dict) else script
    if not src or not isinstance(src, str):
        raise QueryCompileError("script query needs a script source")
    return F.expr(src).cast("boolean")


def _span_term_of(clause: dict[str, Any]) -> tuple[str, str]:
    if not isinstance(clause, dict) or list(clause.keys()) != ["span_term"]:
        raise QueryCompileError(
            f"span clause must be a span_term: {clause!r}"
        )
    body = clause["span_term"]
    if not isinstance(body, dict) or len(body) != 1:
        raise QueryCompileError(
            f"span_term must map exactly one field: {body!r}"
        )
    (field, spec), = body.items()
    if isinstance(spec, dict):
        if "value" not in spec:
            raise QueryCompileError(
                f"span_term object form needs a 'value': {spec!r}"
            )
        spec = spec["value"]
    return _strip_split(field), str(spec)


def _span_near(body: dict[str, Any]) -> Column:
    """ES ``span_near`` over span_term clauses: all terms within ``slop``
    total slack, optionally ``in_order``. Single-term spans make Lucene's
    slack measure coincide with the intervals ``max_gaps`` measure, so
    this compiles through the same nested-EXISTS position machinery —
    one codegen'd expression, no explode/join."""
    from harmonize_search_analyze_spark.functions.intervals import (
        span_near_sql,
    )

    clauses = body.get("clauses") or []
    pairs = [_span_term_of(c) for c in clauses]
    if not pairs:
        raise QueryCompileError("span_near requires clauses")
    fields = {f for f, _ in pairs}
    if len(fields) != 1:
        raise QueryCompileError(
            f"span_near clauses must share one field, got {sorted(fields)}"
        )
    try:
        sql = span_near_sql(
            fields.pop(),
            [t for _, t in pairs],
            "spark",
            slop=int(body.get("slop", 0)),
            in_order=bool(body.get("in_order", True)),
        )
    except ValueError as e:
        raise QueryCompileError(str(e)) from e
    return F.expr(sql)


def _span_first(body: dict[str, Any]) -> Column:
    """ES ``span_first``: the inner span_term must occur among the first
    ``end`` tokens (Lucene SpanFirstQuery)."""
    from harmonize_search_analyze_spark.functions.intervals import (
        span_first_sql,
    )

    match = body.get("match")
    if not match:
        raise QueryCompileError("span_first requires a match clause")
    field, term = _span_term_of(match)
    try:
        sql = span_first_sql(field, term, int(body.get("end", 1)), "spark")
    except ValueError as e:
        raise QueryCompileError(str(e)) from e
    return F.expr(sql)


def _span_not(body: dict[str, Any]) -> Column:
    """ES ``span_not``: the include span_term occurs somewhere its
    pre/post token window contains no exclude-term occurrence (Lucene
    SpanNotQuery)."""
    from harmonize_search_analyze_spark.functions.intervals import (
        span_not_sql,
    )

    include = body.get("include")
    exclude = body.get("exclude")
    if not include or not exclude:
        raise QueryCompileError(
            "span_not requires include and exclude clauses"
        )
    fi, ti = _span_term_of(include)
    fe, te = _span_term_of(exclude)
    if fi != fe:
        raise QueryCompileError(
            f"span_not clauses must share one field, got {fi!r}/{fe!r}"
        )
    try:
        sql = span_not_sql(
            fi, ti, te, "spark",
            pre=int(body.get("pre", 0)),
            post=int(body.get("post", 0)),
        )
    except ValueError as e:
        raise QueryCompileError(str(e)) from e
    return F.expr(sql)


def _span_or(body: dict[str, Any]) -> Column:
    """ES ``span_or`` over span_term clauses: any clause's span matches.
    Standalone form only (this engine's span family compiles flat
    predicates, not composable span trees — nest bool/should for
    combinations). Same validation as the other span handlers: one alnum
    token per clause (a non-alnum value would regex-degenerate to
    match-all), one shared field."""
    import re as _re

    clauses = body.get("clauses") or []
    pairs = [_span_term_of(c) for c in clauses]
    if not pairs:
        raise QueryCompileError("span_or requires clauses")
    fields = {f for f, _ in pairs}
    if len(fields) != 1:
        raise QueryCompileError(
            f"span_or clauses must share one field, got {sorted(fields)}"
        )
    for _, t in pairs:
        if not _re.fullmatch(r"[a-zA-Z0-9]+", t):
            raise QueryCompileError(
                f"span_term value must be one alnum token: {t!r}"
            )
    preds = [phrase_predicate(f, t) for f, t in pairs]
    return reduce(lambda a, b: a | b, preds)


def geo_polygon_sql(
    points: list[tuple[float, float]],
    lat_expr: str,
    lon_expr: str,
) -> str:
    """Point-in-polygon as a pure boolean SQL expression (identical text
    both engines — only arithmetic and comparisons): the classic
    crossing-number test, one term per polygon edge, XOR-folded via `<>`.
    ``points`` are (lat, lon) vertices of a closed ring (plan-time
    literals, like every query constant here); boundary behavior follows
    the standard half-open edge rule. O(edges) codegen'd terms per row —
    no join, no UDF, sargable-adjacent (a bounding-box pre-filter can be
    AND-ed in front for scan pruning)."""
    total = _crossing_sum_sql(points, lat_expr, lon_expr)
    if total is None:
        return "FALSE"  # degenerate all-horizontal ring
    return f"(({total}) % 2 = 1)"


def _crossing_sum_sql(
    points: list[tuple[float, float]],
    lat_expr: str,
    lon_expr: str,
) -> str | None:
    """Crossing-count SUM expression for one ring (None if the ring is
    degenerate — every edge horizontal). Shared by the single-ring
    geo_polygon test and the multi-ring even-odd geo_shape test."""
    if len(points) < 3:
        raise QueryCompileError("geo_polygon needs at least 3 vertices")
    terms = []
    n = len(points)
    for i in range(n):
        y1, x1 = points[i]
        y2, x2 = points[(i + 1) % n]
        if y1 == y2:
            continue  # horizontal edge can't cross a horizontal ray test
        terms.append(
            f"(CASE WHEN (({y1!r} > {lat_expr}) <> ({y2!r} > {lat_expr})) "
            f"AND ({lon_expr} < ({x2!r} - {x1!r}) * ({lat_expr} - {y1!r}) "
            f"/ ({y2!r} - {y1!r}) + {x1!r}) THEN 1 ELSE 0 END)"
        )
    if not terms:
        return None
    return " + ".join(terms)


def _geo_polygon(body: dict[str, Any]) -> Column:
    """ES ``geo_polygon`` query: the point lies inside the polygon ring.
    Vertices come as ES's ``points`` list of {lat, lon} dicts."""
    f = body.get("fields") or {}
    lat, lon = f.get("lat", "lat"), f.get("lon", "lon")
    pts = [
        (float(p["lat"]), float(p["lon"]))
        for p in (body.get("points") or [])
    ]
    return F.expr(geo_polygon_sql(pts, lat, lon))


def geo_shape_sql(
    rings: list[list[tuple[float, float]]],
    lat_expr: str,
    lon_expr: str,
) -> str:
    """Point-in-polygon-with-holes: the even-odd rule over ALL rings —
    crossing counts XOR across outer boundary and holes, so a point
    inside the outer ring but inside a hole counts even (outside). Same
    pure-arithmetic crossing-number terms as :func:`geo_polygon_sql`,
    concatenated across rings (GeoJSON polygon semantics: first ring
    exterior, rest holes — the even-odd test needs no orientation
    convention). O(total edges) codegen'd terms per row, no join/UDF."""
    if not rings:
        raise QueryCompileError("geo_shape needs at least one ring")
    parts = []
    for ring in rings:
        s = _crossing_sum_sql(ring, lat_expr, lon_expr)
        if s is not None:
            parts.append(f"({s})")
    if not parts:
        return "FALSE"
    return f"((({') + ('.join(parts)})) % 2 = 1)"


def _geo_shape(body: dict[str, Any]) -> Column:
    """ES ``geo_shape`` query over an indexed point field: relation
    ``intersects``/``within`` of a point against an inline ``polygon``
    shape (GeoJSON [lon, lat] coordinate order, outer ring + holes).
    For points the two supported relations coincide (a point intersects
    a polygon iff it lies within it); ``disjoint`` is the negation."""
    f = body.get("fields") or {}
    lat, lon = f.get("lat", "lat"), f.get("lon", "lon")
    shape = body.get("shape") or {}
    if str(shape.get("type", "")).lower() != "polygon":
        raise QueryCompileError(
            f"geo_shape supports polygon shapes, got {shape.get('type')!r}"
        )
    rings = [
        [(float(pt[1]), float(pt[0])) for pt in ring]  # GeoJSON lon,lat
        for ring in (shape.get("coordinates") or [])
    ]
    relation = str(body.get("relation", "intersects")).lower()
    inside = F.expr(geo_shape_sql(rings, lat, lon))
    if relation in ("intersects", "within"):
        return inside
    if relation == "disjoint":
        return ~inside
    raise QueryCompileError(f"unsupported geo_shape relation: {relation!r}")


def _bool(body: dict[str, Any], *, now: _dt.datetime | None = None) -> Column:
    preds = []
    for clause in body.get("must", []) or []:
        preds.append(compile_query(clause, now=now))
    for clause in body.get("filter", []) or []:
        preds.append(compile_query(clause, now=now))
    should = [compile_query(c, now=now) for c in body.get("should", []) or []]
    if should:
        # reference always sets minimum_should_match: 1 (collections.js:171)
        preds.append(reduce(lambda a, b: a | b, should))
    for clause in body.get("must_not", []) or []:
        preds.append(~compile_query(clause, now=now))
    if not preds:
        return F.lit(True)
    return reduce(lambda a, b: a & b, preds)


_HANDLERS = {
    "match_all": _match_all,
    "match_none": _match_none,
    "constant_score": _constant_score,
    "wrapper": _wrapper,
    "range": _range,
    "match": _match,
    "match_phrase": _match_phrase,
    "match_phrase_prefix": _match_phrase_prefix,
    "term": _match,
    "terms": _terms,
    "query_string": _query_string,
    "bool": _bool,
    # term-level queries beyond the reference webapp's grammar — the rest of
    # the ES query DSL surface a dashboard consumer can issue by hand
    "fuzzy": _fuzzy,
    "multi_match": _multi_match,
    "wildcard": _wildcard,
    "regexp": _regexp,
    "prefix": _prefix,
    "exists": _exists,
    "terms_set": _terms_set,
    "ids": _ids,
    "dis_max": _dis_max,
    "boosting": _boosting,
    "geo_bounding_box": _geo_bounding_box,
    "geo_distance": _geo_distance,
    "match_bool_prefix": _match_bool_prefix,
    "combined_fields": _combined_fields,
    "simple_query_string": _simple_query_string,
    "intervals": _intervals,
    "nested": _nested,
    "geo_polygon": _geo_polygon,
    "span_near": _span_near,
    "span_first": _span_first,
    "span_not": _span_not,
    "span_or": _span_or,
    "script": _script,
    "geo_shape": _geo_shape,
}


def display_text(ast: dict[str, Any] | None) -> str:
    """Human-readable Lucene-ish mirror of a query AST.

    Parity with the webapp's display-text generator
    (``services/webapp/src/collections.js:209-257``) which renders e.g.
    ``name:>=5 AND name:<=10 AND (color:red OR color:blue)``.
    """
    if not ast:
        return "*"
    (kind, body), = ast.items()
    if kind == "match_all":
        return "*"
    if kind == "range":
        (field, spec), = body.items()
        parts = []
        for k, sym in (("gte", ">="), ("from", ">="), ("gt", ">"),
                       ("lte", "<="), ("to", "<="), ("lt", "<")):
            if spec.get(k) is not None:
                parts.append(f"{field}:{sym}{spec[k]}")
        return " AND ".join(parts) or "*"
    if kind in ("match", "term"):
        (field, value), = body.items()
        return f'{field}:"{value}"'
    if kind == "match_phrase_prefix":
        (field, value), = body.items()
        return f'{field}:"{value}*"'
    if kind == "terms":
        (field, values), = body.items()
        return "(" + " OR ".join(f'{field}:"{v}"' for v in values) + ")"
    if kind == "query_string":
        return body.get("query", "*")
    if kind == "match_phrase":
        (field, value), = body.items()
        return f'{field}:"{value}"'
    if kind in ("fuzzy", "wildcard", "regexp", "prefix"):
        (field, spec), = body.items()
        value, params = _term_level_value(spec)
        if kind == "fuzzy":
            return f"{field}:{value}~{params.get('fuzziness', 'AUTO')}"
        if kind == "prefix":
            return f"{field}:{value}*"
        if kind == "regexp":
            return f"{field}:/{value}/"
        return f"{field}:{value}"
    if kind == "exists":
        return f"_exists_:{body['field']}"
    if kind == "multi_match":
        q = body["query"]
        return "(" + " OR ".join(
            f'{f}:"{q}"' for f in body.get("fields", [])
        ) + ")"
    if kind == "bool":
        parts = [display_text(c) for c in body.get("must", []) or []]
        should = [display_text(c) for c in body.get("should", []) or []]
        if should:
            parts.append("(" + " OR ".join(should) + ")")
        parts.extend(f"NOT {display_text(c)}" for c in body.get("must_not", []) or [])
        return " AND ".join(p for p in parts if p) or "*"
    return "*"


def percolate(
    df,
    queries: dict[str, dict[str, Any] | None],
    id_cols: list[str],
    *,
    now: _dt.datetime | None = None,
    chunk_size: int = 256,
):
    """ES percolator, inverted search: given STORED queries, find which of
    them match each document — the alerting/routing primitive ("which
    saved searches fire on this incoming doc?").

    Every stored query compiles to a Column predicate; all of them are
    evaluated in ONE scan (no join against a query table, no per-query
    pass), then exploded to (id_cols..., query_id) match rows. Cost is
    O(rows x queries) predicate evaluations in a single projection — at
    100 TB with thousands of stored queries this is exactly how you want
    it shaped: one pass, zero shuffles before the (optional) downstream
    agg.

    Thousands-of-queries guard: the match array is built in chunks of
    ``chunk_size`` predicates, concatenated inside the SAME projection —
    still one stage and one scan (plan-asserted at 600 queries), but no
    single expression tree grows unboundedly. Oversized expression trees
    are where Janino's 64KB method limit and
    ``spark.sql.codegen.hugeMethodLimit`` force whole-stage codegen to
    fall back to interpreted evaluation; bounded chunks keep each subtree
    compilable. 256 predicates/chunk holds the generated code well under
    the cliff for typical term/range/bool alerts.

    Returns one row per (document, matching query), query names sorted.
    """
    from pyspark.sql import functions as _F

    if chunk_size < 1:
        raise ValueError("chunk_size must be >= 1")
    names = sorted(queries)
    chunks = [
        _F.array(
            *[
                _F.when(compile_query(queries[n], now=now), _F.lit(n))
                for n in names[i : i + chunk_size]
            ]
        )
        for i in range(0, len(names), chunk_size)
    ]
    if not chunks:
        # zero stored queries: no matches, not a crash
        tagged = _F.array().cast("array<string>")
    elif len(chunks) == 1:
        tagged = chunks[0]
    else:
        tagged = _F.concat(*chunks)
    return (
        df.select(*id_cols, _F.explode(_F.array_compact(tagged)).alias("query_id"))
    )


# -- runtime fields -----------------------------------------------------------

# ES runtime-field type -> engine cast (ES docs: runtime fields support
# boolean/date/double/geo_point/ip/keyword/long; geo_point is the compiler's
# (lat, lon) column-pair convention and has no scalar cast here)
_RUNTIME_TYPES = {
    "keyword": "string",
    "long": "bigint",
    "double": "double",
    "boolean": "boolean",
    "date": "timestamp",
    "ip": "string",
}


def apply_runtime_mappings(
    df: DataFrame, mappings: dict[str, Any]
) -> DataFrame:
    """ES ``runtime_mappings``: script-derived fields materialized at query
    time, visible to every predicate/agg downstream exactly like mapped
    fields (the ES contract). The painless ``emit(<expr>)`` body maps to a
    single SQL expression here — evaluated in-plan, so Catalyst still
    pushes independent predicates past it and prunes unused runtime fields
    out of the scan entirely (project-only columns are free until used).

    ``mappings`` is the ES wire shape:
    ``{field: {"type": "long", "script": {"source": "<sql expr>"}}}``
    (a bare string script is accepted too).
    """
    for field, spec in mappings.items():
        typ = _RUNTIME_TYPES.get(spec.get("type"))
        if typ is None:
            raise QueryCompileError(
                f"unsupported runtime field type: {spec.get('type')!r}"
            )
        script = spec.get("script")
        src = script["source"] if isinstance(script, dict) else script
        if not src:
            raise QueryCompileError(f"runtime field {field} needs a script")
        df = df.withColumn(field, F.expr(src).cast(typ))
    return df


def msearch(
    df,
    searches: dict[str, dict[str, Any] | None],
    *,
    sort_field: str,
    id_col: str,
    k: int = 3,
    now: _dt.datetime | None = None,
):
    """ES ``_msearch``: N independent searches answered in ONE scan.

    ES clients batch searches to amortize round-trips; the engine-side win
    here is bigger — all compiled predicates evaluate in a single
    projection (the percolate machinery, chunked against the codegen
    cliff), so N searches cost one corpus pass instead of N. Each search's
    response is summarized relationally: total hit count plus the top-k
    hits by ``sort_field`` (ties pinned value DESC, id ASC; hit_rank
    1-based).

    Returns (query_name, doc_count, hit_rank, {id_col}, {sort_field})
    ordered by (query_name, hit_rank).

    Scale: one scan + ONE exchange on query_name for the per-search
    ranking window; the count rides the same partition (count-over-window,
    no second aggregation pass). The window input is every matching row,
    so pre-filter broad searches — same contract as top_hits. With few
    searches the exchange has few keys; doc_count stays exact either way.
    """
    from pyspark.sql import Window as _W
    from pyspark.sql import functions as _F

    matches = percolate(df, searches, [id_col, sort_field], now=now)
    w = _W.partitionBy("query_id")
    wr = w.orderBy(_F.desc(sort_field), _F.asc(id_col))
    return (
        matches.select(
            _F.col("query_id").alias("query_name"),
            _F.count(_F.lit(1)).over(w).alias("doc_count"),
            _F.row_number().over(wr).alias("hit_rank"),
            id_col,
            sort_field,
        )
        .where(_F.col("hit_rank") <= k)
        .orderBy("query_name", "hit_rank")
    )


def validate_query(query: dict[str, Any]) -> tuple[bool, str | None]:
    """ES ``_validate/query`` API: compile-check a query AST without
    executing it. Returns (valid, explanation) — explanation carries the
    compile error text when invalid (ES's explain=true shape). Catalyst
    analysis (column existence) still happens at bind time like ES's
    shard-level rewrite; this validates the DSL layer."""
    try:
        compile_query(query)
        return True, None
    except (QueryCompileError, ValueError, TypeError, KeyError) as e:
        # malformed bodies raise raw unpack/type errors from handlers —
        # the validation API reports rather than re-raises them
        return False, f"{type(e).__name__}: {e}"
