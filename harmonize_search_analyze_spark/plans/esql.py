"""ES|QL — Elasticsearch's piped query language, compiled to DataFrames.

The third query grammar over the one engine (after the DSL JSON in
``plans/compiler.py`` and KQL in ``plans/kql.py``): ES|QL is the
``FROM idx | WHERE ... | STATS ... BY ... | SORT ... | LIMIT n`` pipe
language ES ships for analyst workflows. Each pipe command maps to
exactly one DataFrame transformation, so the whole pipeline stays one
declarative Catalyst plan — WHERE right after FROM pushes to the scan,
STATS is a hash aggregate, SORT+LIMIT fuses to TakeOrderedAndProject.
Nothing is interpreted row-by-row.

Scalar and aggregate EXPRESSIONS use the engine's restricted
SQL-expression contract (the same one the ``script`` query and
``runtime_mappings`` document, plans/compiler.py::_script): an ES|QL
expression is evaluated as a Spark SQL expression. The core ES|QL
function set (ABS, CONCAT, SUBSTRING, LENGTH, ROUND, DATE_TRUNC, CASE,
arithmetic, comparisons, LIKE/RLIKE...) is name-compatible under this
mapping; divergent names are the caller's to spell Spark-side, and the
contract is documented rather than shimmed.

Supported commands::

    FROM pattern[, pattern...]      source: catalog-resolved index union
    ROW a = 1, b = "x"              literal one-row source
    TS pattern ON ts BY dims        time-series source (9.x TS/METRICS):
                                    a following STATS may use
                                    rate()/*_over_time() — a two-level
                                    rollup (per-series inner agg, outer
                                    across series per bucket); series
                                    identity is declared ON/BY inline
                                    (pinned deviation — no TSDB
                                    mappings to read it from)
    WHERE <expr>                    filter
    EVAL name = expr, ...           computed columns (later may use earlier)
    STATS [n =] agg(expr) [WHERE cond], ... [BY [k =] expr, ...]
                                    aggregate (filtered aggs = Spark
                                    FILTER clause, one hash agg)
    INLINESTATS ... [BY ...]        aggregates joined back onto rows
                                    (hash agg + broadcast join-back:
                                    bucket-sized exchange, map-only on
                                    the data path)
    SORT expr [ASC|DESC] [NULLS FIRST|LAST], ...      sort
    LIMIT n
    KEEP col-or-wildcard, ...       projection (ES|QL wildcard rules)
    DROP col-or-wildcard, ...
    RENAME old AS new, ...
    DISSECT field "pattern"         reuse of the ingest dissect compiler
    GROK field "pattern"            reuse of the ingest grok compiler
    MV_EXPAND col                   one row per array element
    LOOKUP JOIN index ON col        broadcast left join (lookup indexes
                                    are small by ES|QL's own contract)
    CHANGE_POINT value ON key       step-change detection over the piped
                                    series (documented deviation: returns
                                    the single best step row from the
                                    deterministic detector core, not
                                    ES|QL's per-row type/p-value
                                    annotations from its detector battery)
    ENRICH policy [ON field] [WITH [new =] field, ...]
                                    broadcast left join against a
                                    registered enrich policy
                                    (Catalog.register_enrich); enrich
                                    columns shadow input columns
    SAMPLE probability [seed]       Bernoulli row sample (map-only)
    RERANK [t =] "q" ON f,... WITH <endpoint>
                                    inference re-scoring (8.18); the
                                    in-engine model is the deterministic
                                    term_overlap stand-in, registered
                                    via Catalog.register_inference
    COMPLETION [t =] expr WITH <endpoint>
                                    LLM completion column; in-engine
                                    only the echo_template stand-in
                                    (real LLMs are env-gated with
                                    guidance)
    FORK (pipe...) (pipe...)        run each branch on the current input,
                                    union byName with a _fork
                                    discriminator column
    FUSE [rrf|linear] [KEY BY c,..] [WITH k = N]
                                    merge FORK branches into one fused
                                    ranking: per-branch rank windows +
                                    one hash agg; rrf = sum 1/(k+rank),
                                    linear = sum of _score; non-key
                                    columns keep the first-branch
                                    occurrence (lowest rank, _fork)

ES|QL null-sort semantics are pinned: nulls sort as LARGER than any
value (the ES|QL default), so ASC puts them last and DESC first unless
an explicit NULLS FIRST/LAST overrides.

Divergent ES|QL function names are translated to their Spark SQL forms
before evaluation (``_translate_fns``): the TO_* conversion family
(null-on-failure via TRY_CAST), the MV_* multivalue family (arrays),
DATE_FORMAT's (format, date) argument order, DATE_EXTRACT/DATE_DIFF
unit keywords, STARTS_WITH/ENDS_WITH. Name-compatible functions pass
through untouched.

Reference scope note: the reference stack predates ES|QL; this exists
for engine completeness next to KQL (the same "a user of ES could run
their query here" bar the DSL surface meets).
"""

from __future__ import annotations

import fnmatch
import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["ESQLError", "run_esql"]


class ESQLError(ValueError):
    """Malformed or unsupported ES|QL."""


def _split_top(text: str, sep: str) -> list[str]:
    """Split on ``sep`` (a single char) outside quotes and parens."""
    parts, buf, depth, q = [], [], 0, None
    i = 0
    while i < len(text):
        c = text[i]
        if q:
            buf.append(c)
            if c == "\\" and i + 1 < len(text):
                buf.append(text[i + 1]); i += 2
                continue
            if c == q:
                q = None
        elif c in "\"'":
            q = c; buf.append(c)
        elif c == "(":
            depth += 1; buf.append(c)
        elif c == ")":
            depth -= 1; buf.append(c)
        elif c == sep and depth == 0:
            if i + 1 < len(text) and text[i + 1] == sep:
                # `||` (SQL string concat / OR) is an atom, not two pipes
                buf.append(sep); buf.append(sep); i += 2
                continue
            parts.append("".join(buf)); buf = []
        else:
            buf.append(c)
        i += 1
    parts.append("".join(buf))
    return parts


def _split_kw(text: str, kw: str) -> tuple[str, str | None]:
    """Split ``text`` at the first top-level occurrence of word ``kw``
    (case-insensitive, outside quotes/parens). Returns (head, tail|None).
    """
    pat = re.compile(rf"\b{kw}\b", re.IGNORECASE)
    depth, q = 0, None
    i = 0
    while i < len(text):
        c = text[i]
        if q:
            if c == "\\":
                i += 2; continue
            if c == q:
                q = None
        elif c in "\"'":
            q = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0:
            m = pat.match(text, i)
            # word boundary on BOTH sides including '.': a dotted
            # identifier segment that equals the keyword (``v.by``,
            # ``x.where``) is part of the name, not a command keyword
            if m and (
                i == 0
                or not (text[i - 1].isalnum() or text[i - 1] in "_.")
            ) and (m.end() >= len(text) or text[m.end()] != "."):
                return text[:i].strip(), text[m.end():].strip()
        i += 1
    return text.strip(), None


def _assignment(item: str, *, auto_name: bool = True) -> tuple[str, str]:
    """``name = expr`` -> (name, expr); bare expr -> (its text, expr)
    (ES|QL names unaliased columns by their source text). The ``=`` must
    be top-level and not part of ==, <=, >=, !=."""
    depth, q = 0, None
    i = 0
    while i < len(item):
        c = item[i]
        if q:
            if c == "\\":
                i += 2; continue
            if c == q:
                q = None
        elif c in "\"'":
            q = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "=" and depth == 0:
            prev = item[i - 1] if i else ""
            nxt = item[i + 1] if i + 1 < len(item) else ""
            if prev not in "<>!=" and nxt != "=":
                name = item[:i].strip()
                if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_.]*", name):
                    break  # not a simple name: treat whole item as expr
                return name, item[i + 1:].strip()
        i += 1
    if not auto_name:
        raise ESQLError(f"expected 'name = expr', got: {item!r}")
    return item.strip(), item.strip()


def _expand_cols(specs: list[str], columns: list[str], cmd: str) -> list[str]:
    out: list[str] = []
    for spec in specs:
        spec = spec.strip()
        if "*" in spec or "?" in spec:
            hits = [c for c in columns if fnmatch.fnmatchcase(c, spec)]
            if not hits:
                raise ESQLError(f"{cmd}: pattern {spec!r} matches no column")
            out.extend(h for h in hits if h not in out)
        else:
            if spec not in columns:
                raise ESQLError(f"{cmd}: unknown column {spec!r}")
            if spec not in out:
                out.append(spec)
    return out


# -- ES|QL -> Spark SQL function translation ---------------------------------
# Most of the core ES|QL function set is name-compatible with Spark SQL
# (ABS, CONCAT, SUBSTRING, ROUND, DATE_TRUNC, CASE, LIKE/RLIKE, ...); the
# divergent names below are rewritten textually BEFORE the expression
# reaches F.expr, recursively through nested calls, never inside string
# literals. Renames keep the argument list; templates re-shape it
# ({0},{1},... are the translated argument texts, {0:kw} strips a quoted
# literal into a bare keyword for EXTRACT/timestampdiff units).

_FN_RENAMES = {
    "MV_MIN": "array_min",
    "MV_MAX": "array_max",
    "MV_DEDUPE": "array_distinct",
    "MV_COUNT": "cardinality",
    "MV_CONCAT": "array_join",
    "MV_SLICE": "slice",
    "STARTS_WITH": "startswith",
    "ENDS_WITH": "endswith",
    "TO_LOWER": "lower",
    "TO_UPPER": "upper",
}

_FN_TEMPLATES = {
    "TO_STRING": ("CAST({0} AS STRING)", 1),
    "TO_INTEGER": ("TRY_CAST({0} AS INT)", 1),
    "TO_INT": ("TRY_CAST({0} AS INT)", 1),
    "TO_LONG": ("TRY_CAST({0} AS BIGINT)", 1),
    "TO_DOUBLE": ("TRY_CAST({0} AS DOUBLE)", 1),
    "TO_BOOLEAN": ("TRY_CAST({0} AS BOOLEAN)", 1),
    "TO_DATETIME": ("TRY_CAST({0} AS TIMESTAMP)", 1),
    "MV_SUM": ("aggregate({0}, CAST(0.0 AS DOUBLE), (a, x) -> a + x)", 1),
    "MV_AVG": (
        "(aggregate({0}, CAST(0.0 AS DOUBLE), (a, x) -> a + x)"
        " / cardinality({0}))",
        1,
    ),
    "MV_FIRST": ("try_element_at({0}, 1)", 1),
    "MV_LAST": ("try_element_at({0}, -1)", 1),
    # ES|QL DATE_FORMAT takes (format, date); Spark takes (date, format)
    "DATE_FORMAT": ("date_format({1}, {0})", 2),
    "DATE_EXTRACT": ("extract({0:kw} FROM {1})", 2),
    "DATE_DIFF": ("timestampdiff({0:kw}, {1}, {2})", 3),
}

_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


def _kw_arg(arg: str) -> str:
    """A quoted (or bare) literal used as a SQL keyword position."""
    a = arg.strip()
    if len(a) >= 2 and a[0] in "\"'" and a[-1] == a[0]:
        a = a[1:-1]
    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", a):
        raise ESQLError(f"expected a unit/part keyword, got: {arg!r}")
    return a


def _translate_fns(text: str) -> str:
    """Rewrite ES|QL function names to their Spark SQL forms (see maps
    above). Quote-aware, recursive through nested call arguments."""
    out: list[str] = []
    i, n = 0, len(text)

    def prev_char() -> str:
        for frag in reversed(out):
            if frag:
                return frag[-1]
        return ""

    while i < n:
        c = text[i]
        if c in "\"'":
            j = i + 1
            while j < n:
                if text[j] == "\\":
                    j += 2
                    continue
                if text[j] == c:
                    j += 1
                    break
                j += 1
            out.append(text[i:j])
            i = j
            continue
        m = _IDENT_RE.match(text, i)
        prev = prev_char()
        # NB: `prev in "_."` would be True for the empty string
        if m and not (prev.isalnum() or prev == "_" or prev == "."):
            name = m.group(0)
            j = m.end()
            while j < n and text[j] in " \t\n":
                j += 1
            if j < n and text[j] == "(":
                # balanced, quote-aware argument span
                depth, q, k = 1, None, j + 1
                while k < n and depth:
                    ch = text[k]
                    if q:
                        if ch == "\\":
                            k += 2
                            continue
                        if ch == q:
                            q = None
                    elif ch in "\"'":
                        q = ch
                    elif ch == "(":
                        depth += 1
                    elif ch == ")":
                        depth -= 1
                    k += 1
                if depth:
                    raise ESQLError(f"unbalanced parens in: {text!r}")
                args_text = text[j + 1:k - 1]
                args = (
                    [_translate_fns(a).strip()
                     for a in _split_top(args_text, ",")]
                    if args_text.strip()
                    else []
                )
                upper = name.upper()
                if upper in _FN_RENAMES:
                    out.append(
                        f"{_FN_RENAMES[upper]}({', '.join(args)})"
                    )
                elif upper in _FN_TEMPLATES:
                    tmpl, arity = _FN_TEMPLATES[upper]
                    if len(args) != arity:
                        raise ESQLError(
                            f"{upper} takes {arity} argument(s), "
                            f"got {len(args)}"
                        )
                    s = tmpl
                    for ai, a in enumerate(args):
                        kw_ph = f"{{{ai}:kw}}"
                        if kw_ph in s:
                            s = s.replace(kw_ph, _kw_arg(a))
                        s = s.replace(f"{{{ai}}}", a)
                    out.append(s)
                elif upper == "MV_SORT":
                    if len(args) == 1:
                        out.append(f"sort_array({args[0]})")
                    elif len(args) == 2:
                        order = _kw_arg(args[1]).upper()
                        if order not in ("ASC", "DESC"):
                            raise ESQLError(
                                f"MV_SORT order must be ASC or DESC, "
                                f"got {args[1]!r}"
                            )
                        asc = "true" if order == "ASC" else "false"
                        out.append(f"sort_array({args[0]}, {asc})")
                    else:
                        raise ESQLError("MV_SORT takes 1 or 2 arguments")
                else:
                    out.append(f"{name}({', '.join(args)})")
                i = k
                continue
            out.append(name)
            i = m.end()
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _x(expr: str) -> Column:
    """Compile one ES|QL expression: function translation, then Spark
    SQL evaluation (the module's documented expression contract)."""
    return F.expr(_translate_fns(expr))


# -- full-text functions (ES|QL 8.17 WHERE extensions) -------------------------

_FTQ_RE = re.compile(r"\b(QSTR|MATCH|KQL)\s*\(", re.IGNORECASE)


def _fulltext_markers(
    expr: str, field_names: list[str]
) -> tuple[str, list[Column]]:
    """Rewrite ES|QL full-text calls — ``QSTR("lucene")``,
    ``MATCH(field, "text"[, "options"])``, ``KQL("kql")`` — to hidden
    marker-column references (the same technique the ES SQL front-end
    uses), returning (rewritten expr, marker Columns). Each call
    compiles through the corresponding grammar's parser into the ONE
    shared predicate engine; Catalyst pushes the marker like any
    predicate. ES|QL string literals are double-quoted."""
    markers: list[Column] = []
    while True:
        m = _FTQ_RE.search(expr)
        if m is None:
            return expr, markers
        name = m.group(1).upper()
        # balanced-paren, quote-aware walk ("" strings, \" escapes)
        depth, j, q = 1, m.end(), False
        n = len(expr)
        while j < n and depth:
            c = expr[j]
            if q:
                if c == "\\":
                    j += 2
                    continue
                if c == '"':
                    q = False
            elif c == '"':
                q = True
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            j += 1
        if depth:
            raise ESQLError(f"unbalanced parens in {name}() call")
        argtext = expr[m.end():j - 1]
        args = [a.strip() for a in _split_top(argtext, ",")]

        def _txt(a: str) -> str:
            if len(a) >= 2 and a[0] == '"' and a[-1] == '"':
                return a[1:-1].replace('\\"', '"').replace("\\\\", "\\")
            return a

        if name == "QSTR":
            if len(args) != 1:
                raise ESQLError("QSTR takes one string argument")
            from harmonize_search_analyze_spark.plans.lucene import (
                lucene_query,
            )

            col = lucene_query(_txt(args[0]))
        elif name == "KQL":
            if len(args) != 1:
                raise ESQLError("KQL takes one string argument")
            from harmonize_search_analyze_spark.plans.kql import kql_query

            col = kql_query(_txt(args[0]), field_names=field_names)
        else:  # MATCH
            if len(args) < 2 or len(args) > 3:
                raise ESQLError("MATCH takes (field, query[, options])")
            from harmonize_search_analyze_spark.plans.es_sql import (
                _match_predicate,
            )

            col = _match_predicate(
                args[0], _txt(args[1]),
                _txt(args[2]) if len(args) == 3 else "",
            )
        idx = len(markers)
        markers.append(col)
        expr = expr[:m.start()] + f"__esql_ftq{idx}" + expr[j:]


def _agg_item(item: str) -> tuple[str, Column]:
    """A STATS/INLINESTATS aggregate: ``[name =] agg(expr) [WHERE cond]``.
    The per-aggregate WHERE (ES|QL 8.16 filtered aggregates) compiles to
    Spark's ``FILTER (WHERE ...)`` aggregate clause — still one hash agg,
    the filter never forks the scan."""
    name, expr = _assignment(item)
    expr, cond = _split_kw(expr, "WHERE")
    expr = _translate_fns(expr)
    if cond is not None:
        if not cond.strip():
            raise ESQLError(
                f"per-aggregate WHERE needs a condition: {item!r}"
            )
        expr = f"{expr} FILTER (WHERE {_translate_fns(cond)})"
    return name, F.expr(expr)


def _sort_col(item: str) -> Column:
    item = item.strip()
    nulls = None
    m = re.search(r"\bNULLS\s+(FIRST|LAST)\s*$", item, re.IGNORECASE)
    if m:
        nulls = m.group(1).upper()
        item = item[: m.start()].strip()
    direction = "ASC"
    m = re.search(r"\b(ASC|DESC)\s*$", item, re.IGNORECASE)
    if m:
        direction = m.group(1).upper()
        item = item[: m.start()].strip()
    if not item:
        raise ESQLError(
            "SORT key has no expression (a bare column literally named "
            "asc/desc/nulls needs backticks to disambiguate)"
        )
    col = _x(item)
    # ES|QL: nulls are larger than any value
    if direction == "ASC":
        return col.asc_nulls_first() if nulls == "FIRST" else col.asc_nulls_last()
    return col.desc_nulls_last() if nulls == "LAST" else col.desc_nulls_first()


def _unquote(s: str) -> str:
    s = s.strip()
    if len(s) >= 2 and s[0] == '"' and s[-1] == '"':
        return s[1:-1].replace('\\"', '"').replace("\\\\", "\\")
    raise ESQLError(f"expected a double-quoted pattern, got: {s!r}")


def run_esql(catalog, query: str, *, spark=None) -> DataFrame:
    """Execute an ES|QL pipe query against a
    :class:`~harmonize_search_analyze_spark.sources.catalog.Catalog`
    (``FROM``/``LOOKUP JOIN``/``ENRICH`` resolve through it; pass
    ``spark`` explicitly only for catalog-less ``ROW`` pipelines)."""
    pipes = [p.strip() for p in _split_top(query, "|")]
    if not pipes or not pipes[0]:
        raise ESQLError("empty query")
    spark = spark if spark is not None else getattr(catalog, "spark", None)

    df: DataFrame | None = None
    ts_ctx: tuple[str, list[str]] | None = None
    for idx, cmd in enumerate(pipes):
        word, rest = _parse_cmd(cmd)
        if idx == 0:
            if word == "TS":
                df, ts_ctx = _ts_source(catalog, rest)
                continue
            if word not in ("FROM", "ROW"):
                raise ESQLError(
                    f"query must start with FROM, ROW or TS, got {word}"
                )
        elif word in ("FROM", "ROW", "TS"):
            raise ESQLError(f"{word} is only valid as the first command")
        if word == "STATS" and ts_ctx is not None and _TS_FN_RE.search(rest):
            df = _ts_stats(df, rest, ts_ctx)
            # the rollup consumes the series context: downstream
            # commands see ordinary grouped rows
            ts_ctx = None
            continue
        df = _apply_command(df, word, rest, catalog=catalog, spark=spark)
    return df


_TS_FNS = (
    "rate", "avg_over_time", "min_over_time", "max_over_time",
    "sum_over_time", "count_over_time", "last_over_time",
    "first_over_time",
)
_TS_FN_RE = re.compile(
    r"\b(" + "|".join(_TS_FNS) + r")\s*\(", re.IGNORECASE
)
_TS_OUTER = {"avg": F.avg, "min": F.min, "max": F.max, "sum": F.sum,
             "count": F.count}


def _ts_source(catalog, rest: str):
    """``TS pattern ON ts_col BY dim[, dim...]`` — the time-series
    source command (ES 9.x ``TS``, né METRICS). PINNED DEVIATION: real
    ES derives the timestamp and dimension fields from TSDB index
    mappings; this engine has no mappings, so the series identity is
    declared inline with ON/BY."""
    if catalog is None:
        raise ESQLError("TS requires a catalog")
    m = re.match(
        r"(\S+)\s+ON\s+(\S+)\s+BY\s+(.*)$", rest, re.I | re.S
    )
    if not m:
        raise ESQLError("TS needs: TS pattern ON ts_col BY dims")
    df = catalog.resolve(m.group(1))
    ts_col = m.group(2)
    dims = [c.strip() for c in m.group(3).split(",") if c.strip()]
    missing = [c for c in (ts_col, *dims) if c not in df.columns]
    if missing:
        raise ESQLError(f"TS: unknown columns {missing}")
    return df, (ts_col, dims)


def _ts_stats(df: DataFrame, rest: str, ctx) -> DataFrame:
    """TS-mode ``STATS outer(ts_fn(col)) [, ...] BY keys``: the
    two-level time-series rollup — an inner per-(series, bucket)
    aggregation applying the ``*_over_time`` / ``rate`` function to
    each series, then the outer function combining series within the
    bucket (exactly ES's TSDB semantics: rate is per-series first, the
    outer agg never mixes counters from different series).

    ``rate`` is the reset-aware counter rate (a sample lower than its
    predecessor restarts from zero, matching
    operators.aggregations.counter_rate / PromQL): one lag window
    partitioned on (series, bucket) — the same keys as the inner hash
    agg, so the exchange is shared — then sum(increase)/timespan per
    second; series with < 2 samples in the bucket contribute NULL
    (undefined rate), which the outer agg skips like ES does."""
    from pyspark.sql import Window

    ts_col, dims = ctx
    aggs_txt, by_txt = _split_kw(rest, "BY")
    if not by_txt or not by_txt.strip():
        raise ESQLError("TS STATS needs BY bucket keys")
    keys = [_assignment(i) for i in _split_top(by_txt, ",")]
    for n, e in keys:
        df = df.withColumn(n, _x(e))
    key_names = [n for n, _ in keys]
    specs = []  # (out_name, outer, fn, col)
    for i, item in enumerate(_split_top(aggs_txt, ",")):
        item = item.strip()
        if not item:
            continue
        mm = re.fullmatch(
            r"(?:([A-Za-z_][\w.]*)\s*=\s*)?"
            r"([A-Za-z_]+)\s*\(\s*([A-Za-z_]+)\s*\(\s*"
            r"([A-Za-z_][\w.]*)\s*\)\s*\)",
            item,
        )
        if not mm:
            raise ESQLError(
                "TS STATS aggregates must be outer(ts_fn(col)) — e.g. "
                f"avg(rate(counter)); got {item!r}"
            )
        name = mm.group(1) or re.sub(r"\s+", "", item)
        outer, fn, col = (
            mm.group(2).lower(), mm.group(3).lower(), mm.group(4)
        )
        if outer not in _TS_OUTER:
            raise ESQLError(
                f"TS STATS outer fn must be one of "
                f"{sorted(_TS_OUTER)}; got {outer!r}"
            )
        if fn not in _TS_FNS:
            raise ESQLError(
                f"unknown time-series fn {fn!r}; one of {_TS_FNS}"
            )
        if col not in df.columns:
            raise ESQLError(f"TS STATS: unknown column {col!r}")
        specs.append((name, outer, fn, col))
    if not specs:
        raise ESQLError("TS STATS needs at least one aggregate")

    series_keys = [*dims, *key_names]
    inner_aggs = []
    if any(fn == "rate" for _, _, fn, _ in specs):
        df = df.withColumn("__ts_e", F.col(ts_col).cast("double"))
    for i, (name, outer, fn, col) in enumerate(specs):
        v = F.col(col).cast("double")
        tag = f"__ts{i}"
        if fn == "rate":
            # tie-stable ordering (ts, value) — same pin as
            # counter_rate, so equal timestamps can't flip the delta
            w = Window.partitionBy(*series_keys).orderBy(
                F.asc(ts_col), F.asc(v)
            )
            prev = F.lag(v, 1).over(w)
            inc = F.when(prev.isNull(), F.lit(None)).otherwise(
                F.when(v >= prev, v - prev).otherwise(v)
            )
            df = df.withColumn(f"{tag}_inc", inc)
            inner_aggs.append(
                F.try_divide(
                    F.sum(f"{tag}_inc"),
                    F.max("__ts_e") - F.min("__ts_e"),
                ).alias(tag)
            )
        elif fn == "avg_over_time":
            inner_aggs.append(F.avg(v).alias(tag))
        elif fn == "min_over_time":
            inner_aggs.append(F.min(v).alias(tag))
        elif fn == "max_over_time":
            inner_aggs.append(F.max(v).alias(tag))
        elif fn == "sum_over_time":
            inner_aggs.append(F.sum(v).alias(tag))
        elif fn == "count_over_time":
            inner_aggs.append(F.count(v).cast("double").alias(tag))
        elif fn == "last_over_time":
            inner_aggs.append(F.max_by(v, F.col(ts_col)).alias(tag))
        elif fn == "first_over_time":
            inner_aggs.append(F.min_by(v, F.col(ts_col)).alias(tag))
    per_series = df.groupBy(*series_keys).agg(*inner_aggs)
    outer_aggs = [
        _TS_OUTER[outer](F.col(f"__ts{i}")).alias(name)
        for i, (name, outer, _, _) in enumerate(specs)
    ]
    return per_series.groupBy(*key_names).agg(*outer_aggs)


def _parse_cmd(cmd: str) -> tuple[str, str]:
    m = re.match(r"([A-Za-z_]+)(?:\s+(.*))?$", cmd, re.DOTALL)
    if not m:
        raise ESQLError(f"cannot parse command: {cmd!r}")
    return m.group(1).upper(), (m.group(2) or "").strip()


def _apply_command(
    df: DataFrame | None,
    word: str,
    rest: str,
    *,
    catalog,
    spark,
    in_fork: bool = False,
) -> DataFrame:
    """Apply ONE pipe command to ``df``. FORK recurses through here for
    its branches (with ``in_fork`` set — ES|QL forbids nested FORK)."""

    if word == "FROM":
        if catalog is None:
            raise ESQLError("FROM requires a catalog")
        parts = [p.strip() for p in _split_top(rest, ",")]
        frames = [catalog.resolve(p) for p in parts]
        df = frames[0]
        for fr in frames[1:]:
            df = df.unionByName(fr, allowMissingColumns=True)
    elif word == "ROW":
        if spark is None:
            raise ESQLError("ROW requires a SparkSession")
        items = [_assignment(i) for i in _split_top(rest, ",")]
        df = spark.range(1).select(
            *[_x(e).alias(n) for n, e in items]
        )
    elif word == "WHERE":
        cond, markers = _fulltext_markers(rest, df.columns)
        if markers:
            tmp = df
            for i, col in enumerate(markers):
                tmp = tmp.withColumn(f"__esql_ftq{i}", col)
            df = tmp.where(_x(cond)).drop(
                *[f"__esql_ftq{i}" for i in range(len(markers))]
            )
        else:
            df = df.where(_x(rest))
    elif word == "EVAL":
        for n, e in [_assignment(i) for i in _split_top(rest, ",")]:
            df = df.withColumn(n, _x(e))
    elif word in ("STATS", "INLINESTATS"):
        aggs_txt, by_txt = _split_kw(rest, "BY")
        aggs = [
            _agg_item(i)
            for i in _split_top(aggs_txt, ",")
            if i.strip()
        ]
        if not aggs:
            raise ESQLError(f"{word} needs at least one aggregate")
        if by_txt is not None and not by_txt.strip():
            raise ESQLError(f"{word} BY needs at least one key")
        agg_cols = [c.alias(n) for n, c in aggs]
        if word == "STATS":
            if by_txt:
                keys = [_assignment(i) for i in _split_top(by_txt, ",")]
                key_cols = [_x(e).alias(n) for n, e in keys]
                df = df.groupBy(*key_cols).agg(*agg_cols)
            else:
                df = df.agg(*agg_cols)
        else:
            # INLINESTATS: the aggregates JOIN BACK onto every input
            # row instead of replacing them. Not a window function —
            # a window would (a) shuffle EVERY input row on the keys
            # and (b) reject composite agg expressions like
            # round(avg(v), 6) (OVER attaches to the outermost call).
            # Instead: one hash aggregate (bucket-sized exchange,
            # map-side combine) broadcast-joined back — map-only on
            # the data path, and arbitrary aggregate expressions
            # (including FILTER'd ones) evaluate in the agg.
            if by_txt:
                keys = [_assignment(i) for i in _split_top(by_txt, ",")]
                for n, e in keys:
                    df = df.withColumn(n, _x(e))
                stats = df.groupBy(
                    *[F.col(n) for n, _ in keys]
                ).agg(*agg_cols)
                # eqNullSafe: a NULL group key is a real bucket in
                # the agg; plain equality would orphan its rows
                cond = None
                for n, _ in keys:
                    c = df[n].eqNullSafe(stats[n])
                    cond = c if cond is None else cond & c
                df = df.join(F.broadcast(stats), cond, "left").drop(
                    *[stats[n] for n, _ in keys]
                )
            else:
                df = df.crossJoin(F.broadcast(df.agg(*agg_cols)))
    elif word == "SORT":
        df = df.orderBy(*[_sort_col(i) for i in _split_top(rest, ",")])
    elif word == "LIMIT":
        try:
            n = int(rest)
        except ValueError:
            raise ESQLError(f"LIMIT needs an integer, got {rest!r}")
        df = df.limit(n)
    elif word == "KEEP":
        cols = _expand_cols(_split_top(rest, ","), df.columns, "KEEP")
        df = df.select(*cols)
    elif word == "DROP":
        cols = _expand_cols(_split_top(rest, ","), df.columns, "DROP")
        df = df.drop(*cols)
    elif word == "RENAME":
        for item in _split_top(rest, ","):
            mm = re.fullmatch(
                r"\s*(\S+)\s+AS\s+(\S+)\s*", item, re.IGNORECASE
            )
            if not mm:
                raise ESQLError(f"RENAME needs 'old AS new': {item!r}")
            # withColumnRenamed silently no-ops on a missing source —
            # a typo would sail through and fail confusingly later;
            # match KEEP/DROP/MV_EXPAND's unknown-column contract
            if mm.group(1) not in df.columns:
                raise ESQLError(
                    f"RENAME: unknown column {mm.group(1)!r}"
                )
            df = df.withColumnRenamed(mm.group(1), mm.group(2))
    elif word in ("DISSECT", "GROK"):
        mm = re.match(r"(\S+)\s+(\".*\")\s*$", rest, re.DOTALL)
        if not mm:
            raise ESQLError(f'{word} needs: {word} field "pattern"')
        field, pattern = mm.group(1), _unquote(mm.group(2))
        # one extraction implementation: the ingest pipeline's own
        # dissect/grok processors (semantics fixes land once)
        from harmonize_search_analyze_spark.operators.ingest_pipeline import (
            apply_processor,
        )

        df = apply_processor(
            df, word.lower(), {"field": field, "pattern": pattern}
        )
    elif word == "MV_EXPAND":
        col = rest.strip()
        if col not in df.columns:
            raise ESQLError(f"MV_EXPAND: unknown column {col!r}")
        others = [c for c in df.columns if c != col]
        # explode_outer: a null/empty multivalue keeps its row with a
        # NULL element (ES|QL's own mv_expand null behavior)
        df = df.select(*others, F.explode_outer(F.col(col)).alias(col))
    elif word == "LOOKUP":
        mm = re.match(r"JOIN\s+(\S+)\s+ON\s+(\S+)\s*$", rest, re.IGNORECASE)
        if not mm:
            raise ESQLError("LOOKUP needs: LOOKUP JOIN index ON col")
        if catalog is None:
            raise ESQLError("LOOKUP JOIN requires a catalog")
        lookup = catalog.resolve(mm.group(1))
        key = mm.group(2)
        # ES|QL shadowing: on a name collision the lookup index's
        # column REPLACES the input's — drop the input twin first so
        # the joined schema never carries ambiguous duplicates
        shadowed = [
            c for c in lookup.columns if c != key and c in df.columns
        ]
        if shadowed:
            df = df.drop(*shadowed)
        # lookup indexes are small by ES|QL contract -> broadcast;
        # left join keeps unmatched rows (ES|QL join semantics)
        df = df.join(F.broadcast(lookup), on=key, how="left")
    elif word == "CHANGE_POINT":
        mm = re.match(r"(\S+)\s+ON\s+(\S+)\s*$", rest, re.IGNORECASE)
        if not mm:
            raise ESQLError(
                "CHANGE_POINT needs: CHANGE_POINT value ON key"
            )
        from harmonize_search_analyze_spark.operators.aggregations import (
            change_point,
        )

        df = change_point(df, mm.group(2), mm.group(1))
    elif word == "ENRICH":
        # ENRICH policy [ON match_field] [WITH [new =] field, ...]
        # The policy is a registered lookup frame (Catalog.register_enrich
        # — the `.enrich-*` materialized-index equivalent): broadcast
        # left join on the match field, enrich columns SHADOW input
        # columns (ES's enrich processor semantics, same as LOOKUP JOIN).
        if catalog is None or not hasattr(catalog, "enrich_policy"):
            raise ESQLError("ENRICH requires a catalog with enrich policies")
        head, with_txt = _split_kw(rest, "WITH")
        head, on_field = _split_kw(head, "ON")
        policy_name = head.strip()
        if not policy_name:
            raise ESQLError("ENRICH needs a policy name")
        try:
            lookup, match_field, enrich_fields = catalog.enrich_policy(
                policy_name
            )
        except KeyError:
            raise ESQLError(f"ENRICH: unknown policy {policy_name!r}")
        key = (on_field or match_field).strip()
        if key not in df.columns:
            raise ESQLError(f"ENRICH: unknown match column {key!r}")
        picks: list[tuple[str, str]] = []  # (output name, policy field)
        if with_txt is not None:
            if not with_txt.strip():
                raise ESQLError("ENRICH WITH needs at least one field")
            for item in _split_top(with_txt, ","):
                new, fld = _assignment(item)
                if fld not in enrich_fields:
                    raise ESQLError(
                        f"ENRICH: {fld!r} is not an enrich field of "
                        f"policy {policy_name!r}"
                    )
                picks.append((new, fld))
        else:
            picks = [(f, f) for f in enrich_fields]
        side = lookup.select(
            F.col(match_field).alias(key),
            *[F.col(fld).alias(new) for new, fld in picks],
        )
        shadowed = [
            n for n, _ in picks if n in df.columns and n != key
        ]
        if shadowed:
            df = df.drop(*shadowed)
        base_cols = df.columns
        # USING-join puts the key first; ES keeps the input layout with
        # the enrich fields appended — re-project to that order
        df = df.join(F.broadcast(side), on=key, how="left").select(
            *base_cols, *[n for n, _ in picks]
        )
    elif word == "SAMPLE":
        # SAMPLE probability [seed] — Bernoulli row sample. With a seed
        # the sample is reproducible for a fixed partitioning (Spark's
        # sample contract); without one ES|QL's own command is random
        # too. Map-only: the filter rides the scan, no shuffle.
        parts = rest.split()
        if not 1 <= len(parts) <= 2:
            raise ESQLError("SAMPLE needs: SAMPLE probability [seed]")
        try:
            p = float(parts[0])
        except ValueError:
            raise ESQLError(f"SAMPLE probability must be numeric: {rest!r}")
        if not 0 < p < 1:
            raise ESQLError("SAMPLE probability must be in (0, 1)")
        seed = None
        if len(parts) == 2:
            try:
                seed = int(parts[1])
            except ValueError:
                raise ESQLError(f"SAMPLE seed must be an integer: {rest!r}")
        df = df.sample(p, seed=seed)
    elif word == "RERANK":
        # RERANK [target =] "query" ON f1, f2 WITH <endpoint|{json}>
        # (8.18 inference re-scoring). The endpoint resolves through
        # Catalog.register_inference; the supported rerank model is the
        # deterministic term_overlap stand-in (matched distinct query
        # tokens / total query tokens over the concatenated ON fields,
        # pinned tokenizer) — neural re-rankers can't run here, and the
        # registry raises with guidance for any other type. Docs
        # recommend LIMIT before RERANK; like ES|QL, no implicit sort —
        # follow with SORT <target> DESC.
        m = re.match(
            r'(?:([A-Za-z_][\w.]*)\s*=\s*)?"((?:[^"\\]|\\.)*)"\s+'
            r"ON\s+(.*?)\s+WITH\s+(.*)$",
            rest,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ESQLError(
                'RERANK needs: RERANK [target =] "query" ON fields '
                f"WITH endpoint — got {rest!r}"
            )
        target = m.group(1) or "_score"
        qtext = m.group(2).replace('\\"', '"').replace("\\\\", "\\")
        fields = [f.strip() for f in _split_top(m.group(3), ",")]
        for f_ in fields:
            if f_ not in df.columns:
                raise ESQLError(f"RERANK: unknown column {f_!r}")
        endpoint = _inference_endpoint(catalog, m.group(4))
        if endpoint.get("task_type") != "rerank":
            raise ESQLError(
                "RERANK endpoint must have task_type=rerank"
            )
        mtype = endpoint.get("type", "term_overlap")
        if mtype != "term_overlap":
            raise ESQLError(
                f"rerank model type {mtype!r} needs an external "
                "inference service; only the deterministic "
                "term_overlap stand-in runs in-engine"
            )
        from harmonize_search_analyze_spark.operators.text import (
            term_overlap_sql,
        )

        try:
            score = term_overlap_sql(
                qtext, [f"`{f_}`" for f_ in fields], "spark"
            )
        except ValueError as exc:
            raise ESQLError(f"RERANK: {exc}") from exc
        df = df.withColumn(target, F.expr(score))
    elif word == "COMPLETION":
        # COMPLETION [target =] prompt_expr WITH <endpoint|{json}>.
        # A real completion needs an LLM; the in-engine stand-in is the
        # echo_template endpoint ({"task_type": "completion", "type":
        # "echo_template", "template": "... {prompt} ..."}) — the
        # command plumbing (expression compile, column wiring) is real
        # and tested, the model deterministically templates the prompt.
        m = re.match(
            r"(?:([A-Za-z_][\w.]*)\s*=\s*)?(.*?)\s+WITH\s+(.*)$",
            rest,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ESQLError(
                "COMPLETION needs: COMPLETION [target =] prompt "
                f"WITH endpoint — got {rest!r}"
            )
        target = m.group(1) or "completion"
        prompt = _x(m.group(2))
        endpoint = _inference_endpoint(catalog, m.group(3))
        if endpoint.get("task_type") != "completion":
            raise ESQLError(
                "COMPLETION endpoint must have task_type=completion"
            )
        if endpoint.get("type") != "echo_template":
            raise NotImplementedError(
                "completion inference needs an external LLM endpoint; "
                "only the deterministic echo_template stand-in runs "
                "in-engine (register_inference(..., {'task_type': "
                "'completion', 'type': 'echo_template', 'template': "
                "'... {prompt} ...'}))"
            )
        template = endpoint.get("template", "{prompt}")
        if template.count("{prompt}") != 1:
            raise ESQLError(
                "echo_template needs exactly one {prompt} placeholder"
            )
        pre, post = template.split("{prompt}")
        df = df.withColumn(
            target,
            F.concat(F.lit(pre), prompt.cast("string"), F.lit(post)),
        )
    elif word == "FORK":
        # FORK (pipeline) (pipeline) ... — run each branch on the current
        # input and union the results, tagged with a _fork discriminator
        # ("fork1", "fork2", ... in branch order; ES|QL's column of the
        # same name). One Catalyst plan: the input subtree is shared by
        # every branch, the union is byName with null-padding.
        if in_fork:
            raise ESQLError("FORK cannot be nested")
        branches = _fork_branches(rest)
        if len(branches) < 2:
            raise ESQLError("FORK needs at least two (branch) pipelines")
        outs = []
        for bi, btext in enumerate(branches, 1):
            bdf = df
            for bcmd in [p.strip() for p in _split_top(btext, "|")]:
                if not bcmd:
                    raise ESQLError("empty command in FORK branch")
                w2, r2 = _parse_cmd(bcmd)
                if w2 in ("FROM", "ROW"):
                    raise ESQLError(
                        f"{w2} is not valid inside a FORK branch"
                    )
                bdf = _apply_command(
                    bdf, w2, r2, catalog=catalog, spark=spark,
                    in_fork=True,
                )
            outs.append(bdf.withColumn("_fork", F.lit(f"fork{bi}")))
        df = outs[0]
        for o in outs[1:]:
            df = df.unionByName(o, allowMissingColumns=True)
    elif word == "FUSE":
        df = _fuse(df, rest)
    else:
        raise ESQLError(f"unsupported command: {word}")
    return df


def _fuse(df: DataFrame, rest: str) -> DataFrame:
    """``FUSE [rrf|linear [minmax]] [KEY BY col, ...] [WITH k = <int>]``
    — merge FORK branch results into one fused ranking (the 9.x command
    that closes the FORK story): per branch, rank = dense order of
    ``_score`` descending; rrf fuses by sum 1/(k + rank) (Cormack et
    al. 2009 — the same arithmetic as operators/ranking.rrf_fuse),
    linear by summing ``_score`` — raw, or per-branch minmax-rescaled
    to [0, 1] (the ES linear-retriever normalizer, for uncalibrated
    scorers). One window + one hash agg, both keyed by bounded branch
    output — fusion is metadata-sized work after the retrievals, same
    as the retriever tree.

    Pinned details: key defaults to ``_id`` (raise with guidance when
    absent); non-key columns carry the value from the row with the
    LOWEST (branch rank, _fork) — the first-branch-occurrence rule;
    output replaces ``_score`` with the fused score (rounded 6), drops
    ``_fork``, sorts score DESC then keys ASC."""
    from pyspark.sql import Window

    toks = rest.strip()
    method = "rrf"
    m = re.match(r"^(rrf|linear)\b(.*)$", toks, re.I | re.S)
    if m:
        method = m.group(1).lower()
        toks = m.group(2).strip()
    normalizer = "none"
    m = re.match(r"^(minmax|none)\b(.*)$", toks, re.I | re.S)
    if m:
        if method != "linear":
            raise ESQLError(
                "FUSE: a normalizer only applies to linear fusion"
            )
        normalizer = m.group(1).lower()
        toks = m.group(2).strip()
    keys: list[str] | None = None
    m = re.match(r"^KEY\s+BY\s+(.*?)(?:\bWITH\b.*)?$", toks, re.I | re.S)
    if m:
        keys = [c.strip() for c in m.group(1).strip().split(",")]
    rrf_k = 60
    m = re.search(r"\bWITH\s+k\s*=\s*(\d+)\s*$", toks, re.I)
    if m:
        rrf_k = int(m.group(1))
    if "_fork" not in df.columns:
        raise ESQLError("FUSE requires FORK output (no _fork column)")
    if "_score" not in df.columns:
        raise ESQLError(
            "FUSE requires a _score column — EVAL one per branch"
        )
    if keys is None:
        if "_id" not in df.columns:
            raise ESQLError(
                "FUSE needs a key: no _id column — use KEY BY <cols>"
            )
        keys = ["_id"]
    missing = [k for k in keys if k not in df.columns]
    if missing:
        raise ESQLError(f"FUSE KEY BY unknown columns: {missing}")
    wb = Window.partitionBy("_fork").orderBy(
        F.desc("_score"), *[F.asc(k) for k in keys]
    )
    ranked = df.withColumn("__rank", F.row_number().over(wb))
    if method == "rrf":
        contrib = F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("__rank"))
    elif normalizer == "minmax":
        # ES linear-retriever minmax: each branch's scores rescale to
        # [0, 1] before summing, so uncalibrated scorers (BM25 vs
        # cosine) weigh equally; a constant-score branch contributes 1
        # (its max). Two more window aggs on the SAME _fork partition
        # — no extra exchange.
        wf = Window.partitionBy("_fork")
        s = F.col("_score").cast("double")
        lo, hi = F.min(s).over(wf), F.max(s).over(wf)
        ranked = ranked.withColumn(
            "__contrib",
            F.when(hi == lo, F.lit(1.0)).otherwise(
                (s - lo) / (hi - lo)
            ),
        )
        contrib = F.col("__contrib")
    else:
        contrib = F.col("_score").cast("double")
    passthru = [
        c for c in df.columns if c not in (*keys, "_fork", "_score")
    ]
    first = F.min(
        F.struct("__rank", "_fork", *passthru)
    ).alias("__first")
    fused = (
        ranked.groupBy(*keys)
        .agg(F.round(F.sum(contrib), 6).alias("_score"), first)
        .select(
            *keys,
            *[F.col(f"__first.{c}").alias(c) for c in passthru],
            "_score",
        )
        .orderBy(F.desc("_score"), *[F.asc(k) for k in keys])
    )
    return fused


def _fork_branches(rest: str) -> list[str]:
    """Split ``(branch) (branch) ...`` into branch pipeline texts."""
    branches: list[str] = []
    i, n = 0, len(rest)
    while i < n:
        c = rest[i]
        if c in " \t\n":
            i += 1
            continue
        if c != "(":
            raise ESQLError(
                f"FORK branches must be parenthesized, got: {rest[i:]!r}"
            )
        depth, q, j = 1, None, i + 1
        while j < n and depth:
            ch = rest[j]
            if q:
                if ch == "\\":
                    j += 2
                    continue
                if ch == q:
                    q = None
            elif ch in "\"'":
                q = ch
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            j += 1
        if depth:
            raise ESQLError(f"unbalanced parens in FORK: {rest!r}")
        branches.append(rest[i + 1:j - 1].strip())
        i = j
    return branches


def _inference_endpoint(catalog, spec: str) -> dict:
    """Resolve a RERANK/COMPLETION WITH clause: either a bare endpoint
    id or the ES JSON form ``{"inference_id": "..."}``."""
    import json as _json

    if catalog is None:
        raise ESQLError("RERANK/COMPLETION require a catalog")
    spec = spec.strip()
    if spec.startswith("{"):
        try:
            obj = _json.loads(spec)
        except ValueError as exc:
            raise ESQLError(f"bad WITH spec: {spec!r}") from exc
        ident = obj.get("inference_id")
        if not ident:
            raise ESQLError("WITH object needs inference_id")
    else:
        ident = spec.strip("`\"'")
    try:
        return catalog.inference_endpoint(ident)
    except KeyError as exc:
        raise ESQLError(str(exc)) from exc
