"""Elasticsearch SQL (the ``_sql`` endpoint) — the fourth query grammar
over the one engine.

Reference parity: the reference stack exposes its data through
Elasticsearch, whose SQL front-end (``POST _sql {"query": "..."}``')
accepts a single-index SELECT dialect with full-text extensions. The
translation strategy here leans on Spark being a *real* SQL engine:

- the statement body (SELECT / WHERE / GROUP BY / HAVING / ORDER BY /
  LIMIT, scalar + aggregate functions) passes through to ``spark.sql``
  — Catalyst speaks the ANSI core natively, so nothing is reimplemented;
- ES SQL's double-quoted identifiers become backticks (quote-aware);
- the full-text extensions — ``MATCH(field[s], 'query'[, 'options'])``
  and ``QUERY('lucene text')`` — cannot be spelled in Spark SQL, so each
  call is compiled to a Column predicate by the SAME machinery behind
  the DSL/KQL/ES|QL grammars (pinned ``.split`` tokenizer /
  ``phrase_predicate``; ``QUERY`` routes through the KQL parser's
  Lucene-compatible subset) and materialized as a hidden boolean column
  on an augmented temp view; the call site in the SQL text is rewritten
  to reference that column. Catalyst then pushes/folds it like any other
  predicate;
- ``FROM "index-pattern"`` resolves through the session
  :class:`..sources.catalog.Catalog` (wildcards + aliases), honoring
  ES SQL's own single-index constraint (no joins — ES SQL has none);
- ``SHOW TABLES`` / ``DESCRIBE <index>`` map to catalog/schema listings.
- ``SCORE()`` raises with guidance: relevance-ranked reads live in
  ``operators/ranking.py`` (bm25_search), filter-context SQL has no
  score column.

Scale: translation is driver-side string/AST work on bytes of SQL; the
executed plan is exactly the plan Spark would build for the rewritten
statement — full-text markers are codegen'd regex predicates, so they
push into the scan like hand-written filters.
"""

from __future__ import annotations

import re
from typing import Any

from harmonize_search_analyze_spark.sources.tables import local_frame

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from harmonize_search_analyze_spark.functions.tokenize import (
    phrase_predicate,
)

__all__ = ["ESSQLError", "run_es_sql", "translate_full_text"]


class ESSQLError(ValueError):
    pass


def _scan_call(sql: str, name: str, start: int = 0) -> tuple[int, int, str] | None:
    """Find the next top-level ``name(...)`` call outside single-quoted
    strings; return (start, end_exclusive, argtext) or None."""
    pat = re.compile(rf"\b{name}\s*\(", re.IGNORECASE)
    i, n = start, len(sql)
    in_q = False
    while i < n:
        c = sql[i]
        if in_q:
            if c == "'":
                # '' is the escaped quote inside ES SQL strings
                if i + 1 < n and sql[i + 1] == "'":
                    i += 2
                    continue
                in_q = False
            i += 1
            continue
        if c == "'":
            in_q = True
            i += 1
            continue
        m = pat.match(sql, i)
        if m:
            # walk to the balanced close paren, quote-aware
            depth, j, q = 1, m.end(), False
            while j < n and depth:
                cj = sql[j]
                if q:
                    if cj == "'":
                        if j + 1 < n and sql[j + 1] == "'":
                            j += 2
                            continue
                        q = False
                elif cj == "'":
                    q = True
                elif cj == "(":
                    depth += 1
                elif cj == ")":
                    depth -= 1
                j += 1
            if depth:
                raise ESSQLError(f"unbalanced parens in {name}() call")
            return m.start(), j, sql[m.end():j - 1]
        i += 1
    return None


def _split_args(argtext: str) -> list[str]:
    """Split call args on top-level commas (quote/paren aware)."""
    out, buf, depth, q = [], [], 0, False
    i, n = 0, len(argtext)
    while i < n:
        c = argtext[i]
        if q:
            buf.append(c)
            if c == "'":
                if i + 1 < n and argtext[i + 1] == "'":
                    buf.append("'")
                    i += 2
                    continue
                q = False
        elif c == "'":
            q = True
            buf.append(c)
        elif c == "(":
            depth += 1
            buf.append(c)
        elif c == ")":
            depth -= 1
            buf.append(c)
        elif c == "," and depth == 0:
            out.append("".join(buf).strip())
            buf = []
        else:
            buf.append(c)
        i += 1
    if buf:
        out.append("".join(buf).strip())
    return [a for a in out if a]


def _unquote(arg: str) -> str:
    """String literal -> text ('' unescapes); bare identifier -> itself;
    double-quoted identifier -> inner name."""
    if len(arg) >= 2 and arg[0] == "'" and arg[-1] == "'":
        return arg[1:-1].replace("''", "'")
    if len(arg) >= 2 and arg[0] == '"' and arg[-1] == '"':
        return arg[1:-1]
    return arg


def _parse_options(text: str) -> dict[str, str]:
    """ES SQL full-text options string: 'k=v;k=v'."""
    out: dict[str, str] = {}
    for pair in text.split(";"):
        pair = pair.strip()
        if not pair:
            continue
        if "=" not in pair:
            raise ESSQLError(f"bad full-text option {pair!r}")
        k, _, v = pair.partition("=")
        out[k.strip().lower()] = v.strip()
    return out


def _match_predicate(fields_arg: str, query: str, options: str) -> Column:
    """ES SQL MATCH(): OR over fields; per field, the pinned tokenizer's
    full-token match per query term, combined per the ``operator``
    option (default OR, ES's match default)."""
    opts = _parse_options(options)
    op = opts.get("operator", "or").lower()
    if op not in ("or", "and"):
        raise ESSQLError(f"MATCH operator must be or/and, got {op!r}")
    fields = []
    for f in _unquote(fields_arg).split(","):
        f = f.strip()
        if not f:
            continue
        # strip the ES field boost (irrelevant in filter context)
        fields.append(f.split("^")[0])
    if not fields:
        raise ESSQLError("MATCH needs at least one field")
    terms = [w for w in re.split(r"[^a-zA-Z0-9]+", query) if w]
    if not terms:
        return F.lit(True)
    per_field = []
    for f in fields:
        flags = [phrase_predicate(f, t) for t in terms]
        acc = flags[0]
        for fl in flags[1:]:
            acc = (acc & fl) if op == "and" else (acc | fl)
        per_field.append(acc)
    out = per_field[0]
    for p in per_field[1:]:
        out = out | p
    return out


def _query_predicate(query: str, options: str, field_names: list[str]) -> Column:
    """ES SQL QUERY(): the classic Lucene query-string syntax, served by
    the full parser (plans/lucene.py — fuzzy, phrases+slop, bracket
    ranges, +/- clauses). ``default_field`` option supported."""
    from harmonize_search_analyze_spark.plans.lucene import lucene_query

    opts = _parse_options(options)
    default = opts.get("default_field")
    return lucene_query(
        query,
        default_fields=[default] if default else None,
    )


def _quote_idents(sql: str) -> str:
    """ES SQL double-quoted identifiers -> Spark backticks (quote-aware:
    double quotes inside single-quoted strings pass through)."""
    out, i, n, q = [], 0, len(sql), False
    while i < n:
        c = sql[i]
        if q:
            out.append(c)
            if c == "'":
                if i + 1 < n and sql[i + 1] == "'":
                    out.append("'")
                    i += 2
                    continue
                q = False
            i += 1
            continue
        if c == "'":
            q = True
            out.append(c)
            i += 1
            continue
        if c == '"':
            j = sql.find('"', i + 1)
            if j < 0:
                raise ESSQLError("unbalanced double quote")
            out.append("`" + sql[i + 1:j] + "`")
            i = j + 1
            continue
        out.append(c)
        i += 1
    return "".join(out)


_FROM_RE = re.compile(r"\bFROM\s+(`[^`]+`|[\w*.-]+)", re.IGNORECASE)
_SHOW_TABLES_RE = re.compile(r"^\s*SHOW\s+TABLES\s*;?\s*$", re.IGNORECASE)
_DESCRIBE_RE = re.compile(
    r"^\s*(?:DESCRIBE|DESC)\s+(`[^`]+`|[\w*.-]+)\s*;?\s*$", re.IGNORECASE
)


def translate_full_text(
    sql: str, field_names: list[str]
) -> tuple[str, list[Column]]:
    """Rewrite every MATCH()/QUERY() call to a hidden marker column
    reference; return (rewritten sql, marker Columns in order)."""
    markers: list[Column] = []
    for name in ("MATCH", "QUERY"):
        while True:
            hit = _scan_call(sql, name)
            if hit is None:
                break
            s, e, argtext = hit
            args = _split_args(argtext)
            if name == "MATCH":
                if len(args) < 2 or len(args) > 3:
                    raise ESSQLError("MATCH takes (fields, query[, options])")
                col = _match_predicate(
                    args[0], _unquote(args[1]),
                    _unquote(args[2]) if len(args) == 3 else "",
                )
            else:
                if len(args) < 1 or len(args) > 2:
                    raise ESSQLError("QUERY takes (query[, options])")
                col = _query_predicate(
                    _unquote(args[0]),
                    _unquote(args[1]) if len(args) == 2 else "",
                    field_names,
                )
            idx = len(markers)
            markers.append(col)
            sql = sql[:s] + f"__es_ftq{idx}" + sql[e:]
    return sql, markers


def run_es_sql(catalog, sql: str) -> DataFrame:
    """Execute an ES SQL statement against the catalog. See module
    docstring for the supported surface."""
    spark = catalog.spark
    if _SHOW_TABLES_RE.match(sql):
        return local_frame(
            spark, [(n,) for n in catalog.names()], "name STRING"
        )
    m = _DESCRIBE_RE.match(sql)
    if m:
        pattern = m.group(1).strip("`")
        df = catalog.resolve(pattern)
        rows = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
        return local_frame(spark, rows, "column STRING, type STRING")
    if re.search(r"\bSCORE\s*\(", sql, re.IGNORECASE):
        raise ESSQLError(
            "SCORE() is not available in filter-context SQL; use "
            "operators.ranking.bm25_search for relevance-ranked reads"
        )
    sql = _quote_idents(sql)
    fm = _FROM_RE.search(sql)
    if not fm:
        # literal SELECTs (SELECT 1 + 1) need no index
        return spark.sql(sql)
    pattern = fm.group(1).strip("`")
    src = catalog.resolve(pattern)
    view = "__es_sql_" + re.sub(r"[^A-Za-z0-9_]", "_", pattern)
    # swap the FROM target BEFORE full-text rewriting moves offsets
    sql = sql[:fm.start(1)] + view + sql[fm.start(1) + len(fm.group(1)):]
    rewritten, markers = translate_full_text(sql, src.columns)
    aug = src
    for i, col in enumerate(markers):
        aug = aug.withColumn(f"__es_ftq{i}", col)
    aug.createOrReplaceTempView(view)
    return spark.sql(rewritten).drop(
        *[f"__es_ftq{i}" for i in range(len(markers))]
    )
