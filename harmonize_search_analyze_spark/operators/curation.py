"""Corpus-cleaning operators: C4-style text normalization and Gopher-style
repetition signals.

The published web-corpus recipes (C4: Raffel et al. 2020, "Exploring the
Limits of Transfer Learning"; Gopher: Rae et al. 2021, quality-filter
appendix) reduce to two families:

- **normalization**: strip URLs/emails, collapse whitespace, drop lines
  that don't look like prose (too few words, no terminal punctuation,
  boilerplate markers). Pure per-row string work — map-only, codegen'd,
  scan-bound at 100 TB.
- **repetition signals**: fraction of duplicate lines / tokens, share of
  the most-frequent line / token. High values mark boilerplate and
  degenerate generations. Expressed relationally (explode -> two-level
  count) so Spark's partial aggregation does the heavy lifting and the
  DuckDB oracle can replay it exactly.

All formulas are dual-dialect; ratios are computed raw and rounded once at
the end (cross-engine float discipline, see PERFORMANCE.md).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from harmonize_search_analyze_spark.operators.text import tokens_sql

# regexes are RE2/Java-compatible subsets; Spark SQL string literals process
# backslash escapes (hence the doubling), DuckDB's do not
_URL_PAT = r"https?://[^\s]+"
_EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_LINE_END_PAT = '[.!?"]\\s*$'
_WS_PAT = r"\s+"

BOILERPLATE_MARKERS = ("lorem ipsum", "javascript", "cookies")


def _pat(p: str, dialect: str) -> str:
    """Quote a regex for a SQL string literal in the given dialect."""
    if dialect == "spark":
        return "'" + p.replace("\\", "\\\\") + "'"
    return "'" + p + "'"


def clean_text_sql(expr: str, dialect: str) -> str:
    """C4-style normalization: strip URLs and emails, collapse whitespace
    runs to single spaces, trim. DuckDB's regexp_replace replaces only the
    first match without the 'g' flag — Spark's always replaces all."""
    g = ", 'g'" if dialect == "duckdb" else ""
    out = f"regexp_replace({expr}, {_pat(_URL_PAT, dialect)}, ''{g})"
    out = f"regexp_replace({out}, {_pat(_EMAIL_PAT, dialect)}, ''{g})"
    out = f"regexp_replace({out}, {_pat(_WS_PAT, dialect)}, ' '{g})"
    return f"trim({out})"


def c4_line_filter_sql(
    expr: str, dialect: str, *, min_words: int = 3
) -> str:
    """C4's line-level prose filter: keep only lines with at least
    ``min_words`` words AND terminal punctuation, and without boilerplate
    markers; re-join survivors with newlines. Empty result -> empty string
    (document then falls to the length filters downstream)."""
    markers = " OR ".join(
        f"contains(lower(l), '{m}')" for m in BOILERPLATE_MARKERS
    )
    if dialect == "spark":
        wc = "size(filter(split(lower(l), '[^a-z0-9]+'), t -> t != ''))"
        ends = f"l rlike {_pat(_LINE_END_PAT, dialect)}"
        pred = f"{wc} >= {min_words} AND ({ends}) AND NOT ({markers})"
        return (
            f"array_join(filter(split({expr}, '\\n'), l -> {pred}), '\\n')"
        )
    wc = "len(list_filter(regexp_split_to_array(lower(l), '[^a-z0-9]+'), t -> t != ''))"
    ends = f"regexp_matches(l, {_pat(_LINE_END_PAT, dialect)})"
    pred = f"{wc} >= {min_words} AND ({ends}) AND NOT ({markers})"
    # COALESCE: DuckDB array_to_string of an empty (all-lines-filtered)
    # list is NULL; the contract — and Spark's array_join — say ''
    return (
        f"COALESCE(array_to_string(list_filter(string_split({expr}, chr(10)), "
        f"l -> {pred}), chr(10)), '')"
    )


def clean_text(col: str) -> Column:
    return F.expr(clean_text_sql(col, "spark"))


def c4_filter_lines(col: str, *, min_words: int = 3) -> Column:
    return F.expr(c4_line_filter_sql(col, "spark", min_words=min_words))


# -- repetition signals -------------------------------------------------------


def _unit_exploded(
    df: DataFrame, id_col: str, text_col: str, unit: str
) -> DataFrame:
    if unit == "token":
        arr = F.expr(tokens_sql(text_col, "spark"))
    elif unit == "line":
        arr = F.split(F.col(text_col), "\n")
    else:
        raise ValueError("unit must be 'token' or 'line'")
    return df.select(F.col(id_col), F.explode(arr).alias("u"))


def repetition_signals(
    df: DataFrame, id_col: str, text_col: str, *, unit: str = "token"
) -> DataFrame:
    """Gopher-style repetition profile per document:

    - ``n_units`` / ``distinct_units``: total and distinct lines or tokens
    - ``dup_frac``: 1 - distinct/total (0 = no repetition)
    - ``top_share``: most frequent unit's share of the document

    Two hash aggregations — per (doc, unit) count, then per doc — both
    map-side combinable; no windows, no Python."""
    per_unit = (
        _unit_exploded(df, id_col, text_col, unit)
        .groupBy(id_col, "u")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        per_unit.groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_units"),
            F.count(F.lit(1)).alias("distinct_units"),
            F.max("cnt").alias("top_cnt"),
        )
        .select(
            id_col,
            "n_units",
            "distinct_units",
            F.round(
                1.0 - F.col("distinct_units") / F.col("n_units"), 6
            ).alias("dup_frac"),
            F.round(F.col("top_cnt") / F.col("n_units"), 6).alias("top_share"),
        )
    )


def repetition_signals_sql(
    table: str, id_col: str, text_col: str, *, unit: str = "token"
) -> str:
    """DuckDB oracle twin of repetition_signals."""
    if unit == "token":
        arr = tokens_sql(text_col, "duckdb")
    elif unit == "line":
        arr = f"string_split({text_col}, chr(10))"
    else:
        raise ValueError("unit must be 'token' or 'line'")
    return f"""
WITH exploded AS (
  SELECT {id_col}, unnest({arr}) AS u FROM {table}
), per_unit AS (
  SELECT {id_col}, u, COUNT(*) AS cnt FROM exploded GROUP BY 1, 2
)
SELECT {id_col},
       CAST(SUM(cnt) AS BIGINT) AS n_units,
       COUNT(*) AS distinct_units,
       ROUND(1.0 - COUNT(*) / CAST(SUM(cnt) AS DOUBLE), 6) AS dup_frac,
       ROUND(MAX(cnt) / CAST(SUM(cnt) AS DOUBLE), 6) AS top_share
FROM per_unit GROUP BY {id_col}
"""


# -- PII detection / redaction ------------------------------------------------

# patterns are deliberately conservative/high-precision (curation filters
# redact or route to review; recall tuning is a policy knob, not engine
# logic). RE2/Java-compatible: no lookarounds.
_PHONE_PAT = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
_SSN_PAT = r"\b\d{3}-\d{2}-\d{4}\b"
_IPV4_PAT = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_PII_FAMILIES = [
    ("emails", _EMAIL_PAT, "[EMAIL]"),
    ("ssns", _SSN_PAT, "[SSN]"),          # before phone: 3-2-4 vs 3-3-4
    ("phones", _PHONE_PAT, "[PHONE]"),
    ("ips", _IPV4_PAT, "[IP]"),
]


def pii_counts_sql(expr: str, dialect: str) -> dict[str, str]:
    """Per-family PII match counts (n_emails, n_ssns, n_phones, n_ips) as
    dual-dialect SQL expressions — map-only, codegen'd, scan-bound."""
    n = "size" if dialect == "spark" else "len"
    out = {}
    for name, pat, _ in _PII_FAMILIES:
        if dialect == "spark":
            e = f"{n}(regexp_extract_all({expr}, {_pat(pat, dialect)}, 0))"
        else:
            e = f"{n}(regexp_extract_all({expr}, {_pat(pat, dialect)}))"
        out[f"n_{name}"] = f"CAST({e} AS BIGINT)"
    return out


def redact_pii_sql(expr: str, dialect: str) -> str:
    """Replace every PII match with its family placeholder ([EMAIL],
    [SSN], [PHONE], [IP]) — family order fixed so overlapping patterns
    (SSN vs phone) resolve deterministically on both engines."""
    g = ", 'g'" if dialect == "duckdb" else ""
    out = expr
    for _, pat, tag in _PII_FAMILIES:
        out = f"regexp_replace({out}, {_pat(pat, dialect)}, '{tag}'{g})"
    return out


def pii_scan(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document PII signals + redaction digest: family counts, an
    any-PII flag, and the md5 of the redacted text (the digest lets the
    gate verify the redaction output without shipping full text). One
    scan, zero shuffles beyond the caller's sink."""
    counts = pii_counts_sql(text_col, "spark")
    total = " + ".join(counts.values())
    return df.select(
        id_col,
        *[F.expr(e).alias(k) for k, e in counts.items()],
        F.expr(f"({total}) > 0").alias("has_pii"),
        F.expr(f"md5({redact_pii_sql(text_col, 'spark')})").alias(
            "redacted_md5"
        ),
    )


def pii_scan_oracle_sql(
    doc_table: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB SQL replaying pii_scan (same patterns, same family order)."""
    counts = pii_counts_sql(text_col, "duckdb")
    cols = ",\n       ".join(f"{e} AS {k}" for k, e in counts.items())
    total = " + ".join(counts.values())
    return f"""
SELECT {id_col},
       {cols},
       ({total}) > 0 AS has_pii,
       md5({redact_pii_sql(text_col, 'duckdb')}) AS redacted_md5
FROM {doc_table} ORDER BY {id_col}
"""


def corpus_profile(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str | None = "lang",
) -> DataFrame:
    """One-row corpus datasheet — the summary block of a dataset card:
    document/char/token totals, average document length, exact duplicate
    rate (per md5 digest), and the majority language.

    Three bounded pieces over one scan lineage: the token/char metrics
    ride a single hash agg; the exact distinct-digest count runs as its
    OWN aggregate (mixing count_distinct into a regular agg triggers
    Catalyst's Expand plan — the measured ~150x profiler cliff, see
    PERFORMANCE.md) and joins back via a broadcast 1-row crossJoin, as
    does the top-language row (a terms top-1)."""
    from harmonize_search_analyze_spark.operators.text import (
        token_count_sql,
    )

    ok = df.where(F.col(text_col).isNotNull())
    toks = F.expr(token_count_sql(text_col, "spark"))
    base = ok.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length(text_col)).alias("n_chars"),
        F.sum(toks).alias("n_tokens"),
        F.round(F.avg(toks), 6).alias("avg_tokens"),
    )
    if lang_col is not None:
        lang_top = (
            ok.groupBy(lang_col)
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.desc("c"), F.asc(lang_col))
            .limit(1)
            .select(
                F.col(lang_col).alias("top_lang"),
                F.col("c").alias("top_lang_docs"),
            )
        )
        base = base.crossJoin(F.broadcast(lang_top))
    digests = ok.select(
        F.md5(F.col(text_col).cast("binary")).alias("__d")
    ).agg(F.count_distinct("__d").alias("n_unique"))
    return base.crossJoin(F.broadcast(digests)).withColumn(
        "dup_rate",
        # try_divide: an empty corpus has n_docs 0 — rate undefined,
        # NULL, not an ANSI DIVIDE_BY_ZERO
        F.round(
            F.try_divide(
                F.col("n_docs") - F.col("n_unique"),
                F.col("n_docs").cast("double"),
            ),
            6,
        ),
    )


def k_anonymity(
    df: DataFrame,
    quasi_cols: list[str],
    *,
    k: int = 5,
    sensitive_col: str | None = None,
    l: int = 2,  # noqa: E741  (the literature's name)
) -> DataFrame:
    """k-anonymity / l-diversity audit — the privacy-governance gate a
    training corpus passes before release (Sweeney 2002; Machanavajjhala
    2007). Rows sharing a quasi-identifier combination form an
    equivalence class; the corpus is k-anonymous when every class has
    >= k rows, and (with ``sensitive_col``) l-diverse when every class
    carries >= l distinct sensitive values.

    Returns ONE row: ``n_rows, n_classes, min_class_size,
    violating_classes, violating_rows, violating_fraction,
    k_anonymous`` (+ ``min_l, l_violating_classes, l_diverse`` when a
    sensitive column is given). NULL quasi values group as values (the
    shared groupBy semantics of both engines), since NULL is itself a
    disclosure.

    Scale shape: one map-combinable (quasi...) count agg — the class
    frame — then one agg over classes. l-diversity stacks a second
    level, (quasi..., sensitive) -> (quasi...), instead of mixing
    count_distinct into the class agg: the mixed form plans an Expand
    that doubles the scanned rows (the profiler measured that cliff),
    while the stacked form's second exchange is over the already-tiny
    distinct frame. Never materializes pairs.
    """
    quasi = [F.col(c) for c in quasi_cols]
    if sensitive_col is not None:
        per_sens = df.groupBy(*quasi, F.col(sensitive_col)).agg(
            F.count(F.lit(1)).alias("__sn")
        )
        classes = per_sens.groupBy(*quasi).agg(
            F.sum("__sn").alias("__n"),
            F.count(F.col(sensitive_col)).alias("__l"),
        )
    else:
        classes = df.groupBy(*quasi).agg(F.count(F.lit(1)).alias("__n"))
    out_cols = [
        F.sum("__n").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.min("__n").cast("bigint").alias("min_class_size"),
        F.sum(F.when(F.col("__n") < k, 1).otherwise(0))
        .cast("bigint").alias("violating_classes"),
        F.sum(F.when(F.col("__n") < k, F.col("__n")).otherwise(0))
        .cast("bigint").alias("violating_rows"),
        F.round(
            F.sum(F.when(F.col("__n") < k, F.col("__n")).otherwise(0))
            / F.sum("__n").cast("double"),
            6,
        ).alias("violating_fraction"),
        (F.min("__n") >= k).alias("k_anonymous"),
    ]
    if sensitive_col is not None:
        out_cols += [
            F.min("__l").cast("bigint").alias("min_l"),
            F.sum(F.when(F.col("__l") < l, 1).otherwise(0))
            .cast("bigint").alias("l_violating_classes"),
            (F.min("__l") >= l).alias("l_diverse"),
        ]
    return classes.agg(*out_cols)


def k_anonymity_sql(
    table: str,
    quasi_exprs: list[str],
    dialect: str,
    *,
    k: int = 5,
    sensitive_expr: str | None = None,
    l: int = 2,  # noqa: E741
) -> str:
    """Dual-dialect twin of :func:`k_anonymity` (identical text on both
    engines: GROUP BY with NULL-as-value, FILTER-free CASE sums)."""
    if dialect not in ("spark", "duckdb"):
        raise ValueError(f"unknown dialect: {dialect}")
    qs = ", ".join(quasi_exprs)
    sens = (
        f", COUNT(DISTINCT {sensitive_expr}) AS l_"
        if sensitive_expr is not None else ""
    )
    sens_out = (
        f""",
       CAST(MIN(l_) AS BIGINT) AS min_l,
       CAST(SUM(CASE WHEN l_ < {l} THEN 1 ELSE 0 END) AS BIGINT)
         AS l_violating_classes,
       MIN(l_) >= {l} AS l_diverse"""
        if sensitive_expr is not None else ""
    )
    return f"""
WITH classes AS (
  SELECT {qs}, COUNT(*) AS n_{sens}
  FROM {table}
  GROUP BY {qs}
)
SELECT CAST(SUM(n_) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(MIN(n_) AS BIGINT) AS min_class_size,
       CAST(SUM(CASE WHEN n_ < {k} THEN 1 ELSE 0 END) AS BIGINT)
         AS violating_classes,
       CAST(SUM(CASE WHEN n_ < {k} THEN n_ ELSE 0 END) AS BIGINT)
         AS violating_rows,
       ROUND(SUM(CASE WHEN n_ < {k} THEN n_ ELSE 0 END)
             / CAST(SUM(n_) AS DOUBLE), 6) AS violating_fraction,
       MIN(n_) >= {k} AS k_anonymous{sens_out}
FROM classes
"""


def compression_ratio(
    df: DataFrame,
    text_col: str,
    *,
    id_col: str = "doc_id",
    level: int = 6,
    max_ratio: float | None = None,
) -> DataFrame:
    """Per-document zlib compression ratio (compressed/raw bytes) — the
    classic machine-generated/boilerplate detector (low ratio = highly
    repetitive/templated text; the signal Gopher-era curation thresholds
    alongside the n-gram repetition fractions, which only approximate
    it). Deterministic: zlib with a FIXED level is byte-stable across
    platforms for a given input.

    Arrow path (``mapInPandas``): per-row zlib is inherently Python-side
    work, batched like the multimodal decoders — this is the documented
    exception lane, not the hot-path default (the pure-SQL repetition
    signals remain the first-line filters). NULL/empty text yields NULL
    ratio. With ``max_ratio`` set, rows above it drop (the filter form).

    Returns ``(id, n_bytes, n_compressed, ratio)`` with ratio rounded 6.
    """
    import pandas as pd
    import zlib

    out_schema = (
        f"{id_col} long, n_bytes long, n_compressed long, ratio double"
    )

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, nb, nc, ratio = [], [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                ids.append(i)
                if t is None or len(t) == 0:
                    nb.append(0)
                    nc.append(0)
                    ratio.append(None)
                    continue
                raw = t.encode("utf-8")
                comp = zlib.compress(raw, level)
                nb.append(len(raw))
                nc.append(len(comp))
                ratio.append(round(len(comp) / len(raw), 6))
            yield pd.DataFrame(
                {id_col: ids, "n_bytes": nb, "n_compressed": nc,
                 "ratio": ratio}
            )

    out = df.select(id_col, text_col).mapInPandas(score, out_schema)
    if max_ratio is not None:
        out = out.where(F.col("ratio") <= max_ratio)
    return out.orderBy(id_col)


def orphan_check(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
) -> DataFrame:
    """Referential-integrity audit between a child table's foreign key
    and its parent — the load-pipeline gate (the reference's harmonize
    stage assumes city FKs resolve; at 100 TB you verify instead):
    counts orphaned child rows (FK with no parent), NULL FKs (counted
    separately — a NULL is a missing link, not a broken one), and
    childless parents. Returns ONE row ``(n_child, n_null_fk,
    n_orphans, orphan_rate, n_parent, n_childless, childless_rate)``
    rounded 6.

    Scale shape: ONE distinct-key agg per side (map-combinable), one
    full-outer join of the two DISTINCT-KEY frames (key-cardinality
    sized, never row volume) carrying each side's row counts — both
    directions of the audit fall out of the same join, where two
    anti-joins would scan twice.
    """
    ck = F.col(child_key)
    c = (
        child.where(ck.isNotNull())
        .groupBy(ck.alias("__k"))
        .agg(F.count(F.lit(1)).alias("__cn"))
    )
    nulls = child.agg(
        F.count(F.lit(1)).alias("__total"),
        F.count(F.when(ck.isNull(), 1)).alias("__nulls"),
    )
    p = (
        parent.where(F.col(parent_key).isNotNull())
        .groupBy(F.col(parent_key).alias("__k"))
        .agg(F.count(F.lit(1)).alias("__pn"))
    )
    j = c.join(p, "__k", "full_outer")
    agg = j.agg(
        F.sum(F.when(F.col("__pn").isNull(), F.col("__cn")).otherwise(0))
        .alias("__orph"),
        F.count(F.when(F.col("__pn").isNotNull(), 1)).alias("__matched_p"),
        F.count(F.when(F.col("__cn").isNull(), 1)).alias("__childless"),
        F.count(F.when(F.col("__pn").isNotNull(), 1)).alias("__np_joined"),
    )
    np_tot = p.agg(F.count(F.lit(1)).alias("__np"))
    out = agg.crossJoin(F.broadcast(nulls)).crossJoin(F.broadcast(np_tot))
    return out.select(
        F.col("__total").cast("bigint").alias("n_child"),
        F.col("__nulls").cast("bigint").alias("n_null_fk"),
        F.col("__orph").cast("bigint").alias("n_orphans"),
        F.round(
            F.try_divide(F.col("__orph"), F.col("__total") - F.col("__nulls")),
            6,
        ).alias("orphan_rate"),
        F.col("__np").cast("bigint").alias("n_parent"),
        F.col("__childless").cast("bigint").alias("n_childless"),
        F.round(
            F.try_divide(F.col("__childless"), F.col("__np")), 6
        ).alias("childless_rate"),
    )


def orphan_check_sql(
    child_table: str,
    child_key: str,
    parent_table: str,
    parent_key: str,
    dialect: str,
) -> str:
    """Dual-dialect twin of :func:`orphan_check` (identical text)."""
    if dialect not in ("spark", "duckdb"):
        raise ValueError(f"unknown dialect: {dialect}")
    return f"""
WITH c AS (
  SELECT {child_key} AS k, COUNT(*) AS cn FROM {child_table}
  WHERE {child_key} IS NOT NULL GROUP BY 1
),
nulls AS (
  SELECT COUNT(*) AS total,
         COUNT(CASE WHEN {child_key} IS NULL THEN 1 END) AS nulls
  FROM {child_table}
),
p AS (
  SELECT {parent_key} AS k, COUNT(*) AS pn FROM {parent_table}
  WHERE {parent_key} IS NOT NULL GROUP BY 1
),
j AS (SELECT c.cn, p.pn FROM c FULL OUTER JOIN p ON c.k = p.k),
a AS (
  SELECT SUM(CASE WHEN pn IS NULL THEN cn ELSE 0 END) AS orph,
         COUNT(CASE WHEN cn IS NULL THEN 1 END) AS childless
  FROM j
),
np AS (SELECT COUNT(*) AS np FROM p)
SELECT CAST(total AS BIGINT) AS n_child,
       CAST(nulls AS BIGINT) AS n_null_fk,
       CAST(orph AS BIGINT) AS n_orphans,
       ROUND(orph / NULLIF(CAST(total - nulls AS DOUBLE), 0.0), 6)
         AS orphan_rate,
       CAST(np AS BIGINT) AS n_parent,
       CAST(childless AS BIGINT) AS n_childless,
       ROUND(childless / NULLIF(CAST(np AS DOUBLE), 0.0), 6)
         AS childless_rate
FROM a CROSS JOIN nulls CROSS JOIN np
"""


def fd_violations(
    df: DataFrame,
    fds: list[tuple[str, str]],
) -> DataFrame:
    """Functional-dependency audit — the schema-contract check profilers
    promise and never run at scale: for each candidate dependency
    ``lhs -> rhs``, how many determinant groups carry MORE than one
    distinct dependent value (the dependency is violated), how many
    rows sit inside those conflicted groups, and the worst fan-out.
    Returns one row per FD ordered as given:
    ``(fd, n_groups, violating_groups, violating_rows, violation_rate,
    max_distinct_rhs)`` with rate = violating_groups / n_groups rounded
    6. NULLs on either side drop (SQL FD semantics are defined on
    present values).

    Scale shape: per FD one (lhs, rhs) hash agg, then an lhs-keyed agg
    OVER THAT FRAME — the distinct-rhs count is the row count of the
    pair frame, never a countDistinct mixed into a metric agg (the
    Expand cliff). Per-FD results are FD-count-sized 1-row frames
    unioned driver-side; the raw table scans once per FD (fds is a
    short, fixed audit list).
    """
    if not fds:
        raise ValueError("fds must be non-empty")
    outs = []
    for lhs, rhs in fds:
        pairs = (
            df.where(
                F.expr(lhs).isNotNull() & F.expr(rhs).isNotNull()
            )
            .groupBy(
                F.expr(lhs).alias("__l"), F.expr(rhs).alias("__r")
            )
            .agg(F.count(F.lit(1)).alias("__n"))
        )
        grp = pairs.groupBy("__l").agg(
            F.count(F.lit(1)).alias("__k"),
            F.sum("__n").alias("__rows"),
        )
        one = grp.agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.count(F.when(F.col("__k") > 1, 1)).alias(
                "violating_groups"
            ),
            F.sum(
                F.when(F.col("__k") > 1, F.col("__rows")).otherwise(0)
            ).alias("violating_rows"),
            F.max("__k").alias("max_distinct_rhs"),
        )
        outs.append(
            one.select(
                F.lit(f"{lhs} -> {rhs}").alias("fd"),
                F.col("n_groups").cast("bigint").alias("n_groups"),
                F.col("violating_groups")
                .cast("bigint")
                .alias("violating_groups"),
                F.col("violating_rows")
                .cast("bigint")
                .alias("violating_rows"),
                F.round(
                    F.try_divide(
                        F.col("violating_groups"),
                        F.col("n_groups").cast("double"),
                    ),
                    6,
                ).alias("violation_rate"),
                F.col("max_distinct_rhs")
                .cast("bigint")
                .alias("max_distinct_rhs"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def fd_violations_sql(
    table: str,
    fds: list[tuple[str, str]],
    dialect: str,
) -> str:
    """Dual-dialect twin of :func:`fd_violations` (identical text)."""
    if dialect not in ("spark", "duckdb"):
        raise ValueError(f"unknown dialect: {dialect}")
    if not fds:
        raise ValueError("fds must be non-empty")
    parts = []
    for lhs, rhs in fds:
        parts.append(f"""
SELECT '{lhs} -> {rhs}' AS fd,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(COUNT(CASE WHEN k > 1 THEN 1 END) AS BIGINT)
         AS violating_groups,
       CAST(SUM(CASE WHEN k > 1 THEN rows_ ELSE 0 END) AS BIGINT)
         AS violating_rows,
       ROUND(COUNT(CASE WHEN k > 1 THEN 1 END)
             / NULLIF(CAST(COUNT(*) AS DOUBLE), 0.0), 6)
         AS violation_rate,
       CAST(MAX(k) AS BIGINT) AS max_distinct_rhs
FROM (
  SELECT l, COUNT(*) AS k, SUM(n) AS rows_
  FROM (
    SELECT {lhs} AS l, {rhs} AS r, COUNT(*) AS n
    FROM {table}
    WHERE {lhs} IS NOT NULL AND {rhs} IS NOT NULL
    GROUP BY 1, 2
  )
  GROUP BY 1
)""")
    return "\nUNION ALL\n".join(parts)
