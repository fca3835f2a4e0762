"""Single-pass column profiler -> the "data dictionary" table.

The reference's ``buildDataDict`` (``notebooks/lib/harmonizeCrimeIncidents.py:
337-406``) profiles every column of a dataset into one dictionary row:
non-null count, distinct count, missing count, mean, stddev_pop, min, max,
plus author-supplied metadata (group, description, ui-filter flag, lineage,
vartype) and a stats-driven type guess. That dictionary table IS the contract
between the ETL layer and the search UI (SURVEY.md §3.3).

The reference builds it with one ``SELECT ... FROM tmptable`` per column glued
by UNION ALL — N full scans for N columns (SURVEY.md §4 anti-pattern #1).
Here: ONE aggregation pass computing all 7 stats x N columns, then an unpivot
(``stack``) of the single aggregated row. At 100 TB that is one scan + one
tiny shuffle instead of N scans.

``exact_distinct=False`` swaps COUNT(DISTINCT) for HyperLogLog
``approx_count_distinct``: multiple exact distincts in one pass force a
Catalyst Expand (input amplified x(N+1)), which is the right trade at test
scale but not at 100 TB.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from harmonize_search_analyze_spark.sources.tables import local_frame

DICT_SCHEMA_COLUMNS = [
    "dict_field", "dict_count", "dict_countdistinct", "dict_countmissing",
    "dict_mean", "dict_stddev", "dict_min", "dict_max",
    "dict_vargroup", "dict_vardescr", "dict_uifilter", "dict_varmapping",
    "dict_vartype",
]

_NUMERIC_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


@dataclass
class ColumnMeta:
    """Author-supplied dictionary metadata for one column (the reference's
    ``vargroups``/``vartypes``/``vardescrs`` notebook dicts)."""

    vargroup: str = "99.Other"
    vardescr: str = ""
    uifilter: bool = False
    varmapping: str = ""
    # identifier | datetime | boolean | range,lo,hi,step | enum,... | text | unknown
    vartype: str = "unknown"
    extra: dict = field(default_factory=dict)


def _is_numeric(dtype: T.DataType) -> bool:
    return isinstance(dtype, _NUMERIC_TYPES)


def build_data_dict(
    df: DataFrame,
    meta: dict[str, ColumnMeta] | None = None,
    *,
    exact_distinct: bool = True,
    columns: list[str] | None = None,
) -> DataFrame:
    """Profile ``df`` into the dictionary table (one row per column).

    Output schema (golden, per ``Baltimore-notebook.ipynb:949`` Athena DDL):
    dict_field STRING, dict_count BIGINT, dict_countdistinct BIGINT,
    dict_countmissing BIGINT, dict_mean DOUBLE, dict_stddev DOUBLE,
    dict_min STRING, dict_max STRING, dict_vargroup STRING, dict_vardescr
    STRING, dict_uifilter STRING ('True'/'False'), dict_varmapping STRING,
    dict_vartype STRING.
    """
    meta = meta or {}
    cols = columns or df.columns
    schema = {f.name: f.dataType for f in df.schema.fields}

    aggs = []
    dist_aggs = []
    for c in cols:
        numeric = _is_numeric(schema[c])
        aggs.append(F.count(F.col(c)).alias(f"{c}__count"))
        if exact_distinct:
            # Kept OUT of the main agg: mixing multiple COUNT(DISTINCT) with
            # regular aggregates forces Catalyst's Expand plan (input rows
            # amplified x(N+1) and 150x slower on an 11-column table at
            # sf0.1 — measured). Distinct-only multi-agg plans cleanly, so we
            # run it as a second single-row agg and cross-join the two rows.
            dist_aggs.append(F.count_distinct(F.col(c)).alias(f"{c}__dist"))
        else:
            aggs.append(F.approx_count_distinct(F.col(c)).alias(f"{c}__dist"))
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint").alias(f"{c}__miss")
        )
        if numeric:
            aggs.append(F.avg(F.col(c)).cast("double").alias(f"{c}__mean"))
            aggs.append(F.stddev_pop(F.col(c)).cast("double").alias(f"{c}__std"))
        else:
            # reference: AVG/STDDEV nulled for string/timestamp columns
            aggs.append(F.lit(None).cast("double").alias(f"{c}__mean"))
            aggs.append(F.lit(None).cast("double").alias(f"{c}__std"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"{c}__min"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"{c}__max"))

    one_row = df.agg(*aggs)
    if dist_aggs:
        # crossJoin of two single-row aggregates: ONE job, the two scan
        # stages run concurrently. The distinct branch is repartitioned
        # first: its multi-COUNT(DISTINCT) plans as an Expand (input rows
        # x n_cols) whose partial aggregation otherwise runs inside the
        # scan stage — ONE task on a single-row-group parquet input
        # (measured 2.2 s of a 3.2 s profile at sf0.1; guide §2.5 input
        # skew). COUNT(DISTINCT) is integer-exact, so the round-robin
        # reorder cannot perturb any value; the mean/stddev branch stays
        # on the unspread scan so float summation order is unchanged.
        dist_src = df.select(*cols).repartition(
            df.sparkSession.sparkContext.defaultParallelism
        )
        one_row = one_row.crossJoin(dist_src.agg(*dist_aggs))

    # Collect the single stats row and unpivot DRIVER-SIDE. The alternative —
    # a stack() unpivot + metadata when-chains + the type-guess CASE as
    # Column expressions over that one row — costs ~3s of Catalyst
    # analysis/codegen for an 11-column table (measured at sf0.1, ~6x the
    # aggregation itself) and grows with column count. The collected payload
    # is 7 aggregates per column — metadata, not data — so driver assembly
    # is the scale-correct shape too. min/max are stringified INSIDE the agg
    # (Spark's cast, not Python str()) so formatting matches the SQL oracle.
    stats = one_row.collect()[0].asDict()

    rows = []
    for c in cols:
        m = meta.get(c) or ColumnMeta()
        vartype = (
            m.vartype if m.vartype != "unknown"
            else _guess_vartype_from_stats(stats, c)
        )
        rows.append((
            c, stats[f"{c}__count"], stats[f"{c}__dist"], stats[f"{c}__miss"],
            stats[f"{c}__mean"], stats[f"{c}__std"],
            stats[f"{c}__min"], stats[f"{c}__max"],
            m.vargroup, m.vardescr, "True" if m.uifilter else "False",
            m.varmapping, vartype,
        ))
    out_schema = T.StructType([
        T.StructField("dict_field", T.StringType()),
        T.StructField("dict_count", T.LongType()),
        T.StructField("dict_countdistinct", T.LongType()),
        T.StructField("dict_countmissing", T.LongType()),
        T.StructField("dict_mean", T.DoubleType()),
        T.StructField("dict_stddev", T.DoubleType()),
        T.StructField("dict_min", T.StringType()),
        T.StructField("dict_max", T.StringType()),
        T.StructField("dict_vargroup", T.StringType()),
        T.StructField("dict_vardescr", T.StringType()),
        T.StructField("dict_uifilter", T.StringType()),
        T.StructField("dict_varmapping", T.StringType()),
        T.StructField("dict_vartype", T.StringType()),
    ])
    return local_frame(df.sparkSession, rows, out_schema)


def guess_vartypes(
    df: DataFrame, columns: list[str] | None = None
) -> DataFrame:
    """dict_field + dict_vartype only — the A2 inference without the full
    dictionary: skips stddev/missing-count, so the single pass carries 4
    aggregates per column instead of 7 (the count-distinct exchange
    dominates either way, but the partial-agg state halves)."""
    cols = columns or df.columns
    schema = {f.name: f.dataType for f in df.schema.fields}
    aggs, dist_aggs = [], []
    for c in cols:
        if _is_numeric(schema[c]):
            aggs.append(F.avg(F.col(c)).cast("double").alias(f"{c}__mean"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"{c}__mean"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"{c}__min"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"{c}__max"))
        dist_aggs.append(F.count_distinct(F.col(c)).alias(f"{c}__dist"))
    # same Expand-parallelization as build_data_dict (the distinct branch
    # is integer-exact; the mean/min/max branch stays unspread)
    dist_src = df.select(*cols).repartition(
        df.sparkSession.sparkContext.defaultParallelism
    )
    stats = (
        df.agg(*aggs).crossJoin(dist_src.agg(*dist_aggs)).collect()[0].asDict()
    )
    rows = [(c, _guess_vartype_from_stats(stats, c)) for c in cols]
    return local_frame(
        df.sparkSession,
        rows,
        T.StructType([
            T.StructField("dict_field", T.StringType()),
            T.StructField("dict_vartype", T.StringType()),
        ]),
    )


def _guess_vartype_from_stats(stats: dict, c: str) -> str:
    # exact thresholds of the reference CASE
    # (harmonizeCrimeIncidents.py:389-405):
    #   mean NULL                            -> text
    #   distinct = 2 AND min = 0 AND max = 1 -> boolean
    #   distinct > 1 + (max - min)           -> range,0,floor(max+1),0.1
    #   else                                 -> range,0,floor(max/10+1)*10,1
    import math

    if stats[f"{c}__mean"] is None:
        return "text"

    def fnum(s):
        try:
            return float(s)
        except (TypeError, ValueError):
            return None

    mn, mx = fnum(stats[f"{c}__min"]), fnum(stats[f"{c}__max"])
    dist = stats[f"{c}__dist"]
    if dist == 2 and mn == 0 and mx == 1:
        return "boolean"
    if mn is None or mx is None:
        return "text"
    if float(dist) > 1.0 + mx - mn:
        return f"range,0,{math.floor(mx + 1)},0.1"
    return f"range,0,{math.floor(mx / 10 + 1) * 10},1"


def vartype_guess_oracle_sql(
    table: str,
    numeric_cols: list[str],
    string_cols: list[str],
) -> str:
    """DuckDB SQL reproducing the stats-driven vartype CASE (A2) — the exact
    thresholds of ``harmonizeCrimeIncidents.py:389-405`` as implemented in
    ``build_data_dict``."""
    selects = []
    for c in numeric_cols:
        selects.append(f"""
SELECT '{c}' AS dict_field,
  CASE WHEN AVG({c}) IS NULL THEN 'text'
       WHEN COUNT(DISTINCT {c}) = 2
            AND CAST(MIN({c}) AS DOUBLE) = 0
            AND CAST(MAX({c}) AS DOUBLE) = 1 THEN 'boolean'
       WHEN CAST(COUNT(DISTINCT {c}) AS DOUBLE)
            > 1.0 + CAST(MAX({c}) AS DOUBLE) - CAST(MIN({c}) AS DOUBLE)
         THEN 'range,0,' || CAST(CAST(FLOOR(CAST(MAX({c}) AS DOUBLE) + 1)
                                      AS BIGINT) AS VARCHAR) || ',0.1'
       ELSE 'range,0,' || CAST(CAST(FLOOR(CAST(MAX({c}) AS DOUBLE) / 10 + 1)
                                    AS BIGINT) * 10 AS VARCHAR) || ',1'
  END AS dict_vartype
FROM {table}""")
    for c in string_cols:
        # (DISTINCT, not LIMIT: a bare LIMIT inside a UNION ALL chain is a
        # DuckDB parse error without parentheses)
        selects.append(
            f"SELECT DISTINCT '{c}' AS dict_field, 'text' AS dict_vartype "
            f"FROM {table}"
        )
    return " UNION ALL ".join(selects)


def data_dict_oracle_sql(
    table: str,
    numeric_cols: list[str],
    other_cols: list[str],
) -> str:
    """DuckDB SQL computing the same dictionary stats (used as the driver
    oracle). One SELECT per column UNION ALL'd — fine for an oracle; the
    engine itself is single-pass."""
    selects = []
    for c, numeric in [(c, True) for c in numeric_cols] + [
        (c, False) for c in other_cols
    ]:
        mean = f"CAST(AVG({c}) AS DOUBLE)" if numeric else "CAST(NULL AS DOUBLE)"
        std = f"CAST(STDDEV_POP({c}) AS DOUBLE)" if numeric else "CAST(NULL AS DOUBLE)"
        selects.append(
            f"SELECT '{c}' AS dict_field, COUNT({c}) AS dict_count, "
            f"COUNT(DISTINCT {c}) AS dict_countdistinct, "
            f"CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
            f"AS dict_countmissing, "
            f"ROUND({mean}, 6) AS dict_mean, ROUND({std}, 6) AS dict_stddev, "
            f"CAST(MIN({c}) AS VARCHAR) AS dict_min, "
            f"CAST(MAX({c}) AS VARCHAR) AS dict_max FROM {table}"
        )
    return " UNION ALL ".join(selects)
