"""Event-analytics operators: funnel conversion, cohort retention, and
rate-anomaly flagging over an ``events(user_id, event_type, ts, ...)``
stream table.

The reference's webapp answers "how many incidents, where, when"
(count-centric dashboards); an analytics engine replacing its stack also
gets asked the user-journey questions — which step loses people, does a
cohort come back, did today's rate spike. Each operator here is a
one-or-two-shuffle DataFrame composition with an exact SQL twin for the
DuckDB oracle:

- ``funnel``: ordered step conversion *per user* with sequential-chain
  semantics — the step-i reach time is the user's FIRST step-i event
  at-or-after their step-(i-1) reach time, not the global first step-i
  event. One user-keyed agg per step (same key every pass, so AQE keeps
  the exchanges co-partitioned); len(steps) is small and fixed.
- ``cohort_retention``: users bucketed by first-seen period x activity
  period offset; two hash aggs (first-seen, then the (cohort, offset)
  matrix). Periods are date_trunc buckets, so the matrix is bounded by
  time range, never user count.
- ``rate_anomalies``: date_histogram counts z-scored against the WHOLE
  series (two-pass: bucket counts, then a broadcast 1-row mean/std) —
  buckets beyond ``threshold`` sigmas flag. Deterministic, no windows
  over unbounded partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel(
    df: DataFrame,
    steps: list[tuple[str, Column]],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel: per named step, how many users reached it — where
    "reached" means the user has an event matching step i at-or-after
    their step-(i-1) REACH time (sequential-chain semantics): rt_0 is the
    first step-0 event; rt_i = MIN(ts | pred_i AND ts >= rt_{i-1}).  A
    user who does step i both before and after completing step i-1
    (click, view, click) therefore counts — the global-first-occurrence
    shortcut would miss them.

    One user-keyed hash agg per step: step-i events are pre-filtered (so
    the predicate pushes to the scan), left-joined to the carried
    per-user reach row, and reduced with a conditional MIN.  Every pass
    shuffles on the SAME key, so the exchanges stay co-partitioned; the
    per-user state is one row of len(steps) timestamps, never an event
    array. Returns (step_idx, step, users, conversion_pct) with
    conversion relative to step 0.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    cur = (
        df.filter(steps[0][1])
        .groupBy(user_col)
        .agg(F.min(F.col(ts_col)).alias("__rt0"))
    )
    for i in range(1, len(steps)):
        step_ev = df.filter(steps[i][1]).select(
            F.col(user_col), F.col(ts_col).alias("__sts")
        )
        carried = [f"__rt{j}" for j in range(i)]
        cur = (
            cur.join(step_ev, user_col, "left")
            .groupBy(user_col, *carried)
            .agg(
                F.min(
                    F.when(
                        F.col("__sts") >= F.col(f"__rt{i - 1}"),
                        F.col("__sts"),
                    )
                ).alias(f"__rt{i}")
            )
        )
    reach_cols = [
        F.count(F.col(f"__rt{i}")).alias(f"__n{i}")
        for i in range(len(steps))
    ]
    totals = cur.agg(*reach_cols).collect()[0]  # 1 row, len(steps) ints
    spark = df.sparkSession
    base = max(int(totals["__n0"]), 1)
    rows = [
        (
            i,
            name,
            int(totals[f"__n{i}"]),
            round(100.0 * int(totals[f"__n{i}"]) / base, 6),
        )
        for i, (name, _) in enumerate(steps)
    ]
    return spark.createDataFrame(
        rows, "step_idx INT, step STRING, users BIGINT, conversion_pct DOUBLE"
    )


def funnel_sql(
    table: str,
    steps: list[tuple[str, str]],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> str:
    """Dual-dialect SQL twin of :func:`funnel` (predicates given as SQL
    text). Same sequential-chain formulation: one user-keyed agg CTE per
    step, each conditional-MIN'ing step-i events at-or-after the carried
    step-(i-1) reach time."""
    ctes = [
        f"c0 AS (SELECT {user_col}, MIN({ts_col}) AS rt0 "
        f"FROM {table} WHERE {steps[0][1]} GROUP BY {user_col})"
    ]
    for i in range(1, len(steps)):
        carried = ", ".join(f"c.rt{j}" for j in range(i))
        ctes.append(
            f"c{i} AS (SELECT c.{user_col}, {carried}, "
            f"MIN(CASE WHEN e.{ts_col} >= c.rt{i - 1} "
            f"THEN e.{ts_col} END) AS rt{i} "
            f"FROM c{i - 1} c LEFT JOIN "
            f"(SELECT {user_col}, {ts_col} FROM {table} "
            f"WHERE {steps[i][1]}) e "
            f"ON c.{user_col} = e.{user_col} "
            f"GROUP BY c.{user_col}, {carried})"
        )
    counts = ", ".join(
        f"COUNT(rt{i}) AS n{i}" for i in range(len(steps))
    )
    ctes.append(f"tot AS (SELECT {counts} FROM c{len(steps) - 1})")
    unions = "\nUNION ALL\n".join(
        f"SELECT {i} AS step_idx, '{name}' AS step, "
        f"CAST(n{i} AS BIGINT) AS users, "
        f"ROUND(100.0 * n{i} / GREATEST(n0, 1), 6) AS conversion_pct "
        "FROM tot"
        for i, (name, _) in enumerate(steps)
    )
    with_clause = ",\n".join(ctes)
    return f"""
WITH {with_clause}
SELECT * FROM ({unions}) u ORDER BY step_idx
"""


def cohort_retention(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
    max_offset: int = 8,
) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen ``period``
    (the cohort), counted by how many are active again N periods later.

    Two hash aggs: (1) per-user first-seen bucket; (2) distinct users per
    (cohort, offset) — the join back to events broadcasts nothing large
    because it keys on user_id (same shuffle as the first agg, and AQE
    reuses the exchange where possible). Offsets beyond ``max_offset``
    are dropped (the matrix stays bounded). Returns
    (cohort, period_offset, users, pct_of_cohort).
    """
    first_seen = (
        df.groupBy(user_col)
        .agg(F.date_trunc(period, F.min(ts_col)).alias("cohort"))
    )
    activity = df.select(
        user_col, F.date_trunc(period, F.col(ts_col)).alias("active_p")
    ).distinct()
    diff_expr = {
        "week": (F.datediff(F.col("active_p"), F.col("cohort")) / 7),
        "day": F.datediff(F.col("active_p"), F.col("cohort")),
        "month": F.months_between(F.col("active_p"), F.col("cohort")),
    }[period]
    joined = (
        activity.join(first_seen, user_col)
        .withColumn("period_offset", diff_expr.cast("int"))
        .where((F.col("period_offset") >= 0) & (F.col("period_offset") <= max_offset))
    )
    matrix = (
        joined.groupBy("cohort", "period_offset")
        .agg(F.count_distinct(user_col).alias("users"))
    )
    base = matrix.where(F.col("period_offset") == 0).select(
        "cohort", F.col("users").alias("__base")
    )
    return (
        matrix.join(F.broadcast(base), "cohort")
        .select(
            "cohort",
            "period_offset",
            "users",
            F.round(
                100.0 * F.col("users") / F.col("__base"), 6
            ).alias("pct_of_cohort"),
        )
        .orderBy("cohort", "period_offset")
    )


def cohort_retention_sql(
    table: str,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
    max_offset: int = 8,
) -> str:
    """DuckDB twin of :func:`cohort_retention`."""
    diff = {
        "week": "CAST(FLOOR(date_diff('day', cohort, active_p) / 7.0) AS INT)",
        "day": "date_diff('day', cohort, active_p)",
        "month": "date_diff('month', cohort, active_p)",
    }[period]
    return f"""
WITH first_seen AS (
  SELECT {user_col},
         CAST(date_trunc('{period}', MIN({ts_col})) AS TIMESTAMP) AS cohort
  FROM {table} GROUP BY {user_col}
),
activity AS (
  SELECT DISTINCT {user_col},
         CAST(date_trunc('{period}', {ts_col}) AS TIMESTAMP) AS active_p
  FROM {table}
),
joined AS (
  SELECT a.{user_col}, f.cohort, {diff} AS period_offset
  FROM activity a JOIN first_seen f USING ({user_col})
),
matrix AS (
  SELECT cohort, period_offset,
         CAST(COUNT(DISTINCT {user_col}) AS BIGINT) AS users
  FROM joined WHERE period_offset >= 0 AND period_offset <= {max_offset}
  GROUP BY cohort, period_offset
)
SELECT m.cohort, CAST(m.period_offset AS INT) AS period_offset, m.users,
       ROUND(100.0 * m.users / b.users, 6) AS pct_of_cohort
FROM matrix m
JOIN (SELECT cohort, users FROM matrix WHERE period_offset = 0) b
  ON m.cohort = b.cohort
ORDER BY m.cohort, m.period_offset
"""


def rate_anomalies(
    df: DataFrame,
    ts_col: str = "ts",
    *,
    interval: str = "1 day",
    threshold: float = 2.0,
) -> DataFrame:
    """Bucket-count anomaly flags: date-histogram counts z-scored against
    the full series mean/std (population); |z| >= threshold flags.

    Two bounded passes: the bucket hash agg, then a 1-row mean/std agg
    broadcast back — no unbounded window, deterministic (z rounded 6).
    Returns (bucket, doc_count, z_score, is_anomaly)."""
    buckets = (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(F.window(ts_col, interval).getField("start").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )
    stats = buckets.agg(
        F.avg("doc_count").alias("__m"),
        F.stddev_pop("doc_count").alias("__s"),
    )
    return (
        buckets.crossJoin(F.broadcast(stats))
        .select(
            "bucket",
            "doc_count",
            F.round(
                (F.col("doc_count") - F.col("__m"))
                / F.when(F.col("__s") > 0, F.col("__s")),
                6,
            ).alias("z_score"),
        )
        .withColumn(
            "is_anomaly",
            F.coalesce(F.abs(F.col("z_score")) >= threshold, F.lit(False)),
        )
        .orderBy("bucket")
    )


def rate_anomalies_sql(
    table: str,
    ts_col: str = "ts",
    *,
    interval_duck: str = "1 day",
    threshold: float = 2.0,
) -> str:
    """DuckDB twin of :func:`rate_anomalies` (day-grain truncation)."""
    return f"""
WITH buckets AS (
  SELECT CAST(date_trunc('day', {ts_col}) AS TIMESTAMP) AS bucket,
         COUNT(*) AS doc_count
  FROM {table} WHERE {ts_col} IS NOT NULL GROUP BY bucket
),
stats AS (
  SELECT AVG(doc_count) AS m, STDDEV_POP(doc_count) AS s FROM buckets
)
SELECT bucket, doc_count,
       ROUND((doc_count - m) / CASE WHEN s > 0 THEN s END, 6) AS z_score,
       COALESCE(ABS(ROUND((doc_count - m) / CASE WHEN s > 0 THEN s END, 6))
                >= {threshold}, FALSE) AS is_anomaly
FROM buckets CROSS JOIN stats
ORDER BY bucket
"""
