"""Join operators beyond plain equi-joins.

The reference itself joins nothing (SURVEY.md §2.6 — harmonize-then-union is
the whole design), but an engine replacing it needs the join family a
search/analytics workload reaches for:

- equi-join for dictionary<->data metadata lookups (plain ``df.join`` —
  broadcast under the 64 MB threshold, nothing custom to build), and
- **as-of join** — "for each left row, the latest right row at or before
  it" — the event-attribution / point-in-time-lookup operator that Spark's
  DataFrame API lacks as a built-in.

``asof_join`` here is the scalable composition (no range join, no O(n^2)
candidate pairs): tag both sides, union them, and carry the most recent
right-side payload forward with a ``last(..., ignorenulls=True)`` running
window. Cost model: ONE shuffle on the join key + a per-key sort — the same
price as a regular sorted merge join, independent of time-range density,
which is why pandas/kdb implement as-of this way. A naive
``left.join(right, key).where(lt >= rt)`` + argmax explodes to the full
cartesian product per key first; at 100 TB with hot keys that is the
difference between a merge and a blow-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload: list[str],
    *,
    tie_break: str | None = None,
    tolerance_seconds: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join: attach to every ``left`` row the ``payload``
    columns of the latest ``right`` row with the same ``on`` key and
    ``right_time <= left_time`` (inclusive). Left rows with no prior right
    row keep NULL payload (left-outer semantics).

    ``tie_break``: right rows sharing (key, time) are reduced to the one
    with the greatest ``tie_break`` value (deterministic; defaults to the
    first payload column). ``tolerance_seconds``: matches older than the
    tolerance are nulled out (pandas ``merge_asof(tolerance=...)``).

    Mechanics: right rows sort *before* left rows at an equal timestamp
    (tag 1 < tag 2), which yields the inclusive <= semantics, and right rows
    sharing (key, time) sort by ``tie_break`` ASC so the running
    ``last(ignorenulls=True)`` window naturally carries the max-tie-break
    payload — tie resolution costs zero extra shuffles (a row_number dedupe
    pass would re-partition by (key, time)). Everything is built-in window
    machinery — codegen'd, spillable, AQE-skew-splittable on the key
    exchange; the sort key is (time, tag, tie) within each key partition.
    """
    tie = tie_break or payload[0]
    pay = F.struct(
        F.col(right_time).alias("__t"), *[F.col(c) for c in payload]
    )
    right_tagged = right.where(F.col(right_time).isNotNull()).select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.col(tie).alias("__tie"),
        pay.alias("__pay"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
            for c in left.columns
        ],
    )
    left_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).alias("__ts"),
        F.lit(2).alias("__tag"),
        F.lit(None).cast(right.schema[tie].dataType).alias("__tie"),
        F.lit(None).cast(right_tagged.schema["__pay"].dataType).alias("__pay"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )

    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__tag", F.asc_nulls_last("__tie"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        left_tagged.unionByName(right_tagged)
        .withColumn("__match", F.last("__pay", ignorenulls=True).over(w))
        .where(F.col("__tag") == 2)
    )
    if tolerance_seconds is not None:
        in_range = (
            F.col("__ts").cast("double")
            - F.col("__match.__t").cast("double")
        ) <= F.lit(float(tolerance_seconds))
        carried = carried.withColumn(
            "__match", F.when(in_range, F.col("__match"))
        )
    def _out(c: str) -> str:
        return f"{c}{suffix}" if c in left.columns else c

    return carried.select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        F.col("__match.__t").alias(_out(right_time)),
        *[F.col(f"__match.{c}").alias(_out(c)) for c in payload],
    )
