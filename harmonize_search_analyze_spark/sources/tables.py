"""Parquet table loader tolerant of TIMESTAMP(NANOS) columns.

The driver's synthetic ``events`` table stores its ``ts`` column as Parquet
INT64 TIMESTAMP(NANOS), which Spark's vectorized reader rejects
(PARQUET_TYPE_ILLEGAL). We flip the session-scoped legacy flag that surfaces
nanos as BIGINT and rebuild a proper timestamp with integer division
(``DIV 1000`` — a double division would lose precision at 1.7e18 nanos).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NANOS_FLAG = "spark.sql.legacy.parquet.nanosAsLong"

# Inputs below this compressed size are eligible for spreading across the
# cluster (see load_table). 256 MB ~= a couple of default parquet row groups.
SPREAD_THRESHOLD_BYTES = int(
    os.environ.get("SPARK_GRAFT_SPREAD_BYTES", 256 * 1024 * 1024)
)


def load_table(
    spark: SparkSession, sf_dir: str, name: str, *, spread: bool = False
) -> DataFrame:
    """Load ``{sf_dir}/{name}.parquet``, converting nanos timestamps.

    **Small-unsplittable-input rule** (``spread=True``): a parquet file is
    splittable only at row-group granularity; a single-row-group file pins
    every stage below the first exchange to ONE task no matter how many
    executors exist. Opting in pays one round-robin shuffle up front to
    unlock full parallelism for heavy per-row work above the scan (Catalyst
    still pushes filters below the repartition, so parquet pushdown is
    unaffected); inputs over ``SPREAD_THRESHOLD_BYTES`` never spread — at
    100 TB the scan parallelizes natively.

    Default is OFF: measured at sf0.1 (10 MB/600k-row lineitem), the
    added shuffle + per-task scheduling overhead loses more than the extra
    cores win for scan-then-aggregate shapes, and mapInPandas stages pay a
    Python-worker fan-out per partition. Use it selectively where per-row
    compute genuinely dominates (the brute-force pair operators repartition
    internally for exactly that reason).
    """
    path = f"{sf_dir}/{name}.parquet"
    try:
        df = spark.read.parquet(path)
        # force schema resolution now so the fallback below can trigger
        _ = df.schema
    except Exception:
        spark.conf.set(_NANOS_FLAG, "true")
        df = spark.read.parquet(path)

    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))

    # Parquet timestamps without isAdjustedToUTC read as TIMESTAMP_NTZ in
    # Spark 4, which has no numeric cast and diverges from the LTZ the nanos
    # rebuild above produces. The session zone is pinned UTC (session.py),
    # so casting NTZ -> LTZ is value-preserving; normalizing here gives every
    # downstream operator ONE timestamp flavor regardless of how the driver
    # happened to write the parquet (nanos round 1, micros round 2).
    for field in df.schema.fields:
        if isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn(
                field.name, F.col(field.name).cast(T.TimestampType())
            )

    if spread:
        try:
            nbytes = (
                sum(os.path.getsize(p) for p in glob.glob(f"{path}/*.parquet"))
                if os.path.isdir(path) else os.path.getsize(path)
            )
        except OSError:
            nbytes = None
        if nbytes is not None and nbytes < SPREAD_THRESHOLD_BYTES:
            df = df.repartition(spark.sparkContext.defaultParallelism)
    return df
