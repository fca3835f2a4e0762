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

# Schema (metadata) cache: (resolved path, mtime_ns, size) -> (StructType,
# nanos-flag needed). A bare ``spark.read.parquet(path)`` re-lists the
# input and re-reads parquet footers on EVERY call — measured 70-107 ms per
# table reference at sf0.1 vs ~11 ms with an explicit schema, i.e. tens of
# seconds across a 382-query bench, and at 100 TB the driver-side listing/
# footer pass is exactly what table formats exist to avoid (optimization
# guide §6: manifest metadata beats re-listing). This caches ONLY schema
# metadata, never data or results; the mtime/size key invalidates it the
# moment a file is rewritten.
_SCHEMA_CACHE: dict[tuple[str, int, int], tuple["T.StructType", bool]] = {}


def _path_stamp(path: str) -> tuple[str, int, int] | None:
    """Cache key for a parquet file or directory of part files."""
    try:
        st = os.stat(path)
        if os.path.isdir(path):
            parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
            mt = max([st.st_mtime_ns] + [os.stat(p).st_mtime_ns for p in parts])
            sz = sum(os.stat(p).st_size for p in parts)
            return (path, mt, sz)
        return (path, st.st_mtime_ns, st.st_size)
    except OSError:
        return None


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
    if os.environ.get("SPARK_GRAFT_SPREAD_DEFAULT") == "1":
        # measurement rig only (the per-query spread A/B): force the
        # spread path on every load so a full bench run can identify the
        # queries whose per-row work beats the repartition cost
        spread = True
    path = f"{sf_dir}/{name}.parquet"
    stamp = _path_stamp(path)
    if os.environ.get("SPARK_GRAFT_NO_SCHEMA_CACHE") == "1":
        stamp = None  # measurement kill-switch for A/B runs
    cached = _SCHEMA_CACHE.get(stamp) if stamp is not None else None
    if cached is not None:
        schema, needs_nanos = cached
        if needs_nanos:
            # the flag also governs scan EXECUTION (the vectorized reader
            # rejects TIMESTAMP(NANOS) without it), not just inference
            spark.conf.set(_NANOS_FLAG, "true")
        df = spark.read.schema(schema).parquet(path)
    else:
        needs_nanos = False
        try:
            df = spark.read.parquet(path)
            # force schema resolution now so the fallback below can trigger
            _ = df.schema
        except Exception:
            spark.conf.set(_NANOS_FLAG, "true")
            needs_nanos = True
            df = spark.read.parquet(path)
        if stamp is not None:
            _SCHEMA_CACHE[stamp] = (df.schema, needs_nanos)

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
