"""Parquet table loader tolerant of TIMESTAMP(NANOS) columns.

The driver's synthetic ``events`` table stores its ``ts`` column as Parquet
INT64 TIMESTAMP(NANOS), which Spark's vectorized reader rejects
(PARQUET_TYPE_ILLEGAL). We flip the session-scoped legacy flag that surfaces
nanos as BIGINT and rebuild a proper timestamp with integer division
(``DIV 1000`` — a double division would lose precision at 1.7e18 nanos).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NANOS_FLAG = "spark.sql.legacy.parquet.nanosAsLong"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load ``{sf_dir}/{name}.parquet``, converting nanos timestamps."""
    try:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        # force schema resolution now so the fallback below can trigger
        _ = df.schema
    except Exception:
        spark.conf.set(_NANOS_FLAG, "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")

    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df
