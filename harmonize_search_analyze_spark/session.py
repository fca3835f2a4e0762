"""SparkSession factory with scale-oriented defaults.

The reference ran Spark 2.x on EMR (``infrastructure/jupyterspark.yaml:262-276``)
with stock configs. We target Spark >= 3.5/4.x and turn on the features that
matter at 100 TB: AQE (runtime shuffle-partition coalescing + skew-join
handling), Arrow for the few pandas interchanges, and a pinned session
timezone (the reference deliberately ignores timezones —
``Baltimore-notebook.ipynb`` cell 23 comment — so we pin UTC and document it).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Number of local cores the test/bench harness should use.
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def find_spark_avro_jar() -> str | None:
    """Bundled-jar probe for the S9 avro gate (spark-avro is an
    external module Spark does not ship on the classpath). First hit
    wins: the ``$SPARK_GRAFT_AVRO_JAR`` escape hatch, then the standard
    on-disk locations a runtime would stage the jar in —
    ``$SPARK_HOME/jars``, the ivy2 cache, ``/opt/spark/jars``. The gate
    self-heals the session a runtime gains the jar, no code change.
    (pyspark's own ``jars/`` dir needs no wiring — anything there is
    already on the classpath.)"""
    explicit = os.environ.get("SPARK_GRAFT_AVRO_JAR")
    if explicit:
        return explicit
    import glob

    patterns = []
    spark_home = os.environ.get("SPARK_HOME")
    if spark_home:
        patterns.append(os.path.join(spark_home, "jars", "spark-avro*.jar"))
    patterns += [
        os.path.expanduser("~/.ivy2/jars/*spark-avro*.jar"),
        os.path.expanduser(
            "~/.ivy2/cache/org.apache.spark/spark-avro*/jars/*.jar"
        ),
        "/opt/spark/jars/spark-avro*.jar",
    ]
    for pat in patterns:
        hits = sorted(glob.glob(pat))
        if hits:
            return hits[0]
    return None


def get_spark(
    app_name: str = "harmonize-search-analyze-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Local mode is for tests only; every config below is chosen to also be
    correct on a 1000-executor cluster:

    - AQE on: coalesces the statically-sized shuffle partitions down to the
      data's real size and splits skewed partitions at runtime, so one
      ``shuffle.partitions`` setting survives a 100x scale-up.
    - auto broadcast threshold raised to 64 MB: every dimension table in the
      star schema (and the dictionary table) should never shuffle-join.
    - Arrow enabled: any ``toPandas``/pandas-UDF boundary is columnar.
    - UTC session timezone: deterministic timestamp <-> string casts.
    """
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_CPUS))
        # Cap in-memory partition bytes so a 100 TB scan yields sane tasks.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    avro_jar = find_spark_avro_jar()
    if avro_jar:
        # jar-path escape hatch + bundled-jar probe for the S9 avro
        # gate: this container has no network (spark.jars.packages
        # can't resolve), but a runtime that has the spark-avro jar on
        # disk — explicitly via $SPARK_GRAFT_AVRO_JAR or in a standard
        # location — gets a functional sources.ingest.read_avro with
        # no code change
        builder = builder.config("spark.jars", avro_jar)
    if driver_memory is not None:
        # local mode: the driver heap IS the whole JVM (all executor
        # threads); the 1g default OOMs multi-GB local runs. Only effective
        # when the JVM hasn't started yet (fresh process). On a real
        # cluster this comes from spark-submit, not here.
        builder = builder.config("spark.driver.memory", driver_memory)
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{DEFAULT_CPUS}]")
    return builder.getOrCreate()
