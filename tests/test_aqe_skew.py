"""AQE skew-join: the engine's join-side skew answer, demonstrated.

The scale docs claim skewed JOIN keys are AQE's job (salting is kept
for groupBy hotspots, `terms_salted`). This test builds a 90%-one-key
join and asserts Spark's runtime re-plan actually engages — the
SortMergeJoin carries skew=true and the shuffle read splits the hot
partition — under thresholds scaled to test-sized data (production
defaults: 256MB/partition, factor 5; same mechanism)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join(spark):
    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "64KB",
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        big = spark.range(0, 200000).select(
            F.when(F.col("id") % 10 != 0, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        dim = spark.range(0, 50000).select(
            F.col("id").alias("k"),
            F.sha2(F.col("id").cast("string"), 224).alias("name"),
        )
        j = big.join(dim, "k")
        n = len(j.collect())
        # inner join keeps only ids divisible by 10 (dim has 0..50k,
        # big's key-0 rows all match dim key 0)
        assert n == 185000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:800]
        assert "skewed" in plan  # AQEShuffleRead coalesced and skewed
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
