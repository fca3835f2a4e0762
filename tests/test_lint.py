"""Plan linter: each anti-pattern is planted and must be flagged;
clean plans and allowed Arrow stages must pass silently."""

from __future__ import annotations

from pyspark.sql import functions as F

from harmonize_search_analyze_spark.plans.lint import lint_plan


def _codes(findings):
    return {c for c, _ in findings}


def test_clean_plan_passes(spark):
    df = (
        spark.range(0, 1000)
        .select((F.col("id") % 7).alias("k"), F.col("id").alias("v"))
        .groupBy("k")
        .agg(F.sum("v").alias("s"))
    )
    df.collect()
    assert lint_plan(df) == []


def test_cartesian_and_cross_broadcast(spark):
    # both sides above the broadcast threshold -> physical
    # CartesianProduct -> the HARD flag. Never collected (the linter
    # reads plans).
    big_a = spark.range(0, 30_000_000)  # ~240MB stats, above the session's 64MB broadcast cap
    big_b = spark.range(0, 30_000_000).withColumnRenamed("id", "id2")
    df = big_a.crossJoin(big_b)
    assert "cartesian" in _codes(lint_plan(df))
    # one small-ESTIMATED side -> BNLJ -> the warning class only
    small = spark.range(0, 5000).withColumnRenamed("id", "id2")
    est = big_a.crossJoin(small)
    codes = _codes(lint_plan(est))
    assert "cartesian" not in codes
    assert "cross_broadcast" in codes
    # a scalar-aggregate bounds frame (maxRows=1) stays fully silent
    bounds = big_a.agg(F.max("id").alias("hi"))
    ok = big_a.crossJoin(bounds)  # plan-only, 30M rows never collected
    got = _codes(lint_plan(ok))
    assert "cartesian" not in got and "cross_broadcast" not in got


def test_python_udf_flagged_arrow_allowed(spark):
    from pyspark.sql.types import LongType

    plus = F.udf(lambda x: x + 1, LongType())
    bad = spark.range(0, 10).select(plus("id").alias("y"))
    bad.collect()
    assert "python_eval" in _codes(lint_plan(bad))

    import pandas as pd

    def add(it):
        for pdf in it:
            yield pd.DataFrame({"y": pdf["id"] + 1})

    ok = spark.range(0, 10).mapInPandas(add, "y long")
    ok.collect()
    assert "python_eval" not in _codes(lint_plan(ok))


def test_global_window_flagged(spark):
    from pyspark.sql import Window

    w = Window.orderBy("id")
    df = spark.range(0, 100).select(
        "id", F.row_number().over(w).alias("rn")
    )
    df.collect()
    assert "global_window" in _codes(lint_plan(df))
    # partitioned window is fine
    wp = Window.partitionBy(F.col("id") % 5).orderBy("id")
    ok = spark.range(0, 100).select(
        "id", F.row_number().over(wp).alias("rn")
    )
    ok.collect()
    assert "global_window" not in _codes(lint_plan(ok))


def test_wide_scan_and_shuffle_thresholds(spark, tmp_path):
    wide = spark.range(0, 50).select(
        "id", *[(F.col("id") + i).alias(f"c{i}") for i in range(30)]
    )
    p = str(tmp_path / "wide")
    wide.write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p)
    df.collect()
    assert "wide_scan" in _codes(lint_plan(df))
    pruned = spark.read.parquet(p).select("id", "c1")
    pruned.collect()
    assert "wide_scan" not in _codes(lint_plan(pruned))
    # shuffle counter: genuine distinct shuffles (adjacent repartitions
    # would collapse) past a lowered threshold
    noisy = spark.range(0, 1000).select(
        (F.col("id") % 7).alias("a"), (F.col("id") % 11).alias("b"),
        F.col("id").alias("v"),
    )
    s1 = noisy.groupBy("a").agg(F.sum("v").alias("s"))
    s2 = noisy.groupBy("b").agg(F.sum("v").alias("t"))
    j = s1.join(s2, s1.a == s2.b).orderBy("s")
    j.collect()
    assert "many_shuffles" in _codes(lint_plan(j, max_exchanges=2))


def test_gated_queries_stay_clean(spark):
    """The engine's own flagship queries pass the linter (the declared
    brute oracles and bucket-level windows are the documented
    exceptions and are not in this sample)."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    for name in ("terms_topk", "join_revenue", "corpus_clean",
                 "countmin_topk", "int8_topk"):
        df = entry.queries()[name](spark, sf)
        df.collect()
        got = lint_plan(df)
        assert got == [], (name, got)
