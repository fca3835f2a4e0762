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


def test_cartesian_flagged(spark):
    a = spark.range(0, 5000)
    b = spark.range(0, 5000).withColumnRenamed("id", "id2")
    df = a.crossJoin(b)
    # not collected — 25M rows; the linter reads the PLAN, which is
    # available without executing
    assert "cartesian" in _codes(lint_plan(df))
    # a scalar-aggregate bounds frame broadcast back (maxRows=1) is the
    # engine's standard pattern and must NOT trip the check
    bounds = a.agg(F.max("id").alias("hi"))
    ok = a.crossJoin(bounds)
    ok.collect()
    assert "cartesian" not in _codes(lint_plan(ok))


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
