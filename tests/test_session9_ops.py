"""Round-7 session tests: ANSI-safe SQL twins + this round's operators."""

from __future__ import annotations

import duckdb
import pytest


def test_spearman_sql_twin_constant_null_both_dialects(spark):
    """ADVICE r6: the spark-dialect spearman SQL twin used CORR, which
    throws DIVIDE_BY_ZERO under Spark 4 ANSI on a constant column while
    the DataFrame path returns NULL — the covar/stddev NULLIF form must
    return NULL on BOTH engines and still match on normal input."""
    from harmonize_search_analyze_spark.operators.analytics import (
        spearman_corr,
        spearman_corr_sql,
    )

    spark.createDataFrame(
        [(1.0, 5.0), (2.0, 5.0), (3.0, 5.0)], "x double, y double"
    ).createOrReplaceTempView("sp9_const")
    row = spark.sql(
        spearman_corr_sql("sp9_const", "x", "y", "spark")
    ).collect()[0]
    assert (row.n, row.rho) == (3, None)

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE sp9_const AS SELECT * FROM (VALUES"
        " (1.0,5.0),(2.0,5.0),(3.0,5.0)) t(x,y)"
    )
    assert con.execute(
        spearman_corr_sql("sp9_const", "x", "y", "duckdb")
    ).fetchall() == [(3, None)]

    # non-degenerate parity: SQL twin == DataFrame fn == duckdb
    rows = [(float(i), float((i * 7) % 13)) for i in range(40)]
    spark.createDataFrame(rows, "x double, y double").createOrReplaceTempView(
        "sp9_norm"
    )
    df_rho = spearman_corr(spark.table("sp9_norm"), "x", "y").collect()[0].rho
    sql_rho = (
        spark.sql(spearman_corr_sql("sp9_norm", "x", "y", "spark"))
        .collect()[0]
        .rho
    )
    con.execute(
        "CREATE TABLE sp9_norm AS SELECT * FROM (VALUES "
        + ",".join(f"({a},{b})" for a, b in rows)
        + ") t(x,y)"
    )
    duck_rho = con.execute(
        spearman_corr_sql("sp9_norm", "x", "y", "duckdb")
    ).fetchall()[0][1]
    assert df_rho == sql_rho == duck_rho


def test_xcorr_sql_twin_constant_null_both_dialects(spark):
    """ADVICE r6: xcorr_lags_sql kept CORR after the DataFrame fix
    (commit 248825a) — a lag whose overlap is constant-valued must
    yield NULL, not an ANSI DIVIDE_BY_ZERO crash."""
    from harmonize_search_analyze_spark.operators.analytics import (
        xcorr_lags_sql,
    )

    a = (
        "SELECT to_timestamp('2024-01-0' || i) AS bucket,"
        " CAST(i AS DOUBLE) AS v"
        " FROM (SELECT explode(sequence(1,9)) AS i)"
    )
    b = (
        "SELECT to_timestamp('2024-01-0' || i) AS bucket,"
        " CAST(5.0 AS DOUBLE) AS v"
        " FROM (SELECT explode(sequence(1,9)) AS i)"
    )
    rows = spark.sql(xcorr_lags_sql(a, b, "spark", max_lag=2)).collect()
    assert [r.lag for r in rows] == [-2, -1, 0, 1, 2]
    assert all(r.corr is None for r in rows)

    con = duckdb.connect()
    ad = (
        "SELECT TIMESTAMP '2024-01-01' + to_days(CAST(t.i AS INT))"
        " AS bucket, CAST(t.i AS DOUBLE) AS v FROM range(0,9) t(i)"
    )
    bd = (
        "SELECT TIMESTAMP '2024-01-01' + to_days(CAST(t.i AS INT))"
        " AS bucket, 5.0 AS v FROM range(0,9) t(i)"
    )
    drows = con.execute(xcorr_lags_sql(ad, bd, "duckdb", max_lag=2)).fetchall()
    assert [r[0] for r in drows] == [-2, -1, 0, 1, 2]
    assert all(r[2] is None for r in drows)


def test_prefix_sums_matches_window(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from harmonize_search_analyze_spark.operators.ordering import (
        prefix_sums,
    )

    import random

    rng = random.Random(7)
    rows = [
        (float(v), rng.randint(0, 9), rng.randint(0, 9))
        for v in rng.sample(range(10000), 500)
    ]
    df = spark.createDataFrame(rows, "v double, a int, b int").withColumn(
        "t", F.col("a") + F.col("b")
    )
    got = {
        r.v: (r.sa, r.st)
        for r in prefix_sums(df, ["v"], {"a": "sa", "t": "st"}).collect()
    }
    w = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    exp = {
        r.v: (r.sa, r.st)
        for r in df.select(
            "v",
            F.sum("a").over(w).alias("sa"),
            F.sum("t").over(w).alias("st"),
        ).collect()
    }
    assert got == exp

    # descending order spec
    gd = {
        r.v: r.sa for r in prefix_sums(df, [("v", False)], {"a": "sa"}).collect()
    }
    wd = Window.orderBy(F.col("v").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ed = {
        r.v: r.sa for r in df.select("v", F.sum("a").over(wd).alias("sa")).collect()
    }
    assert gd == ed


def test_ntile_scalable_matches_ntile(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from harmonize_search_analyze_spark.operators.ordering import (
        ntile_scalable,
    )

    import random

    rng = random.Random(11)
    # numeric desc + tie-break, n<b edge, string keys (sampling path)
    for n_rows, b in [(300, 20), (40, 7), (5, 9), (1, 5)]:
        rr = [(i, rng.random()) for i in rng.sample(range(100000), n_rows)]
        d = spark.createDataFrame(rr, "id bigint, x double")
        order = [("x", False), ("id", True)]
        got = {
            r.id: r.tile for r in ntile_scalable(d, order, b, "tile").collect()
        }
        w = Window.orderBy(F.col("x").desc(), F.col("id").asc())
        exp = {
            r.id: r.tile
            for r in d.select("id", F.ntile(b).over(w).alias("tile")).collect()
        }
        assert got == exp, f"n={n_rows} b={b}"

    sr = [(f"doc_{i:06d}", i % 13) for i in rng.sample(range(100000), 400)]
    d = spark.createDataFrame(sr, "doc_id string, v int")
    got = {
        r.doc_id: r.tile
        for r in ntile_scalable(d, ["doc_id"], 20, "tile").collect()
    }
    exp = {
        r.doc_id: r.tile
        for r in d.select(
            "doc_id", F.ntile(20).over(Window.orderBy("doc_id")).alias("tile")
        ).collect()
    }
    assert got == exp


def test_prefix_sums_stable_across_repeated_builds(spark):
    """Regression for the spark_partition_id() design this round REPLACED:
    repeated same-plan persists + Spark's plan-matched cache registry let
    the local-window branch and the offsets branch resample range
    boundaries independently, silently corrupting the running sums on
    the SECOND action of a rebuilt frame (observed ~5/6 trials on the
    sf0.01 events value frame). With driver-collected literal boundaries
    the bucket id is a pure key function, so every build and every
    action must agree exactly."""
    from pyspark.sql import functions as F

    from harmonize_search_analyze_spark.operators.ordering import (
        prefix_sums,
    )

    import random

    rng = random.Random(3)
    rows = [(float(v), rng.randint(1, 5)) for v in rng.sample(range(50000), 2000)]
    df = spark.createDataFrame(rows, "v double, t int")
    expected_total = None
    for _ in range(4):
        ps = prefix_sums(df, ["v"], {"t": "cum"})
        agg_sum = ps.agg(F.sum("cum")).first()[0]  # action 1
        collected = ps.collect()  # action 2 on the same frame
        collected.sort(key=lambda r: r.v)
        run = 0
        for r in collected:
            run += r.t
            assert r.cum == run, f"corrupt running sum at v={r.v}"
        if expected_total is None:
            expected_total = agg_sum
        assert agg_sum == expected_total
        assert sum(r.cum for r in collected) == agg_sum
