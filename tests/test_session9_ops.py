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


def test_mcnemar_pins(spark):
    import math

    from pyspark.sql import functions as F

    from harmonize_search_analyze_spark.operators.analytics import (
        mcnemar_test,
    )

    # a: right/right/right/wrong/wrong ; b: right/wrong/wrong/right/wrong
    # b-cell (a right, b wrong) = 2, c-cell = 1
    df = spark.createDataFrame(
        [(True, True), (True, False), (True, False),
         (False, True), (False, False)],
        "ca boolean, cb boolean",
    )
    r = mcnemar_test(df, F.col("ca"), F.col("cb")).collect()[0]
    assert (r.n, r.b, r.c) == (5, 2, 1)
    # chi2 = (|2-1|-1)^2 / 3 = 0 -> p = 1 - erf(0) = 1
    assert r.chi2 == 0.0 and r.p_value == 1.0

    # no discordant pairs -> NULL chi2/p
    agree = spark.createDataFrame(
        [(True, True), (False, False)], "ca boolean, cb boolean"
    )
    r2 = mcnemar_test(agree, F.col("ca"), F.col("cb")).collect()[0]
    assert r2.chi2 is None and r2.p_value is None


def test_wilson_pins(spark):
    import math

    from pyspark.sql import functions as F

    from harmonize_search_analyze_spark.operators.analytics import (
        wilson_intervals,
    )

    df = spark.createDataFrame(
        [("g", 1), ("g", 0), ("g", 0), ("g", 0)], "grp string, s int"
    )
    r = wilson_intervals(df, F.col("s") == 1, "grp").collect()[0]
    z = 1.959963984540054
    n, p = 4.0, 0.25
    denom = 1 + z * z / n
    center = p + z * z / (2 * n)
    spread = z * math.sqrt((p * (1 - p) + z * z / (4 * n)) / n)
    assert (r.n, r.successes, r.rate) == (4, 1, 0.25)
    assert r.lo == round((center - spread) / denom, 6)
    assert r.hi == round((center + spread) / denom, 6)


def test_effect_size_pins(spark):
    import math

    from pyspark.sql import functions as F

    from harmonize_search_analyze_spark.operators.analytics import (
        effect_size,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 4.0), ("b", 6.0)],
        "g string, v double",
    )
    r = effect_size(
        df, "v", F.col("g") == "a", F.col("g") == "b"
    ).collect()[0]
    pooled = math.sqrt((2 * 1.0 + 1 * 2.0) / 3.0)
    d = (2.0 - 5.0) / pooled
    g = d * (1 - 3.0 / (4 * 5 - 9))
    assert (r.n_a, r.n_b, r.mean_a, r.mean_b) == (3, 2, 2.0, 5.0)
    assert r.pooled_sd == round(pooled, 6)
    assert r.d == round(d, 6) and r.g == round(g, 6)

    # zero pooled variance -> NULL d/g
    const = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("b", 1.0), ("b", 1.0)],
        "g string, v double",
    )
    r2 = effect_size(
        const, "v", F.col("g") == "a", F.col("g") == "b"
    ).collect()[0]
    assert r2.d is None and r2.g is None


def test_hhi_and_theil_pins(spark):
    import math

    from harmonize_search_analyze_spark.operators.analytics import (
        hhi_concentration,
        theil_index,
    )

    docs = spark.createDataFrame(
        [("en", "s1", 2.0), ("en", "s1", 2.0), ("en", "s2", 4.0)],
        "lang string, source string, v double",
    )
    h = hhi_concentration(docs, "lang", "source").collect()[0]
    # shares 2/3, 1/3 -> hhi = 4/9 + 1/9 = 5/9
    assert (h.n, h.n_members) == (3, 2)
    assert h.hhi == round(5.0 / 9.0, 6)
    assert h.effective_members == round(9.0 / 5.0, 6)

    t = theil_index(docs, "v", "source").collect()[0]
    xs = [2.0, 2.0, 4.0]
    mu = sum(xs) / 3
    theil = sum((x / mu) * math.log(x / mu) for x in xs) / 3
    # groups: s1 mass 4 mean 2; s2 mass 4 mean 4
    between = (4 / 8) * math.log(2 / mu) + (4 / 8) * math.log(4 / mu)
    assert (t.n, t.n_groups) == (3, 2)
    assert t.theil == round(theil, 6)
    assert t.between == round(between, 6)
    assert t.within == round(theil - between, 6)

    # constant values -> theil 0, NULL between_share
    const = spark.createDataFrame(
        [("a", 3.0), ("b", 3.0)], "source string, v double"
    )
    tc = theil_index(const, "v", "source").collect()[0]
    assert tc.theil == 0.0 and tc.between_share is None


def test_jackknife_ci_shape(spark):
    from harmonize_search_analyze_spark.operators.analytics import (
        jackknife_ci,
    )

    df = spark.createDataFrame(
        [(i, float(i % 17)) for i in range(400)], "id bigint, v double"
    )
    r = jackknife_ci(df, "v", "id", buckets=20).collect()[0]
    assert r.n == 400
    exact_mean = sum(i % 17 for i in range(400)) / 400.0
    assert r.mean == round(exact_mean, 6)
    assert r.se is not None and r.se >= 0
    assert r.lo <= r.mean <= r.hi
    # deterministic across runs
    r2 = jackknife_ci(df, "v", "id", buckets=20).collect()[0]
    assert r == r2


def test_hazard_rate_pins(spark):
    from harmonize_search_analyze_spark.operators.analytics import (
        hazard_rate,
    )

    # observation end = 2024-01-20. u1: 0..1 (churned), u2: 0..12
    # (churned: 20-12=8>7), u3: 10..20 (censored, gap 0)
    rows = [
        (1, "2024-01-01"), (1, "2024-01-02"),
        (2, "2024-01-01"), (2, "2024-01-13"),
        (3, "2024-01-11"), (3, "2024-01-21"),
    ]
    df = spark.createDataFrame(rows, "user_id int, d string").selectExpr(
        "user_id", "CAST(d AS TIMESTAMP) AS ts"
    )
    out = {r.duration: r for r in hazard_rate(df).collect()}
    # durations: u1=1 churn, u2=12 churn, u3=10 censored
    assert set(out) == {1, 10, 12}
    assert (out[1].n_risk, out[1].n_churned) == (3, 1)
    assert out[1].hazard == round(1 / 3, 6)
    assert (out[10].n_risk, out[10].n_churned) == (2, 0)
    assert out[10].hazard == 0.0
    assert (out[12].n_risk, out[12].n_churned) == (1, 1)
    assert out[12].cum_hazard == round(1 / 3 + 0.0 + 1.0, 6)
    import math

    assert out[12].survival_na == round(math.exp(-(1 / 3 + 1.0)), 6)


def test_sprt_monitor_pins(spark):
    import math

    from pyspark.sql import functions as F

    from harmonize_search_analyze_spark.operators.analytics import (
        sprt_monitor,
    )

    # day 1: 2 successes / 2 trials, day 2: 0 / 2 — p0=0.2 p1=0.8 makes
    # the llr swing hard enough to cross both boundaries in turn
    rows = [
        ("2024-01-01", 1), ("2024-01-01", 1),
        ("2024-01-02", 0), ("2024-01-02", 0),
    ]
    df = spark.createDataFrame(rows, "d string, s int").selectExpr(
        "CAST(d AS TIMESTAMP) AS ts", "s"
    )
    out = sprt_monitor(
        df, F.col("s") == 1, F.lit(True), "ts",
        p0=0.2, p1=0.8, alpha=0.05, beta=0.2,
    ).collect()
    ls, lf = math.log(0.8 / 0.2), math.log(0.2 / 0.8)
    assert out[0].llr == round(2 * ls, 6)
    assert out[0].cum_llr == round(2 * ls, 6)
    # 2*ln4 = 2.77 >= ln(0.8/0.05)=2.77? ln(16)=2.7726, ln(0.8/0.05)=ln(16)
    assert out[0].decision == "accept_h1"
    # sticky: day 2 drops cum to 0 but the decision stays
    assert out[1].cum_llr == round(2 * ls + 2 * lf, 6)
    assert out[1].decision == "accept_h1"


def test_vocab_coverage_pins(spark):
    from harmonize_search_analyze_spark.operators.text import (
        vocab_coverage,
    )

    docs = spark.createDataFrame(
        [("a a a b b c",), ("a b c d",)], "text string"
    )
    # counts: a=4, b=3, c=2, d=1 ; total 10
    out = {r.k: r for r in vocab_coverage(
        docs, "text", ks=(1, 2, 3, 4)
    ).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1].covered_tokens == 4 and out[1].coverage == 0.4
    assert out[2].covered_tokens == 7
    assert out[4].covered_tokens == 10 and out[4].coverage == 1.0
    assert out[3].vocab_size == 4 and out[3].total_tokens == 10


def test_fuzzy_join_pins(spark):
    from harmonize_search_analyze_spark.operators.dedup import fuzzy_join

    docs = spark.createDataFrame(
        [
            (1, "spark engine"), (2, "spark engina"),  # dist 1, same block
            (3, "spark motor"),                        # dist > 3 to both
            (4, "zzzz other"),                         # different block
            (5, "spark engine"),                       # dup of 1 -> n=2
        ],
        "doc_id bigint, text string",
    )
    out = fuzzy_join(
        docs, "doc_id", "text", title_len=16, block_len=4, max_dist=3
    ).collect()
    pairs = {(r.title_a, r.title_b): r for r in out}
    assert ("spark engina", "spark engine") in pairs
    r = pairs[("spark engina", "spark engine")]
    assert r.dist == 1 and r.id_a == 2 and r.id_b == 1
    assert r.n_a == 1 and r.n_b == 2
    assert all(
        not (p[0].startswith("spark motor") or p[1] == "spark motor")
        or abs(len(p[0]) - len(p[1])) <= 3
        for p in pairs
    )
    assert ("spark engine", "spark motor") not in pairs


def test_orphan_check_pins(spark):
    from harmonize_search_analyze_spark.operators.curation import (
        orphan_check,
    )

    child = spark.createDataFrame(
        [(1,), (1,), (2,), (9,), (None,)], "fk int"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    r = orphan_check(child, "fk", parent, "pk").collect()[0]
    assert (r.n_child, r.n_null_fk) == (5, 1)
    assert r.n_orphans == 1  # the fk=9 row
    assert r.orphan_rate == 0.25  # 1 of 4 non-null
    assert (r.n_parent, r.n_childless) == (3, 1)  # pk=3
    assert r.childless_rate == round(1 / 3, 6)


def test_cluster_purity_pins(spark):
    import math

    from harmonize_search_analyze_spark.operators.analytics import (
        cluster_purity,
    )

    # c1: 3x a, 1x b ; c2: 2x b -> purity (3 + 2) / 6
    rows = [("c1", "a")] * 3 + [("c1", "b")] + [("c2", "b")] * 2
    df = spark.createDataFrame(rows, "c string, l string")
    r = cluster_purity(df, "c", "l").collect()[0]
    assert (r.n, r.n_clusters, r.n_labels) == (6, 2, 2)
    assert r.purity == round(5 / 6, 6)
    # NMI by hand
    n = 6.0
    cells = {("c1", "a"): 3, ("c1", "b"): 1, ("c2", "b"): 2}
    nc = {"c1": 4, "c2": 2}
    nl = {"a": 3, "b": 3}
    mi = sum(
        (v / n) * math.log(v * n / (nc[c] * nl[l]))
        for (c, l), v in cells.items()
    )
    hc = -sum((v / n) * math.log(v / n) for v in nc.values())
    hl = -sum((v / n) * math.log(v / n) for v in nl.values())
    assert r.nmi == round(mi / math.sqrt(hc * hl), 6)

    # single cluster -> H(C)=0 -> NULL nmi
    one = spark.createDataFrame(
        [("c1", "a"), ("c1", "b")], "c string, l string"
    )
    assert cluster_purity(one, "c", "l").collect()[0].nmi is None


def test_qq_plot_pins(spark):
    from pyspark.sql import functions as F

    from harmonize_search_analyze_spark.operators.analytics import (
        qq_plot,
    )

    # a = 0..10, b = a + 5 (pure shift) -> every gap 5
    rows = [("a", float(i)) for i in range(11)] + [
        ("b", float(i + 5)) for i in range(11)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    out = qq_plot(
        df, "v", F.col("g") == "a", F.col("g") == "b", grid=10
    ).collect()
    assert len(out) == 11
    assert [r.p for r in out] == [round(i / 10, 6) for i in range(11)]
    assert all(r.gap == 5.0 for r in out)
    assert out[0].q_a == 0.0 and out[-1].q_b == 15.0


def test_conversion_lag_pins(spark):
    from harmonize_search_analyze_spark.operators.analytics import (
        conversion_lag,
    )

    rows = [
        # u1 converts 60s after first click (purchase before first
        # click must NOT count)
        (1, "purchase", "2024-01-01 09:59:00"),
        (1, "click", "2024-01-01 10:00:00"),
        (1, "purchase", "2024-01-01 10:01:00"),
        (1, "purchase", "2024-01-01 11:00:00"),
        # u2 never converts
        (2, "click", "2024-01-01 10:00:00"),
        # u3 has no click -> not in the funnel population
        (3, "purchase", "2024-01-01 10:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "user_id int, event_type string, d string"
    ).selectExpr("user_id", "event_type", "CAST(d AS TIMESTAMP) AS ts")
    r = conversion_lag(df, "click", "purchase").collect()[0]
    assert (r.n_users, r.n_converted) == (2, 1)
    assert r.conversion_rate == 0.5
    assert r.p50_s == 60.0 and r.mean_s == 60.0


def test_sprt_stream_matches_batch_and_replays(spark, tmp_path):
    """After all micro-batches the latest epoch snapshot equals the
    batch sprt_monitor over the full series (including a later batch
    backfilling an earlier day); replaying an epoch rewrites identical
    state (idempotent recovery)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from harmonize_search_analyze_spark.operators.analytics import (
        sprt_monitor,
    )
    from harmonize_search_analyze_spark.streaming.windows import (
        sprt_process_batch,
        sprt_stream,
    )

    base = dt.datetime(2024, 3, 1)
    wave1 = [
        (i, "click", float(100 if i % 3 == 0 else 10),
         base + dt.timedelta(days=i % 4, hours=i % 6))
        for i in range(50)
    ]
    # wave2 backfills day 0-1 and extends to day 5
    wave2 = [
        (100 + i, "click" if i % 4 else "view",
         float(100 if i % 2 == 0 else 10),
         base + dt.timedelta(days=(i % 6), hours=i % 5))
        for i in range(70)
    ]
    schema = "event_id long, event_type string, value double, ts timestamp"
    src = tmp_path / "events"
    spark.createDataFrame(wave1, schema).coalesce(1).write.mode(
        "overwrite").parquet(str(src))
    spark.createDataFrame(wave2, schema).coalesce(1).write.mode(
        "append").parquet(str(src))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    kw = dict(
        success_expr="value > 50", treatment_expr="event_type = 'click'",
        ts_col="ts", p0=0.3, p1=0.5,
    )
    q = sprt_stream(
        stream, str(tmp_path / "state"), str(tmp_path / "trace"),
        str(tmp_path / "ckpt"), **kw,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    tr = spark.read.parquet(str(tmp_path / "trace"))
    last = tr.where(
        F.col("epoch") == tr.agg(F.max("epoch")).collect()[0][0]
    ).drop("epoch")

    batch = spark.createDataFrame(wave1 + wave2, schema)
    want = sprt_monitor(
        batch, F.col("value") > 50, F.col("event_type") == "click",
        "ts", p0=0.3, p1=0.5,
    ).collect()
    got = sorted(map(tuple, last.collect()))
    assert got == sorted(map(tuple, want))

    # replay the last epoch: state and trace rewrite identically
    before = sorted(map(tuple, spark.read.parquet(
        str(tmp_path / "state")).collect()))
    sprt_process_batch(
        spark.createDataFrame(wave2, schema), 1,
        str(tmp_path / "state"), str(tmp_path / "trace"), **kw,
    )
    after = sorted(map(tuple, spark.read.parquet(
        str(tmp_path / "state")).collect()))
    assert before == after
    last2 = spark.read.parquet(str(tmp_path / "trace"))
    last2 = last2.where(F.col("epoch") == 1).drop("epoch")
    assert sorted(map(tuple, last2.collect())) == got


def test_geo_hotspots_pins(spark):
    from harmonize_search_analyze_spark.operators.aggregations import (
        geo_hotspots,
    )

    # a dense blob near (0,0) in a sparse field of single points (>7
    # occupied cells so the Gi* denominator is defined): the blob cell
    # must carry the top gi_z
    rows = [(0.1 * i, 0.1 * i) for i in range(20)] + [
        (float(la), float(lo))
        for la in (-60.0, -30.0, 30.0, 60.0)
        for lo in (-60.0, -30.0, 30.0, 60.0)
    ]
    df = spark.createDataFrame(rows, "lat double, lon double")
    out = geo_hotspots(df, "lat", "lon", size_deg=5.0, k=5).collect()
    assert out, "no cells"
    top = out[0]
    assert top.doc_count >= 10  # the blob cell
    assert top.hood_count >= top.doc_count
    assert top.gi_z == max(r.gi_z for r in out)
    # ordering pinned gi_z DESC, hex ASC
    zs = [r.gi_z for r in out]
    assert zs == sorted(zs, reverse=True)


def test_weighted_percentile_pins(spark):
    from harmonize_search_analyze_spark.operators.aggregations import (
        weighted_percentile,
    )

    # values 1..4 with weights 1,1,1,7 -> total 10; p50 hits value 4
    # (cum 3 < 5 at value 3), p20 hits value 2 (cum 2 >= 2)
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 1.0), (3.0, 1.0), (4.0, 7.0)],
        "v double, w double",
    )
    out = {r.p: r for r in weighted_percentile(
        df, "v", "w", probs=(0.2, 0.5, 1.0)
    ).collect()}
    assert out[0.2].value == 2.0 and out[0.2].cum_weight == 2.0
    assert out[0.5].value == 4.0
    assert out[1.0].value == 4.0 and out[1.0].total_weight == 10.0

    # unweighted (w=1) p50 over 1..9 = lower-median 5
    u = spark.createDataFrame(
        [(float(i), 1.0) for i in range(1, 10)], "v double, w double"
    )
    assert weighted_percentile(u, "v", "w", probs=(0.5,)).collect()[
        0
    ].value == 5.0


def test_ipf_weights_pins(spark):
    from harmonize_search_analyze_spark.operators.sampling import (
        ipf_weights,
    )

    # two langs x two sources, heavily skewed; uniform targets ->
    # weighted marginal shares must converge to 0.5/0.5 on both axes
    rows = (
        [("en", "s1")] * 70 + [("en", "s2")] * 10
        + [("fr", "s1")] * 15 + [("fr", "s2")] * 5
    )
    df = spark.createDataFrame(rows, "lang string, source string")
    out = ipf_weights(df, "lang", "source", iters=8).collect()
    assert len(out) == 4
    share = {(r.row_key, r.col_key): r.weighted_share for r in out}
    en = share[("en", "s1")] + share[("en", "s2")]
    s1 = share[("en", "s1")] + share[("fr", "s1")]
    assert abs(en - 0.5) < 1e-3, en
    assert abs(s1 - 0.5) < 1e-3, s1
    # weights positive, total share 1
    assert all(r.weight > 0 for r in out)
    assert abs(sum(share.values()) - 1.0) < 1e-6


def test_stl_decompose_pins(spark):
    import datetime as dt

    from harmonize_search_analyze_spark.operators.analytics import (
        stl_decompose,
    )

    # pure weekly signal on a flat base: seasonal absorbs the pattern,
    # residuals ~0, strength ~1
    base = dt.datetime(2024, 1, 1)
    rows = []
    for d in range(28):
        v = 100.0 + (50.0 if d % 7 == 0 else 0.0)
        rows.append((base + dt.timedelta(days=d), v))
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    out = stl_decompose(df, "ts", "v").collect()
    assert len(out) == 28
    for r in out:
        assert abs(r.value - (r.trend + r.seasonal + r.residual)) < 1e-4
    # interior rows (full centered window): trend is flat 100+50/7 and
    # residuals small (edge rows pull the slot means slightly)
    interior = out[3:-3]
    assert all(abs(r.trend - (100.0 + 50.0 / 7.0)) < 1e-6
               for r in interior)
    assert all(abs(r.residual) < 6.0 for r in interior)
    assert out[0].seasonal_strength > 0.7
    # the 7 seasonal slot values are zero-centered by construction —
    # the first 7 days cover each slot exactly once
    assert abs(sum(r.seasonal for r in out[:7])) < 1e-4


def test_lorenz_gini_pins(spark):
    from harmonize_search_analyze_spark.operators.analytics import (
        lorenz_gini,
    )

    # all equal -> gini 0, curve is the diagonal
    eq = spark.createDataFrame([(5.0,)] * 10, "v double")
    out = lorenz_gini(eq, "v", points=5).collect()
    assert all(r.gini == 0.0 for r in out)
    assert [r.cum_value_share for r in out] == [0.2, 0.4, 0.6, 0.8, 1.0]

    # one owner holds everything among n=10 -> gini = (n-1)/n = 0.9
    # (population definition; v>0 filter drops the zero owners, so
    # encode "others" as tiny eps values instead)
    rows = [(1e-9,)] * 9 + [(100.0,)]
    sk = spark.createDataFrame(rows, "v double")
    g = lorenz_gini(sk, "v", points=5).collect()[0].gini
    assert abs(g - 0.9) < 1e-3


def test_theil_sen_pins(spark):
    import datetime as dt

    from harmonize_search_analyze_spark.operators.analytics import (
        theil_sen,
    )

    # clean slope 2/day with ONE wild outlier day: Theil-Sen stays ~2,
    # OLS gets dragged
    base = dt.datetime(2024, 1, 1)
    rows = [
        (base + dt.timedelta(days=d), 10.0 + 2.0 * d) for d in range(15)
    ]
    rows[13] = (base + dt.timedelta(days=13), 10000.0)
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    r = theil_sen(df, "ts", "v").collect()[0]
    assert r.n_days == 15
    assert abs(r.slope_per_day - 2.0) < 0.2
    assert abs(r.ols_slope - 2.0) > 10  # OLS bent by the outlier
