

def test_pr_curve_hand_values(spark):
    """PR sweep against hand-computed tp/fp at each threshold; zero-
    positive input yields NULL recall/f1, never a division abort."""
    from harmonize_search_analyze_spark.operators.analytics import pr_curve

    df = spark.createDataFrame(
        [(0.9, 1), (0.8, 0), (0.8, 1), (0.5, 0), (0.3, 1)],
        ["score", "y"],
    )
    rows = pr_curve(df, "score", "y").collect()
    got = [(r.threshold, r.tp, r.fp, r.precision, r.recall) for r in rows]
    assert got == [
        (0.9, 1, 0, 1.0, round(1 / 3, 6)),
        (0.8, 2, 1, round(2 / 3, 6), round(2 / 3, 6)),
        (0.5, 2, 2, 0.5, round(2 / 3, 6)),
        (0.3, 3, 2, 0.6, 1.0),
    ]
    f1_08 = rows[1].f1
    assert f1_08 == round(2 * (2 / 3) * (2 / 3) / ((2 / 3) + (2 / 3)), 6)

    none_pos = spark.createDataFrame([(0.9, 0), (0.1, 0)], ["score", "y"])
    r = pr_curve(none_pos, "score", "y").collect()
    assert all(x.recall is None and x.f1 is None for x in r)


def test_step_transitions_hand_counts(spark):
    """Consecutive-event edges per user; single-event users emit none;
    ties pinned."""
    import datetime as dt

    from harmonize_search_analyze_spark.operators.analytics import (
        step_transitions,
    )

    t = lambda m: dt.datetime(2025, 1, 1, 0, m)
    df = spark.createDataFrame(
        [(1, t(0), "view"), (1, t(1), "click"), (1, t(2), "buy"),
         (2, t(0), "view"), (2, t(5), "click"),
         (3, t(0), "view")],
        ["uid", "ts", "ev"],
    )
    got = [(r.from_step, r.to_step, r.transitions) for r in
           step_transitions(df, "uid", "ts", "ev").collect()]
    assert got == [("view", "click", 2), ("click", "buy", 1)]


def test_seasonal_anomalies_same_hour_profile(spark):
    """A spike flags against its own hour's profile; a consistently busy
    hour does NOT flag (the rate_anomalies failure mode)."""
    import datetime as dt

    from harmonize_search_analyze_spark.operators.analytics import (
        seasonal_anomalies,
    )

    rows = []
    for day in range(1, 11):
        rows += [(dt.datetime(2025, 1, day, 9, m),) for m in range(30)]
        rows += [(dt.datetime(2025, 1, day, 3, m),) for m in range(2)]
    rows += [(dt.datetime(2025, 1, 11, 3, m % 60),) for m in range(40)]
    df = spark.createDataFrame(rows, ["ts"])
    got = seasonal_anomalies(df, "ts", threshold=2.0).collect()
    flagged = {(r.bucket, r.hour_of_day) for r in got}
    assert (dt.datetime(2025, 1, 11, 3), 3) in flagged
    assert all(h == 3 for _, h in flagged)  # busy-but-normal 9am not flagged


def test_ks_drift_hand_values(spark):
    """KS statistic vs a hand-computed CDF gap; identical distributions
    give ~0."""
    from harmonize_search_analyze_spark.operators.analytics import ks_drift

    rows = [("a", v) for v in [1.0, 2.0, 3.0, 4.0]] + \
           [("b", v) for v in [3.0, 4.0, 5.0, 6.0]]
    df = spark.createDataFrame(rows, ["g", "v"])
    r = ks_drift(df, "v", "g", "a", "b").collect()[0]
    # F_a(2)=0.5, F_b(2)=0 -> gap .5 ; same at v=4 (1.0 vs 0.5): tie ->
    # smallest value wins
    assert (r.n_a, r.n_b, r.ks_stat, r.ks_at) == (4, 4, 0.5, 2.0)

    same = spark.createDataFrame(
        [("a", 1.0), ("b", 1.0), ("a", 2.0), ("b", 2.0)], ["g", "v"]
    )
    assert ks_drift(same, "v", "g", "a", "b").collect()[0].ks_stat == 0.0


def test_chi2_independence_hand_values(spark):
    """2x2 contingency chi2 against the textbook formula; independent
    columns give ~0."""
    from harmonize_search_analyze_spark.operators.analytics import (
        chi2_independence,
    )

    rows = [("x", "p")] * 30 + [("x", "q")] * 10 + \
           [("y", "p")] * 10 + [("y", "q")] * 30
    df = spark.createDataFrame(rows, ["a", "b"])
    r = chi2_independence(df, "a", "b").collect()[0]
    # expected all cells 20 -> chi2 = 4 * (10^2/20) = 20
    assert (r.n, r.dof, r.chi2) == (80, 1, 20.0)

    ind = spark.createDataFrame(
        [("x", "p")] * 9 + [("x", "q")] * 3 + [("y", "p")] * 3
        + [("y", "q")] * 1, ["a", "b"]
    )
    assert chi2_independence(ind, "a", "b").collect()[0].chi2 == 0.0


def test_chi2_zero_cell_counted(spark):
    """Review finding: a structurally empty contingency cell still
    contributes its expected count to chi2 (scipy agreement)."""
    from harmonize_search_analyze_spark.operators.analytics import (
        chi2_independence,
    )

    rows = [("x", "p")] * 5 + [("y", "p")] * 5 + [("y", "q")] * 5
    df = spark.createDataFrame(rows, ["a", "b"])
    r = chi2_independence(df, "a", "b").collect()[0]
    # marginals: x=5,y=10 ; p=10,q=5 ; n=15
    # e(x,p)=10/3 e(x,q)=5/3 e(y,p)=20/3 e(y,q)=10/3
    want = ((5 - 10/3) ** 2 / (10/3) + (0 - 5/3) ** 2 / (5/3)
            + (5 - 20/3) ** 2 / (20/3) + (5 - 10/3) ** 2 / (10/3))
    assert r.chi2 == round(want, 6)


def test_rfm_segments_tiles_and_pins(spark):
    """RFM: per-user agg is right; ntile boundaries follow the pinned
    (metric, user_key) orderings; segment string concatenates r-f-m."""
    import datetime as dt

    from harmonize_search_analyze_spark.operators.analytics import (
        rfm_segments,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user, day-offset, value
        (1, 0, 10.0), (1, 5, 30.0),          # freq 2, monetary 40, last d5
        (2, 9, 5.0),                          # freq 1, monetary 5, last d9
        (3, 1, 100.0), (3, 2, 1.0), (3, 3, 1.0),  # freq 3, mon 102, last d3
        (4, 7, 50.0),                         # freq 1, monetary 50, last d7
    ]
    df = spark.createDataFrame(
        [(u, t0 + dt.timedelta(days=d), v) for u, d, v in rows],
        ["user_id", "ts", "value"],
    )
    out = {r["user_key"]: r for r in rfm_segments(df, n_tiles=4).collect()}
    assert out[1]["frequency"] == 2 and out[1]["monetary"] == 40.0
    # recency order: u2(d9) r=1, u4(d7) r=2, u1(d5) r=3, u3(d3) r=4
    assert [out[u]["r"] for u in (2, 4, 1, 3)] == [1, 2, 3, 4]
    # frequency order: u3(3) f=1, u1(2) f=2, u2,u4 tie(1) -> user asc
    assert [out[u]["f"] for u in (3, 1, 2, 4)] == [1, 2, 3, 4]
    # monetary order: u3(102) m=1, u4(50) m=2, u1(40) m=3, u2(5) m=4
    assert [out[u]["m"] for u in (3, 4, 1, 2)] == [1, 2, 3, 4]
    assert out[3]["segment"] == "4-1-1"


def test_event_paths_order_and_ties(spark):
    """Paths follow the per-user (ts, event_id) order; incomplete tails
    drop; counts aggregate across users; top-k ties pin on path asc."""
    import datetime as dt

    from harmonize_search_analyze_spark.operators.analytics import (
        event_paths,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # (id, user, sec, type): u1 a,b,c,d -> paths a>b>c, b>c>d
        (1, 1, 0, "a"), (2, 1, 1, "b"), (3, 1, 2, "c"), (4, 1, 3, "d"),
        # u2 a,b,c -> a>b>c (same ts tie broken by id: 5 then 6 then 7)
        (5, 2, 0, "a"), (6, 2, 0, "b"), (7, 2, 0, "c"),
        # u3 only two events -> no trigram
        (8, 3, 0, "a"), (9, 3, 1, "b"),
    ]
    df = spark.createDataFrame(
        [(i, u, t0 + dt.timedelta(seconds=s), t) for i, u, s, t in rows],
        ["event_id", "user_id", "ts", "event_type"],
    )
    got = [(r["path"], r["doc_count"])
           for r in event_paths(df, depth=3, k=10).collect()]
    assert got == [("a>b>c", 2), ("b>c>d", 1)]


def test_zipf_fit_known_distribution(spark):
    """An exactly Zipfian corpus (freq = 60/rank) fits slope ~ -1 with
    r2 ~ 1; n_ranks counts the distinct tokens."""
    from harmonize_search_analyze_spark.operators.text import zipf_fit

    words = []
    for rank, tok in enumerate(["aa", "bb", "cc", "dd", "ee", "ff"], 1):
        words += [tok] * (60 // rank)
    df = spark.createDataFrame([(" ".join(words),)], ["text"])
    row = zipf_fit(df, "text", top_ranks=6).collect()[0]
    assert row["n_ranks"] == 6
    assert abs(row["slope"] - (-1.0)) < 0.05, row
    assert row["r2"] > 0.99


def test_feature_hash_vectors_semantics(spark):
    """Hashing-trick featurizer: tf counts per (doc,bucket); identical
    tokens share a bucket; tfidf downweights corpus-wide buckets; tf
    weighting returns raw counts."""
    from harmonize_search_analyze_spark.operators.text import (
        feature_hash_vectors,
    )

    df = spark.createDataFrame(
        [(1, "apple apple banana"), (2, "apple cherry"), (3, "durian")],
        ["doc_id", "text"],
    )
    tf = {(r.doc_id, r.bucket): r.weight for r in feature_hash_vectors(
        df, weighting="tf", n_buckets=64).collect()}
    # doc1 has apple twice -> one bucket with weight 2, banana weight 1
    assert sorted(v for (d, _), v in tf.items() if d == 1) == [1.0, 2.0]
    ti = {(r.doc_id, r.bucket): r.weight for r in feature_hash_vectors(
        df, weighting="tfidf", n_buckets=64).collect()}
    import math
    # apple: df=2, N=3 -> idf ln(4/3); banana/cherry/durian: df=1 -> ln(2)
    apple_w = round(2 * math.log(4 / 3), 6)
    rare_w = round(math.log(2.0), 6)
    assert sorted(v for (d, _), v in ti.items() if d == 1) == sorted(
        [apple_w, rare_w]
    )
    assert all(v == rare_w for (d, _), v in ti.items() if d == 3)


def test_kaplan_meier_known_curve(spark):
    """KM product-limit on a hand-computed cohort: churned users step the
    curve down by (1 - d/n); censored-only durations keep the previous
    survival value."""
    import datetime as dt

    from harmonize_search_analyze_spark.operators.analytics import (
        kaplan_meier,
    )

    t0 = dt.datetime(2024, 1, 1)

    def ev(u, d0, d1):
        return [(u, t0 + dt.timedelta(days=d0)), (u, t0 + dt.timedelta(days=d1))]

    rows = []
    # observation end = day 30 (u5's last event)
    rows += ev(1, 0, 5)    # duration 5, last day 5  -> churned
    rows += ev(2, 0, 5)    # duration 5              -> churned
    rows += ev(3, 0, 10)   # duration 10             -> churned
    rows += ev(4, 20, 25)  # duration 5, last day 25 -> censored (gap 5)
    rows += ev(5, 10, 30)  # duration 20, last day 30 -> censored
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    got = {r.duration: r for r in kaplan_meier(df, churn_gap_days=7).collect()}
    # duration 5: n_risk 5, churned 2 -> S = 1 - 2/5 = 0.6
    assert (got[5].n_risk, got[5].n_churned, got[5].n_censored) == (5, 2, 1)
    assert got[5].survival == 0.6
    # duration 10: n_risk 2, churned 1 -> S = 0.6 * (1 - 1/2) = 0.3
    assert (got[10].n_risk, got[10].n_churned) == (2, 1)
    assert got[10].survival == 0.3
    # duration 20: censored only -> survival carries at 0.3
    assert (got[20].n_churned, got[20].survival) == (0, 0.3)


def test_readability_known_text(spark):
    """Flesch score on hand-computable text: 'the cat sat. the dog ran.'
    -> 6 words, 2 sentences, 6 one-syllable words: 206.835 - 1.015*3
    - 84.6*1 = 119.19."""
    from pyspark.sql import functions as F

    from harmonize_search_analyze_spark.operators.text import (
        readability_sql,
    )

    df = spark.createDataFrame(
        [(1, "the cat sat. the dog ran.")], ["id", "text"]
    )
    got = df.select(
        F.expr(readability_sql("text", "spark")).alias("fre")
    ).collect()[0].fre
    assert got == 119.19
    import duckdb
    want = duckdb.connect().execute(
        "SELECT " + readability_sql("'the cat sat. the dog ran.'", "duckdb")
    ).fetchone()[0]
    assert want == got


def test_skew_report_metrics(spark):
    """Known distribution: 80/10/10 over three keys + NULLs counted as
    a key. Shares exact; entropy normalized (uniform -> 1); the
    max/mean ratio is the hot-reducer multiple; plan has no
    whole-frame window and broadcasts the summary."""
    import math

    from pyspark.sql import functions as F  # noqa: F401

    from harmonize_search_analyze_spark.operators.analytics import (
        skew_report,
    )

    rows = (
        [("hot",)] * 80 + [("warm",)] * 10 + [(None,)] * 10
    )
    df = spark.createDataFrame(rows, "k string")
    got = {r.key: r for r in skew_report(df, "k", top=10).collect()}
    assert set(got) == {"hot", "warm", "<null>"}
    assert got["hot"].share == 0.8
    # entropy of (0.8, 0.1, 0.1) normalized by ln(3)
    h = -(0.8 * math.log(0.8) + 0.2 * math.log(0.1)) / math.log(3)
    assert abs(got["hot"].entropy - round(h, 6)) < 1e-6
    # hottest key holds 80 rows vs mean 100/3
    assert abs(got["hot"].max_over_mean - round(80 / (100 / 3), 6)) < 1e-6
    out = skew_report(df, "k", top=10)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_skew_report_uniform_and_single_key(spark):
    from harmonize_search_analyze_spark.operators.analytics import (
        skew_report,
    )

    uni = spark.createDataFrame(
        [(str(i % 5),) for i in range(100)], "k string"
    )
    got = skew_report(uni, "k").collect()
    assert all(r.entropy == 1.0 and r.max_over_mean == 1.0 for r in got)
    one = spark.createDataFrame([("a",)] * 7, "k string")
    r = skew_report(one, "k").collect()[0]
    # single key: entropy pinned 0, ratio 1
    assert (r.entropy, r.max_over_mean, r.share) == (0.0, 1.0, 1.0)


def test_kaplan_meier_fully_churned_bucket(spark):
    """ADVICE r4: a bucket whose whole at-risk population churns
    (d == n_risk — the ordinary shape for the longest-lived cohort)
    must drop survival to 0 from that bucket onward, not feed log(0)
    (silently-skipped NULL on Spark, a raise on DuckDB). Both dialects."""
    import datetime as dt

    import duckdb

    from harmonize_search_analyze_spark.operators.analytics import (
        kaplan_meier,
        kaplan_meier_sql,
    )

    t0 = dt.datetime(2024, 1, 1)

    def ev(u, d0, d1):
        return [
            (u, t0 + dt.timedelta(days=d0)),
            (u, t0 + dt.timedelta(days=d1)),
        ]

    # end = day 30 (u3); u1/u2 gap 10 > 7 -> churned, u3 gap 0 -> censored
    rows = ev(1, 0, 20) + ev(2, 0, 20) + ev(3, 28, 30)
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    got = {
        r.duration: r for r in kaplan_meier(df, churn_gap_days=7).collect()
    }
    assert (got[2].n_risk, got[2].n_churned, got[2].survival) == (3, 0, 1.0)
    # duration 20: n_risk 2, churned 2 -> the bucket fully churns
    assert (got[20].n_risk, got[20].n_churned) == (2, 2)
    assert got[20].survival == 0.0
    con = duckdb.connect()
    con.register("ev", df.toPandas())
    want = {
        r[0]: r
        for r in con.execute(
            kaplan_meier_sql("ev", churn_gap_days=7)
        ).fetchall()
    }
    assert want[2][4] == 1.0
    assert want[20][4] == 0.0


def test_psi_drift_identical_distributions_zero(spark):
    from harmonize_search_analyze_spark.operators.analytics import psi_drift

    rows = [(float(i % 50),) for i in range(1000)]
    df = spark.createDataFrame(rows, ["v"])
    out = psi_drift(df, df, "v", bins=10).collect()
    assert len(out) == 10
    assert all(r["psi"] == 0.0 for r in out)
    assert all(r["contrib"] == 0.0 for r in out)
    assert abs(sum(r["ref_frac"] for r in out) - 1.0) < 1e-6


def test_psi_drift_detects_shift(spark):
    from harmonize_search_analyze_spark.operators.analytics import psi_drift

    ref = spark.createDataFrame([(float(i % 100),) for i in range(2000)],
                                ["v"])
    # actual shifted + clamped into edge bins (values beyond ref max)
    act = spark.createDataFrame(
        [(float(i % 100) + 60.0,) for i in range(2000)], ["v"]
    )
    out = psi_drift(ref, act, "v", bins=10).collect()
    psi = out[0]["psi"]
    assert psi > 0.25  # "drifted" per the standard rule of thumb
    # clamping: the top bin absorbs everything above ref max
    assert out[-1]["act_frac"] > out[-1]["ref_frac"]


def test_psi_drift_hand_computed(spark):
    import math

    from harmonize_search_analyze_spark.operators.analytics import psi_drift

    # 2 bins over ref [0, 10): ref 50/50, act 25/75
    ref = spark.createDataFrame(
        [(2.0,), (3.0,), (7.0,), (8.0,)], ["v"]
    )
    act = spark.createDataFrame(
        [(1.0,), (6.0,), (7.0,), (9.0,)], ["v"]
    )
    out = psi_drift(ref, act, "v", bins=2).collect()
    want = round(
        (0.25 - 0.5) * math.log(0.25 / 0.5)
        + (0.75 - 0.5) * math.log(0.75 / 0.5), 6
    )
    assert out[0]["psi"] == want


def test_ols_trend_exact_line(spark):
    from harmonize_search_analyze_spark.operators.analytics import ols_trend

    rows = [("a", float(i), 2.0 * i + 5.0) for i in range(20)] + \
           [("b", float(i), -1.5 * i + 3.0) for i in range(10)]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    out = {r["g"]: r for r in ols_trend(df, "x", "y", by="g").collect()}
    assert out["a"]["slope"] == 2.0 and out["a"]["intercept"] == 5.0
    assert out["a"]["r2"] == 1.0 and out["a"]["n"] == 20
    assert out["b"]["slope"] == -1.5 and out["b"]["intercept"] == 3.0


def test_ols_trend_degenerate_pins(spark):
    from harmonize_search_analyze_spark.operators.analytics import ols_trend

    flat_y = spark.createDataFrame(
        [(float(i), 7.0) for i in range(5)], ["x", "y"]
    )
    r = ols_trend(flat_y, "x", "y").collect()[0]
    assert r["slope"] == 0.0
    assert r["r2"] == 1.0  # zero y-variance: both engines return 1.0
    flat_x = spark.createDataFrame(
        [(2.0, float(i)) for i in range(5)], ["x", "y"]
    )
    r = ols_trend(flat_x, "x", "y").collect()[0]
    assert r["slope"] is None and r["r2"] is None


def test_xcorr_lags_detects_known_lag(spark):
    import datetime as dt

    from harmonize_search_analyze_spark.operators.analytics import (
        xcorr_lags,
    )

    t0 = dt.datetime(2025, 1, 1)
    vals = [float(v) for v in
            [5, 9, 2, 8, 1, 7, 3, 9, 4, 6, 2, 8, 5, 1, 9, 3]]
    a = spark.createDataFrame(
        [(t0 + dt.timedelta(days=i), v) for i, v in enumerate(vals)],
        ["bucket", "va"],
    )
    # b leads a by 3 days: a[t] == b[t-3] -> peak at lag +3
    b = spark.createDataFrame(
        [(t0 + dt.timedelta(days=i - 3), v) for i, v in enumerate(vals)],
        ["bucket", "vb"],
    )
    out = {r["lag"]: r["corr"] for r in xcorr_lags(
        a, b, a_col="va", b_col="vb", max_lag=4
    ).collect()}
    assert out[3] == 1.0
    assert all(v is None or v < 1.0 for lag, v in out.items() if lag != 3)


def test_xcorr_lags_zero_lag_self_correlation(spark):
    import datetime as dt

    from harmonize_search_analyze_spark.operators.analytics import (
        xcorr_lags,
    )

    t0 = dt.datetime(2025, 1, 1)
    s = spark.createDataFrame(
        [(t0 + dt.timedelta(days=i), float((i * 7) % 5)) for i in range(20)],
        ["bucket", "v"],
    )
    out = {r["lag"]: (r["n"], r["corr"]) for r in xcorr_lags(
        s, s, a_col="v", b_col="v", max_lag=2
    ).collect()}
    assert out[0] == (20, 1.0)
    assert out[1][0] == 19  # one bucket falls off per lag step


def test_cohens_kappa_hand_values(spark):
    from harmonize_search_analyze_spark.operators.analytics import (
        cohens_kappa,
    )

    # classic 2x2 example: po = 0.7, marginals a: y=.5/n=.5, b: y=.6/n=.4
    rows = ([("y", "y")] * 20 + [("y", "n")] * 5
            + [("n", "y")] * 10 + [("n", "n")] * 15)
    df = spark.createDataFrame(rows, ["a", "b"])
    r = cohens_kappa(df, "a", "b").collect()[0]
    po = 35 / 50
    pe = 0.5 * 0.6 + 0.5 * 0.4
    assert (r["n"], r["p_o"], r["p_e"]) == (50, po, pe)
    assert r["kappa"] == round((po - pe) / (1 - pe), 6)


def test_cohens_kappa_degenerate_and_nulls(spark):
    from harmonize_search_analyze_spark.operators.analytics import (
        cohens_kappa,
    )

    # both raters constant and equal: p_e = 1 -> pinned kappa = 1.0
    const = spark.createDataFrame([("y", "y")] * 5, ["a", "b"])
    assert cohens_kappa(const, "a", "b").collect()[0]["kappa"] == 1.0
    # NULL ratings drop from n
    with_null = spark.createDataFrame(
        [("y", "y"), ("y", None), (None, "n"), ("n", "n")],
        "a string, b string",
    )
    r = cohens_kappa(with_null, "a", "b").collect()[0]
    assert r["n"] == 2 and r["kappa"] == 1.0


def test_prop_ztest_hand_values(spark):
    import math

    from harmonize_search_analyze_spark.operators.analytics import (
        prop_ztest,
    )
    from pyspark.sql import functions as F

    # group a: 30/100 convert; group b: 20/100
    rows = ([("a", 1)] * 30 + [("a", 0)] * 70
            + [("b", 1)] * 20 + [("b", 0)] * 80)
    df = spark.createDataFrame(rows, ["g", "ok"])
    r = prop_ztest(
        df, F.col("ok") == 1, F.col("g") == "a", F.col("g") == "b"
    ).collect()[0]
    assert (r["n_a"], r["x_a"], r["n_b"], r["x_b"]) == (100, 30, 100, 20)
    pp = 50 / 200
    se = math.sqrt(pp * (1 - pp) * (1 / 100 + 1 / 100))
    z = (0.3 - 0.2) / se
    assert r["z"] == round(z, 6)
    # two-sided p via the exact CDF; the A&S poly is within 1.5e-7
    want_p = 2 * (1 - 0.5 * (1 + math.erf(abs(z) / math.sqrt(2)))) / 1
    # our formula reports erfc(|z|/sqrt 2) = exactly that two-sided p
    assert abs(r["p_value"] - want_p) < 1e-5


def test_prop_ztest_zero_variance_null(spark):
    from harmonize_search_analyze_spark.operators.analytics import (
        prop_ztest,
    )
    from pyspark.sql import functions as F

    # everyone converts: pooled p = 1 -> se = 0 -> NULL z and p
    rows = [("a", 1)] * 5 + [("b", 1)] * 5
    df = spark.createDataFrame(rows, ["g", "ok"])
    r = prop_ztest(
        df, F.col("ok") == 1, F.col("g") == "a", F.col("g") == "b"
    ).collect()[0]
    assert r["z"] is None and r["p_value"] is None


def test_mutual_info_hand_values(spark):
    import math

    from harmonize_search_analyze_spark.operators.analytics import (
        mutual_info,
    )

    # perfectly dependent: b == a -> I = H(a), NMI = 1
    rows = [("x", "x")] * 3 + [("y", "y")] * 5 + [("z", "z")] * 2
    df = spark.createDataFrame(rows, ["a", "b"])
    r = mutual_info(df, "a", "b").collect()[0]
    h = -sum(p * math.log2(p) for p in (0.3, 0.5, 0.2))
    assert abs(r["mi_bits"] - h) < 1e-6
    assert r["h_a"] == r["h_b"] == round(h, 6)
    assert abs(r["nmi"] - 1.0) < 1e-6


def test_mutual_info_independent_and_constant(spark):
    from harmonize_search_analyze_spark.operators.analytics import (
        mutual_info,
    )

    # exactly independent 2x2 (uniform product distribution) -> MI = 0
    rows = [(a, b) for a in "xy" for b in "pq" for _ in range(5)]
    df = spark.createDataFrame(rows, ["a", "b"])
    r = mutual_info(df, "a", "b").collect()[0]
    assert r["mi_bits"] == 0.0 and r["nmi"] == 0.0
    # constant column: zero entropy -> NMI pinned 0, not 0/0
    const = spark.createDataFrame(
        [("k", v) for v in "pqpq"], ["a", "b"]
    )
    rc = mutual_info(const, "a", "b").collect()[0]
    assert rc["h_a"] == 0.0 and rc["nmi"] == 0.0 and rc["mi_bits"] == 0.0
