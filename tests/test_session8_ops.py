"""Round-6 operator tests: cusum_change (prefix-sum identity vs the
imperative recursion, adversarially sampled), benford_test (spine
completeness, conforming vs fabricated data), jsd_divergence (identity /
disjoint / empty-side pins), distinct_ngrams (hand-computed), and
leakage_check (split algebra vs assign_split)."""

from __future__ import annotations

import math

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=12, deadline=None,
    suppress_health_check=list(HealthCheck),
)


def _cusum_ref(values, k):
    """Imperative textbook CUSUM the window identity must reproduce."""
    mu = sum(values) / len(values)
    var = sum((v - mu) ** 2 for v in values) / len(values)
    sigma = math.sqrt(var)
    zs = [(v - mu) / sigma if sigma > 0 else 0.0 for v in values]
    cp = cn = 0.0
    out = []
    for z in zs:
        cp = max(0.0, cp + z - 0.5)
        cn = max(0.0, cn - z - 0.5)
        out.append((z, cp, cn))
    return out


@settings(**_SETTINGS)
@given(st.lists(st.integers(0, 50), min_size=2, max_size=24))
@pytest.mark.slow
def test_cusum_identity_matches_recursion(spark, values):
    from harmonize_search_analyze_spark.operators.analytics import (
        cusum_change,
    )

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(values)], "bucket int, v double"
    )
    got = cusum_change(df, "bucket", "v", k=0.5, h=5.0).collect()
    ref = _cusum_ref([float(v) for v in values], 0.5)
    assert len(got) == len(ref)
    for row, (z, cp, cn) in zip(got, ref):
        assert abs(row.z - round(z, 6)) < 1e-9
        assert abs(row.cusum_pos - round(cp, 6)) < 5e-6
        assert abs(row.cusum_neg - round(cn, 6)) < 5e-6
        assert row.alarm == (cp > 5.0 or cn > 5.0)


def test_cusum_constant_series_never_alarms(spark):
    from harmonize_search_analyze_spark.operators.analytics import (
        cusum_change,
    )

    df = spark.createDataFrame(
        [(i, 7.0) for i in range(20)], "bucket int, v double"
    )
    rows = cusum_change(df, "bucket", "v").collect()
    assert all(r.z == 0.0 and not r.alarm for r in rows)


def test_cusum_detects_step_shift(spark):
    from harmonize_search_analyze_spark.operators.analytics import (
        cusum_change,
    )

    # long quiet baseline (|z| < k, so both sides stay pinned at 0),
    # then a short sustained spike — the sequential-detection shape
    vals = [9.5 if i % 2 else 10.5 for i in range(50)] + [30.0] * 8
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "bucket int, v double"
    )
    rows = cusum_change(df, "bucket", "v", k=0.5, h=5.0).collect()
    assert not any(r.alarm for r in rows[:50])
    assert any(r.alarm for r in rows[50:])
    # alarms persist once the excursion is sustained
    first = next(i for i, r in enumerate(rows) if r.alarm)
    assert all(r.alarm for r in rows[first:])


def test_benford_spine_and_conformance(spark):
    from harmonize_search_analyze_spark.operators.analytics import (
        benford_test,
    )

    # log-uniform sample conforms to Benford; include negatives/zeros/
    # NULLs to exercise the filters
    vals = [
        (10 ** (i * 0.001)) * (1 if i % 2 else -1) for i in range(3000)
    ] + [0.0, None]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    rows = benford_test(df, "x").collect()
    assert [r.digit for r in rows] == list(range(1, 10))
    assert abs(sum(r.expected for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
    assert len({r.chi2 for r in rows}) == 1
    assert not rows[0].reject

    # constant-leading-digit data is maximally non-Benford
    df2 = spark.createDataFrame(
        [(float(500 + i),) for i in range(300)], "x double"
    )
    rows2 = benford_test(df2, "x").collect()
    assert rows2[0].reject
    # absent digits still present with n = 0
    assert [r.n for r in rows2 if r.digit == 1] == [0]


def test_jsd_pins(spark):
    from harmonize_search_analyze_spark.operators.text import jsd_divergence

    # identical distributions -> JSD exactly 0
    same = spark.createDataFrame(
        [(0, "alpha beta"), (1, "alpha beta")], "doc_id long, text string"
    )
    r = jsd_divergence(same, "text", "doc_id % 2 = 0").collect()[0]
    assert r.jsd_bits == 0.0 and r.jsd_distance == 0.0
    assert r.tokens_a == 2 and r.tokens_b == 2 and r.vocab == 2

    # disjoint vocabularies -> JSD exactly 1 bit
    disjoint = spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma delta")], "doc_id long, text string"
    )
    r = jsd_divergence(disjoint, "text", "doc_id % 2 = 0").collect()[0]
    assert r.jsd_bits == 1.0 and r.jsd_distance == 1.0

    # one empty side -> NULL divergence, never 0
    onesided = spark.createDataFrame(
        [(0, "alpha beta"), (2, "gamma")], "doc_id long, text string"
    )
    r = jsd_divergence(onesided, "text", "doc_id % 2 = 0").collect()[0]
    assert r.jsd_bits is None and r.jsd_distance is None
    assert r.tokens_b == 0


def test_distinct_ngrams_hand_computed(spark):
    from harmonize_search_analyze_spark.operators.text import distinct_ngrams

    docs = spark.createDataFrame(
        [
            ("rep", "a b a b a b"),   # bigrams: ab,ba,ab,ba,ab -> 2/5
            ("uniq", "p q r s"),      # pq,qr,rs -> 3/3
            ("short", "solo"),        # no bigrams -> absent
        ],
        "source string, text string",
    )
    rows = {r.source: r for r in distinct_ngrams(docs, "text", "source").collect()}
    assert set(rows) == {"rep", "uniq"}
    assert rows["rep"].total_ngrams == 5
    assert rows["rep"].distinct_ngrams == 2
    assert rows["rep"].distinct_ratio == 0.4
    assert rows["uniq"].distinct_ratio == 1.0


def test_leakage_check_split_algebra(spark):
    from harmonize_search_analyze_spark.operators.dedup import leakage_check
    from harmonize_search_analyze_spark.operators.ordering import assign_split

    # 30 docs in 15 near-identical pairs (i, i+100 share text)
    rows = [(i, f"tok{i} common text body shared") for i in range(15)]
    rows += [(i + 100, f"tok{i} common text body shared") for i in range(15)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fr = {"train": 0.5, "test": 0.5}
    out = leakage_check(
        docs, "doc_id", "text", fr, threshold=0.8, k=8, n=1,
        rows_per_band=2,
    ).collect()
    assert out, "expected near-dup pairs"
    total = sum(r.n_pairs for r in out)
    crossed = sum(r.n_pairs for r in out if r.is_cross)
    for r in out:
        assert r.split_a <= r.split_b
        assert r.is_cross == (r.split_a != r.split_b)
        assert r.cross_share == round(crossed / total, 6)

    # the labels must agree with assign_split's partitioning exactly
    splits = {
        r.doc_id: r.split
        for r in assign_split(docs, "doc_id", fr).collect()
    }
    from harmonize_search_analyze_spark.operators.dedup import (
        near_dup_pairs_lsh,
    )

    pairs = near_dup_pairs_lsh(
        docs, "doc_id", "text", threshold=0.8, k=8, n=1, rows_per_band=2
    ).collect()
    want = {}
    for p in pairs:
        key = tuple(sorted((splits[p.id1], splits[p.id2])))
        want[key] = want.get(key, 0) + 1
    got = {(r.split_a, r.split_b): r.n_pairs for r in out}
    assert got == want


def _mw_ref(a, b):
    """Plain-Python Mann-Whitney (midranks, tie-corrected sigma, no
    continuity correction)."""
    pooled = sorted([(v, 0) for v in a] + [(v, 1) for v in b])
    n = len(pooled)
    ra = 0.0
    ties_sum = 0.0
    i = 0
    while i < n:
        j = i
        while j < n and pooled[j][0] == pooled[i][0]:
            j += 1
        t = j - i
        midrank = (i + 1 + j) / 2.0
        ra += midrank * sum(1 for k in range(i, j) if pooled[k][1] == 0)
        ties_sum += t ** 3 - t
        i = j
    na, nb = len(a), len(b)
    ua = ra - na * (na + 1) / 2.0
    var = na * nb / 12.0 * ((n + 1) - ties_sum / (n * (n - 1))) if n > 1 else 0.0
    z = (ua - na * nb / 2.0) / math.sqrt(var) if var > 0 else None
    return ua, z


@settings(**_SETTINGS)
@given(
    st.lists(st.integers(0, 8), min_size=2, max_size=15),
    st.lists(st.integers(0, 8), min_size=2, max_size=15),
)
@pytest.mark.slow  # >10s sweep: slow tier (driver pytest budget, r11)
def test_mann_whitney_matches_reference(spark, a, b):
    from harmonize_search_analyze_spark.operators.analytics import (
        mann_whitney,
    )

    rows = [(float(v), "a") for v in a] + [(float(v), "b") for v in b]
    df = spark.createDataFrame(rows, "v double, side string")
    got = mann_whitney(
        df, "v", F.col("side") == "a", F.col("side") == "b"
    ).collect()[0]
    ua, z = _mw_ref(a, b)
    assert got.n_a == len(a) and got.n_b == len(b)
    assert abs(got.u_a - ua) < 1e-6
    assert abs(got.u_a + got.u_b - len(a) * len(b)) < 1e-6
    if z is None:
        assert got.z is None and got.p_value is None
    else:
        assert abs(got.z - z) < 5e-6


def test_calibration_pins(spark):
    from harmonize_search_analyze_spark.operators.analytics import (
        calibration,
    )

    # perfectly calibrated: in each bin the observed rate equals the
    # (constant) predicted probability -> ece 0
    rows = []
    for p, n in ((0.25, 4), (0.75, 4)):
        pos = int(p * n)
        rows += [(p, 1.0)] * pos + [(p, 0.0)] * (n - pos)
    df = spark.createDataFrame(rows, "p double, y double")
    out = calibration(df, "p", "y", bins=10).collect()
    assert [r.bin for r in out] == [2, 7]
    assert all(r.gap == 0.0 and r.ece == 0.0 for r in out)
    brier = sum((p - y) ** 2 for p, y in rows) / len(rows)
    assert abs(out[0].brier - brier) < 1e-6

    # p = 1.0 clamps into the top bin; out-of-range and NULL rows drop
    df2 = spark.createDataFrame(
        [(1.0, 1.0), (1.0, 0.0), (1.5, 1.0), (None, 1.0)],
        "p double, y double",
    )
    out2 = calibration(df2, "p", "y", bins=10).collect()
    assert len(out2) == 1 and out2[0].bin == 9 and out2[0].n == 2
    assert out2[0].acc == 0.5 and out2[0].gap == -0.5


def test_burstiness_pins(spark):
    from harmonize_search_analyze_spark.operators.analytics import (
        burstiness,
    )
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    # periodic user: constant 60s gaps -> sigma 0 -> B = -1
    for i in range(10):
        rows.append((i, base + dt.timedelta(seconds=60 * i), 1, "periodic"))
    # bursty user: 9 tiny gaps + one huge -> B near +1 side (> 0)
    ts = base
    for i, g in enumerate([1] * 9 + [10000]):
        ts = ts + dt.timedelta(seconds=g)
        rows.append((100 + i, ts, 2, "bursty"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {r.event_type: r for r in burstiness(df).collect()}
    assert out["periodic"].burstiness == -1.0
    assert out["periodic"].n_gaps == 9
    # 9 tiny + 1 huge gap: B = (sigma - mu)/(sigma + mu) = 0.477245
    assert out["bursty"].burstiness == 0.477245


def test_quantile_norm_pins(spark):
    from harmonize_search_analyze_spark.operators.sampling import (
        quantile_norm,
    )

    # two sources with disjoint ranges: after normalization the same
    # within-source rank maps to the same global value
    rows = [(i, float(i), "lo") for i in range(10)]
    rows += [(100 + i, float(1000 + i), "hi") for i in range(10)]
    df = spark.createDataFrame(rows, "id long, v double, src string")
    out = quantile_norm(df, "id", "v", "src", grid=10).collect()
    by_id = {r.id: r for r in out}
    # min of each source -> pct_rank 0 -> global min; max -> global max
    assert by_id[0].pct_rank == 0.0 and by_id[0].normalized == 0.0
    assert by_id[100].pct_rank == 0.0 and by_id[100].normalized == 0.0
    assert by_id[9].pct_rank == 1.0 and by_id[9].normalized == 1009.0
    assert by_id[109].pct_rank == 1.0 and by_id[109].normalized == 1009.0
    # same rank -> same normalized value across sources
    for i in range(10):
        assert by_id[i].normalized == by_id[100 + i].normalized


def test_source_jsd_matrix_pins(spark):
    from harmonize_search_analyze_spark.operators.text import (
        jsd_divergence,
        source_jsd_matrix,
    )

    docs = spark.createDataFrame(
        [
            (0, "alpha beta", "s1"),
            (1, "alpha beta", "s2"),     # s2 == s1 -> JSD 0
            (2, "gamma delta", "s3"),    # disjoint from both -> JSD 1
        ],
        "doc_id long, text string, source string",
    )
    out = {(r.source_a, r.source_b): r
           for r in source_jsd_matrix(docs, "text", "source").collect()}
    assert set(out) == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}
    assert out[("s1", "s2")].jsd_bits == 0.0
    assert out[("s1", "s3")].jsd_bits == 1.0
    assert out[("s2", "s3")].jsd_bits == 1.0

    # the matrix entry equals the two-slice operator on the same split
    two = docs.where(F.col("source") != "s2")
    r = jsd_divergence(two, "text", "source = 's1'").collect()[0]
    assert r.jsd_bits == out[("s1", "s3")].jsd_bits


def test_trimmed_stats_hand_computed(spark):
    from harmonize_search_analyze_spark.operators.analytics import (
        trimmed_stats,
    )

    # 1..10 with lower=0.1, upper=0.9: bounds are the exact percentiles
    # (1.9, 9.1); trimming drops 1 and 10
    df = spark.createDataFrame(
        [(float(i),) for i in range(1, 11)], "v double"
    )
    r = trimmed_stats(df, "v", lower=0.1, upper=0.9).collect()[0]
    assert r.n == 10 and r.n_trimmed == 2
    assert r.lo == 1.9 and r.hi == 9.1
    assert r.trimmed_mean == 5.5            # mean of 2..9
    # winsorized: 1 -> 1.9, 10 -> 9.1
    assert r.winsorized_mean == round((1.9 + sum(range(2, 10)) + 9.1) / 10, 6)


def test_acf_pins(spark):
    from harmonize_search_analyze_spark.operators.analytics import (
        acf_series,
    )

    # period-2 alternating series: acf(1) ~ -1, acf(2) ~ +1 (finite-n
    # estimator shrinks toward 0 by (n-lag)/n with the global-ss
    # denominator)
    vals = [10.0, 20.0] * 10
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "bucket int, v double"
    )
    rows = {r.lag: r for r in
            acf_series(df, "bucket", "v", max_lag=2).collect()}
    n = len(vals)
    assert rows[1].n == n - 1 and rows[2].n == n - 2
    assert rows[1].acf < -0.9 and rows[2].acf > 0.85
    # constant series pins NULL
    const = spark.createDataFrame(
        [(i, 5.0) for i in range(10)], "bucket int, v double"
    )
    assert all(r.acf is None for r in
               acf_series(const, "bucket", "v", max_lag=2).collect())


@pytest.mark.slow
def test_cusum_stream_matches_batch_and_replays(spark, tmp_path):
    """After all micro-batches the latest epoch snapshot equals the
    batch cusum_change over the full series; replaying an epoch rewrites
    identical state (idempotent recovery)."""
    import datetime as dt

    from harmonize_search_analyze_spark.operators.analytics import (
        cusum_change,
    )
    from harmonize_search_analyze_spark.streaming.windows import (
        cusum_process_batch,
        cusum_stream,
    )

    base = dt.datetime(2024, 3, 1)
    wave1 = [(i, base + dt.timedelta(days=i % 5, hours=i % 7))
             for i in range(60)]
    wave2 = [(100 + i, base + dt.timedelta(days=5 + i % 3, hours=i % 5))
             for i in range(90)]
    schema = "event_id long, ts timestamp"
    src = tmp_path / "events"
    spark.createDataFrame(wave1, schema).coalesce(1).write.mode(
        "overwrite").parquet(str(src))
    spark.createDataFrame(wave2, schema).coalesce(1).write.mode(
        "append").parquet(str(src))

    stream = (
        spark.readStream.schema("event_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = cusum_stream(
        stream, str(tmp_path / "state"), str(tmp_path / "mon"),
        str(tmp_path / "ckpt"), ts_col="ts",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    mon = spark.read.parquet(str(tmp_path / "mon"))
    last = mon.where(
        F.col("epoch") == mon.agg(F.max("epoch")).collect()[0][0]
    ).drop("epoch")

    batch = spark.createDataFrame(wave1 + wave2, schema)
    daily = batch.groupBy(
        F.date_trunc("day", "ts").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("doc_count"))
    want = cusum_change(daily, "bucket", "doc_count").collect()
    got = sorted(map(tuple, last.collect()))
    assert got == sorted(map(tuple, want))

    # replay the last epoch: state and monitor rewrite identically
    before = sorted(map(tuple, spark.read.parquet(
        str(tmp_path / "state")).collect()))
    replay = spark.createDataFrame(wave2, schema)
    cusum_process_batch(
        replay, 1, str(tmp_path / "state"), str(tmp_path / "mon"),
        ts_col="ts",
    )
    after = sorted(map(tuple, spark.read.parquet(
        str(tmp_path / "state")).collect()))
    assert before == after
    last2 = spark.read.parquet(str(tmp_path / "mon"))
    last2 = last2.where(F.col("epoch") == 1).drop("epoch")
    assert sorted(map(tuple, last2.collect())) == got


def test_embedding_drift_pins(spark):
    from harmonize_search_analyze_spark.operators.similarity import (
        embedding_drift,
    )

    a = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0])], "id long, embedding array<float>"
    )
    # identical slices -> cosine 1, l2 0, shift 0
    r = embedding_drift(a, a).collect()[0]
    assert (r.cos_means, r.l2_means, r.max_dim_shift) == (1.0, 0.0, 0.0)
    assert r.n_a == 2 and r.n_b == 2 and r.d == 2

    # orthogonal means -> cosine 0; shifts hand-computed
    b = spark.createDataFrame(
        [(0, [0.0, 2.0])], "id long, embedding array<float>"
    )
    r = embedding_drift(a, b).collect()[0]
    assert r.cos_means == 0.0
    assert r.l2_means == round(math.sqrt(1 + 4), 6)
    assert r.max_dim_shift == 2.0

    # zero mean vector -> NULL cosine, never 0
    z = spark.createDataFrame(
        [(0, [0.0, 0.0])], "id long, embedding array<float>"
    )
    r = embedding_drift(a, z).collect()[0]
    assert r.cos_means is None and r.l2_means == 1.0


def test_heaps_law_pins(spark):
    from harmonize_search_analyze_spark.operators.text import heaps_law

    # every doc repeats the same token: vocab is flat at 1 -> beta ~ 0
    flat = spark.createDataFrame(
        [(i, "same same same") for i in range(40)],
        "doc_id long, text string",
    )
    r = heaps_law(flat, "text", "doc_id", buckets=4).collect()[0]
    assert r.vocab == 1 and r.n_tokens == 120
    assert r.beta == 0.0 and r.k == 1.0

    # every doc introduces fresh tokens: V grows ~ linearly -> beta ~ 1
    fresh = spark.createDataFrame(
        [(i, f"tok{i}a tok{i}b tok{i}c") for i in range(40)],
        "doc_id long, text string",
    )
    r = heaps_law(fresh, "text", "doc_id", buckets=4).collect()[0]
    assert r.vocab == 120 and r.n_tokens == 120
    assert abs(r.beta - 1.0) < 1e-6 and r.r2 == 1.0


def test_entropy_rate_pins(spark):
    from harmonize_search_analyze_spark.operators.text import entropy_rate

    # uniform unigram alternation "a b a b ...": H(uni)=1 bit; bigrams
    # 'a b' and 'b a' near-equally likely -> H(bi) ~ 1 -> rate ~ 0
    # (fully predictable successor)
    df = spark.createDataFrame(
        [(0, "a b " * 50)], "doc_id long, text string"
    )
    r = entropy_rate(df, "text").collect()[0]
    assert r.n_tokens == 100 and r.n_bigrams == 99
    assert abs(r.h_unigram - 1.0) < 1e-6
    assert r.h_rate < 0.01

    # all docs too short for bigrams -> NULL h_bigram/h_rate
    short = spark.createDataFrame(
        [(0, "one"), (1, "two")], "doc_id long, text string"
    )
    r = entropy_rate(short, "text").collect()[0]
    assert r.n_bigrams == 0
    assert r.h_bigram is None and r.h_rate is None


def test_confusion_eval_hand_computed(spark):
    from harmonize_search_analyze_spark.operators.analytics import (
        confusion_eval,
    )

    # truth: a a a b b c ; pred: a a b b b d ; NULLs drop
    rows = [("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"), ("b", "b"),
            ("c", "d"), (None, "a"), ("a", None)]
    df = spark.createDataFrame(rows, "t string, p string")
    out = {r["class"]: r for r in confusion_eval(df, "t", "p").collect()}
    assert set(out) == {"a", "b", "c", "d"}
    a = out["a"]
    assert (a.tp, a.fp, a.fn) == (2, 0, 1)
    assert a.precision == 1.0 and a.recall == round(2 / 3, 6)
    b = out["b"]
    assert (b.tp, b.fp, b.fn) == (2, 1, 0)
    assert b.precision == round(2 / 3, 6) and b.recall == 1.0
    c = out["c"]
    assert c.recall == 0.0 and c.precision is None and c.f1 is None
    d = out["d"]
    assert d.precision == 0.0 and d.recall is None
    # accuracy = 4/6 on every row; macro over defined f1s only
    assert all(r.accuracy == round(4 / 6, 6) for r in out.values())
    f1a = 2 * 1.0 * (2 / 3) / (1.0 + 2 / 3)
    f1b = 2 * (2 / 3) * 1.0 / (2 / 3 + 1.0)
    assert abs(a.macro_f1 - round((f1a + f1b) / 2, 6)) < 1e-6


def test_roc_auc_pins(spark):
    from harmonize_search_analyze_spark.operators.analytics import roc_auc

    # perfectly separating score -> AUC 1
    perfect = spark.createDataFrame(
        [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)], "s double, y int"
    )
    r = roc_auc(perfect, "s", "y").collect()[0]
    assert r.auc == 1.0 and r.gini == 1.0

    # anti-separating -> AUC 0
    r = roc_auc(perfect, "1.0 - s", "y").collect()[0]
    assert r.auc == 0.0 and r.gini == -1.0

    # all scores tied -> midranks make AUC exactly 0.5
    tied = spark.createDataFrame(
        [(0.5, 1), (0.5, 1), (0.5, 0), (0.5, 0)], "s double, y int"
    )
    r = roc_auc(tied, "s", "y").collect()[0]
    assert r.auc == 0.5 and r.gini == 0.0

    # single class -> NULL
    ones = spark.createDataFrame([(0.5, 1), (0.7, 1)], "s double, y int")
    r = roc_auc(ones, "s", "y").collect()[0]
    assert r.auc is None and r.gini is None


def test_anova_f_hand_computed(spark):
    from harmonize_search_analyze_spark.operators.analytics import anova_f

    # groups (means 2, 5): SSB = 2*(2-3.5)^2 + 2*(5-3.5)^2 = 9
    # SSW = (1-2)^2+(3-2)^2 + (4-5)^2+(6-5)^2 = 4
    # F = (9/1) / (4/2) = 4.5
    df = spark.createDataFrame(
        [(1.0, "a"), (3.0, "a"), (4.0, "b"), (6.0, "b")],
        "v double, g string",
    )
    r = anova_f(df, "v", "g").collect()[0]
    assert (r.n, r.k, r.df1, r.df2) == (4, 2, 1, 2)
    assert r.ss_between == 9.0 and r.ss_within == 4.0
    assert r.f == 4.5

    # zero within-variance -> NULL F (try_divide)
    const = spark.createDataFrame(
        [(1.0, "a"), (1.0, "a"), (2.0, "b"), (2.0, "b")],
        "v double, g string",
    )
    assert anova_f(const, "v", "g").collect()[0].f is None


def test_spearman_pins(spark):
    from harmonize_search_analyze_spark.operators.analytics import (
        spearman_corr,
    )

    # perfect monotonic (nonlinear) -> rho exactly 1
    mono = spark.createDataFrame(
        [(float(i), float(i ** 3)) for i in range(1, 9)], "x double, y double"
    )
    r = spearman_corr(mono, "x", "y").collect()[0]
    assert r.n == 8 and r.rho == 1.0

    # perfect anti-monotonic -> -1
    anti = spark.createDataFrame(
        [(float(i), float(-(i ** 3))) for i in range(1, 9)],
        "x double, y double",
    )
    assert spearman_corr(anti, "x", "y").collect()[0].rho == -1.0

    # with ties, hand-computed: x = [1,1,2,3] -> midranks
    # [1.5,1.5,3,4]; y = [2,3,3,5] -> [1,2.5,2.5,4];
    # pearson(rx, ry) = cov/sqrt(varx*vary) = 3.75/4.5 = 0.833333
    tied = spark.createDataFrame(
        [(1.0, 2.0), (1.0, 3.0), (2.0, 3.0), (3.0, 5.0)],
        "x double, y double",
    )
    assert spearman_corr(tied, "x", "y").collect()[0].rho == 0.833333

    # constant column -> NULL
    const = spark.createDataFrame(
        [(1.0, 2.0), (1.0, 3.0)], "x double, y double"
    )
    assert spearman_corr(const, "x", "y").collect()[0].rho is None


def test_cross_source_dups_pins(spark):
    from harmonize_search_analyze_spark.operators.dedup import (
        cross_source_dups,
    )

    docs = spark.createDataFrame(
        [
            (0, "mirrored text", "s1"),
            (1, "mirrored text", "s2"),
            (2, "mirrored text", "s2"),   # 3 docs over 2 sources -> in
            (3, "same-source dup", "s1"),
            (4, "same-source dup", "s1"),  # 2 docs, 1 source -> OUT
            (5, "unique", "s3"),           # singleton -> OUT
        ],
        "doc_id long, text string, source string",
    )
    rows = cross_source_dups(docs, "text", "source").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_docs == 3 and r.n_sources == 2
    assert r.sources == "s1,s2"


def test_template_prefixes_pins(spark):
    from harmonize_search_analyze_spark.operators.text import (
        template_prefixes,
    )

    docs = spark.createDataFrame(
        [(i, "As an AI template intro, doc %d" % i) for i in range(6)]
        + [(100, "short"), (101, "organic text one"), (102, "organic two")],
        "doc_id long, text string",
    )
    rows = template_prefixes(docs, "text", prefix_len=16, k=3).collect()
    assert rows[0].prefix == "As an AI templat"
    assert rows[0].n == 6 and rows[0].share == round(6 / 9, 6)
    # docs shorter than prefix_len count with full text
    assert any(r.prefix == "short" for r in rows) or len(rows) == 3


def test_source_overlap_matrix_pins(spark):
    from harmonize_search_analyze_spark.operators.aggregations import (
        kmv_overlap,
        source_overlap_matrix,
    )

    # s1 and s2 share half their docs; s3 disjoint
    rows = [(i, f"doc {i}", "s1") for i in range(20)]
    rows += [(100 + i, f"doc {i}", "s2") for i in range(10)]       # shared
    rows += [(200 + i, f"only-s2 {i}", "s2") for i in range(10)]
    rows += [(300 + i, f"only-s3 {i}", "s3") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {(r.source_a, r.source_b): r for r in
           source_overlap_matrix(df, "text", "source", k=64).collect()}
    assert set(out) == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}
    # sub-k sketches are EXACT: |s1 ∪ s2| = 30, |s1 ∩ s2| = 10
    r = out[("s1", "s2")]
    assert r.sketch_union == 30 and r.est_union == 30.0
    assert r.jaccard == round(10 / 30, 6)
    assert r.est_intersection == 10.0
    assert out[("s1", "s3")].jaccard == 0.0
    assert out[("s2", "s3")].est_intersection == 0.0

    # pairwise entry == the dedicated two-corpus kmv_overlap
    two = kmv_overlap(
        df.where(F.col("source") == "s1"),
        df.where(F.col("source") == "s2"),
        "text", k=64,
    ).collect()[0]
    assert two.jaccard == r.jaccard
    assert two.est_intersection == r.est_intersection


def _stationary_ref(pairs, iters):
    """Plain-Python power iteration the operator must reproduce."""
    states = sorted({s for p in pairs for s in p[:2]})
    outs = {}
    for f, t, c in pairs:
        outs[f] = outs.get(f, 0) + c
    P = {}
    for f, t, c in pairs:
        P.setdefault(f, {})[t] = c / outs[f]
    for s in states:
        if s not in P:
            P[s] = {s: 1.0}
    v = {s: 1.0 / len(states) for s in states}
    for _ in range(iters):
        nv = {s: 0.0 for s in states}
        for s, row in P.items():
            for t, p in row.items():
                nv[t] += v[s] * p
        v = nv
    return v


def test_markov_stationary_matches_reference(spark):
    import datetime as dt

    from harmonize_search_analyze_spark.operators.analytics import (
        markov_stationary,
    )

    base = dt.datetime(2024, 5, 1)
    # user journeys: a->b->a->c, b->c, c absorbs (sink: self-loop)
    events = []
    eid = 0
    for uid, seq in ((1, "abac"), (2, "bc"), (3, "abc"), (4, "aab")):
        for i, s in enumerate(seq):
            events.append((eid, uid, base + dt.timedelta(minutes=i), s))
            eid += 1
    df = spark.createDataFrame(
        events, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {r.state: r for r in markov_stationary(
        df, "user_id", "ts", "event_type", iters=12
    ).collect()}
    pairs = {}
    for uid, seq in ((1, "abac"), (2, "bc"), (3, "abc"), (4, "aab")):
        for f, t in zip(seq, seq[1:]):
            pairs[(f, t)] = pairs.get((f, t), 0) + 1
    ref = _stationary_ref([(f, t, c) for (f, t), c in pairs.items()], 12)
    assert set(got) == set(ref)
    for s, v in ref.items():
        assert abs(got[s].stationary - round(v, 6)) < 2e-6
    # mass is conserved by the self-loop patch
    assert abs(sum(r.stationary for r in got.values()) - 1.0) < 1e-5
    # 'c' is absorbing -> the stationary mass concentrates there
    assert got["c"].stationary == max(r.stationary for r in got.values())
    assert got["c"].out_transitions == 0


def test_blocklist_scan_hand_computed(spark):
    from harmonize_search_analyze_spark.operators.analytics import (
        blocklist_scan,
    )

    docs = spark.createDataFrame(
        [
            (0, "clean text here", "s1"),
            (1, "an ERROR occurred", "s1"),      # case-folded hit
            (2, "error error again", "s2"),      # 2 hits, 1 doc
            (3, "errors are fine", "s2"),        # token-exact: no hit
        ],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in blocklist_scan(
        docs, "text", "source", ["error", "lorem"]
    ).collect()}
    assert out["s1"].hit_docs == 1 and out["s1"].total_hits == 1
    assert out["s1"].hit_share == 0.5
    assert out["s2"].hit_docs == 1 and out["s2"].total_hits == 2


def test_group_entropy_pins(spark):
    from harmonize_search_analyze_spark.operators.analytics import (
        group_entropy,
    )

    docs = spark.createDataFrame(
        [
            ("s1", "en"), ("s1", "en"),                      # mono -> 0
            ("s2", "en"), ("s2", "de"),                      # uniform 2 -> 1 bit
            ("s3", "en"), ("s3", "en"), ("s3", "en"), ("s3", "de"),
        ],
        "source string, lang string",
    )
    out = {r.source: r for r in
           group_entropy(docs, "source", "lang").collect()}
    assert out["s1"].entropy_bits == 0.0
    assert out["s1"].norm_entropy == 0.0 and out["s1"].top_share == 1.0
    assert out["s2"].entropy_bits == 1.0 and out["s2"].norm_entropy == 1.0
    # H(3/4, 1/4) = 0.811278 bits
    assert out["s3"].entropy_bits == 0.811278
    assert out["s3"].top_share == 0.75


def test_dup_factor_pins(spark):
    from harmonize_search_analyze_spark.operators.analytics import (
        dup_factor,
    )

    docs = spark.createDataFrame(
        [
            (0, "a", "s1"), (1, "a", "s1"), (2, "a", "s1"), (3, "b", "s1"),
            (4, "x", "s2"), (5, "y", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r.source: r for r in dup_factor(docs, "text", "source").collect()}
    s1 = out["s1"]
    assert (s1.n_docs, s1.n_distinct) == (4, 2)
    assert s1.dup_factor == 2.0 and s1.dup_share == 0.75
    s2 = out["s2"]
    assert s2.dup_factor == 1.0 and s2.dup_share == 0.0
