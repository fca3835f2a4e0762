"""Round-6 operator tests: cusum_change (prefix-sum identity vs the
imperative recursion, adversarially sampled), benford_test (spine
completeness, conforming vs fabricated data), jsd_divergence (identity /
disjoint / empty-side pins), distinct_ngrams (hand-computed), and
leakage_check (split algebra vs assign_split)."""

from __future__ import annotations

import math

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
