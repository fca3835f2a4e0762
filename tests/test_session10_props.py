"""Hypothesis property tests for the session-10 operators: invariants
that must hold for ANY input shape — the hand-computed cases pin exact
values, these pin the laws."""

from __future__ import annotations

import pytest

import math

from hypothesis import given, settings, strategies as st


@settings(max_examples=8, deadline=None)
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1, max_size=60,
    ),
)
def test_pareto_front_matches_brute_property(spark, pts):
    """The distributed sort-scan skyline equals the O(n^2) dominance
    filter for any point multiset (ties and duplicates included)."""
    from harmonize_search_analyze_spark.operators.ordering import (
        pareto_front,
    )

    rows = [(i, float(a), float(b)) for i, (a, b) in enumerate(pts)]

    def dominated(p, q):
        return (
            q[1] >= p[1] and q[2] >= p[2]
            and (q[1] > p[1] or q[2] > p[2])
        )

    want = sorted(
        p[0]
        for p in rows
        if not any(dominated(p, q) for q in rows if q[0] != p[0])
    )
    df = spark.createDataFrame(rows, "id long, d1 double, d2 double")
    got = sorted(
        r.id
        for r in pareto_front(df, "d1", "d2").collect()
    )
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    ratings=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 3)),
        min_size=4, max_size=80,
    ),
)
def test_fleiss_kappa_bounds_property(spark, ratings):
    """kappa <= 1 always; p_bar and p_e live in [0, 1]; kappa == 1
    exactly when every retained item is unanimous."""
    from harmonize_search_analyze_spark.operators.analytics import (
        fleiss_kappa,
    )

    df = spark.createDataFrame(
        [(f"i{i}", f"c{c}") for i, c in ratings],
        "item string, cat string",
    )
    rows = fleiss_kappa(df, "item", "cat").collect()
    r = rows[0]
    if r.n_items == 0:
        return  # no item got two ratings: nothing to assert
    assert 0.0 <= r.p_bar <= 1.0 + 1e-9
    assert 0.0 <= r.p_e <= 1.0 + 1e-9
    if r.kappa is not None:
        assert r.kappa <= 1.0 + 1e-9
        if r.p_bar == 1.0:
            assert r.kappa == 1.0


@settings(max_examples=8, deadline=None)
@given(
    data=st.lists(
        st.tuples(st.integers(0, 4), st.floats(0, 50, width=16)),
        min_size=8, max_size=150,
    ),
)
@pytest.mark.slow
def test_benjamini_hochberg_step_up_property(spark, data):
    """Ranks are a permutation 1..m; the rejected set is EXACTLY ranks
    1..k where k is the largest i with p_i <= (i/m) q."""
    from harmonize_search_analyze_spark.operators.analytics import (
        benjamini_hochberg,
    )

    df = spark.createDataFrame(
        [(f"g{g}", float(v)) for g, v in data], "g string, v double"
    )
    out = benjamini_hochberg(df, ["g"], "v").collect()
    m = len(out)
    assert sorted(r.rank for r in out) == list(range(1, m + 1))
    ks = [
        r.rank for r in out
        if r.p_value is not None and r.p_value <= r.bh_critical
    ]
    k = max(ks) if ks else 0
    for r in out:
        assert r.rejected == (r.rank <= k)


@settings(max_examples=8, deadline=None)
@given(
    keys=st.lists(st.integers(0, 25), min_size=1, max_size=200),
)
def test_chao1_dominates_observed_property(spark, keys):
    """chao1 >= S_obs always; coverage in [0, 1]; n is the multiset
    size."""
    from harmonize_search_analyze_spark.operators.dedup import (
        chao1_richness,
    )

    df = spark.createDataFrame([(f"k{k}",) for k in keys], "k string")
    r = chao1_richness(df, "k").collect()[0]
    assert r.n == len(keys)
    assert r.chao1 >= r.s_obs - 1e-9
    assert 0.0 <= r.coverage <= 1.0 + 1e-9


@settings(max_examples=8, deadline=None)
@given(
    data=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 9)),
        min_size=3, max_size=150,
    ),
)
@pytest.mark.slow
def test_kruskal_wallis_nonnegative_property(spark, data):
    """H >= 0 for any groups/ties (midranks preserve the total rank
    sum, so H is a weighted squared deviation); the tie correction
    never shrinks it (corr <= 1)."""
    from harmonize_search_analyze_spark.operators.analytics import (
        kruskal_wallis,
    )

    df = spark.createDataFrame(
        [(f"g{g}", float(v)) for g, v in data], "g string, v double"
    )
    r = kruskal_wallis(df, "v", "g").collect()[0]
    assert r.h >= -1e-6
    if r.h_corrected is not None:
        assert r.h_corrected >= r.h - 1e-6


@settings(max_examples=6, deadline=None)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["ant", "bee", "cow", "doe"]),
            min_size=1, max_size=6,
        ).map(" ".join),
        min_size=1, max_size=40,
    ),
)
def test_good_turing_mass_conservation_property(spark, texts):
    """Good-Turing reassigns mass, it never invents it: the unseen
    mass plus sum over r of F_r * p_gt(r) (where defined) stays <= 1,
    and each defined p_gt is a probability."""
    from harmonize_search_analyze_spark.operators.contamination import (
        good_turing,
    )

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    out = good_turing(df, "text", max_r=8).collect()
    mass = 0.0
    for r in out:
        if r.p_gt is not None:
            assert -1e-9 <= r.p_gt <= 1.0 + 1e-9
            mass += r.p_gt * (r.f_r if r.r > 0 else 1)
    # exact conservation would be == 1 with an untruncated r grid; the
    # round-6 output quantization admits a few ulps of slack per term
    assert mass <= 1.0 + 1e-4
