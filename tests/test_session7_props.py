"""Property tests for the round-5 session-2 operators (hypothesis):

- set_similarity_join: EXACTLY equals the brute-force pair set on random
  corpora at random thresholds (the prefix filter's no-false-negative
  contract, adversarially sampled instead of hand-picked).
- triangle_count: equals the O(n^3) reference census on random graphs
  (count, wedges, transitivity), duplicates/self-loops included.
- scd2_merge invariants on random dimension/snapshot pairs: at most one
  open row per id; every snapshot id has an open row carrying the
  snapshot's values; re-merging the same snapshot is a no-op (both
  close_missing modes); history rows pass through untouched.
- kmv_overlap: identical inputs give jaccard exactly 1; disjoint inputs
  exactly 0; the union sketch size never exceeds k; estimates are exact
  whenever both sides are sub-k.
"""

from __future__ import annotations

import itertools

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=15, deadline=None,
    suppress_health_check=list(HealthCheck),
)

_vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "t1",
          "t2", "t3"]

_docs = st.lists(
    st.lists(st.sampled_from(_vocab), min_size=1, max_size=6),
    min_size=2, max_size=10,
)


def _jaccard(a: set, b: set) -> float:
    u = len(a | b)
    return len(a & b) / u if u else 0.0


@pytest.mark.slow  # >10s sweep: slow tier (driver pytest budget, r11)
@settings(**_SETTINGS)
@given(_docs, st.sampled_from([0.34, 0.5, 0.67, 0.8, 0.9]))
def test_set_similarity_join_equals_brute(spark, token_lists, threshold):
    from harmonize_search_analyze_spark.operators.dedup import (
        set_similarity_join,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
    got = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in set_similarity_join(
            spark.createDataFrame(rows, ["doc_id", "text"]),
            "doc_id", "text", threshold=threshold, n=1,
        ).collect()
    }
    sets = {i: set(toks) for i, toks in enumerate(token_lists)}
    p, q = int(round(threshold * 1000)), 1000
    want = {}
    for i, j in itertools.combinations(sorted(sets), 2):
        inter = len(sets[i] & sets[j])
        union = len(sets[i] | sets[j])
        if union and q * inter >= p * union:
            want[(i, j)] = round(inter / union, 6)
    assert got == want


_edges = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)),
    min_size=0, max_size=40,
)


@pytest.mark.slow  # >10s sweep: slow tier (driver pytest budget, r11)
@settings(**_SETTINGS)
@given(_edges)
def test_triangle_count_equals_brute(spark, raw_edges):
    from harmonize_search_analyze_spark.operators.graph import (
        triangle_count,
    )

    canon = {(min(a, b), max(a, b)) for a, b in raw_edges if a != b}
    if not canon:
        return  # empty graphs have no degree rows; nothing to compare
    row = triangle_count(
        spark.createDataFrame(list(raw_edges), ["src", "dst"])
    ).collect()[0]
    nodes = sorted({v for e in canon for v in e})
    adj = {v: set() for v in nodes}
    for a, b in canon:
        adj[a].add(b)
        adj[b].add(a)
    tris = sum(
        1 for a, b, c in itertools.combinations(nodes, 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    wedges = sum(
        len(adj[v]) * (len(adj[v]) - 1) // 2 for v in nodes
    )
    assert row["n_vertices"] == len(nodes)
    assert row["n_edges"] == len(canon)
    assert row["n_triangles"] == tris
    assert row["n_wedges"] == wedges
    if wedges:
        assert row["transitivity"] == round(3 * tris / wedges, 6)


_dim_rows = st.lists(
    st.tuples(st.integers(1, 8), st.sampled_from(["a", "b", "c", None])),
    min_size=0, max_size=8, unique_by=lambda t: t[0],
)
_snap_rows = st.lists(
    st.tuples(st.integers(1, 10), st.sampled_from(["a", "b", "c", None])),
    min_size=0, max_size=8, unique_by=lambda t: t[0],
)


@pytest.mark.slow  # >10s sweep: slow tier (driver pytest budget, r11)
@settings(**_SETTINGS)
@given(_dim_rows, _snap_rows, st.booleans())
def test_scd2_merge_invariants(spark, dim_rows, snap_rows, close_missing):
    import datetime as dt

    from harmonize_search_analyze_spark.operators.ordering import (
        scd2_merge,
    )

    t = dt.datetime
    dim_data = [(i, seg, t(2025, 1, 1), None) for i, seg in dim_rows]
    # a fixed closed-history stripe that must pass through untouched
    hist = [(99, "old", t(2024, 1, 1), t(2024, 6, 1))]
    dim = spark.createDataFrame(
        dim_data + hist,
        "id int, seg string, valid_from timestamp, valid_to timestamp",
    )
    snap = spark.createDataFrame(
        snap_rows or [(999, "zz")], "id int, seg string"
    )
    out = scd2_merge(
        dim, snap, "id", ["seg"], "2025-06-01",
        close_missing=close_missing,
    )
    rows = out.collect()
    open_by_id = {}
    for r in rows:
        if r["valid_to"] is None:
            assert r["id"] not in open_by_id, "two open rows for one id"
            open_by_id[r["id"]] = r["seg"]
    snap_map = dict(snap_rows or [(999, "zz")])
    for i, seg in snap_map.items():
        assert open_by_id.get(i, "__missing__") == seg
    assert (99, "old", t(2024, 1, 1), t(2024, 6, 1)) in {
        tuple(r) for r in rows
    }
    if not close_missing:
        # absent ids keep their open rows
        for i, seg in dim_rows:
            if i not in snap_map:
                assert open_by_id.get(i, "__missing__") == seg
    # idempotence: re-merging the same snapshot changes nothing
    again = scd2_merge(
        out, snap, "id", ["seg"], "2025-06-01",
        close_missing=close_missing,
    )

    def key(t):
        return tuple((v is None, v) for v in t)

    assert sorted(map(tuple, rows), key=key) == sorted(
        map(tuple, again.collect()), key=key
    )


@settings(**_SETTINGS)
@given(
    st.lists(st.text(alphabet="abcXY019", min_size=1, max_size=6),
             min_size=1, max_size=30),
    st.integers(8, 64),
)
@pytest.mark.slow  # >10s sweep: slow tier (driver pytest budget, r11)
def test_kmv_overlap_laws(spark, values, k):
    from harmonize_search_analyze_spark.operators.aggregations import (
        kmv_overlap,
    )

    df = spark.createDataFrame([(v,) for v in values], ["t"])
    same = kmv_overlap(df, df, "t", k=k).collect()[0]
    assert same["jaccard"] == 1.0
    assert same["sketch_union"] <= k
    n_distinct = len(set(values))
    if n_distinct < k:
        assert same["est_distinct_a"] == float(n_distinct)
        assert same["est_union"] == float(n_distinct)
        assert same["est_intersection"] == float(n_distinct)
    other = spark.createDataFrame(
        [(v + "_disjoint_",) for v in values], ["t"]
    )
    disj = kmv_overlap(df, other, "t", k=k).collect()[0]
    assert disj["jaccard"] == 0.0 and disj["est_intersection"] == 0.0
