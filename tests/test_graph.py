"""ES _graph/explore: two-wave co-occurrence spider semantics."""

from __future__ import annotations

import pytest

from harmonize_search_analyze_spark.operators.graph import graph_explore


def test_graph_explore_semantics(spark):
    """Hand-built corpus: wave-1 vertices come only from seed docs,
    wave-2 targets exclude the seed and wave-1 set, edge counts are
    distinct-doc co-occurrences (multiplicity inside a doc ignored)."""
    docs = spark.createDataFrame(
        [
            (1, "seed alpha beta"),
            (2, "seed alpha gamma"),
            (3, "alpha delta delta"),   # non-seed doc: explores alpha
            (4, "beta epsilon"),        # non-seed doc: explores beta
            (5, "zeta eta"),            # disconnected
        ],
        ["doc_id", "text"],
    )
    out = graph_explore(
        docs, "text", "seed", size=2, conn_size=10, min_doc_count=1
    )
    got = [(r.source, r.target, r.doc_count) for r in out.collect()]
    # wave-1 = top-2 terms in seed docs {1,2}: alpha(2), beta(1) —
    # gamma loses the (dc, term) tie-break to beta.
    assert {s for s, _, _ in got} == {"alpha", "beta"}
    # alpha's docs {1,2,3}: targets delta(1 doc; multiplicity ignored),
    # gamma(1) — 'beta' is wave-1 so excluded, 'seed' excluded.
    assert ("alpha", "delta", 1) in got
    assert ("alpha", "gamma", 1) in got
    assert not any(t in ("seed", "alpha", "beta") for _, t, _ in got)
    # beta's docs {1,4}: epsilon from doc 4
    assert ("beta", "epsilon", 1) in got
    # disconnected doc 5 contributes nothing
    assert not any("zeta" in (s, t) for s, t, _ in got)


def test_graph_explore_min_doc_count_and_order(spark):
    docs = spark.createDataFrame(
        [
            (1, "seed a b"),
            (2, "seed a b"),
            (3, "a c"),
            (4, "a c"),
            (5, "a d"),
        ],
        ["doc_id", "text"],
    )
    out = graph_explore(
        docs, "text", "seed", size=1, conn_size=10, min_doc_count=2
    )
    got = [(r.source, r.target, r.doc_count) for r in out.collect()]
    # only edges seen in >= 2 docs survive: a-b (docs 1,2), a-c (3,4);
    # a-d (1 doc) filtered. Ordered doc_count DESC then target ASC.
    assert got == [("a", "b", 2), ("a", "c", 2)]


@pytest.mark.slow
def test_pagerank_convergence_and_dangling(spark):
    """Star graph: the hub out-ranks the spokes; ranks always sum to 1
    (the dangling correction is what keeps mass conserved — spokes
    have no out-edges); more iterations move ranks toward the known
    stationary solution."""
    from harmonize_search_analyze_spark.operators.graph import pagerank

    # hub 0 -> spokes 1..4; spokes dangle
    edges = [(0, i) for i in range(1, 5)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = {r.node: r.rank for r in pagerank(df, iters=5).collect()}
    assert abs(sum(out.values()) - 1.0) < 1e-6
    assert all(out[0] != out[i] for i in range(1, 5))
    spoke = [out[i] for i in range(1, 5)]
    assert max(spoke) - min(spoke) < 1e-9  # symmetric spokes tie


@pytest.mark.slow
def test_pagerank_weighted_vs_unweighted(spark):
    """Edge weights steer the split: with w(1->2)=3, w(1->3)=1, node 2
    receives 3x node 3's contribution from node 1."""
    from harmonize_search_analyze_spark.operators.graph import pagerank

    df = spark.createDataFrame(
        [(1, 2, 3.0), (1, 3, 1.0), (2, 1, 1.0), (3, 1, 1.0)],
        ["src", "dst", "w"],
    )
    out = {r.node: r.rank for r in pagerank(df, iters=8, weight_col="w").collect()}
    assert out[2] > out[3]
    assert abs(sum(out.values()) - 1.0) < 1e-6


def test_triangle_count_hand_graph(spark):
    from harmonize_search_analyze_spark.operators.graph import triangle_count

    # K4 minus edge {3,4}: triangles {1,2,3} and {1,2,4}; degrees
    # 3,3,2,2 -> wedges 3+3+1+1 = 8; transitivity 3*2/8 = 0.75.
    # Includes a self-loop and a duplicate reversed edge to exercise
    # canonicalization.
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (2, 2), (3, 2)],
        ["src", "dst"],
    )
    row = triangle_count(edges).collect()[0]
    assert (row["n_vertices"], row["n_edges"], row["n_triangles"],
            row["n_wedges"], row["transitivity"]) == (4, 5, 2, 8, 0.75)


def test_triangle_count_triangle_free(spark):
    from harmonize_search_analyze_spark.operators.graph import triangle_count

    # star graph: no triangles, transitivity 0
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (0, 4)], ["src", "dst"]
    )
    row = triangle_count(edges).collect()[0]
    assert row["n_triangles"] == 0
    assert row["n_wedges"] == 6
    assert row["transitivity"] == 0.0


def test_triangle_count_sql_matches_dataframe(spark):
    import duckdb

    from harmonize_search_analyze_spark.operators.graph import (
        triangle_count, triangle_count_sql,
    )

    # deterministic pseudo-random graph on 30 nodes
    raw = [((i * 7 + j * 13) % 30, (i * 11 + j) % 30)
           for i in range(30) for j in range(6)]
    df_row = triangle_count(
        spark.createDataFrame(raw, ["src", "dst"])
    ).collect()[0]
    values = ", ".join(f"({s}, {d})" for s, d in raw)
    sql = triangle_count_sql(
        f"SELECT * FROM (VALUES {values}) AS t(src, dst)", "duckdb"
    )
    want = duckdb.sql(sql).fetchall()[0]
    assert tuple(df_row) == want


def test_k_core_peels_tendrils(spark):
    from harmonize_search_analyze_spark.operators.graph import k_core

    # K4 core {1,2,3,4} + a path tendril 4-5-6 that must peel away
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)],
        ["src", "dst"],
    )
    out = {r["node"]: r["core_degree"]
           for r in k_core(edges, k=3, iters=4).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}
    # k above the densest core empties the graph
    assert k_core(edges, k=4, iters=4).count() == 0


def test_k_core_cascading_peel_needs_iterations(spark):
    from harmonize_search_analyze_spark.operators.graph import k_core

    # a chain peels one vertex per round from each end under k=2;
    # after 1 iteration the interior survives, after enough it is gone
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], ["src", "dst"]
    )
    assert k_core(chain, k=2, iters=1).count() == 7  # ends dropped once
    assert k_core(chain, k=2, iters=6).count() == 0  # fully cascaded


def test_k_core_sql_matches_dataframe(spark):
    import duckdb

    from harmonize_search_analyze_spark.operators.graph import (
        k_core, k_core_sql,
    )

    raw = [((i * 5 + j) % 25, (i + j * 7) % 25)
           for i in range(25) for j in range(4)]
    df_rows = sorted(
        tuple(r) for r in k_core(
            spark.createDataFrame(raw, ["src", "dst"]), k=3, iters=5
        ).collect()
    )
    values = ", ".join(f"({s}, {d})" for s, d in raw)
    want = sorted(duckdb.sql(k_core_sql(
        f"SELECT * FROM (VALUES {values}) AS t(src, dst)", "duckdb",
        k=3, iters=5,
    )).fetchall())
    assert df_rows == want
