"""ES retriever-tree composition: spec parsing, leaf semantics, rrf
equivalence with the hand-composed fusion."""

from __future__ import annotations

import math

import pytest

from harmonize_search_analyze_spark.operators.retriever import run_retriever


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark join stream fast", "a"),
            (2, "spark spark join", "a"),
            (3, "slow table scan", "b"),
            (4, "join the stream", "b"),
            (5, "spark", "a"),
        ],
        ["doc_id", "text", "src"],
    )
    emb = spark.createDataFrame(
        [(i, [math.sin(i + j) for j in range(4)], i % 2)
         for i in range(1, 6)],
        ["vec_id", "embedding", "label"],
    )
    return docs, emb


def test_standard_retriever_matches_bm25(corpus, spark):
    from harmonize_search_analyze_spark.operators.ranking import bm25_search

    docs, _ = corpus
    got = run_retriever(
        {"standard": {"query": {"match": {"text": "spark join"}}}},
        docs=docs, k=5,
    ).collect()
    want = [r.doc_id for r in
            bm25_search(docs, "doc_id", "text", ["spark", "join"], 5)
            .collect()]
    assert [r.doc_id for r in sorted(got, key=lambda r: r.rank)] == want


def test_standard_filter_only_ranks_by_id(corpus):
    docs, _ = corpus
    got = run_retriever(
        {"standard": {"query": {"match_all": {}},
                      "filter": {"match": {"src": "b"}}}},
        docs=docs, k=5,
    ).collect()
    assert [(r.doc_id, r.rank) for r in sorted(got, key=lambda r: r.rank)] \
        == [(3, 1), (4, 2)]


def test_knn_retriever_with_filter(corpus):
    docs, emb = corpus
    got = run_retriever(
        {"knn": {"query_vector": [1.0, 0.5, 0.0, -0.5], "k": 3,
                 "filter": {"range": {"label": {"gte": 1}}}}},
        docs=docs, embeddings=emb, k=3,
    ).collect()
    ids = {r.doc_id for r in got}
    assert ids <= {1, 3, 5} and len(got) == 3  # only odd labels survive


def test_rrf_tree_equals_manual_fusion(corpus):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from harmonize_search_analyze_spark.operators.ranking import (
        bm25_search,
        rrf_fuse,
    )
    from harmonize_search_analyze_spark.operators.similarity import (
        cosine_topk,
    )

    docs, emb = corpus
    spec = {"rrf": {"rank_window_size": 4, "rank_constant": 10,
                    "retrievers": [
        {"standard": {"query": {"match": {"text": "spark join"}}}},
        {"knn": {"query_vector": [1.0, 0.5, 0.0, -0.5], "k": 4}},
    ]}}
    got = [(r.doc_id, r.rank) for r in sorted(
        run_retriever(spec, docs=docs, embeddings=emb, k=3).collect(),
        key=lambda r: r.rank)]

    w1 = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    lex = bm25_search(docs, "doc_id", "text", ["spark", "join"], 4) \
        .select("doc_id", F.row_number().over(w1).alias("rank"))
    w2 = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    sem = cosine_topk(emb, "embedding", [1.0, 0.5, 0.0, -0.5], 4) \
        .select(F.col("vec_id").alias("doc_id"),
                F.row_number().over(w2).alias("rank"))
    fused = rrf_fuse([lex, sem], rrf_k=10, k=3).collect()
    want = [(r.doc_id, i + 1) for i, r in enumerate(fused)]
    assert got == want


def test_spec_validation(corpus):
    docs, _ = corpus
    with pytest.raises(ValueError, match="exactly one"):
        run_retriever({"rrf": {}, "knn": {}}, docs=docs)
    with pytest.raises(ValueError, match="unknown retriever"):
        run_retriever({"semantic": {}}, docs=docs)
    with pytest.raises(ValueError, match="embeddings"):
        run_retriever({"knn": {"query_vector": [1.0]}}, docs=docs)


def test_linear_combiner_minmax(corpus):
    """linear retriever: minmax-normalized weighted sum, missing docs
    contribute 0; degenerate single-value window normalizes to 1."""
    from harmonize_search_analyze_spark.operators.retriever import _run

    docs, emb = corpus
    spec = {"linear": {"rank_window_size": 4, "retrievers": [
        {"retriever": {"standard": {"query": {"match": {"text": "spark join"}}}},
         "weight": 2.0, "normalizer": "minmax"},
        {"retriever": {"knn": {"query_vector": [1.0, 0.5, 0.0, -0.5],
                               "k": 4}},
         "weight": 1.0, "normalizer": "minmax"},
    ]}}
    rows = _run(spec, docs=docs, embeddings=emb, id_col="doc_id",
                text_col="text", vec_col="embedding", vec_id_col="vec_id",
                k=10).collect()
    by_id = {r.doc_id: r.score for r in rows}
    # the best lexical doc gets 2.0 * 1.0 from the bm25 leg
    assert max(by_id.values()) <= 3.0
    top = sorted(rows, key=lambda r: r.rank)[0]
    assert top.score == max(by_id.values())
    with pytest.raises(ValueError, match="normalizer"):
        run_retriever({"linear": {"retrievers": [
            {"retriever": {"standard": {"query": {"match": {"text": "x"}}}},
             "normalizer": "zscore"}]}}, docs=docs)


def test_standard_sibling_clauses_restrict(corpus):
    """Review finding: bool siblings of the scoring match clause must
    FILTER (ES semantics), and hyphenated query text tokenizes like the
    document side."""
    docs, _ = corpus
    got = {r.doc_id for r in run_retriever(
        {"standard": {"query": {"bool": {"must": [
            {"match": {"text": "spark join"}},
            {"match": {"src": "b"}},
        ]}}}},
        docs=docs, k=5,
    ).collect()}
    assert got == {4}  # only src='b' docs can rank; doc 3 has no terms
    # engine tokenization of the query text: spark-join == spark join
    a = [r.doc_id for r in run_retriever(
        {"standard": {"query": {"match": {"text": "spark-join"}}}},
        docs=docs, k=5).collect()]
    b = [r.doc_id for r in run_retriever(
        {"standard": {"query": {"match": {"text": "spark join"}}}},
        docs=docs, k=5).collect()]
    assert a == b


def test_root_k_caps_knn_candidates(corpus):
    docs, emb = corpus
    got = run_retriever(
        {"knn": {"query_vector": [1.0, 0.5, 0.0, -0.5], "k": 4}},
        docs=docs, embeddings=emb, k=2,
    ).collect()
    assert len(got) == 2


def test_rescorer_retriever(corpus):
    """rescorer kind: re-rank the child's top window by a combined
    query_weight * child_score + rescore_query_weight * script."""
    from harmonize_search_analyze_spark.operators.retriever import _run

    docs, _ = corpus
    spec = {"rescorer": {
        "retriever": {"standard": {"query": {"match": {"text": "spark join"}}}},
        "rescore": {"window_size": 4, "script": "doc_id * 10.0",
                    "query_weight": 0.0, "rescore_query_weight": 1.0},
    }}
    rows = sorted(
        _run(spec, docs=docs, embeddings=None, id_col="doc_id",
             text_col="text", vec_col="embedding", vec_id_col="vec_id",
             k=3).collect(),
        key=lambda r: r.rank,
    )
    # with query_weight 0 the rescore script (id*10) dominates: highest
    # ids among the bm25 top-4 window win
    ids = [r.doc_id for r in rows]
    assert ids == sorted(ids, reverse=True)
    assert rows[0].score == rows[0].doc_id * 10.0


def test_rescorer_preserves_tail_beyond_window(corpus):
    """Review finding: with k > window_size the below-window docs stay at
    their ORIGINAL rank/score below the rescored window (ES contract)."""
    from harmonize_search_analyze_spark.operators.retriever import _run

    docs, _ = corpus
    spec = {"rescorer": {
        "retriever": {"standard": {"query": {"match": {"text": "spark join"}}}},
        "rescore": {"window_size": 2, "script": "-CAST(doc_id AS DOUBLE)",
                    "query_weight": 0.0, "rescore_query_weight": 1.0},
    }}
    rows = sorted(
        _run(spec, docs=docs, embeddings=None, id_col="doc_id",
             text_col="text", vec_col="embedding", vec_id_col="vec_id",
             k=4).collect(),
        key=lambda r: r.rank,
    )
    assert len(rows) == 4  # window 2 rescored + 2 tail docs kept
    assert [r.rank for r in rows] == [1, 2, 3, 4]
    # the rescored head (lower id wins with -id scoring) sits above the
    # untouched tail
    assert rows[0].doc_id < rows[1].doc_id


def test_text_similarity_reranker_kind(spark):
    """The reranker kind re-orders the child's window by term-overlap
    score against inference_text; rows beyond the window drop (ES
    semantics: the reranker RETURNS its window); endpoint validation
    raises on missing/typed-wrong endpoints."""
    import pytest

    from harmonize_search_analyze_spark.operators.retriever import (
        run_retriever,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "spark fast scan"),
            (3, "fast spark join scan"),
            (4, "nothing relevant"),
        ],
        ["doc_id", "text"],
    )
    registry = {"rr": {"task_type": "rerank", "type": "term_overlap"}}
    spec = {
        "text_similarity_reranker": {
            "retriever": {"standard": {"query": {"match_all": {}}}},
            "field": "text",
            "inference_id": "rr",
            "inference_text": "fast spark scan join",
            "rank_window_size": 4,
            "inference": registry,
        }
    }
    got = [(r.doc_id, r.rank) for r in run_retriever(
        spec, docs=docs, k=3
    ).collect()]
    # doc 3 matches 4/4, doc 2 3/4, docs 1/4 score 0 -> id ASC tiebreak
    assert got == [(3, 1), (2, 2), (1, 3)]
    bad = {
        "text_similarity_reranker": {
            "retriever": {"standard": {"query": {"match_all": {}}}},
            "inference_id": "nope",
            "inference_text": "x",
            "inference": registry,
        }
    }
    with pytest.raises(ValueError, match="unknown inference endpoint"):
        run_retriever(bad, docs=docs, k=3)
