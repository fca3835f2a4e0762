"""Behavioral tests for decontamination, unigram-LM scoring, int8
quantization, and token-window chunking (the oracle-parity harness covers
cross-engine hashes; these pin hand-computed semantics)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_contamination_flags_hand_case(spark):
    from harmonize_search_analyze_spark.operators.contamination import (
        contamination_flags,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a completely different sentence with no overlap here"),
            (3, "quick brown fox jumps over something else entirely now"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "we saw the quick brown fox jumps over a fence")],
        "bench_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_hits"], r["contaminated"])
        for r in contamination_flags(docs, bench, n=4).collect()
    }
    # doc 1 shares 4-grams "the quick brown fox", "quick brown fox jumps",
    # "brown fox jumps over"; doc 3 shares the middle two; doc 2 none.
    assert out[1] == (3, True)
    assert out[2] == (0, False)
    assert out[3] == (2, True)


def test_contamination_short_doc_whole_stream_gram(spark):
    from harmonize_search_analyze_spark.operators.contamination import (
        contamination_flags,
    )

    docs = spark.createDataFrame(
        [(1, "tiny doc"), (2, "other text")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(9, "tiny doc")], "b long, text string")
    out = {r["doc_id"]: r["contaminated"]
           for r in contamination_flags(docs, bench, n=13).collect()}
    # both sides shorter than n: whole token stream is the gram
    assert out == {1: True, 2: False}


def test_unigram_lm_score_hand_case(spark):
    from harmonize_search_analyze_spark.operators.contamination import (
        unigram_lm_score,
    )

    # corpus: 4 tokens total; 'a' x2 (p=0.5), 'b' (0.25), 'c' (0.25)
    docs = spark.createDataFrame(
        [(1, "a a"), (2, "b c")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in unigram_lm_score(docs).collect()}
    assert out[1]["n_tokens"] == 2
    assert out[2]["n_tokens"] == 2
    assert out[1]["nll"] == pytest.approx(-math.log(0.5), abs=1e-6)
    assert out[2]["nll"] == pytest.approx(-math.log(0.25), abs=1e-6)


def test_quantize_embeddings_roundtrip_error_bounded(spark):
    from harmonize_search_analyze_spark.operators.similarity import (
        quantize_embeddings,
    )

    vec = [0.5, -1.0, 0.25, 0.0]
    df = spark.createDataFrame([(1, vec)], "vec_id long, embedding array<double>")
    r = quantize_embeddings(df).collect()[0]
    scale = 1.0 / 127.0
    assert r["scale"] == pytest.approx(scale, abs=1e-12)
    assert r["qvec"] == [round(v / scale) for v in vec]
    # dequantization error bounded by scale/2 per component
    for q, v in zip(r["qvec"], vec):
        assert abs(q * scale - v) <= scale / 2 + 1e-12


def test_quantize_zero_vector_guard(spark):
    from harmonize_search_analyze_spark.operators.similarity import (
        quantize_embeddings,
    )

    df = spark.createDataFrame(
        [(1, [0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    r = quantize_embeddings(df).collect()[0]
    assert r["qvec"] == [0, 0]
    assert r["scale"] == 0.0


def test_quantized_topk_close_to_exact(spark):
    from harmonize_search_analyze_spark.operators.similarity import (
        cosine_topk,
        quantized_topk,
    )
    from harmonize_search_analyze_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    qvec = [math.sin(i + 1.0) for i in range(64)]
    exact = [r["vec_id"] for r in cosine_topk(emb, "embedding", qvec, 10).collect()]
    quant = [r["vec_id"] for r in quantized_topk(emb, qvec, 10).collect()]
    # int8 error is ~0.4% of full scale: top-10 overlap must be high
    assert len(set(exact) & set(quant)) >= 8


def test_chunk_documents_windows(spark):
    from harmonize_search_analyze_spark.operators.packing import (
        chunk_documents,
    )

    docs = spark.createDataFrame(
        [(1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), (2, "a b")],
        "doc_id long, text string",
    )
    rows = sorted(
        (r["doc_id"], r["chunk_idx"], r["n_tokens"], r["chunk_text"])
        for r in chunk_documents(docs, chunk_tokens=4, stride=3).collect()
    )
    assert rows == [
        (1, 0, 4, "t0 t1 t2 t3"),
        (1, 1, 4, "t3 t4 t5 t6"),
        (1, 2, 4, "t6 t7 t8 t9"),
        (1, 3, 1, "t9"),
        (2, 0, 2, "a b"),
    ]


def test_chunk_documents_stride_validation(spark):
    from harmonize_search_analyze_spark.operators.packing import (
        chunk_documents,
    )

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(docs, chunk_tokens=4, stride=0)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(docs, chunk_tokens=4, stride=5)


# --- plan assertions (scale-shape contracts) --------------------------------


def _plan(df):
    p = df._jdf.queryExecution().executedPlan().toString()
    return p.split("== Initial Plan ==")[0]


def test_contamination_benchmark_side_broadcasts(spark):
    """The benchmark gram set must broadcast — the corpus side must never
    shuffle its text/grams for the semi-join."""
    from harmonize_search_analyze_spark.operators.contamination import (
        contamination_flags,
    )
    from harmonize_search_analyze_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    out = contamination_flags(docs, bench, n=8)
    out.collect()
    plan = _plan(out)
    # the corpus-side gram join must be broadcast (bench side builds)
    assert "BroadcastHashJoin [gram" in plan, plan
    # exactly one gram-keyed exchange: the benchmark-side distinct (small);
    # the corpus side must never shuffle on gram
    assert plan.count("hashpartitioning(gram") == 1, plan


def test_chunk_documents_is_map_only(spark):
    """Chunking is sequence->explode->slice: zero exchanges, one scan."""
    from harmonize_search_analyze_spark.operators.packing import (
        chunk_documents,
    )
    from harmonize_search_analyze_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = chunk_documents(docs, chunk_tokens=32, stride=24)
    out.collect()
    plan = _plan(out)
    assert "Exchange" not in plan, plan


def test_quantized_topk_take_ordered(spark):
    """Quantized top-k must plan as TakeOrderedAndProject (bounded heap
    merge), never a global Sort."""
    from harmonize_search_analyze_spark.operators.similarity import (
        quantized_topk,
    )
    from harmonize_search_analyze_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    qvec = [math.sin(i + 1.0) for i in range(64)]
    out = quantized_topk(emb, qvec, 10)
    out.collect()
    plan = _plan(out)
    assert "TakeOrderedAndProject" in plan, plan
    assert "Sort [cosine_q" not in plan, plan


def test_similarity_join_ivf_recall_vs_exact(spark):
    """Probe-pruned batch k-NN: recall@5 vs the exact join must be
    substantial (4/16 lists probed), and every returned pair must agree
    with the exact join's cosine for that pair."""
    from harmonize_search_analyze_spark.operators.similarity import (
        similarity_join,
        similarity_join_ivf,
    )
    from harmonize_search_analyze_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {(r["query_id"], r["corpus_id"]): r["cosine"]
             for r in similarity_join(emb, queries, k=5).collect()}
    ivf_rows = similarity_join_ivf(emb, queries, k=5).collect()
    ivf = {(r["query_id"], r["corpus_id"]): r["cosine"] for r in ivf_rows}
    recall = len(set(exact) & set(ivf)) / len(exact)
    assert recall >= 0.5, recall
    # cosines agree on overlapping pairs (same formula, same rounding)
    for pair in set(exact) & set(ivf):
        assert exact[pair] == ivf[pair]
    # each query returns exactly k pairs (candidate lists >> k here)
    from collections import Counter
    per_q = Counter(q for q, _ in ivf)
    assert all(v == 5 for v in per_q.values())


def test_perplexity_buckets_equal_depth(spark):
    """CCNet tiers: per-lang NTILE(3) splits into equal-depth buckets
    (±1), and the head tier is strictly more fluent (lower mean NLL)
    than the tail."""
    from harmonize_search_analyze_spark.operators.contamination import (
        perplexity_buckets,
    )

    rows = [
        (i, ("common word " * 5 + (f"rare{i} " * (i % 7))).strip(),
         "en" if i % 2 else "fr")
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = perplexity_buckets(docs).collect()
    by = {(r["lang"], r["bucket"]): r for r in out}
    for lang in ("en", "fr"):
        counts = [by[(lang, b)]["doc_count"] for b in ("head", "middle", "tail")]
        assert sum(counts) == 30
        assert max(counts) - min(counts) <= 1
        assert by[(lang, "head")]["avg_nll"] <= by[(lang, "tail")]["avg_nll"]


def test_perplexity_buckets_approx_scale_twin(spark):
    """exact=False (CCNet threshold cut) must agree with the NTILE oracle
    on tier populations up to cutoff ties, and must not sort per
    language (no Window in the plan — the 100 TB skew guard)."""
    from harmonize_search_analyze_spark.operators.contamination import (
        perplexity_buckets,
    )

    rows = [
        (i, ("common word " * 5 + (f"rare{i} " * (i % 7))).strip(),
         "en" if i % 2 else "fr")
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    exact = {(r["lang"], r["bucket"]): r["doc_count"]
             for r in perplexity_buckets(docs).collect()}
    approx_df = perplexity_buckets(docs, exact=False)
    approx = {(r["lang"], r["bucket"]): r["doc_count"]
              for r in approx_df.collect()}
    assert set(approx) == set(exact)
    for k in exact:
        # ties at the cutoff can move a handful of docs between tiers
        assert abs(approx[k] - exact[k]) <= 5, (k, exact[k], approx[k])
    plan = approx_df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan


def test_bigram_lm_score_hand_values(spark):
    """JM-interpolated bigram NLL against hand-computed probabilities;
    first token scored by the unigram term alone."""
    import math

    from harmonize_search_analyze_spark.operators.contamination import (
        bigram_lm_score,
    )

    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "b a"), (3, "")], ["doc_id", "text"]
    )
    got = {
        r.doc_id: (r.n_tokens, r.nll)
        for r in bigram_lm_score(docs, lam=0.5).collect()
    }
    # corpus: uni a=3 b=2 N=5; big (a,b)=1 (b,a)=2; ctx a=1 b=2
    d1 = -(math.log(3 / 5) + math.log(0.5 * 1 + 0.5 * 2 / 5)
           + math.log(0.5 * 1 + 0.5 * 3 / 5)) / 3
    d2 = -(math.log(2 / 5) + math.log(0.5 * 1 + 0.5 * 3 / 5)) / 2
    assert got[1] == (3, round(d1, 6))
    assert got[2] == (2, round(d2, 6))
    assert 3 not in got  # empty doc emits no tokens, no row


def test_corpus_pipeline_stage_semantics(spark):
    """Curation pipeline: stages apply in order; exact_dedup keeps the
    min id; spark path equals the duckdb oracle on the same frame."""
    import duckdb

    import pytest as _pytest

    from harmonize_search_analyze_spark.operators.curation_pipeline import (
        corpus_pipeline_sql,
        run_corpus_pipeline,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog again today"),
        (2, "the quick brown fox jumps over the lazy dog again today"),
        (3, "  THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG AGAIN TODAY"),
        (4, "tiny"),
        (5, None),
        (6, "another perfectly reasonable english sentence with words"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    stages = [
        {"length_filter": {"min_chars": 10}},
        {"exact_dedup": {}},
    ]
    got = sorted(r.doc_id for r in
                 run_corpus_pipeline(df, stages).collect())
    assert got == [1, 6]  # 2 and 3 are case/space dups of 1; 4 short; 5 null

    con = duckdb.connect()
    con.register("docs_t", __import__("pandas").DataFrame(
        rows, columns=["doc_id", "text"]))
    want = [r[0] for r in con.sql(corpus_pipeline_sql(
        "docs_t", stages, ["doc_id", "text"])).fetchall()]
    assert got == want

    with _pytest.raises(ValueError, match="unknown curation stage"):
        run_corpus_pipeline(df, [{"dedupe": {}}])
    with _pytest.raises(ValueError, match="single"):
        run_corpus_pipeline(df, [{"a": {}, "b": {}}])


def test_corpus_pipeline_redact_and_line_dedup(spark):
    """pii_redact + line_dedup stages: text transforms thread through the
    pipeline and match the oracle composition."""
    import duckdb
    import pandas as pd

    from harmonize_search_analyze_spark.operators.curation_pipeline import (
        corpus_pipeline_sql,
        run_corpus_pipeline,
    )

    rows = [
        (1, "contact me at bob@example.com now\nthis line repeats often"),
        (2, "totally original content here\nthis line repeats often"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    stages = [{"pii_redact": {}}, {"line_dedup": {"min_line_chars": 5}}]
    got = {r.doc_id: r.text for r in
           run_corpus_pipeline(df, stages).collect()}
    assert "[EMAIL]" in got[1] and "bob@" not in got[1]
    assert "repeats often" in got[1]          # first occurrence kept
    assert "repeats often" not in got[2]      # dropped downstream

    con = duckdb.connect()
    con.register("docs_t", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = dict(con.sql(corpus_pipeline_sql(
        "docs_t", stages, ["doc_id", "text"])).fetchall())
    assert got == want


def test_corpus_pipeline_columns_flow_past_text_stages(spark):
    """Review finding: a stage keyed on a non-id column downstream of a
    text-transform stage must work identically in both twins when
    columns enumerates the full frame."""
    import duckdb
    import pandas as pd

    from harmonize_search_analyze_spark.operators.curation_pipeline import (
        corpus_pipeline_sql,
        run_corpus_pipeline,
    )

    rows = [(i, f"line one repeated\nunique {i}", "s" + str(i % 2))
            for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    stages = [{"line_dedup": {"min_line_chars": 5}},
              {"sample": {"fraction": 0.5, "key": "source"}}]
    got = sorted((r.doc_id, r.source) for r in
                 run_corpus_pipeline(df, stages).collect())
    con = duckdb.connect()
    con.register("docs_t", pd.DataFrame(
        rows, columns=["doc_id", "text", "source"]))
    want = sorted((r[0], r[2]) for r in con.sql(corpus_pipeline_sql(
        "docs_t", stages, ["doc_id", "text", "source"])).fetchall())
    assert got == want
    with __import__("pytest").raises(ValueError, match="every column"):
        corpus_pipeline_sql("docs_t", stages, ["doc_id"])


def test_ngram_novelty_exact_vs_python(spark):
    from harmonize_search_analyze_spark.operators.contamination import (
        ngram_novelty,
    )

    ref = spark.createDataFrame(
        [("alpha beta gamma delta epsilon",),
         ("one two three four five",)], ["text"]
    )
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),  # 2 grams, 1 seen
            (2, "totally novel words here every time ok"),
            (3, "alpha beta gamma delta epsilon"),       # 1 gram, seen
            (4, "too short"),    # < n tokens: whole stream = ONE shingle
            (5, None),           # no text -> no grams -> NULL novelty
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ngram_novelty(
        docs, ref, "doc_id", "text", n=5).collect()}
    assert (out[1]["n_grams"], out[1]["n_seen"]) == (2, 1)
    assert out[1]["novelty"] == 0.5
    assert out[2]["n_seen"] == 0 and out[2]["novelty"] == 1.0
    assert out[3]["novelty"] == 0.0
    # the pinned short-doc shingle rule (grams_sql): one whole-stream
    # gram, unseen in the reference
    assert out[4]["n_grams"] == 1 and out[4]["novelty"] == 1.0
    assert out[5]["n_grams"] == 0 and out[5]["novelty"] is None


def test_ngram_novelty_bloom_invariant_to_filter_size(spark):
    """The Bloom prefilter must not change the answer — tiny m_bits
    (high FP rate) and huge m_bits agree exactly."""
    from harmonize_search_analyze_spark.operators.contamination import (
        ngram_novelty,
    )

    ref = spark.createDataFrame(
        [(f"w{i} w{i+1} w{i+2} w{i+3} w{i+4}",) for i in range(0, 40, 2)],
        ["text"],
    )
    docs = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2} w{i+3} w{i+4} w{i+5}")
         for i in range(30)],
        ["doc_id", "text"],
    )
    small = ngram_novelty(
        docs, ref, "doc_id", "text", n=5, m_bits=256, k=2
    ).collect()
    big = ngram_novelty(
        docs, ref, "doc_id", "text", n=5, m_bits=1 << 20, k=5
    ).collect()
    assert sorted(map(tuple, small)) == sorted(map(tuple, big))
