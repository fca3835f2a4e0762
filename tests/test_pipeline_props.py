"""Property-based tests (hypothesis) for the training-pipeline operators:
invariants that must hold for ANY input, complementing the hand cases and
the oracle gate (SURVEY §5 test-strategy model)."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

words = st.lists(
    st.text(alphabet="abcdefgh", min_size=1, max_size=5),
    min_size=1,
    max_size=40,
)


@settings(max_examples=15, deadline=None)
@given(words=words, chunk=st.integers(2, 8), stride_off=st.integers(0, 6))
def test_chunk_reconstruction_property(spark, words, chunk, stride_off):
    """De-overlapping the chunks reproduces the original token stream
    exactly: chunk 0 in full, then each later chunk's tokens after the
    (chunk - stride)-token overlap."""
    from harmonize_search_analyze_spark.operators.packing import (
        chunk_documents,
    )

    stride = max(1, chunk - stride_off)
    text = " ".join(words)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        (r["chunk_idx"], r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(
            df, chunk_tokens=chunk, stride=stride
        ).collect()
    )
    rebuilt: list[str] = []
    for idx, chunk_text, n_tokens in rows:
        toks = chunk_text.split(" ")
        assert len(toks) == n_tokens
        # window idx starts at token idx*stride; everything already in
        # rebuilt beyond that point is this chunk's leading overlap (the
        # whole chunk, for a trailing window clipped at the doc end)
        overlap = len(rebuilt) - idx * stride
        assert 0 <= overlap <= len(toks)
        assert toks[:overlap] == rebuilt[idx * stride:]
        rebuilt.extend(toks[overlap:])
    assert rebuilt == [w for w in words]
    # window i covers [i*stride, i*stride + chunk) clipped at the doc end
    for idx, _, n_tokens in rows:
        assert n_tokens == min(chunk, len(words) - idx * stride)


@settings(max_examples=15, deadline=None)
@given(
    vec=st.lists(
        st.floats(-10, 10, allow_nan=False, width=32), min_size=2, max_size=16
    )
)
def test_quantization_error_bound_property(spark, vec):
    """Dequantization error of every component is bounded by ~scale/2, and
    scale is round(max|x|/127, 12) (the operator rounds for cross-engine
    hash stability — sub-1e-10 magnitudes flush to scale 0 by contract)."""
    from hypothesis import assume

    from harmonize_search_analyze_spark.operators.similarity import (
        quantize_embeddings,
    )

    maxabs = max(abs(v) for v in vec)
    assume(maxabs == 0 or maxabs >= 0.01)
    df = spark.createDataFrame(
        [(1, [float(v) for v in vec])], "vec_id long, embedding array<double>"
    )
    r = quantize_embeddings(df).collect()[0]
    if maxabs == 0:
        assert r["scale"] == 0.0 and all(q == 0 for q in r["qvec"])
        return
    scale = round(maxabs / 127.0, 12)
    assert math.isclose(r["scale"], scale, rel_tol=1e-6)
    for q, v in zip(r["qvec"], vec):
        assert abs(q) <= 127
        assert abs(q * scale - v) <= scale / 2 + scale * 1e-6


@settings(max_examples=10, deadline=None)
@given(
    ranks_a=st.permutations(list(range(1, 6))),
    ranks_b=st.permutations(list(range(1, 6))),
)
def test_rrf_list_order_invariance_property(spark, ranks_a, ranks_b):
    """RRF is symmetric in its input lists: fuse([a, b]) == fuse([b, a]),
    and every score is positive and bounded by n_lists/(rrf_k+1)."""
    from harmonize_search_analyze_spark.operators.ranking import rrf_fuse

    a = spark.createDataFrame(
        list(zip(range(5), ranks_a)), "doc_id long, rank int"
    )
    b = spark.createDataFrame(
        list(zip(range(3, 8), ranks_b)), "doc_id long, rank int"
    )
    ab = {(r["doc_id"], r["rrf_score"], r["n_lists"])
          for r in rrf_fuse([a, b], k=20).collect()}
    ba = {(r["doc_id"], r["rrf_score"], r["n_lists"])
          for r in rrf_fuse([b, a], k=20).collect()}
    assert ab == ba
    for _, score, n_lists in ab:
        assert 0 < score <= round(n_lists / 61.0, 6) + 1e-9
