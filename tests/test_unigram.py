"""Unigram-LM tokenizer training (SentencePiece shape): EM semantics,
driver/distributed path parity, Viterbi encode."""

from __future__ import annotations

import math

from harmonize_search_analyze_spark.operators.unigram import (
    _viterbi,
    unigram_encode,
    unigram_train,
)


def test_viterbi_prefers_probable_pieces():
    logp = {"a": math.log(0.3), "b": math.log(0.2), "ab": math.log(0.5)}
    assert _viterbi("abab", logp, 2) == ["ab", "ab"]
    assert _viterbi("aba", logp, 2) == ["ab", "a"]
    assert _viterbi("abc", logp, 2) is None  # 'c' unknown -> no path


def _corpus(spark):
    rows = [(i, "the quick spark sparks sparkle the the quick")
            for i in range(20)] + [(100 + i, "quick quack") for i in range(5)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_train_learns_frequent_pieces_and_keeps_chars(spark):
    model = unigram_train(
        _corpus(spark), vocab_size=40, seed_size=200, n_iters=2
    )
    pieces = dict(model)
    # high-frequency whole words should survive as single pieces
    assert "the" in pieces and "quick" in pieces and "spark" in pieces
    # every single character of the corpus survives pruning
    for ch in set("thequickspark"):
        assert ch in pieces, ch
    # a proper probability model: logprobs negative, sorted descending
    lps = [lp for _, lp in model]
    assert all(lp < 0 for lp in lps)
    assert lps == sorted(lps, reverse=True)


def test_driver_and_distributed_paths_identical(spark):
    df = _corpus(spark)
    kw = dict(vocab_size=30, seed_size=100, n_iters=2)
    local = unigram_train(df, **kw)
    dist = unigram_train(df, driver_threshold=0, **kw)
    assert local == dist


def test_encode_round_trip(spark):
    df = _corpus(spark)
    model = unigram_train(df, vocab_size=40, seed_size=200, n_iters=2)
    out = {r.doc_id: (list(r.pieces), r.n_pieces)
           for r in unigram_encode(df, model).collect()}
    pieces, n = out[0]
    assert n == len(pieces) > 0
    # concatenating pieces reconstructs the in-vocab text
    assert "".join(pieces) == "thequicksparksparkssparklethethequick"
