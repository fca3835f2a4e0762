"""BM25 ranking semantics (operators/ranking.py): hand-computed scores on a
tiny corpus, rare-term dominance, tf saturation, and tie-break pinning."""

from __future__ import annotations

import math

import pytest

from harmonize_search_analyze_spark.operators.ranking import bm25_search

K1, B = 1.2, 0.75


def _bm25(tf, dft, n, dl, avgdl):
    idf = math.log(1.0 + (n - dft + 0.5) / (dft + 0.5))
    return idf * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "spark spark spark join"),     # heavy on 'spark'
        (2, "spark join"),                 # balanced, short
        (3, "join join join join"),        # no 'spark'
        (4, "filter scan table window"),   # no query terms at all
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_bm25_hand_computed(corpus):
    got = {r["doc_id"]: r["score"]
           for r in bm25_search(corpus, "doc_id", "text", ["spark"]).collect()}
    n, avgdl = 4, round((4 + 2 + 4 + 4) / 4.0, 6)
    expect1 = round(_bm25(3, 2, n, 4, avgdl), 6)
    expect2 = round(_bm25(1, 2, n, 2, avgdl), 6)
    assert got == {1: pytest.approx(expect1), 2: pytest.approx(expect2)}
    assert got[1] > got[2]                  # tf saturates but still wins


def test_bm25_rare_term_outranks_common(corpus):
    # 'spark' appears in 2 docs, 'join' in 3 -> doc with only rare term
    # beats doc with only common term at equal tf/dl
    got = [r["doc_id"] for r in
           bm25_search(corpus, "doc_id", "text", ["spark", "join"]).collect()]
    assert got[0] in (1, 2)                 # docs matching BOTH terms first
    assert 4 not in got                     # zero-match docs never surface


def test_bm25_topk_and_tiebreak(spark):
    df = spark.createDataFrame(
        [(i, "alpha beta") for i in range(1, 6)], ["doc_id", "text"]
    )
    got = [r["doc_id"] for r in
           bm25_search(df, "doc_id", "text", ["alpha"], k=3).collect()]
    assert got == [1, 2, 3]                 # equal scores -> doc_id ASC, k cap


def test_significant_text_doc_frequency_semantics(spark):
    """significant_text counts a token once per doc (distinct explode) and
    surfaces foreground-skewed vocabulary first."""
    from harmonize_search_analyze_spark.operators.text import (
        significant_text_sql,
    )

    rows = [
        (1, "en", "llm llm llm data"),   # repeated token counts ONCE
        (2, "en", "llm corpus"),
        (3, "fr", "data corpus"),
        (4, "fr", "data corpus"),
    ]
    spark.createDataFrame(rows, ["doc_id", "lang", "text"]).createOrReplaceTempView(
        "__sig_t"
    )
    out = spark.sql(
        significant_text_sql("__sig_t", "text", "lang = 'en'", "spark", k=10)
    ).collect()
    got = {r["term"]: (r["fg_count"], r["bg_count"]) for r in out}
    assert got["llm"] == (2, 2)          # en-only; tf inside doc 1 ignored
    assert got["data"] == (1, 3)         # mostly background
    terms_by_score = [r["term"] for r in out]
    assert terms_by_score[0] == "llm"    # foreground-exclusive tops JLH


def test_rrf_fuse_hand_case(spark):
    """RRF: a doc ranked 1st+2nd across lists beats a doc ranked 1st in
    one list only; score is sum of 1/(60+rank) over appearances."""
    from harmonize_search_analyze_spark.operators.ranking import rrf_fuse

    import pytest
    from pyspark.sql import functions as F  # noqa: F401

    a = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank int")
    b = spark.createDataFrame([(2, 1), (3, 2)], "doc_id long, rank int")
    out = {r["doc_id"]: (r["rrf_score"], r["n_lists"])
           for r in rrf_fuse([a, b], k=10).collect()}
    assert out[2] == (round(1 / 62 + 1 / 61, 6), 2)
    assert out[1] == (round(1 / 61, 6), 1)
    assert out[3] == (round(1 / 62, 6), 1)
    assert out[2][0] > out[1][0] > out[3][0]
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])


def test_more_like_this_finds_term_overlap(spark):
    from harmonize_search_analyze_spark.operators.ranking import (
        more_like_this,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma epsilon"),   # shares 3 rare-ish terms
            (3, "alpha zeta eta theta"),       # shares only 'alpha'
            (4, "iota kappa lambda mu"),       # shares nothing
            (5, "beta gamma delta nu"),        # shares 3
        ],
        ["doc_id", "text"],
    )
    out = more_like_this(docs, "doc_id", "text", 1, max_query_terms=4, k=10)
    rows = out.collect()
    got = [r["doc_id"] for r in rows]
    # 4 selected terms, min_should = ceil(0.3*4) = 2: doc 3 (1 match) and
    # doc 4 (0) drop; 2 and 5 both match 3 terms
    assert set(got) == {2, 5}
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[2]["matches"] == 3 and by_id[5]["matches"] == 3
    # doc 5 matched {beta, gamma, delta}; delta is rarer (df 2 vs 3) so its
    # idf-sum outranks doc 2's {alpha, beta, gamma}
    assert by_id[5]["score"] > by_id[2]["score"]
    assert got[0] == 5


def test_more_like_this_excludes_query_doc(spark):
    from harmonize_search_analyze_spark.operators.ranking import (
        more_like_this,
    )

    docs = spark.createDataFrame(
        [(1, "solo words here"), (2, "solo words here")], ["doc_id", "text"]
    )
    got = [r["doc_id"] for r in
           more_like_this(docs, "doc_id", "text", 1).collect()]
    assert got == [2]


def test_rescore_window_contract(spark):
    from harmonize_search_analyze_spark.operators.ranking import rescore
    from pyspark.sql import functions as F

    # doc 1 has the best rescore value but sits OUTSIDE the top-2 primary
    # window, so it must not appear — the cascade only reranks the window
    hits = spark.createDataFrame(
        [(1, 1.0, 100.0), (2, 5.0, 10.0), (3, 4.0, 20.0), (4, 3.0, 0.0)],
        ["doc_id", "score", "aux"],
    )
    got = rescore(
        hits, "score", F.col("aux"), window_size=2,
        rescore_query_weight=1.0, k=2,
    ).collect()
    assert [r.doc_id for r in got] == [3, 2]  # 4+20 beats 5+10
    assert got[0].final_score == 24.0


def test_rescore_validation(spark):
    import pytest
    from harmonize_search_analyze_spark.operators.ranking import rescore

    with pytest.raises(ValueError):
        rescore(None, "s", "x", window_size=0)


def test_scroll_pages_full_export(spark):
    from harmonize_search_analyze_spark.operators.ranking import scroll_pages

    df = spark.createDataFrame(
        [(i, float(i % 5) if i % 11 else None) for i in range(1, 40)],
        ["doc_id", "s"],
    )
    pages = list(scroll_pages(df, "s", id_col="doc_id", size=7))
    rows = [r for p in pages for r in p]
    # every row exactly once, pages full except possibly the last,
    # NULL-sort rows included (the tail), total order stable
    assert len(rows) == 39 and len({r.doc_id for r in rows}) == 39
    assert all(len(p) == 7 for p in pages[:-1])
    keys = [
        (r.s is None, r.s if r.s is not None else 0.0, r.doc_id)
        for r in rows
    ]
    assert keys == sorted(keys)
    # re-scroll yields byte-identical pages (PIT snapshot semantics)
    again = [r for p in scroll_pages(df, "s", id_col="doc_id", size=7)
             for r in p]
    assert [r.doc_id for r in again] == [r.doc_id for r in rows]


def test_scroll_pages_max_pages_and_validation(spark):
    from harmonize_search_analyze_spark.operators.ranking import scroll_pages

    df = spark.createDataFrame([(i, float(i)) for i in range(10)],
                               ["doc_id", "s"])
    assert sum(len(p) for p in
               scroll_pages(df, "s", size=3, max_pages=2)) == 6
    with pytest.raises(ValueError):
        next(scroll_pages(df, "s", size=0))


def test_catalog_mget(spark):
    from harmonize_search_analyze_spark.sources.catalog import Catalog

    cat = Catalog(spark)
    cat.register("docs-a", spark.createDataFrame(
        [(1, "x"), (2, "y")], ["doc_id", "t"]))
    cat.register("docs-b", spark.createDataFrame(
        [(3, "z")], ["doc_id", "t"]))
    got = sorted(r.doc_id for r in cat.mget("docs-*", [2, 3, 99]).collect())
    assert got == [2, 3]
    with pytest.raises(ValueError):
        cat.mget("docs-*", [])


def test_search_after_pages_partition_result_list(spark):
    from harmonize_search_analyze_spark.operators.ranking import search_after

    df = spark.createDataFrame(
        [(i, float(100 - (i % 7))) for i in range(1, 30)], ["doc_id", "s"]
    )
    pages, after = [], None
    while True:
        page = search_after(df, "s", after, id_col="doc_id", size=8).collect()
        if not page:
            break
        pages.extend(page)
        after = (page[-1].s, page[-1].doc_id)
    # complete, no overlap, correctly ordered
    assert len(pages) == 29
    assert len({r.doc_id for r in pages}) == 29
    keys = [(-r.s, r.doc_id) for r in pages]
    assert keys == sorted(keys)


def test_search_after_ascending_and_validation(spark):
    import pytest
    from harmonize_search_analyze_spark.operators.ranking import search_after

    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], ["doc_id", "s"])
    got = search_after(df, "s", (1.0, 1), id_col="doc_id", size=5,
                       ascending=True).collect()
    assert [r.doc_id for r in got] == [2]
    with pytest.raises(ValueError):
        search_after(df, "s", None, size=0)


def test_search_after_null_sort_tail_paginates(spark):
    from pyspark.sql import types as T
    from harmonize_search_analyze_spark.operators.ranking import search_after

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("s", T.DoubleType()),
    ])
    rows = [(i, float(i)) for i in range(1, 6)] + [(i, None) for i in range(6, 12)]
    df = spark.createDataFrame(rows, schema)
    pages, after = [], None
    while True:
        page = search_after(df, "s", after, id_col="doc_id", size=4).collect()
        if not page:
            break
        pages.extend(page)
        after = (page[-1].s, page[-1].doc_id)
    # all 11 rows reachable exactly once; NULL-sort rows pinned last
    assert [r.doc_id for r in pages] == [5, 4, 3, 2, 1, 6, 7, 8, 9, 10, 11]


def test_term_suggest_missing_mode(spark):
    from harmonize_search_analyze_spark.operators.ranking import term_suggest

    docs = spark.createDataFrame(
        [(1, "spark spark spark table"), (2, "spark stark table window")],
        ["doc_id", "text"],
    )
    got = term_suggest(docs, "text", "spakr table", k=2).collect()
    # 'table' is in-vocabulary -> suppressed (missing mode); 'spakr' ->
    # spark at distance 2 (classic Levenshtein: transposition = 2 edits,
    # the pinned divergence from ES's Damerau); stark is distance 3, out
    assert [(r.token, r.suggestion, r.distance, r.freq) for r in got] == [
        ("spakr", "spark", 2, 4),
    ]


def test_term_suggest_always_mode_and_validation(spark):
    import pytest
    from harmonize_search_analyze_spark.operators.ranking import term_suggest

    docs = spark.createDataFrame(
        [(1, "table tables tablet")], ["doc_id", "text"]
    )
    got = term_suggest(
        docs, "text", "table", k=5, suggest_mode="always"
    ).collect()
    # exact self-match excluded; close variants suggested
    assert [r.suggestion for r in got] == ["tables", "tablet"]
    with pytest.raises(ValueError):
        term_suggest(docs, "text", "table", max_edits=3)
    with pytest.raises(ValueError):
        term_suggest(docs, "text", "...")
    with pytest.raises(ValueError):
        term_suggest(docs, "text", "x", suggest_mode="popular")


def test_phrase_suggest_prefers_frequent_bigram(spark):
    from harmonize_search_analyze_spark.operators.ranking import (
        phrase_suggest,
    )

    rows = [
        (1, "new york city"), (2, "new york city"), (3, "new york times"),
        (4, "york minster"), (5, "new yonk once"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = phrase_suggest(df, "text", "new yrok", k=3).collect()
    # 'new york' (bigram freq 3) must rank above 'new yonk' (freq 1)
    assert got[0].phrase == "new york"
    phrases = [r.phrase for r in got]
    assert "new yonk" in phrases
    assert phrases.index("new york") < phrases.index("new yonk")
    # the raw input phrase is never suggested
    assert "new yrok" not in phrases


def test_phrase_suggest_validation(spark):
    import pytest
    from harmonize_search_analyze_spark.operators.ranking import (
        phrase_suggest,
    )

    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        phrase_suggest(df, "text", "single")
    with pytest.raises(ValueError):
        phrase_suggest(df, "text", "a b c d")
    with pytest.raises(ValueError):
        phrase_suggest(df, "text", "a b", candidates_per_term=0)
    with pytest.raises(ValueError):
        phrase_suggest(df, "text", "a b", alpha=0)


def test_rank_eval_hand_computed(spark):
    import math
    from harmonize_search_analyze_spark.operators.ranking import rank_eval

    # one query, 3 retrieved of which ranks 1 and 3 are relevant
    # (ratings 3 and 1); one relevant doc (rating 2) never retrieved
    results = spark.createDataFrame(
        [("q1", 10, 1), ("q1", 11, 2), ("q1", 12, 3)],
        ["query_id", "doc_id", "rank"],
    )
    ratings = spark.createDataFrame(
        [("q1", 10, 3), ("q1", 12, 1), ("q1", 99, 2)],
        ["query_id", "doc_id", "rating"],
    )
    row = rank_eval(results, ratings, k=3).collect()[0]
    assert row.precision_k == round(2 / 3, 6)
    assert row.recall_k == round(2 / 3, 6)
    assert row.mrr == 1.0
    dcg = (2**3 - 1) / math.log2(2) + (2**1 - 1) / math.log2(4)
    idcg = (2**3 - 1) / math.log2(2) + (2**2 - 1) / math.log2(3) \
        + (2**1 - 1) / math.log2(4)
    assert row.ndcg_k == round(dcg / idcg, 6)


def test_rank_eval_no_relevant_and_validation(spark):
    import pytest
    from harmonize_search_analyze_spark.operators.ranking import rank_eval

    results = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2)], ["query_id", "doc_id", "rank"]
    )
    ratings = spark.createDataFrame(
        [("q", 99, 0)], ["query_id", "doc_id", "rating"]
    )
    row = rank_eval(results, ratings, k=2).collect()[0]
    assert (row.precision_k, row.recall_k, row.mrr, row.ndcg_k) == (
        0.0, 0.0, 0.0, 0.0,
    )
    with pytest.raises(ValueError):
        rank_eval(results, ratings, k=0)


def test_phrase_suggest_degrades_on_uncorrectable_position(spark):
    """Review finding: a position with no vocabulary neighbors must keep
    the typed token instead of emptying the whole combination frame."""
    from harmonize_search_analyze_spark.operators.ranking import (
        phrase_suggest,
    )

    df = spark.createDataFrame(
        [(1, "fast cars go fast"), (2, "fast lane ahead")],
        ["doc_id", "text"],
    )
    got = phrase_suggest(df, "text", "fsat xq7zzz", k=3).collect()
    phrases = [r.phrase for r in got]
    assert "fast xq7zzz" in phrases  # corrected first token, typed second


def test_rank_feature_functions(spark):
    """ES rank_feature transfer curves: saturation/log/sigmoid values,
    negative inputs dropped, parameter validation."""
    import math

    import pytest as _pytest

    from harmonize_search_analyze_spark.operators.ranking import (
        rank_feature,
        rank_feature_sql,
    )

    df = spark.createDataFrame(
        [(1, 100.0), (2, 300.0), (3, 0.0), (4, -5.0), (5, None)],
        ["doc_id", "feat"],
    )
    sat = {r.doc_id: r.score for r in rank_feature(
        df, "feat", pivot=100.0, k=10, id_col="doc_id").collect()}
    assert sat == {1: 0.5, 2: 0.75, 3: 0.0}  # negative + NULL dropped

    log = {r.doc_id: r.score for r in rank_feature(
        df, "feat", function="log", scaling_factor=1.0, k=10,
        id_col="doc_id").collect()}
    assert abs(log[1] - round(math.log(101.0), 6)) < 1e-9
    assert log[3] == 0.0

    sig = {r.doc_id: r.score for r in rank_feature(
        df, "feat", function="sigmoid", pivot=100.0, exponent=2.0,
        k=10, id_col="doc_id").collect()}
    assert sig[1] == 0.5
    assert abs(sig[2] - round(9.0 / 10.0, 6)) < 1e-9

    with _pytest.raises(ValueError):
        rank_feature_sql("f", function="saturation")
    with _pytest.raises(ValueError):
        rank_feature_sql("f", function="sigmoid", pivot=-1.0)
    with _pytest.raises(ValueError):
        rank_feature_sql("f", function="nope")


def test_distance_feature_score(spark):
    """distance_feature: exact published formula, NULL distance dropped,
    pivot validated."""
    import pytest as _pytest

    from harmonize_search_analyze_spark.operators.ranking import (
        distance_feature,
        distance_feature_sql,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 0.0), (2, 10.0), (3, 90.0), (4, None)], ["doc_id", "d"]
    )
    got = {r.doc_id: r.score for r in distance_feature(
        df, F.col("d"), pivot=10.0, boost=2.0, k=10).collect()}
    assert got == {1: 2.0, 2: 1.0, 3: 0.2}

    with _pytest.raises(ValueError):
        distance_feature(df, F.col("d"), pivot=0.0)
    with _pytest.raises(ValueError):
        distance_feature_sql("d", pivot=-3.0)


def test_pinned_query(spark):
    """ES pinned semantics: pins first in list order even when failing
    the organic query, organic follow in their own order, no dupes."""
    import pytest as _pytest

    from harmonize_search_analyze_spark.operators.ranking import (
        pinned_query,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "x", 50), (2, "y", 90), (3, "x", 70), (4, "x", 60), (5, "y", 99)],
        ["doc_id", "src", "n"],
    )
    got = [r.doc_id for r in pinned_query(
        df, [5, 3], F.col("src") == "x",
        id_col="doc_id", sort_col="n", ascending=False, k=10).collect()]
    # 5 (pinned, fails organic), 3 (pinned), then organic x by n desc: 4, 1
    assert got == [5, 3, 4, 1]

    with _pytest.raises(ValueError):
        pinned_query(df, [], F.lit(True))


def test_term_vectors_stats(spark):
    """_termvectors: tf counts repeats, positions are 1-based and
    ordered, df/ttf are corpus-wide (include docs OUTSIDE the request),
    empty request rejected."""
    import pytest as _pytest

    from harmonize_search_analyze_spark.operators.text import term_vectors

    df = spark.createDataFrame(
        [(1, "cat dog cat"), (2, "dog bird"), (3, "cat fish")],
        ["doc_id", "text"],
    )
    got = {(r.doc_id, r.term): (r.term_freq, list(r.positions),
                                r.doc_freq, r.ttf)
           for r in term_vectors(df, [1]).collect()}
    assert got == {
        (1, "cat"): (2, [1, 3], 2, 3),   # df/ttf see doc 3's cat too
        (1, "dog"): (1, [2], 2, 2),
    }
    with _pytest.raises(ValueError):
        term_vectors(df, [])


def test_script_score_semantics(spark):
    """script_score: query filters first, negative/NULL scores drop (ES
    raises on negatives; relational twin excludes), min_score cut."""
    from harmonize_search_analyze_spark.operators.ranking import (
        script_score,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", -3.0), (3, "b", 99.0), (4, "a", None),
         (5, "a", 2.0)],
        ["doc_id", "src", "v"],
    )
    got = {r.doc_id: r.score for r in script_score(
        df, F.col("src") == "a", "v * 2", k=10).collect()}
    assert got == {1: 20.0, 5: 4.0}   # 3 filtered, 2 negative, 4 NULL

    cut = {r.doc_id for r in script_score(
        df, F.col("src") == "a", "v * 2", min_score=10.0).collect()}
    assert cut == {1}


def test_highlight_fragments_semantics(spark):
    """Multi-fragment highlight: first-N occurrences, case preserved,
    empty array when absent, fragment cap respected."""
    from pyspark.sql import functions as F

    from harmonize_search_analyze_spark.operators.text import (
        highlight_fragments_sql,
    )

    df = spark.createDataFrame(
        [(1, "the Fox ran and the fox hid and another fox"),
         (2, "no animals")],
        ["id", "t"],
    )
    e = highlight_fragments_sql("t", "spark", "fox", window=8,
                                n_fragments=2)
    got = {r.id: list(r.frags) for r in
           df.select("id", F.expr(e).alias("frags")).collect()}
    assert got[1] == ["the <em>Fox</em> ran and",
                      "and the <em>fox</em> hid and"]
    assert got[2] == []
    import pytest as _pytest

    with _pytest.raises(ValueError):
        highlight_fragments_sql("t", "spark", "a'b")


def test_decay_functions_pinned_values(spark):
    """All three decay kinds: score 1 inside the offset, exactly
    `decay` at origin +- (offset + scale); validation raises on bad
    params; NULL values drop from the ranking."""
    import pytest

    from harmonize_search_analyze_spark.operators.ranking import (
        decay_rank,
        decay_score_sql,
    )

    df = spark.createDataFrame(
        [(1, 100.0), (2, 105.0), (3, 160.0), (4, 40.0), (5, None),
         (6, 500.0)],
        "doc_id int, x double",
    )
    for kind in ("gauss", "exp", "linear"):
        got = {r.doc_id: r.score for r in decay_rank(
            df, "x", origin=100.0, scale=50.0, offset=10.0,
            decay=0.33, kind=kind, k=10,
        ).collect()}
        assert got[1] == 1.0 and got[2] == 1.0
        assert got[3] == 0.33 and got[4] == 0.33
        assert 5 not in got          # NULL drops
        assert got[6] < 0.33         # far point decays further
    # linear hits EXACT zero beyond s = scale/(1-decay)
    lin = {r.doc_id: r.score for r in decay_rank(
        df, "x", origin=100.0, scale=50.0, offset=10.0,
        decay=0.33, kind="linear", k=10,
    ).collect()}
    assert lin[6] == 0.0
    with pytest.raises(ValueError, match="decay must be"):
        decay_score_sql("x", origin=0, scale=1, decay=1.5)
    with pytest.raises(ValueError, match="unknown decay kind"):
        decay_score_sql("x", origin=0, scale=1, kind="cosine")


def test_ltr_features_values(spark):
    from harmonize_search_analyze_spark.operators.ranking import (
        ltr_features,
    )

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple", 10),
            (2, "apple cherry", 20),
            (3, "durian durian", 30),
        ],
        ["doc_id", "text", "pop"],
    )
    out = {r["doc_id"]: r for r in ltr_features(
        docs, "doc_id", "text", ["apple", "banana"],
        numeric_features={"f_pop": "pop"}, k=10,
    ).collect()}
    # doc 3 matches nothing -> absent; doc 1 matches both terms
    assert set(out) == {1, 2}
    r1 = out[1]
    assert r1["f_matched_terms"] == 2
    assert r1["f_total_tf"] == 3        # apple x2 + banana x1
    assert r1["f_coverage"] == 1.0
    assert r1["f_doc_len"] == 3
    assert r1["f_pop"] == 10.0
    r2 = out[2]
    assert r2["f_matched_terms"] == 1
    assert r2["f_coverage"] == 0.5
    assert r2["f_pop"] == 20.0
    # feature logging follows retrieval order: doc 1 outranks doc 2
    assert r1["f_bm25"] > r2["f_bm25"]


def test_ltr_features_matches_bm25_score(spark):
    from harmonize_search_analyze_spark.operators.ranking import (
        bm25_search, ltr_features,
    )

    docs = spark.createDataFrame(
        [(i, f"tok{i % 5} tok{i % 3} shared", ) for i in range(30)],
        ["doc_id", "text"],
    )
    terms = ["tok1", "shared"]
    bm = {r["doc_id"]: r["score"]
          for r in bm25_search(docs, "doc_id", "text", terms, k=30).collect()}
    lt = {r["doc_id"]: r["f_bm25"]
          for r in ltr_features(docs, "doc_id", "text", terms, k=30).collect()}
    assert lt == bm
