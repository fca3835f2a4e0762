"""ES ``_analyze`` chain semantics: tokenizers, token filters, the
``POST /_analyze`` response shape, and chain composition order."""

from __future__ import annotations

import pytest

from harmonize_search_analyze_spark.functions.analyze import (
    ENGLISH_STOP,
    analyze,
    analyze_api,
    analyze_sql,
)


def _run(spark, text: str, **chain) -> list:
    df = spark.createDataFrame([(text,)], ["t"])
    return df.select(analyze("t", **chain).alias("toks")).collect()[0].toks


def test_tokenizers(spark):
    s = "The quick-brown Fox42 jumps\tover  naïve café!"
    assert _run(spark, s, tokenizer="standard") == [
        "The", "quick", "brown", "Fox42", "jumps", "over", "naïve", "café",
    ]
    assert _run(spark, s, tokenizer="whitespace") == [
        "The", "quick-brown", "Fox42", "jumps", "over", "naïve", "café!",
    ]
    assert _run(spark, s, tokenizer="letter") == [
        "The", "quick", "brown", "Fox", "jumps", "over", "naïve", "café",
    ]
    assert _run(spark, s, tokenizer="keyword") == [s]
    with pytest.raises(ValueError):
        analyze_sql("t", "spark", tokenizer="icu")


def test_filter_chain_order_and_semantics(spark):
    # lowercase -> fold -> stop -> unique -> shingle, the composed pipeline
    toks = _run(
        spark,
        "The Café is the best café, truly the BEST!",
        filters=[
            "lowercase", "asciifolding", ("stop", {}),
            ("length", {"min": 2}), "unique",
            ("shingle", {"min_shingle_size": 2, "max_shingle_size": 2}),
        ],
    )
    assert toks == ["cafe", "best", "truly", "cafe best", "best truly"]
    # stop uses the ES `_english_` list by default, custom list overrides
    assert "the" in ENGLISH_STOP
    assert _run(
        spark, "keep the word", filters=[("stop", {"words": ["word"]})]
    ) == ["keep", "the"]


def test_edge_ngram_and_shingle_bounds(spark):
    # tokens shorter than min_gram emit nothing (ES edge_ngram contract)
    assert _run(
        spark, "ab spark", filters=[("edge_ngram", {"min_gram": 3, "max_gram": 5})]
    ) == ["spa", "spar", "spark"]
    # shingle without unigrams; doc shorter than n emits no shingles
    assert _run(
        spark, "one two three",
        filters=[("shingle", {"min_shingle_size": 2, "max_shingle_size": 3,
                              "output_unigrams": False})],
    ) == ["one two", "two three", "one two three"]
    assert _run(
        spark, "solo",
        filters=[("shingle", {"output_unigrams": False})],
    ) == []
    with pytest.raises(ValueError):
        analyze_sql("t", "spark", filters=[("edge_ngram", {"min_gram": 0})])
    with pytest.raises(ValueError):
        analyze_sql("t", "spark", filters=[("shingle", {"min_shingle_size": 1})])
    with pytest.raises(ValueError):
        analyze_sql("t", "spark", filters=["stemmer"])


def test_misc_filters(spark):
    assert _run(spark, "aa bbbb cc", filters=[("length", {"min": 3})]) == ["bbbb"]
    assert _run(spark, "abcdef", filters=[("truncate", {"length": 4})]) == ["abcd"]
    assert _run(spark, "ab cd", filters=["reverse", "uppercase"]) == ["BA", "DC"]
    assert _run(spark, "b a b c a", filters=["unique"]) == ["b", "a", "c"]


def test_analyze_api_positions(spark):
    df = spark.createDataFrame([(1, "Foo bar foo")], ["id", "t"])
    rows = analyze_api(
        df, "t", filters=["lowercase"], id_col="id"
    ).collect()
    assert [(r.id, r.position, r.token) for r in rows] == [
        (1, 0, "foo"), (1, 1, "bar"), (1, 2, "foo"),
    ]


def test_minimal_english_stemmer(spark):
    """Exact Lucene EnglishMinimalStemmer (Harman S-stemmer) outputs —
    including its deliberately crude cases (his->hi, dies->dy)."""
    got = _run(
        spark,
        "dogs pass bus curious his cats s as ponies goes dies makes ies",
        filters=["lowercase", "stemmer_minimal_english"],
    )
    assert got == ["dog", "pass", "bus", "curious", "hi", "cat", "s",
                   "as", "pony", "goes", "dy", "make", "ies"]


def test_analyzer_from_settings_wire_format(spark):
    """ES settings.analysis JSON adapts to analyze() kwargs — same chain
    result as the hand-built spec."""
    from harmonize_search_analyze_spark.functions.analyze import (
        analyzer_from_settings,
    )

    spec = {"tokenizer": "standard", "filter": [
        "lowercase",
        {"type": "stop", "stopwords": ["the"]},
        {"type": "edge_ngram", "min_gram": 2, "max_gram": 3},
    ]}
    kw = analyzer_from_settings(spec)
    assert kw["filters"][1] == ("stop", {"words": ["the"]})
    got = _run(spark, "The Spark", **kw)
    assert got == ["sp", "spa"]
    with pytest.raises(ValueError, match="unsupported"):
        analyzer_from_settings({"filter": [{"type": "phonetic"}]})


def test_analyzer_settings_guards(spark):
    """Review findings: named stopword lists resolve (not char-iterate),
    foreign stemmer languages raise, char_filter raises."""
    from harmonize_search_analyze_spark.functions.analyze import (
        ENGLISH_STOP,
        analyzer_from_settings,
    )

    kw = analyzer_from_settings(
        {"filter": [{"type": "stop", "stopwords": "_english_"}]}
    )
    assert kw["filters"][0] == ("stop", {"words": ENGLISH_STOP})
    got = _run(spark, "the cat is good", **kw)
    assert got == ["cat", "good"]
    with pytest.raises(ValueError, match="named stopword"):
        analyzer_from_settings(
            {"filter": [{"type": "stop", "stopwords": "_german_"}]})
    with pytest.raises(ValueError, match="stemmer language"):
        analyzer_from_settings(
            {"filter": [{"type": "stemmer", "language": "german"}]})
    assert analyzer_from_settings(
        {"filter": [{"type": "stemmer", "language": "english"}]}
    )["filters"] == ["stemmer_minimal_english"]
    with pytest.raises(ValueError, match="char_filter"):
        analyzer_from_settings({"char_filter": ["html_strip"]})
