"""Lucene classic query_string parser: AST shapes, boolean precedence,
+/- clauses, ranges, fuzzy/wildcard/phrase forms, and end-to-end
filtering through the shared compiler."""

import pytest

from harmonize_search_analyze_spark.plans.lucene import (
    LuceneParseError,
    lucene_query,
    parse_lucene,
)


def test_simple_field_term():
    assert parse_lucene("status:active") == {"match": {"status": "active"}}
    assert parse_lucene("n:42") == {"match": {"n": 42}}


def test_boolean_precedence_not_and_or():
    ast = parse_lucene("a:1 OR b:2 AND NOT c:3")
    assert ast == {
        "bool": {
            "should": [
                {"match": {"a": 1}},
                {"bool": {"must": [
                    {"match": {"b": 2}},
                    {"bool": {"must_not": [{"match": {"c": 3}}]}},
                ]}},
            ],
            "minimum_should_match": 1,
        }
    }


def test_implicit_or_between_clauses():
    ast = parse_lucene("a:1 b:2")
    assert ast["bool"]["minimum_should_match"] == 1
    assert len(ast["bool"]["should"]) == 2


def test_plus_minus_clauses():
    ast = parse_lucene("+a:1 -b:2 c:3")
    b = ast["bool"]
    assert b["must"] == [{"match": {"a": 1}}]
    assert b["must_not"] == [{"match": {"b": 2}}]
    # optional should dropped in filter context once a + exists
    assert "should" not in b


def test_phrase_and_slop():
    assert parse_lucene('t:"big data"') == {"match_phrase": {"t": "big data"}}
    assert parse_lucene('t:"big data"~2') == {
        "match_phrase": {"t": {"query": "big data", "slop": 2}}
    }


def test_fuzzy_and_wildcard_and_exists():
    assert parse_lucene("name:smith~") == {
        "fuzzy": {"name": {"value": "smith", "fuzziness": "AUTO"}}
    }
    assert parse_lucene("name:smith~1") == {
        "fuzzy": {"name": {"value": "smith", "fuzziness": 1}}
    }
    assert parse_lucene("name:sm?th*") == {
        "wildcard": {"name": {"value": "sm?th*"}}
    }
    assert parse_lucene("name:*") == {"exists": {"field": "name"}}


def test_bracket_ranges():
    assert parse_lucene("v:[1 TO 5]") == {
        "range": {"v": {"gte": 1, "lte": 5}}
    }
    assert parse_lucene("v:{1 TO 5}") == {"range": {"v": {"gt": 1, "lt": 5}}}
    assert parse_lucene("v:[1 TO 5}") == {"range": {"v": {"gte": 1, "lt": 5}}}
    assert parse_lucene("v:[* TO 5]") == {"range": {"v": {"lte": 5}}}
    assert parse_lucene("d:[\"2024-01-01\" TO *]") == {
        "range": {"d": {"gte": "2024-01-01"}}
    }


def test_one_sided_ops():
    assert parse_lucene("v:>5") == {"range": {"v": {"gt": 5}}}
    assert parse_lucene("v:<=7") == {"range": {"v": {"lte": 7}}}


def test_field_group_distributes():
    ast = parse_lucene("color:(red OR blue)")
    assert ast == {
        "bool": {
            "should": [{"match": {"color": "red"}},
                       {"match": {"color": "blue"}}],
            "minimum_should_match": 1,
        }
    }


def test_boost_discarded():
    assert parse_lucene("a:x^2") == {"match": {"a": "x"}}
    assert parse_lucene('t:"a b"^1.5') == {"match_phrase": {"t": "a b"}}


def test_bare_terms_need_default_fields():
    with pytest.raises(LuceneParseError, match="default_fields"):
        parse_lucene("loose")
    assert parse_lucene("loose", default_fields=["t"]) == {
        "match": {"t": "loose"}
    }
    assert parse_lucene("*") == {"match_all": {}}


def test_escapes():
    assert parse_lucene(r"path:a\:b\(c\)") == {"match": {"path": "a:b(c)"}}


def test_errors():
    with pytest.raises(LuceneParseError, match="unterminated phrase"):
        parse_lucene('t:"open')
    with pytest.raises(LuceneParseError, match="unterminated range"):
        parse_lucene("v:[1 TO 5")
    with pytest.raises(LuceneParseError, match="bad range"):
        parse_lucene("v:[1 5]")


def test_end_to_end_filter(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha", 10, "the big data stack"),
            (2, "beta", 3, "small data"),
            (3, "alpha", 7, "big trouble"),
            (4, None, 99, "big data wins"),
        ],
        ["id", "kind", "v", "text"],
    )
    pred = lucene_query(
        '+kind:alpha +v:[5 TO 20] -text.split:"big trouble"'
    )
    got = sorted(r.id for r in df.where(pred).collect())
    assert got == [1]
    # unprefixed clauses are OPTIONAL once a + exists (Lucene contract):
    # the range clause here does not constrain the match set
    opt = lucene_query("+kind:alpha v:[5 TO 6]")
    assert sorted(r.id for r in df.where(opt).collect()) == [1, 3]
    pred2 = lucene_query('"big data"', default_fields=["text.split"])
    assert sorted(r.id for r in df.where(pred2).collect()) == [1, 4]


def test_hyphenated_terms_are_literal_mid_word():
    """ADVICE r4: +/- are operators only at CLAUSE START (the classic
    _TERM_CHAR rule) — hyphenated dates/identifiers stay one term and
    field:-5 is a negative number, not a prohibit clause."""
    assert parse_lucene("when:2024-01-01") == {
        "match": {"when": "2024-01-01"}
    }
    assert parse_lucene("name:foo-bar") == {"match": {"name": "foo-bar"}}
    assert parse_lucene("delta:-5") == {"match": {"delta": -5}}
    # still operators at clause start
    ast = parse_lucene("a:1 -b:2")
    assert ast["bool"]["must_not"] == [{"match": {"b": 2}}]


def test_plus_clause_followed_by_and():
    """ADVICE r4: '+foo AND bar' must parse — classic makes the
    AND-conjoined clause required alongside the + clause."""
    ast = parse_lucene("+a:1 AND b:2")
    assert ast == {
        "bool": {"must": [{"match": {"a": 1}}, {"match": {"b": 2}}]}
    }
    ast = parse_lucene("-a:1 AND b:2")
    assert ast["bool"]["must_not"] == [{"match": {"a": 1}}]
    assert ast["bool"]["must"] == [{"match": {"b": 2}}]
