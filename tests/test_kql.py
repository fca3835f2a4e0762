"""KQL parser: text -> ES DSL -> (via the shared compiler) predicates."""

import pytest
from pyspark.sql import functions as F

from harmonize_search_analyze_spark.plans.kql import (
    KQLParseError,
    kql_query,
    parse_kql,
)


# ---------- structural: KQL -> DSL ----------

def test_simple_field_match():
    assert parse_kql("status:active") == {"match": {"status": "active"}}


def test_numeric_and_boolean_coercion():
    assert parse_kql("n:42") == {"match": {"n": 42}}
    assert parse_kql("x:3.5") == {"match": {"x": 3.5}}
    assert parse_kql("ok:true") == {"match": {"ok": True}}


def test_quoted_phrase():
    assert parse_kql('t:"new york"') == {"match_phrase": {"t": "new york"}}


def test_exists_and_wildcard():
    assert parse_kql("f:*") == {"exists": {"field": "f"}}
    assert parse_kql("f:ab*c?") == {"wildcard": {"f": {"value": "ab*c?"}}}


def test_escaped_wildcard_is_literal():
    assert parse_kql(r"f:a\*b") == {"match": {"f": "a*b"}}


def test_range_ops():
    assert parse_kql("v >= 10") == {"range": {"v": {"gte": 10}}}
    assert parse_kql("v<2.5") == {"range": {"v": {"lt": 2.5}}}
    assert parse_kql("ts > now-1y") == {"range": {"ts": {"gt": "now-1y"}}}


def test_boolean_precedence_not_and_or():
    # a or b and not c  ==  a OR (b AND (NOT c))
    got = parse_kql("a:1 or b:2 and not c:3")
    assert got == {
        "bool": {
            "should": [
                {"match": {"a": 1}},
                {"bool": {"filter": [
                    {"match": {"b": 2}},
                    {"bool": {"must_not": [{"match": {"c": 3}}]}},
                ]}},
            ],
            "minimum_should_match": 1,
        }
    }


def test_parentheses_override_precedence():
    got = parse_kql("(a:1 or b:2) and c:3")
    assert got["bool"]["filter"][0]["bool"]["should"] == [
        {"match": {"a": 1}}, {"match": {"b": 2}},
    ]


def test_value_group_or_and():
    assert parse_kql("f:(x or y)") == {
        "bool": {
            "should": [{"match": {"f": "x"}}, {"match": {"f": "y"}}],
            "minimum_should_match": 1,
        }
    }
    assert parse_kql("f:(x and y)") == {
        "bool": {"filter": [{"match": {"f": "x"}}, {"match": {"f": "y"}}]}
    }


def test_value_group_mixed_keywords_rejected():
    with pytest.raises(KQLParseError, match="mixed"):
        parse_kql("f:(x or y and z)")


def test_bare_term_needs_default_fields():
    with pytest.raises(KQLParseError, match="default_fields"):
        parse_kql("loose")
    assert parse_kql("loose", default_fields=["a", "b"]) == {
        "multi_match": {"query": "loose", "fields": ["a", "b"]}
    }


def test_bare_wildcard_terms():
    # `*` alone is Kibana's match-everything, default fields or not
    assert parse_kql("*") == {"match_all": {}}
    assert parse_kql("*", default_fields=["a"]) == {"match_all": {}}
    # a bare wildcard term keeps wildcard semantics across default fields
    assert parse_kql("err*", default_fields=["msg", "tag"]) == {
        "bool": {
            "should": [
                {"wildcard": {"msg": {"value": "err*"}}},
                {"wildcard": {"tag": {"value": "err*"}}},
            ],
            "minimum_should_match": 1,
        }
    }


def test_empty_query_is_match_all():
    assert parse_kql("") == {"match_all": {}}
    assert parse_kql("   ") == {"match_all": {}}


def test_errors_carry_position():
    with pytest.raises(KQLParseError, match="unterminated"):
        parse_kql('f:"oops')
    with pytest.raises(KQLParseError, match=r"\)"):
        parse_kql("(a:1")
    with pytest.raises(KQLParseError, match="no colon"):
        parse_kql("f : > 5")
    with pytest.raises(KQLParseError, match="unexpected"):
        parse_kql("a:1 b:2")  # missing and/or


def test_mixed_escaped_unescaped_wildcards_rejected():
    with pytest.raises(KQLParseError, match="wildcard"):
        parse_kql(r"f:a\**")


def test_nested_syntax_pointed_at_dsl():
    with pytest.raises(KQLParseError, match="nested"):
        parse_kql("path:{ sub:1 }")


# ---------- end-to-end: KQL predicate over a DataFrame ----------

def test_kql_predicate_end_to_end(spark):
    df = spark.createDataFrame(
        [
            (1, "purchase", 300.0),
            (2, "refund", 300.0),
            (3, "purchase", 10.0),
            (4, "signup", 1.0),
            (5, "sXgnup", 1.0),
        ],
        "id INT, event_type STRING, value DOUBLE",
    )
    pred = kql_query(
        "event_type:(purchase or refund) and value >= 250 "
        "or event_type:s?gnup and value < 5"
    )
    got = sorted(r["id"] for r in df.where(pred).collect())
    assert got == [1, 2, 4, 5]


def test_kql_quoted_phrase_on_split_field(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "brown the quick")],
        "id INT, text STRING",
    )
    pred = kql_query('text.split:"quick brown"')
    assert [r["id"] for r in df.where(pred).collect()] == [1]


def test_kql_pushdown_sargable(spark, tmp_path):
    # range + term from KQL reach the parquet scan as pushed filters
    p = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [(i, float(i), "a" if i % 2 else "b") for i in range(100)],
        "id INT, v DOUBLE, k STRING",
    ).write.parquet(p)
    df = spark.read.parquet(p)
    out = df.where(kql_query("k:a and v >= 50"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "IsNotNull(k)" in plan or "EqualTo(k,a)" in plan, plan


def test_range_quoted_value_stays_string():
    # KQL quoting pins the literal: no numeric coercion for "10"
    assert parse_kql('v >= "10"') == {"range": {"v": {"gte": "10"}}}
    assert parse_kql("v >= 10") == {"range": {"v": {"gte": 10}}}


def test_field_name_wildcard_expansion():
    # single hit collapses, multi-hit ORs across fields (Kibana's
    # client-side field-wildcard expansion against field_names)
    assert parse_kql("event_t*pe : purchase",
                     field_names=["event_type", "event_id"]) == {
        "match": {"event_type": "purchase"}
    }
    assert parse_kql("v* >= 10", field_names=["v1", "v2"]) == {
        "bool": {"should": [{"range": {"v1": {"gte": 10}}},
                            {"range": {"v2": {"gte": 10}}}],
                 "minimum_should_match": 1}
    }
    with pytest.raises(KQLParseError, match="needs field_names"):
        parse_kql("x*: 1")
    with pytest.raises(KQLParseError, match="matches no field"):
        parse_kql("z*: 1", field_names=["a"])


def test_field_wildcard_value_group_replays_per_field(spark):
    from harmonize_search_analyze_spark.plans.kql import kql_query

    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "a"), (3, "c", "c")],
        ["id", "tag_one", "tag_two"],
    )
    pred = kql_query("tag_*: (a or b)",
                     field_names=["tag_one", "tag_two"])
    assert {r.id for r in df.where(pred).collect()} == {1, 2}


def test_percolate_with_kql_stored_queries(spark):
    """Saved-search alerting with KQL-authored queries: parse_kql
    output plugs straight into percolate() (one grammar front-end,
    one predicate engine) — the Kibana alert-rule shape."""
    from harmonize_search_analyze_spark.plans.compiler import percolate
    from harmonize_search_analyze_spark.plans.kql import parse_kql

    df = spark.createDataFrame(
        [
            (1, "error", 500.0),
            (2, "view", 10.0),
            (3, "error", 5.0),
            (4, "purchase", 900.0),
        ],
        ["event_id", "event_type", "value"],
    )
    stored = {
        "errors": parse_kql("event_type: error"),
        "big_spend": parse_kql("event_type: purchase and value >= 100"),
        "anything_high": parse_kql("value > 400"),
    }
    got = sorted(
        (r.event_id, r.query_id)
        for r in percolate(df, stored, ["event_id"]).collect()
    )
    assert got == [
        (1, "anything_high"), (1, "errors"), (3, "errors"),
        (4, "anything_high"), (4, "big_spend"),
    ]
