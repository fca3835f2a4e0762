"""Query-compiler unit tests: every predicate Q1-Q9 (SURVEY.md §2.4) against
hand-computed expected row sets, plus bool composition and the display-text
mirror (collections.js:209-257 parity)."""

from __future__ import annotations

import datetime as dt

import pytest

from harmonize_search_analyze_spark.plans.compiler import (
    QueryCompileError,
    compile_query,
    display_text,
)


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        # (id, qty, flag, status, descr, ts)
        (1, 5.0, "N", 1, "PROMO BURNISHED COPPER", dt.datetime(2024, 1, 15)),
        (2, 15.0, "A", 0, "STANDARD POLISHED BRASS", dt.datetime(2024, 3, 1)),
        (3, 25.0, "R", 1, "PROMO ANODIZED TIN", dt.datetime(2024, 6, 15)),
        (4, 35.0, "N", 0, None, dt.datetime(2025, 1, 1)),
    ]
    return spark.createDataFrame(
        rows, ["id", "qty", "flag", "active", "descr", "ts"]
    )


def ids(frame, ast):
    return sorted(r["id"] for r in frame.where(compile_query(ast)).collect())


def test_match_all_and_empty(frame):
    assert ids(frame, {"match_all": {}}) == [1, 2, 3, 4]
    assert ids(frame, None) == [1, 2, 3, 4]
    assert ids(frame, {}) == [1, 2, 3, 4]


def test_range_inclusive_both_ends(frame):
    # Q2: gte/lte inclusive (ES range semantics)
    assert ids(frame, {"range": {"qty": {"gte": 15, "lte": 25}}}) == [2, 3]
    assert ids(frame, {"range": {"qty": {"gt": 15, "lt": 35}}}) == [3]
    assert ids(frame, {"range": {"qty": {"gte": 35}}}) == [4]


def test_range_epoch_millis(frame):
    # Q3: datetime range in epoch millis, from/to are inclusive gte/lte
    frm = int(dt.datetime(2024, 3, 1, tzinfo=dt.timezone.utc).timestamp() * 1000)
    to = int(dt.datetime(2024, 12, 31, tzinfo=dt.timezone.utc).timestamp() * 1000)
    ast = {"range": {"ts": {"from": frm, "to": to, "format": "epoch_millis"}}}
    assert ids(frame, ast) == [2, 3]


def test_match_term_equality(frame):
    # Q5: match on not_analyzed field == exact equality
    assert ids(frame, {"match": {"flag": "N"}}) == [1, 4]
    assert ids(frame, {"term": {"flag": "A"}}) == [2]
    assert ids(frame, {"match": {"active": 1}}) == [1, 3]


def test_enum_should_and_terms(frame):
    # Q4: enum multi-select == bool.should of matches (min_should_match 1)
    should = {
        "bool": {
            "should": [{"match": {"flag": "N"}}, {"match": {"flag": "A"}}],
            "minimum_should_match": 1,
        }
    }
    assert ids(frame, should) == [1, 2, 4]
    assert ids(frame, {"terms": {"flag": ["N", "A"]}}) == [1, 2, 4]


def test_phrase_prefix(frame):
    # Q6: case-insensitive phrase with last-word prefix over .split tokens
    assert ids(frame, {"match_phrase_prefix": {"descr.split": "promo bur"}}) == [1]
    assert ids(frame, {"match_phrase_prefix": {"descr.split": "PROMO"}}) == [1, 3]
    # mid-phrase token match must anchor on token boundary: 'ROMO' != prefix
    assert ids(frame, {"match_phrase_prefix": {"descr.split": "romo"}}) == []
    # .split routing via plain match on a .split field
    assert ids(frame, {"match": {"descr.split": "standard pol"}}) == [2]


def test_query_string_forms(frame):
    # Q7: the reference's two shapes stay on their fast paths...
    assert ids(frame, {"query_string": {"query": "*"}}) == [1, 2, 3, 4]
    assert ids(frame, {"query_string": {"query": "descr:*"}}) == [1, 2, 3]
    # ...anything else routes through the full Lucene parser (round 4):
    # a bare term still errors without fields to bind to
    with pytest.raises(QueryCompileError, match="default_fields"):
        compile_query({"query_string": {"query": "descr:foo AND bar"}})
    # and works with default_field / fields supplied
    assert ids(frame, {"query_string": {
        "query": "descr:foo AND bar", "default_field": "descr"}}) == []
    got = ids(frame, {"query_string": {
        "query": "qty:[20 TO 30] OR flag:N", "fields": ["descr"]}})
    assert got == [1, 3, 4]


def test_bool_must_composition(frame):
    ast = {
        "bool": {
            "must": [
                {"range": {"qty": {"gte": 10}}},
                {"terms": {"flag": ["A", "R"]}},
            ]
        }
    }
    assert ids(frame, ast) == [2, 3]


def test_bool_must_not_and_filter(frame):
    ast = {
        "bool": {
            "filter": [{"range": {"qty": {"gte": 10}}}],
            "must_not": [{"match": {"flag": "R"}}],
        }
    }
    assert ids(frame, ast) == [2, 4]


def test_nested_bool(frame):
    ast = {
        "bool": {
            "must": [
                {
                    "bool": {
                        "should": [
                            {"match": {"flag": "N"}},
                            {"match": {"flag": "R"}},
                        ]
                    }
                },
                {"range": {"qty": {"lte": 25}}},
            ]
        }
    }
    assert ids(frame, ast) == [1, 3]


def test_unknown_kind_raises():
    with pytest.raises(QueryCompileError):
        compile_query({"span_near": {"f": "x"}})
    with pytest.raises(QueryCompileError):
        compile_query({"a": 1, "b": 2})


def test_display_text_mirror():
    # collections.js:209-257 parity shapes
    assert display_text(None) == "*"
    assert display_text({"match_all": {}}) == "*"
    assert display_text({"range": {"qty": {"gte": 5, "lte": 10}}}) == (
        "qty:>=5 AND qty:<=10"
    )
    assert display_text({"match": {"flag": "N"}}) == 'flag:"N"'
    assert display_text({"match_phrase_prefix": {"d.split": "pro"}}) == (
        'd.split:"pro*"'
    )
    ast = {
        "bool": {
            "must": [{"range": {"qty": {"gte": 5}}}],
            "should": [{"match": {"flag": "N"}}, {"match": {"flag": "A"}}],
            "must_not": [{"match": {"active": 1}}],
        }
    }
    assert display_text(ast) == (
        'qty:>=5 AND (flag:"N" OR flag:"A") AND NOT active:"1"'
    )


def test_fuzzy_query(frame):
    # AUTO ladder: "PROMP" (5 chars) allows 1 edit -> no descr field match;
    # term-level on flag: "M" vs N/A/R is 1 edit but AUTO(1 char)=0 edits
    assert ids(frame, {"fuzzy": {"flag": "M"}}) == []
    assert ids(frame, {"fuzzy": {"flag": {"value": "M", "fuzziness": 1}}}) == [
        1, 2, 3, 4
    ]
    assert ids(frame, {"fuzzy": {"descr": {
        "value": "PROMO ANODIZED TIM", "fuzziness": 2}}}) == [3]


def test_wildcard_query(frame):
    assert ids(frame, {"wildcard": {"descr": "PROMO*"}}) == [1, 3]
    assert ids(frame, {"wildcard": {"descr": "*POLISHED*"}}) == [2]
    # ? = exactly one char; whole-term anchoring
    assert ids(frame, {"wildcard": {"flag": "?"}}) == [1, 2, 3, 4]
    assert ids(frame, {"wildcard": {"descr": "PROMO"}}) == []
    # regex metachars in the pattern are literal text, not operators
    assert ids(frame, {"wildcard": {"descr": "PRO.O*"}}) == []


def test_regexp_prefix_exists(frame):
    assert ids(frame, {"regexp": {"flag": "N|R"}}) == [1, 3, 4]
    # ES regexp is whole-term anchored: fragment without .* matches nothing
    assert ids(frame, {"regexp": {"descr": "PROMO"}}) == []
    assert ids(frame, {"prefix": {"descr": "PROMO"}}) == [1, 3]
    assert ids(frame, {"exists": {"field": "descr"}}) == [1, 2, 3]


def test_match_phrase(frame):
    # full-token contiguous match, case-insensitive under .split semantics
    assert ids(frame, {"match_phrase": {"descr.split": "promo burnished"}}) == [1]
    # prefix of a token is NOT a phrase match (unlike match_phrase_prefix)
    assert ids(frame, {"match_phrase": {"descr.split": "promo burn"}}) == []
    assert ids(frame, {"match_phrase_prefix": {"descr.split": "promo burn"}}) == [1]


def test_display_text_term_level():
    assert display_text({"fuzzy": {"f": {"value": "x", "fuzziness": 1}}}) == "f:x~1"
    assert display_text({"wildcard": {"f": "ab*"}}) == "f:ab*"
    assert display_text({"regexp": {"f": "a|b"}}) == "f:/a|b/"
    assert display_text({"prefix": {"f": "ab"}}) == "f:ab*"
    assert display_text({"exists": {"field": "f"}}) == "_exists_:f"
    assert display_text({"match_phrase": {"f": "a b"}}) == 'f:"a b"'


def test_multi_match(frame):
    ast = {"multi_match": {"query": "N", "fields": ["flag", "descr"]}}
    assert ids(frame, ast) == [1, 4]
    # .split fields route through phrase-prefix analysis
    ast = {"multi_match": {"query": "promo", "fields": ["flag", "descr.split"]}}
    assert ids(frame, ast) == [1, 3]
    with pytest.raises(QueryCompileError):
        compile_query({"multi_match": {"query": "x", "fields": []}})
    assert display_text(
        {"multi_match": {"query": "x", "fields": ["a", "b"]}}
    ) == '(a:"x" OR b:"x")'


def test_percolate(spark, frame):
    from harmonize_search_analyze_spark.plans.compiler import percolate

    stored = {
        "cheap": {"range": {"qty": {"lte": 15}}},
        "promo": {"prefix": {"descr": "PROMO"}},
        "none": {"match": {"flag": "Z"}},
    }
    got = sorted(
        (r["id"], r["query_id"])
        for r in percolate(frame, stored, ["id"]).collect()
    )
    assert got == [
        (1, "cheap"), (1, "promo"), (2, "cheap"), (3, "promo")
    ]


def test_terms_set_split_field(frame):
    # descr tokens; >=2 of {promo, brass, tin} as full tokens
    ast = {
        "terms_set": {
            "descr.split": {
                "terms": ["promo", "anodized", "tin"],
                "minimum_should_match": 2,
            }
        }
    }
    assert ids(frame, ast) == [3]  # PROMO ANODIZED TIN matches all three
    ast["terms_set"]["descr.split"]["minimum_should_match"] = 1
    assert ids(frame, ast) == [1, 3]


def test_terms_set_exact_field_and_errors(frame):
    # exact field: a scalar matches at most one term -> msm=1 works,
    # msm=2 can never match (ES behavior for non-array keyword fields)
    ast = {"terms_set": {"flag": {"terms": ["N", "R"],
                                  "minimum_should_match": 1}}}
    assert ids(frame, ast) == [1, 3, 4]
    ast["terms_set"]["flag"]["minimum_should_match"] = 2
    assert ids(frame, ast) == []
    with pytest.raises(QueryCompileError):
        compile_query({"terms_set": {"flag": {"terms": []}}})


def test_ids_query(frame):
    assert ids(frame, {"ids": {"field": "id", "values": [2, 4, 99]}}) == [2, 4]
    # no values matches nothing, per ES
    assert ids(frame, {"ids": {"field": "id", "values": []}}) == []


def test_dis_max_filter_context(frame):
    ast = {"dis_max": {"queries": [
        {"term": {"flag": "R"}},
        {"range": {"qty": {"gte": 30}}},
    ], "tie_breaker": 0.3}}
    assert ids(frame, ast) == [3, 4]
    with pytest.raises(QueryCompileError):
        compile_query({"dis_max": {"queries": []}})


def test_boosting_filter_context(frame):
    # match set is the positive clause's; negative only demotes scores
    ast = {"boosting": {
        "positive": {"range": {"qty": {"gte": 10}}},
        "negative": {"term": {"flag": "R"}},
        "negative_boost": 0.5,
    }}
    assert ids(frame, ast) == [2, 3, 4]
    with pytest.raises(QueryCompileError):
        compile_query({"boosting": {"negative": {"term": {"flag": "R"}}}})


def test_geo_bounding_box_and_distance(spark):
    pts = spark.createDataFrame(
        [
            (1, 10.0, 10.0),     # inside box, ~1565km from origin
            (2, 70.0, 10.0),     # above the box
            (3, 10.0, 150.0),    # east of the box
            (4, -50.0, -100.0),  # inside box, far from origin
        ],
        ["id", "lat", "lon"],
    )
    box = {"geo_bounding_box": {
        "top_left": {"lat": 60.0, "lon": -120.0},
        "bottom_right": {"lat": -60.0, "lon": 120.0},
    }}
    assert ids(pts, box) == [1, 4]
    near = {"geo_distance": {"distance": "2000km",
                             "origin": {"lat": 0.0, "lon": 0.0}}}
    assert ids(pts, near) == [1]
    # antimeridian-crossing box (west edge east of east edge) wraps
    wrap = {"geo_bounding_box": {
        "top_left": {"lat": 60.0, "lon": 140.0},
        "bottom_right": {"lat": -60.0, "lon": -140.0},
    }}
    assert ids(pts, wrap) == [3]
    # custom column names via the fields spec
    pts2 = pts.withColumnRenamed("lat", "y").withColumnRenamed("lon", "x")
    custom = {"geo_distance": {"distance": 2000000, "fields": {"lat": "y", "lon": "x"},
                               "origin": {"lat": 0.0, "lon": 0.0}}}
    assert sorted(r["id"] for r in pts2.where(compile_query(custom)).collect()) == [1]


def test_simple_query_string(frame):
    q = {"simple_query_string": {
        "query": 'promo -anodized burn*', "fields": ["descr.split"],
        "default_operator": "and",
    }}
    # AND: promo AND burn*-prefix, NOT anodized -> only row 1
    assert ids(frame, q) == [1]
    q_or = {"simple_query_string": {
        "query": 'polished "anodized tin"', "fields": ["descr.split"],
    }}
    # OR (default): polished OR the phrase -> rows 2, 3
    assert ids(frame, q_or) == [2, 3]
    # prohibit applies even under OR; empty positives match everything
    q_neg = {"simple_query_string": {
        "query": "-promo", "fields": ["descr.split"]}}
    assert ids(frame, q_neg) == [2, 4]  # NULL descr doesn't contain promo


def test_simple_query_string_requires_fields(frame):
    with pytest.raises(QueryCompileError):
        compile_query({"simple_query_string": {"query": "x"}})


def test_match_bool_prefix(frame):
    # terms anywhere (not consecutive) + last as prefix: "copper prom"
    # matches row 1 even though copper follows promo in the text
    q = {"match_bool_prefix": {
        "descr.split": {"query": "copper prom", "operator": "and"}}}
    assert ids(frame, q) == [1]
    # default operator is OR (ES builds should clauses)
    q_or = {"match_bool_prefix": {"descr.split": "copper stand"}}
    assert ids(frame, q_or) == [1, 2]


def test_combined_fields(frame):
    # term-centric: each term may come from a DIFFERENT field
    q = {"combined_fields": {
        "query": "n promo", "fields": ["flag.split", "descr.split"],
        "operator": "and",
    }}
    # 'n' matches flag=N (rows 1,4); 'promo' matches descr rows 1,3 -> AND = 1
    assert ids(frame, q) == [1]
    with pytest.raises(QueryCompileError):
        compile_query({"combined_fields": {"query": "x"}})


def test_intervals_query(spark):
    rows = [
        (1, "alpha beta gamma"),
        (2, "alpha xxx yyy beta"),
        (3, "beta alpha"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])

    def got(rule):
        return sorted(r["id"] for r in df.where(
            compile_query({"intervals": {"text.split": rule}})).collect())

    # ordered adjacency
    assert got({"match": {"query": "alpha beta",
                          "ordered": True, "max_gaps": 0}}) == [1]
    # unordered adjacency picks up the reversed pair
    assert got({"match": {"query": "alpha beta",
                          "ordered": False, "max_gaps": 0}}) == [1, 3]
    # unbounded gaps (ES default) = ordered co-occurrence
    assert got({"match": {"query": "alpha beta", "ordered": True}}) == [1, 2]
    # single term degenerates to presence
    assert got({"match": {"query": "gamma"}}) == [1]
    # any_of / all_of composition
    assert got({"any_of": {"intervals": [
        {"match": {"query": "gamma"}},
        {"match": {"query": "yyy"}}]}}) == [1, 2]
    assert got({"all_of": {"intervals": [
        {"match": {"query": "alpha"}},
        {"match": {"query": "gamma"}}]}}) == [1]


def test_intervals_validation(spark):
    with pytest.raises(QueryCompileError):
        compile_query({"intervals": {"text": {
            "match": {"query": "a b c d"}}}})  # > 3 terms
    with pytest.raises(QueryCompileError):
        compile_query({"intervals": {"text": {"bogus_rule": {}}}})
    with pytest.raises(QueryCompileError):
        compile_query({"intervals": {"text": {
            "all_of": {"ordered": True, "intervals": [
                {"match": {"query": "a"}}, {"match": {"query": "b"}}]}}}})


def test_nested_query_per_object_correlation(spark):
    from pyspark.sql import functions as F

    # customer 1: order (F, 100) and (O, 900) — flattened fields would
    # match "status F AND total > 500", nested semantics must NOT
    rows = [
        (1, [("F", 100.0), ("O", 900.0)]),
        (2, [("F", 700.0)]),
        (3, []),
        (4, None),
    ]
    df = spark.createDataFrame(
        rows, "id long, orders array<struct<status string, total double>>"
    )
    ast = {"nested": {"path": "orders", "query": {"bool": {"must": [
        {"term": {"orders.status": "F"}},
        {"range": {"orders.total": {"gt": 500.0}}},
    ]}}}}
    got = sorted(r["id"] for r in df.where(compile_query(ast)).collect())
    assert got == [2]  # the correlation test
    # single-clause forms
    assert sorted(r["id"] for r in df.where(compile_query(
        {"nested": {"path": "orders",
                    "query": {"term": {"orders.status": "O"}}}})).collect()) == [1]
    assert sorted(r["id"] for r in df.where(compile_query(
        {"nested": {"path": "orders",
                    "query": {"terms": {"orders.status": ["F", "O"]}}}}
    )).collect()) == [1, 2]


def test_nested_query_validation(spark):
    with pytest.raises(QueryCompileError):
        compile_query({"nested": {"query": {"term": {"x.y": 1}}}})
    with pytest.raises(QueryCompileError):
        compile_query({"nested": {"path": "p"}})
    with pytest.raises(QueryCompileError):
        compile_query({"nested": {"path": "p",
                                  "query": {"term": {"wrong.f": 1}}}})
    with pytest.raises(QueryCompileError):
        compile_query({"nested": {"path": "p",
                                  "query": {"term": {"p.f": "a'b"}}}})


def test_geo_polygon_crossing_number(spark):
    pts = spark.createDataFrame(
        [
            (1, 0.0, 0.0),      # centroid — inside
            (2, 0.0, 200.0),    # way east — outside
            (3, 5.0, 4.9),      # inside near the diagonal edge
            (4, 5.0, 5.1),      # just across the diagonal — outside
            (5, -1.0, 0.0),     # below the square — outside
        ],
        ["id", "lat", "lon"],
    )
    # right triangle (0,0)-(10,0)-(0,10): inside iff lat>0, lon>0, lat+lon<10
    tri = {"geo_polygon": {"points": [
        {"lat": 0.0, "lon": 0.0},
        {"lat": 10.0, "lon": 0.0},
        {"lat": 0.0, "lon": 10.0},
    ]}}
    got = sorted(r["id"] for r in pts.where(compile_query(tri)).collect())
    # the half-open edge rule counts the (0,0) vertex as inside (one
    # upward-edge crossing); (5,4.9) inside; (5,5.1) just across — out
    assert got == [1, 3]
    with pytest.raises(QueryCompileError):
        compile_query({"geo_polygon": {"points": [
            {"lat": 0.0, "lon": 0.0}, {"lat": 1.0, "lon": 1.0}]}})


def test_runtime_mappings_basic(spark):
    """ES runtime_mappings: derived fields usable by predicates and
    pruned from the plan when unused."""
    import pytest as _pytest

    from harmonize_search_analyze_spark.plans.compiler import (
        QueryCompileError,
        apply_runtime_mappings,
        compile_query,
    )

    df = spark.createDataFrame(
        [(1, 150000.0), (2, 50000.0), (3, 250000.0)], ["k", "price"]
    )
    rt = apply_runtime_mappings(
        df,
        {
            "band": {
                "type": "keyword",
                "script": "CASE WHEN price >= 200000 THEN 'high' "
                "WHEN price >= 100000 THEN 'mid' ELSE 'low' END",
            },
            "double_price": {"type": "double", "script": {"source": "price * 2"}},
        },
    )
    got = {r["k"]: r["band"]
           for r in rt.where(compile_query({"terms": {"band": ["mid", "high"]}}))
           .collect()}
    assert got == {1: "mid", 3: "high"}
    with _pytest.raises(QueryCompileError):
        apply_runtime_mappings(df, {"x": {"type": "geo_shape", "script": "1"}})
    with _pytest.raises(QueryCompileError):
        apply_runtime_mappings(df, {"x": {"type": "long"}})


def test_span_queries(spark):
    """Lucene span_first / span_near semantics over the pinned
    tokenization, including the unordered variant and the DuckDB twin."""
    import duckdb

    from harmonize_search_analyze_spark.functions.intervals import (
        span_first_sql,
        span_near_sql,
    )

    rows = [
        (1, "spark runs the query"),            # spark at pos 1
        (2, "the big engine is spark here"),    # spark at pos 5
        (3, "the big engine is not spark yet"), # spark at pos 6
        (4, "fast shiny table"),                # fast..table gap 1
        (5, "fast very shiny table"),           # gap 2
        (6, "table fast"),                      # wrong order
        (7, None),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])

    first = compile_query(
        {"span_first": {"match": {"span_term": {"text.split": "spark"}},
                        "end": 5}}
    )
    assert {r.id for r in df.where(first).collect()} == {1, 2}

    near = compile_query(
        {"span_near": {"clauses": [
            {"span_term": {"text.split": "fast"}},
            {"span_term": {"text.split": "table"}},
        ], "slop": 1, "in_order": True}}
    )
    assert {r.id for r in df.where(near).collect()} == {4}

    anyorder = compile_query(
        {"span_near": {"clauses": [
            {"span_term": {"text.split": "fast"}},
            {"span_term": {"text.split": "table"}},
        ], "slop": 1, "in_order": False}}
    )
    assert {r.id for r in df.where(anyorder).collect()} == {4, 6}

    # DuckDB twin produces the identical match set
    con = duckdb.connect()
    con.sql("CREATE TABLE t(id INT, text VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", [(i, s) for i, s in rows]
    )
    f = span_first_sql("text", "spark", 5, "duckdb")
    n = span_near_sql("text", ["fast", "table"], "duckdb",
                      slop=1, in_order=True)
    assert {r[0] for r in con.sql(f"SELECT id FROM t WHERE {f}").fetchall()} \
        == {1, 2}
    assert {r[0] for r in con.sql(f"SELECT id FROM t WHERE {n}").fetchall()} \
        == {4}

    import pytest as _pytest
    with _pytest.raises(QueryCompileError):
        compile_query({"span_near": {"clauses": [
            {"span_term": {"a.split": "x"}},
            {"span_term": {"b.split": "y"}},
        ]}})
    with _pytest.raises(QueryCompileError):
        compile_query({"span_near": {"clauses": [{"term": {"a": "x"}}]}})
    with _pytest.raises(QueryCompileError):
        compile_query({"span_first": {"end": 3}})


def test_script_query(spark):
    """ES script query: SQL boolean in-plan; missing source rejected."""
    import pytest as _pytest

    df = spark.createDataFrame([(1, 5), (2, 50)], ["id", "v"])
    pred = compile_query({"script": {"script": {"source": "v * 2 > 50"}}})
    assert [r.id for r in df.where(pred).collect()] == [2]
    with _pytest.raises(QueryCompileError):
        compile_query({"script": {"script": {}}})


def test_span_malformed_clauses_raise_compile_errors(spark):
    """Review findings: non-alnum span_term values must NOT compile to
    match-all; malformed span_term bodies raise QueryCompileError, never
    raw ValueError/KeyError."""
    import pytest as _pytest

    with _pytest.raises(QueryCompileError):
        compile_query({"span_near": {"clauses": [
            {"span_term": {"text.split": "!!!"}}]}})
    with _pytest.raises(QueryCompileError):
        compile_query({"span_near": {"clauses": [
            {"span_term": {"text.split": "two words"}}]}})
    with _pytest.raises(QueryCompileError):
        compile_query({"span_near": {"clauses": [
            {"span_term": {"a.split": "x", "b.split": "y"}}]}})
    with _pytest.raises(QueryCompileError):
        compile_query({"span_first": {
            "match": {"span_term": {"text.split": {"boost": 2}}},
            "end": 3}})


def test_geo_shape_polygon_with_hole(spark):
    """Even-odd over rings: inside exterior = hit; inside the hole =
    excluded; disjoint is the exact complement; GeoJSON lon,lat order;
    validation."""
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, 5.0, 0.0),     # inside the hole -> excluded
         (2, 40.0, 0.0),    # inside exterior, outside hole -> hit
         (3, 80.0, 0.0),    # outside everything
         (4, 10.0, 50.0)],  # inside exterior, east of hole -> hit
        ["id", "lat", "lon"],
    )
    shape = {
        "type": "polygon",
        "coordinates": [
            [[-100.0, 50.0], [0.0, 60.0], [100.0, 50.0],
             [60.0, -20.0], [0.0, -40.0], [-60.0, -20.0]],
            [[-30.0, 25.0], [30.0, 25.0], [30.0, -5.0], [-30.0, -5.0]],
        ],
    }
    hit = compile_query({"geo_shape": {"shape": shape}})
    assert {r.id for r in df.where(hit).collect()} == {2, 4}
    out = compile_query({"geo_shape": {"shape": shape,
                                       "relation": "disjoint"}})
    assert {r.id for r in df.where(out).collect()} == {1, 3}

    with _pytest.raises(QueryCompileError):
        compile_query({"geo_shape": {"shape": {"type": "circle"}}})
    with _pytest.raises(QueryCompileError):
        compile_query({"geo_shape": {"shape": shape,
                                     "relation": "contains"}})


def test_msearch_one_scan(spark):
    """_msearch: per-search counts + top-k hits from one scan; pinned
    ties; searches with zero hits produce no rows (ES: empty hits)."""
    from harmonize_search_analyze_spark.plans.compiler import msearch

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 30.0), (3, "b", 20.0), (4, "a", 30.0)],
        ["id", "cat", "price"],
    )
    out = msearch(
        df,
        {
            "all_a": {"match": {"cat": "a"}},
            "pricey": {"range": {"price": {"gte": 15}}},
            "none": {"range": {"price": {"gte": 999}}},
        },
        sort_field="price",
        id_col="id",
        k=2,
    ).collect()
    got = [(r.query_name, r.doc_count, r.hit_rank, r.id) for r in out]
    assert got == [
        ("all_a", 3, 1, 2),   # 30.0, id 2 < id 4 tie-break
        ("all_a", 3, 2, 4),
        ("pricey", 3, 1, 2),
        ("pricey", 3, 2, 4),
    ]


def test_span_not_window_exclusion(spark):
    """span_not: include term kept only where the pre/post window has no
    exclude occurrence; pre/post default 0 degenerates to presence."""
    from harmonize_search_analyze_spark.plans.compiler import compile_query

    df = spark.createDataFrame(
        [(1, "big apple pie"), (2, "small apple tart"),
         (3, "apple big apple"), (4, "no fruit here")],
        ["id", "text"],
    )
    q = {"span_not": {
        "include": {"span_term": {"text": "apple"}},
        "exclude": {"span_term": {"text": "big"}},
        "pre": 1,
    }}
    got = {r.id for r in df.where(compile_query(q)).collect()}
    # doc 1: only apple is right after big -> excluded; doc 3 has a
    # second apple NOT preceded by big (position 3 window [2,3] has
    # 'big' at 2!) -> pos1 apple window [0,1]: no big -> keeps
    assert got == {2, 3}
    # default pre/post: presence of include suffices
    q0 = {"span_not": {
        "include": {"span_term": {"text": "apple"}},
        "exclude": {"span_term": {"text": "big"}},
    }}
    assert {r.id for r in df.where(compile_query(q0)).collect()} == {1, 2, 3}


def test_match_phrase_slop(spark):
    """match_phrase slop>0 routes through the intervals machinery:
    ordered terms within slop total gaps."""
    from harmonize_search_analyze_spark.plans.compiler import compile_query

    df = spark.createDataFrame(
        [(1, "quick brown fox"), (2, "quick red brown fox"),
         (3, "quick very red brown fox"), (4, "fox quick")],
        ["id", "text"],
    )
    exact = {"match_phrase": {"text": "quick brown"}}
    assert {r.id for r in df.where(compile_query(exact)).collect()} == {1}
    sloppy = {"match_phrase": {"text": {"query": "quick brown", "slop": 1}}}
    assert {r.id for r in df.where(compile_query(sloppy)).collect()} == {1, 2}
    sloppy2 = {"match_phrase": {"text": {"query": "quick brown", "slop": 2}}}
    assert {r.id for r in
            df.where(compile_query(sloppy2)).collect()} == {1, 2, 3}


def test_span_or_and_slop_error_contract(spark):
    """Review findings: span_or validates terms/fields like its span
    siblings; match_phrase slop failures surface as QueryCompileError."""
    from harmonize_search_analyze_spark.plans.compiler import (
        QueryCompileError,
        compile_query,
    )

    df = spark.createDataFrame(
        [(1, "red fox"), (2, "blue bird"), (3, "no match")], ["id", "text"]
    )
    q = {"span_or": {"clauses": [
        {"span_term": {"text": "fox"}}, {"span_term": {"text": "bird"}},
    ]}}
    assert {r.id for r in df.where(compile_query(q)).collect()} == {1, 2}
    with pytest.raises(QueryCompileError, match="alnum"):
        compile_query({"span_or": {"clauses": [
            {"span_term": {"text": "!!!"}}]}})
    with pytest.raises(QueryCompileError, match="share one field"):
        compile_query({"span_or": {"clauses": [
            {"span_term": {"text": "a"}}, {"span_term": {"other": "b"}}]}})
    with pytest.raises(QueryCompileError, match="query"):
        compile_query({"match_phrase": {"text": {"slop": 1}}})
    with pytest.raises(QueryCompileError):
        compile_query({"match_phrase": {"text": {"query": "a b c d",
                                                 "slop": 1}}})


def test_constant_score_match_none_wrapper(spark):
    """Wrapper-family queries: constant_score unwraps its filter,
    match_none matches nothing, wrapper decodes base64 DSL."""
    import base64
    import json

    from harmonize_search_analyze_spark.plans.compiler import (
        QueryCompileError,
        compile_query,
    )

    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    cs = {"constant_score": {"filter": {"match": {"v": "a"}}, "boost": 2}}
    assert [r.id for r in df.where(compile_query(cs)).collect()] == [1]
    assert df.where(compile_query({"match_none": {}})).count() == 0
    wrapped = base64.b64encode(
        json.dumps({"match": {"v": "b"}}).encode()
    ).decode()
    assert [r.id for r in df.where(
        compile_query({"wrapper": {"query": wrapped}})).collect()] == [2]
    with pytest.raises(QueryCompileError, match="decode"):
        compile_query({"wrapper": {"query": "!!notb64!!"}})
    with pytest.raises(QueryCompileError, match="filter"):
        compile_query({"constant_score": {}})


def test_validate_query_api(spark):
    from harmonize_search_analyze_spark.plans.compiler import validate_query

    ok, err = validate_query({"match_all": {}})
    assert ok and err is None
    ok, err = validate_query({"nope_query": {}})
    assert not ok and "nope_query" in err
    ok, err = validate_query({"constant_score": {}})
    assert not ok and "filter" in err


def test_terms_lookup_rejected_without_catalog(spark):
    from harmonize_search_analyze_spark.plans.compiler import (
        QueryCompileError,
        compile_query,
        validate_query,
    )

    with pytest.raises(QueryCompileError, match="compile_with_lookups"):
        compile_query({"terms": {"f": {"index": "x", "id": 1,
                                       "path": "p"}}})
    ok, err = validate_query({"range": {}})
    assert not ok and "ValueError" in err
