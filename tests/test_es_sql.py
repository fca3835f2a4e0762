"""ES SQL front-end (the fourth grammar): passthrough SQL, double-quoted
identifiers, MATCH/QUERY full-text rewriting through the shared
tokenizer/KQL machinery, SHOW TABLES / DESCRIBE, and error surfaces."""

import pytest

from harmonize_search_analyze_spark.plans.es_sql import (
    ESSQLError,
    run_es_sql,
    translate_full_text,
)
from harmonize_search_analyze_spark.sources.catalog import Catalog


@pytest.fixture()
def cat(spark):
    c = Catalog(spark)
    c.register(
        "articles",
        spark.createDataFrame(
            [
                (1, "spark makes queries fast", "eng", 10.0),
                (2, "slow queries hurt", "eng", 20.0),
                (3, "Fast Spark engine", "fra", 30.0),
                (4, "nothing relevant here", "eng", 40.0),
            ],
            ["id", "title", "lang", "score_v"],
        ),
    )
    return c


def test_passthrough_select(cat):
    got = run_es_sql(
        cat, 'SELECT lang, COUNT(*) AS n FROM articles '
             'GROUP BY lang ORDER BY lang'
    ).collect()
    assert [(r.lang, r.n) for r in got] == [("eng", 3), ("fra", 1)]


def test_double_quoted_identifiers(cat):
    got = run_es_sql(
        cat, 'SELECT "id" FROM "articles" WHERE "score_v" > 25 ORDER BY "id"'
    ).collect()
    assert [r.id for r in got] == [3, 4]


def test_match_or_semantics(cat):
    got = run_es_sql(
        cat, "SELECT id FROM articles WHERE MATCH(title, 'spark slow') "
             "ORDER BY id"
    ).collect()
    assert [r.id for r in got] == [1, 2, 3]  # OR of terms, case-folded


def test_match_and_operator_option(cat):
    got = run_es_sql(
        cat, "SELECT id FROM articles "
             "WHERE MATCH(title, 'fast spark', 'operator=and') ORDER BY id"
    ).collect()
    assert [r.id for r in got] == [1, 3]


def test_match_multi_field_with_boost(cat):
    got = run_es_sql(
        cat, "SELECT id FROM articles "
             "WHERE MATCH('title^2,lang', 'fra') ORDER BY id"
    ).collect()
    assert [r.id for r in got] == [3]


def test_query_lucene_subset(cat):
    got = run_es_sql(
        cat, "SELECT id FROM articles "
             "WHERE QUERY('lang:eng AND NOT title:slow*') ORDER BY id"
    ).collect()
    assert [r.id for r in got] == [1, 4]


def test_match_composes_with_plain_sql(cat):
    got = run_es_sql(
        cat, "SELECT id FROM articles "
             "WHERE MATCH(title, 'queries') AND score_v < 15"
    ).collect()
    assert [r.id for r in got] == [1]


def test_show_tables_and_describe(cat):
    names = [r.name for r in run_es_sql(cat, "SHOW TABLES").collect()]
    assert names == ["articles"]
    desc = {r.column: r.type
            for r in run_es_sql(cat, "DESCRIBE articles").collect()}
    assert desc["id"] == "bigint" and desc["title"] == "string"


def test_score_raises_with_guidance(cat):
    with pytest.raises(ESSQLError, match="bm25_search"):
        run_es_sql(cat, "SELECT SCORE() FROM articles WHERE MATCH(title, 'x')")


def test_quoted_string_with_escaped_quote(cat):
    # '' inside the literal; the MATCH scanner must not treat it as close
    got = run_es_sql(
        cat, "SELECT id FROM articles WHERE MATCH(title, 'spark''s') "
             "ORDER BY id"
    ).collect()
    # tokenizer splits spark + s; OR semantics -> any spark title
    assert [r.id for r in got] == [1, 3]


def test_translate_marker_rewrite_text():
    sql, markers = translate_full_text(
        "SELECT * FROM t WHERE MATCH(a, 'x') OR QUERY('b:y')", ["a", "b"]
    )
    assert "__es_ftq0" in sql and "__es_ftq1" in sql
    assert "MATCH" not in sql and "QUERY(" not in sql
    assert len(markers) == 2


def test_unknown_index_raises(cat):
    with pytest.raises(KeyError):
        run_es_sql(cat, "SELECT * FROM missing_idx")


def test_pivot_clause_passes_through(spark):
    """PIVOT rides Catalyst's native clause through the _sql grammar —
    one hash agg with conditional partials (plan-asserted), never N
    scans of the input."""
    from harmonize_search_analyze_spark.plans.es_sql import run_es_sql
    from harmonize_search_analyze_spark.sources.catalog import Catalog

    cat = Catalog(spark)
    cat.register("t", spark.createDataFrame(
        [("a", "x", 1.0), ("a", "y", 2.0), ("b", "x", 3.0),
         ("a", "x", 4.0)],
        ["k", "p", "v"],
    ))
    out = run_es_sql(cat, """
SELECT * FROM (SELECT k, p, v FROM t)
PIVOT (SUM(v) FOR p IN ('x' AS x, 'y' AS y)) ORDER BY k
""")
    assert [tuple(r) for r in out.collect()] == [
        ("a", 5.0, 2.0), ("b", 3.0, None)
    ]
    plan = out._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert plan.count("HashAggregate") <= 4  # one partial+final agg pair


def test_unpivot_clause_passes_through(spark):
    """UNPIVOT rides Catalyst's native clause (map-only Expand — no
    exchange below the sort)."""
    from harmonize_search_analyze_spark.plans.es_sql import run_es_sql
    from harmonize_search_analyze_spark.sources.catalog import Catalog

    cat = Catalog(spark)
    cat.register("t", spark.createDataFrame(
        [("a", 1.0, 2.0), ("b", 3.0, 4.0)], ["k", "x", "y"]
    ))
    out = run_es_sql(cat, """
SELECT * FROM t UNPIVOT (val FOR metric IN (x, y)) ORDER BY k, metric
""")
    assert [tuple(r) for r in out.collect()] == [
        ("a", "x", 1.0), ("a", "y", 2.0),
        ("b", "x", 3.0), ("b", "y", 4.0),
    ]
    plan = out._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert "Expand" in plan
