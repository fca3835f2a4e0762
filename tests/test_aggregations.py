"""Aggregation-layer unit tests: terms/nested-terms tie-break pinning
(count DESC, key ASC — SURVEY.md §7 risk list), suggest, dashboard fan-out,
and the catalog's wildcard-union semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from harmonize_search_analyze_spark.operators.aggregations import (
    count_metric,
    dashboard,
    geohash_grid,
    nested_terms,
    suggest,
    terms,
    terms_multi,
)
from harmonize_search_analyze_spark.sources.catalog import Catalog


@pytest.fixture(scope="module")
def frame(spark):
    rows = (
        [("a", "x")] * 5 + [("a", "y")] * 3 + [("b", "x")] * 5
        + [("b", "z")] * 2 + [("c", "x")] * 1 + [(None, "x")] * 2
    )
    return spark.createDataFrame(rows, ["k", "j"])


def test_terms_topk_tiebreak(frame):
    # a=8, b=7, c=1; nulls skipped (ES terms behavior)
    got = [(r["k"], r["doc_count"]) for r in terms(frame, "k", k=2).collect()]
    assert got == [("a", 8), ("b", 7)]


def test_terms_equal_counts_key_asc(spark):
    df = spark.createDataFrame(
        [("b",)] * 3 + [("a",)] * 3 + [("c",)] * 3, ["k"]
    )
    got = [r["k"] for r in terms(df, "k", k=3).collect()]
    assert got == ["a", "b", "c"]  # equal counts -> key ASC pinned


def test_count_metric(frame):
    assert count_metric(frame).collect()[0]["doc_count"] == 18
    assert count_metric(frame, F.col("j") == "x").collect()[0]["doc_count"] == 13


def test_terms_multi(frame):
    got = [
        (r["k"], r["j"], r["doc_count"])
        for r in terms_multi(frame, ["k", "j"], k=3).collect()
    ]
    assert got == [("a", "x", 5), ("b", "x", 5), ("a", "y", 3)]


def test_nested_terms_semantics(frame):
    # outer totals: a=8, b=7, c=1 -> outer rank by TOTAL; inner by pair count
    out = nested_terms(frame, "k", "j", outer_k=2, inner_k=1)
    got = [
        (r["k"], r["j"], r["doc_count"], r["outer_count"])
        for r in out.collect()
    ]
    assert got == [("a", "x", 5, 8), ("b", "x", 5, 7)]


def test_nested_terms_inner_k(frame):
    out = nested_terms(frame, "k", "j", outer_k=1, inner_k=5)
    got = [(r["j"], r["doc_count"]) for r in out.collect()]
    assert got == [("x", 5), ("y", 3)]


def test_suggest(frame):
    # suggestions restricted by phrase-prefix on the field itself
    df = frame.where(F.col("k").isNotNull()).withColumn(
        "name", F.concat(F.lit("City "), F.upper("k"))
    )
    got = [r["name"] for r in suggest(df, "name", prefix="city").collect()]
    assert got == ["City A", "City B", "City C"]
    got2 = [r["name"] for r in suggest(df, "name").collect()]
    assert len(got2) == 3


def test_geohash_grid_bucket_count(spark):
    df = spark.createDataFrame(
        [(42.605, -5.603)] * 3 + [(57.649, 10.407)] * 2 + [(None, 1.0)],
        ["lat", "lon"],
    )
    got = [(r["geohash"], r["doc_count"]) for r in
           geohash_grid(df, "lat", "lon", precision=2).collect()]
    assert got == [("ez", 3), ("u4", 2)]  # nulls skipped


def test_dashboard_shared_filter(frame):
    import datetime as dt

    df = frame.withColumn("ts", F.lit(dt.datetime(2024, 6, 1)))
    panels = {
        "total": lambda d: count_metric(d),
        "topk": lambda d: terms(d, "k", k=10),
    }
    out = dashboard(
        df, panels,
        query=F.col("j") == "x",
        time_field="ts",
        time_from=dt.datetime(2024, 1, 1),
        time_to=dt.datetime(2025, 1, 1),
    )
    assert out["total"].collect()[0]["doc_count"] == 13
    got = dict(
        (r["k"], r["doc_count"]) for r in out["topk"].collect()
    )
    assert got == {"a": 5, "b": 5, "c": 1}


# -- catalog wildcard union (U2/Q9) -----------------------------------------

def test_catalog_wildcard_union_missing_columns(spark):
    cat = Catalog(spark)
    balt = spark.createDataFrame([("assault", "knife")], ["descr", "weapon"])
    la = spark.createDataFrame([("theft", 1)], ["descr", "gang_related"])
    cat.register("baltimore_harmonized", balt)
    cat.register("losangeles_harmonized", la)
    cat.register("baltimore_dictionary", balt.select("descr"))
    u = cat.resolve("*_harmonized")
    assert sorted(u.columns) == ["descr", "gang_related", "weapon"]
    rows = {r["descr"]: r for r in u.collect()}
    assert rows["assault"]["gang_related"] is None  # null-padded
    assert rows["theft"]["weapon"] is None
    assert cat.resolve_names("*harmonized*") == [
        "baltimore_harmonized", "losangeles_harmonized"
    ]
    with pytest.raises(KeyError):
        cat.resolve("nope*")


def test_catalog_lifecycle(spark):
    cat = Catalog(spark)
    df = spark.range(1)
    cat.register("a_idx", df)
    cat.register("b_idx", df)
    assert cat.drop("a_*") == ["a_idx"]
    assert cat.names() == ["b_idx"]
    cat.register("b_idx", df.withColumn("x", F.lit(1)))  # replace is idempotent
    assert cat.resolve("b_idx").columns == ["id", "x"]


def test_terms_salted_equals_terms(frame):
    from harmonize_search_analyze_spark.operators.aggregations import (
        terms_salted,
    )

    plain = [(r["k"], r["doc_count"]) for r in terms(frame, "k", k=5).collect()]
    salted = [(r["k"], r["doc_count"])
              for r in terms_salted(frame, "k", k=5, salt=8).collect()]
    assert salted == plain


def test_catalog_schema_ddl(spark):
    cat = Catalog(spark)
    cat.drop_schema("t_e2e_schema")
    cat.create_schema("t_e2e_schema", comment="incident datasets")
    assert spark.catalog.databaseExists("t_e2e_schema")
    cat.drop_schema("t_e2e_schema")
    assert not spark.catalog.databaseExists("t_e2e_schema")
