"""Bucketed-table co-location: equi-joins and aggs on the bucket key must
plan WITHOUT a shuffle exchange on the bucketed sides (the pay-once write
shuffle that replaces a per-query fact-table shuffle at scale)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from harmonize_search_analyze_spark.sources.catalog import Catalog
from harmonize_search_analyze_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("warehouse")
    cat = Catalog(spark)
    li = load_table(spark, SF_DIR, "lineitem")
    orders = load_table(spark, SF_DIR, "orders")
    cat.save_bucketed(li, "li_b", 4, "l_orderkey",
                      sort_by="l_orderkey", path=str(d / "li_b"))
    cat.save_bucketed(orders, "ord_b", 4, "o_orderkey",
                      sort_by="o_orderkey", path=str(d / "ord_b"))
    yield spark.table("li_b"), spark.table("ord_b")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_no_shuffle(spark, bucketed):
    li_b, ord_b = bucketed
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li_b.join(ord_b, li_b.l_orderkey == ord_b.o_orderkey).groupBy(
            "o_orderstatus"
        ).agg(F.count(F.lit(1)).alias("cnt"))
        plan = _plan(joined)
        # co-located: a sort-merge/shuffled-hash join with NO shuffle
        # exchange feeding either scan (only the final agg exchanges)
        join_part = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        # correctness unchanged vs the unbucketed join
        li = load_table(spark, SF_DIR, "lineitem")
        orders = load_table(spark, SF_DIR, "orders")
        expect = {
            (r["o_orderstatus"], r["cnt"])
            for r in li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        got = {(r["o_orderstatus"], r["cnt"]) for r in joined.collect()}
        assert got == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_agg_no_shuffle(spark, bucketed):
    li_b, _ = bucketed
    agg = li_b.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = _plan(agg)
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert agg.count() > 0


def test_corpus_diff_on_bucketed_snapshots_no_shuffle(spark, tmp_path):
    """corpus_diff's 100 TB claim measured: with both corpus versions
    bucketed by the id column, the full outer join co-locates — the
    plan has NO shuffle exchange above the scans (only the bucket-read
    and the tiny final sort)."""
    from harmonize_search_analyze_spark.operators.dedup import corpus_diff
    from harmonize_search_analyze_spark.sources.catalog import Catalog
    from harmonize_search_analyze_spark.sources.tables import load_table

    cat = Catalog(spark)
    docs = load_table(spark, SF_DIR, "documents").where(
        F.col("text").isNotNull()
    )
    old = docs.where(F.col("doc_id") % 10 != 9)
    new = docs.where(F.col("doc_id") % 10 != 0)
    cat.save_bucketed(old, "docs_v1", 4, "doc_id",
                      sort_by="doc_id", path=str(tmp_path / "v1"))
    cat.save_bucketed(new, "docs_v2", 4, "doc_id",
                      sort_by="doc_id", path=str(tmp_path / "v2"))
    try:
        out = corpus_diff(
            spark.table("docs_v1"), spark.table("docs_v2"),
            "doc_id", "text",
        )
        # drop the presentation orderBy: the data path is the digest
        # projection + the co-located join
        join_only = corpus_diff(
            spark.table("docs_v1"), spark.table("docs_v2"),
            "doc_id", "text",
        )._jdf.queryExecution().executedPlan().toString()
        # exactly one Exchange allowed: the final ORDER BY's range
        # repartition; the JOIN itself must read bucket-aligned
        import re

        exchanges = re.findall(r"Exchange (\w+)", join_only)
        assert all("range" in e.lower() for e in exchanges), exchanges
        # and the answer is right
        got = {r.doc_id: r.status for r in out.collect()}
        assert set(got.values()) <= {"added", "removed", "unchanged"}
        assert sum(1 for s in got.values() if s == "added") > 0
        assert sum(1 for s in got.values() if s == "removed") > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS docs_v1")
        spark.sql("DROP TABLE IF EXISTS docs_v2")
