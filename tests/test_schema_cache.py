"""Focused tests for the load_table schema (metadata) cache added in the
round-10 optimization pass: identical schemas/rows on hit, invalidation when
the file is rewritten, and the nanos-timestamp fallback surviving a cached
load."""

from __future__ import annotations

import os
import time

from pyspark.sql import types as T

from harmonize_search_analyze_spark.sources import tables as tables_mod
from harmonize_search_analyze_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_cached_load_identical(spark):
    tables_mod._SCHEMA_CACHE.clear()
    first = load_table(spark, SF_DIR, "lineitem")
    assert len(tables_mod._SCHEMA_CACHE) == 1
    second = load_table(spark, SF_DIR, "lineitem")  # cache hit
    assert second.schema == first.schema
    assert second.count() == first.count()
    # the cached frame is a real scan, not a memoized result
    assert second.where("l_quantity > 25").count() == \
        first.where("l_quantity > 25").count()


def test_events_ts_normalized_on_hit(spark):
    """The nanos/NTZ -> TimestampType normalization must apply on the cached
    path too (the cache stores the RAW file schema)."""
    tables_mod._SCHEMA_CACHE.clear()
    ev1 = load_table(spark, SF_DIR, "events")
    ev2 = load_table(spark, SF_DIR, "events")
    assert isinstance(ev1.schema["ts"].dataType, T.TimestampType)
    assert isinstance(ev2.schema["ts"].dataType, T.TimestampType)
    assert ev1.count() == ev2.count()


def test_rewrite_invalidates(spark, tmp_path):
    tables_mod._SCHEMA_CACHE.clear()
    p = str(tmp_path / "t.parquet")
    spark.range(5).selectExpr("id AS a").coalesce(1).write.parquet(p)
    df1 = load_table(spark, str(tmp_path), "t")
    assert df1.columns == ["a"] and df1.count() == 5
    n_keys = len(tables_mod._SCHEMA_CACHE)
    # rewrite with a DIFFERENT schema; ensure the mtime stamp moves even on
    # coarse-grained filesystems
    time.sleep(0.05)
    import shutil

    shutil.rmtree(p)
    spark.range(7).selectExpr("id AS b", "id * 2 AS c").coalesce(1) \
        .write.parquet(p)
    os.utime(p)
    df2 = load_table(spark, str(tmp_path), "t")
    assert df2.columns == ["b", "c"] and df2.count() == 7
    assert len(tables_mod._SCHEMA_CACHE) > n_keys  # new key, old key stale
