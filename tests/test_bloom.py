"""Bloom-prefiltered incremental dedup: exact-equivalence to the anti
join (no false negatives by construction), measured false-positive rate
near theory, map-side probe plan, and word-table merge."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from harmonize_search_analyze_spark.operators.bloom import (
    bloom_build,
    bloom_dedup,
    bloom_flag_maybe,
    bloom_m_for,
    bloom_merge,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(f"doc-{i}",) for i in range(1000)], ["key"]
    )


@pytest.fixture(scope="module")
def batch(spark):
    # 500 overlap the corpus, 1500 are new
    return spark.createDataFrame(
        [(f"doc-{i}", i) for i in range(500, 2500)], ["key", "payload"]
    )


def test_bloom_dedup_equals_anti_join(corpus, batch):
    got = sorted(r.key for r in bloom_dedup(
        corpus, batch, "key", m_bits=1 << 14).collect())
    want = sorted(
        r.key for r in batch.join(corpus, "key", "left_anti").collect()
    )
    assert got == want
    assert len(got) == 1500


def test_no_false_negatives_and_low_fp(corpus, batch):
    words = bloom_build(corpus, "key", m_bits=1 << 14)
    flagged = bloom_flag_maybe(batch, words, "key", m_bits=1 << 14)
    rows = flagged.collect()
    present = {r.key for r in rows if r["__bloom_maybe"]}
    # every true duplicate flagged (no false negatives — the exactness
    # guarantee the verify stage depends on)
    for i in range(500, 1000):
        assert f"doc-{i}" in present
    # false positives among the 1500 new keys stay near the theoretical
    # ~0.13% for n=1000, m=16384, k=5 (generous 10x headroom)
    fp = sum(1 for r in rows if r["__bloom_maybe"] and int(r.payload) >= 1000)
    assert fp / 1500 < 0.013, fp


def test_probe_is_map_side_no_shuffle(corpus, batch):
    words = bloom_build(corpus, "key", m_bits=1 << 14)
    words = words.cache()
    words.count()
    flagged = bloom_flag_maybe(batch, words, "key", m_bits=1 << 14)
    flagged.count()
    plan = flagged._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    # the batch side must reach the flag without a single exchange of its
    # own rows: all k probes are broadcast joins; the only shuffle allowed
    # is the word-table build (hashpartitioning on word_idx, metadata-sized)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "hashpartitioning(key" not in plan, plan
    words.unpersist()


def test_word_table_is_metadata_sized(corpus):
    words = bloom_build(corpus, "key", m_bits=1 << 14)
    assert words.count() <= (1 << 14) // 64


def test_bloom_merge_unions_key_sets(spark):
    a = spark.createDataFrame([("a",), ("b",)], ["key"])
    b = spark.createDataFrame([("c",), ("d",)], ["key"])
    merged = bloom_merge(
        bloom_build(a, "key", m_bits=4096), bloom_build(b, "key", m_bits=4096)
    )
    probe = spark.createDataFrame(
        [("a",), ("c",), ("zzz",)], ["key"]
    )
    got = {r.key: r["__bloom_maybe"] for r in bloom_flag_maybe(
        probe, merged, "key", m_bits=4096).collect()}
    assert got["a"] and got["c"]
    assert not got["zzz"]  # overwhelmingly likely at this m/n


def test_sizing_and_validation(corpus):
    m = bloom_m_for(1_000_000, 0.01)
    assert m % 64 == 0 and 9_000_000 < m < 10_000_000
    with pytest.raises(ValueError):
        bloom_m_for(0)
    with pytest.raises(ValueError):
        bloom_m_for(10, 1.5)
    with pytest.raises(ValueError):
        bloom_build(corpus, "key", m_bits=32)
    with pytest.raises(ValueError):
        bloom_build(corpus, "key", k=0)


def test_batch_internal_duplicates_kept(spark, corpus):
    batch = spark.createDataFrame(
        [("new-x", 1), ("new-x", 2)], ["key", "payload"]
    )
    got = bloom_dedup(corpus, batch, "key", m_bits=4096).collect()
    assert len(got) == 2  # documented contract: batch-internal dups kept


def test_null_keyed_batch_rows_survive(spark, corpus):
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("key", T.StringType()),
        T.StructField("payload", T.LongType()),
    ])
    batch = spark.createDataFrame(
        [(None, 1), ("doc-1", 2), ("brand-new", 3)], schema
    )
    got = sorted(
        (r.payload,) for r in bloom_dedup(
            corpus, batch, "key", m_bits=4096).collect()
    )
    # NULL key never matches the corpus (anti-join semantics) -> kept;
    # doc-1 is a true duplicate -> dropped; brand-new kept
    assert got == [(1,), (3,)]
