#!/usr/bin/env python
"""Experiment: does the codegen class cache (default 100 entries) evict
under the bench's stage volume, making every stage pay a ~100-200ms janino
compile? Times a representative query set under configurable extra confs.

Usage: python scripts/exp_codegen_cache.py '{"spark.sql.codegen.cache.maxEntries": "10000"}' q1 q2 ...
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from harmonize_search_analyze_spark.session import DEFAULT_CPUS

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    extra = json.loads(sys.argv[1])
    names = sys.argv[2:]
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.appName("exp")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.shuffle.partitions", str(DEFAULT_CPUS))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .master(f"local[{DEFAULT_CPUS}]")
    )
    for k, v in extra.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for t in ("lineitem", "orders", "customer", "part", "events",
              "documents", "embeddings", "nation", "supplier", "region"):
        try:
            entrymod._t(spark, SF_DIR, t).limit(1).count()
        except Exception:
            pass

    def _warm(batches):
        import numpy  # noqa: F401
        yield from batches

    spark.range(spark.sparkContext.defaultParallelism * 4) \
        .repartition(spark.sparkContext.defaultParallelism) \
        .mapInPandas(_warm, "id long").count()

    qmap = entrymod.queries()
    warm_dir = "/root/testdata/sf0.001"
    for nm in names:
        try:
            qmap[nm](spark, warm_dir).count()
        except Exception:
            pass
    gc.collect()
    spark.catalog.clearCache()

    total = 0.0
    for nm in names:
        best = None
        for t in range(2):
            t0 = time.perf_counter()
            df = qmap[nm](spark, SF_DIR)
            df.count()
            el = time.perf_counter() - t0
            best = el if best is None or el < best else best
            del df
            gc.collect()
            spark.catalog.clearCache()
        total += best
        print(f"# {best:8.3f}s  {nm}", file=sys.stderr)
    print(json.dumps({"confs": extra, "total": round(total, 3),
                      "n": len(names)}))


if __name__ == "__main__":
    main()
