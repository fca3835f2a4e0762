#!/usr/bin/env python
"""Operator-level (SQL-tab) profile of one query: runs it once at sf0.1 and
prints every plan node's metrics from the UI REST /sql endpoint — the
operator-level view the guide's empirical loop wants (§7.1).

Usage: python scripts/sqltab_profile.py <query_name> [more names...]
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from harmonize_search_analyze_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _api(url: str):
    with urllib.request.urlopen(url, timeout=20) as fh:
        return json.load(fh)


def main() -> None:
    names = sys.argv[1:]
    spark = get_spark(app_name="sqltab")
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

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
        if os.path.isdir(warm_dir):
            try:
                qmap[nm](spark, warm_dir).count()
            except Exception:
                pass
        import gc
        gc.collect()
        spark.catalog.clearCache()

        n_before = len(_api(f"{base}/sql?length=10000"))
        import time
        t0 = time.perf_counter()
        df = qmap[nm](spark, SF_DIR)
        df.count()
        wall = time.perf_counter() - t0
        execs = _api(f"{base}/sql?length=10000")[n_before:]
        print(f"\n#### {nm}: wall {wall:.3f}s, {len(execs)} SQL executions")
        for ex in execs:
            eid = ex["id"]
            det = _api(f"{base}/sql/{eid}?details=true&planDescription=false")
            dur = det.get("duration")
            print(f"-- exec {eid} dur={dur}ms status={det.get('status')}")
            for node in det.get("nodes", []):
                mets = {m["name"]: m["value"] for m in node.get("metrics", [])}
                interesting = {}
                for k, v in mets.items():
                    lk = k.lower()
                    if any(s in lk for s in (
                        "time", "rows", "spill", "size", "build",
                    )):
                        interesting[k] = v
                if interesting:
                    print(f"   [{node['nodeId']:>3}] {node['nodeName'][:45]:45} "
                          + "; ".join(f"{k}={v}" for k, v in
                                      sorted(interesting.items())[:6]))
        del df


if __name__ == "__main__":
    main()
