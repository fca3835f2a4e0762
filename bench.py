#!/usr/bin/env python
"""Headline-query benchmark.

Runs the engine's flagship queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed to full materialization (count of the result), after a
JVM/session warmup query so we measure the plans, not session startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from harmonize_search_analyze_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: touch every table once (schema resolution + JIT)
    for t in ("lineitem", "orders", "customer", "part", "events",
              "documents", "embeddings", "nation", "supplier", "region"):
        try:
            entrymod._t(spark, SF_DIR, t).limit(1).count()
        except Exception:
            pass

    timings: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 4)
        assert n >= 0

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
