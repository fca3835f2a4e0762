#!/usr/bin/env python
"""Per-query job/stage profiler for the optimization rounds.

For each named query (default: the N slowest from BENCHLOCAL.json), runs the
same trial loop as bench.py (construct + count, min-of-2) and attributes every
Spark job/stage executed during the query's window via the live UI REST API
(job-group tagged, so warmup/neighbor jobs can't pollute the attribution) —
per-stage executorRunTime/cpuTime, shuffle bytes, input bytes, task counts,
and per-job wall durations, so optimization targets the measured stage, not a
guess (guide §1.1: empirical loop).

Usage: python scripts/profile_queries.py [--top=N] [names...]
Writes scripts/profile_r11.json.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from harmonize_search_analyze_spark.session import DEFAULT_CPUS

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _get_spark_ui():
    """get_spark()'s exact configs + unbounded UI retention (measurement
    rig only — retention does not change plans or timings)."""
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.appName("profile")
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
        .config("spark.ui.retainedJobs", "300000")
        .config("spark.ui.retainedStages", "300000")
        .master(f"local[{DEFAULT_CPUS}]")
        .getOrCreate()
    )


def _api(url: str):
    with urllib.request.urlopen(url, timeout=20) as fh:
        return json.load(fh)


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    top_n = 0
    for a in sys.argv[1:]:
        if a.startswith("--top"):
            top_n = int(a.split("=", 1)[1]) if "=" in a else 20
    if top_n:
        bl = json.load(open(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BENCHLOCAL.json")))
        ranked = sorted(bl["queries"], key=bl["queries"].get, reverse=True)
        names = ranked[:top_n] + [n for n in names if n not in ranked[:top_n]]

    spark = _get_spark_ui()
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    # same warmups as bench.py
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

    warm_dir = "/root/testdata/sf0.001"
    qmap = entrymod.queries()
    if os.path.isdir(warm_dir):
        for nm in names:
            try:
                qmap[nm](spark, warm_dir).count()
            except Exception as exc:
                print(f"# warmup {nm}: {exc}", file=sys.stderr)
    gc.collect()
    spark.catalog.clearCache()

    out = {}
    for nm in names:
        fn = qmap[nm]
        trials = []
        for t in range(2):
            group = f"prof-{nm}-{t}"
            spark.sparkContext.setJobGroup(group, nm)
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t1 = time.perf_counter()
            n = df.count()
            t2 = time.perf_counter()
            spark.sparkContext.setJobGroup(None, None)
            jobs = [j for j in _api(f"{base}/jobs")
                    if j.get("jobGroup") == group]
            job_walls = []
            for j in jobs:
                try:
                    sub = j["submissionTime"]
                    comp = j["completionTime"]
                    job_walls.append({
                        "jobId": j["jobId"],
                        "sub": sub, "comp": comp,
                        "stages": j["stageIds"],
                    })
                except KeyError:
                    pass
            stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
            stages = []
            for sid in stage_ids:
                try:
                    for att in _api(f"{base}/stages/{sid}"):
                        stages.append({
                            "stage": sid,
                            "name": att["name"].split("\n")[0][:80],
                            "status": att.get("status"),
                            "runTimeMs": att.get("executorRunTime"),
                            "cpuTimeMs": (att.get("executorCpuTime") or 0) // 1_000_000,
                            "inMB": round((att.get("inputBytes") or 0) / 1e6, 2),
                            "shRdMB": round((att.get("shuffleReadBytes") or 0) / 1e6, 2),
                            "shWrMB": round((att.get("shuffleWriteBytes") or 0) / 1e6, 2),
                            "tasks": att.get("numCompleteTasks"),
                            "launch": att.get("firstTaskLaunchedTime"),
                            "done": att.get("completionTime"),
                        })
                except Exception:
                    pass
            trials.append({
                "construct_s": round(t1 - t0, 4),
                "count_s": round(t2 - t1, 4),
                "total_s": round(t2 - t0, 4),
                "rows": n,
                "n_jobs": len(jobs),
                "jobs": job_walls,
                "stages": stages,
            })
            del df
            gc.collect()
            spark.catalog.clearCache()
        out[nm] = trials
        best = min(tr["total_s"] for tr in trials)
        print(f"# {best:8.3f}s  {nm}  (construct "
              f"{min(tr['construct_s'] for tr in trials):.3f}s, jobs "
              f"{trials[-1]['n_jobs']})", file=sys.stderr)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "profile_r11_b4.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"# wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
