#!/usr/bin/env python
"""Round-11 scale spot-check (VERDICT r10 next-round #5): run the
round-10/round-11 REWRITTEN queries once at m10 and m100 (10x / 100x the
driver's sf0.1 stats-matched corpus, scripts/gen_scale_data.py seed 42)
and record wall + per-query SHUFFLE BYTES, so "fewer exchanges" is shown
to translate at scale, not just in the local bench.

Battery = the rewritten set the round-11 window re-verifies, restricted
to queries whose tables the m-rig generates (documents / embeddings /
events): the CC-fusion dedup trio + semantic_dedup (r10), ipf_weights +
markov_stationary (r10 rewrites), pagerank (r11 loop trim), winnow_pairs
+ mutual_info + llr_collocations + dsir_sample + kmeans_ivf +
graph_explore (r11).

Each cell: min-of-2 full-materialization count of the DECLARED queries()
entry run verbatim at the scale dir; shuffle read+write bytes attributed
via the UI REST API with job-group tagging (profile_queries.py
discipline). Writes scripts/scale_check_r11.json.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from bench import _await_quiet_host, _cpu_ref_sec  # noqa: E402
from harmonize_search_analyze_spark.session import DEFAULT_CPUS  # noqa: E402

M10 = "/tmp/sparkgraft_m10"
M100 = "/tmp/sparkgraft_m100"
ND10 = "/tmp/sparkgraft_nd10"
ND100 = "/tmp/sparkgraft_nd100"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "scale_check_r11.json")

#: m-corpus battery, cheap-first. The CC-backed dedup trio is NOT here:
#: the m-corpus draws words i.i.d. from the Zipf vocabulary, which makes
#: LSH band keys collide quadratically (measured live: the m100
#: dedup_clusters band join accumulated 41,000 s of task time in one
#: stage before this run was cut) — exactly the corpus pathology the
#: nd corpora with REALISTIC clustered duplicates exist to avoid
#: (decade_neardup_r10's unigram-simhash note). The trio runs on
#: nd10/nd100 below, the family's standing scale rig.
BATTERY_M = [
    "ipf_weights",
    "mutual_info",
    "llr_collocations",
    "dsir_sample",
    "winnow_pairs",
    "pagerank",
    "markov_stationary",
    "graph_explore",
    "kmeans_ivf",
    "semantic_dedup",
]
BATTERY_ND = [
    "dedup_clusters",
    "soft_dedup",
    "dedup_keep_best",
]
# k_core and spearman_corr are rewritten too but declared over lineitem,
# which the m-rig does not generate; pagerank (same observe()/loop-trim
# pattern as k_core) and the documents-axis battery stand in for them.


def _get_spark_ui():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.appName("scale_check_r11")
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
        .config("spark.driver.memory", "48g")
        .config("spark.ui.retainedJobs", "300000")
        .config("spark.ui.retainedStages", "300000")
        .master(f"local[{DEFAULT_CPUS}]")
        .getOrCreate()
    )


def _api(url: str):
    with urllib.request.urlopen(url, timeout=30) as fh:
        return json.load(fh)


def main() -> None:
    loadavg, _ = _await_quiet_host()
    cpu_ref = _cpu_ref_sec()
    spark = _get_spark_ui()
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"
    qs = entrymod.queries()
    rows: dict[str, dict] = {}
    if os.path.exists(OUT):  # resume: keep completed cells
        rows = json.load(open(OUT)).get("rows", {})
    # small-scale cells are min-of-2; 100x cells run ONCE — the
    # VERDICT-r10 #5 contract is a single spot-check, and a second
    # multi-minute trial per 100x cell buys only min-noise reduction
    # the ratio does not need
    trials_for = {"m10": 2, "m100": 1, "nd10": 2, "nd100": 1}
    for tag, sf_dir, battery in [
        ("m10", M10, BATTERY_M),
        ("nd10", ND10, BATTERY_ND),
        ("m100", M100, BATTERY_M),
        ("nd100", ND100, BATTERY_ND),
    ]:
        for name in battery:
            if f"{tag}_sec" in rows.get(name, {}):
                continue
            best, n, sh = None, None, None
            for t in range(trials_for[tag]):
                gc.collect()
                spark.catalog.clearCache()
                group = f"scale-{tag}-{name}-{t}"
                spark.sparkContext.setJobGroup(group, name)
                t0 = time.perf_counter()
                n = qs[name](spark, sf_dir).count()
                dt = time.perf_counter() - t0
                spark.sparkContext.setJobGroup(None, None)
                if best is None or dt < best:
                    best = dt
                    jobs = [j for j in _api(f"{base}/jobs")
                            if j.get("jobGroup") == group]
                    sids = sorted({s for j in jobs for s in j["stageIds"]})
                    rd = wr = 0
                    for sid in sids:
                        try:
                            for att in _api(f"{base}/stages/{sid}"):
                                rd += att.get("shuffleReadBytes", 0)
                                wr += att.get("shuffleWriteBytes", 0)
                        except Exception:
                            pass
                    sh = {"shuffle_read_mb": round(rd / 1e6, 1),
                          "shuffle_write_mb": round(wr / 1e6, 1),
                          "n_jobs": len(jobs)}
            r = rows.setdefault(name, {})
            r[f"{tag}_sec"] = round(best, 2)
            r[f"{tag}_rows"] = n
            r.update({f"{tag}_{k}": v for k, v in sh.items()})
            print(tag, name, round(best, 2), n, sh, flush=True)
            with open(OUT, "w") as fh:  # checkpoint per cell
                json.dump({"round": 11, "partial": True, "rows": rows},
                          fh, indent=1, sort_keys=True)
    for name, r in rows.items():
        lo, hi = ("nd10", "nd100") if f"nd100_sec" in r else ("m10", "m100")
        r["wall_ratio"] = round(
            r[f"{hi}_sec"] / max(r[f"{lo}_sec"], 0.01), 2)
        r["shuffle_ratio"] = round(
            (r[f"{hi}_shuffle_read_mb"] + r[f"{hi}_shuffle_write_mb"])
            / max(r[f"{lo}_shuffle_read_mb"]
                  + r[f"{lo}_shuffle_write_mb"], 0.1),
            2,
        )
    out = {
        "round": 11,
        "loadavg_start": loadavg,
        "cpu_ref_start_sec": cpu_ref,
        "cpu_ref_end_sec": _cpu_ref_sec(),
        "note": (
            "Scale spot-check of the r10/r11 rewritten queries: m10/m100 "
            "(50k/500k docs, 20k/200k vecs, 1M/10M events; gen_scale_data "
            "seed 42) for the non-LSH battery, nd10/nd100 (50k/500k docs, "
            "realistic clustered duplicates; gen_neardup_corpus seed 42) "
            "for the CC dedup trio — the i.i.d.-vocab m-corpus makes LSH "
            "band keys collide quadratically (see BATTERY_M note), which "
            "measures the corpus pathology, not the operator. Small-scale "
            "cells min-of-2, 100x cells single-trial; shuffle bytes via "
            "UI REST per job group. A 10x input ratio with wall_ratio "
            "~10 and shuffle_ratio ~10 means the rewritten plans scale "
            "linearly on fixed cores."
        ),
        "rows": rows,
    }
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps({k: {"wall_ratio": v["wall_ratio"],
                          "shuffle_ratio": v["shuffle_ratio"]}
                      for k, v in rows.items()}, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
