"""Round-8 targeted decade measurements (VERDICT r7 items #2-#4):

1. spearman_corr + roc_auc decade rows — the m-rig lacks lineitem, so
   these run on an isolated synthetic continuous-score frame (the
   verdict-sanctioned alternative): deterministic hash-derived scores +
   binary outcome at n=100k (m1) and n=1M (m10), the events-table
   scale points. Both operators ride the prefix_sums midrank
   primitive, so the expected decade is the mann_whitney/kruskal class
   (~1.2-1.5x).
2. simhash_banded — isolated min-of-2 re-measure at m1/m10 WITH
   candidate-pair and output-pair counts logged (the r7 watch item:
   11.7x decade with no recorded pair counts; containment_pairs
   precedent says log the output growth before calling it a cliff).
3. intrinsic_dim — the measured PRODUCTION configuration (fixed
   ~2000-anchor budget + auto-sqrt(n) centroids) next to the gated
   oracle-pinned config (16 literal centroids, 1-in-25 anchors) whose
   10.9x decade row is the declared quadratic.

Writes /tmp/measure_r8.json; the round's scale_sweep_r8.json merges
these rows with the full dragnet.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

import harmonize_search_analyze_spark as hsa  # noqa: E402

M1 = "/tmp/sparkgraft_m1"
M10 = "/tmp/sparkgraft_m10"


def _timed(fn, reps: int = 2) -> tuple[float, int]:
    """min-of-reps wall time of fn() -> row count."""
    best, rows = float("inf"), -1
    for _ in range(reps):
        t0 = time.time()
        rows = fn()
        best = min(best, time.time() - t0)
    return round(best, 2), rows


def synth_scores(spark, n: int):
    """Deterministic continuous-score frame: two correlated-but-noisy
    doubles + a score-linked binary label, all from xxhash64 of the id
    (no RNG state, rerun-identical)."""
    h1 = (F.xxhash64(F.col("id")) % 100000).cast("double") / 100000.0
    h2 = (F.xxhash64(F.col("id"), F.lit(1)) % 100000).cast(
        "double"
    ) / 100000.0
    return (
        spark.range(n)
        .select(
            F.col("id"),
            (h1 + 0.3 * h2).alias("x"),
            (0.7 * h1 + h2).alias("y"),
            (h1 > 0.4).cast("int").alias("label"),
        )
        .localCheckpoint()  # pin: measure the operator, not the gen
    )


def main() -> None:
    from harmonize_search_analyze_spark.operators.analytics import (
        roc_auc,
        spearman_corr,
    )
    from harmonize_search_analyze_spark.operators.dedup import (
        simhash,
        simhash_candidate_pairs,
        simhash_near_dup_pairs_banded,
    )
    from harmonize_search_analyze_spark.operators.similarity import (
        intrinsic_dim,
    )

    spark = hsa.get_spark(
        master="local[32]", shuffle_partitions=32, driver_memory="48g"
    )
    out: dict = {}

    # -- 1. spearman_corr / roc_auc on the synthetic score frame ------
    f1 = synth_scores(spark, 100_000)
    f10 = synth_scores(spark, 1_000_000)
    for name, run in [
        ("spearman_corr", lambda d: spearman_corr(d, "x", "y").count()),
        ("roc_auc", lambda d: roc_auc(d, "x", "label").count()),
    ]:
        t1, n1 = _timed(lambda: run(f1))
        t10, n10 = _timed(lambda: run(f10))
        out[name] = {
            "m1_sec": t1, "m10_sec": t10,
            "ratio": round(t10 / max(t1, 0.01), 2),
            "m1_rows": n1, "m10_rows": n10,
            "rig": "synthetic score frame 100k->1M (lineitem absent "
                   "from the m-rig; verdict r7 #2)",
        }

    # -- 2. simhash_banded with pair counts ----------------------------
    def sb_docs(sf_dir: str):
        base = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .where(F.col("doc_id") % 10 == 0)
        )
        twins = base.select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zz")).alias("text"),
        )
        return base.select("doc_id", "text").unionByName(twins)

    sb = {}
    for tag, sf_dir in [("m1", M1), ("m10", M10)]:
        docs = sb_docs(sf_dir).localCheckpoint()
        t, n_out = _timed(
            lambda: simhash_near_dup_pairs_banded(
                docs, "doc_id", "text", max_hamming=6
            ).count()
        )
        sk = simhash(docs, "doc_id", "text")
        n_cand = simhash_candidate_pairs(
            sk, "doc_id", max_hamming=6
        ).count()
        sb[f"{tag}_sec"] = t
        sb[f"{tag}_rows"] = n_out
        sb[f"{tag}_cand_pairs"] = n_cand
        sb[f"{tag}_docs"] = docs.count()
    sb["ratio"] = round(sb["m10_sec"] / max(sb["m1_sec"], 0.01), 2)
    sb["cand_ratio"] = round(
        sb["m10_cand_pairs"] / max(sb["m1_cand_pairs"], 1), 2
    )
    sb["out_ratio"] = round(sb["m10_rows"] / max(sb["m1_rows"], 1), 2)
    out["simhash_banded"] = sb

    # -- 3. intrinsic_dim: gated-oracle vs production config -----------
    # Production levers (measured, not just documented):
    #   * FIXED anchor budget (~2000): the TwoNN MLE needs a SAMPLE of
    #     anchors, not a corpus-proportional share — kills one factor
    #     of n.
    #   * FIXED n_centroids ~= sqrt(anchor_budget * nprobe) ~= 96: with
    #     anchors fixed, candidate cost is anchors*n*nprobe/C and
    #     assignment cost is n*C, so the optimal C is INDEPENDENT of n
    #     (auto-sqrt(n) sizing is for corpus-proportional query sets;
    #     here it just inflates the n*C assignment term to n^1.5).
    #   * input partitioning: the m-rig parquet is one ~5 MB split, so
    #     without a repartition the nprobe-expanded candidate frame
    #     runs on 1-2 tasks (measured 18-19s at m10 regardless of C —
    #     serialization, not compute). A 100 TB corpus arrives in
    #     thousands of splits; the 32-way repartition below stands in
    #     for that. Parallelism follows input splits — the standard
    #     Spark contract, noted on the operator.
    for tag, kwargs in [
        (
            "intrinsic_dim_gated",
            # the oracle-pinned config the dragnet measures
            dict(n_centroids=16),
        ),
        (
            "intrinsic_dim_production",
            dict(n_centroids=96),
        ),
    ]:
        res = {}
        for mtag, sf_dir, n_vecs in [("m1", M1, 2000), ("m10", M10, 20000)]:
            vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            if tag.endswith("production"):
                vecs = vecs.repartition(32).localCheckpoint()
                step = max(1, n_vecs // 2000)
                afilter = F.col("vec_id") % step == 0
            else:
                afilter = F.col("vec_id") % 25 == 0
            t, _ = _timed(
                lambda: intrinsic_dim(
                    vecs, anchor_filter=afilter, **kwargs
                ).count()
            )
            res[f"{mtag}_sec"] = t
        res["ratio"] = round(
            res["m10_sec"] / max(res["m1_sec"], 0.01), 2
        )
        out[tag] = res

    print(json.dumps(out, indent=1))
    with open("/tmp/measure_r8.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
