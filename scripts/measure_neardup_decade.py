"""Decade measurement (nd10 -> nd100) for the band-join near-dup family
on a REALISTIC-duplicate-structure corpus (VERDICT r8 "Next round" #3).

Rig: corpora from gen_neardup_corpus.py at 50k and 500k docs — clustered
near-duplicates (~20% dup mass, geometric clusters, mutation rates
spanning the verify threshold, 25% containment slices) over a diverse
30k-vocab Zipf background. Operators run at PRODUCTION configs over the
FULL corpus (no sampling):

- lsh_near_dup:      MinHash k=64, 3-gram shingles, 8 rows/band
                     (8 bands; S-curve threshold ~ (1/8)^(1/8) = 0.77),
                     verify Jaccard >= 0.8
- simhash_banded:    64-bit SimHash, pigeonhole bands, Hamming <= 3
- containment_pairs: same LSH banding, either-direction containment
                     >= 0.8

For each operator and scale: min-of-2 timed full-pipeline counts, plus an
UNtimed candidate-pair count so the row decomposes wall growth into
(input volume, candidate volume, true-pair output). On this corpus true
pairs grow ~linearly with n, so a sound banded operator shows wall ~
input ratio (~10x on fixed cores), NOT the ~100x a quadratic candidate
stage would give.

Writes scripts/decade_neardup_r9.json.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from harmonize_search_analyze_spark.operators.dedup import (  # noqa: E402
    containment_pairs,
    lsh_candidate_pairs,
    minhash_signatures_from_shingles,
    near_dup_pairs_lsh,
    shingles_sql,
    simhash,
    simhash_candidate_pairs,
    simhash_near_dup_pairs_banded,
)
from harmonize_search_analyze_spark.session import get_spark  # noqa: E402

ND10 = "/tmp/sparkgraft_nd10"
ND100 = "/tmp/sparkgraft_nd100"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "decade_neardup_r9.json")

LSH_CFG = dict(threshold=0.8, k=64, n=3, rows_per_band=8)
SIM_CFG = dict(bits=64, max_hamming=3)


def _timed(fn, trials: int = 2):
    best, n = None, None
    for _ in range(trials):
        gc.collect()
        t0 = time.perf_counter()
        n = fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 2), n


def main() -> None:
    # same quiet-host gate as bench.py: a back-to-back rig run starts at
    # loadavg ~23 (the prior JVM digesting) and inflates individual
    # cells 2-6x — exactly the drifted-artifact failure mode VERDICT r8
    # flagged on the official bench
    from bench import _await_quiet_host

    loadavg_start, _ = _await_quiet_host()
    # fresh process -> driver_memory takes effect; local mode puts ALL
    # executor threads in the driver JVM, and the 1g default OOMs the
    # 64-minhash signature build over 80M exploded shingles at nd100
    spark = get_spark(app_name="neardup_decade", driver_memory="64g")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"round": 9, "rows": {}}

    per_op: dict[str, dict] = {
        "lsh_near_dup": {}, "simhash_banded": {}, "containment_pairs": {},
        "simhash_banded_trigram": {},
    }
    for tag, sf_dir in [("nd10", ND10), ("nd100", ND100)]:
        docs = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text")
            .repartition(32, "doc_id")
            .localCheckpoint()
        )
        n_docs = docs.count()

        # untimed candidate counts (shared banding for lsh/containment)
        sh = docs.select(
            "doc_id",
            F.expr(shingles_sql("text", "spark", LSH_CFG["n"])).alias(
                "shingles"),
        )
        sigs = minhash_signatures_from_shingles(
            sh, "doc_id", k=LSH_CFG["k"])
        mh_cands = lsh_candidate_pairs(
            sigs, "doc_id", k=LSH_CFG["k"],
            rows_per_band=LSH_CFG["rows_per_band"]).count()
        sk = simhash(docs, "doc_id", "text", bits=SIM_CFG["bits"])
        sim_cands = simhash_candidate_pairs(
            sk, "doc_id", **SIM_CFG).count()

        t, n = _timed(lambda: near_dup_pairs_lsh(
            docs, "doc_id", "text", **LSH_CFG).count())
        per_op["lsh_near_dup"].update({
            f"{tag}_sec": t, f"{tag}_rows": n, f"{tag}_docs": n_docs,
            f"{tag}_cand_pairs": mh_cands})

        t, n = _timed(lambda: simhash_near_dup_pairs_banded(
            docs, "doc_id", "text", **SIM_CFG).count())
        per_op["simhash_banded"].update({
            f"{tag}_sec": t, f"{tag}_rows": n, f"{tag}_docs": n_docs,
            f"{tag}_cand_pairs": sim_cands})

        t, n = _timed(lambda: containment_pairs(
            docs, "doc_id", "text", **LSH_CFG).count())
        per_op["containment_pairs"].update({
            f"{tag}_sec": t, f"{tag}_rows": n, f"{tag}_docs": n_docs,
            f"{tag}_cand_pairs": mh_cands})

        # trigram-feature simhash (the realistic-corpus production
        # config added this round): unigram features correlate Zipf-text
        # sketches and the unigram row above measures that (99x cand
        # growth); shingle features decorrelate unrelated docs back to
        # the pigeonhole floor — the Manku'07-style configuration
        sk3 = simhash(docs, "doc_id", "text",
                      bits=SIM_CFG["bits"], feature_n=3)
        sim3_cands = simhash_candidate_pairs(
            sk3, "doc_id", **SIM_CFG).count()
        t, n = _timed(lambda: simhash_near_dup_pairs_banded(
            docs, "doc_id", "text", feature_n=3, **SIM_CFG).count())
        per_op["simhash_banded_trigram"].update({
            f"{tag}_sec": t, f"{tag}_rows": n, f"{tag}_docs": n_docs,
            f"{tag}_cand_pairs": sim3_cands})

        docs.unpersist()
        spark.catalog.clearCache()

    for op, row in per_op.items():
        row["ratio"] = round(row["nd100_sec"] / max(row["nd10_sec"], 0.01), 2)
        row["out_ratio"] = round(
            row["nd100_rows"] / max(row["nd10_rows"], 1), 2)
        row["cand_ratio"] = round(
            row["nd100_cand_pairs"] / max(row["nd10_cand_pairs"], 1), 2)
        out["rows"][op] = row

    out["loadavg_start"] = loadavg_start
    out["note"] = (
        "Realistic-duplicate-structure corpus (gen_neardup_corpus.py, seed "
        "42): 50k -> 500k docs, ~20% duplicate mass in geometric clusters "
        "(mutation rates 0.002-0.08 spanning the 0.8 verify threshold, 25% "
        "containment slices) over a 30k-vocab Zipf background. Production "
        "configs: MinHash k=64 / 3-gram / 8 rows-per-band; 64-bit SimHash "
        "Hamming<=3. Full corpus, no sampling; min-of-2; candidate counts "
        "untimed. Closes VERDICT r8 missing #2 / next-round #3. The "
        "simhash_banded row is the oracle-pinned UNIGRAM-feature config "
        "(its 99x cand growth is simhash bit-bias on Zipf text — head "
        "words correlate every sketch); simhash_banded_trigram is the "
        "production shingle-feature config (feature_n=3, added r9) "
        "whose collisions fall back to the pigeonhole floor."
    )
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps(out["rows"], indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
