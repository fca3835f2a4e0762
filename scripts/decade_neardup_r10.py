"""THIRD decade (nd100 -> nd1000, 500k -> 5M docs) for the band-join
near-dup family on the realistic-duplicate-structure corpus (VERDICT r9
"next round" #6) — extends decade_neardup_r9.json (nd10 -> nd100) so the
family matches the core paths' three-decade record.

Operators at PRODUCTION configs over the FULL corpus (no sampling):

- lsh_near_dup:            MinHash k=64, 3-gram shingles, 8 rows/band,
                           verify Jaccard >= 0.8
- containment_pairs:       same banding, either-direction containment >= 0.8
- simhash_banded_trigram:  64-bit SimHash with feature_n=3 shingle features
                           (the Manku'07-style production config), Hamming <= 3

The UNIGRAM simhash_banded config is deliberately ABSENT at this scale:
its r9 row measured 885M candidate pairs at nd100 (simhash bit-bias on
Zipf text — head words correlate every sketch), so its nd1000 candidate
set would be ~88G pairs; the unigram config exists as the oracle pin,
the trigram config is what production runs — measuring the former at 5M
docs would measure the corpus pathology a third time, not the operator.

For each operator and scale: min-of-2 timed full-pipeline counts plus an
UNtimed candidate-pair count, so the row decomposes wall growth into
(input volume, candidate volume, true-pair output). True pairs grow
~linearly on this corpus; a sound banded operator shows wall ~ input
ratio (~10x on fixed cores).

Writes scripts/decade_neardup_r10.json.
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

ND100 = "/tmp/sparkgraft_nd100"
ND1000 = "/tmp/sparkgraft_nd1000"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "decade_neardup_r10.json")

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
    from bench import _await_quiet_host

    loadavg_start, _ = _await_quiet_host()
    # fresh process -> driver_memory takes effect; local mode puts ALL
    # executor threads in the driver JVM, and the 64-minhash signature
    # build over ~750M exploded shingles at nd1000 needs the headroom
    spark = get_spark(app_name="neardup_decade_r10", driver_memory="80g")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"round": 10, "rows": {}}

    per_op: dict[str, dict] = {
        "lsh_near_dup": {}, "containment_pairs": {},
        "simhash_banded_trigram": {},
    }
    for tag, sf_dir in [("nd100", ND100), ("nd1000", ND1000)]:
        docs = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text")
            .repartition(32, "doc_id")
            .localCheckpoint()
        )
        n_docs = docs.count()

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

        t, n = _timed(lambda: near_dup_pairs_lsh(
            docs, "doc_id", "text", **LSH_CFG).count())
        per_op["lsh_near_dup"].update({
            f"{tag}_sec": t, f"{tag}_rows": n, f"{tag}_docs": n_docs,
            f"{tag}_cand_pairs": mh_cands})

        t, n = _timed(lambda: containment_pairs(
            docs, "doc_id", "text", **LSH_CFG).count())
        per_op["containment_pairs"].update({
            f"{tag}_sec": t, f"{tag}_rows": n, f"{tag}_docs": n_docs,
            f"{tag}_cand_pairs": mh_cands})

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
        row["ratio"] = round(
            row["nd1000_sec"] / max(row["nd100_sec"], 0.01), 2)
        row["out_ratio"] = round(
            row["nd1000_rows"] / max(row["nd100_rows"], 1), 2)
        row["cand_ratio"] = round(
            row["nd1000_cand_pairs"] / max(row["nd100_cand_pairs"], 1), 2)
        out["rows"][op] = row

    out["loadavg_start"] = loadavg_start
    out["note"] = (
        "Third decade for the band-join family: 500k -> 5M docs of the "
        "realistic clustered-duplicate corpus (gen_neardup_corpus_nd1000."
        "py, 10 x 500k blocks, intra-block clusters => true pairs stay "
        "linear). Production configs: MinHash k=64 / 3-gram / 8 rows-per-"
        "band; 64-bit trigram-feature SimHash Hamming<=3. Full corpus, no "
        "sampling; min-of-2; candidate counts untimed. The unigram "
        "simhash config is deliberately absent (see module docstring)."
    )
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps(out["rows"], indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
