"""Re-measure ONLY the image/audio near-dup decade cells of
decade_r10.json at the production banding geometry (max_hamming=3 ->
four 16-bit bands) after the round-10 gate redesign.

The first decade_r10 run measured the gates at max_hamming=4, whose
12.8-bit bands go birthday-quadratic at corpus scale (257M candidates
over 500k docs, ~100x per decade) — the same degeneracy
simhash_select_sql documents for narrow bands. The gate constructions
were re-pinned so planted perturbations flip at most one sketch bit per
member (image: dhash column 0; audio: energy frame 0), which lets the
gated queries run d=3. This rig updates the two affected rows in place,
stamping the pre-fix numbers into a `pre_fix_d4` sub-object so the
before/after is auditable.

Writes scripts/decade_r10.json (in place).
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
    simhash_candidate_pairs,
)
from harmonize_search_analyze_spark.operators.multimodal import (  # noqa: E402
    audio_near_dup_pairs,
    audio_phash,
    gate_media_synth,
    image_near_dup_pairs,
    image_phash,
)
from harmonize_search_analyze_spark.session import get_spark  # noqa: E402

M10 = "/tmp/sparkgraft_m10"
M100 = "/tmp/sparkgraft_m100"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "decade_r10.json")


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
    spark = get_spark(app_name="decade_r10_mm", driver_memory="48g")
    spark.sparkContext.setLogLevel("ERROR")

    with open(OUT) as fh:
        art = json.load(fh)
    for op in ("image_near_dup", "audio_near_dup"):
        art["rows"][op] = {"pre_fix_d4": art["rows"][op]}

    for tag, sf_dir in [("m10", M10), ("m100", M100)]:
        docs = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id")
            .repartition(32)
            .localCheckpoint()
        )
        n_docs = docs.count()
        for op, synth_mod, pairs_fn, phash_fn, col in (
            ("image_near_dup", "image", image_near_dup_pairs,
             image_phash, "phash"),
            ("audio_near_dup", "audio", audio_near_dup_pairs,
             audio_phash, "aphash"),
        ):
            synth = gate_media_synth(docs, "doc_id", synth_mod)
            sk = (
                phash_fn(synth, "payload")
                .where(F.col(col).isNotNull())
                .select("doc_id", F.col(col).alias("simhash"))
            )
            cands = simhash_candidate_pairs(
                sk, "doc_id", max_hamming=3, bits=64).count()
            t, n = _timed(
                lambda: pairs_fn(
                    gate_media_synth(docs, "doc_id", synth_mod),
                    "doc_id", max_hamming=3,
                ).count()
            )
            art["rows"][op].update({
                f"{tag}_sec": t, f"{tag}_rows": n, f"{tag}_docs": n_docs,
                f"{tag}_cand_pairs": cands})
        docs.unpersist()
        spark.catalog.clearCache()

    for op in ("image_near_dup", "audio_near_dup"):
        row = art["rows"][op]
        row["ratio"] = round(row["m100_sec"] / max(row["m10_sec"], 0.01), 2)
    art["mm_rerun_loadavg_start"] = loadavg_start
    art["note"] += (
        " | image/audio cells re-measured at max_hamming=3 (16-bit bands, "
        "the production geometry) after the gate perturbations were "
        "re-pinned to flip <= 1 sketch bit per member; the d=4 first "
        "measurement is kept under pre_fix_d4."
    )
    with open(OUT, "w") as fh:
        json.dump(art, fh, indent=1, sort_keys=True)
    print(json.dumps({k: art["rows"][k] for k in
                      ("image_near_dup", "audio_near_dup")}, indent=1,
                     sort_keys=True))


if __name__ == "__main__":
    main()
