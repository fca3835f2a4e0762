"""Decade wall rows (m10 -> m100: 50k -> 500k docs / 20k -> 200k vecs)
for the FOUR round-10 additions — the per-new-op scale evidence the
standing policy requires (README "Verification lifecycle" rule 2):

- image_near_dup / audio_near_dup: the full in-plan synth -> PNG/WAV
  encode -> Arrow decode -> perceptual sketch -> banded candidate join ->
  bit_count verify pipelines. Sketches of non-cluster docs are
  ~independent 64-bit values, so banded candidates sit at the pigeonhole
  floor and both output pairs and wall should track input ~linearly —
  the complement of the Zipf-text candidate pathology the nd rigs
  characterize. Candidate counts recorded untimed.
- substr_span_clusters: gram agg + island merge + span-key agg over the
  full documents table.
- hubness_report via the DECLARED scale path: the N_k aggregation stack
  (hubness_from_knn) fed from similarity_join_ivf (sqrt-n centroids,
  nprobe=4) over the full embeddings table — the brute broadcast join in
  the gated query is the bounded-sample recall oracle by contract, so
  measuring IT at m100 would measure the oracle, not the operator.

Min-of-2 per cell, quiet-host gated. Writes scripts/decade_r10.json.
"""

from __future__ import annotations

import gc
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from harmonize_search_analyze_spark.operators.dedup import (  # noqa: E402
    simhash_candidate_pairs,
    substring_span_clusters,
)
from harmonize_search_analyze_spark.operators.multimodal import (  # noqa: E402
    audio_near_dup_pairs,
    audio_phash,
    gate_media_synth,
    image_near_dup_pairs,
    image_phash,
)
from harmonize_search_analyze_spark.operators.similarity import (  # noqa: E402
    hubness_from_knn,
    similarity_join_ivf,
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
    spark = get_spark(app_name="decade_r10", driver_memory="48g")
    spark.sparkContext.setLogLevel("ERROR")
    rows: dict[str, dict] = {
        "image_near_dup": {}, "audio_near_dup": {},
        "substr_span_clusters": {}, "hubness_ivf": {},
    }

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
            rows[op].update({
                f"{tag}_sec": t, f"{tag}_rows": n, f"{tag}_docs": n_docs,
                f"{tag}_cand_pairs": cands})

        full_docs = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text")
            .repartition(32, "doc_id")
            .localCheckpoint()
        )
        t, n = _timed(lambda: substring_span_clusters(
            full_docs, "doc_id", "text", k=8).count())
        rows["substr_span_clusters"].update({
            f"{tag}_sec": t, f"{tag}_rows": n, f"{tag}_docs": n_docs})

        emb = (
            spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .select("vec_id", "embedding")
            .repartition(32)
            .localCheckpoint()
        )
        n_vecs = emb.count()
        ids = emb.select(F.col("vec_id").alias("__vid"))
        n_cent = max(4, int(math.isqrt(n_vecs)))

        def hub_ivf():
            knn = similarity_join_ivf(
                emb,
                emb.select(F.col("vec_id").alias("query_id"), "embedding"),
                6,
                nprobe=4,
                n_centroids=n_cent,
                corpus_id="vec_id",
            )
            return hubness_from_knn(knn, ids, k=5).count()

        t, n = _timed(hub_ivf)
        rows["hubness_ivf"].update({
            f"{tag}_sec": t, f"{tag}_rows": n, f"{tag}_vecs": n_vecs,
            f"{tag}_centroids": n_cent})

        docs.unpersist(); full_docs.unpersist(); emb.unpersist()
        spark.catalog.clearCache()

    for op, row in rows.items():
        row["ratio"] = round(row["m100_sec"] / max(row["m10_sec"], 0.01), 2)

    out = {
        "round": 10,
        "loadavg_start": loadavg_start,
        "rows": rows,
        "note": (
            "Decade rows for the round-10 additions. image/audio_near_dup "
            "run the full synth->encode->decode->sketch->banded-join "
            "pipelines (candidates at the pigeonhole floor on ~independent "
            "sketches; planted clusters keep output linear in n). "
            "substr_span_clusters runs the full documents table. "
            "hubness_ivf is the declared scale path (hubness_from_knn fed "
            "by similarity_join_ivf, sqrt-n centroids, nprobe=4) - the "
            "gated query's brute join is the bounded-sample recall oracle "
            "by contract. hubness output rows = distinct N_k values, not "
            "corpus-sized."
        ),
    }
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps(rows, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
