"""One-decade scale validation (VERDICT r2 item 4): run the headline
dedup/ANN family at generator-sf0.1 (mult=1) and sf1 (mult=10), report
per-query wall times and the sf1/sf0.1 ratio. Data must exist first:

    python scripts/gen_scale_data.py /tmp/sparkgraft_m1 1
    python scripts/gen_scale_data.py /tmp/sparkgraft_m10 10
    python scripts/scale_validation.py

A linear operator at a 10x data multiplier on a fixed 32-core box should
land near 10x (minus fixed per-query overhead that amortizes); markedly
super-linear ratios indicate a quadratic term escaping its bound.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import harmonize_search_analyze_spark as hsa  # noqa: E402
import __spark_entry__ as entry  # noqa: E402

FAMILY = [
    "lsh_near_dup",
    "simhash_banded",
    "embedding_lsh",
    "similarity_join_ivf",
    "semantic_dedup",
    "dedup_clusters",
    # round-3 additions
    "fuzzy_decontaminate",
    "incremental_dedup",
    "token_budget_sample",
    "quality_mix",
    # round-3 session-3 additions (documents/embeddings-only queries)
    "dsir_sample",
    "bloom_dedup",
    "intervals_search",
    "term_suggest",
    "phrase_suggest",
    "unimax",
    "knn_filtered",
    "simple_query",
    "rescore_topk",
    "global_order",
    "assign_split",
    "rank_eval",
    "hard_negatives",
    # round-4 additions: the round-3 pair operators not yet under the
    # scale lens (VERDICT r3 item 6)
    "substring_dedup",
    "dedup_keep_best",
    "soft_dedup",
    "retriever_rrf",
    "knn_classify_ivf",  # synthetic entry, see EXTRA below
    # round-4 session-2 additions (scan+agg-shaped; expect ~linear)
    "feature_hash_full",  # synthetic: the gated query caps doc_id < 60
    "maxsim",
    "event_paths",
    "zipf_fit",
    "rfm_segments",
]

# knn_classify's GATED query runs the exact method (it is the recall
# oracle — quadratic by construction); the scale lens must grade the
# production IVF path instead, so it gets a synthetic entry here.


def _knn_classify_ivf(spark, sf_dir):
    from harmonize_search_analyze_spark.operators.similarity import (
        knn_classify,
    )

    emb = entry._t(spark, sf_dir, "embeddings")
    return knn_classify(emb, k=5, test_pct=10, method="ivf")


def _feature_hash_full(spark, sf_dir):
    from harmonize_search_analyze_spark.operators.text import (
        feature_hash_vectors,
    )

    docs = entry._t(spark, sf_dir, "documents")
    return feature_hash_vectors(docs, "doc_id", "text", n_buckets=1024)


EXTRA = {
    "knn_classify_ivf": _knn_classify_ivf,
    "feature_hash_full": _feature_hash_full,
}

# CLI override: pass query names to validate a subset instead of FAMILY
if len(sys.argv) > 1:
    FAMILY = sys.argv[1:]

M1_DIR = "/tmp/sparkgraft_m1"
M10_DIR = "/tmp/sparkgraft_m10"


def run(spark, sf_dir: str) -> dict[str, tuple[float, int]]:
    out = {}
    qs = entry.queries()
    for name in FAMILY:
        fn = EXTRA.get(name) or qs[name]
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        out[name] = (round(time.time() - t0, 2), n)
    return out


def main() -> None:
    spark = hsa.get_spark(
        master="local[32]", shuffle_partitions=32, driver_memory="48g"
    )
    # warm the JVM/Arrow paths so m1 doesn't absorb all first-run cost
    run(spark, M1_DIR)
    m1 = run(spark, M1_DIR)
    m10 = run(spark, M10_DIR)
    report = {}
    for name in FAMILY:
        t1, n1 = m1[name]
        t10, n10 = m10[name]
        report[name] = {
            "sf0.1_sec": t1,
            "sf1_sec": t10,
            "ratio": round(t10 / t1, 2) if t1 > 0 else None,
            "sf0.1_rows": n1,
            "sf1_rows": n10,
        }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
