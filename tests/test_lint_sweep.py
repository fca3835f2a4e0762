"""Whole-surface plan-lint sweep: every gated query's PLAN (never
executed — the linter reads plans) is checked against the engine's
hard rules:

- ``python_eval``: ZERO row-at-a-time Python anywhere (Arrow stages
  are allowed by the linter itself);
- ``cartesian``: only the declared row-capped brute-force oracles may
  plan all-pairs work.

The warning-class findings (global_window on bucket-sized frames,
wide_scan, many_shuffles) are deliberately not asserted — they flag
"look here", not "wrong" — but the sweep prints their counts so a
regression is visible in the test log."""

from __future__ import annotations

import collections

import pytest

import __spark_entry__ as entry
from harmonize_search_analyze_spark.plans.lint import lint_plan

SF = "/root/testdata/sf0.001"

# brute-force oracles and pair generators DECLARED quadratic (each is
# row-capped or the recall oracle for a bucketed production path)
CARTESIAN_ALLOWED = {
    "similarity_join",       # brute oracle for similarity_join_ivf
    "jaccard_brute",         # brute oracle for lsh_near_dup
    "embedding_near_dup",    # brute oracle (max_rows-guarded)
    "knn_classify",          # exact recall oracle (ivf is the scale path)
    "dedup_eval",            # metrics against the brute ground truth
    "simhash_hamming",       # brute pair oracle for the banded path
    "matrix_stats",          # fixed column-pair frame (metadata-sized)
    "mmr_rerank",            # driver-side greedy over a bounded pool
    "theil_sen",             # all-pairs over the CALENDAR-bounded day
                             # frame (|days|^2 independent of corpus)
}


@pytest.mark.slow
def test_lint_sweep_hard_rules(spark):
    qs = entry.queries()
    py_hits, cart_hits = [], []
    warn_counts: collections.Counter = collections.Counter()
    skipped = []
    for name, fn in qs.items():
        try:
            df = fn(spark, SF)
        except Exception:
            skipped.append(name)  # env-gated / trainer-shaped
            continue
        try:
            findings = lint_plan(df)
        except Exception:
            skipped.append(name)
            continue
        codes = {c for c, _ in findings}
        if "python_eval" in codes:
            py_hits.append(name)
        if "cartesian" in codes and name not in CARTESIAN_ALLOWED:
            cart_hits.append(name)
        for c in codes - {"python_eval", "cartesian"}:
            warn_counts[c] += 1
    # cross_broadcast is a warning (bounded-by-construction centroid /
    # query / combination frames) — recorded, not asserted
    print(
        f"\nlint sweep: {len(qs) - len(skipped)} linted, "
        f"{len(skipped)} skipped ({sorted(skipped)[:6]}...), "
        f"warnings: {dict(warn_counts)}"
    )
    assert py_hits == [], f"row-at-a-time Python in: {py_hits}"
    assert cart_hits == [], (
        f"undeclared all-pairs plans in: {cart_hits}"
    )
