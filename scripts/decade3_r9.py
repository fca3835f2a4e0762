"""THIRD measured decade (m100 -> m1000: 5M docs / 2M vecs / 100M events,
chunked generator seed 42) — together with decade2_r8.json (m10 -> m100)
and the m1/m10 sweeps this gives three consecutive measured decades, i.e.
a direct 1000x scaling observation for the core partitioned paths on
fixed 32-core hardware.

Battery: the decade2 core rows that touch only the m-rig tables, plus the
round-9 additions. Each cell is a min-of-2 full-materialization count of
the DECLARED queries() entry run verbatim at the scale dir; quiet-host
gated. Writes scripts/decade3_r9.json.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from bench import _await_quiet_host  # noqa: E402
from harmonize_search_analyze_spark.session import get_spark  # noqa: E402

M100 = "/tmp/sparkgraft_m100"
M1000 = "/tmp/sparkgraft_m1000"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "decade3_r9.json")

BATTERY = [
    "nested_terms",        # terms-in-terms window family
    "global_order",        # range-exchange total order
    "mann_whitney",        # prefix_sums midranks
    "dedup_exact",         # hash-groupBy digests (output grows with input)
    "hash_sample",         # per-row hash sampling
    "markov_stationary",   # iterated frame
    "rfm_segments",        # ntile buckets
    "pack_documents",      # range-exchange packing
    "heaps_law",           # token explode + ntile
    "join_size_estimate",  # KMV sketch heaps
    "embedding_health",    # single map-combinable agg
    "krippendorff_alpha",  # round-9 addition
    "neyman_allocation",   # round-9 addition
]


def main() -> None:
    loadavg, _ = _await_quiet_host()
    spark = get_spark(app_name="decade3_r9", driver_memory="80g")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    rows: dict[str, dict] = {}
    for tag, sf_dir in [("m100", M100), ("m1000", M1000)]:
        for name in BATTERY:
            best, n = None, None
            for _ in range(2):
                gc.collect()
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                n = qs[name](spark, sf_dir).count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            rows.setdefault(name, {})[f"{tag}_sec"] = round(best, 2)
            rows[name][f"{tag}_rows"] = n
            print(tag, name, round(best, 2), n, flush=True)
    for name, r in rows.items():
        r["ratio"] = round(r["m1000_sec"] / max(r["m100_sec"], 0.01), 2)
    out = {
        "round": 9,
        "loadavg_start": loadavg,
        "note": (
            "THIRD decade m100 -> m1000 (5M docs / 2M vecs / 100M events, "
            "chunked generator scripts/gen_scale_data_m1000.py, seed 42): "
            "min-of-2 counts of the declared queries() entries, quiet-host "
            "gated. Read together with decade2_r8.json (m10->m100) this is "
            "a direct 1000x scaling observation on fixed cores."
        ),
        "rows": rows,
    }
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps(rows, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
