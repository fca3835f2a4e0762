"""Broad one-decade scale sweep: run EVERY gated query that works on the
generated documents/embeddings/events tables at mult=1 and mult=10,
report time ratios, flag super-linear ones (> 12x at 10x data). The
targeted harness (scale_validation.py) grades the known-risky family;
this sweep is the dragnet for cliffs nobody predicted.

    python scripts/gen_scale_data.py /tmp/sparkgraft_m1 1
    python scripts/gen_scale_data.py /tmp/sparkgraft_m10 10
    python scripts/scale_sweep.py [threshold]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import harmonize_search_analyze_spark as hsa  # noqa: E402
import __spark_entry__ as entry  # noqa: E402

M1 = "/tmp/sparkgraft_m1"
M10 = "/tmp/sparkgraft_m10"
THRESH = float(sys.argv[1]) if len(sys.argv) > 1 else 12.0


def main() -> None:
    spark = hsa.get_spark(
        master="local[32]", shuffle_partitions=32, driver_memory="48g"
    )
    qs = entry.queries()
    runnable = {}
    for name, fn in qs.items():
        try:
            fn(spark, M1).count()  # warm + feasibility probe
            runnable[name] = fn
        except Exception:
            continue  # touches tables the generator does not produce
    out = {}
    for name, fn in runnable.items():
        t0 = time.time()
        n1 = fn(spark, M1).count()
        t1 = time.time() - t0
        t0 = time.time()
        n10 = fn(spark, M10).count()
        t10 = time.time() - t0
        out[name] = {
            "m1_sec": round(t1, 2), "m10_sec": round(t10, 2),
            "ratio": round(t10 / max(t1, 0.01), 2),
            "m1_rows": n1, "m10_rows": n10,
        }
    flagged = {k: v for k, v in out.items() if v["ratio"] > THRESH}
    print(json.dumps({"n_swept": len(out), "flagged": flagged}, indent=1))
    with open("/tmp/scale_sweep.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
