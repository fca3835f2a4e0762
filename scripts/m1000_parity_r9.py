"""Oracle parity at 10,000x the driver gate's input: the same
rows + sorted-columns + order-insensitive 9-sig-fig value comparison the
sf0.01 gate runs, executed at m1000 (5M docs / 2M vecs / 100M events)
for small-output declared queries across the statistic, agreement,
allocation, sketch, text-gauge and window families. (The corpus-sized-
output frames — global_order, dedup_exact — carried row-by-row m100
parity in scripts/m100_parity_r8.json; collecting 5M-row frames into a
python comparator adds no information at this rung.)

Writes scripts/m1000_parity_r9.json.
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from bench import _await_quiet_host  # noqa: E402
from harmonize_search_analyze_spark.session import get_spark  # noqa: E402

M1000 = "/tmp/sparkgraft_m1000"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "m1000_parity_r9.json")

QUERIES = [
    "mann_whitney",         # prefix_sums midranks over 100M events
    "nested_terms",         # the canary window family
    "krippendorff_alpha",   # round-9 agreement
    "neyman_allocation",    # round-9 allocation
    "join_size_estimate",   # KMV sketch estimate
    "embedding_health",     # one-pass vector audit over 2M vecs
    "heaps_law",            # 800M-token explode + ntile
    "markov_stationary",    # iterated matrix frame
]


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def _norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in idx) for r in rows)


def main() -> None:
    loadavg, _ = _await_quiet_host()
    spark = get_spark(app_name="m1000_parity_r9", driver_memory="80g")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in ("documents", "embeddings", "events"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{M1000}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    results = {}
    for name in QUERIES:
        sdf = qs[name](spark, M1000)
        spark_rows = sdf.collect()
        spark_cols = sdf.columns
        duck = con.execute(oracles[name])
        duck_cols = [d[0] for d in duck.description]
        duck_rows = duck.fetchall()
        ok = (
            sorted(spark_cols) == sorted(duck_cols)
            and len(spark_rows) == len(duck_rows)
            and _norm_rows(spark_cols, spark_rows)
            == _norm_rows(duck_cols, duck_rows)
        )
        results[name] = {"match": bool(ok), "rows": len(spark_rows)}
        print(name, results[name], flush=True)

    out = {
        "round": 9,
        "loadavg_start": loadavg,
        "note": (
            "Driver-gate comparison at 10,000x the gate's input (m1000: "
            "5M docs / 2M vecs / 100M events) for 8 small-output declared "
            "queries. The determinism pins (rounding, tie orders, hash "
            "family) now hold across FOUR orders of magnitude of input."
        ),
        "results": results,
    }
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps({k: v["match"] for k, v in results.items()}))
    assert all(r["match"] for r in results.values())


if __name__ == "__main__":
    main()
