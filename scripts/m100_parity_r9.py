"""Round-9 extension of the at-scale oracle-parity battery
(scripts/m100_parity_r8.json, 24/24): re-run the driver-gate comparison
(row count + sorted columns + order-insensitive normalized values) on the
m100 rig (500k docs / 200k vecs / 10M events — 1000x the gate's input)
for families the r8 battery did not cover, plus the two round-9
additions. All entries are the DECLARED queries()/oracle_sql() pairs run
verbatim — nothing re-derived.

Writes scripts/m100_parity_r9.json.
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

M100 = "/tmp/sparkgraft_m100"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "m100_parity_r9.json")

# families without an r8 at-scale parity row; every query below touches
# only the m-rig tables (documents / embeddings / events)
QUERIES = [
    "krippendorff_alpha",      # round-9 addition (agreement)
    "neyman_allocation",       # round-9 addition (allocation)
    "fleiss_kappa",            # agreement battery
    "benjamini_hochberg",      # multiple-testing battery
    "attribution_linear",      # attribution battery
    "ltv_cohorts",             # cohort battery
    "stl_decompose",           # seasonal decomposition
    "weighted_percentile",     # weighted order statistics
    "markov_stationary",       # iterated-frame family
    "theil_sen",               # robust regression (pair-sampled)
    "lorenz_gini",             # inequality curve
    "readability",             # text gauges
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
    spark = get_spark(app_name="m100_parity_r9", driver_memory="48g")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in ("documents", "embeddings", "events"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{M100}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    results = {}
    for name in QUERIES:
        sdf = qs[name](spark, M100)
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
        print(name, results[name])

    out = {
        "round": 9,
        "loadavg_start": loadavg,
        "note": (
            "Extension of m100_parity_r8.json (24/24): the same driver-"
            "gate comparison (rows + sorted columns + order-insensitive "
            "9-sig-fig values) at 1000x the gate's input for 12 more "
            "declared queries - the round-9 additions plus agreement, "
            "FDR, attribution, cohort, STL, weighted-percentile, "
            "iterated-Markov, Theil-Sen, Lorenz and readability "
            "families. Cumulative at-scale parity coverage: 36 queries."
        ),
        "results": results,
    }
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps({k: v["match"] for k, v in results.items()}))
    assert all(r["match"] for r in results.values())


if __name__ == "__main__":
    main()
