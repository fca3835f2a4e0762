"""Round-10 extension of the at-scale oracle-parity battery
(m100_parity_r8.json 24/24 + m100_parity_r9.json 12/12): the same
driver-gate comparison (row count + sorted columns + order-insensitive
normalized values) on the m100 rig (500k docs / 200k vecs / 10M events —
1000x the gate's input) for 13 more families, leading with the
explode-heavy text battery the r9 verdict named (source_jsd_matrix,
entropy_rate, template_prefixes) and the round-10 span-cluster addition.
All entries are the DECLARED queries()/oracle_sql() pairs run verbatim —
nothing re-derived.

The round-10 multimodal gates (image/audio_near_dup) and hubness_report
are NOT here by declared contract: their DuckDB twins brute-verify all
pairs / all cosines, which is the gate-scale oracle design, not an m100
path — their at-scale evidence is the Spark-side decade wall row in
decade_r10.json (banded pipeline / IVF-fed stack).

Writes scripts/m100_parity_r10.json.
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
                   "m100_parity_r10.json")

QUERIES = [
    "substr_span_clusters",    # round-10 addition (cross-doc spans)
    "source_jsd_matrix",       # explode-heavy text (verdict-named)
    "entropy_rate",            # explode-heavy text (verdict-named)
    "template_prefixes",       # explode-heavy text (verdict-named)
    "good_turing",             # frequency-of-frequencies
    "chao1_richness",          # species richness
    "pmi_collocations",        # collocation battery
    "vocab_coverage",          # vocab battery
    "ngram_novelty",           # n-gram novelty
    "repetition_signals",      # intra-doc repetition gauges
    "jsd_divergence",          # distribution divergence
    "burstiness",              # events inter-arrival
    "conversion_lag",          # events funnel-lag
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
    spark = get_spark(app_name="m100_parity_r10", driver_memory="48g")
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
        print(name, results[name], flush=True)

    out = {
        "round": 10,
        "loadavg_start": loadavg,
        "note": (
            "Extension of the m100 battery (r8 24/24 + r9 12/12): the "
            "same driver-gate comparison (rows + sorted columns + "
            "order-insensitive 9-sig-fig values) at 1000x the gate's "
            "input for 13 more declared queries - the round-10 "
            "substr_span_clusters plus the explode-heavy text battery "
            "(source JSD matrix, entropy rate, template prefixes, "
            "Good-Turing, Chao1, PMI, vocab coverage, n-gram novelty, "
            "repetition signals, JSD) and two events families "
            "(burstiness, conversion lag). Cumulative at-scale parity "
            "coverage: 49 queries."
        ),
        "results": results,
    }
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps({k: v["match"] for k, v in results.items()}))
    assert all(r["match"] for r in results.values())


if __name__ == "__main__":
    main()
