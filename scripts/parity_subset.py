#!/usr/bin/env python
"""Targeted oracle-parity check for the optimization rounds: run the named
queries() entries on Spark and their oracle_sql() on DuckDB at one or more
small SFs and compare row count, column names, and order-insensitive
normalized values — the same comparison tests/test_oracle_parity.py applies,
callable per-query so every optimization batch can be verified at land time
without the full 382-query mirror.

Usage: python scripts/parity_subset.py [--sf=0.01[,0.001]] name [name ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from harmonize_search_analyze_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
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


def main() -> int:
    sfs = ["0.01"]
    names = []
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sfs = a.split("=", 1)[1].split(",")
        else:
            names.append(a)
    if not names:
        print("no query names given", file=sys.stderr)
        return 2
    spark = get_spark()
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    bad = 0
    for sf in sfs:
        sf_dir = f"/root/testdata/sf{sf}"
        con = duckdb.connect()
        for t in TABLES:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        for name in names:
            qfn = queries[name]
            sql = oracles.get(name)
            sdf = qfn(spark, sf_dir)
            srows = sdf.collect()
            if sql is None:
                print(f"[sf{sf}] {name}: rows={len(srows)} (no oracle — "
                      "rows-only contract)")
                continue
            rel = con.sql(sql)
            drows = rel.fetchall()
            ok_cols = [c.lower() for c in sdf.columns] == [
                c.lower() for c in rel.columns
            ]
            ok_vals = _norm_rows(sdf.columns, srows) == _norm_rows(
                list(rel.columns), drows
            )
            status = "OK" if (ok_cols and ok_vals) else "MISMATCH"
            if status != "OK":
                bad += 1
            print(f"[sf{sf}] {name}: {status} spark_rows={len(srows)} "
                  f"oracle_rows={len(drows)} cols_ok={ok_cols}")
            if status != "OK" and len(srows) <= 20:
                print("  spark :", _norm_rows(sdf.columns, srows)[:10])
                print("  oracle:", _norm_rows(list(rel.columns), drows)[:10])
        con.close()
    print("PARITY", "FAIL" if bad else "PASS", f"({bad} mismatches)")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
