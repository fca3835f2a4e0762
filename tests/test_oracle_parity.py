"""Local mirror of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count, column
names, and order-insensitive values."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


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


def _type_family(t: str) -> str:
    """Collapse engine-specific type names into comparable families.

    The driver's value-hash is wire-type-sensitive: round 1's only red row
    (nested_terms) was a DuckDB HUGEINT window-SUM vs Spark BIGINT with
    identical values. This check catches that class locally."""
    t = t.lower()
    if t in ("hugeint", "uhugeint", "int128"):
        return "HUGEINT(cast to BIGINT in the oracle!)"
    if t.startswith("decimal"):
        return "DECIMAL(cast to DOUBLE/BIGINT in the oracle!)"
    if t in ("tinyint", "smallint", "int", "integer", "bigint",
             "utinyint", "usmallint", "uinteger", "ubigint"):
        return "int"
    if t in ("float", "double", "real"):
        return "float"
    if t in ("varchar", "string", "text"):
        return "str"
    if t in ("boolean", "bool"):
        return "bool"
    if t.startswith("timestamp"):
        return "ts"
    if t == "date":
        return "date"
    if t.startswith("array") or t.endswith("[]") or t.startswith("list"):
        return "list"
    return t


# Two tiers (VERDICT r10 "What's wrong" #1 — the full 382-query mirror
# pushed the suite past the driver's pytest budget): the DRIVER WINDOW
# (the first 50 queries() entries — exactly the set the driver's own
# correctness gate re-verifies) stays in the default tier; every query
# beyond the window is slow-marked and runs with
# `pytest -m "slow or not slow"` (the full-mirror pre-commit run the
# optimization rounds use at land time).
_WINDOW = set(list(entrymod.queries().keys())[:50])


def _tiered(name: str):
    if name in _WINDOW:
        return name
    return pytest.param(name, marks=pytest.mark.slow)


@pytest.mark.parametrize(
    "name", [_tiered(n) for n in sorted(entrymod.queries().keys())]
)
def test_query_matches_oracle(spark, ddb, name):
    qfn = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    sdf = qfn(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    if sql is None:
        assert len(spark_rows) >= 0
        return
    rel = ddb.sql(sql)
    duck_cols = rel.columns
    duck_rows = rel.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    spark_types = {c: _type_family(t) for c, t in sdf.dtypes}
    duck_types = {
        c: _type_family(str(t)) for c, t in zip(duck_cols, rel.types)
    }
    type_mismatch = {
        c: (spark_types[c], duck_types[c])
        for c in spark_types
        if spark_types[c] != duck_types[c]
    }
    assert not type_mismatch, (
        f"{name}: wire-type family mismatch (driver hash will diverge even "
        f"on equal values): {type_mismatch}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    s_norm = _norm_rows(spark_cols, spark_rows)
    d_norm = _norm_rows(duck_cols, duck_rows)
    mismatches = [
        (a, b) for a, b in zip(s_norm, d_norm) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["l_returnflag", "doc_count"]
