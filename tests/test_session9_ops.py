"""Round-7 session tests: ANSI-safe SQL twins + this round's operators."""

from __future__ import annotations

import duckdb
import pytest


def test_spearman_sql_twin_constant_null_both_dialects(spark):
    """ADVICE r6: the spark-dialect spearman SQL twin used CORR, which
    throws DIVIDE_BY_ZERO under Spark 4 ANSI on a constant column while
    the DataFrame path returns NULL — the covar/stddev NULLIF form must
    return NULL on BOTH engines and still match on normal input."""
    from harmonize_search_analyze_spark.operators.analytics import (
        spearman_corr,
        spearman_corr_sql,
    )

    spark.createDataFrame(
        [(1.0, 5.0), (2.0, 5.0), (3.0, 5.0)], "x double, y double"
    ).createOrReplaceTempView("sp9_const")
    row = spark.sql(
        spearman_corr_sql("sp9_const", "x", "y", "spark")
    ).collect()[0]
    assert (row.n, row.rho) == (3, None)

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE sp9_const AS SELECT * FROM (VALUES"
        " (1.0,5.0),(2.0,5.0),(3.0,5.0)) t(x,y)"
    )
    assert con.execute(
        spearman_corr_sql("sp9_const", "x", "y", "duckdb")
    ).fetchall() == [(3, None)]

    # non-degenerate parity: SQL twin == DataFrame fn == duckdb
    rows = [(float(i), float((i * 7) % 13)) for i in range(40)]
    spark.createDataFrame(rows, "x double, y double").createOrReplaceTempView(
        "sp9_norm"
    )
    df_rho = spearman_corr(spark.table("sp9_norm"), "x", "y").collect()[0].rho
    sql_rho = (
        spark.sql(spearman_corr_sql("sp9_norm", "x", "y", "spark"))
        .collect()[0]
        .rho
    )
    con.execute(
        "CREATE TABLE sp9_norm AS SELECT * FROM (VALUES "
        + ",".join(f"({a},{b})" for a, b in rows)
        + ") t(x,y)"
    )
    duck_rho = con.execute(
        spearman_corr_sql("sp9_norm", "x", "y", "duckdb")
    ).fetchall()[0][1]
    assert df_rho == sql_rho == duck_rho


def test_xcorr_sql_twin_constant_null_both_dialects(spark):
    """ADVICE r6: xcorr_lags_sql kept CORR after the DataFrame fix
    (commit 248825a) — a lag whose overlap is constant-valued must
    yield NULL, not an ANSI DIVIDE_BY_ZERO crash."""
    from harmonize_search_analyze_spark.operators.analytics import (
        xcorr_lags_sql,
    )

    a = (
        "SELECT to_timestamp('2024-01-0' || i) AS bucket,"
        " CAST(i AS DOUBLE) AS v"
        " FROM (SELECT explode(sequence(1,9)) AS i)"
    )
    b = (
        "SELECT to_timestamp('2024-01-0' || i) AS bucket,"
        " CAST(5.0 AS DOUBLE) AS v"
        " FROM (SELECT explode(sequence(1,9)) AS i)"
    )
    rows = spark.sql(xcorr_lags_sql(a, b, "spark", max_lag=2)).collect()
    assert [r.lag for r in rows] == [-2, -1, 0, 1, 2]
    assert all(r.corr is None for r in rows)

    con = duckdb.connect()
    ad = (
        "SELECT TIMESTAMP '2024-01-01' + to_days(CAST(t.i AS INT))"
        " AS bucket, CAST(t.i AS DOUBLE) AS v FROM range(0,9) t(i)"
    )
    bd = (
        "SELECT TIMESTAMP '2024-01-01' + to_days(CAST(t.i AS INT))"
        " AS bucket, 5.0 AS v FROM range(0,9) t(i)"
    )
    drows = con.execute(xcorr_lags_sql(ad, bd, "duckdb", max_lag=2)).fetchall()
    assert [r[0] for r in drows] == [-2, -1, 0, 1, 2]
    assert all(r[2] is None for r in drows)
