"""ES date-math parser vectors + compiler integration.

Reference shape: the webapp's global time filter is from:"now-20y", to:"now"
(services/webapp/src/config.js:31-32); Kibana's time picker emits the same
grammar ("Date Math", public ES reference)."""

from __future__ import annotations

import datetime as dt

import pytest

from harmonize_search_analyze_spark.functions.datemath import (
    DateMathError,
    is_date_math,
    parse_date_math,
)

NOW = dt.datetime(2024, 1, 20, 12, 34, 56, 789000)


@pytest.mark.parametrize("expr,round_up,expected", [
    ("now", False, NOW),
    ("now-20y", False, dt.datetime(2004, 1, 20, 12, 34, 56, 789000)),
    ("now+1d", False, dt.datetime(2024, 1, 21, 12, 34, 56, 789000)),
    ("now-90d", False, dt.datetime(2023, 10, 22, 12, 34, 56, 789000)),
    ("now/d", False, dt.datetime(2024, 1, 20)),
    ("now/d", True, dt.datetime(2024, 1, 20, 23, 59, 59, 999000)),
    ("now-7d/d", False, dt.datetime(2024, 1, 13)),
    ("now/M", False, dt.datetime(2024, 1, 1)),
    ("now/M", True, dt.datetime(2024, 1, 31, 23, 59, 59, 999000)),
    ("now/y", False, dt.datetime(2024, 1, 1)),
    ("now/w", False, dt.datetime(2024, 1, 15)),        # Monday of that week
    ("now+6h/h", False, dt.datetime(2024, 1, 20, 18)),
    ("now-1M", False, dt.datetime(2023, 12, 20, 12, 34, 56, 789000)),
    # calendar-aware: Jan 31 - 1M clamps to Dec 31; Mar 31 + 1M -> Apr 30
    ("2024-01-31||-1M", False, dt.datetime(2023, 12, 31)),
    ("2024-03-31||+1M", False, dt.datetime(2024, 4, 30)),
    # ES docs example: anchored date plus month, rounded to day
    ("2001-02-01||+1M/d", False, dt.datetime(2001, 3, 1)),
    ("2024-02-29||+1y", False, dt.datetime(2025, 2, 28)),  # leap clamp
    ("2024-01-05", False, dt.datetime(2024, 1, 5)),        # plain ISO
])
def test_parse_vectors(expr, round_up, expected):
    assert parse_date_math(expr, now=NOW, round_up=round_up) == expected


def test_tz_aware_now_normalized_to_utc():
    aware = dt.datetime(2024, 1, 20, 7, 34, 56,
                        tzinfo=dt.timezone(dt.timedelta(hours=-5)))
    assert parse_date_math("now", now=aware) == dt.datetime(2024, 1, 20, 12, 34, 56)


@pytest.mark.parametrize("expr", [
    "now-", "now-d", "now/5d", "nowhere", "now+1q", "2024-13-01||+1d",
    "now+1d extra",
])
def test_parse_errors(expr):
    with pytest.raises(DateMathError):
        parse_date_math(expr, now=NOW)


def test_is_date_math():
    assert is_date_math("now-20y")
    assert is_date_math("2024-01-01||+1M")
    assert not is_date_math("2024-01-01")
    assert not is_date_math(1700000000000)
    assert not is_date_math(None)


def test_compile_query_date_math(spark):
    """gte rounds down, lte rounds up — the ES range semantics."""
    from harmonize_search_analyze_spark.plans.compiler import compile_query

    rows = [(1, dt.datetime(2024, 1, 13, 0, 0, 0)),    # = gte bound: in
            (2, dt.datetime(2024, 1, 12, 23, 59, 59)),  # before: out
            (3, dt.datetime(2024, 1, 20, 23, 59, 59)),  # end of day: in
            (4, dt.datetime(2024, 1, 21, 0, 0, 0))]     # next day: out
    df = spark.createDataFrame(rows, ["id", "ts"])
    ast = {"range": {"ts": {"gte": "now-7d/d", "lte": "now/d"}}}
    got = sorted(r["id"] for r in df.where(compile_query(ast, now=NOW)).collect())
    assert got == [1, 3]


def test_dashboard_date_math_bounds(spark):
    from harmonize_search_analyze_spark.operators.aggregations import dashboard

    rows = [(1, dt.datetime(2024, 1, 19, 5, 0)),
            (2, dt.datetime(2024, 1, 2, 5, 0))]
    df = spark.createDataFrame(rows, ["id", "ts"])
    panels = {"n": lambda d: d.groupBy().count()}
    out = dashboard(df, panels, time_field="ts",
                    time_from="now-7d/d", time_to="now/d", now=NOW)
    assert out["n"].collect()[0]["count"] == 1
