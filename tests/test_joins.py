"""Unit semantics for operators/joins.py asof_join: inclusive boundary,
(key,time) tie resolution, tolerance nulling, left-outer rows, and the
single-shuffle plan shape."""

from __future__ import annotations

import datetime as dt

import pytest

from harmonize_search_analyze_spark.operators.joins import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01 10:00:00"), "p1"),
            (2, "u1", _ts("2024-01-01 12:00:00"), "p2"),
            (3, "u2", _ts("2024-01-01 09:00:00"), "p3"),  # no prior right
            (4, "u2", _ts("2024-01-01 11:00:00"), "p4"),  # exact-ts match
        ],
        "lid INT, k STRING, t TIMESTAMP, lpay STRING",
    )
    right = spark.createDataFrame(
        [
            (10, "u1", _ts("2024-01-01 09:30:00"), "r-early"),
            (11, "u1", _ts("2024-01-01 11:00:00"), "r-mid"),
            (12, "u2", _ts("2024-01-01 11:00:00"), "r-tie-lo"),
            (13, "u2", _ts("2024-01-01 11:00:00"), "r-tie-hi"),
        ],
        "rid INT, k STRING, t TIMESTAMP, rpay STRING",
    )
    return left, right


def _run(left, right, **kw):
    out = asof_join(
        left, right, on="k", left_time="t", right_time="t",
        payload=["rid", "rpay"], tie_break="rid", **kw,
    )
    return {r["lid"]: r for r in out.collect()}


def test_backward_match_and_left_outer(frames):
    left, right = frames
    rows = _run(left, right)
    assert rows[1]["rpay"] == "r-early"      # latest at-or-before 10:00
    assert rows[2]["rpay"] == "r-mid"        # 11:00 < 12:00
    assert rows[3]["rpay"] is None           # u2 has nothing before 09:00
    assert rows[3]["t_right"] is None
    assert len(rows) == left.count()         # every left row survives


def test_inclusive_boundary_and_tie_break(frames):
    left, right = frames
    rows = _run(left, right)
    # left t == right t matches (inclusive), and among the two right rows
    # at the same (key, time) the max tie_break (rid=13) wins.
    assert rows[4]["rid"] == 13
    assert rows[4]["rpay"] == "r-tie-hi"


def test_tolerance_nulls_stale_matches(frames):
    left, right = frames
    rows = _run(left, right, tolerance_seconds=1800.0)
    assert rows[1]["rpay"] == "r-early"      # 30 min old == tolerance edge
    assert rows[2]["rpay"] is None           # 60 min old > 30 min tolerance
    assert rows[4]["rpay"] == "r-tie-hi"     # 0 s old


def test_left_columns_pass_through(frames):
    left, right = frames
    out = asof_join(
        left, right, on="k", left_time="t", right_time="t",
        payload=["rid", "rpay"], tie_break="rid",
    )
    assert set(out.columns) == {
        "lid", "k", "t", "lpay", "t_right", "rid", "rpay"
    }
    got = {r["lid"]: r["lpay"] for r in out.collect()}
    assert got == {1: "p1", 2: "p2", 3: "p3", 4: "p4"}


def test_single_shuffle_plan(frames):
    """The whole operator should cost ONE exchange (hash by key) — tie
    resolution must not introduce a second (key,time) repartitioning."""
    left, right = frames
    out = asof_join(
        left, right, on="k", left_time="t", right_time="t",
        payload=["rid"], tie_break="rid",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
