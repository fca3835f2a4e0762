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


# --- interval_join (binned range join) ----------------------------------


@pytest.fixture(scope="module")
def interval_frames(spark):
    points = spark.createDataFrame(
        [
            (1, "k1", 105.0),   # inside [100, 120]
            (2, "k1", 120.0),   # inclusive end
            (3, "k1", 100.0),   # inclusive start
            (4, "k1", 121.0),   # outside
            (5, "k1", 215.0),   # interval spans a bucket boundary
            (6, "k2", 105.0),   # other key: no intervals
        ],
        "pid INT, k STRING, t DOUBLE",
    )
    intervals = spark.createDataFrame(
        [
            (100, "k1", 100.0, 120.0),
            (101, "k1", 190.0, 220.0),  # crosses the 200 grain boundary
            (102, "k1", 0.0, 999.0),    # longer than grain -> dropped
        ],
        "iid INT, k STRING, s DOUBLE, e DOUBLE",
    )
    return points, intervals


def _pairs(points, intervals, grain=100, mode="allow"):
    from harmonize_search_analyze_spark.operators.joins import interval_join

    out = interval_join(
        points, intervals, on="k", point_time="t", start="s", end="e",
        grain_seconds=grain, on_over_grain=mode,
    )
    return sorted((r["pid"], r["iid"]) for r in out.collect())


def test_interval_join_inclusive_bounds(interval_frames):
    points, intervals = interval_frames
    got = _pairs(points, intervals)
    assert (1, 100) in got and (2, 100) in got and (3, 100) in got
    assert (4, 100) not in got


def test_interval_join_bucket_boundary_span(interval_frames):
    """An interval crossing a grain boundary still catches points in its
    second bucket — and yields the pair exactly once (no dedupe pass)."""
    points, intervals = interval_frames
    got = _pairs(points, intervals)
    assert got.count((5, 101)) == 1


def test_interval_join_over_grain_is_loud(interval_frames):
    """An interval longer than the grain must never vanish silently
    (round-1 verdict item 5): default mode raises; 'count' mode excludes
    but reports via observe(); 'allow' opts into the silent exclusion."""
    from harmonize_search_analyze_spark.operators.joins import interval_join

    points, intervals = interval_frames
    with pytest.raises(Exception, match="grain contract"):
        interval_join(points, intervals, on="k", point_time="t",
                      start="s", end="e", grain_seconds=100).collect()
    out = interval_join(points, intervals, on="k", point_time="t",
                        start="s", end="e", grain_seconds=100,
                        on_over_grain="count")
    got = sorted((r["pid"], r["iid"]) for r in out.collect())
    assert not any(i == 102 for _, i in got)
    assert out._interval_join_drops.get["over_grain_dropped"] == 1
    # 'allow': silent exclusion, same join output
    assert got == _pairs(points, intervals, mode="allow")
    # a conforming interval set passes the default eager check untouched
    ok = intervals.where("iid != 102")
    strict = interval_join(points, ok, on="k", point_time="t",
                           start="s", end="e", grain_seconds=100)
    assert sorted((r["pid"], r["iid"]) for r in strict.collect()) == \
        [p for p in got]


def test_interval_join_key_isolation(interval_frames):
    points, intervals = interval_frames
    assert not any(p == 6 for p, _ in _pairs(points, intervals))


def test_interval_join_timestamp_columns(spark):
    import datetime as dt

    from harmonize_search_analyze_spark.operators.joins import interval_join

    points = spark.createDataFrame(
        [(1, "k", dt.datetime(2024, 1, 5))], "pid INT, k STRING, t TIMESTAMP"
    )
    intervals = spark.createDataFrame(
        [(9, "k", dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 31))],
        "iid INT, k STRING, s TIMESTAMP, e TIMESTAMP",
    )
    out = interval_join(
        points, intervals, on="k", point_time="t", start="s", end="e",
        grain_seconds=31 * 86400,
    )
    assert [(r["pid"], r["iid"]) for r in out.collect()] == [(1, 9)]


def test_has_child_has_parent(spark):
    """ES join-field queries: min/max children window, the semi-join
    fast path, null-key hygiene, and child passthrough."""
    import pytest as _pytest

    from harmonize_search_analyze_spark.operators.joins import (
        has_child,
        has_parent,
    )
    from pyspark.sql import functions as F

    parent = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], ["pk", "seg"]
    )
    child = spark.createDataFrame(
        [(10, 1, "x"), (11, 1, "x"), (12, 1, "x"),
         (13, 2, "x"), (14, 3, "y"), (15, None, "x")],
        ["ck", "fk", "tag"],
    )
    x = F.col("tag") == "x"

    # semi-join fast path: >= 1 matching child
    got = has_child(parent, child, parent_key="pk", child_key="fk",
                    child_pred=x)
    assert {r.pk for r in got.collect()} == {1, 2}

    # counted window: between 2 and 3 children
    got = has_child(parent, child, parent_key="pk", child_key="fk",
                    child_pred=x, min_children=2, max_children=3)
    assert {r.pk for r in got.collect()} == {1}

    # max only excludes the over-full parent
    got = has_child(parent, child, parent_key="pk", child_key="fk",
                    child_pred=x, min_children=1, max_children=2)
    assert {r.pk for r in got.collect()} == {2}

    with _pytest.raises(ValueError):
        has_child(parent, child, parent_key="pk", child_key="fk",
                  min_children=0)

    # has_parent: children of parents in segment a/c; null-fk child dropped
    got = has_parent(child, parent, parent_key="pk", child_key="fk",
                     parent_pred=F.col("seg").isin("a", "c"))
    assert {r.ck for r in got.collect()} == {10, 11, 12, 14}
    assert set(got.columns) == {"ck", "fk", "tag"}


def test_children_agg_counts(spark):
    """ES children agg: parent buckets with child doc counts; bucket
    with no children keeps child_count 0."""
    from harmonize_search_analyze_spark.operators.joins import children_agg

    parents = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "c")], ["pid", "grp"]
    )
    children = spark.createDataFrame(
        [(10, 1), (11, 1), (12, 2), (13, 3)], ["cid", "parent"]
    )
    got = [(r.bucket, r.parent_count, r.child_count) for r in children_agg(
        parents, children, parent_key="pid", child_key="parent",
        bucket_field="grp").collect()]
    assert got == [("a", 2, 3), ("b", 1, 1), ("c", 1, 0)]


def test_parent_agg_orphans_and_distinct(spark):
    """parent agg: child rows count per bucket; parent_count counts each
    parent ONCE per bucket and ignores orphan children."""
    from harmonize_search_analyze_spark.operators.joins import parent_agg

    parents = spark.createDataFrame([(1,), (2,)], ["pk"])
    children = spark.createDataFrame(
        [  # bucket a: children of p1 (x2) and p2, plus an orphan
            (1, "a"), (1, "a"), (2, "a"), (99, "a"),
            # bucket b: one child of p1
            (1, "b"),
        ],
        ["ck", "bucket"],
    )
    got = [(r.bucket, r.child_count, r.parent_count) for r in parent_agg(
        parents, children, parent_key="pk", child_key="ck",
        bucket_field="bucket",
    ).collect()]
    assert got == [("a", 4, 2), ("b", 1, 1)]


def test_geoip_enrich_bucketed_join(spark):
    """geoip: inclusive bounds; non-matching IPs keep NULL attrs; ranges
    spanning several /16 blocks still match; plan is a BROADCAST
    equi-join, not a nested loop."""
    from harmonize_search_analyze_spark.operators.joins import geoip_enrich

    df = spark.createDataFrame(
        [(1, "10.0.0.5"), (2, "10.0.255.255"), (3, "10.3.0.1"),
         (4, "10.1.200.9")],
        ["id", "ip"],
    )
    ranges = spark.createDataFrame(
        [("10.0.0.0", "10.1.255.255", "US"),  # spans two /16 blocks
         ("10.2.0.0", "10.2.0.255", "DE")],
        ["start_ip", "end_ip", "country"],
    )
    out = geoip_enrich(df, "ip", ranges)
    got = {r.id: r.country for r in out.collect()}
    assert got == {1: "US", 2: "US", 3: None, 4: "US"}
    plan = out._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in plan, plan
    assert "NestedLoop" not in plan, plan
