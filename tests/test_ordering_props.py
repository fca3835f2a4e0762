"""Hypothesis property tests for the deterministic scalable-ordering
primitives (round 7): prefix_sums / ntile_scalable must match the
single-window ground truth for ANY key distribution, direction, and
bucket count — including heavy boundary ties (which collapse buckets)
and n < buckets edge shapes."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st


def _py_ntile(n: int, b: int) -> list[int]:
    """Reference NTILE sizes: first n % b tiles get one extra row."""
    q, r = divmod(n, b)
    out = []
    tile = 1
    for t in range(b):
        size = q + (1 if t < r else 0)
        out += [tile] * size
        tile += 1
    return out[:n]


@settings(max_examples=8, deadline=None)
@given(
    keys=st.lists(
        st.integers(-10_000, 10_000), min_size=1, max_size=120,
        unique=True,
    ),
    weights=st.data(),
    asc=st.booleans(),
    parts=st.integers(2, 9),
)
def test_prefix_sums_property(spark, keys, weights, asc, parts):
    from pyspark.sql import functions as F  # noqa: F401

    from harmonize_search_analyze_spark.operators.ordering import (
        prefix_sums,
    )

    ws = weights.draw(
        st.lists(
            st.integers(0, 50),
            min_size=len(keys), max_size=len(keys),
        )
    )
    rows = [(float(k), w) for k, w in zip(keys, ws)]
    df = spark.createDataFrame(rows, "k double, w int")
    got = {
        r.k: r.cum
        for r in prefix_sums(
            df, [("k", asc)], {"w": "cum"}, num_partitions=parts
        ).collect()
    }
    ordered = sorted(rows, key=lambda t: t[0], reverse=not asc)
    run = 0
    for k, w in ordered:
        run += w
        assert got[k] == run, (k, asc, parts)


@settings(max_examples=8, deadline=None)
@given(
    keys=st.lists(
        st.integers(-10_000, 10_000), min_size=1, max_size=120,
        unique=True,
    ),
    b=st.integers(1, 15),
    asc=st.booleans(),
    parts=st.integers(2, 9),
)
def test_ntile_scalable_property(spark, keys, b, asc, parts):
    from harmonize_search_analyze_spark.operators.ordering import (
        ntile_scalable,
    )

    rows = [(float(k),) for k in keys]
    df = spark.createDataFrame(rows, "k double")
    got = {
        r.k: r.tile
        for r in ntile_scalable(
            df, [("k", asc)], b, "tile", num_partitions=parts
        ).collect()
    }
    ordered = sorted(keys, reverse=not asc)
    expected = _py_ntile(len(keys), b)
    for k, tile in zip(ordered, expected):
        assert got[float(k)] == tile, (k, b, asc, parts)
