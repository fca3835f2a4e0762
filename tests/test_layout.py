"""Z-order layout: the multi-column data-skipping property, measured.

A single-column sort gives tight per-file spans on that column and
random spans on every other; the Morton interleave bounds BOTH. The
span test reads the written files back and measures actual per-file
min-max widths — the statistic the parquet pruner uses."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from harmonize_search_analyze_spark.operators.layout import (
    zorder_key,
    zorder_write,
)


def _mean_file_span(spark, path: str, col: str) -> float:
    df = spark.read.parquet(path).withColumn(
        "__f", F.input_file_name()
    )
    spans = (
        df.groupBy("__f")
        .agg((F.max(col) - F.min(col)).alias("span"))
        .agg(F.avg("span"))
        .collect()[0][0]
    )
    return float(spans)


def test_zorder_bounds_both_columns(spark, tmp_path):
    """On a 2-d uniform grid, z-order files have small spans on BOTH
    axes; an x-sorted layout leaves y spans at full range."""
    n = 128
    rows = [
        (float(i), float((i * 73) % n)) for i in range(n * n // 16)
    ]
    df = spark.createDataFrame(rows, ["x", "y"])
    zp, xp = str(tmp_path / "z"), str(tmp_path / "x")
    zorder_write(df, zp, ["x", "y"], n_files=16, bits=10)
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(xp)
    )
    full_y = max(r[1] for r in rows) - min(r[1] for r in rows)
    zy, xy = _mean_file_span(spark, zp, "y"), _mean_file_span(spark, xp, "y")
    zx = _mean_file_span(spark, zp, "x")
    # x-sorted: y spans ~ full range; z-order: y spans a fraction of it
    assert xy > 0.8 * full_y
    assert zy < 0.5 * full_y, (zy, full_y)
    # and x locality is retained too (16 files -> ~1/4 range per file
    # on the z-curve; assert well under half)
    full_x = max(r[0] for r in rows)
    assert zx < 0.5 * full_x, (zx, full_x)
    # round-trip preserves rows
    assert spark.read.parquet(zp).count() == len(rows)


def test_zorder_key_interleave_exact(spark):
    """Hand-checked Morton values: 2 cols x 2 bits over the unit
    square's corner points."""
    df = spark.createDataFrame(
        [(0.0, 0.0), (0.0, 3.0), (3.0, 0.0), (3.0, 3.0), (1.0, 2.0)],
        ["a", "b"],
    )
    got = {
        (r.a, r.b): r.zkey
        for r in zorder_key(df, ["a", "b"], bits=2).collect()
    }
    # rank == value here (bounds 0..3, top=3). Bit b of col i sits at
    # position b*2 + (1-i): col a on odd bits, col b on even bits.
    def morton(a: int, b: int) -> int:
        out = 0
        for bit in range(2):
            out |= ((a >> bit) & 1) << (bit * 2 + 1)
            out |= ((b >> bit) & 1) << (bit * 2)
        return out

    for (a, b), k in got.items():
        assert k == morton(int(a), int(b)), ((a, b), k)


def test_zorder_validation_and_nulls(spark):
    import pytest

    df = spark.createDataFrame(
        [(1.0, 2.0, None)], "a double, b double, c double"
    )
    with pytest.raises(ValueError, match=">= 2 columns"):
        zorder_key(df, ["a"])
    with pytest.raises(ValueError, match="BIGINT"):
        zorder_key(df, ["a", "b"], bits=32)
    # NULL in an interleaved column -> NULL key, no crash
    out = zorder_key(df, ["a", "c"], bits=4).collect()
    assert out[0].zkey is None
