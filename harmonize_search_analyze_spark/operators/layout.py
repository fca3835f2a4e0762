"""Z-order (Morton-curve) data layout — multi-column data skipping.

At 100 TB the scan you avoid is worth more than the scan you optimize:
parquet readers prune row groups / files whose column min-max stats
exclude the predicate, but sorting by ONE column destroys locality for
every other column. Interleaving the bits of several columns' rank
buckets (the Morton / Z-order curve) gives every interleaved column
tight per-file spans simultaneously, so selective filters on ANY of
them skip most files (the Delta Lake / Databricks OPTIMIZE ZORDER BY
idea, rebuilt here as plain deterministic column expressions — no
engine extension needed).

Everything is a pure SQL expression over in-plan (min, max) bounds
(one map-combinable agg, broadcast back): bucket each column to
``bits``-bit ranks, interleave with shift-and-mask terms — codegen'd,
shuffle-free. ``zorder_write`` then range-partitions on the key (one
shuffle — the unavoidable layout cost) and sorts within partitions so
file-level stats are tight on every dimension at once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_DEFAULT_BITS = 16


def _shl(x: str, n: int, dialect: str) -> str:
    if n == 0:
        return x
    if dialect == "spark":
        return f"shiftleft({x}, {n})"
    return f"({x} << {n})"


def _shr(x: str, n: int, dialect: str) -> str:
    if n == 0:
        return x
    if dialect == "spark":
        return f"shiftright({x}, {n})"
    return f"({x} >> {n})"


def zorder_key_sql(
    cols: list[str],
    bounds: dict[str, tuple[str, str]],
    dialect: str,
    *,
    bits: int = _DEFAULT_BITS,
) -> str:
    """Morton key expression: each column scales to a ``bits``-bit rank
    against its (min, max) bound expressions, then bit b of column i
    lands at interleaved position b*n_cols + (n_cols-1-i). n_cols*bits
    must stay under 63 (signed BIGINT)."""
    n = len(cols)
    if n < 2:
        raise ValueError("z-order needs >= 2 columns (one column: sort)")
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits exceeds the BIGINT key")
    top = (1 << bits) - 1
    terms = []
    for i, c in enumerate(cols):
        lo, hi = bounds[c]
        # rank bucket in [0, 2^bits): half-open scaling, max pinned to
        # top. NULL must stay NULL explicitly — both engines' greatest()
        # IGNORES nulls (greatest(0, NULL) = 0), which would silently
        # rank a NULL as the minimum instead of voiding the key.
        rank = (
            f"CASE WHEN {c} IS NULL THEN CAST(NULL AS BIGINT) "
            f"ELSE CAST(least(CAST({top} AS BIGINT), "
            f"greatest(CAST(0 AS BIGINT), "
            f"CAST(floor((CAST({c} AS DOUBLE) - ({lo})) / "
            f"nullif((({hi}) - ({lo})), 0.0) * {top} + 0.5) AS BIGINT))) "
            f"AS BIGINT) END"
        )
        for b in range(bits):
            bit = f"({_shr(rank, b, dialect)} & CAST(1 AS BIGINT))"
            pos = b * n + (n - 1 - i)
            terms.append(_shl(bit, pos, dialect))
    return "(" + " + ".join(terms) + ")"


def zorder_key(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = _DEFAULT_BITS,
    key_col: str = "zkey",
) -> DataFrame:
    """Append the Morton key column. Bounds come from one
    map-combinable (min, max per column) agg broadcast back — the only
    pre-pass; the key itself is a codegen'd projection. NULLs in any
    interleaved column yield a NULL key (sorted last by zorder_write)."""
    aggs = []
    bounds: dict[str, tuple[str, str]] = {}
    for c in cols:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"__lo_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"__hi_{c}"))
        bounds[c] = (f"__lo_{c}", f"__hi_{c}")
    b = df.agg(*aggs)
    expr = zorder_key_sql(cols, bounds, "spark", bits=bits)
    return (
        df.crossJoin(F.broadcast(b))
        .withColumn(key_col, F.expr(expr))
        .drop(*[n for c in cols for n in (f"__lo_{c}", f"__hi_{c}")])
    )


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    n_files: int = 32,
    bits: int = _DEFAULT_BITS,
    mode: str = "overwrite",
) -> None:
    """OPTIMIZE ... ZORDER BY: range-partition on the Morton key into
    ``n_files`` output files and sort within each, so per-file min-max
    stats are tight on EVERY interleaved column and selective filters
    on any of them prune files at scan time."""
    keyed = zorder_key(df, cols, bits=bits)
    (
        keyed.repartitionByRange(n_files, F.col("zkey"))
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode(mode)
        .parquet(path)
    )
