"""Engine-portable deterministic hashing.

Dedup/fingerprint operators need a hash that computes IDENTICAL values on
Spark (the engine) and DuckDB (the correctness oracle). Neither engine's
native hash family matches the other (Spark xxhash64 vs DuckDB hash), so we
derive a 60-bit integer from the md5 hex digest — md5 is identical everywhere.

60 bits (15 hex chars) keeps the value strictly positive in a signed 64-bit
integer on both engines, and leaves headroom so ``a*h + b`` in the MinHash
universal-hash family stays within int64 after the mod-P reduction.

Spark production note: for pipelines that never leave Spark, swap
``hash64_sql(dialect='spark')`` for ``xxhash64`` — one JVM call instead of
md5+conv. The md5 path exists for cross-engine verifiability; both are
codegen'd, shuffle-free column expressions.
"""

from __future__ import annotations

MERSENNE_P = 2147483647  # 2^31 - 1, the MinHash universal-hash modulus


def hash64_sql(expr: str, dialect: str) -> str:
    """60-bit non-negative integer hash of a string expression."""
    if dialect == "spark":
        return f"CAST(CONV(SUBSTRING(MD5({expr}), 1, 15), 16, 10) AS BIGINT)"
    if dialect == "duckdb":
        return f"CAST('0x' || SUBSTRING(MD5({expr}), 1, 15) AS BIGINT)"
    raise ValueError(f"unknown dialect: {dialect}")


def hash_full64_sql(expr: str, dialect: str) -> str:
    """TRUE 64-bit signed hash (all 64 bits live) of a string expression,
    identical on both engines. A single 16-hex-char parse would overflow
    a signed BIGINT for values >= 2^63, so the value is composed from two
    32-bit halves of the md5: ``signed(hi) * 2^32 + lo`` — ``signed(hi)``
    maps the high half into int32 range first, so every partial result
    stays within int64 (no ANSI overflow). Use this where bit COVERAGE
    matters (SimHash sketches); ``hash64_sql`` (60-bit, non-negative)
    remains the arithmetic-friendly default for sampling/minhash."""
    if dialect == "spark":
        hi = f"CAST(CONV(SUBSTRING(MD5({expr}), 1, 8), 16, 10) AS BIGINT)"
        lo = f"CAST(CONV(SUBSTRING(MD5({expr}), 9, 8), 16, 10) AS BIGINT)"
    elif dialect == "duckdb":
        hi = f"CAST('0x' || SUBSTRING(MD5({expr}), 1, 8) AS BIGINT)"
        lo = f"CAST('0x' || SUBSTRING(MD5({expr}), 9, 8) AS BIGINT)"
    else:
        raise ValueError(f"unknown dialect: {dialect}")
    return (
        f"((CASE WHEN {hi} >= 2147483648 THEN {hi} - 4294967296 "
        f"ELSE {hi} END) * 4294967296 + {lo})"
    )


def minhash_params(k: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for k universal hash functions
    h_i(x) = (a_i * (x mod P) + b_i) mod P. Plain LCG expansion of the seed
    so both engines (and tests) derive the same family from (k, seed)."""
    params = []
    state = seed
    for _ in range(k):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (state % (MERSENNE_P - 1)) + 1  # a in [1, P-1]
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % MERSENNE_P  # b in [0, P-1]
        params.append((a, b))
    return params


def minhash_term_sql(hash_expr: str, a: int, b: int) -> str:
    """One universal-hash application, int64-overflow-safe in both engines:
    (a * (h mod P) + b) mod P with a < P and (h mod P) < P => product < 2^62.
    """
    return f"(({a} * (({hash_expr}) % {MERSENNE_P}) + {b}) % {MERSENNE_P})"


def hll_cardinality_sql(
    table: str, field: str, dialect: str, *, p: int = 12
) -> str:
    """HyperLogLog distinct-count estimate, built from the shared 60-bit
    hash so BOTH engines compute the IDENTICAL estimate — unlike the
    engines' built-in approx_count_distinct sketches, which disagree by
    construction. The 100 TB ``cardinality`` path: one map-combinable
    (bucket, max rho) agg over <= 2^p register rows, merge = MAX.

    Layout: bucket = hash % m (m = 2^p); z = hash DIV m (the remaining
    ~48 bits); rho = 49 - bitlength(z) (leading-zero rank in the 48-bit
    window, via length(bin(z)) — exact integer path, no float log).
    Estimate: alpha_m * m^2 / (sum 2^-r + zero-registers), with the
    standard linear-counting small-range correction (E <= 2.5m). The
    upper-range correction is omitted — the 60-bit hash space makes
    hash collisions negligible at any corpus this engine targets
    (documented pin). Rounded to 4 (float-sum association slack across
    engines is ~1e-10 relative; 4 decimals is far outside it).
    """
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    # hash the value's decimal/string rendering (same text both engines)
    cast = "STRING" if dialect == "spark" else "VARCHAR"
    h = hash64_sql(f"CAST({field} AS {cast})", dialect)
    # integer division must stay on the int64 path: h / float(m) would
    # round the 60-bit hash to 53 bits first
    z = f"(({h}) DIV {m})" if dialect == "spark" else f"(({h}) // {m})"
    return f"""
WITH regs AS (
  SELECT ({h}) % {m} AS bucket,
         MAX(CASE WHEN {z} = 0 THEN 49
                  ELSE 49 - length(bin({z})) END) AS r
  FROM {table} WHERE {field} IS NOT NULL
  GROUP BY 1
), s AS (
  SELECT SUM(POWER(2.0, -r)) AS sum2, COUNT(*) AS nreg FROM regs
)
SELECT ROUND(
  CASE WHEN CAST({alpha!r} AS DOUBLE) * {m} * {m} / (sum2 + ({m} - nreg))
            <= 2.5 * {m}
        AND {m} - nreg > 0
       THEN {m} * ln(CAST({m} AS DOUBLE) / ({m} - nreg))
       ELSE CAST({alpha!r} AS DOUBLE) * {m} * {m} / (sum2 + ({m} - nreg))
  END, 4) AS estimate
FROM s
"""


def hll_cardinality_by_sql(
    table: str, group_col: str, field: str, dialect: str, *, p: int = 12
) -> str:
    """Per-group twin of :func:`hll_cardinality_sql` (same registers,
    same estimator, keyed by ``group_col``)."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    cast = "STRING" if dialect == "spark" else "VARCHAR"
    h = hash64_sql(f"CAST({field} AS {cast})", dialect)
    z = f"(({h}) DIV {m})" if dialect == "spark" else f"(({h}) // {m})"
    return f"""
WITH regs AS (
  SELECT {group_col} AS grp, ({h}) % {m} AS bucket,
         MAX(CASE WHEN {z} = 0 THEN 49
                  ELSE 49 - length(bin({z})) END) AS r
  FROM {table} WHERE {field} IS NOT NULL AND {group_col} IS NOT NULL
  GROUP BY 1, 2
), s AS (
  SELECT grp, SUM(POWER(2.0, -r)) AS sum2, COUNT(*) AS nreg
  FROM regs GROUP BY grp
)
SELECT grp AS {group_col}, ROUND(
  CASE WHEN CAST({alpha!r} AS DOUBLE) * {m} * {m} / (sum2 + ({m} - nreg))
            <= 2.5 * {m}
        AND {m} - nreg > 0
       THEN {m} * ln(CAST({m} AS DOUBLE) / ({m} - nreg))
       ELSE CAST({alpha!r} AS DOUBLE) * {m} * {m} / (sum2 + ({m} - nreg))
  END, 4) AS estimate
FROM s ORDER BY {group_col}
"""
