"""Bloom-filter prefiltered incremental dedup (the Dolma/CCNet recipe).

Production corpus-dedup systems (e.g. Dolma's deduper) test incoming
documents against a Bloom filter of everything already ingested: membership
"no" is EXACT (no false negatives), so the expensive exact check runs only
for the "maybe" fraction — duplicates plus a tunable false-positive sliver.

Spark ships a `bloom_filter_agg` expression but does not register it for
SQL/DataFrame use, so the engine expresses the same structure relationally
— which also makes the filter a first-class, saveable DataFrame:

- BUILD: the filter is a WORD TABLE ``(word_idx BIGINT, word BIGINT)`` —
  the m-bit array chunked into 64-bit words, stored sparse. Each corpus key
  contributes k bits via the same universal-hash family MinHash uses
  (portable md5-derived base hash); ``groupBy(word_idx).agg(bit_or)`` IS
  the distributed Bloom build: map-side partial bit_or per task, one
  metadata-sized shuffle of <= m/64 rows regardless of corpus size. The
  word table round-trips through parquet like the LSH signature state
  (`lsh_incremental`), so steady-state ingest never rescans the corpus.
- PROBE: k broadcast equi-joins of the batch against the (<= 8 MB for
  m = 2^26) word table, one per hash function, each map-side; a key is
  "maybe present" iff every probed word exists and has its bit set. ZERO
  shuffles on the batch path.
- VERIFY: only maybe-present rows enter the exact anti-join; the
  definitely-new majority bypasses it entirely. The final result is
  therefore EXACTLY the anti-join's (a Bloom filter has no false
  negatives; false positives are re-checked) — which is what makes the
  operator oracle-checkable against plain ``ANTI JOIN`` SQL.

At 100 TB: the corpus is folded once into m/64 words; each incremental
batch probes map-side and shuffles only its duplicate-ish sliver. Compare
`incremental_dedup` (always anti-joins the full digest state): the Bloom
path trades an md5+5-join projection for excluding the ~unique majority
of the batch from the shuffle — the win grows with batch novelty rate.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from harmonize_search_analyze_spark.functions.hashing import (
    MERSENNE_P,
    hash64_sql,
    minhash_params,
)

#: hard cap keeping the broadcast word table under ~8 MB
MAX_M_BITS = 1 << 26


def bloom_bit_positions(key_sql: str, m_bits: int, k: int, seed: int) -> list[str]:
    """SQL expressions (Spark dialect) for the k bit positions of a key:
    universal hashes of the portable 60-bit base hash, reduced mod m."""
    base = hash64_sql(key_sql, "spark")
    return [
        f"((({a} * (({base}) % {MERSENNE_P}) + {b}) % {MERSENNE_P}) % {m_bits})"
        for a, b in minhash_params(k, seed=seed)
    ]


def _validate(m_bits: int, k: int) -> None:
    if not 64 <= m_bits <= MAX_M_BITS:
        raise ValueError(
            f"m_bits must be in [64, {MAX_M_BITS}] (broadcastable), got {m_bits}"
        )
    if not 1 <= k <= 16:
        raise ValueError(f"k must be in [1, 16], got {k}")


def bloom_m_for(n_keys: int, fp_rate: float = 0.01) -> int:
    """Standard sizing: m = -n ln(p) / (ln 2)^2, rounded up to a multiple
    of 64 and capped at the broadcast bound."""
    if n_keys <= 0:
        raise ValueError(f"n_keys must be positive, got {n_keys}")
    if not 0.0 < fp_rate < 1.0:
        raise ValueError(f"fp_rate must be in (0, 1), got {fp_rate}")
    m = int(-n_keys * math.log(fp_rate) / (math.log(2) ** 2))
    m = ((m + 63) // 64) * 64
    return max(64, min(m, MAX_M_BITS))


def bloom_build(
    corpus: DataFrame,
    key_col: str,
    *,
    m_bits: int = 1 << 20,
    k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Fold a corpus key column into a sparse Bloom word table.

    Returns ``(word_idx BIGINT, word BIGINT)`` with at most ``m_bits/64``
    rows — persist it as parquet to make ingest incremental (rebuilding
    appends: union the key streams and re-aggregate, or bit_or two word
    tables together with :func:`bloom_merge`).
    """
    _validate(m_bits, k)
    positions = bloom_bit_positions(key_col, m_bits, k, seed)
    bits = corpus.select(
        F.explode(
            F.array(*[F.expr(p).cast("bigint") for p in positions])
        ).alias("__bit")
    )
    return (
        bits.select(
            F.expr("__bit DIV 64").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__bit % 64 AS INT))")
            .alias("__mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("__mask").alias("word"))
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR two word tables built with identical (m_bits, k, seed)."""
    return (
        a.unionByName(b)
        .groupBy("word_idx")
        .agg(F.bit_or("word").alias("word"))
    )


def bloom_flag_maybe(
    batch: DataFrame,
    bloom_words: DataFrame,
    key_col: str,
    *,
    m_bits: int = 1 << 20,
    k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Append ``__bloom_maybe BOOLEAN``: true iff every one of the key's k
    bits is set in the filter. k broadcast joins, all map-side — no
    shuffle of the batch."""
    _validate(m_bits, k)
    positions = bloom_bit_positions(key_col, m_bits, k, seed)
    out = batch
    for i, p in enumerate(positions):
        words = F.broadcast(
            bloom_words.select(
                F.col("word_idx").alias(f"__wi{i}"),
                F.col("word").alias(f"__wv{i}"),
            )
        )
        out = (
            out.withColumn(f"__b{i}", F.expr(p).cast("bigint"))
            .join(
                words,
                F.expr(f"__b{i} DIV 64") == F.col(f"__wi{i}"),
                "left",
            )
            .withColumn(
                f"__hit{i}",
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), CAST(__b{i} % 64 AS INT))"
                ).bitwiseAND(F.coalesce(F.col(f"__wv{i}"), F.lit(0)))
                != 0,
            )
            .drop(f"__wi{i}", f"__wv{i}", f"__b{i}")
        )
    maybe = F.lit(True)
    for i in range(k):
        maybe = maybe & F.col(f"__hit{i}")
    # NULL key => NULL bit positions => NULL hits; coalesce to FALSE so a
    # NULL-keyed row is "definitely new" — the anti-join oracle keeps such
    # rows too (NULL = x never matches), preserving exact equivalence
    return out.withColumn("__bloom_maybe", F.coalesce(maybe, F.lit(False))).drop(
        *[f"__hit{i}" for i in range(k)]
    )


def bloom_dedup(
    corpus: DataFrame,
    batch: DataFrame,
    key_col: str,
    *,
    m_bits: int = 1 << 20,
    k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Rows of ``batch`` whose ``key_col`` does NOT occur in ``corpus`` —
    exactly ``batch ANTI JOIN corpus`` (the oracle), computed as
    definitely-new (Bloom "no", bypasses the join) UNION false-positive
    survivors of the exact anti-join over the "maybe" sliver.

    Batch-internal duplicates are NOT collapsed (same contract as
    `incremental_dedup`'s batch stage — compose with `dedup_exact` first
    when the batch itself may repeat keys).
    """
    words = bloom_build(corpus, key_col, m_bits=m_bits, k=k, seed=seed)
    flagged = bloom_flag_maybe(
        batch, words, key_col, m_bits=m_bits, k=k, seed=seed
    )
    definitely_new = flagged.where(~F.col("__bloom_maybe")).drop("__bloom_maybe")
    maybe = flagged.where(F.col("__bloom_maybe")).drop("__bloom_maybe")
    verified_new = maybe.join(
        corpus.select(F.col(key_col).alias("__ck")).distinct(),
        maybe[key_col] == F.col("__ck"),
        "left_anti",
    )
    return definitely_new.unionByName(verified_new)
