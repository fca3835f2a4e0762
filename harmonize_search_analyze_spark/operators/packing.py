"""Sequence packing: fill fixed token-budget bins with documents.

The training-data step after curation/dedup: concatenate documents into
fixed-size context windows ("packs") so the trainer wastes no tokens on
padding. The packing rule here is **greedy first-fit-contiguous**: within a
shard, walk the documents in deterministic (doc_id) order, appending each to
the current pack; when a document would overflow the budget, close the pack
and start a new one. A single document larger than the budget gets a pack of
its own (flagged oversize — the caller chooses truncate/split downstream).

Scale shape: packing is inherently sequential *within* a bin stream, so the
operator shards the corpus by a portable hash of the id (same formula both
engines) and packs each shard independently — embarrassingly parallel across
shards, sequential only inside one Arrow batch. ``n_shards`` is the
parallelism dial: at 100 TB you run thousands of shards, each a bounded
pandas loop; no global sort, ONE shuffle on the shard key. Determinism:
(seed, n_shards, doc order) fully define the output — a retried task or a
different cluster produces identical packs, which checkpointed training
jobs depend on.

The greedy loop is the genuinely non-relational core (a running-state scan,
not a window function), so it runs as ``applyInPandas`` — the sanctioned
custom-operator path; everything around it (sharding, ordering, schema) is
plain DataFrame. The DuckDB oracle replays the identical greedy via a
recursive CTE, so even the Python loop is hash-verified by the gate.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from harmonize_search_analyze_spark.functions.hashing import hash64_sql

PACK_STRIDE = 1_000_000_000  # global pack_id = shard * stride + local pack


def shard_sql(key: str, n_shards: int, dialect: str, *, seed: int = 42) -> str:
    """Portable shard assignment: hash of ``'{seed}:' || key`` mod n_shards."""
    cast = "STRING" if dialect == "spark" else "VARCHAR"
    keyed = f"('{seed}:' || CAST({key} AS {cast}))"
    return f"CAST({hash64_sql(keyed, dialect)} % {n_shards} AS INT)"


def pack_documents(
    df: DataFrame,
    id_col: str,
    size_col: str,
    budget: int,
    *,
    n_shards: int = 32,
    seed: int = 42,
) -> DataFrame:
    """Pack rows into token-budget bins. Returns one row per input row:
    (id, size, shard, pack_id, pack_pos, oversize) where ``pack_id`` is
    globally unique (shard * PACK_STRIDE + local index), ``pack_pos`` is
    the row's 0-based position inside its pack, and ``oversize`` marks
    single documents larger than the budget (packed alone). NULL sizes are
    treated as 0 (metadata-only rows ride along)."""
    if budget < 1:
        raise ValueError("budget must be >= 1")
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")

    schema = T.StructType([
        T.StructField("shard", T.IntegerType()),
        T.StructField(id_col, df.schema[id_col].dataType),
        T.StructField("n_units", T.LongType()),
        T.StructField("pack_id", T.LongType()),
        T.StructField("pack_pos", T.IntegerType()),
        T.StructField("oversize", T.BooleanType()),
    ])

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        shard = int(pdf["shard"].iloc[0])
        sizes = pdf["__size"].fillna(0).astype("int64")
        pack_local, fill, pos = 0, 0, 0
        pack_ids, poss, oversizes = [], [], []
        for s in sizes:
            s = int(s)
            if pos > 0 and fill + s > budget:
                pack_local += 1
                fill, pos = 0, 0
            pack_ids.append(shard * PACK_STRIDE + pack_local)
            poss.append(pos)
            oversizes.append(s > budget)
            fill += s
            pos += 1
        return pd.DataFrame({
            "shard": pdf["shard"],
            id_col: pdf[id_col],
            "n_units": sizes,
            "pack_id": pack_ids,
            "pack_pos": poss,
            "oversize": oversizes,
        })

    prepared = df.select(
        F.expr(shard_sql(id_col, n_shards, "spark", seed=seed)).alias("shard"),
        F.col(id_col),
        F.col(size_col).cast("long").alias("__size"),
    )
    return prepared.groupBy("shard").applyInPandas(_pack, schema)


def pack_documents_sql(
    table: str,
    id_col: str,
    size_col: str,
    budget: int,
    *,
    n_shards: int = 32,
    seed: int = 42,
) -> str:
    """DuckDB oracle: the identical greedy replayed with a recursive CTE
    (one recursion step per within-shard row position)."""
    shard = shard_sql(id_col, n_shards, "duckdb", seed=seed)
    return f"""
WITH RECURSIVE ordered AS (
  SELECT {shard} AS shard, {id_col},
         CAST(COALESCE({size_col}, 0) AS BIGINT) AS n_units,
         ROW_NUMBER() OVER (PARTITION BY {shard} ORDER BY {id_col}) AS rn
  FROM {table}
), packed AS (
  SELECT shard, {id_col}, n_units, rn,
         CAST(0 AS BIGINT) AS pack_local, 0 AS pack_pos, n_units AS fill
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.shard, o.{id_col}, o.n_units, o.rn,
         CASE WHEN p.fill + o.n_units > {budget}
              THEN p.pack_local + 1 ELSE p.pack_local END,
         CASE WHEN p.fill + o.n_units > {budget}
              THEN 0 ELSE p.pack_pos + 1 END,
         CASE WHEN p.fill + o.n_units > {budget}
              THEN o.n_units ELSE p.fill + o.n_units END
  FROM ordered o JOIN packed p ON o.shard = p.shard AND o.rn = p.rn + 1
)
SELECT shard, {id_col}, n_units,
       shard * CAST({PACK_STRIDE} AS BIGINT) + pack_local AS pack_id,
       pack_pos, n_units > {budget} AS oversize
FROM packed
"""


def pack_summary(packed: DataFrame, budget: int) -> DataFrame:
    """Pack-level utilization rollup: docs per pack, fill, waste — the
    padding-efficiency metric the packing exists to optimize."""
    return (
        packed.groupBy("pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_units").alias("fill"),
        )
        .withColumn(
            "waste",
            F.when(
                F.col("fill") < budget, F.lit(budget) - F.col("fill")
            ).otherwise(F.lit(0)),
        )
    )


# -- chunking -----------------------------------------------------------------


def chunk_documents(
    df: DataFrame,
    *,
    chunk_tokens: int = 32,
    stride: int = 24,
    doc_id: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into overlapping fixed-size token windows —
    the complement of packing: packing joins short documents, chunking
    splits long ones (RAG indexing / fixed-context pretraining both want
    ``chunk_tokens``-sized pieces with ``chunk_tokens - stride`` tokens of
    overlap for boundary context).

    Returns (doc_id, chunk_idx, n_tokens, chunk_text): window i covers
    tokens [i*stride, i*stride + chunk_tokens); the last window may be
    short; windows starting at or past the end are not emitted, and every
    document emits at least one chunk. Pure column expressions
    (sequence -> explode -> slice -> concat_ws): map-only, codegen'd,
    scan-bound at 100 TB — no shuffle, no Python.
    """
    if not (0 < stride <= chunk_tokens):
        raise ValueError("need 0 < stride <= chunk_tokens")
    from harmonize_search_analyze_spark.operators.text import tokens_sql

    toks = tokens_sql(text_col, "spark")
    return (
        df.select(
            doc_id,
            F.expr(toks).alias("__toks"),
        )
        .select(
            doc_id,
            F.posexplode(
                F.expr(
                    f"sequence(0, greatest(size(__toks) - 1, 0), {stride})"
                )
            ).alias("chunk_idx", "__start"),
            F.col("__toks"),
        )
        .select(
            F.col(doc_id),
            F.col("chunk_idx"),
            F.expr(
                f"size(slice(__toks, __start + 1, {chunk_tokens}))"
            ).cast("bigint").alias("n_tokens"),
            F.expr(
                f"concat_ws(' ', slice(__toks, __start + 1, {chunk_tokens}))"
            ).alias("chunk_text"),
        )
        .where(F.col("n_tokens") > 0)
    )


def chunk_oracle_sql(
    doc_table: str,
    *,
    chunk_tokens: int = 32,
    stride: int = 24,
    doc_id: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB SQL replaying chunk_documents (same windows, same joins)."""
    from harmonize_search_analyze_spark.operators.text import tokens_sql

    toks = tokens_sql(text_col, "duckdb")
    return f"""
WITH t AS (
  SELECT {doc_id}, {toks} AS toks FROM {doc_table}
), s AS (
  SELECT {doc_id}, toks,
         unnest(range(0, greatest(len(toks) - 1, 0) + 1, {stride})) AS start
  FROM t
)
SELECT {doc_id},
       CAST(start // {stride} AS INT) AS chunk_idx,
       CAST(len(toks[start + 1:start + {chunk_tokens}]) AS BIGINT)
         AS n_tokens,
       array_to_string(toks[start + 1:start + {chunk_tokens}], ' ')
         AS chunk_text
FROM s
WHERE len(toks[start + 1:start + {chunk_tokens}]) > 0
ORDER BY {doc_id}, chunk_idx
"""


# -- fill-in-the-middle (FIM) transformation ---------------------------------


def fim_transform_sql(
    doc_id: str,
    text_col: str,
    dialect: str,
    *,
    fim_rate: float = 0.5,
    pre_tok: str = "<PRE>",
    mid_tok: str = "<MID>",
    suf_tok: str = "<SUF>",
) -> tuple[str, str]:
    """FIM training-sample construction (Bavarian et al. 2022: "Efficient
    Training of Language Models to Fill in the Middle"): with probability
    ``fim_rate`` a document is split at two uniform character positions
    and re-emitted in PSM order — ``<PRE> prefix <SUF> suffix <MID>
    middle`` — teaching the model to infill; the rest pass through
    unchanged.

    The paper draws the gate and both cut points from an RNG; here they
    derive from the portable 60-bit hash of the doc id (three salted
    draws), so the transform is deterministic, reproducible across
    engines, and embarrassingly parallel — pure per-row string
    arithmetic, map-only, no shuffle, scan-bound at 100 TB.

    Returns (applied_sql BOOLEAN, sample_sql STRING) for the dialect.
    """
    from harmonize_search_analyze_spark.functions.hashing import hash64_sql

    if not 0.0 <= fim_rate <= 1.0:
        raise ValueError("fim_rate must be in [0, 1]")
    for tok in (pre_tok, mid_tok, suf_tok):
        if "'" in tok:
            raise ValueError("sentinel tokens must not contain quotes")
    gate = hash64_sql(f"(CAST({doc_id} AS STRING) || ':fim')", dialect)
    u1 = hash64_sql(f"(CAST({doc_id} AS STRING) || ':fim:a')", dialect)
    u2 = hash64_sql(f"(CAST({doc_id} AS STRING) || ':fim:b')", dialect)
    applied = f"(({gate}) % 1000 < {int(round(fim_rate * 1000))})"
    ln = f"length({text_col})"
    p1 = f"(({u1}) % ({ln} + 1))"
    p2 = f"(({u2}) % ({ln} + 1))"
    c1 = f"LEAST({p1}, {p2})"
    c2 = f"GREATEST({p1}, {p2})"
    prefix = f"substr({text_col}, 1, {c1})"
    middle = f"substr({text_col}, {c1} + 1, {c2} - {c1})"
    suffix = f"substr({text_col}, {c2} + 1, {ln})"
    psm = (
        f"('{pre_tok}' || {prefix} || '{suf_tok}' || {suffix} || "
        f"'{mid_tok}' || {middle})"
    )
    sample = f"(CASE WHEN {applied} THEN {psm} ELSE {text_col} END)"
    return applied, sample


def fim_transform(
    df: DataFrame,
    *,
    doc_id: str = "doc_id",
    text_col: str = "text",
    fim_rate: float = 0.5,
) -> DataFrame:
    """DataFrame form of :func:`fim_transform_sql`: returns
    (id, fim_applied, sample)."""
    applied, sample = fim_transform_sql(
        doc_id, text_col, "spark", fim_rate=fim_rate
    )
    return df.select(
        doc_id,
        F.expr(applied).alias("fim_applied"),
        F.expr(sample).alias("sample"),
    )


# -- T5 span corruption -------------------------------------------------------


def span_corruption(
    docs: DataFrame,
    *,
    doc_id: str = "doc_id",
    text_col: str = "text",
    mask_rate: float = 0.15,
) -> DataFrame:
    """T5 denoising objective (Raffel et al. 2020 §3.1.4): mask ~15% of
    tokens, collapse each consecutive masked run to one sentinel
    ``<extra_id_K>`` in the input, and emit the masked spans (each led by
    its sentinel) as the target.

    The per-token mask gate derives from the portable doc-id:position
    hash (deterministic; the paper uses an RNG + mean-span-3 geometric —
    i.i.d. per-token gives mean span 1/(1-rate), the documented
    difference). Span structure needs run detection, so unlike
    :func:`fim_transform` this is not map-only: posexplode → per-doc
    window (lag for run starts, running sum for span ids) → ordered
    reassembly agg. Both window and agg key on doc_id — ONE exchange
    total, high-cardinality key, no skew; this is the scalable shape (an
    array-fold alternative would be O(tokens²) per row in-plan).

    Returns (doc_id, input_masked, target, n_spans BIGINT).
    """
    from pyspark.sql import Window

    from harmonize_search_analyze_spark.functions.hashing import hash64_sql

    if not 0.0 < mask_rate < 1.0:
        raise ValueError("mask_rate must be in (0, 1)")
    pct = int(round(mask_rate * 100))
    toks = docs.select(
        doc_id,
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok"),
    )
    gate = hash64_sql(
        f"(CAST({doc_id} AS STRING) || ':' || CAST(pos AS STRING))", "spark"
    )
    w = Window.partitionBy(doc_id).orderBy("pos")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    masked = toks.withColumn("m", F.expr(f"({gate}) % 100 < {pct}"))
    spans = (
        masked.withColumn(
            "start", F.col("m") & ~F.coalesce(F.lag("m", 1).over(w), F.lit(False))
        )
        .withColumn(
            "span_id",
            F.sum(F.when(F.col("start"), 1).otherwise(0)).over(run),
        )
    )
    sentinel = F.concat(
        F.lit("<extra_id_"), (F.col("span_id") - 1).cast("string"), F.lit(">")
    )
    pieces = spans.select(
        doc_id,
        "pos",
        F.when(~F.col("m"), F.col("tok"))
        .when(F.col("start"), sentinel)
        .alias("in_piece"),  # NULL for masked non-start tokens
        F.when(
            F.col("start"), F.concat(sentinel, F.lit(" "), F.col("tok"))
        )
        .when(F.col("m"), F.col("tok"))
        .alias("tgt_piece"),
        F.col("start").cast("int").alias("is_start"),
    )
    return (
        pieces.groupBy(doc_id)
        .agg(
            F.array_join(
                F.expr(
                    "transform(sort_array(collect_list(CASE WHEN in_piece "
                    "IS NOT NULL THEN struct(pos, in_piece) END)), "
                    "s -> s.in_piece)"
                ),
                " ",
            ).alias("input_masked"),
            F.array_join(
                F.expr(
                    "transform(sort_array(collect_list(CASE WHEN tgt_piece "
                    "IS NOT NULL THEN struct(pos, tgt_piece) END)), "
                    "s -> s.tgt_piece)"
                ),
                " ",
            ).alias("target"),
            F.sum("is_start").cast("bigint").alias("n_spans"),
        )
    )


def span_corruption_sql(
    doc_table: str,
    *,
    doc_id: str = "doc_id",
    text_col: str = "text",
    mask_rate: float = 0.15,
) -> str:
    """DuckDB replay of :func:`span_corruption` (same hash gate, same
    window shapes, ordered string_agg reassembly)."""
    from harmonize_search_analyze_spark.functions.hashing import hash64_sql

    pct = int(round(mask_rate * 100))
    gate = hash64_sql(
        f"(CAST({doc_id} AS STRING) || ':' || CAST(pos AS STRING))", "duckdb"
    )
    return f"""
WITH toks AS (
  SELECT {doc_id},
         CAST(generate_subscripts(string_split({text_col}, ' '), 1) - 1
           AS BIGINT) AS pos,
         unnest(string_split({text_col}, ' ')) AS tok
  FROM {doc_table}
), gated AS (
  SELECT *, ({gate}) % 100 < {pct} AS m FROM toks
), runs AS (
  SELECT *,
         m AND NOT COALESCE(
           LAG(m) OVER (PARTITION BY {doc_id} ORDER BY pos), FALSE
         ) AS start
  FROM gated
), spans AS (
  SELECT *,
         SUM(CASE WHEN start THEN 1 ELSE 0 END) OVER (
           PARTITION BY {doc_id} ORDER BY pos
           ROWS UNBOUNDED PRECEDING
         ) AS span_id
  FROM runs
), pieces AS (
  SELECT {doc_id}, pos,
         CASE WHEN NOT m THEN tok
              WHEN start THEN '<extra_id_' || CAST(span_id - 1 AS VARCHAR) || '>'
         END AS in_piece,
         CASE WHEN start THEN '<extra_id_' || CAST(span_id - 1 AS VARCHAR) || '> ' || tok
              WHEN m THEN tok
         END AS tgt_piece,
         CASE WHEN start THEN 1 ELSE 0 END AS is_start
  FROM spans
)
SELECT {doc_id},
       COALESCE(string_agg(in_piece, ' ' ORDER BY pos), '') AS input_masked,
       COALESCE(string_agg(tgt_piece, ' ' ORDER BY pos), '') AS target,
       CAST(SUM(is_start) AS BIGINT) AS n_spans
FROM pieces
GROUP BY {doc_id}
"""


# -- prefix-LM split + UL2 denoiser mixture ----------------------------------


def prefix_lm_split_sql(
    doc_id: str,
    text_col: str,
    dialect: str,
    *,
    min_prefix_frac: float = 0.25,
    max_prefix_frac: float = 0.75,
) -> tuple[str, str]:
    """UL2's S-denoiser (Tay et al. 2022: sequential denoising = PrefixLM):
    split each document at one hash-derived character position inside
    [min_prefix_frac, max_prefix_frac] of its length; the prefix is the
    conditioning input, the suffix is the generation target.

    Returns (input_sql, target_sql) — map-only, deterministic, dual-
    dialect (same portable-hash draw as fim_transform).
    """
    from harmonize_search_analyze_spark.functions.hashing import hash64_sql

    if not 0.0 <= min_prefix_frac < max_prefix_frac <= 1.0:
        raise ValueError("need 0 <= min_prefix_frac < max_prefix_frac <= 1")
    u = hash64_sql(f"(CAST({doc_id} AS STRING) || ':plm')", dialect)
    ln = f"length({text_col})"
    lo = f"CAST(FLOOR({ln} * {min_prefix_frac}) AS BIGINT)"
    hi = f"CAST(FLOOR({ln} * {max_prefix_frac}) AS BIGINT)"
    cut = f"({lo} + (CASE WHEN {hi} > {lo} THEN ({u}) % ({hi} - {lo} + 1) ELSE 0 END))"
    return (
        f"substr({text_col}, 1, {cut})",
        f"substr({text_col}, {cut} + 1, {ln})",
    )


def denoiser_mix(
    docs: DataFrame,
    *,
    doc_id: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """UL2 mixture-of-denoisers routing (Tay et al. 2022 §3.2): each
    document is deterministically routed by the portable hash to one
    objective — [R]egular span corruption, e[X]treme corruption (higher
    rate), or [S]equential PrefixLM — and tagged with the paper's mode
    sentinel. Routing and the S-denoiser are map-only; the R/X spans
    come from :func:`span_corruption`'s one-exchange shape, applied to
    each routed partition of the corpus and unioned back.

    Returns (doc_id, denoiser, input, target).
    """
    from harmonize_search_analyze_spark.functions.hashing import hash64_sql

    route = F.expr(
        hash64_sql(f"(CAST({doc_id} AS STRING) || ':ul2')", "spark")
    ) % 3
    routed = docs.withColumn("__route", route)
    inp, tgt = prefix_lm_split_sql(doc_id, text_col, "spark")
    s_part = routed.where("__route = 2").select(
        doc_id,
        F.lit("[S]").alias("denoiser"),
        F.expr(inp).alias("input"),
        F.expr(tgt).alias("target"),
    )
    out = [s_part]
    for tag, rate, flag in (("[R]", 0.15, 0), ("[X]", 0.5, 1)):
        part = span_corruption(
            routed.where(f"__route = {flag}"),
            doc_id=doc_id,
            text_col=text_col,
            mask_rate=rate,
        ).select(
            doc_id,
            F.lit(tag).alias("denoiser"),
            F.col("input_masked").alias("input"),
            F.col("target"),
        )
        out.append(part)
    return out[0].unionByName(out[1]).unionByName(out[2])


def denoiser_mix_sql(
    doc_table: str,
    *,
    doc_id: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB replay of :func:`denoiser_mix` (same routing hash, same
    per-branch formulas, UNION ALL)."""
    from harmonize_search_analyze_spark.functions.hashing import hash64_sql

    keyed = f"(CAST({doc_id} AS STRING) || ':ul2')"
    route = f"({hash64_sql(keyed, 'duckdb')}) % 3"
    inp, tgt = prefix_lm_split_sql(doc_id, text_col, "duckdb")
    branches = [
        f"SELECT {doc_id}, '[S]' AS denoiser, {inp} AS input, {tgt} AS target "
        f"FROM {doc_table} WHERE {route} = 2"
    ]
    for tag, rate, flag in (("[R]", 0.15, 0), ("[X]", 0.5, 1)):
        sub = span_corruption_sql(
            f"(SELECT * FROM {doc_table} WHERE {route} = {flag})",
            doc_id=doc_id,
            text_col=text_col,
            mask_rate=rate,
        )
        branches.append(
            f"SELECT {doc_id}, '{tag}' AS denoiser, "
            f"input_masked AS input, target FROM ({sub})"
        )
    return "\nUNION ALL\n".join(branches)


def batch_by_length(
    df: DataFrame,
    id_col: str,
    len_col: str,
    *,
    boundaries: list[int],
    batch_size: int,
    n_shards: int = 32,
) -> DataFrame:
    """Length-bucketed training batch assembly: group sequences of
    similar length into fixed-size batches so per-batch padding waste is
    bounded by the bucket width (the standard bucketed-batching trick in
    LLM/NMT data loaders, e.g. the published bucket_by_sequence_length
    pattern).

    ``boundaries`` are ascending upper bounds; sequence with length L
    lands in the first bucket whose bound is >= L (one overflow bucket
    past the last bound). Batches are formed WITHIN (bucket, shard),
    shard = portable_hash(id) % n_shards: batch membership never crosses
    shards, so no per-bucket global order is needed — the row_number
    window partitions on (bucket, shard), giving n_shards-way parallelism
    per bucket instead of the hot single reducer a global per-bucket rank
    would serialize on (the 100 TB guard; batches stay length-homogeneous
    because the bucket, not the rank, bounds padding). Fully deterministic:
    shard hash and the (length, id) order are engine-portable.

    Returns (id, length, bucket, batch_key, pos_in_batch) where batch_key
    is 'bucket/shard/seq'. Runts (the last under-filled batch per shard)
    are kept and flagged ``is_runt`` — dropping or rebalancing them is the
    caller's policy.
    """
    _batch_by_length_validate(id_col, len_col, boundaries, batch_size,
                              n_shards)
    from harmonize_search_analyze_spark.functions.hashing import hash64_sql

    bucket = F.lit(len(boundaries))
    for i in reversed(range(len(boundaries))):
        bucket = F.when(
            F.col(len_col) <= boundaries[i], F.lit(i)
        ).otherwise(bucket)
    shard = F.expr(
        f"{hash64_sql(f'CAST({id_col} AS STRING)', 'spark')} % {n_shards}"
    )
    base = df.select(
        F.col(id_col),
        F.col(len_col),
        bucket.alias("bucket"),
        shard.alias("__shard"),
    )
    w = Window.partitionBy("bucket", "__shard").orderBy(
        F.col(len_col).asc(), F.col(id_col).asc()
    )
    wn = Window.partitionBy("bucket", "__shard")
    ranked = base.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__n", F.count(F.lit(1)).over(wn)
    )
    seq = ((F.col("__rn") - 1) / batch_size).cast("bigint")
    return ranked.select(
        F.col(id_col),
        F.col(len_col),
        F.col("bucket"),
        F.concat_ws(
            "/",
            F.col("bucket").cast("string"),
            F.col("__shard").cast("string"),
            seq.cast("string"),
        ).alias("batch_key"),
        ((F.col("__rn") - 1) % batch_size).alias("pos_in_batch"),
        (
            (seq == ((F.col("__n") - 1) / batch_size).cast("bigint"))
            & (F.col("__n") % batch_size != 0)
        ).alias("is_runt"),
    )


_BATCH_RESERVED = frozenset(
    {"bucket", "shard", "__shard", "__rn", "__n",
     "batch_key", "pos_in_batch", "is_runt"}
)


def _batch_by_length_validate(
    id_col: str,
    len_col: str,
    boundaries: list[int],
    batch_size: int,
    n_shards: int,
) -> None:
    if batch_size <= 0:
        raise ValueError(f"batch_size must be positive, got {batch_size}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    if not boundaries or sorted(boundaries) != list(boundaries):
        raise ValueError("boundaries must be a non-empty ascending list")
    # output/internal names are fixed in BOTH twins; a same-named input
    # column silently shadows them (the sweep caught len_col='n' binding
    # the runt formula to the LENGTH column before the aliases were
    # __-prefixed) — reject up front rather than return wrong batches
    clash = {id_col, len_col} & _BATCH_RESERVED
    if clash:
        raise ValueError(
            f"id/length column names collide with batch output columns "
            f"{sorted(clash)}; rename them first"
        )


def batch_by_length_sql(
    table: str,
    id_col: str,
    len_col: str,
    *,
    boundaries: list[int],
    batch_size: int,
    n_shards: int = 32,
) -> str:
    """DuckDB twin of :func:`batch_by_length` (same formula text apart
    from the dialect hash)."""
    _batch_by_length_validate(id_col, len_col, boundaries, batch_size,
                              n_shards)
    from harmonize_search_analyze_spark.functions.hashing import hash64_sql

    cases = " ".join(
        f"WHEN {len_col} <= {b} THEN {i}"
        for i, b in enumerate(boundaries)
    )
    bucket = f"(CASE {cases} ELSE {len(boundaries)} END)"
    shard = f"({hash64_sql(f'CAST({id_col} AS VARCHAR)', 'duckdb')} % {n_shards})"
    # internal aliases are __-prefixed: a bare ``rn``/``n`` would collide
    # with (and silently shadow or be shadowed by) same-named user
    # columns — the sweep caught ``len_col='n'`` resolving the runt
    # formula against the LENGTH column
    return f"""
WITH base AS (
  SELECT {id_col}, {len_col}, {bucket} AS bucket, {shard} AS __shard
  FROM {table}
), ranked AS (
  SELECT *,
    ROW_NUMBER() OVER (PARTITION BY bucket, __shard
                       ORDER BY {len_col} ASC, {id_col} ASC) AS __rn,
    COUNT(*) OVER (PARTITION BY bucket, __shard) AS __n
  FROM base
)
SELECT {id_col}, {len_col}, bucket,
  bucket::VARCHAR || '/' || __shard::VARCHAR || '/' ||
    ((__rn - 1) // {batch_size})::VARCHAR AS batch_key,
  (__rn - 1) % {batch_size} AS pos_in_batch,
  ((__rn - 1) // {batch_size} = (__n - 1) // {batch_size}
   AND __n % {batch_size} <> 0) AS is_runt
FROM ranked
"""
