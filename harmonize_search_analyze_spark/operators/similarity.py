"""Similarity search over an embedding column (``array<float>``).

Two paths (BASELINE.json north star):

- **brute-force cosine top-k** — the exact baseline. One scan, a codegen'd
  fold for the dot product, TakeOrderedAndProject for the top-k (no global
  sort materialized). At 100 TB this is the per-partition map + bounded
  heap-merge plan Spark already gives us.
- **IVF (inverted file) search** — the scale path. Build: pick C centroids
  deterministically, assign every vector to its nearest centroid (broadcast
  the C centroids — never shuffle the big side). Search: score the query
  against centroids, probe the best ``nprobe`` lists, brute-force only
  within those partitions. Recall < 1.0 by construction; the brute path is
  the oracle for it.

All arithmetic is double-precision sequential folds so results are
bit-reproducible against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from harmonize_search_analyze_spark.functions.caching import tether


def _dot_sql(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _norm_sql(a: str) -> str:
    return (
        f"sqrt(aggregate(transform({a}, x -> x * x), "
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v))"
    )


def _qvec_lit(qvec: list[float]) -> str:
    return "array(" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in qvec) + ")"


def cosine_score(vec_col: str, qvec: list[float]) -> F.Column:
    """Cosine similarity of a vector column against a literal query vector."""
    import math

    q = _qvec_lit(qvec)
    qnorm = math.sqrt(sum(v * v for v in qvec))
    emb = f"CAST({vec_col} AS ARRAY<DOUBLE>)"
    return F.expr(_dot_sql(emb, q)) / (F.expr(_norm_sql(emb)) * F.lit(qnorm))


def cosine_topk(
    df: DataFrame, vec_col: str, qvec: list[float], k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force top-k by cosine (rounded for stable ordering)."""
    return (
        df.select(
            id_col,
            F.round(cosine_score(vec_col, qvec), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def ivf_assign(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    n_centroids: int = 16,
) -> tuple[DataFrame, DataFrame]:
    """Build the IVF index: (centroids, assignments).

    Centroids are the vectors whose id ranks first in each of
    ``n_centroids`` deterministic id-hash buckets (a seeded sample without a
    random() call, so build is reproducible). Assignment broadcasts the
    centroid table and computes argmin L2 per row — a map-only job.
    """
    w = Window.partitionBy("bucket").orderBy(id_col)
    centroids = (
        df.select(
            id_col,
            F.col(vec_col).cast("array<double>").alias("cvec"),
            (F.col(id_col) % n_centroids).alias("bucket"),
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(F.col("bucket").alias("centroid_id"), "cvec")
    )
    vecs = df.select(id_col, F.col(vec_col).cast("array<double>").alias("dvec"))
    dist = F.expr(
        "aggregate(zip_with(dvec, cvec, (x, y) -> (x - y) * (x - y)), "
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    w_min = Window.partitionBy(id_col).orderBy("d2", "centroid_id")
    assignments = (
        vecs.crossJoin(F.broadcast(centroids))
        # rounded so the argmin tie-break is reproducible across engines
        .withColumn("d2", F.round(dist, 6))
        .withColumn("rn", F.row_number().over(w_min))
        .where(F.col("rn") == 1)
        .select(id_col, "centroid_id")
    )
    return centroids, assignments


def assign_centroids(
    df: DataFrame,
    centroids: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Argmin-L2 assignment of every vector to a centroid: broadcast the
    (tiny) centroid table, map-only scoring, deterministic tie-break on
    centroid_id. Returns (id, centroid_id, d2)."""
    vecs = df.select(
        id_col, F.col(vec_col).cast("array<double>").alias("dvec")
    )
    dist = F.expr(
        "aggregate(zip_with(dvec, cvec, (x, y) -> (x - y) * (x - y)), "
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    w_min = Window.partitionBy(id_col).orderBy("d2", "centroid_id")
    return (
        vecs.crossJoin(F.broadcast(centroids))
        .withColumn("d2", F.round(dist, 6))
        .withColumn("rn", F.row_number().over(w_min))
        .where(F.col("rn") == 1)
        .select(id_col, "centroid_id", "d2")
    )


def kmeans_init_farthest(
    df: DataFrame,
    n_centroids: int,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Deterministic farthest-first seeding (k-means++ without the RNG):
    start from the minimum-id vector, then repeatedly add the point
    farthest from its nearest chosen centroid (ties -> lowest id). C-1
    distributed max-passes at build time; immune to the hash-init failure
    where adjacent ids land in one cluster."""
    spark = df.sparkSession
    first = (
        df.select(id_col, F.col(vec_col).cast("array<double>").alias("v"))
        .orderBy(id_col)
        .limit(1)
        .collect()[0]
    )
    chosen = [(0, list(first["v"]))]
    for i in range(1, n_centroids):
        centroids = spark.createDataFrame(
            chosen, "centroid_id INT, cvec ARRAY<DOUBLE>"
        )
        far = (
            assign_centroids(df, centroids, vec_col=vec_col, id_col=id_col)
            .orderBy(F.desc("d2"), F.asc(id_col))
            .limit(1)
            .join(
                df.select(
                    id_col, F.col(vec_col).cast("array<double>").alias("v")
                ),
                id_col,
            )
            .collect()[0]
        )
        chosen.append((i, list(far["v"])))
    return spark.createDataFrame(chosen, "centroid_id INT, cvec ARRAY<DOUBLE>")


def kmeans_train(
    df: DataFrame,
    *,
    n_centroids: int = 16,
    n_iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    init: str = "farthest",
) -> DataFrame:
    """Lloyd's k-means for IVF centroid training (the quality upgrade over
    ``ivf_assign``'s hash-picked seeds). Per iteration:

    1. assign — broadcast centroids, argmin L2, map-only (assign_centroids)
    2. update — per-dimension mean via posexplode -> (centroid, dim) hash
       agg -> regroup into arrays; empty clusters keep their old centroid

    The C x dim centroid matrix is collected to the driver between
    iterations — the one justified ``collect()`` in an iterative algorithm:
    it is METADATA-sized (kilobytes), and holding it driver-side keeps every
    iteration's plan two stages deep instead of accreting a 2*n_iters-stage
    lineage. All heavy work (assignment, dimension means) stays distributed.
    Fully deterministic; cluster means are rounded to stabilize cross-run
    float summation order.

    ``init``: 'farthest' (default — kmeans_init_farthest, C-1 extra build
    passes, robust) or 'hash' (ivf_assign's id-bucket pick, zero extra
    passes, degrades when adjacent ids cluster together).
    """
    if n_iters < 1:
        raise ValueError("n_iters must be >= 1")
    spark = df.sparkSession
    if init == "farthest":
        centroids = kmeans_init_farthest(
            df, n_centroids, vec_col=vec_col, id_col=id_col
        )
    elif init == "hash":
        centroids, _ = ivf_assign(
            df, vec_col=vec_col, id_col=id_col, n_centroids=n_centroids
        )
    else:
        raise ValueError("init must be 'farthest' or 'hash'")
    for _ in range(n_iters):
        assigned = assign_centroids(
            df, centroids, vec_col=vec_col, id_col=id_col
        ).join(
            df.select(id_col, F.col(vec_col).cast("array<double>").alias("dvec")),
            id_col,
        )
        means = (
            assigned.select("centroid_id", F.posexplode("dvec").alias("pos", "x"))
            .groupBy("centroid_id", "pos")
            .agg(F.round(F.avg("x"), 9).alias("m"))
            .groupBy("centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                "centroid_id",
                F.expr("transform(pm, p -> p.m)").alias("cvec"),
            )
        )
        # empty clusters keep their previous centroid
        updated = (
            centroids.alias("old")
            .join(means.alias("new"), "centroid_id", "left")
            .select(
                "centroid_id",
                F.coalesce(F.col("new.cvec"), F.col("old.cvec")).alias("cvec"),
            )
        )
        rows = updated.collect()   # C x dim doubles — metadata-sized
        centroids = spark.createDataFrame(
            [(r["centroid_id"], list(r["cvec"])) for r in rows],
            "centroid_id INT, cvec ARRAY<DOUBLE>",
        ) if rows else centroids
    return centroids


def kmeans_inertia(
    df: DataFrame,
    centroids: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> float:
    """Sum of squared distances to the assigned centroid — the quantity
    Lloyd's iterations monotonically decrease (tested)."""
    return (
        assign_centroids(df, centroids, vec_col=vec_col, id_col=id_col)
        .agg(F.sum("d2").alias("s"))
        .collect()[0]["s"]
    )


def ivf_search(
    df: DataFrame,
    centroids: DataFrame,
    assignments: DataFrame,
    qvec: list[float],
    *,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe the ``nprobe`` centroid lists nearest the query, then exact
    cosine within them. At scale the assignments frame is written
    partitioned by centroid_id, so probing is partition pruning."""
    probe_ids = [
        r.centroid_id
        for r in centroids.select(
            "centroid_id",
            F.round(cosine_score("cvec", qvec), 6).alias("s"),
        )
        .orderBy(F.desc("s"), F.asc("centroid_id"))
        .limit(nprobe)
        .collect()
    ]
    shortlist = assignments.where(F.col("centroid_id").isin(probe_ids))
    return cosine_topk(
        df.join(shortlist.select(id_col), id_col), vec_col, qvec, k, id_col
    )


def hyperplanes(dim: int, n_bits: int, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes for sign-LSH: entry (j, i) is
    ``sin(seed + j*dim + i)`` — no RNG, so Spark, the DuckDB oracle, and any
    re-run derive the identical family from (dim, n_bits, seed)."""
    import math

    return [
        [math.sin(seed + j * dim + i) for i in range(dim)]
        for j in range(n_bits)
    ]


def _band_key_sql(vec: str, planes: list[list[float]], dialect: str) -> str:
    """Concatenated sign bits of the vector against each plane (one band)."""
    bits = []
    for p in planes:
        if dialect == "spark":
            dot = _dot_sql(vec, _qvec_lit(p))
            bits.append(f"IF(({dot}) >= 0, '1', '0')")
        else:
            lit = "[" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in p) + "]"
            dot = (
                f"list_sum(list_transform(list_zip({vec}, {lit}), "
                "p -> p[1] * p[2]))"
            )
            bits.append(f"(CASE WHEN ({dot}) >= 0 THEN '1' ELSE '0' END)")
    return " || ".join(bits) if dialect == "duckdb" else f"concat({', '.join(bits)})"


def embedding_near_dup_lsh(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    threshold: float = 0.95,
    dim: int = 64,
    n_bands: int = 4,
    bits_per_band: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Sign-LSH (random hyperplane) embedding near-dup — the scale path for
    ``embedding_near_dup_pairs``: two vectors are candidates iff some band
    of sign bits matches exactly; only candidates pay the exact cosine.

    P(bit match) = 1 - angle/pi, so a band of b bits catches highly similar
    pairs with probability (1 - angle/pi)^b and the bands union the chances;
    recall < 1 by construction — the brute operator is the oracle for recall,
    while THIS operator is oracle'd exactly (same planes, same buckets).

    Scale shape: signature computation is a map-only projection; the band
    self-equi-join shuffles on (band_idx, band_key) — the same join profile
    as MinHash-LSH banding (dedup.py), uniform-ish buckets for centered data.
    """
    planes = hyperplanes(dim, n_bands * bits_per_band, seed)
    emb = f"CAST({vec_col} AS ARRAY<DOUBLE>)"
    v = df.select(
        F.col(id_col),
        F.expr(emb).alias("v"),
        F.expr(_norm_sql(emb)).alias("nrm"),
    )
    bands = []
    for bi in range(n_bands):
        key = _band_key_sql("v", planes[bi * bits_per_band: (bi + 1) * bits_per_band], "spark")
        bands.append(
            F.struct(F.lit(bi).alias("band_idx"), F.expr(key).alias("band_key"))
        )
    # band frame is tiny (n x n_bands); persist so the two join branches
    # don't recompute the signature projection
    exploded = (
        v.select(id_col, F.explode(F.array(*bands)).alias("b"))
        .select(id_col, "b.band_idx", "b.band_key")
        .persist()
    )
    cands = (
        exploded.alias("l")
        .join(
            exploded.alias("r"),
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id1"),
            F.col(f"r.{id_col}").alias("id2"),
        )
        .distinct()
    )
    cos = F.expr(_dot_sql("v1", "v2")) / (F.col("n1") * F.col("n2"))
    out = (
        cands.join(
            v.select(F.col(id_col).alias("id1"), F.col("v").alias("v1"),
                     F.col("nrm").alias("n1")), "id1")
        .join(
            v.select(F.col(id_col).alias("id2"), F.col("v").alias("v2"),
                     F.col("nrm").alias("n2")), "id2")
        .withColumn("cosine", F.round(cos, 6))
        .where(F.col("cosine") >= threshold)
        .select("id1", "id2", "cosine")
    )
    # band frame unpersists when the result is released/GC'd (no session leak)
    return tether(out, exploded)


def similarity_join(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    *,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
) -> DataFrame:
    """Batch exact top-k similarity join: for EVERY query vector, the k
    nearest corpus vectors by cosine (the bulk form of ``cosine_topk`` —
    retrieval eval sets, batched dedup probes, k-NN graph construction).

    Plan shape: the query set is broadcast, so the corpus is scanned ONCE
    regardless of |Q| (BroadcastNestedLoopJoin — each corpus partition
    scores the in-memory query list; no shuffle of the big side). Per-query
    top-k is a rank window keyed by query id over |C|x|Q| scored rows —
    the shuffle carries scores only, never vectors. For |Q| beyond a few
    thousand, route each query through ``ivf_search`` instead (probe
    pruning beats the extra scan cost at that point)."""
    c = corpus.select(
        F.col(corpus_id).alias("corpus_id"),
        F.expr(f"CAST({corpus_vec} AS ARRAY<DOUBLE>)").alias("cv"),
    ).withColumn("cn", F.expr(_norm_sql("cv")))
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.expr(f"CAST({query_vec} AS ARRAY<DOUBLE>)").alias("qv"),
    ).withColumn("qn", F.expr(_norm_sql("qv")))
    cos = F.round(
        F.expr(_dot_sql("cv", "qv")) / (F.col("cn") * F.col("qn")), 6
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("corpus_id")
    )
    return (
        c.crossJoin(F.broadcast(q))
        .withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def similarity_join_sql(
    corpus_table: str,
    queries_table: str,
    k: int,
    *,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "embedding",
) -> str:
    """DuckDB oracle for similarity_join (same fold, same rounding, same
    rank tie-break)."""
    dot = "list_sum(list_transform(list_zip(c.cv, q.qv), p -> p[1] * p[2]))"
    return f"""
WITH c AS (
  SELECT {corpus_id} AS corpus_id, {corpus_vec}::DOUBLE[] AS cv,
         sqrt(list_sum(list_transform({corpus_vec}::DOUBLE[], x -> x * x))) AS cn
  FROM {corpus_table}
), q AS (
  SELECT {query_id} AS query_id, {query_vec}::DOUBLE[] AS qv,
         sqrt(list_sum(list_transform({query_vec}::DOUBLE[], x -> x * x))) AS qn
  FROM {queries_table}
)
SELECT query_id, corpus_id, cosine, rank FROM (
  SELECT q.query_id, c.corpus_id,
         ROUND({dot} / (c.cn * q.qn), 6) AS cosine,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY q.query_id
           ORDER BY ROUND({dot} / (c.cn * q.qn), 6) DESC, c.corpus_id ASC
         ) AS INT) AS rank
  FROM c CROSS JOIN q
) t WHERE rank <= {k}
"""


def embedding_lsh_oracle_sql(
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    threshold: float = 0.95,
    dim: int = 64,
    n_bands: int = 4,
    bits_per_band: int = 8,
    seed: int = 7,
) -> str:
    """DuckDB SQL computing the identical sign-LSH pipeline (same planes,
    same bucket keys, same verification cosine)."""
    planes = hyperplanes(dim, n_bands * bits_per_band, seed)
    band_selects = []
    for bi in range(n_bands):
        key = _band_key_sql(
            "e", planes[bi * bits_per_band: (bi + 1) * bits_per_band], "duckdb"
        )
        band_selects.append(
            f"SELECT {id_col}, {bi} AS band_idx, {key} AS band_key FROM v"
        )
    bands = " UNION ALL ".join(band_selects)
    dot = "list_sum(list_transform(list_zip(a.e, b.e), p -> p[1] * p[2]))"
    return f"""
WITH v AS (
  SELECT {id_col}, {vec_col}::DOUBLE[] AS e,
         sqrt(list_sum(list_transform({vec_col}::DOUBLE[], x -> x * x))) AS nrm
  FROM {table}
), bands AS ({bands}),
cands AS (
  SELECT DISTINCT l.{id_col} AS id1, r.{id_col} AS id2
  FROM bands l JOIN bands r
    ON l.band_idx = r.band_idx AND l.band_key = r.band_key
   AND l.{id_col} < r.{id_col}
)
SELECT id1, id2, cosine FROM (
  SELECT id1, id2, ROUND({dot} / (a.nrm * b.nrm), 6) AS cosine
  FROM cands JOIN v a ON a.{id_col} = id1 JOIN v b ON b.{id_col} = id2
) WHERE cosine >= {threshold!r} ORDER BY id1, id2
"""


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (brute O(n^2) baseline; the
    LSH-bucketed variant reuses ivf_assign buckets as blocking keys).

    Partitioning note (measured at sf0.1): the `id1 < id2` condition plans
    as BroadcastNestedLoopJoin, whose output parallelism is the STREAM
    side's — a single-file parquet scan means one task evaluates every pair
    (26s). Repartitioning the stream side to the cluster's parallelism cuts
    it to ~4s; at real scale the stream side is many partitions already, but
    we force it so small inputs never serialize the O(n^2) work."""
    v = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"),
        F.expr(_norm_sql(f"CAST({vec_col} AS ARRAY<DOUBLE>)")).alias("nrm"),
    )
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    l = v.select(
        F.col(id_col).alias("id1"), F.col("v").alias("v1"), F.col("nrm").alias("n1")
    ).repartition(parallelism)
    r = v.select(F.col(id_col).alias("id2"), F.col("v").alias("v2"), F.col("nrm").alias("n2"))
    cos = F.expr(_dot_sql("v1", "v2")) / (F.col("n1") * F.col("n2"))
    return (
        l.join(r, F.col("id1") < F.col("id2"))
        .withColumn("cosine", F.round(cos, 6))
        .where(F.col("cosine") >= threshold)
        .select("id1", "id2", "cosine")
    )
