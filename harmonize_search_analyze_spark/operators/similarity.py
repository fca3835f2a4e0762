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
