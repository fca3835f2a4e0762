"""WebDataset-style corpus sharding: deterministic shard assignment and
tar-shard writing for training-data delivery.

Large-scale training loaders (WebDataset, Mosaic streaming, tfrecord
readers) consume a corpus as a sequence of fixed-size shard archives plus
a manifest. The Spark-shaped split of that job:

1. ``assign_shards`` — a DETERMINISTIC global position for every document
   (portable 64-bit key hash -> the engine's distributed contiguous rank,
   ``ordering.global_order`` — range partition + per-partition windows +
   broadcast offsets; never a single-reducer window), then
   ``shard_id = pos / docs_per_shard``. Same corpus + seed => byte-same
   shards on any cluster layout.
2. ``shard_manifest`` — per-shard document counts and payload bytes (the
   loader-side index), a bounded hash agg over the assignment.
3. ``write_webdataset_shards`` — one tar archive per shard via
   ``applyInPandas`` (each shard's rows converge to one task; entries
   written in position order as ``{key}.txt``, the WebDataset member
   convention). Returns the written manifest. Python here is the POINT
   (tarfile IO), not a hot row path — one group per archive, Arrow-fed.

Shard size is the operator's scale contract: ``docs_per_shard`` bounds
per-task memory in the writer, and the assignment itself is map +
one range exchange regardless of corpus size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from harmonize_search_analyze_spark.functions.hashing import hash64_sql
from harmonize_search_analyze_spark.operators.ordering import global_order


def assign_shards(
    df: DataFrame,
    id_col: str,
    *,
    docs_per_shard: int,
    seed: int = 42,
) -> DataFrame:
    """Add (shard_id, pos_in_shard) — deterministic, hash-shuffled
    (WebDataset wants shards pre-shuffled so sequential readers see a
    random document order). All input columns pass through."""
    if docs_per_shard < 1:
        raise ValueError("docs_per_shard must be >= 1")
    key = hash64_sql(
        f"concat('shard', CAST({seed} AS STRING), ':',"
        f" CAST({id_col} AS STRING))",
        "spark",
    )
    keyed = df.withColumn("__skey", F.expr(key))
    ranked = global_order(
        keyed, ["__skey", id_col], out_col="__pos"
    )
    return (
        ranked.withColumn(
            "shard_id",
            (F.col("__pos") / docs_per_shard).cast("bigint"),
        )
        .withColumn(
            "pos_in_shard", (F.col("__pos") % docs_per_shard).cast("int")
        )
        .drop("__skey", "__pos")
    )


def assign_shards_sql(
    table: str,
    id_col: str,
    columns: list[str],
    *,
    docs_per_shard: int,
    seed: int = 42,
) -> str:
    """DuckDB oracle twin of assign_shards (single-window rank form)."""
    key = hash64_sql(
        f"concat('shard', CAST({seed} AS VARCHAR), ':',"
        f" CAST({id_col} AS VARCHAR))",
        "duckdb",
    )
    cols = ", ".join(columns)
    return f"""
SELECT {cols},
       CAST((rnk - 1) // {docs_per_shard} AS BIGINT) AS shard_id,
       CAST((rnk - 1) % {docs_per_shard} AS INTEGER) AS pos_in_shard
FROM (
  SELECT {cols},
         ROW_NUMBER() OVER (ORDER BY {key}, {id_col}) AS rnk
  FROM {table}
)
"""


def shard_manifest(
    assigned: DataFrame, *, size_col: str
) -> DataFrame:
    """Per-shard manifest: (shard_id, n_docs, total_bytes) ordered by
    shard_id — the loader-side index of an assign_shards output."""
    return (
        assigned.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col(size_col).cast("bigint")).alias("total_bytes"),
        )
        .orderBy("shard_id")
    )


def write_webdataset_shards(
    assigned: DataFrame,
    out_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix: str = "shard",
) -> DataFrame:
    """Write one ``{prefix}-{shard_id:06d}.tar`` per shard under
    ``out_dir`` (WebDataset layout: each document is a ``{id}.txt``
    member, members in pos_in_shard order). Returns the written manifest
    (shard_id, path, n_docs, payload_bytes) as a DataFrame.

    Each shard converges to ONE task (applyInPandas group) — per-task
    memory is bounded by docs_per_shard from the assignment step."""
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)

    def write_shard(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import io
        import tarfile

        pdf = pdf.sort_values("pos_in_shard")
        shard_id = int(pdf["shard_id"].iloc[0])
        path = os.path.join(out_dir, f"{prefix}-{shard_id:06d}.tar")
        payload = 0
        with tarfile.open(path, "w") as tar:
            for _, row in pdf.iterrows():
                data = ("" if row[text_col] is None
                        else str(row[text_col])).encode("utf-8")
                info = tarfile.TarInfo(name=f"{int(row[id_col])}.txt")
                info.size = len(data)
                info.mtime = 0  # deterministic archives
                tar.addfile(info, io.BytesIO(data))
                payload += len(data)
        return pd.DataFrame(
            {
                "shard_id": [shard_id],
                "path": [path],
                "n_docs": [len(pdf)],
                "payload_bytes": [payload],
            }
        )

    return (
        assigned.select("shard_id", "pos_in_shard", id_col, text_col)
        .groupBy("shard_id")
        .applyInPandas(
            write_shard,
            "shard_id bigint, path string, n_docs long, payload_bytes long",
        )
        .orderBy("shard_id")
    )
