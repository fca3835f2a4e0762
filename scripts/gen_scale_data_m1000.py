"""Chunked m1000 generator (5M docs / 2M vecs / 100M events) — the third
measured decade. Same distributions and seed convention as
gen_scale_data.py, but written in mult=100-sized chunks through
pyarrow.parquet.ParquetWriter so peak memory stays at the (known-good)
m100 working set instead of 10x it: the flat in-memory generation path
needs ~64 GB of numpy unicode buffers at this size.

Chunk i uses rng seed (base_seed, i) so the corpus is deterministic and
documents/events land with globally unique ids. Usage:

    python scripts/gen_scale_data_m1000.py /tmp/sparkgraft_m1000
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gen_scale_data import (  # noqa: E402
    BASE_DOCS,
    BASE_EVENTS,
    BASE_USERS,
    BASE_VECS,
    DIM,
    _base_stats,
)

CHUNKS = 10          # 10 x mult-100 chunks = mult 1000
CHUNK_MULT = 100


def gen_documents(outdir: str, seed: int) -> None:
    import duckdb  # noqa: F401  (parity with gen_scale_data imports)

    vocab, vocab_p, mix, lens = _base_stats()
    vocab = np.array(vocab)
    pairs = [(s, lg) for s, lg, _ in mix]
    probs = np.array([c for _, _, c in mix], dtype=float)
    probs /= probs.sum()
    n_chunk = BASE_DOCS * CHUNK_MULT
    writer = None
    for ci in range(CHUNKS):
        rng = np.random.default_rng([seed, ci])
        pick = rng.choice(len(pairs), size=n_chunk, p=probs)
        n_words = rng.choice(lens, size=n_chunk)
        flat = rng.choice(vocab, size=int(n_words.sum()), p=vocab_p)
        texts, pos = [], 0
        for nw in n_words:
            texts.append(" ".join(flat[pos: pos + nw]))
            pos += nw
        n_dup = max(1, int(0.003 * n_chunk))
        dup_src = rng.integers(0, n_chunk, size=n_dup)
        dup_dst = (
            dup_src + 1 + rng.integers(0, n_chunk - 1, size=n_dup)
        ) % n_chunk
        for s, d in zip(dup_src, dup_dst):
            texts[d] = texts[s]
        base_id = ci * n_chunk
        tbl = pa.table({
            "doc_id": pa.array(range(base_id, base_id + n_chunk), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array([pairs[i][1] for i in pick]),
            "source": pa.array([pairs[i][0] for i in pick]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        })
        if writer is None:
            writer = pq.ParquetWriter(
                os.path.join(outdir, "documents.parquet"), tbl.schema
            )
        writer.write_table(tbl)
        print(f"documents chunk {ci + 1}/{CHUNKS}", flush=True)
    writer.close()


def gen_embeddings(outdir: str, seed: int) -> None:
    n = BASE_VECS * CHUNK_MULT * CHUNKS
    rng = np.random.default_rng([seed, 9999])
    vecs = rng.standard_normal((n, DIM)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    tbl = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(
            [v.tolist() for v in vecs], pa.list_(pa.float32())
        ),
        "label": pa.array(rng.integers(0, 10, size=n).tolist(), pa.int64()),
    })
    pq.write_table(tbl, os.path.join(outdir, "embeddings.parquet"))
    print("embeddings done", flush=True)


def gen_events(outdir: str, seed: int) -> None:
    import duckdb

    base = "/root/testdata/sf0.1"
    mix = duckdb.sql(
        f"SELECT event_type, COUNT(*) FROM "
        f"read_parquet('{base}/events.parquet') GROUP BY 1 ORDER BY 1"
    ).fetchall()
    types = np.array([t for t, _ in mix])
    p = np.array([c for _, c in mix], dtype=float)
    p /= p.sum()
    n_chunk = BASE_EVENTS * CHUNK_MULT
    n_users = BASE_USERS * CHUNK_MULT * CHUNKS
    base_ts = np.datetime64("2024-01-01T00:00:00")
    writer = None
    for ci in range(CHUNKS):
        rng = np.random.default_rng([seed, 777, ci])
        ts = base_ts + rng.integers(
            0, 30 * 86400, size=n_chunk
        ).astype("timedelta64[s]")
        base_id = ci * n_chunk
        tbl = pa.table({
            "event_id": pa.array(
                range(base_id, base_id + n_chunk), pa.int64()
            ),
            "ts": pa.array(ts.astype("datetime64[us]")),
            "user_id": pa.array(
                rng.integers(0, n_users, size=n_chunk), pa.int64()
            ),
            "event_type": pa.array(
                types[rng.choice(len(types), size=n_chunk, p=p)]
            ),
            "value": pa.array(
                np.round(rng.exponential(120.0, size=n_chunk), 2),
                pa.float64(),
            ),
            "props": pa.array(["{}"] * n_chunk),
        })
        if writer is None:
            writer = pq.ParquetWriter(
                os.path.join(outdir, "events.parquet"), tbl.schema
            )
        writer.write_table(tbl)
        print(f"events chunk {ci + 1}/{CHUNKS}", flush=True)
    writer.close()


def main() -> None:
    outdir = sys.argv[1]
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 42
    os.makedirs(outdir, exist_ok=True)
    gen_documents(outdir, seed)
    gen_embeddings(outdir, seed)
    gen_events(outdir, seed)
    print(f"wrote {outdir}: {BASE_DOCS * 1000} docs, "
          f"{BASE_VECS * 1000} vecs, {BASE_EVENTS * 1000} events")


if __name__ == "__main__":
    main()
