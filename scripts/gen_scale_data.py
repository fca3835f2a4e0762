"""Generate scaled documents/embeddings tables, stats-matched to the
driver's sf0.1 testdata, for scale-validation runs (sf1 = 10x sf0.1).

The driver's tables are read-only and stop at sf0.1; the 100 TB design
claims need at least one measured decade of scaling. This generator
reproduces the sf0.1 corpus's distributions — vocabulary, document length
(chars 44-577, mean ~297), source/lang mix, ~0.3% exact-duplicate rate,
unit-norm 64-d embeddings with uniform labels — at any multiplier, with a
fixed seed. To keep the comparison apples-to-apples, scale runs compare a
mult=1 dataset from THIS generator against mult=10 from THIS generator
(the real sf0.1 timing is reported alongside as a sanity anchor).

Usage: python scripts/gen_scale_data.py OUTDIR MULT [SEED]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.1"
BASE_DOCS = 5_000
BASE_VECS = 2_000
DIM = 64


def _base_stats():
    import duckdb

    # frequency-WEIGHTED vocabulary (word, count) — sampling from the
    # distinct-word list would flatten the corpus's Zipfian token
    # distribution, which is exactly what the scale runs measure (band
    # bucket sizes, gram entropy, BPE pair counts)
    words = duckdb.sql(
        f"SELECT w, COUNT(*) AS c FROM (SELECT unnest(string_split(text, "
        f"' ')) AS w FROM read_parquet('{BASE}/documents.parquet')) "
        "WHERE w != '' GROUP BY w ORDER BY w"
    ).fetchall()
    vocab = [w for w, _ in words]
    vocab_p = np.array([c for _, c in words], dtype=float)
    vocab_p /= vocab_p.sum()
    mix = duckdb.sql(
        f"SELECT source, lang, COUNT(*) FROM "
        f"read_parquet('{BASE}/documents.parquet') GROUP BY 1, 2"
    ).fetchall()
    lens = duckdb.sql(
        f"SELECT length(string_split(text, ' ')) FROM "
        f"read_parquet('{BASE}/documents.parquet')"
    ).fetchall()
    return vocab, vocab_p, mix, np.array([n for (n,) in lens])


def gen_documents(outdir: str, mult: int, rng: np.random.Generator) -> None:
    vocab, vocab_p, mix, lens = _base_stats()
    n_docs = BASE_DOCS * mult
    pairs = [(s, lg) for s, lg, _ in mix]
    probs = np.array([c for _, _, c in mix], dtype=float)
    probs /= probs.sum()
    pick = rng.choice(len(pairs), size=n_docs, p=probs)
    n_words = rng.choice(lens, size=n_docs)  # bootstrap the length dist
    total_words = int(n_words.sum())
    flat = rng.choice(np.array(vocab), size=total_words, p=vocab_p)
    texts: list[str] = []
    pos = 0
    for nw in n_words:
        texts.append(" ".join(flat[pos : pos + nw]))
        pos += nw
    # plant exact duplicates at the sf0.1 rate (~0.3% of docs are copies);
    # offset guarantees dst != src so no planted dup is a no-op
    n_dup = max(1, int(0.003 * n_docs))
    dup_src = rng.integers(0, n_docs, size=n_dup)
    dup_dst = (dup_src + 1 + rng.integers(0, n_docs - 1, size=n_dup)) % n_docs
    for s, d in zip(dup_src, dup_dst):
        texts[d] = texts[s]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array([pairs[i][1] for i in pick]),
            "source": pa.array([pairs[i][0] for i in pick]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(outdir, "documents.parquet"))


def gen_embeddings(outdir: str, mult: int, rng: np.random.Generator) -> None:
    n = BASE_VECS * mult
    vecs = rng.standard_normal((n, DIM)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array(
                rng.integers(0, 10, size=n).tolist(), pa.int64()
            ),
        }
    )
    pq.write_table(tbl, os.path.join(outdir, "embeddings.parquet"))


BASE_EVENTS = 100_000
BASE_USERS = 1_500


def gen_events(outdir: str, mult: int, rng: np.random.Generator) -> None:
    """Events stats-matched to sf0.1: same type mix and 30-day span;
    users scale with the multiplier (so per-user history depth stays
    fixed — the window-partition size a user-keyed operator actually
    sees), event volume scales linearly."""
    import duckdb

    mix = duckdb.sql(
        f"SELECT event_type, COUNT(*) FROM "
        f"read_parquet('{BASE}/events.parquet') GROUP BY 1 ORDER BY 1"
    ).fetchall()
    types = [t for t, _ in mix]
    p = np.array([c for _, c in mix], dtype=float)
    p /= p.sum()
    n = BASE_EVENTS * mult
    n_users = BASE_USERS * mult
    base_ts = np.datetime64("2024-01-01T00:00:00")
    ts = base_ts + rng.integers(
        0, 30 * 86400, size=n
    ).astype("timedelta64[s]")
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(ts.astype("datetime64[us]")),
            "user_id": pa.array(
                rng.integers(0, n_users, size=n).tolist(), pa.int64()
            ),
            "event_type": pa.array(
                [types[i] for i in rng.choice(len(types), size=n, p=p)]
            ),
            "value": pa.array(
                np.round(rng.exponential(120.0, size=n), 2).tolist(),
                pa.float64(),
            ),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(tbl, os.path.join(outdir, "events.parquet"))


def main() -> None:
    outdir = sys.argv[1]
    mult = int(sys.argv[2])
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(seed)
    gen_documents(outdir, mult, rng)
    gen_embeddings(outdir, mult, rng)
    gen_events(outdir, mult, rng)
    print(
        f"wrote {outdir}: {BASE_DOCS * mult} docs, {BASE_VECS * mult} vecs, "
        f"{BASE_EVENTS * mult} events"
    )


if __name__ == "__main__":
    main()
