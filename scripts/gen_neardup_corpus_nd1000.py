"""Chunked nd1000 generator (5M docs) — the THIRD decade for the band-join
near-dup family on the realistic-duplicate-structure corpus (VERDICT r9
"next round" #6).

Same distributions as gen_neardup_corpus.py (clustered duplicates over a
Zipf background), written as 10 x 500k-doc blocks through a
ParquetWriter so peak memory stays at the known-good nd100 working set.
Block i uses rng seed [base_seed, i] and a 500k id offset; duplicate
clusters are intra-block by construction, so true near-dup pairs stay
LINEAR in corpus size — the regime the banded operators are designed
for and the property the decade ratio interprets.

Usage: python scripts/gen_neardup_corpus_nd1000.py [/tmp/sparkgraft_nd1000]
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gen_neardup_corpus import build_table  # noqa: E402

CHUNKS = 10
CHUNK_DOCS = 500_000
BASE_SEED = 42


def main(outdir: str) -> None:
    os.makedirs(outdir, exist_ok=True)
    path = os.path.join(outdir, "documents.parquet")
    writer = None
    for ci in range(CHUNKS):
        tbl = build_table(CHUNK_DOCS, seed=[BASE_SEED, ci],
                          id_offset=ci * CHUNK_DOCS)
        if writer is None:
            writer = pq.ParquetWriter(path, tbl.schema)
        writer.write_table(tbl)
        print(f"block {ci + 1}/{CHUNKS}: {tbl.num_rows} docs", flush=True)
    writer.close()
    print(f"wrote {CHUNKS * CHUNK_DOCS} docs -> {outdir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparkgraft_nd1000")
