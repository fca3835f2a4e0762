"""Generate a REALISTIC-duplicate-structure corpus for the band-join
near-dup decade rig (VERDICT r8 "Next round" #3).

The m10/m100 rig (gen_scale_data.py) reproduces the driver corpus's
distributions — which are uniform-random Zipf text with ~0.3% planted
exact dups. On that corpus, band-bucket collisions between NON-duplicates
grow quadratically with n (every pair of random Zipf docs shares enough
unigram shingles to collide somewhere), so an m100 row for
lsh_near_dup / simhash_banded / containment_pairs measures the synthetic
corpus, not the operator (decade2_r8.json's documented exclusion).

Real web corpora are the opposite shape: duplicate mass CLUSTERS around
true near-dup groups (mirrors, boilerplate reposts, quote-chains) over a
diverse background whose pairwise similarity is low. This generator
builds that shape deterministically:

- **Background (~80% of docs)**: independent draws from a 30k-word
  Zipfian vocabulary (s = 1.07), lognormal token length (median ~160,
  clipped 30-800). Two background docs share head words but almost no
  3-gram shingles — band collisions between them are rare at production
  configs (k=64 minhashes, 8 rows/band; 64-bit simhash).
- **Duplicate clusters (~20% of docs)**: seed docs spawn 1-8 mutated
  copies (geometric, mean cluster ~3). Each copy either
  (a) token-substitutes at a per-copy rate drawn log-uniformly from
  [0.002, 0.08] — spanning both sides of the Jaccard-0.8 verify
  threshold so the verify stage does real work, or
  (b) with probability 0.25 is a contiguous 40-80% slice of its seed
  (the asymmetric-containment case that containment_pairs exists for).

True near-dup pairs therefore grow LINEARLY with corpus size (clusters
scale with n, pairs-per-cluster bounded), which is exactly the regime the
banded operators are designed for — the decade row can attribute wall
growth to input volume + true-pair output instead of corpus artifacts.

Usage: python scripts/gen_neardup_corpus.py OUTDIR N_DOCS [SEED]
(schema matches testdata documents.parquet: doc_id, text, lang, source,
n_chars)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB_SIZE = 30_000
DUP_FRACTION = 0.20
SLICE_PROB = 0.25
LANGS = [("web", "en", 0.62), ("web", "de", 0.10), ("news", "en", 0.14),
         ("wiki", "en", 0.09), ("forum", "en", 0.05)]


def _vocab() -> np.ndarray:
    # deterministic pseudo-words: 'w' + base-26 letters, so shingle
    # hashing sees realistic-entropy byte strings, not dense integers
    def word(i: int) -> str:
        s = ""
        i += 1
        while i:
            i, r = divmod(i, 26)
            s += chr(97 + r)
        return "w" + s

    return np.array([word(i) for i in range(VOCAB_SIZE)])


def _zipf_probs() -> np.ndarray:
    p = 1.0 / np.power(np.arange(1, VOCAB_SIZE + 1) + 2.7, 1.07)
    return p / p.sum()


def build_table(n_docs: int, seed: int = 42, id_offset: int = 0):
    """One corpus block as a pyarrow Table — factored out so the
    chunked nd1000 generator (gen_neardup_corpus_nd1000.py) can stream
    blocks through a ParquetWriter at constant memory. Duplicate
    clusters are intra-block, so true-pair mass stays linear in n
    regardless of blocking."""
    rng = np.random.default_rng(seed)
    vocab, probs = _vocab(), _zipf_probs()

    n_dup = int(DUP_FRACTION * n_docs)
    n_background = n_docs - n_dup

    lens = np.clip(
        np.exp(rng.normal(np.log(160), 0.6, size=n_background)), 30, 800
    ).astype(int)
    total = int(lens.sum())
    flat = rng.choice(vocab, size=total, p=probs)
    background: list[list[str]] = []
    pos = 0
    for nw in lens:
        background.append(list(flat[pos: pos + nw]))
        pos += nw

    # clusters: geometric copy counts (mean ~2 copies per seed)
    copies_left, seeds, copy_counts = n_dup, [], []
    while copies_left > 0:
        c = min(1 + int(rng.geometric(0.5)), 8, copies_left)
        seeds.append(int(rng.integers(0, n_background)))
        copy_counts.append(c)
        copies_left -= c

    dup_texts: list[list[str]] = []
    for seed_idx, c in zip(seeds, copy_counts):
        base = background[seed_idx]
        for _ in range(c):
            if rng.random() < SLICE_PROB and len(base) >= 50:
                frac = rng.uniform(0.4, 0.8)
                span = max(20, int(frac * len(base)))
                start = int(rng.integers(0, len(base) - span + 1))
                dup_texts.append(base[start: start + span])
                continue
            rate = float(np.exp(rng.uniform(np.log(0.002), np.log(0.08))))
            toks = list(base)
            hits = np.nonzero(rng.random(len(toks)) < rate)[0]
            repl = rng.choice(vocab, size=len(hits), p=probs)
            for j, w in zip(hits, repl):
                toks[j] = str(w)
            dup_texts.append(toks)

    texts = [" ".join(t) for t in background] + [" ".join(t) for t in dup_texts]
    order = rng.permutation(len(texts))
    texts = [texts[i] for i in order]

    lp = np.array([w for _, _, w in LANGS])
    pick = rng.choice(len(LANGS), size=len(texts), p=lp / lp.sum())
    return pa.table({
        "doc_id": pa.array(range(id_offset, id_offset + len(texts)),
                           pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array([LANGS[i][1] for i in pick]),
        "source": pa.array([LANGS[i][0] for i in pick]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def generate(outdir: str, n_docs: int, seed: int = 42) -> None:
    tbl = build_table(n_docs, seed)
    os.makedirs(outdir, exist_ok=True)
    pq.write_table(tbl, os.path.join(outdir, "documents.parquet"))
    print(f"wrote {tbl.num_rows} docs -> {outdir}")


if __name__ == "__main__":
    generate(sys.argv[1], int(sys.argv[2]),
             int(sys.argv[3]) if len(sys.argv) > 3 else 42)
