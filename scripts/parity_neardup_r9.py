"""Value parity for the band-join near-dup family on the REALISTIC
clustered-duplicate corpus (companion to scripts/decade_neardup_r9.json).

The driver gate proves these operators against DuckDB at sf0.01 with the
gate configs (k=8 unigram shingles). This artifact re-proves them on the
nd10 realistic corpus (gen_neardup_corpus.py) at the PRODUCTION configs
the decade rows measured — MinHash k=64 / 3-gram shingles / 8
rows-per-band, 64-bit trigram-feature SimHash — on a 1-in-10 sample (5k
docs; the DuckDB brute-force SimHash oracle is O(n^2)).

Checks (all order-insensitive, value-exact):
- lsh_near_dup:      Spark banded+verified pairs == DuckDB same-banding
                     twin (identical minhash family, bands, verify)
- containment_pairs: same, both containment directions + jaccard
- simhash_banded_trigram: Spark BANDED pairs == DuckDB BRUTE O(n^2)
                     pairs — cross-engine proof that pigeonhole banding
                     loses nothing on this corpus at feature_n=3

Writes scripts/parity_neardup_r9.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from harmonize_search_analyze_spark.functions.hashing import (  # noqa: E402
    hash64_sql,
    minhash_params,
    minhash_term_sql,
)
from harmonize_search_analyze_spark.operators.dedup import (  # noqa: E402
    containment_pairs,
    containment_sql,
    hamming_sql,
    jaccard_sql,
    near_dup_pairs_lsh,
    shingles_sql,
    simhash_near_dup_pairs_banded,
    simhash_select_sql,
)
from harmonize_search_analyze_spark.session import get_spark  # noqa: E402

ND10 = "/tmp/sparkgraft_nd10/documents.parquet"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "parity_neardup_r9.json")
K, N, RPB, THRESH = 64, 3, 8, 0.8


def _duck_lsh_sql(*, containment: bool) -> str:
    """DuckDB twin of the production-config MinHash-LSH pipeline —
    same hash family, band layout, and verify as the Spark operators."""
    sh = shingles_sql("text", "duckdb", N)
    mh = [
        f"list_min(list_transform({sh}, s -> "
        f"{minhash_term_sql(hash64_sql('s', 'duckdb'), a, b)})) AS mh_{i}"
        for i, (a, b) in enumerate(minhash_params(K))
    ]
    n_bands = K // RPB
    bands = " UNION ALL ".join(
        "SELECT doc_id, {bi} AS band_idx, {key} AS band_key FROM sigs".format(
            bi=bi,
            key=" || '_' || ".join(
                f"CAST(mh_{bi * RPB + r} AS VARCHAR)" for r in range(RPB)
            ),
        )
        for bi in range(n_bands)
    )
    j = jaccard_sql("sa.shingles", "sb.shingles", "duckdb")
    if containment:
        c12 = containment_sql("sa.shingles", "sb.shingles", "duckdb")
        c21 = containment_sql("sb.shingles", "sa.shingles", "duckdb")
        select = (
            f"SELECT id1, id2, c12, c21, jaccard FROM (SELECT id1, id2, "
            f"{c12} AS c12, {c21} AS c21, {j} AS jaccard "
            f"FROM cands JOIN sh sa ON sa.doc_id = id1 "
            f"JOIN sh sb ON sb.doc_id = id2) "
            f"WHERE c12 >= {THRESH} OR c21 >= {THRESH} ORDER BY id1, id2"
        )
    else:
        select = (
            f"SELECT id1, id2, j AS jaccard FROM (SELECT id1, id2, "
            f"{j} AS j FROM cands JOIN sh sa ON sa.doc_id = id1 "
            f"JOIN sh sb ON sb.doc_id = id2) "
            f"WHERE j >= {THRESH} ORDER BY id1, id2"
        )
    return f"""
WITH docs AS (
  SELECT doc_id, text FROM read_parquet('{ND10}') WHERE doc_id % 10 = 0
), sigs AS (
  SELECT doc_id, {', '.join(mh)} FROM docs
), bands AS ({bands}),
cands AS (
  SELECT DISTINCT l.doc_id AS id1, r.doc_id AS id2
  FROM bands l JOIN bands r
    ON l.band_idx = r.band_idx AND l.band_key = r.band_key
   AND l.doc_id < r.doc_id
), sh AS (
  SELECT doc_id, {shingles_sql('text', 'duckdb', N)} AS shingles FROM docs
)
{select}
"""


def _duck_simhash_brute_sql() -> str:
    sigs = simhash_select_sql(
        f"(SELECT doc_id, text FROM read_parquet('{ND10}') "
        "WHERE doc_id % 10 = 0)",
        "doc_id", "text", "duckdb", feature_n=N,
    )
    ham = hamming_sql("a.simhash", "b.simhash", "duckdb")
    return f"""
WITH sigs AS ({sigs})
SELECT id1, id2, hamming FROM (
  SELECT a.doc_id AS id1, b.doc_id AS id2, CAST({ham} AS INT) AS hamming
  FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
) WHERE hamming <= 3 ORDER BY id1, id2
"""


def main() -> None:
    spark = get_spark(app_name="neardup_parity", driver_memory="48g")
    spark.sparkContext.setLogLevel("ERROR")
    docs = (
        spark.read.parquet(ND10)
        .where(F.col("doc_id") % 10 == 0)
        .select("doc_id", "text")
        .repartition(32, "doc_id")
        .localCheckpoint()
    )
    con = duckdb.connect()
    results = {}

    def compare(name, spark_df, duck_sql):
        want = sorted(tuple(r) for r in spark_df.collect())
        got = sorted(tuple(r) for r in con.execute(duck_sql).fetchall())
        results[name] = {"match": want == got, "rows": len(want)}
        print(name, results[name])

    compare(
        "lsh_near_dup_production",
        near_dup_pairs_lsh(docs, "doc_id", "text",
                           threshold=THRESH, k=K, n=N, rows_per_band=RPB),
        _duck_lsh_sql(containment=False),
    )
    compare(
        "containment_pairs_production",
        containment_pairs(docs, "doc_id", "text",
                          threshold=THRESH, k=K, n=N, rows_per_band=RPB),
        _duck_lsh_sql(containment=True),
    )
    compare(
        "simhash_banded_trigram_vs_duck_brute",
        simhash_near_dup_pairs_banded(docs, "doc_id", "text",
                                      max_hamming=3, feature_n=N),
        _duck_simhash_brute_sql(),
    )

    out = {
        "round": 9,
        "note": (
            "Band-join family value parity on the realistic "
            "clustered-duplicate corpus (nd10, 1-in-10 sample = 5k docs) "
            "at the decade rig's PRODUCTION configs. The simhash row "
            "compares Spark's BANDED path against DuckDB's BRUTE O(n^2) "
            "oracle — cross-engine pigeonhole-exactness."
        ),
        "results": results,
    }
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps(out["results"], indent=1, sort_keys=True))
    assert all(r["match"] for r in results.values())


if __name__ == "__main__":
    main()
