"""Relevance-ranked full-text search (BM25).

The reference's search surface is filter-only — the webapp's bool queries
(`services/webapp/src/collections.js:146-208`) never use ES's relevance
score, only doc counts. A search-analyze engine replacing it should still
rank: this module scores documents against a term query with BM25 (the exact
formula ES/Lucene defaults to, k1=1.2, b=0.75) over the engine's pinned
``.split`` tokenization (functions/tokenize.py semantics via
``text.tokens_sql``).

Exact, not approximate — and shaped for scale:

- tokenize + explode + filter-to-query-terms happens in one codegen'd
  projection (the term filter drops ~all tokens before any shuffle);
- per-(doc, term) TFs are ONE hash aggregation keyed by doc_id, term;
- corpus stats (N, avgdl) and per-term doc frequencies are tiny frames that
  broadcast back — no second pass over the corpus rows;
- the final top-k is sort+limit (TakeOrderedAndProject), never a full sort.

Cross-engine determinism (the DuckDB oracle): every count is an integer;
``avgdl`` — the single value whose float summation order could differ
between engines — is rounded to 6 decimals on BOTH sides before use, after
which all arithmetic is identical IEEE ops on identical inputs.

BM25 idf: ln(1 + (N - df + 0.5) / (df + 0.5)); tf part:
tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from harmonize_search_analyze_spark.operators.text import tokens_sql

K1 = 1.2
B = 0.75


def _terms_list_sql(terms: list[str]) -> str:
    for t in terms:
        if not t.isalnum():
            raise ValueError(f"query terms must be alnum tokens: {t!r}")
    return ", ".join(f"'{t.lower()}'" for t in terms)


def bm25_search_sql(
    table: str,
    id_col: str,
    text_col: str,
    terms: list[str],
    dialect: str,
    k: int = 10,
) -> str:
    """Dual-dialect BM25 ranking query (identical math on Spark and DuckDB;
    see module docstring for the determinism argument)."""
    toks = tokens_sql(text_col, dialect)
    tlist = _terms_list_sql(terms)
    size_fn = "size" if dialect == "spark" else "len"
    if dialect == "spark":
        unnest = (
            f"SELECT {id_col} AS doc_id, dl, explode(toks) AS t FROM d"
        )
    else:
        unnest = f"SELECT {id_col} AS doc_id, dl, unnest(toks) AS t FROM d"
    return f"""
WITH d AS (
  SELECT {id_col}, {toks} AS toks, {size_fn}({toks}) AS dl
  FROM {table} WHERE {text_col} IS NOT NULL
),
stats AS (
  SELECT COUNT(*) AS n_docs, ROUND(AVG(dl), 6) AS avgdl FROM d
),
tf AS (
  SELECT doc_id, dl, t, COUNT(*) AS tf
  FROM ({unnest}) x
  WHERE t IN ({tlist})
  GROUP BY doc_id, dl, t
),
dfreq AS (
  SELECT t, COUNT(*) AS dft FROM tf GROUP BY t
)
SELECT tf.doc_id,
       ROUND(SUM(
         LN(1.0 + (stats.n_docs - dfreq.dft + 0.5) / (dfreq.dft + 0.5))
         * (tf.tf * ({K1} + 1.0))
         / (tf.tf + {K1} * (1.0 - {B} + {B} * tf.dl / stats.avgdl))
       ), 6) AS score
FROM tf
JOIN dfreq ON tf.t = dfreq.t
CROSS JOIN stats
GROUP BY tf.doc_id
ORDER BY score DESC, tf.doc_id ASC
LIMIT {k}
"""


def bm25_search(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    k: int = 10,
) -> DataFrame:
    """Run the BM25 ranking over a DataFrame (registers a temp view and
    executes the spark-dialect SQL — one corpus scan, broadcast stats)."""
    spark: SparkSession = df.sparkSession
    # unique view name: a fixed one collides under concurrent use
    view = f"__bm25_corpus_{uuid.uuid4().hex}"
    df.createOrReplaceTempView(view)
    out = spark.sql(
        bm25_search_sql(view, id_col, text_col, terms, "spark", k)
    )
    spark.catalog.dropTempView(view)
    return out


def rrf_fuse(
    ranked: list[DataFrame],
    *,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 10,
) -> DataFrame:
    """Reciprocal Rank Fusion (the ES 'hybrid search' combiner): fuse any
    number of ranked retrieval lists by score = Σ 1/(rrf_k + rank) over
    the lists each doc appears in (Cormack et al. 2009 — rank-based, so
    BM25 scores and cosines never need calibration against each other).

    Input frames carry (id_col, rank_col) with rank starting at 1. Returns
    (id, rrf_score DOUBLE rounded 6, n_lists BIGINT) — top-k by score,
    ties to the lowest id. Scale shape: each ranked list is already top-N
    (bounded), so the union + hash agg is bounded by Σ|lists| rows no
    matter the corpus size — the fusion is metadata-sized work after the
    retrievals."""
    if not ranked:
        raise ValueError("need at least one ranked list")
    parts = [df.select(F.col(id_col), F.col(rank_col)) for df in ranked]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (
        u.groupBy(id_col)
        .agg(
            F.round(
                F.sum(F.lit(1.0) / (F.lit(float(rrf_k)) + F.col(rank_col))),
                6,
            ).alias("rrf_score"),
            F.count(F.lit(1)).cast("bigint").alias("n_lists"),
        )
        .orderBy(F.desc("rrf_score"), F.asc(id_col))
        .limit(k)
    )
