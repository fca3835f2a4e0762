"""ES Graph explore (the ``_graph/explore`` API / Kibana Graph UI).

A two-wave co-occurrence spider over a text field: the seed query's
matching documents surface the first wave of vertices (most-connected
terms), then every document containing a wave-1 vertex is explored for
the connections it reveals (wave-2 targets + edge doc counts). This is
the ``use_significance: false`` mode of the API (edges weighted by raw
co-occurring-document count); significance-weighted vertex scoring is
the ``significant_text`` operator composed upstream. Deeper spiders are
successive calls seeded from the previous wave's vertices, exactly like
the REST API's repeated explore requests.

Pins (documented divergences-by-simplification from the ES plugin):
- the seed token itself is excluded from the vertex set (it trivially
  connects to everything in its own doc set);
- per-document term multiplicity is ignored (ES samples per-shard
  diversified doc sets; here every matching doc counts once — the
  batch-exact answer the oracle can replay).

Scale shape: one token explode (linear), wave-1 vertex set is
``size``-bounded and broadcast, per-doc edge fan-out is bounded by
|wave-1 terms in doc| x |doc tokens| — never all-pairs over the corpus.
At 100 TB persist the per-doc distinct-token frame across the three
hops (it is scanned three times here; the plan is otherwise one
straight-line agg per hop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from harmonize_search_analyze_spark.functions.tokenize import split_tokens


def graph_explore(
    df: DataFrame,
    text_col: str,
    seed_term: str,
    *,
    id_col: str = "doc_id",
    size: int = 5,
    conn_size: int = 20,
    min_doc_count: int = 2,
) -> DataFrame:
    """Two-wave graph exploration from ``seed_term``. Returns the edge
    list (source, target, doc_count): source is a wave-1 vertex (top
    ``size`` terms co-occurring with the seed, by distinct-doc count),
    target a wave-2 discovery (not the seed, not a wave-1 vertex),
    doc_count the distinct documents containing both. Ordered
    (doc_count DESC, source ASC, target ASC), top ``conn_size``."""
    seed = seed_term.lower()
    tok = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("__doc"),
        F.explode(F.array_distinct(split_tokens(text_col))).alias("term"),
    )
    seed_docs = tok.where(F.col("term") == seed).select("__doc").distinct()
    v0 = (
        tok.join(seed_docs, "__doc")
        .where(F.col("term") != seed)
        .groupBy("term")
        .agg(F.count_distinct("__doc").alias("dc"))
        .orderBy(F.desc("dc"), F.asc("term"))
        .limit(size)
    )
    src = tok.join(
        F.broadcast(v0.select(F.col("term").alias("source"))),
        tok.term == F.col("source"),
    ).select("__doc", "source")
    return (
        tok.join(src, "__doc")
        .where((F.col("term") != F.col("source")) & (F.col("term") != seed))
        .join(
            F.broadcast(v0.select("term")), "term", "left_anti"
        )
        .groupBy("source", F.col("term").alias("target"))
        .agg(F.count_distinct("__doc").alias("doc_count"))
        .where(F.col("doc_count") >= min_doc_count)
        .orderBy(F.desc("doc_count"), F.asc("source"), F.asc("target"))
        .limit(conn_size)
    )


def graph_explore_sql(
    table: str,
    text_col: str,
    seed_term: str,
    dialect: str,
    *,
    id_col: str = "doc_id",
    size: int = 5,
    conn_size: int = 20,
    min_doc_count: int = 2,
) -> str:
    """Dual-dialect twin of :func:`graph_explore`."""
    from harmonize_search_analyze_spark.operators.text import tokens_sql

    toks = tokens_sql(text_col, dialect)
    if dialect == "spark":
        stream = f"explode(array_distinct({toks}))"
    else:
        stream = f"unnest(list_distinct({toks}))"
    seed = seed_term.lower().replace("'", "''")
    return f"""
WITH tok AS (
  SELECT {id_col} AS doc, {stream} AS term
  FROM {table} WHERE {text_col} IS NOT NULL
),
seed_docs AS (SELECT DISTINCT doc FROM tok WHERE term = '{seed}'),
v0 AS (
  SELECT term, COUNT(DISTINCT t.doc) AS dc
  FROM tok t JOIN seed_docs USING (doc)
  WHERE term <> '{seed}'
  GROUP BY term ORDER BY dc DESC, term ASC LIMIT {size}
),
src AS (
  SELECT t.doc, t.term AS source FROM tok t JOIN v0 ON t.term = v0.term
)
SELECT s.source, t.term AS target,
       CAST(COUNT(DISTINCT t.doc) AS BIGINT) AS doc_count
FROM tok t JOIN src s ON t.doc = s.doc
WHERE t.term <> s.source AND t.term <> '{seed}'
  AND t.term NOT IN (SELECT term FROM v0)
GROUP BY 1, 2
HAVING COUNT(DISTINCT t.doc) >= {min_doc_count}
ORDER BY doc_count DESC, source ASC, target ASC LIMIT {conn_size}
"""
