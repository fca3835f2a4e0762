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


def pagerank(
    edges: DataFrame,
    *,
    iters: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
) -> DataFrame:
    """Fixed-iteration weighted PageRank — the crawl-graph centrality
    signal corpus-curation pipelines use for URL/domain quality (the
    CommonCrawl harmonic/PageRank ranking idea). A FIXED iteration
    count keeps the recursion unrollable: each iteration is one
    edges-to-ranks join + one dst agg + one dangling-mass scalar agg,
    so the whole run is a single deterministic Catalyst plan the SQL
    oracle replays CTE-for-CTE. Dangling mass (nodes with no
    out-edges) redistributes uniformly, the standard correction. At
    100 TB: ranks are node-sized (<< edges), the edges frame is scanned
    once per iteration — pre-partition edges by src and
    localCheckpoint the rank frame if iters grows past a handful.
    Returns (node, rank) ordered (rank DESC, node ASC); ranks sum to 1.
    """
    w = (
        F.col(weight_col).cast("double")
        if weight_col
        else F.lit(1.0)
    )
    # edges are loop-invariant but referenced 2x per unrolled iteration
    # (contrib join + outw) — without truncating lineage Catalyst would
    # replay the whole edge-derivation subtree (often an expensive
    # co-occurrence self-join) every time. localCheckpoint materializes
    # it once; measured 19.3s -> ~4s at sf0.1 on the co-occurrence gate.
    e = edges.select(
        F.col(src_col).alias("__s"),
        F.col(dst_col).alias("__t"),
        w.alias("__w"),
    ).localCheckpoint()
    nodes = (
        e.select(F.col("__s").alias("node"))
        .union(e.select(F.col("__t").alias("node")))
        .distinct()
    )
    nodes = nodes.localCheckpoint()
    nn = F.broadcast(nodes.agg(F.count(F.lit(1)).alias("__n")))
    outw = e.groupBy("__s").agg(F.sum("__w").alias("__ow")).localCheckpoint()
    r = nodes.crossJoin(nn).select(
        "node", (F.lit(1.0) / F.col("__n")).alias("rank")
    )
    for _ in range(iters):
        contrib = (
            e.join(r, e.__s == r.node)
            .join(outw, "__s")
            .groupBy("__t")
            .agg(F.sum(F.col("rank") * F.col("__w") / F.col("__ow")).alias("__c"))
        )
        dangling = F.broadcast(
            r.join(outw, r.node == outw.__s, "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dang"))
        )
        r = (
            nodes.crossJoin(nn)
            .crossJoin(dangling)
            .join(contrib, nodes.node == contrib.__t, "left")
            .select(
                "node",
                (
                    (1.0 - damping) / F.col("__n")
                    + damping
                    * (
                        F.coalesce(F.col("__c"), F.lit(0.0))
                        + F.col("__dang") / F.col("__n")
                    )
                ).alias("rank"),
            )
        )
        # rank frames are node-sized; truncating their lineage keeps
        # iteration i's plan flat instead of nesting i-1's joins
        r = r.localCheckpoint()
    return r.select("node", F.round("rank", 6).alias("rank")).orderBy(
        F.desc("rank"), F.asc("node")
    )


def pagerank_sql(
    edges_sql: str,
    dialect: str,
    *,
    iters: int = 3,
    damping: float = 0.85,
) -> str:
    """Dual-dialect twin of :func:`pagerank`. ``edges_sql`` yields
    (src, dst, w); the fixed iteration count unrolls to one CTE chain.
    """
    d = float(damping)
    ctes = [
        f"edges AS ({edges_sql})",
        "nodes AS (SELECT src AS node FROM edges"
        " UNION SELECT dst FROM edges)",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        "outw AS (SELECT src, SUM(w) AS ow FROM edges GROUP BY src)",
        "r0 AS (SELECT node, 1.0 / n AS rank FROM nodes CROSS JOIN nn)",
    ]
    for i in range(1, iters + 1):
        p = i - 1
        ctes.append(
            f"c{i} AS (SELECT e.dst AS node,"
            f" SUM(r.rank * e.w / o.ow) AS c"
            f" FROM edges e JOIN r{p} r ON e.src = r.node"
            f" JOIN outw o ON e.src = o.src GROUP BY e.dst)"
        )
        ctes.append(
            f"d{i} AS (SELECT COALESCE(SUM(rank), 0.0) AS dang"
            f" FROM r{p} WHERE node NOT IN (SELECT src FROM outw))"
        )
        ctes.append(
            f"r{i} AS (SELECT nodes.node,"
            f" (1.0 - CAST({d!r} AS DOUBLE)) / n"
            f" + CAST({d!r} AS DOUBLE) * (COALESCE(c.c, 0.0) + dang / n)"
            f" AS rank"
            f" FROM nodes CROSS JOIN nn CROSS JOIN d{i}"
            f" LEFT JOIN c{i} c ON nodes.node = c.node)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, ROUND(rank, 6) AS rank FROM r{iters}"
        " ORDER BY rank DESC, node ASC"
    )
