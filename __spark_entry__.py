"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship dashboard-panel query at sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL per query for the correctness gate.

Column-name and tie-break discipline: every aggregate is aliased identically
on both sides; every top-k pins the total order ``count DESC, key ASC``;
every floating aggregate is rounded to a fixed scale on both sides so the
value-hash compares equal despite summation-order differences.
"""

from __future__ import annotations

import math
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from harmonize_search_analyze_spark.functions.geohash import geohash_encode_sql
from harmonize_search_analyze_spark.functions.tokenize import phrase_prefix_regex
from harmonize_search_analyze_spark.operators.aggregations import (
    nested_terms,
    terms,
)
from harmonize_search_analyze_spark.operators.profiler import (
    build_data_dict,
    data_dict_oracle_sql,
    vartype_guess_oracle_sql,
)
from harmonize_search_analyze_spark.plans.compiler import compile_query
from harmonize_search_analyze_spark.sources.catalog import Catalog
from harmonize_search_analyze_spark.sources.tables import load_table as _t
from harmonize_search_analyze_spark.sources.tables import local_frame as _lf

SF0001 = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# flagship: one Kibana panel end-to-end — search predicate (compiled ES-DSL
# bool query: range + term match) -> terms top-k aggregation.
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    lineitem = _t(spark, SF0001, "lineitem")
    query = {
        "bool": {
            "must": [
                {"range": {"l_quantity": {"gte": 10, "lte": 40}}},
                {"match": {"l_linestatus": "F"}},
            ]
        }
    }
    return terms(lineitem.where(compile_query(query)), "l_returnflag", k=10)


# ---------------------------------------------------------------------------
# queries + oracles
# ---------------------------------------------------------------------------

def q_terms_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: single-level terms agg, top-10 brands by doc count."""
    return terms(_t(spark, sf_dir, "part"), "p_brand", k=10)


SQL_TERMS_TOPK = """
SELECT p_brand, COUNT(*) AS doc_count FROM part
WHERE p_brand IS NOT NULL
GROUP BY p_brand ORDER BY doc_count DESC, p_brand ASC LIMIT 10
"""


def q_search_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2+Q4+Q5 composed as bool-must (the webapp's generateQuery shape),
    then count + sum metrics."""
    ast = {
        "bool": {
            "must": [
                {"range": {"l_quantity": {"gte": 10, "lte": 25}}},
                {"terms": {"l_returnflag": ["N", "A"]}},
                {"match": {"l_linestatus": "O"}},
            ]
        }
    }
    df = _t(spark, sf_dir, "lineitem").where(compile_query(ast))
    return df.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


SQL_SEARCH_BOOL = """
SELECT COUNT(*) AS cnt,
       ROUND(SUM(l_extendedprice), 2) AS sum_price
FROM lineitem
WHERE l_quantity >= 10 AND l_quantity <= 25
  AND l_returnflag IN ('N', 'A') AND l_linestatus = 'O'
"""


def q_phrase_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: match_phrase_prefix over the pinned .split tokenization —
    'merge so' matches 'merge sort...' mid-document (multi-word phrase,
    last word as a prefix), rolled up by source."""
    ast = {"match_phrase_prefix": {"text.split": "merge so"}}
    df = _t(spark, sf_dir, "documents").where(compile_query(ast))
    return terms(df, "source", k=10)


def _sql_phrase_prefix() -> str:
    pattern = phrase_prefix_regex("merge so")
    return f"""
SELECT source, COUNT(*) AS doc_count FROM documents
WHERE regexp_matches(LOWER(text), '{pattern}') AND source IS NOT NULL
GROUP BY source ORDER BY doc_count DESC, source ASC LIMIT 10
"""


def q_datetime_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3+Q8: datetime range filter (epoch-millis form the webapp emits) ->
    status breakdown."""
    frm = 804556800000   # 1995-07-01T00:00:00Z (the corpus spans 1995-2001)
    to = 852076800000    # 1997-01-01T00:00:00Z
    ast = {"bool": {"must": [
        {"range": {"o_orderdate": {"from": frm, "to": to, "format": "epoch_millis"}}},
    ]}}
    df = _t(spark, sf_dir, "orders").where(compile_query(ast))
    return (
        df.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_total"),
        )
        .orderBy("o_orderstatus")
    )


SQL_DATETIME_RANGE = """
SELECT o_orderstatus, COUNT(*) AS cnt,
       ROUND(SUM(o_totalprice), 2) AS sum_total
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-07-01 00:00:00'
  AND o_orderdate <= TIMESTAMP '1997-01-01 00:00:00'
GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def q_nested_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: the Day/Hour panel — dayofweek (top 10 by total) -> hour (top 24)."""
    ev = (
        _t(spark, sf_dir, "events")
        .withColumn("dayofweek", F.date_format("ts", "EEEE"))
        .withColumn("hour", F.hour("ts").cast("bigint"))
    )
    out = nested_terms(ev, "dayofweek", "hour", outer_k=10, inner_k=24)
    return out.select(
        "dayofweek", "hour",
        F.col("doc_count").alias("doc_count"),
        F.col("outer_count").alias("outer_count"),
    )


SQL_NESTED_TERMS = """
WITH pair AS (
  SELECT dayname(ts) AS dayofweek, hour(ts) AS hour, COUNT(*) AS doc_count
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
), tot AS (
  SELECT *, CAST(SUM(doc_count) OVER (PARTITION BY dayofweek) AS BIGINT) AS outer_count,
         ROW_NUMBER() OVER (PARTITION BY dayofweek
                            ORDER BY doc_count DESC, hour ASC) AS inner_rank
  FROM pair
), ranked AS (
  SELECT *, DENSE_RANK() OVER (ORDER BY outer_count DESC, dayofweek ASC) AS outer_rank
  FROM tot WHERE inner_rank <= 24
)
SELECT dayofweek, hour, doc_count, outer_count FROM ranked WHERE outer_rank <= 10
"""


# *97 spreads small-SF partkeys over the full latitude range —
# without it, sf0.01 keys (<2000) cluster at -90..-70 and every
# geo FILTER query matches zero rows (a weak gate)
_LAT_EXPR = "((CAST((l_partkey * 97) % 18000 AS DOUBLE) / 100.0) - 90.0)"
_LON_EXPR = "((CAST(l_orderkey % 36000 AS DOUBLE) / 100.0) - 180.0)"


def q_geohash_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: geohash_grid precision-2 bucket counts over synthesized lat/lon
    (FIXTURES.md §4: derive coordinates from numeric columns)."""
    df = _t(spark, sf_dir, "lineitem")
    gh = geohash_encode_sql(_LAT_EXPR, _LON_EXPR, precision=2)
    return (
        df.select(F.expr(gh).alias("geohash"))
        .groupBy("geohash")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy(F.desc("doc_count"), F.asc("geohash"))
    )


def _sql_geohash_grid() -> str:
    gh = geohash_encode_sql(_LAT_EXPR, _LON_EXPR, precision=2)
    return f"""
SELECT {gh} AS geohash, COUNT(*) AS doc_count FROM lineitem
GROUP BY 1 ORDER BY doc_count DESC, geohash ASC
"""


_LINEITEM_NUMERIC = [
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
    "l_quantity", "l_extendedprice", "l_discount", "l_tax",
]
_LINEITEM_OTHER = ["l_returnflag", "l_linestatus", "l_shipdate"]


def q_profile_dict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: the single-pass column profiler (dictionary stats) over lineitem."""
    df = _t(spark, sf_dir, "lineitem")
    d = build_data_dict(df, columns=_LINEITEM_NUMERIC + _LINEITEM_OTHER)
    return d.select(
        "dict_field", "dict_count", "dict_countdistinct", "dict_countmissing",
        F.round("dict_mean", 6).alias("dict_mean"),
        F.round("dict_stddev", 6).alias("dict_stddev"),
        "dict_min", "dict_max",
    )


def q_union_wildcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2/Q9: index-pattern union of two heterogeneous 'harmonized' datasets
    (customer has mktsegment, supplier doesn't) -> per-nation rollup."""
    cust = (
        _t(spark, sf_dir, "customer")
        .select(
            F.col("c_name").alias("entity_name"),
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_acctbal").alias("acctbal"),
            F.col("c_mktsegment").alias("mktsegment"),
        )
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .select(
            F.col("s_name").alias("entity_name"),
            F.col("s_nationkey").alias("nationkey"),
            F.col("s_acctbal").alias("acctbal"),
        )
    )
    cat = Catalog(spark)
    cat.register("customer_harmonized", cust)
    cat.register("supplier_harmonized", supp)
    union = cat.resolve("*_harmonized")
    return (
        union.groupBy("nationkey")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("acctbal"), 2).alias("sum_acctbal"),
            F.count("mktsegment").alias("cnt_segment"),
        )
        .orderBy("nationkey")
    )


SQL_UNION_WILDCARD = """
WITH u AS (
  SELECT c_name AS entity_name, c_nationkey AS nationkey,
         c_acctbal AS acctbal, c_mktsegment AS mktsegment FROM customer
  UNION ALL
  SELECT s_name, s_nationkey, s_acctbal, NULL FROM supplier
)
SELECT nationkey, COUNT(*) AS cnt, ROUND(SUM(acctbal), 2) AS sum_acctbal,
       COUNT(mktsegment) AS cnt_segment
FROM u GROUP BY nationkey ORDER BY nationkey
"""


def q_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema equi-join + agg (SURVEY.md §2.6: the engine ships joins
    even though the reference avoids them). Dims are broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("n_name")
    )
    return rev


SQL_JOIN_REVENUE = """
SELECT n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*) AS cnt
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""


def q_event_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window agg over the events stream table (the batch
    expression of the streaming dashboard refresh; see streaming/)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(F.col("w.start").alias("window_start"), "cnt", "avg_value")
        .orderBy("window_start")
    )


SQL_EVENT_WINDOW = """
SELECT date_trunc('hour', ts) AS window_start, COUNT(*) AS cnt,
       ROUND(AVG(value), 6) AS avg_value
FROM events GROUP BY 1 ORDER BY 1
"""


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over documents: hash-groupBy on normalized text, keep the
    min doc_id as canonical."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(F.lower(F.trim("text"))).alias("text_hash"))
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .orderBy("text_hash")
    )


SQL_DEDUP_EXACT = """
SELECT md5(LOWER(TRIM(text))) AS text_hash, MIN(doc_id) AS keep_id,
       COUNT(*) AS n_copies
FROM documents GROUP BY 1 ORDER BY 1
"""


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: token counts, distinct-token ratio, stopword ratio —
    per-source aggregate quality profile of the documents table."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    stop = F.expr(
        "size(filter(split(text, ' '), t -> t IN ('the', 'a')))"
    )
    per_doc = docs.select(
        "source",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        stop.alias("n_stopwords"),
        F.length("text").alias("n_chars2"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_tokens").cast("bigint")).alias("sum_tokens"),
            F.round(F.avg("n_distinct_tokens"), 6).alias("avg_distinct_tokens"),
            F.round(
                F.avg(F.col("n_stopwords") / F.col("n_tokens")), 6
            ).alias("stopword_ratio"),
            F.sum(F.col("n_chars2").cast("bigint")).alias("sum_chars"),
        )
        .orderBy("source")
    )


SQL_TEXT_STATS = """
WITH per_doc AS (
  SELECT source,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
         len(list_filter(string_split(text, ' '),
                         t -> t IN ('the', 'a'))) AS n_stopwords,
         length(text) AS n_chars2
  FROM documents
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       ROUND(AVG(n_distinct_tokens), 6) AS avg_distinct_tokens,
       ROUND(AVG(CAST(n_stopwords AS DOUBLE) / n_tokens), 6) AS stopword_ratio,
       CAST(SUM(n_chars2) AS BIGINT) AS sum_chars
FROM per_doc GROUP BY source ORDER BY source
"""


def q_harmonize_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end harmonization pipeline (§2.2/2.9 semantics) exercised on
    orders: serialize the timestamp to the cities' raw string formats, then
    re-extract parts via the multi-format regexes, rebuild the datetime,
    value-map the status enum (unmatched values pass through), and roll up.
    """
    from harmonize_search_analyze_spark.operators.harmonize import (
        Harmonizer,
        extract_date_parts,
        extract_time_parts,
    )

    raw = (
        _t(spark, sf_dir, "orders")
        .withColumn("date_str", F.date_format("o_orderdate", "M/d/yyyy"))
        .withColumn("time_str", F.date_format("o_orderdate", "H:mm:ss"))
    )
    df = extract_date_parts(raw, "date_str")
    df = extract_time_parts(df, "time_str")
    h = (
        Harmonizer(df)
        .map_var("o_orderstatus", "status")
        .derive_datetime()
        .derive_dayofweek()
        .map_values("status", {"F": "Fulfilled", "O": "Open"})  # 'P' passes through
        .add_provenance(city="synthetic")
    )
    return (
        h.df.groupBy("year", "status", "dayofweek")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("year", "status", "dayofweek")
    )


SQL_HARMONIZE_ROLLUP = """
SELECT CAST(year(o_orderdate) AS INT) AS year,
       CASE o_orderstatus WHEN 'F' THEN 'Fulfilled' WHEN 'O' THEN 'Open'
            ELSE o_orderstatus END AS status,
       dayname(o_orderdate) AS dayofweek,
       COUNT(*) AS cnt
FROM orders GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


def q_text_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star text ops per doc: token counts (plain + BPE-ish), quality
    components + score, language ID, rolling-hash fingerprint."""
    from harmonize_search_analyze_spark.operators.text import analyze_documents

    docs = _t(spark, sf_dir, "documents")
    return analyze_documents(docs).select(
        "doc_id", "n_tokens", "mean_token_len", "stopword_ratio",
        "alnum_ratio", "bpe_ish_tokens", "quality", "lang_pred", "fingerprint",
    )


def _sql_text_analysis() -> str:
    from harmonize_search_analyze_spark.operators.text import (
        bpe_ish_token_count_sql,
        fingerprint_sql,
        lang_id_sql,
        quality_components_sql,
        quality_score_sql,
    )

    c = quality_components_sql("text", "duckdb")
    return f"""
SELECT doc_id,
       {c['n_tokens']} AS n_tokens,
       {c['mean_token_len']} AS mean_token_len,
       {c['stopword_ratio']} AS stopword_ratio,
       {c['alnum_ratio']} AS alnum_ratio,
       CAST({bpe_ish_token_count_sql('text', 'duckdb')} AS BIGINT) AS bpe_ish_tokens,
       {quality_score_sql('text', 'duckdb')} AS quality,
       {lang_id_sql('text', 'duckdb')} AS lang_pred,
       {fingerprint_sql('text', 'duckdb')} AS fingerprint
FROM documents
"""


def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signature matrix (k=8, token shingles) over documents."""
    from harmonize_search_analyze_spark.operators.dedup import minhash_signatures

    docs = _t(spark, sf_dir, "documents")
    return minhash_signatures(docs, "doc_id", "text", k=8, n=1)


def _sql_minhash_signatures() -> str:
    from harmonize_search_analyze_spark.operators.dedup import minhash_signature_sql

    exprs = minhash_signature_sql("text", "duckdb", k=8, n=1)
    cols = ", ".join(f"{e} AS mh_{i}" for i, e in enumerate(exprs))
    return f"SELECT doc_id, {cols} FROM documents"


def q_lsh_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs (token-set Jaccard >= 0.9) on a 1-in-10
    sample of documents (the driver data is dense with near-identical token
    sets; sampling keeps the verified-pair frame bounded in bench runs)."""
    from harmonize_search_analyze_spark.operators.dedup import near_dup_pairs_lsh

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 10 == 0)
    return near_dup_pairs_lsh(
        docs, "doc_id", "text", threshold=0.9, k=8, n=1, rows_per_band=2
    ).orderBy("id1", "id2")


def _sql_lsh_near_dup() -> str:
    from harmonize_search_analyze_spark.functions.hashing import (
        hash64_sql,
        minhash_params,
        minhash_term_sql,
    )
    from harmonize_search_analyze_spark.operators.dedup import (
        jaccard_sql,
        shingles_sql,
    )

    sh = shingles_sql("text", "duckdb", 1)
    mh = [
        f"list_min(list_transform({sh}, s -> "
        f"{minhash_term_sql(hash64_sql('s', 'duckdb'), a, b)})) AS mh_{i}"
        for i, (a, b) in enumerate(minhash_params(8))
    ]
    bands = " UNION ALL ".join(
        f"SELECT doc_id, {bi} AS band_idx, "
        f"CAST(mh_{2 * bi} AS VARCHAR) || '_' || CAST(mh_{2 * bi + 1} AS VARCHAR) "
        f"AS band_key FROM sigs"
        for bi in range(4)
    )
    j = jaccard_sql("a.shingles", "b.shingles", "duckdb")
    return f"""
WITH docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
), sigs AS (
  SELECT doc_id, {', '.join(mh)} FROM docs
), bands AS ({bands}),
cands AS (
  SELECT DISTINCT l.doc_id AS id1, r.doc_id AS id2
  FROM bands l JOIN bands r
    ON l.band_idx = r.band_idx AND l.band_key = r.band_key
   AND l.doc_id < r.doc_id
), sh AS (
  SELECT doc_id, {sh} AS shingles FROM docs
)
SELECT id1, id2, j AS jaccard FROM (
  SELECT id1, id2, {j.replace('a.shingles', 'sa.shingles').replace('b.shingles', 'sb.shingles')} AS j
  FROM cands JOIN sh sa ON sa.doc_id = id1 JOIN sh sb ON sb.doc_id = id2
) WHERE j >= 0.9 ORDER BY id1, id2
"""


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash sketch per document (explode -> bit sign-sums)."""
    from harmonize_search_analyze_spark.operators.dedup import simhash

    docs = _t(spark, sf_dir, "documents")
    return simhash(docs, "doc_id", "text").orderBy("doc_id")


def _sql_simhash() -> str:
    from harmonize_search_analyze_spark.operators.dedup import simhash_select_sql

    return (
        simhash_select_sql("documents", "doc_id", "text", "duckdb")
        + " ORDER BY doc_id"
    )


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (brute baseline, cos >= 0.35)."""
    from harmonize_search_analyze_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    emb = _t(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(emb, threshold=0.35).orderBy("id1", "id2")


SQL_EMBEDDING_NEAR_DUP = """
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
  FROM embeddings
)
SELECT a.vec_id AS id1, b.vec_id AS id2,
       ROUND(list_sum(list_transform(list_zip(a.e, b.e), p -> p[1] * p[2]))
             / (a.nrm * b.nrm), 6) AS cosine
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE ROUND(list_sum(list_transform(list_zip(a.e, b.e), p -> p[1] * p[2]))
            / (a.nrm * b.nrm), 6) >= 0.35
ORDER BY id1, id2
"""


_QUERY_VEC = [round(math.sin(i + 1.0), 6) for i in range(64)]


def q_similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN search: 16 deterministic centroids, probe 4."""
    from harmonize_search_analyze_spark.operators.similarity import (
        ivf_assign,
        ivf_search,
    )

    emb = _t(spark, sf_dir, "embeddings")
    centroids, assignments = ivf_assign(emb, n_centroids=16)
    return ivf_search(
        emb, centroids, assignments, _QUERY_VEC, k=10, nprobe=4
    )


def _sql_similarity_ivf() -> str:
    qlit = "[" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in _QUERY_VEC) + "]"
    qnorm = math.sqrt(sum(v * v for v in _QUERY_VEC))
    dot = "list_sum(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]))"
    nrm = "sqrt(list_sum(list_transform({a}, x -> x * x)))"
    cos_c = (
        "ROUND(" + dot.format(a="cvec", b=qlit) + " / ("
        + nrm.format(a="cvec") + f" * {qnorm!r}), 6)"
    )
    cos_e = (
        "ROUND(" + dot.format(a="e.embedding::DOUBLE[]", b=qlit) + " / ("
        + nrm.format(a="e.embedding::DOUBLE[]") + f" * {qnorm!r}), 6)"
    )
    d2 = (
        "ROUND(list_sum(list_transform(list_zip(dvec, cvec), "
        "p -> (p[1] - p[2]) * (p[1] - p[2]))), 6)"
    )
    return f"""
WITH cent AS (
  SELECT bucket AS centroid_id, cvec FROM (
    SELECT vec_id % 16 AS bucket, embedding::DOUBLE[] AS cvec,
           ROW_NUMBER() OVER (PARTITION BY vec_id % 16 ORDER BY vec_id) AS rn
    FROM embeddings) WHERE rn = 1
), probes AS (
  SELECT centroid_id FROM cent
  ORDER BY {cos_c} DESC, centroid_id ASC LIMIT 4
), assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT v.vec_id, c.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY {d2}, c.centroid_id) AS rn
    FROM (SELECT vec_id, embedding::DOUBLE[] AS dvec FROM embeddings) v
    CROSS JOIN cent c) WHERE rn = 1
)
SELECT e.vec_id, {cos_e} AS cosine
FROM embeddings e
JOIN assign a ON a.vec_id = e.vec_id
WHERE a.centroid_id IN (SELECT centroid_id FROM probes)
ORDER BY cosine DESC, e.vec_id ASC LIMIT 10
"""


def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k over the embeddings table (the ANN baseline).
    All arithmetic in double, sequential left-fold, so the oracle matches."""
    emb = _t(spark, sf_dir, "embeddings")
    qlit = "array(" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in _QUERY_VEC) + ")"
    dot = (
        f"aggregate(zip_with(CAST(embedding AS ARRAY<DOUBLE>), {qlit}, "
        "(x, y) -> x * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    norm = (
        "sqrt(aggregate(transform(CAST(embedding AS ARRAY<DOUBLE>), x -> x * x), "
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v))"
    )
    qnorm = math.sqrt(sum(v * v for v in _QUERY_VEC))
    return (
        emb.select(
            "vec_id",
            "label",
            F.round(F.expr(dot) / (F.expr(norm) * F.lit(qnorm)), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )


def _sql_similarity_topk() -> str:
    qlit = "[" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in _QUERY_VEC) + "]"
    qnorm = math.sqrt(sum(v * v for v in _QUERY_VEC))
    return f"""
SELECT vec_id, label,
       ROUND(
         list_sum(list_transform(list_zip(embedding::DOUBLE[], {qlit}),
                                 p -> p[1] * p[2]))
         / (sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))
            * {qnorm!r}), 6) AS cosine
FROM embeddings
ORDER BY cosine DESC, vec_id ASC LIMIT 10
"""


def q_suggest_typeahead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: typeahead suggestions — phrase-prefix filter then top-10 terms."""
    from harmonize_search_analyze_spark.operators.aggregations import suggest

    return suggest(_t(spark, sf_dir, "part"), "p_type", prefix="promo", k=10)


def _sql_suggest_typeahead() -> str:
    pattern = phrase_prefix_regex("promo")
    return f"""
SELECT p_type, COUNT(*) AS doc_count FROM part
WHERE regexp_matches(LOWER(p_type), '{pattern}') AND p_type IS NOT NULL
GROUP BY p_type ORDER BY doc_count DESC, p_type ASC LIMIT 10
"""


def q_terms_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 'DatasetTable' viz: two-field terms table, size 20."""
    from harmonize_search_analyze_spark.operators.aggregations import terms_multi

    return terms_multi(
        _t(spark, sf_dir, "lineitem"), ["l_returnflag", "l_linestatus"], k=20
    )


SQL_TERMS_TABLE = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS doc_count FROM lineitem
WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL
GROUP BY 1, 2 ORDER BY doc_count DESC, l_returnflag ASC, l_linestatus ASC
LIMIT 20
"""


def q_count_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: the count metric under a compiled search predicate."""
    from harmonize_search_analyze_spark.operators.aggregations import count_metric

    ast = {"bool": {"must": [
        {"terms": {"o_orderstatus": ["F", "P"]}},
        {"range": {"o_totalprice": {"gte": 50000}}},
    ]}}
    return count_metric(_t(spark, sf_dir, "orders"), compile_query(ast))


SQL_COUNT_PANEL = """
SELECT COUNT(*) AS doc_count FROM orders
WHERE o_orderstatus IN ('F', 'P') AND o_totalprice >= 50000
"""


def q_describe_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: describe-style stats (count/mean/sample-stddev/min/max) for two
    numeric columns in one pass."""
    df = _t(spark, sf_dir, "lineitem")
    out = []
    for c in ("l_quantity", "l_extendedprice"):
        out.extend([
            F.count(F.col(c)).alias(f"{c}_count"),
            F.round(F.avg(c), 6).alias(f"{c}_mean"),
            F.round(F.stddev_samp(c), 6).alias(f"{c}_stddev"),
            F.min(c).alias(f"{c}_min"),
            F.max(c).alias(f"{c}_max"),
        ])
    return df.agg(*out)


SQL_DESCRIBE_STATS = """
SELECT COUNT(l_quantity) AS l_quantity_count,
       ROUND(AVG(l_quantity), 6) AS l_quantity_mean,
       ROUND(STDDEV_SAMP(l_quantity), 6) AS l_quantity_stddev,
       MIN(l_quantity) AS l_quantity_min,
       MAX(l_quantity) AS l_quantity_max,
       COUNT(l_extendedprice) AS l_extendedprice_count,
       ROUND(AVG(l_extendedprice), 6) AS l_extendedprice_mean,
       ROUND(STDDEV_SAMP(l_extendedprice), 6) AS l_extendedprice_stddev,
       MIN(l_extendedprice) AS l_extendedprice_min,
       MAX(l_extendedprice) AS l_extendedprice_max
FROM lineitem
"""


def q_enum_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: the enum builder — distinct non-empty values, sorted."""
    df = _t(spark, sf_dir, "part")
    return (
        df.select("p_brand").distinct()
        .where((F.col("p_brand") != "") & F.col("p_brand").isNotNull())
        .orderBy("p_brand")
    )


SQL_ENUM_VALUES = """
SELECT DISTINCT p_brand FROM part
WHERE p_brand != '' AND p_brand IS NOT NULL ORDER BY p_brand
"""


def q_vartype_guess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: the stats-driven widget-type inference CASE over lineitem."""
    from harmonize_search_analyze_spark.operators.profiler import guess_vartypes

    df = _t(spark, sf_dir, "lineitem")
    return guess_vartypes(df, _LINEITEM_NUMERIC + ["l_returnflag", "l_linestatus"])


def q_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming <= 12 over the 64-bit sketch) on
    the 1-in-20 doc sample plus its planted one-token twins (same
    construction as simhash_banded — guarantees true near-dup pairs at
    every SF; the sample keeps the brute pair join's cost flat)."""
    from harmonize_search_analyze_spark.operators.dedup import (
        simhash_near_dup_pairs,
    )

    base = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 20 == 0)
    twins = base.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
    )
    docs = base.select("doc_id", "text").unionByName(twins)
    return simhash_near_dup_pairs(docs, "doc_id", "text", max_hamming=12).orderBy(
        "id1", "id2"
    )


def _sql_simhash_hamming() -> str:
    from harmonize_search_analyze_spark.operators.dedup import (
        hamming_sql,
        simhash_select_sql,
    )

    sigs = simhash_select_sql(
        "(SELECT doc_id, text FROM documents WHERE doc_id % 20 = 0 "
        "UNION ALL SELECT doc_id + 100000, text || ' zz' "
        "FROM documents WHERE doc_id % 20 = 0)",
        "doc_id", "text", "duckdb",
    )
    ham = hamming_sql("a.simhash", "b.simhash", "duckdb")
    return f"""
WITH sigs AS ({sigs})
SELECT id1, id2, hamming FROM (
  SELECT a.doc_id AS id1, b.doc_id AS id2, CAST({ham} AS INT) AS hamming
  FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
) WHERE hamming <= 12 ORDER BY id1, id2
"""


def q_kmeans_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd-trained IVF index build (iterative — rows-only gate): 8
    centroids, 3 iterations, then cluster sizes. Assignment is broadcast +
    map-only every iteration; only the KB-sized centroid matrix touches
    the driver."""
    from harmonize_search_analyze_spark.operators.similarity import (
        assign_centroids,
        kmeans_train,
    )

    emb = _t(spark, sf_dir, "embeddings")
    centroids = kmeans_train(emb, n_centroids=8, n_iters=3)
    return (
        assign_centroids(emb, centroids)
        .groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("n_assigned"))
        .orderBy("centroid_id")
    )


def q_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd assignment step with PINNED centroids (the embeddings with
    vec_id < 8): the exact map-only Arrow argmin stage that kmeans_train /
    the IVF build iterate on, made SQL-expressible — the driver-hashable
    oracle twin of the iterative ``kmeans_ivf`` trainer (whose centroid
    loop has no SQL expression). Same round-6 argmin + lowest-id ties as
    the trainer; d2 reported at 3 decimals for cross-engine fp headroom."""
    from harmonize_search_analyze_spark.operators.similarity import (
        assign_centroids,
    )

    emb = _t(spark, sf_dir, "embeddings")
    cents = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("centroid_id"),
        F.col("embedding").cast("array<double>").alias("cvec"),
    )
    return (
        assign_centroids(emb, cents)
        .select("vec_id", "centroid_id", F.round("d2", 3).alias("d2_r"))
        .orderBy("vec_id")
    )


SQL_KMEANS_ASSIGN = """
WITH c AS (
  SELECT CAST(vec_id AS INT) AS centroid_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec
  FROM embeddings WHERE vec_id < 8
), x AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dvec
  FROM embeddings
), d AS (
  SELECT x.vec_id, c.centroid_id,
         ROUND(GREATEST(
           list_inner_product(dvec, dvec) + list_inner_product(cvec, cvec)
           - 2 * list_inner_product(dvec, cvec), 0.0), 6) AS d2
  FROM x CROSS JOIN c
), best AS (
  SELECT vec_id, centroid_id, d2,
         ROW_NUMBER() OVER (
           PARTITION BY vec_id ORDER BY d2 ASC, centroid_id ASC) AS rn
  FROM d
)
SELECT vec_id, centroid_id, ROUND(d2, 3) AS d2_r
FROM best WHERE rn = 1 ORDER BY vec_id
"""


def q_field_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _field_caps over three registered indices: the per-(field,
    type) capability rows Kibana builds index patterns from — pure
    schema metadata, no data scanned. The library method returns the
    indices as ARRAY<STRING>; the gated query comma-joins them so the
    driver canonicalizer can hash the column (the geo_line lesson)."""
    from harmonize_search_analyze_spark.sources.catalog import Catalog

    cat = Catalog(spark)
    for t in ("events", "orders", "customer"):
        cat.register(t, _t(spark, sf_dir, t))
    return (
        cat.field_caps("*")
        .withColumn("indices", F.array_join("indices", ","))
        .orderBy("field", "type")
    )


SQL_FIELD_CAPS = """
WITH cols AS (
  SELECT 'events' AS idx, column_name AS field, column_type AS t
  FROM (DESCRIBE events)
  UNION ALL
  SELECT 'orders', column_name, column_type FROM (DESCRIBE orders)
  UNION ALL
  SELECT 'customer', column_name, column_type FROM (DESCRIBE customer)
), mapped AS (
  SELECT field,
         CASE WHEN t LIKE 'TIMESTAMP%' THEN 'timestamp'
              WHEN t = 'DATE' THEN 'date'
              WHEN t = 'BIGINT' THEN 'bigint'
              WHEN t = 'INTEGER' THEN 'int'
              WHEN t = 'SMALLINT' THEN 'smallint'
              WHEN t = 'DOUBLE' THEN 'double'
              WHEN t IN ('FLOAT', 'REAL') THEN 'float'
              WHEN t = 'BOOLEAN' THEN 'boolean'
              WHEN t = 'VARCHAR' THEN 'string'
              ELSE lower(t) END AS type,
         idx
  FROM cols
)
SELECT field, type,
       string_agg(idx, ',' ORDER BY idx) AS indices,
       TRUE AS searchable, TRUE AS aggregatable,
       (COUNT(*) OVER (PARTITION BY field)) > 1 AS is_conflict
FROM mapped GROUP BY field, type ORDER BY field, type
"""


def q_cluster_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-capped sampling over the embedding space: at most 20
    vectors per pinned k-means cluster (the kmeans_assign centroids),
    hash-ordered — dense semantic regions stop dominating the sample.
    One Arrow argmin + one bounded window, no pair generation."""
    from harmonize_search_analyze_spark.operators.similarity import (
        cluster_balanced_sample,
    )

    emb = _t(spark, sf_dir, "embeddings")
    cents = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("centroid_id"),
        F.col("embedding").cast("array<double>").alias("cvec"),
    )
    return cluster_balanced_sample(emb, cents, 20).orderBy("vec_id")


def _sql_cluster_cap_sample() -> str:
    from harmonize_search_analyze_spark.functions.hashing import hash64_sql

    gate = hash64_sql("('42:cbs:' || CAST(vec_id AS STRING))", "duckdb")
    return f"""
WITH c AS (
  SELECT CAST(vec_id AS INT) AS centroid_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec
  FROM embeddings WHERE vec_id < 8
), x AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dvec
  FROM embeddings
), d AS (
  SELECT x.vec_id, c.centroid_id,
         ROUND(GREATEST(
           list_inner_product(dvec, dvec) + list_inner_product(cvec, cvec)
           - 2 * list_inner_product(dvec, cvec), 0.0), 6) AS d2
  FROM x CROSS JOIN c
), best AS (
  SELECT vec_id, centroid_id,
         ROW_NUMBER() OVER (
           PARTITION BY vec_id ORDER BY d2 ASC, centroid_id ASC) AS rn
  FROM d
), capped AS (
  SELECT vec_id, centroid_id,
         ROW_NUMBER() OVER (
           PARTITION BY centroid_id
           ORDER BY {gate}, vec_id) AS crn
  FROM best WHERE rn = 1
)
SELECT vec_id, centroid_id FROM capped WHERE crn <= 20 ORDER BY vec_id
"""


def q_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style normalization pass: URL/email strip + whitespace collapse;
    returns a digest + length per doc (map-only, scan-bound)."""
    from harmonize_search_analyze_spark.operators.curation import (
        clean_text_sql,
    )

    docs = _t(spark, sf_dir, "documents")
    clean = clean_text_sql("text", "spark")
    return docs.select(
        "doc_id",
        F.expr(f"md5({clean})").alias("clean_md5"),
        F.expr(f"length({clean})").cast("bigint").alias("clean_len"),
    ).orderBy("doc_id")


def _sql_corpus_clean() -> str:
    from harmonize_search_analyze_spark.operators.curation import (
        clean_text_sql,
    )

    clean = clean_text_sql("text", "duckdb")
    return f"""
SELECT doc_id, md5({clean}) AS clean_md5,
       CAST(length({clean}) AS BIGINT) AS clean_len
FROM documents ORDER BY doc_id
"""


def q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition profile (dup-token fraction, top-token
    share) — two map-combinable hash aggs, no windows."""
    from harmonize_search_analyze_spark.operators.curation import (
        repetition_signals,
    )

    docs = _t(spark, sf_dir, "documents")
    return repetition_signals(docs, "doc_id", "text").orderBy("doc_id")


def _sql_repetition_signals() -> str:
    from harmonize_search_analyze_spark.operators.curation import (
        repetition_signals_sql,
    )

    inner = repetition_signals_sql("documents", "doc_id", "text")
    return f"SELECT * FROM ({inner}) r ORDER BY doc_id"


def q_similarity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch exact top-5 similarity join: every 50th vector as a query set
    against the full corpus — broadcast queries, ONE corpus scan, rank
    window carries scores only (never vectors)."""
    from harmonize_search_analyze_spark.operators.similarity import (
        similarity_join,
    )

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity_join(emb, queries, k=5).orderBy("query_id", "rank")


def _sql_similarity_join() -> str:
    from harmonize_search_analyze_spark.operators.similarity import (
        similarity_join_sql,
    )

    inner = similarity_join_sql(
        "embeddings",
        "(SELECT vec_id AS query_id, embedding FROM embeddings "
        "WHERE vec_id % 50 = 0)",
        5,
    )
    return f"SELECT * FROM ({inner}) s ORDER BY query_id, rank"


def q_pack_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (training-data step after curation): greedy
    first-fit-contiguous bins of 4000 chars, sharded 8 ways by portable
    hash — parallel across shards, sequential only inside one Arrow batch.
    The DuckDB oracle replays the identical greedy via recursive CTE, so
    the applyInPandas loop itself is hash-verified."""
    from harmonize_search_analyze_spark.operators.packing import (
        pack_documents,
    )

    docs = _t(spark, sf_dir, "documents")
    return pack_documents(
        docs, "doc_id", "n_chars", 4000, n_shards=8
    ).orderBy("doc_id")


def _sql_pack_documents() -> str:
    from harmonize_search_analyze_spark.operators.packing import (
        pack_documents_sql,
    )

    inner = pack_documents_sql("documents", "doc_id", "n_chars", 4000,
                               n_shards=8)
    return f"SELECT * FROM ({inner}) p ORDER BY doc_id"


def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~20% corpus sample (ES random_sampler / reproducible
    training-data subsample): portable-hash threshold on doc_id — map-only,
    no shuffle, same rows on any engine or partitioning."""
    from harmonize_search_analyze_spark.operators.sampling import hash_sample

    docs = _t(spark, sf_dir, "documents")
    return hash_sample(docs, "doc_id", 0.2).select(
        "doc_id", "lang", "n_chars"
    ).orderBy("doc_id")


def _sql_hash_sample() -> str:
    from harmonize_search_analyze_spark.operators.sampling import (
        HASH_BUCKETS,
        sample_hash_sql,
    )

    h = sample_hash_sql("doc_id", "duckdb", seed=42)
    return f"""
SELECT doc_id, lang, n_chars FROM documents
WHERE {h} < {int(0.2 * HASH_BUCKETS)} ORDER BY doc_id
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES diversified_sampler / per-stratum curation cap: at most 15 docs
    per (lang, source) chosen by deterministic hash order."""
    from harmonize_search_analyze_spark.operators.sampling import (
        stratified_sample,
    )

    docs = _t(spark, sf_dir, "documents")
    return stratified_sample(
        docs, ["lang", "source"], 15, "doc_id"
    ).select("lang", "source", "doc_id").orderBy("lang", "source", "doc_id")


def _sql_stratified_sample() -> str:
    from harmonize_search_analyze_spark.operators.sampling import (
        stratified_sample_sql,
    )

    inner = stratified_sample_sql(
        "documents", ["lang", "source"], 15, "doc_id",
        ["lang", "source", "doc_id"], "duckdb",
    )
    return f"SELECT * FROM ({inner}) s ORDER BY lang, source, doc_id"


def q_pipeline_serial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES pipeline-agg composition: daily date_histogram -> serial_diff
    (lag 7, week-over-week) -> bucket_selector (positive deltas only) ->
    bucket_sort (top 5 by delta desc, bucket asc tie-break). Bucket-level
    windows throughout — never touches raw rows after the first agg."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        bucket_selector,
        bucket_sort,
        date_histogram,
        serial_diff,
    )

    daily = date_histogram(_t(spark, sf_dir, "events"), "ts", "1 day")
    sd = serial_diff(daily, "bucket", "doc_count", lag=7)
    kept = bucket_selector(sd, F.col("serial_diff") > 0)
    return bucket_sort(
        kept, [F.desc("serial_diff"), F.asc("bucket")], size=5
    )


SQL_PIPELINE_SERIAL = """
WITH b AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
         COUNT(*) AS doc_count
  FROM events WHERE ts IS NOT NULL GROUP BY 1
), sd AS (
  SELECT bucket, doc_count,
         doc_count - LAG(doc_count, 7) OVER (ORDER BY bucket) AS serial_diff
  FROM b
)
SELECT bucket, doc_count, serial_diff FROM sd
WHERE serial_diff > 0
ORDER BY serial_diff DESC, bucket ASC LIMIT 5
"""


def q_auto_date_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES auto_date_histogram: interval chosen from the data's span (ES
    ladder, <= 10 buckets target) entirely inside the plan — bounds agg
    cross-joined as a 1-row frame, then one hash agg."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        auto_date_histogram,
    )

    return auto_date_histogram(_t(spark, sf_dir, "events"), "ts", 10)


def _sql_auto_date_histogram() -> str:
    from harmonize_search_analyze_spark.operators.aggregations import (
        auto_date_histogram_sql,
    )

    return auto_date_histogram_sql("events", "ts", 10, "duckdb")


def q_datemath_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 end-to-end: global time filter written in ES date math — the
    reference's literal config shape (config.js:31-32 `from:"now-20y"`).
    Anchored to a fixed `now` so the oracle is static: gte rounds down to
    start-of-day, lte rounds up to end-of-day (ES range semantics)."""
    import datetime as dt

    from harmonize_search_analyze_spark.operators.aggregations import dashboard

    ev = _t(spark, sf_dir, "events")
    ast = {"bool": {"must": [
        {"range": {"ts": {"gte": "now-7d/d", "lte": "now/d"}}},
    ]}}
    now = dt.datetime(2024, 1, 20, 12, 34, 56)
    pred = compile_query(ast, now=now)
    panels = {
        "by_type": lambda d: (
            d.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("doc_count"),
                F.round(F.sum("value"), 6).alias("sum_value"),
            )
            .orderBy("event_type")
        ),
    }
    out = dashboard(ev, panels, query=pred, cache=False)
    return out["by_type"]


SQL_DATEMATH_WINDOW = """
SELECT event_type, COUNT(*) AS doc_count,
       ROUND(SUM(value), 6) AS sum_value
FROM events
WHERE ts >= TIMESTAMP '2024-01-13 00:00:00'
  AND ts <= TIMESTAMP '2024-01-20 23:59:59.999'
GROUP BY event_type ORDER BY event_type
"""


def q_simhash_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production SimHash near-dup path: pigeonhole banding (d+1 contiguous
    bit-bands, band-key self-equi-join) + Hamming verify on candidates only.
    Oracle is the brute O(n^2) formulation at the same threshold — banding
    is exact, so the outputs must hash-match."""
    from harmonize_search_analyze_spark.operators.dedup import (
        simhash_near_dup_pairs_banded,
    )

    base = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 10 == 0)
    # the synthetic corpus has no natural dups at small SF — plant
    # deterministic near-dup twins (one appended token) so the gate
    # verifies nonzero pairs, not an empty set
    twins = base.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
    )
    docs = base.select("doc_id", "text").unionByName(twins)
    return simhash_near_dup_pairs_banded(
        docs, "doc_id", "text", max_hamming=6
    ).orderBy("id1", "id2")


def _sql_simhash_banded() -> str:
    from harmonize_search_analyze_spark.operators.dedup import (
        hamming_sql,
        simhash_select_sql,
    )

    sigs = simhash_select_sql(
        "(SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0 "
        "UNION ALL SELECT doc_id + 100000, text || ' zz' "
        "FROM documents WHERE doc_id % 10 = 0)",
        "doc_id", "text", "duckdb",
    )
    ham = hamming_sql("a.simhash", "b.simhash", "duckdb")
    return f"""
WITH sigs AS ({sigs})
SELECT id1, id2, hamming FROM (
  SELECT a.doc_id AS id1, b.doc_id AS id2, CAST({ham} AS INT) AS hamming
  FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
) WHERE hamming <= 6 ORDER BY id1, id2
"""


def q_jaccard_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard brute-force near-dup pairs (the LSH oracle path) on
    the 1-in-20 doc sample, 3-gram shingles, threshold 0.8 (the sample
    keeps the brute O(n^2) oracle's pair count flat after the planted
    twins doubled the corpus)."""
    from harmonize_search_analyze_spark.operators.dedup import (
        near_dup_pairs_brute,
    )

    base = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 20 == 0)
    twins = base.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
    )
    docs = base.select("doc_id", "text").unionByName(twins)
    return near_dup_pairs_brute(
        docs, "doc_id", "text", threshold=0.8, n=3
    ).orderBy("id1", "id2")


def _sql_jaccard_brute() -> str:
    from harmonize_search_analyze_spark.operators.dedup import (
        jaccard_sql,
        shingles_sql,
    )

    sh = shingles_sql("text", "duckdb", 3)
    j = jaccard_sql("a.shingles", "b.shingles", "duckdb")
    return f"""
WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id % 20 = 0
              UNION ALL
              SELECT doc_id + 100000, text || ' zz'
              FROM documents WHERE doc_id % 20 = 0),
sh AS (SELECT doc_id, {sh} AS shingles FROM docs)
SELECT id1, id2, jaccard FROM (
  SELECT a.doc_id AS id1, b.doc_id AS id2, {j} AS jaccard
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
) WHERE jaccard >= 0.8 ORDER BY id1, id2
"""


def q_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH (random hyperplane) embedding near-dup — the bucketed scale
    path; oracle'd exactly (identical deterministic hyperplanes)."""
    from harmonize_search_analyze_spark.operators.similarity import (
        embedding_near_dup_lsh,
    )

    emb = _t(spark, sf_dir, "embeddings")
    return embedding_near_dup_lsh(emb, threshold=0.35).orderBy("id1", "id2")


def _sql_embedding_lsh() -> str:
    from harmonize_search_analyze_spark.operators.similarity import (
        embedding_lsh_oracle_sql,
    )

    return embedding_lsh_oracle_sql(threshold=0.35)


def q_terms_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase salted terms agg over a deliberately hot key
    (l_linestatus has ~2 values) — identical result to the plain terms agg,
    reducer load bounded by 1/salt."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        terms_salted,
    )

    return terms_salted(_t(spark, sf_dir, "lineitem"), "l_linestatus", k=10)


SQL_TERMS_SALTED = """
SELECT l_linestatus, COUNT(*) AS doc_count FROM lineitem
WHERE l_linestatus IS NOT NULL
GROUP BY l_linestatus ORDER BY doc_count DESC, l_linestatus ASC LIMIT 10
"""


def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (batch twin of the streaming operator):
    1-hour gap sessions over the events table."""
    from harmonize_search_analyze_spark.streaming.windows import sessionize_batch

    ev = _t(spark, sf_dir, "events")
    return sessionize_batch(ev, gap_seconds=3600).orderBy(
        "user_id", "session_start"
    )


SQL_SESSIONIZATION = """
WITH g AS (
  SELECT user_id, ts, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w >= INTERVAL 3600 SECOND
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM g
)
SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events,
       ROUND(SUM(COALESCE(value, 0)), 6) AS sum_value
FROM s GROUP BY user_id, sid ORDER BY user_id, session_start
"""


def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric histogram agg (ES histogram): o_totalprice in 25k-wide bins."""
    from harmonize_search_analyze_spark.operators.aggregations import histogram

    return histogram(_t(spark, sf_dir, "orders"), "o_totalprice", 25000.0)


SQL_HISTOGRAM = """
SELECT CAST(FLOOR(o_totalprice / 25000.0) * 25000.0 AS DOUBLE) AS bin,
       COUNT(*) AS doc_count
FROM orders WHERE o_totalprice IS NOT NULL
GROUP BY 1 ORDER BY bin
"""


def q_date_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-histogram agg (ES date_histogram): daily event counts."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        date_histogram,
    )

    return date_histogram(_t(spark, sf_dir, "events"), "ts", "1 day")


SQL_DATE_HISTOGRAM = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket, COUNT(*) AS doc_count
FROM events WHERE ts IS NOT NULL GROUP BY 1 ORDER BY 1
"""


def q_extended_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES extended_stats metric agg: per-returnflag stats of l_quantity
    (integer-valued -> double sums stay exact, no float-order drift)."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        extended_stats,
    )

    return extended_stats(
        _t(spark, sf_dir, "lineitem"), "l_quantity", by="l_returnflag"
    )


SQL_EXTENDED_STATS = """
SELECT l_returnflag,
       COUNT(l_quantity) AS count,
       MIN(l_quantity) AS min,
       MAX(l_quantity) AS max,
       ROUND(SUM(l_quantity), 6) AS sum,
       ROUND(AVG(l_quantity), 6) AS avg,
       ROUND(VAR_POP(l_quantity), 6) AS variance,
       ROUND(STDDEV_POP(l_quantity), 6) AS std_deviation
FROM lineitem WHERE l_quantity IS NOT NULL
GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES percentiles metric agg, exact interpolated quantiles of
    l_extendedprice per returnflag (= ANSI percentile_cont)."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        percentiles,
    )

    return percentiles(
        _t(spark, sf_dir, "lineitem"), "l_extendedprice", by="l_returnflag"
    )


SQL_PERCENTILES = """
SELECT l_returnflag,
       ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
       ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
       ROUND(quantile_cont(l_extendedprice, 0.75), 6) AS p75,
       ROUND(quantile_cont(l_extendedprice, 0.95), 6) AS p95
FROM lineitem WHERE l_extendedprice IS NOT NULL
GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q_top_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES top_hits sub-agg: top-3 orders by totalprice inside each
    orderpriority bucket (ties by orderkey ASC, pinned)."""
    from harmonize_search_analyze_spark.operators.aggregations import top_hits

    out = top_hits(
        _t(spark, sf_dir, "orders"),
        by="o_orderpriority",
        sort_field="o_totalprice",
        id_field="o_orderkey",
        k=3,
    )
    return out.withColumn("hit_rank", F.col("hit_rank").cast("int"))


SQL_TOP_HITS = """
SELECT o_orderpriority, CAST(hit_rank AS INTEGER) AS hit_rank,
       o_orderkey, o_totalprice
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey ASC)
           AS hit_rank
  FROM orders WHERE o_totalprice IS NOT NULL
) WHERE hit_rank <= 3
ORDER BY o_orderpriority, hit_rank
"""


def q_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES cardinality agg (exact mode for the oracle gate; the 100 TB path
    is exact=False -> HyperLogLog approx_count_distinct, same as ES)."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        cardinality,
    )

    return cardinality(
        _t(spark, sf_dir, "events"), by="event_type", of="user_id"
    )


SQL_CARDINALITY = """
SELECT event_type, COUNT(DISTINCT user_id) AS cardinality
FROM events WHERE user_id IS NOT NULL
GROUP BY event_type ORDER BY event_type
"""


def q_significant_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES significant_terms (JLH score): event types over-represented among
    high-value events (value > 250) vs the whole events table."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        significant_terms,
    )

    return significant_terms(
        _t(spark, sf_dir, "events"),
        "event_type",
        foreground=F.col("value") > 250,
    )


SQL_SIGNIFICANT_TERMS = """
WITH t AS (
  SELECT event_type, COUNT(*) AS bg_count,
         COUNT(CASE WHEN value > 250 THEN 1 END) AS fg_count
  FROM events WHERE event_type IS NOT NULL GROUP BY event_type
), tot AS (
  SELECT SUM(bg_count) AS bg_total, SUM(fg_count) AS fg_total FROM t
)
SELECT event_type, fg_count, bg_count,
       ROUND((CAST(fg_count AS DOUBLE) / fg_total
              - CAST(bg_count AS DOUBLE) / bg_total)
             * ((CAST(fg_count AS DOUBLE) / fg_total)
                / (CAST(bg_count AS DOUBLE) / bg_total)), 6) AS score
FROM t, tot WHERE fg_count > 0
ORDER BY score DESC, event_type LIMIT 10
"""


def q_significant_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """significant_terms under the chi_square heuristic (Lucene's signed
    2x2 statistic, superset-adjusted): same one-agg + broadcast-totals
    plan as the JLH query, different pure-arithmetic score."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        significant_terms,
    )

    return significant_terms(
        _t(spark, sf_dir, "events"),
        "event_type",
        foreground=F.col("value") > 250,
        heuristic="chi_square",
    )


SQL_SIGNIFICANT_CHI2 = """
WITH t AS (
  SELECT event_type, COUNT(*) AS bg_count,
         COUNT(CASE WHEN value > 250 THEN 1 END) AS fg_count
  FROM events WHERE event_type IS NOT NULL GROUP BY event_type
), tot AS (
  SELECT SUM(bg_count) AS bg_total, SUM(fg_count) AS fg_total FROM t
), c AS (
  SELECT event_type, fg_count, bg_count,
         CAST(fg_count AS DOUBLE) AS n11,
         CAST(bg_count - fg_count AS DOUBLE) AS n01,
         CAST(fg_total - fg_count AS DOUBLE) AS n10,
         CAST(bg_total - bg_count - (fg_total - fg_count) AS DOUBLE) AS n00,
         CAST(bg_total AS DOUBLE) AS n
  FROM t, tot
)
SELECT event_type, fg_count, bg_count,
       ROUND(
         (CASE WHEN n11 * (n01 + n00) < n01 * (n11 + n10)
               THEN -1.0 ELSE 1.0 END)
         * CASE WHEN (n11 + n01) * (n11 + n10) * (n10 + n00) * (n01 + n00)
                     <> 0.0
                THEN n * (n11 * n00 - n01 * n10) * (n11 * n00 - n01 * n10)
                     / ((n11 + n01) * (n11 + n10) * (n10 + n00)
                        * (n01 + n00))
           END, 6) AS score
FROM c WHERE fg_count > 0
ORDER BY score DESC, event_type LIMIT 10
"""


def q_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/joins.py): attribute every purchase event to
    the same user's latest click at-or-before it — single key-shuffle
    union+window plan, no range join. Purchases with no prior click keep
    NULL attribution (left-outer)."""
    from harmonize_search_analyze_spark.operators.joins import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_time="ts",
        right_time="ts",
        payload=["event_id"],
        tie_break="event_id",
    )
    return out.withColumnRenamed("ts_right", "click_ts").withColumnRenamed(
        "event_id_right", "click_id"
    ).orderBy("event_id")


SQL_ASOF_ATTRIBUTION = """
WITH clicks AS (
  SELECT user_id, ts AS click_ts, event_id AS click_id
  FROM (
    SELECT user_id, ts, event_id,
           ROW_NUMBER() OVER (PARTITION BY user_id, ts
                              ORDER BY event_id DESC) AS rn
    FROM events WHERE event_type = 'click' AND ts IS NOT NULL
  ) WHERE rn = 1
), purchases AS (
  SELECT event_id, user_id, ts, value FROM events
  WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.ts, p.value, c.click_ts, c.click_id
FROM purchases p
ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.click_ts
ORDER BY p.event_id
"""


def q_range_join_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned range join (operators/joins.py::interval_join): orders placed
    by the same customer within 30 days after an earlier order — equi-join
    on (custkey, 30d-grain bucket) with exact containment re-check, never a
    per-key cartesian."""
    from harmonize_search_analyze_spark.operators.joins import interval_join

    orders = _t(spark, sf_dir, "orders")
    points = orders.select(
        "o_custkey",
        F.col("o_orderkey").alias("repeat_orderkey"),
        F.col("o_orderdate").alias("repeat_date"),
    )
    intervals = orders.select(
        "o_custkey",
        F.col("o_orderkey").alias("first_orderkey"),
        F.col("o_orderdate").alias("win_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("win_end"),
    )
    out = interval_join(
        points,
        intervals,
        on="o_custkey",
        point_time="repeat_date",
        start="win_start",
        end="win_end",
        grain_seconds=30 * 86400,
    )
    return (
        out.where(F.col("repeat_orderkey") != F.col("first_orderkey"))
        .select("o_custkey", "first_orderkey", "repeat_orderkey")
        .orderBy("o_custkey", "first_orderkey", "repeat_orderkey")
    )


SQL_RANGE_JOIN_REPEAT = """
SELECT a.o_custkey, a.o_orderkey AS first_orderkey,
       b.o_orderkey AS repeat_orderkey
FROM orders a JOIN orders b
  ON a.o_custkey = b.o_custkey
 AND b.o_orderdate >= a.o_orderdate
 AND b.o_orderdate <= a.o_orderdate + INTERVAL 30 DAY
 AND a.o_orderkey <> b.o_orderkey
ORDER BY a.o_custkey, first_orderkey, repeat_orderkey
"""


def q_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity rollup (continuous-aggregate
    shape): event counts + value sums at (event_type, day), (event_type),
    and grand-total levels in ONE pass via ROLLUP grouping sets — partial
    aggregation happens once, Expand fans the finished partials out to the
    three levels."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.where(F.col("ts").isNotNull())
        .select(
            "event_type",
            F.date_trunc("day", "ts").alias("day"),
            "value",
        )
        .rollup("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("value_sum"),
        )
        .orderBy(
            F.asc_nulls_first("event_type"), F.asc_nulls_first("day")
        )
    )


SQL_HYPERTABLE_ROLLUP = """
SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       COUNT(*) AS n, ROUND(SUM(value), 4) AS value_sum
FROM events WHERE ts IS NOT NULL
GROUP BY ROLLUP (event_type, day)
ORDER BY event_type ASC NULLS FIRST, day ASC NULLS FIRST
"""


def q_range_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES range bucket agg: order totalprice in three half-open [from, to)
    buckets (one-pass conditional counts; buckets may overlap)."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        range_agg,
    )

    return range_agg(
        _t(spark, sf_dir, "orders"),
        "o_totalprice",
        [(None, 50000.0), (50000.0, 150000.0), (150000.0, None)],
    )


SQL_RANGE_AGG = """
SELECT '*-50000.0' AS range_key,
       COUNT(CASE WHEN o_totalprice IS NOT NULL
                   AND o_totalprice < 50000.0 THEN 1 END) AS doc_count
FROM orders
UNION ALL
SELECT '50000.0-150000.0',
       COUNT(CASE WHEN o_totalprice >= 50000.0
                   AND o_totalprice < 150000.0 THEN 1 END)
FROM orders
UNION ALL
SELECT '150000.0-*',
       COUNT(CASE WHEN o_totalprice >= 150000.0 THEN 1 END)
FROM orders
"""


def q_filters_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES filters bucket agg: three named KPI predicates over events counted
    in one scan."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        filters_agg,
    )

    ev = _t(spark, sf_dir, "events")
    return filters_agg(
        ev,
        {
            "high_value": F.col("value") > 250,
            "purchase": F.col("event_type") == "purchase",
            "weekend": F.date_format("ts", "EEEE").isin("Saturday", "Sunday"),
        },
    )


SQL_FILTERS_AGG = """
SELECT 'high_value' AS filter_key,
       COUNT(CASE WHEN value > 250 THEN 1 END) AS doc_count FROM events
UNION ALL
SELECT 'purchase',
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) FROM events
UNION ALL
SELECT 'weekend',
       COUNT(CASE WHEN dayname(ts) IN ('Saturday', 'Sunday') THEN 1 END)
FROM events
"""


def q_missing_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES missing agg over JSON-extracted props keys: '$.k' exists on every
    event (0 missing), '$.m' on none (all missing) — proves null detection
    through the semi-structured path."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        _conditional_buckets,
    )

    ev = _t(spark, sf_dir, "events", spread=True).select(
        F.get_json_object("props", "$.k").alias("k"),
        F.get_json_object("props", "$.m").alias("m"),
    )
    return _conditional_buckets(
        ev,
        [
            ("props.k", F.col("k").isNull()),
            ("props.m", F.col("m").isNull()),
        ],
        "field",
    )


SQL_MISSING_AGG = """
SELECT 'props.k' AS field,
       COUNT(CASE WHEN json_extract_string(props, '$.k') IS NULL THEN 1 END)
         AS doc_count
FROM events
UNION ALL
SELECT 'props.m',
       COUNT(CASE WHEN json_extract_string(props, '$.m') IS NULL THEN 1 END)
FROM events
"""


def q_pipeline_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES pipeline aggs (cumulative_sum / derivative / moving_fn avg) over
    the daily date_histogram — the bucket-level window costs one small sort,
    never touching raw rows."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        bucket_pipeline,
        date_histogram,
    )

    daily = date_histogram(_t(spark, sf_dir, "events"), "ts", "1 day")
    return bucket_pipeline(daily, "bucket", "doc_count", moving_window=7)


SQL_PIPELINE_DAILY = """
WITH b AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
         COUNT(*) AS doc_count
  FROM events WHERE ts IS NOT NULL GROUP BY 1
)
SELECT bucket, doc_count,
       CAST(SUM(doc_count) OVER (ORDER BY bucket
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative_sum,
       doc_count - LAG(doc_count, 1) OVER (ORDER BY bucket) AS derivative,
       ROUND(AVG(doc_count) OVER (ORDER BY bucket
            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS moving_avg
FROM b ORDER BY bucket
"""


def q_composite_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES composite agg, second page: multi-field buckets resumed after the
    ('2-HIGH','F') key — the after-key tuple inequality rides below the
    top-k, so a page never materializes the full bucket set."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        composite_agg,
    )

    return composite_agg(
        _t(spark, sf_dir, "orders"),
        ["o_orderpriority", "o_orderstatus"],
        size=5,
        after={"o_orderpriority": "2-HIGH", "o_orderstatus": "F"},
    )


SQL_COMPOSITE_PAGE = """
SELECT o_orderpriority, o_orderstatus, COUNT(*) AS doc_count
FROM orders
WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL
  AND (o_orderpriority > '2-HIGH'
       OR (o_orderpriority = '2-HIGH' AND o_orderstatus > 'F'))
GROUP BY o_orderpriority, o_orderstatus
ORDER BY o_orderpriority, o_orderstatus
LIMIT 5
"""


def q_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES weighted_avg metric: quantity-weighted mean extendedprice per
    returnflag, one agg pass."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        weighted_avg,
    )

    return weighted_avg(
        _t(spark, sf_dir, "lineitem"),
        value="l_extendedprice",
        weight="l_quantity",
        by="l_returnflag",
    )


SQL_WEIGHTED_AVG = """
SELECT l_returnflag,
       ROUND(SUM(CASE WHEN l_extendedprice IS NOT NULL
                       AND l_quantity IS NOT NULL
                      THEN l_extendedprice * l_quantity END)
             / SUM(CASE WHEN l_extendedprice IS NOT NULL
                         AND l_quantity IS NOT NULL
                        THEN l_quantity END), 6) AS weighted_avg
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES median_absolute_deviation metric (exact): per-orderpriority MAD of
    totalprice — per-group medians broadcast back onto the rows for the
    deviation pass."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        median_absolute_deviation,
    )

    return median_absolute_deviation(
        _t(spark, sf_dir, "orders"), "o_totalprice", by="o_orderpriority"
    )


SQL_MAD = """
WITH m AS (
  SELECT o_orderpriority, quantile_cont(o_totalprice, 0.5) AS med
  FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1
)
SELECT o.o_orderpriority,
       ROUND(quantile_cont(ABS(o.o_totalprice - m.med), 0.5), 6) AS mad
FROM orders o JOIN m USING (o_orderpriority)
WHERE o.o_totalprice IS NOT NULL
GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
"""


def q_rare_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES rare_terms: the long tail — orderkeys with at most one lineitem
    (exact counts; ES itself approximates with a CuckooFilter)."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        rare_terms,
    )

    return rare_terms(
        _t(spark, sf_dir, "lineitem"), "l_orderkey", max_doc_count=1
    )


SQL_RARE_TERMS = """
SELECT l_orderkey, COUNT(*) AS doc_count
FROM lineitem WHERE l_orderkey IS NOT NULL
GROUP BY l_orderkey HAVING COUNT(*) <= 1
ORDER BY doc_count ASC, l_orderkey ASC
"""


def q_adjacency_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES adjacency_matrix: named event filters plus every pairwise
    intersection counted in one scan."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        adjacency_matrix,
    )

    ev = _t(spark, sf_dir, "events")
    return adjacency_matrix(
        ev,
        {
            "purchase": F.col("event_type") == "purchase",
            "high_value": F.col("value") > 250,
            "weekend": F.date_format("ts", "EEEE").isin("Saturday", "Sunday"),
        },
    )


SQL_ADJACENCY_MATRIX = """
SELECT * FROM (
  SELECT 'purchase' AS key,
         COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS doc_count
  FROM events
  UNION ALL
  SELECT 'high_value', COUNT(CASE WHEN value > 250 THEN 1 END) FROM events
  UNION ALL
  SELECT 'weekend',
         COUNT(CASE WHEN dayname(ts) IN ('Saturday','Sunday') THEN 1 END)
  FROM events
  UNION ALL
  SELECT 'purchase&high_value',
         COUNT(CASE WHEN event_type = 'purchase' AND value > 250 THEN 1 END)
  FROM events
  UNION ALL
  SELECT 'purchase&weekend',
         COUNT(CASE WHEN event_type = 'purchase'
                     AND dayname(ts) IN ('Saturday','Sunday') THEN 1 END)
  FROM events
  UNION ALL
  SELECT 'high_value&weekend',
         COUNT(CASE WHEN value > 250
                     AND dayname(ts) IN ('Saturday','Sunday') THEN 1 END)
  FROM events
) WHERE doc_count > 0
"""


_BM25_TERMS = ["spark", "join", "stream"]


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-ranked full-text search (operators/ranking.py) over documents —
    relevance scoring the reference's filter-only search never had."""
    from harmonize_search_analyze_spark.operators.ranking import bm25_search

    docs = _t(spark, sf_dir, "documents")
    return bm25_search(docs, "doc_id", "text", _BM25_TERMS, k=25)


def _sql_bm25_search() -> str:
    from harmonize_search_analyze_spark.operators.ranking import (
        bm25_search_sql,
    )

    return bm25_search_sql(
        "documents", "doc_id", "text", _BM25_TERMS, "duckdb", k=25
    )


def q_significant_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES significant_text: tokens over-represented in English documents vs
    the whole corpus (JLH on per-doc-distinct token frequencies)."""
    from harmonize_search_analyze_spark.operators.text import (
        significant_text_sql,
    )

    docs = _t(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("__sigtext_docs")
    return spark.sql(
        significant_text_sql(
            "__sigtext_docs", "text", "lang = 'en'", "spark", k=10
        )
    )


def _sql_significant_text() -> str:
    from harmonize_search_analyze_spark.operators.text import (
        significant_text_sql,
    )

    return significant_text_sql(
        "documents", "text", "lang = 'en'", "duckdb", k=10
    )


_GEO_RINGS = [(None, 2000000.0), (2000000.0, 6000000.0), (6000000.0, None)]


def q_geo_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES geo_distance agg: distance rings around (0,0) over the synthesized
    lineitem coordinates (same derivation as the geohash panel)."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        geo_distance,
    )

    df = _t(spark, sf_dir, "lineitem").selectExpr(
        f"{_LAT_EXPR} AS lat", f"{_LON_EXPR} AS lon"
    )
    return geo_distance(df, "lat", "lon", (0.0, 0.0), _GEO_RINGS)


def _sql_geo_distance() -> str:
    from harmonize_search_analyze_spark.operators.aggregations import (
        haversine_sql,
    )

    d = haversine_sql(_LAT_EXPR, _LON_EXPR, (0.0, 0.0))
    parts = []
    for lo, hi in _GEO_RINGS:
        key = f"{'*' if lo is None else lo}-{'*' if hi is None else hi}"
        conds = [f"{d} IS NOT NULL"]
        if lo is not None:
            conds.append(f"{d} >= {lo}")
        if hi is not None:
            conds.append(f"{d} < {hi}")
        parts.append(
            f"SELECT '{key}' AS range_key, "
            f"COUNT(CASE WHEN {' AND '.join(conds)} THEN 1 END) AS doc_count "
            "FROM lineitem"
        )
    return "\nUNION ALL\n".join(parts)


def q_geo_bounds_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES geo_bounds + geo_centroid in one pass over the synthesized
    lineitem coordinates (the map panel's fit-to-data + center-of-mass)."""
    ev = _t(spark, sf_dir, "lineitem").selectExpr(
        f"{_LAT_EXPR} AS lat", f"{_LON_EXPR} AS lon"
    )
    ok = ev.where(F.col("lat").isNotNull() & F.col("lon").isNotNull())
    return ok.agg(
        F.max("lat").alias("top"),
        F.min("lon").alias("left"),
        F.min("lat").alias("bottom"),
        F.max("lon").alias("right"),
        F.round(F.avg("lat"), 6).alias("centroid_lat"),
        F.round(F.avg("lon"), 6).alias("centroid_lon"),
        F.count(F.lit(1)).alias("doc_count"),
    )


def _sql_geo_bounds_centroid() -> str:
    return f"""
SELECT MAX(lat) AS top, MIN(lon) AS "left",
       MIN(lat) AS bottom, MAX(lon) AS "right",
       ROUND(AVG(lat), 6) AS centroid_lat,
       ROUND(AVG(lon), 6) AS centroid_lon,
       COUNT(*) AS doc_count
FROM (SELECT {_LAT_EXPR} AS lat, {_LON_EXPR} AS lon FROM lineitem)
WHERE lat IS NOT NULL AND lon IS NOT NULL
"""


def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-data pipeline composed end-to-end: per-doc quality
    scoring -> threshold filter -> exact dedup (keep min doc_id per
    normalized-text hash) -> per-source corpus rollup. One pass + one
    window shuffle on the dedup hash + one agg shuffle."""
    from pyspark.sql import Window

    from harmonize_search_analyze_spark.operators.text import analyze_documents

    docs = analyze_documents(_t(spark, sf_dir, "documents"))
    kept = docs.where(F.col("quality") >= 0.5)
    w = Window.partitionBy("text_hash").orderBy("doc_id")
    dedup = (
        kept.withColumn("text_hash", F.md5(F.lower(F.trim("text"))))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
    )
    return (
        dedup.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.round(F.avg("quality"), 6).alias("avg_quality"),
        )
        .orderBy("source")
    )


def _sql_corpus_curation() -> str:
    from harmonize_search_analyze_spark.operators.text import (
        quality_components_sql,
        quality_score_sql,
    )

    c = quality_components_sql("text", "duckdb")
    return f"""
WITH a AS (
  SELECT doc_id, source, text,
         {c['n_tokens']} AS n_tokens,
         {quality_score_sql('text', 'duckdb')} AS quality
  FROM documents
), k AS (
  SELECT * FROM a WHERE quality >= 0.5
), d AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(LOWER(TRIM(text)))
                               ORDER BY doc_id) AS rn
  FROM k
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       ROUND(AVG(quality), 6) AS avg_quality
FROM d WHERE rn = 1 GROUP BY source ORDER BY source
"""


def q_media_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end with a SQL oracle: deterministically
    wrap each document id in a REAL 33-byte PNG (width = 1 + doc_id % 512,
    height 64), sniff the binary headers back (mapInPandas), and aggregate
    the modality profile. The oracle can predict every number because the
    construction is pinned."""
    import struct
    import zlib

    from pyspark.sql import types as T

    from harmonize_search_analyze_spark.operators.multimodal import (
        attach_media_metadata,
        media_summary,
    )

    # modest repartition: the two Python (Arrow) stages parallelize without
    # paying a 32-worker fan-out for a few thousand rows
    docs = _t(spark, sf_dir, "documents").select("doc_id").repartition(8)
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ])

    def to_png(batches):
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                ihdr = struct.pack(">IIBBBBB", 1 + int(did) % 512, 64, 8, 2, 0, 0, 0)
                chunk = b"IHDR" + ihdr
                payloads.append(
                    b"\x89PNG\r\n\x1a\n" + struct.pack(">I", len(ihdr))
                    + chunk + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
                )
            import pandas as pd

            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    media = attach_media_metadata(docs.mapInPandas(to_png, schema))
    return media_summary(media)


SQL_MEDIA_PROFILE = """
SELECT 'image' AS modality, 'png' AS format, COUNT(*) AS n_items,
       CAST(SUM(33) AS BIGINT) AS total_bytes,
       ROUND(AVG(1 + doc_id % 512), 2) AS avg_width,
       ROUND(AVG(64.0), 2) AS avg_height
FROM documents
"""


def q_image_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate pairs over REAL in-plan PNG bytes, driver-
    gated end-to-end (VERDICT r9 next-round #2): synthesize a
    deterministic 8x9 grayscale PNG per document (``gate_media_synth``
    — pixel values are pure hash arithmetic of doc_id, ~4% of docs in
    planted <=4-member duplicate clusters), then run the production
    ``image_near_dup_pairs`` pipeline: Arrow decode (stdlib PNG codec)
    -> dhash sketch -> banded candidate join (pigeonhole-exact at
    Hamming 3 — four 16-bit bands, the production geometry) -> bit_count verify. The DuckDB oracle recomputes the
    sketch from the SAME arithmetic in pure SQL (losslessness of the
    codec makes decode(encode(px)) == px) and brute-force verifies all
    pairs — pinning codec, bit order, banding recall, and verify in one
    gate. Scale shape: one map-only decode pass + band-key shuffle,
    never all pairs."""
    from harmonize_search_analyze_spark.operators.multimodal import (
        gate_media_synth,
        image_near_dup_pairs,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id").repartition(8)
    synth = gate_media_synth(docs, "doc_id", "image")
    return image_near_dup_pairs(
        synth, "doc_id", max_hamming=3
    ).orderBy("id1", "id2")


def _sql_image_near_dup() -> str:
    from harmonize_search_analyze_spark.operators.dedup import hamming_sql
    from harmonize_search_analyze_spark.operators.multimodal import (
        gate_sketch_sql,
    )

    sk = gate_sketch_sql("documents", "doc_id", "image", "duckdb")
    ham = hamming_sql("a.sketch", "b.sketch", "duckdb")
    return f"""
WITH sk AS ({sk})
SELECT a.doc_id AS id1, b.doc_id AS id2, CAST({ham} AS INT) AS hamming
FROM sk a JOIN sk b ON a.doc_id < b.doc_id
WHERE {ham} <= 3
ORDER BY id1, id2
"""


def q_audio_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-duplicate pairs over REAL in-plan PCM WAV bytes —
    the audio twin of ``q_image_near_dup`` (same planted-cluster
    construction, same gate contract): synthesize 130-sample 16-bit
    WAV per doc, decode (struct-layout PCM reader), energy-delta
    fingerprint, banded join, bit_count verify; the DuckDB oracle
    recomputes the fingerprint as integer arithmetic (frame energy
    comparisons reduce exactly — dyadic floats) and brute-verifies."""
    from harmonize_search_analyze_spark.operators.multimodal import (
        audio_near_dup_pairs,
        gate_media_synth,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id").repartition(8)
    synth = gate_media_synth(docs, "doc_id", "audio")
    return audio_near_dup_pairs(
        synth, "doc_id", max_hamming=3
    ).orderBy("id1", "id2")


def _sql_audio_near_dup() -> str:
    from harmonize_search_analyze_spark.operators.dedup import hamming_sql
    from harmonize_search_analyze_spark.operators.multimodal import (
        gate_sketch_sql,
    )

    sk = gate_sketch_sql("documents", "doc_id", "audio", "duckdb")
    ham = hamming_sql("a.sketch", "b.sketch", "duckdb")
    return f"""
WITH sk AS ({sk})
SELECT a.doc_id AS id1, b.doc_id AS id2, CAST({ham} AS INT) AS hamming
FROM sk a JOIN sk b ON a.doc_id < b.doc_id
WHERE {ham} <= 3
ORDER BY id1, id2
"""


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3/Llama-style benchmark decontamination: flag docs sharing any
    word 8-gram with the 'benchmark' subset (doc_id % 97 == 0 — a stand-in
    eval suite). Benchmark grams broadcast; the corpus never shuffles."""
    from harmonize_search_analyze_spark.operators.contamination import (
        contamination_flags,
    )

    docs = _t(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    return contamination_flags(docs, bench, n=8).orderBy("doc_id")


def _sql_decontaminate() -> str:
    from harmonize_search_analyze_spark.operators.contamination import (
        contamination_oracle_sql,
    )

    return contamination_oracle_sql("documents", "doc_id % 97 = 0", n=8)


def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality score (CCNet's filter, degenerate public form):
    corpus token frequencies in one hash agg, then per-doc mean negative
    log-likelihood. Two shuffles regardless of corpus size."""
    from harmonize_search_analyze_spark.operators.contamination import (
        unigram_lm_score,
    )

    docs = _t(spark, sf_dir, "documents")
    return unigram_lm_score(docs).orderBy("doc_id")


def _sql_lm_score() -> str:
    from harmonize_search_analyze_spark.operators.contamination import (
        unigram_lm_oracle_sql,
    )

    return unigram_lm_oracle_sql("documents")


def q_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8-quantized similarity search: symmetric per-vector quantization
    (8x smaller than float64), dequantize fused into the scan, exact
    cosine top-k on the dequantized vectors — what a quantized index
    returns, hash-verified end-to-end against the same math in DuckDB."""
    from harmonize_search_analyze_spark.operators.similarity import (
        quantized_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    return quantized_topk(emb, _QUERY_VEC, 10)


def _sql_quantized_topk() -> str:
    from harmonize_search_analyze_spark.operators.similarity import (
        quantized_topk_oracle_sql,
    )

    return quantized_topk_oracle_sql(_QUERY_VEC, 10)


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (RAG / fixed-context prep):
    32-token windows, stride 24. Map-only sequence->explode->slice,
    codegen'd, scan-bound."""
    from harmonize_search_analyze_spark.operators.packing import (
        chunk_documents,
    )

    docs = _t(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_tokens=32, stride=24).orderBy(
        "doc_id", "chunk_idx"
    )


def _sql_chunk_documents() -> str:
    from harmonize_search_analyze_spark.operators.packing import (
        chunk_oracle_sql,
    )

    return chunk_oracle_sql("documents", chunk_tokens=32, stride=24)


def q_percentile_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES percentile_ranks on lineitem quantity: exact empirical CDF at 3
    probe values, one conditional-aggregate scan."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        percentile_ranks,
    )

    li = _t(spark, sf_dir, "lineitem")
    return percentile_ranks(li, "l_quantity", [10.0, 25.0, 40.0])


SQL_PERCENTILE_RANKS = """
SELECT * FROM (
  SELECT CAST(10.0 AS DOUBLE) AS value,
         ROUND(100.0 * COUNT(*) FILTER (l_quantity <= 10.0)
               / COUNT(l_quantity), 6) AS pct_rank FROM lineitem
  UNION ALL
  SELECT CAST(25.0 AS DOUBLE), ROUND(100.0 * COUNT(*) FILTER (l_quantity <= 25.0)
               / COUNT(l_quantity), 6) FROM lineitem
  UNION ALL
  SELECT CAST(40.0 AS DOUBLE), ROUND(100.0 * COUNT(*) FILTER (l_quantity <= 40.0)
               / COUNT(l_quantity), 6) FROM lineitem
) ORDER BY value
"""


def q_boxplot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES boxplot agg on lineitem quantity (exact linear-interpolation
    quartiles — DuckDB quantile_cont parity; approx_percentile is the
    documented sketch path)."""
    from harmonize_search_analyze_spark.operators.aggregations import boxplot

    li = _t(spark, sf_dir, "lineitem")
    return boxplot(li, "l_quantity")


SQL_BOXPLOT = """
SELECT CAST(MIN(l_quantity) AS DOUBLE) AS min,
       ROUND(quantile_cont(l_quantity, 0.25), 6) AS q1,
       ROUND(quantile_cont(l_quantity, 0.5), 6) AS q2,
       ROUND(quantile_cont(l_quantity, 0.75), 6) AS q3,
       CAST(MAX(l_quantity) AS DOUBLE) AS max
FROM lineitem
"""


def q_string_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES string_stats agg on order priority: lengths + Shannon entropy
    (bits) of the character distribution."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        string_stats,
    )

    o = _t(spark, sf_dir, "orders")
    return string_stats(o, "o_orderpriority")


SQL_STRING_STATS = """
WITH s AS (SELECT o_orderpriority AS v FROM orders WHERE o_orderpriority IS NOT NULL),
chars AS (
  SELECT unnest(string_split_regex(v, '')) AS ch FROM s
), freq AS (
  SELECT ch, COUNT(*) AS c FROM chars WHERE ch != '' GROUP BY ch
), ent AS (
  SELECT ROUND(-SUM((CAST(c AS DOUBLE) / tot) * LN(CAST(c AS DOUBLE) / tot))
               / LN(2.0), 6) AS entropy
  FROM freq CROSS JOIN (SELECT SUM(c) AS tot FROM freq)
)
SELECT CAST(COUNT(*) AS BIGINT) AS count,
       CAST(MIN(LENGTH(v)) AS BIGINT) AS min_length,
       CAST(MAX(LENGTH(v)) AS BIGINT) AS max_length,
       ROUND(AVG(LENGTH(v)), 6) AS avg_length,
       (SELECT entropy FROM ent) AS entropy
FROM s
"""


def q_t_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES t_test agg (Welch): purchase vs click event values in one scan.
    Reports (t, df) exactly; ES's p-value needs the t-CDF (documented
    divergence)."""
    from harmonize_search_analyze_spark.operators.aggregations import t_test

    ev = _t(spark, sf_dir, "events")
    return t_test(
        ev, "value",
        F.col("event_type") == "purchase",
        F.col("event_type") == "click",
    )


SQL_T_TEST = """
WITH s AS (
  SELECT COUNT(*) FILTER (event_type = 'purchase') AS na,
         AVG(value) FILTER (event_type = 'purchase') AS ma,
         VAR_SAMP(value) FILTER (event_type = 'purchase') AS va,
         COUNT(*) FILTER (event_type = 'click') AS nb,
         AVG(value) FILTER (event_type = 'click') AS mb,
         VAR_SAMP(value) FILTER (event_type = 'click') AS vb
  FROM events
)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       ROUND((ma - mb) / sqrt(va / na + vb / nb), 6) AS t_stat,
       ROUND(((va / na + vb / nb) * (va / na + vb / nb)) /
             ((va / na) * (va / na) / (na - 1)
              + (vb / nb) * (vb / nb) / (nb - 1)), 6) AS welch_df
FROM s
"""


def q_normalize_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES normalize pipeline agg: daily event buckets as percent-of-sum."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        date_histogram,
        normalize_pipeline,
    )

    ev = _t(spark, sf_dir, "events")
    buckets = date_histogram(ev, "ts", "1 day")
    return normalize_pipeline(buckets, "bucket", "doc_count")


SQL_NORMALIZE = """
WITH b AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
         COUNT(*) AS doc_count
  FROM events WHERE ts IS NOT NULL GROUP BY bucket
)
SELECT bucket, doc_count,
       ROUND(CAST(doc_count AS DOUBLE) / SUM(doc_count) OVER (), 6)
         AS normalized
FROM b ORDER BY bucket
"""


def q_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII curation pass: per-doc family counts (email/SSN/phone/IP), an
    any-PII flag, and the md5 of the redacted text — map-only, scan-bound;
    the digest verifies redaction output without shipping text."""
    from harmonize_search_analyze_spark.operators.curation import pii_scan

    docs = _t(spark, sf_dir, "documents")
    return pii_scan(docs).orderBy("doc_id")


def _sql_pii_scan() -> str:
    from harmonize_search_analyze_spark.operators.curation import (
        pii_scan_oracle_sql,
    )

    return pii_scan_oracle_sql("documents")


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs -> canonical clusters: min-label propagation over the
    LSH pair graph (transitive chains a~b~c collapse into one cluster —
    the grouping production dedup keys on). The iterative Spark loop is
    verified EXACTLY by a recursive-CTE transitive closure in DuckDB: the
    min-reachable-id labeling is algorithm-independent."""
    from harmonize_search_analyze_spark.operators.dedup import (
        connected_components,
        near_dup_pairs_lsh,
    )

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 10 == 0)
    pairs = near_dup_pairs_lsh(
        docs, "doc_id", "text", threshold=0.9, k=8, n=1, rows_per_band=2
    )
    labels = connected_components(pairs)
    return (
        docs.select("doc_id")
        .join(labels.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
            (F.coalesce("cluster_id", "doc_id") == F.col("doc_id")).alias(
                "is_canonical"
            ),
        )
        .orderBy("doc_id")
    )


def _sql_cluster_labels_cte() -> str:
    """Shared WITH RECURSIVE prefix for every LSH-cluster oracle
    (dedup_clusters / dedup_keep_best / soft_dedup): transitive closure
    of the near-dup pair graph + min-reachable-id labeling. ONE source of
    truth — the three oracles must never diverge on the closure logic."""
    pairs = _sql_lsh_near_dup()
    return f"""
WITH RECURSIVE pairs AS ({pairs}),
sym AS (
  SELECT id1 AS a, id2 AS b FROM pairs
  UNION SELECT id2, id1 FROM pairs
),
reach AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
),
labels AS (
  SELECT a AS id, LEAST(a, MIN(b)) AS cluster_id FROM reach GROUP BY a
)"""


def _sql_dedup_clusters() -> str:
    return f"""{_sql_cluster_labels_cte()}
SELECT d.doc_id,
       COALESCE(l.cluster_id, d.doc_id) AS cluster_id,
       COALESCE(l.cluster_id, d.doc_id) = d.doc_id AS is_canonical
FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) d
LEFT JOIN labels l ON l.id = d.doc_id
ORDER BY d.doc_id
"""


def q_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search: BM25 lexical top-50 and cosine semantic top-50
    (doc_id == vec_id in the testdata) fused by Reciprocal Rank Fusion —
    rank-based, so the two score scales never need calibration. The
    fusion input is two bounded top-N lists, so the union + agg is
    metadata-sized regardless of corpus size."""
    from harmonize_search_analyze_spark.operators.ranking import (
        bm25_search,
        rrf_fuse,
    )
    from harmonize_search_analyze_spark.operators.similarity import (
        cosine_topk,
    )

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    w_lex = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    lex = (
        bm25_search(docs, "doc_id", "text", _BM25_TERMS, k=50)
        .withColumn("rank", F.row_number().over(w_lex))
        .select("doc_id", "rank")
    )
    w_sem = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    sem = (
        cosine_topk(emb, "embedding", _QUERY_VEC, 50)
        .withColumn("rank", F.row_number().over(w_sem))
        .select(F.col("vec_id").alias("doc_id"), "rank")
    )
    return rrf_fuse([lex, sem], k=20)


def _sql_hybrid_search() -> str:
    from harmonize_search_analyze_spark.operators.ranking import (
        bm25_search_sql,
    )

    bm25 = bm25_search_sql(
        "documents", "doc_id", "text", _BM25_TERMS, "duckdb", 50
    )
    qlit = "[" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in _QUERY_VEC) + "]"
    qnorm = math.sqrt(sum(v * v for v in _QUERY_VEC))
    dot = (
        "list_sum(list_transform(list_zip(embedding::DOUBLE[], "
        f"{qlit}), p -> p[1] * p[2]))"
    )
    nrm = (
        "sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))"
    )
    return f"""
WITH lex AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM ({bm25}) b
), sem_scored AS (
  SELECT vec_id AS doc_id,
         ROUND({dot} / ({nrm} * {qnorm!r}), 6) AS cosine
  FROM embeddings
  ORDER BY cosine DESC, doc_id ASC LIMIT 50
), sem AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id ASC) AS rank
  FROM sem_scored
), u AS (
  SELECT doc_id, rank FROM lex UNION ALL SELECT doc_id, rank FROM sem
)
SELECT doc_id,
       ROUND(SUM(1.0 / (60.0 + rank)), 6) AS rrf_score,
       CAST(COUNT(*) AS BIGINT) AS n_lists
FROM u GROUP BY doc_id
ORDER BY rrf_score DESC, doc_id ASC LIMIT 20
"""


def q_similarity_join_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe-pruned batch k-NN (scale path for similarity_join): every
    50th vector as the query set, 4 of 16 IVF lists probed per query —
    scored pairs drop 4x vs the exact join; probes broadcast, candidate
    cosines run as one vectorized Arrow stage."""
    from harmonize_search_analyze_spark.operators.similarity import (
        similarity_join_ivf,
    )

    # spread=True tried round 11 and measured WORSE (A/B 1.16 -> 1.55 s,
    # see graph_explore note)
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity_join_ivf(emb, queries, k=5).orderBy(
        "query_id", "rank"
    )


def _sql_similarity_join_ivf() -> str:
    from harmonize_search_analyze_spark.operators.similarity import (
        similarity_join_ivf_sql,
    )

    inner = similarity_join_ivf_sql(
        "embeddings",
        "SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv "
        "FROM embeddings WHERE vec_id % 50 = 0",
        5,
    )
    return f"SELECT * FROM ({inner}) s ORDER BY query_id, rank"


def q_date_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES date_range bucket agg with Kibana date-math bounds resolved
    against a pinned now (one-pass conditional counts, buckets may
    overlap)."""
    import datetime as dt

    from harmonize_search_analyze_spark.operators.aggregations import (
        date_range_agg,
    )

    ev = _t(spark, sf_dir, "events")
    now = dt.datetime(2024, 1, 20, 12, 34, 56)
    return date_range_agg(
        ev, "ts",
        [(None, "now-7d/d"), ("now-7d/d", "now/d"), ("now/d", None)],
        now=now,
    )


SQL_DATE_RANGE = """
SELECT * FROM (
  SELECT '*-now-7d/d' AS range_key,
         COUNT(*) FILTER (ts IS NOT NULL
           AND ts < TIMESTAMP '2024-01-13 00:00:00') AS doc_count
  FROM events
  UNION ALL
  SELECT 'now-7d/d-now/d',
         COUNT(*) FILTER (ts >= TIMESTAMP '2024-01-13 00:00:00'
           AND ts < TIMESTAMP '2024-01-20 00:00:00')
  FROM events
  UNION ALL
  SELECT 'now/d-*',
         COUNT(*) FILTER (ts >= TIMESTAMP '2024-01-20 00:00:00')
  FROM events
)
ORDER BY range_key
"""


def q_top_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES top_metrics: per event_type, the (value, user_id) of the 2
    highest-value events; ties pinned on the first metric column."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        top_metrics,
    )

    ev = _t(spark, sf_dir, "events")
    return top_metrics(
        ev, "event_type", "value", ["user_id"], size=2
    ).orderBy("event_type", "rank")


SQL_TOP_METRICS = """
SELECT event_type, rank, value, user_id FROM (
  SELECT event_type, value, user_id,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value DESC, user_id ASC) AS rank
  FROM events
) WHERE rank <= 2 ORDER BY event_type, rank
"""


def q_rate_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES rate agg: daily event buckets reported as per-hour rates (one
    date_trunc groupBy, rescale, round once)."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        rate_agg,
    )

    ev = _t(spark, sf_dir, "events")
    return rate_agg(ev, "ts", interval="day", unit_seconds=3600)


SQL_RATE_AGG = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
       ROUND(COUNT(*) / 24.0, 6) AS rate
FROM events GROUP BY bucket ORDER BY bucket
"""


def q_geotile_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES geotile_grid: slippy-map z/x/y tile buckets at zoom 5 over the
    synthesized lineitem coordinates (same lat/lon derivation as
    geohash_grid). Pure column math — identical SQL text is the oracle."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        geotile_grid,
    )

    df = _t(spark, sf_dir, "lineitem")
    return geotile_grid(df, _LAT_EXPR, _LON_EXPR, zoom=5, k=20)


def _sql_geotile_grid() -> str:
    from harmonize_search_analyze_spark.functions.geohash import geotile_sql

    key = geotile_sql(_LAT_EXPR, _LON_EXPR, zoom=5)
    return f"""
SELECT {key} AS tile, COUNT(*) AS doc_count
FROM lineitem
GROUP BY tile ORDER BY doc_count DESC, tile ASC LIMIT 20
"""


def q_matrix_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES matrix_stats: pairwise covariance/correlation of three small-
    magnitude lineitem measures in ONE aggregation pass (small magnitudes
    keep 6-decimal rounding far above cross-engine summation drift)."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        matrix_stats,
    )

    li = _t(spark, sf_dir, "lineitem")
    return matrix_stats(li, ["l_quantity", "l_discount", "l_tax"])


def _sql_matrix_stats() -> str:
    fields = ["l_quantity", "l_discount", "l_tax"]
    pairs = [(a, b) for i, a in enumerate(fields) for b in fields[i:]]
    selects = []
    for a, b in pairs:
        # diagonal carries correlation 1 whenever rows exist (CORR(a, a)
        # is NULL for a zero-variance field) — mirrors matrix_stats()
        corr = (
            "CASE WHEN COUNT(*) > 0 THEN 1.0 END"
            if a == b
            else f"ROUND(CORR({a}, {b}), 6)"
        )
        selects.append(
            f"SELECT '{a}' AS field_a, '{b}' AS field_b, "
            "CAST(COUNT(*) AS BIGINT) AS count, "
            f"ROUND(AVG({a}), 6) AS mean_a, ROUND(AVG({b}), 6) AS mean_b, "
            f"ROUND(COVAR_SAMP({a}, {b}), 6) AS covariance, "
            f"{corr} AS correlation FROM s"
        )
    cond = " AND ".join(f"{f} IS NOT NULL" for f in fields)
    body = "\nUNION ALL\n".join(selects)
    return (
        f"WITH s AS (SELECT * FROM lineitem WHERE {cond})\n{body}\n"
        "ORDER BY field_a, field_b"
    )


def q_variable_width_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES variable_width_histogram (deterministic equal-frequency variant):
    4 quantile-bounded buckets of order totalprice — boundary pass + one
    conditional-assignment agg, no global sort."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        variable_width_histogram,
    )

    # spread=True tried round 11 and measured WORSE (A/B 1.06 -> 1.42 s,
    # see graph_explore note)
    o = _t(spark, sf_dir, "orders")
    return variable_width_histogram(o, "o_totalprice", buckets=4)


SQL_VARIABLE_WIDTH_HISTOGRAM = """
WITH s AS (SELECT o_totalprice AS v FROM orders WHERE o_totalprice IS NOT NULL),
b AS (
  SELECT ROUND(quantile_cont(v, 0.25), 6) AS b0,
         ROUND(quantile_cont(v, 0.50), 6) AS b1,
         ROUND(quantile_cont(v, 0.75), 6) AS b2
  FROM s
)
SELECT CAST((v > b0) AS INT) + CAST((v > b1) AS INT)
       + CAST((v > b2) AS INT) AS bucket,
       MIN(v) AS min, MAX(v) AS max, COUNT(*) AS doc_count
FROM s CROSS JOIN b
GROUP BY bucket ORDER BY bucket
"""


# Synthesized IPv4 per event (FIXTURES.md convention: derive typed columns
# from numerics) — same expression text on both engines.
_IP_EXPR = (
    "('10.' || CAST(user_id % 4 AS STRING) || '.' || "
    "CAST((user_id DIV 3) % 256 AS STRING) || '.' || "
    "CAST(user_id % 256 AS STRING))"
)
_IP_EXPR_DUCK = (
    "('10.' || CAST(user_id % 4 AS STRING) || '.' || "
    "CAST((user_id // 3) % 256 AS STRING) || '.' || "
    "CAST(user_id % 256 AS STRING))"
)


def q_ip_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ip_range agg: [from, to) dotted-quad buckets (open sides allowed)
    over IPv4 addresses synthesized from user_id — addresses integerized by
    a codegen'd expression, buckets one-pass conditional counts."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        ip_range_agg,
    )

    ev = _t(spark, sf_dir, "events").withColumn("ip", F.expr(_IP_EXPR))
    return ip_range_agg(
        ev,
        "ip",
        [("10.0.0.0", "10.2.0.0"), ("10.2.0.0", None), (None, "10.1.0.0")],
    )


def _sql_ip_range() -> str:
    from harmonize_search_analyze_spark.operators.aggregations import (
        ip_to_long_sql,
    )

    def _lit(ip: str) -> int:
        a, b, c, d = (int(p) for p in ip.split("."))
        return a * 16777216 + b * 65536 + c * 256 + d

    ipnum = ip_to_long_sql(_IP_EXPR_DUCK)
    rows = [
        ("10.0.0.0-10.2.0.0",
         f"{ipnum} >= {_lit('10.0.0.0')} AND {ipnum} < {_lit('10.2.0.0')}"),
        ("10.2.0.0-*", f"{ipnum} >= {_lit('10.2.0.0')}"),
        ("*-10.1.0.0", f"{ipnum} < {_lit('10.1.0.0')}"),
    ]
    selects = [
        f"SELECT '{key}' AS range_key, "
        f"COUNT(CASE WHEN {cond} THEN 1 END) AS doc_count FROM events"
        for key, cond in rows
    ]
    return "\nUNION ALL\n".join(selects)


def q_categorize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES categorize_text agg (deterministic prefix-pattern variant):
    bucket documents by their digit-stripped 2-token prefix pattern."""
    from harmonize_search_analyze_spark.operators.text import categorize_text

    docs = _t(spark, sf_dir, "documents")
    return categorize_text(docs, "text", max_tokens=2, k=15)


def _sql_categorize_text() -> str:
    from harmonize_search_analyze_spark.operators.text import (
        categorize_pattern_sql,
    )

    pat = categorize_pattern_sql("text", "duckdb", max_tokens=2)
    return f"""
SELECT {pat} AS category, COUNT(*) AS doc_count
FROM documents WHERE text IS NOT NULL AND {pat} != ''
GROUP BY category ORDER BY doc_count DESC, category ASC LIMIT 15
"""


_ADVANCED_AST = {
    "bool": {
        "should": [
            {"fuzzy": {"event_type": {"value": "clicks", "fuzziness": 1}}},
            {"wildcard": {"event_type": "s?gnup"}},
            {"prefix": {"event_type": "vi"}},
        ],
        "must": [{"exists": {"field": "event_type"}}],
        "must_not": [{"regexp": {"event_type": "err.*"}}],
    }
}


def q_search_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term-level ES query DSL beyond the webapp grammar: fuzzy (edit
    distance), wildcard (*/?), prefix, regexp, exists composed in one bool —
    compiled to a single pushed-down Column predicate."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.where(compile_query(_ADVANCED_AST))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy("event_type")
    )


SQL_SEARCH_ADVANCED = """
SELECT event_type, COUNT(*) AS doc_count FROM events
WHERE (levenshtein(event_type, 'clicks') <= 1
       OR regexp_matches(event_type, '^(?:s.gnup)$')
       OR event_type LIKE 'vi%')
  AND event_type IS NOT NULL
  AND NOT regexp_matches(event_type, '^(?:err.*)$')
GROUP BY event_type ORDER BY event_type
"""


def q_more_like_this(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES more_like_this: docs most similar to doc 42 — top tf-idf terms of
    the example, 30% minimum_should_match, idf-sum ranking."""
    from harmonize_search_analyze_spark.operators.ranking import (
        more_like_this,
    )

    docs = _t(spark, sf_dir, "documents")
    return more_like_this(
        docs, "doc_id", "text", 42, max_query_terms=10, k=10
    )


def _sql_more_like_this() -> str:
    from harmonize_search_analyze_spark.operators.ranking import (
        more_like_this_sql,
    )

    return more_like_this_sql(
        "documents", "doc_id", "text", 42, "duckdb",
        max_query_terms=10, k=10,
    )


def q_highlight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES highlight: snippet around the first 'merge' hit with <em> tags,
    30 chars of context — position arithmetic, no UDF."""
    from harmonize_search_analyze_spark.operators.text import highlight

    docs = _t(spark, sf_dir, "documents")
    return (
        docs.withColumn("snippet", highlight("text", "merge", window=30))
        .where(F.col("snippet").isNotNull())
        .select("doc_id", "snippet")
        .orderBy("doc_id")
        .limit(20)
    )


def _sql_highlight() -> str:
    from harmonize_search_analyze_spark.operators.text import highlight_sql

    snip = highlight_sql("text", "merge", "duckdb", window=30)
    return f"""
SELECT doc_id, snippet FROM (
  SELECT doc_id, {snip} AS snippet FROM documents
) t WHERE snippet IS NOT NULL
ORDER BY doc_id LIMIT 20
"""


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide exact line dedup (RefinedWeb/Dolma curation): repeated
    lines survive only at their first (doc_id, pos); docs reassembled in
    order. One line-key window shuffle + one doc reassembly agg."""
    from harmonize_search_analyze_spark.operators.dedup import line_dedup

    docs = _t(spark, sf_dir, "documents")
    return line_dedup(docs, "doc_id", "text").orderBy("doc_id")


def _sql_line_dedup() -> str:
    from harmonize_search_analyze_spark.operators.dedup import line_dedup_sql

    return (
        line_dedup_sql("documents", "doc_id", "text")
        + " ORDER BY doc_id"
    )


def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style duplicated k-token-span removal (Lee et al. 2021)
    on a 1-in-5 doc sample: any 8-token window occurring more than once
    keeps its first (doc, pos) occurrence; later occurrences' covered
    tokens drop and docs reassemble in order. One gram-key window shuffle
    + bounded k fan-out + anti-join + doc reassembly."""
    from harmonize_search_analyze_spark.operators.dedup import (
        substring_dedup,
    )

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 5 == 0)
    return substring_dedup(docs, "doc_id", "text", k=8).orderBy("doc_id")


def _sql_substring_dedup() -> str:
    from harmonize_search_analyze_spark.operators.dedup import (
        substring_dedup_sql,
    )

    inner = substring_dedup_sql(
        "(SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0)",
        "doc_id",
        "text",
        k=8,
    )
    # wrap: the generator's outer select joins three doc_id columns, so a
    # bare ORDER BY doc_id would be ambiguous in DuckDB
    return f"SELECT * FROM ({inner}) final ORDER BY doc_id"


def q_substr_span_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document shared-span clusters — the suffix-array-style
    ExactSubstr extension from "delete later occurrences"
    (``substring_dedup``) to "report who shares what": 8-token windows
    occurring in >= 2 distinct docs merge per-doc into maximal spans
    (gaps-and-islands on the token position), spans cluster by exact
    token-content hash, clusters spanning >= 2 docs return one row per
    member span. Gram agg + one doc-key window shuffle + span-key agg;
    every post-projection frame is sized by the duplicated surface."""
    from harmonize_search_analyze_spark.operators.dedup import (
        substring_span_clusters,
    )

    docs = _t(spark, sf_dir, "documents", spread=True)
    return substring_span_clusters(docs, "doc_id", "text", k=8).orderBy(
        "doc_id", "span_start"
    )


def _sql_substr_span_clusters() -> str:
    from harmonize_search_analyze_spark.operators.dedup import (
        substring_span_clusters_sql,
    )

    inner = substring_span_clusters_sql("documents", "doc_id", "text", k=8)
    return f"SELECT * FROM ({inner}) final ORDER BY doc_id, span_start"


def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source re-weighting (XLM-R/mC4 mixing rule):
    per-source keep rates derived IN-PLAN from source counts with
    alpha=0.5 flattening, applied as the deterministic sampling-hash
    filter. One source-cardinality agg broadcast onto the scan."""
    from harmonize_search_analyze_spark.operators.sampling import (
        temperature_mix,
    )

    docs = _t(spark, sf_dir, "documents")
    return (
        temperature_mix(
            docs, "source", "doc_id", alpha=0.5, out_fraction=0.4
        )
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


def _sql_temperature_mix() -> str:
    from harmonize_search_analyze_spark.operators.sampling import (
        temperature_mix_sql,
    )

    inner = temperature_mix_sql(
        "documents", "source", "doc_id", ["doc_id", "source"], "duckdb",
        alpha=0.5, out_fraction=0.4,
    )
    return f"SELECT * FROM ({inner}) final ORDER BY doc_id"


_MIX_RATES = {"src0": 1.0, "src1": 0.5, "src2": 0.25}


def q_mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain mixing: per-source deterministic downsampling rates (the
    training-mix knob) — map-only hash-threshold filter, no shuffle."""
    from harmonize_search_analyze_spark.operators.sampling import mix_sources

    docs = _t(spark, sf_dir, "documents")
    return (
        mix_sources(docs, "source", _MIX_RATES, "doc_id", default_rate=0.1)
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


def _sql_mix_sources() -> str:
    from harmonize_search_analyze_spark.operators.sampling import (
        mix_sources_sql,
    )

    return (
        mix_sources_sql(
            "documents", "source", _MIX_RATES, "doc_id",
            ["doc_id", "source"], "duckdb", default_rate=0.1,
        )
        + " ORDER BY doc_id"
    )


def q_vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-design statistic: top-50 corpus vocabulary with counts,
    frequency, and cumulative coverage of all token occurrences."""
    from harmonize_search_analyze_spark.operators.text import vocab_build

    docs = _t(spark, sf_dir, "documents")
    return vocab_build(docs, "text", k=50)


def _sql_vocab_build() -> str:
    from harmonize_search_analyze_spark.operators.text import vocab_build_sql

    return vocab_build_sql("documents", "text", "duckdb", k=50)


def q_ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus bigrams (BPE-merge / collocation raw statistic):
    explode -> hash agg -> TakeOrdered."""
    from harmonize_search_analyze_spark.operators.text import ngram_counts

    docs = _t(spark, sf_dir, "documents")
    return ngram_counts(docs, "text", n=2, k=20)


def _sql_ngram_counts() -> str:
    from harmonize_search_analyze_spark.operators.text import ngrams_sql

    grams = ngrams_sql("text", "duckdb", 2)
    return f"""
SELECT ngram, COUNT(*) AS occurrences FROM (
  SELECT unnest({grams}) AS ngram FROM documents WHERE text IS NOT NULL
) t
GROUP BY ngram ORDER BY occurrences DESC, ngram ASC LIMIT 20
"""


def q_multi_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES multi_match (best_fields): one query string matched across
    several fields, OR-combined in filter context — exact term equality on
    not_analyzed columns, phrase-prefix on .split fields."""
    ast = {
        "multi_match": {
            "query": "F",
            "fields": ["o_orderstatus", "o_orderpriority.split"],
        }
    }
    o = _t(spark, sf_dir, "orders")
    return (
        o.where(compile_query(ast))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy("o_orderstatus")
    )


def _sql_multi_match() -> str:
    from harmonize_search_analyze_spark.functions.tokenize import (
        phrase_prefix_regex,
    )

    pat = phrase_prefix_regex("F")
    return f"""
SELECT o_orderstatus, COUNT(*) AS doc_count FROM orders
WHERE o_orderstatus = 'F'
   OR regexp_matches(LOWER(o_orderpriority), '{pat}')
GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


_UPSAMPLE_RATES = {"src0": 2.5, "src1": 0.5, "src2": 1.0}


def q_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-repeat upsampling: per-source repeat rates (2.5x books style),
    deterministic fractional epochs via the sampling hash — map-only."""
    from harmonize_search_analyze_spark.operators.sampling import (
        upsample_sources,
    )

    docs = _t(spark, sf_dir, "documents")
    return (
        upsample_sources(
            docs, "source", _UPSAMPLE_RATES, "doc_id", default_rate=1.0
        )
        .select("doc_id", "source", "epoch")
        .orderBy("doc_id", "epoch")
    )


def _sql_upsample() -> str:
    from harmonize_search_analyze_spark.operators.sampling import (
        upsample_sources_sql,
    )

    return (
        upsample_sources_sql(
            "documents", "source", _UPSAMPLE_RATES, "doc_id",
            ["doc_id", "source"], "duckdb", default_rate=1.0,
        )
        + " ORDER BY doc_id, epoch"
    )


def q_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC search (Jégou et al. 2011): 8 subspaces x
    16-entry deterministic refs codebooks, one Arrow encode stage, codegen'd
    lookup-sum scoring, TakeOrdered top-10 by approximate L2. The full
    codebook->encode->ADC path is replayed in SQL by the oracle."""
    from harmonize_search_analyze_spark.operators.similarity import (
        pq_refs_codebooks,
        pq_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    ref_ids = [
        r["vec_id"]
        for r in emb.select("vec_id").orderBy("vec_id").limit(16).collect()
    ]
    books = pq_refs_codebooks(emb, ref_ids, m=8)
    return pq_topk(emb, books, _QUERY_VEC, 10)


def _sql_pq_search() -> str:
    from harmonize_search_analyze_spark.operators.similarity import (
        pq_topk_oracle_sql,
    )

    return pq_topk_oracle_sql(_QUERY_VEC, n_refs=16, m=8, k=10)


_PERCOLATE_QUERIES = {
    "big_purchase": {
        "bool": {
            "must": [
                {"match": {"event_type": "purchase"}},
                {"range": {"value": {"gte": 400}}},
            ]
        }
    },
    "any_error": {"match": {"event_type": "error"}},
    "signup_or_view": {"terms": {"event_type": ["signup", "view"]}},
}


def q_percolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES percolator (inverted search): which stored queries fire on each
    event — ALL stored predicates evaluated in ONE codegen'd scan, match
    rows exploded, rolled up to per-query hit counts."""
    from harmonize_search_analyze_spark.plans.compiler import percolate

    ev = _t(spark, sf_dir, "events")
    return (
        percolate(ev, _PERCOLATE_QUERIES, ["event_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy("query_id")
    )


SQL_PERCOLATE = """
SELECT query_id, COUNT(*) AS doc_count FROM (
  SELECT event_id, 'any_error' AS query_id FROM events
  WHERE event_type = 'error'
  UNION ALL
  SELECT event_id, 'big_purchase' FROM events
  WHERE event_type = 'purchase' AND value >= 400
  UNION ALL
  SELECT event_id, 'signup_or_view' FROM events
  WHERE event_type IN ('signup', 'view')
) t GROUP BY query_id ORDER BY query_id
"""


def q_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES search collapse: the single highest-value event per event_type
    (one window shuffle on the collapse key, ties pinned by event_id)."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        collapse,
    )

    ev = _t(spark, sf_dir, "events")
    return collapse(
        ev, "event_type", "value", k=10, tie_col="event_id"
    ).select("event_type", "event_id", F.round("value", 6).alias("value"))


SQL_COLLAPSE = """
SELECT event_type, event_id, ROUND(value, 6) AS value FROM (
  SELECT event_type, event_id, value, ROW_NUMBER() OVER (
    PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS rn
  FROM events WHERE event_type IS NOT NULL
) t WHERE rn = 1
ORDER BY value DESC, event_type ASC LIMIT 10
"""


def q_pq_search_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + PQ: coarse inverted lists prune to nprobe=4 of 16 cells, then
    PQ/ADC scores only the survivors — the two-level 100 TB ANN shape,
    replayed end-to-end (coarse assign, probe, encode, ADC) by the oracle.
    """
    from harmonize_search_analyze_spark.operators.similarity import (
        ivf_assign,
        pq_refs_codebooks,
        pq_topk_ivf,
    )

    emb = _t(spark, sf_dir, "embeddings")
    coarse, assignments = ivf_assign(emb, n_centroids=16)
    ref_ids = [
        r["vec_id"]
        for r in emb.select("vec_id").orderBy("vec_id").limit(16).collect()
    ]
    books = pq_refs_codebooks(emb, ref_ids, m=8)
    return pq_topk_ivf(
        emb, coarse, assignments, books, _QUERY_VEC, k=10, nprobe=4
    )


def _sql_pq_search_ivf() -> str:
    from harmonize_search_analyze_spark.operators.similarity import (
        pq_topk_ivf_oracle_sql,
    )

    return pq_topk_ivf_oracle_sql(
        _QUERY_VEC, n_coarse=16, nprobe=4, n_refs=16, m=8, k=10
    )


def q_geo_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES geo_line: per-event-type track of synthesized coordinates
    ordered by event_id (first 50 points) — one bounded hash agg.

    The library operator returns the track as ``array<array<double>>``;
    the gated query serializes it to one pipe-joined ``lon,lat`` string
    (fixed %.2f — the synthesized coords are exact centi-degrees) so the
    driver's canonicalizer can sort/hash the column. Same lesson as the
    round-1 HUGEINT/DECIMAL casts, applied to arrays."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        geo_line,
    )

    ev = (
        _t(spark, sf_dir, "events")
        .withColumn(
            "lat",
            F.expr("(CAST(event_id % 18000 AS DOUBLE) / 100.0) - 90.0"),
        )
        .withColumn(
            "lon",
            F.expr("(CAST(user_id % 36000 AS DOUBLE) / 100.0) - 180.0"),
        )
    )
    track = geo_line(
        ev, "event_type", "lat", "lon", "event_id", max_points=50
    )
    return track.withColumn(
        "line",
        F.expr(
            "array_join(transform(line,"
            " p -> format_string('%.2f,%.2f', p[0], p[1])), '|')"
        ),
    )


SQL_GEO_LINE = """
WITH pts AS (
  SELECT event_type,
         event_id,
         [(CAST(user_id % 36000 AS DOUBLE) / 100.0) - 180.0,
          (CAST(event_id % 18000 AS DOUBLE) / 100.0) - 90.0] AS p,
         ROW_NUMBER() OVER (
           PARTITION BY event_type ORDER BY event_id ASC) AS rn
  FROM events WHERE event_type IS NOT NULL
)
SELECT event_type,
       array_to_string(
         list_transform(list(p ORDER BY event_id ASC),
                        q -> printf('%.2f,%.2f', q[1], q[2])),
         '|') AS line,
       CAST(COUNT(*) AS INT) AS n_points
FROM pts WHERE rn <= 50
GROUP BY event_type ORDER BY event_type
"""


def q_frequent_item_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES frequent_item_sets (size-2, exact): token pairs co-occurring in
    >= 60% of documents — per-doc distinct explode, within-doc pair join,
    support filter."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        frequent_item_sets,
    )

    docs = _t(spark, sf_dir, "documents")
    items = docs.select(
        "doc_id", F.explode(F.expr(
            "array_distinct(filter(split(lower(text), '[^a-z0-9]+'), "
            "t -> length(t) >= 5))"
        )).alias("token"),
    )
    return frequent_item_sets(
        items, "token", "doc_id", min_support=0.6, k=15
    )


SQL_FREQUENT_ITEM_SETS = """
WITH items AS (
  SELECT DISTINCT doc_id,
         unnest(list_distinct(list_filter(
           regexp_split_to_array(lower(text), '[^a-z0-9]+'),
           t -> length(t) >= 5))) AS item
  FROM documents WHERE text IS NOT NULL
),
n AS (SELECT COUNT(DISTINCT doc_id) AS g FROM items)
SELECT a.item AS item_a, b.item AS item_b,
       COUNT(*) AS doc_count,
       ROUND(COUNT(*) / (SELECT CAST(g AS DOUBLE) FROM n), 6) AS support
FROM items a JOIN items b ON a.doc_id = b.doc_id AND a.item < b.item
GROUP BY a.item, b.item
HAVING support >= 0.6
ORDER BY doc_count DESC, item_a ASC, item_b ASC
LIMIT 15
"""


def q_corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card summary row: doc/char/token totals, average length,
    majority language, exact duplicate rate — one scan lineage, the
    count-distinct kept OUT of the main agg (Expand-plan cliff)."""
    from harmonize_search_analyze_spark.operators.curation import (
        corpus_profile,
    )

    docs = _t(spark, sf_dir, "documents")
    return corpus_profile(docs, "text", "lang")


def _sql_corpus_profile() -> str:
    from harmonize_search_analyze_spark.operators.text import (
        token_count_sql,
    )

    tok = token_count_sql("text", "duckdb")
    return f"""
WITH ok AS (SELECT * FROM documents WHERE text IS NOT NULL),
base AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(LENGTH(text)) AS BIGINT) AS n_chars,
         CAST(SUM({tok}) AS BIGINT) AS n_tokens,
         ROUND(AVG({tok}), 6) AS avg_tokens
  FROM ok
),
lang_top AS (
  SELECT lang AS top_lang, CAST(COUNT(*) AS BIGINT) AS top_lang_docs
  FROM ok GROUP BY lang ORDER BY COUNT(*) DESC, lang ASC LIMIT 1
),
uniq AS (
  SELECT CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique FROM ok
)
SELECT base.*, lang_top.*, uniq.n_unique,
       ROUND((n_docs - n_unique) / CAST(n_docs AS DOUBLE), 6) AS dup_rate
FROM base CROSS JOIN lang_top CROSS JOIN uniq
"""


_FUNNEL_STEPS_SQL = [
    ("view", "event_type = 'view'"),
    ("click", "event_type = 'click'"),
    ("purchase", "event_type = 'purchase'"),
]


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view->click->purchase per user: conditional-MIN step
    timestamps in ONE user-keyed agg, ordered-reach cascade on the result.
    """
    from harmonize_search_analyze_spark.operators.analytics import funnel

    ev = _t(spark, sf_dir, "events")
    steps = [
        (name, F.expr(pred)) for name, pred in _FUNNEL_STEPS_SQL
    ]
    return funnel(ev, steps)


def _sql_funnel() -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        funnel_sql,
    )

    return funnel_sql("events", _FUNNEL_STEPS_SQL)


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: first-seen week x activity-week
    offset, distinct users, pct of cohort — two hash aggs, bounded by the
    time range."""
    from harmonize_search_analyze_spark.operators.analytics import (
        cohort_retention,
    )

    ev = _t(spark, sf_dir, "events")
    return cohort_retention(ev, period="week", max_offset=8)


def _sql_cohort_retention() -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        cohort_retention_sql,
    )

    return cohort_retention_sql("events", period="week", max_offset=8)


def q_rate_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event-rate anomaly flags: bucket counts z-scored against the
    whole series (|z| >= 1.5 flags) — two bounded passes, no unbounded
    windows."""
    from harmonize_search_analyze_spark.operators.analytics import (
        rate_anomalies,
    )

    ev = _t(spark, sf_dir, "events")
    return rate_anomalies(ev, interval="1 day", threshold=1.5)


def _sql_rate_anomalies() -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        rate_anomalies_sql,
    )

    return rate_anomalies_sql("events", threshold=1.5)


def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training (Sennrich et al. 2016) on the corpus: one
    corpus-scale word-count pass, then vocab-sized merge iterations with
    pinned tie-breaks. Iterative like kmeans_ivf — rows-only gate; the
    returned merge table IS the learned tokenizer model, joined with the
    encoded corpus totals as a self-consistency check."""
    from harmonize_search_analyze_spark.operators.bpe import (
        bpe_encode,
        bpe_train,
    )

    docs = _t(spark, sf_dir, "documents")
    merges = bpe_train(docs, "text", n_merges=12)
    enc = bpe_encode(docs, merges, "text", "doc_id")
    totals = enc.agg(
        F.sum("n_bpe_tokens").alias("corpus_bpe_tokens")
    ).collect()[0]
    rows = [
        (i, left, right, left + right, int(totals["corpus_bpe_tokens"]))
        for i, (left, right) in enumerate(merges)
    ]
    return _lf(
        spark,
        rows,
        "merge_idx INT, left STRING, right STRING, merged STRING, "
        "corpus_bpe_tokens BIGINT",
    )


def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first BPE training iteration made SQL-expressible: weighted
    adjacent-symbol pair counts over the corpus word-frequency table
    (chars + the </w> end-of-word marker), top-30 with pinned ties — the
    driver-hashable oracle twin of the iterative ``bpe_train`` merge loop
    (whose sequential argmax-recount has no SQL expression). Identical
    tokenization and symbolization to operators/bpe.py's word-count pass."""
    from harmonize_search_analyze_spark.operators.text import tokens_sql

    docs = _t(spark, sf_dir, "documents")
    words = (
        docs.where(F.col("text").isNotNull())
        .select(
            F.explode(F.expr(tokens_sql("text", "spark"))).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("weight"))
    )
    syms = words.select(
        "weight",
        F.expr("concat(split(word, ''), array('</w>'))").alias("s"),
    )
    pairs = syms.select(
        "weight",
        F.explode(F.expr(
            "transform(sequence(0, size(s) - 2),"
            " i -> struct(s[i] AS l, s[i + 1] AS r))"
        )).alias("p"),
    )
    return (
        pairs.groupBy(
            F.col("p.l").alias("left"), F.col("p.r").alias("right")
        )
        .agg(F.sum("weight").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "left", "right")
        .limit(30)
    )


SQL_BPE_PAIR_COUNTS = """
WITH words AS (
  SELECT word, COUNT(*) AS weight FROM (
    SELECT unnest(list_filter(
             regexp_split_to_array(lower(text), '[^a-z0-9]+'),
             t -> t != '')) AS word
    FROM documents WHERE text IS NOT NULL
  ) GROUP BY word
), syms AS (
  SELECT weight, list_concat(string_split(word, ''), ['</w>']) AS s
  FROM words
), pairs AS (
  SELECT weight, s[i] AS l, s[i + 1] AS r
  FROM syms, LATERAL (SELECT unnest(range(1, len(s))) AS i) idx
)
SELECT l AS "left", r AS "right",
       CAST(SUM(weight) AS BIGINT) AS pair_count
FROM pairs GROUP BY l, r
ORDER BY pair_count DESC, "left", "right" LIMIT 30
"""


def q_date_histogram_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES date_histogram with min_doc_count=0: hourly buckets over a
    sparse slice of events (1 user in 731) — quiet buckets EMIT with
    doc_count 0 across the [min, max] span (the Kibana gap contract)."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        date_histogram,
    )

    ev = _t(spark, sf_dir, "events").where(F.col("user_id") % 731 == 0)
    return date_histogram(ev, "ts", "1 hour", min_doc_count=0)


SQL_DATE_HISTOGRAM_GAPS = """
WITH counts AS (
  SELECT to_timestamp(CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600)
           AS bucket,
         COUNT(*) AS doc_count
  FROM events WHERE ts IS NOT NULL AND user_id % 731 = 0
  GROUP BY bucket
),
grid AS (
  SELECT unnest(generate_series((SELECT MIN(bucket) FROM counts),
                                (SELECT MAX(bucket) FROM counts),
                                INTERVAL 1 HOUR)) AS bucket
)
SELECT CAST(grid.bucket AS TIMESTAMP) AS bucket,
       COALESCE(counts.doc_count, 0) AS doc_count
FROM grid LEFT JOIN counts ON grid.bucket = counts.bucket
ORDER BY bucket
"""


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means-blocked embedding dedup —
    within-cluster cosine >= 0.35 pairs resolved to duplicate groups
    (threshold tuned to the synthetic corpus's cosine range so groups
    actually form at sf0.01),
    lowest id kept. Cluster -> pair -> components replayed exactly by a
    recursive-CTE oracle."""
    from harmonize_search_analyze_spark.operators.similarity import (
        semantic_dedup,
    )

    emb = _t(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, n_centroids=16, threshold=0.35)


def _sql_semantic_dedup() -> str:
    from harmonize_search_analyze_spark.operators.similarity import (
        semantic_dedup_oracle_sql,
    )

    return semantic_dedup_oracle_sql(n_centroids=16, threshold=0.35)


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted sampling without replacement (Efraimidis–Spirakis
    A-ES): 50 documents drawn proportionally to n_chars — map-only
    priority + TakeOrdered, deterministic and engine-replayable."""
    from harmonize_search_analyze_spark.operators.sampling import (
        weighted_sample,
    )

    docs = _t(spark, sf_dir, "documents")
    return (
        weighted_sample(docs, "n_chars", 50, "doc_id")
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


def _sql_weighted_sample() -> str:
    from harmonize_search_analyze_spark.operators.sampling import (
        weighted_sample_sql,
    )

    pri = weighted_sample_sql("doc_id", "n_chars", "duckdb")
    return f"""
SELECT doc_id, source FROM (
  SELECT doc_id, source, ROUND({pri}, 12) AS pri
  FROM documents WHERE n_chars > 0
  ORDER BY pri DESC, doc_id ASC LIMIT 50
) t ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# round-3 additions: pipeline-agg completions, compound query DSL,
# incremental/fuzzy dedup, quality-bucketed sampling
# ---------------------------------------------------------------------------


def q_cumulative_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES cumulative_cardinality pipeline agg: distinct users to date per
    day — exact via the first-occurrence trick (one value-keyed shuffle +
    a bucket-level window), not ES's HLL-sketch stack."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        cumulative_cardinality,
    )

    return cumulative_cardinality(
        _t(spark, sf_dir, "events"), "ts", "user_id", interval="1 day"
    )


SQL_CUMULATIVE_CARDINALITY = """
WITH base AS (
  SELECT ts, user_id FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL
), counts AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
         COUNT(*) AS doc_count
  FROM base GROUP BY 1
), firsts AS (
  SELECT CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP) AS bucket
  FROM base GROUP BY user_id
), news AS (
  SELECT bucket, COUNT(*) AS new_vals FROM firsts GROUP BY bucket
)
SELECT c.bucket, c.doc_count,
       CAST(SUM(COALESCE(n.new_vals, 0)) OVER (
         ORDER BY c.bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS cumulative_cardinality
FROM counts c LEFT JOIN news n ON n.bucket = c.bucket
ORDER BY c.bucket
"""


def q_change_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES change_point agg: the most likely step change in the daily event
    count series — argmax over split-point mean differences, all from one
    running-sum window over the bucket frame."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        change_point,
        date_histogram,
    )

    daily = date_histogram(_t(spark, sf_dir, "events"), "ts", "1 day")
    return change_point(daily, "bucket", "doc_count", min_segment=3)


SQL_CHANGE_POINT = """
WITH b AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
         COUNT(*) AS doc_count
  FROM events WHERE ts IS NOT NULL GROUP BY 1
), s AS (
  SELECT bucket,
         ROW_NUMBER() OVER (ORDER BY bucket) AS i,
         SUM(CAST(doc_count AS DOUBLE)) OVER (
           ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS run,
         SUM(CAST(doc_count AS DOUBLE)) OVER () AS total,
         COUNT(*) OVER () AS n,
         LEAD(bucket, 1) OVER (ORDER BY bucket) AS nxt
  FROM b
)
SELECT nxt AS change_bucket,
       ROUND(run / i, 6) AS mean_before,
       ROUND((total - run) / (n - i), 6) AS mean_after,
       ROUND(ABS((total - run) / (n - i) - run / i), 6) AS step_size
FROM s WHERE i >= 3 AND i <= n - 3
ORDER BY step_size DESC, change_bucket ASC LIMIT 1
"""


def q_moving_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES moving_percentiles pipeline agg: exact trailing-7-bucket median
    of the daily event count (linear interpolation, both engines)."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        date_histogram,
        moving_percentiles,
    )

    daily = date_histogram(_t(spark, sf_dir, "events"), "ts", "1 day")
    return moving_percentiles(
        daily, "bucket", "doc_count", window=7, percentile=0.5, shift=1
    )


SQL_MOVING_PERCENTILES = """
WITH b AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
         COUNT(*) AS doc_count
  FROM events WHERE ts IS NOT NULL GROUP BY 1
)
SELECT bucket, doc_count,
       ROUND(quantile_cont(doc_count, 0.5) OVER (
         ORDER BY bucket ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
       ), 6) AS moving_pct
FROM b ORDER BY bucket
"""


def q_multi_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES multi_terms agg: top (lang, source) composite buckets by doc
    count — one groupBy on the pair, count DESC / keys ASC tie-break."""
    from harmonize_search_analyze_spark.operators.aggregations import terms_multi

    return terms_multi(_t(spark, sf_dir, "documents"), ["lang", "source"], k=15)


SQL_MULTI_TERMS = """
SELECT lang, source, COUNT(*) AS doc_count FROM documents
WHERE lang IS NOT NULL AND source IS NOT NULL
GROUP BY lang, source
ORDER BY doc_count DESC, lang ASC, source ASC LIMIT 15
"""


_TERMS_SET_AST = {
    "terms_set": {
        "text.split": {
            "terms": ["merge", "vector", "stream"],
            "minimum_should_match": 2,
        }
    }
}


def q_terms_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES terms_set query: documents containing at least 2 of the 3 query
    terms as full tokens — a sum of boolean ints in one codegen'd
    projection, no explode."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.where(F.col("text").isNotNull())
        .where(compile_query(_TERMS_SET_AST))
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


def _sql_terms_set() -> str:
    from harmonize_search_analyze_spark.functions.tokenize import phrase_regex

    flags = " + ".join(
        f"(CASE WHEN regexp_matches(LOWER(text), '{phrase_regex(t)}') "
        "THEN 1 ELSE 0 END)"
        for t in _TERMS_SET_AST["terms_set"]["text.split"]["terms"]
    )
    return f"""
SELECT doc_id, lang FROM documents
WHERE text IS NOT NULL AND ({flags}) >= 2
ORDER BY doc_id
"""


def q_function_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES function_score + field_value_factor: filter lang='en', score
    2.0 * log10(1 + 0.1*n_chars), top 10 — constant-score base times the
    field function, TakeOrderedAndProject top-k."""
    from harmonize_search_analyze_spark.operators.ranking import function_score

    docs = _t(spark, sf_dir, "documents")
    return function_score(
        docs,
        F.col("lang") == F.lit("en"),
        "n_chars",
        modifier="log1p",
        factor=0.1,
        weight=2.0,
        k=10,
    )


def _sql_function_score() -> str:
    from harmonize_search_analyze_spark.operators.ranking import (
        field_value_factor_sql,
    )

    score = field_value_factor_sql(
        "n_chars", modifier="log1p", factor=0.1, weight=2.0
    )
    return f"""
SELECT doc_id, n_chars, {score} AS score FROM documents
WHERE lang = 'en' ORDER BY score DESC, doc_id ASC LIMIT 10
"""


_COMPOUND_AST = {
    "bool": {
        "filter": [
            {
                "dis_max": {
                    "queries": [
                        {"term": {"event_type": "click"}},
                        {"prefix": {"event_type": "sign"}},
                    ]
                }
            },
            {
                "boosting": {
                    "positive": {"exists": {"field": "user_id"}},
                    "negative": {"term": {"event_type": "error"}},
                    "negative_boost": 0.5,
                }
            },
        ]
    }
}


def q_compound_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES compound queries (dis_max + boosting) in filter context: dis_max
    matches if any clause does; boosting filters only by its positive
    clause (negative just demotes scores)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.where(compile_query(_COMPOUND_AST))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy("event_type")
    )


SQL_COMPOUND_SEARCH = """
SELECT event_type, COUNT(*) AS doc_count FROM events
WHERE (event_type = 'click' OR event_type LIKE 'sign%')
  AND user_id IS NOT NULL
GROUP BY event_type ORDER BY event_type
"""


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact dedup: the src1 batch anti-joined against the
    digest set of every other source, canonicalized within the batch."""
    from harmonize_search_analyze_spark.operators.dedup import incremental_dedup

    docs = _t(spark, sf_dir, "documents")
    batch = docs.where(F.col("source") == F.lit("src1"))
    corpus = docs.where(F.col("source") != F.lit("src1"))
    return incremental_dedup(batch, corpus, "doc_id", "text")


SQL_INCREMENTAL_DEDUP = """
WITH batch AS (
  SELECT doc_id, MD5(LOWER(TRIM(text))) AS text_hash
  FROM documents WHERE source = 'src1'
), seen AS (
  SELECT DISTINCT MD5(LOWER(TRIM(text))) AS text_hash
  FROM documents WHERE source <> 'src1'
)
SELECT b.text_hash, MIN(b.doc_id) AS keep_id, COUNT(*) AS n_copies
FROM batch b
WHERE NOT EXISTS (SELECT 1 FROM seen s WHERE s.text_hash = b.text_hash)
GROUP BY b.text_hash
"""


def q_fuzzy_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy benchmark decontamination: corpus docs whose token-set Jaccard
    with any benchmark doc (every 97th id) clears 0.9, via the cross-corpus
    MinHash band join — the benchmark band frame broadcasts."""
    from harmonize_search_analyze_spark.operators.contamination import (
        fuzzy_decontaminate,
    )

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 97 != 0)
    bench = docs.where(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    return fuzzy_decontaminate(
        corpus, bench, threshold=0.9, k=8, n=1, rows_per_band=4
    ).orderBy("doc_id", "bench_id")


def _sql_fuzzy_decontaminate() -> str:
    from harmonize_search_analyze_spark.functions.hashing import (
        hash64_sql,
        minhash_params,
        minhash_term_sql,
    )
    from harmonize_search_analyze_spark.operators.dedup import (
        jaccard_sql,
        shingles_sql,
    )

    sh = shingles_sql("text", "duckdb", 1)
    mh = [
        f"list_min(list_transform({sh}, s -> "
        f"{minhash_term_sql(hash64_sql('s', 'duckdb'), a, b)})) AS mh_{i}"
        for i, (a, b) in enumerate(minhash_params(8))
    ]

    def bands(src: str, idc: str) -> str:
        # 2 bands x 4 rows: candidate threshold ~(1/2)^(1/4) ~ 0.84,
        # tuned to the 0.9 verify threshold (mirrors the Spark side)
        return " UNION ALL ".join(
            f"SELECT {idc}, {bi} AS band_idx, "
            + " || '_' || ".join(
                f"CAST(mh_{4 * bi + r} AS VARCHAR)" for r in range(4)
            )
            + f" AS band_key FROM {src}"
            for bi in range(2)
        )

    j = jaccard_sql("sc.shingles", "sb.shingles", "duckdb")
    return f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0
), bench AS (
  SELECT doc_id AS bench_id, text FROM documents WHERE doc_id % 97 = 0
), sig_c AS (
  SELECT doc_id, {', '.join(mh)} FROM corpus
), sig_b AS (
  SELECT bench_id, {', '.join(mh)} FROM bench
), bands_c AS ({bands('sig_c', 'doc_id')}),
bands_b AS ({bands('sig_b', 'bench_id')}),
cands AS (
  SELECT DISTINCT c.doc_id, b.bench_id
  FROM bands_c c JOIN bands_b b
    ON c.band_idx = b.band_idx AND c.band_key = b.band_key
), sh_c AS (
  SELECT doc_id, {sh} AS shingles FROM corpus
), sh_b AS (
  SELECT bench_id, {sh} AS shingles FROM bench
)
SELECT doc_id, bench_id, j AS jaccard FROM (
  SELECT cands.doc_id, cands.bench_id, {j} AS j
  FROM cands
  JOIN sh_c sc ON sc.doc_id = cands.doc_id
  JOIN sh_b sb ON sb.bench_id = cands.bench_id
) WHERE j >= 0.9 ORDER BY doc_id, bench_id
"""


_QUALITY_MIX_SPEC = {"cuts": [0.9], "rates": [1.0, 0.2]}


def q_quality_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-bucketed sampling: keep every document scoring >= 0.9 on
    the engine's quality heuristic (the corpus median), a deterministic
    20% of the rest — map-only, one codegen'd filter over the scan."""
    from harmonize_search_analyze_spark.operators.sampling import quality_mix

    docs = _t(spark, sf_dir, "documents")
    return quality_mix(
        docs, "text", "doc_id", **_QUALITY_MIX_SPEC
    ).select("doc_id", "lang", "source", "n_chars")


def _sql_quality_mix() -> str:
    from harmonize_search_analyze_spark.operators.sampling import quality_mix_sql

    return quality_mix_sql(
        "documents",
        "text",
        "doc_id",
        ["doc_id", "lang", "source", "n_chars"],
        "duckdb",
        **_QUALITY_MIX_SPEC,
    )


_TOKEN_BUDGETS = {"src1": 1200, "src2": 600}


def q_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture sampling: admit documents per source in
    deterministic hash order until the source's token budget is exhausted
    (strict cum <= budget; absent sources get the 900-token default)."""
    from harmonize_search_analyze_spark.operators.sampling import (
        token_budget_sample,
    )

    docs = _t(spark, sf_dir, "documents")
    return token_budget_sample(
        docs, "source", _TOKEN_BUDGETS, "doc_id", "text",
        default_budget=900,
    ).select("doc_id", "source", "cum_tokens")


def _sql_token_budget_sample() -> str:
    from harmonize_search_analyze_spark.operators.sampling import (
        token_budget_sample_sql,
    )

    return token_budget_sample_sql(
        "documents", "source", _TOKEN_BUDGETS, "doc_id", "text",
        ["doc_id", "source"], "duckdb", default_budget=900,
    )


def q_percentiles_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES percentiles_bucket sibling pipeline agg: exact interpolated
    percentiles of the daily doc_count across sibling buckets."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        date_histogram,
        percentiles_bucket,
    )

    daily = date_histogram(_t(spark, sf_dir, "events"), "ts", "1 day")
    return percentiles_bucket(
        daily, "doc_count", percents=[25.0, 50.0, 75.0, 95.0]
    )


SQL_PERCENTILES_BUCKET = """
WITH b AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
         COUNT(*) AS doc_count
  FROM events WHERE ts IS NOT NULL GROUP BY 1
)
SELECT CAST(25.0 AS DOUBLE) AS percent,
       ROUND(quantile_cont(doc_count, 0.25), 6) AS value FROM b
UNION ALL SELECT CAST(50.0 AS DOUBLE),
       ROUND(quantile_cont(doc_count, 0.5), 6) FROM b
UNION ALL SELECT CAST(75.0 AS DOUBLE),
       ROUND(quantile_cont(doc_count, 0.75), 6) FROM b
UNION ALL SELECT CAST(95.0 AS DOUBLE),
       ROUND(quantile_cont(doc_count, 0.95), 6) FROM b
ORDER BY percent
"""


def q_bucket_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES bucket_correlation pipeline agg: Pearson r between the daily
    event count and the daily value total over the same buckets."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        bucket_correlation,
    )

    ev = _t(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("doc_count"),
        F.sum("value").alias("sum_value"),
    )
    return bucket_correlation(daily, "doc_count", "sum_value")


SQL_BUCKET_CORRELATION = """
WITH b AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
         COUNT(*) AS doc_count, SUM(value) AS sum_value
  FROM events WHERE ts IS NOT NULL GROUP BY 1
)
SELECT ROUND(corr(doc_count, sum_value), 6) AS correlation,
       CAST(COUNT(*) AS BIGINT) AS n_buckets
FROM b
"""


def q_lsh_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MinHash dedup: ingest sampled docs < 250 as the corpus
    state, then dedup the later batch against it (and within itself)
    using only stored signatures — estimator-verified (7/8 agreeing
    components), never re-reading earlier text. Same 1-in-10 sample as
    lsh_near_dup: the synthetic corpus's quadratic true-pair density
    makes full-corpus pair emission the whole query otherwise."""
    from harmonize_search_analyze_spark.operators.dedup import lsh_incremental

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 10 == 0)
    b1 = docs.where(F.col("doc_id") < 250)
    b2 = docs.where(F.col("doc_id") >= 250)
    _, state = lsh_incremental(b1, None, "doc_id", "text", n=1)
    dups, _ = lsh_incremental(
        b2, state, "doc_id", "text", n=1, est_threshold=0.875
    )
    return dups.orderBy("id_new", "id_prior")


def _sql_lsh_incremental() -> str:
    from harmonize_search_analyze_spark.functions.hashing import (
        hash64_sql,
        minhash_params,
        minhash_term_sql,
    )
    from harmonize_search_analyze_spark.operators.dedup import shingles_sql

    sh = shingles_sql("text", "duckdb", 1)
    mh = [
        f"list_min(list_transform({sh}, s -> "
        f"{minhash_term_sql(hash64_sql('s', 'duckdb'), a, b)})) AS mh_{i}"
        for i, (a, b) in enumerate(minhash_params(8))
    ]
    bands = " UNION ALL ".join(
        f"SELECT doc_id, {bi} AS band_idx, "
        f"CAST(mh_{2 * bi} AS VARCHAR) || '_' || CAST(mh_{2 * bi + 1} AS VARCHAR) "
        f"AS band_key FROM sigs"
        for bi in range(4)
    )
    est = " + ".join(
        f"(CASE WHEN l.mh_{i} = r.mh_{i} THEN 1 ELSE 0 END)"
        for i in range(8)
    )
    return f"""
WITH sigs AS (
  SELECT doc_id, {', '.join(mh)} FROM documents WHERE doc_id % 10 = 0
), bands AS ({bands}),
cands AS (
  SELECT DISTINCT l.doc_id AS id_new, r.doc_id AS id_prior
  FROM bands l JOIN bands r
    ON l.band_idx = r.band_idx AND l.band_key = r.band_key
  WHERE l.doc_id >= 250
    AND (r.doc_id < 250 OR (r.doc_id >= 250 AND l.doc_id < r.doc_id))
)
SELECT id_new, id_prior,
       ROUND(({est}) / 8.0, 6) AS est_jaccard
FROM cands
JOIN sigs l ON l.doc_id = id_new
JOIN sigs r ON r.doc_id = id_prior
WHERE ({est}) / 8.0 >= 0.875
ORDER BY id_new, id_prior
"""


_GEO_SEARCH_AST = {
    "bool": {
        "filter": [
            {
                "geo_bounding_box": {
                    "top_left": {"lat": 60.0, "lon": -120.0},
                    "bottom_right": {"lat": -60.0, "lon": 120.0},
                }
            },
            {
                "geo_distance": {
                    "distance": "7000km",
                    "origin": {"lat": 0.0, "lon": 0.0},
                }
            },
        ]
    }
}


def q_geo_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES geo filter queries (the Kibana map's pan/zoom + radius filters):
    geo_bounding_box AND geo_distance compiled to one pushed-down
    predicate, then the geohash_grid panel over the survivors."""
    df = _t(spark, sf_dir, "lineitem").selectExpr(
        f"{_LAT_EXPR} AS lat", f"{_LON_EXPR} AS lon"
    )
    gh = geohash_encode_sql("lat", "lon", precision=2)
    return (
        df.where(compile_query(_GEO_SEARCH_AST))
        .select(F.expr(gh).alias("geohash"))
        .groupBy("geohash")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy(F.desc("doc_count"), F.asc("geohash"))
        .limit(20)
    )


def _sql_geo_search() -> str:
    from harmonize_search_analyze_spark.operators.aggregations import (
        haversine_sql,
    )

    gh = geohash_encode_sql("lat", "lon", precision=2)
    d = haversine_sql("lat", "lon", (0.0, 0.0))
    return f"""
WITH pts AS (
  SELECT {_LAT_EXPR} AS lat, {_LON_EXPR} AS lon FROM lineitem
)
SELECT {gh} AS geohash, COUNT(*) AS doc_count FROM pts
WHERE lat <= 60.0 AND lat >= -60.0
  AND lon >= -120.0 AND lon <= 120.0
  AND {d} <= 7000000.0
GROUP BY 1 ORDER BY doc_count DESC, geohash ASC LIMIT 20
"""


def q_mrl_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncate-then-rerank ANN: shortlist 40 by cosine over
    the first 16 of 64 dims, rerank the shortlist full-width, top 10."""
    from harmonize_search_analyze_spark.operators.similarity import mrl_topk

    return mrl_topk(
        _t(spark, sf_dir, "embeddings"), "embedding", _QUERY_VEC,
        dims=16, k=10, oversample=4,
    )


def _sql_mrl_topk() -> str:
    from harmonize_search_analyze_spark.operators.similarity import (
        mrl_topk_oracle_sql,
    )

    return mrl_topk_oracle_sql(_QUERY_VEC, dims=16, k=10, oversample=4)


def q_simple_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES never-throws grammar trio — simple_query_string (phrase, prefix,
    prohibit units), match_bool_prefix (terms anywhere + last-prefix), and
    combined_fields (term-centric multi-field) — OR-combined in one bool,
    counted per lang. All compile to ONE codegen'd boolean projection of
    sargable regexes: no explode, no join, no shuffle before the agg."""
    from harmonize_search_analyze_spark.plans.compiler import compile_query

    docs = _t(spark, sf_dir, "documents")
    pred = compile_query({
        "bool": {
            "should": [
                {"simple_query_string": {
                    "query": '"fast table" quer* -widget',
                    "fields": ["text.split"],
                    "default_operator": "or",
                }},
                {"match_bool_prefix": {"text.split": "stream batch wind"}},
                {"combined_fields": {
                    "query": "merge sort",
                    "fields": ["text.split", "lang.split"],
                    "operator": "and",
                }},
            ]
        }
    })
    return (
        docs.where(pred)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy("lang")
    )


def _sql_simple_query() -> str:
    from harmonize_search_analyze_spark.functions.tokenize import (
        phrase_prefix_regex,
        phrase_regex,
    )

    def tok(word_or_phrase: str, prefix: bool = False) -> str:
        pat = (phrase_prefix_regex if prefix else phrase_regex)(word_or_phrase)
        return f"regexp_matches(LOWER(text), '{pat}')"

    sqs = (
        f"(({tok('fast table')} OR {tok('quer', prefix=True)})"
        f" AND NOT {tok('widget')})"
    )
    mbp = (
        f"({tok('stream')} OR {tok('batch')} OR {tok('wind', prefix=True)})"
    )
    cf_merge = (
        f"({tok('merge')} OR regexp_matches(LOWER(lang), "
        f"'{phrase_regex('merge')}'))"
    )
    cf_sort = (
        f"({tok('sort')} OR regexp_matches(LOWER(lang), "
        f"'{phrase_regex('sort')}'))"
    )
    return f"""
SELECT lang, COUNT(*) AS doc_count FROM documents
WHERE {sqs} OR {mbp} OR ({cf_merge} AND {cf_sort})
GROUP BY lang ORDER BY lang
"""


def q_random_sampler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES random_sampler agg: deterministic hash p=0.25 row cut ON the
    scan, terms sub-agg on the survivors, doc_count scaled back by 1/p.
    The shuffle sees only the sampled quarter of the table."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        random_sampler_terms,
    )

    return random_sampler_terms(
        _t(spark, sf_dir, "orders"),
        "o_orderpriority",
        "o_orderkey",
        probability=0.25,
        k=10,
    )


def _sql_random_sampler() -> str:
    from harmonize_search_analyze_spark.operators.aggregations import (
        random_sampler_terms_sql,
    )

    return random_sampler_terms_sql(
        "orders", "o_orderpriority", "o_orderkey", "duckdb",
        probability=0.25, k=10,
    )


def q_diversified_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES diversified_sampler: best 30 documents by length with at most 5
    per source (anti-bias cap), then the terms sub-agg over the sample.
    One window shuffle for the cap + TakeOrdered of survivors."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        diversified_sampler,
    )

    docs = _t(spark, sf_dir, "documents")
    sample = diversified_sampler(
        docs, "source", "n_chars",
        max_docs_per_value=5, shard_size=30, tie_col="doc_id",
    )
    return (
        sample.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy("lang")
    )


def _sql_diversified_terms() -> str:
    return """
WITH capped AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY source ORDER BY n_chars DESC, doc_id ASC
  ) AS rn
  FROM documents
),
sample AS (
  SELECT * FROM capped WHERE rn <= 5
  ORDER BY n_chars DESC, doc_id ASC LIMIT 30
)
SELECT lang, COUNT(*) AS doc_count FROM sample
GROUP BY lang ORDER BY lang
"""


def q_rescore_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES search rescore cascade: top-40 window by the cheap primary score
    (document length), rescored by the expensive distinct-token ratio
    computed ONLY on the window, final = score + 500*rescore, top 10.
    Two TakeOrdered stages — the corpus never sees the expensive term."""
    from harmonize_search_analyze_spark.operators.ranking import rescore

    docs = _t(spark, sf_dir, "documents")
    hits = docs.select(
        "doc_id", F.col("n_chars").cast("double").alias("score"), "text"
    )
    return rescore(
        hits,
        "score",
        "size(array_distinct(split(text, ' '))) / CAST(size(split(text, ' ')) AS DOUBLE)",
        window_size=40,
        query_weight=1.0,
        rescore_query_weight=500.0,
        k=10,
    )


def _sql_rescore_topk() -> str:
    return """
WITH win AS (
  SELECT doc_id, CAST(n_chars AS DOUBLE) AS score,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / len(string_split(text, ' ')) AS rescore
  FROM documents
  ORDER BY n_chars DESC, doc_id ASC LIMIT 40
)
SELECT doc_id, ROUND(score, 6) AS score, ROUND(rescore, 6) AS rescore,
       ROUND(score + 500.0 * rescore, 6) AS final_score
FROM win
ORDER BY ROUND(score + 500.0 * rescore, 6) DESC, doc_id ASC LIMIT 10
"""


def q_search_after(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES search_after keyset pagination: resume the price-sorted list
    from a cursor with a sargable strict-inequality filter + TakeOrdered —
    deep pages cost the same as page one (no OFFSET materialization)."""
    from harmonize_search_analyze_spark.operators.ranking import search_after

    return search_after(
        _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice"),
        "o_totalprice",
        (300000.0, 0),
        id_col="o_orderkey",
        size=10,
    )


def _sql_search_after() -> str:
    return """
SELECT o_orderkey, o_totalprice FROM orders
WHERE o_totalprice < 300000.0
   OR (o_totalprice = 300000.0 AND o_orderkey > 0)
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


def q_bloom_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered incremental dedup (Dolma-style): even-id docs are
    the ingested corpus (folded to a <=256-row bit_or word table), odd-id
    docs the incoming batch. Probe = 5 broadcast word-joins, map-side;
    only the "maybe present" sliver enters the exact anti-join, so the
    result is EXACTLY the anti join (no false negatives by construction)."""
    from harmonize_search_analyze_spark.operators.bloom import bloom_dedup

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    batch = docs.where(F.col("doc_id") % 2 == 1)
    return (
        bloom_dedup(corpus, batch, "text", m_bits=1 << 14)
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


def _sql_bloom_dedup() -> str:
    return """
SELECT b.doc_id, b.source
FROM documents b
WHERE b.doc_id % 2 = 1
  AND NOT EXISTS (
    SELECT 1 FROM documents c
    WHERE c.doc_id % 2 = 0 AND c.text = b.text
  )
ORDER BY b.doc_id
"""


def q_knn_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES filtered kNN: pre-filter (label range via the query compiler)
    then exact top-10 cosine over the survivors — ES's own exact-mode
    dispatch for selective filters. Filter pushes to the scan; scoring is
    one codegen'd projection + TakeOrdered."""
    from harmonize_search_analyze_spark.operators.similarity import (
        knn_filtered,
    )

    emb = _t(spark, sf_dir, "embeddings")
    out = knn_filtered(
        emb, "embedding", _QUERY_VEC,
        {"range": {"label": {"gte": 2, "lte": 6}}},
        k=10,
    )
    return emb.select("vec_id", "label").join(out, "vec_id").select(
        "vec_id", "label", "cosine"
    ).orderBy(F.desc("cosine"), F.asc("vec_id"))


def _sql_knn_filtered() -> str:
    qlit = "[" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in _QUERY_VEC) + "]"
    qnorm = math.sqrt(sum(v * v for v in _QUERY_VEC))
    return f"""
SELECT vec_id, label,
       ROUND(
         list_sum(list_transform(list_zip(embedding::DOUBLE[], {qlit}),
                                 p -> p[1] * p[2]))
         / (sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))
            * {qnorm!r}), 6) AS cosine
FROM embeddings
WHERE label >= 2 AND label <= 6
ORDER BY cosine DESC, vec_id ASC LIMIT 10
"""


_INTERVALS_RULE = {
    "any_of": {"intervals": [
        {"match": {"query": "fast table", "ordered": True, "max_gaps": 2}},
        {"match": {"query": "spark window batch", "ordered": False,
                   "max_gaps": 3}},
    ]}
}


def q_intervals_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES intervals query (position-aware): ordered two-term rule with
    bounded gaps OR an unordered three-term proximity rule, counted per
    lang. Token positions + nested EXISTS in ONE codegen'd projection —
    no explode, no join, no pre-agg shuffle."""
    from harmonize_search_analyze_spark.plans.compiler import compile_query

    docs = _t(spark, sf_dir, "documents")
    pred = compile_query({"intervals": {"text.split": _INTERVALS_RULE}})
    return (
        docs.where(pred)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy("lang")
    )


def _sql_intervals_search() -> str:
    from harmonize_search_analyze_spark.functions.intervals import (
        intervals_sql,
    )

    cond = intervals_sql(_INTERVALS_RULE, "text", "duckdb")
    return f"""
SELECT lang, COUNT(*) AS doc_count FROM documents
WHERE {cond}
GROUP BY lang ORDER BY lang
"""


def q_unimax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax budget sampling (token-weighted, budget=60k chars,
    max_epochs=2): the water-fill allocation runs IN-PLAN as two window
    functions over the 5-row per-lang frame; rows then epoch-explode via
    the deterministic hash sampler. One agg + broadcast join + map."""
    from harmonize_search_analyze_spark.operators.sampling import (
        unimax_sample,
    )

    docs = _t(spark, sf_dir, "documents")
    return (
        unimax_sample(
            docs, "lang", "doc_id",
            budget=60_000.0, weight_col="n_chars", max_epochs=2.0,
        )
        .select("doc_id", "lang", "epoch")
        .orderBy("doc_id", "epoch")
    )


def _sql_unimax() -> str:
    from harmonize_search_analyze_spark.operators.sampling import (
        unimax_sample_sql,
    )

    inner = unimax_sample_sql(
        "documents", "lang", "doc_id", ["doc_id", "lang"], "duckdb",
        budget=60_000.0, weight_col="n_chars", max_epochs=2.0,
    )
    return f"SELECT * FROM ({inner}) u ORDER BY doc_id, epoch"


def q_term_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES term suggester: spell-correct 'spak tabel windoww' against the
    corpus vocabulary (one hash agg, |V| rows), candidates pruned by
    shared first letter + levenshtein <= 2, ranked distance/freq/term.
    suggest_mode=missing: in-vocabulary tokens get no suggestions."""
    from harmonize_search_analyze_spark.operators.ranking import term_suggest

    return term_suggest(
        _t(spark, sf_dir, "documents"), "text", "spak tabel windoww", k=3
    )


def _sql_term_suggest() -> str:
    from harmonize_search_analyze_spark.operators.ranking import (
        term_suggest_sql,
    )

    return term_suggest_sql(
        "documents", "text", "spak tabel windoww", "duckdb", k=3
    )


def q_phrase_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES phrase suggester: whole-phrase correction of 'fast tabel scann'
    ranked by an add-alpha bigram LM over the corpus (two hash aggs),
    per-position candidates from the term-suggester rule, <=125-row
    combination frame scored by broadcast joins."""
    from harmonize_search_analyze_spark.operators.ranking import (
        phrase_suggest,
    )

    return phrase_suggest(
        _t(spark, sf_dir, "documents"), "text", "fast tabel scann", k=5
    )


def _sql_phrase_suggest() -> str:
    from harmonize_search_analyze_spark.operators.ranking import (
        phrase_suggest_sql,
    )

    return phrase_suggest_sql(
        "documents", "text", "fast tabel scann", "duckdb", k=5
    )


_NESTED_AST = {
    "nested": {
        "path": "orders",
        "query": {"bool": {"must": [
            {"term": {"orders.status": "F"}},
            {"range": {"orders.total": {"gt": 250000.0}}},
        ]}},
    }
}


def q_nested_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES nested query: per-customer order arrays (built in-plan via
    sort_array(collect_list(struct))) matched with PER-OBJECT correlation —
    at least one order that is BOTH status F AND total > 250k, which
    flattened fields cannot express. One codegen'd EXISTS lambda."""
    from harmonize_search_analyze_spark.plans.compiler import compile_query

    orders = _t(spark, sf_dir, "orders")
    nested = orders.groupBy("o_custkey").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("o_orderkey").alias("okey"),
                    F.col("o_orderstatus").alias("status"),
                    F.col("o_totalprice").alias("total"),
                )
            )
        ).alias("orders")
    )
    return (
        nested.where(compile_query(_NESTED_AST))
        .select(F.col("o_custkey"), F.size("orders").alias("n_orders"))
        .orderBy("o_custkey")
    )


def _sql_nested_query() -> str:
    from harmonize_search_analyze_spark.plans.compiler import (
        nested_exists_sql,
    )

    cond = nested_exists_sql(
        "orders", _NESTED_AST["nested"]["query"], "duckdb"
    )
    return f"""
WITH nested AS (
  SELECT o_custkey,
         list_sort(list(struct_pack(
           okey := o_orderkey, status := o_orderstatus, total := o_totalprice
         ))) AS orders
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey, CAST(len(orders) AS INT) AS n_orders FROM nested
WHERE {cond}
ORDER BY o_custkey
"""


def q_global_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous global curriculum rank (quality proxy: n_chars DESC,
    doc_id tiebreak) WITHOUT a single-reducer window: range partition,
    parallel per-partition row_number, broadcast per-partition offsets."""
    from harmonize_search_analyze_spark.operators.ordering import (
        global_order,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return global_order(
        docs, ["n_chars", "doc_id"], ascending=False
    ).orderBy("doc_id")


def _sql_global_order() -> str:
    from harmonize_search_analyze_spark.operators.ordering import (
        global_order_sql,
    )

    inner = global_order_sql(
        "documents", ["n_chars", "doc_id"], ["doc_id", "n_chars"],
        ascending=False,
    )
    return f"SELECT * FROM ({inner}) g ORDER BY doc_id"


def q_assign_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split labels (96/2/2) from the
    portable sampling hash — pure map, append-safe, engine-identical."""
    from harmonize_search_analyze_spark.operators.ordering import (
        assign_split,
    )

    docs = _t(spark, sf_dir, "documents")
    return (
        assign_split(
            docs, "doc_id", {"train": 0.96, "val": 0.02, "test": 0.02}
        )
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("split")
    )


def _sql_assign_split() -> str:
    from harmonize_search_analyze_spark.operators.ordering import (
        assign_split_sql,
    )

    inner = assign_split_sql(
        "documents", "doc_id", {"train": 0.96, "val": 0.02, "test": 0.02},
        ["doc_id"], "duckdb",
    )
    return f"""
SELECT split, COUNT(*) AS n_docs FROM ({inner}) s
GROUP BY split ORDER BY split
"""


def q_rank_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _rank_eval API: three 'queries' (en/fr/zh language intents),
    each retrieving the global top-10 docs by length; graded judgments
    derive from language match (2 when the doc's lang equals the intent).
    Per-query precision@10 / recall@10 / MRR / NDCG@10, ES formulas."""
    from harmonize_search_analyze_spark.operators.ranking import rank_eval

    docs = _t(spark, sf_dir, "documents")
    langs = _lf(spark, [("en",), ("fr",), ("zh",)], ["query_id"])
    top10 = (
        docs.select("doc_id", "n_chars")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .limit(10)
    )
    w = Window.orderBy(F.desc("n_chars"), F.asc("doc_id"))
    results = langs.crossJoin(
        top10.withColumn("rank", F.row_number().over(w))
    ).select("query_id", "doc_id", "rank")
    ratings = langs.join(
        docs.select("doc_id", "lang"),
        langs["query_id"] == F.col("lang"),
    ).select("query_id", "doc_id", F.lit(2).alias("rating"))
    return rank_eval(results, ratings, k=10)


def _sql_rank_eval() -> str:
    return """
WITH langs(query_id) AS (VALUES ('en'), ('fr'), ('zh')),
top10 AS (
  SELECT doc_id, ROW_NUMBER() OVER (
    ORDER BY n_chars DESC, doc_id ASC) AS rank
  FROM documents ORDER BY n_chars DESC, doc_id ASC LIMIT 10
),
results AS (
  SELECT l.query_id, t.doc_id, t.rank FROM langs l CROSS JOIN top10 t
),
ratings AS (
  SELECT l.query_id, d.doc_id, 2 AS rating
  FROM langs l JOIN documents d ON d.lang = l.query_id
),
joined AS (
  SELECT r.query_id, r.rank, COALESCE(g.rating, 0) AS rating
  FROM results r LEFT JOIN ratings g
    ON r.query_id = g.query_id AND r.doc_id = g.doc_id
),
per_q AS (
  SELECT query_id, COUNT(*) AS retrieved,
         SUM(CASE WHEN rating >= 1 THEN 1 ELSE 0 END) AS rel_ret,
         MIN(CASE WHEN rating >= 1 THEN rank END) AS first_rel,
         SUM((POW(2.0, rating) - 1) / (LN(rank + 1) / LN(2))) AS dcg
  FROM joined GROUP BY query_id
),
ideal AS (
  SELECT query_id,
         SUM((POW(2.0, rating) - 1) / (LN(irank + 1) / LN(2))) AS idcg
  FROM (
    SELECT query_id, rating, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY rating DESC, doc_id ASC) AS irank
    FROM ratings
  ) x WHERE irank <= 10 GROUP BY query_id
),
totals AS (
  SELECT query_id,
         SUM(CASE WHEN rating >= 1 THEN 1 ELSE 0 END) AS n_rel
  FROM ratings GROUP BY query_id
)
SELECT p.query_id,
       ROUND(CAST(p.rel_ret AS DOUBLE) / p.retrieved, 6) AS precision_k,
       ROUND(CASE WHEN COALESCE(t.n_rel, 0) > 0
                  THEN CAST(p.rel_ret AS DOUBLE) / t.n_rel ELSE 0.0 END, 6)
         AS recall_k,
       ROUND(COALESCE(1.0 / p.first_rel, 0.0), 6) AS mrr,
       ROUND(CASE WHEN COALESCE(i.idcg, 0.0) > 0
                  THEN p.dcg / i.idcg ELSE 0.0 END, 6) AS ndcg_k
FROM per_q p
LEFT JOIN ideal i ON p.query_id = i.query_id
LEFT JOIN totals t ON p.query_id = t.query_id
ORDER BY p.query_id
"""


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard-negative mining: for 15 anchor vectors, the top-4
    most-similar DIFFERENT-label corpus vectors (label filter before the
    rank — top-k over negatives). Anchors broadcast; corpus scanned once;
    rank window carries scores only."""
    from harmonize_search_analyze_spark.operators.similarity import (
        mine_hard_negatives,
    )

    emb = _t(spark, sf_dir, "embeddings")
    return (
        mine_hard_negatives(emb, emb.where("vec_id < 15"), k=4)
        .orderBy("anchor_id", "rank")
    )


def _sql_hard_negatives() -> str:
    from harmonize_search_analyze_spark.operators.similarity import (
        mine_hard_negatives_sql,
    )

    inner = mine_hard_negatives_sql("embeddings", "vec_id < 15", 4, "duckdb")
    return f"SELECT * FROM ({inner}) h ORDER BY anchor_id, rank"


def q_terms_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES terms include.partition paging: enumerate high-cardinality
    terms in bounded pages — partition 1 of 3 by the portable term hash,
    then the page's top-15. Hash compare before the agg, one scan."""
    from harmonize_search_analyze_spark.operators.aggregations import terms

    return terms(
        _t(spark, sf_dir, "customer"), "c_mktsegment", k=15,
        partition=1, num_partitions=3,
    )


def _sql_terms_partition() -> str:
    from harmonize_search_analyze_spark.functions.hashing import hash64_sql

    h = hash64_sql("CAST(c_mktsegment AS VARCHAR)", "duckdb")
    return f"""
SELECT c_mktsegment, COUNT(*) AS doc_count FROM customer
WHERE {h} % 3 = 1 AND c_mktsegment IS NOT NULL
GROUP BY c_mktsegment
ORDER BY doc_count DESC, c_mktsegment ASC LIMIT 15
"""


def q_audio_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal audio plumbing end-to-end with a SQL oracle: wrap each
    doc id in a REAL constant-sample PCM WAV (amplitude int16 value =
    200 + 7*(doc_id % 64), 100 + doc_id % 400 samples at 8 kHz), decode
    it back through the Arrow mapInPandas stage (genuine PCM decode, no
    codec), and aggregate. Constant signals make RMS = peak = v/32768
    EXACTLY, so the oracle predicts every number from doc_id alone."""
    import struct

    from pyspark.sql import types as T

    from harmonize_search_analyze_spark.operators.multimodal import (
        extract_audio_features,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id").repartition(8)
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ])

    def to_wav(batches):
        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                v = 200 + 7 * (did % 64)
                n = 100 + did % 400
                data = struct.pack("<h", v) * n
                payloads.append(
                    b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
                    + b"fmt " + struct.pack(
                        "<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
                    + b"data" + struct.pack("<I", len(data)) + data
                )
            yield pdf.assign(payload=payloads)

    wavs = docs.mapInPandas(to_wav, schema)
    feats = extract_audio_features(wavs)
    return (
        feats.groupBy("n_samples")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("rms"), 6).alias("avg_rms"),
            F.round(F.avg("peak"), 6).alias("avg_peak"),
            F.max("duration_ms").alias("duration_ms"),
        )
        .orderBy("n_samples")
        .limit(50)
    )


def _sql_audio_profile() -> str:
    return """
WITH synth AS (
  SELECT doc_id,
         ROUND((200 + 7 * (doc_id % 64)) / 32768.0, 6) AS rp,
         100 + doc_id % 400 AS n_samples
  FROM documents
)
SELECT n_samples, COUNT(*) AS n_docs,
       ROUND(AVG(rp), 6) AS avg_rms,
       ROUND(AVG(rp), 6) AS avg_peak,
       MAX(CAST(n_samples * 1000 // 8000 AS BIGINT)) AS duration_ms
FROM synth
GROUP BY n_samples ORDER BY n_samples LIMIT 50
"""


_POLYGON = [
    {"lat": 50.0, "lon": -100.0},
    {"lat": 60.0, "lon": 0.0},
    {"lat": 50.0, "lon": 100.0},
    {"lat": -20.0, "lon": 60.0},
    {"lat": -40.0, "lon": 0.0},
    {"lat": -20.0, "lon": -60.0},
]


def q_geo_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES geo_polygon query: crossing-number point-in-ring test as one
    codegen'd arithmetic expression (an O(edges) term per row, no join,
    no UDF), counting lineitem-derived points inside a hexagonal ring."""
    from harmonize_search_analyze_spark.plans.compiler import compile_query

    li = _t(spark, sf_dir, "lineitem")
    pts = li.select(
        F.expr(_LAT_EXPR).alias("lat"), F.expr(_LON_EXPR).alias("lon"),
        "l_returnflag",
    )
    pred = compile_query({"geo_polygon": {"points": _POLYGON}})
    return (
        pts.where(pred)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy("l_returnflag")
    )


def _sql_geo_polygon() -> str:
    from harmonize_search_analyze_spark.plans.compiler import (
        geo_polygon_sql,
    )

    cond = geo_polygon_sql(
        [(p["lat"], p["lon"]) for p in _POLYGON], "lat", "lon"
    )
    return f"""
WITH pts AS (
  SELECT {_LAT_EXPR} AS lat, {_LON_EXPR} AS lon, l_returnflag FROM lineitem
)
SELECT l_returnflag, COUNT(*) AS doc_count FROM pts
WHERE {cond}
GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q_dedup_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-quality evaluation as a first-class operator: precision /
    recall / F1 of a deliberately COARSE LSH candidate set (2 bands of 4
    rows, verify at 0.9, token-set shingles) against the brute
    exact-Jaccard truth at the same threshold, on the 1-in-10 doc
    sample. Recall < 1 here is the
    point — the operator measures the banding dial."""
    from harmonize_search_analyze_spark.operators.dedup import (
        near_dup_pairs_brute,
        near_dup_pairs_lsh,
        pair_metrics,
    )

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 10 == 0)
    cand = near_dup_pairs_lsh(
        docs, "doc_id", "text", threshold=0.9, k=8, n=1, rows_per_band=4
    )
    truth = near_dup_pairs_brute(docs, "doc_id", "text", threshold=0.9, n=1)
    return pair_metrics(cand, truth)


def _sql_dedup_eval() -> str:
    from harmonize_search_analyze_spark.functions.hashing import (
        hash64_sql,
        minhash_params,
        minhash_term_sql,
    )
    from harmonize_search_analyze_spark.operators.dedup import (
        jaccard_sql,
        shingles_sql,
    )

    sh = shingles_sql("text", "duckdb", 1)
    mh = [
        f"list_min(list_transform({sh}, s -> "
        f"{minhash_term_sql(hash64_sql('s', 'duckdb'), a, b)})) AS mh_{i}"
        for i, (a, b) in enumerate(minhash_params(8))
    ]
    bands = " UNION ALL ".join(
        f"SELECT doc_id, {bi} AS band_idx, "
        + " || '_' || ".join(
            f"CAST(mh_{4 * bi + r} AS VARCHAR)" for r in range(4)
        )
        + " AS band_key FROM sigs"
        for bi in range(2)
    )
    j = jaccard_sql("sa.shingles", "sb.shingles", "duckdb")
    return f"""
WITH docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
), sigs AS (
  SELECT doc_id, {', '.join(mh)} FROM docs
), bands AS ({bands}),
rawcand AS (
  SELECT DISTINCT l.doc_id AS id1, r.doc_id AS id2
  FROM bands l JOIN bands r
    ON l.band_idx = r.band_idx AND l.band_key = r.band_key
   AND l.doc_id < r.doc_id
), sh AS (
  SELECT doc_id, {sh} AS shingles FROM docs
), cand AS (
  SELECT id1, id2 FROM (
    SELECT id1, id2, {j} AS jc
    FROM rawcand JOIN sh sa ON sa.doc_id = id1 JOIN sh sb ON sb.doc_id = id2
  ) WHERE jc >= 0.9
), truth AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2 FROM sh a JOIN sh b
    ON a.doc_id < b.doc_id
  WHERE {jaccard_sql('a.shingles', 'b.shingles', 'duckdb')} >= 0.9
), m AS (
  SELECT (SELECT COUNT(*) FROM cand) AS n_candidates,
         (SELECT COUNT(*) FROM truth) AS n_truth,
         (SELECT COUNT(*) FROM cand JOIN truth
            ON cand.id1 = truth.id1 AND cand.id2 = truth.id2) AS tp
)
SELECT CAST(n_candidates AS BIGINT) AS n_candidates,
       CAST(n_truth AS BIGINT) AS n_truth,
       CAST(tp AS BIGINT) AS tp,
       ROUND(CASE WHEN n_candidates > 0
                  THEN CAST(tp AS DOUBLE) / n_candidates ELSE 0.0 END, 6)
         AS precision,
       ROUND(CASE WHEN n_truth > 0
                  THEN CAST(tp AS DOUBLE) / n_truth ELSE 0.0 END, 6)
         AS recall,
       ROUND(CASE WHEN (CASE WHEN n_candidates > 0
                             THEN CAST(tp AS DOUBLE) / n_candidates
                             ELSE 0.0 END
                      + CASE WHEN n_truth > 0
                             THEN CAST(tp AS DOUBLE) / n_truth
                             ELSE 0.0 END) > 0
                  THEN 2 * (CAST(tp AS DOUBLE) / n_candidates)
                         * (CAST(tp AS DOUBLE) / n_truth)
                       / ((CAST(tp AS DOUBLE) / n_candidates)
                          + (CAST(tp AS DOUBLE) / n_truth))
                  ELSE 0.0 END, 6) AS f1
FROM m
"""


def q_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (Xie et al. 2023): hashed unigram+bigram
    bucket distributions for target (lang='en') vs the raw pool, integer
    micro-nat log-ratio weights, Gumbel top-k draw of 60 docs. Two corpus
    scans + one doc-id shuffle; ratio table broadcast; TakeOrdered top-k."""
    from harmonize_search_analyze_spark.operators.dsir import dsir_sample

    # spread=True: two gram-explosion passes dominate the single-row-group
    # scan — the round-robin unlock wins 1.7x here (measured sf0.1)
    return dsir_sample(
        _t(spark, sf_dir, "documents", spread=True), "lang = 'en'", k=60, m=512
    )


def _sql_dsir_sample() -> str:
    from harmonize_search_analyze_spark.operators.dsir import dsir_sample_sql

    return dsir_sample_sql("documents", "lang = 'en'", "duckdb", k=60, m=512)


# -- web-corpus extraction (html/url/domain), CCNet tiers, bucket_script,
# -- ip_prefix ---------------------------------------------------------------

# deterministic raw-HTML synthesis shared verbatim by both dialects (the
# documents table has no markup column; '||' + CAST parse identically)
_HTML_SYNTH = (
    """('<html><head><title>' || source || '</title>"""
    """<style>p{color:red}</style>"""
    """<script type="text/javascript">var x = 1 < 2 && 3 > 2;</script>"""
    """</head><body><!-- nav --><p>' || text || '</p><br>"""
    """<div class="footer">Contact: admin@example.com &amp; """
    """<a href="https://x.example.com/?q=' || CAST(doc_id AS STRING) || """
    """'">link</a></div></body></html>')"""
)

# deterministic messy-URL synthesis: mixed-case scheme/host, www, default
# port, unsorted+tracking query params, fragment — every normalizer rule
# fires on every row
_URL_SYNTH = (
    "('HTTPS://WWW.' || source || '.Example' || "
    "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN '.CO.UK' "
    "WHEN 1 THEN '.COM' ELSE '.ORG' END || "
    "':443/Docs/' || CAST(doc_id AS STRING) || "
    "'/?z=' || CAST(doc_id % 5 AS STRING) || "
    "'&utm_source=feed&a=' || CAST(doc_id % 7 AS STRING) || "
    "'&fbclid=x#sec')"
)


def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WET-style HTML→text extraction (C4 §2.2's input stage): strip
    script/style/comment blocks and tags, decode entities, collapse
    whitespace — one codegen'd regexp chain, map-only (scan-bound at
    100 TB). HTML is synthesized deterministically from the documents
    table; the oracle replays the identical chain in DuckDB."""
    from harmonize_search_analyze_spark.operators.web import html_to_text_sql

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.expr(html_to_text_sql(_HTML_SYNTH, "spark")).alias("extracted"),
    ).withColumn(
        "n_chars_clean", F.length("extracted").cast("bigint")
    )


def _sql_html_extract() -> str:
    from harmonize_search_analyze_spark.operators.web import html_to_text_sql

    return (
        f"SELECT doc_id, {html_to_text_sql(_HTML_SYNTH, 'duckdb')} AS "
        "extracted, CAST(LENGTH("
        f"{html_to_text_sql(_HTML_SYNTH, 'duckdb')}) AS BIGINT) AS "
        "n_chars_clean FROM documents"
    )


def q_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb-style URL curation rollup: normalize each document's URL
    (lowercase scheme+host, strip www/default port/fragment/tracking
    params, sort survivors), extract the registered domain (eTLD+1), and
    aggregate per domain: doc count, distinct canonical URLs (the URL-dedup
    key count) and the lexicographically first URL as a sample. One hash
    agg over map-only string work."""
    from harmonize_search_analyze_spark.operators.web import (
        normalize_url_sql,
        registered_domain_sql,
        url_host_sql,
    )

    docs = _t(spark, sf_dir, "documents")
    dom = registered_domain_sql(url_host_sql(_URL_SYNTH, "spark"), "spark")
    return (
        docs.select(
            F.expr(dom).alias("domain"),
            F.expr(normalize_url_sql(_URL_SYNTH, "spark")).alias("url"),
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("doc_count"),
            F.countDistinct("url").alias("distinct_urls"),
            F.min("url").alias("sample_url"),
        )
    )


def _sql_url_normalize() -> str:
    from harmonize_search_analyze_spark.operators.web import (
        normalize_url_sql,
        registered_domain_sql,
        url_host_sql,
    )

    dom = registered_domain_sql(url_host_sql(_URL_SYNTH, "duckdb"), "duckdb")
    url = normalize_url_sql(_URL_SYNTH, "duckdb")
    return f"""
WITH u AS (
  SELECT {dom} AS domain, {url} AS url FROM documents
)
SELECT domain, CAST(COUNT(*) AS BIGINT) AS doc_count,
       CAST(COUNT(DISTINCT url) AS BIGINT) AS distinct_urls,
       MIN(url) AS sample_url
FROM u GROUP BY domain
"""


def q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail perplexity tiers (Wenzek et al. 2020 §4.3):
    unigram-LM score per doc, NTILE(3) within each language over the
    rounded score (doc_id tie-break for engine-portable assignment), then
    per-(lang, tier) doc counts and mean NLL."""
    from harmonize_search_analyze_spark.operators.contamination import (
        perplexity_buckets,
    )

    docs = _t(spark, sf_dir, "documents")
    return perplexity_buckets(docs)


def _sql_ccnet_buckets() -> str:
    from harmonize_search_analyze_spark.operators.contamination import (
        perplexity_buckets_oracle_sql,
    )

    return perplexity_buckets_oracle_sql("documents")


def q_bucket_script(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES bucket_script + bucket_selector pipeline: daily date_histogram
    with sum(value)/count/distinct-user metrics, derived per-bucket
    metrics as in-plan arithmetic scripts (avg event value, value per
    user), then keep only days with >= 10 events. The scripts are a
    projection over the bucket frame — zero extra exchanges."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        bucket_script,
        bucket_selector,
    )

    ev = _t(spark, sf_dir, "events")
    buckets = ev.groupBy(
        F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("value").alias("__sum_v"),
        F.countDistinct("user_id").alias("users"),
    )
    out = bucket_script(
        buckets,
        {"avg_value": "__sum_v / cnt", "value_per_user": "__sum_v / users"},
    )
    out = bucket_selector(out, F.col("cnt") >= 10)
    return out.select(
        "day", "cnt", F.round("__sum_v", 6).alias("sum_v"),
        "avg_value", "value_per_user",
    )


def _sql_bucket_script() -> str:
    return """
WITH b AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(COUNT(*) AS BIGINT) AS cnt,
         SUM(value) AS sum_v,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users
  FROM events GROUP BY date_trunc('day', ts)
)
SELECT day, cnt, ROUND(sum_v, 6) AS sum_v,
       ROUND(sum_v / cnt, 6) AS avg_value,
       ROUND(sum_v / users, 6) AS value_per_user
FROM b WHERE cnt >= 10
"""


def q_ip_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ip_prefix agg: /20 subnet buckets over IPv4 addresses
    synthesized from user_id — codegen'd integerize + floor-to-block key,
    ONE subnet-count-sized exchange (map-side combine bounds it at 2^20
    rows regardless of corpus size)."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        ip_prefix_agg,
    )

    ev = _t(spark, sf_dir, "events").withColumn("ip", F.expr(_IP_EXPR))
    return ip_prefix_agg(ev, "ip", prefix_length=20)


def _sql_ip_prefix() -> str:
    from harmonize_search_analyze_spark.operators.aggregations import (
        ip_to_long_sql,
        long_to_ip_sql,
    )

    block = 1 << 12
    net = (
        f"CAST(FLOOR({ip_to_long_sql(_IP_EXPR_DUCK)} / {block}) AS BIGINT)"
        f" * {block}"
    )
    return f"""
WITH n AS (
  SELECT {net} AS net FROM events
)
SELECT {long_to_ip_sql('net')} || '/20' AS prefix,
       CAST(COUNT(*) AS BIGINT) AS doc_count
FROM n GROUP BY net
"""


def q_hex_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES geohex_grid analog: hexagonal tiling (circumradius 5°, axial
    cube-rounded keys) over the synthesized lineitem coordinates, top-30
    cells. Same text is its own oracle — every operand is ANSI-portable
    and rounding is pinned to half-up FLOOR(v+0.5)."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        hex_grid,
    )

    df = _t(spark, sf_dir, "lineitem")
    return hex_grid(df, _LAT_EXPR, _LON_EXPR, size_deg=5.0, k=30)


def _sql_hex_grid() -> str:
    from harmonize_search_analyze_spark.functions.geohash import hex_key_sql

    key = hex_key_sql(_LAT_EXPR, _LON_EXPR, 5.0)
    return f"""
SELECT {key} AS hex, CAST(COUNT(*) AS BIGINT) AS doc_count
FROM lineitem
GROUP BY hex ORDER BY doc_count DESC, hex ASC LIMIT 30
"""


# paragraph synthesis shared verbatim by both dialects: para 2 is an exact
# repeat (always dropped), para 3 is the 40-char prefix (kept unless the
# doc itself is <=40 chars, in which case it too is a repeat)
_PARA_SYNTH = "(text || chr(10) || text || chr(10) || substr(text, 1, 40))"


def q_intra_doc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition removal (Gopher's boilerplate rule as a
    removal op): paragraphs kept only at their first in-doc position —
    a per-row array pipeline, map-only, zero shuffles. Runs BEFORE the
    corpus-level line_dedup pass at scale so boilerplate-heavy docs don't
    flood the line-key shuffle."""
    from harmonize_search_analyze_spark.operators.dedup import (
        intra_doc_dedup,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_PARA_SYNTH).alias("text")
    )
    return intra_doc_dedup(docs, "doc_id", "text")


def _sql_intra_doc_dedup() -> str:
    from harmonize_search_analyze_spark.operators.dedup import (
        intra_doc_dedup_sql,
    )

    joined, dropped = intra_doc_dedup_sql(_PARA_SYNTH, "duckdb")
    return (
        f"SELECT doc_id, {joined} AS text_dedup, {dropped} AS n_dropped "
        "FROM documents"
    )


def q_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIM training-sample construction (Bavarian et al. 2022): half the
    corpus re-emitted in <PRE> prefix <SUF> suffix <MID> middle order,
    cut points drawn deterministically from the portable doc-id hash —
    map-only per-row string arithmetic, no shuffle."""
    from harmonize_search_analyze_spark.operators.packing import (
        fim_transform,
    )

    docs = _t(spark, sf_dir, "documents")
    return fim_transform(docs, fim_rate=0.5)


def _sql_fim_transform() -> str:
    from harmonize_search_analyze_spark.operators.packing import (
        fim_transform_sql,
    )

    applied, sample = fim_transform_sql(
        "doc_id", "text", "duckdb", fim_rate=0.5
    )
    return (
        f"SELECT doc_id, {applied} AS fim_applied, {sample} AS sample "
        "FROM documents"
    )


_EQL_STEPS = [
    "event_type = 'view'",
    "event_type = 'click'",
    "event_type = 'purchase'",
]


def q_eql_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES EQL 'sequence by user_id [view] [click] [purchase] with
    maxspan=1d': ordered per-user event chains, each step strictly after
    the previous (ties pinned on (ts, event_id)) — one window pass
    computes every event's next-step pointer, then pointer-chasing
    equi-joins realize the chain."""
    from harmonize_search_analyze_spark.operators.analytics import (
        eql_sequence,
    )

    ev = _t(spark, sf_dir, "events")
    return eql_sequence(ev, _EQL_STEPS, maxspan_seconds=86400)


def _sql_eql_sequence() -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        eql_sequence_sql,
    )

    return eql_sequence_sql("events", _EQL_STEPS, maxspan_seconds=86400)


def q_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classification probe over the embeddings table (the standard
    embedding-quality eval): 10% hash-held-out vectors, labels predicted
    by 5-NN cosine majority vote (ties toward the smaller label) —
    ONE corpus scan for the neighbor search, vote exchanges carry
    (id, label, count) rows only."""
    from harmonize_search_analyze_spark.operators.similarity import (
        knn_classify,
    )

    emb = _t(spark, sf_dir, "embeddings", spread=True)
    return knn_classify(emb, k=5, test_pct=10)


def _sql_knn_classify() -> str:
    from harmonize_search_analyze_spark.operators.similarity import (
        knn_classify_oracle_sql,
    )

    return knn_classify_oracle_sql("embeddings", k=5, test_pct=10)


def q_denoiser_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UL2 mixture-of-denoisers (Tay et al. 2022): hash-routed [R]/[X]
    span corruption + [S] PrefixLM split over the corpus, one objective
    per document, unioned with mode sentinels."""
    from harmonize_search_analyze_spark.operators.packing import (
        denoiser_mix,
    )

    docs = _t(spark, sf_dir, "documents")
    return denoiser_mix(docs)


def _sql_denoiser_mix() -> str:
    from harmonize_search_analyze_spark.operators.packing import (
        denoiser_mix_sql,
    )

    return denoiser_mix_sql("documents")


def q_latest_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _transform 'latest': newest event per user (row_number over a
    ts-desc window, event_id tie-break for the oracle-stable contract) —
    one key-hash exchange, O(1) window state per key."""
    from harmonize_search_analyze_spark.operators.ordering import (
        latest_transform,
    )

    ev = _t(spark, sf_dir, "events")
    return latest_transform(
        ev, ["user_id"], "ts", tiebreak="event_id"
    ).select("user_id", "event_id", "ts", "event_type", "value")


def _sql_latest_transform() -> str:
    return """
WITH ranked AS (
  SELECT user_id, event_id, ts, event_type, value,
         ROW_NUMBER() OVER (
           PARTITION BY user_id ORDER BY ts DESC, event_id DESC
         ) AS rn
  FROM events
)
SELECT user_id, event_id, ts, event_type, value
FROM ranked WHERE rn = 1
"""


def q_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 span-corruption denoising samples (Raffel et al. 2020 §3.1.4):
    ~15% of tokens masked by the portable hash gate, consecutive runs
    collapsed to <extra_id_K> sentinels, masked spans emitted as the
    target — posexplode -> ONE doc-keyed window/agg exchange."""
    from harmonize_search_analyze_spark.operators.packing import (
        span_corruption,
    )

    docs = _t(spark, sf_dir, "documents")
    return span_corruption(docs, mask_rate=0.15)


def _sql_span_corruption() -> str:
    from harmonize_search_analyze_spark.operators.packing import (
        span_corruption_sql,
    )

    return span_corruption_sql("documents", mask_rate=0.15)


def q_runtime_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES runtime_mappings: script-derived fields (order year, price
    band) materialized at query time, then searched with an ordinary
    terms query and rolled up — the runtime fields behave exactly like
    mapped fields downstream (ES's contract), and Catalyst prunes/pushes
    around the derivations in-plan."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        terms_multi,
    )
    from harmonize_search_analyze_spark.plans.compiler import (
        apply_runtime_mappings,
        compile_query,
    )

    orders = _t(spark, sf_dir, "orders")
    rt = apply_runtime_mappings(
        orders,
        {
            "o_year": {"type": "long", "script": "year(o_orderdate)"},
            "price_band": {
                "type": "keyword",
                "script": {
                    "source": "CASE WHEN o_totalprice >= 200000 THEN "
                    "'high' WHEN o_totalprice >= 100000 THEN 'mid' "
                    "ELSE 'low' END"
                },
            },
        },
    )
    hit = rt.where(
        compile_query({"terms": {"price_band": ["mid", "high"]}})
    )
    return terms_multi(hit, ["o_year", "price_band"], k=30)


def _sql_runtime_fields() -> str:
    return """
WITH rt AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CASE WHEN o_totalprice >= 200000 THEN 'high'
              WHEN o_totalprice >= 100000 THEN 'mid'
              ELSE 'low' END AS price_band
  FROM orders
)
SELECT o_year, price_band, COUNT(*) AS doc_count
FROM rt WHERE price_band IN ('mid', 'high')
GROUP BY o_year, price_band
ORDER BY doc_count DESC, o_year ASC, price_band ASC
LIMIT 30
"""


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear BoW quality classifier (GPT-3 Appendix A's filter family,
    closed-form NB member): train on a curated-vs-crawl proxy label
    (source = 'src0') and score every document, all in-plan — two
    vocab/doc-keyed shuffles, no gradient loop, no UDF."""
    from harmonize_search_analyze_spark.operators.classifier import (
        nb_quality_classifier,
    )

    docs = _t(spark, sf_dir, "documents")
    return nb_quality_classifier(docs, "source = 'src0'")


def _sql_quality_classifier() -> str:
    from harmonize_search_analyze_spark.operators.classifier import (
        nb_quality_oracle_sql,
    )

    return nb_quality_oracle_sql("documents", "source = 'src0'")


_SPAN_AST = {
    "bool": {
        "should": [
            {"span_first": {
                "match": {"span_term": {"text.split": "spark"}}, "end": 5,
            }},
            {"span_near": {
                "clauses": [
                    {"span_term": {"text.split": "fast"}},
                    {"span_term": {"text.split": "table"}},
                ],
                "slop": 1, "in_order": True,
            }},
        ],
        "minimum_should_match": 1,
    }
}


def q_span_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene span queries via the position machinery: span_first
    ("spark" among the first 5 tokens) OR span_near (fast..table in
    order, slop 1), counted per lang. Both spans compile to ONE
    codegen'd nested-EXISTS projection — no explode, no join."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.where(compile_query(_SPAN_AST))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy("lang")
    )


def _sql_span_search() -> str:
    from harmonize_search_analyze_spark.functions.intervals import (
        span_first_sql,
        span_near_sql,
    )

    first = span_first_sql("text", "spark", 5, "duckdb")
    near = span_near_sql(
        "text", ["fast", "table"], "duckdb", slop=1, in_order=True
    )
    return f"""
SELECT lang, COUNT(*) AS doc_count FROM documents
WHERE ({first}) OR ({near})
GROUP BY lang ORDER BY lang
"""


def q_rank_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES rank_feature query (saturation curve over a static feature
    field): top-10 documents by n_chars / (n_chars + pivot). One
    codegen'd projection + TakeOrderedAndProject; only (doc_id, n_chars)
    are read from the scan."""
    from harmonize_search_analyze_spark.operators.ranking import (
        rank_feature,
    )

    docs = _t(spark, sf_dir, "documents")
    return rank_feature(
        docs, "n_chars", function="saturation", pivot=150.0, boost=2.0,
        k=10, id_col="doc_id",
    )


def _sql_rank_feature() -> str:
    from harmonize_search_analyze_spark.operators.ranking import (
        rank_feature_sql,
    )

    score = rank_feature_sql(
        "n_chars", function="saturation", pivot=150.0, boost=2.0
    )
    return f"""
SELECT doc_id, n_chars, {score} AS score FROM documents
WHERE {score} IS NOT NULL
ORDER BY score DESC, doc_id ASC LIMIT 10
"""


_DF_ORIGIN = "1995-06-15"
_DF_PIVOT_DAYS = 30.0


def q_distance_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES distance_feature query (date origin): recency-boost orders by
    proximity of o_orderdate to an origin day — score = boost * pivot /
    (pivot + |days from origin|). Distance stays in the row (integer day
    arithmetic, exact on both engines); top-k is
    TakeOrderedAndProject, no shuffle before the reduction."""
    from harmonize_search_analyze_spark.operators.ranking import (
        distance_feature,
    )

    orders = _t(spark, sf_dir, "orders")
    dist = F.abs(
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.to_date(F.lit(_DF_ORIGIN)),
        )
    )
    return distance_feature(
        orders.withColumn("__d", dist),
        F.col("__d"),
        pivot=_DF_PIVOT_DAYS,
        boost=1.5,
        k=10,
        id_col="o_orderkey",
    )


def _sql_distance_feature() -> str:
    from harmonize_search_analyze_spark.operators.ranking import (
        distance_feature_sql,
    )

    d = f"abs(datediff('day', DATE '{_DF_ORIGIN}', CAST(o_orderdate AS DATE)))"
    score = distance_feature_sql(d, pivot=_DF_PIVOT_DAYS, boost=1.5)
    return f"""
SELECT o_orderkey, {score} AS score FROM orders
WHERE {score} IS NOT NULL
ORDER BY score DESC, o_orderkey ASC LIMIT 10
"""


def q_has_child(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES has_child query (join-field): customers with at least TWO
    qualifying child orders (status F, total > 100k), rolled up per
    market segment. The child side aggregates to one (key, count) row
    per parent BEFORE the semi join — a hot parent arrives as one row,
    and the filtered-count frame broadcasts."""
    from harmonize_search_analyze_spark.operators.joins import has_child

    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    hits = has_child(
        customer, orders,
        parent_key="c_custkey", child_key="o_custkey",
        child_pred=(F.col("o_orderstatus") == "F")
        & (F.col("o_totalprice") > 100000.0),
        min_children=2,
    )
    return (
        hits.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("customers"))
        .orderBy("c_mktsegment")
    )


SQL_HAS_CHILD = """
SELECT c_mktsegment, COUNT(*) AS customers FROM customer
WHERE c_custkey IN (
  SELECT o_custkey FROM orders
  WHERE o_orderstatus = 'F' AND o_totalprice > 100000.0
    AND o_custkey IS NOT NULL
  GROUP BY o_custkey HAVING COUNT(*) >= 2
)
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def q_has_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES has_parent query: orders whose parent customer matches
    (BUILDING segment, acctbal > 5000) — one LEFT SEMI join against the
    filtered, dimension-sized, broadcastable parent side; top-10 by
    total price."""
    from harmonize_search_analyze_spark.operators.joins import has_parent

    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        has_parent(
            orders, customer,
            parent_key="c_custkey", child_key="o_custkey",
            parent_pred=(F.col("c_mktsegment") == "BUILDING")
            & (F.col("c_acctbal") > 5000.0),
        )
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


SQL_HAS_PARENT = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
WHERE o_custkey IN (
  SELECT c_custkey FROM customer
  WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 5000.0
)
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


def q_reverse_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES nested terms + reverse_nested sub-agg: per-customer order
    arrays (built in-plan), inner objects bucketed by (status,
    priority) key with BOTH the nested doc count and the parent doc
    count (distinct root customers owning >= 1 such object). Explode is
    map-side; one hash agg with a bounded partial-distinct."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        reverse_nested_terms,
    )

    orders = _t(spark, sf_dir, "orders")
    nested = orders.groupBy("o_custkey").agg(
        F.collect_list(
            F.struct(
                # null-propagating concat (matches SQL ||): a null status
                # or priority yields a NULL bucket, which the agg drops —
                # concat_ws would silently skip the null part instead
                F.concat(
                    F.col("o_orderstatus"),
                    F.lit("/"),
                    F.col("o_orderpriority"),
                ).alias("bucket"),
            )
        ).alias("items")
    )
    return reverse_nested_terms(
        nested, "items", "bucket", id_col="o_custkey", k=10
    )


SQL_REVERSE_NESTED = """
SELECT o_orderstatus || '/' || o_orderpriority AS bucket,
       COUNT(*) AS doc_count,
       COUNT(DISTINCT o_custkey) AS parent_count
FROM orders
WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL
GROUP BY bucket
ORDER BY doc_count DESC, bucket ASC LIMIT 10
"""


_SCRIPT_Q = "value > 200.0 AND hour(ts) >= 12"


def q_script_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES script query: keep docs where a painless-mapped SQL boolean
    holds (value > 200 and afternoon hour), counted per event_type. The
    script is ONE in-plan codegen'd expression — no UDF, no shuffle
    before the agg."""
    events = _t(spark, sf_dir, "events")
    pred = compile_query({"script": {"script": {"source": _SCRIPT_Q}}})
    return (
        events.where(pred)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy("event_type")
    )


SQL_SCRIPT_FILTER = f"""
SELECT event_type, COUNT(*) AS doc_count FROM events
WHERE {_SCRIPT_Q}
GROUP BY event_type ORDER BY event_type
"""

_SM_MAP = (
    "CASE WHEN o_orderpriority LIKE '1-%' THEN "
    "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) "
    "ELSE -CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) END"
)


def q_scripted_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES scripted_metric agg (the docs' canonical profit example,
    restricted to the associative contract): per order status, urgent
    orders contribute +price, the rest -price. Map is integer cents
    (exact cross-engine sums); ONE hash agg with map-side combine;
    reduce is a post-agg projection."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        scripted_metric,
    )

    orders = _t(spark, sf_dir, "orders")
    return scripted_metric(
        orders,
        _SM_MAP,
        combine="sum",
        # CAST keeps the division DOUBLE on both engines — a bare 100000.0
        # literal is DECIMAL in Spark AND DuckDB, and BIGINT/DECIMAL stays
        # DECIMAL (a driver wire-type mismatch even on equal values)
        reduce_script="ROUND(state / CAST(100000.0 AS DOUBLE), 2)",
        group_by=["o_orderstatus"],
        alias="net_urgent_k",
    )


SQL_SCRIPTED_METRIC = f"""
SELECT o_orderstatus,
       ROUND(CAST(SUM({_SM_MAP}) AS BIGINT) / CAST(100000.0 AS DOUBLE), 2)
         AS net_urgent_k
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""

_PINNED_IDS = [42, 7]


def q_pinned_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES pinned query: ids [42, 7] rank first in list order (even if
    they fail the organic query), organic src1 hits follow by n_chars
    DESC. Pin rank is one CASE expression — no ids join; top-k is
    TakeOrderedAndProject."""
    from harmonize_search_analyze_spark.operators.ranking import (
        pinned_query,
    )

    docs = _t(spark, sf_dir, "documents")
    return pinned_query(
        docs, _PINNED_IDS, F.col("source") == "src1",
        id_col="doc_id", sort_col="n_chars", ascending=False, k=10,
    ).select("doc_id", "source", "n_chars")


SQL_PINNED_SEARCH = """
SELECT doc_id, source, n_chars FROM (
  SELECT *, CASE WHEN doc_id = 42 THEN 0 WHEN doc_id = 7 THEN 1
                 ELSE 2 END AS pin
  FROM documents
  WHERE doc_id IN (42, 7) OR source = 'src1'
)
ORDER BY pin ASC, n_chars DESC, doc_id ASC LIMIT 10
"""

_LB_BOUNDS = [150, 300, 450]


def q_length_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed training batch assembly: bucket documents by
    n_chars, form batches of 16 WITHIN (bucket, shard) — the shard hash
    keeps the window n_shards-way parallel per bucket (no hot global
    rank) while the bucket bound keeps batches padding-homogeneous.
    Deterministic: portable shard hash + (length, id) order."""
    from harmonize_search_analyze_spark.operators.packing import (
        batch_by_length,
    )

    docs = _t(spark, sf_dir, "documents")
    return batch_by_length(
        docs, "doc_id", "n_chars",
        boundaries=_LB_BOUNDS, batch_size=16, n_shards=8,
    ).orderBy("doc_id")


def _sql_length_batching() -> str:
    from harmonize_search_analyze_spark.operators.packing import (
        batch_by_length_sql,
    )

    inner = batch_by_length_sql(
        "documents", "doc_id", "n_chars",
        boundaries=_LB_BOUNDS, batch_size=16, n_shards=8,
    )
    return f"SELECT * FROM ({inner}) ORDER BY doc_id"


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware duplicate resolution: the LSH near-dup clusters of
    q_dedup_clusters, but each cluster keeps its LONGEST document
    (n_chars DESC, ties to smallest id) — the retention policy web-corpus
    dedup actually ships, vs. min-id canonicalization. One label join +
    ONE cluster-keyed window."""
    from harmonize_search_analyze_spark.operators.dedup import (
        connected_components,
        near_dup_pairs_lsh,
        resolve_duplicates,
    )

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 10 == 0)
    pairs = near_dup_pairs_lsh(
        docs, "doc_id", "text", threshold=0.9, k=8, n=1, rows_per_band=2
    )
    labels = connected_components(pairs)
    return (
        resolve_duplicates(
            docs.select("doc_id", "n_chars"), labels,
            id_col="doc_id", quality_col="n_chars",
        )
        .select("doc_id", "cluster_id", "n_chars", "keep")
        .orderBy("doc_id")
    )


def _sql_dedup_keep_best() -> str:
    return f"""{_sql_cluster_labels_cte()},
d AS (
  SELECT doc_id, n_chars FROM documents WHERE doc_id % 10 = 0
),
lab AS (
  SELECT d.doc_id, d.n_chars,
         COALESCE(l.cluster_id, d.doc_id) AS cluster_id
  FROM d LEFT JOIN labels l ON l.id = d.doc_id
)
SELECT doc_id, cluster_id, n_chars,
       ROW_NUMBER() OVER (PARTITION BY cluster_id
                          ORDER BY n_chars DESC, doc_id ASC) = 1 AS keep
FROM lab ORDER BY doc_id
"""


def q_soft_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SoftDedup reweighting: near-dup clusters emit sampling weight
    size^-1 instead of dropping rows — each cluster contributes one
    document's worth of expected training mass. One label join + one
    cluster-keyed count, no windows."""
    from harmonize_search_analyze_spark.operators.dedup import (
        connected_components,
        near_dup_pairs_lsh,
        soft_dedup_weights,
    )

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 10 == 0)
    pairs = near_dup_pairs_lsh(
        docs, "doc_id", "text", threshold=0.9, k=8, n=1, rows_per_band=2
    )
    labels = connected_components(pairs)
    return (
        soft_dedup_weights(docs.select("doc_id"), labels, id_col="doc_id")
        .select("doc_id", "cluster_id", "cluster_size", "weight")
        .orderBy("doc_id")
    )


def _sql_soft_dedup() -> str:
    return f"""{_sql_cluster_labels_cte()},
lab AS (
  SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id
  FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) d
  LEFT JOIN labels l ON l.id = d.doc_id
),
sizes AS (
  SELECT cluster_id, COUNT(*) AS cluster_size FROM lab GROUP BY cluster_id
)
SELECT lab.doc_id, lab.cluster_id, sizes.cluster_size,
       ROUND(POW(CAST(sizes.cluster_size AS DOUBLE), -1.0), 6) AS weight
FROM lab JOIN sizes ON lab.cluster_id = sizes.cluster_id
ORDER BY lab.doc_id
"""


def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch corpus reshuffle (2 epochs): map-side
    epoch fan-out + portable hash shuffle key + the distributed
    contiguous-rank machinery (range exchange + per-partition windows,
    no single-reducer global window)."""
    from harmonize_search_analyze_spark.operators.ordering import (
        epoch_shuffle,
    )

    docs = _t(spark, sf_dir, "documents")
    return (
        epoch_shuffle(
            docs.select("doc_id"), "doc_id", epochs=2, seed=11, rank=True
        )
        .select("epoch", "doc_id", "shuffle_key", "pos")
        .orderBy("pos")
    )


def _sql_epoch_shuffle() -> str:
    from harmonize_search_analyze_spark.operators.ordering import (
        epoch_shuffle_sql,
    )

    inner = epoch_shuffle_sql(
        "(SELECT doc_id FROM documents) t", "doc_id", ["doc_id"],
        epochs=2, seed=11, rank=True,
    )
    return (
        f"SELECT epoch, doc_id, shuffle_key, pos FROM ({inner}) "
        "ORDER BY pos"
    )


def q_pivot_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _transform pivot: entity-centric summary of events per
    event_type (sum as exact integer cents, value_count, exact
    cardinality, max). The cardinality agg runs in its OWN aggregation
    joined back on the same key — the Expand-plan cliff never appears."""
    from harmonize_search_analyze_spark.operators.ordering import (
        pivot_transform,
    )

    ev = _t(spark, sf_dir, "events").withColumn(
        "cents", F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)")
    )
    return pivot_transform(
        ev, ["event_type"],
        {
            "total_cents": ("sum", "cents"),
            "n": ("value_count", "value"),
            "users": ("cardinality", "user_id"),
            "peak": ("max", "value"),
        },
    )


SQL_PIVOT_SUMMARY = """
SELECT event_type,
       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
         AS total_cents,
       COUNT(value) AS n,
       COUNT(DISTINCT user_id) AS users,
       MAX(value) AS peak
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_term_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _mtermvectors with term_statistics: per requested doc, terms
    with tf + 1-based positions, plus corpus df/ttf. The corpus pass is
    pre-filtered by a broadcast semi join on the requested docs' terms;
    df and ttf are SEPARATE aggs (never the Expand plan)."""
    from harmonize_search_analyze_spark.operators.text import term_vectors

    docs = _t(spark, sf_dir, "documents")
    # positions is array<int> from the library operator; serialize to a
    # comma-joined string so the driver canonicalizer can hash the column
    # (arrays are unhashable in its pandas sort — round-3 geo_line lesson).
    return term_vectors(docs, [3, 17]).withColumn(
        "positions",
        F.expr("array_join(transform(positions, x -> cast(x as string)), ',')"),
    )


def _sql_term_vectors() -> str:
    from harmonize_search_analyze_spark.operators.text import (
        term_vectors_sql,
    )

    inner = term_vectors_sql("documents", [3, 17])
    return f"""
SELECT doc_id, term, term_freq,
       array_to_string(positions, ',') AS positions, doc_freq, ttf
FROM ({inner}) tv
"""


_SHAPE = {
    "type": "polygon",
    "coordinates": [
        # GeoJSON [lon, lat]: the geo_polygon hexagon as the exterior...
        [[-100.0, 50.0], [0.0, 60.0], [100.0, 50.0],
         [60.0, -20.0], [0.0, -40.0], [-60.0, -20.0]],
        # ...minus a rectangular hole in the middle
        [[-30.0, 25.0], [30.0, 25.0], [30.0, -5.0], [-30.0, -5.0]],
    ],
}


def q_geo_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES geo_shape query (polygon WITH a hole, relation=intersects):
    even-odd crossing parity across all rings in ONE codegen'd
    arithmetic expression — a point inside the hole counts even and is
    excluded. Same synthesized lat/lon as the geo_polygon query."""
    from harmonize_search_analyze_spark.plans.compiler import compile_query

    li = _t(spark, sf_dir, "lineitem")
    pts = li.select(
        F.expr(_LAT_EXPR).alias("lat"), F.expr(_LON_EXPR).alias("lon"),
        "l_returnflag",
    )
    pred = compile_query({"geo_shape": {"shape": _SHAPE}})
    return (
        pts.where(pred)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy("l_returnflag")
    )


def _sql_geo_shape() -> str:
    from harmonize_search_analyze_spark.plans.compiler import geo_shape_sql

    rings = [
        [(pt[1], pt[0]) for pt in ring] for ring in _SHAPE["coordinates"]
    ]
    cond = geo_shape_sql(rings, "lat", "lon")
    return f"""
SELECT l_returnflag, COUNT(*) AS doc_count FROM (
  SELECT {_LAT_EXPR} AS lat, {_LON_EXPR} AS lon, l_returnflag
  FROM lineitem
) WHERE {cond}
GROUP BY l_returnflag ORDER BY l_returnflag
"""


_SCRIPT_SCORE = (
    "CASE WHEN n_chars >= 0 THEN LN(1.0 + CAST(n_chars AS DOUBLE)) "
    "* (1.0 + CAST(doc_id % 7 AS DOUBLE) / 10.0) END"
)


def q_script_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES script_score query: filter (source src0/src1), score by an
    arbitrary expression, min_score cut, top-10. One codegen'd
    projection over the filtered scan + TakeOrderedAndProject."""
    from harmonize_search_analyze_spark.operators.ranking import (
        script_score,
    )

    docs = _t(spark, sf_dir, "documents")
    return script_score(
        docs,
        F.col("source").isin("src0", "src1"),
        _SCRIPT_SCORE,
        min_score=5.0,
        k=10,
        id_col="doc_id",
    )


SQL_SCRIPT_SCORE = f"""
SELECT doc_id, score FROM (
  SELECT doc_id, ROUND(CAST(({_SCRIPT_SCORE}) AS DOUBLE), 6) AS score
  FROM documents WHERE source IN ('src0', 'src1')
)
WHERE score IS NOT NULL AND score >= 5.0
ORDER BY score DESC, doc_id ASC LIMIT 10
"""


def q_serial_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES serial_diff pipeline agg (lag=7: week-over-week change on daily
    buckets) + bucket_sort paging (sorted by the diff, from=2/size=10).
    Both windows run over the BUCKET frame — rows bounded by span/interval,
    never by raw data volume."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        bucket_sort,
        date_histogram,
        serial_diff,
    )

    daily = date_histogram(_t(spark, sf_dir, "events"), "ts", "1 day")
    wow = serial_diff(daily, "bucket", "doc_count", lag=7)
    page = bucket_sort(
        wow,
        [F.desc_nulls_last("serial_diff"), F.asc("bucket")],
        size=10,
        offset=2,
    )
    return page.orderBy(F.desc_nulls_last("serial_diff"), F.asc("bucket"))


SQL_SERIAL_DIFF = """
WITH b AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
         COUNT(*) AS doc_count
  FROM events WHERE ts IS NOT NULL GROUP BY 1
), d AS (
  SELECT bucket, doc_count,
         doc_count - LAG(doc_count, 7) OVER (ORDER BY bucket) AS serial_diff
  FROM b
)
SELECT bucket, doc_count, serial_diff FROM (
  SELECT *, ROW_NUMBER() OVER (
      ORDER BY serial_diff DESC NULLS LAST, bucket ASC) AS rn
  FROM d
) WHERE rn > 2 AND rn <= 12
ORDER BY serial_diff DESC NULLS LAST, bucket ASC
"""


def q_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES bucket_selector + sibling stats_bucket family: keep daily
    buckets with doc_count >= 330, then one stats row over the surviving
    buckets (avg/min/max/sum_bucket) — the ES avg_bucket/max_bucket/...
    siblings in a single agg over the bucket-level frame."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        bucket_selector,
        bucket_stats,
        date_histogram,
    )

    daily = date_histogram(_t(spark, sf_dir, "events"), "ts", "1 day")
    busy = bucket_selector(daily, F.col("doc_count") >= 330)
    return bucket_stats(busy, "doc_count")


SQL_BUCKET_STATS = """
WITH b AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
         COUNT(*) AS doc_count
  FROM events WHERE ts IS NOT NULL GROUP BY 1
)
SELECT CAST(COUNT(doc_count) AS BIGINT) AS bucket_count,
       ROUND(AVG(doc_count), 6) AS avg_bucket,
       MIN(doc_count) AS min_bucket,
       MAX(doc_count) AS max_bucket,
       CAST(SUM(doc_count) AS BIGINT) AS sum_bucket
FROM b WHERE doc_count >= 330
"""


_ANALYZE_CHAIN = dict(
    tokenizer="standard",
    filters=[
        "lowercase",
        "asciifolding",
        ("stop", {}),
        ("length", {"min": 2}),
        ("shingle", {"min_shingle_size": 2, "max_shingle_size": 2}),
    ],
)


def q_analyze_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _analyze chain as an index-time pipeline: standard tokenizer ->
    lowercase -> asciifolding -> stop -> length -> shingle(2), exploded to
    the top-20 emitted terms. The whole chain is ONE codegen'd
    higher-order-function projection (no UDF, no pre-shuffle) feeding a
    hash agg + TakeOrderedAndProject."""
    from harmonize_search_analyze_spark.functions.analyze import analyze

    docs = _t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    return (
        docs.select(F.explode(analyze("text", **_ANALYZE_CHAIN)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy(F.desc("doc_count"), F.asc("token"))
        .limit(20)
    )


def _sql_analyze_chain() -> str:
    from harmonize_search_analyze_spark.functions.analyze import analyze_sql

    chain = analyze_sql("text", "duckdb", **_ANALYZE_CHAIN)
    return f"""
SELECT token, CAST(COUNT(*) AS BIGINT) AS doc_count FROM (
  SELECT unnest({chain}) AS token
  FROM documents WHERE text IS NOT NULL
) GROUP BY token ORDER BY doc_count DESC, token ASC LIMIT 20
"""


_INGEST_PIPE = [
    {"json": {"field": "props", "fields": {"k_str": "$.k"}}},
    {"convert": {"field": "k_str", "type": "long", "target_field": "k_val"}},
    {"lowercase": {"field": "event_type"}},
    {"drop": {"if": "k_val IS NULL OR k_val < 5"}},
    {"script": {"target_field": "k_sq", "source": "k_val * k_val"}},
]


def q_ingest_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ingest pipeline (json -> convert -> lowercase -> drop -> script)
    as a data-driven processor chain, then a rollup of the surviving docs.
    The whole pipeline compiles to one map-only projection+filter fused
    into the scan; only the final agg shuffles."""
    from harmonize_search_analyze_spark.operators.ingest_pipeline import (
        run_pipeline,
    )

    out = run_pipeline(_t(spark, sf_dir, "events"), _INGEST_PIPE)
    return (
        out.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.sum("k_val").alias("sum_k"),
            F.sum("k_sq").alias("sum_ksq"),
        )
        .orderBy("event_type")
    )


SQL_INGEST_PIPELINE = """
WITH p AS (
  SELECT lower(event_type) AS event_type,
         try_cast(json_extract_string(props, '$.k') AS BIGINT) AS k_val
  FROM events
), f AS (
  SELECT *, k_val * k_val AS k_sq
  FROM p WHERE NOT (k_val IS NULL OR k_val < 5)
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS doc_count,
       CAST(SUM(k_val) AS BIGINT) AS sum_k,
       CAST(SUM(k_sq) AS BIGINT) AS sum_ksq
FROM f GROUP BY event_type ORDER BY event_type
"""


_GROK_LOG_PATTERN = (
    "%{WORD:etype} \\[%{TIMESTAMP_ISO8601:at}\\]"
    " user=%{INT:uid} cents=%{INT:valc}"
)

# value is rendered as integer cents, not %f: Java's Formatter rounds
# float output HALF_UP while C's printf rounds half-even, so a %.2f
# round-trip diverges on exact halves — ROUND() then %d is identical in
# both engines.
_GROK_PIPE = [
    {"drop": {"if": "ts IS NULL OR user_id IS NULL OR value IS NULL"
                    " OR event_type IS NULL"}},
    {"script": {"target_field": "line",
                "source": "format_string('%s [%s] user=%d cents=%d',"
                          " event_type,"
                          " date_format(ts, 'yyyy-MM-dd HH:mm:ss'),"
                          " user_id,"
                          " CAST(ROUND(value * 100) AS BIGINT))"}},
    {"grok": {"field": "line", "pattern": _GROK_LOG_PATTERN}},
    {"convert": {"field": "uid", "type": "long", "target_field": "uid_l"}},
    {"convert": {"field": "valc", "type": "long",
                 "target_field": "valc_l"}},
]


def q_grok_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grok/dissect layer: render each event as a log line IN-PLAN, grok
    it back apart (WORD/TIMESTAMP_ISO8601/INT library patterns), convert
    the captures, and aggregate — the parse is a codegen'd regexp_extract
    chain, no UDF."""
    from harmonize_search_analyze_spark.operators.ingest_pipeline import (
        run_pipeline,
    )

    out = run_pipeline(_t(spark, sf_dir, "events"), _GROK_PIPE)
    return (
        out.groupBy("etype")
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.sum("uid_l").alias("sum_uid"),
            F.sum("valc_l").alias("sum_cents"),
        )
        .orderBy("etype")
    )


def _sql_grok_parse() -> str:
    from harmonize_search_analyze_spark.operators.ingest_pipeline import (
        grok_to_regex,
    )

    rx, fields = grok_to_regex(_GROK_LOG_PATTERN)
    assert fields == ["etype", "at", "uid", "valc"]
    # DuckDB regular strings do NOT process backslash escapes — only
    # quotes need doubling; \d etc. pass through verbatim.
    rx_lit = rx.replace("'", "''")
    return f"""
WITH lines AS (
  SELECT printf('%s [%s] user=%d cents=%d', event_type,
                strftime(ts, '%Y-%m-%d %H:%M:%S'), user_id,
                CAST(ROUND(value * 100) AS BIGINT)) AS line
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL AND value IS NOT NULL
    AND event_type IS NOT NULL
), g AS (
  SELECT nullif(regexp_extract(line, '{rx_lit}', 1), '') AS etype,
         try_cast(nullif(regexp_extract(line, '{rx_lit}', 3), '')
                  AS BIGINT) AS uid_l,
         try_cast(nullif(regexp_extract(line, '{rx_lit}', 4), '')
                  AS BIGINT) AS valc_l
  FROM lines
)
SELECT etype, CAST(COUNT(*) AS BIGINT) AS doc_count,
       CAST(SUM(uid_l) AS BIGINT) AS sum_uid,
       CAST(SUM(valc_l) AS BIGINT) AS sum_cents
FROM g GROUP BY etype ORDER BY etype
"""


def q_bbq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantized ANN (ES BBQ shape): 1-bit sign quantization ->
    Hamming shortlist (popcount over packed BIGINT words, unrolled
    codegen) -> exact cosine rerank of the 100-row shortlist."""
    from harmonize_search_analyze_spark.operators.similarity import bbq_topk

    return bbq_topk(
        _t(spark, sf_dir, "embeddings"), _QUERY_VEC, k=10, shortlist=100
    )


def _sql_bbq_topk() -> str:
    from harmonize_search_analyze_spark.operators.similarity import (
        bbq_topk_oracle_sql,
    )

    return bbq_topk_oracle_sql(_QUERY_VEC, k=10, shortlist=100)


def q_int8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES int8 scalar-quantized ANN: global (min,max) quantization
    params from one agg, corrected int-domain dot shortlist (the
    1-byte/dim index representation), exact cosine rerank."""
    from harmonize_search_analyze_spark.operators.similarity import (
        int8_topk,
    )

    return int8_topk(
        _t(spark, sf_dir, "embeddings"), _QUERY_VEC, k=10, shortlist=100
    )


def _sql_int8_topk() -> str:
    from harmonize_search_analyze_spark.operators.similarity import (
        int8_topk_oracle_sql,
    )

    return int8_topk_oracle_sql(_QUERY_VEC, k=10, shortlist=100)


_ZORDER_COLS = ["l_quantity", "l_extendedprice"]


def q_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout key (Delta OPTIMIZE ZORDER BY shape, rebuilt as
    pure column expressions): Morton-interleave the two columns' 16-bit
    ranks, then per-top-8-bit-bucket stats — the gate proves the
    interleaving puts BOTH columns' values in tight per-bucket spans,
    which is exactly the per-file min-max property the parquet pruner
    exploits at 100 TB."""
    from harmonize_search_analyze_spark.operators.layout import zorder_key

    li = _t(spark, sf_dir, "lineitem")
    keyed = zorder_key(li, _ZORDER_COLS, bits=16)
    return (
        keyed.groupBy(
            F.expr("shiftright(zkey, 24)").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("l_quantity"), 6).alias("q_lo"),
            F.round(F.max("l_quantity"), 6).alias("q_hi"),
            F.round(F.min("l_extendedprice"), 6).alias("p_lo"),
            F.round(F.max("l_extendedprice"), 6).alias("p_hi"),
        )
        .orderBy("bucket")
        .limit(30)
    )


def _sql_zorder_cluster() -> str:
    from harmonize_search_analyze_spark.operators.layout import (
        zorder_key_sql,
    )

    bounds = {
        "l_quantity": ("lo_q", "hi_q"),
        "l_extendedprice": ("lo_p", "hi_p"),
    }
    key = zorder_key_sql(_ZORDER_COLS, bounds, "duckdb", bits=16)
    return f"""
WITH b AS (
  SELECT MIN(CAST(l_quantity AS DOUBLE)) AS lo_q,
         MAX(CAST(l_quantity AS DOUBLE)) AS hi_q,
         MIN(CAST(l_extendedprice AS DOUBLE)) AS lo_p,
         MAX(CAST(l_extendedprice AS DOUBLE)) AS hi_p
  FROM lineitem
),
keyed AS (
  SELECT {key} AS zkey, l_quantity, l_extendedprice
  FROM lineitem CROSS JOIN b
)
SELECT (zkey >> 24) AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(MIN(l_quantity), 6) AS q_lo,
       ROUND(MAX(l_quantity), 6) AS q_hi,
       ROUND(MIN(l_extendedprice), 6) AS p_lo,
       ROUND(MAX(l_extendedprice), 6) AS p_hi
FROM keyed GROUP BY 1 ORDER BY bucket LIMIT 30
"""


def q_rp_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss projected ANN (64 -> 16 dims on the
    deterministic gaussian family): rank in the projected space — 4x
    fewer floats through the top-k machinery — exact cosine rerank of
    the shortlist."""
    from harmonize_search_analyze_spark.operators.similarity import (
        rp_topk,
    )

    return rp_topk(
        _t(spark, sf_dir, "embeddings"), _QUERY_VEC,
        k=10, out_dim=16, shortlist=100,
    )


def _sql_rp_topk() -> str:
    from harmonize_search_analyze_spark.operators.similarity import (
        rp_topk_oracle_sql,
    )

    return rp_topk_oracle_sql(_QUERY_VEC, k=10, out_dim=16, shortlist=100)


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (3 fixed iterations, dangling-mass corrected)
    over the token co-occurrence graph of the top-30 corpus tokens —
    the crawl-graph centrality signal curation pipelines use for
    URL/domain quality; fixed iterations keep the whole run one
    deterministic Catalyst plan the oracle unrolls CTE-for-CTE."""
    from harmonize_search_analyze_spark.functions.tokenize import (
        split_tokens,
    )
    from harmonize_search_analyze_spark.operators.graph import pagerank

    docs = _t(spark, sf_dir, "documents")
    tok = docs.where(F.col("text").isNotNull()).select(
        F.col("doc_id").alias("doc"),
        F.explode(F.array_distinct(split_tokens("text"))).alias("term"),
    )
    topn = (
        tok.groupBy("term")
        .agg(F.count_distinct("doc").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(30)
        .select("term")
    )
    # persist the filtered (doc, term) frame: the clique self-join
    # scans BOTH sides — without the pin the token explode and the
    # top-30 semi-filter run twice (measured 18x/decade at m100 from
    # the double scan; the 30-term clique fan-out itself is bounded
    # per doc and linear in corpus)
    t2 = tok.join(F.broadcast(topn), "term").localCheckpoint()
    a, b = t2.alias("a"), t2.alias("b")
    edges = (
        a.join(b, "doc")
        .where(F.col("a.term") != F.col("b.term"))
        .groupBy(
            F.col("a.term").alias("src"), F.col("b.term").alias("dst")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    return pagerank(edges, iters=3, weight_col="w")


def _sql_pagerank() -> str:
    from harmonize_search_analyze_spark.operators.graph import pagerank_sql
    from harmonize_search_analyze_spark.operators.text import tokens_sql

    toks = tokens_sql("text", "duckdb")
    edges_sql = f"""
WITH tok AS (
  SELECT doc_id AS doc, unnest(list_distinct({toks})) AS term
  FROM documents WHERE text IS NOT NULL
),
topn AS (
  SELECT term FROM tok GROUP BY term
  ORDER BY COUNT(DISTINCT doc) DESC, term ASC LIMIT 30
),
t2 AS (SELECT t.doc, t.term FROM tok t JOIN topn USING (term))
SELECT a.term AS src, b.term AS dst, CAST(COUNT(*) AS DOUBLE) AS w
FROM t2 a JOIN t2 b ON a.doc = b.doc AND a.term <> b.term
GROUP BY 1, 2
"""
    return pagerank_sql(edges_sql, "duckdb", iters=3)


def q_esql_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL RERANK + COMPLETION (8.18 inference commands): the rerank
    endpoint is the deterministic term_overlap stand-in, the completion
    endpoint the echo_template stand-in — command plumbing (parse,
    endpoint registry, _score wiring) is the real surface under test."""
    from harmonize_search_analyze_spark.plans.esql import run_esql
    from harmonize_search_analyze_spark.sources.catalog import Catalog

    cat = Catalog(spark)
    cat.register("documents", _t(spark, sf_dir, "documents"))
    cat.register_inference(
        "overlap-rerank", {"task_type": "rerank", "type": "term_overlap"}
    )
    cat.register_inference(
        "echo", {
            "task_type": "completion", "type": "echo_template",
            "template": "note[{prompt}]",
        },
    )
    return run_esql(cat, """
        FROM documents
        | WHERE text IS NOT NULL
        | SORT doc_id ASC
        | LIMIT 50
        | RERANK "fast spark scan join" ON text WITH overlap-rerank
        | COMPLETION note = SUBSTRING(text, 1, 10) WITH echo
        | KEEP doc_id, _score, note
        | SORT _score DESC, doc_id ASC
        | LIMIT 20
    """)


def _sql_esql_rerank() -> str:
    from harmonize_search_analyze_spark.operators.text import (
        term_overlap_sql,
    )

    score = term_overlap_sql("fast spark scan join", ["text"], "duckdb")
    return f"""
WITH top50 AS (
  SELECT doc_id, text FROM documents WHERE text IS NOT NULL
  ORDER BY doc_id LIMIT 50
)
SELECT doc_id, {score} AS _score,
       'note[' || substring(text, 1, 10) || ']' AS note
FROM top50
ORDER BY _score DESC, doc_id ASC LIMIT 20
"""


def q_percentiles_sketch_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group binned quantile sketch ("p95 per segment" at 100 TB):
    two map-combinable aggs + bin-level windows; bin counts merge by
    addition across days/clusters."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        percentiles_sketch_by,
    )

    return percentiles_sketch_by(
        _t(spark, sf_dir, "lineitem"), "l_returnflag", "l_extendedprice",
        [0.5, 0.95], n_bins=128,
    )


def _sql_percentiles_sketch_by() -> str:
    from harmonize_search_analyze_spark.operators.aggregations import (
        percentiles_sketch_by_sql,
    )

    return percentiles_sketch_by_sql(
        "lineitem", "l_returnflag", "l_extendedprice",
        [0.5, 0.95], n_bins=128,
    )


def q_script_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode-script character profile per document (multilingual
    curation routing signal): per-script non-whitespace ratios + the
    dominant script, all map-only codegen regex counts (Java and RE2
    script classes verified to count identically)."""
    from harmonize_search_analyze_spark.operators.text import (
        script_profile,
    )

    docs = _t(spark, sf_dir, "documents")
    return script_profile(docs).orderBy("doc_id")


def _sql_script_profile() -> str:
    from harmonize_search_analyze_spark.operators.text import (
        SCRIPT_NAMES,
        script_ratios_sql,
    )

    ratios = script_ratios_sql("text", "duckdb")
    sel = ", ".join(f"{sql} AS {n}" for n, sql in ratios.items())
    names = list(SCRIPT_NAMES)
    arms = []
    for i, n in enumerate(names):
        others = ", ".join(m for m in names if m != n)
        arms.append(f"WHEN {n} >= GREATEST({others}) THEN '{n}'")
    case = "CASE " + " ".join(arms) + " END"
    return f"""
WITH r AS (
  SELECT doc_id, {sel} FROM documents WHERE text IS NOT NULL
)
SELECT doc_id, {', '.join(names)}, {case} AS dominant
FROM r ORDER BY doc_id
"""


def q_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DPO preference-pair construction: per source domain, the
    highest- and lowest-quality document (shared quality-score
    generator) become (chosen, rejected) with the score margin — ONE
    hash agg via struct max/min, no window over candidates."""
    from harmonize_search_analyze_spark.operators.sampling import (
        preference_pairs,
    )
    from harmonize_search_analyze_spark.operators.text import (
        quality_score_sql,
    )

    docs = _t(spark, sf_dir, "documents")
    return preference_pairs(
        docs, "source", "text", quality_score_sql("text", "spark")
    )


def _sql_preference_pairs() -> str:
    from harmonize_search_analyze_spark.operators.text import (
        quality_score_sql,
    )

    q = quality_score_sql("text", "duckdb")
    return f"""
WITH keyed AS (
  SELECT source AS prompt, CAST({q} AS DOUBLE) AS s, text AS r
  FROM documents WHERE source IS NOT NULL AND text IS NOT NULL
), agg AS (
  SELECT prompt,
         MAX(ROW(s, r)) AS best, MIN(ROW(s, r)) AS worst,
         COUNT(*) AS n_candidates
  FROM keyed GROUP BY prompt
)
SELECT prompt, best[2] AS chosen, worst[2] AS rejected,
       ROUND(best[1] - worst[1], 6) AS margin, n_candidates
FROM agg WHERE ROUND(best[1] - worst[1], 6) > 0.0
ORDER BY prompt
"""


_MULTILINGUAL_STAGES = [
    {"script_filter": {"script": "latin", "min_ratio": 0.8}},
    {"fertility_filter": {"max_fertility": 1.5}},
    {"length_filter": {"min_chars": 40}},
    {"exact_dedup": {}},
]


def q_multilingual_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-driven curation pipeline exercising the round-4 stages:
    unicode-script floor + tokenizer-fertility cap (both cut ~half the
    corpus at these settings) + length + exact dedup, Spark path and
    oracle compiled from the SAME stage generator."""
    from harmonize_search_analyze_spark.operators.curation_pipeline import (
        run_corpus_pipeline,
    )

    docs = _t(spark, sf_dir, "documents")
    return run_corpus_pipeline(docs, _MULTILINGUAL_STAGES).select(
        "doc_id", "source", "lang"
    ).orderBy("doc_id")


def _sql_multilingual_pipeline() -> str:
    from harmonize_search_analyze_spark.operators.curation_pipeline import (
        corpus_pipeline_sql,
    )

    inner = corpus_pipeline_sql(
        "documents", _MULTILINGUAL_STAGES, ["doc_id", "source", "lang", "text"]
    )
    return f"SELECT doc_id, source, lang FROM ({inner}) ORDER BY doc_id"


def q_terms_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES terms agg SHARD semantics (the approximation the exact
    `terms` avoids): deterministic hash shards contribute only their
    local top shard_size terms; doc_count_error_upper_bound = the sum
    of non-reporting shards' cut-off lines — the published ES bound,
    exercised for real (shard_size=3 undercounts at this SF and the
    oracle replays truncation+merge+bound exactly)."""
    from harmonize_search_analyze_spark.functions.tokenize import (
        split_tokens,
    )
    from harmonize_search_analyze_spark.operators.aggregations import (
        terms_approx,
    )

    docs = _t(spark, sf_dir, "documents")
    toks = docs.where(F.col("text").isNotNull()).select(
        "doc_id", F.explode(split_tokens("text")).alias("term")
    )
    return terms_approx(
        toks, "term", k=5, n_shards=8, shard_size=3, id_col="doc_id"
    )


def _sql_terms_approx() -> str:
    from harmonize_search_analyze_spark.functions.hashing import (
        hash64_sql,
    )
    from harmonize_search_analyze_spark.operators.text import tokens_sql

    h = hash64_sql("CAST(doc_id AS VARCHAR)", "duckdb")
    toks = tokens_sql("text", "duckdb")
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({toks}) AS term
  FROM documents WHERE text IS NOT NULL
), per AS (
  SELECT ({h}) % 8 AS shard, term, COUNT(*) AS n
  FROM tok GROUP BY 1, 2
), ranked AS (
  SELECT shard, term, n,
         ROW_NUMBER() OVER (PARTITION BY shard
                            ORDER BY n DESC, term ASC) AS rn,
         COUNT(*) OVER (PARTITION BY shard) AS total
  FROM per
), sent AS (SELECT * FROM ranked WHERE rn <= 3),
-- an exhausted shard (returned ALL its terms) hides nothing: ES pins
-- its error contribution to 0; only truncated shards contribute.
cutoff AS (
  SELECT shard, CASE WHEN total < 3 THEN 0 ELSE n END AS cut
  FROM ranked WHERE rn = LEAST(3, total)
),
merged AS (SELECT term, SUM(n) AS doc_count FROM sent GROUP BY term),
seen_cut AS (
  SELECT s.term, SUM(c.cut) AS sc
  FROM sent s JOIN cutoff c ON s.shard = c.shard GROUP BY s.term
),
all_cut AS (SELECT SUM(cut) AS ac FROM cutoff)
SELECT m.term, CAST(m.doc_count AS BIGINT) AS doc_count,
       CAST(ac - sc AS BIGINT) AS doc_count_error_upper_bound
FROM merged m JOIN seen_cut USING (term) CROSS JOIN all_cut
ORDER BY doc_count DESC, term ASC LIMIT 5
"""


def q_collapse_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES collapse with inner_hits: top-5 event types by their best
    value, each expanded to its 3 best hits with in-group rank — one
    collapse-key window + a broadcast k-sized winners frame."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        collapse_inner_hits,
    )

    ev = _t(spark, sf_dir, "events").select(
        "event_type", "event_id", F.round("value", 6).alias("value")
    )
    return collapse_inner_hits(
        ev, "event_type", "value", k=5, size=3, tie_col="event_id"
    )


SQL_COLLAPSE_INNER = """
WITH ranked AS (
  SELECT event_type, event_id, ROUND(value, 6) AS value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY ROUND(value, 6) DESC, event_id ASC)
           AS rn
  FROM events WHERE event_type IS NOT NULL
), tops AS (
  SELECT event_type AS grp, CAST(value AS DOUBLE) AS best
  FROM ranked WHERE rn = 1
  ORDER BY best DESC, grp ASC LIMIT 5
)
SELECT r.event_type, r.rn AS inner_rank, ROUND(t.best, 6) AS group_best,
       r.event_id, r.value
FROM ranked r JOIN tops t ON r.event_type = t.grp
WHERE r.rn <= 3
ORDER BY group_best DESC, r.event_type ASC, inner_rank ASC
"""


def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per source domain (pieces/word,
    chars/piece — the tokenizer-eval metric behind sequence-budget
    mixing decisions): one map-combinable agg over map-side counts."""
    from harmonize_search_analyze_spark.operators.text import (
        tokenizer_fertility,
    )

    return tokenizer_fertility(_t(spark, sf_dir, "documents"))


def _sql_tokenizer_fertility() -> str:
    from harmonize_search_analyze_spark.operators.text import (
        tokenizer_fertility_sql,
    )

    return tokenizer_fertility_sql("documents", "text", "source", "duckdb")


def q_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES function_score gauss decay over document length: score 1
    within offset of the origin, exactly `decay` at origin+offset+scale
    (the published formula as pure arithmetic); map-only + TakeOrdered."""
    from harmonize_search_analyze_spark.operators.ranking import (
        decay_rank,
    )

    docs = _t(spark, sf_dir, "documents")
    return decay_rank(
        docs, "n_chars", origin=200.0, scale=80.0, offset=20.0,
        decay=0.5, kind="gauss", k=15,
    )


def _sql_decay_score() -> str:
    from harmonize_search_analyze_spark.operators.ranking import (
        decay_score_sql,
    )

    expr = decay_score_sql(
        "n_chars", origin=200.0, scale=80.0, offset=20.0,
        decay=0.5, kind="gauss", dialect="duckdb",
    )
    return f"""
SELECT doc_id, n_chars, ROUND({expr}, 6) AS score
FROM documents WHERE n_chars IS NOT NULL
ORDER BY score DESC, doc_id ASC LIMIT 15
"""


def q_es_sql_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT through the _sql grammar (Catalyst's native clause —
    map-only Expand, no shuffle): per-region metric rows from the
    nation rollup's wide columns."""
    from harmonize_search_analyze_spark.plans.es_sql import run_es_sql
    from harmonize_search_analyze_spark.sources.catalog import Catalog

    cat = Catalog(spark)
    cat.register("customer", _t(spark, sf_dir, "customer"))
    return run_es_sql(cat, """
SELECT * FROM (
  SELECT c_nationkey,
         ROUND(SUM(c_acctbal), 2) AS total_bal,
         ROUND(AVG(c_acctbal), 2) AS avg_bal,
         CAST(COUNT(*) AS DOUBLE) AS n
  FROM customer GROUP BY c_nationkey
) UNPIVOT (val FOR metric IN (total_bal, avg_bal, n))
ORDER BY c_nationkey, metric
""")


SQL_ES_SQL_UNPIVOT = """
WITH w AS (
  SELECT c_nationkey,
         ROUND(SUM(c_acctbal), 2) AS total_bal,
         ROUND(AVG(c_acctbal), 2) AS avg_bal,
         CAST(COUNT(*) AS DOUBLE) AS n
  FROM customer GROUP BY c_nationkey
)
SELECT c_nationkey, metric, val FROM (
  SELECT c_nationkey, 'total_bal' AS metric, total_bal AS val FROM w
  UNION ALL SELECT c_nationkey, 'avg_bal', avg_bal FROM w
  UNION ALL SELECT c_nationkey, 'n', n FROM w
)
ORDER BY c_nationkey, metric
"""


def q_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot diff (dataset versioning): two deterministic
    views of documents — ids ending 9 only in 'new' (added), ids
    ending 0 only in 'old' (removed), ids ending 2 edited (changed) —
    one digest projection per side + one co-located full outer join."""
    from harmonize_search_analyze_spark.operators.dedup import (
        corpus_diff,
    )

    docs = _t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    old = docs.where(F.col("doc_id") % 10 != 9)
    new = docs.where(F.col("doc_id") % 10 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 == 2, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")),
    )
    return corpus_diff(old, new, "doc_id", "text")


def _sql_corpus_diff() -> str:
    from harmonize_search_analyze_spark.operators.dedup import (
        corpus_diff_sql,
    )

    inner = corpus_diff_sql("o_side", "n_side", "doc_id", "text", "duckdb")
    # splice the twin's own CTE chain onto the view-construction CTEs
    inner = inner.replace("WITH ", "", 1).lstrip()
    return f"""
WITH base AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
o_side AS (SELECT * FROM base WHERE doc_id % 10 <> 9),
n_side AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 2 THEN text || ' v2' ELSE text END AS text
  FROM base WHERE doc_id % 10 <> 0
),
{inner}
"""


def q_es_sql_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES SQL PIVOT clause (the _sql endpoint's pivot syntax) through
    the fourth grammar: rides Catalyst's native PIVOT — one hash agg
    with conditional partials, never N scans. Oracle is the standard
    conditional-aggregation rewrite."""
    from harmonize_search_analyze_spark.plans.es_sql import run_es_sql
    from harmonize_search_analyze_spark.sources.catalog import Catalog

    cat = Catalog(spark)
    cat.register("lineitem", _t(spark, sf_dir, "lineitem"))
    return run_es_sql(cat, """
SELECT * FROM (SELECT l_returnflag, l_linestatus, l_quantity
               FROM lineitem)
PIVOT (ROUND(SUM(l_quantity), 2) FOR l_linestatus IN ('O' AS o, 'F' AS f))
ORDER BY l_returnflag
""")


SQL_ES_SQL_PIVOT = """
SELECT l_returnflag,
       ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS o,
       ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS f
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q_chat_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instruction-data ops (the SFT pipeline stage): deterministic
    2-turn conversations built from each document (first/second half),
    then validate -> ChatML render -> per-role stats, all map-only
    array HOFs. The oracle re-derives every column from the substrings
    directly, so the gate proves the HOF pipeline, not the synthetic
    construction."""
    from harmonize_search_analyze_spark.operators.chat import (
        chat_render,
        chat_stats,
        chat_validate,
    )

    docs = _t(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    msgs = docs.select(
        "doc_id",
        F.expr(
            "array(named_struct('role', 'user', 'content',"
            " substring(text, 1, length(text) DIV 2)),"
            " named_struct('role', 'assistant', 'content',"
            " substring(text, length(text) DIV 2 + 1,"
            " length(text))))"
        ).alias("messages"),
    )
    out = chat_stats(
        chat_render(chat_validate(msgs), "messages", out_col="rendered"),
        "messages",
    )
    return out.select(
        "doc_id", "n_turns", "valid",
        "n_user", "n_assistant", "n_chars", "rendered",
    ).orderBy("doc_id")


def _sql_chat_render() -> str:
    return r"""
WITH halves AS (
  SELECT doc_id,
         substring(text, 1, length(text) // 2) AS u,
         substring(text, length(text) // 2 + 1, length(text)) AS a
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id,
       2 AS n_turns,
       (length(u) > 0 AND length(a) > 0) AS valid,
       1 AS n_user, 1 AS n_assistant,
       CAST(length(u) + length(a) AS BIGINT) AS n_chars,
       '<|im_start|>user' || chr(10) || u || '<|im_end|>' || chr(10)
         || '<|im_start|>assistant' || chr(10) || a || '<|im_end|>'
         AS rendered
FROM halves ORDER BY doc_id
"""


def q_moving_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """moving_fn ewma over daily event counts (the ES-documented
    recursion folded over the window's collected array — codegen'd
    fold, bucket-level window, ES shift/gap semantics)."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        date_histogram,
        moving_fn,
    )

    daily = date_histogram(
        _t(spark, sf_dir, "events"), "ts", "1 day"
    ).select(F.col("bucket"), F.col("doc_count"))
    return moving_fn(
        daily, "bucket", "doc_count", fn="ewma", window=7, alpha=0.3
    )


SQL_MOVING_EWMA = """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
         COUNT(*) AS doc_count
  FROM events WHERE ts IS NOT NULL GROUP BY 1
), arrs AS (
  SELECT bucket, doc_count,
         list(CAST(doc_count AS DOUBLE)) OVER (
           ORDER BY bucket ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING
         ) AS arr
  FROM daily
)
SELECT bucket, doc_count,
       CASE WHEN arr IS NULL THEN NULL
            ELSE ROUND(list_reduce(arr,
                   (acc, x) -> x * 0.3 + acc * 0.7), 6) END AS moving_fn
FROM arrs ORDER BY bucket
"""


def q_cat_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _cat/indices admin listing: per index doc count + field count
    + aliases, as ONE unioned metadata plan (count(*) reads parquet
    footer statistics after column pruning — no data scan, no per-index
    driver loop)."""
    from harmonize_search_analyze_spark.sources.catalog import Catalog

    cat = Catalog(spark)
    for t in ("events", "documents", "embeddings", "nation"):
        cat.register(t, _t(spark, sf_dir, t))
    cat.create_alias("corpus", "documents")
    return cat.cat_indices("*").withColumn(
        "aliases", F.concat_ws("|", "aliases")
    )


SQL_CAT_INDICES = """
SELECT * FROM (
  SELECT 'documents' AS index, COUNT(*) AS docs, 5 AS fields,
         'corpus' AS aliases FROM documents
  UNION ALL
  SELECT 'embeddings', COUNT(*), 3, '' FROM embeddings
  UNION ALL
  SELECT 'events', COUNT(*), 6, '' FROM events
  UNION ALL
  SELECT 'nation', COUNT(*), 3, '' FROM nation
) ORDER BY index
"""


def q_bitext_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based bitext mining (Artetxe & Schwenk / CCMatrix):
    mutual-nearest pairs across two embedding spaces (labels split by
    parity) scored by the ratio margin that suppresses hub vectors.
    Two k-NN passes + k-bounded mean aggs; nothing quadratic past the
    k-NN step."""
    from harmonize_search_analyze_spark.operators.similarity import (
        bitext_mine,
    )

    # 1-in-5 deterministic sample: exact mining is the DECLARED recall
    # oracle (O(|S|x|T|)); method="ivf" is the unsampled scale path
    # spread=True tried round 11 and measured WORSE (A/B 1.07 -> 2.29 s:
    # the four ~0.5 s 1-task k-NN stages overlap each other; spreading
    # serializes them behind a full-width exchange)
    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") % 5 == 0)
    return bitext_mine(
        emb.where(F.col("label") % 2 == 0),
        emb.where(F.col("label") % 2 == 1),
        k=4,
        threshold=1.0,
        strategy="intersect",
    )


def _sql_bitext_mine() -> str:
    from harmonize_search_analyze_spark.operators.similarity import (
        bitext_mine_sql,
    )

    return bitext_mine_sql(
        "(SELECT * FROM embeddings WHERE vec_id % 5 = 0 AND label % 2 = 0)",
        "(SELECT * FROM embeddings WHERE vec_id % 5 = 0 AND label % 2 = 1)",
        k=4,
        threshold=1.0,
        strategy="intersect",
    )


def q_hubness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-occurrence (N_k) hubness distribution of the embedding space's
    self-5-NN graph (Radovanovic et al. 2010) — the diagnostic for the
    hub pathology that ``bitext_mine``'s margin scoring suppresses: how
    many vectors are never retrieved (n_k = 0 anti-hubs) vs retrieved
    far more than the mean (which is exactly k). One broadcast-scored
    self-join + rank window + two count aggs; same 1-in-5 deterministic
    sample as the bitext recall oracle."""
    from harmonize_search_analyze_spark.operators.similarity import (
        hubness_report,
    )

    emb = _t(spark, sf_dir, "embeddings", spread=True).where(
        F.col("vec_id") % 5 == 0
    )
    return hubness_report(emb, "vec_id", "embedding", k=5)


def _sql_hubness_report() -> str:
    from harmonize_search_analyze_spark.operators.similarity import (
        hubness_report_sql,
    )

    return hubness_report_sql(
        "(SELECT * FROM embeddings WHERE vec_id % 5 = 0)",
        "vec_id",
        "embedding",
        k=5,
    )


def q_warc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC round trip — the Common Crawl ingestion shape: the
    documents table is exported as per-record-gzipped WARC shards (a
    distributed foreachPartition sink), read back with the binaryFile +
    Arrow-map source (parallelism = archive files, zero shuffle), and
    WET-converted with the map-only HTML→text expression. Output is
    (url, text_len); the oracle derives the same rows straight from
    documents with the dual-dialect html_to_text — so the whole
    serialize/gzip/parse/extract path must be lossless to match."""
    import hashlib
    import shutil

    from harmonize_search_analyze_spark.sources.warc import (
        read_warc,
        warc_to_documents,
        write_warc_shards,
    )

    out = "/tmp/sparkgraft_warc_" + hashlib.md5(
        sf_dir.encode()
    ).hexdigest()[:10]
    shutil.rmtree(out, ignore_errors=True)
    docs = (
        _t(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select(
            F.concat(
                F.lit("http://corpus.local/doc/"), F.col("doc_id")
            ).alias("url"),
            F.concat(
                F.lit("<html><body>"), F.col("text"),
                F.lit("</body></html>"),
            ).alias("payload"),
        )
        .repartition(4)
    )
    write_warc_shards(docs, out)
    return (
        warc_to_documents(read_warc(spark, out))
        .select("url", F.length("text").cast("bigint").alias("text_len"))
        .orderBy("url")
    )


def _sql_warc_ingest() -> str:
    from harmonize_search_analyze_spark.operators.web import (
        html_to_text_sql,
    )

    wrapped = "'<html><body>' || text || '</body></html>'"
    txt = html_to_text_sql(wrapped, "duckdb")
    return f"""
SELECT 'http://corpus.local/doc/' || doc_id AS url,
       CAST(LENGTH({txt}) AS BIGINT) AS text_len
FROM documents WHERE text IS NOT NULL
ORDER BY url
"""


def q_moving_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """moving_fn holt (double-exponential smoothing, textbook init —
    the round-5 completion of the MovingFunctions family): one-step
    forecast of daily event counts from the trailing 7-day window,
    as a struct-accumulator fold both engines run identically."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        moving_fn,
    )

    daily = (
        _t(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull())
        .groupBy(F.date_trunc("day", "ts").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )
    return moving_fn(
        daily, "bucket", "doc_count", fn="holt", window=7,
        alpha=0.3, beta=0.1,
    )


def holt_weights(n: int, alpha: float, beta: float) -> list[float]:
    """Holt smoothing is a LINEAR filter: the one-step forecast over a
    window of length n is a fixed dot product sum_i w_i * x_i. Derive
    the weights by folding the recursion over unit basis vectors —
    this powers the DuckDB twin as pure closed-form arithmetic, which
    sidesteps DuckDB 1.0's list_reduce struct-accumulator quirk
    (struct fields update PROGRESSIVELY inside the lambda, so a field
    expression referencing an already-assigned field reads the new
    value — measured, not theorized)."""
    def fold(xs: list[float]) -> float:
        s, b, cnt = xs[0], 0.0, 1
        for x in xs[1:]:
            if cnt == 1:
                s, b, cnt = x, x - s, 2
            else:
                s2 = x * alpha + (s + b) * (1.0 - alpha)
                b = (s2 - s) * beta + b * (1.0 - beta)
                s = s2
                cnt += 1
        return s + b

    return [
        fold([1.0 if j == i else 0.0 for j in range(n)]) for i in range(n)
    ]


def _sql_moving_holt(
    *, window: int = 7, alpha: float = 0.3, beta: float = 0.1
) -> str:
    cases = []
    for n in range(1, window + 1):
        terms = " + ".join(
            f"({w!r}) * arr[{i + 1}]"
            for i, w in enumerate(holt_weights(n, alpha, beta))
        )
        cases.append(f"WHEN {n} THEN {terms}")
    branch = "\n            ".join(cases)
    return f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
         COUNT(*) AS doc_count
  FROM events WHERE ts IS NOT NULL GROUP BY 1
), arrs AS (
  SELECT bucket, doc_count,
         list(CAST(doc_count AS DOUBLE)) OVER (
           ORDER BY bucket ROWS BETWEEN {window} PRECEDING AND 1 PRECEDING
         ) AS arr
  FROM daily
)
SELECT bucket, doc_count,
       ROUND(CASE len(arr)
            {branch}
            ELSE NULL END, 6) AS moving_fn
FROM arrs ORDER BY bucket
"""


def q_significant_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """significant_terms under mutual_information (2x2 pointwise-MI sum
    in bits, include_negatives sign) — same one-agg + broadcast-totals
    plan as the jlh/chi_square gates, different pure arithmetic."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        significant_terms,
    )

    return significant_terms(
        _t(spark, sf_dir, "events"),
        "event_type",
        foreground=F.col("value") > 250,
        heuristic="mutual_information",
    )


SQL_SIGNIFICANT_MI = """
WITH t AS (
  SELECT event_type, COUNT(*) AS bg_count,
         COUNT(CASE WHEN value > 250 THEN 1 END) AS fg_count
  FROM events WHERE event_type IS NOT NULL GROUP BY event_type
), tot AS (
  SELECT SUM(bg_count) AS bg_total, SUM(fg_count) AS fg_total FROM t
), c AS (
  SELECT event_type, fg_count, bg_count,
         CAST(fg_count AS DOUBLE) AS n11,
         CAST(bg_count - fg_count AS DOUBLE) AS n01,
         CAST(fg_total - fg_count AS DOUBLE) AS n10,
         CAST(bg_total - bg_count - (fg_total - fg_count) AS DOUBLE) AS n00,
         CAST(bg_total AS DOUBLE) AS n
  FROM t, tot
), m AS (
  SELECT event_type, fg_count, bg_count,
         ((CASE WHEN n11 <= 0 THEN 0.0
                ELSE (n11 / n) * ln((n * n11) / ((n11 + n10) * (n11 + n01))) END)
        + (CASE WHEN n10 <= 0 THEN 0.0
                ELSE (n10 / n) * ln((n * n10) / ((n11 + n10) * (n10 + n00))) END)
        + (CASE WHEN n01 <= 0 THEN 0.0
                ELSE (n01 / n) * ln((n * n01) / ((n01 + n00) * (n11 + n01))) END)
        + (CASE WHEN n00 <= 0 THEN 0.0
                ELSE (n00 / n) * ln((n * n00) / ((n01 + n00) * (n10 + n00))) END))
         / ln(2.0) AS mi,
         CASE WHEN n11 * (n01 + n00) < n01 * (n11 + n10)
              THEN -1.0 ELSE 1.0 END AS sgn
  FROM c
)
SELECT event_type, fg_count, bg_count, ROUND(sgn * mi, 6) AS score
FROM m WHERE fg_count > 0
ORDER BY score DESC, event_type ASC LIMIT 10
"""


def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnosis over orders.o_custkey: per-key share,
    normalized entropy, max/mean ratio — the pre-flight check before
    salting a 100 TB join key. Summary = one map-combinable agg
    broadcast back (never a whole-frame window)."""
    from harmonize_search_analyze_spark.operators.analytics import (
        skew_report,
    )

    return skew_report(_t(spark, sf_dir, "orders"), "o_custkey", top=15)


def _sql_skew_report() -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        skew_report_sql,
    )

    return skew_report_sql("orders", "o_custkey", "duckdb", top=15)


def q_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES TSDB _downsample: per (event_type, 3h bucket) gauge
    pre-aggregates (min/max/sum/value_count recompose any downstream
    metric exactly) + counter last_value via one struct-max — the
    retention path where the raw series index drops."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        downsample,
    )

    return downsample(
        _t(spark, sf_dir, "events"), "ts", "3 hours",
        dims=["event_type"], gauges=["value"], counters=["event_id"],
    )


def _sql_downsample() -> str:
    from harmonize_search_analyze_spark.operators.aggregations import (
        downsample_sql,
    )

    return downsample_sql(
        "events", "ts", "3 hours", "duckdb",
        dims=["event_type"], gauges=["value"], counters=["event_id"],
    )


def q_hll_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group HyperLogLog (distinct events per event_type): one
    (group, bucket, MAX rho) map-combinable agg — the 100 TB 'distinct
    per segment' path where per-group exact distincts shuffle the
    world; registers merge by MAX across days/clusters."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        hll_cardinality_by,
    )

    return hll_cardinality_by(
        _t(spark, sf_dir, "events"), "event_type", "event_id", p=10
    )


def _sql_hll_by() -> str:
    from harmonize_search_analyze_spark.functions.hashing import (
        hll_cardinality_by_sql,
    )

    return hll_cardinality_by_sql(
        "events", "event_type", "event_id", "duckdb", p=10
    )


def q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram-LM perplexity scoring (JM smoothing, first
    token unigram-backed) — the pair stream is zip-with-shift inside each
    row, so no per-document window shuffle exists in the plan."""
    from harmonize_search_analyze_spark.operators.contamination import (
        bigram_lm_score,
    )

    docs = _t(spark, sf_dir, "documents")
    return bigram_lm_score(docs, lam=0.8).orderBy("doc_id")


def _sql_bigram_lm() -> str:
    from harmonize_search_analyze_spark.operators.contamination import (
        bigram_lm_oracle_sql,
    )

    return bigram_lm_oracle_sql("documents", lam=0.8)


_EXPLAIN_TERMS = ["spark", "data", "query"]


def q_explain_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _explain API: per-term BM25 breakdown (tf, doc_freq, idf,
    saturation, contribution) for doc 7 — same CTE pipeline as
    bm25_search so the explanation can't drift from the ranking."""
    from harmonize_search_analyze_spark.operators.ranking import (
        explain_score,
    )

    docs = _t(spark, sf_dir, "documents")
    return explain_score(docs, "doc_id", "text", _EXPLAIN_TERMS, 7)


def _sql_explain_score() -> str:
    from harmonize_search_analyze_spark.operators.ranking import (
        explain_score_sql,
    )

    return explain_score_sql(
        "documents", "doc_id", "text", _EXPLAIN_TERMS, 7, "duckdb"
    )


_MSEARCH = {
    "high_value": {"range": {"o_totalprice": {"gte": 300000}}},
    "urgent": {"match": {"o_orderpriority": "1-URGENT"}},
    "none": {"range": {"o_totalprice": {"gte": 10**9}}},
}


def q_msearch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _msearch: three searches answered from ONE orders scan (shared
    percolate projection), each summarized as total hits + top-3 by
    totalprice."""
    from harmonize_search_analyze_spark.plans.compiler import msearch

    return msearch(
        _t(spark, sf_dir, "orders"),
        _MSEARCH,
        sort_field="o_totalprice",
        id_col="o_orderkey",
        k=3,
    )


SQL_MSEARCH = """
WITH m AS (
  SELECT 'high_value' AS query_name, o_orderkey, o_totalprice
  FROM orders WHERE o_totalprice >= 300000
  UNION ALL
  SELECT 'urgent', o_orderkey, o_totalprice
  FROM orders WHERE o_orderpriority = '1-URGENT'
), r AS (
  SELECT query_name,
         COUNT(*) OVER (PARTITION BY query_name) AS doc_count,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_name
              ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER)
           AS hit_rank,
         o_orderkey, o_totalprice
  FROM m
)
SELECT query_name, CAST(doc_count AS BIGINT) AS doc_count, hit_rank,
       o_orderkey, o_totalprice
FROM r WHERE hit_rank <= 3 ORDER BY query_name, hit_rank
"""


def q_unigram_seed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unigram-LM trainer's SEED stage (Kudo 2018 §3.2) made
    SQL-expressible: weighted substring-candidate frequencies over the
    corpus word-count table (every substring occurrence up to length 8,
    weighted by word frequency — exactly operators/unigram.py's
    ``_seed_pieces_local`` formula), ranked as the trainer ranks its
    multi-char candidates (freq DESC, piece ASC), top-40. The
    driver-hashable oracle twin of the iterative ``unigram_train`` EM
    loop (which has no SQL expression)."""
    from harmonize_search_analyze_spark.operators.bpe import _word_counts

    docs = _t(spark, sf_dir, "documents")
    words = _word_counts(docs, "text")
    pieces = words.select(
        "weight",
        F.explode(F.expr(
            "flatten(transform(sequence(1, length(word)),"
            " j -> transform(sequence(0, least(7, length(word) - j)),"
            " l -> substr(word, j, l + 1))))"
        )).alias("piece"),
    )
    return (
        pieces.where(F.length("piece") >= 2)
        .groupBy("piece")
        .agg(F.sum("weight").alias("freq"))
        .orderBy(F.desc("freq"), "piece")
        .limit(40)
    )


SQL_UNIGRAM_SEED = """
WITH words AS (
  SELECT word, COUNT(*) AS weight FROM (
    SELECT unnest(list_filter(
             regexp_split_to_array(lower(text), '[^a-z0-9]+'),
             t -> t != '')) AS word
    FROM documents WHERE text IS NOT NULL
  ) GROUP BY word
), pieces AS (
  SELECT weight, substr(word, j, l) AS piece
  FROM words,
       LATERAL (SELECT unnest(range(1, length(word) + 1)) AS j) a,
       LATERAL (SELECT unnest(
         range(1, least(8, length(word) - j + 1) + 1)) AS l) b
)
SELECT piece, CAST(SUM(weight) AS BIGINT) AS freq
FROM pieces WHERE length(piece) >= 2
GROUP BY piece ORDER BY freq DESC, piece ASC LIMIT 40
"""


def q_unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM tokenizer training (Kudo 2018 / SentencePiece): seed
    substrings -> Viterbi hard-EM -> prune to vocab, all on the distinct
    word-count table (one corpus pass total). Iterative like bpe_train —
    rows-only gate; the returned (rank, piece, logprob) table IS the
    model, with the encoded corpus piece total as a self-consistency
    check."""
    from harmonize_search_analyze_spark.operators.unigram import (
        unigram_encode,
        unigram_train,
    )

    docs = _t(spark, sf_dir, "documents")
    model = unigram_train(
        docs, "text", vocab_size=120, seed_size=1500, n_iters=2
    )
    enc = unigram_encode(docs, model, "text", "doc_id")
    total = int(
        enc.agg(F.sum("n_pieces").alias("t")).collect()[0]["t"]
    )
    rows = [
        (i, piece, lp, total) for i, (piece, lp) in enumerate(model)
    ]
    return _lf(
        spark, rows, "rank int, piece string, logprob double, corpus_pieces long"
    )


_RETRIEVER_SPEC = {
    "rrf": {
        "rank_window_size": 50,
        "rank_constant": 60,
        "retrievers": [
            {"standard": {"query": {"match": {"text": "spark join stream"}}}},
            {"knn": {"query_vector": None, "k": 50,  # filled at call time
                     "filter": {"range": {"label": {"gte": 1}}}}},
        ],
    }
}


def q_retriever_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES retriever tree (8.x retriever API): the spec is DATA — an rrf
    root fusing a standard (BM25) retriever with a filtered knn
    retriever, executed through the engine's gated bm25/knn_filtered/rrf
    operators. Returns the fused (doc_id, rank) top-10."""
    import copy

    from harmonize_search_analyze_spark.operators.retriever import (
        run_retriever,
    )

    spec = copy.deepcopy(_RETRIEVER_SPEC)
    spec["rrf"]["retrievers"][1]["knn"]["query_vector"] = _QUERY_VEC
    return run_retriever(
        spec,
        docs=_t(spark, sf_dir, "documents"),
        embeddings=_t(spark, sf_dir, "embeddings"),
        k=10,
    )


def _sql_retriever_rrf() -> str:
    from harmonize_search_analyze_spark.operators.ranking import (
        bm25_search_sql,
    )

    bm25 = bm25_search_sql(
        "documents", "doc_id", "text", _BM25_TERMS, "duckdb", 50
    )
    qlit = "[" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in _QUERY_VEC) + "]"
    qnorm = math.sqrt(sum(v * v for v in _QUERY_VEC))
    dot = (
        "list_sum(list_transform(list_zip(embedding::DOUBLE[], "
        f"{qlit}), p -> p[1] * p[2]))"
    )
    nrm = "sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))"
    return f"""
WITH lex AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM ({bm25}) b
), sem_scored AS (
  SELECT vec_id AS doc_id,
         ROUND({dot} / ({nrm} * {qnorm!r}), 6) AS cosine
  FROM embeddings WHERE label >= 1
  ORDER BY cosine DESC, doc_id ASC LIMIT 50
), sem AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id ASC) AS rank
  FROM sem_scored
), u AS (
  SELECT doc_id, rank FROM lex UNION ALL SELECT doc_id, rank FROM sem
), fused AS (
  SELECT doc_id, ROUND(SUM(1.0 / (60.0 + rank)), 6) AS rrf_score
  FROM u GROUP BY doc_id
  ORDER BY rrf_score DESC, doc_id ASC LIMIT 10
)
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc_id ASC)
            AS INTEGER) AS rank
FROM fused ORDER BY rank
"""


def q_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-calibration PR sweep: cosine-to-query as the score
    (rounded to 2 decimals to bound the threshold count), label==1 as the
    positive class. Raw rows collapse to per-threshold counts BEFORE the
    cumulative window — the window input is threshold-level, never
    row-level."""
    from harmonize_search_analyze_spark.operators.analytics import pr_curve
    from harmonize_search_analyze_spark.operators.similarity import (
        cosine_score,
    )

    emb = _t(spark, sf_dir, "embeddings").select(
        F.round(cosine_score("embedding", _QUERY_VEC), 2).alias("score"),
        (F.col("label") == 1).cast("int").alias("y"),
    )
    return pr_curve(emb, "score", "y")


def _sql_pr_curve() -> str:
    qlit = "[" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in _QUERY_VEC) + "]"
    qnorm = math.sqrt(sum(v * v for v in _QUERY_VEC))
    dot = (
        "list_sum(list_transform(list_zip(embedding::DOUBLE[], "
        f"{qlit}), p -> p[1] * p[2]))"
    )
    nrm = "sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))"
    return f"""
WITH scored AS (
  SELECT ROUND({dot} / NULLIF({nrm} * {qnorm!r}, 0.0), 2) AS score,
         CASE WHEN label IS NULL THEN NULL
              WHEN label = 1 THEN 1 ELSE 0 END AS y
  FROM embeddings
), per AS (
  SELECT score AS threshold, COUNT(*) AS n, SUM(y) AS np
  FROM scored WHERE score IS NOT NULL AND y IS NOT NULL
  GROUP BY score
), tot AS (SELECT SUM(np) AS total_pos FROM per)
SELECT threshold,
       CAST(SUM(np) OVER w AS BIGINT) AS tp,
       CAST(SUM(n - np) OVER w AS BIGINT) AS fp,
       ROUND(CAST(SUM(np) OVER w AS DOUBLE)
             / CAST(SUM(n) OVER w AS DOUBLE), 6) AS precision,
       ROUND(CAST(SUM(np) OVER w AS DOUBLE)
             / NULLIF(CAST(total_pos AS DOUBLE), 0.0), 6) AS recall,
       ROUND(2.0 * (CAST(SUM(np) OVER w AS DOUBLE) / CAST(SUM(n) OVER w AS DOUBLE))
                 * (CAST(SUM(np) OVER w AS DOUBLE) / NULLIF(CAST(total_pos AS DOUBLE), 0.0))
             / NULLIF((CAST(SUM(np) OVER w AS DOUBLE) / CAST(SUM(n) OVER w AS DOUBLE))
                 + (CAST(SUM(np) OVER w AS DOUBLE) / NULLIF(CAST(total_pos AS DOUBLE), 0.0)),
               0.0), 6) AS f1
FROM per CROSS JOIN tot
WINDOW w AS (ORDER BY threshold DESC ROWS UNBOUNDED PRECEDING)
ORDER BY threshold DESC
"""


def q_terms_enum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _terms_enum: alphabetical prefix enumeration of distinct
    keyword terms (autocomplete primitive) — sargable startswith filter
    pushed to the scan, distinct, TakeOrdered."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        terms_enum,
    )

    return terms_enum(
        _t(spark, sf_dir, "part"), "p_type", prefix="STANDARD", size=15
    )


SQL_TERMS_ENUM = """
SELECT DISTINCT p_type AS term FROM part
WHERE p_type IS NOT NULL AND p_type LIKE 'STANDARD%'
ORDER BY term ASC LIMIT 15
"""


def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset shard assignment + manifest: deterministic hash-shuffled
    global positions (distributed contiguous rank — range partition +
    windows + broadcast offsets, no single-reducer sort), 200 docs/shard,
    per-shard doc and byte totals."""
    from harmonize_search_analyze_spark.operators.sharding import (
        assign_shards,
        shard_manifest,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    a = assign_shards(docs, "doc_id", docs_per_shard=200)
    return shard_manifest(a, size_col="n_chars")


def _sql_shard_manifest() -> str:
    from harmonize_search_analyze_spark.operators.sharding import (
        assign_shards_sql,
    )

    inner = assign_shards_sql(
        "documents", "doc_id", ["doc_id", "n_chars"], docs_per_shard=200
    )
    return f"""
WITH a AS ({inner})
SELECT shard_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_bytes
FROM a GROUP BY shard_id ORDER BY shard_id
"""


_SPARSE_WEIGHTS = {"spark": 2.0, "join": 1.0, "stream": 0.5}


def q_sparse_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES sparse_vector query (ELSER/SPLADE learned-sparse shape):
    term->weight query vector dotted against sublinear-tf document
    weights — token explode pre-filtered to query terms, VALUES weight
    relation broadcast, TakeOrdered top-10."""
    from harmonize_search_analyze_spark.operators.ranking import (
        sparse_vector_search,
    )

    return sparse_vector_search(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        _SPARSE_WEIGHTS, k=10,
    )


def _sql_sparse_search() -> str:
    from harmonize_search_analyze_spark.operators.ranking import (
        sparse_vector_sql,
    )

    return sparse_vector_sql(
        "documents", "doc_id", "text", _SPARSE_WEIGHTS, "duckdb", 10
    )


def q_significant_bg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """significant_terms with ES's background_filter: high-value events
    vs a NARROWED background (events of users < 3000 only), not the
    whole index — same one-agg + broadcast-totals plan with conditional
    background counts."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        significant_terms,
    )

    return significant_terms(
        _t(spark, sf_dir, "events"),
        "event_type",
        foreground=F.col("value") > 250,
        background_filter=F.col("user_id") < 3000,
    )


SQL_SIGNIFICANT_BG = """
WITH t AS (
  SELECT event_type,
         COUNT(CASE WHEN user_id < 3000 THEN 1 END) AS bg_count,
         COUNT(CASE WHEN value > 250 THEN 1 END) AS fg_count
  FROM events
  WHERE event_type IS NOT NULL AND (user_id < 3000 OR value > 250)
  GROUP BY event_type
), tot AS (
  SELECT SUM(bg_count) AS bg_total, SUM(fg_count) AS fg_total FROM t
)
SELECT event_type, fg_count, bg_count,
       ROUND((CAST(fg_count AS DOUBLE) / fg_total
              - CAST(bg_count AS DOUBLE) / bg_total)
             * ((CAST(fg_count AS DOUBLE) / fg_total)
                / NULLIF(CAST(bg_count AS DOUBLE) / bg_total, 0.0)), 6)
         AS score
FROM t, tot WHERE fg_count > 0
ORDER BY score DESC, event_type LIMIT 10
"""


_CURATION_STAGES = [
    {"lang_filter": {"keep": ["en"]}},
    {"quality_filter": {"min_score": 0.4}},
    {"length_filter": {"min_chars": 100, "max_chars": 5000}},
    {"pii_redact": {}},
    {"exact_dedup": {}},
    {"line_dedup": {"min_line_chars": 10}},
    {"sample": {"fraction": 0.5}},
]


def q_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-driven curation pipeline (Dolma/datatrove config shape):
    lang-ID -> quality -> length -> PII redaction -> exact dedup ->
    corpus-wide line dedup -> deterministic sample, compiled from ONE
    dual-dialect stage generator. Filters fuse into the scan; the dedup
    windows are the wide stages. final_chars witnesses the text
    transforms end-to-end."""
    from harmonize_search_analyze_spark.operators.curation_pipeline import (
        run_corpus_pipeline,
    )

    # spread=True tried round 11 and measured WORSE (A/B 1.43 -> 1.82 s
    # with the line_dedup checkpoint in both arms — the overlap/exchange
    # trade, see graph_explore note)
    docs = _t(spark, sf_dir, "documents")
    return (
        run_corpus_pipeline(docs, _CURATION_STAGES)
        .select(
            "doc_id", "lang", "n_chars",
            F.length("text").cast("bigint").alias("final_chars"),
        )
        .orderBy("doc_id")
    )


def _sql_corpus_pipeline() -> str:
    from harmonize_search_analyze_spark.operators.curation_pipeline import (
        corpus_pipeline_sql,
    )

    inner = corpus_pipeline_sql(
        "documents", _CURATION_STAGES,
        ["doc_id", "lang", "n_chars", "text"],
    )
    return f"""
SELECT doc_id, lang, n_chars,
       CAST(length(text) AS BIGINT) AS final_chars
FROM ({inner}) ORDER BY doc_id
"""


def q_counter_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TSDB counter rate (ES time_series rate / PromQL semantics):
    per-series reset-aware increase per 60s — one series-keyed window
    sharing its exchange with the per-series agg."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        counter_rate,
    )

    ev = _t(spark, sf_dir, "events").where(F.col("event_type").isNotNull())
    return counter_rate(ev, "event_type", "ts", "value", per_seconds=60)


SQL_COUNTER_RATE = """
WITH s AS (
  SELECT event_type AS series, epoch(ts) AS e, CAST(value AS DOUBLE) AS v,
         LAG(CAST(value AS DOUBLE), 1) OVER (
           PARTITION BY event_type ORDER BY ts ASC, value ASC) AS pv
  FROM events
  WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL
)
SELECT series, CAST(COUNT(*) AS BIGINT) AS samples,
       ROUND(SUM(CASE WHEN pv IS NULL THEN NULL
                      WHEN v >= pv THEN v - pv ELSE v END), 6) AS increase,
       ROUND(SUM(CASE WHEN pv IS NULL THEN NULL
                      WHEN v >= pv THEN v - pv ELSE v END) * 60.0
             / NULLIF(MAX(e) - MIN(e), 0.0), 6) AS rate
FROM s GROUP BY series ORDER BY series
"""


def q_composite_datehist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES composite agg with a date_histogram value source: (day,
    event_type) buckets paged after ('2024-01-08', 'signup') — derived
    keys computed in-plan, after-key inequality below the agg."""
    import datetime as dt

    from harmonize_search_analyze_spark.operators.aggregations import (
        composite_agg,
    )

    ev = _t(spark, sf_dir, "events")
    return composite_agg(
        ev,
        sources=[
            ("day", {"date_histogram": {"field": "ts",
                                        "interval": "1 day"}}),
            ("event_type", None),
        ],
        size=8,
        after={"day": dt.datetime(2024, 1, 8), "event_type": "signup"},
    )


SQL_COMPOSITE_DATEHIST = """
WITH k AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
)
SELECT day, event_type, COUNT(*) AS doc_count
FROM k
WHERE day > TIMESTAMP '2024-01-08'
   OR (day = TIMESTAMP '2024-01-08' AND event_type > 'signup')
GROUP BY day, event_type
ORDER BY day, event_type
LIMIT 8
"""


def q_children_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES children aggregation: order buckets (by orderpriority) with
    the lineitem child doc count per bucket — parent-side bucket agg +
    key-projected broadcast join + child agg."""
    from harmonize_search_analyze_spark.operators.joins import children_agg

    return children_agg(
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
        parent_key="o_orderkey",
        child_key="l_orderkey",
        bucket_field="o_orderpriority",
        k=10,
    )


SQL_CHILDREN_AGG = """
WITH pc AS (
  SELECT o_orderpriority AS bucket, COUNT(*) AS parent_count
  FROM orders WHERE o_orderpriority IS NOT NULL GROUP BY 1
), cc AS (
  SELECT o.o_orderpriority AS bucket, COUNT(*) AS child_count
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderpriority IS NOT NULL GROUP BY 1
)
SELECT pc.bucket, CAST(parent_count AS BIGINT) AS parent_count,
       CAST(COALESCE(child_count, 0) AS BIGINT) AS child_count
FROM pc LEFT JOIN cc ON pc.bucket = cc.bucket
ORDER BY child_count DESC, pc.bucket ASC LIMIT 10
"""


def q_step_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-path transition edges (Sankey panel): consecutive-event
    pairs per user via windowless zip-with-shift over each user's one
    sorted event array — two hash aggs, zero windows."""
    from harmonize_search_analyze_spark.operators.analytics import (
        step_transitions,
    )

    return step_transitions(
        _t(spark, sf_dir, "events"), "user_id", "ts", "event_type", k=20
    )


SQL_STEP_TRANSITIONS = """
WITH seq AS (
  SELECT user_id,
         list_sort(list(struct_pack(t := ts, e := event_type))) AS s
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY user_id
), pairs AS (
  SELECT unnest(CASE WHEN len(s) >= 2
                THEN list_transform(range(1, len(s)),
                     i -> struct_pack(f := s[i].e, g := s[i + 1].e))
                ELSE [] END) AS p
  FROM seq
)
SELECT p.f AS from_step, p.g AS to_step,
       CAST(COUNT(*) AS BIGINT) AS transitions
FROM pairs GROUP BY 1, 2
ORDER BY transitions DESC, from_step ASC, to_step ASC LIMIT 20
"""


def q_seasonal_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware anomalies: hourly counts scored against the
    same-hour-of-day profile (mean/stddev), |z| >= 2 — one raw agg, then
    bucket-level profile join."""
    from harmonize_search_analyze_spark.operators.analytics import (
        seasonal_anomalies,
    )

    return seasonal_anomalies(
        _t(spark, sf_dir, "events"), "ts", threshold=2.0
    )


SQL_SEASONAL_ANOMALIES = """
WITH hourly AS (
  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
         COUNT(*) AS doc_count
  FROM events WHERE ts IS NOT NULL GROUP BY 1
), prof AS (
  SELECT EXTRACT(hour FROM bucket) AS hour_of_day,
         AVG(doc_count) AS mu, STDDEV_POP(doc_count) AS sd
  FROM hourly GROUP BY 1
)
SELECT bucket, doc_count,
       CAST(EXTRACT(hour FROM bucket) AS INTEGER) AS hour_of_day,
       ROUND(mu, 6) AS expected,
       ROUND((doc_count - mu) / NULLIF(sd, 0.0), 6) AS z
FROM hourly JOIN prof ON EXTRACT(hour FROM bucket) = prof.hour_of_day
WHERE ABS(ROUND((doc_count - mu) / NULLIF(sd, 0.0), 6)) >= 2.0
ORDER BY bucket
"""


def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS drift: src0 vs src1 document-length distributions —
    per-value conditional counts, one bounded CDF window, 1-row result."""
    from harmonize_search_analyze_spark.operators.analytics import ks_drift

    return ks_drift(
        _t(spark, sf_dir, "documents"), "n_chars", "source", "src0", "src1"
    )


SQL_KS_DRIFT = """
WITH per AS (
  SELECT n_chars AS v,
         COUNT(CASE WHEN source = 'src0' THEN 1 END) AS ca,
         COUNT(CASE WHEN source = 'src1' THEN 1 END) AS cb
  FROM documents
  WHERE n_chars IS NOT NULL AND source IN ('src0', 'src1')
  GROUP BY n_chars
), tot AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM per),
gaps AS (
  SELECT v, na, nb,
         ABS(CAST(SUM(ca) OVER w AS DOUBLE) / na
             - CAST(SUM(cb) OVER w AS DOUBLE) / nb) AS g
  FROM per CROSS JOIN tot
  WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)
)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       ROUND(g, 6) AS ks_stat, v AS ks_at
FROM gaps ORDER BY g DESC, v ASC LIMIT 1
"""


def q_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi2 independence test: event_type x (user_id % 3) — one
    contingency agg, marginals from the cell frame, 1-row result."""
    from harmonize_search_analyze_spark.operators.analytics import (
        chi2_independence,
    )

    ev = _t(spark, sf_dir, "events").select(
        "event_type", (F.col("user_id") % 3).alias("ubucket")
    )
    return chi2_independence(ev, "event_type", "ubucket")


SQL_CHI2_INDEPENDENCE = """
WITH obs AS (
  SELECT event_type AS a, user_id % 3 AS b, COUNT(*) AS o
  FROM events WHERE event_type IS NOT NULL AND user_id IS NOT NULL
  GROUP BY 1, 2
), rm AS (SELECT a, SUM(o) AS ra FROM obs GROUP BY a),
cm AS (SELECT b, SUM(o) AS cb FROM obs GROUP BY b),
cells AS (
  SELECT rm.a, cm.b, ra, cb, COALESCE(o, 0) AS o
  FROM rm CROSS JOIN cm
  LEFT JOIN obs ON obs.a = rm.a AND obs.b = cm.b
),
tot AS (SELECT SUM(o) AS n FROM obs),
ks AS (SELECT (SELECT COUNT(*) FROM rm) AS ka,
              (SELECT COUNT(*) FROM cm) AS kb)
SELECT CAST(MAX(n) AS BIGINT) AS n,
       CAST((MAX(ka) - 1) * (MAX(kb) - 1) AS BIGINT) AS dof,
       ROUND(SUM(
         (CAST(o AS DOUBLE) - CAST(ra AS DOUBLE) * cb / n)
         * (CAST(o AS DOUBLE) - CAST(ra AS DOUBLE) * cb / n)
         / (CAST(ra AS DOUBLE) * cb / n)), 6) AS chi2
FROM cells CROSS JOIN tot CROSS JOIN ks
"""


def q_rollup_answered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate query rewrite: the daily date_histogram is
    answered FROM the hourly rollup (coarsest dividing grain), never the
    raw events — the oracle is the raw-scan daily answer, so the gate
    proves rewrite exactness."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        date_histogram,
        rollup_rewrite,
    )

    ev = _t(spark, sf_dir, "events")
    hourly = date_histogram(ev, "ts", "1 hour")
    out, src = rollup_rewrite(
        ev, "ts", "1 day", {"1 hour": hourly}
    )
    assert src == "1 hour"
    return out


def q_terms_by_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES terms agg ordered by a sub-agg metric (Kibana 'order by sum of
    field'): returnflag buckets ranked by total quantity, one hash agg +
    TakeOrdered."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        terms_ordered_by_metric,
    )

    return terms_ordered_by_metric(
        _t(spark, sf_dir, "lineitem"), "l_returnflag", "l_quantity",
        metric="sum", k=5,
    )


SQL_TERMS_BY_METRIC = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS doc_count,
       ROUND(SUM(l_quantity), 6) AS metric
FROM lineitem WHERE l_returnflag IS NOT NULL
GROUP BY l_returnflag
ORDER BY metric DESC NULLS LAST, l_returnflag ASC LIMIT 5
"""


def q_span_not_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene span_not + sloppy match_phrase: docs where 'spark' occurs
    outside a +-1 window of 'slow' AND 'query plan' appears in order
    within 2 gaps — both position-array expressions, no explode."""
    from harmonize_search_analyze_spark.plans.compiler import compile_query

    docs = _t(spark, sf_dir, "documents")
    q = {"bool": {"must": [
        {"span_not": {
            "include": {"span_term": {"text": "spark"}},
            "exclude": {"span_term": {"text": "slow"}},
            "pre": 1, "post": 1,
        }},
        {"match_phrase": {"text": {"query": "merge sort", "slop": 2}}},
    ]}}
    return (
        docs.where(compile_query(q))
        .select("doc_id")
        .orderBy("doc_id")
        .limit(20)
    )


def _sql_span_not_search() -> str:
    from harmonize_search_analyze_spark.functions.intervals import (
        intervals_match_sql,
        span_not_sql,
    )

    sn = span_not_sql("text", "spark", "slow", "duckdb", pre=1, post=1)
    ph = intervals_match_sql(
        "text", "merge sort", "duckdb", max_gaps=2, ordered=True
    )
    return f"""
SELECT doc_id FROM documents
WHERE ({sn}) AND ({ph})
ORDER BY doc_id LIMIT 20
"""


def q_highlight_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES highlight with number_of_fragments: first-3 'spark' snippets
    per doc (one lowercase split per row, let-bound), docs with >= 2
    fragments."""
    from harmonize_search_analyze_spark.operators.text import (
        highlight_fragments_sql,
    )

    e = highlight_fragments_sql(
        "text", "spark", "spark", window=20, n_fragments=3
    )
    docs = _t(spark, sf_dir, "documents")
    # fragments is array<string>; both engines join with the same rare
    # separator so the driver canonicalizer gets a hashable scalar.
    return (
        docs.select("doc_id", F.expr(e).alias("fragments"))
        .where(F.size("fragments") >= 2)
        .withColumn("fragments", F.array_join("fragments", " ||| "))
        .orderBy("doc_id")
        .limit(15)
    )


def _sql_highlight_multi() -> str:
    from harmonize_search_analyze_spark.operators.text import (
        highlight_fragments_sql,
    )

    e = highlight_fragments_sql(
        "text", "duckdb", "spark", window=20, n_fragments=3
    )
    return f"""
SELECT doc_id, array_to_string({e}, ' ||| ') AS fragments FROM documents
WHERE len({e}) >= 2
ORDER BY doc_id LIMIT 15
"""


def q_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``global`` aggregation: purchase-scoped event stats next to the
    corpus-wide stats, both from ONE scan (conditional aggregates, no
    second pass over the index)."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        global_agg,
    )

    ev = _t(spark, sf_dir, "events")
    return global_agg(
        ev,
        F.col("event_type") == "purchase",
        {
            "n_events": ("count", "*"),
            "avg_value": ("avg", "value"),
            "max_value": ("max", "value"),
        },
    ).orderBy("scope")


SQL_GLOBAL_AGG = """
WITH one AS (
  SELECT
    COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS q_n,
    AVG(CASE WHEN event_type = 'purchase' THEN value END) AS q_avg,
    MAX(CASE WHEN event_type = 'purchase' THEN value END) AS q_max,
    COUNT(*) AS g_n, AVG(value) AS g_avg, MAX(value) AS g_max
  FROM events
)
SELECT scope, n_events, avg_value, max_value FROM (
  SELECT 'query' AS scope, q_n AS n_events, q_avg AS avg_value,
         q_max AS max_value FROM one
  UNION ALL
  SELECT 'global', g_n, g_avg, g_max FROM one
) ORDER BY scope
"""


def q_kql_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kibana-query-bar KQL over events, compiled through parse_kql ->
    ES DSL -> the one shared predicate compiler: value group, range op,
    wildcard, NOT, and/or precedence all in one expression."""
    from harmonize_search_analyze_spark.plans.kql import kql_query

    ev = _t(spark, sf_dir, "events")
    pred = kql_query(
        "event_type:(purchase or refund) and value >= 250 "
        "or event_type:s?gnup and value < 5 and not user_id >= 900"
    )
    return (
        ev.where(pred)
        .select("event_id", "event_type", "value")
        .orderBy("event_id")
        .limit(50)
    )


SQL_KQL_SEARCH = """
SELECT event_id, event_type, value FROM events
WHERE (event_type IN ('purchase', 'refund') AND value >= 250)
   OR (regexp_full_match(event_type, 's.gnup') AND value < 5
       AND NOT user_id >= 900)
ORDER BY event_id LIMIT 50
"""


def q_inference_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES inference ingest processor: a supplied logistic model scored
    in-plan over event features (NULL features contribute 0), with the
    threshold label column."""
    from harmonize_search_analyze_spark.operators.ingest_pipeline import (
        run_pipeline,
    )

    ev = _t(spark, sf_dir, "events")
    model = {
        "type": "logistic_regression",
        "coefficients": {"value": 0.01, "user_id": -0.001},
        "intercept": -1.0,
        "classification_labels": ["cold", "hot"],
    }
    return (
        run_pipeline(ev, [
            {"inference": {"model": model, "target_field": "p"}},
        ])
        .select("event_id", F.round("p", 9).alias("p"), "p_label")
        .orderBy("event_id")
        .limit(100)
    )


SQL_INFERENCE_SCORE = """
WITH scored AS (
  SELECT event_id,
         1.0 / (1.0 + exp(-(-1.0 + 0.01 * COALESCE(value, 0.0)
                            + -0.001 * COALESCE(user_id, 0.0)))) AS raw
  FROM events
)
SELECT event_id, ROUND(raw, 9) AS p,
       CASE WHEN raw >= 0.5 THEN 'hot' ELSE 'cold' END AS p_label
FROM scored ORDER BY event_id LIMIT 100
"""


def q_esql_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL pipe query (the third grammar over the one engine): FROM |
    WHERE | EVAL | STATS..BY | SORT | LIMIT compiled to a single
    Catalyst plan — filter pushed to the scan, STATS one hash agg."""
    from harmonize_search_analyze_spark.plans.esql import run_esql
    from harmonize_search_analyze_spark.sources.catalog import Catalog

    cat = Catalog(spark)
    cat.register("events", _t(spark, sf_dir, "events"))
    return run_esql(cat, """
        FROM events
        | WHERE value IS NOT NULL AND event_type != 'error'
        | EVAL vbucket = floor(value / 100)
        | STATS n = count(*), avg_v = round(avg(value), 6)
            BY event_type, vbucket
        | SORT event_type, vbucket
        | LIMIT 40
    """)


SQL_ESQL_STATS = """
SELECT event_type, CAST(floor(value / 100) AS BIGINT) AS vbucket,
       COUNT(*) AS n, ROUND(AVG(value), 6) AS avg_v
FROM events
WHERE value IS NOT NULL AND event_type <> 'error'
GROUP BY event_type, vbucket
ORDER BY event_type, vbucket LIMIT 40
"""


def q_esql_inlinestats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL INLINESTATS: group aggregates joined BACK onto every row
    (one bucket-sized hash agg broadcast back, not a per-row window
    shuffle — see plans/esql.py), then a second WHERE that filters rows
    against their own group's average. Driver-oracle row for the
    pipe-grammar's hardest command."""
    from harmonize_search_analyze_spark.plans.esql import run_esql
    from harmonize_search_analyze_spark.sources.catalog import Catalog

    cat = Catalog(spark)
    cat.register("events", _t(spark, sf_dir, "events"))
    return run_esql(cat, """
        FROM events
        | WHERE value IS NOT NULL
        | INLINESTATS avg_v = round(avg(value), 6) BY event_type
        | WHERE value > avg_v * 1.8
        | KEEP event_id, event_type, value, avg_v
        | SORT event_id
        | LIMIT 60
    """)


SQL_ESQL_INLINESTATS = """
WITH w AS (
  SELECT event_id, event_type, value,
         ROUND(AVG(value) OVER (PARTITION BY event_type), 6) AS avg_v
  FROM events WHERE value IS NOT NULL
)
SELECT event_id, event_type, value, avg_v
FROM w WHERE value > avg_v * 1.8
ORDER BY event_id LIMIT 60
"""


def q_esql_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL ENRICH: customers enriched with their nation name through a
    registered enrich policy (the .enrich-* materialized-index
    equivalent: broadcast left join, enrich columns shadow input
    columns), then a rollup by the enriched field."""
    from harmonize_search_analyze_spark.plans.esql import run_esql
    from harmonize_search_analyze_spark.sources.catalog import Catalog

    cat = Catalog(spark)
    cat.register("customer", _t(spark, sf_dir, "customer"))
    cat.register_enrich(
        "nations",
        _t(spark, sf_dir, "nation"),
        match_field="n_nationkey",
        enrich_fields=["n_name"],
    )
    return run_esql(cat, """
        FROM customer
        | ENRICH nations ON c_nationkey WITH nation_name = n_name
        | STATS n = count(*), acct = round(sum(c_acctbal), 2)
            BY nation_name
        | SORT nation_name
    """)


SQL_ESQL_ENRICH = """
SELECT n.n_name AS nation_name, COUNT(*) AS n,
       ROUND(SUM(c_acctbal), 2) AS acct
FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY nation_name ORDER BY nation_name
"""


def q_esql_fork(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL FORK: two aggregate branches over one shared input subtree,
    unioned with the _fork discriminator — one Catalyst plan, the WHERE
    pushed below both branches."""
    from harmonize_search_analyze_spark.plans.esql import run_esql
    from harmonize_search_analyze_spark.sources.catalog import Catalog

    cat = Catalog(spark)
    cat.register("events", _t(spark, sf_dir, "events"))
    return run_esql(cat, """
        FROM events
        | WHERE value IS NOT NULL
        | FORK (WHERE event_type == "purchase"
                  | STATS n = count(*), v = round(sum(value), 2))
               (WHERE event_type == "refund"
                  | STATS n = count(*), v = round(sum(value), 2))
        | SORT _fork
    """)


SQL_ESQL_FORK = """
SELECT n, v, _fork FROM (
  SELECT COUNT(*) AS n, ROUND(SUM(value), 2) AS v, 'fork1' AS _fork
  FROM events WHERE value IS NOT NULL AND event_type = 'purchase'
  UNION ALL
  SELECT COUNT(*), ROUND(SUM(value), 2), 'fork2'
  FROM events WHERE value IS NOT NULL AND event_type = 'refund'
) f ORDER BY _fork
"""


def q_esql_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL TS (9.x time-series mode): STATS avg(rate(value)) runs the
    two-level TSDB rollup — reset-aware per-series rate inside each day
    bucket (lag window sharing the inner agg's exchange), then the
    outer avg across series. The oracle replays both levels."""
    from harmonize_search_analyze_spark.plans.esql import run_esql
    from harmonize_search_analyze_spark.sources.catalog import Catalog

    cat = Catalog(spark)
    cat.register("events", _t(spark, sf_dir, "events"))
    return run_esql(cat, """
        TS events ON ts BY event_type
        | WHERE ts IS NOT NULL AND value IS NOT NULL
        | STATS r = avg(rate(value)), m = max(max_over_time(value))
          BY day = DATE_TRUNC("day", ts)
        | EVAL r = ROUND(r * 1000, 6), m = ROUND(m, 6)
        | SORT day
        | LIMIT 30
    """)


SQL_ESQL_TS = """
WITH base AS (
  SELECT event_type, ts, CAST(value AS DOUBLE) AS v,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
), lagged AS (
  SELECT event_type, day, epoch(ts) AS e, v,
         LAG(v) OVER (PARTITION BY event_type, day
                      ORDER BY ts, v) AS prev
  FROM base
), per_series AS (
  SELECT event_type, day,
         SUM(CASE WHEN prev IS NULL THEN NULL
                  WHEN v >= prev THEN v - prev ELSE v END)
           / NULLIF(MAX(e) - MIN(e), 0) AS r,
         MAX(v) AS mx
  FROM lagged GROUP BY 1, 2
)
SELECT day, ROUND(AVG(r) * 1000, 6) AS r, ROUND(MAX(mx), 6) AS m
FROM per_series GROUP BY day ORDER BY day LIMIT 30
"""


def q_esql_fuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL FUSE (9.x): two FORK retrieval branches — one ranked by
    event value, one by recency — fused with reciprocal-rank fusion
    into a single ranking. Per-branch rank windows + one hash agg;
    non-key columns keep the first-branch occurrence."""
    from harmonize_search_analyze_spark.plans.esql import run_esql
    from harmonize_search_analyze_spark.sources.catalog import Catalog

    cat = Catalog(spark)
    cat.register("events", _t(spark, sf_dir, "events"))
    return run_esql(cat, """
        FROM events
        | WHERE value IS NOT NULL AND event_type == "purchase"
        | FORK (EVAL _score = round(value, 2) | SORT _score DESC, event_id ASC | LIMIT 20)
               (EVAL _score = round(cast(unix_timestamp(ts) AS DOUBLE) / 1000000000, 6)
                  | SORT _score DESC, event_id ASC | LIMIT 20)
        | FUSE rrf KEY BY event_id WITH k = 60
        | KEEP event_id, _score
        | LIMIT 15
    """)


SQL_ESQL_FUSE = """
WITH base AS (
  SELECT event_id, value, ts FROM events
  WHERE value IS NOT NULL AND event_type = 'purchase'
), b1 AS (
  SELECT event_id, ROUND(value, 2) AS _score FROM base
  ORDER BY _score DESC, event_id ASC LIMIT 20
), b2 AS (
  SELECT event_id, ROUND(epoch(ts) / 1000000000, 6) AS _score FROM base
  ORDER BY _score DESC, event_id ASC LIMIT 20
), u AS (
  SELECT event_id, _score, 'fork1' AS _fork FROM b1
  UNION ALL
  SELECT event_id, _score, 'fork2' FROM b2
), ranked AS (
  SELECT event_id, _fork,
         ROW_NUMBER() OVER (PARTITION BY _fork
                            ORDER BY _score DESC, event_id ASC) AS rnk
  FROM u
)
SELECT event_id, ROUND(SUM(1.0 / (60 + rnk)), 6) AS _score
FROM ranked GROUP BY event_id
ORDER BY _score DESC, event_id ASC LIMIT 15
"""


def q_esql_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL function-name translation in a gated plan: DATE_FORMAT's
    (format, date) order, TO_UPPER, TO_LONG — rewritten to Spark SQL
    forms before Catalyst sees them, still one hash agg."""
    from harmonize_search_analyze_spark.plans.esql import run_esql
    from harmonize_search_analyze_spark.sources.catalog import Catalog

    cat = Catalog(spark)
    cat.register("events", _t(spark, sf_dir, "events"))
    return run_esql(cat, """
        FROM events
        | WHERE value IS NOT NULL
        | EVAL day = DATE_FORMAT("yyyy-MM-dd", ts),
               t = TO_UPPER(event_type),
               vb = TO_LONG(floor(value / 250))
        | STATS n = count(*) BY day, t, vb
        | SORT day, t, vb
        | LIMIT 60
    """)


SQL_ESQL_FUNCTIONS = """
SELECT strftime(ts, '%Y-%m-%d') AS day, upper(event_type) AS t,
       TRY_CAST(floor(value / 250) AS BIGINT) AS vb, COUNT(*) AS n
FROM events WHERE value IS NOT NULL
GROUP BY day, t, vb ORDER BY day, t, vb LIMIT 60
"""


def q_eql_until(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EQL 'sequence by user_id [view] [purchase] until [error] with
    maxspan=2h': the view->purchase chain is dropped when an error event
    for the same user fires strictly inside the chain's span — the
    until clause costs ONE extra conditional running-last in the same
    single window pass (operators/analytics.py::eql_sequence)."""
    from harmonize_search_analyze_spark.operators.analytics import (
        eql_sequence,
    )

    ev = _t(spark, sf_dir, "events")
    return eql_sequence(
        ev,
        ["event_type = 'view'", "event_type = 'purchase'"],
        maxspan_seconds=7200,
        until="event_type = 'error'",
    )


def _sql_eql_until() -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        eql_sequence_sql,
    )

    return eql_sequence_sql(
        "events",
        ["event_type = 'view'", "event_type = 'purchase'"],
        maxspan_seconds=7200,
        until="event_type = 'error'",
    )


# The ES search-template source: terms from a toJson param, a range with
# the {{v}}{{^v}}default{{/v}} idiom, and a conditional user-cap section.
_TEMPLATE_SRC = (
    '{"bool": {"must": ['
    '{"terms": {"event_type": {{#toJson}}types{{/toJson}}}},'
    '{"range": {"value": {"gte": {{min_v}}{{^min_v}}0{{/min_v}} }}}'
    '{{#user_cap}},{"range": {"user_id": {"lte": {{user_cap}}}}}'
    '{{/user_cap}}]}}'
)


def q_search_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES search template (PUT _scripts + _search/template): a stored
    mustache-subset source rendered with params (toJson array, default
    value, conditional section), the result fed to the ONE shared
    predicate compiler — template rendering is driver-side string work,
    the executors see plain compiled DSL."""
    from harmonize_search_analyze_spark.plans.compiler import compile_query
    from harmonize_search_analyze_spark.plans.templates import ScriptStore

    store = ScriptStore()
    store.put("by_type_and_value", _TEMPLATE_SRC)
    body = store.render(
        "by_type_and_value",
        {"types": ["purchase", "refund", "signup"], "user_cap": 700},
    )
    ev = _t(spark, sf_dir, "events")
    return (
        ev.where(compile_query(body))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .orderBy("event_type")
    )


SQL_SEARCH_TEMPLATE = """
SELECT event_type, COUNT(*) AS doc_count,
       ROUND(SUM(value), 6) AS total_value
FROM events
WHERE event_type IN ('purchase', 'refund', 'signup')
  AND value >= 0 AND user_id <= 700
GROUP BY event_type ORDER BY event_type
"""


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation over purchase events: one user-keyed hash agg,
    then ntile(4) tiles per axis over the (corpus-size-independent)
    user frame with pinned tie-breaks — the classic customer rollup the
    reference's Kibana panels approximate three-ways."""
    from harmonize_search_analyze_spark.operators.analytics import (
        rfm_segments,
    )

    ev = _t(spark, sf_dir, "events")
    return (
        rfm_segments(ev, predicate="event_type = 'purchase'")
        .orderBy("user_key")
    )


def _sql_rfm_segments() -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        rfm_segments_sql,
    )

    sql = rfm_segments_sql("events", where="event_type = 'purchase'")
    return f"SELECT * FROM ({sql}) ORDER BY user_key"


def q_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 user-journey trigrams (a>b>c): ONE user-key window pass
    computes two lead() pointers per event, the path count is a
    map-combinable hash agg, top-k is a TakeOrdered — no explode, no
    self-join."""
    from harmonize_search_analyze_spark.operators.analytics import (
        event_paths,
    )

    ev = _t(spark, sf_dir, "events")
    return event_paths(ev, depth=3, k=15)


SQL_EVENT_PATHS = """
WITH hops AS (
  SELECT event_type AS e0,
         LEAD(event_type, 1) OVER w AS e1,
         LEAD(event_type, 2) OVER w AS e2
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
)
SELECT e0 || '>' || e1 || '>' || e2 AS path, COUNT(*) AS doc_count
FROM hops WHERE e2 IS NOT NULL
GROUP BY 1 ORDER BY doc_count DESC, path ASC LIMIT 15
"""


def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the documents token distribution: token-count
    pass + top-500 rank cut + built-in regr_* aggregates on
    (ln rank, ln freq) — the corpus-health slope probe for training
    data. Only corpus-sized exchange is the token-count agg."""
    from harmonize_search_analyze_spark.operators.text import zipf_fit

    return zipf_fit(_t(spark, sf_dir, "documents"), "text")


def _sql_zipf_fit() -> str:
    from harmonize_search_analyze_spark.operators.text import zipf_fit_sql

    return zipf_fit_sql("documents", "text")


def q_domain_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-step domain-mixture reweighting (DoReMi shape, deterministic
    core): per-source mean quality feeds a temperature-0.5 softmax with
    a 2% floor — one domain-keyed agg + broadcast corpus mean, softmax
    over the bounded domain frame."""
    from harmonize_search_analyze_spark.operators.sampling import (
        domain_reweight,
    )
    from harmonize_search_analyze_spark.operators.text import (
        quality_score_sql,
    )

    docs = _t(spark, sf_dir, "documents")
    return domain_reweight(
        docs, "source", quality_score_sql("text", "spark"),
        temperature=0.5, floor=0.02,
    )


def _sql_domain_reweight() -> str:
    from harmonize_search_analyze_spark.operators.text import (
        quality_score_sql,
    )

    q = quality_score_sql("text", "duckdb")
    return f"""
WITH per AS (
  SELECT source AS domain, COUNT(*) AS n_docs, AVG({q}) AS m
  FROM documents WHERE source IS NOT NULL GROUP BY 1
), o AS (SELECT AVG({q}) AS overall FROM documents WHERE source IS NOT NULL),
e AS (
  SELECT domain, n_docs, m, exp((m - overall) / 0.5) AS ev
  FROM per CROSS JOIN o
), z AS (SELECT SUM(ev) AS zz, COUNT(*) AS k FROM e)
SELECT domain, n_docs, ROUND(m, 6) AS mean_score,
       ROUND(ev / zz * (1.0 - 0.02 * k) + 0.02, 6) AS weight
FROM e CROSS JOIN z ORDER BY domain
"""


def q_hll_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine-exact HyperLogLog over part keys (the 100 TB
    cardinality path — register sketch merges by MAX, one
    map-combinable agg instead of the exact distinct's full shuffle).
    Unlike approx_count_distinct, BOTH engines compute the identical
    estimate from the shared hash."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        hll_cardinality,
    )

    return hll_cardinality(
        _t(spark, sf_dir, "lineitem"), "l_partkey", p=12
    )


def _sql_hll_cardinality() -> str:
    from harmonize_search_analyze_spark.functions.hashing import (
        hll_cardinality_sql,
    )

    return hll_cardinality_sql("lineitem", "l_partkey", "duckdb", p=12)


def q_percentiles_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable binned quantile sketch over lineitem prices — two
    map-combinable aggs + bin-level interpolation, the petabyte-scale
    alternative to the exact global-sort percentiles (which remains the
    accuracy oracle elsewhere)."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        percentiles_sketch,
    )

    return percentiles_sketch(
        _t(spark, sf_dir, "lineitem"), "l_extendedprice",
        [0.25, 0.5, 0.75, 0.95, 0.99], n_bins=256,
    )


def _sql_percentiles_sketch() -> str:
    from harmonize_search_analyze_spark.operators.aggregations import (
        percentiles_sketch_sql,
    )

    return percentiles_sketch_sql(
        "lineitem", "l_extendedprice",
        [0.25, 0.5, 0.75, 0.95, 0.99], n_bins=256,
    )


def q_countmin_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min heavy-hitter tokens (third mergeable sketch: counts
    merge by cell addition, fixed depth*width memory at any corpus
    size). width=8 deliberately forces collisions at this SF so the
    gate verifies the min-over-rows estimate, not just the hashing."""
    from harmonize_search_analyze_spark.functions.tokenize import (
        split_tokens,
    )
    from harmonize_search_analyze_spark.operators.aggregations import (
        countmin_topk,
    )

    docs = _t(spark, sf_dir, "documents", spread=True)
    toks = docs.where(F.col("text").isNotNull()).select(
        F.explode(split_tokens("text")).alias("item")
    )
    return countmin_topk(toks, "item", k=20, depth=4, width=8, seed=7)


def _sql_countmin_topk() -> str:
    from harmonize_search_analyze_spark.operators.aggregations import (
        countmin_topk_sql,
    )
    from harmonize_search_analyze_spark.operators.text import tokens_sql

    src = (
        f"SELECT unnest({tokens_sql('text', 'duckdb')}) AS item "
        "FROM documents WHERE text IS NOT NULL"
    )
    return countmin_topk_sql(src, "duckdb", k=20, depth=4, width=8, seed=7)


def q_graph_explore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES _graph/explore two-wave co-occurrence spider from seed
    'spark' (use_significance:false mode): wave-1 vertices are the top
    co-occurring terms, edges count distinct docs joining each wave-1
    vertex to its wave-2 discoveries."""
    from harmonize_search_analyze_spark.operators.graph import (
        graph_explore,
    )

    # spread=True tried round 11 and measured WORSE (A/B 1.6 -> 2.2 s):
    # the 1-task tokenize stages overlap with concurrent AQE jobs, and
    # the full-width round-robin exchange + 32-task stages cost more
    # than the parallelism buys at sf0.1
    docs = _t(spark, sf_dir, "documents")
    return graph_explore(
        docs, "text", "spark", size=5, conn_size=20, min_doc_count=2
    )


def _sql_graph_explore() -> str:
    from harmonize_search_analyze_spark.operators.graph import (
        graph_explore_sql,
    )

    return graph_explore_sql(
        "documents", "text", "spark", "duckdb",
        size=5, conn_size=20, min_doc_count=2,
    )


def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversification (lambda=0.7, pool=30, top-10): distributed
    relevance top-pool + the irreducibly-sequential greedy on the
    driver's metadata-sized pool — scored bit-identically to the
    DuckDB recursive-CTE oracle (same left-fold dot order)."""
    from harmonize_search_analyze_spark.operators.similarity import (
        mmr_rerank,
    )

    emb = _t(spark, sf_dir, "embeddings")
    return mmr_rerank(
        emb, _QUERY_VEC, id_col="vec_id", k=10, pool=30, lam=0.7
    )


def _sql_mmr_rerank() -> str:
    qlit = "[" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in _QUERY_VEC) + "]"
    return f"""
WITH RECURSIVE pool AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         list_dot_product(embedding::DOUBLE[], {qlit}) AS rel
  FROM embeddings
  ORDER BY rel DESC, vec_id ASC LIMIT 30
),
sel AS (
  (SELECT 1 AS rank, vec_id, rel AS score, [vec_id] AS chosen
   FROM pool ORDER BY rel DESC, vec_id ASC LIMIT 1)
  UNION ALL
  (SELECT s.rank + 1, nxt.vec_id, nxt.score,
          list_append(s.chosen, nxt.vec_id)
   FROM sel s, LATERAL (
     SELECT p.vec_id,
            0.7 * p.rel - 0.3 * (
              SELECT MAX(list_dot_product(p.v, c.v)) FROM pool c
              WHERE list_contains(s.chosen, c.vec_id)
            ) AS score
     FROM pool p WHERE NOT list_contains(s.chosen, p.vec_id)
     ORDER BY score DESC, p.vec_id ASC LIMIT 1
   ) nxt
   WHERE s.rank < 10)
)
SELECT CAST(rank AS INT) AS rank, vec_id, ROUND(score, 6) AS score
FROM sel ORDER BY rank
"""


def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease curation signal (pinned vowel-run syllable
    approximation): per-source readability distribution — one map-only
    projection + one hash agg."""
    from harmonize_search_analyze_spark.operators.text import (
        readability_sql,
    )

    docs = _t(spark, sf_dir, "documents")
    r = F.expr(readability_sql("text", "spark"))
    return (
        docs.where(F.col("text").isNotNull())
        .select("source", r.alias("fre"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.round(F.avg("fre"), 6).alias("avg_fre"),
            F.round(F.min("fre"), 6).alias("min_fre"),
            F.round(F.max("fre"), 6).alias("max_fre"),
        )
        .orderBy("source")
    )


def _sql_readability() -> str:
    from harmonize_search_analyze_spark.operators.text import (
        readability_sql,
    )

    r = readability_sql("text", "duckdb")
    return f"""
SELECT source, COUNT(*) AS doc_count,
       ROUND(AVG(fre), 6) AS avg_fre,
       ROUND(MIN(fre), 6) AS min_fre,
       ROUND(MAX(fre), 6) AS max_fre
FROM (SELECT source, {r} AS fre FROM documents WHERE text IS NOT NULL)
GROUP BY source ORDER BY source
"""


def q_esql_fulltext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL full-text WHERE functions (8.17): QSTR routes through the
    Lucene grammar, MATCH through the shared token predicate — both as
    hidden marker predicates in the one Catalyst plan, composed with a
    plain comparison and a STATS rollup."""
    from harmonize_search_analyze_spark.plans.esql import run_esql
    from harmonize_search_analyze_spark.sources.catalog import Catalog

    cat = Catalog(spark)
    cat.register("events", _t(spark, sf_dir, "events"))
    return run_esql(cat, '''
        FROM events
        | WHERE QSTR("event_type:purch* OR event_type:signup")
            AND value >= 150 AND user_id IS NOT NULL
        | STATS n = count(*), v = round(sum(value), 2) BY event_type
        | SORT event_type
    ''')


SQL_ESQL_FULLTEXT = """
SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS v
FROM events
WHERE (regexp_full_match(event_type, 'purch.*') OR event_type = 'signup')
  AND value >= 150 AND user_id IS NOT NULL
GROUP BY event_type ORDER BY event_type
"""


def q_lucene_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic Lucene query_string (the FULL syntax, round 4 — the fifth
    text entry point over the one predicate engine): +/- clauses,
    bracket range, wildcard, phrase and fuzzy forms in one expression,
    compiled through plans/lucene.py -> shared DSL -> one scan."""
    from harmonize_search_analyze_spark.plans.lucene import lucene_query

    ev = _t(spark, sf_dir, "events")
    pred = lucene_query(
        "+event_type:(purchase OR sign*) +value:[100 TO 900} "
        "-user_id:[950 TO *]"
    )
    return (
        ev.where(pred)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .orderBy("event_type")
    )


SQL_LUCENE_SEARCH = """
SELECT event_type, COUNT(*) AS doc_count,
       ROUND(SUM(value), 6) AS total_value
FROM events
WHERE (event_type = 'purchase' OR regexp_full_match(event_type, 'sign.*'))
  AND value >= 100 AND value < 900
  AND NOT user_id >= 950
GROUP BY event_type ORDER BY event_type
"""


_GEOIP_RANGES = [
    # non-overlapping MaxMind-shaped rows (inclusive bounds)
    ("10.0.0.0", "10.0.255.255", "US", "Denver"),
    ("10.1.0.0", "10.1.127.255", "DE", "Berlin"),
    ("10.1.128.0", "10.2.255.255", "JP", "Osaka"),
]


def q_geoip_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES geoip processor with a supplied ranges table: IPs synthesized
    from user_id enriched country/city via the bucketed range join
    (ranges explode into /16 blocks -> broadcast equi-join + residual
    between — never a per-row nested loop), rolled up by country."""
    from harmonize_search_analyze_spark.operators.ingest_pipeline import (
        run_pipeline,
    )

    ev = _t(spark, sf_dir, "events", spread=True).withColumn(
        "ip", F.expr(_IP_EXPR)
    )
    ranges = _lf(
        spark, _GEOIP_RANGES,
        "start_ip STRING, end_ip STRING, country STRING, city STRING",
    )
    out = run_pipeline(ev, [{"geoip": {"field": "ip", "ranges": ranges}}])
    return (
        out.groupBy("country", "city")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy(F.desc("doc_count"), F.asc_nulls_last("country"))
    )


def _sql_geoip_route() -> str:
    from harmonize_search_analyze_spark.operators.aggregations import (
        ip_to_long_sql,
    )

    vals = ", ".join(
        f"('{s}', '{e}', '{c}', '{ci}')" for s, e, c, ci in _GEOIP_RANGES
    )
    ipl = ip_to_long_sql(_IP_EXPR_DUCK)
    return f"""
WITH ranges(start_ip, end_ip, country, city) AS (VALUES {vals}),
r AS (
  SELECT {ip_to_long_sql('start_ip')} AS s,
         {ip_to_long_sql('end_ip')} AS e, country, city
  FROM ranges
), ev AS (SELECT {ipl} AS ipl FROM events)
SELECT r.country, r.city, COUNT(*) AS doc_count
FROM ev LEFT JOIN r ON ev.ipl >= r.s AND ev.ipl <= r.e
GROUP BY r.country, r.city
ORDER BY doc_count DESC, r.country ASC NULLS LAST
"""


def q_eql_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EQL 'join by user_id [signup] [purchase] [error]': keys with at
    least one event of EVERY type in any order, each step's first
    (ts, id) — ONE key-hash agg of conditional struct-mins, no joins
    (strictly cheaper than sequence; the natural 100 TB pre-screen)."""
    from harmonize_search_analyze_spark.operators.analytics import eql_join

    ev = _t(spark, sf_dir, "events")
    return eql_join(
        ev,
        ["event_type = 'signup'", "event_type = 'purchase'",
         "event_type = 'error'"],
    )


def _sql_eql_join() -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        eql_join_sql,
    )

    return eql_join_sql(
        "events",
        ["event_type = 'signup'", "event_type = 'purchase'",
         "event_type = 'error'"],
    )


_ANNEAL_PHASES = [
    ("bulk", {"src0": 0.9, "src1": 0.9, "src2": 0.6}),
    ("anneal", {"src0": 0.1, "src3": 1.0, "src4": 1.0}),
]


def q_anneal_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Annealed/curriculum data schedule: two phases with different
    per-source keep rates, ONE corpus scan (qualify bits + order keys
    are projections, qualifying phase structs explode with fan-out <=
    n_phases). Gated as the per-(phase, source) composition rollup."""
    from harmonize_search_analyze_spark.operators.sampling import (
        anneal_schedule,
    )

    docs = _t(spark, sf_dir, "documents")
    sched = anneal_schedule(docs, "source", "doc_id", _ANNEAL_PHASES)
    return (
        sched.groupBy("phase_idx", "phase", "source")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy("phase_idx", "source")
    )


def _sql_anneal_schedule() -> str:
    from harmonize_search_analyze_spark.operators.sampling import (
        anneal_schedule_sql,
    )

    inner = anneal_schedule_sql(
        "documents", "source", "doc_id", _ANNEAL_PHASES,
        ["doc_id", "source"], "duckdb",
    )
    return f"""
SELECT phase_idx, phase, source, COUNT(*) AS doc_count
FROM ({inner}) GROUP BY 1, 2, 3 ORDER BY phase_idx, source
"""


def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival over user lifetimes (7-day churn gap,
    right-censoring at observation end): one user-keyed agg, a 1-row
    broadcast, and a bucket-level product-limit window via
    exp-sum-of-logs."""
    from harmonize_search_analyze_spark.operators.analytics import (
        kaplan_meier,
    )

    return kaplan_meier(_t(spark, sf_dir, "events"), churn_gap_days=7)


def _sql_kaplan_meier() -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        kaplan_meier_sql,
    )

    return kaplan_meier_sql("events", churn_gap_days=7)


def q_ingest_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-4 ingest processors (script/bytes/fingerprint/
    user_agent/append) in ONE data-driven pipeline over documents — the
    whole chain is a single map-only projection fused into the scan."""
    from harmonize_search_analyze_spark.operators.ingest_pipeline import (
        run_pipeline,
    )

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    out = run_pipeline(docs, [
        {"script": {"target_field": "sz",
                    "source": "concat(cast(n_chars AS string), 'kb')"}},
        {"bytes": {"field": "sz", "target_field": "sz_bytes"}},
        {"fingerprint": {"fields": ["source", "lang"], "method": "MD5"}},
        {"script": {"target_field": "ua", "source": (
            "CASE WHEN lang = 'en' THEN"
            " 'Mozilla/5.0 (Windows NT 10.0) Chrome/120.0 Safari/537.36'"
            " WHEN lang = 'fr' THEN"
            " 'Mozilla/5.0 (iPhone; CPU iPhone OS 17_0 like Mac OS X)"
            " Version/17.0 Mobile/15E148 Safari/604.1'"
            " ELSE 'curl/8.4.0' END")}},
        {"user_agent": {"field": "ua", "target_field": "agent"}},
    ])
    return (
        out.select(
            "doc_id", "sz_bytes", "fingerprint",
            "agent_name", "agent_os", "agent_device",
        )
        .orderBy("doc_id")
    )


SQL_INGEST_ENRICH = """
SELECT doc_id, CAST(n_chars * 1024 AS BIGINT) AS sz_bytes,
       md5(COALESCE(source, '') || '|' || COALESCE(lang, ''))
         AS fingerprint,
       CASE WHEN lang = 'en' THEN 'Chrome'
            WHEN lang = 'fr' THEN 'Safari' ELSE 'Other' END AS agent_name,
       CASE WHEN lang = 'en' THEN 'Windows'
            WHEN lang = 'fr' THEN 'iOS' ELSE 'Other' END AS agent_os,
       CASE WHEN lang = 'fr' THEN 'Mobile' ELSE 'Desktop' END
         AS agent_device
FROM documents WHERE doc_id < 200 ORDER BY doc_id
"""


def q_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction (ColBERT rank_vectors maxSimDotProduct) top-10:
    multi-vector docs (vec_id % 50 groups), query = the vec 0/1 pair,
    score = sum of per-query-vector max dots — broadcast query side,
    vectors never cross a shuffle."""
    from harmonize_search_analyze_spark.operators.similarity import (
        maxsim_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    corpus = emb.select(
        (F.col("vec_id") % 50).alias("doc_id"), "embedding"
    )
    query = emb.where(F.col("vec_id").isin(0, 1)).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    return maxsim_topk(corpus, query, k=10)


SQL_MAXSIM = """
WITH corpus AS (
  SELECT vec_id % 50 AS doc, embedding::DOUBLE[] AS dv FROM embeddings
), q AS (
  SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id IN (0, 1)
), best AS (
  SELECT doc, qid,
         MAX(list_sum(list_transform(list_zip(dv, qv), p -> p[1] * p[2])))
           AS b
  FROM corpus CROSS JOIN q GROUP BY doc, qid
)
SELECT doc AS doc_id, ROUND(SUM(b), 6) AS maxsim
FROM best GROUP BY 1 ORDER BY maxsim DESC, doc_id ASC LIMIT 10
"""


def q_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing TF-IDF sparse vectors (the hashing-trick
    featurizer) over a doc subset: exploded (doc, bucket, weight) rows —
    one (doc,bucket) hash agg, a <=n_buckets broadcast idf join, no
    array columns crossing an exchange."""
    from harmonize_search_analyze_spark.operators.text import (
        feature_hash_vectors,
    )

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 60)
    return (
        feature_hash_vectors(docs, "doc_id", "text", n_buckets=256)
        .orderBy("doc_id", "bucket")
    )


def _sql_feature_hash() -> str:
    from harmonize_search_analyze_spark.operators.text import (
        feature_hash_vectors_sql,
    )

    inner = feature_hash_vectors_sql(
        "(SELECT * FROM documents WHERE doc_id < 60)",
        "doc_id", "text", n_buckets=256,
    )
    return f"SELECT * FROM ({inner}) ORDER BY doc_id, bucket"


def q_moving_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES moving_fn pipeline agg (MovingFunctions.stdDev): trailing-7
    population deviation over the daily histogram, ES's shift=0 window
    (current bucket EXCLUDED; empty first window -> NULL)."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        date_histogram,
        moving_fn,
    )

    daily = date_histogram(_t(spark, sf_dir, "events"), "ts", "1 day")
    return moving_fn(daily, "bucket", "doc_count", fn="stdDev", window=7)


SQL_MOVING_FN = """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
         COUNT(*) AS doc_count
  FROM events WHERE ts IS NOT NULL GROUP BY 1
)
SELECT bucket, doc_count,
       ROUND(stddev_pop(CAST(doc_count AS DOUBLE)) OVER (
         ORDER BY bucket ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING), 6)
         AS moving_fn
FROM daily ORDER BY bucket
"""


def q_suggest_contexts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES completion suggester with category contexts: source
    suggestions restricted to en/fr docs, boosts 2.0/1.5 compounding
    multiplicatively into the score — one sargable-filtered scan, one
    hash agg, TakeOrdered."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        suggest_completion,
    )

    docs = _t(spark, sf_dir, "documents")
    return suggest_completion(
        docs, "source",
        contexts={"lang": {"en": 2.0, "fr": 1.5}},
        k=10,
    )


SQL_SUGGEST_CONTEXTS = """
SELECT source AS term, COUNT(*) AS doc_count,
       ROUND(SUM(CAST(CASE WHEN lang = 'en' THEN 2.0 ELSE 1.5 END AS DOUBLE)), 6) AS score
FROM documents
WHERE source IS NOT NULL AND lang IN ('en', 'fr')
GROUP BY source ORDER BY score DESC, term ASC LIMIT 10
"""


def q_es_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES SQL (the _sql endpoint) — the FOURTH grammar over the one
    engine: the ANSI body passes straight to Catalyst, the MATCH()
    full-text call compiles through the same pinned tokenizer as the
    DSL/KQL/ES|QL grammars and lands as a hidden marker predicate that
    pushes into the scan (plans/es_sql.py)."""
    from harmonize_search_analyze_spark.plans.es_sql import run_es_sql
    from harmonize_search_analyze_spark.sources.catalog import Catalog

    cat = Catalog(spark)
    cat.register("documents", _t(spark, sf_dir, "documents"))
    return run_es_sql(cat, """
        SELECT source, COUNT(*) AS doc_count,
               ROUND(AVG(n_chars), 6) AS avg_chars
        FROM documents
        WHERE MATCH(text, 'spark merge') AND n_chars > 100
        GROUP BY source ORDER BY source
    """)


# the pinned full-token containment regex, spelled for DuckDB
SQL_ES_SQL = r"""
SELECT source, COUNT(*) AS doc_count, ROUND(AVG(n_chars), 6) AS avg_chars
FROM documents
WHERE (regexp_matches(lower(text), '(^|[^a-z0-9])spark($|[^a-z0-9])')
       OR regexp_matches(lower(text), '(^|[^a-z0-9])merge($|[^a-z0-9])'))
  AND n_chars > 100
GROUP BY source ORDER BY source
"""


def q_parent_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES parent aggregation (children's inverse): lineitem (child)
    buckets by returnflag with the DISTINCT parent-order count per bucket —
    child count and count_distinct kept in SEPARATE aggs (the
    Expand-plan cliff), joined at bucket size."""
    from harmonize_search_analyze_spark.operators.joins import parent_agg

    return parent_agg(
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
        parent_key="o_orderkey",
        child_key="l_orderkey",
        bucket_field="l_returnflag",
        k=10,
    )


SQL_PARENT_AGG = """
WITH cc AS (
  SELECT l_returnflag AS bucket, COUNT(*) AS child_count
  FROM lineitem WHERE l_returnflag IS NOT NULL GROUP BY 1
), pc AS (
  SELECT l.l_returnflag AS bucket,
         COUNT(DISTINCT l.l_orderkey) AS parent_count
  FROM lineitem l
  JOIN (SELECT DISTINCT o_orderkey FROM orders
        WHERE o_orderkey IS NOT NULL) o
    ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag IS NOT NULL GROUP BY 1
)
SELECT cc.bucket, CAST(child_count AS BIGINT) AS child_count,
       CAST(COALESCE(parent_count, 0) AS BIGINT) AS parent_count
FROM cc LEFT JOIN pc ON cc.bucket = pc.bucket
ORDER BY child_count DESC, cc.bucket ASC LIMIT 10
"""


def q_extended_stats_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES extended_stats_bucket sibling pipeline agg: the
    variance/std/±2σ-bounds row over the daily date_histogram's
    doc_counts — one reduce over the already-bucket-sized frame."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        date_histogram,
        extended_stats_bucket,
    )

    daily = date_histogram(_t(spark, sf_dir, "events"), "ts", "1 day")
    return extended_stats_bucket(daily, "doc_count", sigma=2.0)


SQL_EXTENDED_STATS_BUCKET = """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
         COUNT(*) AS doc_count
  FROM events WHERE ts IS NOT NULL GROUP BY 1
)
SELECT CAST(COUNT(doc_count) AS BIGINT) AS bucket_count,
       CAST(MIN(doc_count) AS DOUBLE) AS min_bucket,
       CAST(MAX(doc_count) AS DOUBLE) AS max_bucket,
       ROUND(SUM(CAST(doc_count AS DOUBLE)), 6) AS sum_bucket,
       ROUND(SUM(CAST(doc_count AS DOUBLE) * doc_count), 6)
         AS sum_of_squares,
       ROUND(AVG(CAST(doc_count AS DOUBLE)), 6) AS avg_bucket,
       ROUND(var_pop(CAST(doc_count AS DOUBLE)), 6) AS variance,
       ROUND(stddev_pop(CAST(doc_count AS DOUBLE)), 6) AS std_deviation,
       ROUND(AVG(CAST(doc_count AS DOUBLE))
             + 2.0 * stddev_pop(CAST(doc_count AS DOUBLE)), 6)
         AS upper_bound,
       ROUND(AVG(CAST(doc_count AS DOUBLE))
             - 2.0 * stddev_pop(CAST(doc_count AS DOUBLE)), 6)
         AS lower_bound
FROM daily
"""


def q_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules (directed, support/confidence/
    lift) over the same per-doc distinct-token baskets frequent_item_sets
    mines — the rule layer ES's frequent_item_sets leaves to the client."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        association_rules,
    )

    docs = _t(spark, sf_dir, "documents")
    items = docs.select(
        "doc_id", F.explode(F.expr(
            "array_distinct(filter(split(lower(text), '[^a-z0-9]+'), "
            "t -> length(t) >= 5))"
        )).alias("token"),
    )
    return association_rules(
        items, "token", "doc_id", min_support=0.5, k=25
    )


SQL_ASSOCIATION_RULES = """
WITH items AS (
  SELECT DISTINCT doc_id,
         unnest(list_distinct(list_filter(
           regexp_split_to_array(lower(text), '[^a-z0-9]+'),
           t -> length(t) >= 5))) AS item
  FROM documents WHERE text IS NOT NULL
),
n AS (SELECT COUNT(DISTINCT doc_id) AS g FROM items),
counts AS (SELECT item, COUNT(*) AS c FROM items GROUP BY item),
pairs AS (
  SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS pair_count
  FROM items a JOIN items b ON a.doc_id = b.doc_id AND a.item < b.item
  GROUP BY 1, 2
  HAVING COUNT(*) / (SELECT CAST(g AS DOUBLE) FROM n) >= 0.5
),
directed AS (
  SELECT item_a AS antecedent, item_b AS consequent, pair_count FROM pairs
  UNION ALL
  SELECT item_b AS antecedent, item_a AS consequent, pair_count FROM pairs
)
SELECT d.antecedent, d.consequent,
       CAST(d.pair_count AS BIGINT) AS pair_count,
       ROUND(d.pair_count / (SELECT CAST(g AS DOUBLE) FROM n), 6)
         AS support,
       ROUND(d.pair_count / CAST(ca.c AS DOUBLE), 6) AS confidence,
       ROUND(CAST((SELECT g FROM n) * d.pair_count AS DOUBLE)
             / CAST(ca.c * cb.c AS DOUBLE), 6) AS lift
FROM directed d
JOIN counts ca ON d.antecedent = ca.item
JOIN counts cb ON d.consequent = cb.item
ORDER BY lift DESC, confidence DESC, antecedent ASC, consequent ASC
LIMIT 25
"""


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census (degree-ordered orientation) of the high-quantity
    co-purchase graph: parts co-occurring in an order with quantity >= 45
    form edges; returns the one-row (vertices, edges, triangles, wedges,
    transitivity) summary."""
    from harmonize_search_analyze_spark.operators.graph import (
        triangle_count,
    )

    li = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 45)
    pp = li.select("l_orderkey", "l_partkey").distinct()
    a = pp.alias("a")
    b = pp.alias("b")
    edges = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("src"),
        F.col("b.l_partkey").alias("dst"),
    )
    return triangle_count(edges)


def _sql_triangle_count() -> str:
    from harmonize_search_analyze_spark.operators.graph import (
        triangle_count_sql,
    )

    edges = (
        "SELECT a.l_partkey AS src, b.l_partkey AS dst FROM "
        "(SELECT DISTINCT l_orderkey, l_partkey FROM lineitem "
        " WHERE l_quantity >= 45) a JOIN "
        "(SELECT DISTINCT l_orderkey, l_partkey FROM lineitem "
        " WHERE l_quantity >= 45) b "
        "ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"
    )
    return triangle_count_sql(edges, "duckdb")


def q_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV bottom-k sketch overlap between the single-digit sources
    (src0-src9) and the double-digit sources (src10-src19): estimated
    distinct texts per side, union, Jaccard, intersection — corpus
    contamination estimated from two 64-row sketches, never a corpus
    join."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        kmv_overlap,
    )

    docs = _t(spark, sf_dir, "documents")
    a = docs.where(F.length("source") == 4)
    b = docs.where(F.length("source") == 5)
    return kmv_overlap(a, b, "text", k=64)


def _sql_kmv_overlap() -> str:
    from harmonize_search_analyze_spark.operators.aggregations import (
        kmv_overlap_sql,
    )

    return kmv_overlap_sql(
        "(SELECT * FROM documents WHERE LENGTH(source) = 4) ta",
        "(SELECT * FROM documents WHERE LENGTH(source) = 5) tb",
        "text",
        "duckdb",
        k=64,
    )


def q_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked entity resolution on customer names: blocking key =
    nation|segment|name-prefix, verify Levenshtein <= 1 — the standard
    ER block-then-verify shape on the engines' shared levenshtein
    built-in. The name-PREFIX component is the scale lesson: its
    cardinality grows with the corpus, so block sizes stay bounded as
    the table grows (a fixed nation|segment key alone goes quadratic —
    measured 16x at 10x data before the prefix was added); the
    max_block_size cap backstops degenerate keys."""
    from harmonize_search_analyze_spark.operators.dedup import (
        record_linkage,
    )

    cust = _t(spark, sf_dir, "customer")
    return record_linkage(
        cust,
        "c_custkey",
        "c_name",
        "concat(cast(c_nationkey as string), '|', c_mktsegment, '|', "
        "substring(c_name, 10, 6))",
        max_edit=1,
        max_block_size=1000,
    )


def _sql_record_linkage() -> str:
    from harmonize_search_analyze_spark.operators.dedup import (
        record_linkage_sql,
    )

    return record_linkage_sql(
        "customer",
        "c_custkey",
        "c_name",
        "CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment || '|' || "
        "substring(c_name, 10, 6)",
        "duckdb",
        max_edit=1,
        max_block_size=1000,
    )


def q_moving_holtwinters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """moving_fn holtWinters (triple-exponential, additive weekly
    seasonality — completes the MovingFunctions family): one-step
    forecast of daily event counts from the trailing 14-day window
    (two seasons seed level/trend/seasonals)."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        moving_fn,
    )

    daily = (
        _t(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull())
        .groupBy(F.date_trunc("day", "ts").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )
    return moving_fn(
        daily, "bucket", "doc_count", fn="holtWinters", window=14,
        period=7, alpha=0.3, beta=0.1, gamma=0.2,
    )


def holtwinters_weights(
    n: int, alpha: float, beta: float, gamma: float, m: int
) -> list[float] | None:
    """Additive Holt-Winters is a LINEAR filter (init means, seasonal
    deviations and all three recursions are linear in the
    observations), so the one-step forecast over a window of length n
    is a fixed dot product — derived, like ``holt_weights``, by folding
    the recursion over unit basis vectors. None for n < 2m (the
    operator's NULL branch)."""
    if n < 2 * m:
        return None

    def fold(xs: list[float]) -> float:
        l = sum(xs[:m]) / m
        b = (sum(xs[m:2 * m]) / m - sum(xs[:m]) / m) / m
        c = [x - l for x in xs[:m]]
        for t in range(m, len(xs)):
            x = xs[t]
            slot = t % m
            lp = alpha * (x - c[slot]) + (1 - alpha) * (l + b)
            b = beta * (lp - l) + (1 - beta) * b
            c[slot] = gamma * (x - lp) + (1 - gamma) * c[slot]
            l = lp
        return l + b + c[len(xs) % m]

    return [
        fold([1.0 if j == i else 0.0 for j in range(n)]) for i in range(n)
    ]


def _sql_moving_holtwinters(
    *, window: int = 14, period: int = 7,
    alpha: float = 0.3, beta: float = 0.1, gamma: float = 0.2,
) -> str:
    cases = []
    for n in range(2 * period, window + 1):
        ws = holtwinters_weights(n, alpha, beta, gamma, period)
        terms = " + ".join(
            f"({w!r}) * arr[{i + 1}]" for i, w in enumerate(ws)
        )
        cases.append(f"WHEN {n} THEN {terms}")
    branch = "\n            ".join(cases)
    return f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
         COUNT(*) AS doc_count
  FROM events WHERE ts IS NOT NULL GROUP BY 1
), arrs AS (
  SELECT bucket, doc_count,
         list(CAST(doc_count AS DOUBLE)) OVER (
           ORDER BY bucket ROWS BETWEEN {window} PRECEDING AND 1 PRECEDING
         ) AS arr
  FROM daily
)
SELECT bucket, doc_count,
       ROUND(CASE len(arr)
            {branch}
            ELSE NULL END, 6) AS moving_fn
FROM arrs ORDER BY bucket
"""


def q_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 snapshot merge (the corpus-registry versioning
    primitive): a derived current dimension (custkey % 13 != 0, plus a
    closed-history stripe) merged with a derived snapshot (% 11 drops =
    deletes, % 7 segment rewrites = updates, the % 13 ids = inserts) —
    exercising all five branches: history passthrough, close, keep-open,
    reopen, insert."""
    from harmonize_search_analyze_spark.operators.ordering import (
        scd2_merge,
    )

    cust = _t(spark, sf_dir, "customer")
    open_rows = cust.where(F.col("c_custkey") % 13 != 0).select(
        "c_custkey", "c_mktsegment", "c_acctbal",
        F.lit("2025-01-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    hist_rows = cust.where(
        (F.col("c_custkey") % 17 == 0) & (F.col("c_custkey") % 13 != 0)
    ).select(
        "c_custkey",
        F.lit("OLD").alias("c_mktsegment"),
        "c_acctbal",
        F.lit("2024-01-01").cast("timestamp").alias("valid_from"),
        F.lit("2025-01-01").cast("timestamp").alias("valid_to"),
    )
    dim = open_rows.unionByName(hist_rows)
    snapshot = cust.where(F.col("c_custkey") % 11 != 0).select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 0, F.lit("MOVED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
        "c_acctbal",
    )
    return scd2_merge(
        dim, snapshot, "c_custkey", ["c_mktsegment", "c_acctbal"],
        "2025-06-01",
    )


def _sql_scd2_merge() -> str:
    from harmonize_search_analyze_spark.operators.ordering import (
        scd2_merge_sql,
    )

    dim_sql = (
        "SELECT c_custkey, c_mktsegment, c_acctbal,"
        " CAST('2025-01-01' AS TIMESTAMP) AS valid_from,"
        " CAST(NULL AS TIMESTAMP) AS valid_to"
        " FROM customer WHERE c_custkey % 13 <> 0"
        " UNION ALL"
        " SELECT c_custkey, 'OLD', c_acctbal,"
        " CAST('2024-01-01' AS TIMESTAMP),"
        " CAST('2025-01-01' AS TIMESTAMP)"
        " FROM customer WHERE c_custkey % 17 = 0 AND c_custkey % 13 <> 0"
    )
    snapshot_sql = (
        "SELECT c_custkey,"
        " CASE WHEN c_custkey % 7 = 0 THEN 'MOVED' ELSE c_mktsegment END"
        " AS c_mktsegment, c_acctbal"
        " FROM customer WHERE c_custkey % 11 <> 0"
    )
    return scd2_merge_sql(
        dim_sql, snapshot_sql, "c_custkey",
        ["c_mktsegment", "c_acctbal"], "2025-06-01", "duckdb",
    )


_LTR_TERMS = ["customer", "order", "filter"]


def q_ltr_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learning-to-rank feature logging (ES LTR plugin sltr shape): the
    per-(query, doc) feature vector — BM25, match counts, coverage, IDF
    mass, doc length, plus the n_chars numeric feature — for the top-50
    BM25 candidates."""
    from harmonize_search_analyze_spark.operators.ranking import (
        ltr_features,
    )

    docs = _t(spark, sf_dir, "documents")
    return ltr_features(
        docs, "doc_id", "text", _LTR_TERMS,
        numeric_features={"f_n_chars": "n_chars"}, k=50,
    )


def _sql_ltr_features() -> str:
    from harmonize_search_analyze_spark.operators.ranking import (
        ltr_features_sql,
    )

    return ltr_features_sql(
        "documents", "doc_id", "text", _LTR_TERMS, "duckdb",
        numeric_features={"f_n_chars": "n_chars"}, k=50,
    )


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity privacy audit of the customer table
    under the (nation, balance-band) quasi-identifier with market
    segment as the sensitive attribute — the governance gate before a
    corpus release."""
    from harmonize_search_analyze_spark.operators.curation import (
        k_anonymity,
    )

    cust = _t(spark, sf_dir, "customer").withColumn(
        "bal_band", F.expr("CAST(FLOOR(c_acctbal / 2000) AS BIGINT)")
    )
    return k_anonymity(
        cust, ["c_nationkey", "bal_band"], k=5,
        sensitive_col="c_mktsegment", l=2,
    )


def _sql_k_anonymity() -> str:
    from harmonize_search_analyze_spark.operators.curation import (
        k_anonymity_sql,
    )

    return k_anonymity_sql(
        "(SELECT c_nationkey, CAST(FLOOR(c_acctbal / 2000) AS BIGINT)"
        " AS bal_band, c_mktsegment FROM customer) t",
        ["c_nationkey", "bal_band"],
        "duckdb",
        k=5,
        sensitive_expr="c_mktsegment",
        l=2,
    )


def q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed covariance of the embedding column (per-partition
    float64 Gram partials via Arrow, in-plan elementwise merge) — the
    SQL-expressible half of PCA, oracle-pinned exactly (trainer-pattern
    split: embedding_pca's eig step is the rows-only remainder)."""
    from harmonize_search_analyze_spark.operators.similarity import (
        embedding_covariance,
    )

    return embedding_covariance(
        _t(spark, sf_dir, "embeddings"), "embedding", d=64
    )


def _sql_embedding_covariance() -> str:
    from harmonize_search_analyze_spark.operators.similarity import (
        embedding_covariance_sql,
    )

    return embedding_covariance_sql("embeddings", "embedding", "duckdb", d=64)


def q_embedding_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA projection to 8 components (sign-pinned eigenvectors, driver
    eig on the metadata-sized covariance, broadcast Arrow matmul) —
    rows-only check; its covariance input is the oracle-pinned twin
    above."""
    from harmonize_search_analyze_spark.operators.similarity import (
        embedding_pca,
    )

    out = embedding_pca(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding",
        d=64, k=8,
    )
    # serialize the array column for the driver canonicalizer
    return out.select(
        "vec_id", F.to_json("components").alias("components")
    ).orderBy("vec_id")


def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dup (quote/subset detection,
    c >= 0.9 either direction) through the SAME deterministic
    MinHash-LSH banding as lsh_near_dup — token shingles, 1-in-20
    sample (pair output is cluster-quadratic; the tighter sample keeps
    the bench pair frame bounded)."""
    from harmonize_search_analyze_spark.operators.dedup import (
        containment_pairs,
    )

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 20 == 0)
    return containment_pairs(
        docs, "doc_id", "text", threshold=0.9, k=8, n=1, rows_per_band=2
    ).orderBy("id1", "id2")


def _sql_containment_pairs() -> str:
    from harmonize_search_analyze_spark.functions.hashing import (
        hash64_sql,
        minhash_params,
        minhash_term_sql,
    )
    from harmonize_search_analyze_spark.operators.dedup import (
        containment_sql,
        jaccard_sql,
        shingles_sql,
    )

    sh = shingles_sql("text", "duckdb", 1)
    mh = [
        f"list_min(list_transform({sh}, s -> "
        f"{minhash_term_sql(hash64_sql('s', 'duckdb'), a, b)})) AS mh_{i}"
        for i, (a, b) in enumerate(minhash_params(8))
    ]
    bands = " UNION ALL ".join(
        f"SELECT doc_id, {bi} AS band_idx, "
        f"CAST(mh_{2 * bi} AS VARCHAR) || '_' || CAST(mh_{2 * bi + 1} AS"
        f" VARCHAR) AS band_key FROM sigs"
        for bi in range(4)
    )
    c12 = containment_sql("sa.shingles", "sb.shingles", "duckdb")
    c21 = containment_sql("sb.shingles", "sa.shingles", "duckdb")
    j = jaccard_sql("sa.shingles", "sb.shingles", "duckdb")
    return f"""
WITH docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 20 = 0
), sigs AS (
  SELECT doc_id, {', '.join(mh)} FROM docs
), bands AS ({bands}),
cands AS (
  SELECT DISTINCT l.doc_id AS id1, r.doc_id AS id2
  FROM bands l JOIN bands r
    ON l.band_idx = r.band_idx AND l.band_key = r.band_key
   AND l.doc_id < r.doc_id
), sh AS (
  SELECT doc_id, {sh} AS shingles FROM docs
)
SELECT id1, id2, c12, c21, jaccard FROM (
  SELECT id1, id2, {c12} AS c12, {c21} AS c21, {j} AS jaccard
  FROM cands JOIN sh sa ON sa.doc_id = id1 JOIN sh sb ON sb.doc_id = id2
) WHERE c12 >= 0.9 OR c21 >= 0.9 ORDER BY id1, id2
"""


def q_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the high-quantity co-purchase graph by fixed-iteration
    peeling (6 rounds, the pagerank-style unrollable pin) — the dense
    core a crawl-quality curator keeps."""
    from harmonize_search_analyze_spark.operators.graph import k_core

    li = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 45)
    pp = li.select("l_orderkey", "l_partkey").distinct()
    a = pp.alias("a")
    b = pp.alias("b")
    edges = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("src"),
        F.col("b.l_partkey").alias("dst"),
    )
    return k_core(edges, k=3, iters=6)


def _sql_k_core() -> str:
    from harmonize_search_analyze_spark.operators.graph import k_core_sql

    edges = (
        "SELECT a.l_partkey AS src, b.l_partkey AS dst FROM "
        "(SELECT DISTINCT l_orderkey, l_partkey FROM lineitem "
        " WHERE l_quantity >= 45) a JOIN "
        "(SELECT DISTINCT l_orderkey, l_partkey FROM lineitem "
        " WHERE l_quantity >= 45) b "
        "ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"
    )
    return k_core_sql(edges, "duckdb", k=3, iters=6)


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the first and second
    half-month of event values — the industry-standard score-drift
    monitor, fixed-width reference bins, floored-proportion smoothing."""
    from harmonize_search_analyze_spark.operators.analytics import (
        psi_drift,
    )

    ev = _t(spark, sf_dir, "events")
    ref = ev.where(F.col("ts") < F.lit("2024-01-16").cast("timestamp"))
    act = ev.where(F.col("ts") >= F.lit("2024-01-16").cast("timestamp"))
    return psi_drift(ref, act, "value", bins=10)


def _sql_psi_drift() -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        psi_drift_sql,
    )

    return psi_drift_sql(
        "SELECT value FROM events"
        " WHERE ts < CAST('2024-01-16' AS TIMESTAMP)",
        "SELECT value FROM events"
        " WHERE ts >= CAST('2024-01-16' AS TIMESTAMP)",
        "value",
        "duckdb",
        bins=10,
    )


def q_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS trend of value over elapsed days (shared
    SQL-standard REGR_* aggregates; one map-combinable agg)."""
    from harmonize_search_analyze_spark.operators.analytics import (
        ols_trend,
    )

    ev = _t(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    return ols_trend(
        ev,
        "datediff(CAST(ts AS DATE), DATE '2024-01-01')",
        "value",
        by="event_type",
    )


def _sql_ols_trend() -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        ols_trend_sql,
    )

    return ols_trend_sql(
        "events",
        "datediff('day', DATE '2024-01-01', CAST(ts AS DATE))",
        "value",
        "duckdb",
        by="event_type",
        where="ts IS NOT NULL AND event_type IS NOT NULL",
    )


def q_xcorr_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation of daily click vs purchase counts at lags
    -5..+5 — the lead/lag detector over two date_histogram series
    (shared CORR aggregate, bucket-frame-sized everything)."""
    from harmonize_search_analyze_spark.operators.analytics import (
        xcorr_lags,
    )

    ev = _t(spark, sf_dir, "events").where(F.col("ts").isNotNull())

    def daily(t: str) -> DataFrame:
        return (
            ev.where(F.col("event_type") == t)
            .groupBy(F.date_trunc("day", "ts").alias("bucket"))
            .agg(F.count(F.lit(1)).cast("double").alias("v"))
        )

    return xcorr_lags(
        daily("click"), daily("purchase"),
        a_col="v", b_col="v", max_lag=5,
    )


def _sql_xcorr_lags() -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        xcorr_lags_sql,
    )

    def daily(t: str) -> str:
        return (
            "SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,"
            " CAST(COUNT(*) AS DOUBLE) AS v FROM events"
            f" WHERE ts IS NOT NULL AND event_type = '{t}' GROUP BY 1"
        )

    return xcorr_lags_sql(daily("click"), daily("purchase"), "duckdb",
                          max_lag=5)


def q_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the recorded language label and a derived
    second 'annotator' (lang with a deterministic 1-in-7 disagreement)
    — the labeling-QA agreement gate."""
    from harmonize_search_analyze_spark.operators.analytics import (
        cohens_kappa,
    )

    docs = _t(spark, sf_dir, "documents").select(
        F.col("lang").alias("rater_a"),
        F.when(F.col("doc_id") % 7 == 0, F.lit("xx"))
        .otherwise(F.col("lang"))
        .alias("rater_b"),
    )
    return cohens_kappa(docs, "rater_a", "rater_b")


def _sql_cohens_kappa() -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        cohens_kappa_sql,
    )

    return cohens_kappa_sql(
        "(SELECT lang AS rater_a,"
        " CASE WHEN doc_id % 7 = 0 THEN 'xx' ELSE lang END AS rater_b"
        " FROM documents) t",
        "rater_a",
        "rater_b",
        "duckdb",
    )


def q_set_similarity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Jaccard self-join (prefix filtering, AllPairs/PPJoin
    family) at t=0.9 on the 1-in-20 token-set sample — the
    no-false-negative counterpart the LSH path trades recall against;
    integer-exact rational threshold arithmetic on both engines."""
    from harmonize_search_analyze_spark.operators.dedup import (
        set_similarity_join,
    )

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 20 == 0)
    return set_similarity_join(
        docs, "doc_id", "text", threshold=0.9, n=1
    )


def _sql_set_similarity_join() -> str:
    from harmonize_search_analyze_spark.operators.dedup import (
        set_similarity_join_sql,
    )

    return set_similarity_join_sql(
        "(SELECT doc_id, text FROM documents WHERE doc_id % 20 = 0) t",
        "doc_id",
        "text",
        "duckdb",
        threshold=0.9,
        n=1,
    )


def q_kcenter_seed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-center greedy seed: the embedding farthest from the corpus
    mean (tie id ASC) — the oracle-pinned step of kcenter_select
    (trainer-pattern split)."""
    from harmonize_search_analyze_spark.operators.similarity import (
        kcenter_seed,
    )

    return kcenter_seed(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding"
    )


def _sql_kcenter_seed() -> str:
    from harmonize_search_analyze_spark.operators.similarity import (
        kcenter_seed_sql,
    )

    return kcenter_seed_sql(
        "embeddings", "vec_id", "embedding", "duckdb", d=64
    )


def q_kcenter_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-center greedy coreset (Gonzalez farthest-point, k=8) over the
    embeddings — diversity-maximizing data selection; rows-only (the
    greedy loop is driver-iterative), seeded by the oracle-pinned
    kcenter_seed."""
    from harmonize_search_analyze_spark.operators.similarity import (
        kcenter_select,
    )

    return kcenter_select(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding", k=8
    )


def q_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified silhouette over the same pinned centroids
    kmeans_assign uses (vec_id < 8) — the cluster-quality eval the
    trainer pair reports against."""
    from harmonize_search_analyze_spark.operators.similarity import (
        simplified_silhouette,
    )

    emb = _t(spark, sf_dir, "embeddings")
    cents = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("centroid_id"),
        F.col("embedding").cast("array<double>").alias("cvec"),
    )
    return simplified_silhouette(emb, "vec_id", "embedding", cents)


def _sql_silhouette() -> str:
    from harmonize_search_analyze_spark.operators.similarity import (
        simplified_silhouette_sql,
    )

    return simplified_silhouette_sql(
        "embeddings",
        "vec_id",
        "embedding",
        "SELECT CAST(vec_id AS INT) AS centroid_id, embedding AS cvec"
        " FROM embeddings WHERE vec_id < 8",
        "duckdb",
    )


def q_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc zlib compression ratio (the Gopher-era machine-text
    detector the SQL repetition signals approximate) — Arrow-batched
    zlib, rows-only check (no zlib in the oracle engine; determinism
    and monotonicity pinned by unit tests)."""
    from harmonize_search_analyze_spark.operators.curation import (
        compression_ratio,
    )

    return compression_ratio(_t(spark, sf_dir, "documents"), "text")


def q_prop_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test: high-value conversion (value > 250) between
    click and view events — one conditional-agg scan, p-value via the
    shared A&S erf polynomial."""
    from harmonize_search_analyze_spark.operators.analytics import (
        prop_ztest,
    )

    ev = _t(spark, sf_dir, "events")
    return prop_ztest(
        ev,
        F.col("value") > 250,
        F.col("event_type") == "click",
        F.col("event_type") == "view",
    )


def _sql_prop_ztest() -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        prop_ztest_sql,
    )

    return prop_ztest_sql(
        "events",
        "value > 250",
        "event_type = 'click'",
        "event_type = 'view'",
        "duckdb",
    )


def q_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform-random in-corpus negatives (DPR-style contrastive
    training data): for each customer with custkey < 50, 4 orders they
    did NOT place, drawn deterministically from the rank-indexed order
    pool — never a query x corpus cross product."""
    from harmonize_search_analyze_spark.operators.sampling import (
        negative_sampling,
    )

    orders = _t(spark, sf_dir, "orders")
    positives = orders.where(F.col("o_custkey") < 50).select(
        F.col("o_custkey").alias("query_id"),
        F.col("o_orderkey").alias("doc_id"),
    )
    pool = orders.select(F.col("o_orderkey").alias("doc_id"))
    return negative_sampling(positives, pool, k=4)


def _sql_negative_sampling() -> str:
    from harmonize_search_analyze_spark.operators.sampling import (
        negative_sampling_sql,
    )

    return negative_sampling_sql(
        "SELECT o_custkey AS query_id, o_orderkey AS doc_id"
        " FROM orders WHERE o_custkey < 50",
        "SELECT o_orderkey AS doc_id FROM orders",
        "duckdb",
        k=4,
    )


def q_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (bits) + NMI between document language and
    source — the feature-redundancy signal over one pair-count scan."""
    from harmonize_search_analyze_spark.operators.analytics import (
        mutual_info,
    )

    return mutual_info(_t(spark, sf_dir, "documents"), "lang", "source")


def _sql_mutual_info() -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        mutual_info_sql,
    )

    return mutual_info_sql("documents", "lang", "source", "duckdb")


def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc 5-gram novelty of double-digit sources vs the
    single-digit reference corpus — memorization scoring, exact by
    construction with the Bloom prefilter carrying the scale path."""
    from harmonize_search_analyze_spark.operators.contamination import (
        ngram_novelty,
    )

    docs = _t(spark, sf_dir, "documents")
    return ngram_novelty(
        docs.where(F.length("source") == 5),
        docs.where(F.length("source") == 4),
        "doc_id",
        "text",
        n=5,
    )


def _sql_ngram_novelty() -> str:
    from harmonize_search_analyze_spark.operators.contamination import (
        ngram_novelty_sql,
    )

    return ngram_novelty_sql(
        "SELECT doc_id, text FROM documents WHERE LENGTH(source) = 5",
        "SELECT text FROM documents WHERE LENGTH(source) = 4",
        "doc_id",
        "text",
        "duckdb",
        n=5,
    )


def q_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style partial-copy detection on the 1-in-20 document
    sample: winnowing fingerprints (char 8-grams, window 4 — any shared
    substring >= 11 chars forces a shared fingerprint), boilerplate
    stop-fingerprint cap, pairs by shared count."""
    from harmonize_search_analyze_spark.operators.dedup import (
        winnow_pairs,
    )

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 20 == 0)
    return winnow_pairs(
        docs, "doc_id", "text", ngram=8, window=4, min_shared=8,
        max_postings=50,
    )


def _sql_winnow_pairs() -> str:
    from harmonize_search_analyze_spark.operators.dedup import winnow_sql

    w = winnow_sql("text", "duckdb", ngram=8, window=4)
    return f"""
WITH docs AS (
  SELECT doc_id, text FROM documents
  WHERE doc_id % 20 = 0 AND text IS NOT NULL
),
fps AS (
  SELECT DISTINCT doc_id, unnest({w}) AS fingerprint FROM docs
),
kept AS (
  SELECT fps.doc_id, fps.fingerprint
  FROM fps
  JOIN (SELECT fingerprint FROM fps GROUP BY fingerprint
        HAVING COUNT(*) <= 50) ok
    ON fps.fingerprint = ok.fingerprint
)
SELECT a.doc_id AS id1, b.doc_id AS id2,
       CAST(COUNT(*) AS BIGINT) AS shared
FROM kept a JOIN kept b
  ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING COUNT(*) >= 8
ORDER BY shared DESC, id1 ASC, id2 ASC
"""


def q_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the holt one-step forecast over daily event counts
    (MAE/RMSE/MAPE/MASE vs the naive previous-value baseline) — the
    eval layer the smoothing knobs tune against."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        forecast_backtest,
    )

    daily = (
        _t(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull())
        .groupBy(F.date_trunc("day", "ts").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )
    return forecast_backtest(
        daily, "bucket", "doc_count", fn="holt", window=7,
        alpha=0.3, beta=0.1,
    )


def _sql_forecast_backtest() -> str:
    preds = _sql_moving_holt()
    return f"""
WITH preds AS ({preds}),
ev AS (
  SELECT CAST(doc_count AS DOUBLE) AS v, moving_fn,
         LAG(CAST(doc_count AS DOUBLE)) OVER (ORDER BY bucket) AS prev
  FROM preds
),
kept AS (
  SELECT * FROM ev WHERE moving_fn IS NOT NULL AND prev IS NOT NULL
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_eval,
       ROUND(AVG(ABS(v - moving_fn)), 6) AS mae,
       ROUND(SQRT(AVG((v - moving_fn) * (v - moving_fn))), 6) AS rmse,
       ROUND(AVG(CASE WHEN v <> 0 THEN ABS(v - moving_fn) / ABS(v)
                 END), 6) AS mape,
       ROUND(AVG(ABS(v - moving_fn))
             / NULLIF(AVG(ABS(v - prev)), 0.0), 6) AS mase
FROM kept
"""


# -- round-6 additions ---------------------------------------------------------

def q_cusum_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM mean-shift monitor over the daily event-count series — the
    sequential drift detector beside change_point's single retrospective
    split. Two ordered windows over the bucket frame (the max(0, .)
    recursion closes over prefix sums, no iteration)."""
    from harmonize_search_analyze_spark.operators.analytics import (
        cusum_change,
    )

    daily = (
        _t(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull())
        .groupBy(F.date_trunc("day", "ts").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )
    return cusum_change(daily, "bucket", "doc_count", k=0.5, h=5.0)


def _sql_cusum_change(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        cusum_change_sql,
    )

    buckets = (
        "SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket, "
        "COUNT(*) AS v FROM events WHERE ts IS NOT NULL GROUP BY 1"
    )
    return cusum_change_sql(buckets, dialect, k=0.5, h=5.0)


def q_benford_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of lineitem extended prices — one
    9-bucket count agg + 9-row arithmetic."""
    from harmonize_search_analyze_spark.operators.analytics import (
        benford_test,
    )

    return benford_test(_t(spark, sf_dir, "lineitem"), "l_extendedprice")


def _sql_benford_test(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        benford_test_sql,
    )

    return benford_test_sql("lineitem", "l_extendedprice", dialect)


def q_jsd_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between the token distributions of the
    even- and odd-id document halves — the corpus-drift / source-mixing
    divergence metric. One explode + one vocab-sized agg."""
    from harmonize_search_analyze_spark.operators.text import (
        jsd_divergence,
    )

    docs = _t(spark, sf_dir, "documents")
    return jsd_divergence(docs, "text", "doc_id % 2 = 0")


def _sql_jsd_divergence(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.text import (
        jsd_divergence_sql,
    )

    return jsd_divergence_sql(
        "documents", "text", "doc_id % 2 = 0", dialect
    )


def q_distinct_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-bigram diversity per document source — the repetition /
    mode-collapse audit (low distinct share = templated source)."""
    from harmonize_search_analyze_spark.operators.text import (
        distinct_ngrams,
    )

    docs = _t(spark, sf_dir, "documents", spread=True)
    return distinct_ngrams(docs, "text", "source", n=2)


def _sql_distinct_ngrams(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.text import (
        distinct_ngrams_sql,
    )

    return distinct_ngrams_sql("documents", "text", "source", dialect, n=2)


def q_leakage_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test leakage audit: MinHash-LSH near-dup pairs (the
    lsh_near_dup pipeline, same 1-in-10 sample) tallied by the
    80/10/10 hash-split boundary they span. Split labels are pure hash
    expressions of the pair ids — zero joins on top of the LSH pass."""
    from harmonize_search_analyze_spark.operators.dedup import leakage_check

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 10 == 0)
    return leakage_check(
        docs, "doc_id", "text",
        {"train": 0.8, "valid": 0.1, "test": 0.1},
        threshold=0.9, k=8, n=1, rows_per_band=2,
    )


def _sql_leakage_check() -> str:
    from harmonize_search_analyze_spark.operators.ordering import (
        split_case_sql,
    )

    pairs = _sql_lsh_near_dup()
    fr = {"train": 0.8, "valid": 0.1, "test": 0.1}
    s1 = split_case_sql("id1", fr, "duckdb")
    s2 = split_case_sql("id2", fr, "duckdb")
    return f"""
WITH pairs AS ({pairs}),
labeled AS (
  SELECT LEAST({s1}, {s2}) AS split_a,
         GREATEST({s1}, {s2}) AS split_b
  FROM pairs
),
grouped AS (
  SELECT split_a, split_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM labeled GROUP BY split_a, split_b
),
tot AS (
  SELECT SUM(n_pairs) AS tot,
         SUM(CASE WHEN split_a <> split_b THEN n_pairs ELSE 0 END) AS crossed
  FROM grouped
)
SELECT split_a, split_b, n_pairs,
       (split_a <> split_b) AS is_cross,
       ROUND(crossed / CAST(tot AS DOUBLE), 6) AS cross_share
FROM grouped CROSS JOIN tot
ORDER BY split_a, split_b
"""


def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test between click and purchase event
    values — the nonparametric two-sample gate beside t_test. Midranks
    via a value-cardinality-sized window, never a corpus rank."""
    from harmonize_search_analyze_spark.operators.analytics import (
        mann_whitney,
    )

    ev = _t(spark, sf_dir, "events")
    return mann_whitney(
        ev, "value",
        F.col("event_type") == "click",
        F.col("event_type") == "purchase",
    )


def _sql_mann_whitney(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        mann_whitney_sql,
    )

    return mann_whitney_sql(
        "events", "value",
        "event_type = 'click'", "event_type = 'purchase'", dialect,
    )


def q_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + ECE + Brier for a deterministic stand-in
    score (l_discount * 10 in [0,1]) against the return-flag outcome —
    the classifier-calibration gate, one bin-keyed agg."""
    from harmonize_search_analyze_spark.operators.analytics import (
        calibration,
    )

    li = _t(spark, sf_dir, "lineitem")
    return calibration(
        li, "l_discount * 10",
        "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END", bins=10,
    )


def _sql_calibration(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        calibration_sql,
    )

    return calibration_sql(
        "lineitem", "l_discount * 10",
        "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END", dialect, bins=10,
    )


def q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goh-Barabasi burstiness of per-user inter-arrival gaps by event
    type — one (type, user) lag window + one group agg."""
    from harmonize_search_analyze_spark.operators.analytics import (
        burstiness,
    )

    return burstiness(_t(spark, sf_dir, "events"))


def _sql_burstiness(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        burstiness_sql,
    )

    return burstiness_sql("events", dialect)


def q_quantile_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quantile normalization of document lengths onto the
    global length distribution (20-point grid) — the cross-source
    score-comparability transform for mixing."""
    from harmonize_search_analyze_spark.operators.sampling import (
        quantile_norm,
    )

    docs = _t(spark, sf_dir, "documents")
    return quantile_norm(docs, "doc_id", "n_chars", "source", grid=20)


def _sql_quantile_norm(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.sampling import (
        quantile_norm_sql,
    )

    return quantile_norm_sql(
        "documents", "doc_id", "n_chars", "source", dialect, grid=20
    )


def q_source_jsd_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise token-distribution JSD between all document sources —
    the mixture-design matrix. One (source, token) agg + one token-keyed
    self-join (fan-out bounded by source count)."""
    from harmonize_search_analyze_spark.operators.text import (
        source_jsd_matrix,
    )

    return source_jsd_matrix(
        _t(spark, sf_dir, "documents"), "text", "source"
    )


def _sql_source_jsd_matrix(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.text import (
        source_jsd_matrix_sql,
    )

    return source_jsd_matrix_sql("documents", "text", "source", dialect)


def q_trimmed_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trimmed/winsorized mean of extended price per return flag — the
    outlier-robust aggregation. One percentile agg broadcast back + one
    conditional re-aggregation."""
    from harmonize_search_analyze_spark.operators.analytics import (
        trimmed_stats,
    )

    return trimmed_stats(
        _t(spark, sf_dir, "lineitem"), "l_extendedprice",
        by="l_returnflag", lower=0.05, upper=0.95,
    )


def _sql_trimmed_stats(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        trimmed_stats_sql,
    )

    return trimmed_stats_sql(
        "lineitem", "l_extendedprice", dialect,
        by="l_returnflag", lower=0.05, upper=0.95,
    )


def q_acf_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily event-count series at lags 1..7 —
    the seasonality fingerprint that picks moving_fn windows."""
    from harmonize_search_analyze_spark.operators.analytics import (
        acf_series,
    )

    daily = (
        _t(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull())
        .groupBy(F.date_trunc("day", "ts").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )
    return acf_series(daily, "bucket", "doc_count", max_lag=7)


def _sql_acf_series(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        acf_series_sql,
    )

    buckets = (
        "SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket, "
        "COUNT(*) AS v FROM events WHERE ts IS NOT NULL GROUP BY 1"
    )
    return acf_series_sql(buckets, dialect, max_lag=7)


def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift between the even- and odd-id halves
    of the embeddings table: cosine/L2 between mean vectors + max
    per-dimension shift. Nothing bigger than d rows shuffles."""
    from harmonize_search_analyze_spark.operators.similarity import (
        embedding_drift,
    )

    emb = _t(spark, sf_dir, "embeddings")
    return embedding_drift(
        emb.where(F.col("vec_id") % 2 == 0),
        emb.where(F.col("vec_id") % 2 == 1),
        "embedding",
    )


def _sql_embedding_drift(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.similarity import (
        embedding_drift_sql,
    )

    return embedding_drift_sql(
        "SELECT embedding FROM embeddings WHERE vec_id % 2 = 0",
        "SELECT embedding FROM embeddings WHERE vec_id % 2 = 1",
        "embedding",
        dialect,
    )


def q_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth fit over documents ordered by id
    (20 rank buckets; first-appearance min-bucket trick + REGR_* on the
    log-log curve) — the corpus-planning curve."""
    from harmonize_search_analyze_spark.operators.text import heaps_law

    return heaps_law(
        _t(spark, sf_dir, "documents"), "text", "doc_id", buckets=20
    )


def _sql_heaps_law(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.text import heaps_law_sql

    return heaps_law_sql("documents", "text", "doc_id", dialect, buckets=20)


def q_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram conditional entropy (bits/token) of the document corpus —
    the no-training predictability/diversity number."""
    from harmonize_search_analyze_spark.operators.text import entropy_rate

    return entropy_rate(_t(spark, sf_dir, "documents", spread=True), "text")


def _sql_entropy_rate(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.text import (
        entropy_rate_sql,
    )

    return entropy_rate_sql("documents", "text", dialect)


def q_confusion_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision/recall/F1 + accuracy/macro-F1 of the lang-ID
    heuristic against the documents table's lang column — the
    model-annotated-column QA gate. One (truth, pred) pair-count scan."""
    from harmonize_search_analyze_spark.operators.analytics import (
        confusion_eval,
    )
    from harmonize_search_analyze_spark.operators.text import with_lang_id

    docs = _t(spark, sf_dir, "documents")
    # staged lang-ID (round 11): tokenize + score ONCE per row instead of
    # re-deriving the token array inside every CASE reference (~40x) —
    # same scores, same argmax tie order, identical values (with_lang_id
    # docstring); the DuckDB oracle keeps the inlined lang_id_sql text.
    staged = with_lang_id(
        docs.select("lang", "text"), "text", "__pred"
    )
    return confusion_eval(staged, "lang", "__pred")


def _sql_confusion_eval(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        confusion_eval_sql,
    )
    from harmonize_search_analyze_spark.operators.text import lang_id_sql

    return confusion_eval_sql(
        "documents", "lang", lang_id_sql("text", dialect), dialect
    )


def q_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rank-statistic ROC AUC of the deterministic stand-in score
    (l_discount * 10) against the return-flag outcome — the
    threshold-free twin of q_calibration."""
    from harmonize_search_analyze_spark.operators.analytics import roc_auc

    return roc_auc(
        _t(spark, sf_dir, "lineitem"), "l_discount * 10",
        "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END",
    )


def _sql_roc_auc(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        roc_auc_sql,
    )

    return roc_auc_sql(
        "lineitem", "l_discount * 10",
        "CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END", dialect,
    )


def q_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F of event value across event types (exact
    (F, df1, df2) reported, CDF left to the caller — the t_test
    divergence note). One map-combinable group agg."""
    from harmonize_search_analyze_spark.operators.analytics import anova_f

    return anova_f(_t(spark, sf_dir, "events"), "value", "event_type")


def _sql_anova_f(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        anova_f_sql,
    )

    return anova_f_sql("events", "value", "event_type", dialect)


def q_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between lineitem quantity and extended
    price — Pearson on midranks via the value-level rank trick."""
    from harmonize_search_analyze_spark.operators.analytics import (
        spearman_corr,
    )

    # spread=True tried round 11 and measured WORSE (A/B 2.44 -> 3.73 s:
    # the four 3-task per-value agg stages already run concurrently;
    # spreading adds a full-width exchange and serializes them)
    return spearman_corr(
        _t(spark, sf_dir, "lineitem"), "l_quantity", "l_extendedprice"
    )


def _sql_spearman_corr(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        spearman_corr_sql,
    )

    return spearman_corr_sql(
        "lineitem", "l_quantity", "l_extendedprice", dialect
    )


def q_cross_source_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dup clusters spanning more than one document source —
    the mirror/leak mixture-hygiene audit. Two-level digest agg (the
    Expand-trap-free count + count-distinct stack)."""
    from harmonize_search_analyze_spark.operators.dedup import (
        cross_source_dups,
    )

    return cross_source_dups(
        _t(spark, sf_dir, "documents"), "text", "source"
    )


def _sql_cross_source_dups(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.dedup import (
        cross_source_dups_sql,
    )

    return cross_source_dups_sql("documents", "text", "source", dialect)


def q_template_prefixes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most repeated 32-char document prefixes with corpus share
    — the boilerplate/synthetic-template tell."""
    from harmonize_search_analyze_spark.operators.text import (
        template_prefixes,
    )

    return template_prefixes(
        _t(spark, sf_dir, "documents"), "text", prefix_len=32, k=20
    )


def _sql_template_prefixes(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.text import (
        template_prefixes_sql,
    )

    return template_prefixes_sql(
        "documents", "text", dialect, prefix_len=32, k=20
    )


def q_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise KMV-sketch document overlap between all sources
    (k=64 sketches over text) — the sketch-based mixture-design matrix;
    corpora are never joined, only k-row sketches."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        source_overlap_matrix,
    )

    return source_overlap_matrix(
        _t(spark, sf_dir, "documents"), "text", "source", k=64
    )


def _sql_source_overlap_matrix(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.aggregations import (
        source_overlap_matrix_sql,
    )

    return source_overlap_matrix_sql(
        "documents", "text", "source", dialect, k=64
    )


def q_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the event-type journey Markov chain
    (12 fixed power-iteration steps over a state-sized matrix) — the
    equilibrium behind step_transitions' Sankey edges."""
    from harmonize_search_analyze_spark.operators.analytics import (
        markov_stationary,
    )

    return markov_stationary(
        _t(spark, sf_dir, "events"), "user_id", "ts", "event_type",
        iters=12,
    )


def _sql_markov_stationary(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        markov_stationary_sql,
    )

    return markov_stationary_sql(
        "events", "user_id", "ts", "event_type", dialect, iters=12
    )


_BLOCKLIST_TERMS = ["error", "null", "undefined", "lorem"]


def q_blocklist_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist term hit rates per document source — the cheap policy
    screen stage; the term list folds inside one column expression."""
    from harmonize_search_analyze_spark.operators.analytics import (
        blocklist_scan,
    )

    return blocklist_scan(
        _t(spark, sf_dir, "documents"), "text", "source", _BLOCKLIST_TERMS
    )


def _sql_blocklist_scan(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        blocklist_scan_sql,
    )

    return blocklist_scan_sql(
        "documents", "text", "source", _BLOCKLIST_TERMS, dialect
    )


def q_group_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language diversity per document source (Shannon/normalized
    entropy + majority share) — the monolingual-source tell."""
    from harmonize_search_analyze_spark.operators.analytics import (
        group_entropy,
    )

    return group_entropy(_t(spark, sf_dir, "documents"), "source", "lang")


def _sql_group_entropy(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        group_entropy_sql,
    )

    return group_entropy_sql("documents", "source", "lang", dialect)


def q_dup_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-duplication factor (docs per distinct digest) —
    the one-number dedup-pressure gauge."""
    from harmonize_search_analyze_spark.operators.analytics import (
        dup_factor,
    )

    return dup_factor(_t(spark, sf_dir, "documents"), "text", "source")


def _sql_dup_factor(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        dup_factor_sql,
    )

    return dup_factor_sql("documents", "text", "source", dialect)


def q_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar paired test between two weak high-value-event classifiers
    (event-type-based vs hour-parity-based) against the value>50 label —
    only the discordant cells matter."""
    from harmonize_search_analyze_spark.operators.analytics import (
        mcnemar_test,
    )

    ev = _t(spark, sf_dir, "events")
    label = F.col("value") > 50
    pred_a = F.col("event_type").isin("purchase", "click")
    pred_b = F.hour("ts") % 2 == 0
    return mcnemar_test(ev, pred_a == label, pred_b == label)


def _sql_mcnemar(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        mcnemar_test_sql,
    )

    return mcnemar_test_sql(
        "events",
        "(event_type IN ('purchase', 'click')) = (value > 50)",
        "(hour(ts) % 2 = 0) = (value > 50)",
        dialect,
    )


def q_wilson_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language long-document rate with Wilson 95% intervals — the
    sliced-eval staple that stays honest at small n."""
    from harmonize_search_analyze_spark.operators.analytics import (
        wilson_intervals,
    )

    return wilson_intervals(
        _t(spark, sf_dir, "documents"), F.col("n_chars") > 300, "lang"
    )


def _sql_wilson_intervals(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        wilson_intervals_sql,
    )

    return wilson_intervals_sql("documents", "n_chars > 300", "lang", dialect)


def q_effect_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d / Hedges' g for click vs purchase event values — the
    "is it LARGE" companion to mann_whitney on the same frames."""
    from harmonize_search_analyze_spark.operators.analytics import (
        effect_size,
    )

    return effect_size(
        _t(spark, sf_dir, "events"), "value",
        F.col("event_type") == "click",
        F.col("event_type") == "purchase",
    )


def _sql_effect_size(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        effect_size_sql,
    )

    return effect_size_sql(
        "events", "value",
        "event_type = 'click'", "event_type = 'purchase'", dialect,
    )


def q_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Herfindahl concentration of source shares — the
    head-weighted twin of group_entropy's tail-weighted gauge."""
    from harmonize_search_analyze_spark.operators.analytics import (
        hhi_concentration,
    )

    return hhi_concentration(_t(spark, sf_dir, "documents"), "lang", "source")


def _sql_hhi_concentration(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        hhi_concentration_sql,
    )

    return hhi_concentration_sql("documents", "lang", "source", dialect)


def q_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality of document lengths with the between/within
    source decomposition — where the size unevenness lives."""
    from harmonize_search_analyze_spark.operators.analytics import (
        theil_index,
    )

    return theil_index(_t(spark, sf_dir, "documents"), "n_chars", "source")


def _sql_theil_index(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        theil_index_sql,
    )

    return theil_index_sql("documents", "n_chars", "source", dialect)


def q_jackknife_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-block jackknife CI for the mean event value over 50
    deterministic hash blocks — the resampling CI that runs in one
    pass."""
    from harmonize_search_analyze_spark.operators.analytics import (
        jackknife_ci,
    )

    return jackknife_ci(_t(spark, sf_dir, "events"), "value", "event_id")


def _sql_jackknife_ci(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        jackknife_ci_sql,
    )

    return jackknife_ci_sql("events", "value", "event_id", dialect)


def q_hazard_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard over user lifetimes (7-day churn
    gap) — the additive twin of kaplan_meier with the never-zero
    Fleming-Harrington survival."""
    from harmonize_search_analyze_spark.operators.analytics import (
        hazard_rate,
    )

    return hazard_rate(_t(spark, sf_dir, "events"))


def _sql_hazard_rate(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        hazard_rate_sql,
    )

    return hazard_rate_sql("events")


def q_sprt_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald SPRT daily trace for the click arm's value>95 rate
    (H0 p=0.15 vs H1 p=0.18, alpha 0.05, beta 0.2) — stop-early
    monitoring with sticky decisions."""
    from harmonize_search_analyze_spark.operators.analytics import (
        sprt_monitor,
    )

    return sprt_monitor(
        _t(spark, sf_dir, "events"),
        F.col("value") > 95,
        F.col("event_type") == "click",
        "ts",
        p0=0.15, p1=0.18,
    )


def _sql_sprt_monitor(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        sprt_monitor_sql,
    )

    return sprt_monitor_sql(
        "events", "value > 95", "event_type = 'click'", "ts", dialect,
        p0=0.15, p1=0.18,
    )


def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative token-mass coverage at vocab ranks 5/10/20/30 — the
    tokenizer-budget curve via ONE scalable prefix-sum pass (rank and
    mass together)."""
    from harmonize_search_analyze_spark.operators.text import (
        vocab_coverage,
    )

    return vocab_coverage(
        _t(spark, sf_dir, "documents"), "text", ks=(5, 10, 20, 30)
    )


def _sql_vocab_coverage(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.text import (
        vocab_coverage_sql,
    )

    return vocab_coverage_sql("documents", "text", dialect, ks=(5, 10, 20, 30))


def q_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked levenshtein<=3 self-join over 16-char document titles —
    typo/near-variant pairs on the DISTINCT-title frame with prefix
    blocking and the length-band lower bound."""
    from harmonize_search_analyze_spark.operators.dedup import fuzzy_join

    return fuzzy_join(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        title_len=16, block_len=4, max_dist=3,
    )


def _sql_fuzzy_join(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.dedup import fuzzy_join_sql

    return fuzzy_join_sql(
        "documents", "doc_id", "text", dialect,
        title_len=16, block_len=4, max_dist=3,
    )



def q_orphan_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit of lineitem.l_orderkey against
    orders.o_orderkey — orphans, NULL FKs, and childless parents from
    one distinct-key full-outer join."""
    from harmonize_search_analyze_spark.operators.curation import (
        orphan_check,
    )

    return orphan_check(
        _t(spark, sf_dir, "lineitem"), "l_orderkey",
        _t(spark, sf_dir, "orders"), "o_orderkey",
    )


def _sql_orphan_check(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.curation import (
        orphan_check_sql,
    )

    return orphan_check_sql(
        "lineitem", "l_orderkey", "orders", "o_orderkey", dialect
    )


def q_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purity + NMI between source (as clusters) and language (as
    labels) over documents — is each source language-pure?"""
    from harmonize_search_analyze_spark.operators.analytics import (
        cluster_purity,
    )

    return cluster_purity(_t(spark, sf_dir, "documents"), "source", "lang")


def _sql_cluster_purity(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        cluster_purity_sql,
    )

    return cluster_purity_sql("documents", "source", "lang", dialect)


def q_qq_plot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QQ curve of event values, click vs purchase, on a 20-point
    percentile grid — WHERE the distributions diverge, beside
    ks_drift's single statistic."""
    from harmonize_search_analyze_spark.operators.analytics import (
        qq_plot,
    )

    return qq_plot(
        _t(spark, sf_dir, "events"), "value",
        F.col("event_type") == "click",
        F.col("event_type") == "purchase",
    )


def _sql_qq_plot(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        qq_plot_sql,
    )

    return qq_plot_sql(
        "events", "value",
        "event_type = 'click'", "event_type = 'purchase'", dialect,
    )


def q_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-click to first-subsequent-purchase latency distribution
    (conversion rate + p50/p90/p99/mean seconds) in one user-keyed
    window pass."""
    from harmonize_search_analyze_spark.operators.analytics import (
        conversion_lag,
    )

    return conversion_lag(_t(spark, sf_dir, "events"), "click", "purchase")


def _sql_conversion_lag(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        conversion_lag_sql,
    )

    return conversion_lag_sql("events", "click", "purchase", dialect)



def q_geo_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Getis-Ord Gi*-lite hotspots over the 5-degree hex tiling of the
    synthesized lineitem coordinates — self+6-neighbor sums via
    scatter-gather (a 7x explode of the CELL frame), never a neighbor
    join."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        geo_hotspots,
    )

    return geo_hotspots(
        _t(spark, sf_dir, "lineitem"), _LAT_EXPR, _LON_EXPR,
        size_deg=5.0, k=20,
    )


def _sql_geo_hotspots(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.aggregations import (
        geo_hotspots_sql,
    )

    return geo_hotspots_sql(
        "lineitem", _LAT_EXPR, _LON_EXPR, dialect, size_deg=5.0, k=20
    )


def q_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mass-weighted document-length percentiles (the median BYTE lives
    in how long a doc?) — n_chars weighted by itself, cumulative weight
    via the scalable prefix-sum primitive."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        weighted_percentile,
    )

    return weighted_percentile(
        _t(spark, sf_dir, "documents"), "n_chars", "n_chars"
    )


def _sql_weighted_percentile(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.aggregations import (
        weighted_percentile_sql,
    )

    return weighted_percentile_sql("documents", "n_chars", "n_chars", dialect)


def q_ipf_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative proportional fitting of (lang x source) cell weights to
    UNIFORM language and source shares (6 sweeps, unrollable) — the
    raking reweight for corpus balancing."""
    from harmonize_search_analyze_spark.operators.sampling import (
        ipf_weights,
    )

    return ipf_weights(_t(spark, sf_dir, "documents"), "lang", "source")


def _sql_ipf_weights(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.sampling import (
        ipf_weights_sql,
    )

    return ipf_weights_sql("documents", "lang", "source", dialect)



def q_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive STL-lite decomposition of daily event value: 7-day
    centered-MA trend, zero-centered day-of-week seasonal, residual,
    and Hyndman seasonal strength — calendar-bounded windows only."""
    from harmonize_search_analyze_spark.operators.analytics import (
        stl_decompose,
    )

    return stl_decompose(_t(spark, sf_dir, "events"), "ts", "value")


def _sql_stl_decompose(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        stl_decompose_sql,
    )

    return stl_decompose_sql("events", "ts", "value", dialect)


def q_lorenz_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve (10 population-decile cuts) + exact grouped Gini of
    document lengths — the top decile carries how much of the byte
    mass? Cumulative count AND mass in one prefix-sums pass."""
    from harmonize_search_analyze_spark.operators.analytics import (
        lorenz_gini,
    )

    return lorenz_gini(_t(spark, sf_dir, "documents"), "n_chars")


def _sql_lorenz_gini(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        lorenz_gini_sql,
    )

    return lorenz_gini_sql("documents", "n_chars", dialect)


def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust daily trend of event value (median pairwise
    slope over the calendar-bounded day frame) with the OLS slope as
    the sensitivity comparison."""
    from harmonize_search_analyze_spark.operators.analytics import (
        theil_sen,
    )

    return theil_sen(_t(spark, sf_dir, "events"), "ts", "value")


def _sql_theil_sen(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        theil_sen_sql,
    )

    return theil_sen_sql("events", "ts", "value", dialect)


def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V (raw + Bergsma bias-corrected) between document
    language and source — HOW related, where chi2_independence only
    says whether."""
    from harmonize_search_analyze_spark.operators.analytics import (
        cramers_v,
    )

    return cramers_v(_t(spark, sf_dir, "documents"), "lang", "source")


def _sql_cramers_v(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        cramers_v_sql,
    )

    return cramers_v_sql("documents", "lang", "source", dialect)


def q_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa (variable-rater generalization) over duplicate-text
    clusters: do copies of the same text carry the same source label —
    the annotation-consistency audit in agreement-statistic form."""
    from harmonize_search_analyze_spark.operators.analytics import (
        fleiss_kappa,
    )

    return fleiss_kappa(
        _t(spark, sf_dir, "documents"), "md5(text)", "source"
    )


def _sql_fleiss_kappa(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        fleiss_kappa_sql,
    )

    return fleiss_kappa_sql("documents", "md5(text)", "source", dialect)


def q_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's nominal alpha over per-user event-type 'ratings'
    (each user's events = repeated categorical measurements of one unit)
    — the missing-data agreement statistic fleiss_kappa can't express:
    units here have wildly uneven rating counts, and unpairable
    singletons must drop without biasing the marginals. One scan, two
    same-key-prefix hash aggs, 1-row result."""
    from harmonize_search_analyze_spark.operators.analytics import (
        krippendorff_alpha,
    )

    return krippendorff_alpha(
        _t(spark, sf_dir, "events"), "user_id", "event_type"
    )


def _sql_krippendorff_alpha() -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        krippendorff_alpha_sql,
    )

    return krippendorff_alpha_sql("events", "user_id", "event_type", "duckdb")


def q_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman variance-optimal eval-budget allocation across event types
    (1000 measurement rows split by N_h * S_h), reported against the
    proportional allocation — ONE map-combinable agg + a 1-row
    broadcast, no window."""
    from harmonize_search_analyze_spark.operators.sampling import (
        neyman_allocation,
    )

    return neyman_allocation(
        _t(spark, sf_dir, "events"), "event_type", "value", budget=1000
    )


def _sql_neyman_allocation() -> str:
    from harmonize_search_analyze_spark.operators.sampling import (
        neyman_allocation_sql,
    )

    return neyman_allocation_sql(
        "events", "event_type", "value", "duckdb", budget=1000
    )


def q_benjamini_hochberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BH step-up FDR screen over (event_type x hour-of-day) mean value
    shifts — the multiple-testing gate for hundred-slice drift
    monitoring."""
    from harmonize_search_analyze_spark.operators.analytics import (
        benjamini_hochberg,
    )

    return benjamini_hochberg(
        _t(spark, sf_dir, "events"),
        ["event_type", "hour(ts)"],
        "value",
    )


def _sql_benjamini_hochberg(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        benjamini_hochberg_sql,
    )

    return benjamini_hochberg_sql(
        "events", ["event_type", "hour(ts)"], "value", dialect
    )


def q_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: click/view touches in the 7-day
    window before each purchase share the conversion credit equally."""
    from harmonize_search_analyze_spark.operators.analytics import (
        attribution_linear,
    )

    return attribution_linear(
        _t(spark, sf_dir, "events"), ["click", "view"], "purchase"
    )


def _sql_attribution_linear(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        attribution_linear_sql,
    )

    return attribution_linear_sql(
        "events", ["click", "view"], "purchase", dialect
    )


def q_bot_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic bot scoring over the event stream: request rate,
    inter-event regularity, and type diversity — top 20 suspects."""
    from harmonize_search_analyze_spark.operators.analytics import (
        bot_score,
    )

    return bot_score(_t(spark, sf_dir, "events"))


def _sql_bot_score(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        bot_score_sql,
    )

    return bot_score_sql("events", dialect)


_FD_AUDIT = [
    ("doc_id", "lang"),
    ("md5(text)", "lang"),
    ("md5(text)", "source"),
]


def q_fd_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit on documents: does doc_id determine
    lang (it must), and do duplicate texts keep one lang / one source
    (label-consistency as an FD check)."""
    from harmonize_search_analyze_spark.operators.curation import (
        fd_violations,
    )

    return fd_violations(_t(spark, sf_dir, "documents"), _FD_AUDIT)


def _sql_fd_violations(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.curation import (
        fd_violations_sql,
    )

    return fd_violations_sql("documents", _FD_AUDIT, dialect)


def q_pareto_front(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto front over events on (value, recency): the events no
    other event beats on both — the dominance data-selection filter."""
    from harmonize_search_analyze_spark.operators.ordering import (
        pareto_front,
    )

    ev = _t(spark, sf_dir, "events")
    front = pareto_front(ev, "value", "ts")
    return front.select(
        "event_id",
        F.round("value", 6).alias("value"),
        F.unix_timestamp("ts").cast("bigint").alias("ts_s"),
    )


def _sql_pareto_front(dialect: str = "duckdb") -> str:
    if dialect == "spark":
        sec = "CAST(unix_timestamp(e.ts) AS BIGINT)"
    else:
        sec = "CAST(FLOOR(epoch(e.ts)) AS BIGINT)"
    return f"""
WITH g AS (
  SELECT value AS d1, MAX(ts) AS gmax
  FROM events
  WHERE value IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1
),
s AS (
  SELECT d1, gmax,
         MAX(gmax) OVER (
           ORDER BY d1 DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS mstrict
  FROM g
)
SELECT e.event_id, ROUND(e.value, 6) AS value, {sec} AS ts_s
FROM events e JOIN s ON e.value = s.d1
WHERE e.ts = s.gmax AND (s.mstrict IS NULL OR e.ts > s.mstrict)
"""


def q_attribution_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped (40/20/40) multi-touch attribution over the same
    click/view -> purchase windows as attribution_linear."""
    from harmonize_search_analyze_spark.operators.analytics import (
        attribution_position,
    )

    return attribution_position(
        _t(spark, sf_dir, "events"), ["click", "view"], "purchase"
    )


def _sql_attribution_position(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        attribution_position_sql,
    )

    return attribution_position_sql(
        "events", ["click", "view"], "purchase", dialect
    )


def q_join_skew_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-flight for the attribution join: per user_id the touch-side
    x purchase-side pair contribution — the key that would explode."""
    from harmonize_search_analyze_spark.operators.analytics import (
        join_skew_probe,
    )

    ev = _t(spark, sf_dir, "events")
    return join_skew_probe(
        ev.where(F.col("event_type").isin("click", "view")),
        "user_id",
        ev.where(F.col("event_type") == "purchase"),
        "user_id",
    )


def _sql_join_skew_probe(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        join_skew_probe_sql,
    )

    return join_skew_probe_sql(
        "(SELECT * FROM events WHERE event_type IN ('click', 'view'))",
        "user_id",
        "(SELECT * FROM events WHERE event_type = 'purchase')",
        "user_id",
        dialect,
    )


def q_rbo_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap between two document rankings (raw length
    vs a modular reshuffle of it) — the top-weighted retriever-A/B
    agreement gauge."""
    from harmonize_search_analyze_spark.operators.ranking import (
        rbo_overlap,
    )

    return rbo_overlap(
        _t(spark, sf_dir, "documents"), "doc_id",
        "n_chars", "n_chars % 97", k=50,
    )


def _sql_rbo_overlap(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.ranking import (
        rbo_overlap_sql,
    )

    return rbo_overlap_sql(
        "documents", "doc_id", "n_chars", "n_chars % 97", dialect, k=50
    )


def q_log_odds_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monroe weighted log-odds (informative Dirichlet prior): which
    terms characterize English documents against the rest of the
    corpus — the statistically careful significant_terms sibling."""
    from harmonize_search_analyze_spark.operators.text import (
        log_odds_terms,
    )

    return log_odds_terms(
        _t(spark, sf_dir, "documents"), "text", "lang = 'en'"
    )


def _sql_log_odds_terms(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.text import (
        log_odds_terms_sql,
    )

    return log_odds_terms_sql("documents", "text", "lang = 'en'", dialect)


def q_label_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-class embedding outliers: distance-to-own-centroid
    z-scores — the mislabel/boundary-case audit over the embeddings
    table."""
    from harmonize_search_analyze_spark.operators.similarity import (
        label_outliers,
    )

    return label_outliers(_t(spark, sf_dir, "embeddings"))


def _sql_label_outliers(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.similarity import (
        label_outliers_sql,
    )

    return label_outliers_sql("embeddings", dialect)


def q_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities on the user -> event-type bipartite graph:
    power users vs popular actions, the two centralities PageRank
    conflates (3 fixed iterations, CTE-unrollable)."""
    from harmonize_search_analyze_spark.operators.graph import (
        hits_scores,
    )

    ev = _t(spark, sf_dir, "events")
    edges = (
        ev.where(F.col("user_id").isNotNull())
        .groupBy(
            F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias(
                "src"
            ),
            F.concat(F.lit("t:"), F.col("event_type")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    return hits_scores(edges, weight_col="w")


def _sql_hits_scores(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.graph import (
        hits_scores_sql,
    )

    edges = (
        "SELECT 'u:' || CAST(user_id AS STRING) AS src,"
        " 't:' || event_type AS dst,"
        " CAST(COUNT(*) AS DOUBLE) AS w"
        " FROM events WHERE user_id IS NOT NULL"
        " GROUP BY 1, 2"
    )
    return hits_scores_sql(edges, dialect)


def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI collocations over adjacent token bigrams — the multiword-
    unit detector for vocab/tokenizer pipelines."""
    from harmonize_search_analyze_spark.operators.text import (
        pmi_collocations,
    )

    return pmi_collocations(_t(spark, sf_dir, "documents"), "text")


def _sql_pmi_collocations(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.text import (
        pmi_collocations_sql,
    )

    return pmi_collocations_sql("documents", "text", dialect)


def q_doc_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document TF-IDF keywords (smoothed idf over the WHOLE
    corpus; extraction shown for the first 20 doc ids)."""
    from harmonize_search_analyze_spark.operators.text import (
        doc_keywords,
    )

    return doc_keywords(_t(spark, sf_dir, "documents"), "doc_id", "text")


def _sql_doc_keywords(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.text import (
        doc_keywords_sql,
    )

    return doc_keywords_sql("documents", "doc_id", "text", dialect)


def q_llr_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunning log-likelihood collocations — PMI's evidence-weighted
    fix: pairs that co-occur beyond what their frequencies explain."""
    from harmonize_search_analyze_spark.operators.text import (
        llr_collocations,
    )

    return llr_collocations(_t(spark, sf_dir, "documents"), "text")


def _sql_llr_collocations(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.text import (
        llr_collocations_sql,
    )

    return llr_collocations_sql("documents", "text", dialect)


def q_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-centroid cosine/L2 matrix over the embeddings table — the
    class-confusability audit (which labels should merge)."""
    from harmonize_search_analyze_spark.operators.similarity import (
        centroid_similarity,
    )

    return centroid_similarity(_t(spark, sf_dir, "embeddings"))


def _sql_centroid_similarity(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.similarity import (
        centroid_similarity_sql,
    )

    return centroid_similarity_sql("embeddings", dialect)


def q_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mantel-Cox log-rank test: do purchasers' retention curves differ
    from non-purchasers' — the inferential companion to kaplan_meier
    (same lifetimes, same censoring)."""
    from harmonize_search_analyze_spark.operators.analytics import (
        logrank_test,
    )

    return logrank_test(
        _t(spark, sf_dir, "events"),
        F.col("event_type") == "purchase",
    )


def _sql_logrank_test(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        logrank_test_sql,
    )

    return logrank_test_sql("events", "event_type = 'purchase'", dialect)


def q_ltv_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly-cohort cumulative LTV curve — cohort_retention's revenue
    sibling (how much a week-N signup is worth by week N+k)."""
    from harmonize_search_analyze_spark.operators.analytics import (
        ltv_cohorts,
    )

    return ltv_cohorts(_t(spark, sf_dir, "events"))


def _sql_ltv_cohorts(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        ltv_cohorts_sql,
    )

    return ltv_cohorts_sql("events", dialect)


def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H across the five event types' value
    distributions — the nonparametric anova_f on the scalable
    midrank path."""
    from harmonize_search_analyze_spark.operators.analytics import (
        kruskal_wallis,
    )

    return kruskal_wallis(
        _t(spark, sf_dir, "events"), "value", "event_type"
    )


def _sql_kruskal_wallis(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.analytics import (
        kruskal_wallis_sql,
    )

    return kruskal_wallis_sql("events", "value", "event_type", dialect)


def q_chao1_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 distinct-document estimate + Good-Turing coverage from the
    duplicate-cluster profile — how many unique docs the population
    holds and how much of it the sample has seen."""
    from harmonize_search_analyze_spark.operators.dedup import (
        chao1_richness,
    )

    return chao1_richness(_t(spark, sf_dir, "documents"), "md5(text)")


def _sql_chao1_richness(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.dedup import (
        chao1_richness_sql,
    )

    return chao1_richness_sql("documents", "md5(text)", dialect)


def q_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing adjusted counts r* and smoothed probabilities over
    the corpus unigram distribution, with the r=0 unseen-mass row."""
    from harmonize_search_analyze_spark.operators.contamination import (
        good_turing,
    )

    return good_turing(_t(spark, sf_dir, "documents"), "text")


def _sql_good_turing(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.contamination import (
        good_turing_sql,
    )

    return good_turing_sql("documents", "text", dialect)


def q_intrinsic_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TwoNN intrinsic-dimension estimate over the embeddings table via
    the hash-exact IVF 2-NN path — how many degrees of freedom the
    vectors actually use. Every 25th vector anchors (sparse anchors vs
    the FULL corpus — the standard TwoNN cost lever)."""
    from harmonize_search_analyze_spark.operators.similarity import (
        intrinsic_dim,
    )

    return intrinsic_dim(
        _t(spark, sf_dir, "embeddings"),
        anchor_filter=F.col("vec_id") % 25 == 0,
    )


def _sql_intrinsic_dim(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.similarity import (
        intrinsic_dim_sql,
    )

    return intrinsic_dim_sql("embeddings", anchor_where="vec_id % 25 = 0")


def q_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV-sketch equi-join cardinality estimate (click-arm vs
    purchase-arm of events on user_id) — the System-R-style optimizer
    statistic computed from bottom-k sketches, never from the join."""
    from harmonize_search_analyze_spark.operators.aggregations import (
        join_size_estimate,
    )

    ev = _t(spark, sf_dir, "events")
    return join_size_estimate(
        ev.where(F.col("event_type") == "click"),
        ev.where(F.col("event_type") == "purchase"),
        "user_id",
    )


def _sql_join_size_estimate(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.aggregations import (
        join_size_estimate_sql,
    )

    return join_size_estimate_sql(
        "(SELECT * FROM events WHERE event_type = 'click') ta",
        "(SELECT * FROM events WHERE event_type = 'purchase') tb",
        "user_id",
        dialect,
    )


def q_embedding_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass embedding-corpus quality audit: NULL / NaN / zero-norm
    / ragged-dimension counts + norm stats over healthy vectors."""
    from harmonize_search_analyze_spark.operators.similarity import (
        embedding_health,
    )

    return embedding_health(_t(spark, sf_dir, "embeddings"))


def _sql_embedding_health(dialect: str = "duckdb") -> str:
    from harmonize_search_analyze_spark.operators.similarity import (
        embedding_health_sql,
    )

    return embedding_health_sql("embeddings", dialect)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Dict ORDER is load-bearing: the driver's correctness gate reads the
    # first 50 entries.
    #
    # STANDING VERIFICATION-WINDOW POLICY (VERDICT r9 "next round" #1 —
    # adopted as standing policy from round 10 on; also documented in
    # README.md "Verification lifecycle"):
    #   window = 3 canaries
    #          + ALL new queries added this round, at the FRONT (the
    #            r8-verdict #7 discipline: new surface ships INSIDE the
    #            live window so it is externally verified the round it
    #            ships and never enters a never-verified state)
    #          + re-verification fill: the OLDEST driver-verified queries
    #            (oldest-first by last-green round, ties by stable dict
    #            order) up to 50 total.
    # The never-verified queue closed at round 9 (all 378 then-declared
    # queries driver-verified at least once; 372 rows+schema+hash, 6
    # rows-only trainers by documented contract), so every non-canary,
    # non-new slot is now a re-check.
    #
    # ROUND-11 WINDOW (optimization round): no new queries this round, so
    # every non-canary slot goes to the optimization-rewritten set — the
    # exact discipline VERDICT r10 mandated (what's-wrong #2 / next-round
    # #2: "the window contract exists precisely so the driver re-proves
    # semantics"). Composition: 3 canaries + 10 r10 rewrites that rotated
    # out before the r10 optimizer ran (CC fusion trio + semantic_dedup,
    # ipf_weights, markov_stationary, dedup_eval, hits_scores, pagerank,
    # jaccard_brute) + 30 r11-rewritten queries (posting-list winnow,
    # windowed mutual_info/LLR, triangle/kcenter/fuzzy/graph_explore/dsir
    # checkpoints, staged lang-ID, the bucket-id + lazy-boundary rank
    # battery, one-slice metadata frames) + 7 oldest re-verification fill
    # (the 4 r2-era stragglers + the 3 oldest r3-era). Entries 51+ stay
    # in stable order; the r10-window members all went green in
    # CORRECTNESS_r10 and rotate back into the tail.
    return {
        # -- canaries (driver-green r1-r10) -----------------------------
        "profile_dict": q_profile_dict,
        "nested_terms": q_nested_terms,
        "harmonize_rollup": q_harmonize_rollup,
        # -- ROUND-11 WINDOW: driver re-proof of every optimization-
        # rewritten query (VERDICT r10 what's-wrong #2 / next-round #2).
        # r10 rewrites that missed the r10 window (CC fusion, IPF window
        # rewrite, markov cadence, pair_metrics ckpt, hits raw-agg ckpt):
        "dedup_clusters": q_dedup_clusters,
        "soft_dedup": q_soft_dedup,
        "dedup_keep_best": q_dedup_keep_best,
        "semantic_dedup": q_semantic_dedup,
        "ipf_weights": q_ipf_weights,
        "markov_stationary": q_markov_stationary,
        "dedup_eval": q_dedup_eval,
        "hits_scores": q_hits_scores,
        "pagerank": q_pagerank,
        "jaccard_brute": q_jaccard_brute,
        # r11 rewrites, first batch (posting-list winnow, windowed
        # mutual_info, triangle ckpt, staged lang-ID, pipeline ckpt,
        # k_core observe, kcenter lazy ckpt):
        "winnow_pairs": q_winnow_pairs,
        "mutual_info": q_mutual_info,
        "triangle_count": q_triangle_count,
        "confusion_eval": q_confusion_eval,
        "corpus_pipeline": q_corpus_pipeline,
        "k_core": q_k_core,
        "kcenter_select": q_kcenter_select,
        # r11 rank-statistic battery (bucket-id HOF + in-plan lazy
        # boundary sampling in ordering.py):
        "mann_whitney": q_mann_whitney,
        "roc_auc": q_roc_auc,
        "pr_curve": q_pr_curve,
        "ks_drift": q_ks_drift,
        "spearman_corr": q_spearman_corr,
        "lorenz_gini": q_lorenz_gini,
        "rfm_segments": q_rfm_segments,
        "weighted_percentile": q_weighted_percentile,
        "kruskal_wallis": q_kruskal_wallis,
        "heaps_law": q_heaps_law,
        "theil_sen": q_theil_sen,
        "pareto_front": q_pareto_front,
        # r11 rewrites, second batch (one-slice metadata frames, dsir
        # eager gram ckpt, fuzzy cands ckpt, graph_explore tok ckpt,
        # window LLR margins, lazy bounds in global_order/sampling):
        "kmeans_ivf": q_kmeans_ivf,
        "pq_search": q_pq_search,
        "pq_search_ivf": q_pq_search_ivf,
        "similarity_join_ivf": q_similarity_join_ivf,
        "dsir_sample": q_dsir_sample,
        "fuzzy_decontaminate": q_fuzzy_decontaminate,
        "graph_explore": q_graph_explore,
        "llr_collocations": q_llr_collocations,
        "negative_sampling": q_negative_sampling,
        "global_order": q_global_order,
        "epoch_shuffle": q_epoch_shuffle,
        # -- re-verification fill: oldest driver-verified (r2/r3 era) --
        "pipeline_daily": q_pipeline_daily,
        "composite_page": q_composite_page,
        "weighted_avg": q_weighted_avg,
        "mad": q_mad,
        "inference_score": q_inference_score,
        "eql_until": q_eql_until,
        "search_template": q_search_template,
        # -- window boundary (driver reads the 50 entries above) --------
        # -- remaining 332, stable order --------------------------------
        "image_near_dup": q_image_near_dup,
        "audio_near_dup": q_audio_near_dup,
        "substr_span_clusters": q_substr_span_clusters,
        "hubness_report": q_hubness_report,
        "terms_topk": q_terms_topk,
        "search_bool": q_search_bool,
        "phrase_prefix": q_phrase_prefix,
        "datetime_range": q_datetime_range,
        "geohash_grid": q_geohash_grid,
        "union_wildcard": q_union_wildcard,
        "join_revenue": q_join_revenue,
        "event_window": q_event_window,
        "dedup_exact": q_dedup_exact,
        "text_stats": q_text_stats,
        "similarity_topk": q_similarity_topk,
        "text_analysis": q_text_analysis,
        "minhash_signatures": q_minhash_signatures,
        "lsh_near_dup": q_lsh_near_dup,
        "simhash": q_simhash,
        "embedding_near_dup": q_embedding_near_dup,
        "similarity_ivf": q_similarity_ivf,
        "suggest_typeahead": q_suggest_typeahead,
        "terms_table": q_terms_table,
        "count_panel": q_count_panel,
        "describe_stats": q_describe_stats,
        "enum_values": q_enum_values,
        "vartype_guess": q_vartype_guess,
        "simhash_hamming": q_simhash_hamming,
        "sessionization": q_sessionization,
        "media_profile": q_media_profile,
        "embedding_lsh": q_embedding_lsh,
        "terms_salted": q_terms_salted,
        "corpus_curation": q_corpus_curation,
        "histogram": q_histogram,
        "date_histogram": q_date_histogram,
        "extended_stats": q_extended_stats,
        "percentiles": q_percentiles,
        "top_hits": q_top_hits,
        "cardinality": q_cardinality,
        "significant_terms": q_significant_terms,
        "asof_attribution": q_asof_attribution,
        "range_join_repeat": q_range_join_repeat,
        "hypertable_rollup": q_hypertable_rollup,
        "range_agg": q_range_agg,
        "filters_agg": q_filters_agg,
        "missing_agg": q_missing_agg,
        "event_paths": q_event_paths,
        "zipf_fit": q_zipf_fit,
        "parent_agg": q_parent_agg,
        "extended_stats_bucket": q_extended_stats_bucket,
        "moving_fn": q_moving_fn,
        "suggest_contexts": q_suggest_contexts,
        "feature_hash": q_feature_hash,
        "ingest_enrich": q_ingest_enrich,
        "anneal_schedule": q_anneal_schedule,
        "readability": q_readability,
        "mmr_rerank": q_mmr_rerank,
        "hll_cardinality": q_hll_cardinality,
        "embedding_drift": q_embedding_drift,
        "blocklist_scan": q_blocklist_scan,
        "mcnemar": q_mcnemar,
        "wilson_intervals": q_wilson_intervals,
        "effect_size": q_effect_size,
        "hhi_concentration": q_hhi_concentration,
        "theil_index": q_theil_index,
        "jackknife_ci": q_jackknife_ci,
        "hazard_rate": q_hazard_rate,
        "sprt_monitor": q_sprt_monitor,
        "vocab_coverage": q_vocab_coverage,
        "fuzzy_join": q_fuzzy_join,
        "orphan_check": q_orphan_check,
        "cluster_purity": q_cluster_purity,
        "qq_plot": q_qq_plot,
        "conversion_lag": q_conversion_lag,
        "geo_hotspots": q_geo_hotspots,
        "stl_decompose": q_stl_decompose,
        "label_outliers": q_label_outliers,
        "pmi_collocations": q_pmi_collocations,
        "centroid_similarity": q_centroid_similarity,
        "join_size_estimate": q_join_size_estimate,
        "embedding_health": q_embedding_health,
        "unigram_train": q_unigram_train,
        "compression_ratio": q_compression_ratio,
        "krippendorff_alpha": q_krippendorff_alpha,
        "neyman_allocation": q_neyman_allocation,
        "runtime_fields": q_runtime_fields,
        "fim_transform": q_fim_transform,
        "span_corruption": q_span_corruption,
        "latest_transform": q_latest_transform,
        "denoiser_mix": q_denoiser_mix,
        "rank_feature": q_rank_feature,
        "distance_feature": q_distance_feature,
        "script_filter": q_script_filter,
        "scripted_metric": q_scripted_metric,
        "pinned_search": q_pinned_search,
        "length_batching": q_length_batching,
        "pivot_summary": q_pivot_summary,
        "geo_shape": q_geo_shape,
        "script_score": q_script_score,
        "serial_diff_page": q_serial_diff,
        "bucket_stats": q_bucket_stats,
        "terms_enum": q_terms_enum,
        "shard_manifest": q_shard_manifest,
        "sparse_search": q_sparse_search,
        "counter_rate": q_counter_rate,
        "composite_datehist": q_composite_datehist,
        "step_transitions": q_step_transitions,
        "seasonal_anomalies": q_seasonal_anomalies,
        "rollup_answered": q_rollup_answered,
        "terms_by_metric": q_terms_by_metric,
        "global_agg": q_global_agg,
        "log_odds_terms": q_log_odds_terms,
        "doc_keywords": q_doc_keywords,
        "good_turing": q_good_turing,
        "chao1_richness": q_chao1_richness,
        "logrank_test": q_logrank_test,
        "ltv_cohorts": q_ltv_cohorts,
        "cramers_v": q_cramers_v,
        "fleiss_kappa": q_fleiss_kappa,
        "benjamini_hochberg": q_benjamini_hochberg,
        "attribution_linear": q_attribution_linear,
        "attribution_position": q_attribution_position,
        "bot_score": q_bot_score,
        "fd_violations": q_fd_violations,
        "join_skew_probe": q_join_skew_probe,
        "rbo_overlap": q_rbo_overlap,
        "intrinsic_dim": q_intrinsic_dim,
        "leakage_check": q_leakage_check,
        "source_overlap_matrix": q_source_overlap_matrix,
        "source_jsd_matrix": q_source_jsd_matrix,
        "entropy_rate": q_entropy_rate,
        "geoip_route": q_geoip_route,
        "jsd_divergence": q_jsd_divergence,
        "distinct_ngrams": q_distinct_ngrams,
        "cusum_change": q_cusum_change,
        "benford_test": q_benford_test,
        "calibration": q_calibration,
        "burstiness": q_burstiness,
        "trimmed_stats": q_trimmed_stats,
        "acf_series": q_acf_series,
        "quantile_norm": q_quantile_norm,
        "anova_f": q_anova_f,
        "chi2_independence": q_chi2_independence,
        "cross_source_dups": q_cross_source_dups,
        "template_prefixes": q_template_prefixes,
        "group_entropy": q_group_entropy,
        "dup_factor": q_dup_factor,
        "children_agg": q_children_agg,
        "has_child": q_has_child,
        "has_parent": q_has_parent,
        "reverse_nested": q_reverse_nested,
        "span_search": q_span_search,
        "span_not_search": q_span_not_search,
        "significant_chi2": q_significant_chi2,
        "significant_bg": q_significant_bg,
        "msearch": q_msearch,
        "explain_score": q_explain_score,
        "hard_negatives": q_hard_negatives,
        "terms_partition": q_terms_partition,
        "audio_profile": q_audio_profile,
        "geo_polygon": q_geo_polygon,
        "html_extract": q_html_extract,
        "url_normalize": q_url_normalize,
        "bucket_script": q_bucket_script,
        "ip_prefix": q_ip_prefix,
        "intra_doc_dedup": q_intra_doc_dedup,
        "bpe_train": q_bpe_train,
        "knn_classify": q_knn_classify,
        "phrase_suggest": q_phrase_suggest,
        "set_similarity_join": q_set_similarity_join,
        "record_linkage": q_record_linkage,
        "association_rules": q_association_rules,
        "kmv_overlap": q_kmv_overlap,
        "scd2_merge": q_scd2_merge,
        "moving_holtwinters": q_moving_holtwinters,
        "ols_trend": q_ols_trend,
        "psi_drift": q_psi_drift,
        "xcorr_lags": q_xcorr_lags,
        "cohens_kappa": q_cohens_kappa,
        "ngram_novelty": q_ngram_novelty,
        "k_anonymity": q_k_anonymity,
        "ltr_features": q_ltr_features,
        "embedding_covariance": q_embedding_covariance,
        "embedding_pca": q_embedding_pca,
        "kcenter_seed": q_kcenter_seed,
        "silhouette": q_silhouette,
        "prop_ztest": q_prop_ztest,
        "forecast_backtest": q_forecast_backtest,
        "containment_pairs": q_containment_pairs,
        "warc_ingest": q_warc_ingest,
        "bitext_mine": q_bitext_mine,
        "ccnet_buckets": q_ccnet_buckets,
        "hex_grid": q_hex_grid,
        "bigram_lm": q_bigram_lm,
        "percentiles_sketch": q_percentiles_sketch,
        "quality_classifier": q_quality_classifier,
        "esql_fuse": q_esql_fuse,
        "esql_ts": q_esql_ts,
        "cat_indices": q_cat_indices,
        "moving_holt": q_moving_holt,
        "search_after": q_search_after,
        "term_suggest": q_term_suggest,
        "nested_query": q_nested_query,
        "assign_split": q_assign_split,
        "rank_eval": q_rank_eval,
        "es_sql": q_es_sql,
        "es_sql_pivot": q_es_sql_pivot,
        "es_sql_unpivot": q_es_sql_unpivot,
        "lucene_search": q_lucene_search,
        "esql_fork": q_esql_fork,
        "esql_enrich": q_esql_enrich,
        "esql_functions": q_esql_functions,
        "esql_fulltext": q_esql_fulltext,
        "esql_rerank": q_esql_rerank,
        "countmin_topk": q_countmin_topk,
        "int8_topk": q_int8_topk,
        "zorder_cluster": q_zorder_cluster,
        "rp_topk": q_rp_topk,
        "hll_by": q_hll_by,
        "downsample": q_downsample,
        "skew_report": q_skew_report,
        "significant_mi": q_significant_mi,
        "percentiles_sketch_by": q_percentiles_sketch_by,
        "moving_ewma": q_moving_ewma,
        "script_profile": q_script_profile,
        "chat_render": q_chat_render,
        "corpus_diff": q_corpus_diff,
        "preference_pairs": q_preference_pairs,
        "decay_score": q_decay_score,
        "terms_approx": q_terms_approx,
        "collapse_inner": q_collapse_inner,
        "retriever_rrf": q_retriever_rrf,
        "bbq_topk": q_bbq_topk,
        "maxsim": q_maxsim,
        "analyze_chain": q_analyze_chain,
        "ingest_pipeline": q_ingest_pipeline,
        "grok_parse": q_grok_parse,
        "eql_sequence": q_eql_sequence,
        "eql_join": q_eql_join,
        "kaplan_meier": q_kaplan_meier,
        "domain_reweight": q_domain_reweight,
        "tokenizer_fertility": q_tokenizer_fertility,
        "multilingual_pipeline": q_multilingual_pipeline,
        "cluster_cap_sample": q_cluster_cap_sample,
        "field_caps": q_field_caps,
        "rescore_topk": q_rescore_topk,
        "knn_filtered": q_knn_filtered,
        "intervals_search": q_intervals_search,
        "geo_line": q_geo_line,
        "kql_search": q_kql_search,
        "esql_stats": q_esql_stats,
        "esql_inlinestats": q_esql_inlinestats,
        "change_point": q_change_point,
        "kmeans_assign": q_kmeans_assign,
        "bpe_pair_counts": q_bpe_pair_counts,
        "rare_terms": q_rare_terms,
        "adjacency_matrix": q_adjacency_matrix,
        "geo_distance": q_geo_distance,
        "geo_bounds_centroid": q_geo_bounds_centroid,
        "auto_date_histogram": q_auto_date_histogram,
        "percentile_ranks": q_percentile_ranks,
        "boxplot": q_boxplot,
        "string_stats": q_string_stats,
        "t_test": q_t_test,
        "date_range": q_date_range,
        "top_metrics": q_top_metrics,
        "rate_agg": q_rate_agg,
        "geotile_grid": q_geotile_grid,
        "ip_range": q_ip_range,
        "substring_dedup": q_substring_dedup,
        "temperature_mix": q_temperature_mix,
        "cumulative_cardinality": q_cumulative_cardinality,
        "moving_percentiles": q_moving_percentiles,
        "multi_terms": q_multi_terms,
        "terms_set": q_terms_set,
        "function_score": q_function_score,
        "compound_search": q_compound_search,
        "incremental_dedup": q_incremental_dedup,
        "quality_mix": q_quality_mix,
        "token_budget_sample": q_token_budget_sample,
        "percentiles_bucket": q_percentiles_bucket,
        "bucket_correlation": q_bucket_correlation,
        "mrl_topk": q_mrl_topk,
        "lsh_incremental": q_lsh_incremental,
        "geo_search": q_geo_search,
        "simple_query": q_simple_query,
        "random_sampler": q_random_sampler,
        "diversified_terms": q_diversified_terms,
        "term_vectors": q_term_vectors,
        "highlight_multi": q_highlight_multi,
        "bloom_dedup": q_bloom_dedup,
        "unimax": q_unimax,
        "unigram_seed": q_unigram_seed,
        "simhash_banded": q_simhash_banded,
        "line_dedup": q_line_dedup,
        "funnel": q_funnel,
        "cohort_retention": q_cohort_retention,
        "weighted_sample": q_weighted_sample,
        "percolate": q_percolate,
        "similarity_join": q_similarity_join,
        "hybrid_search": q_hybrid_search,
        "bm25_search": q_bm25_search,
        "significant_text": q_significant_text,
        "datemath_window": q_datemath_window,
        "pipeline_serial": q_pipeline_serial,
        "hash_sample": q_hash_sample,
        "stratified_sample": q_stratified_sample,
        "pack_documents": q_pack_documents,
        "corpus_clean": q_corpus_clean,
        "repetition_signals": q_repetition_signals,
        "normalize_pipeline": q_normalize_pipeline,
        "pii_scan": q_pii_scan,
        "decontaminate": q_decontaminate,
        "lm_score": q_lm_score,
        "quantized_topk": q_quantized_topk,
        "chunk_documents": q_chunk_documents,
        "search_advanced": q_search_advanced,
        "date_histogram_gaps": q_date_histogram_gaps,
        "rate_anomalies": q_rate_anomalies,
        "frequent_item_sets": q_frequent_item_sets,
        "corpus_profile": q_corpus_profile,
        "collapse": q_collapse,
        "multi_match": q_multi_match,
        "upsample": q_upsample,
        "mix_sources": q_mix_sources,
        "vocab_build": q_vocab_build,
        "ngram_counts": q_ngram_counts,
        "more_like_this": q_more_like_this,
        "highlight": q_highlight,
        "matrix_stats": q_matrix_stats,
        "variable_width_histogram": q_variable_width_histogram,
        "categorize_text": q_categorize_text,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "terms_topk": SQL_TERMS_TOPK,
        "search_bool": SQL_SEARCH_BOOL,
        "phrase_prefix": _sql_phrase_prefix(),
        "datetime_range": SQL_DATETIME_RANGE,
        "nested_terms": SQL_NESTED_TERMS,
        "geohash_grid": _sql_geohash_grid(),
        "profile_dict": data_dict_oracle_sql(
            "lineitem", _LINEITEM_NUMERIC, _LINEITEM_OTHER
        ),
        "union_wildcard": SQL_UNION_WILDCARD,
        "join_revenue": SQL_JOIN_REVENUE,
        "event_window": SQL_EVENT_WINDOW,
        "dedup_exact": SQL_DEDUP_EXACT,
        "text_stats": SQL_TEXT_STATS,
        "similarity_topk": _sql_similarity_topk(),
        "harmonize_rollup": SQL_HARMONIZE_ROLLUP,
        "text_analysis": _sql_text_analysis(),
        "minhash_signatures": _sql_minhash_signatures(),
        "lsh_near_dup": _sql_lsh_near_dup(),
        "simhash": _sql_simhash(),
        "embedding_near_dup": SQL_EMBEDDING_NEAR_DUP,
        "similarity_ivf": _sql_similarity_ivf(),
        "suggest_typeahead": _sql_suggest_typeahead(),
        "terms_table": SQL_TERMS_TABLE,
        "count_panel": SQL_COUNT_PANEL,
        "describe_stats": SQL_DESCRIBE_STATS,
        "enum_values": SQL_ENUM_VALUES,
        "vartype_guess": vartype_guess_oracle_sql(
            "lineitem", _LINEITEM_NUMERIC, ["l_returnflag", "l_linestatus"]
        ),
        "simhash_hamming": _sql_simhash_hamming(),
        "jaccard_brute": _sql_jaccard_brute(),
        "sessionization": SQL_SESSIONIZATION,
        "media_profile": SQL_MEDIA_PROFILE,
        "embedding_lsh": _sql_embedding_lsh(),
        "terms_salted": SQL_TERMS_SALTED,
        "corpus_curation": _sql_corpus_curation(),
        "histogram": SQL_HISTOGRAM,
        "date_histogram": SQL_DATE_HISTOGRAM,
        "extended_stats": SQL_EXTENDED_STATS,
        "percentiles": SQL_PERCENTILES,
        "top_hits": SQL_TOP_HITS,
        "cardinality": SQL_CARDINALITY,
        "significant_terms": SQL_SIGNIFICANT_TERMS,
        "asof_attribution": SQL_ASOF_ATTRIBUTION,
        "range_join_repeat": SQL_RANGE_JOIN_REPEAT,
        "hypertable_rollup": SQL_HYPERTABLE_ROLLUP,
        "range_agg": SQL_RANGE_AGG,
        "filters_agg": SQL_FILTERS_AGG,
        "missing_agg": SQL_MISSING_AGG,
        "pipeline_daily": SQL_PIPELINE_DAILY,
        "composite_page": SQL_COMPOSITE_PAGE,
        "weighted_avg": SQL_WEIGHTED_AVG,
        "mad": SQL_MAD,
        "association_rules": SQL_ASSOCIATION_RULES,
        "triangle_count": _sql_triangle_count(),
        "kmv_overlap": _sql_kmv_overlap(),
        "record_linkage": _sql_record_linkage(),
        "moving_holtwinters": _sql_moving_holtwinters(),
        "scd2_merge": _sql_scd2_merge(),
        "ltr_features": _sql_ltr_features(),
        "k_anonymity": _sql_k_anonymity(),
        "embedding_covariance": _sql_embedding_covariance(),
        # embedding_pca: rows-only by design (driver-side eig) — its
        # covariance input is the oracle-pinned step, mirroring the
        # kmeans_ivf / kmeans_assign trainer pairing
        "containment_pairs": _sql_containment_pairs(),
        "k_core": _sql_k_core(),
        "psi_drift": _sql_psi_drift(),
        "ols_trend": _sql_ols_trend(),
        "xcorr_lags": _sql_xcorr_lags(),
        "cohens_kappa": _sql_cohens_kappa(),
        "set_similarity_join": _sql_set_similarity_join(),
        "kcenter_seed": _sql_kcenter_seed(),
        # kcenter_select: rows-only (driver-iterative greedy) — its
        # seed step is the oracle-pinned twin, trainer pattern
        "silhouette": _sql_silhouette(),
        # compression_ratio: rows-only — zlib has no oracle-engine twin;
        # determinism + monotonicity pinned by unit tests
        "prop_ztest": _sql_prop_ztest(),
        "negative_sampling": _sql_negative_sampling(),
        "mutual_info": _sql_mutual_info(),
        "ngram_novelty": _sql_ngram_novelty(),
        "winnow_pairs": _sql_winnow_pairs(),
        "forecast_backtest": _sql_forecast_backtest(),
        "cusum_change": _sql_cusum_change(),
        "benford_test": _sql_benford_test(),
        "jsd_divergence": _sql_jsd_divergence(),
        "distinct_ngrams": _sql_distinct_ngrams(),
        "leakage_check": _sql_leakage_check(),
        "mann_whitney": _sql_mann_whitney(),
        "calibration": _sql_calibration(),
        "burstiness": _sql_burstiness(),
        "quantile_norm": _sql_quantile_norm(),
        "source_jsd_matrix": _sql_source_jsd_matrix(),
        "trimmed_stats": _sql_trimmed_stats(),
        "acf_series": _sql_acf_series(),
        "embedding_drift": _sql_embedding_drift(),
        "heaps_law": _sql_heaps_law(),
        "entropy_rate": _sql_entropy_rate(),
        "confusion_eval": _sql_confusion_eval(),
        "roc_auc": _sql_roc_auc(),
        "anova_f": _sql_anova_f(),
        "spearman_corr": _sql_spearman_corr(),
        "cross_source_dups": _sql_cross_source_dups(),
        "template_prefixes": _sql_template_prefixes(),
        "source_overlap_matrix": _sql_source_overlap_matrix(),
        "markov_stationary": _sql_markov_stationary(),
        "blocklist_scan": _sql_blocklist_scan(),
        "group_entropy": _sql_group_entropy(),
        "dup_factor": _sql_dup_factor(),
        "mcnemar": _sql_mcnemar(),
        "wilson_intervals": _sql_wilson_intervals(),
        "effect_size": _sql_effect_size(),
        "hhi_concentration": _sql_hhi_concentration(),
        "theil_index": _sql_theil_index(),
        "jackknife_ci": _sql_jackknife_ci(),
        "hazard_rate": _sql_hazard_rate(),
        "sprt_monitor": _sql_sprt_monitor(),
        "vocab_coverage": _sql_vocab_coverage(),
        "fuzzy_join": _sql_fuzzy_join(),
        "orphan_check": _sql_orphan_check(),
        "cluster_purity": _sql_cluster_purity(),
        "qq_plot": _sql_qq_plot(),
        "conversion_lag": _sql_conversion_lag(),
        "geo_hotspots": _sql_geo_hotspots(),
        "weighted_percentile": _sql_weighted_percentile(),
        "ipf_weights": _sql_ipf_weights(),
        "stl_decompose": _sql_stl_decompose(),
        "lorenz_gini": _sql_lorenz_gini(),
        "theil_sen": _sql_theil_sen(),
        "cramers_v": _sql_cramers_v(),
        "fleiss_kappa": _sql_fleiss_kappa(),
        "krippendorff_alpha": _sql_krippendorff_alpha(),
        "neyman_allocation": _sql_neyman_allocation(),
        "benjamini_hochberg": _sql_benjamini_hochberg(),
        "attribution_linear": _sql_attribution_linear(),
        "bot_score": _sql_bot_score(),
        "fd_violations": _sql_fd_violations(),
        "pareto_front": _sql_pareto_front(),
        "attribution_position": _sql_attribution_position(),
        "join_skew_probe": _sql_join_skew_probe(),
        "rbo_overlap": _sql_rbo_overlap(),
        "log_odds_terms": _sql_log_odds_terms(),
        "label_outliers": _sql_label_outliers(),
        "hits_scores": _sql_hits_scores(),
        "pmi_collocations": _sql_pmi_collocations(),
        "doc_keywords": _sql_doc_keywords(),
        "llr_collocations": _sql_llr_collocations(),
        "centroid_similarity": _sql_centroid_similarity(),
        "logrank_test": _sql_logrank_test(),
        "ltv_cohorts": _sql_ltv_cohorts(),
        "kruskal_wallis": _sql_kruskal_wallis(),
        "chao1_richness": _sql_chao1_richness(),
        "good_turing": _sql_good_turing(),
        "intrinsic_dim": _sql_intrinsic_dim(),
        "join_size_estimate": _sql_join_size_estimate(),
        "embedding_health": _sql_embedding_health(),
        "rare_terms": SQL_RARE_TERMS,
        "adjacency_matrix": SQL_ADJACENCY_MATRIX,
        "bm25_search": _sql_bm25_search(),
        "significant_text": _sql_significant_text(),
        "geo_distance": _sql_geo_distance(),
        "geo_bounds_centroid": _sql_geo_bounds_centroid(),
        "simhash_banded": _sql_simhash_banded(),
        "datemath_window": SQL_DATEMATH_WINDOW,
        "auto_date_histogram": _sql_auto_date_histogram(),
        "pipeline_serial": SQL_PIPELINE_SERIAL,
        "hash_sample": _sql_hash_sample(),
        "stratified_sample": _sql_stratified_sample(),
        "pack_documents": _sql_pack_documents(),
        "similarity_join": _sql_similarity_join(),
        "corpus_clean": _sql_corpus_clean(),
        "repetition_signals": _sql_repetition_signals(),
        "percentile_ranks": SQL_PERCENTILE_RANKS,
        "boxplot": SQL_BOXPLOT,
        "string_stats": SQL_STRING_STATS,
        "t_test": SQL_T_TEST,
        "normalize_pipeline": SQL_NORMALIZE,
        "pii_scan": _sql_pii_scan(),
        "dedup_clusters": _sql_dedup_clusters(),
        "hybrid_search": _sql_hybrid_search(),
        "similarity_join_ivf": _sql_similarity_join_ivf(),
        "date_range": SQL_DATE_RANGE,
        "top_metrics": SQL_TOP_METRICS,
        "rate_agg": SQL_RATE_AGG,
        "decontaminate": _sql_decontaminate(),
        "lm_score": _sql_lm_score(),
        "quantized_topk": _sql_quantized_topk(),
        "chunk_documents": _sql_chunk_documents(),
        "geotile_grid": _sql_geotile_grid(),
        "search_advanced": SQL_SEARCH_ADVANCED,
        "line_dedup": _sql_line_dedup(),
        "substring_dedup": _sql_substring_dedup(),
        "substr_span_clusters": _sql_substr_span_clusters(),
        "image_near_dup": _sql_image_near_dup(),
        "audio_near_dup": _sql_audio_near_dup(),
        "hubness_report": _sql_hubness_report(),
        "temperature_mix": _sql_temperature_mix(),
        "pq_search": _sql_pq_search(),
        "percolate": SQL_PERCOLATE,
        "pq_search_ivf": _sql_pq_search_ivf(),
        "geo_line": SQL_GEO_LINE,
        "funnel": _sql_funnel(),
        "date_histogram_gaps": SQL_DATE_HISTOGRAM_GAPS,
        "semantic_dedup": _sql_semantic_dedup(),
        "weighted_sample": _sql_weighted_sample(),
        "cohort_retention": _sql_cohort_retention(),
        "rate_anomalies": _sql_rate_anomalies(),
        "frequent_item_sets": SQL_FREQUENT_ITEM_SETS,
        "corpus_profile": _sql_corpus_profile(),
        "collapse": SQL_COLLAPSE,
        "multi_match": _sql_multi_match(),
        "upsample": _sql_upsample(),
        "mix_sources": _sql_mix_sources(),
        "vocab_build": _sql_vocab_build(),
        "ngram_counts": _sql_ngram_counts(),
        "more_like_this": _sql_more_like_this(),
        "highlight": _sql_highlight(),
        "matrix_stats": _sql_matrix_stats(),
        "variable_width_histogram": SQL_VARIABLE_WIDTH_HISTOGRAM,
        "ip_range": _sql_ip_range(),
        "categorize_text": _sql_categorize_text(),
        "cumulative_cardinality": SQL_CUMULATIVE_CARDINALITY,
        "change_point": SQL_CHANGE_POINT,
        "moving_percentiles": SQL_MOVING_PERCENTILES,
        "multi_terms": SQL_MULTI_TERMS,
        "terms_set": _sql_terms_set(),
        "function_score": _sql_function_score(),
        "compound_search": SQL_COMPOUND_SEARCH,
        "incremental_dedup": SQL_INCREMENTAL_DEDUP,
        "fuzzy_decontaminate": _sql_fuzzy_decontaminate(),
        "quality_mix": _sql_quality_mix(),
        "token_budget_sample": _sql_token_budget_sample(),
        "percentiles_bucket": SQL_PERCENTILES_BUCKET,
        "bucket_correlation": SQL_BUCKET_CORRELATION,
        "mrl_topk": _sql_mrl_topk(),
        "lsh_incremental": _sql_lsh_incremental(),
        "geo_search": _sql_geo_search(),
        "dsir_sample": _sql_dsir_sample(),
        "simple_query": _sql_simple_query(),
        "random_sampler": _sql_random_sampler(),
        "diversified_terms": _sql_diversified_terms(),
        "rescore_topk": _sql_rescore_topk(),
        "search_after": _sql_search_after(),
        "bloom_dedup": _sql_bloom_dedup(),
        "knn_filtered": _sql_knn_filtered(),
        "intervals_search": _sql_intervals_search(),
        "unimax": _sql_unimax(),
        "term_suggest": _sql_term_suggest(),
        "phrase_suggest": _sql_phrase_suggest(),
        "nested_query": _sql_nested_query(),
        "global_order": _sql_global_order(),
        "assign_split": _sql_assign_split(),
        "rank_eval": _sql_rank_eval(),
        "hard_negatives": _sql_hard_negatives(),
        "terms_partition": _sql_terms_partition(),
        "audio_profile": _sql_audio_profile(),
        "geo_polygon": _sql_geo_polygon(),
        "dedup_eval": _sql_dedup_eval(),
        "html_extract": _sql_html_extract(),
        "url_normalize": _sql_url_normalize(),
        "ccnet_buckets": _sql_ccnet_buckets(),
        "bucket_script": _sql_bucket_script(),
        "ip_prefix": _sql_ip_prefix(),
        "quality_classifier": _sql_quality_classifier(),
        "hex_grid": _sql_hex_grid(),
        "intra_doc_dedup": _sql_intra_doc_dedup(),
        "runtime_fields": _sql_runtime_fields(),
        "fim_transform": _sql_fim_transform(),
        "span_corruption": _sql_span_corruption(),
        "latest_transform": _sql_latest_transform(),
        "eql_sequence": _sql_eql_sequence(),
        "denoiser_mix": _sql_denoiser_mix(),
        "knn_classify": _sql_knn_classify(),
        "span_search": _sql_span_search(),
        "rank_feature": _sql_rank_feature(),
        "distance_feature": _sql_distance_feature(),
        "has_child": SQL_HAS_CHILD,
        "has_parent": SQL_HAS_PARENT,
        "reverse_nested": SQL_REVERSE_NESTED,
        "script_filter": SQL_SCRIPT_FILTER,
        "scripted_metric": SQL_SCRIPTED_METRIC,
        "pinned_search": SQL_PINNED_SEARCH,
        "length_batching": _sql_length_batching(),
        "dedup_keep_best": _sql_dedup_keep_best(),
        "epoch_shuffle": _sql_epoch_shuffle(),
        "significant_chi2": SQL_SIGNIFICANT_CHI2,
        "pivot_summary": SQL_PIVOT_SUMMARY,
        "term_vectors": _sql_term_vectors(),
        "soft_dedup": _sql_soft_dedup(),
        "geo_shape": _sql_geo_shape(),
        "script_score": SQL_SCRIPT_SCORE,
        "serial_diff_page": SQL_SERIAL_DIFF,
        "bucket_stats": SQL_BUCKET_STATS,
        "analyze_chain": _sql_analyze_chain(),
        "ingest_pipeline": SQL_INGEST_PIPELINE,
        "grok_parse": _sql_grok_parse(),
        "bbq_topk": _sql_bbq_topk(),
        "bigram_lm": _sql_bigram_lm(),
        "explain_score": _sql_explain_score(),
        "msearch": SQL_MSEARCH,
        "retriever_rrf": _sql_retriever_rrf(),
        "pr_curve": _sql_pr_curve(),
        "terms_enum": SQL_TERMS_ENUM,
        "shard_manifest": _sql_shard_manifest(),
        "sparse_search": _sql_sparse_search(),
        "significant_bg": SQL_SIGNIFICANT_BG,
        "corpus_pipeline": _sql_corpus_pipeline(),
        "counter_rate": SQL_COUNTER_RATE,
        "composite_datehist": SQL_COMPOSITE_DATEHIST,
        "children_agg": SQL_CHILDREN_AGG,
        "step_transitions": SQL_STEP_TRANSITIONS,
        "seasonal_anomalies": SQL_SEASONAL_ANOMALIES,
        "ks_drift": SQL_KS_DRIFT,
        "chi2_independence": SQL_CHI2_INDEPENDENCE,
        # the rewrite must equal the RAW daily answer — that is the gate
        "rollup_answered": SQL_DATE_HISTOGRAM,
        "terms_by_metric": SQL_TERMS_BY_METRIC,
        "span_not_search": _sql_span_not_search(),
        "highlight_multi": _sql_highlight_multi(),
        "global_agg": SQL_GLOBAL_AGG,
        "kql_search": SQL_KQL_SEARCH,
        "inference_score": SQL_INFERENCE_SCORE,
        "esql_stats": SQL_ESQL_STATS,
        "esql_inlinestats": SQL_ESQL_INLINESTATS,
        "kmeans_assign": SQL_KMEANS_ASSIGN,
        "bpe_pair_counts": SQL_BPE_PAIR_COUNTS,
        "unigram_seed": SQL_UNIGRAM_SEED,
        "eql_until": _sql_eql_until(),
        "search_template": SQL_SEARCH_TEMPLATE,
        "rfm_segments": _sql_rfm_segments(),
        "event_paths": SQL_EVENT_PATHS,
        "zipf_fit": _sql_zipf_fit(),
        "parent_agg": SQL_PARENT_AGG,
        "extended_stats_bucket": SQL_EXTENDED_STATS_BUCKET,
        "es_sql": SQL_ES_SQL,
        "moving_fn": SQL_MOVING_FN,
        "suggest_contexts": SQL_SUGGEST_CONTEXTS,
        "feature_hash": _sql_feature_hash(),
        "maxsim": SQL_MAXSIM,
        "ingest_enrich": SQL_INGEST_ENRICH,
        "anneal_schedule": _sql_anneal_schedule(),
        "kaplan_meier": _sql_kaplan_meier(),
        "eql_join": _sql_eql_join(),
        "geoip_route": _sql_geoip_route(),
        "lucene_search": SQL_LUCENE_SEARCH,
        "esql_fulltext": SQL_ESQL_FULLTEXT,
        "readability": _sql_readability(),
        "mmr_rerank": _sql_mmr_rerank(),
        "percentiles_sketch": _sql_percentiles_sketch(),
        "hll_cardinality": _sql_hll_cardinality(),
        "domain_reweight": _sql_domain_reweight(),
        "countmin_topk": _sql_countmin_topk(),
        "graph_explore": _sql_graph_explore(),
        "int8_topk": _sql_int8_topk(),
        "zorder_cluster": _sql_zorder_cluster(),
        "rp_topk": _sql_rp_topk(),
        "hll_by": _sql_hll_by(),
        "pagerank": _sql_pagerank(),
        "esql_rerank": _sql_esql_rerank(),
        "downsample": _sql_downsample(),
        "skew_report": _sql_skew_report(),
        "significant_mi": SQL_SIGNIFICANT_MI,
        "percentiles_sketch_by": _sql_percentiles_sketch_by(),
        "moving_ewma": SQL_MOVING_EWMA,
        "moving_holt": _sql_moving_holt(),
        "warc_ingest": _sql_warc_ingest(),
        "esql_fuse": SQL_ESQL_FUSE,
        "esql_ts": SQL_ESQL_TS,
        "bitext_mine": _sql_bitext_mine(),
        "cat_indices": SQL_CAT_INDICES,
        "script_profile": _sql_script_profile(),
        "chat_render": _sql_chat_render(),
        "es_sql_pivot": SQL_ES_SQL_PIVOT,
        "corpus_diff": _sql_corpus_diff(),
        "preference_pairs": _sql_preference_pairs(),
        "es_sql_unpivot": SQL_ES_SQL_UNPIVOT,
        "decay_score": _sql_decay_score(),
        "tokenizer_fertility": _sql_tokenizer_fertility(),
        "multilingual_pipeline": _sql_multilingual_pipeline(),
        "collapse_inner": SQL_COLLAPSE_INNER,
        "terms_approx": _sql_terms_approx(),
        "esql_enrich": SQL_ESQL_ENRICH,
        "esql_fork": SQL_ESQL_FORK,
        "esql_functions": SQL_ESQL_FUNCTIONS,
        "cluster_cap_sample": _sql_cluster_cap_sample(),
        "field_caps": SQL_FIELD_CAPS,
    }
