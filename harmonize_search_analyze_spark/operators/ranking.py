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

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from harmonize_search_analyze_spark.operators.text import tokens_sql
from harmonize_search_analyze_spark.sources.tables import local_frame

K1 = 1.2
B = 0.75


def _terms_list_sql(terms: list[str]) -> str:
    for t in terms:
        if not t.isalnum():
            raise ValueError(f"query terms must be alnum tokens: {t!r}")
    return ", ".join(f"'{t.lower()}'" for t in terms)


# BM25's score decomposes as idf(t) * tf_norm(t, doc); BOTH the ranking
# (bm25_search_sql) and the _explain breakdown (explain_score_sql) are
# generated from these single definitions + _bm25_ctes, so an explain can
# never drift from the ranking it explains.
_BM25_IDF = "LN(1.0 + (stats.n_docs - dfreq.dft + 0.5) / (dfreq.dft + 0.5))"
_BM25_TF_NORM = (
    f"(tf.tf * ({K1} + 1.0))"
    f" / (tf.tf + {K1} * (1.0 - {B} + {B} * tf.dl / stats.avgdl))"
)


def _bm25_ctes(
    table: str, id_col: str, text_col: str, terms: list[str], dialect: str
) -> str:
    """The shared WITH-prefix of every BM25-family query: tokenized docs
    (d), corpus stats, per-doc term frequencies (tf), doc frequencies
    (dfreq)."""
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
)"""


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
    ctes = _bm25_ctes(table, id_col, text_col, terms, dialect)
    return f"""{ctes}
SELECT tf.doc_id,
       ROUND(SUM(({_BM25_IDF}) * ({_BM25_TF_NORM})), 6) AS score
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


def more_like_this_sql(
    table: str,
    id_col: str,
    text_col: str,
    query_id: int,
    dialect: str,
    *,
    max_query_terms: int = 25,
    min_should_pct: float = 0.3,
    k: int = 10,
) -> str:
    """ES ``more_like_this`` (deterministic variant, dual-dialect): find the
    documents most similar to one example document.

    ES's MLT picks the example's ``max_query_terms`` highest tf-idf terms,
    builds a bool-should query from them with a 30% minimum_should_match,
    and ranks by Lucene score. Mirrored exactly, with the pinned tokenizer
    and the BM25 idf this engine already uses:

    1. the example doc's terms get ``tf * idf`` interestingness scores
       (idf = ln(1 + (N - df + 0.5) / (df + 0.5)), rounded 6 for tie-safe
       cross-engine ordering; ties to term ASC);
    2. top ``max_query_terms`` survive;
    3. candidate docs must share >= ceil(pct * n_selected) of them
       (per-doc DISTINCT token match, like ES's per-field term match);
    4. ranked by the summed idf of matched terms (rounded 6), ties to id.

    Scale shape: ONE distinct-token explode of the corpus (the only row
    expansion), one hash agg for doc frequencies restricted to the example's
    terms (the filter broadcast — the example has at most a few thousand
    distinct tokens), the selected-term list is ≤ max_query_terms rows and
    broadcasts into the candidate join; final top-k is TakeOrdered."""
    toks = tokens_sql(text_col, dialect)
    if dialect == "spark":
        corpus_unnest = (
            f"SELECT {id_col} AS doc_id, explode(array_distinct({toks})) AS t "
            f"FROM {table} WHERE {text_col} IS NOT NULL"
        )
        query_unnest = (
            f"SELECT explode({toks}) AS t FROM {table} "
            f"WHERE {id_col} = {query_id}"
        )
    else:
        corpus_unnest = (
            f"SELECT {id_col} AS doc_id, unnest(list_distinct({toks})) AS t "
            f"FROM {table} WHERE {text_col} IS NOT NULL"
        )
        query_unnest = (
            f"SELECT unnest({toks}) AS t FROM {table} "
            f"WHERE {id_col} = {query_id}"
        )
    return f"""
WITH tok AS ({corpus_unnest}),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tok),
qtf AS (
  SELECT t, COUNT(*) AS tf FROM ({query_unnest}) q GROUP BY t
),
dfreq AS (
  SELECT tok.t, COUNT(*) AS dft FROM tok
  JOIN qtf ON tok.t = qtf.t
  GROUP BY tok.t
),
sel AS (
  SELECT qtf.t,
         ROUND(LN(1.0 + (n.n_docs - dfreq.dft + 0.5) / (dfreq.dft + 0.5)),
               6) AS idf,
         ROUND(qtf.tf * LN(1.0 + (n.n_docs - dfreq.dft + 0.5)
                           / (dfreq.dft + 0.5)), 6) AS interest
  FROM qtf JOIN dfreq ON qtf.t = dfreq.t CROSS JOIN n
  ORDER BY interest DESC, qtf.t ASC
  LIMIT {max_query_terms}
),
nsel AS (SELECT COUNT(*) AS n_sel FROM sel),
cand AS (
  SELECT tok.doc_id, COUNT(*) AS matches, ROUND(SUM(sel.idf), 6) AS score
  FROM tok JOIN sel ON tok.t = sel.t
  WHERE tok.doc_id != {query_id}
  GROUP BY tok.doc_id
)
SELECT doc_id, CAST(matches AS BIGINT) AS matches, score
FROM cand CROSS JOIN nsel
WHERE matches >= CEIL({min_should_pct} * n_sel)
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def more_like_this(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_id: int,
    *,
    max_query_terms: int = 25,
    min_should_pct: float = 0.3,
    k: int = 10,
) -> DataFrame:
    """Run more_like_this over a DataFrame (temp-view + spark-dialect SQL,
    same execution pattern as bm25_search)."""
    spark: SparkSession = df.sparkSession
    view = f"__mlt_corpus_{uuid.uuid4().hex}"
    df.createOrReplaceTempView(view)
    out = spark.sql(
        more_like_this_sql(
            view, id_col, text_col, query_id, "spark",
            max_query_terms=max_query_terms,
            min_should_pct=min_should_pct, k=k,
        )
    )
    spark.catalog.dropTempView(view)
    return out


# -- function_score ------------------------------------------------------------

_FVF_MODIFIERS = ("none", "log1p", "ln1p", "sqrt", "square", "reciprocal")


def field_value_factor_sql(
    expr: str,
    *,
    modifier: str = "log1p",
    factor: float = 1.0,
    weight: float = 1.0,
    missing: float = 1.0,
) -> str:
    """ES ``function_score`` / ``field_value_factor`` score expression as
    dialect-neutral ANSI SQL (identical text runs on Spark and DuckDB —
    LOG10/LN/SQRT are IEEE-identical on identical inputs, and the input is
    an exact integer-derived double, so cross-engine parity is exact after
    the shared ROUND).

    Follows ES's evaluation order: ``modifier(factor * value)`` with the
    ``missing`` substitute for NULL fields, times the function ``weight``.
    ``log1p`` is base-10 per ES's (surprising, documented) definition;
    ``ln1p`` is the natural-log variant.

    Out-of-domain inputs (log of a non-positive, sqrt of a negative,
    reciprocal of zero) are guarded to NULL in the generated text itself:
    the engines genuinely disagree otherwise — Spark returns NULL/NaN,
    DuckDB raises Out of Range, and Spark's ANSI mode throws on the
    reciprocal's divide-by-zero. ES raises a script error for these; a
    NULL score (hit excluded from the ranking) is the relational
    equivalent."""
    if modifier not in _FVF_MODIFIERS:
        raise ValueError(f"modifier must be one of {_FVF_MODIFIERS}")
    v = f"(COALESCE(CAST({expr} AS DOUBLE), {float(missing)!r}) * {float(factor)!r})"
    if modifier == "log1p":
        m = f"(CASE WHEN {v} > -1.0 THEN LOG10(1.0 + {v}) END)"
    elif modifier == "ln1p":
        m = f"(CASE WHEN {v} > -1.0 THEN LN(1.0 + {v}) END)"
    elif modifier == "sqrt":
        m = f"(CASE WHEN {v} >= 0.0 THEN SQRT({v}) END)"
    elif modifier == "square":
        m = f"({v} * {v})"
    elif modifier == "reciprocal":
        m = f"(CASE WHEN {v} <> 0.0 THEN 1.0 / {v} END)"
    else:
        m = v
    return f"ROUND({float(weight)!r} * {m}, 6)"


def function_score(
    df: DataFrame,
    predicate,
    field: str,
    *,
    modifier: str = "log1p",
    factor: float = 1.0,
    weight: float = 1.0,
    missing: float = 1.0,
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES ``function_score`` query with a ``field_value_factor`` function:
    filter by the (constant-score) query, score each hit as
    ``weight * modifier(factor * field)``, return the top-k.

    boost_mode=multiply over a filter-context base score of 1.0 — the exact
    shape Kibana issues for "boost by recency/popularity field" panels.
    Scale shape: the score is one codegen'd projection over the filtered
    scan (predicate pushdown applies); top-k is sort+limit
    (TakeOrderedAndProject), never a full sort. Ties pinned score DESC,
    id ASC on both engines."""
    score = F.expr(
        field_value_factor_sql(
            field, modifier=modifier, factor=factor, weight=weight, missing=missing
        )
    )
    return (
        df.where(predicate)
        .select(F.col(id_col), F.col(field), score.alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def rescore(
    hits: DataFrame,
    score_col: str,
    rescore_col: Column | str,
    *,
    window_size: int = 50,
    query_weight: float = 1.0,
    rescore_query_weight: float = 1.0,
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES search ``rescore``: re-rank only the top ``window_size`` hits of
    the primary query with a (typically more expensive) secondary score,
    ``final = query_weight * score + rescore_query_weight * rescore``
    (score_mode=total, the ES default).

    ``rescore_col`` is a Column expression evaluated ONLY on the window
    survivors — the cascade contract that makes expensive features
    affordable: the corpus-sized stage stays cheap, the expensive
    expression touches ``window_size`` rows no matter the corpus size.

    Returns ``(id, score, rescore, final_score DOUBLE rounded 6)``, top-k
    by final (ties id ASC, pinned). ``id_col`` must uniquely identify
    hits — rescoring a multi-index union requires disambiguating ids
    first (duplicate ids would multiply through the shortlist join). Plan shape: two
    TakeOrderedAndProject stages (primary top-window, then top-k of the
    rescored window) — same cascade pattern as ``mrl_topk``; no global
    sort at either level.
    """
    if window_size <= 0 or k <= 0:
        raise ValueError("window_size and k must be positive")
    rc = F.expr(rescore_col) if isinstance(rescore_col, str) else rescore_col
    # shortlist carries ONLY (id, sort-by) columns so the logical plan
    # stays Limit(Sort(Project)) — the exact pattern Spark's SpecialLimits
    # strategy turns into TakeOrderedAndProject. Projecting the rescore
    # expression on top of the limit instead re-plans it as a GLOBAL
    # range-partitioned sort (measured; the mrl_topk shortlist-join shape
    # avoids it), so the expensive column is computed after a join back.
    # .distinct(): id_col must uniquely identify hits (documented
    # precondition); if an upstream union repeats an id, deduping the
    # shortlist prevents the join back from going cartesian per key
    window_ids = (
        hits.select(F.col(id_col), F.col(score_col))
        .orderBy(F.desc(score_col), F.asc(id_col))
        .limit(window_size)
        .select(id_col)
        .distinct()
    )
    window = hits.join(F.broadcast(window_ids), id_col).withColumn(
        "__rescore", rc.cast("double")
    )
    final = (
        F.lit(float(query_weight)) * F.col(score_col).cast("double")
        + F.lit(float(rescore_query_weight)) * F.col("__rescore")
    )
    return (
        window.withColumn("final_score", final)
        .select(
            id_col,
            F.round(F.col(score_col).cast("double"), 6).alias("score"),
            F.round("__rescore", 6).alias("rescore"),
            F.round("final_score", 6).alias("final_score"),
        )
        .orderBy(F.desc("final_score"), F.asc(id_col))
        .limit(k)
    )


def search_after(
    df: DataFrame,
    sort_col: str,
    after: tuple | None,
    *,
    id_col: str = "doc_id",
    size: int = 10,
    ascending: bool = False,
) -> DataFrame:
    """ES ``search_after`` keyset pagination: resume a sorted result list
    from cursor ``after = (sort_value, id_value)`` — the last row of the
    previous page — instead of a numeric offset.

    The cursor compiles to a SARGABLE strict-inequality filter
    (``sort < after_sort OR (sort = after_sort AND id > after_id)`` for
    descending), so deep pages cost the same as page one: the filter
    pushes to the scan and the page is a TakeOrderedAndProject — unlike
    OFFSET pagination, which materializes and discards every earlier row
    and is why ES caps ``from`` at 10k. ``id_col`` must be unique: it is
    the tiebreaker that makes the sort total and pages non-overlapping
    (ES's "include a tiebreak field" requirement).

    ``after=None`` returns the first page. NULL sort values are pinned
    NULLS LAST in both directions (ES ``missing: _last``), and a cursor
    whose sort value is NULL (``after = (None, id)``) resumes inside the
    NULL tail — rows with missing sort keys paginate instead of becoming
    silently unreachable (plain ``s < after_sort`` is NULL for them).
    """
    if size <= 0:
        raise ValueError(f"size must be positive, got {size}")
    s, i = F.col(sort_col), F.col(id_col)
    order = (
        [s.asc_nulls_last(), i.asc()]
        if ascending
        else [s.desc_nulls_last(), i.asc()]
    )
    out = df
    if after is not None:
        after_sort, after_id = after
        if after_sort is None:
            # cursor already in the NULL tail: only later NULL-sort rows remain
            out = out.where(s.isNull() & (i > F.lit(after_id)))
        else:
            beyond = (
                s > F.lit(after_sort) if ascending else s < F.lit(after_sort)
            )
            out = out.where(
                beyond
                | ((s == F.lit(after_sort)) & (i > F.lit(after_id)))
                | s.isNull()  # the NULL tail sorts after every non-null page
            )
    return out.orderBy(*order).limit(size)



def scroll_pages(
    df: DataFrame,
    sort_col: str,
    *,
    id_col: str = "doc_id",
    size: int = 1000,
    ascending: bool = True,
    max_pages: int | None = None,
):
    """ES ``scroll`` / point-in-time paged export: iterate the ENTIRE
    sorted result set as a generator of row pages.

    PIT semantics come free: a batch DataFrame is an immutable snapshot
    of its source files at plan time, so every page reads the same data a
    PIT-pinned scroll would — no keep-alive, no segment refcounting.
    Each page is a :func:`search_after` keyset fetch (sargable cursor
    filter + TakeOrderedAndProject), so page N costs the same as page 1
    and there is no ES-style 10k depth wall.

    Scale note (100 TB): a scroll is by definition a CLIENT-side export —
    rows leave the cluster one page at a time, exactly like ES's scroll
    API, which is why this is a driver-side generator around per-page
    ``collect()``. Bulk cluster-side export should never scroll: use
    ``df.write`` (one distributed job) and let the sink parallelize.
    This exists for API parity with consumers that stream pages.
    """
    if size <= 0:
        raise ValueError(f"size must be positive, got {size}")
    after = None
    pages = 0
    while max_pages is None or pages < max_pages:
        rows = search_after(
            df, sort_col, after, id_col=id_col, size=size,
            ascending=ascending,
        ).collect()
        if not rows:
            return
        yield rows
        pages += 1
        if len(rows) < size:
            return
        last = rows[-1]
        after = (last[sort_col], last[id_col])


def _suggest_candidates(vocab, qdf, prefix_len: int, max_edits: int):
    """Shared candidate generation for both suggesters: prefix as an
    explicit EQUI-join key — a combined on-clause plans as a
    BroadcastNestedLoopJoin running levenshtein over |V| x |tokens| pairs
    (measured 20x super-linear at mult=10); hash-joining on the prefix
    first leaves edit distance only same-prefix pairs. The 3-arg
    levenshtein early-exits above the bound (returns -1; the oracle's
    2-arg form computes the same value within bound). Adds a ``distance``
    INT column; all qdf columns pass through."""
    return (
        vocab.withColumn("__pfx", F.substring("term", 1, prefix_len))
        .join(
            F.broadcast(
                qdf.withColumn("__pfx", F.substring("token", 1, prefix_len))
            ),
            "__pfx",
        )
        .drop("__pfx")
        .withColumn(
            "distance",
            F.expr(f"levenshtein(term, token, {max_edits})").cast("int"),
        )
        .where(F.col("distance") >= 0)
    )


def term_suggest(
    df: DataFrame,
    field: str,
    text: str,
    *,
    max_edits: int = 2,
    k: int = 3,
    min_freq: int = 1,
    prefix_len: int = 1,
    suggest_mode: str = "missing",
) -> DataFrame:
    """ES ``suggest`` term suggester: spell-correct each analyzed token of
    ``text`` against the corpus vocabulary of ``field``.

    Candidates are vocabulary terms within ``max_edits`` Levenshtein
    distance sharing the first ``prefix_len`` characters (ES's own
    candidate-pruning default), with corpus frequency >= ``min_freq``.
    PINNED DIVERGENCE: the metric is CLASSIC Levenshtein (the built-in
    both engines share) — a transposition costs 2 edits, where ES's
    Damerau variant costs 1; "hte" therefore needs max_edits=2 to reach
    "the". Candidates are
    ranked per input token by (distance ASC, frequency DESC, term ASC) —
    ES's order with the tie pinned. ``suggest_mode='missing'`` (the ES
    default) suppresses suggestions for tokens already in the vocabulary;
    ``'always'`` suggests regardless.

    Returns ``(token, suggestion, distance INT, freq BIGINT)``.

    Scale shape: ONE hash agg builds the vocabulary (|V| rows, map-side
    combined — corpus size only affects the scan); the query tokens are a
    literal handful broadcast against it, the Levenshtein filter runs
    vocabulary-parallel, and the per-token top-k is a window over
    candidate survivors. The corpus text itself never re-shuffles.
    """
    import re as _re2

    if max_edits not in (1, 2):
        raise ValueError(f"max_edits must be 1 or 2 (ES contract), got {max_edits}")
    if suggest_mode not in ("missing", "always"):
        raise ValueError(f"unknown suggest_mode: {suggest_mode!r}")
    qtokens = [t for t in _re2.split(r"[^a-zA-Z0-9]+", text.lower()) if t]
    if not qtokens:
        raise ValueError("text yields no tokens")
    spark = df.sparkSession
    vocab = (
        df.select(F.explode(F.expr(tokens_sql(field, "spark"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .where(F.col("freq") >= min_freq)
    )
    qdf = local_frame(spark, [(t,) for t in dict.fromkeys(qtokens)], ["token"])
    cands = _suggest_candidates(vocab, qdf, prefix_len, max_edits).select(
        "token",
        F.col("term").alias("suggestion"),
        "distance",
        "freq",
    )
    if suggest_mode == "missing":
        known = cands.where(F.col("distance") == 0).select("token").distinct()
        cands = cands.join(known, "token", "left_anti")
    else:
        cands = cands.where(F.col("distance") > 0)
    w = Window.partitionBy("token").orderBy(
        F.asc("distance"), F.desc("freq"), F.asc("suggestion")
    )
    return (
        cands.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
        .orderBy("token", "distance", F.desc("freq"), "suggestion")
    )


def term_suggest_sql(
    table: str,
    field: str,
    text: str,
    dialect: str,
    *,
    max_edits: int = 2,
    k: int = 3,
    min_freq: int = 1,
    prefix_len: int = 1,
    suggest_mode: str = "missing",
) -> str:
    """Dual-dialect twin of :func:`term_suggest`."""
    import re as _re2

    qtokens = [t for t in _re2.split(r"[^a-zA-Z0-9]+", text.lower()) if t]
    qtokens = list(dict.fromkeys(qtokens))
    toks = tokens_sql(field, dialect)
    vals = ", ".join(f"('{t}')" for t in qtokens)
    if dialect == "spark":
        expl = f"SELECT explode({toks}) AS term FROM {table}"
    else:
        expl = f"SELECT UNNEST({toks}) AS term FROM {table}"
    missing_filter = (
        "WHERE token NOT IN (SELECT token FROM cands WHERE distance = 0)"
        if suggest_mode == "missing"
        else "WHERE distance > 0"
    )
    return f"""
WITH vocab AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS freq FROM ({expl}) e
  GROUP BY term HAVING COUNT(*) >= {min_freq}
),
q(token) AS (VALUES {vals}),
cands AS (
  SELECT q.token, v.term AS suggestion,
         CAST(levenshtein(v.term, q.token) AS INT) AS distance, v.freq
  FROM vocab v JOIN q
    ON SUBSTRING(v.term, 1, {prefix_len}) = SUBSTRING(q.token, 1, {prefix_len})
   AND levenshtein(v.term, q.token) <= {max_edits}
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY token ORDER BY distance ASC, freq DESC, suggestion ASC
  ) AS rn
  FROM cands {missing_filter}
)
SELECT token, suggestion, distance, freq FROM ranked WHERE rn <= {k}
ORDER BY token, distance, freq DESC, suggestion
"""


def phrase_suggest(
    df: DataFrame,
    field: str,
    text: str,
    *,
    max_edits: int = 2,
    candidates_per_term: int = 5,
    k: int = 3,
    prefix_len: int = 1,
    alpha: float = 0.5,
) -> DataFrame:
    """ES ``suggest`` phrase suggester: whole-phrase correction ranked by
    a corpus language model, not per-token frequency alone — "johnny
    walker" should beat "johnny walken" even if "walken" is a valid term.

    The published shape ES implements (Lucene's ``PhraseSuggester`` with
    a Laplace-smoothed bigram model): per input position, generate up to
    ``candidates_per_term`` vocabulary candidates (the term-suggester
    rule: shared ``prefix_len`` prefix, Levenshtein <= ``max_edits``,
    ranked distance/freq) PLUS the original token itself — in-vocabulary
    or not, so an uncorrectable position degrades to the typed token
    instead of emptying the combination frame; form every combination
    across positions; score
    each phrase by ``sum_i log P(w_i | w_{i-1})`` with add-``alpha``
    smoothing over the corpus bigram table; return the top ``k`` phrases
    (ties pinned by phrase ASC). The input phrase itself is excluded.

    Phrase length is capped at 3 tokens (like the intervals rule): the
    combination space is candidates_per_term^len, and ES itself beams.

    Scale shape: vocabulary and bigram tables are each ONE hash agg over
    the corpus (map-side combined; |V| and |bigrams| rows). Candidate
    generation joins the metadata-sized query-token frame against vocab;
    the cross-combination frame is <= 125 rows; bigram probabilities
    attach by broadcast-able joins. The corpus is scanned twice (unigram
    + bigram pass), never shuffled at row volume.

    Integer determinism: scores sum ``log``s of exact count ratios and
    round to 6 only at the end — the combination frame is tiny, so both
    engines fold in the same order; ties are phrase-pinned anyway.

    Returns ``(phrase, score DOUBLE rounded 6)``.
    """
    import re as _re2

    if not 1 <= candidates_per_term <= 10:
        raise ValueError(
            f"candidates_per_term must be in [1, 10], got {candidates_per_term}"
        )
    if alpha <= 0:
        raise ValueError(f"alpha must be positive, got {alpha}")
    qtokens = [t for t in _re2.split(r"[^a-zA-Z0-9]+", text.lower()) if t]
    if not 2 <= len(qtokens) <= 3:
        raise ValueError(
            f"phrase_suggest corrects 2-3 token phrases, got {len(qtokens)}"
        )
    spark = df.sparkSession
    toks = tokens_sql(field, "spark")
    # NOTE (round-10 optimization pass): persisting vocab/bigrams here was
    # tried and MEASURED SLOWER at sf0.1 (2.3 s -> 3.1-4.0 s): a cached
    # subplan compiles without AQE partition coalescing
    # (canChangeCachedPlanOutputPartitioning=false, and =true measured
    # 4-5x slower still), so every consumer pays 32-partition scans that
    # outweigh the saved re-tokenization. At 100 TB the persist becomes
    # right again — vocabulary-sized frames, corpus-sized re-scans.
    vocab = (
        df.select(F.explode(F.expr(toks)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    bigrams = (
        df.select(
            F.explode(
                F.expr(
                    f"zip_with({toks}, slice({toks}, 2, "
                    f"greatest(size({toks}) - 1, 0)), "
                    "(a, b) -> concat(a, ' ', b))"
                )
            ).alias("bg")
        )
        .where(F.col("bg").isNotNull())
        .groupBy("bg")
        .agg(F.count(F.lit(1)).cast("bigint").alias("bfreq"))
    )
    qdf = local_frame(
        spark, [(i, t) for i, t in enumerate(qtokens)], ["pos", "token"]
    )
    w = Window.partitionBy("pos").orderBy(
        F.asc("distance"), F.desc("freq"), F.asc("cand")
    )
    cands = (
        _suggest_candidates(vocab, qdf, prefix_len, max_edits)
        .select("pos", F.col("term").alias("cand"), "distance", "freq")
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= candidates_per_term)
        .drop("__rn", "distance", "freq")
    )
    # every position also keeps its ORIGINAL token (in-vocabulary or
    # not): ES's graceful degradation — an uncorrectable position
    # contributes the typed token instead of emptying the whole
    # combination frame (cross join with an empty side -> no output)
    parts = [
        cands.where(F.col("pos") == i)
        .select(F.col("cand").alias(f"w{i}"))
        .union(
            local_frame(spark, [(qtokens[i],)], [f"w{i}"])
        )
        .distinct()
        for i in range(len(qtokens))
    ]
    combos = parts[0]
    for p in parts[1:]:
        combos = combos.crossJoin(p)
    n_terms = len(qtokens)
    v_size = vocab.select(F.count(F.lit(1)).alias("v")).withColumn(
        "__one", F.lit(1)
    )
    combos = combos.withColumn("__one", F.lit(1)).join(
        F.broadcast(v_size), "__one"
    )
    a = float(alpha)
    score = F.lit(0.0)
    for i in range(1, n_terms):
        prev, cur = f"w{i - 1}", f"w{i}"
        bg = bigrams.select(
            F.col("bg").alias(f"__bg{i}"), F.col("bfreq").alias(f"__bf{i}")
        )
        un = vocab.select(
            F.col("term").alias(f"__ut{i}"), F.col("freq").alias(f"__uf{i}")
        )
        combos = (
            combos.join(
                F.broadcast(bg),
                F.concat_ws(" ", F.col(prev), F.col(cur)) == F.col(f"__bg{i}"),
                "left",
            )
            .join(F.broadcast(un), F.col(prev) == F.col(f"__ut{i}"), "left")
        )
        score = score + F.log(
            (F.coalesce(F.col(f"__bf{i}"), F.lit(0)) + F.lit(a))
            / (F.coalesce(F.col(f"__uf{i}"), F.lit(0)) + F.lit(a) * F.col("v"))
        )
    phrase = F.concat_ws(" ", *[F.col(f"w{i}") for i in range(n_terms)])
    return (
        combos.select(phrase.alias("phrase"), F.round(score, 6).alias("score"))
        .where(F.col("phrase") != " ".join(qtokens))
        .orderBy(F.desc("score"), F.asc("phrase"))
        .limit(k)
    )


def phrase_suggest_sql(
    table: str,
    field: str,
    text: str,
    dialect: str,
    *,
    max_edits: int = 2,
    candidates_per_term: int = 5,
    k: int = 3,
    prefix_len: int = 1,
    alpha: float = 0.5,
) -> str:
    """Dual-dialect twin of :func:`phrase_suggest` — same candidate rule,
    bigram table, add-alpha scoring, and tie pinning on both engines."""
    import re as _re2

    from harmonize_search_analyze_spark.operators.text import ngrams_sql

    qtokens = [t for t in _re2.split(r"[^a-zA-Z0-9]+", text.lower()) if t]
    if not 2 <= len(qtokens) <= 3:
        raise ValueError(
            f"phrase_suggest corrects 2-3 token phrases, got {len(qtokens)}"
        )
    n = len(qtokens)
    toks = tokens_sql(field, dialect)
    bigr = ngrams_sql(field, dialect, 2)
    if dialect == "spark":
        expl_t = f"SELECT explode({toks}) AS term FROM {table}"
        expl_b = f"SELECT explode({bigr}) AS bg FROM {table}"
        concat = lambda a, b: f"concat({a}, ' ', {b})"  # noqa: E731
    else:
        expl_t = f"SELECT UNNEST({toks}) AS term FROM {table}"
        expl_b = f"SELECT UNNEST({bigr}) AS bg FROM {table}"
        concat = lambda a, b: f"({a} || ' ' || {b})"  # noqa: E731
    vals = ", ".join(f"({i}, '{t}')" for i, t in enumerate(qtokens))
    c_parts = "\n".join(
        f"c{i} AS (SELECT cand AS w{i} FROM cands WHERE pos = {i} "
        f"AND rn <= {candidates_per_term} "
        f"UNION SELECT '{qtokens[i]}'),"
        for i in range(n)
    )
    cross = " CROSS JOIN ".join(f"c{i}" for i in range(n))
    joins, terms = [], []
    for i in range(1, n):
        joins.append(
            f"LEFT JOIN bigrams b{i} ON {concat(f'w{i - 1}', f'w{i}')} = b{i}.bg"
        )
        joins.append(f"LEFT JOIN vocab u{i} ON w{i - 1} = u{i}.term")
        terms.append(
            f"LN((COALESCE(b{i}.bfreq, 0) + {alpha!r}) / "
            f"(COALESCE(u{i}.freq, 0) + {alpha!r} * v.v))"
        )
    phrase = concat("w0", "w1") if n == 2 else concat(concat("w0", "w1"), "w2")
    return f"""
WITH vocab AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS freq FROM ({expl_t}) e GROUP BY term
),
bigrams AS (
  SELECT bg, CAST(COUNT(*) AS BIGINT) AS bfreq FROM ({expl_b}) e GROUP BY bg
),
q(pos, token) AS (VALUES {vals}),
cands AS (
  SELECT q.pos, vb.term AS cand,
         ROW_NUMBER() OVER (
           PARTITION BY q.pos
           ORDER BY levenshtein(vb.term, q.token) ASC, vb.freq DESC,
                    vb.term ASC
         ) AS rn
  FROM vocab vb JOIN q
    ON SUBSTRING(vb.term, 1, {prefix_len}) = SUBSTRING(q.token, 1, {prefix_len})
   AND levenshtein(vb.term, q.token) <= {max_edits}
),
{c_parts}
v AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM vocab)
SELECT {phrase} AS phrase,
       ROUND({" + ".join(terms)}, 6) AS score
FROM {cross} CROSS JOIN v
{chr(10).join(joins)}
WHERE {phrase} <> '{" ".join(qtokens)}'
ORDER BY score DESC, phrase ASC
LIMIT {k}
"""


def rank_eval(
    results: DataFrame,
    ratings: DataFrame,
    *,
    k: int = 10,
    relevant_threshold: int = 1,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rating_col: str = "rating",
) -> DataFrame:
    """ES ``_rank_eval`` API: score ranked retrieval lists against graded
    relevance judgments. Per query: ``precision_k`` (relevant retrieved /
    retrieved-in-top-k, ES's precision definition), ``recall_k``
    (relevant retrieved / all relevant), ``mrr`` (1 / first relevant
    rank, 0 when none), and ``ndcg_k`` with the exponential gain ES uses
    (``(2^rating - 1) / log2(rank + 1)``, ideal DCG from the query's own
    ratings sorted descending; 0 when IDCG is 0).

    ``results`` carries (query, doc, 1-based rank); ``ratings`` carries
    (query, doc, integer rating); unjudged retrieved docs count as
    rating 0 (ES default). Returns one row per query with all four
    metrics rounded to 6, ordered by query.

    Scale shape: one broadcast-able join of top-k results to ratings +
    two hash aggs keyed by query (the ideal-DCG side aggregates the
    ratings table per query) — evaluation cost tracks |results| + |ratings|,
    never a corpus.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    q, d, r = F.col(query_col), F.col(doc_col), F.col(rank_col)
    topk = results.where(r <= k).select(
        q.alias("__q"), d.alias("__d"), r.alias("__rank")
    )
    rated = ratings.select(
        F.col(query_col).alias("__q"),
        F.col(doc_col).alias("__d"),
        F.col(rating_col).cast("int").alias("__rating"),
    )
    joined = topk.join(rated, ["__q", "__d"], "left").withColumn(
        "__rating", F.coalesce("__rating", F.lit(0))
    )
    rel = F.col("__rating") >= relevant_threshold
    per_q = joined.groupBy("__q").agg(
        F.count(F.lit(1)).alias("__retrieved"),
        F.sum(rel.cast("int")).alias("__rel_ret"),
        F.min(F.when(rel, F.col("__rank"))).alias("__first_rel"),
        F.sum(
            (F.pow(F.lit(2.0), F.col("__rating")) - 1)
            / F.log2(F.col("__rank") + 1)
        ).alias("__dcg"),
    )
    w = Window.partitionBy("__q").orderBy(
        F.desc("__rating"), F.asc("__d")
    )
    ideal = (
        rated.withColumn("__irank", F.row_number().over(w))
        .where(F.col("__irank") <= k)
        .groupBy("__q")
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col("__rating")) - 1)
                / F.log2(F.col("__irank") + 1)
            ).alias("__idcg"),
        )
    )
    totals = rated.groupBy("__q").agg(
        F.sum(
            (F.col("__rating") >= relevant_threshold).cast("int")
        ).alias("__n_rel")
    )
    return (
        per_q.join(ideal, "__q", "left")
        .join(totals, "__q", "left")
        .select(
            F.col("__q").alias(query_col),
            F.round(F.col("__rel_ret") / F.col("__retrieved"), 6).alias(
                "precision_k"
            ),
            F.round(
                F.when(
                    F.coalesce("__n_rel", F.lit(0)) > 0,
                    F.col("__rel_ret") / F.col("__n_rel"),
                ).otherwise(0.0),
                6,
            ).alias("recall_k"),
            F.round(
                F.coalesce(1.0 / F.col("__first_rel"), F.lit(0.0)), 6
            ).alias("mrr"),
            F.round(
                F.when(
                    F.coalesce("__idcg", F.lit(0.0)) > 0,
                    F.col("__dcg") / F.col("__idcg"),
                ).otherwise(0.0),
                6,
            ).alias("ndcg_k"),
        )
        .orderBy(query_col)
    )


_RANK_FEATURE_FUNCTIONS = ("saturation", "log", "sigmoid")


def rank_feature_sql(
    expr: str,
    *,
    function: str = "saturation",
    pivot: float | None = None,
    scaling_factor: float | None = None,
    exponent: float | None = None,
    boost: float = 1.0,
) -> str:
    """ES ``rank_feature`` query score as dialect-neutral ANSI SQL
    (identical text on Spark and DuckDB — pure IEEE arithmetic on a
    shared ROUND'd input).

    ES formulas (rank_feature query docs, boost multiplied in):

    - ``saturation``: ``v / (v + pivot)`` — pivot REQUIRED here (ES's
      implicit default is an index-statistics estimate we don't model);
    - ``log``: ``ln(scaling_factor + v)``;
    - ``sigmoid``: ``v^exp / (v^exp + pivot^exp)``.

    rank_feature fields are positive by construction in ES; negative or
    NULL inputs score NULL (hit drops from the ranking) — guarded in the
    generated text because the engines disagree on e.g. ``pow`` of a
    negative base with fractional exponent (NaN vs error)."""
    if function not in _RANK_FEATURE_FUNCTIONS:
        raise ValueError(
            f"function must be one of {_RANK_FEATURE_FUNCTIONS}"
        )
    v = f"CAST({expr} AS DOUBLE)"
    if function == "saturation":
        if pivot is None or pivot <= 0:
            raise ValueError("saturation requires a positive pivot")
        s = f"({v} / ({v} + {float(pivot)!r}))"
    elif function == "log":
        sf = 1.0 if scaling_factor is None else float(scaling_factor)
        s = f"(CASE WHEN {sf!r} + {v} > 0.0 THEN LN({sf!r} + {v}) END)"
    else:  # sigmoid
        if pivot is None or pivot <= 0:
            raise ValueError("sigmoid requires a positive pivot")
        e = 1.0 if exponent is None else float(exponent)
        s = (
            f"(POW({v}, {e!r}) / "
            f"(POW({v}, {e!r}) + {float(pivot) ** e!r}))"
        )
    return (
        f"ROUND(CASE WHEN {v} >= 0.0 THEN {float(boost)!r} * {s} END, 6)"
    )


def rank_feature(
    df: DataFrame,
    field: str,
    *,
    function: str = "saturation",
    pivot: float | None = None,
    scaling_factor: float | None = None,
    exponent: float | None = None,
    boost: float = 1.0,
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES ``rank_feature`` query: rank documents by a static feature
    field through a saturation/log/sigmoid transfer curve — the standard
    "boost by pagerank / url_length / popularity" shape.

    Scale shape: the score is one codegen'd projection over the scan
    (pushdown applies — only ``id_col`` and ``field`` are read), top-k is
    sort+limit (TakeOrderedAndProject), never a full sort. Ties pinned
    score DESC, id ASC on both engines."""
    score = F.expr(
        rank_feature_sql(
            field,
            function=function,
            pivot=pivot,
            scaling_factor=scaling_factor,
            exponent=exponent,
            boost=boost,
        )
    )
    return (
        df.select(F.col(id_col), F.col(field), score.alias("score"))
        .where(F.col("score").isNotNull())
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def distance_feature_sql(
    dist_expr: str, *, pivot: float, boost: float = 1.0
) -> str:
    """ES ``distance_feature`` query score over a precomputed
    non-negative distance expression: ``boost * pivot / (pivot +
    distance)`` (the exact published formula for date, geo and numeric
    origins alike — only the distance metric differs). Dialect-neutral
    text; compose with ``abs(field - origin)`` for numerics/dates or
    :func:`~harmonize_search_analyze_spark.operators.aggregations.haversine_sql`
    for geo points. NULL distance scores NULL."""
    if pivot <= 0:
        raise ValueError(f"pivot must be positive, got {pivot}")
    d = f"CAST({dist_expr} AS DOUBLE)"
    return (
        f"ROUND({float(boost)!r} * {float(pivot)!r} / "
        f"({float(pivot)!r} + {d}), 6)"
    )


def distance_feature(
    df: DataFrame,
    dist: Column | str,
    *,
    pivot: float,
    boost: float = 1.0,
    k: int = 10,
    id_col: str = "doc_id",
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """ES ``distance_feature`` query: rank by proximity to an origin —
    recency boosts (date origin), geo proximity, numeric closeness.
    ``dist`` is the distance column/SQL-expression (non-negative);
    score = ``boost * pivot / (pivot + dist)``.

    Scale shape: one codegen'd projection + TakeOrderedAndProject; the
    distance never leaves the row, so there is no shuffle before the
    top-k reduction. Ties pinned score DESC, id ASC."""
    if pivot <= 0:
        raise ValueError(f"pivot must be positive, got {pivot}")
    d = F.expr(dist) if isinstance(dist, str) else dist
    score = F.round(
        F.lit(float(boost)) * F.lit(float(pivot))
        / (F.lit(float(pivot)) + d.cast("double")),
        6,
    )
    cols = [F.col(id_col)] + [F.col(c) for c in (extra_cols or [])]
    return (
        df.select(*cols, score.alias("score"))
        .where(F.col("score").isNotNull())
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def pinned_query(
    df: DataFrame,
    ids: list,
    organic_pred: Column,
    *,
    id_col: str = "doc_id",
    sort_col: str | None = None,
    ascending: bool = False,
    k: int = 10,
) -> DataFrame:
    """ES ``pinned`` query: the listed ids rank first, IN LIST ORDER,
    above every organic hit; organic hits follow under their own order.
    A pinned doc appears even if it fails the organic query (the ES
    contract), and never duplicates.

    Plan: the pin rank is one codegen'd CASE over the id column — no join
    against an ids table (the list is query-sized); the filter is
    ``pin_rank < n OR organic`` so predicate pushdown still applies to
    the organic side; top-k is TakeOrderedAndProject. Ties among organic
    hits pinned by (sort, id)."""
    if not ids:
        raise ValueError("pinned query needs at least one id")
    rank = F.lit(len(ids))
    for i in reversed(range(len(ids))):
        rank = F.when(F.col(id_col) == F.lit(ids[i]), F.lit(i)).otherwise(
            rank
        )
    organic_order = (
        []
        if sort_col is None
        else [F.asc(sort_col) if ascending else F.desc(sort_col)]
    )
    return (
        df.withColumn("__pin", rank)
        .where((F.col("__pin") < len(ids)) | organic_pred)
        .orderBy(F.asc("__pin"), *organic_order, F.asc(id_col))
        .drop("__pin")
        .limit(k)
    )


def script_score(
    df: DataFrame,
    query_pred: Column,
    script: str,
    *,
    min_score: float | None = None,
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """ES ``script_score`` query: filter by the inner query, score each
    hit with an arbitrary expression (the painless body under the same
    restricted painless->SQL contract as the ``script`` query and
    ``runtime_mappings``), optionally drop hits under ``min_score``, and
    return the top-k.

    ES contract details kept: a script_score score must not be negative
    — negative scores raise there; here they (and NULL scores) drop from
    the ranking, the relational equivalent used across this module's
    score guards. Plan: one codegen'd projection over the filtered scan
    (the inner query's sargable parts still push down) +
    TakeOrderedAndProject. Ties pinned score DESC, id ASC."""
    score = F.round(F.expr(script).cast("double"), 6)
    out = (
        df.where(query_pred)
        .select(F.col(id_col), score.alias("score"))
        .where(F.col("score").isNotNull() & (F.col("score") >= 0.0))
    )
    if min_score is not None:
        out = out.where(F.col("score") >= float(min_score))
    return out.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def explain_score_sql(
    table: str,
    id_col: str,
    text_col: str,
    terms: list[str],
    doc_id_value: int,
    dialect: str,
) -> str:
    """ES ``_explain`` API for the BM25 ranking: the per-term score
    breakdown for ONE document — term frequency, corpus doc-freq, idf,
    the tf saturation factor, and each term's contribution (their product;
    the document's _score is the sum, exactly bm25_search's formula with
    the same K1/B).

    ES returns a nested explanation tree; the relational shape is one row
    per matched query term, ``ORDER BY term``. Corpus statistics (n_docs,
    avgdl, doc_freq) are computed over the WHOLE corpus while the tf rows
    collapse to the explained document — the CTE pipeline and the
    idf/tf_norm formulas are the SAME strings bm25_search_sql is built
    from (_bm25_ctes/_BM25_IDF/_BM25_TF_NORM), so an explain cannot
    drift from the ranking it explains. Cost: one corpus scan + the
    |terms|-row join, regardless of corpus size (the doc filter lands
    before the final join)."""
    ctes = _bm25_ctes(table, id_col, text_col, terms, dialect)
    return f"""{ctes}
SELECT tf.t AS term,
       CAST(tf.tf AS BIGINT) AS tf,
       CAST(dfreq.dft AS BIGINT) AS doc_freq,
       CAST(tf.dl AS BIGINT) AS doc_len,
       ROUND({_BM25_IDF}, 6) AS idf,
       ROUND({_BM25_TF_NORM}, 6) AS tf_norm,
       ROUND(({_BM25_IDF}) * ({_BM25_TF_NORM}), 6) AS contribution
FROM tf
JOIN dfreq ON tf.t = dfreq.t
CROSS JOIN stats
WHERE tf.doc_id = {int(doc_id_value)}
ORDER BY term
"""


def explain_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    doc_id_value: int,
) -> DataFrame:
    """Run the _explain breakdown over a DataFrame (spark dialect of
    explain_score_sql via a uniquely-named temp view)."""
    spark: SparkSession = df.sparkSession
    view = f"__explain_corpus_{uuid.uuid4().hex}"
    df.createOrReplaceTempView(view)
    out = spark.sql(
        explain_score_sql(view, id_col, text_col, terms, doc_id_value, "spark")
    )
    spark.catalog.dropTempView(view)
    return out


def sparse_vector_sql(
    table: str,
    id_col: str,
    text_col: str,
    query_weights: dict[str, float],
    dialect: str,
    k: int = 10,
) -> str:
    """ES ``sparse_vector`` query (the ELSER/SPLADE learned-sparse
    retrieval shape): rank documents by the dot product of a sparse
    term->weight QUERY vector against sparse DOCUMENT term weights.

    Without a learned model in the engine, document-side weights use the
    standard sublinear tf (``1 + ln(tf)``) — the public lexical form of
    the same dot-product scoring; a model-produced doc-weight table
    plugs into the identical join+sum plan. Query weights arrive as a
    VALUES relation (vocabulary-sized, broadcast), so the token explode
    is pre-filtered to query terms with a sargable IN list — the scan
    never materializes non-query tokens past the filter.

    Pinned: tokens by the engine tokenizer; score DESC, id ASC; ROUND 6.
    """
    for t in query_weights:
        if not t.isalnum():
            raise ValueError(f"query terms must be alnum tokens: {t!r}")
    if not query_weights:
        raise ValueError("query_weights must be non-empty")
    folded = {t.lower() for t in query_weights}
    if len(folded) != len(query_weights):
        # two case-variants would BOTH join each tf row, silently summing
        # their weights — reject rather than inflate
        raise ValueError(
            "query_weights terms collide after lowercasing; "
            "provide one weight per folded term"
        )
    toks = tokens_sql(text_col, dialect)
    tlist = ", ".join(f"'{t.lower()}'" for t in query_weights)
    vals = ", ".join(
        f"('{t.lower()}', CAST({float(w)!r} AS DOUBLE))"
        for t, w in sorted(query_weights.items())
    )
    if dialect == "spark":
        unnest = (
            f"SELECT {id_col} AS doc_id, explode({toks}) AS t"
            f" FROM {table} WHERE {text_col} IS NOT NULL"
        )
    else:
        unnest = (
            f"SELECT {id_col} AS doc_id, unnest({toks}) AS t"
            f" FROM {table} WHERE {text_col} IS NOT NULL"
        )
    return f"""
WITH tf AS (
  SELECT doc_id, t, COUNT(*) AS tf
  FROM ({unnest}) x
  WHERE t IN ({tlist})
  GROUP BY doc_id, t
),
q(t, w) AS (VALUES {vals})
SELECT tf.doc_id,
       ROUND(SUM(q.w * (1.0 + LN(tf.tf))), 6) AS score
FROM tf JOIN q ON tf.t = q.t
GROUP BY tf.doc_id
ORDER BY score DESC, tf.doc_id ASC
LIMIT {k}
"""


def sparse_vector_search(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_weights: dict[str, float],
    k: int = 10,
) -> DataFrame:
    """Run the sparse_vector ranking over a DataFrame (spark dialect of
    sparse_vector_sql via a uniquely-named temp view)."""
    spark: SparkSession = df.sparkSession
    view = f"__sparse_corpus_{uuid.uuid4().hex}"
    df.createOrReplaceTempView(view)
    out = spark.sql(
        sparse_vector_sql(view, id_col, text_col, query_weights, "spark", k)
    )
    spark.catalog.dropTempView(view)
    return out


def decay_score_sql(
    field: str,
    *,
    origin: float,
    scale: float,
    offset: float = 0.0,
    decay: float = 0.5,
    kind: str = "gauss",
    dialect: str = "spark",
) -> str:
    """ES function_score DECAY functions (numeric fields) — the exact
    published formulas, as pure dual-dialect arithmetic:

    - ``gauss``:  exp(-d^2 / (2*sigma^2)), sigma^2 = -scale^2/(2 ln decay)
    - ``exp``:    exp(lambda * d),          lambda = ln(decay)/scale
    - ``linear``: max((s - d)/s, 0),        s = scale/(1 - decay)

    with d = max(0, |value - origin| - offset), so the score is 1
    inside ``offset`` of the origin and exactly ``decay`` at
    origin +- (offset + scale). NULL values score NULL (ES skips the
    function; compose with coalesce for a different policy)."""
    import math

    if kind not in ("gauss", "exp", "linear"):
        raise ValueError(f"unknown decay kind: {kind!r}")
    if not 0.0 < decay < 1.0:
        raise ValueError("decay must be in (0, 1)")
    if scale <= 0:
        raise ValueError("scale must be positive")
    d = (
        f"GREATEST(CAST(0 AS DOUBLE),"
        f" ABS(CAST({field} AS DOUBLE) - CAST({origin!r} AS DOUBLE))"
        f" - CAST({offset!r} AS DOUBLE))"
    )
    if kind == "gauss":
        sigma2 = -(scale * scale) / (2.0 * math.log(decay))
        return (
            f"EXP(-(({d}) * ({d})) / CAST({2.0 * sigma2!r} AS DOUBLE))"
        )
    if kind == "exp":
        lam = math.log(decay) / scale
        return f"EXP(CAST({lam!r} AS DOUBLE) * ({d}))"
    s = scale / (1.0 - decay)
    return (
        f"GREATEST((CAST({s!r} AS DOUBLE) - ({d}))"
        f" / CAST({s!r} AS DOUBLE), CAST(0 AS DOUBLE))"
    )


def decay_rank(
    df: DataFrame,
    field: str,
    *,
    origin: float,
    scale: float,
    offset: float = 0.0,
    decay: float = 0.5,
    kind: str = "gauss",
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """function_score with one decay function: rank documents by
    proximity to ``origin`` (recency boosts, price targeting, geo
    distance on a projected coordinate). Map-only score + TakeOrdered;
    ties pin (score DESC, id ASC). Returns (id, field, score)."""
    expr = decay_score_sql(
        field, origin=origin, scale=scale, offset=offset,
        decay=decay, kind=kind, dialect="spark",
    )
    return (
        df.where(F.col(field).isNotNull())
        .select(
            F.col(id_col),
            F.col(field),
            F.round(F.expr(expr), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def ltr_features_sql(
    table: str,
    id_col: str,
    text_col: str,
    terms: list[str],
    dialect: str,
    *,
    numeric_features: dict[str, str] | None = None,
    k: int = 100,
) -> str:
    """Learning-to-rank feature logging (the ES LTR plugin's ``sltr``
    rescore-logging shape): for the top-``k`` BM25 candidates of a term
    query, emit the per-(query, doc) feature vector a ranking model
    trains on — text-match features derived from the shared BM25 CTEs
    plus caller-supplied ``numeric_features`` (name -> SQL expression
    over the base table row: recency, popularity, price, ...).

    Feature columns (all rounded 6 for cross-engine stability):
    ``f_bm25`` (the full BM25 score), ``f_matched_terms``,
    ``f_total_tf``, ``f_coverage`` (matched / |query terms|),
    ``f_doc_len``, ``f_sum_idf`` (IDF mass of the matched terms), then
    one column per numeric feature. Candidates are BM25-ranked with the
    (score DESC, doc_id ASC) pinned tie order — feature logging follows
    retrieval, exactly like the plugin.

    Scale: the text features reuse the one-scan BM25 aggregation
    (corpus stats broadcast); numeric features join the base table by
    id AFTER the top-k cut, so the join probes k rows, not the corpus.
    """
    ctes = _bm25_ctes(table, id_col, text_col, terms, dialect)
    nf = numeric_features or {}
    nf_cols = "".join(
        f",\n       ROUND(CAST({expr} AS DOUBLE), 6) AS {name}"
        for name, expr in nf.items()
    )
    return f"""{ctes},
feats AS (
  SELECT tf.doc_id,
         ROUND(SUM(({_BM25_IDF}) * ({_BM25_TF_NORM})), 6) AS f_bm25,
         CAST(COUNT(*) AS BIGINT) AS f_matched_terms,
         CAST(SUM(tf.tf) AS BIGINT) AS f_total_tf,
         ROUND(COUNT(*) / CAST({len(terms)} AS DOUBLE), 6) AS f_coverage,
         CAST(MIN(tf.dl) AS BIGINT) AS f_doc_len,
         ROUND(SUM({_BM25_IDF}), 6) AS f_sum_idf
  FROM tf
  JOIN dfreq ON tf.t = dfreq.t
  CROSS JOIN stats
  GROUP BY tf.doc_id
  ORDER BY f_bm25 DESC, tf.doc_id ASC
  LIMIT {k}
)
SELECT feats.doc_id, f_bm25, f_matched_terms, f_total_tf, f_coverage,
       f_doc_len, f_sum_idf{nf_cols}
FROM feats JOIN {table} b ON feats.doc_id = b.{id_col}
ORDER BY f_bm25 DESC, feats.doc_id ASC
"""


def ltr_features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    *,
    numeric_features: dict[str, str] | None = None,
    k: int = 100,
) -> DataFrame:
    """Run :func:`ltr_features_sql` over a DataFrame (temp view +
    spark-dialect SQL, like :func:`bm25_search`)."""
    spark: SparkSession = df.sparkSession
    view = f"__ltr_corpus_{uuid.uuid4().hex}"
    df.createOrReplaceTempView(view)
    out = spark.sql(ltr_features_sql(
        view, id_col, text_col, terms, "spark",
        numeric_features=numeric_features, k=k,
    ))
    spark.catalog.dropTempView(view)
    return out


def rbo_overlap(
    df: DataFrame,
    id_col: str,
    score_a: str,
    score_b: str,
    *,
    k: int = 100,
    p: float = 0.9,
) -> DataFrame:
    """Rank-biased overlap (Webber 2010) between the top-``k`` rankings
    two scoring functions induce over the same corpus — the retriever
    A/B gauge that, unlike Kendall/Spearman, is top-weighted and
    handles non-conjoint lists (a doc only one ranker retrieves just
    never contributes overlap). Uses the extrapolated point estimate
    ``RBO_ext = A_k p^k + (1-p)/p * sum_{d=1..k} A_d p^d`` with
    ``A_d = |top_d(a) ∩ top_d(b)| / d``. Ties pin (score DESC, id ASC)
    on both engines. Returns ONE row
    ``(k, p, n_common, agreement_at_k, rbo_ext)`` rounded 6.

    Scale shape: two TakeOrdered top-k passes over the corpus (no full
    sort), then everything is k-sized: rank windows over the k-row
    lists, one id equi-join, depth overlaps as a cumulative count over
    ``max(rank_a, rank_b)`` (the per-depth intersection size equals
    the count of common docs whose LATER rank has arrived), one
    k-row weighted fold. The global windows the linter flags here run
    over k rows by construction.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if not (0.0 < p < 1.0):
        raise ValueError("p must be in (0, 1)")

    def _ranked(score: str, rname: str) -> DataFrame:
        s = F.expr(score).cast("double")
        top = (
            df.where(s.isNotNull())
            .select(F.col(id_col).alias("__id"), s.alias("__s"))
            .orderBy(F.desc("__s"), F.asc("__id"))
            .limit(k)
        )
        w = Window.orderBy(F.desc("__s"), F.asc("__id"))
        return top.select(
            "__id", F.row_number().over(w).alias(rname)
        )
    j = _ranked(score_a, "__ra").join(_ranked(score_b, "__rb"), "__id")
    cnt = j.groupBy(
        F.greatest("__ra", "__rb").alias("__m")
    ).agg(F.count(F.lit(1)).alias("__c"))
    depths = (
        df.sparkSession.range(1, k + 1)
        .select(F.col("id").cast("int").alias("__d"))
    )
    ov = depths.join(
        cnt, depths["__d"] == cnt["__m"], "left"
    ).select(
        "__d",
        F.sum(F.coalesce("__c", F.lit(0)))
        .over(
            Window.orderBy("__d").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("__ov"),
    )
    ad = F.col("__ov").cast("double") / F.col("__d")
    one = ov.agg(
        F.max(F.when(F.col("__d") == k, F.col("__ov"))).alias("__ovk"),
        F.sum(ad * F.pow(F.lit(p), F.col("__d"))).alias("__terms"),
    )
    rbo = (
        F.col("__ovk").cast("double") / k * (p ** k)
        + (1.0 - p) / p * F.col("__terms")
    )
    return one.select(
        F.lit(k).alias("k"),
        F.lit(p).alias("p"),
        F.col("__ovk").cast("bigint").alias("n_common"),
        F.round(F.col("__ovk").cast("double") / k, 6).alias(
            "agreement_at_k"
        ),
        F.round(rbo, 6).alias("rbo_ext"),
    )


def rbo_overlap_sql(
    table: str,
    id_col: str,
    score_a: str,
    score_b: str,
    dialect: str,
    *,
    k: int = 100,
    p: float = 0.9,
) -> str:
    """Dual-dialect twin of :func:`rbo_overlap` (identical structure;
    the depth series is the one dialect split)."""
    if dialect == "spark":
        depths = f"SELECT explode(sequence(1, {k})) AS d"
    elif dialect == "duckdb":
        depths = f"SELECT UNNEST(generate_series(1, {k})) AS d"
    else:
        raise ValueError(f"unknown dialect: {dialect}")
    return f"""
WITH ta AS (
  SELECT {id_col} AS id, CAST({score_a} AS DOUBLE) AS s
  FROM {table} WHERE {score_a} IS NOT NULL
  ORDER BY s DESC, id ASC LIMIT {k}
),
ra AS (
  SELECT id, ROW_NUMBER() OVER (ORDER BY s DESC, id ASC) AS r FROM ta
),
tb AS (
  SELECT {id_col} AS id, CAST({score_b} AS DOUBLE) AS s
  FROM {table} WHERE {score_b} IS NOT NULL
  ORDER BY s DESC, id ASC LIMIT {k}
),
rb AS (
  SELECT id, ROW_NUMBER() OVER (ORDER BY s DESC, id ASC) AS r FROM tb
),
cnt AS (
  SELECT GREATEST(ra.r, rb.r) AS m, COUNT(*) AS c
  FROM ra JOIN rb ON ra.id = rb.id
  GROUP BY 1
),
depths AS ({depths}),
ov AS (
  SELECT d,
         SUM(COALESCE(c, 0)) OVER (
           ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS ov
  FROM depths LEFT JOIN cnt ON d = m
),
agg AS (
  SELECT MAX(CASE WHEN d = {k} THEN ov END) AS ovk,
         SUM(CAST(ov AS DOUBLE) / d * POWER({p!r}, d)) AS terms
  FROM ov
)
SELECT {k} AS k, CAST({p!r} AS DOUBLE) AS p,
       CAST(ovk AS BIGINT) AS n_common,
       ROUND(CAST(ovk AS DOUBLE) / {k}, 6) AS agreement_at_k,
       ROUND(CAST(ovk AS DOUBLE) / {k} * POWER({p!r}, {k})
             + (1.0 - {p!r}) / {p!r} * terms, 6) AS rbo_ext
FROM agg
"""
