"""ES retriever trees (the 8.x ``retriever`` search API): data-driven
composition of lexical, vector, and fusion retrieval.

A retriever spec is JSON, exactly the ES wire shape:

    {"standard": {"query": {...DSL...}, "filter": {...DSL...}?}}
    {"knn": {"query_vector": [...], "k": N, "filter": {...DSL...}?}}
    {"rrf": {"retrievers": [spec, ...],
             "rank_window_size": 50, "rank_constant": 60}}
    {"linear": {"retrievers": [{"retriever": spec, "weight": w,
                                "normalizer": "minmax" | "none"}, ...],
                "rank_window_size": 50}}

``run_retriever`` walks the tree and returns a ranked frame
(``id, rank`` with rank starting at 1) built ONLY from operators this
engine already gates: ``standard`` scores with bm25_search (its
deterministic tokenizer + K1/B), ``knn`` dispatches through
``knn_filtered`` (exact under the brute threshold, IVF above), and
``rrf`` fuses child rankings with ``rrf_fuse``. Like the Kibana
saved-object loader and the ingest-pipeline processors, the point is
that the COMPOSITION is data, not code — an ES retriever body ports
verbatim.

Pinned semantics: a ``standard`` retriever whose query has a
``{"match": {<text_col>: "..."}}`` clause (possibly inside bool/must)
ranks by BM25 over those terms; any other query is filter-only and
ranks by id ASC (constant score — ES's match_all/filter scoring
degenerates the same way). Every rank is totally ordered (score DESC,
id ASC), so trees are deterministic end-to-end.

Scale: each leaf is the already-shaped operator (one corpus scan /
TakeOrdered); fusion unions bounded top-``rank_window_size`` lists —
metadata-sized work after the retrievals, any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


import re as _re

_TOKEN_RE = _re.compile(r"[^a-z0-9]+")


def _split_query(
    query: dict, text_col: str
) -> tuple[list[str] | None, dict | None]:
    """Split a standard-retriever query into (scoring terms, residual
    filter query). The SCORING clause is a ``{"match": {text_col: ...}}``
    found standalone or inside ``bool.must``; its text is tokenized with
    the ENGINE tokenizer ([a-z0-9] runs — "spark-join" scores as two
    terms, matching the document side), and every sibling clause remains
    in the residual, which the caller compiles and applies as a filter —
    ES semantics: the other must/filter/must_not clauses restrict, the
    match clause scores."""

    def terms_of(clause: dict) -> list[str] | None:
        if isinstance(clause, dict) and "match" in clause:
            body = clause["match"]
            if text_col in body:
                val = body[text_col]
                text = val["query"] if isinstance(val, dict) else val
                if isinstance(text, str):
                    return [
                        t for t in _TOKEN_RE.split(text.lower()) if t
                    ]
        return None

    direct = terms_of(query)
    if direct is not None:
        return direct, None
    if isinstance(query, dict) and "bool" in query:
        must = query["bool"].get("must", [])
        if isinstance(must, dict):
            must = [must]
        for i, clause in enumerate(must):
            terms = terms_of(clause)
            if terms is not None:
                residual_must = must[:i] + must[i + 1:]
                residual_bool = {
                    k: v for k, v in query["bool"].items() if k != "must"
                }
                if residual_must:
                    residual_bool["must"] = residual_must
                residual = {"bool": residual_bool} if residual_bool else None
                return terms, residual
    return None, query


def run_retriever(
    spec: dict,
    *,
    docs: DataFrame,
    embeddings: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_col: str = "embedding",
    vec_id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Execute a retriever tree. Returns (``id_col``, rank) — the top-k
    of the root retriever, rank 1-based and totally ordered."""
    out = _run(
        spec,
        docs=docs,
        embeddings=embeddings,
        id_col=id_col,
        text_col=text_col,
        vec_col=vec_col,
        vec_id_col=vec_id_col,
        k=k,
    )
    # the root ALWAYS honors the caller's k — a knn leaf's own body["k"]
    # (its candidate count) may exceed it
    return out.where(F.col("rank") <= k).select(id_col, "rank")


def _run(
    spec: dict,
    *,
    docs: DataFrame,
    embeddings: DataFrame | None,
    id_col: str,
    text_col: str,
    vec_col: str,
    vec_id_col: str,
    k: int,
) -> DataFrame:
    """Internal form: (id, rank, score DOUBLE) — combiners (rrf ranks,
    linear scores) consume whichever signal they fuse on."""
    from harmonize_search_analyze_spark.plans.compiler import compile_query

    if len(spec) != 1:
        raise ValueError("a retriever spec has exactly one root key")
    (kind, body), = spec.items()

    def recurse(child: dict, child_k: int) -> DataFrame:
        return _run(
            child,
            docs=docs,
            embeddings=embeddings,
            id_col=id_col,
            text_col=text_col,
            vec_col=vec_col,
            vec_id_col=vec_id_col,
            k=child_k,
        )

    if kind == "standard":
        base = docs
        if body.get("filter") is not None:
            base = base.where(compile_query(body["filter"]))
        terms, residual = _split_query(body.get("query") or {}, text_col)
        if residual is not None and terms:
            # sibling bool clauses RESTRICT while the match clause scores
            base = base.where(compile_query(residual))
        if terms:
            from harmonize_search_analyze_spark.operators.ranking import (
                bm25_search,
            )

            ranked = bm25_search(base, id_col, text_col, terms, k=k)
            w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
            return ranked.select(
                F.col("doc_id").alias(id_col),
                F.row_number().over(w).alias("rank"),
                F.col("score").cast("double").alias("score"),
            )
        # filter-only: constant score, rank by id (pinned)
        if body.get("query") is not None:
            base = base.where(compile_query(body["query"]))
        w = Window.orderBy(F.asc(id_col))
        return (
            base.select(id_col)
            .orderBy(F.asc(id_col))
            .limit(k)
            .select(
                id_col,
                F.row_number().over(w).alias("rank"),
                F.lit(1.0).alias("score"),
            )
        )

    if kind == "knn":
        if embeddings is None:
            raise ValueError("knn retriever needs the embeddings frame")
        from harmonize_search_analyze_spark.operators.similarity import (
            knn_filtered,
        )

        ranked = knn_filtered(
            embeddings,
            vec_col,
            list(body["query_vector"]),
            body.get("filter"),
            k=int(body.get("k", k)),
            id_col=vec_id_col,
            similarity=body.get("similarity"),
        )
        score = [c for c in ranked.columns if c != vec_id_col][0]
        w = Window.orderBy(F.desc(score), F.asc(vec_id_col))
        return ranked.select(
            F.col(vec_id_col).alias(id_col),
            F.row_number().over(w).alias("rank"),
            F.col(score).cast("double").alias("score"),
        )

    if kind == "rrf":
        from harmonize_search_analyze_spark.operators.ranking import rrf_fuse

        window = int(body.get("rank_window_size", 50))
        const = int(body.get("rank_constant", 60))
        children = [recurse(c, window) for c in body["retrievers"]]
        fused = rrf_fuse(
            children, rrf_k=const, id_col=id_col, rank_col="rank", k=k
        )
        w = Window.orderBy(F.desc("rrf_score"), F.asc(id_col))
        return fused.select(
            id_col,
            F.row_number().over(w).alias("rank"),
            F.col("rrf_score").cast("double").alias("score"),
        )

    if kind == "linear":
        # ES linear retriever: weighted sum of per-child normalized
        # scores; a doc missing from a child's window contributes 0
        # there. minmax collapses to 1.0 when a child's window has a
        # single score value (ES: max==min => all 1).
        window = int(body.get("rank_window_size", 50))
        parts = []
        for entry in body["retrievers"]:
            child = entry["retriever"]
            weight = float(entry.get("weight", 1.0))
            norm = entry.get("normalizer", "none")
            ranked = recurse(child, window)
            if norm == "minmax":
                bounds = ranked.agg(
                    F.min("score").alias("__lo"),
                    F.max("score").alias("__hi"),
                )
                ranked = ranked.crossJoin(F.broadcast(bounds)).select(
                    id_col,
                    F.when(
                        F.col("__hi") == F.col("__lo"), F.lit(1.0)
                    ).otherwise(
                        (F.col("score") - F.col("__lo"))
                        / (F.col("__hi") - F.col("__lo"))
                    ).alias("score"),
                )
            elif norm != "none":
                raise ValueError(f"unknown normalizer: {norm!r}")
            parts.append(
                ranked.select(
                    id_col,
                    (F.col("score") * F.lit(weight)).alias("__ws"),
                )
            )
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        fused = (
            u.groupBy(id_col)
            .agg(F.round(F.sum("__ws"), 6).alias("score"))
            .orderBy(F.desc("score"), F.asc(id_col))
            .limit(k)
        )
        w = Window.orderBy(F.desc("score"), F.asc(id_col))
        return fused.select(
            id_col, F.row_number().over(w).alias("rank"), "score"
        )

    if kind == "rescorer":
        # ES 8.x rescorer retriever: re-score the child's top window with
        # a second scorer and re-rank — here the rescore query is the
        # engine's restricted script form (a SQL expression over the doc
        # columns, same contract as script_score), combined as
        # query_weight * child_score + rescore_query_weight * script.
        rs = body["rescore"]
        window = int(rs.get("window_size", 50))
        qw = float(rs.get("query_weight", 1.0))
        rqw = float(rs.get("rescore_query_weight", 1.0))
        # fetch enough child rows for BOTH the window and the tail — ES
        # keeps ranks beyond the window at their original scores/order
        child = recurse(body["retriever"], max(k, window))
        head = child.where(F.col("rank") <= window).join(
            docs, id_col, "inner"
        )
        new_score = F.round(
            F.lit(qw) * F.col("score")
            + F.lit(rqw) * F.expr(rs["script"]).cast("double"),
            6,
        )
        wh = Window.orderBy(F.desc("score"), F.asc(id_col))
        rescored = head.select(
            id_col, new_score.alias("score")
        ).select(
            id_col, F.row_number().over(wh).alias("rank"), "score"
        )
        # tail docs keep their original rank (already > window and
        # consecutive: a non-empty tail implies a FULL window) and score
        tail = child.where(F.col("rank") > window).select(
            id_col, "rank", "score"
        )
        out = rescored.unionByName(tail).where(F.col("rank") <= k)
        return out.orderBy("rank")

    if kind == "text_similarity_reranker":
        # ES 8.15 semantic re-ranking retriever: re-score the child's
        # top rank_window_size by a rerank inference endpoint over
        # `field` vs `inference_text`, re-rank by the new score. The
        # in-engine model is the deterministic term_overlap stand-in
        # (shared with ES|QL RERANK, operators/text.py); the
        # inference_id is looked up in the spec's own `inference`
        # registry dict (the Catalog.register_inference map, passed
        # data-side so retriever bodies stay pure JSON + one registry).
        from harmonize_search_analyze_spark.operators.text import (
            term_overlap_sql,
        )

        window = int(body.get("rank_window_size", 10))
        registry = body.get("inference") or {}
        endpoint = registry.get(body["inference_id"])
        if endpoint is None:
            raise ValueError(
                f"unknown inference endpoint {body['inference_id']!r} — "
                "pass Catalog's registry as body['inference']"
            )
        if endpoint.get("task_type") != "rerank":
            raise ValueError("reranker endpoint must be task_type=rerank")
        if endpoint.get("type", "term_overlap") != "term_overlap":
            raise ValueError(
                "only the deterministic term_overlap rerank stand-in "
                "runs in-engine"
            )
        field = body.get("field", text_col)
        score = term_overlap_sql(
            body["inference_text"], [f"`{field}`"], "spark"
        )
        child = recurse(body["retriever"], max(k, window))
        head = child.where(F.col("rank") <= window).join(
            docs, id_col, "inner"
        )
        wh = Window.orderBy(F.desc("score"), F.asc(id_col))
        return (
            head.select(id_col, F.expr(score).alias("score"))
            .select(
                id_col,
                F.row_number().over(wh).alias("rank"),
                "score",
            )
            .where(F.col("rank") <= k)
            .orderBy("rank")
        )

    raise ValueError(f"unknown retriever kind: {kind!r}")
