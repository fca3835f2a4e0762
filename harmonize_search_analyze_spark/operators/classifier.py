"""Bag-of-words quality classifier: train + score entirely in-plan.

The published pretraining pipelines gate documents with a linear
bag-of-words classifier trained on a curated-vs-crawl proxy (GPT-3:
Brown et al. 2020 Appendix A, "quality filtering" with a logistic
classifier over WebText-vs-CommonCrawl; CCNet/fastText: Joulin et al.
2017 — fastText with a single softmax IS a linear BoW model). The
closed-form member of that family is multinomial Naive Bayes with
Laplace smoothing: per-token log-odds weights derived from class counts,
document logit = prior + Σ weights — which makes BOTH training and
scoring expressible as relational aggregation, no gradient loop, no UDF,
and a DuckDB oracle can replay every step bit-for-bit.

Scale shape (train + score fused):
- shuffle 1: token explode → per-token per-class counts (map-side
  combine collapses each partition to its vocab; the exchange is
  vocab-sized, not corpus-sized).
- class totals: ONE 1-row agg, broadcast back (metadata, no collect).
- shuffle 2: token⋈weights hash join (same key as the count agg — AQE
  reuses the partitioning) → per-doc logit sum.
At 100 TB this is exactly the unigram-LM shape (contamination.py), which
is the known-good scaling profile; weights for a trained-once model can
also be saved and re-joined, making scoring a single shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from harmonize_search_analyze_spark.operators.text import tokens_sql

__all__ = ["nb_quality_classifier", "nb_quality_oracle_sql", "nb_train", "nb_score"]


def nb_quality_classifier(
    docs: DataFrame,
    label_expr: str,
    *,
    doc_id: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
) -> DataFrame:
    """Train multinomial NB on ``label_expr`` (a boolean SQL expression
    over the input — the curated-vs-crawl proxy) and score every
    document.

    Returns (doc_id, n_tokens BIGINT, logit DOUBLE rounded to 6,
    pred_quality BOOLEAN): ``logit = ln(D1/D0) + Σ_t [ln((c1(t)+α) /
    (N1+αV)) − ln((c0(t)+α)/(N0+αV))]`` over the document's tokens,
    ``pred_quality = logit > 0``. Deterministic given the corpus: all
    counts are exact, the only float work is the final log-sum (rounded
    once, the repo's cross-engine discipline).

    Both classes must be non-empty (``ln(D1/D0)`` is the prior) — a
    one-class proxy raises an explicit in-plan error in BOTH engines
    (without the guard the failure modes diverge AND can be silent:
    all-false → Spark ln(0) = NULL logits with no error / DuckDB raises;
    all-true → Spark ANSI DIVIDE_BY_ZERO / DuckDB NULL logits). A NULL
    label is pinned to false in BOTH engines (coalesce) — without the
    pin Spark's ``otherwise()`` counts NULL as class 0 while SQL
    ``CASE WHEN NOT y`` counts it as neither.
    """
    lab = F.coalesce(F.expr(label_expr).cast("boolean"), F.lit(False))
    toks = docs.select(
        doc_id,
        lab.alias("__y"),
        F.explode(F.expr(tokens_sql(text_col, "spark"))).alias("tok"),
    )
    counts = toks.groupBy("tok").agg(
        F.sum(F.when(F.col("__y"), 1).otherwise(0)).cast("double").alias("c1"),
        F.sum(F.when(F.col("__y"), 0).otherwise(1)).cast("double").alias("c0"),
    )
    totals = counts.agg(
        F.sum("c1").alias("n1"),
        F.sum("c0").alias("n0"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    d1 = F.sum(F.when(lab, 1).otherwise(0)).cast("double")
    d0 = F.sum(F.when(lab, 0).otherwise(1)).cast("double")
    prior = docs.agg(
        F.when(
            (d1 == 0) | (d0 == 0),
            F.expr(
                "raise_error('nb_quality_classifier: label_expr selects "
                "only one class; both classes must be non-empty')"
            ).cast("double"),
        )
        .otherwise(F.log(d1 / d0))
        .alias("prior")
    )
    a = F.lit(float(alpha))
    w = (
        F.log((F.col("c1") + a) / (F.col("n1") + a * F.col("v")))
        - F.log((F.col("c0") + a) / (F.col("n0") + a * F.col("v")))
    ).alias("w")
    weights = counts.crossJoin(F.broadcast(totals)).select("tok", w)
    return (
        toks.join(weights, "tok")
        .groupBy(doc_id)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("w").alias("__sw"),
        )
        .crossJoin(F.broadcast(prior))
        .select(
            doc_id,
            "n_tokens",
            F.round(F.col("prior") + F.col("__sw"), 6).alias("logit"),
            # predict from the ROUNDED logit so the published
            # (logit, pred) pair is self-consistent: a +4e-7 score must
            # not print as (0.0, true)
            (F.round(F.col("prior") + F.col("__sw"), 6) > 0).alias(
                "pred_quality"
            ),
        )
    )


def nb_quality_oracle_sql(
    doc_table: str,
    label_expr: str,
    *,
    doc_id: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
) -> str:
    """DuckDB replay of :func:`nb_quality_classifier` — same counts, same
    smoothing, same single rounding."""
    toks = tokens_sql(text_col, "duckdb")
    a = float(alpha)
    return f"""
WITH t AS (
  SELECT {doc_id}, COALESCE(({label_expr}), FALSE) AS y, unnest({toks}) AS tok
  FROM {doc_table}
), cnt AS (
  SELECT tok,
         CAST(COUNT(CASE WHEN y THEN 1 END) AS DOUBLE) AS c1,
         CAST(COUNT(CASE WHEN NOT y THEN 1 END) AS DOUBLE) AS c0
  FROM t GROUP BY tok
), tot AS (
  SELECT SUM(c1) AS n1, SUM(c0) AS n0, CAST(COUNT(*) AS DOUBLE) AS v
  FROM cnt
), pri AS (
  SELECT CASE WHEN d1 = 0 OR d0 = 0
              THEN error('nb_quality_classifier: label_expr selects only one class; both classes must be non-empty')
              ELSE LN(d1 / d0) END AS prior
  FROM (
    SELECT CAST(COUNT(CASE WHEN COALESCE(({label_expr}), FALSE) THEN 1 END) AS DOUBLE) AS d1,
           CAST(COUNT(CASE WHEN NOT COALESCE(({label_expr}), FALSE) THEN 1 END) AS DOUBLE) AS d0
    FROM {doc_table}
  )
), w AS (
  SELECT tok,
         LN((c1 + {a}) / (n1 + {a} * v))
           - LN((c0 + {a}) / (n0 + {a} * v)) AS w
  FROM cnt CROSS JOIN tot
)
SELECT {doc_id},
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       ROUND(prior + SUM(w), 6) AS logit,
       ROUND(prior + SUM(w), 6) > 0 AS pred_quality
FROM t JOIN w USING (tok) CROSS JOIN pri
GROUP BY {doc_id}, prior
"""


# -- split train / score (model reuse + streaming scoring) -------------------


def nb_train(
    docs: DataFrame,
    label_expr: str,
    *,
    text_col: str = "text",
    alpha: float = 1.0,
) -> tuple[DataFrame, DataFrame]:
    """Training half of :func:`nb_quality_classifier`: returns
    ``(weights, prior)`` — weights is (tok, w DOUBLE), vocab-sized; prior
    is ONE row (prior DOUBLE). Save weights as a table and re-join to
    score any corpus (or a stream — see nb_score) with a single shuffle.
    Same guards as the fused form: NULL labels pin to class 0, one-class
    proxies raise in-plan."""
    lab = F.coalesce(F.expr(label_expr).cast("boolean"), F.lit(False))
    toks = docs.select(
        lab.alias("__y"),
        F.explode(F.expr(tokens_sql(text_col, "spark"))).alias("tok"),
    )
    counts = toks.groupBy("tok").agg(
        F.sum(F.when(F.col("__y"), 1).otherwise(0)).cast("double").alias("c1"),
        F.sum(F.when(F.col("__y"), 0).otherwise(1)).cast("double").alias("c0"),
    )
    totals = counts.agg(
        F.sum("c1").alias("n1"),
        F.sum("c0").alias("n0"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    d1 = F.sum(F.when(lab, 1).otherwise(0)).cast("double")
    d0 = F.sum(F.when(lab, 0).otherwise(1)).cast("double")
    prior = docs.agg(
        F.when(
            (d1 == 0) | (d0 == 0),
            F.expr(
                "raise_error('nb_quality_classifier: label_expr selects "
                "only one class; both classes must be non-empty')"
            ).cast("double"),
        )
        .otherwise(F.log(d1 / d0))
        .alias("prior")
    )
    a = F.lit(float(alpha))
    w = (
        F.log((F.col("c1") + a) / (F.col("n1") + a * F.col("v")))
        - F.log((F.col("c0") + a) / (F.col("n0") + a * F.col("v")))
    ).alias("w")
    weights = counts.crossJoin(F.broadcast(totals)).select("tok", w)
    return weights, prior


def nb_score(
    docs: DataFrame,
    weights: DataFrame,
    prior: DataFrame | float,
    *,
    doc_id: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Scoring half: per-doc logit over saved ``weights``. ``prior`` may
    be the 1-row frame from nb_train or a plain float — the float form is
    what a STREAMING scorer needs (stream-static equi-join on tok is
    supported by Structured Streaming; a stream-static cross join of the
    prior frame is not, and one scalar is model metadata, not data).

    Out-of-vocabulary tokens drop out of the inner join — they carry no
    evidence either way, matching the smoothed-model convention for
    unseen-at-train tokens.
    """
    toks = docs.select(
        doc_id, F.explode(F.expr(tokens_sql(text_col, "spark"))).alias("tok")
    )
    scored = toks.join(weights, "tok").groupBy(doc_id).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum("w").alias("__sw"),
    )
    if isinstance(prior, DataFrame):
        scored = scored.crossJoin(F.broadcast(prior))
    else:
        scored = scored.withColumn("prior", F.lit(float(prior)))
    return scored.select(
        doc_id,
        "n_tokens",
        F.round(F.col("prior") + F.col("__sw"), 6).alias("logit"),
        (F.round(F.col("prior") + F.col("__sw"), 6) > 0).alias(
            "pred_quality"
        ),
    )
