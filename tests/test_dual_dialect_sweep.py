"""Cross-engine sweep: every dual-dialect SQL generator evaluated on the
SAME adversarial inputs through Spark AND DuckDB must agree exactly.

This is the generalization of the empty-document shingle bug (grams_sql:
Spark '' vs DuckDB NULL on a zero-token doc): the per-query oracle gate
only sees the parquet corpora, which never hit the nasty edges — empty
strings, whitespace-only, single chars, digits-only, punctuation runs,
very long tokens. One batched comparison per generator keeps the sweep
fast (a handful of Spark jobs total, not one per example)."""

from __future__ import annotations

import duckdb
import pytest

# the nasty-edge corpus every generator must agree on
EDGE_TEXTS = [
    "",
    " ",
    "   \t  ",
    "a",
    "7",
    "!!!",
    "one",
    "a b",
    "a  b   c",
    "UPPER lower MiXeD",
    "dig1ts 42 mixed99x",
    "hyphen-ated under_scored dot.sep",
    "x" * 300,
    ("repeat me " * 40).strip(),
    "the a an and of to in is it",     # all stopwords
    "word",
    "tab\tsep\nnewline",
]


def _spark_eval(spark, sql_expr: str) -> list:
    from pyspark.sql import functions as F  # noqa: F401

    df = spark.createDataFrame([(t,) for t in EDGE_TEXTS], ["text"])
    return [r[0] for r in df.selectExpr(sql_expr).collect()]


def _duck_eval(gen, *args, **kwargs) -> list:
    out = []
    for t in EDGE_TEXTS:
        lit = "'" + t.replace("'", "''").replace("\\", "\\\\") + "'"
        out.append(
            duckdb.sql("SELECT " + gen(lit, "duckdb", *args, **kwargs))
            .fetchall()[0][0]
        )
    return out


def _norm(v):
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, list):
        return [_norm(x) for x in v]
    return v


def _sweep(spark, gen, *args, **kwargs):
    got_s = _spark_eval(spark, gen("text", "spark", *args, **kwargs))
    got_d = _duck_eval(gen, *args, **kwargs)
    for t, s, d in zip(EDGE_TEXTS, got_s, got_d):
        assert _norm(s) == _norm(d), (gen.__name__, args, kwargs, t[:40], s, d)


def test_tokens_and_counts(spark):
    from harmonize_search_analyze_spark.operators.text import (
        bpe_ish_token_count_sql,
        token_count_sql,
        tokens_sql,
    )

    _sweep(spark, tokens_sql)
    _sweep(spark, token_count_sql)
    _sweep(spark, bpe_ish_token_count_sql)


def test_quality_and_lang(spark):
    from harmonize_search_analyze_spark.operators.text import (
        lang_id_sql,
        quality_score_sql,
    )

    _sweep(spark, quality_score_sql)
    _sweep(spark, lang_id_sql)


def test_fingerprint(spark):
    from harmonize_search_analyze_spark.operators.text import (
        fingerprint_sql,
    )

    _sweep(spark, fingerprint_sql)
    _sweep(spark, fingerprint_sql, 3)


def test_shingles_and_ngrams(spark):
    from harmonize_search_analyze_spark.operators.dedup import (
        grams_sql,
        shingles_sql,
    )
    from harmonize_search_analyze_spark.operators.text import ngrams_sql

    for n in (1, 2, 3, 5):
        _sweep(spark, grams_sql, n)
        _sweep(spark, ngrams_sql, n)
        # shingles are a SET: element order is explicitly unspecified
        # (array_distinct vs list_distinct disagree) — compare as sets
        s = _spark_eval(spark, shingles_sql("text", "spark", n))
        d = _duck_eval(shingles_sql, n)
        for t, a, b in zip(EDGE_TEXTS, s, d):
            assert sorted(a) == sorted(b), (n, t[:40], a, b)


def test_categorize_pattern(spark):
    from harmonize_search_analyze_spark.operators.text import (
        categorize_pattern_sql,
    )

    _sweep(spark, categorize_pattern_sql, 2)
    _sweep(spark, categorize_pattern_sql, 4)


def test_highlight_generator(spark):
    from harmonize_search_analyze_spark.operators.text import highlight_sql

    for term in ("me", "word", "zzz", "7"):
        _sweep(spark, highlight_sql, term)


def test_cleaning_and_repetition(spark):
    from harmonize_search_analyze_spark.operators.curation import (
        clean_text_sql,
    )

    _sweep(spark, clean_text_sql)


def test_hash_and_sampling(spark):
    from harmonize_search_analyze_spark.functions.hashing import hash64_sql

    got_s = _spark_eval(spark, hash64_sql("text", "spark"))
    got_d = []
    for t in EDGE_TEXTS:
        lit = "'" + t.replace("'", "''") + "'"
        got_d.append(
            duckdb.sql("SELECT " + hash64_sql(lit, "duckdb")).fetchall()[0][0]
        )
    assert got_s == got_d


PII_TEXTS = [
    "mail me at a.b@example.com or call 555-123-4567",
    "ssn 123-45-6789 ip 10.0.0.1 card 4111 1111 1111 1111",
    "no pii here",
    "",
    "edge@x.io edge@x.io twice, and (555) 987-6543 too",
]


def test_pii_generators(spark):
    from harmonize_search_analyze_spark.operators.curation import (
        pii_counts_sql,
        redact_pii_sql,
    )

    df = spark.createDataFrame([(t,) for t in PII_TEXTS], ["text"])
    s_counts = {
        k: [r[0] for r in df.selectExpr(expr).collect()]
        for k, expr in pii_counts_sql("text", "spark").items()
    }
    for k, duck_tmpl in pii_counts_sql("text", "duckdb").items():
        for i, t in enumerate(PII_TEXTS):
            lit = "'" + t.replace("'", "''") + "'"
            d = duckdb.sql(
                "SELECT " + pii_counts_sql(lit, "duckdb")[k]
            ).fetchall()[0][0]
            assert s_counts[k][i] == d, (k, t, s_counts[k][i], d)
    s_red = [r[0] for r in df.selectExpr(
        redact_pii_sql("text", "spark")).collect()]
    for i, t in enumerate(PII_TEXTS):
        lit = "'" + t.replace("'", "''") + "'"
        d = duckdb.sql(
            "SELECT " + redact_pii_sql(lit, "duckdb")
        ).fetchall()[0][0]
        assert s_red[i] == d, (t, s_red[i], d)


def test_c4_line_filter(spark):
    from harmonize_search_analyze_spark.operators.curation import (
        c4_line_filter_sql,
    )

    _sweep(spark, c4_line_filter_sql)


# -- table-level generators over the edge corpus ------------------------------

EDGE_DOCS = [
    (i, t) for i, t in enumerate(EDGE_TEXTS)
] + [(100, "shared line of text\nshared line of text\nunique tail here")]


@pytest.fixture(scope="module")
def edge_tables(spark):
    import pandas as pd

    df = spark.createDataFrame(EDGE_DOCS, ["doc_id", "text"])
    df.createOrReplaceTempView("edge_docs")
    con = duckdb.connect()
    con.register(
        "edge_docs", pd.DataFrame(EDGE_DOCS, columns=["doc_id", "text"])
    )
    yield spark, con
    spark.catalog.dropTempView("edge_docs")


def _rows(spark_or_con, sql, engine):
    if engine == "spark":
        return sorted(
            tuple(_norm(v) for v in r) for r in spark_or_con.sql(sql).collect()
        )
    return sorted(
        tuple(_norm(v) for v in r) for r in spark_or_con.sql(sql).fetchall()
    )


def test_table_generators_on_edge_corpus(edge_tables):
    """Every dual-dialect TABLE-level generator must agree on the edge
    corpus too — the oracle parity suite only exercises them on the
    well-behaved parquet data."""
    spark, con = edge_tables
    from harmonize_search_analyze_spark.operators.ranking import (
        bm25_search_sql,
        more_like_this_sql,
    )
    from harmonize_search_analyze_spark.operators.text import (
        significant_text_sql,
        vocab_build_sql,
    )

    cases = [
        lambda d: bm25_search_sql("edge_docs", "doc_id", "text",
                                  ["word", "me"], d, k=10),
        lambda d: more_like_this_sql("edge_docs", "doc_id", "text", 100, d,
                                     max_query_terms=5, k=10),
        lambda d: significant_text_sql("edge_docs", "text",
                                       "doc_id >= 8", d, k=10),
        lambda d: vocab_build_sql("edge_docs", "text", d, k=10),
    ]
    for case in cases:
        s = _rows(spark, case("spark"), "spark")
        d = _rows(con, case("duckdb"), "duckdb")
        assert s == d, (case("duckdb")[:120], s[:3], d[:3])


def test_line_dedup_operator_vs_oracle_on_edge_corpus(edge_tables):
    spark, con = edge_tables
    from harmonize_search_analyze_spark.operators.dedup import (
        line_dedup,
        line_dedup_sql,
    )

    df = spark.table("edge_docs")
    s = sorted(
        (r["doc_id"], r["text"], r["n_kept"], r["n_dropped"])
        for r in line_dedup(df, "doc_id", "text", min_line_chars=5).collect()
    )
    d = sorted(con.sql(
        line_dedup_sql("edge_docs", "doc_id", "text", min_line_chars=5)
    ).fetchall())
    assert s == d


def test_simhash_generator_on_edge_corpus(edge_tables):
    """64-bit simhash sketches (incl. the MIN_LONG bit-63 weight) must
    agree exactly across engines on the edge corpus."""
    spark, con = edge_tables
    from harmonize_search_analyze_spark.operators.dedup import (
        simhash_select_sql,
    )

    s = _rows(
        spark, simhash_select_sql("edge_docs", "doc_id", "text", "spark"),
        "spark",
    )
    d = _rows(
        con, simhash_select_sql("edge_docs", "doc_id", "text", "duckdb"),
        "duckdb",
    )
    assert s == d
    # the corpus must actually exercise the widened sketch: bits above
    # the old 32-bit width set on at least one doc
    assert any(v is not None and abs(v) >= (1 << 32) for _, v in s)


def test_funnel_generator_on_edge_events(spark):
    """Sequential-chain funnel: the DataFrame op and the SQL twin agree on
    adversarial event orderings (step-2-before-step-1, before-AND-after,
    same-timestamp ties, repeats, partial chains)."""
    import datetime as dt

    import pandas as pd
    from pyspark.sql import functions as F

    from harmonize_search_analyze_spark.operators.analytics import (
        funnel,
        funnel_sql,
    )

    t = dt.datetime
    events = [
        (1, "a", t(2025, 1, 1, 9)), (1, "b", t(2025, 1, 1, 10)),
        (1, "c", t(2025, 1, 1, 11)),                    # clean chain
        (2, "b", t(2025, 1, 1, 8)), (2, "a", t(2025, 1, 1, 9)),  # b first only
        (3, "b", t(2025, 1, 1, 8)), (3, "a", t(2025, 1, 1, 9)),
        (3, "b", t(2025, 1, 1, 10)),                    # b before AND after
        (4, "a", t(2025, 1, 1, 9)), (4, "b", t(2025, 1, 1, 9)),  # tie
        (5, "a", t(2025, 1, 1, 9)),                     # partial
        (6, "c", t(2025, 1, 1, 9)),                     # never step a
        (7, "a", t(2025, 1, 1, 9)), (7, "a", t(2025, 1, 1, 10)),
        (7, "b", t(2025, 1, 1, 9, 30)),                 # b between repeats
    ]
    steps_sql = [("a", "event_type = 'a'"), ("b", "event_type = 'b'"),
                 ("c", "event_type = 'c'")]
    df = spark.createDataFrame(events, ["user_id", "event_type", "ts"])
    steps = [(n, F.expr(p)) for n, p in steps_sql]
    got = [(r["step"], r["users"], r["conversion_pct"])
           for r in funnel(df, steps).collect()]
    con = duckdb.connect()
    con.register(
        "edge_events",
        pd.DataFrame(events, columns=["user_id", "event_type", "ts"]),
    )
    want = [(r[1], r[2], r[3]) for r in
            con.sql(funnel_sql("edge_events", steps_sql)).fetchall()]
    assert got == want
    # pin the semantics: users 1,2,3,4,5,7 have an 'a' event (u2's early b
    # doesn't block step a); b reachers are 1 (clean), 3 (post-a b), 4
    # (same-timestamp tie), 7 (b after first a) — NOT 2 (b strictly first)
    assert got[0] == ("a", 6, 100.0)
    assert got[1][1] == 4


EDGE_NUMBERS = [None, -100.0, -1.0, -0.5, 0.0, 0.5, 1.0, 42.0, 1e9]


def test_field_value_factor_on_numeric_edges(spark):
    """function_score's score expression must agree on out-of-domain
    inputs too: unguarded, DuckDB RAISES on log/sqrt of out-of-range
    while Spark yields NULL/NaN, and Spark ANSI throws on reciprocal(0)
    — the generator's domain guards make both yield NULL."""
    import math

    from harmonize_search_analyze_spark.operators.ranking import (
        field_value_factor_sql,
    )

    con = duckdb.connect()
    for modifier in ("none", "log1p", "ln1p", "sqrt", "square", "reciprocal"):
        expr = field_value_factor_sql(
            "v", modifier=modifier, factor=1.0, weight=2.0, missing=0.0
        )
        df = spark.createDataFrame(
            [(x,) for x in EDGE_NUMBERS], "v double"
        )
        got_s = [r[0] for r in df.selectExpr(expr).collect()]
        got_d = []
        for x in EDGE_NUMBERS:
            lit = "CAST(NULL AS DOUBLE)" if x is None else repr(x)
            got_d.append(
                con.sql(
                    f"SELECT {expr} FROM (SELECT {lit} AS v)"
                ).fetchall()[0][0]
            )
        for x, s, d in zip(EDGE_NUMBERS, got_s, got_d):
            if s is not None and d is not None and math.isnan(s) and math.isnan(d):
                continue
            assert _norm(s) == _norm(d), (modifier, x, s, d)


def test_quality_mix_and_token_budget_generators_on_edge_corpus(edge_tables):
    """The round-3 sampling generators agree with their DataFrame twins on
    the edge corpus (empty/whitespace/huge docs)."""
    from pyspark.sql import functions as F

    spark, con = edge_tables
    from harmonize_search_analyze_spark.operators.sampling import (
        quality_mix,
        quality_mix_sql,
        token_budget_sample,
        token_budget_sample_sql,
    )

    docs = spark.table("edge_docs").withColumn(
        "source",
        (F.col("doc_id") % 2 == 0).cast("string"),
    )
    con.execute(
        "CREATE OR REPLACE VIEW edge_docs_src AS "
        "SELECT doc_id, text, CAST(doc_id % 2 = 0 AS VARCHAR) AS source "
        "FROM edge_docs"
    )

    want = sorted(
        r["doc_id"]
        for r in quality_mix(
            docs, "text", "doc_id", cuts=[0.5], rates=[1.0, 0.3]
        ).collect()
    )
    got = sorted(
        r[0]
        for r in con.sql(
            quality_mix_sql(
                "edge_docs_src", "text", "doc_id", ["doc_id"], "duckdb",
                cuts=[0.5], rates=[1.0, 0.3],
            )
        ).fetchall()
    )
    assert want == got

    want_tb = sorted(
        (r["doc_id"], r["cum_tokens"])
        for r in token_budget_sample(
            docs, "source", {"true": 20}, "doc_id", "text",
            default_budget=5,
        ).select("doc_id", "cum_tokens").collect()
    )
    got_tb = sorted(
        (r[0], r[1])
        for r in con.sql(
            token_budget_sample_sql(
                "edge_docs_src", "source", {"true": 20}, "doc_id", "text",
                ["doc_id"], "duckdb", default_budget=5,
            )
        ).fetchall()
    )
    assert want_tb == got_tb


def test_session3_generators_on_edge_corpus(edge_tables):
    """Round-3 session-3 dual-dialect generators on the edge corpus:
    DSIR weights/sample, suggesters, intervals, unimax, split."""
    spark, con = edge_tables
    from harmonize_search_analyze_spark.operators.dsir import (
        dsir_sample_sql,
        dsir_weights_sql,
    )
    from harmonize_search_analyze_spark.operators.ordering import (
        assign_split_sql,
    )
    from harmonize_search_analyze_spark.operators.ranking import (
        phrase_suggest_sql,
        term_suggest_sql,
    )
    from harmonize_search_analyze_spark.operators.sampling import (
        unimax_sample_sql,
    )

    cases = [
        lambda d: dsir_weights_sql(
            "edge_docs", "doc_id % 2 = 0", d, m=32),
        lambda d: dsir_sample_sql(
            "edge_docs", "doc_id % 2 = 0", d, k=6, m=32),
        lambda d: term_suggest_sql(
            "edge_docs", "text", "wird reepat", d, k=3),
        lambda d: phrase_suggest_sql(
            "edge_docs", "text", "reepat me", d, k=3),
        lambda d: unimax_sample_sql(
            "edge_docs", "text", "doc_id", ["doc_id"], d,
            budget=6.0, max_epochs=2.0),
        lambda d: assign_split_sql(
            "edge_docs", "doc_id", {"a": 0.5, "b": 0.3, "c": 0.2},
            ["doc_id"], d),
    ]
    for case in cases:
        s = _rows(spark, case("spark"), "spark")
        d = _rows(con, case("duckdb"), "duckdb")
        assert s == d, (case("duckdb")[:150], s[:3], d[:3])


def test_intervals_generator_on_edge_corpus(edge_tables):
    """Position-array intervals predicates on the edge corpus, all rule
    shapes."""
    spark, con = edge_tables
    from harmonize_search_analyze_spark.functions.intervals import (
        intervals_sql,
    )

    rules = [
        {"match": {"query": "repeat me", "ordered": True, "max_gaps": 0}},
        {"match": {"query": "me repeat", "ordered": False, "max_gaps": 1}},
        {"match": {"query": "a b c", "ordered": True, "max_gaps": 2}},
        {"match": {"query": "one"}},
        {"any_of": {"intervals": [
            {"match": {"query": "word"}},
            {"match": {"query": "tab sep", "ordered": True}}]}},
    ]
    for rule in rules:
        s = _rows(spark, "SELECT doc_id FROM edge_docs WHERE "
                  + intervals_sql(rule, "text", "spark"), "spark")
        d = _rows(con, "SELECT doc_id FROM edge_docs WHERE "
                  + intervals_sql(rule, "text", "duckdb"), "duckdb")
        assert s == d, (rule, s, d)


def test_nested_generator_on_edge_structs(spark):
    """nested_exists_sql over adversarial struct arrays: empty, NULL,
    NULL members, correlation cases."""
    import pandas as pd

    from harmonize_search_analyze_spark.plans.compiler import (
        nested_exists_sql,
    )

    rows = [
        (1, [("F", 100.0), ("O", 900.0)]),
        (2, [("F", 700.0)]),
        (3, []),
        (4, None),
        (5, [(None, 5.0), ("F", None)]),
    ]
    df = spark.createDataFrame(
        rows, "id long, orders array<struct<status string, total double>>"
    )
    df.createOrReplaceTempView("edge_nested")
    con = duckdb.connect()
    con.sql("""CREATE TABLE edge_nested AS SELECT * FROM (VALUES
      (1, [{'status': 'F', 'total': 100.0}, {'status': 'O', 'total': 900.0}]),
      (2, [{'status': 'F', 'total': 700.0}]),
      (3, CAST([] AS STRUCT(status VARCHAR, total DOUBLE)[])),
      (4, NULL),
      (5, [{'status': NULL, 'total': 5.0}, {'status': 'F', 'total': NULL}])
    ) t(id, orders)""")
    asts = [
        {"bool": {"must": [
            {"term": {"orders.status": "F"}},
            {"range": {"orders.total": {"gt": 500.0}}}]}},
        {"exists": {"field": "orders.status"}},
        {"bool": {"must_not": [{"term": {"orders.status": "F"}}]}},
        {"terms": {"orders.status": ["F", "O"]}},
    ]
    try:
        for ast in asts:
            s = _rows(spark, "SELECT id FROM edge_nested WHERE "
                      + nested_exists_sql("orders", ast, "spark"), "spark")
            d = _rows(con, "SELECT id FROM edge_nested WHERE "
                      + nested_exists_sql("orders", ast, "duckdb"), "duckdb")
            assert s == d, (ast, s, d)
    finally:
        spark.catalog.dropTempView("edge_nested")


def test_web_generators(spark):
    """HTML/URL extraction on the text edge corpus (markup-shaped edges
    get their own corpus in test_web.py; this guards the generic string
    edges — empties, whitespace runs, long tokens)."""
    from harmonize_search_analyze_spark.operators.web import (
        html_to_text_sql,
        normalize_url_sql,
        registered_domain_sql,
    )

    _sweep(spark, html_to_text_sql)
    _sweep(spark, normalize_url_sql)
    _sweep(spark, registered_domain_sql)


def test_span_generators_on_edge_corpus(edge_tables):
    """span_first / span_near on the edge corpus, all flag combos."""
    spark, con = edge_tables
    from harmonize_search_analyze_spark.functions.intervals import (
        span_first_sql,
        span_near_sql,
    )

    cases = []
    for term, end in (("a", 1), ("me", 3), ("word", 1), ("x", 2)):
        cases.append(lambda d, t=term, e=end: span_first_sql("text", t, e, d))
    for terms, slop, order in (
        (["repeat", "me"], 0, True),
        (["me", "repeat"], 1, False),
        (["a", "b", "c"], 2, True),
        (["one"], 0, True),
    ):
        cases.append(
            lambda d, ts=terms, s=slop, o=order: span_near_sql(
                "text", ts, d, slop=s, in_order=o
            )
        )
    for gen in cases:
        s = _rows(spark, "SELECT doc_id FROM edge_docs WHERE " + gen("spark"),
                  "spark")
        d = _rows(con, "SELECT doc_id FROM edge_docs WHERE " + gen("duckdb"),
                  "duckdb")
        assert s == d, (gen("duckdb"), s, d)


def test_feature_score_generators_on_numeric_edges(spark):
    """rank_feature (all curves) and distance_feature score text must
    agree on the numeric edge set, including negatives and NULL."""
    import math

    from harmonize_search_analyze_spark.operators.ranking import (
        distance_feature_sql,
        rank_feature_sql,
    )

    con = duckdb.connect()
    exprs = [
        rank_feature_sql("v", function="saturation", pivot=2.0, boost=3.0),
        rank_feature_sql("v", function="log", scaling_factor=1.0),
        rank_feature_sql("v", function="sigmoid", pivot=2.0, exponent=0.5),
        distance_feature_sql("abs(v - 1.0)", pivot=2.0, boost=1.5),
    ]
    for expr in exprs:
        df = spark.createDataFrame([(x,) for x in EDGE_NUMBERS], "v double")
        got_s = [r[0] for r in df.selectExpr(expr).collect()]
        for x, s in zip(EDGE_NUMBERS, got_s):
            lit = "CAST(NULL AS DOUBLE)" if x is None else repr(x)
            d = con.sql(f"SELECT {expr} FROM (SELECT {lit} AS v)").fetchall()[0][0]
            if s is not None and d is not None and math.isnan(s) and math.isnan(d):
                continue
            assert _norm(s) == _norm(d), (expr, x, s, d)


def test_batching_and_shuffle_generators_on_edge_corpus(edge_tables):
    """batch_by_length / epoch_shuffle twins over degenerate length
    distributions (all one bucket, every boundary exactly hit)."""
    spark, con = edge_tables
    from harmonize_search_analyze_spark.operators.ordering import (
        epoch_shuffle,
        epoch_shuffle_sql,
    )
    from harmonize_search_analyze_spark.operators.packing import (
        batch_by_length,
        batch_by_length_sql,
    )

    docs = spark.table("edge_docs").selectExpr(
        "doc_id", "length(text) AS n"
    )
    for bounds, bs, shards in ([1, 10, 300], 2, 2), ([5], 3, 1):
        got = sorted(
            (r.doc_id, r.batch_key, r.pos_in_batch, r.is_runt)
            for r in batch_by_length(
                docs, "doc_id", "n",
                boundaries=bounds, batch_size=bs, n_shards=shards,
            ).collect()
        )
        want = sorted(
            (r[0], r[3], r[4], r[5])
            for r in con.sql(batch_by_length_sql(
                "(SELECT doc_id, length(text) AS n FROM edge_docs)",
                "doc_id", "n",
                boundaries=bounds, batch_size=bs, n_shards=shards,
            )).fetchall()
        )
        assert got == want, (bounds, bs, shards)

    for epochs in (1, 3):
        got = sorted(
            (r.epoch, r.doc_id, r.shuffle_key, r.pos)
            for r in epoch_shuffle(
                spark.table("edge_docs").select("doc_id"), "doc_id",
                epochs=epochs, seed=3, rank=True,
            ).collect()
        )
        want = sorted(
            tuple(r) for r in con.sql(
                "SELECT epoch, doc_id, shuffle_key, pos FROM ("
                + epoch_shuffle_sql(
                    "(SELECT doc_id FROM edge_docs) t", "doc_id",
                    ["doc_id"], epochs=epochs, seed=3, rank=True,
                )
                + ")"
            ).fetchall()
        )
        assert got == want, epochs


def test_analyze_chains(spark):
    from harmonize_search_analyze_spark.functions.analyze import analyze_sql

    # tokenizers alone
    for tok in ("standard", "whitespace", "letter", "keyword"):
        _sweep(spark, analyze_sql, tokenizer=tok)
    # representative filter chains, including the boundary-heavy ones
    _sweep(spark, analyze_sql, filters=[
        "lowercase", "asciifolding", ("stop", {}), ("length", {"min": 2}),
        "unique", ("shingle", {"min_shingle_size": 2, "max_shingle_size": 3}),
    ])
    _sweep(spark, analyze_sql, filters=[
        ("edge_ngram", {"min_gram": 2, "max_gram": 5}), "uppercase",
    ])
    _sweep(spark, analyze_sql, tokenizer="whitespace", filters=[
        "trim", "reverse", ("truncate", {"length": 3}), "unique",
    ])
    _sweep(spark, analyze_sql, filters=[
        ("shingle", {"min_shingle_size": 2, "max_shingle_size": 2,
                     "output_unigrams": False}),
    ])


def test_analyze_stemmer_chain(spark):
    from harmonize_search_analyze_spark.functions.analyze import analyze_sql

    _sweep(spark, analyze_sql,
           filters=["lowercase", "stemmer_minimal_english", "unique"])


def test_highlight_fragments(spark):
    from harmonize_search_analyze_spark.operators.text import (
        highlight_fragments_sql,
    )

    _sweep(spark, highlight_fragments_sql, "a", window=5, n_fragments=3)
    _sweep(spark, highlight_fragments_sql, "one", window=10, n_fragments=2)


def test_readability_generator(spark):
    from harmonize_search_analyze_spark.operators.text import (
        readability_sql,
    )

    _sweep(spark, readability_sql)


def test_hll_generator_edge_values(spark):
    """hll_cardinality_sql over edge-case VALUE domains (empty, single,
    nulls, negatives, long strings): identical estimates both engines."""
    import duckdb as _d

    from harmonize_search_analyze_spark.functions.hashing import (
        hll_cardinality_sql,
    )

    cases = [
        [],
        ["x"],
        [None, None],
        [str(i) for i in range(500)],
        ["-1", "0", "1"] * 7,
        ["long" * 100, "long" * 100],
    ]
    for vals in cases:
        df = spark.createDataFrame(
            [(v,) for v in vals] or [(None,)], "k STRING"
        )
        df.createOrReplaceTempView("hll_t")
        got = spark.sql(
            hll_cardinality_sql("hll_t", "k", "spark")
        ).collect()[0][0]
        con = _d.connect()
        con.execute("CREATE TABLE hll_t (k VARCHAR)")
        con.executemany(
            "INSERT INTO hll_t VALUES (?)", [(v,) for v in (vals or [None])]
        )
        want = con.execute(
            hll_cardinality_sql("hll_t", "k", "duckdb")
        ).fetchone()[0]
        assert got == want, (vals[:3], got, want)


def test_term_overlap_edge_texts(spark):
    """term_overlap_sql (the rerank stand-in) over the edge corpus and
    several query shapes — including a query whose tokens collide with
    lambda-variable names (the shadowing class of bug the inline
    version had) and a column literally named ``t``."""
    from harmonize_search_analyze_spark.operators.text import (
        term_overlap_sql,
    )

    for q in ("one two", "a", "t __qtok x", "dig1ts 42", "UPPER lower"):
        got_s = _spark_eval(
            spark, term_overlap_sql(q, ["text"], "spark")
        )
        out = []
        for t in EDGE_TEXTS:
            lit = "'" + t.replace("'", "''").replace("\\", "\\\\") + "'"
            out.append(
                duckdb.sql(
                    "SELECT "
                    + term_overlap_sql(q, ["text"], "duckdb").replace(
                        "CAST(text AS VARCHAR)", f"CAST({lit} AS VARCHAR)"
                    )
                ).fetchall()[0][0]
            )
        for t, s, d in zip(EDGE_TEXTS, got_s, out):
            assert _norm(s) == _norm(d), (q, t[:40], s, d)
    # empty query raises on both construction paths
    import pytest

    with pytest.raises(ValueError, match="no tokens"):
        term_overlap_sql("!!!", ["text"], "spark")


def test_split_case_generator(spark):
    """split_case_sql (the leakage_check/assign_split label expression)
    must hash-bucket identically on both engines over the edge corpus,
    for several fraction maps."""
    from harmonize_search_analyze_spark.operators.ordering import (
        split_case_sql,
    )

    for fr in (
        {"train": 0.8, "valid": 0.1, "test": 0.1},
        {"a": 0.5, "b": 0.5},
        {"only": 1.0},
    ):
        _sweep(spark, lambda e, d, f=fr: split_case_sql(e, f, d))
