"""Curation operators: C4 cleaning / line filter semantics on constructed
dirty text, Gopher repetition signals on planted boilerplate."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from harmonize_search_analyze_spark.operators.curation import (
    c4_filter_lines,
    c4_line_filter_sql,
    clean_text,
    clean_text_sql,
    repetition_signals,
)

DIRTY = (
    "Visit https://example.com/page?q=1 for   more.\n"
    "Contact bob.smith+tag@mail.example.org   today!"
)


def test_clean_text_strips_urls_emails_whitespace(spark):
    df = spark.createDataFrame([(DIRTY,)], ["text"])
    got = df.select(clean_text("text").alias("c")).collect()[0]["c"]
    assert got == "Visit for more. Contact today!"
    # DuckDB oracle produces the identical string (incl. the 'g' flag fix)
    duck = duckdb.sql(
        f"SELECT {clean_text_sql('t', 'duckdb')} AS c "
        f"FROM (SELECT ?::VARCHAR AS t)", params=[DIRTY]
    ).fetchone()[0]
    assert duck == got


LINES = (
    'A proper sentence with enough words here.\n'
    'short.\n'
    'no terminal punctuation at all\n'
    'This page uses cookies to track you.\n'
    'Another good line stays in the corpus!\n'
    'Lorem Ipsum dolor sit amet etc.'
)


def test_c4_line_filter(spark):
    df = spark.createDataFrame([(LINES,)], ["text"])
    got = df.select(
        c4_filter_lines("text", min_words=4).alias("c")
    ).collect()[0]["c"]
    kept = got.split("\n")
    assert kept == [
        "A proper sentence with enough words here.",
        "Another good line stays in the corpus!",
    ]
    duck = duckdb.sql(
        f"SELECT {c4_line_filter_sql('t', 'duckdb', min_words=4)} AS c "
        f"FROM (SELECT ?::VARCHAR AS t)", params=[LINES]
    ).fetchone()[0]
    assert duck == got


def test_repetition_signals_token_and_line(spark):
    rows = [
        (1, "alpha beta gamma delta"),            # no repetition
        (2, "spam spam spam spam eggs"),          # heavy token repetition
        (3, "a. b. a. b.\na. b. a. b.\nunique"),  # duplicate lines
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    tok = {r["doc_id"]: r for r in
           repetition_signals(df, "doc_id", "text", unit="token").collect()}
    assert tok[1]["dup_frac"] == 0.0 and tok[1]["top_share"] == 0.25
    assert tok[2]["n_units"] == 5 and tok[2]["distinct_units"] == 2
    assert tok[2]["dup_frac"] == 0.6 and tok[2]["top_share"] == 0.8

    line = {r["doc_id"]: r for r in
            repetition_signals(df, "doc_id", "text", unit="line").collect()}
    assert line[3]["n_units"] == 3 and line[3]["distinct_units"] == 2
    assert line[3]["top_share"] == pytest.approx(2 / 3, abs=1e-6)
    assert line[1]["dup_frac"] == 0.0

    with pytest.raises(ValueError):
        repetition_signals(df, "doc_id", "text", unit="char")


def test_pii_scan_hand_cases(spark):
    """Known PII strings: counts per family, redaction placeholders, and
    the SSN-before-phone ordering on the ambiguous 3-2-4 shape."""
    from harmonize_search_analyze_spark.operators.curation import (
        pii_scan,
        redact_pii_sql,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@example.org or call 555-123-4567"),
            (2, "ssn 123-45-6789 from host 10.0.0.1"),
            (3, "clean prose with no identifiers at all"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in pii_scan(docs).collect()}
    assert (out[1]["n_emails"], out[1]["n_phones"]) == (1, 1)
    assert out[1]["has_pii"] and not out[3]["has_pii"]
    assert (out[2]["n_ssns"], out[2]["n_ips"], out[2]["n_phones"]) == (1, 1, 0)
    red = {r["doc_id"]: r["red"] for r in docs.select(
        "doc_id", F.expr(redact_pii_sql("text", "spark")).alias("red")
    ).collect()}
    assert red[1] == "mail me at [EMAIL] or call [PHONE]"
    assert red[2] == "ssn [SSN] from host [IP]"
    assert red[3] == docs.where("doc_id = 3").collect()[0]["text"]


def test_corpus_profile_datasheet(spark):
    from harmonize_search_analyze_spark.operators.curation import (
        corpus_profile,
    )

    df = spark.createDataFrame(
        [
            (1, "alpha beta", "en"),
            (2, "alpha beta", "en"),      # exact dup of 1
            (3, "gamma", "fr"),
            (4, None, "en"),              # null text excluded everywhere
        ],
        ["doc_id", "text", "lang"],
    )
    r = corpus_profile(df, "text", "lang").collect()[0]
    assert r["n_docs"] == 3
    assert r["n_tokens"] == 5
    assert r["top_lang"] == "en" and r["top_lang_docs"] == 2
    assert r["n_unique"] == 2
    assert r["dup_rate"] == round(1 / 3, 6)


def test_nb_classifier_separable_corpus(spark):
    """NB quality classifier: on a lexically separable corpus the learned
    log-odds must classify both classes correctly, and logit must be the
    prior plus the token weight sum (spot-checked on a 1-token doc)."""
    import math

    from harmonize_search_analyze_spark.operators.classifier import (
        nb_quality_classifier,
    )

    rows = (
        [(i, "clean prose sentence structure", "good") for i in range(10)]
        + [(i + 10, "spam click buy now", "bad") for i in range(20)]
        + [(30, "clean", "good")]
    )
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {r["doc_id"]: r for r in
           nb_quality_classifier(docs, "source = 'good'").collect()}
    assert all(out[i]["pred_quality"] for i in range(10))
    assert not any(out[i + 10]["pred_quality"] for i in range(20))
    # closed-form check for the single-token doc: prior ln(11/20) +
    # w('clean') with c1=11, c0=0, n1=41, n0=80, v=8, alpha=1
    expect = math.log(11 / 20) + (
        math.log((11 + 1) / (41 + 8)) - math.log((0 + 1) / (80 + 8))
    )
    assert out[30]["logit"] == round(expect, 6)


def test_nb_classifier_plan_shape(spark):
    """Train+score stays on the lm_score profile: tok-keyed exchanges +
    one doc-keyed exchange, broadcast totals, zero Python stages."""
    from harmonize_search_analyze_spark.operators.classifier import (
        nb_quality_classifier,
    )

    rows = [(i, f"w{i % 7} common text", "src" + str(i % 3))
            for i in range(100)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = nb_quality_classifier(docs, "source = 'src0'")
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert "Python" not in plan, plan
    assert "BroadcastExchange" in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 4, plan


def test_nb_classifier_null_label_pinned(spark):
    """NULL proxy labels are class 0 in BOTH the engine and the oracle
    (the coalesce pin) — counts must match a hand computation."""
    import duckdb

    from harmonize_search_analyze_spark.operators.classifier import (
        nb_quality_classifier,
        nb_quality_oracle_sql,
    )

    rows = [
        (0, "good prose text", "good"),
        (1, "spam words here", None),
        (2, "spam words here", "bad"),
        (3, "good prose text", "good"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got_s = sorted(
        (r["doc_id"], r["logit"], r["pred_quality"])
        for r in nb_quality_classifier(docs, "source = 'good'").collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR, source VARCHAR)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)
    got_d = sorted(
        (i, lg, bool(p)) for i, _, lg, p in
        con.sql(nb_quality_oracle_sql("documents", "source = 'good'"))
        .fetchall()
    )
    assert got_s == got_d


def test_script_profile_multilingual(spark):
    """Per-script ratios on known multilingual strings; dominant
    resolves ties in SCRIPT_NAMES priority order (latin first);
    all-space text -> all ratios 0."""
    from harmonize_search_analyze_spark.operators.text import (
        script_profile,
    )

    df = spark.createDataFrame(
        [
            (1, "Hello world"),
            (2, "мир"),
            (3, "世界你好"),
            (4, "مرحبا"),
            (5, "ab 12"),        # latin 2, digit 2 -> tie -> latin
            (6, "   "),
        ],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in script_profile(df).collect()}
    assert got[1].latin == 1.0 and got[1].dominant == "latin"
    assert got[2].cyrillic == 1.0 and got[2].dominant == "cyrillic"
    assert got[3].han == 1.0 and got[3].dominant == "han"
    assert got[4].arabic == 1.0 and got[4].dominant == "arabic"
    assert got[5].latin == 0.5 and got[5].digit == 0.5
    assert got[5].dominant == "latin"  # tie -> priority order
    assert got[6].latin == 0.0 and got[6].dominant == "latin"


def test_tokenizer_fertility_exact(spark):
    """Hand-computed fertility on a tiny corpus: 'hello world' = 2
    words, pieces ceil(5/4)+ceil(5/4)=4, 11 chars; empty-token docs
    yield NULL ratios via try_divide, not a crash."""
    from harmonize_search_analyze_spark.operators.text import (
        tokenizer_fertility,
    )

    df = spark.createDataFrame(
        [("a", "hello world"), ("a", "hi"), ("b", "!!!")],
        ["source", "text"],
    )
    got = {r.source: r for r in tokenizer_fertility(df).collect()}
    a = got["a"]
    # words: 2 + 1; pieces: (2+2) + 1; chars: 11 + 2
    assert (a.n_docs, a.n_words, a.n_pieces, a.n_chars) == (2, 3, 5, 13)
    assert a.fertility == round(5 / 3, 6)
    assert a.chars_per_piece == round(13 / 5, 6)
    b = got["b"]  # punctuation-only: 0 words, 1 punct-run piece
    assert (b.n_words, b.n_pieces) == (0, 1)
    assert b.fertility is None


def test_k_anonymity_summary(spark):
    from harmonize_search_analyze_spark.operators.curation import (
        k_anonymity,
    )

    rows = (
        [("a", 1, "s1")] * 5          # class (a,1): size 5, 1 sensitive
        + [("a", 2, "s1"), ("a", 2, "s2")]   # size 2: k-violating, l=2
        + [("b", 1, "s3")]                   # size 1: violating, l=1
    )
    df = spark.createDataFrame(rows, ["q1", "q2", "sens"])
    r = k_anonymity(
        df, ["q1", "q2"], k=5, sensitive_col="sens", l=2
    ).collect()[0]
    assert r["n_rows"] == 8 and r["n_classes"] == 3
    assert r["min_class_size"] == 1
    assert r["violating_classes"] == 2 and r["violating_rows"] == 3
    assert r["violating_fraction"] == 0.375
    assert r["k_anonymous"] is False
    # class (a,1) has l=1 < 2, class (b,1) l=1 -> 2 violators
    assert r["min_l"] == 1 and r["l_violating_classes"] == 2
    assert r["l_diverse"] is False


def test_k_anonymity_nulls_group_as_values(spark):
    from harmonize_search_analyze_spark.operators.curation import (
        k_anonymity,
    )

    rows = [(None, "x"), (None, "y"), ("a", "x")]
    df = spark.createDataFrame(rows, "q1 string, sens string")
    r = k_anonymity(df, ["q1"], k=2, sensitive_col="sens").collect()[0]
    # NULL quasi forms its own class of 2; 'a' violates
    assert r["n_classes"] == 2 and r["violating_classes"] == 1
    assert r["min_l"] == 1  # the 'a' class has one sensitive value


def test_k_anonymity_sql_matches_dataframe(spark):
    import duckdb

    from harmonize_search_analyze_spark.operators.curation import (
        k_anonymity, k_anonymity_sql,
    )

    rows = [(i % 7, (i * i) % 5, f"s{i % 3}") for i in range(100)]
    df_row = k_anonymity(
        spark.createDataFrame(rows, ["q1", "q2", "sens"]),
        ["q1", "q2"], k=4, sensitive_col="sens", l=3,
    ).collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (q1 INT, q2 INT, sens VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?,?,?)", rows)
    want = con.execute(k_anonymity_sql(
        "t", ["q1", "q2"], "duckdb", k=4, sensitive_expr="sens", l=3,
    )).fetchall()[0]
    assert tuple(df_row) == want


def test_compression_ratio_orders_repetitiveness(spark):
    from harmonize_search_analyze_spark.operators.curation import (
        compression_ratio,
    )

    rows = [
        (1, "spam " * 200),                     # highly repetitive
        (2, " ".join(f"w{i * 37 % 9973}x{i}" for i in range(200))),
        (3, None),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in compression_ratio(df, "text").collect()}
    assert out[1]["ratio"] < 0.1               # template text crushes
    assert out[2]["ratio"] > 0.3               # varied text doesn't
    assert out[3]["ratio"] is None and out[4]["ratio"] is None
    assert out[2]["n_bytes"] > out[2]["n_compressed"]


def test_compression_ratio_filter_form_and_determinism(spark):
    from harmonize_search_analyze_spark.operators.curation import (
        compression_ratio,
    )

    rows = [(i, ("abc " * (i + 1)) + f"tail{i}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = compression_ratio(df, "text", max_ratio=0.5)
    assert kept.count() < 20
    a = compression_ratio(df, "text").collect()
    b = compression_ratio(df.repartition(5), "text").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
