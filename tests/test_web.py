"""Web-corpus operators: HTML→text, URL normalization, registered domain.

Edge behavior + cross-engine agreement on adversarial HTML/URL corpora
(the generic text sweep in test_dual_dialect_sweep.py never produces
markup or URLs), plus plan-shape guards: the extraction layer must stay
map-only."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from harmonize_search_analyze_spark.operators.web import (
    html_to_text_sql,
    normalize_url_sql,
    registered_domain_sql,
    url_host_sql,
)

EDGE_HTML = [
    "",
    "plain text, no markup",
    "<p>simple</p>",
    "<p>unclosed <b>bold",
    "<script>if (a < b && c > d) { alert('<p>not a tag</p>') }</script>kept",
    "<SCRIPT SRC='x.js'></SCRIPT>after",
    "<style>p > a { color: red }</style>text",
    "<!-- <p>commented out</p> -->visible",
    "a &amp;lt; b",          # must decode to 'a &lt; b', NOT 'a < b'
    "&lt;script&gt;alert(1)&lt;/script&gt;",  # entity-encoded = text
    "x&nbsp;y&#39;z&quot;w",
    "<div\nclass='x'>multi\nline</div>",
    "< 5 and > 3",           # bare comparators: '< 5 and >' IS tag-shaped
    "<br><br><br>",
    "tag soup < p >< /p >",
]

EDGE_URLS = [
    "",
    "not a url",
    "http://example.com",
    "http://example.com/",
    "HTTP://EXAMPLE.COM:80/",
    "https://example.com:443",
    "https://example.com:8443/keep-port",
    "http://www.example.com/path",
    "http://wwwexample.com/",        # 'www' not followed by dot: keep
    "https://a.b.co.uk/x?b=2&a=1",
    "http://site.org/?utm_source=x&utm_medium=y",
    "http://site.org/?utm_source=x&q=1",
    "http://site.org/p?fbclid=abc#frag",
    "http://site.org/p#frag?notquery",
    "http://host/CaseSensitive/Path",
    "http://h.io/?a=1&a=1&b=",       # dup + empty-value params survive
    "ftp://files.example.net:21/pub",
]


def _duck(expr_sql: str, val: str):
    lit = "'" + val.replace("'", "''") + "'"
    return duckdb.sql("SELECT " + expr_sql.replace("__V__", lit)).fetchall()[0][0]


def _spark_batch(spark, gen, vals, *args):
    df = spark.createDataFrame([(v,) for v in vals], ["text"])
    return [r[0] for r in df.selectExpr(gen("text", "spark", *args)).collect()]


@pytest.mark.parametrize("gen", [html_to_text_sql, normalize_url_sql])
def test_cross_engine_edges(spark, gen):
    corpus = EDGE_HTML if gen is html_to_text_sql else EDGE_URLS
    got_s = _spark_batch(spark, gen, corpus)
    for v, s in zip(corpus, got_s):
        d = _duck(gen("__V__", "duckdb"), v)
        assert s == d, (gen.__name__, v, s, d)


def test_registered_domain_cross_engine(spark):
    def gen(e, dialect):
        return registered_domain_sql(url_host_sql(e, dialect), dialect)

    got_s = _spark_batch(spark, gen, EDGE_URLS)
    for v, s in zip(EDGE_URLS, got_s):
        d = _duck(gen("__V__", "duckdb"), v)
        assert s == d, (v, s, d)


def test_html_to_text_semantics(spark):
    got = _spark_batch(spark, html_to_text_sql, EDGE_HTML)
    by = dict(zip(EDGE_HTML, got))
    assert by["<p>simple</p>"] == "simple"
    # script/style bodies are REMOVED, trailing text kept
    assert by["<script>if (a < b && c > d) { alert('<p>not a tag</p>') }</script>kept"] == "kept"
    assert by["<SCRIPT SRC='x.js'></SCRIPT>after"] == "after"
    assert by["<style>p > a { color: red }</style>text"] == "text"
    # comments removed
    assert by["<!-- <p>commented out</p> -->visible"] == "visible"
    # double-decode hazard: '&amp;lt;' is the literal text '&lt;'
    assert by["a &amp;lt; b"] == "a &lt; b"
    # entity-encoded markup stays text
    assert by["&lt;script&gt;alert(1)&lt;/script&gt;"] == "<script>alert(1)</script>"
    assert by["x&nbsp;y&#39;z&quot;w"] == "x y'z\"w"
    assert by["<div\nclass='x'>multi\nline</div>"] == "multi line"
    assert by[""] == ""
    assert by["plain text, no markup"] == "plain text, no markup"


def test_normalize_url_semantics(spark):
    got = _spark_batch(spark, normalize_url_sql, EDGE_URLS)
    by = dict(zip(EDGE_URLS, got))
    assert by["http://example.com"] == "http://example.com/"
    assert by["HTTP://EXAMPLE.COM:80/"] == "http://example.com/"
    assert by["https://example.com:443"] == "https://example.com/"
    # NON-default port survives
    assert by["https://example.com:8443/keep-port"] == "https://example.com:8443/keep-port"
    assert by["http://www.example.com/path"] == "http://example.com/path"
    assert by["http://wwwexample.com/"] == "http://wwwexample.com/"
    # params sorted, tracking dropped
    assert by["https://a.b.co.uk/x?b=2&a=1"] == "https://a.b.co.uk/x?a=1&b=2"
    assert by["http://site.org/?utm_source=x&utm_medium=y"] == "http://site.org/"
    assert by["http://site.org/?utm_source=x&q=1"] == "http://site.org/?q=1"
    assert by["http://site.org/p?fbclid=abc#frag"] == "http://site.org/p"
    # everything after '#' is fragment, even a '?'
    assert by["http://site.org/p#frag?notquery"] == "http://site.org/p"
    # path case preserved
    assert by["http://host/CaseSensitive/Path"] == "http://host/CaseSensitive/Path"
    assert by["http://h.io/?a=1&a=1&b="] == "http://h.io/?a=1&a=1&b="
    assert by["ftp://files.example.net:21/pub"] == "ftp://files.example.net:21/pub"


def test_registered_domain_semantics(spark):
    hosts = [
        "example.com", "www.example.com", "a.b.example.co.uk",
        "example.gov.au", "localhost", "com", "x.y", "deep.a.b.c.net",
    ]
    df = spark.createDataFrame([(h,) for h in hosts], ["h"])
    got = dict(zip(hosts, (
        r[0] for r in df.selectExpr(registered_domain_sql("h", "spark")).collect()
    )))
    assert got["example.com"] == "example.com"
    assert got["www.example.com"] == "example.com"
    assert got["a.b.example.co.uk"] == "example.co.uk"
    assert got["example.gov.au"] == "example.gov.au"
    assert got["localhost"] == ""      # single label: no registered domain
    assert got["com"] == ""
    assert got["x.y"] == "x.y"
    assert got["deep.a.b.c.net"] == "c.net"


def _plan(df) -> str:
    """Executed plan text, FINAL plan only (same helper as
    test_plan_shapes — AQE prints the initial plan too)."""
    full = df._jdf.queryExecution().executedPlan().toString()
    return full.split("== Initial Plan ==")[0]


def test_extraction_is_map_only(spark):
    """html_to_text + normalize_url + registered_domain over a scan must
    not exchange, and must stay off the Python worker path."""
    df = spark.createDataFrame(
        [("<p>x</p>", "http://www.a.com:80/?utm_source=1&b=2")] * 10,
        ["html", "url"],
    )
    out = df.selectExpr(
        html_to_text_sql("html", "spark") + " AS text",
        normalize_url_sql("url", "spark") + " AS url_n",
        registered_domain_sql(url_host_sql("url", "spark"), "spark")
        + " AS domain",
    )
    out.count()
    plan = _plan(out)
    assert "Exchange" not in plan, plan
    assert "Python" not in plan, plan


def test_ip_prefix_single_exchange(spark):
    from harmonize_search_analyze_spark.operators.aggregations import (
        ip_prefix_agg,
    )

    df = spark.createDataFrame(
        [(f"10.0.{i % 4}.{i % 200}",) for i in range(100)], ["ip"]
    )
    out = ip_prefix_agg(df, "ip", prefix_length=20)
    out.count()
    plan = _plan(out)
    # one agg exchange + the global sort for the ordered output
    assert plan.count("Exchange hashpartitioning") == 1, plan
    rows = {r["prefix"]: r["doc_count"] for r in out.collect()}
    assert rows == {"10.0.0.0/20": 100}
    out28 = ip_prefix_agg(df, "ip", prefix_length=28)
    got = {r["prefix"]: r["doc_count"] for r in out28.collect()}
    assert sum(got.values()) == 100
    assert all(k.endswith("/28") for k in got)


def test_bucket_script_no_extra_exchange(spark):
    from harmonize_search_analyze_spark.operators.aggregations import (
        bucket_script,
    )

    df = spark.createDataFrame(
        [(i % 5, float(i)) for i in range(100)], ["k", "v"]
    )
    buckets = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("s")
    )
    out = bucket_script(buckets, {"ratio": "s / cnt"})
    out.count()
    buckets.count()
    assert _plan(out).count("Exchange") == _plan(buckets).count("Exchange")
    row = {r["k"]: r["ratio"] for r in out.collect()}
    assert row[0] == pytest.approx(sum(range(0, 100, 5)) / 20, abs=1e-6)


def test_intra_doc_dedup_map_only(spark):
    """The within-doc dedup must be a pure projection — no exchange, no
    Python stage (it precedes the corpus-level passes precisely to avoid
    shuffle load)."""
    from harmonize_search_analyze_spark.operators.dedup import (
        intra_doc_dedup,
    )

    df = spark.createDataFrame(
        [(i, "para one is long\npara one is long\nzz") for i in range(20)],
        ["doc_id", "text"],
    )
    out = intra_doc_dedup(df, "doc_id", "text")
    out.count()
    plan = _plan(out)
    assert "Exchange" not in plan, plan
    assert "Python" not in plan, plan
    row = out.first()
    assert row["text_dedup"] == "para one is long\nzz"
    assert row["n_dropped"] == 1


def test_review_fixes_null_userinfo_and_clamp(spark):
    """Round-3 session-4 review regressions: (1) NULL url → NULL in BOTH
    engines (DuckDB concat would skip NULLs and mint '://'); (2) userinfo
    never reaches the host/domain ('http://example.com@evil.io/' resolves
    to evil.io); (3) hex key is NULL for NULL coordinates in both
    engines; (4) out-of-range coordinates pin to edge geohash cells
    instead of sign-aliasing onto interior cells."""
    import duckdb

    from harmonize_search_analyze_spark.functions.geohash import (
        geohash_encode_sql,
        hex_key_sql,
    )

    urls = [None, "http://alice@example.com/x", "http://example.com@evil.io/x"]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    s_norm = [r[0] for r in df.selectExpr(
        normalize_url_sql("url", "spark")).collect()]
    s_dom = [r[0] for r in df.selectExpr(
        registered_domain_sql(url_host_sql("url", "spark"), "spark")
    ).collect()]
    con = duckdb.connect()
    con.sql("CREATE TABLE u(url VARCHAR)")
    con.executemany("INSERT INTO u VALUES (?)", [(u,) for u in urls])
    d_norm = [r[0] for r in con.sql(
        f"SELECT {normalize_url_sql('url', 'duckdb')} FROM u").fetchall()]
    d_dom = [r[0] for r in con.sql(
        "SELECT "
        + registered_domain_sql(url_host_sql("url", "duckdb"), "duckdb")
        + " FROM u").fetchall()]
    assert s_norm == d_norm == [
        None, "http://example.com/x", "http://evil.io/x"]
    assert s_dom == d_dom == [None, "example.com", "evil.io"]

    hk = hex_key_sql("lat", "lon", 5.0)
    pts = spark.createDataFrame([(None, None), (0.0, 0.0)],
                                "lat double, lon double")
    s_hex = [r[0] for r in pts.selectExpr(hk).collect()]
    d_hex = [r[0] for r in duckdb.sql(
        f"SELECT {hk} FROM (VALUES (CAST(NULL AS DOUBLE), CAST(NULL AS "
        "DOUBLE)), (0.0, 0.0)) t(lat, lon)").fetchall()]
    assert s_hex == d_hex == [None, "0:0"]

    # out-of-range lon pins to the edge cell, same as the legal extreme
    gh_bad = spark.sql(
        f"SELECT {geohash_encode_sql('10.0', '-180.5', 5)} AS g").collect()[0][0]
    gh_edge = spark.sql(
        f"SELECT {geohash_encode_sql('10.0', '-180.0', 5)} AS g").collect()[0][0]
    assert gh_bad == gh_edge


def test_nb_classifier_one_class_raises(spark):
    """One-class label proxies must fail loudly in-plan, not silently
    NULL out (Spark) or diverge from the oracle (DuckDB)."""
    import duckdb
    import pytest as _pytest

    from harmonize_search_analyze_spark.operators.classifier import (
        nb_quality_classifier,
        nb_quality_oracle_sql,
    )

    docs = spark.createDataFrame(
        [(0, "all same class", "good"), (1, "still same", "good")],
        ["doc_id", "text", "source"],
    )
    with _pytest.raises(Exception, match="one class"):
        nb_quality_classifier(docs, "source = 'good'").collect()
    con = duckdb.connect()
    con.sql("CREATE TABLE documents(doc_id BIGINT, text VARCHAR, source VARCHAR)")
    con.sql("INSERT INTO documents VALUES (0, 'all same class', 'good'),"
            " (1, 'still same', 'good')")
    with _pytest.raises(Exception, match="one class"):
        con.sql(nb_quality_oracle_sql("documents", "source = 'good'")).fetchall()
