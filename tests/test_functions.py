"""Function-layer tests: geohash against published vectors, the pinned
.split tokenization, the engine-portable hash, and MinHash parameter family
determinism — each verified identical on Spark and DuckDB where dual-dialect.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from harmonize_search_analyze_spark.functions.geohash import (
    geohash_encode,
    geohash_encode_sql,
)
from harmonize_search_analyze_spark.functions.hashing import (
    MERSENNE_P,
    hash64_sql,
    minhash_params,
    minhash_term_sql,
)
from harmonize_search_analyze_spark.functions.tokenize import (
    phrase_prefix_regex,
    split_tokens,
)

# Published geohash test vectors (public geohash spec / geohash.org examples).
GEOHASH_VECTORS = [
    (42.605, -5.603, 5, "ezs42"),
    (57.64911, 10.40744, 11, "u4pruydqqvj"),
    (39.2880, -76.6200, 6, None),      # self-consistency only
    (0.0, 0.0, 1, "s"),
    (-90.0, -180.0, 4, "0000"),
    (89.999999, 179.999999, 4, "zzzz"),
]


@pytest.mark.parametrize("lat,lon,prec,expect", GEOHASH_VECTORS)
def test_geohash_vectors_spark(spark, lat, lon, prec, expect):
    df = spark.createDataFrame([(lat, lon)], ["lat", "lon"])
    got = df.select(
        geohash_encode("lat", "lon", prec).alias("gh")
    ).collect()[0]["gh"]
    if expect is not None:
        assert got == expect
    assert len(got) == prec


@pytest.mark.parametrize("lat,lon,prec,expect", GEOHASH_VECTORS)
def test_geohash_spark_duckdb_identical(spark, lat, lon, prec, expect):
    sql = geohash_encode_sql(str(lat), str(lon), prec)
    duck = duckdb.sql(f"SELECT {sql} AS gh").fetchone()[0]
    df = spark.range(1).select(F.expr(sql).alias("gh"))
    assert df.collect()[0]["gh"] == duck


def test_geohash_boundary_clamp(spark):
    # lat=90 / lon=180 must stay in the top cell, not overflow
    df = spark.createDataFrame([(90.0, 180.0)], ["lat", "lon"])
    got = df.select(geohash_encode("lat", "lon", 4).alias("gh")).collect()[0]["gh"]
    assert got == "zzzz"


def test_geohash_precision_bounds():
    with pytest.raises(ValueError):
        geohash_encode_sql("0", "0", 0)
    with pytest.raises(ValueError):
        geohash_encode_sql("0", "0", 13)


# -- tokenize ---------------------------------------------------------------

def test_split_tokens(spark):
    df = spark.createDataFrame(
        [("PROMO Burnished-COPPER  12x",), ("",), (None,)], ["v"]
    )
    got = df.select(split_tokens("v").alias("t")).collect()
    assert got[0]["t"] == ["promo", "burnished", "copper", "12x"]
    assert got[1]["t"] == []
    assert got[2]["t"] is None


def test_phrase_prefix_regex_shapes():
    # single word -> boundary + prefix
    assert phrase_prefix_regex("bur") == "(^|[^a-z0-9])bur"
    # multi word: full tokens then prefix, separated by non-alnum runs
    assert phrase_prefix_regex("promo bur") == (
        "(^|[^a-z0-9])promo[^a-z0-9]+bur"
    )
    # empty input -> match-all sentinel
    assert phrase_prefix_regex("") == ""
    assert phrase_prefix_regex("--") == ""
    # regex metacharacters in input are escaped
    assert "\\" in phrase_prefix_regex("c++ x") or "c" in phrase_prefix_regex("c++ x")


def test_phrase_prefix_duckdb_parity(spark):
    values = ["PROMO BURNISHED COPPER", "prom burnished", "XPROMO BUR",
              "promo-burnished!", "The promo", None]
    pattern = phrase_prefix_regex("promo bur")
    df = spark.createDataFrame([(v,) for v in values], ["v"])
    spark_hits = sorted(
        r["v"] for r in df.where(F.lower(F.col("v")).rlike(pattern)).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in values])
    duck_hits = sorted(
        r[0] for r in con.execute(
            f"SELECT v FROM t WHERE regexp_matches(LOWER(v), '{pattern}')"
        ).fetchall()
    )
    assert spark_hits == duck_hits == ["PROMO BURNISHED COPPER", "promo-burnished!"]


# -- hashing ----------------------------------------------------------------

def test_hash64_spark_duckdb_identical(spark):
    vals = ["", "a", "hello world", "PROMO", "ünïcode", "0", "x" * 500]
    df = spark.createDataFrame([(v,) for v in vals], ["s"])
    spark_h = [
        r["h"] for r in
        df.select(F.expr(hash64_sql("s", "spark")).alias("h")).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    duck_h = [
        r[0] for r in con.execute(
            f"SELECT {hash64_sql('s', 'duckdb')} FROM t"
        ).fetchall()
    ]
    assert spark_h == duck_h
    assert all(0 <= h < (1 << 60) for h in spark_h)


def test_minhash_params_deterministic():
    p1 = minhash_params(8, seed=42)
    p2 = minhash_params(8, seed=42)
    assert p1 == p2
    assert len(set(p1)) == 8
    for a, b in p1:
        assert 1 <= a < MERSENNE_P
        assert 0 <= b < MERSENNE_P
    assert minhash_params(8, seed=7) != p1


def test_minhash_term_int64_safe(spark):
    # worst case: h mod P = P-1, a = P-1 -> product < 2^62, no overflow
    a, b = MERSENNE_P - 1, MERSENNE_P - 1
    expr = minhash_term_sql(str((1 << 60) - 1), a, b)
    got = spark.range(1).select(F.expr(expr).alias("v")).collect()[0]["v"]
    assert 0 <= got < MERSENNE_P
    duck = duckdb.sql(f"SELECT {expr} AS v").fetchone()[0]
    assert got == duck


@pytest.mark.slow
def test_geohash_column_native_matches_sql(spark):
    """Column-native encode (Spark-Connect-safe path, no _jc access) must be
    bit-identical to the SQL generator on the published vectors and a grid
    of random-ish points."""
    pts = [(lat, lon, prec, exp) for lat, lon, prec, exp in GEOHASH_VECTORS]
    pts += [(37.5 - 0.73 * i, -122.3 + 1.31 * i, 1 + i % 12, None)
            for i in range(24)]
    df = spark.createDataFrame(
        [(la, lo, pr) for la, lo, pr, _ in pts], ["lat", "lon", "prec"]
    )
    for prec in sorted({pr for _, _, pr, _ in pts}):
        sub = df.where(F.col("prec") == prec)
        got = sub.select(
            geohash_encode(F.col("lat"), F.col("lon"), prec).alias("native"),
            geohash_encode("lat", "lon", prec).alias("sqlpath"),
        ).collect()
        for r in got:
            assert r["native"] == r["sqlpath"]


def test_geohash_placeholder_collision_rejected():
    with pytest.raises(ValueError, match="__GH_X__"):
        geohash_encode_sql("__GH_X__ + 1", "0", 2)


def test_geohash_expression_with_parens_y(spark):
    """ADVICE r1: an input expression containing the literal text '(y)' must
    not be corrupted by the substitution."""
    df = spark.createDataFrame([(42.605, -5.603)], ["y", "lon"])
    got = df.select(
        F.expr(geohash_encode_sql("(y)", "(lon)", 5)).alias("gh")
    ).collect()[0]["gh"]
    assert got == "ezs42"


def test_auto_precision_table():
    from harmonize_search_analyze_spark.functions.geohash import (
        auto_precision,
    )

    assert auto_precision(1) == 2
    assert auto_precision(10) == 6
    assert auto_precision(18) == 12
    assert auto_precision(0) == 2      # clamps low
    assert auto_precision(25) == 12    # clamps high
    # monotone non-decreasing across the whole table
    vals = [auto_precision(z) for z in range(1, 19)]
    assert vals == sorted(vals)


def test_geohash_grid_zoom(spark):
    from harmonize_search_analyze_spark.operators.aggregations import (
        geohash_grid,
    )

    df = spark.createDataFrame([(42.605, -5.603)], ["la", "lo"])
    out = geohash_grid(df, "la", "lo", zoom=8)   # zoom 8 -> precision 5
    rows = out.collect()
    assert rows[0]["geohash"] == "ezs42"


def test_highlight_snippet(spark):
    from harmonize_search_analyze_spark.operators.text import highlight

    df = spark.createDataFrame(
        [
            (1, "the quick brown Fox jumps over the lazy dog"),
            (2, "no such animal here"),
        ],
        ["id", "t"],
    )
    rows = {r["id"]: r["s"] for r in df.select(
        "id", highlight("t", "fox", window=6).alias("s")
    ).collect()}
    # case-insensitive first hit, original casing preserved, 6-char context
    assert rows[1] == "brown <em>Fox</em> jumps"
    assert rows[2] is None


def test_highlight_start_of_string(spark):
    from harmonize_search_analyze_spark.operators.text import highlight

    df = spark.createDataFrame([("fox at the front",)], ["t"])
    got = df.select(highlight("t", "fox", window=10).alias("s")).collect()[0]["s"]
    assert got == "<em>fox</em> at the fr"


def test_ngrams_and_vocab(spark):
    from harmonize_search_analyze_spark.operators.text import (
        ngram_counts,
        vocab_build,
    )

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b"), (3, "a"), (4, "x")], ["id", "text"]
    )
    grams = {r["ngram"]: r["occurrences"]
             for r in ngram_counts(df, "text", n=2, k=10).collect()}
    # doc 3 and 4 are shorter than n -> contribute no bigrams
    assert grams == {"a b": 2, "b c": 1}
    vocab = vocab_build(df, "text", k=2).collect()
    assert [(r["token"], r["occurrences"]) for r in vocab] == [("a", 3), ("b", 2)]
    # 7 total occurrences: cumulative coverage 3/7 then 5/7
    assert vocab[0]["cum_coverage"] == round(3 / 7, 6)
    assert vocab[1]["cum_coverage"] == round(5 / 7, 6)


@pytest.mark.slow
def test_bpe_train_textbook_merges(spark):
    """The Sennrich et al. example shape: 'low/lower/newer'-style corpus
    learns 'lo'+'w' and 'e'+'r' style merges, deterministically."""
    from harmonize_search_analyze_spark.operators.bpe import (
        bpe_encode,
        bpe_train,
    )

    df = spark.createDataFrame(
        [(1, "low lower lowest low low newer new"),
         (2, "low lower newest new new")],
        ["doc_id", "text"],
    )
    merges = bpe_train(df, n_merges=5)
    assert merges[0] == ("l", "o")        # most frequent pair first
    assert merges[1] == ("lo", "w")       # builds on the prior merge
    assert bpe_train(df, n_merges=5) == merges  # deterministic
    enc = {r["doc_id"]: r for r in bpe_encode(df, merges).collect()}
    # 'low' as a full word compresses into at most 2 symbols (low + </w>)
    assert "low" in enc[1]["bpe_tokens"] or "low</w>" in enc[1]["bpe_tokens"]
    assert enc[1]["n_bpe_tokens"] == len(enc[1]["bpe_tokens"])


def test_bpe_encode_empty_and_null(spark):
    from harmonize_search_analyze_spark.operators.bpe import bpe_encode

    df = spark.createDataFrame(
        [(1, ""), (2, None)], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in bpe_encode(df, [("a", "b")]).collect()}
    assert rows[1]["bpe_tokens"] == [] and rows[1]["n_bpe_tokens"] == 0
    assert rows[2]["bpe_tokens"] == []


@pytest.mark.slow
def test_bpe_local_and_distributed_loops_agree(spark):
    from harmonize_search_analyze_spark.operators.bpe import bpe_train

    df = spark.createDataFrame(
        [(1, "low lower lowest low low newer new"),
         (2, "low lower newest new new wider wide")],
        ["doc_id", "text"],
    )
    local = bpe_train(df, n_merges=6)                       # driver loop
    dist = bpe_train(df, n_merges=6, driver_threshold=0)    # forced Spark loop
    assert local == dist


def _hex_ref(lat, lon, s):
    """Independent Python cube-round reference (Amit Patel's axial math)."""
    qf = (0.5773502691896258 * lon - 0.3333333333333333 * lat) / s
    rf = (0.6666666666666666 * lat) / s
    yf = -qf - rf
    import math

    rq, ry, rr = (math.floor(v + 0.5) for v in (qf, yf, rf))
    dq, dy, dr = abs(rq - qf), abs(ry - yf), abs(rr - rf)
    if dq > dy and dq > dr:
        rq = -ry - rr
    elif dy > dr:
        pass  # fixing y does not change (q, r)
    else:
        rr = -rq - ry
    return rq, rr


def test_hex_qr_matches_reference_and_duckdb(spark):
    """hex_qr_sql vs an independent Python cube-round on a deterministic
    point cloud, AND Spark-vs-DuckDB on the same expression text."""
    import duckdb

    from harmonize_search_analyze_spark.functions.geohash import hex_qr_sql

    pts = [((i * 37 % 1700) / 10.0 - 85.0, (i * 91 % 3600) / 10.0 - 180.0)
           for i in range(300)]
    df = spark.createDataFrame(pts, ["lat", "lon"])
    q, r = hex_qr_sql("lat", "lon", 5.0)
    got = df.selectExpr("lat", "lon", f"{q} AS q", f"{r} AS r").collect()
    for row in got:
        assert (row["q"], row["r"]) == _hex_ref(row["lat"], row["lon"], 5.0), row
    con = duckdb.connect()
    con.sql("CREATE TABLE pts(lat DOUBLE, lon DOUBLE)")
    con.executemany("INSERT INTO pts VALUES (?, ?)", pts)
    duck = con.sql(f"SELECT {q} AS q, {r} AS r FROM pts").fetchall()
    for (lat, lon), (dq_, dr_) in zip(pts, duck):
        assert (dq_, dr_) == _hex_ref(lat, lon, 5.0), (lat, lon)


def test_hex_cell_containment(spark):
    """Every point must land in the hex cell whose center is nearest in
    the hex grid's own metric: distance from point to assigned center
    <= circumradius (cube rounding's defining property)."""
    from harmonize_search_analyze_spark.functions.geohash import (
        hex_center_sql,
        hex_qr_sql,
    )

    s = 5.0
    pts = [((i * 53 % 1700) / 10.0 - 85.0, (i * 17 % 3600) / 10.0 - 180.0)
           for i in range(200)]
    df = spark.createDataFrame(pts, ["lat", "lon"])
    q, r = hex_qr_sql("lat", "lon", s)
    clon, clat = hex_center_sql(s)
    rows = df.selectExpr(
        "lat", "lon", f"{q} AS q", f"{r} AS r"
    ).selectExpr("lat", "lon", f"{clon} AS clon", f"{clat} AS clat").collect()
    for row in rows:
        d = ((row["lon"] - row["clon"]) ** 2 + (row["lat"] - row["clat"]) ** 2) ** 0.5
        assert d <= s + 1e-6, (row, d)
