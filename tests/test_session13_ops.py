"""Round-10 additions, shipped INSIDE the round-10 driver window.

Multimodal driver gate (VERDICT r9 next-round #2): `image_near_dup` /
`audio_near_dup` synthesize REAL PNG / PCM-WAV bytes in-plan whose decoded
content is pure hash arithmetic of doc_id, run the production perceptual-
sketch banded near-dup pipelines, and are pinned by a DuckDB twin that
recomputes the sketch in pure SQL (codec losslessness makes
decode(encode(x)) == x, so dhash / energy-delta comparisons reduce to
integer comparisons).

Tests: hand-computed construction pins, codec roundtrips, Python-vs-SQL
sketch equality on both dialects, and end-to-end Spark-vs-brute pair
recall.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from harmonize_search_analyze_spark.functions.png import png_encode
from harmonize_search_analyze_spark.operators.multimodal import (
    GATE_IMG_H,
    GATE_IMG_W,
    GATE_WAV_SAMPLES,
    _gate_wav_bytes,
    audio_fingerprint64,
    decode_image,
    decode_wav_pcm,
    gate_media_synth,
    gate_pixels,
    gate_samples,
    gate_seed,
    gate_sketch_sql,
    phash64,
)


def _img_sketch(doc_id: int) -> int:
    px = np.asarray(gate_pixels(doc_id), dtype=np.uint8)
    payload = png_encode(px.reshape(GATE_IMG_H, GATE_IMG_W, 1))
    return phash64(decode_image(payload), "dhash")


def _aud_sketch(doc_id: int) -> int:
    samples, rate, n_ch = decode_wav_pcm(_gate_wav_bytes(gate_samples(doc_id)))
    return audio_fingerprint64(samples, rate, n_ch)


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


# -- construction pins --------------------------------------------------------


def test_gate_seed_clusters():
    # run of four consecutive ids whose (id DIV 4) % 25 == 0 share a seed
    assert gate_seed(0) == gate_seed(3) == "c0"
    assert gate_seed(100) == gate_seed(103) == "c25"
    # everything else is unique
    assert gate_seed(4) == "u4"
    assert gate_seed(5) == "u5"
    assert gate_seed(99) == "u99"


def test_gate_pixels_perturbation_hand_computed():
    # doc 0 and doc 1 share seed c0; they differ ONLY at their perturbed
    # COLUMN-0 positions ((0 % 8) * 9 = 0 and (1 % 8) * 9 = 9) by the
    # documented deltas mod 256 — column 0 so each member can flip at
    # most ONE dhash bit (pairs stay inside the 16-bit-band geometry)
    p0, p1 = gate_pixels(0), gate_pixels(1)
    diff = [k for k in range(72) if p0[k] != p1[k]]
    assert diff == [0, 9]
    base = gate_pixels(4)  # unique seed, sanity: 72 values in [0, 256)
    assert len(base) == 72 and all(0 <= v < 256 for v in base)
    # delta applied at k* only: recompute doc 0's base via doc 2's
    # unperturbed view of position 0 (doc 2 perturbs position 18)
    p2 = gate_pixels(2)
    assert (p2[0] + (1 + 0 % 5) * 40) % 256 == p0[0]


def test_gate_samples_perturbation_hand_computed():
    s0, s3 = gate_samples(0), gate_samples(3)
    # doc 0 perturbs sample 0 with delta 0 -> identical to base; doc 3
    # perturbs sample 1 (frame 0: only energy-delta bit 0 can flip)
    # with delta 27000
    diff = [j for j in range(GATE_WAV_SAMPLES) if s0[j] != s3[j]]
    assert diff == [1]
    assert all(-32768 <= v < 32768 for v in s0)
    assert ((s0[1] + 32768 + (3 % 7) * 9000) % 65536) - 32768 == s3[1]


# -- codec roundtrips (the losslessness the SQL twin relies on) ---------------


def test_gate_png_roundtrip_lossless():
    for did in (0, 1, 7, 499):
        px = np.asarray(gate_pixels(did), dtype=np.uint8).reshape(
            GATE_IMG_H, GATE_IMG_W, 1
        )
        back = decode_image(png_encode(px))
        assert back.shape == (GATE_IMG_H, GATE_IMG_W, 1)
        assert np.array_equal(back, px)


def test_gate_wav_roundtrip_lossless():
    for did in (0, 5, 103):
        raw = gate_samples(did)
        samples, rate, n_ch = decode_wav_pcm(_gate_wav_bytes(raw))
        assert rate == 8000 and n_ch == 1 and len(samples) == 130
        assert np.array_equal(
            np.round(samples * 32768.0).astype(int), np.asarray(raw)
        )


# -- Python pipeline vs SQL twin, both dialects --------------------------------

_IDS = list(range(0, 12)) + list(range(100, 104)) + [250, 251, 497, 499]


@pytest.mark.parametrize("modality", ["image", "audio"])
def test_gate_sketch_sql_duckdb_matches_decode_path(modality):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT unnest(?) AS doc_id", [_IDS])
    duck = dict(
        con.execute(
            gate_sketch_sql("documents", "doc_id", modality, "duckdb")
        ).fetchall()
    )
    fn = _img_sketch if modality == "image" else _aud_sketch
    for did in _IDS:
        assert fn(did) == duck[did], (modality, did)


@pytest.mark.parametrize("modality", ["image", "audio"])
def test_gate_sketch_sql_spark_dialect_agrees(spark, modality):
    df = spark.createDataFrame([(i,) for i in _IDS], "doc_id bigint")
    df.createOrReplaceTempView("gate_docs_t13")
    got = {
        r["doc_id"]: r["sketch"]
        for r in spark.sql(
            gate_sketch_sql("gate_docs_t13", "doc_id", modality, "spark")
        ).collect()
    }
    fn = _img_sketch if modality == "image" else _aud_sketch
    for did in _IDS:
        assert fn(did) == got[did], (modality, did)
    spark.catalog.dropTempView("gate_docs_t13")


def test_gate_sketch_sql_rejects_unknowns():
    with pytest.raises(ValueError):
        gate_sketch_sql("t", "id", "video", "duckdb")
    with pytest.raises(ValueError):
        gate_sketch_sql("t", "id", "image", "presto")
    with pytest.raises(ValueError):
        gate_media_synth(None, "id", "video")


# -- end-to-end Spark pipeline vs brute reference ------------------------------


@pytest.mark.parametrize("modality", ["image", "audio"])
def test_near_dup_pipeline_matches_brute(spark, modality):
    from harmonize_search_analyze_spark.operators.multimodal import (
        audio_near_dup_pairs,
        image_near_dup_pairs,
    )

    ids = list(range(0, 8)) + list(range(100, 104)) + list(range(40, 52))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
    synth = gate_media_synth(df, "doc_id", modality)
    if modality == "image":
        out = image_near_dup_pairs(synth, "doc_id", max_hamming=3)
        sketch = {i: _img_sketch(i) for i in ids}
    else:
        out = audio_near_dup_pairs(synth, "doc_id", max_hamming=3)
        sketch = {i: _aud_sketch(i) for i in ids}
    got = sorted(tuple(r) for r in out.collect())
    want = sorted(
        (a, b, _hamming(sketch[a], sketch[b]))
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if _hamming(sketch[a], sketch[b]) <= 3
    )
    want = sorted((min(a, b), max(a, b), h) for a, b, h in want)
    assert got == want
    # the planted clusters (0-3, 100-103) must all pair up
    found = {(a, b) for a, b, _ in got}
    for grp in (range(0, 4), range(100, 104)):
        for i, a in enumerate(list(grp)):
            for b in list(grp)[i + 1:]:
                assert (a, b) in found


# -- substr_span_clusters -------------------------------------------------------


def _span_rows(spark, rows, k=8):
    from harmonize_search_analyze_spark.operators.dedup import (
        substring_span_clusters,
    )

    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = substring_span_clusters(df, "doc_id", "text", k=k)
    return sorted(tuple(r) for r in out.collect())


def test_span_clusters_hand_computed(spark):
    rows = [
        (1, "a b c d e f g h i zz yy"),
        (2, "qq a b c d e f g h i"),
        (3, "totally different words here indeed for sure ok fine"),
        (4, "r s t u v w x y r s t u v w x y"),  # same-doc repeat only
    ]
    got = _span_rows(spark, rows)
    # docs 1 and 2 share the 9-token maximal span "a b c d e f g h i"
    # (two consecutive 8-gram windows merge); doc 3 shares nothing;
    # doc 4's repeat is same-doc only (distinct-doc gate excludes it)
    assert len(got) == 2
    (d1, s1, l1, k1, nd1, ns1), (d2, s2, l2, k2, nd2, ns2) = got
    assert (d1, s1, l1) == (1, 0, 9)
    assert (d2, s2, l2) == (2, 1, 9)
    assert k1 == k2 and nd1 == nd2 == 2 and ns1 == ns2 == 2


def test_span_clusters_two_islands_per_doc(spark):
    # two disjoint 9-token shared regions, separated in doc 2 by a
    # Z Z Z gap -> two islands per doc, each its own 2-doc cluster
    rows = [
        (1, "p q r s t u v w x J K L M N O P Q R"),
        (2, "p q r s t u v w x Z Z Z J K L M N O P Q R"),
    ]
    got = _span_rows(spark, rows)
    by_doc = {}
    for r in got:
        by_doc.setdefault(r[0], []).append(r)
    assert len(by_doc[1]) == 2 and len(by_doc[2]) == 2
    # span_len = last_start - first_start + k = 9 tokens each
    assert {(s, l) for _, s, l, *_ in by_doc[1]} == {(0, 9), (9, 9)}
    assert {(s, l) for _, s, l, *_ in by_doc[2]} == {(0, 9), (12, 9)}
    # same content -> same cluster key across docs, region by region
    key = {(d, s): kk for d, s, _, kk, *_ in got}
    assert key[(1, 0)] == key[(2, 0)]
    assert key[(1, 9)] == key[(2, 12)]
    assert key[(1, 0)] != key[(1, 9)]


def test_span_clusters_superset_span_is_its_own_cluster(spark):
    # doc 2 extends the shared region by one token and doc 3 overlaps
    # the extension: every doc's MAXIMAL span has distinct content
    # ("a..i" vs "a..j" vs "b..j"), so no exact-content cluster reaches
    # 2 docs — the documented superset semantics
    rows = [
        (1, "a b c d e f g h i"),
        (2, "a b c d e f g h i j"),
        (3, "b c d e f g h i j"),
    ]
    assert _span_rows(spark, rows) == []


def test_span_clusters_duckdb_twin(spark):
    from harmonize_search_analyze_spark.operators.dedup import (
        substring_span_clusters_sql,
    )

    rows = [
        (1, "a b c d e f g h i zz yy"),
        (2, "qq a b c d e f g h i"),
        (3, "a b c d e f g h i"),
        (4, "one two three four five six seven eight nine ten"),
        (5, "two three four five six seven eight nine extra stuff"),
    ]
    got = _span_rows(spark, rows)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ",".join(f"({i},'{t}')" for i, t in rows)
        + ") v(doc_id, text)"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            substring_span_clusters_sql("docs", "doc_id", "text", k=8)
        ).fetchall()
    )
    assert got == want
    assert len(got) >= 4  # 3-doc cluster + the 8-gram overlap pair


def test_span_clusters_rejects_bad_k():
    from harmonize_search_analyze_spark.operators.dedup import (
        substring_span_clusters,
    )

    with pytest.raises(ValueError):
        substring_span_clusters(None, "doc_id", "text", k=1)


# -- hubness_report -------------------------------------------------------------


def test_hubness_hand_computed(spark):
    from harmonize_search_analyze_spark.operators.similarity import (
        hubness_report,
    )

    # b(id 0) duplicates a's direction (cos 1.0) so for query a the self
    # row is NOT rank 1 (tie at 1.0 broken by corpus_id asc -> b first);
    # d ties with everything at cos 0.707107 -> id asc picks b.
    rows = [
        (0, [2.0, 0.0]),  # b
        (1, [1.0, 0.0]),  # a
        (2, [0.0, 1.0]),  # c
        (3, [1.0, 1.0]),  # d
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    got = sorted(
        tuple(r) for r in hubness_report(df, k=1).collect()
    )
    # NN: a->b, b->a, c->d, d->b  =>  N_1: b=2, a=1, d=1, c=0
    assert got == [(0, 1), (1, 2), (2, 1)]


def test_hubness_duckdb_twin(spark):
    from harmonize_search_analyze_spark.operators.similarity import (
        hubness_report,
        hubness_report_sql,
    )

    rows = [
        (i, [float((i * 7 + j * 3) % 11 - 5) for j in range(8)])
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    got = sorted(tuple(r) for r in hubness_report(df, k=3).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE emb AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, {v})" for i, v in rows)
        + ") v(vec_id, embedding)"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            hubness_report_sql("emb", "vec_id", "embedding", k=3)
        ).fetchall()
    )
    assert got == want
    assert sum(n * c for n, c in got) == 30 * 3  # total retrievals = n*k


def test_hubness_rejects_bad_k():
    from harmonize_search_analyze_spark.operators.similarity import (
        hubness_report,
        hubness_report_sql,
    )

    with pytest.raises(ValueError):
        hubness_report(None, k=0)
    with pytest.raises(ValueError):
        hubness_report_sql("t", k=0)


@pytest.mark.slow
def test_hubness_from_knn_ivf_scale_path(spark):
    from pyspark.sql import functions as F

    from harmonize_search_analyze_spark.operators.similarity import (
        hubness_from_knn,
        hubness_report,
        similarity_join,
        similarity_join_ivf,
    )

    rows = [
        (i, [float((i * 5 + j * 7) % 13 - 6) for j in range(8)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    ids = df.select(F.col("vec_id").alias("__vid"))
    # fed the EXACT knn, the factored stack reproduces hubness_report
    knn = similarity_join(
        df,
        df.select(F.col("vec_id").alias("query_id"), "embedding"),
        4,
        corpus_id="vec_id",
    )
    a = sorted(tuple(r) for r in hubness_from_knn(knn, ids, k=3).collect())
    b = sorted(tuple(r) for r in hubness_report(df, k=3).collect())
    assert a == b
    # fed the IVF knn (the scale path), the stack still conserves total
    # retrievals: sum n_k * n_vectors == n * k when every query returns
    # >= k+1 candidates (nprobe covering all lists here)
    knn_ivf = similarity_join_ivf(
        df,
        df.select(F.col("vec_id").alias("query_id"), "embedding").repartition(8),
        4,
        nprobe=4,
        n_centroids=4,
        corpus_id="vec_id",
    )
    c = hubness_from_knn(knn_ivf, ids, k=3).collect()
    assert sum(r["n_k"] * r["n_vectors"] for r in c) == 40 * 3
    assert sum(r["n_vectors"] for r in c) == 40
