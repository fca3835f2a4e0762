"""WARC source/sink: record serialization, multi-member gzip split,
HTTP response parsing, the distributed shard sink round-trip, and the
WET conversion step."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from harmonize_search_analyze_spark.sources.warc import (
    WarcFormatError,
    build_record,
    parse_warc_bytes,
    read_warc,
    warc_to_documents,
    write_warc_shards,
)


def test_record_roundtrip_uncompressed():
    rec = build_record(
        target_uri="http://example.com/a",
        payload=b"<html><body>hi</body></html>",
    )
    got = list(parse_warc_bytes(rec))
    assert len(got) == 1
    r = got[0]
    assert r["warc_type"] == "response"
    assert r["target_uri"] == "http://example.com/a"
    assert r["http_status"] == 200
    assert r["http_content_type"] == "text/html"
    assert r["payload"] == b"<html><body>hi</body></html>"
    assert r["n_bytes"] == 28
    # identical input -> identical bytes (deterministic record id/date)
    assert rec == build_record(
        target_uri="http://example.com/a",
        payload=b"<html><body>hi</body></html>",
    )


def test_conversion_record_bare_payload():
    rec = build_record(
        target_uri="http://example.com/w",
        payload=b"plain text",
        warc_type="conversion",
        http_status=None,
    )
    r = next(parse_warc_bytes(rec))
    assert r["warc_type"] == "conversion"
    assert r["http_status"] is None
    assert r["payload"] == b"plain text"


def test_multi_member_gzip_and_concatenation():
    recs = [
        build_record(target_uri=f"http://e.com/{i}", payload=b"x" * i)
        for i in range(1, 4)
    ]
    # CC layout: each record its own gzip member, members concatenated
    data = b"".join(gzip.compress(r) for r in recs)
    got = list(parse_warc_bytes(data))
    assert [r["target_uri"] for r in got] == [
        "http://e.com/1", "http://e.com/2", "http://e.com/3"
    ]
    # whole-file single-member gzip also parses
    got2 = list(parse_warc_bytes(gzip.compress(b"".join(recs))))
    assert len(got2) == 3
    # plain uncompressed concatenation too
    got3 = list(parse_warc_bytes(b"".join(recs)))
    assert len(got3) == 3


def test_corrupt_inputs_raise():
    rec = build_record(target_uri="http://e.com/x", payload=b"abc")
    with pytest.raises(WarcFormatError, match="truncated"):
        list(parse_warc_bytes(rec[:-10]))
    with pytest.raises(WarcFormatError, match="WARC/"):
        list(parse_warc_bytes(b"HTTP/1.1 200 OK\r\n\r\n"))
    with pytest.raises(WarcFormatError, match="gzip"):
        list(parse_warc_bytes(b"\x1f\x8b" + b"\x00" * 20))


def test_shard_sink_and_source_roundtrip(spark, tmp_path):
    """Distributed sink -> source round trip: every row comes back with
    its payload, one shard file per non-empty partition, parallel read."""
    import os

    rows = [
        (f"http://site{i % 3}.com/page{i}", f"<p>document {i}</p>")
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, ["url", "payload"]).repartition(4)
    out = str(tmp_path / "warc_out")
    write_warc_shards(df, out)
    shards = sorted(os.listdir(out))
    assert 1 <= len(shards) <= 4
    assert all(s.endswith(".warc.gz") for s in shards)
    back = read_warc(spark, out)
    got = {
        r.target_uri: bytes(r.payload).decode() for r in back.collect()
    }
    assert got == {u: p for u, p in rows}
    # record-level metadata survives
    one = back.limit(1).collect()[0]
    assert one.http_status == 200 and one.warc_type == "response"


def test_warc_to_documents_wet_step(spark, tmp_path):
    df = spark.createDataFrame(
        [
            ("http://a.com/1", "<html><b>keep me</b><script>drop()</script></html>"),
            ("http://a.com/2", "<p>two</p>"),
        ],
        ["url", "payload"],
    ).coalesce(1)
    out = str(tmp_path / "w")
    write_warc_shards(df, out)
    docs = warc_to_documents(read_warc(spark, out))
    got = {r.url: r.text for r in docs.collect()}
    assert got["http://a.com/1"] == "keep me"
    assert got["http://a.com/2"] == "two"
    # no shuffle in the whole source->WET plan
    plan = docs._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_wet_sink_roundtrip(spark, tmp_path):
    """WET conversion records round-trip: bare UTF-8 text payloads,
    warc_type=conversion, no HTTP block; unicode survives byte-exact."""
    rows = [
        ("http://a.com/1", "plain extracted text"),
        ("http://a.com/2", "unicode: naïve café — 日本語"),
    ]
    df = spark.createDataFrame(rows, ["url", "text"]).coalesce(1)
    out = str(tmp_path / "wet")
    from harmonize_search_analyze_spark.sources.warc import (
        write_wet_shards,
    )

    write_wet_shards(df, out)
    back = read_warc(spark, out)
    got = {
        r.target_uri: (r.warc_type, r.http_status,
                       bytes(r.payload).decode("utf-8"))
        for r in back.collect()
    }
    assert got == {u: ("conversion", None, t) for u, t in rows}


def test_streaming_warc_ingest(spark, tmp_path):
    """Continuous crawl ingestion: archives landing in a directory
    stream through the same record fan-out + WET conversion; each file
    is picked up exactly once across micro-batches."""
    import os

    from harmonize_search_analyze_spark.sources.warc import (
        read_warc_stream,
    )

    in_dir = str(tmp_path / "incoming")
    os.makedirs(in_dir)

    def drop(i):
        rec = build_record(
            target_uri=f"http://crawl.example/{i}",
            payload=f"<p>page {i}</p>".encode(),
        )
        with open(os.path.join(in_dir, f"crawl-{i}.warc.gz"), "wb") as fh:
            fh.write(gzip.compress(rec))

    drop(0)
    drop(1)
    docs = warc_to_documents(read_warc_stream(spark, in_dir))
    out_dir = str(tmp_path / "out")

    def run_once():
        q = (
            docs.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)

    run_once()
    got = {
        r.url: r.text for r in spark.read.parquet(out_dir).collect()
    }
    assert got == {
        "http://crawl.example/0": "page 0",
        "http://crawl.example/1": "page 1",
    }
    # a new archive lands: the checkpoint resumes and processes ONLY it
    drop(2)
    run_once()
    got2 = {
        r.url: r.text for r in spark.read.parquet(out_dir).collect()
    }
    assert len(got2) == 3 and got2["http://crawl.example/2"] == "page 2"


def test_warc_roundtrip_property():
    """Property: ANY batch of (uri, payload-bytes) round-trips through
    serialize -> per-record gzip -> concatenate -> parse, byte-exact
    and order-preserving — including empty payloads, high bytes, and
    payloads containing WARC/HTTP-looking delimiters."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    uri = st.text(
        alphabet=st.characters(
            min_codepoint=0x21, max_codepoint=0x7E, exclude_characters=""
        ),
        min_size=1,
        max_size=40,
    ).map(lambda s: "http://h.test/" + s)
    payload = st.binary(min_size=0, max_size=300)

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.tuples(uri, payload), min_size=1, max_size=6))
    def check(items):
        data = b"".join(
            gzip.compress(build_record(target_uri=u, payload=p))
            for u, p in items
        )
        got = list(parse_warc_bytes(data))
        assert [(r["target_uri"], r["payload"]) for r in got] == [
            (u, p) for u, p in items
        ]
        assert all(r["http_status"] == 200 for r in got)

    check()


def test_warc_adversarial_payloads():
    """Payloads that LOOK like record boundaries must not confuse the
    parser: Content-Length framing wins over content sniffing."""
    nasty = [
        b"\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\n",
        b"HTTP/1.1 500 Broken\r\n\r\nfake",
        b"Content-Length: 99999\r\n",
        b"\x1f\x8b\x08fake-gzip-magic",
    ]
    recs = [
        build_record(target_uri=f"http://x.test/{i}", payload=p)
        for i, p in enumerate(nasty)
    ]
    got = list(parse_warc_bytes(b"".join(recs)))
    assert [r["payload"] for r in got] == nasty
