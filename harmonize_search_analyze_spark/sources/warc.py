"""WARC (Web ARChive, ISO 28500) source + sink — the container format
training-data pipelines actually ingest at 100 TB scale (Common Crawl
publishes WARC/WET as per-record-gzipped members concatenated into
~1 GB files).

Everything is pure stdlib bytes work (zlib multi-member inflate, header
parsing) running inside Spark's distributed primitives:

- **source**: ``spark.read.format("binaryFile")`` yields one row per
  WARC file; an Arrow ``mapInPandas`` stage fans each file out into its
  records. At 100 TB the unit of parallelism is the archive file —
  exactly how Common Crawl shards its corpus (90k+ files per crawl), so
  a 1000-executor cluster maps files to tasks with no shuffle at all.
  ``spark.sql.files.maxPartitionBytes`` does not split binary files;
  archive size (~1 GB) is the task granule, which is the format's own
  design point.
- **sink**: ``write_warc_shards`` emits one ``part-NNNNN.warc.gz`` per
  partition via ``foreachPartition`` — distributed, no driver
  collection, each record its own gzip member (the CC layout that makes
  records independently seekable/splittable by offset indexes).

Reference scope note: the reference stack ingests CSV from S3
(``notebooks/lib/harmonizeCrimeIncidents.py`` S1/S2); WARC is part of
this repo's training-data-pipeline extension surface.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "WARC_RECORD_SCHEMA",
    "WarcFormatError",
    "build_record",
    "parse_warc_bytes",
    "read_warc",
    "read_warc_stream",
    "warc_to_documents",
    "write_warc_shards",
    "write_wet_shards",
]

# a fixed date keeps record bytes deterministic for digest lineage; a
# real crawl writer passes its fetch time per record
_EPOCH_DATE = "2024-01-01T00:00:00Z"

WARC_RECORD_SCHEMA = T.StructType([
    T.StructField("warc_file", T.StringType()),
    T.StructField("record_id", T.StringType()),
    T.StructField("warc_type", T.StringType()),
    T.StructField("target_uri", T.StringType()),
    T.StructField("warc_date", T.StringType()),
    T.StructField("content_type", T.StringType()),
    T.StructField("http_status", T.IntegerType()),
    T.StructField("http_content_type", T.StringType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("n_bytes", T.LongType()),
])


class WarcFormatError(ValueError):
    pass


def build_record(
    *,
    target_uri: str,
    payload: bytes,
    warc_type: str = "response",
    warc_date: str = _EPOCH_DATE,
    http_status: int | None = 200,
    http_content_type: str | None = "text/html",
    record_id: str | None = None,
) -> bytes:
    """Serialize ONE WARC record (uncompressed). ``http_status`` set
    wraps the payload in an HTTP/1.1 response block (the ``response``
    record shape); None writes the payload bare (``conversion``/WET
    shape). record_id defaults to a urn:uuid derived from the target
    URI's md5 so identical inputs serialize identically."""
    if record_id is None:
        h = hashlib.md5(target_uri.encode("utf-8")).hexdigest()
        record_id = (
            f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"
        )
    if http_status is not None:
        block = (
            f"HTTP/1.1 {http_status} OK\r\n"
            f"Content-Type: {http_content_type}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode("ascii") + payload
        content_type = "application/http; msgtype=response"
    else:
        block = payload
        content_type = "text/plain"
    head = (
        "WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Record-ID: {record_id}\r\n"
        f"WARC-Date: {warc_date}\r\n"
        f"WARC-Target-URI: {target_uri}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(block)}\r\n"
        "\r\n"
    ).encode("ascii")
    return head + block + b"\r\n\r\n"


def _gzip_members(data: bytes) -> Iterator[bytes]:
    """Split a concatenation of gzip members (the CC WARC layout) into
    decompressed chunks; plain uncompressed input yields itself."""
    if data[:2] != b"\x1f\x8b":
        yield data
        return
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        try:
            chunk = d.decompress(data[pos:])
        except zlib.error as exc:
            raise WarcFormatError(
                f"corrupt gzip member at offset {pos}"
            ) from exc
        yield chunk + d.flush()
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed


def _parse_records(raw: bytes) -> Iterator[dict]:
    """Parse one decompressed chunk into WARC record dicts. A chunk may
    hold one record (per-record gzip) or many (whole-file gzip /
    uncompressed)."""
    pos = 0
    n = len(raw)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and raw[pos: pos + 2] in (b"\r\n", b"\n\n"):
            pos += 2
        if pos >= n:
            return
        if not raw[pos:].startswith(b"WARC/"):
            raise WarcFormatError(
                f"expected WARC/ version line at offset {pos}"
            )
        hdr_end = raw.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise WarcFormatError("unterminated WARC header block")
        headers: dict[str, str] = {}
        lines = raw[pos:hdr_end].decode("utf-8", "replace").split("\r\n")
        for line in lines[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", ""))
        except ValueError as exc:
            raise WarcFormatError(
                "WARC record missing Content-Length"
            ) from exc
        body = raw[hdr_end + 4: hdr_end + 4 + length]
        if len(body) < length:
            raise WarcFormatError("truncated WARC record body")
        status: int | None = None
        http_ct: str | None = None
        payload = body
        if headers.get("content-type", "").startswith("application/http"):
            split = body.find(b"\r\n\r\n")
            if split >= 0:
                http_head = body[:split].decode("utf-8", "replace")
                payload = body[split + 4:]
                first, *rest = http_head.split("\r\n")
                parts = first.split(" ")
                if len(parts) >= 2 and parts[1].isdigit():
                    status = int(parts[1])
                for line in rest:
                    if line.lower().startswith("content-type:"):
                        http_ct = line.split(":", 1)[1].strip()
        yield {
            "record_id": headers.get("warc-record-id"),
            "warc_type": headers.get("warc-type"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": headers.get("content-type"),
            "http_status": status,
            "http_content_type": http_ct,
            "payload": payload,
            "n_bytes": len(payload),
        }
        pos = hdr_end + 4 + length


def parse_warc_bytes(data: bytes) -> Iterator[dict]:
    """Parse a whole WARC file (gzipped-members or plain) into record
    dicts — the per-task workhorse ``read_warc`` runs inside Arrow
    batches."""
    for chunk in _gzip_members(data):
        yield from _parse_records(chunk)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC source: one output row per record across every matching
    archive file. Parallelism = archive files (the CC sharding design);
    no shuffle — pure scan + Arrow map fan-out."""
    files = spark.read.format("binaryFile").load(path)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_RECORD_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc_bytes(bytes(content)):
                    rec["warc_file"] = fpath
                    rows.append(tuple(rec[c] for c in cols))
            yield pd.DataFrame(rows, columns=cols)

    return files.select("path", "content").mapInPandas(
        run, WARC_RECORD_SCHEMA
    )


def read_warc_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming WARC source — continuous crawl ingestion: the
    ``binaryFile`` file-stream source picks up each archive exactly
    once as it lands in ``path`` and the SAME Arrow record fan-out used
    by the batch reader parses it, so a crawler dropping .warc.gz files
    becomes a live record stream (compose with warc_to_documents +
    the streaming dedup/window operators downstream). Parallelism and
    shuffle story are identical to ``read_warc``: one task per archive
    file, zero shuffle."""
    schema = T.StructType([
        T.StructField("path", T.StringType()),
        T.StructField("modificationTime", T.TimestampType()),
        T.StructField("length", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ])
    files = (
        spark.readStream.format("binaryFile").schema(schema).load(path)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_RECORD_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc_bytes(bytes(content)):
                    rec["warc_file"] = fpath
                    rows.append(tuple(rec[c] for c in cols))
            yield pd.DataFrame(rows, columns=cols)

    return files.select("path", "content").mapInPandas(
        run, WARC_RECORD_SCHEMA
    )


def write_warc_shards(
    df: DataFrame,
    out_dir: str,
    *,
    uri_col: str = "url",
    payload_col: str = "payload",
) -> None:
    """WARC sink: one ``part-NNNNN.warc.gz`` per partition, each record
    its own gzip member (the CC layout — offset indexes can then seek
    records without inflating the file). Distributed foreachPartition;
    nothing returns to the driver. ``out_dir`` must be a filesystem all
    executors can reach (local mode: any dir; cluster: a shared mount —
    an object-store variant would swap ``open`` for the store's client
    in the same partition loop)."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_partition(idx: int, rows: Iterator) -> Iterator:
        path = os.path.join(out_dir, f"part-{idx:05d}.warc.gz")
        wrote = False
        with open(path, "wb") as fh:
            for row in rows:
                payload = row[payload_col]
                if isinstance(payload, str):
                    payload = payload.encode("utf-8")
                rec = build_record(
                    target_uri=row[uri_col], payload=payload or b""
                )
                fh.write(gzip.compress(rec, 6))
                wrote = True
        if not wrote:
            os.remove(path)
        return iter(())

    df.rdd.mapPartitionsWithIndex(write_partition).count()


def write_wet_shards(
    df: DataFrame,
    out_dir: str,
    *,
    uri_col: str = "url",
    text_col: str = "text",
) -> None:
    """WET sink: ``conversion`` records carrying bare extracted text —
    the companion format Common Crawl ships alongside WARC (and what a
    text-only training pipeline re-exports after curation). Same
    distributed per-record-gzip shard layout as ``write_warc_shards``."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_partition(idx: int, rows: Iterator) -> Iterator:
        path = os.path.join(out_dir, f"part-{idx:05d}.warc.wet.gz")
        wrote = False
        with open(path, "wb") as fh:
            for row in rows:
                text = row[text_col] or ""
                rec = build_record(
                    target_uri=row[uri_col],
                    payload=text.encode("utf-8"),
                    warc_type="conversion",
                    http_status=None,
                )
                fh.write(gzip.compress(rec, 6))
                wrote = True
        if not wrote:
            os.remove(path)
        return iter(())

    df.rdd.mapPartitionsWithIndex(write_partition).count()


def warc_to_documents(records: DataFrame) -> DataFrame:
    """The WET step: keep successful HTML responses, strip markup with
    the engine's map-only HTML→text expression, return
    ``(url, warc_date, text)``. Composes as a plain column pipeline on
    the record frame — still no shuffle."""
    from harmonize_search_analyze_spark.operators.web import html_to_text

    return (
        records.where(
            (F.col("warc_type") == "response")
            & (F.col("http_status") == 200)
        )
        .select(
            F.col("target_uri").alias("url"),
            "warc_date",
            F.col("payload").cast("string").alias("__html"),
        )
        .select(
            "url", "warc_date", html_to_text("__html").alias("text")
        )
    )
