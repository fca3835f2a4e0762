"""Multimodal-column tests: real header parsing over synthetic-but-valid
binary payloads (PNG/GIF/BMP/WAV/MP4 built byte-by-byte), the stubbed decode
gates, and the Spark plumbing (mapInPandas schemas, row fan-out, summary agg).
"""

from __future__ import annotations

import struct
import zlib

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from harmonize_search_analyze_spark.operators.multimodal import (
    MEDIA_META_SCHEMA,
    attach_media_metadata,
    decode_image,
    extract_image_features,
    media_summary,
    sample_frames,
    sniff_media,
)


def make_png(width: int, height: int, bit_depth: int = 8) -> bytes:
    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, 2, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr)) + chunk
        + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
    )


def make_wav(seconds: float = 2.0, rate: int = 16000, channels: int = 1,
             bits: int = 16) -> bytes:
    data_len = int(seconds * rate * channels * (bits // 8))
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + data_len) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, rate,
                                rate * channels * bits // 8,
                                channels * bits // 8, bits)
        + b"data" + struct.pack("<I", data_len)
    )
    return hdr + b"\x00" * min(data_len, 64)  # truncated payload is fine


def make_gif(width: int, height: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00" * 6


def make_bmp(width: int, height: int) -> bytes:
    return (
        b"BM" + b"\x00" * 16 + struct.pack("<ii", width, height) + b"\x00" * 8
    )


def make_mp4() -> bytes:
    return struct.pack(">I", 20) + b"ftypisom" + b"\x00" * 24


def test_sniff_media_headers():
    png = sniff_media(make_png(640, 480))
    assert (png["format"], png["modality"]) == ("png", "image")
    assert (png["width"], png["height"], png["bit_depth"]) == (640, 480, 8)

    wav = sniff_media(make_wav(seconds=2.0, rate=16000, channels=2))
    assert (wav["format"], wav["modality"]) == ("wav", "audio")
    assert wav["n_channels"] == 2 and wav["sample_rate"] == 16000
    assert wav["duration_ms"] == 2000

    gif = sniff_media(make_gif(12, 34))
    assert (gif["format"], gif["width"], gif["height"]) == ("gif", 12, 34)

    bmp = sniff_media(make_bmp(100, -200))  # top-down BMPs store negative h
    assert (bmp["format"], bmp["width"], bmp["height"]) == ("bmp", 100, 200)

    mp4 = sniff_media(make_mp4())
    assert (mp4["format"], mp4["modality"]) == ("mp4", "video")

    junk = sniff_media(b"hello world this is not media")
    assert junk["format"] == "unknown" and junk["digest"] is not None
    empty = sniff_media(None)
    assert empty["n_bytes"] == 0 and empty["digest"] is None


def test_sniff_corrupt_header_keeps_format():
    # valid magic, truncated header: format detected, dims left null
    broken = b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0d"
    got = sniff_media(broken)
    assert got["format"] == "png" and got["width"] is None


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (1, "a.png", make_png(640, 480)),
        (2, "b.png", make_png(640, 480)),          # exact duplicate payload
        (3, "c.wav", make_wav(1.5)),
        (4, "d.gif", make_gif(32, 32)),
        (5, "e.mp4", make_mp4()),
        (6, "f.bin", b"\x00\x01\x02garbage"),
        (7, "g.null", None),
    ]
    return spark.createDataFrame(
        rows,
        T.StructType([
            T.StructField("item_id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("payload", T.BinaryType()),
        ]),
    )


def test_attach_media_metadata_plumbing(spark, media_df):
    out = attach_media_metadata(media_df)
    assert out.schema["media"].dataType == MEDIA_META_SCHEMA
    rows = {r["item_id"]: r["media"] for r in out.collect()}
    assert rows[1]["format"] == "png" and rows[1]["width"] == 640
    assert rows[3]["modality"] == "audio" and rows[3]["duration_ms"] == 1500
    assert rows[5]["modality"] == "video"
    assert rows[6]["format"] == "unknown"
    assert rows[7]["digest"] is None
    # identical payloads -> identical digests (dedup hook)
    assert rows[1]["digest"] == rows[2]["digest"]
    # passthrough columns intact
    assert {r["name"] for r in out.collect()} == {
        "a.png", "b.png", "c.wav", "d.gif", "e.mp4", "f.bin", "g.null"
    }


def test_media_summary(spark, media_df):
    out = media_summary(attach_media_metadata(media_df))
    got = {
        (r["modality"], r["format"]): r["n_items"] for r in out.collect()
    }
    assert got[("image", "png")] == 2
    assert got[("audio", "wav")] == 1
    assert got[("video", "mp4")] == 1
    assert got[("unknown", "unknown")] == 2


def test_extract_image_features_deterministic(spark, media_df):
    out = extract_image_features(media_df, dim=16)
    rows = {r["item_id"]: r for r in out.collect()}
    # identical payloads -> identical features; embedding has fixed dim
    assert rows[1]["embedding"] == rows[2]["embedding"]
    assert len(rows[1]["embedding"]) == 16
    assert rows[1]["feat_mean"] is not None
    assert rows[7]["embedding"] is None  # null payload -> null features
    # determinism across runs
    again = {r["item_id"]: r for r in extract_image_features(media_df, dim=16).collect()}
    assert again[1]["embedding"] == rows[1]["embedding"]


def test_decode_gates_by_format(spark, media_df):
    """PNG now decodes for REAL via the stdlib codec; a header-only PNG
    fails loudly as a format error; JPEG without Pillow is the
    documented env gate pointing at SPARK_GRAFT_PIL."""
    from harmonize_search_analyze_spark.functions.png import PngFormatError

    with pytest.raises(PngFormatError, match="IDAT"):
        decode_image(make_png(2, 2))  # header-only fixture: no pixel data
    with pytest.raises(NotImplementedError, match="SPARK_GRAFT_PIL"):
        decode_image(b"\xff\xd8\xff\xe0jpegbytes")
    with pytest.raises(Exception):
        # fake=False over undecodable payloads fails the job loudly
        extract_image_features(media_df.limit(1), fake=False).collect()


def test_sample_frames_fanout(spark, media_df):
    vids = media_df.where(F.col("item_id") == 5)
    out = sample_frames(vids, every_ms=10, max_frames=3)
    rows = out.collect()
    assert len(rows) == 3
    assert [r["frame_idx"] for r in rows] == [0, 1, 2]
    assert [r["frame_ts_ms"] for r in rows] == [0, 10, 20]
    assert all(r["item_id"] == 5 for r in rows)
    assert all(":" in r["frame_stub"] for r in rows)


def test_sniff_jpeg_sof_dimensions():
    import struct

    from harmonize_search_analyze_spark.operators.multimodal import (
        sniff_media,
    )

    # minimal JFIF: SOI + APP0 (16 bytes) + SOF0 (height=480 width=640,
    # 8-bit, 3 components) + EOI
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
        + struct.pack(">HH", 480, 640) + b"\x03"
    )
    payload = b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"
    got = sniff_media(payload)
    assert got["format"] == "jpeg" and got["modality"] == "image"
    assert (got["width"], got["height"]) == (640, 480)
    assert got["bit_depth"] == 8 and got["n_channels"] == 3


def test_sniff_jpeg_progressive_and_truncated():
    import struct

    from harmonize_search_analyze_spark.operators.multimodal import (
        sniff_media,
    )

    # SOF2 (progressive) parses the same; a DHT (C4) segment must be
    # skipped, not mistaken for a frame header
    dht = b"\xff\xc4" + struct.pack(">H", 4) + b"\x00\x00"
    sof2 = (
        b"\xff\xc2" + struct.pack(">H", 11) + b"\x10"
        + struct.pack(">HH", 10, 20) + b"\x01"
    )
    payload = b"\xff\xd8" + dht + sof2
    got = sniff_media(payload)
    assert (got["width"], got["height"], got["bit_depth"]) == (20, 10, 16)
    # truncated stream: format detected, dims stay null, no crash
    assert sniff_media(b"\xff\xd8\xff\xc0\x00")["width"] is None


def test_sniff_mp4_duration():
    import struct

    from harmonize_search_analyze_spark.operators.multimodal import (
        sniff_media,
    )

    ftyp = struct.pack(">I", 16) + b"ftypisom" + b"\x00" * 4
    # mvhd v0: version+flags, ctime, mtime, timescale=1000, duration=2500
    mvhd = (
        b"mvhd" + b"\x00" + b"\x00\x00\x00"
        + struct.pack(">II", 0, 0)
        + struct.pack(">II", 1000, 2500)
        + b"\x00" * 8
    )
    payload = ftyp + b"moov" + mvhd
    got = sniff_media(payload)
    assert got["format"] == "mp4"
    assert got["duration_ms"] == 2500


def test_resize_images_plumbing(spark):
    """Resize stage: Arrow batch in/out, deterministic fake payload sized
    to the target dims, null passthrough, schema evolution."""
    from harmonize_search_analyze_spark.operators.multimodal import (
        decode_image,
        resize_images,
    )

    rows = [(1, b"\xff\xd8\xff\xe0fakejpegbytes"), (2, None),
            (3, b"\xff\xd8\xff\xe0fakejpegbytes")]
    df = spark.createDataFrame(rows, ["media_id", "payload"])
    out = {r["media_id"]: r for r in
           resize_images(df, 8, 6).collect()}
    assert out[1]["resized_width"] == 8 and out[1]["resized_height"] == 6
    assert len(out[1]["resized"]) == 8 * 6 * 3
    # identical input bytes -> identical resized bytes (digest lineage)
    assert bytes(out[1]["resized"]) == bytes(out[3]["resized"])
    assert out[2]["resized"] is None and out[2]["resized_width"] is None
    # the non-fake path is the documented env gate
    import pytest as _pytest

    with _pytest.raises(Exception):
        decode_image(b"x")
    with _pytest.raises(ValueError):
        resize_images(df, 0, 6)


def _make_wav(freq_hz=440.0, rate=8000, seconds=0.5, amplitude=0.5,
              n_ch=1, bits=16):
    import math
    import struct

    n = int(rate * seconds)
    frames = b""
    for i in range(n):
        v = amplitude * math.sin(2 * math.pi * freq_hz * i / rate)
        if bits == 16:
            frames += struct.pack("<h", int(v * 32767)) * n_ch
        else:
            frames += struct.pack("<B", int(v * 127) + 128) * n_ch
    byte_rate = rate * n_ch * bits // 8
    data = frames
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, n_ch, rate,
                                byte_rate, n_ch * bits // 8, bits)
        + b"data" + struct.pack("<I", len(data))
    )
    return hdr + data


def test_extract_audio_features_real_pcm_decode(spark):
    import math

    from pyspark.sql import types as T

    from harmonize_search_analyze_spark.operators.multimodal import (
        extract_audio_features,
    )

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ])
    rows = [
        (1, _make_wav(amplitude=0.5, seconds=0.5)),
        (2, _make_wav(amplitude=0.25, seconds=0.25, n_ch=2)),
        (3, b"\x89PNG\r\n\x1a\nnot audio at all...........padpadpad"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, schema)
    got = {r.id: r for r in extract_audio_features(df).collect()}
    # sine RMS = amplitude / sqrt(2); peak ~ amplitude
    assert got[1].rms == pytest.approx(0.5 / math.sqrt(2), abs=0.01)
    assert got[1].peak == pytest.approx(0.5, abs=0.01)
    assert got[1].duration_ms == 500
    assert got[1].n_samples == 4000
    # stereo: interleaved sample count doubles, duration divides back out
    assert got[2].n_samples == 2 * int(8000 * 0.25)
    assert got[2].duration_ms == 250
    assert got[2].rms == pytest.approx(0.25 / math.sqrt(2), abs=0.01)
    # non-audio and NULL payloads gate to NULL features
    assert got[3].rms is None and got[3].n_samples is None
    assert got[4].rms is None


def test_decode_wav_rejects_compressed_and_truncated(spark):
    from harmonize_search_analyze_spark.operators.multimodal import (
        decode_wav_pcm,
    )
    import struct

    wav = _make_wav()
    # flip the audio_format field to 2 (ADPCM -> compressed, needs codec)
    bad = wav[:20] + struct.pack("<H", 2) + wav[22:]
    assert decode_wav_pcm(bad) is None
    assert decode_wav_pcm(wav[:30]) is None
    assert decode_wav_pcm(b"") is None
    assert decode_wav_pcm(None) is None


# -- real PNG codec (round-5: stdlib decode + Pillow escape hatch) ----------


def _filtered_png(pixels, filters):
    """Hand-build a PNG whose row y uses filter type filters[y], applying
    the PNG spec's forward filter so the decoder must invert it."""
    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, ch = arr.shape
    stride = w * ch
    flat = arr.reshape(h, stride).astype(int)
    scan = bytearray()
    prev = [0] * stride
    for y in range(h):
        row = list(flat[y])
        ft = filters[y]
        scan.append(ft)
        for i in range(stride):
            left = row[i - ch] if i >= ch else 0
            up = prev[i]
            ul = prev[i - ch] if i >= ch else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = left
            elif ft == 2:
                pred = up
            elif ft == 3:
                pred = (left + up) // 2
            else:  # Paeth
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else (
                    up if pb <= pc else ul
                )
            scan.append((row[i] - pred) & 0xFF)
        prev = row

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 2: 4, 3: 2, 4: 6}[ch],
                       0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(scan)))
        + chunk(b"IEND", b"")
    )


def test_png_roundtrip_and_filters():
    """Encode->decode is the identity, and the decoder inverts every
    filter type (None/Sub/Up/Average/Paeth) on hand-filtered scanlines."""
    import numpy as np

    from harmonize_search_analyze_spark.functions.png import (
        png_decode,
        png_encode,
    )

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    assert (png_decode(png_encode(px)) == px).all()
    # grayscale round-trip keeps the channel axis
    g = rng.integers(0, 256, size=(3, 6, 1), dtype=np.uint8)
    assert (png_decode(png_encode(g)) == g).all()
    # all five filter types on the same pixel data
    payload = _filtered_png(px, filters=[0, 1, 2, 3, 4])
    assert (png_decode(payload) == px).all()


def test_extract_image_features_real_decode(spark):
    """fake=False computes REAL pixel statistics through mapInPandas:
    a half-black/half-white PNG has mean 0.5 and a known 2-bin pool."""
    import numpy as np

    from harmonize_search_analyze_spark.functions.png import png_encode

    px = np.zeros((2, 4, 3), dtype=np.uint8)
    px[1, :, :] = 255  # bottom row white
    df = spark.createDataFrame([(1, png_encode(px))], ["item_id", "payload"])
    row = extract_image_features(df, dim=2, fake=False).collect()[0]
    assert row["feat_mean"] == 0.5 and row["feat_std"] == 0.5
    # row-major ravel: first bin = black row, second = white row
    assert row["embedding"] == [0.0, 1.0]


def test_resize_images_real_decode(spark):
    """fake=False decodes, nearest-neighbor resamples, and re-encodes a
    REAL PNG at the target dims."""
    import numpy as np

    from harmonize_search_analyze_spark.functions.png import (
        png_decode,
        png_encode,
    )
    from harmonize_search_analyze_spark.operators.multimodal import (
        resize_images,
    )

    px = np.zeros((4, 4, 3), dtype=np.uint8)
    px[:, 2:, :] = 200  # right half gray
    df = spark.createDataFrame([(1, png_encode(px))], ["media_id", "payload"])
    row = resize_images(df, 2, 2, fake=False).collect()[0]
    assert (row["resized_width"], row["resized_height"]) == (2, 2)
    out = png_decode(bytes(row["resized"]))
    assert out.shape == (2, 2, 3)
    assert (out[:, 0, :] == 0).all() and (out[:, 1, :] == 200).all()


def test_pil_escape_hatch(tmp_path, monkeypatch):
    """SPARK_GRAFT_PIL points at a site dir; a runtime with Pillow there
    decodes ANY format through the same decode_image call — exercised
    with a minimal stand-in PIL package."""
    import sys

    pkg = tmp_path / "PIL"
    pkg.mkdir()
    (pkg / "__init__.py").write_text("")
    (pkg / "Image.py").write_text(
        "import numpy as np\n"
        "class _Im:\n"
        "    mode = 'RGB'\n"
        "    def __enter__(self): return self\n"
        "    def __exit__(self, *a): return False\n"
        "    def __array__(self, dtype=None, copy=None):\n"
        "        return np.full((2, 3, 3), 7, dtype='uint8')\n"
        "def open(fp):\n"
        "    return _Im()\n"
    )
    monkeypatch.setenv("SPARK_GRAFT_PIL", str(tmp_path))
    saved = {k: sys.modules.pop(k) for k in list(sys.modules)
             if k == "PIL" or k.startswith("PIL.")}
    try:
        out = decode_image(b"\xff\xd8\xff\xe0anything")
        assert out.shape == (2, 3, 3) and (out == 7).all()
    finally:
        for k in list(sys.modules):
            if k == "PIL" or k.startswith("PIL."):
                del sys.modules[k]
        sys.modules.update(saved)
        if str(tmp_path) in sys.path:
            sys.path.remove(str(tmp_path))


# -- perceptual hashing + image near-dup (round 5) ---------------------------


def _noisy(px, n_pixels, seed):
    import numpy as np

    rng = np.random.default_rng(seed)
    out = px.copy()
    for _ in range(n_pixels):
        y = int(rng.integers(0, px.shape[0]))
        x = int(rng.integers(0, px.shape[1]))
        out[y, x] = np.clip(out[y, x].astype(int) + 6, 0, 255)
    return out


def test_phash64_properties():
    """dhash is invariant to global brightness shifts and small noise,
    far from a structurally different image; ahash differs from dhash;
    unknown method raises."""
    import numpy as np
    import pytest as _pytest

    from harmonize_search_analyze_spark.operators.multimodal import (
        phash64,
    )

    rng = np.random.default_rng(11)
    base = rng.integers(0, 200, size=(32, 32, 3), dtype=np.uint8)
    h = phash64(base)
    assert isinstance(h, int) and -(1 << 63) <= h < (1 << 63)
    # global brightness shift: gradient signs unchanged -> same dhash
    brighter = np.clip(base.astype(int) + 40, 0, 255).astype(np.uint8)
    assert phash64(brighter) == h
    # small perturbation: within a few bits
    near = _noisy(base, 4, seed=3)
    xor = (phash64(near) ^ h) & ((1 << 64) - 1)
    assert bin(xor).count("1") <= 6
    # structurally different image: far
    other = rng.integers(0, 200, size=(32, 32, 3), dtype=np.uint8)
    xor2 = (phash64(other) ^ h) & ((1 << 64) - 1)
    assert bin(xor2).count("1") > 12
    assert phash64(base, "ahash") != phash64(base, "dhash")
    with _pytest.raises(ValueError, match="method"):
        phash64(base, "blockhash")


def test_image_near_dup_pairs_banded(spark):
    """End-to-end: PNG payloads -> Arrow decode+phash -> banded
    candidate join (reusing the SimHash machinery) -> verified hamming
    pairs. Near-dups pair up; distinct images do not; undecodable
    payloads drop out with skip_undecodable."""
    import numpy as np

    from harmonize_search_analyze_spark.functions.png import png_encode
    from harmonize_search_analyze_spark.operators.multimodal import (
        image_near_dup_pairs,
        image_phash,
    )

    rng = np.random.default_rng(5)
    imgs = {}
    for g in range(3):
        base = rng.integers(0, 200, size=(24, 24, 3), dtype=np.uint8)
        imgs[g * 10] = base
        imgs[g * 10 + 1] = _noisy(base, 3, seed=g)
    rows = [(i, png_encode(px)) for i, px in imgs.items()]
    rows.append((99, b"\xff\xd8\xff\xe0not-decodable-jpeg"))
    df = spark.createDataFrame(rows, "img_id int, payload binary")
    hashed = image_phash(df).collect()
    assert {r.img_id: r.phash is None for r in hashed}[99] is True
    pairs = image_near_dup_pairs(
        df, "img_id", max_hamming=6
    ).collect()
    got = {(r.id1, r.id2) for r in pairs}
    assert {(0, 1), (10, 11), (20, 21)} <= got
    # no cross-group pairs
    assert all(a // 10 == b // 10 for a, b in got)
    assert all(r.hamming <= 6 for r in pairs)


def _make_env_wav(seed, gain=0.5, rate=4000, seconds=0.65, flips=0):
    """WAV whose per-segment amplitude envelope is a seeded random walk
    — a distinctive energy profile for fingerprinting. ``gain`` scales
    globally (fingerprint-invariant); ``flips`` perturbs that many
    envelope segments (small hamming damage)."""
    import math
    import struct

    import numpy as np

    rng = np.random.default_rng(seed)
    n = int(rate * seconds)
    env = rng.uniform(0.1, 1.0, size=65)
    if flips:
        fr = np.random.default_rng(seed + 1000)
        for i in fr.integers(0, 65, size=flips):
            env[i] = 1.1 - env[i]
    frames = b""
    for i in range(n):
        seg = min(64, i * 65 // n)
        v = gain * env[seg] * math.sin(2 * math.pi * 440.0 * i / rate)
        frames += struct.pack("<h", int(v * 20000))
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(frames)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate,
                                rate * 2, 2, 16)
        + b"data" + struct.pack("<I", len(frames))
    )
    return hdr + frames


def test_audio_fingerprint_properties():
    """Gain-invariant, stable under tiny envelope damage, far for a
    different envelope."""
    from harmonize_search_analyze_spark.operators.multimodal import (
        audio_fingerprint64,
        decode_wav_pcm,
    )

    def fp(payload):
        s, r, c = decode_wav_pcm(payload)
        return audio_fingerprint64(s, r, c)

    a = fp(_make_env_wav(1, gain=0.5))
    assert a == fp(_make_env_wav(1, gain=0.05))  # 10x quieter: same
    near = fp(_make_env_wav(1, gain=0.5, flips=2))
    assert bin(((a ^ near) & ((1 << 64) - 1))).count("1") <= 8
    other = fp(_make_env_wav(2, gain=0.5))
    assert bin(((a ^ other) & ((1 << 64) - 1))).count("1") > 12


def test_audio_near_dup_pairs_banded(spark):
    """End-to-end banded audio near-dup: gain-scaled copies pair up,
    different envelopes do not, non-PCM payloads null out."""
    from harmonize_search_analyze_spark.operators.multimodal import (
        audio_near_dup_pairs,
        audio_phash,
    )

    rows = []
    for g in range(3):
        rows.append((g * 10, _make_env_wav(g, gain=0.6)))
        rows.append((g * 10 + 1, _make_env_wav(g, gain=0.15)))
    rows.append((99, b"\x00\x01not audio at all" * 4))
    df = spark.createDataFrame(rows, "clip_id int, payload binary")
    hashed = {r.clip_id: r.aphash for r in audio_phash(df).collect()}
    assert hashed[99] is None
    pairs = audio_near_dup_pairs(df, "clip_id", max_hamming=4).collect()
    got = {(r.id1, r.id2) for r in pairs}
    assert {(0, 1), (10, 11), (20, 21)} <= got
    assert all(a // 10 == b // 10 for a, b in got)


def test_png_palette_and_16bit_decode():
    """Round-5 codec extensions: 8-bit palette PNGs decode through the
    PLTE lookup to RGB; 16-bit samples downconvert to the high byte;
    out-of-range palette indices raise."""
    import numpy as np

    from harmonize_search_analyze_spark.functions.png import (
        PngFormatError,
        png_decode,
    )

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    # palette: 2x2 image, indices [[0,1],[2,0]] over a 3-color palette
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    scan = b"\x00\x00\x01" + b"\x00\x02\x00"
    png = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", pal)
        + chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b"")
    )
    out = png_decode(png)
    assert out.shape == (2, 2, 3)
    assert out[0, 0].tolist() == [255, 0, 0]
    assert out[0, 1].tolist() == [0, 255, 0]
    assert out[1, 0].tolist() == [0, 0, 255]
    # out-of-range index
    bad = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", pal[:6])
        + chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b"")
    )
    with pytest.raises(PngFormatError, match="index"):
        png_decode(bad)

    # 16-bit grayscale 1x2: samples 0xABCD, 0x1234 -> high bytes AB, 12
    ihdr16 = struct.pack(">IIBBBBB", 2, 1, 16, 0, 0, 0, 0)
    scan16 = b"\x00" + b"\xab\xcd\x12\x34"
    png16 = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr16)
        + chunk(b"IDAT", zlib.compress(scan16)) + chunk(b"IEND", b"")
    )
    out16 = png_decode(png16)
    assert out16.shape == (1, 2, 1)
    assert out16.ravel().tolist() == [0xAB, 0x12]


def test_png_roundtrip_property():
    """Property: encode->decode is the identity for every supported
    shape — 1/2/3/4 channels, degenerate 1-pixel rows/columns, random
    content."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from harmonize_search_analyze_spark.functions.png import (
        png_decode,
        png_encode,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        st.integers(min_value=1, max_value=12),
        st.integers(min_value=1, max_value=12),
        st.sampled_from([1, 2, 3, 4]),
        st.integers(min_value=0, max_value=2**31 - 1),
    )
    def check(h, w, ch, seed):
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        out = png_decode(png_encode(px))
        assert out.shape == (h, w, ch)
        assert (out == px).all()

    check()
