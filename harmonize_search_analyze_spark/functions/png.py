"""Pure-stdlib PNG codec (zlib + struct only) — real pixel decode for
the multimodal operators in a hermetic container.

Scope: 8-bit-depth, non-interlaced PNGs of color types 0 (gray),
2 (RGB), 4 (gray+alpha), 6 (RGBA) — the shapes training-data pipelines
actually store. Palette (type 3), 16-bit and Adam7-interlaced images
raise ``PngFormatError`` with guidance (plug Pillow via the
``$SPARK_GRAFT_PIL`` escape hatch in ``operators/multimodal.py`` for
the long tail).

Everything here is per-row bytes work intended to run INSIDE an
Arrow-batched ``mapInPandas`` stage — no Spark imports, no shuffle
implications; at 100 TB the decode cost is scan-parallel map work.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["PngFormatError", "png_decode", "png_encode", "PNG_SIGNATURE"]

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class PngFormatError(ValueError):
    pass


def _chunks(payload: bytes):
    pos = 8
    n = len(payload)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", payload[pos: pos + 4])
        ctype = payload[pos + 4: pos + 8]
        data = payload[pos + 8: pos + 8 + length]
        if len(data) < length:
            raise PngFormatError("truncated PNG chunk")
        yield ctype, data
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(payload: bytes) -> np.ndarray:
    """Decode a PNG payload to a ``(height, width, channels)`` uint8
    array. Pure stdlib: chunk walk, zlib inflate, scanline unfilter
    (types 0-4 including Paeth). Coverage: 8-bit gray/RGB/gray+alpha/
    RGBA, 8-bit palette (PLTE lookup -> RGB), and 16-bit samples
    (downconverted PIL-style to the high byte). Sub-8-bit depths and
    Adam7 interlacing raise with guidance."""
    if payload[:8] != PNG_SIGNATURE:
        raise PngFormatError("not a PNG payload")
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    plte: bytes | None = None
    for ctype, data in _chunks(payload):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"PLTE":
            plte = data
    if width is None:
        raise PngFormatError("missing IHDR")
    if color_type == 3:
        samples = 1
        if bit_depth != 8:
            raise PngFormatError(
                f"unsupported palette bit depth {bit_depth} (8 only; "
                "use the SPARK_GRAFT_PIL escape hatch for packed "
                "palettes)"
            )
        if plte is None or len(plte) % 3:
            raise PngFormatError("palette PNG missing a valid PLTE")
    elif color_type in _CHANNELS:
        samples = _CHANNELS[color_type]
        if bit_depth not in (8, 16):
            raise PngFormatError(
                f"unsupported bit depth {bit_depth} (8/16 only; use "
                "the SPARK_GRAFT_PIL escape hatch for the long tail)"
            )
    else:
        raise PngFormatError(
            f"unsupported color type {color_type}"
        )
    if interlace != 0:
        raise PngFormatError("interlaced PNGs unsupported")
    if not idat:
        raise PngFormatError("missing IDAT (header-only PNG)")
    bps = 2 if bit_depth == 16 else 1
    bpp = samples * bps  # the unfilter left-neighbor offset is in BYTES
    raw = zlib.decompress(bytes(idat))
    stride = width * bpp
    if len(raw) != height * (stride + 1):
        raise PngFormatError("scanline data size mismatch")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = bytearray(stride)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        row = bytearray(raw[off + 1: off + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise PngFormatError(f"unknown filter type {ftype}")
        out[y] = np.frombuffer(bytes(row), dtype=np.uint8)
        prev = row
    if bit_depth == 16:
        # big-endian sample pairs: keep the high byte (PIL I;16 -> L)
        out = out.reshape(height, width * samples, 2)[:, :, 0]
        return np.ascontiguousarray(out).reshape(height, width, samples)
    if color_type == 3:
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = out.reshape(height, width)
        if int(idx.max()) >= len(pal):
            raise PngFormatError("palette index out of range")
        return pal[idx]
    return out.reshape(height, width, samples)


def png_encode(pixels: np.ndarray) -> bytes:
    """Encode a ``(height, width, channels)`` uint8 array as a PNG
    (filter 0 scanlines, one zlib stream) — enough to round-trip the
    resize operator's output as a real viewable image."""
    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    height, width, ch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if color_type is None:
        raise PngFormatError(f"cannot encode {ch}-channel pixels")

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    stride = width * ch
    flat = arr.reshape(height, stride)
    scan = b"".join(b"\x00" + flat[y].tobytes() for y in range(height))
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan, 6))
        + chunk(b"IEND", b"")
    )
