"""Minimal pure-Python PNG codec (public knowledge: the PNG spec,
RFC 2083 / ISO 15948 — zlib streams, IHDR/IDAT/IEND chunks, per-row
filter types 0-4, non-interlaced).

Vendored so the multimodal stages can exercise a REAL image format in
this container (no PIL): `decode_png` handles 8-bit grayscale (color
type 0), RGB (2) and RGBA (6), non-interlaced; `encode_png_gray8` /
`encode_png_rgb8` write spec-conformant files (filter 0 rows) for
fixtures. Production clusters with PIL installed take the PIL path in
stages/multimodal.py instead; this codec is the dependency-free
fallback, not a performance path — unfiltering runs one Python pass
per row (fine for the small fixture images it serves).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def _encode(arr: np.ndarray, color_type: int) -> bytes:
    h = arr.shape[0]
    w = arr.shape[1]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    rows = arr.reshape(h, -1).astype(np.uint8)
    raw = b"".join(b"\x00" + rows[y].tobytes() for y in range(h))
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw))
            + _chunk(b"IEND", b""))


def encode_png_gray8(arr: np.ndarray) -> bytes:
    """uint8[h, w] -> grayscale PNG bytes (filter 0 rows)."""
    assert arr.ndim == 2
    return _encode(arr, 0)


def encode_png_rgb8(arr: np.ndarray) -> bytes:
    """uint8[h, w, 3] -> RGB PNG bytes (filter 0 rows)."""
    assert arr.ndim == 3 and arr.shape[2] == 3
    return _encode(arr, 2)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(buf: bytes) -> np.ndarray | None:
    """PNG bytes -> uint8 array: [h, w] (gray), [h, w, 3] (RGB) or
    [h, w, 4] (RGBA). Returns None for anything malformed or
    unsupported (interlaced, palette, 16-bit) — the caller's
    log-and-skip policy, matching the fake codec's contract."""
    try:
        if buf is None or len(buf) < 8 or bytes(buf[:8]) != _SIG:
            return None
        buf = bytes(buf)
        pos, ihdr, idat = 8, None, []
        while pos + 8 <= len(buf):
            (length,) = struct.unpack(">I", buf[pos:pos + 4])
            tag = buf[pos + 4:pos + 8]
            body = buf[pos + 8:pos + 8 + length]
            if len(body) < length:
                return None
            if tag == b"IHDR":
                ihdr = struct.unpack(">IIBBBBB", body)
            elif tag == b"IDAT":
                idat.append(body)
            elif tag == b"IEND":
                break
            pos += 12 + length
        if ihdr is None or not idat:
            return None
        w, h, depth, color, _comp, _filt, interlace = ihdr
        channels = {0: 1, 2: 3, 6: 4}.get(color)
        if channels is None or depth != 8 or interlace != 0:
            return None
        raw = zlib.decompress(b"".join(idat))
        stride = w * channels
        if len(raw) < h * (stride + 1):
            return None
        out = np.zeros((h, stride), dtype=np.uint8)
        bpp = channels
        for y in range(h):
            ftype = raw[y * (stride + 1)]
            line = bytearray(
                raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)]
            )
            prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
            if ftype == 0:
                pass
            elif ftype == 1:  # Sub
                for x in range(bpp, stride):
                    line[x] = (line[x] + line[x - bpp]) & 0xFF
            elif ftype == 2:  # Up
                line = bytearray(
                    (np.frombuffer(bytes(line), np.uint8) + prev)
                    .astype(np.uint8).tobytes()
                )
            elif ftype == 3:  # Average
                for x in range(stride):
                    left = line[x - bpp] if x >= bpp else 0
                    line[x] = (line[x] + (left + int(prev[x])) // 2) & 0xFF
            elif ftype == 4:  # Paeth
                for x in range(stride):
                    left = line[x - bpp] if x >= bpp else 0
                    ul = int(prev[x - bpp]) if x >= bpp else 0
                    line[x] = (line[x]
                               + _paeth(left, int(prev[x]), ul)) & 0xFF
            else:
                return None
            out[y] = np.frombuffer(bytes(line), np.uint8)
        if channels == 1:
            return out.reshape(h, w)
        return out.reshape(h, w, channels)
    except Exception:
        return None
