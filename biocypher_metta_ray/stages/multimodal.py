"""Multimodal (image/audio/video) column plumbing.

Media travels as opaque Arrow ``binary`` columns plus typed metadata
columns — never Python objects — and every transform is an actor-pool
``map_batches`` stage sized for large payloads (small ``batch_size``,
bounded pool). Codec resolution (round 5): ``use_real_codec=True``
decodes REAL image bytes — PIL when installed, else the vendored
pure-Python PNG codec (functions/png.py), which this container
exercises end-to-end (oracled query ``multimodal_png_features`` over
spec-conformant PNG payloads). The deterministic fake-format codec
remains the default for the audio/video shapes whose real codecs
(torchaudio/pyav) are genuinely absent here; every stage still takes
a ``decode_fn`` injection point with the same signature.

Fake media format (deterministic, seeded): a 16-byte header
``b"FAKEMEDIA" + media_kind(1B) + width(2B) + height(2B) + n_frames(2B)``
followed by width*height payload bytes per frame.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import ray.data

from .pool import autoscale_pool

MAGIC = b"FAKEMEDI"
KINDS = {0: "image", 1: "audio", 2: "video"}


def encode_fake_media(kind: int, width: int, height: int, n_frames: int,
                      seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    payload = rng.integers(0, 256, size=width * height * n_frames,
                           dtype=np.uint8).tobytes()
    header = MAGIC + struct.pack(">BHHH", kind, width, height, n_frames)
    return header + payload


def decode_fake_media(buf: bytes):
    """-> (kind:str, width, height, n_frames, frames: np.uint8[n,h,w])
    or None for malformed payloads (log-and-skip policy)."""
    if buf is None or len(buf) < 15 or buf[:8] != MAGIC:
        return None
    kind, w, h, n = struct.unpack(">BHHH", buf[8:15])
    need = w * h * n
    body = np.frombuffer(buf, dtype=np.uint8, offset=15)
    if len(body) < need or kind not in KINDS:
        return None
    return KINDS[kind], w, h, n, body[:need].reshape(n, h, w)


def pil_decode(buf: bytes):
    """Real-codec decode with the fake-codec signature: PIL opens the
    payload (PNG/JPEG/...), converts to 8-bit grayscale, and returns
    ``('image', w, h, 1, frames uint8[1, h, w])``. Malformed payloads
    return None (same log-and-skip policy as the fake codec). Only
    callable when PIL imported — resolve via
    :func:`available_real_codec`."""
    from io import BytesIO

    from PIL import Image

    try:
        img = Image.open(BytesIO(buf)).convert("L")
        arr = np.asarray(img, dtype=np.uint8)
    except Exception:
        return None
    h, w = arr.shape
    return "image", w, h, 1, arr.reshape(1, h, w)


def png_decode(buf: bytes):
    """Real-format decode via the vendored pure-Python PNG codec
    (functions/png.py; spec-conformant 8-bit gray/RGB/RGBA,
    non-interlaced). RGB(A) converts to 8-bit luma with the integer
    ITU-R 601-2 weights ``(299 R + 587 G + 114 B) // 1000`` —
    deterministic, so the DuckDB oracle can recompute it exactly.
    Malformed payloads return None (log-and-skip)."""
    from ..functions.png import decode_png

    arr = decode_png(buf)
    if arr is None:
        return None
    if arr.ndim == 3:  # RGB / RGBA -> luma (alpha ignored)
        a = arr.astype(np.int64)
        arr = ((a[:, :, 0] * 299 + a[:, :, 1] * 587 + a[:, :, 2] * 114)
               // 1000).astype(np.uint8)
    h, w = arr.shape
    return "image", w, h, 1, arr.reshape(1, h, w)


def available_real_codec():
    """Real-codec resolution: :func:`pil_decode` when PIL is installed
    (a real cluster image), else the vendored pure-Python PNG decoder
    (:func:`png_decode`) — REAL image bytes decode in this container
    too, just restricted to PNG. Stages pass ``use_real_codec=True``
    to take this path instead of the fake-format codec."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError:
        return png_decode
    return pil_decode


def media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fixture table: (media_id, media_type, payload)."""
    rng = np.random.default_rng(seed)
    rows = {"media_id": [], "media_type": [], "payload": []}
    for i in range(n):
        kind = int(rng.integers(0, 3))
        w = int(rng.integers(8, 33))
        h = int(rng.integers(8, 33))
        frames = 1 if kind == 0 else int(rng.integers(2, 9))
        rows["media_id"].append(i)
        rows["media_type"].append(KINDS[kind])
        rows["payload"].append(
            encode_fake_media(kind, w, h, frames, seed + i)
        )
    return pa.table(
        {
            "media_id": pa.array(rows["media_id"], pa.int64()),
            "media_type": pa.array(rows["media_type"], pa.string()),
            "payload": pa.array(rows["payload"], pa.binary()),
        }
    )


class MediaDecoder:
    """Actor-pool stage: payload binary -> typed metadata + feature
    vector. ``decode_fn`` is the codec injection point (defaults to the
    deterministic fake codec; a real deployment passes a PIL/pyav
    wrapper with the same signature). Malformed payloads are dropped
    and counted (reference log-and-skip policy,
    gtex_eqtl_adapter.py:93-95).
    """

    def __init__(self, decode_fn=None, use_real_codec: bool = False):
        if use_real_codec:
            real = available_real_codec()
            if real is None:
                raise NotImplementedError(
                    "real image/audio codecs are not available in this "
                    "environment (no PIL); inject decode_fn instead"
                )
            self.decode = decode_fn or real
        else:
            self.decode = decode_fn or decode_fake_media
        self.dropped = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {
            "media_id": [], "media_type": [], "width": [], "height": [],
            "n_frames": [], "mean_intensity": [],
        }
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            dec = self.decode(payload)
            if dec is None:
                self.dropped += 1
                continue
            kind, w, h, n, frames = dec
            out["media_id"].append(mid)
            out["media_type"].append(kind)
            out["width"].append(w)
            out["height"].append(h)
            out["n_frames"].append(n)
            out["mean_intensity"].append(float(np.round(frames.mean(), 4)))
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], pa.int64()),
                "media_type": pa.array(out["media_type"], pa.string()),
                "width": pa.array(out["width"], pa.int32()),
                "height": pa.array(out["height"], pa.int32()),
                "n_frames": pa.array(out["n_frames"], pa.int32()),
                "mean_intensity": pa.array(out["mean_intensity"], pa.float64()),
            }
        )


class FrameSampler:
    """Actor-pool stage: video payload -> every k-th frame re-encoded
    as single-frame payloads (one output row per sampled frame)."""

    def __init__(self, every_k: int = 2, decode_fn=None):
        self.k = every_k
        self.decode = decode_fn or decode_fake_media

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_idx, payloads = [], [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            dec = self.decode(payload)
            if dec is None or dec[0] != "video":
                continue
            _kind, w, h, n, frames = dec
            for f in range(0, n, self.k):
                header = MAGIC + struct.pack(">BHHH", 0, w, h, 1)
                ids.append(mid)
                frame_idx.append(f)
                payloads.append(header + frames[f].tobytes())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame": pa.array(frame_idx, pa.int32()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )


class MediaResizer:
    """Actor-pool stage: payload -> payload with every frame resized
    to (width, height) by nearest-neighbor sampling (the deterministic
    stand-in for a PIL/ffmpeg scaler — swap ``decode_fn``/the resample
    kernel for a real codec; the Ray-side surface is identical).
    Malformed payloads drop with accounting."""

    def __init__(self, width: int, height: int, decode_fn=None,
                 use_real_codec: bool = False):
        self.w = width
        self.h = height
        if use_real_codec:
            real = available_real_codec()
            if real is None:
                raise NotImplementedError(
                    "real image codecs are not available in this "
                    "environment (no PIL); inject decode_fn instead"
                )
            self.decode = decode_fn or real
        else:
            self.decode = decode_fn or decode_fake_media
        self.dropped = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, kinds, payloads = [], [], []
        for mid, mtype, payload in zip(
            batch["media_id"].to_pylist(),
            batch["media_type"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            dec = self.decode(payload)
            if dec is None:
                self.dropped += 1
                continue
            kind, w, h, n, frames = dec
            yi = (np.arange(self.h) * h // self.h)
            xi = (np.arange(self.w) * w // self.w)
            resized = frames[:, yi[:, None], xi[None, :]]
            header = MAGIC + struct.pack(
                ">BHHH", {v: k for k, v in KINDS.items()}[kind],
                self.w, self.h, n,
            )
            ids.append(mid)
            kinds.append(mtype)
            payloads.append(header + resized.tobytes())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "media_type": pa.array(kinds, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )


def resize_media(
    ds: ray.data.Dataset,
    width: int,
    height: int,
    concurrency: int | tuple | None = None,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """Resize stage (small batch_size: payload bytes x batch x pool
    must fit worker heaps)."""
    return ds.map_batches(
        MediaResizer,
        fn_constructor_kwargs={"width": width, "height": height},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=autoscale_pool(concurrency),
    )


def decode_media(
    ds: ray.data.Dataset,
    concurrency: int | tuple | None = None,
    batch_size: int = 64,
    use_real_codec: bool = False,
) -> ray.data.Dataset:
    """Decode/feature-extract stage. Small batch_size: payload bytes x
    batch x pool must fit worker heaps (large-binary guidance).
    ``use_real_codec=True`` resolves PIL at actor construction (a
    cluster image with codecs gets them with no code change)."""
    return ds.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"use_real_codec": use_real_codec},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=autoscale_pool(concurrency),
    )


def sample_frames(
    ds: ray.data.Dataset,
    every_k: int = 2,
    concurrency: int | tuple | None = None,
    batch_size: int = 32,
) -> ray.data.Dataset:
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"every_k": every_k},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=autoscale_pool(concurrency),
    )
