"""Multimodal plumbing tests: fake-codec determinism, actor-stage
schemas, frame sampling, malformed-payload drop policy."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from biocypher_metta_ray.stages.multimodal import (
    FrameSampler,
    MediaDecoder,
    decode_fake_media,
    decode_media,
    encode_fake_media,
    media_table,
    sample_frames,
)


def test_fake_codec_roundtrip():
    buf = encode_fake_media(2, 16, 8, 4, seed=7)
    kind, w, h, n, frames = decode_fake_media(buf)
    assert (kind, w, h, n) == ("video", 16, 8, 4)
    assert frames.shape == (4, 8, 16)
    # deterministic
    assert buf == encode_fake_media(2, 16, 8, 4, seed=7)


def test_decoder_drops_malformed():
    t = pa.table(
        {
            "media_id": pa.array([1, 2, 3], pa.int64()),
            "media_type": pa.array(["image", "image", "image"]),
            "payload": pa.array(
                [encode_fake_media(0, 8, 8, 1, 1), b"garbage", None],
                pa.binary(),
            ),
        }
    )
    dec = MediaDecoder()
    out = dec(t)
    assert out.num_rows == 1
    assert dec.dropped == 2
    assert out.column_names == [
        "media_id", "media_type", "width", "height", "n_frames",
        "mean_intensity",
    ]


def test_use_real_codec_decodes_real_png():
    """Round 5: use_real_codec=True works in THIS container via the
    vendored pure-Python PNG codec — real image bytes, real format."""
    import numpy as np

    from biocypher_metta_ray.functions.png import encode_png_gray8

    arr = (np.arange(96, dtype=np.uint8) * 2).reshape(8, 12)
    t = pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "media_type": pa.array(["image", "image"], pa.string()),
        "payload": pa.array(
            [encode_png_gray8(arr), b"truncated\x89PNG"], pa.binary()),
    })
    dec = MediaDecoder(use_real_codec=True)
    out = dec(t)
    assert out.num_rows == 1 and dec.dropped == 1
    assert out["width"][0].as_py() == 12
    assert out["height"][0].as_py() == 8
    assert out["mean_intensity"][0].as_py() == round(float(arr.mean()), 4)


def test_decode_media_stage(ray_session):
    ds = ray.data.from_arrow(media_table(50, seed=42))
    out = decode_media(ds).to_pandas()
    assert len(out) == 50
    assert set(out["media_type"]) <= {"image", "audio", "video"}
    assert (out["width"] >= 8).all() and (out["width"] <= 32).all()
    # deterministic across runs
    out2 = decode_media(ray.data.from_arrow(media_table(50, seed=42))).to_pandas()
    assert out.sort_values("media_id").reset_index(drop=True).equals(
        out2.sort_values("media_id").reset_index(drop=True)
    )


def test_frame_sampler(ray_session):
    tbl = media_table(60, seed=1)
    ds = ray.data.from_arrow(tbl)
    frames = sample_frames(ds, every_k=2).to_pandas()
    # every sampled frame decodes as a single-frame image
    for payload in frames["payload"].head(5):
        kind, w, h, n, _ = decode_fake_media(payload)
        assert kind == "image" and n == 1
    # sampling arithmetic: each video of n frames yields ceil(n/2) rows
    videos = {
        mid: decode_fake_media(p)[3]
        for mid, t, p in zip(
            tbl["media_id"].to_pylist(),
            tbl["media_type"].to_pylist(),
            tbl["payload"].to_pylist(),
        )
        if t == "video"
    }
    want = sum(-(-n // 2) for n in videos.values())
    assert len(frames) == want


def test_resize_media(ray_session):
    import numpy as np
    import ray.data

    from biocypher_metta_ray.stages.multimodal import (
        decode_fake_media,
        media_table,
        resize_media,
    )

    ds = ray.data.from_arrow(media_table(20, seed=7))
    out = resize_media(ds, 8, 8).to_pandas()
    assert len(out) == 20
    for _, row in out.head(5).iterrows():
        dec = decode_fake_media(row["payload"])
        assert dec is not None
        kind, w, h, n, frames = dec
        assert (w, h) == (8, 8)
        assert frames.shape == (n, 8, 8)
    # deterministic: same input -> same payload bytes
    out2 = resize_media(
        ray.data.from_arrow(media_table(20, seed=7)), 8, 8
    ).to_pandas()
    a = out.sort_values("media_id")["payload"].tolist()
    b = out2.sort_values("media_id")["payload"].tolist()
    assert a == b


def test_real_codec_resolution_and_roundtrip():
    """Codec resolution prefers PIL when installed; otherwise the
    vendored PNG decoder serves real bytes. Round-trips gray + RGB
    PNGs, checks the documented integer luma conversion, and the
    filter-1..4 unfilter paths against hand-filtered scanlines."""
    import struct
    import zlib

    import numpy as np

    from biocypher_metta_ray.functions import png as P
    from biocypher_metta_ray.stages import multimodal as mm

    real = mm.available_real_codec()
    assert real is not None  # never stubbed out anymore

    arr = (np.arange(64, dtype=np.uint8)).reshape(8, 8)
    kind, w, h, n, frames = mm.png_decode(P.encode_png_gray8(arr))
    assert (kind, w, h, n) == ("image", 8, 8, 1)
    np.testing.assert_array_equal(frames[0], arr)

    rgb = np.stack([arr, arr // 2, arr * 2], axis=2).astype(np.uint8)
    kind, w, h, n, frames = mm.png_decode(P.encode_png_rgb8(rgb))
    a = rgb.astype(np.int64)
    luma = ((a[:, :, 0] * 299 + a[:, :, 1] * 587 + a[:, :, 2] * 114)
            // 1000).astype(np.uint8)
    np.testing.assert_array_equal(frames[0], luma)

    assert mm.png_decode(b"not an image") is None
    assert mm.png_decode(None) is None

    # filters 1-4: build a 2-row gray image with explicit per-row
    # filtering and check decode_png unfilters back to the original
    rows = np.array([[10, 30, 25, 200], [60, 20, 190, 5]], np.uint8)
    for ftype in (1, 2, 3, 4):
        filtered = []
        prev = np.zeros(4, np.int64)
        for y in range(2):
            cur = rows[y].astype(np.int64)
            if ftype == 1:
                out = [cur[0]] + [(cur[x] - cur[x - 1]) % 256
                                  for x in range(1, 4)]
            elif ftype == 2:
                out = [(cur[x] - prev[x]) % 256 for x in range(4)]
            elif ftype == 3:
                out = [(cur[x] - ((cur[x - 1] if x else 0) + prev[x]) // 2)
                       % 256 for x in range(4)]
            else:
                out = [(cur[x] - P._paeth(
                    int(cur[x - 1]) if x else 0, int(prev[x]),
                    int(prev[x - 1]) if x else 0)) % 256
                    for x in range(4)]
            filtered.append(bytes([ftype] + [int(v) for v in out]))
            prev = cur
        ihdr = struct.pack(">IIBBBBB", 4, 2, 8, 0, 0, 0, 0)
        buf = (b"\x89PNG\r\n\x1a\n" + P._chunk(b"IHDR", ihdr)
               + P._chunk(b"IDAT", zlib.compress(b"".join(filtered)))
               + P._chunk(b"IEND", b""))
        np.testing.assert_array_equal(P.decode_png(buf), rows,
                                      err_msg=f"filter {ftype}")
