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


def test_use_real_codec_is_stubbed():
    with pytest.raises(NotImplementedError):
        MediaDecoder(use_real_codec=True)


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


def test_real_codec_optional_import():
    """Codec resolution is an optional import: in a container without
    PIL the real-codec branch raises a clear NotImplementedError; on a
    cluster image WITH PIL it decodes a real PNG through the same
    stage signature."""
    import numpy as np
    import pytest

    from biocypher_metta_ray.stages import multimodal as mm

    real = mm.available_real_codec()
    if real is None:
        with pytest.raises(NotImplementedError):
            mm.MediaDecoder(use_real_codec=True)
        with pytest.raises(NotImplementedError):
            mm.MediaResizer(4, 4, use_real_codec=True)
        return
    # PIL present: round-trip a real PNG through the real codec
    from io import BytesIO

    from PIL import Image

    arr = (np.arange(64, dtype=np.uint8)).reshape(8, 8)
    buf = BytesIO()
    Image.fromarray(arr, mode="L").save(buf, format="PNG")
    kind, w, h, n, frames = real(buf.getvalue())
    assert (kind, w, h, n) == ("image", 8, 8, 1)
    np.testing.assert_array_equal(frames[0], arr)
    assert real(b"not an image") is None
