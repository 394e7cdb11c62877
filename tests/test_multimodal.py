"""Multimodal plumbing tests: binary columns through Arrow batches, actor
pool signatures, stubbed decode kernels (SURVEY-extension; decode itself is
a documented stub in this environment)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from abslog_ray.stages.multimodal import (
    MediaDecoder,
    decode_media,
    sample_frames,
    synth_media_table,
)


def test_real_decode_raises():
    dec = MediaDecoder(fake=False)
    t = synth_media_table(4)
    with pytest.raises(NotImplementedError):
        dec(t)


def test_fake_decode_deterministic_schema():
    t = synth_media_table(32)
    ds = ray.data.from_arrow(t)
    out = decode_media(ds, fake=True, concurrency=(1, 2), batch_size=8)
    df = out.to_pandas().sort_values("item_id", ignore_index=True)
    assert list(df.columns) == ["item_id", "kind", "meta",
                                "features", "payload_bytes"]
    assert len(df) == 32
    assert all(len(f) == 16 for f in df["features"])
    # deterministic: same payload -> same features
    df2 = decode_media(ray.data.from_arrow(t), fake=True,
                       concurrency=(1, 2), batch_size=8).to_pandas()
    df2 = df2.sort_values("item_id", ignore_index=True)
    assert all(np.allclose(a, b)
               for a, b in zip(df["features"], df2["features"]))


def test_frame_sampler_flatmap_shape():
    t = synth_media_table(32)
    ds = ray.data.from_arrow(t)
    out = sample_frames(ds, every_k=2, fake=True,
                        concurrency=(1, 2), batch_size=8)
    df = out.to_pandas()
    n_videos = sum(1 for k in t["kind"].to_pylist() if k == "video")
    assert df["item_id"].nunique() == n_videos
    assert (df["frame_idx"] % 2 == 0).all()
    assert df["frame"].map(len).gt(0).all()
