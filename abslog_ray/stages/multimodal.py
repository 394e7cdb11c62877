"""Multimodal column stages (driver brief: image/audio/video as opaque
``binary`` columns with typed metadata; decode / feature-extract / resize /
frame-sample as actor-pool map_batches stages).

The sandbox has no image/audio libraries, so the DECODE KERNELS are stubbed
(clearly marked ``NotImplementedError`` unless the deterministic fake decoder
is enabled) while all the Ray-side plumbing — schema handling, binary-column
batching, actor signature, output layout — is real and tested:

- payload schema: ``media(item_id:int64, kind:string, payload:binary,
  meta:string(JSON))``
- binary columns stay in ``batch_format="pyarrow"`` end-to-end (pandas would
  box them into object dtype);
- small batches for large payloads: callers should size ``batch_size`` so
  ``batch_size × concurrency × payload`` fits the worker heap (pass e.g.
  ``batch_size=64`` for multi-MB payloads);
- one actor pool per stage; real decoders would load codecs/models in
  ``__init__`` exactly where the fake does its setup.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("item_id", pa.int64()),
    ("kind", pa.string()),
    ("payload", pa.binary()),
    ("meta", pa.string()),
])


def synth_media_table(n: int = 64, seed: int = 0) -> pa.Table:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    payloads = [rng.integers(0, 256, int(sz), dtype=np.uint8).tobytes()
                for sz in rng.integers(512, 4096, n)]
    meta = [json.dumps({"w": int(w), "h": int(h), "dur_ms": int(d)},
                       sort_keys=True)
            for w, h, d in zip(rng.integers(16, 256, n),
                               rng.integers(16, 256, n),
                               rng.integers(100, 9000, n))]
    return pa.table({
        "item_id": pa.array(np.arange(n, dtype=np.int64)),
        "kind": pa.array(kinds.astype(str)),
        "payload": pa.array(payloads, pa.binary()),
        "meta": pa.array(meta, pa.string()),
    })


class MediaDecoder:
    """Actor-pool decode stage.  ``fake=True`` uses a deterministic stand-in
    (sha256-derived 'features'); ``fake=False`` raises until a real codec
    library is available in the image (STUB — see module docstring)."""

    def __init__(self, fake: bool = False, feature_dim: int = 16):
        # real impl would load codecs / models HERE, once per actor
        self.fake = fake
        self.dim = feature_dim

    def _decode_one(self, payload: bytes, kind: str) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "no image/audio codecs in this environment; construct "
                "MediaDecoder(fake=True) for the deterministic stand-in")
        h = hashlib.sha256(payload).digest()
        raw = np.frombuffer((h * ((self.dim * 4) // len(h) + 1))[: self.dim * 4],
                            dtype=np.uint32)
        return (raw % 1000).astype(np.float32) / 1000.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        kinds = batch["kind"].to_pylist()
        feats = np.stack([self._decode_one(p, k)
                          for p, k in zip(payloads, kinds)])
        offs = np.arange(len(payloads) + 1, dtype=np.int32) * self.dim
        feat_col = pa.ListArray.from_arrays(pa.array(offs),
                                            pa.array(feats.reshape(-1)))
        nbytes = pa.array(np.array([len(p) for p in payloads],
                                   dtype=np.int64))
        return (batch.drop_columns(["payload"])
                     .append_column("features", feat_col)
                     .append_column("payload_bytes", nbytes))


class FrameSampler:
    """Actor-pool frame-sample stage for 'video' rows: emits every k-th
    'frame' (fake: fixed-size slices of the payload) as new rows —
    a flat-map-shaped map_batches (output rows != input rows)."""

    def __init__(self, every_k: int = 4, frame_bytes: int = 256,
                 fake: bool = False):
        self.k = every_k
        self.frame_bytes = frame_bytes
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, frames = [], [], []
        for item_id, kind, payload in zip(batch["item_id"].to_pylist(),
                                          batch["kind"].to_pylist(),
                                          batch["payload"].to_pylist()):
            if kind != "video":
                continue
            if not self.fake:
                raise NotImplementedError(
                    "no video codecs in this environment; use fake=True")
            n_frames = max(1, len(payload) // self.frame_bytes)
            for i in range(0, n_frames, self.k):
                ids.append(item_id)
                fidx.append(i)
                frames.append(
                    payload[i * self.frame_bytes:(i + 1) * self.frame_bytes])
        return pa.table({
            "item_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(fidx, pa.int32()),
            "frame": pa.array(frames, pa.binary()),
        })


def decode_media(ds, fake: bool = False, concurrency=(1, 4),
                 batch_size: int = 64):
    """Binary payloads are large: small batch_size, arrow format, actor
    pool — the layout the real decoder would use unchanged."""
    return ds.map_batches(MediaDecoder, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          fn_constructor_kwargs={"fake": fake})


def sample_frames(ds, every_k: int = 4, fake: bool = False,
                  concurrency=(1, 4), batch_size: int = 64):
    return ds.map_batches(FrameSampler, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          fn_constructor_kwargs={"every_k": every_k,
                                                 "fake": fake})
