"""Join operators (SURVEY.md §2 J1 scale paths).

The reference has no relational joins — only map-side dict lookups — but a
complete engine needs them.  Three shapes, chosen by side size:

- ``broadcast_join``: small right side. `ray.put` once, vectorized pandas
  merge per batch inside map_batches.  No shuffle.
- ``bucket_join``: both sides large. One keyed shuffle: both sides are
  tagged, schema-aligned, unioned, bucket-hashed on the key, and each
  bucket is merged with one vectorized pandas merge.  This is an explicit
  partitioned hash join expressed purely in Dataset primitives (union +
  groupby) — Ray 2.49's native ``Dataset.join`` requires the hash-shuffle
  strategy which measured ~3x slower on this host (BASELINE.md).
- ``semi_join`` / ``anti_join``: broadcast key set, filter inside
  map_batches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

SIDE_COL = "__side"


def broadcast_join(ds, right_df: pd.DataFrame, on, how: str = "left"):
    """Small-side join: right_df is broadcast once per actor/task."""
    import ray
    ref = ray.put(right_df)
    on = [on] if isinstance(on, str) else list(on)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        r = ray.get(ref)
        return df.merge(r, on=on, how=how)

    return ds.map_batches(fn, batch_format="pandas")


def _align(df: pd.DataFrame, all_cols: list) -> pd.DataFrame:
    for c in all_cols:
        if c not in df.columns:
            df[c] = None
    return df[all_cols]


def bucket_join(left, right, on, how: str = "inner",
                n_buckets: int = 32, suffixes=("", "_r")):
    """Partitioned hash join: tag → align → union → bucket shuffle →
    per-bucket vectorized merge.  Exactly one all-to-all exchange; skewed
    keys spread across buckets by the hash of the full key."""
    from abslog_ray.stages.aggregate import KEY_BUCKET, add_key_bucket_fn

    on = [on] if isinstance(on, str) else list(on)
    lcols = left.schema().names
    rcols = right.schema().names
    shared = [c for c in lcols if c in rcols and c not in on]
    all_cols = on + [c for c in lcols if c not in on] + \
        [c + suffixes[1] if c in shared else c
         for c in rcols if c not in on]

    def tag(side):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            if side == "r":
                df = df.rename(columns={c: c + suffixes[1] for c in shared})
            df[SIDE_COL] = side
            return _align(df, all_cols + [SIDE_COL])
        return fn

    both = left.map_batches(tag("l"), batch_format="pandas").union(
        right.map_batches(tag("r"), batch_format="pandas"))
    both = both.map_batches(add_key_bucket_fn(n_buckets, keys=on),
                            batch_format="pyarrow")

    l_only = [c for c in all_cols if c not in on and c in lcols]
    r_only = [c for c in all_cols if c not in on and c not in lcols]

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[KEY_BUCKET])
        l = df[df[SIDE_COL] == "l"][on + l_only]
        r = df[df[SIDE_COL] == "r"][on + r_only]
        return l.merge(r, on=on, how=how)

    return both.groupby(KEY_BUCKET).map_groups(merge, batch_format="pandas")


def semi_join(ds, keys_df: pd.DataFrame, on: str, anti: bool = False):
    """Broadcast key-set filter (semi/anti join)."""
    import ray
    keyset = ray.put(np.unique(keys_df[on].to_numpy()))

    def fn(batch: pa.Table) -> pa.Table:
        ks = ray.get(keyset)
        vals = batch[on].to_numpy(zero_copy_only=False)
        mask = np.isin(vals, ks)
        if anti:
            mask = ~mask
        return batch.filter(pa.array(mask))

    return ds.map_batches(fn, batch_format="pyarrow")
