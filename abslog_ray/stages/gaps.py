"""Turn-gap latency proxy (SURVEY.md §2 J3 — the graft of abs-log's
``request_time`` dimension per BASELINE.json north_star: "p25/p50/p75/p95
latency-proxy quartiles over turn gaps").

``gap_us`` = microseconds since the previous turn of the same conversation
(ordered by ``turn_idx``); null for each conversation's first turn.

Scale design: a naive ``groupby("conv_id").map_groups`` would pay one Python
call per conversation (millions of tiny groups at 10^12 turns).  Instead we
bucket-hash conversations into ``cfg.gap_buckets`` groups — whole
conversations stay together (correctness), each group is a large batch
processed with ONE vectorized pandas sort + diff (throughput).  This is the
explicit keyed shuffle of the pipeline; its payload is narrow (``text`` is
routed to sink A before this stage and dropped here).

The bucket hash is ``pandas.util.hash_array`` (SipHash-1-3 with a fixed key
— deterministic across processes and nodes), so re-runs and resumed runs
place every conversation identically.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

BUCKET_COL = "__bucket"


def add_bucket_fn(col: str, n_buckets: int, out_col: str = BUCKET_COL):
    """map_batches fn: append a stable hash-bucket column for `col`."""
    def fn(batch: pa.Table) -> pa.Table:
        vals = batch[col].to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(vals.astype(object, copy=False)) % n_buckets
        return batch.append_column(out_col, pa.array(h.astype(np.int64)))
    return fn


def compute_gaps_in_bucket(df: pd.DataFrame,
                           max_conv_turns: int = 100_000) -> pd.DataFrame:
    """Vectorized within one bucket of whole conversations."""
    df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort",
                        ignore_index=True)
    conv = df["conv_id"].to_numpy()
    # giant-conversation guard (SURVEY.md §4.2): fail loudly, don't OOM
    _, counts = np.unique(conv, return_counts=True)
    if len(counts) and counts.max() > max_conv_turns:
        raise ValueError(
            f"conversation with {counts.max()} turns exceeds "
            f"max_conv_turns={max_conv_turns}; raise the limit or use the "
            "range-partition fallback documented in SURVEY.md §4.2")
    ts_us = df["ts"].astype("int64").to_numpy()
    gap = np.empty(len(df), dtype=np.int64)
    gap[0:1] = 0
    gap[1:] = ts_us[1:] - ts_us[:-1]
    first = np.empty(len(df), dtype=bool)
    first[0:1] = True
    first[1:] = conv[1:] != conv[:-1]
    df["gap_us"] = pd.array(np.where(first, 0, gap), dtype="Int64")
    df.loc[first, "gap_us"] = pd.NA
    if BUCKET_COL in df.columns:
        df = df.drop(columns=[BUCKET_COL])
    return df


def with_gaps(ds, cfg):
    """Dataset -> Dataset with gap_us:int64 (nullable) appended."""
    from abslog_ray.config import resolve_buckets
    n_buckets = resolve_buckets(cfg.gap_buckets,
                                target_bucket_bytes=cfg.target_bucket_bytes)
    ds = ds.map_batches(add_bucket_fn("conv_id", n_buckets),
                        batch_format="pyarrow")
    max_turns = cfg.max_conv_turns

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return compute_gaps_in_bucket(df, max_turns)

    return ds.groupby(BUCKET_COL).map_groups(fn, batch_format="pandas")
