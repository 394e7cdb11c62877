"""Deterministic sampling operators (SURVEY §2 K4 is n/a for the
reference — abs-log never samples — but a training-data pipeline does;
driver brief lists sampling among the scale operations).

Both samplers are DETERMINISTIC functions of the row's id, not of block
layout, execution order, or a driver RNG:

- ``hash_sample``: proportional p‰ sample — keep a row iff a seeded LCG
  hash of its id lands under the threshold.  Map-only (no shuffle, no
  state, no coordination); the same rows are kept on any cluster shape,
  across resumes, and in the DuckDB oracle, which reproduces the integer
  recurrence exactly (same device as the LSH planes).
- ``stratified_sample``: the ``m`` rows with the SMALLEST hash per
  stratum (equal-size strata regardless of skew).  Two-phase: each batch
  pre-trims to its local m-per-stratum, then one keys-sized groupby
  merges — the driver/final stage sees O(strata · m) rows, never the
  table.

The LCG is double-stepped and pre-reduced mod M so every product stays
inside int64 for numpy (ids up to 2⁶³ are safe) and inside BIGINT for the
SQL mirror.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from abslog_ray.stages.similarity import _LCG_A, _LCG_C, _LCG_M


def lcg_hash(ids: np.ndarray, seed: int = 0) -> np.ndarray:
    """Seeded double-stepped LCG over the id: uniform in [0, 2³¹)."""
    x = (ids.astype(np.int64) + np.int64(seed)) % _LCG_M
    s1 = (_LCG_A * x + _LCG_C) % _LCG_M
    return (_LCG_A * s1 + _LCG_C) % _LCG_M


def hash_sample(ds, permille: int, id_col="doc_id", seed: int = 0):
    """Keep each row iff lcg_hash(id) ‰ 1000 < ``permille`` — an exact,
    resumable p‰ Bernoulli sample.  Pure map stage: scales linearly."""

    def flt(t: pa.Table) -> pa.Table:
        h = lcg_hash(t[id_col].to_numpy(zero_copy_only=False), seed)
        return t.filter(pa.array(h % 1000 < permille))

    return ds.map_batches(flt, batch_format="pyarrow")


def stratified_sample(ds, stratum_col: str, m: int, id_col="doc_id",
                      seed: int = 0):
    """The ``m`` rows with the smallest (lcg_hash(id), id) per stratum —
    a uniform-without-replacement fixed-size sample per group, ties
    impossible because id breaks them.  Per-batch pre-trim keeps at most
    m rows per stratum in flight; the final per-stratum merge is
    keys-sized."""

    H = "__h"

    def trim(t: pa.Table) -> pa.Table:
        h = lcg_hash(t[id_col].to_numpy(zero_copy_only=False), seed)
        t = t.append_column(H, pa.array(h))
        df = t.to_pandas()
        df = (df.sort_values([H, id_col], kind="mergesort")
                .groupby(stratum_col, sort=False).head(m))
        return pa.Table.from_pandas(df, preserve_index=False)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([H, id_col], kind="mergesort").head(m)
        return df.drop(columns=[H])

    trimmed = ds.map_batches(trim, batch_format="pyarrow")
    return trimmed.groupby(stratum_col).map_groups(final,
                                                   batch_format="pandas")


def dataset_split(ds, id_col="doc_id", seed: int = 0,
                  bounds=(800, 900)):
    """Deterministic train/val/test assignment: split by the same
    seeded LCG hash as ``hash_sample`` (train < bounds[0]‰ ≤ val <
    bounds[1]‰ ≤ test).  Pure map stage — the assignment is a function
    of the id alone, so it is identical under any cluster shape,
    re-execution, or resume, and train/test never leak across runs."""

    def assign(t: pa.Table) -> pa.Table:
        h = lcg_hash(t[id_col].to_numpy(zero_copy_only=False),
                     seed) % 1000
        split = np.where(h < bounds[0], "train",
                         np.where(h < bounds[1], "val", "test"))
        return t.append_column("split", pa.array(split.astype(object),
                                                 pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")


def pack_sequences(ds, budget: int, n_streams: int = 8,
                   id_col: str = "doc_id", tokens_col: str = "n_tokens"):
    """Greedy sequence packing: assign each doc a (stream, pack) so that
    consecutive docs of a stream share a pack while their token total
    stays <= ``budget`` (a doc longer than the budget gets a pack of its
    own) — the batch-construction step that turns a filtered corpus into
    fixed-token-budget training rows.

    Packing is inherently sequential, so it runs per STREAM:
    ``stream = id mod n_streams`` (deterministic + SQL-mirrorable; at
    scale use the hash-bucket variant and one stream per partition).
    Streams pack independently and in parallel — one keyed shuffle
    brings a stream's (id, n_tokens) rows together, and the in-stream
    kernel loops once per PACK (searchsorted over the running token
    cumsum), not per row.

    Input needs ``tokens_col`` precomputed (token_stats does this in one
    map); output is (id, stream, pack, n_tokens) — keys-sized metadata,
    the text itself never enters the shuffle."""
    from abslog_ray.stages.gaps import BUCKET_COL

    def tag(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: t[id_col],
            tokens_col: t[tokens_col],
            BUCKET_COL: pa.array((ids % n_streams).astype(np.int64)),
        })

    def pack_stream(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_col, ignore_index=True)
        stream = int(df[BUCKET_COL].iloc[0]) if len(df) else 0
        toks = df[tokens_col].to_numpy().astype(np.int64)
        cum = np.cumsum(toks)
        n = len(df)
        pack = np.empty(n, dtype=np.int64)
        idx, p, base = 0, 0, 0
        while idx < n:                      # one iteration per PACK
            end = int(np.searchsorted(cum, base + budget, side="right"))
            if end <= idx:                  # oversized doc: own pack
                end = idx + 1
            pack[idx:end] = p
            base = int(cum[end - 1])
            idx, p = end, p + 1
        return pd.DataFrame({
            id_col: df[id_col],
            "stream": np.full(n, stream, dtype=np.int64),
            "pack": pack,
            tokens_col: toks,
        })

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    return tagged.groupby(BUCKET_COL).map_groups(
        lambda df: pack_stream(df), batch_format="pandas")


def shuffle_rank(ds, id_col: str = "doc_id", seed: int = 0,
                 n_buckets: int = 32):
    """Deterministic global training-order shuffle: every row gets its
    0-based position in the permutation ordered by
    (lcg_hash(id, seed), id) — the reproducible epoch shuffle a training
    pipeline needs (same order on any cluster shape, across resumes, and
    in the SQL mirror's ``row_number() over (order by ...)``).

    Distributed enumerate, no global sort: the hash's TOP bits pick a
    bucket, so bucket index ranges are already ordered (every hash in
    bucket b sorts before every hash in bucket b+1); per-bucket counts
    (keys-sized, one tiny driver pull) prefix-sum into bucket offsets,
    and each bucket ranks locally by (hash, id) — one keyed shuffle
    total, O(n_buckets) driver state."""
    import ray

    from abslog_ray.stages.gaps import BUCKET_COL

    # _LCG_M is 2**31-ish; carve ordered buckets from the hash range
    width = (_LCG_M + n_buckets - 1) // n_buckets

    def tag(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        h = lcg_hash(ids, seed)
        return pa.table({
            id_col: t[id_col],
            "__h": pa.array(h.astype(np.int64)),
            BUCKET_COL: pa.array((h // width).astype(np.int64)),
        })

    tagged = ds.map_batches(tag, batch_format="pyarrow").materialize()

    def bucket_counts(t: pa.Table) -> pa.Table:
        b = t[BUCKET_COL].to_numpy(zero_copy_only=False)
        u, c = np.unique(b, return_counts=True)
        return pa.table({"b": pa.array(u.astype(np.int64)),
                         "c": pa.array(c.astype(np.int64))})

    cnt = (tagged.map_batches(bucket_counts, batch_format="pyarrow")
           .to_pandas().groupby("b")["c"].sum())
    offsets = np.zeros(n_buckets, dtype=np.int64)
    sizes = np.zeros(n_buckets, dtype=np.int64)
    sizes[cnt.index.to_numpy()] = cnt.to_numpy()
    np.cumsum(sizes[:-1], out=offsets[1:])
    off_ref = ray.put(offsets)

    def rank_bucket(df: pd.DataFrame) -> pd.DataFrame:
        b = int(df[BUCKET_COL].iloc[0])
        off = ray.get(off_ref)[b]
        order = np.lexsort((df[id_col].to_numpy(), df["__h"].to_numpy()))
        pos = np.empty(len(df), dtype=np.int64)
        pos[order] = off + np.arange(len(df), dtype=np.int64)
        return pd.DataFrame({id_col: df[id_col].to_numpy(),
                             "pos": pos})

    return tagged.groupby(BUCKET_COL).map_groups(rank_bucket,
                                                 batch_format="pandas")
