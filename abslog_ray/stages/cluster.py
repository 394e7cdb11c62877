"""Distributed Lloyd's k-means over an embedding column.

Every comparison in the loop is EXACT integer arithmetic so a
fixed-iteration run is a pure function of the input (bit-equal to the
unrolled DuckDB CTE mirror in queries.py), while keeping the canonical
scalable shape:

- vectors quantize once per pass to int64 — ``floor(x*scale + 0.5) +
  scale``; the ``+scale`` offset keeps every coordinate positive (the
  embeddings are assumed normalized, |x| < 1) so the round-half-up
  centroid division below is plain floor division on both the engine
  and the SQL mirror, and it cancels out of every distance;
- distances are integer squared-Euclidean (one matmul per batch against
  the broadcast k x d centroid matrix), argmin ties break to the
  smallest cluster id (numpy argmin first-occurrence == SQL
  ``row_number() over (order by d2, cid)``);
- centroid updates round each coordinate half-up to the nearest integer
  (``(2*sum + n) // (2*n)`` — positive operands, so floor == truncate
  on every engine);
- each batch emits pre-combined (cluster, dim, sum, count) partials;
  after the keys-sized two-phase reduce only k*d rows ever reach the
  driver per iteration.

Initial centroids are the vectors of the k smallest ids (rank order =
cluster id) — deterministic and shippable to any SQL engine as
``order by id limit k``.

The input Dataset is re-executed once per iteration (init fetch +
``iters`` update passes + the final assignment pass).  At 100 TB that
is the streaming-friendly choice: re-reading pruned Parquet columns
beats pinning a quantized copy of the corpus in the object store.

Int64 bounds (document per deployment): with scale=10**4 a coordinate
is < 2*10**4, one squared distance < d * 1.6*10**9, and a per-cluster
coordinate sum stays exact past 4*10**14 rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from abslog_ray.stages.similarity import _stack_embeddings


def _quantize(x: np.ndarray, scale: int) -> np.ndarray:
    return np.floor(x * float(scale) + 0.5).astype(np.int64) + scale


def _dist2(x_q: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Integer squared-Euclidean distances, (n, k)."""
    return ((x_q * x_q).sum(axis=1, keepdims=True)
            - 2 * (x_q @ cents.T)
            + (cents * cents).sum(axis=1))


def kmeans_assign(ds, k: int = 8, iters: int = 2, scale: int = 10_000,
                  id_col: str = "vec_id", col: str = "embedding",
                  n_buckets: int = 4):
    """Fixed-iteration exact-integer k-means; returns (id, cluster, d2).

    ``iters`` centroid updates, then one final assignment pass.  Raises
    if a cluster empties (the SQL mirror assumes every cluster keeps
    members; surface it loudly instead of diverging silently).
    """
    from abslog_ray.stages.aggregate import distributed_top_k, hash_aggregate

    ids = distributed_top_k(ds.select_columns([id_col]), k,
                            [id_col], [False]).to_pandas()
    init_ids = sorted(int(v) for v in ids[id_col])

    def fetch(t: pa.Table) -> pa.Table:
        m = pc.is_in(t[id_col], value_set=pa.array(init_ids, pa.int64()))
        return t.filter(m)

    seed = (ds.select_columns([id_col, col])
            .map_batches(fetch, batch_format="pyarrow")
            .to_pandas().sort_values(id_col))       # exactly k rows
    cents = _quantize(np.stack([np.asarray(v, dtype=np.float64)
                                for v in seed[col]]), scale)
    dim = cents.shape[1]

    def make_partial(ref):
        def partial(t: pa.Table) -> pa.Table:
            c = ray.get(ref)
            x_q = _quantize(_stack_embeddings(t, col=col), scale)
            a = np.argmin(_dist2(x_q, c), axis=1)
            sums = np.zeros((k, dim), np.int64)
            np.add.at(sums, a, x_q)
            cnt = np.bincount(a, minlength=k).astype(np.int64)
            nz = np.flatnonzero(cnt)
            return pa.table({
                "cid": np.repeat(nz, dim).astype(np.int64),
                "dim": np.tile(np.arange(dim, dtype=np.int64), len(nz)),
                "s": sums[nz].ravel(),
                "n": np.repeat(cnt[nz], dim),
            })
        return partial

    for _ in range(iters):
        ref = ray.put(cents)
        agg = hash_aggregate(
            ds.select_columns([id_col, col])
            .map_batches(make_partial(ref), batch_format="pyarrow"),
            ["cid", "dim"], {"s": ("s", "sum"), "n": ("n", "sum")},
            n_buckets=n_buckets).to_pandas()        # <= k*dim rows
        if agg["cid"].nunique() < k:
            raise ValueError(
                f"k-means cluster emptied ({agg['cid'].nunique()} of {k} "
                "survive); re-seed or lower k")
        agg = agg.sort_values(["cid", "dim"])
        s = agg["s"].to_numpy().reshape(k, dim)
        n = agg["n"].to_numpy().reshape(k, dim)
        cents = (2 * s + n) // (2 * n)

    ref = ray.put(cents)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(ref)
        x_q = _quantize(_stack_embeddings(t, col=col), scale)
        d2 = _dist2(x_q, c)
        a = np.argmin(d2, axis=1)
        return pa.table({
            id_col: t[id_col],
            "cluster": a.astype(np.int64),
            "d2": d2[np.arange(len(a)), a],
        })

    return ds.select_columns([id_col, col]).map_batches(
        assign, batch_format="pyarrow")
