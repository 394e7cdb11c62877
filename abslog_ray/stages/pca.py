"""Distributed covariance + PCA over an embedding column.

Two pieces, sharing one scale shape:

- ``covariance_int``: the upper-triangle covariance NUMERATOR matrix
  from EXACT integer sums — coordinates quantize to int64
  (floor(x*scale + 0.5)), each batch emits one pre-combined partial per
  (i, j) pair (a single d x d integer matmul), and the keys-sized
  two-phase reduce leaves ``cov_num = n*Σxixj − Σxi*Σxj`` — the
  population covariance times n², an exact integer, so the result is
  hash-identical to any SQL engine.  Only d*(d+1)/2 rows per partial
  cross the shuffle; raw vectors never do.
  Int64 bound: with scale=10**4 and |x|<1, n*Σxixj stays exact past
  ~9*10**9 rows at d<=64; re-quantize for more.

- ``pca_project``: eigendecomposition of that (float-normalized)
  covariance on the driver (d x d is tiny), deterministic component
  signs (largest-|coordinate| made positive, ties to the lower index),
  then one broadcast matmul per batch to emit the top-``n_components``
  scores per row.  Eigenvector floats are LAPACK-determined, so this
  operator is pinned by pytest against a single-process reference
  rather than a SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from abslog_ray.stages.similarity import _stack_embeddings


def _tri_index(dim: int):
    i, j = np.triu_indices(dim)
    return i.astype(np.int64), j.astype(np.int64)


def covariance_int(ds, scale: int = 10_000, col: str = "embedding",
                   n_buckets: int = 4):
    """(i, j, n, cov_num) for i <= j; cov_num = n*Sxy - Sx*Sy, exact."""
    from abslog_ray.stages.aggregate import hash_aggregate

    def partial(t: pa.Table) -> pa.Table:
        x = np.floor(_stack_embeddings(t, col=col) * float(scale)
                     + 0.5).astype(np.int64)
        dim = x.shape[1]
        ii, jj = _tri_index(dim)
        s = x.T @ x                       # d x d exact int64
        cs = x.sum(axis=0)
        n = np.full(len(ii), x.shape[0], dtype=np.int64)
        return pa.table({"i": ii, "j": jj, "sij": s[ii, jj],
                         "si": cs[ii], "sj": cs[jj], "n": n})

    sums = hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"), ["i", "j"],
        {"sij": ("sij", "sum"), "si": ("si", "sum"),
         "sj": ("sj", "sum"), "n": ("n", "sum")}, n_buckets=n_buckets)

    def finalize(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy()
        cov = n * t["sij"].to_numpy() \
            - t["si"].to_numpy() * t["sj"].to_numpy()
        return pa.table({"i": t["i"], "j": t["j"], "n": pa.array(n),
                         "si": t["si"], "sj": t["sj"],
                         "cov_num": pa.array(cov)})

    return sums.map_batches(finalize, batch_format="pyarrow")


def _components_from_cov(cov_df, dim: int, scale: int, n_components: int):
    """Driver-side eigh over the keys-sized covariance table."""
    n = int(cov_df["n"].iloc[0])
    c = np.zeros((dim, dim), dtype=np.float64)
    i = cov_df["i"].to_numpy()
    j = cov_df["j"].to_numpy()
    v = cov_df["cov_num"].to_numpy().astype(np.float64) \
        / (float(n) * n * scale * scale)
    c[i, j] = v
    c[j, i] = v
    w, vec = np.linalg.eigh(c)
    order = np.argsort(w)[::-1][:n_components]
    comp = vec[:, order].T                      # (n_components, dim)
    # deterministic signs: the largest-|.| coordinate (lowest index on
    # ties) of each component is made positive
    for r in range(comp.shape[0]):
        a = np.abs(comp[r])
        k = int(np.argmax(a))
        if comp[r, k] < 0:
            comp[r] = -comp[r]
    return comp, w[order]


def pca_project(ds, n_components: int = 2, scale: int = 10_000,
                id_col: str = "vec_id", col: str = "embedding",
                n_buckets: int = 4):
    """(id, pc1..pcK): scores against the top principal components."""
    cov = covariance_int(ds.select_columns([col]), scale=scale, col=col,
                         n_buckets=n_buckets).to_pandas()  # d*(d+1)/2 rows
    dim = int(cov["j"].max()) + 1
    comp, _ = _components_from_cov(cov, dim, scale, n_components)
    # global per-dim mean in original units, from the same exact sums
    n_rows = float(cov["n"].iloc[0])
    diag = cov[cov["i"] == cov["j"]].sort_values("i")
    mean = diag["si"].to_numpy().astype(np.float64) / (n_rows * scale)
    ref = ray.put((comp, mean))

    def project(t: pa.Table) -> pa.Table:
        m, mu = ray.get(ref)
        x = _stack_embeddings(t, col=col) - mu
        sc = x @ m.T
        cols = {id_col: t[id_col]}
        for k in range(m.shape[0]):
            cols[f"pc{k + 1}"] = pa.array(sc[:, k], pa.float64())
        return pa.table(cols)

    return ds.select_columns([id_col, col]).map_batches(
        project, batch_format="pyarrow")
