"""kmeans_assign: exact-integer Lloyd's iterations vs a local reference."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from abslog_ray.stages.cluster import _dist2, _quantize, kmeans_assign


def _reference(emb: np.ndarray, k: int, iters: int, scale: int):
    """Single-process mirror of the distributed rules (same quantize,
    init-by-smallest-ids, first-occurrence argmin, half-up update)."""
    q = _quantize(emb.astype(np.float64), scale)
    cents = q[:k].copy()                      # ids are 0..n-1 in order
    for _ in range(iters):
        a = np.argmin(_dist2(q, cents), axis=1)
        if len(np.unique(a)) < k:
            raise ValueError("empty cluster")
        for c in range(k):
            m = q[a == c]
            cents[c] = (2 * m.sum(axis=0) + len(m)) // (2 * len(m))
    d2 = _dist2(q, cents)
    a = np.argmin(d2, axis=1)
    return a, d2[np.arange(len(a)), a]


def test_kmeans_matches_local_reference():
    rng = np.random.default_rng(11)
    emb = (rng.standard_normal((120, 6)) * 0.2).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(120, dtype=np.int64),
                       "embedding": list(emb)})
    want_a, want_d2 = _reference(emb, k=4, iters=3, scale=1000)

    # partitioning / row order must not change anything: shuffled input,
    # several blocks
    shuf = df.sample(frac=1.0, random_state=5).reset_index(drop=True)
    ds = ray.data.from_pandas(shuf).repartition(7)
    got = (kmeans_assign(ds, k=4, iters=3, scale=1000)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    assert got["cluster"].tolist() == want_a.tolist()
    assert got["d2"].tolist() == want_d2.tolist()
    assert got["cluster"].dtype == np.int64 and got["d2"].dtype == np.int64


def test_pca_project_matches_local_reference():
    from abslog_ray.stages.pca import (_components_from_cov,
                                       covariance_int, pca_project)

    rng = np.random.default_rng(21)
    # anisotropic cloud so the top components are unambiguous
    base = rng.standard_normal((200, 5)) * np.array([5, 2, 1, .5, .1])
    emb = (base * 0.05).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(200, dtype=np.int64),
                       "embedding": list(emb)})
    ds = ray.data.from_pandas(
        df.sample(frac=1.0, random_state=3).reset_index(drop=True)
    ).repartition(5)

    # local reference: same quantized covariance + the same driver math
    x = emb.astype(np.float64)
    q = np.floor(x * 1000 + 0.5).astype(np.int64)
    n = len(q)
    sij = q.T @ q
    si = q.sum(axis=0)
    cov_num = n * sij - np.outer(si, si)
    ii, jj = np.triu_indices(5)
    cov_df = pd.DataFrame({"i": ii, "j": jj, "n": n, "si": si[ii],
                           "sj": si[jj], "cov_num": cov_num[ii, jj]})
    comp, eigvals = _components_from_cov(cov_df, 5, 1000, 2)
    want = (x - q.sum(axis=0) / (n * 1000.0)) @ comp.T
    assert eigvals[0] > eigvals[1] > 0

    got = (pca_project(ds, n_components=2, scale=1000)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    np.testing.assert_allclose(got[["pc1", "pc2"]].to_numpy(), want,
                               rtol=0, atol=1e-12)

    # the distributed covariance itself is exact-integer identical
    cov_ds = (covariance_int(ds, scale=1000).to_pandas()
              .sort_values(["i", "j"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        cov_ds, cov_df.sort_values(["i", "j"]).reset_index(drop=True),
        check_dtype=False)


def test_kmeans_empty_cluster_raises():
    # vectors 0 and 1 are identical, so every point ties between their
    # two centroids and the smaller cid wins -> cluster 1 empties.
    rng = np.random.default_rng(12)
    emb = (rng.standard_normal((30, 4)) * 0.2).astype(np.float32)
    emb[1] = emb[0]
    df = pd.DataFrame({"vec_id": np.arange(30, dtype=np.int64),
                       "embedding": list(emb)})
    with pytest.raises(ValueError, match="emptied"):
        kmeans_assign(ray.data.from_pandas(df), k=3, iters=1, scale=1000)


def _pr_reference(edges, n, iters):
    """Single-process mirror of stages.graph.pagerank's integer rules."""
    from abslog_ray.stages.graph import PR_SCALE
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    base = (3 * PR_SCALE) // (20 * n)
    pr = {i: PR_SCALE // n for i in range(n)}
    for _ in range(iters):
        inc = {i: 0 for i in range(n)}
        for u, nbrs in adj.items():
            d = len(nbrs)
            for v in nbrs:
                inc[v] += pr[u] // d
        pr = {i: base + (17 * inc[i]) // 20 for i in range(n)}
    return pr


def test_pagerank_matches_local_reference():
    """Star + chain + isolated nodes, shuffled multi-block input: the
    distributed fixed-point PageRank equals the single-process mirror
    exactly (int64, no float tolerance), and the hub out-ranks leaves."""
    from abslog_ray.stages.graph import pagerank

    # hub 0 with leaves 1..5, chain 6-7-8, isolated 9
    edges = [(0, i) for i in range(1, 6)] + [(6, 7), (7, 8)]
    want = _pr_reference(edges, n=10, iters=4)

    eds = pd.DataFrame({"a": [e[0] for e in edges],
                        "b": [e[1] for e in edges]}).astype(np.int64)
    nodes = pd.DataFrame({"id": np.arange(10, dtype=np.int64)})
    got = pagerank(ray.data.from_pandas(eds).repartition(3),
                   ray.data.from_pandas(nodes).repartition(2),
                   iters=4, n_buckets=4).to_pandas()
    got = dict(zip(got["id"].astype(int), got["pr"].astype(int)))
    assert got == want
    assert got[0] > max(got[i] for i in range(1, 6))   # hub > leaves
    assert got[9] == min(got.values())                 # isolated floor
