"""Deterministic sampling + decontamination + IVF ANN + rolling window
(round-4 breadth operators; each also has a DuckDB oracle in the query
registry — these tests pin block-layout invariance and the semantics the
SQL can't express, like determinism across repartition)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from abslog_ray.stages.sample import hash_sample, lcg_hash, stratified_sample


def _docs_df(n=400, seed=3):
    rng = np.random.default_rng(seed)
    langs = np.array(["en", "de", "fr", "zz"])[
        rng.choice(4, n, p=[0.7, 0.15, 0.1, 0.05])]
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "lang": langs,
        "text": [f"doc {i} body" for i in range(n)],
    })


def test_hash_sample_deterministic_and_layout_invariant():
    df = _docs_df()
    ds = ray.data.from_pandas(df)
    got = hash_sample(ds, permille=200, id_col="doc_id").to_pandas()
    # exact membership = the hash rule, independent of Ray
    h = lcg_hash(df["doc_id"].to_numpy())
    want = df[h % 1000 < 200]
    assert sorted(got["doc_id"]) == sorted(want["doc_id"])
    # rate lands near 20% (binomial, not exact)
    assert 0.12 < len(got) / len(df) < 0.28
    # block layout does not change the sample
    got2 = hash_sample(ray.data.from_pandas(df).repartition(7),
                       permille=200, id_col="doc_id").to_pandas()
    assert sorted(got2["doc_id"]) == sorted(got["doc_id"])


def test_stratified_sample_fixed_size_per_stratum():
    df = _docs_df()
    m = 15
    got = stratified_sample(ray.data.from_pandas(df).repartition(5),
                            "lang", m=m, id_col="doc_id").to_pandas()
    sizes = got.groupby("lang").size()
    for lang, n_in_stratum in df.groupby("lang").size().items():
        assert sizes[lang] == min(m, n_in_stratum)
    # per-stratum members = globally smallest (hash, id) — the SQL rule
    h = lcg_hash(df["doc_id"].to_numpy())
    ref = (df.assign(__h=h)
             .sort_values(["__h", "doc_id"], kind="mergesort")
             .groupby("lang").head(m))
    assert sorted(got["doc_id"]) == sorted(ref["doc_id"])


def test_contamination_planted_overlap():
    from abslog_ray.stages.dedup import contamination
    # train docs 1,2,3; test doc 10.  doc1 shares two distinct trigrams
    # with the test doc, doc2 shares one, doc3 shares none.
    rows = pd.DataFrame({
        "doc_id": np.array([1, 2, 3, 10], dtype=np.int64),
        "text": [
            "alpha beta gamma delta",        # trigrams: abg, bgd
            "zz yy alpha beta gamma",        # shares 'alpha beta gamma'
            "completely different words here",
            "alpha beta gamma delta",        # test doc
        ],
    })
    train = ray.data.from_pandas(rows[rows.doc_id != 10])
    test = ray.data.from_pandas(rows[rows.doc_id == 10])
    got = (contamination(train, test, n=3, n_buckets=4).to_pandas()
           .sort_values("doc_id", ignore_index=True))
    assert got["doc_id"].tolist() == [1, 2]
    assert got["n_shared"].tolist() == [2, 1]


def test_ivf_ann_matches_reference_restriction():
    """ivf_ann == brute-force ranking restricted to the probed inverted
    lists (an independent numpy re-derivation of assignment + probing)."""
    from abslog_ray.stages.similarity import ivf_ann
    rng = np.random.default_rng(17)
    n, dim, stride, nprobe, k = 200, 16, 20, 3, 5
    E = rng.normal(size=(n, dim))
    df = pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [E[i] for i in range(n)],
    })
    qids = [0, 7, 33]
    got = ivf_ann(ray.data.from_pandas(df).repartition(4), qids, k=k,
                  centroid_stride=stride, nprobe=nprobe).to_pandas()
    got = got.sort_values(["query_id", "rank"], ignore_index=True)

    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    c_ids = np.arange(0, n, stride)
    C = En[c_ids]
    assign = np.argmax(np.round(En @ C.T, 6), axis=1)
    for q in qids:
        qs = np.round(En[q] @ C.T, 6)
        probes = np.lexsort((c_ids, -qs))[:nprobe]
        cand = np.flatnonzero(np.isin(assign, probes))
        cand = cand[cand != q]
        sims = np.round(En[cand] @ En[q], 6)
        sel = np.lexsort((cand, -sims))[:k]
        sub = got[got.query_id == q]
        assert sub["neighbor_id"].tolist() == cand[sel].tolist()
        assert np.allclose(sub["sim"].to_numpy(), sims[sel])
        assert sub["rank"].tolist() == list(range(1, len(sel) + 1))


def test_rolling_mean_matches_pandas():
    from abslog_ray.stages.windows import rolling_mean
    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "role": np.repeat(["a", "b", "c"], 40),
        "minute": np.tile(np.arange(40, dtype=np.int64), 3),
        "hits": rng.integers(0, 100, 120).astype(np.int64),
    })
    shuffled = df.sample(frac=1, random_state=1).reset_index(drop=True)
    got = rolling_mean(ray.data.from_pandas(shuffled).repartition(4),
                       key_cols="role", order_col="minute",
                       value_cols="hits", window=5,
                       n_buckets=4).to_pandas()
    got = got.sort_values(["role", "minute"], ignore_index=True)
    want = df.sort_values(["role", "minute"], ignore_index=True)
    want["hits_roll"] = (want.groupby("role")["hits"]
                         .rolling(5, min_periods=1).mean()
                         .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["role", "minute", "hits", "hits_roll"]], want)


def test_pack_sequences_greedy_semantics(ray_session):
    """pack_sequences: greedy fill to the budget, oversized doc packs
    alone, streams independent, invariant to block layout."""
    from abslog_ray.stages.sample import pack_sequences
    df = pd.DataFrame({
        "doc_id": np.array([0, 2, 4, 6, 8, 1, 3], dtype=np.int64),
        # stream 0 (ids 0,2,4,6,8): 60+50 fit 150; +70 would be 180 > 150
        # -> new pack; 200 oversized packs ALONE; 10 starts after it
        # stream 1 (ids 1,3): 100+50 fits one pack
        "n_tokens": np.array([60, 50, 70, 200, 10, 100, 50],
                             dtype=np.int64),
    })
    got = (pack_sequences(ray.data.from_pandas(df).repartition(3),
                          budget=150, n_streams=2)
           .to_pandas().sort_values("doc_id", ignore_index=True))
    by = dict(zip(got["doc_id"], zip(got["stream"], got["pack"])))
    assert by[0] == (0, 0) and by[2] == (0, 0)     # 60+50 = 110 <= 150
    assert by[4] == (0, 1)                         # would overflow
    assert by[6] == (0, 2)                         # oversized, alone
    assert by[8] == (0, 3)                         # after oversized
    assert by[1] == (1, 0) and by[3] == (1, 0)     # 100+50 = 150 fits
    # per-pack totals never exceed the budget except oversized singles
    tot = got.groupby(["stream", "pack"])["n_tokens"].agg(["sum", "size"])
    bad = tot[(tot["sum"] > 150) & (tot["size"] > 1)]
    assert bad.empty


def test_shuffle_rank_is_exact_permutation(ray_session):
    """shuffle_rank == a local argsort over (lcg_hash, id): positions are
    a 0..n-1 permutation, identical under repartitioning, bucket
    boundaries exact (hash top-bits ordering)."""
    from abslog_ray.stages.sample import lcg_hash, shuffle_rank
    ids = np.arange(0, 700, 7, dtype=np.int64)       # 100 docs, gappy ids
    df = pd.DataFrame({"doc_id": ids})
    h = lcg_hash(ids, seed=0)
    want_order = np.lexsort((ids, h))
    want_pos = np.empty(len(ids), dtype=np.int64)
    want_pos[want_order] = np.arange(len(ids))
    want = dict(zip(ids, want_pos))

    for parts in (1, 5):
        got = (shuffle_rank(ray.data.from_pandas(df).repartition(parts),
                            n_buckets=8)
               .to_pandas().sort_values("doc_id", ignore_index=True))
        assert sorted(got["pos"]) == list(range(len(ids)))
        assert all(want[d] == p for d, p in zip(got["doc_id"],
                                                got["pos"])), parts
