"""Distributed Bloom filter: no false negatives, FP rate near theory,
and the semi-filter + exact-join composition equals the plain semi-join."""

import numpy as np
import pandas as pd

import ray.data

from abslog_ray.stages.bloom import bloom_semi_filter, build_bloom


def test_bloom_no_false_negatives_and_fp_rate(ray_session):
    rng = np.random.default_rng(0)
    present = rng.choice(10**9, 20000, replace=False).astype(np.int64)
    build = ray.data.from_pandas(
        pd.DataFrame({"k": present})).repartition(8)
    nb, k = 1 << 20, 5
    bm = build_bloom(build, "k", n_bits=nb, k=k)

    absent = np.setdiff1d(
        rng.choice(10**9, 50000, replace=False).astype(np.int64), present)
    probe = ray.data.from_pandas(
        pd.DataFrame({"k": np.concatenate([present, absent])})
    ).repartition(6)
    out = bloom_semi_filter(probe, "k", bm, nb, k=k) \
        .to_pandas()["k"].to_numpy()

    assert np.isin(present, out).all()          # never drops a member
    fp = np.isin(absent, out).mean()
    theo = (1 - np.exp(-k * len(present) / nb)) ** k
    assert fp <= 3 * theo + 1e-4


def test_bloom_string_keys(ray_session):
    vals = np.array([f"doc-{i}" for i in range(500)], dtype=object)
    build = ray.data.from_pandas(pd.DataFrame({"k": vals[:300]}))
    nb, k = 1 << 16, 5
    bm = build_bloom(build, "k", n_bits=nb, k=k)
    probe = ray.data.from_pandas(pd.DataFrame({"k": vals}))
    out = set(bloom_semi_filter(probe, "k", bm, nb, k=k)
              .to_pandas()["k"])
    assert set(vals[:300]) <= out               # supersets the build set
    assert len(out) < 400                       # and actually filters
