"""HLL sketch: accuracy, mergeability, and the distributed per-key path."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from abslog_ray.sketches import HLL, _clz64, hll_distinct


def test_clz64():
    vals = np.array([0, 1, 2, 3, 2**63, 2**62, 2**32, 12345], dtype=np.uint64)
    want = [64, 63, 62, 62, 0, 1, 31, 50]
    assert _clz64(vals).tolist() == want


@pytest.mark.parametrize("n", [100, 10_000, 200_000])
def test_hll_accuracy(n):
    rng = np.random.default_rng(n)
    h = rng.integers(0, 2**64, n, dtype=np.uint64)
    h = np.unique(h)
    est = HLL(p=12).add_hashed(h).estimate()
    assert abs(est - len(h)) / len(h) < 0.05


def test_hll_merge_equals_single_shot():
    rng = np.random.default_rng(0)
    h = rng.integers(0, 2**64, 50_000, dtype=np.uint64)
    single = HLL(p=12).add_hashed(h)
    merged = HLL(p=12).add_hashed(h[:20_000]).merge(
        HLL(p=12).add_hashed(h[20_000:]))
    assert np.array_equal(single.reg, merged.reg)
    assert single.estimate() == merged.estimate()


def test_hll_distinct_per_key():
    rng = np.random.default_rng(7)
    n = 60_000
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], n),
        "v": rng.integers(0, 5000, n),
    })
    ds = ray.data.from_pandas(df).repartition(6)
    got = hll_distinct(ds, "k", "v", n_buckets=2).to_pandas()
    want = df.groupby("k")["v"].nunique()
    for _, row in got.iterrows():
        exact = want[row["k"]]
        assert abs(row["approx_uniq"] - exact) / exact < 0.05, row


def test_mg_tree_merge_bounded_driver_pull(monkeypatch):
    """The driver-side pull is bounded by n_buckets·(capacity+2) regardless
    of block count (VERDICT r02: partial count must not scale the driver
    merge), and the MG guarantees survive the bucketed tree merge."""
    from abslog_ray.sketches import mg_heavy_hitters
    rng = np.random.default_rng(29)
    vals = np.char.add("k", rng.zipf(1.5, 120_000).astype("U8"))
    ds = ray.data.from_pandas(
        pd.DataFrame({"v": pd.Series(vals)})).repartition(32)
    cap, nb = 64, 4
    seen = []
    orig = ray.data.Dataset.to_pandas
    def spy(self, *a, **kw):
        out = orig(self, *a, **kw)
        seen.append(len(out))
        return out
    monkeypatch.setattr(ray.data.Dataset, "to_pandas", spy)
    mg, floor = mg_heavy_hitters(ds, "v", capacity=cap, n_buckets=nb)
    assert seen and max(seen) <= nb * (cap + 2)
    n = len(vals)
    true = pd.Series(vals).value_counts()
    assert floor <= n / cap + 1
    est = dict(zip(mg["key"], mg["est_count"]))
    for k, t in true.items():
        if t > n / cap:
            assert k in est
        if k in est:
            assert t - floor <= est[k] <= t


def test_mg_heavy_hitters_guarantee():
    """Misra-Gries: with vocab >> capacity, every key with true count
    > N/capacity survives, and estimates are within [true - floor, true]."""
    import numpy as np
    import pandas as pd
    import ray.data
    from abslog_ray.sketches import mg_heavy_hitters
    rng = np.random.default_rng(13)
    vals = np.char.add("k", rng.zipf(1.5, 60_000).astype("U8"))
    ds = ray.data.from_pandas(pd.DataFrame({"v": pd.Series(vals)}))
    cap = 64
    mg, floor = mg_heavy_hitters(ds, "v", capacity=cap)
    true = pd.Series(vals).value_counts()
    assert len(pd.unique(vals)) > cap          # adversarial: must trim
    n = len(vals)
    assert floor <= n / cap + 1
    est = dict(zip(mg["key"], mg["est_count"]))
    for k, t in true.items():
        if t > n / cap:
            assert k in est                    # superset guarantee
        if k in est:
            assert t - floor <= est[k] <= t    # bound sandwich


def test_cms_partition_invariant_and_one_sided(ray_session):
    """CMS merge is an elementwise sum, so the merged table is identical
    under any partitioning, and estimates are one-sided (est >= true)."""
    import numpy as np
    import pandas as pd
    import ray.data

    from abslog_ray.sketches import cms_estimate, cms_sketch

    rng = np.random.default_rng(21)
    toks = rng.choice([f"w{i}" for i in range(50)], size=4000,
                      p=np.linspace(1, 50, 50) / np.sum(
                          np.linspace(1, 50, 50)))
    df = pd.DataFrame({"token": toks.astype(object)})
    t1 = cms_sketch(ray.data.from_pandas(df).repartition(2),
                    "token", d=3, w=512)
    t2 = cms_sketch(ray.data.from_pandas(
        df.sample(frac=1.0, random_state=3).reset_index(drop=True)
    ).repartition(7), "token", d=3, w=512)
    assert (t1 == t2).all()

    true = df["token"].value_counts()
    est = cms_estimate(t1, true.index.to_numpy(dtype=object))
    assert (est >= true.to_numpy()).all()
    assert int(t1[0].sum()) == len(df)
