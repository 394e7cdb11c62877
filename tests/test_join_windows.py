"""Join operators + window-shaped operators vs pandas ground truth."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from abslog_ray.stages.join import broadcast_join, bucket_join, semi_join
from abslog_ray.stages.windows import grouped_top_k, sessionize

from tests.util import assert_frames_equal


@pytest.fixture(scope="module")
def orders_customers():
    rng = np.random.default_rng(11)
    orders = pd.DataFrame({
        "o_id": np.arange(500, dtype=np.int64),
        "cust": rng.integers(0, 60, 500),
        "price": rng.integers(1, 1000, 500).astype(np.int64),
    })
    cust = pd.DataFrame({
        "cust": np.arange(50, dtype=np.int64),   # 10 order-cust ids missing
        "seg": rng.choice(["A", "B", "C"], 50),
    })
    return orders, cust


def test_bucket_join_inner_left(orders_customers):
    orders, cust = orders_customers
    lds = ray.data.from_pandas(orders)
    rds = ray.data.from_pandas(cust)
    for how in ("inner", "left"):
        got = bucket_join(lds, rds, on="cust", how=how,
                          n_buckets=4).to_pandas()
        want = orders.merge(cust, on="cust", how=how)
        assert_frames_equal(got, want, key_cols=None)


def test_bucket_join_shared_column_suffix():
    l = pd.DataFrame({"k": [1, 2], "v": [10, 20]})
    r = pd.DataFrame({"k": [1, 2], "v": [30, 40]})
    got = bucket_join(ray.data.from_pandas(l), ray.data.from_pandas(r),
                      on="k", n_buckets=2).to_pandas()
    assert sorted(got.columns) == ["k", "v", "v_r"]


def test_bucket_join_left_int_dtype_uniform_across_buckets():
    """ADVICE r03: a left join where only SOME buckets contain unmatched
    rows must emit ONE dtype for a right-side int column in every bucket
    (pandas nullable Int64), so a chained keyed op hashes 42 — never a
    stray 42.0 — and matched rows keep exact integer values."""
    n = 200
    l = pd.DataFrame({"k": np.arange(n, dtype=np.int64),
                      "lv": np.arange(n, dtype=np.int64) * 10})
    # keys 0..149 match; 150..199 don't — with n_buckets=8 some buckets
    # are fully matched and others mixed
    r = pd.DataFrame({"k": np.arange(150, dtype=np.int64),
                      "rv": np.arange(150, dtype=np.int64) + 1_000_000})
    got = bucket_join(ray.data.from_pandas(l), ray.data.from_pandas(r),
                      on="k", how="left", n_buckets=8).to_pandas()
    assert str(got["rv"].dtype) == "Int64"          # uniform, nullable
    assert str(got["lv"].dtype) == "int64"          # never padded
    assert got["rv"].isna().sum() == 50
    m = got.dropna(subset=["rv"]).astype({"rv": np.int64})
    assert (m.sort_values("k")["rv"].to_numpy()
            == np.arange(150) + 1_000_000).all()
    # chained keyed op on the carried int column still buckets correctly
    chained = bucket_join(
        ray.data.from_pandas(pd.DataFrame(
            {"rv": np.arange(150, dtype=np.int64) + 1_000_000,
             "tag": ["x"] * 150})),
        ray.data.from_pandas(m[["k", "rv"]]),
        on="rv", how="inner", n_buckets=4).to_pandas()
    assert len(chained) == 150


def test_broadcast_join(orders_customers):
    orders, cust = orders_customers
    got = broadcast_join(ray.data.from_pandas(orders), cust,
                         on="cust", how="left").to_pandas()
    want = orders.merge(cust, on="cust", how="left")
    assert_frames_equal(got, want, key_cols=None)


def test_semi_and_anti_join(orders_customers):
    orders, cust = orders_customers
    ds = ray.data.from_pandas(orders)
    semi = semi_join(ds, cust, on="cust").to_pandas()
    anti = semi_join(ds, cust, on="cust", anti=True).to_pandas()
    in_set = orders["cust"].isin(cust["cust"])
    assert len(semi) == int(in_set.sum())
    assert len(anti) == int((~in_set).sum())
    assert len(semi) + len(anti) == len(orders)


def test_bucket_anti_join(orders_customers):
    """Distributed anti join == pandas isin complement, column TYPES
    preserved through the null-padded union (the broadcast-free scale
    path for large exclusion sets)."""
    from abslog_ray.stages.join import bucket_anti_join
    orders, cust = orders_customers
    got = bucket_anti_join(ray.data.from_pandas(orders),
                           ray.data.from_pandas(cust[["cust"]]),
                           on="cust", n_buckets=4).to_pandas()
    want = orders[~orders["cust"].isin(cust["cust"])]
    assert_frames_equal(got, want, key_cols=None)
    assert got["price"].dtype == np.int64      # no object upcast
    # empty right side keeps everything
    empty = cust[["cust"]].iloc[0:0]
    got_all = bucket_anti_join(ray.data.from_pandas(orders),
                               ray.data.from_pandas(empty),
                               on="cust", n_buckets=4).to_pandas()
    assert len(got_all) == len(orders)


def test_sessionize_matches_pandas(t1_path):
    ds = ray.data.read_parquet(t1_path)
    timeout = 2_000_000  # 2s — fixture gaps are lognormal around 0.5s
    got = sessionize(ds, timeout, n_buckets=4).to_pandas()

    df = ray.data.read_parquet(t1_path).to_pandas().sort_values(
        ["conv_id", "turn_idx"], ignore_index=True)
    gap = df["ts"].astype("int64").groupby(df["conv_id"]).diff()
    nb = gap.isna() | (gap > timeout)
    sid = nb.cumsum()
    z = df.groupby(["conv_id", sid]).size()
    want = pd.DataFrame({
        "n_turns": z.groupby("conv_id").sum(),
        "n_sessions": z.groupby("conv_id").size(),
        "max_session_turns": z.groupby("conv_id").max(),
    }).reset_index()
    assert_frames_equal(got, want, ["conv_id"])
    assert (got["n_sessions"] > 1).any()   # timeout actually splits


def test_grouped_top_k():
    rng = np.random.default_rng(2)
    df = pd.DataFrame({
        "g": rng.integers(0, 20, 400),
        "item": np.arange(400, dtype=np.int64),
        "score": rng.integers(0, 100, 400).astype(np.int64),
    })
    got = grouped_top_k(ray.data.from_pandas(df), "g", "score", 3,
                        tie_cols=["item"], n_buckets=4).to_pandas()
    want = (df.sort_values(["g", "score", "item"],
                           ascending=[True, False, True])
              .groupby("g").head(3))
    want = want.assign(rank=want.groupby("g").cumcount() + 1)
    assert_frames_equal(got, want, key_cols=None)


def test_asof_join_matches_pandas_merge_asof():
    """Engine as-of (backward, inclusive) == pandas merge_asof on random
    data with unique right (by, on) keys."""
    from abslog_ray.stages.join import asof_join
    rng = np.random.default_rng(7)
    left = pd.DataFrame({
        "u": rng.integers(0, 25, 500),
        "ts": rng.integers(0, 10_000, 500).astype(np.int64),
        "lval": np.arange(500, dtype=np.int64),
    })
    right = pd.DataFrame({
        "u": rng.integers(0, 25, 300),
        "ts": rng.integers(0, 10_000, 300).astype(np.int64),
        "rval": np.arange(300, dtype=np.int64) * 10,
    }).drop_duplicates(["u", "ts"])
    got = asof_join(ray.data.from_pandas(left),
                    ray.data.from_pandas(right),
                    by="u", on="ts", how="left",
                    n_buckets=4).to_pandas()
    want = pd.merge_asof(
        left.sort_values("ts", kind="mergesort"),
        right.sort_values("ts", kind="mergesort").rename(
            columns={"ts": "ts_r"}),
        left_on="ts", right_on="ts_r", by="u",
        direction="backward", allow_exact_matches=True)
    assert_frames_equal(got, want, key_cols=["u", "ts", "lval"])
    # inner drops exactly the unmatched rows
    inner = asof_join(ray.data.from_pandas(left),
                      ray.data.from_pandas(right),
                      by="u", on="ts", how="inner",
                      n_buckets=4).to_pandas()
    assert len(inner) == want["rval"].notna().sum()


def test_asof_join_left_only_bucket():
    """A bucket with left rows but ZERO right rows (ADVICE r02 high: the
    merge-path kernel indexed empty arrays and crashed).  Covered two ways:
    a fully-empty right side, and a populated right side whose keys all
    hash away from one left key's bucket."""
    from abslog_ray.stages.join import asof_join
    left = pd.DataFrame({"u": [1, 1, 2], "ts": [10, 20, 15],
                         "lv": [0, 1, 2]})
    right_empty = pd.DataFrame({"u": pd.Series([], dtype=np.int64),
                                "ts": pd.Series([], dtype=np.int64),
                                "rv": pd.Series([], dtype=np.int64)})
    got = asof_join(ray.data.from_pandas(left),
                    ray.data.from_pandas(right_empty),
                    by="u", on="ts", how="left", n_buckets=2).to_pandas()
    assert len(got) == 3 and got["rv"].isna().all()
    inner = asof_join(ray.data.from_pandas(left),
                      ray.data.from_pandas(right_empty),
                      by="u", on="ts", how="inner", n_buckets=2).to_pandas()
    assert len(inner) == 0

    # find two keys that land in DIFFERENT buckets so the right side
    # (one key only) leaves the other key's bucket right-empty
    from abslog_ray.stages.aggregate import KEY_BUCKET, add_key_bucket_fn
    import pyarrow as pa
    probe = pa.table({"u": np.arange(10, dtype=np.int64)})
    b = add_key_bucket_fn(2, keys=["u"])(probe)[KEY_BUCKET].to_numpy()
    ka = int(probe["u"][int(np.flatnonzero(b == b[0])[0])].as_py())
    others = np.flatnonzero(b != b[0])
    assert len(others), "hash put all probe keys in one bucket"
    kb = int(probe["u"][int(others[0])].as_py())
    left2 = pd.DataFrame({"u": [ka, kb], "ts": [10, 10], "lv": [0, 1]})
    right2 = pd.DataFrame({"u": [ka], "ts": [5], "rv": [50]})
    got2 = asof_join(ray.data.from_pandas(left2),
                     ray.data.from_pandas(right2),
                     by="u", on="ts", how="left", n_buckets=2).to_pandas()
    got2 = got2.sort_values("lv", ignore_index=True)
    assert got2["rv"].tolist()[0] == 50
    assert pd.isna(got2["rv"].iloc[1])
    inner2 = asof_join(ray.data.from_pandas(left2),
                       ray.data.from_pandas(right2),
                       by="u", on="ts", how="inner", n_buckets=2).to_pandas()
    assert inner2["u"].tolist() == [ka]


def test_asof_join_key_isolation_and_ties():
    """A right row never leaks across `by` keys; exact-ts matches are
    taken (inclusive); latest-in-time wins regardless of input order."""
    from abslog_ray.stages.join import asof_join
    left = pd.DataFrame({"u": [1, 1, 2], "ts": [10, 20, 15],
                         "lv": [0, 1, 2]})
    # right deliberately unsorted: latest (u=1, ts=10) must win for ts=10
    right = pd.DataFrame({"u": [1, 1, 2], "ts": [10, 5, 99],
                          "rv": [100, 50, 900]})
    got = asof_join(ray.data.from_pandas(left),
                    ray.data.from_pandas(right),
                    by="u", on="ts", how="left",
                    n_buckets=2).to_pandas()
    got = got.sort_values(["u", "ts"], ignore_index=True)
    assert got["rv"].tolist()[:2] == [100, 100]     # inclusive + latest
    assert pd.isna(got["rv"].iloc[2])               # u=2: no click <= 15


def test_bucket_join_source_null_ints_need_declaration():
    """An int column with GENUINE source nulls (Arrow int64 + null — e.g.
    a quantile over an empty set) crashes the unconditional inner-join
    int restore with a clear remedy message; declaring it via
    ``null_ints`` restores it as nullable Int64 in every bucket
    (regression: sketch_quantiles, round 4)."""
    import pyarrow as pa
    import ray

    l = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                  "q": pa.array([10, None, 30], pa.int64())})
    r = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                  "rv": pa.array([7, 8, 9], pa.int64())})
    with pytest.raises(ray.exceptions.RayTaskError,
                       match="null_ints"):
        bucket_join(ray.data.from_arrow(l), ray.data.from_arrow(r),
                    on="k", n_buckets=2).to_pandas()
    got = bucket_join(ray.data.from_arrow(l), ray.data.from_arrow(r),
                      on="k", n_buckets=2,
                      null_ints=["q"]).to_pandas()
    assert str(got["q"].dtype) == "Int64"
    got = got.sort_values("k", ignore_index=True)
    assert got["q"].tolist()[0] == 10 and pd.isna(got["q"].iloc[1])
    assert str(got["rv"].dtype) == "int64"


def test_cumulative_over_key_matches_pandas(ray_session):
    import ray.data
    from abslog_ray.stages.windows import cumulative_over_key
    rng = np.random.default_rng(3)
    n = 500
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": rng.integers(0, 100, n).astype(np.int64),
        "user_id": rng.integers(0, 17, n).astype(np.int64),
        "cents": rng.integers(0, 10_000, n).astype(np.int64),
    })
    got = cumulative_over_key(
        ray.data.from_pandas(df).repartition(5), "user_id",
        ["ts", "event_id"], "cents", out_cum="cum", n_buckets=4
    ).to_pandas().sort_values(["user_id", "seq"], ignore_index=True)
    exp = df.sort_values(["user_id", "ts", "event_id"], ignore_index=True)
    exp["seq"] = exp.groupby("user_id").cumcount() + 1
    exp["cum"] = exp.groupby("user_id")["cents"].cumsum()
    pd.testing.assert_frame_equal(
        got[["user_id", "ts", "event_id", "seq", "cum"]],
        exp[["user_id", "ts", "event_id", "seq", "cum"]])


def test_nearest_centroid_counts_planted(ray_session):
    """Three well-separated planted clusters: every vector must assign to
    its own label's centroid and the confusion matrix be diagonal."""
    import ray.data
    from abslog_ray.stages.similarity import nearest_centroid_counts
    rng = np.random.default_rng(9)
    centers = np.eye(3, 8) * 10.0
    rows = []
    for lbl in range(3):
        for _ in range(20 + lbl):
            rows.append((np.int32(lbl),
                         (centers[lbl] + rng.normal(scale=0.05, size=8))
                         .astype(np.float32)))
    df = pd.DataFrame({"label": [r[0] for r in rows],
                       "embedding": [r[1] for r in rows]})
    got = nearest_centroid_counts(
        ray.data.from_pandas(df).repartition(4)
    ).to_pandas().sort_values(["label", "assigned"], ignore_index=True)
    assert (got["label"] == got["assigned"]).all()
    assert got["n"].tolist() == [20, 21, 22]


def test_key_transitions_matches_pandas(ray_session):
    import ray.data
    from abslog_ray.stages.windows import key_transitions
    rng = np.random.default_rng(7)
    n = 800
    df = pd.DataFrame({
        "conv": rng.integers(0, 40, n).astype(np.int64),
        "idx": np.arange(n, dtype=np.int64),
        "tool": rng.choice(["a", "b", "c", "d"], n),
    })
    got = key_transitions(
        ray.data.from_pandas(df).repartition(6), "conv", ["idx"], "tool",
        out_from="f", out_to="t", n_buckets=4, agg_buckets=2
    ).to_pandas().sort_values(["f", "t"], ignore_index=True)
    s = df.sort_values(["conv", "idx"], ignore_index=True)
    nxt = s.groupby("conv")["tool"].shift(-1)
    exp = (pd.DataFrame({"f": s["tool"], "t": nxt}).dropna()
           .groupby(["f", "t"]).size().rename("n").reset_index()
           .sort_values(["f", "t"], ignore_index=True))
    exp["n"] = exp["n"].astype(np.int64)
    pd.testing.assert_frame_equal(got, exp)


def test_ntile_over_key_matches_duckdb(ray_session):
    import duckdb
    import ray.data
    from abslog_ray.stages.windows import ntile_over_key
    rng = np.random.default_rng(5)
    n = 700
    df = pd.DataFrame({
        "k": rng.integers(0, 23, n).astype(np.int64),   # sizes straddle 4
        "o": rng.permutation(n).astype(np.int64),
    })
    for k in (1, 3, 4):
        got = ntile_over_key(
            ray.data.from_pandas(df).repartition(5), "k", ["o"], k,
            out_col="t", n_buckets=4
        ).to_pandas().sort_values(["k", "o"], ignore_index=True)
        exp = duckdb.sql(
            f"select k, o, ntile({k}) over (partition by k order by o)"
            " as t from df order by k, o").df()
        assert (got["t"].to_numpy() == exp["t"].to_numpy()).all()


def test_percent_rank_over_key_matches_duckdb(ray_session):
    import duckdb
    import ray.data
    from abslog_ray.stages.windows import percent_rank_over_key
    rng = np.random.default_rng(3)
    n = 600
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "k": rng.integers(0, 25, n).astype(np.int64),   # incl. size-1 keys
        "v": rng.integers(0, 15, n).astype(np.float64),  # many ties
    })
    got = percent_rank_over_key(
        ray.data.from_pandas(df).repartition(5), "k", "v",
        out_col="pr", n_buckets=4
    ).to_pandas().sort_values(["k", "id"], ignore_index=True)
    exp = duckdb.sql(
        "select id, k, v, percent_rank() over (partition by k order by v)"
        " as pr from df order by k, id").df()
    assert (got["pr"].to_numpy() == exp["pr"].to_numpy()).all()  # bitwise


def test_auto_join_strategies_agree(ray_session):
    """auto_join's broadcast path and its bucket_join fallback return
    identical frames AND dtypes for inner and left joins (incl. the
    nullable-Int policy on unmatched left rows)."""
    import numpy as np
    import pandas as pd
    import ray.data

    from abslog_ray.stages.join import auto_join

    rng = np.random.default_rng(13)
    left = pd.DataFrame({
        "k": rng.integers(0, 20, 200).astype(np.int64),
        "v": rng.integers(0, 1000, 200).astype(np.int64)})
    right = pd.DataFrame({
        # left-unmatched keys 14..19; right-unmatched keys 20..25 so an
        # OUTER join must surface right-only rows exactly once
        "k": np.arange(0, 26, 2, dtype=np.int64),
        "w": (np.arange(13) * 7).astype(np.int64),
        "v": np.arange(13, dtype=np.int64)})     # name collision -> v_r

    lds = ray.data.from_pandas(left).repartition(4)
    rds = ray.data.from_pandas(right).repartition(2)

    def norm(df):
        df = df[sorted(df.columns)]
        return df.sort_values(list(df.columns),
                              ignore_index=True, na_position="last")

    for how in ("inner", "left", "outer"):
        bcast = norm(auto_join(lds, rds, on="k", how=how,
                               broadcast_limit=1_000_000).to_pandas())
        bucket = norm(auto_join(lds, rds, on="k", how=how,
                                broadcast_limit=0,
                                n_buckets=4).to_pandas())
        assert list(map(str, bcast.dtypes)) == \
            list(map(str, bucket.dtypes)), how
        pd.testing.assert_frame_equal(bcast, bucket)
        # pin VALUES against a pandas single-frame merge, not just the
        # two strategies against each other (ADVICE r04: outer must not
        # duplicate right-only rows per left block)
        exp = left.merge(right, on="k", how=how, suffixes=("", "_r"))
        assert len(bcast) == len(exp), how
        if how == "outer":
            r_only = bcast[~bcast["k"].isin(left["k"])]
            assert sorted(r_only["k"]) == [20, 22, 24], \
                "right-only keys must appear exactly once each"


def test_interval_join_overlapping_windows(ray_session):
    """interval_join: fixed-duration range join — inclusive start,
    exclusive end, many-to-many across OVERLAPPING windows of one key,
    no cross-key or cross-bucket leakage."""
    from abslog_ray.stages.windows import interval_join

    D = 100  # duration_us
    anchors = pd.DataFrame({
        "aid": np.array([1, 2, 3, 4], dtype=np.int64),
        "k": np.array([7, 7, 7, 9], dtype=np.int64),
        # windows [1000,1100) and [1050,1150) OVERLAP; key 9 apart
        "ts": pd.to_datetime([1000, 1050, 5000, 1000], unit="us"),
    })
    probes = pd.DataFrame({
        "pid": np.array([10, 11, 12, 13, 14, 15], dtype=np.int64),
        "k": np.array([7, 7, 7, 7, 9, 8], dtype=np.int64),
        "ts": pd.to_datetime([1000,   # == start of w1 (inclusive) -> 1
                              1075,   # inside w1 AND w2 -> both
                              1100,   # == end of w1 (exclusive), in w2
                              1149,   # last us of w2
                              1099,   # key 9's window
                              1050],  # key 8: no anchors at all
                             unit="us"),
    })
    got = interval_join(
        ray.data.from_pandas(anchors).repartition(2),
        ray.data.from_pandas(probes).repartition(3),
        key_col="k", duration_us=D, anchor_id_col="aid",
        probe_id_col="pid", n_buckets=4).to_pandas()
    got = set(map(tuple, got[["anchor_id", "probe_id"]].to_numpy()))
    assert got == {(1, 10), (1, 11), (2, 11), (2, 12), (2, 13),
                   (4, 14)}
