"""Window-shaped operators over transcripts (streaming-shaped semantics per
the Ray guide: the input is a bounded, partitioned log; windows are computed
per key over sorted groups — no watermarks needed because minute keys come
from event time, SURVEY.md §2.9).

- ``sessionize``: session windows per conversation — a new session starts
  when the turn gap exceeds ``timeout_us``.  Same bucket-hash shuffle as the
  gap stage (conversations stay whole), fully vectorized inside the bucket.
- ``grouped_top_k``: top-k rows per group by a metric (K1 per-group
  variant), bucket-hashed on the group key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from abslog_ray.stages.gaps import BUCKET_COL, add_bucket_fn


def sessionize(ds, timeout_us: int, n_buckets: int = 64):
    """-> (conv_id, n_turns, n_sessions, max_session_turns).

    Session boundary: first turn of conv, or gap_us > timeout_us.  Matches
    the SQL: sum(case when gap is null or gap > T then 1 end) over conv.
    """
    ds = ds.map_batches(add_bucket_fn("conv_id", n_buckets),
                        batch_format="pyarrow")

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort",
                            ignore_index=True)
        conv = df["conv_id"].to_numpy()
        ts = df["ts"].astype("int64").to_numpy()
        n = len(df)
        first = np.empty(n, dtype=bool)
        first[0:1] = True
        first[1:] = conv[1:] != conv[:-1]
        gap = np.empty(n, dtype=np.int64)
        gap[0:1] = 0
        gap[1:] = ts[1:] - ts[:-1]
        new_session = first | (~first & (gap > timeout_us))
        codes, uniq = pd.factorize(pd.Series(conv), sort=False)
        G = len(uniq)
        n_turns = np.bincount(codes, minlength=G).astype(np.int64)
        n_sessions = np.bincount(
            codes, weights=new_session.astype(np.float64),
            minlength=G).astype(np.int64)
        # per-session sizes: boundaries of sessions in the sorted frame
        sess_id = np.cumsum(new_session) - 1
        sess_sizes = np.bincount(sess_id)
        sess_conv = codes[new_session]          # conv code of each session
        max_sess = np.zeros(G, dtype=np.int64)
        np.maximum.at(max_sess, sess_conv, sess_sizes)
        return pd.DataFrame({
            "conv_id": uniq, "n_turns": n_turns,
            "n_sessions": n_sessions, "max_session_turns": max_sess,
        })

    return ds.groupby(BUCKET_COL).map_groups(
        lambda df: fn(df.drop(columns=[BUCKET_COL])),
        batch_format="pandas")


def grouped_top_k(ds, group_cols, metric: str, k: int,
                  tie_cols=None, n_buckets: int = 32):
    """Top-k rows per group ordered by (metric desc, tie_cols asc)."""
    from abslog_ray.stages.aggregate import add_key_bucket_fn, KEY_BUCKET

    group_cols = [group_cols] if isinstance(group_cols, str) \
        else list(group_cols)
    tie_cols = list(tie_cols or [])
    ds = ds.map_batches(add_key_bucket_fn(n_buckets, keys=group_cols),
                        batch_format="pyarrow")

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[KEY_BUCKET])
        df = df.sort_values(group_cols + [metric] + tie_cols,
                            ascending=[True] * len(group_cols) + [False]
                            + [True] * len(tie_cols),
                            kind="mergesort")
        out = df.groupby(group_cols, sort=False).head(k).copy()
        out["rank"] = out.groupby(group_cols, sort=False).cumcount() + 1
        return out

    return ds.groupby(KEY_BUCKET).map_groups(fn, batch_format="pandas")


def rolling_mean(ds, key_cols, order_col: str, value_cols,
                 window: int, n_buckets: int = 16):
    """Trailing ``window``-row moving average of ``value_cols`` per
    ``key_cols`` partition ordered by ``order_col`` (SQL: ``avg(v) over
    (partition by key order by ord rows between window-1 preceding and
    current row)``).

    Intended for POST-AGGREGATE tables (e.g. minute_totals): the input
    is keys-sized — bounded by (partitions × time buckets), not by raw
    data — so each partition fits one ``map_groups`` call after a
    bucket-hash shuffle on the key.  The rolling pass itself is a
    vectorized cumsum difference, not a Python loop.  For raw-data-sized
    windowed aggregates, aggregate to the window grain FIRST (the
    flagship shape) and roll over the result — that is the distributed
    plan a 100-TB input needs anyway."""
    from abslog_ray.stages.aggregate import KEY_BUCKET, add_key_bucket_fn

    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    value_cols = ([value_cols] if isinstance(value_cols, str)
                  else list(value_cols))
    ds = ds.map_batches(add_key_bucket_fn(n_buckets, keys=key_cols),
                        batch_format="pyarrow")

    def roll(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[KEY_BUCKET])
        df = df.sort_values(key_cols + [order_col], kind="mergesort",
                            ignore_index=True)
        g = df.groupby(key_cols, sort=False)
        for c in value_cols:
            df[c + "_roll"] = (g[c].rolling(window, min_periods=1).mean()
                               .reset_index(drop=True))
        return df

    return ds.groupby(KEY_BUCKET).map_groups(roll, batch_format="pandas")


def cumulative_over_key(ds, key_col: str, order_cols, value_col: str,
                        out_seq: str = "seq", out_cum: str = "cum",
                        n_buckets: int = 32):
    """Running row_number + running integer sum per key (the
    ``sum(...) over (partition by key order by ... rows unbounded
    preceding)`` window shape).  ``value_col`` must already be an exact
    integer column — the cumulative sum is then bit-exact regardless of
    execution order.  Bucket-hash shuffle on ``key_col`` (keys stay
    whole), vectorized sort + groupby-cumsum inside each bucket."""
    ds = ds.map_batches(add_bucket_fn(key_col, n_buckets),
                        batch_format="pyarrow")
    order = [key_col, *order_cols]

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL]).sort_values(
            order, kind="mergesort", ignore_index=True)
        g = df.groupby(key_col, sort=False)
        df[out_seq] = (g.cumcount() + 1).astype(np.int64)
        df[out_cum] = g[value_col].cumsum().astype(np.int64)
        return df.drop(columns=[value_col])

    return ds.groupby(BUCKET_COL).map_groups(fn, batch_format="pandas")


def key_transitions(ds, key_col: str, order_cols, value_col: str,
                    out_from: str = "from_value", out_to: str = "to_value",
                    n_buckets: int = 32, agg_buckets: int = 4):
    """Adjacent-pair transition counts per key (the Markov-transition
    matrix of ``value_col`` within each ``key_col`` partition ordered by
    ``order_cols`` — SQL ``lead() over (partition by key order by ...)``
    then group-count).

    One bucket-hash shuffle on ``key_col`` (partitions stay whole), the
    pair extraction is a vectorized shift inside each bucket, and each
    bucket emits PRE-COUNTED (from, to, n) partials — only the tiny
    values×values table crosses the final aggregate."""
    from abslog_ray.stages.aggregate import hash_aggregate

    ds = ds.map_batches(add_bucket_fn(key_col, n_buckets),
                        batch_format="pyarrow")
    order = [key_col, *order_cols]

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL]).sort_values(
            order, kind="mergesort", ignore_index=True)
        key = df[key_col].to_numpy()
        v = df[value_col].to_numpy()
        same = key[1:] == key[:-1]
        out = pd.DataFrame({out_from: v[:-1][same], out_to: v[1:][same]})
        return (out.groupby([out_from, out_to], sort=False)
                .size().rename("n").reset_index())

    parts = ds.groupby(BUCKET_COL).map_groups(fn, batch_format="pandas")
    return hash_aggregate(parts, [out_from, out_to], {"n": ("n", "sum")},
                          n_buckets=agg_buckets)


def ntile_over_key(ds, key_col: str, order_cols, k: int,
                   out_col: str = "tile", n_buckets: int = 32):
    """SQL ``ntile(k) over (partition by key order by ...)``: each key's
    rows are split into k tiles, the first ``n % k`` tiles one row
    larger.  ``order_cols`` must be a total order within each key (add a
    unique tie-breaker) or the tile assignment is nondeterministic.

    One bucket-hash shuffle on ``key_col``; inside each bucket the tile
    index comes from a closed-form vectorized expression over the
    within-key position — no Python loop, no per-group apply."""
    ds = ds.map_batches(add_bucket_fn(key_col, n_buckets),
                        batch_format="pyarrow")
    order = [key_col, *order_cols]

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL]).sort_values(
            order, kind="mergesort", ignore_index=True)
        g = df.groupby(key_col, sort=False)
        p = g.cumcount().to_numpy()                    # 0-based position
        n = g[key_col].transform("size").to_numpy()    # key's row count
        q, r = n // k, n % k
        big = r * (q + 1)                              # rows in fat tiles
        fat = p < big
        tile = np.where(fat, p // np.maximum(q + 1, 1),
                        r + (p - big) // np.maximum(q, 1)) + 1
        df[out_col] = tile.astype(np.int64)
        return df

    return ds.groupby(BUCKET_COL).map_groups(fn, batch_format="pandas")


def percent_rank_over_key(ds, key_col: str, value_col: str,
                          out_col: str = "pct_rank", n_buckets: int = 32):
    """SQL ``percent_rank() over (partition by key order by value)``:
    (min-rank − 1) / (n − 1) with ties sharing a rank, 0.0 for
    single-row keys.  One bucket-hash shuffle; the tie-aware min-rank is
    pandas' vectorized ``rank(method='min')`` per bucket, and the final
    division uses the same two IEEE operands as the SQL engine, so the
    doubles match bit-for-bit."""
    ds = ds.map_batches(add_bucket_fn(key_col, n_buckets),
                        batch_format="pyarrow")

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL])
        g = df.groupby(key_col, sort=False)
        r = g[value_col].rank(method="min").to_numpy()
        n = g[key_col].transform("size").to_numpy().astype(np.float64)
        with np.errstate(invalid="ignore"):
            pr = (r - 1.0) / (n - 1.0)
        df[out_col] = np.where(n > 1, pr, 0.0)
        return df

    return ds.groupby(BUCKET_COL).map_groups(fn, batch_format="pandas")
