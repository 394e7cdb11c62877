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


def interval_join(anchors, probes, key_col: str, duration_us: int,
                  anchor_id_col: str, probe_id_col: str,
                  ts_col: str = "ts", n_buckets: int = 32):
    """Fixed-duration range/interval join: emit (anchor_id, probe_id)
    pairs where ``probe.key == anchor.key`` and
    ``anchor.ts <= probe.ts < anchor.ts + duration_us`` — the temporal
    join the brief names next to the as-of join (attribution windows,
    alert correlation, follow-on-activity counting).  Many-to-many:
    overlapping windows of the same key each match.

    Scale shape: both sides tag a __side column and shuffle ONCE by
    hash(key) (skew spreads across buckets like bucket_join); inside a
    bucket everything is vectorized — anchors sort by (key, ts), probes
    resolve their window span with two ``np.searchsorted`` calls over a
    key-shifted timeline (fixed duration ⇒ windows ordered by start are
    ordered by end, so the span is contiguous), and pair emission is one
    ``np.repeat`` + arange subtraction.  No per-row Python, no pairwise
    blowup beyond the true match count.

    The key-shifted timeline packs (key, ts) into one int64 per row —
    guarded loudly: per-bucket keys × (ts range + 2·duration) must stay
    under 2^62 (at 10^6 keys/bucket and a 30-year µs range that is
    ~10^6 · 10^15 ≈ 2^70 — shard ``n_buckets`` up, which divides keys
    per bucket, long before that)."""
    import pyarrow as pa

    SIDE = "__ij_side"

    def tag(side, id_col):
        def fn(t: pa.Table) -> pa.Table:
            ts = t[ts_col]
            if isinstance(ts, pa.ChunkedArray):
                ts = ts.combine_chunks()
            # normalize to µs BEFORE the int cast: pandas-born columns
            # arrive as timestamp[ns] and a raw int64 cast would silently
            # reinterpret duration_us as nanoseconds
            if pa.types.is_timestamp(ts.type):
                ts = ts.cast(pa.timestamp("us"))
            return pa.table({
                key_col: t[key_col],
                "__ij_ts": ts.cast(pa.int64()),
                "__ij_id": t[id_col],
                SIDE: pa.array(np.repeat(side, t.num_rows)),
            })
        return fn

    both = (anchors.map_batches(tag("a", anchor_id_col),
                                batch_format="pyarrow")
            .union(probes.map_batches(tag("p", probe_id_col),
                                      batch_format="pyarrow")))
    both = both.map_batches(add_bucket_fn(key_col, n_buckets),
                            batch_format="pyarrow")

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "anchor_id": pd.Series([], dtype=np.int64),
            "probe_id": pd.Series([], dtype=np.int64)})
        side = df[SIDE].to_numpy()
        codes, _ = pd.factorize(df[key_col], sort=False)
        ts = df["__ij_ts"].to_numpy().astype(np.int64)
        ids = df["__ij_id"].to_numpy()
        is_a = side == "a"
        if not is_a.any() or is_a.all():
            return empty
        lo_ts = int(ts.min())
        span = int(ts.max()) - lo_ts + 2 * int(duration_us) + 2
        n_keys = int(codes.max()) + 1
        assert span * n_keys < (1 << 62), \
            f"interval_join: key-shifted timeline overflows int64 " \
            f"({n_keys} keys x {span} us span in one bucket); raise " \
            f"n_buckets"
        shifted = codes.astype(np.int64) * span + (ts - lo_ts) + 1
        a_sh = np.sort(shifted[is_a])
        a_ids = ids[is_a][np.argsort(shifted[is_a], kind="stable")]
        p_sh = shifted[~is_a]
        p_ids = ids[~is_a]
        # anchors with start in (probe - D, probe]; the +1 offset above
        # keeps probe-D >= 0 within the key's shifted block
        lo = np.searchsorted(a_sh, p_sh - int(duration_us), side="right")
        hi = np.searchsorted(a_sh, p_sh, side="right")
        cnt = hi - lo
        total = int(cnt.sum())
        if total == 0:
            return empty
        starts = np.repeat(cnt.cumsum() - cnt, cnt)
        a_idx = np.repeat(lo, cnt) + (np.arange(total) - starts)
        return pd.DataFrame({
            "anchor_id": a_ids[a_idx].astype(np.int64),
            "probe_id": np.repeat(p_ids, cnt).astype(np.int64)})

    return both.groupby(BUCKET_COL).map_groups(
        lambda df: join_bucket(df.drop(columns=[BUCKET_COL])),
        batch_format="pandas")
