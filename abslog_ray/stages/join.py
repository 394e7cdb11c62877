"""Join operators (SURVEY.md §2 J1 scale paths).

The reference has no relational joins — only map-side dict lookups — but a
complete engine needs them.  Three shapes, chosen by side size:

- ``broadcast_join``: small right side. `ray.put` once, vectorized pandas
  merge per batch inside map_batches.  No shuffle.
- ``bucket_join``: both sides large. One keyed shuffle: both sides are
  tagged, schema-aligned, unioned, bucket-hashed on the key, and each
  bucket is merged with one vectorized pandas merge.  This is an explicit
  partitioned hash join expressed purely in Dataset primitives (union +
  groupby) — Ray 2.49's native ``Dataset.join`` requires the hash-shuffle
  strategy which measured ~3x slower on this host (BASELINE.md).
- ``semi_join`` / ``anti_join``: broadcast key set, filter inside
  map_batches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

SIDE_COL = "__side"

_PD_NULLABLE = {np.dtype(k): v for k, v in {
    "int8": "Int8", "int16": "Int16", "int32": "Int32", "int64": "Int64",
    "uint8": "UInt8", "uint16": "UInt16", "uint32": "UInt32",
    "uint64": "UInt64"}.items()}


def arrow_type(t):
    """Normalize a Ray ``Schema`` type entry to a pyarrow DataType — Ray
    carries numpy dtypes (or bare Python classes) for pandas-block
    datasets.  numpy ``object`` means string in this engine."""
    if isinstance(t, pa.DataType):
        return t
    try:
        return pa.from_numpy_dtype(t)
    except (pa.ArrowNotImplementedError, TypeError):
        return pa.string()


def _int_restore_fn(int_cols: dict, nullable_cols: set):
    """Per-bucket integer-width restore decided GLOBALLY per column
    (ADVICE r03: a per-bucket ``isna().any()`` condition let a left join
    emit mixed int64/float64 dtypes for the same column across buckets —
    the 42-vs-42.0 bucket-hash split all over again).  Columns a join
    type can null-pad (``nullable_cols``) restore to the pandas nullable
    Int dtype in EVERY bucket; all other integer columns restore to
    their declared numpy width unconditionally.  An integer column whose
    SOURCE data carries nulls (Arrow int64 + null — e.g. a quantile over
    an empty set) would make that unconditional cast raise: the caller
    must name such columns via the join's ``null_ints`` parameter so the
    nullable-Int decision stays global rather than per-bucket."""

    def restore(out: pd.DataFrame) -> pd.DataFrame:
        for c, dt in int_cols.items():
            if c not in out.columns:
                continue
            tgt = _PD_NULLABLE[dt] if c in nullable_cols else dt
            if str(out[c].dtype) != str(tgt):
                try:
                    out[c] = out[c].astype(tgt)
                except (pd.errors.IntCastingNaNError, ValueError) as exc:
                    raise ValueError(
                        f"join column {c!r} is integer-typed but contains "
                        f"nulls from the source data; pass "
                        f"null_ints=[{c!r}] to the join so every bucket "
                        f"agrees on the nullable {_PD_NULLABLE[dt]} dtype"
                    ) from exc
        return out

    return restore


# Per-worker-process cache for broadcast pandas frames: plasma gets are
# zero-copy for numpy but a pandas DataFrame pays pickle reconstruction on
# EVERY ray.get (VERDICT r04 wrong #3) — cache the deserialized frame per
# ObjectRef so each worker process pays it once, not once per batch.
_BCAST_CACHE: dict = {}


def _get_broadcast(ref):
    import ray
    key = ref.hex()
    hit = _BCAST_CACHE.get(key)
    if hit is None:
        hit = ray.get(ref)
        if len(_BCAST_CACHE) >= 8:   # broadcast sides are small by contract
            _BCAST_CACHE.clear()
        _BCAST_CACHE[key] = hit
    return hit


def broadcast_join(ds, right_df: pd.DataFrame, on, how: str = "left"):
    """Small-side join: right_df is broadcast once per actor/task.

    Inner/left only: a per-batch outer/right merge would re-emit every
    unmatched right row once per LEFT batch — use ``bucket_join`` (or
    ``auto_join``, which routes there) for those."""
    import ray
    assert how in ("inner", "left"), \
        f"broadcast_join supports inner/left only, got {how!r}"
    ref = ray.put(right_df)
    on = [on] if isinstance(on, str) else list(on)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        r = _get_broadcast(ref)
        return df.merge(r, on=on, how=how)

    return ds.map_batches(fn, batch_format="pandas")


def _align(df: pd.DataFrame, all_cols: list) -> pd.DataFrame:
    for c in all_cols:
        if c not in df.columns:
            df[c] = None
    return df[all_cols]


def bucket_join(left, right, on, how: str = "inner",
                n_buckets: int = 32, suffixes=("", "_r"),
                null_ints=()):
    """Partitioned hash join: tag → align → union → bucket shuffle →
    per-bucket vectorized merge.  Exactly one all-to-all exchange; skewed
    keys spread across buckets by the hash of the full key.

    Alignment is done in ARROW with typed nulls and integer columns are
    cast back to their declared width after the pandas merge (r03: the
    old pandas ``None``-padding upcast carried columns to object/float,
    and a CHAINED bucket_join then hashed 42.0 and 42 into different
    buckets — silently empty joins)."""
    from abslog_ray.stages.aggregate import KEY_BUCKET, add_key_bucket_fn

    on = [on] if isinstance(on, str) else list(on)
    lsch, rsch = left.schema(), right.schema()
    lcols, rcols = list(lsch.names), list(rsch.names)

    ltypes = {n: arrow_type(t) for n, t in zip(lsch.names, lsch.types)}
    rtypes = {n: arrow_type(t) for n, t in zip(rsch.names, rsch.types)}
    shared = [c for c in lcols if c in rcols and c not in on]
    rmap = {c: (c + suffixes[1] if c in shared else c) for c in rcols}
    all_cols = on + [c for c in lcols if c not in on] + \
        [rmap[c] for c in rcols if c not in on]
    types = dict(ltypes)
    for c in rcols:
        if c not in on:
            types[rmap[c]] = rtypes[c]

    def tag(side):
        def fn(t: pa.Table) -> pa.Table:
            have = ({rmap.get(c, c) if c not in on else c: t[c]
                     for c in rcols} if side == "r"
                    else {c: t[c] for c in lcols})
            cols = {c: (have[c] if c in have
                        else pa.nulls(t.num_rows, types[c]))
                    for c in all_cols}
            cols[SIDE_COL] = pa.array(np.repeat(side, t.num_rows))
            return pa.table(cols)
        return fn

    both = left.map_batches(tag("l"), batch_format="pyarrow").union(
        right.map_batches(tag("r"), batch_format="pyarrow"))
    both = both.map_batches(add_key_bucket_fn(n_buckets, keys=on),
                            batch_format="pyarrow")

    l_only = [c for c in all_cols if c not in on and c in lcols]
    r_only = [c for c in all_cols if c not in on and c not in lcols]
    int_cols = {c: np.dtype(types[c].to_pandas_dtype())
                for c in all_cols
                if pa.types.is_integer(types[c])}
    # which columns this join TYPE can null-pad (keys never are: they
    # come from whichever side matched)
    nullable = {"inner": set(), "left": set(r_only),
                "right": set(l_only),
                "outer": set(l_only) | set(r_only)}[how]
    # columns the CALLER knows carry source nulls (post-suffix names):
    # the nullable-Int decision must be global, so it can't be inferred
    # per bucket — see _int_restore_fn
    nullable |= set(null_ints)
    restore = _int_restore_fn(int_cols, nullable)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[KEY_BUCKET])
        is_l = (df[SIDE_COL] == "l").to_numpy()
        l = df[is_l][on + l_only]
        r = df[~is_l][on + r_only]
        return restore(l.merge(r, on=on, how=how))

    return both.groupby(KEY_BUCKET).map_groups(merge, batch_format="pandas")


def asof_join(left, right, by: str, on: str, how: str = "inner",
              n_buckets: int = 32, suffixes=("", "_r"),
              null_ints=()):
    """As-of join: for each left row, the most recent right row of the same
    ``by`` key with ``right.on <= left.on`` (backward direction, inclusive
    — the time-series "latest state at event time" lookup Ray Data lacks).

    Shape: same single keyed shuffle as ``bucket_join`` (tag → align →
    union → bucket-hash on ``by``), but the per-bucket kernel is a merge
    path instead of a hash merge: sort both sides together by (key, on,
    side) with right rows ordered before left on ties, then one
    ``np.maximum.accumulate`` forward-fill of right-row indices gives every
    left row its as-of match — O((|l|+|r|) log) per bucket, fully
    vectorized, no row-pair expansion.

    Partitioning assumption: whole ``by`` keys co-locate in one bucket
    (hash of the key), like the gap stage.  Determinism: the right side
    must be unique on (by, on) — pre-aggregate ties away (the SQL ASOF
    mirror is equally tie-ambiguous otherwise).  Right's columns arrive
    suffixed where they clash with left's (including ``on``)."""
    from abslog_ray.stages.aggregate import KEY_BUCKET, add_key_bucket_fn

    lsch, rsch = left.schema(), right.schema()
    lcols, rcols = list(lsch.names), list(rsch.names)

    ltypes = {n: arrow_type(t) for n, t in zip(lsch.names, lsch.types)}
    rtypes = {n: arrow_type(t) for n, t in zip(rsch.names, rsch.types)}
    shared = [c for c in rcols if c in lcols and c != by]
    rmap = {c: (c + suffixes[1] if c in shared else c)
            for c in rcols if c != by}
    r_on = rmap[on] if on in rmap else on
    r_val_cols = [rmap[c] for c in rcols if c != by]
    all_cols = [by] + [c for c in lcols if c != by] + r_val_cols
    types = dict(ltypes)
    for c in rcols:
        if c != by:
            types[rmap[c]] = rtypes[c]
    int_cols = {c: np.dtype(types[c].to_pandas_dtype())
                for c in all_cols if pa.types.is_integer(types[c])}
    # left-asof can null-pad only the right value columns; the global
    # per-column policy (see _int_restore_fn) keeps dtypes identical
    # across buckets whether or not a given bucket had unmatched rows
    _restore = _int_restore_fn(
        int_cols, (set(r_val_cols) if how != "inner" else set())
        | set(null_ints))

    def tag(side):
        # Arrow-typed null padding: pandas None-fill upcasts columns to
        # object/float and chained keyed ops then hash 42.0 != 42 (see
        # bucket_join's r03 note)
        def fn(t: pa.Table) -> pa.Table:
            have = ({rmap.get(c, c) if c != by else by: t[c]
                     for c in rcols} if side == "r"
                    else {c: t[c] for c in lcols})
            cols = {c: (have[c] if c in have
                        else pa.nulls(t.num_rows, types[c]))
                    for c in all_cols}
            cols[SIDE_COL] = pa.array(np.repeat(side, t.num_rows))
            return pa.table(cols)
        return fn

    both = left.map_batches(tag("l"), batch_format="pyarrow").union(
        right.map_batches(tag("r"), batch_format="pyarrow"))
    both = both.map_batches(add_key_bucket_fn(n_buckets, keys=[by]),
                            batch_format="pyarrow")

    l_keep = [by] + [c for c in lcols if c != by]

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[KEY_BUCKET])
        is_l = (df[SIDE_COL] == "l").to_numpy()
        l = df[is_l]
        r = df[~is_l]
        out_empty = l.iloc[0:0][l_keep + r_val_cols]
        if len(l) == 0:
            return _restore(out_empty)
        if len(r) == 0:
            # a bucket whose keys have no right-side rows at all (ADVICE r02
            # high): the ffill kernel below would index empty arrays — the
            # correct result is no matches (inner) or all-null right columns
            # (left join)
            if how == "inner":
                return _restore(out_empty)
            out = l[l_keep].reset_index(drop=True)
            empty = r[r_val_cols].reindex(range(len(out)))
            for c in r_val_cols:
                out[c] = empty[c].to_numpy()
            return _restore(out)
        codes, _u = pd.factorize(
            pd.concat([r[by], l[by]], ignore_index=True), sort=False)
        rcode, lcode = codes[:len(r)], codes[len(r):]
        r_on_v = r[r_on].to_numpy()
        l_on_v = l[on].to_numpy()
        code_all = np.concatenate([rcode, lcode])
        on_all = np.concatenate([r_on_v, l_on_v])
        side_all = np.concatenate([np.zeros(len(r), dtype=np.int8),
                                   np.ones(len(l), dtype=np.int8)])
        idx_all = np.concatenate([np.arange(len(r)),
                                  np.arange(len(l))])
        order = np.lexsort((side_all, on_all, code_all))
        marks = np.where(side_all[order] == 0, idx_all[order], -1)
        # forward-fill the POSITION of the last right row seen (positions
        # are monotone, so maximum.accumulate is a correct ffill; original
        # right indices are not ordered by time and must not be maxed)
        pos = np.arange(len(marks))
        last_r_pos = np.maximum.accumulate(np.where(marks >= 0, pos, -1))
        at_left = side_all[order] == 1
        cand_pos = last_r_pos[at_left]
        cand = marks[np.maximum(cand_pos, 0)]
        lrow = idx_all[order][at_left]           # original left positions
        valid = (cand_pos >= 0)
        # a carried match from the previous key segment is invalid
        valid &= np.where(valid, rcode[np.maximum(cand, 0)], -1) == \
            code_all[order][at_left]
        rv = r[r_val_cols].reset_index(drop=True)
        if how == "inner":
            out = l.iloc[lrow[valid]][l_keep].reset_index(drop=True)
            matched = rv.iloc[cand[valid]].reset_index(drop=True)
            for c in r_val_cols:
                out[c] = matched[c].to_numpy()
            return _restore(out)
        # left join: unmatched right columns become nulls
        out = l.iloc[lrow][l_keep].reset_index(drop=True)
        matched = rv.iloc[np.maximum(cand, 0)].reset_index(drop=True)
        vmask = pd.Series(valid)
        for c in r_val_cols:
            out[c] = matched[c].where(vmask)
        return _restore(out)

    return both.groupby(KEY_BUCKET).map_groups(merge, batch_format="pandas")


def bucket_anti_join(left, right, on: str, n_buckets: int = 32):
    """Distributed ANTI join on one key column: left rows whose key has
    no match in ``right`` (which only needs the key column).  The scale
    shape for exclusion sets too large to broadcast through
    ``semi_join``: tag both sides, align the right side to left's schema
    with TYPED Arrow nulls, union, key-bucket-hash, and filter each
    bucket with one vectorized isin — a single all-to-all exchange."""
    from abslog_ray.stages.aggregate import KEY_BUCKET, add_key_bucket_fn

    MARK = "__anti_r"
    sch = left.schema()
    names, types = list(sch.names), list(sch.types)
    assert on in names, f"anti-join key {on} missing from left"

    def tag_left(t: pa.Table) -> pa.Table:
        return t.append_column(
            MARK, pa.array(np.zeros(t.num_rows, dtype=bool)))

    def tag_right(t: pa.Table) -> pa.Table:
        col = t[on]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        cols = {nm: (col if nm == on else pa.nulls(t.num_rows, ty))
                for nm, ty in zip(names, types)}
        cols[MARK] = pa.array(np.ones(t.num_rows, dtype=bool))
        return pa.table(cols)

    both = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow"))
    both = both.map_batches(add_key_bucket_fn(n_buckets, keys=[on]),
                            batch_format="pyarrow")

    def flt(t: pa.Table) -> pa.Table:
        t = t.drop_columns([KEY_BUCKET])
        is_r = t[MARK].to_numpy(zero_copy_only=False)
        keys = t[on].to_numpy(zero_copy_only=False)
        keep = ~is_r & ~np.isin(keys, keys[is_r])
        return t.drop_columns([MARK]).filter(pa.array(keep))

    return both.groupby(KEY_BUCKET).map_groups(flt, batch_format="pyarrow")


def semi_join(ds, keys_df: pd.DataFrame, on: str, anti: bool = False):
    """Broadcast key-set filter (semi/anti join)."""
    import ray
    keyset = ray.put(np.unique(keys_df[on].to_numpy()))

    def fn(batch: pa.Table) -> pa.Table:
        ks = ray.get(keyset)
        vals = batch[on].to_numpy(zero_copy_only=False)
        mask = np.isin(vals, ks)
        if anti:
            mask = ~mask
        return batch.filter(pa.array(mask))

    return ds.map_batches(fn, batch_format="pyarrow")


def auto_join(left, right, on, how: str = "inner", n_buckets: int = 32,
              broadcast_limit: int = 200_000, null_ints=()):
    """Strategy-choosing join — the optimizer decision every pipeline
    otherwise hand-codes: count the right side (an aggregate, no row
    pull) and, when it fits ``broadcast_limit`` rows, ship it ONCE via
    ``ray.put`` and merge inside every map task (zero shuffle of the
    big side); otherwise fall back to the keyed ``bucket_join``
    exchange.  The broadcast path restores integer widths with the same
    global per-column policy as bucket_join (pandas nullable Int64 for
    columns the caller declares source-null via ``null_ints``), so
    downstream keyed ops hash identically whichever strategy ran.

    Outer and right joins ALWAYS take the keyed exchange regardless of
    right-side size (ADVICE r04): a per-batch broadcast merge sees only
    one left batch at a time, so it would emit every right row unmatched
    *in that batch* as a null-padded row — duplicating unmatched right
    rows once per left block."""
    n = int(right.count())
    if n > broadcast_limit or how not in ("inner", "left"):
        return bucket_join(left, right, on=on, how=how,
                           n_buckets=n_buckets, null_ints=null_ints)

    rdf = right.to_pandas()
    on_cols = [on] if isinstance(on, str) else list(on)
    lsch = left.schema()
    shared = [c for c in rdf.columns
              if c in lsch.names and c not in on_cols]
    int_cols = {}
    for name, typ in zip(lsch.names, lsch.types):
        at = arrow_type(typ)
        if pa.types.is_integer(at):
            int_cols[name] = np.dtype(at.to_pandas_dtype())
    r_out = {c: (c + "_r" if c in shared else c) for c in rdf.columns
             if c not in on_cols}
    for c, out_name in r_out.items():
        if pd.api.types.is_integer_dtype(rdf[c]):
            int_cols.setdefault(out_name, rdf[c].dtype)
    nullable = set(null_ints)
    if how == "left":
        nullable |= set(r_out.values())
    restore = _int_restore_fn(int_cols, nullable)

    import ray as _ray
    ref = _ray.put(rdf)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        r = _get_broadcast(ref)
        return restore(df.merge(r, on=on_cols, how=how,
                                suffixes=("", "_r")))

    return left.map_batches(fn, batch_format="pandas")
