"""EP2 — the query layer (SURVEY.md §2 A6/J2/K1/K2/K3; reference: abs-log's
``log_show.py`` CLI: ``request`` top-N, ``detail`` drill-down and
``distribution`` time buckets over arbitrary [from, to) ranges, re-merging
per-minute Mongo documents driver-side).

Graft: every subcommand is a Dataset expression over the summary sink.
Range re-aggregation follows the reference's semantics exactly: sums
(hits/bytes/err/gap_sum) merge exactly; quantiles across minutes are
approximated as the hits-weighted mean of per-minute quantiles, because the
summaries do not retain raw samples (the reference has the same limitation;
SURVEY.md §2 A6 pins the formula).  ``uniq_convs`` merges as a sum — an
upper bound — and is surfaced as ``uniq_convs_ub``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from abslog_ray.quantiles import weighted_quantile_merge

QUANT_COLS = ("gap_p25", "gap_p50", "gap_p75", "gap_p95")
SUM_COLS = ("hits", "err_hits", "bytes_sum", "gap_count")


def read_summaries(sink_root: str):
    import os
    return ray.data.read_parquet(os.path.join(sink_root, "summaries"))


def filter_range(ds, t_from=None, t_to=None, role=None):
    """Time-range + role filter (reference: -f/-t/-s flags)."""
    def fn(t: pa.Table) -> pa.Table:
        mask = pa.array(np.ones(t.num_rows, dtype=bool))
        if t_from is not None:
            mask = pc.and_(mask, pc.greater_equal(t["minute"], pa.scalar(
                t_from, pa.timestamp("us"))))
        if t_to is not None:
            mask = pc.and_(mask, pc.less(t["minute"], pa.scalar(
                t_to, pa.timestamp("us"))))
        if role is not None:
            mask = pc.and_(mask, pc.equal(t["role"], role))
        return t.filter(mask)
    return ds.map_batches(fn, batch_format="pyarrow")


def merge_over_range(ds, by=("pattern",)):
    """A6: re-aggregate summary rows onto `by` keys."""
    by = list(by)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        recs = []
        for key, gg in df.groupby(by, dropna=False, sort=True):
            key = key if isinstance(key, tuple) else (key,)
            rec = dict(zip(by, key))
            rec.update(
                hits=int(gg["hits"].sum()),
                uniq_convs_ub=int(gg["uniq_convs"].sum()),
                err_hits=int(gg["err_hits"].sum()),
                bytes_sum=int(gg["bytes_sum"].sum()),
                gap_count=int(gg["gap_count"].sum()),
                gap_sum=gg["gap_sum"].sum(min_count=1),
            )
            w = gg["gap_count"].to_numpy(dtype=np.float64)
            for q in QUANT_COLS:
                rec[q] = weighted_quantile_merge(
                    gg[q].to_numpy(dtype=np.float64, na_value=np.nan), w)
            recs.append(rec)
        out = pd.DataFrame(recs)
        # stable output schema regardless of group contents
        out["gap_sum"] = out["gap_sum"].astype("Int64")
        for q in QUANT_COLS:
            out[q] = out[q].astype("float64")
        return out

    # summaries are small relative to input; a single-group merge per `by`
    # key set is fine — use the bucket pattern for very wide key spaces
    return ds.groupby(by[0]).map_groups(fn, batch_format="pandas")


def with_pct(ds, cols=("hits", "bytes_sum")):
    """J2: % of total columns computed from a 1-row global aggregate
    broadcast into a map_batches (no shuffle join)."""
    from ray.data.aggregate import Sum
    totals = ds.aggregate(*[Sum(c, alias_name=f"_t_{c}") for c in cols])

    def fn(t: pa.Table) -> pa.Table:
        for c in cols:
            tot = totals[f"_t_{c}"]
            pct = pc.round(pc.multiply(pc.divide(
                pc.cast(t[c], pa.float64()), float(tot)), 100.0), 6)
            t = t.append_column(f"{c}_pct", pct)
        return t
    return ds.map_batches(fn, batch_format="pyarrow")


def top_patterns(ds_summary, metric="hits", n=10, by=("pattern",)):
    """K1: rank patterns by hits/bytes/gap over the (filtered) range."""
    merged = merge_over_range(ds_summary, by=by)
    merged = with_pct(merged)
    return merged.sort([metric, by[0]], descending=[True, False]).limit(n)


def pattern_detail(ds_summary, pattern: str, n=10):
    """K2: args_abs drill-down within one pattern."""
    def flt(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["pattern"], pattern))
    ds = ds_summary.map_batches(flt, batch_format="pyarrow")
    merged = merge_over_range(ds, by=("args_abs",))
    return merged.sort(["hits", "args_abs"],
                       descending=[True, False]).limit(n)


_BUCKET_FMTS = {
    "minute": "%y%m%d%H%M",
    "ten_min": "%y%m%d%H%M",   # sliced below
    "hour": "%y%m%d%H",
    "day": "%y%m%d",
}


def distribution(ds_summary, unit="hour"):
    """K3: hits/bytes per coarser time bucket (minute/ten_min/hour/day),
    re-truncating the minute key — same as the reference slicing its
    yymmddHHMM minute strings."""
    fmt = _BUCKET_FMTS[unit]

    def fn(t: pa.Table) -> pa.Table:
        b = pc.strftime(t["minute"], format=fmt)
        if unit == "ten_min":
            b = pc.utf8_slice_codeunits(b, 0, 9)
        return pa.table({
            "bucket": b, "hits": t["hits"], "err_hits": t["err_hits"],
            "bytes_sum": t["bytes_sum"],
        })

    from ray.data.aggregate import Sum
    ds = ds_summary.map_batches(fn, batch_format="pyarrow")
    out = ds.groupby("bucket").aggregate(
        Sum("hits", alias_name="hits"),
        Sum("err_hits", alias_name="err_hits"),
        Sum("bytes_sum", alias_name="bytes_sum"),
    )
    return out.sort("bucket")
