"""Quantile conventions, pinned once for the whole engine.

The reference (abs-log ``common.py get_quartile()``, SURVEY.md §2 A2) computes
exact positional (non-interpolated) quartiles over the values collected within
one minute.  The graft pins the positional convention to DuckDB's
``quantile_disc`` so the driver's DuckDB oracle can check it bit-exactly:

    index(q, n) = ceil(q*n) - 1            (0-based, element of the input)

verified empirically against DuckDB 1.0.0 across sizes including the float
edge q=0.95, n=20 where naive ``ceil(0.95*20)`` would give 20 due to binary
rounding — hence the epsilon.  Gap values are int64 microseconds throughout
so both engines pick the identical element with no float drift.

Query-time merging across minutes (SURVEY.md §2 A6): the reference does NOT
keep raw samples in its minute documents; ``log_show`` approximates range
quantiles as the hits-weighted mean of the per-minute quantiles.  Same here.
"""

from __future__ import annotations

import math

import numpy as np

_EPS = 1e-9


def quantile_disc_index(q: float, n: int) -> int:
    """0-based index of the q-quantile element among n sorted values."""
    if n <= 0:
        raise ValueError("n must be positive")
    idx = int(math.ceil(q * n - _EPS)) - 1
    return min(max(idx, 0), n - 1)


def quantile_disc(sorted_vals: np.ndarray, q: float):
    """Discrete quantile of an ascending-sorted 1-d array; None if empty."""
    n = len(sorted_vals)
    if n == 0:
        return None
    return sorted_vals[quantile_disc_index(q, n)]


def quantiles_disc(values: np.ndarray, qs) -> list:
    """Sort once, return [quantile_disc(q) for q in qs]; Nones if empty."""
    if len(values) == 0:
        return [None] * len(qs)
    s = np.sort(values)
    return [s[quantile_disc_index(q, len(s))] for q in qs]


def weighted_quantile_merge(per_part_quantiles: np.ndarray,
                            weights: np.ndarray) -> float | None:
    """Hits-weighted mean of per-partition quantiles (A6 merge formula).

    ``per_part_quantiles`` may contain NaN (partitions with no gap values);
    those partitions are excluded together with their weights.
    """
    q = np.asarray(per_part_quantiles, dtype=np.float64)
    w = np.asarray(weights, dtype=np.float64)
    mask = ~np.isnan(q)
    if not mask.any():
        return None
    wt = w[mask]
    tot = wt.sum()
    if tot <= 0:
        return None
    return float((q[mask] * wt).sum() / tot)


def disc_quantile_from_counts(values: np.ndarray, counts: np.ndarray,
                              q: float):
    """Discrete quantile from a (value, count) histogram — the exact
    quantile of the expanded multiset without materializing it.  Sorts
    the distinct values, cumulative-sums the counts, and picks the value
    covering the pinned `quantile_disc_index` position."""
    if len(values) == 0:
        return None
    order = np.argsort(values, kind="stable")
    v = np.asarray(values)[order]
    c = np.asarray(counts)[order]
    cum = np.cumsum(c)
    idx = quantile_disc_index(q, int(cum[-1]))
    return v[int(np.searchsorted(cum, idx + 1))]


def cont_quantile_from_counts(values: np.ndarray, counts: np.ndarray,
                              q: float):
    """Linear-interpolated (``quantile_cont``-convention) quantile from
    a (value, count) histogram: pos = q*(n-1) over the expanded sorted
    multiset, result = lo + (hi - lo) * frac.  The expression is kept
    in this exact operand order so a SQL mirror computing the same
    formula on the same doubles is bit-identical (do NOT compare
    against an engine's built-in quantile_cont, whose internal
    interpolation order is unspecified)."""
    if len(values) == 0:
        return None
    order = np.argsort(values, kind="stable")
    v = np.asarray(values, dtype=np.float64)[order]
    cum = np.cumsum(np.asarray(counts)[order])
    pos = q * float(int(cum[-1]) - 1)
    f = np.floor(pos)
    lo = v[int(np.searchsorted(cum, int(f) + 1))]
    hi = v[int(np.searchsorted(cum, int(np.ceil(pos)) + 1))]
    return float(lo + (hi - lo) * (pos - f))
