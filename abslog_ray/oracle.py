"""Naive single-process pandas oracle — the equality target for the engine.

The public ``jkklee/abs-log`` repo ships no test suite and the checkout at
/root/reference is empty (SURVEY.md §0/§5.1); this module therefore encodes
the reference's *behavioral spec* (SURVEY.md §2) in the most literal
single-process way possible, deliberately NOT sharing code with the engine:

- parse: ``re.search`` of the same RE2-compatible pattern per line
  (reference: log_analyse.py re.match loop, M1/M2/M3/M6)
- path abstraction: per-SEGMENT split — all-digit or >=8-hex segment -> "*"
  (reference: common.py text_abstract(), M4).  This split-based definition is
  the semantic ground truth; the engine's two-pass RE2 kernel must equal it.
- args abstraction: "=value" -> "=?" keeping keys in appearance order (M5)
- gaps: per-conversation previous-turn ts delta in int64 microseconds (J3)
- summary: per (role, minute, pattern, args_abs) hits / uniq convs /
  err hits / byte sums / discrete gap quantiles (A1-A5), quantile convention
  = DuckDB quantile_disc (abslog_ray.quantiles)
- minute totals incl. invalid (unparsed) counts (A4/M6)
- query-time range re-aggregation with hits-weighted quantile merge (A6)

Column names here are the canonical output names; engine and DuckDB oracle
SQL must match them exactly (driver hashes sort columns by name).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from abslog_ray.config import PipelineConfig
from abslog_ray.quantiles import quantiles_disc, weighted_quantile_merge

_HEX = re.compile(r"^[0-9a-f]{8,}$")
_DIGITS = re.compile(r"^\d+$")


def abstract_path_one(path: str) -> str:
    """Ground-truth per-segment abstraction (defines M4 semantics)."""
    if path is None:
        return None
    segs = path.split("/")
    out = [
        "*" if (_DIGITS.match(s) or _HEX.match(s)) else s
        for s in segs
    ]
    return "/".join(out)


def abstract_args_one(args) -> str:
    if args is None or (isinstance(args, float) and np.isnan(args)):
        return None
    return re.sub(r"=[^&]*", "=?", args)


def oracle_parse(df: pd.DataFrame, cfg: PipelineConfig | None = None) -> pd.DataFrame:
    cfg = cfg or PipelineConfig()
    pat = re.compile(cfg.parse_pattern)
    ex = df["text"].str.extract(pat)
    out = df.copy()
    out["verb"] = ex["verb"]
    out["path"] = ex["path"]
    # a matched line with no '?' has args == NaN in pandas extract but ""
    # in RE2 (unmatched optional group inside a matching row). Pin to "".
    out["args"] = ex["args"].where(~(ex["verb"].notna() & ex["args"].isna()), "")
    out["status"] = ex["status"].astype("Int32")
    out["latency_ms"] = ex["latency_ms"].astype("Int32")
    out["parsed"] = ex["verb"].notna()
    out["minute"] = df["ts"].dt.floor("min")
    out["bytes"] = df["text"].str.encode("utf-8").str.len().astype("int64")
    return out


def oracle_enrich(df: pd.DataFrame, cfg: PipelineConfig | None = None,
                  tool_cats: dict | None = None) -> pd.DataFrame:
    from abslog_ray.fixtures import TOOL_CATS, ROLE_SINKS
    tool_cats = tool_cats if tool_cats is not None else TOOL_CATS
    out = df.copy()
    path_abs = out["path"].map(abstract_path_one, na_action="ignore")
    out["pattern"] = out["tool"].str.cat(path_abs, sep=":")
    out["args_abs"] = out["args"].map(abstract_args_one, na_action="ignore")
    out["tool_cat"] = out["tool"].map(tool_cats)
    out["sink"] = out["role"].map(ROLE_SINKS)
    return out


def oracle_gaps(df: pd.DataFrame) -> pd.DataFrame:
    """gap_us: int64 µs since previous turn of the same conv (by turn_idx);
    null for each conversation's first turn."""
    out = df.sort_values(["conv_id", "turn_idx"], kind="mergesort").copy()
    ts_us = out["ts"].astype("int64")
    gap = ts_us.groupby(out["conv_id"]).diff()
    out["gap_us"] = gap.astype("Int64")
    return out


SUMMARY_KEYS = ["role", "minute", "pattern", "args_abs"]


def oracle_summary(df: pd.DataFrame, cfg: PipelineConfig | None = None) -> pd.DataFrame:
    """Per-(role, minute, pattern, args_abs) summary over PARSED rows only."""
    cfg = cfg or PipelineConfig()
    d = df[df["parsed"]].copy()

    def agg(g: pd.DataFrame) -> pd.Series:
        gaps = g["gap_us"].dropna().to_numpy(dtype=np.int64)
        qs = quantiles_disc(gaps, cfg.quantiles)
        return pd.Series({
            "hits": len(g),
            "uniq_convs": g["conv_id"].nunique(),
            "err_hits": int((g["status"] >= 400).sum()),
            "bytes_sum": int(g["bytes"].sum()),
            "gap_sum": gaps.sum() if len(gaps) else None,
            "gap_count": len(gaps),
            "gap_p25": qs[0], "gap_p50": qs[1],
            "gap_p75": qs[2], "gap_p95": qs[3],
        })

    out = (d.groupby(SUMMARY_KEYS, dropna=False, sort=True)
             .apply(agg, include_groups=False)
             .reset_index())
    for c in ("hits", "uniq_convs", "err_hits", "bytes_sum", "gap_count"):
        out[c] = out[c].astype("int64")
    for c in ("gap_sum", "gap_p25", "gap_p50", "gap_p75", "gap_p95"):
        out[c] = out[c].astype("Int64")
    return out


def oracle_minute_totals(df: pd.DataFrame) -> pd.DataFrame:
    """Per (role, minute) over ALL rows: total/invalid hits + byte totals."""
    g = df.groupby(["role", "minute"], sort=True)
    out = pd.DataFrame({
        "total_hits": g.size(),
        "invalid_hits": g["parsed"].apply(lambda s: int((~s).sum())),
        "total_bytes": g["bytes"].sum(),
    }).reset_index()
    for c in ("total_hits", "invalid_hits", "total_bytes"):
        out[c] = out[c].astype("int64")
    return out


def oracle_route_counts(df: pd.DataFrame) -> pd.DataFrame:
    """Router sink row counts per (role, minute) — every row routed (M6:
    invalid rows are routed+flagged, never silently dropped)."""
    out = (df.groupby(["role", "minute"], sort=True).size()
             .rename("routed_rows").reset_index())
    out["routed_rows"] = out["routed_rows"].astype("int64")
    return out


def oracle_show_merge(summary: pd.DataFrame,
                      t_from=None, t_to=None, role=None,
                      by=("pattern",)) -> pd.DataFrame:
    """A6: re-aggregate summary rows over [t_from, t_to) — sums exact,
    quantiles = hits-weighted mean of per-row (per-minute) quantiles."""
    d = summary
    if t_from is not None:
        d = d[d["minute"] >= t_from]
    if t_to is not None:
        d = d[d["minute"] < t_to]
    if role is not None:
        d = d[d["role"] == role]
    by = list(by)

    def agg(g):
        w = g["gap_count"].to_numpy(dtype=np.float64)
        res = {
            "hits": int(g["hits"].sum()),
            "uniq_convs_ub": int(g["uniq_convs"].sum()),  # upper bound: not
            # mergeable exactly from summaries (reference has same limit)
            "err_hits": int(g["err_hits"].sum()),
            "bytes_sum": int(g["bytes_sum"].sum()),
            "gap_sum": g["gap_sum"].sum(min_count=1),
            "gap_count": int(g["gap_count"].sum()),
        }
        for q in ("gap_p25", "gap_p50", "gap_p75", "gap_p95"):
            vals = g[q].to_numpy(dtype=np.float64)
            res[q] = weighted_quantile_merge(vals, w)
        return pd.Series(res)

    out = (d.groupby(by, dropna=False, sort=True)
             .apply(agg, include_groups=False).reset_index())
    return out
