"""Query layer (EP2) vs oracle A6 merge semantics; distribution buckets."""

import numpy as np
import pandas as pd

import ray.data

from abslog_ray import oracle
from abslog_ray.pipelines import show
from abslog_ray.pipelines.run import build_enriched, build_summary


def _summary(t1_path, cfg):
    ds = ray.data.read_parquet(t1_path)
    return build_summary(build_enriched(ds, cfg), cfg)


def test_merge_over_range_equals_oracle(t1_path, t1_df, default_cfg):
    summary = _summary(t1_path, default_cfg)
    got = show.merge_over_range(summary, by=("pattern",)).to_pandas()
    got = got.sort_values("pattern", ignore_index=True)

    oe = oracle.oracle_enrich(oracle.oracle_parse(t1_df, default_cfg),
                              default_cfg)
    osum = oracle.oracle_summary(oracle.oracle_gaps(oe), default_cfg)
    want = oracle.oracle_show_merge(osum).sort_values(
        "pattern", ignore_index=True)

    assert len(got) == len(want)
    for c in ("hits", "err_hits", "bytes_sum", "gap_count",
              "uniq_convs_ub"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    for c in ("gap_p25", "gap_p50", "gap_p75", "gap_p95"):
        a = got[c].to_numpy(dtype=float)
        b = want[c].to_numpy(dtype=float)
        mask = ~np.isnan(b)
        assert np.allclose(a[mask], b[mask], rtol=1e-12), c


def test_time_filter_and_role(t1_path, t1_df, default_cfg):
    summary = _summary(t1_path, default_cfg).materialize()
    mid = pd.Timestamp("2026-01-01T01:00:00")
    got = show.merge_over_range(
        show.filter_range(summary, t_to=mid, role="user"),
        by=("pattern",)).to_pandas()

    oe = oracle.oracle_enrich(oracle.oracle_parse(t1_df, default_cfg),
                              default_cfg)
    osum = oracle.oracle_summary(oracle.oracle_gaps(oe), default_cfg)
    want = oracle.oracle_show_merge(osum, t_to=mid, role="user")
    assert len(got) == len(want)
    assert got["hits"].sum() == want["hits"].sum()


def test_distribution_buckets_sum_to_totals(t1_path, default_cfg):
    summary = _summary(t1_path, default_cfg).materialize()
    hour = show.distribution(summary, "hour").to_pandas()
    minute = show.distribution(summary, "minute").to_pandas()
    assert hour["hits"].sum() == minute["hits"].sum()
    assert (minute["bucket"].str[:8].isin(hour["bucket"])).all()


def test_top_patterns_pct(t1_path, default_cfg):
    summary = _summary(t1_path, default_cfg)
    top = show.top_patterns(summary, n=5).to_pandas()
    assert len(top) == 5
    assert top["hits"].is_monotonic_decreasing
    assert (top["hits_pct"] <= 100).all() and (top["hits_pct"] > 0).all()
