"""Edge-case hardening: empty fragments, all-invalid text, degenerate
conversations, empty pipeline results."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from abslog_ray import oracle
from abslog_ray.pipelines.run import build_enriched, build_summary, run_pipeline
from abslog_ray.stages.aggregate import minute_totals

from tests.util import assert_frames_equal

SCHEMA = pa.schema([
    ("conv_id", pa.string()), ("turn_idx", pa.int32()),
    ("role", pa.string()), ("text", pa.string()),
    ("tool", pa.string()), ("ts", pa.timestamp("us")),
])


def _write(df: pd.DataFrame, d: str, name="part.parquet") -> str:
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.Table.from_pandas(df, schema=SCHEMA, preserve_index=False),
        os.path.join(d, name))
    return d


def _mini(texts, tool="search", role="user"):
    n = len(texts)
    return pd.DataFrame({
        "conv_id": ["c1"] * n,
        "turn_idx": np.arange(n, dtype=np.int32),
        "role": [role] * n,
        "text": texts,
        "tool": [tool] * n,
        "ts": pd.date_range("2026-01-01", periods=n, freq="s")
                .astype("datetime64[us]"),
    })


def test_all_invalid_text(default_cfg, tmp_path):
    """No parseable span anywhere: summary empty, totals count everything
    as invalid."""
    d = _write(_mini(["no span here", "also nothing", "zilch"]),
               str(tmp_path / "inv"))
    enr = build_enriched(ray.data.read_parquet(d), default_cfg)
    s = build_summary(enr, default_cfg).to_pandas()
    assert len(s) == 0
    t = minute_totals(enr).to_pandas()
    assert t["invalid_hits"].sum() == 3
    assert t["total_hits"].sum() == 3


def test_single_turn_conversations(default_cfg, tmp_path):
    """Every conversation has one turn: all gaps null, quantiles null."""
    df = _mini(["x GET /a/1 status=200 took=5ms"] * 3)
    df["conv_id"] = ["a", "b", "c"]
    df["turn_idx"] = np.zeros(3, dtype=np.int32)
    d = _write(df, str(tmp_path / "single"))
    enr = build_enriched(ray.data.read_parquet(d), default_cfg)
    s = build_summary(enr, default_cfg).to_pandas()
    assert s["hits"].sum() == 3
    assert s["gap_count"].sum() == 0
    assert s["gap_p50"].isna().all() and s["gap_sum"].isna().all()


def test_empty_fragment_among_files(default_cfg, tmp_path):
    """An empty parquet fragment mixed into the input changes nothing."""
    d = str(tmp_path / "mix")
    _write(_mini(["x GET /a/7 status=200 took=5ms",
                  "y POST /b/8 status=500 took=6ms"]), d, "a.parquet")
    _write(_mini([]).iloc[:0], d, "empty.parquet")
    enr = build_enriched(ray.data.read_parquet(d), default_cfg)
    s = build_summary(enr, default_cfg).to_pandas()
    assert s["hits"].sum() == 2
    assert s["err_hits"].sum() == 1


def test_run_pipeline_empty_input(default_cfg, tmp_path):
    import dataclasses
    cfg = dataclasses.replace(default_cfg,
                              sink_root=str(tmp_path / "sink"))
    metrics = run_pipeline([], cfg)
    assert metrics == {}


def test_oracle_agreement_on_edge_frame(default_cfg, tmp_path):
    """Mixed edge shapes still equal the oracle."""
    df = pd.concat([
        _mini(["GET /only status=200 took=1ms"]),
        _mini(["garbage", "CALL /x/123/y?a=1 status=503 took=9ms"],
              tool="sql", role="tool").assign(conv_id="c2"),
    ], ignore_index=True)
    d = _write(df, str(tmp_path / "edge"))
    enr = build_enriched(ray.data.read_parquet(d), default_cfg)
    got = build_summary(enr, default_cfg).to_pandas()
    oe = oracle.oracle_enrich(oracle.oracle_parse(df, default_cfg),
                              default_cfg)
    want = oracle.oracle_summary(oracle.oracle_gaps(oe), default_cfg)
    assert_frames_equal(got, want, ["role", "minute", "pattern", "args_abs"])
