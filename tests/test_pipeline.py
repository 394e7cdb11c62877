"""Engine vs oracle equality (SURVEY.md §5.2 checks #1-#4):

1. per-turn text equality under stable (conv_id, turn_idx) ordering
2. exact per-sink aggregate counts
3. routed-row equality (order-insensitive)
4. exact quantile equality
"""

import os

import numpy as np
import pandas as pd
import pytest

import ray.data

from abslog_ray import oracle
from abslog_ray.pipelines.run import build_enriched, build_summary
from abslog_ray.stages.aggregate import minute_totals, route_counts
from abslog_ray.stages.gaps import with_gaps

from tests.util import assert_frames_equal

ROUTED_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts",
               "verb", "path", "args", "status", "latency_ms", "parsed",
               "minute", "bytes", "pattern", "args_abs", "tool_cat", "sink"]


@pytest.fixture(scope="module")
def enriched(t1_path, default_cfg):
    ds = ray.data.read_parquet(t1_path)
    return build_enriched(ds, default_cfg).materialize()


@pytest.fixture(scope="module")
def oracle_enriched(t1_df, default_cfg):
    return oracle.oracle_enrich(oracle.oracle_parse(t1_df, default_cfg),
                                default_cfg)


def test_text_equality_under_ordering(enriched, t1_df):
    """Check #1: routed text byte-equal to input under stable ordering."""
    got = enriched.select_columns(["conv_id", "turn_idx", "text"]).to_pandas()
    got = got.sort_values(["conv_id", "turn_idx"], ignore_index=True)
    want = t1_df[["conv_id", "turn_idx", "text"]].sort_values(
        ["conv_id", "turn_idx"], ignore_index=True)
    pd.testing.assert_frame_equal(got, want)


def test_routed_row_equality(enriched, oracle_enriched):
    """Check #3: full routed table equals oracle (order-insensitive)."""
    got = enriched.to_pandas()[ROUTED_COLS]
    want = oracle_enriched[ROUTED_COLS]
    assert_frames_equal(got, want, ["conv_id", "turn_idx"])


def test_route_counts(enriched, oracle_enriched):
    """Check #2 (routed counts per (role, minute))."""
    got = route_counts(enriched).to_pandas()
    want = oracle.oracle_route_counts(oracle_enriched)
    assert_frames_equal(got, want, ["role", "minute"])


def test_minute_totals(enriched, oracle_enriched):
    got = minute_totals(enriched).to_pandas()
    want = oracle.oracle_minute_totals(oracle_enriched)
    assert_frames_equal(got, want, ["role", "minute"])


def test_gaps(enriched, oracle_enriched, default_cfg):
    got = with_gaps(enriched, default_cfg).to_pandas()
    got = got.sort_values(["conv_id", "turn_idx"], ignore_index=True)
    want = oracle.oracle_gaps(oracle_enriched).reset_index(drop=True)
    pd.testing.assert_series_equal(
        got["gap_us"].astype("Int64"), want["gap_us"].astype("Int64"),
        check_index=False)


def test_summary_exact(enriched, oracle_enriched, default_cfg):
    """Checks #2/#4: full summary equality incl. exact quantiles."""
    got = build_summary(enriched, default_cfg).to_pandas()
    gapped = oracle.oracle_gaps(oracle_enriched)
    want = oracle.oracle_summary(gapped, default_cfg)
    assert_frames_equal(got, want,
                        ["role", "minute", "pattern", "args_abs"])


def test_summary_partial_mode_equal(enriched, oracle_enriched, default_cfg):
    """The pre-combine (salted partial) path equals the direct path and the
    oracle — salt/shape invariance (SURVEY.md §5.2 check #5)."""
    from abslog_ray.stages.aggregate import summarize
    from abslog_ray.pipelines.run import AGG_COLUMNS
    keep = [c for c in AGG_COLUMNS if c in enriched.schema().names]
    gapped = with_gaps(enriched.select_columns(keep), default_cfg)
    got = summarize(gapped, default_cfg, mode="partial").to_pandas()
    oracle_gapped = oracle.oracle_gaps(oracle_enriched)
    want = oracle.oracle_summary(oracle_gapped, default_cfg)
    assert_frames_equal(got, want,
                        ["role", "minute", "pattern", "args_abs"])


def test_summary_sketch_mode_close(enriched, oracle_enriched, default_cfg):
    """Histogram-sketch quantiles (bounded-memory scale path) are within the
    bucket relative error of exact; counts/sums stay exact."""
    import dataclasses
    from abslog_ray.stages.aggregate import summarize
    from abslog_ray.pipelines.run import AGG_COLUMNS
    cfg = dataclasses.replace(default_cfg, exact_quantiles=False)
    keep = [c for c in AGG_COLUMNS if c in enriched.schema().names]
    gapped = with_gaps(enriched.select_columns(keep), cfg)
    got = summarize(gapped, cfg).to_pandas()
    want = oracle.oracle_summary(oracle.oracle_gaps(oracle_enriched),
                                 default_cfg)
    key = ["role", "minute", "pattern", "args_abs"]
    m = got.merge(want, on=key, suffixes=("", "_w"))
    assert len(m) == len(want)
    assert (m["hits"] == m["hits_w"]).all()
    assert (m["bytes_sum"] == m["bytes_sum_w"]).all()
    g = m.dropna(subset=["gap_p50_w"])
    rel = (g["gap_p50"].astype(float) - g["gap_p50_w"].astype(float)).abs() \
        / g["gap_p50_w"].astype(float)
    assert rel.max() < 0.02, rel.max()


def test_summary_t2_scale(t2_path, default_cfg):
    """Same equality at t2 (60k rows) — more minutes, more collisions."""
    ds = ray.data.read_parquet(t2_path)
    enr = build_enriched(ds, default_cfg)
    got = build_summary(enr, default_cfg).to_pandas()

    df = ray.data.read_parquet(t2_path).to_pandas()
    oe = oracle.oracle_enrich(oracle.oracle_parse(df, default_cfg),
                              default_cfg)
    want = oracle.oracle_summary(oracle.oracle_gaps(oe), default_cfg)
    assert_frames_equal(got, want,
                        ["role", "minute", "pattern", "args_abs"])


def test_compact_sink_preserves_data(ray_session, tmp_path):
    """Compaction merges every multi-fragment leaf to one file, keeps
    values identical through read_parquet, and is a no-op on rerun."""
    import glob

    import numpy as np
    import pandas as pd
    import ray.data

    from abslog_ray.state.compact import compact_sink

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "role": rng.choice(["user", "tool"], 400).astype(object),
        "hour": rng.integers(0, 3, 400).astype(np.int64),
        "v": rng.integers(0, 10**6, 400).astype(np.int64)})
    root = str(tmp_path / "sink")
    (ray.data.from_pandas(df).repartition(8)
     .write_parquet(root, partition_cols=["role", "hour"]))
    before = glob.glob(os.path.join(root, "**", "*.parquet"),
                       recursive=True)
    leaves = {os.path.dirname(p) for p in before}
    assert len(before) > len(leaves)          # multi-fragment leaves exist

    stats = compact_sink(root, min_files=2)
    assert stats["files_before"].sum() >= len(before) - len(leaves)
    after = glob.glob(os.path.join(root, "**", "*.parquet"),
                      recursive=True)
    assert len(after) == len(leaves)          # one file per leaf
    got = (ray.data.read_parquet(root).to_pandas()
           .astype({"role": object, "hour": np.int64})
           .sort_values(["role", "hour", "v"], ignore_index=True))
    want = df.sort_values(["role", "hour", "v"], ignore_index=True)
    pd.testing.assert_frame_equal(got[["role", "hour", "v"]],
                                  want[["role", "hour", "v"]])
    # idempotent: second pass finds nothing
    assert compact_sink(root, min_files=2).empty


def test_compact_crash_recovery_both_windows(ray_session, tmp_path):
    """Simulate a crash on BOTH sides of the commit point (ADVICE r04:
    the rename→unlink window used to leave duplicated rows forever).

    Post-commit crash: final file + marker + fragments all present →
    the next compact_sink must unlink the stale fragments, not count
    the rows twice.  Pre-commit crash: marker + tmp present, final
    absent → fragments stay authoritative, marker/tmp swept."""
    import glob
    import json
    import shutil

    import numpy as np
    import pandas as pd
    import ray.data

    from abslog_ray.state.compact import compact_sink, recover_sink

    df = pd.DataFrame({"k": np.arange(60, dtype=np.int64),
                       "grp": (np.arange(60) % 2).astype(np.int64)})
    root = str(tmp_path / "sink")
    (ray.data.from_pandas(df).repartition(6)
     .write_parquet(root, partition_cols=["grp"]))
    leaf = os.path.join(root, "grp=0")
    frags = sorted(f for f in os.listdir(leaf) if f.endswith(".parquet"))
    assert len(frags) >= 2

    # --- post-commit crash: final renamed, fragments NOT yet unlinked
    merged = pd.concat(
        [pd.read_parquet(os.path.join(leaf, f)) for f in frags],
        ignore_index=True)
    final_name = "compact-deadbeef.parquet"
    merged.to_parquet(os.path.join(leaf, final_name))
    with open(os.path.join(leaf, "_compact-deadbeef.commit"), "w") as fh:
        json.dump({"final": final_name, "tmp": "_compact-deadbeef.tmp",
                   "fragments": frags}, fh)
    # naive read now sees every grp=0 row twice — the documented window
    assert len(ray.data.read_parquet(leaf).to_pandas()) == 2 * len(merged)
    compact_sink(root, min_files=2)            # recovery runs first
    got = ray.data.read_parquet(root).to_pandas()
    assert len(got) == len(df)
    assert sorted(got["k"]) == sorted(df["k"])

    # --- pre-commit crash: marker + tmp written, final never renamed
    shutil.rmtree(root)
    (ray.data.from_pandas(df).repartition(6)
     .write_parquet(root, partition_cols=["grp"]))
    leaf = os.path.join(root, "grp=1")
    frags = sorted(f for f in os.listdir(leaf) if f.endswith(".parquet"))
    pd.DataFrame({"k": [999]}).to_parquet(
        os.path.join(leaf, "_compact-cafe.tmp"))
    with open(os.path.join(leaf, "_compact-cafe.commit"), "w") as fh:
        json.dump({"final": "compact-cafe.parquet",
                   "tmp": "_compact-cafe.tmp", "fragments": frags}, fh)
    recover_sink(root)
    names = os.listdir(leaf)
    assert "_compact-cafe.commit" not in names
    assert "_compact-cafe.tmp" not in names
    assert sorted(f for f in names if f.endswith(".parquet")) == frags
    got = ray.data.read_parquet(root).to_pandas()
    assert sorted(got["k"]) == sorted(df["k"])


def test_fixture_content_hash_pinned():
    """Fixture generation must stay BIT-IDENTICAL across refactors (the
    Arrow rewrite of the string grammar was verified equal to the
    original numpy/pandas path at 2k/60k/2M rows before these hashes
    were pinned) — every oracle and bench number keys off this data."""
    import hashlib

    from abslog_ray.fixtures import generate_transcripts

    want = {
        2000: "4c29dba312ab94a0a2f6804a68747baa"
              "91825bfd97cd0ed7515c20dbdaca21ef",
        60000: "e5fa867572554d5c6f1136a61409accc"
               "f4aa11e9f30eedb2fc9b0efa563d2c06",
    }
    for nt, expect in want.items():
        t = generate_transcripts(seed=42, n_turns=nt)
        h = hashlib.sha256()
        for col in ("conv_id", "turn_idx", "role", "text", "tool", "ts"):
            h.update(str(t[col].to_pylist()).encode())
        assert h.hexdigest() == expect, nt
