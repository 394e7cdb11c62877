#!/usr/bin/env python
"""Benchmark harness (BASELINE.md protocol).

Default: run the headline flagship pipeline over the bench-tier synthetic
transcript fixture (~6M turns; generated once, cached) plus a representative
query subset over ``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1), under
``ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS or 32)``.  Prints TWO
JSON lines — the full record (headline + per-query walls), then the
compact headline ALONE as the final line so a tail-capturing recorder can
always parse it (VERDICT r04 wrong #1):

  {"metric": "flagship_wall_sec", "value": N, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "turns": T,
   "turns_per_sec": R}
  {"metric": "flagship_wall_sec", "value": N, "unit": "sec", ...}

``--scaling``: runs the headline twice in fresh subprocesses at two
parallelism levels (``$GRAFT_SCALE_PAIR``, default 4,16 — the pair that
isolates worker scaling from Ray's own system processes on a 32-CPU host,
see BASELINE.md) on the SAME input and reports both throughputs plus
scaling efficiency = (thr_hi / thr_lo) / (hi / lo) (target >= 0.8).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_TIER = os.environ.get("GRAFT_BENCH_TIER", "bench24")  # ~24M turns
OBJECT_STORE = 16 * 1024**3  # fixed across runs so scaling isolates CPUs

BENCH_QUERIES = [
    "flagship_summary", "parse_fields", "gaps", "top_patterns",
    "pattern_detail", "minute_totals", "exact_dedup", "token_stats",
    "jaccard_pairs", "minhash_dupes", "knn", "embedding_dupes",
    "lsh_ann", "lsh_near_dup", "simhash", "simhash_dupes", "langid",
    "approx_uniq_users", "purchase_attribution", "heavy_tokens",
    "token_rarity", "near_dedup_corpus", "dedup_clusters",
    "status_breakdown", "distribution_hour_pattern", "lsh_near_dup_probe",
    "ivf_ann", "contamination", "sample_docs", "stratified_sample",
    "rolling_hits", "tfidf_top_terms", "label_centroids",
    # never-benched-first (VERDICT r04 missing #1): these 12 were
    # budget-skipped in r04 — run them right after the r01–r03
    # comparability set so a tight budget can only skip queries that
    # already have a published wall in BASELINE.md
    "rolling_active_users", "quantized_embeddings", "cms_check",
    "value_trend_by_type", "dataset_split", "unigram_surprisal",
    "chi2_cells", "conversion_lag", "embedding_outliers",
    "gap_by_transition", "vocab_overlap", "zipf_slope_by_lang",
    "ivf_ann_indexed", "minhash_dupes_indexed", "near_dup_delta",
    "substring_pairs", "clicks_after_purchase", "pack_sequences",
    "bpe_token_counts", "bm25_topk", "cluster_representatives",
    "training_order", "source_mixture",
    # round-4 breadth
    "top_revenue_orders", "user_cumulative", "nearest_centroid",
    "regional_revenue", "funnel_users", "distinct_users_daily",
    "event_type_pivot", "top_bigrams", "zipf_counts", "char_entropy",
    "tool_transitions", "conversation_stats", "last_event_per_user",
    "user_value_ntile", "median_value_by_type", "props_sum_by_type",
    "length_filtered", "normalized_texts", "customer_order_counts",
    "idle_customers", "value_histogram", "multi_grain_totals",
    "order_coverage_outer", "rollup_hits", "mode_pattern_by_role",
    "tool_sequences", "value_props_corr", "kmeans",
    "embedding_covariance", "dow_totals", "big_orders",
    "p90_value_by_type", "cube_hits", "repeat_users",
    "value_stddev_by_type",
    # round-4 second wave
    "cohort_retention", "minute_deltas", "minute_anomalies",
    "degree_distribution", "pagerank", "postings", "edit_dupes",
    "streak_ends", "pmi_bigrams",
]


def _consume(res) -> int:
    import pandas as pd
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.count()
    if isinstance(res, (pa.Table, pd.DataFrame)):
        return len(res)
    return 0


def run_headline() -> dict:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS,
                 include_dashboard=False, logging_level="ERROR",
                 object_store_memory=OBJECT_STORE)
    from abslog_ray.config import tune_data_context
    tune_data_context()

    from abslog_ray.config import PipelineConfig
    from abslog_ray.fixtures import ROLE_SINKS, TOOL_CATS, fixture_parquet
    from abslog_ray.pipelines.run import build_enriched, build_summary
    from abslog_ray.sources.transcripts import read_transcripts

    bench_path = fixture_parquet(BENCH_TIER, num_files=96)
    cfg = PipelineConfig(tool_lookup=dict(TOOL_CATS),
                         role_lookup=dict(ROLE_SINKS))

    # input block count: 2 waves per CPU, >=256 MiB decoded per block
    # (local read autotuning oversplits; see config.resolve_read_blocks)
    import glob as _glob
    from abslog_ray.config import PARQUET_DECODE_EXPANSION, resolve_read_blocks
    disk = sum(os.path.getsize(f) for f in
               _glob.glob(os.path.join(bench_path, "*.parquet")))
    n_blocks = resolve_read_blocks(NUM_CPUS, disk * PARQUET_DECODE_EXPANSION)

    # warm OS page cache (untimed) so we measure compute + shuffle
    ds = read_transcripts(bench_path)
    n_turns = ds.count()

    # best-of-N headline (default 3): the host shows ±8–25% window
    # variance across ALL workloads plus a ~15% first-job-after-load
    # position effect (BASELINE.md round-5 counterbalanced A/B); min
    # wall strips the noise floor while every repeat is reported
    repeats = int(os.environ.get("GRAFT_BENCH_REPEATS", "3"))
    walls = []
    n_summary = 0
    for _ in range(max(1, repeats)):
        t0 = time.time()
        summary = build_summary(
            build_enriched(
                read_transcripts(bench_path, override_num_blocks=n_blocks),
                cfg),
            cfg)
        n_summary = summary.count()
        walls.append(time.time() - t0)
    wall = min(walls)

    # full EP1 with routed/summary/totals sinks + manifest (resumable shape);
    # skipped in scaling subruns, which time the flagship alone
    if os.environ.get("BENCH_HEADLINE_ONLY"):
        return {"turns": n_turns, "summary_rows": n_summary,
                "wall_sec": round(wall, 3),
                "wall_sec_repeats": [round(w, 3) for w in walls],
                "turns_per_sec": round(n_turns / wall, 1),
                "ep1_sinks_wall_sec": None,
                "ep1_sinks_turns_per_sec": None}
    import dataclasses
    import shutil
    from abslog_ray.pipelines.run import run_pipeline
    sink = "/tmp/abslog_bench_sinks"
    shutil.rmtree(sink, ignore_errors=True)
    cfg2 = dataclasses.replace(cfg, sink_root=sink, chunk_files=48)
    t0 = time.time()
    run_pipeline(bench_path, cfg2)
    ep1_wall = time.time() - t0
    shutil.rmtree(sink, ignore_errors=True)

    return {"turns": n_turns, "summary_rows": n_summary,
            "wall_sec": round(wall, 3),
            "wall_sec_repeats": [round(w, 3) for w in walls],
            "turns_per_sec": round(n_turns / wall, 1),
            "ep1_sinks_wall_sec": round(ep1_wall, 3),
            "ep1_sinks_turns_per_sec": round(n_turns / ep1_wall, 1)}


def run_queries() -> tuple:
    """Time each bench query under a SOFT wall budget
    (``$GRAFT_BENCH_BUDGET_S``, default 420 s for the query section):
    the registry has grown past 110 queries, and an unbounded sweep in
    a slow host window could outlive a driver-side timeout and lose the
    WHOLE JSON line.  Queries run in list order; once the budget is
    spent the remainder is reported in ``queries_skipped`` — an honest
    partial beats a killed run.  Set the env to 0 to disable."""
    import ray
    from abslog_ray.pipelines.queries import QUERIES
    budget = float(os.environ.get("GRAFT_BENCH_BUDGET_S", "420"))
    out = {}
    skipped = []
    start = time.time()
    for i, name in enumerate(BENCH_QUERIES):
        if budget > 0 and time.time() - start > budget:
            skipped = BENCH_QUERIES[i:]
            break
        fn, _sql = QUERIES[name]
        t0 = time.time()
        _consume(fn(SF_DIR))
        out[name] = round(time.time() - t0, 3)
    return out, skipped


def main():
    if "--scaling" in sys.argv:
        pair = tuple(int(x) for x in
                     os.environ.get("GRAFT_SCALE_PAIR", "4,16").split(","))
        results = {}
        for ncpu in pair:
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                       BENCH_HEADLINE_ONLY="1")
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                capture_output=True, text=True, check=True,
                cwd=os.path.dirname(os.path.abspath(__file__))).stdout
            results[ncpu] = json.loads(out.strip().splitlines()[-1])
        lo, hi = pair
        thr_lo = results[lo]["turns_per_sec"]
        thr_hi = results[hi]["turns_per_sec"]
        print(json.dumps({
            "metric": "scaling_efficiency",
            "value": round((thr_hi / thr_lo) / (hi / lo), 3),
            "unit": "ratio",
            f"thr_{lo}cpu_turns_per_sec": thr_lo,
            f"thr_{hi}cpu_turns_per_sec": thr_hi,
            f"sec_{lo}cpu": results[lo]["value"],
            f"sec_{hi}cpu": results[hi]["value"],
            "turns": results[lo]["turns"],
        }))
        return

    head = run_headline()
    qs, skipped = (({}, []) if os.environ.get("BENCH_HEADLINE_ONLY")
                   else run_queries())
    headline = {
        "metric": "flagship_wall_sec",
        "value": head["wall_sec"],
        "wall_sec_repeats": head.get("wall_sec_repeats"),
        "unit": "sec",
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "turns": head["turns"],
        "turns_per_sec": head["turns_per_sec"],
        "summary_rows": head["summary_rows"],
        "ep1_sinks_wall_sec": head["ep1_sinks_wall_sec"],
        "ep1_sinks_turns_per_sec": head["ep1_sinks_turns_per_sec"],
        "n_queries_timed": len(qs),
        "queries_skipped": skipped,
    }
    # Two lines (VERDICT r04 wrong #1): the legacy full line FIRST
    # (headline + per-query walls — the query dict has outgrown a
    # 2 KB line), then the compact headline ALONE as the LAST line.
    # The recording harness keeps the TAIL of stdout and parses from
    # there (BENCH_r04.json: the oversized single line lost its head
    # and parsed as null), so the headline must be small and last —
    # truncation can then never eat it, whatever the buffer size.
    print(json.dumps(dict(headline, queries=qs)))
    print(json.dumps(headline))
    import ray
    ray.shutdown()


if __name__ == "__main__":
    main()
