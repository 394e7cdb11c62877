"""Pipeline configuration — the graft of abs-log's ``config.py`` extension
surface (SURVEY.md §2 X1: log_pattern regex, abs_special abstraction
overrides, exclusions, sink endpoint, limits).

Everything the reference exposed as module globals is a declared dataclass
here; the parse pattern and abstraction rules are the user-extension points.
All regexes are RE2-compatible (pyarrow.compute and DuckDB both run RE2, so
oracle SQL mirrors behave identically — verified empirically, see
tests/test_kernels.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

# The grok-style parse pattern applied to every turn's ``text`` column
# (reference: nginx ``log_format`` regex in config.py + re.match in
# log_analyse.py, SURVEY.md §2 M1/M2). Named groups become columns.
# RE2 subset only: no lookaround, no backreferences.
DEFAULT_PARSE_PATTERN = (
    r"(?P<verb>GET|POST|CALL|EXEC) "
    r"(?P<path>/[^\s?]*)"
    r"(?:\?(?P<args>[^\s]*))?"
    r" status=(?P<status>\d{3}) took=(?P<latency_ms>\d+)ms"
)

# Path-segment abstraction (reference: common.py text_abstract(), SURVEY.md
# §2 M4): an all-digit segment, or a long (>=8) hex-ish segment, becomes
# ``*``.  RE2 has no lookahead, and non-overlapping matches consume the
# trailing ``/`` — so adjacent variable segments (``/1/2/``) need a second
# pass to reach the fixpoint.  Two passes suffice for any segment count
# (pass 1 rewrites odd-position matches, pass 2 the ones in between); the
# per-segment-split oracle in abslog_ray.oracle defines the semantics and
# tests assert the two-pass kernel equals it.
DEFAULT_SEGMENT_RULE = (r"/(\d+|[0-9a-f]{8,})(/|$)", r"/*\2", 2)

# Query-arg abstraction (reference: k1=v1&k2=v2 -> k1=?&k2=?, key order
# preserved as seen; SURVEY.md §2 M5).
DEFAULT_ARGS_RULE = (r"=[^&]*", r"=?")

DEFAULT_QUANTILES = (0.25, 0.5, 0.75, 0.95)


@dataclass
class PipelineConfig:
    """All knobs for one pipeline run (EP1) and its query layer (EP2)."""

    # --- parse / abstraction (X1/X2 extension surface) ---
    parse_pattern: str = DEFAULT_PARSE_PATTERN
    # ordered list of (regex, replacement, n_passes) applied to `path`
    abstraction_rules: tuple = (DEFAULT_SEGMENT_RULE,)
    args_rule: tuple = DEFAULT_ARGS_RULE
    # optional row-exclusion predicate config (reference's excluded ips/uris,
    # SURVEY.md §2 M7): regex on text; matching rows counted, not silently
    # dropped.
    exclude_text_regex: Optional[str] = None

    # --- aggregation ---
    quantiles: tuple = DEFAULT_QUANTILES
    # exact quantiles carry per-key value lists through the combine (the
    # reference computes exact within-minute quartiles); the sketch path
    # uses a fixed log-spaced histogram for bounded memory at 10^12 scale.
    # True | False | "auto" ("auto": exact below exact_quantiles_max_bytes
    # of estimated decoded input, histogram sketch above — so the scale
    # path engages by default on large runs while the oracle gate keeps
    # exact mode on test-sized inputs).
    exact_quantiles: "bool | str" = "auto"
    exact_quantiles_max_bytes: int = 8 << 30
    # buckets for the bucket-hashed final merge of the two-phase aggregate
    # (the "salt" S of SURVEY.md §4.2: work is spread over agg_buckets
    # reducers regardless of key skew because phase A pre-combines per batch)
    # — int or "auto" (sized from input bytes; each bucket is ONE in-memory
    # reducer group, so bucket count must grow with data volume)
    agg_buckets: "int | str" = 64
    # buckets for the per-conversation gap shuffle (each bucket holds many
    # whole conversations; vectorized lag inside the bucket)
    gap_buckets: "int | str" = 64
    # "auto" sizing target: decoded input bytes per bucket-group (a bucket
    # is processed as one in-memory pandas/arrow group on one worker)
    target_bucket_bytes: int = 256 << 20

    # --- stage sizing ---
    parse_batch_size: Optional[int] = None  # None = one batch per block
    enrich_batch_size: int = 32768
    # actor-pool autoscaling (min, max); max sized for a full 32-CPU node —
    # the pool measured ~5% faster at (2,32) than capped at 16 (autoscaler
    # only grows the pool under load, so small hosts are unaffected)
    enrich_concurrency: tuple = (2, 32)

    # --- sinks / checkpoint ---
    sink_root: Optional[str] = None        # routed rows (sink A) + summaries (sink B)
    checkpoint_dir: Optional[str] = None   # manifest location
    chunk_files: int = 64                  # input fragments per resumable chunk
    min_rows_per_file: int = 500_000
    # bounded write fan-out: files per sink ≈ write_concurrency × partition
    # dirs touched; unbounded task counts explode into tiny files
    write_concurrency: int = 8

    # --- lookups (broadcast small side, SURVEY.md §2 T1/J1) ---
    tool_lookup: dict = field(default_factory=dict)   # tool -> tool_cat
    role_lookup: dict = field(default_factory=dict)   # role -> sink name

    # --- user extension surface (SURVEY.md §2 X2) ---
    # ordered custom stages inserted AFTER enrich, BEFORE routing/aggregate.
    # Each entry is either fn(pa.Table)->pa.Table (stateless task stage) or
    # a callable CLASS (stateful actor-pool stage, like Enricher).
    extra_stages: tuple = ()

    # --- optional in-pipeline exact dedup (training-data collector) ---
    # Route rows through a text-fingerprint dedup BEFORE parse: per
    # distinct text keep the first row by (conv_id, turn_idx), and drop
    # rows whose text appeared in ANY previously committed chunk (the
    # cross-chunk seen-set is the fp64 column of the routed sink itself —
    # durable, resume-safe, no in-memory state).  Costs one extra keyed
    # shuffle of the raw rows per chunk.
    dedup_turns: bool = False

    # conversations are assumed bounded (FIXTURES.md clips at 1000 turns);
    # a conversation longer than this raises in the gap stage rather than
    # silently blowing a bucket's memory (SURVEY.md §4.2 giant-conv guard).
    max_conv_turns: int = 100_000


# decoded-Arrow expansion over on-disk Parquet (measured ~4x on the
# transcript tables: dictionary+snappy compressed text columns)
PARQUET_DECODE_EXPANSION = 4


def resolve_buckets(setting, input_bytes=None,
                    target_bucket_bytes: int = 256 << 20,
                    lo: int = 16, hi: int = 1 << 16,
                    default: int = 64) -> int:
    """Resolve an int-or-"auto" bucket-count knob.

    "auto" sizes bucket count from estimated DECODED input bytes so each
    bucket-group stays ~target_bucket_bytes regardless of data volume
    (VERDICT r01 "What's missing #3": fixed defaults OOM a worker at
    100x scale).  With no size estimate available (driver-side query
    paths on pre-transformed Datasets, where probing would trigger
    execution) falls back to ``default``; run_pipeline resolves from the
    chunk's file sizes before building stages."""
    if setting != "auto":
        return int(setting)
    if not input_bytes:
        return default
    want = -(-int(input_bytes) // target_bucket_bytes)   # ceil-div
    return min(hi, max(lo, want))


def resolve_read_blocks(n_cpus: int, decoded_bytes: int,
                        per_block: int = 256 << 20) -> int:
    """Input block count for the pipeline's parquet reads: enough blocks
    for 2 waves of tasks per CPU, bounded below by ~256 MiB decoded per
    block.  Ray's local-mode read autotuning oversplits instead
    (read_op_min_num_blocks=200 → 3 blocks per fragment on the bench
    fixture), and every extra block multiplies sort-shuffle coordination:
    measured 24M-turn flagship 40-43 s at 288 blocks vs 31-33 s at 64-96
    (32 CPUs).  Fragment-count-independent, so wider clusters simply raise
    the CPU term."""
    waves = 2 * max(int(n_cpus), 1)
    by_size = -(-int(decoded_bytes) // per_block) if decoded_bytes else 1
    return max(waves, by_size)


def resolve_exact_quantiles(setting, input_bytes=None,
                            max_bytes: int = 8 << 30) -> bool:
    """Resolve the True|False|"auto" exact-quantile knob: "auto" keeps the
    oracle-exact value-list path below ``max_bytes`` of estimated decoded
    input and switches to the bounded-memory histogram sketch above it
    (the partial state of a hot key would otherwise carry every gap value
    through the shuffle).  Unknown size → exact (correctness-safe)."""
    if setting != "auto":
        return bool(setting)
    return input_bytes is None or int(input_bytes) <= max_bytes


def tune_data_context():
    """Engine-recommended Ray Data execution knobs (measured on this host:
    push-based sort shuffle beats pull-based ~20% on the bucket groupbys;
    hash-shuffle strategy measured 3x SLOWER — do not enable).  Call from
    entry points that own the session (bench/CLI); the driver-owned session
    is left untouched by library code."""
    import ray.data
    from ray.data.context import ShuffleStrategy
    ctx = ray.data.DataContext.get_current()
    ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
    ctx.enable_progress_bars = False
    return ctx
