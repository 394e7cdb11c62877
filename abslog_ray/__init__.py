"""abslog_ray — a Ray-Data-native log/telemetry parse → enrich → route →
aggregate engine over Parquet transcript tables.

A from-scratch Ray Data reimplementation of the capabilities of
``jkklee/abs-log`` (fine-grained web-access-log summarization: regex parse,
uri/args abstraction, per-minute pattern aggregates with quartiles, query-time
re-aggregation), grafted onto multi-turn conversation/agent transcripts:

    transcripts(conv_id:string, turn_idx:int32, role:string,
                text:string, tool:string, ts:timestamp[us])

Architecture (idiomatic Ray Data, NOT a port):

- ``read_parquet`` → ``map_batches`` over zero-copy Arrow batches for the
  vectorized grok/regex parse (abs-log's per-line ``re.match`` loop,
  reconstructed semantics per SURVEY.md §2 M1-M6).
- A stateful actor-pool enrich stage (compiled abstraction rules + broadcast
  lookup dicts; abs-log's ``text_abstract()`` / config ``abs_special``,
  SURVEY.md §2 M4/M5/T1/J1).
- A fan-out router sink: partitioned Parquet keyed by (role, minute)
  (abs-log's per-(site, minute) MongoDB documents, SURVEY.md §2 S3).
- Shuffle 1: per-conversation turn-gap computation (latency proxy, SURVEY.md
  §2 J3) via bucket-hashed group processing.
- Shuffle 2: salted two-phase per-minute pattern aggregation — hits, unique
  conv count, err hits, byte sums, exact p25/p50/p75/p95 gap quantiles
  (abs-log's nested minute documents + ``get_quartile``, SURVEY.md §2 A1-A5).
- A query layer re-aggregating summaries over arbitrary time ranges with
  hits-weighted quantile merging (abs-log's ``log_show.py``, SURVEY.md §2
  A6/K1/K2/K3).
- Checkpoint manifest for per-fragment-chunk resume with lineage + metrics
  (abs-log's byte-offset files, SURVEY.md §2 S4).

The reference checkout at /root/reference was EMPTY at survey time; semantics
are pinned by ``abslog_ray.oracle`` (a deliberately naive single-process
pandas implementation) and cross-checked against DuckDB SQL oracles — see
SURVEY.md §0/§5.
"""

from abslog_ray.config import PipelineConfig, DEFAULT_PARSE_PATTERN
from abslog_ray.quantiles import quantile_disc, weighted_quantile_merge

__all__ = [
    "PipelineConfig",
    "DEFAULT_PARSE_PATTERN",
    "quantile_disc",
    "weighted_quantile_merge",
]

__version__ = "0.1.0"
