"""Vectorized grok/regex parse stage (SURVEY.md §2 M1/M2/M3/M6/M8).

Reference semantics: abs-log regex-matches every log line against the
configured ``log_format`` pattern (log_analyse.py per-line ``re.match`` loop);
non-matching lines are counted as invalid, never silently dropped.

Graft: one ``pyarrow.compute.extract_regex`` pass over the zero-copy Arrow
``text`` column per batch — a single RE2 scan extracting all named groups at
once; nulls + ``parsed=false`` for non-matching rows.  Stateless pure
function → Ray schedules it as tasks, no actor needed (compiled pattern
lives in RE2's per-process cache; recompilation per batch is nanoseconds
relative to the scan).

Adds columns: verb, path, args (string; "" when the span has no '?'),
status:int32, latency_ms:int32, parsed:bool, minute:timestamp[us],
bytes:int64 (octet length of text — the reference's body_bytes_sent
dimension, proxied per SURVEY.md §1.2).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def parse_batch(batch: pa.Table, pattern: str) -> pa.Table:
    text = batch["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    ex = pc.extract_regex(text, pattern)
    parsed = ex.is_valid()
    # struct_field propagates struct-level nulls to children
    verb = pc.struct_field(ex, "verb")
    path = pc.struct_field(ex, "path")
    args = pc.struct_field(ex, "args")
    status = pc.cast(pc.struct_field(ex, "status"), pa.int32())
    latency = pc.cast(pc.struct_field(ex, "latency_ms"), pa.int32())
    minute = pc.floor_temporal(batch["ts"], unit="minute")
    nbytes = pc.cast(pc.binary_length(text), pa.int64())
    return (
        batch
        .append_column("verb", verb)
        .append_column("path", path)
        .append_column("args", args)
        .append_column("status", status)
        .append_column("latency_ms", latency)
        .append_column("parsed", parsed)
        .append_column("minute", minute)
        .append_column("bytes", nbytes)
    )


def make_parse_fn(pattern: str):
    """Bind the config pattern; returned fn is a stateless map_batches task."""
    def fn(batch: pa.Table) -> pa.Table:
        return parse_batch(batch, pattern)
    return fn
