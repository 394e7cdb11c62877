"""Transcript sources (SURVEY.md §2 S1/S2/S5).

Reference: abs-log incrementally tails per-site nginx access logs (seek to a
stored byte offset).  The graft's unit of input is a Parquet fragment; the
incremental/tail behavior lives in the chunked resume loop
(abslog_ray.pipelines.run + state.manifest), so the source layer is plain
``ray.data.read_parquet`` with column pruning.

Also provides ``transcripts_from_events``: a DETERMINISTIC, SQL-expressible
derivation of a transcript table from the driver's ``events`` table
(event_id, ts, user_id, event_type, value, props) — used by the driver
contract so the flagship transcript pipeline can be cross-checked by a
DuckDB oracle on the same inputs (FIXTURES.md §5).  The mirror SQL lives in
``__ray_entry__.oracle_sql``; both must stay in lockstep:

    conv_id  = 'c' || lpad(user_id, 8, '0')
    turn_idx = row_number() over (partition by user_id
                                  order by ts, event_id) - 1
    role     = ['user','assistant','tool','system'][(event_id // 4) % 4]
    tool     = event_type
    ts       = ts
    text     = event_id % 10 == 0  ->  'note ' || event_type || ' free text'
               else 'evt ' || VERB[event_id%4] || ' /api/' || event_type ||
                    '/' || event_id || ARGS || ' status=' ||
                    (500 if event_type='error' else 200) ||
                    ' took=' || (event_id % 997) || 'ms'
    ARGS     = event_id%3==0 -> ''        | 1 -> '?uid=' || user_id
               | 2 -> '?uid=' || user_id || '&k=' || (event_id % 7)
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

_ROLES = np.array(["user", "assistant", "tool", "system"])
_VERBS = np.array(["GET", "POST", "CALL", "EXEC"])


def list_fragments(path: str) -> list:
    if os.path.isdir(path):
        return sorted(glob.glob(os.path.join(path, "*.parquet")))
    return [path]


def read_transcripts(paths, columns=None, **kwargs):
    return ray.data.read_parquet(
        paths, columns=columns or TRANSCRIPT_COLUMNS, **kwargs)


def _events_to_transcript_batch(df: pd.DataFrame) -> pd.DataFrame:
    eid = df["event_id"].to_numpy()
    uid = df["user_id"].to_numpy()
    etype = df["event_type"].astype(str)

    verb = _VERBS[eid % 4]
    status = np.where(etype.to_numpy() == "error", "500", "200")
    lat = (eid % 997).astype("U4")

    args = np.where(
        eid % 3 == 0, "",
        np.where(
            eid % 3 == 1,
            np.char.add("?uid=", uid.astype("U20")),
            np.char.add(
                np.char.add(np.char.add("?uid=", uid.astype("U20")), "&k="),
                (eid % 7).astype("U2"))))

    span = pd.Series(np.char.add("evt ", verb)) \
        .str.cat(etype.str.cat(eid.astype("U20"), sep="/"), sep=" /api/") \
        .str.cat(pd.Series(args)) \
        .str.cat(pd.Series(status), sep=" status=") \
        .str.cat(pd.Series(lat), sep=" took=") + "ms"
    note = "note " + etype + " free text"
    text = span.where(pd.Series(eid % 10 != 0), note)

    out = pd.DataFrame({
        "conv_id": pd.Series(np.char.add("c", np.char.zfill(uid.astype("U20"), 8))),
        "user_id": df["user_id"].to_numpy(),   # kept for turn_idx assignment
        "event_id": eid,
        "ts_order": df["ts"].to_numpy(),
        "role": pd.Series(_ROLES[(eid // 4) % 4]),
        "text": text.to_numpy(),
        "tool": etype.to_numpy(),
        "ts": df["ts"].to_numpy(),
    })
    return out


def _assign_turn_idx(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(["conv_id", "ts_order", "event_id"],
                        kind="mergesort", ignore_index=True)
    df["turn_idx"] = df.groupby("conv_id").cumcount().astype(np.int32)
    return df[TRANSCRIPT_COLUMNS]


def transcripts_from_events(events_path: str, n_buckets: int = 16):
    """events parquet -> transcript-shaped Dataset (deterministic, the
    SQL-mirrorable derivation documented above).  The turn_idx row-number
    needs per-user ordering, done with the same bucket-hash group pattern
    as the gap stage."""
    from abslog_ray.stages.gaps import add_bucket_fn

    # right-size input blocks: Ray's local read autotuning splits even a
    # few-MB single file into ~200 blocks, multiplying per-block overhead
    # through the turn_idx group shuffle (config.resolve_read_blocks)
    from abslog_ray.config import (
        PARQUET_DECODE_EXPANSION,
        resolve_read_blocks,
    )
    n_cpus = 8
    try:
        import ray as _ray
        if _ray.is_initialized():
            n_cpus = int(_ray.cluster_resources().get("CPU", 8))
    except Exception:
        pass
    if os.path.isfile(events_path):
        disk = os.path.getsize(events_path)
    elif os.path.isdir(events_path):
        disk = sum(os.path.getsize(f) for f in list_fragments(events_path))
    else:
        disk = 0
    kw = {}
    if disk > 0:
        # only override when the size is actually known — forcing
        # 2x-CPUs blocks on an unknown-size (e.g. remote) input could
        # mean multi-GB blocks; Ray's autotuner is the safer fallback
        kw["override_num_blocks"] = resolve_read_blocks(
            n_cpus, disk * PARQUET_DECODE_EXPANSION)

    ds = ray.data.read_parquet(
        events_path, columns=["event_id", "ts", "user_id", "event_type"],
        **kw)
    ds = ds.map_batches(_events_to_transcript_batch, batch_format="pandas")
    ds = ds.map_batches(add_bucket_fn("conv_id", n_buckets),
                        batch_format="pyarrow")
    from abslog_ray.stages.gaps import BUCKET_COL

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return _assign_turn_idx(df.drop(columns=[BUCKET_COL]))

    return ds.groupby(BUCKET_COL).map_groups(per_bucket, batch_format="pandas")


# --- multi-format fan-in (SURVEY.md §2 S2) ---------------------------------
# The reference tails plain-text log files; the graft's canonical fragment
# is Parquet, but real transcript dumps also arrive as JSONL / CSV / TSV.
# All formats normalize to the SAME canonical schema at the source so every
# downstream stage is format-agnostic.  Interchange contract: ``ts`` rides
# as epoch MICROSECONDS (int64) in the text formats (lossless vs the
# parquet timestamp[us]); turn_idx is int32.

_CANON_TYPES = {
    "conv_id": pa.string(),
    "turn_idx": pa.int32(),
    "role": pa.string(),
    "text": pa.string(),
    "tool": pa.string(),
    "ts": pa.timestamp("us"),
}


def _coerce_transcript_batch(batch: pa.Table) -> pa.Table:
    """Normalize a JSON/CSV-read batch to the canonical transcript schema
    (epoch-µs ints → timestamp[us], int64 → int32 turn_idx, null-typed
    all-null columns → typed nulls)."""
    cols = {}
    for name in TRANSCRIPT_COLUMNS:
        col = batch[name]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        want = _CANON_TYPES[name]
        if name == "ts" and not pa.types.is_timestamp(col.type):
            col = col.cast(pa.int64()).cast(want)
        elif col.type != want:
            col = col.cast(want)
        cols[name] = col
    return pa.table(cols)


def read_transcripts_jsonl(paths, compression: str | None = None,
                           **kwargs):
    """Newline-delimited JSON transcript fragments → canonical schema.
    ``compression='gzip'`` reads ``.jsonl.gz`` fragments (decompression
    streams inside each read task via Arrow's input stream — the
    driver never touches the bytes)."""
    if compression is not None:
        kwargs.setdefault("arrow_open_stream_args",
                          {"compression": compression})
    ds = ray.data.read_json(paths, **kwargs)
    return ds.map_batches(_coerce_transcript_batch, batch_format="pyarrow")


def read_transcripts_csv(paths, delimiter: str = ",", **kwargs):
    """CSV/TSV transcript fragments → canonical schema.  ``delimiter='\\t'``
    reads the TSV log-line form (one turn per line — the closest analogue
    of the reference's raw access-log input)."""
    from pyarrow import csv as pacsv
    parse_options = pacsv.ParseOptions(delimiter=delimiter)
    ds = ray.data.read_csv(paths, parse_options=parse_options, **kwargs)
    return ds.map_batches(_coerce_transcript_batch, batch_format="pyarrow")


_READERS = {"parquet": read_transcripts,
            "jsonl": read_transcripts_jsonl,
            "csv": read_transcripts_csv}


def read_transcripts_any(paths, format: str = "parquet", **kwargs):
    """Format-dispatching fan-in: one call site for parquet/jsonl/csv
    fragment mixes (pipelines.run uses parquet directly; this is the
    public multi-format entry)."""
    if format not in _READERS:
        raise ValueError(f"unknown transcript format {format!r}; "
                         f"one of {sorted(_READERS)}")
    if format == "parquet":
        return read_transcripts(paths, **kwargs)
    return _READERS[format](paths, **kwargs)


def read_transcripts_feather(paths, **kwargs):
    """Arrow IPC (feather v2) transcript fragments → canonical schema.
    Ray Data has no native IPC reader, so each fragment decodes INSIDE
    its read task (``read_binary_files`` ships one payload per task;
    ``pa.ipc.open_file`` is zero-copy over the buffer) — the driver
    never touches the bytes, matching the other fan-in readers."""
    ds = ray.data.read_binary_files(paths, **kwargs)

    def decode(batch: pa.Table) -> pa.Table:
        tables = []
        for payload in batch["bytes"].to_pylist():
            with pa.ipc.open_file(pa.BufferReader(payload)) as rd:
                tables.append(rd.read_all().select(TRANSCRIPT_COLUMNS))
        if not tables:
            return _coerce_transcript_batch(
                pa.table({c: pa.array([], _CANON_TYPES[c])
                          for c in TRANSCRIPT_COLUMNS}))
        return _coerce_transcript_batch(pa.concat_tables(tables))

    return ds.map_batches(decode, batch_format="pyarrow", batch_size=1)


def write_transcripts_jsonl(ds, path: str):
    """Export a transcript Dataset as newline-delimited JSON fragments
    (one file per block — the resumable-output layout; timestamps
    serialize as epoch-µs ints so ``read_transcripts_jsonl`` round-trips
    bit-exactly)."""

    def ts_to_int(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("ts")
        return t.set_column(i, "ts", pc.cast(t["ts"], pa.int64()))

    ds.map_batches(ts_to_int, batch_format="pyarrow").write_json(path)


def write_transcripts_csv(ds, path: str, delimiter: str = ","):
    """Export as CSV/TSV fragments (same epoch-µs ts convention).
    WriteOptions isn't picklable, so each write task constructs its own
    via ``arrow_csv_args_fn``."""

    def ts_to_int(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("ts")
        return t.set_column(i, "ts", pc.cast(t["ts"], pa.int64()))

    def csv_args():
        from pyarrow import csv as pacsv
        return {"write_options": pacsv.WriteOptions(delimiter=delimiter)}

    ds.map_batches(ts_to_int, batch_format="pyarrow").write_csv(
        path, arrow_csv_args_fn=csv_args)
