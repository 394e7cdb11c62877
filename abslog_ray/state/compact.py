"""Small-file compaction for partitioned parquet sinks.

A 100 TB routed sink accumulates many small files per partition leaf
(one per block per chunk); readers then pay per-file open/footer costs
that dwarf the scans.  ``compact_sink`` rewrites every leaf directory
that holds ≥ ``min_files`` fragments into ONE file.  The driver only
WALKS the directory tree — each leaf compacts inside its own Ray task
(read fragments → write ``_compact-*.parquet.tmp`` → verify row count →
atomic rename → unlink fragments), so failure at any point leaves
either the old fragments or the old fragments plus a tmp file, never a
half-visible state.  Manifest resume is unaffected: chunk entries point
at partition DIRECTORIES, not file lists."""

from __future__ import annotations

import os
import uuid

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data


def _leaf_dirs(root: str, min_files: int):
    out = []
    for dirpath, _dirnames, filenames in os.walk(root):
        frags = sorted(f for f in filenames if f.endswith(".parquet"))
        if len(frags) >= min_files:
            out.append((dirpath, frags))
    return out


def _compact_leaf(dirpath: str, frags: list) -> dict:
    tables = [pq.read_table(os.path.join(dirpath, f)) for f in frags]
    merged = pa.concat_tables(tables, promote_options="default")
    # tmp is "_"-prefixed: Arrow dataset discovery IGNORES such
    # files, so a crashed half-written tmp is invisible to readers;
    # the FINAL name must not be, or the data disappears from scans
    token = uuid.uuid4().hex
    tmp = os.path.join(dirpath, f"_compact-{token}.tmp")
    final = os.path.join(dirpath, f"compact-{token}.parquet")
    pq.write_table(merged, tmp)
    if pq.read_metadata(tmp).num_rows != merged.num_rows:
        os.unlink(tmp)
        raise RuntimeError(f"compaction row-count mismatch in {dirpath}")
    os.rename(tmp, final)
    for f in frags:
        os.unlink(os.path.join(dirpath, f))
    return {"dir": dirpath, "files_before": len(frags),
            "rows": merged.num_rows}


def compact_sink(root: str, min_files: int = 2,
                 concurrency: int | None = None) -> pd.DataFrame:
    """Compact every leaf under ``root`` with ≥ ``min_files`` parquet
    fragments.  Returns per-leaf stats (dir, files_before, rows); empty
    frame when nothing qualifies."""
    leafs = _leaf_dirs(root, min_files)
    if not leafs:
        return pd.DataFrame({"dir": pd.Series([], dtype=str),
                             "files_before": pd.Series([], dtype="int64"),
                             "rows": pd.Series([], dtype="int64")})

    def run(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame([_compact_leaf(d, list(fr))
                             for d, fr in zip(batch["dir"],
                                              batch["frags"])])

    items = ray.data.from_items(
        [{"dir": d, "frags": fr} for d, fr in leafs])
    if concurrency:
        items = items.repartition(concurrency)
    return (items.map_batches(run, batch_format="pandas", batch_size=1)
            .to_pandas())
