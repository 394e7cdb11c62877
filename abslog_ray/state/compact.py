"""Small-file compaction for partitioned parquet sinks.

A 100 TB routed sink accumulates many small files per partition leaf
(one per block per chunk); readers then pay per-file open/footer costs
that dwarf the scans.  ``compact_sink`` rewrites every leaf directory
that holds ≥ ``min_files`` fragments into ONE file.  The driver only
WALKS the directory tree — each leaf compacts inside its own Ray task.

Crash atomicity (ADVICE r04): a bare rename-then-unlink sequence has a
window where BOTH the compacted file and the original fragments are
visible — a crash there leaves duplicated rows that nothing detects.
Each leaf therefore commits through a marker protocol:

1. write data to ``_compact-<token>.tmp``  (``_``-prefixed: Arrow
   dataset discovery ignores it, so a crashed half-write is invisible)
2. verify row count against the merged table
3. write ``_compact-<token>.commit`` listing the fragment names and the
   final file name (itself written via tmp+rename, so it is either
   absent or complete)
4. rename tmp → ``compact-<token>.parquet``  — the COMMIT POINT
5. unlink the fragments, then the marker

Recovery runs at the start of every ``compact_sink`` (and via
``recover_sink`` from resume paths): for each surviving marker, if the
final file exists the commit happened — finish it by unlinking any
listed fragments that remain, else the commit never happened — unlink
the marker (and tmp) and the fragments stay authoritative.  A crash at
ANY point therefore converges to exactly-once data on the next run.
The marker does not serialize *concurrent* readers against an in-flight
compaction — run compaction between pipeline chunks (as ``run_pipeline``
does), not against a leaf being scanned.
"""

from __future__ import annotations

import json
import os
import uuid

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

_MARK_PREFIX = "_compact-"
_MARK_SUFFIX = ".commit"


def _recover_leaf(dirpath: str, filenames: list) -> None:
    """Converge a leaf that crashed mid-commit (idempotent)."""
    for f in filenames:
        if not (f.startswith(_MARK_PREFIX) and f.endswith(_MARK_SUFFIX)):
            continue
        mark_path = os.path.join(dirpath, f)
        try:
            with open(mark_path) as fh:
                mark = json.load(fh)
        except (OSError, json.JSONDecodeError):
            # marker itself half-written pre-rename: impossible by
            # construction (tmp+rename), but never let it wedge recovery
            os.unlink(mark_path)
            continue
        final = os.path.join(dirpath, mark["final"])
        if os.path.exists(final):
            # commit happened: finish the fragment unlinks
            for frag in mark["fragments"]:
                p = os.path.join(dirpath, frag)
                if os.path.exists(p):
                    os.unlink(p)
        else:
            # commit never happened: fragments stay authoritative
            tmp = os.path.join(dirpath, mark["tmp"])
            if os.path.exists(tmp):
                os.unlink(tmp)
        os.unlink(mark_path)


def recover_sink(root: str) -> None:
    """Walk ``root`` and converge any leaf with a surviving commit
    marker.  Cheap (marker files only); safe to call before any read of
    a sink that may have crashed mid-compaction."""
    for dirpath, _dirnames, filenames in os.walk(root):
        _recover_leaf(dirpath, filenames)


def _leaf_dirs(root: str, min_files: int):
    out = []
    for dirpath, _dirnames, filenames in os.walk(root):
        _recover_leaf(dirpath, filenames)
        frags = sorted(f for f in os.listdir(dirpath)
                       if f.endswith(".parquet") and not f.startswith("_"))
        if len(frags) >= min_files:
            out.append((dirpath, frags))
    return out


def _compact_leaf(dirpath: str, frags: list) -> dict:
    tables = [pq.read_table(os.path.join(dirpath, f)) for f in frags]
    merged = pa.concat_tables(tables, promote_options="default")
    token = uuid.uuid4().hex
    tmp_name = f"{_MARK_PREFIX}{token}.tmp"
    final_name = f"compact-{token}.parquet"
    tmp = os.path.join(dirpath, tmp_name)
    final = os.path.join(dirpath, final_name)
    pq.write_table(merged, tmp)
    if pq.read_metadata(tmp).num_rows != merged.num_rows:
        os.unlink(tmp)
        raise RuntimeError(f"compaction row-count mismatch in {dirpath}")
    # commit marker (tmp+rename so it is absent-or-complete) BEFORE the
    # final rename: from here a crash is repaired by _recover_leaf
    mark_name = f"{_MARK_PREFIX}{token}{_MARK_SUFFIX}"
    mark_tmp = os.path.join(dirpath, mark_name + ".partial")
    with open(mark_tmp, "w") as fh:
        json.dump({"final": final_name, "tmp": tmp_name,
                   "fragments": list(frags)}, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.rename(mark_tmp, os.path.join(dirpath, mark_name))
    os.rename(tmp, final)                       # commit point
    for f in frags:
        os.unlink(os.path.join(dirpath, f))
    os.unlink(os.path.join(dirpath, mark_name))
    return {"dir": dirpath, "files_before": len(frags),
            "rows": merged.num_rows}


def compact_sink(root: str, min_files: int = 2,
                 concurrency: int | None = None) -> pd.DataFrame:
    """Compact every leaf under ``root`` with ≥ ``min_files`` parquet
    fragments.  Returns per-leaf stats (dir, files_before, rows); empty
    frame when nothing qualifies.  Recovers crashed commits first."""
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
