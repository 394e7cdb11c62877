"""Checkpoint manifest — per-chunk lineage + metrics for resumable runs
(SURVEY.md §2 S4/§4.2; reference: abs-log's per-logfile byte-offset file,
which lets the cron rerun resume where it left off).

The graft's unit of incremental progress is a CHUNK of input Parquet
fragments (``cfg.chunk_files`` files).  Each chunk runs the full streaming
pipeline and lands its sink partitions under ``.../chunk=<id>/``; the
manifest records the chunk's input files, row counts per sink, and wall
time, and is committed atomically (tmp + rename) AFTER the chunk's sinks are
durable.  On restart, completed chunks are skipped and their partitions
trusted; a partially-written chunk's directories are removed and redone —
idempotent because chunk output dirs are disjoint.

Single-writer (the driver) here; on a multi-driver deployment this becomes a
named Ray actor serializing appends — same file format.
"""

from __future__ import annotations

import json
import os
import tempfile
import time


class Manifest:
    def __init__(self, path: str):
        self.path = path
        self.chunks: dict = {}
        if os.path.exists(path):
            with open(path) as f:
                self.chunks = json.load(f).get("chunks", {})

    @classmethod
    def at(cls, checkpoint_dir: str) -> "Manifest":
        os.makedirs(checkpoint_dir, exist_ok=True)
        return cls(os.path.join(checkpoint_dir, "manifest.json"))

    def done(self, chunk_id: str) -> bool:
        return self.chunks.get(chunk_id, {}).get("status") == "done"

    def commit(self, chunk_id: str, files: list, metrics: dict) -> None:
        self.chunks[chunk_id] = {
            "status": "done",
            "files": list(files),
            "committed_at": time.time(),
            **metrics,
        }
        self._flush()

    def _flush(self) -> None:
        d = os.path.dirname(self.path)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump({"chunks": self.chunks}, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)

    def metrics(self) -> dict:
        return {cid: {k: v for k, v in c.items() if k != "files"}
                for cid, c in self.chunks.items()}
