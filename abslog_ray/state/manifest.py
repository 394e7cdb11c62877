"""Checkpoint manifest — per-chunk lineage + metrics for resumable runs
(SURVEY.md §2 S4/T3/§4.2; reference: abs-log's per-logfile byte-offset file,
which lets the cron rerun resume where it left off).

The graft's unit of incremental progress is a CHUNK of input Parquet
fragments (``cfg.chunk_files`` files).  Each chunk runs the full streaming
pipeline and lands its sink partitions under ``.../chunk=<id>/``; the
manifest records the chunk's input files, row counts per sink, and wall
time, and is committed atomically (tmp + rename) AFTER the chunk's sinks are
durable.  On restart, completed chunks are skipped and their partitions
trusted; a partially-written chunk's directories are removed and redone —
idempotent because chunk output dirs are disjoint.

Skip is by chunk id AND file identity: ``done(chunk_id, files=...)`` is
False when the recorded file list differs from the caller's, so positional
re-chunking after an incremental append (new fragments landing inside an
already-committed chunk's slice) forces that chunk to be redone instead of
silently dropping the appended files.

Two writers behind the same API:

- ``Manifest``: plain single-process writer (the driver owns the file).
- ``ActorManifest``: the multi-driver scale shape (T3) — every read/write
  serializes through ONE named Ray actor per manifest path, so concurrent
  jobs sharing a checkpoint cannot interleave file writes.  The actor
  re-reads the file per call (the file stays the source of truth, so
  external edits — e.g. an operator pruning a chunk entry to force a redo
  — are honored).
"""

from __future__ import annotations

import hashlib
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

    def done(self, chunk_id: str, files: list | None = None) -> bool:
        return self.phase(chunk_id, files) == "done"

    def phase(self, chunk_id: str, files: list | None = None):
        """The chunk's recorded phase ("routed" mid-pipeline checkpoint or
        "done"), or None — also None when the recorded input file list
        differs from the caller's (identity check, see module doc)."""
        c = self.chunks.get(chunk_id, {})
        if files is not None and c.get("files") != list(files):
            return None
        return c.get("status")

    def mark(self, chunk_id: str, phase: str, files: list,
             metrics: dict) -> None:
        """Record a mid-pipeline phase checkpoint (e.g. "routed": the
        expensive parse+enrich+route pass is durable; a crashed run
        resumes at the aggregate phase instead of re-parsing)."""
        self.chunks[chunk_id] = {
            "status": phase,
            "files": list(files),
            "committed_at": time.time(),
            **metrics,
        }
        self._flush()

    def commit(self, chunk_id: str, files: list, metrics: dict) -> None:
        self.mark(chunk_id, "done", files, metrics)

    def _flush(self) -> None:
        d = os.path.dirname(self.path)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump({"chunks": self.chunks}, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)

    def metrics(self) -> dict:
        return {cid: {k: v for k, v in c.items() if k != "files"}
                for cid, c in self.chunks.items()}


class _ManifestHolder:
    """Runs inside the named actor; reloads the file per call so the file
    remains the source of truth (the actor only serializes access)."""

    def __init__(self, path: str):
        self.path = path

    def done(self, chunk_id: str, files: list | None = None) -> bool:
        return Manifest(self.path).done(chunk_id, files)

    def phase(self, chunk_id: str, files: list | None = None):
        return Manifest(self.path).phase(chunk_id, files)

    def mark(self, chunk_id: str, phase: str, files: list,
             metrics: dict) -> None:
        Manifest(self.path).mark(chunk_id, phase, files, metrics)

    def commit(self, chunk_id: str, files: list, metrics: dict) -> None:
        Manifest(self.path).commit(chunk_id, files, metrics)

    def metrics(self) -> dict:
        return Manifest(self.path).metrics()


class ActorManifest:
    """Same API as Manifest, serialized through a named Ray actor (one per
    manifest path, ``get_if_exists`` so every driver lands on the same
    instance).

    Cross-DRIVER serialization (ADVICE r02 medium) needs two options beyond
    the name: an explicit shared ``namespace`` (named actors are
    namespace-scoped, and each driver job gets its own anonymous namespace
    by default — without this, two drivers would each create a private
    actor and race on manifest.json), and ``lifetime="detached"`` (a
    non-detached actor dies with the job that happened to create it,
    yanking serialization away from a still-running second driver).

    Cleanup: one detached actor lives per distinct manifest path until the
    CLUSTER goes down (``ray.shutdown()`` of the head) or ``terminate()``
    is called; it holds no state beyond the path string (the file is the
    source of truth), so the steady-state cost is one idle worker slot per
    active checkpoint directory."""

    NAMESPACE = "abslog-manifest"

    def __init__(self, path: str):
        import ray
        self.path = path
        name = "abslog-manifest-" + hashlib.md5(
            os.path.abspath(path).encode()).hexdigest()[:12]
        self._actor = (ray.remote(_ManifestHolder)
                       .options(name=name, namespace=self.NAMESPACE,
                                lifetime="detached", get_if_exists=True)
                       .remote(path))

    def terminate(self) -> None:
        """Kill the shared actor (call only when no other driver is using
        this checkpoint path — e.g. tearing down a finished deployment)."""
        import ray
        ray.kill(self._actor, no_restart=True)

    @classmethod
    def at(cls, checkpoint_dir: str) -> "ActorManifest":
        os.makedirs(checkpoint_dir, exist_ok=True)
        return cls(os.path.join(checkpoint_dir, "manifest.json"))

    def done(self, chunk_id: str, files: list | None = None) -> bool:
        import ray
        return ray.get(self._actor.done.remote(chunk_id, files))

    def phase(self, chunk_id: str, files: list | None = None):
        import ray
        return ray.get(self._actor.phase.remote(chunk_id, files))

    def mark(self, chunk_id: str, phase: str, files: list,
             metrics: dict) -> None:
        import ray
        ray.get(self._actor.mark.remote(chunk_id, phase, files, metrics))

    def commit(self, chunk_id: str, files: list, metrics: dict) -> None:
        import ray
        ray.get(self._actor.commit.remote(chunk_id, files, metrics))

    def metrics(self) -> dict:
        import ray
        return ray.get(self._actor.metrics.remote())
