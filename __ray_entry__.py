"""Driver contract for the abslog_ray engine.

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in the library) calls ``ray.init`` / ``ray.shutdown``.

- ``entry()``: flagship transcript pipeline (parse → enrich → gap shuffle →
  two-phase per-minute pattern summary) over a deterministic transcript
  derivation of ``/root/testdata/sf0.001/events.parquet``.
- ``queries()``: one callable per implemented operator from SURVEY.md §2
  plus the training-data extensions (dedup / similarity / text analysis).
- ``oracle_sql()``: DuckDB mirrors.  The transcript family is checkable at
  value level because the transcript derivation itself is SQL-expressible
  (see abslog_ray.sources.transcripts).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001 (driver smoke check)."""
    from abslog_ray.pipelines.queries import q_flagship_summary
    return q_flagship_summary("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from abslog_ray.pipelines.queries import QUERIES
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from abslog_ray.pipelines.queries import QUERIES
    return {name: sql for name, (_fn, sql) in QUERIES.items()
            if sql is not None}
