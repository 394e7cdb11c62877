"""Stateful enrich stage — an actor-pool ``map_batches`` class
(SURVEY.md §2 T1/T2/J1; reference: abs-log's config-loaded ``abs_special``
rules and per-site lookup dicts consulted per record).

``Enricher`` is passed as a CLASS to
``ds.map_batches(Enricher, concurrency=(min,max), batch_size=B,
batch_format="pyarrow", fn_constructor_args=...)``:

- ``__init__`` runs ONCE per actor: resolves the broadcast lookup tables
  (plain dicts, or ``ray.ObjectRef`` put once by the driver — the
  broadcast-small-side join pattern; no shuffle) and pre-builds Arrow
  value/cat arrays for vectorized dictionary lookups.
- ``__call__`` runs per batch: pure pyarrow.compute — path/args abstraction,
  pattern composition, and two left-lookup joins (tool→tool_cat,
  role→sink) via ``pc.index_in`` + ``pc.take`` (missing keys → null,
  matching left-join semantics).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from abslog_ray.functions.abstract import (
    abstract_args,
    abstract_path,
    make_pattern,
)


def _resolve(ref_or_obj):
    try:
        import ray
        if isinstance(ref_or_obj, ray.ObjectRef):
            return ray.get(ref_or_obj)
    except ImportError:
        pass
    return ref_or_obj


class _Lookup:
    """Vectorized small-dict left lookup: key column -> value column."""

    def __init__(self, mapping: dict):
        self.keys = pa.array(list(mapping.keys()), pa.string())
        self.vals = pa.array(list(mapping.values()), pa.string())

    def __call__(self, col) -> pa.Array:
        idx = pc.index_in(col, value_set=self.keys)
        return pc.take(self.vals, idx)


class Enricher:
    def __init__(self, abstraction_rules, args_rule,
                 tool_lookup, role_lookup):
        # once per actor: resolve broadcasts, build lookup arrays
        self.rules = abstraction_rules
        self.args_rule = args_rule
        self.tool_cat = _Lookup(_resolve(tool_lookup))
        self.role_sink = _Lookup(_resolve(role_lookup))

    def __call__(self, batch: pa.Table) -> pa.Table:
        path_abs = abstract_path(batch["path"], self.rules)
        pattern = make_pattern(batch["tool"], path_abs)
        args_abs = abstract_args(batch["args"], self.args_rule)
        tool_cat = self.tool_cat(batch["tool"])
        sink = self.role_sink(batch["role"])
        return (
            batch
            .append_column("pattern", pattern)
            .append_column("args_abs", args_abs)
            .append_column("tool_cat", tool_cat)
            .append_column("sink", sink)
        )
