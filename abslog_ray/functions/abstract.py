"""Pattern abstraction kernels (SURVEY.md §2 M4/M5).

Reference semantics (abs-log ``common.py text_abstract()``): per path
segment, an all-digit segment — or a long hex-ish id — collapses to ``*`` so
similar requests group under one pattern; query-arg values collapse to ``?``
keeping keys in appearance order.  The graft composes the final grouping key
as ``pattern = tool + ":" + path_abs`` (BASELINE.json north_star: "uri/args
abstraction becomes tool+role pattern abstraction").

Implementation: pure pyarrow.compute RE2 kernels, zero Python per row.  RE2
has no lookahead, and non-overlapping matches consume the trailing ``/`` —
adjacent variable segments (``/1/2/3``) need a second pass to reach the
fixpoint; configured via the rule's ``n_passes``.  The per-segment-split
oracle (abslog_ray.oracle.abstract_path_one) is the semantic ground truth;
tests assert equality.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def abstract_path(path, rules) -> pa.Array:
    """Apply ordered (regex, replacement, n_passes) rules to a path column."""
    out = path
    for pattern, replacement, passes in rules:
        for _ in range(passes):
            out = pc.replace_substring_regex(out, pattern, replacement)
    return out


def abstract_args(args, rule) -> pa.Array:
    pattern, replacement = rule
    return pc.replace_substring_regex(args, pattern, replacement)


def make_pattern(tool, path_abs) -> pa.Array:
    """pattern = tool ':' path_abs; null if path_abs is null (unparsed)."""
    return pc.binary_join_element_wise(tool, path_abs, ":",
                                       null_handling="emit_null")
