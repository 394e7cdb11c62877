"""Distributed graph operators on Dataset primitives (training-data
pipeline extension: near-dup PAIRS become dedup CLUSTERS via connected
components — the step between pair mining and keep-one-per-cluster).

``connected_components`` is classic BSP min-label propagation expressed
purely as Ray Data joins + aggregates: every node starts labeled with its
own id; each round every node takes the min of its label and its
neighbors' labels; convergence in O(component diameter) rounds.  Dedup
graphs are shallow (near-dup clusters are cliques-ish), so a handful of
rounds suffice; for adversarial long-chain graphs use pointer-doubling —
deliberately not implemented here, the diameter assumption is documented.

Scale shape per round: one ``bucket_join`` of the symmetrized edge list
against the current labels (keyed shuffle on the edge source), one
two-phase ``hash_aggregate`` min per node, and a scalar convergence probe
(sum of labels, monotone non-increasing ints) — no driver-side node or
edge materialization at any point.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def connected_components(edges, nodes, src: str = "a", dst: str = "b",
                         id_col: str = "id", max_rounds: int = 50,
                         n_buckets: int = 16):
    """(id, comp) for every node in ``nodes``: comp = min node id in the
    node's connected component under undirected ``edges``.

    ``edges``: Dataset with columns (src, dst); ``nodes``: Dataset with
    ``id_col`` (isolated nodes keep comp = their own id).  Raises if the
    propagation hasn't converged after ``max_rounds`` (diameter larger
    than expected — see module docstring)."""
    from abslog_ray.stages.aggregate import hash_aggregate
    from abslog_ray.stages.join import bucket_join

    def sym(t: pa.Table) -> pa.Table:
        a = t[src].to_numpy(zero_copy_only=False)
        b = t[dst].to_numpy(zero_copy_only=False)
        return pa.table({
            "u": pa.array(np.concatenate([a, b]).astype(np.int64)),
            "v": pa.array(np.concatenate([b, a]).astype(np.int64)),
        })

    sym_edges = edges.map_batches(sym, batch_format="pyarrow").materialize()

    def init_labels(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"id": pa.array(ids), "comp": pa.array(ids)})

    labels = nodes.map_batches(init_labels,
                               batch_format="pyarrow").materialize()
    prev_sum = int(labels.sum("comp") or 0)

    for _round in range(max_rounds):
        # neighbor candidates: edge (u, v) proposes label[u] to node v
        msgs = bucket_join(
            sym_edges, labels.map_batches(
                lambda t: pa.table({"u": t["id"], "cand": t["comp"]}),
                batch_format="pyarrow"),
            on="u", how="inner", n_buckets=n_buckets)
        # cast back to int64: bucket_join's pandas null-padding can
        # upcast the carried columns (object/float), and a 42 vs 42.0
        # key split would silently duplicate node rows in the aggregate
        msgs = msgs.map_batches(
            lambda t: pa.table({
                "id": pa.compute.cast(t["v"], pa.int64()),
                "comp": pa.compute.cast(t["cand"], pa.int64())}),
            batch_format="pyarrow")
        # repartition pins the label block count per round: union adds
        # blocks and the shuffle preserves them, so without this the
        # block count (and with it per-round scheduling cost) DOUBLES
        # every round — measured 1 s → 138 s by round 8 on 300 nodes
        labels = hash_aggregate(labels.union(msgs), ["id"],
                                {"comp": ("comp", "min")},
                                n_buckets=n_buckets).repartition(
            n_buckets).materialize()
        cur_sum = int(labels.sum("comp") or 0)
        if cur_sum == prev_sum:        # labels are monotone non-increasing
            return labels
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components: no convergence in {max_rounds} rounds — "
        f"component diameter exceeds the dedup-graph assumption; use "
        f"pointer doubling for long-chain graphs")
