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
        f"connected_components_star for long-chain graphs")


def _canon_dedup(eds, n_buckets: int):
    """Canonicalize to (lo, hi) with lo < hi, drop self-loops, distinct."""
    from abslog_ray.stages.aggregate import hash_aggregate

    def fn(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        keep = lo != hi
        return pa.table({"a": pa.array(lo[keep]), "b": pa.array(hi[keep])})

    return hash_aggregate(
        eds.map_batches(fn, batch_format="pyarrow"), ["a", "b"],
        {"n": ("*", "count")}, n_buckets=n_buckets).drop_columns(["n"])


def _edge_checksum(eds) -> tuple:
    """(count, order-independent 64-bit checksum) of an edge Dataset —
    the convergence probe for the star rounds (two scalar aggregates,
    nothing driver-side)."""

    def fn(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (a * np.uint64(0x9E3779B97F4A7C15)) ^ \
            (b * np.uint64(0xC2B2AE3D27D4EB4F))
        s = int(h.sum(dtype=np.uint64))
        return pa.table({"c": pa.array([t.num_rows], pa.int64()),
                         "s": pa.array([s % (1 << 62)], pa.int64())})

    parts = eds.map_batches(fn, batch_format="pyarrow")
    return int(parts.sum("c") or 0), int(parts.sum("s") or 0)


def connected_components_star(edges, nodes, src: str = "a", dst: str = "b",
                              id_col: str = "id", max_rounds: int = 60,
                              n_buckets: int = 16):
    """Diameter-INDEPENDENT connected components: alternating
    large-star / small-star rounds (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14 — public algorithm),
    converging in O(log² n) rounds regardless of chain length — the
    scale path for graphs that break ``connected_components``'s shallow-
    diameter assumption.

    Each round is one keyed shuffle: symmetrized edges group on their
    center node (bucket hash), the vectorized kernel links every
    neighbor to the neighborhood minimum (large-star relinks only
    larger neighbors, small-star the rest plus the center), and the
    edge list re-canonicalizes through the two-phase aggregate.  At the
    fixpoint every component is a star around its min node; labels fall
    out of one final min-neighbor aggregate.  Convergence is detected by
    an order-independent edge-set checksum (edge sets can oscillate in
    COUNT before settling, so both count and checksum must repeat)."""
    from abslog_ray.stages.aggregate import (
        KEY_BUCKET,
        add_key_bucket_fn,
        hash_aggregate,
    )

    def to_ab(t: pa.Table) -> pa.Table:
        return pa.table({
            "a": pa.compute.cast(t[src], pa.int64()),
            "b": pa.compute.cast(t[dst], pa.int64()),
        })

    eds = _canon_dedup(edges.map_batches(to_ab, batch_format="pyarrow"),
                       n_buckets).repartition(n_buckets).materialize()

    def sym(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        return pa.table({
            "u": pa.array(np.concatenate([a, b]).astype(np.int64)),
            "v": pa.array(np.concatenate([b, a]).astype(np.int64)),
        })

    def star_kernel(df: pd.DataFrame, large: bool) -> pd.DataFrame:
        u = df["u"].to_numpy().astype(np.int64)
        v = df["v"].to_numpy().astype(np.int64)
        codes, uniq = pd.factorize(pd.Series(u), sort=False)
        G = len(uniq)
        uniq = uniq.to_numpy().astype(np.int64)
        m = np.full(G, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(m, codes, v)
        m = np.minimum(m, uniq)                  # min(Γ(u) ∪ {u})
        mrow = m[codes]
        urow = uniq[codes]
        if large:
            mask = v > urow                      # relink larger neighbors
            out_a, out_b = v[mask], mrow[mask]
        else:
            mask = v < urow                      # smaller neighbors + center
            out_a = np.concatenate([v[mask], uniq])
            out_b = np.concatenate([mrow[mask], m])
        return pd.DataFrame({"a": out_a.astype(np.int64),
                             "b": out_b.astype(np.int64)})

    def star_round(eds, large: bool):
        s = eds.map_batches(sym, batch_format="pyarrow")
        s = s.map_batches(add_key_bucket_fn(n_buckets, keys=["u"]),
                          batch_format="pyarrow")
        linked = s.groupby(KEY_BUCKET).map_groups(
            lambda df: star_kernel(df.drop(columns=[KEY_BUCKET]), large),
            batch_format="pandas")
        return _canon_dedup(linked, n_buckets).repartition(
            n_buckets).materialize()

    prev = _edge_checksum(eds)
    for _round in range(max_rounds):
        eds = star_round(eds, large=True)
        eds = star_round(eds, large=False)
        cur = _edge_checksum(eds)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components_star: no convergence in {max_rounds} "
            f"large/small-star round pairs")

    # stars: every node's label = min(itself, its neighbors)
    def init_labels(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"id": pa.array(ids), "comp": pa.array(ids)})

    def as_labels(t: pa.Table) -> pa.Table:
        return pa.table({"id": t["u"], "comp": t["v"]})

    selfs = nodes.map_batches(init_labels, batch_format="pyarrow")
    neigh = eds.map_batches(sym, batch_format="pyarrow").map_batches(
        as_labels, batch_format="pyarrow")
    return hash_aggregate(selfs.union(neigh), ["id"],
                          {"comp": ("comp", "min")}, n_buckets=n_buckets)


PR_SCALE = 1_000_000_000           # fixed-point denominator (1e-9 grid)


def pagerank(edges, nodes, src: str = "a", dst: str = "b",
             id_col: str = "id", iters: int = 5, n_buckets: int = 16):
    """Fixed-iteration PageRank over the undirected (symmetrized) edge
    graph with EXACT fixed-point integer semantics — every quantity is
    an int64 multiple of 1/PR_SCALE, so the distributed sums are
    associative (no float-order drift) and a SQL oracle can mirror the
    recurrence bit-for-bit:

        pr_0(v)   = PR_SCALE // N
        send(u→v) = pr_k(u) // deg(u)            (u's mass split evenly)
        pr_{k+1}(v) = (3*PR_SCALE)//(20*N) + (17 * Σ_in send) // 20

    i.e. damping 0.85 = 17/20 and teleport 0.15 = 3/20 as integer
    ratios with floor division (all quantities positive, so numpy
    ``//`` == DuckDB ``//``).  Dangling mass (floor remainders and
    degree-0 nodes) is dropped, not redistributed — the spec both sides
    compute.  Returns (id, pr) with pr the scaled int64.

    Scale shape per iteration: ONE keyed shuffle — the degree-annotated
    edge list (built once, materialized) joins the current pr vector on
    the edge source, and the incoming mass reduces through the
    two-phase hash_aggregate; zero-inflow nodes rejoin via a union of
    explicit zeros (no driver-side node pull at any point; the only
    driver scalar is N)."""
    from abslog_ray.stages.aggregate import hash_aggregate
    from abslog_ray.stages.join import bucket_join

    def to_ab(t: pa.Table) -> pa.Table:
        return pa.table({
            "a": pa.compute.cast(t[src], pa.int64()),
            "b": pa.compute.cast(t[dst], pa.int64()),
        })

    eds = _canon_dedup(edges.map_batches(to_ab, batch_format="pyarrow"),
                       n_buckets)

    def sym(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        return pa.table({
            "u": pa.array(np.concatenate([a, b]).astype(np.int64)),
            "v": pa.array(np.concatenate([b, a]).astype(np.int64)),
        })

    sym_eds = eds.map_batches(sym, batch_format="pyarrow").repartition(
        n_buckets).materialize()
    deg = hash_aggregate(sym_eds, ["u"], {"degree": ("*", "count")},
                         n_buckets=n_buckets)
    # degree-annotated edges: built ONCE, reused every iteration
    sym_deg = bucket_join(sym_eds, deg, on="u", how="inner",
                          n_buckets=n_buckets).repartition(
        n_buckets).materialize()

    n_nodes = int(nodes.count())
    base = (3 * PR_SCALE) // (20 * n_nodes)
    pr0 = PR_SCALE // n_nodes

    def init_pr(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"id": pa.array(ids),
                         "pr": pa.array(np.full(len(ids), pr0, np.int64))})

    def zeros(t: pa.Table) -> pa.Table:
        return pa.table({"id": t["id"],
                         "inc": pa.array(np.zeros(t.num_rows, np.int64))})

    pr = nodes.map_batches(init_pr, batch_format="pyarrow").repartition(
        n_buckets).materialize()

    for _it in range(iters):
        msgs = bucket_join(
            sym_deg,
            pr.map_batches(lambda t: pa.table({"u": t["id"],
                                               "pr_u": t["pr"]}),
                           batch_format="pyarrow"),
            on="u", how="inner", n_buckets=n_buckets)

        def send(t: pa.Table) -> pa.Table:
            p = t["pr_u"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = t["degree"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"id": pa.compute.cast(t["v"], pa.int64()),
                             "inc": pa.array(p // d)})

        inc = hash_aggregate(
            msgs.map_batches(send, batch_format="pyarrow").union(
                pr.map_batches(zeros, batch_format="pyarrow")),
            ["id"], {"inc": ("inc", "sum")}, n_buckets=n_buckets)

        def step(t: pa.Table) -> pa.Table:
            s = t["inc"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"id": pa.compute.cast(t["id"], pa.int64()),
                             "pr": pa.array(base + (17 * s) // 20)})

        pr = inc.map_batches(step, batch_format="pyarrow").repartition(
            n_buckets).materialize()

    return pr
