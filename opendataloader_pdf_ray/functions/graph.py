"""Distributed connected components over a pair/edge Dataset.

The dedup endgame: near-dup PAIRS (minhash_lsh_pairs / simhash_pairs output)
are only half the operator a 100-TB pipeline needs — duplicates form
transitive CLUSTERS (A~B, B~C ⇒ {A,B,C}), and the corpus keeps one
representative per cluster. This module turns a pair Dataset into a
(node, cluster_id) labeling with cluster_id = min node id in the component.

Scale shape (no driver materialization of nodes or edges):

- edges are materialized ONCE (both directions) and re-streamed per round;
- each round is the repo's bucketed co-partition pattern (union edge rows
  with label rows, groupby node-hash bucket, per-bucket vectorized lookup)
  followed by a ``groupby(node).min(label)`` — two shuffles per round;
- **pointer jumping**: each round also propagates along the *label* edges
  (node ← label(label(node))), so convergence is O(log diameter) rounds,
  not O(diameter) — the standard Hash-to-Min / two-phase CC trick
  (Rastogi et al., "Finding Connected Components in Map-Reduce");
- convergence detection is a scalar ``sum(label)`` aggregate: labels are
  non-increasing per node, so the sum strictly decreases until fixed point —
  an O(1)-byte driver check per round.

Determinism: min-label is order-independent; bucket hashing is modular on
the node id. Labels are exact (no approximation), so the result is
SQL-oracle-comparable against a recursive-CTE closure over the same edges.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Min

from ..pipelines.common import n_buckets as _n_buckets


def _edge_table(t: pa.Table, id_a: str, id_b: str) -> pa.Table:
    a = t[id_a].to_numpy(zero_copy_only=False).astype(np.int64)
    b = t[id_b].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table({"u": pa.array(np.concatenate([a, b]), pa.int64()),
                     "v": pa.array(np.concatenate([b, a]), pa.int64())})


def connected_components(pairs: "ray.data.Dataset", id_a: str = "id_a",
                         id_b: str = "id_b", num_buckets: int = 0,
                         max_rounds: int = 32) -> "ray.data.Dataset":
    """Label every node of the pair graph with the min node id reachable
    from it. Returns a Dataset with columns (node:int64, cluster_id:int64).

    ``max_rounds`` is a safety valve only — pointer jumping converges in
    O(log diameter) rounds (a 2^32-node path would need ~32)."""
    edges = pairs.map_batches(
        lambda t: _edge_table(t, id_a, id_b), batch_format="pyarrow",
    ).materialize()
    n_edges = edges.count()
    # bucket count scales with DATA (one task per ~2k edge rows), capped by
    # the cluster-scaled ceiling — a fixed O(cores) bucket count would spawn
    # hundreds of near-empty group tasks per round on small pair sets while
    # still being the right ceiling for 100-TB edge lists
    buckets = num_buckets or max(8, min(_n_buckets(), n_edges // 2000))
    edges = edges.repartition(max(2, buckets // 4)).materialize()

    # init: label(v) = min(v, min neighbor) — one groupby, folds round 1 in
    labels = (
        edges.map_batches(
            lambda t: pa.table({
                "node": t["u"],
                "label": pa.array(
                    np.minimum(t["u"].to_numpy(zero_copy_only=False),
                               t["v"].to_numpy(zero_copy_only=False)),
                    pa.int64())}),
            batch_format="pyarrow")
        .groupby("node").aggregate(Min("label", alias_name="label"))
        .materialize()
    )

    def edge_rows(t: pa.Table) -> pa.Table:
        """Edge halves keyed by source node: (key=u, dst=v, label=-1)."""
        u = t["u"].to_numpy(zero_copy_only=False)
        return pa.table({
            "key": t["u"],
            "dst": t["v"],
            "label": pa.array(np.full(len(u), -1), pa.int64()),
            "bucket": pa.array((u % buckets).astype(np.int32)),
        })

    def label_rows(t: pa.Table) -> pa.Table:
        """Current labels keyed by node (dst=-1 marks them as lookup rows)
        PLUS pointer-jump edges keyed by the label itself (label(u) → u):
        in the bucket pass u receives label(label(u))."""
        node = t["node"].to_numpy(zero_copy_only=False)
        lab = t["label"].to_numpy(zero_copy_only=False)
        key = np.concatenate([node, lab])
        dst = np.concatenate([np.full(len(node), -1), node])
        val = np.concatenate([lab, np.full(len(node), -1)])
        return pa.table({
            "key": pa.array(key, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "label": pa.array(val, pa.int64()),
            "bucket": pa.array((key % buckets).astype(np.int32)),
        })

    def propagate(group: pa.Table) -> pa.Table:
        """Per node-bucket: attach label(key) to every edge half, emit
        (dst, label(key)) proposals plus the lookup rows' own labels."""
        key = group["key"].to_numpy(zero_copy_only=False)
        dst = group["dst"].to_numpy(zero_copy_only=False)
        lab = group["label"].to_numpy(zero_copy_only=False)
        lookup_idx = np.flatnonzero(dst < 0)
        # vectorized key→label map via sorted lookup (keys are unique here)
        lk = key[lookup_idx]
        lv = lab[lookup_idx]
        order = np.argsort(lk, kind="stable")
        lk, lv = lk[order], lv[order]
        edge_idx = np.flatnonzero(dst >= 0)
        ek = key[edge_idx]
        out_node = dst[edge_idx]
        if len(lk):
            pos = np.clip(np.searchsorted(lk, ek), 0, len(lk) - 1)
            hit = lk[pos] == ek
            out_lab = np.where(hit, lv[pos], ek)  # no label yet → key itself
        else:
            out_lab = ek
        return pa.table({
            "node": pa.array(np.concatenate([out_node, lk]), pa.int64()),
            "label": pa.array(np.concatenate([out_lab, lv]), pa.int64()),
        })

    prev_sum = None
    for _ in range(max_rounds):
        both = edges.map_batches(edge_rows, batch_format="pyarrow").union(
            labels.map_batches(label_rows, batch_format="pyarrow"))
        labels = (
            both.groupby("bucket").map_groups(propagate, batch_format="pyarrow")
            .groupby("node").aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        cur_sum = labels.sum("label")
        if prev_sum is not None and cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    return labels.map_batches(
        lambda t: pa.table({"node": t["node"],
                            "cluster_id": t["label"]}),
        batch_format="pyarrow")


def cluster_sizes(labels: "ray.data.Dataset") -> "ray.data.Dataset":
    """Attach cluster_size to each (node, cluster_id) row via salted
    count-then-attach (round-2 verdict item #5): a (cluster, salt) hash
    aggregate counts partials, a per-cluster fold over its ≤S partial rows
    emits one size row per present salt, and the attach co-groups label rows
    with their size row on (cluster_id, salt) — per-task memory is
    O(component / S), so a boilerplate mega-cluster streams across S tasks
    instead of landing in one heap. (The previous version used
    ``groupby(cluster_id).map_groups``, which held one whole component per
    task; Ray 2.49's Dataset.join was rejected because its hash partitions
    crash Acero on schema-less empty partitions at small key counts.)"""
    S = np.int64(_n_buckets())
    empty = pa.table({"cluster_id": pa.array([], pa.int64()),
                      "salt": pa.array([], pa.int64()),
                      "node": pa.array([], pa.int64()),
                      "cluster_size": pa.array([], pa.int64())})

    def salted_labels(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return empty
        node = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        if (node < 0).any():
            # node < 0 is the in-band size-row sentinel below — negative ids
            # (e.g. a signed view of 64-bit hashes) would be misclassified
            raise ValueError(
                "cluster_sizes requires non-negative node ids "
                "(node < 0 is reserved as the size-row marker)")
        cid = t["cluster_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"cluster_id": pa.array(cid, pa.int64()),
                         "salt": pa.array(node % S, pa.int64()),
                         "node": pa.array(node, pa.int64()),
                         "cluster_size": pa.array(
                             np.full(len(node), -1), pa.int64())})

    lbl = labels.map_batches(salted_labels, batch_format="pyarrow")

    # (cluster, salt) partial counts — a hash aggregate, nothing grouped in
    # memory — then a per-CLUSTER fold over its ≤S partial rows emits one
    # size row per PRESENT salt.
    partial = lbl.groupby(["cluster_id", "salt"]).count()

    def totals(group: pa.Table) -> pa.Table:
        if group.num_columns == 0 or group.num_rows == 0:
            return empty  # schema-less empty shuffle block
        cnt = group["count()"].to_numpy(zero_copy_only=False).astype(np.int64)
        size = np.int64(cnt.sum())
        n = group.num_rows
        return pa.table({"cluster_id": group["cluster_id"].cast(pa.int64()),
                         "salt": group["salt"].cast(pa.int64()),
                         "node": pa.array(np.full(n, -1), pa.int64()),
                         "cluster_size": pa.array(np.full(n, size), pa.int64())})

    sizes = partial.groupby("cluster_id").map_groups(totals,
                                                     batch_format="pyarrow")

    out_empty = pa.table({"node": pa.array([], pa.int64()),
                          "cluster_id": pa.array([], pa.int64()),
                          "cluster_size": pa.array([], pa.int64())})

    def attach(group: pa.Table) -> pa.Table:
        if group.num_columns == 0 or group.num_rows == 0:
            return out_empty  # schema-less empty shuffle block
        node = group["node"].to_numpy(zero_copy_only=False)
        sz = group["cluster_size"].to_numpy(zero_copy_only=False)
        is_size = node < 0
        size = np.int64(sz[is_size][0])
        keep = ~is_size
        return pa.table({
            "node": pa.array(node[keep], pa.int64()),
            "cluster_id": group["cluster_id"].filter(pa.array(keep)),
            "cluster_size": pa.array(np.full(int(keep.sum()), size),
                                     pa.int64())})

    return (lbl.union(sizes)
            .groupby(["cluster_id", "salt"])
            .map_groups(attach, batch_format="pyarrow"))


def pagerank(nodes: "ray.data.Dataset", edges: "ray.data.Dataset",
             iters: int = 5, scale: int = 10 ** 12,
             damp_num: int = 85, damp_den: int = 100,
             num_buckets: int = 0) -> "ray.data.Dataset":
    """Distributed PageRank over an (src, dst) edge Dataset — the web-graph
    rank a Common-Crawl-scale corpus pipeline uses for quality weighting
    (the reference's per-page layout analysis has no cross-page analog;
    SURVEY.md §2.6 "iterative/global ordering" family, same iterative shape
    as ``connected_components`` above).

    Exact-integer arithmetic so the result is bit-reproducible at any batch
    size / bucket count AND replayable by a chained-CTE DuckDB oracle:
    ranks are int64 in units of ``1/scale``; the update is

        rank'(v) = BASE + damp_num·(inflow(v) + dangling//N) // damp_den
        inflow(v) = Σ_{u→v} rank(u) // out_deg(u)       (per edge, multi-
                                                         edges contribute
                                                         per occurrence)
        BASE     = (scale·(damp_den−damp_num) // damp_den) // N

    — integer floor-divisions are order-independent, so distributed partial
    sums match a sequential engine bit-for-bit (same trick as
    ``common.to_scaled_int64``).

    Scale shape (per round, same as connected_components): edge rows are
    re-streamed and co-partitioned with the CURRENT rank rows by src-hash
    bucket (out-degree is recomputed in-bucket — every edge of ``u`` lands
    in u's bucket, so no dedicated degree shuffle or stored column), the
    per-bucket pass emits (dst, contribution) rows plus one in-band
    ``node=-1`` row carrying Σ rank over covered (out-degree>0) sources,
    then one ``groupby(dst).sum`` materializes the round. Rank state is
    SPARSE: only nodes with in-edges hold a row; every other node shares the
    scalar ``default`` rank (they are indistinguishable under the update),
    so driver traffic per round is O(1) scalars, never O(N) rows. Dangling
    mass = (running total − covered Σ), redistributed uniformly.

    ``nodes`` (one int64 ``node`` column, the node universe) is only read by
    the final attach pass that joins rank/in_deg/out_deg onto every node via
    the same bucketed co-partition. Returns (node, rank_e12, in_deg,
    out_deg); rank_e12 is the int64 scaled rank (exact — no float noise).

    Partitioning assumption: out-degree is bounded by a page's link count
    (in-bucket ``np.unique`` over one src's edges), and per-bucket size is
    ~|edges|/buckets — skewed IN-degree is absorbed by the groupby(dst)
    hash aggregate, not a per-group task.
    """
    from ray.data.aggregate import Count, Sum

    edges = edges.materialize()
    n_edges = edges.count()
    n_nodes = nodes.count()
    if n_nodes <= 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "rank_e12": pa.array([], pa.int64()),
            "in_deg": pa.array([], pa.int64()),
            "out_deg": pa.array([], pa.int64())}))
    buckets = num_buckets or max(8, min(_n_buckets(), max(n_edges, 1) // 2000))
    base = (scale * (damp_den - damp_num) // damp_den) // n_nodes

    def edge_rows(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "key": pa.array(src, pa.int64()),
            "dst": t["dst"].cast(pa.int64()),
            "val": pa.array(np.full(len(src), -1), pa.int64()),
            "bucket": pa.array((src % buckets).astype(np.int32)),
        })

    edge_keyed = edges.map_batches(edge_rows, batch_format="pyarrow")

    contrib_empty = pa.table({"node": pa.array([], pa.int64()),
                              "c": pa.array([], pa.int64())})

    def rank_rows(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "key": pa.array(node, pa.int64()),
            "dst": pa.array(np.full(len(node), -1), pa.int64()),
            "val": t["rank"].cast(pa.int64()),
            "bucket": pa.array((node % buckets).astype(np.int32)),
        })

    def make_emit(default_rank: int):
        def emit(group: pa.Table) -> pa.Table:
            """Per src-bucket: out-degree + rank lookup per source, emit one
            (dst, rank//od) row per edge + in-band covered-sum row."""
            if group.num_columns == 0 or group.num_rows == 0:
                return contrib_empty  # schema-less empty shuffle block
            key = group["key"].to_numpy(zero_copy_only=False)
            dst = group["dst"].to_numpy(zero_copy_only=False)
            val = group["val"].to_numpy(zero_copy_only=False)
            is_rank = dst < 0
            lk, lv = key[is_rank], val[is_rank]
            order = np.argsort(lk, kind="stable")
            lk, lv = lk[order], lv[order]
            ek, ed = key[~is_rank], dst[~is_rank]
            if not len(ek):
                return contrib_empty
            # out-degree per distinct src in this bucket (all of a src's
            # edges are here by construction)
            usrc, inv, od = np.unique(ek, return_inverse=True,
                                      return_counts=True)
            if len(lk):
                pos = np.clip(np.searchsorted(lk, usrc), 0, len(lk) - 1)
                hit = lk[pos] == usrc
                ur = np.where(hit, lv[pos], default_rank)
            else:
                ur = np.full(len(usrc), default_rank, np.int64)
            covered = int(ur.sum())  # Σ rank over out-degree>0 sources
            c = ur[inv] // od[inv]
            return pa.table({
                "node": pa.array(np.concatenate([ed, [-1]]), pa.int64()),
                "c": pa.array(np.concatenate([c, [covered]]), pa.int64()),
            })
        return emit

    ranks = None          # sparse: rows only for nodes with in-edges
    default = scale // n_nodes
    total = n_nodes * default
    contrib = None
    for _ in range(iters):
        both = edge_keyed if ranks is None else edge_keyed.union(
            ranks.map_batches(rank_rows, batch_format="pyarrow"))
        contrib = (
            both.groupby("bucket").map_groups(make_emit(default),
                                              batch_format="pyarrow")
            .groupby("node").aggregate(Sum("c", alias_name="c"),
                                       Count(alias_name="in_deg"))
            .materialize()
        )
        marker = contrib.map_batches(
            lambda t: t.filter(pc.less(t["node"], 0)),
            batch_format="pyarrow").take_all()
        covered = int(marker[0]["c"]) if marker else 0
        dshare = (total - covered) // n_nodes
        nxt_default = base + (damp_num * dshare) // damp_den

        def to_rank(t: pa.Table, _d=dshare) -> pa.Table:
            node = t["node"].to_numpy(zero_copy_only=False)
            keep = node >= 0
            c = t["c"].to_numpy(zero_copy_only=False)[keep]
            r = base + (damp_num * (c + _d)) // damp_den
            return pa.table({"node": pa.array(node[keep], pa.int64()),
                             "rank": pa.array(r, pa.int64())})

        ranks = contrib.map_batches(to_rank, batch_format="pyarrow") \
                       .materialize()
        n_ranked = ranks.count()
        rank_sum = int(ranks.sum("rank")) if n_ranked else 0
        default = nxt_default
        total = rank_sum + default * (n_nodes - n_ranked)

    # out-degree dataset: per-batch partial unique counts → groupby sum
    def od_partial(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, cnt = np.unique(src, return_counts=True)
        return pa.table({"node": pa.array(u, pa.int64()),
                         "od": pa.array(cnt, pa.int64())})

    out_deg = edges.map_batches(od_partial, batch_format="pyarrow") \
                   .groupby("node").aggregate(Sum("od", alias_name="od"))

    # final attach: node universe ∪ rank rows ∪ od rows, one co-partition
    attach_empty = pa.table({"node": pa.array([], pa.int64()),
                             "rank_e12": pa.array([], pa.int64()),
                             "in_deg": pa.array([], pa.int64()),
                             "out_deg": pa.array([], pa.int64())})

    def uni_rows(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        z = np.zeros(len(node), np.int64)
        return pa.table({"key": pa.array(node, pa.int64()),
                         "kind": pa.array(z, pa.int64()),
                         "a": pa.array(z, pa.int64()),
                         "b": pa.array(z, pa.int64()),
                         "bucket": pa.array((node % buckets).astype(np.int32))})

    def rk_rows(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False)
        keep = node >= 0
        node = node[keep].astype(np.int64)
        return pa.table({"key": pa.array(node, pa.int64()),
                         "kind": pa.array(np.full(len(node), 1), pa.int64()),
                         "a": pa.array(t["c"].to_numpy(
                             zero_copy_only=False)[keep], pa.int64()),
                         "b": pa.array(t["in_deg"].to_numpy(
                             zero_copy_only=False)[keep], pa.int64()),
                         "bucket": pa.array((node % buckets).astype(np.int32))})

    def od_rows(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"key": pa.array(node, pa.int64()),
                         "kind": pa.array(np.full(len(node), 2), pa.int64()),
                         "a": t["od"].cast(pa.int64()),
                         "b": pa.array(np.zeros(len(node), np.int64)),
                         "bucket": pa.array((node % buckets).astype(np.int32))})

    fin_base, fin_num, fin_den, fin_dshare, fin_default = \
        base, damp_num, damp_den, dshare, default

    def assemble(group: pa.Table) -> pa.Table:
        if group.num_columns == 0 or group.num_rows == 0:
            return attach_empty
        key = group["key"].to_numpy(zero_copy_only=False)
        kind = group["kind"].to_numpy(zero_copy_only=False)
        a = group["a"].to_numpy(zero_copy_only=False)
        b = group["b"].to_numpy(zero_copy_only=False)
        uni = np.unique(key[kind == 0])
        out_rank = np.full(len(uni), fin_default, np.int64)
        out_in = np.zeros(len(uni), np.int64)
        out_od = np.zeros(len(uni), np.int64)
        rsel = kind == 1
        if rsel.any():
            pos = np.clip(np.searchsorted(uni, key[rsel]), 0,
                          max(len(uni) - 1, 0))
            ok = uni[pos] == key[rsel] if len(uni) else np.zeros(0, bool)
            pv = pos[ok]
            c = a[rsel][ok]
            out_rank[pv] = fin_base + (fin_num * (c + fin_dshare)) // fin_den
            out_in[pv] = b[rsel][ok]
        osel = kind == 2
        if osel.any():
            pos = np.clip(np.searchsorted(uni, key[osel]), 0,
                          max(len(uni) - 1, 0))
            ok = uni[pos] == key[osel] if len(uni) else np.zeros(0, bool)
            out_od[pos[ok]] = a[osel][ok]
        return pa.table({"node": pa.array(uni, pa.int64()),
                         "rank_e12": pa.array(out_rank, pa.int64()),
                         "in_deg": pa.array(out_in, pa.int64()),
                         "out_deg": pa.array(out_od, pa.int64())})

    return (nodes.map_batches(uni_rows, batch_format="pyarrow")
            .union(contrib.map_batches(rk_rows, batch_format="pyarrow"))
            .union(out_deg.map_batches(od_rows, batch_format="pyarrow"))
            .groupby("bucket").map_groups(assemble, batch_format="pyarrow"))
