"""Bucketed pair-enrichment merge: attach a dimension value to BOTH sides
of an (id_a, id_b) pair table without ``Dataset.join``.

Ray 2.49's hash-shuffle join misbehaves when chained and its aggregator
actors deadlock small CPU budgets (measured — see
``dedup.minhash_lsh_pairs``), so multi-join shapes in this repo use two
bucketed sort-shuffle merges instead:

1. each pair explodes into two HALVES co-partitioned with the dimension
   rows by key bucket; a per-bucket dict lookup attaches the value,
2. halves re-bucket by pair id and recombine into one row carrying
   ``val_a``/``val_b``.

Both shuffles carry only pair halves + the (key, val) dimension column —
never a corpus payload — and bucket count scales with the cluster
(``pipelines.common.n_buckets``). This is the generalization of the sketch
attachment inside ``dedup.minhash_lsh_pairs`` (same partitioning
assumption: dimension keys are unique per ``key_col``).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa

import ray.data


def enrich_pairs(pairs: "ray.data.Dataset", dim: "ray.data.Dataset",
                 key_col: str, val_col: str,
                 payload_cols: Sequence[str] = (),
                 id_a: str = "id_a", id_b: str = "id_b",
                 num_buckets: int = 0,
                 val_type: "pa.DataType | None" = None,
                 payload_types: "dict | None" = None) -> "ray.data.Dataset":
    """Return (id_a, id_b, *payload_cols, val_a, val_b) — ``val_*`` looked
    up from ``dim[key_col] → dim[val_col]``. Pairs whose side has no
    dimension row are dropped (inner-join semantics). ``payload_cols`` are
    numeric/string columns of ``pairs`` carried through unchanged.

    PRECONDITION (ADVICE r2): pairs must be DISTINCT and canonical with
    ``id_a < id_b``. The recombine step matches A/B halves by sorted
    adjacency, so a duplicated (id_a, id_b) row collapses to one output row
    and a pair present in both orientations would mis-join. Every producer
    in this repo satisfies this (LSH/minhash pairs are Min-deduped with
    a < b); ``explode_halves`` raises on a non-canonical pair.

    Pass ``val_type`` / ``payload_types`` (Arrow types, needed for the
    union's typed null columns) when the inputs are computed datasets:
    falling back to ``Dataset.schema()`` EXECUTES the upstream pipeline a
    second time just to learn the types — measured ~2× on an expensive
    pairs stage."""
    from ..pipelines.common import n_buckets as _n_buckets

    buckets = num_buckets or _n_buckets()
    payload_cols = list(payload_cols)
    if val_type is None:
        dim_schema = dim.schema()
        val_type = dim_schema.types[dim_schema.names.index(val_col)]
    if payload_types is None:
        pairs_schema = pairs.schema()
        payload_types = {c: pairs_schema.types[pairs_schema.names.index(c)]
                         for c in payload_cols}

    def explode_halves(t: pa.Table) -> pa.Table:
        a = t[id_a].to_numpy(zero_copy_only=False)
        b = t[id_b].to_numpy(zero_copy_only=False)
        if len(a) and not (a < b).all():
            raise ValueError(
                "enrich_pairs requires canonical pairs with id_a < id_b "
                "(dedupe/canonicalize upstream — see docstring)")
        doc = np.concatenate([a, b])
        cols = {
            "doc": pa.array(doc, pa.int64()),
            "pair_a": pa.array(np.concatenate([a, a]), pa.int64()),
            "pair_b": pa.array(np.concatenate([b, b]), pa.int64()),
            "bucket": pa.array((doc % buckets).astype(np.int32)),
            "val": pa.nulls(len(doc), val_type),
        }
        for c in payload_cols:
            col = t[c].combine_chunks() if isinstance(t[c], pa.ChunkedArray) else t[c]
            cols[c] = pa.concat_arrays([col, col])
        return pa.table(cols)

    def dim_rows(t: pa.Table) -> pa.Table:
        doc = t[key_col].to_numpy(zero_copy_only=False)
        cols = {
            "doc": pa.array(doc, pa.int64()),
            "pair_a": pa.array(np.full(len(doc), -1), pa.int64()),
            "pair_b": pa.array(np.full(len(doc), -1), pa.int64()),
            "bucket": pa.array((doc % buckets).astype(np.int32)),
            "val": t[val_col],
        }
        for c in payload_cols:
            cols[c] = pa.nulls(len(doc), payload_types[c])
        return pa.table(cols)

    both = pairs.map_batches(explode_halves, batch_format="pyarrow").union(
        dim.select_columns([key_col, val_col]).map_batches(
            dim_rows, batch_format="pyarrow"))

    def attach(group: pa.Table) -> pa.Table:
        pair_a_all = group["pair_a"].to_numpy(zero_copy_only=False)
        docs = group["doc"].to_numpy(zero_copy_only=False)
        val_col_arr = group["val"]
        lookup = {int(docs[i]): val_col_arr[i].as_py()
                  for i in np.flatnonzero(pair_a_all < 0)}
        halves = np.flatnonzero(pair_a_all >= 0)
        ha = pair_a_all[halves]
        hb = group["pair_b"].to_numpy(zero_copy_only=False)[halves]
        hd = docs[halves]
        cols = {
            id_a: pa.array(ha, pa.int64()),
            id_b: pa.array(hb, pa.int64()),
            "is_a": pa.array(hd == ha),
            "pbucket": pa.array(
                ((ha * 1_000_003 + hb) % buckets).astype(np.int32)),
            "val": pa.array([lookup.get(int(d)) for d in hd], val_type),
        }
        take = pa.array(halves)
        for c in payload_cols:
            cols[c] = group[c].take(take)
        return pa.table(cols)

    attached = both.groupby("bucket").map_groups(attach, batch_format="pyarrow")

    def recombine(group: pa.Table) -> pa.Table:
        ids_a = group["id_a"].to_numpy(zero_copy_only=False)
        ids_b = group["id_b"].to_numpy(zero_copy_only=False)
        is_a = group["is_a"].to_numpy(zero_copy_only=False)
        # sort (pair, is_a desc) so each pair's A-half precedes its B-half
        order = np.lexsort((~is_a, ids_b, ids_a))
        sa = ids_a[order]
        sb = ids_b[order]
        sf = is_a[order]
        n = len(order)
        # rows where this is an A-half and the NEXT row is the same pair's
        # B-half (both sides resolved — inner join)
        first = np.flatnonzero(
            (np.arange(n) + 1 < n) & sf
            & (np.roll(sa, -1) == sa) & (np.roll(sb, -1) == sb)
            & ~np.roll(sf, -1))
        vals = group["val"].take(pa.array(order))
        keep_a = pa.array(order[first])
        cols = {
            id_a: pa.array(sa[first], pa.int64()),
            id_b: pa.array(sb[first], pa.int64()),
        }
        for c in payload_cols:
            cols[c] = group[c].take(keep_a)
        cols["val_a"] = vals.take(pa.array(first))
        cols["val_b"] = vals.take(pa.array(first + 1))
        out = pa.table(cols)
        return out.filter(pa.compute.and_(pa.compute.is_valid(out["val_a"]),
                                          pa.compute.is_valid(out["val_b"])))

    return attached.groupby("pbucket").map_groups(recombine,
                                                  batch_format="pyarrow")
