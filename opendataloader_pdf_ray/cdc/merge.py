"""Last-writer-wins merge semantics (north_rule core).

Winner per ``url`` = event with max ``(warc_ts, seq)``. This reduce is
commutative + associative, so it can run as a per-batch combiner, then per
salted shard, then globally per partition — all three phases produce the same
winner (SURVEY.md §2.4 "CDC upsert", §2.7 "key dedup").

Deletes are **tombstones**, not physical drops: a ``D`` winner stays in the
lake flagged ``deleted=true`` so a later epoch's event with an *older*
``warc_ts`` still loses LWW against it (out-of-order arrivals across epochs,
FIXTURES.md §2). A ``U``/``I`` that out-ranks a tombstone resurrects the key
(SURVEY.md §7.4). The user-facing state view filters tombstones out.

All functions are pure pyarrow-table→table transforms, vectorized via numpy
argsort — no Python loop over rows.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MERGE_KEY = "url"
VERSION_COLS = ("warc_ts", "seq")
DELETED_COL = "deleted"
PATCH_OP = "P"

# Neutral elements for lineage-counter carry when a patch fold keeps more
# than one survivor row per key: the aggregate of the WHOLE group lands on
# the max-version survivor, every other survivor carries the neutral so a
# later fold re-aggregates exactly (sum adds 0, min/max never pick these).
_AGG_NEUTRAL = {"sum": 0, "min": 2**62, "max": -(2**62)}


def latest_per_key(table: pa.Table, aggs: Optional[dict] = None,
                   extra_group_col: Optional[str] = None) -> pa.Table:
    """Keep the max-(warc_ts, seq) row per url. Vectorized:
    stable lexicographic argsort then last-occurrence selection.

    ``aggs`` maps helper-column name → 'sum'|'min'|'max'; those columns are
    aggregated ACROSS the whole key group onto the winner row (used to carry
    lineage counters — events consumed, seq range — through the combiner and
    salted phases without a second pass over raw events).

    ``extra_group_col`` widens the group key to (url, extra) — used by the
    backlog replay path, where winners must stay separate per checkpoint
    epoch so per-epoch snapshots/commits remain exact."""
    if table.num_rows <= 1:
        return table
    urls = table[MERGE_KEY].to_numpy(zero_copy_only=False)
    ts = table["warc_ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    seq = table["seq"].to_numpy(zero_copy_only=False)
    _, inv = np.unique(urls, return_inverse=True)  # int codes for fast lexsort
    if extra_group_col is not None:
        extra = table[extra_group_col].to_numpy(zero_copy_only=False)
        _, einv = np.unique(extra, return_inverse=True)
        inv = inv * (einv.max() + 1) + einv
    order = np.lexsort((seq, ts, inv))  # primary: url, then warc_ts, then seq
    sorted_codes = inv[order]
    # last row of each url-run is the winner
    is_last = np.ones(len(order), dtype=bool)
    is_last[:-1] = sorted_codes[1:] != sorted_codes[:-1]
    is_first = np.ones(len(order), dtype=bool)
    is_first[1:] = sorted_codes[1:] != sorted_codes[:-1]
    winners = order[is_last]  # in url-sorted group order
    out = table.take(pa.array(winners))
    if aggs:
        starts = np.flatnonzero(is_first)
        for col, how in aggs.items():
            vals = table[col].to_numpy(zero_copy_only=False)[order]
            if how == "sum":
                agg = np.add.reduceat(vals, starts)
            elif how == "min":
                agg = np.minimum.reduceat(vals, starts)
            elif how == "max":
                agg = np.maximum.reduceat(vals, starts)
            else:  # pragma: no cover
                raise ValueError(how)
            idx = out.column_names.index(col)
            out = out.set_column(idx, col, pa.array(agg, table.schema.field(col).type))
    return out


def fold_events(table: pa.Table, aggs: Optional[dict] = None,
                extra_group_col: Optional[str] = None) -> pa.Table:
    """Patch-aware event reduce (partial-update CDC, ``op='P'``).

    Per key group, keep the max-(warc_ts, seq) FULL event (op ∈ I/U/D — it
    defines every column, so anything older is fully overridden) plus every
    PATCH event strictly newer than it; drop the rest. Patches are NOT
    collapsed into each other: exact column-wise LWW across regroupings
    would need a version per column, so the reduced form keeps them as rows
    and the final apply (:func:`merge_base_with_updates_patch`) resolves
    column-wise. The reduce is commutative + associative like
    :func:`latest_per_key` — "latest full" is a max, and a patch survives
    any regrouping iff it is newer than the global latest full (newer than
    the global max ⇒ newer than every subset's max).

    Tables without an ``op`` column (or with no 'P' rows) take the plain
    LWW fast path, byte-identical to :func:`latest_per_key`.

    ``aggs`` (lineage counters) are aggregated over the WHOLE group before
    any row is dropped and assigned to the max-version survivor; other
    survivors carry the neutral element — so chained folds never lose or
    double-count events even when a later fold drops this fold's carrier.
    """
    if "op" not in table.column_names:
        return latest_per_key(table, aggs=aggs, extra_group_col=extra_group_col)
    ops = table["op"].to_numpy(zero_copy_only=False)
    patch_mask = ops == PATCH_OP
    if not patch_mask.any():
        return latest_per_key(table, aggs=aggs, extra_group_col=extra_group_col)
    if table.num_rows <= 1:
        return table
    urls = table[MERGE_KEY].to_numpy(zero_copy_only=False)
    ts = table["warc_ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    seq = table["seq"].to_numpy(zero_copy_only=False)
    _, inv = np.unique(urls, return_inverse=True)
    if extra_group_col is not None:
        extra = table[extra_group_col].to_numpy(zero_copy_only=False)
        _, einv = np.unique(extra, return_inverse=True)
        inv = inv * (einv.max() + 1) + einv
    order = np.lexsort((seq, ts, inv))
    sorted_codes = inv[order]
    is_first = np.ones(len(order), dtype=bool)
    is_first[1:] = sorted_codes[1:] != sorted_codes[:-1]
    is_last = np.ones(len(order), dtype=bool)
    is_last[:-1] = sorted_codes[1:] != sorted_codes[:-1]
    starts = np.flatnonzero(is_first)
    gidx = np.cumsum(is_first) - 1  # group index per sorted row
    pos = np.arange(len(order))
    full_sorted = ~patch_mask[order]
    latest_full = np.maximum.reduceat(np.where(full_sorted, pos, -1), starts)
    keep = (pos >= latest_full[gidx]) | (latest_full[gidx] < 0)
    out = table.take(pa.array(order[keep]))
    if aggs:
        kept_is_last = is_last[keep]
        for col, how in aggs.items():
            vals = table[col].to_numpy(zero_copy_only=False)[order]
            if how == "sum":
                agg = np.add.reduceat(vals, starts)
            elif how == "min":
                agg = np.minimum.reduceat(vals, starts)
            elif how == "max":
                agg = np.maximum.reduceat(vals, starts)
            else:  # pragma: no cover
                raise ValueError(how)
            kept_vals = np.full(int(keep.sum()), _AGG_NEUTRAL[how],
                                dtype=np.int64)
            kept_vals[kept_is_last] = agg  # carriers, in group order
            idx = out.column_names.index(col)
            out = out.set_column(
                idx, col, pa.array(kept_vals, table.schema.field(col).type))
    return out


def ensure_deleted_col(table: pa.Table) -> pa.Table:
    if DELETED_COL in table.column_names:
        return table
    if "op" in table.column_names:
        deleted = pc.equal(table["op"], pa.scalar("D"))
    else:
        deleted = pa.array(np.zeros(table.num_rows, dtype=bool))
    return table.append_column(DELETED_COL, deleted.cast(pa.bool_()))


def unify_to_schema(table: pa.Table, schema: pa.Schema) -> pa.Table:
    """Project onto a unified schema, null-backfilling missing columns
    (additive schema evolution, Arrow schema unification)."""
    cols: List[pa.ChunkedArray | pa.Array] = []
    for f in schema:
        if f.name in table.column_names:
            col = table[f.name]
            if col.type != f.type:
                col = col.cast(f.type)
            cols.append(col)
        else:
            cols.append(pa.nulls(table.num_rows, f.type))
    return pa.table(cols, schema=schema)


class SchemaEvolutionError(TypeError):
    """A column changed to a type Arrow cannot promote (e.g. string→int)."""


def _promote_field(fa: pa.Field, fb: pa.Field) -> pa.Field:
    """Widened type for a field present on both sides (Arrow permissive
    promotion: int32+int64→int64, float32+float64→float64, int+float→float64,
    null→other, timestamp unit widening). Commutative — the unified type
    never depends on which epoch introduced the wider type."""
    if fa.type == fb.type:
        return fa
    try:
        return pa.unify_schemas([pa.schema([fa]), pa.schema([fb])],
                                promote_options="permissive").field(0)
    except pa.ArrowTypeError as exc:
        raise SchemaEvolutionError(
            f"column {fa.name!r} evolved to an unpromotable type: "
            f"{fa.type} vs {fb.type}") from exc


def unified_schema(a: pa.Schema, b: pa.Schema) -> pa.Schema:
    """Additive + widening unification: a's fields in order (types promoted
    where b widened them), then b's new fields in b's order. Deterministic
    regardless of which side is the base."""
    b_fields = {f.name: f for f in b}
    fields = [_promote_field(f, b_fields[f.name]) if f.name in b_fields else f
              for f in a]
    names = {f.name for f in a}
    fields += [f for f in b if f.name not in names]
    return pa.schema(fields)


def merge_base_with_updates(base: Optional[pa.Table], updates: pa.Table) -> pa.Table:
    """Copy-on-write partition merge: unify schemas, concat, LWW per url.
    ``base`` rows already carry (warc_ts, seq, deleted) from their last apply;
    ``updates`` must have gone through ensure_deleted_col()."""
    updates = ensure_deleted_col(updates)
    if base is None or base.num_rows == 0:
        merged = latest_per_key(updates)
    else:
        schema = unified_schema(base.schema, updates.schema)
        merged = latest_per_key(
            pa.concat_tables(
                [unify_to_schema(base, schema), unify_to_schema(updates, schema)]
            )
        )
    # canonical per-partition order: sort by url (SURVEY.md §4 determinism)
    return merged.sort_by([(MERGE_KEY, "ascending")])


def _column_lww(table: pa.Table) -> pa.Table:
    """One row per url, each column resolved independently by LWW over the
    events that DEFINE it: FULL rows (op ≠ 'P') define every column (a
    delete defines them as its tombstone nulls); PATCH rows define exactly
    their non-null columns (sparse wire encoding — a patch cannot set a
    column to null, the standard limitation of mask-less partial updates).
    ``url``/``warc_ts``/``seq``/``deleted`` come from the overall
    max-version row (every event defines them; a patch implies existence,
    so a patch newer than a tombstone resurrects the key with only its own
    columns set — the delete already nulled the rest). Input must carry
    ``op`` and ``deleted``; output drops ``op``. Vectorized: one lexsort +
    one reduceat per column."""
    if table.num_rows == 0:
        return table.drop_columns(["op"])
    urls = table[MERGE_KEY].to_numpy(zero_copy_only=False)
    ts = table["warc_ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    seq = table["seq"].to_numpy(zero_copy_only=False)
    ops = table["op"].to_numpy(zero_copy_only=False)
    _, inv = np.unique(urls, return_inverse=True)
    order = np.lexsort((seq, ts, inv))
    sorted_codes = inv[order]
    is_first = np.ones(len(order), dtype=bool)
    is_first[1:] = sorted_codes[1:] != sorted_codes[:-1]
    is_last = np.ones(len(order), dtype=bool)
    is_last[:-1] = sorted_codes[1:] != sorted_codes[:-1]
    starts = np.flatnonzero(is_first)
    pos = np.arange(len(order))
    full_sorted = (ops != PATCH_OP)[order]
    winner_pos = pa.array(order[is_last])  # overall max-version row per group
    fixed = {MERGE_KEY, "warc_ts", "seq", DELETED_COL, "op"}
    cols, names = [], []
    for field in table.schema:
        if field.name == "op":
            continue
        names.append(field.name)
        col = table[field.name]
        if field.name in fixed:
            cols.append(col.take(winner_pos))
            continue
        nonnull = pc.is_valid(col).combine_chunks().to_numpy(
            zero_copy_only=False)[order]
        defined = full_sorted | nonnull
        win = np.maximum.reduceat(np.where(defined, pos, -1), starts)
        take_idx = pa.array(order[np.clip(win, 0, None)].astype(np.int64),
                            mask=(win < 0))
        cols.append(col.take(take_idx))
    return pa.table(cols, names=names)


def merge_base_with_updates_patch(base: Optional[pa.Table],
                                  updates: pa.Table) -> pa.Table:
    """Patch-aware copy-on-write partition merge: base rows are full images
    (they define every column at their stored version), update rows are the
    reduced event set from :func:`fold_events` (latest full + newer patches
    per url, ``op`` retained). Column-wise LWW resolves each column to its
    latest definer; output is a full image per url, canonically url-sorted.
    Degenerates to :func:`merge_base_with_updates` when updates carry no
    ``op`` column."""
    if "op" not in updates.column_names:
        return merge_base_with_updates(base, updates)
    updates = ensure_deleted_col(updates)
    payload = updates.drop_columns(["op"])
    if base is None or base.num_rows == 0:
        table = payload
        op_col = updates["op"].combine_chunks()
    else:
        schema = unified_schema(base.schema, payload.schema)
        table = pa.concat_tables(
            [unify_to_schema(base, schema), unify_to_schema(payload, schema)])
        op_col = pa.concat_arrays(
            [pa.array(["U"] * base.num_rows, pa.string()),
             updates["op"].combine_chunks().cast(pa.string())])
    table = table.append_column("op", op_col)
    return _column_lww(table).sort_by([(MERGE_KEY, "ascending")])


def live_view(table: pa.Table) -> pa.Table:
    """User-facing state: tombstones filtered out."""
    if DELETED_COL not in table.column_names:
        return table
    return table.filter(pc.invert(pc.fill_null(table[DELETED_COL], False)))
