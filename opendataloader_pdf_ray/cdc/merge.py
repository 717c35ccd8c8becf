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

# Per-column definer versions (patch_ops lakes only): the stored snapshot
# carries, for every payload column c, ``_cvt_<c>``/``_cvs_<c>`` = the
# (warc_ts, seq) of the event that DEFINED c's current value. Without them
# the materialized image is lossy across epochs: a payload-less patch bumps
# the ROW version, and a later-arriving full image with an intermediate
# version would lose columns it should define (hypothesis-found,
# test_patch_ops). Internal — stripped from every user-facing read
# (Lake.read_partition default); only the ingest/maintenance fold paths
# read them back (internal=True).
CV_TS_PREFIX = "_cvt_"
CV_SEQ_PREFIX = "_cvs_"


def is_internal_col(name: str) -> bool:
    return name.startswith((CV_TS_PREFIX, CV_SEQ_PREFIX))


def strip_internal(table: Optional[pa.Table]) -> Optional[pa.Table]:
    """Drop per-column version metadata (user-facing view of a state
    table). None-safe; no-op when none are present."""
    if table is None:
        return None
    drop = [c for c in table.column_names if is_internal_col(c)]
    return table.drop_columns(drop) if drop else table

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


def _payload_names(schema: pa.Schema) -> List[str]:
    return [f.name for f in schema
            if f.name not in (MERGE_KEY, "warc_ts", "seq", DELETED_COL, "op")
            and not is_internal_col(f.name)]


def _ensure_versions(state: pa.Table) -> pa.Table:
    """Materialize implicit per-column versions on a full-image state
    table that predates version tracking (legacy snapshots, plain→patch
    upgrades): every payload column it carries was defined by full events,
    i.e. at the ROW version."""
    for name in _payload_names(state.schema):
        if CV_TS_PREFIX + name not in state.column_names:
            state = state.append_column(CV_TS_PREFIX + name,
                                        state["warc_ts"].cast(pa.int64()))
            state = state.append_column(CV_SEQ_PREFIX + name,
                                        state["seq"].cast(pa.int64()))
    return state


def _column_lww(table: pa.Table,
                materialized: Optional[np.ndarray] = None) -> pa.Table:
    """One row per url, each column resolved independently by LWW over the
    rows that DEFINE it: FULL event rows (op ≠ 'P') define every column (a
    delete defines them as its tombstone nulls); PATCH rows define exactly
    their non-null columns (sparse wire encoding — a patch cannot set a
    column to null, the standard limitation of mask-less partial updates);
    MATERIALIZED image rows (``materialized`` row mask — base snapshots)
    define exactly the columns whose stored ``_cvt_<c>`` version is
    non-null, at that version (a null ``_cvt`` means no event ever defined
    the column — e.g. a key created by a partial patch — and that
    undefined-ness must survive the fold: a later out-of-order full event
    must win the column even with an older version).
    ``url``/``warc_ts``/``seq``/``deleted`` come from the overall
    max-version row (every event defines them; a patch implies existence,
    so a patch newer than a tombstone resurrects the key with only its own
    columns set — the delete already nulled the rest). Input must carry
    ``op`` and ``deleted``; output drops ``op``.

    The output carries fresh ``_cvt_``/``_cvs_`` definer-version columns
    for every payload column so the NEXT fold stays exact — without them a
    payload-less patch's row-version bump would make the base image beat a
    later-arriving full event with an intermediate version on columns the
    patch never defined (hypothesis-found). Vectorized: one lexsort + one
    reduceat per column."""
    payload_names = _payload_names(table.schema)
    if table.num_rows == 0:
        out = table.drop_columns(
            ["op"] + [c for c in table.column_names if is_internal_col(c)])
        for name in payload_names:
            out = out.append_column(CV_TS_PREFIX + name,
                                    pa.array([], pa.int64()))
            out = out.append_column(CV_SEQ_PREFIX + name,
                                    pa.array([], pa.int64()))
        return out
    urls = table[MERGE_KEY].to_numpy(zero_copy_only=False)
    ts = table["warc_ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    seq = table["seq"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    ops = table["op"].to_numpy(zero_copy_only=False)
    if materialized is None:
        materialized = np.zeros(table.num_rows, bool)
    _, inv = np.unique(urls, return_inverse=True)
    order = np.lexsort((seq, ts, inv))
    sorted_codes = inv[order]
    is_first = np.ones(len(order), dtype=bool)
    is_first[1:] = sorted_codes[1:] != sorted_codes[:-1]
    is_last = np.ones(len(order), dtype=bool)
    is_last[:-1] = sorted_codes[1:] != sorted_codes[:-1]
    starts = np.flatnonzero(is_first)
    pos = np.arange(len(order))
    full_event = (ops != PATCH_OP) & ~materialized
    winner_pos = pa.array(order[is_last])  # overall max-version row per group

    cols, names = [], []
    version_cols = []
    for field in table.schema:
        if field.name == "op" or is_internal_col(field.name):
            continue
        names.append(field.name)
        col = table[field.name]
        if field.name not in payload_names:
            cols.append(col.take(winner_pos))
            continue
        # per-row (version, definedness) for this column
        vts, vseq = ts, seq
        cv_valid = None
        cvt_name = CV_TS_PREFIX + field.name
        if cvt_name in table.column_names:
            cvt = table[cvt_name].combine_chunks()
            cvs = table[CV_SEQ_PREFIX + field.name].combine_chunks()
            cv_valid = pc.is_valid(cvt).to_numpy(zero_copy_only=False)
            if cv_valid.any():
                vts = np.where(cv_valid,
                               pc.fill_null(cvt, 0).cast(pa.int64())
                               .to_numpy(zero_copy_only=False), ts)
                vseq = np.where(cv_valid,
                                pc.fill_null(cvs, 0).cast(pa.int64())
                                .to_numpy(zero_copy_only=False), seq)
        order_c = np.lexsort((vseq, vts, inv))
        nonnull = pc.is_valid(col).combine_chunks().to_numpy(
            zero_copy_only=False)
        defined = full_event | (~materialized & nonnull)
        if cv_valid is not None:
            defined |= materialized & cv_valid
        elif materialized.any():
            # materialized rows without stored versions: legacy full images
            defined |= materialized
        defined = defined[order_c]
        win = np.maximum.reduceat(np.where(defined, pos, -1), starts)
        src = order_c[np.clip(win, 0, None)]
        mask = win < 0
        cols.append(col.take(pa.array(src.astype(np.int64), mask=mask)))
        version_cols.append((CV_TS_PREFIX + field.name,
                             pa.array(vts[src], pa.int64(), mask=mask)))
        version_cols.append((CV_SEQ_PREFIX + field.name,
                             pa.array(vseq[src], pa.int64(), mask=mask)))
    for name, arr in version_cols:
        names.append(name)
        cols.append(arr)
    return pa.table(cols, names=names)


def merge_states(a: Optional[pa.Table], b: Optional[pa.Table]) -> pa.Table:
    """LWW merge of two FULL-IMAGE state tables (one row per url each
    side). Patch-version-aware: when either side carries per-column
    version columns, each column resolves to the side whose definer
    version is newer (exactly what re-folding the underlying events would
    give); otherwise byte-identical to :func:`merge_base_with_updates`.
    Used where two materialized states meet — backlog-replay hole/resume
    snapshots folding into a running image."""
    if b is None or b.num_rows == 0:
        return a
    if a is None or a.num_rows == 0:
        return b
    if not any(is_internal_col(c)
               for c in set(a.column_names) | set(b.column_names)):
        return merge_base_with_updates(a, b)
    a, b = _ensure_versions(a), _ensure_versions(b)
    schema = unified_schema(a.schema, b.schema)
    table = pa.concat_tables(
        [unify_to_schema(a, schema), unify_to_schema(b, schema)])
    table = ensure_deleted_col(table)
    table = table.append_column(
        "op", pa.array(["U"] * table.num_rows, pa.string()))
    return _column_lww(
        table, materialized=np.ones(table.num_rows, bool)
    ).sort_by([(MERGE_KEY, "ascending")])


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
        mat = np.zeros(payload.num_rows, bool)
    else:
        base = _ensure_versions(base)
        schema = unified_schema(base.schema, payload.schema)
        table = pa.concat_tables(
            [unify_to_schema(base, schema), unify_to_schema(payload, schema)])
        op_col = pa.concat_arrays(
            [pa.array(["U"] * base.num_rows, pa.string()),
             updates["op"].combine_chunks().cast(pa.string())])
        mat = np.concatenate([np.ones(base.num_rows, bool),
                              np.zeros(payload.num_rows, bool)])
    table = table.append_column("op", op_col)
    return _column_lww(table, materialized=mat).sort_by(
        [(MERGE_KEY, "ascending")])


def live_view(table: pa.Table) -> pa.Table:
    """User-facing state: tombstones filtered out."""
    if DELETED_COL not in table.column_names:
        return table
    return table.filter(pc.invert(pc.fill_null(table[DELETED_COL], False)))
