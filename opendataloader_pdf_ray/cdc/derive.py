"""Derived lakes: a downstream lake maintained as an exactly-once
FILTERED / TRANSFORMED projection of a source lake's change log — the
medallion pattern (bronze → silver) expressed over this engine's commit
log, and the generalization of ``cdc/replicate.py`` (replicate is derive
with the identity transform).

    derive(src, dst_root, transform)   # dst converges to transform(live(src))

``transform`` is a deterministic table→table callable over LIVE winner
rows that may (a) DROP rows (predicate / quality filter) and (b) add or
reshape non-key columns (projection, derived features). Keys are sacred:
every output row must keep its input row's ``url``/``warc_ts``/``seq``
byte-identical, each url at most once, no invented urls — validated per
epoch, violations raise.

The CDC subtlety that makes this an engine primitive rather than a
one-liner: **an update that makes a row LEAVE the predicate must DELETE
it downstream.** Per pending epoch the effective winner set
(``changefeed.epoch_winners``) splits three ways:

  src tombstone      → dst tombstone (key + version, payload null)
  live, kept by T    → dst upsert of the transformed row
  live, dropped by T → dst TOMBSTONE at the source row's version
                       (the row no longer qualifies — filtered
                       replication semantics)

Each epoch commits into dst as a DELTA with the SAME epoch number through
the standard commit-record protocol: exactly-once (re-runs all-skip),
crash-resumable per partition, incremental (re-run after the primary
advances to catch up), one Ray task per partition. Epoch-done markers are
mirrored so dst's own consumers (views, indexes, its change feed) see the
primary's watermarks. Determinism: dst bytes derive from src's commit log
+ T alone — equal primaries give byte-equal derived lakes at any
concurrency or catch-up chunking.

Guards: dst is managed by this derive alone — foreign dst epochs raise
(like replicate), and the transform identity is dst-persistent config
(``_commits/derive.json``): resuming with a different transform_id fails
loudly instead of silently interleaving two projections.

Scale: winner sets are bounded per (partition, epoch); nothing
materializes on the driver; T runs inside the per-partition task (compose
heavy transforms from vectorized kernels like backfill's).

Reference parity: no counterpart (single-corpus converter); this is the
lake-lifecycle analog of the reference's filter-chain applied as a
STANDING transformation (SURVEY.md §2.2 chain semantics, re-expressed as
incremental view maintenance over the change log).
"""

from __future__ import annotations

import json
import posixpath
from typing import Callable, Dict, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .changefeed import epoch_winners
from .lake import Lake
from .merge import (
    DELETED_COL,
    merge_base_with_updates,
    unified_schema,
    unify_to_schema,
)

_KEY_COLS = ("url", "warc_ts", "seq")


def _config_path(dst: Lake) -> str:
    return posixpath.join(dst._commits_dir(), "derive.json")


def _check_config(dst: Lake, transform_id: str, src_root: str) -> None:
    """Transform identity is dst-persistent config (colindex.py pattern):
    a derived lake resumed under a different transform or source would
    silently interleave two projections — fail loudly instead."""
    path = _config_path(dst)
    if dst.fs.exists(path):
        with dst.fs.open(path, "rb") as f:
            stored = json.loads(f.read().decode())
        if stored != {"transform_id": transform_id, "src_root": src_root}:
            raise ValueError(
                f"derived lake at {dst.root} was built with "
                f"{stored}; refusing to resume with transform_id="
                f"{transform_id!r} src={src_root!r} — use a fresh dst")
        return
    dst._write_small_atomic(path, json.dumps(
        {"transform_id": transform_id, "src_root": src_root}).encode())


def _slim_tombstones(rows: pa.Table) -> pa.Table:
    """(url, warc_ts, seq, deleted=True) — payload nulls come from schema
    unification at fold time."""
    return pa.table({
        "url": rows["url"],
        "warc_ts": rows["warc_ts"],
        "seq": rows["seq"],
        DELETED_COL: pa.array(np.ones(rows.num_rows, bool)),
    })


def _derive_winners(winners: pa.Table, transform: Callable) -> pa.Table:
    """Transform one epoch's effective winner set into the dst delta."""
    dead = pc.fill_null(winners[DELETED_COL], False)
    live = winners.filter(pc.invert(dead))
    out = transform(live.drop_columns([DELETED_COL]))
    # -------- key contract validation (determinism is load-bearing)
    t_urls = out["url"].to_numpy(zero_copy_only=False)
    uniq, t_idx = np.unique(t_urls, return_index=True)
    if len(uniq) != len(t_urls):
        raise ValueError("derive transform emitted a url more than once")
    src_urls = live["url"].to_numpy(zero_copy_only=False)
    s_order = np.argsort(src_urls, kind="stable")
    pos = np.searchsorted(src_urls[s_order], uniq)
    if (pos >= len(src_urls)).any() or \
            (src_urls[s_order][np.clip(pos, 0, max(len(src_urls) - 1, 0))]
             != uniq).any():
        raise ValueError("derive transform invented urls not in its input")
    for col in ("warc_ts", "seq"):
        want = live[col].cast(pa.int64()).to_numpy(
            zero_copy_only=False)[s_order][pos]
        got = out[col].cast(pa.int64()).to_numpy(zero_copy_only=False)[t_idx]
        if not np.array_equal(want, got):
            raise ValueError(
                f"derive transform changed {col} — version columns must "
                f"pass through byte-identical")
    # -------- rows T dropped: tombstone them downstream at their version
    kept = np.zeros(len(src_urls), bool)
    kept[s_order[pos]] = True
    dropped = live.take(pa.array(np.flatnonzero(~kept), pa.int64()))
    if DELETED_COL not in out.column_names:
        out = out.append_column(
            DELETED_COL, pa.array(np.zeros(out.num_rows, bool)))
    tombs = pa.concat_tables([
        _slim_tombstones(winners.filter(dead)),   # src deletes pass through
        _slim_tombstones(dropped),                # filtered-out → delete
    ])
    schema = unified_schema(out.schema, tombs.schema)
    return pa.concat_tables([
        unify_to_schema(out, schema),
        unify_to_schema(tombs, schema),
    ]).sort_by([("url", "ascending")])


def _derive_partition(src: Lake, dst: Lake, part: int, transform: Callable,
                      until: Optional[int]) -> Dict[str, int]:
    all_src = src.committed_epochs(part)
    src_epochs = [e for e in all_src if until is None or e <= until]
    done = set(dst.committed_epochs(part))
    foreign = done - set(all_src)
    if foreign:
        raise ValueError(
            f"derive: dst partition {part} has epochs {sorted(foreign)} the "
            f"source lake does not — dst was written independently; "
            f"refusing to interleave histories")
    pending = [e for e in src_epochs if e not in done]
    if not pending:
        return {"applied": 0, "skipped": len(src_epochs)}
    state = src.read_partition(part, as_of=pending[0] - 1) \
        if pending[0] > 0 else None
    applied = skipped = 0
    for e in pending:
        winners = epoch_winners(src, part, e, state)
        derived = _derive_winners(winners, transform)
        lin = src.read_lineage(part, e)
        lin.skipped = False
        n_dead = int(pc.sum(derived[DELETED_COL].cast(pa.int64())).as_py() or 0)
        lin.rows_upserted = derived.num_rows - n_dead
        lin.rows_deleted = n_dead
        out = dst.commit_delta(part, e, derived, lin)
        if out.skipped:
            skipped += 1
        else:
            applied += 1
        state = merge_base_with_updates(state, winners)
    return {"applied": applied, "skipped": skipped + len(done)}


class _DeriveTask:
    """map_groups callable: one partition id per group. ``transform`` ships
    pickled to the task (module-level callables only, like CDCConfig.derive)."""

    __name__ = "_DeriveTask"

    def __init__(self, src_root: str, dst_root: str, num_partitions: int,
                 transform: Callable, until: Optional[int]):
        self.src_root = src_root
        self.dst_root = dst_root
        self.n = num_partitions
        self.transform = transform
        self.until = until

    def __call__(self, group: pa.Table) -> pa.Table:
        src = Lake(self.src_root, self.n)
        dst = Lake(self.dst_root, self.n)
        part = int(group["part"][0].as_py())
        r = _derive_partition(src, dst, part, self.transform, self.until)
        return pa.table({"part": pa.array([part], pa.int32()),
                         "applied": pa.array([r["applied"]], pa.int64()),
                         "skipped": pa.array([r["skipped"]], pa.int64())})


def derive(src: Lake, dst_root: str, transform: Callable,
           transform_id: Optional[str] = None,
           until: Optional[int] = None) -> Dict[str, int]:
    """Maintain the lake at ``dst_root`` as ``transform`` applied to
    ``src``'s live state, incrementally from the change log. Idempotent,
    crash-resumable, one Ray task per partition when a session exists.
    ``transform_id`` names the projection for the dst-persistent config
    guard (defaults to the callable's qualified name)."""
    import ray

    tid = transform_id or getattr(transform, "__qualname__",
                                  getattr(transform, "__name__", "anon"))
    dst = Lake(dst_root, src.num_partitions)
    if dst.num_partitions != src.num_partitions:
        raise ValueError(
            f"derive preserves layout: src has {src.num_partitions} "
            f"partitions, dst metadata says {dst.num_partitions}")
    _check_config(dst, tid, src.root)
    parts = list(range(src.num_partitions))
    if ray.is_initialized():
        import ray.data as _rd

        results = (_rd.from_items([{"part": p} for p in parts])
                   .groupby("part")
                   .map_groups(_DeriveTask(src.root, dst_root,
                                           src.num_partitions, transform,
                                           until),
                               batch_format="pyarrow")
                   .take_all())  # ≤ P tiny rows
        applied = sum(r["applied"] for r in results)
        skipped = sum(r["skipped"] for r in results)
    else:
        applied = skipped = 0
        for p in parts:
            r = _derive_partition(src, dst, p, transform, until)
            applied += r["applied"]
            skipped += r["skipped"]
    # mirror the primary's watermarks (metadata scale, replicate.py rules)
    marked = 0
    seen: List[int] = sorted({e for p in parts
                              for e in src.committed_epochs(p)
                              if until is None or e <= until})
    for e in seen:
        if src.is_epoch_done(e) and not dst.is_epoch_done(e):
            dst.mark_epoch_done(e)
            marked += 1
        if (src.fs.exists(src.epoch_maint_path(e))
                and not dst.fs.exists(dst.epoch_maint_path(e))):
            dst.mark_epoch_maint(e)
            marked += 1
    return {"partitions": len(parts), "commits_applied": applied,
            "commits_skipped": skipped, "epochs_done_marked": marked}


class FilteredTransform:
    """Picklable compose for the CLI surface: keep rows matching EVERY
    equality term (string-canonical, like ``export --eq`` / the column
    index), then apply an optional column transform. Library users can pass
    any callable to :func:`derive` directly."""

    def __init__(self, eq: Optional[Dict[str, List[str]]] = None,
                 transform: Optional[Callable] = None):
        self.eq = eq or {}
        self.transform = transform

    def __call__(self, table: pa.Table) -> pa.Table:
        for col, values in sorted(self.eq.items()):
            mask = pc.is_in(pc.cast(table[col], pa.string()),
                            value_set=pa.array(values, pa.string()))
            table = table.filter(pc.fill_null(mask, False))
        if self.transform is not None and table.num_rows:
            table = self.transform(table)
        return table


def follow_derive(src: Lake, dst_root: str, transform: Callable,
                  transform_id: Optional[str] = None,
                  poll_interval: float = 0.5,
                  max_idle_polls: Optional[int] = None, stopped=None):
    """TAIL the primary through the transform — the derived-lake dual of
    ``replicate --follow``: yields one derive() summary per newly COMPLETED
    epoch window (epoch-done OR maintenance markers), keeping the derived
    lake at bounded lag. Fenced on the dst writer token; restart resume is
    free (watermark re-derives from dst's markers, derive() skips committed
    work)."""
    import time as _time

    from .ingest import _writer_owner

    dst = Lake(dst_root, src.num_partitions)
    fence_tok = dst.acquire_writer(_writer_owner("derive"))
    watermark = -1
    while dst.is_epoch_complete(watermark + 1):
        watermark += 1
    idle = 0
    while True:
        dst.check_writer(fence_tok)
        stopping = bool(stopped()) if stopped is not None else False
        hi = watermark
        while src.is_epoch_complete(hi + 1):
            hi += 1
        if hi > watermark:
            out = derive(src, dst_root, transform,
                         transform_id=transform_id, until=hi)
            yield {"lo_epoch": watermark, "hi_epoch": hi, **out}
            watermark = hi
            idle = 0
        else:
            idle += 1
        if stopping and hi == watermark:
            return
        if max_idle_polls is not None and idle >= max_idle_polls:
            return
        _time.sleep(poll_interval)
