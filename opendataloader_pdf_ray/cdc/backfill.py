"""Backfill / reprocess: rewrite derived columns across a lake as ONE new
exactly-once epoch.

The lakehouse maintenance op the CDC path doesn't cover: a new extractor /
scorer version needs a derived column recomputed (or added) for EVERY live
row, without replaying the binlog and without breaking time travel. A
backfill here is an ordinary lake epoch:

- **epoch choice**: one global backfill epoch E = max committed epoch + 1,
  recorded in an idempotent marker (``commits/backfill-<E>.json``, carrying
  the transform name) BEFORE any partition work. A crashed backfill leaves
  the marker + a partial set of ``(part, E)`` commits; re-running resumes —
  partitions already committed for E skip via the standard commit-record
  check, the rest complete. A marker whose partitions are all committed is
  finished, and the next backfill gets a fresh epoch.
- **per-partition task**: read the partition's pre-backfill state
  (merge-on-read ``as_of=E-1`` — works on delta-mode lakes), apply the
  transform, commit the result as the epoch-E SNAPSHOT through the same
  protocol CDC ingest uses. Partitions are the unit of parallelism and of
  resume; nothing lake-sized touches the driver (the driver handles
  partition IDS and ≤P lineage rows only).
- **transform contract**: ``fn(table) -> table`` must preserve row count
  and the key column byte-for-byte (asserted) — a backfill rewrites
  DERIVED columns; inserts/deletes belong to the CDC path. Tombstone rows
  pass through the transform like any other row (their derived columns are
  recomputed too; a transform may branch on the deleted flag if not).
- **time travel / views**: reads ``as_of < E`` see the pre-backfill state
  unchanged; incremental materialized views fold the backfill epoch as a
  normal retract-and-apply commit. ``fsck`` and ``vacuum`` treat backfill
  snapshots like any other epoch.
- **live tails**: E = max+1 is exactly the next binlog epoch, so backfills
  belong between ingest runs (quiesce the tail), or pass ``epoch=`` beyond
  the binlog's epoch space. Getting this wrong cannot LOSE data: backfill
  commits carry ``kind="backfill"`` and CDC ingest raises on reaching one
  (``ingest._guard_cdc_epoch``) instead of silently skipping the events.
  CDC epochs committed AFTER a backfill interleave soundly — their deltas
  fold onto the backfilled snapshot, and rows they replace get null derived
  columns until the next backfill recomputes them (Arrow schema
  unification).

Determinism: E, the marker, and every task decision derive from the commit
log alone; the transform sees each partition's canonical merged state, so
equal input lakes + equal transforms give byte-equal epoch-E snapshots at
any concurrency (tested).
"""

from __future__ import annotations

import json
import posixpath
from dataclasses import asdict
from typing import Callable, List, Optional

import pyarrow as pa

from .lake import Lake, Lineage

_MARKER_PREFIX = "backfill-"


def _marker_path(lake: Lake, epoch: int) -> str:
    return posixpath.join(lake._commits_dir(),
                          f"{_MARKER_PREFIX}{epoch}.json")


def _live_parts(lake: Lake) -> List[int]:
    return [p for p in range(lake.num_partitions) if lake.committed_epochs(p)]


def resolve_backfill_epoch(lake: Lake, name: str,
                           parts: Optional[List[int]] = None) -> int:
    """The resume-or-new decision, from the commit log alone: the newest
    backfill marker with any uncommitted partition IN ITS SCOPE resumes
    (the name must match — mixing transforms within one epoch would
    corrupt the snapshot set); otherwise a fresh epoch = global max + 1 is
    claimed by writing its marker. ``parts`` scopes the maintenance epoch
    to a subset of partitions (e.g. a DLQ retry touches only partitions
    with healed rows): the scope is PERSISTED in the marker so completeness
    is judged against it — markers without a recorded scope (older code,
    whole-lake ops) keep the every-live-partition rule."""
    markers = []
    for full in lake.fs.ls(lake._commits_dir(), detail=False):
        base = posixpath.basename(full)
        if base.startswith(_MARKER_PREFIX) and base.endswith(".json"):
            markers.append(int(base[len(_MARKER_PREFIX):-5]))
    live = _live_parts(lake)
    for epoch in sorted(markers, reverse=True):
        with lake.fs.open(_marker_path(lake, epoch)) as f:
            rec = json.loads(f.read())
        scope = rec.get("parts")
        scope = live if scope is None else [int(p) for p in scope]
        if any(not lake.is_committed(p, epoch) for p in scope):
            if rec.get("name") != name:
                raise ValueError(
                    f"unfinished backfill epoch {epoch} belongs to "
                    f"transform {rec.get('name')!r}, not {name!r} — finish "
                    f"or vacuum it first")
            if parts is not None and rec.get("parts") is not None:
                # resumed scoped op: the recomputed affected set is
                # authoritative. Rescope the marker to (new set ∪ parts the
                # crashed run already committed) — otherwise a scope that
                # SHRANK (extractor changed between crash and resume)
                # leaves uncommitted ghost partitions that wedge every
                # later maintenance op (ADVICE r3).
                new_scope = sorted({int(p) for p in parts}
                                   | {p for p in scope
                                      if lake.is_committed(p, epoch)})
                if new_scope != scope:
                    rec["parts"] = new_scope
                    lake._write_small_atomic(
                        _marker_path(lake, epoch),
                        json.dumps(rec).encode())
            return epoch
        break  # newest marker finished → no resume candidate below it
    newest = max((e for p in live for e in lake.committed_epochs(p)),
                 default=-1)
    epoch = newest + 1
    marker = {"name": name, "epoch": epoch}
    if parts is not None:
        marker["parts"] = sorted(int(p) for p in parts)
    lake._write_small_atomic(_marker_path(lake, epoch),
                             json.dumps(marker).encode())
    return epoch


def claim_marker(lake: Lake, name: str, epoch: int,
                 parts: Optional[List[int]] = None) -> None:
    """Idempotently write the backfill marker for an EXTERNALLY-chosen
    epoch (cooperative-lease grants — cdc/lease.py); crash-resume
    bookkeeping is then identical to the resolve_backfill_epoch path."""
    path = _marker_path(lake, epoch)
    if lake.fs.exists(path):
        return
    marker = {"name": name, "epoch": int(epoch)}
    if parts is not None:
        marker["parts"] = sorted(int(p) for p in parts)
    lake._write_small_atomic(path, json.dumps(marker).encode())


def reconcile_scoped_marker(lake: Lake, name: str) -> Optional[int]:
    """Close out a crashed scoped maintenance op whose RESUMED affected set
    is empty (e.g. a dlq-retry after the extractor changed so nothing heals
    any more): the newest unfinished marker for ``name`` is rescoped to the
    partitions the crashed run actually committed and its maintenance
    watermark is published — the marker can then never wedge later
    differently-named ops. Returns the closed epoch, or None if there was
    no unfinished marker for ``name``."""
    for full in sorted(lake.fs.ls(lake._commits_dir(), detail=False),
                       reverse=True):
        base = posixpath.basename(full)
        if not (base.startswith(_MARKER_PREFIX) and base.endswith(".json")):
            continue
        epoch = int(base[len(_MARKER_PREFIX):-5])
        with lake.fs.open(_marker_path(lake, epoch)) as f:
            rec = json.loads(f.read())
        if rec.get("name") != name or rec.get("parts") is None:
            continue
        scope = [int(p) for p in rec["parts"]]
        committed = [p for p in scope if lake.is_committed(p, epoch)]
        if len(committed) == len(scope):
            continue  # finished — nothing to reconcile
        rec["parts"] = committed
        lake._write_small_atomic(_marker_path(lake, epoch),
                                 json.dumps(rec).encode())
        if not lake.is_epoch_complete(epoch):
            lake.mark_epoch_maint(epoch)
        return epoch
    return None


class _BackfillPartition:
    """One call per partition id: transform + exactly-once commit. A retried
    or resumed task sees the (part, epoch) commit record and no-ops."""

    def __init__(self, root: str, num_partitions: int, epoch: int,
                 fn: Callable[[pa.Table], pa.Table], key_col: str):
        self.root = root
        self.num_partitions = num_partitions
        self.epoch = epoch
        self.fn = fn
        self.key_col = key_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lake = Lake(self.root, self.num_partitions)
        out: List[Lineage] = []
        for part in batch["part"].to_pylist():
            part = int(part)
            if lake.is_committed(part, self.epoch):
                lin = lake.read_lineage(part, self.epoch)
                lin.skipped = True
                out.append(lin)
                continue
            state = lake.read_partition(part, as_of=self.epoch - 1,
                                        internal=True)
            if state is None:
                continue
            from .merge import is_internal_col, strip_internal

            internal = [c for c in state.column_names if is_internal_col(c)]
            new = self.fn(strip_internal(state))
            if new.num_rows != state.num_rows:
                raise ValueError(
                    f"backfill transform changed row count on part {part}: "
                    f"{state.num_rows} -> {new.num_rows} (inserts/deletes "
                    f"belong to the CDC path)")
            if not new[self.key_col].equals(state[self.key_col]):
                raise ValueError(
                    f"backfill transform altered key column "
                    f"{self.key_col!r} on part {part}")
            # re-attach per-column version metadata (patch_ops lakes) the
            # transform never sees: row count + key order were just checked,
            # so positional alignment is safe
            for c in internal:
                if c not in new.column_names:
                    new = new.append_column(c, state[c])
            seqs = state["seq"].to_pylist() if "seq" in state.column_names \
                else [0]
            # kind="backfill": CDC ingest loud-fails if a binlog epoch ever
            # reaches this number (ingest._guard_cdc_epoch) instead of
            # silently skipping those events
            lin = Lineage(part=part, epoch=self.epoch, events_consumed=0,
                          rows_upserted=new.num_rows, rows_deleted=0,
                          seq_min=min(seqs), seq_max=max(seqs),
                          kind="backfill")
            out.append(lake.commit_partition(part, self.epoch, new, lin))
        if not out:
            return pa.table({k: pa.array([], t) for k, t in _LINEAGE_SCHEMA})
        return pa.table({k: pa.array([getattr(l, k) for l in out], t)
                         for k, t in _LINEAGE_SCHEMA})


_LINEAGE_SCHEMA = [
    ("part", pa.int32()), ("epoch", pa.int32()),
    ("events_consumed", pa.int64()), ("rows_upserted", pa.int64()),
    ("rows_deleted", pa.int64()), ("seq_min", pa.int64()),
    ("seq_max", pa.int64()), ("skipped", pa.bool_()),
]


def backfill(lake: Lake, fn: Callable[[pa.Table], pa.Table],
             name: str = "backfill", key_col: str = "url",
             epoch: Optional[int] = None, cooperative: bool = False,
             lease_timeout: float = 60.0) -> List[dict]:
    """Apply ``fn`` to every live partition's current state and commit the
    results as one new exactly-once epoch (module docstring). Returns ≤P
    tiny lineage dicts; re-running a finished backfill starts a NEW epoch,
    re-running a crashed one resumes it.

    ``cooperative=True`` runs UNDER a live ``follow`` tail instead of
    fencing it: the epoch comes from the tail's maintenance-lease grant
    (cdc/lease.py — the tail pauses at an epoch boundary and resumes after
    the ``.maint`` marker, no WriterFencedError); requires a live tail to
    grant within ``lease_timeout``."""
    import ray.data

    req = None
    if cooperative:
        if epoch is not None:
            raise ValueError("cooperative backfill takes its epoch from "
                             "the tail's lease grant — do not pass epoch=")
        from .lease import acquire_maint_epoch

        epoch, req = acquire_maint_epoch(lake, name, timeout=lease_timeout)
        claim_marker(lake, name, epoch)
    elif epoch is None:
        epoch = resolve_backfill_epoch(lake, name)
    if not cooperative:
        from .retention import _fence_writer
        _fence_writer(lake, "backfill")  # zombie tails die at next poll
    parts = _live_parts(lake)
    out: List[dict] = []
    if parts:
        ds = ray.data.from_items([{"part": p} for p in parts],
                                 override_num_blocks=len(parts))
        lineage = ds.map_batches(
            _BackfillPartition(lake.root, lake.num_partitions, epoch, fn,
                               key_col),
            batch_format="pyarrow", batch_size=None)
        out = lineage.take_all()  # ≤ P tiny rows
    if parts or req is not None:
        # publish the MAINTENANCE watermark (not epoch_done — that would
        # make a resumed binlog tail skip the colliding epoch silently), or
        # every watermark tail (follow_changes, follow_replicate) stalls
        # here forever; a cooperative grant must ALWAYS complete (the
        # granting tail stays paused until the marker lands)
        lake.mark_epoch_maint(epoch)
    if req is not None:  # cooperative: un-pause the granting tail
        from .lease import release_lease

        release_lease(lake, req)
    return out
