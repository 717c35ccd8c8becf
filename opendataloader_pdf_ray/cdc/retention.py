"""Retention / TTL expiry: tombstone live rows older than a cutoff as ONE
exactly-once maintenance epoch.

The data-lifecycle op every compliance/real-estate policy needs (GDPR
storage limitation, crawl-freshness windows): every live row whose latest
version timestamp (``warc_ts``) is older than the cutoff becomes a
TOMBSTONE — a logical delete, not a physical rewrite of history:

- **time travel preserved**: reads ``as_of < E`` still see the expired rows
  (retention is an ordinary epoch, not ``purge`` — use purge for
  right-to-be-forgotten, where history itself must go);
- **downstream correctness**: the change feed classifies the epoch's flips
  as row-level deletes against the pre-image, incremental views retract the
  expired rows' contributions, follower indexes (textidx/vecidx) drop their
  postings on the next refresh — retention needs no special cases anywhere
  because it IS a normal epoch;
- **physical reclaim** happens later, at ``compact``/``vacuum`` time, like
  any other tombstone.

Machinery is the backfill pattern (cdc/backfill.py): an idempotent marker
claims epoch E = max committed + 1 BEFORE any partition work (resume-on-
crash: partitions already committed for E skip via the standard commit
record), one Ray task per partition reads its merge-on-read pre-state
``as_of=E-1``, flips ``deleted`` on stale rows, and commits the epoch-E
snapshot through the same protocol CDC ingest uses. Lineage carries
``kind="retention"`` and ``rows_deleted`` = rows expired; a live binlog
tail that reaches epoch E loud-fails (``ingest._guard_cdc_epoch``) instead
of silently dropping events.

Determinism: the cutoff comparison and the marker/epoch choice derive from
the commit log + row timestamps alone — equal lakes and cutoffs give
byte-equal epoch-E snapshots at any concurrency.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa

from .backfill import _LINEAGE_SCHEMA, _live_parts, resolve_backfill_epoch
from .lake import Lake, Lineage


class _RetentionPartition:
    """One call per partition id: flip tombstones + exactly-once commit."""

    def __init__(self, root: str, num_partitions: int, epoch: int,
                 cutoff_ts_us: int, ts_col: str):
        self.root = root
        self.num_partitions = num_partitions
        self.epoch = epoch
        self.cutoff = cutoff_ts_us
        self.ts_col = ts_col

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
            dead = state["deleted"].to_numpy(zero_copy_only=False)
            # timestamp[us] casts to int64 microseconds; int64 is a no-op
            ts = state[self.ts_col].cast(pa.int64()) \
                .to_numpy(zero_copy_only=False)
            expire = (~dead) & (ts < self.cutoff)
            new = state.set_column(
                state.column_names.index("deleted"), "deleted",
                pa.array(dead | expire))
            seqs = state["seq"].to_pylist() if "seq" in state.column_names \
                else [0]
            lin = Lineage(part=part, epoch=self.epoch, events_consumed=0,
                          rows_upserted=new.num_rows,
                          rows_deleted=int(expire.sum()),
                          seq_min=min(seqs), seq_max=max(seqs),
                          kind="retention")
            out.append(lake.commit_partition(part, self.epoch, new, lin))
        if not out:
            return pa.table({k: pa.array([], t) for k, t in _LINEAGE_SCHEMA})
        return pa.table({k: pa.array([getattr(l, k) for l in out], t)
                         for k, t in _LINEAGE_SCHEMA})


def apply_retention(lake: Lake, cutoff_ts_us: int, ts_col: str = "warc_ts",
                    epoch: Optional[int] = None, cooperative: bool = False,
                    lease_timeout: float = 60.0) -> List[dict]:
    """Expire every live row with ``ts_col < cutoff_ts_us`` as one new
    exactly-once epoch (module docstring). Returns ≤P tiny lineage dicts;
    re-running a finished retention starts a NEW epoch, re-running a
    crashed one resumes it, replaying a committed epoch no-ops.

    ``cooperative=True`` runs UNDER a live ``follow`` tail: the epoch comes
    from the tail's maintenance-lease grant (cdc/lease.py — the tail pauses
    at an epoch boundary and resumes after the ``.maint`` marker; no
    WriterFencedError, no stream stop). Requires a live tail to grant
    within ``lease_timeout``."""
    import ray.data

    name = f"retention:{cutoff_ts_us}"
    req = None
    if cooperative:
        if epoch is not None:
            raise ValueError("cooperative retention takes its epoch from "
                             "the tail's lease grant — do not pass epoch=")
        from .backfill import claim_marker
        from .lease import acquire_maint_epoch

        epoch, req = acquire_maint_epoch(lake, name, timeout=lease_timeout)
        claim_marker(lake, name, epoch)
    elif epoch is None:
        epoch = resolve_backfill_epoch(lake, name)
    if not cooperative:
        _fence_writer(lake, "retention")  # zombie tails die at next poll
    parts = _live_parts(lake)
    out: List[dict] = []
    if parts:
        ds = ray.data.from_items([{"part": p} for p in parts],
                                 override_num_blocks=len(parts))
        lineage = ds.map_batches(
            _RetentionPartition(lake.root, lake.num_partitions, epoch,
                                cutoff_ts_us, ts_col),
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


def _fence_writer(lake: Lake, role: str) -> dict:
    """Maintenance ops are writers too: bump the fencing token so a
    concurrently-running tail dies loudly at its next poll instead of
    colliding with the maintenance epoch (the data-plane
    ``_guard_cdc_epoch`` loud-fail stays as the backstop)."""
    from .ingest import _writer_owner

    return lake.acquire_writer(_writer_owner(role))
