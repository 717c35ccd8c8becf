"""Point-in-time RESTORE: roll the lake's live state back to a past epoch
as ONE new exactly-once maintenance epoch (Delta Lake ``RESTORE`` / Iceberg
``rollback`` analog, re-expressed over this commit-log design).

A bad binlog batch, a mis-configured backfill, or a poisoned upstream crawl
lands in the lake as ordinary epochs; restore undoes them WITHOUT rewriting
history — the rollback itself is an epoch:

- **semantics**: after ``apply_restore(lake, target)``, the lake's LIVE
  state equals its live state ``as_of=target``. Rows inserted after the
  target become TOMBSTONES (logical deletes — the change feed emits
  ``delete`` ops for them); rows deleted after the target are resurrected
  (``insert`` ops); rows updated after the target revert (``update`` ops
  carrying the old values). Downstream consumers — incremental views,
  text/vector/column follower indexes, replicas tailing the change log —
  need no special cases because a restore IS a normal epoch.
- **time travel preserved**: reads ``as_of`` between target and the restore
  epoch still see the undone states (restore is not ``purge``); a second
  restore can therefore roll *forward* again to any of them.
- **schema evolution**: columns added after the target stay in the schema;
  reverted rows carry the target-time values unified into the current
  schema (Arrow null-backfill), matching the additive-evolution rule the
  CDC path uses.
- **version provenance kept**: reverted rows keep their ORIGINAL
  ``(warc_ts, seq)`` from the target state — restore asserts what the state
  *is*, not that new events arrived. A resumed binlog tail's later events
  carry higher versions and win LWW over the restored rows as they should.
  (The tombstones restore writes keep the pre-image's version for the same
  reason: a post-restore re-crawl of that url must out-rank them.)
- **machinery**: the backfill pattern (cdc/backfill.py) — an idempotent
  marker claims epoch E = max committed + 1 before any partition work, one
  Ray task per partition builds its restored snapshot from two merge-on-read
  reads (``as_of=E-1`` pre-image, ``as_of=target`` target image) and commits
  through the standard exactly-once protocol; crash/resume via the
  (part, E) commit records; ``mark_epoch_maint`` publishes the watermark so
  change-feed/replication tails advance past E; the writer fence kills
  zombie binlog tails loudly (``WriterFencedError``); a CDC tail whose
  epoch numbering reaches E raises via ``ingest._guard_cdc_epoch``.
- **precondition**: time travel to ``target`` must be intact (vacuum may
  have reclaimed pre-target snapshots on some partition — then that
  partition's target image is unrecoverable and the task raises rather than
  silently restoring a later state).

Reference parity: no counterpart (the reference is a single-corpus
converter); the analog is Delta Lake RESTORE semantics re-derived for this
lake's (url, warc_ts, seq) LWW model.

Determinism: E, the marker, and every partition's restored snapshot derive
from the commit log alone; snapshots are url-sorted like every other
committer, so equal lakes and targets give byte-equal epoch-E snapshots at
any concurrency (tested).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa

from .backfill import _LINEAGE_SCHEMA, _live_parts, resolve_backfill_epoch
from .lake import Lake, Lineage
from .merge import unified_schema, unify_to_schema


class _RestorePartition:
    """One call per partition id: build the restored snapshot + exactly-once
    commit. A retried or resumed task sees the (part, epoch) commit record
    and no-ops."""

    def __init__(self, root: str, num_partitions: int, epoch: int,
                 target: int):
        self.root = root
        self.num_partitions = num_partitions
        self.epoch = epoch
        self.target = target

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
            pre = lake.read_partition(part, as_of=self.epoch - 1,
                                      internal=True)
            if pre is None:
                continue
            epochs = [e for e in lake.committed_epochs(part)
                      if e <= self.target]
            tgt = lake.read_partition(part, as_of=self.target,
                                      internal=True) \
                if epochs else None
            if epochs and tgt is None:
                # commits exist at/before the target but no data file
                # survives — vacuum reclaimed the target's history; raising
                # beats silently tombstoning the whole partition
                raise RuntimeError(
                    f"partition {part}: target epoch {self.target} is no "
                    f"longer time-travelable (data files vacuumed)")
            new, flipped = self._restored(pre, tgt, part)
            seqs = new["seq"].to_pylist() if "seq" in new.column_names \
                else [0]
            lin = Lineage(part=part, epoch=self.epoch, events_consumed=0,
                          rows_upserted=new.num_rows, rows_deleted=flipped,
                          seq_min=min(seqs), seq_max=max(seqs),
                          kind="restore")
            out.append(lake.commit_partition(part, self.epoch, new, lin))
        if not out:
            return pa.table({k: pa.array([], t) for k, t in _LINEAGE_SCHEMA})
        return pa.table({k: pa.array([getattr(l, k) for l in out], t)
                         for k, t in _LINEAGE_SCHEMA})

    def _restored(self, pre: pa.Table, tgt: Optional[pa.Table], part: int):
        """Target image + tombstones for post-target urls, url-sorted.

        ``tgt is None`` = the partition had NO commits at the target (born
        later): everything it holds now is post-target, so every row is
        tombstoned. Otherwise the restored snapshot is the target image
        (live rows and its own tombstones, values and versions verbatim)
        plus one tombstone per url the partition gained since."""
        if tgt is None:
            dead = pre["deleted"].to_numpy(zero_copy_only=False)
            new = pre.set_column(
                pre.column_names.index("deleted"), "deleted",
                pa.array(np.ones(pre.num_rows, dtype=bool)))
            return new, int((~dead).sum())
        schema = unified_schema(pre.schema, tgt.schema)
        pre_u = unify_to_schema(pre, schema)
        tgt_u = unify_to_schema(tgt, schema)
        pre_urls = np.asarray(pre_u["url"].to_pylist(), dtype=object)
        tgt_urls = np.asarray(tgt_u["url"].to_pylist(), dtype=object)
        extra_mask = ~np.isin(pre_urls, tgt_urls)
        extra = pre_u.filter(pa.array(extra_mask))
        if extra.num_rows:
            extra = extra.set_column(
                extra.column_names.index("deleted"), "deleted",
                pa.array(np.ones(extra.num_rows, dtype=bool)))
        new = pa.concat_tables([tgt_u, extra]).sort_by(
            [("url", "ascending")])
        # lineage rows_deleted = live rows the restore tombstoned: live in
        # the pre-image but not live in the restored state
        pre_live = pre_urls[~pre_u["deleted"].to_numpy(zero_copy_only=False)]
        new_live = np.asarray(
            new.filter(pa.array(
                ~new["deleted"].to_numpy(zero_copy_only=False)))
            ["url"].to_pylist(), dtype=object)
        flipped = int((~np.isin(pre_live, new_live)).sum())
        return new, flipped


def apply_restore(lake: Lake, target: int,
                  epoch: Optional[int] = None) -> List[dict]:
    """Roll the lake's LIVE state back to its state ``as_of=target`` as one
    new exactly-once epoch (module docstring). Returns ≤P tiny lineage
    dicts; re-running a finished restore starts a NEW epoch (a no-op one —
    the states already match), re-running a crashed one resumes it."""
    import ray.data

    parts = _live_parts(lake)
    newest = max((e for p in parts for e in lake.committed_epochs(p)),
                 default=-1)
    if target >= newest:
        raise ValueError(
            f"restore target {target} is not in the past: newest committed "
            f"epoch is {newest} (nothing to roll back)")
    if epoch is None:
        epoch = resolve_backfill_epoch(lake, f"restore:{target}")
    from .retention import _fence_writer
    _fence_writer(lake, "restore")  # zombie tails die at their next poll
    if not parts:
        return []
    ds = ray.data.from_items([{"part": p} for p in parts],
                             override_num_blocks=len(parts))
    lineage = ds.map_batches(
        _RestorePartition(lake.root, lake.num_partitions, epoch, target),
        batch_format="pyarrow", batch_size=None)
    out = lineage.take_all()  # ≤ P tiny rows
    # publish the MAINTENANCE watermark (not epoch_done — a resumed binlog
    # tail must loud-fail on this epoch, not skip it silently)
    lake.mark_epoch_maint(epoch)
    return out
