"""Lake replication: apply a source lake's committed change log into a
replica lake, exactly-once, epoch-aligned, resumable.

The missing third leg of the CDC story — ingest IN (``cdc/ingest.py``),
changes OUT (``cdc/changefeed.py``), and HERE the standard consumer of
that feed: a follower lake that replays the primary's per-partition
winner sets and converges to the identical live state (and identical
time-travel states at every epoch, because the same winner sets fold in
the same order). Use cases: read replicas, region copies, blue/green
lake migration, disaster recovery with bounded replication lag.

Design (one Ray task per partition — the unit of parallelism, same as
ingest/compact/changefeed):

- per partition, the pending work is src's committed epochs not yet in
  dst's commit log; each pending epoch's winner set comes from
  ``changefeed.epoch_winners`` (delta file verbatim, or snapshot commits
  diffed against the running pre-image — retention tombstone flips
  included), and is committed into dst as a DELTA epoch with the SAME
  epoch number, carrying the source lineage tagged ``kind="delta"``;
- exactly-once by the same commit-record protocol everything else uses:
  re-running a finished replication is an all-skip no-op, a crash
  mid-run resumes from each partition's last committed epoch;
- incremental: after the primary advances, re-running applies only the
  new epochs (a cron loop IS follow mode — or tail
  ``changefeed.follow_changes`` and call ``replicate`` per window);
- epoch-done markers are mirrored on the driver (metadata scale) so
  downstream consumers of the REPLICA (views, follower indexes, its own
  change feed) see the same watermarks as the primary's.

The replica is verified by ``lakediff.lake_diff`` (empty diff ⇔
equivalent live state) — the same verifier rescale/export use.

Guards: dst must be managed by replicate alone — a dst epoch that src
does not have means independent writes and raises (replicating onto a
diverged lake would silently interleave histories). A src whose history
needed by dst was vacuumed raises via ``epoch_winners`` ("re-seed the
replica"), the correct CDC semantics for a consumer that fell behind the
retention horizon.

Determinism: winner sets and commit contents derive from src's commit
log alone — equal primaries give byte-equal replicas at any concurrency.

Reference parity: the reference engine is single-corpus with no lake, so
no counterpart; this completes the engine's lake lifecycle ops
(rescale = layout change, export = format change, replicate = copy).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import pyarrow as pa

from .changefeed import epoch_winners
from .lake import Lake
from .merge import merge_base_with_updates


def _replicate_partition(src: Lake, dst: Lake, part: int,
                         until: Optional[int]) -> Dict[str, int]:
    all_src = src.committed_epochs(part)
    src_epochs = [e for e in all_src if until is None or e <= until]
    done = set(dst.committed_epochs(part))
    foreign = done - set(all_src)
    if foreign:
        raise ValueError(
            f"replicate: dst partition {part} has epochs {sorted(foreign)} "
            f"the source lake does not — dst was written independently; "
            f"refusing to interleave histories")
    pending = [e for e in src_epochs if e not in done]
    applied = skipped = 0
    if not pending:
        return {"applied": 0, "skipped": len(src_epochs)}
    # pre-image for snapshot-commit diffs: src state just before the first
    # pending epoch (dst holds the same state — src is authoritative and
    # does not depend on dst's read path)
    state = src.read_partition(part, as_of=pending[0] - 1) \
        if pending[0] > 0 else None
    for e in pending:
        winners = epoch_winners(src, part, e, state)
        lin = src.read_lineage(part, e)
        lin.skipped = False
        out = dst.commit_delta(part, e, winners, lin)
        if out.skipped:
            skipped += 1
        else:
            applied += 1
        state = merge_base_with_updates(state, winners)
    return {"applied": applied, "skipped": skipped + len(done)}


class _ReplicateTask:
    """map_groups callable: one partition id per group."""

    __name__ = "_ReplicateTask"

    def __init__(self, src_root: str, dst_root: str, num_partitions: int,
                 until: Optional[int]):
        self.src_root = src_root
        self.dst_root = dst_root
        self.n = num_partitions
        self.until = until

    def __call__(self, group: pa.Table) -> pa.Table:
        src = Lake(self.src_root, self.n)
        dst = Lake(self.dst_root, self.n)
        part = int(group["part"][0].as_py())
        r = _replicate_partition(src, dst, part, self.until)
        return pa.table({"part": pa.array([part], pa.int32()),
                         "applied": pa.array([r["applied"]], pa.int64()),
                         "skipped": pa.array([r["skipped"]], pa.int64())})


def _guard_fast_forward_merge(src: Lake, dst: Lake, dst_root: str,
                              parts: List[int]) -> None:
    """Branch merge-back guard: replicating a BRANCH into its own parent is
    a fast-forward merge, valid only while the parent has not diverged past
    the fork. The epoch-number ``foreign`` check inside the partition task
    cannot see CONTENT divergence at a shared epoch number (the parent's
    independent epoch 3 vs the branch's epoch 3) — replicate would silently
    skip it and drop the branch's row set. So for every post-fork epoch
    committed on BOTH sides, the commit records (lineage + url Bloom) must
    be identical — true after a previous merge of this same branch
    (replicate copies lineage; identical winner sets give identical
    Blooms), false for independent parent writes. Metadata-only, O(P ×
    shared epochs). Raises with a rebase hint on divergence."""
    import fsspec as _fsspec

    if src.parent_root is None:
        return
    if _fsspec.core.url_to_fs(src.parent_root)[1] \
            != _fsspec.core.url_to_fs(dst_root)[1]:
        return
    fork = src.fork_epoch
    for part in parts:
        src_epochs = set(src.committed_epochs(part))
        for e in dst.committed_epochs(part):
            if e <= fork or e not in src_epochs:
                continue  # e ∉ src is the task-level foreign check's job
            if src._read_commit(part, e) != dst._read_commit(part, e):
                raise ValueError(
                    f"fast-forward merge refused: parent {dst_root} "
                    f"diverged at partition {part} epoch {e} (committed "
                    f"independently after the fork at {fork}) — rebase the "
                    f"branch (re-branch from the new tip and re-apply) or "
                    f"resolve via diff")


def replicate(src: Lake, dst_root: str,
              until: Optional[int] = None) -> Dict[str, int]:
    """Replicate ``src`` into the lake at ``dst_root`` (created with src's
    partition count on first run). Returns
    ``{"partitions", "commits_applied", "commits_skipped",
    "epochs_done_marked"}``. Idempotent; incremental; one Ray task per
    partition when a Ray session exists, else in-process."""
    import ray

    dst = Lake(dst_root, src.num_partitions)
    if dst.num_partitions != src.num_partitions:
        raise ValueError(
            f"replicate preserves layout: src has {src.num_partitions} "
            f"partitions, dst metadata says {dst.num_partitions} "
            f"(use rescale for layout changes)")
    parts = list(range(src.num_partitions))
    _guard_fast_forward_merge(src, dst, dst_root, parts)
    if ray.is_initialized():
        import ray.data as _rd

        results = (_rd.from_items([{"part": p} for p in parts])
                   .groupby("part")
                   .map_groups(_ReplicateTask(src.root, dst_root,
                                              src.num_partitions, until),
                               batch_format="pyarrow")
                   .take_all())
        applied = sum(r["applied"] for r in results)
        skipped = sum(r["skipped"] for r in results)
    else:
        applied = skipped = 0
        for p in parts:
            r = _replicate_partition(src, dst, p, until)
            applied += r["applied"]
            skipped += r["skipped"]
    # mirror the primary's watermarks (driver-side, metadata scale): every
    # src-complete epoch in range is now fully replicated; the marker KIND
    # is preserved so a replica promoted to primary keeps binlog-resume
    # semantics (replay must not skip a maintenance epoch's number)
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


def follow_replicate(src: Lake, dst_root: str, poll_interval: float = 0.5,
                     max_idle_polls: Optional[int] = None, stopped=None):
    """TAIL the primary — the replication dual of ``ingest --mode follow``:
    a generator yielding one replicate() summary per newly COMPLETED epoch
    window, keeping the replica at bounded lag.

    The watermark is the primary's epoch-complete marker (binlog ``.done``
    or maintenance ``.maint`` — same rule as
    ``changefeed.follow_changes``): an epoch replicates only once every
    partition's commit landed, so the replica never holds a half-committed
    epoch and its own done markers advance in lockstep. Restart resume is
    free — the watermark re-derives from the REPLICA's done markers, and
    replicate() itself skips already-committed (part, epoch) work.

    Stop conditions: ``stopped()`` returning True (drains what is done,
    then returns) or ``max_idle_polls`` consecutive polls with no
    progress."""
    import time as _time

    from .ingest import _writer_owner

    dst = Lake(dst_root, src.num_partitions)
    # fence the REPLICA: a second follow_replicate (or a replica promoted
    # to primary with its own tail) bumps the token and this one dies at
    # its next poll instead of double-applying (see ingest.follow)
    fence_tok = dst.acquire_writer(_writer_owner("replicate"))
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
            out = replicate(src, dst_root, until=hi)
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
