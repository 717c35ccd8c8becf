"""Lake re-partitioning (P → P′) as a shuffle-free maintenance operation.

At 10^10 events the partition count chosen on day one stops fitting: hot
lakes need MORE partitions (parallelism, smaller per-task state), shrunken
ones fewer. A general re-shard is a full all-to-all shuffle of the lake —
but when P′ is a MULTIPLE of P (split) or a DIVISOR (merge), url-hash
partitioning is *consistent*: ``hash(url) % P == (hash(url) % kP) % P``, so

- **split P → kP**: dest partition q's rows live entirely in source
  partition ``q % P`` — each dest task reads ONE source partition and
  filters (no shuffle, no cross-talk);
- **merge kP → P**: dest partition q is the concat of source partitions
  ``{q + j·P}`` — url sets are disjoint across sources, so the merge is a
  concat + url sort, never an LWW fight.

This is the same doubling/halving discipline streaming systems impose on
keyed state (e.g. Kafka partition counts). Arbitrary P′ raises with advice
(export + re-ingest is the honest full-shuffle path).

Semantics: the DEST lake starts life with the SOURCE's current (or
``as_of``) state — tombstones included, so late out-of-order events keep
losing the LWW fold exactly as they would have in the source — committed as
one ``kind="rescale"`` snapshot per dest partition at the source's max
committed epoch E (CDC ingest then continues at E+1 with the new partition
count; the backfill-collision guard applies to rescale commits the same
way). Fold HISTORY does not transfer — time travel below E needs the source
lake, which rescale never mutates.

Exactly-once / resumable: per-dest-partition idempotent commits (the same
commit-record protocol as ingest) — a crashed rescale re-run skips finished
dest partitions.

Sub-keyspaces (``fpindex``, ``nearidx``, ``quarantine``) are NOT copied:
the fp indexes are fp-partitioned (url partition count is irrelevant to
them) and the DLQ is a standalone log — point the new deployment at the
source keyspaces or rebuild them.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa

from .lake import Lake, Lineage


def _check_compatible(src_p: int, dst_p: int) -> int:
    """Returns k (>0 split factor, <0 merge factor) or raises."""
    if dst_p == src_p:
        raise ValueError(f"rescale: dest partitions == source ({src_p})")
    if dst_p % src_p == 0:
        return dst_p // src_p
    if src_p % dst_p == 0:
        return -(src_p // dst_p)
    raise ValueError(
        f"rescale: {src_p} → {dst_p} is not a multiple/divisor split — "
        f"url-hash partitioning is only consistent under k·P scaling. For "
        f"arbitrary re-sharding export the lake and re-ingest at the new "
        f"partition count (a full shuffle either way).")


class _RescalePartition:
    """One task per DEST partition: read its source partition(s), filter
    (split) or concat (merge), commit idempotently."""

    __name__ = "_RescalePartition"

    def __init__(self, src_root: str, src_p: int, dst_root: str, dst_p: int,
                 epoch: int, as_of: Optional[int]):
        self.src_root, self.src_p = src_root, src_p
        self.dst_root, self.dst_p = dst_root, dst_p
        self.epoch = epoch
        self.as_of = as_of

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .ingest import url_partition

        src = Lake(self.src_root, self.src_p)
        dst = Lake(self.dst_root, self.dst_p)
        parts, rows, skipped = [], [], []
        for q in batch["part"].to_pylist():
            q = int(q)
            if dst.is_committed(q, self.epoch):
                lin = dst.read_lineage(q, self.epoch)
                parts.append(q)
                rows.append(lin.rows_upserted + lin.rows_deleted)
                skipped.append(True)
                continue
            if self.dst_p > self.src_p:      # split: one source, filter
                t = src.read_partition(q % self.src_p, as_of=self.as_of,
                                       internal=True)
                if t is not None and t.num_rows:
                    urls = t["url"].to_numpy(zero_copy_only=False)
                    t = t.filter(pa.array(
                        url_partition(urls, self.dst_p) == q))
            else:                            # merge: k disjoint sources
                pieces = []
                for p in range(q, self.src_p, self.dst_p):
                    piece = src.read_partition(p, as_of=self.as_of,
                                               internal=True)
                    if piece is not None and piece.num_rows:
                        pieces.append(piece)
                t = pa.concat_tables(pieces) if pieces else None
            if t is None or t.num_rows == 0:
                continue
            t = t.sort_by([("url", "ascending")])
            import pyarrow.compute as pc

            n_dead = int(pc.sum(pc.fill_null(
                t["deleted"], False).cast(pa.int64())).as_py() or 0)
            seqs = t["seq"].to_pylist()
            dst.commit_partition(q, self.epoch, t, Lineage(
                part=q, epoch=self.epoch, events_consumed=0,
                rows_upserted=t.num_rows - n_dead, rows_deleted=n_dead,
                seq_min=min(seqs), seq_max=max(seqs), kind="rescale"))
            parts.append(q)
            rows.append(t.num_rows)
            skipped.append(False)
        return pa.table({"part": pa.array(parts, pa.int32()),
                         "rows": pa.array(rows, pa.int64()),
                         "skipped": pa.array(skipped, pa.bool_())})


def rescale(src: Lake, dst_root: str, new_partitions: int,
            as_of: Optional[int] = None) -> List[dict]:
    """Re-partition ``src``'s state into a NEW lake at ``dst_root`` with
    ``new_partitions`` (must be k·P or P/k). Returns ≤P′ summary dicts.
    The source lake is never mutated."""
    import ray.data as _rd

    _check_compatible(src.num_partitions, new_partitions)
    # dest epoch = source's max committed epoch: CDC continues at E+1
    epoch = 0
    for p in range(src.num_partitions):
        es = src.committed_epochs(p)
        if as_of is not None:
            es = [e for e in es if e <= as_of]
        if es:
            epoch = max(epoch, es[-1])
    Lake(dst_root, new_partitions)  # persist dest metadata up front
    parts_ds = _rd.from_items([{"part": q} for q in range(new_partitions)])
    out = parts_ds.map_batches(
        _RescalePartition(src.root, src.num_partitions, dst_root,
                          new_partitions, epoch, as_of),
        batch_format="pyarrow", batch_size=1)
    summary = out.take_all()  # ≤ P′ tiny rows
    # carry the epoch-done markers: a tail replaying the ORIGINAL binlog
    # against the rescaled lake resumes at E+1 instead of re-folding (or
    # colliding with) the epochs the rescale snapshot already contains.
    # Markers are inherited from the source so a mid-binlog rescale
    # (as_of < source tip) marks only what the snapshot covers.
    dst = Lake(dst_root, new_partitions)
    for e in range(epoch + 1):
        if src.is_epoch_done(e) and not dst.is_epoch_done(e):
            dst.mark_epoch_done(e)
        if (src.fs.exists(src.epoch_maint_path(e))
                and not dst.fs.exists(dst.epoch_maint_path(e))):
            dst.mark_epoch_maint(e)  # keep maintenance epochs out of
            # epoch_done so binlog-resume semantics survive the rescale
    return summary
