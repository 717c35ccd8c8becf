"""Generic lake-follower index keyspace: the machinery shared by every
incrementally-maintained secondary index over the lake.

Extracted from the inverted text index (textindex.py) so the vector index
(vecindex.py) and any future follower reuse ONE implementation of the
protocol instead of re-deriving it:

- **storage**: a sub-lake of ``P`` partitions holding slim posting-delta
  rows whose IDENTITY columns name what a posting is (e.g. ``(tok, key)``
  for the text index, ``(bucket, key)`` for the vector index) plus
  ``(epoch, sign)``. Commits reuse :class:`~.lake.Lake`'s commit-record
  protocol — exactly-once per ``(idx_part, lake_epoch)``, crash/resume,
  ``as_of`` time travel free.
- **fold**: latest-(epoch) row per identity; live iff ``sign > 0``. One
  row per (identity, epoch) by construction (the emitter only emits
  DIFFS), so the fold is associative, idempotent and chunking-invariant
  like the LWW and FWW folds (merge.py, dupindex.py).
- **maintenance**: a FOLLOWER of the lake (like the change feed), not an
  ingest hook: retractions need the pre-image value, which only the lake
  partitions hold. ``refresh()`` runs one Ray task per LAKE partition
  (the subclass's emitter) folding epochs ``(watermark, up_to]`` with the
  change feed's pre-image discipline and emitting diff rows stamped with
  an ``idx_part`` helper column; one slim shuffle into index space;
  per-partition tasks split by epoch and commit each idempotently; the
  watermark advances only after every commit landed.
- **compact**: materializes each partition's fold as a snapshot at its
  tip epoch and PRUNES retracted rows (sign ≤ 0): a snapshot is the
  oldest readable base, so "absent" and "latest row is a retraction" are
  indistinguishable to every later read.
- **purge**: right-to-be-forgotten across every posting file of the
  victim keys (indexes store urls — PII the lake-side purge alone would
  leave behind); audit record stores key hashes only.

Subclass contract: set ``POSTING_SCHEMA`` (must contain ``epoch`` int64
and ``sign`` int8), ``IDENTITY`` (the identity column names, in canonical
sort order), ``KEY_COL`` (the url-bearing column ``purge_keys`` scrubs),
keep ``self._extra_init`` (picklable ctor kwargs beyond root/partitions,
so distributed compaction can respawn the index inside tasks), and
implement ``make_emitter(lake, since, up_to)`` returning a picklable
callable-class for ``map_batches`` over lake-partition-id rows.
"""

from __future__ import annotations

import json
import posixpath
from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .lake import Lake, Lineage
from .merge import merge_base_with_updates

HELPER_COL = "idx_part"


def column_or_nulls(table: pa.Table, col: str) -> list:
    """Column values, or all-None when the column predates a schema
    evolution (additive columns are null-backfilled lake-wide, so a
    follower folding pre-evolution epochs must read them as absent)."""
    if col in table.column_names:
        return table[col].to_pylist()
    return [None] * table.num_rows


def follower_epoch_candidates(lake: Lake, part: int, epoch: int,
                              state: Optional[pa.Table]
                              ) -> Tuple[pa.Table, Optional[pa.Table]]:
    """(candidate rows, post-image state) for one committed lake epoch,
    VALUE-level: delta commits yield the rows that actually CHANGED the
    partition state (see below); snapshot commits (CoW ingest, BACKFILL,
    rescale seed) yield the WHOLE snapshot as candidates with the snapshot
    itself as post-state. Emitters value-diff each candidate against the
    pre-image (old == new → emit nothing), so a backfill that rewrites
    only derived columns — invisible to the (warc_ts, seq)-keyed change
    feed by design — still reaches follower indexes built on those
    columns. Cost note: on a CoW-mode lake every epoch snapshots, so a
    follower refresh re-diffs the partition per epoch; delta-mode tails
    (the scale path) stay O(churn).

    LWW-loser discipline (hypothesis-found, test_fuzz_lake): a delta file
    carries its epoch's OWN winner set, which can include cross-epoch
    out-of-order rows that LOSE the LWW fold against the pre-image — those
    leave the live state untouched and must not become candidates (the
    emitter would otherwise index the stale value). Candidates are
    therefore the POST-image rows of the delta's urls whose event
    coordinates (warc_ts, seq, deleted) changed — the delta's winning rows
    verbatim, its losing rows dropped."""
    import pyarrow.parquet as pq

    res = lake.resolve_data(part, epoch, "delta")
    if res is not None:
        # translate renamed columns like read_partition does (rename of an
        # INDEXED column is refused, but pre-index renames must not leave
        # the emitter reading a historical name as nulls)
        winners = lake.apply_renames(pq.read_table(res[1],
                                                   filesystem=res[0]))
        post = merge_base_with_updates(state, winners)
        if state is None or state.num_rows == 0:
            return post, post
        touched = pc.is_in(
            post["url"], value_set=winners["url"].combine_chunks().unique())
        from .changefeed import _snapshot_diff

        return _snapshot_diff(post.filter(touched), state), post
    res = lake.resolve_data(part, epoch, "snap")
    if res is not None:
        snap = lake.apply_renames(pq.read_table(res[1], filesystem=res[0]))
        return snap, snap
    raise ValueError(
        f"follower: partition {part} epoch {epoch} has neither delta nor "
        f"snapshot file (vacuumed?) — re-seed the index from scratch")


def latest_per_identity(table: pa.Table,
                        identity: Tuple[str, ...]) -> pa.Table:
    """Keep the max-epoch row per identity tuple — the posting fold. Rows
    are unique per (identity, epoch) by construction, so no further
    tiebreak exists to take. Vectorized (codes + lexsort + run-end
    selection); identity columns may be any hashable dtype (string codes
    via np.unique, ints used directly)."""
    if table.num_rows <= 1:
        return table
    eps = table["epoch"].to_numpy(zero_copy_only=False)
    codes = []
    for col in identity:
        vals = table[col].to_numpy(zero_copy_only=False)
        if vals.dtype.kind in ("i", "u"):
            codes.append(vals)
        else:
            _, inv = np.unique(np.asarray(vals, dtype=object),
                               return_inverse=True)
            codes.append(inv)
    order = np.lexsort((eps, *reversed(codes)))
    sorted_codes = [c[order] for c in codes]
    is_last = np.ones(len(order), dtype=bool)
    neq = sorted_codes[0][1:] != sorted_codes[0][:-1]
    for c in sorted_codes[1:]:
        neq = neq | (c[1:] != c[:-1])
    is_last[:-1] = neq
    return table.take(pa.array(order[is_last]))


def read_identity_partition(lake: Lake, part: int,
                            identity: Tuple[str, ...],
                            as_of: Optional[int] = None
                            ) -> Optional[pa.Table]:
    """Merge-on-read for one index partition: newest snapshot ≤ as_of is
    the base, committed deltas after it fold on top with
    :func:`latest_per_identity`; canonical identity sort order."""
    import pyarrow.parquet as pq

    epochs = lake.committed_epochs(part)
    if as_of is not None:
        epochs = [e for e in epochs if e <= as_of]
    pieces: List[pa.Table] = []
    base_idx = -1
    for i in range(len(epochs) - 1, -1, -1):
        path = lake._data_path(part, epochs[i])
        if lake.fs.exists(path):
            pieces.append(pq.read_table(path, filesystem=lake.fs))
            base_idx = i
            break
    for epoch in epochs[base_idx + 1:]:
        dpath = lake._delta_path(part, epoch)
        if lake.fs.exists(dpath):
            pieces.append(pq.read_table(dpath, filesystem=lake.fs))
    if not pieces:
        return None
    # promote: an index upgraded across a posting-schema version (e.g.
    # textidx gaining tf) folds old epochs with nulls instead of crashing
    merged = pieces[0] if len(pieces) == 1 \
        else latest_per_identity(
            pa.concat_tables(pieces, promote_options="default"), identity)
    return merged.sort_by([(c, "ascending") for c in identity])


class _ApplyIndexPartition:
    """One call per index-partition group: split the refresh window's rows
    by lake epoch and commit each as an idempotent delta — a retried or
    re-run refresh sees the (part, epoch) commit records and no-ops."""

    __name__ = "_ApplyIndexPartition"

    def __init__(self, root: str, num_partitions: int,
                 identity: Tuple[str, ...]):
        self.root, self.num_partitions = root, num_partitions
        self.identity = identity

    def __call__(self, group: pa.Table) -> pa.Table:
        lake = Lake(self.root, self.num_partitions)
        part = int(group[HELPER_COL][0].as_py())
        parts, epochs_o, skipped = [], [], []
        for e in sorted(set(group["epoch"].to_pylist())):
            sub = group.filter(pc.equal(group["epoch"], e)) \
                .drop_columns([HELPER_COL])
            if lake.is_committed(part, int(e)):
                out = lake.read_lineage(part, int(e))
                out.skipped = True
            else:
                # canonical order: commit bytes are a pure function of the
                # folded diff SET (determinism invariant)
                sub = sub.sort_by([(c, "ascending") for c in self.identity])
                signs = sub["sign"].to_numpy(zero_copy_only=False)
                out = lake.commit_delta(part, int(e), sub, Lineage(
                    part=part, epoch=int(e), events_consumed=sub.num_rows,
                    rows_upserted=int((signs > 0).sum()),
                    rows_deleted=int((signs < 0).sum()),
                    seq_min=int(e), seq_max=int(e)))
            parts.append(out.part); epochs_o.append(out.epoch)
            skipped.append(out.skipped)
        return pa.table({
            "part": pa.array(parts, pa.int32()),
            "epoch": pa.array(epochs_o, pa.int64()),
            "skipped": pa.array(skipped, pa.bool_()),
        })


class FollowerIndex:
    """Base class for lake-follower posting keyspaces (module docstring).

    ``root`` is the INDEX root — conventionally a sub-directory of the
    lake. The followed lake is passed to :meth:`refresh`, never stored:
    the index is a durable consumer, restartable anywhere the lake is
    reachable."""

    WATERMARK = "_watermark.json"
    POSTING_SCHEMA: pa.Schema
    IDENTITY: Tuple[str, ...]
    KEY_COL = "key"

    def __init__(self, root: str, num_partitions: Optional[int] = None):
        self.lake = Lake(root, num_partitions)
        self.num_partitions = self.lake.num_partitions
        self._extra_init: dict = {}

    # -------------------------------------------------- subclass contract
    def make_emitter(self, lake: Lake, since: int, up_to: int):
        """Picklable callable-class for ``map_batches`` over lake-partition
        ids: fold epochs ``(since, up_to]`` with the pre-image discipline
        and emit posting diff rows + the ``idx_part`` helper column."""
        raise NotImplementedError

    # ------------------------------------------------------------ refresh
    def watermark(self) -> int:
        path = posixpath.join(self.lake.root, self.WATERMARK)
        try:
            with self.lake.fs.open(path, "rb") as f:
                return int(json.loads(f.read().decode())["epoch"])
        except FileNotFoundError:
            return -1

    def _set_watermark(self, epoch: int) -> None:
        self.lake._write_small_atomic(
            posixpath.join(self.lake.root, self.WATERMARK),
            json.dumps({"epoch": epoch}).encode())

    def refresh(self, lake: Lake, up_to: Optional[int] = None) -> List[dict]:
        """Fold lake epochs ``(watermark, up_to]`` into the index. Returns
        the per-(idx_part, epoch) commit lineage rows (≤ P × epochs, tiny).
        Exactly-once: a crashed refresh re-runs safely (deterministic
        re-emission + idempotent commits); the watermark only advances
        after every commit landed."""
        import ray.data as _rd

        since = self.watermark()
        if up_to is None:
            up_to = max((max(lake.committed_epochs(p), default=-1)
                         for p in range(lake.num_partitions)), default=-1)
        if up_to <= since:
            return []
        deltas = _rd.from_items(
            [{"part": p} for p in range(lake.num_partitions)]
        ).map_batches(self.make_emitter(lake, since, up_to),
                      batch_format="pyarrow", batch_size=1)
        lineage = deltas.groupby(HELPER_COL).map_groups(
            _ApplyIndexPartition(self.lake.root, self.num_partitions,
                                 self.IDENTITY),
            batch_format="pyarrow").take_all()  # ≤ P × epochs tiny rows
        self._set_watermark(up_to)
        return lineage

    # -------------------------------------------------------------- reads
    def read_partition(self, part: int,
                       as_of: Optional[int] = None) -> Optional[pa.Table]:
        return read_identity_partition(self.lake, part, self.IDENTITY,
                                       as_of=as_of)

    def read_state(self, as_of: Optional[int] = None) -> pa.Table:
        """Whole LIVE posting set as one identity-sorted table — tests /
        small indexes only; scale reads go through the subclass's search."""
        tables = []
        for part in range(self.num_partitions):
            t = self.read_partition(part, as_of=as_of)
            if t is not None and t.num_rows:
                tables.append(t.filter(pc.greater(t["sign"], 0)))
        if not tables:
            return self.POSTING_SCHEMA.empty_table()
        return pa.concat_tables(tables).sort_by(
            [(c, "ascending") for c in self.IDENTITY])

    # ------------------------------------------------------------ compact
    def compact(self, parts: Optional[List[int]] = None) -> int:
        """Materialize each partition's posting fold as a snapshot at its
        tip epoch, PRUNING retracted rows (sign ≤ 0 — safe because the
        snapshot is the oldest base any later read folds from, so absence
        and a latest-row retraction read identically). Same
        no-new-commit-record contract as ``Lake.compact``; follow with
        ``self.lake.vacuum()`` to reclaim folded deltas."""
        done = 0
        for part in (parts if parts is not None
                     else range(self.num_partitions)):
            epochs = self.lake.committed_epochs(part)
            if not epochs:
                continue
            newest = epochs[-1]
            if self.lake.fs.exists(self.lake._data_path(part, newest)):
                continue
            state = self.read_partition(part)
            if state is None:
                continue
            state = state.filter(pc.greater(state["sign"], 0))
            self.lake.fs.makedirs(self.lake._part_dir(part), exist_ok=True)
            self.lake._write_table_atomic(
                state, self.lake._data_path(part, newest))
            done += 1
        return done

    def compact_distributed(self, parts: Optional[List[int]] = None) -> int:
        """One Ray task per index partition performs its fold + snapshot
        write (the driver never folds data at scale)."""
        import ray.data as _rd

        cls = type(self)
        root, n = self.lake.root, self.num_partitions
        extra = dict(self._extra_init)
        todo = list(parts) if parts is not None else list(range(n))
        if not todo:
            return 0

        def task(batch: pa.Table) -> pa.Table:
            idx = cls(root, n, **extra)
            done = sum(idx.compact([int(p)])
                       for p in batch["part"].to_pylist())
            return pa.table({"done": pa.array([done], pa.int64())})

        out = _rd.from_items([{"part": p} for p in todo]).map_batches(
            task, batch_format="pyarrow", batch_size=1).take_all()  # ≤ P
        return int(sum(r["done"] for r in out))

    # -------------------------------------------------------------- audit
    def verify(self, deep: bool = False) -> dict:
        """fsck for the posting keyspace: the lake's generic commit-log ↔
        data-file audit plus index-specific deep checks — every partition's
        folded tip must be identity-sorted and identity-unique, and
        snapshots must carry no retracted rows."""
        report = self.lake.verify(deep=False)
        name = type(self).__name__
        if deep:
            import pyarrow.parquet as pq
            for part in range(self.num_partitions):
                t = self.read_partition(part)
                if t is None:
                    continue
                ids = list(zip(*(t[c].to_pylist() for c in self.IDENTITY)))
                if ids != sorted(ids):
                    report["issues"].append(
                        f"{name} part {part}: state not identity-sorted")
                if len(set(ids)) != len(ids):
                    report["issues"].append(
                        f"{name} part {part}: duplicate identity rows")
                epochs = self.lake.committed_epochs(part)
                for e in epochs:
                    spath = self.lake._data_path(part, e)
                    if self.lake.fs.exists(spath):
                        snap = pq.read_table(spath, filesystem=self.lake.fs)
                        if snap.num_rows and int(pc.min(
                                snap["sign"]).as_py()) <= 0:
                            report["issues"].append(
                                f"{name} part {part} epoch {e}: snapshot "
                                f"carries retracted rows")
            report["ok"] = not report["issues"]
        return report

    def purge_keys(self, keys: List[str]) -> dict:
        """Right-to-be-forgotten for the posting keyspace: remove every
        posting row of the victim keys (indexes store urls — PII the
        lake-side purge alone would leave behind). Rows are partitioned by
        the index's own key, so this scans ALL index partitions — a
        maintenance op, not a serving path. Atomic-replace rewrites,
        idempotent; audit record stores key hashes only, commit log
        untouched (same contract as ``DupIndex.purge_keys``)."""
        import hashlib

        import pyarrow.parquet as pq

        key_set = pa.array(keys, pa.string())
        files_rewritten = rows_removed = 0
        for part in range(self.num_partitions):
            try:
                names = sorted(self.lake.fs.ls(self.lake._part_dir(part),
                                               detail=False))
            except FileNotFoundError:
                continue
            for full in names:
                name = posixpath.basename(full)
                if not (name.startswith(("epoch=", "delta="))
                        and name.endswith(".parquet")):
                    continue
                t = pq.read_table(full, filesystem=self.lake.fs)
                mask = pc.is_in(t[self.KEY_COL], value_set=key_set)
                hits = int(pc.sum(mask.cast(pa.int64())).as_py() or 0)
                if not hits:
                    continue
                self.lake._write_table_atomic(t.filter(pc.invert(mask)),
                                              full)
                files_rewritten += 1
                rows_removed += hits
        audit = {
            "op": "purge_keys",
            "key_hashes": sorted(hashlib.sha256(str(k).encode()).hexdigest()
                                 for k in keys),
            "files_rewritten": files_rewritten,
            "rows_removed": rows_removed,
        }
        batch_id = hashlib.sha256(
            "".join(audit["key_hashes"]).encode()).hexdigest()[:16]
        self.lake._write_small_atomic(
            posixpath.join(self.lake._commits_dir(),
                           f"purge-{batch_id}.json"),
            json.dumps(audit).encode())
        return audit

    def lineage(self) -> List[dict]:
        return self.lake.all_lineage()
