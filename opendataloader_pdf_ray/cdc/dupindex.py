"""Dedup-at-ingest: an incrementally-maintained content-fingerprint index.

What a Common-Crawl-scale ingest does alongside the key-partitioned upsert:
register every content version's fingerprint in a SECOND lake keyspace (fp,
not url) so duplicate content across urls can be attributed to its first
writer at read time — the lake-integrated, streaming form of the reference's
duplicate-text suppression family (removeSameTextChunks,
core/processors/DocumentProcessor.java — see COVERAGE.md §2.2/§2.7), fused
with the exactly-once CDC machinery instead of running as a batch pass.

Design (SURVEY.md §2.7 dedup + §2.9 streaming):

- **storage**: a sub-lake (conventionally ``<lake>/fpindex``) reusing
  :class:`~.lake.Lake`'s idempotent ``(part, epoch)`` commit-record protocol
  — the index inherits exactly-once commits, crash/resume, per-partition
  lineage and ``as_of`` time travel for free.
- **partitioning**: ``hash(fp) % P`` index partitions. Each update epoch is
  ONE shuffle of slim ``(fp, key, ts, seq)`` rows — the per-batch partial
  fold computes fingerprints and DROPS the text, so nothing document-sized
  crosses the exchange.
- **fold**: first-writer-wins — owner per fp = min ``(ts, seq, key)``.
  Associative, commutative and idempotent, so the final index state is
  byte-identical under ANY epoch chunking / batch size / concurrency
  (tested), the same determinism contract as the LWW lake fold (merge.py).
  Tombstone events carry no content (null text) and are ignored: the index
  answers "who wrote this content FIRST", which deletion never un-answers.
- **commit modes**: ``snapshot`` (CoW per epoch) or ``delta`` (winners-only
  append; readers fold the chain FWW merge-on-read and
  :meth:`DupIndex.compact` re-materializes a snapshot) — the same
  write-amplification trade the url keyspace makes with
  ``CDCConfig.epoch_commits``, because a high-frequency tail would
  otherwise rewrite every index partition every epoch.
- **attribution**: :meth:`DupIndex.attribute` co-partitions input rows into
  fp-space (one shuffle, text dropped) and each group task loads ITS index
  partition once — a co-located lookup, not a Dataset.join and not a
  broadcast (at 100 TB the index is itself large; only the one fp-partition
  a task needs ever leaves storage).
"""

from __future__ import annotations

import hashlib
from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .lake import Lake, Lineage

_HELPER_COLS = ("fp_part", "n_events")


def md5_digests(texts: List[Optional[str]]) -> List[bytes]:
    """16-byte md5 digests (groups identically to DuckDB ``md5(text)`` hex,
    which is what lets attribution carry a bit-exact SQL oracle)."""
    return [hashlib.md5(t.encode("utf-8")).digest() for t in texts]


def fp_partition(fps: List[bytes], num_partitions: int) -> np.ndarray:
    """fp → index partition: first 8 digest bytes as a big-endian uint64,
    mod P. Process-independent (pure bytes arithmetic, no salted hash())."""
    if not fps:
        return np.empty(0, dtype=np.int32)
    arr = np.frombuffer(b"".join(f[:8] for f in fps), dtype=">u8")
    return (arr % np.uint64(num_partitions)).astype(np.int32)


def first_per_fp(table: pa.Table, key_col: str, ts_col: str, seq_col: str,
                 count_col: Optional[str] = None) -> pa.Table:
    """Keep the min-(ts, seq, key) row per ``fp`` — the first-writer-wins
    dual of :func:`~.merge.latest_per_key`, vectorized the same way (int
    codes + lexsort + run-start selection; no Python loop over rows).

    ``count_col`` (int64), when given, is SUMMED across each fp group onto
    the winner row — carries the events-consumed lineage counter through
    the partial → global phases without a second pass."""
    if table.num_rows <= 1:
        return table
    fps = np.asarray(table["fp"].to_pylist(), dtype=object)
    ts = table[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    seq = table[seq_col].to_numpy(zero_copy_only=False)
    keys = np.asarray(table[key_col].to_pylist(), dtype=object)
    _, inv = np.unique(fps, return_inverse=True)
    # np.unique sorts, so key codes order == key order → min code = min key
    _, kinv = np.unique(keys, return_inverse=True)
    order = np.lexsort((kinv, seq, ts, inv))  # primary fp, then ts, seq, key
    sorted_codes = inv[order]
    is_first = np.ones(len(order), dtype=bool)
    is_first[1:] = sorted_codes[1:] != sorted_codes[:-1]
    out = table.take(pa.array(order[is_first]))
    if count_col is not None:
        starts = np.flatnonzero(is_first)
        vals = table[count_col].to_numpy(zero_copy_only=False)[order]
        counts = np.add.reduceat(vals, starts)
        idx = out.column_names.index(count_col)
        out = out.set_column(idx, count_col, pa.array(counts, pa.int64()))
    return out


def read_index_partition(lake: Lake, part: int, key_col: str, ts_col: str,
                         seq_col: str,
                         as_of: Optional[int] = None) -> Optional[pa.Table]:
    """FWW merge-on-read for an INDEX partition: newest snapshot ≤ as_of is
    the base, committed delta files after it fold on top with
    :func:`first_per_fp` (the fp-keyspace dual of ``Lake.read_partition``,
    whose LWW-per-url fold would be the wrong semantics here)."""
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
    if len(pieces) == 1:
        return pieces[0]
    merged = first_per_fp(pa.concat_tables(pieces), key_col, ts_col, seq_col)
    return merged.sort_by([("fp", "ascending")])


class _ApplyIndexPartition:
    """One call per fp-partition group: FWW-fold the epoch's candidates into
    the index partition, commit through the idempotent commit log. A
    retried / re-run task sees the (part, epoch) commit record and no-ops
    (reports ``skipped``) — exactly-once, same protocol as
    :class:`~.ingest.ApplyPartition`. ``commit_mode="delta"`` writes ONLY
    this epoch's candidate set (no base read-modify-write — the streaming-
    tail write-amplification fix, mirroring the lake's delta commits);
    readers fold the chain FWW merge-on-read."""

    __name__ = "_ApplyIndexPartition"  # map_groups wraps plain callables by name

    def __init__(self, root: str, num_partitions: int, epoch: int,
                 key_col: str, ts_col: str, seq_col: str,
                 commit_mode: str = "snapshot"):
        self.root = root
        self.num_partitions = num_partitions
        self.epoch = epoch
        self.key_col, self.ts_col, self.seq_col = key_col, ts_col, seq_col
        self.commit_mode = commit_mode

    def __call__(self, group: pa.Table) -> pa.Table:
        lake = Lake(self.root, self.num_partitions)
        part = int(group["fp_part"][0].as_py())
        if lake.is_committed(part, self.epoch):
            out = lake.read_lineage(part, self.epoch)
            out.skipped = True
        else:
            events = int(pc.sum(group["n_events"]).as_py())
            seq_min = int(pc.min(group[self.seq_col]).as_py())
            seq_max = int(pc.max(group[self.seq_col]).as_py())
            updates = group.drop_columns(list(_HELPER_COLS))
            # canonical order: fp ascending → commit bytes are a pure
            # function of the folded event SET (determinism invariant)
            if self.commit_mode == "delta":
                winners = first_per_fp(updates, self.key_col, self.ts_col,
                                       self.seq_col) \
                    .sort_by([("fp", "ascending")])
                lineage = Lineage(
                    part=part, epoch=self.epoch, events_consumed=events,
                    rows_upserted=winners.num_rows, rows_deleted=0,
                    seq_min=seq_min, seq_max=seq_max)
                out = lake.commit_delta(part, self.epoch, winners, lineage)
            else:
                base = read_index_partition(lake, part, self.key_col,
                                            self.ts_col, self.seq_col,
                                            as_of=self.epoch - 1)
                merged = updates if base is None \
                    else pa.concat_tables([base, updates])
                merged = first_per_fp(merged, self.key_col, self.ts_col,
                                      self.seq_col)
                merged = merged.sort_by([("fp", "ascending")])
                lineage = Lineage(
                    part=part, epoch=self.epoch, events_consumed=events,
                    rows_upserted=merged.num_rows
                    - (base.num_rows if base is not None else 0),
                    rows_deleted=0, seq_min=seq_min, seq_max=seq_max)
                out = lake.commit_partition(part, self.epoch, merged,
                                            lineage)
        return pa.table({
            "part": pa.array([out.part], pa.int32()),
            "epoch": pa.array([out.epoch], pa.int32()),
            "events_consumed": pa.array([out.events_consumed], pa.int64()),
            "rows_upserted": pa.array([out.rows_upserted], pa.int64()),
            "rows_deleted": pa.array([out.rows_deleted], pa.int64()),
            "seq_min": pa.array([out.seq_min], pa.int64()),
            "seq_max": pa.array([out.seq_max], pa.int64()),
            "skipped": pa.array([out.skipped], pa.bool_()),
        })


class DupIndex:
    """Content-fingerprint keyspace over a Lake root (see module docstring).

    ``root`` is the INDEX root — for CDC-integrated use, a sub-directory of
    the lake (``<lake>/fpindex``; the main lake's partition globbing and
    fsck never descend into it). Column names are configurable so the same
    index serves the CDC event shape (url/warc_ts/seq) and ad-hoc corpora
    (doc_id/ts/seq)."""

    def __init__(self, root: str, num_partitions: Optional[int] = None,
                 key_col: str = "url", ts_col: str = "warc_ts",
                 seq_col: str = "seq", text_col: str = "text",
                 commit_mode: str = "snapshot"):
        if commit_mode not in ("snapshot", "delta"):
            raise ValueError(commit_mode)
        self.lake = Lake(root, num_partitions)
        self.num_partitions = self.lake.num_partitions
        self.key_col, self.ts_col = key_col, ts_col
        self.seq_col, self.text_col = seq_col, text_col
        self.commit_mode = commit_mode

    def read_partition(self, part: int,
                       as_of: Optional[int] = None) -> Optional[pa.Table]:
        return read_index_partition(self.lake, part, self.key_col,
                                    self.ts_col, self.seq_col, as_of=as_of)

    def compact_distributed(self, parts: Optional[List[int]] = None) -> int:
        """Distributed :meth:`compact`: one Ray task per index partition
        performs ITS FWW fold + snapshot write (the driver must never fold
        partitions at scale). The worker is a plain DupIndex regardless of
        subclass — the fold depends only on (root, key/ts/seq columns),
        which is also why NearDupIndex inherits this unchanged."""
        import ray.data as _rd

        root, n = self.lake.root, self.num_partitions
        kc, tc, sc = self.key_col, self.ts_col, self.seq_col
        todo = list(parts) if parts is not None else list(range(n))
        if not todo:
            return 0

        def task(batch: pa.Table) -> pa.Table:
            idx = DupIndex(root, n, key_col=kc, ts_col=tc, seq_col=sc)
            done = sum(idx.compact([int(p)])
                       for p in batch["part"].to_pylist())
            return pa.table({"done": pa.array([done], pa.int64())})

        out = _rd.from_items([{"part": p} for p in todo]).map_batches(
            task, batch_format="pyarrow", batch_size=1).take_all()  # ≤ P
        return int(sum(r["done"] for r in out))

    def compact(self, parts: Optional[List[int]] = None) -> int:
        """Materialize the FWW merge-on-read state as a snapshot at each
        partition's newest committed epoch (same no-new-commit-record
        contract as ``Lake.compact``: a snapshot is a cached view of
        already-committed history — idempotent, crash-safe via the atomic
        write). Follow with ``self.lake.vacuum()`` to reclaim folded
        deltas (vacuum is content-agnostic, so the lake's works as-is).
        Driver-side per-partition worker; at scale call
        :meth:`compact_distributed`."""
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
            self.lake.fs.makedirs(self.lake._part_dir(part), exist_ok=True)
            self.lake._write_table_atomic(
                state, self.lake._data_path(part, newest))
            done += 1
        return done

    # ------------------------------------------------------------ update
    def _partial(self):
        key_col, ts_col = self.key_col, self.ts_col
        seq_col, text_col = self.seq_col, self.text_col
        num_partitions = self.num_partitions

        def fn(batch: pa.Table) -> pa.Table:
            # tombstones / quarantined records carry no content
            batch = batch.filter(pc.is_valid(batch[text_col]))
            fps = md5_digests(batch[text_col].to_pylist())
            t = pa.table({
                "fp": pa.array(fps, pa.binary()),
                key_col: batch[key_col],
                ts_col: batch[ts_col],
                seq_col: batch[seq_col],
                "n_events": pa.array(np.ones(len(fps), np.int64)),
            })
            # per-batch FWW pre-reduce: ≤1 row per fp per block enters the
            # shuffle, and the (large) text column never does
            t = first_per_fp(t, key_col, ts_col, seq_col,
                             count_col="n_events")
            parts = fp_partition(t["fp"].to_pylist(), num_partitions)
            return t.append_column("fp_part", pa.array(parts, pa.int32()))

        return fn

    def update(self, ds, epoch: int) -> List[dict]:
        """Fold one epoch's content-bearing rows into the index. ``ds`` is a
        Ray Dataset carrying (key, ts, seq, text) columns; returns ≤P tiny
        lineage rows. Exactly-once per (fp_part, epoch): re-running a
        committed epoch is a no-op reporting ``skipped``."""
        candidates = ds.map_batches(self._partial(), batch_format="pyarrow")
        lineage = candidates.groupby("fp_part").map_groups(
            _ApplyIndexPartition(self.lake.root, self.num_partitions, epoch,
                                 self.key_col, self.ts_col, self.seq_col,
                                 commit_mode=self.commit_mode),
            batch_format="pyarrow")
        return lineage.take_all()  # ≤ P tiny rows

    # --------------------------------------------------------- attribute
    def attribute(self, ds, keep_cols: Optional[List[str]] = None,
                  as_of: Optional[int] = None):
        """Annotate rows with ``dup_of`` (the first writer's key when SOME
        OTHER key first wrote identical content, else null) and ``is_dup``.
        One shuffle of (keep_cols + fp) into fp space; each group task loads
        its own index partition once — co-located lookup, no join/broadcast.
        Rows whose fp the index has never seen get dup_of=null."""
        key_col, text_col = self.key_col, self.text_col
        ts_col, seq_col = self.ts_col, self.seq_col
        keep = list(keep_cols) if keep_cols else [key_col]
        if key_col not in keep:
            keep.insert(0, key_col)
        num_partitions, root = self.num_partitions, self.lake.root

        def prep(batch: pa.Table) -> pa.Table:
            batch = batch.filter(pc.is_valid(batch[text_col]))
            fps = md5_digests(batch[text_col].to_pylist())
            cols = {c: batch[c] for c in keep}
            cols["fp"] = pa.array(fps, pa.binary())
            t = pa.table(cols)
            parts = fp_partition(fps, num_partitions)
            return t.append_column("fp_part", pa.array(parts, pa.int32()))

        def attach(group: pa.Table) -> pa.Table:
            lake = Lake(root, num_partitions)
            part = int(group["fp_part"][0].as_py())
            idx = read_index_partition(lake, part, key_col, ts_col, seq_col,
                                       as_of=as_of)
            owners = {} if idx is None else dict(
                zip(idx["fp"].to_pylist(), idx[key_col].to_pylist()))
            keys = group[key_col].to_pylist()
            dup = [owners.get(f) for f in group["fp"].to_pylist()]
            dup = [o if o is not None and o != k else None
                   for o, k in zip(dup, keys)]
            out = group.drop_columns(["fp_part", "fp"])
            out = out.append_column("dup_of",
                                    pa.array(dup, group[key_col].type))
            return out.append_column(
                "is_dup", pa.array([d is not None for d in dup], pa.bool_()))

        return (ds.map_batches(prep, batch_format="pyarrow")
                  .groupby("fp_part")
                  .map_groups(attach, batch_format="pyarrow"))

    # -------------------------------------------------------------- read
    def read_state(self, as_of: Optional[int] = None) -> pa.Table:
        """Whole index as ONE table, fp-sorted (tests / small indexes only —
        scale reads go through attribute()'s per-partition tasks)."""
        tables = []
        for part in range(self.num_partitions):
            t = self.read_partition(part, as_of=as_of)
            if t is not None and t.num_rows:
                tables.append(t)
        if not tables:
            return pa.table({})
        return pa.concat_tables(tables).sort_by([("fp", "ascending")])

    def purge_keys(self, keys: List[str]) -> dict:
        """Right-to-be-forgotten for the INDEX keyspace: remove every row
        whose owner key matches (the index stores the owner's url — PII the
        lake-side :meth:`~.lake.Lake.purge` alone would leave behind).
        Unlike the lake purge this must scan ALL index partitions (rows are
        fp-partitioned, so a key's rows can be anywhere) — a maintenance op,
        not a serving path. Atomic-replace rewrites, idempotent; purged
        fingerprints lose their first-writer record entirely, so the next
        writer of that content becomes the new owner in a later epoch.
        Audit semantics mirror the lake purge (hashes only, commit log
        untouched)."""
        import hashlib
        import json
        import posixpath

        import pyarrow.parquet as pq

        key_set = pa.array(keys)  # inferred type matches the stored key col
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
                mask = pc.is_in(t[self.key_col], value_set=key_set)
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

    def count_fingerprints(self) -> int:
        """Index cardinality — parquet FOOTERS only (metadata, no data read)
        wherever a partition's tip is a snapshot; partitions with a live
        delta chain need the FWW fold (a delta can re-own an existing fp, so
        chain row counts don't add)."""
        import pyarrow.parquet as pq

        total = 0
        for part in range(self.num_partitions):
            epochs = self.lake.committed_epochs(part)
            if not epochs:
                continue
            tip = self.lake._data_path(part, epochs[-1])
            if self.lake.fs.exists(tip):
                total += pq.read_metadata(
                    tip, filesystem=self.lake.fs).num_rows
            else:
                t = self.read_partition(part)
                total += t.num_rows if t is not None else 0
        return total

    def verify(self, deep: bool = False) -> dict:
        """fsck for the index keyspace: the lake's generic commit-log ↔
        data-file audit (readability of every partition's current chain),
        minus its url-keyspace deep checks, plus index-specific deep ones —
        the tip state of each partition must be fp-sorted and fp-unique
        (the FWW fold's canonical form; a violation means a corrupted or
        foreign file)."""
        report = self.lake.verify(deep=False)
        if deep:
            for part in range(self.num_partitions):
                t = self.read_partition(part)
                if t is None:
                    continue
                fps = t["fp"].to_pylist()
                if fps != sorted(fps):
                    report["issues"].append(
                        f"fpindex part {part}: state not fp-sorted")
                if len(set(fps)) != len(fps):
                    report["issues"].append(
                        f"fpindex part {part}: duplicate fps")
                for col in ("fp", self.key_col, self.ts_col, self.seq_col):
                    if col not in t.column_names:
                        report["issues"].append(
                            f"fpindex part {part}: column {col} missing")
            report["ok"] = not report["issues"]
        return report

    def lineage(self) -> List[dict]:
        return self.lake.all_lineage()
