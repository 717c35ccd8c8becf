"""Copy-on-write Parquet lake with an idempotent per-partition commit log.

Layout (resumable-output rule: one directory per partition, never one giant
file):

    <root>/part=<k>/epoch=<e>.parquet      full partition state after epoch e
    <root>/_commits/part-<k>-epoch-<e>.json   commit record + lineage
    <root>/_commits/epoch-<e>.done            whole-epoch completion marker

Storage is abstracted over **fsspec** (round-2): ``root`` may be a plain
POSIX path, ``file:///…`` or ``memory://…`` (object-store-shaped). The commit
protocol is rename-free by design — atomic rename does not exist on object
stores — so the COMMIT POINT is "the commit record exists", checked before
write and trusted by every reader:

- the data file is written under its final deterministic name; a retried task
  rewrites byte-identical content (extraction/merge are deterministic), so a
  concurrent double-PUT is harmless,
- the tiny commit record is then written in one call (single PUT — atomic on
  object stores); on local filesystems it is staged + renamed for the same
  no-partial-read guarantee,
- a retried task first checks the commit record and becomes a no-op
  (SURVEY.md §2.9/§7.4). The commit record doubles as the lineage record.
"""

from __future__ import annotations

import json
import posixpath
import uuid
from dataclasses import asdict, dataclass
from typing import Dict, List, Optional

import fsspec
import pyarrow as pa
import pyarrow.parquet as pq

from .merge import live_view, unified_schema, unify_to_schema


@dataclass
class Lineage:
    part: int
    epoch: int
    events_consumed: int
    rows_upserted: int
    rows_deleted: int
    seq_min: int
    seq_max: int
    skipped: bool = False  # True when the commit already existed (idempotent replay)


class Lake:
    def __init__(self, root: str, num_partitions: int):
        self.root = root
        self.num_partitions = num_partitions
        self.fs, self._base = fsspec.core.url_to_fs(root)
        self._is_local = "file" in (self.fs.protocol if isinstance(self.fs.protocol, (list, tuple))
                                    else (self.fs.protocol,))
        self.fs.makedirs(self._commits_dir(), exist_ok=True)

    # ------------------------------------------------------------------- paths
    def _part_dir(self, part: int) -> str:
        return posixpath.join(self._base, f"part={part:04d}")

    def _commits_dir(self) -> str:
        return posixpath.join(self._base, "_commits")

    def _commit_path(self, part: int, epoch: int) -> str:
        return posixpath.join(self._commits_dir(), f"part-{part:04d}-epoch-{epoch:06d}.json")

    def _data_path(self, part: int, epoch: int) -> str:
        return posixpath.join(self._part_dir(part), f"epoch={epoch:06d}.parquet")

    def epoch_done_path(self, epoch: int) -> str:
        return posixpath.join(self._commits_dir(), f"epoch-{epoch:06d}.done")

    # ------------------------------------------------------------- atomic write
    def _write_small_atomic(self, path: str, data: bytes) -> None:
        """Single-call write for tiny records: one PUT on object stores; on
        local filesystems staged + renamed so readers never see partial
        content."""
        if self._is_local:
            tmp = path + f".tmp-{uuid.uuid4().hex}"
            with self.fs.open(tmp, "wb") as f:
                f.write(data)
            self.fs.mv(tmp, path)
        else:
            self.fs.pipe_file(path, data)

    # ------------------------------------------------------------------ status
    def is_committed(self, part: int, epoch: int) -> bool:
        return self.fs.exists(self._commit_path(part, epoch))

    def is_epoch_done(self, epoch: int) -> bool:
        return self.fs.exists(self.epoch_done_path(epoch))

    def mark_epoch_done(self, epoch: int) -> None:
        self._write_small_atomic(self.epoch_done_path(epoch), b"done")

    def committed_epochs(self, part: int) -> List[int]:
        prefix = f"part-{part:04d}-epoch-"
        out = []
        try:
            names = self.fs.ls(self._commits_dir(), detail=False)
        except FileNotFoundError:
            return []
        for full in names:
            name = posixpath.basename(full)
            if name.startswith(prefix) and name.endswith(".json"):
                out.append(int(name[len(prefix):-5]))
        return sorted(out)

    def latest_epoch(self, part: int, as_of: Optional[int] = None) -> Optional[int]:
        epochs = self.committed_epochs(part)
        if as_of is not None:
            epochs = [e for e in epochs if e <= as_of]
        return epochs[-1] if epochs else None

    # -------------------------------------------------------------------- read
    def read_partition(self, part: int, as_of: Optional[int] = None) -> Optional[pa.Table]:
        epochs = self.committed_epochs(part)
        if as_of is not None:
            epochs = [e for e in epochs if e <= as_of]
        # newest committed epoch whose snapshot still exists (vacuum may have
        # reclaimed older ones; commit records are kept for lineage)
        for epoch in reversed(epochs):
            path = self._data_path(part, epoch)
            if self.fs.exists(path):
                return pq.read_table(path, filesystem=self.fs)
        return None

    def partition_files(self, as_of: Optional[int] = None) -> List[str]:
        """Latest committed (and still-present) file per partition — the input
        list for a ``ray.data.read_parquet`` over current state (pass
        ``filesystem=lake.fs`` for non-local roots)."""
        files = []
        for part in range(self.num_partitions):
            epochs = self.committed_epochs(part)
            if as_of is not None:
                epochs = [e for e in epochs if e <= as_of]
            for epoch in reversed(epochs):
                path = self._data_path(part, epoch)
                if self.fs.exists(path):
                    files.append(path)
                    break
        return files

    def read_state(self, as_of: Optional[int] = None, include_tombstones: bool = False) -> pa.Table:
        """Whole-lake state as ONE pyarrow table (tests / small lakes only —
        big lakes should use partition_files() + ray.data.read_parquet).
        Unifies evolved schemas across partitions with null backfill."""
        tables = []
        for part in range(self.num_partitions):
            t = self.read_partition(part, as_of)
            if t is not None and t.num_rows:
                tables.append(t)
        if not tables:
            return pa.table({})
        schema = tables[0].schema
        for t in tables[1:]:
            schema = unified_schema(schema, t.schema)
        merged = pa.concat_tables([unify_to_schema(t, schema) for t in tables])
        merged = merged.sort_by([("url", "ascending")])
        return merged if include_tombstones else live_view(merged)

    # ------------------------------------------------------------------ commit
    def commit_partition(self, part: int, epoch: int, table: pa.Table,
                         lineage: Lineage) -> Lineage:
        """Write data, then publish the commit record; no-op if (part, epoch)
        already committed. The commit-record existence check is the commit
        point (object-store safe; no rename required)."""
        if self.is_committed(part, epoch):
            prior = self.read_lineage(part, epoch)
            prior.skipped = True
            return prior
        self.fs.makedirs(self._part_dir(part), exist_ok=True)
        # zstd: ~3× smaller snapshots; the (de)compression cpu is spent inside
        # the parallel partition tasks, where it scales with the cluster,
        # unlike raw disk bandwidth. Deterministic content → concurrent
        # retried writers produce byte-identical files.
        pq.write_table(table, self._data_path(part, epoch), compression="zstd",
                       filesystem=self.fs)
        if self.is_committed(part, epoch):  # lost the publish race to a retry
            prior = self.read_lineage(part, epoch)
            prior.skipped = True
            return prior
        self._write_small_atomic(self._commit_path(part, epoch),
                                 json.dumps(asdict(lineage)).encode())
        return lineage

    def read_lineage(self, part: int, epoch: int) -> Lineage:
        with self.fs.open(self._commit_path(part, epoch), "rb") as f:
            return Lineage(**json.loads(f.read().decode()))

    def vacuum(self, keep_snapshots: int = 1) -> int:
        """Remove superseded CoW snapshot files, keeping the latest
        ``keep_snapshots`` per partition. Commit records (lineage) are always
        kept — history stays auditable, only data-file storage is reclaimed.
        The write-amplification cleanup for ``backlog_snapshots="every_epoch"``
        lakes; safe anytime (current-state reads always resolve to the latest
        committed snapshot). Returns number of files removed."""
        removed = 0
        for part in range(self.num_partitions):
            epochs = self.committed_epochs(part)
            for epoch in epochs[:-keep_snapshots] if keep_snapshots else epochs:
                path = self._data_path(part, epoch)
                if self.fs.exists(path):
                    self.fs.rm_file(path)
                    removed += 1
        return removed

    def all_lineage(self) -> List[Dict]:
        out = []
        try:
            names = sorted(self.fs.ls(self._commits_dir(), detail=False))
        except FileNotFoundError:
            return []
        for full in names:
            name = posixpath.basename(full)
            if name.startswith("part-") and name.endswith(".json"):
                with self.fs.open(full, "rb") as f:
                    out.append(json.loads(f.read().decode()))
        return out
