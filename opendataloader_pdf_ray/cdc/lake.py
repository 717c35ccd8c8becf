"""Copy-on-write Parquet lake with an idempotent per-partition commit log.

Layout (resumable-output rule: one directory per partition, never one giant
file):

    <root>/part=<k>/epoch=<e>.parquet      full partition state after epoch e
    <root>/_commits/part-<k>-epoch-<e>.json   atomic commit record + lineage
    <root>/_commits/epoch-<e>.done            whole-epoch completion marker

Exactly-once: a partition task stages its parquet under a temp name, renames
it into place (atomic on POSIX), then renames the commit record into place.
A retried task first checks the commit record and becomes a no-op
(SURVEY.md §2.9/§7.4). The commit record doubles as the lineage record
(event seq range consumed, rows upserted/deleted, epoch).
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import asdict, dataclass
from typing import Dict, List, Optional

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
        os.makedirs(self._commits_dir(), exist_ok=True)

    # ------------------------------------------------------------------- paths
    def _part_dir(self, part: int) -> str:
        return os.path.join(self.root, f"part={part:04d}")

    def _commits_dir(self) -> str:
        return os.path.join(self.root, "_commits")

    def _commit_path(self, part: int, epoch: int) -> str:
        return os.path.join(self._commits_dir(), f"part-{part:04d}-epoch-{epoch:06d}.json")

    def _data_path(self, part: int, epoch: int) -> str:
        return os.path.join(self._part_dir(part), f"epoch={epoch:06d}.parquet")

    def epoch_done_path(self, epoch: int) -> str:
        return os.path.join(self._commits_dir(), f"epoch-{epoch:06d}.done")

    # ------------------------------------------------------------------ status
    def is_committed(self, part: int, epoch: int) -> bool:
        return os.path.exists(self._commit_path(part, epoch))

    def is_epoch_done(self, epoch: int) -> bool:
        return os.path.exists(self.epoch_done_path(epoch))

    def mark_epoch_done(self, epoch: int) -> None:
        tmp = self.epoch_done_path(epoch) + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write("done")
        os.rename(tmp, self.epoch_done_path(epoch))

    def committed_epochs(self, part: int) -> List[int]:
        prefix = f"part-{part:04d}-epoch-"
        out = []
        try:
            names = os.listdir(self._commits_dir())
        except FileNotFoundError:
            return []
        for name in names:
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
            if os.path.exists(path):
                return pq.read_table(path)
        return None

    def partition_files(self, as_of: Optional[int] = None) -> List[str]:
        """Latest committed (and still-present) file per partition — the input
        list for a ``ray.data.read_parquet`` over current state."""
        files = []
        for part in range(self.num_partitions):
            epochs = self.committed_epochs(part)
            if as_of is not None:
                epochs = [e for e in epochs if e <= as_of]
            for epoch in reversed(epochs):
                path = self._data_path(part, epoch)
                if os.path.exists(path):
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
        """Write-then-atomic-rename; no-op if (part, epoch) already committed."""
        if self.is_committed(part, epoch):
            prior = self.read_lineage(part, epoch)
            prior.skipped = True
            return prior
        os.makedirs(self._part_dir(part), exist_ok=True)
        data_path = self._data_path(part, epoch)
        tmp = data_path + f".tmp-{uuid.uuid4().hex}"
        # zstd: ~3× smaller snapshots; the (de)compression cpu is spent inside
        # the parallel partition tasks, where it scales with the cluster,
        # unlike raw disk bandwidth
        pq.write_table(table, tmp, compression="zstd")
        os.rename(tmp, data_path)
        commit_path = self._commit_path(part, epoch)
        ctmp = commit_path + f".tmp-{uuid.uuid4().hex}"
        with open(ctmp, "w") as f:
            json.dump(asdict(lineage), f)
        # the rename is the commit point; if we crash before it, the data file
        # is orphaned and the retry rewrites + recommits it (idempotent)
        if self.is_committed(part, epoch):
            os.remove(ctmp)
            prior = self.read_lineage(part, epoch)
            prior.skipped = True
            return prior
        os.rename(ctmp, commit_path)
        return lineage

    def read_lineage(self, part: int, epoch: int) -> Lineage:
        with open(self._commit_path(part, epoch)) as f:
            return Lineage(**json.load(f))

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
                if os.path.exists(path):
                    os.remove(path)
                    removed += 1
        return removed

    def all_lineage(self) -> List[Dict]:
        out = []
        for name in sorted(os.listdir(self._commits_dir())):
            if name.startswith("part-") and name.endswith(".json"):
                with open(os.path.join(self._commits_dir(), name)) as f:
                    out.append(json.load(f))
        return out
