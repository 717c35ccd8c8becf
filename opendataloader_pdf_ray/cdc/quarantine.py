"""Dead-letter queue for poison payloads (quarantine-at-ingest).

At 10^10 change events the stream WILL contain payloads that crash the
extractor (pathological nesting → RecursionError, parser bugs, corrupt
bytes). Killing the task — Ray's default — retries the same poison batch
forever and wedges the epoch; silently ingesting a null row would let a
broken event overwrite good lake state. The DLQ is the standard third way:

- the extractor (``HtmlExtractor(quarantine=True)``) converts ANY
  extraction exception into a deterministic ``extract_error`` string on the
  row (type + message — a pure function of the payload),
- ingest DIVERTS those rows into a quarantine keyspace at
  ``<lake>/quarantine`` and drops them from the merge, so the lake keeps
  each url's previous good version (winners are chosen among clean events
  only — equivalent to the poison event never existing, which is also what
  any epoch re-chunking produces: the determinism invariant holds),
- the quarantine keyspace reuses :class:`~.lake.Lake`'s idempotent
  ``(part, epoch)`` commit protocol (same as the fp index), so DLQ writes
  are exactly-once under crash/retry/replay, and each record keeps the
  event coordinates (url, warc_ts, seq, error) needed to re-drive the
  original binlog range after a parser fix (the events themselves stay in
  the binlog — quarantine stores pointers + diagnosis, not payloads).

Unlike the url and fp keyspaces there is NO fold: the DLQ is an append-only
event log — every failure is its own record; nothing supersedes it.
"""

from __future__ import annotations

import posixpath
from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .lake import Lake, Lineage

_DLQ_COLS = ["url", "warc_ts", "seq", "extract_error"]


def quarantine_root(lake_root: str) -> str:
    """The DLQ keyspace lives inside the lake root (one deployment unit,
    shared fsspec credentials) under its own commit log."""
    return lake_root.rstrip("/") + "/quarantine"


class _CommitQuarantine:
    """One call per DLQ partition group: append this epoch's poison records
    exactly-once (idempotent on the commit log; a retried task no-ops)."""

    __name__ = "_CommitQuarantine"

    def __init__(self, root: str, num_partitions: int, epoch: int):
        self.root = root
        self.num_partitions = num_partitions
        self.epoch = epoch

    def __call__(self, group: pa.Table) -> pa.Table:
        lake = Lake(self.root, self.num_partitions)
        part = int(group["part"][0].as_py())
        if lake.is_committed(part, self.epoch):
            out = lake.read_lineage(part, self.epoch)
            out.skipped = True
        else:
            rows = group.drop_columns(["part"]).sort_by(
                [("seq", "ascending"), ("url", "ascending")])
            seqs = rows["seq"].to_pylist()
            out = lake.commit_delta(part, self.epoch, rows, Lineage(
                part=part, epoch=self.epoch, events_consumed=rows.num_rows,
                rows_upserted=rows.num_rows, rows_deleted=0,
                seq_min=min(seqs), seq_max=max(seqs)))
        return pa.table({
            "part": pa.array([out.part], pa.int32()),
            "epoch": pa.array([out.epoch], pa.int32()),
            "rows_quarantined": pa.array([out.rows_upserted], pa.int64()),
            "skipped": pa.array([out.skipped], pa.bool_()),
        })


class QuarantineStore:
    def __init__(self, root: str, num_partitions: int):
        self.root = root
        self.num_partitions = num_partitions
        self.lake = Lake(root, num_partitions)

    def update(self, extracted_ds, epoch: int) -> List[dict]:
        """Divert the error rows of an extracted stream into the DLQ: one
        slim shuffle of (url, warc_ts, seq, error) rows — payloads never
        cross the exchange. Returns ≤P lineage dicts (empty when the epoch
        had no poison)."""
        from .ingest import url_partition

        num_partitions = self.num_partitions

        def error_rows(batch: pa.Table) -> pa.Table:
            bad = batch.filter(pc.is_valid(batch["extract_error"]))
            bad = bad.select(_DLQ_COLS)
            parts = url_partition(
                bad["url"].to_numpy(zero_copy_only=False), num_partitions)
            return bad.append_column("part", pa.array(parts, pa.int32()))

        dlq = extracted_ds.map_batches(error_rows, batch_format="pyarrow")
        out = dlq.groupby("part").map_groups(
            _CommitQuarantine(self.root, num_partitions, epoch),
            batch_format="pyarrow")
        return out.take_all()  # ≤ P tiny rows

    # ------------------------------------------------------------------ read
    def read(self, epoch: Optional[int] = None) -> Optional[pa.Table]:
        """Driver-side DLQ read (ops/CLI surface — the DLQ is expected to be
        vanishingly small next to the corpus; for a pathological flood use
        :meth:`read_dataset`). Append-only: plain concat, no fold."""
        pieces: List[pa.Table] = []
        for part in range(self.num_partitions):
            for e in self.lake.committed_epochs(part):
                if epoch is not None and e != epoch:
                    continue
                path = self.lake._delta_path(part, e)
                if self.lake.fs.exists(path):
                    t = pq.read_table(path, filesystem=self.lake.fs)
                    pieces.append(t.append_column(
                        "epoch", pa.array(np.full(t.num_rows, e, np.int64))))
        if not pieces:
            return None
        return pa.concat_tables(pieces).sort_by(
            [("seq", "ascending"), ("url", "ascending")])

    def read_dataset(self):
        """Streaming DLQ read: one task per partition (the scale path)."""
        import ray.data as _rd

        root, n = self.root, self.num_partitions
        parts = [p for p in range(n) if self.lake.committed_epochs(p)]
        if not parts:
            return _rd.from_items([])

        def load(batch: pa.Table) -> pa.Table:
            store = QuarantineStore(root, n)
            out = []
            for part in batch["part"].to_pylist():
                for e in store.lake.committed_epochs(int(part)):
                    path = store.lake._delta_path(int(part), e)
                    if store.lake.fs.exists(path):
                        t = pq.read_table(path, filesystem=store.lake.fs)
                        out.append(t.append_column(
                            "epoch",
                            pa.array(np.full(t.num_rows, e, np.int64))))
            if not out:
                # typed empty block: a string-typed placeholder would crash
                # the Dataset's schema unification against real blocks
                return pa.table({
                    "url": pa.array([], pa.string()),
                    "warc_ts": pa.array([], pa.timestamp("us")),
                    "seq": pa.array([], pa.int64()),
                    "extract_error": pa.array([], pa.string()),
                    "epoch": pa.array([], pa.int64()),
                })
            return pa.concat_tables(out)

        return _rd.from_items([{"part": p} for p in parts]).map_batches(
            load, batch_format="pyarrow", batch_size=1)

    def counts(self) -> List[dict]:
        """Per-(part, epoch) quarantine lineage (≤ P × epochs tiny rows)."""
        return self.lake.all_lineage()

    def purge_urls(self, urls: List[str]) -> dict:
        """Right-to-be-forgotten for the DLQ: the quarantine keyspace stores
        urls (that is its point), so a lake purge must scrub it too.
        Rewrites only the delta files containing victims via the atomic
        write path — idempotent, commit records untouched (the quarantine
        DID happen; only the identifying payload is erased)."""
        from .ingest import url_partition

        parts = url_partition(np.array(urls, dtype=object),
                              self.num_partitions)
        by_part: dict = {}
        for url, part in zip(urls, parts):
            by_part.setdefault(int(part), []).append(url)
        files_rewritten = rows_removed = 0
        for part, part_urls in sorted(by_part.items()):
            value_set = pa.array(part_urls)
            for e in self.lake.committed_epochs(part):
                path = self.lake._delta_path(part, e)
                if not self.lake.fs.exists(path):
                    continue
                t = pq.read_table(path, filesystem=self.lake.fs)
                mask = pc.is_in(t["url"], value_set=value_set)
                hits = int(pc.sum(mask.cast(pa.int64())).as_py() or 0)
                if not hits:
                    continue
                self.lake._write_table_atomic(
                    t.filter(pc.invert(mask)), path)
                files_rewritten += 1
                rows_removed += hits
        return {"files_rewritten": files_rewritten,
                "rows_removed": rows_removed}
