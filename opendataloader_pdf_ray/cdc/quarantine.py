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


def scrub_pairs(store: QuarantineStore, pairs) -> dict:
    """Remove healed (url, seq) records from the DLQ — the closing half of
    a retry. Rewrites only delta files containing victims via the atomic
    write path (mirrors :meth:`QuarantineStore.purge_urls`); commit records
    stay (the quarantine DID happen). Idempotent: a re-run finds nothing."""
    want = {(u, int(s)) for u, s in pairs}
    files_rewritten = rows_removed = 0
    for part in range(store.num_partitions):
        for e in store.lake.committed_epochs(part):
            path = store.lake._delta_path(part, e)
            if not store.lake.fs.exists(path):
                continue
            t = pq.read_table(path, filesystem=store.lake.fs)
            mask = [(u, int(s)) in want
                    for u, s in zip(t["url"].to_pylist(),
                                    t["seq"].to_pylist())]
            hits = sum(mask)
            if not hits:
                continue
            store.lake._write_table_atomic(
                t.filter(pc.invert(pa.array(mask))), path)
            files_rewritten += 1
            rows_removed += hits
    return {"files_rewritten": files_rewritten, "rows_removed": rows_removed}


def retry_quarantine(lake: Lake, events_path: str, cfg=None) -> dict:
    """Close the dead-letter loop: re-drive every quarantined event through
    the CURRENT extractor and fold the successes back into the lake as one
    exactly-once maintenance epoch.

    The DLQ stores event COORDINATES (url, warc_ts, seq, error), not
    payloads — the events themselves still sit in the binlog — so the
    retry reads exactly the poisoned seq range back out of the original
    segments (parquet seq predicate + an exact (url, seq) membership
    filter), re-extracts with ``quarantine=True`` (a still-poison payload
    stays diverted, never wedges the retry), and commits each affected
    partition's healed LWW winner set as a DELTA at one maintenance epoch:

    - **LWW safety**: a healed row folds through the normal merge, so if a
      LATER clean event already superseded the poisoned one, the healed
      row loses exactly as if it had extracted cleanly the first time.
    - **exactly-once**: the backfill marker (scoped to the affected
      partitions — ``resolve_backfill_epoch(parts=...)``) + per-(part,
      epoch) commit records make crash/resume idempotent; re-extraction is
      deterministic, so a resumed retry recomputes the same healed set and
      no-ops the committed partitions. The DLQ scrub runs LAST: a crash
      before it re-runs the retry, which re-commits the same values (LWW
      no-op) and then scrubs — convergent.
    - **watermark**: ``mark_epoch_maint`` publishes the epoch so
      changefeed/replication tails and follower indexes fold the healed
      rows as a normal epoch; the writer fence kills zombie binlog tails.

    Driver holds only DLQ-scale state (coordinates of FAILURES — by
    construction vanishingly small next to the corpus; a pathological
    flood should be re-driven by binlog replay instead). Patch-ops lakes
    are refused (healed full images would need the per-column version
    fold). Returns a summary dict."""
    import ray
    import ray.data

    from ..config import CDCConfig
    from ..stages.extract_stage import HtmlExtractor
    from .backfill import resolve_backfill_epoch
    from .ingest import _add_keys
    from .merge import is_internal_col, merge_base_with_updates
    from .retention import _fence_writer

    cfg = cfg or CDCConfig(num_partitions=lake.num_partitions)
    if cfg.patch_ops:
        raise ValueError("retry_quarantine: patch-ops lakes are not "
                         "supported (healed full images would bypass the "
                         "per-column version fold)")
    for part in range(lake.num_partitions):
        epochs = lake.committed_epochs(part)
        if not epochs:
            continue
        res = lake.resolve_data(part, epochs[-1], "snap") \
            or lake.resolve_data(part, epochs[-1], "delta")
        if res is not None:
            sch = pq.read_schema(res[1], filesystem=res[0])
            if any(is_internal_col(n) for n in sch.names):
                raise ValueError("retry_quarantine: patch-ops lake "
                                 "detected (per-column version metadata) "
                                 "— not supported")
        break
    store = QuarantineStore(quarantine_root(lake.root), lake.num_partitions)
    rec = store.read()  # DLQ-scale (failures only) — bounded by design
    if rec is None or rec.num_rows == 0:
        return {"quarantined": 0, "healed": 0, "still_failing": 0,
                "epoch": None}
    pairs = set(zip(rec["url"].to_pylist(),
                    (int(s) for s in rec["seq"].to_pylist())))
    lo = min(s for _, s in pairs)
    hi = max(s for _, s in pairs)
    pairs_ref = ray.put(pairs)

    def keep_poisoned(batch: pa.Table) -> pa.Table:
        want = ray.get(pairs_ref)
        mask = [(u, int(s)) in want
                for u, s in zip(batch["url"].to_pylist(),
                                batch["seq"].to_pylist())]
        return batch.filter(pa.array(mask))

    ds = ray.data.read_parquet(
        events_path,
        filter=(pc.field("seq") >= lo) & (pc.field("seq") <= hi))
    ds = ds.map_batches(keep_poisoned, batch_format="pyarrow")
    ds = ds.map_batches(
        HtmlExtractor,
        fn_constructor_kwargs={"cfg": cfg.extractor,
                               "drop_html": cfg.drop_html_after_extract,
                               "quarantine": True},
        batch_format="pyarrow",
        batch_size=cfg.extract_batch_size,
        concurrency=cfg.extract_concurrency,
        num_cpus=cfg.extract_num_cpus,
    )
    if cfg.derive is not None:  # keep derived columns consistent
        ds = ds.map_batches(cfg.derive, batch_format="pyarrow")
    extracted = ds.materialize()  # DLQ-scale
    still = extracted.map_batches(
        lambda t: t.filter(pc.is_valid(t["extract_error"])),
        batch_format="pyarrow")
    n_still = still.count()
    healed = extracted.map_batches(
        lambda t: t.filter(pc.is_null(t["extract_error"]))
                   .drop_columns(["extract_error"]),
        batch_format="pyarrow")
    keyed = healed.map_batches(_add_keys(cfg), batch_format="pyarrow")
    keyed = keyed.materialize()
    affected = sorted({int(r["part"]) for b in
                       keyed.select_columns(["part"])
                       .iter_batches(batch_format="pyarrow")
                       for r in b.to_pylist()})  # ≤ P ints
    if not affected:
        # nothing heals under the CURRENT extractor — but a prior crashed
        # retry may have left an unfinished scoped marker whose partitions
        # this run no longer touches; close it out or it wedges every
        # later maintenance op (ADVICE r3)
        from .backfill import reconcile_scoped_marker

        closed = reconcile_scoped_marker(lake, "dlq-retry")
        return {"quarantined": len(pairs), "healed": 0,
                "still_failing": int(n_still), "epoch": closed}
    epoch = resolve_backfill_epoch(lake, "dlq-retry", parts=affected)
    _fence_writer(lake, "dlq-retry")
    root, n_parts = lake.root, lake.num_partitions

    class _CommitHealed:
        __name__ = "_CommitHealed"

        def __call__(self, group: pa.Table) -> pa.Table:
            lk = Lake(root, n_parts)
            part = int(group["part"][0].as_py())
            if lk.is_committed(part, epoch):
                return pa.table({"part": pa.array([part], pa.int32()),
                                 "rows": pa.array([0], pa.int64())})
            winners = merge_base_with_updates(
                None, group.drop_columns(["part", "salt"]))
            winners = winners.sort_by([("url", "ascending")])
            seqs = winners["seq"].to_pylist()
            lk.commit_delta(part, epoch, winners, Lineage(
                part=part, epoch=epoch, events_consumed=group.num_rows,
                rows_upserted=winners.num_rows, rows_deleted=0,
                seq_min=min(seqs), seq_max=max(seqs)))
            return pa.table({"part": pa.array([part], pa.int32()),
                             "rows": pa.array([winners.num_rows],
                                              pa.int64())})

    commits = (keyed.groupby("part")
               .map_groups(_CommitHealed(), batch_format="pyarrow")
               .take_all())  # ≤ P tiny rows
    lake.mark_epoch_maint(epoch)
    healed_pairs = [(r["url"], int(r["seq"])) for b in
                    keyed.select_columns(["url", "seq"])
                    .iter_batches(batch_format="pyarrow")
                    for r in b.to_pylist()]  # DLQ-scale
    scrub = scrub_pairs(store, healed_pairs)
    return {"quarantined": len(pairs), "healed": len(healed_pairs),
            "still_failing": int(n_still), "epoch": epoch,
            "partitions_committed": len(commits),
            "dlq_rows_removed": scrub["rows_removed"]}
