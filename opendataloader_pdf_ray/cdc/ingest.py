"""The CDC ingest pipeline — binlog/WAL tail → copy-on-write lake upsert.

Per checkpoint epoch (micro-batch, SURVEY.md §2.9), the Ray Data pipeline is
(SURVEY.md §7.1):

    read_parquet(events, filter = seq ∈ epoch)          [pruned read]
      → map_batches(HtmlExtractor, actor pool)          [html → text+blocks,
                                                         html column dropped]
      → map_batches(add_keys)                            [part, salt, counters]
      → map_batches(combiner LWW)                        [per-batch pre-reduce:
                                                         ≤1 row per url per block]
      → groupby(part, salt).map_groups(LWW)              [SHUFFLE 1 — salted
                                                         local merge, ≤S rows/url]
      → groupby(part).map_groups(apply+commit)           [SHUFFLE 2 — merge with
                                                         base partition, CoW write,
                                                         idempotent commit]
      → lineage rows (small)                              [driver]

The LWW reduce is commutative/associative so the three merge phases compose
exactly (see merge.py). Hot-key skew: the combiner bounds any url's rows at
one per input block, and the salted phase bounds shuffle-2 input at S rows per
url (SURVEY.md §4 "Skew").
"""

from __future__ import annotations

from typing import Callable, List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from ..config import CDCConfig
from ..stages.extract_stage import (HtmlExtractor, pack_blocks,
                                    unpack_blocks)
from .lake import Lake, Lineage
from .merge import (
    DELETED_COL,
    ensure_deleted_col,
    fold_events,
    latest_per_key,
    merge_base_with_updates,
    merge_base_with_updates_patch,
    merge_states,
)

_LINEAGE_AGGS = {"n_events": "sum", "seq_lo": "min", "seq_hi": "max"}
_HELPER_COLS = ["part", "salt", "n_events", "seq_lo", "seq_hi"]


class _ExtractBatch:
    """Tasks-mode extract: a plain per-batch callable (no actor pool).
    The stdlib extractor's construction is ~0.6 ms (compiled config, no
    model), so re-constructing per batch is free while skipping the actor
    pool's per-pipeline spin-up (~1.3 s at 8 CPUs) — the right mode for a
    streaming tail's micro-epochs (``CDCConfig.extract_mode``). A backend
    that genuinely loads state (hybrid HTTP client, a model) must keep
    actor mode. Output is byte-identical either way (the extractor is a
    pure function of the batch)."""

    def __init__(self, cfg: CDCConfig):
        self.kwargs = {"cfg": cfg.extractor,
                       "drop_html": cfg.drop_html_after_extract,
                       "quarantine": cfg.quarantine_errors}
        self.derive = None  # derive runs as its own stage, unchanged

    def __call__(self, batch: pa.Table) -> pa.Table:
        return HtmlExtractor(**self.kwargs)(batch)


def _extract_stage(ds: "ray.data.Dataset", cfg: CDCConfig,
                   pool=None) -> "ray.data.Dataset":
    """The extractor stage, per ``cfg.extract_mode``: ``"actors"`` (default
    — stateful pool, setup once per actor), ``"tasks"`` (stateless
    map_batches; tail micro-epochs where pool spin-up dominates), or
    ``"pool"`` (PERSISTENT named-actor pool shared across pipelines —
    tail micro-epochs with a model-backed extractor; see
    stages/extract_pool.py)."""
    if cfg.extract_mode == "tasks":
        return ds.map_batches(_ExtractBatch(cfg), batch_format="pyarrow",
                              batch_size=cfg.extract_batch_size)
    if cfg.extract_mode == "pool":
        from ..stages.extract_pool import PoolRouter, _pool_names
        names = pool.names if pool is not None else _pool_names(cfg, "")
        # router tasks are near-free waiters: the CPU work happens in the
        # long-lived pool actors (which hold their own reservation)
        return ds.map_batches(PoolRouter(names), batch_format="pyarrow",
                              batch_size=cfg.pool_call_batch_size,
                              num_cpus=0.1)
    return ds.map_batches(
        HtmlExtractor,
        fn_constructor_kwargs={"cfg": cfg.extractor,
                               "drop_html": cfg.drop_html_after_extract,
                               "quarantine": cfg.quarantine_errors},
        batch_format="pyarrow",
        batch_size=cfg.extract_batch_size,
        concurrency=cfg.extract_concurrency,
        num_cpus=cfg.extract_num_cpus,
    )


def _writer_owner(role: str) -> str:
    """Ops-plane writer identity for fencing tokens (host:pid:role) —
    metadata only, never influences data bytes."""
    import os as _os
    import socket as _socket

    return f"{_socket.gethostname()}:{_os.getpid()}:{role}"


def dup_index_root(lake_root: str) -> str:
    """The fingerprint keyspace lives INSIDE the lake root (one deployment
    unit, shared fsspec credentials) but under its own commit log — the main
    lake's part=* globbing and fsck never descend into it."""
    return lake_root.rstrip("/") + "/fpindex"


def _maintain_dup_index(ds, lake: Lake, epoch: int, cfg: CDCConfig):
    """Fork the (materialized) extracted stream into the fp keyspace: one
    slim shuffle of (fp, url, warc_ts, seq) rows, exactly-once per
    (fp_part, epoch) — see cdc/dupindex.py."""
    from .dupindex import DupIndex

    index = DupIndex(dup_index_root(lake.root),
                     cfg.dup_index_partitions or cfg.num_partitions,
                     commit_mode=cfg.dup_index_commits)
    return index.update(ds, epoch)


def near_index_root(lake_root: str) -> str:
    """The SimHash band keyspace — same in-lake placement rationale as
    :func:`dup_index_root`."""
    return lake_root.rstrip("/") + "/nearidx"


def _maintain_near_index(ds, lake: Lake, epoch: int, cfg: CDCConfig):
    """Fork the (materialized) extracted stream into the SimHash band
    keyspace: nbands slim rows per content version, exactly-once per
    (fp_part, epoch) — see cdc/neardup.py."""
    from .neardup import NearDupIndex

    index = NearDupIndex(near_index_root(lake.root),
                         cfg.near_index_partitions or cfg.num_partitions,
                         commit_mode=cfg.near_index_commits,
                         max_hamming=cfg.near_index_max_hamming,
                         ngram=cfg.near_index_ngram)
    return index.update(ds, epoch)


def _maintain_quarantine(ds, lake: Lake, epoch: int, cfg: CDCConfig):
    """Fork the (materialized) extracted stream's poison rows into the DLQ
    keyspace (see cdc/quarantine.py), then return the CLEAN stream with the
    error column dropped — the merge never sees a failed extraction, so the
    lake keeps each url's previous good version."""
    from .quarantine import QuarantineStore, quarantine_root

    store = QuarantineStore(quarantine_root(lake.root), cfg.num_partitions)
    store.update(ds, epoch)

    def clean(batch: pa.Table) -> pa.Table:
        good = batch.filter(pc.is_null(batch["extract_error"]))
        return good.drop_columns(["extract_error"])

    return ds.map_batches(clean, batch_format="pyarrow")


def _auto_compact(lake: Lake, cfg: CDCConfig) -> int:
    """Streaming-tail compaction policy (``CDCConfig.auto_compact_chain``):
    re-materialize any partition whose delta chain exceeds the threshold —
    bounds merge-on-read amplification on long tails. Distributed (one task
    per hot partition), idempotent, and history-preserving (compact never
    removes files; vacuum stays a manual op because reclaiming snapshots is
    a time-travel policy decision, not a performance one)."""
    if cfg.auto_compact_chain is None:
        return 0
    hot = [p for p, chain in lake.delta_chains().items()
           if chain > cfg.auto_compact_chain]
    if not hot:
        return 0
    return lake.compact_distributed(hot)


def _guard_cdc_epoch(lake: Lake, part: int, epoch: int) -> "Lineage":
    """Loud-fail when a CDC epoch number reaches a MAINTENANCE commit: a
    backfill claims epoch max+1, which on a live tail is exactly the next
    binlog epoch — silently 'skipping' it would drop those events. Raising
    here turns the collision into an operator error with a fix (quiesce the
    tail around backfills, or pass ``backfill(epoch=)`` beyond the binlog's
    epoch space)."""
    lin = lake.read_lineage(part, epoch)
    if lin.kind in ("backfill", "rescale", "retention", "restore"):
        raise RuntimeError(
            f"CDC epoch {epoch} collides with a {lin.kind} commit on "
            f"partition {part}: the binlog reached a maintenance epoch. "
            f"Quiesce the tail around maintenance ops, resume a rescaled "
            f"tail at epoch {epoch + 1}, or give backfill() an explicit "
            f"epoch beyond the binlog's epoch space.")
    return lin


def url_partition(urls, num_partitions: int) -> np.ndarray:
    """Deterministic url→partition hash (process-independent: pandas
    hash_array uses a fixed key, unlike Python's salted hash())."""
    codes = pd.util.hash_array(np.asarray(urls, dtype=object), categorize=False)
    return (codes % np.uint64(num_partitions)).astype(np.int32)


def _add_keys(cfg: CDCConfig, with_epoch: bool = False) -> Callable[[pa.Table], pa.Table]:
    def fn(batch: pa.Table) -> pa.Table:
        batch = ensure_deleted_col(batch)
        if "op" in batch.column_names and not cfg.patch_ops:
            # plain LWW: op is redundant once `deleted` is derived. With
            # patch_ops the op column RIDES THE SHUFFLE — the apply phase
            # needs it to tell sparse patches from full images.
            batch = batch.drop_columns(["op"])
        urls = batch["url"].to_numpy(zero_copy_only=False)
        seq = batch["seq"].to_numpy(zero_copy_only=False)
        part = url_partition(urls, cfg.num_partitions)
        salt = (seq % cfg.num_salts).astype(np.int32)
        batch = (
            batch.append_column("part", pa.array(part, pa.int32()))
            .append_column("salt", pa.array(salt, pa.int32()))
            .append_column("n_events", pa.array(np.ones(len(seq), np.int64)))
            .append_column("seq_lo", pa.array(seq, pa.int64()))
            .append_column("seq_hi", pa.array(seq, pa.int64()))
        )
        if with_epoch:
            batch = batch.append_column(
                "epoch", pa.array((seq // cfg.epoch_size).astype(np.int32)))
        return batch

    return fn


def _combine(batch: pa.Table) -> pa.Table:
    # fold_events IS latest_per_key when the batch carries no op column /
    # no 'P' rows (the plain-LWW hot path); with patches it keeps the
    # latest full image + newer patch rows per url (see merge.fold_events)
    return fold_events(batch, aggs=_LINEAGE_AGGS)


def _combine_by_epoch(batch: pa.Table) -> pa.Table:
    return fold_events(batch, aggs=_LINEAGE_AGGS, extra_group_col="epoch")


def _null_patch_derived(batch: pa.Table) -> pa.Table:
    """Patch rows (op='P') with a null html payload mean "keep the extracted
    content" — but the extractor emits non-null zeros (n_blocks=0,
    replacement_ratio=0.0) for null html, which column-wise LWW would read
    as DEFINED and clobber the base. Null them out on content-less patches
    (text is null exactly when html was null — the extractor always returns
    a string for real html)."""
    if "op" not in batch.column_names:
        return batch
    contentless = pc.and_(pc.equal(batch["op"], pa.scalar("P")),
                          pc.is_null(batch["text"]))
    for col in ("n_blocks", "replacement_ratio"):
        if col in batch.column_names:
            idx = batch.column_names.index(col)
            typ = batch.schema.field(col).type
            batch = batch.set_column(
                idx, col,
                pc.if_else(contentless, pa.nulls(batch.num_rows, typ),
                           batch[col]))
    return batch


def _patch_lineage_counts(winners: pa.Table) -> "tuple[int, int]":
    """(rows_upserted, rows_deleted) for a patch-aware winner set, which may
    keep several rows per url: the per-url outcome is the max-version row's
    tombstone flag (patches carry deleted=false — a patch implies
    existence)."""
    finals = latest_per_key(
        winners.select(["url", "warc_ts", "seq", DELETED_COL]))
    rows_deleted = int(pc.sum(finals[DELETED_COL].cast(pa.int64())).as_py() or 0)
    return finals.num_rows - rows_deleted, rows_deleted


class ApplyPartition:
    """Phase-2 merge: one call per lake partition group. Reads the base
    partition (latest committed epoch < this one), applies LWW upserts /
    tombstones, unifies evolved schemas, writes the new partition snapshot and
    the commit record atomically. Safe under Ray task retry: an existing
    commit record turns the call into a no-op that reports ``skipped``."""

    __name__ = "ApplyPartition"  # map_groups wraps plain callables by name

    def __init__(self, lake_root: str, num_partitions: int, epoch: int,
                 commit_mode: str = "snapshot"):
        self.lake_root = lake_root
        self.num_partitions = num_partitions
        self.epoch = epoch
        self.commit_mode = commit_mode  # "snapshot" (CoW) | "delta" (winners only)

    def __call__(self, group: pa.Table) -> pa.Table:
        lake = Lake(self.lake_root, self.num_partitions)
        # lagging producers may still emit a RENAMED column's old name —
        # translate at apply time so events converge into the current
        # column instead of forking a null-backfilled twin (lake.py rename)
        group = lake.apply_renames(group)
        part = int(group["part"][0].as_py())
        events_consumed = int(pc.sum(group["n_events"]).as_py())
        seq_min = int(pc.min(group["seq_lo"]).as_py())
        seq_max = int(pc.max(group["seq_hi"]).as_py())
        updates = group.drop_columns([c for c in _HELPER_COLS if c in group.column_names])
        patched = "op" in updates.column_names
        if patched:
            winners = unpack_blocks(fold_events(updates))
            rows_upserted, rows_deleted = _patch_lineage_counts(winners)
        else:
            winners = unpack_blocks(latest_per_key(updates))
            rows_deleted = int(pc.sum(winners[DELETED_COL].cast(pa.int64())).as_py() or 0)
            rows_upserted = winners.num_rows - rows_deleted
        lineage = Lineage(
            part=part,
            epoch=self.epoch,
            events_consumed=events_consumed,
            rows_upserted=rows_upserted,
            rows_deleted=rows_deleted,
            seq_min=seq_min,
            seq_max=seq_max,
        )
        if lake.is_committed(part, self.epoch):
            out = _guard_cdc_epoch(lake, part, self.epoch)
            out.skipped = True
        elif self.commit_mode == "delta":
            if patched:
                raise RuntimeError(
                    "patch_ops requires snapshot epoch commits: a delta "
                    "file's rows must be full images for the merge-on-read "
                    "fold, and patch rows are sparse by construction")
            # no read-modify-write: the winner set (tombstones included) is
            # the commit; readers fold it merge-on-read (lake.read_partition)
            out = lake.commit_delta(part, self.epoch,
                                    winners.sort_by([("url", "ascending")]),
                                    lineage)
        else:
            base = lake.read_partition(part, as_of=self.epoch - 1,
                                        internal=True)
            merged = merge_base_with_updates_patch(base, winners) if patched \
                else merge_base_with_updates(base, winners)
            out = lake.commit_partition(part, self.epoch, merged, lineage)
        return pa.table(
            {
                "part": pa.array([out.part], pa.int32()),
                "epoch": pa.array([out.epoch], pa.int32()),
                "events_consumed": pa.array([out.events_consumed], pa.int64()),
                "rows_upserted": pa.array([out.rows_upserted], pa.int64()),
                "rows_deleted": pa.array([out.rows_deleted], pa.int64()),
                "seq_min": pa.array([out.seq_min], pa.int64()),
                "seq_max": pa.array([out.seq_max], pa.int64()),
                "skipped": pa.array([out.skipped], pa.bool_()),
            }
        )


class ApplyPartitionBacklog:
    """Backlog-replay variant: one call per partition for a RANGE of epochs.

    The LWW fold is associative, so replaying K epochs needs only ONE shuffle:
    the group arrives with a per-(url, epoch) pre-reduced event set; the task
    folds epochs in order, committing each epoch's snapshot — identical
    state and commit records to K single-epoch pipelines, at 1/K the
    orchestration cost. Already-committed (part, epoch) pairs are trusted
    and loaded instead of recomputed (exactly-once under retry/resume)."""

    __name__ = "ApplyPartitionBacklog"

    def __init__(self, lake_root: str, num_partitions: int, epochs: List[int]):
        self.lake_root = lake_root
        self.num_partitions = num_partitions
        self.epochs = sorted(epochs)

    def __call__(self, group: pa.Table) -> pa.Table:
        lake = Lake(self.lake_root, self.num_partitions)
        group = lake.apply_renames(group)  # lagging-producer rename conv.
        part = int(group["part"][0].as_py())
        out_rows: List[Lineage] = []
        merged = lake.read_partition(part, as_of=self.epochs[0] - 1,
                                     internal=True)
        # Epochs committed before this run (e.g. a prior out-of-order
        # ingest_epoch call left "holes" in the pending range). Their events
        # are filtered out upstream, so their effects live only in their
        # committed snapshots — LWW-merge those snapshots into the fold before
        # passing them, or this run's later commits would silently revert them.
        # LWW is idempotent, so unioning a snapshot that overlaps the fold is
        # always safe.
        pre_committed = sorted(set(lake.committed_epochs(part)))
        prev_epoch = self.epochs[0] - 1
        epoch_arr = group["epoch"].to_numpy(zero_copy_only=False)
        for epoch in self.epochs:
            if any(prev_epoch < c < epoch for c in pre_committed):
                hole_snap = lake.read_partition(part, as_of=epoch - 1,
                                                internal=True)
                if hole_snap is not None:
                    merged = merge_states(merged, hole_snap)
            prev_epoch = epoch
            sub = group.filter(pa.array(epoch_arr == epoch))
            if sub.num_rows == 0:
                continue
            if lake.is_committed(part, epoch):
                # merge (not replace): the crashed-run snapshot may predate
                # epochs this fold already incorporated; LWW union covers both
                snap = lake.read_partition(part, as_of=epoch,
                                           internal=True)
                if snap is not None:
                    merged = merge_states(merged, snap)
                prior = _guard_cdc_epoch(lake, part, epoch)
                prior.skipped = True
                out_rows.append(prior)
                continue
            events_consumed = int(pc.sum(sub["n_events"]).as_py())
            seq_min = int(pc.min(sub["seq_lo"]).as_py())
            seq_max = int(pc.max(sub["seq_hi"]).as_py())
            updates = sub.drop_columns(
                [c for c in _HELPER_COLS + ["epoch"] if c in sub.column_names])
            if "op" in updates.column_names:
                winners = unpack_blocks(fold_events(updates))
                rows_upserted, rows_deleted = _patch_lineage_counts(winners)
                merged = merge_base_with_updates_patch(merged, winners)
            else:
                winners = unpack_blocks(latest_per_key(updates))
                rows_deleted = int(pc.sum(winners[DELETED_COL].cast(pa.int64())).as_py() or 0)
                rows_upserted = winners.num_rows - rows_deleted
                merged = merge_base_with_updates(merged, winners)
            lineage = Lineage(part=part, epoch=epoch,
                              events_consumed=events_consumed,
                              rows_upserted=rows_upserted,
                              rows_deleted=rows_deleted,
                              seq_min=seq_min, seq_max=seq_max)
            out_rows.append(lake.commit_partition(part, epoch, merged, lineage))
        return pa.table({
            "part": pa.array([r.part for r in out_rows], pa.int32()),
            "epoch": pa.array([r.epoch for r in out_rows], pa.int32()),
            "events_consumed": pa.array([r.events_consumed for r in out_rows], pa.int64()),
            "rows_upserted": pa.array([r.rows_upserted for r in out_rows], pa.int64()),
            "rows_deleted": pa.array([r.rows_deleted for r in out_rows], pa.int64()),
            "seq_min": pa.array([r.seq_min for r in out_rows], pa.int64()),
            "seq_max": pa.array([r.seq_max for r in out_rows], pa.int64()),
            "skipped": pa.array([r.skipped for r in out_rows], pa.bool_()),
        })


class ApplyPartitionFinal:
    """Backlog replay with ``backlog_snapshots="final"``: fold the WHOLE
    pending range and write one snapshot + one commit at the last epoch.
    Lineage spans the range (seq_min..seq_max). Exactly-once and resumable at
    partition granularity: a retried/resumed task sees the (part, last-epoch)
    commit and no-ops."""

    __name__ = "ApplyPartitionFinal"

    def __init__(self, lake_root: str, num_partitions: int, epochs: List[int]):
        self.lake_root = lake_root
        self.num_partitions = num_partitions
        self.epochs = sorted(epochs)

    def __call__(self, group: pa.Table) -> pa.Table:
        lake = Lake(self.lake_root, self.num_partitions)
        group = lake.apply_renames(group)  # lagging-producer rename conv.
        part = int(group["part"][0].as_py())
        last = self.epochs[-1]
        events_consumed = int(pc.sum(group["n_events"]).as_py())
        seq_min = int(pc.min(group["seq_lo"]).as_py())
        seq_max = int(pc.max(group["seq_hi"]).as_py())
        if lake.is_committed(part, last):
            out = _guard_cdc_epoch(lake, part, last)
            out.skipped = True
        else:
            updates = group.drop_columns(
                [c for c in _HELPER_COLS + ["epoch"] if c in group.column_names])
            # as_of=last (not epochs[0]-1): a previously committed "hole" epoch
            # inside the pending range lives only in its snapshot — the newest
            # committed snapshot ≤ last is cumulative and captures it (LWW
            # idempotence makes any overlap with the updates harmless)
            base = lake.read_partition(part, as_of=last, internal=True)
            if "op" in updates.column_names:
                winners = unpack_blocks(fold_events(updates))
                rows_upserted, rows_deleted = _patch_lineage_counts(winners)
                merged = merge_base_with_updates_patch(base, winners)
            else:
                winners = unpack_blocks(latest_per_key(updates))
                rows_deleted = int(pc.sum(winners[DELETED_COL].cast(pa.int64())).as_py() or 0)
                rows_upserted = winners.num_rows - rows_deleted
                merged = merge_base_with_updates(base, winners)
            lineage = Lineage(part=part, epoch=last,
                              events_consumed=events_consumed,
                              rows_upserted=rows_upserted,
                              rows_deleted=rows_deleted,
                              seq_min=seq_min, seq_max=seq_max)
            out = lake.commit_partition(part, last, merged, lineage)
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


def num_epochs_in(events_path: str, epoch_size: int) -> int:
    """Max seq from parquet row-group statistics (no data read).
    Handles both a single file and a directory of binlog segments."""
    import pyarrow.dataset as pads

    dset = pads.dataset(events_path, format="parquet")
    max_seq = 0
    for frag in dset.get_fragments():
        meta = frag.metadata
        seq_idx = {meta.schema.column(i).name: i
                   for i in range(meta.num_columns)}["seq"]
        for rg in range(meta.num_row_groups):
            stats = meta.row_group(rg).column(seq_idx).statistics
            if stats is not None and stats.has_min_max:
                max_seq = max(max_seq, stats.max)
    return max_seq // epoch_size + 1


def ingest_epoch(events_path, lake: Lake, epoch: int, cfg: CDCConfig,
                 override_parallelism: Optional[int] = None,
                 commit_epoch: Optional[int] = None,
                 pool=None) -> List[dict]:
    """Run one epoch's micro-batch pipeline; returns lineage dicts.
    ``events_path``: a file/dir path or an explicit list of segment files
    (``follow`` passes the readable set so in-flight segments stay out),
    or an already-built ``ray.data.Dataset`` holding exactly this epoch's
    events (``follow_fanin`` passes the seq-banded union of its sources —
    the caller owns the band filter then). ``commit_epoch`` decouples the
    LAKE epoch this pipeline commits at from the BINLOG epoch whose seq
    band it reads (cooperative-lease tails shift binlog epochs past
    interleaved maintenance epochs — cdc/lease.py); default: same number."""
    ce = epoch if commit_epoch is None else commit_epoch
    if cfg.patch_ops and cfg.epoch_commits == "delta":
        raise ValueError(
            "patch_ops requires snapshot epoch commits (delta files must "
            "hold full images for the merge-on-read fold)")
    n_input_blocks = None
    if isinstance(events_path, ray.data.Dataset):
        ds = events_path
    else:
        lo, hi = epoch * cfg.epoch_size, (epoch + 1) * cfg.epoch_size
        if isinstance(events_path, (list, tuple)):
            # Estimate the read's block count from BYTES, not file count:
            # ray.data.read_parquet splits large files into multiple blocks,
            # so a few big segments gated on len(paths) alone would skip the
            # coalesce and feed many blocks into the partition groupby — the
            # exact pitfall the ~32-block coalesce exists to avoid (ADVICE
            # r4). 64 MB/block is conservative vs the 128 MB default
            # target_max_block_size (parquet→Arrow inflates).
            import os as _os
            try:
                _bytes = sum(_os.path.getsize(p) for p in events_path)
                n_input_blocks = max(len(events_path),
                                     -(-_bytes // (64 << 20)))
            except OSError:
                n_input_blocks = None  # unknown size → keep the coalesce
        ds = ray.data.read_parquet(
            events_path,
            filter=(pc.field("seq") >= lo) & (pc.field("seq") < hi))
    ds = _extract_stage(ds, cfg, pool=pool)
    if cfg.patch_ops:
        ds = ds.map_batches(_null_patch_derived, batch_format="pyarrow")
    if cfg.derive is not None:  # extract-time derived columns (e.g. embed)
        ds = ds.map_batches(cfg.derive, batch_format="pyarrow")
    if cfg.maintain_dup_index or cfg.maintain_near_index \
            or cfg.quarantine_errors:
        # fork point: materialize the extracted stream once so the url
        # keyspace (LWW merge below), the index keyspaces (FWW folds) and
        # the DLQ all consume it without a second extraction pass
        ds = ds.materialize()
        if cfg.quarantine_errors:
            # DLQ first, then hand every OTHER keyspace the clean stream
            # (a cheap filter over the already-materialized blocks — no
            # second materialization, no second extraction)
            ds = _maintain_quarantine(ds, lake, ce, cfg)
        if cfg.maintain_dup_index:
            _maintain_dup_index(ds, lake, ce, cfg)
        if cfg.maintain_near_index:
            _maintain_near_index(ds, lake, ce, cfg)
    if cfg.pack_blocks:
        # transit narrowing: wide struct → per-row zstd'd IPC cell; the
        # apply classes unpack WINNERS before the merge fold (config.py)
        ds = ds.map_batches(pack_blocks, batch_format="pyarrow")
    ds = ds.map_batches(_add_keys(cfg), batch_format="pyarrow")
    ds = ds.map_batches(_combine, batch_format="pyarrow")
    if cfg.salted_merge:
        ds = ds.groupby(["part", "salt"]).map_groups(_combine, batch_format="pyarrow")
    elif cfg.local_merge_blocks and (
            n_input_blocks is None
            or n_input_blocks > cfg.local_merge_blocks):
        # the coalesce bounds the BLOCK count into the partition sort; when
        # the read set is already ≤ that many segments (per-epoch pruned
        # tail polls) the barrier is pure overhead — measured ~2s/epoch of
        # the streaming tail's fixed cost at 8 CPUs
        ds = ds.repartition(cfg.local_merge_blocks).map_batches(
            _combine, batch_format="pyarrow")
    lineage_ds = ds.groupby("part").map_groups(
        ApplyPartition(lake.root, cfg.num_partitions, ce,
                       commit_mode=cfg.epoch_commits), batch_format="pyarrow"
    )
    return lineage_ds.take_all()  # ≤ P tiny rows


def ingest_epochs(events_path: str, lake: Lake, epochs: List[int],
                  cfg: CDCConfig) -> List[dict]:
    """Backlog replay: ALL given epochs in ONE pipeline (one extract pass,
    one salted shuffle, one partition shuffle) with per-epoch fold + commit
    inside the partition task. Equivalent to sequential ingest_epoch calls
    because the LWW merge is associative (property-tested in
    tests/test_cdc_merge.py)."""
    epochs = sorted(epochs)
    lo = epochs[0] * cfg.epoch_size
    hi = (epochs[-1] + 1) * cfg.epoch_size
    ds = ray.data.read_parquet(
        events_path, filter=(pc.field("seq") >= lo) & (pc.field("seq") < hi)
    )
    if len(epochs) < epochs[-1] - epochs[0] + 1:  # holes (already-done epochs)
        done = [e for e in range(epochs[0], epochs[-1] + 1) if e not in set(epochs)]
        expr = None
        for e in done:
            cond = (pc.field("seq") >= e * cfg.epoch_size) & \
                   (pc.field("seq") < (e + 1) * cfg.epoch_size)
            expr = cond if expr is None else expr | cond
        ds = ray.data.read_parquet(
            events_path,
            filter=(pc.field("seq") >= lo) & (pc.field("seq") < hi) & ~expr,
        )
    ds = _extract_stage(ds, cfg)
    if cfg.patch_ops:
        ds = ds.map_batches(_null_patch_derived, batch_format="pyarrow")
    if cfg.derive is not None:  # extract-time derived columns (e.g. embed)
        ds = ds.map_batches(cfg.derive, batch_format="pyarrow")
    if cfg.maintain_dup_index or cfg.maintain_near_index \
            or cfg.quarantine_errors:
        # backlog replay folds the whole pending range as ONE index/DLQ
        # epoch (the last one) — the FWW fold is commutative+idempotent and
        # the DLQ is append-only, so the result is byte-identical to
        # per-epoch folds, and a crashed rerun of the same range hits the
        # same (part, last-epoch) commits
        ds = ds.materialize()
        if cfg.quarantine_errors:
            ds = _maintain_quarantine(ds, lake, epochs[-1], cfg)
        if cfg.maintain_dup_index:
            _maintain_dup_index(ds, lake, epochs[-1], cfg)
        if cfg.maintain_near_index:
            _maintain_near_index(ds, lake, epochs[-1], cfg)
    # "final" snapshot mode may merge across epochs everywhere (no
    # intermediate snapshots to preserve) → ~K× less shuffle payload
    final_mode = cfg.backlog_snapshots == "final"
    combine_fn = _combine if final_mode else _combine_by_epoch
    if cfg.pack_blocks:
        # transit narrowing, backlog path (same contract as ingest_epoch)
        ds = ds.map_batches(pack_blocks, batch_format="pyarrow")
    ds = ds.map_batches(_add_keys(cfg, with_epoch=not final_mode),
                        batch_format="pyarrow")
    ds = ds.map_batches(combine_fn, batch_format="pyarrow")
    if cfg.salted_merge:
        # full salted exchange: guarantees ≤S rows per url into shuffle 2 —
        # the belt-and-braces path for extreme hot-key skew
        ds = ds.groupby(["part", "salt"]).map_groups(combine_fn,
                                                     batch_format="pyarrow")
    elif cfg.local_merge_blocks:
        # coalesce blocks and combine again — bounds per-url rows at the
        # coalesced block count (costs a barrier; see CDCConfig)
        ds = ds.repartition(cfg.local_merge_blocks).map_batches(
            combine_fn, batch_format="pyarrow")
    # Materialize the (already combiner-reduced) stream before the partition
    # shuffle: the sort is a barrier that holds every block in the object
    # store anyway, and cutting the pipeline here releases the extractor actor
    # pool's CPU reservation so the shuffle gets the whole machine. Measured:
    # avoids a pathological stall when pool reservation ≈ total CPUs.
    import os as _os
    import sys as _sys
    import time as _time

    _debug = _os.environ.get("ODL_INGEST_DEBUG")
    _t0 = _time.time()
    ds = ds.materialize()
    if _debug:
        print(f"[ingest] read+extract+combine: {_time.time()-_t0:.1f}s",
              file=_sys.stderr)
    _t1 = _time.time()
    apply_cls = ApplyPartitionFinal if final_mode else ApplyPartitionBacklog
    lineage_ds = ds.groupby("part").map_groups(
        apply_cls(lake.root, cfg.num_partitions, epochs),
        batch_format="pyarrow",
    )
    out = lineage_ds.take_all()
    if _debug:
        print(f"[ingest] shuffle+apply: {_time.time()-_t1:.1f}s", file=_sys.stderr)
    return out


def replay(events_path: str, lake_root: str, cfg: Optional[CDCConfig] = None,
           max_epoch: Optional[int] = None, mode: str = "backlog") -> List[dict]:
    """Replay the event log; resumable: epochs with a done marker are skipped
    outright, partially committed epochs re-run with per-partition
    idempotence. ``mode="backlog"`` (default) runs all pending epochs in one
    pipeline; ``mode="epoch"`` micro-batches one pipeline per epoch (the
    streaming-tail shape). Returns all lineage rows of this run."""
    cfg = cfg or CDCConfig()
    lake = Lake(lake_root, cfg.num_partitions)
    total = num_epochs_in(events_path, cfg.epoch_size)
    if max_epoch is not None:
        total = min(total, max_epoch + 1)
    pending = [e for e in range(total) if not lake.is_epoch_done(e)]
    if not pending:
        return []
    lineage: List[dict] = []
    if mode == "backlog":
        lineage.extend(ingest_epochs(events_path, lake, pending, cfg))
        for epoch in pending:
            lake.mark_epoch_done(epoch)
    else:
        for epoch in pending:
            lineage.extend(ingest_epoch(events_path, lake, epoch, cfg))
            lake.mark_epoch_done(epoch)
            _auto_compact(lake, cfg)
    return lineage


def _log_extent(events_dir: str) \
        -> "tuple[int, int, List[str], dict[str, tuple[int, int]]]":
    """(max_seq, n_rows, readable segment paths, per-path seq extents) of a
    (possibly still-growing) binlog segment dir, from parquet FOOTERS only.
    A segment mid-write has no valid footer yet — it is skipped this poll
    (and kept out of the ingest read set) and picked up on the next one.
    The per-path (min_seq, max_seq) extents let the tail prune the READ SET
    to the segments overlapping each epoch's band — without this, every
    poll's ingest schedules one read task per segment EVER written, which
    at 10^10 events is millions of tasks per micro-epoch."""
    import pyarrow.dataset as pads

    max_seq, n_rows = -1, 0
    paths: List[str] = []
    extents: dict = {}
    try:
        dset = pads.dataset(events_dir, format="parquet")
        fragments = list(dset.get_fragments())
    except Exception:
        # dir missing, or schema inference hit a half-written FIRST segment
        # (pads.dataset reads the first fragment's footer to infer the
        # schema) — treat the whole poll as "nothing readable yet" and retry
        return -1, 0, [], {}
    for frag in fragments:
        try:
            meta = frag.metadata
        except Exception:
            continue  # half-written segment: footer not durable yet
        n_rows += meta.num_rows
        paths.append(frag.path)
        seq_idx = {meta.schema.column(i).name: i
                   for i in range(meta.num_columns)}["seq"]
        lo, hi = None, None
        for rg in range(meta.num_row_groups):
            stats = meta.row_group(rg).column(seq_idx).statistics
            if stats is not None and stats.has_min_max:
                max_seq = max(max_seq, stats.max)
                lo = stats.min if lo is None else min(lo, stats.min)
                hi = stats.max if hi is None else max(hi, stats.max)
        # stats-less file (shouldn't happen — our writers emit them):
        # conservative full-range extent keeps it in every epoch's read set
        extents[frag.path] = (0 if lo is None else int(lo),
                              2**62 if hi is None else int(hi))
    return max_seq, n_rows, sorted(paths), extents


def _paths_for_band(paths: List[str], extents: dict,
                    lo: int, hi: int) -> List[str]:
    """Segments whose seq extent overlaps [lo, hi) — the per-epoch read
    set (footer-pruned; the parquet-level seq filter still applies)."""
    return [p for p in paths
            if extents[p][0] < hi and extents[p][1] >= lo]


def follow(events_dir: str, lake_root: str, cfg: Optional[CDCConfig] = None,
           poll_interval: float = 0.5, stop_marker: str = ".end",
           max_idle_polls: Optional[int] = None,
           followers: Optional[List] = None) -> List[dict]:
    """TAIL a growing binlog segment directory — the streaming half of the
    north rule ("tails a binlog/WAL stream"), built entirely on the existing
    exactly-once machinery: each poll reads only parquet footers, ingests
    every epoch that has become COMPLETE since the last poll, and marks it
    done; a restart (crash, redeploy) resumes from the commit log with
    epoch-done markers skipped outright and partially-committed epochs
    re-run idempotently.

    Epoch completeness is footer-derived and hole-proof: seqs are dense from
    0 (a binlog offset), so epoch e is complete iff ``n_rows >= (e+1)·size``
    AND ``max_seq + 1 == n_rows`` (density — an out-of-order segment arrival
    cannot fake completeness). The final partial epoch is ingested only when
    the producer has placed the ``stop_marker`` file in the directory.
    Arrival timing affects only WHEN an epoch commits, never the final
    state (epoch membership is seq arithmetic) — the determinism invariant.

    ``max_idle_polls`` bounds the wait for tests / batch drains: return
    after that many consecutive polls with no progress — unless the stop
    marker is present while the log still has a hole (a straggler segment
    never became readable), which raises instead of reporting a clean drain
    that silently skipped data. Without ``max_idle_polls`` a post-stop hole
    keeps the tailer polling (visible to operators), never lying.
    Lease-paused polls (cooperative maintenance in flight) do NOT count
    toward ``max_idle_polls`` — they have their own 4× bound so a bounded
    drain cannot abandon a grant it just issued on the ordinary idle
    budget; the stop marker is ignored while paused.

    Single-writer FENCING: the tail acquires the lake's writer token at
    start and re-checks it at every poll, so a zombie tail (wedged, then
    woken after an operator restarted it elsewhere) or a tail racing a
    maintenance op (retention/backfill, which also bump the token) raises
    ``WriterFencedError`` at its next poll instead of double-writing. The
    commit log makes the fenced writer's progress safe to resume.

    ``followers`` (optional): lake-follower indexes (``FollowerIndex`` —
    text/vector keyspaces) refreshed after every poll that commits epochs,
    so indexes stay fresh AS the tail ingests. Each refresh is the
    follower's own exactly-once watermark protocol; a crash between an
    epoch commit and its index refresh is healed by the catch-up refresh
    on the next poll (and on the stop path), so tail + followers resume
    consistently from any interruption.

    ``cfg.extract_mode == "pool"``: the tail owns a PERSISTENT extractor
    actor pool (stages/extract_pool.py) — constructed once here, reused by
    every epoch pipeline across polls (no per-pipeline spin-up), killed on
    exit. A restarted tail re-adopts its pool by name.
    """
    cfg = cfg or CDCConfig()
    pool = None
    if cfg.extract_mode == "pool":
        from ..stages.extract_pool import ExtractPool

        pool = ExtractPool(cfg, lake_root)
    try:
        return _follow_impl(events_dir, lake_root, cfg, poll_interval,
                            stop_marker, max_idle_polls, followers, pool)
    finally:
        if pool is not None:
            pool.shutdown()


def _follow_impl(events_dir: str, lake_root: str, cfg: CDCConfig,
                 poll_interval: float, stop_marker: str,
                 max_idle_polls: Optional[int],
                 followers: Optional[List], pool) -> List[dict]:
    import os as _os
    import time as _time

    lake = Lake(lake_root, cfg.num_partitions)
    # fencing token: a restarted tail (or a non-cooperative maintenance op)
    # bumps the generation, and THIS process dies loudly at its next poll
    # instead of zombie-writing alongside the new owner (lake.acquire_writer)
    fence_tok = lake.acquire_writer(_writer_owner("follow"))
    from .lease import LeaseState

    lease = LeaseState(lake)  # cooperative-maintenance servicing (lease.py)
    lineage: List[dict] = []
    idle = 0
    paused_polls = 0
    was_paused = False
    while True:
        lake.check_writer(fence_tok)
        if lease.poll():
            # cooperative maintenance holds the next lake epoch: stay
            # alive, ingest nothing until its .maint marker lands.
            # Lease-paused polls do NOT count toward max_idle_polls
            # (ADVICE r4: a bounded-idle tail exiting mid-grant would
            # abandon the maintenance handshake it just granted) — they
            # get their own 4× bound so a deliberate bounded drain still
            # terminates; an unbounded tail stays paused forever. The
            # stop marker is likewise ignored while paused: stop is
            # serviced only at an epoch boundary the tail owns.
            was_paused = True
            paused_polls += 1
            if max_idle_polls is not None \
                    and paused_polls >= 4 * max_idle_polls:
                return lineage
            _time.sleep(poll_interval)
            continue
        paused_polls = 0
        if was_paused:
            # resume-from-pause: a granted maintenance epoch just
            # completed. Refresh followers NOW — on an idle stream the
            # next binlog epoch may never come, and the maintenance
            # epoch (e.g. a cooperative embed backfill) must not stay
            # invisible to attached indexes (ADVICE r4).
            for f in (followers or []):
                f.refresh(lake)
            was_paused = False
            idle = 0
        # marker BEFORE extent (TOCTOU guard): the producer contract is
        # "write all segments, then the marker", so sampling the marker
        # first guarantees the extent read afterwards covers everything
        # written before the marker appeared — segments landing between the
        # two calls are simply picked up as usual because stop only returns
        # once every epoch of the post-marker extent is done
        stopping = _os.path.exists(_os.path.join(events_dir, stop_marker))
        max_seq, n_rows, paths, extents = _log_extent(events_dir)
        dense = max_seq + 1 == n_rows
        epochs: List[int] = []
        if max_seq >= 0 and dense:
            n_complete = (max_seq + 1) // cfg.epoch_size
            epochs = list(range(n_complete))
            if stopping and (max_seq + 1) % cfg.epoch_size:
                epochs.append(n_complete)  # final partial epoch
        progressed = False
        for e in epochs:
            if lake.is_epoch_done(lease.lake_epoch(e)):
                continue
            # pass only the readable segments OVERLAPPING this epoch's seq
            # band (footer-pruned): a producer's in-flight (footer-less)
            # file must not enter the read set, and the read-task count
            # stays O(epoch segments), not O(all segments ever written)
            band = _paths_for_band(paths, extents, e * cfg.epoch_size,
                                   (e + 1) * cfg.epoch_size)
            lineage.extend(ingest_epoch(band, lake, e, cfg,
                                        commit_epoch=lease.lake_epoch(e),
                                        pool=pool))
            lake.mark_epoch_done(lease.lake_epoch(e))
            _auto_compact(lake, cfg)
            progressed = True
        if progressed:
            for f in (followers or []):
                f.refresh(lake)
        req = lease.want_grant()
        if req is not None:
            # every currently-complete binlog epoch is done → epoch
            # boundary: reserve the next lake epoch for the maintenance op
            # and pause from the next poll on
            lease.grant(req)
            idle = 0
            _time.sleep(poll_interval)
            continue
        if stopping and (dense or max_seq < 0) \
                and all(lake.is_epoch_done(lease.lake_epoch(e))
                        for e in epochs):
            # catch-up: heal a prior crash between epoch commit and refresh
            for f in (followers or []):
                f.refresh(lake)
            return lineage
        idle = 0 if progressed else idle + 1
        if max_idle_polls is not None and idle >= max_idle_polls:
            if stopping and max_seq >= 0 and not dense:
                # producer said "done", the straggler never completed: a
                # clean return would report a drain that silently skipped
                # data — refuse instead
                raise RuntimeError(
                    f"follow: stop marker present but log is non-dense "
                    f"(max_seq={max_seq}, readable rows={n_rows}) — a "
                    f"segment is missing or unreadable")
            return lineage
        _time.sleep(poll_interval)


class _FaninRemap:
    """Version remap for fan-in: global seq = src_seq * K + source_idx.
    Per-source order is preserved, cross-source versions never collide,
    and a same-(url, warc_ts) tie across sources resolves deterministically
    by (source-local seq, then source index) — the arrival-timing-free total order the LWW merge
    needs. Picklable (rides map_batches into workers)."""

    def __init__(self, k: int, idx: int):
        self.k, self.idx = k, idx

    def __call__(self, batch: pa.Table) -> pa.Table:
        seq = pc.add(pc.multiply(batch["seq"].cast(pa.int64()),
                                 pa.scalar(self.k, pa.int64())),
                     pa.scalar(self.idx, pa.int64()))
        return batch.set_column(batch.column_names.index("seq"), "seq", seq)


def _fanin_guard(lake: Lake, dirs: List[str], epoch_size: int) -> None:
    """Persist/verify the fan-in identity. The seq remap bakes (K, source
    order) into every stored version, so resuming with a different source
    list or epoch size would silently re-version the stream — refused
    loudly instead (delete ``_commits/fanin.json`` only if you know the
    binlog layout genuinely moved)."""
    import json as _json
    import posixpath as _pp

    want = {"sources": list(dirs), "epoch_size": int(epoch_size)}
    path = _pp.join(lake._commits_dir(), "fanin.json")
    if lake.fs.exists(path):
        with lake.fs.open(path, "rb") as f:
            have = _json.loads(f.read().decode())
        if have != want:
            raise ValueError(
                f"follow_fanin: lake was built from sources "
                f"{have['sources']} (epoch_size {have['epoch_size']}), "
                f"got {want['sources']} (epoch_size {want['epoch_size']}) "
                f"— the seq remap is source-list-dependent; resume with "
                f"the original list")
        return
    lake.fs.makedirs(lake._commits_dir(), exist_ok=True)
    lake._write_small_atomic(path, _json.dumps(want).encode())


def follow_fanin(events_dirs: List[str], lake_root: str,
                 cfg: Optional[CDCConfig] = None, poll_interval: float = 0.5,
                 stop_marker: str = ".end",
                 max_idle_polls: Optional[int] = None,
                 followers: Optional[List] = None) -> List[dict]:
    """FAN-IN tail: K independently-growing binlog segment directories
    (crawler shards, Kafka-partition drains, per-region drop dirs) merged
    into ONE lake — the multi-producer half of the north rule, built on the
    same exactly-once machinery as :func:`follow`.

    Alignment rule (deterministic, arrival-timing-free): merged epoch ``e``
    consumes, from every source, exactly the events with source-local
    ``seq`` in ``[e·epoch_size, (e+1)·epoch_size)``. Epoch ``e`` is
    ingestible only when EVERY source has either covered that band (dense
    extent — same footer-only density check as ``follow``) or placed its
    own stop marker (a finished short source contributes a partial or
    empty band) — min-watermark semantics: one stalled producer stalls the
    merge (visibly), it never reorders it. After all sources stop, the
    tail drains through ``max_i ceil(len_i/epoch_size)`` epochs and
    returns.

    Versions: global ``seq = src_seq·K + source_idx`` (sources sorted) —
    per-source order preserved, no cross-source collisions, same-(url,
    warc_ts) races resolve by (source-local seq, then source index). The (K, source order,
    epoch_size) identity is persisted in ``_commits/fanin.json`` and
    verified on resume. Fencing, epoch-done markers, follower refresh,
    straggler-hole refusal: exactly as in :func:`follow` — including
    persistent-pool extract (``cfg.extract_mode == "pool"``).
    """
    cfg = cfg or CDCConfig()
    pool = None
    if cfg.extract_mode == "pool":
        from ..stages.extract_pool import ExtractPool

        pool = ExtractPool(cfg, lake_root)
    try:
        return _follow_fanin_impl(events_dirs, lake_root, cfg,
                                  poll_interval, stop_marker,
                                  max_idle_polls, followers, pool)
    finally:
        if pool is not None:
            pool.shutdown()


def _follow_fanin_impl(events_dirs: List[str], lake_root: str,
                       cfg: CDCConfig, poll_interval: float,
                       stop_marker: str, max_idle_polls: Optional[int],
                       followers: Optional[List], pool) -> List[dict]:
    import math as _math
    import os as _os
    import time as _time

    dirs = sorted(events_dirs)
    if not dirs:
        raise ValueError("follow_fanin: no source directories")
    k = len(dirs)
    lake = Lake(lake_root, cfg.num_partitions)
    _fanin_guard(lake, dirs, cfg.epoch_size)
    fence_tok = lake.acquire_writer(_writer_owner("fanin"))
    size = cfg.epoch_size
    from .lease import LeaseState

    lease = LeaseState(lake)  # cooperative maintenance (cdc/lease.py) —
    # merged-epoch numbering shifts past granted maintenance epochs
    # exactly like the single-source tail
    lineage: List[dict] = []
    idle = 0
    paused_polls = 0
    was_paused = False
    while True:
        lake.check_writer(fence_tok)
        if lease.poll():
            # paused polls never count toward max_idle_polls (own 4×
            # bound) and the stop markers are ignored while paused —
            # same contract as `follow`
            was_paused = True
            paused_polls += 1
            if max_idle_polls is not None \
                    and paused_polls >= 4 * max_idle_polls:
                return lineage
            _time.sleep(poll_interval)
            continue
        paused_polls = 0
        if was_paused:
            for f in (followers or []):
                f.refresh(lake)  # maintenance epoch → index, even if idle
            was_paused = False
            idle = 0
        # marker before extent per source: same TOCTOU contract as follow
        stops = [_os.path.exists(_os.path.join(d, stop_marker))
                 for d in dirs]
        extents = [_log_extent(d) for d in dirs]
        covered: List[float] = []   # epochs fully available per source
        total: List[int] = []       # epochs a STOPPED source drains to
        holes = False
        for (mx, n_rows, _, _), stop_i in zip(extents, stops):
            if mx < 0:  # nothing readable yet
                covered.append(_math.inf if stop_i else 0)
                total.append(0)
                continue
            dense = mx + 1 == n_rows
            if not dense:
                holes = True
                covered.append(0)
                total.append(0)
                continue
            full = (mx + 1) // size
            covered.append(_math.inf if stop_i else full)
            total.append(-(-(mx + 1) // size))  # ceil
        all_stopping = all(stops)
        if all_stopping and not holes:
            n_epochs = max(total) if total else 0
        else:
            ready = min(covered) if covered else 0
            n_epochs = 0 if ready == _math.inf else int(ready)
            if all(c == _math.inf for c in covered):
                n_epochs = 0  # every source stopped empty
        progressed = False
        for e in range(n_epochs):
            if lake.is_epoch_done(lease.lake_epoch(e)):
                continue
            lo, hi = e * size, (e + 1) * size
            parts = []
            for i, (mx, _, paths, exts) in enumerate(extents):
                if not paths or mx < lo:
                    continue  # source ended before this band
                band_paths = _paths_for_band(paths, exts, lo, hi)
                if not band_paths:
                    continue  # no segment overlaps this band
                d = ray.data.read_parquet(
                    band_paths,
                    filter=(pc.field("seq") >= lo) & (pc.field("seq") < hi))
                parts.append(d.map_batches(_FaninRemap(k, i),
                                           batch_format="pyarrow"))
            if not parts:
                lake.mark_epoch_done(lease.lake_epoch(e))  # provably empty
                continue
            ds = parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]
            lineage.extend(ingest_epoch(ds, lake, e, cfg,
                                        commit_epoch=lease.lake_epoch(e),
                                        pool=pool))
            lake.mark_epoch_done(lease.lake_epoch(e))
            _auto_compact(lake, cfg)
            progressed = True
        if progressed:
            for f in (followers or []):
                f.refresh(lake)
        req = lease.want_grant()
        if req is not None:
            lease.grant(req)
            idle = 0
            _time.sleep(poll_interval)
            continue
        if all_stopping and not holes \
                and all(lake.is_epoch_done(lease.lake_epoch(e))
                        for e in range(n_epochs)):
            for f in (followers or []):
                f.refresh(lake)  # heal a crash between commit and refresh
            return lineage
        idle = 0 if progressed else idle + 1
        if max_idle_polls is not None and idle >= max_idle_polls:
            if holes and any(stops):
                raise RuntimeError(
                    "follow_fanin: stop marker present but a source log is "
                    "non-dense — a segment is missing or unreadable")
            return lineage
        _time.sleep(poll_interval)
