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
from ..stages.extract_stage import HtmlExtractor
from .lake import Lake, Lineage
from .merge import (
    DELETED_COL,
    ensure_deleted_col,
    latest_per_key,
    merge_base_with_updates,
)

_LINEAGE_AGGS = {"n_events": "sum", "seq_lo": "min", "seq_hi": "max"}
_HELPER_COLS = ["part", "salt", "n_events", "seq_lo", "seq_hi"]


def url_partition(urls, num_partitions: int) -> np.ndarray:
    """Deterministic url→partition hash (process-independent: pandas
    hash_array uses a fixed key, unlike Python's salted hash())."""
    codes = pd.util.hash_array(np.asarray(urls, dtype=object), categorize=False)
    return (codes % np.uint64(num_partitions)).astype(np.int32)


def _add_keys(cfg: CDCConfig) -> Callable[[pa.Table], pa.Table]:
    def fn(batch: pa.Table) -> pa.Table:
        batch = ensure_deleted_col(batch)
        if "op" in batch.column_names:
            batch = batch.drop_columns(["op"])
        urls = batch["url"].to_numpy(zero_copy_only=False)
        seq = batch["seq"].to_numpy(zero_copy_only=False)
        part = url_partition(urls, cfg.num_partitions)
        salt = (seq % cfg.num_salts).astype(np.int32)
        return (
            batch.append_column("part", pa.array(part, pa.int32()))
            .append_column("salt", pa.array(salt, pa.int32()))
            .append_column("n_events", pa.array(np.ones(len(seq), np.int64)))
            .append_column("seq_lo", pa.array(seq, pa.int64()))
            .append_column("seq_hi", pa.array(seq, pa.int64()))
        )

    return fn


def _combine(batch: pa.Table) -> pa.Table:
    return latest_per_key(batch, aggs=_LINEAGE_AGGS)


class ApplyPartition:
    """Phase-2 merge: one call per lake partition group. Reads the base
    partition (latest committed epoch < this one), applies LWW upserts /
    tombstones, unifies evolved schemas, writes the new partition snapshot and
    the commit record atomically. Safe under Ray task retry: an existing
    commit record turns the call into a no-op that reports ``skipped``."""

    __name__ = "ApplyPartition"  # map_groups wraps plain callables by name

    def __init__(self, lake_root: str, num_partitions: int, epoch: int):
        self.lake_root = lake_root
        self.num_partitions = num_partitions
        self.epoch = epoch

    def __call__(self, group: pa.Table) -> pa.Table:
        lake = Lake(self.lake_root, self.num_partitions)
        part = int(group["part"][0].as_py())
        events_consumed = int(pc.sum(group["n_events"]).as_py())
        seq_min = int(pc.min(group["seq_lo"]).as_py())
        seq_max = int(pc.max(group["seq_hi"]).as_py())
        updates = group.drop_columns([c for c in _HELPER_COLS if c in group.column_names])
        winners = latest_per_key(updates)
        rows_deleted = int(pc.sum(winners[DELETED_COL].cast(pa.int64())).as_py() or 0)
        lineage = Lineage(
            part=part,
            epoch=self.epoch,
            events_consumed=events_consumed,
            rows_upserted=winners.num_rows - rows_deleted,
            rows_deleted=rows_deleted,
            seq_min=seq_min,
            seq_max=seq_max,
        )
        if lake.is_committed(part, self.epoch):
            out = lake.read_lineage(part, self.epoch)
            out.skipped = True
        else:
            base = lake.read_partition(part, as_of=self.epoch - 1)
            merged = merge_base_with_updates(base, winners)
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


def num_epochs_in(events_path: str, epoch_size: int) -> int:
    """Max seq from parquet row-group statistics (no data read)."""
    meta = pq.ParquetFile(events_path).metadata
    seq_idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}["seq"]
    max_seq = 0
    for rg in range(meta.num_row_groups):
        stats = meta.row_group(rg).column(seq_idx).statistics
        if stats is not None and stats.has_min_max:
            max_seq = max(max_seq, stats.max)
    return max_seq // epoch_size + 1


def ingest_epoch(events_path: str, lake: Lake, epoch: int, cfg: CDCConfig,
                 override_parallelism: Optional[int] = None) -> List[dict]:
    """Run one epoch's micro-batch pipeline; returns lineage dicts."""
    lo, hi = epoch * cfg.epoch_size, (epoch + 1) * cfg.epoch_size
    ds = ray.data.read_parquet(
        events_path, filter=(pc.field("seq") >= lo) & (pc.field("seq") < hi)
    )
    ds = ds.map_batches(
        HtmlExtractor,
        fn_constructor_kwargs={"cfg": cfg.extractor,
                               "drop_html": cfg.drop_html_after_extract},
        batch_format="pyarrow",
        batch_size=cfg.extract_batch_size,
        concurrency=cfg.extract_concurrency,
    )
    ds = ds.map_batches(_add_keys(cfg), batch_format="pyarrow")
    ds = ds.map_batches(_combine, batch_format="pyarrow")
    if cfg.salted_merge:
        ds = ds.groupby(["part", "salt"]).map_groups(_combine, batch_format="pyarrow")
    lineage_ds = ds.groupby("part").map_groups(
        ApplyPartition(lake.root, cfg.num_partitions, epoch), batch_format="pyarrow"
    )
    return lineage_ds.take_all()  # ≤ P tiny rows


def replay(events_path: str, lake_root: str, cfg: Optional[CDCConfig] = None,
           max_epoch: Optional[int] = None) -> List[dict]:
    """Replay the event log epoch by epoch; resumable: epochs with a done
    marker are skipped outright, partially committed epochs re-run with
    per-partition idempotence. Returns all lineage rows of this run."""
    cfg = cfg or CDCConfig()
    lake = Lake(lake_root, cfg.num_partitions)
    total = num_epochs_in(events_path, cfg.epoch_size)
    if max_epoch is not None:
        total = min(total, max_epoch + 1)
    lineage: List[dict] = []
    for epoch in range(total):
        if lake.is_epoch_done(epoch):
            continue
        lineage.extend(ingest_epoch(events_path, lake, epoch, cfg))
        lake.mark_epoch_done(epoch)
    return lineage
