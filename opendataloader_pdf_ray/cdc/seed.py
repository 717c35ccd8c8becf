"""Seed a lake from a crawl snapshot (WARC segments) — epoch 0 bootstrap.

The missing first step of the CDC story: production lakes don't start
empty, they start from a crawl snapshot (Common-Crawl-style WARC segments),
then the binlog tail applies changes on top. This runs the SAME pipeline
shape as ingest (read → extractor actor pool → url-hash partition →
per-partition LWW + idempotent commit) over ``sources/warc.read_warc``
rows instead of binlog events:

- **seq synthesis**: WARC records have no binlog offset; the LWW tiebreak
  needs a total order, so ``seq`` is a deterministic 63-bit hash of
  (url, warc_ts) — equal-content crawl re-fetches fold identically on
  every run (no wall-clock, no file order dependence).
- **in-snapshot dedup**: a crawl can fetch a url more than once; the
  standard LWW fold (max (warc_ts, seq)) picks the newest fetch.
- **exactly-once / resumable**: per-(partition, 0) commit records; a
  crashed seed re-run skips finished partitions. ``mark_epoch_done(0)`` is
  written at the end so a binlog tail pointed at the lake resumes at
  epoch 1.

Together with ``export_wet`` this closes the crawl loop: WARC in →
CDC lake (upserts, dedup, quarantine, time travel) → WET out.
"""

from __future__ import annotations

import hashlib
from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import CDCConfig
from .lake import Lake, Lineage
from .merge import ensure_deleted_col, latest_per_key

SEED_EPOCH = 0


def _seed_seq(urls: List[str], ts: List[int]) -> np.ndarray:
    """Deterministic 63-bit seq per (url, warc_ts) — the LWW tiebreak."""
    out = np.empty(len(urls), dtype=np.int64)
    for i, (u, t) in enumerate(zip(urls, ts)):
        d = hashlib.md5(f"{u}\x00{t}".encode("utf-8")).digest()
        out[i] = int.from_bytes(d[:8], "big") & 0x7FFFFFFFFFFFFFFF
    return out


class _SeedPartition:
    """One call per lake partition: LWW-fold the snapshot's rows for this
    partition, commit epoch 0 idempotently."""

    __name__ = "_SeedPartition"

    def __init__(self, root: str, num_partitions: int):
        self.root = root
        self.num_partitions = num_partitions

    def __call__(self, group: pa.Table) -> pa.Table:
        lake = Lake(self.root, self.num_partitions)
        part = int(group["part"][0].as_py())
        if lake.is_committed(part, SEED_EPOCH):
            out = lake.read_lineage(part, SEED_EPOCH)
            out.skipped = True
        else:
            rows = ensure_deleted_col(group.drop_columns(["part"]))
            winners = latest_per_key(rows).sort_by([("url", "ascending")])
            seqs = winners["seq"].to_pylist()
            out = lake.commit_partition(part, SEED_EPOCH, winners, Lineage(
                part=part, epoch=SEED_EPOCH,
                events_consumed=group.num_rows,
                rows_upserted=winners.num_rows, rows_deleted=0,
                seq_min=min(seqs), seq_max=max(seqs), kind="snapshot"))
        return pa.table({
            "part": pa.array([out.part], pa.int32()),
            "rows_upserted": pa.array([out.rows_upserted], pa.int64()),
            "events_consumed": pa.array([out.events_consumed], pa.int64()),
            "skipped": pa.array([out.skipped], pa.bool_()),
        })


def seed_from_warc(warc_paths, lake_root: str,
                   cfg: Optional[CDCConfig] = None) -> List[dict]:
    """Bootstrap ``lake_root`` (epoch 0) from WARC segment file(s)/dir.
    Returns ≤P lineage dicts. The lake is ready for a binlog tail at
    epoch 1 afterwards."""
    from ..sources.warc import read_warc
    from ..stages.extract_stage import HtmlExtractor
    from .ingest import url_partition

    cfg = cfg or CDCConfig()
    lake = Lake(lake_root, cfg.num_partitions)
    ds = read_warc(warc_paths, responses_only=True)

    def to_events(batch: pa.Table) -> pa.Table:
        # WARC-Date (ISO 8601 Z) → timestamp[us]; rows without a parseable
        # date sort first (ts=0) and lose LWW, never crash the seed
        import pandas as pd

        ts = pd.to_datetime(batch["warc_ts"].to_pylist(), utc=True,
                            errors="coerce", format="ISO8601")
        us = (ts.asi8 // 1000)
        us = np.where(ts.isna(), 0, us).astype(np.int64)
        urls = batch["url"].to_pylist()
        return pa.table({
            "url": batch["url"],
            "warc_ts": pa.array(us, pa.int64()).cast(pa.timestamp("us")),
            "seq": pa.array(_seed_seq(urls, us.tolist()), pa.int64()),
            "html": batch["html"],
        })

    ds = ds.map_batches(to_events, batch_format="pyarrow")
    ds = ds.map_batches(
        HtmlExtractor,
        fn_constructor_kwargs={"cfg": cfg.extractor,
                               "drop_html": cfg.drop_html_after_extract,
                               "quarantine": cfg.quarantine_errors},
        batch_format="pyarrow",
        batch_size=cfg.extract_batch_size,
        concurrency=cfg.extract_concurrency,
        num_cpus=cfg.extract_num_cpus,
    )
    if cfg.quarantine_errors or cfg.maintain_dup_index \
            or cfg.maintain_near_index:
        from .ingest import (_maintain_dup_index, _maintain_near_index,
                             _maintain_quarantine)

        ds = ds.materialize()
        if cfg.quarantine_errors:
            ds = _maintain_quarantine(ds, lake, SEED_EPOCH, cfg)
        if cfg.maintain_dup_index:
            _maintain_dup_index(ds, lake, SEED_EPOCH, cfg)
        if cfg.maintain_near_index:
            _maintain_near_index(ds, lake, SEED_EPOCH, cfg)

    def add_part(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_numpy(zero_copy_only=False)
        parts = url_partition(urls, cfg.num_partitions)
        batch = ensure_deleted_col(batch)
        # pre-reduce per batch: ≤1 row per url per block before the shuffle
        batch = batch.append_column("part", pa.array(parts, pa.int32()))
        return latest_per_key(batch, extra_group_col="part")

    ds = ds.map_batches(add_part, batch_format="pyarrow")
    out = ds.groupby("part").map_groups(
        _SeedPartition(lake.root, cfg.num_partitions),
        batch_format="pyarrow").take_all()  # ≤ P tiny rows
    lake.mark_epoch_done(SEED_EPOCH)
    return out
