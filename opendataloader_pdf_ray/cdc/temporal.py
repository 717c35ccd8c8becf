"""Event-time temporal join: enrich one lake's change feed with another
lake's state AS OF each change's event time (the Flink "temporal table
join" / Debezium stream-enrichment shape, re-expressed over this engine's
commit-log lakes).

For every change row the SRC lake's feed emits (``cdc/changefeed.py``
semantics: insert/update/delete classified against the pre-image), attach
the DIM lake's payload columns from the version that was CURRENT at the
change's ``warc_ts`` — the version with the greatest event time ≤ the
stream row's event time (inclusive: a dim version stamped at exactly the
stream row's time is visible). A matched tombstone, or no version at or
before that time, enriches as NULL (the key did not exist then).

Version timeline discipline: the dim side's history is exactly what its
change log took effect with — the same ``epoch_winners`` rule the change
feed and follower indexes use (cross-epoch LWW-LOSING rows are dropped).
A retroactive out-of-order dim event that lost the fold never became
observable state, so it does not rewrite join history either — this
matches the changelog-driven temporal-table semantics (the enrichment a
consumer reading both feeds live would have computed).

Scale shape — the whole point of requiring co-partitioned lakes: both
lakes key and route by ``url_partition(url) % P``, so when their
partition counts match the join is ONE task per partition with **no
shuffle and no Dataset.join**: each task folds its src partition's feed
(the changefeed machinery) and its dim partition's version history, then
resolves the as-of matches with one ``pd.merge_asof`` (sort + galloping
merge, vectorized). Memory is bounded by one partition's history — the
bound the change feed already accepts. Lakes with different partition
counts are refused (``rescale`` aligns them); a shuffle fallback would
silently turn a serving-class join into an all-to-all exchange.

Ties within one event time: versions are collapsed per (url, warc_ts) to
the max-``seq`` row first — the same total order (warc_ts, seq) the LWW
merge resolves with (``cdc/merge.py``).

Reference parity: no counterpart (single-corpus engine, no lake); the
analog is Flink's ``FOR SYSTEM_TIME AS OF`` join re-expressed over this
commit-log design.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .changefeed import _FeedPartition, _feed_schema, epoch_winners
from .lake import Lake
from .merge import merge_base_with_updates, unify_to_schema

_VERSION_META = ("url", "warc_ts", "seq", "deleted")


def dim_history(lake: Lake, part: int, target: pa.Schema,
                until: Optional[int] = None) -> pa.Table:
    """One partition's effective version timeline: every row that ever
    took effect, in commit order — the concatenation of ``epoch_winners``
    across the partition's epochs (tombstones included, they are
    versions). Collapsed per (url, warc_ts) to the max-seq row (the LWW
    total order within one event time)."""
    state: Optional[pa.Table] = None
    versions: List[pa.Table] = []
    for e in lake.committed_epochs(part):
        if until is not None and e > until:
            break
        w = epoch_winners(lake, part, e, state)
        if w.num_rows:
            versions.append(unify_to_schema(w, target))
        state = merge_base_with_updates(state, w)
    if not versions:
        return target.empty_table()
    hist = pa.concat_tables(versions)
    hist = hist.sort_by([("url", "ascending"), ("warc_ts", "ascending"),
                         ("seq", "ascending")])
    # keep the last row of each (url, warc_ts) run — vectorized
    urls = hist["url"].to_numpy(zero_copy_only=False)
    ts = hist["warc_ts"].cast(pa.int64()).to_numpy()
    last = np.ones(hist.num_rows, bool)
    if hist.num_rows > 1:
        last[:-1] = (urls[:-1] != urls[1:]) | (ts[:-1] != ts[1:])
    return hist.filter(pa.array(last))


def _joined_schema(feed: pa.Schema, dim_target: pa.Schema,
                   cols: List[str], prefix: str) -> pa.Schema:
    fields = list(feed)
    for c in cols:
        fields.append(pa.field(prefix + c, dim_target.field(c).type))
    return pa.schema(fields)


class _TemporalJoinPartition:
    """map_batches(..., batch_size=1) over partition ids: fold the src
    feed and the dim version history for ONE partition, then merge_asof."""

    def __init__(self, src_root: str, dim_root: str, num_partitions: int,
                 cols: List[str], since: int, until: Optional[int],
                 dim_until: Optional[int], src_target: pa.Schema,
                 dim_target: pa.Schema, prefix: str):
        self.src_root, self.dim_root = src_root, dim_root
        self.n = num_partitions
        self.cols, self.prefix = cols, prefix
        self.since, self.until, self.dim_until = since, until, dim_until
        self.src_target, self.dim_target = src_target, dim_target
        self.out_schema = _joined_schema(
            _feed_schema(src_target), dim_target, cols, prefix)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: List[pa.Table] = []
        for part in batch["part"].to_pylist():
            t = self._join_one(int(part))
            if t.num_rows:
                out.append(t)
        if not out:
            return self.out_schema.empty_table()
        return pa.concat_tables(out)

    def _join_one(self, part: int) -> pa.Table:
        import pandas as pd

        feeder = _FeedPartition(self.src_root, self.n, self.since,
                                self.until, self.src_target)
        feed_parts = feeder._feed_one(Lake(self.src_root, self.n), part)
        if not feed_parts:
            return self.out_schema.empty_table()
        feed_schema = _feed_schema(self.src_target)
        feed = pa.concat_tables(
            [unify_to_schema(t, feed_schema) for t in feed_parts])
        hist = dim_history(Lake(self.dim_root, self.n), part,
                           self.dim_target, until=self.dim_until)

        lf = pd.DataFrame({
            "_row": np.arange(feed.num_rows, dtype=np.int64),
            "url": feed["url"].to_numpy(zero_copy_only=False),
            "warc_ts": feed["warc_ts"].cast(pa.int64()).to_numpy(),
        }).sort_values("warc_ts", kind="stable")
        if hist.num_rows:
            rf = pd.DataFrame({
                "url": hist["url"].to_numpy(zero_copy_only=False),
                "warc_ts": hist["warc_ts"].cast(pa.int64()).to_numpy(),
                "_hrow": np.arange(hist.num_rows, dtype=np.int64),
            }).sort_values("warc_ts", kind="stable")
            m = pd.merge_asof(lf, rf, on="warc_ts", by="url",
                              direction="backward")
            hrow = m.sort_values("_row")["_hrow"].to_numpy()
        else:
            hrow = np.full(feed.num_rows, np.nan)
        pos = np.where(np.isnan(hrow), -1, hrow).astype(np.int64)
        # a matched tombstone means the key was absent at that time
        if hist.num_rows:
            dead = pc.fill_null(hist["deleted"], False).to_numpy(
                zero_copy_only=False)
            valid = pos >= 0
            tomb = np.zeros(len(pos), bool)
            tomb[valid] = dead[pos[valid]]
            pos[tomb] = -1
        idx = pa.array(pos, pa.int64(), mask=pos < 0)
        for c in self.cols:
            if hist.num_rows and c in hist.column_names:
                vals = pc.take(hist[c].combine_chunks(), idx)
            else:
                vals = pa.nulls(feed.num_rows,
                                self.dim_target.field(c).type)
            feed = feed.append_column(self.prefix + c, vals)
        return unify_to_schema(feed, self.out_schema)


def temporal_join(src: Lake, dim: Lake, cols: List[str], since: int = -1,
                  until: Optional[int] = None,
                  dim_until: Optional[int] = None,
                  prefix: str = "dim_"):
    """SRC's change feed for epochs in ``(since, until]``, each row
    enriched with DIM's ``cols`` as of the row's event time (columns
    ``<prefix><col>``; NULL when the key had no live dim version then).
    ``dim_until`` caps the dim timeline at an epoch (time-travel the
    dimension). Returns a streaming ``ray.data.Dataset`` — one shuffle-free
    task per partition (see module docstring for why co-partitioning is
    required)."""
    import ray.data as _rd

    if src.num_partitions != dim.num_partitions:
        raise ValueError(
            f"temporal_join requires co-partitioned lakes: src has "
            f"{src.num_partitions} partitions, dim has "
            f"{dim.num_partitions} — rescale one side first "
            f"(a silent shuffle fallback would hide an all-to-all "
            f"exchange at scale)")
    live_src, src_target = src._unified_live(until)
    _, dim_target = dim._unified_live(dim_until)
    if src_target is None:
        return _rd.from_items([])
    if dim_target is None:
        dim_target = pa.schema([pa.field("url", pa.string()),
                                pa.field("warc_ts", pa.int64()),
                                pa.field("seq", pa.int64()),
                                pa.field("deleted", pa.bool_())] +
                               [pa.field(c, pa.string()) for c in cols])
    missing = [c for c in cols if c not in dim_target.names]
    if missing:
        raise ValueError(f"temporal_join: columns {missing} not in the "
                         f"dim lake schema ({dim_target.names})")
    bad = [c for c in cols if c in _VERSION_META]
    if bad:
        raise ValueError(f"temporal_join: {bad} are version-key columns; "
                         f"join payload columns only")
    keep = [c for c in dim_target.names
            if c in set(cols) | set(_VERSION_META)]
    dim_target = pa.schema([dim_target.field(c) for c in keep])
    parts_ds = _rd.from_items([{"part": p} for p in live_src])
    return parts_ds.map_batches(
        _TemporalJoinPartition(src.root, dim.root, src.num_partitions,
                               list(cols), since, until, dim_until,
                               src_target, dim_target, prefix),
        batch_format="pyarrow", batch_size=1)


def follow_temporal_join(src: Lake, dim: Lake, cols: List[str],
                         since: int = -1, poll_interval: float = 0.5,
                         max_idle_polls: Optional[int] = None,
                         stopped=None, align: bool = False,
                         prefix: str = "dim_",
                         consumer: Optional[str] = None):
    """TAIL the temporal join — continuous stream enrichment (the Flink
    temporal-table join in its streaming form): a generator yielding one
    ``(lo_epoch, hi_epoch, dim_until, pa.Table)`` tuple per newly COMPLETED
    src epoch window, each row enriched with the dim lake's as-of state.

    The dim-side watermark is the streaming subtlety. Event times inside a
    src window and the dim lake's commit progress are independent clocks, so
    two contracts are offered:

    - ``align=False`` (default — Flink's *processing-time* temporal join):
      each window joins against the dim timeline as committed AT EMIT TIME;
      the dim epoch used is recorded in the yielded ``dim_until`` (and the
      CLI puts it in the output file name), so every emitted window is
      byte-reproducible by a batch ``temporal_join(since=lo, until=hi,
      dim_until=recorded)`` replay. A dim version that lands later does NOT
      rewrite already-emitted windows. No window is emitted until the dim
      lake has completed at least one epoch (keeps output column types
      stable; waiting polls count as idle).
    - ``align=True`` (the *event-time* join for epoch-aligned lakes — e.g.
      a ``derive``d dim or two tails of the same fan-out binlog): the src
      window is capped at the dim's completed watermark, so window (lo, hi]
      joins with ``dim_until = hi`` exactly. One stalled dim producer
      stalls (never reorders) the join — the same min-watermark rule
      ``follow_fanin`` applies.

    Resume is the caller's via ``since`` (the CLI derives it from output
    file names, mirroring ``changes --follow``), or durable via
    ``consumer``: a named consumer group whose offset (src-lake epochs,
    stored in the src lake's ``_commits/consumers/`` exactly like a
    ``changes`` consumer — the join consumes the same feed timeline) is
    persisted only after the caller's loop RESUMES past the yield, giving
    at-least-once redelivery on crash. Stop conditions match
    ``follow_changes``: ``stopped()`` drains then returns;
    ``max_idle_polls`` consecutive no-progress polls returns."""
    import time as _time

    from .changefeed import consumer_offset, feed_head, \
        store_consumer_offset

    watermark = since
    if consumer is not None:
        watermark = max(watermark, consumer_offset(src, consumer))
    idle = 0
    while True:
        stopping = bool(stopped()) if stopped is not None else False
        hi = watermark
        while src.is_epoch_complete(hi + 1):
            hi += 1
        dim_head = feed_head(dim)
        if align:
            hi = max(min(hi, dim_head), watermark)
        elif dim_head < 0:
            hi = watermark  # wait for the dim lake's first complete epoch
        if hi > watermark:
            dim_until = hi if align else dim_head
            ds = temporal_join(src, dim, cols, since=watermark, until=hi,
                               dim_until=dim_until, prefix=prefix)
            batches = [b for b in ds.iter_batches(batch_format="pyarrow")
                       if b.num_rows]
            if batches:
                table = pa.concat_tables(batches).sort_by(
                    [("epoch", "ascending"), ("part", "ascending"),
                     ("url", "ascending"), ("seq", "ascending")])
                yield watermark, hi, dim_until, table
                # reached only when the consumer resumed us past the
                # yield: the window is processed, the offset may advance
            if consumer is not None:
                store_consumer_offset(src, consumer, hi)
            watermark = hi
            idle = 0
        else:
            idle += 1
        if stopping and hi == watermark:
            return
        if max_idle_polls is not None and idle >= max_idle_polls:
            return
        _time.sleep(poll_interval)
