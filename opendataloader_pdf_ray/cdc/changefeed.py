"""Row-level change feed out of the lake (CDC *downstream*: the lake as a
binlog for consumers — materialized-view refreshers, search indexers,
replication targets).

``changes(lake, since, until)`` returns a streaming ``ray.data.Dataset`` of
per-url change rows with an ``op`` classification computed against the
PRE-IMAGE state:

- ``insert``  — url was absent (or tombstoned) before this epoch, now live
- ``update``  — url was live before, still live with new content
- ``delete``  — url was live before, this epoch tombstones it

(An epoch's tombstone for a url with no live pre-image is a no-op for
consumers and is not emitted.)

Scale shape (mirrors ``Lake.read_dataset``): ONE task per partition — the
unit of parallelism and the memory bound. Each task folds its partition's
pre-image as of ``since``, then walks epochs in order, classifying each
epoch's winner set against the running state vectorized (numpy membership
on url arrays, no per-row Python). Nothing lake-sized touches the driver;
the feed streams out through the Dataset.

Epoch winner sets come from:
- the epoch's DELTA file (delta-mode commits) — exact winner set, or
- for SNAPSHOT-kind commits (CoW epochs, backfills, retention), the diff of
  the snapshot against the running state — rows whose (warc_ts, seq,
  deleted) changed (``deleted`` included so retention's tombstone flips
  surface as deletes even though they mint no new version key).

Raises when a needed file was vacuumed: a feed over reclaimed history would
be silently incomplete, and explicit failure ("re-seed the consumer from a
snapshot read") is the correct CDC semantics.

Scope note: the feed is CDC-EVENT-level. Maintenance snapshot commits that
keep every (warc_ts, seq) unchanged — a ``backfill`` rewriting derived
columns — do not surface as changes (the snapshot diff keys on the event
coordinates, not on derived values); consumers that project derived columns
re-read the lake after a backfill. A ``rescale``'s initial snapshot feeds
as inserts against the new lake's empty pre-image, which is exactly what a
consumer re-seeding from the new deployment wants.

Reference parity note: the reference engine has no lake, so no counterpart;
this is the Ray-native completion of the CDC story (ingest IN via
``cdc/ingest.py``, changes OUT here).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .lake import Lake
from .merge import merge_base_with_updates, unified_schema, unify_to_schema

_META_COLS = ("url", "warc_ts", "seq", "deleted")


def _feed_schema(payload: pa.Schema,
                 before: Optional[List[str]] = None) -> pa.Schema:
    fields = [pa.field("part", pa.int32()), pa.field("epoch", pa.int64()),
              pa.field("op", pa.string())]
    for f in payload:
        if f.name != "deleted":
            fields.append(f)
    for c in before or ():
        fields.append(pa.field(f"before_{c}", payload.field(c).type))
    return pa.schema(fields)


def _classify(winners: pa.Table, live_urls) -> pa.Table:
    """op per winner row against the pre-image live index; drops no-op
    deletes. Vectorized: one hashed membership pass over the url column
    (pandas Index.isin), no per-row Python."""
    import pandas as pd

    urls = winners["url"].to_numpy(zero_copy_only=False)
    was_live = pd.Index(urls).isin(live_urls)
    if "deleted" in winners.column_names:
        dead = pc.fill_null(winners["deleted"], False).to_numpy(
            zero_copy_only=False)
    else:
        dead = np.zeros(len(urls), bool)
    op = np.where(dead, "delete", np.where(was_live, "update", "insert"))
    keep = ~(dead & ~was_live)  # tombstone of a never-live url: no-op
    out = winners.append_column("op", pa.array(op, pa.string()))
    return out.filter(pa.array(keep))


class _FeedPartition:
    """map_batches(_FeedPartition(...), batch_size=1) over partition ids."""

    def __init__(self, root: str, num_partitions: int, since: int,
                 until: Optional[int], target: pa.Schema,
                 before: Optional[List[str]] = None,
                 min_ts: Optional[int] = None, max_ts: Optional[int] = None):
        self.root, self.n = root, num_partitions
        self.since, self.until = since, until
        self.target = target
        self.before = before
        self.min_ts, self.max_ts = min_ts, max_ts

    def __call__(self, batch: pa.Table) -> pa.Table:
        lake = Lake(self.root, self.n)
        out: List[pa.Table] = []
        for part in batch["part"].to_pylist():
            out.extend(self._feed_one(lake, int(part)))
        schema = _feed_schema(self.target, self.before)
        if not out:
            return schema.empty_table()
        return pa.concat_tables([unify_to_schema(t, schema) for t in out])

    @staticmethod
    def _live_index(state: Optional[pa.Table]):
        import pandas as pd

        if state is None or state.num_rows == 0:
            return pd.Index([])
        dead = pc.fill_null(state["deleted"], False).to_numpy(
            zero_copy_only=False)
        return pd.Index(np.asarray(
            state["url"].to_numpy(zero_copy_only=False))[~dead])

    def _ts_overlaps(self, lake: Lake, part: int, epoch: int) -> bool:
        """Event-time zone-map check: False only when the commit record
        PROVES no row of this epoch lies in [min_ts, max_ts] (records
        without ts_range — older lakes, follower keyspaces — must be
        processed)."""
        if self.min_ts is None and self.max_ts is None:
            return True
        rng = lake._read_commit(part, epoch).get("ts_range")
        if rng is None:
            return True
        lo, hi = int(rng[0]), int(rng[1])
        return not ((self.max_ts is not None and lo > self.max_ts)
                    or (self.min_ts is not None and hi < self.min_ts))

    def _ts_filter(self, feed: pa.Table) -> pa.Table:
        """Row-level event-time window on the classified change rows."""
        if self.min_ts is None and self.max_ts is None:
            return feed
        ts = feed["warc_ts"]
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        keep = pa.array(np.ones(feed.num_rows, bool))
        if self.min_ts is not None:
            keep = pc.and_(keep, pc.greater_equal(ts, self.min_ts))
        if self.max_ts is not None:
            keep = pc.and_(keep, pc.less_equal(ts, self.max_ts))
        return feed.filter(keep)

    def _feed_one(self, lake: Lake, part: int) -> List[pa.Table]:
        epochs = [e for e in lake.committed_epochs(part) if e > self.since
                  and (self.until is None or e <= self.until)]
        if not epochs:
            return []
        overlap = {e for e in epochs if self._ts_overlaps(lake, part, e)}
        if not overlap:
            return []  # zone-map prune: no file of this partition is read
        # epochs before the first overlapping one contribute only pre-image
        # state — fold them in ONE merge-on-read read instead of walking
        # (on a compacted lake this touches the newest snapshot + tail
        # deltas, not the history)
        e0 = min(overlap)
        walk = [e for e in epochs if e >= e0]
        state = lake.read_partition(part, as_of=e0 - 1)
        live = self._live_index(state)
        out: List[pa.Table] = []
        for e in walk:
            winners = self._winners(lake, part, e, state)
            feed = _classify(winners, live) if e in overlap \
                else _feed_schema(self.target, None).empty_table()
            feed = self._ts_filter(feed)
            if feed.num_rows:
                n = feed.num_rows
                feed = pa.table({
                    "part": pa.array(np.full(n, part, np.int32)),
                    "epoch": pa.array(np.full(n, e, np.int64)),
                    "op": feed["op"],
                    **{c: feed[c] for c in feed.column_names
                       if c not in ("op", "deleted")},
                })
                if self.before:
                    feed = _attach_before(feed, state, self.before)
                out.append(feed)
            # fold this epoch into the running pre-image
            state = merge_base_with_updates(state, winners)
            live = self._live_index(state)
        return out

    def _winners(self, lake: Lake, part: int, epoch: int,
                 state: Optional[pa.Table]) -> pa.Table:
        return epoch_winners(lake, part, epoch, state)


def _attach_before(feed: pa.Table, state: Optional[pa.Table],
                   cols: List[str]) -> pa.Table:
    """Debezium-style BEFORE image: for each feed row, the pre-image LIVE
    value of each requested payload column as ``before_<col>`` (null on
    inserts — absent or tombstoned pre-image). Vectorized: one hashed
    indexer over the pre-image urls, then an Arrow take per column."""
    import pandas as pd

    urls = feed["url"].to_numpy(zero_copy_only=False)
    if state is None or state.num_rows == 0:
        pos = np.full(len(urls), -1, np.int64)
        live = None
    else:
        dead = pc.fill_null(state["deleted"], False).to_numpy(
            zero_copy_only=False)
        live = state.filter(pa.array(~dead))
        pos = pd.Index(
            live["url"].to_numpy(zero_copy_only=False)).get_indexer(urls)
    idx = pa.array(pos, pa.int64(), mask=pos < 0)
    for c in cols:
        if live is not None and c in live.column_names:
            vals = pc.take(live[c].combine_chunks(), idx)
        else:  # empty pre-image, or the column postdates it (evolution)
            typ = feed.schema.field(c).type if c in feed.column_names \
                else pa.null()
            vals = pa.nulls(len(urls), typ)
        feed = feed.append_column(f"before_{c}", vals)
    return feed


def epoch_winners(lake: Lake, part: int, epoch: int,
                  state: Optional[pa.Table]) -> pa.Table:
    """The EFFECTIVE change rows one committed epoch implies for one
    partition: rows whose event coordinates (warc_ts, seq, deleted)
    actually changed the partition state. Snapshot commits diff against
    the pre-image ``state`` so unchanged carried-over rows don't re-enter;
    delta files likewise drop their LWW-LOSING rows (a cross-epoch
    out-of-order event that loses the fold leaves the live state untouched
    — emitting it would hand consumers a stale value; hypothesis-found,
    test_fuzz_lake). Shared by the change feed, replication, and the
    follower-index emitters (follower.follower_epoch_candidates applies
    the same discipline); callers fold ``merge_base_with_updates(state,
    effective)``, which equals folding the raw delta (losers are no-ops).
    """
    res = lake.resolve_data(part, epoch, "delta")
    if res is not None:
        import pyarrow.parquet as pq

        # translate renamed columns like read_partition does — a pre-rename
        # delta folding against a translated pre-image must not fork twins
        winners = lake.apply_renames(pq.read_table(res[1],
                                                   filesystem=res[0]))
        if state is None or state.num_rows == 0:
            return winners
        post = merge_base_with_updates(state, winners)
        touched = pc.is_in(
            post["url"], value_set=winners["url"].combine_chunks().unique())
        return _snapshot_diff(post.filter(touched), state)
    res = lake.resolve_data(part, epoch, "snap")
    if res is not None:
        import pyarrow.parquet as pq
        snap = lake.apply_renames(pq.read_table(res[1], filesystem=res[0]))
        return _snapshot_diff(snap, state)
    raise ValueError(
        f"changefeed: partition {part} epoch {epoch} has neither delta "
        f"nor snapshot file (vacuumed?) — the feed over this range is "
        f"unrecoverable; re-seed the consumer from "
        f"Lake.read_dataset(as_of={epoch})")


def _snapshot_diff(snap: pa.Table, state: Optional[pa.Table]) -> pa.Table:
    """Change rows implied by a SNAPSHOT commit: rows whose (warc_ts, seq,
    deleted) differ from the pre-image. CoW snapshots carry the whole
    partition, so unchanged carried-over rows must not re-enter the feed.
    ``deleted`` is part of the event coordinates: a retention epoch flips
    tombstones WITHOUT minting a new (warc_ts, seq) version, and those
    expiries must surface as deletes (a delta-mode delete likewise carries
    its pre-image coordinates with deleted=True)."""
    if state is None or state.num_rows == 0:
        return snap
    import pandas as pd

    prev = pd.DataFrame({
        "warc_ts": state["warc_ts"].cast(pa.int64()).to_numpy(
            zero_copy_only=False),
        "seq": state["seq"].to_numpy(zero_copy_only=False),
        "deleted": pc.fill_null(state["deleted"], False).to_numpy(
            zero_copy_only=False),
    }, index=state["url"].to_numpy(zero_copy_only=False))
    urls = snap["url"].to_numpy(zero_copy_only=False)
    hit = prev.reindex(urls)  # NaN where the url is new
    changed = ~(
        (hit["warc_ts"].to_numpy()
         == snap["warc_ts"].cast(pa.int64()).to_numpy(zero_copy_only=False))
        & (hit["seq"].to_numpy()
           == snap["seq"].to_numpy(zero_copy_only=False))
        & (hit["deleted"].to_numpy()
           == pc.fill_null(snap["deleted"], False).to_numpy(
               zero_copy_only=False)))
    return snap.filter(pa.array(changed))


def _consumer_offset_path(lake: Lake, consumer: str) -> str:
    import posixpath
    import re

    if not re.fullmatch(r"[A-Za-z0-9._\-]{1,128}", consumer):
        raise ValueError(
            f"consumer name {consumer!r} must match [A-Za-z0-9._-]{{1,128}}")
    return posixpath.join(lake._commits_dir(), "consumers",
                          f"{consumer}.json")


def consumer_offset(lake: Lake, consumer: str) -> int:
    """Last epoch the named consumer group fully processed (-1 = none)."""
    import json as _json

    path = _consumer_offset_path(lake, consumer)
    if not lake.fs.exists(path):
        return -1
    with lake.fs.open(path, "rb") as f:
        return int(_json.loads(f.read().decode())["epoch"])


def store_consumer_offset(lake: Lake, consumer: str, epoch: int) -> None:
    """Persist the named consumer group's offset (atomic tiny record in the
    lake's ops plane — ``_commits/consumers/<name>.json``)."""
    import json as _json
    import posixpath

    path = _consumer_offset_path(lake, consumer)
    lake.fs.makedirs(posixpath.dirname(path), exist_ok=True)
    lake._write_small_atomic(path, _json.dumps({"epoch": int(epoch)}).encode())


def feed_head(lake: Lake) -> int:
    """Highest epoch the feed can deliver right now (-1 = none): the last of
    the unbroken run of COMPLETE epochs from 0 — the same watermark rule
    ``follow_changes`` advances by, so consumer lag is measured against what
    a tail would actually see, not against half-committed epochs."""
    h = -1
    while lake.is_epoch_complete(h + 1):
        h += 1
    return h


def list_consumers(lake: Lake) -> Dict[str, Dict]:
    """Every durable consumer group with its stored offset and lag in epochs
    behind :func:`feed_head` — metadata-only (ops-plane listing + tiny JSON
    reads), the signal for 'is my downstream keeping up'."""
    import json as _json
    import posixpath

    d = posixpath.join(lake._commits_dir(), "consumers")
    if not lake.fs.exists(d):
        return {}
    head = feed_head(lake)
    out: Dict[str, Dict] = {}
    for full in sorted(lake.fs.ls(d, detail=False)):
        name = posixpath.basename(full)
        if not name.endswith(".json"):
            continue
        with lake.fs.open(full, "rb") as f:
            off = int(_json.loads(f.read().decode())["epoch"])
        out[name[:-5]] = {"offset": off, "feed_head": head,
                          "lag_epochs": head - off}
    return out


def follow_changes(lake: Lake, since: int = -1, poll_interval: float = 0.5,
                   max_idle_polls: Optional[int] = None,
                   stopped=None, consumer: Optional[str] = None,
                   use_offset: bool = True):
    """TAIL the change feed — the consumer dual of ``ingest --mode follow``:
    a generator yielding one ``(lo_epoch, hi_epoch, pa.Table)`` tuple per
    newly COMPLETED epoch window as the producer commits them.

    The watermark is the epoch-complete marker (binlog ``.done`` or
    maintenance ``.maint`` — ``Lake.is_epoch_complete``): an epoch enters
    the feed only once every partition's commit landed, so a
    consumer never sees a half-committed epoch and each epoch is yielded
    exactly once per generator.

    Offset persistence: pass ``consumer`` to name a durable consumer group —
    the start point becomes ``max(since, stored offset)`` and the offset is
    persisted only after the caller's loop RESUMES the generator past the
    yield (i.e. the window was fully processed), giving at-least-once
    delivery: a crash mid-window redelivers exactly that window on restart.
    Independent names hold independent offsets. ``use_offset=False`` ignores
    the stored offset for the START (explicit ``since`` wins — a replay) but
    still advances it as windows complete. Without ``consumer``, offset
    persistence is the caller's (pass the last consumed ``hi_epoch`` back as
    ``since``; the CLI can derive it from its output file names).

    Stop conditions: ``stopped()`` returning True (drains whatever is done,
    then returns) or ``max_idle_polls`` consecutive polls with no progress.
    Yielded tables are window-sized — bulk backfills should use
    :func:`changes` directly (a streaming Dataset)."""
    import time as _time

    watermark = since
    if consumer is not None and use_offset:
        watermark = max(watermark, consumer_offset(lake, consumer))
    idle = 0
    while True:
        stopping = bool(stopped()) if stopped is not None else False
        hi = watermark
        while lake.is_epoch_complete(hi + 1):
            hi += 1
        if hi > watermark:
            feed = changes(lake, since=watermark, until=hi)
            batches = [b for b in feed.iter_batches(batch_format="pyarrow")
                       if b.num_rows]
            table = pa.concat_tables(batches) if batches else None
            if table is not None and table.num_rows:
                table = table.sort_by([("epoch", "ascending"),
                                       ("part", "ascending"),
                                       ("url", "ascending")])
                yield watermark, hi, table
                # reached only when the consumer resumed us past the yield:
                # the window is processed, so the offset may advance
            if consumer is not None:
                store_consumer_offset(lake, consumer, hi)
            watermark = hi
            idle = 0
        else:
            idle += 1
        if stopping and hi == watermark:
            return
        if max_idle_polls is not None and idle >= max_idle_polls:
            return
        _time.sleep(poll_interval)


def changes(lake: Lake, since: int = -1, until: Optional[int] = None,
            columns: Optional[List[str]] = None,
            before: Optional[List[str]] = None,
            min_ts: Optional[int] = None, max_ts: Optional[int] = None):
    """Streaming change feed ``(part, epoch, op, url, warc_ts, seq, …)`` for
    epochs in ``(since, until]``. ``since=-1`` feeds from the beginning.
    ``columns`` restricts payload columns (url/warc_ts/seq always included).
    ``before`` names payload columns whose pre-image LIVE value rides along
    as ``before_<col>`` (Debezium-style before image; null on inserts).

    ``min_ts`` / ``max_ts`` (int64 µs, inclusive) restrict the feed to
    changes whose EVENT TIME (``warc_ts``) lies in the window — and, the
    scale point, PRUNE with the commit records' event-time zone maps
    (``ts_range``, written by every commit) before opening any data file:
    partitions with no overlapping epoch are skipped entirely; epochs
    before the first overlapping one fold into the pre-image as one
    merge-on-read read (the newest snapshot + tail deltas on a compacted
    lake) instead of being walked. "The last hour of a year-old lake" costs
    O(recent epochs), not O(history). Commits without ts_range (pre-feature
    lakes, follower keyspaces) are conservatively processed."""
    import ray.data as _rd

    live_parts, target = lake._unified_live(until)
    if target is None:
        return _rd.from_items([])
    for c in before or ():
        if c not in target.names:
            raise ValueError(f"before column {c!r} not in the lake schema "
                             f"({target.names})")
    if columns is not None:
        want = [c for c in target.names
                if c in set(columns) | set(_META_COLS) | set(before or ())]
        target = pa.schema([target.field(c) for c in want])
    parts_ds = _rd.from_items([{"part": p} for p in live_parts])
    return parts_ds.map_batches(
        _FeedPartition(lake.root, lake.num_partitions, since, until, target,
                       before=list(before) if before else None,
                       min_ts=min_ts, max_ts=max_ts),
        batch_format="pyarrow", batch_size=1)
