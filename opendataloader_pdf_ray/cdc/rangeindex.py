"""Bucketed numeric range index over the lake, maintained incrementally.

Equality predicates have the column index (colindex.py); range predicates
(``WHERE warc_ts BETWEEN lo AND hi``, ``score >= t``) on a url-hash-
partitioned lake still scan every partition — hash layout destroys value
locality, so parquet row-group min/max stats prune nothing. This follower
keyspace restores value locality OUT of line: postings are
``(bucket, val, key)`` where ``bucket = val // width`` (fixed-width
buckets, index-persistent config), and a bucket's postings all live in one
index partition (``md5(bucket) % P`` — the shared keyspace-routing
convention). A range scan then reads only the partitions holding the
O((hi-lo)/width) overlapping buckets and row-filters ``val`` exactly —
instead of folding the whole lake. Wide scans degrade gracefully: past
``4·P`` overlapping buckets every partition is probed anyway (the scan is
then bounded by index size, never worse than an unindexed lake fold is by
LAKE size, and the index holds two ints + a url per live row).

``width`` is the tuning knob: ~(typical scan span / cluster parallelism).
The B-tree analog for this commit-log design — a coarse first level whose
"leaves" are parquet posting runs, folded merge-on-read like every other
follower (follower.py is the shared base: exactly-once refresh with
watermark resume, pre-image retract/apply discipline, as_of time travel,
compact prunes retractions, purge scrubs urls).

Values must be integers (int64) or timestamps (canonicalized to int64
microseconds); NULL is never indexed (``col BETWEEN ...`` never matches
NULL). Floats are refused loudly — quantize upstream (scaled ints) so the
probe side and the emitter agree bit-exactly.

Reference parity: no counterpart (the reference is a single-corpus
converter); the analog is a Delta/Iceberg data-skipping zone map
re-expressed as a follower keyspace, which — unlike file-level stats —
survives url-hash partitioning.

Determinism: postings derive from committed lake bytes + the persisted
(col, width) config alone; identity-sorted commits, so equal lakes give
byte-equal index files at any refresh chunking or concurrency.
"""

from __future__ import annotations

import datetime as _dt
import posixpath
from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .follower import (FollowerIndex, HELPER_COL, column_or_nulls,
                       follower_epoch_candidates)
from .lake import Lake
from ..functions.sketches import md5_number_lower


def range_index_root(lake_root: str, col: str) -> str:
    """Conventional location of a lake's range index on ``col``."""
    return posixpath.join(lake_root, f"rangeidx_{col}")


def list_range_indexes(lake_root: str) -> List[str]:
    """Roots of every range index under a lake (``rangeidx_*`` dirs) —
    fsck/stats/purge discovery, same convention as ``list_col_indexes``."""
    import fsspec

    fs, base = fsspec.core.url_to_fs(lake_root)
    try:
        names = fs.ls(base, detail=False)
    except FileNotFoundError:
        return []
    return sorted(posixpath.join(lake_root, posixpath.basename(n))
                  for n in names
                  if posixpath.basename(n).startswith("rangeidx_"))


POSTING_SCHEMA = pa.schema([
    ("bucket", pa.int64()),
    ("val", pa.int64()),
    ("key", pa.string()),
    ("epoch", pa.int64()),
    ("sign", pa.int8()),
])

_IDENTITY = ("bucket", "val", "key")


def bucket_partition(buckets, num_partitions: int) -> np.ndarray:
    """bucket id → index partition (process-independent md5 routing, the
    keyspace convention shared with tok_partition / val_partition). Modulo
    alone would also work, but hashing decorrelates adjacent buckets from
    adjacent partitions so a narrow hot range still fans out."""
    return np.array([md5_number_lower(str(int(b))) % num_partitions
                     for b in buckets], np.int32)


def canon_i64(v) -> Optional[int]:
    """Value → canonical int64 (the probe side must agree bit-exactly):
    ints pass through, timestamps become epoch-microseconds, floats are
    refused (quantize upstream), NULL is never indexed."""
    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, _dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=_dt.timezone.utc)
        return int(v.timestamp() * 1_000_000)
    if isinstance(v, (int, np.integer)):
        return int(v)
    raise TypeError(
        f"range index only takes int/timestamp values, got "
        f"{type(v).__name__}: quantize floats to scaled ints upstream")


class _EmitRangeDeltas:
    """map_batches(..., batch_size=1) over LAKE partition ids: fold epochs
    ``(since, up_to]`` with the change feed's pre-image discipline and emit
    (bucket, val, key) posting DIFF rows (value changed → retract old bucket
    row, apply new; delete → retract; NULL → not indexed). Memory bound =
    one lake partition's live {key: int} map per task."""

    __name__ = "_EmitRangeDeltas"

    def __init__(self, lake_root: str, lake_partitions: Optional[int],
                 since: int, up_to: int, key_col: str, col: str,
                 width: int, num_idx_partitions: int):
        self.lake_root, self.lake_partitions = lake_root, lake_partitions
        self.since, self.up_to = since, up_to
        self.key_col, self.col, self.width = key_col, col, width
        self.num_idx_partitions = num_idx_partitions

    def __call__(self, batch: pa.Table) -> pa.Table:
        lake = Lake(self.lake_root, self.lake_partitions)
        out: List[pa.Table] = []
        for part in batch["part"].to_pylist():
            out.extend(self._one(lake, int(part)))
        if not out:
            return POSTING_SCHEMA.empty_table().append_column(
                HELPER_COL, pa.array([], pa.int32()))
        return pa.concat_tables(out)

    def _live_vals(self, state: Optional[pa.Table]) -> Dict[str, int]:
        if state is None or state.num_rows == 0:
            return {}
        dead = pc.fill_null(state["deleted"], False).to_numpy(
            zero_copy_only=False)
        keys = state[self.key_col].to_numpy(zero_copy_only=False)
        vals = column_or_nulls(state, self.col)
        return {k: cv for k, v, d in zip(keys, vals, dead)
                if not d and (cv := canon_i64(v)) is not None}

    def _one(self, lake: Lake, part: int) -> List[pa.Table]:
        epochs = [e for e in lake.committed_epochs(part)
                  if self.since < e <= self.up_to]
        if not epochs:
            return []
        state = lake.read_partition(part, as_of=self.since)
        live = self._live_vals(state)
        out: List[pa.Table] = []
        for e in epochs:
            winners, state = follower_epoch_candidates(lake, part, e, state)
            vals, keys, signs = [], [], []
            w_keys = winners[self.key_col].to_numpy(zero_copy_only=False)
            w_vals = column_or_nulls(winners, self.col)
            w_dead = (pc.fill_null(winners["deleted"], False).to_numpy(
                zero_copy_only=False) if "deleted" in winners.column_names
                else np.zeros(len(w_keys), bool))
            for k, v, d in zip(w_keys, w_vals, w_dead):
                old = live.get(k)
                new = None if d else canon_i64(v)
                if new == old:
                    continue
                if old is not None:
                    vals.append(old); keys.append(k); signs.append(-1)
                if new is not None:
                    vals.append(new); keys.append(k); signs.append(1)
            if vals:
                v_arr = np.array(vals, np.int64)
                buckets = v_arr // self.width
                t = pa.table({
                    "bucket": pa.array(buckets),
                    "val": pa.array(v_arr),
                    "key": pa.array(keys, pa.string()),
                    "epoch": pa.array(np.full(len(vals), e, np.int64)),
                    "sign": pa.array(np.array(signs, np.int8)),
                })
                out.append(t.append_column(
                    HELPER_COL,
                    pa.array(bucket_partition(buckets,
                                              self.num_idx_partitions))))
            live = self._live_vals(state)
        return out


class RangeIndex(FollowerIndex):
    """Bucketed range index on one numeric payload column (module
    docstring). ``root`` is the INDEX root — conventionally
    ``<lake>/rangeidx_<col>``. ``col`` and ``width`` are INDEX-persistent
    config: a mismatching reopen fails loudly (a width change silently
    re-bucketing new epochs would split the keyspace — rebuild instead,
    same discipline as textindex's positional flag)."""

    POSTING_SCHEMA = POSTING_SCHEMA
    IDENTITY = _IDENTITY

    # past this many overlapping buckets a scan probes every partition
    # (enumerating probe buckets driver-side would cost more than it saves)
    _FULL_PROBE_BUCKETS = 4

    def __init__(self, root: str, num_partitions: Optional[int] = None,
                 key_col: str = "url", col: Optional[str] = None,
                 width: Optional[int] = None):
        super().__init__(root, num_partitions)
        stored = self._stored_config()
        if stored is not None:
            if col is not None and stored.get("col") != col:
                raise ValueError(
                    f"index at {root} indexes column {stored.get('col')!r};"
                    f" refusing col={col!r} (one index per column)")
            if width is not None and int(stored.get("width")) != int(width):
                raise ValueError(
                    f"index at {root} has bucket width "
                    f"{stored.get('width')}; refusing width={width} "
                    f"(rebuild the index to re-bucket)")
            self.col = stored.get("col")
            self.width = int(stored.get("width"))
        else:
            if col is None:
                raise ValueError("new range index needs col=...")
            self.col = col
            self.width = int(width) if width is not None else 1_000_000
        if self.width <= 0:
            raise ValueError(f"bucket width must be positive: {self.width}")
        self.key_col = key_col
        self._extra_init = {"key_col": key_col, "col": self.col,
                            "width": self.width}

    def _config_path(self) -> str:
        return posixpath.join(self.lake._commits_dir(), "rangeidx.json")

    def _stored_config(self) -> Optional[dict]:
        import json as _json

        if not self.lake.fs.exists(self._config_path()):
            return None
        with self.lake.fs.open(self._config_path(), "rb") as f:
            return _json.loads(f.read().decode())

    def refresh(self, lake: Lake, up_to: Optional[int] = None):
        import json as _json

        if self._stored_config() is None:
            self.lake._write_small_atomic(
                self._config_path(),
                _json.dumps({"col": self.col,
                             "width": self.width}).encode())
        return super().refresh(lake, up_to)

    def make_emitter(self, lake: Lake, since: int, up_to: int):
        return _EmitRangeDeltas(lake.root, lake.num_partitions, since,
                                up_to, self.key_col, self.col, self.width,
                                self.num_partitions)

    # -------------------------------------------------------------- scan
    def _probe_parts(self, lo: int, hi: int) -> List[int]:
        lo_b, hi_b = lo // self.width, hi // self.width
        n_buckets = hi_b - lo_b + 1
        if n_buckets > self._FULL_PROBE_BUCKETS * self.num_partitions:
            return list(range(self.num_partitions))
        return sorted({int(p) for p in bucket_partition(
            range(lo_b, hi_b + 1), self.num_partitions)})

    def scan_range(self, lo, hi, as_of: Optional[int] = None):
        """Keys whose live ``col`` lies in ``[lo, hi]`` (inclusive — SQL
        BETWEEN semantics) as a Ray Dataset of (key, val) rows: one read
        task per probed index partition (O(range/width) partitions, capped
        at P); postings stream as blocks, never through the driver. Feed
        the keys to ``Lake.lookup`` for full payload rows."""
        import ray.data as _rd

        lo, hi = canon_i64(lo), canon_i64(hi)
        out_schema = pa.schema([("key", pa.string()), ("val", pa.int64())])
        if lo is None or hi is None or lo > hi:
            return _rd.from_arrow(out_schema.empty_table())
        root, n = self.lake.root, self.num_partitions

        def read_part(batch: pa.Table) -> pa.Table:
            idx = RangeIndex(root, n)
            out: List[pa.Table] = []
            for part in batch["part"].to_pylist():
                t = idx.read_partition(int(part), as_of=as_of)
                if t is None or t.num_rows == 0:
                    continue
                hit = t.filter(pc.and_(
                    pc.greater(t["sign"], 0),
                    pc.and_(pc.greater_equal(t["val"], lo),
                            pc.less_equal(t["val"], hi))))
                if hit.num_rows:
                    out.append(pa.table({"key": hit["key"],
                                         "val": hit["val"]}))
            if not out:
                return out_schema.empty_table()
            return pa.concat_tables(out)

        return _rd.from_items(
            [{"part": p} for p in self._probe_parts(lo, hi)]
        ).map_batches(read_part, batch_format="pyarrow", batch_size=1)

    def scan_range_local(self, lo, hi,
                         as_of: Optional[int] = None) -> pa.Table:
        """In-process range scan (no Ray session) — the serving path for
        protocol servers/tooling; hot ranges DO land in this process, so
        batch analytics should use :meth:`scan_range`."""
        lo, hi = canon_i64(lo), canon_i64(hi)
        out_schema = pa.schema([("key", pa.string()), ("val", pa.int64())])
        if lo is None or hi is None or lo > hi:
            return out_schema.empty_table()
        out: List[pa.Table] = []
        for part in self._probe_parts(lo, hi):
            t = self.read_partition(part, as_of=as_of)
            if t is None or t.num_rows == 0:
                continue
            hit = t.filter(pc.and_(
                pc.greater(t["sign"], 0),
                pc.and_(pc.greater_equal(t["val"], lo),
                        pc.less_equal(t["val"], hi))))
            if hit.num_rows:
                out.append(pa.table({"key": hit["key"], "val": hit["val"]}))
        if not out:
            return out_schema.empty_table()
        return pa.concat_tables(out).sort_by(
            [("key", "ascending"), ("val", "ascending")])
