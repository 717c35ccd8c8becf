"""Generic secondary column index over the lake, maintained incrementally.

The value→keys dual of a database secondary index: for any payload column,
a follower keyspace of ``(val, key)`` postings lets an equality predicate
(``WHERE lang = 'ko'``) resolve to its matching urls with O(1) index
partition reads plus hash-routed lake point lookups — instead of scanning
every partition of a 100-TB lake. Single-valued per key (exactly one live
value per url), so it is the textindex's (textindex.py) degenerate case:
"tokenize" = the column's one canonical string. Everything else — storage,
identity fold, exactly-once refresh, watermark resume, compact with
retraction pruning, fsck, purge — is the shared follower machinery
(follower.py), unchanged.

Diff emitter semantics (per changed key per epoch, pre-image discipline):

- value unchanged → emit nothing (delta volume scales with churn);
- value changed  → retract ``(old_val, key)``, apply ``(new_val, key)``;
- key deleted    → retract ``(old_val, key)``;
- NULL values are not indexed (SQL-predicate semantics: ``col = v`` never
  matches NULL; a value→NULL transition is a plain retraction).

Values are indexed by their canonical string (``str(v)``; probe side must
canonicalize the same way) — stable for string/int/bool payload columns,
the types an equality index makes sense for.

Reference parity: no counterpart (the reference is a single-corpus
converter); the analog is a Hive/Iceberg-style partition-value or
secondary index re-expressed over this commit-log design.
"""

from __future__ import annotations

import posixpath
from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .follower import (FollowerIndex, HELPER_COL, column_or_nulls,
                       follower_epoch_candidates)
from .lake import Lake
from ..functions.sketches import md5_number_lower


def col_index_root(lake_root: str, col: str) -> str:
    """Conventional location of a lake's secondary index on ``col`` (a
    sub-directory the lake's own partition globbing never descends into —
    same convention as ``text_index_root``)."""
    return posixpath.join(lake_root, f"colidx_{col}")


def list_col_indexes(lake_root: str) -> List[str]:
    """Roots of every column index under a lake (``colidx_*`` dirs) —
    protocol-preserving (names rejoined onto ``lake_root``), for
    fsck/stats discovery."""
    import fsspec

    fs, base = fsspec.core.url_to_fs(lake_root)
    try:
        names = fs.ls(base, detail=False)
    except FileNotFoundError:
        return []
    return sorted(posixpath.join(lake_root, posixpath.basename(n))
                  for n in names
                  if posixpath.basename(n).startswith("colidx_"))


POSTING_SCHEMA = pa.schema([
    ("val", pa.string()),
    ("key", pa.string()),
    ("epoch", pa.int64()),
    ("sign", pa.int8()),
])

_IDENTITY = ("val", "key")


def val_partition(vals: List[str], num_partitions: int) -> np.ndarray:
    """value → index partition via ``md5_number_lower(val) % P`` — the
    process-independent hash the probe side shares (same rule as
    ``textindex.tok_partition``), so a scan prunes to exactly the
    partitions that can hold a value."""
    return np.array([md5_number_lower(v) % num_partitions for v in vals],
                    np.int32)


def _canon(v) -> Optional[str]:
    return None if v is None else str(v)


class _EmitValueDeltas:
    """map_batches(..., batch_size=1) over LAKE partition ids: fold epochs
    ``(since, up_to]`` with the change feed's pre-image discipline and emit
    (val, key) posting DIFF rows. Memory bound = one lake partition's live
    value map per task (one string per live key — far below the text
    index's bound)."""

    __name__ = "_EmitValueDeltas"

    def __init__(self, lake_root: str, lake_partitions: Optional[int],
                 since: int, up_to: int, key_col: str, col: str,
                 num_idx_partitions: int):
        self.lake_root, self.lake_partitions = lake_root, lake_partitions
        self.since, self.up_to = since, up_to
        self.key_col, self.col = key_col, col
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

    def _live_vals(self, state: Optional[pa.Table]) -> Dict[str, str]:
        if state is None or state.num_rows == 0:
            return {}
        dead = pc.fill_null(state["deleted"], False).to_numpy(
            zero_copy_only=False)
        keys = state[self.key_col].to_numpy(zero_copy_only=False)
        vals = column_or_nulls(state, self.col)
        return {k: cv for k, v, d in zip(keys, vals, dead)
                if not d and (cv := _canon(v)) is not None}

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
                new = None if d else _canon(v)
                if new == old:
                    continue
                if old is not None:
                    vals.append(old); keys.append(k); signs.append(-1)
                if new is not None:
                    vals.append(new); keys.append(k); signs.append(1)
            if vals:
                t = pa.table({
                    "val": pa.array(vals, pa.string()),
                    "key": pa.array(keys, pa.string()),
                    "epoch": pa.array(np.full(len(vals), e, np.int64)),
                    "sign": pa.array(np.array(signs, np.int8)),
                })
                out.append(t.append_column(
                    HELPER_COL,
                    pa.array(val_partition(vals, self.num_idx_partitions))))
            live = self._live_vals(state)
        return out


class ColumnIndex(FollowerIndex):
    """Secondary value→keys index on one payload column (module docstring).

    ``root`` is the INDEX root — conventionally ``<lake>/colidx_<col>``.
    The indexed lake is passed to :meth:`refresh`, never stored (the index
    is a durable consumer, restartable anywhere the lake is reachable).
    ``col`` is INDEX-persistent config: a mismatching reopen fails loudly
    (refreshing a ``lang`` index with ``source`` values would silently
    interleave keyspaces — same discipline as textindex's positional)."""

    POSTING_SCHEMA = POSTING_SCHEMA
    IDENTITY = _IDENTITY

    def __init__(self, root: str, num_partitions: Optional[int] = None,
                 key_col: str = "url", col: Optional[str] = None):
        super().__init__(root, num_partitions)
        stored = self._stored_config()
        if stored is not None and col is not None \
                and stored.get("col") != col:
            raise ValueError(
                f"index at {root} indexes column {stored.get('col')!r}; "
                f"refusing col={col!r} (build a separate index per column)")
        if stored is None and col is None:
            raise ValueError("new column index needs col=...")
        self.col = stored.get("col") if stored is not None else col
        self.key_col = key_col
        self._extra_init = {"key_col": key_col, "col": self.col}

    def _config_path(self) -> str:
        return posixpath.join(self.lake._commits_dir(), "colidx.json")

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
                _json.dumps({"col": self.col}).encode())
        return super().refresh(lake, up_to)

    def make_emitter(self, lake: Lake, since: int, up_to: int):
        return _EmitValueDeltas(lake.root, lake.num_partitions, since,
                                up_to, self.key_col, self.col,
                                self.num_partitions)

    # -------------------------------------------------------------- scan
    def scan(self, values: List[str], as_of: Optional[int] = None):
        """Keys whose live ``col`` equals each probe value: a Ray Dataset
        of (val, key) rows — one read task per DISTINCT probe partition
        (O(|probes|) partition reads at any index size); hot-value posting
        lists stream as blocks, never through the driver. Feed the keys to
        ``Lake.lookup`` (hash-routed point reads) for full payload rows."""
        import ray.data as _rd

        probes = sorted({_canon(v) for v in values if v is not None})
        parts = sorted({int(p) for p in
                        val_partition(probes, self.num_partitions)})
        root, n = self.lake.root, self.num_partitions
        out_schema = pa.schema([("val", pa.string()), ("key", pa.string())])
        probe_set = pa.array(probes, pa.string())

        def read_part(batch: pa.Table) -> pa.Table:
            idx = ColumnIndex(root, n)
            out: List[pa.Table] = []
            for part in batch["part"].to_pylist():
                t = idx.read_partition(int(part), as_of=as_of)
                if t is None or t.num_rows == 0:
                    continue
                hit = t.filter(pc.and_(
                    pc.is_in(t["val"], value_set=probe_set),
                    pc.greater(t["sign"], 0)))
                if hit.num_rows:
                    out.append(pa.table({"val": hit["val"],
                                         "key": hit["key"]}))
            if not out:
                return out_schema.empty_table()
            return pa.concat_tables(out)

        if not parts:
            return _rd.from_arrow(out_schema.empty_table())
        return _rd.from_items([{"part": p} for p in parts]).map_batches(
            read_part, batch_format="pyarrow", batch_size=1)

    def scan_local(self, values: List[str],
                   as_of: Optional[int] = None) -> pa.Table:
        """In-process point scan (no Ray session) — the serving path for
        protocol servers/tooling; hot-value posting lists DO land in this
        process, so batch analytics should use :meth:`scan`."""
        probes = sorted({_canon(v) for v in values if v is not None})
        probe_set = pa.array(probes, pa.string())
        parts = sorted({int(p) for p in
                        val_partition(probes, self.num_partitions)})
        out: List[pa.Table] = []
        for part in parts:
            t = self.read_partition(part, as_of=as_of)
            if t is None or t.num_rows == 0:
                continue
            hit = t.filter(pc.and_(
                pc.is_in(t["val"], value_set=probe_set),
                pc.greater(t["sign"], 0)))
            if hit.num_rows:
                out.append(pa.table({"val": hit["val"], "key": hit["key"]}))
        if not out:
            return pa.schema([("val", pa.string()),
                              ("key", pa.string())]).empty_table()
        return pa.concat_tables(out).sort_by(
            [("val", "ascending"), ("key", "ascending")])
