"""Incrementally-maintained aggregate views over a Lake — IVM with
retractions wired to the lake's own commit log.

``pipelines.cdc_queries.cdc_incremental_view`` demonstrates the delta math
over a synthetic changelog; this module is the production shape: a view
(per-group live-row count + int64 value sum over the LIVE state) that folds
each committed (partition, epoch) exactly once, storing its own append-only
delta log next to the lake with the same commit-record protocol
(object-store safe, idempotent, crash-resumable).

Per (partition, epoch) fold — only CHANGED keys are touched:

- the epoch's winner set ``W`` comes from the delta file when the epoch was
  delta-committed, else from a seq-diff against the running previous state,
- retract the displaced old rows (−1, −value), apply the LWW merge of
  (prev ∩ changed, W) (+1, +value) — a winner that loses LWW retracts and
  re-applies the same row, cancelling exactly,
- the per-group delta (≤ |changed| rows, usually ≤ |groups|) is written as
  ``_views/<name>/delta-p<part>-e<epoch>.parquet`` + a commit record.

``read()`` sums the committed view deltas — by telescoping this equals the
batch aggregate over the final live state (pinned by tests against
``lake.read_state()``). Partitions are independent: ``refresh()`` fans out
one Ray task per partition holding only that partition's running state.
"""

from __future__ import annotations

import json
import posixpath
from typing import Callable, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from .lake import Lake
from .merge import live_view, merge_base_with_updates

MERGE_KEY = "url"


def group_lang(table: pa.Table) -> np.ndarray:
    """Default grouping: the ``lang`` column (``'all'`` if absent)."""
    if "lang" in table.column_names:
        arr = table["lang"].to_numpy(zero_copy_only=False)
        return np.where(arr == None, "all", arr).astype(object)  # noqa: E711
    return np.full(table.num_rows, "all", dtype=object)


def value_text_len(table: pa.Table) -> np.ndarray:
    """Default value: utf8 length of ``text`` (0 if absent/null)."""
    if "text" not in table.column_names:
        return np.zeros(table.num_rows, np.int64)
    import pyarrow.compute as pc

    return pc.fill_null(pc.utf8_length(table["text"]), 0).to_numpy(
        zero_copy_only=False).astype(np.int64)


def _agg(table: Optional[pa.Table],
         group_of: Callable[[pa.Table], np.ndarray],
         value_of: Callable[[pa.Table], np.ndarray],
         sign: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    if table is None or table.num_rows == 0:
        e = np.array([], object)
        z = np.array([], np.int64)
        return e, z, z
    live = live_view(table)
    if live.num_rows == 0:
        e = np.array([], object)
        z = np.array([], np.int64)
        return e, z, z
    groups = group_of(live)
    vals = value_of(live)
    uniq, inv = np.unique(groups.astype(str), return_inverse=True)
    dn = np.bincount(inv, minlength=len(uniq)).astype(np.int64) * sign
    dv = np.bincount(inv, weights=vals.astype(np.float64),
                     minlength=len(uniq)).astype(np.int64) * sign
    return uniq, dn, dv


def _fold_partition(lake_root: str, num_partitions: int, part: int,
                    view_dir: str, pending: List[int],
                    group_of: Callable, value_of: Callable) -> int:
    """Fold this partition's pending epochs in order against a running local
    state; write one view-delta file + commit record per epoch."""
    lake = Lake(lake_root, num_partitions)
    fs = lake.fs
    done = 0
    prev: Optional[pa.Table] = None
    prev_loaded = False
    for epoch in pending:
        cpath = posixpath.join(view_dir, f"commit-p{part:04d}-e{epoch:06d}.json")
        if fs.exists(cpath):
            prev_loaded = False  # state must re-sync past this epoch
            continue
        if not prev_loaded:
            prev = lake.read_partition(part, as_of=epoch - 1)
            prev_loaded = True
        dpath = lake._delta_path(part, epoch)
        if fs.exists(dpath):
            winners = lake.apply_renames(pq.read_table(dpath,
                                                       filesystem=fs))
            post = merge_base_with_updates(prev, winners)
            changed = np.unique(
                winners[MERGE_KEY].to_numpy(zero_copy_only=False))
        else:
            spath = lake._data_path(part, epoch)
            post = (lake.apply_renames(pq.read_table(spath, filesystem=fs))
                    if fs.exists(spath)
                    else lake.read_partition(part, as_of=epoch))
            if post is None:
                # vacuum reclaimed this epoch's files and everything before
                # it — not reconstructible. Commit an EMPTY fold; the first
                # reconstructible epoch initializes the view (prev is None →
                # its whole state applies), so the telescoped sum is intact.
                changed = np.array([], dtype=object)
                post = prev
            # seq-diff: urls whose (presence, seq, deleted) changed vs prev
            # — ``deleted`` is part of the event coordinates so a retention
            # epoch's tombstone flips (same seq, deleted 0→1) RETRACT their
            # contributions (same rule as changefeed._snapshot_diff)
            elif prev is None or prev.num_rows == 0:
                changed = np.unique(
                    post[MERGE_KEY].to_numpy(zero_copy_only=False))
            else:
                import pyarrow.compute as _pc

                pu = prev[MERGE_KEY].to_numpy(zero_copy_only=False)
                ps = prev["seq"].to_numpy(zero_copy_only=False)
                pd_ = _pc.fill_null(prev["deleted"], False).to_numpy(
                    zero_copy_only=False)
                nu = post[MERGE_KEY].to_numpy(zero_copy_only=False)
                ns = post["seq"].to_numpy(zero_copy_only=False)
                nd_ = _pc.fill_null(post["deleted"], False).to_numpy(
                    zero_copy_only=False)
                old_key = dict(zip(pu, zip(ps, pd_)))
                mask = np.array([old_key.get(u, (-1, False)) != (s, d)
                                 for u, s, d in zip(nu, ns, nd_)])
                changed = np.unique(nu[mask]) if mask.any() else nu[:0]

        def restrict(t: Optional[pa.Table]) -> Optional[pa.Table]:
            if t is None or t.num_rows == 0 or len(changed) == 0:
                return None
            urls = t[MERGE_KEY].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(np.isin(urls, changed)))

        og, on, ov = _agg(restrict(prev), group_of, value_of, -1)
        ng, nn, nv = _agg(restrict(post), group_of, value_of, +1)
        delta = pa.table({
            "grp": pa.array(np.concatenate([og, ng]).astype(str).tolist(),
                            pa.string()),
            "dn": pa.array(np.concatenate([on, nn]), pa.int64()),
            "dval": pa.array(np.concatenate([ov, nv]), pa.int64()),
        })
        fs.makedirs(view_dir, exist_ok=True)
        path = posixpath.join(view_dir,
                              f"delta-p{part:04d}-e{epoch:06d}.parquet")
        pq.write_table(delta, path, filesystem=fs)
        lake._write_small_atomic(cpath, json.dumps(
            {"part": part, "epoch": epoch, "rows": delta.num_rows}).encode())
        prev = post
        done += 1
    return done


class MaterializedView:
    """An exactly-once incrementally-maintained (group → n_live, sum_value)
    view stored under ``<lake>/_views/<name>``."""

    def __init__(self, lake: Lake, name: str,
                 group_of: Callable[[pa.Table], np.ndarray] = group_lang,
                 value_of: Callable[[pa.Table], np.ndarray] = value_text_len):
        self.lake = lake
        self.name = name
        self.group_of = group_of
        self.value_of = value_of
        self.dir = posixpath.join(lake._base, "_views", name)

    def refresh(self, parallel: bool = True) -> int:
        """Fold every committed (partition, epoch) not yet in the view.
        Returns the number of folds applied. One Ray task per partition when
        ``parallel`` and the lake is on a worker-visible filesystem (local
        path / object store); in-memory filesystems fold in-process."""
        todo = []
        for part in range(self.lake.num_partitions):
            epochs = self.lake.committed_epochs(part)
            if epochs:
                todo.append((part, epochs))
        if not todo:
            return 0
        args = [(self.lake.root, self.lake.num_partitions, part, self.dir,
                 epochs, self.group_of, self.value_of)
                for part, epochs in todo]
        if parallel and self.lake._is_local and ray.is_initialized():
            fold = ray.remote(num_cpus=1)(_fold_partition)
            return sum(ray.get([fold.remote(*a) for a in args]))
        return sum(_fold_partition(*a) for a in args)

    def read(self, as_of: Optional[int] = None) -> pa.Table:
        """Sum the committed view deltas → (grp, n_live, sum_value), groups
        with zero live rows dropped, sorted by group. ``as_of`` time-travels
        the view: only deltas of epochs ≤ as_of fold, giving the view state
        as of that checkpoint — the same semantics as
        ``Lake.read_state(as_of=...)`` because the per-epoch deltas
        telescope at every prefix, not just the final one.

        Driver-side by design: the delta log is metadata-scale (≤ groups ×
        partitions × epochs tiny rows, never corpus-proportional). A
        long-lived deployment bounds the log by folding it — compact the
        per-(part, epoch) deltas into one rolled-up delta per partition the
        same way ``Lake.compact()`` folds data deltas."""
        fs = self.lake.fs
        totals: dict = {}
        if not fs.exists(self.dir):
            return pa.table({"grp": pa.array([], pa.string()),
                             "n_live": pa.array([], pa.int64()),
                             "sum_value": pa.array([], pa.int64())})
        for path in sorted(fs.ls(self.dir)):
            base = posixpath.basename(path)
            if not base.startswith("commit-"):
                continue
            meta = json.loads(fs.cat_file(path))
            if as_of is not None and meta["epoch"] > as_of:
                continue
            dpath = posixpath.join(
                self.dir,
                f"delta-p{meta['part']:04d}-e{meta['epoch']:06d}.parquet")
            t = pq.read_table(dpath, filesystem=fs)
            for g, dn, dv in zip(t["grp"].to_pylist(), t["dn"].to_pylist(),
                                 t["dval"].to_pylist()):
                cur = totals.setdefault(g, [0, 0])
                cur[0] += dn
                cur[1] += dv
        grps = sorted(g for g, (n, _) in totals.items() if n != 0)
        return pa.table({
            "grp": pa.array(grps, pa.string()),
            "n_live": pa.array([totals[g][0] for g in grps], pa.int64()),
            "sum_value": pa.array([totals[g][1] for g in grps], pa.int64()),
        })
