"""Inverted full-text index over the lake, maintained incrementally.

The third lake-integrated index keyspace (after the exact-fingerprint
FWW index, dupindex.py, and the SimHash band index, neardup.py), and the
first MULTI-VALUED one: token → posting set, where a key's postings must
RETRACT when a new content version drops tokens — the retract/apply
discipline of incremental view maintenance (cdc/views.py) applied to a
set-valued index instead of an aggregate. This is the "shared mutable
index" shape the brief calls out; it needs no actor holding state —
consistent hash partitioning of the token keyspace plus the lake's
idempotent ``(part, epoch)`` commit protocol give the same semantics with
storage-backed, crash-resumable state.

Design:

- **storage**: a sub-lake (conventionally ``<lake>/textidx``) of
  ``hash(token) % P`` partitions holding slim posting-delta rows
  ``(tok, key, epoch, sign)``; ``sign`` = +1 "key's live text contains tok
  as of epoch" / −1 "no longer contains". Commits reuse
  :class:`~.lake.Lake`'s commit-record protocol — exactly-once per
  ``(tok_part, lake_epoch)``, crash/resume, ``as_of`` time travel free.
- **fold**: latest-(epoch) row per ``(tok, key)``; live iff its sign > 0.
  One row per (tok, key, epoch) by construction (token-set diffs), so the
  fold is associative, idempotent and chunking-invariant like the LWW and
  FWW folds (merge.py, dupindex.py).
- **maintenance**: a FOLLOWER of the lake (like the change feed), not an
  ingest hook: retractions need the pre-image text, which only the lake
  partitions hold. ``refresh()`` runs one Ray task per LAKE partition that
  folds epochs ``(watermark, up_to]`` exactly the way the change feed does
  (``changefeed.epoch_winners``), emitting token-set DIFFS old→new per
  changed key — unchanged tokens emit nothing (their old +1 row stays
  live), so delta volume scales with churn, not corpus size. One slim
  shuffle of (tok, key, epoch, sign) rows into token space; per-partition
  tasks split by epoch and commit each idempotently; the watermark file is
  advanced only after every commit landed (a crash re-emits
  deterministically and the committed (part, epoch) pairs no-op).
- **search**: probe tokens hash to their partitions — ``O(|probes|)``
  partition reads at any index size (the point-lookup discipline of
  ``Lake.lookup``), each task folds ITS partition once and filters to the
  probe set; returns a Ray Dataset so common-token posting lists never
  land on the driver.
- **compact**: materializes the fold as a snapshot at each partition's tip
  epoch and PRUNES dead rows (sign ≤ 0): a snapshot is the oldest readable
  base, so "absent" and "latest row is a retraction" are indistinguishable
  to every later read — the space win of compaction. ``vacuum`` then
  reclaims folded deltas via the lake's content-agnostic vacuum.

Tokenization is ``\\w+`` over lowercased text — the corpus queries'
SQL-mirrorable pattern (DuckDB ``regexp_extract_all(lower(text), '\\w+')``),
which is what lets the driver query carry a bit-exact oracle.
"""

from __future__ import annotations

import json
import posixpath
import re
from typing import Dict, List, Optional, Set

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .changefeed import epoch_winners
from .lake import Lake, Lineage
from .merge import merge_base_with_updates
from ..functions.sketches import md5_number_lower

_HELPER_COLS = ("tok_part",)


def text_index_root(lake_root: str) -> str:
    """Conventional location of a lake's text index (a sub-directory the
    lake's own partition globbing and fsck never descend into — the same
    convention as ``dup_index_root``/``near_index_root``)."""
    return posixpath.join(lake_root, "textidx")

POSTING_SCHEMA = pa.schema([
    ("tok", pa.string()),
    ("key", pa.string()),
    ("epoch", pa.int64()),
    ("sign", pa.int8()),
])


def tok_partition(toks: List[str], num_partitions: int) -> np.ndarray:
    """token → index partition via ``md5_number_lower(tok) % P`` — the same
    process-independent hash the probe side uses, so search prunes to
    exactly the partitions that can hold a token."""
    return np.array([md5_number_lower(t) % num_partitions for t in toks],
                    np.int32)


def latest_per_tok_key(table: pa.Table) -> pa.Table:
    """Keep the max-epoch row per (tok, key) — the posting fold. Rows are
    unique per (tok, key, epoch) by construction, so no further tiebreak
    exists to take. Vectorized (codes + lexsort + run-end selection)."""
    if table.num_rows <= 1:
        return table
    toks = np.asarray(table["tok"].to_pylist(), dtype=object)
    keys = np.asarray(table["key"].to_pylist(), dtype=object)
    eps = table["epoch"].to_numpy(zero_copy_only=False)
    _, ti = np.unique(toks, return_inverse=True)
    _, ki = np.unique(keys, return_inverse=True)
    order = np.lexsort((eps, ki, ti))
    st, sk = ti[order], ki[order]
    is_last = np.ones(len(order), dtype=bool)
    is_last[:-1] = (st[1:] != st[:-1]) | (sk[1:] != sk[:-1])
    return table.take(pa.array(order[is_last]))


def read_posting_partition(lake: Lake, part: int,
                           as_of: Optional[int] = None
                           ) -> Optional[pa.Table]:
    """Merge-on-read for one token partition: newest snapshot ≤ as_of is
    the base, committed deltas after it fold on top with
    :func:`latest_per_tok_key`; canonical (tok, key) sort order."""
    import pyarrow.parquet as pq

    epochs = lake.committed_epochs(part)
    if as_of is not None:
        epochs = [e for e in epochs if e <= as_of]
    pieces: List[pa.Table] = []
    base_idx = -1
    for i in range(len(epochs) - 1, -1, -1):
        path = lake._data_path(part, epochs[i])
        if lake.fs.exists(path):
            pieces.append(pq.read_table(path, filesystem=lake.fs))
            base_idx = i
            break
    for epoch in epochs[base_idx + 1:]:
        dpath = lake._delta_path(part, epoch)
        if lake.fs.exists(dpath):
            pieces.append(pq.read_table(dpath, filesystem=lake.fs))
    if not pieces:
        return None
    merged = pieces[0] if len(pieces) == 1 \
        else latest_per_tok_key(pa.concat_tables(pieces))
    return merged.sort_by([("tok", "ascending"), ("key", "ascending")])


class _EmitTokenDeltas:
    """map_batches(..., batch_size=1) over LAKE partition ids: fold epochs
    ``(since, up_to]`` with the change feed's pre-image discipline and emit
    token-set DIFF rows. Memory bound = one lake partition's live state per
    task (the same bound the change feed and every partition fold carries).
    """

    __name__ = "_EmitTokenDeltas"

    def __init__(self, lake_root: str, lake_partitions: Optional[int],
                 since: int, up_to: int, key_col: str, text_col: str,
                 token_pattern: str, num_idx_partitions: int):
        self.lake_root, self.lake_partitions = lake_root, lake_partitions
        self.since, self.up_to = since, up_to
        self.key_col, self.text_col = key_col, text_col
        self.token_pattern = token_pattern
        self.num_idx_partitions = num_idx_partitions

    def __call__(self, batch: pa.Table) -> pa.Table:
        lake = Lake(self.lake_root, self.lake_partitions)
        tok_re = re.compile(self.token_pattern)
        out: List[pa.Table] = []
        for part in batch["part"].to_pylist():
            out.extend(self._one(lake, int(part), tok_re))
        if not out:
            return POSTING_SCHEMA.empty_table().append_column(
                "tok_part", pa.array([], pa.int32()))
        return pa.concat_tables(out)

    def _tokens(self, text: Optional[str], tok_re) -> Set[str]:
        return set(tok_re.findall(text.lower())) if text else set()

    def _live_text(self, state: Optional[pa.Table]) -> Dict[str, str]:
        if state is None or state.num_rows == 0:
            return {}
        dead = pc.fill_null(state["deleted"], False).to_numpy(
            zero_copy_only=False)
        keys = state[self.key_col].to_numpy(zero_copy_only=False)
        texts = state[self.text_col].to_pylist()
        return {k: t for k, t, d in zip(keys, texts, dead) if not d}

    def _one(self, lake: Lake, part: int, tok_re) -> List[pa.Table]:
        epochs = [e for e in lake.committed_epochs(part)
                  if self.since < e <= self.up_to]
        if not epochs:
            return []
        state = lake.read_partition(part, as_of=self.since)
        live = self._live_text(state)
        out: List[pa.Table] = []
        for e in epochs:
            winners = epoch_winners(lake, part, e, state)
            toks, keys, signs = [], [], []
            w_keys = winners[self.key_col].to_numpy(zero_copy_only=False)
            w_texts = winners[self.text_col].to_pylist()
            w_dead = (pc.fill_null(winners["deleted"], False).to_numpy(
                zero_copy_only=False) if "deleted" in winners.column_names
                else np.zeros(len(w_keys), bool))
            for k, t, d in zip(w_keys, w_texts, w_dead):
                old = self._tokens(live.get(k), tok_re)
                new = set() if d else self._tokens(t, tok_re)
                for tok in sorted(new - old):
                    toks.append(tok); keys.append(k); signs.append(1)
                for tok in sorted(old - new):
                    toks.append(tok); keys.append(k); signs.append(-1)
            if toks:
                t = pa.table({
                    "tok": pa.array(toks, pa.string()),
                    "key": pa.array(keys, pa.string()),
                    "epoch": pa.array(np.full(len(toks), e, np.int64)),
                    "sign": pa.array(np.array(signs, np.int8)),
                })
                out.append(t.append_column(
                    "tok_part",
                    pa.array(tok_partition(toks, self.num_idx_partitions))))
            # fold this epoch into the running pre-image
            state = merge_base_with_updates(state, winners)
            live = self._live_text(state)
        return out


class _ApplyTokenPartition:
    """One call per token-partition group: split the refresh window's rows
    by lake epoch and commit each as an idempotent delta — a retried or
    re-run refresh sees the (part, epoch) commit records and no-ops."""

    __name__ = "_ApplyTokenPartition"

    def __init__(self, root: str, num_partitions: int):
        self.root, self.num_partitions = root, num_partitions

    def __call__(self, group: pa.Table) -> pa.Table:
        lake = Lake(self.root, self.num_partitions)
        part = int(group["tok_part"][0].as_py())
        parts, epochs_o, skipped = [], [], []
        for e in sorted(set(group["epoch"].to_pylist())):
            sub = group.filter(pc.equal(group["epoch"], e)) \
                .drop_columns(list(_HELPER_COLS))
            if lake.is_committed(part, int(e)):
                out = lake.read_lineage(part, int(e))
                out.skipped = True
            else:
                # canonical order: commit bytes are a pure function of the
                # folded diff SET (determinism invariant)
                sub = sub.sort_by([("tok", "ascending"),
                                   ("key", "ascending")])
                signs = sub["sign"].to_numpy(zero_copy_only=False)
                out = lake.commit_delta(part, int(e), sub, Lineage(
                    part=part, epoch=int(e), events_consumed=sub.num_rows,
                    rows_upserted=int((signs > 0).sum()),
                    rows_deleted=int((signs < 0).sum()),
                    seq_min=int(e), seq_max=int(e)))
            parts.append(out.part); epochs_o.append(out.epoch)
            skipped.append(out.skipped)
        return pa.table({
            "part": pa.array(parts, pa.int32()),
            "epoch": pa.array(epochs_o, pa.int64()),
            "skipped": pa.array(skipped, pa.bool_()),
        })


class TextIndex:
    """Inverted token→postings keyspace over a Lake root (module docstring).

    ``root`` is the INDEX root — conventionally ``<lake>/textidx``. The
    indexed lake is passed to :meth:`refresh`, never stored: the index is a
    durable consumer, restartable anywhere the lake is reachable."""

    WATERMARK = "_watermark.json"

    def __init__(self, root: str, num_partitions: Optional[int] = None,
                 key_col: str = "url", text_col: str = "text",
                 token_pattern: str = r"\w+"):
        self.lake = Lake(root, num_partitions)
        self.num_partitions = self.lake.num_partitions
        self.key_col, self.text_col = key_col, text_col
        self.token_pattern = token_pattern

    # ------------------------------------------------------------ refresh
    def watermark(self) -> int:
        path = posixpath.join(self.lake.root, self.WATERMARK)
        try:
            with self.lake.fs.open(path, "rb") as f:
                return int(json.loads(f.read().decode())["epoch"])
        except FileNotFoundError:
            return -1

    def _set_watermark(self, epoch: int) -> None:
        self.lake._write_small_atomic(
            posixpath.join(self.lake.root, self.WATERMARK),
            json.dumps({"epoch": epoch}).encode())

    def refresh(self, lake: Lake, up_to: Optional[int] = None) -> List[dict]:
        """Fold lake epochs ``(watermark, up_to]`` into the index. Returns
        the per-(tok_part, epoch) commit lineage rows (≤ P × epochs, tiny).
        Exactly-once: a crashed refresh re-runs safely (deterministic
        re-emission + idempotent commits); the watermark only advances
        after every commit landed."""
        import ray.data as _rd

        since = self.watermark()
        if up_to is None:
            up_to = max((max(lake.committed_epochs(p), default=-1)
                         for p in range(lake.num_partitions)), default=-1)
        if up_to <= since:
            return []
        deltas = _rd.from_items(
            [{"part": p} for p in range(lake.num_partitions)]
        ).map_batches(
            _EmitTokenDeltas(lake.root, lake.num_partitions, since, up_to,
                             self.key_col, self.text_col,
                             self.token_pattern, self.num_partitions),
            batch_format="pyarrow", batch_size=1)
        lineage = deltas.groupby("tok_part").map_groups(
            _ApplyTokenPartition(self.lake.root, self.num_partitions),
            batch_format="pyarrow").take_all()  # ≤ P × epochs tiny rows
        self._set_watermark(up_to)
        return lineage

    # ------------------------------------------------------------- search
    def read_partition(self, part: int,
                       as_of: Optional[int] = None) -> Optional[pa.Table]:
        return read_posting_partition(self.lake, part, as_of=as_of)

    def search(self, tokens: List[str], as_of: Optional[int] = None):
        """Keys whose live text contains each probe token: a Ray Dataset of
        (token, key) rows — one read task per DISTINCT probe partition
        (``O(|probes|)`` partition reads at any index size); posting lists
        for common tokens stream as blocks, never through the driver."""
        import ray.data as _rd

        probes = sorted(set(tokens))
        parts = sorted({int(p) for p in
                        tok_partition(probes, self.num_partitions)})
        root, n = self.lake.root, self.num_partitions
        out_schema = pa.schema([("token", pa.string()),
                                ("key", pa.string())])
        probe_set = pa.array(probes, pa.string())

        def read_part(batch: pa.Table) -> pa.Table:
            lake = Lake(root, n)
            out: List[pa.Table] = []
            for part in batch["part"].to_pylist():
                t = read_posting_partition(lake, int(part), as_of=as_of)
                if t is None or t.num_rows == 0:
                    continue
                mask = pc.and_(pc.is_in(t["tok"], value_set=probe_set),
                               pc.greater(t["sign"], 0))
                hit = t.filter(mask)
                if hit.num_rows:
                    out.append(pa.table({"token": hit["tok"],
                                         "key": hit["key"]}))
            if not out:
                return out_schema.empty_table()
            return pa.concat_tables(out)

        if not parts:
            return _rd.from_arrow(out_schema.empty_table())
        return _rd.from_items([{"part": p} for p in parts]).map_batches(
            read_part, batch_format="pyarrow", batch_size=1)

    # ------------------------------------------------------------ compact
    def compact(self, parts: Optional[List[int]] = None) -> int:
        """Materialize each partition's posting fold as a snapshot at its
        tip epoch, PRUNING retracted rows (sign ≤ 0 — safe because the
        snapshot is the oldest base any later read folds from, so absence
        and a latest-row retraction read identically). Same
        no-new-commit-record contract as ``Lake.compact``; follow with
        ``self.lake.vacuum()`` to reclaim folded deltas."""
        done = 0
        for part in (parts if parts is not None
                     else range(self.num_partitions)):
            epochs = self.lake.committed_epochs(part)
            if not epochs:
                continue
            newest = epochs[-1]
            if self.lake.fs.exists(self.lake._data_path(part, newest)):
                continue
            state = self.read_partition(part)
            if state is None:
                continue
            state = state.filter(pc.greater(state["sign"], 0))
            self.lake.fs.makedirs(self.lake._part_dir(part), exist_ok=True)
            self.lake._write_table_atomic(
                state, self.lake._data_path(part, newest))
            done += 1
        return done

    def compact_distributed(self, parts: Optional[List[int]] = None) -> int:
        """One Ray task per index partition performs its fold + snapshot
        write (the driver never folds data at scale)."""
        import ray.data as _rd

        root, n = self.lake.root, self.num_partitions
        kc, tc, pat = self.key_col, self.text_col, self.token_pattern
        todo = list(parts) if parts is not None else list(range(n))
        if not todo:
            return 0

        def task(batch: pa.Table) -> pa.Table:
            idx = TextIndex(root, n, key_col=kc, text_col=tc,
                            token_pattern=pat)
            done = sum(idx.compact([int(p)])
                       for p in batch["part"].to_pylist())
            return pa.table({"done": pa.array([done], pa.int64())})

        out = _rd.from_items([{"part": p} for p in todo]).map_batches(
            task, batch_format="pyarrow", batch_size=1).take_all()  # ≤ P
        return int(sum(r["done"] for r in out))

    # -------------------------------------------------------------- misc
    def read_state(self, as_of: Optional[int] = None) -> pa.Table:
        """Whole LIVE posting set as one (tok, key)-sorted table — tests /
        small indexes only; scale reads go through :meth:`search`."""
        tables = []
        for part in range(self.num_partitions):
            t = self.read_partition(part, as_of=as_of)
            if t is not None and t.num_rows:
                tables.append(t.filter(pc.greater(t["sign"], 0)))
        if not tables:
            return POSTING_SCHEMA.empty_table()
        return pa.concat_tables(tables).sort_by(
            [("tok", "ascending"), ("key", "ascending")])

    def verify(self, deep: bool = False) -> dict:
        """fsck for the posting keyspace: the lake's generic commit-log ↔
        data-file audit plus index-specific deep checks — every partition's
        folded tip must be (tok, key)-sorted and (tok, key)-unique, and
        snapshots must carry no retracted rows."""
        report = self.lake.verify(deep=False)
        if deep:
            import pyarrow.parquet as pq
            for part in range(self.num_partitions):
                t = self.read_partition(part)
                if t is None:
                    continue
                pairs = list(zip(t["tok"].to_pylist(),
                                 t["key"].to_pylist()))
                if pairs != sorted(pairs):
                    report["issues"].append(
                        f"textidx part {part}: state not (tok, key)-sorted")
                if len(set(pairs)) != len(pairs):
                    report["issues"].append(
                        f"textidx part {part}: duplicate (tok, key) rows")
                epochs = self.lake.committed_epochs(part)
                for e in epochs:
                    spath = self.lake._data_path(part, e)
                    if self.lake.fs.exists(spath):
                        snap = pq.read_table(spath, filesystem=self.lake.fs)
                        if snap.num_rows and int(pc.min(
                                snap["sign"]).as_py()) <= 0:
                            report["issues"].append(
                                f"textidx part {part} epoch {e}: snapshot "
                                f"carries retracted rows")
            report["ok"] = not report["issues"]
        return report

    def purge_keys(self, keys: List[str]) -> dict:
        """Right-to-be-forgotten for the posting keyspace: remove every
        posting row of the victim keys (the index stores urls — PII the
        lake-side purge alone would leave behind). Rows are tok-partitioned,
        so this scans ALL index partitions — a maintenance op, not a serving
        path. Atomic-replace rewrites, idempotent; audit record stores key
        hashes only, commit log untouched (same contract as
        ``DupIndex.purge_keys``)."""
        import hashlib

        import pyarrow.parquet as pq

        key_set = pa.array(keys, pa.string())
        files_rewritten = rows_removed = 0
        for part in range(self.num_partitions):
            try:
                names = sorted(self.lake.fs.ls(self.lake._part_dir(part),
                                               detail=False))
            except FileNotFoundError:
                continue
            for full in names:
                name = posixpath.basename(full)
                if not (name.startswith(("epoch=", "delta="))
                        and name.endswith(".parquet")):
                    continue
                t = pq.read_table(full, filesystem=self.lake.fs)
                mask = pc.is_in(t["key"], value_set=key_set)
                hits = int(pc.sum(mask.cast(pa.int64())).as_py() or 0)
                if not hits:
                    continue
                self.lake._write_table_atomic(t.filter(pc.invert(mask)),
                                              full)
                files_rewritten += 1
                rows_removed += hits
        audit = {
            "op": "purge_keys",
            "key_hashes": sorted(hashlib.sha256(str(k).encode()).hexdigest()
                                 for k in keys),
            "files_rewritten": files_rewritten,
            "rows_removed": rows_removed,
        }
        batch_id = hashlib.sha256(
            "".join(audit["key_hashes"]).encode()).hexdigest()[:16]
        self.lake._write_small_atomic(
            posixpath.join(self.lake._commits_dir(),
                           f"purge-{batch_id}.json"),
            json.dumps(audit).encode())
        return audit

    def lineage(self) -> List[dict]:
        return self.lake.all_lineage()
