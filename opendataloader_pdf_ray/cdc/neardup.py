"""Near-dup-at-ingest: an incrementally-maintained SimHash band index.

The NEAR-duplicate sibling of the exact fingerprint index (dupindex.py):
where that keyspace answers "who first wrote this EXACT content", this one
answers "who first wrote content WITHIN Hamming ≤ h of this" — the
lake-integrated, streaming form of the batch ``dedup.simhash_pairs``
operator, fused with the exactly-once CDC machinery (the reference's
duplicate-suppression family, core/processors/DocumentProcessor.java
removeSameTextChunks, generalized to near-duplicates at ingest time).

Design — ONE trick makes the whole exact-index machinery reusable:

- **fingerprint encoding**: each content version's 64-bit SimHash signature
  (functions/dedup.SimHasher — md5-gram based, so a DuckDB oracle can
  recompute it bit-for-bit) is split into ``max_hamming + 1`` bands
  (pigeonhole: a pair within Hamming ≤ h differs in ≤ h bands, so at least
  one band matches exactly — candidate recall is provably 1). Each band
  becomes one 17-byte binary fingerprint ``band(1) ‖ band_key(8,BE) ‖
  sim(8,BE)``. Rows sharing a 9-byte prefix are band-collision candidates;
  rows sharing all 17 bytes carry identical signatures.
- **storage / fold / commits**: byte-fingerprints mean
  :func:`~.dupindex.first_per_fp` (FWW per fp), ``_ApplyIndexPartition``
  (idempotent ``(part, epoch)`` commits), ``read_index_partition``
  (merge-on-read delta chains), compact/vacuum/fsck/purge ALL apply
  unchanged — :class:`NearDupIndex` subclasses :class:`~.dupindex.DupIndex`
  and overrides only the fingerprint partial and the attribution lookup.
  The index inherits exactly-once, crash/resume, ``as_of`` time travel and
  snapshot/delta commit modes for free.
- **partitioning**: ``fp_partition`` hashes the first 8 fp bytes
  (band ‖ band_key[:7]) — every row of one band bucket lands in one index
  partition, so attribution probes are co-located lookups, never joins.
- **attribution** (:meth:`NearDupIndex.attribute`): three stages, all
  shuffles slim (text never crosses an exchange) —
  1. probe: B = nbands rows per input row, partitioned like the index;
  2. per-partition attach: candidates = index rows sharing the probe's
     9-byte prefix (two bisects on the fp-sorted partition), Hamming-verified
     vectorized, per-probe band-best owner by min ``(ts, seq, key)``;
  3. per-row fold: min across the B band-bests. Correctness: the global
     earliest neighbor shares ≥1 band with the probe (pigeonhole), is the
     minimum within that band's candidate set, hence survives stage 3.
- **semantics**: ``near_dup_of`` = earliest writer (min ts, seq, key) among
  the row's DIRECT Hamming-≤-h neighbors in the index, or null when that
  earliest neighbor is the row's own key (or no neighbor exists). Identical
  to the exact index's first-writer rule with "identical content" relaxed
  to "near content"; NOT a transitive closure (that is the batch
  ``dedup_minhash_clusters`` operator's job).
"""

from __future__ import annotations

import sys
from bisect import bisect_left, bisect_right
from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dupindex import DupIndex, first_per_fp, fp_partition, read_index_partition
from .lake import Lake

_I64_MAX = np.iinfo(np.int64).max
_PROBE_HELPERS = ("fp_part", "prefix", "sim")


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount over a uint64 array (unrolled shift-mask with
    early exit — same kernel as dedup.simhash_pairs)."""
    x = x.copy()
    out = np.zeros(x.shape, dtype=np.int64)
    for _ in range(64):
        out += (x & np.uint64(1)).astype(np.int64)
        x >>= np.uint64(1)
        if not x.any():
            break
    return out


class NearDupIndex(DupIndex):
    """SimHash band keyspace over a Lake root (see module docstring).

    ``root`` is the INDEX root — for CDC-integrated use,
    ``<lake>/nearidx``. One content version occupies ``nbands`` index rows;
    :meth:`count_fingerprints` therefore counts band entries, not
    signatures."""

    def __init__(self, root: str, num_partitions: Optional[int] = None,
                 key_col: str = "url", ts_col: str = "warc_ts",
                 seq_col: str = "seq", text_col: str = "text",
                 commit_mode: str = "snapshot", max_hamming: int = 3,
                 ngram: int = 2):
        super().__init__(root, num_partitions, key_col=key_col,
                         ts_col=ts_col, seq_col=seq_col, text_col=text_col,
                         commit_mode=commit_mode)
        self.max_hamming = max_hamming
        self.ngram = ngram
        # band geometry — MUST match dedup.simhash_pairs so the pigeonhole
        # recall argument (h+1 bands for Hamming ≤ h) holds
        self.nbands = max(2, max_hamming + 1)
        base, rem = divmod(64, self.nbands)
        widths = np.array([base + 1] * rem + [base] * (self.nbands - rem),
                          dtype=np.uint64)
        self._offsets = np.concatenate(
            [[0], np.cumsum(widths)[:-1]]).astype(np.uint64)
        self._masks = ((np.uint64(1) << widths) - np.uint64(1))

    # ------------------------------------------------------------ encoding
    def _pack_fps(self, bands: np.ndarray, bvals: np.ndarray,
                  sims: np.ndarray) -> List[bytes]:
        """band(1 byte) ‖ band_key(8 bytes BE) ‖ simhash(8 bytes BE).
        Big-endian keeps the fp sort order == (band, band_key, sim) numeric
        order, which is what makes prefix ranges contiguous (bisect)."""
        n = len(bands)
        buf = np.empty((n, 17), dtype=np.uint8)
        buf[:, 0] = bands.astype(np.uint8)
        buf[:, 1:9] = bvals.astype(">u8").view(np.uint8).reshape(n, 8)
        buf[:, 9:17] = sims.astype(">u8").view(np.uint8).reshape(n, 8)
        return [row.tobytes() for row in buf]

    def _sigs(self, hasher, texts: List[str]) -> np.ndarray:
        return np.array([hasher.sig(t) for t in texts], dtype=np.uint64)

    def _band_keys(self, sims: np.ndarray) -> np.ndarray:
        """(n, nbands) uint64 band values."""
        return (sims[:, None] >> self._offsets[None, :]) & self._masks[None, :]

    # -------------------------------------------------------------- update
    def _partial(self):
        """Per-batch: signature → explode nbands fingerprints per row → FWW
        pre-reduce → partition. ``n_events`` is 1 only on band-0 rows so the
        lineage counter sums to true event counts, not nbands× them."""
        from ..functions.dedup import SimHasher

        key_col, ts_col = self.key_col, self.ts_col
        seq_col, text_col = self.seq_col, self.text_col
        num_partitions, nbands = self.num_partitions, self.nbands
        hasher = SimHasher(ngram=self.ngram)
        index = self

        def fn(batch: pa.Table) -> pa.Table:
            batch = batch.filter(pc.is_valid(batch[text_col]))
            n = batch.num_rows
            empty = pa.table({
                "fp": pa.array([], pa.binary()),
                key_col: pa.array([], batch[key_col].type),
                ts_col: pa.array([], batch[ts_col].type),
                seq_col: pa.array([], batch[seq_col].type),
                "n_events": pa.array([], pa.int64()),
                "fp_part": pa.array([], pa.int32()),
            })
            if n == 0:
                return empty
            sims = index._sigs(hasher, batch[text_col].to_pylist())
            bvals = index._band_keys(sims)
            bands = np.tile(np.arange(nbands, dtype=np.int32), n)
            fps = index._pack_fps(bands, bvals.reshape(-1),
                                  np.repeat(sims, nbands))
            take = pa.array(np.repeat(np.arange(n, dtype=np.int64), nbands))
            t = pa.table({
                "fp": pa.array(fps, pa.binary()),
                key_col: batch[key_col].take(take),
                ts_col: batch[ts_col].take(take),
                seq_col: batch[seq_col].take(take),
                "n_events": pa.array((bands == 0).astype(np.int64)),
            })
            t = first_per_fp(t, key_col, ts_col, seq_col,
                             count_col="n_events")
            parts = fp_partition(t["fp"].to_pylist(), num_partitions)
            return t.append_column("fp_part", pa.array(parts, pa.int32()))

        return fn

    # --------------------------------------------------------- attribute
    def attribute(self, ds, keep_cols: Optional[List[str]] = None,
                  as_of: Optional[int] = None, max_bucket: int = 65536):
        """Annotate rows with ``near_dup_of`` / ``is_near_dup`` (module
        docstring semantics). ``keep_cols`` should be slim — they ride two
        shuffles ×nbands rows (the text column never does)."""
        from ..functions.dedup import SimHasher

        key_col, text_col = self.key_col, self.text_col
        ts_col, seq_col = self.ts_col, self.seq_col
        keep = list(keep_cols) if keep_cols else [key_col]
        for c in (key_col, ts_col, seq_col):
            if c not in keep:
                keep.insert(0, c)
        num_partitions, root = self.num_partitions, self.lake.root
        nbands, max_h = self.nbands, self.max_hamming
        hasher = SimHasher(ngram=self.ngram)
        index = self

        def probe(batch: pa.Table) -> pa.Table:
            batch = batch.filter(pc.is_valid(batch[text_col]))
            n = batch.num_rows
            if n == 0:
                cols = {c: pa.array([], batch[c].type) for c in keep}
                cols["prefix"] = pa.array([], pa.binary())
                cols["sim"] = pa.array([], pa.uint64())
                cols["fp_part"] = pa.array([], pa.int32())
                return pa.table(cols)
            sims = index._sigs(hasher, batch[text_col].to_pylist())
            bvals = index._band_keys(sims)
            bands = np.tile(np.arange(nbands, dtype=np.int32), n)
            fps = index._pack_fps(bands, bvals.reshape(-1),
                                  np.repeat(sims, nbands))
            take = pa.array(np.repeat(np.arange(n, dtype=np.int64), nbands))
            cols = {c: batch[c].take(take) for c in keep}
            cols["prefix"] = pa.array([f[:9] for f in fps], pa.binary())
            cols["sim"] = pa.array(np.repeat(sims, nbands), pa.uint64())
            t = pa.table(cols)
            parts = fp_partition(fps, num_partitions)
            return t.append_column("fp_part", pa.array(parts, pa.int32()))

        def attach(group: pa.Table) -> pa.Table:
            lake = Lake(root, num_partitions)
            part = int(group["fp_part"][0].as_py())
            idx = read_index_partition(lake, part, key_col, ts_col, seq_col,
                                       as_of=as_of)
            m = group.num_rows
            best_key = np.full(m, "", dtype=object)
            best_ts = np.full(m, _I64_MAX, dtype=np.int64)
            best_seq = np.full(m, _I64_MAX, dtype=np.int64)
            if idx is not None and idx.num_rows:
                fps = idx["fp"].to_pylist()  # fp-sorted (canonical form)
                cand_sims = np.frombuffer(
                    b"".join(f[9:17] for f in fps), dtype=">u8").astype(np.uint64)
                cand_ts = idx[ts_col].cast(pa.int64()).to_numpy(
                    zero_copy_only=False)
                cand_seq = idx[seq_col].to_numpy(zero_copy_only=False)
                cand_keys = np.asarray(idx[key_col].to_pylist(), dtype=object)
                _, kinv = np.unique(cand_keys, return_inverse=True)
                order = np.lexsort((kinv, cand_seq, cand_ts))
                rank = np.empty(len(fps), dtype=np.int64)
                rank[order] = np.arange(len(fps))
                big = len(fps)
                probe_sims = group["sim"].to_numpy(zero_copy_only=False) \
                    .astype(np.uint64)
                prefixes = group["prefix"].to_pylist()
                by_prefix: dict = {}
                for i, p in enumerate(prefixes):
                    by_prefix.setdefault(p, []).append(i)
                for p, rows in by_prefix.items():
                    lo = bisect_left(fps, p)
                    hi = bisect_right(fps, p + b"\xff" * 8)
                    if hi <= lo:
                        continue
                    if hi - lo > max_bucket:
                        print(f"[neardup] band bucket of {hi - lo} capped at "
                              f"{max_bucket}", file=sys.stderr)
                        hi = lo + max_bucket
                    sel = np.array(rows, dtype=np.int64)
                    ham = _popcount64(
                        cand_sims[lo:hi][None, :] ^ probe_sims[sel][:, None])
                    r = np.where(ham <= max_h, rank[lo:hi][None, :], big)
                    j = np.argmin(r, axis=1)
                    has = r[np.arange(len(sel)), j] < big
                    hit = sel[has]
                    cj = lo + j[has]
                    best_key[hit] = cand_keys[cj]
                    best_ts[hit] = cand_ts[cj]
                    best_seq[hit] = cand_seq[cj]
            out = group.drop_columns(list(_PROBE_HELPERS))
            rid = group[seq_col].to_numpy(zero_copy_only=False)
            out = out.append_column(
                "rid_part", pa.array((rid % num_partitions).astype(np.int32)))
            out = out.append_column("cand_key",
                                    pa.array(best_key.tolist(), pa.string()))
            out = out.append_column("cand_ts", pa.array(best_ts, pa.int64()))
            return out.append_column("cand_seq", pa.array(best_seq, pa.int64()))

        def fold(group: pa.Table) -> pa.Table:
            """Min-(cand_ts, cand_seq, cand_key) across the nbands band-bests
            of each row (row identity = its unique seq)."""
            rid = group[seq_col].to_numpy(zero_copy_only=False)
            cts = group["cand_ts"].to_numpy(zero_copy_only=False)
            cseq = group["cand_seq"].to_numpy(zero_copy_only=False)
            ckeys = np.asarray(group["cand_key"].to_pylist(), dtype=object)
            _, kinv = np.unique(ckeys, return_inverse=True)
            _, rinv = np.unique(rid, return_inverse=True)
            order = np.lexsort((kinv, cseq, cts, rinv))
            is_first = np.ones(len(order), dtype=bool)
            is_first[1:] = rinv[order][1:] != rinv[order][:-1]
            win = group.take(pa.array(order[is_first]))
            keys = win[key_col].to_pylist()
            cands = win["cand_key"].to_pylist()
            dup = [c if c and c != k else None for c, k in zip(cands, keys)]
            out = win.drop_columns(["rid_part", "cand_key", "cand_ts",
                                    "cand_seq"])
            out = out.append_column("near_dup_of",
                                    pa.array(dup, win[key_col].type))
            return out.append_column(
                "is_near_dup", pa.array([d is not None for d in dup],
                                        pa.bool_()))

        return (ds.map_batches(probe, batch_format="pyarrow")
                  .groupby("fp_part")
                  .map_groups(attach, batch_format="pyarrow")
                  .groupby("rid_part")
                  .map_groups(fold, batch_format="pyarrow"))
