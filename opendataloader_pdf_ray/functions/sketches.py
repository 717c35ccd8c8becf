"""Mergeable cardinality sketches: KMV (k minimum values) distinct count.

At 100 TB, ``count(distinct x)`` per group is a full shuffle of every
distinct value; a KMV sketch reduces each group's contribution to a k×8-byte
bounded summary that merges associatively — per-batch partials → one
small-group merge, the same partial-first shape as the repo's aggregates.
(KMV / bottom-k: Bar-Yossef et al. 2002; the unbiased estimator
(k−1)/h_(k) with hashes uniform on [0, 2^64).)

Determinism + SQL parity: the value hash is DuckDB's ``md5_number_lower``
(== ``int.from_bytes(md5(s).digest()[8:], "little")``), the estimate is
exact integer math ``(k−1)·2^64 // h_(k)``, so a DuckDB oracle recomputes
the sketch bit-for-bit — an *oracle-verifiable approximate operator*.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_TWO64 = 1 << 64


def md5_number_lower(s: str) -> int:
    """DuckDB md5_number_lower: little-endian uint64 of md5 bytes [8:16]."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[8:], "little")


def kmv_partial(batch: pa.Table, key_col: str, value_col: str,
                k: int = 64) -> pa.Table:
    """Per-batch partial: for each key, the ≤k smallest distinct value
    hashes, serialized as a sorted uint64 LE byte blob (bounded: k×8 bytes
    per key per batch).

    Vectorized (round-2 verdict item #8): md5 runs once per DISTINCT value
    (values repeat heavily across rows), pair dedup + per-key bottom-k are
    numpy (unique / lexsort / reduceat boundaries) — bit-identical output to
    the row-loop version, same DuckDB oracle."""
    n = batch.num_rows
    if n == 0:
        return pa.table({key_col: pa.array([], batch.schema.field(key_col).type),
                         "kmv": pa.array([], pa.binary())})
    keys = np.asarray(batch[key_col].to_pylist(), dtype=object)
    vals = np.asarray([str(v) for v in batch[value_col].to_pylist()],
                      dtype=object)
    uv, vinv = np.unique(vals, return_inverse=True)
    hashes = np.array([md5_number_lower(s) for s in uv], dtype=np.uint64)
    uk, kinv = np.unique(keys, return_inverse=True)
    # distinct (key, value) pairs via a combined code
    code = np.unique(kinv.astype(np.int64) * len(uv) + vinv)
    pk = code // len(uv)
    h = hashes[code % len(uv)]
    order = np.lexsort((h, pk))  # per key: hashes ascending
    pk, h = pk[order], h[order]
    starts = np.flatnonzero(np.r_[True, pk[1:] != pk[:-1]])
    bounds = np.r_[starts, len(pk)]
    out_b = [h[s:min(s + k, e)].tobytes()
             for s, e in zip(bounds[:-1], bounds[1:])]
    return pa.table({key_col: pa.array([uk[pk[s]] for s in starts]),
                     "kmv": pa.array(out_b, pa.binary())})


def kmv_merge_estimate(group: pa.Table, key_col: str,
                       k: int = 64) -> pa.Table:
    """Merge one key's partials and emit the distinct-count estimate:
    exact when < k distinct hashes survive, else (k−1)·2^64 // h_(k)."""
    blobs = group["kmv"].to_pylist()
    hs = np.unique(np.concatenate(
        [np.frombuffer(b, dtype=np.uint64) for b in blobs]))
    if len(hs) < k:
        est = len(hs)
    else:
        est = (k - 1) * _TWO64 // int(hs[k - 1])
    return pa.table({key_col: group[key_col][:1],
                     "kmv_estimate": pa.array([est], pa.int64())})


# --------------------------------------------------------- Misra-Gries (freq)


def mg_partial(keys: np.ndarray, k: int = 1024) -> "tuple[np.ndarray, np.ndarray]":
    """Per-batch Misra-Gries frequency summary: exact counts truncated to ≤k
    entries by the decrement rule (subtract the (k+1)-th largest count from
    all, drop ≤0). Mergeable by summing counts then re-truncating; the merged
    summary under-counts any key by at most n_total/(k+1) — the classic
    heavy-hitters guarantee (Misra & Gries 1982)."""
    uniq, counts = np.unique(keys, return_counts=True)
    counts = counts.astype(np.int64)
    if len(uniq) > k:
        thresh = np.partition(counts, len(counts) - k - 1)[len(counts) - k - 1]
        counts = counts - thresh
        keep = counts > 0
        uniq, counts = uniq[keep], counts[keep]
    return uniq, counts


def mg_merge(keys: np.ndarray, counts: np.ndarray,
             k: int = 1024) -> "tuple[np.ndarray, np.ndarray]":
    """Merge MG summary rows (sum per key, truncate to ≤k survivors)."""
    uniq, inv = np.unique(keys, return_inverse=True)
    sums = np.zeros(len(uniq), np.int64)
    np.add.at(sums, inv, counts.astype(np.int64))
    if len(uniq) > k:
        thresh = np.partition(sums, len(sums) - k - 1)[len(sums) - k - 1]
        sums = sums - thresh
        keep = sums > 0
        uniq, sums = uniq[keep], sums[keep]
    return uniq, sums
