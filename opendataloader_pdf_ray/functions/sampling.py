"""Deterministic sampling / split assignment for training-data pipelines.

Both operators key on ``md5_number_lower(id)`` (DuckDB-mirrorable, identical
to Python ``md5(str(id)).digest()[8:]`` little-endian), so:

- the same row always lands in the same sample/split regardless of batch
  boundaries, concurrency, cluster size, or re-runs (resumable pipelines),
- a SQL oracle recomputes membership exactly — no RNG anywhere.

``hash_sample`` keeps rows with hash % denom < numer (an exact fraction);
``hash_split`` assigns train/val/test by hash % 100 against cumulative
percentage bounds."""

from __future__ import annotations

import hashlib
from typing import List, Sequence, Tuple

import numpy as np
import pyarrow as pa


def _hash64(ids: Sequence) -> np.ndarray:
    out = np.empty(len(ids), dtype=np.uint64)
    for i, v in enumerate(ids):
        out[i] = int.from_bytes(
            hashlib.md5(str(v).encode("utf-8")).digest()[8:], "little")
    return out


def hash_sample(batch: pa.Table, id_col: str, numer: int,
                denom: int) -> pa.Table:
    """Keep the exact ``numer/denom`` hash-fraction of rows."""
    h = _hash64(batch[id_col].to_pylist())
    return batch.filter(pa.array(h % np.uint64(denom) < numer))


def hash_split(batch: pa.Table, id_col: str,
               splits: List[Tuple[str, int]] = (("train", 80), ("val", 10),
                                                ("test", 10)),
               out_col: str = "split") -> pa.Table:
    """Append a split label column; ``splits`` are (name, percent) summing
    to 100, assigned by hash % 100 against cumulative bounds."""
    assert sum(p for _, p in splits) == 100
    h = (_hash64(batch[id_col].to_pylist()) % np.uint64(100)).astype(np.int64)
    labels = np.empty(len(h), dtype=object)
    lo = 0
    for name, pct in splits:
        labels[(h >= lo) & (h < lo + pct)] = name
        lo += pct
    return batch.append_column(out_col, pa.array(labels.tolist(), pa.string()))
