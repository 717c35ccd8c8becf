"""Generic last-writer-wins / argmax-per-key over a Dataset.

The CDC merge pattern (SURVEY.md §2.4/§2.7) generalized to any
(key, version-columns) pair: per-batch combiner bounds data before the
shuffle, then a per-key group reduce picks the winner — identical winner at
every phase because argmax over a total order is commutative + associative.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pyarrow as pa

import ray.data


def argmax_per_key(table: pa.Table, key: str,
                   version_cols: Sequence[str]) -> pa.Table:
    """Vectorized: keep the row with lexicographically-max version per key."""
    if table.num_rows <= 1:
        return table
    keys = table[key].to_numpy(zero_copy_only=False)
    _, inv = np.unique(keys, return_inverse=True)
    versions = []
    for col in reversed(list(version_cols)):
        arr = table[col]
        if pa.types.is_timestamp(arr.type):
            arr = arr.cast(pa.int64())
        versions.append(arr.to_numpy(zero_copy_only=False))
    order = np.lexsort(tuple(versions) + (inv,))
    sorted_codes = inv[order]
    is_last = np.ones(len(order), dtype=bool)
    is_last[:-1] = sorted_codes[1:] != sorted_codes[:-1]
    return table.take(pa.array(np.sort(order[is_last])))


def latest_state(ds: "ray.data.Dataset", key: str,
                 version_cols: Sequence[str]) -> "ray.data.Dataset":
    """Dataset-level LWW: combiner inside map_batches, then one groupby."""

    def combine(batch: pa.Table) -> pa.Table:
        return argmax_per_key(batch, key, version_cols)

    def reduce_group(group: pa.Table) -> pa.Table:
        return argmax_per_key(group, key, version_cols)

    return (
        ds.map_batches(combine, batch_format="pyarrow")
        .groupby(key)
        .map_groups(reduce_group, batch_format="pyarrow")
    )
