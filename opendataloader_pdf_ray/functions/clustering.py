"""Distributed k-means over an embedding column — the iterative-algorithm
pattern (Lloyd's algorithm, MacQueen 1967 / Lloyd 1982, public knowledge):
broadcast small state (k×D centroids), one streaming assignment pass per
iteration with per-batch PARTIAL sums, tiny k-row groupby, driver updates
the centroids. The corpus never leaves the workers; the driver only ever
holds k×D numbers.

Determinism is load-bearing (CLAUDE.md): float partial sums are
accumulation-order-dependent, so per-cluster vector sums and inertia use the
exact integer-scaled trick (``pipelines/common.to_scaled_int64`` rationale) —
embeddings scaled by 2^20 and summed as int64 are bit-identical at ANY batch
size / concurrency, so centroids (int_sum / (n·2^20)) are exactly
batch-invariant. Assignments (``x @ centroids.T`` + argmin, ties to the
lowest cluster id) additionally rely on BLAS matmul giving the same result
for the same row regardless of matrix SHAPE — not guaranteed in principle
(ADVICE r2): a distance tie within ~1 ulp could in theory flip between
batch sizes. In practice the oracle's margin is astronomically wider (the
DuckDB chained-CTE replay and the sequential NumPy reference both match
bit-for-bit across tested batch sizes); if a corpus ever produces near-tie
distances, switch the assignment to a per-row ``einsum`` reduction with
fixed accumulation order. Empty clusters keep their previous centroid.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pyarrow as pa

import ray
import ray.data

_SCALE = float(1 << 20)


def _embedding_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(arr[0])
    return flat.reshape(-1, dim)


def _assign(x: np.ndarray, centroids: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(cluster ids, squared distances) — vectorized, ties → lowest id."""
    # |x-c|^2 = |x|^2 - 2 x·c + |c|^2 ; |x|^2 constant per row for argmin
    d2 = (-2.0 * x @ centroids.T) + (centroids * centroids).sum(axis=1)
    assign = np.argmin(d2, axis=1)
    d2min = d2[np.arange(len(x)), assign] + (x * x).sum(axis=1)
    return assign, np.maximum(d2min, 0.0)


def kmeans_fit(ds: "ray.data.Dataset", centroids: np.ndarray, iters: int,
               col: str = "embedding") -> np.ndarray:
    """Lloyd iterations over a Dataset; returns the final k×D centroids.

    Each iteration: broadcast centroids (ray.put once, read per task), one
    map_batches pass emitting ≤k partial rows per batch (cluster, n, packed
    int64 vector sum), k-row groupby reduce, driver division. Seed via
    ``seed_centroids``."""

    def make_partials(c_ref):
        def partials(batch: pa.Table) -> pa.Table:
            c = ray.get(c_ref) if not isinstance(c_ref, np.ndarray) else c_ref
            x = _embedding_matrix(batch, col)
            xi = np.rint(x * _SCALE).astype(np.int64)
            assign, _ = _assign(x, c)
            uniq = np.unique(assign)
            sums = np.zeros((len(uniq), x.shape[1]), np.int64)
            counts = np.zeros(len(uniq), np.int64)
            for j, u in enumerate(uniq):
                m = assign == u
                sums[j] = xi[m].sum(axis=0)
                counts[j] = int(m.sum())
            return pa.table({
                "cluster": pa.array(uniq.astype(np.int64)),
                "n": pa.array(counts),
                "vsum": pa.array([s.tobytes() for s in sums], pa.binary()),
            })
        return partials

    def reduce_group(g: pa.Table) -> pa.Table:
        mats = np.stack([np.frombuffer(b, np.int64)
                         for b in g["vsum"].to_pylist()])
        return pa.table({
            "cluster": g["cluster"][:1],
            "n": pa.array([int(g["n"].to_numpy().sum())], pa.int64()),
            "vsum": pa.array([mats.sum(axis=0).tobytes()], pa.binary()),
        })

    for _ in range(iters):
        c_ref = ray.put(centroids)
        rows = (ds.map_batches(make_partials(c_ref), batch_format="pyarrow")
                  .groupby("cluster")
                  .map_groups(reduce_group, batch_format="pyarrow")
                  .take_all())  # ≤ k rows
        new_c = centroids.copy()  # empty clusters keep their centroid
        for r in rows:
            s = np.frombuffer(r["vsum"], np.int64).astype(np.float64)
            new_c[int(r["cluster"])] = s / (r["n"] * _SCALE)
        centroids = new_c
    return centroids


def seed_centroids(path: str, k: int, id_col: str = "vec_id",
                   col: str = "embedding") -> np.ndarray:
    """Deterministic init: embeddings of the k smallest ids (tiny pruned
    read — at 100 TB this is one row-group filter, not a scan)."""
    import pyarrow.parquet as pq

    t = pq.read_table(path, columns=[id_col, col],
                      filters=[(id_col, "<", k)])
    order = np.argsort(t[id_col].to_numpy(zero_copy_only=False))
    return _embedding_matrix(t, col)[order]


def kmeans_stats(ds: "ray.data.Dataset", centroids: np.ndarray,
                 col: str = "embedding") -> "ray.data.Dataset":
    """Final assignment pass → (cluster_id, n, inertia): counts + exact
    integer-scaled squared-distance sums (order-invariant), inertia reported
    as a rounded double."""
    c_ref = ray.put(centroids)

    def partials(batch: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        x = _embedding_matrix(batch, col)
        assign, d2 = _assign(x, c)
        d2i = np.rint(d2 * 1e6).astype(np.int64)
        uniq = np.unique(assign)
        counts = np.zeros(len(uniq), np.int64)
        sums = np.zeros(len(uniq), np.int64)
        for j, u in enumerate(uniq):
            m = assign == u
            counts[j] = int(m.sum())
            sums[j] = int(d2i[m].sum())
        return pa.table({"cluster_id": pa.array(uniq.astype(np.int64)),
                         "n": pa.array(counts),
                         "d2i": pa.array(sums)})

    from ray.data.aggregate import Sum

    out = (ds.map_batches(partials, batch_format="pyarrow")
             .groupby("cluster_id")
             .aggregate(Sum("n", alias_name="n"),
                        Sum("d2i", alias_name="d2i")))

    def finalize(t: pa.Table) -> pa.Table:
        inertia = t["d2i"].to_numpy(zero_copy_only=False) / 1e6
        return pa.table({"cluster_id": t["cluster_id"], "n": t["n"],
                         "inertia": pa.array(np.round(inertia, 6))})

    return out.map_batches(finalize, batch_format="pyarrow")
