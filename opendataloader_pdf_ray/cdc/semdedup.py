"""SemDeDup over the LIVE lake — semantic dup attribution for the CDC plane.

``pipelines/embeddings.embedding_semdedup`` proves the method (k-means the
embedding space, prune within clusters by cosine — Abbas et al. 2023) over
the testdata corpus with a chained-CTE oracle; this module runs it over a
LIVE lake's ``vec`` column (the ``--embed`` / ``backfill --transform
embed`` hashed-token embedding): ``semdups LAKE`` attributes every live
row with ``(cluster_id, is_sem_dup, sem_dup_of)`` — the semantic sibling
of ``dups`` (exact FWW) and ``dups --near`` (SimHash bands). Exact
hashing misses re-encoded/templated copies; SimHash needs token overlap;
the embedding path catches what both miss.

Determinism (the house invariant): seeds are the vectors of the k
lexicographically-smallest urls (bounded per-batch top-k → driver merge),
the Lloyd fit is the integer-exact distributed kernel
(functions/clustering.py — bit-identical at any batch size), and the
within-cluster keep rule is greedy-by-url (a row is a semantic dup iff a
lexicographically EARLIER url in its cluster has cosine ≥ threshold;
``sem_dup_of`` = the earliest such url). Equal lake state → byte-equal
attribution at any concurrency.

100-TB shape: one slim projection (url, 256-byte embedding) materialized
once; the Lloyd fit shuffles ≤k×D integer partials per batch; the prune
is per-cluster O(m²) with SemDeDup's own k≈N/10³ sizing bounding m; rows
ride the cluster shuffle with the embedding packed binary (no list<>
payloads in the exchange).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa

import ray

from ..functions import clustering as cl
from .lake import Lake


def _unpack_vec(blob: bytes) -> np.ndarray:
    return np.frombuffer(blob, np.float32).astype(np.float64)


def attribute_semantic(lake: Lake, k: int = 8, iters: int = 3,
                       threshold: float = 0.95,
                       as_of: Optional[int] = None) -> "ray.data.Dataset":
    """(url, cluster_id, is_sem_dup, sem_dup_of) for every live row with
    a non-null ``vec`` — sorted by url (module docstring)."""
    ds = lake.read_dataset(as_of=as_of, columns=["url", "vec"])

    def to_emb(batch: pa.Table) -> pa.Table:
        urls, embs = [], []
        for url, blob in zip(batch["url"].to_pylist(),
                             batch["vec"].to_pylist()):
            if blob is None:
                continue
            urls.append(url)
            embs.append(_unpack_vec(blob).tolist())
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "embedding": pa.array(embs, pa.list_(pa.float64())),
        })

    emb = ds.map_batches(to_emb, batch_format="pyarrow").materialize()
    if emb.count() == 0:
        raise ValueError(
            "semdups needs a 'vec' column with live embeddings — ingest "
            "with --embed or run `backfill --transform embed` first")

    # deterministic seeds: the k lexicographically-smallest urls' vectors
    # (per-batch local top-k → ≤k·batches tiny rows to the driver)
    def local_topk(batch: pa.Table) -> pa.Table:
        t = batch.sort_by([("url", "ascending")])
        return t.slice(0, k)

    head = sorted(emb.map_batches(local_topk,
                                  batch_format="pyarrow").take_all(),
                  key=lambda r: r["url"])[:k]
    seeds = np.array([r["embedding"] for r in head], np.float64)

    centroids = cl.kmeans_fit(emb, seeds, iters)
    c_ref = ray.put(centroids)

    def assign_pack(batch: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        x = np.array(batch["embedding"].to_pylist(), np.float64)
        a, _ = cl._assign(x, c)
        return pa.table({
            "url": batch["url"],
            "cluster_id": pa.array(a.astype(np.int64)),
            "emb": pa.array([row.tobytes() for row in x], pa.binary()),
        })

    def prune(group: pa.Table) -> pa.Table:
        urls = np.array(group["url"].to_pylist())
        order = np.argsort(urls)
        urls = urls[order]
        X = np.stack([np.frombuffer(b, np.float64)
                      for b in group["emb"].to_pylist()])[order]
        norms = np.linalg.norm(X, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        Xn = X / norms
        tri = np.tril(Xn @ Xn.T >= threshold, k=-1)  # earlier-url matches
        is_dup = tri.any(axis=1)
        first = np.argmax(tri, axis=1)
        dup_of = [urls[j] if d else None
                  for d, j in zip(is_dup, first)]
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "cluster_id": pa.array(
                np.full(len(urls), int(group["cluster_id"][0].as_py()),
                        np.int64)),
            "is_sem_dup": pa.array(is_dup),
            "sem_dup_of": pa.array(dup_of, pa.string()),
        })

    return (emb.map_batches(assign_pack, batch_format="pyarrow")
               .groupby("cluster_id")
               .map_groups(prune, batch_format="pyarrow")
               .sort("url"))


def semantic_summary(attributed: "ray.data.Dataset") -> Dict:
    """Driver-safe rollup (≤k tiny rows + scalars; vectorized — no
    per-row Python filter)."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        return pa.table({
            "n": pa.array([batch.num_rows], pa.int64()),
            "d": pa.array([int(pc.sum(batch["is_sem_dup"].cast(
                pa.int64())).as_py() or 0)], pa.int64()),
        })

    from ray.data.aggregate import Sum

    tot = (attributed.map_batches(partial, batch_format="pyarrow")
                     .aggregate(Sum("n", alias_name="n"),
                                Sum("d", alias_name="d")))
    clusters = attributed.groupby("cluster_id").count().count()
    return {"rows": int(tot["n"] or 0), "sem_dups": int(tot["d"] or 0),
            "clusters": int(clusters)}
