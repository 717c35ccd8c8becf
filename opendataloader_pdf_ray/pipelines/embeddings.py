"""Embedding-table queries: similarity search + vector stats + near-dup."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data
from ray.data.aggregate import Count

from ..functions import dedup as dd
from ..functions.similarity import brute_force_topk, lsh_topk
from .common import read_table, round_cols


def _query_vector(sf_dir: str) -> np.ndarray:
    """Deterministic query: the embedding of the smallest vec_id."""
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    idx = int(np.argmin(t["vec_id"].to_numpy(zero_copy_only=False)))
    return np.array(t["embedding"][idx].as_py(), dtype=np.float64)


def knn_bruteforce(sf_dir: str):
    """Exact cosine top-10 for the vec_id-0 query (query itself excluded).
    SQL oracle via DuckDB list_cosine_similarity."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q = _query_vector(sf_dir)
    return brute_force_topk(ds, q, k=10, exclude_ids={0})


KNN_SQL = """
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings ORDER BY vec_id LIMIT 1)
SELECT vec_id,
       round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT qe FROM q)), 6) AS cosine
FROM embeddings WHERE vec_id <> 0
ORDER BY cosine DESC, vec_id ASC LIMIT 10
"""


def knn_lsh(sf_dir: str):
    """Approximate top-10 via hyperplane-LSH bucketing (rows-only; recall vs
    brute force asserted in tests)."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q = _query_vector(sf_dir)
    return lsh_topk(ds, q, k=10, nbits=8, probe_hamming=2)


def embedding_label_stats(sf_dir: str):
    """Per-label count + mean of the first embedding component — exercises the
    list<float> column through Arrow without python-object conversion."""
    ds = read_table(sf_dir, "embeddings", columns=["label", "embedding"])

    from .common import round_half_away, to_scaled_int64

    def partial(batch: pa.Table) -> pa.Table:
        labels = batch["label"].to_numpy(zero_copy_only=False)
        # list<float> → float64 exactly as DuckDB casts FLOAT to DOUBLE
        first = np.array([e[0] for e in batch["embedding"].to_pylist()],
                         dtype=np.float64)
        first_i = to_scaled_int64(first, 9)  # exact distributed sum
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv, first_i)
        counts = np.bincount(inv)
        return pa.table({"label": pa.array(uniq, batch["label"].type),
                         "s_i": pa.array(sums), "n": pa.array(counts, pa.int64())})

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("label")
        .aggregate(Sum("s_i", alias_name="s_i"), Sum("n", alias_name="n"))
    )

    def finalize(t: pa.Table) -> pa.Table:
        avg = (t["s_i"].to_numpy(zero_copy_only=False) / 1e9) \
            / t["n"].to_numpy(zero_copy_only=False)
        return pa.table({"label": t["label"], "n": t["n"],
                         "avg_dim0": pa.array(round_half_away(avg, 6))})

    return out.map_batches(finalize, batch_format="pyarrow")


EMB_LABEL_STATS_SQL = """
SELECT CAST(label AS BIGINT) AS label, count(*) AS n,
       round(sum(CAST(round(CAST(embedding[1] AS DOUBLE) * 1000000000) AS BIGINT))
             / 1000000000.0 / count(*), 6) AS avg_dim0
FROM embeddings GROUP BY label
"""


def embedding_dup_pairs(sf_dir: str):
    """Cosine ≥ 0.4 near-duplicate pairs (threshold chosen so the synthetic
    corpus, whose max off-diagonal cosine is ~0.51, yields pairs)."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return dd.embedding_dup_pairs(ds, threshold=0.4)


EMB_DUP_SQL = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.emb, b.emb), 6) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.emb, b.emb) >= 0.4
"""


EMB_QUERIES = {
    "knn_bruteforce": knn_bruteforce,
    "knn_lsh": knn_lsh,
    "embedding_label_stats": embedding_label_stats,
    "embedding_dup_pairs": embedding_dup_pairs,
}

EMB_ORACLE_SQL = {
    "knn_bruteforce": KNN_SQL,
    "embedding_label_stats": EMB_LABEL_STATS_SQL,
    "embedding_dup_pairs": EMB_DUP_SQL,
    # knn_lsh: approximate search — rows-only
}
