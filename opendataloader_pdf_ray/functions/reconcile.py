"""Two-source variant reconcile — the hybrid-merge analog.

The reference merges backend (model/OCR) page results with its deterministic
local extraction, preferring the local stream text when the two are similar
enough (``HybridDocumentProcessor.java:1417-1463`` mergeResults +
``TextSimilarity.trustStream`` ≥ 0.5). In CDC terms (SURVEY.md §2.4): conflict
resolution between two variants of the same row.

Distributed shape: tag + union the two sources, hash-bucket the key (one task
per bucket, NOT one tiny group per key — bucket count scales with the
cluster), per-bucket resolve with a vectorized two-side alignment (Arrow format,
sort+searchsorted). Same skeleton as the LWW merge but with a
content-aware resolver instead of a version comparison."""

from __future__ import annotations

from typing import Optional

import pyarrow as pa

import ray.data

from ..pipelines.common import key_partition, n_buckets
from .text_sim import similarity


def reconcile_variants(local_ds: "ray.data.Dataset", backend_ds: "ray.data.Dataset",
                       key: str = "url", text_col: str = "text",
                       trust_threshold: float = 0.5,
                       num_buckets: Optional[int] = None) -> "ray.data.Dataset":
    """Per key: if both variants exist and similarity ≥ threshold, trust the
    deterministic local text (annotated source='local'); below threshold the
    backend (model) text wins (source='backend'); single-variant keys pass
    through. Output: key, text, source, sim."""
    buckets = num_buckets or n_buckets()

    def tag(name: str):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table({
                key: batch[key],
                text_col: batch[text_col],
                "variant": pa.array([name] * batch.num_rows, pa.string()),
                "bucket": pa.array(
                    key_partition(batch[key].to_pylist(), buckets)),
            })

        return fn

    both = local_ds.map_batches(tag("local"), batch_format="pyarrow").union(
        backend_ds.map_batches(tag("backend"), batch_format="pyarrow"))

    def resolve_bucket(group: pa.Table) -> pa.Table:
        """Vectorized two-side alignment (sort + searchsorted; no pandas,
        no per-key dict probing). The ONLY per-pair Python is the
        edit-distance call itself — inherent to a per-pair DP, and the
        kernel is numpy-rowwise (text_sim.levenshtein). A side whose text
        is null counts as ABSENT (original semantics: the other variant
        wins outright)."""
        import numpy as np

        var = group["variant"].to_numpy(zero_copy_only=False)
        keys = np.asarray(group[key].to_pylist(), dtype=object)
        texts = np.asarray(group[text_col].to_pylist(), dtype=object)
        present = np.array([t is not None for t in texts], bool)
        lmask = (var == "local") & present
        bmask = (var == "backend") & present
        lk, lt = keys[lmask], texts[lmask]
        bk, bt = keys[bmask], texts[bmask]
        lo = np.argsort(lk)
        bo = np.argsort(bk)
        lk, lt = lk[lo], lt[lo]
        bk, bt = bk[bo], bt[bo]
        all_keys = np.union1d(lk, bk) if len(lk) or len(bk) \
            else np.array([], dtype=object)

        def align(sk, sv):
            """value per all_keys position, None where the side lacks it."""
            out = np.full(len(all_keys), None, dtype=object)
            if len(sk):
                pos = np.searchsorted(sk, all_keys)
                pos_c = np.minimum(pos, len(sk) - 1)
                hit = sk[pos_c] == all_keys
                out[hit] = sv[pos_c[hit]]
            return out

        la, ba = align(lk, lt), align(bk, bt)
        has_l = np.array([v is not None for v in la], bool)
        has_b = np.array([v is not None for v in ba], bool)
        sim = np.where(has_l & ~has_b, 1.0, 0.0)
        text = np.where(has_l, la, ba)
        source = np.where(has_l, "local", "backend").astype(object)
        for i in np.flatnonzero(has_l & has_b):
            s = similarity(la[i], ba[i])
            sim[i] = s
            if s < trust_threshold:
                text[i], source[i] = ba[i], "backend"
        return pa.table({
            key: pa.array(all_keys, pa.string()),
            text_col: pa.array(text, pa.string()),
            "source": pa.array(source, pa.string()),
            "sim": pa.array(np.round(sim, 6), pa.float64()),
        })

    return both.groupby("bucket").map_groups(resolve_bucket,
                                             batch_format="pyarrow")
