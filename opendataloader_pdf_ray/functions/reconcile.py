"""Two-source variant reconcile — the hybrid-merge analog.

The reference merges backend (model/OCR) page results with its deterministic
local extraction, preferring the local stream text when the two are similar
enough (``HybridDocumentProcessor.java:1417-1463`` mergeResults +
``TextSimilarity.trustStream`` ≥ 0.5). In CDC terms (SURVEY.md §2.4): conflict
resolution between two variants of the same row.

Distributed shape: tag + union the two sources, per-batch combine, one
groupby(key), per-key resolve — same skeleton as the LWW merge but with a
content-aware resolver instead of a version comparison."""

from __future__ import annotations

from typing import Optional

import pyarrow as pa

import ray.data

from .text_sim import similarity


def reconcile_variants(local_ds: "ray.data.Dataset", backend_ds: "ray.data.Dataset",
                       key: str = "url", text_col: str = "text",
                       trust_threshold: float = 0.5) -> "ray.data.Dataset":
    """Per key: if both variants exist and similarity ≥ threshold, trust the
    deterministic local text (annotated source='local'); below threshold the
    backend (model) text wins (source='backend'); single-variant keys pass
    through. Output: key, text, source, sim."""

    def tag(name: str):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table({
                key: batch[key],
                text_col: batch[text_col],
                "variant": pa.array([name] * batch.num_rows, pa.string()),
            })

        return fn

    both = local_ds.map_batches(tag("local"), batch_format="pyarrow").union(
        backend_ds.map_batches(tag("backend"), batch_format="pyarrow"))

    def resolve(group: pa.Table) -> pa.Table:
        rows = group.to_pylist()
        k = rows[0][key]
        local = next((r for r in rows if r["variant"] == "local"), None)
        backend = next((r for r in rows if r["variant"] == "backend"), None)
        if local is not None and backend is not None:
            sim = similarity(local[text_col] or "", backend[text_col] or "")
            if sim >= trust_threshold:
                chosen, source = local, "local"
            else:
                chosen, source = backend, "backend"
        elif local is not None:
            chosen, source, sim = local, "local", 1.0
        else:
            chosen, source, sim = backend, "backend", 0.0
        return pa.table({key: pa.array([k]),
                         text_col: pa.array([chosen[text_col]], pa.string()),
                         "source": pa.array([source], pa.string()),
                         "sim": pa.array([round(sim, 6)], pa.float64())})

    return both.groupby(key).map_groups(resolve, batch_format="pyarrow")
