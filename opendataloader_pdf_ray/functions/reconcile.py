"""Two-source variant reconcile — the hybrid-merge analog.

The reference merges backend (model/OCR) page results with its deterministic
local extraction, preferring the local stream text when the two are similar
enough (``HybridDocumentProcessor.java:1417-1463`` mergeResults +
``TextSimilarity.trustStream`` ≥ 0.5). In CDC terms (SURVEY.md §2.4): conflict
resolution between two variants of the same row.

Distributed shape: tag + union the two sources, hash-bucket the key (one task
per bucket, NOT one tiny group per key — bucket count scales with the
cluster), per-bucket resolve with a pandas split. Same skeleton as the LWW
merge but with a content-aware resolver instead of a version comparison."""

from __future__ import annotations

from typing import Optional

import pandas as pd
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

    def resolve_bucket(df: pd.DataFrame) -> pd.DataFrame:
        loc = df[df["variant"] == "local"].set_index(key)[text_col]
        back = df[df["variant"] == "backend"].set_index(key)[text_col]
        out_key, out_text, out_src, out_sim = [], [], [], []
        for k in sorted(set(loc.index) | set(back.index)):
            lt = loc.get(k)
            bt = back.get(k)
            if lt is not None and bt is not None:
                sim = similarity(lt or "", bt or "")
                if sim >= trust_threshold:
                    text, source = lt, "local"
                else:
                    text, source = bt, "backend"
            elif lt is not None:
                text, source, sim = lt, "local", 1.0
            else:
                text, source, sim = bt, "backend", 0.0
            out_key.append(k)
            out_text.append(text)
            out_src.append(source)
            out_sim.append(round(sim, 6))
        return pd.DataFrame({key: out_key, text_col: out_text,
                             "source": out_src, "sim": out_sim})

    return both.groupby("bucket").map_groups(resolve_bucket, batch_format="pandas")
