"""DSIR importance scoring for the CDC plane — lake-wide backfill.

``pipelines/documents.doc_dsir_importance`` proves the method over the
testdata corpus with a bit-exact DuckDB oracle; this module is the
PRODUCT surface: score every live lake row for target-likeness (DSIR,
Xie et al. 2023 — hashed unigram+bigram features, add-one-smoothed
target-vs-raw log-ratio) as ONE exactly-once backfill epoch
(``backfill --transform dsir-score``). Downstream consumers then read
``dsir_logw`` like any other derived column: ``export --range`` can
slice by it once zone maps cover it, ``pack`` can filter on it, the
changefeed carries it to replicas.

Target definition on a lake: rows whose ``lang`` equals ``target_lang``
(the lake schema's language column — the web-corpus stand-in for "my
high-quality domain"). Deterministic: histograms are integer counts,
bucket ids are the engine's DuckDB-reproducible ``md5_number_lower``,
scores round to 6 decimals — equal lake state gives byte-equal scores
at any batch size (the backfill determinism contract).

100-TB shape: the pre-pass streams the lake ONCE per histogram through
``Lake.read_dataset(columns=["text", "lang"])`` (projection pushed into
every parquet read; per-batch Counter pre-aggregation → ≤n_buckets-row
groupby); the transform itself is a local dot product against the
broadcast log-ratio vector.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from .sketches import md5_number_lower


def text_bucket_vector(text: str, n_buckets: int) -> np.ndarray:
    """Hashed unigram+bigram counts for ONE text — the same feature map
    as ``doc_dsir_importance`` (whitespace tokens, md5 buckets)."""
    cnt = np.zeros(n_buckets, np.int64)
    ws = text.split(" ")
    for g in ws:
        cnt[md5_number_lower(g) % n_buckets] += 1
    for i in range(len(ws) - 1):
        cnt[md5_number_lower(ws[i] + " " + ws[i + 1]) % n_buckets] += 1
    return cnt


def log_ratio(target_h: np.ndarray, raw_h: np.ndarray) -> np.ndarray:
    """Add-one-smoothed per-bucket ln p̂_target − ln q̂_raw."""
    import math

    n = len(target_h)
    t_tot = float(target_h.sum() + n)
    r_tot = float(raw_h.sum() + n)
    return np.array(
        [math.log((int(target_h[b]) + 1) / t_tot)
         - math.log((int(raw_h[b]) + 1) / r_tot) for b in range(n)],
        np.float64)


def lake_histograms(lake, target_lang: str = "en",
                    n_buckets: int = 1024,
                    as_of: Optional[int] = None):
    """(target_hist, raw_hist) over the lake's LIVE text — one streaming
    pass, slim projection, ≤n_buckets-row shuffle."""
    from ray.data.aggregate import Sum

    ds = lake.read_dataset(as_of=as_of, columns=["text", "lang"])

    def partials(batch: pa.Table) -> pa.Table:
        from collections import Counter

        if "lang" not in batch.column_names:
            raise ValueError(
                "dsir-score needs a 'lang' column on the lake to define "
                "the target domain (rows whose lang == target_lang)")
        tc: Counter = Counter()
        rc: Counter = Counter()
        for text, lang in zip(batch["text"].to_pylist(),
                              batch["lang"].to_pylist()):
            if not isinstance(text, str) or not text:
                continue
            ws = text.split(" ")
            grams = ws + [ws[i] + " " + ws[i + 1]
                          for i in range(len(ws) - 1)]
            for g in grams:
                b = md5_number_lower(g) % n_buckets
                rc[b] += 1
                if lang == target_lang:
                    tc[b] += 1
        buckets = sorted(set(tc) | set(rc))
        return pa.table({
            "b": pa.array(buckets, pa.int64()),
            "tc": pa.array([tc.get(b, 0) for b in buckets], pa.int64()),
            "rc": pa.array([rc.get(b, 0) for b in buckets], pa.int64()),
        })

    rows = (ds.map_batches(partials, batch_format="pyarrow")
              .groupby("b")
              .aggregate(Sum("tc", alias_name="tc"),
                         Sum("rc", alias_name="rc"))
              .take_all())  # ≤ n_buckets rows
    th = np.zeros(n_buckets, np.int64)
    rh = np.zeros(n_buckets, np.int64)
    for r in rows:
        th[int(r["b"])] = int(r["tc"])
        rh[int(r["b"])] = int(r["rc"])
    return th, rh


def make_lake_scorer(lake, target_lang: str = "en",
                     n_buckets: int = 1024,
                     as_of: Optional[int] = None):
    """Build the ``backfill``-contract transform: runs the two-histogram
    pre-pass NOW (driver side, streaming), returns a per-batch callable
    that adds/overwrites ``dsir_logw`` (float64, 6 decimals; null for
    tombstones / empty text) AND ``dsir_logw_scaled`` (int64, ×10⁶ —
    zone maps and the range index cover int columns only, so the scaled
    sibling is what makes the scored lake SLICEABLE:
    ``read_range("dsir_logw_scaled", lo, hi)`` / ``export --range`` /
    ``range-index`` prune on it). Row count and key order untouched."""
    from ..pipelines.common import round_half_away

    th, rh = lake_histograms(lake, target_lang, n_buckets, as_of)
    lr = log_ratio(th, rh)

    def score(table: pa.Table) -> pa.Table:
        out = []
        for text in table["text"].to_pylist():
            if not isinstance(text, str) or not text:
                out.append(None)
                continue
            cnt = text_bucket_vector(text, n_buckets)
            out.append(float(cnt @ lr))
        rounded = [None if v is None
                   else float(round_half_away(np.array([v]), 6)[0])
                   for v in out]
        vals = pa.array(rounded, pa.float64())
        scaled = pa.array(
            [None if v is None else int(round(v * 1_000_000))
             for v in rounded], pa.int64())
        for name, col in (("dsir_logw", vals),
                          ("dsir_logw_scaled", scaled)):
            if name in table.column_names:
                idx = table.column_names.index(name)
                table = table.remove_column(idx).add_column(idx, name, col)
            else:
                table = table.append_column(name, col)
        return table

    score.__name__ = "dsir_score"
    return score
