"""Text similarity — Levenshtein distance / similarity ratio.

Analog of ``core/hybrid/TextSimilarity.java:33-66`` (the reference gates its
hybrid-merge "trustStream" on similarity ≥ 0.5). Distances match DuckDB's
``levenshtein()`` (classic unit-cost edit distance) so queries can be
SQL-oracled."""

from __future__ import annotations

import numpy as np


def levenshtein(a: str, b: str) -> int:
    """Classic DP edit distance, numpy-rowwise (O(len(a)·len(b)))."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = np.arange(len(b) + 1)
    b_arr = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    for i, ca in enumerate(a):
        cur = np.empty(len(b) + 1, dtype=np.int64)
        cur[0] = i + 1
        sub = prev[:-1] + (b_arr != ord(ca))
        # cur[j+1] = min(prev[j+1]+1, cur[j]+1, sub[j]) — the cur[j]+1 term is
        # a prefix-min recurrence; resolve it with a running minimum
        np.minimum(prev[1:] + 1, sub, out=cur[1:])
        running = cur[0]
        cur_view = cur[1:]
        for j in range(len(cur_view)):  # short inner loop; strings are capped
            running = min(running + 1, cur_view[j])
            cur_view[j] = running
        prev = cur
    return int(prev[-1])


def similarity(a: str, b: str) -> float:
    """1 − dist/max_len, the reference's ratio (TextSimilarity.java:33-50)."""
    if not a and not b:
        return 1.0
    return 1.0 - levenshtein(a, b) / max(len(a), len(b))


def trust_stream(stream_text: str, ocr_text: str, threshold: float = 0.5) -> bool:
    """The hybrid-merge gate: trust the (deterministic) stream text over the
    model output when they are similar enough
    (``HybridDocumentProcessor.java:1417-1463``)."""
    return similarity(stream_text, ocr_text) >= threshold
