"""Triage routing — the hybrid-path analog (SURVEY.md §3.2).

The reference routes each page between a cheap local path and an expensive
model backend by signal priority (``core/hybrid/TriageProcessor.java:648-689``:
replacement ratio ≥ 0.3 → backend(1.0); table signals → backend(0.9–1.0);
large image → backend(0.85); else local(0.9)). Here: a vectorizable stage that
adds ``route`` + ``route_score`` columns per event, so a pipeline can split
into two map_batches stages with filters — data-dependent routing without
breaking streaming."""

from __future__ import annotations

import re
from typing import Optional

import numpy as np
import pyarrow as pa

from ..config import ExtractorConfig

_TABLE_RE = re.compile(rb"<table|\d+\s{2,}\S+\s{2,}")
_IMG_RE = re.compile(rb"<img|<figure")
_REPL_RE = re.compile("�".encode("utf-8"))

ROUTE_BACKEND = "backend"
ROUTE_LOCAL = "local"


class TriageRouter:
    """Adds route/route_score from cheap byte-level signals (no full parse).
    Signal priority mirrors the reference's triage table."""

    def __init__(self, cfg: Optional[ExtractorConfig] = None,
                 replacement_threshold: float = 0.003):
        self.cfg = cfg or ExtractorConfig()
        self.replacement_threshold = replacement_threshold

    def route_one(self, payload: Optional[bytes]) -> tuple:
        if payload is None:
            return ROUTE_LOCAL, 1.0
        n = max(1, len(payload))
        if len(_REPL_RE.findall(payload)) / n >= self.replacement_threshold:
            return ROUTE_BACKEND, 1.0
        if _TABLE_RE.search(payload):
            return ROUTE_BACKEND, 0.9
        if _IMG_RE.search(payload):
            return ROUTE_BACKEND, 0.85
        return ROUTE_LOCAL, 0.9

    def __call__(self, batch: pa.Table) -> pa.Table:
        routes, scores = [], []
        for html in batch["html"]:
            r, s = self.route_one(html.as_py())
            routes.append(r)
            scores.append(s)
        return (batch.append_column("route", pa.array(routes, pa.string()))
                     .append_column("route_score", pa.array(scores, pa.float64())))
