"""Naive single-process replay oracle (FIXTURES.md §4.1).

Folds the event log in ``seq`` order into a plain dict keyed by url, applying
the same LWW-by-(warc_ts, seq) + tombstone semantics the distributed engine
implements. Deliberately simple and sequential — the property-test target of
SURVEY.md §7.4 ("property-test against a naive single-threaded oracle")."""

from __future__ import annotations

from typing import Dict, Optional

import pyarrow as pa

from ..config import ExtractorConfig
from ..extractor import ContentSanitizer, extract


def oracle_final_state(events: pa.Table,
                       cfg: Optional[ExtractorConfig] = None) -> Dict[str, dict]:
    """url → winning row dict (tombstones excluded). Extra event columns
    (schema evolution) flow through onto the winner."""
    cfg = cfg or ExtractorConfig()
    sanitizer = ContentSanitizer(cfg.sanitization_rules)
    extra_cols = [c for c in events.column_names
                  if c not in ("seq", "op", "url", "warc_ts", "html", "lang")]
    state: Dict[str, dict] = {}
    rows = events.to_pylist()
    # ascending version order makes plain application last-writer-wins, and
    # extends naturally to patches (op='P'): a patch overlays exactly its
    # non-null columns onto the current image (creating a null-image if the
    # key is unknown or tombstoned — a patch implies existence), matching
    # the engine's column-wise LWW (merge._column_lww)
    rows.sort(key=lambda r: (r["warc_ts"], r["seq"]))
    for row in rows:
        url = row["url"]
        if row["op"] == "P":
            cur = state.get(url)
            entry = dict(cur) if cur is not None else {
                "url": url, "lang": None, "text": None,
                **{c: None for c in extra_cols}}
            entry["warc_ts"] = row["warc_ts"]
            entry["seq"] = row["seq"]
            entry["deleted"] = False
            if row["html"] is not None:
                entry["text"] = extract(row["html"], cfg,
                                        sanitizer=sanitizer).text
            if row["lang"] is not None:
                entry["lang"] = row["lang"]
            for c in extra_cols:
                if row.get(c) is not None:
                    entry[c] = row[c]
            state[url] = entry
            continue
        entry = {
            "url": url,
            "warc_ts": row["warc_ts"],
            "seq": row["seq"],
            "lang": row["lang"],
            "deleted": row["op"] == "D",
        }
        if row["op"] == "D":
            entry["text"] = None
        else:
            entry["text"] = extract(row["html"], cfg, sanitizer=sanitizer).text
        for c in extra_cols:
            entry[c] = row.get(c)
        state[url] = entry
    return {u: e for u, e in state.items()}


def oracle_live_texts(events: pa.Table,
                      cfg: Optional[ExtractorConfig] = None) -> Dict[str, str]:
    """url → extracted text for live (non-tombstone) keys only."""
    return {u: e["text"] for u, e in oracle_final_state(events, cfg).items()
            if not e["deleted"]}
