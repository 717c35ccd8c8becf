"""The extractor as a Ray Data actor-pool stage.

Direct analog of the reference's "model server loaded once" design
(``core/hybrid/HybridClient.java`` pool / ``py/hybrid_server.py`` docling
singleton, 3.3× faster than per-request — SURVEY.md §2.3): config + compiled
sanitizer regexes are built ONCE per actor in ``__init__``; ``__call__`` does
per-batch work only. Batches are zero-copy Arrow; the wide ``html`` binary
column is dropped immediately after extraction so downstream shuffles move
only (url, warc_ts, text, blocks, …) — SURVEY.md §7.4 "wide binary rows".
"""

from __future__ import annotations

import json
from typing import List, Optional

import pyarrow as pa

from ..config import ExtractorConfig
from ..extractor import ContentSanitizer, extract

BLOCK_STRUCT = pa.struct(
    [
        ("id", pa.int32()),
        ("parent", pa.int32()),
        ("type", pa.string()),
        ("level", pa.int32()),
        ("page", pa.int32()),
        ("text", pa.string()),
        ("bbox", pa.list_(pa.float64())),
        ("row", pa.int32()),
        ("col", pa.int32()),
        ("row_span", pa.int32()),
        ("col_span", pa.int32()),
        ("label", pa.string()),
    ]
)
BLOCKS_TYPE = pa.list_(BLOCK_STRUCT)


class HtmlExtractor:
    """map_batches(HtmlExtractor, batch_format="pyarrow", concurrency=N).

    Input batch: any table with an ``html: binary`` column (null for deletes).
    Output: html dropped; ``text``, ``n_blocks``, ``replacement_ratio`` added
    (+ ``blocks`` list<struct> when include_blocks)."""

    def __init__(self, cfg: Optional[ExtractorConfig] = None,
                 include_blocks: bool = True, drop_html: bool = True):
        self.cfg = cfg or ExtractorConfig()
        self.sanitizer = ContentSanitizer(self.cfg.sanitization_rules)
        self.include_blocks = include_blocks
        self.drop_html = drop_html

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts: List[Optional[str]] = []
        n_blocks: List[int] = []
        ratios: List[float] = []
        blocks_col: List[Optional[List[dict]]] = []
        for html in batch["html"]:
            payload = html.as_py()
            if payload is None:
                texts.append(None)
                n_blocks.append(0)
                ratios.append(0.0)
                blocks_col.append(None)
                continue
            result = extract(payload, self.cfg, sanitizer=self.sanitizer)
            texts.append(result.text)
            n_blocks.append(result.n_blocks)
            ratios.append(result.replacement_ratio)
            if self.include_blocks:
                blocks_col.append(result.flat_blocks())
        out = batch.drop_columns(["html"]) if self.drop_html else batch
        out = (
            out.append_column("text", pa.array(texts, pa.string()))
            .append_column("n_blocks", pa.array(n_blocks, pa.int32()))
            .append_column("replacement_ratio", pa.array(ratios, pa.float64()))
        )
        if self.include_blocks:
            out = out.append_column("blocks", pa.array(blocks_col, BLOCKS_TYPE))
        return out


class MarkdownGenerator:
    """Optional serializer stage: blocks are already structured, so Markdown
    re-generation runs from html for simplicity of the demo surface."""

    def __init__(self, cfg: Optional[ExtractorConfig] = None):
        self.cfg = cfg or ExtractorConfig()
        self.sanitizer = ContentSanitizer(self.cfg.sanitization_rules)

    def __call__(self, batch: pa.Table) -> pa.Table:
        mds: List[Optional[str]] = []
        jsons: List[Optional[str]] = []
        for html in batch["html"]:
            payload = html.as_py()
            if payload is None:
                mds.append(None)
                jsons.append(None)
                continue
            r = extract(payload, self.cfg, sanitizer=self.sanitizer)
            mds.append(r.markdown(self.cfg))
            jsons.append(json.dumps(r.json_dict(self.cfg), ensure_ascii=False,
                                    sort_keys=True))
        return (
            batch.append_column("markdown", pa.array(mds, pa.string()))
            .append_column("json", pa.array(jsons, pa.string()))
        )
