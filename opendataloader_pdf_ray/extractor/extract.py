"""The structured extractor: html bytes → (text, blocks, metrics).

Pipeline shape mirrors the reference document lifecycle
(``core/processors/DocumentProcessor.java:256-430`` — filter → structure →
cross-page passes → reading order → ids → sanitize → serialize), re-targeted
from PDF pages to HTML payloads and run as ONE pure function per row. A
document is processed by exactly one task — determinism by construction
(SURVEY.md §4).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional

from ..config import ExtractorConfig
from .blocks import Block, flatten, set_ids
from .dom import parse_html
from .linearize import to_json_dict, to_markdown, to_text
from .reading_order import order_page
from .sanitizer import ContentSanitizer
from .structure import (
    DocStats,
    assign_heading_levels,
    build_page_blocks,
    detect_header_footer,
    detect_special_tables,
    detect_toc,
    detect_style_headings,
    detect_text_captions,
    merge_neighbor_structures,
    split_pages,
)


@dataclass
class ExtractResult:
    text: str
    pages: List[List[Block]]
    n_blocks: int
    n_pages: int
    replacement_ratio: float

    def flat_blocks(self) -> List[Dict]:
        return flatten([b for page in self.pages for b in page])

    def markdown(self, cfg: ExtractorConfig) -> str:
        return to_markdown(self.pages, cfg)

    def json_dict(self, cfg: ExtractorConfig, file_name: str = "") -> Dict:
        return to_json_dict(self.pages, cfg, file_name)


def _sanitize_blocks(pages: List[List[Block]], sanitizer: ContentSanitizer) -> None:
    def visit(b: Block) -> None:
        if b.text:
            b.text = sanitizer.sanitize(b.text)
        for kid in b.kids:
            visit(kid)

    for blocks in pages:
        for b in blocks:
            visit(b)


def extract(html: bytes | str, cfg: ExtractorConfig = ExtractorConfig(),
            sanitizer: Optional[ContentSanitizer] = None) -> ExtractResult:
    """Single-document extraction. Deterministic: equal input ⇒ byte-equal text."""
    cfg = cfg.normalized()
    if isinstance(html, bytes):
        # --password analog: sealed payloads open here (CLI convert,
        # HtmlExtractor pool and the backend stub all come through extract;
        # extractor/assets.py carries the same gate for the image-asset
        # path); wrong/missing password raises InvalidPassword
        from ..sources.sealed import is_sealed, unseal

        if is_sealed(html):
            html = unseal(html, cfg.password)
    stats = DocStats()
    root = parse_html(html, parser=cfg.parser)

    # per-page loop 1+2 analog: filter + structure detection (DOM order);
    # --pages selection applied before any work (DocumentProcessor.java:220-253)
    page_nodes = split_pages(root)
    selected = cfg.page_numbers(len(page_nodes))
    pages = [build_page_blocks(page_nodes[idx], cfg, stats, pos)
             for pos, idx in enumerate(selected)]

    # sequential cross-page passes (DocumentProcessor.java:369-423 analog).
    # trust_semantic_tags = the tagged/struct-tree fast path
    # (TaggedDocumentProcessor.java:32-66): author markup is authoritative —
    # no heuristic restructuring, only reading order + sanitize below.
    if not cfg.trust_semantic_tags:
        detect_special_tables(pages, cfg)
        detect_style_headings(pages, stats, cfg)
        assign_heading_levels(pages)
        detect_text_captions(pages, cfg)
        detect_header_footer(pages, cfg)
        detect_toc(pages, cfg)  # after header/footer: 'Page 3 of 4' lines
                                # are already wrapped, never TOC-matched
        if cfg.merge_across_pages:
            merge_neighbor_structures(pages, cfg)

    # reading order (XY-Cut++ analog, per page)
    if cfg.reading_order:
        pages = [order_page(blocks) for blocks in pages]

    # sanitize (ContentSanitizer.sanitizeContents analog)
    if cfg.sanitize:
        _sanitize_blocks(pages, sanitizer or ContentSanitizer(cfg.sanitization_rules))

    # deterministic ids in final (reading) order — DocumentProcessor.java:401-405
    n_blocks = set_ids([b for blocks in pages for b in blocks])

    text = to_text(pages, cfg)
    return ExtractResult(
        text=text,
        pages=pages,
        n_blocks=n_blocks,
        n_pages=len(pages),
        replacement_ratio=round(stats.replacement_ratio(), 6),
    )


def extract_text(html: bytes | str, cfg: ExtractorConfig = ExtractorConfig()) -> str:
    return extract(html, cfg).text
