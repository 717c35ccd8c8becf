"""Backend schema transformers: provider-shaped JSON → Block pages.

The reference's hybrid path receives backend-specific JSON (docling's
DoclingDocument, Hancom shapes) and maps it onto its internal element
lattice so downstream processors/generators are backend-agnostic
(``core/hybrid/HybridSchemaTransformer.java:38``,
``core/hybrid/DoclingSchemaTransformer.java:74-560``). This module is that
layer for this engine: a transformer maps a provider response onto
:class:`~..extractor.blocks.Block` pages, and
:class:`TransformingBackendClient` wires (transport → transformer →
linearize) as a third ``BackendClient`` implementation next to the stub and
the raw HTTP client (``stages/backend_client.py``).

DoclingDocument mapping (public docling JSON schema; reference parity per
``DoclingSchemaTransformer.java``):

=====================  =========================================
docling element         Block
=====================  =========================================
texts[label=text]       PARAGRAPH
texts[section_header]   HEADING (level from the element, default 1)
texts[caption]          CAPTION
texts[footnote]         PARAGRAPH (label="footnote")
texts[list_item]        LIST_ITEM
texts[formula]          PARAGRAPH (label="formula", text = latex)
texts[page_header/      filtered out (furniture —
      page_footer]      DoclingSchemaTransformer.java:255-259)
tables                  TABLE → TABLE_ROW → TABLE_CELL (grid dims from
                        data.grid; spans CLAMPED to the grid like
                        DoclingSchemaTransformer.java:512-516; spanned
                        slots not duplicated; row 0 = header cells)
pictures                IMAGE (description from annotations
                        kind="description"; picture index ACCUMULATES
                        across transform() calls on one instance —
                        chunked responses, reference issue #352)
=====================  =========================================

Coordinates: docling bbox is ``{l, t, r, b, coord_origin}`` with BOTTOMLEFT
or TOPLEFT origin; Blocks use top-left-origin ``[left, top, right,
bottom]``. BOTTOMLEFT converts via the page height (top' = H − t). Each
page's elements are then sorted in reading order (top→bottom, left→right) —
``DoclingSchemaTransformer.sortByReadingOrder`` parity.

Wire shape for the HTTP transport: docling-serve's public API
(``POST /v1alpha/convert/source`` with base64 file sources; response
``{"document": {"json_content": {...DoclingDocument...}}, "status": ...}``).
"""

from __future__ import annotations

import base64
import json
from typing import Dict, List, Optional, Sequence

from ..config import ExtractorConfig
from ..extractor.blocks import (
    CAPTION,
    HEADING,
    IMAGE,
    LIST_ITEM,
    PARAGRAPH,
    TABLE,
    TABLE_CELL,
    TABLE_ROW,
    Block,
)

_FURNITURE = {"page_header", "page_footer"}
_TEXT_LABELS = {
    "section_header": HEADING,
    "caption": CAPTION,
    "list_item": LIST_ITEM,
    # text / footnote / formula → paragraph (label records the provenance)
}


def _bbox(node: Optional[dict], page_height: Optional[float]) -> Optional[List[float]]:
    """docling {l,t,r,b,coord_origin} → top-left-origin [l, top, r, bottom]."""
    if not node:
        return None
    left, right = float(node.get("l", 0.0)), float(node.get("r", 0.0))
    t, b = float(node.get("t", 0.0)), float(node.get("b", 0.0))
    if node.get("coord_origin", "BOTTOMLEFT") == "BOTTOMLEFT":
        h = float(page_height or 0.0)
        # bottom-left origin: t is the HIGH y — flip through the page height
        return [left, h - t, right, h - b]
    return [left, t, right, b]


def _prov(node: dict) -> "tuple[int, Optional[dict]]":
    prov = node.get("prov") or []
    if not prov:
        return 0, None
    first = prov[0]
    return int(first.get("page_no", 1)), first.get("bbox")


class DoclingTransformer:
    """DoclingDocument JSON → Block pages (module docstring table).

    NOT thread-safe across calls sharing an instance (the picture index
    accumulates, mirroring the reference's documented contract) — one
    instance per extraction actor, like the reference's one per
    HybridDocumentProcessor."""

    backend_type = "docling"

    def __init__(self) -> None:
        self._picture_index = 0

    # ------------------------------------------------------------- public
    def transform(self, doc: Optional[dict],
                  page_heights: Optional[Dict[int, float]] = None
                  ) -> List[List[Block]]:
        """Transform one DoclingDocument dict into per-page Block lists
        (0-indexed pages). Missing/None JSON → empty result, mirroring the
        reference's warn-and-continue."""
        if not doc:
            return []
        page_heights = page_heights or self._page_heights(doc)
        n_pages = self._page_count(doc, page_heights)
        pages: List[List[Block]] = [[] for _ in range(n_pages)]

        for node in doc.get("texts") or []:
            self._add_text(node, pages, page_heights)
        for node in doc.get("tables") or []:
            self._add_table(node, pages, page_heights)
        for node in doc.get("pictures") or []:
            self._add_picture(node, pages, page_heights)

        for blocks in pages:
            # reading order: top→bottom then left→right; bbox-less elements
            # keep arrival order at the end (sort is stable)
            blocks.sort(key=lambda b: (b.bbox is None,
                                       (b.bbox or [0, 0])[1],
                                       (b.bbox or [0, 0])[0]))
        return pages

    # ---------------------------------------------------------- internals
    @staticmethod
    def _page_heights(doc: dict) -> Dict[int, float]:
        out: Dict[int, float] = {}
        pages = doc.get("pages")
        if isinstance(pages, dict):  # docling keys pages by str(page_no)
            for k, v in pages.items():
                try:
                    out[int(k)] = float((v.get("size") or {}).get("height",
                                                                  0.0))
                except (TypeError, ValueError):
                    continue
        return out

    @staticmethod
    def _page_count(doc: dict, page_heights: Dict[int, float]) -> int:
        if page_heights:
            return max(page_heights)
        n = 0
        for group in ("texts", "tables", "pictures"):
            for node in doc.get(group) or []:
                n = max(n, _prov(node)[0])
        return n

    def _ensure_page(self, pages: List[List[Block]], idx: int) -> None:
        while len(pages) <= idx:
            pages.append([])

    def _add_text(self, node: dict, pages: List[List[Block]],
                  heights: Dict[int, float]) -> None:
        label = node.get("label") or "text"
        if label in _FURNITURE:
            return  # furniture is the fast-path's job to re-detect
        page_no, bbox_node = _prov(node)
        if page_no < 1:
            return  # no provenance — reference skips (FINE log)
        self._ensure_page(pages, page_no - 1)
        text = node.get("text") or node.get("orig") or ""
        btype = _TEXT_LABELS.get(label, PARAGRAPH)
        block = Block(type=btype, text=text, page=page_no - 1,
                      bbox=_bbox(bbox_node, heights.get(page_no)))
        if btype == HEADING:
            block.level = int(node.get("level")
                              or (node.get("meta") or {}).get("level") or 1)
        elif label in ("footnote", "formula"):
            block.label = label
        pages[page_no - 1].append(block)

    def _add_picture(self, node: dict, pages: List[List[Block]],
                     heights: Dict[int, float]) -> None:
        page_no, bbox_node = _prov(node)
        if page_no < 1:
            return
        self._ensure_page(pages, page_no - 1)
        desc = ""
        for ann in node.get("annotations") or []:
            if ann.get("kind") == "description":
                desc = ann.get("text") or ""
                break
        self._picture_index += 1
        pages[page_no - 1].append(Block(
            type=IMAGE, text=desc, page=page_no - 1,
            label=f"picture[{self._picture_index}]",
            bbox=_bbox(bbox_node, heights.get(page_no))))

    def _add_table(self, node: dict, pages: List[List[Block]],
                   heights: Dict[int, float]) -> None:
        page_no, bbox_node = _prov(node)
        data = node.get("data") or {}
        grid = data.get("grid")
        if page_no < 1 or not grid or not grid[0]:
            return
        self._ensure_page(pages, page_no - 1)
        n_rows, n_cols = len(grid), len(grid[0])
        by_start: Dict["tuple[int, int]", dict] = {}
        for cell in data.get("table_cells") or []:
            key = (int(cell.get("start_row_offset_idx", 0)),
                   int(cell.get("start_col_offset_idx", 0)))
            by_start[key] = cell
        covered = [[False] * n_cols for _ in range(n_rows)]
        table = Block(type=TABLE, page=page_no - 1,
                      bbox=_bbox(bbox_node, heights.get(page_no)))
        for r in range(n_rows):
            row_block = Block(type=TABLE_ROW, page=page_no - 1)
            for c in range(n_cols):
                if covered[r][c]:
                    continue  # inside an earlier spanning cell — no
                    # duplicate placeholder (reference PDF/UA fix)
                cell = by_start.get((r, c))
                rs = int(cell.get("row_span", 1)) if cell else 1
                cs = int(cell.get("col_span", 1)) if cell else 1
                # clamp spans to the declared grid; ≥1 defends malformed
                # zero/negative spans (DoclingSchemaTransformer.java:512)
                rs = max(1, min(rs, n_rows - r))
                cs = max(1, min(cs, n_cols - c))
                text = (cell.get("text") or "") if cell else ""
                row_block.kids.append(Block(
                    type=TABLE_CELL, text=text, page=page_no - 1,
                    row=r, col=c, row_span=rs, col_span=cs,
                    is_header=(r == 0)))
                for rr in range(r, r + rs):
                    for cc in range(c, c + cs):
                        covered[rr][cc] = True
            table.kids.append(row_block)
        pages[page_no - 1].append(table)


class DoclingHttpTransport:
    """docling-serve wire shape over the engine's persistent-connection
    HTTP machinery: ``POST {base}/v1alpha/convert/source`` with a base64
    file source per page, ``{"document": {"json_content": ...}}`` back.
    One page per request (docling-serve converts one source per call)."""

    def __init__(self, base_url: str, timeout: float = 30.0):
        from .backend_client import HttpBackendClient

        # reuse the transport guts (persistent conn, reconnect-once,
        # /health) — only the request shape differs
        self._http = HttpBackendClient(base_url, timeout=timeout)

    def health(self) -> bool:
        return self._http.health()

    def convert(self, url: str, html: bytes) -> Optional[dict]:
        body = json.dumps({
            "options": {"to_formats": ["json"]},
            "sources": [{
                "kind": "file",
                "base64_string": base64.b64encode(html).decode("ascii"),
                "filename": url.rsplit("/", 1)[-1] or "page.html",
            }],
        }).encode("utf-8")
        status, payload = self._http._request(
            "POST", "/v1alpha/convert/source", body)
        if status != 200:
            from .backend_client import BackendUnavailable

            raise BackendUnavailable(
                f"docling backend returned HTTP {status}")
        doc = json.loads(payload)
        return (doc.get("document") or {}).get("json_content")


class TransformingBackendClient:
    """Third ``BackendClient`` implementation: provider transport →
    schema transformer → Block pages → deterministic linearization. The
    hybrid stage consumes the same record shape as the stub/raw-HTTP
    clients, so routing/reconcile are transformer-agnostic."""

    def __init__(self, transport, transformer=None,
                 cfg: Optional[ExtractorConfig] = None):
        self.transport = transport
        self.transformer = transformer or DoclingTransformer()
        self.cfg = cfg or ExtractorConfig()

    def health(self) -> bool:
        return self.transport.health()

    def extract_pages(self, urls: Sequence[str],
                      htmls: Sequence[Optional[bytes]],
                      enrich: bool = False) -> List[dict]:
        from ..extractor.linearize import to_text

        out: List[dict] = []
        for url, html in zip(urls, htmls):
            if html is None:
                out.append({"text": None, "ai_score": 0.0, "formulas": [],
                            "pictures": [], "footnotes": []})
                continue
            doc = self.transport.convert(url, html)
            pages = self.transformer.transform(doc)
            flat = [b for page in pages for b in page]
            rec = {
                "text": to_text(pages, self.cfg),
                "ai_score": 1.0,  # provider output carries no score here
                "formulas": [b.text for b in flat if b.label == "formula"],
                "pictures": [f"{b.label}: {b.text}" for b in flat
                             if b.type == IMAGE],
                "footnotes": [b.text for b in flat
                              if b.label == "footnote"],
            }
            out.append(rec)
        return out
