"""DOM → per-page block lists: filtering + structure detection.

Re-expresses the reference's per-page operator chain (SURVEY.md §2.2/§3.1) for
HTML payloads:

- hidden-text filter        → ``HiddenTextProcessor.java:44-70`` analog
- off-page filter           → ``ContentFilterProcessor.java:129-141`` analog
- tiny-text filter          → ``TextProcessor.java:76-86`` analog
- invalid-char replacement  → ``TextProcessor.java:41-74`` analog
- whitespace normalization  → ``TextProcessor.java:88-112`` analog
- paragraph building        → ``ParagraphProcessor.java:36-54`` analog
- heading detection/levels  → ``HeadingProcessor.java:170-243`` +
                              ``ModeWeightStatistics.java:26-75`` analogs
- list detection            → ``ListProcessor.java:80,380`` analog
- table structure           → ``TableBorderProcessor.java:54-162`` analog
- aligned-column tables     → ``ClusterTableProcessor.java:53`` analog
- Korean special table      → ``SpecialTableProcessor.java:33-100`` analog
- caption linkage           → ``CaptionProcessor.java:46-100`` analog

Everything here is a pure function of (Node tree, ExtractorConfig); all state
is document-local (SURVEY.md §2.3: document-scoped statistics, NOT global).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

from ..config import ExtractorConfig
from .blocks import (
    CAPTION,
    HEADER_FOOTER,
    HEADING,
    IMAGE,
    LIST,
    LIST_ITEM,
    PARAGRAPH,
    TABLE,
    TABLE_CELL,
    TABLE_ROW,
    TEXT_BLOCK,
    TOC,
    TOC_ITEM,
    Block,
)
from .dom import Node, style_px

_WS_RE = re.compile(r"[ \t\r\f\v]+")
_CTRL_RE = re.compile(r"[�\x00-\x08\x0b\x0c\x0e-\x1f]")
_DIGIT_RE = re.compile(r"\d+")
_CAPTION_RE = re.compile(r"^(Figure|Fig\.|Table|그림|표)\s+\d+", re.IGNORECASE)
_SPECIAL_TABLE_RE = re.compile(r"^(수신|경유|제목)\s*[::]?\s*(.*)$")

HEADING_TAGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}
# default browser-ish sizes used when a heading tag carries no inline size,
# so style-statistics ranking (ModeWeightStatistics analog) stays total
DEFAULT_HEADING_SIZE = {1: 32.0, 2: 24.0, 3: 19.0, 4: 16.0, 5: 13.0, 6: 11.0}
BODY_DEFAULT_SIZE = 16.0

_ROMAN = ["i", "ii", "iii", "iv", "v", "vi", "vii", "viii", "ix", "x",
          "xi", "xii", "xiii", "xiv", "xv", "xvi", "xvii", "xviii", "xix", "xx"]


@dataclass
class DocStats:
    """Document-scoped mutable counters (replacement-char ratio etc.)."""

    total_chars: int = 0
    replaced_chars: int = 0
    font_size_freq: dict = field(default_factory=dict)

    def replacement_ratio(self) -> float:
        if self.total_chars == 0:
            return 0.0
        return self.replaced_chars / self.total_chars


# --------------------------------------------------------------------------- text


def clean_text(raw: str, cfg: ExtractorConfig, stats: DocStats) -> str:
    """Invalid-char replacement + whitespace collapse (order mirrors
    ``ContentFilterProcessor.getFilteredContents`` steps)."""
    stats.total_chars += len(raw)
    replaced, n = _CTRL_RE.subn(cfg.replacement_text, raw)
    stats.replaced_chars += n
    return _WS_RE.sub(" ", replaced).strip()


# ------------------------------------------------------------------------ filters


def is_hidden(node: Node, cfg: ExtractorConfig) -> bool:
    if not cfg.filter_hidden_text:
        return False
    st = node.style
    if st.get("display") == "none" or st.get("visibility") == "hidden":
        return True
    op = st.get("opacity")
    if op is not None:
        try:
            if float(op) <= 0.05:
                return True
        except ValueError:
            pass
    if node.attr("aria-hidden") == "true":
        return True
    # low-contrast analog (HiddenTextProcessor contrast < 1.2): same literal
    # foreground color as nearest ancestor background
    color = st.get("color")
    if color:
        anc = node.parent
        while anc is not None:
            bg = anc.style.get("background-color") or anc.style.get("background")
            if bg:
                return bg.replace(" ", "").lower() == color.replace(" ", "").lower()
            anc = anc.parent
    return False


def is_off_page(node: Node, cfg: ExtractorConfig) -> bool:
    if not cfg.filter_out_of_page or node.position() not in ("absolute", "fixed"):
        return False
    bbox = node.bbox()
    if bbox is None:
        return False
    left, top, right, bottom = bbox
    if right <= left:
        right = left + 1.0
    if bottom <= top:
        bottom = top + 1.0
    return right <= 0 or bottom <= 0 or left >= cfg.page_width or top >= cfg.page_height


def is_tiny(node: Node, cfg: ExtractorConfig) -> bool:
    if not cfg.filter_tiny_text:
        return False
    size = node.font_size()
    return size is not None and size < cfg.tiny_text_px


def _skip(node: Node, cfg: ExtractorConfig) -> bool:
    return is_hidden(node, cfg) or is_off_page(node, cfg) or is_tiny(node, cfg)


# ----------------------------------------------------------------- page splitting


def split_pages(root: Node) -> List[Node]:
    """Documents may carry explicit page containers (``<div class="page">``),
    the analog of PDF pages; otherwise the whole document is one page."""
    pages: List[Node] = []

    def scan(node: Node) -> None:
        if node.tag == "div" and "page" in node.classes():
            pages.append(node)
            return
        for c in node.children:
            if not c.is_text():
                scan(c)

    scan(root)
    return pages if pages else [root]


# ------------------------------------------------------------------- block builder


def _decoration(node: Node) -> str:
    deco = node.eff_style("text-decoration") or ""
    if "line-through" in deco:
        return "line-through"
    if "underline" in deco:
        return "underline"
    anc: Optional[Node] = node
    while anc is not None:
        if anc.tag in ("s", "strike", "del"):
            return "line-through"
        if anc.tag in ("u", "ins"):
            return "underline"
        anc = anc.parent
    # a block whose ENTIRE content is one struck/underlined wrapper
    # (<p><s>…</s></p>) carries the wrapper's decoration
    kids = [c for c in node.children
            if not (c.is_text() and not c.text.strip())]
    if len(kids) == 1 and not kids[0].is_text():
        if kids[0].tag in ("s", "strike", "del"):
            return "line-through"
        if kids[0].tag in ("u", "ins"):
            return "underline"
    return ""


def _inline_text(node: Node, cfg: ExtractorConfig, stats: DocStats) -> str:
    """Collect text of an inline subtree, honoring filters and <br> breaks."""
    parts: List[str] = []

    def visit(n: Node) -> None:
        if n.is_text():
            # --keep-line-breaks=False: source newlines are plain whitespace
            # (HTML semantics); True preserves them as line breaks
            parts.append(n.text if cfg.keep_line_breaks
                         else n.text.replace("\n", " "))
            return
        if _skip(n, cfg):
            return
        if n.tag == "br":
            parts.append("\n")
            return
        for c in n.children:
            visit(c)

    visit(node)
    raw = "".join(parts)
    lines = [clean_text(ln, cfg, stats) for ln in raw.split("\n")]
    lines = [ln for ln in lines if ln]
    return "\n".join(lines)


_LIST_LABELS = {"1": "arabic", "a": "loweralpha", "A": "upperalpha",
                "i": "lowerroman", "I": "upperroman"}


def _list_label(style: str, index: int) -> str:
    """Numbering-style labels (ListProcessor label-detection analog)."""
    if style == "arabic":
        return f"{index + 1}."
    if style == "loweralpha":
        return chr(ord("a") + index % 26) + "."
    if style == "upperalpha":
        return chr(ord("A") + index % 26) + "."
    if style == "lowerroman":
        return _ROMAN[index % len(_ROMAN)] + "."
    if style == "upperroman":
        return _ROMAN[index % len(_ROMAN)].upper() + "."
    return "•"


def _build_list(node: Node, cfg: ExtractorConfig, stats: DocStats, page: int,
                depth: int) -> Block:
    if node.tag == "ol":
        style = _LIST_LABELS.get(node.attr("type", "1"), "arabic")
    else:
        style = "bullet"
    lst = node.style.get("list-style-type")
    if lst:
        style = {"decimal": "arabic", "lower-alpha": "loweralpha",
                 "upper-alpha": "upperalpha", "lower-roman": "lowerroman",
                 "upper-roman": "upperroman", "disc": "bullet",
                 "circle": "bullet", "square": "bullet"}.get(lst, style)
    block = Block(type=LIST, page=page, level=depth, bbox=node.bbox(),
                  list_style=style)
    idx = 0
    for child in node.children:
        if child.is_text() or child.tag != "li" or _skip(child, cfg):
            continue
        inline_parts: List[Node] = []
        nested: List[Node] = []
        for c in child.children:
            if not c.is_text() and c.tag in ("ul", "ol") and not _skip(c, cfg):
                nested.append(c)
            else:
                inline_parts.append(c)
        holder = Node(tag="#li", children=inline_parts, parent=child)
        for p in inline_parts:
            p.parent = child  # keep original style inheritance
        text = _inline_text(holder, cfg, stats)
        item = Block(type=LIST_ITEM, text=text, page=page, level=depth,
                     label=_list_label(style, idx))
        for sub in nested:
            item.kids.append(_build_list(sub, cfg, stats, page, depth + 1))
        block.kids.append(item)
        idx += 1
    return block


def _build_table(node: Node, cfg: ExtractorConfig, stats: DocStats, page: int) -> Block:
    """HTML table → grid with row/col numbers and spans
    (``TableBorderProcessor.java:54-121`` cell model)."""
    table = Block(type=TABLE, page=page, bbox=node.bbox())
    rows: List[Node] = []

    def collect_rows(n: Node) -> None:
        for c in n.children:
            if c.is_text() or _skip(c, cfg):
                continue
            if c.tag == "tr":
                rows.append(c)
            elif c.tag in ("thead", "tbody", "tfoot", "table"):
                collect_rows(c)

    collect_rows(node)
    occupied: dict = {}  # (row, col) -> True for span carry-over
    for r, tr in enumerate(rows):
        row_block = Block(type=TABLE_ROW, page=page, row=r)
        col = 0
        for cell in tr.children:
            if cell.is_text() or cell.tag not in ("td", "th") or _skip(cell, cfg):
                continue
            while occupied.get((r, col)):
                col += 1
            try:
                cspan = max(1, int(cell.attr("colspan", "1")))
            except ValueError:
                cspan = 1
            try:
                rspan = max(1, int(cell.attr("rowspan", "1")))
            except ValueError:
                rspan = 1
            for rr in range(r, r + rspan):
                for cc in range(col, col + cspan):
                    occupied[(rr, cc)] = True
            row_block.kids.append(
                Block(type=TABLE_CELL, text=_inline_text(cell, cfg, stats),
                      page=page, row=r, col=col, row_span=rspan, col_span=cspan,
                      is_header=(cell.tag == "th"))
            )
            col += cspan
        if row_block.kids:
            table.kids.append(row_block)
    return table


def _aligned_columns_table(text: str, page: int, cfg: ExtractorConfig) -> Optional[Block]:
    """Borderless whitespace-aligned columns → table
    (``ClusterTableProcessor.java:53`` analog). Requires ≥2 lines splitting on
    2+ spaces into the same ≥2 field count."""
    if not cfg.detect_aligned_columns:
        return None
    lines = [ln for ln in text.split("\n") if ln.strip()]
    if len(lines) < 2:
        return None
    split_rows = [re.split(r"\s{2,}", ln.strip()) for ln in lines]
    ncols = len(split_rows[0])
    if ncols < 2 or any(len(rw) != ncols for rw in split_rows):
        return None
    table = Block(type=TABLE, page=page)
    for r, cells in enumerate(split_rows):
        row_block = Block(type=TABLE_ROW, page=page, row=r)
        for c, cell_text in enumerate(cells):
            row_block.kids.append(Block(type=TABLE_CELL, text=cell_text, page=page,
                                        row=r, col=c))
        table.kids.append(row_block)
    return table


def build_page_blocks(page_node: Node, cfg: ExtractorConfig, stats: DocStats,
                      page: int) -> List[Block]:
    """Walk one page's subtree and emit blocks in DOM order."""
    blocks: List[Block] = []
    pending_inline: List[Node] = []

    def flush_inline(container: Node) -> None:
        if not pending_inline:
            return
        holder = Node(tag="#flow", children=list(pending_inline), parent=container)
        text = _inline_text(holder, cfg, stats)
        pending_inline.clear()
        if text:
            blocks.append(Block(type=TEXT_BLOCK, text=text, page=page,
                                font_size=container.font_size()))

    def emit(node: Node) -> None:
        tag = node.tag
        if tag in HEADING_TAGS:
            text = _inline_text(node, cfg, stats)
            if text:
                size = node.font_size() or DEFAULT_HEADING_SIZE[HEADING_TAGS[tag]]
                blocks.append(Block(type=HEADING, text=text, page=page,
                                    level=HEADING_TAGS[tag], font_size=size,
                                    bold=True, bbox=node.bbox()))
            return
        if tag == "p":
            text = _inline_text(node, cfg, stats)
            if text:
                size = node.font_size() or BODY_DEFAULT_SIZE
                stats.font_size_freq[size] = stats.font_size_freq.get(size, 0) + len(text)
                blocks.append(Block(type=PARAGRAPH, text=text, page=page,
                                    font_size=size, bold=node.is_bold(),
                                    decoration=_decoration(node), bbox=node.bbox()))
            return
        if tag in ("ul", "ol") and cfg.detect_lists:
            block = _build_list(node, cfg, stats, page, depth=0)
            if block.kids:
                blocks.append(block)
            return
        if tag == "table" and cfg.detect_tables:
            block = _build_table(node, cfg, stats, page)
            if block.kids:
                blocks.append(block)
            return
        if tag == "pre":
            raw = node.iter_text()
            lines = [_CTRL_RE.sub(cfg.replacement_text, ln).rstrip()
                     for ln in raw.split("\n")]
            stats.total_chars += len(raw)
            text = "\n".join(ln for ln in lines if ln.strip())
            if not text:
                return
            aligned = _aligned_columns_table(text, page, cfg)
            blocks.append(aligned if aligned is not None
                          else Block(type=TEXT_BLOCK, text=text, page=page))
            return
        if tag == "figure":
            img_alt = ""
            img_src = ""
            cap_text = ""
            for c in node.children:
                if c.is_text() or _skip(c, cfg):
                    continue
                if c.tag == "img":
                    img_alt = clean_text(c.attr("alt"), cfg, stats)
                    img_src = c.attr("src")
                elif c.tag == "figcaption":
                    cap_text = _inline_text(c, cfg, stats)
            blocks.append(Block(type=IMAGE, text=img_alt, page=page,
                                bbox=node.bbox(), src=img_src))
            if cap_text and cfg.detect_captions:
                blocks.append(Block(type=CAPTION, text=cap_text, page=page))
            return
        if tag == "img":
            blocks.append(Block(type=IMAGE, text=clean_text(node.attr("alt"), cfg, stats),
                                page=page, bbox=node.bbox(),
                                src=node.attr("src")))
            return
        if tag in ("header", "footer"):
            inner = _inline_text(node, cfg, stats)
            if inner:
                hf = Block(type=HEADER_FOOTER, page=page,
                           label="header" if tag == "header" else "footer")
                hf.kids.append(Block(type=PARAGRAPH, text=inner, page=page))
                blocks.append(hf)
            return
        if tag in ("blockquote", "div", "section", "article", "main", "body",
                   "html", "#root", "aside", "nav", "span"):
            recurse_container(node)
            return
        # unknown element: treat as inline
        pending_inline.append(node)

    def recurse_container(container: Node) -> None:
        for child in container.children:
            if child.is_text():
                if child.text.strip():
                    pending_inline.append(child)
                continue
            if _skip(child, cfg):
                continue
            if child.tag in ("span", "b", "strong", "i", "em", "u", "s", "strike",
                             "del", "ins", "a", "code", "small", "sub", "sup",
                             "br", "#text"):
                pending_inline.append(child)
                continue
            flush_inline(container)
            bbox = child.bbox() if child.position() in ("absolute", "fixed") else None
            before = len(blocks)
            emit(child)
            if bbox is not None:
                for b in blocks[before:]:
                    if b.bbox is None:
                        b.bbox = bbox
        flush_inline(container)

    recurse_container(page_node)
    return blocks


# ----------------------------------------------------- document-level refinements


def detect_style_headings(pages: List[List[Block]], stats: DocStats,
                          cfg: ExtractorConfig) -> None:
    """Promote short, larger-than-body-mode paragraphs to headings
    (``HeadingProcessor.java:170-186`` + ``ModeWeightStatistics`` rarity boost).
    The body mode is the character-weighted modal font size."""
    if not cfg.detect_headings or not stats.font_size_freq:
        return
    mode_size = max(sorted(stats.font_size_freq), key=lambda s: (stats.font_size_freq[s], -s))
    for page_blocks in pages:
        for b in page_blocks:
            if (b.type == PARAGRAPH and b.font_size and b.font_size > mode_size
                    and len(b.text) <= 120 and "\n" not in b.text):
                b.type = HEADING
                b.level = 0  # assigned by assign_heading_levels


def assign_heading_levels(pages: List[List[Block]]) -> None:
    """Document-global dense-rank of heading font sizes → levels 1..N
    (``HeadingProcessor.detectHeadingsLevels``, ``:192-243``). Headings without
    a size inherit the level of the nearest font size."""
    headings = [b for page in pages for b in page if b.type == HEADING]
    sized = sorted({b.font_size for b in headings if b.font_size}, reverse=True)
    if not sized:
        return
    rank = {s: i + 1 for i, s in enumerate(sized)}
    for b in headings:
        if b.font_size:
            b.level = rank[b.font_size]
        else:
            b.level = len(sized)


def detect_special_tables(pages: List[List[Block]], cfg: ExtractorConfig) -> None:
    """Consecutive 수신/경유/제목 key-value paragraphs → synthetic 2-col table
    (``SpecialTableProcessor.java:33-100``)."""
    if not cfg.detect_special_tables:
        return
    for page_blocks in pages:
        i = 0
        while i < len(page_blocks):
            j = i
            matches: List[Tuple[str, str]] = []
            while j < len(page_blocks) and page_blocks[j].type in (PARAGRAPH, TEXT_BLOCK):
                m = _SPECIAL_TABLE_RE.match(page_blocks[j].text)
                if not m:
                    break
                matches.append((m.group(1), m.group(2).strip()))
                j += 1
            if matches:
                page = page_blocks[i].page
                table = Block(type=TABLE, page=page)
                for r, (k, v) in enumerate(matches):
                    row = Block(type=TABLE_ROW, page=page, row=r)
                    row.kids.append(Block(type=TABLE_CELL, text=k, page=page, row=r, col=0))
                    row.kids.append(Block(type=TABLE_CELL, text=v, page=page, row=r, col=1))
                    table.kids.append(row)
                page_blocks[i:j] = [table]
                i += 1
            else:
                i += 1


_TOC_PAGENUM_RE = re.compile(r".+[\s.]\d+$", re.S)
_TOC_DECIMAL_RE = re.compile(r".*\d+\.\d+$", re.S)


def detect_toc(pages: List[List[Block]], cfg: ExtractorConfig) -> None:
    """Table-of-contents detection — ``TableOfContentsProcessor.java:30-221``
    analog for flowed HTML: a run of ≥3 CONSECUTIVE single-line text blocks
    whose text ends in a page number (digits preceded by whitespace or a
    dot leader, ``hasPageNumber``'s regex pair — decimal endings like
    '3.14' rejected) collapses into one ``toc`` block with one ``toc item``
    kid per entry (JsonName.TOC_TYPE / TOC_ITEM_TYPE). The reference
    additionally requires right-edge alignment within 0.3×font-size
    (``isTwoTOCItemsOfOneTOC``) — per-line geometry flowed HTML doesn't
    have, so the transferable rules are the suffix + run length. Mirrors
    the reference's own default: its processor is DISABLED in the pipeline
    (``DocumentProcessor.java:370-379``), so ``detect_toc`` defaults False
    — which also keeps the byte-identical `text` surface stable for
    existing corpora."""
    if not cfg.detect_toc:
        return
    for blocks in pages:
        out: List[Block] = []
        run: List[Block] = []

        def flush() -> None:
            if len(run) >= 3:
                toc = Block(type=TOC, page=run[0].page)
                toc.kids = [Block(type=TOC_ITEM, text=b.text, page=b.page)
                            for b in run]
                out.append(toc)
            else:
                out.extend(run)
            run.clear()

        for b in blocks:
            if (b.type in (PARAGRAPH, TEXT_BLOCK) and b.text
                    and "\n" not in b.text
                    and _TOC_PAGENUM_RE.match(b.text)
                    and not _TOC_DECIMAL_RE.match(b.text)):
                run.append(b)
            else:
                flush()
                out.append(b)
        flush()
        blocks[:] = out


def detect_text_captions(pages: List[List[Block]], cfg: ExtractorConfig) -> None:
    """Paragraphs like 'Figure 3 …' adjacent to an image/table → caption
    (``CaptionProcessor.java:46-100`` adjacency linkage)."""
    if not cfg.detect_captions:
        return
    for page_blocks in pages:
        for i, b in enumerate(page_blocks):
            if b.type != PARAGRAPH or not _CAPTION_RE.match(b.text):
                continue
            prev_t = page_blocks[i - 1].type if i > 0 else None
            next_t = page_blocks[i + 1].type if i + 1 < len(page_blocks) else None
            if prev_t in (IMAGE, TABLE) or next_t in (IMAGE, TABLE):
                b.type = CAPTION


def _table_ncols(table: Block) -> int:
    return max((c.col + c.col_span for row in table.kids for c in row.kids),
               default=0)


def _list_label_style(block: Block) -> str:
    """Numbering style of a LIST block. The source-derived style recorded at
    build time wins (``<ol type>`` / ``list-style-type`` — ADVICE r1: label
    text alone is ambiguous, e.g. a lowerroman list starting at 'i.').
    Fallback label parsing checks multi-char roman sequences across ALL items
    before the single-char alpha classification."""
    if block.list_style:
        return block.list_style
    labels = [it.label for it in block.kids if it.type == LIST_ITEM and it.label]
    if not labels:
        return "unknown"
    if labels[0] == "•":
        return "bullet"
    if any(re.fullmatch(r"[ivxl]{2,}\.", lb) for lb in labels):
        return "lowerroman"
    if any(re.fullmatch(r"[IVXL]{2,}\.", lb) for lb in labels):
        return "upperroman"
    first = labels[0]
    if re.fullmatch(r"\d+\.", first):
        return "arabic"
    if re.fullmatch(r"[a-z]\.", first):
        return "loweralpha"
    if re.fullmatch(r"[A-Z]\.", first):
        return "upperalpha"
    return "unknown"


def _table_widths_close(a: Block, b: Block) -> bool:
    """NEIGHBOUR_TABLE_EPSILON analog (``TableBorderProcessor.java:228-236``):
    fragments of one table have (nearly) equal width. HTML tables usually
    carry no bbox, in which case column count alone decides (DOM layout gives
    no width signal)."""
    if a.bbox is None or b.bbox is None:
        return True
    wa, wb = a.bbox[2] - a.bbox[0], b.bbox[2] - b.bbox[0]
    return abs(wa - wb) <= max(2.0, 0.05 * max(wa, wb))


def merge_neighbor_structures(pages: List[List[Block]], cfg: ExtractorConfig) -> None:
    """Merge a table/list that continues across page breaks
    (``TableBorderProcessor.checkNeighborTables`` /
    ``ListProcessor.checkNeighborLists``, ``DocumentProcessor.java:417-423``).

    Reference style: ONE surviving table/list is tracked across the whole
    document and every consecutive fragment merges into it (so 3+-page
    structures chain); any intervening real content resets the chain.
    Deviation from the PDF reference: fragments must sit on *different* pages
    — in HTML, adjacent ``<table>`` elements on one page are explicit,
    intentional boundaries, unlike detected PDF table regions."""
    tracked: Optional[Block] = None
    for page_blocks in pages:
        merged_away: List[Block] = []
        for b in page_blocks:
            if b.type == HEADER_FOOTER:
                continue  # boilerplate never breaks a continuation
            if b.type == TABLE and cfg.detect_tables:
                if (tracked is not None and tracked.type == TABLE
                        and b.page != tracked.page
                        and _table_ncols(tracked) == _table_ncols(b) > 0
                        and _table_widths_close(tracked, b)):
                    base_rows = len(tracked.kids)
                    for i, row in enumerate(b.kids):
                        row.row = base_rows + i
                        for cell in row.kids:
                            cell.row = row.row
                        tracked.kids.append(row)
                    merged_away.append(b)  # tracked keeps carrying to p+2…
                else:
                    tracked = b
            elif b.type == LIST and cfg.detect_lists:
                if (tracked is not None and tracked.type == LIST
                        and b.page != tracked.page
                        and tracked.level == b.level
                        and _list_label_style(tracked) == _list_label_style(b)
                        != "unknown"):
                    style = _list_label_style(tracked)
                    idx = sum(1 for it in tracked.kids if it.type == LIST_ITEM)
                    for item in b.kids:
                        if item.type == LIST_ITEM and style != "bullet":
                            item.label = _list_label(style, idx)
                            idx += 1
                        tracked.kids.append(item)
                    merged_away.append(b)
                else:
                    tracked = b
            else:
                tracked = None  # real content between fragments breaks the chain
        for b in merged_away:
            page_blocks.remove(b)


def _normalize_page_number(text: str) -> str:
    return _DIGIT_RE.sub("#", text)


_ROMAN_TOKEN_RE = re.compile(r"\b([ivxlcdm]{1,7}|[IVXLCDM]{1,7})\b")
_ROMAN_VAL = {"i": 1, "v": 5, "x": 10, "l": 50, "c": 100, "d": 500, "m": 1000}


def _roman_to_int(tok: str) -> Optional[int]:
    total, prev = 0, 0
    for ch in reversed(tok.lower()):
        v = _ROMAN_VAL.get(ch)
        if v is None:
            return None
        if v < prev:
            total -= v
        else:
            total += v
            prev = v
    return total if total > 0 else None


def _hf_numbers(text: str) -> Tuple[str, List[int]]:
    """Normalize page-number-like tokens to '#' and return their values —
    arabic digits always; standalone roman numerals only in short texts (the
    RomanNumbers label algorithm applies to footer-length lines)."""
    nums: List[int] = []

    def sub_digit(m: "re.Match") -> str:
        nums.append(int(m.group(0)))
        return "#"

    norm = _DIGIT_RE.sub(sub_digit, text)
    if len(text) <= 30:
        def sub_roman(m: "re.Match") -> str:
            val = _roman_to_int(m.group(0))
            if val is None:
                return m.group(0)
            nums.append(val)
            return "#"

        norm = _ROMAN_TOKEN_RE.sub(sub_roman, norm)
    return norm, nums


def _hf_match(a: Block, b: Block, dist: int) -> bool:
    """``arePossibleHeadersOrFooters`` analog (HeaderFooterProcessor.java:
    276-310): equal font size, equal text — or a label sequence: identical
    normalized shape whose numeric groups are equal or exactly one advances by
    the page distance (the Arabic/Roman label-detection algorithms with
    ``increment``)."""
    if a.font_size and b.font_size and a.font_size != b.font_size:
        return False
    if a.text == b.text:
        return True
    norm_a, nums_a = _hf_numbers(a.text)
    norm_b, nums_b = _hf_numbers(b.text)
    if norm_a != norm_b or len(nums_a) != len(nums_b) or not nums_a:
        return False
    diffs = [y - x for x, y in zip(nums_a, nums_b)]
    changing = [d for d in diffs if d != 0]
    if not changing:
        return True  # same shape, same numbers (e.g. a date line)
    return len(changing) == 1 and changing[0] == dist


def detect_header_footer(pages: List[List[Block]], cfg: ExtractorConfig) -> None:
    """Cross-page repetition vote (``HeaderFooterProcessor.java:117-220``),
    reference-style: the header (footer) region GROWS block by block — depth d
    is accepted on a page when its d-th block from the top (bottom) matches
    the same-depth block on page ±1 (or ±2: two-page alternating layouts) by
    equal text or a page-number label sequence. Matched blocks become
    header/footer boilerplate containers."""
    if not cfg.detect_header_footer or len(pages) < 2:
        return

    def texty(b: Block) -> bool:
        return b.type in (PARAGRAPH, TEXT_BLOCK, HEADING)

    vis = [[b for b in p if b.type != HEADER_FOOTER] for p in pages]
    n = len(pages)
    n_header = [0] * n
    n_footer = [0] * n
    for is_header in (True, False):
        counts = n_header if is_header else n_footer
        other = n_footer if is_header else n_header
        depth = 0
        while True:
            cands: List[Optional[Block]] = []
            for p in range(n):
                blocks = vis[p]
                if counts[p] != depth:
                    cands.append(None)
                    continue
                # never absorb the whole page or overlap the opposite region
                if depth + other[p] + 1 >= len(blocks):
                    cands.append(None)
                    continue
                idx = depth if is_header else len(blocks) - 1 - depth
                b = blocks[idx]
                cands.append(b if texty(b) else None)
            accepted: set = set()
            for inc in (1, 2):
                for p in range(n - inc):
                    if (cands[p] is not None and cands[p + inc] is not None
                            and _hf_match(cands[p], cands[p + inc], inc)):
                        accepted.add(p)
                        accepted.add(p + inc)
            if not accepted:
                break
            for p in accepted:
                counts[p] += 1
            depth += 1
    for p in range(n):
        blocks = vis[p]
        for d in range(min(n_header[p], len(blocks))):
            b = blocks[d]
            idx = pages[p].index(b)
            hf = Block(type=HEADER_FOOTER, page=b.page, label="header")
            hf.kids.append(b)
            pages[p][idx] = hf
        for d in range(min(n_footer[p], max(0, len(blocks) - n_header[p]))):
            b = blocks[len(blocks) - 1 - d]
            idx = pages[p].index(b)
            hf = Block(type=HEADER_FOOTER, page=b.page, label="footer")
            hf.kids.append(b)
            pages[p][idx] = hf
