"""Block model — the extractor's intermediate representation.

Maps the reference element lattice (SURVEY.md §1.1: ``SemanticParagraph``,
``SemanticHeading``, ``PDFList``/``ListItem``, ``TableBorder``/``…Cell``,
``SemanticCaption``, ``SemanticHeaderOrFooter``; see
``core/json/JsonWriter.java:86-98`` for the flattened kids order) onto a flat
pre-order list of dict-able blocks suitable for an Arrow
``list<struct>`` column.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

# block types (JsonName analog, core/json/JsonName.java:18-81)
PARAGRAPH = "paragraph"
HEADING = "heading"
LIST = "list"
LIST_ITEM = "list item"
TABLE = "table"
TABLE_ROW = "table row"
TABLE_CELL = "table cell"
CAPTION = "caption"
IMAGE = "image"
HEADER_FOOTER = "header/footer"
TEXT_BLOCK = "text block"
TOC = "toc"                         # JsonName.TOC_TYPE
TOC_ITEM = "toc item"               # JsonName.TOC_ITEM_TYPE


@dataclass
class Block:
    type: str
    text: str = ""
    level: int = 0                      # heading level / list nesting depth
    page: int = 0
    bbox: Optional[List[float]] = None  # [left, top, right, bottom] or None
    font_size: Optional[float] = None
    bold: bool = False
    # table cell geometry (core/json/JsonName: row/column number + spans)
    row: int = -1
    col: int = -1
    row_span: int = 1
    col_span: int = 1
    is_header: bool = False
    label: str = ""                     # list item label ("1.", "a.", "•")
    list_style: str = ""                # LIST numbering style from the source
                                        # <ol type>/list-style (not serialized)
    src: str = ""                       # IMAGE source (data: URI or URL;
                                        # feeds markdown-with-images output)
    decoration: str = ""                # "underline" / "line-through" / ""
    hidden: bool = False
    kids: List["Block"] = field(default_factory=list)
    id: int = -1                        # per-document ordinal, set by set_ids()


def set_ids(blocks: List[Block]) -> int:
    """Assign deterministic pre-order ordinals.

    The reference assigns global sequential structure ids in page order
    (``core/processors/DocumentProcessor.java:734-738`` / ``:401-405``); ids
    restart per document so a per-row counter preserves the semantics without
    any cross-row coordination (SURVEY.md §7.4 determinism requirement).
    """
    counter = 0

    def visit(block: Block) -> None:
        nonlocal counter
        block.id = counter
        counter += 1
        for kid in block.kids:
            visit(kid)

    for b in blocks:
        visit(b)
    return counter


def flatten(blocks: List[Block]) -> List[Dict]:
    """Pre-order flatten with parent pointers → rows for the Arrow struct list."""
    out: List[Dict] = []

    def visit(block: Block, parent_id: int) -> None:
        out.append(
            {
                "id": block.id,
                "parent": parent_id,
                "type": block.type,
                "level": block.level,
                "page": block.page,
                "text": block.text,
                "bbox": block.bbox,
                "row": block.row,
                "col": block.col,
                "row_span": block.row_span,
                "col_span": block.col_span,
                "label": block.label,
            }
        )
        for kid in block.kids:
            visit(kid, block.id)

    for b in blocks:
        visit(b, -1)
    return out
