"""Serializers: blocks → plain text / Markdown / JSON-able dict.

Text output mirrors ``core/text/TextGenerator.java:81-160``: objects joined by
single newlines, indent per nesting level, images skipped, header/footer
included only when configured; pages separated by a blank line (plus an
optional page-separator string). Markdown mirrors
``core/markdown/MarkdownGenerator.java:96-125``; JSON mirrors
``core/json/JsonWriter.java:70-108`` + ``schema.json``.

All pure functions — used identically by the distributed engine and the
single-process oracle, which is what makes the byte-identical invariant hold.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from ..config import ExtractorConfig
from .blocks import (
    TOC,
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
    Block,
)

# ------------------------------------------------------------------------- text


def _indent_lines(text: str, indent: str, level: int) -> List[str]:
    pad = indent * level
    return [pad + line for line in text.split("\n")]


def _block_lines(b: Block, cfg: ExtractorConfig, level: int) -> List[str]:
    if b.type == HEADER_FOOTER:
        if not cfg.include_header_footer:
            return []
        lines: List[str] = []
        for kid in b.kids:
            lines.extend(_block_lines(kid, cfg, level))
        return lines
    if b.type in (HEADING, PARAGRAPH, TEXT_BLOCK, CAPTION):
        return _indent_lines(b.text, cfg.indent, level)
    if b.type == LIST:
        lines = []
        for item in b.kids:
            lines.extend(_block_lines(item, cfg, level))
        return lines
    if b.type == LIST_ITEM:
        pad = cfg.indent * (level + b.level)
        first = f"{pad}{b.label} {b.text}" if b.text else f"{pad}{b.label}"
        lines = [first]
        for sub in b.kids:  # nested lists
            lines.extend(_block_lines(sub, cfg, level))
        return lines
    if b.type == TABLE:
        lines = []
        for row in b.kids:
            cells = [c.text.replace("\n", " ") for c in row.kids]
            lines.append(cfg.indent * level + " | ".join(cells))
        return lines
    if b.type == IMAGE:
        return []  # TextGenerator writes no image content
    if b.type == TOC:
        lines = []
        for item in b.kids:
            lines.extend(_indent_lines(item.text, cfg.indent, level))
        return lines
    return _indent_lines(b.text, cfg.indent, level) if b.text else []


def _expand_sep(sep: str, page_idx: int) -> str:
    """Page-separator templates: %page-number% (reference) / %page%."""
    return sep.replace("%page-number%", str(page_idx + 1)) \
              .replace("%page%", str(page_idx + 1))


def to_text(pages: List[List[Block]], cfg: ExtractorConfig) -> str:
    """Deterministic linearization — THE byte-identical invariant surface."""
    separator = (cfg.text_page_separator if cfg.text_page_separator is not None
                 else cfg.page_separator)
    page_texts: List[str] = []
    for page_idx, blocks in enumerate(pages):
        lines: List[str] = []
        if separator:
            lines.append(_expand_sep(separator, page_idx))
        for b in blocks:
            lines.extend(_block_lines(b, cfg, 0))
        if lines:  # pages emptied by boilerplate removal / cross-page merges
            page_texts.append("\n".join(lines))
    return "\n\n".join(page_texts)


# --------------------------------------------------------------------- markdown


def _md_block(b: Block, cfg: ExtractorConfig, depth: int) -> List[str]:
    if b.type == HEADER_FOOTER:
        if not cfg.include_header_footer:
            return []
        out: List[str] = []
        for kid in b.kids:
            out.extend(_md_block(kid, cfg, depth))
        return out
    if b.type == HEADING:
        level = min(max(b.level, 1), 6)
        return ["#" * level + " " + b.text.replace("\n", " ")]
    if b.type in (PARAGRAPH, TEXT_BLOCK):
        # reference --detect-strikethrough: struck text → ~~text~~
        if cfg.detect_strikethrough and b.decoration == "line-through":
            return ["~~" + b.text + "~~"]
        return [b.text]
    if b.type == CAPTION:
        return ["*" + b.text.replace("\n", " ") + "*"]
    if b.type == IMAGE:
        href = b.src if cfg.markdown_with_images else ""
        return [f"![{b.text}]({href})"]
    if b.type == TOC:
        return [item.text.replace("\n", " ") for item in b.kids]
    if b.type == LIST:
        out = []
        for item in b.kids:
            out.extend(_md_block(item, cfg, depth))
        return out
    if b.type == LIST_ITEM:
        pad = "  " * b.level
        marker = "-" if b.label == "•" else b.label
        out = [f"{pad}{marker} {b.text}"]
        for sub in b.kids:
            out.extend(_md_block(sub, cfg, depth + 1))
        return out
    if b.type == TABLE:
        # reference --markdown-with-html: pipe tables cannot express spans —
        # emit real HTML for spanned tables (MarkdownGenerator complex path)
        has_spans = any(c.row_span > 1 or c.col_span > 1
                        for row in b.kids for c in row.kids)
        if cfg.markdown_with_html and has_spans:
            out = ["<table>"]
            for row in b.kids:
                cells = []
                for c in row.kids:
                    tag = "th" if c.is_header else "td"
                    attrs = ""
                    if c.col_span > 1:
                        attrs += f' colspan="{c.col_span}"'
                    if c.row_span > 1:
                        attrs += f' rowspan="{c.row_span}"'
                    cells.append(f"<{tag}{attrs}>{c.text}</{tag}>")
                out.append("<tr>" + "".join(cells) + "</tr>")
            out.append("</table>")
            return out
        # pipe-table grid semantics (MarkdownTableTest): spanned content is
        # written ONCE at its anchor column; covered positions render as
        # empty cells; the separator always spans the full column count
        n_cols = max((c.col + c.col_span for row in b.kids for c in row.kids),
                     default=0)
        out = []
        for i, row in enumerate(b.kids):
            cells = [""] * n_cols
            for c in row.kids:
                if 0 <= c.col < n_cols:
                    cells[c.col] = c.text.replace("\n", " ").replace("|", "\\|")
            out.append("| " + " | ".join(cells) + " |")
            if i == 0:
                out.append("|" + "|".join([" --- "] * n_cols) + "|")
        return out
    return [b.text] if b.text else []


def to_markdown(pages: List[List[Block]], cfg: ExtractorConfig) -> str:
    parts: List[str] = []
    for page_idx, blocks in enumerate(pages):
        if cfg.markdown_page_separator:
            parts.append(_expand_sep(cfg.markdown_page_separator, page_idx))
        for b in blocks:
            md = _md_block(b, cfg, 0)
            if md:
                parts.append("\n".join(md))
    return "\n\n".join(parts)


# ------------------------------------------------------------------------- json


def _json_block(b: Block) -> Dict:
    out: Dict = {"type": b.type, "page number": b.page + 1}
    if b.id >= 0:
        out["id"] = b.id
    if b.bbox is not None:
        out["bounding box"] = list(b.bbox)
    if b.type == HEADING or (b.type in (LIST, LIST_ITEM) and b.level):
        out["level"] = b.level
    if b.text:
        out["content"] = b.text
    if b.type == TABLE_CELL:
        out.update({"row number": b.row, "column number": b.col,
                    "row span": b.row_span, "column span": b.col_span,
                    "is header": b.is_header})
    if b.type == LIST_ITEM and b.label:
        out["label"] = b.label
    if b.type == IMAGE and b.src:
        out["image src"] = b.src
    if b.kids:
        key = ("rows" if b.type == TABLE
               else "cells" if b.type == TABLE_ROW
               else "list items" if b.type == LIST
               else "kids")
        out[key] = [_json_block(k) for k in b.kids]
    return out


def to_json_dict(pages: List[List[Block]], cfg: ExtractorConfig,
                 file_name: str = "") -> Dict:
    kids = []
    for blocks in pages:
        for b in blocks:
            if b.type == HEADER_FOOTER and not cfg.include_header_footer:
                continue  # JsonWriter.java:92-94
            kids.append(_json_block(b))
    return {"file name": file_name, "number of pages": len(pages), "kids": kids}
