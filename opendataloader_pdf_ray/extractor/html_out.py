"""HTML serializer: blocks → HTML (``core/html/HtmlGenerator.java:119`` analog)."""

from __future__ import annotations

from html import escape
from typing import List

from ..config import ExtractorConfig
from .blocks import (
    CAPTION, HEADER_FOOTER, HEADING, IMAGE, LIST, LIST_ITEM, PARAGRAPH,
    TABLE, TEXT_BLOCK, Block,
)


def _render(b: Block, cfg: ExtractorConfig, out: List[str]) -> None:
    if b.type == HEADER_FOOTER:
        if cfg.include_header_footer:
            out.append(f'<div class="{escape(b.label or "header")}">')
            for kid in b.kids:
                _render(kid, cfg, out)
            out.append("</div>")
        return
    if b.type == HEADING:
        level = min(max(b.level, 1), 6)
        out.append(f"<h{level}>{escape(b.text)}</h{level}>")
        return
    if b.type in (PARAGRAPH, TEXT_BLOCK):
        out.append(f"<p>{escape(b.text)}</p>")
        return
    if b.type == CAPTION:
        out.append(f"<figcaption>{escape(b.text)}</figcaption>")
        return
    if b.type == IMAGE:
        src = f' src="{escape(b.src)}"' if b.src else ""
        out.append(f'<img alt="{escape(b.text)}"{src}/>')
        return
    if b.type == LIST:
        tag = "ol" if (b.kids and b.kids[0].label not in ("•", "")) else "ul"
        out.append(f"<{tag}>")
        for item in b.kids:
            _render(item, cfg, out)
        out.append(f"</{tag}>")
        return
    if b.type == LIST_ITEM:
        out.append(f"<li>{escape(b.text)}")
        for sub in b.kids:
            _render(sub, cfg, out)
        out.append("</li>")
        return
    if b.type == TABLE:
        out.append("<table>")
        for row in b.kids:
            out.append("<tr>")
            for cell in row.kids:
                tag = "th" if cell.is_header else "td"
                attrs = ""
                if cell.row_span > 1:
                    attrs += f' rowspan="{cell.row_span}"'
                if cell.col_span > 1:
                    attrs += f' colspan="{cell.col_span}"'
                out.append(f"<{tag}{attrs}>{escape(cell.text)}</{tag}>")
            out.append("</tr>")
        out.append("</table>")
        return
    if b.text:
        out.append(f"<p>{escape(b.text)}</p>")


def to_html(pages: List[List[Block]], cfg: ExtractorConfig) -> str:
    from .linearize import _expand_sep

    out: List[str] = ["<html><body>"]
    for idx, blocks in enumerate(pages):
        if idx and cfg.html_page_separator:
            # reference --html-page-separator (%page-number% templates)
            out.append(escape(_expand_sep(cfg.html_page_separator, idx)))
        out.append(f'<div class="page" data-page="{idx + 1}">')
        for b in blocks:
            _render(b, cfg, out)
        out.append("</div>")
    out.append("</body></html>")
    return "\n".join(out)
