"""HTML → lightweight DOM.

The HTML analog of the reference's veraPDF parse step
(``core/processors/DocumentProcessor.java:613-660`` ``preprocessing``): turn
the raw payload into a tree of styled nodes the downstream operators consume.
Pure stdlib (``html.parser``), fully deterministic.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html import unescape
from html.parser import HTMLParser
from types import MappingProxyType
from typing import Dict, List, Optional

VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
SKIP_TAGS = frozenset("script style head title noscript template".split())

_STYLE_RE = re.compile(r"\s*([a-zA-Z-]+)\s*:\s*([^;]+)\s*(?:;|$)")
_PX_RE = re.compile(r"(-?\d+(?:\.\d+)?)\s*(?:px|pt)?\s*$")


def parse_style(style: str) -> Dict[str, str]:
    return {m.group(1).lower(): m.group(2).strip() for m in _STYLE_RE.finditer(style or "")}


def style_px(value: Optional[str]) -> Optional[float]:
    if not value:
        return None
    m = _PX_RE.match(value)
    return float(m.group(1)) if m else None


# shared empty mapping for attr-less / style-less nodes (most of any page):
# read-only by construction — nothing mutates attrs/style after parse, and a
# proxy fails loud if that ever changes. Cuts two dict allocations per node,
# which is most of the DOM's DRAM traffic on parse-heavy workloads.
_EMPTY_MAP: Dict[str, str] = MappingProxyType({})  # type: ignore[assignment]
_NO_CHILDREN: List["Node"] = ()  # type: ignore[assignment]  # text leaves
_UNSET = object()  # font-size memo sentinel


@dataclass(slots=True)
class Node:
    """One element or text run. ``tag == '#text'`` for text leaves."""

    tag: str
    attrs: Dict[str, str] = field(default_factory=lambda: _EMPTY_MAP)
    style: Dict[str, str] = field(default_factory=lambda: _EMPTY_MAP)
    children: List["Node"] = field(default_factory=list)
    text: str = ""
    parent: Optional["Node"] = None
    _fs: object = _UNSET  # memoized inherited font-size

    # ------------------------------------------------------------------ helpers
    def attr(self, name: str, default: str = "") -> str:
        return self.attrs.get(name, default)

    def classes(self) -> List[str]:
        return self.attr("class").split()

    def is_text(self) -> bool:
        return self.tag == "#text"

    def iter_text(self) -> str:
        """Concatenated descendant text (document order)."""
        if self.is_text():
            return self.text
        return "".join(c.iter_text() for c in self.children)

    # styles with inheritance for font-ish properties
    def eff_style(self, name: str) -> Optional[str]:
        node: Optional[Node] = self
        while node is not None:
            v = node.style.get(name)
            if v is not None:
                return v
            node = node.parent
        return None

    def font_size(self) -> Optional[float]:
        # nearest set font-size, parsed once per node (styles are immutable
        # after parse); inheriting the parent's memo makes the whole-tree
        # cost O(nodes) instead of O(nodes × depth × queries)
        v = self._fs
        if v is _UNSET:
            s = self.style.get("font-size")
            if s is not None:
                v = style_px(s)
            elif self.parent is not None:
                v = self.parent.font_size()
            else:
                v = None
            self._fs = v
        return v

    def is_bold(self) -> bool:
        w = self.eff_style("font-weight")
        if w:
            if w.isdigit():
                return int(w) >= 600
            if w in ("bold", "bolder"):
                return True
        node: Optional[Node] = self
        while node is not None:
            if node.tag in ("b", "strong"):
                return True
            node = node.parent
        return False

    def position(self) -> Optional[str]:
        return self.style.get("position")

    def bbox(self) -> Optional[List[float]]:
        """[left, top, right, bottom] from inline position styles, if any."""
        left = style_px(self.style.get("left"))
        top = style_px(self.style.get("top"))
        if left is None and top is None:
            return None
        left = left if left is not None else 0.0
        top = top if top is not None else 0.0
        width = style_px(self.style.get("width")) or 0.0
        height = style_px(self.style.get("height")) or 0.0
        return [left, top, left + width, top + height]


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node(tag="#root")
        self.stack: List[Node] = [self.root]
        self.skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if self.skip_depth:
            if tag not in VOID_TAGS:
                self.skip_depth += 1
            return
        if tag in SKIP_TAGS:
            self.skip_depth = 1
            return
        attrd = {k: (v or "") for k, v in attrs} if attrs else _EMPTY_MAP
        st = attrd.get("style")
        node = Node(tag=tag, attrs=attrd,
                    style=parse_style(st) if st else _EMPTY_MAP,
                    parent=self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        if self.skip_depth:
            return
        attrd = {k: (v or "") for k, v in attrs} if attrs else _EMPTY_MAP
        st = attrd.get("style")
        node = Node(tag=tag, attrs=attrd,
                    style=parse_style(st) if st else _EMPTY_MAP,
                    parent=self.stack[-1])
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag):
        if self.skip_depth:
            self.skip_depth -= 1
            return
        # close the nearest matching open tag (forgiving, like browsers)
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if self.skip_depth or not data:
            return
        parent = self.stack[-1]
        parent.children.append(Node(tag="#text", text=data, parent=parent,
                                    children=_NO_CHILDREN))


def parse_html(html: str | bytes, parser: str = "stdlib") -> Node:
    """Parse HTML into a Node tree. Invalid UTF-8 bytes become U+FFFD, which the
    invalid-character step then measures/replaces (``TextProcessor.java:41-74``).

    ``parser``: ``"stdlib"`` (default — html.parser, always available) or
    ``"lxml"`` — the optional C fast path (the veraPDF-parse-swap analog,
    ``DocumentProcessor.java:613-660``; round-3 profile: stdlib parse = 40%
    of extract wall). lxml must be EXPLICITLY chosen, never auto-detected:
    on a mixed cluster auto-pick would parse the same page differently on
    different workers and break the byte-identical determinism invariant.
    Raises ImportError with a clear message when lxml isn't installed; the
    cross-parser byte-equality suite (tests/test_extractor.py, skipped
    where lxml is absent) is the guard for enabling it."""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    if parser == "lxml":
        return _parse_html_lxml(html)
    if parser != "stdlib":
        raise ValueError(f"unknown parser {parser!r} — use 'stdlib' or "
                         f"'lxml'")
    builder = _TreeBuilder()
    builder.feed(unescape_entities_safe(html))
    builder.close()
    return builder.root


def _parse_html_lxml(html: str) -> Node:
    """lxml.etree fast path building the SAME Node tree shape as the
    stdlib builder: SKIP_TAGS subtrees dropped (tail text kept), text/tail
    runs become ``#text`` leaves, attrs/style parsed identically. Only the
    tokenizer differs — for well-formed pages both parsers yield identical
    trees, pinned by the cross-parser equality suite."""
    try:
        from lxml import etree
    except ImportError as exc:  # pragma: no cover - container has no lxml
        raise ImportError(
            "ExtractorConfig(parser='lxml') requires the lxml package — "
            "install it, or use the default stdlib parser") from exc
    lx_root = etree.fromstring(
        html, etree.HTMLParser(recover=True, no_network=True))
    root = Node(tag="#root")
    if lx_root is None:  # empty / unparseable input
        return root

    def build(el, parent: Node) -> None:
        if not isinstance(el.tag, str):  # comment / PI: drop, keep tail
            return
        tag = el.tag.lower()
        if tag in SKIP_TAGS:
            return
        attrd = {k.lower(): (v or "") for k, v in el.attrib.items()} \
            if el.attrib else _EMPTY_MAP
        st = attrd.get("style")
        node = Node(tag=tag, attrs=attrd,
                    style=parse_style(st) if st else _EMPTY_MAP,
                    parent=parent)
        parent.children.append(node)
        if el.text:
            node.children.append(Node(tag="#text", text=el.text,
                                      parent=node, children=_NO_CHILDREN))
        for child in el:
            build(child, node)
            if child.tail:
                # tail text belongs to THIS node (the child's parent) —
                # and survives even when the child subtree was skipped
                node.children.append(Node(tag="#text", text=child.tail,
                                          parent=node,
                                          children=_NO_CHILDREN))
    build(lx_root, root)
    return root


def unescape_entities_safe(html: str) -> str:
    # html.parser with convert_charrefs=True already unescapes text data;
    # nothing extra needed, hook kept for symmetry/future escaping rules.
    return html
