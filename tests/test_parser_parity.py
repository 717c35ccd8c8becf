"""Optional lxml fast-parse path (r3 verdict item #4, PIL pattern): the
cross-parser byte-equality guard over the full fixture corpus, skipped
where lxml is absent (this container ships none — the stdlib path is the
one CI exercises; the suite runs wherever lxml exists)."""

import importlib.util

import pytest

from opendataloader_pdf_ray.config import ExtractorConfig
from opendataloader_pdf_ray.extractor import extract_text
from opendataloader_pdf_ray.extractor.dom import parse_html
from opendataloader_pdf_ray.fixtures.gen import render_html, url_universe

HAS_LXML = importlib.util.find_spec("lxml") is not None

EDGE_SNIPPETS = [
    b"",
    b"plain text, no tags",
    b"<p>unclosed <b>bold",
    b"<html><body><div class='page'><p>a &amp; b &#65;</p>"
    b"<script>skip('<p>not text</p>')</script>tail kept</div></body></html>",
    b"<table><tr><td>a<td>b</tr><tr><td colspan='2'>c</table>",
    b"<ul><li>one<li>two<ol type='a'><li>x</ol></ul>",
    "<p>수신: 한국어 텍스트 �</p>".encode(),
]


class TestParserConfig:
    def test_lxml_absent_raises_clearly(self):
        """In a container without lxml the opt-in must fail loudly, never
        silently fall back (mixed-cluster determinism)."""
        if HAS_LXML:
            pytest.skip("lxml present — absence behavior not testable")
        with pytest.raises(ImportError, match="lxml"):
            parse_html("<p>x</p>", parser="lxml")

    def test_unknown_parser_rejected(self):
        with pytest.raises(ValueError, match="unknown parser"):
            parse_html("<p>x</p>", parser="html5")

    def test_default_is_stdlib(self):
        assert ExtractorConfig().parser == "stdlib"


class TestLxmlTreeWalk:
    """The lxml→Node walk itself, validated WITHOUT lxml via a stub
    etree module (fake element objects with text/tail/attrib/children) —
    so the conversion logic is exercised even in this lxml-less container;
    the tokenizer-level equality suite below runs where lxml exists."""

    class _El:
        def __init__(self, tag, attrib=None, text=None, tail=None,
                     children=()):
            self.tag = tag
            self.attrib = attrib or {}
            self.text = text
            self.tail = tail
            self._children = list(children)

        def __iter__(self):
            return iter(self._children)

    def _fake_lxml(self, root_el):
        import sys
        import types

        el = self._El
        etree = types.ModuleType("lxml.etree")
        etree.HTMLParser = lambda **kw: None
        etree.fromstring = lambda html, parser: root_el
        lxml = types.ModuleType("lxml")
        lxml.etree = etree
        sys.modules["lxml"] = lxml
        sys.modules["lxml.etree"] = etree
        return el

    def test_text_tail_skip_and_comment_handling(self):
        import sys

        El = self._fake_lxml(None)
        comment = El(lambda: None, tail=" after comment")  # non-str tag
        script = El("script", text="skip me", tail=" tail kept")
        bold = El("b", text="bold", tail=" rest")
        para = El("p", {"STYLE": "font-size:20px"}, text="lead ",
                  children=[bold, script, comment])
        root = El("html", children=[El("body", children=[para])])
        sys.modules["lxml.etree"].fromstring = lambda h, p: root
        try:
            tree = parse_html("<ignored/>", parser="lxml")
        finally:
            del sys.modules["lxml"], sys.modules["lxml.etree"]
        body = tree.children[0].children[0]
        p = body.children[0]
        assert p.tag == "p" and p.style.get("font-size") == "20px"
        texts = [(c.tag, c.text) for c in p.children]
        # lead text, <b>bold</b>, b's tail, script SKIPPED but its tail
        # kept, comment dropped but its tail kept
        assert texts == [("#text", "lead "), ("b", ""),
                         ("#text", " rest"), ("#text", " tail kept"),
                         ("#text", " after comment")]
        assert p.children[1].children[0].text == "bold"
        assert p.iter_text() == "lead bold rest tail kept after comment"

    def test_empty_root(self):
        import sys

        self._fake_lxml(None)
        try:
            tree = parse_html("", parser="lxml")
        finally:
            del sys.modules["lxml"], sys.modules["lxml.etree"]
        assert tree.tag == "#root" and tree.children == []


@pytest.mark.skipif(not HAS_LXML, reason="lxml not installed")
class TestCrossParserEquality:
    """Byte-identical extracted text on both parsers — the guard that makes
    enabling ExtractorConfig(parser='lxml') safe."""

    def test_fixture_corpus_byte_equal(self):
        std = ExtractorConfig()
        fast = ExtractorConfig(parser="lxml")
        for url in url_universe(40):
            for rev in (0, 1):
                html = render_html(url, rev)
                assert extract_text(html, std) == extract_text(html, fast), url

    def test_edge_snippets_byte_equal(self):
        std = ExtractorConfig()
        fast = ExtractorConfig(parser="lxml")
        for html in EDGE_SNIPPETS:
            assert extract_text(html, std) == extract_text(html, fast)
