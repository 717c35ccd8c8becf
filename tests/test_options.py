"""Option-breadth tests (reference options.json parity, round-2):
pages selection, tagged fast path, content-safety toggles, line-break mode,
table method, page separators, markdown strikethrough/html tables, image
output modes."""

import json
import subprocess
import sys
from pathlib import Path

from opendataloader_pdf_ray.config import ExtractorConfig
from opendataloader_pdf_ray.extractor import extract, extract_text

CFG = ExtractorConfig()

THREE_PAGES = (b'<div class="page"><p>one</p></div>'
               b'<div class="page"><p>two</p></div>'
               b'<div class="page"><p>three</p></div>')


class TestPagesSelection:
    def test_single_and_range(self):
        assert extract_text(THREE_PAGES, CFG.with_(pages="1,3")) == "one\n\nthree"
        assert extract_text(THREE_PAGES, CFG.with_(pages="2-3")) == "two\n\nthree"

    def test_out_of_range_ignored(self):
        assert extract_text(THREE_PAGES, CFG.with_(pages="2,9")) == "two"

    def test_default_all(self):
        assert extract_text(THREE_PAGES) == "one\n\ntwo\n\nthree"


class TestTaggedFastPath:
    HTML = (b'<div class="page"><p>ACME Report</p>'
            b'<p style="font-size:30px">Big Promo</p><p>body</p></div>'
            b'<div class="page"><p>ACME Report</p><p>more body</p></div>')

    def test_heuristics_skipped(self):
        """trust_semantic_tags: no boilerplate vote (repeated line stays), no
        style-heading promotion — author markup is authoritative
        (TaggedDocumentProcessor.java:32-66 analog)."""
        heur = extract(self.HTML)
        tagged = extract(self.HTML, CFG.with_(trust_semantic_tags=True))
        assert "ACME Report" not in heur.text          # voted boilerplate
        assert tagged.text.count("ACME Report") == 2   # trusted as content
        from opendataloader_pdf_ray.extractor.blocks import HEADING
        heur_types = [b.type for p in heur.pages for b in p]
        tagged_types = [b.type for p in tagged.pages for b in p]
        assert HEADING in heur_types        # style promotion happened
        assert HEADING not in tagged_types  # tagged path trusts <p> as-is

    def test_explicit_headings_still_kept(self):
        r = extract(b"<h2>Title</h2><p>body</p>",
                    CFG.with_(trust_semantic_tags=True))
        assert r.text == "Title\nbody"


class TestContentSafetyOff:
    HTML = (b'<p>ok</p><p style="display:none">hidden</p>'
            b'<p style="position:absolute;left:-9000px;top:0;width:10px;height:10px">off</p>'
            b'<p style="font-size:1px">tiny</p>')

    def test_all(self):
        t = extract_text(self.HTML, CFG.with_safety_off("all"))
        assert "hidden" in t and "off" in t and "tiny" in t

    def test_selective(self):
        t = extract_text(self.HTML, CFG.with_safety_off("hidden-text"))
        assert "hidden" in t and "off" not in t and "tiny" not in t


class TestLineBreaks:
    HTML = b"<p>line one\nline two</p>"

    def test_keep_default(self):
        assert extract_text(self.HTML) == "line one\nline two"

    def test_collapse(self):
        assert extract_text(self.HTML, CFG.with_(keep_line_breaks=False)) \
            == "line one line two"


class TestTableMethod:
    HTML = (b"<table><tr><td>a</td><td>b</td></tr></table>"
            b"<pre>1  x\n2  y</pre>")

    def test_off(self):
        t = extract_text(self.HTML, CFG.with_(table_method="off"))
        assert "|" not in t

    def test_cluster_only(self):
        r = extract(self.HTML, CFG.with_(table_method="cluster"))
        from opendataloader_pdf_ray.extractor.blocks import TABLE
        tables = [b for p in r.pages for b in p if b.type == TABLE]
        assert len(tables) == 1  # aligned-columns table only, no <table>


class TestSeparatorsAndMarkdown:
    def test_text_page_separator_template(self):
        t = extract_text(THREE_PAGES,
                         CFG.with_(text_page_separator="-- page %page-number% --"))
        assert t.startswith("-- page 1 --\none")
        assert "-- page 3 --\nthree" in t

    def test_markdown_page_separator(self):
        from opendataloader_pdf_ray.api import convert

        out = convert(THREE_PAGES, CFG.with_(markdown_page_separator="<!-- %page% -->"),
                      output_formats=["markdown"])
        assert out["markdown"].startswith("<!-- 1 -->")

    def test_strikethrough_markdown(self):
        from opendataloader_pdf_ray.api import convert

        out = convert(b"<p><s>gone</s></p>", CFG.with_(detect_strikethrough=True),
                      output_formats=["markdown"])
        assert out["markdown"] == "~~gone~~"

    def test_markdown_with_html_spans(self):
        from opendataloader_pdf_ray.api import convert

        html = (b'<table><tr><td colspan="2">wide</td></tr>'
                b"<tr><td>a</td><td>b</td></tr></table>")
        out = convert(html, CFG.with_(markdown_with_html=True),
                      output_formats=["markdown"])
        assert '<td colspan="2">wide</td>' in out["markdown"]
        plain = convert(html, CFG, output_formats=["markdown"])
        assert "|" in plain["markdown"]

    def test_pipe_table_colspan_grid(self):
        """MarkdownTableTest colspan semantics: spanned content written ONCE
        at its anchor column, covered position empty, separator spans the
        full column count."""
        from opendataloader_pdf_ray.api import convert

        html = (b'<table><tr><td colspan="2">A</td><td>B</td></tr>'
                b"<tr><td>C</td><td>D</td><td>E</td></tr></table>")
        lines = convert(html, CFG, output_formats=["markdown"])[
            "markdown"].splitlines()
        assert lines[0].count("A") == 1 and "B" in lines[0]
        assert lines[0] == "| A |  | B |"
        assert lines[1].count("---") == 3
        assert all(x in lines[2] for x in "CDE")

    def test_pipe_table_rowspan_grid(self):
        """MarkdownTableTest rowspan semantics: continuation rows leave the
        spanned column empty instead of repeating or shifting content."""
        from opendataloader_pdf_ray.api import convert

        html = (b'<table><tr><td rowspan="2">A</td><td>B</td></tr>'
                b"<tr><td>C</td></tr></table>")
        lines = convert(html, CFG, output_formats=["markdown"])[
            "markdown"].splitlines()
        assert lines[0] == "| A | B |"
        assert lines[2].count("A") == 0
        assert lines[2] == "|  | C |"


class TestCLIOptions:
    def test_pages_and_image_output(self, tmp_path):
        import base64

        payload = b"\x89PNGfake" * 8
        b64 = base64.b64encode(payload).decode()
        html = (f'<div class="page"><p>p1</p>'
                f'<img src="data:image/png;base64,{b64}"/></div>'
                f'<div class="page"><p>p2</p></div>')
        src = tmp_path / "doc.html"
        src.write_text(html)
        out_dir = tmp_path / "out"
        res = subprocess.run(
            [sys.executable, "-m", "opendataloader_pdf_ray", "convert",
             str(src), "--format", "text", "--output-dir", str(out_dir),
             "--pages", "1", "--image-output", "external",
             "--image-dir", str(tmp_path / "imgs"), "--quiet"],
            capture_output=True, text=True, cwd="/root/repo")
        assert res.returncode == 0, res.stderr
        assert (out_dir / "doc.txt").read_text() == "p1"
        imgs = list((tmp_path / "imgs" / "doc_images").iterdir())
        assert len(imgs) == 1 and imgs[0].read_bytes() == payload

PNG_1PX = ("iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8"
           "z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg==")


class TestMarkdownWithImages:
    def _html(self):
        return (f'<html><body><div class="page"><p>before</p>'
                f'<img alt="dot" src="data:image/png;base64,{PNG_1PX}"/>'
                f'<img alt="ext" src="https://cdn.example/x.png"/>'
                f"</div></body></html>")

    def test_off_by_default(self):
        from opendataloader_pdf_ray.api import convert

        md = convert(self._html().encode(), output_formats=["markdown"])["markdown"]
        assert "![dot]()" in md and "data:" not in md

    def test_embedded_sources_kept(self):
        from opendataloader_pdf_ray.api import convert
        from opendataloader_pdf_ray.config import ExtractorConfig

        cfg = ExtractorConfig(markdown_with_images=True)
        md = convert(self._html().encode(), cfg,
                     output_formats=["markdown"])["markdown"]
        assert f"![dot](data:image/png;base64,{PNG_1PX})" in md
        assert "![ext](https://cdn.example/x.png)" in md

    def test_cli_external_rewrites_to_asset_files(self, tmp_path, capsys):
        from opendataloader_pdf_ray.__main__ import main

        src = tmp_path / "doc.html"
        src.write_text(self._html())
        out_dir = tmp_path / "out"
        rc = main(["convert", str(src), "--format", "markdown",
                   "--markdown-with-images", "--image-output", "external",
                   "--output-dir", str(out_dir), "--quiet"])
        assert rc == 0
        md = (out_dir / "doc.md").read_text()
        assert "![dot](doc_images/asset-000.png)" in md
        assert "data:" not in md
        assert "![ext](https://cdn.example/x.png)" in md  # external untouched
        assert (out_dir / "doc_images" / "asset-000.png").exists()


class TestHtmlPageSeparator:
    def test_separator_with_page_number(self):
        from opendataloader_pdf_ray.api import convert
        from opendataloader_pdf_ray.config import ExtractorConfig

        html = ('<html><body><div class="page"><p>one</p></div>'
                '<div class="page"><p>two</p></div></body></html>')
        cfg = ExtractorConfig(html_page_separator="=== page %page-number% ===")
        out = convert(html.encode(), cfg, output_formats=["html"])["html"]
        assert "=== page 2 ===" in out
        plain = convert(html.encode(), output_formats=["html"])["html"]
        assert "===" not in plain
