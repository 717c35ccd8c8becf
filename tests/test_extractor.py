"""Extractor operator unit tests — mirrors the reference's per-processor test
strategy (SURVEY.md §5: coretest/processors/*Test.java)."""

from opendataloader_pdf_ray.config import ExtractorConfig
from opendataloader_pdf_ray.extractor import ContentSanitizer, extract, extract_text
from opendataloader_pdf_ray.extractor.blocks import (
    CAPTION, HEADER_FOOTER, HEADING, LIST, PARAGRAPH, TABLE,
)

CFG = ExtractorConfig()


def types(result, page=0):
    return [b.type for b in result.pages[page]]


class TestFilters:
    def test_hidden_display_none(self):
        assert "secret" not in extract_text(b'<p>ok</p><p style="display:none">secret</p>')

    def test_hidden_visibility_and_opacity(self):
        html = b'<p>ok</p><p style="visibility:hidden">a</p><p style="opacity:0">b</p>'
        assert extract_text(html) == "ok"

    def test_hidden_same_color_as_background(self):
        html = b'<div style="background-color:#fff"><p>ok</p><p style="color:#fff">white on white</p></div>'
        assert extract_text(html) == "ok"

    def test_off_page_absolute(self):
        html = b'<p>ok</p><p style="position:absolute;left:-5000px;top:10px;width:50px;height:10px">gone</p>'
        assert extract_text(html) == "ok"

    def test_tiny_text(self):
        html = b'<p>ok</p><p style="font-size:1px">tiny</p>'
        assert extract_text(html) == "ok"

    def test_keep_hidden_when_disabled(self):
        cfg = CFG.with_(filter_hidden_text=False)
        assert "secret" in extract_text(b'<p style="display:none">secret</p>', cfg)


class TestInvalidChars:
    def test_replacement_and_ratio(self):
        r = extract("<p>ab��cd</p>".encode())
        assert "�" not in r.text
        assert r.replacement_ratio > 0

    def test_whitespace_collapse(self):
        assert extract_text(b"<p>a   b\t c</p>") == "a b c"


class TestHeadings:
    def test_tag_levels_dense_ranked(self):
        r = extract(b"<h1>A</h1><h2>B</h2><p>body</p><h2>C</h2>")
        heads = [b for b in r.pages[0] if b.type == HEADING]
        assert [h.level for h in heads] == [1, 2, 2]

    def test_style_statistics_promotion(self):
        # big-font short paragraph among many body paragraphs → heading
        body = b'<p style="font-size:16px">' + b"word " * 30 + b"</p>"
        html = body * 3 + b'<p style="font-size:26px">Big Short Title</p>' + body
        r = extract(html)
        heads = [b for b in r.pages[0] if b.type == HEADING]
        assert len(heads) == 1 and heads[0].text == "Big Short Title"
        assert heads[0].level == 1


class TestLists:
    def test_nested_labels(self):
        html = (b'<ul><li>one</li><li>two'
                b'<ol type="a"><li>x</li><li>y</li></ol></li></ul>')
        text = extract_text(html)
        assert text == "• one\n• two\n  a. x\n  b. y"

    def test_roman_labels(self):
        text = extract_text(b'<ol type="i"><li>a</li><li>b</li><li>c</li></ol>')
        assert text == "i. a\nii. b\niii. c"


class TestTables:
    def test_grid_with_spans(self):
        html = (b"<table><tr><th>H1</th><th>H2</th></tr>"
                b'<tr><td rowspan="2">s</td><td>b</td></tr><tr><td>c</td></tr></table>')
        r = extract(html)
        table = next(b for b in r.pages[0] if b.type == TABLE)
        rows = table.kids
        assert rows[0].kids[0].is_header
        assert rows[1].kids[0].row_span == 2
        # rowspan pushes row-2 cell to column 1
        assert rows[2].kids[0].col == 1
        assert r.text == "H1 | H2\ns | b\nc"

    def test_aligned_columns(self):
        html = b"<pre>Name   Qty\nApple  2\nPear   1</pre>"
        r = extract(html)
        assert types(r) == [TABLE]
        assert r.text == "Name | Qty\nApple | 2\nPear | 1"

    def test_special_korean_table(self):
        text = extract_text("<p>수신: 부서</p><p>제목: 안건</p>".encode())
        assert text == "수신 | 부서\n제목 | 안건"


class TestCaptions:
    def test_figure_caption(self):
        r = extract(b'<figure><img alt="img"/><figcaption>Figure 1 result</figcaption></figure>')
        assert CAPTION in types(r)

    def test_text_caption_adjacent_to_image(self):
        r = extract(b'<img alt="x"/><p>Figure 2 the plot</p><p>normal text</p>')
        assert types(r)[1] == CAPTION
        assert types(r)[2] == PARAGRAPH


class TestHeaderFooter:
    HTML = (b'<div class="page"><p>ACME Report</p><p>one</p><p>Page 1</p></div>'
            b'<div class="page"><p>ACME Report</p><p>two</p><p>Page 2</p></div>')

    def test_removed_by_default(self):
        assert extract_text(self.HTML) == "one\n\ntwo"

    def test_included_when_configured(self):
        text = extract_text(self.HTML, CFG.with_(include_header_footer=True))
        assert text == "ACME Report\none\nPage 1\n\nACME Report\ntwo\nPage 2"

    def test_single_page_untouched(self):
        assert extract_text(b'<div class="page"><p>solo</p></div>') == "solo"

    def test_multi_block_footer_grows(self):
        """Reference-style region growth: consecutive repeated trailing blocks
        are ALL footer (getNumberOfHeaderOrFooterContentsForEachPage loop)."""
        html = (b'<div class="page"><p>body one</p><p>Confidential</p><p>Page 1</p></div>'
                b'<div class="page"><p>body two</p><p>Confidential</p><p>Page 2</p></div>')
        assert extract_text(html) == "body one\n\nbody two"

    def test_roman_page_numbers(self):
        """RomanNumbers label algorithm: 'Page iv' / 'Page v' form a sequence."""
        html = (b'<div class="page"><p>alpha</p><p>Page iv</p></div>'
                b'<div class="page"><p>beta</p><p>Page v</p></div>')
        assert extract_text(html) == "alpha\n\nbeta"

    def test_two_page_alternating_style(self):
        """2-page increment: odd/even pages carry different running headers
        (HeaderFooterProcessor.java increment=2 pass)."""
        html = (b'<div class="page"><p>Chapter One</p><p>a</p></div>'
                b'<div class="page"><p>ACME Corp</p><p>b</p></div>'
                b'<div class="page"><p>Chapter One</p><p>c</p></div>'
                b'<div class="page"><p>ACME Corp</p><p>d</p></div>')
        assert extract_text(html) == "a\n\nb\n\nc\n\nd"

    def test_non_sequence_numbers_not_footer(self):
        """Numbers that do not increment with the page distance are body text
        (the reference's label algorithms verify the arithmetic sequence)."""
        html = (b'<div class="page"><p>one</p><p>total 17 units</p></div>'
                b'<div class="page"><p>two</p><p>total 52 units</p></div>')
        assert extract_text(html) == "one\ntotal 17 units\n\ntwo\ntotal 52 units"

    def test_whole_page_never_absorbed(self):
        """A page that is ONLY a repeated line keeps its content (the region
        may not swallow the entire page)."""
        html = (b'<div class="page"><p>Notice</p></div>'
                b'<div class="page"><p>Notice</p></div>')
        assert extract_text(html) == "Notice\n\nNotice"


class TestReadingOrder:
    def test_two_columns_column_major(self):
        html = (b'<div style="position:absolute;left:420px;top:10px;width:300px;height:100px"><p>R1</p></div>'
                b'<div style="position:absolute;left:20px;top:10px;width:300px;height:100px"><p>L1</p></div>'
                b'<div style="position:absolute;left:20px;top:150px;width:300px;height:100px"><p>L2</p></div>'
                b'<div style="position:absolute;left:420px;top:150px;width:300px;height:100px"><p>R2</p></div>')
        assert extract_text(html) == "L1\nL2\nR1\nR2"

    def test_flow_order_preserved(self):
        assert extract_text(b"<p>a</p><p>b</p><p>c</p>") == "a\nb\nc"

    def test_narrow_outlier_retry(self):
        """XYCutPlusPlusSorter.java:400-444: narrow elements (< 10% region
        width) bridging the column gap are ignored when re-detecting the
        vertical cut, so the columns still split column-major."""
        def div(x0, y0, x1, y1, label):
            return (f'<div style="position:absolute;left:{x0}px;top:{y0}px;'
                    f'width:{x1-x0}px;height:{y1-y0}px"><p>{label}</p></div>')

        html = (div(20, 10, 320, 200, "L1") + div(420, 10, 720, 200, "R1")
                + div(315, 150, 375, 230, "m1") + div(370, 240, 430, 300, "m2")
                + div(20, 220, 320, 500, "L2") + div(420, 220, 720, 500, "R2")
                ).encode()
        assert extract_text(html) == "L1\nm1\nL2\nR1\nR2\nm2"

    def test_cross_layout_banner_masked(self):
        """A full-width banner (≥ 2× median width, overlapping ≥2 elements)
        bridging the row gap is pre-masked so the rows still segment, then
        Y-merged back by position (XYCutPlusPlusSorter phases 1 & 4)."""
        def div(x0, y0, x1, y1, label):
            return (f'<div style="position:absolute;left:{x0}px;top:{y0}px;'
                    f'width:{x1-x0}px;height:{y1-y0}px"><p>{label}</p></div>')

        html = (div(20, 10, 320, 300, "L1") + div(420, 10, 720, 300, "R1")
                + div(20, 250, 720, 380, "banner")
                + div(20, 420, 320, 700, "L2") + div(420, 420, 720, 700, "R2")
                ).encode()
        assert extract_text(html) == "L1\nR1\nbanner\nL2\nR2"


class TestSanitizer:
    def test_default_rules(self):
        s = ContentSanitizer()
        assert s.sanitize("mail bob@x.io now") == "mail email@example.com now"
        assert s.sanitize("card 1234-5678-9012-3456 x") == "card 0000-0000-0000-0000 x"
        assert s.sanitize("ip 10.0.0.1 x") == "ip 0.0.0.0 x"
        assert s.sanitize("see https://a.example/path?q=1") == "see https://example.com"

    def test_extract_with_sanitize(self):
        text = extract_text(b"<p>bob@x.io called +1-555-0000</p>", CFG.with_(sanitize=True))
        assert text == "email@example.com called +00-0000-0000"

    def test_off_by_default(self):
        assert "bob@x.io" in extract_text(b"<p>bob@x.io</p>")


class TestDeterminism:
    def test_byte_identical_repeat(self):
        from opendataloader_pdf_ray.fixtures.gen import render_html

        url = "https://site007.example/page00003"
        h = render_html(url, 2)
        t1 = extract(h).text
        t2 = extract(render_html(url, 2)).text
        assert t1 == t2 and len(t1) > 0

    def test_ids_preorder(self):
        r = extract(b"<h1>t</h1><ul><li>a</li><li>b</li></ul>")
        flat = r.flat_blocks()
        assert [b["id"] for b in flat] == list(range(len(flat)))


class TestSerializers:
    def test_markdown(self):
        r = extract(b"<h1>Title</h1><p>body</p><ul><li>x</li></ul>")
        md = r.markdown(CFG)
        assert md == "# Title\n\nbody\n\n- x"

    def test_json_shape(self):
        r = extract(b"<h1>T</h1><table><tr><td>a</td><td>b</td></tr></table>")
        d = r.json_dict(CFG, "f.html")
        assert d["number of pages"] == 1
        assert d["kids"][0]["type"] == "heading"
        table = d["kids"][1]
        assert table["rows"][0]["cells"][0]["content"] == "a"


class TestCrossPageContinuation:
    """checkNeighborTables / checkNeighborLists analogs."""

    def test_table_merges_across_pages(self):
        html = (b'<div class="page"><table><tr><th>A</th><th>B</th></tr>'
                b'<tr><td>1</td><td>2</td></tr></table></div>'
                b'<div class="page"><table><tr><td>3</td><td>4</td></tr></table></div>')
        r = extract(html)
        tables = [b for page in r.pages for b in page if b.type == TABLE]
        assert len(tables) == 1 and len(tables[0].kids) == 3
        assert tables[0].kids[2].row == 2  # renumbered continuation row
        assert r.text == "A | B\n1 | 2\n3 | 4"

    def test_ordered_list_renumbers(self):
        html = (b'<div class="page"><ol><li>a</li><li>b</li></ol></div>'
                b'<div class="page"><ol><li>c</li></ol></div>')
        assert extract_text(html) == "1. a\n2. b\n3. c"

    def test_mismatched_columns_not_merged(self):
        html = (b'<div class="page"><table><tr><td>1</td><td>2</td></tr></table></div>'
                b'<div class="page"><table><tr><td>x</td><td>y</td><td>z</td></tr></table></div>')
        assert extract_text(html) == "1 | 2\n\nx | y | z"

    def test_flag_disables(self):
        html = (b'<div class="page"><ol><li>a</li></ol></div>'
                b'<div class="page"><ol><li>b</li></ol></div>')
        text = extract_text(html, CFG.with_(merge_across_pages=False))
        assert text == "1. a\n\n1. b"

    def test_table_chains_across_three_pages(self):
        """ADVICE r1: continuation must chain past the emptied middle page
        (reference tracks previousTable across ALL pages)."""
        html = (b'<div class="page"><table><tr><td>1</td><td>2</td></tr></table></div>'
                b'<div class="page"><table><tr><td>3</td><td>4</td></tr></table></div>'
                b'<div class="page"><table><tr><td>5</td><td>6</td></tr></table></div>')
        assert extract_text(html) == "1 | 2\n3 | 4\n5 | 6"

    def test_lowerroman_list_continuation(self):
        """ADVICE r1: <ol type="i"> starts at 'i.' — source style (not label
        re-parsing) must classify it lowerroman so the continuation renumbers
        'iii.' instead of 'c.'."""
        html = (b'<div class="page"><ol type="i"><li>a</li><li>b</li></ol></div>'
                b'<div class="page"><ol type="i"><li>c</li></ol></div>')
        assert extract_text(html) == "i. a\nii. b\niii. c"

    def test_roman_continuation_from_iv(self):
        html = (b'<div class="page"><ol type="i"><li>a</li><li>b</li><li>c</li>'
                b'<li>d</li></ol></div>'
                b'<div class="page"><ol type="i"><li>e</li></ol></div>')
        assert extract_text(html) == "i. a\nii. b\niii. c\niv. d\nv. e"

    def test_list_chains_across_three_pages(self):
        html = (b'<div class="page"><ol><li>a</li></ol></div>'
                b'<div class="page"><ol><li>b</li></ol></div>'
                b'<div class="page"><ol><li>c</li></ol></div>')
        assert extract_text(html) == "1. a\n2. b\n3. c"

    def test_intervening_content_breaks_chain(self):
        html = (b'<div class="page"><table><tr><td>1</td><td>2</td></tr></table>'
                b'<p>between</p></div>'
                b'<div class="page"><table><tr><td>3</td><td>4</td></tr></table></div>')
        assert extract_text(html) == "1 | 2\nbetween\n\n3 | 4"

    def test_width_mismatch_not_merged(self):
        """ADVICE r1: same column count but very different widths (when bboxes
        exist) → two unrelated tables, not one continuation."""
        html = (b'<div class="page"><div style="position:absolute;left:0;top:0;'
                b'width:600px;height:50px"><table><tr><td>1</td><td>2</td></tr>'
                b'</table></div></div>'
                b'<div class="page"><div style="position:absolute;left:0;top:0;'
                b'width:100px;height:50px"><table><tr><td>3</td><td>4</td></tr>'
                b'</table></div></div>')
        assert extract_text(html) == "1 | 2\n\n3 | 4"


class TestTableOfContents:
    """TOC detection (structure.detect_toc) — TableOfContentsProcessor.java
    analog; disabled by default like the reference's own pipeline."""

    TOC_HTML = (b'<div class="page"><h1>Report</h1>'
                b'<p>Introduction . . . . 3</p>'
                b'<p>Methods 7</p>'
                b'<p>Results . . . . . 12</p>'
                b'<p>pi is about 3.14</p>'
                b'<p>Body text follows here.</p></div>')

    def test_disabled_by_default(self):
        from opendataloader_pdf_ray.extractor import extract

        r = extract(self.TOC_HTML)
        assert all(b.type != "toc"
                   for page in r.pages for b in page)

    def test_groups_run_of_three_items(self):
        from opendataloader_pdf_ray.config import ExtractorConfig
        from opendataloader_pdf_ray.extractor import extract

        r = extract(self.TOC_HTML, ExtractorConfig(detect_toc=True))
        tocs = [b for page in r.pages for b in page if b.type == "toc"]
        assert len(tocs) == 1
        items = tocs[0].kids
        assert [i.type for i in items] == ["toc item"] * 3
        assert items[0].text == "Introduction . . . . 3"
        # decimal ending ('3.14') rejected, body paragraph untouched
        texts = [b.text for page in r.pages for b in page]
        assert "pi is about 3.14" in texts
        # linearization prints TOC items as lines
        assert r.text.splitlines()[1:4] == [
            "Introduction . . . . 3", "Methods 7", "Results . . . . . 12"]

    def test_short_run_not_grouped(self):
        from opendataloader_pdf_ray.config import ExtractorConfig
        from opendataloader_pdf_ray.extractor import extract

        html = (b'<div class="page"><p>Introduction 3</p>'
                b'<p>Methods 7</p><p>plain text</p></div>')
        r = extract(html, ExtractorConfig(detect_toc=True))
        assert all(b.type != "toc" for page in r.pages for b in page)

    def test_json_and_markdown_carry_toc(self):
        from opendataloader_pdf_ray.config import ExtractorConfig
        from opendataloader_pdf_ray.extractor import extract

        cfg = ExtractorConfig(detect_toc=True)
        r = extract(self.TOC_HTML, cfg)
        flat = r.flat_blocks()
        assert {"toc", "toc item"} <= {b["type"] for b in flat}
        # toc items point at the toc block as parent
        toc_id = next(b["id"] for b in flat if b["type"] == "toc")
        assert all(b["parent"] == toc_id for b in flat
                   if b["type"] == "toc item")
        assert "Methods 7" in r.markdown(cfg)
