"""Backend schema transformers (stages/transformers.py): DoclingDocument
JSON → Block pages, wired as a third BackendClient via the docling-serve
wire shape — the round-trip the r3 verdict asked for (reference:
core/hybrid/DoclingSchemaTransformer.java, HybridSchemaTransformer.java)."""

import base64
import json
import threading

import pytest

from opendataloader_pdf_ray.extractor.blocks import (
    CAPTION,
    HEADING,
    IMAGE,
    LIST_ITEM,
    PARAGRAPH,
    TABLE,
)
from opendataloader_pdf_ray.stages.transformers import (
    DoclingHttpTransport,
    DoclingTransformer,
    TransformingBackendClient,
)


def canned_docling_doc() -> dict:
    """A DoclingDocument-shaped response exercising every mapped element:
    both coordinate origins, furniture filtering, heading levels, a table
    with a spanning cell AND a pathological over-running span, a picture
    with a description annotation."""
    return {
        "schema_name": "DoclingDocument",
        "pages": {"1": {"size": {"width": 612.0, "height": 792.0}},
                  "2": {"size": {"width": 612.0, "height": 792.0}}},
        "texts": [
            {"label": "page_header", "text": "RUNNING HEAD",
             "prov": [{"page_no": 1,
                       "bbox": {"l": 10, "t": 780, "r": 200, "b": 770,
                                "coord_origin": "BOTTOMLEFT"}}]},
            {"label": "section_header", "text": "Introduction", "level": 2,
             "prov": [{"page_no": 1,
                       "bbox": {"l": 20, "t": 700, "r": 300, "b": 680,
                                "coord_origin": "BOTTOMLEFT"}}]},
            {"label": "text", "text": "First paragraph.",
             "prov": [{"page_no": 1,
                       "bbox": {"l": 20, "t": 660, "r": 400, "b": 640,
                                "coord_origin": "BOTTOMLEFT"}}]},
            # TOPLEFT origin — used as-is
            {"label": "caption", "text": "Figure 1 caption",
             "prov": [{"page_no": 1,
                       "bbox": {"l": 20, "t": 500, "r": 300, "b": 520,
                                "coord_origin": "TOPLEFT"}}]},
            {"label": "list_item", "text": "bullet one",
             "prov": [{"page_no": 2,
                       "bbox": {"l": 30, "t": 700, "r": 300, "b": 680,
                                "coord_origin": "BOTTOMLEFT"}}]},
            {"label": "formula", "text": "E = mc^2",
             "prov": [{"page_no": 2,
                       "bbox": {"l": 30, "t": 600, "r": 200, "b": 580,
                                "coord_origin": "BOTTOMLEFT"}}]},
            {"label": "footnote", "text": "a footnote",
             "prov": [{"page_no": 2,
                       "bbox": {"l": 30, "t": 100, "r": 200, "b": 80,
                                "coord_origin": "BOTTOMLEFT"}}]},
            {"label": "page_footer", "text": "page 2 of 2",
             "prov": [{"page_no": 2,
                       "bbox": {"l": 10, "t": 20, "r": 200, "b": 10,
                                "coord_origin": "BOTTOMLEFT"}}]},
        ],
        "tables": [
            {"prov": [{"page_no": 1,
                       "bbox": {"l": 20, "t": 620, "r": 400, "b": 540,
                                "coord_origin": "BOTTOMLEFT"}}],
             "data": {
                 "grid": [[{}, {}, {}], [{}, {}, {}]],
                 "table_cells": [
                     {"start_row_offset_idx": 0, "start_col_offset_idx": 0,
                      "row_span": 1, "col_span": 2, "text": "Wide header"},
                     {"start_row_offset_idx": 0, "start_col_offset_idx": 2,
                      "text": "H3"},
                     {"start_row_offset_idx": 1, "start_col_offset_idx": 0,
                      "text": "a"},
                     {"start_row_offset_idx": 1, "start_col_offset_idx": 1,
                      "text": "b"},
                     # pathological: span runs past the declared grid
                     {"start_row_offset_idx": 1, "start_col_offset_idx": 2,
                      "row_span": 5, "col_span": 9, "text": "clamped"},
                 ]}},
        ],
        "pictures": [
            {"prov": [{"page_no": 1,
                       "bbox": {"l": 50, "t": 480, "r": 250, "b": 380,
                                "coord_origin": "BOTTOMLEFT"}}],
             "annotations": [{"kind": "description",
                              "text": "a bar chart"}]},
        ],
    }


class TestDoclingTransformer:
    def test_element_mapping_and_furniture_filter(self):
        pages = DoclingTransformer().transform(canned_docling_doc())
        assert len(pages) == 2
        types1 = [b.type for b in pages[0]]
        # furniture (page_header) filtered; reading order by top coord:
        # heading(92) < paragraph(132) < table(172) < picture(312) < caption(500)
        assert types1 == [HEADING, PARAGRAPH, TABLE, IMAGE, CAPTION]
        heading = pages[0][0]
        assert heading.text == "Introduction" and heading.level == 2
        # BOTTOMLEFT → top-left flip through page height 792
        assert heading.bbox == [20, 92, 300, 112]
        caption = pages[0][4]
        assert caption.bbox == [20, 500, 300, 520]  # TOPLEFT passthrough
        types2 = {b.type for b in pages[1]}
        assert LIST_ITEM in types2 and "RUNNING HEAD" not in [
            b.text for p in pages for b in p]
        labels2 = {b.label for b in pages[1]}
        assert {"formula", "footnote"} <= labels2

    def test_table_grid_spans_clamped(self):
        pages = DoclingTransformer().transform(canned_docling_doc())
        table = next(b for b in pages[0] if b.type == TABLE)
        assert len(table.kids) == 2  # rows
        r0 = table.kids[0].kids
        # spanning header occupies cols 0-1 → only two cells in row 0
        assert [(c.col, c.col_span) for c in r0] == [(0, 2), (2, 1)]
        assert all(c.is_header for c in r0)
        r1 = table.kids[1].kids
        clamped = next(c for c in r1 if c.text == "clamped")
        assert clamped.row_span == 1 and clamped.col_span == 1  # clamped
        # no duplicate placeholder under the row-0 span
        assert [(c.row, c.col) for c in r1] == [(1, 0), (1, 1), (1, 2)]

    def test_picture_index_accumulates_across_chunks(self):
        tr = DoclingTransformer()
        doc = canned_docling_doc()
        p1 = tr.transform(doc)
        p2 = tr.transform(doc)  # second chunk of the same document
        lab1 = [b.label for page in p1 for b in page if b.type == IMAGE]
        lab2 = [b.label for page in p2 for b in page if b.type == IMAGE]
        assert lab1 == ["picture[1]"] and lab2 == ["picture[2]"]

    def test_empty_and_missing_inputs(self):
        tr = DoclingTransformer()
        assert tr.transform(None) == []
        assert tr.transform({}) == []
        # element with no provenance is skipped, not crashed
        pages = tr.transform({"texts": [{"label": "text", "text": "x"}]})
        assert pages == []


@pytest.fixture()
def docling_server():
    """Local http.server speaking the docling-serve wire shape:
    /health + /v1alpha/convert/source returning the canned document."""
    from http.server import BaseHTTPRequestHandler, HTTPServer

    requests = []

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            body = b'{"status": "ok"}' if self.path == "/health" else b"{}"
            self.send_response(200 if self.path == "/health" else 404)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            req = json.loads(self.rfile.read(
                int(self.headers["Content-Length"])))
            requests.append(req)
            body = json.dumps({
                "status": "success",
                "document": {"json_content": canned_docling_doc()},
            }).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        yield {"url": f"http://127.0.0.1:{srv.server_address[1]}",
               "requests": requests}
    finally:
        srv.shutdown()


class TestTransformingClientRoundTrip:
    def test_http_round_trip_against_real_shape_response(self,
                                                         docling_server):
        transport = DoclingHttpTransport(docling_server["url"])
        client = TransformingBackendClient(transport)
        assert client.health()
        recs = client.extract_pages(
            ["https://x.example/a.html"], [b"<html>ignored</html>"])
        assert len(recs) == 1
        rec = recs[0]
        # linearized text follows the transformed reading order
        assert rec["text"].startswith("Introduction")
        assert "First paragraph." in rec["text"]
        assert "RUNNING HEAD" not in rec["text"]  # furniture filtered
        assert rec["formulas"] == ["E = mc^2"]
        assert rec["footnotes"] == ["a footnote"]
        assert rec["pictures"] == ["picture[1]: a bar chart"]
        # the transport spoke the docling-serve shape
        req = docling_server["requests"][0]
        assert req["sources"][0]["kind"] == "file"
        assert base64.b64decode(req["sources"][0]["base64_string"]) \
            == b"<html>ignored</html>"

    def test_none_payload_passthrough(self, docling_server):
        client = TransformingBackendClient(
            DoclingHttpTransport(docling_server["url"]))
        recs = client.extract_pages(["u"], [None])
        assert recs[0]["text"] is None

    def test_make_client_docling_spec(self, docling_server):
        from opendataloader_pdf_ray.stages.backend_client import make_client

        client = make_client(f"docling:{docling_server['url']}")
        assert isinstance(client, TransformingBackendClient)
        assert client.health()
