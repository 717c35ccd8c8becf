"""Hybrid two-path pipeline tests — route priorities mirror
``coretest/hybrid/TriageProcessorTest.java``; fallback mirrors
``HybridDocumentProcessor.java:256-268``; the merge gate mirrors
``TextSimilarityTest`` trustStream semantics."""

import pyarrow as pa
import pytest

import ray.data

from opendataloader_pdf_ray.stages.hybrid import BackendStub, hybrid_extract
from opendataloader_pdf_ray.stages.triage import (
    ROUTE_BACKEND,
    ROUTE_LOCAL,
    TriageRouter,
)


class TestTriagePriorities:
    def setup_method(self):
        self.router = TriageRouter()

    def test_replacement_ratio_wins(self):
        # high replacement ratio outranks table signal (priority 1.0)
        payload = ("<table><tr><td>x</td></tr></table>" + "�" * 20).encode()
        assert self.router.route_one(payload) == (ROUTE_BACKEND, 1.0)

    def test_table_signal(self):
        assert self.router.route_one(b"<p>a</p><table><tr></tr></table>") == \
            (ROUTE_BACKEND, 0.9)

    def test_text_table_pattern(self):
        assert self.router.route_one(b"<p>1  alpha  2\n3  beta  4</p>") == \
            (ROUTE_BACKEND, 0.9)

    def test_image_signal(self):
        assert self.router.route_one(b'<p>x</p><img alt="f"/>') == \
            (ROUTE_BACKEND, 0.85)

    def test_plain_text_local(self):
        assert self.router.route_one(b"<p>plain paragraph text</p>") == \
            (ROUTE_LOCAL, 0.9)

    def test_null_payload_local(self):
        assert self.router.route_one(None) == (ROUTE_LOCAL, 1.0)


def _pages(rows):
    return ray.data.from_arrow(pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "html": pa.array([r[1] for r in rows], pa.binary()),
    }))


@pytest.mark.usefixtures("ray_session")
class TestHybridExtract:
    def test_two_path_merge(self):
        rows = [
            (f"https://h.example/{i}",
             (f"<p>plain body {i} words here</p>" if i % 2 else
              f"<table><tr><td>k{i}</td><td>v{i}</td></tr></table>").encode())
            for i in range(12)
        ]
        out = {r["url"]: r for r in
               hybrid_extract(_pages(rows), degrade_every=0).take_all()}
        assert len(out) == 12
        # local-routed rows pass through as local with sim 1.0
        for i in range(1, 12, 2):
            r = out[f"https://h.example/{i}"]
            assert r["source"] == "local" and r["sim"] == 1.0
        # backend-routed rows with an undegraded backend agree with the local
        # stream → trustStream picks local
        for i in range(0, 12, 2):
            r = out[f"https://h.example/{i}"]
            assert r["source"] == "local" and r["sim"] >= 0.5
            assert f"k{i} | v{i}" == r["text"]

    def test_degraded_backend_wins_when_dissimilar(self):
        # degrade_every=1: every backend-routed doc is scrambled → dissimilar
        # (long tables give similarity < 0.5) → backend text wins
        rows = [("https://h.example/t",
                 ("<table>" + "".join(
                     f"<tr><td>alpha{i}</td><td>beta{i} gamma{i}</td></tr>"
                     for i in range(12)) + "</table>").encode())]
        out = hybrid_extract(_pages(rows), degrade_every=1).take_all()
        assert len(out) == 1
        assert out[0]["source"] == "backend"
        assert out[0]["sim"] < 0.5

    def test_fallback_when_backend_down(self):
        rows = [("https://h.example/a", b"<table><tr><td>x</td></tr></table>"),
                ("https://h.example/b", b"<p>plain</p>")]
        out = hybrid_extract(_pages(rows), backend_healthy=False,
                             fallback=True).take_all()
        assert len(out) == 2
        assert all(r["source"] == "local" and r["sim"] == 1.0 for r in out)

    def test_fail_fast_without_fallback(self):
        with pytest.raises(RuntimeError, match="fallback disabled"):
            hybrid_extract(_pages([("u", b"<p>x</p>")]),
                           backend_healthy=False, fallback=False)

    def test_backend_stub_deterministic(self):
        stub = BackendStub(degrade_every=7)
        batch = pa.table({"url": pa.array(["https://h.example/a"]),
                          "html": pa.array([b"<p>one two three</p>"], pa.binary())})
        a = stub(batch).to_pylist()
        b = stub(batch).to_pylist()
        assert a == b
        assert a[0]["source_label"] == "backend"
        assert 0.84 < a[0]["ai_score"] < 0.95


@pytest.mark.usefixtures("ray_session")
class TestHybridQueries:
    def test_routed_extract_rows(self):
        from opendataloader_pdf_ray.pipelines.hybrid_queries import (
            hybrid_routed_extract,
        )

        out = hybrid_routed_extract("/root/testdata/sf0.001").take_all()
        assert len(out) == 500
        assert {"url", "text", "source", "sim"} <= set(out[0].keys())
        assert {r["source"] for r in out} == {"local", "backend"}

    def test_triage_tally_matches_arithmetic(self):
        from opendataloader_pdf_ray.pipelines.hybrid_queries import (
            hybrid_triage_tally,
        )

        got = {r["route"]: r["n"] for r in
               hybrid_triage_tally("/root/testdata/sf0.001").take_all()}
        expect_backend = sum(1 for d in range(500)
                             if d % 3 == 0 or d % 5 == 0 or d % 11 == 0)
        assert got[ROUTE_BACKEND] == expect_backend
        assert got[ROUTE_LOCAL] == 500 - expect_backend

@pytest.mark.usefixtures("ray_session")
class TestEnrichedEntities:
    def test_entities_match_planted_markup(self):
        from opendataloader_pdf_ray.pipelines.hybrid_queries import (
            hybrid_enriched_entities,
        )

        rows = {r["url"]: r for r in
                hybrid_enriched_entities("/root/testdata/sf0.001").take_all()}
        expect = {f"https://docs.example/{d:06d}" for d in range(500)
                  if d % 3 == 0 or d % 5 == 0 or d % 11 == 0}
        assert set(rows) == expect
        for d in range(500):
            url = f"https://docs.example/{d:06d}"
            if d % 3 == 0:  # entity page: one formula + one footnote
                r = rows[url]
                assert r["n_formulas"] == 1
                assert r["formula_latex"] == (
                    "\\frac{%d}{%d}" % (d, d % 7 + 1))
                assert r["n_footnotes"] == 1
                assert r["footnote_text"] == f"[1] note {d}"
                assert r["n_pictures"] == 0
            elif d % 5 == 0:  # img page: one described picture
                r = rows[url]
                assert r["n_pictures"] == 1
                assert r["picture_desc"] == "figure[0]: figure"
                assert r["n_formulas"] == 0
            elif d % 11 == 0:  # scan page routes backend, carries no entities
                r = rows[url]
                assert (r["n_formulas"], r["n_pictures"], r["n_footnotes"]) \
                    == (0, 0, 0)


@pytest.mark.usefixtures("ray_session")
class TestStructTreePrecedence:
    """StructTreeHybridPrecedenceTest analog: trusted semantic markup
    suppresses the hybrid backend (with a warning); without trust the
    two-path split proceeds normally."""

    def test_trust_suppresses_backend_and_warns(self, capfd):
        from opendataloader_pdf_ray.config import ExtractorConfig

        pages = _pages([("https://h.example/t1", b"<table><tr><td>1</td></tr></table>"),
                        ("https://h.example/t2", b"<p>plain</p>")])
        out = hybrid_extract(pages,
                             cfg=ExtractorConfig(trust_semantic_tags=True),
                             backend_healthy=True).take_all()
        assert {r["source"] for r in out} == {"local"}
        assert "suppresses the backend" in capfd.readouterr().err

    def test_no_warning_without_trust(self, capfd):
        pages = _pages([("https://h.example/t3", b"<p>plain only</p>")])
        hybrid_extract(pages, backend_healthy=True).take_all()
        assert "suppresses the backend" not in capfd.readouterr().err


# --------------------------------------------------------------- HTTP client


@pytest.fixture(scope="module")
def backend_server():
    """Local http.server stand-in for the model backend: /health + /extract
    implementing the wire format of ``backend_client.HttpBackendClient``,
    with the deterministic StubBackendClient doing the server-side work (so
    the HTTP path's results are comparable bit-for-bit with the in-process
    path). Records per-request page counts for the chunking assertion."""
    import base64
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from opendataloader_pdf_ray.stages.backend_client import StubBackendClient

    stub = StubBackendClient(degrade_every=0)
    page_counts = []

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # silence
            pass

        def do_GET(self):
            if self.path == "/health":
                body = b'{"status": "ok"}'
                self.send_response(200)
            else:
                body = b'{}'
                self.send_response(404)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            req = json.loads(self.rfile.read(
                int(self.headers["Content-Length"])))
            pages = req["pages"]
            page_counts.append(len(pages))
            urls = [p["url"] for p in pages]
            htmls = [None if p["html"] is None
                     else base64.b64decode(p["html"]) for p in pages]
            recs = stub.extract_pages(urls, htmls, enrich=req["enrich"])
            body = json.dumps({"results": recs}).encode()
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
               "page_counts": page_counts}
    finally:
        srv.shutdown()
        thread.join(timeout=5)


@pytest.mark.usefixtures("ray_session")
class TestHttpBackendClient:
    def test_http_path_matches_stub(self, backend_server):
        """The full routed pipeline over the HTTP transport returns exactly
        what the in-process stand-in returns (the server runs the same
        deterministic extractor)."""
        rows = [
            (f"https://h.example/{i}",
             (f"<p>plain body {i} words here</p>" if i % 2 else
              f"<table><tr><td>k{i}</td><td>v{i}</td></tr></table>").encode())
            for i in range(8)
        ]
        via_stub = {r["url"]: r for r in
                    hybrid_extract(_pages(rows), degrade_every=0).take_all()}
        via_http = {r["url"]: r for r in
                    hybrid_extract(_pages(rows), degrade_every=0,
                                   client_spec=backend_server["url"]
                                   ).take_all()}
        assert via_http == via_stub

    def test_chunking_and_equality(self, backend_server):
        from opendataloader_pdf_ray.stages.backend_client import (
            HttpBackendClient, StubBackendClient)

        cl = HttpBackendClient(backend_server["url"], chunk_size=3)
        urls = [f"https://c.example/{i}" for i in range(10)]
        htmls = [f"<p>body {i} $$x_{i}$$</p>".encode() for i in range(10)]
        backend_server["page_counts"].clear()
        got = cl.extract_pages(urls, htmls, enrich=True)
        assert backend_server["page_counts"] == [3, 3, 3, 1]
        want = StubBackendClient(degrade_every=0).extract_pages(
            urls, htmls, enrich=True)
        assert got == want

    def test_health_probe(self, backend_server):
        from opendataloader_pdf_ray.stages.backend_client import (
            HttpBackendClient)

        assert HttpBackendClient(backend_server["url"]).health() is True
        # connection refused → False, never raises (phase-0 contract)
        assert HttpBackendClient("http://127.0.0.1:1",
                                 timeout=1.0).health() is False

    def test_unreachable_backend_falls_back_local(self):
        rows = [("https://h.example/a",
                 b"<table><tr><td>x</td></tr></table>")]
        out = hybrid_extract(_pages(rows), fallback=True,
                             client_spec="http://127.0.0.1:1").take_all()
        assert all(r["source"] == "local" and r["sim"] == 1.0 for r in out)

    def test_rejects_non_http_url(self):
        from opendataloader_pdf_ray.stages.backend_client import (
            HttpBackendClient)

        with pytest.raises(ValueError, match="http://"):
            HttpBackendClient("ftp://example.com")
