"""Pluggable hybrid-backend client (SURVEY.md §3.2 transport layer).

The reference's hybrid path talks to a model server through a real
health-checked HTTP client with chunked requests, timeouts and connection
reuse (``core/hybrid/HybridClient.java`` ~435 LoC,
``core/hybrid/DoclingFastServerClient.java:315``,
``core/processors/HybridDocumentProcessor.java:197,629``). This module is
that transport, dependency-free (http.client from the stdlib):

- :class:`BackendClient` — the interface the hybrid stage consumes:
  ``health()`` + ``extract_pages(urls, htmls, enrich)``.
- :class:`HttpBackendClient` — persistent-connection HTTP/JSON client with
  ≤``chunk_size`` pages per request (the reference chunks at 50), a request
  timeout, and one transparent reconnect per chunk (the pooling analog:
  one kept-alive connection per actor, rebuilt on failure).
- :class:`StubBackendClient` — the deterministic in-process stand-in (this
  environment has no model runtime); it implements the SAME interface, so
  ``stages/hybrid.py`` is transport-agnostic and tests drive both
  implementations (``tests/test_hybrid.py`` runs the HTTP path against a
  local ``http.server`` fixture).

Wire format (JSON, html base64-encoded so binary payloads survive):
  POST {base}/extract   {"enrich": bool, "pages": [{"url": u, "html": b64}]}
  -> {"results": [{"text": ..., "ai_score": ...,
                   "formulas": [...], "pictures": [...], "footnotes": [...]}]}
  GET {base}/health -> 200 with {"status": "ok"}
"""

from __future__ import annotations

import base64
import hashlib
import json
import re
from http.client import HTTPConnection
from typing import List, Optional, Protocol
from urllib.parse import urlparse

from ..config import ExtractorConfig
from ..extractor import ContentSanitizer, extract


def _stable_h(s: str) -> int:
    return int.from_bytes(hashlib.sha256(s.encode()).digest()[:8], "big")


# enrichment-entity extraction patterns (model stand-in reads the raw page)
_FORMULA_RE = re.compile(r"\$\$(.+?)\$\$", re.S)
_IMG_ALT_RE = re.compile(r'<img[^>]*\balt="([^"]*)"')
_FOOTNOTE_RE = re.compile(r'<p class="footnote">(.*?)</p>', re.S)

_EMPTY_ENTS = {"formulas": [], "pictures": [], "footnotes": []}


class BackendClient(Protocol):
    """What the hybrid stage needs from a backend transport."""

    def health(self) -> bool:  # pragma: no cover - protocol
        ...

    def extract_pages(self, urls: List[str],
                      htmls: List[Optional[bytes]],
                      enrich: bool = False) -> List[dict]:
        ...


class BackendUnavailable(RuntimeError):
    """Raised when the backend cannot be reached within the timeout."""


class StubBackendClient:
    """Deterministic model-server stand-in (``DoclingFastServerClient``
    analog without the network). Per-instance state (sanitizer, config) is
    built once — the singleton-model-load shape the reference measured 3.3×
    faster than per-request construction.

    Deterministic degradation: records whose url-hash % ``degrade_every``
    == 0 get word-scrambled text (the OCR-noise case) so trustStream's
    dissimilar→backend branch is exercised."""

    def __init__(self, cfg: Optional[ExtractorConfig] = None,
                 degrade_every: int = 7):
        self.cfg = cfg or ExtractorConfig()
        self.sanitizer = ContentSanitizer(self.cfg.sanitization_rules)
        self.degrade_every = degrade_every

    def health(self) -> bool:
        return True

    def extract_pages(self, urls: List[str],
                      htmls: List[Optional[bytes]],
                      enrich: bool = False) -> List[dict]:
        out: List[dict] = []
        for url, payload in zip(urls, htmls):
            if payload is None:
                out.append({"text": None, "ai_score": 0.0, **_EMPTY_ENTS})
                continue
            r = extract(payload, self.cfg, sanitizer=self.sanitizer)
            text = r.text
            h = _stable_h(url)
            if self.degrade_every and h % self.degrade_every == 0:
                text = " ".join(reversed(text.split()))  # OCR-ish scramble
            rec = {"text": text,
                   "ai_score": round(0.85 + (h % 10) / 100.0, 2)}
            if enrich:
                page = payload.decode("utf-8", errors="replace")
                rec.update({
                    # SemanticFormula.getLatex() analog — LaTeX spans the
                    # "model" reads off the page
                    "formulas": _FORMULA_RE.findall(page),
                    # SemanticPicture index + description (alt-text-derived
                    # stand-in for the vision model's caption)
                    "pictures": [f"figure[{i}]: {alt}" for i, alt in
                                 enumerate(_IMG_ALT_RE.findall(page))],
                    # SemanticFootnote (FENote) paragraphs
                    "footnotes": _FOOTNOTE_RE.findall(page),
                })
            else:
                rec.update(_EMPTY_ENTS)
            out.append(rec)
        return out


class HttpBackendClient:
    """HTTP/JSON transport with the reference client's semantics
    (``HybridClient.java``): ≤``chunk_size`` pages per request, a hard
    per-request ``timeout``, a persistent connection reused across chunks
    (rebuilt once per chunk on failure — the stdlib analog of a pool of
    size 1 per actor), and a ``/health`` probe that never raises."""

    def __init__(self, base_url: str, timeout: float = 30.0,
                 chunk_size: int = 50):
        p = urlparse(base_url)
        if p.scheme != "http" or not p.netloc:
            raise ValueError(f"HttpBackendClient needs an http:// URL, got "
                             f"{base_url!r}")
        self.host = p.hostname
        self.port = p.port or 80
        self.path_prefix = p.path.rstrip("/")
        self.timeout = timeout
        self.chunk_size = max(1, chunk_size)
        self._conn: Optional[HTTPConnection] = None

    # -- connection management -------------------------------------------
    def _connection(self) -> HTTPConnection:
        if self._conn is None:
            self._conn = HTTPConnection(self.host, self.port,
                                        timeout=self.timeout)
        return self._conn

    def _reset(self) -> None:
        if self._conn is not None:
            try:
                self._conn.close()
            except OSError:
                pass
            self._conn = None

    def _request(self, method: str, path: str,
                 body: Optional[bytes] = None) -> "tuple[int, bytes]":
        headers = {"Content-Type": "application/json"} if body else {}
        for attempt in (0, 1):  # one transparent reconnect
            try:
                conn = self._connection()
                conn.request(method, self.path_prefix + path, body=body,
                             headers=headers)
                resp = conn.getresponse()
                return resp.status, resp.read()
            except OSError as e:
                self._reset()
                if attempt == 1:
                    raise BackendUnavailable(
                        f"backend {self.host}:{self.port} unreachable: {e}"
                    ) from e
        raise AssertionError("unreachable")

    # -- BackendClient interface ------------------------------------------
    def health(self) -> bool:
        """GET /health; False on any transport error or non-200 — the
        phase-0 probe must never raise (fallback decides what happens)."""
        try:
            status, _ = self._request("GET", "/health")
        except BackendUnavailable:
            return False
        return status == 200

    def extract_pages(self, urls: List[str],
                      htmls: List[Optional[bytes]],
                      enrich: bool = False) -> List[dict]:
        out: List[dict] = []
        for lo in range(0, len(urls), self.chunk_size):
            pages = []
            for u, h in zip(urls[lo:lo + self.chunk_size],
                            htmls[lo:lo + self.chunk_size]):
                pages.append({
                    "url": u,
                    "html": None if h is None
                    else base64.b64encode(h).decode("ascii"),
                })
            body = json.dumps({"enrich": enrich,
                               "pages": pages}).encode("utf-8")
            status, payload = self._request("POST", "/extract", body)
            if status != 200:
                raise BackendUnavailable(
                    f"backend returned HTTP {status} for /extract")
            results = json.loads(payload)["results"]
            if len(results) != len(pages):
                raise BackendUnavailable(
                    f"backend returned {len(results)} results for "
                    f"{len(pages)} pages")
            for rec in results:
                out.append({"text": rec.get("text"),
                            "ai_score": float(rec.get("ai_score", 0.0)),
                            "formulas": rec.get("formulas", []),
                            "pictures": rec.get("pictures", []),
                            "footnotes": rec.get("footnotes", [])})
        return out


def make_client(spec, cfg: Optional[ExtractorConfig] = None,
                degrade_every: int = 7):
    """Resolve a client spec: None/'stub' → StubBackendClient; an
    'http://...' string → HttpBackendClient; 'docling:http://...' →
    the schema-transforming client over the docling-serve wire shape
    (stages/transformers.py); an object implementing the interface passes
    through (tests inject fakes this way)."""
    if spec is None or spec == "stub":
        return StubBackendClient(cfg, degrade_every=degrade_every)
    if isinstance(spec, str) and spec.startswith("docling:"):
        from .transformers import DoclingHttpTransport, TransformingBackendClient

        return TransformingBackendClient(
            DoclingHttpTransport(spec[len("docling:"):]), cfg=cfg)
    if isinstance(spec, str) and spec.startswith("hancom-ai"):
        # option family parity (reference --hybrid-hancom-ai-regionlist-
        # strategy): "hancom-ai:<url>" (table-first default) or
        # "hancom-ai[list-only]:<url>"
        from .hancom import HancomAITransformer
        from .transformers import TransformingBackendClient

        rest = spec[len("hancom-ai"):]
        strategy = "table-first"
        if rest.startswith("[") and "]" in rest:
            strategy, rest = rest[1:].split("]", 1)
        if not rest.startswith(":"):
            raise ValueError(f"bad hancom-ai spec {spec!r} (expected "
                             f"hancom-ai[:strategy]:<url>)")
        return TransformingBackendClient(
            HancomAIHttpTransport(rest[1:]),
            transformer=HancomAITransformer(regionlist_strategy=strategy),
            cfg=cfg)
    if isinstance(spec, str) and spec.startswith("hancom:"):
        from .hancom import HancomTransformer
        from .transformers import TransformingBackendClient

        return TransformingBackendClient(
            HancomHttpTransport(spec[len("hancom:"):]),
            transformer=HancomTransformer(), cfg=cfg)
    if isinstance(spec, str):
        return HttpBackendClient(spec)
    return spec


class HancomHttpTransport:
    """Hancom Document-AI wire shape (``HancomClient.java:57-59``):
    upload → visualinfo → delete, collapsed over the engine's persistent
    connection. Authenticated in production; this sandbox has no server,
    so tests go through canned-response fakes (module contract is the
    transformer, not the transport)."""

    def __init__(self, base_url: str, timeout: float = 30.0):
        self._http = HttpBackendClient(base_url, timeout=timeout)

    def health(self) -> bool:
        return self._http.health()

    def convert(self, url: str, html: bytes):
        import json as _json

        status, payload = self._http._request(
            "POST", "/v1/dl/files/upload", html)
        if status != 200:
            raise BackendUnavailable(f"hancom upload HTTP {status}")
        file_id = _json.loads(payload).get("fileId")
        status, payload = self._http._request(
            "GET", f"/v1/dl/files/{file_id}/visualinfo", b"")
        if status != 200:
            raise BackendUnavailable(f"hancom visualinfo HTTP {status}")
        doc = _json.loads(payload)
        self._http._request("DELETE", f"/v1/dl/files/{file_id}", b"")
        return doc


class HancomAIHttpTransport:
    """Hancom-AI OCR-SDK wire shape (``HancomAIClient.java:67``):
    ``POST /hocr/sdk`` with the document, merged module JSON back."""

    def __init__(self, base_url: str, timeout: float = 30.0):
        self._http = HttpBackendClient(base_url, timeout=timeout)

    def health(self) -> bool:
        return self._http.health()

    def convert(self, url: str, html: bytes):
        import json as _json

        status, payload = self._http._request("POST", "/hocr/sdk", html)
        if status != 200:
            raise BackendUnavailable(f"hancom-ai sdk HTTP {status}")
        return _json.loads(payload)
