"""Image-asset extraction from HTML payloads.

Analog of the reference's image sink (``core/utils/ImagesUtils.java:66-139``
external-file / embedded-base64 modes + ``core/utils/Base64ImageUtils.java``):
``data:`` URIs are decoded into real binary payloads; external ``src`` URLs
are surfaced as references (this engine never fetches — no network). Hidden
nodes are skipped like every other extractor filter."""

from __future__ import annotations

import base64
import binascii
from typing import Dict, List, Optional

from ..config import ExtractorConfig
from .dom import Node, parse_html
from .structure import is_hidden


def extract_image_assets(html: bytes | str,
                         cfg: Optional[ExtractorConfig] = None) -> List[Dict]:
    """All ``<img>`` assets of a document, in DOM order.

    Returns dicts: ``asset_idx`` (per-document ordinal), ``mime``, ``data``
    (bytes for data: URIs, None for external refs), ``src_ref`` (the URL for
    external images, None for embedded), ``alt``."""
    cfg = cfg or ExtractorConfig()
    if isinstance(html, bytes):
        # --password analog: same unseal gate as extract() — the asset path
        # must not hand a sealed blob to the DOM parser
        from ..sources.sealed import is_sealed, unseal

        if is_sealed(html):
            html = unseal(html, cfg.password)
    root = parse_html(html)
    out: List[Dict] = []

    def visit(node: Node) -> None:
        if node.is_text():
            return
        if is_hidden(node, cfg):
            return
        if node.tag == "img":
            src = node.attr("src")
            alt = node.attr("alt")
            if src.startswith("data:"):
                head, _, payload = src.partition(",")
                mime = head[5:].split(";")[0] or "application/octet-stream"
                try:
                    data = base64.b64decode(payload, validate=True)
                except (binascii.Error, ValueError):
                    data = None  # malformed embed → quarantined as empty
                out.append({"asset_idx": len(out), "mime": mime,
                            "data": data, "src_ref": None, "alt": alt})
            elif src:
                out.append({"asset_idx": len(out), "mime": "",
                            "data": None, "src_ref": src, "alt": alt})
            return
        for c in node.children:
            visit(c)

    visit(root)
    return out
