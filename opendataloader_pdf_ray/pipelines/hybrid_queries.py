"""Hybrid two-path pipeline queries (SURVEY.md §3.2 routed extraction).

Input pages are derived deterministically from the driver ``documents`` table;
a hash-chosen subset carries table / image / replacement-char markup so the
triage router genuinely routes both ways (the reference's signal set,
``core/hybrid/TriageProcessor.java:648-689``)."""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ..stages.hybrid import enriched_entities, hybrid_extract, triage_tally
from .common import read_table
from .flagship import html_from_doc


def _doc_pages(sf_dir: str) -> "ray.data.Dataset":
    """documents → (url, html) with deterministic triage-signal markup:
    doc_id % 3 == 0 → embedded <table>; % 5 == 0 → <img>; % 11 == 0 →
    replacement chars; everything else plain paragraphs (local route)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def build(batch: pa.Table) -> pa.Table:
        urls, htmls = [], []
        for did, text, lang in zip(batch["doc_id"].to_pylist(),
                                   batch["text"].to_pylist(),
                                   batch["lang"].to_pylist()):
            html = html_from_doc(did, text, lang, 0).decode("utf-8")
            if did % 3 == 0:
                words = text.split()[:4] + ["", "", "", ""]
                rows = "".join(f"<tr><td>{i}</td><td>{words[i]}</td></tr>"
                               for i in range(4))
                # entity-bearing page: table (triage signal) + a LaTeX formula
                # and a footnote for the enrichment stand-in to read
                k = did % 7 + 1
                extra = (f"<p>see $$\\frac{{{did}}}{{{k}}}$$</p>"
                         f'<p class="footnote">[1] note {did}</p>')
                html = html.replace("</div>",
                                    f"<table>{rows}</table>{extra}</div>")
            elif did % 5 == 0:
                html = html.replace("</div>", '<img alt="figure"/></div>')
            elif did % 11 == 0:
                # enough replacement chars to clear the 0.3% byte-ratio signal
                # regardless of page size (n/(L+3n) ≥ 0.003 for n = 0.004·L)
                import math

                n_bad = max(3, math.ceil(0.004 * len(html.encode("utf-8"))))
                html = html.replace("</div>", f"<p>bad scan {'�' * n_bad}</p></div>")
            urls.append(f"https://docs.example/{did:06d}")
            htmls.append(html.encode("utf-8"))
        return pa.table({"url": pa.array(urls, pa.string()),
                         "html": pa.array(htmls, pa.binary())})

    return docs.map_batches(build, batch_format="pyarrow")


def hybrid_routed_extract(sf_dir: str):
    """Full two-path pipeline: triage route → local extractor on everything +
    backend stand-in on backend-routed pages → trustStream reconcile.
    Not SQL-expressible (extraction + similarity gate) — rows-only driver
    check; the route/fallback/merge semantics are pytest-pinned
    (tests/test_hybrid.py, mirroring TriageProcessorTest).

    So the rows-only gate means something, the query asserts its own
    invariants (round-2 verdict item #9): per batch, sim ∈ [0, 1] and
    source ∈ {local, backend} with non-null text; globally, the reconciled
    source counts must be consistent with the triage tally (every page
    appears exactly once; only backend-ROUTED pages can come back
    backend-SOURCED — the reconcile gate may still prefer local for them)."""
    pages = _doc_pages(sf_dir)

    def check(t: pa.Table) -> pa.Table:
        # hard raises, not assert: the gate must survive ``python -O``
        sim = t["sim"].to_numpy(zero_copy_only=False)
        if not ((sim >= 0.0) & (sim <= 1.0)).all():
            raise ValueError("hybrid invariant: sim outside [0,1]")
        src = set(t["source"].to_pylist())
        if not src <= {"local", "backend"}:
            raise ValueError(f"hybrid invariant: unknown source {src}")
        if t["text"].null_count != 0:
            raise ValueError("hybrid invariant: null reconciled text")
        return t

    # the tally comes off hybrid_extract's own materialized routed
    # intermediate — a second page-build + routing pass would double the
    # query's wall time just to audit it
    tally: dict = {}
    out = (hybrid_extract(pages, route_counts=tally)
           .map_batches(check, batch_format="pyarrow")
           .materialize())
    srcs = {r["source"]: r["count()"] for r in
            out.groupby("source").count().take_all()}
    n_total, n_backend_src = sum(srcs.values()), srcs.get("backend", 0)
    if n_total != sum(tally.values()):
        raise ValueError(f"hybrid invariant: reconciled rows {n_total} != "
                         f"routed pages {sum(tally.values())}")
    if n_backend_src > tally.get("backend", 0):
        raise ValueError(f"hybrid invariant: {n_backend_src} backend-sourced"
                         f" rows exceed {tally.get('backend', 0)} "
                         f"backend-routed pages")
    return out


def hybrid_triage_tally(sf_dir: str):
    """Triage routing tally (HybridDocumentProcessor.java:1489). The markup
    that triggers each signal is a pure function of doc_id, so the tally IS
    SQL-expressible — a real correctness gate on the router."""
    return triage_tally(_doc_pages(sf_dir))


def hybrid_enriched_entities(sf_dir: str):
    """Backend enrichment entities per routed page (SemanticFormula /
    SemanticPicture / SemanticFootnote analog, ``core/entities/`` +
    ``HybridDocumentProcessor.java:888-1010``). The planted markup is a pure
    function of doc_id, so the whole entity table is SQL-expressible — a full
    correctness gate on routing + entity extraction."""
    return enriched_entities(_doc_pages(sf_dir))


# routing and the planted entities are both pure doc_id arithmetic (elif
# order in _doc_pages mirrors the CASE order here); the %11 scan pages route
# backend but carry no entities
HYBRID_ENRICHED_ENTITIES_SQL = """
WITH routed AS (
    SELECT doc_id,
           'https://docs.example/' || lpad(CAST(doc_id AS VARCHAR), 6, '0') AS url,
           CASE WHEN doc_id % 3 = 0 THEN 'entity'
                WHEN doc_id % 5 = 0 THEN 'img'
                WHEN doc_id % 11 = 0 THEN 'scan'
                ELSE 'local' END AS cls
    FROM documents)
SELECT url,
    CAST(CASE WHEN cls = 'entity' THEN 1 ELSE 0 END AS BIGINT) AS n_formulas,
    CASE WHEN cls = 'entity'
         THEN '\\frac{' || doc_id || '}{' || (doc_id % 7 + 1) || '}'
         ELSE '' END AS formula_latex,
    CAST(CASE WHEN cls = 'img' THEN 1 ELSE 0 END AS BIGINT) AS n_pictures,
    CASE WHEN cls = 'img' THEN 'figure[0]: figure' ELSE '' END AS picture_desc,
    CAST(CASE WHEN cls = 'entity' THEN 1 ELSE 0 END AS BIGINT) AS n_footnotes,
    CASE WHEN cls = 'entity' THEN '[1] note ' || doc_id ELSE '' END AS footnote_text
FROM routed WHERE cls <> 'local'
"""


# the markup is a pure function of doc_id and each signal is guaranteed to
# fire (the %11 docs carry enough � to clear the 0.3% byte ratio at any page
# size), so the router's tally reduces to doc_id arithmetic
HYBRID_TRIAGE_TALLY_SQL = """
SELECT route, count(*) AS n FROM (
    SELECT CASE
        WHEN doc_id % 3 = 0 THEN 'backend'          -- <table> signal (0.9)
        WHEN doc_id % 5 = 0 THEN 'backend'          -- <img> signal (0.85)
        WHEN doc_id % 11 = 0 THEN 'backend'         -- replacement-char (1.0)
        ELSE 'local'
    END AS route FROM documents
) GROUP BY route
"""


HYBRID_QUERIES = {
    "hybrid_routed_extract": hybrid_routed_extract,
    "hybrid_triage_tally": hybrid_triage_tally,
    "hybrid_enriched_entities": hybrid_enriched_entities,
}

HYBRID_ORACLE_SQL = {
    "hybrid_triage_tally": HYBRID_TRIAGE_TALLY_SQL,
    "hybrid_enriched_entities": HYBRID_ENRICHED_ENTITIES_SQL,
    # hybrid_routed_extract: extraction — rows-only
}
