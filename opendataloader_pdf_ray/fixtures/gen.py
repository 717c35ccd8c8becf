"""Deterministic synthetic CDC fixtures (FIXTURES.md §1-§3).

Generates the ``pages`` base table and the ``events`` change log with the
input_hint shape:

    pages(url, warc_ts, html, text, lang)
    events(seq, op, url, warc_ts, html, lang[, content_type])

Everything derives from a seeded ``random.Random`` plus pure hash functions of
(url, revision) — no wall clock, no global state — so any two runs (and any
two parallelism levels) generate byte-identical tables. The HTML templates
cover every extractor operator (FIXTURES.md §3). The golden ``text`` column is
produced by the same single-threaded extractor the distributed engine hosts,
which is the oracle the replay tests compare against.
"""

from __future__ import annotations

import hashlib
import random
from datetime import datetime, timezone
from typing import Dict, List, Optional

import pyarrow as pa

from ..config import ExtractorConfig
from ..extractor import extract_text

BASE_TS_US = int(datetime(2026, 1, 1, tzinfo=timezone.utc).timestamp() * 1_000_000)
LANGS = ["en", "en", "en", "en", "en", "en", "en", "ko", "de", "fr"]

_WORDS = ("data lake engine stream event page table merge commit epoch schema "
          "column batch arrow shuffle actor block parquet replay upsert delete "
          "insert update partition salt hash key value text html web crawl").split()


def _h(s: str) -> int:
    return int.from_bytes(hashlib.sha256(s.encode()).digest()[:8], "big")


def _words(url: str, rev: int, salt: str, n: int) -> str:
    seed = _h(f"{url}|{rev}|{salt}")
    rng = random.Random(seed)
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def make_url(site: int, page: int) -> str:
    return f"https://site{site:03d}.example/page{page:05d}"


def url_universe(n_urls: int, n_sites: int = 50) -> List[str]:
    per_site = max(1, n_urls // n_sites)
    urls = [make_url(s, p) for s in range(n_sites) for p in range(per_site)]
    return urls[:n_urls]


# ------------------------------------------------------------------ html render


def render_html(url: str, rev: int) -> bytes:
    """Deterministic HTML for (url, rev), composing templates per FIXTURES.md §3.
    Which templates appear is a pure function of the url hash; content varies
    with rev so updates change the extracted text."""
    h = _h(url)
    parts: List[str] = []
    n_pages = 2 + (h % 3)
    title = _words(url, rev, "title", 4).title()
    for pg in range(n_pages):
        page: List[str] = ['<div class="page">']
        if n_pages > 1:
            page.append(f"<p>{title} Report</p>")  # repeated header (boilerplate)
        if pg == 0:
            page.append(f"<h1>{title}</h1>")
            page.append(f'<h2 style="font-size:24px">{_words(url, rev, "s1", 3).title()}</h2>')
        # several realistic-size paragraphs per page (Common-Crawl pages are
        # tens of KB; tiny docs make benches fixed-cost-bound)
        for para in range(3):
            page.append(f"<p>{_words(url, rev, f'body{pg}.{para}', 70)}.</p>")
        if h % 5 == 0:
            page.append(f'<p style="font-size:22px">{_words(url, rev, "bigp", 4).title()}</p>')
        if h % 3 == 0:
            items = "".join(f"<li>{_words(url, rev, f'li{i}', 4)}</li>" for i in range(6))
            sub = "".join(f"<li>{_words(url, rev, f'sub{i}', 2)}</li>" for i in range(2))
            page.append(f'<ul><li>first item<ol type="a">{sub}</ol></li>{items}</ul>')
        if h % 4 == 0:
            rows = "".join(
                f"<tr><td>{_words(url, rev, f'c{r}0', 1)}</td>"
                f"<td>{_words(url, rev, f'c{r}1', 3)}</td></tr>" for r in range(8))
            page.append(f'<table><tr><th>Key</th><th rowspan="1">Value</th></tr>{rows}</table>')
        if h % 7 == 0:
            page.append('<div style="position:absolute;left:20px;top:400px;width:300px;height:120px">'
                        f"<p>{_words(url, rev, 'colL', 10)}</p></div>"
                        '<div style="position:absolute;left:420px;top:400px;width:300px;height:120px">'
                        f"<p>{_words(url, rev, 'colR', 10)}</p></div>")
        if h % 11 == 0:
            page.append(f'<figure><img alt="chart {rev}"/>'
                        f"<figcaption>Figure 1 {_words(url, rev, 'cap', 4)}</figcaption></figure>")
        if h % 13 == 0:
            page.append(f'<p style="display:none">hidden {_words(url, rev, "hid", 3)}</p>')
            page.append('<p style="position:absolute;left:-2000px;top:0;width:100px;height:20px">offpage</p>')
        if h % 17 == 0:
            page.append(f"<p>수신: {_words(url, rev, 'kr1', 2)}</p><p>제목: {_words(url, rev, 'kr2', 2)}</p>")
        if h % 19 == 0:
            page.append(f"<p>contact{rev}@example.org and https://example.org/x{rev} �</p>")
        if n_pages > 1:
            page.append(f"<p>Page {pg + 1} of {n_pages}</p>")  # repeated footer
        page.append("</div>")
        parts.append("\n".join(page))
    return ("<html><body>\n" + "\n".join(parts) + "\n</body></html>").encode("utf-8")


# ---------------------------------------------------------------------- tables


def gen_pages(n_urls: int, cfg: Optional[ExtractorConfig] = None) -> pa.Table:
    cfg = cfg or ExtractorConfig()
    urls = url_universe(n_urls)
    rows: Dict[str, List] = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
    for i, url in enumerate(urls):
        html = render_html(url, rev=0)
        rows["url"].append(url)
        rows["warc_ts"].append(BASE_TS_US + (_h(url + "|ts0") % 86_400) * 1_000_000)
        rows["html"].append(html)
        rows["text"].append(extract_text(html, cfg))
        rows["lang"].append(LANGS[_h(url + "|lang") % len(LANGS)])
    return pa.table(
        {
            "url": pa.array(rows["url"], pa.string()),
            "warc_ts": pa.array(rows["warc_ts"], pa.timestamp("us")),
            "html": pa.array(rows["html"], pa.binary()),
            "text": pa.array(rows["text"], pa.string()),
            "lang": pa.array(rows["lang"], pa.string()),
        }
    )


def _zipf_index(rng: random.Random, n: int, alpha: float = 1.1) -> int:
    """Cheap deterministic Zipf-ish draw over [0, n) (FIXTURES.md §2 skew)."""
    u = rng.random()
    # inverse-CDF approximation for zipf: rank ∝ u^(-1/(alpha-1)) truncated
    rank = int(u ** (-1.0 / (alpha - 1.0))) if u > 0 else n
    return min(rank - 1, n - 1) if rank >= 1 else 0


def gen_events(n_events: int, n_urls: int, seed: int = 42,
               evolve_from: Optional[int] = None,
               epoch_size: int = 1000,
               patch_frac: float = 0.0) -> pa.Table:
    """Change-event log: I/U/D 60/30/10, Zipf-hot urls, ~5% out-of-order
    warc_ts per key, optional additive ``content_type`` column from event
    ``evolve_from`` onward (events_v2 of FIXTURES.md §2).

    ``patch_frac > 0`` turns that fraction of non-insert events into
    partial updates (op='P'): half carry a fresh html payload (content
    patch, lang omitted), half carry only a new lang (metadata patch, html
    omitted); a few land on tombstoned keys (resurrect-by-patch) and ~5%
    arrive out-of-order like everything else — the full patch-semantics
    gauntlet for the replay-vs-oracle tests. patch_frac=0.0 (default) is
    byte-identical to the pre-patch generator."""
    rng = random.Random(seed)
    urls = url_universe(n_urls)
    # permute so hot zipf ranks hit a deterministic, spread-out subset
    perm = list(range(len(urls)))
    random.Random(seed + 1).shuffle(perm)

    seqs, ops, evurls, tss, htmls, langs, ctypes = [], [], [], [], [], [], []
    last_ts: Dict[str, int] = {}
    rev_counter: Dict[str, int] = {}
    inserted: Dict[str, bool] = {}
    for seq in range(n_events):
        idx = perm[_zipf_index(rng, len(urls))]
        url = urls[idx]
        r = rng.random()
        pr = rng.random() if patch_frac else 1.0
        if not inserted.get(url):
            if inserted.get(url) is False and pr < patch_frac / 2:
                op = "P"  # resurrect-by-patch onto a tombstone
                inserted[url] = True
            else:
                op = "I"
                inserted[url] = True
        elif pr < patch_frac:
            op = "P"
        elif r < 0.75:
            op = "U"
        elif r < 0.90:
            op = "D"
            inserted[url] = False
        else:
            op = "U"
        base = last_ts.get(url, BASE_TS_US)
        if op != "I" and rng.random() < 0.05:
            ts = base - rng.randint(1, 3600) * 1_000_000  # out-of-order: must lose LWW
        else:
            ts = base + rng.randint(1, 3600) * 1_000_000
        last_ts[url] = max(base, ts)
        seqs.append(seq)
        ops.append(op)
        evurls.append(url)
        tss.append(ts)
        if op == "D":
            htmls.append(None)
            langs.append(LANGS[_h(url + "|lang") % len(LANGS)])
        elif op == "P":
            if rng.random() < 0.5:  # content patch: html only
                rev = rev_counter.get(url, 0) + 1
                rev_counter[url] = rev
                htmls.append(render_html(url, rev))
                langs.append(None)
            else:  # metadata patch: lang only
                htmls.append(None)
                langs.append(f"patched-{seq % 5}")
        else:
            rev = rev_counter.get(url, 0) + 1
            rev_counter[url] = rev
            htmls.append(render_html(url, rev))
            langs.append(LANGS[_h(url + "|lang") % len(LANGS)])
        if evolve_from is not None:
            ctypes.append("text/html" if seq >= evolve_from else None)

    cols = {
        "seq": pa.array(seqs, pa.int64()),
        "op": pa.array(ops, pa.string()),
        "url": pa.array(evurls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "lang": pa.array(langs, pa.string()),
    }
    if evolve_from is not None:
        cols["content_type"] = pa.array(ctypes, pa.string())
    return pa.table(cols)


def write_fixture(path: str, n_events: int, n_urls: int, seed: int = 42,
                  evolve_from: Optional[int] = None,
                  row_group_size: int = 2000) -> str:
    import pyarrow.parquet as pq

    table = gen_events(n_events, n_urls, seed=seed, evolve_from=evolve_from)
    # row groups aligned with epoch boundaries → the per-epoch seq filter
    # prunes at the read instead of scanning the whole log every epoch
    pq.write_table(table, path, row_group_size=row_group_size)
    return path


def write_fixture_dir(path: str, n_events: int, n_urls: int, seed: int = 42,
                      evolve_from: Optional[int] = None,
                      shard_size: int = 2000) -> str:
    """Sharded event log (one file per seq segment) — the binlog-segment
    layout. One file per shard gives the Ray read stage one task per shard
    instead of one serial task for the whole log."""
    import os

    import pyarrow.parquet as pq

    table = gen_events(n_events, n_urls, seed=seed, evolve_from=evolve_from)
    os.makedirs(path, exist_ok=True)
    for i, lo in enumerate(range(0, table.num_rows, shard_size)):
        pq.write_table(table.slice(lo, shard_size),
                       os.path.join(path, f"segment-{i:05d}.parquet"),
                       row_group_size=shard_size)
    return path
