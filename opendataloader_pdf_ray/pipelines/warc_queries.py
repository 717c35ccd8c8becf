"""WARC-source queries: write→read round trip over real segment files.

The fixture is a deterministic WARC rendering of the driver ``documents``
table (one ``response`` record per doc, 100 docs per segment — the
Common-Crawl-style layout ``sources/warc.py`` is built for), cached under
/tmp per scale factor. Because url/segment are pure doc_id arithmetic, the
per-segment stats are fully SQL-expressible — a hash-exact gate proving every
record survives the WARC write→distributed-parse round trip."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data
from ray.data.aggregate import Count, Max, Min

from ..sources.warc import read_warc, write_warc
from .flagship import html_from_doc

_SEG_DOCS = 100
_CACHE = "/tmp/odl_warc_cache"


def _warc_fixture(sf_dir: str) -> str:
    """documents.parquet → cached dir of .warc segments (deterministic)."""
    name = os.path.basename(sf_dir.rstrip("/"))
    out_dir = os.path.join(_CACHE, name)
    done = os.path.join(out_dir, "_done")
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text", "lang"])
    rows = sorted(t.to_pylist(), key=lambda r: r["doc_id"])
    for seg_start in range(0, len(rows), _SEG_DOCS):
        seg_rows = rows[seg_start:seg_start + _SEG_DOCS]
        seg_no = seg_rows[0]["doc_id"] // _SEG_DOCS
        recs = [(f"https://docs.example/{r['doc_id']:06d}",
                 "2026-01-01T00:00:00Z",
                 html_from_doc(r["doc_id"], r["text"], r["lang"], 0))
                for r in seg_rows]
        write_warc(os.path.join(out_dir, f"seg-{seg_no:04d}.warc"), recs)
    with open(done, "w") as f:
        f.write("ok")
    return out_dir


def warc_roundtrip_stats(sf_dir: str):
    """Per-segment record count + url range after a full WARC round trip.
    Segment membership is doc_id // 100, urls are doc_id-derived — the SQL
    oracle recomputes both without touching WARC at all, so any record lost
    or corrupted by the writer/parser breaks the hash."""
    path = _warc_fixture(sf_dir)
    ds = read_warc(path)
    return (ds.groupby("segment")
              .aggregate(Count(alias_name="n_records"),
                         Min("url", alias_name="url_min"),
                         Max("url", alias_name="url_max")))


WARC_ROUNDTRIP_SQL = """
SELECT 'seg-' || lpad(CAST(doc_id // 100 AS VARCHAR), 4, '0') || '.warc' AS segment,
       count(*) AS n_records,
       min('https://docs.example/' || lpad(CAST(doc_id AS VARCHAR), 6, '0')) AS url_min,
       max('https://docs.example/' || lpad(CAST(doc_id AS VARCHAR), 6, '0')) AS url_max
FROM documents GROUP BY doc_id // 100
"""


WARC_QUERIES = {
    "warc_roundtrip_stats": warc_roundtrip_stats,
}

WARC_ORACLE_SQL = {
    "warc_roundtrip_stats": WARC_ROUNDTRIP_SQL,
}
