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


def _jsonl_fixture(sf_dir: str) -> str:
    """documents.parquet → cached dir of Debezium-style JSONL segments
    (every other segment gzipped — the import must sniff by magic bytes).
    op cycles by doc_id%3 (0=delete with null after, 1=create, 2=update);
    doc_id%2==0 non-deletes carry an extra ``source`` after-key (additive
    schema evolution through the wire format)."""
    import base64
    import gzip
    import json

    name = os.path.basename(sf_dir.rstrip("/"))
    out_dir = os.path.join("/tmp/odl_jsonl_cache", name)
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
        lines = []
        for r in seg_rows:
            i = r["doc_id"]
            if i % 3 == 0:
                op, after = "d", None
            else:
                op = "c" if i % 3 == 1 else "u"
                after = {
                    "html_b64": base64.b64encode(
                        f"<p>{r['text']}</p>".encode()).decode("ascii"),
                    "lang": r["lang"],
                }
                if i % 2 == 0:
                    after["source"] = f"crawl-{i % 4}"
            lines.append(json.dumps({
                "op": op, "seq": i, "ts_us": 1_767_225_600_000_000 + i,
                "key": {"url": f"https://docs.example/{i:06d}"},
                "after": after}, sort_keys=True))
        raw = ("\n".join(lines) + "\n").encode()
        if seg_no % 2:
            with open(os.path.join(out_dir, f"seg-{seg_no:04d}.jsonl.gz"),
                      "wb") as f:
                f.write(gzip.compress(raw))
        else:
            with open(os.path.join(out_dir, f"seg-{seg_no:04d}.jsonl"),
                      "wb") as f:
                f.write(raw)
    with open(done, "w") as f:
        f.write("ok")
    return out_dir


def jsonl_roundtrip_stats(sf_dir: str):
    """Per-segment stats after the full JSONL→parquet import round trip
    (sources/jsonl_binlog.py): event/delete counts, url range, extra-column
    survival, and the total decoded html byte length. Every value is pure
    doc_id arithmetic, so the SQL oracle recomputes all of it without
    touching JSONL — any event lost, mis-ordered, double-decoded (gzip) or
    base64-corrupted by the importer breaks the hash."""
    from ray.data.aggregate import Sum

    from ..sources.jsonl_binlog import import_jsonl

    src = _jsonl_fixture(sf_dir)
    out_dir = src + ".parquet"
    import_jsonl(src, out_dir)

    def stats(batch: pa.Table) -> pa.Table:
        import numpy as np

        seqs = batch["seq"].to_numpy(zero_copy_only=False)
        ops = batch["op"].to_numpy(zero_copy_only=False)
        html_len = np.array(
            [len(h) if h is not None else 0
             for h in batch["html"].to_pylist()], dtype=np.int64)
        has_source = np.array(
            [s is not None for s in
             (batch["source"].to_pylist() if "source" in batch.column_names
              else [None] * batch.num_rows)], dtype=np.int64)
        return pa.table({
            "segment": pa.array(seqs // _SEG_DOCS, pa.int64()),
            "url": batch["url"],
            "is_delete": pa.array((ops == "D").astype(np.int64)),
            "has_source": pa.array(has_source),
            "html_bytes": pa.array(html_len),
        })

    ds = ray.data.read_parquet(
        out_dir, columns=["seq", "op", "url", "html", "source"])
    return (ds.map_batches(stats, batch_format="pyarrow")
              .groupby("segment")
              .aggregate(Count(alias_name="n_events"),
                         Sum("is_delete", alias_name="n_deletes"),
                         Min("url", alias_name="url_min"),
                         Max("url", alias_name="url_max"),
                         Sum("has_source", alias_name="n_source"),
                         Sum("html_bytes", alias_name="sum_html_bytes")))


JSONL_ROUNDTRIP_SQL = """
SELECT CAST(doc_id // 100 AS BIGINT) AS segment,
       count(*) AS n_events,
       CAST(sum(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_deletes,
       min('https://docs.example/' || lpad(CAST(doc_id AS VARCHAR), 6, '0'))
           AS url_min,
       max('https://docs.example/' || lpad(CAST(doc_id AS VARCHAR), 6, '0'))
           AS url_max,
       CAST(sum(CASE WHEN doc_id % 3 <> 0 AND doc_id % 2 = 0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_source,
       CAST(sum(CASE WHEN doc_id % 3 <> 0
                THEN octet_length(encode(text)) + 7 ELSE 0 END) AS BIGINT)
           AS sum_html_bytes
FROM documents GROUP BY doc_id // 100
"""


WARC_QUERIES = {
    "warc_roundtrip_stats": warc_roundtrip_stats,
    "jsonl_roundtrip_stats": jsonl_roundtrip_stats,
}

WARC_ORACLE_SQL = {
    "warc_roundtrip_stats": WARC_ROUNDTRIP_SQL,
    "jsonl_roundtrip_stats": JSONL_ROUNDTRIP_SQL,
}
