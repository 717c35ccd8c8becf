"""WARC source — the web-archive input format for webtext-scale crawls.

Implements the public WARC/1.0 record layout (ISO 28500): each record is a
``WARC/1.0`` header block (CRLF-terminated ``Name: value`` lines), a blank
line, ``Content-Length`` bytes of payload, and a trailing ``\\r\\n\\r\\n``.
``response`` records carry an HTTP response whose body is the page.

Scale shape: ``read_warc`` fans file paths out with
``ray.data.read_binary_files`` (one task per file — WARC segments are the
crawl's natural partition, ~1 GB each in Common-Crawl-style layouts) and
parses records inside ``map_batches``; nothing touches the driver. The writer
exists for deterministic fixtures and round-trip tests.

``.warc.gz`` support: Common-Crawl-style segments are CONCATENATED
per-record gzip members; Python's gzip handles multi-member streams, so a
whole segment decompresses in one pass inside its read task — no CDX index
needed for full-segment scans (CDX only matters for random access to
individual records, which this engine never does). Memory bound: one
decompressed segment per task (~3–5× the .gz size for CC-style segments) —
the same per-task bound as the plain-WARC path, sized by the crawl's own
segmentation.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import pyarrow as pa

import ray.data

_CRLF = b"\r\n"
_SEP = b"\r\n\r\n"

WARC_COLUMNS = ["url", "warc_ts", "record_type", "content_type", "html",
                "segment"]


def _parse_headers(block: bytes) -> Dict[str, str]:
    headers: Dict[str, str] = {}
    for line in block.split(_CRLF)[1:]:  # [0] is the WARC/1.0 version line
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.decode("ascii", "replace").strip().lower()] = \
                v.decode("utf-8", "replace").strip()
    return headers


def parse_warc_bytes(data: bytes, segment: str = "") -> List[dict]:
    """All records of one WARC segment → list of row dicts. ``response``
    records get their HTTP body extracted into ``html``; other record types
    (warcinfo, request, metadata) keep ``html=None`` so callers can filter by
    ``record_type`` without a second file pass."""
    rows: List[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        if not data.startswith(b"WARC/", pos):
            nxt = data.find(b"WARC/", pos)
            if nxt < 0:
                break
            pos = nxt
        hdr_end = data.find(_SEP, pos)
        if hdr_end < 0:
            break
        headers = _parse_headers(data[pos:hdr_end])
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            length = 0
        body = data[hdr_end + len(_SEP): hdr_end + len(_SEP) + length]
        pos = hdr_end + len(_SEP) + length
        while data.startswith(_CRLF, pos):  # record terminator CRLFs
            pos += len(_CRLF)
        rtype = headers.get("warc-type", "")
        html: Optional[bytes] = None
        ctype = headers.get("content-type", "")
        if rtype == "response":
            http_end = body.find(_SEP)
            html = body[http_end + len(_SEP):] if http_end >= 0 else body
        elif rtype == "conversion":
            # WET-style extracted-text record: the body IS the payload
            # (no HTTP envelope)
            html = body
        rows.append({
            "url": headers.get("warc-target-uri", ""),
            "warc_ts": headers.get("warc-date", ""),
            "record_type": rtype,
            "content_type": ctype,
            "html": html,
            "segment": segment,
        })
    return rows


def _rows_table(rows: List[dict]) -> pa.Table:
    return pa.table({
        "url": pa.array([r["url"] for r in rows], pa.string()),
        "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.string()),
        "record_type": pa.array([r["record_type"] for r in rows], pa.string()),
        "content_type": pa.array([r["content_type"] for r in rows], pa.string()),
        "html": pa.array([r["html"] for r in rows], pa.binary()),
        "segment": pa.array([r["segment"] for r in rows], pa.string()),
    })


def read_warc(paths, responses_only: bool = True) -> "ray.data.Dataset":
    """WARC segment file(s)/dir → Dataset(url, warc_ts, record_type,
    content_type, html, segment). One read task per segment; records parse
    inside the batch transform."""
    import os

    files = ray.data.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        import gzip

        rows: List[dict] = []
        for path, data in zip(batch["path"].to_pylist(),
                              batch["bytes"].to_pylist()):
            if bytes(data[:2]) == b"\x1f\x8b":
                # multi-member gzip (CC-style .warc.gz): one-pass inflate.
                # Magic-byte sniff, NOT extension: some readers inflate
                # .gz transparently and the payload arrives plain.
                data = gzip.decompress(data)
            recs = parse_warc_bytes(data, segment=os.path.basename(path))
            if responses_only:
                recs = [r for r in recs if r["record_type"] == "response"]
            rows.extend(recs)
        return _rows_table(rows)

    return files.map_batches(parse, batch_format="pyarrow")


def wet_record(url: str, iso_ts: str, text: str) -> bytes:
    """One WET-style ``conversion`` record (Common Crawl's extracted-text
    distribution format): text/plain payload, no HTTP envelope.
    Deterministic — the record id derives from the url, the date from the
    row's own warc_ts (no uuids, no wall-clock)."""
    import hashlib

    payload = text.encode("utf-8")
    rid = hashlib.md5(url.encode()).hexdigest()
    hdr = (f"WARC/1.0\r\n"
           f"WARC-Type: conversion\r\n"
           f"WARC-Record-ID: <urn:md5:{rid}>\r\n"
           f"WARC-Refers-To: <urn:md5:{rid}>\r\n"
           f"WARC-Target-URI: {url}\r\n"
           f"WARC-Date: {iso_ts}\r\n"
           f"Content-Type: text/plain\r\n"
           f"Content-Length: {len(payload)}\r\n\r\n").encode("utf-8")
    return hdr + payload + _SEP


def export_wet(lake_root: str, out: str, num_partitions: Optional[int] = None,
               as_of: Optional[int] = None) -> List[dict]:
    """Export the lake's live extracted text as WET-style WARC segments —
    the Common-Crawl-shaped OUTPUT of the engine (crawl WARC in via
    :func:`read_warc`, extracted-text WET out here). One segment per lake
    partition, written atomically (temp + rename) so existence means
    complete — a crashed export re-run skips finished segments (the
    resumable-output rule). The partition read projects to
    (url, warc_ts, text) only: the wide blocks column is never decoded.
    Record order is url-ascending (the partition's canonical sort), so
    segment bytes are a pure function of lake state."""
    import os
    import uuid as _uuid

    import ray.data as _rd

    from ..cdc.lake import Lake

    lake = Lake(lake_root, num_partitions)
    root, n_parts = lake.root, lake.num_partitions
    os.makedirs(out, exist_ok=True)

    def task(batch: pa.Table) -> pa.Table:
        from ..cdc.merge import live_view

        lk = Lake(root, n_parts)
        parts, rows_out, skipped = [], [], []
        for part in batch["part"].to_pylist():
            part = int(part)
            path = os.path.join(out, f"part={part:04d}.warc")
            if os.path.exists(path):  # atomic rename → existence == complete
                parts.append(part)
                rows_out.append(-1)
                skipped.append(True)
                continue
            t = lk.read_partition(part, as_of=as_of, columns=["text"])
            if t is None:
                continue
            t = live_view(t)
            ts = t["warc_ts"].cast(pa.int64()).to_pylist()
            import datetime as _dt

            blobs = []
            for url, us, text in zip(t["url"].to_pylist(), ts,
                                     t["text"].to_pylist()):
                iso = _dt.datetime.fromtimestamp(
                    us / 1e6, _dt.timezone.utc).strftime(
                    "%Y-%m-%dT%H:%M:%SZ")
                blobs.append(wet_record(url, iso, text or ""))
            tmp = path + f".tmp-{_uuid.uuid4().hex}"
            with open(tmp, "wb") as f:
                f.write(b"".join(blobs))
            os.rename(tmp, path)
            parts.append(part)
            rows_out.append(t.num_rows)
            skipped.append(False)
        return pa.table({"part": pa.array(parts, pa.int32()),
                         "rows": pa.array(rows_out, pa.int64()),
                         "skipped": pa.array(skipped, pa.bool_())})

    live = [p for p in range(n_parts) if lake.committed_epochs(p)]
    parts_ds = _rd.from_items([{"part": p} for p in live])
    return parts_ds.map_batches(task, batch_format="pyarrow",
                                batch_size=1).take_all()  # ≤ P rows


def write_warc(path: str, records: List[Tuple[str, str, bytes]]) -> None:
    """Write a plain WARC/1.0 segment: one ``response`` record per
    (url, iso_ts, html) tuple. Deterministic (no uuids/wall-clock — record id
    derives from the url) — fixture + round-trip-test writer."""
    import hashlib

    with open(path, "wb") as f:
        for url, ts, html in records:
            rid = hashlib.md5(url.encode()).hexdigest()
            http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                    + html)
            hdr = (f"WARC/1.0\r\n"
                   f"WARC-Type: response\r\n"
                   f"WARC-Record-ID: <urn:md5:{rid}>\r\n"
                   f"WARC-Target-URI: {url}\r\n"
                   f"WARC-Date: {ts}\r\n"
                   f"Content-Type: application/http;msgtype=response\r\n"
                   f"Content-Length: {len(http)}\r\n\r\n").encode("utf-8")
            f.write(hdr + http + _SEP)
