"""Source readers — the CLI-walker / multi-format input analog
(``cli/CLIMain.java:141-204`` recursive scan + per-file dispatch).

``read_events`` accepts a parquet file, a directory of binlog segment files,
or JSONL, and normalizes to the canonical events schema. File fan-out is
Ray's job; validation is a cheap flag column, mirroring the reference's
magic-number guard (``DocumentProcessor.java:675-686``) that skips bad files
without failing the batch."""

from __future__ import annotations

import base64
import os
from typing import Optional

import pyarrow as pa

import ray.data

EVENT_COLUMNS = ["seq", "op", "url", "warc_ts", "html", "lang"]
# 'P' = partial update (patch): carries only changed columns, html optional
VALID_OPS = ("I", "U", "D", "P")


def read_events(path: str, columns: Optional[list] = None,
                filter=None) -> "ray.data.Dataset":
    """Parquet file/dir or .jsonl → events Dataset (canonical schema)."""
    if path.endswith(".jsonl") or path.endswith(".json"):
        ds = ray.data.read_json(path)
        return ds.map_batches(_normalize_json_events, batch_format="pyarrow")
    return ray.data.read_parquet(path, columns=columns, filter=filter)


def _normalize_json_events(batch: pa.Table) -> pa.Table:
    """JSONL carries html base64-encoded (JSON has no binary type)."""
    htmls = []
    for v in batch["html"].to_pylist():
        htmls.append(None if v is None else base64.b64decode(v))
    out = pa.table({
        "seq": batch["seq"].cast(pa.int64()),
        "op": batch["op"].cast(pa.string()),
        "url": batch["url"].cast(pa.string()),
        "warc_ts": batch["warc_ts"].cast(pa.int64()).cast(pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "lang": batch["lang"].cast(pa.string()),
    })
    return out


def validate_events(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Cheap input validation → ``valid`` flag column (skip-and-continue:
    per-event failures become a quarantine flag, not a job failure)."""

    def check(batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        ops_ok = pc.is_in(batch["op"], value_set=pa.array(list(VALID_OPS)))
        url_ok = pc.match_substring_regex(batch["url"], r"^https?://")
        html = batch["html"]
        # deletes and patches may legitimately omit the payload
        need_payload = pc.invert(pc.is_in(
            batch["op"], value_set=pa.array(["D", "P"])))
        payload_ok = pc.or_(pc.is_valid(html), pc.invert(need_payload))
        valid = pc.and_(pc.and_(ops_ok, pc.fill_null(url_ok, False)), payload_ok)
        return batch.append_column("valid", valid)

    return ds.map_batches(check, batch_format="pyarrow")


def quarantine_split(ds: "ray.data.Dataset"):
    """(valid_ds, quarantined_ds) — the reference's failed-file log analog."""
    import pyarrow.compute as pc

    flagged = validate_events(ds)
    good = flagged.map_batches(lambda t: t.filter(t["valid"]).drop_columns(["valid"]),
                               batch_format="pyarrow")
    bad = flagged.map_batches(lambda t: t.filter(pc.invert(t["valid"])),
                              batch_format="pyarrow")
    return good, bad
