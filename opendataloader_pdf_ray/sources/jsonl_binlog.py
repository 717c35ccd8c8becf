"""JSONL (Debezium-style) binlog source: normalize newline-JSON change-event
segments into the engine's parquet segment layout.

Real CDC feeds rarely arrive as parquet — Debezium/Kafka-connect sinks emit
one JSON envelope per change event. This module accepts that wire shape:

    {"op": "c", "seq": 17, "ts_us": 1767225600000000,
     "key": {"url": "https://..."},
     "after": {"html_b64": "<base64>", "lang": "en", ...}}

- ``op``: Debezium codes ``c`` (create), ``r`` (snapshot read), ``u``
  (update), ``d`` (delete) — mapped to the engine's I/I/U/D. The engine's
  own letters are accepted verbatim (a round-trip is a no-op).
- ``ts_us``: event timestamp (version) in microseconds → ``warc_ts``.
- ``after``: the row image; ``html_b64`` is base64 (JSON can't carry
  binary); absent/null on deletes. Extra ``after`` keys ride along as
  additive columns (schema evolution: the parquet segments carry them,
  Arrow unification null-backfills older segments at read time).
- Segments may be gzip-compressed; compression is sniffed by MAGIC BYTES,
  never by filename (``ray.data.read_binary_files`` inflates ``.gz``
  transparently, so an extension test would double-decode).

Why IMPORT-to-parquet instead of tailing JSONL directly: the ingest path
prunes every epoch's read with a parquet ``seq`` row-group predicate
(cdc/ingest.py) — row-oriented JSON has no pushdown, so a direct tail would
re-scan the whole log once per epoch, O(epochs × log) at 10^10 events. The
import is one distributed pass (one Ray task per segment, preserving the
segment ↔ file mapping, so import parallelism == segment count and a re-run
skips segments whose parquet already exists — resumable like every other
sink here), after which the normal parquet tail applies with all its
pruning. This mirrors how production lakes land Kafka/Debezium topics:
normalize once at the edge, query columnar forever after.

Reference parity: the reference ingests PDF bytes from a directory walk
(``cli/Main.java``); a wire-format change-event source has no counterpart —
this is CDC-engine surface (SURVEY.md §2.1 source family).

Determinism: output parquet depends only on segment bytes (sorted file
order, seq carried in the envelope) — equal inputs give byte-equal
segments at any import concurrency.
"""

from __future__ import annotations

import base64
import gzip
import io
import json
import os
import posixpath
from typing import Dict, List, Optional

import pyarrow as pa

_OP_MAP = {"c": "I", "r": "I", "u": "U", "d": "D",
           "I": "I", "U": "U", "D": "D"}
_CORE = ("seq", "op", "url", "warc_ts", "html", "lang")


class MalformedEvent(ValueError):
    """A JSONL line that cannot become a change event (bad JSON, missing
    op/seq/url, unknown op code). Carries segment + line number so the
    operator can find the poison record."""


def parse_segment(data: bytes, name: str = "<segment>") -> pa.Table:
    """One JSONL segment (possibly gzipped — magic-byte sniff) → an Arrow
    table in the engine's event schema. Extra ``after`` keys become
    additive string columns."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    seqs: List[int] = []
    ops: List[str] = []
    urls: List[str] = []
    tss: List[int] = []
    htmls: List[Optional[bytes]] = []
    langs: List[Optional[str]] = []
    extras: Dict[str, Dict[int, str]] = {}
    n = 0
    for lineno, raw in enumerate(io.BytesIO(data).read().splitlines(), 1):
        if not raw.strip():
            continue
        try:
            rec = json.loads(raw)
            op = _OP_MAP[rec["op"]]
            url = rec["key"]["url"] if "key" in rec else rec["url"]
            seq = int(rec["seq"])
            ts = int(rec.get("ts_us", rec.get("warc_ts")))
        except MalformedEvent:
            raise
        except Exception as exc:
            raise MalformedEvent(
                f"{name}:{lineno}: not a change event: {exc}") from exc
        after = rec.get("after") or {}
        b64 = after.get("html_b64")
        seqs.append(seq)
        ops.append(op)
        urls.append(url)
        tss.append(ts)
        htmls.append(base64.b64decode(b64) if b64 else None)
        langs.append(after.get("lang"))
        for k, v in after.items():
            if k in ("html_b64", "lang") or v is None:
                continue
            extras.setdefault(k, {})[n] = str(v)
        n += 1
    cols = {
        "seq": pa.array(seqs, pa.int64()),
        "op": pa.array(ops, pa.string()),
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "lang": pa.array(langs, pa.string()),
    }
    for k in sorted(extras):
        vals = extras[k]
        cols[k] = pa.array([vals.get(i) for i in range(n)], pa.string())
    return pa.table(cols)


def import_jsonl(src_dir: str, out_dir: str,
                 suffixes: tuple = (".jsonl", ".jsonl.gz", ".ndjson")) -> int:
    """Distributed JSONL→parquet segment import (module docstring): one Ray
    task per segment file, resumable (existing outputs skipped), atomic
    per-segment writes. Returns the number of segments imported this run."""
    import ray.data

    names = sorted(n for n in os.listdir(src_dir)
                   if n.endswith(suffixes) and not n.startswith("."))
    if not names:
        return 0
    os.makedirs(out_dir, exist_ok=True)

    def outname(name: str) -> str:
        base = name
        for s in suffixes:
            if base.endswith(s):
                base = base[: -len(s)]
                break
        return base + ".parquet"

    todo = [n for n in names
            if not os.path.exists(posixpath.join(out_dir, outname(n)))]
    if not todo:
        return 0

    def task(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        done = []
        for name in batch["name"].to_pylist():
            with open(posixpath.join(src_dir, name), "rb") as f:
                table = parse_segment(f.read(), name)
            final = posixpath.join(out_dir, outname(name))
            tmp = final + ".tmp"
            pq.write_table(table, tmp)
            os.rename(tmp, final)  # atomic publish (POSIX)
            done.append(name)
        return pa.table({"name": pa.array(done, pa.string())})

    ds = ray.data.from_items([{"name": n} for n in todo],
                             override_num_blocks=len(todo))
    out = ds.map_batches(task, batch_format="pyarrow", batch_size=None)
    return out.count()


def follow_import(src_dir: str, out_dir: str, poll_interval: float = 0.5,
                  max_idle_polls: Optional[int] = None):
    """TAIL a growing JSONL segment directory (the Kafka-connect /
    Debezium-sink drop-dir shape): a generator yielding the number of
    segments imported per productive poll. Resumable for free —
    :func:`import_jsonl` skips segments whose parquet already exists, so a
    restarted tail re-imports nothing. Stops on ``src_dir/.end`` (after a
    final drain) or after ``max_idle_polls`` polls with no new segments.
    Compose with ``ingest OUT LAKE --mode follow`` for the full wire-to-lake
    loop: sink drops JSONL → this normalizes to parquet → the CDC tail
    ingests epochs as they complete."""
    import time

    idle = 0
    while True:
        ending = os.path.exists(os.path.join(src_dir, ".end"))
        n = import_jsonl(src_dir, out_dir)
        if n:
            idle = 0
            yield n
        else:
            idle += 1
        if ending:
            return
        if max_idle_polls is not None and idle >= max_idle_polls:
            return
        time.sleep(poll_interval)


def to_jsonl_segment(events: pa.Table, debezium_ops: bool = True) -> bytes:
    """Inverse of :func:`parse_segment` (fixture/round-trip helper): the
    engine's event table → one JSONL segment's bytes."""
    inv = {"I": "c", "U": "u", "D": "d"} if debezium_ops else {}
    lines = []
    extra_cols = [c for c in events.column_names if c not in _CORE]
    for i in range(events.num_rows):
        html = events["html"][i].as_py()
        after = {}
        if html is not None:
            after["html_b64"] = base64.b64encode(html).decode("ascii")
        lang = events["lang"][i].as_py()
        if lang is not None:
            after["lang"] = lang
        for c in extra_cols:
            v = events[c][i].as_py()
            if v is not None:
                after[c] = v
        op = events["op"][i].as_py()
        ts = events["warc_ts"][i].cast(pa.int64()).as_py() \
            if hasattr(events["warc_ts"][i], "cast") \
            else events["warc_ts"][i].as_py()
        lines.append(json.dumps({
            "op": inv.get(op, op),
            "seq": events["seq"][i].as_py(),
            "ts_us": ts,
            "key": {"url": events["url"][i].as_py()},
            "after": after or None,
        }, sort_keys=True))
    return ("\n".join(lines) + "\n").encode("utf-8")


def export_jsonl(src_dir: str, out_dir: str, gzip_out: bool = True) -> int:
    """Distributed parquet→JSONL segment export — the full inverse of
    :func:`import_jsonl`, making the engine's binlog consumable by
    JSONL/Debezium tooling (and closing the interchange loop:
    ``export-jsonl`` → ``import-jsonl`` → ``ingest`` reproduces the same
    lake, diff-verified in tests). One Ray task per segment, resumable
    (existing outputs skipped), atomic per-segment writes. Returns the
    number of segments exported this run."""
    import ray.data

    names = sorted(n for n in os.listdir(src_dir)
                   if n.endswith(".parquet") and not n.startswith("."))
    os.makedirs(out_dir, exist_ok=True)
    suffix = ".jsonl.gz" if gzip_out else ".jsonl"

    def outname(name: str) -> str:
        return name[: -len(".parquet")] + suffix

    todo = [n for n in names
            if not os.path.exists(posixpath.join(out_dir, outname(n)))]
    if not todo:
        return 0

    def task(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        done = []
        for name in batch["name"].to_pylist():
            events = pq.read_table(posixpath.join(src_dir, name))
            data = to_jsonl_segment(events)
            if gzip_out:
                # mtime=0: byte-deterministic output (gzip stamps the wall
                # clock by default, which would break equal-input ==
                # equal-bytes)
                data = gzip.compress(data, mtime=0)
            final = posixpath.join(out_dir, outname(name))
            tmp = final + ".tmp"
            with open(tmp, "wb") as f:
                f.write(data)
            os.rename(tmp, final)  # atomic publish (POSIX)
            done.append(name)
        return pa.table({"name": pa.array(done, pa.string())})

    ds = ray.data.from_items([{"name": n} for n in todo],
                             override_num_blocks=len(todo))
    return ds.map_batches(task, batch_format="pyarrow",
                          batch_size=None).count()
