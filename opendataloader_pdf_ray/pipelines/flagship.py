"""Flagship pipeline for the driver's ``entry()`` smoke check.

Derives a deterministic CDC change-event log from the driver testdata
``documents`` table (urls from doc_id, html rendered from the document text),
replays it through the full engine (extract → salted LWW merge → copy-on-write
lake commit), and returns the live lake state as a Ray Dataset.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from ..cdc import Lake, replay
from ..config import CDCConfig
from ..fixtures.gen import BASE_TS_US


def html_from_doc(doc_id: int, text: str, lang: str, rev: int) -> bytes:
    """Deterministic HTML wrapper for a testdata document."""
    words = text.split()
    title = " ".join(words[:4]).title() or f"Document {doc_id}"
    paras = []
    for i in range(0, len(words), 40):
        paras.append("<p>" + " ".join(words[i:i + 40]) + "</p>")
    body = "\n".join(paras[:10])
    return (f'<html><body><div class="page"><h1>{title} r{rev}</h1>\n'
            f"{body}\n</div></body></html>").encode("utf-8")


def events_from_documents(docs: pa.Table) -> pa.Table:
    """documents(doc_id, text, lang, …) → events(seq, op, url, warc_ts, html, lang).
    Pure function of the table contents: every doc inserts; doc_id%10<3 also
    updates; doc_id%10==3 is deleted afterwards."""
    rows = sorted(docs.to_pylist(), key=lambda r: r["doc_id"])
    seqs, ops, urls, tss, htmls, langs = [], [], [], [], [], []
    seq = 0

    def add(op, d, rev):
        nonlocal seq
        seqs.append(seq)
        ops.append(op)
        urls.append(f"https://docs.example/{d['doc_id']:06d}")
        tss.append(BASE_TS_US + seq * 1_000_000)
        htmls.append(None if op == "D"
                     else html_from_doc(d["doc_id"], d["text"], d["lang"], rev))
        langs.append(d["lang"])
        seq += 1

    for d in rows:
        add("I", d, 0)
    for d in rows:
        if d["doc_id"] % 10 < 3:
            add("U", d, 1)
        elif d["doc_id"] % 10 == 3:
            add("D", d, 0)
    return pa.table({
        "seq": pa.array(seqs, pa.int64()),
        "op": pa.array(ops, pa.string()),
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "lang": pa.array(langs, pa.string()),
    })


def run_flagship(sf_dir: str, work_dir: str = "/tmp/odl_ray_flagship",
                 cfg: CDCConfig | None = None) -> "ray.data.Dataset":
    """Full CDC replay over events derived from ``<sf_dir>/documents.parquet``;
    returns the live (tombstone-free) lake state as a Dataset."""
    cfg = cfg or CDCConfig(num_partitions=8, num_salts=4, epoch_size=500,
                           extract_batch_size=32, extract_concurrency=4)
    shutil.rmtree(work_dir, ignore_errors=True)
    os.makedirs(work_dir, exist_ok=True)
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    events_path = os.path.join(work_dir, "events.parquet")
    pq.write_table(events_from_documents(docs), events_path)
    lake_root = os.path.join(work_dir, "lake")
    replay(events_path, lake_root, cfg)
    lake = Lake(lake_root, cfg.num_partitions)
    files = lake.partition_files()
    ds = ray.data.read_parquet(files)
    import pyarrow.compute as pc

    return ds.map_batches(lambda t: t.filter(pc.invert(t["deleted"])),
                          batch_format="pyarrow")
