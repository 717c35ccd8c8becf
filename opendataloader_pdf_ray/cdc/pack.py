"""Pack the lake into training shards: the LLM-serving sink.

``pipelines/packing.py`` proves the packing math over the driver testdata;
this module is the PRODUCT surface: live lake text → fixed-token-budget
sequence manifests, one shard file per lake partition, written with the
same resumable/incremental contract as ``Lake.export_resumable``:

- one Ray task per partition (the lake's unit of parallelism and memory
  bound) reads its merge-on-read live state, sorts by url (the canonical
  per-partition order), whitespace-tokenizes, and cuts the partition's
  token stream into ``budget``-token sequences with documents spanning
  boundaries;
- the shard is a MANIFEST — rows ``(part, seq_id, url, tok_start,
  tok_end)`` mapping each sequence to the document token slices that fill
  it (``tok_*`` are offsets WITHIN the sequence) — so the trainer joins
  text (or real tokenizer output) at load time and the shard stays slim;
- ``out/part=NNNN.parquet`` is written atomically (temp+rename) and
  stamped with the partition's tip epoch: re-runs skip unchanged
  partitions and rewrite only churned ones — crash resume and cheap
  periodic refresh in one mechanism, packing cost scales with churn.

Determinism: url order and whitespace token counts fully determine the
manifest — equal lake state gives byte-equal shards at any concurrency.
Partitioning note: sequences never span partitions (shards are the
resume/refresh unit); at 100 TB the partition count bounds shard size,
exactly like export.
"""

from __future__ import annotations

import json
import posixpath
import uuid
from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import fsspec

from .lake import Lake
from .merge import live_view

_STAMP = b"odl_pack_epoch"
_TOK_STAMP = b"odl_pack_tokenizer"
_PRED_STAMP = b"odl_pack_range"


def _pack_partition(state: pa.Table, part: int, budget: int,
                    text_col: str,
                    tokenizer: str = "whitespace") -> pa.Table:
    """Sequence manifest for ONE partition's live rows (already merged).
    ``tokenizer``: "whitespace" (default) or "bpe" — the deterministic
    vendored byte-level BPE (functions/bpe.py; r4 verdict item #3: real
    training shards budget by subword tokens, not whitespace)."""
    from ..functions.bpe import make_counter

    count = make_counter(tokenizer)
    state = state.sort_by([("url", "ascending")])
    urls = state["url"].to_numpy(zero_copy_only=False)
    texts = state[text_col].to_pylist()
    toks = np.fromiter(
        (count(t) if isinstance(t, str) else 0 for t in texts),
        np.int64, count=len(texts))
    keep = toks > 0
    urls, toks = urls[keep], toks[keep]
    if len(urls) == 0:  # a range-filtered (or all-empty) partition
        return pa.table({
            "part": pa.array([], pa.int32()),
            "seq_id": pa.array([], pa.int64()),
            "url": pa.array([], pa.string()),
            "tok_start": pa.array([], pa.int64()),
            "tok_end": pa.array([], pa.int64()),
        })
    end = np.cumsum(toks)
    start = end - toks
    first = start // budget
    last = (end - 1) // budget
    cnt = (last - first + 1).astype(np.int64)
    idx = np.repeat(np.arange(len(cnt)), cnt)
    cum = np.concatenate([[0], np.cumsum(cnt)[:-1]])
    seq = first[idx] + (np.arange(cnt.sum()) - np.repeat(cum, cnt))
    lo = np.maximum(start[idx], seq * budget)
    hi = np.minimum(end[idx], (seq + 1) * budget)
    n = len(idx)
    return pa.table({
        "part": pa.array(np.full(n, part, np.int32)),
        "seq_id": pa.array(seq, pa.int64()),
        "url": pa.array(urls[idx], pa.string()),
        "tok_start": pa.array(lo - seq * budget, pa.int64()),
        "tok_end": pa.array(hi - seq * budget, pa.int64()),
    })


def pack_lake(lake: Lake, out: str, budget: int = 2048,
              text_col: str = "text",
              as_of: Optional[int] = None,
              tokenizer: str = "whitespace",
              range_filter: Optional[tuple] = None) -> List[Dict]:
    """Write one sequence-manifest shard per live partition (module
    docstring). Returns ≤P summary dicts (part, rows, sequences, tokens,
    tip_epoch, skipped)."""
    import ray.data as _rd

    live_parts, target = lake._unified_live(as_of)
    if target is None:
        return []
    root, n_parts = lake.root, lake.num_partitions
    pred = (json.dumps([range_filter[0], int(range_filter[1]),
                        int(range_filter[2])])
            if range_filter else "")

    def task(batch: pa.Table) -> pa.Table:
        ofs, _ = fsspec.core.url_to_fs(out)
        is_local = "file" in (ofs.protocol if isinstance(
            ofs.protocol, (list, tuple)) else (ofs.protocol,))
        lk = Lake(root, n_parts)
        res = {"part": [], "rows": [], "sequences": [], "tokens": [],
               "tip_epoch": [], "skipped": []}
        for part in batch["part"].to_pylist():
            part = int(part)
            tip = lk.latest_epoch(part, as_of)
            path = posixpath.join(out, f"part={part:04d}.parquet")
            if ofs.exists(path):
                meta = pq.read_metadata(path, filesystem=ofs)
                kv = meta.metadata or {}
                stamped = kv.get(_STAMP)
                stamped_tok = (kv.get(_TOK_STAMP) or b"whitespace").decode()
                stamped_pred = (kv.get(_PRED_STAMP) or b"").decode()
                if stamped is not None and tip is not None \
                        and int(stamped) == tip \
                        and stamped_tok == tokenizer \
                        and stamped_pred == pred:
                    res["part"].append(part)
                    res["rows"].append(meta.num_rows)
                    res["sequences"].append(-1)  # not recounted on skip
                    res["tokens"].append(-1)
                    res["tip_epoch"].append(tip)
                    res["skipped"].append(True)
                    continue
            # projection keeps the merge keys (deleted included), so the
            # live filter works without schema unification
            cols = ["url", text_col]
            if range_filter is not None and range_filter[0] not in cols:
                cols.append(range_filter[0])
            t = lk.read_partition(part, as_of, columns=cols)
            if t is None:
                continue
            t = live_view(t)
            if range_filter is not None:
                # corpus slicing at the pack boundary (score -> slice ->
                # shard): inclusive int band, nulls (unscored/tombstone
                # payloads) excluded — the predicate is STAMPED so a
                # re-run under a different band rewrites, never mixes
                col, lo, hi = range_filter
                c = t[col]
                mask = pc.and_(pc.greater_equal(c, pa.scalar(int(lo))),
                               pc.less_equal(c, pa.scalar(int(hi))))
                t = t.filter(pc.fill_null(mask, False))
            manifest = _pack_partition(t, part, budget, text_col,
                                       tokenizer)
            manifest = manifest.replace_schema_metadata(
                {**(manifest.schema.metadata or {}),
                 _STAMP: str(tip).encode(),
                 _TOK_STAMP: tokenizer.encode(),
                 _PRED_STAMP: pred.encode()})
            ofs.makedirs(out, exist_ok=True)
            if is_local:
                tmp = path + f".tmp-{uuid.uuid4().hex}"
                pq.write_table(manifest, tmp, compression="zstd",
                               filesystem=ofs)
                ofs.mv(tmp, path)
            else:
                pq.write_table(manifest, path, compression="zstd",
                               filesystem=ofs)
            res["part"].append(part)
            res["rows"].append(manifest.num_rows)
            res["sequences"].append(
                len(np.unique(manifest["seq_id"].to_numpy(
                    zero_copy_only=False))) if manifest.num_rows else 0)
            res["tokens"].append(int(pa.compute.sum(pa.compute.subtract(
                manifest["tok_end"], manifest["tok_start"])).as_py() or 0))
            res["tip_epoch"].append(tip)
            res["skipped"].append(False)
        return pa.table({
            "part": pa.array(res["part"], pa.int32()),
            "rows": pa.array(res["rows"], pa.int64()),
            "sequences": pa.array(res["sequences"], pa.int64()),
            "tokens": pa.array(res["tokens"], pa.int64()),
            "tip_epoch": pa.array(res["tip_epoch"], pa.int64()),
            "skipped": pa.array(res["skipped"], pa.bool_()),
        })

    parts_ds = _rd.from_items([{"part": p} for p in live_parts])
    return parts_ds.map_batches(task, batch_format="pyarrow",
                                batch_size=1).take_all()  # ≤ P rows


def follow_pack(lake: Lake, out: str, budget: int = 2048,
                text_col: str = "text", poll_interval: float = 0.5,
                max_idle_polls: "Optional[int]" = None,
                tokenizer: str = "whitespace",
                range_filter: Optional[tuple] = None) -> List[Dict]:
    """TAIL the lake's epoch watermark and keep the training-shard
    manifests FRESH as the tail ingests — the pack analog of the
    changefeed/replication followers: each poll re-runs :func:`pack_lake`
    pinned to the current feed head (the unbroken run of complete epochs —
    a half-committed epoch never leaks into a shard), and the tip-epoch
    stamps make the refresh incremental (only churned partitions rewrite;
    the others are one footer read each). Stops after ``max_idle_polls``
    polls with no watermark advance (None = poll forever — the serving
    deployment shape). Crash/restart resumes from the stamps alone.

    Returns the summaries of every NON-skipped refresh (≤P rows per
    advanced epoch — nothing shard-sized transits the driver)."""
    import time as _time

    from .changefeed import feed_head

    done_head = -1
    refreshed: List[Dict] = []
    idle = 0
    while True:
        head = feed_head(lake)
        # head < 0 = no COMPLETE epoch yet: nothing is packable (packing
        # the raw committed state would leak half-committed epochs into
        # training shards — the exact hazard the watermark pin exists for)
        if head > done_head and head >= 0:
            out_rows = pack_lake(lake, out, budget=budget,
                                 text_col=text_col, as_of=head,
                                 tokenizer=tokenizer,
                                 range_filter=range_filter)
            refreshed.extend(r for r in out_rows if not r["skipped"])
            done_head = head
            idle = 0
        else:
            idle += 1
            if max_idle_polls is not None and idle >= max_idle_polls:
                return refreshed
        _time.sleep(poll_interval)
