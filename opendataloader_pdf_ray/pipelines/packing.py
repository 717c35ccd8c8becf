"""Sequence packing: the LLM-training shard operator.

Training corpora are served as fixed-token-budget sequences: per shard key
(here ``source`` — the Common-Crawl segment analog), documents in
deterministic order form one token stream that is cut into ``budget``-token
sequences with documents spanning boundaries (GPT-style packing). The core
primitive is a **two-level distributed prefix sum** over per-doc token
counts — the same shape a 100-TB run needs:

- phase 1: per-(key, range-bucket) token totals — a partial aggregate inside
  ``map_batches`` then a tiny groupby; the driver sees only
  O(buckets × keys) rows and computes exclusive offsets (the classic
  scan-then-propagate parallel prefix sum);
- phase 2: per-(key, bucket) groups cumsum locally (bounded: ~N/buckets
  docs) against the broadcast offsets → every doc's (start, end) token
  range in its key's stream — no global sort, no driver transit of docs;
- phase 3: each doc explodes to the sequences it overlaps (vectorized
  repeat/arange — a doc overlaps ``1 + span`` sequences, ~1 on average);
- phase 4: ``groupby((key, seq))`` folds per-sequence stats.

Partitioning assumption: range buckets follow the order column (bucket ids
non-decreasing in ``order``), so intra-bucket cumsum + exclusive bucket
offset = global per-key prefix. Order is ``doc_id`` (dense per the driver
testdata); at scale the key is the shard and ``order`` any per-shard
monotone id.

Determinism: integer token counts and integer arithmetic only — exact at
any batch size / bucket count, mirrored by a window-cumsum +
``unnest(range(...))`` DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data.aggregate import Count, Max, Min, Sum

from .common import broadcast, n_buckets, read_table

BUDGET = 256


def prefix_ranges(tokds, key: str, order: str, value: str,
                  num_buckets: int, n_rows_hint: int):
    """Two-level distributed prefix sum: returns (ds with start/end columns,
    {key: total}). ``tokds`` must carry an ``rb`` range-bucket column
    non-decreasing in ``order`` within each key."""

    def bucket_partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        df = pd.DataFrame({key: t[key].to_pandas(),
                           "rb": t["rb"].to_pandas(),
                           value: t[value].to_pandas()})
        g = df.groupby([key, "rb"], sort=False)[value].sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = (tokds.map_batches(bucket_partial, batch_format="pyarrow")
                .groupby([key, "rb"])
                .aggregate(Sum(value, alias_name="v"))
                .take_all())  # tiny: O(buckets × keys) rows
    partials.sort(key=lambda r: (r[key], r["rb"]))
    offsets: dict = {}
    totals: dict = {}
    for r in partials:
        k = r[key]
        offsets[(k, r["rb"])] = totals.get(k, 0)
        totals[k] = totals.get(k, 0) + int(r["v"])
    off_ref = broadcast(offsets)

    def cumsum_group(group: pa.Table) -> pa.Table:
        if group.num_columns == 0 or group.num_rows == 0:
            return pa.table({key: pa.array([], pa.string()),
                             order: pa.array([], pa.int64()),
                             value: pa.array([], pa.int64()),
                             "start": pa.array([], pa.int64()),
                             "end": pa.array([], pa.int64())})
        off = ray.get(off_ref)
        k = group[key][0].as_py()
        rb = group["rb"][0].as_py()
        ordv = group[order].to_numpy(zero_copy_only=False)
        val = group[value].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.argsort(ordv, kind="stable")
        end = np.cumsum(val[pos]) + off.get((k, rb), 0)
        start = end - val[pos]
        return pa.table({key: group[key].take(pa.array(pos)),
                         order: group[order].take(pa.array(pos)),
                         value: pa.array(val[pos], pa.int64()),
                         "start": pa.array(start, pa.int64()),
                         "end": pa.array(end, pa.int64())})

    ranged = tokds.groupby([key, "rb"]).map_groups(cumsum_group,
                                                   batch_format="pyarrow")
    return ranged, totals


def doc_pack_sequences(sf_dir: str, budget: int = BUDGET):
    """Pack each source's documents (ordered by doc_id) into budget-token
    training sequences; docs span boundaries. Output per sequence:
    (source, seq_id, n_docs, n_tokens, first_doc, last_doc)."""
    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "source", "text"])
    n = docs.count()
    rb_buckets = max(4, min(n_buckets(), n // 16))

    def tok_counts(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        toks = np.fromiter((len(x.split()) for x in t["text"].to_pylist()),
                           np.int64, count=len(ids))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "source": t["source"],
            "n_tokens": pa.array(toks, pa.int64()),
            "rb": pa.array(ids * rb_buckets // max(n, 1), pa.int64()),
        })

    tokds = docs.map_batches(tok_counts, batch_format="pyarrow").materialize()
    ranged, totals = prefix_ranges(tokds, key="source", order="doc_id",
                                   value="n_tokens", num_buckets=rb_buckets,
                                   n_rows_hint=n)

    def explode(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.table({"source": pa.array([], pa.string()),
                             "seq_id": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64())})
        tok = t["n_tokens"].to_numpy(zero_copy_only=False)
        keep = tok > 0
        start = t["start"].to_numpy(zero_copy_only=False)[keep]
        end = t["end"].to_numpy(zero_copy_only=False)[keep]
        ids = t["doc_id"].to_numpy(zero_copy_only=False)[keep]
        src = t["source"].to_numpy(zero_copy_only=False)[keep]
        first = start // budget
        last = (end - 1) // budget
        cnt = (last - first + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(cnt)), cnt)
        # per-doc within-span offsets 0..cnt-1
        cum = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        within = np.arange(cnt.sum()) - np.repeat(cum, cnt)
        return pa.table({
            "source": pa.array(src[idx]),
            "seq_id": pa.array(first[idx] + within, pa.int64()),
            "doc_id": pa.array(ids[idx], pa.int64()),
        })

    tot_ref = broadcast(totals)

    def finalize(t: pa.Table) -> pa.Table:
        tot = ray.get(tot_ref)
        src = t["source"].to_numpy(zero_copy_only=False)
        seq = t["seq_id"].to_numpy(zero_copy_only=False)
        full = (seq + 1) * budget
        lim = np.fromiter((tot[s] for s in src), np.int64, count=len(src))
        return pa.table({
            "source": t["source"],
            "seq_id": pa.array(seq, pa.int64()),
            "n_docs": t["n_docs"].cast(pa.int64()),
            "n_tokens": pa.array(np.minimum(full, lim) - seq * budget,
                                 pa.int64()),
            "first_doc": t["first_doc"].cast(pa.int64()),
            "last_doc": t["last_doc"].cast(pa.int64()),
        })

    return (ranged.map_batches(explode, batch_format="pyarrow")
            .groupby(["source", "seq_id"])
            .aggregate(Count(alias_name="n_docs"),
                       Min("doc_id", alias_name="first_doc"),
                       Max("doc_id", alias_name="last_doc"))
            .map_batches(finalize, batch_format="pyarrow")
            .sort(["source", "seq_id"]))


PACK_SQL = f"""
WITH tok AS (
  SELECT doc_id, source, len(regexp_extract_all(text, '\\S+')) AS tok
  FROM documents),
cum AS (
  SELECT doc_id, source, tok,
         sum(tok) OVER (PARTITION BY source ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING) AS e
  FROM tok),
tot AS (SELECT source, sum(tok) AS total FROM tok GROUP BY source),
ds AS (
  SELECT source, doc_id,
         unnest(range(CAST((e - tok) // {BUDGET} AS BIGINT),
                      CAST(((e - 1) // {BUDGET}) + 1 AS BIGINT))) AS seq_id
  FROM cum WHERE tok > 0)
SELECT d.source, d.seq_id, count(*) AS n_docs,
       CAST(least((d.seq_id + 1) * {BUDGET}, t.total)
            - d.seq_id * {BUDGET} AS BIGINT) AS n_tokens,
       min(d.doc_id) AS first_doc, max(d.doc_id) AS last_doc
FROM ds d JOIN tot t ON t.source = d.source
GROUP BY d.source, d.seq_id, t.total
ORDER BY d.source, d.seq_id
"""

PACK_QUERIES = {
    "doc_pack_sequences": doc_pack_sequences,
}

PACK_ORACLE_SQL = {
    "doc_pack_sequences": PACK_SQL,
}
