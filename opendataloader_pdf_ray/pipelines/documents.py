"""Document-table queries: text analysis + deduplication (training-data ops)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Count, Mean, Sum

from ..functions import dedup as dd
from ..functions import text_stats as ts
from .common import read_table, round_cols


def doc_token_stats(sf_dir: str):
    """Per-doc char/token/punct counts — Arrow kernels, SQL-parity semantics."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return (ds.map_batches(ts.token_stats, batch_format="pyarrow")
              .select_columns(["doc_id", "n_chars_c", "n_tokens", "n_punct"]))


DOC_TOKEN_STATS_SQL = """
SELECT doc_id, length(text) AS n_chars_c,
       len(regexp_extract_all(text, '\\S+')) AS n_tokens,
       len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct
FROM documents
"""


def doc_source_stats(sf_dir: str):
    """Per-source corpus profile: doc count, mean chars, token total."""
    ds = read_table(sf_dir, "documents", columns=["source", "text", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        batch = ts.token_stats(batch)
        return batch.group_by("source").aggregate(
            [("n_chars", "sum"), ("n_tokens", "sum"), ("source", "count")])

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n_chars_sum", alias_name="sum_chars"),
                   Sum("n_tokens_sum", alias_name="sum_tokens"),
                   Sum("source_count", alias_name="n_docs"))
    )
    return out


DOC_SOURCE_STATS_SQL = """
SELECT source, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(sum(len(regexp_extract_all(text, '\\S+'))) AS BIGINT) AS sum_tokens,
       count(*) AS n_docs
FROM documents GROUP BY source
"""


def doc_fingerprints(sf_dir: str):
    """Exact content fingerprint per doc (md5 — SQL-parity with DuckDB md5())."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return (ds.map_batches(ts.md5_fingerprint, batch_format="pyarrow")
              .select_columns(["doc_id", "fp"]))


DOC_FINGERPRINTS_SQL = "SELECT doc_id, md5(text) AS fp FROM documents"


def dedup_exact(sf_dir: str):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return dd.exact_dedup_keys(ds)


DEDUP_EXACT_SQL = """
SELECT min(doc_id) AS doc_id, count(*) AS n_copies FROM documents GROUP BY text
"""


def lang_quality(sf_dir: str):
    """Language ID + quality features per doc (heuristics — rows-only check)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    ds = ds.map_batches(ts.LangId, batch_format="pyarrow", concurrency=2)
    ds = ds.map_batches(ts.quality_score, batch_format="pyarrow")
    return ds.map_batches(
        lambda t: round_cols(t.drop_columns(["text"]),
                             {"mean_token_len": 4, "stopword_ratio": 4,
                              "punct_ratio": 4}),
        batch_format="pyarrow")


def lang_id_accuracy(sf_dir: str):
    """Aggregate: predicted-vs-actual language counts (rows-only check)."""
    ds = read_table(sf_dir, "documents", columns=["text", "lang"])
    ds = ds.map_batches(ts.LangId, batch_format="pyarrow", concurrency=2)
    return ds.groupby(["lang", "pred_lang"]).aggregate(Count(alias_name="n"))


def dedup_minhash(sf_dir: str):
    """MinHash-LSH near-dup pairs with exact-Jaccard verification (rows-only)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return dd.minhash_lsh_pairs(ds, threshold=0.5)


def dedup_simhash(sf_dir: str):
    """SimHash banded near-dup pairs (rows-only)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return dd.simhash_pairs(ds, max_hamming=3)


def doc_adjacent_levenshtein(sf_dir: str):
    """Levenshtein distance between each doc's text prefix and the next
    doc_id's (TextSimilarity.java analog; distances match DuckDB's
    levenshtein(), test-verified). Broadcast of the small keyed prefix table,
    distance computed vectorized-DP inside map_batches."""
    import ray

    from ..functions.text_sim import levenshtein

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def prefix(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({"doc_id": batch["doc_id"],
                         "pfx": pc.utf8_slice_codeunits(batch["text"], 0, 40)})

    pfx = ds.map_batches(prefix, batch_format="pyarrow")
    lookup = {r["doc_id"]: r["pfx"] for r in pfx.take_all()}
    ref = ray.put(lookup)

    def dist(batch: pa.Table) -> pa.Table:
        table = ray.get(ref)
        ids, dists = [], []
        for i in range(batch.num_rows):
            did = batch["doc_id"][i].as_py()
            nxt = table.get(did + 1)
            if nxt is None:
                continue
            ids.append(did)
            dists.append(levenshtein(batch["pfx"][i].as_py(), nxt))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "dist": pa.array(dists, pa.int64())})

    return pfx.map_batches(dist, batch_format="pyarrow")


DOC_LEVENSHTEIN_SQL = """
SELECT a.doc_id, levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) AS dist
FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
"""


def doc_word_jaccard_adjacent(sf_dir: str):
    """Exact word-set Jaccard between doc i and doc i+1 — the n-gram-Jaccard
    dedup primitive with a SQL oracle (DuckDB list_intersect/list_distinct).
    Word sets broadcast once; similarity computed per batch."""
    import re

    import ray

    word_re = re.compile(r"\S+")
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    rows = ds.take_all()
    sets = {r["doc_id"]: frozenset(word_re.findall(r["text"])) for r in rows}
    ref = ray.put(sets)

    def jac(batch: pa.Table) -> pa.Table:
        table = ray.get(ref)
        ids, out = [], []
        for i in range(batch.num_rows):
            did = batch["doc_id"][i].as_py()
            nxt = table.get(did + 1)
            if nxt is None:
                continue
            cur = table[did]
            union = len(cur | nxt)
            j = len(cur & nxt) / union if union else 1.0
            ids.append(did)
            out.append(j)
        import numpy as np

        from .common import round_half_away

        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "jaccard": pa.array(round_half_away(np.array(out), 6))})

    return ds.map_batches(jac, batch_format="pyarrow")


DOC_WORD_JACCARD_SQL = """
WITH w AS (SELECT doc_id,
                  list_distinct(regexp_extract_all(text, '\\S+')) AS ws
           FROM documents)
SELECT a.doc_id,
       round(CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
             / len(list_distinct(list_concat(a.ws, b.ws))), 6) AS jaccard
FROM w a JOIN w b ON b.doc_id = a.doc_id + 1
"""


DOC_QUERIES = {
    "doc_adjacent_levenshtein": doc_adjacent_levenshtein,
    "doc_word_jaccard_adjacent": doc_word_jaccard_adjacent,
    "doc_token_stats": doc_token_stats,
    "doc_source_stats": doc_source_stats,
    "doc_fingerprints": doc_fingerprints,
    "dedup_exact": dedup_exact,
    "lang_quality": lang_quality,
    "lang_id_accuracy": lang_id_accuracy,
    "dedup_minhash": dedup_minhash,
    "dedup_simhash": dedup_simhash,
}

DOC_ORACLE_SQL = {
    "doc_adjacent_levenshtein": DOC_LEVENSHTEIN_SQL,
    "doc_word_jaccard_adjacent": DOC_WORD_JACCARD_SQL,
    "doc_token_stats": DOC_TOKEN_STATS_SQL,
    "doc_source_stats": DOC_SOURCE_STATS_SQL,
    "doc_fingerprints": DOC_FINGERPRINTS_SQL,
    "dedup_exact": DEDUP_EXACT_SQL,
    # lang_quality / lang_id_accuracy / dedup_minhash / dedup_simhash:
    # heuristic & sketch ops — not SQL-expressible, rows-only driver check
}
