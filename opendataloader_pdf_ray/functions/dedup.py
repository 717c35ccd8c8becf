"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale shapes (the guide's patterns):
- exact: content-hash column in map_batches → groupby(hash) → per-group first
- MinHash-LSH: shingle→minhash per batch (stateful actor holds the permutation
  coefficients) → explode to (band, band_hash, doc_id) rows → groupby bands →
  candidate pairs → verify exact Jaccard on the pair
- SimHash: 64-bit signature, banded blocking, Hamming verify
- embedding: brute-force cosine per batch against a broadcast matrix

Everything deterministic: fixed seeds, sorted pair output (a < b)."""

from __future__ import annotations

import hashlib
import re
from typing import List, Tuple

import numpy as np
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Count, Min

_WORD_RE = re.compile(r"\w+", re.UNICODE)

_MERSENNE = (1 << 61) - 1


def _stable_hash64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")


def word_ngrams(text: str, n: int = 3) -> List[str]:
    words = [w.lower() for w in _WORD_RE.findall(text)]
    if len(words) < n:
        return [" ".join(words)] if words else []
    return [" ".join(words[i:i + n]) for i in range(len(words) - n + 1)]


# ------------------------------------------------------------------ exact dedup


def exact_dedup_keys(ds: "ray.data.Dataset", id_col: str = "doc_id",
                     text_col: str = "text") -> "ray.data.Dataset":
    """(kept id, n_copies) per distinct text: hash in map_batches, tiny groupby."""

    def add_hash(batch: pa.Table) -> pa.Table:
        fps = [hashlib.md5(t.encode("utf-8")).hexdigest()
               for t in batch[text_col].to_pylist()]
        return pa.table({id_col: batch[id_col], "fp": pa.array(fps, pa.string())})

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("fp")
        .aggregate(Min(id_col, alias_name=id_col), Count(alias_name="n_copies"))
        .select_columns([id_col, "n_copies"])
    )


# --------------------------------------------------------------------- MinHash


class MinHasher:
    """Stateful stage: permutation coefficients generated once per actor from
    a fixed seed (deterministic across the pool).

    Shingle hashing is vectorized: hash each DISTINCT word once (blake2b),
    then combine adjacent word hashes into n-gram hashes with a rolling
    polynomial — numpy end to end instead of a Python loop per shingle."""

    def __init__(self, num_hashes: int = 64, ngram: int = 3, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_hashes, dtype=np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_hashes, dtype=np.uint64)
        self.num_hashes = num_hashes
        self.ngram = ngram
        self._word_cache: dict = {}  # word → uint64 hash, amortized per actor
        # fixed odd multipliers for the positional polynomial combine
        self._poly = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                               0x165667B19E3779F9, 0xD6E8FEB86659FD93,
                               0xA2F4979B2F8B3E15][:max(1, ngram)],
                              dtype=np.uint64)

    def _gram_hashes(self, text: str) -> np.ndarray:
        words = [w.lower() for w in _WORD_RE.findall(text)]
        if not words:
            return np.zeros(0, dtype=np.uint64)
        cache = self._word_cache
        for w in set(words):
            if w not in cache:
                cache[w] = _stable_hash64(w)
        wh = np.fromiter((cache[w] for w in words), dtype=np.uint64, count=len(words))
        n = self.ngram
        if len(words) < n:
            return np.array([wh.sum(dtype=np.uint64)], dtype=np.uint64)
        # rolling combine: sum_k poly[k] * word_hash[i+k] (wraparound uint64)
        acc = np.zeros(len(words) - n + 1, dtype=np.uint64)
        for k in range(n):
            acc += self._poly[k] * wh[k:len(words) - n + 1 + k]
        return acc

    def signature(self, text: str) -> np.ndarray:
        hashes = self._gram_hashes(text)
        if hashes.size == 0:
            return np.zeros(self.num_hashes, dtype=np.uint64)
        hashes = hashes % np.uint64(_MERSENNE)
        # (a*x + b) mod p for all permutations × all shingles, then min
        prod = (hashes[None, :] * self.a[:, None] + self.b[:, None]) % np.uint64(_MERSENNE)
        return prod.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t) for t in batch["text"].to_pylist()]
        return batch.append_column(
            "minhash", pa.array([s.tolist() for s in sigs], pa.list_(pa.uint64())))


def minhash_bands(batch: pa.Table, num_bands: int = 16,
                  id_col: str = "doc_id") -> pa.Table:
    """Explode signatures to (band_id, band_hash, id) rows for the LSH
    bucket groupby."""
    ids, bands, bhashes = [], [], []
    for i in range(batch.num_rows):
        sig = np.array(batch["minhash"][i].as_py(), dtype=np.uint64)
        rows_per_band = len(sig) // num_bands
        doc = batch[id_col][i].as_py()
        for b in range(num_bands):
            chunk = sig[b * rows_per_band:(b + 1) * rows_per_band]
            bh = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
            ids.append(doc)
            bands.append(b)
            bhashes.append(bh)
    return pa.table({id_col: pa.array(ids, pa.int64()),
                     "band": pa.array(bands, pa.int32()),
                     "band_hash": pa.array(bhashes, pa.string())})


def candidate_pairs_from_band(group: pa.Table, id_col: str = "doc_id") -> pa.Table:
    ids = sorted(group[id_col].to_pylist())
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
    return pa.table({"id_a": pa.array(a, pa.int64()), "id_b": pa.array(b, pa.int64())})


def minhash_lsh_pairs(ds: "ray.data.Dataset", threshold: float = 0.7,
                      num_hashes: int = 64, num_bands: int = 16,
                      ngram: int = 3, id_col: str = "doc_id") -> "ray.data.Dataset":
    """Near-duplicate pairs with verified exact n-gram Jaccard ≥ threshold.
    Verification broadcasts the shingle sets of candidate ids only."""
    sigs = ds.map_batches(MinHasher, fn_constructor_kwargs={"num_hashes": num_hashes,
                                                            "ngram": ngram},
                          batch_format="pyarrow", concurrency=4)
    bands = sigs.map_batches(
        lambda t: minhash_bands(t, num_bands=num_bands, id_col=id_col),
        batch_format="pyarrow")
    pairs = (
        bands.groupby(["band", "band_hash"])
        .map_groups(lambda g: candidate_pairs_from_band(g, id_col=id_col),
                    batch_format="pyarrow")
        .groupby(["id_a", "id_b"]).aggregate(Count(alias_name="n_bands"))
    )
    # verify: exact Jaccard on candidate pairs (small set) — broadcast texts
    texts = {r[id_col]: r["text"]
             for r in ds.select_columns([id_col, "text"]).take_all()}
    texts_ref = ray.put(texts)

    def verify(batch: pa.Table) -> pa.Table:
        tx = ray.get(texts_ref)
        keep_a, keep_b, jac = [], [], []
        for a, b in zip(batch["id_a"].to_pylist(), batch["id_b"].to_pylist()):
            ga, gb = set(word_ngrams(tx[a], ngram)), set(word_ngrams(tx[b], ngram))
            if not ga or not gb:
                continue
            j = len(ga & gb) / len(ga | gb)
            if j >= threshold:
                keep_a.append(a)
                keep_b.append(b)
                jac.append(round(j, 6))
        return pa.table({"id_a": pa.array(keep_a, pa.int64()),
                         "id_b": pa.array(keep_b, pa.int64()),
                         "jaccard": pa.array(jac, pa.float64())})

    return pairs.map_batches(verify, batch_format="pyarrow")


# --------------------------------------------------------------------- SimHash


class SimHasher:
    """64-bit SimHash signatures from word features (stateful: the word-hash
    cache amortizes across batches). Fully vectorized: gram hashes via the
    same rolling polynomial as MinHasher, bit counting via one 64×n matrix."""

    def __init__(self, ngram: int = 2):
        self._inner = MinHasher(num_hashes=1, ngram=ngram)
        self._shifts = np.arange(64, dtype=np.uint64)

    def sig(self, text: str) -> int:
        grams = self._inner._gram_hashes(text)
        if grams.size == 0:
            return 0
        bits = ((grams[:, None] >> self._shifts[None, :]) & np.uint64(1))
        acc = 2 * bits.sum(axis=0, dtype=np.int64) - len(grams)
        return int(np.bitwise_or.reduce(
            (np.uint64(1) << self._shifts)[acc > 0], initial=np.uint64(0)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.sig(t) for t in batch["text"].to_pylist()]
        return batch.append_column("simhash", pa.array(sigs, pa.uint64()))


def simhash_pairs(ds: "ray.data.Dataset", max_hamming: int = 3,
                  id_col: str = "doc_id") -> "ray.data.Dataset":
    """Banded blocking on 4×16-bit chunks (any pair within Hamming ≤ 3 shares
    at least one exact 16-bit band), then exact Hamming verify per bucket."""
    sigs = ds.select_columns([id_col, "text"]).map_batches(
        SimHasher, batch_format="pyarrow", concurrency=4)

    def explode(batch: pa.Table) -> pa.Table:
        ids, bands, keys, full = [], [], [], []
        for i in range(batch.num_rows):
            s = batch["simhash"][i].as_py()
            doc = batch[id_col][i].as_py()
            for b in range(4):
                ids.append(doc)
                bands.append(b)
                keys.append((s >> (16 * b)) & 0xFFFF)
                full.append(s)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "band": pa.array(bands, pa.int32()),
                         "key": pa.array(keys, pa.int32()),
                         "sig": pa.array(full, pa.uint64())})

    def bucket_pairs(group: pa.Table) -> pa.Table:
        rows = sorted(zip(group[id_col].to_pylist(), group["sig"].to_pylist()))
        a, b, d = [], [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                if rows[i][0] == rows[j][0]:
                    continue
                ham = bin(rows[i][1] ^ rows[j][1]).count("1")
                if ham <= max_hamming:
                    a.append(rows[i][0])
                    b.append(rows[j][0])
                    d.append(ham)
        return pa.table({"id_a": pa.array(a, pa.int64()),
                         "id_b": pa.array(b, pa.int64()),
                         "hamming": pa.array(d, pa.int32())})

    return (
        sigs.map_batches(explode, batch_format="pyarrow")
        .groupby(["band", "key"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .groupby(["id_a", "id_b"])
        .aggregate(Min("hamming", alias_name="hamming"))
    )


# ----------------------------------------------------------- embedding near-dup


def embedding_dup_pairs(ds: "ray.data.Dataset", threshold: float = 0.95,
                        id_col: str = "vec_id",
                        emb_col: str = "embedding") -> "ray.data.Dataset":
    """Cosine near-dup: normalized matrix broadcast once; per batch one matmul
    against it; emit pairs (a < b) above threshold."""
    rows = ds.select_columns([id_col, emb_col]).take_all()
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    mat = np.array([r[emb_col] for r in rows], dtype=np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, mat))

    def pairs(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(ref)
        bids = batch[id_col].to_numpy(zero_copy_only=False)
        bmat = np.array(batch[emb_col].to_pylist(), dtype=np.float64)
        bmat /= np.maximum(np.linalg.norm(bmat, axis=1, keepdims=True), 1e-12)
        sims = bmat @ all_mat.T  # vectorized cosine block
        out_a, out_b, out_s = [], [], []
        for i in range(len(bids)):
            hits = np.flatnonzero(sims[i] >= threshold)
            for j in hits:
                if bids[i] < all_ids[j]:  # a < b, self-pairs excluded
                    out_a.append(int(bids[i]))
                    out_b.append(int(all_ids[j]))
                    out_s.append(round(float(sims[i, j]), 6))
        return pa.table({"id_a": pa.array(out_a, pa.int64()),
                         "id_b": pa.array(out_b, pa.int64()),
                         "cosine": pa.array(out_s, pa.float64())})

    return ds.map_batches(pairs, batch_format="pyarrow")
