"""Text-analysis operators for training-data pipelines: language ID, quality
scoring, token counting, fingerprinting.

All stateful setup (stopword tables, compiled regexes) happens once per actor
in ``__init__``; per-batch work is vectorized (pyarrow.compute / pandas str)."""

from __future__ import annotations

import hashlib
import re
from typing import Dict, List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# small, distinctive stopword sets per language (n-gram heuristic: score by
# hit counts of language-marker words)
_LANG_MARKERS: Dict[str, frozenset] = {
    "en": frozenset("the and of to in is that for with as on at by from this".split()),
    "de": frozenset("der die das und ist nicht mit für von auf ein eine zu".split()),
    "fr": frozenset("le la les et est pas pour dans une des que qui sur".split()),
    "es": frozenset("el la los las y es no por para con una del que".split()),
}
_CJK_RE = re.compile(r"[一-鿿]")
_TOKEN_RE = re.compile(r"\S+")
_WORD_RE = re.compile(r"[a-zA-Z]+")
_PUNCT_PATTERN = r"[.,!?;:]"


class LangId:
    """Marker-word language classifier (+ CJK codepoint check for zh).
    Deterministic; ties break by fixed language order."""

    ORDER = ["en", "de", "fr", "es"]

    def __init__(self):
        self.markers = _LANG_MARKERS
        self.word_re = _WORD_RE
        self.cjk_re = _CJK_RE

    def predict(self, text: str) -> str:
        if self.cjk_re.search(text):
            return "zh"
        words = [w.lower() for w in self.word_re.findall(text)]
        if not words:
            return "unknown"
        best_lang, best = "unknown", 0
        for lang in self.ORDER:
            score = sum(1 for w in words if w in self.markers[lang])
            if score > best:
                best_lang, best = lang, score
        return best_lang

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self.predict(t) for t in batch["text"].to_pylist()]
        return batch.append_column("pred_lang", pa.array(preds, pa.string()))


# BPE-style pre-tokenizer (GPT-2-shaped, lookahead-free so Python re, Arrow
# RE2 and DuckDB RE2 all agree — parity-tested): contraction suffixes, space-
# prefixed letter/digit/punct runs, whitespace runs
BPE_TOKEN_PATTERN = (r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+"
                     r"| ?[^\sA-Za-z0-9']+|\s+")


def token_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Vectorized token/char/punct counting via Arrow kernels (SQL-parity:
    regexp_extract_all / regexp_replace in DuckDB). ``n_bpe_tokens`` is the
    BPE-ish pre-token count — the LLM-budget estimator the brief asks for."""
    text = batch[text_col]
    n_chars = pc.utf8_length(text)
    n_tokens = pc.count_substring_regex(text, pattern=r"\S+")
    n_punct = pc.count_substring_regex(text, pattern=_PUNCT_PATTERN)
    n_bpe = pc.count_substring_regex(text, pattern=BPE_TOKEN_PATTERN)
    return (
        batch.append_column("n_chars_c", n_chars.cast(pa.int64()))
        .append_column("n_tokens", n_tokens.cast(pa.int64()))
        .append_column("n_punct", n_punct.cast(pa.int64()))
        .append_column("n_bpe_tokens", n_bpe.cast(pa.int64()))
    )


def quality_score(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic quality features: mean token length, punct ratio, stopword
    ratio, all-caps ratio — the length/punct/stopword family of the brief."""
    texts = batch[text_col].to_pylist()
    stop = _LANG_MARKERS["en"]
    mean_tok_len = np.zeros(len(texts))
    stop_ratio = np.zeros(len(texts))
    for i, t in enumerate(texts):
        toks = _TOKEN_RE.findall(t) if t else []  # null-safe: tombstone rows
        if toks:
            mean_tok_len[i] = sum(map(len, toks)) / len(toks)
            stop_ratio[i] = sum(1 for w in toks if w.lower() in stop) / len(toks)
    n_chars = pc.utf8_length(batch[text_col]).cast(pa.float64()).to_numpy(zero_copy_only=False)
    n_punct = pc.count_substring_regex(batch[text_col], pattern=_PUNCT_PATTERN) \
                .cast(pa.float64()).to_numpy(zero_copy_only=False)
    punct_ratio = np.divide(n_punct, n_chars, out=np.zeros_like(n_punct),
                            where=n_chars > 0)
    return (
        batch.append_column("mean_token_len", pa.array(mean_tok_len))
        .append_column("stopword_ratio", pa.array(stop_ratio))
        .append_column("punct_ratio", pa.array(punct_ratio))
    )


_EMBED_TOK_RE = re.compile(r"\w+")


def embed_text(batch: pa.Table, text_col: str = "text",
               vec_col: str = "vec", dim: int = 32) -> pa.Table:
    """Hashing-trick text embedding (signed feature hashing onto token
    buckets): token → bucket ``md5_number_lower(tok) % dim``, sign from the
    next hash bit ``(h // dim) % 2``, value = signed token count, packed
    float32-LE (counts ≪ 2^24 so the packing is exact). Deterministic and
    model-free — the stand-in embedding model for the CDC
    embed-backfill → ANN-index loop — and SQL-mirrorable bit-for-bit via
    DuckDB ``md5_number_lower`` (the hash-oracle trick). Tokenization is
    the text index's ``\\w+``-over-lower pattern. Null/tombstone text →
    null vec. Vectorized: md5 runs once per DISTINCT token per batch."""
    from .sketches import md5_number_lower

    texts = batch[text_col].to_pylist() if text_col in batch.column_names \
        else [None] * batch.num_rows
    toks_per_row = [None if t is None else _EMBED_TOK_RE.findall(t.lower())
                    for t in texts]
    all_toks = [tok for toks in toks_per_row if toks for tok in toks]
    vecs: List = []
    if all_toks:
        ut, inv = np.unique(np.asarray(all_toks, dtype=object),
                            return_inverse=True)
        h = np.array([md5_number_lower(t) for t in ut], dtype=np.uint64)
        bucket = (h % np.uint64(dim)).astype(np.int64)
        sign = np.where((h // np.uint64(dim)) % np.uint64(2) == 0,
                        1.0, -1.0)
        pos = 0
        for toks in toks_per_row:
            if toks is None:
                vecs.append(None)
                continue
            v = np.zeros(dim, np.float64)
            if toks:
                idx = inv[pos:pos + len(toks)]
                np.add.at(v, bucket[idx], sign[idx])
                pos += len(toks)
            vecs.append(np.asarray(v, "<f4").tobytes())
    else:
        zero = np.zeros(dim, "<f4").tobytes()
        vecs = [None if t is None else zero for t in texts]
    if vec_col in batch.column_names:  # re-embed: replace, don't duplicate
        batch = batch.drop_columns([vec_col])
    return batch.append_column(vec_col, pa.array(vecs, pa.binary()))


def md5_fingerprint(batch: pa.Table, text_col: str = "text",
                    out_col: str = "fp") -> pa.Table:
    fps = [hashlib.md5(t.encode("utf-8")).hexdigest()
           for t in batch[text_col].to_pylist()]
    return batch.append_column(out_col, pa.array(fps, pa.string()))


def rolling_fingerprint(text: str, window: int = 16,
                        mod: int = (1 << 61) - 1, base: int = 257) -> int:
    """Deterministic polynomial rolling hash over the whole document: the
    winnowing-style document fingerprint (min of window hashes)."""
    data = text.encode("utf-8")
    if len(data) < window:
        h = 0
        for b in data:
            h = (h * base + b) % mod
        return h
    pw = pow(base, window - 1, mod)
    h = 0
    for b in data[:window]:
        h = (h * base + b) % mod
    best = h
    for i in range(window, len(data)):
        h = ((h - data[i - window] * pw) * base + data[i]) % mod
        if h < best:
            best = h
    return best


class WinnowFingerprinter:
    """Full winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
    "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003):
    word n-gram hashes → per window of ``w`` consecutive hashes select the
    RIGHTMOST minimum → the deduped (position, hash) set is the document's
    fingerprint. Guarantees every match of length ≥ w+n-1 words shares a
    fingerprint between documents.

    The gram hash is md5 low-8-bytes little-endian — DuckDB's
    ``md5_number_lower`` — so the SQL oracle recomputes every selected
    fingerprint exactly (same design as SimHasher). Stateful: the gram-hash
    cache amortizes across batches per actor."""

    def __init__(self, ngram: int = 3, window: int = 4,
                 id_col: str = "doc_id", text_col: str = "text"):
        from .dedup import word_ngrams

        self._word_ngrams = word_ngrams
        self.ngram = ngram
        self.window = window
        self.id_col = id_col
        self.text_col = text_col
        self._cache: Dict[str, int] = {}

    def _hashes(self, text: str) -> np.ndarray:
        grams = self._word_ngrams(text, self.ngram)
        if not grams:
            return np.zeros(0, dtype=np.uint64)
        cache = self._cache
        if len(cache) > 4_000_000:
            cache.clear()
        out = np.empty(len(grams), dtype=np.uint64)
        for i, gm in enumerate(grams):
            h = cache.get(gm)
            if h is None:
                h = int.from_bytes(
                    hashlib.md5(gm.encode("utf-8")).digest()[8:], "little")
                cache[gm] = h
            out[i] = h
        return out

    def select(self, text: str) -> tuple:
        """(positions, hashes) of the winnowed fingerprints, position-sorted."""
        h = self._hashes(text)
        n = len(h)
        if n == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.uint64)
        w = min(self.window, n)
        # rightmost-min per window: argmin over the reversed window
        view = np.lib.stride_tricks.sliding_window_view(h, w)[:, ::-1]
        right_arg = (w - 1) - view.argmin(axis=1)
        pos = np.arange(len(view), dtype=np.int64) + right_arg
        keep = np.unique(pos)
        return keep, h[keep]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out: List[int] = []
        pos_out: List[np.ndarray] = []
        fp_out: List[np.ndarray] = []
        ids = batch[self.id_col].to_pylist()
        for did, text in zip(ids, batch[self.text_col].to_pylist()):
            pos, fps = self.select(text)
            ids_out.extend([did] * len(pos))
            pos_out.append(pos)
            fp_out.append(fps)
        pos_all = np.concatenate(pos_out) if pos_out else np.zeros(0, np.int64)
        fp_all = np.concatenate(fp_out) if fp_out else np.zeros(0, np.uint64)
        return pa.table({self.id_col: pa.array(ids_out, pa.int64()),
                         "pos": pa.array(pos_all, pa.int64()),
                         "fp": pa.array(fp_all, pa.uint64())})
