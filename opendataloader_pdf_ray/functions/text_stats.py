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


def token_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Vectorized token/char/punct counting via Arrow kernels (SQL-parity:
    regexp_extract_all / regexp_replace in DuckDB)."""
    text = batch[text_col]
    n_chars = pc.utf8_length(text)
    n_tokens = pc.count_substring_regex(text, pattern=r"\S+")
    n_punct = pc.count_substring_regex(text, pattern=_PUNCT_PATTERN)
    return (
        batch.append_column("n_chars_c", n_chars.cast(pa.int64()))
        .append_column("n_tokens", n_tokens.cast(pa.int64()))
        .append_column("n_punct", n_punct.cast(pa.int64()))
    )


def quality_score(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic quality features: mean token length, punct ratio, stopword
    ratio, all-caps ratio — the length/punct/stopword family of the brief."""
    texts = batch[text_col].to_pylist()
    stop = _LANG_MARKERS["en"]
    mean_tok_len = np.zeros(len(texts))
    stop_ratio = np.zeros(len(texts))
    for i, t in enumerate(texts):
        toks = _TOKEN_RE.findall(t)
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
