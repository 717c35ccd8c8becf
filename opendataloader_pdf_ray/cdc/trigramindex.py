"""Trigram substring index — "grep the lake" as an indexed serving read.

The fourth follower keyspace (follower.py: textidx tokens, vecidx
hyperplane buckets, colidx values, rangeidx buckets): character trigram →
posting set over LIVE lowercased text, maintained incrementally with the
same pre-image diff discipline (an update retracts the grams it dropped,
emits the grams it gained — delta volume scales with churned text, not
corpus size).

Query model (pg_trgm's): a substring query of length ≥ 3 decomposes into
its trigrams; a key can contain the substring only if it holds EVERY
trigram, so candidates = the AND-intersection of the probed posting sets
— ``O(|query grams|)`` index-partition reads at any index size — and a
VERIFY step re-checks the actual substring against the lake rows
(trigram containment is necessary, not sufficient: the grams may be
non-contiguous). Verification is hash-routed by url, so it reads only
the candidate keys' partitions.

Scale note (the honest cost): posting volume is the count of DISTINCT
trigrams per doc (~min(text_len, 26³+) rows per version) — the standard
trigram-index trade (PostgreSQL pg_trgm makes the same one). The diffs
are slim (3-byte gram + key), one shuffle per refresh, and queries never
scan the corpus.

Queries shorter than 3 chars are refused (no selective gram exists —
falling back to a full scan would hide a 10^5× cost cliff, the
planner.py rule).

Reference parity: no counterpart (single-corpus converter); this is the
substring analog of the token index, SURVEY §2.9's "shared mutable
index" shape on storage-backed follower state.
"""

from __future__ import annotations

import posixpath
from typing import Dict, List, Optional, Set

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .follower import (FollowerIndex, HELPER_COL, column_or_nulls,
                       follower_epoch_candidates, read_identity_partition)
from .ingest import url_partition
from .lake import Lake
from ..functions.sketches import md5_number_lower


def substr_index_root(lake_root: str) -> str:
    """Conventional location: ``<lake>/trgmidx`` (same in-lake placement
    rationale as every other index keyspace)."""
    return posixpath.join(lake_root, "trgmidx")


POSTING_SCHEMA = pa.schema([
    ("gram", pa.string()),
    ("key", pa.string()),
    ("epoch", pa.int64()),
    ("sign", pa.int8()),
])

_IDENTITY = ("gram", "key")


def trigrams(text: Optional[str]) -> Set[str]:
    """Distinct character trigrams of the LOWERCASED text (matching is
    case-insensitive, like the token index). Texts shorter than 3 chars
    contribute nothing."""
    if not text:
        return set()
    t = text.lower()
    return {t[i:i + 3] for i in range(len(t) - 2)}


def gram_partition(grams: List[str], num_partitions: int) -> np.ndarray:
    """gram → index partition via md5 (process-independent, probe-side
    identical — the tok_partition rule)."""
    return np.array([md5_number_lower(g) % num_partitions for g in grams],
                    np.int32)


class _EmitGramDeltas:
    """map_batches(..., batch_size=1) over LAKE partition ids: gram-set
    diff per changed key with the pre-image discipline (textindex.py's
    emitter with trigram profiles instead of token counts)."""

    __name__ = "_EmitGramDeltas"

    def __init__(self, lake_root: str, lake_partitions: Optional[int],
                 since: int, up_to: int, key_col: str, text_col: str,
                 num_idx_partitions: int):
        self.lake_root, self.lake_partitions = lake_root, lake_partitions
        self.since, self.up_to = since, up_to
        self.key_col, self.text_col = key_col, text_col
        self.num_idx_partitions = num_idx_partitions

    def __call__(self, batch: pa.Table) -> pa.Table:
        lake = Lake(self.lake_root, self.lake_partitions)
        out: List[pa.Table] = []
        for part in batch["part"].to_pylist():
            out.extend(self._one(lake, int(part)))
        if not out:
            return POSTING_SCHEMA.empty_table().append_column(
                HELPER_COL, pa.array([], pa.int32()))
        return pa.concat_tables(out)

    def _live_text(self, state: Optional[pa.Table]) -> Dict[str, str]:
        if state is None or state.num_rows == 0:
            return {}
        dead = pc.fill_null(state["deleted"], False).to_numpy(
            zero_copy_only=False)
        keys = state[self.key_col].to_numpy(zero_copy_only=False)
        texts = column_or_nulls(state, self.text_col)
        return {k: t for k, t, d in zip(keys, texts, dead) if not d}

    def _one(self, lake: Lake, part: int) -> List[pa.Table]:
        epochs = [e for e in lake.committed_epochs(part)
                  if self.since < e <= self.up_to]
        if not epochs:
            return []
        state = lake.read_partition(part, as_of=self.since)
        live = self._live_text(state)
        out: List[pa.Table] = []
        for e in epochs:
            winners, state = follower_epoch_candidates(lake, part, e, state)
            grams, keys, signs = [], [], []
            w_keys = winners[self.key_col].to_numpy(zero_copy_only=False)
            w_texts = column_or_nulls(winners, self.text_col)
            w_dead = (pc.fill_null(winners["deleted"], False).to_numpy(
                zero_copy_only=False) if "deleted" in winners.column_names
                else np.zeros(len(w_keys), bool))
            for k, t, d in zip(w_keys, w_texts, w_dead):
                old = trigrams(live.get(k))
                new = set() if d else trigrams(t)
                for g in sorted(old ^ new):  # symmetric diff only
                    grams.append(g)
                    keys.append(k)
                    signs.append(1 if g in new else -1)
            if grams:
                t = pa.table({
                    "gram": pa.array(grams, pa.string()),
                    "key": pa.array(keys, pa.string()),
                    "epoch": pa.array(np.full(len(grams), e, np.int64)),
                    "sign": pa.array(np.array(signs, np.int8)),
                })
                out.append(t.append_column(
                    HELPER_COL,
                    pa.array(gram_partition(grams,
                                            self.num_idx_partitions))))
            live = self._live_text(state)
        return out


class SubstringIndex(FollowerIndex):
    """Trigram → key posting keyspace over a Lake root (module docstring).
    ``root`` is the INDEX root — conventionally ``<lake>/trgmidx``."""

    POSTING_SCHEMA = POSTING_SCHEMA
    IDENTITY = _IDENTITY

    def __init__(self, root: str, num_partitions: Optional[int] = None,
                 key_col: str = "url", text_col: str = "text"):
        super().__init__(root, num_partitions)
        self.key_col, self.text_col = key_col, text_col
        self._extra_init = {"key_col": key_col, "text_col": text_col}

    def make_emitter(self, lake: Lake, since: int, up_to: int):
        return _EmitGramDeltas(lake.root, lake.num_partitions, since, up_to,
                               self.key_col, self.text_col,
                               self.num_partitions)

    # ----------------------------------------------------------- candidates
    def _query_grams(self, needle: str) -> List[str]:
        if len(needle) < 3:
            raise ValueError(
                f"substring query needs >= 3 chars (got {needle!r}): no "
                f"selective trigram exists, and a full-scan fallback would "
                f"hide the cost cliff — filter lake.read_dataset() instead")
        return sorted(trigrams(needle))

    def candidates_local(self, needle: str,
                         as_of: Optional[int] = None) -> List[str]:
        """AND-intersection of the needle's trigram posting sets —
        in-process serving read, ``O(|grams|)`` partition folds. Returns
        candidate keys (substring NOT yet verified)."""
        grams = self._query_grams(needle)
        gram_set = pa.array(grams, pa.string())
        surviving: Optional[Set[str]] = None
        by_part: Dict[int, List[str]] = {}
        for g, p in zip(grams, gram_partition(grams, self.num_partitions)):
            by_part.setdefault(int(p), []).append(g)
        for part, part_grams in sorted(by_part.items()):
            t = self.read_partition(part, as_of=as_of)
            if t is None or t.num_rows == 0:
                return []
            live = t.filter(pc.and_(
                pc.is_in(t["gram"], value_set=gram_set),
                pc.greater(t["sign"], 0)))
            gs = live["gram"].to_numpy(zero_copy_only=False)
            ks = live["key"].to_numpy(zero_copy_only=False)
            for g in part_grams:
                keys = set(ks[gs == g])
                surviving = keys if surviving is None else surviving & keys
                if not surviving:
                    return []
        return sorted(surviving or [])

    def contains_local(self, lake: Lake, needle: str,
                       as_of: Optional[int] = None,
                       rows: bool = False):
        """Verified substring lookup, in-process: candidates from the
        index, then the actual (lowercased) substring re-checked against
        the candidates' LIVE lake rows — hash-routed, so only the
        candidate keys' partitions are read. Returns sorted keys, or the
        matching rows when ``rows=True``."""
        cand = self.candidates_local(needle, as_of=as_of)
        if not cand:
            return [] if not rows else None
        low = needle.lower()
        by_part: Dict[int, List[str]] = {}
        for k, p in zip(cand, url_partition(cand, lake.num_partitions)):
            by_part.setdefault(int(p), []).append(k)
        hits: List[pa.Table] = []
        for part, keys in sorted(by_part.items()):
            t = lake.read_partition(part, as_of=as_of)
            if t is None or t.num_rows == 0:
                continue
            t = t.filter(pc.and_(
                pc.invert(pc.fill_null(t["deleted"], False)),
                pc.is_in(t[self.key_col], value_set=pa.array(keys))))
            if not t.num_rows:
                continue
            texts = column_or_nulls(t, self.text_col)
            mask = np.array([bool(x) and low in x.lower() for x in texts])
            if mask.any():
                hits.append(t.filter(pa.array(mask)))
        if rows:
            return pa.concat_tables(hits).sort_by(
                [(self.key_col, "ascending")]) if hits else None
        out: List[str] = []
        for h in hits:
            out.extend(h[self.key_col].to_pylist())
        return sorted(out)

    def contains(self, lake: Lake, needle: str,
                 as_of: Optional[int] = None):
        """Distributed verified substring lookup: probe-partition reads
        emit (gram, key) postings, a key groupby keeps keys holding ALL
        grams (AND), and a hash-routed verify stage re-checks the substring
        against the live lake rows — posting lists and candidates never
        land on the driver. Returns a Ray Dataset of (key) rows."""
        import ray.data as _rd

        grams = self._query_grams(needle)
        n_grams = len(grams)
        gram_set_vals = grams
        parts = sorted({int(p) for p in
                        gram_partition(grams, self.num_partitions)})
        idx_root, idx_n = self.lake.root, self.num_partitions
        key_col, text_col = self.key_col, self.text_col
        lake_root, lake_n = lake.root, lake.num_partitions
        low = needle.lower()
        post_schema = pa.schema([("key", pa.string())])

        def read_part(batch: pa.Table) -> pa.Table:
            idx = Lake(idx_root, idx_n)
            out: List[pa.Table] = []
            for part in batch["part"].to_pylist():
                t = read_identity_partition(idx, int(part), _IDENTITY,
                                            as_of=as_of)
                if t is None or t.num_rows == 0:
                    continue
                hit = t.filter(pc.and_(
                    pc.is_in(t["gram"],
                             value_set=pa.array(gram_set_vals, pa.string())),
                    pc.greater(t["sign"], 0)))
                if hit.num_rows:
                    out.append(pa.table({"key": hit["key"]}))
            if not out:
                return post_schema.empty_table()
            return pa.concat_tables(out)

        def combine_counts(batch: pa.Table) -> pa.Table:
            # pre-reduce (gram,key) postings to per-key counts per block
            keys = batch["key"].to_numpy(zero_copy_only=False)
            uniq, counts = np.unique(keys, return_counts=True)
            return pa.table({"key": pa.array(uniq, pa.string()),
                             "n": pa.array(counts.astype(np.int64))})

        def to_lake_parts(batch: pa.Table) -> pa.Table:
            # postings are unique per (gram, key), so a key holding all
            # n_grams sums to exactly n_grams across the probe reads (AND)
            cand = batch.filter(
                pc.equal(batch["n"], pa.scalar(n_grams)))["key"] \
                .to_numpy(zero_copy_only=False)
            return pa.table({
                "key": pa.array(cand, pa.string()),
                "lake_part": pa.array(url_partition(cand, lake_n)
                                      if len(cand) else
                                      np.array([], np.int32), pa.int32()),
            })

        def verify(group: pa.Table) -> pa.Table:
            lk = Lake(lake_root, lake_n)
            part = int(group["lake_part"][0].as_py())
            t = lk.read_partition(part, as_of=as_of)
            if t is None or t.num_rows == 0:
                return post_schema.empty_table()
            t = t.filter(pc.and_(
                pc.invert(pc.fill_null(t["deleted"], False)),
                pc.is_in(t[key_col],
                         value_set=group["key"].combine_chunks())))
            if not t.num_rows:
                return post_schema.empty_table()
            texts = column_or_nulls(t, text_col)
            mask = np.array([bool(x) and low in x.lower() for x in texts])
            if not mask.any():
                return post_schema.empty_table()
            return pa.table({"key": t.filter(pa.array(mask))[key_col]})

        verify.__name__ = "verify_substring"
        if not parts:
            return _rd.from_arrow(post_schema.empty_table())
        from ray.data.aggregate import Sum as _Sum

        return (_rd.from_items([{"part": p} for p in parts])
                .map_batches(read_part, batch_format="pyarrow", batch_size=1)
                .map_batches(combine_counts, batch_format="pyarrow")
                .groupby("key")
                .aggregate(_Sum("n", alias_name="n"))
                .map_batches(to_lake_parts, batch_format="pyarrow")
                .groupby("lake_part")
                .map_groups(verify, batch_format="pyarrow"))
