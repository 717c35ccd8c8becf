"""Inverted full-text index over the lake, maintained incrementally.

The third lake-integrated index keyspace (after the exact-fingerprint
FWW index, dupindex.py, and the SimHash band index, neardup.py), and the
first MULTI-VALUED one: token → posting set, where a key's postings must
RETRACT when a new content version drops tokens — the retract/apply
discipline of incremental view maintenance (cdc/views.py) applied to a
set-valued index instead of an aggregate. This is the "shared mutable
index" shape the brief calls out; it needs no actor holding state —
consistent hash partitioning of the token keyspace plus the lake's
idempotent ``(part, epoch)`` commit protocol give the same semantics with
storage-backed, crash-resumable state.

The storage/fold/maintenance/compact/purge protocol is the generic
follower-index machinery (follower.py — extracted from this module when
the vector index arrived); what is text-specific here is the DIFF
emitter (token-set old→new per changed key: unchanged tokens emit
nothing, so delta volume scales with churn, not corpus size) and
``search`` (probe tokens hash to their partitions — ``O(|probes|)``
partition reads at any index size, each task folds ITS partition once
and filters to the probe set; returns a Ray Dataset so common-token
posting lists never land on the driver).

Tokenization is ``\\w+`` over lowercased text — the corpus queries'
SQL-mirrorable pattern (DuckDB ``regexp_extract_all(lower(text), '\\w+')``),
which is what lets the driver query carry a bit-exact oracle.
"""

from __future__ import annotations

import posixpath
import re
from typing import Dict, List, Optional, Set

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .follower import (FollowerIndex, HELPER_COL, column_or_nulls,
                       follower_epoch_candidates, latest_per_identity,
                       read_identity_partition)
from .lake import Lake
from ..functions.sketches import md5_number_lower


def text_index_root(lake_root: str) -> str:
    """Conventional location of a lake's text index (a sub-directory the
    lake's own partition globbing and fsck never descend into — the same
    convention as ``dup_index_root``/``near_index_root``)."""
    return posixpath.join(lake_root, "textidx")

POSTING_SCHEMA = pa.schema([
    ("tok", pa.string()),
    ("key", pa.string()),
    ("epoch", pa.int64()),
    ("sign", pa.int8()),
    ("tf", pa.int32()),  # term frequency in the key's live text — carried
                         # for ranked retrieval; set-membership consumers
                         # (search) ignore it. Indexes built before this
                         # column fold with tf=null (ranked treats as 1).
    ("pos", pa.binary()),  # OPTIONAL token positions (packed uint32 LE,
                           # len == 4·tf) for phrase search — only when the
                           # index is built with positional=True; null
                           # otherwise (the ~4B/occurrence cost is the
                           # standard positional-index trade, opt-in).
])

_IDENTITY = ("tok", "key")


def tok_partition(toks: List[str], num_partitions: int) -> np.ndarray:
    """token → index partition via ``md5_number_lower(tok) % P`` — the same
    process-independent hash the probe side uses, so search prunes to
    exactly the partitions that can hold a token."""
    return np.array([md5_number_lower(t) % num_partitions for t in toks],
                    np.int32)


def latest_per_tok_key(table: pa.Table) -> pa.Table:
    """Keep the max-epoch row per (tok, key) — the posting fold (the
    generic identity fold over this index's identity columns)."""
    return latest_per_identity(table, _IDENTITY)


def read_posting_partition(lake: Lake, part: int,
                           as_of: Optional[int] = None
                           ) -> Optional[pa.Table]:
    """Merge-on-read for one token partition (generic identity fold)."""
    return read_identity_partition(lake, part, _IDENTITY, as_of=as_of)


class _EmitTokenDeltas:
    """map_batches(..., batch_size=1) over LAKE partition ids: fold epochs
    ``(since, up_to]`` with the change feed's pre-image discipline and emit
    token-set DIFF rows. Memory bound = one lake partition's live state per
    task (the same bound the change feed and every partition fold carries).
    """

    __name__ = "_EmitTokenDeltas"

    def __init__(self, lake_root: str, lake_partitions: Optional[int],
                 since: int, up_to: int, key_col: str, text_col: str,
                 token_pattern: str, num_idx_partitions: int,
                 positional: bool = False):
        self.lake_root, self.lake_partitions = lake_root, lake_partitions
        self.since, self.up_to = since, up_to
        self.key_col, self.text_col = key_col, text_col
        self.token_pattern = token_pattern
        self.num_idx_partitions = num_idx_partitions
        self.positional = positional

    def __call__(self, batch: pa.Table) -> pa.Table:
        lake = Lake(self.lake_root, self.lake_partitions)
        tok_re = re.compile(self.token_pattern)
        out: List[pa.Table] = []
        for part in batch["part"].to_pylist():
            out.extend(self._one(lake, int(part), tok_re))
        if not out:
            return POSTING_SCHEMA.empty_table().append_column(
                HELPER_COL, pa.array([], pa.int32()))
        return pa.concat_tables(out)

    def _tokens(self, text: Optional[str], tok_re) -> Set[str]:
        return set(tok_re.findall(text.lower())) if text else set()

    def _counts(self, text: Optional[str], tok_re) -> Dict[str, int]:
        if not text:
            return {}
        from collections import Counter

        return Counter(tok_re.findall(text.lower()))

    def _profile(self, text: Optional[str], tok_re) -> Dict:
        """Per-token diff unit: count (int) in count mode, packed uint32-LE
        positions (bytes) in positional mode — inequality IS the emit
        rule either way. Positional is strictly finer: an edit that shifts
        positions re-emits shifted tokens even at equal tf (the inherent
        positional-index update cost); unchanged-prefix tokens still skip."""
        if not self.positional:
            return self._counts(text, tok_re)
        if not text:
            return {}
        pos: Dict[str, List[int]] = {}
        for i, tok in enumerate(tok_re.findall(text.lower())):
            pos.setdefault(tok, []).append(i)
        return {tok: np.asarray(p, "<u4").tobytes()
                for tok, p in pos.items()}

    def _live_text(self, state: Optional[pa.Table]) -> Dict[str, str]:
        if state is None or state.num_rows == 0:
            return {}
        dead = pc.fill_null(state["deleted"], False).to_numpy(
            zero_copy_only=False)
        keys = state[self.key_col].to_numpy(zero_copy_only=False)
        texts = column_or_nulls(state, self.text_col)
        return {k: t for k, t, d in zip(keys, texts, dead) if not d}

    def _one(self, lake: Lake, part: int, tok_re) -> List[pa.Table]:
        epochs = [e for e in lake.committed_epochs(part)
                  if self.since < e <= self.up_to]
        if not epochs:
            return []
        state = lake.read_partition(part, as_of=self.since)
        live = self._live_text(state)
        out: List[pa.Table] = []
        for e in epochs:
            winners, state = follower_epoch_candidates(lake, part, e, state)
            toks, keys, signs, tfs, poss = [], [], [], [], []
            w_keys = winners[self.key_col].to_numpy(zero_copy_only=False)
            w_texts = column_or_nulls(winners, self.text_col)
            w_dead = (pc.fill_null(winners["deleted"], False).to_numpy(
                zero_copy_only=False) if "deleted" in winners.column_names
                else np.zeros(len(w_keys), bool))
            for k, t, d in zip(w_keys, w_texts, w_dead):
                # COUNT diff (or POSITION diff when positional), not set
                # diff: a count-only change (token kept, tf moved)
                # re-applies with the new tf so ranked retrieval stays
                # fresh; set membership is unchanged. Delta volume still
                # scales with churned tokens only.
                old = self._profile(live.get(k), tok_re)
                new = {} if d else self._profile(t, tok_re)
                for tok in sorted(set(old) | set(new)):
                    o, nw = old.get(tok), new.get(tok)
                    if nw == o:
                        continue
                    toks.append(tok); keys.append(k)
                    signs.append(1 if nw is not None else -1)
                    if self.positional:
                        tfs.append(0 if nw is None else len(nw) // 4)
                        poss.append(nw)
                    else:
                        tfs.append(nw or 0)
                        poss.append(None)
            if toks:
                t = pa.table({
                    "tok": pa.array(toks, pa.string()),
                    "key": pa.array(keys, pa.string()),
                    "epoch": pa.array(np.full(len(toks), e, np.int64)),
                    "sign": pa.array(np.array(signs, np.int8)),
                    "tf": pa.array(np.array(tfs, np.int32)),
                    "pos": pa.array(poss, pa.binary()),
                })
                out.append(t.append_column(
                    HELPER_COL,
                    pa.array(tok_partition(toks, self.num_idx_partitions))))
            # state already advanced to this epoch's post-image
            live = self._live_text(state)
        return out


class TextIndex(FollowerIndex):
    """Inverted token→postings keyspace over a Lake root (module docstring).

    ``root`` is the INDEX root — conventionally ``<lake>/textidx``. The
    indexed lake is passed to :meth:`refresh`, never stored: the index is a
    durable consumer, restartable anywhere the lake is reachable."""

    POSTING_SCHEMA = POSTING_SCHEMA
    IDENTITY = _IDENTITY

    def __init__(self, root: str, num_partitions: Optional[int] = None,
                 key_col: str = "url", text_col: str = "text",
                 token_pattern: str = r"\w+",
                 positional: Optional[bool] = None):
        super().__init__(root, num_partitions)
        self.key_col, self.text_col = key_col, text_col
        self.token_pattern = token_pattern
        # positional is INDEX-persistent config (a count-mode refresh into
        # a positional index would silently break phrase semantics): the
        # stored choice wins on reopen; a conflicting explicit request
        # fails loudly. Persisted at first refresh, never on read-only
        # opens (constructing over a missing index stays side-effect-free).
        stored = self._stored_config()
        if stored is not None and positional is not None \
                and bool(stored.get("positional")) != positional:
            raise ValueError(
                f"index at {root} was built with "
                f"positional={stored.get('positional')}; refusing "
                f"positional={positional} (rebuild the index to switch)")
        self.positional = (bool(stored.get("positional")) if stored
                           is not None else bool(positional))
        self._extra_init = {"key_col": key_col, "text_col": text_col,
                            "token_pattern": token_pattern,
                            "positional": self.positional}

    def _config_path(self) -> str:
        return posixpath.join(self.lake._commits_dir(), "textidx.json")

    def _stored_config(self) -> Optional[dict]:
        import json as _json

        if not self.lake.fs.exists(self._config_path()):
            return None
        with self.lake.fs.open(self._config_path(), "rb") as f:
            return _json.loads(f.read().decode())

    def refresh(self, lake: Lake, up_to: Optional[int] = None):
        import json as _json

        if self._stored_config() is None:
            self.lake._write_small_atomic(
                self._config_path(),
                _json.dumps({"positional": self.positional}).encode())
        return super().refresh(lake, up_to)

    def make_emitter(self, lake: Lake, since: int, up_to: int):
        return _EmitTokenDeltas(lake.root, lake.num_partitions, since,
                                up_to, self.key_col, self.text_col,
                                self.token_pattern, self.num_partitions,
                                positional=self.positional)

    # ------------------------------------------------------------- search
    def search(self, tokens: List[str], as_of: Optional[int] = None):
        """Keys whose live text contains each probe token: a Ray Dataset of
        (token, key) rows — one read task per DISTINCT probe partition
        (``O(|probes|)`` partition reads at any index size); posting lists
        for common tokens stream as blocks, never through the driver."""
        import ray.data as _rd

        probes = sorted(set(tokens))
        parts = sorted({int(p) for p in
                        tok_partition(probes, self.num_partitions)})
        root, n = self.lake.root, self.num_partitions
        out_schema = pa.schema([("token", pa.string()),
                                ("key", pa.string())])
        probe_set = pa.array(probes, pa.string())

        def read_part(batch: pa.Table) -> pa.Table:
            lake = Lake(root, n)
            out: List[pa.Table] = []
            for part in batch["part"].to_pylist():
                t = read_posting_partition(lake, int(part), as_of=as_of)
                if t is None or t.num_rows == 0:
                    continue
                mask = pc.and_(pc.is_in(t["tok"], value_set=probe_set),
                               pc.greater(t["sign"], 0))
                hit = t.filter(mask)
                if hit.num_rows:
                    out.append(pa.table({"token": hit["tok"],
                                         "key": hit["key"]}))
            if not out:
                return out_schema.empty_table()
            return pa.concat_tables(out)

        if not parts:
            return _rd.from_arrow(out_schema.empty_table())
        return _rd.from_items([{"part": p} for p in parts]).map_batches(
            read_part, batch_format="pyarrow", batch_size=1)

    def search_local(self, tokens: List[str],
                     as_of: Optional[int] = None) -> pa.Table:
        """In-process point lookup (no Ray session): same probe-partition
        pruning as :meth:`search`, folded on the calling thread — the
        serving path for protocol servers / tooling that must not own a
        cluster. Returns (token, key) sorted; common-token posting lists DO
        land in this process, so batch analytics should use ``search``."""
        probes = sorted(set(tokens))
        probe_set = pa.array(probes, pa.string())
        parts = sorted({int(p) for p in
                        tok_partition(probes, self.num_partitions)})
        out: List[pa.Table] = []
        for part in parts:
            t = self.read_partition(part, as_of=as_of)
            if t is None or t.num_rows == 0:
                continue
            hit = t.filter(pc.and_(
                pc.is_in(t["tok"], value_set=probe_set),
                pc.greater(t["sign"], 0)))
            if hit.num_rows:
                out.append(pa.table({"token": hit["tok"],
                                     "key": hit["key"]}))
        empty = pa.schema([("token", pa.string()), ("key", pa.string())])
        if not out:
            return empty.empty_table()
        return pa.concat_tables(out).sort_by(
            [("token", "ascending"), ("key", "ascending")])

    # ------------------------------------------------------- ranked search
    SCORE_SCALE = 1 << 24

    @staticmethod
    def _partition_partials(t: Optional[pa.Table], probes: List[str]
                            ) -> Dict[str, int]:
        """Per-key partial scores for the probe tokens living in ONE index
        partition. A token's postings are entirely within its hash
        partition, so df(t) (live posting count) is exact here — no
        cross-partition exchange. Exact-integer weights
        ``W(t) = 2^24 // df(t)`` (same monotone-idf kernel as
        ``documents.doc_ranked_search``, minus the corpus-size factor that
        cancels in ranking); pre-tf-column postings score tf=1."""
        scores: Dict[str, int] = {}
        if t is None or t.num_rows == 0:
            return scores
        live = t.filter(pc.and_(
            pc.is_in(t["tok"], value_set=pa.array(probes, pa.string())),
            pc.greater(t["sign"], 0)))
        if not live.num_rows:
            return scores
        toks = live["tok"].to_numpy(zero_copy_only=False)
        keys = live["key"].to_numpy(zero_copy_only=False)
        tfs = column_or_nulls(live, "tf")
        utoks, counts = np.unique(toks, return_counts=True)
        w = {tok: TextIndex.SCORE_SCALE // int(df)
             for tok, df in zip(utoks, counts)}
        for tok, key, tf in zip(toks, keys, tfs):
            scores[key] = scores.get(key, 0) + \
                (1 if tf is None else int(tf)) * w[tok]
        return scores

    def ranked_search(self, tokens: List[str], k: int = 10,
                      as_of: Optional[int] = None):
        """Top-k keys by exact-integer tf-idf over the LIVE index — the
        ranked serving path (``search`` = boolean membership; this scores).
        Same ``O(|probed partitions|)`` read pruning: each probe partition
        folds once and emits per-key PARTIAL scores (bounded by its own
        posting lists), a key groupby sums partials across partitions, and
        sort+limit returns k rows. Ties break on key ascending."""
        import ray.data as _rd
        from ray.data.aggregate import Sum as _Sum

        probes = sorted(set(tokens))
        parts = sorted({int(p) for p in
                        tok_partition(probes, self.num_partitions)})
        root, n = self.lake.root, self.num_partitions
        out_schema = pa.schema([("key", pa.string()),
                                ("score", pa.int64())])

        def score_part(batch: pa.Table) -> pa.Table:
            lake = Lake(root, n)
            scores: Dict[str, int] = {}
            for part in batch["part"].to_pylist():
                t = read_posting_partition(lake, int(part), as_of=as_of)
                for key, s in TextIndex._partition_partials(
                        t, probes).items():
                    scores[key] = scores.get(key, 0) + s
            ks = sorted(scores)
            return pa.table({"key": pa.array(ks, pa.string()),
                             "score": pa.array([scores[x] for x in ks],
                                               pa.int64())})

        if not parts:
            return _rd.from_arrow(out_schema.empty_table())
        return (_rd.from_items([{"part": p} for p in parts])
                .map_batches(score_part, batch_format="pyarrow",
                             batch_size=1)
                .groupby("key")
                .aggregate(_Sum("score", alias_name="score"))
                .sort(["score", "key"], descending=[True, False])
                .limit(k))

    def ranked_search_local(self, tokens: List[str], k: int = 10,
                            as_of: Optional[int] = None) -> pa.Table:
        """In-process :meth:`ranked_search` (no Ray session) — the serving
        path for protocol servers / tooling."""
        probes = sorted(set(tokens))
        parts = sorted({int(p) for p in
                        tok_partition(probes, self.num_partitions)})
        scores: Dict[str, int] = {}
        for part in parts:
            t = self.read_partition(part, as_of=as_of)
            for key, s in self._partition_partials(t, probes).items():
                scores[key] = scores.get(key, 0) + s
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return pa.table({
            "key": pa.array([x for x, _ in top], pa.string()),
            "score": pa.array([s for _, s in top], pa.int64())})

    # -------------------------------------------------------- phrase search
    @staticmethod
    def _phrase_hits(posmap: Dict[str, Dict[str, bytes]],
                     phrase: List[str]) -> List[str]:
        """Keys whose positions contain the phrase tokens CONSECUTIVELY:
        start from token 0's positions, keep starts p where token j sits
        at p+j — the classic positional-index adjacency walk, vectorized
        per key. ``posmap``: tok → key → packed uint32 positions."""
        if not phrase:
            return []
        first = posmap.get(phrase[0], {})
        cands = set(first)
        for tok in phrase[1:]:
            cands &= set(posmap.get(tok, {}))
        hits = []
        for key in sorted(cands):
            cur = np.frombuffer(first[key], "<u4").astype(np.int64)
            for j, tok in enumerate(phrase[1:], 1):
                nxt = np.frombuffer(posmap[tok][key], "<u4").astype(np.int64)
                cur = cur[np.isin(cur + j, nxt)]
                if not cur.size:
                    break
            if cur.size:
                hits.append(key)
        return hits

    def _require_positional(self) -> None:
        if not self.positional:
            raise ValueError(
                f"index at {self.lake.root} carries no positions — build "
                "it with positional=True (text-index --positional) for "
                "phrase search")

    def phrase_search(self, phrase_tokens: List[str],
                      as_of: Optional[int] = None):
        """Keys whose LIVE text contains the exact token sequence — a Ray
        Dataset of (key) rows. Same ``O(|probed partitions|)`` pruning as
        :meth:`search`; partitions emit (tok, key, pos) rows bounded by the
        probe tokens' posting lists, a key groupby co-locates each
        candidate's positions, and the adjacency walk verifies per key."""
        import ray.data as _rd

        self._require_positional()
        phrase = [t.lower() for t in phrase_tokens]
        probes = sorted(set(phrase))
        parts = sorted({int(p) for p in
                        tok_partition(probes, self.num_partitions)})
        root, n = self.lake.root, self.num_partitions
        probe_set = pa.array(probes, pa.string())
        mid_schema = pa.schema([("tok", pa.string()), ("key", pa.string()),
                                ("pos", pa.binary())])
        out_schema = pa.schema([("key", pa.string())])

        def read_part(batch: pa.Table) -> pa.Table:
            lake = Lake(root, n)
            out: List[pa.Table] = []
            for part in batch["part"].to_pylist():
                t = read_posting_partition(lake, int(part), as_of=as_of)
                if t is None or t.num_rows == 0:
                    continue
                hit = t.filter(pc.and_(
                    pc.is_in(t["tok"], value_set=probe_set),
                    pc.greater(t["sign"], 0)))
                if hit.num_rows:
                    out.append(hit.select(["tok", "key", "pos"]))
            return (pa.concat_tables(out) if out
                    else mid_schema.empty_table())

        def verify(group: pa.Table) -> pa.Table:
            # one candidate key's postings for the probe tokens
            posmap: Dict[str, Dict[str, bytes]] = {}
            for tok, key, pos in zip(group["tok"].to_pylist(),
                                     group["key"].to_pylist(),
                                     group["pos"].to_pylist()):
                posmap.setdefault(tok, {})[key] = pos or b""
            return pa.table({"key": pa.array(
                TextIndex._phrase_hits(posmap, phrase), pa.string())})

        if not parts:
            return _rd.from_arrow(out_schema.empty_table())
        return (_rd.from_items([{"part": p} for p in parts])
                .map_batches(read_part, batch_format="pyarrow",
                             batch_size=1)
                .groupby("key")
                .map_groups(verify, batch_format="pyarrow"))

    def phrase_search_local(self, phrase_tokens: List[str],
                            as_of: Optional[int] = None) -> pa.Table:
        """In-process :meth:`phrase_search` (no Ray session) — the serving
        path; returns sorted (key) rows."""
        self._require_positional()
        phrase = [t.lower() for t in phrase_tokens]
        probes = sorted(set(phrase))
        probe_set = pa.array(probes, pa.string())
        parts = sorted({int(p) for p in
                        tok_partition(probes, self.num_partitions)})
        posmap: Dict[str, Dict[str, bytes]] = {}
        for part in parts:
            t = self.read_partition(part, as_of=as_of)
            if t is None or t.num_rows == 0:
                continue
            hit = t.filter(pc.and_(
                pc.is_in(t["tok"], value_set=probe_set),
                pc.greater(t["sign"], 0)))
            for tok, key, pos in zip(hit["tok"].to_pylist(),
                                     hit["key"].to_pylist(),
                                     hit["pos"].to_pylist()):
                posmap.setdefault(tok, {})[key] = pos or b""
        return pa.table({"key": pa.array(
            self._phrase_hits(posmap, phrase), pa.string())})
