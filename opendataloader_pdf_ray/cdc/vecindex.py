"""Vector (ANN) index over the lake, maintained incrementally.

The fourth lake-integrated index keyspace and the first GEOMETRIC one:
random-hyperplane bucket → posting set of (key, vector), kept in sync
with the lake by the same follower protocol as the inverted text index
(follower.py): per-epoch pre-image diffs, first-class retractions,
exactly-once (idx_part, epoch) commits, watermark resume, as-of time
travel, compaction pruning, purge scrubbing.

Reference behavior being re-expressed: the reference engine keeps
model-derived artifacts beside extracted content and re-serves them
incrementally (SURVEY.md §2.3/§2.9); at 100-TB webtext scale the artifact
a training-data pipeline actually needs is an embedding index that stays
fresh under CDC churn without ever rebuilding from scratch.

Design (what is vector-specific on top of follower.py):

- **bucketing**: seeded random-hyperplane signatures (the repo's
  ``HyperplaneLSH`` scheme, ``functions/similarity.py``) — ``nbits``
  sign-bits of ``planes @ v`` → bucket id; partition = ``bucket % P``.
  The planes are a pure function of ``(seed, nbits, dim)``, persisted in
  ``_vecconf.json`` at the index root so every refresh/search process
  regenerates identical geometry (no state shipped, no actor).
- **postings**: ``(bucket, key, epoch, sign, vec)`` where ``vec`` is the
  float32-LE packed vector (binary — list<> payloads don't survive
  shuffles/joins, CLAUDE.md pitfall). A key UPDATE whose vector moves
  buckets emits a retraction at the old bucket and an insert at the new
  one; an update that keeps the bucket re-emits (+1) with the new vector
  (latest-epoch fold replaces); an unchanged vector emits NOTHING, so
  delta volume scales with churn.
- **search**: query vectors bucket the same way; multi-probe = all
  buckets within Hamming ``probe_hamming`` of the query's signature
  (``bit_count(xor) <= h`` — the exact rule DuckDB mirrors with literal
  hyperplanes in the driver oracle, see ``knn_lsh_sql``). Only the
  partitions owning probed buckets are read — ``O(|probed buckets|)``
  partition reads at any index size; each task folds ITS partition once,
  scores candidates vectorized (normalize + matmul), and returns its
  local top-k under the total order (round(cosine,6) DESC, key ASC), so
  the driver merges ≤ parts × Q × k tiny rows.
"""

from __future__ import annotations

import json
import posixpath
from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .follower import (FollowerIndex, HELPER_COL, column_or_nulls,
                       follower_epoch_candidates)
from .lake import Lake


def vec_index_root(lake_root: str) -> str:
    """Conventional location of a lake's vector index (sibling of
    ``textidx``/``fpindex``/``nearidx``)."""
    return posixpath.join(lake_root, "vecidx")


POSTING_SCHEMA = pa.schema([
    ("bucket", pa.int64()),
    ("key", pa.string()),
    ("epoch", pa.int64()),
    ("sign", pa.int8()),
    ("vec", pa.binary()),
])

_IDENTITY = ("bucket", "key")


def pack_vector(vec: np.ndarray) -> bytes:
    """float32-LE packing — the lake/posting wire format for vectors."""
    return np.asarray(vec, dtype="<f4").tobytes()


def unpack_matrix(blobs: List[bytes], dim: int) -> np.ndarray:
    """binary column → (N, dim) float64 matrix (DuckDB casts FLOAT to
    DOUBLE the same way, which is what keeps the oracle exact)."""
    if not blobs:
        return np.zeros((0, dim), np.float64)
    flat = np.frombuffer(b"".join(blobs), dtype="<f4")
    return flat.reshape(len(blobs), dim).astype(np.float64)


def hyperplanes(nbits: int, dim: int, seed: int) -> np.ndarray:
    """Seeded planes — identical in every process (and embeddable as SQL
    literals: ``pipelines/embeddings.knn_lsh_sql`` precedent)."""
    return np.random.RandomState(seed).normal(size=(nbits, dim))


def bucket_of(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Sign-bit signature per row. Sign tests are robust to summation
    order unless a dot product sits within ~1e-12 of zero (never observed
    on the synthetic corpus — same caveat as knn_lsh_sql)."""
    bits = (mat @ planes.T) > 0
    return (bits @ (1 << np.arange(planes.shape[0]))).astype(np.int64)


def probe_buckets(qbucket: int, nbits: int, hamming: int) -> np.ndarray:
    """All buckets within ``hamming`` bit flips of ``qbucket`` (multi-probe
    set). 2^nbits is small by construction (nbits ≤ ~16)."""
    all_b = np.arange(1 << nbits, dtype=np.int64)
    x = all_b ^ np.int64(qbucket)
    pop = np.zeros_like(all_b)
    while x.any():
        pop += x & 1
        x >>= 1
    return all_b[pop <= hamming]


_EMPTY_HITS = pa.schema([("q_id", pa.int64()), ("key", pa.string()),
                         ("cosine", pa.float64())])


def _partition_topk(lake: Lake, part: int, union: np.ndarray,
                    probe_sets: List[np.ndarray], qn: np.ndarray, k: int,
                    dim: int, as_of: Optional[int]) -> List[pa.Table]:
    """One index partition's per-query local top-k under the total order
    (round(cosine,6) DESC, key ASC) — shared by the Ray task path
    (``search``) and the in-process path (``search_local``)."""
    from .follower import read_identity_partition
    from ..pipelines.common import round_half_away

    t = read_identity_partition(lake, part, _IDENTITY, as_of=as_of)
    if t is None or t.num_rows == 0:
        return []
    t = t.filter(pc.and_(
        pc.greater(t["sign"], 0),
        pc.is_in(t["bucket"], value_set=pa.array(union))))
    if t.num_rows == 0:
        return []
    b = t["bucket"].to_numpy(zero_copy_only=False)
    keys = np.asarray(t["key"].to_pylist())
    mat = unpack_matrix(t["vec"].to_pylist(), dim)
    mat = mat / np.maximum(
        np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    rows: List[pa.Table] = []
    for qi, pset in enumerate(probe_sets):
        m = np.isin(b, pset)
        if not m.any():
            continue
        sims = round_half_away(mat[m] @ qn[qi], 6) + 0.0
        kk = keys[m]
        order = np.lexsort((kk, -sims))[:k]
        rows.append(pa.table({
            "q_id": pa.array(np.full(len(order), qi, np.int64)),
            "key": pa.array(kk[order]),
            "cosine": pa.array(sims[order]),
        }))
    return rows


def _merge_topk(local: List[dict], k: int) -> pa.Table:
    """Driver merge of per-partition local top-k rows (≤ parts × Q × k)."""
    if not local:
        return _EMPTY_HITS.empty_table()
    qi = np.array([r["q_id"] for r in local], np.int64)
    keys = np.asarray([r["key"] for r in local])
    sims = np.array([r["cosine"] for r in local], np.float64)
    out_q, out_k, out_s = [], [], []
    for g in np.unique(qi):
        m = qi == g
        order = np.lexsort((keys[m], -sims[m]))[:k]
        out_q += [int(g)] * len(order)
        out_k += list(keys[m][order])
        out_s += list(sims[m][order])
    return pa.table({"q_id": pa.array(out_q, pa.int64()),
                     "key": pa.array(out_k, pa.string()),
                     "cosine": pa.array(out_s, pa.float64())})


class _EmitVecDeltas:
    """map_batches(..., batch_size=1) over LAKE partition ids: fold epochs
    ``(since, up_to]`` with the change feed's pre-image discipline and emit
    bucket-posting DIFF rows. Memory bound = one lake partition's live
    vectors per task."""

    __name__ = "_EmitVecDeltas"

    def __init__(self, lake_root: str, lake_partitions: Optional[int],
                 since: int, up_to: int, key_col: str, vec_col: str,
                 nbits: int, dim: int, seed: int,
                 num_idx_partitions: int):
        self.lake_root, self.lake_partitions = lake_root, lake_partitions
        self.since, self.up_to = since, up_to
        self.key_col, self.vec_col = key_col, vec_col
        self.nbits, self.dim, self.seed = nbits, dim, seed
        self.num_idx_partitions = num_idx_partitions

    def __call__(self, batch: pa.Table) -> pa.Table:
        lake = Lake(self.lake_root, self.lake_partitions)
        planes = hyperplanes(self.nbits, self.dim, self.seed)
        out: List[pa.Table] = []
        for part in batch["part"].to_pylist():
            out.extend(self._one(lake, int(part), planes))
        if not out:
            return POSTING_SCHEMA.empty_table().append_column(
                HELPER_COL, pa.array([], pa.int32()))
        return pa.concat_tables(out)

    def _bucket1(self, blob: bytes, planes: np.ndarray) -> int:
        v = np.frombuffer(blob, dtype="<f4").astype(np.float64)
        return int(bucket_of(v[None, :], planes)[0])

    def _live_vec(self, state: Optional[pa.Table]) -> dict:
        if state is None or state.num_rows == 0:
            return {}
        dead = pc.fill_null(state["deleted"], False).to_numpy(
            zero_copy_only=False)
        keys = state[self.key_col].to_numpy(zero_copy_only=False)
        vecs = column_or_nulls(state, self.vec_col)
        return {k: v for k, v, d in zip(keys, vecs, dead)
                if not d and v is not None}

    def _one(self, lake: Lake, part: int,
             planes: np.ndarray) -> List[pa.Table]:
        epochs = [e for e in lake.committed_epochs(part)
                  if self.since < e <= self.up_to]
        if not epochs:
            return []
        state = lake.read_partition(part, as_of=self.since)
        live = self._live_vec(state)
        out: List[pa.Table] = []
        for e in epochs:
            winners, state = follower_epoch_candidates(lake, part, e, state)
            buckets, keys, signs, vecs = [], [], [], []
            w_keys = winners[self.key_col].to_numpy(zero_copy_only=False)
            w_vecs = column_or_nulls(winners, self.vec_col)
            w_dead = (pc.fill_null(winners["deleted"], False).to_numpy(
                zero_copy_only=False) if "deleted" in winners.column_names
                else np.zeros(len(w_keys), bool))
            for k, v, d in zip(w_keys, w_vecs, w_dead):
                old = live.get(k)
                new = None if d else v
                if old == new:  # bytes-equal (or both absent): no diff
                    continue
                b_old = None if old is None else self._bucket1(old, planes)
                b_new = None if new is None else self._bucket1(new, planes)
                if b_old is not None and b_old != b_new:
                    buckets.append(b_old); keys.append(k)
                    signs.append(-1); vecs.append(b"")
                if b_new is not None:
                    buckets.append(b_new); keys.append(k)
                    signs.append(1); vecs.append(new)
            if buckets:
                b_arr = np.asarray(buckets, np.int64)
                t = pa.table({
                    "bucket": pa.array(b_arr),
                    "key": pa.array(keys, pa.string()),
                    "epoch": pa.array(np.full(len(keys), e, np.int64)),
                    "sign": pa.array(np.array(signs, np.int8)),
                    "vec": pa.array(vecs, pa.binary()),
                })
                out.append(t.append_column(
                    HELPER_COL, pa.array(
                        (b_arr % self.num_idx_partitions).astype(np.int32))))
            live = self._live_vec(state)
        return out


class VectorIndex(FollowerIndex):
    """Bucketed ANN keyspace over a Lake root (module docstring).

    Geometry (``nbits``, ``dim``, ``seed``) is fixed at index creation and
    persisted in ``_vecconf.json``; later instantiations load it, so a
    search-only process needs just the root. ``dim`` may be omitted at
    construction — the first :meth:`refresh` sniffs it from the lake."""

    CONF = "_vecconf.json"
    POSTING_SCHEMA = POSTING_SCHEMA
    IDENTITY = _IDENTITY

    def __init__(self, root: str, num_partitions: Optional[int] = None,
                 key_col: str = "url", vec_col: str = "vec",
                 nbits: int = 5, seed: int = 42,
                 dim: Optional[int] = None):
        super().__init__(root, num_partitions)
        self.key_col, self.vec_col = key_col, vec_col
        self.nbits, self.seed, self.dim = nbits, seed, dim
        conf = self._load_conf()
        if conf is not None:  # persisted geometry wins — it hashed the data
            self.nbits, self.seed = int(conf["nbits"]), int(conf["seed"])
            self.dim = int(conf["dim"])
            self.vec_col = conf.get("vec_col", vec_col)
        self._extra_init = {"key_col": key_col, "vec_col": vec_col,
                            "nbits": self.nbits, "seed": self.seed,
                            "dim": self.dim}

    # ------------------------------------------------------------ geometry
    def _conf_path(self) -> str:
        return posixpath.join(self.lake.root, self.CONF)

    def _load_conf(self) -> Optional[dict]:
        try:
            with self.lake.fs.open(self._conf_path(), "rb") as f:
                return json.loads(f.read().decode())
        except FileNotFoundError:
            return None

    def _persist_conf(self) -> None:
        self.lake._write_small_atomic(
            self._conf_path(),
            json.dumps({"nbits": self.nbits, "seed": self.seed,
                        "dim": self.dim, "vec_col": self.vec_col}).encode())

    def _sniff_dim(self, lake: Lake) -> int:
        for part in range(lake.num_partitions):
            state = lake.read_partition(part)
            if state is None or self.vec_col not in state.column_names:
                continue
            for blob in state[self.vec_col].to_pylist():
                if blob:
                    return len(blob) // 4
        raise ValueError(
            f"vecindex: no non-null '{self.vec_col}' value found in the "
            f"lake — pass dim= explicitly to create an empty index")

    def make_emitter(self, lake: Lake, since: int, up_to: int):
        if self.dim is None:
            self.dim = self._sniff_dim(lake)
            self._extra_init["dim"] = self.dim
        if self._load_conf() is None:
            self._persist_conf()
        return _EmitVecDeltas(lake.root, lake.num_partitions, since, up_to,
                              self.key_col, self.vec_col, self.nbits,
                              self.dim, self.seed, self.num_partitions)

    # ------------------------------------------------------------- search
    def _probe_plan(self, queries: np.ndarray, probe_hamming: int):
        """(qn, probe_sets, union, parts): normalized queries, per-query
        probe bucket sets, their union, and the partitions owning them."""
        if self.dim is None:
            raise ValueError("vecindex: index has no geometry yet — "
                             "refresh() it against a lake first")
        q = np.atleast_2d(np.asarray(queries, dtype=np.float64))
        planes = hyperplanes(self.nbits, self.dim, self.seed)
        qb = bucket_of(q, planes)
        probe_sets = [probe_buckets(int(b), self.nbits, probe_hamming)
                      for b in qb]
        union = np.unique(np.concatenate(probe_sets))
        parts = sorted({int(b) % self.num_partitions for b in union})
        qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        return qn, probe_sets, union, parts

    def search(self, queries: np.ndarray, k: int = 10,
               probe_hamming: int = 1,
               as_of: Optional[int] = None) -> pa.Table:
        """Approximate top-k cosine per query vector over LIVE postings.

        Returns (q_id, key, cosine) with cosine rounded half-away at 6
        decimals (+0.0-normalized) and the TOTAL order (q_id ASC, cosine
        DESC, key ASC) — byte-stable at any partition count, which is what
        lets the driver oracle hash-match. Only partitions owning a probed
        bucket are read; each task returns its local top-k under the same
        total order, so the driver merges ≤ parts × Q × k rows."""
        qn, probe_sets, union, parts = self._probe_plan(queries,
                                                        probe_hamming)
        if not parts:
            return _EMPTY_HITS.empty_table()

        import ray.data as _rd

        root, n, dim = self.lake.root, self.num_partitions, self.dim

        def local_topk(batch: pa.Table) -> pa.Table:
            lake = Lake(root, n)
            rows = []
            for part in batch["part"].to_pylist():
                rows.extend(_partition_topk(lake, int(part), union,
                                            probe_sets, qn, k, dim, as_of))
            if not rows:
                return _EMPTY_HITS.empty_table()
            return pa.concat_tables(rows)

        local = (_rd.from_items([{"part": p} for p in parts])
                 .map_batches(local_topk, batch_format="pyarrow",
                              batch_size=1)
                 .take_all())  # ≤ parts × Q × k tiny rows
        return _merge_topk(local, k)

    def search_local(self, queries: np.ndarray, k: int = 10,
                     probe_hamming: int = 1,
                     as_of: Optional[int] = None) -> pa.Table:
        """In-process point lookup (no Ray session): identical plan,
        scoring and total order as :meth:`search`, folded on the calling
        thread — the serving path for protocol servers / tooling that must
        not own a cluster. Probed partitions DO land in this process, so
        batch analytics should use ``search``."""
        qn, probe_sets, union, parts = self._probe_plan(queries,
                                                        probe_hamming)
        rows: List[pa.Table] = []
        for part in parts:
            rows.extend(_partition_topk(self.lake, part, union, probe_sets,
                                        qn, k, self.dim, as_of))
        return _merge_topk(pa.concat_tables(rows).to_pylist() if rows
                           else [], k)
