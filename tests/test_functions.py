"""Tests for dedup / similarity / text-analysis operators."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from opendataloader_pdf_ray.functions import dedup as dd
from opendataloader_pdf_ray.functions import text_stats as ts
from opendataloader_pdf_ray.functions.lww import argmax_per_key, latest_state
from opendataloader_pdf_ray.functions.similarity import brute_force_topk, lsh_topk


@pytest.fixture(scope="module")
def doc_ds(ray_session):
    base = ("the quick brown fox jumps over the lazy dog and runs far away "
            "into the deep green forest tonight")
    texts, ids = [], []
    for i in range(20):
        words = base.split()
        words[i % len(words)] = f"tok{i}"
        texts.append(" ".join(words))
        ids.append(i)
    # plant near-dup pair (21 == 5 with one word changed) and exact dup (22 == 0)
    texts.append(texts[5].replace("tok5", "tok5x"))
    ids.append(21)
    texts.append(texts[0])
    ids.append(22)
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


class TestExactDedup:
    def test_exact_groups(self, doc_ds):
        out = dd.exact_dedup_keys(doc_ds).to_pandas()
        assert len(out) == 21  # 22 docs, one exact dup collapsed
        dup_row = out[out["n_copies"] == 2]
        assert len(dup_row) == 1 and dup_row["doc_id"].iloc[0] == 0


class TestMinHash:
    def test_near_dup_pair_found(self, doc_ds):
        pairs = dd.minhash_lsh_pairs(doc_ds, threshold=0.5).to_pandas()
        got = set(map(tuple, pairs[["id_a", "id_b"]].values))
        assert (5, 21) in got      # planted near-dup
        assert (0, 22) in got      # exact dup has jaccard 1.0
        j = pairs.set_index(["id_a", "id_b"])["jaccard"]
        assert j.loc[(0, 22)] == 1.0

    def test_signature_deterministic(self):
        m1, m2 = dd.MinHasher(seed=42), dd.MinHasher(seed=42)
        assert (m1.signature("a b c d e f") == m2.signature("a b c d e f")).all()


class TestSimHash:
    def test_near_dup_pair_found(self, doc_ds):
        pairs = dd.simhash_pairs(doc_ds, max_hamming=6).to_pandas()
        got = set(map(tuple, pairs[["id_a", "id_b"]].values))
        assert (0, 22) in got
        h = pairs.set_index(["id_a", "id_b"])["hamming"]
        assert h.loc[(0, 22)] == 0


class TestSimilarity:
    @pytest.fixture(scope="class")
    def emb_ds(self, ray_session):
        rng = np.random.RandomState(0)
        mat = rng.normal(size=(200, 16))
        return ray.data.from_arrow(pa.table({
            "vec_id": pa.array(range(200), pa.int64()),
            "embedding": pa.array(mat.tolist(), pa.list_(pa.float32())),
        })), mat

    def test_bruteforce_topk_exact(self, emb_ds):
        ds, mat = emb_ds
        q = mat[0]
        out = brute_force_topk(ds, q, k=5, exclude_ids={0}).to_pylist()
        # reference: numpy exact
        nm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = nm @ (q / np.linalg.norm(q))
        sims[0] = -np.inf
        want = set(np.argsort(-sims)[:5].tolist())
        assert {r["vec_id"] for r in out} == want

    def test_lsh_recall_on_clustered_data(self, ray_session):
        # LSH recall is meaningful on clustered embeddings (the realistic
        # case); uniform random vectors are its worst case.
        import pyarrow as pa2

        rng = np.random.RandomState(3)
        centers = rng.normal(size=(10, 16)) * 4
        mat = np.vstack([c + rng.normal(size=(20, 16)) * 0.3 for c in centers])
        ds = ray.data.from_arrow(pa2.table({
            "vec_id": pa2.array(range(200), pa2.int64()),
            "embedding": pa2.array(mat.tolist(), pa2.list_(pa2.float32())),
        }))
        q = mat[7]
        exact = {r["vec_id"] for r in
                 brute_force_topk(ds, q, k=10, exclude_ids=set()).to_pylist()}
        approx = {r["vec_id"] for r in
                  lsh_topk(ds, q, k=10, nbits=8, probe_hamming=2).to_pylist()}
        recall = len(exact & approx) / 10
        assert recall >= 0.8


class TestTextStats:
    def test_token_stats_kernel(self):
        t = pa.table({"text": pa.array(["one two three!", "a, b"])})
        out = ts.token_stats(t)
        assert out["n_tokens"].to_pylist() == [3, 2]
        assert out["n_punct"].to_pylist() == [1, 1]

    def test_lang_id(self):
        lid = ts.LangId()
        assert lid.predict("the cat and the dog of the house") == "en"
        assert lid.predict("der Hund und die Katze ist nicht da") == "de"
        assert lid.predict("le chat est dans la maison pour les amis") == "fr"
        assert lid.predict("中文文本处理") == "zh"

    def test_rolling_fingerprint_deterministic(self):
        a = ts.rolling_fingerprint("some document text here")
        b = ts.rolling_fingerprint("some document text here")
        c = ts.rolling_fingerprint("an entirely different document body")
        assert a == b and a != c


class TestGenericLWW:
    def test_argmax_per_key(self):
        t = pa.table({"k": ["a", "a", "b"], "v1": [1, 2, 5], "v2": [9, 1, 1],
                      "payload": ["x", "y", "z"]})
        out = argmax_per_key(t, "k", ["v1", "v2"])
        rows = {r["k"]: r["payload"] for r in out.to_pylist()}
        assert rows == {"a": "y", "b": "z"}  # v1 dominates v2

    def test_latest_state_dataset(self, ray_session):
        t = pa.table({"k": ["a"] * 50 + ["b"] * 50,
                      "v": list(range(50)) + list(range(50)),
                      "p": [f"r{i}" for i in range(100)]})
        ds = ray.data.from_arrow(t)
        out = latest_state(ds, "k", ["v"]).to_pandas().set_index("k")["p"]
        assert out.loc["a"] == "r49" and out.loc["b"] == "r99"


class TestWinnowing:
    def test_shared_run_shares_fingerprint(self):
        # winnowing guarantee: any shared word run of >= window+ngram-1 = 6
        # words yields at least one common (hash) fingerprint
        w = ts.WinnowFingerprinter()
        shared = "alpha beta gamma delta epsilon zeta"
        _, fa = w.select("intro words here " + shared + " tail one")
        _, fb = w.select("completely different prefix " + shared)
        assert set(fa.tolist()) & set(fb.tolist())

    def test_rightmost_min_tie(self):
        # identical hashes inside one window: the rightmost position wins
        w = ts.WinnowFingerprinter()
        text = "x y z x y z x y z x y z"  # repeating grams -> repeated hashes
        pos, fps = w.select(text)
        assert len(pos) == len(set(pos.tolist()))
        assert (np.diff(pos) > 0).all()

    def test_determinism_and_empty(self):
        w1, w2 = ts.WinnowFingerprinter(), ts.WinnowFingerprinter()
        t = "some document text for fingerprinting determinism checks today"
        a, b = w1.select(t), w2.select(t)
        assert (a[0] == b[0]).all() and (a[1] == b[1]).all()
        p, f = w1.select("")
        assert len(p) == 0 and len(f) == 0


class TestIVF:
    def test_full_probe_equals_bruteforce(self, ray_session):
        from opendataloader_pdf_ray.functions.similarity import ivf_topk
        rng = np.random.RandomState(7)
        mat = rng.normal(size=(300, 16))
        ds = ray.data.from_arrow(pa.table({
            "vec_id": pa.array(range(300), pa.int64()),
            "embedding": pa.array(mat.tolist(), pa.list_(pa.float32())),
        }))
        q = mat[0]
        exact = brute_force_topk(ds, q, k=5, exclude_ids={0})
        full = ivf_topk(ds, q, k=5, n_centroids=8, probe=8, exclude_ids={0})
        assert exact["vec_id"].to_pylist() == full["vec_id"].to_pylist()
        assert exact["cosine"].to_pylist() == full["cosine"].to_pylist()
        # pruned probe scans half the lists; recall floor on random data
        pruned = ivf_topk(ds, q, k=5, n_centroids=8, probe=4, exclude_ids={0})
        got = set(pruned["vec_id"].to_pylist())
        want = set(exact["vec_id"].to_pylist())
        assert len(got & want) / len(want) >= 0.4


class TestUrlNormalize:
    def test_rules(self):
        from opendataloader_pdf_ray.functions.urls import normalize_url as n
        assert n("HTTPS://Docs.Example:443/p?b=2&a=1#x") == \
            "https://docs.example/p?a=1&b=2"
        assert n("http://host:80") == "http://host/"
        assert n("http://host:8080/p") == "http://host:8080/p"  # non-default kept
        assert n("https://h/p?utm_source=x&utm_medium=y") == "https://h/p"
        assert n("https://h/p?") == "https://h/p"
        assert n("not a url") == "not a url"
        assert n("mailto:a@b") == "mailto:a@b"  # no ://, untouched

    def test_idempotent(self):
        from opendataloader_pdf_ray.functions.urls import normalize_url as n
        u = "https://Docs.Example:443/p?z=1&a=2&utm_x=3#frag"
        assert n(n(u)) == n(u)


class TestPcmFramer:
    def test_frame_math_and_energy(self):
        from opendataloader_pdf_ray.functions.multimodal import PcmFramer
        f = PcmFramer(frame_len=4, hop=2)
        samples = np.array([1, -2, 3, -4, 5, -6, 7, -8], dtype="<i2")
        fr = f.frames(samples.tobytes())
        assert fr.shape == (3, 4)  # starts 0, 2, 4
        assert (fr[0] == [1, -2, 3, -4]).all()
        assert int((fr * fr).sum()) == sum(
            int(x) ** 2 for x in [1, -2, 3, -4, 3, -4, 5, -6, 5, -6, 7, -8])

    def test_short_and_odd_payloads(self):
        from opendataloader_pdf_ray.functions.multimodal import PcmFramer
        f = PcmFramer(frame_len=4, hop=2)
        assert f.frames(b"\x01\x00\x02").shape[0] == 0  # 1.5 samples
        assert f.frames(b"").shape[0] == 0


class TestHashSampling:
    def test_split_deterministic_and_partitioned(self):
        from opendataloader_pdf_ray.functions.sampling import hash_split
        t = pa.table({"doc_id": pa.array(range(1000), pa.int64())})
        a = hash_split(t, "doc_id")["split"].to_pylist()
        b = hash_split(t, "doc_id")["split"].to_pylist()
        assert a == b
        counts = {s: a.count(s) for s in ("train", "val", "test")}
        assert sum(counts.values()) == 1000
        assert 700 < counts["train"] < 900  # ~80%

    def test_sample_exact_fraction_semantics(self):
        from opendataloader_pdf_ray.functions.sampling import hash_sample
        t = pa.table({"doc_id": pa.array(range(2000), pa.int64())})
        kept = hash_sample(t, "doc_id", 1, 4).num_rows
        assert 400 < kept < 600  # ~25%
        # batch-boundary independence: same membership in any chunking
        h1 = set(hash_sample(t.slice(0, 1000), "doc_id", 1, 4)["doc_id"].to_pylist())
        h2 = set(hash_sample(t.slice(1000), "doc_id", 1, 4)["doc_id"].to_pylist())
        whole = set(hash_sample(t, "doc_id", 1, 4)["doc_id"].to_pylist())
        assert h1 | h2 == whole


class TestKMeans:
    """Distributed Lloyd vs a sequential NumPy reference — bit-exact thanks
    to the integer-scaled partial sums (order-invariant)."""

    SF = "/root/testdata/sf0.001"

    def _reference(self, k=8, iters=5):
        import pyarrow.parquet as pq
        t = pq.read_table(f"{self.SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
        order = np.argsort(t["vec_id"].to_numpy(zero_copy_only=False))
        x = np.stack([np.asarray(v, np.float64)
                      for v in t["embedding"].to_pylist()])[order]
        c = x[:k].copy()
        scale = float(1 << 20)
        xi = np.rint(x * scale).astype(np.int64)
        for _ in range(iters):
            d2 = (-2.0 * x @ c.T) + (c * c).sum(axis=1)
            a = np.argmin(d2, axis=1)
            nc = c.copy()
            for j in range(k):
                m = a == j
                if m.any():
                    nc[j] = xi[m].sum(axis=0) / (m.sum() * scale)
            c = nc
        d2 = (-2.0 * x @ c.T) + (c * c).sum(axis=1)
        a = np.argmin(d2, axis=1)
        d2min = np.maximum(d2[np.arange(len(x)), a] + (x * x).sum(axis=1), 0.0)
        d2i = np.rint(d2min * 1e6).astype(np.int64)
        out = {}
        for j in range(k):
            m = a == j
            if m.any():
                out[j] = (int(m.sum()), round(d2i[m].sum() / 1e6, 6))
        return out

    def test_matches_sequential_reference(self, ray_session):
        from opendataloader_pdf_ray.pipelines.embeddings import (
            embedding_kmeans_stats)
        got = {r["cluster_id"]: (r["n"], r["inertia"])
               for r in embedding_kmeans_stats(self.SF).take_all()}
        assert got == self._reference()


class TestConnectedComponents:
    def _labels(self, edges):
        import pandas as pd

        from opendataloader_pdf_ray.functions import graph
        pairs = ray.data.from_pandas(pd.DataFrame(
            {"id_a": [a for a, _ in edges], "id_b": [b for _, b in edges]}))
        out = graph.connected_components(pairs, num_buckets=8).to_pandas()
        return dict(zip(out["node"], out["cluster_id"]))

    def test_two_components(self, ray_session):
        got = self._labels([(1, 2), (2, 3), (10, 11)])
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    def test_long_path_pointer_jumping(self, ray_session):
        # a 40-node path: hop-by-hop propagation would need 40 rounds;
        # pointer jumping converges within the default max_rounds
        edges = [(i, i + 1) for i in range(40)]
        got = self._labels(edges)
        assert set(got.values()) == {0}
        assert len(got) == 41

    def test_cluster_sizes(self, ray_session):
        import pandas as pd

        from opendataloader_pdf_ray.functions import graph
        pairs = ray.data.from_pandas(pd.DataFrame(
            {"id_a": [5, 6, 20], "id_b": [6, 7, 21]}))
        labels = graph.connected_components(pairs, num_buckets=8)
        out = graph.cluster_sizes(labels).to_pandas()
        sizes = dict(zip(out["node"], out["cluster_size"]))
        assert sizes == {5: 3, 6: 3, 7: 3, 20: 2, 21: 2}

    def test_cluster_sizes_mega_cluster(self, ray_session):
        """Round-2 verdict item #5: a boilerplate mega-cluster (one star
        component holding most nodes, Zipf-ish skew) must not be
        materialized in a single task — count-then-attach streams it."""
        import pandas as pd

        from opendataloader_pdf_ray.functions import graph

        # star: node 0 connected to 1..3000 (one mega component), plus a few
        # small ones
        a = [0] * 3000 + [10_000, 10_002]
        b = list(range(1, 3001)) + [10_001, 10_003]
        pairs = ray.data.from_pandas(pd.DataFrame({"id_a": a, "id_b": b}))
        labels = graph.connected_components(pairs, num_buckets=8)
        out = graph.cluster_sizes(labels).to_pandas()
        sizes = dict(zip(out["node"], out["cluster_size"]))
        assert sizes[0] == 3001 and sizes[1500] == 3001
        assert sizes[10_000] == 2 and sizes[10_003] == 2
        assert len(out) == 3005


class TestKMVSketch:
    def test_matches_duckdb_and_is_accurate(self, ray_session):
        import duckdb

        from opendataloader_pdf_ray.functions import sketches as sk
        n = 5000
        t = pa.table({"g": pa.array(["a"] * n),
                      "v": pa.array([f"u{i % 1000}" for i in range(n)])})
        part = sk.kmv_partial(t, "g", "v", k=64)
        est = sk.kmv_merge_estimate(part, "g", k=64)
        e = est["kmv_estimate"][0].as_py()
        # KMV std error ≈ 1/sqrt(k-1) ≈ 12.6%; assert within 3σ of 1000
        assert abs(e - 1000) < 1000 * 0.38
        # bit-exact vs DuckDB's md5_number_lower
        hv = duckdb.sql("select md5_number_lower('u7')").fetchone()[0]
        assert sk.md5_number_lower("u7") == hv

    def test_partials_merge_associatively(self, ray_session):
        from opendataloader_pdf_ray.functions import sketches as sk
        vals = [f"x{i}" for i in range(300)]
        whole = sk.kmv_partial(pa.table({"g": ["a"] * 300, "v": vals}),
                               "g", "v", k=32)
        halves = pa.concat_tables([
            sk.kmv_partial(pa.table({"g": ["a"] * 150, "v": vals[:150]}),
                           "g", "v", k=32),
            sk.kmv_partial(pa.table({"g": ["a"] * 150, "v": vals[150:]}),
                           "g", "v", k=32)])
        e1 = sk.kmv_merge_estimate(whole, "g", k=32)["kmv_estimate"][0].as_py()
        e2 = sk.kmv_merge_estimate(halves, "g", k=32)["kmv_estimate"][0].as_py()
        assert e1 == e2

    def test_exact_below_k(self, ray_session):
        from opendataloader_pdf_ray.functions import sketches as sk
        t = pa.table({"g": ["a"] * 10, "v": [str(i) for i in range(10)]})
        part = sk.kmv_partial(t, "g", "v", k=64)
        assert sk.kmv_merge_estimate(part, "g", k=64)["kmv_estimate"][0].as_py() == 10


class TestEnrichPairs:
    """functions/pairjoin.enrich_pairs — bucketed two-sided dim attachment."""

    def _run(self, ray_session, pairs_rows, dim_rows, **kw):
        import ray.data

        from opendataloader_pdf_ray.functions.pairjoin import enrich_pairs

        pairs = ray.data.from_arrow(pa.table(pairs_rows))
        dim = ray.data.from_arrow(pa.table(dim_rows))
        out = enrich_pairs(pairs, dim, key_col="k", val_col="v", **kw)
        return sorted(out.take_all(), key=lambda r: (r["id_a"], r["id_b"]))

    def test_attaches_both_sides_with_payload(self, ray_session):
        rows = self._run(
            ray_session,
            {"id_a": [1, 2], "id_b": [3, 4], "score": [0.5, 0.9]},
            {"k": [1, 2, 3, 4], "v": ["a", "b", "c", "d"]},
            payload_cols=("score",), num_buckets=4)
        assert rows == [
            {"id_a": 1, "id_b": 3, "score": 0.5, "val_a": "a", "val_b": "c"},
            {"id_a": 2, "id_b": 4, "score": 0.9, "val_a": "b", "val_b": "d"},
        ]

    def test_missing_dim_side_drops_pair(self, ray_session):
        rows = self._run(
            ray_session,
            {"id_a": [1, 2], "id_b": [3, 9]},  # 9 has no dim row
            {"k": [1, 2, 3], "v": ["a", "b", "c"]}, num_buckets=4)
        assert rows == [{"id_a": 1, "id_b": 3, "val_a": "a", "val_b": "c"}]

    def test_bucket_count_invariant(self, ray_session):
        pairs = {"id_a": list(range(0, 40, 2)), "id_b": list(range(1, 40, 2))}
        dim = {"k": list(range(40)), "v": [f"s{i % 5}" for i in range(40)]}
        a = self._run(ray_session, pairs, dim, num_buckets=3)
        b = self._run(ray_session, pairs, dim, num_buckets=17)
        assert a == b


class TestMisraGries:
    """functions/sketches.mg_partial / mg_merge — heavy-hitter guarantee."""

    def test_no_truncation_below_k(self):
        from opendataloader_pdf_ray.functions import sketches as sk
        keys = np.array(list("aabbbc"), dtype=object)
        u, c = sk.mg_partial(keys, k=10)
        assert dict(zip(u, c)) == {"a": 2, "b": 3, "c": 1}

    def test_undercount_bounded(self):
        """Merged MG count of any key is within n/(k+1) of its true count,
        and every key with true count > n/(k+1) survives."""
        from opendataloader_pdf_ray.functions import sketches as sk
        rng = np.random.RandomState(7)
        # Zipf stream with a planted heavy hitter
        keys = np.array([f"w{int(x)}" for x in rng.zipf(1.3, 5000)] +
                        ["HOT"] * 800, dtype=object)
        rng.shuffle(keys)
        k = 64
        n = len(keys)
        parts = [sk.mg_partial(chunk, k)
                 for chunk in np.array_split(keys, 13)]
        mk = np.concatenate([p[0] for p in parts])
        mc = np.concatenate([p[1] for p in parts])
        u, c = sk.mg_merge(mk, mc, k)
        got = dict(zip(u, c))
        true_u, true_c = np.unique(keys, return_counts=True)
        true = dict(zip(true_u, true_c))
        bound = n // (k + 1)
        for key, tc in true.items():
            mg = got.get(key, 0)
            assert mg <= tc
            assert tc - mg <= bound, key
            if tc > bound:
                assert key in got, key
        assert "HOT" in got

    def test_merge_order_invariant_guarantee(self):
        """Different chunkings may give different summaries, but the
        guarantee (survivors ⊇ heavy keys, undercount ≤ n/(k+1)) holds for
        every chunking — which is what the exact re-count pass relies on."""
        from opendataloader_pdf_ray.functions import sketches as sk
        keys = np.array(["x"] * 50 + [f"r{i}" for i in range(200)],
                        dtype=object)
        n, k = len(keys), 16
        for n_chunks in (1, 3, 7):
            parts = [sk.mg_partial(ch, k)
                     for ch in np.array_split(keys, n_chunks)]
            u, c = sk.mg_merge(np.concatenate([p[0] for p in parts]),
                               np.concatenate([p[1] for p in parts]), k)
            got = dict(zip(u, c))
            assert "x" in got and 50 - got["x"] <= n // (k + 1)


class TestBloom:
    """functions/bloom.py — mergeable Bloom filter invariants."""

    def test_no_false_negatives(self):
        from opendataloader_pdf_ray.functions import bloom as bf
        keys = np.arange(0, 5000, 3, dtype=np.int64)
        bm = bf.partial_bitmap(keys, 1 << 16, 7)
        assert bf.maybe_contains(bm, keys, 1 << 16, 7).all()

    def test_merge_equals_single_build(self):
        from opendataloader_pdf_ray.functions import bloom as bf
        keys = np.arange(10_000, dtype=np.int64)
        whole = bf.partial_bitmap(keys, 1 << 17, 7)
        merged = bf.or_bitmaps([bf.partial_bitmap(c, 1 << 17, 7)
                                for c in np.array_split(keys, 9)])
        assert whole == merged

    def test_false_positive_rate_bounded(self):
        from opendataloader_pdf_ray.functions import bloom as bf
        n, m = 20_000, 1 << 18  # ~13 bits/key
        bm = bf.partial_bitmap(np.arange(n, dtype=np.int64), m, 7)
        absent = np.arange(10**6, 10**6 + 20_000, dtype=np.int64)
        fp = bf.maybe_contains(bm, absent, m, 7).mean()
        assert fp < 0.02, fp

    def test_cluster_sizes_rejects_negative_node_ids(self, ray_session):
        import pandas as pd
        import pytest as _pytest

        from opendataloader_pdf_ray.functions import graph
        labels = ray.data.from_pandas(pd.DataFrame(
            {"node": [-5, 2], "cluster_id": [-5, -5]}))
        with _pytest.raises(Exception, match="non-negative node ids"):
            graph.cluster_sizes(labels).to_pandas()

    def test_cluster_sizes_empty_pairs(self, ray_session):
        import pandas as pd

        from opendataloader_pdf_ray.functions import graph
        labels = ray.data.from_pandas(
            pd.DataFrame({"node": [], "cluster_id": []}))
        assert graph.cluster_sizes(labels).take_all() == []


class TestPageRank:
    """functions.graph.pagerank vs an in-test sequential integer reference."""

    SCALE, DN, DD = 10 ** 12, 85, 100

    def _reference(self, n, edges, iters=5):
        from collections import Counter, defaultdict
        od = Counter(s for s, _ in edges)
        base = (self.SCALE * (self.DD - self.DN) // self.DD) // n
        r = {v: self.SCALE // n for v in range(n)}
        for _ in range(iters):
            inflow = defaultdict(int)
            for s, d in edges:
                inflow[d] += r[s] // od[s]
            dang = sum(r[v] for v in range(n) if od.get(v, 0) == 0)
            dsh = dang // n
            r = {v: base + (self.DN * (inflow[v] + dsh)) // self.DD
                 for v in range(n)}
        return r

    def _run(self, n, edges, buckets=8, iters=5):
        import pandas as pd

        from opendataloader_pdf_ray.functions import graph
        nodes = ray.data.from_pandas(pd.DataFrame({"node": range(n)}))
        eds = ray.data.from_pandas(pd.DataFrame(
            {"src": [s for s, _ in edges], "dst": [d for _, d in edges]}))
        return graph.pagerank(nodes, eds, iters=iters,
                              num_buckets=buckets).to_pandas()

    def test_matches_sequential_reference(self, ray_session):
        edges = [(0, 1), (1, 2), (2, 0), (3, 2), (3, 1), (3, 1)]  # 4=dangling
        out = self._run(5, edges)
        want = self._reference(5, edges)
        assert dict(zip(out["node"], out["rank_e12"])) == want
        degs = dict(zip(out["node"], zip(out["in_deg"], out["out_deg"])))
        assert degs[1] == (3, 1)   # multi-edge counted per occurrence
        assert degs[4] == (0, 0)   # isolated node present with default rank
        assert degs[3] == (0, 3)

    def test_bucket_count_invariance(self, ray_session):
        edges = [(i, (i * 7 + 3) % 20) for i in range(20)] + \
                [(i, (i * 13 + 1) % 20) for i in range(0, 20, 2)]
        edges = [(s, d) for s, d in edges if s != d]
        a = self._run(20, edges, buckets=2).sort_values("node")
        b = self._run(20, edges, buckets=16).sort_values("node")
        assert a["rank_e12"].tolist() == b["rank_e12"].tolist()
        assert a["in_deg"].tolist() == b["in_deg"].tolist()
        assert a["out_deg"].tolist() == b["out_deg"].tolist()

    def test_rank_mass_conserved_approximately(self, ray_session):
        # integer floors only ever LOSE mass: total ≤ SCALE, and by at most
        # (n nodes + 1 dangling share + den) floor losses per round
        edges = [(0, 1), (1, 0), (2, 1)]
        out = self._run(4, edges)
        total = int(out["rank_e12"].sum())
        assert total <= self.SCALE
        assert total >= self.SCALE - 5 * (4 + 2) * self.DD


class TestPrefixRanges:
    """pipelines.packing.prefix_ranges: distributed per-key prefix sums."""

    def _ranges(self, rows, rb_buckets=4):
        import pandas as pd

        from opendataloader_pdf_ray.pipelines.packing import prefix_ranges
        n = max(r[1] for r in rows) + 1
        df = pd.DataFrame(rows, columns=["source", "doc_id", "n_tokens"])
        df["rb"] = df["doc_id"] * rb_buckets // n
        tokds = ray.data.from_pandas(df).materialize()
        ranged, totals = prefix_ranges(tokds, key="source", order="doc_id",
                                       value="n_tokens",
                                       num_buckets=rb_buckets, n_rows_hint=n)
        out = ranged.to_pandas().sort_values("doc_id")
        return out, totals

    def test_matches_sequential_cumsum(self, ray_session):
        rows = [("a", 0, 5), ("a", 2, 3), ("b", 1, 7), ("a", 5, 2),
                ("b", 4, 1), ("a", 7, 0), ("a", 9, 4)]
        out, totals = self._ranges(rows)
        got = {(r.source, r.doc_id): (r.start, r.end)
               for r in out.itertuples()}
        assert got == {("a", 0): (0, 5), ("a", 2): (5, 8), ("a", 5): (8, 10),
                       ("a", 7): (10, 10), ("a", 9): (10, 14),
                       ("b", 1): (0, 7), ("b", 4): (7, 8)}
        assert totals == {"a": 14, "b": 8}

    def test_bucket_count_invariance(self, ray_session):
        rows = [("s", i, (i * 3) % 5) for i in range(30)]
        a, _ = self._ranges(rows, rb_buckets=2)
        b, _ = self._ranges(rows, rb_buckets=16)
        assert a["start"].tolist() == b["start"].tolist()
        assert a["end"].tolist() == b["end"].tolist()
