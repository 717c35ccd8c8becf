"""SemDeDup over the live lake (cdc/semdedup.py + `semdups` CLI):
attribution equals an offline numpy recompute, exact-duplicate texts are
flagged semantically, determinism across runs, and the no-embeddings
guard."""

import json

import numpy as np
import pyarrow.parquet as pq
import pytest

from opendataloader_pdf_ray.cdc import Lake
from opendataloader_pdf_ray.cdc.ingest import CDCConfig, ingest_epoch
from opendataloader_pdf_ray.cdc.semdedup import attribute_semantic
from opendataloader_pdf_ray.fixtures.gen import gen_events
from opendataloader_pdf_ray.functions import clustering as cl
from opendataloader_pdf_ray.functions.text_stats import embed_text

CFG = CDCConfig(num_partitions=4, num_salts=2, epoch_size=120,
                extract_batch_size=16, extract_concurrency=2,
                derive=embed_text)


def _seed(tmp_path):
    import pyarrow as pa

    events = gen_events(114, 40, seed=91)
    # plant 6 MIRROR events: same html under new urls (the re-hosted-copy
    # scenario semantic dedup exists for), seqs continuing densely
    base = events.to_pylist()
    last = {}
    for r in base:  # LWW winner per url — mirror the LIVE version
        if r["html"] is not None and (r["url"] not in last
                                      or r["seq"] > last[r["url"]]["seq"]):
            last[r["url"]] = r
    # only urls whose winner is this html row (no later tombstone)
    latest_seq = {}
    for r in base:
        latest_seq[r["url"]] = max(latest_seq.get(r["url"], -1), r["seq"])
    donors = [r for u, r in sorted(last.items())
              if r["seq"] == latest_seq[u]][:6]
    assert len(donors) == 6
    mirrors = []
    for i, r in enumerate(donors):
        m = dict(r)
        m["url"] = f"https://mirror.example/{i}"
        m["seq"] = 114 + i
        m["op"] = "I"
        mirrors.append(m)
    table = pa.Table.from_pylist(base + mirrors, schema=events.schema)
    seg = str(tmp_path / "seg.parquet")
    pq.write_table(table, seg)
    lake = Lake(str(tmp_path / "lake"), CFG.num_partitions)
    ingest_epoch([seg], lake, 0, CFG)
    return lake


def _offline(lake, k=8, iters=3, threshold=0.95):
    """Sequential mirror of attribute_semantic."""
    state = lake.read_state()
    rows = [(u, np.frombuffer(v, np.float32).astype(np.float64))
            for u, v in zip(state["url"].to_pylist(),
                            state["vec"].to_pylist()) if v is not None]
    rows.sort(key=lambda r: r[0])
    urls = [r[0] for r in rows]
    X = np.stack([r[1] for r in rows])
    seeds = X[:k].copy()
    # sequential integer-exact Lloyd (mirrors clustering.kmeans_fit)
    c = seeds
    for _ in range(iters):
        a, _ = cl._assign(X, c)
        new_c = c.copy()
        for j in np.unique(a):
            m = a == j
            xi = np.rint(X[m] * cl._SCALE).astype(np.int64)
            new_c[j] = xi.sum(axis=0) / (m.sum() * cl._SCALE)
        c = new_c
    a, _ = cl._assign(X, c)
    out = {}
    for j in np.unique(a):
        idx = np.where(a == j)[0]  # urls already sorted
        Xs = X[idx]
        norms = np.linalg.norm(Xs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        Xn = Xs / norms
        tri = np.tril(Xn @ Xn.T >= threshold, k=-1)
        for r, gi in enumerate(idx):
            dup = bool(tri[r].any())
            of = urls[idx[int(np.argmax(tri[r]))]] if dup else None
            out[urls[gi]] = (int(j), dup, of)
    return out


@pytest.mark.usefixtures("ray_session")
class TestSemDups:
    def test_matches_offline_and_flags_exact_dups(self, tmp_path):
        lake = _seed(tmp_path)
        got = attribute_semantic(lake).to_pandas()
        want = _offline(lake)
        assert len(got) == len(want)
        for _, row in got.iterrows():
            wc, wd, wo = want[row["url"]]
            assert row["cluster_id"] == wc
            assert bool(row["is_sem_dup"]) == wd
            assert (row["sem_dup_of"] or None) == wo
        # identical texts (the fixture's exact dups) → identical vecs →
        # the later url must be flagged against the earlier one
        state = lake.read_state()
        by_text = {}
        for u, t in zip(state["url"].to_pylist(),
                        state["text"].to_pylist()):
            if isinstance(t, str) and t:
                by_text.setdefault(t, []).append(u)
        twin_groups = [sorted(us) for us in by_text.values()
                       if len(us) > 1]
        flags = dict(zip(got["url"], got["is_sem_dup"]))
        assert twin_groups, "fixture lost its exact dups"
        for grp in twin_groups:
            assert all(flags[u] for u in grp[1:]), grp

    def test_deterministic(self, tmp_path):
        lake = _seed(tmp_path)
        a = attribute_semantic(lake).to_pandas()
        b = attribute_semantic(lake).to_pandas()
        assert a.equals(b)

    def test_cli_and_guard(self, tmp_path, capsys):
        from opendataloader_pdf_ray.__main__ import main

        lake = _seed(tmp_path)
        assert main(["semdups", lake.root,
                     "--out", str(tmp_path / "out")]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["rows"] > 0 and rep["sem_dups"] > 0
        # lake without embeddings → loud guard
        plain_cfg = CDCConfig(num_partitions=2, num_salts=2,
                              epoch_size=60, extract_batch_size=16,
                              extract_concurrency=2)
        events = gen_events(60, 20, seed=92)
        seg = str(tmp_path / "seg2.parquet")
        pq.write_table(events, seg)
        plain = Lake(str(tmp_path / "plain"), 2)
        ingest_epoch([seg], plain, 0, plain_cfg)
        with pytest.raises(Exception, match="vec"):
            attribute_semantic(plain)
