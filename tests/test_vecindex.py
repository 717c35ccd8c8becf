"""Vector (ANN) index (cdc/vecindex.py): retract/apply maintenance across
bucket moves, exactly-once commits, time travel, multi-probe search,
compaction pruning, geometry persistence, purge.
"""

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from opendataloader_pdf_ray.cdc import Lake, Lineage, VectorIndex
from opendataloader_pdf_ray.cdc.vecindex import (bucket_of, hyperplanes,
                                                 pack_vector, probe_buckets,
                                                 unpack_matrix,
                                                 vec_index_root)

DIM = 8
PLANES = hyperplanes(nbits=4, dim=DIM, seed=7)


def _vec(seed: int) -> np.ndarray:
    return np.random.RandomState(1000 + seed).normal(size=DIM)


def commit_rows(lake: Lake, part: int, epoch: int, rows):
    """rows: (url, seq, vec_or_None, deleted)."""
    t = pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "warc_ts": pa.array([r[1] for r in rows], pa.int64()),
        "seq": pa.array([r[1] for r in rows], pa.int64()),
        "vec": pa.array([None if r[2] is None else pack_vector(r[2])
                         for r in rows], pa.binary()),
        "deleted": pa.array([r[3] for r in rows], pa.bool_()),
    })
    lake.commit_delta(part, epoch, t, Lineage(
        part=part, epoch=epoch, events_consumed=len(rows),
        rows_upserted=len(rows), rows_deleted=0,
        seq_min=min(r[1] for r in rows), seq_max=max(r[1] for r in rows)))


def seed_lake(root: str) -> Lake:
    """2-partition, 3-epoch lake: insert / vector-update (bucket move via
    negation) / delete / re-add / never-live ghost tombstone."""
    lake = Lake(str(root), 2)
    commit_rows(lake, 0, 0, [("a", 1, _vec(0), False)])
    commit_rows(lake, 1, 0, [("b", 2, _vec(1), False)])
    # epoch 1: a's vector NEGATED (complement bucket → guaranteed move);
    # b tombstoned; ghost tombstone for a never-live key
    commit_rows(lake, 0, 1, [("a", 3, -_vec(0), False),
                             ("ghost", 4, None, True)])
    commit_rows(lake, 1, 1, [("b", 5, None, True)])
    # epoch 2: a back to the original; b re-added with a fresh vector
    commit_rows(lake, 0, 2, [("a", 6, _vec(0), False)])
    commit_rows(lake, 1, 2, [("b", 7, _vec(2), False)])
    return lake


def new_index(root) -> VectorIndex:
    return VectorIndex(str(root), num_partitions=4, nbits=4, seed=7,
                       dim=DIM)


def live_postings(idx: VectorIndex, as_of=None):
    t = idx.read_state(as_of=as_of)
    return sorted(zip(t["bucket"].to_pylist(), t["key"].to_pylist()))


def b_of(v: np.ndarray) -> int:
    return int(bucket_of(np.atleast_2d(v), PLANES)[0])


class TestGeometry:
    def test_pack_unpack_roundtrip_and_f32_width(self):
        v = _vec(3)
        blob = pack_vector(v)
        assert len(blob) == DIM * 4
        back = unpack_matrix([blob], DIM)[0]
        assert np.allclose(back, v, atol=1e-6)
        # negation is exact in f32: unpack(-v) == -unpack(v) bit-for-bit
        assert (unpack_matrix([pack_vector(-v)], DIM)[0]
                == -unpack_matrix([blob], DIM)[0]).all()

    def test_negation_flips_every_hyperplane_sign(self):
        v = _vec(0)
        assert b_of(-v) == (~b_of(v)) & 0b1111

    def test_probe_buckets_hamming(self):
        got = set(probe_buckets(0b0101, 4, 1).tolist())
        assert got == {0b0101, 0b0100, 0b0111, 0b0001, 0b1101}
        assert len(probe_buckets(3, 4, 4)) == 16  # full space

    def test_conf_persisted_and_wins(self, tmp_path, ray_session):
        lake = seed_lake(tmp_path / "lake")
        idx = new_index(tmp_path / "vi")
        idx.refresh(lake)
        conf = json.loads(
            (tmp_path / "vi" / "_vecconf.json").read_text())
        assert conf == {"nbits": 4, "seed": 7, "dim": DIM,
                        "vec_col": "vec"}
        # a later open with DIFFERENT ctor geometry loads the persisted one
        again = VectorIndex(str(tmp_path / "vi"), nbits=9, seed=999)
        assert (again.nbits, again.seed, again.dim) == (4, 7, DIM)

    def test_dim_sniffed_from_lake(self, tmp_path, ray_session):
        lake = seed_lake(tmp_path / "lake")
        idx = VectorIndex(str(tmp_path / "vi"), num_partitions=4,
                          nbits=4, seed=7)  # no dim
        idx.refresh(lake)
        assert idx.dim == DIM


class TestRefresh:
    def test_retract_apply_across_bucket_moves(self, tmp_path, ray_session):
        lake = seed_lake(tmp_path / "lake")
        idx = new_index(tmp_path / "vi")
        idx.refresh(lake)
        assert live_postings(idx) == sorted(
            [(b_of(_vec(0)), "a"), (b_of(_vec(2)), "b")])
        # time travel: epoch 1 has a at the COMPLEMENT bucket, b gone
        assert live_postings(idx, as_of=1) == [(b_of(-_vec(0)), "a")]
        assert live_postings(idx, as_of=0) == sorted(
            [(b_of(_vec(0)), "a"), (b_of(_vec(1)), "b")])

    def test_unchanged_vectors_emit_no_deltas(self, tmp_path, ray_session):
        """epoch 3 re-upserts a's identical vector: no posting delta rows
        may appear (delta volume scales with churn)."""
        import pyarrow.parquet as pq

        lake = seed_lake(tmp_path / "lake")
        idx = new_index(tmp_path / "vi")
        idx.refresh(lake)
        commit_rows(lake, 0, 3, [("a", 8, _vec(0), False)])
        idx.refresh(lake)
        for part in range(4):
            assert not idx.lake.fs.exists(idx.lake._delta_path(part, 3))

    def test_incremental_equals_one_shot(self, tmp_path, ray_session):
        lake = seed_lake(tmp_path / "lake")
        inc = new_index(tmp_path / "inc")
        for e in (0, 1, 2):
            inc.refresh(lake, up_to=e)
        one = new_index(tmp_path / "one")
        one.refresh(lake)
        for part in range(4):
            a, b = inc.read_partition(part), one.read_partition(part)
            if a is None or b is None:
                assert a is None and b is None
                continue
            assert a.equals(b)

    def test_exactly_once_and_watermark(self, tmp_path, ray_session):
        lake = seed_lake(tmp_path / "lake")
        idx = new_index(tmp_path / "vi")
        lin = idx.refresh(lake)
        assert lin and not any(r["skipped"] for r in lin)
        assert idx.watermark() == 2
        assert idx.refresh(lake) == []
        idx._set_watermark(-1)
        replay = idx.refresh(lake)
        assert replay and all(r["skipped"] for r in replay)
        assert idx.watermark() == 2


class TestSearch:
    def test_topk_finds_live_neighbors(self, tmp_path, ray_session):
        lake = seed_lake(tmp_path / "lake")
        idx = new_index(tmp_path / "vi")
        idx.refresh(lake)
        hits = idx.search(_vec(0), k=5, probe_hamming=0)
        got = dict(zip(hits["key"].to_pylist(),
                       hits["cosine"].to_pylist()))
        assert got["a"] == 1.0  # exact self-match at the query's bucket
        # epoch-1 view: a's live vector is the NEGATION → cosine −1.0,
        # probed at the complement bucket
        old = idx.search(_vec(0), k=5, probe_hamming=4, as_of=1)
        got1 = dict(zip(old["key"].to_pylist(), old["cosine"].to_pylist()))
        assert got1["a"] == -1.0 and "b" not in got1

    def test_multi_query_order_and_k(self, tmp_path, ray_session):
        lake = seed_lake(tmp_path / "lake")
        idx = new_index(tmp_path / "vi")
        idx.refresh(lake)
        out = idx.search(np.stack([_vec(0), _vec(2)]), k=1,
                         probe_hamming=4)
        assert out["q_id"].to_pylist() == [0, 1]
        assert out["key"].to_pylist() == ["a", "b"]  # each query's self

    def test_search_local_equals_ray_search(self, tmp_path, ray_session):
        """The in-process serving path returns byte-identical results to
        the Ray task path at every probe radius and as-of."""
        lake = seed_lake(tmp_path / "lake")
        idx = new_index(tmp_path / "vi")
        idx.refresh(lake)
        qs = np.stack([_vec(0), _vec(2), -_vec(1)])
        for h in (0, 1, 4):
            for as_of in (None, 0, 1):
                a = idx.search(qs, k=3, probe_hamming=h, as_of=as_of)
                b = idx.search_local(qs, k=3, probe_hamming=h, as_of=as_of)
                assert a.equals(b), (h, as_of)

    def test_search_empty_and_pruned(self, tmp_path, ray_session):
        lake = seed_lake(tmp_path / "lake")
        idx = new_index(tmp_path / "vi")
        idx.refresh(lake)
        # probe_hamming=0 reads ONLY the query bucket's partition: a vector
        # in the complement bucket must be invisible
        hits = idx.search(-_vec(2), k=5, probe_hamming=0)
        assert "b" not in hits["key"].to_pylist()


class TestCompactVerifyPurge:
    def test_compact_prunes_dead_and_preserves_reads(self, tmp_path,
                                                     ray_session):
        lake = seed_lake(tmp_path / "lake")
        idx = new_index(tmp_path / "vi")
        idx.refresh(lake)
        before = live_postings(idx)
        before_e0 = live_postings(idx, as_of=0)
        assert idx.compact_distributed() > 0
        assert live_postings(idx) == before
        assert live_postings(idx, as_of=0) == before_e0
        rep = idx.verify(deep=True)
        assert rep["ok"], rep["issues"]
        for part in range(4):
            t = idx.read_partition(part)
            if t is not None and t.num_rows:
                assert int(pc.min(t["sign"]).as_py()) > 0

    def test_purge_keys_scrubs_everywhere(self, tmp_path, ray_session):
        lake = seed_lake(tmp_path / "lake")
        idx = new_index(tmp_path / "vi")
        idx.refresh(lake)
        audit = idx.purge_keys(["a"])
        assert audit["rows_removed"] > 0
        assert all(k != "a" for _, k in live_postings(idx))
        again = idx.purge_keys(["a"])
        assert again["rows_removed"] == 0


class TestEmbedBackfillIntegration:
    """The embed-backfill → vector-index loop: a lake with NO vector column
    gains one via a derived-column backfill; the follower must (a) tolerate
    pre-evolution epochs, (b) see the backfill epoch's vectors even though
    the (warc_ts, seq)-keyed change feed reports nothing for it (the
    value-level candidate rule), (c) preserve time travel across it."""

    def _text_lake(self, root) -> Lake:
        lake = Lake(str(root), 2)
        t = pa.table({
            "url": pa.array(["a", "b"], pa.string()),
            "warc_ts": pa.array([1, 2], pa.int64()),
            "seq": pa.array([1, 2], pa.int64()),
            "text": pa.array(["alpha beta gamma", "delta epsilon"],
                             pa.string()),
            "deleted": pa.array([False, False], pa.bool_()),
        })
        for part in (0, 1):
            lake.commit_delta(part, 0, t.slice(part, 1), Lineage(
                part=part, epoch=0, events_consumed=1, rows_upserted=1,
                rows_deleted=0, seq_min=part + 1, seq_max=part + 1))
        return lake

    def test_backfill_embed_feeds_index(self, tmp_path, ray_session):
        from opendataloader_pdf_ray.cdc import backfill
        from opendataloader_pdf_ray.functions.text_stats import embed_text

        lake = self._text_lake(tmp_path / "lake")
        idx = VectorIndex(str(tmp_path / "vi"), num_partitions=4,
                          nbits=4, seed=7, dim=32)
        # pre-backfill: no vec column anywhere — empty index, no crash
        idx.refresh(lake)
        assert idx.read_state().num_rows == 0
        lineage = backfill(lake, embed_text, name="embed")
        e_bf = lineage[0]["epoch"]
        idx.refresh(lake)
        live = live_postings(idx)
        assert sorted(k for _, k in live) == ["a", "b"]
        # change feed sees NOTHING for the backfill epoch (by design) …
        feed = lake.changes(since=e_bf - 1).take_all()
        assert feed == []
        # … yet the index picked the vectors up; time travel: empty before
        assert live_postings(idx, as_of=e_bf - 1) == []
        # self-search at 1.0 through the packed live vector
        blob = lake.lookup(["a"]).to_pylist()[0]["vec"]
        q = np.frombuffer(blob, dtype="<f4").astype(np.float64)
        hits = idx.search(q, k=2, probe_hamming=4)
        got = dict(zip(hits["key"].to_pylist(), hits["cosine"].to_pylist()))
        assert got["a"] == 1.0

    def test_re_embed_emits_only_changed(self, tmp_path, ray_session):
        """A second identical backfill (same transform) emits no posting
        deltas — the value diff, not the epoch, drives index churn."""
        from opendataloader_pdf_ray.cdc import backfill
        from opendataloader_pdf_ray.functions.text_stats import embed_text

        lake = self._text_lake(tmp_path / "lake")
        backfill(lake, embed_text, name="embed")
        idx = VectorIndex(str(tmp_path / "vi"), num_partitions=4,
                          nbits=4, seed=7, dim=32)
        idx.refresh(lake)
        lineage2 = backfill(lake, embed_text, name="embed2")
        e2 = lineage2[0]["epoch"]
        idx.refresh(lake)
        for part in range(4):
            assert not idx.lake.fs.exists(idx.lake._delta_path(part, e2))


class TestCLI:
    def test_vec_index_and_search_cli(self, tmp_path, capsys, ray_session):
        from opendataloader_pdf_ray.__main__ import main

        lake_root = tmp_path / "lake"
        seed_lake(lake_root)
        assert main(["vec-index", str(lake_root), "--nbits", "4",
                     "--seed", "7"]) == 0
        out = json.loads(capsys.readouterr().out.strip())
        assert out["watermark"] == 2 and out["commits"] > 0
        # watermark short-circuit on the second run
        assert main(["vec-index", str(lake_root)]) == 0
        out2 = json.loads(capsys.readouterr().out.strip())
        assert out2["commits"] == 0 and out2["skipped"] == 0
        # vec-search by live key: a's own vector → itself at cosine 1.0
        assert main(["vec-search", str(lake_root), "a",
                     "--topk", "2", "--probe", "4"]) == 0
        res = json.loads(capsys.readouterr().out.strip())
        assert res["key"] == "a"
        assert res["hits"][0] == {"key": "a", "cosine": 1.0}

    def test_ingest_embed_vec_index(self, tmp_path, capsys, ray_session):
        """ingest --embed --vec-index: the extract stage derives the
        hashed-token embedding per event and the ANN follower stays fresh
        per epoch — vec-search then serves a live url's own vector at 1.0."""
        import pyarrow.parquet as pq

        from opendataloader_pdf_ray.__main__ import main
        from opendataloader_pdf_ray.cdc import Lake
        from opendataloader_pdf_ray.fixtures.gen import gen_events

        events = gen_events(60, 20, seed=5)
        events_path = str(tmp_path / "events.parquet")
        pq.write_table(events, events_path)
        lake_root = str(tmp_path / "lake")
        assert main(["ingest", events_path, lake_root, "--epoch-size", "30",
                     "--partitions", "4", "--mode", "epoch", "--embed",
                     "--vec-index"]) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["vec_index_watermark"] == 1
        live = Lake(lake_root).read_state()
        url = live["url"][0].as_py()
        assert main(["vec-search", lake_root, url, "--topk", "3",
                     "--probe", "2"]) == 0
        hits = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert hits["hits"][0]["key"] == url
        assert hits["hits"][0]["cosine"] == 1.0
        # semantic free-text search: the url's own live text as the query
        # embeds to the identical vector → the url tops the result at 1.0
        text = live.filter(
            pc.equal(live["url"], url))["text"][0].as_py()
        assert main(["vec-search", lake_root, text, "--text", "--topk", "3",
                     "--probe", "2"]) == 0
        sem = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert sem["hits"][0]["key"] == url
        assert sem["hits"][0]["cosine"] == 1.0

    def test_fsck_audits_vec_index(self, tmp_path, capsys, ray_session):
        from opendataloader_pdf_ray.__main__ import main

        lake_root = tmp_path / "lake"
        lake = seed_lake(lake_root)
        idx = VectorIndex(vec_index_root(str(lake_root)), num_partitions=4,
                          nbits=4, seed=7, dim=DIM)
        idx.refresh(lake)
        assert main(["fsck", str(lake_root), "--deep"]) == 0
        rep = json.loads(capsys.readouterr().out.strip())
        assert rep["vecidx"]["ok"] and rep["vecidx"]["issues"] == []

    def test_purge_cli_scrubs_vec_index(self, tmp_path, capsys,
                                        ray_session):
        from opendataloader_pdf_ray.__main__ import main

        lake_root = tmp_path / "lake"
        lake = seed_lake(lake_root)
        idx = VectorIndex(vec_index_root(str(lake_root)), num_partitions=4,
                          nbits=4, seed=7, dim=DIM)
        idx.refresh(lake)
        assert main(["purge", str(lake_root), "a"]) == 0
        report = json.loads(capsys.readouterr().out.strip())
        assert report["vecidx"]["rows_removed"] > 0
        idx2 = VectorIndex(vec_index_root(str(lake_root)))
        assert all(k != "a" for _, k in live_postings(idx2))
