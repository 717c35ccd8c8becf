"""Bucketed range index (cdc/rangeindex.py): diff emitter semantics,
inclusive range scan with bucket-partition pruning, time travel, persistent
(col, width) config, float refusal, timestamp canonicalization,
compact/fsck/purge, idempotent refresh, CLI."""

import json

import numpy as np
import pyarrow as pa
import pytest

from opendataloader_pdf_ray.cdc import Lake
from opendataloader_pdf_ray.cdc.ingest import url_partition
from opendataloader_pdf_ray.cdc.lake import Lineage
from opendataloader_pdf_ray.cdc.rangeindex import (RangeIndex,
                                                   bucket_partition,
                                                   canon_i64,
                                                   range_index_root)

P = 2


def _ep(lk: Lake, e: int, rows) -> None:
    """(url, ts, deleted, score) rows routed to their hash partitions."""
    parts = url_partition(np.array([r[0] for r in rows], object), P)
    for p in range(P):
        sub = sorted(r for r, pp in zip(rows, parts) if pp == p)
        if not sub:
            continue
        t = pa.table({
            "url": pa.array([r[0] for r in sub], pa.string()),
            "warc_ts": pa.array([r[1] for r in sub], pa.int64()),
            "seq": pa.array([r[1] for r in sub], pa.int64()),
            "deleted": pa.array([r[2] for r in sub], pa.bool_()),
            "score": pa.array([r[3] for r in sub], pa.int64()),
        })
        lk.commit_delta(p, e, t, Lineage(
            part=p, epoch=e, events_consumed=len(sub),
            rows_upserted=len(sub), rows_deleted=0,
            seq_min=sub[0][1], seq_max=sub[-1][1]))
    lk.mark_epoch_done(e)


@pytest.fixture()
def lake(tmp_path):
    lk = Lake(str(tmp_path / "lake"), P)
    _ep(lk, 0, [("a", 1, False, 10), ("b", 2, False, 250),
                ("c", 3, False, 420), ("n", 4, False, None)])
    # a moves buckets (10→305), b is deleted
    _ep(lk, 1, [("a", 5, False, 305), ("b", 6, True, None)])
    return lk


def _idx(lake, **kw):
    idx = RangeIndex(range_index_root(lake.root, "score"), 8,
                     col=kw.pop("col", "score"),
                     width=kw.pop("width", 100), **kw)
    idx.refresh(lake)
    return idx


def _pairs(t: pa.Table):
    return [(r["key"], r["val"]) for r in t.to_pylist()]


@pytest.mark.usefixtures("ray_session")
class TestRangeIndex:
    def test_emitter_and_inclusive_scan(self, lake):
        """Value change retracts the old bucket row and applies the new;
        delete retracts; NULL never indexed; bounds are inclusive."""
        idx = _idx(lake)
        assert _pairs(idx.scan_range_local(0, 1000)) == \
            [("a", 305), ("c", 420)]
        assert _pairs(idx.scan_range_local(305, 420)) == \
            [("a", 305), ("c", 420)]  # both endpoints inclusive
        assert _pairs(idx.scan_range_local(306, 419)) == []
        assert "n" not in set(idx.read_state()["key"].to_pylist())

    def test_bucket_pruning(self, lake):
        """A narrow scan probes only the partitions of its overlapping
        buckets, never all of them."""
        idx = _idx(lake)
        parts = idx._probe_parts(400, 450)  # one bucket (4)
        assert parts == [int(bucket_partition([4], idx.num_partitions)[0])]
        assert len(idx._probe_parts(0, 99)) == 1
        # wide scan degrades to every partition
        assert idx._probe_parts(0, 100 * 100 * 8 * 5) == list(range(8))

    def test_time_travel(self, lake):
        idx = _idx(lake)
        assert _pairs(idx.scan_range_local(0, 1000, as_of=0)) == \
            [("a", 10), ("b", 250), ("c", 420)]

    def test_distributed_scan_matches_local(self, lake):
        idx = _idx(lake)
        got = sorted((r["key"], r["val"])
                     for r in idx.scan_range(0, 1000).take_all())
        assert got == _pairs(idx.scan_range_local(0, 1000))

    def test_incremental_refresh_unchanged_skip(self, lake):
        idx = _idx(lake)
        # epoch 2: c rewritten with the SAME score — emitter must not emit
        _ep(lake, 2, [("c", 7, False, 420), ("a", 8, False, 11)])
        idx.refresh(lake)
        assert _pairs(idx.scan_range_local(0, 1000)) == \
            [("a", 11), ("c", 420)]
        part = int(bucket_partition([4], idx.num_partitions)[0])
        st = idx.read_partition(part)
        c_rows = [r for r in st.to_pylist() if r["key"] == "c"]
        assert [r["epoch"] for r in c_rows] == [0]  # no epoch-2 re-emit

    def test_config_persisted_and_guarded(self, lake):
        _idx(lake)
        reopened = RangeIndex(range_index_root(lake.root, "score"))
        assert reopened.col == "score" and reopened.width == 100
        with pytest.raises(ValueError, match="indexes column"):
            RangeIndex(range_index_root(lake.root, "score"), col="other")
        with pytest.raises(ValueError, match="bucket width"):
            RangeIndex(range_index_root(lake.root, "score"), width=50)
        with pytest.raises(ValueError, match="needs col"):
            RangeIndex(range_index_root(lake.root, "other"), 4)

    def test_float_refused(self, lake):
        import pyarrow.compute as pc

        with pytest.raises(TypeError, match="quantize floats"):
            canon_i64(1.5)

    def test_timestamp_canonicalization(self, lake):
        """Indexing warc_ts (timestamp[us] in real lakes; int64 here) and
        probing with datetimes both canonicalize to epoch-microseconds."""
        import datetime as dt

        ts = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
        assert canon_i64(ts) == int(ts.timestamp() * 1_000_000)
        naive = dt.datetime(2026, 1, 1)
        assert canon_i64(naive) == canon_i64(ts)  # naive == UTC

    def test_compact_verify_purge(self, lake):
        idx = _idx(lake)
        assert idx.compact() >= 1
        assert idx.verify(deep=True)["ok"]
        idx.purge_keys(["a"])
        assert _pairs(idx.scan_range_local(300, 310)) == []
        assert idx.verify(deep=True)["ok"]

    def test_refresh_idempotent(self, lake):
        idx = _idx(lake)
        assert idx.refresh(lake) == []
        before = _pairs(idx.read_state())
        idx._set_watermark(-1)
        lineage = idx.refresh(lake)
        assert lineage and all(r["skipped"] for r in lineage)
        assert _pairs(idx.read_state()) == before

    def test_cli(self, lake, tmp_path, capsys):
        from opendataloader_pdf_ray.__main__ import main

        assert main(["range-index", lake.root, "score",
                     "--width", "100"]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["column"] == "score" and rep["watermark"] == 1
        assert main(["range-scan", lake.root, "score", "300", "430",
                     "--rows"]) == 0
        out = [json.loads(l) for l in
               capsys.readouterr().out.strip().splitlines()]
        assert out[0] == {"key": "a", "val": 305}
        assert out[1] == {"key": "c", "val": 420}
        assert out[2] == {"rows": 2}
        assert main(["fsck", lake.root, "--deep"]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["rangeidx_score"]["ok"]
        assert main(["stats", lake.root]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert "rangeidx_score" in rep
        assert main(["purge", lake.root, "c"]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["rangeidx_score"]["rows_removed"] >= 1

    def test_ingest_range_index_follower(self, tmp_path, capsys):
        """CLI ingest --range-index COL:W — the index refreshes after the
        replay and range scans match the lake's live values (n_blocks is an
        extract-derived int column)."""
        import pyarrow.parquet as pq

        from opendataloader_pdf_ray.__main__ import main
        from opendataloader_pdf_ray.fixtures.gen import gen_events

        events = str(tmp_path / "events.parquet")
        pq.write_table(gen_events(90, 25, seed=7), events)
        lake_root = str(tmp_path / "lake")
        assert main(["ingest", events, lake_root, "--partitions", "4",
                     "--epoch-size", "45", "--commit-mode", "delta",
                     "--range-index", "n_blocks:5"]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["range_index_n_blocks_watermark"] == 1
        idx = RangeIndex(range_index_root(lake_root, "n_blocks"))
        assert idx.width == 5
        live = Lake(lake_root).read_state()
        want = sorted((u, int(n)) for u, n in
                      zip(live["url"].to_pylist(),
                          live["n_blocks"].to_pylist()) if n is not None)
        got = _pairs(idx.scan_range_local(0, 1 << 40))
        assert got == want

    def test_compact_cli_folds_indexes(self, lake, capsys):
        """`compact LAKE` also folds + vacuums colidx_*/rangeidx_*
        keyspaces (distributed, retractions pruned)."""
        from opendataloader_pdf_ray.__main__ import main

        idx = _idx(lake)
        assert main(["compact", lake.root]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["rangeidx_score_compacted"] >= 1
        assert idx.verify(deep=True)["ok"]
        assert _pairs(idx.scan_range_local(0, 1000)) == \
            [("a", 305), ("c", 420)]


@pytest.mark.usefixtures("ray_session")
class TestIndexIntersection:
    """index_lookup / CLI lookup-where: AND-compose column + range
    indexes; empty-intersection short-circuit; missing-index loud fail;
    as_of consistency across indexes and payload."""

    def _lake(self, tmp_path):
        from opendataloader_pdf_ray.cdc.colindex import (ColumnIndex,
                                                         col_index_root)
        lk = Lake(str(tmp_path / "lake"), P)
        rows = [("a", 1, False, 120, "en"), ("b", 2, False, 250, "en"),
                ("c", 3, False, 130, "de"), ("d", 4, False, 400, "en"),
                ("e", 5, False, 125, "fr")]
        parts = url_partition(np.array([r[0] for r in rows], object), P)
        for p in range(P):
            sub = sorted(r for r, pp in zip(rows, parts) if pp == p)
            if not sub:
                continue
            t = pa.table({
                "url": pa.array([r[0] for r in sub], pa.string()),
                "warc_ts": pa.array([r[1] for r in sub], pa.int64()),
                "seq": pa.array([r[1] for r in sub], pa.int64()),
                "deleted": pa.array([r[2] for r in sub], pa.bool_()),
                "score": pa.array([r[3] for r in sub], pa.int64()),
                "lang": pa.array([r[4] for r in sub], pa.string()),
            })
            lk.commit_delta(p, 0, t, Lineage(
                part=p, epoch=0, events_consumed=len(sub),
                rows_upserted=len(sub), rows_deleted=0,
                seq_min=sub[0][1], seq_max=sub[-1][1]))
        lk.mark_epoch_done(0)
        RangeIndex(range_index_root(lk.root, "score"), 8, col="score",
                   width=100).refresh(lk)
        ColumnIndex(col_index_root(lk.root, "lang"), 8,
                    col="lang").refresh(lk)
        return lk

    def test_and_intersection(self, tmp_path):
        from opendataloader_pdf_ray.cdc.planner import index_lookup

        lk = self._lake(tmp_path)
        # en AND score in [100, 200] → a only (b is en but 250; e is 125
        # but fr; c is 130 but de)
        keys, table = index_lookup(lk, eq={"lang": ["en"]},
                                   ranges={"score": (100, 200)})
        assert keys == ["a"]
        assert table["score"].to_pylist() == [120]
        # IN-list widens: en or fr → a, e
        keys, _ = index_lookup(lk, eq={"lang": ["en", "fr"]},
                               ranges={"score": (100, 200)}, rows=False)
        assert keys == ["a", "e"]

    def test_empty_short_circuit_and_missing_index(self, tmp_path):
        from opendataloader_pdf_ray.cdc.planner import index_lookup

        lk = self._lake(tmp_path)
        keys, table = index_lookup(lk, eq={"lang": ["ko"]},
                                   ranges={"score": (0, 10_000)})
        assert keys == [] and table is None
        with pytest.raises(ValueError, match="no range index on 'other'"):
            index_lookup(lk, ranges={"other": (0, 1)})
        with pytest.raises(ValueError, match="at least one predicate"):
            index_lookup(lk)

    def test_cli(self, tmp_path, capsys):
        from opendataloader_pdf_ray.__main__ import main

        lk = self._lake(tmp_path)
        assert main(["lookup-where", lk.root, "--eq", "lang=en,fr",
                     "--range", "score:100:200", "--rows"]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep == {"n_urls": 2, "urls": ["a", "e"], "rows": 2}


@pytest.mark.usefixtures("ray_session")
class TestFilteredExport:
    """export --eq: exact slice, predicate-aware resume stamps, and
    index-driven partition pruning (proven by deleting the non-matching
    partitions' data files)."""

    def _lake(self, tmp_path):
        from opendataloader_pdf_ray.cdc.colindex import (ColumnIndex,
                                                         col_index_root)
        lk = Lake(str(tmp_path / "lake"), 4)
        rows = [(f"u{i:02d}", i + 1, False, "ko" if i % 3 == 0 else "en")
                for i in range(12)]
        parts = url_partition(np.array([r[0] for r in rows], object), 4)
        for p in range(4):
            sub = sorted(r for r, pp in zip(rows, parts) if pp == p)
            if not sub:
                continue
            t = pa.table({
                "url": pa.array([r[0] for r in sub], pa.string()),
                "warc_ts": pa.array([r[1] for r in sub], pa.int64()),
                "seq": pa.array([r[1] for r in sub], pa.int64()),
                "deleted": pa.array([r[2] for r in sub], pa.bool_()),
                "lang": pa.array([r[3] for r in sub], pa.string()),
            })
            lk.commit_delta(p, 0, t, Lineage(
                part=p, epoch=0, events_consumed=len(sub),
                rows_upserted=len(sub), rows_deleted=0,
                seq_min=sub[0][1], seq_max=sub[-1][1]))
        lk.mark_epoch_done(0)
        ColumnIndex(col_index_root(lk.root, "lang"), 8,
                    col="lang").refresh(lk)
        return lk

    def test_slice_resume_and_predicate_stamp(self, tmp_path):
        import pyarrow.dataset as pads

        lk = self._lake(tmp_path)
        out = str(tmp_path / "ko")
        s1 = lk.export_resumable(out, where_eq={"lang": ["ko"]})
        got = pads.dataset(out, format="parquet").to_table()
        want_urls = sorted(f"u{i:02d}" for i in range(12) if i % 3 == 0)
        assert sorted(got["url"].to_pylist()) == want_urls
        assert set(got["lang"].to_pylist()) == {"ko"}
        # resume: same predicate skips everything
        s2 = lk.export_resumable(out, where_eq={"lang": ["ko"]})
        assert all(s["skipped"] for s in s2)
        # predicate change: stamps force a rewrite, not a wrong skip
        s3 = lk.export_resumable(out, where_eq={"lang": ["en"]})
        assert not any(s["skipped"] for s in s3)
        got = pads.dataset(out, format="parquet").to_table()
        assert set(got["lang"].to_pylist()) == {"en"}

    def test_partition_pruning_via_index(self, tmp_path):
        """Partitions the index proves empty for the predicate are never
        read: delete their data files; the filtered export still succeeds."""
        import os

        import pyarrow.dataset as pads

        lk = self._lake(tmp_path)
        ko_urls = [f"u{i:02d}" for i in range(12) if i % 3 == 0]
        ko_parts = set(url_partition(np.array(ko_urls, object), 4).tolist())
        skipped_parts = set(range(4)) - ko_parts
        if not skipped_parts:
            pytest.skip("hash layout put ko urls in every partition")
        for p in skipped_parts:
            for name in os.listdir(lk._part_dir(p)):
                if name.endswith(".parquet"):
                    os.unlink(os.path.join(lk._part_dir(p), name))
        out = str(tmp_path / "ko")
        lk.export_resumable(out, where_eq={"lang": ["ko"]})
        got = pads.dataset(out, format="parquet").to_table()
        assert sorted(got["url"].to_pylist()) == sorted(ko_urls)

    def test_cli_and_hive_compose(self, tmp_path, capsys):
        import pyarrow.dataset as pads

        from opendataloader_pdf_ray.__main__ import main

        lk = self._lake(tmp_path)
        out = str(tmp_path / "slice")
        assert main(["export", lk.root, out, "--eq", "lang=ko",
                     "--partition-by", "lang"]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        got = pads.dataset(out + "/lang=ko", format="parquet").to_table()
        assert got.num_rows == rep["rows"] == 4
        import os
        assert not os.path.exists(out + "/lang=en")
