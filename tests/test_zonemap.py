"""Per-commit column zone maps (lake.py `_zone_maps_of` /
`parts_overlapping_range` / `read_range`, export `where_range`): the
Iceberg/Delta data-skipping model over this lake's commit records —
int/timestamp min/max bounds from LIVE rows only, partition-level pruning
sound under LWW folds, pre-feature records conservative, file-deletion
proof that pruned partitions are never opened."""

import json

import numpy as np
import pyarrow as pa
import pytest

from opendataloader_pdf_ray.cdc.ingest import url_partition
from opendataloader_pdf_ray.cdc.lake import Lake, Lineage, _zone_maps_of
from opendataloader_pdf_ray.cdc.merge import merge_base_with_updates

P = 8


def _rows_table(rows):
    """rows: (url, warc_ts, seq, score_or_None, deleted)."""
    return pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "warc_ts": pa.array([r[1] for r in rows], pa.int64()),
        "seq": pa.array([r[2] for r in rows], pa.int64()),
        "score": pa.array([r[3] for r in rows], pa.int64()),
        "deleted": pa.array([r[4] for r in rows], pa.bool_()),
    })


def _commit(lake, epoch, rows, mode="delta"):
    t = _rows_table(rows)
    parts = np.asarray(url_partition([r[0] for r in rows],
                                     lake.num_partitions))
    for part in range(lake.num_partitions):
        sub = t.filter(pa.array(parts == part))
        if sub.num_rows == 0:
            continue
        sub = sub.sort_by([("url", "ascending")])
        seqs = sub["seq"].to_pylist()
        lin = Lineage(part=part, epoch=epoch, events_consumed=sub.num_rows,
                      rows_upserted=sub.num_rows, rows_deleted=0,
                      seq_min=min(seqs), seq_max=max(seqs))
        if mode == "delta":
            lake.commit_delta(part, epoch, sub, lin)
        else:
            base = lake.read_partition(part, as_of=epoch - 1)
            lake.commit_partition(part, epoch,
                                  merge_base_with_updates(base, sub), lin)
    lake.mark_epoch_done(epoch)


class TestZoneMapsOf:
    def test_int_and_timestamp_cols_bounded(self):
        t = pa.table({
            "url": pa.array(["a", "b"]),
            "warc_ts": pa.array([1, 2], pa.int64()),
            "seq": pa.array([1, 2], pa.int64()),
            "score": pa.array([5, -3], pa.int64()),
            "seen_at": pa.array([100, 900], pa.timestamp("us")),
            "name": pa.array(["x", "y"]),          # string: skipped
            "ratio": pa.array([0.5, 1.5], pa.float64()),  # float: skipped
            "deleted": pa.array([False, False]),
        })
        zm = _zone_maps_of(t)
        assert zm == {"score": [-3, 5], "seen_at": [100, 900]}

    def test_tombstones_and_nulls_contribute_nothing(self):
        t = pa.table({
            "url": pa.array(["a", "b", "c"]),
            "score": pa.array([7, None, 99], pa.int64()),
            "deleted": pa.array([False, False, True]),  # c's 99 is dead
        })
        assert _zone_maps_of(t) == {"score": [7, 7]}
        all_dead = pa.table({
            "url": pa.array(["a"]),
            "score": pa.array([42], pa.int64()),
            "deleted": pa.array([True]),
        })
        assert _zone_maps_of(all_dead) == {}  # empty, NOT absent


class TestCommitRecordsCarryZoneMaps:
    def test_delta_and_snapshot_records(self, tmp_path):
        for mode in ("delta", "snap"):
            lake = Lake(str(tmp_path / mode), P)
            _commit(lake, 0, [("u1", 10, 1, 500, False),
                              ("u2", 10, 2, 900, False)], mode)
            for part in range(P):
                if not lake.committed_epochs(part):
                    continue
                rec = lake._read_commit(part, 0)
                assert "zone_maps" in rec
                zm = rec["zone_maps"].get("score")
                assert zm is None or (500 <= zm[0] <= zm[1] <= 900)


class TestPruning:
    def _lake(self, tmp_path):
        lake = Lake(str(tmp_path / "lake"), P)
        # scores land in distinct bands per url group
        rows = [(f"a{i}", 10, i, 100 + i, False) for i in range(6)]
        rows += [(f"b{i}", 10, 50 + i, 9000 + i, False) for i in range(6)]
        _commit(lake, 0, rows)
        return lake

    def test_overlap_matches_brute_force(self, tmp_path):
        lake = self._lake(tmp_path)
        # (5000, 8000) falls inside mixed partitions' [min, max] band —
        # zone maps are rightly imprecise there (soundness only); the
        # other ranges align with the bands and must be exact
        for lo, hi, exact in [(0, 50, True), (100, 105, True),
                              (9000, 9999, True), (5000, 8000, False)]:
            got = set(lake.parts_overlapping_range("score", lo, hi))
            want = set()
            for part in range(P):
                t = lake.read_partition(part)
                if t is None:
                    continue
                from opendataloader_pdf_ray.cdc.merge import live_view

                t = live_view(t)
                vals = [v for v in t["score"].to_pylist() if v is not None]
                if any(lo <= v <= hi for v in vals):
                    want.add(part)
            assert want <= got  # sound: never prunes a matching partition
            if exact:
                assert got == want

    def test_pre_feature_record_is_conservative(self, tmp_path):
        lake = self._lake(tmp_path)
        # strip zone_maps from one partition's commit (older-code record)
        part = next(p for p in range(P) if lake.committed_epochs(p))
        path = lake._commit_path(part, 0)
        with lake.fs.open(path, "rb") as f:
            rec = json.loads(f.read().decode())
        del rec["zone_maps"]
        with lake.fs.open(path, "wb") as f:
            f.write(json.dumps(rec).encode())
        # a range nothing matches still keeps that partition
        assert part in lake.parts_overlapping_range("score", -99, -90)

    def test_unflagged_partition_prunes_after_update(self, tmp_path):
        """Predicate-exit rows leave a stale (conservative) epoch-0 map —
        the partition stays readable and the INLINE filter stays exact."""
        lake = self._lake(tmp_path)
        # move every b* score out of the 9000 band
        _commit(lake, 1, [(f"b{i}", 20, 100 + i, 10 + i, False)
                          for i in range(6)])
        got = lake.parts_overlapping_range("score", 9000, 9999)
        # stale epoch-0 maps keep the b* partitions (conservative) ...
        rows = _collect(lake.read_range("score", 9000, 9999))
        # ... but the exact filter returns nothing
        assert rows == []
        assert len(got) <= P


def _collect(ds):
    tabs = [b for b in ds.iter_batches(batch_format="pyarrow")
            if b.num_rows]
    if not tabs:
        return []
    return pa.concat_tables(tabs).sort_by(
        [("url", "ascending")]).to_pylist()


@pytest.mark.usefixtures("ray_session")
class TestReadRange:
    def _lake(self, tmp_path):
        lake = Lake(str(tmp_path / "lake"), P)
        rows = [(f"u{i:03d}", 10, i, (i * 37) % 1000, False)
                for i in range(40)]
        _commit(lake, 0, rows)
        # epoch 1: move some, delete some
        _commit(lake, 1, [(f"u{i:03d}", 20, 100 + i, 5000 + i, False)
                          for i in range(0, 40, 5)])
        _commit(lake, 2, [(f"u{i:03d}", 30, 200 + i, None, True)
                          for i in range(0, 40, 9)])
        return lake

    def test_matches_brute_filter(self, tmp_path):
        lake = self._lake(tmp_path)
        from opendataloader_pdf_ray.cdc.merge import live_view

        state = lake.read_state()
        want = sorted(
            (r["url"], r["score"]) for r in live_view(state).to_pylist()
            if r["score"] is not None and 100 <= r["score"] <= 5010)
        got = [(r["url"], r["score"])
               for r in _collect(lake.read_range("score", 100, 5010))]
        assert got == want

    def test_pruned_partitions_never_opened(self, tmp_path):
        """File-deletion proof: delete the data files of every partition
        the zone maps exclude — the scan still answers correctly."""
        lake = Lake(str(tmp_path / "lake"), P)
        rows = [(f"a{i}", 10, i, i, False) for i in range(12)]       # 0..11
        rows += [(f"z{i}", 10, 50 + i, 9000 + i, False)
                 for i in range(12)]                                  # 9k..
        _commit(lake, 0, rows)
        keep = set(lake.parts_overlapping_range("score", 9000, 9999))
        assert 0 < len(keep) < P, "fixture must split bands by partition"
        for part in range(P):
            if part in keep:
                continue
            for e in lake.committed_epochs(part):
                p = lake._delta_path(part, e)
                if lake.fs.exists(p):
                    lake.fs.rm_file(p)
        got = [(r["url"], r["score"])
               for r in _collect(lake.read_range("score", 9000, 9999))]
        assert got == sorted((f"z{i}", 9000 + i) for i in range(12))

    def test_export_where_range_cli(self, tmp_path, capsys):
        import pyarrow.dataset as pads

        from opendataloader_pdf_ray.__main__ import main

        lake = self._lake(tmp_path)
        out = str(tmp_path / "sliced")
        assert main(["export", lake.root, out,
                     "--range", "score:100:5010"]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        t = pads.dataset(out, format="parquet").to_table()
        from opendataloader_pdf_ray.cdc.merge import live_view

        want = sorted(
            (r["url"], r["score"])
            for r in live_view(lake.read_state()).to_pylist()
            if r["score"] is not None and 100 <= r["score"] <= 5010)
        got = sorted(zip(t["url"].to_pylist(), t["score"].to_pylist()))
        assert got == want and rep["rows"] == len(want)
        # re-run: same predicate skips every file
        assert main(["export", lake.root, out,
                     "--range", "score:100:5010"]) == 0
        rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep2["files_written"] == 0
        # different predicate: stamped files rewrite instead of wrong skip
        assert main(["export", lake.root, out,
                     "--range", "score:0:99"]) == 0
        rep3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep3["files_written"] > 0
        t3 = pads.dataset(out, format="parquet").to_table()
        assert all(0 <= v <= 99 for v in t3["score"].to_pylist())

    def test_schema_evolution_col_added_later(self, tmp_path):
        """Rows committed before the column existed null-backfill — they
        can never match, and their commits' zone maps (post-feature, col
        absent) prune accordingly."""
        lake = Lake(str(tmp_path / "lake"), P)
        t0 = pa.table({
            "url": pa.array(["old1", "old2"]),
            "warc_ts": pa.array([10, 10], pa.int64()),
            "seq": pa.array([1, 2], pa.int64()),
            "deleted": pa.array([False, False]),
        })
        parts = np.asarray(url_partition(["old1", "old2"], P))
        for part in set(parts.tolist()):
            sub = t0.filter(pa.array(parts == part)).sort_by(
                [("url", "ascending")])
            lake.commit_delta(part, 0, sub, Lineage(
                part=part, epoch=0, events_consumed=sub.num_rows,
                rows_upserted=sub.num_rows, rows_deleted=0,
                seq_min=1, seq_max=2))
        lake.mark_epoch_done(0)
        _commit(lake, 1, [("new1", 20, 10, 777, False)])
        got = [(r["url"], r["score"])
               for r in _collect(lake.read_range("score", 0, 10000))]
        assert got == [("new1", 777)]
