"""Retention / TTL expiry tests (cdc/retention.py): exactly-once tombstone
epoch — expiry correctness, already-dead rows untouched, time travel,
crash/resume, CDC-collision guard, changefeed sees the deletes."""

import pyarrow as pa
import pytest

from opendataloader_pdf_ray.cdc.lake import Lake, Lineage
from opendataloader_pdf_ray.cdc.retention import (_RetentionPartition,
                                                  apply_retention)
from opendataloader_pdf_ray.cdc.backfill import resolve_backfill_epoch

from test_backfill import P, seed_lake

CUT = 1_000_020  # seed warc_ts = 1_000_000 + i, i in 0..39


@pytest.mark.usefixtures("ray_session")
class TestRetention:
    def test_expires_exactly_the_stale_rows(self, tmp_path):
        lake = seed_lake(tmp_path / "lake")  # row 0 already tombstoned
        lineage = apply_retention(lake, CUT)
        assert all(l["epoch"] == 1 and not l["skipped"] for l in lineage)
        # rows 1..19 newly expired (row 0 was already dead — NOT recounted)
        assert sum(l["rows_deleted"] for l in lineage) == 19
        live = lake.read_state()
        assert live.num_rows == 20
        assert min(live["warc_ts"].to_pylist()) >= CUT
        # tombstones kept physically (logical delete, reclaim at compact)
        full = lake.read_state(include_tombstones=True)
        assert full.num_rows == 40

    def test_time_travel_and_replay_idempotent(self, tmp_path):
        lake = seed_lake(tmp_path / "lake", with_tombstone=False)
        lineage = apply_retention(lake, CUT)
        assert lake.read_state(as_of=0).num_rows == 40
        replay = apply_retention(lake, CUT, epoch=lineage[0]["epoch"])
        assert all(l["skipped"] for l in replay)
        # a FINISHED retention re-run claims a fresh epoch and expires 0 rows
        again = apply_retention(lake, CUT)
        assert all(l["epoch"] == 2 for l in again)
        assert sum(l["rows_deleted"] for l in again) == 0

    def test_crash_resume(self, tmp_path):
        lake = seed_lake(tmp_path / "lake")
        epoch = resolve_backfill_epoch(lake, f"retention:{CUT}")
        task = _RetentionPartition(lake.root, P, epoch, CUT, "warc_ts")
        task(pa.table({"part": pa.array([0], pa.int32())}))
        assert lake.is_committed(0, epoch)
        lineage = apply_retention(lake, CUT)
        by_part = {l["part"]: l for l in lineage}
        assert by_part[0]["skipped"]
        assert all(not l["skipped"] for p, l in by_part.items() if p != 0)
        clean = seed_lake(tmp_path / "clean")
        apply_retention(clean, CUT)
        assert lake.read_state(include_tombstones=True).equals(
            clean.read_state(include_tombstones=True))

    def test_cdc_collision_guard(self, tmp_path):
        from opendataloader_pdf_ray.cdc.ingest import _guard_cdc_epoch

        lake = seed_lake(tmp_path / "lake")
        apply_retention(lake, CUT)
        with pytest.raises(RuntimeError, match="retention commit"):
            _guard_cdc_epoch(lake, 0, 1)

    def test_changefeed_classifies_expiry_as_deletes(self, tmp_path):
        from opendataloader_pdf_ray.cdc.changefeed import changes

        lake = seed_lake(tmp_path / "lake", with_tombstone=False)
        apply_retention(lake, CUT)
        feed = changes(lake, since=0, until=1).to_pandas()  # epochs (0, 1]
        assert set(feed["op"]) == {"delete"}
        assert len(feed) == 20
        assert sorted(feed["url"]) == [f"u{i:03d}" for i in range(20)]
