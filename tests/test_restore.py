"""Point-in-time restore tests (cdc/restore.py): live state equals the
target epoch's, post-target inserts tombstoned, deletes resurrected, time
travel across the rollback preserved, crash/resume, branch equivalence
(restore-to-fork == branch-at-fork live state), changefeed classification,
CDC-collision guard, vacuumed-target loud-fail."""

import pyarrow as pa
import pytest

from opendataloader_pdf_ray.cdc import Lake, url_partition
from opendataloader_pdf_ray.cdc.backfill import resolve_backfill_epoch
from opendataloader_pdf_ray.cdc.lake import Lineage
from opendataloader_pdf_ray.cdc.restore import (_RestorePartition,
                                                apply_restore)

from test_backfill import P, seed_lake


def _commit_epoch(lake: Lake, epoch: int, urls, ts, texts, deleted):
    """Direct delta commit of one epoch across partitions."""
    t = pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(ts, pa.int64()),
        "seq": pa.array(ts, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "deleted": pa.array(deleted),
    })
    parts = url_partition(urls, P)
    for part in range(P):
        sub = t.filter(pa.array(parts == part)).sort_by(
            [("url", "ascending")])
        if not sub.num_rows:
            continue
        seqs = sub["seq"].to_pylist()
        lake.commit_delta(part, epoch, sub, Lineage(
            part=part, epoch=epoch, events_consumed=sub.num_rows,
            rows_upserted=sub.num_rows, rows_deleted=0,
            seq_min=min(seqs), seq_max=max(seqs)))


def seed_three_epochs(root) -> Lake:
    """Epoch 0: u000..u039 live (seed_lake). Epoch 1: delete u001/u002,
    update u003. Epoch 2: insert v900/v901, update u004."""
    lake = seed_lake(root, with_tombstone=False)
    _commit_epoch(lake, 1,
                  ["u001", "u002", "u003"],
                  [2_000_001, 2_000_002, 2_000_003],
                  [None, None, "updated three"],
                  [True, True, False])
    _commit_epoch(lake, 2,
                  ["v900", "v901", "u004"],
                  [3_000_000, 3_000_001, 3_000_004],
                  ["new nine hundred", "new nine oh one", "updated four"],
                  [False, False, False])
    return lake


@pytest.mark.usefixtures("ray_session")
class TestRestore:
    def test_live_state_equals_target(self, tmp_path):
        lake = seed_three_epochs(tmp_path / "lake")
        want = lake.read_state(as_of=1)
        lineage = apply_restore(lake, 1)
        assert all(l["epoch"] == 3 and not l["skipped"] for l in lineage)
        assert lake.read_lineage(lineage[0]["part"], 3).kind == "restore"
        got = lake.read_state()
        assert got.sort_by("url").equals(want.sort_by("url"))
        # post-target inserts are tombstones, not gone: history + changefeed
        full = lake.read_state(include_tombstones=True)
        urls = dict(zip(full["url"].to_pylist(),
                        full["deleted"].to_pylist()))
        assert urls["v900"] and urls["v901"]
        # lineage counted exactly the two tombstoned inserts
        assert sum(l["rows_deleted"] for l in lineage) == 2

    def test_resurrects_and_reverts(self, tmp_path):
        lake = seed_three_epochs(tmp_path / "lake")
        apply_restore(lake, 0)
        got = lake.read_state().sort_by("url")
        assert got.num_rows == 40  # u001/u002 resurrected, v90x tombstoned
        by_url = dict(zip(got["url"].to_pylist(), got["text"].to_pylist()))
        assert by_url["u003"].startswith("some body text")  # reverted
        assert by_url["u004"].startswith("some body text")
        # reverted rows keep their ORIGINAL versions (LWW provenance)
        ts = dict(zip(got["url"].to_pylist(), got["warc_ts"].to_pylist()))
        assert ts["u003"] == 1_000_003

    def test_time_travel_across_restore(self, tmp_path):
        lake = seed_three_epochs(tmp_path / "lake")
        before = {e: lake.read_state(as_of=e) for e in (0, 1, 2)}
        apply_restore(lake, 1)
        for e, want in before.items():
            assert lake.read_state(as_of=e).equals(want)
        # roll FORWARD again: restore to the undone epoch 2
        apply_restore(lake, 2)
        assert lake.read_state().sort_by("url").equals(
            before[2].sort_by("url"))

    def test_crash_resume_and_determinism(self, tmp_path):
        lake = seed_three_epochs(tmp_path / "lake")
        epoch = resolve_backfill_epoch(lake, "restore:1")
        task = _RestorePartition(lake.root, P, epoch, 1)
        task(pa.table({"part": pa.array([0], pa.int32())}))
        assert lake.is_committed(0, epoch)
        lineage = apply_restore(lake, 1)
        by_part = {l["part"]: l for l in lineage}
        assert by_part[0]["skipped"]
        assert all(not l["skipped"] for p, l in by_part.items() if p != 0)
        clean = seed_three_epochs(tmp_path / "clean")
        apply_restore(clean, 1)
        assert lake.read_state(include_tombstones=True).equals(
            clean.read_state(include_tombstones=True))

    def test_restore_matches_branch_at_fork(self, tmp_path):
        """Composability: restoring the parent to E gives the same live
        state as a branch forked at E (verified by the distributed lake
        differ — the two lakes even have different physical layouts)."""
        from opendataloader_pdf_ray.cdc.lakediff import lake_diff

        lake = seed_three_epochs(tmp_path / "lake")
        br = lake.branch(str(tmp_path / "br"), at=1, name="pin")
        apply_restore(lake, 1)
        drift = lake_diff(lake, br).take_all()
        assert drift == [], drift

    def test_changefeed_classifies_the_rollback(self, tmp_path):
        from opendataloader_pdf_ray.cdc.changefeed import changes

        lake = seed_three_epochs(tmp_path / "lake")
        apply_restore(lake, 1)
        feed = changes(lake, since=2, until=3).to_pandas()  # epochs (2, 3]
        ops = dict(zip(feed["url"], feed["op"]))
        assert ops["v900"] == "delete" and ops["v901"] == "delete"
        assert ops["u004"] == "update"  # reverted value
        assert len(feed) == 3

    def test_guards(self, tmp_path):
        from opendataloader_pdf_ray.cdc.ingest import _guard_cdc_epoch

        lake = seed_three_epochs(tmp_path / "lake")
        with pytest.raises(ValueError, match="not in the past"):
            apply_restore(lake, 2)  # newest epoch — nothing to roll back
        apply_restore(lake, 1)
        with pytest.raises(RuntimeError, match="restore commit"):
            _guard_cdc_epoch(lake, 0, 3)

    def test_vacuumed_target_fails_loudly(self, tmp_path):
        lake = seed_lake(tmp_path / "lake", with_tombstone=False)
        _commit_epoch(lake, 1, ["u001"], [2_000_001], [None], [True])
        # destroy epoch-0 history on every partition (simulated vacuum gone
        # wrong: no data file survives at/before the target)
        import os
        for part in range(P):
            for name in os.listdir(lake._part_dir(part)):
                if name.startswith("epoch=0"):
                    os.unlink(os.path.join(lake._part_dir(part), name))
        with pytest.raises(Exception, match="no longer time-travelable"):
            apply_restore(lake, 0)

    def test_follower_index_tracks_restore(self, tmp_path):
        """The text index folds the restore epoch like any other commit:
        post-restore search reflects the restored live text (retractions
        for post-target tokens, re-applies for resurrected ones), and index
        time travel still sees the pre-restore postings."""
        from opendataloader_pdf_ray.cdc import TextIndex

        from test_textindex import live_postings
        from test_textindex import seed_lake as seed_ti_lake

        lake = seed_ti_lake(tmp_path / "lake")
        idx = TextIndex(str(tmp_path / "ti"), num_partitions=4)
        idx.refresh(lake)
        pre = live_postings(idx)  # epoch-2 live: fox/red/wolf on a
        apply_restore(lake, 0)    # restore epoch 3
        idx.refresh(lake)
        assert live_postings(idx) == [
            ("blue", "b"), ("fox", "a"), ("fox", "b"),
            ("jumps", "a"), ("red", "a")]
        assert live_postings(idx, as_of=2) == pre
