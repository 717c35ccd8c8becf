"""Lake replication tests (cdc/replicate.py): live-state + time-travel
equivalence of the replica, exactly-once re-runs, incremental catch-up,
crash resume, divergence guard, changefeed parity, CLI."""

import dataclasses

import pyarrow.parquet as pq
import pytest

from opendataloader_pdf_ray.cdc import Lake, replicate
from opendataloader_pdf_ray.cdc.ingest import ingest_epoch
from opendataloader_pdf_ray.cdc.lakediff import lake_diff
from opendataloader_pdf_ray.config import CDCConfig
from opendataloader_pdf_ray.fixtures.gen import gen_events

SNAP_CFG = CDCConfig(num_partitions=4, num_salts=2, epoch_size=60,
                     extract_batch_size=16, extract_concurrency=2)
DELTA_CFG = dataclasses.replace(SNAP_CFG, epoch_commits="delta")
N_EPOCHS = 3


@pytest.fixture(scope="module")
def events_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("repl") / "events.parquet")
    pq.write_table(gen_events(180, 40, seed=11), path)
    return path


def state_key(lake: Lake, as_of=None):
    t = lake.read_state(as_of=as_of)
    cols = sorted(t.column_names)
    return t.select(cols).sort_by([("url", "ascending")]).to_pydict()


@pytest.mark.usefixtures("ray_session")
class TestReplicate:
    @pytest.mark.parametrize("cfg", [SNAP_CFG, DELTA_CFG],
                             ids=["snapshot", "delta"])
    def test_replica_equals_primary_at_every_epoch(self, events_path,
                                                   tmp_path, cfg):
        src = Lake(str(tmp_path / "src"), cfg.num_partitions)
        for e in range(N_EPOCHS):
            ingest_epoch(events_path, src, e, cfg)
        out = replicate(src, str(tmp_path / "dst"))
        assert out["commits_applied"] > 0 and out["commits_skipped"] == 0
        dst = Lake(str(tmp_path / "dst"))
        assert lake_diff(src, dst, num_buckets=8).count() == 0
        # epoch-aligned: time travel matches at EVERY checkpoint
        for e in range(N_EPOCHS):
            assert state_key(dst, as_of=e) == state_key(src, as_of=e), e
        # watermarks mirrored
        for e in range(N_EPOCHS):
            assert dst.is_epoch_done(e) == src.is_epoch_done(e)

    def test_rerun_is_all_skip_noop(self, events_path, tmp_path):
        src = Lake(str(tmp_path / "src"), DELTA_CFG.num_partitions)
        for e in range(N_EPOCHS):
            ingest_epoch(events_path, src, e, DELTA_CFG)
        replicate(src, str(tmp_path / "dst"))
        again = replicate(src, str(tmp_path / "dst"))
        assert again["commits_applied"] == 0
        assert again["commits_skipped"] > 0

    def test_incremental_catch_up(self, events_path, tmp_path):
        src = Lake(str(tmp_path / "src"), DELTA_CFG.num_partitions)
        ingest_epoch(events_path, src, 0, DELTA_CFG)
        first = replicate(src, str(tmp_path / "dst"))
        dst = Lake(str(tmp_path / "dst"))
        assert lake_diff(src, dst, num_buckets=8).count() == 0
        for e in range(1, N_EPOCHS):
            ingest_epoch(events_path, src, e, DELTA_CFG)
        second = replicate(src, str(tmp_path / "dst"))
        assert second["commits_applied"] > 0
        assert second["commits_skipped"] >= first["commits_applied"]
        assert lake_diff(src, dst, num_buckets=8).count() == 0

    def test_retention_epoch_replicates_as_deletes(self, events_path,
                                                   tmp_path):
        """A retention epoch (snapshot commit, tombstone flips with no new
        version key) must cross replication: the snapshot-diff winner rule
        carries the flips."""
        from opendataloader_pdf_ray.cdc.retention import apply_retention

        src = Lake(str(tmp_path / "src"), SNAP_CFG.num_partitions)
        for e in range(N_EPOCHS):
            ingest_epoch(events_path, src, e, SNAP_CFG)
        import pyarrow as pa

        ts = sorted(src.read_state()["warc_ts"].cast(pa.int64()).to_pylist())
        apply_retention(src, ts[len(ts) // 2] + 1)
        replicate(src, str(tmp_path / "dst"))
        dst = Lake(str(tmp_path / "dst"))
        assert lake_diff(src, dst, num_buckets=8).count() == 0
        assert state_key(dst) == state_key(src)

    def test_crash_resume_heals(self, events_path, tmp_path):
        src = Lake(str(tmp_path / "src"), DELTA_CFG.num_partitions)
        for e in range(N_EPOCHS):
            ingest_epoch(events_path, src, e, DELTA_CFG)
        replicate(src, str(tmp_path / "dst"))
        dst = Lake(str(tmp_path / "dst"))
        # simulate a crash: drop one replica commit record mid-history
        victim = None
        for p in range(dst.num_partitions):
            epochs = dst.committed_epochs(p)
            if len(epochs) > 1:
                victim = (p, epochs[-1])
                break
        assert victim is not None
        dst.fs.rm(dst._commit_path(*victim))
        healed = replicate(src, str(tmp_path / "dst"))
        assert healed["commits_applied"] == 1
        assert lake_diff(src, dst, num_buckets=8).count() == 0

    def test_changefeed_parity(self, events_path, tmp_path):
        """The replica serves the SAME change feed as the primary — a
        consumer can be repointed without re-seeding."""
        src = Lake(str(tmp_path / "src"), DELTA_CFG.num_partitions)
        for e in range(N_EPOCHS):
            ingest_epoch(events_path, src, e, DELTA_CFG)
        replicate(src, str(tmp_path / "dst"))
        dst = Lake(str(tmp_path / "dst"))

        def feed(lake):
            t = lake.changes().select_columns(
                ["epoch", "op", "url", "seq"]).to_pandas()
            return t.sort_values(["epoch", "url", "seq"]).reset_index(
                drop=True)

        assert feed(src).equals(feed(dst))

    def test_diverged_dst_raises(self, events_path, tmp_path):
        src = Lake(str(tmp_path / "src"), DELTA_CFG.num_partitions)
        ingest_epoch(events_path, src, 0, DELTA_CFG)
        replicate(src, str(tmp_path / "dst"))
        # independent write lands an epoch in dst that src does not have
        dst = Lake(str(tmp_path / "dst"))
        ingest_epoch(events_path, dst, 2, DELTA_CFG)
        ingest_epoch(events_path, src, 1, DELTA_CFG)
        with pytest.raises(Exception, match="independently"):
            replicate(src, str(tmp_path / "dst"))

    def test_follow_replicate_tails_done_markers(self, events_path,
                                                 tmp_path):
        """Follow mode: epochs replicate only once DONE, each exactly once;
        a restarted tail resumes from the replica's own done markers."""
        from opendataloader_pdf_ray.cdc.replicate import follow_replicate

        src = Lake(str(tmp_path / "src"), DELTA_CFG.num_partitions)
        dst_root = str(tmp_path / "dst")
        ingest_epoch(events_path, src, 0, DELTA_CFG)
        src.mark_epoch_done(0)
        gen = follow_replicate(src, dst_root, poll_interval=0.05,
                               max_idle_polls=3)
        win = next(gen)
        assert (win["lo_epoch"], win["hi_epoch"]) == (-1, 0)
        assert win["commits_applied"] > 0
        # epoch 1 commits but is NOT done → the tail must not replicate it
        ingest_epoch(events_path, src, 1, DELTA_CFG)
        assert list(gen) == []
        dst = Lake(dst_root)
        assert max(max(dst.committed_epochs(p) or [-1])
                   for p in range(dst.num_partitions)) == 0
        # mark done + one more epoch; a RESTARTED tail resumes at 1
        src.mark_epoch_done(1)
        ingest_epoch(events_path, src, 2, DELTA_CFG)
        src.mark_epoch_done(2)
        wins = list(follow_replicate(src, dst_root, poll_interval=0.05,
                                     max_idle_polls=3))
        assert len(wins) == 1
        assert (wins[0]["lo_epoch"], wins[0]["hi_epoch"]) == (0, 2)
        assert lake_diff(src, dst, num_buckets=8).count() == 0

    def test_tail_progresses_across_maintenance_epoch(self, events_path,
                                                      tmp_path):
        """Regression: retention/backfill epochs published no epoch-done
        marker, so every done-marker tail stalled at the maintenance epoch
        forever (later ingest epochs invisible despite their own markers).
        apply_retention/backfill now publish the watermark."""
        import pyarrow as pa

        from opendataloader_pdf_ray.cdc.replicate import follow_replicate
        from opendataloader_pdf_ray.cdc.retention import apply_retention

        src = Lake(str(tmp_path / "src"), DELTA_CFG.num_partitions)
        ingest_epoch(events_path, src, 0, DELTA_CFG)
        src.mark_epoch_done(0)
        ts = sorted(src.read_state()["warc_ts"].cast(pa.int64()).to_pylist())
        apply_retention(src, ts[len(ts) // 2] + 1)  # epoch 1, maint marker
        assert src.is_epoch_complete(1) and not src.is_epoch_done(1)
        ingest_epoch(events_path, src, 2, DELTA_CFG)
        src.mark_epoch_done(2)
        wins = list(follow_replicate(src, str(tmp_path / "dst"),
                                     poll_interval=0.05, max_idle_polls=3))
        assert wins and wins[-1]["hi_epoch"] == 2
        assert lake_diff(src, Lake(str(tmp_path / "dst")),
                         num_buckets=8).count() == 0

    def test_cli_round_trip(self, events_path, tmp_path):
        import json
        import subprocess
        import sys

        src = Lake(str(tmp_path / "src"), DELTA_CFG.num_partitions)
        for e in range(N_EPOCHS):
            ingest_epoch(events_path, src, e, DELTA_CFG)
        r = subprocess.run(
            [sys.executable, "-m", "opendataloader_pdf_ray", "replicate",
             str(tmp_path / "src"), str(tmp_path / "dst")],
            capture_output=True, text=True, cwd="/root/repo")
        assert r.returncode == 0, r.stderr[-2000:]
        rec = json.loads(r.stdout.strip().splitlines()[-1])
        assert rec["commits_applied"] > 0
        d = subprocess.run(
            [sys.executable, "-m", "opendataloader_pdf_ray", "diff",
             str(tmp_path / "src"), str(tmp_path / "dst")],
            capture_output=True, text=True, cwd="/root/repo")
        assert d.returncode == 0, d.stderr[-2000:]
        assert json.loads(d.stdout.strip().splitlines()[-1])["equivalent"]
