"""`ray job submit` entrypoint (jobs/replay_job.py): the north-rule
deployment shape — same submit line at N and 4N nodes, resumable on
resubmit. Tested in-process against the session Ray (the script attaches
to an existing session exactly like it attaches to a cluster under
`ray job submit`, and only shuts down a session it started)."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jobs.replay_job import main as job_main
from opendataloader_pdf_ray.fixtures.gen import write_fixture_dir


def _run(argv, capsys):
    rc = job_main(argv)
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    return rc, out


class TestReplayJob:
    def test_backlog_then_resubmit_skips(self, tmp_path, capsys,
                                         ray_session):
        events = tmp_path / "events"
        write_fixture_dir(str(events), 240, 60, seed=11, shard_size=80)
        lake = tmp_path / "lake"
        argv = ["--events", str(events), "--lake", str(lake),
                "--partitions", "4", "--epoch-size", "120",
                "--extract-concurrency", "2"]
        rc, out = _run(argv, capsys)
        assert rc == 0
        assert out["events_applied"] == 240
        assert out["lake_rows"] > 0
        assert out["partition_commits"] == 4  # final-snapshot backlog mode
        assert out["cluster_cpus"] >= 1

        # resubmit: the commit log makes the job a no-op, same lake state
        rc2, out2 = _run(argv, capsys)
        assert rc2 == 0
        assert out2["events_applied"] == 0
        assert out2["partition_commits"] == 0
        assert out2["lake_rows"] == out["lake_rows"]

    def test_epoch_mode_and_delta_commits(self, tmp_path, capsys,
                                          ray_session):
        events = tmp_path / "events"
        write_fixture_dir(str(events), 200, 50, seed=12, shard_size=100)
        lake = tmp_path / "lake"
        rc, out = _run(["--events", str(events), "--lake", str(lake),
                        "--partitions", "4", "--epoch-size", "100",
                        "--mode", "epoch", "--commit-mode", "delta",
                        "--extract-concurrency", "2"], capsys)
        assert rc == 0
        assert out["events_applied"] == 200
        # epoch mode commits per (partition, epoch): 2 epochs × 4 parts
        assert out["partition_commits"] == 8

    def test_follow_mode_tails_to_end_marker(self, tmp_path, capsys,
                                             ray_session):
        events = tmp_path / "events"
        write_fixture_dir(str(events), 160, 40, seed=13, shard_size=80)
        (events / ".end").touch()
        lake = tmp_path / "lake"
        rc, out = _run(["--events", str(events), "--lake", str(lake),
                        "--partitions", "4", "--epoch-size", "80",
                        "--mode", "follow", "--extract-concurrency", "2"],
                       capsys)
        assert rc == 0
        assert out["events_applied"] == 160
        # job reports LIVE rows (tombstones folded out)
        from opendataloader_pdf_ray.cdc import Lake

        assert Lake(str(lake), 4).read_state().num_rows == out["lake_rows"]
