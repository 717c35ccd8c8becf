"""Single-writer fencing (Lake.acquire_writer / check_writer): a newer
tail or maintenance op bumps the generation token and any zombie holder of
an older token dies loudly at its next poll instead of double-writing.
The commit log keeps a fenced writer's progress resumable."""

import os

import pytest

from opendataloader_pdf_ray.cdc import Lake, WriterFencedError
from opendataloader_pdf_ray.cdc.ingest import CDCConfig
from opendataloader_pdf_ray.fixtures.gen import gen_events

CFG = CDCConfig(num_partitions=4, num_salts=2, epoch_size=60,
                extract_batch_size=16, extract_concurrency=2)


def _write_segments(table, out_dir, lo, hi, shard=30):
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    part = table.filter((pc.field("seq") >= lo) & (pc.field("seq") < hi))
    for s in range(lo, hi, shard):
        chunk = part.filter((pc.field("seq") >= s)
                            & (pc.field("seq") < s + shard))
        if chunk.num_rows:
            pq.write_table(chunk, f"{out_dir}/seg-{s:06d}.parquet")


class TestToken:
    def test_latest_acquire_wins(self, tmp_path):
        lake = Lake(str(tmp_path / "lake"), 4)
        a = lake.acquire_writer("host:1:tail")
        lake.check_writer(a)  # still current
        b = lake.acquire_writer("host:2:tail")
        assert b["gen"] == a["gen"] + 1
        lake.check_writer(b)
        with pytest.raises(WriterFencedError, match="owned by"):
            lake.check_writer(a)

    def test_same_owner_reacquire_still_fences_old_token(self, tmp_path):
        """Fencing is per-TOKEN, not per-owner: a restarted process with
        the same host:pid must still invalidate its previous incarnation's
        token (generation is the identity)."""
        lake = Lake(str(tmp_path / "lake"), 4)
        a = lake.acquire_writer("host:1:tail")
        b = lake.acquire_writer("host:1:tail")
        lake.check_writer(b)
        with pytest.raises(WriterFencedError):
            lake.check_writer(a)

    def test_writer_file_is_inert_to_commit_parsers(self, tmp_path,
                                                    ray_session):
        """writer.json lives in _commits/ — committed_epochs and fsck
        filter on part-*.json / epoch-*.done, so the token is invisible
        to them."""
        from opendataloader_pdf_ray.cdc.ingest import ingest_epoch
        import pyarrow.parquet as pq

        events = gen_events(60, 20, seed=3)
        p = str(tmp_path / "events.parquet")
        pq.write_table(events, p)
        lake = Lake(str(tmp_path / "lake"), CFG.num_partitions)
        ingest_epoch(p, lake, 0, CFG)
        lake.acquire_writer("host:1:tail")
        assert all(lake.committed_epochs(k) in ([], [0])
                   for k in range(4))
        assert lake.verify(deep=True)["ok"]


@pytest.mark.usefixtures("ray_session")
class TestFollowFenced:
    def test_zombie_tail_dies_at_next_poll(self, tmp_path):
        """Deterministic takeover: a fake follower steals the writer token
        during the first poll's refresh (standing in for a second tail
        starting elsewhere); this tail must raise WriterFencedError at its
        next poll, not keep writing."""
        from opendataloader_pdf_ray.cdc.ingest import follow

        events = gen_events(120, 30, seed=11)
        seg_dir = str(tmp_path / "segs")
        lake_root = str(tmp_path / "lake")
        _write_segments(events, seg_dir, 0, 60)  # epoch 0 complete

        class Thief:
            stole = False

            def refresh(self, lake):
                Lake(lake_root).acquire_writer("other-host:9:tail")
                Thief.stole = True

        with pytest.raises(WriterFencedError, match="fenced"):
            follow(seg_dir, lake_root, CFG, poll_interval=0.05,
                   max_idle_polls=10, followers=[Thief()])
        assert Thief.stole
        # the fenced tail's progress is intact and resumable: a NEW tail
        # (fresh acquire) drains the rest of the log exactly-once
        lake = Lake(lake_root)
        assert lake.is_epoch_done(0)
        _write_segments(events, seg_dir, 60, 120)
        open(os.path.join(seg_dir, ".end"), "w").close()
        lin = follow(seg_dir, lake_root, CFG, poll_interval=0.05)
        assert sum(l["events_consumed"] for l in lin) == 60  # epoch 1 only
        assert lake.is_epoch_done(1)


@pytest.mark.usefixtures("ray_session")
class TestMaintenanceFences:
    def _lake(self, tmp_path):
        import pyarrow.parquet as pq

        events = gen_events(60, 20, seed=5)
        p = str(tmp_path / "events.parquet")
        pq.write_table(events, p)
        from opendataloader_pdf_ray.cdc.ingest import ingest_epoch

        lake = Lake(str(tmp_path / "lake"), CFG.num_partitions)
        ingest_epoch(p, lake, 0, CFG)
        lake.mark_epoch_done(0)
        return lake

    def test_retention_fences_running_tail(self, tmp_path):
        import pyarrow as pa

        from opendataloader_pdf_ray.cdc.retention import apply_retention

        lake = self._lake(tmp_path)
        tail_tok = lake.acquire_writer("host:1:tail")
        ts = sorted(lake.read_state()["warc_ts"].cast(pa.int64())
                    .to_pylist())
        apply_retention(lake, ts[len(ts) // 2] + 1)
        with pytest.raises(WriterFencedError):
            lake.check_writer(tail_tok)

    def test_backfill_fences_running_tail(self, tmp_path):
        from opendataloader_pdf_ray.cdc.backfill import backfill
        from opendataloader_pdf_ray.functions import text_stats

        lake = self._lake(tmp_path)
        tail_tok = lake.acquire_writer("host:1:tail")
        backfill(lake, text_stats.token_stats)
        with pytest.raises(WriterFencedError):
            lake.check_writer(tail_tok)

    def test_follow_replicate_owns_replica_token(self, tmp_path):
        from opendataloader_pdf_ray.cdc.replicate import follow_replicate

        lake = self._lake(tmp_path)
        dst_root = str(tmp_path / "dst")
        wins = list(follow_replicate(lake, dst_root, poll_interval=0.05,
                                     max_idle_polls=2))
        assert wins and wins[0]["hi_epoch"] == 0
        tok = Lake(dst_root).writer_token()
        assert tok and tok["owner"].endswith(":replicate")
