"""Golden end-to-end replay tests (FIXTURES.md §4): final-table-state equality
after (a) straight replay, (b) crash/resume, (c) mid-stream schema change,
(d) Zipf skew under the salted two-phase merge."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from opendataloader_pdf_ray.cdc import Lake, oracle_final_state, replay
from opendataloader_pdf_ray.config import CDCConfig
from opendataloader_pdf_ray.fixtures.gen import gen_events

CFG = CDCConfig(num_partitions=8, num_salts=4, epoch_size=60,
                extract_batch_size=16, extract_concurrency=2)


@pytest.fixture(scope="module")
def events_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cdc") / "events.parquet")
    pq.write_table(gen_events(180, 40, seed=42), path)
    return path


def assert_state_matches_oracle(lake: Lake, events: pa.Table):
    oracle = oracle_final_state(events)
    got = {r["url"]: r for r in lake.read_state(include_tombstones=True).to_pylist()}
    assert set(got) == set(oracle)
    for url, want in oracle.items():
        row = got[url]
        assert row["deleted"] == want["deleted"], url
        assert row["seq"] == want["seq"], url
        # the byte-identical invariant (north_star): distributed text ==
        # single-threaded oracle text, per url
        assert row["text"] == want["text"], url
    # live view excludes tombstones
    live = lake.read_state()
    assert live.num_rows == sum(1 for e in oracle.values() if not e["deleted"])


@pytest.mark.usefixtures("ray_session")
class TestReplay:
    def test_straight_replay_matches_oracle(self, events_path, tmp_path):
        lake = Lake(str(tmp_path / "lake"), CFG.num_partitions)
        lineage = replay(events_path, lake.root, CFG)
        events = pq.read_table(events_path)
        assert_state_matches_oracle(lake, events)
        # lineage accounting: every event consumed exactly once
        assert sum(l["events_consumed"] for l in lineage) == events.num_rows
        assert all(not l["skipped"] for l in lineage)

    def test_crash_resume_identical_state(self, events_path, tmp_path):
        full = Lake(str(tmp_path / "full"), CFG.num_partitions)
        replay(events_path, full.root, CFG)

        crashed = Lake(str(tmp_path / "crashed"), CFG.num_partitions)
        replay(events_path, crashed.root, CFG, max_epoch=1)  # "crash" after epoch 1
        lineage2 = replay(events_path, crashed.root, CFG)    # resume

        # resumed run must not re-apply committed epochs (done markers)
        assert {l["epoch"] for l in lineage2} == {2}
        a = full.read_state(include_tombstones=True).to_pylist()
        b = crashed.read_state(include_tombstones=True).to_pylist()
        assert a == b

    def test_partial_epoch_commit_idempotent(self, events_path, tmp_path):
        """Crash mid-epoch: some partitions committed, epoch not marked done.
        Resume re-runs the epoch; committed partitions are skipped."""
        lake = Lake(str(tmp_path / "partial"), CFG.num_partitions)
        replay(events_path, lake.root, CFG, max_epoch=0)
        # simulate: epoch 1 ran but crashed before the done marker; one
        # partition got committed
        from opendataloader_pdf_ray.cdc.ingest import ingest_epoch
        lineage_mid = ingest_epoch(events_path, lake, 1, CFG)
        assert not os.path.exists(lake.epoch_done_path(1))
        lineage_resume = replay(events_path, lake.root, CFG)
        # epoch-1 partitions must all report skipped on the re-run
        skipped = [l for l in lineage_resume if l["epoch"] == 1]
        assert skipped and all(l["skipped"] for l in skipped)
        # and totals still match the oracle
        assert_state_matches_oracle(lake, pq.read_table(events_path))

    def test_schema_evolution_mid_stream(self, tmp_path):
        events = gen_events(120, 30, seed=7, evolve_from=60)
        path = str(tmp_path / "events_v2.parquet")
        pq.write_table(events, path)
        lake = Lake(str(tmp_path / "lake_v2"), CFG.num_partitions)
        replay(path, lake.root, CFG)
        state = lake.read_state(include_tombstones=True)
        assert "content_type" in state.column_names
        oracle = oracle_final_state(events)
        got = {r["url"]: r for r in state.to_pylist()}
        for url, want in oracle.items():
            assert got[url].get("content_type") == want.get("content_type"), url
        # pre-evolution winners show null content_type
        pre = [u for u, w in oracle.items() if w["seq"] < 60]
        assert any(got[u]["content_type"] is None for u in pre)

    def test_skew_salted_merge(self, tmp_path):
        """All events hammer 3 urls (extreme skew) — salted two-phase merge
        must still produce the oracle state."""
        base = gen_events(150, 3, seed=13)
        path = str(tmp_path / "skew.parquet")
        pq.write_table(base, path)
        cfg = CDCConfig(num_partitions=4, num_salts=4, epoch_size=50,
                        salted_merge=True,
                        extract_batch_size=8, extract_concurrency=2)
        lake = Lake(str(tmp_path / "lake_skew"), cfg.num_partitions)
        replay(path, lake.root, cfg)
        assert_state_matches_oracle(lake, base)

    def test_backlog_equals_epoch_mode(self, events_path, tmp_path):
        """The one-pipeline backlog replay must produce identical state AND
        identical per-(part, epoch) lineage to epoch-by-epoch micro-batching."""
        a = Lake(str(tmp_path / "bl"), CFG.num_partitions)
        lin_a = replay(events_path, a.root, CFG, mode="backlog")
        b = Lake(str(tmp_path / "ep"), CFG.num_partitions)
        lin_b = replay(events_path, b.root, CFG, mode="epoch")
        assert (a.read_state(include_tombstones=True).to_pylist()
                == b.read_state(include_tombstones=True).to_pylist())
        key = lambda l: (l["part"], l["epoch"])  # noqa: E731
        assert sorted(lin_a, key=key) == sorted(lin_b, key=key)

    def test_vacuum_reclaims_but_state_intact(self, events_path, tmp_path):
        """vacuum() removes superseded CoW snapshots; live state, lineage and
        resume behavior are unchanged."""
        import glob

        lake = Lake(str(tmp_path / "vac"), CFG.num_partitions)
        replay(events_path, lake.root, CFG)
        before_state = lake.read_state(include_tombstones=True).to_pylist()
        n_files_before = len(glob.glob(f"{lake.root}/part=*/epoch=*.parquet"))
        removed = lake.vacuum(keep_snapshots=1)
        assert removed > 0
        n_files_after = len(glob.glob(f"{lake.root}/part=*/epoch=*.parquet"))
        assert n_files_after == n_files_before - removed
        # state and lineage unaffected
        assert lake.read_state(include_tombstones=True).to_pylist() == before_state
        assert len(lake.all_lineage()) >= n_files_before
        # resume after vacuum is still a no-op
        assert replay(events_path, lake.root, CFG) == []

    def test_final_snapshot_mode_equals_every_epoch(self, events_path, tmp_path):
        """backlog_snapshots='final' must produce the identical live state;
        lineage collapses to one range-record per touched partition."""
        a = Lake(str(tmp_path / "ev"), CFG.num_partitions)
        replay(events_path, a.root, CFG)
        final_cfg = CDCConfig(num_partitions=CFG.num_partitions,
                              epoch_size=CFG.epoch_size,
                              backlog_snapshots="final",
                              extract_batch_size=16, extract_concurrency=2)
        b = Lake(str(tmp_path / "fin"), CFG.num_partitions)
        lin = replay(events_path, b.root, final_cfg)
        assert (a.read_state(include_tombstones=True).to_pylist()
                == b.read_state(include_tombstones=True).to_pylist())
        # lineage spans the whole range, committed at the last epoch
        assert all(l["epoch"] == max(x["epoch"] for x in lin) for l in lin)
        assert sum(l["events_consumed"] for l in lin) == 180
        # resume is a no-op (all partitions skipped via their final commit)
        lin2 = replay(events_path, b.root, final_cfg)
        assert lin2 == []  # done markers short-circuit the whole range

    def test_epoch_hole_backlog_replay(self, events_path, tmp_path):
        """A hole (epoch committed earlier, out of order) inside the pending
        range: later commits must incorporate the hole epoch's committed
        snapshot instead of silently reverting its upserts (ADVICE r1)."""
        from opendataloader_pdf_ray.cdc.ingest import ingest_epoch, ingest_epochs

        lake = Lake(str(tmp_path / "holes"), CFG.num_partitions)
        ingest_epoch(events_path, lake, 1, CFG)
        ingest_epochs(events_path, lake, [0, 2], CFG)
        assert_state_matches_oracle(lake, pq.read_table(events_path))

    def test_epoch_hole_final_mode(self, events_path, tmp_path):
        from opendataloader_pdf_ray.cdc.ingest import ingest_epoch, ingest_epochs

        cfg = CDCConfig(num_partitions=CFG.num_partitions, epoch_size=CFG.epoch_size,
                        backlog_snapshots="final", extract_batch_size=16,
                        extract_concurrency=2)
        lake = Lake(str(tmp_path / "holes_fin"), cfg.num_partitions)
        ingest_epoch(events_path, lake, 1, cfg)
        ingest_epochs(events_path, lake, [0, 2], cfg)
        assert_state_matches_oracle(lake, pq.read_table(events_path))

    def test_unsalted_equals_salted(self, events_path, tmp_path):
        salted_cfg = CDCConfig(num_partitions=CFG.num_partitions, num_salts=4,
                               epoch_size=CFG.epoch_size, salted_merge=True,
                               extract_batch_size=16, extract_concurrency=2)
        salted = Lake(str(tmp_path / "s"), CFG.num_partitions)
        replay(events_path, salted.root, salted_cfg)
        unsalted_cfg = CDCConfig(num_partitions=CFG.num_partitions, num_salts=1,
                                 epoch_size=CFG.epoch_size, salted_merge=False,
                                 extract_batch_size=16, extract_concurrency=2)
        unsalted = Lake(str(tmp_path / "u"), CFG.num_partitions)
        replay(events_path, unsalted.root, unsalted_cfg)
        assert (salted.read_state(include_tombstones=True).to_pylist()
                == unsalted.read_state(include_tombstones=True).to_pylist())


@pytest.mark.usefixtures("ray_session")
class TestFollowTail:
    """ingest --mode follow: tail a GROWING binlog segment dir, ingesting
    epochs as they complete, exactly-once across restarts (north rule:
    'tails a binlog/WAL stream')."""

    CFG = CDCConfig(num_partitions=4, num_salts=2, epoch_size=60,
                    extract_batch_size=16, extract_concurrency=2)

    def _write_segments(self, table, out_dir, lo, hi, shard=30):
        import os

        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        os.makedirs(out_dir, exist_ok=True)
        part = table.filter((pc.field("seq") >= lo) & (pc.field("seq") < hi))
        for s in range(lo, hi, shard):
            chunk = part.filter((pc.field("seq") >= s)
                                & (pc.field("seq") < s + shard))
            if chunk.num_rows:
                pq.write_table(chunk, f"{out_dir}/seg-{s:06d}.parquet")

    def test_tail_drip_feed_then_resume(self, tmp_path):
        import os

        from opendataloader_pdf_ray.cdc import Lake, oracle_final_state
        from opendataloader_pdf_ray.cdc.ingest import follow
        from opendataloader_pdf_ray.fixtures.gen import gen_events

        events = gen_events(180, 40, seed=42)
        seg_dir = str(tmp_path / "segs")
        lake_root = str(tmp_path / "lake")

        # phase 1: 1.5 epochs present, no stop marker — only the COMPLETE
        # epoch 0 may commit; the tail then idles out (test bound)
        self._write_segments(events, seg_dir, 0, 90)
        lin1 = follow(seg_dir, lake_root, self.CFG, poll_interval=0.05,
                      max_idle_polls=2)
        lake = Lake(lake_root)
        assert lake.is_epoch_done(0) and not lake.is_epoch_done(1)
        assert sum(l["events_consumed"] for l in lin1) == 60

        # phase 2 ("restart" after more segments + stop marker): resumes
        # from the commit log — epoch 0 is skipped outright, 1 and the
        # final partial epoch 2 commit, and the final state equals the
        # whole-log oracle
        self._write_segments(events, seg_dir, 90, 180)
        open(os.path.join(seg_dir, ".end"), "w").close()
        lin2 = follow(seg_dir, lake_root, self.CFG, poll_interval=0.05)
        assert sum(l["events_consumed"] for l in lin2) == 120
        assert lake.is_epoch_done(1) and lake.is_epoch_done(2)
        oracle = oracle_final_state(events)
        got = {r["url"]: r for r in
               lake.read_state(include_tombstones=True).to_pylist()}
        assert set(got) == set(oracle)
        for url, want in oracle.items():
            assert got[url]["text"] == want["text"], url

    def test_half_written_segment_is_waited_out(self, tmp_path):
        import os

        from opendataloader_pdf_ray.cdc import Lake
        from opendataloader_pdf_ray.cdc.ingest import follow
        from opendataloader_pdf_ray.fixtures.gen import gen_events

        events = gen_events(120, 30, seed=7)
        seg_dir = str(tmp_path / "segs")
        self._write_segments(events, seg_dir, 0, 60)
        # a producer mid-write: invalid parquet footer. The density check
        # (max_seq+1 == n_rows) must hold on the READABLE segments only, so
        # epoch 0 still commits; nothing crashes.
        with open(os.path.join(seg_dir, "seg-999999.parquet"), "wb") as f:
            f.write(b"PAR1 not really a footer")
        lake_root = str(tmp_path / "lake")
        follow(seg_dir, lake_root, self.CFG, poll_interval=0.05,
               max_idle_polls=1)
        assert Lake(lake_root).is_epoch_done(0)

    def test_stop_with_hole_raises_instead_of_clean_drain(self, tmp_path):
        import os

        from opendataloader_pdf_ray.cdc.ingest import follow
        from opendataloader_pdf_ray.fixtures.gen import gen_events

        events = gen_events(180, 40, seed=42)
        seg_dir = str(tmp_path / "segs")
        # hole: seqs 60..119 never arrive, producer claims done anyway
        self._write_segments(events, seg_dir, 0, 60)
        self._write_segments(events, seg_dir, 120, 180)
        open(os.path.join(seg_dir, ".end"), "w").close()
        with pytest.raises(RuntimeError, match="non-dense"):
            follow(seg_dir, str(tmp_path / "lake"), self.CFG,
                   poll_interval=0.05, max_idle_polls=2)
