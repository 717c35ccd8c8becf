"""Lake packing tests (cdc/pack.py): manifest correctness (every token
covered exactly once, budget respected, span bookkeeping), resumable skip
+ churn-only rewrite, determinism, tombstone exclusion."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from opendataloader_pdf_ray.cdc.lake import Lake
from opendataloader_pdf_ray.cdc.pack import pack_lake
from opendataloader_pdf_ray.cdc.retention import apply_retention

from test_backfill import seed_lake
from test_lakediff import seed_p

BUDGET = 16


def read_manifest(out):
    import pyarrow.dataset as pads

    return pads.dataset(str(out), format="parquet").to_table().to_pandas()


@pytest.mark.usefixtures("ray_session")
class TestPackLake:
    def test_manifest_invariants(self, tmp_path):
        lake = seed_p(tmp_path / "lake", 4)
        summary = pack_lake(lake, str(tmp_path / "out"), budget=BUDGET)
        assert all(not s["skipped"] for s in summary)
        m = read_manifest(tmp_path / "out")
        # every doc token covered exactly once: per-doc coverage == count
        covered = (m["tok_end"] - m["tok_start"]).groupby(m["url"]).sum()
        assert (covered == 8).all()  # seed docs are 8 words each
        # slices within a sequence stay inside the budget
        assert (m["tok_end"] <= BUDGET).all()
        assert (m["tok_start"] >= 0).all()
        # within a (part, seq), slices tile [0, n) contiguously
        for (_, _), g in m.groupby(["part", "seq_id"]):
            g = g.sort_values("tok_start")
            assert g["tok_start"].iloc[0] == 0
            assert (g["tok_start"].iloc[1:].to_numpy()
                    == g["tok_end"].iloc[:-1].to_numpy()).all()
        # summary totals match the manifest
        assert sum(s["tokens"] for s in summary) == int(
            (m["tok_end"] - m["tok_start"]).sum())

    def test_docs_span_sequences(self, tmp_path):
        lake = seed_p(tmp_path / "lake", 2, n=10)
        pack_lake(lake, str(tmp_path / "out"), budget=5)  # 8-word docs span
        m = read_manifest(tmp_path / "out")
        spans = m.groupby("url").size()
        assert (spans >= 2).any()  # an 8-word doc must span 5-token seqs

    def test_resume_skips_then_rewrites_churn(self, tmp_path):
        lake = seed_p(tmp_path / "lake", 4)
        out = str(tmp_path / "out")
        first = pack_lake(lake, out, budget=BUDGET)
        assert all(not s["skipped"] for s in first)
        again = pack_lake(lake, out, budget=BUDGET)
        assert all(s["skipped"] for s in again)
        # churn one partition (retention expires two urls) → only the
        # affected partitions rewrite
        apply_retention(lake, 1_000_002)
        third = pack_lake(lake, out, budget=BUDGET)
        # retention commits epoch 1 on EVERY partition, so tips all moved
        assert all(not s["skipped"] for s in third)
        m = read_manifest(tmp_path / "out")
        assert "u000" not in set(m["url"])
        assert "u001" not in set(m["url"])

    def test_deterministic_across_runs(self, tmp_path):
        a = seed_p(tmp_path / "a", 4)
        b = seed_p(tmp_path / "b", 4)
        pack_lake(a, str(tmp_path / "oa"), budget=BUDGET)
        pack_lake(b, str(tmp_path / "ob"), budget=BUDGET)
        for i in range(4):
            ta = pq.read_table(str(tmp_path / "oa" / f"part={i:04d}.parquet"))
            tb = pq.read_table(str(tmp_path / "ob" / f"part={i:04d}.parquet"))
            assert ta.equals(tb)

    def test_tombstones_excluded(self, tmp_path):
        lake = seed_lake(tmp_path / "lake")  # u000 tombstoned at seed
        pack_lake(lake, str(tmp_path / "out"), budget=BUDGET)
        m = read_manifest(tmp_path / "out")
        assert "u000" not in set(m["url"])


@pytest.mark.usefixtures("ray_session")
class TestFollowPack:
    """pack --follow (cdc/pack.follow_pack): training shards stay fresh as
    the lake's epoch watermark advances — incremental via the tip-epoch
    stamps, pinned to the feed head so half-committed epochs never leak."""

    def test_refresh_on_watermark_advance(self, tmp_path):
        from opendataloader_pdf_ray.cdc.pack import follow_pack

        lake = seed_p(tmp_path / "lake", 4)
        out = str(tmp_path / "out")
        # no COMPLETE epoch yet → the tail packs NOTHING (watermark pin)
        assert follow_pack(lake, out, budget=BUDGET, poll_interval=0.02,
                           max_idle_polls=2) == []
        lake.mark_epoch_done(0)
        first = follow_pack(lake, out, budget=BUDGET, poll_interval=0.02,
                            max_idle_polls=2)
        assert len(first) == len([p for p in range(4)
                                  if lake.committed_epochs(p)])
        # watermark unchanged → a second tail refreshes NOTHING (stamps)
        assert follow_pack(lake, out, budget=BUDGET, poll_interval=0.02,
                           max_idle_polls=2) == []
        # epoch 1 lands (retention churns every partition) → the tail
        # refreshes the shards and expired urls leave the manifests
        apply_retention(lake, 1_000_002)
        third = follow_pack(lake, out, budget=BUDGET, poll_interval=0.02,
                            max_idle_polls=2)
        assert third and all(s["tip_epoch"] == 1 for s in third)
        m = read_manifest(tmp_path / "out")
        assert "u000" not in set(m["url"]) and "u001" not in set(m["url"])

    def test_half_committed_epoch_never_leaks(self, tmp_path):
        """An epoch with commits but NO done/maint marker is below the
        watermark: the tail must keep serving the previous state."""
        from opendataloader_pdf_ray.cdc.lake import Lineage
        from opendataloader_pdf_ray.cdc.merge import merge_base_with_updates
        from opendataloader_pdf_ray.cdc.pack import follow_pack

        lake = seed_p(tmp_path / "lake", 4)
        lake.mark_epoch_done(0)
        out = str(tmp_path / "out")
        follow_pack(lake, out, budget=BUDGET, poll_interval=0.02,
                    max_idle_polls=2)
        # half-committed epoch 1: one partition only, no marker
        part = next(p for p in range(4) if lake.committed_epochs(p))
        t = pa.table({
            "url": pa.array(["zzz-new"]),
            "warc_ts": pa.array([2_000_000], pa.int64()),
            "seq": pa.array([99], pa.int64()),
            "text": pa.array(["late arrival text"]),
            "deleted": pa.array([False]),
        })
        base = lake.read_partition(part, as_of=0)
        lake.commit_partition(part, 1, merge_base_with_updates(base, t),
                              Lineage(part=part, epoch=1,
                                      events_consumed=1, rows_upserted=1,
                                      rows_deleted=0, seq_min=99,
                                      seq_max=99))
        assert follow_pack(lake, out, budget=BUDGET, poll_interval=0.02,
                           max_idle_polls=2) == []
        m = read_manifest(tmp_path / "out")
        assert "zzz-new" not in set(m["url"])
        # the marker lands → the next poll folds it in
        lake.mark_epoch_done(1)
        refreshed = follow_pack(lake, out, budget=BUDGET,
                                poll_interval=0.02, max_idle_polls=2)
        assert refreshed
        assert "zzz-new" in set(read_manifest(tmp_path / "out")["url"])

    def test_cli_follow(self, tmp_path, capsys):
        import json as _json

        from opendataloader_pdf_ray.__main__ import main

        lake = seed_p(tmp_path / "lake", 4)
        lake.mark_epoch_done(0)
        out = str(tmp_path / "out")
        assert main(["pack", lake.root, out, "--budget", str(BUDGET),
                     "--follow", "--poll-interval", "0.02",
                     "--idle-stop", "2"]) == 0
        rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["follow"] is True and rep["partitions_refreshed"] > 0
        assert rep["tokens"] > 0
