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
