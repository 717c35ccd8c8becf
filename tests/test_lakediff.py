"""Lake-to-lake diff tests (cdc/lakediff.py): equivalence across identical
lakes, across DIFFERENT partition layouts (rescale verifier), and precise
status classification for drift."""

import pyarrow as pa
import pytest

from opendataloader_pdf_ray.cdc.lake import Lake, Lineage
from opendataloader_pdf_ray.cdc.lakediff import lake_diff
from opendataloader_pdf_ray.cdc.ingest import url_partition

from test_backfill import seed_lake


def seed_p(root, p: int, n: int = 40, mutate: dict | None = None,
           drop: set | None = None, extra: list | None = None) -> Lake:
    """Seed a p-partition lake; optionally mutate text per url, drop urls,
    or append (url, ts, seq, text) extras."""
    lake = Lake(str(root), p)
    rows = []
    for i in range(n):
        url = f"u{i:03d}"
        if drop and url in drop:
            continue
        text = f"some body text for document {i} with words"
        if mutate and url in mutate:
            text = mutate[url]
        rows.append((url, 1_000_000 + i, i, text))
    rows.extend(extra or [])
    t = pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "warc_ts": pa.array([r[1] for r in rows], pa.int64()),
        "seq": pa.array([r[2] for r in rows], pa.int64()),
        "text": pa.array([r[3] for r in rows], pa.string()),
        "deleted": pa.array([False] * len(rows)),
    })
    parts = url_partition([r[0] for r in rows], p)
    for part in range(p):
        sub = t.filter(pa.array(parts == part)).sort_by(
            [("url", "ascending")])
        if not sub.num_rows:
            continue
        seqs = sub["seq"].to_pylist()
        lake.commit_partition(part, 0, sub, Lineage(
            part=part, epoch=0, events_consumed=sub.num_rows,
            rows_upserted=sub.num_rows, rows_deleted=0,
            seq_min=min(seqs), seq_max=max(seqs)))
    return lake


@pytest.mark.usefixtures("ray_session")
class TestLakeDiff:
    def test_identical_lakes_are_equivalent(self, tmp_path):
        a = seed_lake(tmp_path / "a")
        b = seed_lake(tmp_path / "b")
        assert lake_diff(a, b, num_buckets=8).count() == 0

    def test_different_partition_layouts_compare_equal(self, tmp_path):
        """The rescale use case: 4-partition vs 8-partition lakes holding
        the same live state must diff empty."""
        a = seed_p(tmp_path / "a", 4)
        b = seed_p(tmp_path / "b", 8)
        assert lake_diff(a, b, num_buckets=8).count() == 0

    def test_rescaled_lake_verifies(self, tmp_path):
        from opendataloader_pdf_ray.cdc.rescale import rescale

        a = seed_p(tmp_path / "a", 4)
        rescale(a, str(tmp_path / "b"), 8)
        assert lake_diff(a, Lake(str(tmp_path / "b")),
                         num_buckets=8).count() == 0

    def test_statuses(self, tmp_path):
        a = seed_p(tmp_path / "a", 4,
                   extra=[("zzz", 2_000_000, 99, "only in a")])
        b = seed_p(tmp_path / "b", 8, drop={"u003"},
                   mutate={"u005": "changed body"})
        out = lake_diff(a, b, num_buckets=8).to_pandas()
        got = dict(zip(out["url"], out["status"]))
        assert got == {"zzz": "only_a", "u003": "only_a",
                       "u005": "differ"}
        row = out[out["url"] == "u005"].iloc[0]
        assert row["a_warc_ts"] == row["b_warc_ts"] == 1_000_005

    def test_tombstone_counts_as_absent(self, tmp_path):
        from opendataloader_pdf_ray.cdc.retention import apply_retention

        a = seed_p(tmp_path / "a", 4)
        b = seed_p(tmp_path / "b", 4)
        apply_retention(b, 1_000_002)  # expire u000..u001 on side b
        out = lake_diff(a, b, num_buckets=8).to_pandas()
        got = dict(zip(out["url"], out["status"]))
        assert got == {"u000": "only_a", "u001": "only_a"}

    def test_version_key_only_drift_detected(self, tmp_path):
        """Same text but a different (warc_ts, seq) version is drift."""
        a = seed_p(tmp_path / "a", 4, n=3)
        b = seed_p(tmp_path / "b", 4, n=2,
                   extra=[("u002", 9_999_999, 77,
                           "some body text for document 2 with words")])
        out = lake_diff(a, b, num_buckets=8).to_pandas()
        assert dict(zip(out["url"], out["status"])) == {"u002": "differ"}

    def test_uint64_vhash_exact_compare(self):
        """Regression: reindex against a url missing on one side used to
        coerce the whole frame to float64, where uint64 vhashes above 2^53
        lose precision — 2^63 and 2^63+1 compared EQUAL and the drift was
        silently missed. _compare must stay exact."""
        from opendataloader_pdf_ray.cdc.lakediff import _compare

        group = pa.table({
            "url": pa.array(["x", "x", "y"], pa.string()),
            "warc_ts": pa.array([1, 1, 2], pa.int64()),
            "seq": pa.array([0, 0, 1], pa.int64()),
            "vhash": pa.array([2**63, 2**63 + 1, 7], pa.uint64()),
            "side": pa.array([0, 1, 0], pa.int8()),
            "bucket": pa.array([0, 0, 0], pa.int32()),
        })
        out = _compare(group)
        got = dict(zip(out["url"].to_pylist(), out["status"].to_pylist()))
        assert got == {"x": "differ", "y": "only_a"}

    def test_cli_exit_codes(self, tmp_path):
        import json
        import subprocess
        import sys

        a = seed_p(tmp_path / "a", 4, n=6)
        b = seed_p(tmp_path / "b", 4, n=6)
        env_ok = subprocess.run(
            [sys.executable, "-m", "opendataloader_pdf_ray", "diff",
             str(tmp_path / "a"), str(tmp_path / "b")],
            capture_output=True, text=True, cwd="/root/repo")
        assert env_ok.returncode == 0, env_ok.stderr[-2000:]
        rec = json.loads(env_ok.stdout.strip().splitlines()[-1])
        assert rec["equivalent"] is True
        seed_p(tmp_path / "c", 4, n=5)
        env_bad = subprocess.run(
            [sys.executable, "-m", "opendataloader_pdf_ray", "diff",
             str(tmp_path / "a"), str(tmp_path / "c")],
            capture_output=True, text=True, cwd="/root/repo")
        assert env_bad.returncode == 1
        rec = json.loads(env_bad.stdout.strip().splitlines()[-1])
        assert rec["only_a"] == 1
