"""Trigram substring index (cdc/trigramindex.py): gram-set diff
maintenance, AND-intersection + verify lookups, false-positive rejection,
retraction on update/delete, time travel, compaction, purge, CLI."""

import json
import subprocess
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from opendataloader_pdf_ray.cdc import Lake, Lineage, SubstringIndex
from opendataloader_pdf_ray.cdc.trigramindex import (substr_index_root,
                                                     trigrams)


def commit_rows(lake: Lake, epoch: int, rows):
    """rows: (url, seq, text_or_None, deleted) — hash-routed to their url
    partitions (contains_local's verify step routes the same way)."""
    from opendataloader_pdf_ray.cdc.ingest import url_partition

    parts = url_partition([r[0] for r in rows], lake.num_partitions)
    for part in sorted(set(int(p) for p in parts)):
        sub = [r for r, p in zip(rows, parts) if int(p) == part]
        t = pa.table({
            "url": pa.array([r[0] for r in sub], pa.string()),
            "warc_ts": pa.array([r[1] for r in sub], pa.int64()),
            "seq": pa.array([r[1] for r in sub], pa.int64()),
            "text": pa.array([r[2] for r in sub], pa.string()),
            "deleted": pa.array([r[3] for r in sub], pa.bool_()),
        })
        lake.commit_delta(part, epoch, t, Lineage(
            part=part, epoch=epoch, events_consumed=len(sub),
            rows_upserted=len(sub), rows_deleted=0,
            seq_min=min(r[1] for r in sub), seq_max=max(r[1] for r in sub)))


def seed_lake(root: str) -> Lake:
    lake = Lake(str(root), 2)
    commit_rows(lake, 0, [("a", 1, "the quick brown fox", False),
                         ("b", 2, "quick silver", False)])
    # epoch 1: a loses 'quick', b tombstoned
    commit_rows(lake, 1, [("a", 3, "the slow brown fox", False),
                         ("b", 5, None, True)])
    return lake


class TestTrigrams:
    def test_gram_extraction(self):
        assert trigrams("Fox") == {"fox"}
        assert trigrams("ab") == set()
        assert trigrams(None) == set()
        assert trigrams("abcd") == {"abc", "bcd"}


@pytest.mark.usefixtures("ray_session")
class TestSubstringIndex:
    def test_lookup_retraction_and_verify(self, tmp_path):
        lake = seed_lake(tmp_path / "lake")
        idx = SubstringIndex(substr_index_root(lake.root), num_partitions=4)
        idx.refresh(lake)
        # current state: only 'a' live with "the slow brown fox"
        assert idx.contains_local(lake, "brown fox") == ["a"]
        assert idx.contains_local(lake, "quick") == []     # retracted
        assert idx.contains_local(lake, "silver") == []    # tombstoned
        # time travel: epoch-0 state had quick on both
        assert idx.contains_local(lake, "quick", as_of=0) == ["a", "b"]
        # rows mode returns the live row
        t = idx.contains_local(lake, "slow brown", rows=True)
        assert t.num_rows == 1 and t["url"][0].as_py() == "a"
        # unknown substring
        assert idx.contains_local(lake, "zebra stripes") == []

    def test_false_positive_rejected_by_verify(self, tmp_path):
        """All grams present but not contiguous: candidates nonempty,
        verify must reject."""
        lake = Lake(str(tmp_path / "lake"), 2)
        commit_rows(lake, 0, [("x", 1, "abc xyz def", False)])
        idx = SubstringIndex(substr_index_root(lake.root), num_partitions=4)
        idx.refresh(lake)
        # grams of "defabc" = {def, efa, fab, abc} — efa/fab absent → no cand
        assert idx.contains_local(lake, "def") == ["x"]
        # grams of "abcdef": abc,bcd,cde,def — bcd/cde absent → no candidates
        assert idx.contains_local(lake, "abcdef") == []
        # craft a true false-positive: every gram present, substring absent
        commit_rows(lake, 1, [("y", 2, "abcd xbcde", False)])
        idx.refresh(lake)
        # "abcde" grams: abc,bcd,cde — y has abc,bcd (from abcd) and bcd,cde
        # (from xbcde) → candidate, but "abcde" not contiguous in y
        assert "y" in idx.candidates_local("abcde")
        assert idx.contains_local(lake, "abcde") == []

    def test_short_query_refused(self, tmp_path):
        lake = seed_lake(tmp_path / "lake")
        idx = SubstringIndex(substr_index_root(lake.root), num_partitions=4)
        idx.refresh(lake)
        with pytest.raises(ValueError, match=">= 3 chars"):
            idx.contains_local(lake, "ab")

    def test_distributed_contains_matches_local(self, tmp_path):
        lake = seed_lake(tmp_path / "lake")
        idx = SubstringIndex(substr_index_root(lake.root), num_partitions=4)
        idx.refresh(lake)
        for needle in ("brown fox", "quick", "the "):
            want = idx.contains_local(lake, needle)
            got = sorted(r["key"] for r in
                         idx.contains(lake, needle).take_all())
            assert got == want, needle

    def test_refresh_exactly_once_and_compact(self, tmp_path):
        lake = seed_lake(tmp_path / "lake")
        idx = SubstringIndex(substr_index_root(lake.root), num_partitions=4)
        idx.refresh(lake)
        state = idx.read_state().to_pylist()
        assert idx.refresh(lake) == []  # watermark: nothing pending
        idx.compact()
        assert idx.read_state().to_pylist() == state
        # compacted snapshots must not carry retracted rows
        assert idx.verify(deep=True)["ok"]
        # post-compact lookups still correct
        assert idx.contains_local(lake, "brown fox") == ["a"]

    def test_purge_scrubs_postings(self, tmp_path):
        lake = seed_lake(tmp_path / "lake")
        idx = SubstringIndex(substr_index_root(lake.root), num_partitions=4)
        idx.refresh(lake)
        idx.purge_keys(["a"])
        t = idx.read_state()
        assert "a" not in set(t["key"].to_pylist())

    def test_cli_roundtrip(self, tmp_path):
        lake = seed_lake(tmp_path / "lake")
        r1 = subprocess.run(
            [sys.executable, "-m", "opendataloader_pdf_ray", "substr-index",
             str(tmp_path / "lake"), "--idx-partitions", "4"],
            capture_output=True, text=True)
        assert r1.returncode == 0, r1.stderr
        assert json.loads(r1.stdout)["commits"] > 0
        r2 = subprocess.run(
            [sys.executable, "-m", "opendataloader_pdf_ray", "contains",
             str(tmp_path / "lake"), "brown fox"],
            capture_output=True, text=True)
        assert r2.returncode == 0, r2.stderr
        assert json.loads(r2.stdout)["urls"] == ["a"]
