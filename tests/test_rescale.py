"""Lake rescale (cdc/rescale.py): consistent-hash split/merge, state
equality, resumability, tail continuation, and the incompatible-P refusal."""

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from opendataloader_pdf_ray.cdc import Lake, oracle_final_state, replay, rescale
from opendataloader_pdf_ray.cdc.ingest import url_partition
from opendataloader_pdf_ray.config import CDCConfig
from opendataloader_pdf_ray.fixtures.gen import gen_events


def _cfg(p, **kw):
    return CDCConfig(num_partitions=p, num_salts=2, epoch_size=60,
                     extract_batch_size=16, extract_concurrency=2, **kw)


@pytest.fixture(scope="module")
def events_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("rescale") / "events.parquet")
    pq.write_table(gen_events(180, 40, seed=42), path)
    return path


def _state(lake):
    return lake.read_state(include_tombstones=True)


@pytest.mark.usefixtures("ray_session")
class TestRescale:
    def test_split_and_merge_preserve_state(self, events_path, tmp_path):
        src_root = str(tmp_path / "src")
        replay(events_path, src_root, _cfg(4), mode="epoch")
        src = Lake(src_root, None)
        want = _state(src)

        rescale(src, str(tmp_path / "wide"), 8)
        wide = Lake(str(tmp_path / "wide"), None)
        assert wide.num_partitions == 8
        assert _state(wide).equals(want)
        # every row landed on its correct NEW partition
        for q in range(8):
            t = wide.read_partition(q)
            if t is None or t.num_rows == 0:
                continue
            urls = t["url"].to_numpy(zero_copy_only=False)
            assert (url_partition(urls, 8) == q).all()

        rescale(wide, str(tmp_path / "narrow"), 2)
        narrow = Lake(str(tmp_path / "narrow"), None)
        assert _state(narrow).equals(want)
        assert narrow.verify(deep=True)["ok"]

    def test_rescale_is_resumable(self, events_path, tmp_path):
        src_root = str(tmp_path / "src")
        replay(events_path, src_root, _cfg(4), mode="epoch")
        src = Lake(src_root, None)
        first = rescale(src, str(tmp_path / "dst"), 8)
        again = rescale(src, str(tmp_path / "dst"), 8)
        assert not any(r["skipped"] for r in first)
        assert all(r["skipped"] for r in again)
        assert sum(r["rows"] for r in first) == sum(r["rows"] for r in again)

    def test_tail_continues_on_rescaled_lake(self, events_path, tmp_path):
        """Replay half the binlog at P=4, rescale to 8, replay the FULL
        binlog against the rescaled lake — it must resume at the next epoch
        (markers carried) and converge to the sequential oracle."""
        events = pq.read_table(events_path)
        first = events.filter(pc.less(events["seq"], 120))  # epochs 0-1
        p1 = str(tmp_path / "half.parquet")
        pq.write_table(first, p1)
        src_root = str(tmp_path / "src")
        replay(p1, src_root, _cfg(4), mode="epoch")
        src = Lake(src_root, None)
        dst_root = str(tmp_path / "dst")
        rescale(src, dst_root, 8)
        dst = Lake(dst_root, None)
        assert dst.is_epoch_done(0) and dst.is_epoch_done(1)
        lineage = replay(events_path, dst_root, _cfg(8), mode="epoch")
        assert {l["epoch"] for l in lineage} == {2}  # resumed, not re-run
        oracle = oracle_final_state(events)
        got = {r["url"]: r for r in _state(dst).to_pylist()}
        assert set(got) == set(oracle)
        for url, want in oracle.items():
            assert got[url]["text"] == want["text"], url
            assert got[url]["seq"] == want["seq"], url

    def test_collision_without_markers_raises(self, events_path, tmp_path):
        """A tail that reaches a rescale commit (markers wiped — simulating
        an operator pointing an old-offset tail at the new lake) must fail
        loudly, not silently skip."""
        src_root = str(tmp_path / "src")
        replay(events_path, src_root, _cfg(4), mode="epoch")
        dst_root = str(tmp_path / "dst")
        rescale(Lake(src_root, None), dst_root, 8)
        dst = Lake(dst_root, None)
        for e in range(3):
            if dst.is_epoch_done(e):
                dst.fs.rm_file(dst.epoch_done_path(e))
        with pytest.raises(Exception, match="rescale"):
            replay(events_path, dst_root, _cfg(8), mode="epoch")

    def test_incompatible_counts_refused(self, events_path, tmp_path):
        src_root = str(tmp_path / "src")
        replay(events_path, src_root, _cfg(4), mode="epoch")
        src = Lake(src_root, None)
        with pytest.raises(ValueError, match="multiple/divisor"):
            rescale(src, str(tmp_path / "bad"), 6)
        with pytest.raises(ValueError, match="=="):
            rescale(src, str(tmp_path / "same"), 4)
