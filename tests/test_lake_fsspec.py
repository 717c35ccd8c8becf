"""Lake-over-fsspec tests: the commit protocol must work on an object-store-
shaped filesystem (memory://, no atomic rename) exactly as on local paths —
the commit-record-existence check is the commit point, not a rename.

These drive the Lake API directly (single process): fsspec's memory
filesystem is per-process, so the distributed replay suite pins local-path
behavior and this suite pins protocol correctness on the object-store shape.
"""

import pyarrow as pa
import pytest

from opendataloader_pdf_ray.cdc.lake import Lake, Lineage
from opendataloader_pdf_ray.cdc.merge import merge_base_with_updates


def _updates(urls, ts, seq, deleted=None):
    n = len(urls)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(ts, pa.timestamp("us")),
        "seq": pa.array(seq, pa.int64()),
        "text": pa.array([f"t{s}" for s in seq], pa.string()),
        "deleted": pa.array(deleted or [False] * n, pa.bool_()),
    })


def _lineage(part, epoch, n):
    return Lineage(part=part, epoch=epoch, events_consumed=n, rows_upserted=n,
                   rows_deleted=0, seq_min=0, seq_max=n)


@pytest.fixture(params=["local", "memory"])
def lake(request, tmp_path):
    if request.param == "local":
        return Lake(str(tmp_path / "lake"), num_partitions=2)
    root = f"memory://lake-{request.node.callspec.id}-{id(request)}"
    return Lake(root, num_partitions=2)


class TestLakeProtocol:
    def test_commit_read_roundtrip(self, lake):
        t = merge_base_with_updates(None, _updates(["a", "b"], [10, 20], [0, 1]))
        out = lake.commit_partition(0, 0, t, _lineage(0, 0, 2))
        assert not out.skipped
        assert lake.is_committed(0, 0)
        got = lake.read_partition(0)
        assert got.column("url").to_pylist() == ["a", "b"]
        assert lake.all_lineage()[0]["events_consumed"] == 2

    def test_idempotent_recommit(self, lake):
        t = merge_base_with_updates(None, _updates(["a"], [10], [0]))
        lake.commit_partition(0, 0, t, _lineage(0, 0, 1))
        again = lake.commit_partition(0, 0, t, _lineage(0, 0, 1))
        assert again.skipped
        assert len(lake.all_lineage()) == 1

    def test_multi_epoch_fold_and_as_of(self, lake):
        e0 = merge_base_with_updates(None, _updates(["a", "b"], [10, 20], [0, 1]))
        lake.commit_partition(1, 0, e0, _lineage(1, 0, 2))
        e1 = merge_base_with_updates(
            lake.read_partition(1, as_of=0),
            _updates(["b", "c"], [30, 40], [2, 3]))
        lake.commit_partition(1, 1, e1, _lineage(1, 1, 2))
        assert lake.read_partition(1, as_of=0).num_rows == 2
        cur = lake.read_partition(1)
        assert cur.column("url").to_pylist() == ["a", "b", "c"]
        assert cur.filter(pa.compute.equal(cur["url"], "b")) \
                  .column("seq").to_pylist() == [2]

    def test_epoch_done_marker(self, lake):
        assert not lake.is_epoch_done(0)
        lake.mark_epoch_done(0)
        assert lake.is_epoch_done(0)

    def test_vacuum_keeps_state(self, lake):
        e0 = merge_base_with_updates(None, _updates(["a"], [10], [0]))
        lake.commit_partition(0, 0, e0, _lineage(0, 0, 1))
        e1 = merge_base_with_updates(lake.read_partition(0),
                                     _updates(["b"], [20], [1]))
        lake.commit_partition(0, 1, e1, _lineage(0, 1, 1))
        removed = lake.vacuum(keep_snapshots=1)
        assert removed == 1
        assert lake.read_partition(0).column("url").to_pylist() == ["a", "b"]
        assert len(lake.all_lineage()) == 2  # lineage survives vacuum

    def test_schema_evolution_across_partitions(self, lake):
        e0 = merge_base_with_updates(None, _updates(["a"], [10], [0]))
        lake.commit_partition(0, 0, e0, _lineage(0, 0, 1))
        evolved = _updates(["z"], [10], [5]).append_column(
            "content_type", pa.array(["text/html"], pa.string()))
        lake.commit_partition(1, 0, merge_base_with_updates(None, evolved),
                              _lineage(1, 0, 1))
        state = lake.read_state(include_tombstones=True)
        assert "content_type" in state.column_names
        by_url = {r["url"]: r for r in state.to_pylist()}
        assert by_url["a"]["content_type"] is None
        assert by_url["z"]["content_type"] == "text/html"