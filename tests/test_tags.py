"""Named savepoints (Lake tags): name→epoch metadata, vacuum pinning like
branch fork points, tag refs accepted by restore/branch/get, fsck audit.
Analog of Iceberg/Delta named snapshots; no reference counterpart (the
reference has no lake)."""

import json

import numpy as np
import pyarrow as pa
import pytest

from opendataloader_pdf_ray.cdc.ingest import url_partition
from opendataloader_pdf_ray.cdc.lake import Lake, Lineage
from opendataloader_pdf_ray.cdc.merge import merge_base_with_updates

P = 4


def _commit_snap(lake, epoch, rows):
    """rows: (url, warc_ts, seq, text_or_None). Snapshot commit + done
    marker per epoch."""
    t = pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "warc_ts": pa.array([r[1] for r in rows], pa.int64()),
        "seq": pa.array([r[2] for r in rows], pa.int64()),
        "text": pa.array([r[3] for r in rows], pa.string()),
        "deleted": pa.array([r[3] is None for r in rows], pa.bool_()),
    })
    parts = np.asarray(url_partition([r[0] for r in rows],
                                     lake.num_partitions))
    for part in range(lake.num_partitions):
        sub = t.filter(pa.array(parts == part))
        if sub.num_rows == 0:
            continue
        sub = sub.sort_by([("url", "ascending")])
        seqs = sub["seq"].to_pylist()
        lin = Lineage(part=part, epoch=epoch, events_consumed=sub.num_rows,
                      rows_upserted=sub.num_rows, rows_deleted=0,
                      seq_min=min(seqs), seq_max=max(seqs))
        base = lake.read_partition(part, as_of=epoch - 1)
        lake.commit_partition(part, epoch,
                              merge_base_with_updates(base, sub), lin)
    lake.mark_epoch_done(epoch)


def _three_epoch_lake(tmp_path):
    lake = Lake(str(tmp_path / "lake"), P)
    _commit_snap(lake, 0, [(f"u{i}", 10, i, f"v0-{i}") for i in range(8)])
    _commit_snap(lake, 1, [(f"u{i}", 20, 10 + i, f"v1-{i}")
                           for i in range(4)])
    _commit_snap(lake, 2, [("u0", 30, 20, None), ("u7", 30, 21, "v2-7")])
    return lake


class TestTagBasics:
    def test_set_get_list_delete(self, tmp_path):
        lake = _three_epoch_lake(tmp_path)
        lake.set_tag("release-1", 1)
        lake.set_tag("baseline.v2", 2)
        assert lake.get_tag("release-1") == 1
        assert lake.list_tags() == {"release-1": 1, "baseline.v2": 2}
        lake.delete_tag("release-1")
        assert lake.get_tag("release-1") is None
        with pytest.raises(ValueError, match="does not exist"):
            lake.delete_tag("release-1")

    def test_guards(self, tmp_path):
        lake = _three_epoch_lake(tmp_path)
        with pytest.raises(ValueError, match="bad tag name"):
            lake.set_tag("7days", 1)  # int-like prefix → must start letter
        with pytest.raises(ValueError, match="bad tag name"):
            lake.set_tag("a/b", 1)
        with pytest.raises(ValueError, match="no done/maint marker"):
            lake.set_tag("future", 9)
        lake.set_tag("r1", 1)
        with pytest.raises(ValueError, match="already exists"):
            lake.set_tag("r1", 2)

    def test_resolve_epoch_ref(self, tmp_path):
        lake = _three_epoch_lake(tmp_path)
        lake.set_tag("r1", 1)
        assert lake.resolve_epoch_ref(2) == 2
        assert lake.resolve_epoch_ref("2") == 2
        assert lake.resolve_epoch_ref("r1") == 1
        with pytest.raises(ValueError, match="unknown tag"):
            lake.resolve_epoch_ref("nope")

    def test_stats_and_fsck_surface_tags(self, tmp_path):
        lake = _three_epoch_lake(tmp_path)
        lake.set_tag("r1", 1)
        assert lake.stats()["tags"] == {"r1": 1}
        assert lake.verify()["ok"]
        # dangling tag (marker removed) is an fsck issue
        lake.fs.rm_file(lake.epoch_done_path(1))
        rep = lake.verify()
        assert not rep["ok"]
        assert any("dangling savepoint" in i for i in rep["issues"])


class TestTagVacuumPinning:
    def test_tagging_vacuumed_epoch_refused(self, tmp_path):
        """ADVICE r3: an epoch whose snapshot a PRE-tag vacuum already
        reclaimed must refuse set_tag (restore/branch by it would fail
        later); fsck --deep flags a tag orphaned after the fact."""
        lake = _three_epoch_lake(tmp_path)
        lake.vacuum(keep_snapshots=1)  # epochs 0/1 snapshots reclaimed
        with pytest.raises(ValueError, match="pre-tag vacuum"):
            lake.set_tag("too-late", 1)
        # the surviving head still tags fine
        lake.set_tag("head", 2)
        assert lake.verify(deep=True)["ok"]
        # a tag orphaned AFTER set (metadata damage) is caught by deep fsck
        lake2 = _three_epoch_lake(tmp_path / "l2")
        lake2.set_tag("pinned", 1)
        victim = next(p for p in range(P)
                      if 1 in lake2.committed_epochs(p)
                      and lake2.fs.exists(lake2._data_path(p, 1)))
        lake2.fs.rm_file(lake2._data_path(victim, 1))
        rep = lake2.verify(deep=True)
        assert any("not reconstructable" in i for i in rep["issues"])

    def test_vacuum_keeps_tagged_epoch_readable(self, tmp_path):
        lake = _three_epoch_lake(tmp_path)
        want = {}  # pre-vacuum as-of-1 state per partition
        for part in range(P):
            t = lake.read_partition(part, as_of=1)
            want[part] = t.to_pylist() if t is not None else None
        lake.set_tag("r1", 1)
        lake.vacuum(keep_snapshots=1)
        for part in range(P):
            t = lake.read_partition(part, as_of=1)
            got = t.to_pylist() if t is not None else None
            assert got == want[part]

    def test_without_tag_vacuum_reclaims(self, tmp_path):
        lake = _three_epoch_lake(tmp_path)
        removed_untagged = lake.vacuum(keep_snapshots=1)
        lake2 = _three_epoch_lake(tmp_path / "b")
        lake2.set_tag("r1", 1)
        removed_tagged = lake2.vacuum(keep_snapshots=1)
        assert removed_tagged < removed_untagged


@pytest.mark.usefixtures("ray_session")
class TestTagCLI:
    def test_tag_restore_branch_get_by_name(self, tmp_path, capsys):
        from opendataloader_pdf_ray.__main__ import main

        lake = _three_epoch_lake(tmp_path)
        root = lake.root
        # tag (default --at = feed head), list
        assert main(["tag", root, "head-v2"]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep == {"tag": "head-v2", "epoch": 2}
        assert main(["tag", root, "r1", "--at", "1"]) == 0
        capsys.readouterr()
        assert main(["tags", root]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["tags"] == {"head-v2": 2, "r1": 1}

        # get --as-of by tag: u0 is live at r1, tombstoned at head-v2
        assert main(["get", root, "u0", "--as-of", "r1"]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["found"] == 1 and rep["rows"][0]["text"] == "v1-0"
        assert main(["get", root, "u0", "--as-of", "head-v2"]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["found"] == 0

        # branch at a tag
        br_root = str(tmp_path / "br")
        assert main(["branch", root, br_root, "--at", "r1"]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["fork_epoch"] == 1

        # restore by tag: u0 comes back alive
        assert main(["restore", root, "r1"]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["target"] == 1
        assert main(["get", root, "u0"]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["found"] == 1 and rep["rows"][0]["text"] == "v1-0"

        # delete
        assert main(["tag", root, "r1", "--delete"]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep == {"deleted": "r1"}
