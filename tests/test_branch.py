"""Zero-copy lake branching (cdc/lake.py Lake.branch): metadata-only
creation, delegated reads, divergence isolation, fork immutability,
parent-vacuum pinning, purge shadowing, changefeed across the fork,
fast-forward merge-back via replicate, nested branches, CLI."""

import glob
import json

import pyarrow as pa
import pytest

from opendataloader_pdf_ray.cdc import Lake
from opendataloader_pdf_ray.cdc.lake import Lineage


def _ep(lk: Lake, e: int, rows, part: int = 0) -> None:
    """One delta epoch of (url, ts, deleted, text) rows + done marker."""
    t = pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "warc_ts": pa.array([r[1] for r in rows], pa.int64()),
        "seq": pa.array([r[1] for r in rows], pa.int64()),
        "deleted": pa.array([r[2] for r in rows], pa.bool_()),
        "text": pa.array([r[3] for r in rows], pa.string()),
    })
    lk.commit_delta(part, e, t, Lineage(
        part=part, epoch=e, events_consumed=len(rows),
        rows_upserted=len(rows), rows_deleted=0,
        seq_min=rows[0][1], seq_max=rows[-1][1]))
    lk.mark_epoch_done(e)


def _snap_ep(lk: Lake, e: int, rows, part: int = 0) -> None:
    """One CoW snapshot epoch (full partition state)."""
    t = pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "warc_ts": pa.array([r[1] for r in rows], pa.int64()),
        "seq": pa.array([r[1] for r in rows], pa.int64()),
        "deleted": pa.array([r[2] for r in rows], pa.bool_()),
        "text": pa.array([r[3] for r in rows], pa.string()),
    }).sort_by([("url", "ascending")])
    lk.commit_partition(part, e, t, Lineage(
        part=part, epoch=e, events_consumed=len(rows),
        rows_upserted=len(rows), rows_deleted=0,
        seq_min=rows[0][1], seq_max=rows[-1][1]))
    lk.mark_epoch_done(e)


def _texts(lk: Lake, as_of=None):
    t = lk.read_state(as_of=as_of)
    if t.num_rows == 0:
        return {}
    return dict(zip(t["url"].to_pylist(), t["text"].to_pylist()))


@pytest.fixture()
def parent(tmp_path):
    lk = Lake(str(tmp_path / "parent"), 1)
    _ep(lk, 0, [("a", 1, False, "A1"), ("b", 2, False, "B1")])
    _ep(lk, 1, [("a", 3, False, "A2")])
    return lk


class TestBranchBasics:
    def test_zero_copy_and_delegated_reads(self, parent, tmp_path):
        br = parent.branch(str(tmp_path / "dev"), name="dev")
        # metadata-only: the branch holds NO parquet files at creation
        assert glob.glob(str(tmp_path / "dev" / "**" / "*.parquet"),
                         recursive=True) == []
        assert br.fork_epoch == 1
        assert _texts(br) == {"a": "A2", "b": "B1"}
        # time travel through the fork hits parent history
        assert _texts(br, as_of=0) == {"a": "A1", "b": "B1"}
        # registration is visible in the parent
        regs = parent.branches()
        assert regs == [{"name": "dev", "fork_epoch": 1,
                         "root": str(tmp_path / "dev")}]
        assert parent.stats()["branches"] == regs
        assert br.stats()["parent"] == parent.root

    def test_branch_at_earlier_epoch(self, parent, tmp_path):
        br = parent.branch(str(tmp_path / "old"), at=0)
        assert _texts(br) == {"a": "A1", "b": "B1"}
        # epochs after the fork never leak in
        assert br.committed_epochs(0) == [0]

    def test_branch_guards(self, parent, tmp_path):
        with pytest.raises(ValueError, match="past the tip"):
            parent.branch(str(tmp_path / "x"), at=99)
        parent.branch(str(tmp_path / "b1"), name="dup")
        with pytest.raises(ValueError, match="already registered"):
            parent.branch(str(tmp_path / "b2"), name="dup")
        with pytest.raises(ValueError, match="already a lake"):
            parent.branch(str(tmp_path / "b1"))
        empty = Lake(str(tmp_path / "empty"), 1)
        with pytest.raises(ValueError, match="empty lake"):
            empty.branch(str(tmp_path / "b3"))

    def test_divergence_is_isolated(self, parent, tmp_path):
        br = parent.branch(str(tmp_path / "dev"))
        _ep(br, 2, [("c", 9, False, "C-branch")])
        _ep(parent, 2, [("d", 9, False, "D-parent")])
        assert _texts(br) == {"a": "A2", "b": "B1", "c": "C-branch"}
        assert _texts(parent) == {"a": "A2", "b": "B1", "d": "D-parent"}
        # branch files stay out of the parent's tree and vice versa
        assert parent.lookup(["c"]) is None
        assert br.lookup(["d"]) is None

    def test_fork_history_immutable(self, parent, tmp_path):
        br = parent.branch(str(tmp_path / "dev"))
        with pytest.raises(ValueError, match="immutable"):
            _ep(br, 1, [("z", 99, False, "Z")])
        with pytest.raises(ValueError, match="immutable"):
            _snap_ep(br, 0, [("z", 99, False, "Z")])

    def test_nested_branch(self, parent, tmp_path):
        child = parent.branch(str(tmp_path / "child"))
        _ep(child, 2, [("c", 9, False, "C")])
        grand = child.branch(str(tmp_path / "grand"))
        _ep(grand, 3, [("g", 11, False, "G")])
        assert _texts(grand) == {"a": "A2", "b": "B1", "c": "C", "g": "G"}
        # grandchild time travel reaches grandparent history
        assert _texts(grand, as_of=0) == {"a": "A1", "b": "B1"}
        assert _texts(child) == {"a": "A2", "b": "B1", "c": "C"}


class TestBranchMaintenance:
    def test_parent_vacuum_pins_fork_files(self, parent, tmp_path):
        br = parent.branch(str(tmp_path / "dev"))
        # parent advances and compacts: without pinning, vacuum would fold
        # deltas 0..2 into the tip snapshot and reclaim them — orphaning
        # the branch, whose base state lives in deltas 0..1
        _ep(parent, 2, [("d", 9, False, "D")])
        assert parent.compact() == 1
        removed = parent.vacuum()
        assert removed >= 1  # delta 2 (folded, unpinned) is reclaimable
        assert _texts(br) == {"a": "A2", "b": "B1"}
        assert br.verify(deep=True)["ok"]
        # the unpinned fold really was reclaimed
        assert parent.fs.exists(parent._delta_path(0, 0))
        assert parent.fs.exists(parent._delta_path(0, 1))
        assert not parent.fs.exists(parent._delta_path(0, 2))

    def test_parent_vacuum_pins_base_snapshot(self, tmp_path):
        lk = Lake(str(tmp_path / "p"), 1)
        _snap_ep(lk, 0, [("a", 1, False, "A1")])
        _ep(lk, 1, [("b", 2, False, "B1")])
        br = lk.branch(str(tmp_path / "dev"), at=1)
        _snap_ep(lk, 2, [("a", 1, False, "A1"), ("b", 2, False, "B1"),
                         ("c", 3, False, "C1")])
        lk.vacuum()  # keeps tip snapshot; must ALSO keep snap 0 + delta 1
        assert lk.fs.exists(lk._data_path(0, 0))
        assert lk.fs.exists(lk._delta_path(0, 1))
        assert _texts(br) == {"a": "A1", "b": "B1"}

    def test_branch_vacuum_never_touches_parent(self, parent, tmp_path):
        br = parent.branch(str(tmp_path / "dev"))
        _ep(br, 2, [("c", 9, False, "C")])
        br.compact()   # localizes the tip snapshot on the branch
        br.vacuum()
        # every parent file still present
        assert parent.fs.exists(parent._delta_path(0, 0))
        assert parent.fs.exists(parent._delta_path(0, 1))
        assert _texts(parent) == {"a": "A2", "b": "B1"}
        assert _texts(br) == {"a": "A2", "b": "B1", "c": "C"}

    def test_purge_on_branch_shadows_parent(self, parent, tmp_path):
        br = parent.branch(str(tmp_path / "dev"))
        audit = br.purge(["a"])
        assert audit["rows_removed"] == 2  # epoch-0 and epoch-1 versions
        assert _texts(br) == {"b": "B1"}
        assert _texts(br, as_of=0) == {"b": "B1"}
        # parent keeps its bytes — purging a branch is branch-local
        assert _texts(parent) == {"a": "A2", "b": "B1"}
        # idempotent: re-purge rewrites nothing
        assert br.purge(["a"])["rows_removed"] == 0

    def test_fsck_branch_after_parent_growth(self, parent, tmp_path):
        br = parent.branch(str(tmp_path / "dev"))
        _ep(parent, 2, [("d", 9, False, "D")])
        rep = br.verify(deep=True)
        assert rep["ok"], rep["issues"]
        # parent's post-fork epoch is invisible to the branch's audit
        assert br.committed_epochs(0) == [0, 1]


@pytest.mark.usefixtures("ray_session")
class TestBranchPipelines:
    def test_changefeed_across_fork(self, parent, tmp_path):
        br = parent.branch(str(tmp_path / "dev"))
        _ep(br, 2, [("b", 9, True, None)])
        rows = [(r["epoch"], r["op"], r["url"])
                for r in br.changes().sort(["epoch", "url"]).take_all()]
        assert rows == [(0, "insert", "a"), (0, "insert", "b"),
                        (1, "update", "a"), (2, "delete", "b")]

    def test_read_dataset_on_branch(self, parent, tmp_path):
        br = parent.branch(str(tmp_path / "dev"))
        _ep(br, 2, [("c", 9, False, "C")])
        got = {r["url"]: r["text"]
               for r in br.read_dataset().take_all()}  # 3 rows — bounded
        assert got == {"a": "A2", "b": "B1", "c": "C"}

    def test_fast_forward_merge_back(self, parent, tmp_path):
        from opendataloader_pdf_ray.cdc.lakediff import lake_diff
        from opendataloader_pdf_ray.cdc.replicate import replicate

        br = parent.branch(str(tmp_path / "dev"))
        _ep(br, 2, [("c", 9, False, "C"), ("a", 10, True, None)])
        summary = replicate(br, parent.root)
        assert summary["commits_applied"] >= 1
        assert _texts(parent) == {"b": "B1", "c": "C"}
        assert lake_diff(parent, br).count() == 0
        # diverged parent refuses the merge
        br2 = parent.branch(str(tmp_path / "dev2"))
        _ep(parent, 3, [("e", 20, False, "E")])
        _ep(br2, 3, [("f", 21, False, "F")])
        with pytest.raises(ValueError, match="fast-forward merge refused"):
            replicate(br2, parent.root)


@pytest.mark.usefixtures("ray_session")
class TestDetach:
    def test_detach_promotes_branch(self, parent, tmp_path):
        br = parent.branch(str(tmp_path / "dev"), name="dev")
        _ep(br, 2, [("c", 9, False, "C")])
        want = _texts(br)
        rep = br.detach()
        assert rep["unregistered"] and rep["fork_epoch"] == 1
        assert parent.branches() == []
        # standalone: fresh open has no parent and serves the same state
        solo = Lake(br.root)
        assert solo.parent_root is None
        assert _texts(solo) == want
        assert solo.verify(deep=True)["ok"]
        assert solo.committed_epochs(0) == [0, 1, 2]
        assert solo.is_epoch_done(1)
        # parent vacuum may now reclaim the previously pinned history
        _ep(parent, 2, [("d", 9, False, "D")])
        parent.compact()
        parent.vacuum()
        assert not parent.fs.exists(parent._delta_path(0, 0))
        assert _texts(solo) == want  # untouched by parent maintenance
        # the detached lake keeps ingesting
        _ep(solo, 3, [("e", 11, False, "E")])
        assert _texts(solo) == {**want, "e": "E"}

    def test_detach_non_branch_raises(self, parent):
        with pytest.raises(ValueError, match="not a branch"):
            parent.detach()

    def test_detach_cli(self, parent, tmp_path, capsys):
        from opendataloader_pdf_ray.__main__ import main

        dest = str(tmp_path / "dev")
        parent.branch(dest, name="dev")
        assert main(["detach", dest]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["detached"] == dest and rep["unregistered"]
        assert main(["fsck", dest, "--deep"]) == 0


class TestBranchCLI:
    def test_cli_branch_and_stats(self, parent, tmp_path, capsys):
        from opendataloader_pdf_ray.__main__ import main

        dest = str(tmp_path / "cli_branch")
        assert main(["branch", parent.root, dest, "--name", "exp"]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep == {"branch": dest, "parent": parent.root,
                       "fork_epoch": 1, "name": "exp"}
        assert main(["stats", dest]) == 0
        srep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert srep["parent"] == parent.root
        assert srep["fork_epoch"] == 1
        assert main(["fsck", dest]) == 0
