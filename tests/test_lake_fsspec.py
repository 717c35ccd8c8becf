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

# ----------------------------------------------------- chaos object store

from fsspec.implementations.memory import MemoryFileSystem


class ChaosFileSystem(MemoryFileSystem):
    """S3-shaped failure injection over fsspec's memory filesystem (r4
    verdict item #7): real object stores add THROTTLING (transient 5xx on
    writes) and LISTING LAG (a freshly-PUT key missing from the next few
    LIST responses even though GET sees it). Deterministic by op counter —
    no RNG, failures replay identically.

    - every ``FAIL_EVERY``-th write (pipe_file / open-for-write) raises
      OSError ONCE for its path, then succeeds on retry — the exactly-once
      commit protocol must absorb it via idempotent re-runs;
    - a path written through chaos is omitted from ``ls`` results for its
      next ``LIST_LAG`` listings (GET/exists stay consistent — modern S3
      semantics), so discovery-by-listing must converge, and a re-commit
      under a stale listing must be byte-safe.

    Subclasses MemoryFileSystem (pyarrow's parquet writer requires a real
    AbstractFileSystem); the store is the memory singleton's, so tests use
    unique roots. ``cachable=False`` keeps injector state per instance.
    """

    protocol = "chaos"
    cachable = False
    FAIL_EVERY = 5
    LIST_LAG = 3

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self._op = 0
        self._failed_once = set()
        self._lag = {}  # path -> remaining ls omissions

    # --------------- write path: transient throttling
    def _maybe_fail(self, path):
        self._op += 1
        if self._op % self.FAIL_EVERY == 0 and path not in self._failed_once:
            self._failed_once.add(path)
            raise OSError(f"chaos: throttled PUT {path}")

    def pipe_file(self, path, data, **kw):
        self._maybe_fail(path)
        super().pipe_file(path, data, **kw)
        self._lag[path] = self.LIST_LAG

    def _open(self, path, mode="rb", **kw):
        if "w" in mode:
            self._maybe_fail(path)
            self._lag[path] = self.LIST_LAG
        return super()._open(path, mode, **kw)

    # --------------- list path: bounded staleness
    def ls(self, path, detail=True, **kw):
        out = super().ls(path, detail=detail, **kw)
        vis = []
        for item in out:
            name = item["name"] if detail else item
            if self._lag.get(name, 0) > 0:
                self._lag[name] -= 1
                continue
            vis.append(item)
        return vis


class TestLakeChaos:
    """The commit/resume protocol through the chaos backend."""

    def _chaos_lake(self, tag):
        lake = Lake.__new__(Lake)
        # construct against memory://, then swap in the chaos wrapper so
        # every subsequent fs call goes through the injectors
        lake.__init__(f"memory://chaos-{tag}", num_partitions=2)
        lake.fs = ChaosFileSystem()
        lake._is_local = False
        lake.fs.makedirs(lake._commits_dir(), exist_ok=True)
        return lake

    @staticmethod
    def _retry(fn, attempts=6):
        last = None
        for _ in range(attempts):
            try:
                return fn()
            except OSError as exc:
                last = exc
        raise last

    def test_commit_resume_under_transient_errors(self, tmp_path):
        """Writes fail transiently mid-commit; re-running the SAME commit
        (the Ray-task-retry contract) converges to exactly-once state
        identical to a clean lake. Writer-side base reads settle the
        listing first — the engine's documented store contract is a
        CONSISTENT list for writers (S3/GCS/Azure are strongly consistent
        today); the bounded-lag convergence below covers reader-side
        discovery on laggier stores."""
        lake = self._chaos_lake("retry")
        clean = Lake(str(tmp_path / "clean"), num_partitions=2)
        for part in (0, 1):
            for epoch in (0, 1):
                urls = [f"u{part}{epoch}a", f"u{part}{epoch}b"]
                upd = _updates(urls, [10 + epoch, 20 + epoch],
                               [epoch * 2, epoch * 2 + 1])
                for lk in (lake, clean):
                    if lk is lake:
                        lk.fs._lag.clear()  # consistent-list writer view
                    base = (lk.read_partition(part, as_of=epoch - 1)
                            if epoch else None)
                    t = merge_base_with_updates(base, upd)
                    self._retry(lambda lk=lk, t=t: lk.commit_partition(
                        part, epoch, t, _lineage(part, epoch, 2)))
        self._retry(lambda: lake.mark_epoch_done(0))
        self._retry(lambda: lake.mark_epoch_done(1))
        assert lake.fs._failed_once, "chaos never fired - test is vacuous"
        lake.fs._lag.clear()
        got = lake.read_state(include_tombstones=True)
        want = clean.read_state(include_tombstones=True)
        assert got.equals(want)
        # idempotent re-commit still skips
        t = merge_base_with_updates(None, _updates(["x"], [1], [9]))
        out = self._retry(lambda: lake.commit_partition(
            0, 0, t, _lineage(0, 0, 1)))
        assert out.skipped

    def test_listing_staleness_converges(self):
        """A committed epoch may be missing from the next LIST_LAG
        listings; discovery converges within the lag bound and the final
        read sees every epoch."""
        lake = self._chaos_lake("stale")
        t = merge_base_with_updates(None, _updates(["a", "b"], [10, 20],
                                                   [0, 1]))
        self._retry(lambda: lake.commit_partition(0, 0, t,
                                                  _lineage(0, 0, 2)))
        # exists (GET) is read-your-writes: the commit point is visible
        assert lake.is_committed(0, 0)
        # listings converge within the bounded lag
        seen = [0 in lake.committed_epochs(0)
                for _ in range(ChaosFileSystem.LIST_LAG + 1)]
        assert seen[-1], f"listing never converged: {seen}"
        assert lake.read_partition(0).column("url").to_pylist() == ["a", "b"]

    def test_recommit_under_stale_listing_is_byte_safe(self):
        """A second writer whose listing missed the first commit re-runs
        the epoch: deterministic content + commit-record gating keep the
        state identical (the double-PUT is harmless)."""
        lake = self._chaos_lake("dup")
        t = merge_base_with_updates(None, _updates(["a"], [10], [0]))
        self._retry(lambda: lake.commit_partition(0, 0, t,
                                                  _lineage(0, 0, 1)))
        before = None
        for _ in range(ChaosFileSystem.LIST_LAG + 1):
            before = lake.read_partition(0)
            if before is not None:
                break
        assert before is not None
        # writer B: same deterministic inputs, stale view → re-commit
        out = self._retry(lambda: lake.commit_partition(
            0, 0, t, _lineage(0, 0, 1)))
        assert out.skipped  # exists() is consistent → the gate holds
        # reader convergence: within the lag bound the listing heals
        for _ in range(ChaosFileSystem.LIST_LAG + 1):
            cur = lake.read_partition(0)
            if cur is not None:
                break
        assert cur.equals(before)
        assert len(lake.all_lineage()) == 1
