"""Cooperative maintenance lease (cdc/lease.py): retention/backfill run
UNDER a live follow tail — the tail pauses at an epoch boundary and resumes
past the maintenance epoch via the binlog→lake epoch-offset map; no
WriterFencedError, final state byte-equal to the quiesced sequence
(r3 verdict item #2)."""

import os
import threading
import time

import pyarrow as pa
import pytest

from opendataloader_pdf_ray.cdc import Lake
from opendataloader_pdf_ray.cdc.ingest import CDCConfig, follow, ingest_epoch
from opendataloader_pdf_ray.cdc.lease import (
    LeaseState,
    acquire_maint_epoch,
    lake_epoch,
    read_offsets,
    release_lease,
    request_lease,
)
from opendataloader_pdf_ray.cdc.retention import apply_retention
from opendataloader_pdf_ray.fixtures.gen import gen_events

CFG = CDCConfig(num_partitions=4, num_salts=2, epoch_size=60,
                extract_batch_size=16, extract_concurrency=2)


def _write_segments(table, out_dir, lo, hi, shard=30):
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    part = table.filter((pc.field("seq") >= lo) & (pc.field("seq") < hi))
    for s in range(lo, hi, shard):
        chunk = part.filter((pc.field("seq") >= s)
                            & (pc.field("seq") < s + shard))
        if chunk.num_rows:
            pq.write_table(chunk, f"{out_dir}/seg-{s:06d}.parquet")


def _cutoff(lake):
    ts = sorted(lake.read_state()["warc_ts"].cast(pa.int64()).to_pylist())
    return ts[len(ts) // 2] + 1


def _oracle(tmp_path, events, seg_dir, cutoff):
    """The quiesced sequence: binlog epochs 0-1, retention at lake epoch 2,
    binlog epochs 2-3 shifted to lake epochs 3-4."""
    lake = Lake(str(tmp_path / "oracle"), CFG.num_partitions)
    paths = sorted(f"{seg_dir}/{n}" for n in os.listdir(seg_dir)
                   if n.endswith(".parquet"))
    for e in (0, 1):
        ingest_epoch(paths, lake, e, CFG)
        lake.mark_epoch_done(e)
    apply_retention(lake, cutoff, epoch=2)
    for e in (2, 3):
        ingest_epoch(paths, lake, e, CFG, commit_epoch=e + 1)
        lake.mark_epoch_done(e + 1)
    return lake


@pytest.mark.usefixtures("ray_session")
class TestLeaseProtocol:
    def test_stepwise_grant_pause_resume(self, tmp_path):
        """Protocol mechanics, fully deterministic (no threads): request →
        tail grants at an epoch boundary and pauses → cooperative op runs
        in the granted slot → tail resumes shifted."""
        events = gen_events(240, 40, seed=21)
        seg_dir = str(tmp_path / "segs")
        lake_root = str(tmp_path / "lake")
        _write_segments(events, seg_dir, 0, 120)  # binlog epochs 0, 1
        follow(seg_dir, lake_root, CFG, poll_interval=0.05,
               max_idle_polls=2)
        lake = Lake(lake_root)
        assert lake.is_epoch_done(0) and lake.is_epoch_done(1)

        cutoff = _cutoff(lake)
        req = request_lease(lake, f"retention:{cutoff}")
        # the tail services the request: grants lake epoch 2, pauses
        follow(seg_dir, lake_root, CFG, poll_interval=0.05,
               max_idle_polls=2)
        assert read_offsets(lake) == [(2, 1)]
        # the cooperative op adopts the grant immediately
        lineage = apply_retention(lake, cutoff, cooperative=True,
                                  lease_timeout=5)
        assert lineage and all(l["epoch"] == 2 for l in lineage)
        assert lake.is_epoch_complete(2)
        assert lake.read_lineage(lineage[0]["part"], 2).kind == "retention"

        # tail resumes: binlog epochs 2, 3 land at lake epochs 3, 4
        _write_segments(events, seg_dir, 120, 240)
        open(os.path.join(seg_dir, ".end"), "w").close()
        follow(seg_dir, lake_root, CFG, poll_interval=0.05)
        assert lake.is_epoch_done(3) and lake.is_epoch_done(4)
        assert lake.verify(deep=True)["ok"]

        oracle = _oracle(tmp_path, events, seg_dir, cutoff)
        got = lake.read_state(include_tombstones=True)
        want = oracle.read_state(include_tombstones=True)
        assert got.equals(want)

    def test_live_tail_with_concurrent_retention_and_compact(self,
                                                             tmp_path):
        """The r3 verdict 'done' criterion: follow runs CONTINUOUSLY in a
        background thread while cooperative retention (and a distributed
        compact on the delta chain) run against the same lake — no fence
        exception, final state == the sequential oracle."""
        cfg = CDCConfig(num_partitions=4, num_salts=2, epoch_size=60,
                        extract_batch_size=16, extract_concurrency=2,
                        epoch_commits="delta")
        events = gen_events(240, 40, seed=22)
        seg_dir = str(tmp_path / "segs")
        lake_root = str(tmp_path / "lake")
        _write_segments(events, seg_dir, 0, 120)

        errors = []

        def tail():
            try:
                follow(seg_dir, lake_root, cfg, poll_interval=0.05,
                       max_idle_polls=400)
            except Exception as exc:  # pragma: no cover - failure path
                errors.append(exc)

        t = threading.Thread(target=tail, daemon=True)
        t.start()
        lake = None
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            try:
                lake = Lake(lake_root)
                if lake.is_epoch_done(0) and lake.is_epoch_done(1):
                    break
            except Exception:
                pass
            time.sleep(0.05)
        assert lake is not None and lake.is_epoch_done(1)

        cutoff = _cutoff(lake)
        # cooperative retention: the LIVE tail grants and pauses
        lineage = apply_retention(lake, cutoff, cooperative=True,
                                  lease_timeout=30)
        assert lineage and all(l["epoch"] == 2 for l in lineage)
        # compact is epoch-less: safe beside the (resumed) live tail
        lake.compact_distributed()
        _write_segments(events, seg_dir, 120, 240)
        open(os.path.join(seg_dir, ".end"), "w").close()
        t.join(timeout=120)
        assert not t.is_alive()
        assert errors == []  # no WriterFencedError, no collision
        assert lake.is_epoch_done(3) and lake.is_epoch_done(4)
        assert lake.verify(deep=True)["ok"]

        oracle = _oracle(tmp_path, events, seg_dir, cutoff)
        got = lake.read_state(include_tombstones=True)
        want = oracle.read_state(include_tombstones=True)
        assert got.equals(want)

    def test_cli_follow_with_cli_cooperative_retention(self, tmp_path,
                                                       capsys):
        """End-to-end through the CLI surfaces: `ingest --mode follow`
        tails in a background thread while `retention --cooperative` runs —
        no fence exception, the tail drains to .end normally, the
        maintenance epoch sits between the binlog epochs."""
        from opendataloader_pdf_ray.__main__ import main

        events = gen_events(180, 40, seed=24)
        seg_dir = str(tmp_path / "segs")
        lake_root = str(tmp_path / "lake")
        _write_segments(events, seg_dir, 0, 60)

        rcs, errors = [], []

        def tail():
            try:
                rcs.append(main(["ingest", seg_dir, lake_root,
                                 "--mode", "follow",
                                 "--poll-interval", "0.05",
                                 "--epoch-size", "60",
                                 "--partitions", "4"]))
            except Exception as exc:  # pragma: no cover - failure path
                errors.append(exc)

        t = threading.Thread(target=tail, daemon=True)
        t.start()
        lake = None
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            try:
                lake = Lake(lake_root)
                if lake.is_epoch_done(0):
                    break
            except Exception:
                pass
            time.sleep(0.05)
        assert lake is not None and lake.is_epoch_done(0)
        cutoff = _cutoff(lake)
        assert main(["retention", lake_root, str(cutoff),
                     "--cooperative", "--lease-timeout", "30"]) == 0
        _write_segments(events, seg_dir, 60, 180)
        open(os.path.join(seg_dir, ".end"), "w").close()
        t.join(timeout=120)
        assert not t.is_alive() and errors == [] and rcs == [0]
        # binlog epochs 0, (maint 1), 1→2, partial 2→3
        assert lake.read_lineage(
            next(p for p in range(4) if lake.is_committed(p, 1)), 1
        ).kind == "retention"
        assert lake.is_epoch_done(2) and lake.is_epoch_done(3)
        assert lake.verify(deep=True)["ok"]

    def test_grant_without_tail_times_out_and_unwedges(self, tmp_path):
        events = gen_events(60, 20, seed=23)
        seg_dir = str(tmp_path / "segs")
        lake_root = str(tmp_path / "lake")
        _write_segments(events, seg_dir, 0, 60)
        open(os.path.join(seg_dir, ".end"), "w").close()
        follow(seg_dir, lake_root, CFG, poll_interval=0.05)
        lake = Lake(lake_root)
        with pytest.raises(TimeoutError, match="no tail granted"):
            acquire_maint_epoch(lake, "retention:5", timeout=0.3,
                                poll_interval=0.05)
        # the timed-out request is removed — the lake is not wedged
        req = request_lease(lake, "other-op")
        release_lease(lake, req)

    def test_offset_repair_and_stale_grant_gc(self, tmp_path):
        """Crash between grant write and offsets write → repaired from the
        grant; a finished op's leftover grant (crash inside release) is
        garbage-collected and the tail resumes."""
        import json

        lake = Lake(str(tmp_path / "lake"), 4)
        lake.fs.makedirs(lake._commits_dir(), exist_ok=True)
        grant = {"id": "x#1", "epoch": 2, "from_binlog": 2, "offset": 1}
        lake._write_small_atomic(
            os.path.join(lake._commits_dir(), "maint_grant.json"),
            json.dumps(grant).encode())
        st = LeaseState(lake)
        # op mid-flight (epoch 2 incomplete, request gone = crashed op):
        # stay paused, but offsets repaired
        assert st.poll() is True
        assert read_offsets(lake) == [(2, 1)]
        assert st.lake_epoch(1) == 1 and st.lake_epoch(2) == 3
        # the op completes (maint marker) → grant GC'd, tail resumes
        lake.mark_epoch_maint(2)
        assert st.poll() is False
        assert not os.path.exists(
            os.path.join(lake._commits_dir(), "maint_grant.json"))

    def test_second_request_while_busy_refused(self, tmp_path):
        lake = Lake(str(tmp_path / "lake"), 4)
        lake.fs.makedirs(lake._commits_dir(), exist_ok=True)
        request_lease(lake, "retention:1")
        with pytest.raises(ValueError, match="lease busy"):
            request_lease(lake, "backfill")
        # same op re-adopts its own request (crash/retry)
        again = request_lease(lake, "retention:1")
        assert again["name"] == "retention:1"

    def test_lake_epoch_mapping(self):
        steps = [(2, 1), (5, 2)]
        assert [lake_epoch(e, steps) for e in range(7)] == \
            [0, 1, 3, 4, 5, 7, 8]

    def test_orphan_grant_readopted_after_timeout_race(self, tmp_path):
        """ADVICE r4 (lease.py await_grant race): the timeout deletes the
        request, racing the tail's grant write. If the grant lands just
        after the delete, a same-name re-run must RE-ADOPT the orphan
        grant (same id, same reserved epoch) instead of minting a fresh
        id that never matches — otherwise the tail pauses forever."""
        events = gen_events(240, 40, seed=25)
        seg_dir = str(tmp_path / "segs")
        lake_root = str(tmp_path / "lake")
        _write_segments(events, seg_dir, 0, 120)
        follow(seg_dir, lake_root, CFG, poll_interval=0.05,
               max_idle_polls=2)
        lake = Lake(lake_root)
        cutoff = _cutoff(lake)
        name = f"retention:{cutoff}"
        req = request_lease(lake, name)
        # tail services the request: grant lands, tail pauses then exits
        follow(seg_dir, lake_root, CFG, poll_interval=0.05,
               max_idle_polls=2)
        # simulate the race's aftermath: request deleted (await_grant
        # timeout) AFTER the grant landed
        lake.fs.rm_file(os.path.join(lake._commits_dir(),
                                     "maint_request.json"))
        # same-name re-run adopts the orphan grant instantly
        epoch, req2 = acquire_maint_epoch(lake, name, timeout=2,
                                          poll_interval=0.05)
        assert req2["id"] == req["id"] and epoch == 2
        # and the op completes normally through the adopted lease
        lineage = apply_retention(lake, cutoff, cooperative=True,
                                  lease_timeout=5)
        assert lineage and all(l["epoch"] == 2 for l in lineage)
        assert lake.is_epoch_complete(2)
        # resume the tail through the remaining binlog epochs
        _write_segments(events, seg_dir, 120, 240)
        open(os.path.join(seg_dir, ".end"), "w").close()
        follow(seg_dir, lake_root, CFG, poll_interval=0.05)
        lake2 = Lake(lake_root)
        assert lake2.is_epoch_done(3) and lake2.is_epoch_done(4)
        oracle = _oracle(tmp_path, events, seg_dir, cutoff)
        assert lake2.read_state(include_tombstones=True).equals(
            oracle.read_state(include_tombstones=True))

    def test_paused_polls_do_not_consume_idle_budget(self, tmp_path):
        """ADVICE r4 (ingest.py): lease-paused polls must not count
        toward max_idle_polls (a bounded drain abandoning a grant it just
        issued), but the separate 4× paused bound still terminates a
        deliberate bounded drain."""
        import time as _t

        events = gen_events(120, 30, seed=26)
        seg_dir = str(tmp_path / "segs")
        lake_root = str(tmp_path / "lake")
        _write_segments(events, seg_dir, 0, 120)
        follow(seg_dir, lake_root, CFG, poll_interval=0.05,
               max_idle_polls=2)
        lake = Lake(lake_root)
        request_lease(lake, "retention:999")
        t0 = _t.monotonic()
        follow(seg_dir, lake_root, CFG, poll_interval=0.05,
               max_idle_polls=2)
        elapsed = _t.monotonic() - t0
        # exited via the 4× paused bound (8 paused polls), not the
        # ordinary idle budget (2): the grant was issued first, so the
        # run must have stayed ≥ 8 × 0.05 s in the paused state
        from opendataloader_pdf_ray.cdc.lease import _read_json

        assert _read_json(lake, "maint_grant.json") is not None
        assert elapsed >= 8 * 0.05
        # cleanup: release so the lake is not wedged for later asserts
        release_lease(lake, {"id": "ignored"})

    def test_follower_refresh_fires_on_resume_from_pause(self, tmp_path):
        """ADVICE r4 (ingest.py): after a cooperative maintenance epoch
        completes, attached followers must refresh on RESUME — an idle
        stream may never produce another binlog epoch to trigger it."""
        events = gen_events(120, 30, seed=27)
        seg_dir = str(tmp_path / "segs")
        lake_root = str(tmp_path / "lake")
        _write_segments(events, seg_dir, 0, 120)

        class _Rec:
            def __init__(self):
                self.calls = []

            def refresh(self, lk):
                self.calls.append(lk.is_epoch_complete(2))

        rec = _Rec()
        errors = []

        def tail():
            try:
                follow(seg_dir, lake_root, CFG, poll_interval=0.05,
                       max_idle_polls=600, followers=[rec])
            except Exception as exc:  # pragma: no cover - failure path
                errors.append(exc)

        t = threading.Thread(target=tail, daemon=True)
        t.start()
        lake = None
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            try:
                lake = Lake(lake_root)
                if lake.is_epoch_done(0) and lake.is_epoch_done(1):
                    break
            except Exception:
                pass
            time.sleep(0.05)
        assert lake is not None and lake.is_epoch_done(1)
        n_before = len(rec.calls)
        cutoff = _cutoff(lake)
        apply_retention(lake, cutoff, cooperative=True, lease_timeout=30)
        # NO new segments: the refresh must come from resume-from-pause
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline and len(rec.calls) == n_before:
            time.sleep(0.05)
        assert len(rec.calls) > n_before, \
            "follower refresh never fired after the maintenance epoch"
        assert rec.calls[-1] is True  # maintenance epoch visible to it
        open(os.path.join(seg_dir, ".end"), "w").close()
        t.join(timeout=120)
        assert not t.is_alive() and errors == []
