"""Cooperative maintenance lease: run retention/backfill UNDER a live tail.

The writer fence (``Lake.acquire_writer``) makes tail-vs-maintenance races
safe by KILLING the tail — correct, but at 100 TB you cannot stop the stream
to compact (r3 verdict item #2). This module adds the cooperative path: a
maintenance op *requests* an epoch instead of taking writership, the tail
*grants* it at an epoch boundary and pauses ingest (it keeps polling — no
``WriterFencedError``), the op runs in the granted slot, releases, and the
tail resumes with its binlog→lake epoch numbering shifted past the
maintenance epoch.

Protocol (all files are ops-plane metadata under ``_commits/``; they never
influence data bytes):

1. ``maint_request.json`` {id, name} — written by the maintenance op
   (:func:`request_lease`); idempotent per name so a crashed op re-adopts
   its own request.
2. The tail (``ingest.follow``) services the request at the END of a poll,
   once every currently-complete binlog epoch is ingested: it writes
   ``maint_grant.json`` {id, epoch: L, from_binlog: d, offset: k+1} where
   ``d`` is the first not-yet-done binlog epoch and ``L = d + k`` the next
   free lake epoch, then appends step ``(d, k+1)`` to
   ``binlog_offsets.json`` — reserving lake epoch L for the maintenance op
   and shifting every later binlog epoch up by one. Grant-then-offsets
   write order makes a crash between the two repairable (the step is
   embedded in the grant; :func:`repair_offsets` re-applies it).
3. While request or grant exist the tail is PAUSED: it polls, it stays
   alive, it ingests nothing — so the maintenance op's ``as_of = L − 1``
   read is quiesced-equivalent by construction.
4. The op runs with ``epoch=L`` through its normal exactly-once machinery
   (backfill marker + per-partition commit records — crash/resume
   unchanged), publishes the ``.maint`` watermark, and calls
   :func:`release_lease` (request removed FIRST, then grant: a crash
   between the two leaves a grant whose epoch is complete, which the tail
   garbage-collects and resumes — it can never double-grant).

The epoch-offset map is what makes interleaving sound: binlog epoch ``e``
commits at lake epoch ``e + offset(e)``, so maintenance epochs and binlog
epochs share one totally-ordered epoch line with no collisions —
``_guard_cdc_epoch`` stays as the backstop but can no longer fire on a
cooperative tail. Time travel, change feeds, replication and follower
indexes see maintenance epochs exactly as they do on a quiesced lake.

A tail that finds a grant whose epoch is INCOMPLETE and whose request is
gone stays paused: that is a maintenance op that crashed mid-run — re-run
it (it re-adopts the grant and resumes its partition commits); the tail
resumes the moment the epoch's marker lands. Visible-and-safe beats
silently-ingesting-past-a-half-written-epoch.

Scope: plain ``follow`` tails AND ``follow_fanin`` (the merged-epoch
numbering shifts past granted maintenance epochs identically — the
K-source seq remap lives in the ``seq`` column and is untouched by lake
epoch numbers).
"""

from __future__ import annotations

import json
import posixpath
import time
from typing import List, Optional, Tuple

from .lake import Lake

_REQUEST = "maint_request.json"
_GRANT = "maint_grant.json"
_OFFSETS = "binlog_offsets.json"


def _path(lake: Lake, name: str) -> str:
    return posixpath.join(lake._commits_dir(), name)


def _read_json(lake: Lake, name: str) -> Optional[dict]:
    try:
        with lake.fs.open(_path(lake, name), "rb") as f:
            return json.loads(f.read().decode())
    except FileNotFoundError:
        return None


# ------------------------------------------------------------- offset map


def read_offsets(lake: Lake) -> List[Tuple[int, int]]:
    """Sorted (from_binlog_epoch, offset) steps; binlog epoch ``e`` commits
    at lake epoch ``e + offset(e)`` where offset(e) is the last step with
    ``from_binlog_epoch <= e`` (0 before any step)."""
    rec = _read_json(lake, _OFFSETS)
    if rec is None:
        return []
    return [(int(f), int(o)) for f, o in rec["steps"]]


def _write_offsets(lake: Lake, steps: List[Tuple[int, int]]) -> None:
    lake._write_small_atomic(
        _path(lake, _OFFSETS),
        json.dumps({"steps": [[f, o] for f, o in steps]}).encode())


def lake_epoch(e: int, steps: List[Tuple[int, int]]) -> int:
    """Map a binlog epoch to its lake epoch under the offset steps."""
    off = 0
    for f, o in steps:
        if f <= e:
            off = o
        else:
            break
    return e + off


def current_offset(steps: List[Tuple[int, int]]) -> int:
    return steps[-1][1] if steps else 0


def repair_offsets(lake: Lake, steps: List[Tuple[int, int]],
                   grant: dict) -> List[Tuple[int, int]]:
    """Idempotently fold a grant's embedded offset step into the map (heals
    a tail crash between grant write and offsets write)."""
    step = (int(grant["from_binlog"]), int(grant["offset"]))
    if step not in steps:
        steps = sorted(set(steps) | {step})
        _write_offsets(lake, steps)
    return steps


# ------------------------------------------------------- maintenance side


def request_lease(lake: Lake, name: str) -> dict:
    """Post (or re-adopt) the maintenance request. One outstanding request
    at a time; a DIFFERENT op's pending request is refused loudly."""
    cur = _read_json(lake, _REQUEST)
    if cur is not None:
        if cur.get("name") == name:
            return cur  # crashed/retried op re-adopts its own request
        raise ValueError(
            f"maintenance lease busy: {cur.get('name')!r} has a pending "
            f"request on {lake.root} — finish or release it first")
    # Orphan-grant re-adoption (ADVICE r4): await_grant's timeout deletes
    # the request, racing the tail's want_grant→grant write. If the grant
    # landed just after the delete, the tail is paused on an incomplete
    # grant no request matches and a fresh id (#gen+1) would never match
    # it. A same-NAME re-run adopts the orphan grant's id instead: the
    # request is re-posted with that id, await_grant returns immediately,
    # and the op runs in the already-reserved epoch.
    grant = _read_json(lake, _GRANT)
    if grant is not None:
        gid = str(grant.get("id", ""))
        if (gid.rsplit("#", 1)[0] == name
                and not lake.is_epoch_complete(int(grant["epoch"]))):
            req = {"id": gid, "name": name}
            lake._write_small_atomic(_path(lake, _REQUEST),
                                     json.dumps(req).encode())
            return req
    gen = current_offset(read_offsets(lake)) + 1
    req = {"id": f"{name}#{gen}", "name": name}
    lake._write_small_atomic(_path(lake, _REQUEST),
                             json.dumps(req).encode())
    return req


def await_grant(lake: Lake, req: dict, timeout: float = 60.0,
                poll_interval: float = 0.1) -> int:
    """Block until the tail grants the request; returns the granted lake
    epoch. Raises TimeoutError if no tail services the request (no live
    tail → use the ordinary quiesced path instead) — the request file is
    removed so the lake is not left wedged."""
    deadline = time.monotonic() + timeout
    while True:
        grant = _read_json(lake, _GRANT)
        if grant is not None and grant.get("id") == req["id"]:
            return int(grant["epoch"])
        if time.monotonic() >= deadline:
            try:
                lake.fs.rm_file(_path(lake, _REQUEST))
            except FileNotFoundError:
                pass
            raise TimeoutError(
                f"no tail granted maintenance lease {req['id']!r} within "
                f"{timeout}s — is a `ingest --mode follow` tail running? "
                f"For a quiesced lake run the op without cooperative=True")
        time.sleep(poll_interval)


def release_lease(lake: Lake, req: dict) -> None:
    """Finish the handshake: request first, then grant (a crash between
    the two leaves a complete-epoch grant the tail garbage-collects)."""
    try:
        lake.fs.rm_file(_path(lake, _REQUEST))
    except FileNotFoundError:
        pass
    try:
        lake.fs.rm_file(_path(lake, _GRANT))
    except FileNotFoundError:
        pass


def acquire_maint_epoch(lake: Lake, name: str, timeout: float = 60.0,
                        poll_interval: float = 0.1) -> Tuple[int, dict]:
    """request + await in one call; returns (granted lake epoch, request)."""
    req = request_lease(lake, name)
    return await_grant(lake, req, timeout, poll_interval), req


# --------------------------------------------------------------- tail side


class LeaseState:
    """Per-poll lease servicing for ``ingest.follow`` — pure protocol, no
    data-plane work. ``paused`` means: ingest NOTHING this poll."""

    def __init__(self, lake: Lake):
        self.lake = lake
        self.steps = read_offsets(lake)

    def poll(self) -> bool:
        """Returns paused?  Also garbage-collects stale grants and repairs
        the offset map from a grant if a prior crash interrupted the
        two-step grant write."""
        lake = self.lake
        grant = _read_json(lake, _GRANT)
        req = _read_json(lake, _REQUEST)
        if grant is not None:
            self.steps = repair_offsets(lake, self.steps, grant)
            if req is not None and req.get("id") == grant.get("id"):
                return True  # maintenance active (or about to start)
            if lake.is_epoch_complete(int(grant["epoch"])):
                # finished op crashed before removing its grant — GC it
                try:
                    lake.fs.rm_file(_path(lake, _GRANT))
                except FileNotFoundError:
                    pass
                return req is not None
            # op crashed MID-RUN: stay paused until it is re-run and
            # completes (module docstring — never ingest past a
            # half-written maintenance epoch)
            return True
        return False  # a bare request is serviced at end-of-poll

    def want_grant(self) -> Optional[dict]:
        """The request to service at end-of-poll, if any (no grant yet)."""
        req = _read_json(self.lake, _REQUEST)
        if req is None or _read_json(self.lake, _GRANT) is not None:
            return None
        return req

    def grant(self, req: dict) -> None:
        """Issue the grant: every currently-complete binlog epoch is done
        (caller guarantees — end of an ingest loop), so the first not-done
        binlog epoch ``d`` marks the boundary; lake epoch ``d + k`` is
        reserved for the op and later binlog epochs shift to ``+ (k+1)``."""
        lake = self.lake
        d = 0
        while lake.is_epoch_done(lake_epoch(d, self.steps)):
            d += 1
        k = current_offset(self.steps)
        grant = {"id": req["id"], "epoch": d + k,
                 "from_binlog": d, "offset": k + 1}
        lake._write_small_atomic(_path(lake, _GRANT),
                                 json.dumps(grant).encode())
        self.steps = repair_offsets(lake, self.steps, grant)

    def lake_epoch(self, e: int) -> int:
        return lake_epoch(e, self.steps)
