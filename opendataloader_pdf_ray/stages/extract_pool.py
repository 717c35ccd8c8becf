"""Persistent extractor actor pool — one pool across MANY Dataset pipelines.

The default actor-mode extract stage (``map_batches(HtmlExtractor,
concurrency=N)``) spins up a NEW actor pool per Dataset execution: fine for
one long backlog pipeline, but a streaming tail runs one short pipeline per
committed epoch and pays the ~1.3 s pool spin-up every poll (BASELINE.md
round-4 tail section). Tasks mode (``CDCConfig.extract_mode="tasks"``)
sidesteps that only because the stdlib extractor constructs in ~0.6 ms — a
model-backed extractor (the reference's whole hybrid thesis: the docling
singleton is 3.3× faster than per-request construction,
``docs/hybrid/experiments/speed/speed-experiment-2026-01-03.md:7-11``) must
keep its state alive BETWEEN epochs.

This module is that third mode (``extract_mode="pool"``): K NAMED Ray
actors created once per tail run (``ray.get_actor``-discoverable), and a
stateless router callable that rides ordinary ``map_batches`` tasks and
round-robins batches to them. Per-pipeline cost is then the same as tasks
mode (no actor creation), while extractor state (config, compiled
sanitizer regexes — or a model, for subclasses) is constructed exactly
once per tail run.

Determinism: extraction is a pure function of the batch, so WHICH actor
serves a batch never changes output bytes — routing is load-balancing
metadata only.

Sizing contract (CLAUDE.md perf rule): the pool reserves
``extract_concurrency × extract_num_cpus`` CPUs for its lifetime; router
tasks are near-free waiters (``num_cpus=0.1``) so read/shuffle stages keep
their share. ``follow``/``follow_fanin`` own the pool lifecycle
(create-or-attach at start, kill in ``finally``) — a crashed tail's pool is
re-adopted by name on restart (``get_if_exists=True``), never duplicated.
"""

from __future__ import annotations

import hashlib
from typing import List, Optional

import pyarrow as pa

import ray

from ..config import CDCConfig
from .extract_stage import HtmlExtractor


def _pool_names(cfg: CDCConfig, scope: str) -> List[str]:
    """Stable actor names: scope (e.g. lake root) + FULL extractor-config
    identity, so a restarted tail re-adopts ITS pool, two tails on
    different lakes never collide, and — critically — a restart with a
    CHANGED config (quarantine flipped, new sanitizer rules) can never
    silently re-adopt actors built with the old config: the name differs,
    fresh actors are created, the stale ones die with their session."""
    ident = (f"{scope}|{cfg.extract_concurrency}|{cfg.extract_num_cpus}|"
             f"{cfg.drop_html_after_extract}|{cfg.quarantine_errors}|"
             f"{repr(cfg.extractor)}")
    key = hashlib.sha256(ident.encode()).hexdigest()[:12]
    return [f"odl-xpool-{key}-{i}" for i in range(cfg.extract_concurrency)]


@ray.remote
class ExtractPoolActor:
    """One long-lived extractor host. ``__init__`` builds the extractor
    once (the expensive part for model-backed subclasses); ``extract`` is
    per-batch work only."""

    def __init__(self, kwargs: dict):
        self.extractor = HtmlExtractor(**kwargs)

    def extract(self, batch: pa.Table) -> pa.Table:
        return self.extractor(batch)

    def ping(self) -> bool:
        return True


class ExtractPool:
    """Driver-side handle owning the named actors' lifecycle."""

    def __init__(self, cfg: CDCConfig, scope: str = ""):
        self.names = _pool_names(cfg, scope)
        kwargs = {"cfg": cfg.extractor,
                  "drop_html": cfg.drop_html_after_extract,
                  "quarantine": cfg.quarantine_errors}
        self.actors = [
            ExtractPoolActor.options(
                name=n, get_if_exists=True,
                num_cpus=cfg.extract_num_cpus).remote(kwargs)
            for n in self.names
        ]
        # warm-up barrier: the pool's one-time construction cost is paid
        # HERE (tail start), never inside an epoch pipeline
        ray.get([a.ping.remote() for a in self.actors])

    def shutdown(self) -> None:
        for a in self.actors:
            try:
                ray.kill(a)
            except Exception:
                pass
        self.actors = []

    def __enter__(self) -> "ExtractPool":
        return self

    def __exit__(self, *exc) -> None:
        self.shutdown()


_WORKER_RR = None  # module-global: persists across tasks in one worker


def _next_rr() -> int:
    """Per-worker-process round-robin. A PoolRouter instance deserializes
    FRESH per map_batches task, so instance state would restart at the
    same actor for every task a reused worker runs — measured to starve
    most of the pool at 32 actors. The module-global counter survives
    task boundaries within a worker, so successive tasks walk the pool."""
    global _WORKER_RR
    if _WORKER_RR is None:
        import itertools
        import os

        _WORKER_RR = itertools.count(os.getpid())
    return next(_WORKER_RR)


class PoolRouter:
    """The map_batches callable for pool mode: stateless, constructs
    instantly, forwards each batch to one pool actor. Round-robin is a
    per-worker module-global (see :func:`_next_rr`) so concurrent router
    tasks spread across the pool without coordination (routing never
    affects output bytes)."""

    def __init__(self, names: List[str]):
        self.names = names
        self._handles: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        name = self.names[_next_rr() % len(self.names)]
        actor = self._handles.get(name)
        if actor is None:
            try:
                actor = ray.get_actor(name)
            except ValueError:
                raise RuntimeError(
                    f"extract_mode='pool' but pool actor {name!r} is not "
                    f"alive — the pool is owned by the tail loop "
                    f"(follow/follow_fanin) or an explicit ExtractPool "
                    f"context; for standalone ingest use "
                    f"extract_mode='actors'") from None
            self._handles[name] = actor
        return ray.get(actor.extract.remote(batch))
