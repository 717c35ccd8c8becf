"""`ray job submit` entrypoint for the CDC replay pipeline.

The north-rule deployment shape is a fixed-size multi-node Ray cluster driven
by `ray job submit`; this script is that job. On a cluster:

    ray job submit --working-dir /path/to/repo -- \
        python jobs/replay_job.py --events EVENTS_DIR --lake LAKE_DIR \
        [--mode backlog|epoch|follow] [--partitions 256] [--salts 8] \
        [--epoch-size 250000] [--extract-concurrency N]

`ray job submit` exports RAY_ADDRESS into the job's environment, so the
plain `ray.init()` below attaches to the hosting cluster; run standalone
(no cluster) it starts a local session — the same code path either way.
Tuning defaults scale from `ray.cluster_resources()` at attach time, so the
same submit line works at N and 4N nodes (the scaling-pair protocol in
BASELINE.md).

The job is resumable by construction (per-partition commit log keyed on
(partition_id, epoch)): resubmitting after a failure skips completed epochs
and re-runs half-committed ones idempotently. Output is one JSON line on
stdout (throughput + lineage summary), the contract `bench.py` also prints.

This file OWNS a Ray session (CLI-script rule in CLAUDE.md); library code
never calls ray.init().
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

# `ray job submit --working-dir .` lands the repo at the job's cwd; make the
# package importable from wherever the raylet placed us.
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--events", required=True,
                   help="binlog segment directory (parquet)")
    p.add_argument("--lake", required=True, help="lake root directory")
    p.add_argument("--mode", default="backlog",
                   choices=["backlog", "epoch", "follow"],
                   help="backlog = all pending epochs in one pipeline; "
                        "epoch = micro-batch per epoch; follow = tail a "
                        "growing segment dir until EVENTS/.end")
    p.add_argument("--partitions", type=int, default=256,
                   help="lake hash partitions — fixed for the lake's "
                        "lifetime, so pick for the CLUSTER (≥ total cores), "
                        "not the current node")
    p.add_argument("--salts", type=int, default=8,
                   help="hot-key salt fanout for the two-phase LWW merge")
    p.add_argument("--epoch-size", type=int, default=250_000,
                   help="events per checkpoint epoch")
    p.add_argument("--commit-mode", default="snapshot",
                   choices=["snapshot", "delta"])
    p.add_argument("--extract-concurrency", type=int, default=0,
                   help="extractor actor-pool size; 0 = size from "
                        "ray.cluster_resources() at attach time")
    p.add_argument("--extract-num-cpus", type=float, default=0.75)
    p.add_argument("--pack-blocks", action="store_true", dest="pack_blocks",
                   help="narrow transit rows (blocks struct -> per-row "
                        "zstd'd IPC cells through the shuffles; lake bytes "
                        "identical — the cross-node-transfer lever)")
    p.add_argument("--idle-stop", type=int, default=None,
                   help="follow mode: stop after N idle polls (default: "
                        "run until EVENTS/.end appears)")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    import ray

    # Under `ray job submit` RAY_ADDRESS is set by the job runtime and this
    # attaches to the cluster; standalone it starts a local session.
    started_ray = not ray.is_initialized()
    if started_ray:
        ray.init(include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from opendataloader_pdf_ray.cdc import Lake, replay
    from opendataloader_pdf_ray.cdc.ingest import follow
    from opendataloader_pdf_ray.config import CDCConfig

    total_cpus = int(ray.cluster_resources().get("CPU", 4))
    extract_conc = args.extract_concurrency or max(2, total_cpus)
    cfg = CDCConfig(
        num_partitions=args.partitions,
        num_salts=args.salts,
        epoch_size=args.epoch_size,
        epoch_commits=args.commit_mode,
        backlog_snapshots="final" if args.mode == "backlog" else "every_epoch",
        extract_concurrency=extract_conc,
        extract_num_cpus=args.extract_num_cpus,
        pack_blocks=args.pack_blocks,
    )
    t0 = time.time()
    if args.mode == "follow":
        lineage = follow(args.events, args.lake, cfg,
                         max_idle_polls=args.idle_stop)
    else:
        lineage = replay(args.events, args.lake, cfg, mode=args.mode)
    wall = time.time() - t0

    lake = Lake(args.lake, cfg.num_partitions)
    # distributed merge-on-read count — works on snapshot AND delta lakes,
    # nothing lake-sized transits the driver
    n_rows = int(lake.read_dataset().count())
    n_events = sum(int(r.get("events_consumed", 0)) for r in lineage)
    print(json.dumps({
        "metric": "cdc_replay_wall_sec",
        "value": round(wall, 3),
        "unit": "sec",
        "mode": args.mode,
        "events_applied": n_events,
        "events_per_sec": round(n_events / wall, 1) if wall > 0 else None,
        "lake_rows": n_rows,
        "partitions": cfg.num_partitions,
        "partition_commits": len(lineage),
        "cluster_cpus": total_cpus,
        "extract_concurrency": extract_conc,
        "lake": os.path.abspath(args.lake),
    }))
    if started_ray:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
