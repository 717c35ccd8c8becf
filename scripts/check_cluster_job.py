"""Multi-node-shaped evidence for the `ray job submit` entrypoint
(r3 verdict item #6).

This sandbox ships no Ray dashboard packages, so the Jobs REST API
(`ray job submit`, port 8265) cannot run — verified:
`ray start --include-dashboard true` → "Cannot include dashboard with
missing packages". The submit path is therefore evidenced one layer down,
on a REAL multi-raylet cluster: `ray job submit` does nothing more than
export RAY_ADDRESS into the job's env and exec the entrypoint, and that is
exactly what this script does —

1. `ray start --head --num-cpus 4` (node 1);
2. run `jobs/replay_job.py` with RAY_ADDRESS set (the submit attach path)
   → the job reports cluster_cpus=4 over 1 node;
3. re-run the SAME line → resumes from the commit log (0 events applied);
4. `ray start --address=head --num-cpus 4` (node 2 — a second raylet with
   its own object store: real cross-node scheduling + transfer);
5. run the job on a fresh lake at the doubled width → cluster_cpus=8 over
   2 nodes, throughput reported at both widths.

Prints one JSON line; exits non-zero on any contract violation.
Run from the repo root: `python scripts/check_cluster_job.py`.
"""

import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PORT = 6391
HEAD = f"127.0.0.1:{PORT}"
WORK = Path("/tmp/odl_cluster_check")


def sh(cmd, **kw):
    return subprocess.run(cmd, capture_output=True, text=True, **kw)


def submit(events, lake, extra=()):
    """The `ray job submit` attach path: RAY_ADDRESS in the job env."""
    env = dict(os.environ, RAY_ADDRESS=HEAD, PYTHONPATH=str(REPO))
    r = sh([sys.executable, str(REPO / "jobs" / "replay_job.py"),
            "--events", str(events), "--lake", str(lake),
            "--partitions", "16", "--epoch-size", "600", *extra],
           env=env, cwd=str(REPO))
    if r.returncode != 0:
        print(r.stderr[-2000:], file=sys.stderr)
        raise SystemExit(f"job failed rc={r.returncode}")
    return json.loads(r.stdout.strip().splitlines()[-1])


def nodes_alive():
    env = dict(os.environ, RAY_ADDRESS=HEAD)
    r = sh([sys.executable, "-c",
            "import ray; ray.init(logging_level='ERROR'); "
            "print(sum(1 for n in ray.nodes() if n['Alive']))"], env=env)
    return int(r.stdout.strip().splitlines()[-1])


def main() -> int:
    shutil.rmtree(WORK, ignore_errors=True)
    WORK.mkdir(parents=True)
    sh(["ray", "stop", "--force"])
    time.sleep(2)

    # fixture: 2400 events over 400 urls → 4 epochs of 600
    sys.path.insert(0, str(REPO))
    from opendataloader_pdf_ray.fixtures.gen import write_fixture_dir

    events = WORK / "events"
    write_fixture_dir(str(events), 2400, 400, seed=7, shard_size=600)

    out = {}
    try:
        r = sh(["ray", "start", "--head", f"--port={PORT}", "--num-cpus",
                "4", "--include-dashboard", "false",
                "--disable-usage-stats"], cwd="/tmp")
        assert r.returncode == 0, r.stderr[-800:]
        time.sleep(2)

        # --- width N (1 node, 4 cpus) --------------------------------
        lake_n = WORK / "lake_n"
        j1 = submit(events, lake_n)
        assert j1["cluster_cpus"] == 4, j1
        assert j1["events_applied"] == 2400, j1
        out["n_nodes_lo"], out["cpus_lo"] = nodes_alive(), 4
        out["events_per_sec_lo"] = j1["events_per_sec"]

        # --- resume on resubmit: same line, nothing re-applied -------
        j2 = submit(events, lake_n)
        assert j2["events_applied"] == 0, j2
        out["resubmit_events_applied"] = j2["events_applied"]

        # --- join node 2, width 4N→2N (2 nodes, 8 cpus) --------------
        r = sh(["ray", "start", f"--address={HEAD}", "--num-cpus", "4",
                "--disable-usage-stats"], cwd="/tmp")
        assert r.returncode == 0, r.stderr[-800:]
        time.sleep(2)
        assert nodes_alive() == 2
        lake_2n = WORK / "lake_2n"
        j3 = submit(events, lake_2n)
        assert j3["cluster_cpus"] == 8, j3
        assert j3["events_applied"] == 2400 and j3["lake_rows"] == j1["lake_rows"]
        out["n_nodes_hi"], out["cpus_hi"] = 2, 8
        out["events_per_sec_hi"] = j3["events_per_sec"]
        out["lake_rows"] = j1["lake_rows"]
        out["ok"] = True
        print(json.dumps(out))
        return 0
    finally:
        sh(["ray", "stop", "--force"])


if __name__ == "__main__":
    raise SystemExit(main())
