"""Cluster-mode scaling pair: the north-rule N-vs-2N measurement run
through `jobs/replay_job.py` on a REAL multi-raylet cluster (r4 verdict
item #2).

The within-box `bench.py --scaling` pair cannot see cross-node object
transfer — the one cost a real cluster adds on the two shuffles. This
script measures exactly that: the SAME job entrypoint (`ray job submit`
attach path — RAY_ADDRESS in the job env), on the SAME event log,

1. at 1 raylet × C CPUs (head node only), fresh lake → ev/s_lo;
2. at 2 raylets × C CPUs each (a second `ray start --address=head` raylet
   with its OWN plasma store — every shuffle block crossing raylets rides
   the real object-transfer path), fresh lake → ev/s_hi;
3. efficiency = ev/s_hi / (2 × ev/s_lo), plus the same-moment register-burn
   probe (BASELINE.md round-2 protocol) so the shared-host ceiling is
   on record, and a lake-equality check between the two widths.

Prints ONE JSON line; exits non-zero on any contract violation. Run from
the repo root with NO other Ray session live:
`python scripts/cluster_scaling_pair.py [--cpus 4] [--events N]`.
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PORT = 6393
HEAD = f"127.0.0.1:{PORT}"
WORK = Path("/tmp/odl_cluster_scaling")

_PROBE_SRC = """
import sys, time
x, n = 1234567, 0
end = time.perf_counter() + float(sys.argv[1])
while time.perf_counter() < end:
    for _ in range(10000):
        x = (x * 1103515245 + 12345) & 0x7fffffff
    n += 10000
print(n)
"""


def sh(cmd, **kw):
    return subprocess.run(cmd, capture_output=True, text=True, **kw)


def cpu_probe(nproc: int, secs: float = 3.0) -> float:
    procs = [subprocess.Popen([sys.executable, "-c", _PROBE_SRC, str(secs)],
                              stdout=subprocess.PIPE, text=True)
             for _ in range(nproc)]
    return sum(int(p.communicate()[0]) for p in procs) / secs


def submit(events, lake, partitions, epoch_size, extra=()):
    env = dict(os.environ, RAY_ADDRESS=HEAD, PYTHONPATH=str(REPO))
    r = sh([sys.executable, str(REPO / "jobs" / "replay_job.py"),
            "--events", str(events), "--lake", str(lake),
            "--partitions", str(partitions),
            "--epoch-size", str(epoch_size), *extra],
           env=env, cwd=str(REPO))
    if r.returncode != 0:
        print(r.stderr[-2000:], file=sys.stderr)
        raise SystemExit(f"job failed rc={r.returncode}")
    return json.loads(r.stdout.strip().splitlines()[-1])


def lake_state_hash(lake_root: str) -> str:
    """Order-independent hash of the live lake state (url, seq, text)."""
    env = dict(os.environ, RAY_ADDRESS=HEAD, PYTHONPATH=str(REPO))
    code = (
        "import sys, hashlib; sys.path.insert(0, %r)\n"
        "from opendataloader_pdf_ray.cdc import Lake\n"
        "lake = Lake(%r)\n"
        "t = lake.read_state(include_tombstones=True)\n"
        "rows = sorted(zip(t['url'].to_pylist(), t['seq'].to_pylist(),\n"
        "              t['text'].to_pylist()))\n"
        "h = hashlib.sha256(repr(rows).encode()).hexdigest()\n"
        "print(h + ':' + str(t.num_rows))\n" % (str(REPO), lake_root))
    r = sh([sys.executable, "-c", code], env=env)
    assert r.returncode == 0, r.stderr[-800:]
    return r.stdout.strip().splitlines()[-1]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=4,
                    help="CPUs per raylet (pair is C vs 2xC)")
    ap.add_argument("--events", type=int, default=48_000)
    ap.add_argument("--urls", type=int, default=8_000)
    ap.add_argument("--pack-blocks", action="store_true",
                    dest="pack_blocks")
    args = ap.parse_args()

    shutil.rmtree(WORK, ignore_errors=True)
    WORK.mkdir(parents=True)
    sh(["ray", "stop", "--force"])
    time.sleep(2)

    sys.path.insert(0, str(REPO))
    from opendataloader_pdf_ray.fixtures.gen import write_fixture_dir

    events = WORK / "events"
    write_fixture_dir(str(events), args.events, args.urls, seed=7,
                      shard_size=max(600, args.events // 24))
    partitions = 8 * args.cpus          # fixed for both widths
    epoch_size = args.events // 4

    extra = ["--pack-blocks"] if args.pack_blocks else []
    out = {"metric": "cluster_scaling_pair", "events": args.events,
           "cpus_per_raylet": args.cpus, "pack_blocks": args.pack_blocks}
    try:
        r = sh(["ray", "start", "--head", f"--port={PORT}",
                "--num-cpus", str(args.cpus), "--include-dashboard",
                "false", "--disable-usage-stats"], cwd="/tmp")
        assert r.returncode == 0, r.stderr[-800:]
        time.sleep(2)

        # --- width 1 raylet ------------------------------------------
        probe_lo = cpu_probe(args.cpus)
        j1 = submit(events, WORK / "lake_1n", partitions, epoch_size, extra)
        assert j1["cluster_cpus"] == args.cpus, j1
        assert j1["events_applied"] == args.events, j1
        out["nodes_lo"], out["events_per_sec_lo"] = 1, j1["events_per_sec"]

        # --- join raylet 2 (own plasma store) ------------------------
        r = sh(["ray", "start", f"--address={HEAD}",
                "--num-cpus", str(args.cpus), "--disable-usage-stats"],
               cwd="/tmp")
        assert r.returncode == 0, r.stderr[-800:]
        time.sleep(2)
        probe_hi = cpu_probe(2 * args.cpus)
        j2 = submit(events, WORK / "lake_2n", partitions, epoch_size, extra)
        assert j2["cluster_cpus"] == 2 * args.cpus, j2
        assert j2["events_applied"] == args.events, j2
        out["nodes_hi"], out["events_per_sec_hi"] = 2, j2["events_per_sec"]

        # --- efficiency + ceiling calibration ------------------------
        out["scaling_efficiency_raw"] = round(
            j2["events_per_sec"] / (2 * j1["events_per_sec"]), 3)
        out["probe_efficiency"] = round(probe_hi / (2 * probe_lo), 3)
        out["scaling_efficiency_ceiling_relative"] = round(
            out["scaling_efficiency_raw"] / out["probe_efficiency"], 3)

        # --- cross-width state equality ------------------------------
        h1 = lake_state_hash(str(WORK / "lake_1n"))
        h2 = lake_state_hash(str(WORK / "lake_2n"))
        assert h1 == h2, f"lake state diverged across widths: {h1} != {h2}"
        out["lake_state_hash"] = h1.split(":")[0][:16]
        out["lake_rows"] = int(h1.split(":")[1])
        out["ok"] = True
        print(json.dumps(out))
        return 0
    finally:
        sh(["ray", "stop", "--force"])


if __name__ == "__main__":
    raise SystemExit(main())
