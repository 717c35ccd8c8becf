"""Persistent extractor actor pool (stages/extract_pool.py) — r4 verdict
item #1: a model-backed tail must keep extractor state alive BETWEEN epoch
pipelines instead of paying per-pipeline actor-pool spin-up. Verifies the
pool mode is byte-identical to tasks/actors mode, that the pool actors
survive across epochs within one tail run, and the lifecycle contract."""

import os

import pytest

import ray

from opendataloader_pdf_ray.cdc import Lake
from opendataloader_pdf_ray.cdc.ingest import CDCConfig, follow, ingest_epoch
from opendataloader_pdf_ray.fixtures.gen import gen_events

CFG_KW = dict(num_partitions=4, num_salts=2, epoch_size=60,
              extract_batch_size=16, extract_concurrency=2,
              extract_num_cpus=0.5)


def _write_segments(table, out_dir, shard=30):
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    n = table.num_rows
    for s in range(0, n, shard):
        chunk = table.filter((pc.field("seq") >= s)
                             & (pc.field("seq") < s + shard))
        if chunk.num_rows:
            pq.write_table(chunk, f"{out_dir}/seg-{s:06d}.parquet")


@pytest.mark.usefixtures("ray_session")
class TestExtractPool:
    def test_pool_mode_byte_identical_to_tasks(self, tmp_path):
        """Same segments through a pool-mode tail and a tasks-mode tail →
        byte-equal lake state (routing is load-balancing metadata only)."""
        events = gen_events(180, 40, seed=31)
        seg_dir = str(tmp_path / "segs")
        _write_segments(events, seg_dir)
        open(os.path.join(seg_dir, ".end"), "w").close()

        lakes = {}
        for mode in ("tasks", "pool"):
            cfg = CDCConfig(extract_mode=mode, **CFG_KW)
            root = str(tmp_path / f"lake_{mode}")
            lineage = follow(seg_dir, root, cfg, poll_interval=0.05)
            assert lineage
            lakes[mode] = Lake(root)
        got = lakes["pool"].read_state(include_tombstones=True)
        want = lakes["tasks"].read_state(include_tombstones=True)
        assert got.equals(want)

    def test_pool_survives_across_epochs_and_dies_on_exit(self, tmp_path):
        """The pool actors are created ONCE per tail run (named,
        discoverable while the tail is live) and killed when the tail
        exits — no reservation leak into later pipelines."""
        import threading
        import time

        from opendataloader_pdf_ray.stages.extract_pool import _pool_names

        events = gen_events(120, 30, seed=32)
        seg_dir = str(tmp_path / "segs")
        _write_segments(events, seg_dir)
        cfg = CDCConfig(extract_mode="pool", **CFG_KW)
        root = str(tmp_path / "lake")
        names = _pool_names(cfg, root)

        t = threading.Thread(
            target=follow, args=(seg_dir, root, cfg),
            kwargs=dict(poll_interval=0.05, max_idle_polls=200),
            daemon=True)
        t.start()
        # while the tail is live, its named actors are discoverable
        seen = False
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline and not seen:
            try:
                ray.get_actor(names[0])
                seen = True
            except ValueError:
                time.sleep(0.05)
        assert seen, "pool actor never appeared during the tail run"
        open(os.path.join(seg_dir, ".end"), "w").close()
        t.join(timeout=120)
        assert not t.is_alive()
        # pool shut down with the tail
        deadline = time.monotonic() + 10
        while time.monotonic() < deadline:
            try:
                ray.get_actor(names[0])
                time.sleep(0.05)
            except ValueError:
                break
        with pytest.raises(ValueError):
            ray.get_actor(names[0])
        assert Lake(root).is_epoch_done(0)

    def test_router_without_pool_raises_helpfully(self, tmp_path):
        """Standalone ingest in pool mode without an owning tail or an
        ExtractPool context fails loudly with guidance, not a hang."""
        import pyarrow.parquet as pq

        events = gen_events(60, 20, seed=33)
        seg = str(tmp_path / "seg.parquet")
        pq.write_table(events, seg)
        cfg = CDCConfig(extract_mode="pool", **CFG_KW)
        lake = Lake(str(tmp_path / "lake"), cfg.num_partitions)
        with pytest.raises(Exception) as ei:
            ingest_epoch([seg], lake, 0, cfg)
        assert "extract_mode='pool'" in str(ei.value)

    def test_cli_follow_pool_with_pack_blocks(self, tmp_path):
        """CLI wiring: `ingest --mode follow --extract-mode pool
        --pack-blocks` produces the same lake as a plain tasks-mode CLI
        run (transit options never change lake bytes)."""
        from opendataloader_pdf_ray.__main__ import main

        events = gen_events(120, 30, seed=35)
        seg_dir = str(tmp_path / "segs")
        _write_segments(events, seg_dir)
        open(os.path.join(seg_dir, ".end"), "w").close()
        roots = {}
        for mode, extra in (("tasks", []),
                            ("pool", ["--pack-blocks"])):
            root = str(tmp_path / f"lake_cli_{mode}")
            rc = main(["ingest", seg_dir, root, "--mode", "follow",
                       "--epoch-size", "60", "--partitions", "4",
                       "--poll-interval", "0.05",
                       "--extract-mode", mode, *extra])
            assert rc == 0
            roots[mode] = root
        got = Lake(roots["pool"]).read_state(include_tombstones=True)
        want = Lake(roots["tasks"]).read_state(include_tombstones=True)
        assert got.equals(want)

    def test_explicit_pool_context_for_backlog(self, tmp_path):
        """Library users can own the pool via the ExtractPool context for
        backlog (non-tail) ingest."""
        import pyarrow.parquet as pq

        from opendataloader_pdf_ray.stages.extract_pool import ExtractPool

        events = gen_events(60, 20, seed=34)
        seg = str(tmp_path / "seg.parquet")
        pq.write_table(events, seg)
        cfg = CDCConfig(extract_mode="pool", **CFG_KW)
        root = str(tmp_path / "lake")
        lake = Lake(root, cfg.num_partitions)
        with ExtractPool(cfg) as pool:
            lineage = ingest_epoch([seg], lake, 0, cfg, pool=pool)
        assert lineage
        cfg2 = CDCConfig(extract_mode="tasks", **CFG_KW)
        lake2 = Lake(str(tmp_path / "lake2"), cfg2.num_partitions)
        ingest_epoch([seg], lake2, 0, cfg2)
        assert lake.read_state().equals(lake2.read_state())


@pytest.mark.usefixtures("ray_session")
class TestPoolWithLease:
    def test_cooperative_retention_under_pool_tail(self, tmp_path):
        """The persistent pool survives the lease pause/resume cycle: a
        live pool-mode tail grants cooperative retention mid-stream, then
        resumes through the SAME pool — final state equals the quiesced
        sequence, no fence errors, pool dead after the tail exits."""
        import threading
        import time

        import pyarrow as _pa

        from opendataloader_pdf_ray.cdc.retention import apply_retention

        events = gen_events(240, 40, seed=36)
        seg_dir = str(tmp_path / "segs")
        _write_segments(events, seg_dir, shard=30)
        # hold back the last half: write seqs [0,120) now
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        import shutil

        shutil.rmtree(seg_dir)
        os.makedirs(seg_dir)
        for s in range(0, 120, 30):
            chunk = events.filter((pc.field("seq") >= s)
                                  & (pc.field("seq") < s + 30))
            pq.write_table(chunk, f"{seg_dir}/seg-{s:06d}.parquet")

        cfg = CDCConfig(extract_mode="pool", epoch_size=60, **{
            k: v for k, v in CFG_KW.items() if k != "epoch_size"})
        root = str(tmp_path / "lake")
        errors = []

        def tail():
            try:
                follow(seg_dir, root, cfg, poll_interval=0.05,
                       max_idle_polls=600)
            except Exception as exc:  # pragma: no cover
                errors.append(exc)

        t = threading.Thread(target=tail, daemon=True)
        t.start()
        lake = None
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            try:
                lake = Lake(root)
                if lake.is_epoch_done(0) and lake.is_epoch_done(1):
                    break
            except Exception:
                pass
            time.sleep(0.05)
        assert lake is not None and lake.is_epoch_done(1)
        ts = sorted(lake.read_state()["warc_ts"].cast(
            _pa.int64()).to_pylist())
        cutoff = ts[len(ts) // 2] + 1
        lineage = apply_retention(lake, cutoff, cooperative=True,
                                  lease_timeout=30)
        assert lineage and all(l["epoch"] == 2 for l in lineage)
        # release the rest of the stream; tail resumes THROUGH the pool
        for s in range(120, 240, 30):
            chunk = events.filter((pc.field("seq") >= s)
                                  & (pc.field("seq") < s + 30))
            pq.write_table(chunk, f"{seg_dir}/seg-{s:06d}.parquet")
        open(os.path.join(seg_dir, ".end"), "w").close()
        t.join(timeout=120)
        assert not t.is_alive() and errors == []
        assert lake.is_epoch_done(3) and lake.is_epoch_done(4)
        assert lake.verify(deep=True)["ok"]

        # oracle: quiesced sequence in tasks mode
        from opendataloader_pdf_ray.cdc.ingest import ingest_epoch

        paths = sorted(f"{seg_dir}/{n}" for n in os.listdir(seg_dir)
                       if n.endswith(".parquet"))
        ocfg = CDCConfig(extract_mode="tasks", epoch_size=60, **{
            k: v for k, v in CFG_KW.items() if k != "epoch_size"})
        oracle = Lake(str(tmp_path / "oracle"), ocfg.num_partitions)
        for e in (0, 1):
            ingest_epoch(paths, oracle, e, ocfg)
            oracle.mark_epoch_done(e)
        apply_retention(oracle, cutoff, epoch=2)
        for e in (2, 3):
            ingest_epoch(paths, oracle, e, ocfg, commit_epoch=e + 1)
            oracle.mark_epoch_done(e + 1)
        got = lake.read_state(include_tombstones=True)
        want = oracle.read_state(include_tombstones=True)
        assert got.equals(want)
