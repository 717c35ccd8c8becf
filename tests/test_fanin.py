"""Fan-in tail (cdc/ingest.py follow_fanin): K binlog segment dirs merged
into one lake — aligned per-source seq bands, min-watermark completeness,
deterministic cross-source version order (seq*K + source_idx), persisted
source identity, straggler refusal, exactly-once resume."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from opendataloader_pdf_ray.cdc import Lake, oracle_final_state
from opendataloader_pdf_ray.cdc.ingest import follow_fanin
from opendataloader_pdf_ray.config import CDCConfig
from opendataloader_pdf_ray.fixtures.gen import gen_events, render_html

CFG = CDCConfig(num_partitions=4, num_salts=2, epoch_size=60,
                extract_batch_size=16, extract_concurrency=2)


def _write_segments(table, out_dir, lo, hi, shard=30):
    os.makedirs(out_dir, exist_ok=True)
    part = table.filter((pc.field("seq") >= lo) & (pc.field("seq") < hi))
    for s in range(lo, hi, shard):
        chunk = part.filter((pc.field("seq") >= s)
                            & (pc.field("seq") < s + shard))
        if chunk.num_rows:
            pq.write_table(chunk, f"{out_dir}/seg-{s:06d}.parquet")


def _stop(d):
    os.makedirs(d, exist_ok=True)
    open(os.path.join(d, ".end"), "w").close()


def _remap(table: pa.Table, k: int, idx: int) -> pa.Table:
    seq = pc.add(pc.multiply(table["seq"].cast(pa.int64()), k), idx)
    return table.set_column(table.column_names.index("seq"), "seq", seq)


def _union_oracle(tables):
    """oracle_final_state over the remapped union (sources in sorted-dir
    order)."""
    k = len(tables)
    remapped = [_remap(t, k, i) for i, t in enumerate(tables)]
    return oracle_final_state(pa.concat_tables(remapped))


def _assert_state(lake, oracle):
    got = {r["url"]: r for r in
           lake.read_state(include_tombstones=True).to_pylist()}
    assert set(got) == set(oracle)
    for url, want in oracle.items():
        assert got[url]["deleted"] == want["deleted"], url
        assert got[url]["text"] == want["text"], url
        assert got[url]["seq"] == want["seq"], url


@pytest.mark.usefixtures("ray_session")
class TestFanin:
    def test_two_source_merge_matches_union_oracle(self, tmp_path):
        a = gen_events(120, 30, seed=1)
        b = gen_events(90, 30, seed=2)
        da, db = str(tmp_path / "a"), str(tmp_path / "b")
        _write_segments(a, da, 0, 120)
        _write_segments(b, db, 0, 90)
        _stop(da)
        _stop(db)
        lake_root = str(tmp_path / "lake")
        lin = follow_fanin([da, db], lake_root, CFG, poll_interval=0.05)
        assert sum(l["events_consumed"] for l in lin) == 210
        lake = Lake(lake_root)
        assert lake.is_epoch_done(0) and lake.is_epoch_done(1)
        _assert_state(lake, _union_oracle([a, b]))

    def test_min_watermark_then_resume(self, tmp_path):
        """A stalled source stalls the merge (min-watermark); a restart
        after it catches up drains to the same state a one-shot run gives
        (exactly-once + determinism across poll timing)."""
        a = gen_events(120, 30, seed=3)
        b = gen_events(120, 30, seed=4)
        da, db = str(tmp_path / "a"), str(tmp_path / "b")
        _write_segments(a, da, 0, 120)       # a fully written
        _write_segments(b, db, 0, 60)        # b has only epoch 0
        lake_root = str(tmp_path / "lake")
        follow_fanin([da, db], lake_root, CFG, poll_interval=0.05,
                     max_idle_polls=2)
        lake = Lake(lake_root)
        assert lake.is_epoch_done(0) and not lake.is_epoch_done(1)
        # b catches up; both stop — the resumed tail drains the rest
        _write_segments(b, db, 60, 120)
        _stop(da)
        _stop(db)
        follow_fanin([da, db], lake_root, CFG, poll_interval=0.05)
        assert lake.is_epoch_done(1)
        _assert_state(lake, _union_oracle([a, b]))
        # one-shot reference lake over the same sources
        ref_root = str(tmp_path / "ref")
        follow_fanin([da, db], ref_root, CFG, poll_interval=0.05)
        ref = Lake(ref_root)
        assert lake.read_state(include_tombstones=True).to_pylist() == \
            ref.read_state(include_tombstones=True).to_pylist()

    def test_cross_source_tie_resolves_by_source_index(self, tmp_path):
        """Same url, same warc_ts, same source-local seq in both sources:
        the sorted-dir-order LATER source wins (seq*K + idx)."""
        def one(url, text_rev, ts):
            return pa.table({
                "seq": pa.array([0], pa.int64()),
                "op": pa.array(["I"], pa.string()),
                "url": pa.array([url], pa.string()),
                "warc_ts": pa.array([ts], pa.int64()).cast(
                    pa.timestamp("us")),
                "html": pa.array([render_html(url, text_rev)], pa.binary()),
                "lang": pa.array(["en"], pa.string()),
            })

        da, db = str(tmp_path / "a"), str(tmp_path / "b")
        ta = one("https://t.example/x", 1, 1000)
        tb = one("https://t.example/x", 2, 1000)
        os.makedirs(da), os.makedirs(db)
        pq.write_table(ta, f"{da}/seg-0.parquet")
        pq.write_table(tb, f"{db}/seg-0.parquet")
        _stop(da)
        _stop(db)
        lake_root = str(tmp_path / "lake")
        follow_fanin([da, db], lake_root, CFG, poll_interval=0.05)
        lake = Lake(lake_root)
        _assert_state(lake, _union_oracle([ta, tb]))
        row = lake.read_state().to_pylist()[0]
        assert row["seq"] == 1  # 0*2 + source idx 1: source b won the tie

    def test_source_list_change_refused(self, tmp_path):
        a = gen_events(60, 20, seed=5)
        da, db = str(tmp_path / "a"), str(tmp_path / "b")
        _write_segments(a, da, 0, 60)
        _write_segments(a, db, 0, 60)
        _stop(da)
        _stop(db)
        lake_root = str(tmp_path / "lake")
        follow_fanin([da, db], lake_root, CFG, poll_interval=0.05)
        with pytest.raises(ValueError, match="source-list-dependent"):
            follow_fanin([da], lake_root, CFG, poll_interval=0.05)

    def test_empty_stopped_source_is_fine(self, tmp_path):
        a = gen_events(60, 20, seed=6)
        da, db = str(tmp_path / "a"), str(tmp_path / "empty")
        _write_segments(a, da, 0, 60)
        _stop(da)
        _stop(db)  # stopped source that never produced a segment
        lake_root = str(tmp_path / "lake")
        lin = follow_fanin([da, db], lake_root, CFG, poll_interval=0.05)
        assert sum(l["events_consumed"] for l in lin) == 60
        # K=2 even though one source is empty ("a" sorts before "empty")
        _assert_state(Lake(lake_root), oracle_final_state(_remap(a, 2, 0)))

    def test_straggler_hole_raises_on_stop(self, tmp_path):
        a = gen_events(120, 30, seed=7)
        da, db = str(tmp_path / "a"), str(tmp_path / "b")
        _write_segments(a, da, 0, 120)
        # b: segment 0..30 and 60..90 present, 30..60 missing — a hole
        _write_segments(a, db, 0, 30)
        _write_segments(a, db, 60, 90)
        _stop(da)
        _stop(db)
        with pytest.raises(RuntimeError, match="non-dense"):
            follow_fanin([da, db], str(tmp_path / "lake"), CFG,
                         poll_interval=0.05, max_idle_polls=2)


@pytest.mark.usefixtures("ray_session")
class TestFaninLease:
    def test_cooperative_retention_under_fanin_tail(self, tmp_path):
        """The cooperative maintenance lease works on fan-in tails too:
        merged-epoch numbering shifts past the granted epoch, final state
        equals the quiesced sequence, no fence exception."""
        from opendataloader_pdf_ray.cdc.lease import (read_offsets,
                                                      request_lease)
        from opendataloader_pdf_ray.cdc.retention import apply_retention

        ev_a = gen_events(120, 30, seed=41)
        ev_b = gen_events(120, 30, seed=42)
        da, db = str(tmp_path / "a"), str(tmp_path / "b")
        _write_segments(ev_a, da, 0, 60)
        _write_segments(ev_b, db, 0, 60)
        lake_root = str(tmp_path / "lake")
        follow_fanin([da, db], lake_root, CFG, poll_interval=0.05,
                     max_idle_polls=2)
        lake = Lake(lake_root)
        assert lake.is_epoch_done(0)

        ts = sorted(lake.read_state()["warc_ts"].cast(pa.int64())
                    .to_pylist())
        cutoff = ts[len(ts) // 2] + 1
        request_lease(lake, f"retention:{cutoff}")
        # the fanin tail services the request: grants merged epoch 1
        follow_fanin([da, db], lake_root, CFG, poll_interval=0.05,
                     max_idle_polls=2)
        assert read_offsets(lake) == [(1, 1)]
        lineage = apply_retention(lake, cutoff, cooperative=True,
                                  lease_timeout=5)
        assert lineage and all(l["epoch"] == 1 for l in lineage)

        # second merged binlog epoch lands at lake epoch 2
        _write_segments(ev_a, da, 60, 120)
        _write_segments(ev_b, db, 60, 120)
        _stop(da)
        _stop(db)
        follow_fanin([da, db], lake_root, CFG, poll_interval=0.05)
        assert lake.is_epoch_done(2)
        assert lake.verify(deep=True)["ok"]
        # sequential oracle: quiesced fanin epoch 0 → retention(1) →
        # fanin epoch 1 at lake epoch 2 — replicate via a second run
        da2, db2 = str(tmp_path / "a2"), str(tmp_path / "b2")
        _write_segments(ev_a, da2, 0, 60)
        _write_segments(ev_b, db2, 0, 60)
        oracle_root = str(tmp_path / "oracle")
        follow_fanin([da2, db2], oracle_root, CFG, poll_interval=0.05,
                     max_idle_polls=2)
        oracle = Lake(oracle_root)
        apply_retention(oracle, cutoff, epoch=1)
        from opendataloader_pdf_ray.cdc.lease import repair_offsets

        repair_offsets(oracle, [],
                       {"from_binlog": 1, "offset": 1, "id": "x"})
        _write_segments(ev_a, da2, 60, 120)
        _write_segments(ev_b, db2, 60, 120)
        _stop(da2)
        _stop(db2)
        follow_fanin([da2, db2], oracle_root, CFG, poll_interval=0.05)
        got = lake.read_state(include_tombstones=True)
        want = oracle.read_state(include_tombstones=True)
        assert got.equals(want)


@pytest.mark.usefixtures("ray_session")
class TestFaninPoolMode:
    def test_pool_extract_matches_tasks(self, tmp_path):
        """follow_fanin owns the persistent pool exactly like follow:
        pool-mode merge state == tasks-mode merge state (and the pool
        dies with the tail — no reservation leak)."""
        import dataclasses

        import ray as _ray

        from opendataloader_pdf_ray.stages.extract_pool import _pool_names

        a = gen_events(120, 30, seed=61)
        b = gen_events(90, 30, seed=62)
        da, db = str(tmp_path / "a"), str(tmp_path / "b")
        _write_segments(a, da, 0, 120)
        _write_segments(b, db, 0, 90)
        _stop(da)
        _stop(db)
        lakes = {}
        for mode in ("tasks", "pool"):
            cfg = dataclasses.replace(CFG, extract_mode=mode,
                                      extract_num_cpus=0.5)
            root = str(tmp_path / f"lake_{mode}")
            follow_fanin([da, db], root, cfg, poll_interval=0.05)
            lakes[mode] = Lake(root)
            if mode == "pool":
                name = _pool_names(cfg, root)[0]
                with pytest.raises(ValueError):
                    _ray.get_actor(name)  # shut down with the tail
        got = lakes["pool"].read_state(include_tombstones=True)
        want = lakes["tasks"].read_state(include_tombstones=True)
        assert got.equals(want)
