"""Delta-commit lake tests: merge-on-read equivalence, time travel,
compaction, vacuum safety, idempotence, mixed snapshot/delta history."""

import dataclasses

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


class TestColumnPruning:
    @pytest.mark.usefixtures("ray_session")
    def test_projected_read_equals_full_projection(self, tmp_path_factory):
        """read_partition/read_dataset(columns=...) never decode the wide
        columns but fold to the same rows; a column added mid-stream is
        null-backfilled in the projected read too."""
        import pyarrow as pa

        from opendataloader_pdf_ray.cdc import Lake, Lineage

        tmp = tmp_path_factory.mktemp("prune")
        lk = Lake(str(tmp / "lake"), 1)
        t0 = pa.table({"url": ["a", "b"],
                       "warc_ts": pa.array([1, 1], pa.int64()),
                       "seq": pa.array([0, 1], pa.int64()),
                       "deleted": [False, False],
                       "text": ["xxx", "yyy"]})
        t1 = pa.table({"url": ["b"], "warc_ts": pa.array([2], pa.int64()),
                       "seq": pa.array([2], pa.int64()), "deleted": [False],
                       "text": ["zzz"], "lang": ["en"]})
        lin = lambda e: Lineage(part=0, epoch=e, events_consumed=1,
                                rows_upserted=1, rows_deleted=0,
                                seq_min=0, seq_max=0)
        lk.commit_delta(0, 0, t0, lin(0))
        lk.commit_delta(0, 1, t1, lin(1))
        full = lk.read_partition(0)
        pruned = lk.read_partition(0, columns=["lang"])
        assert "text" not in pruned.column_names  # wide column not decoded
        assert pruned["url"].to_pylist() == full["url"].to_pylist()
        assert pruned["lang"].to_pylist() == full["lang"].to_pylist()
        assert pruned["seq"].to_pylist() == full["seq"].to_pylist()
        ds = lk.read_dataset(columns=["lang"])
        got = pa.concat_tables(
            [b for b in ds.iter_batches(batch_format="pyarrow")
             if b.num_rows]).sort_by([("url", "ascending")])
        assert sorted(got.column_names) == sorted(
            ["url", "warc_ts", "seq", "deleted", "lang"])
        assert got["lang"].to_pylist() == [None, "en"]


class TestAutoCompact:
    @pytest.mark.usefixtures("ray_session")
    def test_chain_bounded_state_and_history_intact(self, tmp_path_factory):
        """auto_compact_chain=1: after an epoch-mode delta replay, no
        partition's chain exceeds 1, the final state matches the oracle,
        and time travel still works (compact adds snapshots, removes
        nothing)."""
        from opendataloader_pdf_ray.cdc import Lake, oracle_final_state, replay
        from opendataloader_pdf_ray.config import CDCConfig
        from opendataloader_pdf_ray.fixtures.gen import gen_events

        tmp = tmp_path_factory.mktemp("autocompact")
        events = gen_events(180, 40, seed=42)
        path = str(tmp / "events.parquet")
        pq.write_table(events, path)
        cfg = CDCConfig(num_partitions=4, num_salts=2, epoch_size=60,
                        extract_batch_size=16, extract_concurrency=2,
                        epoch_commits="delta", auto_compact_chain=1)
        lake_root = str(tmp / "lake")
        replay(path, lake_root, cfg, mode="epoch")
        lake = Lake(lake_root, None)
        assert max(lake.delta_chains().values()) <= 1
        # at least one partition got re-materialized mid-tail
        assert any(
            lake.fs.exists(lake._data_path(p, e))
            for p in range(4) for e in lake.committed_epochs(p))
        _assert_oracle(lake, events)
        # history intact: an as-of read below the tip still resolves
        for p in range(4):
            es = lake.committed_epochs(p)
            if len(es) > 1:
                assert lake.read_partition(p, as_of=es[0]) is not None
        assert lake.verify(deep=True)["ok"]

from opendataloader_pdf_ray.cdc import Lake, oracle_final_state
from opendataloader_pdf_ray.cdc.ingest import ingest_epoch
from opendataloader_pdf_ray.config import CDCConfig
from opendataloader_pdf_ray.fixtures.gen import gen_events

CFG = CDCConfig(num_partitions=4, num_salts=2, epoch_size=60,
                extract_batch_size=16, extract_concurrency=2,
                epoch_commits="delta")
N_EPOCHS = 3  # 180 events / 60


@pytest.fixture(scope="module")
def events_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("delta") / "events.parquet")
    pq.write_table(gen_events(180, 40, seed=42), path)
    return path


def _events(events_path):
    return pq.read_table(events_path)


def _assert_oracle(lake, events):
    oracle = oracle_final_state(events)
    got = {r["url"]: r for r in
           lake.read_state(include_tombstones=True).to_pylist()}
    assert set(got) == set(oracle)
    for url, want in oracle.items():
        assert got[url]["deleted"] == want["deleted"], url
        assert got[url]["text"] == want["text"], url
        assert got[url]["seq"] == want["seq"], url


@pytest.mark.usefixtures("ray_session")
class TestDeltaCommits:
    def test_delta_replay_matches_oracle(self, events_path, tmp_path):
        lake = Lake(str(tmp_path / "lake"), CFG.num_partitions)
        for e in range(N_EPOCHS):
            ingest_epoch(events_path, lake, e, CFG)
        # every commit after epoch 0 is a delta file, no snapshot rewrite
        for part in range(CFG.num_partitions):
            for e in lake.committed_epochs(part):
                assert lake.read_lineage(part, e).kind == "delta"
                assert lake.fs.exists(lake._delta_path(part, e))
                assert not lake.fs.exists(lake._data_path(part, e))
        _assert_oracle(lake, _events(events_path))

    def test_time_travel_as_of(self, events_path, tmp_path):
        lake = Lake(str(tmp_path / "lake"), CFG.num_partitions)
        for e in range(N_EPOCHS):
            ingest_epoch(events_path, lake, e, CFG)
        events = _events(events_path)
        upto = events.filter(pa.compute.less(events["seq"],
                                             pa.scalar(2 * CFG.epoch_size)))
        oracle = oracle_final_state(upto)
        got = {r["url"]: r for r in
               lake.read_state(as_of=1, include_tombstones=True).to_pylist()}
        assert set(got) == set(oracle)
        for url, want in oracle.items():
            assert got[url]["text"] == want["text"], url

    def test_idempotent_recommit(self, events_path, tmp_path):
        lake = Lake(str(tmp_path / "lake"), CFG.num_partitions)
        ingest_epoch(events_path, lake, 0, CFG)
        again = ingest_epoch(events_path, lake, 0, CFG)
        assert all(l["skipped"] for l in again)
        _assert_oracle(lake, _events(events_path).filter(
            pa.compute.less(_events(events_path)["seq"],
                            pa.scalar(CFG.epoch_size))))

    def test_compact_then_vacuum_preserves_state(self, events_path, tmp_path):
        lake = Lake(str(tmp_path / "lake"), CFG.num_partitions)
        for e in range(N_EPOCHS):
            ingest_epoch(events_path, lake, e, CFG)
        with pytest.raises(ValueError, match="compact"):
            lake.partition_files()
        before = lake.read_state(include_tombstones=True)
        n = lake.compact()
        assert n > 0
        assert lake.compact() == 0  # idempotent
        files = lake.partition_files()  # snapshot reads now legal
        assert files
        assert lake.read_state(include_tombstones=True).equals(before)
        removed = lake.vacuum()
        assert removed > 0  # folded deltas reclaimed
        assert lake.read_state(include_tombstones=True).equals(before)
        _assert_oracle(lake, _events(events_path))

    def test_vacuum_never_removes_live_deltas(self, events_path, tmp_path):
        lake = Lake(str(tmp_path / "lake"), CFG.num_partitions)
        for e in range(N_EPOCHS):
            ingest_epoch(events_path, lake, e, CFG)
        before = lake.read_state(include_tombstones=True)
        # no snapshot exists anywhere -> vacuum must remove nothing
        assert lake.vacuum() == 0
        assert lake.read_state(include_tombstones=True).equals(before)

    def test_mixed_snapshot_then_delta_history(self, events_path, tmp_path):
        lake = Lake(str(tmp_path / "lake"), CFG.num_partitions)
        snap_cfg = dataclasses.replace(CFG, epoch_commits="snapshot")
        ingest_epoch(events_path, lake, 0, snap_cfg)     # CoW snapshot base
        for e in range(1, N_EPOCHS):
            ingest_epoch(events_path, lake, e, CFG)      # delta tail
        _assert_oracle(lake, _events(events_path))
        # compaction folds the tail onto the epoch-0 base
        lake.compact()
        lake.vacuum()
        _assert_oracle(lake, _events(events_path))


@pytest.mark.usefixtures("ray_session")
class TestFsck:
    """Lake.verify() — commit-log / data-file consistency audit."""

    def _lake(self, events_path, tmp_path, n_epochs=N_EPOCHS):
        lake = Lake(str(tmp_path / "lake"), CFG.num_partitions)
        for e in range(n_epochs):
            ingest_epoch(events_path, lake, e, CFG)
        return lake

    def test_healthy_lake_all_modes(self, events_path, tmp_path):
        lake = self._lake(events_path, tmp_path)
        # delta-only partitions are readable (merge-on-read from empty base)
        assert lake.verify()["ok"]
        lake.compact()
        lake.vacuum()
        rep = lake.verify(deep=True)
        assert rep["ok"], rep["issues"]
        assert rep["commits"] > 0 and not rep["orphans"]

    def test_missing_delta_detected(self, events_path, tmp_path):
        """Data loss: one delta of a multi-epoch partition vanishes — the
        partition's state silently reverts that epoch unless fsck flags it."""
        lake = self._lake(events_path, tmp_path)
        part, epoch = next(
            (p, es[-1]) for p in range(CFG.num_partitions)
            if len(es := lake.committed_epochs(p)) >= 2
            and lake.fs.exists(lake._delta_path(p, es[-1])))
        lake.fs.rm_file(lake._delta_path(part, epoch))
        rep = lake.verify()
        assert not rep["ok"]
        assert any("delta file missing" in i for i in rep["issues"])

    def test_orphan_reported_benign(self, events_path, tmp_path):
        lake = self._lake(events_path, tmp_path)
        lake.compact()
        # crash leftover: data file with no commit record
        orphan = lake._data_path(0, 999)
        with lake.fs.open(orphan, "wb") as f:
            f.write(b"not parquet")
        rep = lake.verify()
        assert rep["ok"]  # orphans don't fail the audit
        assert any("999" in o for o in rep["orphans"])

    def test_deep_catches_corrupt_snapshot(self, events_path, tmp_path):
        lake = self._lake(events_path, tmp_path)
        lake.compact()
        lake.vacuum()
        part = next(p for p in range(CFG.num_partitions)
                    if lake.committed_epochs(p))
        snap = max(e for e in lake.committed_epochs(part)
                   if lake.fs.exists(lake._data_path(part, e)))
        with lake.fs.open(lake._data_path(part, snap), "wb") as f:
            f.write(b"garbage")
        rep = lake.verify(deep=True)
        assert not rep["ok"]
        assert any("unreadable" in i for i in rep["issues"])


@pytest.mark.usefixtures("ray_session")
class TestLakeMetadata:
    """ADVICE r2: num_partitions persists in lake metadata at creation and
    wins over CLI defaults, so compact/fsck/view never audit a prefix of
    the lake; compact snapshots publish atomically (temp + rename)."""

    def test_partitions_persisted_and_authoritative(self, events_path,
                                                    tmp_path, capfd):
        root = str(tmp_path / "lake")
        lake = Lake(root, CFG.num_partitions)
        ingest_epoch(events_path, lake, 0, CFG)
        # reopen without a count: metadata decides
        assert Lake(root).num_partitions == CFG.num_partitions
        # reopen with a WRONG count: metadata wins, caller is warned
        reopened = Lake(root, 32)
        assert reopened.num_partitions == CFG.num_partitions
        assert "lake metadata says" in capfd.readouterr().err
        # fsck over the reopened lake audits every partition
        assert reopened.verify(deep=True)["ok"]

    def test_pre_metadata_lake_derives_from_part_dirs(self, events_path,
                                                      tmp_path):
        import os

        root = str(tmp_path / "lake")
        lake = Lake(root, CFG.num_partitions)
        ingest_epoch(events_path, lake, 0, CFG)
        os.remove(os.path.join(root, "_commits", "lake.json"))
        assert Lake(root).num_partitions == CFG.num_partitions

    def test_open_missing_lake_without_partitions_raises(self, tmp_path):
        with pytest.raises(ValueError, match="no metadata"):
            Lake(str(tmp_path / "nothing"))

    def test_compact_atomic_and_vacuum_sweeps_tmp(self, events_path,
                                                  tmp_path):
        import os

        root = str(tmp_path / "lake")
        lake = Lake(root, CFG.num_partitions)
        for e in range(N_EPOCHS):
            ingest_epoch(events_path, lake, e, CFG)
        before = lake.read_state(include_tombstones=True)
        lake.compact()
        # no staging residue after a clean compact
        for part in range(CFG.num_partitions):
            d = os.path.join(root, f"part={part:04d}")
            assert not [f for f in os.listdir(d) if ".tmp-" in f]
        # a crashed writer's stale staging file is invisible to readers and
        # reclaimed by vacuum
        stale = os.path.join(root, "part=0000",
                             "epoch=000099.parquet.tmp-dead")
        with open(stale, "wb") as f:
            f.write(b"partial parquet bytes")
        assert lake.read_state(include_tombstones=True).equals(before)
        assert lake.verify(deep=True)["ok"]
        lake.vacuum()
        assert not os.path.exists(stale)
        assert lake.read_state(include_tombstones=True).equals(before)


@pytest.mark.usefixtures("ray_session")
class TestReadDataset:
    """Distributed merge-on-read: Lake.read_dataset streams one fold task
    per partition and must equal the driver-side read_state on delta-mode
    (un-compacted) lakes, at any as_of, both tombstone modes."""

    def _lake(self, events_path, tmp_path):
        lake = Lake(str(tmp_path / "lake"), CFG.num_partitions)
        for e in range(N_EPOCHS):
            ingest_epoch(events_path, lake, e, CFG)
        return lake

    @staticmethod
    def _canon(t):
        if hasattr(t, "iter_batches"):  # Dataset → arrow (Ray's to_pandas
            # mangles the blocks list<struct> column via TensorArray)
            batches = list(t.iter_batches(batch_format="pyarrow",
                                          batch_size=None))
            t = pa.concat_tables(batches) if batches else pa.table({})
        df = t.to_pandas()
        return df.sort_values("url").reset_index(drop=True)[sorted(df.columns)]

    def test_equals_read_state_uncompacted(self, events_path, tmp_path):
        import pandas as pd

        lake = self._lake(events_path, tmp_path)
        with pytest.raises(ValueError, match="compact"):
            lake.partition_files()  # delta-only: snapshot path refuses
        for tomb in (False, True):
            want = self._canon(lake.read_state(include_tombstones=tomb))
            got = self._canon(
                lake.read_dataset(include_tombstones=tomb))
            pd.testing.assert_frame_equal(got, want)

    def test_as_of_time_travel(self, events_path, tmp_path):
        import pandas as pd

        lake = self._lake(events_path, tmp_path)
        want = self._canon(lake.read_state(as_of=1, include_tombstones=True))
        got = self._canon(
            lake.read_dataset(as_of=1, include_tombstones=True))
        pd.testing.assert_frame_equal(got, want)

    def test_empty_lake(self, tmp_path):
        lake = Lake(str(tmp_path / "lake"), CFG.num_partitions)
        assert lake.read_dataset().take_all() == []
