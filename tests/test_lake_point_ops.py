"""Point ops on the lake: hash-routed lookup and right-to-be-forgotten
purge (cdc/lake.py), plus their CLI surfaces."""

import json

import pyarrow.parquet as pq
import pytest

from opendataloader_pdf_ray.__main__ import main
from opendataloader_pdf_ray.cdc import Lake, oracle_final_state, replay
from opendataloader_pdf_ray.config import CDCConfig
from opendataloader_pdf_ray.fixtures.gen import gen_events

CFG = CDCConfig(num_partitions=4, num_salts=2, epoch_size=60,
                extract_batch_size=16, extract_concurrency=2)


@pytest.fixture(scope="module")
def built(tmp_path_factory, ray_session):
    base = tmp_path_factory.mktemp("pointops")
    events_path = str(base / "events.parquet")
    events = gen_events(180, 40, seed=42)
    pq.write_table(events, events_path)
    lake_root = str(base / "lake")
    replay(events_path, lake_root, CFG)
    return lake_root, oracle_final_state(events)


class TestLookup:
    def test_latest_row_per_url(self, built):
        lake_root, oracle = built
        lake = Lake(lake_root)
        live = {u: r for u, r in oracle.items() if not r["deleted"]}
        probe = sorted(live)[:5]
        t = lake.lookup(probe)
        assert t["url"].to_pylist() == probe
        for row in t.to_pylist():
            assert row["seq"] == live[row["url"]]["seq"]
            assert row["text"] == live[row["url"]]["text"]

    def test_tombstones_and_missing(self, built):
        lake_root, oracle = built
        lake = Lake(lake_root)
        dead = [u for u, r in oracle.items() if r["deleted"]]
        assert dead, "fixture should contain deletes"
        assert lake.lookup([dead[0]]) is None
        t = lake.lookup([dead[0]], include_tombstones=True)
        assert t.num_rows == 1 and t["deleted"][0].as_py() is True
        assert lake.lookup(["https://never.example/x"]) is None

    def test_as_of_time_travel(self, built):
        lake_root, _ = built
        lake = Lake(lake_root)
        full = lake.read_state(include_tombstones=True)
        url = full["url"][0].as_py()
        # at epoch 0 the row either doesn't exist yet or has an older seq
        t0 = lake.lookup([url], as_of=0, include_tombstones=True)
        if t0 is not None:
            assert t0["seq"][0].as_py() <= full["seq"][0].as_py()

    def test_cli_get(self, built, capsys):
        lake_root, oracle = built
        url = sorted(u for u, r in oracle.items() if not r["deleted"])[0]
        assert main(["get", lake_root, url]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["found"] == 1 and rep["rows"][0]["url"] == url


class TestPurge:
    @pytest.fixture()
    def fresh(self, tmp_path, ray_session):
        events_path = str(tmp_path / "events.parquet")
        events = gen_events(180, 40, seed=42)
        pq.write_table(events, events_path)
        lake_root = str(tmp_path / "lake")
        replay(events_path, lake_root, CFG, mode="epoch")
        return lake_root, oracle_final_state(events)

    def test_purge_erases_all_history(self, fresh):
        lake_root, oracle = fresh
        lake = Lake(lake_root)
        live = sorted(u for u, r in oracle.items() if not r["deleted"])
        dead = [u for u, r in oracle.items() if r["deleted"]]
        victims = [live[0], dead[0]]
        audit = lake.purge(victims)
        assert audit["rows_removed"] >= 2 and audit["files_rewritten"] >= 1
        # no urls in the audit record, only hashes
        assert not any(v in json.dumps(audit) for v in victims)
        # gone at the tip AND at every as_of
        assert lake.lookup(victims, include_tombstones=True) is None
        for as_of in (0, 1, 2):
            t = lake.lookup(victims, as_of=as_of, include_tombstones=True)
            assert t is None
        # everything else intact
        state = lake.read_state(include_tombstones=True)
        assert set(state["url"].to_pylist()) == set(oracle) - set(victims)
        for row in state.to_pylist():
            assert row["text"] == oracle[row["url"]]["text"]
        # lake still healthy
        assert lake.verify(deep=True)["ok"]

    def test_purge_idempotent(self, fresh):
        lake_root, oracle = fresh
        lake = Lake(lake_root)
        victim = sorted(oracle)[0]
        lake.purge([victim])
        again = lake.purge([victim])
        assert again["rows_removed"] == 0 and again["files_rewritten"] == 0

    def test_purge_delta_mode_lake(self, tmp_path, ray_session):
        events_path = str(tmp_path / "events.parquet")
        events = gen_events(120, 30, seed=7)
        pq.write_table(events, events_path)
        lake_root = str(tmp_path / "lake")
        cfg = CDCConfig(num_partitions=4, num_salts=2, epoch_size=60,
                        extract_batch_size=16, extract_concurrency=2,
                        epoch_commits="delta")
        replay(events_path, lake_root, cfg, mode="epoch")
        lake = Lake(lake_root)
        oracle = oracle_final_state(events)
        victim = sorted(u for u, r in oracle.items() if not r["deleted"])[0]
        lake.purge([victim])
        # merge-on-read (delta chain) no longer yields the victim
        assert lake.lookup([victim], include_tombstones=True) is None
        state = lake.read_state(include_tombstones=True)
        assert victim not in state["url"].to_pylist()
        assert lake.verify()["ok"]

    def test_cli_purge(self, fresh, capsys):
        lake_root, oracle = fresh
        victim = sorted(oracle)[0]
        assert main(["purge", lake_root, victim]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["rows_removed"] >= 1
        assert main(["get", lake_root, victim, "--tombstones"]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["found"] == 0


class TestIndexPurge:
    def test_purge_scrubs_fpindex_owner_records(self, tmp_path, capsys,
                                                ray_session):
        """CLI purge on a --dup-index lake also erases the victims' owner
        rows from <lake>/fpindex (the index stores urls)."""
        import pyarrow as pa

        from opendataloader_pdf_ray.cdc import DupIndex, dup_index_root

        html = b"<html><body><p>owner content</p></body></html>"
        n = 9
        events = pa.table({
            "seq": pa.array(list(range(n)), pa.int64()),
            "op": pa.array(["I"] * n, pa.string()),
            "url": pa.array([f"https://p.x/{i}" for i in range(n)],
                            pa.string()),
            "warc_ts": pa.array([1_700_000_000_000_000 + i * 1_000_000
                                 for i in range(n)], pa.timestamp("us")),
            "html": pa.array([html if i % 3 == 0 else
                              b"<p>body %d</p>" % i for i in range(n)],
                             pa.binary()),
            "lang": pa.array(["en"] * n, pa.string()),
        })
        events_path = tmp_path / "events.parquet"
        pq.write_table(events, str(events_path))
        lake_root = str(tmp_path / "lake")
        assert main(["ingest", str(events_path), lake_root, "--epoch-size",
                     "5", "--partitions", "4", "--mode", "epoch",
                     "--dup-index"]) == 0
        capsys.readouterr()

        victim = "https://p.x/0"  # owner of the shared-content fingerprint
        assert main(["purge", lake_root, victim]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["fpindex"]["rows_removed"] >= 1
        assert victim not in json.dumps(rep)  # hashes only
        idx = DupIndex(dup_index_root(lake_root))
        state = idx.read_state()
        assert victim not in state["url"].to_pylist()
        # idempotent
        assert idx.purge_keys([victim])["rows_removed"] == 0
        # dups after purge: urls 3,6 no longer attribute to the purged owner
        assert main(["dups", lake_root]) == 0
        rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep2["dup_rows"] == 0

    def test_purge_without_index_has_no_fpindex_key(self, tmp_path, capsys,
                                                    ray_session):
        events_path = str(tmp_path / "events.parquet")
        pq.write_table(gen_events(60, 20, seed=5), events_path)
        lake_root = str(tmp_path / "lake")
        assert main(["ingest", events_path, lake_root, "--epoch-size", "60",
                     "--partitions", "4", "--mode", "epoch"]) == 0
        capsys.readouterr()
        url = gen_events(60, 20, seed=5)["url"][0].as_py()
        assert main(["purge", lake_root, url]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert "fpindex" not in rep
        import os

        assert not os.path.exists(os.path.join(lake_root, "fpindex"))
