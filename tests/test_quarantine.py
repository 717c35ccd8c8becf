"""Dead-letter queue (cdc/quarantine.py + HtmlExtractor quarantine mode):
poison payloads divert to the DLQ, the lake keeps previous good state, DLQ
commits are exactly-once, and without quarantine mode the failure is loud."""

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from opendataloader_pdf_ray.cdc import Lake, replay
from opendataloader_pdf_ray.cdc.quarantine import QuarantineStore, quarantine_root
from opendataloader_pdf_ray.config import CDCConfig
from opendataloader_pdf_ray.fixtures.gen import gen_events

POISON = (("<div>" * 4000) + "bomb" + ("</div>" * 4000)).encode()


def _events_with_poison(tmp_path, poison_seqs, n=120, n_urls=30):
    """gen_events stream with the given seqs' html replaced by a payload
    that RecursionErrors the extractor."""
    t = gen_events(n, n_urls, seed=42)
    html = t["html"].to_pylist()
    seqs = t["seq"].to_pylist()
    for i, s in enumerate(seqs):
        if s in poison_seqs:
            html[i] = POISON
    t = t.set_column(t.column_names.index("html"), "html",
                     pa.array(html, pa.binary()))
    path = str(tmp_path / "events.parquet")
    pq.write_table(t, path)
    return path, t


CFG = CDCConfig(num_partitions=4, num_salts=2, epoch_size=60,
                extract_batch_size=16, extract_concurrency=2,
                quarantine_errors=True)


@pytest.mark.usefixtures("ray_session")
class TestQuarantine:
    def test_poison_diverts_lake_keeps_good_state(self, tmp_path):
        # poison seq 70: an UPDATE in epoch 1 — the lake must keep the url's
        # epoch-0 version, and the DLQ must hold exactly the poison records
        path, events = _events_with_poison(tmp_path, {70, 71})
        lake_root = str(tmp_path / "lake")
        replay(path, lake_root, CFG, mode="epoch")
        lake = Lake(lake_root, CFG.num_partitions)
        store = QuarantineStore(quarantine_root(lake_root),
                                CFG.num_partitions)
        dlq = store.read()
        assert dlq is not None and dlq.num_rows == 2
        assert sorted(dlq["seq"].to_pylist()) == [70, 71]
        assert all("RecursionError" in e
                   for e in dlq["extract_error"].to_pylist())
        # final state: equivalent to the poison events never existing
        clean = events.filter(pc.invert(pc.is_in(
            events["seq"], value_set=pa.array([70, 71]))))
        from opendataloader_pdf_ray.cdc import oracle_final_state

        oracle = oracle_final_state(clean)
        got = {r["url"]: r for r in
               lake.read_state(include_tombstones=True).to_pylist()}
        assert set(got) == set(oracle)
        for url, want in oracle.items():
            assert got[url]["text"] == want["text"], url
            assert got[url]["seq"] == want["seq"], url

    def test_chunking_invariance(self, tmp_path):
        """Backlog replay and per-epoch replay produce byte-identical lake
        state AND identical DLQ records when poison is present."""
        path, _ = _events_with_poison(tmp_path, {5, 70, 115})
        roots = {}
        for mode in ("epoch", "backlog"):
            root = str(tmp_path / mode)
            replay(path, root, CFG, mode=mode)
            lake = Lake(root, CFG.num_partitions)
            state = lake.read_state(include_tombstones=True)
            dlq = QuarantineStore(quarantine_root(root),
                                  CFG.num_partitions).read()
            roots[mode] = (state, dlq)
        s_e, d_e = roots["epoch"]
        s_b, d_b = roots["backlog"]
        assert s_e.equals(s_b)
        for col in ("url", "seq", "extract_error"):
            assert d_e[col].to_pylist() == d_b[col].to_pylist()

    def test_dlq_commits_idempotent_on_replay(self, tmp_path):
        path, _ = _events_with_poison(tmp_path, {70})
        lake_root = str(tmp_path / "lake")
        replay(path, lake_root, CFG, mode="epoch")
        store = QuarantineStore(quarantine_root(lake_root),
                                CFG.num_partitions)
        before = store.read()
        # wipe the done markers to force a full re-run; per-(part, epoch)
        # commits must then no-op, never duplicate DLQ rows
        lake = Lake(lake_root, CFG.num_partitions)
        for e in range(2):
            lake.fs.rm_file(lake.epoch_done_path(e))
        replay(path, lake_root, CFG, mode="epoch")
        after = store.read()
        assert before.equals(after)

    def test_read_dataset_streams_same_rows(self, tmp_path):
        path, _ = _events_with_poison(tmp_path, {5, 70})
        lake_root = str(tmp_path / "lake")
        replay(path, lake_root, CFG, mode="epoch")
        store = QuarantineStore(quarantine_root(lake_root),
                                CFG.num_partitions)
        streamed = pa.concat_tables([
            b for b in store.read_dataset().iter_batches(
                batch_format="pyarrow") if b.num_rows])
        assert sorted(streamed["seq"].to_pylist()) == \
            sorted(store.read()["seq"].to_pylist())

    def test_without_quarantine_mode_fails_loudly(self, tmp_path):
        path, _ = _events_with_poison(tmp_path, {70})
        cfg_loud = CDCConfig(num_partitions=4, num_salts=2, epoch_size=60,
                             extract_batch_size=16, extract_concurrency=2)
        with pytest.raises(Exception):
            replay(path, str(tmp_path / "lake"), cfg_loud, mode="epoch")

    def test_purge_scrubs_dlq(self, tmp_path, capsys):
        """Right-to-be-forgotten reaches the quarantine keyspace: after a
        CLI purge of a quarantined url, no DLQ read returns it."""
        from opendataloader_pdf_ray.__main__ import main

        path, _ = _events_with_poison(tmp_path, {70, 71})
        lake_root = str(tmp_path / "lake")
        replay(path, lake_root, CFG, mode="epoch")
        store = QuarantineStore(quarantine_root(lake_root),
                                CFG.num_partitions)
        victim = store.read().filter(
            pc.equal(store.read()["seq"], 70))["url"][0].as_py()
        assert main(["purge", lake_root, victim]) == 0
        import json as _json

        rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["quarantine"]["rows_removed"] >= 1
        after = store.read()
        if after is not None:
            assert victim not in after["url"].to_pylist()
        # idempotent: second purge rewrites nothing
        assert main(["purge", lake_root, victim]) == 0
        rep2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep2["quarantine"]["rows_removed"] == 0

    def test_no_poison_no_dlq(self, tmp_path):
        path, _ = _events_with_poison(tmp_path, set())
        lake_root = str(tmp_path / "lake")
        replay(path, lake_root, CFG, mode="epoch")
        store = QuarantineStore(quarantine_root(lake_root),
                                CFG.num_partitions)
        assert store.read() is None

    def test_retry_heals_and_scrubs(self, tmp_path):
        """The closing half of the DLQ loop: after the poison cause is
        fixed (here: the segment re-published with good bytes), --retry
        re-extracts the quarantined events, folds successes into the lake
        as one maintenance epoch (LWW-safe), scrubs healed records from
        the DLQ, and leaves still-poison records quarantined."""
        from opendataloader_pdf_ray.cdc import oracle_final_state
        from opendataloader_pdf_ray.cdc.quarantine import retry_quarantine

        path, events = _events_with_poison(tmp_path, {70, 71})
        lake_root = str(tmp_path / "lake")
        replay(path, lake_root, CFG, mode="epoch")
        lake = Lake(lake_root, CFG.num_partitions)

        # fix seq 70 (re-published good bytes), leave 71 poison
        good = gen_events(120, 30, seed=42)
        html = events["html"].to_pylist()
        seqs = events["seq"].to_pylist()
        html[seqs.index(70)] = good["html"][seqs.index(70)].as_py()
        fixed = events.set_column(events.column_names.index("html"), "html",
                                  pa.array(html, pa.binary()))
        pq.write_table(fixed, path)

        summary = retry_quarantine(lake, path, CFG)
        assert summary["quarantined"] == 2
        assert summary["healed"] == 1
        assert summary["still_failing"] == 1
        assert summary["dlq_rows_removed"] == 1
        assert lake.is_epoch_complete(summary["epoch"])

        store = QuarantineStore(quarantine_root(lake_root),
                                CFG.num_partitions)
        left = store.read()
        assert left.num_rows == 1 and left["seq"][0].as_py() == 71

        # final state == the fixed stream minus the still-poison event
        clean = fixed.filter(pc.invert(pc.is_in(
            fixed["seq"], value_set=pa.array([71]))))
        oracle = oracle_final_state(clean)
        got = {r["url"]: r for r in
               lake.read_state(include_tombstones=True).to_pylist()}
        assert set(got) == set(oracle)
        for url, want in oracle.items():
            assert got[url]["text"] == want["text"], url
            assert got[url]["seq"] == want["seq"], url

        # idempotent: a second retry heals nothing and changes nothing
        again = retry_quarantine(lake, path, CFG)
        assert again["healed"] == 0 and again["still_failing"] == 1
        assert store.read().num_rows == 1

    def test_retry_empty_dlq_is_noop(self, tmp_path):
        from opendataloader_pdf_ray.cdc.quarantine import retry_quarantine

        path, _ = _events_with_poison(tmp_path, set())
        lake_root = str(tmp_path / "lake")
        replay(path, lake_root, CFG, mode="epoch")
        lake = Lake(lake_root, CFG.num_partitions)
        out = retry_quarantine(lake, path, CFG)
        assert out == {"quarantined": 0, "healed": 0, "still_failing": 0,
                       "epoch": None}
