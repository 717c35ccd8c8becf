"""Dedup-at-ingest tests (cdc/dupindex.py): first-writer-wins fingerprint
index — epoch-chunking invariance, exactly-once replay, attribution
correctness vs a sequential reference, and CDC-ingest integration."""

import hashlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from opendataloader_pdf_ray.cdc import DupIndex, Lake, dup_index_root, replay
from opendataloader_pdf_ray.cdc.dupindex import first_per_fp
from opendataloader_pdf_ray.config import CDCConfig


def corpus_table(n: int = 60) -> pa.Table:
    """n rows, ~1/3 of the texts duplicated across keys."""
    keys, ts, seq, texts = [], [], [], []
    for i in range(n):
        keys.append(f"k{i:05d}")
        ts.append(1_000_000 + i)
        seq.append(i)
        texts.append(f"content {i % (n // 3)} body")  # 3 writers per text
    return pa.table({
        "key": pa.array(keys, pa.string()),
        "ts": pa.array(ts, pa.int64()),
        "seq": pa.array(seq, pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


def sequential_owner(table: pa.Table) -> dict:
    """Reference FWW: owner per md5(text) = min (ts, seq, key)."""
    owners = {}
    for row in table.to_pylist():
        if row["text"] is None:
            continue
        fp = hashlib.md5(row["text"].encode()).digest()
        cand = (row["ts"], row["seq"], row["key"])
        if fp not in owners or cand < owners[fp]:
            owners[fp] = cand
    return {fp: k for fp, (_, _, k) in owners.items()}


def ds_of(table: pa.Table, blocks: int = 4):
    import ray.data

    return ray.data.from_arrow(table).repartition(blocks)


def new_index(root, **kw) -> DupIndex:
    return DupIndex(str(root), num_partitions=4, key_col="key",
                    ts_col="ts", seq_col="seq", text_col="text", **kw)


def test_first_per_fp_matches_reference():
    t = corpus_table(30)
    fps = [hashlib.md5(x.encode()).digest() for x in t["text"].to_pylist()]
    t = t.append_column("fp", pa.array(fps, pa.binary()))
    out = first_per_fp(t, "key", "ts", "seq")
    want = sequential_owner(t)
    got = dict(zip(out["fp"].to_pylist(), out["key"].to_pylist()))
    assert got == want


@pytest.mark.usefixtures("ray_session")
class TestDupIndex:
    def test_update_then_read_state(self, tmp_path):
        t = corpus_table()
        idx = new_index(tmp_path / "idx")
        lineage = idx.update(ds_of(t), epoch=0)
        assert sum(r["events_consumed"] for r in lineage) == t.num_rows
        state = idx.read_state()
        want = sequential_owner(t)
        assert state.num_rows == len(want)
        got = dict(zip(state["fp"].to_pylist(), state["key"].to_pylist()))
        assert got == want
        # canonical order: fp ascending, and new-fp accounting adds up
        fps = state["fp"].to_pylist()
        assert fps == sorted(fps)
        assert sum(r["rows_upserted"] for r in lineage) == len(want)

    def test_epoch_chunking_invariance(self, tmp_path):
        """Final index bytes identical whether folded as 1, 2 or 5 epochs
        (and whatever block count) — the determinism contract."""
        t = corpus_table()
        states = []
        for chunks in (1, 2, 5):
            idx = new_index(tmp_path / f"idx{chunks}")
            per = (t.num_rows + chunks - 1) // chunks
            for e in range(chunks):
                sub = t.slice(e * per, per)
                if sub.num_rows:
                    idx.update(ds_of(sub, blocks=3), epoch=e)
            states.append(idx.read_state())
        assert states[0].equals(states[1])
        assert states[0].equals(states[2])

    def test_exactly_once_replay(self, tmp_path):
        t = corpus_table()
        idx = new_index(tmp_path / "idx")
        idx.update(ds_of(t), epoch=0)
        before = idx.read_state()
        again = idx.update(ds_of(t), epoch=0)
        assert all(r["skipped"] for r in again)
        assert idx.read_state().equals(before)

    def test_resume_after_partial_commit(self, tmp_path):
        """Crash simulation: some fp-partitions committed for epoch 1, the
        rest not — re-running epoch 1 completes exactly-once."""
        t = corpus_table()
        half, rest = t.slice(0, 30), t.slice(30)
        idx = new_index(tmp_path / "idx")
        idx.update(ds_of(half), epoch=0)
        # partially apply epoch 1: only the rows landing in fp_part 0
        from opendataloader_pdf_ray.cdc.dupindex import (fp_partition,
                                                         md5_digests)

        fps = md5_digests(rest["text"].to_pylist())
        mask = pa.array(fp_partition(fps, idx.num_partitions) == 0)
        idx.update(ds_of(rest.filter(mask)), epoch=1)
        # full re-run of epoch 1 (the recovery path)
        lineage = idx.update(ds_of(rest), epoch=1)
        assert any(r["skipped"] for r in lineage)
        assert not all(r["skipped"] for r in lineage)
        want = sequential_owner(t)
        got = dict(zip(idx.read_state()["fp"].to_pylist(),
                       idx.read_state()["key"].to_pylist()))
        assert got == want

    def test_attribute(self, tmp_path):
        t = corpus_table()
        idx = new_index(tmp_path / "idx")
        idx.update(ds_of(t), epoch=0)
        out = (idx.attribute(ds_of(t), keep_cols=["key", "seq"])
                  .sort("key").take_all())
        owners = sequential_owner(t)
        rows = t.to_pylist()
        by_key = {r["key"]: r for r in rows}
        assert len(out) == t.num_rows
        for r in out:
            own = owners[hashlib.md5(
                by_key[r["key"]]["text"].encode()).digest()]
            if own == r["key"]:
                assert r["dup_of"] is None and not r["is_dup"]
            else:
                assert r["dup_of"] == own and r["is_dup"]

    def test_attribute_unknown_fp_and_tombstones(self, tmp_path):
        t = corpus_table(12)
        idx = new_index(tmp_path / "idx")
        idx.update(ds_of(t, blocks=2), epoch=0)
        probe = pa.table({
            "key": pa.array(["new", "gone"], pa.string()),
            "ts": pa.array([1, 2], pa.int64()),
            "seq": pa.array([900, 901], pa.int64()),
            "text": pa.array(["never indexed before", None], pa.string()),
        })
        out = idx.attribute(ds_of(probe, blocks=1)).take_all()
        # null-text row dropped; unseen fp → not a dup
        assert [r["key"] for r in out] == ["new"]
        assert out[0]["dup_of"] is None and not out[0]["is_dup"]


@pytest.mark.usefixtures("ray_session")
class TestIngestIntegration:
    def test_maintain_dup_index_through_replay(self, tmp_path):
        """cfg.maintain_dup_index=True folds every content-bearing event's
        extracted-text fingerprint into <lake>/fpindex during replay; dup
        content across urls attributes to its first writer."""
        from opendataloader_pdf_ray.stages.extract_stage import HtmlExtractor

        html_a = b"<html><body><p>shared body text</p></body></html>"
        html_b = b"<html><body><p>unique body text</p></body></html>"
        n = 24
        events = pa.table({
            "seq": pa.array(list(range(n)), pa.int64()),
            "op": pa.array(["I"] * n, pa.string()),
            "url": pa.array([f"https://e.x/{i}" for i in range(n)],
                            pa.string()),
            "warc_ts": pa.array([1_700_000_000_000_000 + i * 1_000_000
                                 for i in range(n)], pa.timestamp("us")),
            # every third url repeats html_a's content; one delete at the end
            "html": pa.array([html_a if i % 3 == 0 else
                              html_b.replace(b"unique", b"unique %d" % i)
                              for i in range(n)], pa.binary()),
            "lang": pa.array(["en"] * n, pa.string()),
        })
        # a delete event (null html) must be ignored by the index
        tomb = pa.table({
            "seq": pa.array([n], pa.int64()),
            "op": pa.array(["D"], pa.string()),
            "url": pa.array(["https://e.x/0"], pa.string()),
            "warc_ts": pa.array([1_700_000_000_000_000 + n * 1_000_000],
                                pa.timestamp("us")),
            "html": pa.array([None], pa.binary()),
            "lang": pa.array(["en"], pa.string()),
        })
        events = pa.concat_tables([events, tomb])
        path = str(tmp_path / "events.parquet")
        pq.write_table(events, path)
        cfg = CDCConfig(num_partitions=4, num_salts=2, epoch_size=10,
                        extract_batch_size=8, extract_concurrency=2,
                        maintain_dup_index=True, dup_index_partitions=4)
        lake_root = str(tmp_path / "lake")
        replay(path, lake_root, cfg, mode="epoch")

        idx = DupIndex(dup_index_root(lake_root))
        # expected FWW over EXTRACTED text of all I events
        ex = HtmlExtractor(cfg.extractor, include_blocks=False)
        extracted = ex(events)
        want = {}
        for row in extracted.to_pylist():
            if row["text"] is None:
                continue
            fp = hashlib.md5(row["text"].encode()).digest()
            cand = (row["warc_ts"], row["seq"], row["url"])
            if fp not in want or cand < want[fp]:
                want[fp] = cand
        state = idx.read_state()
        got = dict(zip(state["fp"].to_pylist(), state["url"].to_pylist()))
        assert got == {fp: u for fp, (_, _, u) in want.items()}
        # read-time attribution over the live lake state
        lake = Lake(lake_root)
        out = idx.attribute(lake.read_dataset(), keep_cols=["url"]) \
                 .sort("url").take_all()
        dups = {r["url"]: r["dup_of"] for r in out if r["is_dup"]}
        # urls 3,6,9,... share url 0's content (url 0 itself was deleted,
        # but first-seen attribution survives deletion by design)
        assert dups == {f"https://e.x/{i}": "https://e.x/0"
                        for i in range(3, n, 3)}

    def test_replay_idempotent_with_index(self, tmp_path):
        """Re-running the whole ingest (backlog mode) over an already-built
        lake+index is a no-op for both keyspaces."""
        from opendataloader_pdf_ray.fixtures.gen import gen_events

        path = str(tmp_path / "events.parquet")
        pq.write_table(gen_events(60, 20, seed=7), path)
        cfg = CDCConfig(num_partitions=4, num_salts=2, epoch_size=30,
                        extract_batch_size=8, extract_concurrency=2,
                        maintain_dup_index=True)
        lake_root = str(tmp_path / "lake")
        replay(path, lake_root, cfg)
        idx = DupIndex(dup_index_root(lake_root))
        before = idx.read_state()
        # epoch-done markers make a second replay() skip outright; force the
        # ingest path to re-run by replaying a fresh pending computation
        from opendataloader_pdf_ray.cdc import ingest_epochs

        lake = Lake(lake_root)
        lineage = ingest_epochs(path, lake, [0, 1], cfg)
        assert all(r["skipped"] for r in lineage)
        assert idx.read_state().equals(before)


@pytest.mark.usefixtures("ray_session")
class TestDeltaCommits:
    def test_delta_equals_snapshot_state(self, tmp_path):
        """Delta-mode chain folds to byte-identical state vs CoW snapshots,
        at any epoch chunking; compact materializes the same bytes and
        vacuum reclaims the folded chain without changing reads."""
        t = corpus_table()
        snap = new_index(tmp_path / "snap")
        delta = new_index(tmp_path / "delta", commit_mode="delta")
        per = 20
        for e in range((t.num_rows + per - 1) // per):
            sub = t.slice(e * per, per)
            snap.update(ds_of(sub, blocks=3), epoch=e)
            delta.update(ds_of(sub, blocks=2), epoch=e)
        want = snap.read_state()
        assert delta.read_state().equals(want)
        # delta files are winners-only appends, not full partitions
        kinds = {r["kind"] for r in delta.lineage()}
        assert kinds == {"delta"}
        # compact + vacuum: same reads, chain reclaimed
        assert delta.compact() > 0
        removed = delta.lake.vacuum()
        assert removed > 0
        assert delta.read_state().equals(want)
        # count_fingerprints agrees before/after compaction paths
        assert delta.count_fingerprints() == want.num_rows

    def test_delta_exactly_once_and_attribute(self, tmp_path):
        t = corpus_table()
        idx = new_index(tmp_path / "idx", commit_mode="delta")
        idx.update(ds_of(t), epoch=0)
        again = idx.update(ds_of(t), epoch=0)
        assert all(r["skipped"] for r in again)
        owners = sequential_owner(t)
        out = idx.attribute(ds_of(t), keep_cols=["key"]).take_all()
        got = {r["key"]: r["dup_of"] for r in out}
        for row in t.to_pylist():
            own = owners[hashlib.md5(row["text"].encode()).digest()]
            assert got[row["key"]] == (None if own == row["key"] else own)

    def test_delta_out_of_order_reowns_fp(self, tmp_path):
        """A later epoch carrying an EARLIER (ts, seq) event must take
        ownership through the merge-on-read fold (FWW is not append-only)."""
        first = pa.table({
            "key": pa.array(["b"], pa.string()),
            "ts": pa.array([100], pa.int64()),
            "seq": pa.array([10], pa.int64()),
            "text": pa.array(["shared"], pa.string()),
        })
        late = pa.table({
            "key": pa.array(["a"], pa.string()),
            "ts": pa.array([50], pa.int64()),
            "seq": pa.array([5], pa.int64()),
            "text": pa.array(["shared"], pa.string()),
        })
        idx = new_index(tmp_path / "idx", commit_mode="delta")
        idx.update(ds_of(first, blocks=1), epoch=0)
        assert idx.read_state()["key"].to_pylist() == ["b"]
        idx.update(ds_of(late, blocks=1), epoch=1)
        assert idx.read_state()["key"].to_pylist() == ["a"]
        # time travel: at epoch 0 ownership was still b's
        assert idx.read_state(as_of=0)["key"].to_pylist() == ["b"]

    def test_ingest_delta_mode_and_cli_compact(self, tmp_path, capsys):
        """replay with dup_index_commits='delta', then CLI compact folds the
        fpindex chain alongside the lake."""
        import json as _json

        from opendataloader_pdf_ray.__main__ import main
        from opendataloader_pdf_ray.cdc import dup_index_root, replay
        from opendataloader_pdf_ray.fixtures.gen import gen_events

        path = str(tmp_path / "events.parquet")
        pq.write_table(gen_events(120, 30, seed=9), path)
        cfg = CDCConfig(num_partitions=4, num_salts=2, epoch_size=30,
                        extract_batch_size=8, extract_concurrency=2,
                        maintain_dup_index=True, dup_index_commits="delta")
        lake_root = str(tmp_path / "lake")
        replay(path, lake_root, cfg, mode="epoch")
        idx = DupIndex(dup_index_root(lake_root))
        before = idx.read_state()
        assert before.num_rows > 0
        assert main(["compact", lake_root]) == 0
        rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["fpindex_compacted"] > 0
        assert rep["fpindex_reclaimed"] > 0
        assert DupIndex(dup_index_root(lake_root)).read_state().equals(before)


@pytest.mark.usefixtures("ray_session")
class TestIndexFsck:
    def test_verify_healthy_and_corrupted(self, tmp_path, capsys):
        import json as _json

        from opendataloader_pdf_ray.__main__ import main

        idx = new_index(tmp_path / "lake" / "fpindex", commit_mode="delta")
        t = corpus_table(30)
        idx.update(ds_of(t, blocks=2), epoch=0)
        idx.update(ds_of(corpus_table(45).slice(30), blocks=2), epoch=1)
        rep = idx.verify(deep=True)
        assert rep["ok"] and not rep["issues"]
        # a missing delta in the live chain must be caught
        victim_part = next(p for p in range(idx.num_partitions)
                           if idx.lake.fs.exists(idx.lake._delta_path(p, 1)))
        idx.lake.fs.rm_file(idx.lake._delta_path(victim_part, 1))
        bad = idx.verify()
        assert not bad["ok"] and any("delta file" in i or "data files" in i
                                     for i in bad["issues"])

    def test_cli_fsck_includes_fpindex(self, tmp_path, capsys):
        import json as _json

        from opendataloader_pdf_ray.__main__ import main
        from opendataloader_pdf_ray.cdc import replay
        from opendataloader_pdf_ray.fixtures.gen import gen_events

        path = str(tmp_path / "events.parquet")
        pq.write_table(gen_events(60, 20, seed=4), path)
        lake_root = str(tmp_path / "lake")
        cfg = CDCConfig(num_partitions=4, num_salts=2, epoch_size=30,
                        extract_batch_size=8, extract_concurrency=2,
                        maintain_dup_index=True)
        replay(path, lake_root, cfg, mode="epoch")
        assert main(["fsck", lake_root, "--deep"]) == 0
        rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["ok"] and rep["fpindex"]["ok"]
        # corrupt the index chain → nonzero exit through the same command
        idx = DupIndex(dup_index_root(lake_root))
        part = next(p for p in range(idx.num_partitions)
                    if idx.lake.committed_epochs(p))
        tip = idx.lake.committed_epochs(part)[-1]
        idx.lake.fs.rm_file(idx.lake._data_path(part, tip))
        assert main(["fsck", lake_root]) == 1
        capsys.readouterr()
