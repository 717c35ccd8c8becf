"""Inverted full-text index (cdc/textindex.py): retract/apply maintenance,
exactly-once commits, time travel, compaction pruning, search pruning, purge.
"""

import json

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from opendataloader_pdf_ray.cdc import Lake, Lineage, TextIndex
from opendataloader_pdf_ray.cdc.textindex import (latest_per_tok_key,
                                                  text_index_root,
                                                  tok_partition)


def commit_rows(lake: Lake, part: int, epoch: int, rows):
    """rows: (url, seq, text_or_None, deleted)."""
    t = pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "warc_ts": pa.array([r[1] for r in rows], pa.int64()),
        "seq": pa.array([r[1] for r in rows], pa.int64()),
        "text": pa.array([r[2] for r in rows], pa.string()),
        "deleted": pa.array([r[3] for r in rows], pa.bool_()),
    })
    lake.commit_delta(part, epoch, t, Lineage(
        part=part, epoch=epoch, events_consumed=len(rows),
        rows_upserted=len(rows), rows_deleted=0,
        seq_min=min(r[1] for r in rows), seq_max=max(r[1] for r in rows)))


def seed_lake(root: str) -> Lake:
    """2-partition, 3-epoch lake: insert / update-with-retraction / delete /
    re-add / never-live ghost tombstone."""
    lake = Lake(str(root), 2)
    commit_rows(lake, 0, 0, [("a", 1, "red fox jumps", False)])
    commit_rows(lake, 1, 0, [("b", 2, "blue fox", False)])
    # epoch 1: a drops 'fox jumps' gains 'wolf'; b tombstoned; ghost no-op
    commit_rows(lake, 0, 1, [("a", 3, "red wolf", False),
                             ("ghost", 4, None, True)])
    commit_rows(lake, 1, 1, [("b", 5, None, True)])
    # epoch 2: a re-adds fox
    commit_rows(lake, 0, 2, [("a", 6, "red wolf fox", False)])
    return lake


def live_postings(idx: TextIndex, as_of=None):
    t = idx.read_state(as_of=as_of)
    return sorted(zip(t["tok"].to_pylist(), t["key"].to_pylist()))


class TestFold:
    def test_latest_per_tok_key_keeps_max_epoch(self):
        t = pa.table({
            "tok": ["x", "x", "x", "y"],
            "key": ["a", "a", "b", "a"],
            "epoch": pa.array([0, 2, 1, 0], pa.int64()),
            "sign": pa.array([1, -1, 1, 1], pa.int8()),
        })
        out = latest_per_tok_key(t).sort_by(
            [("tok", "ascending"), ("key", "ascending")])
        assert out["epoch"].to_pylist() == [2, 1, 0]
        assert out["sign"].to_pylist() == [-1, 1, 1]

    def test_fold_is_chunking_invariant(self):
        t = pa.table({
            "tok": ["x"] * 4 + ["y"] * 2,
            "key": ["a", "b", "a", "b", "a", "a"],
            "epoch": pa.array([0, 0, 1, 2, 3, 5], pa.int64()),
            "sign": pa.array([1, 1, -1, -1, 1, -1], pa.int8()),
        })
        whole = latest_per_tok_key(t).sort_by(
            [("tok", "ascending"), ("key", "ascending")])
        halves = latest_per_tok_key(pa.concat_tables([
            latest_per_tok_key(t.slice(0, 3)),
            latest_per_tok_key(t.slice(3)),
        ])).sort_by([("tok", "ascending"), ("key", "ascending")])
        assert whole.equals(halves)

    def test_tok_partition_stable(self):
        parts = tok_partition(["fox", "wolf", "fox"], 8)
        assert parts[0] == parts[2]
        assert all(0 <= p < 8 for p in parts)


class TestRefresh:
    def test_retract_apply_semantics(self, tmp_path, ray_session):
        lake = seed_lake(tmp_path / "lake")
        idx = TextIndex(str(tmp_path / "ti"), num_partitions=4)
        idx.refresh(lake)
        assert live_postings(idx) == [
            ("fox", "a"), ("red", "a"), ("wolf", "a")]
        # time travel: epoch 0 has both foxes; epoch 1 has neither
        assert live_postings(idx, as_of=0) == [
            ("blue", "b"), ("fox", "a"), ("fox", "b"),
            ("jumps", "a"), ("red", "a")]
        assert live_postings(idx, as_of=1) == [("red", "a"), ("wolf", "a")]

    def test_unchanged_tokens_emit_no_deltas(self, tmp_path, ray_session):
        """'red' survives a→v2 unchanged: the epoch-1 delta file must not
        carry a row for it (delta volume scales with churn)."""
        import pyarrow.parquet as pq

        lake = seed_lake(tmp_path / "lake")
        idx = TextIndex(str(tmp_path / "ti"), num_partitions=4)
        idx.refresh(lake)
        toks_e1 = []
        for part in range(4):
            p = idx.lake._delta_path(part, 1)
            if idx.lake.fs.exists(p):
                toks_e1 += pq.read_table(
                    p, filesystem=idx.lake.fs)["tok"].to_pylist()
        assert "red" not in toks_e1
        assert set(toks_e1) == {"fox", "jumps", "wolf", "blue"}

    def test_incremental_equals_one_shot(self, tmp_path, ray_session):
        lake = seed_lake(tmp_path / "lake")
        inc = TextIndex(str(tmp_path / "inc"), num_partitions=4)
        for e in (0, 1, 2):
            inc.refresh(lake, up_to=e)
        one = TextIndex(str(tmp_path / "one"), num_partitions=4)
        one.refresh(lake)
        for part in range(4):
            a = inc.read_partition(part)
            b = one.read_partition(part)
            if a is None or b is None:
                assert a is None and b is None
                continue
            assert a.equals(b)

    def test_exactly_once_and_watermark(self, tmp_path, ray_session):
        lake = seed_lake(tmp_path / "lake")
        idx = TextIndex(str(tmp_path / "ti"), num_partitions=4)
        lin = idx.refresh(lake)
        assert lin and not any(r["skipped"] for r in lin)
        assert idx.watermark() == 2
        # watermark short-circuit: nothing new → no work
        assert idx.refresh(lake) == []
        # crash-resume analog: lost watermark → deterministic re-emission
        # meets the commit log and no-ops everywhere
        idx._set_watermark(-1)
        replay = idx.refresh(lake)
        assert replay and all(r["skipped"] for r in replay)
        assert idx.watermark() == 2

    def test_new_epoch_after_watermark_folds(self, tmp_path, ray_session):
        lake = seed_lake(tmp_path / "lake")
        idx = TextIndex(str(tmp_path / "ti"), num_partitions=4)
        idx.refresh(lake)
        commit_rows(lake, 1, 3, [("b", 7, "green fox", False)])
        idx.refresh(lake)
        assert ("green", "b") in live_postings(idx)
        assert ("fox", "b") in live_postings(idx)


class TestSearch:
    def test_search_probes_and_as_of(self, tmp_path, ray_session):
        lake = seed_lake(tmp_path / "lake")
        idx = TextIndex(str(tmp_path / "ti"), num_partitions=4)
        idx.refresh(lake)
        hits = sorted((r["token"], r["key"]) for r in
                      idx.search(["fox", "blue", "nosuch"]).take_all())
        assert hits == [("fox", "a")]
        old = sorted((r["token"], r["key"]) for r in
                     idx.search(["fox", "blue"], as_of=0).take_all())
        assert old == [("blue", "b"), ("fox", "a"), ("fox", "b")]

    def test_search_empty_index(self, tmp_path, ray_session):
        idx = TextIndex(str(tmp_path / "ti"), num_partitions=4)
        assert idx.search(["anything"]).take_all() == []

    def test_search_local_equals_ray_search(self, tmp_path, ray_session):
        """The in-process serving path returns the same posting set as the
        Ray Dataset path (which has no canonical row order)."""
        lake = seed_lake(tmp_path / "lake")
        idx = TextIndex(str(tmp_path / "ti"), num_partitions=4)
        idx.refresh(lake)
        for toks, as_of in ([["fox", "blue", "nosuch"]], None), \
                           ([["fox", "blue"]], 0):
            ray_hits = sorted((r["token"], r["key"]) for r in
                              idx.search(toks[0], as_of=as_of).take_all())
            loc = idx.search_local(toks[0], as_of=as_of)
            loc_hits = list(zip(loc["token"].to_pylist(),
                                loc["key"].to_pylist()))
            assert ray_hits == loc_hits


class TestCompactVerify:
    def test_compact_prunes_dead_and_preserves_reads(self, tmp_path,
                                                     ray_session):
        lake = seed_lake(tmp_path / "lake")
        idx = TextIndex(str(tmp_path / "ti"), num_partitions=4)
        idx.refresh(lake)
        before = live_postings(idx)
        before_e0 = live_postings(idx, as_of=0)
        assert idx.compact_distributed() > 0
        assert live_postings(idx) == before
        # deltas still present → time travel below the snapshot still works
        assert live_postings(idx, as_of=0) == before_e0
        rep = idx.verify(deep=True)
        assert rep["ok"], rep["issues"]
        # snapshots carry no retracted rows
        for part in range(4):
            t = idx.read_partition(part)
            if t is not None:
                assert int(pc.min(t["sign"]).as_py() or 1) > 0

    def test_verify_flags_retracted_snapshot_rows(self, tmp_path,
                                                  ray_session):
        lake = seed_lake(tmp_path / "lake")
        idx = TextIndex(str(tmp_path / "ti"), num_partitions=4)
        idx.refresh(lake)
        bad = pa.table({
            "tok": pa.array(["zz"], pa.string()),
            "key": pa.array(["a"], pa.string()),
            "epoch": pa.array([2], pa.int64()),
            "sign": pa.array([-1], pa.int8()),
        })
        part = int(tok_partition(["zz"], 4)[0])
        epochs = idx.lake.committed_epochs(part)
        idx.lake.fs.makedirs(idx.lake._part_dir(part), exist_ok=True)
        idx.lake._write_table_atomic(
            bad, idx.lake._data_path(part, epochs[-1]))
        rep = idx.verify(deep=True)
        assert not rep["ok"]
        assert any("retracted rows" in i for i in rep["issues"])


class TestPurge:
    def test_purge_keys_scrubs_everywhere(self, tmp_path, ray_session):
        lake = seed_lake(tmp_path / "lake")
        idx = TextIndex(str(tmp_path / "ti"), num_partitions=4)
        idx.refresh(lake)
        audit = idx.purge_keys(["a"])
        assert audit["rows_removed"] > 0
        assert all(k != "a" for _, k in live_postings(idx))
        # audit stores hashes, never the url itself
        import hashlib
        assert audit["key_hashes"] == [hashlib.sha256(b"a").hexdigest()]
        # idempotent
        again = idx.purge_keys(["a"])
        assert again["rows_removed"] == 0


class TestTailFollowers:
    """ingest --mode follow with followers: the text index stays fresh AS
    the tail commits epochs, and a restart heals a crash between an epoch
    commit and its index refresh (catch-up refresh)."""

    def test_tail_keeps_index_fresh(self, tmp_path, ray_session):
        import os

        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from opendataloader_pdf_ray.cdc import Lake, TextIndex, \
            text_index_root
        from opendataloader_pdf_ray.cdc.ingest import follow
        from opendataloader_pdf_ray.config import CDCConfig
        from opendataloader_pdf_ray.fixtures.gen import gen_events

        cfg = CDCConfig(num_partitions=4, num_salts=2, epoch_size=60,
                        extract_batch_size=16, extract_concurrency=2)
        events = gen_events(120, 30, seed=11)
        seg_dir = str(tmp_path / "segs")
        lake_root = str(tmp_path / "lake")
        os.makedirs(seg_dir, exist_ok=True)

        def write(lo, hi):
            part = events.filter((pc.field("seq") >= lo)
                                 & (pc.field("seq") < hi))
            pq.write_table(part, f"{seg_dir}/seg-{lo:06d}.parquet")

        idx = TextIndex(text_index_root(lake_root), num_partitions=4)
        # phase 1: epoch 0 completes; the follower must already serve it
        write(0, 60)
        follow(seg_dir, lake_root, cfg, poll_interval=0.05,
               max_idle_polls=1, followers=[idx])
        assert idx.watermark() == 0
        state1 = idx.read_state()
        assert state1.num_rows > 0
        # phase 2 (restart): remaining segments + stop marker — the tail
        # resumes, the follower advances to the final epoch
        write(60, 120)
        open(os.path.join(seg_dir, ".end"), "w").close()
        follow(seg_dir, lake_root, cfg, poll_interval=0.05,
               followers=[TextIndex(text_index_root(lake_root))])
        idx2 = TextIndex(text_index_root(lake_root))
        assert idx2.watermark() == 1
        # the final index equals a from-scratch rebuild over the same lake
        rebuilt = TextIndex(str(tmp_path / "rebuild"), num_partitions=4)
        rebuilt.refresh(Lake(lake_root))
        assert idx2.read_state().equals(rebuilt.read_state())


class TestRanked:
    @staticmethod
    def _brute(lake: Lake, probes, k=10):
        """Reference: exact-integer tf-idf over the lake's LIVE text —
        recomputed from scratch, independent of the index machinery."""
        import re
        from collections import Counter

        tok_re = re.compile(r"\w+")
        state = lake.read_state()
        docs = {u: Counter(tok_re.findall((t or "").lower()))
                for u, t in zip(state["url"].to_pylist(),
                                state["text"].to_pylist())}
        df = {p: sum(1 for c in docs.values() if c.get(p)) for p in probes}
        scores = {}
        for u, c in docs.items():
            s = sum(c.get(p, 0) * ((1 << 24) // df[p])
                    for p in probes if df[p])
            if s:
                scores[u] = s
        return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    def test_ranked_matches_brute_reference(self, tmp_path, ray_session):
        lake = seed_lake(tmp_path / "lake")
        # epoch 3: count-only change (fox set-unchanged, tf 1→3) + new doc
        # sharing 'fox' so df>1 exercises the idf weight
        commit_rows(lake, 0, 3, [("a", 7, "red wolf fox fox fox", False)])
        commit_rows(lake, 1, 3, [("c", 8, "fox den", False)])
        idx = TextIndex(str(tmp_path / "ti"), num_partitions=4)
        idx.refresh(lake)
        for probes in (["fox"], ["fox", "red"], ["fox", "red", "den"],
                       ["absent"]):
            want = self._brute(lake, probes)
            got = idx.ranked_search_local(probes, k=10)
            assert list(zip(got["key"].to_pylist(),
                            got["score"].to_pylist())) == want, probes

    def test_count_only_change_refreshes_tf(self, tmp_path, ray_session):
        """The count-diff emitter: a token whose SET membership is
        unchanged but whose tf moved must re-apply with the new count
        (the set-diff emitter was blind to this)."""
        lake = seed_lake(tmp_path / "lake")
        idx = TextIndex(str(tmp_path / "ti"), num_partitions=4)
        idx.refresh(lake)
        before = idx.ranked_search_local(["fox"], k=5)
        assert before["score"].to_pylist() == [1 << 24]  # tf=1, df=1
        commit_rows(lake, 0, 3, [("a", 7, "red wolf fox fox", False)])
        idx.refresh(lake)
        after = idx.ranked_search_local(["fox"], k=5)
        assert after["score"].to_pylist() == [2 * (1 << 24)]  # tf=2
        # set-stable tokens with stable counts still emit nothing
        import pyarrow.parquet as pq
        toks_e3 = []
        for part in range(4):
            p = idx.lake._delta_path(part, 3)
            if idx.lake.fs.exists(p):
                toks_e3 += pq.read_table(
                    p, filesystem=idx.lake.fs)["tok"].to_pylist()
        assert set(toks_e3) == {"fox"}

    def test_ray_ranked_equals_local(self, tmp_path, ray_session):
        lake = seed_lake(tmp_path / "lake")
        commit_rows(lake, 1, 3, [("c", 8, "fox fox wolf", False)])
        idx = TextIndex(str(tmp_path / "ti"), num_partitions=4)
        idx.refresh(lake)
        probes = ["fox", "wolf", "red"]
        local = idx.ranked_search_local(probes, k=10)
        dist = idx.ranked_search(probes, k=10).take_all()
        assert [(r["key"], r["score"]) for r in dist] == \
            list(zip(local["key"].to_pylist(), local["score"].to_pylist()))

    def test_ranked_as_of_and_compact(self, tmp_path, ray_session):
        lake = seed_lake(tmp_path / "lake")
        idx = TextIndex(str(tmp_path / "ti"), num_partitions=4)
        idx.refresh(lake)
        # as-of epoch 0: both a and b carry fox tf=1, df=2
        t0 = idx.ranked_search_local(["fox"], k=5, as_of=0)
        assert t0["key"].to_pylist() == ["a", "b"]
        assert t0["score"].to_pylist() == [(1 << 24) // 2] * 2
        tip = idx.ranked_search_local(["fox", "wolf"], k=5)
        idx.compact()
        assert idx.ranked_search_local(["fox", "wolf"], k=5).equals(tip)


class TestPhrase:
    def _idx(self, tmp_path):
        lake = Lake(str(tmp_path / "lake"), 2)
        commit_rows(lake, 0, 0, [("a", 1, "the big bad wolf howls", False)])
        commit_rows(lake, 1, 0, [("b", 2, "bad wolf the big den", False),
                                 ("c", 3, "big bad ideas", False)])
        idx = TextIndex(str(tmp_path / "ti"), num_partitions=4,
                        positional=True)
        idx.refresh(lake)
        return lake, idx

    def test_phrase_adjacency(self, tmp_path, ray_session):
        lake, idx = self._idx(tmp_path)
        # 'big bad wolf' consecutive only in a; 'big bad' in a and c;
        # b has all three tokens but never consecutively
        assert idx.phrase_search_local(
            ["big", "bad", "wolf"])["key"].to_pylist() == ["a"]
        assert idx.phrase_search_local(
            ["big", "bad"])["key"].to_pylist() == ["a", "c"]
        assert idx.phrase_search_local(
            ["wolf", "howls"])["key"].to_pylist() == ["a"]
        assert idx.phrase_search_local(
            ["bad", "howls"])["key"].to_pylist() == []
        # single token degenerates to membership
        assert idx.phrase_search_local(
            ["wolf"])["key"].to_pylist() == ["a", "b"]

    def test_phrase_tracks_updates_and_as_of(self, tmp_path, ray_session):
        lake, idx = self._idx(tmp_path)
        # b's edit makes the phrase: positions shift — the position-diff
        # emitter must re-apply shifted tokens
        commit_rows(lake, 1, 1, [("b", 4, "the big bad wolf den", False)])
        idx.refresh(lake)
        assert idx.phrase_search_local(
            ["big", "bad", "wolf"])["key"].to_pylist() == ["a", "b"]
        assert idx.phrase_search_local(
            ["big", "bad", "wolf"], as_of=0)["key"].to_pylist() == ["a"]

    def test_ray_phrase_equals_local(self, tmp_path, ray_session):
        lake, idx = self._idx(tmp_path)
        dist = sorted(r["key"] for r in
                      idx.phrase_search(["big", "bad"]).take_all())
        assert dist == idx.phrase_search_local(
            ["big", "bad"])["key"].to_pylist()

    def test_positional_config_is_persistent(self, tmp_path, ray_session):
        lake, idx = self._idx(tmp_path)
        # reopen with no flag: stored positional wins
        reopened = TextIndex(str(tmp_path / "ti"))
        assert reopened.positional
        assert reopened.phrase_search_local(
            ["big", "bad"])["key"].to_pylist() == ["a", "c"]
        # conflicting reopen fails loudly
        with pytest.raises(ValueError, match="rebuild"):
            TextIndex(str(tmp_path / "ti"), positional=False)
        # non-positional index refuses phrase search
        other = TextIndex(str(tmp_path / "flat"), num_partitions=4)
        other.refresh(lake)
        with pytest.raises(ValueError, match="no positions"):
            other.phrase_search_local(["big", "bad"])

    def test_ranked_unaffected_by_positions(self, tmp_path, ray_session):
        """tf from positional postings == tf from count postings."""
        lake, idx = self._idx(tmp_path)
        flat = TextIndex(str(tmp_path / "flat"), num_partitions=4)
        flat.refresh(lake)
        probes = ["big", "bad", "wolf", "the"]
        assert idx.ranked_search_local(probes, k=5).equals(
            flat.ranked_search_local(probes, k=5))

    def test_phrase_cli(self, tmp_path, capsys, ray_session):
        from opendataloader_pdf_ray.__main__ import main

        lake_root = str(tmp_path / "lake")
        lake = Lake(lake_root, 2)
        commit_rows(lake, 0, 0, [("a", 1, "alpha beta gamma", False)])
        commit_rows(lake, 1, 0, [("b", 2, "beta alpha gamma", False)])
        assert main(["text-index", lake_root, "--positional"]) == 0
        capsys.readouterr()
        assert main(["search", lake_root, "alpha", "beta",
                     "--phrase"]) == 0
        out = json.loads(capsys.readouterr().out.strip())
        assert out == {"phrase": "alpha beta", "n_urls": 1, "urls": ["a"]}


class TestCLI:
    def test_ranked_search_cli(self, tmp_path, capsys, ray_session):
        from opendataloader_pdf_ray.__main__ import main

        lake_root = tmp_path / "lake"
        lake = seed_lake(lake_root)
        commit_rows(lake, 0, 3, [("c", 7, "fox fox fox", False)])
        assert main(["text-index", str(lake_root)]) == 0
        capsys.readouterr()
        assert main(["search", str(lake_root), "fox", "red", "--ranked",
                     "--topk", "2"]) == 0
        rows = [json.loads(ln) for ln in
                capsys.readouterr().out.strip().splitlines()]
        # c: tf(fox)=3 × (2^24//2); a: tf(fox)=1 × (2^24//2) + tf(red)=1
        # × (2^24//1) — a outranks c on the rare 'red' term
        assert [r["url"] for r in rows] == ["a", "c"]
        assert rows[0]["score"] == (1 << 24) // 2 + (1 << 24)
        assert rows[1]["score"] == 3 * ((1 << 24) // 2)

    def test_text_index_and_search_cli(self, tmp_path, capsys, ray_session):
        from opendataloader_pdf_ray.__main__ import main

        lake_root = tmp_path / "lake"
        seed_lake(lake_root)
        assert main(["text-index", str(lake_root)]) == 0
        out = json.loads(capsys.readouterr().out.strip())
        assert out["watermark"] == 2 and out["commits"] > 0
        # second refresh: watermark short-circuit
        assert main(["text-index", str(lake_root)]) == 0
        out2 = json.loads(capsys.readouterr().out.strip())
        assert out2["commits"] == 0 and out2["skipped"] == 0
        assert main(["search", str(lake_root), "fox", "blue"]) == 0
        lines = [json.loads(ln) for ln in
                 capsys.readouterr().out.strip().splitlines()]
        by_tok = {r["token"]: r for r in lines}
        assert by_tok["fox"]["n_urls"] == 1
        assert by_tok["fox"]["urls"] == ["a"]
        assert by_tok["blue"]["n_urls"] == 0
        assert main(["search", str(lake_root), "fox", "--as-of", "0"]) == 0
        lines = [json.loads(ln) for ln in
                 capsys.readouterr().out.strip().splitlines()]
        assert lines[0]["n_urls"] == 2

    def test_purge_cli_scrubs_text_index(self, tmp_path, capsys,
                                         ray_session):
        from opendataloader_pdf_ray.__main__ import main
        from opendataloader_pdf_ray.cdc import text_index_root

        lake_root = tmp_path / "lake"
        lake = seed_lake(lake_root)
        idx = TextIndex(text_index_root(str(lake_root)), num_partitions=4)
        idx.refresh(lake)
        assert main(["purge", str(lake_root), "a"]) == 0
        report = json.loads(capsys.readouterr().out.strip())
        assert report["textidx"]["rows_removed"] > 0
        idx2 = TextIndex(text_index_root(str(lake_root)))
        assert all(k != "a" for _, k in live_postings(idx2))
