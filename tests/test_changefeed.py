"""Change feed (cdc/changefeed.py): op classification against the
pre-image, delta + snapshot sources, since/until windows, vacuum safety."""

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from opendataloader_pdf_ray.cdc import Lake, ingest_epoch, oracle_final_state
from opendataloader_pdf_ray.cdc.lake import Lineage
from opendataloader_pdf_ray.config import CDCConfig
from opendataloader_pdf_ray.fixtures.gen import gen_events

CFG = CDCConfig(num_partitions=4, num_salts=2, epoch_size=60,
                extract_batch_size=16, extract_concurrency=2,
                epoch_commits="delta")
N_EPOCHS = 3


@pytest.fixture(scope="module")
def events_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("feed") / "events.parquet")
    pq.write_table(gen_events(180, 40, seed=42), path)
    return path


@pytest.fixture()
def lake(events_path, tmp_path):
    lk = Lake(str(tmp_path / "lake"), CFG.num_partitions)
    for e in range(N_EPOCHS):
        ingest_epoch(events_path, lk, e, CFG)
    return lk


def _feed(lake, **kw):
    t = pa.concat_tables(
        [b for b in lake.changes(**kw).iter_batches(batch_format="pyarrow")
         if b.num_rows])
    return t.sort_by([("epoch", "ascending"), ("url", "ascending")])


@pytest.mark.usefixtures("ray_session")
class TestChangeFeed:
    def test_full_feed_replays_to_final_state(self, lake, events_path):
        """Folding the feed (grouped by url, last op wins) must reproduce
        the lake's final live state — the consumer-side replay guarantee."""
        feed = _feed(lake)
        # last change per url across the feed
        last = {}
        for r in feed.to_pylist():
            last[r["url"]] = r
        oracle = oracle_final_state(pq.read_table(events_path))
        live_oracle = {u: r for u, r in oracle.items() if not r["deleted"]}
        feed_live = {u: r for u, r in last.items() if r["op"] != "delete"}
        assert set(feed_live) == set(live_oracle)
        for u, want in live_oracle.items():
            assert feed_live[u]["text"] == want["text"], u
            assert feed_live[u]["seq"] == want["seq"], u
        # every url the oracle says is tombstoned AND was ever live must end
        # with a delete op in the feed
        for u, want in oracle.items():
            if want["deleted"] and u in last:
                assert last[u]["op"] == "delete", u

    def test_op_classification_against_preimage(self, lake):
        feed = _feed(lake)
        seen_live = set()
        for r in feed.to_pylist():
            if r["op"] == "insert":
                assert r["url"] not in seen_live
                seen_live.add(r["url"])
            elif r["op"] == "update":
                assert r["url"] in seen_live
            else:  # delete
                assert r["url"] in seen_live
                seen_live.discard(r["url"])

    def test_since_until_window_is_exact(self, lake):
        full = _feed(lake)
        tail = _feed(lake, since=0)
        head = _feed(lake, until=0)
        assert head.num_rows + tail.num_rows == full.num_rows
        assert set(head["epoch"].to_pylist()) <= {0}
        assert set(tail["epoch"].to_pylist()) <= {1, 2}
        # windows compose: feed(since=0) == feed epochs 1..2 of the full
        full_tail = full.filter(pc.greater(full["epoch"], 0))
        assert tail.num_rows == full_tail.num_rows
        assert tail["url"].to_pylist() == full_tail["url"].to_pylist()
        assert tail["op"].to_pylist() == full_tail["op"].to_pylist()

    def test_update_requires_preimage_in_since_window(self, lake):
        """A consumer feeding from since=0 sees epoch-1 changes classified
        against the REAL epoch-0 state (not 'everything is an insert')."""
        tail = _feed(lake, since=0)
        assert "update" in set(tail["op"].to_pylist()) or \
               "delete" in set(tail["op"].to_pylist())

    def test_snapshot_commits_diff_not_dump(self, events_path, tmp_path):
        """CoW (snapshot-kind) epochs feed only CHANGED rows — carried-over
        rows must not re-enter the feed every epoch."""
        cfg = CDCConfig(num_partitions=4, num_salts=2, epoch_size=60,
                        extract_batch_size=16, extract_concurrency=2)
        lk = Lake(str(tmp_path / "cow"), cfg.num_partitions)
        for e in range(N_EPOCHS):
            ingest_epoch(events_path, lk, e, cfg)
        snap_feed = _feed(lk)
        delta_lake = Lake(str(tmp_path / "delta"), CFG.num_partitions)
        for e in range(N_EPOCHS):
            ingest_epoch(events_path, delta_lake, e, CFG)
        delta_feed = _feed(delta_lake)
        # identical change rows from both commit modes
        assert snap_feed.num_rows == delta_feed.num_rows
        for col in ("epoch", "op", "url", "seq"):
            assert snap_feed[col].to_pylist() == delta_feed[col].to_pylist()

    def test_vacuumed_history_raises(self, lake):
        lake.compact()
        lake.vacuum()
        with pytest.raises(Exception, match="changefeed|vacuum"):
            _feed(lake)
        # but feeding AFTER the vacuum horizon still works: since = tip - 1
        # requires only the tip... tip state is the compacted snapshot, so a
        # feed of (tip, ∞] is empty and must not raise
        tips = [lake.committed_epochs(p)[-1]
                for p in range(lake.num_partitions)
                if lake.committed_epochs(p)]
        out = list(lake.changes(since=max(tips)).iter_batches(
            batch_format="pyarrow"))
        assert sum(b.num_rows for b in out) == 0

    def test_schema_evolution_null_backfilled(self, tmp_path):
        """A mid-stream additive column: earlier epochs' feed rows carry it
        null-backfilled; later epochs carry the value (Arrow unification —
        the lake's schema-evolution contract extends to the feed)."""
        lk = Lake(str(tmp_path / "evo"), 1)
        t0 = pa.table({"url": ["a"], "warc_ts": pa.array([1], pa.int64()),
                       "seq": pa.array([0], pa.int64()),
                       "deleted": [False], "text": ["x"]})
        t1 = pa.table({"url": ["b"], "warc_ts": pa.array([2], pa.int64()),
                       "seq": pa.array([1], pa.int64()),
                       "deleted": [False], "text": ["y"],
                       "lang": ["en"]})  # new column appears in epoch 1
        lin = lambda e: Lineage(part=0, epoch=e, events_consumed=1,
                                rows_upserted=1, rows_deleted=0,
                                seq_min=0, seq_max=0)
        lk.commit_delta(0, 0, t0, lin(0))
        lk.commit_delta(0, 1, t1, lin(1))
        feed = _feed(lk)
        assert "lang" in feed.column_names
        by_url = {r["url"]: r for r in feed.to_pylist()}
        assert by_url["a"]["lang"] is None
        assert by_url["b"]["lang"] == "en"

    def test_follow_changes_tails_commits(self, events_path, tmp_path):
        """The consumer tail: epochs enter the feed only once DONE, each
        exactly once, and the union of tailed windows equals the bulk feed."""
        from opendataloader_pdf_ray.cdc.changefeed import follow_changes
        from opendataloader_pdf_ray.cdc.ingest import ingest_epoch

        lk = Lake(str(tmp_path / "lake"), CFG.num_partitions)
        ingest_epoch(events_path, lk, 0, CFG)
        lk.mark_epoch_done(0)
        gen = follow_changes(lk, poll_interval=0.05, max_idle_polls=3)
        lo, hi, t0 = next(gen)
        assert (lo, hi) == (-1, 0)
        assert set(t0["epoch"].to_pylist()) == {0}
        # epoch 1 commits but is NOT done yet → the tail must not emit it
        ingest_epoch(events_path, lk, 1, CFG)
        # (no done marker) — generator should hit idle-stop without yield
        leftovers = list(gen)
        assert leftovers == []
        # mark done; a resumed tail (since=0) picks up exactly epoch 1+2
        lk.mark_epoch_done(1)
        ingest_epoch(events_path, lk, 2, CFG)
        lk.mark_epoch_done(2)
        gen2 = follow_changes(lk, since=0, poll_interval=0.05,
                              max_idle_polls=3)
        windows = list(gen2)
        assert len(windows) == 1
        lo2, hi2, t12 = windows[0]
        assert (lo2, hi2) == (0, 2)
        tailed = pa.concat_tables([t0, t12])
        bulk = _feed(lk)
        assert tailed.num_rows == bulk.num_rows
        assert sorted(zip(tailed["epoch"].to_pylist(),
                          tailed["url"].to_pylist())) == \
            sorted(zip(bulk["epoch"].to_pylist(), bulk["url"].to_pylist()))

    def test_named_consumer_offsets(self, events_path, tmp_path):
        """Consumer groups: a named consumer's offset persists only after
        its loop RESUMES the generator (the window was processed), so a
        crash mid-window redelivers exactly that window; independent names
        hold independent offsets."""
        from opendataloader_pdf_ray.cdc.changefeed import follow_changes
        from opendataloader_pdf_ray.cdc.ingest import ingest_epoch

        lk = Lake(str(tmp_path / "lake"), CFG.num_partitions)
        ingest_epoch(events_path, lk, 0, CFG)
        lk.mark_epoch_done(0)
        # consumer crashes after RECEIVING the window but before finishing
        # it: close() skips the post-yield persist → offset not advanced
        gen = follow_changes(lk, poll_interval=0.05, max_idle_polls=3,
                             consumer="c1")
        lo, hi, _ = next(gen)
        assert (lo, hi) == (-1, 0)
        gen.close()
        # restart: the window REDELIVERS, and draining the generator
        # (resume past the yield) persists the offset
        wins = list(follow_changes(lk, poll_interval=0.05,
                                   max_idle_polls=3, consumer="c1"))
        assert [(w[0], w[1]) for w in wins] == [(-1, 0)]
        # third start: offset holds, nothing redelivers
        assert list(follow_changes(lk, poll_interval=0.05,
                                   max_idle_polls=3, consumer="c1")) == []
        # a different consumer name starts from the beginning
        wins_c2 = list(follow_changes(lk, poll_interval=0.05,
                                      max_idle_polls=3, consumer="c2"))
        assert [(w[0], w[1]) for w in wins_c2] == [(-1, 0)]
        # explicit since overrides the stored offset
        lk_more = ingest_epoch(events_path, lk, 1, CFG)
        lk.mark_epoch_done(1)
        wins2 = list(follow_changes(lk, since=-1, poll_interval=0.05,
                                    max_idle_polls=3, consumer="c1",
                                    use_offset=False))
        assert [(w[0], w[1]) for w in wins2] == [(-1, 1)]

    def test_follow_cli_consumer_flag(self, events_path, tmp_path, capsys):
        import json as _json
        import os

        from opendataloader_pdf_ray.__main__ import main
        from opendataloader_pdf_ray.cdc.ingest import ingest_epoch

        lk = Lake(str(tmp_path / "lake"), CFG.num_partitions)
        ingest_epoch(events_path, lk, 0, CFG)
        lk.mark_epoch_done(0)
        out = str(tmp_path / "feed")
        assert main(["changes", str(tmp_path / "lake"), "--follow",
                     "--out", out, "--idle-stop", "2", "--consumer",
                     "cli1"]) == 0
        rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["windows_written"] == 1
        # output dir wiped, but the consumer offset is authoritative:
        # nothing redelivers
        for f in os.listdir(out):
            os.remove(os.path.join(out, f))
        assert main(["changes", str(tmp_path / "lake"), "--follow",
                     "--out", out, "--idle-stop", "2", "--consumer",
                     "cli1"]) == 0
        rep2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep2["windows_written"] == 0 and os.listdir(out) == []

    def test_follow_cli_resumes_from_output(self, events_path, tmp_path,
                                            capsys):
        import json as _json
        import os

        from opendataloader_pdf_ray.__main__ import main
        from opendataloader_pdf_ray.cdc.ingest import ingest_epoch

        lk = Lake(str(tmp_path / "lake"), CFG.num_partitions)
        for e in (0, 1):
            ingest_epoch(events_path, lk, e, CFG)
            lk.mark_epoch_done(e)
        out = str(tmp_path / "feed")
        assert main(["changes", str(tmp_path / "lake"), "--follow",
                     "--out", out, "--idle-stop", "2",
                     "--poll-interval", "0.05"]) == 0
        rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["windows_written"] == 1
        files = sorted(os.listdir(out))
        assert files == ["feed-0-1.parquet"]
        # third epoch lands; a re-run writes ONLY the new window
        ingest_epoch(events_path, lk, 2, CFG)
        lk.mark_epoch_done(2)
        assert main(["changes", str(tmp_path / "lake"), "--follow",
                     "--out", out, "--idle-stop", "2",
                     "--poll-interval", "0.05"]) == 0
        rep2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep2["windows_written"] == 1
        assert sorted(os.listdir(out)) == ["feed-0-1.parquet",
                                           "feed-2-2.parquet"]

    def test_no_op_delete_not_emitted(self, tmp_path):
        lk = Lake(str(tmp_path / "noop"), 1)
        t0 = pa.table({"url": ["a"], "warc_ts": pa.array([1], pa.int64()),
                       "seq": pa.array([0], pa.int64()),
                       "deleted": [False], "text": ["x"]})
        # epoch 1 deletes "b" which never existed — a no-op for consumers
        t1 = pa.table({"url": ["b"], "warc_ts": pa.array([2], pa.int64()),
                       "seq": pa.array([1], pa.int64()),
                       "deleted": [True], "text": [None]})
        lin = lambda e: Lineage(part=0, epoch=e, events_consumed=1,
                                rows_upserted=1, rows_deleted=0,
                                seq_min=0, seq_max=0)
        lk.commit_delta(0, 0, t0, lin(0))
        lk.commit_delta(0, 1, t1, lin(1))
        feed = _feed(lk)
        assert feed.num_rows == 1
        assert feed["op"].to_pylist() == ["insert"]


class TestConsumerLag:
    def test_list_consumers_lag(self, tmp_path):
        """stats surface: offsets + lag vs the feed head (no Ray needed —
        Lake-level delta commits + epoch-done markers)."""
        import pyarrow as pa

        from opendataloader_pdf_ray.cdc.changefeed import (
            feed_head, list_consumers, store_consumer_offset)
        from opendataloader_pdf_ray.cdc.lake import Lineage

        lk = Lake(str(tmp_path / "lake"), 1)
        assert feed_head(lk) == -1 and list_consumers(lk) == {}
        for e in range(3):
            lk.commit_delta(0, e, pa.table({
                "url": [f"u{e}"], "warc_ts": pa.array([e], pa.int64()),
                "seq": pa.array([e], pa.int64()), "deleted": [False]}),
                Lineage(part=0, epoch=e, events_consumed=1, rows_upserted=1,
                        rows_deleted=0, seq_min=e, seq_max=e))
            lk.mark_epoch_done(e)
        assert feed_head(lk) == 2
        store_consumer_offset(lk, "fast", 2)
        store_consumer_offset(lk, "slow", 0)
        got = list_consumers(lk)
        assert got["fast"] == {"offset": 2, "feed_head": 2, "lag_epochs": 0}
        assert got["slow"] == {"offset": 0, "feed_head": 2, "lag_epochs": 2}

    def test_stats_cli_reports_consumers(self, tmp_path, capsys):
        import json as _json

        import pyarrow as pa

        from opendataloader_pdf_ray.__main__ import main
        from opendataloader_pdf_ray.cdc.changefeed import store_consumer_offset
        from opendataloader_pdf_ray.cdc.lake import Lineage

        lk = Lake(str(tmp_path / "lake"), 1)
        lk.commit_delta(0, 0, pa.table({
            "url": ["u"], "warc_ts": pa.array([0], pa.int64()),
            "seq": pa.array([0], pa.int64()), "deleted": [False]}),
            Lineage(part=0, epoch=0, events_consumed=1, rows_upserted=1,
                    rows_deleted=0, seq_min=0, seq_max=0))
        lk.mark_epoch_done(0)
        store_consumer_offset(lk, "c", 0)
        assert main(["stats", str(tmp_path / "lake")]) == 0
        rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["consumers"]["c"]["lag_epochs"] == 0


class TestBeforeImage:
    def test_before_images(self, tmp_path):
        """Debezium-style before values: null on insert, pre-image LIVE
        value on update/delete, null on reinsert-after-tombstone; unknown
        column rejected."""
        import pyarrow as pa
        import pytest as _pytest

        from opendataloader_pdf_ray.cdc.lake import Lineage

        lk = Lake(str(tmp_path / "lake"), 1)

        def ep(e, rows):
            t = pa.table({
                "url": pa.array([r[0] for r in rows], pa.string()),
                "warc_ts": pa.array([r[1] for r in rows], pa.int64()),
                "seq": pa.array([r[1] for r in rows], pa.int64()),
                "deleted": pa.array([r[2] for r in rows], pa.bool_()),
                "text": pa.array([r[3] for r in rows], pa.string()),
            })
            lk.commit_delta(0, e, t, Lineage(
                part=0, epoch=e, events_consumed=len(rows),
                rows_upserted=len(rows), rows_deleted=0,
                seq_min=rows[0][1], seq_max=rows[-1][1]))

        ep(0, [("a", 1, False, "A1"), ("b", 2, False, "B1")])
        ep(1, [("a", 3, False, "A2"), ("b", 4, True, None)])
        ep(2, [("b", 5, False, "B2")])  # reinsert after tombstone
        feed = lk.changes(before=["text"]).sort(["epoch", "url"])
        rows = [(r["epoch"], r["op"], r["url"], r["before_text"])
                for r in feed.take_all()]  # 5 rows — bounded
        assert rows == [
            (0, "insert", "a", None), (0, "insert", "b", None),
            (1, "update", "a", "A1"), (1, "delete", "b", "B1"),
            (2, "insert", "b", None),
        ]
        with _pytest.raises(ValueError, match="nope"):
            lk.changes(before=["nope"]).take_all()


@pytest.mark.usefixtures("ray_session")
class TestEventTimeWindow:
    """min_ts/max_ts: row-level window semantics + zone-map pruning
    (commit-record ts_range written by every commit; partitions with no
    overlapping epoch are skipped without opening any data file)."""

    def test_window_equals_posthoc_filter(self, lake):
        full = _feed(lake)
        ts = full["warc_ts"].cast(pa.int64())
        lo = int(pc.quantile(ts, q=0.25)[0].as_py())
        hi = int(pc.quantile(ts, q=0.75)[0].as_py())
        want = full.filter(pc.and_(
            pc.greater_equal(full["warc_ts"].cast(pa.int64()), lo),
            pc.less_equal(full["warc_ts"].cast(pa.int64()), hi)))
        got = _feed(lake, min_ts=lo, max_ts=hi)
        assert got.equals(want)

    def test_commit_records_carry_ts_range(self, lake):
        for part in range(CFG.num_partitions):
            for e in lake.committed_epochs(part):
                rng = lake._read_commit(part, e).get("ts_range")
                assert rng is not None and rng[0] <= rng[1]

    def test_pruned_partition_never_opens_files(self, lake, tmp_path):
        """A window PROVABLY outside every epoch's ts_range reads nothing:
        destroy every data file — the pruned feed still succeeds (and is
        empty), while an unpruned feed over the same lake raises."""
        import os
        import shutil

        from opendataloader_pdf_ray.cdc.changefeed import _FeedPartition

        clone = str(tmp_path / "clone")
        shutil.copytree(lake.root, clone)
        lk = Lake(clone, CFG.num_partitions)
        # destroy partition 0's data files — commits stay, ts_range stays
        for name in os.listdir(lk._part_dir(0)):
            if name.endswith(".parquet"):
                os.unlink(os.path.join(lk._part_dir(0), name))
        target = pa.schema([("url", pa.string()),
                            ("warc_ts", pa.timestamp("us")),
                            ("seq", pa.int64()),
                            ("deleted", pa.bool_())])
        # pruned: the zone maps prove no overlap → no file opened → empty
        pruned = _FeedPartition(lk.root, CFG.num_partitions, -1, None,
                                target, min_ts=1, max_ts=2)
        assert pruned._feed_one(lk, 0) == []
        # unpruned: the same walk must open the (gone) files and raise
        unpruned = _FeedPartition(lk.root, CFG.num_partitions, -1, None,
                                  target)
        with pytest.raises(Exception, match="vacuumed|neither"):
            unpruned._feed_one(lk, 0)

    def test_prefix_epochs_folded_not_walked(self, lake, tmp_path):
        """Epochs before the first overlapping one enter via ONE
        merge-on-read pre-image; on a compacted lake the window feed does
        not open the pruned history deltas at all."""
        import os
        import shutil

        full = _feed(lake)
        # lo = just above every epoch-0/1 commit's ts_range, so epochs 0/1
        # are PROVABLY outside the window on every partition (event times
        # are out-of-order across epochs in this fixture, so deriving lo
        # from the zone maps, not the feed, is what guarantees pruning)
        lo_us = 1 + max(
            lake._read_commit(p, e)["ts_range"][1]
            for p in range(CFG.num_partitions)
            for e in lake.committed_epochs(p) if e < 2)
        if not any(lake._read_commit(p, 2).get("ts_range", [0, -1])[1]
                   >= lo_us for p in range(CFG.num_partitions)
                   if 2 in lake.committed_epochs(p)):
            pytest.skip("epoch 2 has no events above the 0/1 ranges")

        clone = str(tmp_path / "clone2")
        shutil.copytree(lake.root, clone)
        lk = Lake(clone, CFG.num_partitions)
        # historical snapshot at epoch 1 (as if compact ran then): the
        # windowed feed's one pre-image read (as_of = e0-1 = 1) folds from
        # it, so the pruned-prefix DELTA files are never opened —
        for part in range(CFG.num_partitions):
            state = lk.read_partition(part, as_of=1)
            if state is not None:
                lk._write_table_atomic(state, lk._data_path(part, 1))
        # — which deleting them proves:
        for part in range(CFG.num_partitions):
            for name in os.listdir(lk._part_dir(part)):
                if name.startswith("delta=") and name.endswith(".parquet") \
                        and int(name[6:-8].split(".")[0]) < 2:
                    os.unlink(os.path.join(lk._part_dir(part), name))
        got = _feed(lk, min_ts=lo_us)
        want = full.filter(pc.greater_equal(
            full["warc_ts"].cast(pa.int64()), lo_us))
        assert got.equals(want)


@pytest.mark.usefixtures("ray_session")
class TestOutOfOrderLoser:
    """A cross-epoch out-of-order event that LOSES LWW leaves the lake's
    live state untouched — so it must emit NOTHING: not a change-feed row
    (a consumer folding the feed would otherwise end on the stale value)
    and not a follower-index retract/apply (the index would otherwise
    serve the stale value). Found by hypothesis (test_fuzz_lake)."""

    def _lake(self, tmp_path):
        from opendataloader_pdf_ray.cdc import url_partition
        from opendataloader_pdf_ray.cdc.lake import Lineage

        lake = Lake(str(tmp_path / "lake"), 2)

        def ep(e, rows):
            urls = [r[0] for r in rows]
            parts = url_partition(urls, 2)
            t = pa.table({
                "url": pa.array(urls),
                "warc_ts": pa.array([r[1] for r in rows], pa.int64()),
                "seq": pa.array([r[2] for r in rows], pa.int64()),
                "deleted": pa.array([r[3] for r in rows]),
                "text": pa.array([r[4] for r in rows], pa.string()),
            })
            for p in (0, 1):
                sub = t.filter(pa.array(parts == p))
                if sub.num_rows:
                    lake.commit_delta(p, e, sub, Lineage(
                        part=p, epoch=e, events_consumed=sub.num_rows,
                        rows_upserted=sub.num_rows, rows_deleted=0,
                        seq_min=0, seq_max=1))
            lake.mark_epoch_done(e)

        ep(0, [("a", 10, 0, False, "current"), ("b", 10, 1, False, "bee")])
        # epoch 1: a's STALE late event (loses LWW), b's real update (wins)
        ep(1, [("a", 5, 2, False, "STALE"), ("b", 20, 3, False, "bee v2")])
        return lake

    def test_feed_drops_lww_losers(self, tmp_path):
        lake = self._lake(tmp_path)
        assert lake.read_state().sort_by("url")["text"].to_pylist() == \
            ["current", "bee v2"]
        feed = _feed(lake)
        rows = [(r["epoch"], r["op"], r["url"], r["text"])
                for r in feed.to_pylist()]
        assert rows == [(0, "insert", "a", "current"),
                        (0, "insert", "b", "bee"),
                        (1, "update", "b", "bee v2")]
        # consumer replay (last feed row per url) == live state
        last = {u: t for _, _, u, t in rows}
        assert last == {"a": "current", "b": "bee v2"}

    def test_follower_index_drops_lww_losers(self, tmp_path):
        from opendataloader_pdf_ray.cdc import TextIndex

        from test_textindex import live_postings

        lake = self._lake(tmp_path)
        idx = TextIndex(str(tmp_path / "ti"), num_partitions=4)
        idx.refresh(lake)
        assert live_postings(idx) == [
            ("bee", "b"), ("current", "a"), ("v2", "b")]
