"""Property tests for the lake-maintenance layer: random multi-epoch churn
(inserts / updates / deletes / out-of-order versions) must satisfy

- restore(target) live state == read_state(as_of=target) live state, for
  EVERY target (the Delta-RESTORE contract, cdc/restore.py);
- RangeIndex.scan_range(lo, hi) == brute-force filter of the live state,
  for random inclusive bounds (cdc/rangeindex.py);
- commit ts_range zone maps bound every row of their file.

These run the REAL commit/merge/restore/index machinery in-process (no Ray
Dataset — the distributed paths are gated by the integration tests; the
property layer targets the FOLD algebra, which is what hypothesis shrinks
well).
"""

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from opendataloader_pdf_ray.cdc import Lake, url_partition
from opendataloader_pdf_ray.cdc.lake import Lineage
from opendataloader_pdf_ray.cdc.merge import live_view

P = 4
N_URLS = 12


# one epoch = a list of (url_idx, version, deleted, value)
def _epoch_strategy():
    return st.lists(
        st.tuples(st.integers(0, N_URLS - 1),       # url
                  st.integers(0, 50),               # version (warc_ts)
                  st.booleans(),                    # delete?
                  st.integers(-1000, 1000)),        # payload value
        min_size=1, max_size=10, unique_by=lambda t: t[0])


churn = st.lists(_epoch_strategy(), min_size=2, max_size=5)


def _build(tmpdir, epochs) -> Lake:
    lake = Lake(str(tmpdir), P)
    seq = 0
    for e, rows in enumerate(epochs):
        urls = [f"u{i:03d}" for i, *_ in rows]
        parts = url_partition(urls, P)
        t = pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array([v for _, v, _, _ in rows], pa.int64()),
            "seq": pa.array(list(range(seq, seq + len(rows))), pa.int64()),
            "deleted": pa.array([d for _, _, d, _ in rows]),
            "score": pa.array(
                [None if d else val for _, _, d, val in rows], pa.int64()),
        })
        seq += len(rows)
        for p in range(P):
            import numpy as np

            sub = t.filter(pa.array(parts == p)).sort_by(
                [("url", "ascending")])
            if not sub.num_rows:
                continue
            seqs = sub["seq"].to_pylist()
            lake.commit_delta(p, e, sub, Lineage(
                part=p, epoch=e, events_consumed=sub.num_rows,
                rows_upserted=sub.num_rows, rows_deleted=0,
                seq_min=min(seqs), seq_max=max(seqs)))
        lake.mark_epoch_done(e)
    return lake


def _live_map(state: pa.Table) -> dict:
    return {r["url"]: (r["warc_ts"], r["seq"], r["score"])
            for r in live_view(state).to_pylist()}


class TestRestoreProperty:
    @given(churn, st.data())
    @settings(max_examples=25, deadline=None)
    def test_restore_equals_as_of(self, tmp_path_factory, epochs, data):
        from opendataloader_pdf_ray.cdc.restore import _RestorePartition
        from opendataloader_pdf_ray.cdc.backfill import (
            resolve_backfill_epoch)

        root = tmp_path_factory.mktemp("fz")
        lake = _build(root, epochs)
        target = data.draw(st.integers(0, len(epochs) - 2))
        want = _live_map(lake.read_state(as_of=target,
                                         include_tombstones=True))
        epoch = resolve_backfill_epoch(lake, f"restore:{target}")
        task = _RestorePartition(lake.root, P, epoch, target)
        for p in range(P):
            task(pa.table({"part": pa.array([p], pa.int32())}))
        got = _live_map(lake.read_state(include_tombstones=True))
        assert got == want
        # time travel across the restore: every pre-restore epoch intact
        for e in range(len(epochs)):
            assert lake.read_state(as_of=e) is not None

    @given(churn)
    @settings(max_examples=15, deadline=None)
    def test_ts_range_bounds_every_row(self, tmp_path_factory, epochs):
        import pyarrow.parquet as pq

        root = tmp_path_factory.mktemp("fz")
        lake = _build(root, epochs)
        for p in range(P):
            for e in lake.committed_epochs(p):
                rng = lake._read_commit(p, e).get("ts_range")
                res = lake.resolve_data(p, e, "delta")
                if res is None or rng is None:
                    continue
                t = pq.read_table(res[1], filesystem=res[0])
                ts = t["warc_ts"].to_pylist()
                assert rng[0] == min(ts) and rng[1] == max(ts)


class TestRangeIndexProperty:
    @given(churn, st.data())
    @settings(max_examples=20, deadline=None)
    def test_scan_equals_brute_force(self, tmp_path_factory, epochs, data):
        from opendataloader_pdf_ray.cdc.rangeindex import (RangeIndex,
                                                           range_index_root)

        root = tmp_path_factory.mktemp("fz")
        lake = _build(root, epochs)
        idx = RangeIndex(range_index_root(lake.root, "score"), 4,
                         col="score", width=data.draw(st.integers(1, 300)))
        idx.refresh(lake)
        lo = data.draw(st.integers(-1100, 1100))
        hi = data.draw(st.integers(lo, 1100))
        got = sorted((r["key"], r["val"]) for r in
                     idx.scan_range_local(lo, hi).to_pylist())
        live = _live_map(lake.read_state(include_tombstones=True))
        want = sorted((u, s) for u, (_, _, s) in live.items()
                      if s is not None and lo <= s <= hi)
        assert got == want


class TestFeedFoldProperty:
    @given(churn)
    @settings(max_examples=20, deadline=None)
    def test_feed_fold_equals_live_state(self, tmp_path_factory, epochs):
        """Consumer-side replay guarantee under arbitrary churn (incl.
        out-of-order losers): folding the change feed per url — last row
        wins — reproduces the live state exactly; urls that end tombstoned
        end with op=delete; no feed row ever carries a value the live
        state never held at that point."""
        from opendataloader_pdf_ray.cdc.changefeed import _FeedPartition

        root = tmp_path_factory.mktemp("fz")
        lake = _build(root, epochs)
        target = pa.schema([("url", pa.string()),
                            ("warc_ts", pa.int64()),
                            ("seq", pa.int64()),
                            ("deleted", pa.bool_()),
                            ("score", pa.int64())])
        fp = _FeedPartition(lake.root, P, -1, None, target)
        rows = []
        for p in range(P):
            for t in fp._feed_one(lake, p):
                rows.extend(t.to_pylist())
        rows.sort(key=lambda r: (r["epoch"], r["url"]))
        last = {}
        for r in rows:
            last[r["url"]] = r
        live = _live_map(lake.read_state(include_tombstones=True))
        feed_live = {u: (r["warc_ts"], r["seq"], r["score"])
                     for u, r in last.items() if r["op"] != "delete"}
        assert feed_live == live
        for u, r in last.items():
            if u not in live:
                assert r["op"] == "delete", u


class TestColumnIndexProperty:
    @given(churn, st.data())
    @settings(max_examples=15, deadline=None)
    def test_scan_equals_brute_force(self, tmp_path_factory, epochs, data):
        from opendataloader_pdf_ray.cdc.colindex import (ColumnIndex,
                                                         col_index_root)

        root = tmp_path_factory.mktemp("fz")
        lake = _build(root, epochs)
        idx = ColumnIndex(col_index_root(lake.root, "score"), 4,
                          col="score")
        idx.refresh(lake)
        probe = data.draw(st.lists(st.integers(-1000, 1000), min_size=1,
                                   max_size=4))
        got = sorted((r["val"], r["key"]) for r in
                     idx.scan_local([str(v) for v in probe]).to_pylist())
        live = _live_map(lake.read_state(include_tombstones=True))
        want = sorted((str(s), u) for u, (_, _, s) in live.items()
                      if s is not None and s in set(probe))
        assert got == want


class TestReplicateProperty:
    @given(churn)
    @settings(max_examples=15, deadline=None)
    def test_replica_equals_source(self, tmp_path_factory, epochs):
        """Epoch-aligned replication under arbitrary churn: the replica's
        live state AND every as_of state equal the source's."""
        from opendataloader_pdf_ray.cdc.replicate import (
            _replicate_partition)

        root = tmp_path_factory.mktemp("fz")
        lake = _build(root / "src", epochs)
        dst = Lake(str(root / "dst"), P)
        for p in range(P):
            _replicate_partition(lake, dst, p, None)
        for e in list(range(len(epochs))) + [None]:
            a = _live_map(lake.read_state(as_of=e, include_tombstones=True))
            b = _live_map(dst.read_state(as_of=e, include_tombstones=True))
            assert a == b, f"as_of={e}"


class TestTextIndexProperty:
    @given(churn)
    @settings(max_examples=12, deadline=None)
    def test_postings_equal_brute_tokens(self, tmp_path_factory, epochs):
        """Inverted-index live postings == brute-force token sets over the
        live text, under arbitrary churn (value here doubles as a tiny
        text: 'w<value>')."""
        from opendataloader_pdf_ray.cdc import Lake as _Lake
        from opendataloader_pdf_ray.cdc.textindex import TextIndex

        root = tmp_path_factory.mktemp("fz")
        lake = _build(root, epochs)
        # give the lake a text column derived from score (deterministic)
        import pyarrow.parquet as pq

        for p in range(P):
            for e in lake.committed_epochs(p):
                res = lake.resolve_data(p, e, "delta")
                t = pq.read_table(res[1], filesystem=lake.fs)
                txt = [None if s is None else f"w{abs(s)} common"
                       for s in t["score"].to_pylist()]
                t = t.append_column("text", pa.array(txt, pa.string()))
                lake._write_table_atomic(t, res[1])
        idx = TextIndex(str(root / "ti"), num_partitions=4)
        idx.refresh(lake)
        got = sorted((r["tok"], r["key"])
                     for r in idx.read_state().to_pylist())
        live = _live_map(lake.read_state(include_tombstones=True))
        want = sorted({(tok, u) for u, (_, _, s) in live.items()
                       if s is not None
                       for tok in (f"w{abs(s)}", "common")})
        assert got == want


class TestWindowedFeedProperty:
    @given(churn, st.data())
    @settings(max_examples=15, deadline=None)
    def test_window_equals_posthoc_filter(self, tmp_path_factory, epochs,
                                          data):
        from opendataloader_pdf_ray.cdc.changefeed import _FeedPartition

        root = tmp_path_factory.mktemp("fz")
        lake = _build(root, epochs)
        target = pa.schema([("url", pa.string()),
                            ("warc_ts", pa.int64()),
                            ("seq", pa.int64()),
                            ("deleted", pa.bool_()),
                            ("score", pa.int64())])
        lo = data.draw(st.integers(-5, 55))
        hi = data.draw(st.integers(lo, 55))

        def rows(fp):
            out = []
            for p in range(P):
                for t in fp._feed_one(lake, p):
                    out.extend(t.to_pylist())
            return sorted(((r["epoch"], r["url"], r["op"], r["warc_ts"])
                           for r in out))

        full = rows(_FeedPartition(lake.root, P, -1, None, target))
        win = rows(_FeedPartition(lake.root, P, -1, None, target,
                                  min_ts=lo, max_ts=hi))
        assert win == [r for r in full if lo <= r[3] <= hi]


class TestIngestProperty:
    """North-star invariant, fuzzed: for ARBITRARY change-event logs
    (random ops, random out-of-order versions) replayed through the real
    distributed engine at ARBITRARY epoch chunking, the lake's final state
    equals the single-threaded oracle byte-for-byte — including extracted
    text."""

    events_strategy = st.lists(
        st.tuples(st.integers(0, 4),              # url
                  st.sampled_from("IUD"),         # op
                  st.integers(0, 30),             # warc_ts (collisions ok)
                  st.integers(0, 9)),             # html revision
        min_size=3, max_size=18)

    @given(events_strategy, st.sampled_from([3, 7, 10_000]))
    @settings(max_examples=8, deadline=None)
    def test_replay_matches_oracle(self, tmp_path_factory, raw, epoch_size):
        import pyarrow.parquet as pq

        from opendataloader_pdf_ray.cdc import Lake, oracle_final_state, \
            replay
        from opendataloader_pdf_ray.config import CDCConfig
        from opendataloader_pdf_ray.fixtures.gen import render_html

        root = tmp_path_factory.mktemp("fz")
        events = pa.table({
            "seq": pa.array(range(len(raw)), pa.int64()),
            "op": pa.array([op for _, op, _, _ in raw], pa.string()),
            "url": pa.array([f"https://fz.example/{u}" for u, *_ in raw],
                            pa.string()),
            "warc_ts": pa.array([ts for _, _, ts, _ in raw],
                                pa.int64()).cast(pa.timestamp("us")),
            "html": pa.array(
                [None if op == "D" else
                 render_html(f"https://fz.example/{u}", rev)
                 for u, op, _, rev in raw], pa.binary()),
            "lang": pa.array(["en"] * len(raw), pa.string()),
        })
        path = str(root / "events.parquet")
        pq.write_table(events, path)
        cfg = CDCConfig(num_partitions=4, num_salts=2,
                        epoch_size=epoch_size, extract_batch_size=8,
                        extract_concurrency=2)
        lake = Lake(str(root / "lake"), cfg.num_partitions)
        replay(path, lake.root, cfg)
        oracle = oracle_final_state(events)
        got = {r["url"]: r for r in
               lake.read_state(include_tombstones=True).to_pylist()}
        assert set(got) == set(oracle)
        for url, want in oracle.items():
            assert got[url]["deleted"] == want["deleted"], url
            assert got[url]["seq"] == want["seq"], url
            assert got[url]["text"] == want["text"], url


class TestZoneMapProperty:
    @given(churn, st.data())
    @settings(max_examples=20, deadline=None)
    def test_pruned_scan_equals_brute_force(self, tmp_path_factory, epochs,
                                            data):
        """Zone-map partition pruning is SOUND under any churn: folding
        only the overlapping partitions and filtering exactly equals the
        brute-force filter of the whole live state."""
        root = tmp_path_factory.mktemp("fz")
        lake = _build(root, epochs)
        lo = data.draw(st.integers(-1100, 1100))
        hi = data.draw(st.integers(lo, 1100))
        keep = set(lake.parts_overlapping_range("score", lo, hi))
        got = []
        for p in keep:
            t = lake.read_partition(p)
            if t is None:
                continue
            for r in live_view(t).to_pylist():
                if r["score"] is not None and lo <= r["score"] <= hi:
                    got.append((r["url"], r["score"]))
        live = _live_map(lake.read_state(include_tombstones=True))
        want = sorted((u, s) for u, (_, _, s) in live.items()
                      if s is not None and lo <= s <= hi)
        assert sorted(got) == want

    @given(churn)
    @settings(max_examples=15, deadline=None)
    def test_zone_map_bounds_every_live_row(self, tmp_path_factory, epochs):
        """Every commit's zone map bounds every LIVE row of its file, and
        all-tombstone commits write the explicit empty dict."""
        import pyarrow.parquet as pq

        root = tmp_path_factory.mktemp("fz")
        lake = _build(root, epochs)
        for p in range(P):
            for e in lake.committed_epochs(p):
                zm = lake._read_commit(p, e).get("zone_maps")
                assert zm is not None  # post-feature: key always present
                res = lake.resolve_data(p, e, "delta")
                if res is None:
                    continue
                t = live_view(pq.read_table(res[1], filesystem=res[0]))
                vals = [v for v in t["score"].to_pylist() if v is not None]
                if not vals:
                    assert "score" not in zm
                else:
                    assert zm["score"][0] == min(vals)
                    assert zm["score"][1] == max(vals)
