"""Event-time temporal join (cdc/temporal.py): as-of enrichment of one
lake's change feed with another lake's version timeline — inclusive
backward match, tombstone → NULL, same-ts max-seq tie rule, co-partition
requirement, feed windows, snapshot≡delta dim sources, and a brute-force
oracle over randomized two-lake histories."""

import numpy as np
import pyarrow as pa
import pytest

from opendataloader_pdf_ray.cdc.ingest import url_partition
from opendataloader_pdf_ray.cdc.lake import Lake, Lineage
from opendataloader_pdf_ray.cdc.temporal import temporal_join

P = 4


def _commit(lake, epoch, rows, mode="delta"):
    """rows: list of (url, warc_ts, seq, value_or_None_for_tombstone).
    Groups by partition and commits one delta (or snapshot-diff-equivalent
    full merge) per (part, epoch)."""
    import pyarrow.compute as pc

    urls = [r[0] for r in rows]
    t = pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array([r[1] for r in rows], pa.int64()),
        "seq": pa.array([r[2] for r in rows], pa.int64()),
        "tag": pa.array([r[3] for r in rows], pa.string()),
        "deleted": pa.array([r[3] is None for r in rows], pa.bool_()),
    })
    parts = np.asarray(url_partition(urls, lake.num_partitions))
    for part in range(lake.num_partitions):
        sub = t.filter(pa.array(parts == part))
        if sub.num_rows == 0:
            continue
        sub = sub.sort_by([("url", "ascending")])
        seqs = sub["seq"].to_pylist()
        lin = Lineage(part=part, epoch=epoch,
                      events_consumed=sub.num_rows,
                      rows_upserted=sub.num_rows, rows_deleted=0,
                      seq_min=min(seqs), seq_max=max(seqs))
        if mode == "delta":
            lake.commit_delta(part, epoch, sub, lin)
        else:
            from opendataloader_pdf_ray.cdc.merge import (
                merge_base_with_updates)
            base = lake.read_partition(part, as_of=epoch - 1)
            lake.commit_partition(part, epoch,
                                  merge_base_with_updates(base, sub), lin)


def _join_rows(src, dim, **kw):
    ds = temporal_join(src, dim, **kw)
    tabs = [b for b in ds.iter_batches(batch_format="pyarrow")
            if b.num_rows]
    if not tabs:
        return []
    t = pa.concat_tables(tabs).sort_by(
        [("epoch", "ascending"), ("url", "ascending"),
         ("seq", "ascending")])
    return t.to_pylist()


def _brute_asof(dim_versions, url, ts):
    """Naive oracle: the max-(warc_ts, seq) dim version with warc_ts <= ts
    for this url; None if none or it is a tombstone."""
    cand = [v for v in dim_versions if v[0] == url and v[1] <= ts]
    if not cand:
        return None
    best = max(cand, key=lambda v: (v[1], v[2]))
    return best[3]  # None when tombstone


@pytest.mark.usefixtures("ray_session")
class TestTemporalJoin:
    def _pair(self, tmp_path, dim_mode="delta"):
        src = Lake(str(tmp_path / "src"), P)
        dim = Lake(str(tmp_path / "dim"), P)
        # dim timeline per url: v=a @10, v=b @50, tombstone @80
        dim_rows0 = [(f"u{i}", 10 + i * 100, i, "a") for i in range(8)]
        dim_rows1 = [(f"u{i}", 50 + i * 100, 100 + i, "b")
                     for i in range(8) if i % 2 == 0]
        dim_rows2 = [(f"u{i}", 80 + i * 100, 200 + i, None)
                     for i in range(8) if i % 3 == 0]
        _commit(dim, 0, dim_rows0, dim_mode)
        _commit(dim, 1, dim_rows1, dim_mode)
        _commit(dim, 2, dim_rows2, dim_mode)
        # src events at offsets 5 (before any version), 30 (sees a),
        # 60 (sees b where updated else a), 90 (null where tombstoned)
        src_rows0 = [(f"u{i}", 5 + i * 100, i, f"s0-{i}") for i in range(8)]
        src_rows1 = [(f"u{i}", 30 + i * 100, 100 + i, f"s1-{i}")
                     for i in range(8)]
        src_rows2 = [(f"u{i}", 60 + i * 100, 200 + i, f"s2-{i}")
                     for i in range(8)]
        src_rows3 = [(f"u{i}", 90 + i * 100, 300 + i, f"s3-{i}")
                     for i in range(4)]
        _commit(src, 0, src_rows0)
        _commit(src, 1, src_rows1)
        _commit(src, 2, src_rows2)
        _commit(src, 3, src_rows3)
        dim_versions = ([(u, t, s, v) for u, t, s, v in dim_rows0] +
                        dim_rows1 + dim_rows2)
        return src, dim, dim_versions

    def test_asof_semantics_and_tombstones(self, tmp_path):
        src, dim, versions = self._pair(tmp_path)
        rows = _join_rows(src, dim, cols=["tag"])
        assert rows, "join emitted nothing"
        # one row per src change event
        assert len(rows) == 8 + 8 + 8 + 4
        for r in rows:
            want = _brute_asof(versions, r["url"], r["warc_ts"])
            assert r["dim_tag"] == want, (r, want)
        # spot-check the regimes explicitly
        by = {(r["url"], r["warc_ts"]): r["dim_tag"] for r in rows}
        assert by[("u1", 105)] is None          # before any dim version
        assert by[("u1", 130)] == "a"
        assert by[("u2", 260)] == "b"           # i%2==0 updated
        assert by[("u1", 160)] == "a"           # i%2!=0 not updated
        assert by[("u0", 90)] is None           # i%3==0 tombstoned @80
        assert by[("u1", 190)] == "a"           # not tombstoned

    def test_inclusive_boundary_and_same_ts_tie(self, tmp_path):
        src = Lake(str(tmp_path / "src"), P)
        dim = Lake(str(tmp_path / "dim"), P)
        # two dim versions at the SAME warc_ts — max seq wins
        _commit(dim, 0, [("k", 100, 1, "lo"), ("k", 100, 2, "hi")])
        _commit(src, 0, [("k", 100, 10, "e1"), ("k", 99, 11, "e0")])
        rows = _join_rows(src, dim, cols=["tag"])
        by = {r["warc_ts"]: r["dim_tag"] for r in rows}
        assert by[100] == "hi"   # inclusive: version at exactly event time
        assert by[99] is None

    def test_resurrect_after_tombstone(self, tmp_path):
        src = Lake(str(tmp_path / "src"), P)
        dim = Lake(str(tmp_path / "dim"), P)
        _commit(dim, 0, [("k", 10, 1, "a")])
        _commit(dim, 1, [("k", 20, 2, None)])
        _commit(dim, 2, [("k", 30, 3, "c")])
        _commit(src, 0, [("k", 15, 10, "x"), ("k", 25, 11, "y"),
                         ("k", 35, 12, "z")])
        rows = _join_rows(src, dim, cols=["tag"])
        by = {r["warc_ts"]: r["dim_tag"] for r in rows}
        assert by[15] == "a" and by[25] is None and by[35] == "c"

    def test_snapshot_dim_equals_delta_dim(self, tmp_path):
        src_a, dim_a, _ = self._pair(tmp_path / "a", dim_mode="delta")
        src_b, dim_b, _ = self._pair(tmp_path / "b", dim_mode="snap")
        ra = _join_rows(src_a, dim_a, cols=["tag"])
        rb = _join_rows(src_b, dim_b, cols=["tag"])
        assert ra == rb

    def test_feed_window_and_dim_until(self, tmp_path):
        src, dim, versions = self._pair(tmp_path)
        rows = _join_rows(src, dim, cols=["tag"], since=1)
        assert {r["epoch"] for r in rows} == {2, 3}
        # dim_until=0 freezes the dimension at its epoch-0 state: every
        # match that exists resolves to the 'a' version
        rows = _join_rows(src, dim, cols=["tag"], dim_until=0)
        assert {r["dim_tag"] for r in rows} <= {"a", None}
        assert "a" in {r["dim_tag"] for r in rows}

    def test_partition_mismatch_refused(self, tmp_path):
        src = Lake(str(tmp_path / "src"), P)
        dim = Lake(str(tmp_path / "dim"), P * 2)
        _commit(src, 0, [("k", 10, 1, "x")])
        _commit(dim, 0, [("k", 10, 1, "a")])
        with pytest.raises(ValueError, match="co-partitioned"):
            temporal_join(src, dim, cols=["tag"])

    def test_version_meta_cols_refused(self, tmp_path):
        src, dim, _ = self._pair(tmp_path)
        with pytest.raises(ValueError, match="version-key"):
            temporal_join(src, dim, cols=["warc_ts"])
        with pytest.raises(ValueError, match="not in the dim lake"):
            temporal_join(src, dim, cols=["nope"])

    def test_cli_temporal_join(self, tmp_path, capsys):
        import json

        from opendataloader_pdf_ray.__main__ import main

        src, dim, _ = self._pair(tmp_path)
        out = str(tmp_path / "joined")
        assert main(["temporal-join", src.root, dim.root,
                     "--cols", "tag", "--out", out]) == 0
        import pyarrow.parquet as pq

        t = pq.read_table(out)
        assert t.num_rows == 28
        assert "dim_tag" in t.column_names
        capsys.readouterr()
        assert main(["temporal-join", src.root, dim.root,
                     "--cols", "tag"]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["rows"] == 28 and len(rep["sample"]) == 5

    def test_randomized_vs_brute_oracle(self, tmp_path):
        rng = np.random.RandomState(7)
        src = Lake(str(tmp_path / "src"), P)
        dim = Lake(str(tmp_path / "dim"), P)
        urls = [f"w{i}" for i in range(12)]
        seq = 0
        dim_versions = []
        for e in range(4):
            rows = []
            for u in urls:
                if rng.rand() < 0.6:
                    ts = int(rng.randint(0, 1000))
                    val = None if rng.rand() < 0.25 else f"v{seq}"
                    rows.append((u, ts, seq, val))
                    seq += 1
            if rows:
                _commit(dim, e, rows)
                dim_versions.extend(rows)
        src_events = []
        for e in range(3):
            rows = []
            for u in urls:
                if rng.rand() < 0.7:
                    ts = int(rng.randint(0, 1000))
                    rows.append((u, ts, seq, f"s{seq}"))
                    seq += 1
            if rows:
                _commit(src, e, rows)
                src_events.extend(rows)
        rows = _join_rows(src, dim, cols=["tag"])
        assert len(rows) > 0
        # NOTE: the engine joins against versions that TOOK EFFECT (the
        # change-log discipline) — replicate that in the oracle: replay
        # dim commits in epoch order, keeping only rows that win the fold
        # at their commit time.
        effective = []
        state = {}  # url -> (warc_ts, seq); dim_versions is in epoch order
        for u, ts, s, v in dim_versions:
            cur = state.get(u)
            if cur is None or (ts, s) > cur:
                state[u] = (ts, s)
                effective.append((u, ts, s, v))
        for r in rows:
            want = _brute_asof(effective, r["url"], r["warc_ts"])
            assert r["dim_tag"] == want, (r, want)


def _collect_join(src, dim, **kw):
    from opendataloader_pdf_ray.cdc.temporal import temporal_join

    ds = temporal_join(src, dim, **kw)
    tabs = [b for b in ds.iter_batches(batch_format="pyarrow")
            if b.num_rows]
    if not tabs:
        return None
    return pa.concat_tables(tabs).sort_by(
        [("epoch", "ascending"), ("part", "ascending"),
         ("url", "ascending"), ("seq", "ascending")])


@pytest.mark.usefixtures("ray_session")
class TestFollowTemporalJoin:
    """Streaming temporal join (follow_temporal_join): processing-time vs
    aligned event-time contracts, window reproducibility via the recorded
    dim epoch, and the CLI tail with file-name resume."""

    def _base(self, tmp_path):
        src = Lake(str(tmp_path / "src"), P)
        dim = Lake(str(tmp_path / "dim"), P)
        _commit(dim, 0, [(f"u{i}", 10, i, "a") for i in range(6)])
        dim.mark_epoch_done(0)
        _commit(src, 0, [(f"u{i}", 20, 100 + i, f"s0-{i}")
                         for i in range(6)])
        src.mark_epoch_done(0)
        return src, dim

    def test_processing_time_windows_are_replayable(self, tmp_path):
        from opendataloader_pdf_ray.cdc.temporal import follow_temporal_join

        src, dim = self._base(tmp_path)
        wins = list(follow_temporal_join(src, dim, cols=["tag"],
                                         poll_interval=0.05,
                                         max_idle_polls=3))
        assert [(w[0], w[1], w[2]) for w in wins] == [(-1, 0, 0)]
        assert set(wins[0][3]["dim_tag"].to_pylist()) == {"a"}

        # dim later commits a RETROACTIVE first version for a new url at an
        # old event time, plus src emits epoch 1 touching it: the new
        # window sees it, the already-emitted window replays unchanged
        # from its recorded dim epoch.
        _commit(dim, 1, [("u9", 5, 50, "late")])
        dim.mark_epoch_done(1)
        _commit(src, 1, [("u9", 30, 200, "s1-9"), ("u0", 40, 201, "s1-0")])
        src.mark_epoch_done(1)
        wins2 = list(follow_temporal_join(src, dim, cols=["tag"], since=0,
                                          poll_interval=0.05,
                                          max_idle_polls=3))
        assert [(w[0], w[1], w[2]) for w in wins2] == [(0, 1, 1)]
        by_url = {r["url"]: r["dim_tag"] for r in wins2[0][3].to_pylist()}
        assert by_url == {"u9": "late", "u0": "a"}
        # byte-reproducible replay of the first emitted window
        replay = _collect_join(src, dim, cols=["tag"], since=-1, until=0,
                               dim_until=0)
        assert replay.equals(wins[0][3])

    def test_align_waits_for_dim_epoch(self, tmp_path):
        from opendataloader_pdf_ray.cdc.temporal import follow_temporal_join

        src, dim = self._base(tmp_path)
        # src runs ahead: epoch 1 done on src, dim still at epoch 0
        _commit(src, 1, [("u0", 40, 300, "s1-0")])
        src.mark_epoch_done(1)
        wins = list(follow_temporal_join(src, dim, cols=["tag"],
                                         align=True, poll_interval=0.05,
                                         max_idle_polls=3))
        # capped at dim's watermark: only (−1, 0] emitted, dim_until == hi
        assert [(w[0], w[1], w[2]) for w in wins] == [(-1, 0, 0)]
        # dim catches up → the resumed aligned tail emits (0, 1] @ dim 1
        _commit(dim, 1, [("u0", 35, 60, "b")])
        dim.mark_epoch_done(1)
        wins2 = list(follow_temporal_join(src, dim, cols=["tag"], since=0,
                                          align=True, poll_interval=0.05,
                                          max_idle_polls=3))
        assert [(w[0], w[1], w[2]) for w in wins2] == [(0, 1, 1)]
        assert wins2[0][3]["dim_tag"].to_pylist() == ["b"]

    def test_waits_for_first_dim_epoch(self, tmp_path):
        from opendataloader_pdf_ray.cdc.temporal import follow_temporal_join

        src = Lake(str(tmp_path / "src"), P)
        dim = Lake(str(tmp_path / "dim"), P)
        _commit(src, 0, [("u0", 20, 1, "s0")])
        src.mark_epoch_done(0)
        wins = list(follow_temporal_join(src, dim, cols=["tag"],
                                         poll_interval=0.05,
                                         max_idle_polls=2))
        assert wins == []

    def test_cli_follow_and_resume(self, tmp_path, capsys):
        import json
        import os

        import pyarrow.parquet as pq

        from opendataloader_pdf_ray.__main__ import main

        src, dim = self._base(tmp_path)
        out = str(tmp_path / "tj_out")
        assert main(["temporal-join", src.root, dim.root, "--cols", "tag",
                     "--out", out, "--follow", "--poll-interval", "0.05",
                     "--idle-stop", "3"]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["windows_written"] == 1
        names = sorted(os.listdir(out))
        assert names == ["tj-0-0-d0.parquet"]
        t = pq.read_table(os.path.join(out, names[0]))
        assert set(t["dim_tag"].to_pylist()) == {"a"}

        # restart with nothing new: resumes past the written window
        assert main(["temporal-join", src.root, dim.root, "--cols", "tag",
                     "--out", out, "--follow", "--poll-interval", "0.05",
                     "--idle-stop", "2"]) == 0
        rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep2["windows_written"] == 0
        assert sorted(os.listdir(out)) == names

    def test_cli_consumer_redelivery_replaces_stale_window_file(
            self, tmp_path, capsys):
        """Crash between window write and offset store → the redelivered
        window joins the CURRENT dim head; the stale tj-LO-HI-dOLD.parquet
        from the crashed attempt must be REPLACED, not left beside the new
        dim epoch's file (ADVICE r3: directory readers would see the same
        src window twice with conflicting enrichment)."""
        import json
        import os

        import pyarrow.parquet as pq

        from opendataloader_pdf_ray.__main__ import main

        src, dim = self._base(tmp_path)
        out = str(tmp_path / "tj_out")
        os.makedirs(out)
        # crashed attempt: window (-1, 0] was written against dim epoch 0,
        # but the consumer offset was never stored
        stale = os.path.join(out, "tj-0-0-d0.parquet")
        pq.write_table(pa.table({"url": ["stale"]}), stale)
        # dim advances before the restart
        _commit(dim, 1, [(f"u{i}", 15, 60 + i, "b") for i in range(6)])
        dim.mark_epoch_done(1)
        assert main(["temporal-join", src.root, dim.root, "--cols", "tag",
                     "--out", out, "--follow", "--poll-interval", "0.05",
                     "--idle-stop", "3", "--consumer", "enricher"]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["windows_written"] == 1
        names = sorted(n for n in os.listdir(out) if n.endswith(".parquet"))
        # exactly ONE emission of the src window, at the current dim head
        assert names == ["tj-0-0-d1.parquet"]
        t = pq.read_table(os.path.join(out, names[0]))
        assert set(t["dim_tag"].to_pylist()) == {"b"}

    def test_consumer_group_offsets(self, tmp_path):
        """Durable consumer group on the streaming join: the offset (src
        epochs) persists only after the caller resumes past the yield —
        a crash mid-window redelivers exactly that window."""
        from opendataloader_pdf_ray.cdc.changefeed import consumer_offset
        from opendataloader_pdf_ray.cdc.temporal import follow_temporal_join

        src, dim = self._base(tmp_path)
        gen = follow_temporal_join(src, dim, cols=["tag"],
                                   poll_interval=0.05, max_idle_polls=2,
                                   consumer="enricher")
        lo, hi, dim_until, table = next(gen)
        assert (lo, hi) == (-1, 0) and table.num_rows
        # crash before resuming: offset NOT advanced → redelivery
        gen.close()
        assert consumer_offset(src, "enricher") == -1
        gen2 = follow_temporal_join(src, dim, cols=["tag"],
                                    poll_interval=0.05, max_idle_polls=2,
                                    consumer="enricher")
        wins = list(gen2)
        assert [(w[0], w[1]) for w in wins] == [(-1, 0)]
        # fully drained loop → offset advanced; a fresh tail replays nothing
        assert consumer_offset(src, "enricher") == 0
        assert list(follow_temporal_join(
            src, dim, cols=["tag"], poll_interval=0.05, max_idle_polls=2,
            consumer="enricher")) == []
