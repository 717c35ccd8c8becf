"""Secondary column index (cdc/colindex.py): diff emitter semantics
(value change = retract+apply, delete = retract, NULL never indexed,
unchanged emits nothing), incremental refresh, time travel, probe
pruning, persistent config, compact/fsck/purge, CLI."""

import json

import numpy as np
import pyarrow as pa
import pytest

from opendataloader_pdf_ray.cdc import Lake
from opendataloader_pdf_ray.cdc.colindex import (ColumnIndex,
                                                 col_index_root,
                                                 val_partition)
from opendataloader_pdf_ray.cdc.ingest import url_partition
from opendataloader_pdf_ray.cdc.lake import Lineage

P = 2


def _ep(lk: Lake, e: int, rows) -> None:
    """(url, ts, deleted, lang) rows routed to their hash partitions."""
    parts = url_partition(np.array([r[0] for r in rows], object), P)
    for p in range(P):
        sub = sorted(r for r, pp in zip(rows, parts) if pp == p)
        if not sub:
            continue
        t = pa.table({
            "url": pa.array([r[0] for r in sub], pa.string()),
            "warc_ts": pa.array([r[1] for r in sub], pa.int64()),
            "seq": pa.array([r[1] for r in sub], pa.int64()),
            "deleted": pa.array([r[2] for r in sub], pa.bool_()),
            "lang": pa.array([r[3] for r in sub], pa.string()),
        })
        lk.commit_delta(p, e, t, Lineage(
            part=p, epoch=e, events_consumed=len(sub),
            rows_upserted=len(sub), rows_deleted=0,
            seq_min=sub[0][1], seq_max=sub[-1][1]))
    lk.mark_epoch_done(e)


@pytest.fixture()
def lake(tmp_path):
    lk = Lake(str(tmp_path / "lake"), P)
    _ep(lk, 0, [("a", 1, False, "en"), ("b", 2, False, "de"),
                ("c", 3, False, "en"), ("n", 4, False, None)])
    _ep(lk, 1, [("a", 5, False, "fr"), ("b", 6, True, None)])
    return lk


def _idx(lake, **kw):
    idx = ColumnIndex(col_index_root(lake.root, "lang"), 8,
                      col=kw.pop("col", "lang"), **kw)
    idx.refresh(lake)
    return idx


def _pairs(t: pa.Table):
    return [(r["val"], r["key"]) for r in t.to_pylist()]


@pytest.mark.usefixtures("ray_session")
class TestColumnIndex:
    def test_emitter_semantics(self, lake):
        """en→fr retracts+applies, delete retracts, NULL never indexed."""
        idx = _idx(lake)
        assert _pairs(idx.scan_local(["en", "de", "fr", "ko"])) == \
            [("en", "c"), ("fr", "a")]
        # n (NULL) indexed nowhere
        state = idx.read_state()
        assert "n" not in set(state["key"].to_pylist())

    def test_time_travel(self, lake):
        idx = _idx(lake)
        assert _pairs(idx.scan_local(["en", "de"], as_of=0)) == \
            [("de", "b"), ("en", "a"), ("en", "c")]

    def test_incremental_refresh_and_unchanged_skip(self, lake):
        idx = _idx(lake)
        # epoch 2: c changes value; a is REWRITTEN with the same value —
        # the diff emitter must emit nothing for it
        _ep(lake, 2, [("c", 7, False, "ko"), ("a", 8, False, "fr")])
        idx.refresh(lake)
        assert _pairs(idx.scan_local(["en", "fr", "ko"])) == \
            [("fr", "a"), ("ko", "c")]
        st = idx.read_partition(
            int(val_partition(["fr"], idx.num_partitions)[0]))
        fr_rows = st.filter(pa.compute.equal(st["val"], "fr")).to_pylist()
        # a's fr posting is the epoch-1 apply; epoch 2 emitted no fr row
        assert [r["epoch"] for r in fr_rows if r["key"] == "a"] == [1]

    def test_distributed_scan_matches_local(self, lake):
        idx = _idx(lake)
        got = sorted((r["val"], r["key"])
                     for r in idx.scan(["en", "fr"]).take_all())
        assert got == _pairs(idx.scan_local(["en", "fr"]))

    def test_config_persisted_and_guarded(self, lake):
        _idx(lake)
        # reopen without col: stored config wins
        reopened = ColumnIndex(col_index_root(lake.root, "lang"))
        assert reopened.col == "lang"
        with pytest.raises(ValueError, match="indexes column"):
            ColumnIndex(col_index_root(lake.root, "lang"), col="source")
        with pytest.raises(ValueError, match="needs col"):
            ColumnIndex(col_index_root(lake.root, "other"), 4)

    def test_compact_verify_purge(self, lake):
        idx = _idx(lake)
        assert idx.compact() >= 1
        assert idx.verify(deep=True)["ok"]
        idx.purge_keys(["a"])
        assert _pairs(idx.scan_local(["fr"])) == []
        assert idx.verify(deep=True)["ok"]

    def test_refresh_idempotent(self, lake):
        idx = _idx(lake)
        assert idx.refresh(lake) == []  # watermark already at tip
        before = _pairs(idx.read_state())
        # re-running from a fresh watermark is exactly-once on the commit
        # log: all skips, same state
        idx._set_watermark(-1)
        lineage = idx.refresh(lake)
        assert lineage and all(r["skipped"] for r in lineage)
        assert _pairs(idx.read_state()) == before

    def test_ingest_col_index_follower(self, tmp_path, capsys):
        """CLI ingest --col-index COL: the index refreshes after the
        replay and serves equality scans that match the lake's live
        values (n_blocks is an extract-derived int column — canonical
        string values)."""
        import pyarrow.parquet as pq

        from opendataloader_pdf_ray.__main__ import main
        from opendataloader_pdf_ray.fixtures.gen import gen_events

        events = str(tmp_path / "events.parquet")
        pq.write_table(gen_events(90, 25, seed=7), events)
        lake_root = str(tmp_path / "lake")
        assert main(["ingest", events, lake_root, "--partitions", "4",
                     "--epoch-size", "45", "--commit-mode", "delta",
                     "--col-index", "n_blocks"]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["col_index_n_blocks_watermark"] == 1
        idx = ColumnIndex(col_index_root(lake_root, "n_blocks"))
        live = Lake(lake_root).read_state()
        want = sorted((str(n), u) for u, n in
                      zip(live["url"].to_pylist(),
                          live["n_blocks"].to_pylist()) if n is not None)
        got = sorted((r["val"], r["key"])
                     for r in idx.read_state().to_pylist())
        assert got == want

    def test_cli(self, lake, tmp_path, capsys):
        from opendataloader_pdf_ray.__main__ import main

        assert main(["col-index", lake.root, "lang"]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["column"] == "lang" and rep["watermark"] == 1
        assert main(["scan", lake.root, "lang", "en", "fr", "--rows"]) == 0
        out = [json.loads(l) for l in
               capsys.readouterr().out.strip().splitlines()]
        assert out[0] == {"value": "en", "n_urls": 1, "urls": ["c"]}
        assert out[1] == {"value": "fr", "n_urls": 1, "urls": ["a"]}
        assert out[2] == {"rows": 2}
        assert main(["fsck", lake.root, "--deep"]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["colidx_lang"]["ok"]
        assert main(["stats", lake.root]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert "colidx_lang" in rep
