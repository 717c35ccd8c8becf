"""Column rename (Lake.rename_column / CLI rename-column): metadata-level
schema evolution by persisted name map (Iceberg renames by column id; this
name-addressed engine keeps a historical→current map consulted per file
read) — no file rewrite, time travel across the rename, pre/post-rename
files fold into ONE column, lagging-producer events converge at apply
time (r3 verdict item #7)."""

import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from opendataloader_pdf_ray.cdc.ingest import ingest_epoch, url_partition
from opendataloader_pdf_ray.cdc.lake import Lake, Lineage
from opendataloader_pdf_ray.cdc.merge import merge_base_with_updates

P = 4


def _commit(lake, epoch, rows, mode="snap"):
    """rows: (url, warc_ts, seq, text, score)."""
    t = pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "warc_ts": pa.array([r[1] for r in rows], pa.int64()),
        "seq": pa.array([r[2] for r in rows], pa.int64()),
        "text": pa.array([r[3] for r in rows], pa.string()),
        "score": pa.array([r[4] for r in rows], pa.int64()),
        "deleted": pa.array([False] * len(rows), pa.bool_()),
    })
    _commit_table(lake, epoch, t, mode)


def _commit_table(lake, epoch, t, mode="snap"):
    parts = np.asarray(url_partition(t["url"].to_pylist(),
                                     lake.num_partitions))
    for part in range(lake.num_partitions):
        sub = t.filter(pa.array(parts == part))
        if sub.num_rows == 0:
            continue
        sub = sub.sort_by([("url", "ascending")])
        seqs = sub["seq"].to_pylist()
        lin = Lineage(part=part, epoch=epoch, events_consumed=sub.num_rows,
                      rows_upserted=sub.num_rows, rows_deleted=0,
                      seq_min=min(seqs), seq_max=max(seqs))
        if mode == "delta":
            lake.commit_delta(part, epoch, sub, lin)
        else:
            base = lake.read_partition(part, as_of=epoch - 1, internal=True)
            lake.commit_partition(part, epoch,
                                  merge_base_with_updates(base, sub), lin)
    lake.mark_epoch_done(epoch)


def _lake(tmp_path, mode="snap"):
    lake = Lake(str(tmp_path / "lake"), P)
    _commit(lake, 0, [(f"u{i}", 10, i, f"t{i}", 100 + i)
                      for i in range(10)], mode)
    return lake


class TestRenameColumn:
    def test_rename_is_metadata_only_and_time_travels(self, tmp_path):
        lake = _lake(tmp_path)
        files_before = {p: lake.fs.info(p)["mtime"]
                        for p in lake.partition_files()}
        rec = lake.rename_column("score", "points")
        assert rec["from"] == "score" and rec["to"] == "points"
        for as_of in (0, None):
            t = lake.read_state(as_of=as_of)
            assert "points" in t.column_names
            assert "score" not in t.column_names
        # values byte-identical, no file touched
        t = lake.read_state().sort_by([("url", "ascending")])
        assert t["points"].to_pylist() == [100 + i for i in range(10)]
        assert {p: lake.fs.info(p)["mtime"]
                for p in lake.partition_files()} == files_before
        assert lake.verify(deep=True)["ok"]

    def test_pre_and_post_rename_files_fold_into_one_column(self, tmp_path):
        """delta-mode: epoch 0 written pre-rename ('score'), epoch 1
        delta written post-rename ('points') — merge-on-read must fold
        them into ONE column with LWW winners, not null-backfilled twins."""
        lake = _lake(tmp_path, mode="delta")
        lake.rename_column("score", "points")
        t1 = pa.table({
            "url": pa.array([f"u{i}" for i in range(0, 10, 2)]),
            "warc_ts": pa.array([20] * 5, pa.int64()),
            "seq": pa.array([50 + i for i in range(5)], pa.int64()),
            "text": pa.array([f"t1-{i}" for i in range(5)]),
            "points": pa.array([900 + i for i in range(5)], pa.int64()),
            "deleted": pa.array([False] * 5),
        })
        _commit_table(lake, 1, t1, mode="delta")
        state = lake.read_state().sort_by([("url", "ascending")])
        assert state.column_names.count("points") == 1
        assert "score" not in state.column_names
        by_url = dict(zip(state["url"].to_pylist(),
                          state["points"].to_pylist()))
        assert by_url["u0"] == 900      # post-rename winner
        assert by_url["u1"] == 101      # pre-rename survivor, translated
        # a LAGGING producer still writing the OLD name also converges
        t2 = t1.rename_columns(
            [c if c != "points" else "score" for c in t1.column_names])
        t2 = t2.set_column(t2.column_names.index("warc_ts"), "warc_ts",
                           pa.array([30] * 5, pa.int64()))
        t2 = t2.set_column(t2.column_names.index("score"), "score",
                           pa.array([700 + i for i in range(5)],
                                    pa.int64()))
        _commit_table(lake, 2, t2, mode="delta")
        state = lake.read_state()
        assert "score" not in state.column_names
        by_url = dict(zip(state["url"].to_pylist(),
                          state["points"].to_pylist()))
        assert by_url["u0"] == 700

    def test_projection_and_chain(self, tmp_path):
        lake = _lake(tmp_path)
        lake.rename_column("score", "points")
        lake.rename_column("points", "rating")  # chain a→b→c
        for part in range(P):
            t = lake.read_partition(part, columns=["rating"])
            if t is not None and t.num_rows:
                assert "rating" in t.column_names
        assert lake.rename_map() == {"score": "rating",
                                     "points": "rating"}

    def test_zone_map_range_scan_across_rename(self, tmp_path, ray_session):
        lake = _lake(tmp_path)
        lake.rename_column("score", "points")
        # zone maps were written under 'score'; the range scan by the NEW
        # name must still prune with them and filter correctly
        got = (lake.read_range("points", 103, 106)
               .to_pandas().sort_values("url"))
        assert got["points"].tolist() == [103, 104, 105, 106]

    def test_guards(self, tmp_path):
        lake = _lake(tmp_path)
        for col in ("url", "warc_ts", "seq", "deleted"):
            with pytest.raises(ValueError, match="version-key"):
                lake.rename_column(col, "x")
        with pytest.raises(ValueError, match="version-key"):
            lake.rename_column("score", "url")
        with pytest.raises(ValueError, match="already names"):
            lake.rename_column("score", "text")
        with pytest.raises(ValueError, match="not a current column"):
            lake.rename_column("ghost", "x")
        from opendataloader_pdf_ray.cdc.colindex import col_index_root

        lake.fs.makedirs(col_index_root(lake.root, "score"), exist_ok=True)
        with pytest.raises(ValueError, match="follower index"):
            lake.rename_column("score", "points")

    def test_drop_after_rename_scrubs_aliases(self, tmp_path):
        lake = _lake(tmp_path)
        lake.rename_column("score", "points")
        audit = lake.drop_column("points")
        assert audit["files_rewritten"] > 0
        state = lake.read_state()
        assert "points" not in state.column_names
        assert "score" not in state.column_names
        assert lake.list_renames() == []  # retired with the column
        assert lake.verify(deep=True)["ok"]

    def test_ingest_converges_renamed_event_columns(self, tmp_path,
                                                    ray_session):
        """Full ingest path: rename lang→language, then ingest events that
        still carry 'lang' — the applied state presents 'language'."""
        from opendataloader_pdf_ray.config import CDCConfig
        from opendataloader_pdf_ray.fixtures.gen import gen_events

        cfg = CDCConfig(num_partitions=P, num_salts=2, epoch_size=40,
                        extract_batch_size=16, extract_concurrency=2)
        events = gen_events(80, 30, seed=31)
        p = str(tmp_path / "events.parquet")
        pq.write_table(events, p)
        lake = Lake(str(tmp_path / "lake2"), P)
        ingest_epoch(p, lake, 0, cfg)
        lake.mark_epoch_done(0)
        lake.rename_column("lang", "language")
        ingest_epoch(p, lake, 1, cfg)
        lake.mark_epoch_done(1)
        state = lake.read_state()
        assert "language" in state.column_names
        assert "lang" not in state.column_names
        assert state.num_rows > 0

    def test_changefeed_across_rename(self, tmp_path, ray_session):
        """Feed rows spanning a rename present the CURRENT name, and
        pre-rename delta files fold against the translated pre-image
        without forking twin columns (epoch_winners translation)."""
        from opendataloader_pdf_ray.cdc.changefeed import changes

        lake = _lake(tmp_path, mode="delta")
        lake.rename_column("score", "points")
        t1 = pa.table({
            "url": pa.array(["u0", "u1"]),
            "warc_ts": pa.array([20, 20], pa.int64()),
            "seq": pa.array([50, 51], pa.int64()),
            "text": pa.array(["n0", "n1"]),
            "points": pa.array([900, 901], pa.int64()),
            "deleted": pa.array([False, False]),
        })
        _commit_table(lake, 1, t1, mode="delta")
        feed = changes(lake, since=-1).to_pandas()
        assert "points" in feed.columns and "score" not in feed.columns
        e0 = feed[feed["epoch"] == 0]
        e1 = feed[feed["epoch"] == 1]
        assert set(e0["op"]) == {"insert"} and len(e0) == 10
        assert set(e1["op"]) == {"update"}
        assert sorted(e1["points"]) == [900, 901]
        # pre-rename rows carry their values under the current name
        assert e0.set_index("url")["points"]["u5"] == 105

    def test_incremental_view_across_rename(self, tmp_path, ray_session):
        """views.MaterializedView folds pre- and post-rename epochs into
        the same (translated) columns."""
        from opendataloader_pdf_ray.cdc.views import MaterializedView

        lake = _lake(tmp_path, mode="delta")
        lake.rename_column("text", "body")
        t1 = pa.table({
            "url": pa.array(["u0"]),
            "warc_ts": pa.array([20], pa.int64()),
            "seq": pa.array([50], pa.int64()),
            "body": pa.array(["updated body zz"]),
            "points": pa.array([900], pa.int64()),
            "deleted": pa.array([False]),
        })
        # keep schema consistent with renamed current names
        t1 = t1.rename_columns(
            [c if c != "points" else "score" for c in t1.column_names])
        _commit_table(lake, 1, t1, mode="delta")
        def group_all(t):
            return np.asarray(["g"] * t.num_rows, dtype=object)

        def body_len(t):
            vals = t["body"].to_pylist() if "body" in t.column_names \
                else [None] * t.num_rows
            return np.asarray([len(v) if v else 0 for v in vals],
                              dtype=np.int64)

        view = MaterializedView(lake, "len_stats", group_of=group_all,
                                value_of=body_len)
        view.refresh(parallel=False)
        out = view.read().to_pydict()
        assert sum(out["n_live"]) == 10  # all urls live, folded once
        # the sum saw every row's body THROUGH the translation (pre-rename
        # files included): 10 texts "t0".."t9" (2 chars) with u0 updated to
        # the 15-char body
        assert sum(out["sum_value"]) == 9 * 2 + len("updated body zz")

    def test_cli(self, tmp_path, capsys):
        from opendataloader_pdf_ray.__main__ import main

        lake = _lake(tmp_path)
        assert main(["rename-column", lake.root, "score", "points"]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["op"] == "rename_column" and rep["to"] == "points"
        assert "points" in lake.read_state().column_names
        assert main(["rename-column", lake.root, "url", "x"]) == 2
