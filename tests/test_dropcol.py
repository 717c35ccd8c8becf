"""Column drop (Lake.drop_column / CLI drop-column): subtractive schema
evolution — the column vanishes from every as_of read, the op is
idempotent and guarded, zone-map metadata is scrubbed, branches shadow."""

import json

import numpy as np
import pyarrow as pa
import pytest

from opendataloader_pdf_ray.cdc.ingest import url_partition
from opendataloader_pdf_ray.cdc.lake import Lake, Lineage
from opendataloader_pdf_ray.cdc.merge import merge_base_with_updates

P = 4


def _commit(lake, epoch, rows, mode="delta"):
    """rows: (url, warc_ts, seq, text, score_or_None, deleted)."""
    t = pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "warc_ts": pa.array([r[1] for r in rows], pa.int64()),
        "seq": pa.array([r[2] for r in rows], pa.int64()),
        "text": pa.array([r[3] for r in rows], pa.string()),
        "score": pa.array([r[4] for r in rows], pa.int64()),
        "deleted": pa.array([r[5] for r in rows], pa.bool_()),
    })
    parts = np.asarray(url_partition([r[0] for r in rows],
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
            base = lake.read_partition(part, as_of=epoch - 1)
            lake.commit_partition(part, epoch,
                                  merge_base_with_updates(base, sub), lin)
    lake.mark_epoch_done(epoch)


def _lake(tmp_path, mode="delta"):
    lake = Lake(str(tmp_path / "lake"), P)
    _commit(lake, 0, [(f"u{i}", 10, i, f"t{i}", 100 + i, False)
                      for i in range(10)], mode)
    _commit(lake, 1, [(f"u{i}", 20, 50 + i, f"t1-{i}", 200 + i, False)
                      for i in range(0, 10, 2)], mode)
    return lake


class TestDropColumn:
    @pytest.mark.parametrize("mode", ["delta", "snap"])
    def test_column_gone_at_every_as_of(self, tmp_path, mode):
        lake = _lake(tmp_path, mode)
        before = lake.read_state()
        assert "score" in before.column_names
        audit = lake.drop_column("score")
        assert audit["files_rewritten"] > 0
        for as_of in (0, 1, None):
            t = lake.read_state(as_of=as_of)
            assert "score" not in t.column_names
            assert "text" in t.column_names  # other payload intact
        # values preserved
        after = lake.read_state()
        assert after.num_rows == before.num_rows
        assert after["text"].to_pylist() == before["text"].to_pylist()
        # idempotent: re-run rewrites nothing
        assert lake.drop_column("score")["files_rewritten"] == 0

    def test_zone_maps_scrubbed(self, tmp_path):
        lake = _lake(tmp_path)
        assert any("score" in (lake._read_commit(p, e).get("zone_maps")
                               or {})
                   for p in range(P) for e in lake.committed_epochs(p))
        lake.drop_column("score")
        for p in range(P):
            for e in lake.committed_epochs(p):
                zm = lake._read_commit(p, e).get("zone_maps") or {}
                assert "score" not in zm

    def test_guards(self, tmp_path):
        lake = _lake(tmp_path)
        for col in ("url", "warc_ts", "seq", "deleted"):
            with pytest.raises(ValueError, match="version-key"):
                lake.drop_column(col)
        # a follower index on the column refuses the drop
        from opendataloader_pdf_ray.cdc.colindex import col_index_root

        lake.fs.makedirs(col_index_root(lake.root, "score"), exist_ok=True)
        with pytest.raises(ValueError, match="follower index"):
            lake.drop_column("score")

    def test_text_and_vector_index_guards(self, tmp_path):
        """ADVICE r3: a text/trigram/vector index over the dropped column
        must refuse the drop — search/contains/vec-search would otherwise
        verify against a ghost column."""
        from opendataloader_pdf_ray.cdc.textindex import text_index_root
        from opendataloader_pdf_ray.cdc.trigramindex import substr_index_root
        from opendataloader_pdf_ray.cdc.vecindex import vec_index_root

        lake = _lake(tmp_path)
        lake.fs.makedirs(text_index_root(lake.root), exist_ok=True)
        with pytest.raises(ValueError, match="covered by the follower"):
            lake.drop_column("text")
        import shutil

        shutil.rmtree(text_index_root(lake.root))
        lake.fs.makedirs(substr_index_root(lake.root), exist_ok=True)
        with pytest.raises(ValueError, match="covered by the follower"):
            lake.drop_column("text")
        shutil.rmtree(substr_index_root(lake.root))

        # vector index: covered column comes from the persisted conf
        vroot = vec_index_root(lake.root)
        lake.fs.makedirs(vroot, exist_ok=True)
        with open(f"{vroot}/_vecconf.json", "w") as f:
            json.dump({"nbits": 5, "seed": 42, "dim": 4,
                       "vec_col": "score"}, f)
        with pytest.raises(ValueError, match="embedding column"):
            lake.drop_column("score")
        # a DIFFERENT column is not covered → drop proceeds
        assert lake.drop_column("text")["files_rewritten"] > 0

    def test_branch_shadows_parent(self, tmp_path):
        lake = _lake(tmp_path)
        br = lake.branch(str(tmp_path / "br"), name="b1")
        br.drop_column("score")
        assert "score" not in br.read_state().column_names
        # the parent keeps the column — branch drop must not leak up
        assert "score" in lake.read_state().column_names

    def test_crash_mid_rewrite_of_renamed_column_heals_on_rerun(
            self, tmp_path, monkeypatch):
        """ADVICE r4 (lake.py drop_column ordering): the pruned
        renames.json must be written AFTER the alias-aware rewrites. A
        crash mid-rewrite of a previously-renamed column must leave the
        translation map intact, so the re-run still aliases the
        historical name — otherwise surviving files' old name resurrects
        as a null-backfilled twin column forever."""
        lake = _lake(tmp_path)          # epochs 0-1 carry 'score'
        lake.rename_column("score", "points")
        _commit(lake, 2, [("u0", 30, 100, "t2-0", 300, False)])
        # files from epoch 2 use... the metadata rename means old files
        # still say 'score'; drop 'points' must rewrite those via alias

        calls = {"n": 0}
        real = Lake._write_table_atomic

        def explode_after_first(self, table, path):
            calls["n"] += 1
            if calls["n"] == 2:
                raise RuntimeError("injected crash mid-rewrite")
            return real(self, table, path)

        monkeypatch.setattr(Lake, "_write_table_atomic",
                            explode_after_first)
        with pytest.raises(RuntimeError, match="injected crash"):
            lake.drop_column("points")
        monkeypatch.setattr(Lake, "_write_table_atomic", real)

        # the fix: translation map survives the crash
        assert lake.rename_map().get("score") == "points"
        # re-run heals completely: no twin column at any as_of
        lake.drop_column("points")
        assert lake.rename_map() == {}
        for as_of in (0, 1, 2):
            cols = lake.read_state(as_of=as_of).column_names
            assert "score" not in cols and "points" not in cols
        assert lake.verify()["ok"]

    def test_cli(self, tmp_path, capsys):
        from opendataloader_pdf_ray.__main__ import main

        lake = _lake(tmp_path)
        assert main(["drop-column", lake.root, "score"]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["op"] == "drop_column" and rep["files_rewritten"] > 0
        assert "score" not in lake.read_state().column_names
        assert main(["drop-column", lake.root, "url"]) == 2
        assert lake.verify()["ok"]
