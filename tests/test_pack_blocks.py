"""Transit-segment block packing (CDCConfig.pack_blocks — r4 verdict item
#5): the wide blocks list<struct> rides the combine + shuffles as a per-row
zstd'd IPC binary cell and is unpacked (winners only) before the merge
fold. The lake must be BYTE-identical with the flag on or off."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from opendataloader_pdf_ray.cdc import Lake
from opendataloader_pdf_ray.cdc.ingest import CDCConfig, ingest_epoch
from opendataloader_pdf_ray.fixtures.gen import gen_events
from opendataloader_pdf_ray.stages.extract_stage import (
    HtmlExtractor,
    pack_blocks,
    unpack_blocks,
)


class TestPackRoundtrip:
    def test_pack_unpack_byte_identical(self):
        batch = gen_events(60, 20, seed=51)
        out = HtmlExtractor()(batch)
        packed = pack_blocks(out)
        assert "blocks" not in packed.column_names
        assert "blocks_bin" in packed.column_names
        # null blocks (tombstones) survive as null cells
        n_null = out["blocks"].null_count
        assert packed["blocks_bin"].null_count == n_null
        restored = unpack_blocks(packed)
        assert restored["blocks"].combine_chunks().equals(
            out["blocks"].combine_chunks())
        # packed transit is materially narrower than the struct
        assert packed["blocks_bin"].nbytes < out["blocks"].nbytes / 2

    def test_noop_without_blocks(self):
        t = pa.table({"x": pa.array([1, 2])})
        assert pack_blocks(t) is t
        assert unpack_blocks(t) is t


@pytest.mark.usefixtures("ray_session")
class TestPackedIngest:
    @pytest.mark.parametrize("commit_mode", ["snapshot", "delta"])
    def test_lake_byte_identical(self, tmp_path, commit_mode):
        events = gen_events(120, 30, seed=52)
        seg = str(tmp_path / "seg.parquet")
        pq.write_table(events, seg)
        kw = dict(num_partitions=4, num_salts=2, epoch_size=60,
                  extract_batch_size=16, extract_concurrency=2,
                  epoch_commits=commit_mode)
        lakes = {}
        for packed in (False, True):
            cfg = CDCConfig(pack_blocks=packed, **kw)
            root = str(tmp_path / f"lake_{packed}_{commit_mode}")
            lake = Lake(root, cfg.num_partitions)
            for e in (0, 1):
                ingest_epoch([seg], lake, e, cfg)
            lakes[packed] = lake
        got = lakes[True].read_state(include_tombstones=True)
        want = lakes[False].read_state(include_tombstones=True)
        assert got.column_names == want.column_names
        assert "blocks" in got.column_names
        assert got.equals(want)

    @pytest.mark.parametrize("snapshots", ["per-epoch", "final"])
    def test_backlog_replay_byte_identical(self, tmp_path, snapshots):
        """The backlog path (replay → ingest_epochs → ApplyPartition
        Backlog/Final) must honor pack_blocks identically — this is the
        bench headline's code path."""
        import os

        from opendataloader_pdf_ray.cdc.ingest import replay

        events = gen_events(120, 30, seed=53)
        seg_dir = str(tmp_path / "segs")
        os.makedirs(seg_dir)
        pq.write_table(events, f"{seg_dir}/seg-000000.parquet")
        kw = dict(num_partitions=4, num_salts=2, epoch_size=60,
                  extract_batch_size=16, extract_concurrency=2,
                  backlog_snapshots=snapshots)
        lakes = {}
        for packed in (False, True):
            cfg = CDCConfig(pack_blocks=packed, **kw)
            root = str(tmp_path / f"bl_{packed}_{snapshots}")
            replay(seg_dir, root, cfg)
            lakes[packed] = Lake(root)
        got = lakes[True].read_state(include_tombstones=True)
        want = lakes[False].read_state(include_tombstones=True)
        assert "blocks" in got.column_names
        assert got.equals(want)
