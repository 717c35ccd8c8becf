"""Round-5 feature composition: ONE follow tail running the persistent
extractor pool + packed transit + dedup index + full-text index + embed +
ANN index simultaneously, then the serving surfaces and a BPE pack over
the result — the options must compose orthogonally, and the lake must be
byte-equal to a plain tasks-mode tail over the same log."""

import json
import os

import pytest

from opendataloader_pdf_ray.cdc import Lake
from opendataloader_pdf_ray.fixtures.gen import gen_events


def _write_segments(table, out_dir, shard=30):
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    for s in range(0, table.num_rows, shard):
        chunk = table.filter((pc.field("seq") >= s)
                             & (pc.field("seq") < s + shard))
        if chunk.num_rows:
            pq.write_table(chunk, f"{out_dir}/seg-{s:06d}.parquet")


@pytest.mark.usefixtures("ray_session")
class TestRoundFiveCompose:
    def test_kitchen_sink_tail(self, tmp_path, capsys):
        from opendataloader_pdf_ray.__main__ import main

        events = gen_events(120, 30, seed=71)
        seg_dir = str(tmp_path / "segs")
        _write_segments(events, seg_dir)
        open(os.path.join(seg_dir, ".end"), "w").close()

        lake_root = str(tmp_path / "lake")
        rc = main(["ingest", seg_dir, lake_root, "--mode", "follow",
                   "--epoch-size", "60", "--partitions", "4",
                   "--poll-interval", "0.05",
                   "--extract-mode", "pool", "--pack-blocks",
                   "--dup-index", "--text-index",
                   "--embed", "--vec-index"])
        assert rc == 0
        capsys.readouterr()

        # plain-config oracle lake over the same log
        ref_root = str(tmp_path / "ref")
        assert main(["ingest", seg_dir, ref_root, "--mode", "follow",
                     "--epoch-size", "60", "--partitions", "4",
                     "--poll-interval", "0.05",
                     "--extract-mode", "tasks", "--embed"]) == 0
        capsys.readouterr()
        lake, ref = Lake(lake_root), Lake(ref_root)
        got = lake.read_state(include_tombstones=True)
        want = ref.read_state(include_tombstones=True)
        assert got.equals(want)

        # the indexes built DURING the packed/pooled tail serve correctly
        state = lake.read_state()
        text = next(t for t in state["text"].to_pylist() if t)
        token = next(w for w in text.split() if w.isalpha() and len(w) > 2)
        assert main(["search", lake_root, token.lower()]) == 0
        hits = [ln for ln in capsys.readouterr().out.splitlines()
                if ln.strip()]
        assert hits, "text index empty after composed tail"
        url = state["url"][0].as_py()
        assert main(["vec-search", lake_root, url, "--topk", "3"]) == 0
        out = [ln for ln in capsys.readouterr().out.splitlines()
               if ln.strip()]
        assert out, "vec index empty after composed tail"
        assert main(["dups", lake_root]) == 0
        capsys.readouterr()

        # BPE pack over the composed lake
        assert main(["pack", lake_root, str(tmp_path / "shards"),
                     "--budget", "32", "--tokenizer", "bpe"]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["tokens"] > 0 and rep["partitions_written"] > 0

        # semantic dup attribution over the same composed lake (vec
        # column came from --embed)
        assert main(["semdups", lake_root]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["rows"] > 0

        assert main(["fsck", lake_root]) == 0
        capsys.readouterr()
