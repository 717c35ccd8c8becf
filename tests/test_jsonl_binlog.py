"""JSONL (Debezium-style) binlog source tests (sources/jsonl_binlog.py):
wire round-trip, gzip magic-byte sniff, malformed-event loud-fail, additive
extra columns, distributed + resumable import, and end-to-end equivalence —
a lake ingested from imported JSONL equals a lake ingested from the same
events written as parquet segments directly.
"""

import gzip
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from opendataloader_pdf_ray.fixtures.gen import gen_events
from opendataloader_pdf_ray.sources.jsonl_binlog import (MalformedEvent,
                                                         import_jsonl,
                                                         parse_segment,
                                                         to_jsonl_segment)


def _core(t: pa.Table) -> pa.Table:
    return t.select(["seq", "op", "url", "warc_ts", "html", "lang"]) \
        .sort_by([("seq", "ascending")])


class TestParse:
    def test_round_trip(self):
        events = gen_events(60, 20, seed=7)
        got = parse_segment(to_jsonl_segment(events), "rt")
        assert _core(got).equals(_core(events))

    def test_engine_ops_accepted_verbatim(self):
        events = gen_events(30, 10, seed=8)
        raw = to_jsonl_segment(events, debezium_ops=False)
        assert _core(parse_segment(raw)).equals(_core(events))

    def test_gzip_sniffed_by_magic(self):
        events = gen_events(30, 10, seed=9)
        raw = gzip.compress(to_jsonl_segment(events))
        assert _core(parse_segment(raw)).equals(_core(events))

    def test_snapshot_read_op_maps_to_insert(self):
        line = (b'{"op": "r", "seq": 3, "ts_us": 5, '
                b'"key": {"url": "https://a"}, '
                b'"after": {"html_b64": "aGk=", "lang": "en"}}\n')
        t = parse_segment(line)
        assert t["op"].to_pylist() == ["I"]
        assert t["html"].to_pylist() == [b"hi"]

    def test_extra_after_keys_become_columns(self):
        line = (b'{"op": "c", "seq": 1, "ts_us": 2, '
                b'"key": {"url": "https://a"}, '
                b'"after": {"html_b64": "aGk=", "source": "crawl-7"}}\n'
                b'{"op": "d", "seq": 2, "ts_us": 3, '
                b'"key": {"url": "https://a"}, "after": null}\n')
        t = parse_segment(line)
        assert t["source"].to_pylist() == ["crawl-7", None]

    def test_malformed_carries_segment_and_line(self):
        good = (b'{"op": "c", "seq": 1, "ts_us": 2, '
                b'"key": {"url": "https://a"}, "after": null}\n')
        for bad in (b"not json\n", b'{"op": "x", "seq": 1, "ts_us": 2, '
                    b'"key": {"url": "u"}}\n',
                    b'{"op": "c", "ts_us": 2, "key": {"url": "u"}}\n'):
            with pytest.raises(MalformedEvent, match="seg.jsonl:2"):
                parse_segment(good + bad, "seg.jsonl")


@pytest.mark.usefixtures("ray_session")
class TestImport:
    def _write_jsonl_segments(self, events, out_dir, shard=30):
        import pyarrow.compute as pc

        os.makedirs(out_dir, exist_ok=True)
        n = int(pc.max(events["seq"]).as_py()) + 1
        for s in range(0, n, shard):
            chunk = events.filter((pc.field("seq") >= s)
                                  & (pc.field("seq") < s + shard))
            raw = to_jsonl_segment(chunk)
            if s % (2 * shard):  # alternate plain / gzipped segments
                with open(f"{out_dir}/seg-{s:06d}.jsonl", "wb") as f:
                    f.write(raw)
            else:
                with open(f"{out_dir}/seg-{s:06d}.jsonl.gz", "wb") as f:
                    f.write(gzip.compress(raw))

    def test_import_resumable_and_equivalent(self, tmp_path):
        events = gen_events(120, 30, seed=11)
        src = str(tmp_path / "jsonl")
        out = str(tmp_path / "pq")
        self._write_jsonl_segments(events, src)
        assert import_jsonl(src, out) == 4
        # resumable: a re-run skips everything already imported
        assert import_jsonl(src, out) == 0
        names = sorted(os.listdir(out))
        assert names == [f"seg-{s:06d}.parquet" for s in (0, 30, 60, 90)]
        got = pa.concat_tables([pq.read_table(f"{out}/{n}") for n in names])
        assert _core(got).equals(_core(events))

    def test_end_to_end_lake_equivalence(self, tmp_path):
        """Ingesting imported-JSONL segments == ingesting parquet segments
        written directly from the same events."""
        from opendataloader_pdf_ray.cdc import Lake, replay
        from opendataloader_pdf_ray.config import CDCConfig

        cfg = CDCConfig(num_partitions=4, num_salts=2, epoch_size=60,
                        extract_batch_size=16, extract_concurrency=2)
        events = gen_events(120, 30, seed=12)
        src = str(tmp_path / "jsonl")
        imported = str(tmp_path / "imported")
        self._write_jsonl_segments(events, src)
        import_jsonl(src, imported)

        direct = str(tmp_path / "direct.parquet")
        pq.write_table(events, direct)

        lake_a = Lake(str(tmp_path / "lake_a"), cfg.num_partitions)
        lake_b = Lake(str(tmp_path / "lake_b"), cfg.num_partitions)
        replay(imported, lake_a.root, cfg)
        replay(direct, lake_b.root, cfg)
        a = lake_a.read_state(include_tombstones=True).sort_by("url")
        b = lake_b.read_state(include_tombstones=True).sort_by("url")
        assert a.equals(b)


@pytest.mark.usefixtures("ray_session")
class TestFollowImport:
    def test_drip_feed_then_end(self, tmp_path):
        """Tail a growing dir: segments landing mid-tail are imported as
        they appear; .end drains and stops; a restarted tail re-imports
        nothing (resumable via existing outputs)."""
        import threading
        import time

        from opendataloader_pdf_ray.sources.jsonl_binlog import (
            follow_import, to_jsonl_segment)

        events = gen_events(90, 25, seed=13)
        src = tmp_path / "drip"
        src.mkdir()
        out = str(tmp_path / "pq")

        def seg(lo, hi):
            import pyarrow.compute as pc

            return to_jsonl_segment(events.filter(
                (pc.field("seq") >= lo) & (pc.field("seq") < hi)))

        (src / "seg-000000.jsonl").write_bytes(seg(0, 30))

        def producer():
            time.sleep(0.6)
            (src / "seg-000030.jsonl").write_bytes(seg(30, 60))
            time.sleep(0.6)
            (src / "seg-000060.jsonl").write_bytes(seg(60, 90))
            (src / ".end").write_text("")

        t = threading.Thread(target=producer)
        t.start()
        batches = list(follow_import(str(src), out, poll_interval=0.2))
        t.join()
        assert sum(batches) == 3
        assert sorted(os.listdir(out)) == [
            f"seg-{s:06d}.parquet" for s in (0, 30, 60)]
        # restart: nothing new
        assert list(follow_import(str(src), out, poll_interval=0.05)) == []
        got = pa.concat_tables(
            [pq.read_table(f"{out}/seg-{s:06d}.parquet")
             for s in (0, 30, 60)])
        assert _core(got).equals(_core(events))


@pytest.mark.usefixtures("ray_session")
class TestExportJsonl:
    def test_full_interchange_round_trip(self, tmp_path, capsys):
        """export-jsonl → import-jsonl → ingest reproduces the SAME lake
        (diff-verified): the engine's binlog is a first-class citizen of
        the Debezium JSONL interchange format in both directions."""
        from opendataloader_pdf_ray.__main__ import main
        from opendataloader_pdf_ray.fixtures.gen import write_fixture_dir

        events = tmp_path / "events"
        write_fixture_dir(str(events), 150, 40, seed=19, shard_size=50)

        # parquet → jsonl.gz → parquet'
        jl = str(tmp_path / "jl")
        assert main(["export-jsonl", str(events), jl]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["segments_exported"] == 3
        back = str(tmp_path / "back")
        assert main(["import-jsonl", jl, back]) == 0
        capsys.readouterr()

        # ingest both logs; live states must be identical
        lake_a = str(tmp_path / "lake_a")
        lake_b = str(tmp_path / "lake_b")
        for src, lake in ((str(events), lake_a), (back, lake_b)):
            assert main(["ingest", src, lake, "--epoch-size", "50",
                         "--partitions", "4"]) == 0
            capsys.readouterr()
        assert main(["diff", lake_a, lake_b]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["equivalent"] is True

        # resumable: a re-run exports nothing
        assert main(["export-jsonl", str(events), jl]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["segments_exported"] == 0

    def test_deterministic_gzip_bytes(self, tmp_path, capsys):
        from opendataloader_pdf_ray.__main__ import main
        from opendataloader_pdf_ray.fixtures.gen import write_fixture_dir

        events = tmp_path / "events"
        write_fixture_dir(str(events), 60, 20, seed=23, shard_size=30)
        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        assert main(["export-jsonl", str(events), a]) == 0
        assert main(["export-jsonl", str(events), b]) == 0
        capsys.readouterr()
        import os

        for name in sorted(os.listdir(a)):
            wa = open(os.path.join(a, name), "rb").read()
            wb = open(os.path.join(b, name), "rb").read()
            assert wa == wb, name
