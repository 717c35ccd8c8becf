"""Crawl-snapshot seed (cdc/seed.py): WARC → epoch-0 lake, in-snapshot LWW
dedup, resumability, CDC continuation, and the full WARC→lake→WET loop."""

import os

import pyarrow.parquet as pq
import pytest

from opendataloader_pdf_ray.cdc import Lake, seed_from_warc
from opendataloader_pdf_ray.config import CDCConfig
from opendataloader_pdf_ray.extractor import extract
from opendataloader_pdf_ray.sources.warc import parse_warc_bytes, write_warc

CFG = CDCConfig(num_partitions=4, num_salts=2, epoch_size=60,
                extract_batch_size=16, extract_concurrency=2)


def pq_concat(ds):
    """Dataset → list of row dicts (tiny test datasets only)."""
    return ds.take_all()


def _page(tag: str) -> bytes:
    return (f"<html><body><h1>Title {tag}</h1>"
            f"<p>Body paragraph {tag} with several words.</p>"
            f"</body></html>").encode()


def _snapshot(tmp_path, n_segments=2):
    """Two WARC segments; url-3 is fetched TWICE (newer fetch must win)."""
    seg_paths = []
    recs0 = [(f"https://s.example/p{i}", f"2026-01-01T00:00:0{i}Z",
              _page(f"v1-{i}")) for i in range(5)]
    recs1 = [(f"https://s.example/p{i}", f"2026-01-01T00:01:0{i - 5}Z",
              _page(f"v1-{i}")) for i in range(5, 8)]
    recs1.append(("https://s.example/p3", "2026-01-02T00:00:00Z",
                  _page("v2-3-refetch")))
    for i, recs in enumerate((recs0, recs1)):
        p = str(tmp_path / f"seg{i}.warc")
        write_warc(p, recs)
        seg_paths.append(p)
    return seg_paths


@pytest.mark.usefixtures("ray_session")
class TestSeed:
    def test_seed_state_matches_extraction_oracle(self, tmp_path):
        segs = _snapshot(tmp_path)
        lake_root = str(tmp_path / "lake")
        lineage = seed_from_warc(segs, lake_root, CFG)
        assert sum(l["rows_upserted"] for l in lineage) == 8  # 8 urls
        lake = Lake(lake_root, None)
        state = {r["url"]: r for r in lake.read_state().to_pylist()}
        assert len(state) == 8
        # refetched url: the NEWER fetch's extraction wins
        want = extract(_page("v2-3-refetch")).text
        assert state["https://s.example/p3"]["text"] == want
        # any other url: byte-identical to single-doc extraction
        assert state["https://s.example/p6"]["text"] == \
            extract(_page("v1-6")).text
        assert lake.is_epoch_done(0)
        assert lake.verify(deep=True)["ok"]

    def test_seed_resumable_and_deterministic(self, tmp_path):
        segs = _snapshot(tmp_path)
        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        first = seed_from_warc(segs, a, CFG)
        again = seed_from_warc(segs, a, CFG)  # re-run: all skipped
        assert not any(l["skipped"] for l in first)
        assert all(l["skipped"] for l in again)
        seed_from_warc(segs, b, CFG)
        assert Lake(a, None).read_state().equals(Lake(b, None).read_state())

    def test_cdc_tail_continues_after_seed(self, tmp_path):
        """The seeded lake accepts a binlog tail at epoch 1: an update to a
        seeded url wins LWW; a new url inserts."""
        import pyarrow as pa

        from opendataloader_pdf_ray.cdc.ingest import ingest_epoch

        segs = _snapshot(tmp_path)
        lake_root = str(tmp_path / "lake")
        seed_from_warc(segs, lake_root, CFG)
        lake = Lake(lake_root, None)
        from opendataloader_pdf_ray.fixtures.gen import BASE_TS_US

        events = pa.table({
            "seq": pa.array([60, 61], pa.int64()),
            "op": pa.array(["U", "I"], pa.string()),
            "url": pa.array(["https://s.example/p0",
                             "https://s.example/new"], pa.string()),
            "warc_ts": pa.array([BASE_TS_US + 10_000_000_000] * 2,
                                pa.int64()).cast(pa.timestamp("us")),
            "html": pa.array([_page("v2-0-update"), _page("v1-new")],
                             pa.binary()),
            "lang": pa.array(["en", "en"], pa.string()),
        })
        ev_path = str(tmp_path / "tail.parquet")
        pq.write_table(events, ev_path)
        ingest_epoch(ev_path, lake, 1, CFG)
        state = {r["url"]: r for r in lake.read_state().to_pylist()}
        assert len(state) == 9
        assert state["https://s.example/p0"]["text"] == \
            extract(_page("v2-0-update")).text
        assert "https://s.example/new" in state

    def test_seed_maintains_dup_index(self, tmp_path):
        """Seeding with maintain_dup_index builds the fp keyspace: two
        urls carrying identical content attribute to the first writer."""
        from opendataloader_pdf_ray.cdc import DupIndex, dup_index_root

        same = _page("identical-content")
        segs = [str(tmp_path / "seg.warc")]
        write_warc(segs[0], [
            ("https://s.example/a", "2026-01-01T00:00:00Z", same),
            ("https://s.example/b", "2026-01-01T00:00:05Z", same),
            ("https://s.example/c", "2026-01-01T00:00:09Z", _page("other")),
        ])
        cfg = CDCConfig(num_partitions=4, num_salts=2, epoch_size=60,
                        extract_batch_size=16, extract_concurrency=2,
                        maintain_dup_index=True)
        lake_root = str(tmp_path / "lake")
        seed_from_warc(segs, lake_root, cfg)
        lake = Lake(lake_root, None)
        index = DupIndex(dup_index_root(lake_root))
        rows = {r["url"]: r for r in pq_concat(
            index.attribute(lake.read_dataset()))}
        assert rows["https://s.example/a"]["is_dup"] is False
        assert rows["https://s.example/b"]["is_dup"] is True
        assert rows["https://s.example/b"]["dup_of"] == "https://s.example/a"
        assert rows["https://s.example/c"]["is_dup"] is False

    def test_full_loop_warc_to_wet(self, tmp_path):
        """Crawl WARC in → lake → WET out: the WET payloads are the
        extracted texts of the LWW winners."""
        from opendataloader_pdf_ray.sources.warc import export_wet

        segs = _snapshot(tmp_path)
        lake_root = str(tmp_path / "lake")
        seed_from_warc(segs, lake_root, CFG)
        out = str(tmp_path / "wet")
        export_wet(lake_root, out)
        got = {}
        for name in sorted(os.listdir(out)):
            with open(os.path.join(out, name), "rb") as f:
                for r in parse_warc_bytes(f.read()):
                    got[r["url"]] = r["html"].decode("utf-8")
        assert len(got) == 8
        assert got["https://s.example/p3"] == \
            extract(_page("v2-3-refetch")).text
