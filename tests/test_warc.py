"""WARC source tests: parser edge cases + distributed read round trip."""

import os

import pytest

from opendataloader_pdf_ray.sources.warc import (
    parse_warc_bytes, read_warc, write_warc,
)


def _record(rtype, url, body, extra=""):
    payload = body if rtype != "response" else (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body)
    hdr = (f"WARC/1.0\r\nWARC-Type: {rtype}\r\n"
           f"WARC-Target-URI: {url}\r\n"
           f"WARC-Date: 2026-01-01T00:00:00Z\r\n{extra}"
           f"Content-Length: {len(payload)}\r\n\r\n").encode()
    return hdr + payload + b"\r\n\r\n"


class TestParser:
    def test_mixed_record_types(self):
        data = (_record("warcinfo", "", b"robots: classic")
                + _record("request", "https://x.example/a", b"GET /a HTTP/1.1")
                + _record("response", "https://x.example/a", b"<p>hi</p>"))
        rows = parse_warc_bytes(data)
        assert [r["record_type"] for r in rows] == \
            ["warcinfo", "request", "response"]
        assert rows[2]["html"] == b"<p>hi</p>"
        assert rows[0]["html"] is None and rows[1]["html"] is None

    def test_binary_safe_payload(self):
        # bodies containing CRLF-CRLF and WARC/ must not confuse the scanner
        tricky = b"<p>a\r\n\r\nWARC/1.0 fake</p>"
        data = _record("response", "https://x.example/t", tricky) \
            + _record("response", "https://x.example/u", b"<p>next</p>")
        rows = parse_warc_bytes(data)
        assert len(rows) == 2
        assert rows[0]["html"] == tricky
        assert rows[1]["url"] == "https://x.example/u"

    def test_truncated_tail_is_dropped_not_fatal(self):
        good = _record("response", "https://x.example/ok", b"<p>ok</p>")
        rows = parse_warc_bytes(good + b"WARC/1.0\r\nWARC-Type: resp")
        assert len(rows) == 1 and rows[0]["url"] == "https://x.example/ok"

    def test_garbage_prefix_skipped(self):
        good = _record("response", "https://x.example/ok", b"<p>ok</p>")
        rows = parse_warc_bytes(b"not a warc header\r\n" + good)
        assert len(rows) == 1


class TestRoundTrip:
    def test_write_read_dataset(self, ray_session, tmp_path):
        seg = tmp_path / "seg-0000.warc"
        recs = [(f"https://x.example/{i:03d}", "2026-01-01T00:00:00Z",
                 f"<html><body><p>doc {i} body</p></body></html>".encode())
                for i in range(25)]
        write_warc(str(seg), recs)
        out = read_warc(str(seg)).take_all()
        assert len(out) == 25
        assert sorted(r["url"] for r in out) == [r[0] for r in recs]
        by_url = {r["url"]: r for r in out}
        assert by_url["https://x.example/007"]["html"] == recs[7][2]
        assert all(r["segment"] == "seg-0000.warc" for r in out)

    def test_writer_deterministic(self, tmp_path):
        a, b = tmp_path / "a.warc", tmp_path / "b.warc"
        recs = [("https://x.example/d", "2026-01-01T00:00:00Z", b"<p>x</p>")]
        write_warc(str(a), recs)
        write_warc(str(b), recs)
        assert a.read_bytes() == b.read_bytes()


class TestWetExport:
    @pytest.mark.usefixtures("ray_session")
    def test_wet_roundtrip_and_resumable(self, tmp_path):
        """export_wet writes live extracted text as conversion records;
        re-reading the segments recovers byte-identical text per url;
        existing segments are skipped on re-run; bytes are deterministic."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from opendataloader_pdf_ray.cdc import Lake, replay
        from opendataloader_pdf_ray.config import CDCConfig
        from opendataloader_pdf_ray.fixtures.gen import gen_events
        from opendataloader_pdf_ray.sources.warc import export_wet

        events = tmp_path / "events.parquet"
        pq.write_table(gen_events(120, 30, seed=42), str(events))
        cfg = CDCConfig(num_partitions=4, num_salts=2, epoch_size=60,
                        extract_batch_size=16, extract_concurrency=2)
        lake_root = str(tmp_path / "lake")
        replay(str(events), lake_root, cfg, mode="epoch")
        lake = Lake(lake_root, None)
        out = str(tmp_path / "wet")
        summary = export_wet(lake_root, out)
        assert not any(s["skipped"] for s in summary)

        got = {}
        for name in sorted(os.listdir(out)):
            with open(os.path.join(out, name), "rb") as f:
                for r in parse_warc_bytes(f.read(), segment=name):
                    assert r["record_type"] == "conversion"
                    got[r["url"]] = r["html"].decode("utf-8")
        want = lake.read_state()
        assert set(got) == set(want["url"].to_pylist())
        for url, text in zip(want["url"].to_pylist(),
                             want["text"].to_pylist()):
            assert got[url] == (text or ""), url

        # resumable: re-run skips everything
        again = export_wet(lake_root, out)
        assert all(s["skipped"] for s in again)
        # deterministic bytes: regenerate one victim segment byte-equal
        victim = sorted(os.listdir(out))[0]
        vpath = os.path.join(out, victim)
        with open(vpath, "rb") as f:
            before = f.read()
        os.unlink(vpath)
        export_wet(lake_root, out)
        with open(vpath, "rb") as f:
            assert f.read() == before


class TestGzipSegments:
    @pytest.mark.usefixtures("ray_session")
    def test_per_record_gzip_members_parse(self, tmp_path):
        """CC-style .warc.gz: each record its own gzip member, concatenated
        — read_warc inflates the multi-member stream and parses all."""
        import gzip

        recs = [(f"https://g.example/p{i}", f"2026-03-01T00:00:0{i}Z",
                 f"<p>gz {i}</p>".encode()) for i in range(4)]
        plain = str(tmp_path / "seg.warc")
        write_warc(plain, recs)
        with open(plain, "rb") as f:
            data = f.read()
        # split back into records and gzip each member separately
        parts, pos = [], 0
        while True:
            nxt = data.find(b"WARC/1.0", pos + 1)
            if nxt < 0:
                parts.append(data[pos:])
                break
            parts.append(data[pos:nxt])
            pos = nxt
        gz = str(tmp_path / "seg.warc.gz")
        with open(gz, "wb") as f:
            for p in parts:
                f.write(gzip.compress(p))
        ds = read_warc(gz)
        rows = ds.take_all()
        assert sorted(r["url"] for r in rows) == \
            sorted(u for u, _, _ in recs)
        assert all(r["html"] is not None for r in rows)

    def test_gz_and_plain_parse_identically_fuzz(self, tmp_path):
        """Property: for ANY record-boundary split of a segment into gzip
        members, the inflated parse equals the plain parse."""
        import gzip
        import random

        rng = random.Random(7)
        recs = [(f"https://f.example/p{i}", f"2026-03-02T00:00:0{i}Z",
                 bytes(rng.randbytes(rng.randint(0, 200)))) for i in range(6)]
        plain = str(tmp_path / "f.warc")
        write_warc(plain, recs)
        with open(plain, "rb") as f:
            data = f.read()
        starts = [0]
        pos = 0
        while True:
            nxt = data.find(b"WARC/1.0", pos + 1)
            if nxt < 0:
                break
            starts.append(nxt)
            pos = nxt
        for trial in range(5):
            # random grouping of records into gzip members
            cuts = sorted(rng.sample(starts[1:], rng.randint(0, len(starts) - 1)))
            bounds = [0] + cuts + [len(data)]
            blob = b"".join(gzip.compress(data[a:b])
                            for a, b in zip(bounds, bounds[1:]))
            inflated = gzip.decompress(blob)
            assert inflated == data
            a = parse_warc_bytes(inflated)
            b = parse_warc_bytes(data)
            assert a == b
