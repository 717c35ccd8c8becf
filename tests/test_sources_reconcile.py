"""Tests for source readers, validation/quarantine, and variant reconcile."""

import base64
import json

import pyarrow as pa
import pytest

import ray.data

from opendataloader_pdf_ray.functions.reconcile import reconcile_variants
from opendataloader_pdf_ray.sources.readers import quarantine_split, read_events


@pytest.mark.usefixtures("ray_session")
class TestSources:
    def test_read_events_jsonl(self, tmp_path):
        path = tmp_path / "events.jsonl"
        rows = [
            {"seq": 0, "op": "I", "url": "https://a.example/x", "warc_ts": 1000,
             "html": base64.b64encode(b"<p>hi</p>").decode(), "lang": "en"},
            {"seq": 1, "op": "D", "url": "https://a.example/x", "warc_ts": 2000,
             "html": None, "lang": "en"},
        ]
        path.write_text("\n".join(json.dumps(r) for r in rows))
        ds = read_events(str(path))
        # block order is not guaranteed (streaming executor may reorder read
        # tasks); the events contract orders by seq, so sort before asserting
        out = sorted(ds.take_all(), key=lambda r: r["seq"])
        assert out[0]["html"] == b"<p>hi</p>"
        assert out[1]["html"] is None
        assert ds.schema().names == ["seq", "op", "url", "warc_ts", "html", "lang"]

    def test_quarantine_split(self):
        t = pa.table({
            "seq": pa.array([0, 1, 2, 3], pa.int64()),
            "op": pa.array(["I", "X", "U", "D"], pa.string()),
            "url": pa.array(["https://ok.example", "https://ok.example",
                             "not-a-url", "https://ok.example"], pa.string()),
            "warc_ts": pa.array([1, 2, 3, 4], pa.timestamp("us")),
            "html": pa.array([b"<p>a</p>", b"<p>b</p>", b"<p>c</p>", None], pa.binary()),
            "lang": pa.array(["en"] * 4, pa.string()),
        })
        good, bad = quarantine_split(ray.data.from_arrow(t))
        assert sorted(r["seq"] for r in good.take_all()) == [0, 3]
        assert sorted(r["seq"] for r in bad.take_all()) == [1, 2]  # bad op, bad url


@pytest.mark.usefixtures("ray_session")
class TestReconcile:
    def test_trust_stream_gate(self):
        local = ray.data.from_arrow(pa.table({
            "url": pa.array(["u1", "u2", "u3"]),
            "text": pa.array(["hello world this is text",
                              "completely different content here",
                              "local only row"]),
        }))
        backend = ray.data.from_arrow(pa.table({
            "url": pa.array(["u1", "u2", "u4"]),
            "text": pa.array(["hello world this is test",   # similar → trust local
                              "model produced other words",  # dissimilar → backend
                              "backend only row"]),
        }))
        out = {r["url"]: r for r in
               reconcile_variants(local, backend).take_all()}
        assert out["u1"]["source"] == "local"
        assert out["u1"]["text"] == "hello world this is text"
        assert out["u2"]["source"] == "backend"
        assert out["u3"]["source"] == "local"   # single-variant passthrough
        assert out["u4"]["source"] == "backend"
