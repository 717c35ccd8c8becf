"""Tests for the user-facing API, serializers, triage, text similarity, and
multimodal stub stages."""

import numpy as np
import pyarrow as pa
import pytest

from opendataloader_pdf_ray.api import add_filter_rule, convert, process_dataset
from opendataloader_pdf_ray.config import ExtractorConfig
from opendataloader_pdf_ray.functions.multimodal import (
    AudioFrameSampler, ImageDecoder, ImageFeaturizer,
)
from opendataloader_pdf_ray.functions.text_sim import (
    levenshtein, similarity, trust_stream,
)
from opendataloader_pdf_ray.stages.triage import TriageRouter

HTML = (b'<div class="page"><h1>Title</h1><p>Body text.</p>'
        b"<ul><li>a</li><li>b</li></ul>"
        b"<table><tr><th>K</th><th>V</th></tr><tr><td>x</td><td>y</td></tr></table></div>")


class TestConvert:
    def test_all_formats(self):
        out = convert(HTML, output_formats=["text", "markdown", "json", "html"])
        assert out["text"].startswith("Title\nBody text.")
        assert out["markdown"].startswith("# Title")
        assert out["json"]["kids"][0]["type"] == "heading"
        assert "<h1>Title</h1>" in out["html"]
        assert out["metrics"]["n_pages"] == 1

    def test_html_round_trip_text_stable(self):
        """extract(serialize(extract(x))) — re-extracting our own HTML output
        yields the same linearized text (serializer fidelity)."""
        from opendataloader_pdf_ray.extractor import extract_text

        first = convert(HTML, output_formats=["html", "text"])
        again = extract_text(first["html"].encode())
        assert again == first["text"]

    def test_unknown_format_rejected(self):
        with pytest.raises(ValueError, match="unknown output formats"):
            convert(HTML, output_formats=["pdf"])

    def test_custom_filter_rule(self):
        cfg = add_filter_rule(ExtractorConfig(), r"SECRET-\d+", "[redacted]")
        out = convert(b"<p>code SECRET-12345 here</p>", cfg)
        assert out["text"] == "code [redacted] here"

    def test_process_dataset(self, ray_session):
        import ray.data

        ds = ray.data.from_arrow(pa.table({"html": pa.array([HTML] * 10, pa.binary())}))
        out = process_dataset(ds, concurrency=2).to_pandas()
        assert len(out) == 10 and out["text"].nunique() == 1


class TestTriage:
    def test_routing_signals(self):
        r = TriageRouter()
        assert r.route_one(b"<p>plain text</p>") == ("local", 0.9)
        assert r.route_one(b"<table><tr><td>x</td></tr></table>") == ("backend", 0.9)
        assert r.route_one(b"<img src=x>") == ("backend", 0.85)
        bad = ("<p>" + "�" * 50 + "</p>").encode()
        assert r.route_one(bad) == ("backend", 1.0)
        assert r.route_one(None) == ("local", 1.0)

    def test_batch_columns(self):
        r = TriageRouter()
        batch = pa.table({"html": pa.array([b"<p>t</p>", b"<table>"], pa.binary())})
        out = r(batch)
        assert out["route"].to_pylist() == ["local", "backend"]


class TestTextSimilarity:
    def test_levenshtein_matches_duckdb(self):
        import duckdb

        con = duckdb.connect()
        cases = [("kitten", "sitting"), ("", "abc"), ("same", "same"),
                 ("flaw", "lawn"), ("distributed", "deterministic")]
        for a, b in cases:
            want = con.execute("select levenshtein(?, ?)", [a, b]).fetchone()[0]
            assert levenshtein(a, b) == want, (a, b)

    def test_trust_stream_gate(self):
        assert trust_stream("hello world text", "hello world test")
        assert not trust_stream("hello world", "entirely different thing")
        assert similarity("", "") == 1.0


class TestMultimodal:
    def test_image_decoder_fake_deterministic(self):
        dec = ImageDecoder()
        batch = pa.table({"image": pa.array([b"\x89PNG fake", None], pa.binary())})
        out1, out2 = dec(batch), dec(batch)
        assert out1["width"].to_pylist() == out2["width"].to_pylist()
        assert out1["width"][1].as_py() is None  # null payload → null metadata

    def test_image_decoder_strict_raises(self):
        dec = ImageDecoder(mode="strict")
        with pytest.raises(NotImplementedError, match="imaging library"):
            dec(pa.table({"image": pa.array([b"x"], pa.binary())}))

    def test_image_decoder_pil_import_gate(self):
        """mode='pil' either imports Pillow in __init__ (once per actor) or
        raises NotImplementedError at construction — never mid-batch."""
        try:
            import PIL  # noqa: F401
            have_pil = True
        except ImportError:
            have_pil = False
        if not have_pil:
            with pytest.raises(NotImplementedError, match="Pillow"):
                ImageDecoder(mode="pil")
            return
        # real path (runs only where Pillow is installed): a 1x1 PNG
        import base64
        png = base64.b64decode(
            b"iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR4"
            b"nGNgYGAAAAAEAAH2FzhVAAAAAElFTkSuQmCC")
        out = ImageDecoder(mode="pil")(
            pa.table({"image": pa.array([png], pa.binary())}))
        assert out["width"].to_pylist() == [1]
        assert out["height"].to_pylist() == [1]
        assert out["format"].to_pylist() == ["png"]

    def test_featurizer_fixed_dim(self):
        f = ImageFeaturizer(dim=32)
        out = f(pa.table({"image": pa.array([b"payload-a", b"payload-b"], pa.binary())}))
        embs = out["embedding"].to_pylist()
        assert len(embs[0]) == 32 and embs[0] != embs[1]
        # same seed → same projection on another "actor"
        f2 = ImageFeaturizer(dim=32)
        assert np.allclose(f2(out.select(["image"]))["embedding"][0].as_py(), embs[0])

    def test_audio_frame_sampler(self):
        s = AudioFrameSampler(frames_per_clip=3)
        out = s(pa.table({"clip_id": pa.array([7], pa.int64()),
                          "audio": pa.array([bytes(range(256)) * 4], pa.binary())}))
        assert out.num_rows == 3
        assert out["clip_id"].to_pylist() == [7, 7, 7]
        assert out["frame_offset"].to_pylist() == [0, 341, 682]

    def test_pipeline_plumbing(self, ray_session):
        import ray.data

        payloads = [bytes([i]) * 100 for i in range(20)]
        ds = ray.data.from_arrow(pa.table({"image": pa.array(payloads, pa.binary())}))
        out = (ds.map_batches(ImageDecoder, batch_size=4, concurrency=2,
                              batch_format="pyarrow")
                 .map_batches(ImageFeaturizer, batch_size=4, concurrency=2,
                              batch_format="pyarrow"))
        df = out.to_pandas()
        assert len(df) == 20 and {"width", "format", "embedding"} <= set(df.columns)
