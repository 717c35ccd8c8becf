"""--password analog: ODLSEAL1 payload envelope (sources/sealed.py) and its
wiring through extract() / the CLI's skip-and-continue loop, mirroring the
reference's encrypted-PDF handling (Config.java:65,150-165,
DocumentProcessor.java:620-622)."""

import subprocess
import sys

import pytest

from opendataloader_pdf_ray.config import ExtractorConfig
from opendataloader_pdf_ray.extractor import extract
from opendataloader_pdf_ray.sources.sealed import (InvalidPassword, is_sealed,
                                                   seal, unseal)

HTML = b"<html><body><p>secret paragraph one two</p></body></html>"


class TestEnvelope:
    def test_roundtrip_and_determinism(self):
        blob = seal(HTML, "pw1", salt_from="https://a.example/x")
        assert is_sealed(blob) and not is_sealed(HTML)
        assert unseal(blob, "pw1") == HTML
        # deterministic: same payload + password + salt basis ⇒ same bytes
        assert blob == seal(HTML, "pw1", salt_from="https://a.example/x")
        # different salt basis ⇒ different bytes, same plaintext
        other = seal(HTML, "pw1", salt_from="https://a.example/y")
        assert other != blob and unseal(other, "pw1") == HTML

    def test_wrong_or_missing_password_raises(self):
        blob = seal(HTML, "pw1")
        with pytest.raises(InvalidPassword, match="tag mismatch"):
            unseal(blob, "pw2")
        with pytest.raises(InvalidPassword, match="no password"):
            unseal(blob, None)

    def test_tampered_ciphertext_rejected(self):
        blob = bytearray(seal(HTML, "pw1"))
        blob[-1] ^= 0xFF
        with pytest.raises(InvalidPassword):
            unseal(bytes(blob), "pw1")

    def test_unsealed_passthrough(self):
        assert unseal(HTML, None) == HTML
        assert unseal(HTML, "anything") == HTML


class TestExtractIntegration:
    def test_extract_opens_sealed_payload(self):
        blob = seal(HTML, "pw1")
        plain = extract(HTML, ExtractorConfig())
        sealed = extract(blob, ExtractorConfig(password="pw1"))
        assert sealed.text == plain.text  # byte-equal invariant holds

    def test_extract_without_password_fails_as_non_content(self):
        blob = seal(HTML, "pw1")
        with pytest.raises(InvalidPassword):
            extract(blob, ExtractorConfig())
        with pytest.raises(InvalidPassword):
            extract(blob, ExtractorConfig(password="nope"))


class TestCliPassword:
    def test_convert_skip_and_continue(self, tmp_path):
        """One sealed + one plain file: without --password the sealed file
        fails (exit 1, logged) while the plain one converts; with the right
        password both convert (exit 0)."""
        (tmp_path / "plain.html").write_bytes(HTML)
        (tmp_path / "sealed.html").write_bytes(seal(HTML, "pw1"))
        out = tmp_path / "out"

        r = subprocess.run(
            [sys.executable, "-m", "opendataloader_pdf_ray", "convert",
             str(tmp_path / "plain.html"), str(tmp_path / "sealed.html"),
             "--format", "text", "--output-dir", str(out)],
            capture_output=True, text=True, cwd="/root/repo")
        assert r.returncode == 1
        assert "sealed.html" in r.stderr and "1 failed" in r.stderr
        assert (out / "plain.txt").exists()
        assert not (out / "sealed.txt").exists()

        r2 = subprocess.run(
            [sys.executable, "-m", "opendataloader_pdf_ray", "convert",
             str(tmp_path / "plain.html"), str(tmp_path / "sealed.html"),
             "--format", "text", "--output-dir", str(out),
             "--password", "pw1"],
            capture_output=True, text=True, cwd="/root/repo")
        assert r2.returncode == 0, r2.stderr
        assert (out / "sealed.txt").read_text() == \
            (out / "plain.txt").read_text()


class TestStreamQuarantine:
    def test_extractor_actor_quarantines_sealed_record(self, capsys):
        """A sealed record the stream has no password for becomes null text
        (like a tombstone payload) with a warning — the pipeline survives."""
        import pyarrow as pa

        from opendataloader_pdf_ray.stages.extract_stage import HtmlExtractor

        ex = HtmlExtractor(ExtractorConfig(), include_blocks=False)
        batch = pa.table({"html": pa.array(
            [HTML, seal(HTML, "unknown-pw")], pa.binary())})
        out = ex(batch)
        texts = out["text"].to_pylist()
        assert texts[0] is not None and texts[1] is None
        assert "quarantined" in capsys.readouterr().err

    def test_extractor_actor_opens_sealed_with_password(self):
        import pyarrow as pa

        from opendataloader_pdf_ray.stages.extract_stage import HtmlExtractor

        ex = HtmlExtractor(ExtractorConfig(password="pw1"),
                           include_blocks=False)
        out = ex(pa.table({"html": pa.array(
            [HTML, seal(HTML, "pw1")], pa.binary())}))
        texts = out["text"].to_pylist()
        assert texts[0] == texts[1]  # byte-equal through the seal

    def test_image_assets_gate(self):
        from opendataloader_pdf_ray.extractor.assets import (
            extract_image_assets)

        html = (b'<html><body><img alt="f" src="data:image/png;base64,'
                b'aGVsbG8="/></body></html>')
        plain = extract_image_assets(html, ExtractorConfig())
        sealed_assets = extract_image_assets(
            seal(html, "pw1"), ExtractorConfig(password="pw1"))
        assert sealed_assets == plain and plain[0]["data"] == b"hello"
        with pytest.raises(InvalidPassword):
            extract_image_assets(seal(html, "pw1"), ExtractorConfig())
