"""Property-based robustness: the extractor must never raise and must be
deterministic on ARBITRARY input — the reference's skip-and-continue contract
(``cli/CLIMain.java:221-253``) plus the byte-identical invariant."""

from hypothesis import given, settings
from hypothesis import strategies as st

from opendataloader_pdf_ray.api import convert
from opendataloader_pdf_ray.config import ExtractorConfig
from opendataloader_pdf_ray.extractor import extract

TAGS = ["<p>", "</p>", "<div>", "</div>", "<h1>", "</h2>", "<table>", "<tr>",
        "<td>", "</table>", "<ul>", "<li>", "<br>", "<img>", '<div class="page">',
        '<p style="display:none">', '<span style="position:absolute;left:10px">',
        "<figure>", "<figcaption>", "<pre>", "수신:", "&amp;", "&#x41;", "<!--", "-->"]


@st.composite
def html_soup(draw):
    parts = draw(st.lists(st.one_of(
        st.sampled_from(TAGS),
        st.text(max_size=30),
        st.binary(max_size=20).map(lambda b: b.decode("latin1")),
    ), max_size=40))
    return "".join(parts)


class TestFuzz:
    @given(html_soup())
    @settings(max_examples=150, deadline=None)
    def test_never_raises_and_deterministic(self, soup):
        payload = soup.encode("utf-8", errors="replace")
        r1 = extract(payload)
        r2 = extract(payload)
        assert r1.text == r2.text
        assert "�" not in r1.text  # invalid chars always replaced

    @given(st.binary(max_size=300))
    @settings(max_examples=100, deadline=None)
    def test_arbitrary_bytes(self, payload):
        r1 = extract(payload)
        assert r1.text == extract(payload).text

    @given(html_soup())
    @settings(max_examples=50, deadline=None)
    def test_all_serializers_total(self, soup):
        out = convert(soup.encode("utf-8", errors="replace"),
                      ExtractorConfig(sanitize=True),
                      output_formats=["text", "markdown", "json", "html"])
        assert isinstance(out["json"], dict)


class TestOperatorProperties:
    @given(st.text(max_size=120))
    @settings(max_examples=200, deadline=None)
    def test_normalize_url_idempotent_and_total(self, s):
        from opendataloader_pdf_ray.functions.urls import normalize_url
        once = normalize_url(s)       # never raises on arbitrary input
        assert normalize_url(once) == once

    @given(st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=60),
           st.lists(st.sampled_from("abcdefgh"), min_size=6, max_size=12))
    @settings(max_examples=100, deadline=None)
    def test_winnowing_shared_run_guarantee(self, prefix, shared):
        # any shared run of >= window+ngram-1 = 6 words must produce at
        # least one common fingerprint hash (Schleimer et al. theorem 1)
        from opendataloader_pdf_ray.functions.text_stats import (
            WinnowFingerprinter,
        )
        w = WinnowFingerprinter()
        a = " ".join(prefix + shared)
        b = " ".join(shared)
        _, fa = w.select(a)
        _, fb = w.select(b)
        assert set(fb.tolist()) & set(fa.tolist())

    @given(st.text(max_size=200))
    @settings(max_examples=100, deadline=None)
    def test_simhash_stable_across_instances(self, text):
        from opendataloader_pdf_ray.functions.dedup import SimHasher
        assert SimHasher().sig(text) == SimHasher().sig(text)
