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


class TestBpeProperties:
    """Byte-level BPE (functions/bpe.py): total on arbitrary text,
    deterministic, word-compositional, never under-counts whitespace."""

    @given(st.text(max_size=300))
    @settings(max_examples=150, deadline=None)
    def test_total_deterministic_compositional(self, text):
        from opendataloader_pdf_ray.functions.bpe import BpeTokenizer

        t1, t2 = BpeTokenizer(), BpeTokenizer()
        ids = t1.encode(text)
        assert ids == t2.encode(text)          # instance-independent
        assert len(ids) == t1.count(text)      # count == encode length
        assert t1.count(text) >= len(text.split())  # never under-fills
        # EOW-terminated merges: per-word encodes concatenate exactly
        per_word = [tok for w in text.split() for tok in t2.encode(w)]
        assert per_word == ids

    @given(st.text(alphabet=st.characters(codec="utf-8"), max_size=80))
    @settings(max_examples=100, deadline=None)
    def test_any_unicode_tokenizes(self, word):
        from opendataloader_pdf_ray.functions.bpe import EOW, BpeTokenizer

        toks = BpeTokenizer().encode(word)
        if word.split():
            assert toks  # byte-level: no OOV path, something always comes out


class TestPackBlocksProperty:
    """pack_blocks/unpack_blocks round-trip byte-identically on whatever
    the extractor produces from arbitrary soup (nulls included)."""

    @given(st.lists(html_soup(), min_size=1, max_size=6),
           st.booleans())
    @settings(max_examples=60, deadline=None)
    def test_roundtrip(self, soups, with_null):
        import pyarrow as pa

        from opendataloader_pdf_ray.stages.extract_stage import (
            HtmlExtractor,
            pack_blocks,
            unpack_blocks,
        )

        htmls = [s.encode("utf-8", "ignore") for s in soups]
        if with_null:
            htmls.append(None)  # tombstone payload → null blocks
        n = len(htmls)
        batch = pa.table({
            "url": pa.array([f"u{i}" for i in range(n)], pa.string()),
            "html": pa.array(htmls, pa.binary()),
        })
        out = HtmlExtractor()(batch)
        restored = unpack_blocks(pack_blocks(out))
        assert restored.column_names == out.column_names
        assert restored["blocks"].combine_chunks().equals(
            out["blocks"].combine_chunks())
