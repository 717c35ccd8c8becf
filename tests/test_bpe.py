"""Deterministic byte-level BPE (functions/bpe.py) and pack --tokenizer
(r4 verdict item #3): vendored merges table pinned against the trainer,
pinned token counts, pack-by-BPE manifest invariants, and the tokenizer
stamp forcing a rewrite on tokenizer change."""

import pytest

from opendataloader_pdf_ray.functions.bpe import (
    EOW,
    MERGES,
    SEED_CORPUS,
    BpeTokenizer,
    make_counter,
    train_merges,
)


class TestBpeTokenizer:
    def test_vendored_table_matches_trainer(self):
        """The table is DERIVED data: re-deriving it from the vendored
        corpus must reproduce it exactly — pins trainer AND table."""
        assert train_merges(SEED_CORPUS, 384) == MERGES
        assert len(MERGES) == 384

    def test_pinned_token_counts(self):
        """Golden counts: any change to corpus/trainer/encoder shows up
        here before it silently re-sizes every packed sequence."""
        tok = BpeTokenizer()
        assert tok.count("the") == 1          # frequent word → one token
        assert tok.count("the quick brown fox") == 6
        assert tok.count("") == 0
        # unseen-alphabet input falls back toward bytes, never fails
        assert tok.count("字") == 4           # 3 UTF-8 bytes + EOW
        assert tok.encode("the") == [481]

    def test_count_at_least_whitespace(self):
        tok = BpeTokenizer()
        for text in (SEED_CORPUS, "hello world", "a b c", "Zürich 東京"):
            assert tok.count(text) >= len(text.split())

    def test_encode_roundtrip_structure(self):
        """Every word contributes ≥1 token and count == len(encode)."""
        tok = BpeTokenizer()
        text = "data processing engines stream change events"
        ids = tok.encode(text)
        assert len(ids) == tok.count(text)
        # EOW-terminated merges mean words never share tokens: summing
        # per-word encodes equals the full encode
        per_word = [t for w in text.split() for t in tok.encode(w)]
        assert per_word == ids

    def test_word_cache_is_transparent(self):
        tok = BpeTokenizer()
        a = tok.encode("tokenization")
        b = tok.encode("tokenization")
        assert a == b and tok._word_cache["tokenization"] == a

    def test_make_counter(self):
        assert make_counter("whitespace")("a b  c") == 3
        assert make_counter("bpe")("the") == 1
        with pytest.raises(ValueError, match="unknown tokenizer"):
            make_counter("tiktoken")

    def test_determinism_fresh_instances(self):
        t1, t2 = BpeTokenizer(), BpeTokenizer()
        assert t1.encode(SEED_CORPUS[:500]) == t2.encode(SEED_CORPUS[:500])


@pytest.mark.usefixtures("ray_session")
class TestPackWithBpe:
    def test_pack_bpe_manifest_and_stamp_rewrite(self, tmp_path):
        from opendataloader_pdf_ray.cdc.pack import pack_lake

        from test_lakediff import seed_p

        lake = seed_p(tmp_path / "lake", 2)
        out = str(tmp_path / "out")
        ws = pack_lake(lake, out, budget=16, tokenizer="whitespace")
        assert all(not s["skipped"] for s in ws)
        # same tip + same tokenizer → skip
        again = pack_lake(lake, out, budget=16, tokenizer="whitespace")
        assert all(s["skipped"] for s in again)
        # same tip, DIFFERENT tokenizer → full rewrite (stamp mismatch)
        bpe = pack_lake(lake, out, budget=16, tokenizer="bpe")
        assert all(not s["skipped"] for s in bpe)
        # BPE splits the toy vocabulary into more tokens than whitespace
        assert sum(s["tokens"] for s in bpe) > sum(
            s["tokens"] for s in ws)
        # and the BPE pack is deterministic across runs
        out2 = str(tmp_path / "out2")
        bpe2 = pack_lake(lake, out2, budget=16, tokenizer="bpe")
        assert sum(s["tokens"] for s in bpe2) == sum(
            s["tokens"] for s in bpe)

    def test_cli_pack_tokenizer(self, tmp_path, capsys):
        import json

        from opendataloader_pdf_ray.__main__ import main

        from test_lakediff import seed_p

        lake = seed_p(tmp_path / "lake", 2)
        assert main(["pack", lake.root, str(tmp_path / "out"),
                     "--budget", "16", "--tokenizer", "bpe"]) == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["partitions_written"] > 0 and rep["tokens"] > 0
