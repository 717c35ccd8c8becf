"""Deterministic, dependency-free byte-level BPE tokenizer.

Training-shard packing (``cdc/pack.py``, ``doc_pack_sequences``) budgets
sequences by token count; whitespace tokens mis-size every sequence vs a
real subword vocabulary (r4 verdict item #3 — a 100-TB pack with the wrong
token count mis-sizes every training sequence). This module provides a
self-contained BPE so packs can budget by subword tokens with zero external
dependencies and full determinism:

- **Vendored merges table** (``MERGES``): 384 byte-pair merges derived
  once, offline, from the vendored ``SEED_CORPUS`` by the classic Sennrich
  frequency-merge procedure (``train_merges`` below — ties broken by the
  smallest pair, so training is seed-free and order-free).
  ``tests/test_bpe.py`` re-derives the table from the corpus and asserts
  equality, pinning BOTH the trainer and the table.
- **Byte-level**: words are UTF-8 byte sequences + an end-of-word marker
  (id 256), so ANY input (any language, binary-ish noise) tokenizes without
  an out-of-vocabulary path — the GPT-2 design point, at toy vocabulary
  scale.
- **Whitespace pre-tokenization**: ``text.split()`` (identical to the
  whitespace mode's splitter), so BPE token counts are comparable and
  ``count() >= whitespace count`` can never under-fill a sequence budget.

Scale note: counting is word-memoized (``_word_cache``) — natural text is
Zipf-distributed, so per-batch cost approaches one merge-loop per DISTINCT
word, not per occurrence. The cache lives per tokenizer instance; pack
tasks hold one instance per partition task.

Reference anchor: the reference has no tokenizer (it emits text formats —
``core/writers/MarkdownGenerator.java`` etc.); this is a training-data
extension per the north rule's LLM-corpus axis.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Tuple

EOW = 256  # end-of-word marker id (bytes occupy 0..255)

SEED_CORPUS = (
    "The quick brown fox jumps over the lazy dog. "
    "Data processing engines stream change events into partitioned lakes. "
    "Web pages carry headings, paragraphs, tables, lists and captions. "
    "Tokenization converts text into integer sequences for training. "
    "the of and to in a is that for it as with was on are be this "
    "have from or by not word but what some we can out other were all "
    "there when up use your how said an each she which do their time if "
    "will way about many then them write would like so these her long make "
    "thing see him two has look more day could go come did number sound no "
    "most people my over know water than call first who may down side been "
    "now find any new work part take get place made live where after back "
    "little only round man year came show every good me give our under name "
    "very through just form sentence great think say help low line differ "
    "turn cause much mean before move right boy old too same tell does set "
    "three want air well also play small end put home read hand port large "
    "spell add even land here must big high such follow act why ask men "
    "change went light kind off need house picture try us again animal "
    "point mother world near build self earth father head stand own page "
    "should country found answer school grow study still learn plant cover "
    "food sun four between state keep eye never last let thought city tree "
    "cross farm hard start might story saw far sea draw left late run don't "
    "while press close night real life few north open seem together next "
    "white children begin got walk example ease paper group always music "
    "those both mark often letter until mile river car feet care second "
    "book carry took science eat room friend began idea fish mountain stop "
    "once base hear horse cut sure watch color face wood main enough plain "
    "girl usual young ready above ever red list though feel talk bird soon "
    "body dog family direct pose leave song measure door product black "
    "short numeral class wind question happen complete ship area half rock "
    "order fire south problem piece told knew pass since top whole king "
    "space heard best hour better true during hundred five remember step "
    "early hold west ground interest reach fast verb sing listen six table "
    "travel less morning ten simple several vowel toward war lay against "
    "pattern slow center love person money serve appear road map rain rule "
    "govern pull cold notice voice unit power town fine certain fly fall "
    "lead cry dark machine note wait plan figure star box noun field rest "
    "correct able pound done beauty drive stood contain front teach week "
    "final gave green oh quick develop ocean warm free minute strong "
    "special mind behind clear tail produce fact street inch multiply "
    "nothing course stay wheel full force blue object decide surface deep "
    "moon island foot system busy test record boat common gold possible "
    "plane stead dry wonder laugh thousand ago ran check game shape "
    "equate hot miss brought heat snow tire bring yes distant fill east "
    "paint language among"
)

# @MERGES_TABLE@ — generated by train_merges(SEED_CORPUS, 384); pinned by
# tests/test_bpe.py::test_vendored_table_matches_trainer
MERGES_STR = (
    "101,256;116,256;100,256;110,256;114,256;121,256;101,97;105,110;111,1"
    "17;116,104;108,256;101,261;115,256;115,116;97,110;107,256;97,114;101"
    ",114;111,110;111,114;111,119;103,256;104,256;111,111;114,101;115,258"
    ";99,257;101,110;101,260;108,97;108,267;108,257;108,259;109,256;111,2"
    "56;112,256;115,257;118,257;97,105;119,104;109,257;116,105;277,256;98"
    ",101;99,279;101,101;102,97;108,105;109,97;114,111;116,257;264,278;26"
    "5,110;97,103;101,118;102,105;108,101;117,114;119,97;271,259;97,112;9"
    "8,111;99,104;99,111;99,258;99,272;103,104;114,262;114,263;115,104;11"
    "5,269;295,260;323,258;97,260;97,267;101,269;102,256;103,279;104,263;"
    "108,262;111,260;113,117;114,105;115,101;115,105;116,97;116,268;119,2"
    "56;264,259;266,256;309,259;46,256;97,297;99,105;100,105;102,111;108,"
    "111;108,263;109,105;109,112;109,117;110,111;111,289;112,97;112,286;1"
    "12,306;116,101;117,110;118,268;118,274;265,261;266,268;274,257;275,2"
    "78;277,260;280,259;314,257;44,256;97,108;97,258;97,262;98,114;98,117"
    ";98,288;99,97;99,273;99,275;100,111;100,257;100,262;100,268;101,344;"
    "102,276;103,105;103,114;103,257;107,257;108,271;108,299;109,111;110,"
    "299;112,101;112,111;112,273;114,97;114,117;115,117;115,374;116,291;1"
    "16,328;119,101;119,276;120,256;263,256;263,261;264,257;265,289;265,3"
    "34;266,101;280,272;281,257;296,105;97,269;97,294;97,307;98,97;98,105"
    ";98,256;98,268;98,313;99,276;100,117;100,275;100,281;101,115;101,120"
    ";101,258;101,267;102,302;103,111;103,348;104,105;104,111;105,258;105"
    ",260;105,269;105,287;105,322;106,117;108,272;108,316;109,263;109,276"
    ";109,425;110,117;110,388;111,102;111,112;111,292;111,365;112,105;112"
    ",117;112,310;112,394;114,257;114,259;115,291;115,308;115,373;115,398"
    ";116,116;116,262;116,269;116,285;116,324;116,343;116,401;117,293;263"
    ",114;263,301;264,258;264,405;265,258;265,329;266,257;266,308;270,101"
    ";271,258;271,262;271,392;273,259;273,272;273,290;274,331;275,101;276"
    ",258;280,260;281,321;284,259;284,283;302,292;303,283;304,270;311,268"
    ";317,112;319,486;338,444;352,261;356,288;362,428;382,324;39,258;68,9"
    "7;84,104;84,111;87,101;97,98;97,100;97,102;97,109;97,115;97,256;97,2"
    "59;97,261;97,264;97,287;97,298;97,318;97,321;97,344;97,380;97,505;98"
    ",106;98,108;98,257;98,262;98,263;98,286;98,416;99,116;99,117;99,256;"
    "99,263;99,265;99,274;99,284;99,286;99,306;99,309;99,317;99,324;99,33"
    "0;99,332;99,349;99,353;99,354;99,413;99,431;100,101;100,264;100,280;"
    "100,291;100,311;100,314;100,324;100,339;100,371;100,377;100,401;100,"
    "410;100,488;100,497;101,108;101,121;101,270;101,282;101,283;101,289;"
    "101,321;101,322;101,338;101,353;101,368;101,450;102,102;102,114;102,"
    "117;102,257;102,258;102,264;102,280;102,306;102,336;102,339;102,345;"
    "102,347;102,367;102,372;102,388;102,412;102,417;102,489;103,117;103,"
    "264;103,268;103,281;103,291;103,325;103,330;103,349;103,359;103,372;"
    "103,373;103,404;103,420;103,433;103,579;104,265;104,268;104,276;104,"
    "299;104,316;104,345;104,359;104,364;104,367;104,369;104,375;104,404;"
    "104,419;104,420;104,487;104,501;104,569;105,108;105,115;105,122;105,"
    "261;105,283;105,289;105,292;105,305;105,329;105,333"
)


def _parse_merges(s: str) -> List[Tuple[int, int]]:
    out: List[Tuple[int, int]] = []
    for p in s.split(";"):
        if p:
            a, b = p.split(",")
            out.append((int(a), int(b)))
    return out


MERGES: List[Tuple[int, int]] = _parse_merges(MERGES_STR)


def train_merges(corpus: str, n_merges: int) -> List[Tuple[int, int]]:
    """Sennrich-style BPE training over UTF-8 bytes + EOW. Deterministic:
    the best pair is (max count, then smallest pair ids) — no dict-order
    or hash dependence. Used offline to derive ``MERGES`` and in tests to
    re-pin it; NOT called in any hot path."""
    import collections

    words = collections.Counter(corpus.split())
    vocab = {tuple(w.encode("utf-8")) + (EOW,): c for w, c in words.items()}
    merges: List[Tuple[int, int]] = []
    next_id = EOW + 1
    for _ in range(n_merges):
        pairs: "collections.Counter" = collections.Counter()
        for w, c in vocab.items():
            for i in range(len(w) - 1):
                pairs[(w[i], w[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        new_vocab = {}
        for w, c in vocab.items():
            out = []
            i = 0
            while i < len(w):
                if i < len(w) - 1 and w[i] == a and w[i + 1] == b:
                    out.append(next_id)
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            new_vocab[tuple(out)] = c
        vocab = new_vocab
        next_id += 1
    return merges


class BpeTokenizer:
    """Encode/count with the vendored merges (or a custom table).

    ``encode`` applies merges in RANK order (lowest-rank pair present in
    the word merges first, every occurrence per pass) — the standard BPE
    inference rule, equivalent to replaying the training merges in
    order."""

    def __init__(self,
                 merges: Optional[Iterable[Tuple[int, int]]] = None):
        table = list(MERGES if merges is None else merges)
        self.ranks: Dict[Tuple[int, int], int] = {
            pair: i for i, pair in enumerate(table)}
        self.ids: Dict[Tuple[int, int], int] = {
            pair: EOW + 1 + i for i, pair in enumerate(table)}
        self._word_cache: Dict[str, List[int]] = {}

    # cache bound: Zipf means a few hundred thousand distinct words cover
    # natural text; an unbounded cache on a 100-TB stream of hashes/URLs
    # would grow without limit inside a long-lived pack task — clear and
    # rebuild past the cap (cheap; hit rate recovers immediately)
    _CACHE_CAP = 1_000_000

    def _encode_word(self, word: str) -> List[int]:
        cached = self._word_cache.get(word)
        if cached is not None:
            return cached
        if len(self._word_cache) >= self._CACHE_CAP:
            self._word_cache.clear()
        seq: List[int] = list(word.encode("utf-8")) + [EOW]
        ranks, ids = self.ranks, self.ids
        while len(seq) > 1:
            best_rank: Optional[int] = None
            best_pair: Optional[Tuple[int, int]] = None
            for i in range(len(seq) - 1):
                r = ranks.get((seq[i], seq[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_pair = r, (seq[i], seq[i + 1])
            if best_pair is None:
                break
            merged = ids[best_pair]
            out: List[int] = []
            i = 0
            while i < len(seq):
                if i < len(seq) - 1 and seq[i] == best_pair[0] \
                        and seq[i + 1] == best_pair[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seq = out
        self._word_cache[word] = seq
        return seq

    def encode(self, text: str) -> List[int]:
        out: List[int] = []
        for w in text.split():
            out.extend(self._encode_word(w))
        return out

    def count(self, text: str) -> int:
        """Token count only — the packing hot path (word-memoized)."""
        n = 0
        for w in text.split():
            n += len(self._encode_word(w))
        return n


def make_counter(tokenizer: str):
    """Factory for pack/packing: name → ``count(text) -> int``. Unknown
    names are refused loudly (a silent fallback would mis-size every
    sequence in a 100-TB pack)."""
    if tokenizer == "whitespace":
        return lambda t: len(t.split())
    if tokenizer == "bpe":
        return BpeTokenizer().count
    raise ValueError(f"unknown tokenizer {tokenizer!r} "
                     f"(expected 'whitespace' or 'bpe')")
