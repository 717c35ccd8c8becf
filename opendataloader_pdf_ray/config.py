"""Engine configuration.

Analog of the reference's ``Config`` / ``FilterConfig``
(``core/api/Config.java:32``, ``core/api/FilterConfig.java:30-78``): a frozen
dataclass constructed once and shipped to every actor; compiled state (regexes)
derives from it inside actor ``__init__``, never per batch.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Callable, Optional, Tuple


@dataclass(frozen=True)
class SanitizationRule:
    """One regex→placeholder rule (``core/api/FilterConfig.java:37-78``)."""

    pattern: str
    replacement: str


# Default PII rules mirroring the reference's FilterConfig default rule set
# (``core/api/FilterConfig.java:38-78``): email, intl phone, ID, credit card,
# account number, IPv4, IPv6, MAC, IMEI, URL.  Order matters: rules are applied
# in sequence with earlier matches masking later ones (overlap resolution in
# ``core/utils/ContentSanitizer.java:197-263``).
DEFAULT_SANITIZATION_RULES: Tuple[SanitizationRule, ...] = (
    SanitizationRule(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "email@example.com"),
    SanitizationRule(r"[+]\d+(?:-\d+)+", "+00-0000-0000"),
    SanitizationRule(r"[A-Z]{1,2}\d{6,9}", "AA0000000"),
    SanitizationRule(r"\b\d{4}-?\d{4}-?\d{4}-?\d{4}\b", "0000-0000-0000-0000"),
    SanitizationRule(r"\b\d{10,18}\b", "0000000000000000"),
    SanitizationRule(r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "0.0.0.0"),
    SanitizationRule(r"\b(?:[0-9a-fA-F]{0,4}:){2,7}[0-9a-fA-F]{0,4}\b", "0.0.0.0::1"),
    SanitizationRule(r"\b(?:[0-9A-Fa-f]{2}:){5}[0-9A-Fa-f]{2}\b", "00:00:00:00:00:00"),
    SanitizationRule(r"\b\d{15}\b", "000000000000000"),
    SanitizationRule(r"https?://[A-Za-z0-9.-]+(?::\d+)?(?:/\S*)?", "https://example.com"),
)


@dataclass(frozen=True)
class ExtractorConfig:
    """Extraction behavior (maps the reference CLI options, ``options.json``)."""

    # --- filtering (ContentFilterProcessor / HiddenTextProcessor analogs) ---
    filter_hidden_text: bool = True          # display:none / visibility:hidden / opacity:0 / same-color
    filter_out_of_page: bool = True          # absolutely positioned outside the viewport
    filter_tiny_text: bool = True            # font-size < tiny_text_pt
    tiny_text_px: float = 2.0
    page_width: float = 800.0                # viewport used for off-page + XY-cut
    page_height: float = 1200.0

    # --- invalid characters (TextProcessor.replaceUndefinedCharacters) ---
    replacement_text: str = " "              # what U+FFFD / control chars become

    # --- parser (veraPDF-swap analog, DocumentProcessor.java:613-660) ---
    # "stdlib" (html.parser, always available) or "lxml" (optional C fast
    # path; round-3 profile put stdlib parse at 40% of extract wall).
    # EXPLICIT opt-in only — auto-detection on a mixed cluster would break
    # the byte-identical determinism invariant (dom.parse_html docstring).
    parser: str = "stdlib"

    # --- sanitization (ContentSanitizer) ---
    sanitize: bool = False
    sanitization_rules: Tuple[SanitizationRule, ...] = DEFAULT_SANITIZATION_RULES

    # --- structure detection ---
    detect_headings: bool = True
    detect_lists: bool = True
    detect_tables: bool = True
    detect_captions: bool = True
    detect_header_footer: bool = True        # repeated-across-pages boilerplate
    detect_aligned_columns: bool = True      # borderless whitespace-aligned tables
    detect_special_tables: bool = True       # Korean 수신/경유/제목 restructure
    detect_toc: bool = False                 # TOC grouping (reference parity:
                                             # its TableOfContentsProcessor is
                                             # disabled in the pipeline too —
                                             # DocumentProcessor.java:370-379)
    reading_order: bool = True               # XY-cut++ for absolutely positioned content
    merge_across_pages: bool = True          # table/list continuation over page breaks
    # reference --table-method: "default" (border/tag-based), "cluster"
    # (whitespace-aligned clustering only), "off" (no table detection);
    # "default" leaves the two detect_* flags in charge
    table_method: str = "default"
    # reference --use-struct-tree (TaggedDocumentProcessor.java:32-66 analog):
    # trust the author's semantic markup outright — skip the heuristic
    # refinement passes (style-heading promotion, boilerplate vote, special
    # tables, caption adjacency); tag-derived structure + reading order +
    # sanitize still run. The "trust upstream metadata vs recompute" path.
    trust_semantic_tags: bool = False

    # --- page selection (reference --pages "1,3,5-7", Config.java:659-764) ---
    pages: Optional[str] = None              # 1-based list/ranges; None = all

    # --- sealed payloads (reference --password, Config.java:65,150-165) ---
    # opens ODLSEAL1-enveloped html payloads (sources/sealed.py); a wrong or
    # missing password raises InvalidPassword — a non-content failure the
    # CLI's skip-and-continue loop logs per file, mirroring the reference's
    # InvalidPasswordException handling (DocumentProcessor.java:620-622)
    password: Optional[str] = None

    # --- line breaks (reference --keep-line-breaks) ---
    # True preserves source newlines inside text nodes as line breaks (this
    # engine's historical behavior, pinned by the replay goldens); False
    # collapses them to spaces (HTML whitespace semantics)
    keep_line_breaks: bool = True

    # --- output (TextGenerator / MarkdownGenerator analogs) ---
    include_header_footer: bool = False      # JsonWriter.java:92-94 default: exclude
    page_separator: str = ""                 # emitted between pages; "" = blank line only
    # per-format overrides (reference --text/markdown/html-page-separator;
    # "%page-number%" / "%page%" expand to the 1-based page ordinal)
    text_page_separator: Optional[str] = None
    markdown_page_separator: Optional[str] = None
    html_page_separator: Optional[str] = None
    indent: str = "  "                       # per nesting level in text output
    # reference --detect-strikethrough: wrap struck text in ~~ in Markdown
    detect_strikethrough: bool = False
    # reference --markdown-with-html: tables with row/col spans emit real
    # HTML inside the Markdown (pipe tables cannot express spans)
    markdown_with_html: bool = False
    # reference --format markdown-with-images: image blocks keep their source
    # reference (data: URI or URL) in the markdown link target; the CLI's
    # external image mode rewrites data: URIs to the written asset files
    markdown_with_images: bool = False

    def with_(self, **kw) -> "ExtractorConfig":
        return replace(self, **kw)

    def normalized(self) -> "ExtractorConfig":
        """Resolve option interactions (reference ``Config.normalize()``,
        ``core/api/Config.java:912-920``)."""
        cfg = self
        if cfg.table_method == "off":
            cfg = cfg.with_(detect_tables=False, detect_aligned_columns=False)
        elif cfg.table_method == "cluster":
            cfg = cfg.with_(detect_tables=False, detect_aligned_columns=True)
        return cfg

    def with_safety_off(self, which: str = "all") -> "ExtractorConfig":
        """Reference --content-safety-off: all | hidden-text | out-of-page |
        tiny-text (comma-separated)."""
        cfg = self
        parts = {p.strip() for p in which.split(",")}
        if "all" in parts or "hidden-text" in parts:
            cfg = cfg.with_(filter_hidden_text=False)
        if "all" in parts or "out-of-page" in parts:
            cfg = cfg.with_(filter_out_of_page=False)
        if "all" in parts or "tiny-text" in parts:
            cfg = cfg.with_(filter_tiny_text=False)
        return cfg

    def page_numbers(self, n_pages: int):
        """Parse the --pages selection into 0-based indexes (Config.java
        parsePages analog). Out-of-range entries are ignored."""
        if not self.pages:
            return list(range(n_pages))
        out = []
        for part in self.pages.split(","):
            part = part.strip()
            if "-" in part:
                lo, hi = part.split("-", 1)
                out.extend(range(int(lo) - 1, min(int(hi), n_pages)))
            elif part:
                out.append(int(part) - 1)
        return sorted({p for p in out if 0 <= p < n_pages})


@dataclass(frozen=True)
class CDCConfig:
    """CDC / lake configuration (north_rule surface)."""

    num_partitions: int = 32                 # P url-hash partitions of the lake
    num_salts: int = 8                       # S salt shards for hot-key two-phase merge
    epoch_size: int = 10_000                 # events per checkpoint epoch
    extractor: ExtractorConfig = field(default_factory=ExtractorConfig)
    extract_batch_size: int = 64             # html payloads are wide → small batches
    extract_concurrency: int = 8             # actor pool size for the extractor stage
    # fractional CPU reservation per extractor actor: a pool of N actors then
    # reserves 0.8·N CPUs, leaving headroom for the read/shuffle stages at ANY
    # cluster size (a flat "N-2" penalizes small clusters asymmetrically and
    # distorts scaling-efficiency measurements)
    extract_num_cpus: float = 0.8
    # Extractor scheduling mode:
    #   "actors" (default) — stateful pool (setup once per actor in
    #       __init__): the right shape whenever the extractor loads state
    #       (models, backend clients) and for long backlog pipelines.
    #   "tasks" — plain map_batches function: skips the per-pipeline actor
    #       pool spin-up (~1.3 s at 8 CPUs). The stdlib extractor constructs
    #       in ~0.6 ms, so a streaming tail's micro-epochs (one short
    #       pipeline per poll) are ~1.5× faster end-to-end in tasks mode;
    #       output is byte-identical either way.
    #   "pool" — PERSISTENT named-actor pool shared across pipelines
    #       (stages/extract_pool.py): tails with a model-backed extractor
    #       get tasks-mode per-epoch latency while keeping actor state
    #       alive between polls. Owned by follow/follow_fanin (or an
    #       explicit ExtractPool context for backlog use).
    extract_mode: str = "actors"
    # Rows per pool-actor CALL in pool mode. Each call is a task→actor
    # object-store round trip, so pool mode wants BIGGER batches than the
    # in-actor extract_batch_size: measured at sf0.1/32cpus, 128-row calls
    # ran the tail at 2,813 ev/s (p50 7.0 s) vs 3,888 ev/s (p50 4.9 s —
    # within 1.12× of tasks mode) at 512. Output bytes are batch-size
    # independent (determinism invariant).
    pool_call_batch_size: int = 512
    # Transit-segment row narrowing (r4 verdict item #5): carry the wide
    # blocks list<struct> (measured 68% of post-extract row bytes) as a
    # per-row zstd'd Arrow-IPC binary cell through combine + both
    # shuffles; ApplyPartition unpacks the LWW WINNERS before the merge
    # fold, so lake bytes are identical either way and only surviving
    # rows pay the decode. Default off — see BASELINE.md round-5 A/B for
    # the measured trade on this box.
    pack_blocks: bool = False
    # Two-phase merge. Phase 1 (local) is ALWAYS the per-batch combiner
    # (≤1 row per (url, epoch) per block); phase 2 (global) is the partition
    # groupby. Extra phase-1 flavors for heavier skew:
    #   salted_merge=True      → full salted exchange (≤num_salts rows per url
    #                            into the global merge; costs one extra
    #                            all-to-all — extreme hot-key insurance)
    #   local_merge_blocks=N   → coalesce blocks + re-combine (bounds per-url
    #                            rows at N; costs a barrier that breaks
    #                            extract/shuffle pipelining)
    # Default: coalesce to ~32 blocks. Beyond the row reduction, this bounds
    # the BLOCK count entering the partition sort — a sort over B input blocks
    # creates O(B²) intermediate objects, which dominates wall time once B is
    # in the hundreds (measured: 240-block sort of 260 MB took 23s; 32-block
    # took ~3s).
    salted_merge: bool = False
    local_merge_blocks: Optional[int] = 32
    # Backlog-replay snapshot policy:
    #   "every_epoch" (default) — one CoW snapshot + commit per (part, epoch):
    #       full per-epoch lineage and as-of time travel, at K× write
    #       amplification for a K-epoch backlog.
    #   "final" — fold the whole pending range, write ONE snapshot + commit at
    #       the last epoch (lineage spans the range). Combiner may then merge
    #       across epochs too → ~K× less shuffle payload and ~K/2× less write
    #       I/O. Still exactly-once + resumable (partition granularity).
    backlog_snapshots: str = "every_epoch"
    # Per-epoch (streaming-tail) commit mode:
    #   "snapshot" (default) — CoW: read base, merge, write full partition
    #       state (reads are one-file; K× write amplification on the tail).
    #   "delta" — write ONLY the epoch's winner set; reads fold deltas onto
    #       the newest snapshot merge-on-read (Lake.read_partition), and
    #       Lake.compact() re-materializes a snapshot when the fold chain
    #       grows. The write-amplification fix for high-frequency epochs.
    epoch_commits: str = "snapshot"
    drop_html_after_extract: bool = True     # project before shuffle: never shuffle html
    # Extract-time derived columns: a row-preserving vectorized batch
    # transform (the backfill transform contract: table → table, same row
    # count, keys byte-identical) applied to the extracted stream before
    # the merge — e.g. ``functions.text_stats.embed_text`` so every event
    # carries a hashed-token embedding through ingest and the ANN follower
    # (``ingest --vec-index``) stays fresh on the tail. Must be a picklable
    # module-level callable (it ships to the map tasks).
    derive: Optional[Callable] = None
    # Dedup-at-ingest (cdc/dupindex.py): fold every content-bearing event's
    # md5 fingerprint into a second, fp-partitioned keyspace at
    # <lake>/fpindex through the same exactly-once commit log, enabling
    # read-time dup_of attribution. Costs one extra materialize (the
    # extracted stream feeds both keyspaces) + one slim fp-shuffle per epoch.
    maintain_dup_index: bool = False
    dup_index_partitions: Optional[int] = None  # default: num_partitions
    # "snapshot" (CoW per epoch) | "delta" (winners-only append + FWW
    # merge-on-read + DupIndex.compact — the write-amplification fix for
    # high-frequency epochs, mirroring epoch_commits on the url keyspace)
    dup_index_commits: str = "snapshot"
    # Near-dup-at-ingest (cdc/neardup.py): the SimHash band keyspace at
    # <lake>/nearidx — same machinery as the exact index, nbands slim rows
    # per content version, enabling read-time near_dup_of attribution
    # (Hamming ≤ near_index_max_hamming).
    maintain_near_index: bool = False
    near_index_partitions: Optional[int] = None  # default: num_partitions
    near_index_commits: str = "snapshot"
    near_index_max_hamming: int = 3
    near_index_ngram: int = 2
    # Streaming-tail compaction policy: after each committed epoch, any
    # partition whose merge-on-read delta chain exceeds this length is
    # re-materialized as a snapshot (distributed, one task per partition) —
    # bounds read amplification on long-running delta-mode tails without an
    # operator in the loop. None = manual compaction only.
    auto_compact_chain: Optional[int] = None
    # Partial-update (patch) events, op='P' (cdc/merge.py fold_events /
    # merge_base_with_updates_patch): a patch carries ONLY its changed
    # columns (null = unchanged; an omitted html means "keep the extracted
    # text/blocks"), and the merge resolves every column independently by
    # LWW over the events that define it — full events (I/U/D) define all
    # columns, patches their non-null ones, so a patch newer than a
    # tombstone resurrects the key with only its own columns set. Requires
    # snapshot epoch commits (the delta merge-on-read fold is winner-row
    # based; patch rows are not full images). Off by default: the plain
    # LWW hot path is untouched when this is False.
    patch_ops: bool = False
    # Dead-letter queue (cdc/quarantine.py): extraction exceptions divert
    # the RECORD to <lake>/quarantine (url-partitioned, exactly-once per
    # (part, epoch)) instead of killing the epoch — at 10^10 events a single
    # poison payload must cost one DLQ row, never the pipeline. The lake
    # keeps the url's previous good version (winners are chosen among clean
    # events only). Off by default: batch/API surfaces should fail loudly.
    quarantine_errors: bool = False


DEFAULT_EXTRACTOR_CONFIG = ExtractorConfig()
