"""The extractor as a Ray Data actor-pool stage.

Direct analog of the reference's "model server loaded once" design
(``core/hybrid/HybridClient.java`` pool / ``py/hybrid_server.py`` docling
singleton, 3.3× faster than per-request — SURVEY.md §2.3): config + compiled
sanitizer regexes are built ONCE per actor in ``__init__``; ``__call__`` does
per-batch work only. Batches are zero-copy Arrow; the wide ``html`` binary
column is dropped immediately after extraction so downstream shuffles move
only (url, warc_ts, text, blocks, …) — SURVEY.md §7.4 "wide binary rows".
"""

from __future__ import annotations

import json
from typing import List, Optional

import pyarrow as pa

from ..config import ExtractorConfig
from ..extractor import ContentSanitizer, extract
from ..sources.sealed import InvalidPassword

BLOCK_STRUCT = pa.struct(
    [
        ("id", pa.int32()),
        ("parent", pa.int32()),
        ("type", pa.string()),
        ("level", pa.int32()),
        ("page", pa.int32()),
        ("text", pa.string()),
        ("bbox", pa.list_(pa.float64())),
        ("row", pa.int32()),
        ("col", pa.int32()),
        ("row_span", pa.int32()),
        ("col_span", pa.int32()),
        ("label", pa.string()),
        ("src", pa.string()),
    ]
)
BLOCKS_TYPE = pa.list_(BLOCK_STRUCT)


class HtmlExtractor:
    """map_batches(HtmlExtractor, batch_format="pyarrow", concurrency=N).

    Input batch: any table with an ``html: binary`` column (null for deletes).
    Output: html dropped; ``text``, ``n_blocks``, ``replacement_ratio`` added
    (+ ``blocks`` list<struct> when include_blocks)."""

    def __init__(self, cfg: Optional[ExtractorConfig] = None,
                 include_blocks: bool = True, drop_html: bool = True,
                 quarantine: bool = False):
        """``quarantine=True`` (the CDC dead-letter mode): ANY extraction
        exception becomes a deterministic ``extract_error`` string column
        (null on clean rows) instead of killing the task — at 10^10 events a
        single poison payload (pathological nesting → RecursionError, a
        parser bug) must divert ONE record to the DLQ, never the epoch. Off
        by default: the convert/API surface should surface failures."""
        self.cfg = cfg or ExtractorConfig()
        self.sanitizer = ContentSanitizer(self.cfg.sanitization_rules)
        self.include_blocks = include_blocks
        self.drop_html = drop_html
        self.quarantine = quarantine
        self._warned_sealed = False

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts: List[Optional[str]] = []
        n_blocks: List[int] = []
        ratios: List[float] = []
        errors: List[Optional[str]] = []
        builder = _BlocksBuilder() if self.include_blocks else None
        for html in batch["html"]:
            payload = html.as_py()
            if payload is None:
                texts.append(None)
                n_blocks.append(0)
                ratios.append(0.0)
                errors.append(None)
                if builder:
                    builder.append_null()
                continue
            try:
                result = extract(payload, self.cfg, sanitizer=self.sanitizer)
            except Exception as exc:
                if self.quarantine:
                    # dead-letter mode: deterministic error id (type +
                    # message derive from the payload alone — no stack
                    # paths, no addresses); the row diverts to the DLQ
                    texts.append(None)
                    n_blocks.append(0)
                    ratios.append(0.0)
                    errors.append(f"{type(exc).__name__}: {exc}")
                    if builder:
                        builder.append_null()
                    continue
                if not isinstance(exc, InvalidPassword):
                    raise
                # sealed payload the stream has no (or the wrong) password
                # for: quarantine the RECORD (null text, like a tombstone
                # payload), never the stream — the reference treats
                # encrypted inputs as a non-content failure the caller
                # logs and skips (DocumentProcessor.java:620-622)
                if not self._warned_sealed:
                    import sys as _sys

                    print(f"[extract] sealed payload quarantined: {exc} "
                          f"(further occurrences silent this actor)",
                          file=_sys.stderr)
                    self._warned_sealed = True
                texts.append(None)
                n_blocks.append(0)
                ratios.append(0.0)
                errors.append(None)
                if builder:
                    builder.append_null()
                continue
            texts.append(result.text)
            n_blocks.append(result.n_blocks)
            ratios.append(result.replacement_ratio)
            errors.append(None)
            if builder:
                builder.append(result)
        out = batch.drop_columns(["html"]) if self.drop_html else batch
        out = (
            out.append_column("text", pa.array(texts, pa.string()))
            .append_column("n_blocks", pa.array(n_blocks, pa.int32()))
            .append_column("replacement_ratio", pa.array(ratios, pa.float64()))
        )
        if self.quarantine:
            out = out.append_column("extract_error",
                                    pa.array(errors, pa.string()))
        if builder:
            out = out.append_column("blocks", builder.finish())
        return out


class _BlocksBuilder:
    """Columnar builder for the blocks list<struct> column — appends into
    typed per-field lists instead of building one Python dict per block
    (≈4× cheaper per document than pa.array-of-dicts)."""

    def __init__(self):
        self.offsets = [0]
        self.valid: List[bool] = []
        self.ids: List[int] = []
        self.parents: List[int] = []
        self.types: List[str] = []
        self.levels: List[int] = []
        self.pages: List[int] = []
        self.texts: List[str] = []
        self.bboxes: List[Optional[List[float]]] = []
        self.rows: List[int] = []
        self.cols: List[int] = []
        self.rspans: List[int] = []
        self.cspans: List[int] = []
        self.labels: List[str] = []
        self.srcs: List[str] = []

    def append_null(self) -> None:
        self.offsets.append(self.offsets[-1])
        self.valid.append(False)

    def append(self, result) -> None:
        def visit(block, parent_id: int) -> None:
            self.ids.append(block.id)
            self.parents.append(parent_id)
            self.types.append(block.type)
            self.levels.append(block.level)
            self.pages.append(block.page)
            self.texts.append(block.text)
            self.bboxes.append(block.bbox)
            self.rows.append(block.row)
            self.cols.append(block.col)
            self.rspans.append(block.row_span)
            self.cspans.append(block.col_span)
            self.labels.append(block.label)
            self.srcs.append(block.src)
            for kid in block.kids:
                visit(kid, block.id)

        for page in result.pages:
            for b in page:
                visit(b, -1)
        self.offsets.append(len(self.ids))
        self.valid.append(True)

    def finish(self) -> pa.Array:
        struct = pa.StructArray.from_arrays(
            [
                pa.array(self.ids, pa.int32()),
                pa.array(self.parents, pa.int32()),
                pa.array(self.types, pa.string()),
                pa.array(self.levels, pa.int32()),
                pa.array(self.pages, pa.int32()),
                pa.array(self.texts, pa.string()),
                pa.array(self.bboxes, pa.list_(pa.float64())),
                pa.array(self.rows, pa.int32()),
                pa.array(self.cols, pa.int32()),
                pa.array(self.rspans, pa.int32()),
                pa.array(self.cspans, pa.int32()),
                pa.array(self.labels, pa.string()),
                pa.array(self.srcs, pa.string()),
            ],
            fields=list(BLOCK_STRUCT),
        )
        mask = pa.array(self.valid, pa.bool_())
        return pa.ListArray.from_arrays(
            pa.array(self.offsets, pa.int32()), struct,
            mask=pa.compute.invert(mask))


class MarkdownGenerator:
    """Optional serializer stage: blocks are already structured, so Markdown
    re-generation runs from html for simplicity of the demo surface."""

    def __init__(self, cfg: Optional[ExtractorConfig] = None):
        self.cfg = cfg or ExtractorConfig()
        self.sanitizer = ContentSanitizer(self.cfg.sanitization_rules)

    def __call__(self, batch: pa.Table) -> pa.Table:
        mds: List[Optional[str]] = []
        jsons: List[Optional[str]] = []
        for html in batch["html"]:
            payload = html.as_py()
            if payload is None:
                mds.append(None)
                jsons.append(None)
                continue
            r = extract(payload, self.cfg, sanitizer=self.sanitizer)
            mds.append(r.markdown(self.cfg))
            jsons.append(json.dumps(r.json_dict(self.cfg), ensure_ascii=False,
                                    sort_keys=True))
        return (
            batch.append_column("markdown", pa.array(mds, pa.string()))
            .append_column("json", pa.array(jsons, pa.string()))
        )


# ---------------------------------------------------- packed blocks column
#
# The blocks list<struct> is the widest thing crossing the combine + both
# shuffles: measured 8.7 KB/row vs 4 KB of text at sf0.01 (68% of the
# post-extract row). ``CDCConfig.pack_blocks`` swaps it for a per-row
# zstd-compressed Arrow-IPC binary cell (~2.5 KB/row) for the TRANSIT
# segment only — ApplyPartition* unpacks the LWW winners before the merge
# fold, so lake bytes are identical with the flag on or off and only
# surviving rows pay the decode. Pack ≈0.08 ms/row, unpack ≈0.15 ms/row
# (BASELINE.md round-5 A/B records whether that trade wins on this box).

_PACKED_COL = "blocks_bin"


def _pack_schema() -> pa.Schema:
    return pa.schema([("b", BLOCKS_TYPE)])


def pack_blocks(batch: pa.Table) -> pa.Table:
    """blocks list<struct> → blocks_bin binary (per-row, null-preserving)."""
    import io

    import pyarrow.ipc as ipc

    if "blocks" not in batch.column_names:
        return batch
    codec = pa.Codec("zstd", compression_level=1)
    col = pa.table({"b": batch["blocks"]})
    out = []
    for i in range(batch.num_rows):
        if not col["b"][i].is_valid:
            out.append(None)
            continue
        row = col.slice(i, 1)
        buf = io.BytesIO()
        with ipc.new_stream(buf, row.schema) as w:
            w.write_table(row)
        raw = buf.getvalue()
        out.append(len(raw).to_bytes(4, "little")
                   + codec.compress(raw, asbytes=True))
    idx = batch.column_names.index("blocks")
    return batch.remove_column(idx).add_column(
        idx, _PACKED_COL, pa.array(out, pa.binary()))


def unpack_blocks(batch: pa.Table) -> pa.Table:
    """blocks_bin → blocks, byte-identical to the never-packed column."""
    import pyarrow.ipc as ipc

    if _PACKED_COL not in batch.column_names:
        return batch
    codec = pa.Codec("zstd", compression_level=1)
    chunks = []
    for cell in batch[_PACKED_COL]:
        blob = cell.as_py()
        if blob is None:
            chunks.append(pa.table({"b": pa.array([None], BLOCKS_TYPE)}))
            continue
        rawlen = int.from_bytes(blob[:4], "little")
        raw = codec.decompress(blob[4:], decompressed_size=rawlen,
                               asbytes=True)
        chunks.append(ipc.open_stream(raw).read_all())
    col = (pa.concat_tables(chunks)["b"].combine_chunks()
           if chunks else pa.array([], BLOCKS_TYPE))
    idx = batch.column_names.index(_PACKED_COL)
    return batch.remove_column(idx).add_column(idx, "blocks", col)
