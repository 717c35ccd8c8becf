"""MCP-style stdio server — the reference's MCP wrapper surface re-expressed
(``python/opendataloader-pdf-mcp/src/opendataloader_pdf_mcp/server.py:14-15``
``convert_pdf`` tool; Node wrapper ``convert()``).

A dependency-free subset of the Model Context Protocol: JSON-RPC 2.0 over
stdio (one JSON object per line), handling ``initialize``, ``tools/list`` and
``tools/call``. ``convert_html`` maps the reference tool's option surface
onto :class:`ExtractorConfig` and runs the in-process
:func:`opendataloader_pdf_ray.api.convert`; ``search_lake`` /
``semantic_search_lake`` serve point lookups over a lake's inverted-text /
ANN-vector follower indexes via their in-process ``search_local`` paths.
No Ray session is ever started (a protocol server must not own the
cluster; distributed work goes through ``process_dataset`` / the CLI
``ingest`` path instead — index reads are partition-pruned parquet).

Run: ``python -m opendataloader_pdf_ray.server`` and speak JSON-RPC on stdin.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path
from typing import Any, Dict, Optional

from .api import FORMATS, convert
from .config import ExtractorConfig

PROTOCOL_VERSION = "2024-11-05"
SERVER_INFO = {"name": "opendataloader-pdf-ray", "version": "0.2.0"}

_TOOL_SCHEMA = {
    "name": "convert_html",
    "description": "Convert an HTML document to text, markdown, json or html "
                   "using the deterministic local extraction pipeline.",
    "inputSchema": {
        "type": "object",
        "properties": {
            "input_path": {"type": "string",
                           "description": "Path to the input HTML file."},
            "html": {"type": "string",
                     "description": "Inline HTML source (alternative to "
                                    "input_path)."},
            "format": {"type": "string", "enum": list(FORMATS),
                       "default": "markdown"},
            "pages": {"type": "string",
                      "description": "Pages to extract, e.g. '1,3,5-7'."},
            "keep_line_breaks": {"type": "boolean", "default": True},
            "sanitize": {"type": "boolean", "default": False},
            "content_safety_off": {
                "type": "string",
                "description": "all | hidden-text | out-of-page | tiny-text "
                               "(comma-separated)."},
            "replace_invalid_chars": {"type": "string"},
            "use_semantic_tags": {"type": "boolean", "default": False},
            "table_method": {"type": "string",
                             "enum": ["default", "cluster", "off"]},
            "reading_order": {"type": "string", "enum": ["xycut", "off"]},
            "text_page_separator": {"type": "string"},
            "markdown_page_separator": {"type": "string"},
            "include_header_footer": {"type": "boolean", "default": False},
            "detect_strikethrough": {"type": "boolean", "default": False},
        },
    },
}


def _config_from_tool_args(a: Dict[str, Any]) -> ExtractorConfig:
    cfg = ExtractorConfig(
        sanitize=bool(a.get("sanitize", False)),
        include_header_footer=bool(a.get("include_header_footer", False)),
        pages=a.get("pages"),
        table_method=a.get("table_method", "default"),
        trust_semantic_tags=bool(a.get("use_semantic_tags", False)),
        keep_line_breaks=bool(a.get("keep_line_breaks", True)),
        detect_strikethrough=bool(a.get("detect_strikethrough", False)),
        text_page_separator=a.get("text_page_separator"),
        markdown_page_separator=a.get("markdown_page_separator"),
        reading_order=a.get("reading_order", "xycut") != "off",
    )
    if a.get("content_safety_off"):
        cfg = cfg.with_safety_off(a["content_safety_off"])
    if a.get("replace_invalid_chars") is not None:
        cfg = cfg.with_(replacement_text=a["replace_invalid_chars"])
    return cfg


def _call_convert_html(a: Dict[str, Any]) -> str:
    fmt = a.get("format", "markdown")
    if fmt not in FORMATS:
        raise ValueError(f"unknown format {fmt!r}; supported: {FORMATS}")
    if "html" in a:
        payload: bytes | str = a["html"]
        name = a.get("input_path", "")
    elif "input_path" in a:
        payload = Path(a["input_path"]).read_bytes()
        name = a["input_path"]
    else:
        raise ValueError("one of 'input_path' or 'html' is required")
    out = convert(payload, _config_from_tool_args(a), output_formats=[fmt],
                  file_name=name)
    result = out[fmt]
    return json.dumps(result, ensure_ascii=False) if fmt == "json" else str(result)


_SEARCH_TOOL = {
    "name": "search_lake",
    "description": "Full-text point lookup over a CDC lake's inverted "
                   "index (<lake>/textidx): urls whose LIVE extracted text "
                   "contains each probe token. In-process partition-pruned "
                   "reads; no cluster is started.",
    "inputSchema": {
        "type": "object",
        "required": ["lake", "tokens"],
        "properties": {
            "lake": {"type": "string", "description": "Lake root path."},
            "tokens": {"type": "array", "items": {"type": "string"}},
            "as_of": {"type": "integer",
                      "description": "Time-travel: search as of this epoch."},
            "limit": {"type": "integer", "default": 20,
                      "description": "Max urls returned per token."},
        },
    },
}

_SEMANTIC_TOOL = {
    "name": "semantic_search_lake",
    "description": "Semantic top-k over a CDC lake's ANN vector index "
                   "(<lake>/vecidx): the free-text query embeds with the "
                   "lake's hashed-token featurizer, multi-probes the "
                   "bucketed index and returns (url, cosine) hits. "
                   "In-process partition-pruned reads; no cluster.",
    "inputSchema": {
        "type": "object",
        "required": ["lake", "query"],
        "properties": {
            "lake": {"type": "string", "description": "Lake root path."},
            "query": {"type": "string", "description": "Free-text query."},
            "topk": {"type": "integer", "default": 10},
            "probe_hamming": {"type": "integer", "default": 2},
            "as_of": {"type": "integer"},
        },
    },
}


def _call_search_lake(a: Dict[str, Any]) -> str:
    from .cdc.textindex import TextIndex, text_index_root

    idx = TextIndex(text_index_root(a["lake"]))
    hits = idx.search_local([str(t) for t in a["tokens"]],
                            as_of=a.get("as_of"))
    limit = int(a.get("limit", 20))
    by_tok: Dict[str, list] = {}
    for tok, key in zip(hits["token"].to_pylist(), hits["key"].to_pylist()):
        by_tok.setdefault(tok, []).append(key)
    return json.dumps([
        {"token": t, "n_urls": len(by_tok.get(t, [])),
         "urls": by_tok.get(t, [])[:limit]}
        for t in sorted(set(str(t) for t in a["tokens"]))])


_RANKED_TOOL = {
    "name": "ranked_search_lake",
    "description": "Ranked full-text top-k over a CDC lake's inverted "
                   "index: scores LIVE urls by exact-integer tf-idf "
                   "(postings carry tf; idf from per-token posting "
                   "counts). In-process partition-pruned reads; no "
                   "cluster is started.",
    "inputSchema": {
        "type": "object",
        "required": ["lake", "tokens"],
        "properties": {
            "lake": {"type": "string", "description": "Lake root path."},
            "tokens": {"type": "array", "items": {"type": "string"}},
            "topk": {"type": "integer", "default": 10},
            "as_of": {"type": "integer",
                      "description": "Time-travel: search as of this epoch."},
        },
    },
}


def _call_ranked_search_lake(a: Dict[str, Any]) -> str:
    from .cdc.textindex import TextIndex, text_index_root

    idx = TextIndex(text_index_root(a["lake"]))
    hits = idx.ranked_search_local([str(t) for t in a["tokens"]],
                                   k=int(a.get("topk", 10)),
                                   as_of=a.get("as_of"))
    return json.dumps([
        {"url": k, "score": s}
        for k, s in zip(hits["key"].to_pylist(),
                        hits["score"].to_pylist())])


def _call_semantic_search_lake(a: Dict[str, Any]) -> str:
    import numpy as np
    import pyarrow as pa

    from .cdc.vecindex import VectorIndex, vec_index_root
    from .functions.text_stats import embed_text

    idx = VectorIndex(vec_index_root(a["lake"]))
    one = pa.table({"text": pa.array([str(a["query"])], pa.string())})
    blob = embed_text(one, dim=idx.dim)["vec"][0].as_py()
    q = np.frombuffer(blob, dtype="<f4").astype(np.float64)
    hits = idx.search_local(q, k=int(a.get("topk", 10)),
                            probe_hamming=int(a.get("probe_hamming", 2)),
                            as_of=a.get("as_of"))
    return json.dumps([
        {"url": k, "cosine": c}
        for k, c in zip(hits["key"].to_pylist(),
                        hits["cosine"].to_pylist())])


_RANGE_TOOL = {
    "name": "range_scan_lake",
    "description": "Range-predicate scan over a CDC lake's bucketed range "
                   "index (<lake>/rangeidx_<column>): urls whose LIVE "
                   "column value lies in [lo, hi] (inclusive). In-process "
                   "partition-pruned reads (O(range/bucket-width)); no "
                   "cluster is started.",
    "inputSchema": {
        "type": "object",
        "required": ["lake", "column", "lo", "hi"],
        "properties": {
            "lake": {"type": "string", "description": "Lake root path."},
            "column": {"type": "string",
                       "description": "Indexed int/timestamp column."},
            "lo": {"type": "integer"},
            "hi": {"type": "integer"},
            "as_of": {"type": "integer",
                      "description": "Time-travel: scan as of this epoch."},
            "limit": {"type": "integer", "default": 20,
                      "description": "Max (url, val) rows returned."},
        },
    },
}


def _call_range_scan_lake(a: Dict[str, Any]) -> str:
    from .cdc.rangeindex import RangeIndex, range_index_root

    idx = RangeIndex(range_index_root(a["lake"], str(a["column"])))
    hits = idx.scan_range_local(int(a["lo"]), int(a["hi"]),
                                as_of=a.get("as_of"))
    limit = int(a.get("limit", 20))
    rows = hits.to_pylist()
    return json.dumps({
        "n_urls": len(rows),
        "hits": [{"url": r["key"], "val": r["val"]}
                 for r in rows[:limit]]})


_LOOKUP_WHERE_TOOL = {
    "name": "lookup_where_lake",
    "description": "Multi-predicate serving lookup over a CDC lake: "
                   "AND-intersect the column index (eq terms, IN-list) "
                   "and range index (between terms), return the surviving "
                   "urls. In-process partition-pruned reads; missing "
                   "indexes fail loudly; no cluster is started.",
    "inputSchema": {
        "type": "object",
        "required": ["lake"],
        "properties": {
            "lake": {"type": "string", "description": "Lake root path."},
            "eq": {"type": "object",
                   "description": "{column: [value, ...]} equality terms "
                                  "(column index)."},
            "between": {"type": "object",
                        "description": "{column: [lo, hi]} inclusive range "
                                       "terms (range index)."},
            "as_of": {"type": "integer"},
            "limit": {"type": "integer", "default": 20},
        },
    },
}


def _call_lookup_where_lake(a: Dict[str, Any]) -> str:
    from .cdc.lake import Lake
    from .cdc.planner import index_lookup

    ranges = {c: (int(v[0]), int(v[1]))
              for c, v in (a.get("between") or {}).items()}
    keys, _ = index_lookup(Lake(a["lake"]), eq=a.get("eq") or None,
                           ranges=ranges or None, as_of=a.get("as_of"),
                           rows=False)
    return json.dumps({"n_urls": len(keys),
                       "urls": keys[:int(a.get("limit", 20))]})


_ZONEMAP_TOOL = {
    "name": "zonemap_scan_lake",
    "description": "Index-free range scan over a CDC lake via per-commit "
                   "column zone maps (Iceberg/Delta data skipping): LIVE "
                   "rows with lo <= column <= hi. Partitions provably out "
                   "of range are pruned from commit metadata; only the "
                   "surviving partitions are read, in-process — no "
                   "cluster is started.",
    "inputSchema": {
        "type": "object",
        "required": ["lake", "column", "lo", "hi"],
        "properties": {
            "lake": {"type": "string", "description": "Lake root path."},
            "column": {"type": "string",
                       "description": "Int/timestamp payload column."},
            "lo": {"type": "integer"},
            "hi": {"type": "integer"},
            "as_of": {"type": "integer",
                      "description": "Epoch number (time travel)."},
            "limit": {"type": "integer", "default": 20},
        },
    },
}


def _call_zonemap_scan_lake(a: Dict[str, Any]) -> str:
    import pyarrow.compute as pc

    from .cdc.lake import Lake
    from .cdc.merge import live_view

    lake = Lake(a["lake"])
    col, lo, hi = str(a["column"]), int(a["lo"]), int(a["hi"])
    as_of = a.get("as_of")
    parts = lake.parts_overlapping_range(col, lo, hi, as_of)
    rows = []
    for part in parts:
        t = lake.read_partition(part, as_of)
        if t is None or col not in t.column_names:
            continue
        t = live_view(t)
        c = t[col]
        import pyarrow as pa

        if pa.types.is_timestamp(c.type):
            c = c.cast(pa.int64())
        mask = pc.and_kleene(pc.greater_equal(c, lo), pc.less_equal(c, hi))
        t = t.filter(pc.fill_null(mask, False))
        rows.extend({"url": u, "val": v} for u, v in
                    zip(t["url"].to_pylist(), t[col].to_pylist()))
    rows.sort(key=lambda r: r["url"])
    return json.dumps({
        "n_rows": len(rows),
        "partitions_read": len(parts),
        "partitions_total": lake.num_partitions,
        "hits": rows[:int(a.get("limit", 20))]})


_TAGS_TOOL = {
    "name": "lake_tags",
    "description": "List a CDC lake's named savepoints (tag -> epoch). "
                   "Tags pin their epochs from vacuum; restore/branch/get "
                   "accept tag names as epoch refs. Metadata-only.",
    "inputSchema": {
        "type": "object",
        "required": ["lake"],
        "properties": {
            "lake": {"type": "string", "description": "Lake root path."},
        },
    },
}


def _call_lake_tags(a: Dict[str, Any]) -> str:
    from .cdc.lake import Lake

    return json.dumps({"tags": Lake(a["lake"]).list_tags()})


_SCHEMA_TOOL = {
    "name": "lake_schema",
    "description": "A CDC lake's current user-facing columns plus its "
                   "column-rename history (metadata-level schema "
                   "evolution: historical->current name map). "
                   "Metadata-only.",
    "inputSchema": {
        "type": "object",
        "required": ["lake"],
        "properties": {
            "lake": {"type": "string", "description": "Lake root path."},
        },
    },
}


def _call_lake_schema(a: Dict[str, Any]) -> str:
    from .cdc.lake import Lake

    lake = Lake(a["lake"])
    return json.dumps({"columns": lake._current_columns(),
                       "renames": lake.list_renames()})


_TOOLS = {
    "convert_html": (_TOOL_SCHEMA, _call_convert_html),
    "search_lake": (_SEARCH_TOOL, _call_search_lake),
    "ranked_search_lake": (_RANKED_TOOL, _call_ranked_search_lake),
    "semantic_search_lake": (_SEMANTIC_TOOL, _call_semantic_search_lake),
    "range_scan_lake": (_RANGE_TOOL, _call_range_scan_lake),
    "lookup_where_lake": (_LOOKUP_WHERE_TOOL, _call_lookup_where_lake),
    "zonemap_scan_lake": (_ZONEMAP_TOOL, _call_zonemap_scan_lake),
    "lake_tags": (_TAGS_TOOL, _call_lake_tags),
    "lake_schema": (_SCHEMA_TOOL, _call_lake_schema),
}


def handle_request(req: Dict[str, Any]) -> Optional[Dict[str, Any]]:
    """One JSON-RPC request → response dict (None for notifications)."""
    method = req.get("method", "")
    rid = req.get("id")
    if method.startswith("notifications/"):
        return None

    def ok(result: Any) -> Dict[str, Any]:
        return {"jsonrpc": "2.0", "id": rid, "result": result}

    def err(code: int, message: str) -> Dict[str, Any]:
        return {"jsonrpc": "2.0", "id": rid,
                "error": {"code": code, "message": message}}

    if method == "initialize":
        return ok({"protocolVersion": PROTOCOL_VERSION,
                   "capabilities": {"tools": {}},
                   "serverInfo": SERVER_INFO})
    if method == "tools/list":
        return ok({"tools": [schema for schema, _ in _TOOLS.values()]})
    if method == "tools/call":
        params = req.get("params") or {}
        tool = _TOOLS.get(params.get("name"))
        if tool is None:
            return err(-32602, f"unknown tool {params.get('name')!r}")
        try:
            text = tool[1](params.get("arguments") or {})
            return ok({"content": [{"type": "text", "text": text}],
                       "isError": False})
        except Exception as e:  # tool errors are results, not protocol errors
            return ok({"content": [{"type": "text", "text": f"{e}"}],
                       "isError": True})
    if method == "ping":
        return ok({})
    return err(-32601, f"method not found: {method}")


def serve(stdin=None, stdout=None) -> None:
    """Line-delimited JSON-RPC loop. Malformed lines get a -32700 response."""
    stdin = stdin or sys.stdin
    stdout = stdout or sys.stdout
    for line in stdin:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
        except json.JSONDecodeError:
            resp: Optional[Dict[str, Any]] = {
                "jsonrpc": "2.0", "id": None,
                "error": {"code": -32700, "message": "parse error"}}
        else:
            resp = handle_request(req)
        if resp is not None:
            stdout.write(json.dumps(resp, ensure_ascii=False) + "\n")
            stdout.flush()


if __name__ == "__main__":
    serve()
