"""MCP-style stdio server tests (reference mcp server.py convert_pdf analog)."""

import io
import json
import subprocess
import sys

from opendataloader_pdf_ray.server import handle_request, serve

HTML = "<html><body><div class='page'><h1>Title Here</h1><p>body text one</p></div></body></html>"


def _call(method, params=None, rid=1):
    return handle_request({"jsonrpc": "2.0", "id": rid, "method": method,
                           "params": params or {}})


class TestProtocol:
    def test_initialize_and_list(self):
        init = _call("initialize")
        assert init["result"]["serverInfo"]["name"] == "opendataloader-pdf-ray"
        tools = _call("tools/list")["result"]["tools"]
        assert [t["name"] for t in tools] == [
            "convert_html", "search_lake", "ranked_search_lake",
            "semantic_search_lake", "range_scan_lake",
            "lookup_where_lake", "zonemap_scan_lake", "lake_tags",
            "lake_schema"]
        assert "format" in tools[0]["inputSchema"]["properties"]

    def test_notification_is_silent(self):
        assert handle_request({"jsonrpc": "2.0",
                               "method": "notifications/initialized"}) is None

    def test_unknown_method(self):
        assert _call("bogus/method")["error"]["code"] == -32601


class TestConvertTool:
    def test_convert_markdown(self):
        resp = _call("tools/call", {"name": "convert_html",
                                    "arguments": {"html": HTML,
                                                  "format": "markdown"}})
        out = resp["result"]
        assert out["isError"] is False
        assert "# Title Here" in out["content"][0]["text"]

    def test_convert_json_format(self):
        resp = _call("tools/call", {"name": "convert_html",
                                    "arguments": {"html": HTML,
                                                  "format": "json"}})
        doc = json.loads(resp["result"]["content"][0]["text"])
        assert doc["kids"]

    def test_tool_error_is_result(self):
        resp = _call("tools/call", {"name": "convert_html",
                                    "arguments": {"format": "markdown"}})
        assert resp["result"]["isError"] is True
        assert "input_path" in resp["result"]["content"][0]["text"]

    def test_unknown_tool(self):
        resp = _call("tools/call", {"name": "nope", "arguments": {}})
        assert resp["error"]["code"] == -32602

    def test_options_reach_config(self):
        struck = ("<html><body><div class='page'><p><s>gone words</s></p>"
                  "</div></body></html>")
        plain = _call("tools/call", {"name": "convert_html", "arguments": {
            "html": struck, "format": "markdown"}})
        deco = _call("tools/call", {"name": "convert_html", "arguments": {
            "html": struck, "format": "markdown",
            "detect_strikethrough": True}})
        assert "~~" not in plain["result"]["content"][0]["text"]
        assert "~~" in deco["result"]["content"][0]["text"]


class TestLakeSearchTools:
    """The two index-serving tools: in-process (no Ray inside the server
    handler), partition-pruned reads over follower keyspaces built by the
    normal Ray-side maintenance."""

    @staticmethod
    def _seeded_lake(tmp_path, ray_session):
        import numpy as np
        import pyarrow as pa

        from opendataloader_pdf_ray.cdc import (Lake, Lineage, TextIndex,
                                                VectorIndex, backfill,
                                                text_index_root,
                                                vec_index_root)
        from opendataloader_pdf_ray.functions.text_stats import embed_text

        root = str(tmp_path / "lake")
        lake = Lake(root, 2)
        t = pa.table({
            "url": pa.array(["a", "b"], pa.string()),
            "warc_ts": pa.array([1, 2], pa.int64()),
            "seq": pa.array([1, 2], pa.int64()),
            "text": pa.array(["alpha beta gamma", "delta beta"],
                             pa.string()),
            "deleted": pa.array([False, False], pa.bool_()),
        })
        for part in (0, 1):
            lake.commit_delta(part, 0, t.slice(part, 1), Lineage(
                part=part, epoch=0, events_consumed=1, rows_upserted=1,
                rows_deleted=0, seq_min=part + 1, seq_max=part + 1))
        backfill(lake, embed_text, name="embed")
        TextIndex(text_index_root(root), num_partitions=4).refresh(lake)
        VectorIndex(vec_index_root(root), num_partitions=4,
                    dim=32).refresh(lake)
        return root

    def test_search_lake_tool(self, tmp_path, ray_session):
        root = self._seeded_lake(tmp_path, ray_session)
        resp = _call("tools/call", {"name": "search_lake", "arguments": {
            "lake": root, "tokens": ["beta", "alpha", "nosuch"]}})
        assert resp["result"]["isError"] is False
        rows = {r["token"]: r["urls"] for r in
                json.loads(resp["result"]["content"][0]["text"])}
        assert rows == {"alpha": ["a"], "beta": ["a", "b"], "nosuch": []}

    def test_ranked_search_lake_tool(self, tmp_path, ray_session):
        root = self._seeded_lake(tmp_path, ray_session)
        resp = _call("tools/call", {"name": "ranked_search_lake",
                                    "arguments": {"lake": root,
                                                  "tokens": ["beta",
                                                             "alpha"],
                                                  "topk": 2}})
        assert resp["result"]["isError"] is False
        hits = json.loads(resp["result"]["content"][0]["text"])
        # a: beta (df=2) + alpha (df=1) = 3×2^23; b: beta only = 2^23
        assert [h["url"] for h in hits] == ["a", "b"]
        assert hits[0]["score"] == (1 << 23) + (1 << 24)
        assert hits[1]["score"] == 1 << 23

    def test_semantic_search_lake_tool(self, tmp_path, ray_session):
        root = self._seeded_lake(tmp_path, ray_session)
        resp = _call("tools/call", {"name": "semantic_search_lake",
                                    "arguments": {"lake": root,
                                                  "query": "alpha beta gamma",
                                                  "topk": 2,
                                                  "probe_hamming": 5}})
        hits = json.loads(resp["result"]["content"][0]["text"])
        assert hits[0] == {"url": "a", "cosine": 1.0}

    def test_lake_tool_error_is_result(self, tmp_path):
        # a lake path with no index is a TOOL error (isError result),
        # never a protocol-level error response
        resp = _call("tools/call", {"name": "search_lake", "arguments": {
            "lake": str(tmp_path / "nope"), "tokens": ["x"]}})
        assert "error" not in resp
        assert resp["result"]["isError"] is True


class TestStdioLoop:
    def test_serve_roundtrip(self):
        lines = [
            json.dumps({"jsonrpc": "2.0", "id": 1, "method": "initialize"}),
            json.dumps({"jsonrpc": "2.0", "method":
                        "notifications/initialized"}),
            "not json",
            json.dumps({"jsonrpc": "2.0", "id": 2, "method": "tools/call",
                        "params": {"name": "convert_html",
                                   "arguments": {"html": HTML,
                                                 "format": "text"}}}),
        ]
        out = io.StringIO()
        serve(stdin=io.StringIO("\n".join(lines) + "\n"), stdout=out)
        resps = [json.loads(ln) for ln in out.getvalue().splitlines()]
        assert len(resps) == 3  # notification produced no response
        assert resps[0]["id"] == 1
        assert resps[1]["error"]["code"] == -32700
        assert "Title Here" in resps[2]["result"]["content"][0]["text"]

    def test_subprocess_entrypoint(self):
        req = json.dumps({"jsonrpc": "2.0", "id": 1, "method": "tools/list"})
        p = subprocess.run([sys.executable, "-m",
                            "opendataloader_pdf_ray.server"],
                           input=req + "\n", capture_output=True, text=True,
                           timeout=60, cwd="/root/repo")
        resp = json.loads(p.stdout.strip().splitlines()[-1])
        assert resp["result"]["tools"][0]["name"] == "convert_html"


class TestRangeScanTool:
    def test_range_scan_lake_tool(self, tmp_path, ray_session):
        import pyarrow as pa

        from opendataloader_pdf_ray.cdc import Lake
        from opendataloader_pdf_ray.cdc.lake import Lineage
        from opendataloader_pdf_ray.cdc.rangeindex import (RangeIndex,
                                                           range_index_root)

        root = str(tmp_path / "lake")
        lake = Lake(root, 2)
        t = pa.table({
            "url": pa.array(["a", "b"], pa.string()),
            "warc_ts": pa.array([1, 2], pa.int64()),
            "seq": pa.array([1, 2], pa.int64()),
            "score": pa.array([120, 480], pa.int64()),
            "deleted": pa.array([False, False], pa.bool_()),
        })
        for part in (0, 1):
            lake.commit_delta(part, 0, t.slice(part, 1), Lineage(
                part=part, epoch=0, events_consumed=1, rows_upserted=1,
                rows_deleted=0, seq_min=part + 1, seq_max=part + 1))
        RangeIndex(range_index_root(root, "score"), 4, col="score",
                   width=100).refresh(lake)
        resp = _call("tools/call", {"name": "range_scan_lake",
                                    "arguments": {"lake": root,
                                                  "column": "score",
                                                  "lo": 100, "hi": 200}})
        assert resp["result"]["isError"] is False
        out = json.loads(resp["result"]["content"][0]["text"])
        assert out == {"n_urls": 1, "hits": [{"url": "a", "val": 120}]}


class TestLookupWhereTool:
    def test_lookup_where_lake_tool(self, tmp_path, ray_session):
        import pyarrow as pa

        from opendataloader_pdf_ray.cdc import Lake
        from opendataloader_pdf_ray.cdc.colindex import (ColumnIndex,
                                                         col_index_root)
        from opendataloader_pdf_ray.cdc.lake import Lineage
        from opendataloader_pdf_ray.cdc.rangeindex import (RangeIndex,
                                                           range_index_root)

        root = str(tmp_path / "lake")
        lake = Lake(root, 2)
        t = pa.table({
            "url": pa.array(["a", "b", "c"], pa.string()),
            "warc_ts": pa.array([1, 2, 3], pa.int64()),
            "seq": pa.array([1, 2, 3], pa.int64()),
            "score": pa.array([120, 180, 480], pa.int64()),
            "lang": pa.array(["en", "de", "en"], pa.string()),
            "deleted": pa.array([False] * 3, pa.bool_()),
        })
        from opendataloader_pdf_ray.cdc import url_partition

        parts = url_partition(t["url"].to_pylist(), 2)
        for p in (0, 1):
            sub = t.filter(pa.array(parts == p))
            if sub.num_rows:
                lake.commit_delta(p, 0, sub, Lineage(
                    part=p, epoch=0, events_consumed=sub.num_rows,
                    rows_upserted=sub.num_rows, rows_deleted=0,
                    seq_min=1, seq_max=3))
        RangeIndex(range_index_root(root, "score"), 4, col="score",
                   width=100).refresh(lake)
        ColumnIndex(col_index_root(root, "lang"), 4,
                    col="lang").refresh(lake)
        resp = _call("tools/call", {"name": "lookup_where_lake",
                                    "arguments": {
                                        "lake": root,
                                        "eq": {"lang": ["en"]},
                                        "between": {"score": [100, 200]}}})
        assert resp["result"]["isError"] is False
        out = json.loads(resp["result"]["content"][0]["text"])
        assert out == {"n_urls": 1, "urls": ["a"]}


class TestZoneMapAndTagsTools:
    def _lake(self, tmp_path):
        import pyarrow as pa

        from opendataloader_pdf_ray.cdc import Lake
        from opendataloader_pdf_ray.cdc.lake import Lineage

        root = str(tmp_path / "lake")
        lake = Lake(root, 2)
        t = pa.table({
            "url": pa.array(["a", "b"], pa.string()),
            "warc_ts": pa.array([1, 2], pa.int64()),
            "seq": pa.array([1, 2], pa.int64()),
            "score": pa.array([120, 480], pa.int64()),
            "deleted": pa.array([False, False], pa.bool_()),
        })
        for part in (0, 1):
            lake.commit_delta(part, 0, t.slice(part, 1), Lineage(
                part=part, epoch=0, events_consumed=1, rows_upserted=1,
                rows_deleted=0, seq_min=part + 1, seq_max=part + 1))
        lake.mark_epoch_done(0)
        return root, lake

    def test_zonemap_scan_lake_tool(self, tmp_path):
        root, _ = self._lake(tmp_path)
        resp = _call("tools/call", {"name": "zonemap_scan_lake",
                                    "arguments": {"lake": root,
                                                  "column": "score",
                                                  "lo": 100, "hi": 200}})
        assert resp["result"]["isError"] is False
        out = json.loads(resp["result"]["content"][0]["text"])
        assert out["n_rows"] == 1
        assert out["hits"] == [{"url": "a", "val": 120}]
        # metadata pruning: only the partition whose bound overlaps is read
        assert out["partitions_read"] < out["partitions_total"]

    def test_lake_tags_tool(self, tmp_path):
        root, lake = self._lake(tmp_path)
        lake.set_tag("r1", 0)
        resp = _call("tools/call", {"name": "lake_tags",
                                    "arguments": {"lake": root}})
        assert resp["result"]["isError"] is False
        out = json.loads(resp["result"]["content"][0]["text"])
        assert out == {"tags": {"r1": 0}}

    def test_lake_schema_tool(self, tmp_path):
        root, lake = self._lake(tmp_path)
        lake.rename_column("score", "points")
        resp = _call("tools/call", {"name": "lake_schema",
                                    "arguments": {"lake": root}})
        assert resp["result"]["isError"] is False
        out = json.loads(resp["result"]["content"][0]["text"])
        assert "points" in out["columns"] and "score" not in out["columns"]
        assert out["renames"][0]["from"] == "score"
