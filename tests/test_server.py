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
        assert [t["name"] for t in tools] == ["convert_html"]
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
