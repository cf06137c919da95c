"""MCP stdio client tests — a REAL process boundary: the toy server
(tests/toy_mcp_server.py) is spawned as a subprocess and spoken to over
newline-delimited JSON-RPC, covering handshake, discovery, calls, error
surfaces, and the external_source integration."""

from __future__ import annotations

import os
import sys

import pytest

from adenhq_hive_spark.sources.mcp_client import (
    MCPError,
    MCPServerConfig,
    MCPStdioClient,
    mcp_fetch_fn,
    register_mcp_tools,
)

SERVER = os.path.join(os.path.dirname(__file__), "toy_mcp_server.py")


def _config(**kw) -> MCPServerConfig:
    return MCPServerConfig(
        name="toy", command=[sys.executable, SERVER], **kw
    )


def test_handshake_discovery_and_calls():
    with MCPStdioClient(_config()) as c:
        assert c.server_info.get("name") == "toy"
        tools = c.list_tools()
        assert [t["name"] for t in tools] == ["add", "rows", "boom"]
        assert tools[0]["inputSchema"]["properties"]["a"]["type"] == "integer"
        assert c.call_tool("add", {"a": 2, "b": 40}) == "42"
        # request ids stay routed across interleaved calls
        assert c.call_tool("add", {"a": 1, "b": 1}) == "2"


def test_tool_error_and_unknown_tool_raise():
    with MCPStdioClient(_config()) as c:
        with pytest.raises(MCPError, match="kaboom"):
            c.call_tool("boom", {})
        with pytest.raises(MCPError, match="unknown tool"):
            c.call_tool("nope", {})
        # the session survives errors
        assert c.call_tool("add", {"a": 0, "b": 5}) == "5"


def test_dead_server_raises_not_hangs():
    c = MCPStdioClient(_config(timeout=5.0))
    c.connect()
    c._proc.kill()
    c._proc.wait()
    with pytest.raises((RuntimeError, TimeoutError)):
        c.call_tool("add", {"a": 1, "b": 2})
    c.close()


def test_registry_catalog_and_external_source(spark):
    from pyspark.sql import types as T

    from adenhq_hive_spark.functions.registry import ToolRegistry
    from adenhq_hive_spark.sources.external import external_source

    with MCPStdioClient(_config()) as c:
        reg = ToolRegistry(spark)
        n = register_mcp_tools(reg, c)
        assert n == 3
        names = [t["name"] for t in reg.list_tools()]
        assert "toy__add" in names and "toy__rows" in names
        # catalog-only: callable driver-side, NOT a Spark UDF
        assert reg._tools["toy__add"].fn(a=3, b=4) == "7"

        schema = T.StructType([
            T.StructField("i", T.LongType()),
            T.StructField("sq", T.LongType()),
        ])
        df = external_source(
            spark, mcp_fetch_fn(c, "rows"), schema, n=4
        )
        got = sorted((r.i, r.sq) for r in df.collect())
        assert got == [(0, 0), (1, 1), (2, 4), (3, 9)]


def test_http_transport_round_trip():
    import http.server
    import json as j
    import threading

    from adenhq_hive_spark.sources.mcp_client import MCPHttpClient

    from .toy_mcp_server import handle

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            msg = j.loads(self.rfile.read(n).decode())
            out = handle(msg)
            if out is None:  # notification
                self.send_response(202)
                self.end_headers()
                return
            body = j.dumps(out).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/mcp"
        with MCPHttpClient("toyhttp", url) as c:
            assert c.server_info.get("name") == "toy"
            tools = c.list_tools()
            assert [x["name"] for x in tools] == ["add", "rows", "boom"]
            assert c.call_tool("add", {"a": 20, "b": 22}) == "42"
            with pytest.raises(MCPError, match="kaboom"):
                c.call_tool("boom", {})
    finally:
        srv.shutdown()


def test_server_initiated_request_with_colliding_id_not_a_response():
    """A server REQUEST (id + method, e.g. ping) must never be routed
    as the response to an in-flight client call with the same id — the
    client answers it and still returns the real tool result."""
    cfg = _config(env={"TOY_MCP_PING_BEFORE_CALL": "1"})
    with MCPStdioClient(cfg) as c:
        # the toy server emits {"id": <call id>, "method": "ping"}
        # immediately before every tools/call response
        assert c.call_tool("add", {"a": 20, "b": 22}) == "42"
        assert c.call_tool("add", {"a": 1, "b": 2}) == "3"
        # the pings were handled as requests, not mistaken for replies
        assert all(
            n.get("method") != "ping" for n in c.notifications
        )
