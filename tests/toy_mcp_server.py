"""A tiny stdio MCP server used by tests/test_mcp_client.py — real
process boundary, newline-delimited JSON-RPC 2.0.

Tools: ``add`` (a+b), ``rows`` (returns a JSON table of n rows),
``boom`` (isError result). Run: python tests/toy_mcp_server.py
"""

from __future__ import annotations

import json
import sys

TOOLS = [
    {
        "name": "add",
        "description": "Add two integers",
        "inputSchema": {
            "type": "object",
            "properties": {"a": {"type": "integer"}, "b": {"type": "integer"}},
        },
    },
    {
        "name": "rows",
        "description": "Return n rows of (i, sq)",
        "inputSchema": {
            "type": "object",
            "properties": {"n": {"type": "integer"}},
        },
    },
    {
        "name": "boom",
        "description": "Always fails",
        "inputSchema": {"type": "object", "properties": {}},
    },
]


def reply(rid, result=None, error=None):
    msg = {"jsonrpc": "2.0", "id": rid}
    if error is not None:
        msg["error"] = error
    else:
        msg["result"] = result
    sys.stdout.write(json.dumps(msg) + "\n")
    sys.stdout.flush()


def text_result(text):
    return {"content": [{"type": "text", "text": text}]}


def handle(msg: dict) -> dict | None:
    """Pure JSON-RPC dispatch shared by the stdio loop and the HTTP
    test harness. Returns the response message, or None for
    notifications."""
    method = msg.get("method", "")
    rid = msg.get("id")
    if rid is None:
        return None  # notification (e.g. notifications/initialized)

    def ok(result):
        return {"jsonrpc": "2.0", "id": rid, "result": result}

    def err(code, message):
        return {"jsonrpc": "2.0", "id": rid,
                "error": {"code": code, "message": message}}

    if method == "initialize":
        return ok({
            "protocolVersion": msg["params"].get("protocolVersion"),
            "capabilities": {"tools": {}},
            "serverInfo": {"name": "toy", "version": "0.1"},
        })
    if method == "tools/list":
        return ok({"tools": TOOLS})
    if method == "tools/call":
        name = msg["params"]["name"]
        args = msg["params"].get("arguments", {})
        if name == "add":
            return ok(text_result(str(args["a"] + args["b"])))
        if name == "rows":
            rows = [{"i": i, "sq": i * i} for i in range(args["n"])]
            return ok(text_result(json.dumps(rows)))
        if name == "boom":
            return ok({
                "isError": True,
                "content": [{"type": "text", "text": "kaboom"}],
            })
        return err(-32602, f"unknown tool {name}")
    return err(-32601, f"method not found: {method}")


def main() -> None:
    import os

    ping_before_call = bool(os.environ.get("TOY_MCP_PING_BEFORE_CALL"))
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        msg = json.loads(line)
        if "method" not in msg:
            continue  # a reply to a server-initiated request — consume
        if ping_before_call and msg.get("method") == "tools/call":
            # server-initiated REQUEST whose id deliberately collides
            # with the in-flight client call: a correct client must not
            # deliver this as the call's response
            print(json.dumps({"jsonrpc": "2.0", "id": msg["id"],
                              "method": "ping"}), flush=True)
        out = handle(msg)
        if out is None:
            continue
        if "error" in out:
            reply(out["id"], error=out["error"])
        else:
            reply(out["id"], out["result"])


if __name__ == "__main__":
    main()
