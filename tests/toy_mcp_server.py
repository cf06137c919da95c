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


def main() -> None:
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        msg = json.loads(line)
        method = msg.get("method", "")
        rid = msg.get("id")
        if rid is None:
            continue  # notification (e.g. notifications/initialized)
        if method == "initialize":
            reply(rid, {
                "protocolVersion": msg["params"].get("protocolVersion"),
                "capabilities": {"tools": {}},
                "serverInfo": {"name": "toy", "version": "0.1"},
            })
        elif method == "tools/list":
            reply(rid, {"tools": TOOLS})
        elif method == "tools/call":
            name = msg["params"]["name"]
            args = msg["params"].get("arguments", {})
            if name == "add":
                reply(rid, text_result(str(args["a"] + args["b"])))
            elif name == "rows":
                rows = [{"i": i, "sq": i * i} for i in range(args["n"])]
                reply(rid, text_result(json.dumps(rows)))
            elif name == "boom":
                reply(rid, {
                    "isError": True,
                    "content": [{"type": "text", "text": "kaboom"}],
                })
            else:
                reply(rid, error={"code": -32602,
                                  "message": f"unknown tool {name}"})
        else:
            reply(rid, error={"code": -32601,
                              "message": f"method not found: {method}"})


if __name__ == "__main__":
    main()
