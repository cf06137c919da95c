"""Minimal MCP (Model Context Protocol) stdio client — the process-
boundary tool source the reference treats as first-class
(core/framework/runner/mcp_client.py:49-457: stdio/HTTP transports, a
dedicated connection thread, tool discovery, call dispatch).

Implemented from the PUBLIC protocol only: MCP's stdio transport is
JSON-RPC 2.0 with newline-delimited JSON messages over the server
process's stdin/stdout. Lifecycle: ``initialize`` request →
``notifications/initialized`` notification → ``tools/list`` /
``tools/call``. No SDK dependency — stdlib subprocess + a reader
thread; the whole client is synchronous (requests carry monotonically
increasing ids; the reader thread routes responses by id).

Spark posture: MCP tools run at the DRIVER — they are orchestration
tools behind a process boundary, not row-wise functions, so they are
never registered as executor-side UDFs (a subprocess pipe cannot be
shipped in a closure). Tool RESULTS enter the engine through the
existing external-row seam (:func:`mcp_fetch_fn` adapts a tool to the
``external_source`` FetchFn contract), and tool metadata lands in the
ToolRegistry catalog via :func:`register_mcp_tools`.
"""

from __future__ import annotations

import json
import os
import subprocess
import threading
from dataclasses import dataclass, field
from typing import Any

PROTOCOL_VERSION = "2024-11-05"


@dataclass
class MCPServerConfig:
    """How to launch one stdio MCP server (reference MCPServerConfig
    shape: name + command + args + env)."""

    name: str
    command: list[str]
    env: dict[str, str] = field(default_factory=dict)
    timeout: float = 15.0


class MCPError(RuntimeError):
    """JSON-RPC error response from the server (code + message)."""

    def __init__(self, code: int, message: str, data: Any = None):
        super().__init__(f"MCP error {code}: {message}")
        self.code = code
        self.message = message
        self.data = data


class MCPStdioClient:
    """Synchronous JSON-RPC 2.0 client over a child process's stdio.

    One background reader thread drains stdout and routes responses to
    the waiting caller by request id (notifications — messages without
    an id — are collected, not dispatched). All public methods raise
    ``RuntimeError`` if the server died and ``TimeoutError`` if a
    response doesn't arrive within the configured timeout.
    """

    def __init__(self, config: MCPServerConfig):
        self.config = config
        self._proc: subprocess.Popen | None = None
        self._lock = threading.Lock()          # write-side serialization
        self._pending: dict[int, dict] = {}    # id -> response message
        self._cond = threading.Condition()
        self._next_id = 0
        self._reader: threading.Thread | None = None
        self.server_info: dict[str, Any] = {}
        self.notifications: list[dict] = []

    # -- transport ---------------------------------------------------

    def connect(self) -> None:
        """Spawn the server and run the MCP handshake."""
        env = dict(os.environ)
        env.update(self.config.env)
        self._proc = subprocess.Popen(
            self.config.command,
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            env=env,
            text=True,
            bufsize=1,  # line-buffered: the framing is one JSON per line
        )
        self._reader = threading.Thread(target=self._read_loop, daemon=True)
        self._reader.start()
        result = self._request(
            "initialize",
            {
                "protocolVersion": PROTOCOL_VERSION,
                "capabilities": {},
                "clientInfo": {
                    "name": "adenhq_hive_spark", "version": "1.0"
                },
            },
        )
        self.server_info = result.get("serverInfo", {})
        self._notify("notifications/initialized", {})

    def _read_loop(self) -> None:
        assert self._proc is not None and self._proc.stdout is not None
        for line in self._proc.stdout:
            line = line.strip()
            if not line:
                continue
            try:
                msg = json.loads(line)
            except ValueError:
                continue  # non-protocol noise on stdout
            if "method" in msg:
                # a message WITH a method is server-initiated (a
                # notification, or — with an id — a server REQUEST such
                # as ping/roots/list; its id is the server's own
                # numbering and may collide with a pending client call,
                # so it must never be routed as a response)
                if "id" in msg and msg["id"] is not None:
                    self._answer_server_request(msg)
                else:
                    self.notifications.append(msg)
            elif "id" in msg and msg["id"] is not None:
                with self._cond:
                    self._pending[msg["id"]] = msg
                    self._cond.notify_all()
            else:
                self.notifications.append(msg)
        with self._cond:  # EOF: wake waiters so they can fail fast
            self._cond.notify_all()

    def _answer_server_request(self, msg: dict) -> None:
        """Reply to a server-initiated request: pings get an empty
        result (keepalive contract); anything else gets method-not-found
        so the server never hangs on our silence."""
        reply: dict
        if msg.get("method") == "ping":
            reply = {"jsonrpc": "2.0", "id": msg["id"], "result": {}}
        else:
            reply = {
                "jsonrpc": "2.0",
                "id": msg["id"],
                "error": {
                    "code": -32601,
                    "message": f"method not supported: {msg.get('method')}",
                },
            }
        try:
            self._send(reply)
        except (RuntimeError, OSError):
            pass  # server went away; the read loop will notice EOF

    def _send(self, msg: dict) -> None:
        if self._proc is None or self._proc.stdin is None:
            raise RuntimeError("MCP client not connected")
        if self._proc.poll() is not None:
            raise RuntimeError(
                f"MCP server {self.config.name!r} exited "
                f"(code {self._proc.returncode})"
            )
        with self._lock:
            self._proc.stdin.write(json.dumps(msg) + "\n")
            self._proc.stdin.flush()

    def _request(self, method: str, params: dict) -> dict:
        self._next_id += 1
        rid = self._next_id
        self._send(
            {"jsonrpc": "2.0", "id": rid, "method": method, "params": params}
        )
        with self._cond:
            ok = self._cond.wait_for(
                lambda: rid in self._pending
                or (self._proc is not None and self._proc.poll() is not None),
                timeout=self.config.timeout,
            )
            if rid not in self._pending:
                if not ok:
                    raise TimeoutError(
                        f"MCP {method} timed out after "
                        f"{self.config.timeout}s"
                    )
                raise RuntimeError(
                    f"MCP server {self.config.name!r} exited mid-request"
                )
            msg = self._pending.pop(rid)
        if "error" in msg:
            err = msg["error"]
            raise MCPError(
                err.get("code", -1), err.get("message", ""), err.get("data")
            )
        return msg.get("result", {})

    def _notify(self, method: str, params: dict) -> None:
        self._send({"jsonrpc": "2.0", "method": method, "params": params})

    # -- protocol surface ---------------------------------------------

    def list_tools(self) -> list[dict[str, Any]]:
        """``tools/list`` → [{name, description, inputSchema}, ...]."""
        return self._request("tools/list", {}).get("tools", [])

    def call_tool(self, name: str, arguments: dict[str, Any]) -> Any:
        """``tools/call`` → the result's content. Text content blocks
        are unwrapped (single block → its text, several → list of
        texts); ``structuredContent`` wins when present; an
        ``isError: true`` result raises (tool-level failure is an
        error, not data)."""
        result = self._request(
            "tools/call", {"name": name, "arguments": arguments}
        )
        if result.get("isError"):
            texts = [
                c.get("text", "")
                for c in result.get("content", [])
                if c.get("type") == "text"
            ]
            raise MCPError(-2, "; ".join(texts) or f"tool {name} failed")
        if "structuredContent" in result:
            return result["structuredContent"]
        texts = [
            c.get("text", "")
            for c in result.get("content", [])
            if c.get("type") == "text"
        ]
        if len(texts) == 1:
            return texts[0]
        return texts

    def close(self) -> None:
        if self._proc is None:
            return
        try:
            if self._proc.stdin is not None:
                self._proc.stdin.close()
            self._proc.terminate()
            self._proc.wait(timeout=5)
        except Exception:
            self._proc.kill()
        finally:
            self._proc = None

    def __enter__(self) -> "MCPStdioClient":
        self.connect()
        return self

    def __exit__(self, *exc) -> None:
        self.close()


class MCPHttpClient:
    """Synchronous JSON-RPC 2.0 client over HTTP POST — the second MCP
    transport the reference supports (mcp_client.py:231-329: one POST
    per request to the server's endpoint, response routed by id).
    Stdlib-only (urllib); same public surface as :class:`MCPStdioClient`
    (connect/list_tools/call_tool/close, context manager), so callers
    are transport-agnostic.
    """

    def __init__(self, name: str, url: str, timeout: float = 15.0,
                 headers: dict[str, str] | None = None):
        self.name = name
        self.url = url
        self.timeout = timeout
        self.headers = {"Content-Type": "application/json"}
        if headers:
            self.headers.update(headers)
        self._next_id = 0
        self.server_info: dict[str, Any] = {}
        # duck-typed config so register_mcp_tools prefixes identically
        self.config = MCPServerConfig(name=name, command=[], timeout=timeout)

    def _post(self, payload: dict) -> dict:
        import urllib.request

        req = urllib.request.Request(
            self.url,
            data=json.dumps(payload).encode(),
            headers=self.headers,
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            return json.loads(resp.read().decode())

    def _request(self, method: str, params: dict) -> dict:
        self._next_id += 1
        msg = self._post(
            {"jsonrpc": "2.0", "id": self._next_id,
             "method": method, "params": params}
        )
        if "error" in msg:
            err = msg["error"]
            raise MCPError(
                err.get("code", -1), err.get("message", ""), err.get("data")
            )
        return msg.get("result", {})

    def connect(self) -> None:
        result = self._request(
            "initialize",
            {
                "protocolVersion": PROTOCOL_VERSION,
                "capabilities": {},
                "clientInfo": {
                    "name": "adenhq_hive_spark", "version": "1.0"
                },
            },
        )
        self.server_info = result.get("serverInfo", {})
        # initialized notification (no id; servers must accept and
        # return nothing of consequence — ignore any body)
        try:
            self._post(
                {"jsonrpc": "2.0", "method": "notifications/initialized",
                 "params": {}}
            )
        except Exception:
            pass  # some HTTP servers 202/204 notifications; not fatal

    list_tools = MCPStdioClient.list_tools
    call_tool = MCPStdioClient.call_tool

    def close(self) -> None:  # stateless transport
        return None

    def __enter__(self) -> "MCPHttpClient":
        self.connect()
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def mcp_fetch_fn(client: MCPStdioClient, tool_name: str):
    """Adapt one MCP tool to the ``external_source`` FetchFn contract:
    the tool's JSON result (a list of row dicts, or a JSON string of
    one) becomes the row envelope that ``rows_to_df`` loads under a
    declared schema — the same seam every SaaS connector uses
    (sources/external.py)."""

    def fetch(**kwargs) -> list[dict[str, Any]]:
        out = client.call_tool(tool_name, kwargs)
        if isinstance(out, str):
            out = json.loads(out)
        if isinstance(out, dict):  # single row or {rows: [...]} envelope
            out = out.get("rows", [out])
        if not isinstance(out, list):
            raise TypeError(
                f"MCP tool {tool_name!r} returned non-tabular content"
            )
        return out

    return fetch


def register_mcp_tools(registry, client: MCPStdioClient) -> int:
    """Discover the server's tools and record them in the ToolRegistry
    CATALOG as driver-side callables (reference _discover_tools →
    registry registration). Not Spark UDFs — the subprocess pipe lives
    on the driver; use :func:`mcp_fetch_fn` + ``external_source`` to
    bring results into a DataFrame."""
    from ..functions.registry import ToolSpec

    n = 0
    for tool in client.list_tools():
        name = f"{client.config.name}__{tool['name']}"
        spec = ToolSpec(
            name=name,
            description=tool.get("description", ""),
            fn=(lambda _t: lambda **kw: client.call_tool(_t, kw))(
                tool["name"]
            ),
            return_type="string",
            parameters=tool.get("inputSchema", {}),
        )
        registry.register_driver_tool(spec)
        n += 1
    return n
