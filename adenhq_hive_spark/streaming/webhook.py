"""Webhook/HTTP entry point → Structured Streaming file source.

The reference runs an embedded HTTP server whose only job is
"receive HTTP → publish event"; subscribers react to the event
(core/framework/runtime/webhook_server.py:21-60 routes + HMAC check,
105-143 handler). The Spark-first mapping keeps that exact contract but
lands each accepted request as one atomically-renamed JSON file in a
spool directory, which a Structured Streaming file source tails — so a
webhook entry point feeds the same windowing/stateful operators as any
other stream, checkpointed and replayable (the spool IS the write-ahead
log). Completes the entry-point set next to timer/cron/availableNow
(streaming/events.py).

stdlib ``http.server`` on a background thread: no extra dependency, and
the server's job is intentionally tiny — parse, verify, spool, 202.
"""

from __future__ import annotations

import hashlib
import hmac
import json
import os
import threading
import time
import uuid
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WEBHOOK_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.StringType()),
        T.StructField("source_id", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("method", T.StringType()),
        T.StructField("recv_ts_ms", T.LongType()),
        T.StructField("headers", T.MapType(T.StringType(), T.StringType())),
        T.StructField("query", T.StringType()),
        T.StructField("payload", T.StringType()),  # raw JSON text
    ]
)


@dataclass
class WebhookRoute:
    """A registered route (reference WebhookRoute shape): requests to
    ``path`` with one of ``methods`` are accepted as events for
    ``source_id``; ``secret`` enables HMAC-SHA256 verification of the
    ``X-Hub-Signature-256`` header over the raw body."""

    source_id: str
    path: str
    methods: list[str] = field(default_factory=lambda: ["POST"])
    secret: str | None = None


def _verify_signature(headers, body: bytes, secret: str) -> bool:
    sig = headers.get("X-Hub-Signature-256", "")
    if not sig.startswith("sha256="):
        return False
    computed = hmac.new(secret.encode(), body, hashlib.sha256).hexdigest()
    return hmac.compare_digest(sig[7:], computed)


class WebhookReceiver:
    """Receive HTTP → spool one JSON-line file per accepted request.

    Files are written to ``<spool_dir>/.tmp-*`` and renamed into place,
    so the streaming file source never observes a half-written file.
    """

    def __init__(self, spool_dir: str, routes: list[WebhookRoute]):
        self.spool_dir = spool_dir
        self.routes = {r.path: r for r in routes}
        os.makedirs(spool_dir, exist_ok=True)
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        if self._server is None:
            raise RuntimeError("receiver not started")
        return self._server.server_address[1]

    def start(self, host: str = "127.0.0.1", port: int = 0) -> None:
        routes, spool_dir = self.routes, self.spool_dir

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def _respond(self, code: int, obj: dict) -> None:
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _handle(self) -> None:
                route = routes.get(self.path.split("?")[0])
                if route is None:
                    return self._respond(404, {"error": "Not found"})
                if self.command not in route.methods:
                    return self._respond(405, {"error": "Method not allowed"})
                length = int(self.headers.get("Content-Length") or 0)
                body = self.rfile.read(length) if length else b""
                if route.secret and not _verify_signature(
                    self.headers, body, route.secret
                ):
                    return self._respond(401, {"error": "Invalid signature"})
                try:
                    json.loads(body) if body else {}
                    payload = body.decode() if body else "{}"
                except (json.JSONDecodeError, UnicodeDecodeError):
                    payload = json.dumps(
                        {"raw_body": body.decode("utf-8", errors="replace")}
                    )
                qs = ""
                if "?" in self.path:
                    qs = self.path.split("?", 1)[1]
                event = {
                    "event_id": uuid.uuid4().hex,
                    "source_id": route.source_id,
                    "path": self.path.split("?")[0],
                    "method": self.command,
                    "recv_ts_ms": int(time.time() * 1000),
                    "headers": {k: v for k, v in self.headers.items()},
                    "query": qs,
                    "payload": payload,
                }
                tmp = os.path.join(spool_dir, f".tmp-{event['event_id']}")
                with open(tmp, "w") as f:
                    f.write(json.dumps(event) + "\n")
                os.replace(
                    tmp, os.path.join(spool_dir, f"{event['event_id']}.json")
                )
                self._respond(202, {"status": "accepted"})

            do_POST = _handle
            do_PUT = _handle
            do_GET = _handle
            do_DELETE = _handle

        self._server = ThreadingHTTPServer((host, port), Handler)
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None
            self._thread = None


def webhook_event_stream(spark: SparkSession, spool_dir: str) -> DataFrame:
    """Streaming DataFrame over the spool: one row per accepted request,
    event-time column ``ts`` derived from the receive timestamp. Plug
    into the same subscribe/window/stateful operators as any stream."""
    raw = (
        spark.readStream.schema(WEBHOOK_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .json(spool_dir)
    )
    return raw.withColumn("ts", F.timestamp_millis(F.col("recv_ts_ms")))


def inject_webhook_event(
    spool_dir: str,
    source_id: str,
    payload: dict,
    path: str = "/hook",
    method: str = "POST",
) -> str:
    """Test/ops helper: append an HTTP-shaped event row to the spool
    without a live server (same file protocol). Returns the event id."""
    os.makedirs(spool_dir, exist_ok=True)
    event_id = uuid.uuid4().hex
    event = {
        "event_id": event_id,
        "source_id": source_id,
        "path": path,
        "method": method,
        "recv_ts_ms": int(time.time() * 1000),
        "headers": {},
        "query": "",
        "payload": json.dumps(payload),
    }
    tmp = os.path.join(spool_dir, f".tmp-{event_id}")
    with open(tmp, "w") as f:
        f.write(json.dumps(event) + "\n")
    os.replace(tmp, os.path.join(spool_dir, f"{event_id}.json"))
    return event_id
