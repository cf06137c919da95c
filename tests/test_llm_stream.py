"""Streaming LLM event tests — a REAL wire boundary: an in-thread
OpenAI-compatible SSE server (stream: true -> data: chunks -> [DONE]),
exercised directly and end-to-end through the mapInPandas event table.
Parity target: reference stream_events.py event union + provider.py's
default stream synthesis."""

from __future__ import annotations

import http.server
import json
import threading

import pytest

from adenhq_hive_spark.functions.llm_stream import (
    llm_stream_events,
    sse_stream_provider,
    synthesize_stream,
)


class Handler(http.server.BaseHTTPRequestHandler):
    def log_message(self, *a):  # quiet
        pass

    def do_POST(self):
        body = json.loads(
            self.rfile.read(int(self.headers["Content-Length"]))
        )
        assert body.get("stream") is True
        user = [m for m in body["messages"] if m["role"] == "user"][-1]
        words = f"echo {user['content']} done".split()
        self.send_response(200)
        self.send_header("Content-Type", "text/event-stream")
        self.end_headers()
        for i, w in enumerate(words):
            piece = w if i == 0 else " " + w
            chunk = {"choices": [{"delta": {"content": piece}}]}
            self.wfile.write(f"data: {json.dumps(chunk)}\n\n".encode())
        fin = {
            "choices": [{"delta": {}, "finish_reason": "stop"}],
            "usage": {"prompt_tokens": 7, "completion_tokens": len(words)},
        }
        self.wfile.write(f"data: {json.dumps(fin)}\n\n".encode())
        self.wfile.write(b"data: [DONE]\n\n")


@pytest.fixture()
def sse_server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/v1/chat/completions"
    srv.shutdown()


def test_sse_stream_event_sequence(sse_server):
    stream = sse_stream_provider(sse_server, model="toy")
    evs = stream("hi there")
    types = [e["event_type"] for e in evs]
    # deltas, then exactly one text_end and one finish, in order
    assert types[-2:] == ["text_end", "finish"]
    assert set(types[:-2]) == {"text_delta"}
    assert len(types) == 6  # 4 words + end + finish
    # snapshot accumulates to the full text
    deltas = [e for e in evs if e["event_type"] == "text_delta"]
    assert "".join(d["content"] for d in deltas) == "echo hi there done"
    assert deltas[-1]["snapshot"] == "echo hi there done"
    end = evs[-2]
    assert end["full_text"] == "echo hi there done"
    fin = evs[-1]
    assert fin["stop_reason"] == "stop"
    assert fin["input_tokens"] == 7 and fin["output_tokens"] == 4
    assert fin["model"] == "toy"


def test_stream_error_is_terminal_event_not_exception():
    stream = sse_stream_provider(
        "http://127.0.0.1:9/v1/chat/completions", model="toy", timeout=0.5
    )
    evs = stream("hi")
    assert len(evs) == 1
    assert evs[0]["event_type"] == "error"
    assert evs[0]["recoverable"] is False
    assert "stream failed" in evs[0]["error"]


def test_synthesize_stream_matches_reference_default():
    """provider.py:202-204: blocking completion -> delta + end + finish."""
    fn = synthesize_stream(lambda prompts: [f"OUT:{p}" for p in prompts])
    evs = fn("x")
    assert [e["event_type"] for e in evs] == [
        "text_delta", "text_end", "finish"]
    assert evs[0]["content"] == "OUT:x" == evs[0]["snapshot"]
    assert evs[1]["full_text"] == "OUT:x"
    assert evs[2]["stop_reason"] == "end_turn"


def test_llm_stream_events_dataframe_end_to_end(spark, sse_server):
    prompts = spark.createDataFrame(
        [("r1", "alpha"), ("r2", "beta gamma")], ["req_id", "prompt"]
    )
    out = llm_stream_events(
        prompts, sse_stream_provider(sse_server, model="toy")
    )
    rows = out.orderBy("req_id", "event_idx").collect()
    by_req = {}
    for r in rows:
        by_req.setdefault(r.req_id, []).append(r)
    assert set(by_req) == {"r1", "r2"}
    for rid, evs in by_req.items():
        # event_idx is dense and ordered per request
        assert [e.event_idx for e in evs] == list(range(len(evs)))
        assert evs[-2].event_type == "text_end"
        assert evs[-1].event_type == "finish"
        snap = "".join(
            e.content for e in evs if e.event_type == "text_delta")
        assert snap == evs[-2].full_text
    assert by_req["r1"][-2].full_text == "echo alpha done"
    assert by_req["r2"][-2].full_text == "echo beta gamma done"
    # the event table is relational: tokens-per-request via plain agg
    from pyspark.sql import functions as F

    agg = (
        out.filter(F.col("event_type") == "text_delta")
        .groupBy("req_id").agg(F.count("*").alias("n_deltas"))
        .orderBy("req_id").collect()
    )
    assert [(r.req_id, r.n_deltas) for r in agg] == [("r1", 3), ("r2", 4)]


def test_llm_stream_events_rejects_non_callable(spark):
    df = spark.createDataFrame([("a", "b")], ["req_id", "prompt"])
    with pytest.raises(TypeError):
        llm_stream_events(df, "not a function")


class MultiLineHandler(http.server.BaseHTTPRequestHandler):
    """SSE server exercising SPEC framing the single-line servers don't:
    multi-line data fields (consecutive data: lines = ONE event, joined
    with \\n), CRLF line endings, comment keep-alives, and an event:
    field — all before the JSON payloads."""

    def log_message(self, *a):
        pass

    def do_POST(self):
        self.rfile.read(int(self.headers["Content-Length"]))
        self.send_response(200)
        self.send_header("Content-Type", "text/event-stream")
        self.end_headers()
        w = self.wfile
        w.write(b": keep-alive comment, must be ignored\r\n\r\n")
        # one JSON payload split across TWO data: lines at a token
        # boundary (the spec joins them with \n, which is legal JSON
        # whitespace between tokens)
        w.write(b"event: message\r\n")
        w.write(b'data: {"choices": [{"delta":\r\n')
        w.write(b'data:  {"content": "multi"}}]}\r\n\r\n')
        fin = {"choices": [{"delta": {"content": " line"},
                            "finish_reason": "stop"}]}
        w.write(f"data: {json.dumps(fin)}\r\n\r\n".encode())
        w.write(b"data: [DONE]\r\n\r\n")


def test_sse_multiline_data_and_crlf_framing():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), MultiLineHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/v1/chat/completions"
        evs = sse_stream_provider(url, model="toy")("x")
        types = [e["event_type"] for e in evs]
        assert "error" not in types, evs
        assert types == ["text_delta", "text_delta", "text_end", "finish"]
        assert evs[-2]["full_text"] == "multi line"
        assert evs[-1]["stop_reason"] == "stop"
    finally:
        srv.shutdown()
