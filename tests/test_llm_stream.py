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


class ToolCallHandler(http.server.BaseHTTPRequestHandler):
    """SSE server streaming MID-STREAM TOOL CALLS the way OpenAI-
    compatible providers do (reference litellm.py:903-970's input
    shape): arguments JSON split across chunks per call index, id/name
    on the first fragment only, two calls interleaved, one of them
    deliberately malformed. Prompt 'notext' produces a pure tool-call
    turn (no content deltas at all)."""

    def log_message(self, *a):
        pass

    def do_POST(self):
        body = json.loads(
            self.rfile.read(int(self.headers["Content-Length"]))
        )
        user = [m for m in body["messages"] if m["role"] == "user"][-1]
        pure_tools = user["content"] == "notext"
        self.send_response(200)
        self.send_header("Content-Type", "text/event-stream")
        self.end_headers()

        def send(obj):
            self.wfile.write(f"data: {json.dumps(obj)}\n\n".encode())

        def tc(idx, frag, call_id=None, name=None):
            d = {"index": idx, "function": {"arguments": frag}}
            if call_id:
                d["id"] = call_id
            if name:
                d["function"]["name"] = name
            return {"choices": [{"delta": {"tool_calls": [d]}}]}

        if not pure_tools:
            send({"choices": [{"delta": {"content": "Searching."}}]})
        # call 0 and call 1 interleave; call 1's JSON never closes
        send(tc(0, '{"qu', call_id="call_a", name="search"))
        send(tc(1, '{"url": ', call_id="call_b", name="fetch"))
        send(tc(0, 'ery": "x"'))
        send(tc(1, '"http://e'))
        send(tc(0, ', "k": 3}'))
        send({"choices": [{"delta": {}, "finish_reason": "tool_calls"}],
              "usage": {"prompt_tokens": 5, "completion_tokens": 9}})
        self.wfile.write(b"data: [DONE]\n\n")


@pytest.fixture()
def toolcall_server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), ToolCallHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/v1/chat/completions"
    srv.shutdown()


def test_sse_tool_call_assembly_across_chunks(toolcall_server):
    evs = sse_stream_provider(toolcall_server, model="toy")("go")
    types = [e["event_type"] for e in evs]
    # delta, then buffered tail: tool_calls in index order, text_end
    # (text was produced), finish — reference litellm.py:942-970 order
    assert types == [
        "text_delta", "tool_call", "tool_call", "text_end", "finish"]
    a, b = evs[1], evs[2]
    assert (a["tool_use_id"], a["tool_name"]) == ("call_a", "search")
    assert json.loads(a["tool_input"]) == {"query": "x", "k": 3}
    # malformed arguments -> reference {"_raw": ...} fallback, not a raise
    assert (b["tool_use_id"], b["tool_name"]) == ("call_b", "fetch")
    assert json.loads(b["tool_input"]) == {"_raw": '{"url": "http://e'}
    assert evs[-1]["stop_reason"] == "tool_calls"
    assert evs[-1]["output_tokens"] == 9


def test_sse_pure_tool_call_turn_has_no_text_end(toolcall_server):
    evs = sse_stream_provider(toolcall_server, model="toy")("notext")
    types = [e["event_type"] for e in evs]
    assert types == ["tool_call", "tool_call", "finish"]
    assert json.loads(evs[0]["tool_input"]) == {"query": "x", "k": 3}


def test_assemble_tool_calls_relational(spark):
    from adenhq_hive_spark.functions.llm_stream import assemble_tool_calls

    # fragments arrive out of order; id/name only on the first chunk
    rows = [
        ("r1", 0, 2, None, None, ', "k": 3}'),
        ("r1", 0, 0, "call_a", "search", '{"qu'),
        ("r1", 0, 1, None, None, 'ery": "x"'),
        ("r1", 1, 1, None, None, '"oops'),
        ("r1", 1, 0, "call_b", "fetch", '{"url": '),
        ("r2", 0, 0, "call_c", "noop", '{}'),
    ]
    df = spark.createDataFrame(
        rows, "req_id string, tool_idx int, chunk_idx int, "
              "call_id string, tool_name string, frag string")
    out = {(r.req_id, r.tool_idx): r
           for r in assemble_tool_calls(df).collect()}
    a = out[("r1", 0)]
    assert (a.call_id, a.tool_name) == ("call_a", "search")
    assert a.tool_input == '{"query": "x", "k": 3}'
    assert a.n_frags == 3 and a.is_valid
    b = out[("r1", 1)]
    assert b.tool_input == '{"url": "oops' and not b.is_valid
    c = out[("r2", 0)]
    assert c.tool_input == "{}" and c.is_valid and c.n_frags == 1


class EmptyFirstHandler(http.server.BaseHTTPRequestHandler):
    """First N requests stream NOTHING but a finish chunk (the
    200-with-nothing stealth rate limit in stream form); then text."""

    empty_n = 0
    hits = 0

    def log_message(self, *a):
        pass

    def do_POST(self):
        self.rfile.read(int(self.headers["Content-Length"]))
        type(self).hits += 1
        self.send_response(200)
        self.send_header("Content-Type", "text/event-stream")
        self.end_headers()
        if type(self).empty_n > 0:
            type(self).empty_n -= 1
            fin = {"choices": [{"delta": {}, "finish_reason": "stop"}]}
            self.wfile.write(f"data: {json.dumps(fin)}\n\n".encode())
            self.wfile.write(b"data: [DONE]\n\n")
            return
        for chunk in (
            {"choices": [{"delta": {"content": "ok"}}]},
            {"choices": [{"delta": {}, "finish_reason": "stop"}]},
        ):
            self.wfile.write(f"data: {json.dumps(chunk)}\n\n".encode())
        self.wfile.write(b"data: [DONE]\n\n")


def test_sse_empty_stream_retried_then_succeeds():
    EmptyFirstHandler.empty_n = 2
    EmptyFirstHandler.hits = 0
    srv = http.server.ThreadingHTTPServer(
        ("127.0.0.1", 0), EmptyFirstHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/v1/chat/completions"
        slept = []
        evs = sse_stream_provider(url, model="toy", sleep=slept.append)("x")
        assert [e["event_type"] for e in evs] == [
            "text_delta", "text_end", "finish"]
        assert evs[0]["content"] == "ok"
        assert EmptyFirstHandler.hits == 3 and len(slept) == 2
        # give-up path: empty events returned as-is, no exception
        EmptyFirstHandler.empty_n = 99
        EmptyFirstHandler.hits = 0
        evs = sse_stream_provider(
            url, model="toy", max_retries=1, sleep=lambda s: None)("x")
        assert [e["event_type"] for e in evs] == ["text_end", "finish"]
        assert EmptyFirstHandler.hits == 2
    finally:
        srv.shutdown()
