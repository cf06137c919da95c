"""HTTP LLM provider tests — a REAL process/wire boundary: an in-thread
OpenAI-compatible toy server (POST /v1/chat/completions), exercised both
directly and end-to-end through the Spark pandas-UDF operators."""

from __future__ import annotations

import http.server
import json
import threading

import pytest

from adenhq_hive_spark.functions.llm_http import http_chat_provider

REQUESTS: list[dict] = []
FAIL_FIRST = {"n": 0}  # remaining 429s to serve before succeeding


class Handler(http.server.BaseHTTPRequestHandler):
    def log_message(self, *a):  # quiet
        pass

    def do_POST(self):
        body = json.loads(
            self.rfile.read(int(self.headers["Content-Length"]))
        )
        REQUESTS.append(
            {"body": body, "auth": self.headers.get("Authorization")}
        )
        if FAIL_FIRST["n"] > 0:
            FAIL_FIRST["n"] -= 1
            self.send_response(429)
            if FAIL_FIRST.get("retry_after_ms"):
                self.send_header(
                    "retry-after-ms", str(FAIL_FIRST["retry_after_ms"])
                )
            self.end_headers()
            self.wfile.write(b'{"error": "rate limited"}')
            return
        user = [m for m in body["messages"] if m["role"] == "user"][-1]
        if "empty" in user["content"] and FAIL_FIRST.get("empty_n", 0) > 0:
            FAIL_FIRST["empty_n"] -= 1
            out = {"choices": [{"message": {"role": "assistant",
                                            "content": None}}]}
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(json.dumps(out).encode())
            return
        if "explode" in user["content"]:
            self.send_response(400)
            self.end_headers()
            self.wfile.write(b'{"error": "bad request"}')
            return
        out = {
            "choices": [
                {
                    "message": {
                        "role": "assistant",
                        "content": f"echo:{user['content']}",
                    }
                }
            ]
        }
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(json.dumps(out).encode())


@pytest.fixture()
def server():
    REQUESTS.clear()
    FAIL_FIRST.clear()
    FAIL_FIRST["n"] = 0
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}/v1/chat/completions"
    finally:
        srv.shutdown()


def test_batch_round_trip_and_request_shape(server):
    fn = http_chat_provider(
        server, model="toy-1", api_key="sk-test", system="be brief",
        max_workers=4,
    )
    got = fn(["alpha", "beta", "gamma"])
    assert got == ["echo:alpha", "echo:beta", "echo:gamma"]
    req = REQUESTS[0]
    assert req["auth"] == "Bearer sk-test"
    assert req["body"]["model"] == "toy-1"
    assert req["body"]["temperature"] == 0.0
    assert req["body"]["messages"][0] == {
        "role": "system", "content": "be brief",
    }


def test_retries_transient_then_succeeds(server):
    FAIL_FIRST["n"] = 2
    fn = http_chat_provider(server, model="toy-1", backoff_s=0.01)
    assert fn(["hello"]) == ["echo:hello"]
    assert len(REQUESTS) == 3  # two 429s + the success


def test_non_retryable_fails_fast_with_body(server):
    fn = http_chat_provider(server, model="toy-1", backoff_s=0.01)
    with pytest.raises(RuntimeError, match="HTTP 400.*bad request"):
        fn(["please explode"])
    assert len(REQUESTS) == 1  # no retries on a 4xx config error


def test_map_completion_udf_end_to_end(spark, server):
    """The full path a user runs: DataFrame column → pandas UDF →
    HTTP provider → completion column; NULLs never reach the wire."""
    from pyspark.sql import functions as F

    from adenhq_hive_spark.functions.llm import map_completion_udf

    fn = http_chat_provider(server, model="toy-1")
    udf = map_completion_udf(fn, prompt_template="summarize: {}")
    df = spark.createDataFrame(
        [(1, "doc one"), (2, None), (3, "doc three")],
        "id long, text string",
    )
    got = {r["id"]: r["out"]
           for r in df.withColumn("out", udf(F.col("text"))).collect()}
    assert got == {
        1: "echo:summarize: doc one",
        2: None,
        3: "echo:summarize: doc three",
    }
    sent = {r["body"]["messages"][-1]["content"] for r in REQUESTS}
    assert sent == {"summarize: doc one", "summarize: doc three"}


def test_map_completion_requires_callable():
    from adenhq_hive_spark.functions.llm import map_completion_udf

    with pytest.raises(NotImplementedError):
        map_completion_udf("heuristic")


def test_judge_udf_through_http_provider(spark, server):
    """The existing judge operator accepts the HTTP provider unchanged
    (the seam contract): non-verdict provider output maps to ESCALATE."""
    from pyspark.sql import functions as F

    from adenhq_hive_spark.functions.llm import judge_udf

    fn = http_chat_provider(server, model="toy-1")
    df = spark.createDataFrame([(1, "ACCEPT")], "id long, text string")
    # provider echoes 'echo:ACCEPT' — not in the verdict vocabulary
    got = df.withColumn(
        "v", judge_udf(fn)(F.col("text"))
    ).collect()[0]["v"]
    assert got == "ESCALATE"


def test_compute_retry_delay_priorities():
    """Reference litellm.py:133-180 priority order: retry-after-ms ->
    retry-after seconds -> retry-after HTTP-date -> exponential
    backoff; everything clamped to max_delay."""
    import email.utils
    import time as _t

    from adenhq_hive_spark.functions.llm_http import compute_retry_delay

    # 1. ms header wins even when retry-after is present
    h = {"retry-after-ms": "250", "retry-after": "7"}
    assert compute_retry_delay(0, h) == 0.25
    # 2. seconds form
    assert compute_retry_delay(0, {"retry-after": "3"}) == 3.0
    # 3. HTTP-date form (parsed relative to now, clamped >= 0)
    date = email.utils.formatdate(_t.time() + 5, usegmt=True)
    d = compute_retry_delay(0, {"retry-after": date})
    assert 3.0 < d <= 5.5
    past = email.utils.formatdate(_t.time() - 60, usegmt=True)
    assert compute_retry_delay(0, {"retry-after": past}) == 0.0
    # 4. fallback: capped exponential backoff
    assert compute_retry_delay(3, None, backoff_base=0.5) == 4.0
    assert compute_retry_delay(30, None, backoff_base=0.5, max_delay=30) == 30
    # malformed header values fall through to backoff
    assert compute_retry_delay(
        1, {"retry-after-ms": "soon", "retry-after": "later"},
        backoff_base=0.5,
    ) == 1.0


def test_retry_after_header_is_honored(server):
    """A 429 carrying retry-after-ms must drive the wait, not the local
    backoff schedule."""
    FAIL_FIRST["n"] = 1
    FAIL_FIRST["retry_after_ms"] = 40
    slept = []
    fn = http_chat_provider(
        server, model="toy-1", backoff_s=9.0, sleep=slept.append,
    )
    assert fn(["hello"]) == ["echo:hello"]
    assert slept == [0.04]  # header value, NOT backoff_s * 2^0


def test_empty_200_response_retried_then_succeeds(server):
    """200-with-no-content is the stealth rate limit: retry it like a
    429 (reference litellm.py:295-350); content arrives on attempt 2."""
    FAIL_FIRST["empty_n"] = 1
    slept = []
    fn = http_chat_provider(
        server, model="toy-1", backoff_s=0.01, sleep=slept.append,
    )
    assert fn(["empty please"]) == ["echo:empty please"]
    assert len(REQUESTS) == 2 and len(slept) == 1


def test_empty_200_gives_up_after_max_retries(server):
    FAIL_FIRST["empty_n"] = 99
    fn = http_chat_provider(
        server, model="toy-1", max_retries=2, sleep=lambda s: None,
    )
    with pytest.raises(RuntimeError, match="empty response"):
        fn(["empty forever"])
    assert len(REQUESTS) == 3
