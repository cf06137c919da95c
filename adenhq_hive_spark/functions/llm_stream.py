"""LLM streaming-token events as a DataFrame surface.

Reference parity: core/framework/llm/stream_events.py:14-96 defines the
discriminated union of stream events (text_delta / text_end / tool_call /
tool_result / reasoning_start / reasoning_delta / finish / error) and
core/framework/llm/provider.py:173-204 the ``stream()`` contract, whose
DEFAULT implementation synthesizes delta -> end -> finish from a blocking
completion. Here the same contract is re-expressed Spark-first:

- The event union becomes ONE FLAT ROW SCHEMA (``STREAM_EVENT_SCHEMA``)
  discriminated by ``event_type`` — the DataFrame-native encoding of a
  tagged union (unused fields are NULL), so event streams from many
  prompts are a plain exploded table you can window, sessionize, or
  aggregate (tokens/sec, time-to-first-token, stop-reason mix) with the
  relational tier.
- ``sse_stream_provider`` speaks the PUBLIC OpenAI-compatible SSE wire
  form (``stream: true`` + ``data: {json}`` lines, ``data: [DONE]``
  terminator) over stdlib urllib, same seam discipline as
  functions/llm_http.py.
- ``synthesize_stream`` wraps any blocking ``BatchFn`` into the default
  delta/end/finish synthesis — the provider.py:202-204 fallback.
- ``llm_stream_events`` runs a stream provider over a prompt column via
  ``mapInPandas`` and emits one row per event with a per-request
  monotonically increasing ``event_idx``. Like every LLM operator here,
  output is excluded from the hash contract by SURVEY design
  (non-deterministic upstream); the PLUMBING (schema, ordering,
  accumulation invariants, wire parsing) is what the tests pin.

Scale posture: streaming calls are latency-bound, not CPU-bound — each
Arrow batch fans its prompts over a bounded thread pool (in-flight ≈
cores × max_workers, size against the provider's rate limit); events
buffer per request (bounded by max_tokens) rather than per partition.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame

# Flat tagged-union row: reference stream_events.py:14-96, one field set
# per event type, discriminant first.
STREAM_EVENT_SCHEMA = (
    "req_id string, event_idx int, event_type string, "
    "content string, snapshot string, full_text string, "
    "tool_use_id string, tool_name string, tool_input string, "
    "is_error boolean, stop_reason string, "
    "input_tokens long, output_tokens long, model string, "
    "error string, recoverable boolean"
)

_EVENT_KEYS = [
    "event_type", "content", "snapshot", "full_text", "tool_use_id",
    "tool_name", "tool_input", "is_error", "stop_reason",
    "input_tokens", "output_tokens", "model", "error", "recoverable",
]

# prompt -> ordered list of event dicts (keys from _EVENT_KEYS)
StreamFn = Callable[[str], list[dict]]


def _event(event_type: str, **fields) -> dict:
    ev = dict.fromkeys(_EVENT_KEYS)
    ev["event_type"] = event_type
    ev.update(fields)
    return ev


def synthesize_stream(batch_fn) -> StreamFn:
    """Default stream synthesis from a blocking completion (reference
    provider.py:202-204): one text_delta carrying the whole text, then
    text_end, then finish."""

    def stream(prompt: str) -> list[dict]:
        text = batch_fn([prompt])[0]
        return [
            _event("text_delta", content=text, snapshot=text),
            _event("text_end", full_text=text),
            _event("finish", stop_reason="end_turn",
                   input_tokens=0, output_tokens=0, model=""),
        ]

    return stream


def sse_stream_provider(
    url: str,
    model: str,
    api_key: str | None = None,
    system: str | None = None,
    temperature: float = 0.0,
    max_tokens: int = 1024,
    timeout: float = 60.0,
) -> StreamFn:
    """OpenAI-compatible SSE streaming chat: ``stream: true``, parse
    ``data:`` lines into text_delta events with an accumulated snapshot,
    close with text_end + finish (stop reason and usage lifted from the
    final chunks when the server sends them). A wire or parse error mid-
    stream emits a terminal ``error`` event (recoverable=False) instead
    of raising — a partially-streamed row is DATA about the provider,
    not a reason to kill the batch (reference StreamErrorEvent)."""
    headers = {"Content-Type": "application/json"}
    if api_key:
        headers["Authorization"] = f"Bearer {api_key}"

    def stream(prompt: str) -> list[dict]:
        import urllib.error
        import urllib.request

        messages = []
        if system:
            messages.append({"role": "system", "content": system})
        messages.append({"role": "user", "content": prompt})
        payload = json.dumps({
            "model": model,
            "messages": messages,
            "temperature": temperature,
            "max_tokens": max_tokens,
            "stream": True,
        }).encode()
        req = urllib.request.Request(
            url, data=payload, headers=headers, method="POST"
        )
        events: list[dict] = []
        snapshot: list[str] = []
        stop_reason, usage_in, usage_out = "end_turn", 0, 0
        def consume(data: str) -> bool:
            """Process one complete SSE event payload; True = [DONE]."""
            nonlocal stop_reason, usage_in, usage_out
            if data == "[DONE]":
                return True
            chunk = json.loads(data)
            if "usage" in chunk and chunk["usage"]:
                usage_in = chunk["usage"].get("prompt_tokens", 0)
                usage_out = chunk["usage"].get("completion_tokens", 0)
            for choice in chunk.get("choices", []):
                delta = choice.get("delta", {})
                piece = delta.get("content")
                if piece:
                    snapshot.append(piece)
                    events.append(_event(
                        "text_delta", content=piece,
                        snapshot="".join(snapshot),
                    ))
                if choice.get("finish_reason"):
                    stop_reason = choice["finish_reason"]
            return False

        try:
            with urllib.request.urlopen(req, timeout=timeout) as r:
                # SSE framing, not line framing: an event is every
                # field line up to a blank-line delimiter, and multiple
                # consecutive ``data:`` lines form ONE payload joined
                # with \n (the spec shape OpenAI-compatible servers are
                # allowed to emit even though they send single-line
                # data today). r iterates buffered lines, so a payload
                # split across socket reads is reassembled before here.
                data_lines: list[str] = []
                done = False
                for raw in r:
                    line = raw.decode("utf-8", errors="replace")
                    line = line.rstrip("\r\n")
                    if line == "":  # event delimiter -> dispatch
                        if data_lines:
                            done = consume("\n".join(data_lines))
                            data_lines = []
                        if done:
                            break
                        continue
                    if line.startswith(":"):  # comment / keep-alive
                        continue
                    if line.startswith("data:"):
                        data_lines.append(line[5:].removeprefix(" "))
                    # other fields (event:, id:, retry:) carry nothing
                    # for the chat-completion wire form
                if data_lines and not done:  # stream closed mid-event
                    consume("\n".join(data_lines))
        except (urllib.error.URLError, OSError, ValueError) as e:
            events.append(_event(
                "error", error=f"stream failed: {e}", recoverable=False,
            ))
            return events
        full = "".join(snapshot)
        events.append(_event("text_end", full_text=full))
        events.append(_event(
            "finish", stop_reason=stop_reason, input_tokens=usage_in,
            output_tokens=usage_out, model=model,
        ))
        return events

    return stream


def llm_stream_events(
    df: DataFrame,
    stream_fn: StreamFn,
    prompt_col: str = "prompt",
    id_col: str = "req_id",
    max_workers: int = 8,
) -> DataFrame:
    """Run ``stream_fn`` over every prompt and emit the event table:
    one row per stream event, ``event_idx`` ordered within ``req_id``.
    Latency-bound -> thread-fanned per Arrow batch (same sizing contract
    as http_chat_provider)."""
    if not callable(stream_fn):
        raise TypeError("stream_fn must be callable (a StreamFn)")
    cols = [id_col, prompt_col]

    def run(batches: Iterator) -> Iterator:
        import pandas as pd
        from concurrent.futures import ThreadPoolExecutor

        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].astype(str).tolist()
            prompts = pdf[prompt_col].astype(str).tolist()
            workers = max(1, min(max_workers, len(prompts)))
            with ThreadPoolExecutor(max_workers=workers) as pool:
                streams = list(pool.map(stream_fn, prompts))
            rows = []
            for rid, evs in zip(ids, streams):
                for i, ev in enumerate(evs):
                    rows.append({"req_id": rid, "event_idx": i, **ev})
            yield pd.DataFrame(
                rows,
                columns=["req_id", "event_idx", *_EVENT_KEYS],
            )

    return df.select(*cols).mapInPandas(run, STREAM_EVENT_SCHEMA)
