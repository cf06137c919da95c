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
    max_retries: int = 3,
    backoff_s: float = 0.5,
    sleep=None,
) -> StreamFn:
    """OpenAI-compatible SSE streaming chat: ``stream: true``, parse
    ``data:`` lines into text_delta events with an accumulated snapshot,
    close with text_end + finish (stop reason and usage lifted from the
    final chunks when the server sends them). A wire or parse error mid-
    stream emits a terminal ``error`` event (recoverable=False) instead
    of raising — a partially-streamed row is DATA about the provider,
    not a reason to kill the batch (reference StreamErrorEvent).

    EMPTY streams (no text deltas, no tool calls, no error — the
    200-with-nothing stealth rate limit) are retried up to
    ``max_retries`` times with Retry-After-aware backoff before the
    empty event list is returned as-is (reference litellm.py:975-1014;
    wire errors stay terminal events by the error-is-data contract
    above). ``sleep`` is injectable for deterministic tests."""
    headers = {"Content-Type": "application/json"}
    if api_key:
        headers["Authorization"] = f"Bearer {api_key}"

    def _stream_once(prompt: str) -> list[dict]:
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
        # Mid-stream tool-call assembly (reference litellm.py:903-970):
        # providers ship function-call ARGUMENTS as JSON fragments spread
        # across many chunks, keyed by a per-call index; id/name arrive
        # on the first fragment only. Accumulate per index, emit ONE
        # tool_call event per call — with the fragments joined and
        # parsed — when the stream finishes.
        tool_acc: dict[int, dict[str, str]] = {}
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
                for tc in delta.get("tool_calls") or []:
                    idx = tc.get("index", 0) or 0
                    acc = tool_acc.setdefault(
                        idx, {"id": "", "name": "", "arguments": ""}
                    )
                    if tc.get("id"):
                        acc["id"] = tc["id"]
                    fn = tc.get("function") or {}
                    if fn.get("name"):
                        acc["name"] = fn["name"]
                    if fn.get("arguments"):
                        acc["arguments"] += fn["arguments"]
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
        # Tail events in reference order (litellm.py:942-970): assembled
        # tool_calls sorted by call index, then text_end (only when text
        # was produced — a pure tool-call turn has no text to end; an
        # empty stream keeps the event for turn-boundary visibility),
        # then finish.
        for _idx, acc in sorted(tool_acc.items()):
            try:
                parsed = json.loads(acc["arguments"])
            except (json.JSONDecodeError, KeyError):
                # Reference fallback: never drop a call over malformed
                # JSON — wrap the raw fragment string for the caller.
                parsed = {"_raw": acc.get("arguments", "")}
            events.append(_event(
                "tool_call", tool_use_id=acc["id"], tool_name=acc["name"],
                tool_input=json.dumps(parsed, sort_keys=True),
            ))
        full = "".join(snapshot)
        if full or not tool_acc:
            events.append(_event("text_end", full_text=full))
        events.append(_event(
            "finish", stop_reason=stop_reason, input_tokens=usage_in,
            output_tokens=usage_out, model=model,
        ))
        return events

    def stream(prompt: str) -> list[dict]:
        import time as _time

        from .llm_http import compute_retry_delay

        do_sleep = sleep if sleep is not None else _time.sleep
        evs: list[dict] = []
        for attempt in range(max_retries + 1):
            evs = _stream_once(prompt)
            types = {e["event_type"] for e in evs}
            if types & {"text_delta", "tool_call", "error"}:
                return evs
            if attempt < max_retries:  # empty stream -> retry
                do_sleep(compute_retry_delay(attempt, None, backoff_s))
        return evs

    return stream


def assemble_tool_calls(
    df: DataFrame,
    req_col: str = "req_id",
    idx_col: str = "tool_idx",
    chunk_col: str = "chunk_idx",
    id_col: str = "call_id",
    name_col: str = "tool_name",
    frag_col: str = "frag",
) -> DataFrame:
    """Mid-stream tool-call assembly as a RELATIONAL operator.

    The reference assembles streamed tool calls one request at a time
    inside the provider loop (litellm.py:903-970): fragments of the
    arguments JSON arrive across chunks keyed by call index, id/name on
    the first fragment only, and the call is complete when the joined
    fragments parse. ``sse_stream_provider`` mirrors that per-request
    path; THIS operator is the at-scale form — given a table of recorded
    chunk fragments (req, call index, chunk order, fragment), assemble
    every call in one distributed pass:

    - id/name: MAX over the group (constant-when-present per the wire
      contract, so max = the one non-null value; null-safe).
    - arguments: order-preserving concat — collect_list of
      (chunk_idx, frag) structs, array_sort (struct field order = sort
      key order), transform to the fragment, array_join. Stays inside
      whole-stage codegen; ONE shuffle on (req, idx).
    - validity: ``get_json_object(args, '$')`` is NULL exactly when the
      joined string is not parseable JSON (the reference's
      json.loads-try) — no Python in the plan. Callers get the raw
      string plus the discriminant instead of an exception, the flat-row
      encoding of the reference's ``{"_raw": ...}`` fallback.

    Returns one row per (req, tool_idx): call_id, tool_name, tool_input
    (joined fragments), n_frags, is_valid.
    """
    from pyspark.sql import functions as F

    frags = F.array_sort(
        F.collect_list(F.struct(F.col(chunk_col), F.col(frag_col)))
    )
    args = F.array_join(
        F.transform(frags, lambda s: s[frag_col]), ""
    ).alias("tool_input")
    out = (
        df.groupBy(F.col(req_col), F.col(idx_col))
        .agg(
            F.max(id_col).alias("call_id"),
            F.max(name_col).alias("tool_name"),
            args,
            F.count(frag_col).alias("n_frags"),
        )
    )
    return out.withColumn(
        "is_valid", F.get_json_object(F.col("tool_input"), "$").isNotNull()
    )


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
