"""HTTP LLM provider for the batch-operator seam (reference
llm/litellm.py:1-1047 — provider-routed chat completions with retry;
here re-expressed as the one PUBLIC wire contract every provider gateway
speaks: the OpenAI-compatible ``POST /v1/chat/completions`` shape, over
stdlib urllib like sources/mcp_client.py's HTTP transport).

``http_chat_provider`` returns a ``BatchFn`` (``list[str] ->
list[str]``) pluggable into every operator in functions/llm.py
(clean_output_udf / judge_udf / score_udf / map_completion_udf).  Design
points that matter at engine scale:

- **Latency-bound, so thread-fanned**: one chat completion per prompt
  (the wire protocol has no batch form), issued concurrently with a
  bounded thread pool PER Arrow batch.  Each executor core processes its
  own batches, so total in-flight requests ≈ cores × max_workers —
  size ``max_workers`` against the provider's rate limit, not the CPU.
- **Retry with capped exponential backoff** on 429/5xx (the two
  transient classes); 4xx config errors fail fast with the response
  body in the message.
- **Deterministic knobs exposed** (temperature=0 default, max_tokens,
  system prompt) but LLM output remains excluded from the hash
  contract by SURVEY design — these operators are bench/feature tier.
- The returned closure is cloudpickle-friendly (stdlib imports inside),
  so it ships to executors inside pandas UDFs.
"""

from __future__ import annotations

import json
import time


def compute_retry_delay(
    attempt: int,
    headers=None,
    backoff_base: float = 0.5,
    max_delay: float = 30.0,
) -> float:
    """Retry delay, preferring server-provided Retry-After over local
    backoff (reference litellm.py:133-180 priority order):

    1. ``retry-after-ms`` header (milliseconds)
    2. ``retry-after`` as seconds
    3. ``retry-after`` as an HTTP-date (RFC 7231)
    4. capped exponential backoff ``backoff_base * 2^attempt``

    Every branch clamps to ``[0, max_delay]`` — a misbehaving server
    must not be able to park an executor thread for an hour.
    ``headers`` is any case-insensitive mapping (urllib's HTTPMessage).
    """
    if headers is not None:
        ms = headers.get("retry-after-ms")
        if ms is not None:
            try:
                return min(max(float(ms) / 1000.0, 0.0), max_delay)
            except (TypeError, ValueError):
                pass
        ra = headers.get("retry-after")
        if ra is not None:
            try:
                return min(max(float(ra), 0.0), max_delay)
            except (TypeError, ValueError):
                pass
            try:
                from email.utils import parsedate_to_datetime

                dt = parsedate_to_datetime(ra)
                delay = dt.timestamp() - time.time()
                return min(max(delay, 0.0), max_delay)
            except (TypeError, ValueError):
                pass
    return min(backoff_base * (2.0 ** attempt), max_delay)


def http_chat_provider(
    url: str,
    model: str,
    api_key: str | None = None,
    system: str | None = None,
    temperature: float = 0.0,
    max_tokens: int = 1024,
    timeout: float = 60.0,
    max_retries: int = 3,
    backoff_s: float = 0.5,
    max_workers: int = 8,
    extra_headers: dict[str, str] | None = None,
    sleep=time.sleep,
):
    """Build a ``BatchFn`` speaking OpenAI-compatible chat completions.

    ``url`` is the full endpoint (e.g. ``http://host:port/v1/chat/
    completions``).  Raises RuntimeError with the HTTP body on
    non-retryable errors or after ``max_retries`` transient failures —
    a failed row fails the batch loudly (silent None rows would leak
    into training data as empty documents).

    Transient classes retried with ``compute_retry_delay`` (server
    Retry-After honored, else capped exponential backoff): HTTP
    429/5xx, wire errors, and EMPTY 200 responses — some providers
    signal quota exhaustion as 200-with-no-content instead of a 429
    (reference litellm.py:295-350 treats the two identically; a
    response with tool_calls but no content is NOT empty).
    ``sleep`` is injectable for deterministic tests.
    """
    headers = {"Content-Type": "application/json"}
    if api_key:
        headers["Authorization"] = f"Bearer {api_key}"
    if extra_headers:
        headers.update(extra_headers)

    def _one(prompt: str) -> str:
        import urllib.error
        import urllib.request

        messages = []
        if system:
            messages.append({"role": "system", "content": system})
        messages.append({"role": "user", "content": prompt})
        payload = json.dumps(
            {
                "model": model,
                "messages": messages,
                "temperature": temperature,
                "max_tokens": max_tokens,
            }
        ).encode()
        last_err: Exception | None = None
        for attempt in range(max_retries + 1):
            req = urllib.request.Request(
                url, data=payload, headers=headers, method="POST"
            )
            try:
                with urllib.request.urlopen(req, timeout=timeout) as r:
                    body = json.loads(r.read().decode())
                    resp_headers = r.headers
                msg = body["choices"][0]["message"]
                content = msg.get("content")
                if not content and not msg.get("tool_calls"):
                    # 200-with-nothing = stealth rate limit; retry —
                    # honoring a Retry-After header on THIS response is
                    # the point of compute_retry_delay, so pass the
                    # headers captured before the with-block closed
                    last_err = RuntimeError(
                        "LLM returned empty response (no content, no "
                        "tool_calls) — likely rate limited"
                    )
                    sleep(compute_retry_delay(
                        attempt, resp_headers, backoff_s
                    ))
                    continue
                return content or ""
            except urllib.error.HTTPError as e:
                detail = e.read().decode(errors="replace")[:500]
                if e.code == 429 or e.code >= 500:
                    last_err = RuntimeError(
                        f"LLM HTTP {e.code} (transient): {detail}"
                    )
                    sleep(compute_retry_delay(attempt, e.headers, backoff_s))
                    continue
                raise RuntimeError(
                    f"LLM HTTP {e.code}: {detail}"
                ) from None
            except (OSError, KeyError, IndexError, ValueError) as e:
                last_err = RuntimeError(f"LLM call failed: {e}")
                sleep(compute_retry_delay(attempt, None, backoff_s))
        raise last_err  # type: ignore[misc]

    def batch(prompts: list[str]) -> list[str]:
        from concurrent.futures import ThreadPoolExecutor

        if not prompts:
            return []
        workers = max(1, min(max_workers, len(prompts)))
        with ThreadPoolExecutor(max_workers=workers) as pool:
            return list(pool.map(_one, prompts))

    return batch
