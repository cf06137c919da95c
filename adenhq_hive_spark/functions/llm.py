"""LLM calls as batch operators (reference llm/provider.py:61-105,
litellm.py; judge verdicts conversation_judge.py:25-104; SURVEY §2.10).

The reference makes per-node LLM calls; at engine scale an LLM call is a
batched column operator: Arrow-batched pandas UDFs that map a text
column through a provider.  No provider SDK ships in this container and
LLM output is non-deterministic (excluded from the hash contract by
design, SURVEY §2.11 non-goals), so the provider seam is explicit:

- ``provider='heuristic'`` — deterministic, dependency-free tiers
  (the reference's own fast paths: heuristic JSON repair
  output_cleaner.py:19-59, rule-based judge verdicts).
- ``provider=callable`` — plug a real ``batch: list[str] -> list[str]``
  completion function (HTTP client, local model, ...).
- anything else raises NotImplementedError.

The UDFs batch via Arrow, so a real provider receives full batches for
request coalescing instead of row-at-a-time calls.
"""

from __future__ import annotations

import json
from collections.abc import Callable

import pandas as pd
from pyspark.sql.functions import pandas_udf

from .json_repair import repair_json

BatchFn = Callable[[list[str]], list[str]]

# Judge verdict vocabulary (event_loop_node.py:43-47)
VERDICTS = ("ACCEPT", "RETRY", "ESCALATE")


def _resolve(provider: str | BatchFn) -> BatchFn | None:
    if callable(provider):
        return provider
    if provider == "heuristic":
        return None
    raise NotImplementedError(
        f"No LLM provider {provider!r} available in this environment; pass "
        "a callable batch completion fn or use provider='heuristic'."
    )


def clean_output_udf(provider: str | BatchFn = "heuristic"):
    """Output-cleaner operator: raw LLM text column → canonical JSON
    string (heuristic tier; a provider fn adds an LLM repair tier for
    rows the heuristics cannot fix — output_cleaner.py:85-340 shape)."""
    fn = _resolve(provider)

    @pandas_udf("string")
    def _clean(col: pd.Series) -> pd.Series:
        def one(x: str | None) -> str | None:
            if x is None:
                return None
            v = repair_json(x)
            return None if v is None else json.dumps(v, sort_keys=True)

        out = col.map(one)
        if fn is not None:
            missing = out.isna() & col.notna()
            if missing.any():
                fixed = fn(col[missing].tolist())

                def reparse(v: str | None) -> str | None:
                    # mirror the heuristic tier: if the provider's repaired
                    # text is still unparseable, the row is NULL — not the
                    # JSON string 'null'
                    r = None if v is None else repair_json(v)
                    return None if r is None else json.dumps(r, sort_keys=True)

                out.loc[missing] = [reparse(v) for v in fixed]
        return out

    return _clean


def judge_udf(provider: str | BatchFn = "heuristic", min_chars: int = 20):
    """Judge operator: output text → ACCEPT / RETRY / ESCALATE
    (conversation_judge.py:25-104 verdict fn as a column op).

    Heuristic tier: empty/too-short → RETRY; contains an explicit
    error/refusal marker → ESCALATE; else ACCEPT. Deterministic, so
    pipelines are testable; a provider fn replaces the rule with a model
    verdict (must return one of the verdict strings per row).
    """
    fn = _resolve(provider)

    @pandas_udf("string")
    def _judge(col: pd.Series) -> pd.Series:
        def heuristic(x: str | None) -> str:
            if x is None or len(x.strip()) < min_chars:
                return "RETRY"
            low = x.lower()
            if "i cannot" in low or "error:" in low or "traceback" in low:
                return "ESCALATE"
            return "ACCEPT"

        if fn is None:
            return col.map(heuristic)
        out = pd.Series(fn(col.fillna("").tolist()), index=col.index)
        return out.where(out.isin(VERDICTS), "ESCALATE")

    return _judge


def score_udf(provider: str | BatchFn = "heuristic"):
    """Scoring operator: text → quality score in [0,1] (LLM-decide edge
    image, edge.py:144-157 — bench/feature tier, never in the hash
    contract). Heuristic tier mirrors operators/text.quality_score's
    length/diversity rules driver-side."""
    fn = _resolve(provider)

    @pandas_udf("double")
    def _score(col: pd.Series) -> pd.Series:
        def heuristic(x: str | None) -> float:
            if not x:
                return 0.0
            words = x.split()
            if not words:
                return 0.0
            s = 0.0
            if 5 <= len(words) <= 10_000:
                s += 0.5
            if len(set(words)) / len(words) > 0.3:
                s += 0.3
            if sum(1 for w in words if w.isalpha()) / len(words) > 0.5:
                s += 0.2
            return round(s, 4)

        if fn is None:
            return col.map(heuristic)
        return pd.Series(
            [min(1.0, max(0.0, float(v))) for v in fn(col.fillna("").tolist())],
            index=col.index,
        )

    return _score


def map_completion_udf(provider: BatchFn, prompt_template: str = "{}"):
    """The direct "LLM call as a column operator": text column →
    completion text (reference llm/provider.py:61-105 complete() as a
    batch map).  Unlike the cleaner/judge/score operators there is no
    deterministic heuristic tier for free-form completion, so a real
    ``BatchFn`` is REQUIRED (e.g. functions/llm_http.py:
    http_chat_provider); ``prompt_template`` wraps each input with
    ``str.format`` before the call.

    NULL rows stay NULL without consuming a request.  Output is
    bench/feature tier — never part of the hash contract (SURVEY
    §2.11 non-goals: non-deterministic operators).
    """
    if not callable(provider):
        raise NotImplementedError(
            "map_completion_udf needs a callable batch provider "
            "(see functions/llm_http.py:http_chat_provider); there is "
            "no heuristic completion tier."
        )

    @pandas_udf("string")
    def _complete(col: pd.Series) -> pd.Series:
        mask = col.notna()
        out = pd.Series([None] * len(col), index=col.index, dtype=object)
        if mask.any():
            prompts = [
                prompt_template.format(x) for x in col[mask].tolist()
            ]
            out.loc[mask] = provider(prompts)
        return out

    return _complete
