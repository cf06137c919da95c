"""Heuristic repair + extraction of JSON from LLM output.

The reference hardens LLM-produced JSON in three pure functions we
re-implement fresh from their documented behavior (SURVEY §1.2):
markdown-fence stripping and Python-literal fixes
(output_cleaner.py:19-59 ``_heuristic_repair``), balanced-brace object
extraction from prose (node.py:89-138 ``find_json_object``), and
unescaped-newline fixing inside string values (node.py:33-86).

Deterministic, no LLM fallback tier here — this is the "heuristic tiers
first" path (SURVEY §7 step 7); an LLM repair UDF can wrap it later.
These run driver-side or inside a pandas UDF for bulk cleaning of a
string column (``repair_json_udf``).
"""

from __future__ import annotations

import json
import re
from typing import Any

_FENCE_RE = re.compile(r"```(?:json|JSON)?\s*(.*?)\s*```", re.DOTALL)


def strip_markdown_fences(text: str) -> str:
    """Return the content of the first fenced block, else the input."""
    m = _FENCE_RE.search(text)
    return m.group(1) if m else text


def fix_python_literals(text: str) -> str:
    """True/False/None → true/false/null outside of string literals."""
    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c == '"':
            j = i + 1
            while j < n:
                if text[j] == "\\":
                    j += 2
                    continue
                if text[j] == '"':
                    break
                j += 1
            out.append(text[i : j + 1])
            i = j + 1
            continue
        for py, js in (("True", "true"), ("False", "false"), ("None", "null")):
            if text.startswith(py, i) and not _is_word_char(text, i - 1) \
                    and not _is_word_char(text, i + len(py)):
                out.append(js)
                i += len(py)
                break
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _is_word_char(text: str, idx: int) -> bool:
    return 0 <= idx < len(text) and (text[idx].isalnum() or text[idx] == "_")


def swap_single_quotes(text: str) -> str:
    """Best-effort ' → " swap when the text contains no double quotes."""
    if '"' in text:
        return text
    return text.replace("'", '"')


def fix_unescaped_newlines(text: str) -> str:
    """Escape raw newlines that occur inside JSON string literals."""
    out: list[str] = []
    in_string = False
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c == "\\" and in_string and i + 1 < n:
            out.append(text[i : i + 2])
            i += 2
            continue
        if c == '"':
            in_string = not in_string
            out.append(c)
        elif c == "\n" and in_string:
            out.append("\\n")
        elif c == "\t" and in_string:
            out.append("\\t")
        elif c == "\r" and in_string:
            out.append("\\r")
        else:
            out.append(c)
        i += 1
    return "".join(out)


def find_json_object(text: str) -> str | None:
    """Extract the first balanced {...} or [...] span from prose,
    respecting string literals and escapes."""
    for open_ch, close_ch in (("{", "}"), ("[", "]")):
        start = text.find(open_ch)
        while start != -1:
            depth = 0
            in_string = False
            i = start
            while i < len(text):
                c = text[i]
                if in_string:
                    if c == "\\":
                        i += 2
                        continue
                    if c == '"':
                        in_string = False
                elif c == '"':
                    in_string = True
                elif c == open_ch:
                    depth += 1
                elif c == close_ch:
                    depth -= 1
                    if depth == 0:
                        return text[start : i + 1]
                i += 1
            start = text.find(open_ch, start + 1)
    return None


def repair_json(text: str) -> Any | None:
    """Full heuristic pipeline → parsed value, or None if unrecoverable.

    Tiers (cheapest first, mirroring the reference's fast path):
    1. direct json.loads
    2. fence-strip → loads
    3. + python literal fix, single-quote swap, newline escape → loads
    4. + balanced-span extraction from prose → loads
    """
    for candidate in _candidates(text):
        try:
            return json.loads(candidate)
        except (json.JSONDecodeError, TypeError):
            continue
    return None


def _candidates(text: str):
    yield text
    stripped = strip_markdown_fences(text)
    yield stripped
    repaired = fix_unescaped_newlines(
        swap_single_quotes(fix_python_literals(stripped))
    )
    yield repaired
    span = find_json_object(repaired)
    if span is not None:
        yield span
    raw_span = find_json_object(text)
    if raw_span is not None:
        yield fix_unescaped_newlines(
            swap_single_quotes(fix_python_literals(raw_span))
        )


def repair_json_udf():
    """Arrow-batched pandas UDF: repair a string column → JSON string
    (or NULL). For bulk-cleaning LLM output columns at scale."""
    # module-level import: with PEP-563 string annotations, pandas_udf
    # resolves the pd.Series hints in the module globals
    import pandas as pd  # noqa: F401 (used in annotations)
    from pyspark.sql.functions import pandas_udf

    globals().setdefault("pd", pd)

    @pandas_udf("string")
    def _repair(col: "pd.Series") -> "pd.Series":
        def one(x):
            if x is None:
                return None
            v = repair_json(x)
            return None if v is None else json.dumps(v, sort_keys=True)

        return col.map(one)

    return _repair
