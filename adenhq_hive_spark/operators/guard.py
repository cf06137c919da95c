"""Content/data-quality guards.

The reference guards LLM node outputs against hallucinated payloads:
strings over a size threshold containing code indicators are rejected,
with long strings sampled at 5 evenly-spaced positions instead of scanned
whole (node.py:369-428; validator.py:36-99).  Re-expressed as a
data-quality column filter: JVM-side expressions for the hot path, so a
100 TB text column is guarded inside the scan pipeline, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Indicators that a "prose" field actually carries code/markup payloads.
CODE_INDICATORS = (
    "def ", "class ", "import ", "function(", "=>", "```",
    "<script", "SELECT ", "INSERT ", "{\"", "</",
)

DEFAULT_MAX_CHARS = 5_000  # node.py:414 threshold


def suspicious_content(
    text_col: str,
    max_chars: int = DEFAULT_MAX_CHARS,
    indicators: tuple[str, ...] = CODE_INDICATORS,
) -> Column:
    """Boolean column: True when the value is over the size threshold AND
    contains a code indicator — the reference's rejection rule.

    For oversize values the check samples 5 evenly-spaced 200-char
    windows (node.py:414-421) rather than scanning the full string; each
    window test is a JVM `contains`.
    """
    t = F.col(text_col)
    n = F.length(t)
    win = 200

    def window_at(frac: float) -> Column:
        pos = F.greatest(
            F.lit(1), F.least((n * F.lit(frac)).cast("int"), n - win)
        )
        return F.substring(t, pos, win)

    samples = [window_at(f) for f in (0.0, 0.25, 0.5, 0.75, 1.0)]
    any_indicator = F.lit(False)
    for s in samples:
        for ind in indicators:
            any_indicator = any_indicator | s.contains(ind)
    return (n > max_chars) & any_indicator


def filter_suspicious(
    df: DataFrame, text_col: str = "text", max_chars: int = DEFAULT_MAX_CHARS
) -> DataFrame:
    """Drop rows whose text fails the guard; the keep-side filter."""
    return df.filter(~suspicious_content(text_col, max_chars))


def flag_suspicious(
    df: DataFrame, text_col: str = "text", max_chars: int = DEFAULT_MAX_CHARS
) -> DataFrame:
    """Annotate instead of drop: adds ``suspicious`` boolean."""
    return df.withColumn(
        "suspicious", suspicious_content(text_col, max_chars)
    )
