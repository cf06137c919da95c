"""Slowly-changing-dimension (type 2) interval builder.

The batch complement to the CDC upsert/time-travel sink
(streaming/upsert.py): given an append-only change log, produce the
classic warehouse SCD2 dimension — one row per (key, value) EPISODE
with its validity interval, consecutive no-change rows collapsed.  The
reference's conversation/state stores replay logs the same way (latest
row wins); SCD2 is the standard relational encoding of that history so
point-in-time joins (`valid_from <= ts < valid_to`) become plain range
predicates that Catalyst can push.

Scale shape: everything is two windows over the SAME (key) x (ts, id)
ordering — one shuffle, reused by both window operators (no second
exchange; pinned in tests via the plan's single Exchange).  Per-key
history is the partition unit, so skew is bounded by the hottest key's
row count, the same contract as sessionization (q58).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    value_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Collapse a change log into SCD2 validity intervals.

    Emits (key, value, valid_from, valid_to, is_current): one row per
    maximal run of equal ``value_col`` per key in (ts, tiebreak) order;
    ``valid_from`` = first ts of the run, ``valid_to`` = start of the
    NEXT run (NULL on the open/current episode), ``is_current`` marks
    it.  ``tiebreak_col`` must make the ordering total (same-timestamp
    changes would otherwise make run boundaries nondeterministic).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    changed = (
        df.select(key_col, value_col, ts_col, tiebreak_col)
        .withColumn("_prev", F.lag(value_col).over(w))
        .filter(
            F.col("_prev").isNull()
            | (F.col(value_col) != F.col("_prev"))
        )
    )
    return (
        changed.withColumn(
            "valid_to", F.lead(ts_col).over(w)
        )
        .select(
            F.col(key_col),
            F.col(value_col),
            F.col(ts_col).alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
        .orderBy(key_col, "valid_from")
    )
