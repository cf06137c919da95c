"""Batch gap-based sessionization over event logs.

The batch complement to the streaming session window (streaming/events.py
session tier, q58): replayed history gets the SAME session boundaries a
live session_window would assign, so backfill and online features agree.
Reference behavior: the event/funnel analytics the reference exposes over
its conversation/event stores (conversation threading by inactivity gap);
re-expressed as the classic lag-diff → boundary-flag → running-sum plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Assign gap-based sessions per user and roll them up.

    A new session starts when the time since the user's previous event
    exceeds ``gap_minutes`` (strictly greater, matching Spark's
    session_window semantics where an event landing exactly on the gap
    boundary extends the session).  Emits one row per session:
    (user, session_n, n_events, start_ts, end_ts, duration_s) with
    session_n numbered 1.. per user in time order.

    Determinism: events ordered by (ts, id) — the same tiebreak as the
    SCD2/seq_motif event operators — so duplicate timestamps cannot
    flap boundaries; gap tests and durations run on MICROSECOND-exact
    integers (unix_micros ≡ DuckDB epoch_us — second-truncating
    functions disagree across engines on sub-second gaps), duration
    floor-divided to whole seconds.

    Scale: ONE shuffle on the user key serves both windows (lag and the
    running boundary sum share the (user) x (ts, id) ordering — same
    exchange-reuse shape as scd2_intervals), then the session rollup
    groups on (user, session_n) — a key that subdivides the user
    partition, so AQE coalesces it without a second wide exchange.
    Per-user state is bounded by that user's events; a pathological
    single user dominating the corpus is the same skew class as any
    user-keyed window (salt upstream if one key is >> a partition).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    gap_us = gap_minutes * 60 * 1_000_000
    flagged = df.select(
        user_col,
        ts_col,
        id_col,
        F.when(
            (
                F.unix_micros(F.col(ts_col))
                - F.unix_micros(F.lag(ts_col).over(w))
            )
            > gap_us,
            1,
        )
        .otherwise(0)
        .alias("_new"),
    )
    w_run = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = flagged.withColumn(
        "session_n", (F.sum("_new").over(w_run) + 1).cast("long")
    )
    return (
        sess.groupBy(user_col, "session_n")
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("start_ts"),
            F.max(ts_col).alias("end_ts"),
        )
        .withColumn(
            "duration_s",
            F.expr(
                "(unix_micros(end_ts) - unix_micros(start_ts))"
                " div 1000000"
            ).cast("long"),
        )
        .orderBy(user_col, "session_n")
    )
