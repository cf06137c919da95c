"""As-of join (point-in-time lookup).

The reference reaches as-of semantics only through its delegated SQL
surface; Q33 declares the portable range-join + row_number formulation.
That formulation explodes at scale: each left row joins every earlier
right row before the window keeps one (O(|L|·|R|) within a key).

This operator is the scale path: UNION both sides tagged, one window
sorted by (key, ts, side, order_col), and ``last(value, ignoreNulls)``
carries the most recent right-side attributes forward.  Cost is one
shuffle on the key and a linear pass — no pair explosion — which is the
shape that survives 100 TB.

Semantics (the pandas ``merge_asof`` surface, distributed):

- ``direction='backward'``: the right row with the greatest
  ``right_ts <= left_ts``; ties on right_ts resolve to the greatest
  ``order_col``.  Matches Q33's ORDER BY ts DESC, event_id DESC exactly.
- ``direction='forward'``: the right row with the smallest
  ``right_ts >= left_ts``; ties still resolve to the greatest
  ``order_col`` (same in-window carry, descending scan).
- ``direction='nearest'``: whichever of the two is closer in time;
  equidistant resolves to BACKWARD (the row already seen at event
  time — the only choice a streaming execution could also make).
- ``tolerance``: maximum allowed |left_ts - right_ts| in SECONDS for
  timestamp columns (column units for numeric ts); a match farther
  away reports NULL.  None = unbounded.

Forward/nearest add a second windowed pass over the same key partition
(the exchange is shared; only the sort differs) — still no pair join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _ts_delta(a: F.Column, b: F.Column, is_timestamp: bool) -> F.Column:
    """(a - b) in seconds for time-like columns, column units otherwise.

    Time-like covers timestamp, timestamp_ntz and date — all cast to
    TIMESTAMP first: the session-tz shift a ntz/date cast applies is
    identical on both operands, so the DELTA is unaffected."""
    if is_timestamp:
        return (
            F.unix_micros(a.cast("timestamp"))
            - F.unix_micros(b.cast("timestamp"))
        ) / F.lit(1_000_000.0)
    return a - b


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_values: list[str] | None = None,
    order_col: str | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """As-of join: point-in-time right-side lookup for each left row.

    Returns the left rows plus ``asof_<col>`` for each of ``right_values``
    (NULL when no right row qualifies under ``direction``/``tolerance``).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    if right_values is None:
        right_values = [c for c in right.columns if c not in (on, right_ts)]

    left_cols = left.columns
    lt = dict(left.dtypes).get(left_ts, "")
    is_ts = lt.startswith("timestamp") or lt == "date"
    # side marker: right rows sort before left rows at equal ts, so a
    # right row with right_ts == left_ts is visible to that left row
    # (the <= in Q33); mirrored for the forward scan.
    #
    # All right values travel in ONE struct (plus the right ts itself,
    # for tolerance/nearest arithmetic) and a single last(ignoreNulls)
    # carries that struct: every asof_* column comes from the same
    # (most recent) right row, and a NULL attribute on that row stays
    # NULL instead of being back-filled from an older row.
    r = right.select(
        F.col(on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(right_ts).alias("__rts"),
            *[F.col(c) for c in right_values],
        ).alias("__rv"),
    )
    rv_type = r.schema["__rv"].dataType
    l = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(rv_type).alias("__rv"),
        *[F.col(c) for c in left_cols],
    )
    r = r.select(*[F.lit(None).cast(left.schema[c].dataType).alias(c)
                   if c not in r.columns else F.col(c)
                   for c in l.columns])
    both = r.unionByName(l)

    def carry(desc: bool) -> F.Column:
        # ascending scan carries the latest right row at-or-before
        # (backward); descending scan the earliest at-or-after (forward).
        ts_key = F.col("__ts").desc() if desc else F.col("__ts").asc()
        order = [ts_key, F.col("__side")]
        if order_col is not None:
            # tie-break among right rows at equal ts: greatest wins
            order.append(F.col("__rv").getField(order_col))
        w = (
            Window.partitionBy("__key")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last(F.col("__rv"), ignorenulls=True).over(w)

    if direction == "backward":
        carried = both.withColumn("__pick", carry(desc=False))
    elif direction == "forward":
        carried = both.withColumn("__pick", carry(desc=True))
    else:  # nearest
        carried = both.withColumn("__b", carry(desc=False)).withColumn(
            "__f", carry(desc=True)
        )
        d_b = _ts_delta(F.col("__ts"), F.col("__b.__rts"), is_ts)
        d_f = _ts_delta(F.col("__f.__rts"), F.col("__ts"), is_ts)
        carried = carried.withColumn(
            "__pick",
            F.when(F.col("__b").isNull(), F.col("__f"))
            .when(F.col("__f").isNull(), F.col("__b"))
            .when(d_b <= d_f, F.col("__b"))  # equidistant -> backward
            .otherwise(F.col("__f")),
        )
    if tolerance is not None:
        dist = F.abs(_ts_delta(F.col("__ts"), F.col("__pick.__rts"), is_ts))
        carried = carried.withColumn(
            "__pick", F.when(dist <= F.lit(tolerance), F.col("__pick"))
        )
    return carried.filter(F.col("__side") == 1).select(
        *left_cols,
        *[F.col("__pick").getField(c).alias(f"asof_{c}")
          for c in right_values],
    )
