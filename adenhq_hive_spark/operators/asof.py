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

Semantics: for each left row, the right row with the greatest
``right_ts <= left_ts`` (direction='backward'); ties on right_ts resolve
to the greatest ``order_col``.  Matches Q33's ORDER BY ts DESC,
event_id DESC exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_values: list[str] | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Backward as-of join: latest right row at or before each left row.

    Returns the left rows plus ``asof_<col>`` for each of ``right_values``
    (NULL when no right row precedes the left row).
    """
    if right_values is None:
        right_values = [c for c in right.columns if c not in (on, right_ts)]

    left_cols = left.columns
    # side marker: right rows sort before left rows at equal ts, so a
    # right row with right_ts == left_ts is visible to that left row
    # (the <= in Q33).
    #
    # All right values travel in ONE struct and a single
    # last(ignoreNulls) carries that struct: every asof_* column comes
    # from the same (most recent) right row, and a NULL attribute on
    # that row stays NULL instead of being back-filled from an older row.
    r = right.select(
        F.col(on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in right_values]).alias("__rv"),
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

    order = [F.col("__ts"), F.col("__side")]
    if order_col is not None:
        # tie-break among right rows at equal ts: greatest order_col wins
        order.append(F.col("__rv").getField(order_col))
    w = (
        Window.partitionBy("__key")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l).withColumn(
        "__rv_asof", F.last(F.col("__rv"), ignorenulls=True).over(w)
    )
    return carried.filter(F.col("__side") == 1).select(
        *left_cols,
        *[F.col("__rv_asof").getField(c).alias(f"asof_{c}")
          for c in right_values],
    )
