"""Volume-anomaly detection over event streams — the data-quality
sentinel a 100 TB ingest pipeline runs before training data is trusted
(a day of duplicated or dropped events shows up as a count spike/crater
long before any content-level check fires).

Public-knowledge formulation: the classic z-score outlier test, made
ENGINE-PORTABLE by never computing a floating z at all. |z| >= k over a
group's daily counts is equivalent to the exact integer inequality

    (n*x - S1)^2 * (n - 1) >= k^2 * n * (n*S2 - S1^2)

where S1 = sum(x), S2 = sum(x^2) over the group's n days: var_samp =
(n*S2 - S1^2) / (n*(n-1)) and z^2 = (x - S1/n)^2 / var, cleared of
denominators. Both sides are BIGINT products of integer day-counts, so
Spark and any SQL oracle agree bit-for-bit — there is no stddev/sqrt
double whose last-ulp could flip a flag. Exact while daily counts stay
below ~1e6 per key (BIGINT headroom for the squared terms at n ~ 1e4
days); beyond that cast the sums to DECIMAL(38,0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import frac4


def daily_count_anomalies(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    k: int = 3,
) -> DataFrame:
    """Per-key daily event counts flagged where the count sits >= ``k``
    sample standard deviations from the key's own mean — in exact
    integer arithmetic (module docstring).

    Shape: one grouped aggregation to (key, day, count) — map-side
    partial, the only shuffle of the raw data — then two window
    aggregates over the tiny (key, day) table sharing one partitioning
    by key. Keys are few (event types), days are bounded: the window
    input is kilobytes even at petabyte event volume.

    Output: (key_col, day, n_events, n_days, mean_events, is_anomaly),
    ordered. ``mean_events`` is round(S1/n, 4) via exact integer
    division; groups with a single day or zero variance are never
    flagged (var == 0 => only a count differing from the constant mean
    could flag, but then var wouldn't be 0 — vacuous, kept explicit).
    """
    daily = (
        df.select(F.col(key_col).alias("key"), F.to_date(ts_col).alias("day"))
        .groupBy("key", "day")
        .agg(F.count("*").alias("n_events"))
    )
    w = Window.partitionBy("key")
    x = F.col("n_events")
    n, s1, s2 = F.count("*").over(w), F.sum(x).over(w), F.sum(x * x).over(w)
    dev = n * x - s1                 # n * (x - mean), integer
    varnum = n * s2 - s1 * s1        # n^2 * var_pop = n*(n-1) * var_samp
    return (
        daily.select(
            F.col("key").alias(key_col),
            "day",
            "n_events",
            n.alias("n_days"),
            frac4(s1, n).alias("mean_events"),
            (
                (n > 1)
                & (varnum > 0)
                & (dev * dev * (n - 1) >= F.lit(k * k) * n * varnum)
            ).alias("is_anomaly"),
        )
        .orderBy(key_col, "day")
    )
