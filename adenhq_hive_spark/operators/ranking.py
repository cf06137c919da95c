"""Distributed exact ranking — ROW_NUMBER without the single-partition
global window.

``Window.orderBy(keys)`` with no PARTITION BY serializes the whole input
through one task (Spark logs ``WindowExec: No Partition Defined``) — a
non-starter at 100 TB. The classic scalable replacement is the same shape
Spark's own sort uses: range-partition on the keys (so partition index
order IS key order), rank locally inside each partition, then add the
prefix-sum of partition row counts as an offset.

The offsets come from a triangular join over the per-(partition, group)
count relation (P·|groups| rows, metadata-sized), never from a
driver-side collect.

CORRECTNESS CAVEAT, learned the hard way (r8 second session): the
range-partitioned relation MUST be materialized once before branching.
repartitionByRange samples its boundaries per physical exchange, and
when Catalyst does NOT reuse the exchange between the counts branch and
the window branch (observed on a join-shaped consumer at sf0.1 — 96% of
ranks wrong, nondeterministic across runs), the two branches see
DIFFERENT partitionings and the offsets no longer describe the windowed
partitions.  ``_materialize`` (persist, or reliable checkpoint when a
checkpoint dir is configured) pins one boundary draw for every reader;
lost blocks re-read the already-written shuffle files, so recompute
cannot re-sample.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_rank(
    df: DataFrame,
    order_cols: Sequence[str],
    part_cols: Sequence[str] = (),
    rank_col: str = "rank",
    num_partitions: int | None = None,
    return_totals: bool = False,
):
    """Exact ``ROW_NUMBER() OVER (PARTITION BY part_cols ORDER BY
    order_cols)`` computed distributed: range-partition on
    (part_cols, order_cols), rank locally per physical partition, add
    prefix-sum offsets joined back by broadcast.

    ``order_cols`` must be a total order within each group (include a
    unique tiebreak column) — otherwise ties at range-partition
    boundaries make the rank partition-assignment-dependent.

    Cost: one range shuffle (reused by the counts branch via
    ReuseExchange), one balanced per-partition window, one broadcast
    join against the P·|groups|-row offset relation. No stage ever
    holds more than one partition's rows in a single task.

    Returns the input columns plus ``rank_col`` (1-based bigint); with
    ``return_totals=True`` also returns ``{group_tuple: n_rows}``
    (this variant does run one small aggregation job for the totals —
    prefer a lazy broadcast of the total as a COLUMN when the consumer
    is another Spark expression, as curriculum_order does).
    """
    from .dedup import _materialize

    spark = df.sparkSession
    part_cols = list(part_cols)
    order_cols = list(order_cols)
    keys = part_cols + order_cols
    P = num_partitions or max(spark.sparkContext.defaultParallelism, 1)
    # materialized ONCE: both the counts branch and the window branch
    # must see the SAME sampled range boundaries (module docstring)
    parted = _materialize(
        df.repartitionByRange(P, *keys).withColumn(
            "_pid", F.spark_partition_id()
        )
    )
    counts = parted.groupBy("_pid", *part_cols).agg(
        F.count("*").alias("_cnt")
    )
    # offsets: exclusive prefix sum of counts in pid order, computed as
    # a triangular self-join over the counts relation (P·|groups| rows
    # of metadata — at most a few thousand pairs). A window would be
    # terser, but a global-ordered window here would either log the
    # "No Partition Defined" warning or need a constant partition key
    # that constant-folding erases; the join form is warning-free and
    # equally lazy.
    lo = counts.select(
        F.col("_pid").alias("_lo_pid"),
        *[F.col(c).alias(f"_lo_{c}") for c in part_cols],
        F.col("_cnt").alias("_lo_cnt"),
    )
    join_cond = F.col("_lo_pid") < F.col("_pid")
    for c in part_cols:
        join_cond = join_cond & (F.col(f"_lo_{c}").eqNullSafe(F.col(c)))
    offsets = (
        counts.join(F.broadcast(lo), join_cond, "left")
        .groupBy("_pid", *part_cols)
        .agg(F.coalesce(F.sum("_lo_cnt"), F.lit(0)).alias("_off"))
    )
    local_w = Window.partitionBy("_pid", *part_cols).orderBy(*order_cols)
    ranked = (
        parted.withColumn("_lr", F.row_number().over(local_w))
        .join(F.broadcast(offsets), ["_pid", *part_cols])
        .withColumn(rank_col, (F.col("_off") + F.col("_lr")).cast("long"))
        .drop("_pid", "_lr", "_off")
    )
    if return_totals:
        rows = counts.groupBy(*part_cols).agg(
            F.sum("_cnt").alias("_n")
        ).collect()
        totals = {
            tuple(r[c] for c in part_cols): r["_n"] for r in rows
        }
        return ranked, totals
    return ranked


def ntile_expr(rank_col: str, n, k: int) -> str:
    """SQL expression assigning ANSI NTILE(k) buckets from a 1-based
    total-order rank over ``n`` rows — the map-only companion to
    :func:`exact_rank` (first ``n % k`` buckets get ``n//k + 1`` rows,
    the rest ``n//k``; exact integer arithmetic, engine-portable).

    ``n`` may be an int literal or the NAME of a bigint column holding
    the total (e.g. a broadcast single-row count joined in), so the
    whole assignment can stay lazy inside one plan.
    """
    n_sql = str(int(n)) if not isinstance(n, str) else n
    k = int(k)
    q = f"({n_sql} DIV {k})"
    rem = f"({n_sql} % {k})"
    cut = f"({rem} * ({q} + 1))"
    # ELSE branch is unreachable when q == 0 (cut == n), but keep the
    # denominator nonzero so ANSI mode can't trip on it
    return (
        f"CAST(CASE WHEN {rank_col} <= {cut} "
        f"THEN ({rank_col} - 1) DIV ({q} + 1) + 1 "
        f"ELSE {rem} + ({rank_col} - {cut} - 1) DIV greatest({q}, 1) + 1 "
        f"END AS INT)"
    )
