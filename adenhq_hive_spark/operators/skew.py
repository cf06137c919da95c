"""Skew-mitigation helpers for hot-key joins and partitioned layouts.

MEASURED adjudication (BASELINE.md "Round 10: the hot-key regime",
scripts/make_skew.py + bench_skew.py, one key at 50% of 10M/40M rows):

- AQE's skew split is BYTE-gated on compressed shuffle sizes, so a
  dictionary-compressible hot key whose join cost is row-proportional
  hides under the 256m default threshold (AQE gave only 1.06-1.14x).
  Tuned to the data (factor=2, threshold=32m, advisory=16m) AQE splits
  and wins outright (3.4x at 40M) — better than :func:`salted_join`
  (1.4-1.8x), because the split replicates only the dim's matching
  partition where salting explodes the dim salt-ways.  Order of
  attack on a skewed join: broadcast if the dim fits; else tune the
  AQE skew thresholds to row-cost; salt only what AQE cannot see
  (foreachBatch micro-batch joins, non-AQE engines).
- Spark 4's WindowGroupLimit rule already two-phases rank-limit
  windows map-side, so :func:`salted_topk` matches (does not beat)
  the default plan; its regime is window shapes the rule cannot
  rewrite — with the rule off, plain serializes (67 s at a 20M-row
  hot key, linear) while salted stays flat at 3.3-3.8x ahead.

These helpers cover what the optimizer cannot; the layout helpers
(date-partitioned writes, compaction plans) cover SURVEY §7's
partition-pruning risk register.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join with the left (skewed) side salted.

    The left side gets a deterministic salt in [0, salt) (hash of the
    full row via monotonically-increasing spread would be nondeterministic
    — use a hash of all columns); the right side is exploded ``salt``
    ways so every (key, salt) bucket finds its match. One hot key now
    spreads over ``salt`` reducers. Output columns = a plain join's.

    Measured on the 50%-hot-key corpus (BASELINE.md r10): 1.4-1.8x
    over the plain shuffle join with no config dependence — but AQE
    with skew thresholds tuned to row-cost beats both (3.4x), so on
    stock Spark prefer tuning AQE and salt only joins AQE cannot see
    (inside foreachBatch, non-adaptive plans).

    Correctness is layout-independent: tests assert equality with the
    unsalted join.

    Only left-preserving join types are supported: the right side is
    replicated ``salt`` ways, so right/full-outer would emit each
    unmatched right row once per salt replica.
    """
    allowed = {"inner", "left", "leftouter", "left_outer",
               "semi", "leftsemi", "left_semi",
               "anti", "leftanti", "left_anti", "cross"}
    if how.lower().replace(" ", "") not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: the right side is "
            f"exploded {salt}x, which would duplicate unmatched right rows "
            "under right/full outer joins. Use inner/left/semi/anti."
        )
    salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    l_salted = left.withColumn("__salt", salt_col.cast("int"))
    r_exploded = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    joined = l_salted.join(r_exploded, on=[on, "__salt"], how=how)
    return joined.drop("__salt")


def write_date_partitioned(
    df: DataFrame, path: str, ts_col: str = "ts", mode: str = "overwrite"
) -> None:
    """Write with a ``dt=YYYY-MM-DD`` partition column so future scans
    with date predicates partition-prune instead of reading everything
    (PartitionFilters in the scan node, not a post-filter)."""
    (
        df.withColumn("dt", F.date_format(F.col(ts_col), "yyyy-MM-dd"))
        .write.mode(mode)
        .partitionBy("dt")
        .parquet(path)
    )


def skew_report(
    df: DataFrame,
    key_col: str,
    top: int = 20,
    target_rows_per_task: int = 1_000_000,
) -> DataFrame:
    """Join/agg-key skew diagnosis: the ``top`` heaviest keys with their
    row counts, share of the table, and the salt factor
    :func:`salted_join` would need to spread each hot key across tasks
    of ~``target_rows_per_task`` rows — the measurement step BEFORE
    choosing between AQE skew handling, salting, or a broadcast.

    One grouped count (map-side partial) + a top-k over the key-count
    table (TakeOrderedAndProject-sized, never a full sort of the data).
    ``pct_of_total`` uses exact integer half-up division
    (``round(n*10000/total)/100``), so the report hash-matches any SQL
    oracle bit-for-bit.

    Output: (key (as string), n_rows, pct_of_total, salt_factor),
    heaviest first, ties by key.
    """
    counts = df.groupBy(
        F.col(key_col).cast("string").alias("key")
    ).agg(F.count("*").alias("n_rows"))
    # total from the counts table itself (one scalar agg over the tiny
    # key-count relation, broadcast back) — a df.count() here would
    # execute the whole input lineage a second time
    totals = counts.agg(F.sum("n_rows").alias("_total"))
    n, t = F.col("n_rows"), F.col("_total")
    x = n * 20000 + t
    pct = (((x - x % (2 * t)) / (2 * t)) / 100).cast("double")
    salt = F.floor(
        (n + target_rows_per_task - 1) / F.lit(target_rows_per_task)
    ).cast("int")
    return (
        counts.join(F.broadcast(totals))
        .select(
            "key",
            "n_rows",
            pct.alias("pct_of_total"),
            salt.alias("salt_factor"),
        )
        .orderBy(F.col("n_rows").desc(), "key")
        .limit(top)
    )


def compaction_plan(
    spark,
    path: str,
    target_mb: int = 128,
    suffix: str = ".parquet",
) -> DataFrame:
    """Small-file compaction plan for a (possibly partitioned) parquet
    directory: bin-packs each partition directory's data files into
    groups of ~``target_mb`` so a rewrite job can coalesce them — the
    remedy for the many-small-files failure mode that kills scan
    throughput at scale (every file is a task + a footer read).

    Deterministic: files are first-fit packed in name order, so the
    same directory always yields the same plan (re-runs are idempotent
    and the plan itself is diffable). Listing walks the driver-local
    filesystem — at cluster scale, swap the walker for a FileSystem
    listing; the packing logic is the part that matters and is pure.

    Returns (partition, group_id, n_files, total_bytes, files),
    ordered; single-file groups already at/above target are flagged by
    n_files = 1 (nothing to do). Only data files matching ``suffix``
    count; _SUCCESS/checksum droppings are ignored.
    """
    import os

    target = target_mb * 1024 * 1024
    by_part: dict[str, list[tuple[str, int]]] = {}
    for root, _dirs, files in os.walk(path):
        rel = os.path.relpath(root, path)
        for f in sorted(files):
            if not f.endswith(suffix):
                continue
            full = os.path.join(root, f)
            by_part.setdefault("" if rel == "." else rel, []).append(
                (f, os.path.getsize(full))
            )
    rows = []
    for part in sorted(by_part):
        group, size, gid = [], 0, 0
        for name, nbytes in by_part[part]:
            if group and size + nbytes > target:
                rows.append((part, gid, len(group), size, group))
                group, size, gid = [], 0, gid + 1
            group.append(name)
            size += nbytes
        if group:
            rows.append((part, gid, len(group), size, group))
    return spark.createDataFrame(
        rows,
        "partition string, group_id int, n_files int, total_bytes long, "
        "files array<string>",
    ).orderBy("partition", "group_id")


def salted_topk(
    df: DataFrame,
    part_col: str,
    order_col: str,
    tiebreak_col: str,
    k: int = 3,
    salts: int = 16,
) -> DataFrame:
    """Top-k rows per key under KEY SKEW: two-phase window instead of
    one.  ``ROW_NUMBER() OVER (PARTITION BY key ORDER BY ...)`` sorts
    each key inside ONE task — a hot key (half the corpus in one
    event_type) serializes there.  Phase 1 partitions by (key, salt)
    — salt = pmod(xxhash64(tiebreak), salts), deterministic per ROW —
    and keeps each bucket's local top-k; phase 2 re-ranks the
    surviving <= k*salts rows per key.  No task ever sorts more than
    max(hot_key_rows/salts, k*salts) rows.

    SCOPE (measured, BASELINE.md r10): Spark 4's WindowGroupLimit rule
    already inserts a map-side per-group limit for rank-limit filters,
    so on stock Spark this operator only MATCHES the plain plan (~20%
    overhead).  Its regime is rank-limit shapes the rule cannot
    rewrite and engines without the rule, where the plain window
    serializes on the hot key (measured 67 s vs 17.6 s at a 20M-row
    hot key with the rule disabled).

    EXACT by containment: every global top-k row is inside its own
    salt bucket's top-k (same total order), so phase 2 sees all of
    them; ``(order_col DESC, tiebreak_col ASC)`` must be a total order
    — tiebreak_col must be UNIQUE and NON-NULL (the exact_rank
    contract; xxhash64 of a NULL tiebreak would also fold every NULL
    row into one salt bucket).  Defensively, NULLS sort LAST on the
    tiebreak in BOTH phases so a contract violation still orders the
    same way as the DuckDB oracle's ASC default (NULLS LAST) in
    pl_salted_topk.  Parity with the direct single-window plan is
    pinned in tests/test_skew.py.

    Emits the input columns plus ``rank`` (1..k per key).
    """
    if k < 1 or salts < 1:
        raise ValueError("k and salts must be >= 1")
    from pyspark.sql import Window

    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(tiebreak_col)), F.lit(salts))
    )
    w1 = Window.partitionBy(part_col, "_salt").orderBy(
        F.col(order_col).desc(), F.col(tiebreak_col).asc_nulls_last()
    )
    survivors = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .drop("_r1", "_salt")
    )
    w2 = Window.partitionBy(part_col).orderBy(
        F.col(order_col).desc(), F.col(tiebreak_col).asc_nulls_last()
    )
    return (
        survivors.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
    )
