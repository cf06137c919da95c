"""Hot-key regime adjudication (r9 verdict #1): dual-time the skew
operators against their plain-plan twins ON SKEWED DATA — the dataset
scripts/make_skew.py builds (one event_type at ~50% mass, zipf tail),
which the uniform testdata cannot exhibit.

Three head-to-heads, each min-of-N with every variant producing the
SAME rows (parity asserted in-run before anything is timed as done):

1. Per-key top-k under a hot key: plain single window
   ROW_NUMBER() OVER (PARTITION BY event_type ...) — the hot key's 5M
   rows sort inside ONE task — vs operators/skew.salted_topk (two-phase,
   max task ~ hot/salts).
2. Fact-dim join on the skewed key with the dim NOT broadcastable
   (autoBroadcastJoinThreshold=-1 models a dimension too wide to ship):
   plain shuffle join with AQE skew splitting OFF, the same with AQE ON
   (Spark's own answer), and operators/skew.salted_join (ours, for
   engines/plans AQE cannot reach). Consumed by a category rollup so
   the join output (10M rows) never hits the driver.
3. skew_report on the fact — the diagnosis step's own cost.

Usage: PYTHONPATH=/root/repo python scripts/bench_skew.py \
           [skew_dir] [runs] [salts]
Prints one JSON line per measurement plus a summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

from adenhq_hive_spark.operators.skew import (
    salted_join,
    salted_topk,
    skew_report,
)
from adenhq_hive_spark.session import get_spark


def timed(fn, runs: int) -> tuple[float, list[float]]:
    ts = []
    for _ in range(runs):
        t0 = time.time()
        fn()
        ts.append(round(time.time() - t0, 3))
    return min(ts), ts


def main() -> None:
    skew_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench_skew"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    salts = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    if not os.path.exists(f"{skew_dir}/events_skew.parquet"):
        raise SystemExit(f"run scripts/make_skew.py first ({skew_dir})")

    spark = get_spark("bench-skew")
    events = spark.read.parquet(f"{skew_dir}/events_skew.parquet")
    dim = spark.read.parquet(f"{skew_dir}/type_dim.parquet")
    n = events.count()
    out: dict[str, object] = {"rows": n, "salts": salts, "runs": runs}

    print(json.dumps({"skew_report_top3": [
        r.asDict() for r in skew_report(events, "event_type", top=3).collect()
    ]}, default=str))

    # ---- 1. per-key top-k ------------------------------------------------
    k = 3
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id").asc_nulls_last()
    )

    def plain_topk():
        return (
            events.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("event_type", "event_id", "rank")
            .collect()
        )

    def fast_topk():
        return (
            salted_topk(events, "event_type", "value", "event_id",
                        k=k, salts=salts)
            .select("event_type", "event_id", "rank")
            .collect()
        )

    assert sorted(map(tuple, plain_topk())) == sorted(map(tuple, fast_topk())), \
        "salted_topk parity violated on skewed data"
    out["topk_plain_s"], out["topk_plain_all"] = timed(plain_topk, runs)
    out["topk_salted_s"], out["topk_salted_all"] = timed(fast_topk, runs)

    # Spark 4's WindowGroupLimit rule ALREADY two-phases rank-limit
    # windows (a map-side per-group limit before the exchange), so the
    # default plain plan never serializes on the hot key.  Time the
    # rewrite-disabled plan too — that is the regime salted_topk was
    # built for (and the regime on engines/window shapes without the
    # rule); the gap between the three is the adjudication.
    wgl = "spark.sql.optimizer.windowGroupLimitThreshold"
    prev_wgl = spark.conf.get(wgl)
    spark.conf.set(wgl, "-1")
    try:
        assert sorted(map(tuple, plain_topk())) == sorted(
            map(tuple, fast_topk())), "parity violated w/o rewrite"
        out["topk_norewrite_s"], out["topk_norewrite_all"] = timed(
            plain_topk, runs)
        out["topk_salted_norewrite_s"], out["topk_salted_norewrite_all"] = \
            timed(fast_topk, runs)
    finally:
        spark.conf.set(wgl, prev_wgl)

    # ---- 2. fact-dim join, dim not broadcastable -------------------------
    prev_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def consume(joined):
        # value quantized to integer thousandths before the sum: a
        # double SUM is order-dependent across plans (at 40M rows the
        # accumulated fp error exceeds any printable rounding), and the
        # parity assert needs bit-equality
        return sorted(
            (r["category"], r["n"], r["sv"])
            for r in joined.groupBy("category").agg(
                F.count("*").alias("n"),
                F.sum(
                    (F.col("value") * 1000).cast("long")
                ).alias("sv"),
            ).collect()
        )

    def join_plain():
        return consume(events.join(dim, "event_type"))

    def join_salted():
        return consume(salted_join(events, dim, "event_type", salt=salts))

    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        base = join_plain()
        assert base == join_salted(), "salted_join parity violated"
        out["join_plain_aqeoff_s"], out["join_plain_aqeoff_all"] = timed(
            join_plain, runs)
        out["join_salted_aqeoff_s"], out["join_salted_aqeoff_all"] = timed(
            join_salted, runs)
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        assert base == join_plain(), "AQE changed join results"
        out["join_plain_aqeon_s"], out["join_plain_aqeon_all"] = timed(
            join_plain, runs)
        out["join_salted_aqeon_s"], out["join_salted_aqeon_all"] = timed(
            join_salted, runs)
        # AQE's skew detection is BYTE-based (partition > factor x
        # median AND > thresholdInBytes): a dictionary-compressible
        # hot key ships few bytes per row, so 20M rows of a constant
        # string hide under the 256m default while their JOIN cost is
        # row-proportional.  Tuned thresholds make AQE split (and the
        # split beats salting — it replicates only the dim's matching
        # partition instead of exploding the dim salt-ways globally).
        knobs = {
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
                "32m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
            "spark.sql.join.preferSortMergeJoin": "true",
        }
        prev_knobs = {k: spark.conf.get(k, None) for k in knobs}
        try:
            for k, v in knobs.items():
                spark.conf.set(k, v)
            assert base == join_plain(), "tuned AQE changed join results"
            out["join_plain_aqetuned_s"], out["join_plain_aqetuned_all"] = \
                timed(join_plain, runs)
        finally:
            for k, v in prev_knobs.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bcast)
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)

    # ---- 3. the diagnosis step's own cost --------------------------------
    out["skew_report_s"], _ = timed(
        lambda: skew_report(events, "event_type").collect(), runs)

    out["topk_speedup"] = round(out["topk_plain_s"] / out["topk_salted_s"], 2)
    if "topk_norewrite_s" in out:
        out["topk_salted_vs_norewrite"] = round(
            out["topk_norewrite_s"] / out["topk_salted_norewrite_s"], 2)
    out["join_salted_vs_aqeoff"] = round(
        out["join_plain_aqeoff_s"] / out["join_salted_aqeoff_s"], 2)
    out["join_aqe_vs_aqeoff"] = round(
        out["join_plain_aqeoff_s"] / out["join_plain_aqeon_s"], 2)
    if "join_plain_aqetuned_s" in out:
        out["join_aqetuned_vs_aqeoff"] = round(
            out["join_plain_aqeoff_s"] / out["join_plain_aqetuned_s"], 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
