"""q24 bucketed-layout adjudication (r10 verdict #3): co-locate
lineitem and orders on orderkey via the persisted bucketed layout
(operators/bucketing.py) and measure the exchange-free star join
against the shuffled plan.

Records all three numbers the adjudication needs:
  1. layout build cost (the one-time shuffle+sort+write, per table)
  2. q24-over-buckets vs q24-flat per-query time
  3. the crossover: how many q24-class joins amortize the build

NOTE (bench-contract): the driver bench computes every query from the
raw parquet inputs — a pre-built layout would be cross-run
precomputation, so this experiment informs the DEPLOYMENT story (a
real warehouse maintains the layout at ingest) and the BASELINE
ledger, never the bench twin, unless the crossover is <1 (it is not).

Usage: python scripts/exp_q24_bucketed.py <sf_dir> [runs] [buckets]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from adenhq_hive_spark.catalog import register_views  # noqa: E402
from adenhq_hive_spark.operators.bucketing import (  # noqa: E402
    attach_bucketed_table,
    save_bucketed_table,
)
from adenhq_hive_spark.queries import all_queries  # noqa: E402
from adenhq_hive_spark.session import get_spark  # noqa: E402

Q24_OVER = """
    SELECT n.n_name, CAST(YEAR(o.o_orderdate) AS INT) AS yr,
           (CAST(CAST(SUM({q} DIV 1000000) AS DECIMAL(38,0)) * 1000000
                 + SUM({q} % 1000000) AS DOUBLE) / 10000) AS revenue
    FROM {l} l
    JOIN {o} o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name, CAST(YEAR(o.o_orderdate) AS INT)
    ORDER BY n.n_name NULLS LAST, yr NULLS LAST
""".format(
    q=(
        "CAST((l.l_extendedprice * (1 - l.l_discount)) * 10000 + "
        "(CASE WHEN (l.l_extendedprice * (1 - l.l_discount)) < 0 "
        "THEN -0.5 ELSE 0.5 END) AS BIGINT)"
    ),
    l="{l}",
    o="{o}",
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench_sf10"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    spark = get_spark("exp_q24_bucketed")
    register_views(spark, sf_dir)

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    def best_of(df, n):
        noop(df)
        b = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            noop(df)
            b = min(b, time.perf_counter() - t0)
        return b

    base = os.path.join(sf_dir, "_bucketed_q24")
    shutil.rmtree(base, ignore_errors=True)

    li = spark.table("lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    od = spark.table("orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    t0 = time.perf_counter()
    save_bucketed_table(
        spark, li, f"{base}/lineitem_b", "lineitem_b",
        ["l_orderkey"], buckets,
    )
    t_li = time.perf_counter() - t0
    t0 = time.perf_counter()
    save_bucketed_table(
        spark, od, f"{base}/orders_b", "orders_b",
        ["o_orderkey"], buckets,
    )
    t_od = time.perf_counter() - t0
    print(f"layout build: lineitem {t_li:.1f}s, orders {t_od:.1f}s "
          f"({buckets} buckets, sorted)")
    assert attach_bucketed_table(spark, f"{base}/lineitem_b", "lineitem_b")
    assert attach_bucketed_table(spark, f"{base}/orders_b", "orders_b")

    flat = all_queries()["q24"].run(spark, sf_dir)
    over = spark.sql(Q24_OVER.format(l="lineitem_b", o="orders_b"))

    a = [tuple(r) for r in flat.collect()]
    b = [tuple(r) for r in over.collect()]
    assert a == b, "bucketed q24 result mismatch"
    print(f"parity OK: {len(a)} identical rows")

    phys = over._jdf.queryExecution().executedPlan().toString()
    n_exch = sum(
        1 for ln in phys.splitlines()
        if "Exchange hashpartitioning" in ln
        and ("l_orderkey" in ln or "o_orderkey" in ln)
    )
    print(f"orderkey Exchanges in bucketed plan: {n_exch} (want 0)")

    t_flat = best_of(flat, runs)
    t_over = best_of(over, runs)
    print(f"q24 flat:     {t_flat:.3f}s (min of {runs})")
    print(f"q24 bucketed: {t_over:.3f}s (min of {runs})")
    saved = t_flat - t_over
    if saved > 0:
        print(f"crossover: {(t_li + t_od) / saved:.1f} q24-class joins "
              f"amortize the {t_li + t_od:.1f}s build")
    spark.stop()


if __name__ == "__main__":
    main()
