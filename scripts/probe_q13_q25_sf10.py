"""Round-8 task: spot-close the q13/q25 sf10 floors the q09/q60 way —
measure an alternative plan for each, keep the registered plan if the
alternative loses, and ledger the result in BASELINE.md.

q13 (CUBE over lineitem): the CUBE expands the input x4 before the
aggregate.  Alternative: aggregate ONCE at the finest grain
(returnflag, linestatus — tiny), then roll the three coarser sets up
from that metadata-sized relation — the classic partial-reaggregation
rewrite a warehouse applies when the base grouping is low-cardinality.

q25 (6-way snowflake): the registered plan is STATICALLY hinted
(broadcast every dim + shuffle-hash lineitem, relational.py:474); the
q24 sf10 experiment found AQE's free choice beats static hints on the
4-way star, so the audit here is the reverse direction — strip the
hints and let AQE re-plan the 6-way at 60M rows.

Usage: PYTHONPATH=/root/repo python scripts/probe_q13_q25_sf10.py [sf_dir]
Prints min-of-2 warm timings per variant; parity-asserts each variant
against the registered result first.
"""

from __future__ import annotations

import sys
import time


def _time(spark, df, runs=2):
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench_sf10"

    from adenhq_hive_spark.catalog import register_views
    from adenhq_hive_spark.queries import all_queries
    from adenhq_hive_spark.session import get_spark

    spark = get_spark("probe-q13-q25")
    register_views(spark, sf_dir)
    specs = all_queries()

    # ---- q13: CUBE vs two-level reaggregation ----
    q13 = specs["q13"].run(spark, sf_dir)
    base_rows = sorted(tuple(r) for r in q13.collect())

    two_level = spark.sql("""
        WITH fine AS (
          SELECT l_returnflag, l_linestatus,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                   AS s
          FROM lineitem
          GROUP BY l_returnflag, l_linestatus
        )
        SELECT COALESCE(l_returnflag, 'ALL') AS flag,
               COALESCE(l_linestatus, 'ALL') AS status,
               CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS INT) AS g_status,
               CAST(SUM(s) AS DOUBLE) AS sum_qty
        FROM fine
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY g_flag NULLS LAST, g_status NULLS LAST,
                 flag NULLS LAST, status NULLS LAST
    """)
    alt_rows = sorted(tuple(r) for r in two_level.collect())
    # parity within rounding: decimal-exact fine sums reaggregate
    # exactly, so values must match bit-for-bit
    assert alt_rows == base_rows, "q13 two-level rewrite diverges"
    t_reg = _time(spark, specs["q13"].run(spark, sf_dir))
    t_alt = _time(spark, two_level)
    print(f"q13 registered CUBE: {t_reg:.3f}s | two-level reagg: "
          f"{t_alt:.3f}s", flush=True)

    # ---- q25: registered static hints vs AQE free choice ----
    # (r9: q25 became a scale-mode builder; the two SQL forms now come
    # from q25_engine_sql rather than slicing the spec's engine_sql)
    from adenhq_hive_spark.queries.relational import q25_engine_sql

    q25 = specs["q25"].run(spark, sf_dir)
    reg_rows = sorted(tuple(r) for r in q25.collect())
    hinted = spark.sql(q25_engine_sql(hints=True))
    unhinted = spark.sql(q25_engine_sql(hints=False))
    assert sorted(tuple(r) for r in unhinted.collect()) == reg_rows
    t_reg25 = _time(spark, hinted)
    t_free = _time(spark, unhinted)
    print(f"q25 static hints: {t_reg25:.3f}s | AQE free "
          f"choice (hints stripped): {t_free:.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
