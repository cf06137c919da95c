"""q17 / q57 floor-ledger experiments (r6 verdict #7, the q09/q60
pattern from BASELINE.md Round 6): measure alternative plan forms for
the two worst remaining relational floor multiples, adopt what wins
safely or name the constant.

q17 (exact median per mktsegment, 13.2x at sf1): the registered form is
one PERCENTILE agg — an ObjectHashAggregate that buffers values per
group. Alternatives:
  a. window rank-median: full sort within 5 segment partitions, pick
     the middle row(s) — trades the object agg for a sort exchange.
  b. frequency-weighted percentile: pre-aggregate (segment, acctbal)
     counts, then PERCENTILE(value, 0.5, cnt) over the distinct-value
     rollup — wins only when the value domain has heavy duplication.
  c. approx_percentile — NOT a candidate (exactness contract); timed
     only to show what the exactness costs.

q57 (hourly tumbling counts over events, 10.2x at sf1): suspects are
the ns->us per-row conversion feeding date_trunc, the DECIMAL(18,4)
sum, and plain scheduling floor. Variants isolate each:
  a. group by the raw long hour bucket (ts_ns div 3_600_000_000_000) —
     no timestamp conversion at all.
  b. registered grouping but SUM(double) instead of the decimal cast.

Usage: python scripts/exp_q17_q57.py [sf_dir] [runs]
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench_sf1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from adenhq_hive_spark.catalog import register_views
    from adenhq_hive_spark.queries import all_queries
    from adenhq_hive_spark.session import get_spark

    spark = get_spark("exp-q17-q57")
    register_views(spark, sf_dir)
    specs = all_queries()

    forms: dict[str, object] = {
        "q17_registered": specs["q17"],
        "q17_window_rank": """
            WITH r AS (
              SELECT c_mktsegment, c_acctbal,
                     ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                        ORDER BY c_acctbal) AS rn,
                     COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
              FROM customer)
            SELECT c_mktsegment, ROUND(AVG(c_acctbal), 4) AS med
            FROM r
            WHERE rn IN ((n + 1) DIV 2, (n + 2) DIV 2)
            GROUP BY c_mktsegment
            ORDER BY c_mktsegment NULLS LAST
        """,
        "q17_freq_percentile": """
            SELECT c_mktsegment,
                   ROUND(PERCENTILE(c_acctbal, 0.5, cnt), 4) AS med
            FROM (SELECT c_mktsegment, c_acctbal,
                         CAST(COUNT(*) AS INT) AS cnt
                  FROM customer GROUP BY c_mktsegment, c_acctbal)
            GROUP BY c_mktsegment
            ORDER BY c_mktsegment NULLS LAST
        """,
        "q17_approx_for_reference": """
            SELECT c_mktsegment,
                   ROUND(APPROX_PERCENTILE(c_acctbal, 0.5), 4) AS med
            FROM customer
            GROUP BY c_mktsegment
            ORDER BY c_mktsegment NULLS LAST
        """,
        "q57_registered": specs["q57"],
        "q57_double_sum": """
            SELECT CAST(date_trunc('HOUR', ts) AS TIMESTAMP) AS hour,
                   event_type, COUNT(*) AS n,
                   ROUND(SUM(value), 4) AS total
            FROM events
            GROUP BY 1, 2
            ORDER BY hour NULLS LAST, event_type NULLS LAST
            LIMIT 500
        """,
    }

    # raw-long grouping needs the unconverted ns column: read the file
    # directly, bypassing the catalog's ns->us conversion.
    from adenhq_hive_spark.catalog import EVENTS_SCHEMA_NS, events_ts_unit
    import os

    ev_path = os.path.join(sf_dir, "events.parquet")
    if events_ts_unit(ev_path) == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.schema(EVENTS_SCHEMA_NS).parquet(ev_path) \
            .createOrReplaceTempView("events_raw_ns")
        forms["q57_raw_long_bucket"] = """
            SELECT ts DIV 3600000000000 AS hour_bucket, event_type,
                   COUNT(*) AS n,
                   ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4)))
                         AS DOUBLE), 4) AS total
            FROM events_raw_ns
            GROUP BY 1, 2
            ORDER BY hour_bucket NULLS LAST, event_type NULLS LAST
            LIMIT 500
        """

    def run_form(f) -> None:
        df = f.run(spark, sf_dir) if hasattr(f, "run") else spark.sql(f)
        df.write.mode("overwrite").format("noop").save()

    out: dict[str, float] = {}
    for name, f in forms.items():
        run_form(f)  # warm
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            run_form(f)
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 4)
        print(f"{name}: {best:.3f}s", file=sys.stderr, flush=True)

    # value-parity spot check for the exact q17 alternatives
    reg = sorted(map(tuple, specs["q17"].run(spark, sf_dir).collect()))
    for alt in ("q17_window_rank", "q17_freq_percentile"):
        got = sorted(map(tuple, spark.sql(forms[alt]).collect()))
        assert got == reg, f"{alt} diverges from registered q17"
    print(json.dumps({"sf_dir": sf_dir, "times": out}))
    spark.stop()


if __name__ == "__main__":
    main()
