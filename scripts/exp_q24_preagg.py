"""q24 pre-aggregation experiment (r10 verdict #3 adjudication, guide
§2.3 "aggregate before you shuffle").

q24 is the residual relational weak entry: a 4-way star join whose
lineitem⋈orders exchange carries one row per LINEITEM (180M at sf30)
when every downstream decision needs only the per-ORDER revenue sum
(~45M rows, ~4x fewer, and narrower). The rewrite pushes the scaled-
BIGINT partial aggregation below the join: group lineitem by
l_orderkey inside the exchange the join already pays, then join the
~4x-smaller per-order table. Output is bit-identical (integer sums are
associative; the hi/lo split distributes over the regrouping).

Usage: python scripts/exp_q24_preagg.py <sf_dir> [runs]
Prints both timings and asserts the collected rows are identical.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from adenhq_hive_spark.catalog import register_views  # noqa: E402
from adenhq_hive_spark.queries import all_queries  # noqa: E402
from adenhq_hive_spark.session import get_spark  # noqa: E402

Q24_PREAGG = """
    SELECT n.n_name, CAST(YEAR(o.o_orderdate) AS INT) AS yr,
           (CAST(CAST(SUM(l.hi) AS DECIMAL(38,0)) * 1000000
                 + SUM(l.lo) AS DOUBLE) / 10000) AS revenue
    FROM (
        SELECT l_orderkey,
               SUM(q DIV 1000000) AS hi,
               SUM(q % 1000000) AS lo
        FROM (
            SELECT l_orderkey,
                   CAST((l_extendedprice * (1 - l_discount)) * 10000 +
                        (CASE WHEN (l_extendedprice * (1 - l_discount)) < 0
                              THEN -0.5 ELSE 0.5 END) AS BIGINT) AS q
            FROM lineitem
        )
        GROUP BY l_orderkey
    ) l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name, CAST(YEAR(o.o_orderdate) AS INT)
    ORDER BY n.n_name NULLS LAST, yr NULLS LAST
"""


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("exp_q24")
    register_views(spark, sf_dir)
    spec = all_queries()["q24"]

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    flat = spec.run(spark, sf_dir)
    pre = spark.sql(Q24_PREAGG)

    # correctness first: identical ordered rows
    a = [tuple(r) for r in flat.collect()]
    b = [tuple(r) for r in pre.collect()]
    assert a == b, f"MISMATCH: {len(a)} vs {len(b)} rows, first diff: " + str(
        next((x, y) for x, y in zip(a, b) if x != y)
    )
    print(f"parity OK: {len(a)} identical rows (exact, ordered)")

    for label, df in (("flat", flat), ("preagg", pre)):
        noop(df)  # warm
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            noop(df)
            best = min(best, time.perf_counter() - t0)
        print(f"q24 {label}: {best:.3f}s (min of {runs})")
    spark.stop()


if __name__ == "__main__":
    main()
