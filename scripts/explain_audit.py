"""Dump the final physical plans of the headline queries to stdout (or a
file) for plan review — the artifact behind BASELINE.md's plan-audit
claims.

Usage: python scripts/explain_audit.py [sf_dir] > PLANS.txt
"""

from __future__ import annotations

import sys

from bench import HEADLINE

from adenhq_hive_spark.queries import all_queries
from adenhq_hive_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("explain-audit")
    specs = all_queries()
    for name in HEADLINE:
        if name not in specs:
            continue
        df = specs[name].run(spark, sf_dir)
        df.collect()  # AQE finalizes plans only on execution
        print(f"\n{'=' * 72}\n{name}: {specs[name].doc.splitlines()[0]}\n{'=' * 72}")
        print(df._jdf.queryExecution().executedPlan().toString())
    spark.stop()


if __name__ == "__main__":
    main()
