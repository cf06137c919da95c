"""Dump .explain('formatted') of declared queries to files.

Usage: python scripts/dump_plans.py <out_dir> <suffix> q1,q2,... [sf_dir]
Writes <out_dir>/<query>_<suffix>.txt for each query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from adenhq_hive_spark.queries import all_queries  # noqa: E402
from adenhq_hive_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_plans")
    specs = all_queries()
    for name in names:
        df = specs[name].run(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
