"""Dual-time arbitrary registered queries: Spark (noop sink) vs DuckDB
(fetchall), min of N warm runs — the same protocol as bench.py and
bench_sf1_relational.py.  This is the per-entry 2x-adjudication tool:
every new operator gets a BASELINE.md row produced by this script at
sf0.1 and sf1.

Usage: python scripts/dual_time.py <sf_dir> <name1,name2,...> [runs]
Prints one JSON line {"sf_dir": ..., "engine": {...}, "duckdb": {...}}.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2].split(",")
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    import duckdb

    from adenhq_hive_spark.catalog import TABLES
    from adenhq_hive_spark.queries import all_queries
    from adenhq_hive_spark.session import get_spark

    spark = get_spark("dual-time")
    specs = all_queries()
    unknown = [n for n in names if n not in specs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    for name in names:  # warm-up: JIT, codegen cache, parquet footers
        specs[name].run(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()

    engine: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            specs[name].run(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            best = min(best, time.perf_counter() - t0)
        engine[name] = round(best, 4)
        print(f"engine {name}: {best:.3f}s", file=sys.stderr, flush=True)
    spark.stop()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    duck: dict[str, float] = {}
    for name in names:
        oracle = specs[name].oracle
        if oracle is None:
            continue
        con.execute(oracle).fetchall()  # warm
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            con.execute(oracle).fetchall()
            best = min(best, time.perf_counter() - t0)
        duck[name] = round(best, 4)
        print(f"duckdb {name}: {best:.3f}s", file=sys.stderr, flush=True)

    print(json.dumps({"sf_dir": sf_dir, "engine": engine, "duckdb": duck}))


if __name__ == "__main__":
    main()
