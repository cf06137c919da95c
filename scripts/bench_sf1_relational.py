"""Relational-set re-measurement at sf1 (.bench_sf1, 10x replication).

Times every relational headline query on both engines (Spark noop sink
vs DuckDB fetchall, min of N warm runs — same protocol as bench.py) plus
selected linear pipeline ops. The quadratic DuckDB tiers
(ngram/dedup_incremental) are excluded here: their DuckDB runtimes at
sf1 are hours, and BASELINE.md already carries their measured spot
checks. Prints one JSON line.

Usage: python scripts/bench_sf1_relational.py [sf_dir] [runs]
"""

from __future__ import annotations

import json
import sys
import time

NAMES = [
    "q01", "q02", "q06", "q09", "q13", "q17", "q24", "q25", "q33",
    "q36", "q43", "q53", "q57", "q58", "q59", "q60",
    "pl_quality", "pl_sliding_window", "pl_cosine_topk",
    "pl_tfidf", "pl_repetition", "pl_hash_split", "pl_decontaminate",
    "pl_curation_pipeline",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench_sf1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    import duckdb

    from adenhq_hive_spark.catalog import TABLES
    from adenhq_hive_spark.queries import all_queries
    from adenhq_hive_spark.session import get_spark

    spark = get_spark("bench-sf1")
    specs = all_queries()
    names = [n for n in NAMES if n in specs]

    for name in names:  # warm-up: JIT, codegen cache, parquet footers
        specs[name].run(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        print(f"warmup {name}", file=sys.stderr, flush=True)

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
