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

    failed: dict[str, str] = {}

    for name in names:  # warm-up: JIT, codegen cache, parquet footers
        try:
            specs[name].run(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
        except Exception as e:  # noqa: BLE001 — record, keep sweeping
            failed[name] = str(e)[:200]
        print(f"warmup {name}", file=sys.stderr, flush=True)

    engine: dict[str, float] = {}
    for name in names:
        if name in failed:
            continue
        best = float("inf")
        try:
            for _ in range(runs):
                t0 = time.perf_counter()
                specs[name].run(spark, sf_dir).write.mode(
                    "overwrite"
                ).format("noop").save()
                best = min(best, time.perf_counter() - t0)
        except Exception as e:  # noqa: BLE001
            # A 24-entry sweep in ONE 16g JVM accumulates heap state; a
            # late-entry OOM must cost that entry, not the whole table
            # (the r10 sf30 sweep died on entry 24 of 24 with 23 results
            # unprinted). If the OOM killed the SparkContext, the next
            # entry fails too and the partial JSON still prints.
            failed[name] = str(e)[:200]
            print(f"engine {name}: FAILED {failed[name][:80]}",
                  file=sys.stderr, flush=True)
            continue
        engine[name] = round(best, 4)
        print(f"engine {name}: {best:.3f}s", file=sys.stderr, flush=True)
        # nudge old-gen between entries — broadcast/shuffle trackers of
        # the previous entry are garbage now, not at sweep end
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:  # noqa: BLE001
            pass
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

    print(json.dumps({"sf_dir": sf_dir, "engine": engine, "duckdb": duck,
                      "failed": failed}))


if __name__ == "__main__":
    main()
