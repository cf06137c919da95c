"""Benchmark harness: runs the headline query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Plans are executed with the `noop` sink (full pipeline execution, no
driver-side collect cost) after one warm-up run of q01 to exclude session
/ JIT startup from per-query numbers.  Progress goes to stderr; stdout is
exactly the JSON line the driver records as BENCH_r{N}.json.

Optional: --duckdb also times the DuckDB oracle per query (fills the
BASELINE.md results table; not part of the driver protocol).
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE = [
    "q01",  # scan + offset/limit
    "q02",  # predicate scan
    "q06",  # TPC-H Q1 aggregation
    "q09",  # count distinct
    "q13",  # cube
    "q17",  # exact median
    "q24",  # 4-way star join
    "q25",  # 6-way snowflake
    "q33",  # as-of join
    "q36",  # window top-k per group
    "q43",  # global top-k
    "q53",  # dedup clusters
    "q57",  # tumbling window image
    "q58",  # sessionization
    "q59",  # correlated subquery
    "q60",  # top-k IN subquery
    "pl_ngram_jaccard",  # exact near-dup pairs
    "pl_minhash_lsh",    # minhash+LSH near-dup
    "pl_cosine_topk",    # brute-force ANN baseline
    "pl_cosine_dedup",   # semantic dedup pairs
    "pl_sliding_window", # sliding-window expansion
    "pl_quality",        # text quality scoring
    "pl_decontaminate",  # eval-set n-gram leakage removal
    "pl_repetition",     # Gopher-style repetition filter
    "pl_tfidf",          # per-doc TF-IDF top terms
    "pl_hash_split",     # md5-routed train/val/test split
    "pl_dedup_incremental",  # new-batch-vs-corpus dedup (8x vs DuckDB)
    "pl_gopher_rules",   # published Gopher rule battery (map-only)
    "pl_c4_filter",      # C4 line-level page cleaning (map-only)
    "pl_snapshot_diff",  # incremental snapshot bookkeeping
    "pl_shuffle_shard",  # deterministic shuffle + sharding
    "pl_semdedup",       # cluster-then-dedup semantic tier (no oracle)
    "pl_editdist",       # levenshtein filter-and-verify confirm tier
    "pl_event_anomaly",  # integer z-test volume sentinel
    "pl_trigram_search", # trigram-index literal search (build + probe)
    "pl_weighted_sample",# quality-weighted md5-coin subsample (map-only)
    "pl_hard_negatives", # contrastive hard-negative mining (BLAS)
    "pl_skew_report",    # hot-key diagnosis (grouped count + top-k)
    "pl_curriculum",     # length-curriculum addressing (two windows)
    "pl_source_scorecard",  # per-source governance table
    "pl_hot_shingles",   # boilerplate census sizing max_shingle_df
    "pl_bm25",           # BM25 ranked retrieval (query-sized shuffle)
]


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from adenhq_hive_spark.queries import all_queries
    from adenhq_hive_spark.session import get_spark

    do_duck = "--duckdb" in sys.argv

    spark = get_spark("bench")
    specs = all_queries()
    names = [n for n in HEADLINE if n in specs]

    # Warm-up: session init, parquet footer reads, JVM JIT + codegen
    # caches. One untimed pass of every headline query — steady-state
    # per-query cost is the number that scales; first-run JIT noise is
    # not (it amortizes to zero over a long-lived session).
    for name in names:
        specs[name].run(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        log(f"warmup {name} done")

    times: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            specs[name].run(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 4)
        log(f"{name}: {times[name]:.3f}s")

    duck_times: dict[str, float] = {}
    if do_duck:
        import duckdb

        from adenhq_hive_spark.catalog import TABLES

        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        for name in names:
            oracle = specs[name].oracle
            if oracle is None:
                continue
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                con.execute(oracle).fetchall()
                best = min(best, time.perf_counter() - t0)
            duck_times[name] = round(best, 4)
            log(f"duckdb {name}: {duck_times[name]:.3f}s")

    # Streaming throughput: drive the events table through the tumbling-
    # window stream (availableNow semantics) and report end-to-end
    # rows/sec — micro-batch scheduling + watermark + stateful agg
    # included, the number that scales with executor count.
    streaming = None
    try:
        import shutil
        import tempfile

        from adenhq_hive_spark.streaming.events import (
            read_event_stream,
            tumbling_counts,
        )

        n_rows = spark.read.parquet(f"{sf_dir}/events.parquet").count()
        ck = tempfile.mkdtemp(prefix="bench_stream_ck_")
        try:
            t0 = time.perf_counter()
            q = (
                tumbling_counts(read_event_stream(spark, sf_dir))
                .writeStream.outputMode("complete")
                .format("noop")
                .option("checkpointLocation", ck)
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()  # never rmtree a checkpoint under a live query
            wall = time.perf_counter() - t0
        finally:
            shutil.rmtree(ck, ignore_errors=True)
        streaming = {
            "rows": n_rows,
            "wall_s": round(wall, 4),
            "rows_per_sec": round(n_rows / wall),
        }
        log(f"streaming tumbling: {n_rows} rows in {wall:.2f}s "
            f"= {streaming['rows_per_sec']} rows/s")
    except Exception as exc:  # never fail the batch bench on this
        log(f"streaming bench skipped: {exc}")

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(times.values()), 4),
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if streaming:
        out["streaming"] = streaming
    if duck_times:
        out["duckdb"] = duck_times
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
