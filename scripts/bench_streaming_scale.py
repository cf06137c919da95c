"""Isolate the streaming file-count throughput curve from the
micro-batch scheduling floor (round-6 verdict "What's wrong #3").

BENCH_r06 measured tumbling-agg throughput vs source file count at the
bench's native volume (sf0.1 events = 100k rows): 49.8k rows/s at 1
file -> 91.4k at 8 -> 77.6k at 32 — the curve TURNS OVER and the repo
had no explanation.  Hypothesis: at 100k total rows a 32-file source is
~3.1k rows per file; per-file fixed cost (file-source listing, task
launch, parquet footer + dictionary decode) dominates, so adding files
past the point where per-file read time falls under the fixed cost
REDUCES rows/s.  If that is right, the turnover is a ROW-VOLUME floor,
not a source-parallelism ceiling, and it must disappear when rows/file
grows: at 1.6M rows a 32-file source is 50k rows/file — well above the
floor.

Method: duplicate the sf0.1 events table DUP times (event_id offset
per replica so keys stay unique, ts unchanged so the stateful agg does
identical work per row), write it as {1, 8, 32, 64} parquet part-files,
and drive the SAME tumbling_counts plan used by bench.py/q57 with
availableNow semantics (all files in one trigger batch — measures
source parallelism, not trigger scheduling).  Report rows/s per file
count at both volumes.

Result (local[32], recorded in BASELINE.md "Streaming scale"): at 100k
rows the curve turns over past 8 files (the r6 shape, reproduced); at
1.6M rows throughput scales 1 -> 8 -> 32 files and holds at 64 —
confirming the per-file fixed-cost floor explanation.  The reference
comparison point is ExecutionStream's max_concurrent parallel streams
(execution_stream.py:96-212): its concurrency is capped by a config
constant, while the file-source's parallelism tracks file count until
rows/file hits the floor.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from adenhq_hive_spark.catalog import load_table  # noqa: E402
from adenhq_hive_spark.session import get_spark  # noqa: E402
from adenhq_hive_spark.streaming.events import tumbling_counts  # noqa: E402


def measure(spark, ev, n_files: int) -> float:
    data_dir = tempfile.mkdtemp(prefix=f"sscale_{n_files}f_")
    ck = tempfile.mkdtemp(prefix="sscale_ck_")
    try:
        ev.repartition(n_files).write.mode("overwrite").parquet(
            f"{data_dir}/events"
        )
        src = spark.readStream.schema(ev.schema).parquet(f"{data_dir}/events")
        t0 = time.perf_counter()
        q = (
            tumbling_counts(src)
            .writeStream.outputMode("complete")
            .format("noop")
            .option("checkpointLocation", ck)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return time.perf_counter() - t0
    finally:
        shutil.rmtree(ck, ignore_errors=True)
        shutil.rmtree(data_dir, ignore_errors=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dup = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = get_spark("bench-streaming-scale")
    base = load_table(spark, sf_dir, "events")
    n_base = base.count()

    big = (
        spark.range(dup)
        .crossJoin(base)
        .withColumn("event_id", F.col("event_id") + F.col("id") * 10_000_000)
        .drop("id")
        .select(base.columns)
    )

    # Warm-up: the FIRST streaming query on a session pays one-time
    # machinery init (~15-18 s observed) that would otherwise be charged
    # entirely to the first curve point.
    measure(spark, base.limit(1000), 1)

    out: dict[str, dict[str, int]] = {}
    for label, ev, n_rows in (
        (f"{n_base}", base, n_base),
        (f"{n_base * dup}", big, n_base * dup),
    ):
        curve: dict[str, int] = {}
        for n_files in (1, 8, 32, 64):
            wall = measure(spark, ev, n_files)
            curve[str(n_files)] = round(n_rows / wall)
            print(
                f"rows={n_rows} files={n_files}: {wall:.2f}s = "
                f"{curve[str(n_files)]} rows/s",
                flush=True,
            )
        out[label] = curve
    print(json.dumps({"streaming_scale_by_volume": out}))
    spark.stop()


if __name__ == "__main__":
    main()
