"""Skewed STREAMING regime measurement (r10; r9 batch tier measured by
bench_skew.py, the stateful streaming tier still ran only on uniform
keys).

Question: when one state key carries ~50% of the stream (the
.bench_skew corpus: event_type='hot' on half the rows), does the keyed
stateful tier serialize on the hot key's task, and does the map-side
combine added in r10 (``pre_reduce`` — a stateless mapInPandas folding
each source partition to (key, day, bucket, cnt) / (bucket, token, cnt)
BEFORE the shuffle to state) fix it?

Method: drive the two stateful operators over the same multi-file
parquet source with availableNow semantics (one trigger batch — the
steady-state shape, no trigger-scheduling noise), min-of-N wall time
per mode (the r10 streaming min-of-N protocol):

- hist_quantile_stream: keyed by event_type — the hot key IS one state
  key.  pre_reduce=False shuffles every row to the key's single state
  task, which folds them in Python; pre_reduce=True ships per-partition
  (day, bucket) count deltas, so the hot task receives
  O(partitions x days x buckets) rows regardless of key mass.
- heavy_hitters_stream: tokens hash to n_buckets state keys, and every
  occurrence of the hot token lands in ONE bucket by design (that is
  what makes the per-bucket MG bound a global one) — the hot-token
  bucket is the funnel.  Token stream: 2 tokens/row, one of them the
  event_type (so 'hot' is ~25% of all token occurrences).

Both A/B pairs emit the same results by construction (histogram counts
are exact; MG is merge-order-robust within its bound) — parity is
pinned in tests/test_streaming.py; THIS script only times.

Usage: PYTHONPATH=/root/repo python scripts/bench_skew_streaming.py \
          [skew_dir] [runs] [n_files]
Defaults: /root/repo/.bench_skew, 3, 32.  Needs an idle machine.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

from adenhq_hive_spark.session import get_spark
from adenhq_hive_spark.streaming.events import (
    heavy_hitters_stream,
    hist_quantile_stream,
    run_to_completion,
)


def main() -> None:
    skew_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench_skew"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n_files = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    src_pq = f"{skew_dir}/events_skew.parquet"
    if not os.path.exists(src_pq):
        raise SystemExit(f"run scripts/make_skew.py first ({skew_dir})")

    spark = get_spark("bench-skew-streaming")
    work = tempfile.mkdtemp(prefix="skewstream_")

    # one multi-file source dir reused by every mode: event stream plus
    # a derived text column for the token tier (hot token = hot key)
    src_dir = f"{work}/src"
    df = spark.read.parquet(src_pq).withColumn(
        "text",
        F.concat_ws(
            " ", F.col("event_type"),
            F.concat(F.lit("w"), (F.col("event_id") % 1000).cast("string")),
        ),
    )
    df.repartition(n_files).write.mode("overwrite").parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema
    n_rows = spark.read.parquet(src_dir).count()
    print(f"source: {n_rows} rows, {n_files} files", file=sys.stderr)

    def drive(tag: str, build) -> float:
        times = []
        for i in range(runs):
            ck = f"{work}/ck_{tag}_{i}"
            stream = spark.readStream.schema(schema).parquet(src_dir)
            t0 = time.time()
            q = run_to_completion(
                build(stream), f"t_{tag}_{i}", ck, output_mode="update"
            )
            q.stop()
            times.append(round(time.time() - t0, 2))
            spark.catalog.dropTempView(f"t_{tag}_{i}")
        print(f"{tag}: min {min(times)}s of {times}", file=sys.stderr)
        return min(times)

    out = {"n_rows": n_rows, "n_files": n_files, "runs": runs}
    out["histq_raw_s"] = drive(
        "histq_raw", lambda s: hist_quantile_stream(s, pre_reduce=False)
    )
    out["histq_pre_s"] = drive(
        "histq_pre", lambda s: hist_quantile_stream(s, pre_reduce=True)
    )
    out["hh_raw_s"] = drive(
        "hh_raw",
        lambda s: heavy_hitters_stream(s, "text", pre_reduce=False),
    )
    out["hh_pre_s"] = drive(
        "hh_pre",
        lambda s: heavy_hitters_stream(s, "text", pre_reduce=True),
    )
    out["histq_speedup"] = round(out["histq_raw_s"] / out["histq_pre_s"], 2)
    out["hh_speedup"] = round(out["hh_raw_s"] / out["hh_pre_s"], 2)
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
