"""SparkSession bootstrap tuned for the engine.

Local-mode testing runs on ``local[$SPARK_GRAFT_CPUS]`` but every default
here is chosen to also hold on a large multi-executor cluster: AQE on
(runtime re-plan, skew-join splitting, partition coalescing), UTC session
timezone (oracle comparability — DuckDB timestamps are UTC-naive), Arrow
enabled for the pandas/UDF path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Tuned for the current host at test scale; on a real cluster these are
# deploy-time settings (shuffle partitions ~ 2-3x total cores, driver/executor
# memory per node class).
_DEFAULTS = {
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # events.parquet carries INT64 TIMESTAMP(NANOS); read as long, convert
    # in catalog.load_table (Spark has no ns timestamp type).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
    "spark.ui.enabled": "false",
    # Bound broadcast joins explicitly; AQE will still pick broadcast for
    # small dims discovered at runtime. 16m (not higher): at 64m the
    # sf1 bench broadcast a pruned 6M-row FACT table in q25 — parquet
    # size estimates undercount decoded width, so a generous threshold
    # turns into a driver-side fact broadcast at exactly the scale where
    # it hurts most. Dims (customer at 10x = ~7 MB) still broadcast.
    "spark.sql.autoBroadcastJoinThreshold": str(16 * 1024 * 1024),
    # Shuffled hash join over sort-merge when the per-partition build
    # side fits memory: skips two full sorts on fact-fact joins (q25's
    # orders-lineitem leg went 6.0s -> 1.5s at sf1) and AQE still
    # re-plans to broadcast/skew variants at runtime. SMJ remains the
    # fallback when the build side cannot hash locally.
    "spark.sql.join.preferSortMergeJoin": "false",
    # Scan split sizing (r10 adjudication, BASELINE.md "the 8m scan-split
    # tax"): the old flat 8m restored parallelism on the single-file
    # testdata but at sf30 it shredded lineitem into 659 tasks whose
    # per-task hash tables dominated aggregation (q09 5.9s -> 1.9s at
    # 32m). The trio below makes the split size ADAPTIVE:
    # splitSize = min(maxPartitionBytes, max(openCost, bytes/minPartNum))
    # — small tables still split ~32 ways (1m floor), big tables get
    # 32m splits. 32m, not Spark's 128m default: 32 concurrent local
    # tasks x the decoded width of a 128m parquet split exhausted the
    # heap (GCLocker retry storms at sf30); a real cluster with
    # per-executor task slots can raise it back.
    "spark.sql.files.maxPartitionBytes": "32m",
    "spark.sql.files.minPartitionNum": "32",
    "spark.sql.files.openCostInBytes": "1m",
    # G1 GCLocker starvation guard (r12, guide §5/§7.4). 32 concurrent
    # local tasks hold the GCLocker near-continuously through JNI
    # decompression (lz4/snappy GetPrimitiveArrayCritical); JDK 17 G1
    # retries a blocked allocation only GCLockerRetryAllocationCount=2
    # times before throwing a SPURIOUS OutOfMemoryError with gigabytes
    # free ("Retried waiting for GCLocker too often allocating 5
    # words" — observed on pl_editdist/sf10 stage 10 AFTER the
    # off-heap fix removed the real humongous-allocation pressure).
    # Raising the retry count lets the allocation wait for the locker
    # to drain; a genuine OOM still throws once a full GC has run with
    # the locker free. JVM-launch-time only: applies to fresh
    # processes (bench, driver, tests), like spark.driver.memory.
    "spark.driver.extraJavaOptions":
        "-XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=64",
    # same posture per executor on a real cluster (no-op in local mode)
    "spark.executor.extraJavaOptions":
        "-XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=64",
}

# Execution memory OFF the GC heap (r12, guide §5). The heavy shuffle
# aggregations (pl_editdist/pl_dedup_incremental's pair-stream
# hash-agg at sf10) grow BytesToBytesMap pages and sorter pointer
# arrays by doubling; on-heap those become 256-512 MB HUMONGOUS G1
# allocations that collide with JNI-critical sections (GCLocker) and
# stochastically OOM a 16 GB heap that is nowhere near full — measured
# 3/3 OOM on-heap vs clean 507 s off-heap (was 790 s in the r11 run
# that happened to survive) on pl_editdist at sf10. Off-heap, tungsten
# pages come from mmap'd memory the GC never scans: no humongous
# regions, no GCLocker interplay, and cached/broadcast data keeps the
# whole heap. On a cluster this is the same flag per executor, sized
# like memoryOverhead (a few GB per executor core-group).
_OFFHEAP = os.environ.get("SPARK_GRAFT_OFFHEAP", "8g")
if _OFFHEAP not in ("", "0", "off"):
    _DEFAULTS["spark.memory.offHeap.enabled"] = "true"
    _DEFAULTS["spark.memory.offHeap.size"] = _OFFHEAP


def get_spark(app_name: str = "adenhq_hive_spark", **overrides: str) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``spark.driver.memory`` only applies at JVM launch, so the first caller
    in a process wins; subsequent calls just return the live session.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.master(f"local[{cpus}]").appName(app_name)
    conf = dict(_DEFAULTS)
    conf.update(overrides)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
