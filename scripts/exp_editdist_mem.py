"""Isolate the pl_editdist sf10 OOM (r12): candidate tier vs full
query, default vs widened pair-agg shuffle, fresh JVM per arm via
subprocess. Records wall, peak RSS, /proc/stat steal, and outcome.

Usage: PYTHONPATH=/root/repo python scripts/exp_editdist_mem.py <sf_dir> <arm>
  arm = cand32 | cand256 | full32 | full256
(The parent orchestration just calls this once per arm.)
"""

from __future__ import annotations

import json
import resource
import sys
import time


def steal_ticks():
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:]]
    return v[7], sum(v)


def main() -> None:
    sf_dir, arm = sys.argv[1], sys.argv[2]
    sys.path.insert(0, "/root/repo")
    from adenhq_hive_spark.catalog import load_table
    from adenhq_hive_spark.operators.dedup import (
        editdist_verify, ngram_jaccard_pairs,
    )
    from adenhq_hive_spark.session import get_spark

    overrides = {}
    if arm.endswith("256"):
        overrides["spark.sql.shuffle.partitions"] = "256"
    if "offheap" in arm:
        # execution memory off the GC heap: BytesToBytesMap pages and
        # sorter pointer arrays stop being 512MB humongous on-heap
        # allocations, which is the GCLocker OOM signature this probe
        # chases (guide §5)
        overrides["spark.memory.offHeap.enabled"] = "true"
        overrides["spark.memory.offHeap.size"] = "8g"
    if "gcl" in arm:
        overrides["spark.driver.extraJavaOptions"] = (
            "-XX:GCLockerRetryAllocationCount=32"
        )
    spark = get_spark(f"editdist-mem-{arm}", **overrides)
    spark.sparkContext.setJobDescription(f"exp_editdist_mem:{arm}")
    docs = load_table(spark, sf_dir, "documents")
    if arm.startswith("cand"):
        df = ngram_jaccard_pairs(docs, k=3, threshold=0.3)
    elif arm.startswith("nopre"):
        # verify tier WITHOUT the r12 length prefilter (attribution
        # A/B; output identical by the triangle-inequality bound)
        from pyspark.sql import functions as F

        from adenhq_hive_spark.operators.text import frac4

        cand = ngram_jaccard_pairs(docs, k=3, threshold=0.3)
        texts = docs.select(
            F.col("doc_id").alias("id"), F.col("text").alias("t")
        )
        joined = (
            cand.join(
                texts.withColumnsRenamed({"id": "id_a", "t": "t_a"}), "id_a"
            ).join(
                texts.withColumnsRenamed({"id": "id_b", "t": "t_b"}), "id_b"
            )
        )
        lev = F.levenshtein("t_a", "t_b")
        mx = F.greatest(F.length("t_a"), F.length("t_b"))
        df = (
            joined.withColumn("lev", lev)
            .withColumn("mx", mx)
            .filter(
                (F.col("mx") == 0)
                | ((F.col("mx") - F.col("lev")) * 10000
                   >= F.col("mx") * 5000)
            )
            .select(
                "id_a", "id_b", "jaccard",
                F.when(F.col("mx") == 0, F.lit(1.0))
                .otherwise(frac4(F.col("mx") - F.col("lev"), F.col("mx")))
                .alias("edit_sim"),
            )
        )
    else:
        df = editdist_verify(
            docs, k=3, candidate_threshold=0.3, sim_threshold=0.5
        )
    s0, t0 = steal_ticks()
    w0 = time.perf_counter()
    ok, err = True, None
    try:
        df.write.mode("overwrite").format("noop").save()
    except Exception as exc:  # noqa: BLE001
        ok, err = False, str(exc).split("\n")[0][:200]
    dt = time.perf_counter() - w0
    s1, t1 = steal_ticks()
    print(json.dumps({
        "arm": arm, "ok": ok, "wall_s": round(dt, 1),
        "steal_pct": round(100.0 * (s1 - s0) / max(1, t1 - t0), 1),
        "py_peak_rss_mb": resource.getrusage(
            resource.RUSAGE_SELF).ru_maxrss // 1024,
        "err": err,
    }), flush=True)


if __name__ == "__main__":
    main()
