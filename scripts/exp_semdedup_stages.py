"""semdedup stage-level breakdown (r11 verdict #1, guide §1/§4/§5).

r11 measured the op 17% slower at sf1 (and 620->941 s at sf10) under
the adaptive 32m split trio vs the old flat 8m, and spreading the
assignment scan recovered nothing. Before touching anything, decompose
where the time actually goes:

  stage A  "unit"      — the per-element normalization projection
                         (transform lambda whose body re-evaluates the
                         O(d) _norm fold PER ELEMENT -> O(d^2)/row
                         interpreted, the r11 quadratic class)
  stage B  "assigned"  — A + the nearest-centroid pandas_udf matmul
  stage C  full semdedup (A + B + shuffle + per-cluster gram stage)

plus the cluster-size distribution (sum m_i^2 drives the gram stage,
and the limit()-sampled centroids vary with scan layout, so split
config can move cluster BALANCE — a confound r11 never separated).

Usage: python scripts/exp_semdedup_stages.py <sf_dir> [runs] [--flat8m]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402


def steal_ticks():
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:]]
    return v[7], sum(v)


def timed(label, fn, runs):
    best = None
    for _ in range(runs):
        s0, t0 = steal_ticks()
        w0 = time.perf_counter()
        fn()
        w1 = time.perf_counter()
        s1, t1 = steal_ticks()
        steal = 100.0 * (s1 - s0) / max(1, t1 - t0)
        dt = w1 - w0
        print(f"  {label}: {dt:.3f}s (steal {steal:.1f}%)", flush=True)
        if best is None or dt < best:
            best = dt
    print(f"{label}: min {best:.3f}s over {runs}", flush=True)
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench_sf1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    flat8m = "--flat8m" in sys.argv

    from adenhq_hive_spark.session import get_spark

    overrides = {}
    if flat8m:
        overrides = {
            "spark.sql.files.maxPartitionBytes": "8m",
            "spark.sql.files.minPartitionNum": "1",
            "spark.sql.files.openCostInBytes": "4m",
        }
    spark = get_spark("exp_semdedup", **overrides)
    print(f"splits: flat8m={flat8m} "
          f"maxPartitionBytes="
          f"{spark.conf.get('spark.sql.files.maxPartitionBytes')}")

    from pyspark.sql import functions as F
    from adenhq_hive_spark.catalog import load_table
    from adenhq_hive_spark.operators.similarity import (
        _norm,
        _train_spherical_kmeans,
    )

    vectors = load_table(spark, sf_dir, "embeddings")
    n_clusters = 8
    id_col, vec_col = "vec_id", "embedding"

    # ---- replicate semdedup's internals stage by stage ----
    unit = vectors.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("raw")
    ).select(
        "id",
        F.transform(
            "raw", lambda x: x.cast("double") / _norm(F.col("raw"))
        ).alias("v"),
    )
    print(f"scan partitions: {unit.rdd.getNumPartitions()}", flush=True)

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    spark.sparkContext.setJobDescription("A: unit normalization")
    timed("A_unit_norm", lambda: noop(unit), runs)

    sample = np.array(
        [r[0] for r in unit.select("v").limit(65_536).collect()],
        dtype=np.float64,
    )
    centroids = _train_spherical_kmeans(sample, n_clusters, 42)
    bc = spark.sparkContext.broadcast(centroids)

    @F.pandas_udf("int")
    def nearest(vcol: pd.Series) -> pd.Series:
        mat = np.array(list(vcol), dtype=np.float64)
        return pd.Series(
            np.argmax(mat @ bc.value.T, axis=1).astype(np.int32)
        )

    assigned = unit.withColumn("cluster_id", nearest("v"))
    spark.sparkContext.setJobDescription("B: + assignment")
    timed("B_assigned", lambda: noop(assigned), runs)

    sizes = sorted(
        (r["cluster_id"], r["count"])
        for r in assigned.groupBy("cluster_id").count().collect()
    )
    m2 = sum(c * c for _, c in sizes)
    print(f"cluster sizes: {sizes}")
    print(f"sum m^2 = {m2:,} (balanced would be "
          f"{sum(c for _, c in sizes) ** 2 // n_clusters:,})", flush=True)

    from adenhq_hive_spark.operators.similarity import semdedup

    spark.sparkContext.setJobDescription("C: full semdedup")
    timed("C_full", lambda: noop(semdedup(vectors, n_clusters=n_clusters)),
          runs)


if __name__ == "__main__":
    main()
