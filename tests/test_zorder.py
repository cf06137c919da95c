from __future__ import annotations

from pyspark.sql import functions as F

from adenhq_hive_spark.operators.zorder import (
    morton_key,
    spread_bits16,
    zorder_layout,
)


def _py_spread(v: int) -> int:
    x = v & 0xFFFF
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def test_spread_and_morton_match_python_reference(spark):
    vals = [0, 1, 2, 3, 255, 256, 12345, 65535]
    df = spark.createDataFrame([(a, b) for a in vals for b in vals],
                               ["x", "y"])
    rows = df.select(
        "x", "y",
        spread_bits16(F.col("x")).alias("sx"),
        morton_key(F.col("x"), F.col("y")).alias("z"),
    ).collect()
    for r in rows:
        assert r.sx == _py_spread(r.x)
        assert r.z == _py_spread(r.x) | (_py_spread(r.y) << 1)


def test_morton_locality_buckets_are_rectangles(spark):
    """Dropping the low 2k interleaved bits of the key must bound each
    bucket's x and y span by 2^k — the data-skipping guarantee."""
    df = spark.createDataFrame(
        [(x, y) for x in range(64) for y in range(64)], ["x", "y"]
    )
    stats = (
        df.withColumn("z", morton_key(F.col("x"), F.col("y")))
        .groupBy(F.shiftright("z", 8).alias("cell"))
        .agg(F.min("x").alias("x0"), F.max("x").alias("x1"),
             F.min("y").alias("y0"), F.max("y").alias("y1"),
             F.count("*").alias("n"))
        .collect()
    )
    assert len(stats) == 16  # 64x64 grid -> 16 cells of 16x16
    for r in stats:
        assert r.x1 - r.x0 <= 15 and r.y1 - r.y0 <= 15
        assert r.n == 256


def test_zorder_layout_partitions_cover_bounded_rectangles(spark):
    """After repartitionByRange on the Morton key, every PARTITION's
    (x, y) bounding box is much smaller than the full domain — the
    file-statistics pruning story, measured on actual partitions."""
    df = spark.createDataFrame(
        [(x, y) for x in range(64) for y in range(64)], ["x", "y"]
    )
    laid = zorder_layout(df, F.col("x"), F.col("y"), n_files=16)
    parts = (
        laid.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.min("x").alias("x0"), F.max("x").alias("x1"),
             F.min("y").alias("y0"), F.max("y").alias("y1"))
        .collect()
    )
    assert len(parts) > 4
    # full domain is 64 wide; a z-ordered partition must not span it all
    for r in parts:
        area = (r.x1 - r.x0 + 1) * (r.y1 - r.y0 + 1)
        assert area <= (64 * 64) // 2
    # linear-sort layout for contrast: sorting by x alone leaves y
    # unconstrained (every partition spans the full y domain)
    lin = (
        df.repartitionByRange(16, F.col("x"))
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.min("y").alias("y0"), F.max("y").alias("y1"))
        .collect()
    )
    assert all(r.y1 - r.y0 == 63 for r in lin)


def test_zorder_key_is_map_only(spark):
    df = spark.createDataFrame([(1, 2)], ["x", "y"])
    plan = (
        df.withColumn("z", morton_key(F.col("x"), F.col("y")))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
