

def test_compaction_plan_bin_packs_deterministically(spark, tmp_path):
    from adenhq_hive_spark.operators.skew import compaction_plan

    d = tmp_path / "tbl"
    for part in ("p=a", "p=b"):
        (d / part).mkdir(parents=True)
    # p=a: four 1-byte-scale files that pack 2+2 at a tiny target
    for i in range(4):
        (d / "p=a" / f"f{i}.parquet").write_bytes(b"x" * 400_000)
    (d / "p=a" / "_SUCCESS").write_bytes(b"")          # ignored
    (d / "p=b" / "big.parquet").write_bytes(b"y" * 2_000_000)

    plan = compaction_plan(spark, str(d), target_mb=1).collect()
    a = [r for r in plan if r.partition == "p=a"]
    b = [r for r in plan if r.partition == "p=b"]
    assert [r.n_files for r in a] == [2, 2]            # first-fit 2+2
    assert a[0].files == ["f0.parquet", "f1.parquet"]
    assert len(b) == 1 and b[0].n_files == 1           # already big enough
    # deterministic: second run yields the identical plan
    again = compaction_plan(spark, str(d), target_mb=1).collect()
    assert [tuple(r) for r in plan] == [tuple(r) for r in again]


def test_salted_topk_matches_direct_window_under_skew(spark):
    """Two-phase salted top-k (r9): exact parity with the direct
    single-window plan on an adversarially skewed key distribution
    (one key holds ~90% of rows), invariance under repartitioning,
    and the phase-1 plan partitions by (key, salt)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from adenhq_hive_spark.operators.skew import salted_topk

    rows = [(i, "hot" if i % 10 else "cold", float((i * 37) % 1000))
            for i in range(5000)]
    df = spark.createDataFrame(rows, "id long, key string, v double")
    direct = (
        df.withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("key").orderBy(
                    F.col("v").desc(), F.col("id").asc()
                )
            ),
        )
        .filter("rank <= 5")
    )
    want = sorted(tuple(r) for r in direct.collect())
    got = sorted(
        tuple(r)
        for r in salted_topk(df, "key", "v", "id", k=5, salts=8).collect()
    )
    assert got == want
    got2 = sorted(
        tuple(r)
        for r in salted_topk(
            df.repartition(17), "key", "v", "id", k=5, salts=8
        ).collect()
    )
    assert got2 == want
    plan = (
        salted_topk(df, "key", "v", "id", k=5, salts=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "_salt" in plan  # phase-1 window really partitions by salt

    import pytest as _pytest

    with _pytest.raises(ValueError):
        salted_topk(df, "key", "v", "id", k=0)
