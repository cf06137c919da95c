

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
