from __future__ import annotations

from adenhq_hive_spark.operators.profile import profile_table


def test_profile_table_golden(spark):
    rows = [
        (1, "alpha", None),
        (2, "beta", 10),
        (3, None, 10),
        (4, "a-very-long-string-value-exceeding-the-cap", 30),
    ]
    df = spark.createDataFrame(rows, ["id", "name", "score"])
    out = {r.col_name: r for r in profile_table(df, max_str=24).collect()}
    assert set(out) == {"id", "name", "score"}
    assert out["id"].n_rows == 4 and out["id"].n_nulls == 0
    assert out["name"].n_nulls == 1 and out["name"].n_distinct == 3
    assert out["score"].n_nulls == 1 and out["score"].n_distinct == 2
    # typed (numeric) min/max, stringified after aggregation
    assert out["score"].min_s == "10" and out["score"].max_s == "30"
    # truncation cap applies to wide strings
    assert len(out["name"].min_s) <= 24
    assert out["name"].min_s == "a-very-long-string-value"


def test_profile_table_approx_tier(spark):
    df = spark.range(1000).withColumnRenamed("id", "v")
    out = {r.col_name: r for r in profile_table(df, exact=False).collect()}
    nd = out["v"].n_distinct
    # HLL default rsd 5% — generous envelope, just pin the tier works
    assert 800 <= nd <= 1200
    assert out["v"].min_s == "0" and out["v"].max_s == "999"


def test_approx_quantiles_gate(spark):
    from adenhq_hive_spark.operators.profile import approx_quantiles_gate

    df = spark.range(10_000).withColumnRenamed("id", "v")
    row = approx_quantiles_gate(df, "v").collect()[0]
    assert row.n_checked == 5 and row.within_tol

    # a deliberately coarse sketch on skewed data still honors ITS OWN
    # (looser) bound — the gate tolerance scales with 1/accuracy
    row2 = approx_quantiles_gate(df, "v", accuracy=100).collect()[0]
    assert row2.within_tol
