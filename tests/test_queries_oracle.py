"""The Q-set oracle harness: every declared query runs on Spark AND on the
DuckDB oracle at sf0.001; normalized results must hash-match exactly
(SURVEY §5.4).  This mirrors the driver's CORRECTNESS gate at sf0.01.
"""

from __future__ import annotations

import pytest

from adenhq_hive_spark.normalize import normalize
from adenhq_hive_spark.queries import all_queries

from .conftest import SF_SMOKE

QUERIES = all_queries()
ORACLE_CHECKED = sorted(n for n, s in QUERIES.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in QUERIES.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_oracle_match(spark, ducks, name):
    spec = QUERIES[name]
    df = spec.run(spark, SF_SMOKE)
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]

    rel = ducks.execute(spec.oracle)
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column names differ: {spark_cols} vs {duck_cols}"
    )
    # strict: -0.0 stays distinct — the driver's hash does not collapse
    # signed zeros (r7 pl_jl_project), so the local gate must not either
    s_norm = normalize(spark_cols, spark_rows, strict=True)
    d_norm = normalize(duck_cols, duck_rows, strict=True)
    if s_norm != d_norm:
        s_lines, d_lines = s_norm.splitlines(), d_norm.splitlines()
        diffs = [
            f"  spark: {a!r}\n  duck : {b!r}"
            for a, b in zip(s_lines, d_lines)
            if a != b
        ][:5]
        pytest.fail(
            f"{name}: result mismatch ({len(s_lines) - 1} vs "
            f"{len(d_lines) - 1} rows)\n" + "\n".join(diffs)
        )


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    spec = QUERIES[name]
    df = spec.run(spark, SF_SMOKE)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_fast_money_sign_safe(spark):
    """The scaled-BIGINT money-sum rewrite must match the portable
    decimal form for NEGATIVE values too (sign-aware round-half-up) —
    the contract columns happen to be non-negative, but the rewrite
    applies to every _QM call site, so it must not be a silent trap."""
    from adenhq_hive_spark.queries.relational import _fast_money

    vals = [
        -1.00005, -0.99995, -123.45675, -0.00005, 0.0, 0.00005,
        123.45675, 0.99995, 1.00005, -7e8, 7e8, -0.12345, 0.12345,
    ]
    spark.createDataFrame(
        [(i % 3, v) for i, v in enumerate(vals)], "g int, x double"
    ).createOrReplaceTempView("fm_probe")
    decimal_sql = (
        "SELECT g, CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE) AS s "
        "FROM fm_probe GROUP BY g"
    )
    fast_sql = _fast_money(decimal_sql)
    assert fast_sql != decimal_sql, "rewrite did not fire"
    dec = {r.g: r.s for r in spark.sql(decimal_sql).collect()}
    fast = {r.g: r.s for r in spark.sql(fast_sql).collect()}
    assert fast == dec, f"{fast} != {dec}"
