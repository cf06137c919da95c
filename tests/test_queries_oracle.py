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
    s_norm = normalize(spark_cols, spark_rows)
    d_norm = normalize(duck_cols, duck_rows)
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
