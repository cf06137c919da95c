"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The actual engine lives in ``adenhq_hive_spark/``; this module is the thin
adapter: every declared query (SURVEY.md §2.11 Q1-Q60 + the LLM-pipeline
set) is registered in ``adenhq_hive_spark.queries``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from adenhq_hive_spark.queries import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (Q6, TPC-H Q1 pricing summary) on sf0.001."""
    spec = all_queries()["q06"]
    return spec.run(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.run for name, spec in sorted(all_queries().items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query; rows-only ops are omitted."""
    return {
        name: spec.oracle
        for name, spec in sorted(all_queries().items())
        if spec.oracle is not None
    }
