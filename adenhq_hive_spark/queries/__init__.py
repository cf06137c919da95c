"""Query registry: the Q1-Q60 correctness contract (SURVEY.md §2.11) plus
the LLM-data-pipeline query set.

Each :class:`QuerySpec` carries the Spark-side implementation (portable SQL
string or a DataFrame-API builder) and, where expressible, the DuckDB
oracle SQL.  ``oracle_sql_str=None`` with ``engine_sql`` set means the same
SQL string runs on both engines (the portable dialect of SURVEY §2.11);
``has_oracle=False`` marks genuinely non-SQL-expressible operators that get
the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..catalog import register_views


@dataclass(frozen=True)
class QuerySpec:
    name: str
    doc: str
    engine_sql: str | None = None
    oracle_sql_str: str | None = None
    builder: Callable[[SparkSession, str], DataFrame] | None = None
    has_oracle: bool = True

    @property
    def oracle(self) -> str | None:
        if not self.has_oracle:
            return None
        return self.oracle_sql_str if self.oracle_sql_str is not None else self.engine_sql

    def run(self, spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        if self.builder is not None:
            return self.builder(spark, sf_dir)
        assert self.engine_sql is not None
        return spark.sql(self.engine_sql)


_REGISTRY: dict[str, QuerySpec] = {}


def register(spec: QuerySpec) -> QuerySpec:
    if spec.name in _REGISTRY:
        raise ValueError(f"duplicate query name {spec.name}")
    _REGISTRY[spec.name] = spec
    return spec


def all_queries() -> dict[str, QuerySpec]:
    # Import side-effect modules on first use.
    from . import pipeline, relational  # noqa: F401

    return dict(_REGISTRY)
