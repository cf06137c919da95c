"""BigQuery tool parity: read-only remote SQL (reference
bigquery_tool.py:149-275) and dataset description (277-392).

The Spark BigQuery connector jar (or a JDBC driver) is not in this
container, so the remote execution path is gated: ``run_bigquery_query``
validates the statement with the parse-plan read-only gate (replacing the
reference's regex blocklist with comment-stripping,
bigquery_tool.py:27-58 — the parser makes comment handling free), clamps
``max_rows`` (bigquery_tool.py:209-214), and then either executes via a
caller-provided ``reader`` (the injection point a real connector fills)
or raises NotImplementedError.  Everything around the missing jar —
validation, clamping, envelope with schema/truncation — is real and
tested.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from ..engine import ReadOnlyViolation, assert_read_only

MAX_ROWS_CAP = 10_000  # bigquery_tool.py:209-214


def _connector_reader(spark: SparkSession, sql: str) -> DataFrame:
    """Default reader: the real connector path (jar not present here)."""
    try:
        return (
            spark.read.format("bigquery")
            .option("query", sql)
            .load()
        )
    except Exception as exc:
        raise NotImplementedError(
            "spark-bigquery connector jar not on the classpath; pass a "
            "`reader` (e.g. JDBC) or install the connector."
        ) from exc


def run_bigquery_query(
    spark: SparkSession,
    sql: str,
    max_rows: int = 1000,
    reader: Callable[[SparkSession, str], DataFrame] | None = None,
) -> dict[str, Any]:
    """Read-only remote SQL with schema + truncation envelope
    (bigquery_tool.py:235-243 shape)."""
    try:
        assert_read_only(spark, sql)
    except ReadOnlyViolation as exc:
        return {"success": False, "error": str(exc)}
    max_rows = max(1, min(int(max_rows), MAX_ROWS_CAP))
    try:
        df = (reader or _connector_reader)(spark, sql)
        taken = df.limit(max_rows + 1).collect()
    except NotImplementedError:
        raise
    except Exception as exc:
        return {"success": False, "error": f"Query failed: {exc}"}
    rows = [r.asDict(recursive=True) for r in taken[:max_rows]]
    return {
        "success": True,
        "columns": list(df.columns),
        "schema": [{"name": n, "type": t} for n, t in df.dtypes],
        "rows": rows,
        "row_count": len(rows),
        "query_truncated": len(taken) > max_rows,
    }


def describe_dataset(
    spark: SparkSession, with_row_counts: bool = False
) -> dict[str, Any]:
    """Catalog listing over the session catalog (bigquery_tool.py:277-392
    shape) — tables, column schemas, optional row counts."""
    tables = []
    for t in spark.catalog.listTables():
        cols = [
            {"name": c.name, "type": c.dataType, "nullable": c.nullable}
            for c in spark.catalog.listColumns(t.name)
        ]
        entry: dict[str, Any] = {"table": t.name, "columns": cols}
        if with_row_counts:
            entry["row_count"] = spark.table(t.name).count()
        tables.append(entry)
    return {
        "success": True,
        "tables": sorted(tables, key=lambda e: e["table"]),
        "table_count": len(tables),
    }
