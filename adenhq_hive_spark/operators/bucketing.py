"""Bucketed-table co-located joins — the shuffle-elimination tool for
repeated big-fact joins (SURVEY §2.3 scale guidance; Spark bucketing,
Hive-compatible layout).

A 100 TB deployment joining the same fact tables on the same keys every
day should not pay the key shuffle every query: ``bucketBy(n, key)``
fixes each row's bucket at WRITE time, so two tables bucketed on the
join key with the same bucket count join with NO Exchange on either
side — the executed plan shows a SortMergeJoin whose children are bare
bucketed FileScans (plan-gated in tests/test_plan_shapes.py).  The
write pays one shuffle-equivalent once; every subsequent join reads
co-located buckets.

The reference's closest analog is re-querying one loaded file
repeatedly (csv_tool keeps its DuckDB relation registered across
csv_sql calls); this is the multi-table, multi-query generalization.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def ensure_bucketed_table(
    spark: SparkSession,
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    buckets: int = 16,
    sort: bool = True,
) -> None:
    """Idempotently materialize ``df`` as a bucketed (and bucket-sorted)
    managed table.  No-op when the table already exists in this
    session's catalog; clears an orphaned managed location left by a
    previous session (in-memory metastore) before writing, else
    saveAsTable raises LOCATION_ALREADY_EXISTS."""
    if spark.catalog.tableExists(table_name):
        return
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
    if wh.scheme in ("", "file"):
        shutil.rmtree(f"{wh.path}/{table_name}", ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(
        buckets, *bucket_cols
    )
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table_name)
