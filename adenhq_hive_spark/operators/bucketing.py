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

import json
import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_SPEC_FILE = "_bucket_spec.json"


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


def save_bucketed_table(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    table_name: str,
    bucket_cols: Sequence[str],
    buckets: int = 16,
    sort: bool = True,
) -> None:
    """Materialize ``df`` as an EXTERNAL bucketed table at an explicit
    ``path``, with a ``_bucket_spec.json`` sidecar carrying the bucket
    spec and schema — the layout that SURVIVES session restart.

    A managed ``saveAsTable`` under the default in-memory catalog
    leaves the data files behind but loses the bucketing METADATA with
    the session, so the next session must rebuild (the r9 probe-index
    gap).  Here the spec travels with the files; a fresh session calls
    :func:`attach_bucketed_table` (one DDL, zero data movement) and
    bucket pruning / shuffle-free joins work immediately.

    The sidecar is written with the local filesystem API — at cluster
    scale swap the two ``open`` calls for the Hadoop FileSystem API (or
    configure a persistent metastore and skip the sidecar entirely);
    the layout and attach DDL are storage-agnostic.
    """
    if spark.catalog.tableExists(table_name):
        spark.sql(f"DROP TABLE `{table_name}`")
    writer = (
        df.write.mode("overwrite")
        .option("path", os.path.abspath(path))
        .bucketBy(buckets, *bucket_cols)
    )
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table_name)
    spec = {
        "bucket_cols": list(bucket_cols),
        "buckets": buckets,
        "sort": sort,
        "schema": df.schema.jsonValue(),
    }
    with open(os.path.join(path, _SPEC_FILE), "w") as f:
        json.dump(spec, f)


def attach_bucketed_table(
    spark: SparkSession, path: str, table_name: str
) -> bool:
    """Register an existing :func:`save_bucketed_table` layout in THIS
    session's catalog — one ``CREATE TABLE ... CLUSTERED BY ... INTO n
    BUCKETS LOCATION path`` DDL, no data read or written.  Returns True
    when the layout existed and was attached (or the table is already
    registered), False when there is nothing to attach (caller builds).

    This is the cross-session amortization step: build once, every
    later session attaches in O(1) and probes with bucket pruning
    (plan-gated in tests/test_search.py)."""
    if spark.catalog.tableExists(table_name):
        return True
    spec_path = os.path.join(path, _SPEC_FILE)
    if not os.path.exists(spec_path):
        return False
    with open(spec_path) as f:
        spec = json.load(f)
    schema = StructType.fromJson(spec["schema"])
    cols = ", ".join(
        f"`{fld.name}` {fld.dataType.simpleString()}"
        for fld in schema.fields
    )
    bcols = ", ".join(f"`{c}`" for c in spec["bucket_cols"])
    sort_clause = f" SORTED BY ({bcols})" if spec["sort"] else ""
    spark.sql(
        f"CREATE TABLE `{table_name}` ({cols}) USING PARQUET "
        f"CLUSTERED BY ({bcols}){sort_clause} "
        f"INTO {spec['buckets']} BUCKETS "
        f"LOCATION '{os.path.abspath(path)}'"
    )
    return True
