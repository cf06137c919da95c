"""Spillover / intermediate-result store (reference data_tools.py:24-377).

The reference writes large intermediate tool results to files and pages
them back with byte-offset reads (data_tools.py:132-157).  Spark-first,
the intermediate store is a Parquet directory per key: columnar,
splittable, schema-carrying — pagination becomes offset/limit on a
DataFrame (no byte-boundary trimming needed), appends are native
(``mode=append``), and a 100 TB intermediate is just as listable as a
1 MB one.
"""

from __future__ import annotations

import os
import shutil
from typing import Any

from pyspark.sql import DataFrame, SparkSession


class DataStore:
    """Parquet-backed keyed store for intermediate results."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, key: str) -> str:
        safe = "".join(c if c.isalnum() or c in "-_." else "_" for c in key)
        return os.path.join(self.root, safe)

    def save_data(self, key: str, df: DataFrame, mode: str = "overwrite") -> dict[str, Any]:
        df.write.mode(mode).parquet(self._path(key))
        return {"success": True, "key": key, "path": self._path(key)}

    def append_data(self, key: str, df: DataFrame) -> dict[str, Any]:
        if not os.path.exists(self._path(key)):
            return {"success": False, "error": f"No data for key: {key}"}
        df.write.mode("append").parquet(self._path(key))
        return {"success": True, "key": key}

    def load_data(
        self, key: str, limit: int = 1000, offset: int = 0
    ) -> dict[str, Any]:
        """Paginated load (offset/limit ≈ the reference's byte-seek reads,
        but row-exact and schema-aware)."""
        path = self._path(key)
        if not os.path.exists(path):
            return {"success": False, "error": f"No data for key: {key}"}
        df = self.spark.read.parquet(path)
        sliced = df.offset(offset).limit(limit) if offset else df.limit(limit)
        rows = [r.asDict(recursive=True) for r in sliced.collect()]
        total = df.count()
        return {
            "success": True,
            "key": key,
            "columns": list(df.columns),
            "rows": rows,
            "row_count": len(rows),
            "total_rows": total,
            "offset": offset,
            "has_more": offset + len(rows) < total,
        }

    def load_df(self, key: str) -> DataFrame:
        """The distributed path: hand the intermediate back as a DataFrame."""
        return self.spark.read.parquet(self._path(key))

    def list_data_files(self) -> dict[str, Any]:
        entries = []
        for name in sorted(os.listdir(self.root)):
            p = os.path.join(self.root, name)
            if os.path.isdir(p):
                size = sum(
                    os.path.getsize(os.path.join(dp, f))
                    for dp, _, fs in os.walk(p)
                    for f in fs
                )
                entries.append({"key": name, "size_bytes": size})
        return {"success": True, "files": entries, "count": len(entries)}

    def delete_data(self, key: str) -> dict[str, Any]:
        path = self._path(key)
        if not os.path.exists(path):
            return {"success": False, "error": f"No data for key: {key}"}
        shutil.rmtree(path)
        return {"success": True, "key": key}

    def compact(self, key: str, target_file_bytes: int = 128 * 1024 * 1024
                ) -> dict[str, Any]:
        """Compact a key's small files into ~target-sized parquet files.

        The small-file problem is the classic failure mode of streaming/
        append-heavy stores at scale (every foreachBatch append adds
        files; a million 1 MB files kill scan planning). Rewrites through
        a staging directory then swaps, so readers never see a partial
        state on local filesystems.
        """
        path = self._path(key)
        if not os.path.exists(path):
            return {"success": False, "error": f"No data for key: {key}"}
        size = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(path)
            for f in fs
        )
        n_before = sum(
            1 for dp, _, fs in os.walk(path) for f in fs if f.endswith(".parquet")
        )
        n_files = max(1, -(-size // target_file_bytes))  # ceil division
        staging = path + "__compact_tmp"
        self.spark.read.parquet(path).coalesce(n_files).write.mode(
            "overwrite"
        ).parquet(staging)
        old = path + "__old"
        os.rename(path, old)
        os.rename(staging, path)
        shutil.rmtree(old)
        return {
            "success": True,
            "key": key,
            "files_before": n_before,
            "files_after": n_files,
        }

    def truncate_with_spillover(
        self, key: str, df: DataFrame, max_rows: int = 100,
        max_chars: int = 3_000,
    ) -> dict[str, Any]:
        """Result-size control (event_loop_node.py:88-89, 1943-2040 image):
        return at most ``max_rows`` rows with long string cells truncated
        to ``max_chars``; the FULL untruncated result is spilled to the
        store under ``key`` for paginated retrieval."""
        from pyspark.sql import functions as F

        self.save_data(key, df)
        truncated_cols = [
            F.when(
                F.length(c) > max_chars,
                F.concat(F.substring(F.col(c), 1, max_chars), F.lit("…")),
            ).otherwise(F.col(c)).alias(c)
            if t == "string" else F.col(c)
            for c, t in df.dtypes
        ]
        preview = df.select(*truncated_cols).limit(max_rows + 1).collect()
        rows = [r.asDict(recursive=True) for r in preview[:max_rows]]
        return {
            "success": True,
            "rows": rows,
            "row_count": len(rows),
            "truncated": len(preview) > max_rows,
            "spillover_key": key,
        }
