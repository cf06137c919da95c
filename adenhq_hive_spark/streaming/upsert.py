"""Streaming CDC upsert sink: merge each micro-batch into a keyed
parquet store (last-writer-wins per key) — the continuous counterpart of
``operators.curation.snapshot_diff``: diff answers "what changed between
snapshots", this sink maintains the current snapshot as changes stream
in (the reference's conversation/outcome stores are append-only logs
with driver-side reducers; a keyed current-state table is the
Spark-native image of that state).

Scale notes:

- The merge itself is one left-anti join per micro-batch (existing keys
  not present in the batch survive, batch rows win) — hash-partitioned
  on the key, AQE-handled, no driver-side state.
- The store is rewritten atomically via a versioned directory + a
  _CURRENT pointer file rather than in-place overwrite: readers never
  observe a half-written store, and Spark never reads the directory it
  is writing (self-overwrite corrupts).
- At 100 TB-store scale the same merge shape targets a format with
  native MERGE (Delta/Iceberg); the anti-join + rewrite here IS the
  transaction those formats run internally, so the operator carries to
  them unchanged. Rewrite cost is O(store); partition the store and
  prune to the touched partitions when keys are partition-aligned.
- In-batch duplicate keys resolve by a deterministic rule BEFORE the
  merge (highest ``seq_col`` wins, ties to the rule's ordering) so the
  result never depends on micro-batch internal ordering.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_CURRENT = "_CURRENT"


def _store_version_path(path: str) -> str | None:
    marker = os.path.join(path, _CURRENT)
    if not os.path.exists(marker):
        return None
    with open(marker, encoding="utf-8") as f:
        v = f.read().strip()
    return os.path.join(path, v) if v else None


def read_store(spark: SparkSession, path: str) -> DataFrame | None:
    """Current state of an upsert store, or None before the first
    batch."""
    vp = _store_version_path(path)
    if vp is None:
        return None
    return spark.read.parquet(vp)


def _merge_batch(
    batch_df: DataFrame,
    path: str,
    key_col: str,
    seq_col: str,
    epoch_id: int,
) -> None:
    spark = batch_df.sparkSession
    # deterministic in-batch resolution: highest seq wins per key
    w = Window.partitionBy(key_col).orderBy(
        F.col(seq_col).desc(), *[
            F.col(c) for c in batch_df.columns if c not in (key_col, seq_col)
        ]
    )
    latest = (
        batch_df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    existing = read_store(spark, path)
    if existing is not None:
        survivors = existing.join(
            latest.select(key_col), key_col, "left_anti"
        )
        merged = survivors.unionByName(latest)
    else:
        merged = latest
    new_version = f"v{epoch_id}"
    out_dir = os.path.join(path, new_version)
    merged.write.mode("overwrite").parquet(out_dir)
    tmp = os.path.join(path, f".{_CURRENT}.tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(new_version)
    os.replace(tmp, os.path.join(path, _CURRENT))


def upsert_stream(
    stream: DataFrame,
    path: str,
    key_col: str = "doc_id",
    seq_col: str = "ts",
):
    """foreachBatch writer maintaining a keyed last-writer-wins store at
    ``path``. Use ``read_store`` for the current state. Returns the
    DataStreamWriter (caller starts it; pair with a checkpoint for
    resume — replayed batches re-merge idempotently because merging is
    keyed, not append)."""
    os.makedirs(path, exist_ok=True)

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        _merge_batch(batch_df, path, key_col, seq_col, epoch_id)

    return stream.writeStream.foreachBatch(write)


def list_versions(path: str) -> list[str]:
    """All retained store versions, oldest first, plus which is current.

    Every merge writes a NEW ``v{epoch}`` directory and flips the
    ``_CURRENT`` pointer — old versions stay on disk until a retention
    job removes them, which is what makes :func:`read_version` time
    travel possible (the Delta/Iceberg snapshot pattern, file-layout
    edition). Returns version names sorted by epoch number.
    """
    if not os.path.isdir(path):
        return []
    vs = [
        d for d in os.listdir(path)
        if d.startswith("v") and d[1:].isdigit()
        and os.path.isdir(os.path.join(path, d))
    ]
    return sorted(vs, key=lambda v: int(v[1:]))


def read_version(
    spark: SparkSession, path: str, version: str
) -> DataFrame:
    """Read a specific retained store version (time travel) — the state
    as of that merge epoch, immutable after write. Raises KeyError for
    unknown versions (including already-vacuumed ones)."""
    if version not in list_versions(path):
        raise KeyError(
            f"version {version!r} not found in {path!r}; "
            f"available: {list_versions(path)}"
        )
    return spark.read.parquet(os.path.join(path, version))


def vacuum_store(path: str, keep_last: int = 2) -> list[str]:
    """Drop all but the newest ``keep_last`` versions (never the one
    ``_CURRENT`` points at). Returns the removed version names. The
    retention counterpart of time travel — old snapshots cost storage
    linear in state size."""
    import shutil

    vs = list_versions(path)
    current = None
    marker = os.path.join(path, _CURRENT)
    if os.path.exists(marker):
        with open(marker, encoding="utf-8") as f:
            current = f.read().strip()
    doomed = [v for v in vs[:-keep_last] if v != current] if keep_last else [
        v for v in vs if v != current
    ]
    for v in doomed:
        shutil.rmtree(os.path.join(path, v), ignore_errors=True)
    return doomed
