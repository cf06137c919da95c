"""Node-boundary checkpointing for GraphRunner (pause / crash / resume).

The reference checkpoints graph executions at node boundaries and resumes
from the recorded cursor (core/framework/graph/executor.py:719-738;
core/framework/storage/checkpoint_store.py:44-112).  The Spark-first
mapping: scalar memory + the traversal cursor (steps, queue) go to a JSON
manifest; DataFrame memory values are materialized as Parquet — which
doubles as a lineage-truncation barrier, exactly what a node-boundary
checkpoint buys on a cluster (a resumed run re-reads columnar files
instead of replaying the upstream DAG).

Write protocol: Parquet per key first, then the manifest via
write-tmp-and-rename, so a crash mid-checkpoint leaves the previous
manifest (and its consistent Parquet set) intact.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession


class CheckpointError(RuntimeError):
    pass


def _safe(key: str) -> str:
    return re.sub(r"[^A-Za-z0-9_.-]", "_", key)


class CheckpointStore:
    """Persists GraphRunner state at node boundaries.

    Layout::

        <dir>/state.json            traversal cursor + scalar memory
        <dir>/df_<key>.parquet      one directory per DataFrame memory key
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)
        # identity of the DataFrame object already persisted per key, so
        # unchanged keys are not rewritten every step
        self._persisted: dict[str, int] = {}

    @property
    def manifest_path(self) -> str:
        return os.path.join(self.path, "state.json")

    def exists(self) -> bool:
        return os.path.exists(self.manifest_path)

    def save(
        self,
        memory: dict[str, Any],
        steps: list[str],
        queue: list[str],
        completed: bool,
    ) -> dict[str, Any]:
        """Persist state; returns ``memory`` with every DataFrame swapped
        for its Parquet-backed read (lineage truncation). A plain dict is
        copied; any other MutableMapping (e.g. a shared-state view) is
        updated in place so its scope semantics survive."""
        out = dict(memory) if isinstance(memory, dict) else memory
        df_keys: list[str] = []
        for key, value in memory.items():
            if not isinstance(value, DataFrame):
                continue
            df_keys.append(key)
            target = os.path.join(self.path, f"df_{_safe(key)}.parquet")
            if self._persisted.get(key) == id(value):
                continue  # unchanged since last boundary
            value.write.mode("overwrite").parquet(target)
            reread = self.spark.read.parquet(target)
            out[key] = reread
            self._persisted[key] = id(reread)
        scalars = {k: v for k, v in out.items() if k not in df_keys}
        try:
            scalars_json = json.dumps(scalars)
        except TypeError as exc:
            raise CheckpointError(
                f"non-JSON-serializable scalar in graph memory: {exc}"
            ) from exc
        state = {
            "steps": steps,
            "queue": queue,
            "completed": completed,
            "df_keys": df_keys,
            "scalars": json.loads(scalars_json),
        }
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self.manifest_path)
        return out

    def load(self) -> tuple[dict[str, Any], list[str], list[str], bool]:
        """Rebuild (memory, steps, queue, completed) from the manifest."""
        if not self.exists():
            raise CheckpointError(f"no checkpoint at {self.path}")
        with open(self.manifest_path) as f:
            state = json.load(f)
        memory: dict[str, Any] = dict(state["scalars"])
        for key in state["df_keys"]:
            target = os.path.join(self.path, f"df_{_safe(key)}.parquet")
            df = self.spark.read.parquet(target)
            memory[key] = df
            self._persisted[key] = id(df)
        return memory, state["steps"], state["queue"], state["completed"]
