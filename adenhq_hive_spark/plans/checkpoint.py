"""Node-boundary checkpointing for GraphRunner (pause / crash / resume).

The reference checkpoints graph executions at node boundaries and resumes
from the recorded cursor (core/framework/graph/executor.py:719-738;
core/framework/storage/checkpoint_store.py:44-112).  The Spark-first
mapping: scalar memory + the traversal cursor (steps, queue) go to a JSON
manifest; DataFrame memory values are materialized as Parquet — which
doubles as a lineage-truncation barrier, exactly what a node-boundary
checkpoint buys on a cluster (a resumed run re-reads columnar files
instead of replaying the upstream DAG).

Write protocol (crash-atomic): every changed DataFrame key is written to
a NEW versioned directory (``df_<key>_v<N>.parquet``) — never over a
directory the current manifest references — then the manifest (which
records the exact path per key) is swapped in via write-tmp-and-rename,
and only then are unreferenced parquet dirs garbage-collected.  A crash
at any point leaves the previous manifest pointing at its own intact
parquet set.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any

from pyspark.sql import DataFrame, SparkSession


class CheckpointError(RuntimeError):
    pass


def _safe(key: str) -> str:
    return re.sub(r"[^A-Za-z0-9_.-]", "_", key)


class CheckpointStore:
    """Persists GraphRunner state at node boundaries.

    Layout::

        <dir>/state.json                 traversal cursor + scalar memory
        <dir>/df_<key>_v<N>.parquet      one directory per DataFrame key,
                                         new version per changed save
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)
        # Strong reference to the DataFrame object persisted per key, so
        # unchanged keys are not rewritten every step.  Holding the object
        # itself (compared with ``is``) — not its id() — means a freed
        # DataFrame can never alias a new one through address reuse.
        self._persisted: dict[str, DataFrame] = {}
        # key -> parquet path recorded in the live manifest
        self._paths: dict[str, str] = {}
        self._ver = 0

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
        new_paths: dict[str, str] = {}
        for key, value in memory.items():
            if not isinstance(value, DataFrame):
                continue
            df_keys.append(key)
            if value is self._persisted.get(key):
                # unchanged since last boundary: keep the recorded path
                new_paths[key] = self._paths[key]
                continue
            self._ver += 1
            rel = f"df_{_safe(key)}_v{self._ver}.parquet"
            value.write.mode("overwrite").parquet(
                os.path.join(self.path, rel)
            )
            reread = self.spark.read.parquet(os.path.join(self.path, rel))
            out[key] = reread
            self._persisted[key] = reread
            new_paths[key] = rel
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
            "df_paths": new_paths,
            "ver": self._ver,
            "scalars": json.loads(scalars_json),
        }
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self.manifest_path)
        self._paths = new_paths
        self._gc(set(new_paths.values()))
        return out

    def _gc(self, live: set[str]) -> None:
        """Remove parquet dirs no manifest references (best-effort; runs
        only AFTER the new manifest is live, so a crash during GC leaves
        orphan dirs, never dangling references)."""
        for name in os.listdir(self.path):
            if (
                name.startswith("df_")
                and name.endswith(".parquet")
                and name not in live
            ):
                shutil.rmtree(os.path.join(self.path, name),
                              ignore_errors=True)

    def load(self) -> tuple[dict[str, Any], list[str], list[str], bool]:
        """Rebuild (memory, steps, queue, completed) from the manifest."""
        if not self.exists():
            raise CheckpointError(f"no checkpoint at {self.path}")
        with open(self.manifest_path) as f:
            state = json.load(f)
        memory: dict[str, Any] = dict(state["scalars"])
        # pre-versioning manifests recorded only df_keys at fixed paths
        paths = state.get(
            "df_paths",
            {k: f"df_{_safe(k)}.parquet" for k in state["df_keys"]},
        )
        self._ver = state.get("ver", 0)
        for key in state["df_keys"]:
            df = self.spark.read.parquet(
                os.path.join(self.path, paths[key])
            )
            memory[key] = df
            self._persisted[key] = df
        self._paths = dict(paths)
        return memory, state["steps"], state["queue"], state["completed"]
