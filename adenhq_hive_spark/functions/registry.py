"""UDF/tool registry: named function registration + module discovery
(reference tool_registry.py:34-218 — Tool{name, description, parameters}
records, sync/async executor wrapping, module scanning).

Spark-first, "registering a tool" means registering a UDF into the
session so it becomes callable from any SQL/DataFrame expression; the
registry keeps the reference's metadata shape so a catalog of available
operators can be listed (tool_registry list surface).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession


@dataclass
class ToolSpec:
    name: str
    description: str
    fn: Callable[..., Any]
    return_type: str = "string"
    vectorized: bool = False  # True → pandas_udf (Arrow batches)
    parameters: dict[str, Any] = field(default_factory=dict)


class ToolRegistry:
    """Session-scoped registry of named UDFs."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._tools: dict[str, ToolSpec] = {}

    def register(self, spec: ToolSpec) -> None:
        """Register (or replace) a tool and expose it as a SQL UDF."""
        if spec.vectorized:
            from pyspark.sql.functions import pandas_udf

            udf = pandas_udf(spec.return_type)(spec.fn)
            self.spark.udf.register(spec.name, udf)
        else:
            self.spark.udf.register(spec.name, spec.fn, spec.return_type)
        self._tools[spec.name] = spec

    def register_module(self, module_name: str, attr: str = "TOOLS") -> int:
        """Module discovery (tool_registry.py:130-218): import a module
        and register every ToolSpec in its ``TOOLS`` list."""
        mod = importlib.import_module(module_name)
        specs = getattr(mod, attr, [])
        for spec in specs:
            self.register(spec)
        return len(specs)

    def register_udtf(
        self, name: str, cls: type, return_type: str, description: str = ""
    ) -> None:
        """Register a table function (UDTF): one input row → many output
        rows, callable in SQL FROM/LATERAL position. The reference's
        closest analog is a tool returning a row list (§1.1 envelope);
        here the rows come back as a proper relation."""
        from pyspark.sql.functions import udtf

        wrapped = udtf(cls, returnType=return_type)
        self.spark.udtf.register(name, wrapped)
        self._tools[name] = ToolSpec(
            name=name,
            description=description or f"UDTF {name}",
            fn=cls,
            return_type=return_type,
            vectorized=False,
            parameters={"kind": "udtf"},
        )

    def register_driver_tool(self, spec: ToolSpec) -> None:
        """Catalog-only registration for DRIVER-side tools (e.g. MCP
        server tools behind a process boundary): listed and callable via
        ``spec.fn``, but never exposed as an executor-side UDF — a
        subprocess pipe cannot ship in a closure."""
        self._tools[spec.name] = spec

    def list_tools(self) -> list[dict[str, Any]]:
        return [
            {
                "name": t.name,
                "description": t.description,
                "return_type": t.return_type,
                "vectorized": t.vectorized,
                "parameters": t.parameters,
            }
            for t in sorted(self._tools.values(), key=lambda t: t.name)
        ]

    def __contains__(self, name: str) -> bool:
        return name in self._tools
