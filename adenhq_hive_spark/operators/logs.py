"""Run/decision log analytics (reference runtime_logs_tool.py:83-232 and
builder/query.py performance rollups).

The reference stores three log levels — L1 run summaries, L2 per-node
details, L3 per-step tool logs — as JSON/JSONL and queries them with
filter + sort-desc-by-start + limit (runtime_logs_tool.py:127-138) and
grouped rollups (builder/query.py:366-398, 222-283).  Spark-first, logs
are partitioned Parquet tables and the queries are DataFrame ops; the
same functions serve a 10-run dev log and a petabyte of production runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

RUN_SUMMARY_SCHEMA = T.StructType(  # L1 (summary.json image)
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("agent", T.StringType()),
        T.StructField("status", T.StringType()),  # completed|failed|paused
        T.StructField("started_at", T.TimestampType()),
        T.StructField("finished_at", T.TimestampType()),
        T.StructField("total_tokens", T.LongType()),
    ]
)

NODE_DETAIL_SCHEMA = T.StructType(  # L2 (details.jsonl image)
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("node_id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("latency_ms", T.LongType()),
        T.StructField("tokens", T.LongType()),
        T.StructField("needs_attention", T.BooleanType()),
    ]
)

TOOL_LOG_SCHEMA = T.StructType(  # L3 (tool_logs.jsonl image)
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("node_id", T.StringType()),
        T.StructField("step", T.IntegerType()),
        T.StructField("tool", T.StringType()),
        T.StructField("success", T.BooleanType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def query_runs(
    runs: DataFrame, status: str | None = None, limit: int = 20
) -> DataFrame:
    """L1: filter by status, newest first, capped
    (runtime_logs_tool.py:127-138)."""
    out = runs
    if status is not None:
        out = out.filter(F.col("status") == status)
    return out.orderBy(F.desc("started_at"), "run_id").limit(limit)


def query_node_details(
    details: DataFrame,
    run_id: str,
    node_id: str | None = None,
    needs_attention: bool | None = None,
) -> DataFrame:
    """L2: per-run node details with optional node/attention filters
    (runtime_logs_tool.py:143-186)."""
    out = details.filter(F.col("run_id") == run_id)
    if node_id is not None:
        out = out.filter(F.col("node_id") == node_id)
    if needs_attention is not None:
        out = out.filter(F.col("needs_attention") == needs_attention)
    return out.orderBy("node_id")


def query_tool_logs(
    tool_logs: DataFrame, run_id: str, node_id: str | None = None
) -> DataFrame:
    """L3: per-step tool logs (runtime_logs_tool.py:189-232)."""
    out = tool_logs.filter(F.col("run_id") == run_id)
    if node_id is not None:
        out = out.filter(F.col("node_id") == node_id)
    return out.orderBy("step")


def node_performance(details: DataFrame) -> DataFrame:
    """Per-node rollup: avg latency / tokens / visit count
    (builder/query.py:366-398)."""
    return (
        details.groupBy("node_id")
        .agg(
            F.count("*").alias("n_visits"),
            F.round(F.avg("latency_ms"), 2).alias("avg_latency_ms"),
            F.round(F.avg("tokens"), 2).alias("avg_tokens"),
            F.sum(F.when(F.col("status") == "failed", 1).otherwise(0))
            .cast("long")
            .alias("n_failures"),
        )
        .orderBy("node_id")
    )


def failure_patterns(details: DataFrame, top_k: int = 5) -> DataFrame:
    """Most common failure node (builder/query.py:222-283 pattern)."""
    return (
        details.filter(F.col("status") == "failed")
        .groupBy("node_id")
        .count()
        .withColumnRenamed("count", "n")
        .orderBy(F.desc("n"), "node_id")
        .limit(top_k)
    )


def goal_progress(criteria: DataFrame) -> DataFrame:
    """Weighted goal progress: Σ(weight·met)/Σ(weight) per goal
    (goal.py:155-163; outcome_aggregator.py:225-311).

    ``criteria`` columns: goal_id, weight (double), met (boolean).
    """
    return (
        criteria.groupBy("goal_id")
        .agg(
            F.round(
                F.sum(F.col("weight") * F.col("met").cast("double"))
                / F.sum("weight"),
                4,
            ).alias("progress"),
            F.count("*").alias("n_criteria"),
        )
        .orderBy("goal_id")
    )
