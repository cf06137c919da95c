"""Conversation / message-log store (reference conversation.py:12-52,
conversation_store.py:27-110).

The reference persists conversations as append-only, sequence-numbered
JSONL parts with a read cursor.  Spark-first: a conversation is an
append-only parquet log partitioned by conversation id; sequence numbers
are assigned per-append (max+1 within the conversation), and the cursor
is just a ``seq > n`` predicate — which partition-prunes + filter-pushes
instead of seeking bytes.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MESSAGE_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("role", T.StringType()),       # user|assistant|tool
        T.StructField("content", T.StringType()),
        T.StructField("tool_calls", T.StringType()),  # JSON string or NULL
    ]
)


class ConversationStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _exists(self) -> bool:
        return any(
            name.startswith("conv_id=") or name.endswith(".parquet")
            for name in os.listdir(self.root)
        )

    def _all(self) -> DataFrame:
        if not self._exists():
            return self.spark.createDataFrame([], MESSAGE_SCHEMA)
        return self.spark.read.schema(MESSAGE_SCHEMA).parquet(self.root)

    def append(
        self, conv_id: str, messages: list[dict[str, Any]]
    ) -> dict[str, Any]:
        """Append messages with per-conversation sequence numbers
        (append-only, seq-numbered — conversation.py:12-52)."""
        current = (
            self._all()
            .filter(F.col("conv_id") == conv_id)
            .agg(F.max("seq"))
            .collect()[0][0]
        )
        start = (current if current is not None else -1) + 1
        rows = [
            (
                conv_id,
                start + i,
                m.get("role", "user"),
                m.get("content", ""),
                m.get("tool_calls"),
            )
            for i, m in enumerate(messages)
        ]
        df = self.spark.createDataFrame(rows, MESSAGE_SCHEMA)
        df.write.mode("append").partitionBy("conv_id").parquet(self.root)
        return {"success": True, "conv_id": conv_id,
                "first_seq": start, "appended": len(rows)}

    def read(
        self, conv_id: str, after_seq: int = -1, limit: int = 1000
    ) -> dict[str, Any]:
        """Cursor read: messages with seq > after_seq, in order
        (conversation_store.py cursor semantics; the conv_id partition
        filter prunes, the seq filter pushes down)."""
        df = (
            self._all()
            .filter((F.col("conv_id") == conv_id) & (F.col("seq") > after_seq))
            .orderBy("seq")
            .limit(limit)
        )
        rows = [r.asDict() for r in df.collect()]
        return {
            "success": True,
            "conv_id": conv_id,
            "messages": rows,
            "count": len(rows),
            "cursor": rows[-1]["seq"] if rows else after_seq,
        }

    def as_df(self, conv_id: str | None = None) -> DataFrame:
        """Distributed path: the conversation log as a DataFrame (for
        analytics over message histories — the documents-table shape)."""
        df = self._all()
        return df if conv_id is None else df.filter(F.col("conv_id") == conv_id)


def render_chat_transcripts(
    df: DataFrame,
    conv_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    content_col: str = "props",
    role_map: dict[str, str] | None = None,
) -> DataFrame:
    """Chat-SFT formatting: render per-conversation event streams into a
    single role-tagged transcript — the deterministic template stage
    between raw logs and sequence packing in a training-data pipeline
    (each turn becomes ``<|role|>content``, turns joined by newlines in
    (ts, id) order).

    Shape: one groupBy on the conversation key; the per-key transcript
    is assembled JVM-side (sort_array over (ts, id, line) structs →
    transform → array_join), so ordering is total and engine-portable
    (DuckDB twin: ``string_agg(line, chr(10) ORDER BY ts, id)``). A
    transcript must fit in a row — the chat-transcript contract; for
    corpora with pathological conversation lengths, cap turns per key
    upstream (events-table sessions are bounded by construction).

    Output: (conv_col, n_turns, n_chars, fingerprint) — the md5
    fingerprint stands in for the rendered text so downstream equality
    (dedup, split routing) never moves the transcript itself.
    """
    if role_map is None:  # {} is a valid request: everything is 'user'
        role_map = {
            "signup": "system",
            "purchase": "assistant",
            "error": "tool",
        }
    roles = role_map
    expr = None
    for k, v in roles.items():
        cond = F.col(type_col) == k
        expr = F.when(cond, v) if expr is None else expr.when(cond, v)
    role = expr.otherwise("user") if expr is not None else F.lit("user")
    line = F.concat(F.lit("<|"), role, F.lit("|>"), F.col(content_col))
    per_turn = df.select(
        F.col(conv_col),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
        line.alias("_line"),
    )
    rendered = F.array_join(
        F.transform(
            F.sort_array(F.collect_list(F.struct("_ts", "_id", "_line"))),
            lambda s: s["_line"],
        ),
        "\n",
    )
    return (
        per_turn.groupBy(conv_col)
        .agg(
            F.count("*").alias("n_turns"),
            rendered.alias("_r"),
        )
        .select(
            conv_col,
            "n_turns",
            F.length("_r").cast("long").alias("n_chars"),
            F.md5("_r").alias("fingerprint"),
        )
    )
