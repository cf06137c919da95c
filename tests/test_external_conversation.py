"""Tests for the external row-source/sink adapters and the conversation
store (append-only seq log with cursor reads)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from adenhq_hive_spark.operators.conversation import ConversationStore
from adenhq_hive_spark.sources.external import (
    external_sink,
    external_source,
    rows_to_df,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("title", T.StringType()),
    ]
)


class TestExternal:
    def test_rows_to_df_drops_and_nulls(self, spark):
        df = rows_to_df(
            spark,
            [{"id": 1, "title": "a", "extra": "x"}, {"id": 2}],
            SCHEMA,
        )
        rows = {r.id: r.title for r in df.collect()}
        assert rows == {1: "a", 2: None}
        assert df.columns == ["id", "title"]

    def test_rows_to_df_strict(self, spark):
        with pytest.raises(ValueError, match="extra"):
            rows_to_df(spark, [{"id": 1, "extra": 2}], SCHEMA, strict=True)

    def test_external_source_pagination(self, spark):
        def fetch(page, q):
            return [{"id": page * 10 + i, "title": f"{q}-{i}"} for i in range(2)]

        df = external_source(spark, fetch, SCHEMA, pages=[1, 2, 3], q="spark")
        assert df.count() == 6
        assert df.filter("id = 21").collect()[0].title == "spark-1"

    def test_external_sink_batches(self, spark):
        sent: list[list] = []
        df = rows_to_df(spark, [{"id": i, "title": "t"} for i in range(7)], SCHEMA)
        n = external_sink(df, sent.append, batch_size=3)
        assert n == 7
        assert [len(b) for b in sent] == [3, 3, 1]
        assert sent[0][0] == {"id": 0, "title": "t"}


class TestConversationStore:
    def test_append_seq_and_cursor(self, spark, tmp_path):
        store = ConversationStore(spark, str(tmp_path / "conv"))
        r1 = store.append("c1", [{"role": "user", "content": "hi"},
                                 {"role": "assistant", "content": "hello"}])
        assert (r1["first_seq"], r1["appended"]) == (0, 2)
        r2 = store.append("c1", [{"role": "user", "content": "more"}])
        assert r2["first_seq"] == 2
        store.append("c2", [{"role": "user", "content": "other conv"}])

        page = store.read("c1", after_seq=-1, limit=2)
        assert [m["seq"] for m in page["messages"]] == [0, 1]
        assert page["cursor"] == 1
        rest = store.read("c1", after_seq=page["cursor"])
        assert [m["content"] for m in rest["messages"]] == ["more"]
        # cursor past the end returns empty, cursor unchanged
        empty = store.read("c1", after_seq=99)
        assert empty["count"] == 0 and empty["cursor"] == 99

    def test_distributed_path(self, spark, tmp_path):
        store = ConversationStore(spark, str(tmp_path / "conv"))
        store.append("c1", [{"role": "user", "content": f"m{i}"} for i in range(5)])
        df = store.as_df("c1")
        assert df.count() == 5
        assert df.filter("role = 'user'").count() == 5


def test_render_chat_transcripts_golden(spark):
    import hashlib
    from datetime import datetime

    from adenhq_hive_spark.operators.conversation import (
        render_chat_transcripts,
    )

    t = lambda s: datetime(2026, 1, 1, 0, 0, s)
    rows = [
        # user 1: out-of-order input, ts ties broken by event_id
        (3, t(2), 1, "purchase", '{"x":3}'),
        (1, t(1), 1, "signup", '{"x":1}'),
        (2, t(1), 1, "click", '{"x":2}'),
        # user 2: single unknown-type turn -> default role 'user'
        (4, t(5), 2, "view", '{"y":9}'),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, props string"
    )
    out = {r.user_id: r for r in render_chat_transcripts(df).collect()}
    want1 = '<|system|>{"x":1}\n<|user|>{"x":2}\n<|assistant|>{"x":3}'
    assert out[1].n_turns == 3
    assert out[1].n_chars == len(want1)
    assert out[1].fingerprint == hashlib.md5(want1.encode()).hexdigest()
    want2 = '<|user|>{"y":9}'
    assert out[2].n_turns == 1
    assert out[2].fingerprint == hashlib.md5(want2.encode()).hexdigest()


def test_render_chat_transcripts_empty_role_map_means_all_user(spark):
    """role_map={} is a valid request (no mapping, everything 'user'),
    not a fall-through to the demo defaults."""
    from adenhq_hive_spark.operators.conversation import (
        render_chat_transcripts,
    )

    from pyspark.sql import functions as F

    rows = [("u1", 1, "2024-01-01T00:00:00", "signup", "hi"),
            ("u1", 2, "2024-01-01T00:00:01", "purchase", "buy")]
    df = spark.createDataFrame(
        rows, "user_id string, event_id long, ts string, "
              "event_type string, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    import hashlib
    out = render_chat_transcripts(df, role_map={}).collect()
    expected = "<|user|>hi\n<|user|>buy"
    assert out[0]["fingerprint"] == hashlib.md5(
        expected.encode()
    ).hexdigest()
    defaulted = render_chat_transcripts(df).collect()
    assert defaulted[0]["fingerprint"] != out[0]["fingerprint"]
