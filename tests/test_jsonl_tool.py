"""JSONL tool tests: pagination, nested schema, corrupt-line tolerance,
read-only SQL gate, round-trip, distributed partitioned export."""

from __future__ import annotations

import json

import pytest

from adenhq_hive_spark.sources.jsonl_tool import (
    jsonl_append,
    jsonl_info,
    jsonl_read,
    jsonl_sql,
    jsonl_write,
    write_jsonl_dataset,
)


@pytest.fixture()
def sample(tmp_path):
    p = tmp_path / "docs.jsonl"
    rows = [
        {"doc_id": i, "text": f"doc {i}", "meta": {"lang": "en", "n": i * 10}}
        for i in range(10)
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    return str(p)


def test_read_paginated_nested(spark, sample):
    res = jsonl_read(spark, sample, limit=4, offset=8)
    assert res["success"]
    assert res["total_rows"] == 10
    assert res["row_count"] == 2 and not res["has_more"]
    # nested struct preserved through the envelope
    metas = {r["doc_id"]: r["meta"] for r in res["rows"]}
    assert metas[9] == {"lang": "en", "n": 90}
    missing = jsonl_read(spark, sample + ".nope")
    assert not missing["success"]


def test_write_append_roundtrip(spark, tmp_path):
    p = str(tmp_path / "out.jsonl")
    assert jsonl_write(spark, p, [{"a": 1}, {"a": 2}])["success"]
    assert jsonl_append(spark, p, [{"a": 3}])["success"]
    res = jsonl_read(spark, p, limit=10)
    assert [r["a"] for r in res["rows"]] == [1, 2, 3]
    assert not jsonl_append(spark, p + ".nope", [{"a": 1}])["success"]


def test_info_counts_corrupt_lines(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text('{"a": 1}\nnot json at all\n{"a": 2}\n')
    info = jsonl_info(spark, str(p))
    assert info["success"]
    assert info["row_count"] == 3  # corrupt line surfaces as a row...
    assert info["corrupt_lines"] == 1  # ...flagged, not a scan failure
    good = jsonl_info(spark, str(p).replace("bad", "missing"))
    assert not good["success"]


def test_sql_gated_and_aggregates(spark, sample):
    res = jsonl_sql(
        spark,
        sample,
        "SELECT meta.lang AS lang, COUNT(*) AS n, SUM(meta.n) AS total "
        "FROM data GROUP BY meta.lang",
    )
    assert res["success"]
    assert res["rows"] == [{"lang": "en", "n": 10, "total": 450}]
    gated = jsonl_sql(spark, sample, "DROP TABLE data")
    assert not gated["success"] and "read-only" in gated["error"].lower()


def test_write_jsonl_dataset_partitioned_export(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", "train"), (2, "b", "train"), (3, "c", "test")],
        ["doc_id", "text", "split"],
    )
    out = str(tmp_path / "corpus")
    write_jsonl_dataset(df, out, partition_cols=("split",))
    back = spark.read.json(out)
    assert back.count() == 3
    # partition pruning: one split reads only its directory
    train = spark.read.json(out + "/split=train")
    assert train.count() == 2


def test_read_gzip_compressed(spark, tmp_path):
    """Real dumps arrive compressed; the .gz path must read identically
    (Spark decompresses by extension, no flag needed)."""
    import gzip

    p = tmp_path / "c.jsonl.gz"
    with gzip.open(p, "wt", encoding="utf-8") as f:
        for i in range(5):
            f.write(json.dumps({"doc_id": i, "text": f"d{i}"}) + "\n")
    res = jsonl_read(spark, str(p), limit=10)
    assert res["success"] and res["total_rows"] == 5
    assert sorted(r["doc_id"] for r in res["rows"]) == list(range(5))
