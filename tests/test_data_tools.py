"""DataStore (spillover/intermediate results) tests — pagination, append,
listing, the distributed load_df path."""

from __future__ import annotations

import pytest

from adenhq_hive_spark.sources.data_tools import DataStore


@pytest.fixture()
def store(spark, tmp_path):
    return DataStore(spark, str(tmp_path / "store"))


@pytest.fixture()
def numbers(spark):
    return spark.range(100).withColumnRenamed("id", "n")


def test_save_load_paginated(store, numbers):
    assert store.save_data("nums", numbers)["success"]
    page = store.load_data("nums", limit=10, offset=95)
    assert page["success"]
    assert page["total_rows"] == 100
    assert page["row_count"] == 5
    assert not page["has_more"]
    assert page["columns"] == ["n"]


def test_append(store, numbers, spark):
    store.save_data("nums", numbers)
    store.append_data("nums", spark.range(5).withColumnRenamed("id", "n"))
    assert store.load_data("nums", limit=1)["total_rows"] == 105
    missing = store.append_data("nope", numbers)
    assert not missing["success"]


def test_load_df_distributed_path(store, numbers):
    store.save_data("nums", numbers)
    df = store.load_df("nums")
    assert df.count() == 100
    assert df.filter("n < 10").count() == 10


def test_list_and_delete(store, numbers):
    store.save_data("a", numbers.limit(3))
    store.save_data("b", numbers.limit(4))
    listing = store.list_data_files()
    assert listing["count"] == 2
    assert {e["key"] for e in listing["files"]} == {"a", "b"}
    assert all(e["size_bytes"] > 0 for e in listing["files"])
    assert store.delete_data("a")["success"]
    assert store.list_data_files()["count"] == 1
    assert not store.load_data("a")["success"]


def test_key_sanitization(store, numbers):
    store.save_data("weird/key name!", numbers.limit(2))
    got = store.load_data("weird/key name!")
    assert got["success"] and got["total_rows"] == 2


def test_compact_small_files(store, spark):
    # simulate append-heavy usage: many tiny files
    for i in range(6):
        store.save_data("frag", spark.range(i * 10, i * 10 + 10), mode="append") \
            if i else store.save_data("frag", spark.range(0, 10))
    before = store.load_data("frag", limit=1)["total_rows"]
    res = store.compact("frag")
    assert res["success"]
    assert res["files_after"] < res["files_before"]
    after = store.load_df("frag")
    assert after.count() == before
    assert sorted(r.id for r in after.collect()) == list(range(60))
    missing = store.compact("nope")
    assert not missing["success"]


# ---- text-artifact surface (reference data_tools.py:173-228, 313-377) ------


def test_save_text_and_serve(store):
    assert store.save_text("report.html", "<h1>hi</h1>")["success"]
    out = store.serve_file_to_user("report.html", label="Report")
    assert out["success"]
    assert out["file_uri"].startswith("file:///")
    assert out["file_uri"].endswith("/report.html")
    assert out["label"] == "Report"
    # default label falls back to the filename
    assert store.serve_file_to_user("report.html")["label"] == "report.html"
    # missing file and path traversal are rejected
    assert "error" in store.serve_file_to_user("nope.html")
    assert "error" in store.serve_file_to_user("../etc/passwd")


def test_edit_data_unique_match(store):
    store.save_text("doc.txt", "alpha PLACEHOLDER omega")
    out = store.edit_data("doc.txt", "PLACEHOLDER", "beta")
    assert out["success"] and out["replacements"] == 1
    assert store.edit_data("doc.txt", "beta", "beta gamma")["success"]
    loaded = store.serve_file_to_user("doc.txt")
    with open(loaded["file_path"], encoding="utf-8") as f:
        assert f.read() == "alpha beta gamma omega"


def test_edit_data_rejects_zero_and_multi_match(store):
    store.save_text("doc.txt", "x y x")
    assert "not found" in store.edit_data("doc.txt", "zzz", "w")["error"]
    assert "2 times" in store.edit_data("doc.txt", "x", "w")["error"]
    assert "error" in store.edit_data("missing.txt", "a", "b")
    assert "error" in store.edit_data("../doc.txt", "a", "b")
