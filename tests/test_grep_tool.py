"""grep_search parity tests (reference grep_search/grep_search.py:12-100):
single-file and directory scans, recursion, line numbers, the invalid-regex
early error, and the missing-path error envelope."""

from __future__ import annotations

import pytest

from adenhq_hive_spark.sources.grep_tool import grep_df, grep_search


@pytest.fixture()
def tree(tmp_path):
    (tmp_path / "a.py").write_text("import os\nx = 1\nimport sys\n")
    (tmp_path / "b.txt").write_text("no imports here\nTODO: fix\n")
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "c.py").write_text("import re\n")
    return tmp_path


def test_grep_single_file(spark, tree):
    out = grep_search(spark, str(tree / "a.py"), r"^import ")
    assert out["success"]
    assert out["total_matches"] == 2
    got = sorted((m["line_number"], m["line_content"]) for m in out["matches"])
    assert got == [(1, "import os"), (3, "import sys")]


def test_grep_directory_nonrecursive_vs_recursive(spark, tree):
    flat = grep_search(spark, str(tree), r"^import ")
    assert flat["total_matches"] == 2  # a.py only; sub/ not descended
    deep = grep_search(spark, str(tree), r"^import ", recursive=True)
    assert deep["total_matches"] == 3
    files = {m["file"] for m in deep["matches"]}
    assert any(f.endswith("c.py") for f in files)


def test_grep_relative_display_paths(spark, tree):
    out = grep_search(spark, str(tree), r"TODO")
    assert out["matches"][0]["file"] == "b.txt"
    assert out["matches"][0]["line_number"] == 2


def test_grep_invalid_regex_early_error(spark, tree):
    out = grep_search(spark, str(tree), r"[unclosed")
    assert "Invalid regex pattern" in out["error"]


def test_grep_missing_path(spark, tree):
    out = grep_search(spark, str(tree / "nope"), r"x")
    assert "not found" in out["error"]


def test_grep_df_is_declarative_and_composable(spark, tree):
    df = grep_df(spark, str(tree), r"=", recursive=True)
    assert df.columns == ["file", "line_number", "line_content"]
    # composes with further DataFrame ops (the Spark-first point)
    assert df.groupBy("file").count().count() == 1


def test_grep_df_glob_filter(spark, tree):
    df = grep_df(spark, str(tree), r".", recursive=True, glob="*.py")
    files = {r.file for r in df.select("file").distinct().collect()}
    assert len(files) == 2
    assert all(f.endswith(".py") for f in files)


def test_grep_path_with_spaces_decoded(spark, tmp_path):
    """input_file_name() percent-encodes the file URI; the display path
    must come back decoded."""
    d = tmp_path / "my dir"
    d.mkdir()
    (d / "a file.txt").write_text("needle here\n")
    out = grep_search(spark, str(d), "needle")
    assert out["total_matches"] == 1
    assert out["matches"][0]["file"] == "a file.txt"
