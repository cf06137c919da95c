"""JSON repair tests — the malformed-JSON corpus of FIXTURES.md §B.3
(markdown fences, Python literals, single quotes, unescaped newlines,
prose-wrapped objects)."""

from __future__ import annotations

from adenhq_hive_spark.functions.json_repair import (
    find_json_object,
    repair_json,
    repair_json_udf,
)


def test_clean_json_passthrough():
    assert repair_json('{"a": 1, "b": [2, 3]}') == {"a": 1, "b": [2, 3]}


def test_markdown_fence():
    assert repair_json('```json\n{"a": 1}\n```') == {"a": 1}
    assert repair_json('```\n{"a": 1}\n```') == {"a": 1}


def test_python_literals():
    assert repair_json("{\"ok\": True, \"x\": None, \"y\": False}") == {
        "ok": True, "x": None, "y": False,
    }


def test_python_literal_not_inside_strings():
    assert repair_json('{"msg": "True story"}') == {"msg": "True story"}


def test_single_quotes():
    assert repair_json("{'a': 1, 'b': 'two'}") == {"a": 1, "b": "two"}


def test_unescaped_newline_in_value():
    assert repair_json('{"a": "line1\nline2"}') == {"a": "line1\nline2"}


def test_prose_wrapped():
    text = 'Sure! Here is the result: {"a": 1, "nested": {"b": 2}} Hope it helps.'
    assert repair_json(text) == {"a": 1, "nested": {"b": 2}}


def test_array_extraction():
    assert repair_json("the list is [1, 2, 3] ok") == [1, 2, 3]


def test_combined_horrors():
    text = "```json\n{'ok': True, 'note': 'first\nsecond'}\n```"
    assert repair_json(text) == {"ok": True, "note": "first\nsecond"}


def test_unrecoverable_returns_none():
    assert repair_json("no json here at all") is None
    assert repair_json("{broken: [") is None


def test_find_json_object_respects_strings():
    text = '{"a": "has } brace", "b": 1}'
    assert find_json_object("x " + text + " y") == text


def test_repair_udf(spark):
    df = spark.createDataFrame(
        [(1, "```json\n{'a': True}\n```"), (2, "garbage"), (3, '{"b": 2}')],
        ["id", "raw"],
    )
    out = {
        r.id: r.clean
        for r in df.select("id", repair_json_udf()("raw").alias("clean")).collect()
    }
    assert out[1] == '{"a": true}'
    assert out[2] is None
    assert out[3] == '{"b": 2}'
