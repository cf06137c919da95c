"""Data-contract validator tests: constructed violations per rule kind,
single-scan aggregation shape, unknown-rule error."""

from __future__ import annotations

import pytest

from adenhq_hive_spark.operators.contract import (
    Rule,
    accepted_range,
    accepted_values,
    not_null,
    refers_to,
    unique,
    validate_contract,
)


def test_each_rule_counts_violations(spark):
    df = spark.createDataFrame(
        [(1, "en", 10), (2, "en", -5), (2, "xx", 20),
         (None, "de", 999999), (4, None, 30)],
        "id long, lang string, size long",
    )
    out = {r.rule: r for r in validate_contract(df, [
        not_null("id"),
        unique("id"),
        accepted_values("lang", ["en", "de"]),
        accepted_range("size", 0, 1000),
    ]).collect()}
    assert out["not_null(id)"].n_violations == 1
    assert out["unique(id)"].n_violations == 1      # id 2 twice
    assert out["accepted_values(lang)"].n_violations == 1   # 'xx'; null ok
    assert out["accepted_range(size)"].n_violations == 2    # -5, 999999
    assert not any(r.ok for r in out.values())


def test_refers_to_dangling_keys(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    out = validate_contract(
        child, [refers_to("fk", parent, "pk")]
    ).collect()[0]
    assert out.n_violations == 1            # 99 dangles; null exempt
    assert not out.ok


def test_clean_table_passes_and_order_preserved(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    rules = [unique("id"), not_null("v"), accepted_values("v", ["a", "b"])]
    out = validate_contract(df, rules).collect()
    assert [r.rule for r in out] == [r.name for r in rules]
    assert all(r.ok and r.n_violations == 0 for r in out)


def test_unknown_rule_kind_raises(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="unknown rule"):
        validate_contract(df, [Rule("bogus", "id")])
