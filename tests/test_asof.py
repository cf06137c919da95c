"""Directional as-of join semantics (operators/asof.py): forward /
nearest / tolerance golden cases on numeric and timestamp axes."""

import datetime as dt

import pytest

from adenhq_hive_spark.operators.asof import asof_join


@pytest.fixture()
def sides(spark):
    left = spark.createDataFrame(
        [(1, 10), (1, 25), (1, 40), (2, 5)], "k long, ts long"
    )
    right = spark.createDataFrame(
        [(1, 8, 100), (1, 12, 101), (1, 30, 102), (3, 1, 103)],
        "k long, ts long, val long",
    )
    return left, right


def _m(df):
    return {(r.k, r.ts): r.asof_val for r in df.collect()}


def test_asof_backward_default(sides):
    left, right = sides
    out = _m(asof_join(left, right, on="k"))
    assert out == {(1, 10): 100, (1, 25): 101, (1, 40): 102, (2, 5): None}


def test_asof_forward(sides):
    left, right = sides
    out = _m(asof_join(left, right, on="k", direction="forward"))
    assert out == {(1, 10): 101, (1, 25): 102, (1, 40): None, (2, 5): None}


def test_asof_nearest_prefers_closer_and_backward_on_tie(sides):
    left, right = sides
    out = _m(asof_join(left, right, on="k", direction="nearest"))
    # ts=10: backward 8 (d=2) beats forward 12 (d=2)? equidistant -> backward
    # ts=25: forward 30 (d=5) beats backward 12 (d=13)
    # ts=40: only backward exists
    assert out == {(1, 10): 100, (1, 25): 102, (1, 40): 102, (2, 5): None}


def test_asof_tolerance_nulls_far_matches(sides):
    left, right = sides
    out = _m(asof_join(left, right, on="k", tolerance=5))
    # backward: ts=10 -> 8 (d=2 ok), ts=25 -> 12 (d=13 too far),
    # ts=40 -> 30 (d=10 too far)
    assert out == {(1, 10): 100, (1, 25): None, (1, 40): None, (2, 5): None}


def test_asof_equal_ts_visible_both_directions(spark):
    left = spark.createDataFrame([(1, 10)], "k long, ts long")
    right = spark.createDataFrame([(1, 10, 7)], "k long, ts long, val long")
    for d in ("backward", "forward", "nearest"):
        assert _m(asof_join(left, right, on="k", direction=d)) == {(1, 10): 7}


def test_asof_timestamp_tolerance_in_seconds(spark):
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    left = spark.createDataFrame([(1, t0)], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, t0 - dt.timedelta(minutes=10), 1),
         (1, t0 + dt.timedelta(minutes=2), 2)],
        "k long, ts timestamp, val long",
    )
    near = _m(asof_join(left, right, on="k", direction="nearest"))
    assert near == {(1, t0): 2}  # 2 min forward beats 10 min backward
    tight = _m(asof_join(left, right, on="k", tolerance=60.0))
    assert tight == {(1, t0): None}  # backward match is 600 s away
    loose = _m(asof_join(left, right, on="k", tolerance=600.0))
    assert loose == {(1, t0): 1}


def test_asof_tie_on_ts_takes_greatest_order_col(spark):
    left = spark.createDataFrame([(1, 10)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 8, 100), (1, 8, 105)], "k long, ts long, val long"
    )
    out = _m(asof_join(left, right, on="k", order_col="val"))
    assert out == {(1, 10): 105}


def test_asof_unknown_direction_raises(sides):
    left, right = sides
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, on="k", direction="sideways")


def test_asof_timestamp_ntz_tolerance(spark):
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [(1, "2026-01-01 12:00:00")], "k long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    right = spark.createDataFrame(
        [(1, "2026-01-01 11:58:00", 9)], "k long, ts string, val long"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = asof_join(left, right, on="k", tolerance=60.0).collect()
    assert out[0].asof_val is None  # 120 s away > 60 s tolerance
    out2 = asof_join(left, right, on="k", tolerance=180.0).collect()
    assert out2[0].asof_val == 9
