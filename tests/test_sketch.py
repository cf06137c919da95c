"""Misra-Gries heavy hitters: merge-rule guarantees + sketch-then-verify
exactness (operators/sketch.py)."""

import pandas as pd
import pytest

from adenhq_hive_spark.operators.sketch import (
    heavy_hitters,
    mg_merge,
    misra_gries_reference,
)


def _stream():
    # 1000 items: 'hot' 300x, 'warm' 150x, 50 cold items 11x each
    s = ["hot"] * 300 + ["warm"] * 150 + [f"c{i}" for i in range(50) for _ in range(11)]
    return s


def test_mg_merge_matches_reference_guarantees():
    stream = _stream()
    n, cap = len(stream), 8
    # vectorized path: merge in 10 arbitrary batches
    sk = pd.Series(dtype="int64")
    step = len(stream) // 10
    for i in range(0, len(stream), step):
        batch = pd.Series(stream[i : i + step]).value_counts()
        sk = mg_merge(sk, batch, cap)
    ref = misra_gries_reference(stream, cap)
    true = pd.Series(stream).value_counts()
    for sketch in (sk, pd.Series(ref)):
        assert len(sketch) <= cap
        # superset guarantee: every item with count > n/cap survives
        for item, cnt in true.items():
            if cnt > n / cap:
                assert item in sketch.index, item
        # undercount bound: counter >= true - n/cap, never overcount
        for item in sketch.index:
            assert sketch[item] <= true[item]
            assert sketch[item] >= true[item] - n / cap


def test_heavy_hitters_exact_counts_and_threshold(spark):
    # 10 docs x 10 tokens = 100 occurrences; 'hh' appears 30x (3000bp),
    # 'mid' 10x (1000bp), everything else below
    docs = []
    for i in range(10):
        words = ["hh"] * 3 + ["mid"] + [f"u{i}_{j}" for j in range(6)]
        docs.append((i, " ".join(words)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = heavy_hitters(df, min_share_bp=1000, capacity=64).collect()
    assert [(r.token, r.n, r.share_bp) for r in rows] == [
        ("hh", 30, 3000),
        ("mid", 10, 1000),
    ]


def test_heavy_hitters_survives_adversarial_partitioning(spark):
    # the heavy token is spread evenly over 16 partitions: the pigeonhole
    # argument (count_p > N_p/m in at least one partition) must still
    # produce it as a candidate
    docs = [(i, "hh " + " ".join(f"u{i}_{j}" for j in range(9))) for i in range(160)]
    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(16)
    rows = heavy_hitters(df, min_share_bp=500, capacity=32).collect()
    assert [(r.token, r.n) for r in rows] == [("hh", 160)]  # 1000bp


def test_heavy_hitters_capacity_guard_and_empty(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="capacity"):
        heavy_hitters(df, min_share_bp=10, capacity=100)
    empty = spark.createDataFrame([(1, "")], "doc_id long, text string")
    out = heavy_hitters(empty, min_share_bp=100, capacity=128)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["token", "n", "share_bp"]
