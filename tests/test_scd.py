"""SCD2 interval builder (operators/scd.py) + sequence-motif counting
(operators/curation.py:seq_motif)."""

import datetime as dt

import pytest

from adenhq_hive_spark.operators.curation import seq_motif
from adenhq_hive_spark.operators.scd import scd2_intervals


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def _log(spark):
    rows = [
        # user 1: a,a,b,b,a -> episodes a@0, b@2, a@4
        (1, 1, _ts(0), "a"), (2, 1, _ts(1), "a"), (3, 1, _ts(2), "b"),
        (4, 1, _ts(3), "b"), (5, 1, _ts(4), "a"),
        # user 2: single value -> one open episode
        (6, 2, _ts(0), "z"),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, val string"
    )


def test_scd2_runs_collapse_and_current_flag(spark):
    out = scd2_intervals(_log(spark), "user_id", "val", "ts", "event_id")
    got = [
        (r.user_id, r.val, r.valid_from.minute,
         None if r.valid_to is None else r.valid_to.minute, r.is_current)
        for r in out.collect()
    ]
    assert got == [
        (1, "a", 0, 2, False),
        (1, "b", 2, 4, False),
        (1, "a", 4, None, True),
        (2, "z", 0, None, True),
    ]


def test_scd2_same_ts_tiebreak_is_deterministic(spark):
    # two changes at the SAME timestamp: event_id order decides the run
    rows = [(2, 1, _ts(0), "b"), (1, 1, _ts(0), "a")]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, val string"
    )
    out = [
        (r.val, r.is_current)
        for r in scd2_intervals(df, "user_id", "val", "ts", "event_id")
        .collect()
    ]
    assert out == [("a", False), ("b", True)]
    # intervals are contiguous: episode i's valid_to == episode i+1's
    # valid_from (same instant), a point-in-time probe hits exactly one


def test_scd2_single_shuffle(spark):
    df = scd2_intervals(_log(spark), "user_id", "val", "ts", "event_id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    body = plan.split("TakeOrderedAndProject")[-1] if False else plan
    # the two windows + the change filter reuse ONE hashpartitioning
    # exchange on user_id; the only other exchange is the final sort's
    assert body.count("Exchange hashpartitioning") == 1


def test_seq_motif_counts_nonoverlapping_and_positions(spark):
    rows = []
    # user 1: v c p v c p  -> 2 motifs, first at pos 1
    for i, s in enumerate(["view", "click", "purchase"] * 2):
        rows.append((i, 1, _ts(i), s))
    # user 2: v v c x p -> no STRICT vcp run (x = error in between)
    for i, s in enumerate(["view", "view", "click", "error", "purchase"]):
        rows.append((10 + i, 2, _ts(i), s))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = seq_motif(df, "vcp").collect()
    assert [(r.user_id, r.n_events, r.motif_n, r.first_pos)
            for r in out] == [(1, 6, 2, 1)]


def test_seq_motif_overlap_semantics_and_guard(spark):
    # 'aa' in 'aaaa' -> 2 non-overlapping (length arithmetic), pos 1
    rows = [(i, 1, _ts(i), "a") for i in range(4)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    r = seq_motif(df, "aa").collect()[0]
    assert (r.motif_n, r.first_pos) == (2, 1)
    with pytest.raises(ValueError):
        seq_motif(df, "")
