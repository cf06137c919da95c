"""Batch gap sessionization (operators/sessions.py:sessionize)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from adenhq_hive_spark.operators.sessions import sessionize


def _ev(uid, eid, minutes, micros=0):
    return (
        uid,
        eid,
        dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(
            minutes=minutes, microseconds=micros
        ),
    )


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp"
    )


def test_sessionize_splits_on_gap(spark):
    # user 1: events at 0, 10, 50 min -> 30-min gap splits after 10
    df = _df(spark, [_ev(1, 1, 0), _ev(1, 2, 10), _ev(1, 3, 50)])
    out = sessionize(df).collect()
    assert [(r.user_id, r.session_n, r.n_events, r.duration_s)
            for r in out] == [(1, 1, 2, 600), (1, 2, 1, 0)]


def test_sessionize_boundary_gap_extends_session(spark):
    # exactly 30 min is NOT a new session (strictly-greater contract,
    # matching session_window's inclusive gap)
    df = _df(spark, [_ev(1, 1, 0), _ev(1, 2, 30)])
    out = sessionize(df).collect()
    assert len(out) == 1 and out[0].n_events == 2
    # one microsecond past the gap splits
    df2 = _df(spark, [_ev(1, 1, 0), _ev(1, 2, 30, micros=1)])
    assert len(sessionize(df2).collect()) == 2


def test_sessionize_per_user_and_tiebreak(spark):
    df = _df(
        spark,
        [_ev(1, 1, 0), _ev(2, 2, 0), _ev(1, 3, 5), _ev(2, 4, 90)],
    )
    out = {(r.user_id, r.session_n): r.n_events
           for r in sessionize(df).collect()}
    assert out == {(1, 1): 2, (2, 1): 1, (2, 2): 1}
    # duplicate timestamps: (ts, event_id) order keeps the assignment
    # deterministic — same ts twice stays one session
    df2 = _df(spark, [_ev(1, 2, 0), _ev(1, 1, 0)])
    assert sessionize(df2).collect()[0].n_events == 2


def test_sessionize_matches_session_window_boundaries(spark):
    """Batch assignments agree with Spark's own session_window on the
    same gap — the backfill-equals-online contract."""
    rows = [
        _ev(1, i, m)
        for i, m in enumerate([0, 4, 9, 47, 55, 120, 125, 199])
    ]
    df = _df(spark, rows)
    got = sorted(
        (r.user_id, r.n_events, r.start_ts, r.end_ts)
        for r in sessionize(df).collect()
    )
    sw = (
        df.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count("*").alias("n"),
            F.min("ts").alias("s"),
            F.max("ts").alias("e"),
        )
        .collect()
    )
    want = sorted((r.user_id, r.n, r.s, r.e) for r in sw)
    assert got == want
