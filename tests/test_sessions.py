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


# ---- retention_matrix --------------------------------------------------------


def _ret_events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts string"
    ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts")


def test_retention_hand_computed_triangle(spark):
    from adenhq_hive_spark.operators.sessions import retention_matrix

    # cohort week of 2024-01-01 (Mon): users 1, 2; user 1 returns the
    # next week; user 3 starts the next week
    df = _ret_events(spark, [
        (1, "2024-01-02 10:00:00"), (2, "2024-01-03 11:00:00"),
        (1, "2024-01-09 09:00:00"),
        (3, "2024-01-10 12:00:00"),
    ])
    out = {
        (str(r.cohort_week)[:10], r.week_offset): r
        for r in retention_matrix(df, "user_id", "ts").collect()
    }
    assert out[("2024-01-01", 0)].cohort_n == 2
    assert out[("2024-01-01", 0)].retention_r6 == 1.0
    assert out[("2024-01-01", 1)].active_n == 1
    assert out[("2024-01-01", 1)].retention_r6 == 0.5
    assert out[("2024-01-08", 0)].cohort_n == 1


def test_retention_multiple_events_one_week_count_once(spark):
    from adenhq_hive_spark.operators.sessions import retention_matrix

    df = _ret_events(spark, [(1, "2024-02-05 01:00:00")] * 5)
    r = retention_matrix(df, "user_id", "ts").collect()
    assert len(r) == 1 and r[0].cohort_n == 1 and r[0].active_n == 1


# ---- kaplan_meier ------------------------------------------------------------


def test_kaplan_meier_hand_computed_with_censoring(spark):
    from adenhq_hive_spark.operators.sessions import kaplan_meier

    rows = []
    spans = {  # user -> (first, last)
        1: ("2024-01-01", "2024-01-03"),   # t=2, observed
        2: ("2024-01-01", "2024-01-05"),   # t=4, observed
        3: ("2024-01-01", "2024-01-28"),   # t=27, censored
        4: ("2024-01-02", "2024-01-04"),   # t=2, observed
        5: ("2024-01-10", "2024-01-29"),   # t=19, censored (gmax anchor)
    }
    for u, (a, b) in spans.items():
        rows += [(u, "g", a + " 08:00:00"), (u, "g", b + " 08:00:00")]
    df = spark.createDataFrame(
        rows, "user_id long, grp string, ts string"
    ).selectExpr("user_id", "grp", "CAST(ts AS TIMESTAMP) AS ts")
    out = {r.t_days: r for r in
           kaplan_meier(df, "user_id", "ts", "grp").collect()}
    # only death steps are emitted
    assert set(out) == {2, 4}
    assert (out[2].n_risk, out[2].deaths) == (5, 2)
    assert out[2].surv_r6 == pytest.approx(0.6, abs=1e-4)
    assert (out[4].n_risk, out[4].deaths) == (3, 1)
    assert out[4].surv_r6 == pytest.approx(0.4, abs=1e-4)


def test_kaplan_meier_full_wipe_pins_zero(spark):
    from adenhq_hive_spark.operators.sessions import kaplan_meier

    # both units die at t=1 (well before the censor horizon anchored
    # by unit 9's last event) -> S(1) = 0 exactly, no ln(0)
    rows = [
        (1, "g", "2024-01-01 00:00:00"), (1, "g", "2024-01-02 00:00:00"),
        (2, "g", "2024-01-01 00:00:00"), (2, "g", "2024-01-02 00:00:00"),
        (9, "h", "2024-02-01 00:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, grp string, ts string"
    ).selectExpr("user_id", "grp", "CAST(ts AS TIMESTAMP) AS ts")
    out = [r for r in kaplan_meier(df, "user_id", "ts", "grp").collect()
           if r.grp == "g"]
    assert len(out) == 1
    assert out[0].surv_r6 == 0.0
    import math as _m
    assert _m.copysign(1.0, out[0].surv_r6) == 1.0  # signed-zero guard
