"""Volume-anomaly detector tests: golden spike separation on constructed
days + portability invariants (integer decision, no floating z)."""

from __future__ import annotations

import datetime

from adenhq_hive_spark.operators.anomaly import daily_count_anomalies


def _events(spark, day_counts, etype="click"):
    rows = []
    eid = 0
    for d, c in day_counts.items():
        for i in range(c):
            rows.append(
                (eid, datetime.datetime(2026, 1, d, 12, 0, i % 60), etype)
            )
            eid += 1
    return spark.createDataFrame(rows, ["event_id", "ts", "event_type"])


def test_spike_flagged_steady_days_not(spark):
    # 9 steady days of 10 + one day of 100: the spike is >> 2 sigma
    counts = {d: 10 for d in range(1, 10)}
    counts[10] = 100
    df = _events(spark, counts)
    out = {r.day.day: r for r in daily_count_anomalies(df, k=2).collect()}
    assert len(out) == 10
    assert out[10].is_anomaly
    assert not any(out[d].is_anomaly for d in range(1, 10))
    assert out[10].n_days == 10
    assert out[10].mean_events == round((9 * 10 + 100) / 10, 4)


def test_constant_volume_never_flags(spark):
    df = _events(spark, {d: 7 for d in range(1, 8)})
    out = daily_count_anomalies(df, k=2).collect()
    assert len(out) == 7 and not any(r.is_anomaly for r in out)


def test_single_day_group_never_flags(spark):
    df = _events(spark, {1: 50})
    out = daily_count_anomalies(df, k=2).collect()
    assert len(out) == 1 and not out[0].is_anomaly


def test_keys_independent(spark):
    steady_a = {d: 10 for d in range(1, 10)}
    steady_a[10] = 100
    a = _events(spark, steady_a, etype="a")
    b = _events(spark, {d: 60 for d in range(1, 11)}, etype="b")
    df = a.union(b)
    out = {(r.event_type, r.day.day): r.is_anomaly
           for r in daily_count_anomalies(df, k=2).collect()}
    # key a's spike flags against a's own distribution; key b's constant
    # 60s — the same magnitude as a's spike — never flag
    assert out[("a", 10)] is True
    assert not any(v for (t, d), v in out.items() if t == "b" or d < 10)
