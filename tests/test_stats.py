"""Experiment-analysis tier (operators/stats.py): hand-computed Welch
t-test cases, Poisson-bootstrap invariants, and a reference-recursion
check for the CUSUM window rewrite."""

from __future__ import annotations

import math

import pytest

from adenhq_hive_spark.operators.stats import (
    POISSON1_THRESHOLDS,
    cusum_changepoints,
    poisson_bootstrap_ci,
    welch_ttest,
)


def _vals(spark, a, b):
    rows = [("a", float(v)) for v in a] + [("b", float(v)) for v in b]
    return spark.createDataFrame(rows, "grp string, v double")


def test_welch_hand_computed(spark):
    a = [1, 2, 3, 4]
    b = [2, 4, 6, 8, 10]
    r = welch_ttest(_vals(spark, a, b), "v", "grp", "a", "b").collect()[0]
    mean_a, mean_b = 2.5, 6.0
    var_a = sum((x - mean_a) ** 2 for x in a) / 3  # 5/3
    var_b = sum((x - mean_b) ** 2 for x in b) / 4  # 10
    se2 = var_a / 4 + var_b / 5
    t = (mean_a - mean_b) / math.sqrt(se2)
    dof = se2 * se2 / (
        (var_a / 4) ** 2 / 3 + (var_b / 5) ** 2 / 4
    )
    assert (r.n_a, r.n_b) == (4, 5)
    assert r.mean_a_r6 == pytest.approx(mean_a)
    assert r.mean_b_r6 == pytest.approx(mean_b)
    assert r.var_a_r6 == pytest.approx(round(var_a, 6))
    assert r.var_b_r6 == pytest.approx(round(var_b, 6))
    assert r.t_r6 == pytest.approx(round(t, 6))
    assert r.df_r4 == pytest.approx(round(dof, 4))


def test_welch_singleton_cohort_yields_nulls_not_div_zero(spark):
    r = welch_ttest(
        _vals(spark, [5], [1, 2, 3]), "v", "grp", "a", "b"
    ).collect()[0]
    assert r.n_a == 1 and r.mean_a_r6 == pytest.approx(5.0)
    assert r.var_a_r6 is None and r.t_r6 is None and r.df_r4 is None


def test_welch_identical_cohorts_t_zero(spark):
    r = welch_ttest(
        _vals(spark, [1, 2, 3], [1, 2, 3]), "v", "grp", "a", "b"
    ).collect()[0]
    assert r.t_r6 == 0.0
    # signed-zero guard: 0.0, never -0.0
    assert math.copysign(1.0, r.t_r6) == 1.0


def test_poisson_thresholds_are_the_inverse_cdf(spark):
    cum, p = 0.0, math.exp(-1)
    for i, th in enumerate(POISSON1_THRESHOLDS):
        cum += p
        assert th == math.floor(cum * 1_000_000)
        p = p / (i + 1)


def test_bootstrap_constant_values_pin_ci_to_mean(spark):
    df = spark.createDataFrame(
        [(i, "g", 7.0) for i in range(50)], "id long, grp string, v double"
    )
    r = poisson_bootstrap_ci(df, "id", "v", "grp", b=8).collect()[0]
    assert (r.n, r.b) == (50, 8)
    assert r.mean_r6 == r.lo_r6 == r.hi_r6 == pytest.approx(7.0)


def test_bootstrap_deterministic_and_ordered(spark):
    df = spark.createDataFrame(
        [(i, "g%d" % (i % 2), float(i)) for i in range(40)],
        "id long, grp string, v double",
    )
    out1 = poisson_bootstrap_ci(df, "id", "v", "grp", b=16).collect()
    out2 = poisson_bootstrap_ci(df, "id", "v", "grp", b=16).collect()
    assert out1 == out2  # md5 inverse-CDF: replayable, no RNG state
    for r in out1:
        assert r.lo_r6 <= r.hi_r6
        assert r.lo_r6 <= r.mean_r6 + 5 and r.hi_r6 >= r.mean_r6 - 5


def test_bootstrap_arrow_kernel_bit_exact_parity(spark):
    """The Arrow kernel (hashlib md5 + numpy ladder + in-worker
    partials) must reproduce the JVM path bit-for-bit — including the
    NULL-id fallthrough (w = len(thresholds)), NULL values, negative
    values (trunc-div hi/lo split), and the w=0 replicates."""
    import random

    random.seed(7)
    rows = [
        (i, "g%d" % (i % 3), random.uniform(-50.0, 100.0))
        for i in range(4000)
    ]
    rows.append((None, "g0", 5.0))
    rows.append((77777, "g1", None))
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    jvm = poisson_bootstrap_ci(df, "id", "v", "grp", b=16).collect()
    arrow = poisson_bootstrap_ci(
        df, "id", "v", "grp", b=16, kernel="arrow"
    ).collect()
    assert jvm == arrow


def test_bootstrap_rejects_bad_kernel(spark):
    df = spark.createDataFrame([(1, "g", 1.0)], "id long, grp string, v double")
    with pytest.raises(ValueError):
        poisson_bootstrap_ci(df, "id", "v", "grp", b=8, kernel="gpu")


def test_bootstrap_rejects_tiny_b(spark):
    df = spark.createDataFrame([(1, "g", 1.0)], "id long, grp string, v double")
    with pytest.raises(ValueError):
        poisson_bootstrap_ci(df, "id", "v", "grp", b=2)


def _cusum_reference(xs, slack=0.5, threshold=4.0):
    """The textbook max-recursion over the SAME quantized z the operator
    uses — validates the prefix-sum window rewrite."""
    n = len(xs)
    mean = sum(xs) / n
    var = sum(x * x for x in xs) / n - mean * mean
    sd = math.sqrt(var) if var > 0 else 0.0
    out = []
    sp = sn = 0
    k6 = int(round(slack * 1e6))
    for x in xs:
        z6 = int(round(round((x - mean) / sd, 6) * 1e6)) if sd > 0 else 0
        sp = max(0, sp + z6 - k6)
        sn = max(0, sn + (-z6) - k6)
        out.append((sp / 1e6, sn / 1e6, sp > threshold * 1e6))
    return out


def test_cusum_matches_reference_recursion_and_alarms(spark):
    # 20 quiet days then a level shift — alarm must fire after the shift
    xs = [100, 102, 98, 101, 99, 100, 103, 97, 100, 101,
          99, 100, 102, 98, 100, 101, 99, 100, 130, 135]
    rows = []
    for day, x in enumerate(xs, start=1):
        ts = "2024-02-%02d 12:00:00" % day
        rows += [("g", ts)] * x
    df = spark.createDataFrame(rows, "grp string, ts string").selectExpr(
        "grp", "CAST(ts AS TIMESTAMP) AS ts"
    )
    out = cusum_changepoints(df, "ts", "grp").collect()
    ref = _cusum_reference(xs)
    assert len(out) == len(ref)
    for row, (sp, sn, alarm) in zip(out, ref):
        assert row.s_pos_r6 == pytest.approx(sp, abs=1e-9)
        assert row.s_neg_r6 == pytest.approx(sn, abs=1e-9)
        assert row.alarm_pos == alarm
    assert out[-1].alarm_pos and not out[0].alarm_pos
    assert not any(r.alarm_neg for r in out)


def test_cusum_constant_series_is_silent(spark):
    rows = [("g", "2024-03-%02d 00:00:01" % d) for d in range(1, 11)]
    df = spark.createDataFrame(rows, "grp string, ts string").selectExpr(
        "grp", "CAST(ts AS TIMESTAMP) AS ts"
    )
    out = cusum_changepoints(df, "ts", "grp").collect()
    assert all(
        r.s_pos_r6 == 0.0 and r.s_neg_r6 == 0.0
        and not r.alarm_pos and not r.alarm_neg
        for r in out
    )


# ---- mann_whitney_u ----------------------------------------------------------


def test_mwu_separated_cohorts_hand_computed(spark):
    from adenhq_hive_spark.operators.stats import mann_whitney_u

    r = mann_whitney_u(
        _vals(spark, [1, 2, 3], [4, 5, 6]), "v", "grp", "a", "b"
    ).collect()[0]
    # a occupies ranks 1-3: R_a = 6, U_a = 6 - 3*4/2 = 0
    assert (r.n_a, r.n_b, r.u2_a) == (3, 3, 0)
    assert r.u_a_r1 == 0.0
    mu, var = 4.5, (9 / 12) * 7  # no ties
    z = (0.0 + 0.5 - mu) / math.sqrt(var)  # continuity toward null
    assert r.z_r6 == pytest.approx(round(z, 6))


def test_mwu_midranks_and_tie_correction(spark):
    from adenhq_hive_spark.operators.stats import mann_whitney_u

    r = mann_whitney_u(
        _vals(spark, [1, 1, 2], [1, 2, 2]), "v", "grp", "a", "b"
    ).collect()[0]
    # v=1: midrank 2 (x2 for a), v=2: midrank 5 (x1) -> R_a = 9, U_a = 3
    assert r.u2_a == 6 and r.u_a_r1 == 3.0
    var = (9 / 12) * (7 - 48 / 30)  # tie3 = 2*(27-3) = 48
    z = (3.0 + 0.5 - 4.5) / math.sqrt(var)
    assert r.z_r6 == pytest.approx(round(z, 6))


def test_mwu_u_sums_to_na_nb(spark):
    from adenhq_hive_spark.operators.stats import mann_whitney_u

    df = _vals(spark, [3, 1, 4, 1, 5], [9, 2, 6, 5])
    ab = mann_whitney_u(df, "v", "grp", "a", "b").collect()[0]
    ba = mann_whitney_u(df, "v", "grp", "b", "a").collect()[0]
    assert ab.u2_a + ba.u2_a == 2 * ab.n_a * ab.n_b
    assert ba.z_r6 == pytest.approx(-ab.z_r6)


def test_mwu_identical_constant_cohorts_null_z(spark):
    from adenhq_hive_spark.operators.stats import mann_whitney_u

    r = mann_whitney_u(
        _vals(spark, [7, 7], [7, 7]), "v", "grp", "a", "b"
    ).collect()[0]
    assert r.z_r6 is None  # var = 0: all values in one tie class


# ---- autocorr_daily ----------------------------------------------------------


def _daily_events(spark, xs, grp="g", month="04"):
    rows = []
    for day, x in enumerate(xs, start=1):
        rows += [(grp, "2024-%s-%02d 09:00:00" % (month, day))] * x
    return spark.createDataFrame(rows, "grp string, ts string").selectExpr(
        "grp", "CAST(ts AS TIMESTAMP) AS ts"
    )


def test_autocorr_hand_computed_ramp(spark):
    from adenhq_hive_spark.operators.stats import autocorr_daily

    out = {
        r.lag: r
        for r in autocorr_daily(
            _daily_events(spark, [1, 2, 3, 4, 5]), "ts", "grp", max_lag=3
        ).collect()
    }
    # mean 3, devs [-2,-1,0,1,2], den 10
    assert out[1].acf_r6 == pytest.approx(0.4)    # (2+0+0+2)/10
    assert out[2].acf_r6 == pytest.approx(-0.1)   # (0-1+0)/10
    assert out[3].acf_r6 == pytest.approx(-0.4)   # (-2-2+0)/10
    assert out[1].n_days == 5 and out[1].n_pairs == 4


def test_autocorr_constant_and_short_series_null(spark):
    from adenhq_hive_spark.operators.stats import autocorr_daily

    out = autocorr_daily(
        _daily_events(spark, [3, 3, 3, 3]), "ts", "grp", max_lag=4
    ).collect()
    assert all(r.acf_r6 is None for r in out)  # den = 0 (constant)
    out2 = {
        r.lag: r
        for r in autocorr_daily(
            _daily_events(spark, [1, 5], month="05"), "ts", "grp",
            max_lag=3,
        ).collect()
    }
    assert out2[1].acf_r6 is None  # n_pairs = 1
    assert out2[2].n_pairs == 0 and out2[2].acf_r6 is None
    from adenhq_hive_spark.operators.stats import autocorr_daily as ad
    with pytest.raises(ValueError):
        ad(_daily_events(spark, [1]), "ts", "grp", max_lag=0)


def test_autocorr_weekly_cycle_spikes_at_lag_7(spark):
    from adenhq_hive_spark.operators.stats import autocorr_daily

    xs = [100, 60, 60, 60, 60, 60, 60] * 4  # weekly spike, 28 days
    out = {
        r.lag: r
        for r in autocorr_daily(
            _daily_events(spark, xs), "ts", "grp", max_lag=7
        ).collect()
    }
    # a perfect cycle estimates (n-k)/n = 21/28 at lag 7 (the standard
    # finite-sample attenuation of the full-mean ACF estimator)
    assert out[7].acf_r6 == pytest.approx(0.75)
    assert out[7].acf_r6 > out[1].acf_r6 + 0.5


# ---- srm_check ---------------------------------------------------------------


def test_srm_invariants_and_balanced_split(spark):
    from adenhq_hive_spark.operators.stats import srm_check

    df = spark.createDataFrame(
        [(i, "g") for i in range(10_000)], "u long, grp string"
    )
    r = srm_check(df, "u", "grp").collect()[0]
    assert r.n == 10_000 and r.n_arm0 + r.n_arm1 == r.n
    d = r.n_arm0 - r.n_arm1
    assert r.chi2_r6 == pytest.approx(round(d * d / 10_000, 6))
    assert not r.mismatch  # md5 parity splits 10k units ~50/50


def test_srm_degenerate_assignment_flags(spark):
    from adenhq_hive_spark.operators.stats import srm_check

    # 1000 events from ONE unit: every row lands in the same arm
    df = spark.createDataFrame([(42,)] * 1000, "u long")
    r = srm_check(df, "u").collect()[0]
    assert {r.n_arm0, r.n_arm1} == {0, 1000}
    assert r.chi2_r6 == pytest.approx(1000.0)
    assert r.mismatch


def test_srm_deterministic(spark):
    from adenhq_hive_spark.operators.stats import srm_check

    df = spark.createDataFrame(
        [(i, "a" if i % 3 else "b") for i in range(300)],
        "u long, grp string",
    )
    assert (
        srm_check(df, "u", "grp").collect()
        == srm_check(df, "u", "grp").collect()
    )


def test_srm_xxh_mode_balanced_and_md5_free(spark):
    """Deployment-hash form (hash_mode='xxh'): arm counts conserve n, a
    fair split is not flagged, and the executed plan sheds md5 for the
    multi-argument xxhash64 intrinsic."""
    from adenhq_hive_spark.operators.stats import srm_check

    df = spark.createDataFrame(
        [(i, "g") for i in range(10_000)], "u long, grp string"
    )
    q = srm_check(df, "u", "grp", hash_mode="xxh")
    r = q.collect()[0]
    assert r.n == 10_000 and r.n_arm0 + r.n_arm1 == r.n
    d = r.n_arm0 - r.n_arm1
    assert r.chi2_r6 == pytest.approx(round(d * d / 10_000, 6))
    assert not r.mismatch  # xxhash64 parity splits 10k units ~50/50
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan and "md5" not in plan
    # the mode switch really changes assignments vs the md5 form
    md5_r = srm_check(df, "u", "grp").collect()[0]
    assert (r.n_arm0, r.n_arm1) != (md5_r.n_arm0, md5_r.n_arm1)


# ---- cuped_adjust ------------------------------------------------------------


def _cuped_rows(spark, pre_post):
    rows = []
    for u, (pre, post) in enumerate(pre_post):
        if pre is not None:
            rows.append((u, float(pre), "2024-01-05 00:00:00"))
        if post is not None:
            rows.append((u, float(post), "2024-01-20 00:00:00"))
    return spark.createDataFrame(
        rows, "u long, v double, ts string"
    ).selectExpr("u", "v", "CAST(ts AS TIMESTAMP) AS ts")


def test_cuped_perfect_covariate_reduces_100pct(spark):
    from adenhq_hive_spark.operators.stats import cuped_adjust

    df = _cuped_rows(spark, [(1, 2), (2, 4), (3, 6), (4, 8)])
    r = cuped_adjust(df, "u", "v", "ts", "2024-01-16 00:00:00").collect()[0]
    assert r.n_units == 4
    assert r.theta_r6 == pytest.approx(2.0)
    assert r.var_adj_r6 == pytest.approx(0.0)
    assert r.reduction_pct_r4 == pytest.approx(100.0)


def test_cuped_constant_post_zero_reduction_and_cohort_filter(spark):
    from adenhq_hive_spark.operators.stats import cuped_adjust

    # user 9 has no post-period events -> excluded from the cohort
    df = _cuped_rows(spark, [(1, 5), (2, 5), (3, 5), (7, None)])
    r = cuped_adjust(df, "u", "v", "ts", "2024-01-16 00:00:00").collect()[0]
    assert r.n_units == 3
    assert r.theta_r6 == pytest.approx(0.0)  # cov(pre, const) = 0
    assert r.var_post_r6 == pytest.approx(0.0)
    assert r.reduction_pct_r4 == pytest.approx(0.0)


def test_cuped_multi_event_means_and_known_theta(spark):
    from adenhq_hive_spark.operators.stats import cuped_adjust
    import statistics as st

    # per-user PRE mean = avg of two events; post single event
    pre_pairs = {1: (1, 3), 2: (2, 6), 3: (10, 2)}  # means 2, 4, 6
    post = {1: 5, 2: 1, 3: 9}
    rows = []
    for u, (a, b) in pre_pairs.items():
        rows += [(u, float(a), "2024-01-02 00:00:00"),
                 (u, float(b), "2024-01-10 00:00:00")]
    for u, p in post.items():
        rows.append((u, float(p), "2024-01-22 00:00:00"))
    df = spark.createDataFrame(
        rows, "u long, v double, ts string"
    ).selectExpr("u", "v", "CAST(ts AS TIMESTAMP) AS ts")
    r = cuped_adjust(df, "u", "v", "ts", "2024-01-16 00:00:00").collect()[0]
    xs, ys = [2, 4, 6], [5, 1, 9]
    mx, my = st.mean(xs), st.mean(ys)
    cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / 3
    vx = sum((x - mx) ** 2 for x in xs) / 3
    vy = sum((y - my) ** 2 for y in ys) / 3
    assert r.theta_r6 == pytest.approx(round(cov / vx, 6))
    assert r.var_post_r6 == pytest.approx(round(vy, 6))
    assert r.var_adj_r6 == pytest.approx(round(vy - cov * cov / vx, 6))


# ---- gini_concentration ------------------------------------------------------


def _gini_df(spark, vals, grp="g"):
    rows = [(i, grp, float(v)) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "u long, grp string, v double")


def test_gini_hand_computed(spark):
    from adenhq_hive_spark.operators.stats import gini_concentration

    # equal values -> 0; one-holder -> (n-1)/n
    r = gini_concentration(
        _gini_df(spark, [5, 5, 5, 5]), "u", "v", "grp"
    ).collect()[0]
    assert r.gini_r6 == pytest.approx(0.0)
    r2 = gini_concentration(
        _gini_df(spark, [0, 0, 0, 12]), "u", "v", "grp"
    ).collect()[0]
    assert r2.gini_r6 == pytest.approx(0.75)
    # textbook case [1,2,3,4]: G = 2*(1+4+9+16)/(4*10) - 5/4 = 0.25
    r3 = gini_concentration(
        _gini_df(spark, [1, 2, 3, 4]), "u", "v", "grp"
    ).collect()[0]
    assert r3.gini_r6 == pytest.approx(0.25)


def test_gini_aggregates_per_unit_and_degenerates(spark):
    from adenhq_hive_spark.operators.stats import gini_concentration

    # unit 0 appears twice (3 + 1 = 4): totals [4, 4] -> G = 0
    df = spark.createDataFrame(
        [(0, "g", 3.0), (0, "g", 1.0), (1, "g", 4.0),
         (9, "h", 2.0)],
        "u long, grp string, v double",
    )
    out = {r.grp: r for r in
           gini_concentration(df, "u", "v", "grp").collect()}
    assert out["g"].n_units == 2
    assert out["g"].gini_r6 == pytest.approx(0.0)
    assert out["h"].gini_r6 is None  # single unit
