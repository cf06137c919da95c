"""Privacy tier (operators/privacy.py): k-anonymity / l-diversity flag
semantics and the determinism + epsilon-scaling invariants of the
Laplace mechanism."""

from __future__ import annotations

import math

import pytest

from adenhq_hive_spark.operators.privacy import dp_counts, k_anonymity


def _people(spark):
    # class (NY, M): 3 rows, 2 distinct diagnoses
    # class (NY, F): 1 row, 1 distinct   -> k and l risk
    # class (SF, M): 2 rows, 1 distinct  -> l risk only (k=2)
    rows = [
        ("NY", "M", "flu"), ("NY", "M", "flu"), ("NY", "M", "cold"),
        ("NY", "F", "flu"),
        ("SF", "M", "cold"), ("SF", "M", "cold"),
    ]
    return spark.createDataFrame(rows, "city string, sex string, dx string")


def test_kanon_class_sizes_and_flags(spark):
    out = {
        (r.city, r.sex): r
        for r in k_anonymity(
            _people(spark), ("city", "sex"), "dx", k=2, l_div=2
        ).collect()
    }
    assert out[("NY", "M")].n == 3
    assert out[("NY", "M")].l_distinct == 2
    assert not out[("NY", "M")].at_risk_k
    assert not out[("NY", "M")].at_risk_l
    assert out[("NY", "F")].at_risk_k and out[("NY", "F")].at_risk_l
    assert not out[("SF", "M")].at_risk_k
    assert out[("SF", "M")].at_risk_l  # homogeneous: n>=k but leaks dx


def test_kanon_ordering_and_param_validation(spark):
    out = k_anonymity(_people(spark), ("city", "sex"), "dx").collect()
    keys = [(r.city, r.sex) for r in out]
    assert keys == sorted(keys)
    with pytest.raises(ValueError):
        k_anonymity(_people(spark), ("city",), "dx", k=0)


def test_dp_counts_deterministic_and_bounded(spark):
    df = _people(spark)
    a = dp_counts(df, ("city", "sex"), epsilon=1.0).collect()
    b = dp_counts(df, ("city", "sex"), epsilon=1.0).collect()
    assert a == b  # md5-derived draw: replayable
    for r in a:
        assert r.epsilon == 1.0
        # Laplace(1) at |u| <= 0.999999 stays within ~14.5 in magnitude
        assert abs(r.noisy_r4 - r.n) <= 15.0
        assert math.copysign(1.0, r.noisy_r4) == 1.0 or r.noisy_r4 != 0.0


def test_dp_counts_noise_scales_inversely_with_epsilon(spark):
    df = _people(spark)
    e1 = {
        (r.city, r.sex): r.noisy_r4 - r.n
        for r in dp_counts(df, ("city", "sex"), epsilon=1.0).collect()
    }
    e2 = {
        (r.city, r.sex): r.noisy_r4 - r.n
        for r in dp_counts(df, ("city", "sex"), epsilon=2.0).collect()
    }
    for key, n1 in e1.items():
        # same u per key, scale b = 1/eps -> exactly half the noise
        assert e2[key] == pytest.approx(n1 / 2.0, abs=2e-4)
    with pytest.raises(ValueError):
        dp_counts(df, ("city",), epsilon=0.0)
