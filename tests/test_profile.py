from __future__ import annotations

from adenhq_hive_spark.operators.profile import profile_table


def test_profile_table_golden(spark):
    rows = [
        (1, "alpha", None),
        (2, "beta", 10),
        (3, None, 10),
        (4, "a-very-long-string-value-exceeding-the-cap", 30),
    ]
    df = spark.createDataFrame(rows, ["id", "name", "score"])
    out = {r.col_name: r for r in profile_table(df, max_str=24).collect()}
    assert set(out) == {"id", "name", "score"}
    assert out["id"].n_rows == 4 and out["id"].n_nulls == 0
    assert out["name"].n_nulls == 1 and out["name"].n_distinct == 3
    assert out["score"].n_nulls == 1 and out["score"].n_distinct == 2
    # typed (numeric) min/max, stringified after aggregation
    assert out["score"].min_s == "10" and out["score"].max_s == "30"
    # truncation cap applies to wide strings
    assert len(out["name"].min_s) <= 24
    assert out["name"].min_s == "a-very-long-string-value"


def test_profile_table_approx_tier(spark):
    df = spark.range(1000).withColumnRenamed("id", "v")
    out = {r.col_name: r for r in profile_table(df, exact=False).collect()}
    nd = out["v"].n_distinct
    # HLL default rsd 5% — generous envelope, just pin the tier works
    assert 800 <= nd <= 1200
    assert out["v"].min_s == "0" and out["v"].max_s == "999"


def test_approx_quantiles_gate(spark):
    from adenhq_hive_spark.operators.profile import approx_quantiles_gate

    df = spark.range(10_000).withColumnRenamed("id", "v")
    row = approx_quantiles_gate(df, "v").collect()[0]
    assert row.n_checked == 5 and row.within_tol

    # a deliberately coarse sketch on skewed data still honors ITS OWN
    # (looser) bound — the gate tolerance scales with 1/accuracy
    row2 = approx_quantiles_gate(df, "v", accuracy=100).collect()[0]
    assert row2.within_tol


# ---- ks_drift ---------------------------------------------------------------


def test_ks_drift_disjoint_supports_is_one(spark):
    from adenhq_hive_spark.operators.profile import ks_drift

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 30), ("b", 40)],
        "source string, n_chars long",
    )
    out = {r.source: r for r in ks_drift(df).collect()}
    assert out["a"].ks == 1.0 and out["b"].ks == 1.0
    assert out["a"].n_docs == 2


def test_ks_drift_identical_distributions_is_zero(spark):
    from adenhq_hive_spark.operators.profile import ks_drift

    rows = [("a", v) for v in (1, 2, 3)] + [("b", v) for v in (1, 2, 3)]
    df = spark.createDataFrame(rows, "source string, n_chars long")
    out = {r.source: r.ks for r in ks_drift(df).collect()}
    assert out == {"a": 0.0, "b": 0.0}


def test_ks_drift_known_half_overlap(spark):
    from adenhq_hive_spark.operators.profile import ks_drift

    # A = {1,2}, B = {1,3}: CDFs diverge by 0.5 at value 2 exactly
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 1), ("b", 3)],
        "source string, n_chars long",
    )
    out = {r.source: r.ks for r in ks_drift(df).collect()}
    assert out == {"a": 0.5, "b": 0.5}


def test_ks_drift_single_group_reports_null_not_div_by_zero(spark):
    from adenhq_hive_spark.operators.profile import ks_drift

    df = spark.createDataFrame(
        [("only", v) for v in (1, 2, 3)], "source string, n_chars long"
    )
    rows = ks_drift(df).collect()
    assert len(rows) == 1 and rows[0].ks is None and rows[0].n_docs == 3


# ---- PSI drift -------------------------------------------------------------


def test_psi_identical_distributions_near_zero(spark):
    from adenhq_hive_spark.operators.profile import psi_drift

    rows = [(s, v) for s in ("a", "b") for v in range(100)]
    df = spark.createDataFrame(rows, ["source", "n_chars"])
    out = {r.source: r.psi for r in psi_drift(df).collect()}
    # identical uniform distributions -> PSI ~ 0 (smoothing noise only)
    assert all(abs(v) < 0.01 for v in out.values())


def test_psi_shifted_distribution_flags(spark):
    from adenhq_hive_spark.operators.profile import psi_drift

    rows = [("base", v) for v in range(1000)] + [
        ("shifted", 900 + (v % 100)) for v in range(1000)
    ]
    df = spark.createDataFrame(rows, ["source", "n_chars"])
    out = {r.source: r.psi for r in psi_drift(df).collect()}
    assert out["shifted"] > 0.25  # action threshold
    assert out["shifted"] > out["base"] * 0  # defined for both
    # PSI is symmetric in this two-group setup (each vs rest)
    assert out["base"] > 0.25


def test_psi_stable_under_repartition(spark):
    from adenhq_hive_spark.operators.profile import psi_drift

    rows = [(f"s{v % 3}", (v * 17) % 500) for v in range(600)]
    df = spark.createDataFrame(rows, ["source", "n_chars"])
    a = sorted(map(tuple, psi_drift(df).collect()))
    b = sorted(map(tuple, psi_drift(df.repartition(13)).collect()))
    assert a == b


def test_psi_rejects_bad_buckets(spark):
    import pytest as _pytest

    from adenhq_hive_spark.operators.profile import psi_drift

    df = spark.createDataFrame([("a", 1)], ["source", "n_chars"])
    with _pytest.raises(ValueError):
        psi_drift(df, n_buckets=1)


# ---- label_kl ----------------------------------------------------------------


def test_label_kl_zero_when_mix_matches_corpus(spark):
    from adenhq_hive_spark.operators.profile import label_kl

    # both sources have the identical 50/50 label mix -> KL = 0
    rows = [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")] * 5
    df = spark.createDataFrame(rows, "source string, lang string")
    out = label_kl(df, "lang").collect()
    assert [(r.source, r.n_docs, r.kl_r6) for r in out] == [
        ("a", 10, 0.0), ("b", 10, 0.0)
    ]


def test_label_kl_matches_reference_formula(spark):
    import math
    from collections import Counter

    from adenhq_hive_spark.operators.profile import label_kl

    rows = (
        [("a", "x")] * 8 + [("a", "y")] * 2
        + [("b", "x")] * 3 + [("b", "y")] * 7
    )
    df = spark.createDataFrame(rows, "source string, lang string")
    got = {r.source: r.kl_r6 for r in label_kl(df, "lang").collect()}

    n = len(rows)
    c_l = Counter(l for _, l in rows)
    for src in ("a", "b"):
        cells = Counter(l for s, l in rows if s == src)
        n_g = sum(cells.values())
        kl = sum(
            (c / n_g) * math.log((c / n_g) / (c_l[l] / n))
            for l, c in cells.items()
        )
        assert got[src] == round(kl, 6)


def test_label_kl_weighted_sum_is_mutual_information(spark):
    """n_g-weighted mean of the per-group KLs equals I(group; label)."""
    import math
    from collections import Counter

    from adenhq_hive_spark.operators.profile import label_kl

    rows = [("a", "x")] * 6 + [("a", "y")] * 1 + [("b", "y")] * 5 + [
        ("b", "z")
    ] * 2
    df = spark.createDataFrame(rows, "source string, lang string")
    out = label_kl(df, "lang").collect()
    n = len(rows)
    mi_from_rows = sum(r.n_docs / n * r.kl_r6 for r in out)

    joint = Counter(rows)
    c_s = Counter(s for s, _ in rows)
    c_l = Counter(l for _, l in rows)
    mi = sum(
        (c / n) * math.log((c / n) / ((c_s[s] / n) * (c_l[l] / n)))
        for (s, l), c in joint.items()
    )
    assert abs(mi_from_rows - mi) < 1e-5


# ---- cramers_v ---------------------------------------------------------------


def test_cramers_v_perfect_association(spark):
    import pytest

    from adenhq_hive_spark.operators.profile import cramers_v

    rows = [("x", "1")] * 10 + [("y", "2")] * 10
    df = spark.createDataFrame(rows, "a string, b string")
    r = cramers_v(df, "a", "b").collect()[0]
    assert (r.n, r.rows_a, r.cols_b) == (20, 2, 2)
    assert r.chi2_r6 == pytest.approx(20.0)  # chi2 = n for perfect 2x2
    assert r.v_r6 == pytest.approx(1.0)


def test_cramers_v_independence_and_degenerate(spark):
    from adenhq_hive_spark.operators.profile import cramers_v

    rows = [(a, b) for a in "xy" for b in "12"] * 8
    df = spark.createDataFrame(rows, "a string, b string")
    r = cramers_v(df, "a", "b").collect()[0]
    assert r.chi2_r6 == 0.0 and r.v_r6 == 0.0
    # single-category column: dof = 0 -> NULL V
    df2 = spark.createDataFrame(
        [("only", b) for b in "123"], "a string, b string"
    )
    r2 = cramers_v(df2, "a", "b").collect()[0]
    assert r2.v_r6 is None
