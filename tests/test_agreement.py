"""Cohen's kappa label agreement (operators/profile.py:label_agreement):
hand-computed confusion-matrix cases + the degenerate-marginal pin."""

from __future__ import annotations

import pytest

from adenhq_hive_spark.operators.profile import label_agreement


def _rows(spark, pairs):
    return spark.createDataFrame(
        [("g", a, b) for a, b in pairs], "grp string, a string, b string"
    )


def test_kappa_textbook_case(spark):
    # Classic 2x2: n=100, raters agree on 45 yes + 35 no; marginals
    # a: 60 yes/40 no, b: 50 yes/50 no.
    # po = 0.80; pe = .6*.5 + .4*.5 = 0.50; kappa = 0.6
    pairs = (
        [("y", "y")] * 45
        + [("y", "n")] * 15
        + [("n", "y")] * 5
        + [("n", "n")] * 35
    )
    out = label_agreement(_rows(spark, pairs), "a", "b", "grp").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n, r.agree) == (100, 80)
    assert r.po_r6 == pytest.approx(0.80)
    assert r.pe_r6 == pytest.approx(0.50)
    assert r.kappa_r6 == pytest.approx(0.60)


def test_kappa_chance_only_agreement_is_zero(spark):
    # Independent raters at the same 50/50 marginal: po == pe -> kappa 0
    pairs = [("y", "y"), ("y", "n"), ("n", "y"), ("n", "n")] * 10
    r = label_agreement(_rows(spark, pairs), "a", "b", "grp").collect()[0]
    assert r.kappa_r6 == pytest.approx(0.0)
    assert r.po_r6 == r.pe_r6 == pytest.approx(0.5)


def test_kappa_degenerate_constant_raters_pins_one(spark):
    # Both raters constant on the same class: pe = 1 -> kappa pinned 1.0
    r = label_agreement(
        _rows(spark, [("x", "x")] * 7), "a", "b", "grp"
    ).collect()[0]
    assert (r.po_r6, r.pe_r6, r.kappa_r6) == (1.0, 1.0, 1.0)


def test_kappa_groups_and_global(spark):
    df = spark.createDataFrame(
        [("g1", "y", "y"), ("g1", "n", "n"), ("g2", "y", "n"),
         ("g2", "n", "y")],
        "grp string, a string, b string",
    )
    by_grp = {r.grp: r for r in label_agreement(df, "a", "b", "grp").collect()}
    assert by_grp["g1"].agree == 2 and by_grp["g2"].agree == 0
    # g1: po=1, pe=0.5 -> kappa 1; g2: po=0, pe=0.5 -> kappa -1
    assert by_grp["g1"].kappa_r6 == pytest.approx(1.0)
    assert by_grp["g2"].kappa_r6 == pytest.approx(-1.0)
    # global (no group): po=0.5, pe=0.5 -> kappa 0
    g = label_agreement(df, "a", "b").collect()[0]
    assert g.n == 4 and g.kappa_r6 == pytest.approx(0.0)


def test_kappa_class_present_in_one_rater_only(spark):
    # class 'z' appears only in rater b: contributes 0 to pe, po counts
    # only exact matches — exercises the inner marginal join
    pairs = [("y", "y"), ("y", "z"), ("n", "n"), ("n", "z")]
    r = label_agreement(_rows(spark, pairs), "a", "b", "grp").collect()[0]
    # n=4 agree=2 po=.5; marginals a: y2 n2; b: y1 n1 z2
    # pe = (2*1 + 2*1)/16 = 0.25; kappa = (.5-.25)/.75 = 1/3
    assert r.po_r6 == pytest.approx(0.5)
    assert r.pe_r6 == pytest.approx(0.25)
    assert r.kappa_r6 == pytest.approx(round(1 / 3, 6))


def test_classification_report_hand_computed(spark):
    from adenhq_hive_spark.operators.profile import classification_report

    df = spark.createDataFrame(
        # truth: a,a,a,b,b,c ; pred: a,b,a,b,b,a  — and 'd' never occurs
        [("a", "a"), ("a", "b"), ("a", "a"), ("b", "b"), ("b", "b"),
         ("c", "a")],
        "t string, p string",
    )
    rows = {r.cls: r for r in classification_report(df, "t", "p").collect()}
    # class a: tp=2, n_truth=3, n_pred=3 -> p=2/3 r=2/3 f1=4/6
    assert rows["a"].tp == 2
    assert rows["a"].precision_r6 == pytest.approx(round(2 / 3, 6))
    assert rows["a"].recall_r6 == pytest.approx(round(2 / 3, 6))
    assert rows["a"].f1_r6 == pytest.approx(round(4 / 6, 6))
    # class b: tp=2, n_truth=2, n_pred=3 -> p=2/3 r=1 f1=4/5
    assert rows["b"].precision_r6 == pytest.approx(round(2 / 3, 6))
    assert rows["b"].recall_r6 == pytest.approx(1.0)
    assert rows["b"].f1_r6 == pytest.approx(0.8)
    # class c: truth-only -> n_pred=0, precision pinned 0.0, recall 0
    assert rows["c"].n_pred == 0 and rows["c"].tp == 0
    assert rows["c"].precision_r6 == 0.0
    assert rows["c"].recall_r6 == 0.0 and rows["c"].f1_r6 == 0.0
    assert set(rows) == {"a", "b", "c"}


def test_classification_report_pred_only_class(spark):
    from adenhq_hive_spark.operators.profile import classification_report

    df = spark.createDataFrame(
        [("x", "y"), ("x", "x")], "t string, p string"
    )
    rows = {r.cls: r for r in classification_report(df, "t", "p").collect()}
    # 'y' appears only in pred: n_truth=0, recall pinned 0.0
    assert rows["y"].n_truth == 0 and rows["y"].recall_r6 == 0.0
    assert rows["y"].precision_r6 == 0.0  # tp=0 / n_pred=1
    assert rows["x"].f1_r6 == pytest.approx(round(2 / 3, 6))


# ---- Krippendorff's alpha ----------------------------------------------------


def test_kripp_alpha_hand_case(spark):
    from adenhq_hive_spark.operators.profile import kripp_alpha

    # 4 units (a,a),(a,b),(b,b),(b,b): n=8, n_a=3, n_b=5, S=34, D=2
    # alpha = 1 - 2*7/(64-34) = 1 - 14/30 = 0.533333
    df = spark.createDataFrame(
        [("s", "a", "a"), ("s", "a", "b"), ("s", "b", "b"), ("s", "b", "b")],
        "source string, la string, lb string",
    )
    out = kripp_alpha(df, "la", "lb", group_col="source").collect()
    assert [tuple(r) for r in out] == [("s", 4, 1, 0.533333)]


def test_kripp_alpha_degenerate_and_bounds(spark):
    from adenhq_hive_spark.operators.profile import kripp_alpha

    # every value identical -> De = 0 -> pinned 1.0
    same = spark.createDataFrame(
        [("s", "a", "a")] * 3, "source string, la string, lb string"
    )
    assert kripp_alpha(same, "la", "lb", "source").collect()[0].alpha_r6 == 1.0
    # perfect agreement on a mixed distribution -> alpha = 1
    perfect = spark.createDataFrame(
        [("s", "a", "a"), ("s", "b", "b"), ("s", "c", "c")],
        "source string, la string, lb string",
    )
    assert (
        kripp_alpha(perfect, "la", "lb", "source").collect()[0].alpha_r6
        == 1.0
    )
    # systematic disagreement scores NEGATIVE (worse than chance)
    worst = spark.createDataFrame(
        [("s", "a", "b"), ("s", "b", "a")] * 3,
        "source string, la string, lb string",
    )
    assert kripp_alpha(worst, "la", "lb", "source").collect()[0].alpha_r6 < 0


def test_kripp_alpha_matches_reference_formula(spark):
    """Pin against a direct Python evaluation of the nominal two-rater
    formula on a pseudo-random label table."""
    from collections import Counter

    from adenhq_hive_spark.operators.profile import kripp_alpha

    import hashlib

    def lab(i, salt):
        return "abc"[int(hashlib.md5(f"{salt}_{i}".encode()).hexdigest(), 16) % 3]

    rows = [("s", lab(i, "x"), lab(i, "y")) for i in range(200)]
    df = spark.createDataFrame(rows, "source string, la string, lb string")
    got = kripp_alpha(df, "la", "lb", "source").collect()[0]

    pooled = Counter()
    disagree = 0
    for _, a, b in rows:
        pooled[a] += 1
        pooled[b] += 1
        disagree += a != b
    n = 2 * len(rows)
    s = sum(v * v for v in pooled.values())
    expect = 1.0 - (2 * disagree * (n - 1)) / (n * n - s)
    assert got.alpha_r6 == round(expect, 6)
    assert got.n_units == 200 and got.disagree == disagree
