from __future__ import annotations

import pytest

from adenhq_hive_spark.operators.basket import copurchase_lift


@pytest.fixture(scope="module")
def baskets(spark):
    # b1: {x, y, z}; b2: {x, y}; b3: {x, z}; b4: {y}
    rows = [(1, "x"), (1, "y"), (1, "z"),
            (2, "x"), (2, "y"),
            (3, "x"), (3, "z"),
            (4, "y")]
    return spark.createDataFrame(rows, ["order_id", "item"])


def test_copurchase_support_and_lift_golden(baskets):
    out = {(r.item_a, r.item_b): (r.support, r.lift_ppm)
           for r in copurchase_lift(baskets, "order_id", "item",
                                    min_support=2).collect()}
    # (x,y) in b1,b2: support 2; n_x=3, n_y=3, N=4 -> lift 8/9
    assert out[("x", "y")] == (2, (2 * 4 * 1_000_000) // (3 * 3))
    # (x,z) in b1,b3: support 2; n_z=2 -> lift 8/6 > 1
    assert out[("x", "z")] == (2, (2 * 4 * 1_000_000) // (3 * 2))
    assert out[("x", "z")][1] > 1_000_000  # positively associated
    # (y,z) co-occur once only -> filtered by support
    assert ("y", "z") not in out
    assert len(out) == 2


def test_copurchase_duplicate_lines_count_once(spark):
    # the same item twice in one basket must not inflate support
    rows = [(1, "x"), (1, "x"), (1, "y"), (2, "x"), (2, "y")]
    df = spark.createDataFrame(rows, ["order_id", "item"])
    out = copurchase_lift(df, "order_id", "item", min_support=2).collect()
    assert len(out) == 1 and out[0].support == 2


def test_copurchase_mega_basket_capped(spark):
    """A basket over max_basket is dropped before the pair join — and
    its items' counts and the basket total shrink consistently."""
    rows = [(1, f"i{k}") for k in range(10)] + [
        (2, "i0"), (2, "i1"), (3, "i0"), (3, "i1")]
    df = spark.createDataFrame(rows, ["order_id", "item"])
    out = copurchase_lift(df, "order_id", "item", min_support=2,
                          max_basket=5).collect()
    # only baskets 2 and 3 remain: pair (i0,i1) support 2, N=2, n=2,2
    assert len(out) == 1
    r = out[0]
    assert (r.item_a, r.item_b, r.support) == ("i0", "i1", 2)
    assert r.lift_ppm == (2 * 2 * 1_000_000) // (2 * 2)


def test_copurchase_rejects_bad_support(baskets):
    with pytest.raises(ValueError):
        copurchase_lift(baskets, "order_id", "item", min_support=0)


def test_item_cosine_topk_golden(spark):
    from adenhq_hive_spark.operators.basket import item_cosine_topk

    # b1: {x,y}; b2: {x,y}; b3: {x,z}; b4: {x,z}; b5: {y,z}
    rows = [(1, "x"), (1, "y"), (2, "x"), (2, "y"),
            (3, "x"), (3, "z"), (4, "x"), (4, "z"),
            (5, "y"), (5, "z")]
    df = spark.createDataFrame(rows, ["order_id", "item"])
    out = {(r.item_a, r.rank): (r.item_b, r.cosine)
           for r in item_cosine_topk(df, "order_id", "item",
                                     k=2).collect()}
    # n_x=4, n_y=3, n_z=3; c_xy=2, c_xz=2, c_yz=1 (below support)
    import math
    cxy = round(2 / math.sqrt(4 * 3), 4)
    # x's best neighbors: y and z tie at the same cosine -> id tiebreak
    assert out[("x", 1)] == ("y", cxy)
    assert out[("x", 2)] == ("z", cxy)
    # y sees only x (yz filtered by min_support)
    assert out[("y", 1)] == ("x", cxy)
    assert ("y", 2) not in out


def test_item_cosine_symmetry_and_rank_bounds(spark):
    from adenhq_hive_spark.operators.basket import item_cosine_topk

    rows = [(o, f"i{(o * p) % 7}") for o in range(1, 40)
            for p in (1, 2, 3)]
    df = spark.createDataFrame(rows, ["order_id", "item"])
    out = item_cosine_topk(df, "order_id", "item", k=3).collect()
    per_item = {}
    for r in out:
        per_item.setdefault(r.item_a, []).append(r.rank)
        assert 0 < r.cosine <= 1.0001
    for ranks in per_item.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_association_rules_directional_confidence(baskets):
    from adenhq_hive_spark.operators.basket import association_rules

    out = {(r.antecedent, r.consequent): (r.support, r.conf_ppm)
           for r in association_rules(baskets, "order_id",
                                      "item").collect()}
    # x in 3 baskets, y in 3, z in 2; (x,y) support 2; (x,z) support 2
    assert out[("x", "y")] == (2, (2 * 1_000_000) // 3)
    assert out[("y", "x")] == (2, (2 * 1_000_000) // 3)
    # asymmetry shows on (x,z): P(z|x)=2/3 vs P(x|z)=2/2
    assert out[("x", "z")] == (2, (2 * 1_000_000) // 3)
    assert out[("z", "x")] == (2, 1_000_000)
