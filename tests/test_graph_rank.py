from __future__ import annotations

from adenhq_hive_spark.operators.graph_rank import SCALE, pagerank_int

import pytest


def _ranks(df):
    return {r.node: r.rank_scaled for r in df.collect()}


def test_pagerank_hub_ranks_highest(spark):
    # star: a,b,c,d all point at hub (and back, so nothing dangles)
    edges = [("a", "hub"), ("b", "hub"), ("c", "hub"), ("d", "hub"),
             ("hub", "a"), ("hub", "b"), ("hub", "c"), ("hub", "d")]
    pr = _ranks(pagerank_int(
        spark.createDataFrame(edges, ["src", "dst"]), iterations=4))
    assert max(pr, key=pr.get) == "hub"
    # spokes are symmetric → identical ranks
    assert len({pr[n] for n in "abcd"}) == 1


def test_pagerank_mass_conservation_bound(spark):
    """Total scaled mass never exceeds SCALE (truncating divisions only
    lose mass) and stays within rounding slack of it on a graph with no
    dangling nodes."""
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("b", "a")]
    pr = _ranks(pagerank_int(
        spark.createDataFrame(edges, ["src", "dst"]), iterations=5))
    total = sum(pr.values())
    assert total <= SCALE
    assert total >= SCALE - 1000  # few units lost per truncation


def test_pagerank_dangling_mass_dropped(spark):
    """A node with no out-edges keeps only its teleport share in the
    next iteration's inputs — documented drop-the-mass semantics."""
    edges = [("a", "sink")]  # sink never emits
    pr = _ranks(pagerank_int(
        spark.createDataFrame(edges, ["src", "dst"]), iterations=1))
    init = SCALE // 2
    teleport = (15 * init) // 100
    assert pr["a"] == teleport  # nothing points at a
    assert pr["sink"] == teleport + (85 * init) // 100


def test_pagerank_stable_under_repartition(spark):
    edges = [(f"n{i}", f"n{(i * 7 + 3) % 23}") for i in range(46)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    a = _ranks(pagerank_int(df, iterations=3))
    b = _ranks(pagerank_int(df.repartition(13), iterations=3))
    assert a == b


def test_pagerank_rejects_bad_params(spark):
    df = spark.createDataFrame([("a", "b")], ["src", "dst"])
    with pytest.raises(ValueError):
        pagerank_int(df, iterations=0)
    with pytest.raises(ValueError):
        pagerank_int(df, damping_pct=101)


def test_personalized_pagerank_proximity_to_seed(spark):
    """In a two-cluster graph with the seed in cluster A, A-nodes must
    outrank the structurally-identical B-nodes."""
    from adenhq_hive_spark.operators.graph_rank import (
        personalized_pagerank_int,
    )

    def ring(names):
        return [(names[i], names[(i + 1) % len(names)])
                for i in range(len(names))] + [
            (names[(i + 1) % len(names)], names[i])
            for i in range(len(names))
        ]

    a = ["a1", "a2", "a3"]
    b = ["b1", "b2", "b3"]
    edges = ring(a) + ring(b) + [("a1", "b1"), ("b1", "a1")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    seeds = spark.createDataFrame([("a1",)], ["node"])
    pr = {r.node: r.rank_scaled
          for r in personalized_pagerank_int(df, seeds,
                                             iterations=4).collect()}
    assert pr["a1"] == max(pr.values())
    assert min(pr[n] for n in a) > max(pr[n] for n in b)


def test_personalized_pagerank_rejects_disjoint_seeds(spark):
    import pytest as _pytest

    from adenhq_hive_spark.operators.graph_rank import (
        personalized_pagerank_int,
    )

    df = spark.createDataFrame([("a", "b")], ["src", "dst"])
    seeds = spark.createDataFrame([("zzz",)], ["node"])
    with _pytest.raises(ValueError, match="no seed overlaps"):
        personalized_pagerank_int(df, seeds)


def test_label_propagation_two_cliques(spark):
    """Two 4-cliques joined by one bridge edge resolve to two
    communities labeled by each clique's lexicographic minimum — the
    in-clique majority (3 same-label neighbors) outvotes the single
    bridge label. (Triangles would NOT be stable here: with all
    neighbor labels tied at count 1 the min-label tiebreak floods
    across the bridge — inherent to synchronous LPA, not a bug.)"""
    from adenhq_hive_spark.operators.graph_rank import label_propagation

    def clique(names):
        return [(a, b) for a in names for b in names if a != b]

    a = ["a1", "a2", "a3", "a4"]
    b = ["b1", "b2", "b3", "b4"]
    edges = clique(a) + clique(b) + [("a1", "b1"), ("b1", "a1")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = {r.node: r.community
           for r in label_propagation(df, iterations=3).collect()}
    assert all(out[n] == "a1" for n in a)
    assert all(out[n] == "b1" for n in b)


def test_label_propagation_deterministic_under_repartition(spark):
    from adenhq_hive_spark.operators.graph_rank import label_propagation

    edges = [(f"n{i}", f"n{(i * 5 + 2) % 17}") for i in range(34)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    a = sorted(map(tuple, label_propagation(df, iterations=2).collect()))
    b = sorted(map(tuple, label_propagation(
        df.repartition(9), iterations=2).collect()))
    assert a == b


def test_label_propagation_rejects_bad_iterations(spark):
    import pytest as _pytest

    from adenhq_hive_spark.operators.graph_rank import label_propagation

    df = spark.createDataFrame([("a", "b")], ["src", "dst"])
    with _pytest.raises(ValueError):
        label_propagation(df, iterations=0)


def test_checkpoint_every_matches_unchunked_plan(spark):
    from adenhq_hive_spark.operators.graph_rank import pagerank_int

    edges = [(f"n{i}", f"n{(i * 3 + 1) % 13}") for i in range(26)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    plain = sorted(map(tuple, pagerank_int(df, iterations=6).collect()))
    chunked = sorted(map(tuple, pagerank_int(
        df, iterations=6, checkpoint_every=2).collect()))
    assert plain == chunked


def test_long_walk_bounded_with_checkpoint_every(spark):
    """25 iterations unroll 25 join+agg rounds into one plan; periodic
    localCheckpoint keeps analyzer/codegen time bounded (r5 verdict #6).
    The generous wall bound is an analyzer-blowup tripwire, not a perf
    benchmark."""
    import time

    from adenhq_hive_spark.operators.graph_rank import (
        label_propagation,
        personalized_pagerank_int,
    )

    edges = [(f"n{i}", f"n{(i * 7 + 3) % 41}") for i in range(82)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    seeds = spark.createDataFrame([("n1",)], ["node"])
    t0 = time.perf_counter()
    out = personalized_pagerank_int(
        df, seeds, iterations=25, checkpoint_every=5
    ).collect()
    assert len(out) == 82 and all(r.rank_scaled >= 0 for r in out)
    lp = label_propagation(df, iterations=25, checkpoint_every=5).count()
    assert lp == 82
    assert time.perf_counter() - t0 < 120


def test_repeat_invocations_leave_no_cache_entries(spark):
    """cache() entries live in the CacheManager until an explicit
    unpersist; the rank operators use localCheckpoint instead, so
    repeated invocations in one session must not accumulate tracked
    cache entries (r5 advice: graph_rank cache leak)."""
    from adenhq_hive_spark.operators.graph_rank import pagerank_int

    edges = [(f"n{i}", f"n{(i + 1) % 9}") for i in range(9)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    jcm = spark._jsparkSession.sharedState().cacheManager()
    before = jcm.isEmpty()
    for _ in range(3):
        pagerank_int(df, iterations=2).count()
    assert jcm.isEmpty() == before
