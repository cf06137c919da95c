"""Misra-Gries heavy hitters: merge-rule guarantees + sketch-then-verify
exactness (operators/sketch.py)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from adenhq_hive_spark.operators.sketch import (
    heavy_hitters,
    mg_merge,
    misra_gries_reference,
)


def _stream():
    # 1000 items: 'hot' 300x, 'warm' 150x, 50 cold items 11x each
    s = ["hot"] * 300 + ["warm"] * 150 + [f"c{i}" for i in range(50) for _ in range(11)]
    return s


def test_mg_merge_matches_reference_guarantees():
    stream = _stream()
    n, cap = len(stream), 8
    # vectorized path: merge in 10 arbitrary batches
    sk = pd.Series(dtype="int64")
    step = len(stream) // 10
    for i in range(0, len(stream), step):
        batch = pd.Series(stream[i : i + step]).value_counts()
        sk = mg_merge(sk, batch, cap)
    ref = misra_gries_reference(stream, cap)
    true = pd.Series(stream).value_counts()
    for sketch in (sk, pd.Series(ref)):
        assert len(sketch) <= cap
        # superset guarantee: every item with count > n/cap survives
        for item, cnt in true.items():
            if cnt > n / cap:
                assert item in sketch.index, item
        # undercount bound: counter >= true - n/cap, never overcount
        for item in sketch.index:
            assert sketch[item] <= true[item]
            assert sketch[item] >= true[item] - n / cap


def test_heavy_hitters_exact_counts_and_threshold(spark):
    # 10 docs x 10 tokens = 100 occurrences; 'hh' appears 30x (3000bp),
    # 'mid' 10x (1000bp), everything else below
    docs = []
    for i in range(10):
        words = ["hh"] * 3 + ["mid"] + [f"u{i}_{j}" for j in range(6)]
        docs.append((i, " ".join(words)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = heavy_hitters(df, min_share_bp=1000, capacity=64).collect()
    assert [(r.token, r.n, r.share_bp) for r in rows] == [
        ("hh", 30, 3000),
        ("mid", 10, 1000),
    ]


def test_heavy_hitters_survives_adversarial_partitioning(spark):
    # the heavy token is spread evenly over 16 partitions: the pigeonhole
    # argument (count_p > N_p/m in at least one partition) must still
    # produce it as a candidate
    docs = [(i, "hh " + " ".join(f"u{i}_{j}" for j in range(9))) for i in range(160)]
    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(16)
    rows = heavy_hitters(df, min_share_bp=500, capacity=32).collect()
    assert [(r.token, r.n) for r in rows] == [("hh", 160)]  # 1000bp


def test_heavy_hitters_capacity_guard_and_empty(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="capacity"):
        heavy_hitters(df, min_share_bp=10, capacity=100)
    empty = spark.createDataFrame([(1, "")], "doc_id long, text string")
    out = heavy_hitters(empty, min_share_bp=100, capacity=128)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["token", "n", "share_bp"]


# ---- portable HyperLogLog --------------------------------------------------


def test_hll_registers_dense_and_merge_is_max(spark):
    from pyspark.sql import functions as F

    from adenhq_hive_spark.operators.sketch import hll_registers

    a = spark.range(0, 500).select(F.col("id").alias("v"))
    b = spark.range(400, 900).select(F.col("id").alias("v"))
    ra = {r.register: r.rho_max
          for r in hll_registers(a, "v").collect()}
    rb = {r.register: r.rho_max
          for r in hll_registers(b, "v").collect()}
    runion = {r.register: r.rho_max
              for r in hll_registers(a.union(b), "v").collect()}
    assert len(ra) == 64 and len(runion) == 64  # dense, empties included
    assert runion == {k: max(ra[k], rb[k]) for k in ra}


def test_hll_estimate_within_error_envelope(spark):
    """Raw HLL with m=64 has RSE ~1.04/sqrt(64) = 13%; gate at 3 sigma."""
    from pyspark.sql import functions as F

    from adenhq_hive_spark.operators.sketch import hll_estimate

    df = spark.range(0, 5000).select(F.col("id").alias("v"))
    row = hll_estimate(df, "v").collect()[0]
    assert row.n_exact == 5000
    assert abs(row.estimate - 5000) <= 0.39 * 5000


def test_hll_stable_under_repartition(spark):
    from pyspark.sql import functions as F

    from adenhq_hive_spark.operators.sketch import hll_estimate

    df = spark.range(0, 3000).select(F.col("id").alias("v"))
    e1 = hll_estimate(df, "v").collect()[0].estimate
    e2 = hll_estimate(df.repartition(17), "v").collect()[0].estimate
    assert e1 == e2


def test_hll_rejects_bad_params(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from adenhq_hive_spark.operators.sketch import hll_registers

    df = spark.range(3).select(F.col("id").alias("v"))
    with _pytest.raises(ValueError):
        hll_registers(df, "v", n_registers=0)


def test_hll_grouped_matches_global_per_group(spark):
    """The grouped estimator on one group's rows must equal the global
    estimator run on that subset — same algebra, just keyed."""
    from pyspark.sql import functions as F

    from adenhq_hive_spark.operators.sketch import (
        hll_estimate,
        hll_estimate_grouped,
    )

    df = spark.range(0, 2000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.col("id").alias("v"),
    )
    grouped = {r.g: (r.estimate, r.n_exact)
               for r in hll_estimate_grouped(df, "v", "g").collect()}
    for g in ("0", "1", "2"):
        sub = df.filter(F.col("g") == g)
        row = hll_estimate(sub, "v").collect()[0]
        assert grouped[g] == (row.estimate, row.n_exact)


def test_hll_rejects_unpublished_register_counts(spark):
    """alpha must come from the published Flajolet constant table —
    a free-form m would silently bias the estimate (r5 advice)."""
    import pytest as _pytest

    from adenhq_hive_spark.operators.sketch import (
        hll_estimate,
        hll_estimate_grouped,
    )

    df = spark.createDataFrame([(i, "s") for i in range(50)], ["v", "g"])
    with _pytest.raises(ValueError, match="n_registers"):
        hll_estimate(df, "v", n_registers=128)
    with _pytest.raises(ValueError, match="n_registers"):
        hll_estimate_grouped(df, "v", "g", n_registers=100)
    # the published small-m constants all work
    for m in (16, 32, 64):
        assert hll_estimate(df, "v", n_registers=m).count() == 1


def test_mg_merge_np_matches_pandas():
    import numpy as np

    from adenhq_hive_spark.operators.sketch import mg_merge_np

    rng = np.random.default_rng(7)
    cap = 64
    # heavy head + unique tail, merged in 5 batches through both paths
    sk_pd = pd.Series(dtype="int64")
    sk_v = np.empty(0, dtype=np.int64)
    sk_c = np.empty(0, dtype=np.int64)
    for _ in range(5):
        batch = np.concatenate([
            rng.integers(0, 20, 3000),          # heavy head keys
            rng.integers(10**9, 2**60, 5000),   # near-unique tail
        ])
        b_v, b_c = np.unique(batch, return_counts=True)
        sk_pd = mg_merge(sk_pd, pd.Series(batch).value_counts(), cap)
        sk_v, sk_c = mg_merge_np(sk_v, sk_c, b_v, b_c, cap)
    got = dict(zip(sk_v.tolist(), sk_c.tolist()))
    want = {int(k): int(v) for k, v in sk_pd.items()}
    assert got == want
    assert len(got) <= cap
    assert list(sk_v) == sorted(sk_v)


def test_mg_merge_np_property_guarantees():
    """Property-based: for ANY stream, chunking, and capacity, the numpy
    merge path keeps the MG invariants — size <= capacity, superset of
    every item with count > N/cap, and counter error <= N/cap."""
    import numpy as np
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from adenhq_hive_spark.operators.sketch import mg_merge_np

    @settings(max_examples=60, deadline=None)
    @given(
        stream=st.lists(
            st.integers(min_value=-(2**40), max_value=2**40),
            min_size=0,
            max_size=2000,
        ),
        cap=st.integers(min_value=1, max_value=64),
        n_chunks=st.integers(min_value=1, max_value=5),
    )
    def check(stream, cap, n_chunks):
        sk_v = np.empty(0, dtype=np.int64)
        sk_c = np.empty(0, dtype=np.int64)
        step = max(1, len(stream) // n_chunks + 1)
        for i in range(0, max(len(stream), 1), step):
            part = np.asarray(stream[i : i + step], dtype=np.int64)
            if len(part) == 0:
                continue
            b_v, b_c = np.unique(part, return_counts=True)
            sk_v, sk_c = mg_merge_np(sk_v, sk_c, b_v, b_c, cap)
        sk = dict(zip(sk_v.tolist(), sk_c.tolist()))
        n = len(stream)
        true = Counter(stream)
        assert len(sk) <= cap
        for item, cnt in true.items():
            if cnt > n / cap:
                assert item in sk, (item, cnt, n, cap)
        for item, c in sk.items():
            assert c <= true[item]
            assert c >= true[item] - n / cap

    check()


# ---- Count-Min Sketch -------------------------------------------------------


def _cms_df(spark):
    # 40 'hot', 10 'mid', 50 singletons -> 100 values
    vals = ["hot"] * 40 + ["mid"] * 10 + [f"u{i}" for i in range(50)]
    return spark.createDataFrame([(v,) for v in vals], "v string")


def test_cms_counters_dense_and_row_sums(spark):
    from adenhq_hive_spark.operators.sketch import cms_counters

    out = cms_counters(_cms_df(spark), "v", depth=3, width=32).collect()
    # dense grid: exactly depth*width rows, every (row, bucket) once
    assert len(out) == 3 * 32
    assert len({(r.row, r.bucket) for r in out}) == 3 * 32
    # each hash row counts every input exactly once
    sums = {}
    for r in out:
        sums[r.row] = sums.get(r.row, 0) + r.cnt
    assert sums == {0: 100, 1: 100, 2: 100}


def test_cms_merge_is_elementwise_sum(spark):
    from adenhq_hive_spark.operators.sketch import cms_counters

    vals = [f"t{i % 7}" for i in range(60)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i long, v string"
    )
    a = df.filter("i < 30")
    b = df.filter("i >= 30")
    key = lambda rows: {(r.row, r.bucket): r.cnt for r in rows}
    whole = key(cms_counters(df, "v", depth=2, width=16).collect())
    pa = key(cms_counters(a, "v", depth=2, width=16).collect())
    pb = key(cms_counters(b, "v", depth=2, width=16).collect())
    assert whole == {k: pa[k] + pb[k] for k in pa}


def test_cms_point_estimates_one_sided(spark):
    from adenhq_hive_spark.operators.sketch import cms_point_estimates

    rows = cms_point_estimates(
        _cms_df(spark), "v", depth=4, width=16, top_n=5
    ).collect()
    assert rows[0].value == "hot" and rows[0].n_exact == 40
    # CMS can only overcount, never undercount
    for r in rows:
        assert r.est_cms >= r.n_exact, (r.value, r.est_cms, r.n_exact)


def test_cms_rejects_bad_params(spark):
    from adenhq_hive_spark.operators.sketch import cms_counters

    with pytest.raises(ValueError):
        cms_counters(_cms_df(spark), "v", depth=0, width=16)
    with pytest.raises(ValueError):
        cms_counters(_cms_df(spark), "v", depth=4, width=0)


# ---- KMV distinct sketch ----------------------------------------------------


def test_kmv_exact_path_when_distinct_below_k(spark):
    from adenhq_hive_spark.operators.sketch import kmv_distinct

    df = spark.createDataFrame(
        [(i % 37,) for i in range(500)], "v long"
    )
    row = kmv_distinct(df, "v", k=256).collect()[0]
    assert row.n_kept == 37
    assert row.estimate == 37 == row.n_exact


def test_kmv_estimate_within_error_envelope(spark):
    from adenhq_hive_spark.operators.sketch import kmv_distinct

    n = 5000
    df = spark.createDataFrame([(i,) for i in range(n)], "v long")
    row = kmv_distinct(df, "v", k=256).collect()[0]
    assert row.n_kept == 256
    assert row.n_exact == n
    # stderr ~ 1/sqrt(k) ~ 6.3%; gate at 4 sigma
    assert abs(row.estimate - n) < 0.25 * n, row.estimate


def test_kmv_prefilter_parity_and_partition_stability(spark):
    """The numpy partition-local k-min prefilter must be lossless: the
    result equals the plain distinct-sort-limit plan and is invariant
    under repartitioning."""
    from pyspark.sql import functions as F

    from adenhq_hive_spark.operators.sketch import kmv_distinct

    df = spark.createDataFrame([(i * 7 % 1999,) for i in range(4000)],
                               "v long")
    base = kmv_distinct(df, "v", k=64).collect()[0]
    shuffled = kmv_distinct(df.repartition(16), "v", k=64).collect()[0]
    assert base == shuffled
    # both lossless k-min plans agree (r9 prefilter modes), under
    # adversarial partitioning too
    np_plan = kmv_distinct(df, "v", k=64, prefilter="numpy").collect()[0]
    np_shuf = kmv_distinct(
        df.repartition(16), "v", k=64, prefilter="numpy"
    ).collect()[0]
    assert base == np_plan == np_shuf
    import pytest as _pytest

    with _pytest.raises(ValueError):
        kmv_distinct(df, "v", k=64, prefilter="heap")
    plain_kth = (
        df.select(
            F.conv(F.substring(F.md5(F.col("v").cast("string")), 1, 8),
                   16, 10).cast("long").alias("hv")
        )
        .distinct()
        .orderBy("hv")
        .limit(64)
        .agg(F.max("hv"))
        .collect()[0][0]
    )
    assert base.kth_hash == plain_kth


def test_kmv_rejects_bad_k(spark):
    from adenhq_hive_spark.operators.sketch import kmv_distinct

    df = spark.createDataFrame([(1,)], "v long")
    with pytest.raises(ValueError):
        kmv_distinct(df, "v", k=1)


# ---- HDR log-histogram quantile sketch --------------------------------------


def test_hist_bucket_monotone_and_bounded(spark):
    """Bucket map is monotone non-decreasing in v and the lower-bound
    inverse brackets v within the 12.5% octave width."""
    from adenhq_hive_spark.operators.sketch import (
        hist_bucket_lb_sql,
        hist_bucket_sql,
    )

    vals = list(range(0, 70)) + [127, 128, 1000, 10**6, 10**12, 2**62]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    rows = (
        df.select(
            "v",
            F.expr(hist_bucket_sql("v")).alias("b"),
        )
        .withColumn("lb", F.expr(hist_bucket_lb_sql("b")))
        .orderBy("v")
        .collect()
    )
    prev_b = -1
    for r in rows:
        assert r.b >= prev_b, f"bucket not monotone at v={r.v}"
        prev_b = r.b
        assert r.lb <= r.v, f"lb {r.lb} > v {r.v}"
        if r.v > 15:
            # bucket spans [lb, lb + lb/8): relative width <= 12.5%
            assert r.v < r.lb + (r.lb >> 3) + 1, f"v {r.v} outside bucket of lb {r.lb}"


def test_hist_quantiles_est_vs_exact_bound(spark):
    from adenhq_hive_spark.operators.sketch import hist_quantiles

    rows = [("a", i, v) for i, v in enumerate(range(1, 201))]
    rows += [("b", 1000 + i, 7) for i in range(50)]  # constant group
    df = spark.createDataFrame(
        rows, "source string, doc_id long, n_chars long"
    )
    out = hist_quantiles(df, "n_chars").collect()
    got = {(r.source, r.pct): r for r in out}
    assert len(got) == 6
    for r in out:
        assert r.est <= r.exact
        assert r.exact <= r.est + max(r.est >> 3, 1), (
            f"{r.source} p{r.pct}: est {r.est} too far below exact {r.exact}"
        )
    # constant group: every percentile is exactly 7, bucket 7 is exact
    for p in (50, 90, 99):
        assert got[("b", p)].est == 7 and got[("b", p)].exact == 7
    # group a: exact nearest-rank values are the values themselves
    assert got[("a", 50)].exact == 100
    assert got[("a", 99)].exact == 198


def test_hist_sketch_merge_is_count_sum(spark):
    """Histogram states from two shards sum to the whole-corpus state —
    the mergeable-summary contract (same as CMS elementwise add)."""
    from adenhq_hive_spark.operators.sketch import hist_bucket_sql

    rows = [(i, (i * 37) % 1000) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, v long")
    bucket = F.expr(hist_bucket_sql("v"))

    def hist(d):
        return {
            r.b: r.c
            for r in d.select(bucket.alias("b"))
            .groupBy("b")
            .agg(F.count("*").alias("c"))
            .collect()
        }

    whole = hist(df)
    h1 = hist(df.filter(F.col("id") < 200))
    h2 = hist(df.filter(F.col("id") >= 200))
    merged = dict(h1)
    for k, v in h2.items():
        merged[k] = merged.get(k, 0) + v
    assert merged == whole


def test_hist_quantiles_rejects_negative(spark):
    from adenhq_hive_spark.operators.sketch import hist_quantiles

    df = spark.createDataFrame(
        [("a", 1, -5)], "source string, doc_id long, n_chars long"
    )
    with pytest.raises(Exception, match="negative"):
        hist_quantiles(df, "n_chars").collect()


# ---- kmv_jaccard -------------------------------------------------------------


def _tok_df(spark, groups):
    rows = [(g, t) for g, toks in groups.items() for t in toks]
    return spark.createDataFrame(rows, "src string, tok string")


def test_kmv_jaccard_exact_below_k(spark):
    from adenhq_hive_spark.operators.sketch import kmv_jaccard

    # |union| = 150 < k=256: the union signature IS the union, so the
    # estimate equals exact Jaccard 50/150
    df = _tok_df(spark, {
        "a": [f"t{i}" for i in range(100)],
        "b": [f"t{i}" for i in range(50, 150)],
    })
    r = kmv_jaccard(df, "tok", "src", k=256).collect()
    assert len(r) == 1
    assert (r[0].src_a, r[0].src_b) == ("a", "b")
    assert r[0].k_used == 150 and r[0].n_both == 50
    assert r[0].jaccard_r6 == round(50 / 150, 6)


def test_kmv_jaccard_identical_and_disjoint(spark):
    from adenhq_hive_spark.operators.sketch import kmv_jaccard

    df = _tok_df(spark, {
        "a": [f"x{i}" for i in range(20)],
        "b": [f"x{i}" for i in range(20)],
        "c": [f"y{i}" for i in range(20)],
    })
    out = {(r.src_a, r.src_b): r for r in
           kmv_jaccard(df, "tok", "src", k=64).collect()}
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert out[("a", "b")].jaccard_r6 == 1.0
    assert out[("a", "c")].jaccard_r6 == 0.0
    assert out[("b", "c")].jaccard_r6 == 0.0


def test_kmv_jaccard_estimates_at_k_below_cardinality(spark):
    from adenhq_hive_spark.operators.sketch import kmv_jaccard

    # 1000-value sets sharing 500: true J = 500/1500 = 1/3; k=64 keeps
    # the union signature a sample — estimate lands near the truth
    df = _tok_df(spark, {
        "a": [f"v{i}" for i in range(1000)],
        "b": [f"v{i}" for i in range(500, 1500)],
    })
    r = kmv_jaccard(df, "tok", "src", k=64).collect()[0]
    assert r.k_used == 64
    assert abs(r.jaccard_r6 - 1 / 3) < 0.2


def test_kmv_jaccard_duplicates_do_not_move_the_estimate(spark):
    from adenhq_hive_spark.operators.sketch import kmv_jaccard

    base = {"a": ["p", "q", "r"], "b": ["q", "r", "s"]}
    dup = {"a": ["p", "q", "r"] * 7, "b": ["q", "r", "s"] * 3}
    r1 = kmv_jaccard(_tok_df(spark, base), "tok", "src", k=16).collect()
    r2 = kmv_jaccard(_tok_df(spark, dup), "tok", "src", k=16).collect()
    assert r1 == r2  # set semantics: multiplicity is invisible


def test_kmv_jaccard_rejects_tiny_k(spark):
    from adenhq_hive_spark.operators.sketch import kmv_jaccard

    df = _tok_df(spark, {"a": ["x"], "b": ["x"]})
    import pytest as _pytest

    with _pytest.raises(ValueError):
        kmv_jaccard(df, "tok", "src", k=1)


# ---- xxhash64 deployment mode (round 9) -------------------------------------
#
# The *_xxh query forms swap the md5 oracle hash for the codegen
# xxhash64 intrinsic (sketch._hash32).  DuckDB cannot replay xxhash64,
# so these gates pin the invariants that hold for ANY uniform hash —
# the same guarantees the md5 twins prove hash-exactly.


def test_cms_xxh_dense_row_sums_and_one_sided(spark):
    from adenhq_hive_spark.operators.sketch import (
        cms_counters,
        cms_point_estimates,
    )

    out = cms_counters(
        _cms_df(spark), "v", depth=3, width=32, hash_mode="xxh"
    ).collect()
    assert len(out) == 3 * 32
    sums = {}
    for r in out:
        sums[r.row] = sums.get(r.row, 0) + r.cnt
    assert sums == {0: 100, 1: 100, 2: 100}
    rows = cms_point_estimates(
        _cms_df(spark), "v", depth=4, width=16, top_n=5, hash_mode="xxh"
    ).collect()
    assert rows[0].value == "hot" and rows[0].n_exact == 40
    for r in rows:
        assert r.est_cms >= r.n_exact, (r.value, r.est_cms, r.n_exact)


def test_cms_xxh_differs_from_md5_but_same_mass(spark):
    """Same total mass per hash row, different bucket layout — proof the
    mode switch actually changes the hash rather than aliasing md5."""
    from adenhq_hive_spark.operators.sketch import cms_counters

    key = lambda rows: {(r.row, r.bucket): r.cnt for r in rows}
    a = key(cms_counters(_cms_df(spark), "v", depth=2, width=64).collect())
    b = key(
        cms_counters(
            _cms_df(spark), "v", depth=2, width=64, hash_mode="xxh"
        ).collect()
    )
    assert sum(a.values()) == sum(b.values()) == 2 * 100
    assert a != b


def test_kmv_xxh_exact_path_and_envelope(spark):
    from adenhq_hive_spark.operators.sketch import kmv_distinct

    small = spark.createDataFrame([(i % 37,) for i in range(500)], "v long")
    row = kmv_distinct(small, "v", k=256, hash_mode="xxh").collect()[0]
    assert row.n_kept == 37 and row.estimate == 37 == row.n_exact

    n = 5000
    big = spark.createDataFrame([(i,) for i in range(n)], "v long")
    row = kmv_distinct(big, "v", k=256, hash_mode="xxh").collect()[0]
    assert row.n_kept == 256 and row.n_exact == n
    # stderr ~ 1/sqrt(k) ~ 6.3%; gate at 4 sigma, same as the md5 form
    assert abs(row.estimate - n) < 0.25 * n, row.estimate


def test_kmv_jaccard_xxh_envelope(spark):
    from adenhq_hive_spark.operators.sketch import kmv_jaccard

    # two groups sharing half their 2000-value universe: J = 1/3
    rows = [("a", i) for i in range(1000)] + [
        ("b", i) for i in range(500, 1500)
    ]
    df = spark.createDataFrame(rows, "grp string, v long")
    out = kmv_jaccard(df, "v", "grp", k=256, hash_mode="xxh").collect()
    assert len(out) == 1
    r = out[0]
    assert r.k_used == 256
    # stderr ~ sqrt(J(1-J)/k) ~ 2.9%; gate at ~5 sigma
    assert abs(r.jaccard_r6 - 1 / 3) < 0.15, r.jaccard_r6


def test_xxh_mode_plans_never_touch_md5(spark):
    """The deployment forms must actually shed the md5 tax: their
    executed plans contain xxhash64 and NO md5 call anywhere."""
    from adenhq_hive_spark.operators.sketch import (
        cms_counters,
        kmv_distinct,
    )

    for df in (
        cms_counters(_cms_df(spark), "v", depth=2, width=16,
                     hash_mode="xxh"),
        kmv_distinct(_cms_df(spark), "v", k=16, hash_mode="xxh"),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "xxhash64" in plan
        assert "md5" not in plan


def test_hash32_rejects_unknown_mode(spark):
    import pytest as _pytest

    from adenhq_hive_spark.operators.sketch import kmv_distinct

    with _pytest.raises(ValueError):
        kmv_distinct(_cms_df(spark), "v", k=16, hash_mode="sha1")


def test_approx_quantile_witness_holds_and_rejects_bad_params(spark):
    """GK quantile witness (r9): rank_ok must hold on a skewed
    synthetic distribution (the guarantee is distribution-free), n
    must count non-null values only, and parameter validation."""
    from adenhq_hive_spark.operators.sketch import approx_quantile_witness

    rows = [(i, "a", float(i) ** 2) for i in range(3000)]
    rows += [(i, "b", 1.0) for i in range(2000)]  # massive tie block
    rows.append((99999, "a", None))
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    out = approx_quantile_witness(df, "v", "grp").collect()
    assert len(out) == 6
    assert all(r.rank_ok for r in out)
    assert {r.grp: r.n for r in out} == {"a": 3000, "b": 2000}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        approx_quantile_witness(df, "v", "grp", accuracy=10)
    with _pytest.raises(ValueError):
        approx_quantile_witness(df, "v", "grp", pcts=(0, 50, 99))
