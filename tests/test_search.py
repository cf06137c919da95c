"""Trigram-index search tests: exact parity with the full scan, prune
soundness (candidates are a superset of matches), short-needle fallback."""

from __future__ import annotations

from pyspark.sql import functions as F

from adenhq_hive_spark.catalog import load_table
from adenhq_hive_spark.operators.search import (
    _trigrams_of,
    build_trigram_postings,
    trigram_search,
)

from .conftest import SF_SMOKE


def test_trigrams_of():
    assert _trigrams_of("abcd") == ["abc", "bcd"]
    assert _trigrams_of("aaaa") == ["aaa"]          # distinct
    assert _trigrams_of("ab") == []


def test_search_equals_full_scan(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    needle = "spark window"
    got = [r.doc_id for r in trigram_search(docs, needle).collect()]
    want = sorted(
        r.doc_id
        for r in docs.filter(F.col("text").contains(needle)).collect()
    )
    assert got == want and len(got) > 0


def test_index_reuse_and_candidate_superset(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    postings = build_trigram_postings(docs).cache()
    needle = "merge batch"
    got = [
        r.doc_id
        for r in trigram_search(docs, needle, postings=postings).collect()
    ]
    want = sorted(
        r.doc_id
        for r in docs.filter(F.col("text").contains(needle)).collect()
    )
    assert got == want
    # prune soundness: every true match holds all needle trigrams
    tris = _trigrams_of(needle)
    cand = {
        r.id
        for r in postings.filter(F.col("trigram").isin(tris))
        .select(F.explode("ids").alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") == len(tris))
        .collect()
    }
    assert set(want) <= cand
    postings.unpersist()


def test_short_texts_emit_no_junk_postings(spark):
    # texts under 3 chars must contribute ZERO postings: Spark's
    # sequence(1, 0) is descending ([1, 0]) and would otherwise emit
    # sub-trigram junk keys (including '' for empty docs)
    docs = spark.createDataFrame(
        [(1, ""), (2, "ab"), (3, "abcd")], "doc_id long, text string"
    )
    rows = build_trigram_postings(docs).collect()
    got = {r.trigram: list(r.ids) for r in rows}
    assert got == {"abc": [3], "bcd": [3]}
    assert all(len(t) == 3 for t in got)


def test_hot_trigram_cap_bounds_posting_rows_and_stays_exact(spark):
    # a boilerplate trigram shared by every doc must become a TOMBSTONE
    # (hot=true, empty ids), never an unbounded id array
    rows = [(i, f"the common prefix uniq{i:03d}") for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    postings = build_trigram_postings(docs, max_trigram_df=10)
    by_tri = {r.trigram: r for r in postings.collect()}
    assert by_tri["the"].hot and by_tri["the"].ids == []
    assert all(len(r.ids) <= 10 for r in by_tri.values())
    # low-df trigrams keep real postings ("049" only in doc 49)
    assert by_tri["049"].ids == [49] and not by_tri["049"].hot

    def scan(needle):
        return sorted(
            r.doc_id
            for r in docs.filter(F.col("text").contains(needle)).collect()
        )

    # partially-hot needle ("the" hot, rest live) — exact via live prune
    for needle in ["the common", "uniq007", "common prefix uniq04"]:
        got = [
            r.doc_id
            for r in trigram_search(docs, needle, postings=postings).collect()
        ]
        assert got == scan(needle), needle
    # ALL-hot needle degrades to the exact scan
    all_hot = trigram_search(docs, "the c", postings=postings)
    assert [r.doc_id for r in all_hot.collect()] == scan("the c")
    # a trigram absent from the corpus -> provably empty, no scan
    assert trigram_search(docs, "zzzqqq", postings=postings).count() == 0


def test_update_postings_cap_demotes_grown_lists(spark):
    base = spark.createDataFrame(
        [(i, f"alpha uniq{i}") for i in range(3)], "doc_id long, text string"
    )
    delta = spark.createDataFrame(
        [(i, f"alpha uniq{i}") for i in range(3, 8)],
        "doc_id long, text string",
    )
    from adenhq_hive_spark.operators.search import update_trigram_postings

    postings = build_trigram_postings(base, max_trigram_df=4)
    merged = update_trigram_postings(postings, delta, max_trigram_df=4)
    by_tri = {r.trigram: r for r in merged.collect()}
    # "alp" df grows 3 -> 8, past the cap: demoted to tombstone
    assert by_tri["alp"].hot and by_tri["alp"].ids == []
    # still-small trigrams keep merged sorted ids ("iq1" only in doc 1)
    assert by_tri["iq1"].ids == [1] and not by_tri["iq1"].hot
    assert all(len(r.ids) <= 4 for r in by_tri.values())
    # search over the merged capped index still equals the scan
    full = base.unionByName(delta)
    got = [
        r.doc_id
        for r in trigram_search(full, "alpha uniq", postings=merged).collect()
    ]
    want = sorted(
        r.doc_id
        for r in full.filter(F.col("text").contains("alpha uniq")).collect()
    )
    assert got == want and len(got) == 8


def test_short_needle_falls_back_to_scan(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    got = [r.doc_id for r in trigram_search(docs, "ag").collect()]
    want = sorted(
        r.doc_id for r in docs.filter(F.col("text").contains("ag")).collect()
    )
    assert got == want


def test_persisted_index_bucket_pruned_probe(spark):
    from adenhq_hive_spark.operators.search import (
        save_trigram_index,
        trigram_search_indexed,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    spark.sql("DROP TABLE IF EXISTS t_tri_idx")
    save_trigram_index(docs, "t_tri_idx", buckets=16)
    try:
        needle = "spark window"
        out = trigram_search_indexed(docs, needle, "t_tri_idx")
        got = [r.doc_id for r in out.collect()]
        want = sorted(
            r.doc_id
            for r in docs.filter(F.col("text").contains(needle)).collect()
        )
        assert got == want and len(got) > 0
        # the probe scan is bucket-pruned: fewer buckets selected than
        # exist. Spark's planner auto-disables bucketed reading when no
        # join/agg uses the bucketing ("Bucketed: false (disabled by
        # query planner)"); turning autoBucketedScan off makes the
        # filter-only probe keep it — the configuration a search service
        # would run with.
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
        )
        try:
            tris = _trigrams_of(needle)
            probe = spark.table("t_tri_idx").filter(
                F.col("trigram").isin(tris)
            )
            plan = probe._jdf.queryExecution().executedPlan().toString()
            assert "SelectedBucketsCount" in plan
            m = [l for l in plan.splitlines()
                 if "SelectedBucketsCount" in l][0]
            import re
            sel, total = map(
                int, re.search(r"(\d+) out of (\d+)", m).groups()
            )
            assert total == 16 and sel < 16
        finally:
            spark.conf.set(
                "spark.sql.sources.bucketing.autoBucketedScan.enabled",
                "true",
            )
    finally:
        spark.sql("DROP TABLE IF EXISTS t_tri_idx")


def test_update_trigram_postings_equals_full_rebuild(spark):
    from adenhq_hive_spark.operators.search import (
        build_trigram_postings,
        update_trigram_postings,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    old = docs.filter("doc_id < 400")
    new = docs.filter("doc_id >= 400")
    merged = update_trigram_postings(build_trigram_postings(old), new)
    full = build_trigram_postings(docs)
    got = {r.trigram: list(r.ids) for r in merged.collect()}
    want = {r.trigram: list(r.ids) for r in full.collect()}
    assert got == want


def test_bm25_matches_python_reference(spark):
    import math

    from adenhq_hive_spark.operators.search import bm25_search

    rows = [
        (1, "spark window merge spark spark"),
        (2, "window only here with filler words"),
        (3, "no relevant terms at all present"),
        (4, "merge merge merge window spark extra tokens padding out"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = [(r.doc_id, r.rank, r.score)
           for r in bm25_search(df, ["spark", "window", "merge"], k=4).collect()]

    # python reference
    docs = {i: t.split() for i, t in rows}
    N = len(docs)
    avgdl = sum(len(v) for v in docs.values()) / N
    dfreq = {}
    for t in ("spark", "window", "merge"):
        dfreq[t] = sum(1 for v in docs.values() if t in v)
    want = []
    for i, v in docs.items():
        s = 0.0
        for t in ("spark", "window", "merge"):
            tf = v.count(t)
            if tf == 0:
                continue
            idf = math.log((N - dfreq[t] + 0.5) / (dfreq[t] + 0.5) + 1)
            s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(v) / avgdl))
        if s > 0:
            want.append((i, round(s, 4)))
    want.sort(key=lambda x: (-x[1], x[0]))
    assert got == [(i, r + 1, s) for r, (i, s) in enumerate(want)]
    assert got[0][0] in (1, 4) and all(g[0] != 3 for g in got)


def test_update_postings_never_materializes_hot_arrays(spark):
    """Incremental merge bounded-row discipline: a trigram crossing the
    cap via a big batch becomes a tombstone, the delta build itself is
    capped, and already-hot keys stay hot with empty ids."""
    from adenhq_hive_spark.operators.search import (
        build_trigram_postings,
        update_trigram_postings,
    )

    base = spark.createDataFrame(
        [(i, "xyz unique%d" % i) for i in range(2)],
        "doc_id long, text string",
    )
    idx = build_trigram_postings(base, max_trigram_df=3)
    batch = spark.createDataFrame(
        [(100 + i, "xyzq") for i in range(5)], "doc_id long, text string"
    )
    merged = update_trigram_postings(
        idx, batch, max_trigram_df=3
    ).collect()
    by_tri = {r["trigram"]: r for r in merged}
    # 'xyz' df: 2 (base) + 5 (batch) = 7 > 3 -> tombstone, no ids kept
    assert by_tri["xyz"]["hot"] and by_tri["xyz"]["ids"] == []
    # 'yzq' df: 5 (batch alone) > 3 -> the capped DELTA already demoted
    assert by_tri["yzq"]["hot"] and by_tri["yzq"]["ids"] == []
    # cool keys merge normally and stay sorted
    assert not by_tri["uni"]["hot"] and by_tri["uni"]["ids"] == [0, 1]
    # sticky: re-merge an empty-ish batch, hot keys stay tombstoned
    batch2 = spark.createDataFrame(
        [(200, "abc")], "doc_id long, text string"
    )
    again = {r["trigram"]: r for r in update_trigram_postings(
        spark.createDataFrame(merged), batch2, max_trigram_df=3
    ).collect()}
    assert again["xyz"]["hot"] and again["xyz"]["ids"] == []
    assert again["abc"]["ids"] == [200]


def test_winnow_guarantee_shared_substring_yields_shared_fp(spark):
    """MOSS guarantee: any shared substring of length >= k + w - 1
    (= 8 here) produces at least one shared fingerprint."""
    from adenhq_hive_spark.operators.search import winnow_overlap_pairs

    shared = "zqxjkwvb"  # 8 chars, appears in both, nowhere else
    df = spark.createDataFrame(
        [
            (1, "aaaa bbbb " + shared + " cccc dddd"),
            (2, "eeee ffff gggg " + shared + " hhhh"),
            (3, "iiii jjjj kkkk llll mmmm nnnn"),
        ],
        "doc_id long, text string",
    )
    pairs = winnow_overlap_pairs(df, k=5, w=4, min_shared=1).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in got
    assert all(3 not in p for p in got)


def test_winnow_detects_lifted_passage_where_jaccard_cannot(spark):
    """A paragraph copied between two otherwise-different documents:
    whole-doc 3-gram jaccard stays under any sane threshold, the
    winnowing tier flags the pair."""
    from adenhq_hive_spark.operators.dedup import ngram_jaccard_pairs
    from adenhq_hive_spark.operators.search import winnow_overlap_pairs

    passage = "the quick brown fox jumps over the lazy dog tonight"
    doc_a = " ".join(f"alpha{i} beta{i}" for i in range(40)) + " " + passage
    doc_b = passage + " " + " ".join(
        f"gamma{i} delta{i}" for i in range(40)
    )
    df = spark.createDataFrame(
        [(1, doc_a), (2, doc_b)], "doc_id long, text string"
    )
    jac = ngram_jaccard_pairs(df, k=3, threshold=0.3).collect()
    assert jac == []  # whole-doc similarity is far below threshold
    win = winnow_overlap_pairs(df, k=5, w=4, min_shared=3).collect()
    assert [(r["id_a"], r["id_b"]) for r in win] == [(1, 2)]


def test_winnow_hot_fp_cap_drops_boilerplate_keys(spark):
    """max_fp_df: a fingerprint present in every doc (boilerplate
    header) is excluded from pair evidence."""
    from adenhq_hive_spark.operators.search import winnow_overlap_pairs

    header = "standard corporate disclaimer text here"
    docs = [(i, header + f" unique{i} content{i} word{i}")
            for i in range(6)]
    uncapped = winnow_overlap_pairs(
        spark.createDataFrame(docs, "doc_id long, text string"),
        k=5, w=4, min_shared=1,
    ).count()
    capped = winnow_overlap_pairs(
        spark.createDataFrame(docs, "doc_id long, text string"),
        k=5, w=4, min_shared=1, max_fp_df=3,
    ).count()
    assert uncapped > 0 and capped < uncapped


# ---- hybrid_search (RRF) --------------------------------------------------


def _hybrid_fixture(spark):
    docs = spark.createDataFrame(
        [
            (0, "spark merge window spark merge"),
            (1, "spark window table row"),
            (2, "totally unrelated words here"),
            (3, "filler content nothing shared"),
        ],
        "doc_id long, text string",
    )
    # vec 2 is the best semantic match for query vec 0; vec 1 moderate
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.7, 0.7, 0.0]),
            (2, [0.99, 0.1, 0.0]),
            (3, [0.0, 1.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    return docs, emb


def test_hybrid_doc_in_both_lists_wins(spark):
    from adenhq_hive_spark.operators.search import hybrid_search

    docs, emb = _hybrid_fixture(spark)
    out = hybrid_search(
        docs, emb, ["spark", "merge"], query_vec_id=0, k=4, pool=3
    ).collect()
    by_id = {r.doc_id: r for r in out}
    # doc 1 appears in BOTH lists -> two RRF terms; doc 0 only lexical,
    # doc 2 only semantic
    assert by_id[1].bm25_rank is not None and by_id[1].cos_rank is not None
    assert out[0].doc_id == 1
    assert by_id[1].rrf > by_id[0].rrf
    assert by_id[1].rrf > by_id[2].rrf


def test_hybrid_rrf_value_is_rank_reciprocal_sum(spark):
    from adenhq_hive_spark.operators.search import hybrid_search

    docs, emb = _hybrid_fixture(spark)
    out = {
        r.doc_id: r
        for r in hybrid_search(
            docs, emb, ["spark", "merge"], query_vec_id=0, k=4, pool=3
        ).collect()
    }
    for r in out.values():
        expect = 0.0
        if r.bm25_rank is not None:
            expect += 1.0 / (60 + r.bm25_rank)
        if r.cos_rank is not None:
            expect += 1.0 / (60 + r.cos_rank)
        assert abs(r.rrf - round(expect, 6)) < 1e-9


def test_hybrid_single_leg_doc_still_surfaces(spark):
    from adenhq_hive_spark.operators.search import hybrid_search

    docs, emb = _hybrid_fixture(spark)
    ids = {
        r.doc_id
        for r in hybrid_search(
            docs, emb, ["unrelated"], query_vec_id=0, k=4, pool=3
        ).collect()
    }
    # doc 2 is the only lexical hit for 'unrelated'; semantic-only docs
    # from the cosine leg also appear
    assert 2 in ids


def test_cross_session_index_attach_without_rebuild(spark, tmp_path):
    """The explicit-path index layout survives catalog death (r9
    verdict #4): build once, drop the catalog entry (what a session
    restart does under the in-memory metastore — external-table files
    and sidecar stay), re-attach with one DDL, probe with bucket
    pruning and NO rebuild."""
    from adenhq_hive_spark.operators.bucketing import _SPEC_FILE
    from adenhq_hive_spark.operators.search import (
        ensure_trigram_index,
        trigram_search_indexed,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    path = str(tmp_path / "tri_ext")
    spark.sql("DROP TABLE IF EXISTS t_tri_ext")
    try:
        # first call: nothing at path -> builds (returns False)
        assert ensure_trigram_index(docs, path, "t_tri_ext",
                                    buckets=16) is False
        import os

        assert os.path.exists(os.path.join(path, _SPEC_FILE))
        truth = sorted(
            r.doc_id
            for r in docs.filter(
                F.col("text").contains("spark window")).collect()
        )
        got = [r.doc_id for r in trigram_search_indexed(
            docs, "spark window", "t_tri_ext").collect()]
        assert got == truth and len(got) > 0

        # "session restart": catalog entry gone, files + sidecar remain
        spark.sql("DROP TABLE t_tri_ext")
        assert not spark.catalog.tableExists("t_tri_ext")

        build_marker = os.path.getmtime(os.path.join(path, _SPEC_FILE))
        assert ensure_trigram_index(docs, path, "t_tri_ext",
                                    buckets=16) is True
        # attach wrote nothing: the sidecar (written last by a build)
        # is untouched
        assert os.path.getmtime(
            os.path.join(path, _SPEC_FILE)) == build_marker
        got2 = [r.doc_id for r in trigram_search_indexed(
            docs, "spark window", "t_tri_ext").collect()]
        assert got2 == truth

        # the attached table still carries the bucket spec: a probe
        # under the service config is bucket-pruned
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled",
            "false")
        try:
            probe = spark.table("t_tri_ext").filter(
                F.col("trigram").isin(["spa", "par", "ark"]))
            plan = probe._jdf.queryExecution().executedPlan().toString()
            assert "SelectedBucketsCount" in plan
            import re

            sel, total = map(int, re.search(
                r"(\d+) out of (\d+)",
                [l for l in plan.splitlines()
                 if "SelectedBucketsCount" in l][0]).groups())
            assert total == 16 and sel < 16
        finally:
            spark.conf.set(
                "spark.sql.sources.bucketing.autoBucketedScan.enabled",
                "true")
    finally:
        spark.sql("DROP TABLE IF EXISTS t_tri_ext")


def test_save_bucketed_table_attach_join_still_shuffle_free(spark, tmp_path):
    """attach_bucketed_table restores enough metadata that the
    co-located join contract (no key Exchange) holds in the attaching
    session too."""
    from adenhq_hive_spark.operators.bucketing import (
        attach_bucketed_table,
        save_bucketed_table,
    )

    orders = load_table(spark, SF_SMOKE, "orders")
    cust = load_table(spark, SF_SMOKE, "customer")
    for t in ("t_bkt_o", "t_bkt_c"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        save_bucketed_table(spark, orders, str(tmp_path / "o"),
                            "t_bkt_o", ["o_custkey"], buckets=8)
        save_bucketed_table(spark, cust, str(tmp_path / "c"),
                            "t_bkt_c", ["c_custkey"], buckets=8)
        # catalog death + attach
        spark.sql("DROP TABLE t_bkt_o")
        spark.sql("DROP TABLE t_bkt_c")
        assert attach_bucketed_table(spark, str(tmp_path / "o"), "t_bkt_o")
        assert attach_bucketed_table(spark, str(tmp_path / "c"), "t_bkt_c")

        j = spark.table("t_bkt_o").join(
            spark.table("t_bkt_c"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        n = j.count()
        assert n == orders.join(
            cust, F.col("o_custkey") == F.col("c_custkey")).count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        import re

        assert not re.search(
            r"Exchange hashpartitioning\((o_custkey|c_custkey)", plan
        ), "attached bucketed join must not re-shuffle the key"
    finally:
        for t in ("t_bkt_o", "t_bkt_c"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_tombstone_free_probe_matches_hot_aware_path(spark):
    """r12 single-plan probe: over an UNCAPPED persisted index (no hot
    tombstones can exist), tombstone_free=True must return exactly the
    hot-aware path's answer — for a present needle AND for a needle
    with an unindexed trigram (the declarative n_hit < n_tris empty
    result must equal the explicit missing-branch)."""
    from adenhq_hive_spark.operators.search import (
        save_trigram_index,
        trigram_search_indexed,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    spark.sql("DROP TABLE IF EXISTS t_tri_idx_tf")
    save_trigram_index(docs, "t_tri_idx_tf", buckets=16)
    try:
        for needle in ("spark window", "zzqxv window"):
            fast = [
                r.doc_id
                for r in trigram_search_indexed(
                    docs, needle, "t_tri_idx_tf", tombstone_free=True
                ).collect()
            ]
            slow = [
                r.doc_id
                for r in trigram_search_indexed(
                    docs, needle, "t_tri_idx_tf"
                ).collect()
            ]
            want = sorted(
                r.doc_id
                for r in docs.filter(
                    F.col("text").contains(needle)
                ).collect()
            )
            assert fast == slow == want
        # the present needle must actually return rows for the parity
        # to be meaningful
        assert len(
            trigram_search_indexed(
                docs, "spark window", "t_tri_idx_tf", tombstone_free=True
            ).collect()
        ) > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS t_tri_idx_tf")
