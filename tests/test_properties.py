"""Property-based tests (hypothesis) for the pure layers — a test
dimension the reference lacks entirely (SURVEY §5.1 'Absent').

Targets: JSON repair (round-trip under mangling), normalization (hash
invariance under row/column permutation), safe_eval (python-eval parity
on the arithmetic/boolean fragment), page-range parsing (bounds)."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from adenhq_hive_spark.functions.json_repair import repair_json
from adenhq_hive_spark.functions.safe_eval import eval_predicate, safe_eval
from adenhq_hive_spark.normalize import result_hash
from adenhq_hive_spark.sources.pdf_tool import parse_page_range

# -- JSON repair ------------------------------------------------------------

json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**31), max_value=2**31),
    st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs",), blacklist_characters="\x00"
        ),
        max_size=30,
    ),
)
json_values = st.recursive(
    json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(max_size=8), children, max_size=4),
    ),
    max_leaves=10,
)


@given(json_values)
@settings(max_examples=150, deadline=None)
def test_repair_clean_json_roundtrip(value):
    assert repair_json(json.dumps(value)) == value


@given(st.dictionaries(st.text(min_size=1, max_size=8), json_scalars, max_size=4))
@settings(max_examples=100, deadline=None)
def test_repair_fenced_and_prose_wrapped(obj):
    text = json.dumps(obj)
    assert repair_json(f"```json\n{text}\n```") == obj
    assert repair_json(f"Sure thing! {text} hope that helps") == obj


# -- normalization ----------------------------------------------------------

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=-1000, max_value=1000),
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        st.text(max_size=10),
    ),
    max_size=20,
)


@given(rows_strategy, st.randoms())
@settings(max_examples=100, deadline=None)
def test_hash_invariant_under_row_permutation(rows, rnd):
    cols = ["a", "b", "c"]
    shuffled = list(rows)
    rnd.shuffle(shuffled)
    assert result_hash(cols, rows) == result_hash(cols, shuffled)


@given(rows_strategy)
@settings(max_examples=50, deadline=None)
def test_hash_invariant_under_column_permutation(rows):
    cols = ["a", "b", "c"]
    perm = [2, 0, 1]
    permuted_cols = [cols[i] for i in perm]
    permuted_rows = [tuple(r[i] for i in perm) for r in rows]
    assert result_hash(cols, rows) == result_hash(permuted_cols, permuted_rows)


# -- safe_eval parity -------------------------------------------------------

small_ints = st.integers(min_value=-50, max_value=50)


@given(small_ints, small_ints, small_ints)
@settings(max_examples=200, deadline=None)
def test_safe_eval_matches_python_arithmetic(x, y, z):
    ctx = {"x": x, "y": y, "z": z}
    for expr in (
        "x + y * z",
        "(x - y) * 2 + z",
        "x < y < z",
        "x == y or y != z",
        "x if x > y else y",
        "abs(x) + max(y, z) + min(x, z)",
        "x in [y, z] and not (y is None)",
    ):
        assert safe_eval(expr, ctx) == eval(expr, {"__builtins__": {}},
                                            dict(ctx, abs=abs, max=max, min=min))


@given(st.text(max_size=40))
@settings(max_examples=100, deadline=None)
def test_eval_predicate_never_raises(garbage):
    # edge predicates must degrade to False, never crash the traversal
    assert eval_predicate(garbage, {}) in (True, False)


# -- page ranges ------------------------------------------------------------

@given(
    st.integers(min_value=1, max_value=50),
    st.integers(min_value=1, max_value=60),
    st.integers(min_value=1, max_value=60),
)
@settings(max_examples=150, deadline=None)
def test_page_range_always_in_bounds(n_pages, a, b):
    lo, hi = min(a, b), max(a, b)
    pages = parse_page_range(f"{lo}-{hi}", n_pages)
    assert all(0 <= p < n_pages for p in pages)
    assert pages == sorted(set(pages))
    expected = [p - 1 for p in range(lo, min(hi, n_pages) + 1)]
    assert pages == expected


@given(
    st.lists(
        st.lists(
            st.text(alphabet="abcxyz", min_size=1, max_size=4),
            min_size=0, max_size=12,
        ),
        min_size=1, max_size=8,
    ),
    st.integers(min_value=1, max_value=5),
)
@settings(max_examples=25, deadline=None)
def test_word_ngrams_matches_python_reference(spark, docs, n):
    """The zip_with n-gram builder (backing the jaccard/minhash/simhash/
    decontamination/repetition tiers) must agree with a naive Python
    reference for arbitrary token lists and n."""
    from adenhq_hive_spark.operators.ngrams import word_ngrams
    from pyspark.sql import functions as F

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: r.g
        for r in df.select(
            "doc_id", word_ngrams(F.col("text"), n).alias("g")
        ).collect()
    }
    for i, toks in enumerate(docs):
        # split(" ") on "" yields [""] — mirror Spark's tokenization
        spark_toks = " ".join(toks).split(" ")
        exp = [
            " ".join(spark_toks[j:j + n])
            for j in range(len(spark_toks) - n + 1)
        ]
        assert got[i] == exp, (i, toks, n)


@given(
    st.integers(min_value=0, max_value=10**12),
    st.integers(min_value=1, max_value=10**12),
)
@settings(max_examples=300, deadline=None)
def test_frac4_integer_form_matches_decimal_half_up(p, q):
    """The (p*20000 + q) DIV (2q) scaled-integer form used for every
    emitted fraction must equal textbook ROUND_HALF_UP(p/q, 4) computed
    in exact rational arithmetic."""
    from decimal import ROUND_HALF_UP, Decimal

    x = p * 20000 + q
    y = 2 * q
    ours = (x - x % y) // y  # == value * 10000, exact
    exp = (Decimal(p) / Decimal(q)).quantize(
        Decimal("0.0001"), rounding=ROUND_HALF_UP
    )
    assert Decimal(ours) / 10000 == exp


@given(
    st.lists(st.integers(min_value=0, max_value=10**6),
             min_size=2, max_size=40),
    st.integers(min_value=0, max_value=39),
    st.integers(min_value=1, max_value=4),
)
@settings(max_examples=300, deadline=None)
def test_anomaly_integer_inequality_matches_exact_z_test(counts, idx, k):
    """The denominator-cleared integer decision used by
    daily_count_anomalies — (n*x - S1)^2 (n-1) >= k^2 n (n*S2 - S1^2) —
    must equal the textbook |z| >= k test evaluated in exact rational
    arithmetic (Fraction), including the n<=1 and zero-variance guards."""
    from fractions import Fraction

    x = counts[idx % len(counts)]
    n = len(counts)
    s1 = sum(counts)
    s2 = sum(c * c for c in counts)
    dev = n * x - s1
    varnum = n * s2 - s1 * s1
    ours = n > 1 and varnum > 0 and dev * dev * (n - 1) >= k * k * n * varnum

    if n <= 1 or varnum == 0:
        exact = False
    else:
        # z^2 = (x - mean)^2 / var_samp, all in Fraction
        mean = Fraction(s1, n)
        var = Fraction(varnum, n * (n - 1))
        exact = (Fraction(x) - mean) ** 2 >= k * k * var
    assert ours == exact


def test_pack_efficiency_matches_python_replay(spark):
    """Spark pack_efficiency vs an exact python replay on seeded random
    docs: every emitted integer and fraction must match."""
    import math
    import random

    from adenhq_hive_spark.operators.curation import pack_efficiency

    rng = random.Random(11)
    docs = [
        (i, " ".join("w" for _ in range(rng.randint(1, 300))))
        for i in range(60)
    ]
    lengths = [7, 64, 256]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r.ctx_len: r for r in pack_efficiency(
        df, context_lengths=lengths).collect()}

    ns = [len(t.split()) for _, t in docs]
    for L in lengths:
        r = got[L]
        total = sum(ns)
        split_seqs = sum(math.ceil(n / L) for n in ns)
        assert r.n_docs == len(ns)
        assert r.total_tokens == total
        assert r.n_over == sum(n > L for n in ns)
        assert r.tokens_over == sum(max(n - L, 0) for n in ns)
        assert r.n_seqs_concat == math.ceil(total / L)
        assert r.n_seqs_split == split_seqs
        from decimal import ROUND_HALF_UP, Decimal
        waste = (Decimal(split_seqs * L - total) / Decimal(split_seqs * L)
                 ).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)
        assert Decimal(str(r.waste_frac_split)) == waste


def test_round5_ops_python_replay_properties(spark):
    """Seeded-random corpus: the r5 second-window operators must match
    exact python replays (blocklist hit counts, novelty fractions,
    zipf coverage monotonicity, containment bounds + direction)."""
    import random
    import re as _re
    from decimal import ROUND_HALF_UP, Decimal

    from adenhq_hive_spark.operators.dedup import (
        containment_pairs,
        shingle_novelty,
    )
    from adenhq_hive_spark.operators.text import blocklist_filter, zipf_coverage

    rng = random.Random(23)
    vocab = ["alpha", "beta", "slow", "drop", "gamma", "delta", "night"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 40))))
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    # blocklist: hits == exact word-token count of the blocked terms
    bl = {r.doc_id: r.bl_hits for r in blocklist_filter(df, ["slow", "drop"]).collect()}
    for i, t in docs:
        expect = sum(1 for w in t.split() if w in ("slow", "drop"))
        assert bl[i] == expect, (i, t)

    # zipf coverage: share monotone non-decreasing in k, bounded by 1.0,
    # and exact vs python at each k
    rows = {r.k: r for r in zipf_coverage(df, ks=(1, 3, 7)).collect()}
    toks = [w for _, t in docs for w in t.lower().split() if w]
    from collections import Counter

    freq = Counter(toks)
    ordered = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    prev = 0.0
    for k in (1, 3, 7):
        covered = sum(c for _, c in ordered[:k])
        assert rows[k].covered_tokens == covered
        share = (Decimal(covered * 20000 + len(toks)) // (2 * len(toks))) / 10000
        assert Decimal(str(rows[k].share)) == share
        assert rows[k].share >= prev and rows[k].share <= 1.0
        prev = rows[k].share

    # novelty: n_shared <= n_sh, novelty in [0,1], exact replay
    def sh3(t):
        w = t.split(" ")
        return {" ".join(w[j:j + 3]) for j in range(len(w) - 2)} if len(w) >= 3 else set()

    sets = {i: sh3(t) for i, t in docs}
    nov = {r.doc_id: r for r in shingle_novelty(df).collect()}
    for i, _ in docs:
        mine = sets[i]
        shared = sum(
            1 for s in mine if any(s in sets[j] for j in sets if j != i)
        )
        assert nov[i].n_sh == len(mine)
        assert nov[i].n_shared == shared
        assert 0.0 <= nov[i].novelty <= 1.0

    # containment: values in (0,1], direction consistent with replay
    cont = containment_pairs(df, threshold=0.5, min_shingles=3).collect()
    for r in cont:
        a, b = sets[r.id_sub], sets[r.id_sup]
        expect = (Decimal(len(a & b) * 20000 + len(a)) // (2 * len(a))) / 10000
        assert Decimal(str(r.containment)) == expect
        assert 0.5 <= r.containment <= 1.0


# -- duplicated spans vs brute-force python reference -----------------------


def _py_spans(corpus, k=4, min_words=8, min_docs=2):
    """Brute-force reference: positional k-grams, cross-doc df, merge
    starts within k, emit [start, end] word spans (1-based)."""
    grams = {}
    per_doc = {}
    for did, text in corpus:
        toks = text.split(" ")
        pos = []
        for i in range(len(toks) - k + 1):
            g = " ".join(toks[i : i + k])
            pos.append((i + 1, g))
            grams.setdefault(g, set()).add(did)
        per_doc[did] = pos
    out = []
    for did, pos in per_doc.items():
        dups = [p for p, g in pos if len(grams[g]) >= min_docs]
        start = prev = None
        spans = []
        for p in dups:
            if start is None:
                start = prev = p
            elif p - prev > k:
                spans.append((start, prev + k - 1))
                start = prev = p
            else:
                prev = p
        if start is not None:
            spans.append((start, prev + k - 1))
        for s, e in spans:
            if e - s + 1 >= min_words:
                out.append((did, s, e, e - s + 1))
    return sorted(out)


@settings(max_examples=20, deadline=None)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=24
        ).map(" ".join),
        min_size=1,
        max_size=6,
    )
)
def test_duplicated_spans_matches_python_reference(spark, docs):
    from adenhq_hive_spark.operators.dedup import duplicated_spans

    corpus = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.span_start, r.span_end, r.span_words)
        for r in duplicated_spans(df, k=4, min_words=8).collect()
    )
    assert got == _py_spans(corpus)


def test_exact_rank_consistent_under_join_shaped_consumers(spark):
    """Regression (r8): repartitionByRange samples boundaries per
    physical exchange; without the one-shot materialization inside
    exact_rank, a join-shaped consumer evaluated the counts branch and
    the window branch under DIFFERENT partitionings (96% of ranks
    wrong at 100k rows, nondeterministic).  Pin: ranks equal the
    single-window reference under exactly that consumer shape."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from adenhq_hive_spark.operators.ranking import exact_rank

    df = (
        spark.range(100_000)
        .select(
            F.col("id"),
            (
                F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8),
                       16, 10).cast("long") % 1_000_000
            ).cast("double").alias("v"),
        )
    )
    ref = df.withColumn(
        "rk", F.row_number().over(Window.orderBy("v", "id"))
    )
    op = exact_rank(df, order_cols=("v", "id"), rank_col="rk2")
    j = ref.join(op, ["id", "v"])
    assert j.filter(F.col("rk") != F.col("rk2")).count() == 0
