"""Deduplication tiers for LLM training-data pipelines (driver north star).

Four tiers, all DataFrame-native and deterministic:

1. exact           — content-hash groupBy (one shuffle on the hash).
2. ngram_jaccard   — exact set-similarity on word n-gram shingles via a
                     shingle inverted index (posting-list pair expansion:
                     pairs that share at least one shingle), then
                     |A∩B| / |A∪B|.
3. minhash_lsh     — MinHash signatures (xxhash64 with H seeds) + banding;
                     only same-band-bucket pairs are candidates, then exact
                     jaccard verification on the candidates. The scale
                     path: candidate generation cost is bucket-local.
4. simhash         — 64-bit SimHash per doc computed JVM-side with
                     higher-order array lambdas; near-dup = small hamming
                     distance, banded on 4×16-bit chunks for candidate
                     generation.

Scale notes: every tier shuffles on content-derived keys (hash / shingle /
band bucket), never on doc_id ranges, so hot documents don't skew a fixed
partition; shingle explosion is bounded by document token count; LSH keeps
the pair space sub-quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _materialize(df: DataFrame) -> DataFrame:
    """Mark a reused stage for one-shot materialization.

    When the session has a reliable checkpoint directory configured
    (``sc.setCheckpointDir`` — HDFS/object store on a cluster), use a
    reliable checkpoint: blocks survive executor loss AND the (often
    long) lineage is cut, the correct default for long cluster runs.
    Otherwise ``persist(MEMORY_AND_DISK)``: lazy (no extra eager job —
    an eager localCheckpoint of the shingle+signature stage cost more
    than the recompute it saved at small scale), spills instead of
    OOMing, and on executor loss the blocks recompute from lineage
    rather than failing the job as localCheckpoint would."""
    sc = df.sparkSession.sparkContext
    if sc._jsc.sc().getCheckpointDir().isDefined():
        return df.checkpoint(eager=True)
    from pyspark import StorageLevel

    out = df.persist(StorageLevel.MEMORY_AND_DISK)
    _PERSISTED.append(out)
    return out


#: Every persist-mode _materialize call is recorded here so a long
#: session (bench loop, oracle sweep, notebook) can release the pinned
#: relations between queries instead of leaking corpus-sized
#: MEMORY_AND_DISK caches for the session lifetime and leaning on LRU
#: eviction.  Checkpoint-mode materializations are not recorded — the
#: checkpoint dir is cluster-managed storage with its own cleanup.
_PERSISTED: list[DataFrame] = []


def release_persisted() -> int:
    """Unpersist every relation ``_materialize`` pinned since the last
    call and return how many were released.

    Call AFTER the consuming action (collect/write/count) of the query
    that built them — the pinned single-boundary-draw guarantee (see
    :func:`exact_rank`'s module docstring) only has to hold WITHIN one
    query.  bench.py and the oracle sweep call this between registry
    queries; a service embedding the Engine should do the same per
    request (or ``spark.catalog.clearCache()`` if it owns the whole
    cache)."""
    n = 0
    while _PERSISTED:
        rel = _PERSISTED.pop()
        try:
            rel.unpersist(blocking=False)
            n += 1
        except Exception:  # session already stopped — nothing to free
            pass
    return n


def _cut_lineage(df: DataFrame) -> DataFrame:
    """Materialize AND truncate lineage — required inside iterative
    loops, where a persist-only materialization leaves the logical plan
    growing multiplicatively per round and Catalyst re-analysis comes to
    dominate the runtime. Reliable checkpoint when a checkpoint dir is
    configured (cluster default), else localCheckpoint."""
    sc = df.sparkSession.sparkContext
    if sc._jsc.sc().getCheckpointDir().isDefined():
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def _ordered_pairs(postings: DataFrame, ids_col: str = "ids") -> DataFrame:
    """Expand sorted posting arrays into ordered (id_a, id_b) pair rows
    via TWO pipelined Generates (posexplode -> slice -> explode) instead
    of one flatten(transform(...)) expression.

    Same pairs in the same order, but the flatten form materializes ALL
    d(d-1)/2 pair structs of one posting row as a single contiguous
    array before its explode — at sf10 a boilerplate shingle shared by
    ~16k of 500k docs produced ~1 GB humongous allocations that
    GCLocker-thrashed the JVM (BASELINE.md round-7 sf10 table, the
    pl_dedup_incremental wall).  The two-stage form's peak per generated
    row is O(d) (the posting array itself); the d² pair rows stream
    through the stage without ever co-existing in memory.
    """
    return (
        postings.filter(F.size(ids_col) > 1)
        .select(F.col(ids_col), F.posexplode(ids_col).alias("_i", "id_a"))
        .select(
            "id_a",
            F.explode(
                F.slice(
                    F.col(ids_col),
                    F.col("_i") + F.lit(2),
                    F.size(ids_col) - F.col("_i") - F.lit(1),
                )
            ).alias("id_b"),
        )
    )


def exact_duplicate_clusters(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact-duplicate clusters: md5 content key → (hash, count, keeper).

    Keeps the minimum id as the canonical representative (deterministic).
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.count("*").alias("n"),
            F.min(id_col).alias("keep_id"),
        )
        .filter(F.col("n") > 1)
    )


def dedup_exact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Drop exact duplicates, keeping the min-id row per content hash.

    Window-free formulation: aggregate keeper ids, then semi-join — two
    narrow shuffles on the content hash, no full sort.
    """
    keepers = (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(keepers, on=id_col, how="left_semi")


def _shingles(text_col: str, k: int = 3) -> F.Column:
    """Distinct word k-gram shingles of a text column, computed JVM-side
    (zip_with construction — see operators/ngrams.py for why it beats
    transform+slice by ~4.7×)."""
    from .ngrams import word_ngrams

    return F.array_distinct(word_ngrams(F.col(text_col), k))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
    cache_shingles: bool = True,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for every pair sharing a shingle.

    Inverted-index join: explode shingles → self-join on shingle with
    id_a < id_b → per-pair intersection count; union size from per-doc
    shingle counts. Pairs sharing zero shingles (jaccard 0) never
    materialize.

    ``max_shingle_df`` is the scale knob: a shingle appearing in ``d``
    documents generates O(d²) join rows, so one boilerplate phrase shared
    by a million documents would dominate the shuffle. With the cap set,
    shingles above the document-frequency cap are dropped from CANDIDATE
    generation only — surviving pairs are still verified with their full
    shingle sets, so reported jaccard values stay exact; only pairs whose
    overlap is exclusively ultra-common shingles (low-signal pairs) can
    be missed. Leave None for exhaustive-exact (the oracle-checked mode).
    """
    from ..catalog import spread_small_scan

    # shingle construction + the map-side of every downstream agg run in
    # the SCAN stage — spread a narrow (single-row-group) scan first so
    # they get the whole machine (measured 2.3x at sf0.1; no-op at scale)
    sh = spread_small_scan(df).select(
        F.col(id_col).alias("id"), _shingles(text_col, k).alias("sh")
    )
    if cache_shingles:
        # materialize shingles once instead of recomputing per branch
        # (sizes / postings / verification) — same lineage tradeoff as
        # minhash_lsh_pairs(cache_signatures=True)
        sh = _materialize(sh)
    sizes = sh.select("id", F.size("sh").alias("n_sh"))
    ex = sh.select("id", F.explode("sh").alias("shingle"))
    # Posting-list formulation (faster than an explode×explode self-join:
    # shingles are computed once and there is one fewer shuffle): group
    # doc ids per shingle, expand ordered in-group pairs JVM-side.
    postings = ex.groupBy("shingle").agg(
        F.sort_array(F.collect_list("id")).alias("ids")
    )
    if max_shingle_df is not None:
        postings = postings.filter(F.size("ids") <= max_shingle_df)
    pairs = _ordered_pairs(postings)
    if max_shingle_df is not None:
        # candidates only; verify with the FULL shingle sets so the cap
        # never changes a reported jaccard value
        cand = pairs.dropDuplicates(["id_a", "id_b"])
        with_sets = (
            cand.join(sh.withColumnsRenamed({"id": "id_a", "sh": "sh_a"}), "id_a")
            .join(sh.withColumnsRenamed({"id": "id_b", "sh": "sh_b"}), "id_b")
        )
        inter_sz = F.size(F.array_intersect("sh_a", "sh_b"))
        union_sz = F.size(F.array_union("sh_a", "sh_b"))
        return (
            with_sets.withColumn("jaccard", F.round(inter_sz / union_sz, 4))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )
    inter = pairs.groupBy("id_a", "id_b").agg(F.count("*").alias("n_inter"))
    return (
        inter.join(sizes.withColumnsRenamed({"id": "id_a", "n_sh": "n_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n_sh": "n_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 32,
) -> DataFrame:
    """Per-doc MinHash signature: for each of ``num_hashes`` seeded hash
    functions, the min over shingles of xxhash64(shingle, seed).

    Computed per-row over the shingle array with ``array_min(transform(...))``
    — no explode, no shuffle; deterministic across runs and partitionings.
    """
    sig_cols = [
        F.array_min(
            F.transform(
                F.col("sh"), lambda s, i=i: F.xxhash64(s, F.lit(i))
            )
        ).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return (
        df.select(F.col(id_col).alias("id"), _shingles(text_col, k).alias("sh"))
        .filter(F.size("sh") > 0)
        .select("id", "sh", F.array(*sig_cols).alias("sig"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 32,
    bands: int = 16,
    threshold: float = 0.5,
    cache_signatures: bool = True,
) -> DataFrame:
    """MinHash + LSH near-duplicate pairs, verified with exact jaccard.

    Banding: ``bands`` bands of ``num_hashes/bands`` rows; docs agreeing on
    any full band land in the same bucket. Candidates = distinct same-bucket
    pairs; each candidate is then verified with the true shingle jaccard, so
    the output has no false positives — LSH only bounds recall.

    ``cache_signatures`` materializes the signature stage once instead of
    recomputing it in the banding and both verification branches (~1.5x
    end-to-end). With a reliable checkpoint dir configured on the session
    the materialization survives executor loss (the cluster default);
    without one it is a localCheckpoint — faster, but executor loss fails
    the job. Set False to keep pure lineage.
    """
    rows = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, k, num_hashes)
    if cache_signatures:
        sig = _materialize(sig)

    band_entries = sig.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        "_",
                        F.transform(
                            F.sequence(
                                b * rows + 1, (b + 1) * rows
                            ),
                            lambda i: F.element_at("sig", i).cast("string"),
                        ),
                    )
                ),
            )
        ).alias("band", "bucket"),
    )
    # posting-list pair expansion per (band, bucket) — signatures are
    # computed once; the heavy shingle arrays join in only for the
    # verification step, after candidate dedup
    postings = band_entries.groupBy("band", "bucket").agg(
        F.sort_array(F.collect_list("id")).alias("ids")
    )
    cand = _ordered_pairs(postings).dropDuplicates(["id_a", "id_b"])
    sh = sig.select("id", "sh")
    with_sets = (
        cand.join(sh.withColumnsRenamed({"id": "id_a", "sh": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({"id": "id_b", "sh": "sh_b"}), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        with_sets.withColumn("jaccard", F.round(inter / union, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_lsh_witness(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    recall_floor_pct: int = 90,
) -> DataFrame:
    """Oracle-visible witness for the xxhash64 MinHash+LSH tier (r9
    verdict #6 — the pl_lsh_topk containment pattern): ONE row
    (n_exact, sound, recall_ok) where

    - n_exact  = |exact jaccard >= threshold pairs| (SQL-computable —
      the pl_ngram_jaccard oracle's own count);
    - sound    = every LSH-emitted pair is in the exact set (TRUE BY
      CONSTRUCTION — candidates are exact-verified post-banding — but
      recomputed here over the real data, not assumed);
    - recall_ok = caught * 100 >= n_exact * recall_floor_pct, in exact
      integer arithmetic (measured recall 0.96-1.0 across all three SF
      dirs; the floor matches tests/test_dedup.py's 0.9 gate).

    The raw pair surface stays available as
    :func:`minhash_lsh_pairs`; only the REGISTERED query carries the
    witness shape, so the driver artifact gets a full hash row instead
    of a rows-only entry while the hash-family choice stays free.
    """
    exact = ngram_jaccard_pairs(df, text_col, id_col, k, threshold).select(
        "id_a", "id_b", F.lit(1).alias("_ex")
    )
    emitted = minhash_lsh_pairs(
        df, text_col, id_col, k, threshold=threshold
    ).select("id_a", "id_b", F.lit(1).alias("_em"))
    joined = exact.join(emitted, ["id_a", "id_b"], "full")
    caught = F.count(
        F.when(F.col("_ex").isNotNull() & F.col("_em").isNotNull(), 1)
    )
    return joined.agg(
        F.count("_ex").alias("_n_exact"),
        F.count("_em").alias("_n_emitted"),
        caught.alias("_n_caught"),
    ).select(
        F.col("_n_exact").cast("long").alias("n_exact"),
        (F.col("_n_caught") == F.col("_n_emitted")).alias("sound"),
        (F.col("_n_caught") * 100
         >= F.col("_n_exact") * recall_floor_pct).alias("recall_ok"),
    )


def simhash_witness(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    max_hamming: int = 8,
    hi_threshold: float = 0.9,
    recall_floor_pct: int = 70,
) -> DataFrame:
    """Oracle-visible witness for the xxhash64 SimHash tier: ONE row
    (n_hi, pairs_canonical, recall_ok) where

    - n_hi = |exact jaccard >= hi_threshold pairs| (SQL-computable) —
      the near-identical stratum SimHash exists to catch;
    - pairs_canonical = every emitted pair has id_a < id_b and appears
      once (the pair-surface contract, recomputed over real output);
    - recall_ok = SimHash(hamming <= max_hamming) catches at least
      recall_floor_pct% of the n_hi stratum, exact integer arithmetic
      (measured 0.76-0.85 across the three SF dirs at the 70 floor;
      SimHash is a different similarity than jaccard, so unlike the
      MinHash witness there is no soundness clause — hamming-close
      pairs need not be jaccard-close).
    """
    hi = ngram_jaccard_pairs(
        df, text_col, id_col, k, hi_threshold
    ).select("id_a", "id_b")
    emitted = simhash_pairs(df, text_col, id_col, k, max_hamming).select(
        "id_a", "id_b"
    )
    canonical = emitted.agg(
        (
            F.count("*")
            == F.count_distinct(F.col("id_a"), F.col("id_b"))
        ).alias("_uniq"),
        F.min(F.col("id_a") < F.col("id_b")).alias("_ordered"),
    ).select(
        (F.col("_uniq") & F.coalesce("_ordered", F.lit(True))).alias(
            "pairs_canonical"
        )
    )
    caught = hi.join(emitted, ["id_a", "id_b"], "left_semi")
    stats = hi.agg(F.count("*").alias("n_hi")).crossJoin(
        caught.agg(F.count("*").alias("_n_caught"))
    )
    return stats.crossJoin(canonical).select(
        F.col("n_hi").cast("long").alias("n_hi"),
        "pairs_canonical",
        (F.col("_n_caught") * 100 >= F.col("n_hi") * recall_floor_pct
         ).alias("recall_ok"),
    )


def _portable_hash60(col: F.Column) -> F.Column:
    """60-bit integer hash both Spark and DuckDB evaluate identically:
    bigint of the first 15 hex chars of md5 (same family as
    minhash_lsh_pairs_portable)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    portable: bool = False,
) -> DataFrame:
    """SimHash per document over word k-gram shingle features, fully
    JVM-side: 64-bit via xxhash64 (production), or 60-bit via the
    engine-portable md5 family (``portable=True`` — lets the whole
    vote-sum/bit-pack chain be value-checked against DuckDB).

    Shingles (not unigrams) keep word order information — on
    small-vocabulary corpora unigram SimHash collapses (every doc shares
    most words). Explode shingles → one hash per shingle → per-bit +1/-1
    vote sums in a single groupBy(id) aggregation → pack bits. One
    shuffle on the doc id; all expressions are plain built-in columns
    (codegen-friendly, deterministic).
    """
    n_bits = 60 if portable else 64
    tok = F.explode(_shingles(text_col, k)).alias("tok")
    ex = df.select(F.col(id_col).alias("id"), tok).select(
        "id",
        (_portable_hash60(F.col("tok")) if portable
         else F.xxhash64("tok")).alias("h"),
    )
    votes = ex.groupBy("id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1,
                    F.lit(1),
                ).otherwise(F.lit(-1))
            ).alias(f"v{b}")
            for b in range(n_bits)
        ]
    )
    packed = F.lit(0).cast("long")
    for b in range(n_bits):
        packed = packed + F.when(
            F.col(f"v{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
    return votes.select("id", packed.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    max_hamming: int = 6,
    portable: bool = False,
) -> DataFrame:
    """Near-duplicate pairs by SimHash hamming distance ≤ ``max_hamming``.

    Candidate generation bands the hash into 4 chunks (16 bits each for
    the 64-bit production hash, 15 for the portable 60-bit one —
    pigeonhole: distance ≤ 3 guarantees an identical chunk; larger radii
    trade recall) and only compares same-chunk pairs.
    """
    chunk_bits = 15 if portable else 16
    mask = (1 << chunk_bits) - 1
    sh = simhash(df, text_col, id_col, k, portable=portable)
    chunks = sh.select(
        "id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), chunk_bits * c)
                    .bitwiseAND(F.lit(mask))
                    for c in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        chunks.alias("a")
        .join(
            chunks.alias("b"),
            on=[
                F.col("a.chunk_idx") == F.col("b.chunk_idx"),
                F.col("a.chunk") == F.col("b.chunk"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def connected_components(
    edges: DataFrame, max_rounds: int = 25
) -> DataFrame:
    """Resolve an undirected edge list into connected components:
    (node, cluster_id) with cluster_id = the component's minimum node id.

    Alternating Large-Star / Small-Star contraction (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14 — a public
    algorithm): each round is two groupBy-join passes, and the edge set
    provably converges to per-component stars in O(log n) rounds — the
    scale path for duplicate-CLUSTER resolution at 100 TB, where
    label-propagation's O(diameter) rounds and GraphX's RDD shuffles
    both hurt. Every round's frontier is persisted and the loop stops on
    a fixed-point signature (count + order-insensitive hash), raising if
    ``max_rounds`` is hit without convergence.

    Input: any (id_a, id_b) pair frame (near-dup pairs from the jaccard/
    minhash/simhash/cosine tiers). Nodes with no edges are absent from
    the output — join the full corpus with a COALESCE to keep singletons
    (see pl_dup_clusters).
    """
    a, b = edges.columns[0], edges.columns[1]
    cur = (
        edges.select(
            F.least(F.col(a), F.col(b)).alias("u"),
            F.greatest(F.col(a), F.col(b)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )

    def sym(e: DataFrame) -> DataFrame:
        return e.union(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )

    def large_star(e: DataFrame) -> DataFrame:
        s = sym(e)
        mins = s.groupBy("u").agg(F.min("v").alias("mn"))
        mins = mins.select(
            "u", F.least(F.col("u"), F.col("mn")).alias("m")
        )
        return (
            s.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )

    def small_star(e: DataFrame) -> DataFrame:
        s = sym(e).filter(F.col("v") < F.col("u"))
        mins = s.groupBy("u").agg(F.min("v").alias("m"))
        out = (
            s.join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(mins.select(F.col("u").alias("u"), F.col("m").alias("v")))
        )
        return out.filter(F.col("u") != F.col("v"))

    def canon(e: DataFrame) -> DataFrame:
        return (
            e.select(
                F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def signature(e: DataFrame):
        row = e.agg(
            F.count("*").alias("n"),
            # bit_xor: order-insensitive and overflow-free under ANSI mode
            F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
        ).first()
        return (row["n"], row["h"])

    cur = _cut_lineage(cur)
    prev_sig = signature(cur)
    for _ in range(max_rounds):
        nxt = _cut_lineage(canon(small_star(large_star(cur))))
        sig = signature(nxt)
        cur = nxt
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )
    # at the fixed point every component is a star around its minimum:
    # each node's smallest neighbor IS the cluster id
    return (
        sym(cur)
        .groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select(
            F.col("u").alias("node"),
            F.least(F.col("u"), F.col("mn")).alias("cluster_id"),
        )
    )


def dup_clusters(
    df: DataFrame,
    pairs: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """(doc_id, cluster_id) for EVERY document: near-dup pairs resolved
    into transitive clusters (connected_components), singletons keeping
    their own id. ``pairs`` defaults to the exact n-gram jaccard tier;
    pass the minhash/simhash/cosine tiers' pairs at scale."""
    if pairs is None:
        pairs = ngram_jaccard_pairs(
            df, text_col=text_col, id_col=id_col, k=k, threshold=threshold
        )
    else:
        # Externally-fused pair frames (e.g. jaccard ∪ cosine unions over
        # persisted branches) can trip localCheckpoint attribute
        # resolution inside the contraction loop ("key not found: u#N");
        # cutting THEIR lineage up front — before any projection — is the
        # normalization that holds.
        pairs = _cut_lineage(pairs)
    labels = connected_components(pairs.select("id_a", "id_b"))
    return (
        df.select(id_col)
        .join(
            labels.withColumnRenamed("node", id_col), on=id_col, how="left"
        )
        .select(
            id_col,
            F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
        )
    )


def minhash_lsh_pairs_portable(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    n_hashes: int = 16,
    rows_per_band: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash+LSH near-dup pairs with an ENGINE-PORTABLE hash family.

    Same banding algebra as :func:`minhash_lsh_pairs`, but the hash
    family is one md5 per shingle reduced mod 2^31−1, fanned into
    ``n_hashes`` universal-hash projections ``(a_i·h + b_i) mod
    (2^61−1)`` with fixed odd multipliers — arithmetic DuckDB evaluates
    identically (all products < 2^62, no BIGINT overflow on either
    engine), so this tier is verifiable against an independent engine by
    value hash, not just recall gates. One digest per shingle instead of
    n_hashes (the earlier seed-concat variant measured 6.8 s at sf0.1;
    this one ≈ 2 s). The xxhash64 tier stays the production path.
    Candidates from same-band-signature buckets are verified with exact
    jaccard on the full shingle sets, so false-positive buckets never
    reach the output.
    """
    n_bands = n_hashes // rows_per_band
    mersenne31 = 2147483647       # 2^31 - 1
    mersenne61 = 2305843009213693951  # 2^61 - 1
    sh = df.select(
        F.col(id_col).alias("id"), _shingles(text_col, k).alias("shs")
    )
    sh = _materialize(sh)

    base = _portable_hash60(F.col("shingle")) % mersenne31
    ex = sh.select("id", F.explode("shs").alias("shingle")).select(
        "id", base.alias("h")
    )
    sigs = ex.groupBy("id").agg(
        *[
            F.min(
                (F.lit(2 * i + 3) * F.col("h") + F.lit(1000003 * i + 12345))
                % mersenne61
            ).alias(f"s{i}")
            for i in range(n_hashes)
        ]
    )
    band_keys = F.array(
        *[
            F.concat_ws(
                "_",
                *[
                    F.col(f"s{b * rows_per_band + r}")
                    for r in range(rows_per_band)
                ],
            )
            for b in range(n_bands)
        ]
    )
    bands = sigs.select(
        "id", F.posexplode(band_keys).alias("band", "key")
    )
    postings = bands.groupBy("band", "key").agg(
        F.sort_array(F.collect_list("id")).alias("ids")
    )
    cand = _ordered_pairs(postings).dropDuplicates(["id_a", "id_b"])
    with_sets = cand.join(
        sh.withColumnsRenamed({"id": "id_a", "shs": "sh_a"}), "id_a"
    ).join(sh.withColumnsRenamed({"id": "id_b", "shs": "sh_b"}), "id_b")
    jac = F.round(
        F.size(F.array_intersect("sh_a", "sh_b"))
        / F.size(F.array_union("sh_a", "sh_b")),
        4,
    )
    return (
        with_sets.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def build_shingle_postings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """(shingle, cid, n_b) corpus posting rows — the build-once index
    :func:`dedup_incremental` probes instead of re-shingling the corpus
    per batch. ``n_b`` (the doc's distinct-shingle count) rides every
    posting row so the probe never joins a corpus-sized sizes relation
    (the bm25 dl-on-postings trick, search.py).

    At scale, write this bucketed by ``shingle`` (the
    save_trigram_index pattern) so each batch's probe join is
    shuffle-free on the corpus side, and maintain it per batch with
    :func:`update_shingle_postings` — the delta merge reads only the
    new documents."""
    sh = df.select(
        F.col(id_col).alias("cid"), _shingles(text_col, k).alias("csh")
    )
    return sh.select(
        "cid", F.size("csh").alias("n_b"), F.explode("csh").alias("shingle")
    )


def update_shingle_postings(
    postings: DataFrame,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Delta-maintain the :func:`build_shingle_postings` index: shingle
    only the new batch and append — posting rows are per-(shingle, doc),
    so a merge is a plain union (no per-key regroup; re-feeding the same
    batch is the caller's idempotence contract, as with
    update_trigram_postings)."""
    return postings.unionByName(
        build_shingle_postings(new_docs, text_col, id_col, k)
    )


def dedup_incremental(
    new_df: DataFrame,
    corpus_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    corpus_postings: DataFrame | None = None,
    corpus_hashes: DataFrame | None = None,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Incremental ingestion dedup: new documents that survive against an
    EXISTING corpus — exact-duplicate drop (content hash seen in the
    corpus), near-duplicate drop (n-gram jaccard >= threshold against
    any corpus doc), then exact + near dedup WITHIN the batch (min-id
    representative kept).

    The continuously-growing-corpus pattern: cost scales with
    |new| × avg-posting-overlap, never with |corpus|² — corpus shingles
    join only where a new doc shares a shingle (inverted-index semi
    shape, same as the batch tier), and the corpus side is never
    pairwise-expanded against itself.

    Per-batch corpus cost: with the defaults the corpus is re-shingled
    (and re-hashed) every call — fine for one-shot use, wrong for a
    continuously-growing 100 TB corpus. Pass ``corpus_postings`` (a
    persisted :func:`build_shingle_postings` table, delta-maintained via
    :func:`update_shingle_postings`) and ``corpus_hashes`` (the distinct
    md5 content hashes, one ``_h`` string column, trivially
    delta-maintained) and the batch never touches the corpus text at
    all — the probe reads index rows only.

    ``max_shingle_df`` is the hot-key cap (the batch tier's contract,
    :func:`ngram_jaccard_pairs`): boilerplate shingles above the
    document-frequency cap are excluded from CANDIDATE generation, and
    surviving (new, corpus) candidates are verified with exact shared
    counts over the UNCAPPED postings restricted to candidate corpus
    docs — so reported decisions stay exact for every surviving pair;
    only pairs overlapping exclusively in ultra-common shingles can be
    missed. The cap is forwarded to the within-batch tier too.
    """
    new_hash = new_df.withColumn("_h", F.md5(F.col(text_col)))
    if corpus_hashes is None:
        corpus_hashes = corpus_df.select(
            F.md5(F.col(text_col)).alias("_h")
        ).distinct()
    fresh = new_hash.join(corpus_hashes, "_h", "left_anti").drop("_h")

    new_sh = _materialize(
        fresh.select(
            F.col(id_col).alias("id"), _shingles(text_col, k).alias("sh")
        )
    )
    new_ex = new_sh.select("id", F.explode("sh").alias("shingle"))
    if corpus_postings is None:
        corpus_postings = build_shingle_postings(
            corpus_df, text_col, id_col, k
        )
    # shared-shingle counts per (new, corpus) pair: because shingle sets
    # are distinct per doc, |A∩B| IS the join-row count and |A∪B| =
    # nA + nB − |A∩B| — no array-carrying verification join (the skinny
    # count formulation, same as the batch tier; the array-join variant
    # measured 108 s on DuckDB at sf0.1 vs 13 s here even before this)
    if max_shingle_df is None:
        shared = (
            new_ex.join(corpus_postings, "shingle")
            .groupBy("id", "cid")
            .agg(F.count("*").alias("n_shared"), F.min("n_b").alias("n_b"))
        )
    else:
        # candidates from the CAPPED postings (bounds the hot-key join
        # fan-out), exact verify over uncapped postings of candidate
        # corpus docs only — cost ∝ candidates, never corpus
        hot = (
            corpus_postings.groupBy("shingle")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") > max_shingle_df)
            .select("shingle")
        )
        capped = corpus_postings.join(
            F.broadcast(hot), "shingle", "left_anti"
        )
        cand = (
            new_ex.join(capped, "shingle")
            .select("id", "cid")
            .distinct()
        )
        postings_cand = corpus_postings.join(
            cand.select("cid").distinct(), "cid", "left_semi"
        )
        shared = (
            new_ex.join(postings_cand, "shingle")
            .groupBy("id", "cid")
            .agg(F.count("*").alias("n_shared"), F.min("n_b").alias("n_b"))
            .join(cand, ["id", "cid"], "left_semi")
        )
    sizes_new = new_sh.select("id", F.size("sh").alias("n_a"))
    near_corpus = (
        shared.join(sizes_new, "id")
        .filter(
            F.col("n_shared")
            / (F.col("n_a") + F.col("n_b") - F.col("n_shared"))
            >= threshold
        )
        .select("id")
        .distinct()
    )
    survivors = fresh.join(
        near_corpus.withColumnRenamed("id", id_col), id_col, "left_anti"
    )
    # within-batch: exact then near dedup, keeping min-id representative
    survivors = dedup_exact(survivors, text_col, id_col)
    batch_pairs = ngram_jaccard_pairs(
        survivors, text_col, id_col, k=k, threshold=threshold,
        max_shingle_df=max_shingle_df,
    )
    losers = batch_pairs.select(F.col("id_b").alias(id_col)).distinct()
    return survivors.join(losers, id_col, "left_anti")


def cluster_capped_dedup(
    df: DataFrame,
    pairs: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Frequency-capped ('soft') dedup: instead of collapsing each
    near-dup cluster to one survivor, keep ceil(sqrt(cluster_size))
    representatives (lowest ids) — the sublinear-copy policy for
    corpora where duplication frequency itself is signal (popular
    boilerplate keeps a few copies, the long tail keeps all). sqrt is
    the portable cap: IEEE-754 requires sqrt to be correctly rounded,
    so CEIL(SQRT(n)) is bit-identical across engines — unlike
    floor(log2(n)), whose ln-based evaluation ties differ.

    Output: every doc labeled (doc_id, cluster_id, cluster_size, kept).
    Shape: dup_clusters' star-contraction labels + ONE keyed window
    (both window functions share the cluster_id partitioning — a single
    shuffle). Same scale posture as dup_clusters.
    """
    labels = dup_clusters(
        df, pairs=pairs, text_col=text_col, id_col=id_col, k=k,
        threshold=threshold,
    )
    from pyspark.sql import Window

    part = Window.partitionBy("cluster_id")
    rn = F.row_number().over(part.orderBy(id_col))
    size = F.count("*").over(part)
    return labels.select(
        id_col,
        "cluster_id",
        size.alias("cluster_size"),
        (rn <= F.ceil(F.sqrt(size))).alias("kept"),
    )


def editdist_verify(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    candidate_threshold: float = 0.3,
    sim_threshold: float = 0.8,
) -> DataFrame:
    """Character-level edit-similarity verification over near-dup
    candidates — the expensive-but-exact confirm tier the cheap tiers
    feed (candidate generation first, O(len_a*len_b) DP only on the
    surviving pairs; the standard filter-and-verify shape of the
    near-dup literature — e.g. Xiao et al. 2008 "Efficient Similarity
    Joins for Near Duplicate Detection", where cheap signatures prune
    and an exact measure confirms).

    ``edit_sim = round((max_len - levenshtein) / max_len, 4)`` — a
    length-normalized similarity in [0, 1] where 1.0 means identical.
    Shingle-Jaccard candidates can be high on bag-of-ngram overlap while
    the documents differ structurally (reordered passages); edit
    similarity is order-sensitive, so this tier separates true
    near-copies from shuffled-content lookalikes.

    Scale posture: candidates come from the inverted-index join
    (``ngram_jaccard_pairs`` — at 100 TB swap in ``minhash_lsh_pairs``,
    same pair schema), never all-pairs; the DP cost is per-candidate and
    embarrassingly parallel. ``F.levenshtein`` is JVM-side (no Python in
    the hot path). The fraction and the threshold test use exact integer
    arithmetic (no representation ties — see ``text.frac4``); empty-
    vs-empty pairs (max_len 0) count as identical.

    Output: (id_a, id_b, jaccard, edit_sim) for pairs with
    ``edit_sim >= sim_threshold``, plus the candidate jaccard for
    triage.
    """
    from .text import frac4

    thr_num = int(round(sim_threshold * 10000))
    cand = ngram_jaccard_pairs(
        df, text_col, id_col, k=k, threshold=candidate_threshold
    )
    texts = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
    joined = (
        cand.join(texts.withColumnsRenamed({"id": "id_a", "t": "t_a"}), "id_a")
        .join(texts.withColumnsRenamed({"id": "id_b", "t": "t_b"}), "id_b")
    )
    lev = F.levenshtein("t_a", "t_b")
    mx = F.greatest(F.length("t_a"), F.length("t_b"))
    mn = F.least(F.length("t_a"), F.length("t_b"))
    # Length prefilter (guide §3 join-input reduction, r11 verdict #4):
    # levenshtein >= |len_a - len_b| = mx - mn, so a pair can only reach
    # sim_threshold when mn*10000 >= mx*thr_num. Testing the integer
    # length condition FIRST short-circuits the O(len_a*len_b) DP for
    # pairs that provably fail — output is unchanged by construction
    # (the bound admits every passer; mx==0 pairs pass it trivially
    # since 0 >= 0). Same exact integer arithmetic as the main test.
    return (
        joined.filter(mn * 10000 >= mx * thr_num)
        .withColumn("lev", lev)
        .withColumn("mx", mx)
        .filter(
            (F.col("mx") == 0)
            | ((F.col("mx") - F.col("lev")) * 10000 >= F.col("mx") * thr_num)
        )
        .select(
            "id_a",
            "id_b",
            "jaccard",
            F.when(F.col("mx") == 0, F.lit(1.0))
            .otherwise(frac4(F.col("mx") - F.col("lev"), F.col("mx")))
            .alias("edit_sim"),
        )
    )


def cross_source_dup_matrix(
    df: DataFrame,
    pairs: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Duplication provenance matrix: near-dup pair counts per ordered
    source pair — which corpora copy from which (the triage view before
    choosing a dedup keep-policy: within-source duplication suggests
    crawler artifacts; cross-source suggests mirroring/boilerplate, and
    which side to prefer is a policy decision this matrix informs).

    ``src_lo``/``src_hi`` are the pair's sources in lexicographic order
    (the pair graph is undirected); ``n_pairs`` counts near-dup pairs,
    ``n_docs_lo``/``n_docs_hi`` count the DISTINCT documents involved on
    each side — a thousand pairs touching three boilerplate docs reads
    very differently from a thousand pairs touching a thousand docs.

    Scale: pairs come from any candidate tier (default: the exact
    jaccard tier; pass ``pairs=`` to reuse LSH output). The matrix agg
    is on (src_lo, src_hi) — cardinality |sources|^2, trivially small.
    """
    if pairs is None:
        pairs = ngram_jaccard_pairs(
            df, text_col, id_col, k=k, threshold=threshold
        )
    srcs = df.select(
        F.col(id_col).alias("id"), F.col(source_col).alias("src")
    )
    labeled = (
        pairs.join(srcs.withColumnsRenamed({"id": "id_a", "src": "src_a"}), "id_a")
        .join(srcs.withColumnsRenamed({"id": "id_b", "src": "src_b"}), "id_b")
        .select(
            "id_a",
            "id_b",
            F.least("src_a", "src_b").alias("src_lo"),
            F.greatest("src_a", "src_b").alias("src_hi"),
            "src_a",
        )
    )
    # distinct docs per side of the ORDERED pair: a doc counts on the
    # lo side when its own source == src_lo (diagonal cells: both docs
    # share the source, lo/hi sides are the pair's two positions)
    return (
        labeled.withColumn(
            "pair_docs",
            F.when(
                F.col("src_a") == F.col("src_lo"),
                F.struct(F.col("id_a").alias("lo"), F.col("id_b").alias("hi")),
            ).otherwise(
                F.struct(F.col("id_b").alias("lo"), F.col("id_a").alias("hi"))
            ),
        )
        .groupBy("src_lo", "src_hi")
        .agg(
            F.count("*").alias("n_pairs"),
            # true partial aggregates — a collect_list per cell would
            # materialize every pair endpoint of a hot source pair in
            # one task's memory
            F.count_distinct("pair_docs.lo").alias("n_docs_lo"),
            F.count_distinct("pair_docs.hi").alias("n_docs_hi"),
        )
        .orderBy("src_lo", "src_hi")
    )


def cluster_best_rep(
    df: DataFrame,
    pairs: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Keep-policy dedup: one representative per near-dup cluster, chosen
    as the LONGEST document (ties → lowest id) — "prefer the most
    complete copy", the standard alternative to min-id retention when
    near-dups are truncations/excerpts of a fuller original.

    The policy metric is character length: an integer, so the argmax is
    exactly portable (no floating quality score whose ties could pick
    different winners per engine). Same cluster machinery and scale
    posture as :func:`dup_clusters`; the selection adds ONE keyed window
    over the (doc, cluster) labels, partitioned the same way.

    Output: (id_col, cluster_id, cluster_size, n_chars, kept), ordered.
    """
    labels = dup_clusters(
        df, pairs=pairs, text_col=text_col, id_col=id_col, k=k,
        threshold=threshold,
    )
    from pyspark.sql import Window

    lens = df.select(
        F.col(id_col), F.length(text_col).alias("n_chars")
    )
    part = Window.partitionBy("cluster_id")
    rn = F.row_number().over(
        part.orderBy(F.col("n_chars").desc(), F.col(id_col))
    )
    return (
        labels.join(lens, id_col)
        .select(
            id_col,
            "cluster_id",
            F.count("*").over(part).alias("cluster_size"),
            "n_chars",
            (rn == 1).alias("kept"),
        )
        .orderBy(id_col)
    )


def hot_shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    top: int = 25,
) -> DataFrame:
    """Corpus-wide boilerplate census: the ``top`` shingles by document
    frequency — the measurement that SIZES the dedup stack's
    ``max_shingle_df`` hot-key cap (a shingle in d documents generates
    O(d^2) candidate-join rows; this shows which d are coming before
    the join runs) and surfaces template/boilerplate phrases worth
    stripping upstream.

    One explode of distinct per-doc shingles + a grouped count (map-side
    partial) + top-k (TakeOrderedAndProject). ``pct_docs`` via exact
    integer division. Output: (shingle, df, pct_docs), heaviest first,
    ties by shingle.
    """
    from .text import frac4

    # lazy 1-row corpus count broadcast into the plan — an eager
    # df.count() here would run a full scan at operator-construction
    # time and scan the corpus twice per run
    totals = df.agg(F.count("*").alias("_n_docs"))
    counts = (
        df.select(F.explode(_shingles(text_col, k)).alias("shingle"))
        .groupBy("shingle")
        .agg(F.count("*").alias("df"))
    )
    return (
        counts.join(F.broadcast(totals))
        .select(
            "shingle",
            "df",
            frac4(F.col("df") * 100, F.col("_n_docs")).alias("pct_docs"),
        )
        .orderBy(F.col("df").desc(), "shingle")
        .limit(top)
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.8,
    min_shingles: int = 5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Asymmetric shingle-containment pairs: C(a in b) = |A ∩ B| / |A|
    over distinct word-k-gram shingle sets (Broder 1997's containment
    measure — the companion to resemblance/jaccard).  Finds the pair
    shapes symmetric tiers miss: a short document quoted whole inside a
    long one has jaccard ~ |A|/|B| (tiny) but containment ~ 1.

    Same inverted-index shape as :func:`ngram_jaccard_pairs` (shingles
    computed once, posting lists expanded to ordered in-group pairs
    JVM-side, one shuffle on the shingle key); the per-pair intersection
    feeds BOTH directions of the asymmetric measure, so the join cost is
    identical to the symmetric tier.  ``max_shingle_df`` is the same
    boilerplate hot-key cap (candidates only).  Docs with fewer than
    ``min_shingles`` distinct shingles are excluded (a 1-shingle doc is
    trivially "contained" everywhere — pure noise).

    Emits (id_sub, id_sup, containment): id_sub's shingle set is
    ``containment``-covered by id_sup's.  Values exact (frac4 half-up).
    """
    from ..catalog import spread_small_scan

    sh = spread_small_scan(df).select(
        F.col(id_col).alias("id"), _shingles(text_col, k).alias("sh")
    )
    sh = _materialize(sh)
    sizes = sh.select("id", F.size("sh").alias("n_sh")).filter(
        F.col("n_sh") >= min_shingles
    )
    ex = sh.select("id", F.explode("sh").alias("shingle"))
    postings = ex.groupBy("shingle").agg(
        F.sort_array(F.collect_list("id")).alias("ids")
    )
    if max_shingle_df is not None:
        postings = postings.filter(F.size("ids") <= max_shingle_df)
    from .text import frac4

    if max_shingle_df is not None:
        # candidates only; verify with the FULL shingle sets so the cap
        # never changes a reported containment value (the
        # ngram_jaccard_pairs capped-branch contract)
        cand = _ordered_pairs(postings).dropDuplicates(["id_a", "id_b"])
        cand = cand.union(
            cand.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
        )
        with_sets = (
            cand.join(sh.withColumnsRenamed({"id": "id_a", "sh": "sh_a"}), "id_a")
            .join(sh.withColumnsRenamed({"id": "id_b", "sh": "sh_b"}), "id_b")
            .join(sizes.select(F.col("id").alias("id_a")), "id_a")
            .join(sizes.select(F.col("id").alias("id_b")), "id_b")
        )
        return (
            with_sets.withColumn(
                "containment",
                frac4(
                    F.size(F.array_intersect("sh_a", "sh_b")), F.size("sh_a")
                ),
            )
            .filter(F.col("containment") >= threshold)
            .select(
                F.col("id_a").alias("id_sub"),
                F.col("id_b").alias("id_sup"),
                "containment",
            )
        )
    inter = (
        _ordered_pairs(postings)
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    # both directions from the one intersection table (no second join
    # pass): unordered (a < b) pair -> the two ordered candidate rows
    both = inter.union(
        inter.select(
            F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"), "n_inter"
        )
    )
    return (
        both.join(sizes.withColumnsRenamed({"id": "id_a", "n_sh": "n_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "n_sh": "n_b"}), "id_b")
        .withColumn("containment", frac4(F.col("n_inter"), F.col("n_a")))
        .filter(F.col("containment") >= threshold)
        .select(
            F.col("id_a").alias("id_sub"),
            F.col("id_b").alias("id_sup"),
            "containment",
        )
    )


def shingle_novelty(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Per-document novelty: the fraction of a doc's distinct word-
    k-gram shingles that appear in NO other document — the per-doc
    attribution twin of :func:`hot_shingles` (which censuses the
    corpus side).  Low novelty = template/boilerplate page; ~1.0 =
    unique content.  The ranking signal curation recipes use to pick
    cluster representatives and to down-weight mirror-heavy sources.

    Scale shape: one shingle explode, per-shingle document frequency
    (map-side-combined count), join back on the shingle key, per-doc
    aggregate — two key shuffles, no pair join, no driver state.
    Emits (id_col, n_sh, n_shared, novelty) with frac4-exact values;
    docs with zero shingles report novelty 1.0.
    """
    from ..catalog import spread_small_scan

    from .text import frac4

    sh = spread_small_scan(df).select(
        F.col(id_col).alias("id"), _shingles(text_col, k).alias("sh")
    )
    sh = _materialize(sh)
    ex = sh.select("id", F.explode("sh").alias("shingle"))
    dfreq = ex.groupBy("shingle").agg(F.count("*").alias("df"))
    shared = (
        ex.join(dfreq, "shingle")
        .groupBy("id")
        .agg(F.sum(F.when(F.col("df") > 1, 1).otherwise(0)).alias("n_shared"))
    )
    base = sh.select("id", F.size("sh").alias("n_sh0"))
    return (
        base.join(shared, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.col("n_sh0").alias("n_sh"),
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            F.when(F.col("n_sh0") == 0, F.lit(1.0)).otherwise(
                frac4(
                    F.col("n_sh0") - F.coalesce("n_shared", F.lit(0)),
                    F.col("n_sh0"),
                )
            ).alias("novelty"),
        )
    )


def _positional_grams(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    spread: bool = True,
    cache: bool = True,
) -> DataFrame:
    """(id, pos, gram) positional word-k-gram rows, pos 1-based — the
    shared first stage of every span-tier operator (one definition so
    the position arithmetic cannot drift between them).  ``cache=False``
    skips the persist for per-micro-batch callers (a long-running
    stream would otherwise accumulate never-released cached plans)."""
    from ..catalog import spread_small_scan

    from .ngrams import word_ngrams

    src = spread_small_scan(df) if spread else df
    ps = src.select(
        F.col(id_col).alias("id"),
        F.posexplode(word_ngrams(F.col(text_col), k)).alias("pos0", "gram"),
    ).select("id", (F.col("pos0") + 1).cast("long").alias("pos"), "gram")
    return _materialize(ps) if cache else ps


def _with_islands(dpos: DataFrame, k: int) -> DataFrame:
    """Gaps-and-islands id over duplicated gram starts: two grams at
    starts p < p' overlap/adjoin iff p' - p <= k, so a new island opens
    when the gap exceeds k.  Window partitioned per doc, never global."""
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy("pos")
    return dpos.withColumn(
        "new_isl",
        F.when(F.col("pos") - F.lag("pos").over(w) > k, 1).otherwise(0),
    ).withColumn("island", F.sum("new_isl").over(w))


def _island_spans(isl: DataFrame, k: int, min_words: int, extra=()) -> DataFrame:
    """Merge islands to spans [min(pos), max(pos)+k-1], keep spans of
    >= min_words covered words; ``extra`` adds per-island aggregates."""
    return (
        isl.groupBy("id", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + k - 1).cast("long").alias("span_end"),
            *extra,
        )
        .withColumn(
            "span_words",
            (F.col("span_end") - F.col("span_start") + 1).cast("long"),
        )
        .filter(F.col("span_words") >= min_words)
    )


def duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    min_words: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Exact duplicated-SPAN detection: per-document maximal word-position
    ranges entirely covered by word k-grams that also occur in at least
    ``min_docs - 1`` OTHER documents — the span-level removal plan of
    Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    Better"), where duplicated substrings are cut from documents rather
    than dropping whole near-duplicate docs.  Cross-document only by
    default (intra-doc repetition is pl_intradoc_dedup's job).

    Algorithm (all relational, no pair join — LINEAR in corpus size,
    unlike the jaccard tier's candidate-pair expansion): positional
    k-grams (:func:`_positional_grams`) → grams with distinct-doc
    frequency >= min_docs (one key shuffle with partial aggs) → join
    positions back on the gram key → per-doc gaps-and-islands merge
    (:func:`_with_islands` / :func:`_island_spans`).

    A hot boilerplate gram costs one posting row per occurrence here —
    there is no posting-list pair expansion, so no ``max_shingle_df``
    analog is needed.  Output (id_col, span_start, span_end,
    span_words, n_dup_grams), all BIGINT, totally ordered by
    (id, span_start) up to the caller's orderBy.
    """
    ps = _positional_grams(df, text_col, id_col, k)
    dup = (
        ps.select("gram", "id")
        .distinct()
        .groupBy("gram")
        .agg(F.count("*").alias("gdf"))
        .filter(F.col("gdf") >= min_docs)
        .select("gram")
    )
    dpos = ps.join(dup, "gram").select("id", "pos")
    spans = _island_spans(
        _with_islands(dpos, k), k, min_words,
        extra=(F.count("*").cast("long").alias("n_dup_grams"),),
    )
    return spans.select(
        F.col("id").alias(id_col),
        "span_start",
        "span_end",
        "span_words",
        "n_dup_grams",
    )


def scrub_spans(
    df: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Apply a :func:`duplicated_spans` removal plan: cut every word
    whose position falls inside a flagged span and re-join the
    survivors — the "remove the duplicated substring, keep the rest of
    the document" step of Lee et al. 2022 (dropping whole documents
    wastes the unique remainder; span surgery keeps it).

    Scale shape: spans aggregate to one bounded array per doc (a doc of
    W words has at most W/min_words spans), one key-shuffle join back
    to the corpus, then the cut is pure JVM higher-order expressions —
    no Python, no window, no second shuffle.  Docs without spans pass
    through verbatim (null-safe exists).  ``carry_cols`` forwards
    additional metadata columns from ``df`` into the output (an ingest
    pipeline scrubbing (doc_id, text, source, lang) keeps source/lang).
    Emits (id_col, *carry_cols, clean_text, n_removed), ordering left
    to the caller.
    """
    carry = list(carry_cols or [])
    sp = spans.groupBy(id_col).agg(
        F.collect_list(
            F.struct(
                F.col("span_start").alias("s"), F.col("span_end").alias("e")
            )
        ).alias("_spans")
    )
    joined = df.select(id_col, *carry, text_col).join(sp, id_col, "left")
    toks = F.split(F.col(text_col), " ")
    kept = F.filter(
        F.transform(
            toks,
            lambda w, i: F.struct(w.alias("w"), (i + 1).alias("pos")),
        ),
        lambda z: ~F.coalesce(
            F.exists(
                F.col("_spans"),
                lambda s: (z.pos >= s.s) & (z.pos <= s.e),
            ),
            F.lit(False),
        ),
    )
    return joined.select(
        F.col(id_col),
        *carry,
        F.array_join(F.transform(kept, lambda z: z.w), " ").alias(
            "clean_text"
        ),
        (F.size(toks) - F.size(kept)).cast("long").alias("n_removed"),
    )


def build_gram_postings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
) -> DataFrame:
    """Corpus-side index for incremental span dedup: per word-k-gram
    DISTINCT-document frequency (gram, gdf).  Persist/bucket this table
    once; batches then join it instead of re-shingling the corpus —
    the span-tier analog of :func:`build_shingle_postings` (jaccard
    tier) and ``update_trigram_postings`` (search tier)."""
    from .ngrams import word_ngrams

    return (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(
                F.array_distinct(word_ngrams(F.col(text_col), k))
            ).alias("gram"),
        )
        .groupBy("gram")
        .agg(F.count("*").alias("gdf"))
    )


def update_gram_postings(
    postings: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
) -> DataFrame:
    """Merge a new batch into the gram postings: distinct-doc counts add
    because batch ids are disjoint from corpus ids (the ingest
    contract).  Proven equal to a full rebuild in tests — the
    delta-maintain path for a continuously-growing corpus."""
    delta = build_gram_postings(batch, text_col, id_col, k)
    return (
        postings.withColumnsRenamed({"gdf": "gdf_a"})
        .join(delta.withColumnsRenamed({"gdf": "gdf_b"}), "gram", "full")
        .select(
            "gram",
            (
                F.coalesce("gdf_a", F.lit(0)) + F.coalesce("gdf_b", F.lit(0))
            ).alias("gdf"),
        )
    )


def dedup_spans_incremental(
    batch: DataFrame,
    corpus_postings: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    min_words: int = 8,
    protect_first: bool = False,
    cache: bool = True,
) -> DataFrame:
    """Duplicated spans of a NEW batch against corpus ∪ batch, without
    touching corpus text: a batch gram is duplicated iff it EXISTS in
    the corpus postings (semi-join on the gram key — the gdf values are
    never needed, so a raw epoch-appended index works unaggregated) OR
    it appears in at least 2 distinct batch docs.  Because corpus and
    batch doc sets are disjoint, this is EXACTLY the full-corpus
    :func:`duplicated_spans` condition (total distinct docs >= 2)
    restricted to batch ids — pinned by a property test and the shared
    driver oracle.

    ``protect_first=True`` exempts, for each batch-internal duplicate
    gram unknown to the corpus, its occurrence in the LOWEST batch doc
    id holding it — the streaming first-seen-passes-verbatim policy
    (without it, both same-batch copies of a passage are scrubbed and
    the text survives in neither).  Corpus-known grams are flagged in
    every batch doc regardless (the first copy already lives in the
    corpus).  ``cache=False`` skips the positional-gram persist for
    per-micro-batch callers.

    Cost: linear in the BATCH plus one pass over the postings key join,
    never a corpus re-shingle.
    """
    ps = _positional_grams(batch, text_col, id_col, k, cache=cache)
    gstats = (
        ps.select("gram", "id")
        .distinct()
        .groupBy("gram")
        .agg(F.count("*").alias("bdf"), F.min("id").alias("b_min"))
    )
    in_corpus = (
        corpus_postings.select("gram")
        .join(gstats.select("gram"), "gram", "left_semi")
        .distinct()
        .withColumn("in_c", F.lit(True))
    )
    joined = ps.join(gstats, "gram").join(in_corpus, "gram", "left")
    internal = F.col("bdf") >= 2
    if protect_first:
        internal = internal & (F.col("id") != F.col("b_min"))
    dpos = joined.filter(
        F.coalesce("in_c", F.lit(False)) | internal
    ).select("id", "pos")
    spans = _island_spans(
        _with_islands(dpos, k), k, min_words,
        extra=(F.count("*").cast("long").alias("n_dup_grams"),),
    )
    return spans.select(
        F.col("id").alias(id_col),
        "span_start",
        "span_end",
        "span_words",
        "n_dup_grams",
    )


def span_witnesses(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    min_words: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """:func:`duplicated_spans` plus PROVENANCE: each span carries a
    witness — another document containing the span's starting k-gram —
    turning "this range is duplicated" into "duplicated with whom"
    (the row a curator opens to decide boilerplate vs mirror vs quote).

    The witness is derived from bounded per-gram MIN/MAX doc-id
    aggregates only (witness = min id if that isn't the doc itself,
    else max id) — never a per-gram id list, so a boilerplate gram
    shared by millions of documents costs two BIGINTs, not an
    unbounded posting row (the trigram-postings lesson applied).
    Deterministic: the smallest qualifying witness for the span START.

    Output (id_col, span_start, span_end, span_words, witness_doc),
    ordered by (id, span_start) up to the caller's orderBy.
    """
    ps = _positional_grams(df, text_col, id_col, k)
    gstats = (
        ps.select("gram", "id")
        .distinct()
        .groupBy("gram")
        .agg(
            F.min("id").alias("g_min"),
            F.max("id").alias("g_max"),
            F.count("*").alias("gdf"),
        )
        .filter(F.col("gdf") >= min_docs)
        .select("gram", "g_min", "g_max")
    )
    dpos = ps.join(gstats, "gram").select("id", "pos", "g_min", "g_max")
    spans = _island_spans(
        _with_islands(dpos, k), k, min_words,
        extra=(
            # witness of the START position: min_by/max_by on pos keeps
            # the aggregation bounded (no island-wide list)
            F.min_by("g_min", "pos").alias("s_min"),
            F.min_by("g_max", "pos").alias("s_max"),
        ),
    )
    return spans.select(
        F.col("id").alias(id_col),
        "span_start",
        "span_end",
        "span_words",
        F.when(F.col("s_min") != F.col("id"), F.col("s_min"))
        .otherwise(F.col("s_max"))
        .cast("long")
        .alias("witness_doc"),
    )
