"""LLM-data-pipeline query set: dedup tiers, similarity search, text
analysis, as-of operator, multimodal plumbing (driver north star;
SURVEY §0, §7 step 7).

Oracle policy: everything SQL-expressible gets a DuckDB oracle (most in
dual-form — DuckDB list lambdas vs Spark higher-order functions).
MinHash/SimHash/LSH depend on xxhash64 (not available in DuckDB) →
rows-only here, with recall gates vs their exact counterparts in
tests/test_dedup.py and tests/test_similarity.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.asof import asof_join
from ..operators.dedup import (
    dedup_exact,
    dup_clusters,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from ..operators.multimodal import (
    annotate_media,
    decode_media,
    media_table_from_documents,
    synthetic_media_table,
)
from ..operators.similarity import cosine_topk, lsh_cosine_topk
from ..operators.text import fingerprint, lang_id, quality_score, token_counts
from . import QuerySpec, register

Q = register

# ---- dedup tiers ----------------------------------------------------------

Q(QuerySpec(
    name="pl_dedup_exact",
    doc="Exact dedup keeping min doc_id per content hash "
        "(operators/dedup.py:dedup_exact; hash-groupBy tier).",
    builder=lambda spark, sf: dedup_exact(load_table(spark, sf, "documents"))
    .select("doc_id")
    .orderBy("doc_id"),
    engine_sql=None,
    oracle_sql_str="""
        SELECT doc_id FROM documents
        WHERE doc_id IN (SELECT MIN(doc_id) FROM documents GROUP BY md5(text))
        ORDER BY doc_id
    """,
))

Q(QuerySpec(
    name="pl_ngram_jaccard",
    doc="Exact n-gram Jaccard near-dup pairs (k=3, >=0.5) via "
        "shingle-inverted-index join (operators/dedup.py:"
        "ngram_jaccard_pairs); oracle = DuckDB list-lambda formulation.",
    builder=lambda spark, sf: ngram_jaccard_pairs(
        load_table(spark, sf, "documents"), k=3, threshold=0.5
    ).orderBy("id_a", "id_b"),
    oracle_sql_str="""
        WITH sh AS (
          SELECT doc_id AS id, list_distinct(list_transform(
                 range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
                 i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))
               AS shs
          FROM documents
        ), ex AS (SELECT id, unnest(shs) AS shingle FROM sh),
        sizes AS (SELECT id, len(shs) AS n FROM sh),
        inter AS (
          SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_inter
          FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.id < b.id
          GROUP BY a.id, b.id
        )
        SELECT id_a, id_b,
               ROUND(CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter), 4)
                 AS jaccard
        FROM inter
        JOIN sizes sa ON sa.id = inter.id_a
        JOIN sizes sb ON sb.id = inter.id_b
        WHERE ROUND(CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter), 4) >= 0.5
        ORDER BY id_a, id_b
    """,
))

# Shared DuckDB CTE: exact-jaccard near-dup pairs (k=3, >=0.5) resolved to
# transitive-closure cluster labels — the oracle prefix for every
# cluster-level dedup query (pl_dup_clusters, pl_soft_dedup).
_CLUSTER_LABELS_CTE = """
        WITH RECURSIVE sh AS (
          SELECT doc_id AS id, list_distinct(list_transform(
                 range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
                 i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))
               AS shs
          FROM documents
        ), ex AS (SELECT id, unnest(shs) AS shingle FROM sh),
        sizes AS (SELECT id, len(shs) AS n FROM sh),
        inter AS (
          SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_inter
          FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.id < b.id
          GROUP BY a.id, b.id
        ),
        pairs AS (
          SELECT id_a, id_b
          FROM inter
          JOIN sizes sa ON sa.id = inter.id_a
          JOIN sizes sb ON sb.id = inter.id_b
          WHERE ROUND(CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter), 4) >= 0.5
        ),
        edges AS (
          SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b, id_a FROM pairs
        ),
        reach(src, dst) AS (
          SELECT u, u FROM (SELECT DISTINCT u FROM edges)
          UNION
          SELECT r.src, e.v FROM reach r JOIN edges e ON e.u = r.dst
        ),
        labels AS (
          SELECT d.doc_id,
                 COALESCE(m.cluster_id, d.doc_id) AS cluster_id
          FROM documents d
          LEFT JOIN (
            SELECT src AS doc_id, MIN(dst) AS cluster_id
            FROM reach GROUP BY src
          ) m USING (doc_id)
        )
"""

Q(QuerySpec(
    name="pl_dup_clusters",
    doc="Near-dup PAIRS resolved into transitive duplicate CLUSTERS: "
        "alternating Large-Star/Small-Star contraction (O(log n) rounds "
        "— operators/dedup.py:connected_components) over the exact "
        "jaccard tier's pairs; every doc labeled with its component-min "
        "cluster id, singletons keeping their own. Oracle: DuckDB "
        "recursive-CTE transitive closure over the same pairs.",
    builder=lambda spark, sf: dup_clusters(
        load_table(spark, sf, "documents"), k=3, threshold=0.5
    ).orderBy("doc_id"),
    oracle_sql_str=_CLUSTER_LABELS_CTE + """
        SELECT doc_id, cluster_id FROM labels
        ORDER BY doc_id
    """,
))

Q(QuerySpec(
    name="pl_minhash_lsh",
    doc="MinHash(32)+LSH(16 bands) near-dup tier, xxhash64-based "
        "(operators/dedup.py:minhash_lsh_pairs). Registered surface is "
        "the ONE-ROW witness (dedup.py:minhash_lsh_witness — the "
        "pl_lsh_topk containment pattern, r9 verdict #6): n_exact = "
        "the SQL-computable exact-jaccard pair count, sound = every "
        "LSH pair is exact-verified >= 0.5 (recomputed over real "
        "output), recall_ok = caught*100 >= n_exact*90 in integer "
        "arithmetic (measured 0.96-1.0 across SF dirs; same floor as "
        "tests/test_dedup.py). The raw pair surface stays callable as "
        "minhash_lsh_pairs; the witness makes the driver row a full "
        "hash instead of rows-only.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.dedup",
        fromlist=["minhash_lsh_witness"],
    ).minhash_lsh_witness(
        load_table(spark, sf, "documents"), k=3, threshold=0.5
    ),
    oracle_sql_str="""
        WITH sh AS (
          SELECT doc_id AS id, list_distinct(list_transform(
                 range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
                 i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))
               AS shs
          FROM documents
        ), ex AS (SELECT id, unnest(shs) AS shingle FROM sh),
        sizes AS (SELECT id, len(shs) AS n FROM sh),
        inter AS (
          SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_inter
          FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.id < b.id
          GROUP BY a.id, b.id
        ),
        pairs AS (
          SELECT id_a FROM inter
          JOIN sizes sa ON sa.id = inter.id_a
          JOIN sizes sb ON sb.id = inter.id_b
          WHERE ROUND(CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter), 4)
                >= 0.5
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_exact,
               TRUE AS sound, TRUE AS recall_ok
        FROM pairs
    """,
))

Q(QuerySpec(
    name="pl_simhash",
    doc="SimHash-64 near-dup tier (hamming<=8, 16-bit banded "
        "candidates), xxhash64-based (operators/dedup.py:simhash_pairs)."
        " Registered surface is the ONE-ROW witness (dedup.py:"
        "simhash_witness): n_hi = the SQL-computable count of exact "
        "jaccard >= 0.9 pairs (the near-identical stratum SimHash "
        "exists to catch), pairs_canonical = emitted pairs are "
        "id_a<id_b and unique (recomputed over real output), recall_ok "
        "= caught*100 >= n_hi*70 integer-exact (measured 0.76-0.85 "
        "across SF dirs; no soundness clause — hamming-close need not "
        "be jaccard-close). Raw pairs stay callable as simhash_pairs.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.dedup", fromlist=["simhash_witness"]
    ).simhash_witness(
        load_table(spark, sf, "documents"), k=3, max_hamming=8
    ),
    oracle_sql_str="""
        WITH sh AS (
          SELECT doc_id AS id, list_distinct(list_transform(
                 range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
                 i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))
               AS shs
          FROM documents
        ), ex AS (SELECT id, unnest(shs) AS shingle FROM sh),
        sizes AS (SELECT id, len(shs) AS n FROM sh),
        inter AS (
          SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_inter
          FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.id < b.id
          GROUP BY a.id, b.id
        ),
        pairs AS (
          SELECT id_a FROM inter
          JOIN sizes sa ON sa.id = inter.id_a
          JOIN sizes sb ON sb.id = inter.id_b
          WHERE ROUND(CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter), 4)
                >= 0.9
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_hi,
               TRUE AS pairs_canonical, TRUE AS recall_ok
        FROM pairs
    """,
))

# ---- similarity search ----------------------------------------------------

def _queries_vecs(spark, sf):
    emb = load_table(spark, sf, "embeddings")
    return emb, emb.filter(F.col("vec_id") < 5)


Q(QuerySpec(
    name="pl_cosine_topk",
    doc="Exact brute-force cosine top-5 for query vectors vec_id<5 "
        "(operators/similarity.py:cosine_topk; JVM-side zip_with/aggregate "
        "dot products, broadcast query side).",
    builder=lambda spark, sf: cosine_topk(*_queries_vecs(spark, sf), k=5)
    .orderBy("query_id", "rank"),
    oracle_sql_str="""
        SELECT query_id, rank, cand_id, cosine FROM (
          SELECT q.vec_id AS query_id, v.vec_id AS cand_id,
                 ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                              CAST(v.embedding AS DOUBLE[])), 4)
                   AS cosine,
                 ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY ROUND(list_cosine_similarity(
                                CAST(q.embedding AS DOUBLE[]),
                                CAST(v.embedding AS DOUBLE[])), 4)
                            DESC, v.vec_id) AS rank
          FROM embeddings q JOIN embeddings v ON v.vec_id <> q.vec_id
          WHERE q.vec_id < 5
        ) t
        WHERE rank <= 5
        ORDER BY query_id, rank
    """,
))

Q(QuerySpec(
    name="pl_lsh_topk",
    doc="Approximate cosine top-5 via random-hyperplane LSH (16 tables x 4 "
        "planes, seed 42 — the shipped defaults; ~0.9 recall@5 on the "
        "unclustered random testdata) + exact re-rank (operators/"
        "similarity.py:lsh_cosine_topk). Registered surface is the "
        "per-query containment witness (every pick inside exact "
        "top-100 — worst measured exact rank 7 across all three SF "
        "dirs, >14x margin) so the driver row carries a full hash "
        "instead of no_oracle (r9; the pl_pq_topk pattern). Recall "
        "additionally gated via pl_lsh_recall + tests.",
    builder=lambda spark, sf: _containment_witness(
        lsh_cosine_topk(*_queries_vecs(spark, sf), k=5),
        *_queries_vecs(spark, sf),
    ),
    oracle_sql_str="""
        SELECT vec_id AS query_id, CAST(5 AS BIGINT) AS n_k,
               TRUE AS contained
        FROM embeddings WHERE vec_id < 5 ORDER BY vec_id
    """,
))

def _containment_witness(approx, emb, queries, m: int = 100):
    """Per-query containment witness for an ANN tier: TRUE iff every
    approx top-k candidate sits inside the EXACT top-m (m=100 — worst
    measured exact rank of any PQ/IVFPQ pick is 28 across all three SF
    dirs, so the bound carries >3x margin and cannot flap on the fixed
    testdata).  Emits one (query_id, n_k, contained) row per query — a
    constant shape a DuckDB oracle pins — so the rows-only ANN entries
    become full hash rows in the driver artifact instead of
    `no_oracle` errs (r7 verdict #8; same pattern as pl_media_phash's
    portable twin).  Cost: one exact top-m over the query set — the
    same broadcast-query plan as the exact tier itself."""
    exact_m = cosine_topk(emb, queries, k=m).select(
        "query_id", "cand_id", F.lit(1).alias("in_m")
    )
    return (
        approx.select("query_id", "cand_id")
        .join(exact_m, ["query_id", "cand_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("*").alias("n_k"),
            (F.sum(F.coalesce("in_m", F.lit(0))) == F.count("*")).alias(
                "contained"
            ),
        )
        .orderBy("query_id")
    )


def _recall_vs_exact(approx, exact, threshold: float):
    """recall@k of an approximate top-k against the exact tier, computed
    entirely in-DataFrame (no driver math): left-join exact pairs to
    approx pairs, aggregate hit fraction, emit one constant-shaped row —
    (n_exact, recall_ok) — that a constant SQL oracle hash-matches, so an
    ANN recall regression becomes driver-visible, not just test-visible."""
    hits = exact.select("query_id", "cand_id").join(
        approx.select("query_id", "cand_id").withColumn("hit", F.lit(1)),
        ["query_id", "cand_id"],
        "left",
    )
    return hits.agg(
        F.count("*").alias("n_exact"),
        F.sum(F.coalesce("hit", F.lit(0))).alias("n_hit"),
    ).select(
        "n_exact",
        (F.col("n_hit") / F.col("n_exact") >= threshold).alias("recall_ok"),
    )


Q(QuerySpec(
    name="pl_lsh_recall",
    doc="Driver-visible LSH quality gate: recall@5 of pl_lsh_topk's "
        "configuration vs the exact tier, in-engine (no driver math); "
        "the oracle pins (n_exact=25, recall_ok=true) — the measured "
        "recall is ~0.9+ on the unclustered random testdata, gated here "
        "at >= 0.7 (the same bound as tests/test_similarity.py).",
    builder=lambda spark, sf: _recall_vs_exact(
        lsh_cosine_topk(*_queries_vecs(spark, sf), k=5),
        cosine_topk(*_queries_vecs(spark, sf), k=5),
        threshold=0.7,
    ),
    oracle_sql_str="""
        SELECT CAST(25 AS BIGINT) AS n_exact, TRUE AS recall_ok
    """,
))

Q(QuerySpec(
    name="pl_ivf_recall",
    doc="Driver-visible IVF quality gate: recall@5 of pl_ivf_topk's "
        "configuration (16 centroids, 4 probes — 1/4 scan fraction) vs "
        "the exact tier, in-engine; oracle pins (n_exact=25, "
        "recall_ok=true) at the >= 0.5 worst-case-random bound from "
        "tests/test_similarity.py.",
    builder=lambda spark, sf: _recall_vs_exact(
        __import__(
            "adenhq_hive_spark.operators.similarity",
            fromlist=["ivf_cosine_topk"],
        ).ivf_cosine_topk(*_queries_vecs(spark, sf), k=5),
        cosine_topk(*_queries_vecs(spark, sf), k=5),
        threshold=0.5,
    ),
    oracle_sql_str="""
        SELECT CAST(25 AS BIGINT) AS n_exact, TRUE AS recall_ok
    """,
))

# ---- text analysis --------------------------------------------------------

Q(QuerySpec(
    name="pl_lang_id",
    doc="Heuristic language-ID confusion counts (operators/text.py:lang_id "
        "— marker-lexicon argmax, en-first tie-break).",
    builder=lambda spark, sf: lang_id(load_table(spark, sf, "documents"))
    .groupBy("lang", "lang_pred")
    .count()
    .withColumnRenamed("count", "n")
    .orderBy("lang", "lang_pred"),
    oracle_sql_str=r"""
        WITH h AS (
          SELECT lang,
                 len(list_intersect(string_split_regex(text, '\s+'),
                     ['the','and','of','to','is'])) AS h_en,
                 len(list_intersect(string_split_regex(text, '\s+'),
                     ['der','die','und','ist','nicht'])) AS h_de,
                 len(list_intersect(string_split_regex(text, '\s+'),
                     ['el','la','que','de','es'])) AS h_es,
                 len(list_intersect(string_split_regex(text, '\s+'),
                     ['le','la','et','est','les'])) AS h_fr,
                 len(list_intersect(string_split_regex(text, '\s+'),
                     ['的','是','了','在','不'])) AS h_zh
          FROM documents
        )
        SELECT lang,
               CASE WHEN greatest(h_en,h_de,h_es,h_fr,h_zh) = 0 THEN 'und'
                    WHEN h_en = greatest(h_en,h_de,h_es,h_fr,h_zh) THEN 'en'
                    WHEN h_de = greatest(h_en,h_de,h_es,h_fr,h_zh) THEN 'de'
                    WHEN h_es = greatest(h_en,h_de,h_es,h_fr,h_zh) THEN 'es'
                    WHEN h_fr = greatest(h_en,h_de,h_es,h_fr,h_zh) THEN 'fr'
                    ELSE 'zh' END AS lang_pred,
               COUNT(*) AS n
        FROM h
        GROUP BY lang, lang_pred
        ORDER BY lang, lang_pred
    """,
))

Q(QuerySpec(
    name="pl_quality",
    doc="Quality-score features per document (operators/text.py:"
        "quality_score — Gopher-style length/punct/stopword heuristics).",
    builder=lambda spark, sf: quality_score(load_table(spark, sf, "documents"))
    .select("doc_id", "q_words", "q_mean_word_len", "q_punct_ratio",
            "q_digit_ratio", "q_stop_ratio", "quality_score")
    .orderBy("doc_id")
    .limit(500),
    oracle_sql_str=r"""
        WITH f AS (
          SELECT doc_id,
                 length(text) AS n_chars,
                 len(string_split_regex(text, '\s+')) AS n_words,
                 CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
                   / len(string_split_regex(text, '\s+')) AS mean_wlen,
                 CAST(length(text)
                      - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g'))
                   AS DOUBLE) / length(text) AS punct_ratio,
                 CAST(length(text)
                      - length(regexp_replace(text, '[0-9]', '', 'g'))
                   AS DOUBLE) / length(text) AS digit_ratio,
                 CAST(len(list_intersect(string_split_regex(text, '\s+'),
                      ['the','and','of','to','is'])) AS DOUBLE)
                   / greatest(len(string_split_regex(text, '\s+')), 1)
                   AS stop_ratio
          FROM documents
        )
        SELECT doc_id,
               CAST(n_words AS INT) AS q_words,
               ROUND(mean_wlen, 4) AS q_mean_word_len,
               ROUND(punct_ratio, 4) AS q_punct_ratio,
               ROUND(digit_ratio, 4) AS q_digit_ratio,
               ROUND(stop_ratio, 4) AS q_stop_ratio,
               ROUND(CAST(
                 (CASE WHEN n_words BETWEEN 5 AND 10000 THEN 0.4 ELSE 0.0 END)
                 + (CASE WHEN mean_wlen BETWEEN 2.0 AND 12.0 THEN 0.2 ELSE 0.0 END)
                 + (CASE WHEN punct_ratio <= 0.2 THEN 0.2 ELSE 0.0 END)
                 + (CASE WHEN digit_ratio <= 0.3 THEN 0.1 ELSE 0.0 END)
                 + (CASE WHEN stop_ratio > 0.0 THEN 0.1 ELSE 0.0 END)
                 AS DOUBLE), 4) AS quality_score
        FROM f
        ORDER BY doc_id
        LIMIT 500
    """,
))

Q(QuerySpec(
    name="pl_tokens",
    doc="Token counting: whitespace + BPE-ish regex tokens "
        "(operators/text.py:token_counts).",
    builder=lambda spark, sf: token_counts(load_table(spark, sf, "documents"))
    .select("doc_id", "tok_ws", "tok_bpe", "chars_per_tok")
    .orderBy("doc_id")
    .limit(500),
    oracle_sql_str=r"""
        SELECT doc_id,
               CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS tok_ws,
               CAST(len(regexp_extract_all(text,
                    '[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]')) AS INT) AS tok_bpe,
               ROUND(CAST(length(text) AS DOUBLE)
                     / greatest(len(regexp_extract_all(text,
                         '[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]')), 1), 4)
                 AS chars_per_tok
        FROM documents
        ORDER BY doc_id
        LIMIT 500
    """,
))

Q(QuerySpec(
    name="pl_fingerprint",
    doc="Document fingerprint dedup groups: normalized md5 tier "
        "(operators/text.py:fingerprint; fp_rolling is xxhash64-based and "
        "unit-tested instead).",
    builder=lambda spark, sf: fingerprint(load_table(spark, sf, "documents"))
    .groupBy("fp_norm")
    .agg(F.count("*").alias("n"), F.min("doc_id").alias("keep_id"))
    .orderBy("fp_norm"),
    oracle_sql_str=r"""
        SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp_norm,
               COUNT(*) AS n, MIN(doc_id) AS keep_id
        FROM documents
        GROUP BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
        ORDER BY fp_norm
    """,
))

# ---- as-of operator (scale path for Q33) ----------------------------------

Q(QuerySpec(
    name="pl_asof_operator",
    doc="Scalable as-of join operator (operators/asof.py: union + "
        "last-ignoreNulls window — one shuffle, no pair explosion) on the "
        "same purchase<-click task as q33; oracle = q33's range-join SQL, "
        "so the two formulations cross-check through DuckDB.",
    builder=lambda spark, sf: (
        lambda ev: asof_join(
            ev.filter(F.col("event_type") == "purchase")
            .select(F.col("event_id").alias("purchase_id"), "user_id", "ts"),
            ev.filter(F.col("event_type") == "click")
            .select("user_id", "ts", F.col("event_id").alias("click_id")),
            on="user_id",
            right_values=["click_id", "ts"],
            order_col="click_id",
        )
        .filter(F.col("asof_click_id").isNotNull())
        .select(
            "purchase_id",
            F.col("asof_click_id").alias("click_id"),
            F.col("asof_ts").alias("click_ts"),
        )
        .orderBy("purchase_id")
        .limit(2000)
    )(load_table(spark, sf, "events")),
    oracle_sql_str="""
        SELECT purchase_id, click_id, click_ts
        FROM (
          SELECT p.event_id AS purchase_id, c.event_id AS click_id,
                 c.ts AS click_ts,
                 ROW_NUMBER() OVER (PARTITION BY p.event_id
                                    ORDER BY c.ts DESC, c.event_id DESC) AS rn
          FROM events p
          JOIN events c ON c.user_id = p.user_id
                        AND c.event_type = 'click'
                        AND c.ts <= p.ts
          WHERE p.event_type = 'purchase'
        ) x
        WHERE rn = 1
        ORDER BY purchase_id
        LIMIT 2000
    """,
))

# ---- multimodal plumbing --------------------------------------------------

Q(QuerySpec(
    name="pl_media_meta",
    doc="Multimodal column plumbing: binary payload + typed metadata "
        "(operators/multimodal.py:media_table_from_documents) — per-kind "
        "byte accounting.",
    builder=lambda spark, sf: media_table_from_documents(
        load_table(spark, sf, "documents")
    )
    .groupBy("kind")
    .agg(
        F.count("*").alias("n"),
        F.sum(F.col("meta.n_bytes")).alias("total_bytes"),
    )
    .orderBy("kind"),
    oracle_sql_str="""
        SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS kind,
               COUNT(*) AS n,
               CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
        FROM documents
        GROUP BY 1
        ORDER BY kind
    """,
))

Q(QuerySpec(
    name="pl_media_decode",
    doc="REAL media metadata decode via Arrow-batched mapInPandas: "
        "stdlib PNG/JPEG/GIF(animated, frame-counted)/WAV container "
        "parsing (operators/multimodal.py:parse_media_meta) over "
        "structurally valid synthetic payloads (synthetic_media_table). "
        "The oracle recomputes every dimension from its media_id formula, "
        "so a parser regression hash-mismatches.",
    builder=lambda spark, sf: decode_media(
        synthetic_media_table(load_table(spark, sf, "documents")),
        decode_stub="real",
    )
    .select("media_id", "kind", "format", "width", "height", "n_frames")
    .orderBy("media_id"),
    oracle_sql_str="""
        SELECT doc_id AS media_id,
               CASE doc_id % 3 WHEN 0 THEN 'image'
                               WHEN 1 THEN 'audio'
                               ELSE 'video' END AS kind,
               CASE WHEN doc_id % 3 = 0 THEN
                      CASE (doc_id // 3) % 3 WHEN 0 THEN 'png'
                                             WHEN 1 THEN 'jpeg'
                                             ELSE 'gif' END
                    WHEN doc_id % 3 = 1 THEN 'wav'
                    ELSE 'gif' END AS format,
               CAST(CASE WHEN doc_id % 3 = 1 THEN 0
                         ELSE 64 + doc_id % 192 END AS INT) AS width,
               CAST(CASE WHEN doc_id % 3 = 1 THEN 0
                         ELSE 64 + (doc_id * 7) % 192 END AS INT) AS height,
               CAST(CASE doc_id % 3
                      WHEN 0 THEN 1
                      WHEN 1 THEN 1000 + (doc_id % 50) * 100
                      ELSE 2 + doc_id % 10 END AS INT) AS n_frames
        FROM documents
        ORDER BY media_id
    """,
))


Q(QuerySpec(
    name="pl_media_annotate",
    doc="Vision-annotation analog (reference vision_tool.py:115-349 "
        "detect_labels/localize_objects response shape): deterministic "
        "geometry annotations as ArrayType(StructType) via Arrow-batched "
        "mapInPandas over the decoded media table "
        "(operators/multimodal.py:annotate_media), exploded flat for the "
        "oracle. Every field is an exact integer function of the parsed "
        "geometry, so the oracle recomputes them from the synthetic "
        "media_id formulas; scores use the integer half-up DIV form on "
        "both sides (Python round() is banker's and would tie-flip).",
    builder=lambda spark, sf: annotate_media(
        decode_media(
            synthetic_media_table(load_table(spark, sf, "documents")),
            decode_stub="real",
        )
    )
    .select("media_id", "kind", F.explode("annotations").alias("a"))
    .select(
        "media_id", "kind",
        F.col("a.label").alias("label"),
        F.col("a.score").alias("score"),
        F.col("a.x").alias("x"), F.col("a.y").alias("y"),
        F.col("a.w").alias("w"), F.col("a.h").alias("h"),
    )
    .orderBy("media_id", "label"),
    oracle_sql_str="""
        WITH m AS (
          SELECT doc_id AS media_id,
                 CASE doc_id % 3 WHEN 0 THEN 'image'
                                 WHEN 1 THEN 'audio'
                                 ELSE 'video' END AS kind,
                 CAST(CASE WHEN doc_id % 3 = 1 THEN 0
                           ELSE 64 + doc_id % 192 END AS INT) AS width,
                 CAST(CASE WHEN doc_id % 3 = 1 THEN 0
                           ELSE 64 + (doc_id * 7) % 192 END AS INT) AS height,
                 CAST(CASE doc_id % 3
                        WHEN 0 THEN 1
                        WHEN 1 THEN 1000 + (doc_id % 50) * 100
                        ELSE 2 + doc_id % 10 END AS INT) AS n_frames
          FROM documents
        )
        SELECT media_id, kind, label, score, x, y, w, h FROM (
          SELECT media_id, kind, 'audio' AS label,
                 CAST((n_frames * 20000 + (n_frames + 1))
                      // (2 * (n_frames + 1)) AS DOUBLE) / 10000 AS score,
                 0 AS x, 0 AS y, 0 AS w, 0 AS h
          FROM m WHERE kind = 'audio'
          UNION ALL
          SELECT media_id, kind,
                 CASE WHEN width > height THEN 'landscape'
                      WHEN width < height THEN 'portrait'
                      ELSE 'square' END AS label,
                 CAST((greatest(width, height) * 20000 + (width + height))
                      // (2 * (width + height)) AS DOUBLE) / 10000 AS score,
                 width // 4 AS x, height // 4 AS y,
                 width // 2 AS w, height // 2 AS h
          FROM m WHERE kind <> 'audio'
          UNION ALL
          SELECT media_id, kind,
                 CASE WHEN n_frames > 1 THEN 'animated'
                      ELSE 'still' END AS label,
                 CAST((n_frames * 20000 + (n_frames + 1))
                      // (2 * (n_frames + 1)) AS DOUBLE) / 10000 AS score,
                 0 AS x, 0 AS y, width AS w, height AS h
          FROM m WHERE kind <> 'audio'
        )
        ORDER BY media_id, label
    """,
))


# ---- approximate sketches (bench-only tier) --------------------------------

Q(QuerySpec(
    name="pl_approx_distinct",
    doc="approx_count_distinct (HyperLogLog++) per returnflag — sketch "
        "register layouts differ across engines, so raw estimates can "
        "never hash-match DuckDB. The registered surface is the ERROR "
        "WITNESS instead (r9; the containment-witness pattern): each "
        "estimate is compared against the exact COUNT DISTINCT in the "
        "SAME plan, emitting within-3-rsd booleans (rsd 0.05 default "
        "-> 15% bound, huge margin over the observed <2% error) that a "
        "constant-shaped oracle pins — an estimator regression becomes "
        "driver-visible. Absolute accuracy additionally gated in "
        "tests/test_logs_guard.py.",
    builder=lambda spark, sf: load_table(spark, sf, "lineitem")
    .groupBy("l_returnflag")
    .agg(
        F.approx_count_distinct("l_suppkey").alias("a_supp"),
        F.approx_count_distinct("l_partkey").alias("a_part"),
        F.count_distinct("l_suppkey").alias("x_supp"),
        F.count_distinct("l_partkey").alias("x_part"),
    )
    .select(
        "l_returnflag",
        (
            F.abs(F.col("a_supp") - F.col("x_supp"))
            <= 0.15 * F.col("x_supp")
        ).alias("supp_ok"),
        (
            F.abs(F.col("a_part") - F.col("x_part"))
            <= 0.15 * F.col("x_part")
        ).alias("part_ok"),
    )
    .orderBy("l_returnflag"),
    oracle_sql_str="""
        SELECT l_returnflag, TRUE AS supp_ok, TRUE AS part_ok
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
))


# ---- sliding windows (oracle via window-expansion SQL) ---------------------

Q(QuerySpec(
    name="pl_sliding_window",
    doc="Sliding-window counts (10-min width, 5-min slide) over events — "
        "engine uses the native window() expansion; oracle is the "
        "window-expansion SQL harness (SURVEY §2.11: sliding windows have "
        "no single portable SQL, so the oracle generates window starts "
        "and range-joins). Range bounds derive from min/max(ts) — one "
        "slide before the first event's 5-min bucket (time_bucket is "
        "epoch-aligned for minute intervals, same as Spark's window()) "
        "through the last event — so the oracle tracks the data instead "
        "of hardcoding the testdata's time range.",
    builder=lambda spark, sf: load_table(spark, sf, "events")
    .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("win"), "event_type")
    .agg(F.count("*").alias("n"))
    .select(
        F.col("win.start").alias("win_start"),
        "event_type",
        "n",
    )
    .orderBy("win_start", "event_type"),
    oracle_sql_str="""
        WITH bounds AS (
            SELECT time_bucket(INTERVAL 5 MINUTE, MIN(ts))
                     - INTERVAL 5 MINUTE AS lo,
                   MAX(ts) AS hi
            FROM events
        ),
        w AS (  -- range() takes only constants: index a generous slide
                -- count (200k x 5 min ~ 2 years), filter to the data
            SELECT b.lo + k.range * INTERVAL 5 MINUTE AS ws
            FROM bounds b, range(0, 200000) k
            WHERE b.lo + k.range * INTERVAL 5 MINUTE <= b.hi
        )
        SELECT CAST(w.ws AS TIMESTAMP) AS win_start, e.event_type,
               COUNT(*) AS n
        FROM events e
        JOIN w ON e.ts >= w.ws AND e.ts < w.ws + INTERVAL 10 MINUTE
        GROUP BY w.ws, e.event_type
        ORDER BY win_start, event_type
    """,
))


Q(QuerySpec(
    name="pl_ivf_topk",
    doc="Approximate cosine top-5 via IVF partitioning (16 centroids, "
        "probe 4 — FAISS-IVF shape; operators/similarity.py:"
        "ivf_cosine_topk). K-means training is seeded but iterative, "
        "so raw picks are engine-specific; the registered surface is "
        "the per-query containment witness (every pick inside exact "
        "top-100 — worst measured exact rank 13 across all three SF "
        "dirs, >7x margin), giving a full driver hash row (r9; the "
        "pl_pq_topk pattern). Recall additionally gated via "
        "pl_ivf_recall + tests.",
    builder=lambda spark, sf: _containment_witness(
        __import__(
            "adenhq_hive_spark.operators.similarity",
            fromlist=["ivf_cosine_topk"],
        ).ivf_cosine_topk(*_queries_vecs(spark, sf), k=5),
        *_queries_vecs(spark, sf),
    ),
    oracle_sql_str="""
        SELECT vec_id AS query_id, CAST(5 AS BIGINT) AS n_k,
               TRUE AS contained
        FROM embeddings WHERE vec_id < 5 ORDER BY vec_id
    """,
))


Q(QuerySpec(
    name="pl_cosine_dedup",
    doc="Embedding-cosine near-dup pairs (semantic dedup tier): exact "
        "all-pairs cosine >= 0.45 (operators/similarity.py:"
        "cosine_dedup_pairs); oracle = DuckDB brute force. The LSH "
        "variant is recall-gated in tests/test_similarity.py.",
    # _materialize before the global sort: rangepartitioning SAMPLES its
    # child, which would run the blocked-BLAS pandas kernel twice (r12
    # range-sampling audit; per-run persist, released between queries)
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.dedup", fromlist=["_materialize"]
    )._materialize(__import__(
        "adenhq_hive_spark.operators.similarity", fromlist=["cosine_dedup_pairs"]
    ).cosine_dedup_pairs(load_table(spark, sf, "embeddings"), threshold=0.45))
    .orderBy("id_a", "id_b"),
    oracle_sql_str="""
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])), 4)
                 AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[])), 4)
              >= 0.45
        ORDER BY id_a, id_b
    """,
))


# ---- corpus curation (training-data hygiene tier) --------------------------

def _curation():
    from ..operators import curation

    return curation


Q(QuerySpec(
    name="pl_decontaminate",
    doc="Benchmark decontamination: train docs (source != 'src0') that "
        "share NO 5-word-gram with the eval split (source = 'src0') — "
        "inverted-index semi/anti-join shape, no pairwise comparison "
        "(operators/curation.py:decontaminate). Oracle: DuckDB "
        "list-lambda n-gram CTE.",
    builder=lambda spark, sf: _curation().decontaminate(
        load_table(spark, sf, "documents").filter(F.col("source") != "src0"),
        load_table(spark, sf, "documents").filter(F.col("source") == "src0"),
        n=5,
    ).select("doc_id").orderBy("doc_id"),
    oracle_sql_str="""
        WITH g AS (
          SELECT doc_id, source, unnest(list_distinct(list_transform(
                 range(1, greatest(len(string_split(lower(text), ' ')) - 4,
                                   0) + 1),
                 i -> array_to_string(
                     string_split(lower(text), ' ')[i:i+4], ' '))))
               AS gram
          FROM documents
        ),
        ev AS (SELECT DISTINCT gram FROM g WHERE source = 'src0'),
        bad AS (SELECT DISTINCT doc_id FROM g
                WHERE source <> 'src0' AND gram IN (SELECT gram FROM ev))
        SELECT doc_id FROM documents
        WHERE source <> 'src0' AND doc_id NOT IN (SELECT doc_id FROM bad)
        ORDER BY doc_id
    """,
))


Q(QuerySpec(
    name="pl_pii_redact",
    doc="PII redaction over deterministically-augmented text (each doc "
        "gets an email / phone / IPv4 by doc_id % 3 so the scrubber has "
        "real matches): per-class regexp_count + tag replacement, pure "
        "JVM map stage (operators/curation.py:pii_redact; patterns are "
        "RE2-compatible so the identical strings run on DuckDB).",
    builder=lambda spark, sf: _curation().pii_redact(
        load_table(spark, sf, "documents").withColumn(
            "aug",
            F.concat(
                F.col("text"),
                F.when(
                    F.col("doc_id") % 3 == 0,
                    F.concat(F.lit(" contact u"), F.col("doc_id"),
                             F.lit("@test.org")),
                ).when(
                    F.col("doc_id") % 3 == 1,
                    F.concat(
                        F.lit(" call 555-"),
                        F.lpad((F.col("doc_id") * 7 % 1000).cast("string"),
                               3, "0"),
                        F.lit("-"),
                        F.lpad((F.col("doc_id") * 13 % 10000).cast("string"),
                               4, "0"),
                    ),
                ).otherwise(
                    F.concat(F.lit(" ip 10.0."),
                             (F.col("doc_id") % 256).cast("string"),
                             F.lit(".1")),
                ),
            ),
        ),
        text_col="aug",
    ).select(
        "doc_id", "n_email", "n_phone", "n_ipv4",
        F.md5("redacted").alias("red_md5"),
    ).orderBy("doc_id"),
    oracle_sql_str=r"""
        WITH aug AS (
          SELECT doc_id,
                 text || CASE doc_id % 3
                   WHEN 0 THEN ' contact u' || doc_id || '@test.org'
                   WHEN 1 THEN ' call 555-'
                        || lpad(CAST(doc_id * 7 % 1000 AS VARCHAR), 3, '0')
                        || '-'
                        || lpad(CAST(doc_id * 13 % 10000 AS VARCHAR), 4, '0')
                   ELSE ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1'
                 END AS aug
          FROM documents
        )
        SELECT doc_id,
               len(regexp_extract_all(aug,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                 AS n_email,
               len(regexp_extract_all(aug,
                   '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS n_phone,
               len(regexp_extract_all(aug,
                   '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4,
               md5(regexp_replace(regexp_replace(regexp_replace(aug,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                   '<EMAIL>', 'g'),
                   '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'),
                   '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IPV4>', 'g'))
                 AS red_md5
        FROM aug
        ORDER BY doc_id
    """,
))


Q(QuerySpec(
    name="pl_hash_split",
    doc="Deterministic md5-routed train/val/test split (~80/10/10): the "
        "assignment follows the row (md5 hex prefix vs boundary strings), "
        "so it is reproducible across engines, runs and partitionings — "
        "unlike randomSplit (operators/curation.py:hash_split). Map-only, "
        "zero shuffle before the count.",
    builder=lambda spark, sf: _curation().hash_split(
        load_table(spark, sf, "documents")
    ).groupBy("split").agg(
        F.count("*").alias("n"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    ).orderBy("split"),
    oracle_sql_str="""
        SELECT CASE
                 WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccd'
                   THEN 'train'
                 WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666'
                   THEN 'val'
                 ELSE 'test'
               END AS split,
               COUNT(*) AS n, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
        FROM documents
        GROUP BY split
        ORDER BY split
    """,
))


Q(QuerySpec(
    name="pl_pack_sequences",
    doc="Sequence-packing manifest (concat-and-chunk, 512-token budget): "
        "each doc lands in the chunk where its first token falls — "
        "floor(exclusive running token sum / budget), windowed WITHIN "
        "source so no global sort exists at any scale "
        "(operators/curation.py:pack_sequences).",
    builder=lambda spark, sf: _curation().pack_sequences(
        load_table(spark, sf, "documents"), max_tokens=512
    ).orderBy("source", "doc_id"),
    oracle_sql_str="""
        WITH t AS (
          SELECT source, doc_id,
                 len(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS n_tokens
          FROM documents
        )
        SELECT source, doc_id, n_tokens,
               CAST(floor(COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) / 512) AS BIGINT) AS chunk_id
        FROM t
        ORDER BY source, doc_id
    """,
))


Q(QuerySpec(
    name="pl_pack_chunks",
    doc="Materialized packed training rows: each packing chunk's "
        "documents concatenated in doc-id order with counts — what the "
        "pretraining data loader reads (operators/curation.py:"
        "pack_chunks; md5 of the packed text keeps the result narrow). "
        "Oracle: DuckDB window + string_agg ORDER BY.",
    builder=lambda spark, sf: _curation().pack_chunks(
        load_table(spark, sf, "documents"), max_tokens=512
    ).select(
        "source", "chunk_id", "n_docs", "n_tokens",
        F.md5("packed_text").alias("packed_md5"),
    ).orderBy("source", "chunk_id"),
    oracle_sql_str="""
        WITH t AS (
          SELECT source, doc_id, text,
                 len(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS n_tokens
          FROM documents
        ),
        m AS (
          SELECT source, doc_id, text, n_tokens,
                 CAST(floor(COALESCE(SUM(n_tokens) OVER (
                     PARTITION BY source ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) / 512) AS BIGINT) AS chunk_id
          FROM t
        )
        SELECT source, chunk_id, COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
               md5(string_agg(text, ' ' ORDER BY doc_id)) AS packed_md5
        FROM m
        GROUP BY source, chunk_id
        ORDER BY source, chunk_id
    """,
))


Q(QuerySpec(
    name="pl_mixture_sample",
    doc="Deterministic domain re-weighting: keep a row iff its md5 prefix "
        "falls under its source's threshold (src0 ~12.5%, src1 ~50%, "
        "src2 ~75%, rest kept) — how mixture weights are applied "
        "reproducibly; pure per-row filter, zero shuffle before the "
        "count (operators/curation.py:mixture_sample).",
    builder=lambda spark, sf: _curation().mixture_sample(
        load_table(spark, sf, "documents"),
        {"src0": "2000", "src1": "8000", "src2": "c000"},
    ).groupBy("source").agg(F.count("*").alias("n")).orderBy("source"),
    oracle_sql_str="""
        SELECT source, COUNT(*) AS n
        FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
              CASE source WHEN 'src0' THEN '2000'
                          WHEN 'src1' THEN '8000'
                          WHEN 'src2' THEN 'c000'
                          ELSE 'ffff' END
        GROUP BY source
        ORDER BY source
    """,
))


Q(QuerySpec(
    name="pl_chunk",
    doc="Overlapping token-window chunking (64-token windows, stride 48 "
        "— 16-token overlap): the RAG / long-context preprocessing "
        "step. Entirely within-row (token array built once, slice per "
        "chunk), map-only at any corpus size "
        "(operators/curation.py:chunk_text). Oracle: DuckDB range + "
        "list slicing.",
    builder=lambda spark, sf: _curation().chunk_text(
        load_table(spark, sf, "documents"), window=64, stride=48
    ).select(
        "doc_id", "chunk_idx",
        F.md5("chunk_text").alias("chunk_md5"), "n_tokens",
    ).orderBy("doc_id", "chunk_idx"),
    oracle_sql_str="""
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split(text, ' '), x -> x <> '') AS toks
          FROM documents
        ),
        c AS (
          SELECT doc_id, toks,
                 unnest(range(1,
                     CAST(ceil((greatest(len(toks) - 64 + 1, 1) - 1)
                               / 48.0) AS INT) * 48 + 2,
                     48)) AS st
          FROM t
        )
        SELECT doc_id,
               CAST((st - 1) / 48 AS INT) AS chunk_idx,
               md5(array_to_string(toks[st:st+63], ' ')) AS chunk_md5,
               len(toks[st:st+63]) AS n_tokens
        FROM c
        ORDER BY doc_id, chunk_idx
    """,
))


Q(QuerySpec(
    name="pl_token_budget",
    doc="Per-domain token-budget subsample: keep whole docs in md5(id) "
        "order while the domain's exclusive running token total is "
        "under budget (src0:500 partial, src1:800 partial, src2:10000 "
        "full keep, src3:0 drop-all; unlisted domains dropped) — "
        "mixture weights turned into a sized training set "
        "(operators/curation.py:token_budget_sample). Oracle: DuckDB "
        "window with the same exclusive-frame cumsum.",
    builder=lambda spark, sf: _curation().token_budget_sample(
        load_table(spark, sf, "documents"),
        {"src0": 500, "src1": 800, "src2": 10000, "src3": 0},
    )
    .groupBy("source")
    .agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )
    .orderBy("source"),
    oracle_sql_str="""
        WITH t AS (
          SELECT source, doc_id,
                 len(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS n_tokens,
                 md5(CAST(doc_id AS VARCHAR)) AS h
          FROM documents
          WHERE source IN ('src0', 'src1', 'src2', 'src3')
        ),
        c AS (
          SELECT source, n_tokens,
                 COALESCE(SUM(n_tokens) OVER (
                     PARTITION BY source ORDER BY h, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS cum
          FROM t
        )
        SELECT source, COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
        FROM c
        WHERE cum < CASE source WHEN 'src0' THEN 500
                                WHEN 'src1' THEN 800
                                WHEN 'src2' THEN 10000
                                ELSE 0 END
        GROUP BY source
        ORDER BY source
    """,
))


def _passage_dedup_oracle(partition: str) -> str:
    """Shared DuckDB oracle for the passage-dedup family; ``partition``
    is the ROW_NUMBER key — md5(chunk_text) for corpus scope,
    (doc_id, md5(chunk_text)) for within-document scope."""
    return f"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split(text, ' '), x -> x <> '') AS tk
          FROM documents
        ),
        b AS (
          SELECT doc_id, CAST(i AS INT) AS chunk_idx,
                 array_to_string(tk[(i*10+1):((i+1)*10)], ' ')
                   AS chunk_text
          FROM t, LATERAL unnest(
              range(0, CAST(ceil(len(tk) / 10.0) AS BIGINT))) AS u(i)
          WHERE len(tk) > 0
        ),
        k AS (
          SELECT doc_id, chunk_idx, chunk_text,
                 ROW_NUMBER() OVER (PARTITION BY {partition}
                                    ORDER BY doc_id, chunk_idx) AS rn
          FROM b
        ),
        nb AS (SELECT doc_id, COUNT(*) AS n_blocks FROM b GROUP BY doc_id),
        kk AS (
          SELECT doc_id, COUNT(*) AS n_kept,
                 md5(string_agg(chunk_text, ' ' ORDER BY chunk_idx))
                   AS clean_md5
          FROM k WHERE rn = 1 GROUP BY doc_id
        )
        SELECT nb.doc_id,
               CAST(nb.n_blocks AS BIGINT) AS n_blocks,
               CAST(COALESCE(kk.n_kept, 0) AS BIGINT) AS n_kept,
               COALESCE(kk.clean_md5, md5('')) AS clean_md5
        FROM nb LEFT JOIN kk USING (doc_id)
        ORDER BY doc_id
    """


Q(QuerySpec(
    name="pl_passage_dedup",
    doc="Passage-level dedup: repeated 10-token passages removed "
        "corpus-wide, first (doc, position) occurrence kept — the "
        "distributed stand-in for exact-substring dedup "
        "(operators/curation.py:passage_dedup; disjoint chunk_text "
        "blocks + one md5-keyed window + positional reassembly). "
        "Oracle: DuckDB range-sliced blocks + ROW_NUMBER + ordered "
        "string_agg.",
    builder=lambda spark, sf: _curation().passage_dedup(
        load_table(spark, sf, "documents"), block=10
    ).orderBy("doc_id"),
    oracle_sql_str=_passage_dedup_oracle("md5(chunk_text)"),
))


Q(QuerySpec(
    name="pl_intradoc_dedup",
    doc="Within-document repeated-passage trim (RefinedWeb-style line "
        "dedup analog): 10-token blocks deduped per doc, first position "
        "kept (operators/curation.py:passage_dedup scope='doc'; the "
        "window partitions on (doc, block-hash) so no cross-document "
        "state exists). Oracle: same CTE chain with doc_id in the "
        "ROW_NUMBER partition.",
    builder=lambda spark, sf: _curation().passage_dedup(
        load_table(spark, sf, "documents"), block=10, scope="doc"
    ).orderBy("doc_id"),
    oracle_sql_str=_passage_dedup_oracle("doc_id, md5(chunk_text)"),
))


Q(QuerySpec(
    name="pl_stratified_sample",
    doc="Exact-k-per-stratum deterministic sample (k=10 per source): "
        "rank by md5(id) within stratum, keep the first k — exact counts "
        "and reproducible across engines/runs, unlike sampleBy; window "
        "partitioned by stratum, no global sort "
        "(operators/curation.py:stratified_sample_k). Oracle: DuckDB "
        "QUALIFY row_number over the same md5 order.",
    builder=lambda spark, sf: _curation().stratified_sample_k(
        load_table(spark, sf, "documents"), k=10
    ).select("source", "doc_id").orderBy("source", "doc_id"),
    oracle_sql_str="""
        SELECT source, doc_id
        FROM documents
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY source
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        ) <= 10
        ORDER BY source, doc_id
    """,
))


Q(QuerySpec(
    name="pl_repetition",
    doc="Gopher-style repetition filter: per-doc word-2-gram top-gram "
        "share and duplicate-gram share with a keep flag "
        "(operators/text.py:repetition_stats); (doc, gram) composite "
        "aggregation key — common grams spread across docs, no hot "
        "reducer. Oracle: DuckDB unnest + two-level aggregation.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.text", fromlist=["repetition_stats"]
    ).repetition_stats(
        load_table(spark, sf, "documents"), n=2
    ).orderBy("doc_id"),
    oracle_sql_str="""
        WITH g AS (
          SELECT doc_id, unnest(list_transform(
                 range(1, greatest(len(string_split(lower(text), ' ')) - 1,
                                   0) + 1),
                 i -> array_to_string(
                     string_split(lower(text), ' ')[i:i+1], ' ')))
               AS gram
          FROM documents
        ),
        pg AS (
          SELECT doc_id, gram, COUNT(*) AS c
          FROM g GROUP BY doc_id, gram
        ),
        pd AS (
          SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams,
                 COUNT(*) AS n_distinct,
                 MAX(c) AS top_c
          FROM pg GROUP BY doc_id
        )
        SELECT doc_id, n_grams, n_distinct,
               CAST((top_c * 20000 + n_grams) // (2 * n_grams) AS DOUBLE)
                 / 10000 AS top_frac,
               CAST(((n_grams - n_distinct) * 20000 + n_grams)
                    // (2 * n_grams) AS DOUBLE) / 10000 AS dup_frac,
               (top_c * 10000 <= n_grams * 2000
                AND (n_grams - n_distinct) * 10000 <= n_grams * 6000)
                 AS rep_ok
        FROM pd
        ORDER BY doc_id
    """,
))


def _curation_pipeline(spark, sf):
    """End-to-end corpus curation composed from the individual tiers —
    see the pl_curation_pipeline QuerySpec doc."""
    from ..operators.dedup import dedup_exact
    from ..operators.text import repetition_stats

    cur = _curation()
    docs = load_table(spark, sf, "documents")
    toks = docs.withColumn(
        "n_tokens",
        F.size(F.filter(F.split(F.col("text"), " "), lambda t: t != "")),
    )
    rep = repetition_stats(docs, n=2).select("doc_id", "rep_ok")
    keep1 = (
        toks.join(rep, "doc_id")
        .filter(F.col("rep_ok") & (F.col("n_tokens") >= 20))
        .drop("rep_ok")
    )
    keep2 = dedup_exact(keep1)
    train = keep2.filter(F.col("source") != "src0")
    eval_df = docs.filter(F.col("source") == "src0")
    clean = cur.decontaminate(train, eval_df, n=5)
    return (
        cur.hash_split(clean)
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .orderBy("split")
    )


_CURATION_ORACLE = """
        WITH toks AS (
          SELECT doc_id, text, source,
                 len(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS n_tokens
          FROM documents
        ),
        g2 AS (
          SELECT doc_id, unnest(list_transform(
                 range(1, greatest(len(string_split(lower(text), ' ')) - 1,
                                   0) + 1),
                 i -> array_to_string(
                     string_split(lower(text), ' ')[i:i+1], ' ')))
               AS gram
          FROM documents
        ),
        pg AS (
          SELECT doc_id, gram, COUNT(*) AS c FROM g2 GROUP BY doc_id, gram
        ),
        rep AS (
          SELECT doc_id,
                 (MAX(c) * 10000 <= SUM(c) * 2000
                  AND (SUM(c) - COUNT(*)) * 10000 <= SUM(c) * 6000) AS rep_ok
          FROM pg GROUP BY doc_id
        ),
        keep1 AS (
          SELECT t.* FROM toks t JOIN rep USING (doc_id)
          WHERE rep.rep_ok AND t.n_tokens >= 20
        ),
        ded AS (
          SELECT MIN(doc_id) AS doc_id FROM keep1 GROUP BY md5(text)
        ),
        keep2 AS (
          SELECT k.* FROM keep1 k WHERE k.doc_id IN (SELECT doc_id FROM ded)
        ),
        g5 AS (
          SELECT doc_id, source, unnest(list_distinct(list_transform(
                 range(1, greatest(len(string_split(lower(text), ' ')) - 4,
                                   0) + 1),
                 i -> array_to_string(
                     string_split(lower(text), ' ')[i:i+4], ' '))))
               AS gram
          FROM documents
        ),
        ev AS (SELECT DISTINCT gram FROM g5 WHERE source = 'src0'),
        bad AS (
          SELECT DISTINCT doc_id FROM g5
          WHERE source <> 'src0' AND gram IN (SELECT gram FROM ev)
        ),
        clean AS (
          SELECT * FROM keep2
          WHERE source <> 'src0'
            AND doc_id NOT IN (SELECT doc_id FROM bad)
        )
        SELECT CASE
                 WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccd'
                   THEN 'train'
                 WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666'
                   THEN 'val'
                 ELSE 'test'
               END AS split,
               COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
        FROM clean
        GROUP BY split
        ORDER BY split
    """


Q(QuerySpec(
    name="pl_curation_pipeline",
    doc="Capstone: the full curation pipeline composed from the "
        "individual tiers — token count + Gopher repetition filter "
        "(n_tokens >= 20, rep_ok) → exact dedup (min-id per md5) → "
        "benchmark decontamination vs the src0 eval split (5-grams) → "
        "md5-routed train/val/test split → per-split doc/token totals. "
        "Every stage is the same operator the standalone pl_* query "
        "exercises; the oracle recomputes the whole chain as one DuckDB "
        "CTE pipeline.",
    builder=_curation_pipeline,
    oracle_sql_str=_CURATION_ORACLE,
))


def _graph_curation(spark, sf):
    """The same curation pipeline executed THROUGH the GraphSpec DAG
    runner (plans/graph.py — the reference's core orchestration
    abstraction, executor.py): each stage is a graph node wired by
    memory keys, and the run's output must hash-match the identical
    DuckDB oracle as the directly-composed pl_curation_pipeline —
    proving the orchestration layer is transparent to the plan."""
    from ..operators.dedup import dedup_exact
    from ..operators.text import repetition_stats
    from ..plans.graph import EdgeSpec, GraphRunner, GraphSpec, NodeSpec

    cur = _curation()

    def load(memory):
        return load_table(spark, sf, "documents")

    def tokens(df, memory):
        return df.withColumn(
            "n_tokens",
            F.size(F.filter(F.split(F.col("text"), " "), lambda t: t != "")),
        )

    def rep_filter(df, memory):
        docs = load_table(spark, sf, "documents")
        rep = repetition_stats(docs, n=2).select("doc_id", "rep_ok")
        return (
            df.join(rep, "doc_id")
            .filter(F.col("rep_ok") & (F.col("n_tokens") >= 20))
            .drop("rep_ok")
        )

    def decon(df, memory):
        docs = load_table(spark, sf, "documents")
        return cur.decontaminate(
            df.filter(F.col("source") != "src0"),
            docs.filter(F.col("source") == "src0"),
            n=5,
        )

    def split_agg(df, memory):
        return (
            cur.hash_split(df)
            .groupBy("split")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum("n_tokens").alias("n_tokens"),
            )
            .orderBy("split")
        )

    g = GraphSpec(
        nodes={
            "load": NodeSpec("load", "python", fn=load, output="docs"),
            "tokens": NodeSpec("tokens", "python", fn=tokens,
                               inputs=["docs"], output="toks"),
            "rep": NodeSpec("rep", "python", fn=rep_filter,
                            inputs=["toks"], output="keep1"),
            "dedup": NodeSpec(
                "dedup", "python",
                fn=lambda df, memory: dedup_exact(df),
                inputs=["keep1"], output="keep2",
            ),
            "decon": NodeSpec("decon", "python", fn=decon,
                              inputs=["keep2"], output="clean"),
            "split": NodeSpec("split", "python", fn=split_agg,
                              inputs=["clean"], output="final"),
        },
        edges=[
            EdgeSpec("load", "tokens"),
            EdgeSpec("tokens", "rep"),
            EdgeSpec("rep", "dedup"),
            EdgeSpec("dedup", "decon"),
            EdgeSpec("decon", "split"),
        ],
        entry="load",
        terminals={"split"},
    )
    res = GraphRunner(spark).execute(g)
    assert res.completed
    return res.memory["final"]


Q(QuerySpec(
    name="pl_graph_curation",
    doc="The curation pipeline executed through the GraphSpec DAG "
        "runner (plans/graph.py): stages as python nodes wired by "
        "memory keys, hash-matched against the SAME DuckDB oracle as "
        "pl_curation_pipeline — the orchestration layer adds no "
        "semantics, it only schedules the lazy plan.",
    builder=_graph_curation,
    oracle_sql_str=_CURATION_ORACLE,
))


Q(QuerySpec(
    name="pl_bpe",
    doc="BPE merge training over the corpus token stream (8 rounds): "
        "distributed pair counting + within-row sequential merge fold "
        "in Catalyst higher-order functions; per-round argmax is a "
        "1-row driver fetch (operators/bpe.py:bpe_train). Iterative "
        "algorithm -> no single-SQL oracle (rows-only); exact-match "
        "parity with a sequential Python reference implementation is "
        "pinned in tests/test_text.py.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.bpe",
        fromlist=["bpe_train", "bpe_merge_table"],
    ).bpe_merge_table(
        spark,
        __import__(
            "adenhq_hive_spark.operators.bpe", fromlist=["bpe_train"]
        ).bpe_train(
            load_table(spark, sf, "documents"), n_merges=8
        )[0],
    ).orderBy("rank"),
    has_oracle=False,
))


Q(QuerySpec(
    name="pl_unigram_logprob",
    doc="Per-doc mean unigram negative log-probability — the cheap "
        "LM-perplexity proxy for quality filtering (operators/text.py:"
        "unigram_logprob; Laplace add-one over the corpus vocabulary, "
        "frequency table broadcast back). Oracle: identical formulation "
        "in DuckDB.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.text", fromlist=["unigram_logprob"]
    ).unigram_logprob(load_table(spark, sf, "documents"))
    .orderBy("doc_id"),
    oracle_sql_str="""
        WITH ex AS (
          SELECT doc_id, unnest(list_filter(
                 string_split(lower(text), ' '), t -> t <> '')) AS tok
          FROM documents
        ),
        freq AS (SELECT tok, COUNT(*) AS c FROM ex GROUP BY tok),
        tot AS (SELECT SUM(c) AS total, COUNT(*) AS vocab FROM freq)
        SELECT e.doc_id, COUNT(*) AS n_toks,
               ROUND(AVG(-ln((f.c + 1.0) / (t.total + t.vocab))), 4)
                 AS avg_neg_logp
        FROM ex e JOIN freq f USING (tok) CROSS JOIN tot t
        GROUP BY e.doc_id
        ORDER BY e.doc_id
    """,
))


Q(QuerySpec(
    name="pl_char_entropy",
    doc="Per-doc Shannon character entropy (nats) — the gibberish "
        "detector: base64/hex/packed blobs score near ln(alphabet), "
        "repeated-char spam scores near 0, natural language sits in a "
        "stable mid band (operators/text.py:char_entropy). In-row "
        "exact-integer counts, map-only (the explode formulation "
        "would shuffle one row per corpus CHARACTER); ln + ROUND(4) "
        "portability device.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.text", fromlist=["char_entropy"]
    ).char_entropy(load_table(spark, sf, "documents"))
    .orderBy("doc_id"),
    oracle_sql_str="""
        WITH cs AS (
          SELECT doc_id, len(text) AS n_chars,
                 list_transform(range(1, len(text) + 1),
                                i -> substr(text, i, 1)) AS chars
          FROM documents WHERE len(text) > 0
        )
        SELECT doc_id, CAST(n_chars AS INT) AS n_chars,
               ROUND(ln(n_chars) - list_aggregate(
                 list_transform(
                   list_transform(list_distinct(chars),
                     d -> len(list_filter(chars, c -> c = d))),
                   c -> c * ln(c)), 'sum') / n_chars, 4) AS entropy
        FROM cs
        ORDER BY doc_id
    """,
))


Q(QuerySpec(
    name="pl_winnow_pairs",
    doc="Partial-copy candidate pairs via winnowing fingerprints "
        "(Schleimer/Wilkerson/Aiken 2003, the MOSS scheme; operators/"
        "search.py:winnow_overlap_pairs): min-hash of each w=4 window "
        "over char-5-gram md5-prefix hashes, shared-fingerprint pair "
        "counts — detects a lifted PASSAGE between otherwise-different "
        "docs (whole-doc jaccard tiers can't). Guarantee: any shared "
        "substring >= k+w-1 = 8 chars yields a shared fingerprint. "
        "Map-only fingerprinting, inverted-index pair join; "
        "max_fp_df=50 caps boilerplate keys (same contract as "
        "max_shingle_df) — synthetic docs share template passages, and "
        "an uncapped hot fingerprint fans the pair join out "
        "quadratically (measured: 12 s -> 14 MIN from sf0.1 to sf1 "
        "before the cap); the oracle applies the identical cap, so the "
        "hash row pins the capped semantics.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.search",
        fromlist=["winnow_overlap_pairs"],
    ).winnow_overlap_pairs(
        load_table(spark, sf, "documents"), k=5, w=4, min_shared=3,
        max_fp_df=50,
    ),
    oracle_sql_str="""
        WITH g AS (
          SELECT doc_id AS id,
                 list_transform(
                   range(1, greatest(len(lower(text)) - 5 + 1, 0) + 1),
                   i -> CAST(('0x' || substr(
                          md5(substr(lower(text), i, 5)), 1, 8))
                        AS BIGINT)) AS hs
          FROM documents
        ),
        fp AS (
          SELECT id, unnest(list_distinct(list_transform(
                   range(1, greatest(len(hs) - 4 + 1, 1) + 1),
                   j -> list_min(hs[j:j+3])))) AS fp
          FROM g WHERE len(hs) >= 1
        ),
        cool AS (
          SELECT fp FROM fp GROUP BY fp HAVING COUNT(*) <= 50
        ),
        live AS (SELECT f.* FROM fp f JOIN cool USING (fp))
        SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_shared
        FROM live a JOIN live b ON a.fp = b.fp AND a.id < b.id
        GROUP BY a.id, b.id
        HAVING COUNT(*) >= 3
        ORDER BY id_a, id_b
    """,
))


Q(QuerySpec(
    name="pl_bigram_logprob",
    doc="Per-doc mean bigram negative log-probability — the CCNet-"
        "recipe LM quality proxy one rung above pl_unigram_logprob "
        "(sees word ORDER: shuffled-token spam that fools a unigram "
        "model scores high here). Add-one-smoothed corpus bigram "
        "model; bigram counts join on the KEY (shuffle by design — "
        "the bigram vocabulary is not broadcastable at 100 TB), "
        "unigram table broadcast (operators/text.py:bigram_logprob). "
        "ln + ROUND(4) = the established portability device.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.text", fromlist=["bigram_logprob"]
    ).bigram_logprob(load_table(spark, sf, "documents"))
    .orderBy("doc_id"),
    oracle_sql_str="""
        WITH tk AS (
          SELECT doc_id, list_filter(
                 string_split(lower(text), ' '), t -> t <> '') AS t
          FROM documents
        ),
        pairs AS (
          SELECT doc_id, t[i] AS a, t[i + 1] AS b
          FROM tk, unnest(range(1, len(t))) AS r(i)
          WHERE len(t) >= 2
        ),
        unic AS (
          SELECT tok, COUNT(*) AS c_uni
          FROM (SELECT unnest(t) AS tok FROM tk) GROUP BY tok
        ),
        voc AS (SELECT COUNT(*) AS vocab FROM unic),
        bigc AS (SELECT a, b, COUNT(*) AS c_big FROM pairs GROUP BY a, b)
        SELECT p.doc_id, COUNT(*) AS n_bigrams,
               ROUND(AVG(-ln((g.c_big + 1.0) / (u.c_uni + v.vocab))), 4)
                 AS avg_neg_logp
        FROM pairs p
        JOIN bigc g USING (a, b)
        JOIN unic u ON u.tok = p.a
        CROSS JOIN voc v
        GROUP BY p.doc_id
        ORDER BY doc_id
    """,
))


Q(QuerySpec(
    name="pl_dedup_incremental",
    doc="Incremental ingestion dedup: a new batch (doc_id >= 250) "
        "deduplicated against the existing corpus (doc_id < 250) — "
        "exact content-hash drop, near-dup drop vs corpus (jaccard "
        ">= 0.5 via the inverted-index semi shape), then exact + "
        "greedy near dedup within the batch "
        "(operators/dedup.py:dedup_incremental). Cost scales with the "
        "batch, never corpus²: the growing-corpus pattern.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.dedup", fromlist=["dedup_incremental"]
    ).dedup_incremental(
        load_table(spark, sf, "documents").filter(F.col("doc_id") >= 250),
        load_table(spark, sf, "documents").filter(F.col("doc_id") < 250),
        k=3, threshold=0.5,
    ).select("doc_id").orderBy("doc_id"),
    oracle_sql_str="""
        WITH corpus AS (SELECT * FROM documents WHERE doc_id < 250),
        newb AS (SELECT * FROM documents WHERE doc_id >= 250),
        fresh AS (
          SELECT * FROM newb
          WHERE md5(text) NOT IN (SELECT md5(text) FROM corpus)
        ),
        shf AS (
          SELECT doc_id AS id, list_distinct(list_transform(
                 range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
                 i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))
               AS sh
          FROM fresh
        ),
        shc AS (
          SELECT doc_id AS cid, list_distinct(list_transform(
                 range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
                 i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))
               AS csh
          FROM corpus
        ),
        cand AS (
          SELECT DISTINCT a.id, b.cid
          FROM (SELECT id, unnest(sh) AS s FROM shf) a
          JOIN (SELECT cid, unnest(csh) AS s FROM shc) b USING (s)
        ),
        near AS (
          SELECT DISTINCT c.id
          FROM cand c JOIN shf ON shf.id = c.id
          JOIN shc ON shc.cid = c.cid
          WHERE CAST(len(list_intersect(shf.sh, shc.csh)) AS DOUBLE)
                / len(list_distinct(list_concat(shf.sh, shc.csh))) >= 0.5
        ),
        surv AS (
          SELECT * FROM fresh
          WHERE doc_id NOT IN (SELECT id FROM near)
        ),
        ded AS (
          SELECT * FROM surv
          WHERE doc_id IN (SELECT MIN(doc_id) FROM surv GROUP BY md5(text))
        ),
        shd AS (SELECT s.id, s.sh FROM shf s
                WHERE s.id IN (SELECT doc_id FROM ded)),
        pairs AS (
          SELECT DISTINCT a.id AS id_a, b.id AS id_b
          FROM (SELECT id, unnest(sh) AS s FROM shd) a
          JOIN (SELECT id, unnest(sh) AS s FROM shd) b
            ON a.s = b.s AND a.id < b.id
        ),
        nearb AS (
          -- within-batch tier goes through ngram_jaccard_pairs, which
          -- filters the ROUNDed jaccard — test the same value here
          SELECT DISTINCT p.id_b
          FROM pairs p JOIN shd sa ON sa.id = p.id_a
          JOIN shd sb ON sb.id = p.id_b
          WHERE ROUND(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
                / len(list_distinct(list_concat(sa.sh, sb.sh))), 4) >= 0.5
        )
        SELECT doc_id FROM ded
        WHERE doc_id NOT IN (SELECT id_b FROM nearb)
        ORDER BY doc_id
    """,
))


Q(QuerySpec(
    name="pl_fused_clusters",
    doc="Fused-evidence duplicate clusters: near-dup EDGES from the "
        "text tier (3-gram jaccard >= 0.5) UNION the semantic tier "
        "(embedding cosine >= 0.45, vec_id aligned with doc_id) "
        "resolved into transitive clusters by the same star-contraction "
        "components — textual and semantic duplicate evidence combined "
        "before cluster resolution, the production dedup topology. "
        "Oracle: recursive-CTE closure over the identical fused edge "
        "set.",
    builder=lambda spark, sf: dup_clusters(
        load_table(spark, sf, "documents"),
        pairs=ngram_jaccard_pairs(
            load_table(spark, sf, "documents"), k=3, threshold=0.5
        ).select("id_a", "id_b").union(
            __import__(
                "adenhq_hive_spark.operators.similarity",
                fromlist=["cosine_dedup_pairs"],
            ).cosine_dedup_pairs(
                load_table(spark, sf, "embeddings"), threshold=0.45
            ).select("id_a", "id_b")
        ).dropDuplicates(),
    ).orderBy("doc_id"),
    oracle_sql_str="""
        WITH RECURSIVE sh AS (
          SELECT doc_id AS id, list_distinct(list_transform(
                 range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
                 i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))
               AS shs
          FROM documents
        ), ex AS (SELECT id, unnest(shs) AS shingle FROM sh),
        sizes AS (SELECT id, len(shs) AS n FROM sh),
        inter AS (
          SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_inter
          FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.id < b.id
          GROUP BY a.id, b.id
        ),
        jpairs AS (
          SELECT id_a, id_b
          FROM inter
          JOIN sizes sa ON sa.id = inter.id_a
          JOIN sizes sb ON sb.id = inter.id_b
          WHERE ROUND(CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter), 4) >= 0.5
        ),
        cpairs AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b
          FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
          WHERE ROUND(list_cosine_similarity(
                    CAST(a.embedding AS DOUBLE[]),
                    CAST(b.embedding AS DOUBLE[])), 4) >= 0.45
        ),
        pairs AS (SELECT * FROM jpairs UNION SELECT * FROM cpairs),
        edges AS (
          SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b, id_a FROM pairs
        ),
        reach(src, dst) AS (
          SELECT u, u FROM (SELECT DISTINCT u FROM edges)
          UNION
          SELECT r.src, e.v FROM reach r JOIN edges e ON e.u = r.dst
        )
        SELECT d.doc_id,
               COALESCE(m.cluster_id, d.doc_id) AS cluster_id
        FROM documents d
        LEFT JOIN (
          SELECT src AS doc_id, MIN(dst) AS cluster_id
          FROM reach GROUP BY src
        ) m USING (doc_id)
        ORDER BY d.doc_id
    """,
))


Q(QuerySpec(
    name="pl_minhash_portable",
    doc="MinHash(16)+LSH(8 bands x 2) near-dup pairs with an "
        "engine-portable md5 hash family (operators/dedup.py:"
        "minhash_lsh_pairs_portable): the banding algebra that the "
        "production xxhash64 tier uses, made value-checkable against "
        "DuckDB — same seeds, same band grouping, exact-jaccard "
        "verification of bucket candidates on both engines.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.dedup",
        fromlist=["minhash_lsh_pairs_portable"],
    ).minhash_lsh_pairs_portable(
        load_table(spark, sf, "documents"), k=3, threshold=0.5
    ).orderBy("id_a", "id_b"),
    oracle_sql_str="""
        WITH sh AS (
          SELECT doc_id AS id, list_distinct(list_transform(
                 range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
                 i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))
               AS shs
          FROM documents
        ),
        ex AS (
          SELECT id,
                 CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)
                   % 2147483647 AS h
          FROM (SELECT id, unnest(shs) AS s FROM sh WHERE len(shs) > 0)
        ),
        sig AS (
          SELECT id, i,
                 MIN(((2 * i + 3) * h + (1000003 * i + 12345))
                     % 2305843009213693951) AS sig
          FROM ex CROSS JOIN (SELECT unnest(range(16)) AS i)
          GROUP BY id, i
        ),
        band AS (
          SELECT id, CAST(i // 2 AS INT) AS band,
                 string_agg(CAST(sig AS VARCHAR), '_' ORDER BY i) AS key
          FROM sig GROUP BY id, CAST(i // 2 AS INT)
        ),
        cand AS (
          SELECT DISTINCT a.id AS id_a, b.id AS id_b
          FROM band a JOIN band b
            ON a.band = b.band AND a.key = b.key AND a.id < b.id
        ),
        verified AS (
          SELECT c.id_a, c.id_b,
                 ROUND(CAST(len(list_intersect(sa.shs, sb.shs)) AS DOUBLE)
                       / len(list_distinct(list_concat(sa.shs, sb.shs))), 4)
                   AS jaccard
          FROM cand c
          JOIN sh sa ON sa.id = c.id_a
          JOIN sh sb ON sb.id = c.id_b
        )
        SELECT id_a, id_b, jaccard FROM verified
        WHERE jaccard >= 0.5
        ORDER BY id_a, id_b
    """,
))


Q(QuerySpec(
    name="pl_simhash_portable",
    doc="60-bit SimHash near-dup pairs (hamming <= 6) with the "
        "engine-portable md5 hash family (operators/dedup.py:"
        "simhash_pairs portable=True): per-bit vote sums, bit packing, "
        "4x15-bit chunk banding and hamming verification all "
        "value-checked against DuckDB — the production xxhash64 tier's "
        "algebra, made oracle-visible.",
    builder=lambda spark, sf: simhash_pairs(
        load_table(spark, sf, "documents"), k=3, max_hamming=6,
        portable=True,
    ).orderBy("id_a", "id_b"),
    oracle_sql_str="""
        WITH sh AS (
          SELECT doc_id AS id, list_distinct(list_transform(
                 range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
                 i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))
               AS shs
          FROM documents
        ),
        hx AS (
          SELECT id,
                 CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h
          FROM (SELECT id, unnest(shs) AS tok FROM sh)
        ),
        bits AS (
          SELECT id, b,
                 SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
          FROM hx CROSS JOIN (SELECT unnest(range(60)) AS b)
          GROUP BY id, b
        ),
        sig AS (
          SELECT id,
                 SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b)
                          ELSE 0 END) AS s
          FROM bits GROUP BY id
        ),
        ch AS (
          SELECT id, s, c, (s >> (15 * CAST(c AS INT))) & 32767 AS chunk
          FROM sig CROSS JOIN (SELECT unnest(range(4)) AS c)
        ),
        cand AS (
          SELECT DISTINCT a.id AS id_a, b.id AS id_b,
                 bit_count(xor(a.s, b.s)) AS hamming
          FROM ch a JOIN ch b
            ON a.c = b.c AND a.chunk = b.chunk AND a.id < b.id
        )
        SELECT id_a, id_b, hamming FROM cand
        WHERE hamming <= 6
        ORDER BY id_a, id_b
    """,
))


Q(QuerySpec(
    name="pl_centroids",
    doc="Per-label embedding centroid stats: class size, centroid L2 "
        "norm, mean member-to-centroid cosine (cluster-cohesion "
        "diagnostic; operators/similarity.py:label_centroids). Exploded "
        "cells aggregate to a tiny centroid table that broadcasts back "
        "onto the streaming member side. Oracle: DuckDB unnest + "
        "two-level aggregation over the same double-cast cells.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.similarity", fromlist=["label_centroids"]
    ).label_centroids(load_table(spark, sf, "embeddings"))
    .orderBy("label"),
    oracle_sql_str="""
        WITH ex AS (
          SELECT label, vec_id,
                 generate_subscripts(embedding, 1) AS pos,
                 CAST(unnest(embedding) AS DOUBLE) AS v
          FROM embeddings
        ),
        cent AS (
          SELECT label, pos, AVG(v) AS c FROM ex GROUP BY label, pos
        ),
        per_vec AS (
          SELECT e.label, e.vec_id,
                 SUM(e.v * c.c) AS dot,
                 SUM(e.v * e.v) AS m2,
                 SUM(c.c * c.c) AS c2
          FROM ex e JOIN cent c ON e.label = c.label AND e.pos = c.pos
          GROUP BY e.label, e.vec_id
        )
        SELECT label, COUNT(*) AS n_vecs,
               ROUND(sqrt(ANY_VALUE(c2)), 4) AS centroid_norm,
               ROUND(AVG(dot / (sqrt(m2) * sqrt(c2))), 4) AS avg_cos
        FROM per_vec
        GROUP BY label
        ORDER BY label
    """,
))


# ---- vocabulary + normalization (LLM preprocessing staples) ----------------

Q(QuerySpec(
    name="pl_vocab",
    doc="Corpus vocabulary: top-100 tokens with counts and document "
        "frequency (tokenizer-building / corpus-stats staple; explode + "
        "two-level aggregation).",
    builder=lambda spark, sf: load_table(spark, sf, "documents")
    .select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    .groupBy("tok")
    .agg(
        F.count("*").alias("n"),
        F.countDistinct("doc_id").alias("doc_freq"),
    )
    .orderBy(F.desc("n"), "tok")
    .limit(100),
    oracle_sql_str="""
        SELECT tok, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS doc_freq
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents) t
        GROUP BY tok
        ORDER BY n DESC, tok
        LIMIT 100
    """,
))

Q(QuerySpec(
    name="pl_tfidf",
    doc="Top-5 TF-IDF terms per document (corpus-analysis / keyword-"
        "extraction staple; operators/text.py:tfidf_top_terms). One "
        "explode + two hash aggregations + a term-keyed join that reuses "
        "the aggregation's partitioning, scalar N on a 1-row broadcast, "
        "per-doc top-k via row_number — all JVM-side. Oracle: same "
        "formulation in DuckDB SQL (smoothed sklearn-style idf).",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.text", fromlist=["tfidf_top_terms"]
    ).tfidf_top_terms(
        load_table(spark, sf, "documents"), text_col="text",
        id_col="doc_id", k=5,
    ).orderBy("doc_id", "rnk"),
    oracle_sql_str="""
        WITH ex AS (
          SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
          FROM documents
        ),
        tf AS (
          SELECT doc_id, term, COUNT(*) AS tf
          FROM ex WHERE term <> '' GROUP BY doc_id, term
        ),
        dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
          SELECT tf.doc_id, tf.term,
                 ROUND(tf.tf * (ln((n.n_docs + 1.0) / (dfreq.df + 1.0))
                                + 1.0), 4) AS tfidf
          FROM tf JOIN dfreq USING (term) CROSS JOIN n
        )
        SELECT doc_id, rnk, term, tfidf
        FROM (
          SELECT doc_id, term, tfidf,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                                    ORDER BY tfidf DESC, term) AS rnk
          FROM scored
        ) t
        WHERE rnk <= 5
        ORDER BY doc_id, rnk
    """,
))

Q(QuerySpec(
    name="pl_normalize_text",
    doc="Text normalization tier: NFC + casefold + whitespace collapse, "
        "with before/after distinct counts (preprocessing before any "
        "dedup tier). Spark has no NFC builtin, so NFC runs as an "
        "Arrow-batched pandas UDF (the documented slow-path escape "
        "hatch); oracle uses DuckDB nfc_normalize.",
    builder=lambda spark, sf: load_table(spark, sf, "documents")
    .select(
        __import__(
            'adenhq_hive_spark.operators.text', fromlist=['nfc_normalize_udf']
        ).nfc_normalize_udf()(
            F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
        ).alias("norm")
    )
    .agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("norm").alias("n_distinct_norm"),
        F.round(F.avg(F.length("norm")), 4).alias("avg_len"),
    ),
    oracle_sql_str=r"""
        SELECT COUNT(*) AS n_docs,
               COUNT(DISTINCT nfc_normalize(lower(trim(
                   regexp_replace(text, '\s+', ' ', 'g'))))) AS n_distinct_norm,
               ROUND(AVG(length(nfc_normalize(lower(trim(
                   regexp_replace(text, '\s+', ' ', 'g')))))), 4) AS avg_len
        FROM documents
    """,
))


# ---- incremental snapshot bookkeeping -------------------------------------

def _snapshot_diff_builder(spark, sf):
    """Old snapshot = documents minus the 3-suffixed ids (those arrive
    later); new snapshot = documents minus the 7-suffixed ids, with every
    multiple-of-5 doc revised — exercising all four diff statuses."""
    from ..operators.curation import snapshot_diff

    docs = load_table(spark, sf, "documents")
    old = docs.filter(F.col("doc_id") % 10 != 3)
    new = docs.filter(F.col("doc_id") % 10 != 7).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.col("text"), F.lit(" rev2")),
        ).otherwise(F.col("text")),
    )
    return snapshot_diff(old, new).orderBy("doc_id")


Q(QuerySpec(
    name="pl_snapshot_diff",
    doc="Corpus snapshot diff (added/removed/changed/unchanged between an "
        "old and a new ingestion snapshot) via map-side md5(text) + one "
        "full outer join on doc_id — only (id, hash) pairs shuffle, never "
        "document bodies (operators/curation.py:snapshot_diff). The "
        "incremental-pipeline bookkeeping twin of pl_dedup_incremental.",
    builder=_snapshot_diff_builder,
    oracle_sql_str="""
        WITH old AS (
          SELECT doc_id, md5(text) AS old_md5
          FROM documents WHERE doc_id % 10 <> 3
        ), new AS (
          SELECT doc_id,
                 md5(CASE WHEN doc_id % 5 = 0 THEN text || ' rev2'
                          ELSE text END) AS new_md5
          FROM documents WHERE doc_id % 10 <> 7
        )
        SELECT doc_id,
               CASE WHEN old_md5 IS NULL THEN 'added'
                    WHEN new_md5 IS NULL THEN 'removed'
                    WHEN old_md5 <> new_md5 THEN 'changed'
                    ELSE 'unchanged' END AS status,
               old_md5, new_md5
        FROM old FULL OUTER JOIN new USING (doc_id)
        ORDER BY doc_id
    """,
))


Q(QuerySpec(
    name="pl_shuffle_shard",
    doc="Deterministic global shuffle + 16-way sharding for training "
        "export: shard = first md5 hex digit (per-character instr "
        "arithmetic — engine-portable), position = row_number within the "
        "shard ordered by full md5. Compiles to ONE hash shuffle on "
        "shard_id + shard-local sorts; no total order over the corpus at "
        "any scale (operators/curation.py:shuffle_shard).",
    builder=lambda spark, sf: _curation().shuffle_shard(
        load_table(spark, sf, "documents"), shard_hex_chars=1
    ).select(
        F.col("shard_id").cast("bigint").alias("shard_id"),
        F.col("pos").cast("bigint").alias("pos"),
        "doc_id",
    ).orderBy("shard_id", "pos"),
    oracle_sql_str="""
        WITH t AS (
          SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h
          FROM documents
        )
        SELECT CAST(strpos('0123456789abcdef', substr(h, 1, 1)) - 1
                    AS BIGINT) AS shard_id,
               CAST(row_number() OVER (
                   PARTITION BY substr(h, 1, 1) ORDER BY h, doc_id
               ) AS BIGINT) AS pos,
               doc_id
        FROM t
        ORDER BY shard_id, pos
    """,
))


# ---- published filter batteries (Gopher, C4) ------------------------------

Q(QuerySpec(
    name="pl_gopher_rules",
    doc="Published Gopher quality-rule battery per document (Rae et al. "
        "2021, table A1): word-count bounds, mean word length, symbol "
        "ratio, bullet/ellipsis line fractions, alpha-word fraction, "
        "stopword presence, and the all-rules keep verdict "
        "(operators/text.py:gopher_rules). Map-only, no shuffle; every "
        "fraction and threshold is exact integer arithmetic. "
        "min_stop_hits=1 here: the synthetic corpus vocabulary contains "
        "only 'the' from the published stopword list.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.text", fromlist=["gopher_rules"]
    ).gopher_rules(
        load_table(spark, sf, "documents"), min_stop_hits=1
    ).orderBy("doc_id"),
    oracle_sql_str=r"""
        WITH b AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\s+'),
                             x -> x <> '') AS words,
                 list_filter(string_split_regex(text, '\n'),
                             x -> x <> '') AS lines,
                 length(regexp_replace(text, '\s+', '', 'g')) AS word_chars,
                 len(regexp_extract_all(text, '#'))
                   + len(regexp_extract_all(text, '\.\.\.')) AS symbol_hits,
                 text
          FROM documents
        ), m AS (
          SELECT doc_id,
                 len(words) AS n_words,
                 greatest(len(lines), 1) AS n_lines,
                 word_chars, symbol_hits,
                 len(list_filter(lines,
                     l -> regexp_matches(l, '^\s*[-*•]'))) AS bullet_lines,
                 len(list_filter(lines,
                     l -> regexp_matches(l, '(\.\.\.|…)\s*$')))
                   AS ellipsis_lines,
                 len(list_filter(words,
                     w -> regexp_matches(w, '[A-Za-z]'))) AS alpha_words,
                 len(list_intersect(list_transform(words, w -> lower(w)),
                     ['the','be','to','of','and','that','have','with']))
                   AS stop_hits,
                 greatest(len(words), 1) AS q
          FROM b
        )
        SELECT doc_id, n_words, n_lines,
               CAST((word_chars * 20000 + q) // (2 * q) AS DOUBLE) / 10000
                 AS mean_word_len,
               CAST((symbol_hits * 20000 + q) // (2 * q) AS DOUBLE) / 10000
                 AS symbol_frac,
               CAST((bullet_lines * 20000 + n_lines) // (2 * n_lines)
                    AS DOUBLE) / 10000 AS bullet_frac,
               CAST((ellipsis_lines * 20000 + n_lines) // (2 * n_lines)
                    AS DOUBLE) / 10000 AS ellipsis_frac,
               CAST((alpha_words * 20000 + q) // (2 * q) AS DOUBLE) / 10000
                 AS alpha_word_frac,
               stop_hits,
               (n_words >= 50 AND n_words <= 100000) AS ok_words,
               (word_chars >= 3 * q AND word_chars <= 10 * q)
                 AS ok_mean_word_len,
               (symbol_hits * 10 < q) AS ok_symbol,
               (bullet_lines * 10 < 9 * n_lines) AS ok_bullet,
               (ellipsis_lines * 10 < 3 * n_lines) AS ok_ellipsis,
               (alpha_words * 10 >= 8 * q) AS ok_alpha,
               (stop_hits >= 1) AS ok_stop,
               (n_words >= 50 AND n_words <= 100000
                AND word_chars >= 3 * q AND word_chars <= 10 * q
                AND symbol_hits * 10 < q
                AND bullet_lines * 10 < 9 * n_lines
                AND ellipsis_lines * 10 < 3 * n_lines
                AND alpha_words * 10 >= 8 * q
                AND stop_hits >= 1) AS gopher_ok
        FROM m
        ORDER BY doc_id
    """,
))


def _c4_filter_builder(spark, sf):
    """Synthesize multi-line 'pages' from the single-line synthetic docs
    (every 10th word boundary becomes '.\\n' — a portable regex both
    engines apply identically), then run the C4 line battery."""
    from ..operators.text import c4_line_filter

    docs = load_table(spark, sf, "documents").withColumn(
        "page",
        F.regexp_replace(
            F.col("text"), r"((\S+\s+){9}\S+)\s+", "$1.\n"
        ),
    )
    return c4_line_filter(docs, text_col="page").orderBy("doc_id")


Q(QuerySpec(
    name="pl_c4_filter",
    doc="C4-style line-level page cleaning (Raffel et al. 2020 §2.2): "
        "terminal-punctuation lines of >= 5 words without 'javascript' "
        "survive; pages need >= 3 surviving lines and no lorem-ipsum/'{' "
        "(operators/text.py:c4_line_filter). Per-row array algebra — "
        "map-only, row count never changes, pure scan→project at any "
        "scale. Emits the cleaned-text md5 for downstream exact dedup.",
    builder=_c4_filter_builder,
    oracle_sql_str=r"""
        WITH p AS (
          SELECT doc_id,
                 regexp_replace(text, '((\S+\s+){9}\S+)\s+',
                                '\1.' || chr(10), 'g') AS page
          FROM documents
        ), l AS (
          SELECT doc_id, page,
                 list_filter(string_split_regex(page, '\n'),
                             x -> trim(x) <> '') AS lines
          FROM p
        ), k AS (
          SELECT doc_id, lines,
                 list_filter(lines, li ->
                     regexp_matches(li, '[.!?"]\s*$')
                     AND len(list_filter(string_split_regex(li, '\s+'),
                                         w -> w <> '')) >= 5
                     AND NOT contains(lower(li), 'javascript')) AS kept,
                 contains(lower(page), 'lorem ipsum') AS has_lorem,
                 contains(lower(page), '{') AS has_brace
          FROM l
        )
        SELECT doc_id, len(lines) AS n_lines, len(kept) AS n_kept,
               has_lorem, has_brace,
               (len(kept) >= 3 AND NOT has_lorem AND NOT has_brace)
                 AS c4_kept,
               -- DuckDB array_to_string([]) is NULL, Spark array_join([])
               -- is '' — coalesce to match the engine's md5('')
               md5(COALESCE(array_to_string(kept, chr(10)), ''))
                 AS clean_md5
        FROM k
        ORDER BY doc_id
    """,
))


def _bpe_encode_builder(spark, sf):
    """Train 8 merges on a deterministic 1-in-10 sample (doc_id % 10 ==
    0 — tokenizers train on subsamples; the full-corpus pass is the
    ENCODE side), then encode the whole corpus with the frozen
    artifact — the build→apply round trip at its real cost shape."""
    from ..operators.bpe import bpe_encode, bpe_train

    docs = load_table(spark, sf, "documents")
    merges, _work = bpe_train(
        docs.filter(F.col("doc_id") % 10 == 0), n_merges=8
    )
    enc = bpe_encode(docs, merges)
    return enc.select(
        "doc_id",
        "n_tokens",
        F.md5(F.array_join("toks", "␟")).alias("toks_md5"),
    ).orderBy("doc_id")


Q(QuerySpec(
    name="pl_bpe_encode",
    doc="Distributed BPE encoding with a frozen merge table: classic "
        "greedy lowest-rank-first merging per document, merge ranks "
        "shipped once via UDF closure, zero shuffle — the tokenizer-"
        "APPLY step that runs at full corpus scale "
        "(operators/bpe.py:bpe_encode). Iterative + xxhash-free but "
        "driven by the trained artifact -> rows-only; exact-state parity "
        "with bpe_train's replay (and with a sequential Python "
        "reference) is pinned in tests/test_text.py.",
    builder=_bpe_encode_builder,
    has_oracle=False,
))


# ---- SemDeDup (cluster-then-dedup semantic tier) --------------------------

def _semdedup(spark, sf, n_clusters=8):
    from ..operators.similarity import semdedup

    return semdedup(
        load_table(spark, sf, "embeddings"), n_clusters=n_clusters
    )


Q(QuerySpec(
    name="pl_semdedup",
    doc="SemDeDup semantic dedup (Abbas et al. 2023): spherical k-means "
        "clustering, then near-dup search only within clusters — pair "
        "space n²/k, one BLAS gram matrix per cluster in applyInPandas "
        "(operators/similarity.py:semdedup). Drops are sound by "
        "construction (exact cosines on true vectors); clustering only "
        "costs recall, measured by pl_semdedup_check. k-means -> "
        "rows-only here.",
    builder=lambda spark, sf: _semdedup(spark, sf)
    .orderBy("vec_id"),
    has_oracle=False,
))


def _semdedup_check(spark, sf):
    """Driver-visible SemDeDup gate: (a) soundness — every dropped vector
    must be droppable under the exact global tier (structurally 0 false
    drops; verified in-engine, not assumed); (b) recall of the dropped
    set vs the exact tier's droppable set >= 0.3 — measured 0.40-0.50
    on the unclustered random testdata at every SF (the worst case for
    cluster-locality; real corpora with genuine duplicate structure sit
    far higher). Empty exact set counts as recall-ok."""
    from ..operators.similarity import cosine_dedup_pairs

    vecs = load_table(spark, sf, "embeddings")
    drops = _semdedup(spark, sf).filter(~F.col("keep")).select(
        F.col("vec_id").alias("d")
    )
    exact = (
        cosine_dedup_pairs(vecs, threshold=0.45)
        .select(F.col("id_b").alias("d"))
        .distinct()
        .withColumn("in_exact", F.lit(1))
    )
    j = drops.join(exact, "d", "left")
    return j.agg(
        F.sum(
            F.when(F.col("in_exact").isNull(), 1).otherwise(0)
        ).alias("n_false"),
        F.count("*").alias("n_drops"),
    ).crossJoin(exact.agg(F.count("*").alias("n_exact"))).select(
        F.coalesce("n_false", F.lit(0)).alias("n_false"),
        (
            (F.col("n_exact") == 0)
            | (F.col("n_drops") * 10 >= F.col("n_exact") * 3)
        ).alias("recall_ok"),
    )


Q(QuerySpec(
    name="pl_semdedup_check",
    doc="Driver-visible SemDeDup quality gate: 0 false drops (soundness "
        "verified in-engine against the exact tier) and drop-recall >= "
        "0.3 vs the exact droppable set; oracle pins (n_false=0, "
        "recall_ok=true). See pl_semdedup.",
    builder=_semdedup_check,
    oracle_sql_str="""
        SELECT CAST(0 AS BIGINT) AS n_false, TRUE AS recall_ok
    """,
))


# ---- DSIR importance-based data selection ---------------------------------

def _dsir_builder(spark, sf):
    """Target = the English-labeled slice (the 'domain we want more
    of'); raw = everything else. Scores every raw doc for
    target-likeness."""
    from ..operators.curation import dsir_score

    docs = load_table(spark, sf, "documents")
    return dsir_score(
        docs.filter(F.col("lang") != "en"),
        docs.filter(F.col("lang") == "en"),
    ).orderBy("doc_id")


Q(QuerySpec(
    name="pl_dsir",
    doc="DSIR-style importance scoring for data selection (Xie et al. "
        "2023): mean per-token log-likelihood ratio between target and "
        "raw unigram LMs, Laplace-smoothed over the shared vocabulary "
        "(operators/curation.py:dsir_score). Per-word log ratios are "
        "rounded once to scaled BIGINTs so every per-doc aggregate is an "
        "exact, order-independent integer sum — Spark's parallel "
        "aggregation and DuckDB's sequential one agree bit-for-bit.",
    builder=_dsir_builder,
    oracle_sql_str=r"""
        WITH rt AS (
          SELECT doc_id, unnest(list_filter(
                 string_split(lower(text), ' '), t -> t <> '')) AS tok
          FROM documents WHERE lang <> 'en'
        ), tt AS (
          SELECT unnest(list_filter(
                 string_split(lower(text), ' '), t -> t <> '')) AS tok
          FROM documents WHERE lang = 'en'
        ), tf AS (
          SELECT tok, COUNT(*) AS c_t FROM tt GROUP BY tok
        ), rf AS (
          SELECT tok, COUNT(*) AS c_r FROM rt GROUP BY tok
        ), vocab AS (
          SELECT COALESCE(tf.tok, rf.tok) AS tok,
                 COALESCE(c_t, 0) AS c_t, COALESCE(c_r, 0) AS c_r
          FROM tf FULL OUTER JOIN rf ON tf.tok = rf.tok
        ), tot AS (
          SELECT CAST(SUM(c_t) AS BIGINT) AS n_t,
                 CAST(SUM(c_r) AS BIGINT) AS n_r,
                 COUNT(*) AS v
          FROM vocab
        ), w AS (
          SELECT tok,
                 CAST(ROUND((ln((c_t + 1.0) / (n_t + v))
                           - ln((c_r + 1.0) / (n_r + v))) * 1000000, 0)
                      AS BIGINT) AS w
          FROM vocab, tot
        ), per_doc AS (
          SELECT rt.doc_id, COUNT(*) AS n_toks,
                 CAST(SUM(w.w) AS BIGINT) AS sum_w
          FROM rt JOIN w ON rt.tok = w.tok
          GROUP BY rt.doc_id
        )
        SELECT doc_id, n_toks, sum_w,
               CAST(sum_w AS DOUBLE) / n_toks / 1000000 AS dsir_score,
               (sum_w > 0) AS kept
        FROM per_doc
        ORDER BY doc_id
    """,
))


Q(QuerySpec(
    name="pl_quality_classifier",
    doc="Model-based quality filter (CCNet/LLaMA recipe shape): distill "
        "the Gopher rule battery into a pyspark.ml logistic regression "
        "over the rule features — distributed L-BFGS training on the "
        "even-doc_id half, held-out accuracy on the odd half "
        "(operators/classifier.py). Measured 0.976-0.994 across SFs; "
        "the constant oracle pins (eval_nonempty, acc_ok at >= 0.8), "
        "leaving margin for gradient-aggregation-order nondeterminism.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.classifier",
        fromlist=["classifier_gate"],
    ).classifier_gate(load_table(spark, sf, "documents")),
    oracle_sql_str="""
        SELECT TRUE AS eval_nonempty, TRUE AS acc_ok
    """,
))


Q(QuerySpec(
    name="pl_script_mix",
    doc="Per-document Unicode script composition + dominant script "
        "(operators/text.py:script_mix) — multilingual-corpus triage "
        "before language-ID (catches mixed-script spam / mojibake / "
        "wrong-script routing). The \\x{...} class syntax is the one "
        "form java.util.regex and RE2 both accept verbatim, so the "
        "IDENTICAL pattern strings run on both engines; ratios in exact "
        "integer arithmetic. Map-only.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.text", fromlist=["script_mix"]
    ).script_mix(load_table(spark, sf, "documents"))
    .select(
        "doc_id", "frac_latin", "frac_cjk", "frac_cyrillic",
        "frac_arabic", "frac_digit", "dominant_script",
    )
    .orderBy("doc_id"),
    oracle_sql_str=r"""
        WITH c AS (
          SELECT doc_id,
                 greatest(length(text) -
                          len(regexp_extract_all(text, '\s')), 1) AS q,
                 len(regexp_extract_all(text,
                     '[A-Za-z\x{00C0}-\x{024F}]')) AS n_latin,
                 len(regexp_extract_all(text,
                     '[\x{4E00}-\x{9FFF}\x{3040}-\x{30FF}]')) AS n_cjk,
                 len(regexp_extract_all(text,
                     '[\x{0400}-\x{04FF}]')) AS n_cyrillic,
                 len(regexp_extract_all(text,
                     '[\x{0600}-\x{06FF}]')) AS n_arabic,
                 len(regexp_extract_all(text, '[0-9]')) AS n_digit
          FROM documents
        )
        SELECT doc_id,
               CAST((n_latin * 20000 + q) // (2 * q) AS DOUBLE) / 10000
                 AS frac_latin,
               CAST((n_cjk * 20000 + q) // (2 * q) AS DOUBLE) / 10000
                 AS frac_cjk,
               CAST((n_cyrillic * 20000 + q) // (2 * q) AS DOUBLE) / 10000
                 AS frac_cyrillic,
               CAST((n_arabic * 20000 + q) // (2 * q) AS DOUBLE) / 10000
                 AS frac_arabic,
               CAST((n_digit * 20000 + q) // (2 * q) AS DOUBLE) / 10000
                 AS frac_digit,
               CASE
                 WHEN n_latin > 0 AND n_latin =
                   greatest(n_latin, n_cjk, n_cyrillic, n_arabic, n_digit)
                   THEN 'latin'
                 WHEN n_cjk > 0 AND n_cjk =
                   greatest(n_latin, n_cjk, n_cyrillic, n_arabic, n_digit)
                   THEN 'cjk'
                 WHEN n_cyrillic > 0 AND n_cyrillic =
                   greatest(n_latin, n_cjk, n_cyrillic, n_arabic, n_digit)
                   THEN 'cyrillic'
                 WHEN n_arabic > 0 AND n_arabic =
                   greatest(n_latin, n_cjk, n_cyrillic, n_arabic, n_digit)
                   THEN 'arabic'
                 WHEN n_digit > 0 AND n_digit =
                   greatest(n_latin, n_cjk, n_cyrillic, n_arabic, n_digit)
                   THEN 'digit'
                 ELSE 'other'
               END AS dominant_script
        FROM c
        ORDER BY doc_id
    """,
))


Q(QuerySpec(
    name="pl_length_stats",
    doc="Per-source sequence-length planning stats: doc count, total "
        "whitespace tokens, mean (integer-exact), and exact interpolated "
        "p50/p90 token counts — what you size packing budgets and "
        "context windows from. Dual-form: Spark PERCENTILE vs DuckDB "
        "quantile_cont (both exact interpolated, the q17 convention).",
    builder=lambda spark, sf: spark.sql("""
        WITH t AS (
          SELECT source,
                 size(filter(split(text, ' '), x -> x != '')) AS toks
          FROM documents
        )
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(toks) AS BIGINT) AS tot_toks,
               CAST((SUM(toks) * 20000 + COUNT(*)) DIV (2 * COUNT(*))
                    AS DOUBLE) / 10000 AS mean_toks,
               ROUND(PERCENTILE(toks, 0.5), 4) AS p50_toks,
               ROUND(PERCENTILE(toks, 0.9), 4) AS p90_toks
        FROM t
        GROUP BY source
        ORDER BY source
    """),
    oracle_sql_str="""
        WITH t AS (
          SELECT source,
                 len(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS toks
          FROM documents
        )
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(toks) AS BIGINT) AS tot_toks,
               CAST((SUM(toks) * 20000 + COUNT(*)) // (2 * COUNT(*))
                    AS DOUBLE) / 10000 AS mean_toks,
               ROUND(quantile_cont(toks, 0.5), 4) AS p50_toks,
               ROUND(quantile_cont(toks, 0.9), 4) AS p90_toks
        FROM t
        GROUP BY source
        ORDER BY source
    """,
))


def _ccnet_builder(spark, sf):
    from ..operators.text import ccnet_buckets

    return ccnet_buckets(load_table(spark, sf, "documents")).orderBy(
        "doc_id"
    )


Q(QuerySpec(
    name="pl_ccnet_buckets",
    doc="CCNet-style perplexity bucketing (Wenzek et al. 2020): "
        "per-language interpolated bigram LM trained on the src0-src4 "
        "reference slice, every doc scored (scaled-BIGINT exact sums, "
        "the dsir_score determinism contract), languages split into "
        "head/middle/tail perplexity terciles "
        "(operators/text.py:ccnet_buckets). LM tables broadcast "
        "(LM corpus bounded); tercile window keyed by language.",
    builder=_ccnet_builder,
    oracle_sql_str=r"""
        WITH base AS (
          SELECT doc_id, lang,
                 source IN ('src0','src1','src2','src3','src4') AS lm,
                 list_filter(string_split(lower(text), ' '),
                             t -> t <> '') AS ts
          FROM documents
        ), b2 AS (
          SELECT * FROM base WHERE len(ts) >= 2
        ), bi AS (
          SELECT doc_id, lang, lm, p[1] AS prev, p[2] AS cur
          FROM (SELECT doc_id, lang, lm,
                       unnest(list_transform(range(1, len(ts)),
                              i -> [ts[i], ts[i+1]])) AS p
                FROM b2)
        ), uni AS (
          SELECT lang, lm, unnest(ts) AS tok FROM b2
        ), lm_uni AS (
          SELECT lang, tok, COUNT(*) AS c_u
          FROM uni WHERE lm GROUP BY lang, tok
        ), lm_tot AS (
          SELECT lang, CAST(SUM(c_u) AS BIGINT) AS n_l,
                 COUNT(*) AS v_l
          FROM lm_uni GROUP BY lang
        ), lm_bi AS (
          SELECT lang, prev, cur, COUNT(*) AS c_b
          FROM bi WHERE lm GROUP BY lang, prev, cur
        ), lm_left AS (
          SELECT lang, prev, CAST(SUM(c_b) AS BIGINT) AS c_left
          FROM lm_bi GROUP BY lang, prev
        ), w AS (
          SELECT bi.doc_id, bi.lang,
                 CAST(ROUND(-ln(
                     0.7 * (COALESCE(c_b, 0) + 1)
                         / (COALESCE(c_left, 0) + COALESCE(v_l, 0) + 1)
                   + 0.3 * (COALESCE(c_u, 0) + 1)
                         / (COALESCE(n_l, 0) + COALESCE(v_l, 0) + 1)
                 ) * 1000000, 0) AS BIGINT) AS w
          FROM bi
          LEFT JOIN lm_bi ON lm_bi.lang = bi.lang
                         AND lm_bi.prev = bi.prev AND lm_bi.cur = bi.cur
          LEFT JOIN lm_left ON lm_left.lang = bi.lang
                           AND lm_left.prev = bi.prev
          LEFT JOIN lm_uni ON lm_uni.lang = bi.lang
                          AND lm_uni.tok = bi.cur
          LEFT JOIN lm_tot ON lm_tot.lang = bi.lang
        ), per_doc AS (
          SELECT doc_id, lang, COUNT(*) AS n_bi,
                 CAST(SUM(w) AS BIGINT) AS sum_w
          FROM w GROUP BY doc_id, lang
        ), tiled AS (
          SELECT doc_id, lang, n_bi, sum_w,
                 CAST(sum_w AS DOUBLE) / n_bi / 1000000 AS nll,
                 NTILE(3) OVER (
                   PARTITION BY lang
                   ORDER BY CAST(sum_w AS DOUBLE) / n_bi / 1000000,
                            doc_id) AS tile
          FROM per_doc
        )
        SELECT doc_id, lang, n_bi, sum_w, nll,
               CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM tiled
        ORDER BY doc_id
    """,
))


Q(QuerySpec(
    name="pl_profile",
    doc="One-pass table profiler over documents: per-column null count, "
        "exact distinct count, typed min/max emitted as truncated "
        "strings (operators/profile.py:profile_table). One scan + one "
        "aggregation (Catalyst Expand for the multi-DISTINCT), unpivot "
        "of the single result row; exact=False flips to HLL at scale.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.profile", fromlist=["profile_table"]
    ).profile_table(load_table(spark, sf, "documents")),
    oracle_sql_str="""
        WITH p AS (
          SELECT 'doc_id' AS col_name, COUNT(*) AS n_rows,
                 COUNT(*) - COUNT(doc_id) AS n_nulls,
                 COUNT(DISTINCT doc_id) AS n_distinct,
                 substr(CAST(MIN(doc_id) AS VARCHAR), 1, 24) AS min_s,
                 substr(CAST(MAX(doc_id) AS VARCHAR), 1, 24) AS max_s
          FROM documents
          UNION ALL
          SELECT 'lang', COUNT(*), COUNT(*) - COUNT(lang),
                 COUNT(DISTINCT lang),
                 substr(CAST(MIN(lang) AS VARCHAR), 1, 24),
                 substr(CAST(MAX(lang) AS VARCHAR), 1, 24)
          FROM documents
          UNION ALL
          SELECT 'n_chars', COUNT(*), COUNT(*) - COUNT(n_chars),
                 COUNT(DISTINCT n_chars),
                 substr(CAST(MIN(n_chars) AS VARCHAR), 1, 24),
                 substr(CAST(MAX(n_chars) AS VARCHAR), 1, 24)
          FROM documents
          UNION ALL
          SELECT 'source', COUNT(*), COUNT(*) - COUNT(source),
                 COUNT(DISTINCT source),
                 substr(CAST(MIN(source) AS VARCHAR), 1, 24),
                 substr(CAST(MAX(source) AS VARCHAR), 1, 24)
          FROM documents
          UNION ALL
          SELECT 'text', COUNT(*), COUNT(*) - COUNT(text),
                 COUNT(DISTINCT text),
                 substr(CAST(MIN(text) AS VARCHAR), 1, 24),
                 substr(CAST(MAX(text) AS VARCHAR), 1, 24)
          FROM documents
        )
        SELECT * FROM p ORDER BY col_name
    """,
))


Q(QuerySpec(
    name="pl_quantile_check",
    doc="Mergeable quantile sketch (percentile_approx / Greenwald-Khanna)"
        " over lineitem l_extendedprice with an in-engine rank-error "
        "gate (operators/profile.py:approx_quantiles_gate) — the "
        "numeric-profile analog of the ANN recall gates. Values are "
        "sketch-specific (GK vs t-digest), the rank-error bound is not; "
        "the constant oracle pins the bound holding.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.profile",
        fromlist=["approx_quantiles_gate"],
    ).approx_quantiles_gate(
        load_table(spark, sf, "lineitem"), "l_extendedprice"
    ),
    oracle_sql_str="""
        SELECT 5 AS n_checked, TRUE AS within_tol
    """,
))


Q(QuerySpec(
    name="pl_soft_dedup",
    doc="Frequency-capped soft dedup: keep ceil(sqrt(cluster_size)) "
        "lowest-id representatives of each near-dup cluster instead of "
        "one — sublinear-copy retention where duplication frequency is "
        "signal (operators/dedup.py:cluster_capped_dedup). CEIL(SQRT()) "
        "is the portable cap (IEEE sqrt is correctly rounded on both "
        "engines). One keyed window over the star-contraction labels.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.dedup",
        fromlist=["cluster_capped_dedup"],
    ).cluster_capped_dedup(
        load_table(spark, sf, "documents"), k=3, threshold=0.5
    ).orderBy("doc_id"),
    oracle_sql_str=_CLUSTER_LABELS_CTE + """
        , sized AS (
          SELECT doc_id, cluster_id,
                 COUNT(*) OVER (PARTITION BY cluster_id)
                   AS cluster_size,
                 ROW_NUMBER() OVER (PARTITION BY cluster_id
                                    ORDER BY doc_id) AS rn
          FROM labels
        )
        SELECT doc_id, cluster_id, cluster_size,
               rn <= CAST(CEIL(SQRT(cluster_size)) AS BIGINT) AS kept
        FROM sized
        ORDER BY doc_id
    """,
))


Q(QuerySpec(
    name="pl_editdist",
    doc="Edit-similarity verification tier over n-gram-Jaccard "
        "candidates (operators/dedup.py:editdist_verify): JVM-side "
        "levenshtein on candidate pairs only (filter-and-verify, never "
        "all-pairs), edit_sim = (max_len - lev) / max_len in exact "
        "integer arithmetic. Oracle: DuckDB levenshtein over the same "
        "candidate CTE (both engines implement classic unit-cost DP).",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.dedup",
        fromlist=["editdist_verify"],
    ).editdist_verify(
        load_table(spark, sf, "documents"),
        k=3, candidate_threshold=0.3, sim_threshold=0.5,
    ).orderBy("id_a", "id_b"),
    oracle_sql_str="""
        WITH sh AS (
          SELECT doc_id AS id, list_distinct(list_transform(
                 range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
                 i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))
               AS shs
          FROM documents
        ), ex AS (SELECT id, unnest(shs) AS shingle FROM sh),
        sizes AS (SELECT id, len(shs) AS n FROM sh),
        inter AS (
          SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_inter
          FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.id < b.id
          GROUP BY a.id, b.id
        ),
        cand AS (
          SELECT id_a, id_b,
                 ROUND(CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter), 4)
                   AS jaccard
          FROM inter
          JOIN sizes sa ON sa.id = inter.id_a
          JOIN sizes sb ON sb.id = inter.id_b
          WHERE ROUND(CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter), 4) >= 0.3
        ),
        verified AS (
          SELECT id_a, id_b, jaccard,
                 levenshtein(ta.text, tb.text) AS lev,
                 greatest(len(ta.text), len(tb.text)) AS mx
          FROM cand
          JOIN documents ta ON ta.doc_id = cand.id_a
          JOIN documents tb ON tb.doc_id = cand.id_b
        )
        SELECT id_a, id_b, jaccard,
               CASE WHEN mx = 0 THEN 1.0
                    ELSE CAST(((mx - lev) * 20000 + mx) // (2 * mx)
                              AS DOUBLE) / 10000 END AS edit_sim
        FROM verified
        WHERE mx = 0 OR (mx - lev) * 10000 >= mx * 5000
        ORDER BY id_a, id_b
    """,
))


Q(QuerySpec(
    name="pl_pack_efficiency",
    doc="Packing-efficiency planner: per candidate context length, doc/"
        "token totals, overflow counts, and sequence counts + padding "
        "waste under concat vs doc-isolated packing "
        "(operators/curation.py:pack_efficiency). One map + one grouped "
        "agg over an exploded lengths column; integer-exact ceil and "
        "fraction arithmetic on both engines.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.curation",
        fromlist=["pack_efficiency"],
    ).pack_efficiency(load_table(spark, sf, "documents")),
    oracle_sql_str="""
        WITH toks AS (
          SELECT len(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS n
          FROM documents
        ),
        ls AS (SELECT unnest([256, 512, 1024, 2048]) AS ctx_len),
        agg AS (
          SELECT ctx_len,
                 COUNT(*) AS n_docs,
                 CAST(SUM(n) AS BIGINT) AS total_tokens,
                 CAST(SUM(CASE WHEN n > ctx_len THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_over,
                 CAST(SUM(greatest(n - ctx_len, 0)) AS BIGINT)
                   AS tokens_over,
                 CAST(SUM((n + ctx_len - 1) // ctx_len) AS BIGINT)
                   AS n_seqs_split
          FROM toks CROSS JOIN ls
          GROUP BY ctx_len
        )
        SELECT ctx_len, n_docs, total_tokens, n_over, tokens_over,
               (total_tokens + ctx_len - 1) // ctx_len AS n_seqs_concat,
               n_seqs_split,
               CAST(((n_seqs_split * ctx_len - total_tokens) * 20000
                     + n_seqs_split * ctx_len)
                    // (2 * n_seqs_split * ctx_len) AS DOUBLE) / 10000
                 AS waste_frac_split
        FROM agg
        ORDER BY ctx_len
    """,
))


Q(QuerySpec(
    name="pl_event_anomaly",
    doc="Per-type daily event-volume anomaly flags (operators/"
        "anomaly.py:daily_count_anomalies): |z| >= k over each type's "
        "daily counts (k=2 here), decided by the denominator-cleared "
        "INTEGER inequality (n*x - S1)^2 * (n-1) >= k^2*n*(n*S2 - S1^2) "
        "— no "
        "stddev/sqrt double whose last ulp could flip a flag between "
        "engines. One shuffle of the raw events; windows run over the "
        "kilobyte-scale (type, day) table.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.anomaly",
        fromlist=["daily_count_anomalies"],
    ).daily_count_anomalies(
        load_table(spark, sf, "events"), k=2
    ).withColumn("day", F.col("day").cast("timestamp")),
    oracle_sql_str="""
        WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS day,
                 COUNT(*) AS n_events
          FROM events GROUP BY event_type, CAST(ts AS DATE)
        ),
        win AS (
          SELECT event_type, day, n_events,
                 COUNT(*) OVER (PARTITION BY event_type) AS n,
                 CAST(SUM(n_events) OVER (PARTITION BY event_type)
                      AS BIGINT) AS s1,
                 CAST(SUM(n_events * n_events)
                      OVER (PARTITION BY event_type) AS BIGINT) AS s2
          FROM daily
        )
        SELECT event_type, CAST(day AS TIMESTAMP) AS day, n_events,
               n AS n_days,
               CAST((s1 * 20000 + n) // (2 * n) AS DOUBLE) / 10000
                 AS mean_events,
               -- HUGEINT (int128) for the decision products: s1*s1
               -- alone passes the BIGINT ceiling at ~1e13 events/key
               (n > 1
                AND (CAST(n AS HUGEINT) * s2
                     - CAST(s1 AS HUGEINT) * s1) > 0
                AND (CAST(n AS HUGEINT) * n_events - s1)
                    * (CAST(n AS HUGEINT) * n_events - s1) * (n - 1)
                    >= 4 * CAST(n AS HUGEINT)
                      * (CAST(n AS HUGEINT) * s2
                         - CAST(s1 AS HUGEINT) * s1)) AS is_anomaly
        FROM win
        ORDER BY event_type, day
    """,
))


Q(QuerySpec(
    name="pl_cross_source_dups",
    doc="Duplication provenance matrix: near-dup pair counts per "
        "ordered source pair, with distinct-doc counts per side "
        "(operators/dedup.py:cross_source_dup_matrix) — the triage view "
        "separating crawler self-duplication from cross-source "
        "mirroring. Matrix agg is |sources|^2-small; pairs from the "
        "exact jaccard tier (swap in LSH pairs at scale).",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.dedup",
        fromlist=["cross_source_dup_matrix"],
    ).cross_source_dup_matrix(
        load_table(spark, sf, "documents"), k=3, threshold=0.5
    ),
    oracle_sql_str="""
        WITH sh AS (
          SELECT doc_id AS id, list_distinct(list_transform(
                 range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
                 i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))
               AS shs
          FROM documents
        ), ex AS (SELECT id, unnest(shs) AS shingle FROM sh),
        sizes AS (SELECT id, len(shs) AS n FROM sh),
        inter AS (
          SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_inter
          FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.id < b.id
          GROUP BY a.id, b.id
        ),
        pairs AS (
          SELECT id_a, id_b
          FROM inter
          JOIN sizes sa ON sa.id = inter.id_a
          JOIN sizes sb ON sb.id = inter.id_b
          WHERE ROUND(CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter), 4) >= 0.5
        ),
        lab AS (
          SELECT least(da.source, db.source) AS src_lo,
                 greatest(da.source, db.source) AS src_hi,
                 CASE WHEN da.source <= db.source THEN p.id_a
                      ELSE p.id_b END AS lo_doc,
                 CASE WHEN da.source <= db.source THEN p.id_b
                      ELSE p.id_a END AS hi_doc
          FROM pairs p
          JOIN documents da ON da.doc_id = p.id_a
          JOIN documents db ON db.doc_id = p.id_b
        )
        SELECT src_lo, src_hi, COUNT(*) AS n_pairs,
               CAST(COUNT(DISTINCT lo_doc) AS BIGINT) AS n_docs_lo,
               CAST(COUNT(DISTINCT hi_doc) AS BIGINT) AS n_docs_hi
        FROM lab
        GROUP BY src_lo, src_hi
        ORDER BY src_lo, src_hi
    """,
))


Q(QuerySpec(
    name="pl_best_rep_dedup",
    doc="Keep-policy dedup: longest-copy representative per near-dup "
        "cluster, ties to lowest id (operators/dedup.py:"
        "cluster_best_rep) — 'prefer the most complete copy'. Integer "
        "length metric => exactly portable argmax. One extra keyed "
        "window over the star-contraction labels.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.dedup",
        fromlist=["cluster_best_rep"],
    ).cluster_best_rep(
        load_table(spark, sf, "documents"), k=3, threshold=0.5
    ),
    oracle_sql_str=_CLUSTER_LABELS_CTE + """
        , lens AS (
          SELECT doc_id, length(text) AS n_chars FROM documents
        ), sized AS (
          SELECT l.doc_id, l.cluster_id,
                 COUNT(*) OVER (PARTITION BY l.cluster_id)
                   AS cluster_size,
                 ln.n_chars,
                 ROW_NUMBER() OVER (PARTITION BY l.cluster_id
                                    ORDER BY ln.n_chars DESC, l.doc_id)
                   AS rn
          FROM labels l JOIN lens ln ON ln.doc_id = l.doc_id
        )
        SELECT doc_id, cluster_id, cluster_size,
               CAST(n_chars AS INT) AS n_chars, rn = 1 AS kept
        FROM sized
        ORDER BY doc_id
    """,
))


Q(QuerySpec(
    name="pl_trigram_search",
    doc="Trigram-indexed literal search (operators/search.py — R. Cox "
        "2012 trigram-index design): posting lists built once, a query "
        "probes only its needle's trigram rows, candidates holding ALL "
        "trigrams are verified with exact contains. Result is exactly "
        "the full-scan LIKE answer — the oracle IS that full scan, so "
        "the hash proves prune-never-loses.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.search",
        fromlist=["trigram_search"],
    ).trigram_search(
        load_table(spark, sf, "documents"), "spark window"
    ),
    oracle_sql_str="""
        SELECT doc_id FROM documents
        WHERE contains(text, 'spark window')
        ORDER BY doc_id
    """,
))


def _trigram_probe_q(spark, sf):
    """Probe-only form: build the bucketed index ONCE per (session,
    sf_dir) via save_trigram_index, then every run — including every
    timed bench pass after warm-up — pays only the bucket-pruned probe.
    This is the amortized deployment shape (r8 verdict #4): a search
    service answers many needles against one corpus snapshot, exactly
    like the reference re-querying one loaded file (csv_tool.py keeps
    the DuckDB relation registered across queries)."""
    import hashlib as _h
    import os as _os
    from urllib.parse import urlparse

    from ..operators.search import (
        ensure_trigram_index,
        trigram_search_indexed,
    )

    docs = load_table(spark, sf, "documents")
    tbl = "trigram_idx_" + _h.md5(sf.encode()).hexdigest()[:10]
    # cross-session layout (r9 verdict #4): the index lives at an
    # explicit warehouse path with its bucket-spec sidecar; a fresh
    # session ATTACHES it (one DDL) instead of rebuilding the postings
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
    idx_path = _os.path.join(
        wh.path if wh.scheme in ("", "file") else "/tmp", f"{tbl}_ext"
    )
    ensure_trigram_index(docs, idx_path, table_name=tbl)
    # the planner disables bucketed reading for filter-only scans
    # unless autoBucketedScan is off; scope the flag to THIS query by
    # executing the probe eagerly under it and restoring afterwards —
    # a session-wide set would leave every later query in the same
    # session (bench sweep, oracle sweep, driver) order-dependent
    flag = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(flag)
    spark.conf.set(flag, "false")
    try:
        # tombstone_free: ensure_trigram_index above builds UNCAPPED
        # (max_trigram_df=None), so no hot rows exist and the probe can
        # take the single-plan path (no hot-info driver round-trip)
        probe = trigram_search_indexed(
            docs, "spark window", table_name=tbl, tombstone_free=True
        )
        # eager: the bucket-pruned scan runs NOW, under the flag; the
        # returned plan is a materialized (small) result set
        return probe.localCheckpoint(eager=True)
    finally:
        spark.conf.set(flag, prev)


Q(QuerySpec(
    name="pl_trigram_probe",
    doc="Amortized probe over the PERSISTED bucketed trigram index "
        "(operators/search.py:save_trigram_index + "
        "trigram_search_indexed): bucketBy(64, trigram) hashes each "
        "posting list to one file, so the needle's IN-list probe reads "
        "only matching buckets (SelectedBucketsCount in the plan, "
        "asserted in tests/test_search.py). Same exact-answer contract "
        "and the same full-scan LIKE oracle as pl_trigram_search — the "
        "hash proves the index path never loses a match; the bench row "
        "measures the probe cost the build-inclusive form amortizes.",
    builder=_trigram_probe_q,
    oracle_sql_str="""
        SELECT doc_id FROM documents
        WHERE contains(text, 'spark window')
        ORDER BY doc_id
    """,
))


Q(QuerySpec(
    name="pl_weighted_sample",
    doc="Quality-weighted deterministic subsampling: keep probability = "
        "quality score, coin flip = first 32 bits of md5(id) compared "
        "in exact integer arithmetic (operators/curation.py:"
        "quality_weighted_sample; FineWeb-style soft quality "
        "thinning). Map-only, reproducible bit-for-bit.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.curation",
        fromlist=["quality_weighted_sample"],
    ).quality_weighted_sample(load_table(spark, sf, "documents")),
    oracle_sql_str=r"""
        WITH f AS (
          SELECT doc_id,
                 len(string_split_regex(text, '\s+')) AS n_words,
                 CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
                   / len(string_split_regex(text, '\s+')) AS mean_wlen,
                 CAST(length(text)
                      - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g'))
                   AS DOUBLE) / length(text) AS punct_ratio,
                 CAST(length(text)
                      - length(regexp_replace(text, '[0-9]', '', 'g'))
                   AS DOUBLE) / length(text) AS digit_ratio,
                 CAST(len(list_intersect(string_split_regex(text, '\s+'),
                      ['the','and','of','to','is'])) AS DOUBLE)
                   / greatest(len(string_split_regex(text, '\s+')), 1)
                   AS stop_ratio
          FROM documents
        ), s AS (
          SELECT doc_id,
                 ROUND(CAST(
                   (CASE WHEN n_words BETWEEN 5 AND 10000 THEN 0.4 ELSE 0.0 END)
                   + (CASE WHEN mean_wlen BETWEEN 2.0 AND 12.0 THEN 0.2 ELSE 0.0 END)
                   + (CASE WHEN punct_ratio <= 0.2 THEN 0.2 ELSE 0.0 END)
                   + (CASE WHEN digit_ratio <= 0.3 THEN 0.1 ELSE 0.0 END)
                   + (CASE WHEN stop_ratio > 0.0 THEN 0.1 ELSE 0.0 END)
                   AS DOUBLE), 4) AS quality_score
          FROM f
        )
        SELECT doc_id, quality_score,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS UBIGINT)::BIGINT * 10
                 < CAST(ROUND(quality_score * 10) AS BIGINT) * 4294967296
                 AS kept
        FROM s
        ORDER BY doc_id
    """,
))


Q(QuerySpec(
    name="pl_hard_negatives",
    doc="Hard-negative mining for contrastive training: top-5 most-"
        "similar DIFFERENT-label vectors per anchor (vec_id<50 anchor "
        "slice, full candidate corpus; operators/similarity.py:"
        "hard_negatives). Blocked-BLAS anchor broadcast, batch-local "
        "top-k, window merge — k*n_batches rows, never n^2. Oracle: "
        "DuckDB brute-force with the identical round-then-rank order.",
    builder=lambda spark, sf: (lambda emb: __import__(
        "adenhq_hive_spark.operators.similarity",
        fromlist=["hard_negatives"],
    ).hard_negatives(
        emb, k=5, anchors=emb.filter("vec_id < 50")
    ))(load_table(spark, sf, "embeddings")).orderBy("anchor_id", "rank"),
    oracle_sql_str="""
        SELECT anchor_id, rank, neg_id, cosine FROM (
          SELECT a.vec_id AS anchor_id, v.vec_id AS neg_id,
                 ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                              CAST(v.embedding AS DOUBLE[])), 4)
                   AS cosine,
                 ROW_NUMBER() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY ROUND(list_cosine_similarity(
                                CAST(a.embedding AS DOUBLE[]),
                                CAST(v.embedding AS DOUBLE[])), 4)
                            DESC, v.vec_id) AS rank
          FROM embeddings a JOIN embeddings v ON v.label <> a.label
          WHERE a.vec_id < 50
        ) t
        WHERE rank <= 5
        ORDER BY anchor_id, rank
    """,
))


Q(QuerySpec(
    name="pl_media_phash",
    doc="Perceptual-hash media duplicate groups (operators/"
        "multimodal.py:phash_groups): mean-threshold aHash over the "
        "decoded feature (real byte-histogram tier in-container; the "
        "identical kernel yields classic 64-bit aHash with pixel "
        "codecs), grouped by (kind, phash) with min-id keeper — the "
        "linear formulation for low-entropy hash spaces. Hash depends "
        "on the Python decode kernel => rows-only; banding recall and "
        "kind separation are pinned in tests/test_multimodal.py.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.multimodal",
        fromlist=["phash_groups", "synthetic_media_table"],
    ).phash_groups(
        __import__(
            "adenhq_hive_spark.operators.multimodal",
            fromlist=["synthetic_media_table"],
        ).synthetic_media_table(load_table(spark, sf, "documents"))
    ),
    has_oracle=False,
))


Q(QuerySpec(
    name="pl_phash_portable",
    doc="Engine-portable twin of pl_media_phash's mean-threshold "
        "bit-packing algebra (operators/multimodal.py:phash_portable), "
        "the pattern pl_minhash_portable/pl_simhash_portable use for "
        "the sketch tiers: per-vector 64-bit aHash over the embeddings "
        "table with every float knife-edge removed — components "
        "quantize to FLOOR(x*10000) BIGINT, the mean threshold is the "
        "denominator-cleared integer inequality q*n > sum(q), and the "
        "hash ships as two 32-bit halves (DuckDB raises on 1::BIGINT "
        "<< 63). Green hash = the packing algebra the media tier uses "
        "is value-identical across engines; map-only, no shuffle.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.multimodal",
        fromlist=["phash_portable"],
    ).phash_portable(
        load_table(spark, sf, "embeddings")
    ).orderBy("id"),
    oracle_sql_str="""
        WITH q AS (
          SELECT vec_id AS id,
                 list_transform(embedding[1:64],
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * 10000) AS BIGINT))
                   AS qs
          FROM embeddings
        ),
        s AS (
          SELECT id, qs, len(qs) AS n,
                 list_aggregate(qs, 'sum') AS total
          FROM q
        ),
        bits AS (
          SELECT id, i - 1 AS bit,
                 CASE WHEN qs[i] * n > total THEN 1 ELSE 0 END AS b
          FROM s, unnest(range(1, n + 1)) AS r(i)
        )
        SELECT id,
               CAST(SUM(CASE WHEN bit >= 32
                    THEN b * (1::BIGINT << (bit - 32)) ELSE 0 END)
                    AS BIGINT) AS phash_hi,
               CAST(SUM(CASE WHEN bit < 32
                    THEN b * (1::BIGINT << bit) ELSE 0 END)
                    AS BIGINT) AS phash_lo,
               CAST(SUM(b) AS INT) AS nbits
        FROM bits
        GROUP BY id
        ORDER BY id
    """,
))


Q(QuerySpec(
    name="pl_skew_report",
    doc="Join-key skew diagnosis: top-20 heaviest orders.o_custkey keys "
        "with row counts, integer-exact percent share, and the salt "
        "factor salted_join would need (operators/skew.py:skew_report) "
        "— the measurement before choosing AQE skew handling vs "
        "salting vs broadcast. Grouped count + top-k, never a full "
        "sort.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.skew",
        fromlist=["skew_report"],
    ).skew_report(
        load_table(spark, sf, "orders"), "o_custkey",
        top=20, target_rows_per_task=10,
    ),
    oracle_sql_str="""
        WITH t AS (SELECT COUNT(*) AS total FROM orders)
        SELECT CAST(o_custkey AS VARCHAR) AS key,
               COUNT(*) AS n_rows,
               CAST((COUNT(*) * 20000 + t.total) // (2 * t.total)
                    AS DOUBLE) / 100 AS pct_of_total,
               CAST((COUNT(*) + 9) // 10 AS INT) AS salt_factor
        FROM orders, t
        GROUP BY o_custkey, t.total
        ORDER BY n_rows DESC, key
        LIMIT 20
    """,
))


Q(QuerySpec(
    name="pl_curriculum",
    doc="Length-curriculum addressing: NTILE token-count stages (short "
        "-> long) with a deterministic md5 within-stage order "
        "(operators/curation.py:curriculum_order) — the sampler "
        "address for shortest-first curriculum schedules. Both windows "
        "engine-portable; scale path = approx quantile boundaries + "
        "map-only assignment (documented).",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.curation",
        fromlist=["curriculum_order"],
    ).curriculum_order(load_table(spark, sf, "documents")),
    oracle_sql_str="""
        WITH toks AS (
          SELECT doc_id,
                 len(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS n_tokens
          FROM documents
        ),
        staged AS (
          SELECT doc_id, n_tokens,
                 NTILE(4) OVER (ORDER BY n_tokens, doc_id) AS stage
          FROM toks
        )
        SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens, stage,
               CAST(ROW_NUMBER() OVER (
                 PARTITION BY stage
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS INT) AS pos
        FROM staged
        ORDER BY stage, pos
    """,
))


Q(QuerySpec(
    name="pl_hot_shingles",
    doc="Boilerplate census: top-25 shingles by document frequency "
        "(operators/dedup.py:hot_shingles) — the measurement that sizes "
        "the dedup stack's max_shingle_df hot-key cap (a shingle in d "
        "docs => O(d^2) candidate rows) and surfaces template phrases. "
        "Explode + grouped count + TakeOrderedAndProject.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.dedup",
        fromlist=["hot_shingles"],
    ).hot_shingles(load_table(spark, sf, "documents")),
    oracle_sql_str="""
        WITH t AS (SELECT COUNT(*) AS n_docs FROM documents),
        sh AS (
          SELECT doc_id, unnest(list_distinct(list_transform(
                 range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
                 i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))))
               AS shingle
          FROM documents
        )
        SELECT shingle, COUNT(*) AS df,
               CAST((COUNT(*) * 100 * 20000 + t.n_docs)
                    // (2 * t.n_docs) AS DOUBLE) / 10000 AS pct_docs
        FROM sh, t
        GROUP BY shingle, t.n_docs
        ORDER BY df DESC, shingle
        LIMIT 25
    """,
))


Q(QuerySpec(
    name="pl_source_scorecard",
    doc="Per-source quality scorecard (operators/curation.py:"
        "source_scorecard): doc/token counts, integer-exact mean "
        "quality score, Gopher pass rate (min_stop_hits=1, synthetic "
        "vocab), exact-dup rate — the one table mixture weights are "
        "set from. Map-only features + one hash window + a "
        "|sources|-small agg.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.curation",
        fromlist=["source_scorecard"],
    ).source_scorecard(load_table(spark, sf, "documents")),
    oracle_sql_str=r"""
        WITH q AS (
          SELECT doc_id, source,
                 len(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS n_toks,
                 CAST(ROUND((
                   (CASE WHEN len(string_split_regex(text, '\s+'))
                              BETWEEN 5 AND 10000 THEN 0.4 ELSE 0.0 END)
                   + (CASE WHEN CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
                            / len(string_split_regex(text, '\s+'))
                            BETWEEN 2.0 AND 12.0 THEN 0.2 ELSE 0.0 END)
                   + (CASE WHEN CAST(length(text)
                           - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g'))
                           AS DOUBLE) / length(text) <= 0.2
                      THEN 0.2 ELSE 0.0 END)
                   + (CASE WHEN CAST(length(text)
                           - length(regexp_replace(text, '[0-9]', '', 'g'))
                           AS DOUBLE) / length(text) <= 0.3
                      THEN 0.1 ELSE 0.0 END)
                   + (CASE WHEN len(list_intersect(
                           string_split_regex(text, '\s+'),
                           ['the','and','of','to','is'])) > 0
                      THEN 0.1 ELSE 0.0 END)) * 10) AS BIGINT) AS qs10
          FROM documents
        ),
        gm AS (
          SELECT doc_id,
                 len(list_filter(string_split_regex(text, '\s+'),
                     x -> x <> '')) AS n_words,
                 greatest(len(list_filter(string_split_regex(text, '\n'),
                     x -> x <> '')), 1) AS n_lines,
                 length(regexp_replace(text, '\s+', '', 'g')) AS word_chars,
                 len(regexp_extract_all(text, '#'))
                   + len(regexp_extract_all(text, '\.\.\.')) AS symbol_hits,
                 len(list_filter(list_filter(string_split_regex(text, '\n'),
                     x -> x <> ''),
                     l -> regexp_matches(l, '^\s*[-*•]'))) AS bullet_lines,
                 len(list_filter(list_filter(string_split_regex(text, '\n'),
                     x -> x <> ''),
                     l -> regexp_matches(l, '(\.\.\.|…)\s*$')))
                   AS ellipsis_lines,
                 len(list_filter(list_filter(string_split_regex(text, '\s+'),
                     x -> x <> ''),
                     w -> regexp_matches(w, '[A-Za-z]'))) AS alpha_words,
                 len(list_intersect(
                     list_transform(list_filter(
                         string_split_regex(text, '\s+'), x -> x <> ''),
                         w -> lower(w)),
                     ['the','be','to','of','and','that','have','with']))
                   AS stop_hits,
                 greatest(len(list_filter(string_split_regex(text, '\s+'),
                     x -> x <> '')), 1) AS qd
          FROM documents
        ),
        g AS (
          SELECT doc_id,
                 (n_words >= 50 AND n_words <= 100000
                  AND word_chars >= 3 * qd AND word_chars <= 10 * qd
                  AND symbol_hits * 10 < qd
                  AND bullet_lines * 10 < 9 * n_lines
                  AND ellipsis_lines * 10 < 3 * n_lines
                  AND alpha_words * 10 >= 8 * qd
                  AND stop_hits >= 1) AS gopher_ok
          FROM gm
        ),
        d AS (
          SELECT doc_id,
                 ROW_NUMBER() OVER (PARTITION BY md5(text)
                                    ORDER BY doc_id) > 1 AS is_dup
          FROM documents
        ),
        agg AS (
          SELECT q.source, COUNT(*) AS n_docs,
                 CAST(SUM(q.n_toks) AS BIGINT) AS n_tokens,
                 CAST(SUM(q.qs10) AS BIGINT) AS sq,
                 CAST(SUM(CASE WHEN g.gopher_ok THEN 1 ELSE 0 END)
                      AS BIGINT) AS sg,
                 CAST(SUM(CASE WHEN d.is_dup THEN 1 ELSE 0 END)
                      AS BIGINT) AS sd
          FROM q JOIN g USING (doc_id) JOIN d USING (doc_id)
          GROUP BY q.source
        )
        SELECT source, n_docs, n_tokens,
               CAST((sq * 20000 + n_docs * 10) // (2 * n_docs * 10)
                    AS DOUBLE) / 10000 AS mean_quality,
               CAST((sg * 20000 + n_docs) // (2 * n_docs) AS DOUBLE)
                 / 10000 AS gopher_pass_rate,
               CAST((sd * 20000 + n_docs) // (2 * n_docs) AS DOUBLE)
                 / 10000 AS dup_rate
        FROM agg
        ORDER BY source
    """,
))


Q(QuerySpec(
    name="pl_bm25",
    doc="BM25 ranked retrieval: top-10 documents for a bag-of-terms "
        "query (operators/search.py:bm25_search — Robertson-Sparck "
        "Jones with +1-smoothed idf, k1=1.2, b=0.75). Query-term "
        "postings filtered BEFORE aggregation (query-sized shuffle), "
        "df/corpus stats on broadcast relations, TakeOrderedAndProject "
        "top-k. Oracle: same formulas in DuckDB (ln/ROUND double "
        "contract proven by pl_tfidf).",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.search",
        fromlist=["bm25_search"],
    ).bm25_search(
        load_table(spark, sf, "documents"),
        ["spark", "window", "merge"], k=10,
    ),
    oracle_sql_str="""
        WITH lens AS (
          SELECT doc_id AS id,
                 len(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS dl
          FROM documents
        ),
        stats AS (
          SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM lens
        ),
        hits AS (
          SELECT doc_id AS id, term, COUNT(*) AS tf
          FROM (
            SELECT doc_id, unnest(list_filter(
                   string_split(lower(text), ' '), x -> x <> '')) AS term
            FROM documents
          )
          WHERE term IN ('merge', 'spark', 'window')
          GROUP BY doc_id, term
        ),
        dfreq AS (SELECT term, COUNT(*) AS df FROM hits GROUP BY term),
        scored AS (
          SELECT h.id,
                 SUM(
                   ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
                   * (h.tf * 2.2)
                   / (h.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl))
                 ) AS raw
          FROM hits h
          JOIN dfreq d USING (term)
          JOIN lens l ON l.id = h.id
          CROSS JOIN stats s
          GROUP BY h.id
        )
        SELECT id AS doc_id,
               CAST(ROW_NUMBER() OVER (ORDER BY ROUND(raw, 4) DESC, id)
                    AS INT) AS rank,
               ROUND(raw, 4) AS score
        FROM scored
        ORDER BY ROUND(raw, 4) DESC, id
        LIMIT 10
    """,
))


def _contract_builder(spark, sf):
    from ..operators.contract import (
        accepted_range,
        accepted_values,
        not_null,
        refers_to,
        unique,
        validate_contract,
    )

    docs = load_table(spark, sf, "documents")
    orders = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    rules = [
        not_null("doc_id"),
        unique("doc_id"),
        accepted_values("lang", ["en", "de", "fr", "es", "zh"]),
        accepted_range("n_chars", 0, 100000),
    ]
    part1 = validate_contract(docs, rules)
    part2 = validate_contract(
        li, [refers_to("l_orderkey", orders, "o_orderkey")]
    )
    return part1.unionByName(part2)


Q(QuerySpec(
    name="pl_contract",
    doc="Data-contract validation (operators/contract.py): not_null/"
        "unique/accepted_values/accepted_range over documents in ONE "
        "shared-scan aggregation + a referential check lineitem->orders "
        "(distinct-key anti join). One row per rule with violation "
        "count — the dbt-tests/GE-style ingest gate. Oracle recomputes "
        "each count in SQL.",
    builder=_contract_builder,
    oracle_sql_str="""
        SELECT 'not_null(doc_id)' AS rule, 'doc_id' AS column,
               CAST((SELECT COUNT(*) FROM documents WHERE doc_id IS NULL)
                    AS BIGINT) AS n_violations,
               (SELECT COUNT(*) FROM documents WHERE doc_id IS NULL) = 0
                 AS ok
        UNION ALL
        SELECT 'unique(doc_id)', 'doc_id',
               CAST((SELECT COUNT(doc_id) - COUNT(DISTINCT doc_id)
                     FROM documents) AS BIGINT),
               (SELECT COUNT(doc_id) - COUNT(DISTINCT doc_id)
                FROM documents) = 0
        UNION ALL
        SELECT 'accepted_values(lang)', 'lang',
               CAST((SELECT COUNT(*) FROM documents
                     WHERE lang IS NOT NULL
                       AND lang NOT IN ('en','de','fr','es','zh'))
                    AS BIGINT),
               (SELECT COUNT(*) FROM documents
                WHERE lang IS NOT NULL
                  AND lang NOT IN ('en','de','fr','es','zh')) = 0
        UNION ALL
        SELECT 'accepted_range(n_chars)', 'n_chars',
               CAST((SELECT COUNT(*) FROM documents
                     WHERE n_chars < 0 OR n_chars > 100000) AS BIGINT),
               (SELECT COUNT(*) FROM documents
                WHERE n_chars < 0 OR n_chars > 100000) = 0
        UNION ALL
        SELECT 'refers_to(l_orderkey)', 'l_orderkey',
               CAST((SELECT COUNT(*) FROM (
                 SELECT DISTINCT l_orderkey FROM lineitem
                 WHERE l_orderkey IS NOT NULL
                   AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)
               )) AS BIGINT),
               (SELECT COUNT(*) FROM (
                 SELECT DISTINCT l_orderkey FROM lineitem
                 WHERE l_orderkey IS NOT NULL
                   AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)
               )) = 0
    """,
))


# ---- r5 additions: indexed-incremental hash twin + chat formatting --------


def _dedup_incr_indexed_builder(spark, sf):
    """Same semantics as pl_dedup_incremental, but exercised through the
    PREBUILT index path (corpus_postings + corpus_hashes injected) — the
    green hash proves the never-re-shingle path is value-identical to
    the from-scratch tier."""
    from ..operators.dedup import build_shingle_postings, dedup_incremental

    docs = load_table(spark, sf, "documents")
    corpus = docs.filter(F.col("doc_id") < 250)
    newb = docs.filter(F.col("doc_id") >= 250)
    return (
        dedup_incremental(
            newb,
            corpus,
            k=3,
            threshold=0.5,
            corpus_postings=build_shingle_postings(corpus),
            corpus_hashes=corpus.select(F.md5("text").alias("_h")).distinct(),
        )
        .select("doc_id")
        .orderBy("doc_id")
    )


from . import _REGISTRY as _REG  # noqa: E402 (needs prior registrations)

Q(QuerySpec(
    name="pl_dedup_incr_indexed",
    doc="dedup_incremental via the persisted-index path: prebuilt "
        "(shingle, cid, n_b) postings + distinct corpus hashes injected "
        "(operators/dedup.py:build_shingle_postings), so the batch never "
        "re-reads corpus text. Shares pl_dedup_incremental's oracle — "
        "the hash row pins path equivalence.",
    builder=_dedup_incr_indexed_builder,
    oracle_sql_str=_REG["pl_dedup_incremental"].oracle_sql_str,
))

Q(QuerySpec(
    name="pl_chat_format",
    doc="Chat-SFT transcript rendering: per-conversation role-tagged "
        "transcript (<|role|>content lines in (ts, id) order), emitted "
        "as (conv, n_turns, n_chars, md5 fingerprint) "
        "(operators/conversation.py:render_chat_transcripts) — the "
        "deterministic template stage between raw event logs and "
        "sequence packing.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.conversation",
        fromlist=["render_chat_transcripts"],
    ).render_chat_transcripts(load_table(spark, sf, "events"))
    .orderBy("user_id")
    .limit(500),
    oracle_sql_str="""
        WITH lines AS (
          SELECT user_id, ts, event_id,
                 '<|' || CASE event_type
                           WHEN 'signup' THEN 'system'
                           WHEN 'purchase' THEN 'assistant'
                           WHEN 'error' THEN 'tool'
                           ELSE 'user' END || '|>' || props AS line
          FROM events
        ), rendered AS (
          SELECT user_id, COUNT(*) AS n_turns,
                 string_agg(line, chr(10) ORDER BY ts, event_id) AS r
          FROM lines
          GROUP BY user_id
        )
        SELECT user_id, n_turns,
               CAST(length(r) AS BIGINT) AS n_chars,
               md5(r) AS fingerprint
        FROM rendered
        ORDER BY user_id NULLS LAST
        LIMIT 500
    """,
))

Q(QuerySpec(
    name="pl_temperature_mix",
    doc="Temperature-scaled mixture weights (T=2): sampling weight per "
        "source ∝ sqrt(token share) — the exponent-smoothed multilingual "
        "/ multi-source sampling recipe "
        "(operators/curation.py:temperature_mixture). Portable: "
        "FLOOR(SQRT(bigint)) is identical across engines (IEEE "
        "correctly-rounded sqrt) and all fractions are exact-integer "
        "frac4 over (sqrt_tokens, totals).",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.curation",
        fromlist=["temperature_mixture"],
    ).temperature_mixture(load_table(spark, sf, "documents")),
    oracle_sql_str="""
        WITH per AS (
          SELECT source,
                 CAST(SUM(len(list_filter(string_split(text, ' '),
                                          x -> x <> ''))) AS BIGINT)
                   AS n_tokens
          FROM documents
          GROUP BY source
        ), sq AS (
          SELECT source, n_tokens,
                 CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT)
                   AS sq_t,
                 CAST(SUM(n_tokens) OVER () AS BIGINT) AS tot,
                 CAST(SUM(CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE)))
                               AS BIGINT)) OVER () AS BIGINT) AS sqtot
          FROM per
        )
        SELECT source, n_tokens,
               ((n_tokens * 20000 + tot) - (n_tokens * 20000 + tot)
                  % (2 * tot)) / (2 * tot) / 10000 AS raw_share,
               ((sq_t * 20000 + sqtot) - (sq_t * 20000 + sqtot)
                  % (2 * sqtot)) / (2 * sqtot) / 10000 AS weight
        FROM sq
        ORDER BY source NULLS LAST
    """,
))

Q(QuerySpec(
    name="pl_pref_pairs",
    doc="Preference-pair construction for reward-model/DPO training: "
        "per candidate group (user's scored purchase events stand in "
        "for a scored response pool), chosen = best score, rejected = "
        "worst, deterministic (score, id) struct tiebreak, raw-double "
        "margin (operators/curation.py:preference_pairs).",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.curation",
        fromlist=["preference_pairs"],
    ).preference_pairs(
        load_table(spark, sf, "events").filter(
            F.col("event_type") == "purchase"
        )
    ),
    oracle_sql_str="""
        WITH p AS (
          SELECT user_id, event_id, value
          FROM events
          WHERE event_type = 'purchase' AND value IS NOT NULL
        ), ranked AS (
          SELECT user_id, event_id, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY value DESC, event_id DESC)
                   AS rn_top,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY value ASC, event_id ASC)
                   AS rn_bot,
                 COUNT(*) OVER (PARTITION BY user_id) AS n
          FROM p
        )
        SELECT t.user_id,
               CAST(t.n AS BIGINT) AS n_candidates,
               t.event_id AS chosen_id,
               t.value AS chosen_score,
               b.event_id AS rejected_id,
               b.value AS rejected_score,
               t.value - b.value AS margin
        FROM (SELECT * FROM ranked WHERE rn_top = 1 AND n >= 2) t
        JOIN (SELECT * FROM ranked WHERE rn_bot = 1) b USING (user_id)
        ORDER BY user_id NULLS LAST
    """,
))

Q(QuerySpec(
    name="pl_length_buckets",
    doc="Power-of-two sequence-length histogram per source — the "
        "length-bucketed-loader planning table (docs in bucket k pad "
        "to 2^k) (operators/curation.py:length_buckets). Portable "
        "bucketing via binary-string length, no log2.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.curation",
        fromlist=["length_buckets"],
    ).length_buckets(load_table(spark, sf, "documents")),
    oracle_sql_str="""
        WITH per AS (
          SELECT source,
                 CAST(len(list_filter(string_split(text, ' '),
                                      x -> x <> '')) AS BIGINT) AS t
          FROM documents
        ), b AS (
          SELECT source, t,
                 CASE WHEN t = 0 THEN 0
                      ELSE CAST(length(format('{:b}', t)) AS INT)
                 END AS bucket
          FROM per
        )
        SELECT source, bucket,
               CAST(CASE WHEN bucket = 0 THEN 0
                         ELSE 1 << (bucket - 1) END AS BIGINT) AS lo_tokens,
               CAST((1 << bucket) - 1 AS BIGINT) AS hi_tokens,
               COUNT(*) AS n_docs,
               CAST(SUM(t) AS BIGINT) AS n_tokens
        FROM b
        GROUP BY source, bucket
        ORDER BY source NULLS LAST, bucket NULLS LAST
    """,
))


# ---- round-5 second window: cleaning / governance / PQ tiers --------------

Q(QuerySpec(
    name="pl_blocklist",
    doc="C4-style blocklist page filter (operators/text.py:"
        "blocklist_filter): word-boundary alternation regex counted "
        "JVM-side (regexp_count — map-only, zero shuffle at any "
        "scale), hits + pass flag per doc. Oracle: RE2 "
        "regexp_extract_all length on the identical pattern.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.text", fromlist=["blocklist_filter"]
    ).blocklist_filter(load_table(spark, sf, "documents"), ["drop", "slow"])
    .select("doc_id", "bl_hits", "bl_pass")
    .orderBy("doc_id"),
    oracle_sql_str=r"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(lower(text),
                    '\b(?:drop|slow)\b')) AS INT) AS bl_hits,
               len(regexp_extract_all(lower(text),
                    '\b(?:drop|slow)\b')) <= 0 AS bl_pass
        FROM documents
        ORDER BY doc_id
    """,
))


Q(QuerySpec(
    name="pl_zipf_coverage",
    doc="Vocabulary head-coverage (operators/text.py:zipf_coverage): "
        "token share covered by the top-K types, K in (10,100,1000) — "
        "the Zipf summary that sizes tokenizer vocabularies. Scale "
        "shape: agg + TakeOrderedAndProject top-K (no global window "
        "over the full vocabulary) + broadcast threshold join; share "
        "is the exact frac4 integer fraction.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.text", fromlist=["zipf_coverage"]
    ).zipf_coverage(load_table(spark, sf, "documents")),
    oracle_sql_str="""
        WITH ex AS (
          SELECT unnest(list_filter(string_split(lower(text), ' '),
                        t -> t <> '')) AS tok
          FROM documents
        ),
        freq AS (SELECT tok, COUNT(*) AS c FROM ex GROUP BY tok),
        ranked AS (
          SELECT tok, c,
                 row_number() OVER (ORDER BY c DESC, tok) AS rank
          FROM freq
        ),
        tot AS (SELECT SUM(c) AS total_tokens FROM freq),
        ks AS (SELECT unnest([10, 100, 1000]) AS k)
        SELECT k, COUNT(*) AS n_types_used,
               CAST(SUM(c) AS BIGINT) AS covered_tokens,
               CAST((CAST(SUM(c) AS BIGINT) * 20000 + t.total_tokens)
                    // (2 * t.total_tokens) AS DOUBLE) / 10000 AS share
        FROM ranked JOIN ks ON rank <= k CROSS JOIN tot t
        GROUP BY k, t.total_tokens
        ORDER BY k
    """,
))


Q(QuerySpec(
    name="pl_source_keywords",
    doc="Per-source distinctive vocabulary by corpus-relative log-lift "
        "(operators/text.py:source_keywords): one explode feeds both "
        "aggregation levels, corpus totals broadcast, per-token corpus "
        "counts joined on the token key (the vocabulary is not "
        "broadcastable at 100 TB), top-5 per source via a window "
        "partitioned BY SOURCE. ln + ROUND(4) portability device "
        "(established by pl_unigram_logprob).",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.text", fromlist=["source_keywords"]
    ).source_keywords(load_table(spark, sf, "documents"),
                      top_k=5, min_count=5)
    .orderBy("source", "rank"),
    oracle_sql_str="""
        WITH ex AS (
          SELECT source AS grp,
                 unnest(list_filter(string_split(lower(text), ' '),
                        t -> t <> '')) AS tok
          FROM documents
        ),
        tf_s AS (SELECT grp, tok, COUNT(*) AS c_s FROM ex GROUP BY grp, tok),
        tf AS (SELECT tok, CAST(SUM(c_s) AS BIGINT) AS c FROM tf_s GROUP BY tok),
        ns AS (SELECT grp, CAST(SUM(c_s) AS BIGINT) AS n_s FROM tf_s GROUP BY grp),
        tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM tf),
        scored AS (
          SELECT s.grp, s.tok, s.c_s,
                 ROUND(ln((CAST(s.c_s AS DOUBLE) * t.n)
                          / (CAST(ns.n_s AS DOUBLE) * f.c)), 4) AS lift
          FROM tf_s s
          JOIN tf f USING (tok) JOIN ns USING (grp) CROSS JOIN tot t
          WHERE s.c_s >= 5
        ),
        rk AS (
          SELECT grp, tok, c_s, lift,
                 row_number() OVER (PARTITION BY grp
                                    ORDER BY lift DESC, tok) AS rank
          FROM scored
        )
        SELECT grp AS source, CAST(rank AS INT) AS rank, tok, c_s, lift
        FROM rk WHERE rank <= 5
        ORDER BY source, rank
    """,
))


Q(QuerySpec(
    name="pl_containment",
    doc="Asymmetric shingle-containment pairs (Broder 1997 containment "
        "C(A in B) = |A∩B|/|A|; operators/dedup.py:containment_pairs) — "
        "catches a short doc quoted whole inside a long one, where "
        "jaccard ~ |A|/|B| stays under every symmetric threshold. Same "
        "inverted-index single-shuffle shape as pl_ngram_jaccard; both "
        "directions derived from ONE intersection table. frac4-exact "
        "values.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.dedup", fromlist=["containment_pairs"]
    ).containment_pairs(load_table(spark, sf, "documents"),
                        k=3, threshold=0.9, min_shingles=5)
    .orderBy("id_sub", "id_sup"),
    oracle_sql_str="""
        WITH sh AS (
          SELECT doc_id AS id, list_distinct(list_transform(
                 range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
                 i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))
               AS shs
          FROM documents
        ),
        sizes AS (SELECT id, len(shs) AS n FROM sh WHERE len(shs) >= 5),
        ex AS (SELECT id, unnest(shs) AS shingle FROM sh),
        inter AS (
          SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_inter
          FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.id <> b.id
          GROUP BY a.id, b.id
        )
        SELECT i.id_a AS id_sub, i.id_b AS id_sup,
               CAST((i.n_inter * 20000 + sa.n)
                    // (2 * sa.n) AS DOUBLE) / 10000 AS containment
        FROM inter i
        JOIN sizes sa ON sa.id = i.id_a
        JOIN sizes sb ON sb.id = i.id_b
        WHERE (i.n_inter * 20000 + sa.n) // (2 * sa.n) >= 9000
        ORDER BY id_sub, id_sup
    """,
))


Q(QuerySpec(
    name="pl_pq_topk",
    doc="Approximate cosine top-5 via product quantization + exact "
        "refine (operators/similarity.py:pq_cosine_topk — Jégou 2011 "
        "ADC; 16 subvectors x 16 centroids = 64-bit codes, 32x vector "
        "compression, refine=8 exact re-rank of the ADC shortlist). "
        "Registered surface is the per-query containment witness "
        "(every pick inside exact top-100 — worst measured rank 28) "
        "so the driver row carries a full hash instead of no_oracle; "
        "recall additionally gated via pl_pq_recall.",
    builder=lambda spark, sf: _containment_witness(
        __import__(
            "adenhq_hive_spark.operators.similarity",
            fromlist=["pq_cosine_topk"],
        ).pq_cosine_topk(*_queries_vecs(spark, sf), k=5, m=16, refine=8),
        *_queries_vecs(spark, sf),
    ),
    oracle_sql_str="""
        SELECT vec_id AS query_id, CAST(5 AS BIGINT) AS n_k,
               TRUE AS contained
        FROM embeddings WHERE vec_id < 5 ORDER BY vec_id
    """,
))


Q(QuerySpec(
    name="pl_pq_recall",
    doc="Driver-visible PQ quality gate: recall@5 of pl_pq_topk's "
        "configuration (m=16, 16 centroids, refine=8) vs the exact "
        "tier, in-engine; oracle pins (n_exact=25, recall_ok=true) at "
        ">= 0.6 (measured 0.84 at sf0.1, 0.80 at sf0.01; refine=4 "
        "dips to 0.56 at sf0.1 and m=8 unrefined to 0.28 — the exact "
        "re-rank of the 8k-deep ADC shortlist is what buys the "
        "margin).",
    builder=lambda spark, sf: _recall_vs_exact(
        __import__(
            "adenhq_hive_spark.operators.similarity",
            fromlist=["pq_cosine_topk"],
        ).pq_cosine_topk(*_queries_vecs(spark, sf), k=5, m=16, refine=8),
        cosine_topk(*_queries_vecs(spark, sf), k=5),
        threshold=0.6,
    ),
    oracle_sql_str="""
        SELECT CAST(25 AS BIGINT) AS n_exact, TRUE AS recall_ok
    """,
))


Q(QuerySpec(
    name="pl_hybrid_search",
    doc="Hybrid lexical+semantic retrieval via reciprocal-rank fusion "
        "(operators/search.py:hybrid_search — Cormack 2009 RRF, "
        "k_rrf=60, the Elasticsearch/Vespa hybrid-mode recipe): BM25 "
        "top-20 and exact-cosine top-20 fused on rank positions; each "
        "leg keeps its own optimal plan (query-sized shuffle / "
        "broadcast-query BLAS) and fusion joins two <= 20-row "
        "relations. Oracle composes the proven pl_bm25 + "
        "pl_cosine_topk formulations.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.search", fromlist=["hybrid_search"]
    ).hybrid_search(
        load_table(spark, sf, "documents"),
        load_table(spark, sf, "embeddings"),
        ["spark", "window", "merge"],
        query_vec_id=0, k=10, pool=20,
    ),
    oracle_sql_str="""
        WITH lens AS (
          SELECT doc_id AS id,
                 len(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS dl
          FROM documents
        ),
        stats AS (
          SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM lens
        ),
        hits AS (
          SELECT doc_id AS id, term, COUNT(*) AS tf
          FROM (
            SELECT doc_id, unnest(list_filter(
                   string_split(lower(text), ' '), x -> x <> '')) AS term
            FROM documents
          )
          WHERE term IN ('merge', 'spark', 'window')
          GROUP BY doc_id, term
        ),
        dfreq AS (SELECT term, COUNT(*) AS df FROM hits GROUP BY term),
        bscored AS (
          SELECT h.id,
                 SUM(
                   ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
                   * (h.tf * 2.2)
                   / (h.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl))
                 ) AS raw
          FROM hits h
          JOIN dfreq d USING (term)
          JOIN lens l ON l.id = h.id
          CROSS JOIN stats s
          GROUP BY h.id
        ),
        lex AS (
          SELECT id, CAST(ROW_NUMBER() OVER (
                   ORDER BY ROUND(raw, 4) DESC, id) AS INT) AS bm25_rank
          FROM bscored
          ORDER BY ROUND(raw, 4) DESC, id
          LIMIT 20
        ),
        sem AS (
          SELECT cand_id AS id, CAST(rank AS INT) AS cos_rank FROM (
            SELECT v.vec_id AS cand_id,
                   ROW_NUMBER() OVER (
                     ORDER BY ROUND(list_cosine_similarity(
                                  CAST(q.embedding AS DOUBLE[]),
                                  CAST(v.embedding AS DOUBLE[])), 4)
                              DESC, v.vec_id) AS rank
            FROM embeddings q JOIN embeddings v ON v.vec_id <> q.vec_id
            WHERE q.vec_id = 0
          ) t WHERE rank <= 20
        ),
        fused AS (
          SELECT COALESCE(l.id, s.id) AS id, l.bm25_rank, s.cos_rank,
                 ROUND(
                   COALESCE(1.0 / (60 + l.bm25_rank), 0.0)
                   + COALESCE(1.0 / (60 + s.cos_rank), 0.0), 6) AS rrf
          FROM lex l FULL OUTER JOIN sem s ON l.id = s.id
        )
        SELECT id AS doc_id,
               CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, id) AS INT)
                 AS rank,
               rrf, bm25_rank, cos_rank
        FROM fused
        ORDER BY rrf DESC, id
        LIMIT 10
    """,
))


Q(QuerySpec(
    name="pl_novelty",
    doc="Per-document novelty: fraction of a doc's distinct word-3-gram "
        "shingles appearing in NO other document (operators/dedup.py:"
        "shingle_novelty — the per-doc attribution twin of "
        "pl_hot_shingles' corpus census; low = template page). Two key "
        "shuffles (shingle df, then per-doc agg), no pair join. "
        "frac4-exact.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.dedup", fromlist=["shingle_novelty"]
    ).shingle_novelty(load_table(spark, sf, "documents"))
    .orderBy("doc_id"),
    oracle_sql_str="""
        WITH sh AS (
          SELECT doc_id AS id, list_distinct(list_transform(
                 range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
                 i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))
               AS shs
          FROM documents
        ),
        ex AS (SELECT id, unnest(shs) AS shingle FROM sh),
        dfreq AS (SELECT shingle, COUNT(*) AS df FROM ex GROUP BY shingle),
        shared AS (
          SELECT e.id,
                 COUNT(*) AS n_sh,
                 SUM(CASE WHEN d.df > 1 THEN 1 ELSE 0 END) AS n_shared
          FROM ex e JOIN dfreq d USING (shingle)
          GROUP BY e.id
        )
        SELECT s.id AS doc_id,
               CAST(len(s.shs) AS INT) AS n_sh,
               CAST(COALESCE(sh2.n_shared, 0) AS BIGINT) AS n_shared,
               CASE WHEN len(s.shs) = 0 THEN 1.0
                    ELSE CAST(((len(s.shs) - COALESCE(sh2.n_shared, 0))
                               * 20000 + len(s.shs))
                              // (2 * len(s.shs)) AS DOUBLE) / 10000
               END AS novelty
        FROM sh s LEFT JOIN shared sh2 ON sh2.id = s.id
        ORDER BY doc_id
    """,
))


Q(QuerySpec(
    name="pl_lang_mismatch",
    doc="Per-source language-drift governance rollup: docs whose "
        "heuristic lang-ID (operators/text.py:lang_id) disagrees with "
        "the declared lang column — the mislabeled-subcorpus detector "
        "that gates mixture-weight decisions. Map-only feature + one "
        "grouped agg. frac4-exact mismatch share.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.text", fromlist=["lang_id", "frac4"]
    ).lang_id(load_table(spark, sf, "documents"))
    .groupBy("source")
    .agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("lang_pred") != F.col("lang"), 1).otherwise(0))
        .alias("n_mismatch"),
    )
    .select(
        "source", "n_docs", "n_mismatch",
        __import__(
            "adenhq_hive_spark.operators.text", fromlist=["frac4"]
        ).frac4(F.col("n_mismatch"), F.col("n_docs")).alias("mismatch_frac"),
    )
    .orderBy("source"),
    oracle_sql_str=r"""
        WITH h AS (
          SELECT source, lang,
                 len(list_intersect(string_split_regex(text, '\s+'),
                     ['the','and','of','to','is'])) AS h_en,
                 len(list_intersect(string_split_regex(text, '\s+'),
                     ['der','die','und','ist','nicht'])) AS h_de,
                 len(list_intersect(string_split_regex(text, '\s+'),
                     ['el','la','que','de','es'])) AS h_es,
                 len(list_intersect(string_split_regex(text, '\s+'),
                     ['le','la','et','est','les'])) AS h_fr,
                 len(list_intersect(string_split_regex(text, '\s+'),
                     ['的','是','了','在','不'])) AS h_zh
          FROM documents
        ),
        p AS (
          SELECT source, lang,
                 CASE WHEN greatest(h_en,h_de,h_es,h_fr,h_zh) = 0 THEN 'und'
                      WHEN h_en = greatest(h_en,h_de,h_es,h_fr,h_zh) THEN 'en'
                      WHEN h_de = greatest(h_en,h_de,h_es,h_fr,h_zh) THEN 'de'
                      WHEN h_es = greatest(h_en,h_de,h_es,h_fr,h_zh) THEN 'es'
                      WHEN h_fr = greatest(h_en,h_de,h_es,h_fr,h_zh) THEN 'fr'
                      ELSE 'zh' END AS lang_pred
          FROM h
        ),
        agg AS (
          SELECT source, COUNT(*) AS n_docs,
                 SUM(CASE WHEN lang_pred <> lang THEN 1 ELSE 0 END)
                   AS n_mismatch
          FROM p GROUP BY source
        )
        SELECT source, n_docs, CAST(n_mismatch AS BIGINT) AS n_mismatch,
               CAST((n_mismatch * 20000 + n_docs) // (2 * n_docs)
                    AS DOUBLE) / 10000 AS mismatch_frac
        FROM agg
        ORDER BY source
    """,
))


Q(QuerySpec(
    name="pl_event_sequences",
    doc="Per-user ordered event-type sequences (operators/curation.py:"
        "event_sequences) — the next-event-prediction dataset builder: "
        "(ts, event_id)-sorted types space-joined per user, truncated "
        "at 256 events (hot-user cap; n_events keeps the full count). "
        "One user-key shuffle, array_sort inside the aggregate — no "
        "window. Oracle: ORDER BY list aggregation + slice.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.curation", fromlist=["event_sequences"]
    ).event_sequences(load_table(spark, sf, "events")),
    oracle_sql_str="""
        SELECT user_id,
               COUNT(*) AS n_events,
               MIN(ts) AS first_ts,
               MAX(ts) AS last_ts,
               array_to_string(
                 (list(event_type ORDER BY ts, event_id))[1:256], ' ')
                 AS seq_text
        FROM events
        GROUP BY user_id
        ORDER BY user_id
    """,
))


Q(QuerySpec(
    name="pl_dataset_card",
    doc="Corpus-level datasheet (operators/curation.py:dataset_card — "
        "Gebru 2021 dataset-card numbers): ONE row with volume "
        "(docs/tokens/sources/langs), median length (q17-proven "
        "PERCENTILE/MEDIAN dual form), integer-exact mean quality, "
        "Gopher pass rate, exact-dup rate. The corpus-level twin of "
        "pl_source_scorecard; map-only features + one content-hash "
        "window + a single global aggregate.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.curation", fromlist=["dataset_card"]
    ).dataset_card(load_table(spark, sf, "documents")),
    oracle_sql_str=r"""
        WITH q AS (
          SELECT doc_id, source, lang,
                 len(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS n_toks,
                 CAST(ROUND((
                   (CASE WHEN len(string_split_regex(text, '\s+'))
                              BETWEEN 5 AND 10000 THEN 0.4 ELSE 0.0 END)
                   + (CASE WHEN CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
                            / len(string_split_regex(text, '\s+'))
                            BETWEEN 2.0 AND 12.0 THEN 0.2 ELSE 0.0 END)
                   + (CASE WHEN CAST(length(text)
                           - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g'))
                           AS DOUBLE) / length(text) <= 0.2
                      THEN 0.2 ELSE 0.0 END)
                   + (CASE WHEN CAST(length(text)
                           - length(regexp_replace(text, '[0-9]', '', 'g'))
                           AS DOUBLE) / length(text) <= 0.3
                      THEN 0.1 ELSE 0.0 END)
                   + (CASE WHEN len(list_intersect(
                           string_split_regex(text, '\s+'),
                           ['the','and','of','to','is'])) > 0
                      THEN 0.1 ELSE 0.0 END)) * 10) AS BIGINT) AS qs10
          FROM documents
        ),
        gm AS (
          SELECT doc_id,
                 len(list_filter(string_split_regex(text, '\s+'),
                     x -> x <> '')) AS n_words,
                 greatest(len(list_filter(string_split_regex(text, '\n'),
                     x -> x <> '')), 1) AS n_lines,
                 length(regexp_replace(text, '\s+', '', 'g')) AS word_chars,
                 len(regexp_extract_all(text, '#'))
                   + len(regexp_extract_all(text, '\.\.\.')) AS symbol_hits,
                 len(list_filter(list_filter(string_split_regex(text, '\n'),
                     x -> x <> ''),
                     l -> regexp_matches(l, '^\s*[-*•]'))) AS bullet_lines,
                 len(list_filter(list_filter(string_split_regex(text, '\n'),
                     x -> x <> ''),
                     l -> regexp_matches(l, '(\.\.\.|…)\s*$')))
                   AS ellipsis_lines,
                 len(list_filter(list_filter(string_split_regex(text, '\s+'),
                     x -> x <> ''),
                     w -> regexp_matches(w, '[A-Za-z]'))) AS alpha_words,
                 len(list_intersect(
                     list_transform(list_filter(
                         string_split_regex(text, '\s+'), x -> x <> ''),
                         w -> lower(w)),
                     ['the','be','to','of','and','that','have','with']))
                   AS stop_hits,
                 greatest(len(list_filter(string_split_regex(text, '\s+'),
                     x -> x <> '')), 1) AS qd
          FROM documents
        ),
        g AS (
          SELECT doc_id,
                 (n_words >= 50 AND n_words <= 100000
                  AND word_chars >= 3 * qd AND word_chars <= 10 * qd
                  AND symbol_hits * 10 < qd
                  AND bullet_lines * 10 < 9 * n_lines
                  AND ellipsis_lines * 10 < 3 * n_lines
                  AND alpha_words * 10 >= 8 * qd
                  AND stop_hits >= 1) AS gopher_ok
          FROM gm
        ),
        d AS (
          SELECT doc_id, row_number() OVER (PARTITION BY md5(text)
                                    ORDER BY doc_id) > 1 AS is_dup
          FROM documents
        ),
        agg AS (
          SELECT COUNT(*) AS n_docs,
                 COUNT(DISTINCT q.source) AS n_sources,
                 COUNT(DISTINCT q.lang) AS n_langs,
                 CAST(SUM(q.n_toks) AS BIGINT) AS n_tokens,
                 ROUND(MEDIAN(q.n_toks), 4) AS med_tokens,
                 CAST(SUM(q.qs10) AS BIGINT) AS sq,
                 CAST(SUM(CASE WHEN g.gopher_ok THEN 1 ELSE 0 END)
                      AS BIGINT) AS sg,
                 CAST(SUM(CASE WHEN d.is_dup THEN 1 ELSE 0 END)
                      AS BIGINT) AS sd
          FROM q JOIN g USING (doc_id) JOIN d USING (doc_id)
        )
        SELECT n_docs, n_sources, n_langs, n_tokens, med_tokens,
               CAST((sq * 20000 + n_docs * 10) // (2 * n_docs * 10)
                    AS DOUBLE) / 10000 AS mean_quality,
               CAST((sg * 20000 + n_docs) // (2 * n_docs) AS DOUBLE)
                 / 10000 AS gopher_pass_rate,
               CAST((sd * 20000 + n_docs) // (2 * n_docs) AS DOUBLE)
                 / 10000 AS dup_rate
        FROM agg
    """,
))


Q(QuerySpec(
    name="pl_ivfpq_topk",
    doc="Approximate cosine top-5 via the FAISS IVF,PQ composite "
        "(operators/similarity.py:ivfpq_cosine_topk — coarse IVF "
        "cells + product-quantized RESIDUALS, q·v ≈ q·c + ADC(q, "
        "residual); 16 cells, 8 probed, m=16 codes, refine=8 exact "
        "re-rank). The production trillion-vector shape: scan "
        "fraction n_probe/n_centroids AND 32x memory compression. "
        "Registered surface is the per-query containment witness "
        "(every pick inside exact top-100) so the driver row carries "
        "a full hash instead of no_oracle; recall additionally gated "
        "via pl_ivfpq_recall.",
    builder=lambda spark, sf: _containment_witness(
        __import__(
            "adenhq_hive_spark.operators.similarity",
            fromlist=["ivfpq_cosine_topk"],
        ).ivfpq_cosine_topk(
            *_queries_vecs(spark, sf), k=5, n_probe=8, refine=8
        ),
        *_queries_vecs(spark, sf),
    ),
    oracle_sql_str="""
        SELECT vec_id AS query_id, CAST(5 AS BIGINT) AS n_k,
               TRUE AS contained
        FROM embeddings WHERE vec_id < 5 ORDER BY vec_id
    """,
))


Q(QuerySpec(
    name="pl_ivfpq_recall",
    doc="Driver-visible IVFPQ quality gate: recall@5 of pl_ivfpq_topk's "
        "configuration (16 cells, n_probe=8, m=16, refine=8) vs the "
        "exact tier, in-engine; oracle pins (n_exact=25, "
        "recall_ok=true) at >= 0.5 — the IVF-tier worst-case-random "
        "bound (measured 0.72 at sf0.1, 0.76 at sf0.01 on the "
        "unclustered random testdata; residual-PQ beats plain IVF's "
        "0.6 at the same probe fraction).",
    builder=lambda spark, sf: _recall_vs_exact(
        __import__(
            "adenhq_hive_spark.operators.similarity",
            fromlist=["ivfpq_cosine_topk"],
        ).ivfpq_cosine_topk(
            *_queries_vecs(spark, sf), k=5, n_probe=8, refine=8
        ),
        cosine_topk(*_queries_vecs(spark, sf), k=5),
        threshold=0.5,
    ),
    oracle_sql_str="""
        SELECT CAST(25 AS BIGINT) AS n_exact, TRUE AS recall_ok
    """,
))


# Shared DuckDB CTE prefix: the duplicated-span PLAN (positional 4-gram
# document frequency -> join-back -> gaps-and-islands) — the oracle
# prefix for pl_dedup_spans and both queries that compose it
# (pl_span_scrub, pl_span_rate); one definition so the three oracles
# cannot drift (same pattern as _CLUSTER_LABELS_CTE).
_SPANS_PLAN_CTE = """\
        WITH toks AS (
          SELECT doc_id AS id, string_split(text, ' ') AS t FROM documents
        ), ps AS (
          SELECT id, u.pos AS pos, u.gram AS gram FROM (
            SELECT id, unnest(list_transform(
                range(1, greatest(len(t) - 3, 0) + 1),
                i -> struct_pack(pos := i,
                                 gram := array_to_string(t[i:i+3], ' ')))) AS u
            FROM toks)
        ), dup AS (
          SELECT gram FROM (
            SELECT gram, COUNT(DISTINCT id) AS gdf FROM ps GROUP BY gram)
          WHERE gdf >= 2
        ), dpos AS (
          SELECT id, pos FROM ps WHERE gram IN (SELECT gram FROM dup)
        ), flagged AS (
          SELECT id, pos,
                 CASE WHEN pos - lag(pos) OVER
                      (PARTITION BY id ORDER BY pos) > 4
                      THEN 1 ELSE 0 END AS new_isl
          FROM dpos
        ), isl AS (
          SELECT id, pos, SUM(new_isl)
               OVER (PARTITION BY id ORDER BY pos ROWS UNBOUNDED PRECEDING)
               AS island
          FROM flagged
        )"""


def _dedup_spans_builder(spark, sf):
    from ..operators.dedup import duplicated_spans

    return duplicated_spans(
        load_table(spark, sf, "documents"), k=4, min_words=8, min_docs=2
    ).orderBy("doc_id", "span_start")


Q(QuerySpec(
    name="pl_dedup_spans",
    doc="Exact duplicated-span removal plan (Lee et al. 2022 substring "
        "dedup): per-doc maximal word ranges covered by cross-document "
        "duplicated 4-grams, merged gaps-and-islands, spans >= 8 words "
        "(operators/dedup.py:duplicated_spans — linear, no pair join). "
        "Oracle = positional-struct unnest + window islands in DuckDB.",
    builder=_dedup_spans_builder,
    oracle_sql_str=f"""
{_SPANS_PLAN_CTE}
        SELECT id AS doc_id,
               CAST(MIN(pos) AS BIGINT) AS span_start,
               CAST(MAX(pos) + 3 AS BIGINT) AS span_end,
               CAST(MAX(pos) + 3 - MIN(pos) + 1 AS BIGINT) AS span_words,
               CAST(COUNT(*) AS BIGINT) AS n_dup_grams
        FROM isl GROUP BY id, island
        HAVING MAX(pos) + 3 - MIN(pos) + 1 >= 8
        ORDER BY doc_id, span_start
    """,
))


def _sem_decontaminate_builder(spark, sf):
    from ..operators.similarity import semantic_decontaminate

    emb = load_table(spark, sf, "embeddings")
    return semantic_decontaminate(
        emb.filter(F.col("vec_id") >= 25),
        emb.filter(F.col("vec_id") < 25),
        threshold=0.38,
    ).orderBy("vec_id")


Q(QuerySpec(
    name="pl_sem_decontaminate",
    doc="Embedding-space eval-leakage flags: corpus vectors (vec_id>=25) "
        "whose nearest eval vector (vec_id<25) reaches cosine 0.38 "
        "(operators/similarity.py:semantic_decontaminate — broadcast "
        "eval matrix, map-only BLAS scan, zero shuffles). Threshold sits "
        "in the tail of the random-testdata distribution; production "
        "use is ~0.95 on real embeddings. Semantic twin of the 13-gram "
        "pl_decontaminate tier.",
    builder=_sem_decontaminate_builder,
    oracle_sql_str="""
        SELECT vec_id, eval_id, cosine FROM (
          SELECT c.vec_id AS vec_id, q.vec_id AS eval_id,
                 ROUND(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
                                              CAST(q.embedding AS DOUBLE[])),
                       4) AS cosine,
                 ROW_NUMBER() OVER (
                   PARTITION BY c.vec_id
                   ORDER BY ROUND(list_cosine_similarity(
                                CAST(c.embedding AS DOUBLE[]),
                                CAST(q.embedding AS DOUBLE[])), 4)
                            DESC, q.vec_id) AS rn
          FROM embeddings c JOIN embeddings q
            ON q.vec_id < 25 AND c.vec_id >= 25
        ) t
        WHERE rn = 1 AND cosine >= 0.38
        ORDER BY vec_id
    """,
))


def _heavy_hitters_builder(spark, sf):
    from ..operators.sketch import heavy_hitters

    return heavy_hitters(
        load_table(spark, sf, "documents"), min_share_bp=200
    )


Q(QuerySpec(
    name="pl_heavy_hitters",
    doc="Corpus heavy-hitter tokens (>= 200 basis points of all token "
        "occurrences) via per-partition Misra-Gries sketches + exact "
        "re-count of the bounded candidate union (operators/sketch.py:"
        "heavy_hitters). The sketch only GENERATES candidates (MG "
        "superset guarantee), the verify pass is exact — so the output "
        "hash-matches the plain GROUP BY oracle while the shuffle stays "
        "candidate-sized at any corpus scale.",
    builder=_heavy_hitters_builder,
    oracle_sql_str="""
        WITH tok AS (
          SELECT unnest(list_filter(string_split(text, ' '),
                                    x -> x <> '')) AS token
          FROM documents
        ), tot AS (SELECT COUNT(*) AS n FROM tok)
        SELECT token, CAST(COUNT(*) AS BIGINT) AS n,
               CAST((COUNT(*) * 10000) // (SELECT n FROM tot) AS BIGINT)
                 AS share_bp
        FROM tok GROUP BY token
        HAVING COUNT(*) * 10000 >= 200 * (SELECT n FROM tot)
        ORDER BY n DESC, token
    """,
))


def _span_scrub_builder(spark, sf):
    from ..operators.dedup import duplicated_spans, scrub_spans

    docs = load_table(spark, sf, "documents")
    spans = duplicated_spans(docs, k=4, min_words=8, min_docs=2)
    return scrub_spans(docs, spans).orderBy("doc_id")


Q(QuerySpec(
    name="pl_span_scrub",
    doc="Span surgery: cut the cross-document duplicated ranges found "
        "by pl_dedup_spans out of each document, keeping the unique "
        "remainder (operators/dedup.py:scrub_spans — bounded per-doc "
        "span arrays, one key-shuffle join, JVM-side word filter). "
        "Hash row covers the full rewritten text of every doc.",
    builder=_span_scrub_builder,
    oracle_sql_str=f"""
{_SPANS_PLAN_CTE}, spans AS (
          SELECT id, MIN(pos) AS s, MAX(pos) + 3 AS e
          FROM isl GROUP BY id, island
          HAVING MAX(pos) + 3 - MIN(pos) + 1 >= 8
        ), words AS (
          SELECT id, u.pos AS pos, u.w AS w FROM (
            SELECT id, unnest(list_transform(range(1, len(t) + 1),
                i -> struct_pack(pos := i, w := t[i]))) AS u
            FROM toks)
        ), kept AS (
          SELECT w1.id, w1.pos, w1.w FROM words w1
          WHERE NOT EXISTS (SELECT 1 FROM spans s
                            WHERE s.id = w1.id
                              AND w1.pos BETWEEN s.s AND s.e)
        )
        SELECT tk.id AS doc_id,
               COALESCE(k.clean_text, '') AS clean_text,
               CAST(len(tk.t) - COALESCE(k.n_kept, 0) AS BIGINT) AS n_removed
        FROM toks tk LEFT JOIN (
          SELECT id, string_agg(w, ' ' ORDER BY pos) AS clean_text,
                 COUNT(*) AS n_kept
          FROM kept GROUP BY id) k ON k.id = tk.id
        ORDER BY doc_id
    """,
))


def _asof_directional_builder(direction, tolerance):
    def build(spark, sf):
        ev = load_table(spark, sf, "events")
        return (
            asof_join(
                ev.filter(F.col("event_type") == "purchase")
                .select(F.col("event_id").alias("purchase_id"), "user_id", "ts"),
                ev.filter(F.col("event_type") == "click")
                .select("user_id", "ts", F.col("event_id").alias("click_id")),
                on="user_id",
                right_values=["click_id", "ts"],
                order_col="click_id",
                direction=direction,
                tolerance=tolerance,
            )
            .filter(F.col("asof_click_id").isNotNull())
            .select(
                "purchase_id",
                F.col("asof_click_id").alias("click_id"),
                F.col("asof_ts").alias("click_ts"),
            )
            .orderBy("purchase_id")
            .limit(2000)
        )

    return build


Q(QuerySpec(
    name="pl_asof_forward",
    doc="Forward as-of with tolerance: for each purchase, the EARLIEST "
        "click of the same user at-or-after it and within 1 hour "
        "(operators/asof.py direction='forward', tolerance=3600 — same "
        "union+carry shape as backward, descending scan, no pair join). "
        "Oracle = bounded range join + row_number.",
    builder=_asof_directional_builder("forward", 3600.0),
    oracle_sql_str="""
        SELECT purchase_id, click_id, click_ts
        FROM (
          SELECT p.event_id AS purchase_id, c.event_id AS click_id,
                 c.ts AS click_ts,
                 ROW_NUMBER() OVER (PARTITION BY p.event_id
                                    ORDER BY c.ts ASC, c.event_id DESC) AS rn
          FROM events p
          JOIN events c ON c.user_id = p.user_id
                        AND c.event_type = 'click'
                        AND c.ts >= p.ts
                        AND c.ts <= p.ts + INTERVAL 1 HOUR
          WHERE p.event_type = 'purchase'
        ) x
        WHERE rn = 1
        ORDER BY purchase_id NULLS LAST
        LIMIT 2000
    """,
))

Q(QuerySpec(
    name="pl_asof_nearest",
    doc="Nearest as-of: for each purchase, the click of the same user "
        "closest in time on EITHER side; equidistant resolves backward "
        "(the only choice a streaming execution could also make). "
        "Engine = two shared-exchange window scans (operators/asof.py "
        "direction='nearest'); oracle ranks all candidates by "
        "(|delta|, backward-first, click_id desc).",
    builder=_asof_directional_builder("nearest", None),
    oracle_sql_str="""
        SELECT purchase_id, click_id, click_ts
        FROM (
          SELECT p.event_id AS purchase_id, c.event_id AS click_id,
                 c.ts AS click_ts,
                 ROW_NUMBER() OVER (
                   PARTITION BY p.event_id
                   ORDER BY abs(epoch_us(c.ts) - epoch_us(p.ts)) ASC,
                            CASE WHEN c.ts <= p.ts THEN 0 ELSE 1 END ASC,
                            c.event_id DESC) AS rn
          FROM events p
          JOIN events c ON c.user_id = p.user_id
                        AND c.event_type = 'click'
          WHERE p.event_type = 'purchase'
        ) x
        WHERE rn = 1
        ORDER BY purchase_id NULLS LAST
        LIMIT 2000
    """,
))


def _ks_drift_builder(spark, sf):
    from ..operators.profile import ks_drift

    return ks_drift(
        load_table(spark, sf, "documents"), value_col="n_chars",
        group_col="source",
    )


Q(QuerySpec(
    name="pl_ks_drift",
    doc="Per-source length-distribution drift: exact two-sample "
        "Kolmogorov-Smirnov distance of each source's n_chars CDF vs "
        "the rest of the corpus (operators/profile.py:ks_drift — "
        "integer-cleared max |cum_g*n_rest - cum_rest*n_g|, dense "
        "group x value grid, partitioned cumulative windows only).",
    builder=_ks_drift_builder,
    oracle_sql_str="""
        WITH counts AS (
          SELECT source AS g, n_chars AS v, COUNT(*) AS c
          FROM documents GROUP BY source, n_chars
        ), grid AS (
          SELECT gg.g, vv.v
          FROM (SELECT DISTINCT g FROM counts) gg
          CROSS JOIN (SELECT DISTINCT v FROM counts) vv
        ), dense AS (
          SELECT grid.g, grid.v, COALESCE(c.c, 0) AS c
          FROM grid LEFT JOIN counts c ON c.g = grid.g AND c.v = grid.v
        ), cums AS (
          SELECT g, v, SUM(c) OVER (PARTITION BY g ORDER BY v
                                    ROWS UNBOUNDED PRECEDING) AS cum_g
          FROM dense
        ), corpus AS (
          SELECT v, SUM(cum_g) AS cum_all FROM cums GROUP BY v
        ), totals AS (
          SELECT source AS g, COUNT(*) AS n_g FROM documents GROUP BY source
        ), tot AS (SELECT COUNT(*) AS n FROM documents),
        j AS (
          SELECT cums.g, cums.cum_g, corpus.cum_all, totals.n_g,
                 (SELECT n FROM tot) - totals.n_g AS n_rest
          FROM cums
          JOIN corpus ON corpus.v = cums.v
          JOIN totals ON totals.g = cums.g
        ), m AS (
          SELECT g,
                 MAX(abs(CAST(cum_g AS HUGEINT) * n_rest
                         - CAST(cum_all - cum_g AS HUGEINT) * n_g)) AS ks_num,
                 ANY_VALUE(CAST(n_g AS HUGEINT) * n_rest) AS den,
                 ANY_VALUE(n_g) AS n_g
          FROM j GROUP BY g
        )
        SELECT g AS source, CAST(n_g AS BIGINT) AS n_docs,
               CAST((ks_num * 20000 + den) // (2 * den) AS DOUBLE) / 10000
                 AS ks
        FROM m ORDER BY source
    """,
))


def _span_rate_builder(spark, sf):
    from ..operators.dedup import duplicated_spans
    from ..operators.text import frac4, ws_token_count

    docs = load_table(spark, sf, "documents")
    spans = duplicated_spans(docs, k=4, min_words=8, min_docs=2)
    dup_words = (
        spans.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(F.sum("span_words").alias("dup_words"))
    )
    totals = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " "))).alias("n_words"),
    )
    return (
        totals.join(dup_words, "source", "left")
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_words").cast("long").alias("n_words"),
            F.coalesce("dup_words", F.lit(0)).cast("long").alias("dup_words"),
            frac4(
                F.coalesce("dup_words", F.lit(0)), F.col("n_words")
            ).alias("dup_share"),
        )
        .orderBy("source")
    )


Q(QuerySpec(
    name="pl_span_rate",
    doc="Per-source duplicated-span burden: words inside cross-document "
        "duplicated ranges (pl_dedup_spans plan) over total words — the "
        "governance number that says WHERE span surgery pays before "
        "running it (composes duplicated_spans + a per-source rollup; "
        "word totals use the raw single-space split, matching span "
        "positions which index that same split).",
    builder=_span_rate_builder,
    oracle_sql_str=f"""
{_SPANS_PLAN_CTE}, spans AS (
          SELECT id, MAX(pos) + 3 - MIN(pos) + 1 AS span_words
          FROM isl GROUP BY id, island
          HAVING MAX(pos) + 3 - MIN(pos) + 1 >= 8
        ), dup_w AS (
          SELECT d.source, SUM(s.span_words) AS dup_words
          FROM spans s JOIN documents d ON d.doc_id = s.id
          GROUP BY d.source
        ), tot AS (
          SELECT source, COUNT(*) AS n_docs,
                 SUM(len(string_split(text, ' '))) AS n_words
          FROM documents GROUP BY source
        )
        SELECT t.source, CAST(t.n_docs AS BIGINT) AS n_docs,
               CAST(t.n_words AS BIGINT) AS n_words,
               CAST(COALESCE(w.dup_words, 0) AS BIGINT) AS dup_words,
               CAST((COALESCE(w.dup_words, 0) * 20000 + t.n_words)
                    // (2 * t.n_words) AS DOUBLE) / 10000 AS dup_share
        FROM tot t LEFT JOIN dup_w w ON w.source = t.source
        ORDER BY t.source
    """,
))


def _span_incr_builder(spark, sf):
    from ..operators.dedup import build_gram_postings, dedup_spans_incremental

    docs = load_table(spark, sf, "documents")
    corpus = docs.filter(F.col("doc_id") < 250)
    batch = docs.filter(F.col("doc_id") >= 250)
    return dedup_spans_incremental(
        batch, build_gram_postings(corpus), k=4, min_words=8
    ).orderBy("doc_id", "span_start")


Q(QuerySpec(
    name="pl_span_incr",
    doc="Incremental span dedup: duplicated spans of the NEW batch "
        "(doc_id>=250) against corpus ∪ batch via the persisted gram-"
        "frequency postings — batch-linear, corpus text never re-read "
        "(operators/dedup.py:dedup_spans_incremental). Oracle = the "
        "full-corpus spans plan restricted to batch ids, so the hash "
        "row pins incremental == full.",
    builder=_span_incr_builder,
    oracle_sql_str=f"""
{_SPANS_PLAN_CTE}
        SELECT id AS doc_id,
               CAST(MIN(pos) AS BIGINT) AS span_start,
               CAST(MAX(pos) + 3 AS BIGINT) AS span_end,
               CAST(MAX(pos) + 3 - MIN(pos) + 1 AS BIGINT) AS span_words,
               CAST(COUNT(*) AS BIGINT) AS n_dup_grams
        FROM isl WHERE id >= 250 GROUP BY id, island
        HAVING MAX(pos) + 3 - MIN(pos) + 1 >= 8
        ORDER BY doc_id, span_start
    """,
))


def _scrub_pipeline(spark, sf):
    from ..operators.curation import hash_split
    from ..operators.dedup import duplicated_spans, scrub_spans
    from ..operators.text import ws_token_count

    docs = load_table(spark, sf, "documents")
    spans = duplicated_spans(docs, k=4, min_words=8, min_docs=2)
    clean = scrub_spans(docs, spans)
    kept = clean.withColumn(
        "n_words", ws_token_count(F.col("clean_text")).cast("long")
    ).filter(F.col("n_words") >= 20)
    return (
        hash_split(kept)
        .groupBy("split")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("n_words"),
            F.sum("n_removed").cast("long").alias("n_removed"),
        )
        .orderBy("split")
    )


Q(QuerySpec(
    name="pl_scrub_pipeline",
    doc="Capstone of the span tier: detect cross-document duplicated "
        "ranges -> cut them (span surgery) -> drop documents gutted "
        "below 20 surviving words -> md5-routed train/val/test split -> "
        "per-split doc/word/removed totals. Every stage is the operator "
        "its standalone query exercises; the oracle replays the chain "
        "as one DuckDB CTE pipeline.",
    builder=_scrub_pipeline,
    oracle_sql_str=f"""
{_SPANS_PLAN_CTE}, spans AS (
          SELECT id, MIN(pos) AS s, MAX(pos) + 3 AS e
          FROM isl GROUP BY id, island
          HAVING MAX(pos) + 3 - MIN(pos) + 1 >= 8
        ), words AS (
          SELECT id, u.pos AS pos, u.w AS w FROM (
            SELECT id, unnest(list_transform(range(1, len(t) + 1),
                i -> struct_pack(pos := i, w := t[i]))) AS u
            FROM toks)
        ), kept AS (
          SELECT w1.id, w1.pos, w1.w FROM words w1
          WHERE NOT EXISTS (SELECT 1 FROM spans s
                            WHERE s.id = w1.id
                              AND w1.pos BETWEEN s.s AND s.e)
        ), clean AS (
          SELECT tk.id AS doc_id,
                 COALESCE(k.clean_text, '') AS clean_text,
                 CAST(len(tk.t) - COALESCE(k.n_kept, 0) AS BIGINT)
                   AS n_removed
          FROM toks tk LEFT JOIN (
            SELECT id, string_agg(w, ' ' ORDER BY pos) AS clean_text,
                   COUNT(*) AS n_kept
            FROM kept GROUP BY id) k ON k.id = tk.id
        ), keepn AS (
          SELECT doc_id, n_removed,
                 CAST(len(list_filter(string_split(clean_text, ' '),
                                      x -> x <> '')) AS BIGINT) AS n_words
          FROM clean
          WHERE len(list_filter(string_split(clean_text, ' '),
                                x -> x <> '')) >= 20
        )
        SELECT CASE
                 WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccd'
                   THEN 'train'
                 WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666'
                   THEN 'val'
                 ELSE 'test'
               END AS split,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_words) AS BIGINT) AS n_words,
               CAST(SUM(n_removed) AS BIGINT) AS n_removed
        FROM keepn
        GROUP BY split
        ORDER BY split
    """,
))


def _drop_ledger(spark, sf):
    from ..operators.ngrams import word_ngrams
    from ..operators.text import repetition_stats, ws_token_count

    docs = load_table(spark, sf, "documents")
    rep = repetition_stats(docs, n=2).select("doc_id", "rep_ok")
    base = docs.join(rep, "doc_id", "left").withColumn(
        "n_tokens", ws_token_count(F.col("text"))
    )
    q_fail = (F.col("n_tokens") < 20) | ~F.coalesce(
        F.col("rep_ok"), F.lit(True)
    )
    keep1 = base.filter(~q_fail)
    keepers = (
        keep1.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("kid"))
        .select(F.col("kid").alias("doc_id"), F.lit(True).alias("is_keeper"))
    )
    g5 = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.array_distinct(word_ngrams(F.col("text"), 5, lowercase=True))
        ).alias("gram"),
    )
    ev = g5.filter(F.col("source") == "src0").select("gram").distinct()
    bad = (
        g5.filter(F.col("source") != "src0")
        .join(ev, "gram", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("is_bad", F.lit(True))
    )
    return (
        base.join(keepers, "doc_id", "left")
        .join(bad, "doc_id", "left")
        .select(
            "doc_id",
            F.when(q_fail, "quality")
            .when(~F.coalesce("is_keeper", F.lit(False)), "duplicate")
            .when(F.col("source") == "src0", "eval_holdout")
            .when(F.coalesce("is_bad", F.lit(False)), "contaminated")
            .otherwise("kept")
            .alias("drop_stage"),
        )
        .orderBy("doc_id")
    )


Q(QuerySpec(
    name="pl_drop_ledger",
    doc="Per-document drop provenance through the curation capstone: the "
        "FIRST stage that removed each doc (quality | duplicate | "
        "eval_holdout | contaminated | kept) under exactly "
        "pl_curation_pipeline's stage semantics — the 'why did my "
        "document disappear' debugging table a curation run ships with. "
        "One row per corpus doc; oracle replays the stage conditions as "
        "a CASE over the capstone's own CTE blocks.",
    builder=_drop_ledger,
    oracle_sql_str="""
        WITH toks AS (
          SELECT doc_id, text, source,
                 len(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS n_tokens
          FROM documents
        ),
        g2 AS (
          SELECT doc_id, unnest(list_transform(
                 range(1, greatest(len(string_split(lower(text), ' ')) - 1,
                                   0) + 1),
                 i -> array_to_string(
                     string_split(lower(text), ' ')[i:i+1], ' ')))
               AS gram
          FROM documents
        ),
        pg AS (
          SELECT doc_id, gram, COUNT(*) AS c FROM g2 GROUP BY doc_id, gram
        ),
        rep AS (
          SELECT doc_id,
                 (MAX(c) * 10000 <= SUM(c) * 2000
                  AND (SUM(c) - COUNT(*)) * 10000 <= SUM(c) * 6000) AS rep_ok
          FROM pg GROUP BY doc_id
        ),
        keep1 AS (
          SELECT t.* FROM toks t JOIN rep USING (doc_id)
          WHERE rep.rep_ok AND t.n_tokens >= 20
        ),
        ded AS (
          SELECT MIN(doc_id) AS doc_id FROM keep1 GROUP BY md5(text)
        ),
        g5 AS (
          SELECT doc_id, source, unnest(list_distinct(list_transform(
                 range(1, greatest(len(string_split(lower(text), ' ')) - 4,
                                   0) + 1),
                 i -> array_to_string(
                     string_split(lower(text), ' ')[i:i+4], ' '))))
               AS gram
          FROM documents
        ),
        ev AS (SELECT DISTINCT gram FROM g5 WHERE source = 'src0'),
        bad AS (
          SELECT DISTINCT doc_id FROM g5
          WHERE source <> 'src0' AND gram IN (SELECT gram FROM ev)
        )
        SELECT d.doc_id,
               CASE
                 WHEN t.n_tokens < 20 OR NOT COALESCE(r.rep_ok, TRUE)
                   THEN 'quality'
                 WHEN d.doc_id NOT IN (SELECT doc_id FROM ded)
                   THEN 'duplicate'
                 WHEN d.source = 'src0' THEN 'eval_holdout'
                 WHEN d.doc_id IN (SELECT doc_id FROM bad)
                   THEN 'contaminated'
                 ELSE 'kept'
               END AS drop_stage
        FROM documents d
        JOIN toks t USING (doc_id)
        LEFT JOIN rep r USING (doc_id)
        ORDER BY d.doc_id
    """,
))


def _attribution_builder(spark, sf):
    from ..operators.text import frac4

    ev = load_table(spark, sf, "events")
    j = asof_join(
        ev.filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"), "user_id", "ts"),
        ev.filter(F.col("event_type") == "click")
        .select("user_id", "ts", F.col("event_id").alias("click_id")),
        on="user_id",
        right_values=["click_id"],
        order_col="click_id",
        direction="backward",
        tolerance=3600.0,
    )
    return (
        j.withColumn(
            "day", F.date_trunc("DAY", F.col("ts")).cast("timestamp")
        )
        .groupBy("day")
        .agg(
            F.count("*").cast("long").alias("n_purchases"),
            F.sum(
                F.when(F.col("asof_click_id").isNotNull(), 1).otherwise(0)
            ).cast("long").alias("n_attributed"),
        )
        .withColumn(
            "attribution_rate",
            frac4(F.col("n_attributed"), F.col("n_purchases")),
        )
        .orderBy("day")
    )


Q(QuerySpec(
    name="pl_attribution",
    doc="Last-touch attribution rate per day: share of purchases with a "
        "same-user click within the preceding hour — composes the "
        "backward as-of join WITH tolerance (operators/asof.py) into a "
        "daily rollup; oracle = bounded EXISTS range probe.",
    builder=_attribution_builder,
    oracle_sql_str="""
        WITH p AS (
          SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase'
        ), att AS (
          SELECT p.event_id,
                 CAST(date_trunc('DAY', p.ts) AS TIMESTAMP) AS day,
                 EXISTS (SELECT 1 FROM events c
                         WHERE c.user_id = p.user_id
                           AND c.event_type = 'click'
                           AND c.ts <= p.ts
                           AND c.ts >= p.ts - INTERVAL 1 HOUR) AS has_click
          FROM p
        )
        SELECT day,
               CAST(COUNT(*) AS BIGINT) AS n_purchases,
               CAST(SUM(CASE WHEN has_click THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_attributed,
               CAST((SUM(CASE WHEN has_click THEN 1 ELSE 0 END) * 20000
                     + COUNT(*)) // (2 * COUNT(*)) AS DOUBLE) / 10000
                 AS attribution_rate
        FROM att
        GROUP BY day
        ORDER BY day
    """,
))


def _event_transitions(spark, sf):
    from pyspark.sql import Window

    from ..operators.text import frac4

    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    trans = seq.groupBy("prev", F.col("event_type").alias("next")).agg(
        F.count("*").cast("long").alias("n")
    )
    tot = trans.groupBy("prev").agg(F.sum("n").alias("n_prev"))
    return (
        trans.join(tot, "prev")
        .select("prev", "next", "n", frac4(F.col("n"), F.col("n_prev")).alias("p"))
        .orderBy("prev", "next")
    )


Q(QuerySpec(
    name="pl_event_transitions",
    doc="First-order Markov transition matrix over per-user event "
        "sequences: P(next event type | current), counts + frac4-exact "
        "probabilities — the behavior-model training table (and the "
        "sanity check that pl_event_sequences' ordering contract holds "
        "corpus-wide). Lag window partitioned per user, one grouped "
        "count, totals joined back on the prev key.",
    builder=_event_transitions,
    oracle_sql_str="""
        WITH seq AS (
          SELECT user_id, event_type,
                 lag(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev
          FROM events
        ), trans AS (
          SELECT prev, event_type AS next, COUNT(*) AS n
          FROM seq WHERE prev IS NOT NULL
          GROUP BY prev, event_type
        ), tot AS (
          SELECT prev, SUM(n) AS n_prev FROM trans GROUP BY prev
        )
        SELECT t.prev, t.next, CAST(t.n AS BIGINT) AS n,
               CAST((t.n * 20000 + o.n_prev) // (2 * o.n_prev)
                    AS DOUBLE) / 10000 AS p
        FROM trans t JOIN tot o ON o.prev = t.prev
        ORDER BY t.prev NULLS LAST, t.next NULLS LAST
    """,
))


def _leak_census(spark, sf):
    from ..operators.ngrams import word_ngrams

    docs = load_table(spark, sf, "documents")
    g5 = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.array_distinct(word_ngrams(F.col("text"), 5, lowercase=True))
        ).alias("gram"),
    )
    ev = g5.filter(F.col("source") == "src0").select(
        F.col("doc_id").alias("eval_doc_id"), "gram"
    )
    corpus = g5.filter(F.col("source") != "src0").select(
        F.col("doc_id").alias("corpus_doc_id"), "gram"
    )
    return (
        ev.join(corpus, "gram")
        .groupBy("eval_doc_id")
        .agg(
            F.count_distinct("corpus_doc_id").cast("long").alias("n_leaky_docs"),
            F.count_distinct("gram").cast("long").alias("n_shared_grams"),
        )
        .orderBy("eval_doc_id")
    )


Q(QuerySpec(
    name="pl_leak_census",
    doc="Eval-leakage census: for each eval document (src0), how many "
        "corpus documents share a 5-gram with it and through how many "
        "distinct grams — the triage table that says WHICH benchmark "
        "items are burned before decontamination decides what to drop. "
        "Gram-key join with count-distinct partial aggs; only leaking "
        "eval docs appear.",
    builder=_leak_census,
    oracle_sql_str="""
        WITH g5 AS (
          SELECT doc_id, source, unnest(list_distinct(list_transform(
                 range(1, greatest(len(string_split(lower(text), ' ')) - 4,
                                   0) + 1),
                 i -> array_to_string(
                     string_split(lower(text), ' ')[i:i+4], ' '))))
               AS gram
          FROM documents
        )
        SELECT e.doc_id AS eval_doc_id,
               CAST(COUNT(DISTINCT c.doc_id) AS BIGINT) AS n_leaky_docs,
               CAST(COUNT(DISTINCT e.gram) AS BIGINT) AS n_shared_grams
        FROM g5 e JOIN g5 c
          ON e.gram = c.gram AND e.source = 'src0' AND c.source <> 'src0'
        GROUP BY e.doc_id
        ORDER BY eval_doc_id
    """,
))


def _span_witness_builder(spark, sf):
    from ..operators.dedup import span_witnesses

    return span_witnesses(
        load_table(spark, sf, "documents"), k=4, min_words=8, min_docs=2
    ).orderBy("doc_id", "span_start")


Q(QuerySpec(
    name="pl_span_witness",
    doc="Span provenance: every duplicated span with a witness doc "
        "sharing its starting 4-gram (operators/dedup.py:span_witnesses "
        "— witnesses from bounded per-gram MIN/MAX id aggregates, never "
        "a posting list, so hot boilerplate grams cost two BIGINTs). "
        "Same island algebra as pl_dedup_spans.",
    builder=_span_witness_builder,
    oracle_sql_str="""
        WITH toks AS (
          SELECT doc_id AS id, string_split(text, ' ') AS t FROM documents
        ), ps AS (
          SELECT id, u.pos AS pos, u.gram AS gram FROM (
            SELECT id, unnest(list_transform(
                range(1, greatest(len(t) - 3, 0) + 1),
                i -> struct_pack(pos := i,
                                 gram := array_to_string(t[i:i+3], ' ')))) AS u
            FROM toks)
        ), gstats AS (
          SELECT gram, MIN(id) AS g_min, MAX(id) AS g_max
          FROM (SELECT DISTINCT gram, id FROM ps)
          GROUP BY gram HAVING COUNT(*) >= 2
        ), dpos AS (
          SELECT p.id, p.pos, g.g_min, g.g_max
          FROM ps p JOIN gstats g ON g.gram = p.gram
        ), flagged AS (
          SELECT id, pos, g_min, g_max,
                 CASE WHEN pos - lag(pos) OVER
                      (PARTITION BY id ORDER BY pos) > 4
                      THEN 1 ELSE 0 END AS new_isl
          FROM dpos
        ), isl AS (
          SELECT id, pos, g_min, g_max, SUM(new_isl)
               OVER (PARTITION BY id ORDER BY pos ROWS UNBOUNDED PRECEDING)
               AS island
          FROM flagged
        )
        SELECT id AS doc_id,
               CAST(MIN(pos) AS BIGINT) AS span_start,
               CAST(MAX(pos) + 3 AS BIGINT) AS span_end,
               CAST(MAX(pos) + 3 - MIN(pos) + 1 AS BIGINT) AS span_words,
               CAST(CASE WHEN arg_min(g_min, pos) <> id
                         THEN arg_min(g_min, pos)
                         ELSE arg_min(g_max, pos) END AS BIGINT)
                 AS witness_doc
        FROM isl GROUP BY id, island
        HAVING MAX(pos) + 3 - MIN(pos) + 1 >= 8
        ORDER BY doc_id, span_start
    """,
))



Q(QuerySpec(
    name="pl_pack_ffd",
    doc="Doc-level first-fit-decreasing packing manifest (budget 256 "
        "tokens, 16 md5 shards): whole documents into fixed-budget "
        "bins, never split — the SFT packing policy, complementing "
        "pack_sequences' concat-and-chunk (operators/curation.py:"
        "pack_ffd). Sequential FFD runs shard-local inside "
        "applyInPandas; the oracle replays the IDENTICAL first-fit "
        "state machine as a DuckDB recursive CTE carrying the bin-"
        "capacity list as state (one recursion step per doc in (tokens "
        "desc, id) order), so a sequential packing algorithm carries a "
        "full hash row — the q86-recursion analog of the pl_bpe "
        "python-replay pattern.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.curation", fromlist=["pack_ffd"]
    ).pack_ffd(
        load_table(spark, sf, "documents"), max_tokens=256
    ).orderBy("shard", "bin_id", "doc_id"),
    oracle_sql_str="""
        WITH RECURSIVE
        docs AS (
          SELECT doc_id,
                 CAST(len(list_filter(string_split(text, ' '),
                                      t -> t <> '')) AS BIGINT)
                   AS n_tokens,
                 CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                           1, 8)) AS BIGINT) % 16 AS INT)
                   AS shard
          FROM documents
        ),
        ordered AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY shard
                                       ORDER BY n_tokens DESC, doc_id)
                      AS seq
          FROM docs
        ),
        ffd AS (
          SELECT shard, CAST(0 AS BIGINT) AS seq,
                 CAST([] AS BIGINT[]) AS bins,
                 CAST(NULL AS BIGINT) AS doc_id,
                 CAST(NULL AS BIGINT) AS n_tokens,
                 CAST(NULL AS BIGINT) AS bin_id,
                 CAST(NULL AS BOOLEAN) AS overflow
          FROM (SELECT DISTINCT shard FROM ordered)
          UNION ALL
          SELECT shard, seq,
                 CASE WHEN over THEN list_append(bins, CAST(0 AS BIGINT))
                      WHEN fit IS NULL THEN list_append(bins, 256 - n)
                      ELSE list_transform(range(1, len(bins) + 1),
                             i -> CASE WHEN i = fit THEN bins[i] - n
                                       ELSE bins[i] END)
                 END AS bins,
                 doc_id, n,
                 CASE WHEN over OR fit IS NULL THEN len(bins)
                      ELSE fit - 1 END AS bin_id,
                 over AS overflow
          FROM (
            SELECT o.shard, o.seq, f.bins, o.doc_id, o.n_tokens AS n,
                   o.n_tokens > 256 AS over,
                   (list_filter(range(1, len(f.bins) + 1),
                                i -> f.bins[i] >= o.n_tokens))[1] AS fit
            FROM ffd f
            JOIN ordered o ON o.shard = f.shard AND o.seq = f.seq + 1
          ) step
        )
        SELECT shard, bin_id, doc_id, n_tokens, overflow
        FROM ffd WHERE seq > 0
        ORDER BY shard, bin_id, doc_id
    """,
))


Q(QuerySpec(
    name="pl_feature_hash",
    doc="Hashing-trick sparse TF-IDF vectors, 32 dims (operators/"
        "text.py:feature_hash — md5-routed dimensions, per-term rounded "
        "tf*idf summed as scaled BIGINT so accumulation is exact and "
        "order-independent). The vocabulary-free text->vector bridge; "
        "oracle replays the same route + integer sum in DuckDB.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.text", fromlist=["feature_hash"]
    ).feature_hash(load_table(spark, sf, "documents"), dims=32)
    .orderBy("doc_id", "dim"),
    oracle_sql_str="""
        WITH ex AS (
          SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
          FROM documents
        ),
        tf AS (
          SELECT doc_id, term, COUNT(*) AS tf
          FROM ex WHERE term <> '' GROUP BY doc_id, term
        ),
        dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
          SELECT tf.doc_id,
                 CAST(('0x' || substr(md5(tf.term), 1, 8)) AS BIGINT)
                   % 32 AS dim,
                 CAST(ROUND(ROUND(tf.tf * (ln((n.n_docs + 1.0)
                                              / (dfreq.df + 1.0)) + 1.0),
                                  4) * 10000) AS BIGINT) AS w4
          FROM tf JOIN dfreq USING (term) CROSS JOIN n
        )
        SELECT doc_id, CAST(dim AS INT) AS dim,
               CAST(SUM(w4) AS DOUBLE) / 10000 AS weight
        FROM scored
        GROUP BY doc_id, dim
        ORDER BY doc_id, dim
    """,
))


def _hash_sim_builder(spark, sf):
    from pyspark.sql import Window

    from ..operators.text import feature_hash

    fh = feature_hash(load_table(spark, sf, "documents"), dims=32)
    # integer weights: w4 = weight * 10000 exactly (scaled-BIGINT sums)
    v = fh.select(
        "doc_id", "dim", F.round(F.col("weight") * 10000).cast("long").alias("w4")
    )
    q = v.filter(F.col("doc_id") < 5).withColumnsRenamed(
        {"doc_id": "qid", "w4": "qw4"}
    )
    dots = (
        q.join(v.filter(F.col("doc_id") >= 5), "dim")
        .groupBy("qid", "doc_id")
        .agg(F.sum(F.col("qw4") * F.col("w4")).alias("dot"))
    )
    norms = v.groupBy("doc_id").agg(F.sum(F.col("w4") * F.col("w4")).alias("nn"))
    qn = norms.withColumnsRenamed({"doc_id": "qid", "nn": "qnn"})
    scored = (
        dots.join(norms, "doc_id")
        .join(qn, "qid")
        .withColumn(
            "cosine",
            F.round(
                F.col("dot")
                / F.sqrt(F.col("nn").cast("double") * F.col("qnn").cast("double")),
                4,
            ),
        )
    )
    ranked = scored.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("qid").orderBy(F.desc("cosine"), "doc_id")
        ),
    )
    return (
        ranked.filter(F.col("rank") <= 5)
        .select("qid", "rank", F.col("doc_id").alias("cand_id"), "cosine")
        .orderBy("qid", "rank")
    )


Q(QuerySpec(
    name="pl_hash_sim",
    doc="Text similarity WITHOUT embeddings: cosine top-5 neighbors of "
        "query docs (doc_id<5) over the 32-dim hashing-trick vectors — "
        "dot products on exact scaled-BIGINT weights (order-independent "
        "integer sums; only the final cosine divides). Composes "
        "pl_feature_hash into the similarity tier; query side is "
        "query-sized, candidates shuffle on the 32 dim keys.",
    builder=_hash_sim_builder,
    oracle_sql_str="""
        WITH ex AS (
          SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
          FROM documents
        ),
        tf AS (
          SELECT doc_id, term, COUNT(*) AS tf
          FROM ex WHERE term <> '' GROUP BY doc_id, term
        ),
        dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
          SELECT tf.doc_id,
                 CAST(('0x' || substr(md5(tf.term), 1, 8)) AS BIGINT)
                   % 32 AS dim,
                 CAST(ROUND(ROUND(tf.tf * (ln((n.n_docs + 1.0)
                                              / (dfreq.df + 1.0)) + 1.0),
                                  4) * 10000) AS BIGINT) AS w4
          FROM tf JOIN dfreq USING (term) CROSS JOIN n
        ),
        vec AS (
          SELECT doc_id, dim, SUM(w4) AS w4
          FROM scored GROUP BY doc_id, dim
        ),
        norms AS (
          SELECT doc_id, SUM(w4 * w4) AS nn FROM vec GROUP BY doc_id
        ),
        dots AS (
          SELECT q.doc_id AS qid, c.doc_id AS cand_id,
                 SUM(q.w4 * c.w4) AS dot
          FROM vec q JOIN vec c
            ON q.dim = c.dim AND q.doc_id < 5 AND c.doc_id >= 5
          GROUP BY q.doc_id, c.doc_id
        ),
        cos AS (
          SELECT qid, cand_id,
                 ROUND(dot / sqrt(CAST(nq.nn AS DOUBLE)
                                  * CAST(nc.nn AS DOUBLE)), 4) AS cosine
          FROM dots
          JOIN norms nq ON nq.doc_id = dots.qid
          JOIN norms nc ON nc.doc_id = dots.cand_id
        )
        SELECT qid, rank, cand_id, cosine FROM (
          SELECT qid, cand_id, cosine,
                 ROW_NUMBER() OVER (PARTITION BY qid
                                    ORDER BY cosine DESC, cand_id) AS rank
          FROM cos
        ) t
        WHERE rank <= 5
        ORDER BY qid, rank
    """,
))


def _source_overlap(spark, sf):
    from ..operators.ngrams import word_ngrams
    from ..operators.text import frac4

    docs = load_table(spark, sf, "documents")
    sh = docs.select(
        "source",
        F.explode(
            F.array_distinct(word_ngrams(F.col("text"), 3))
        ).alias("shingle"),
    ).distinct()
    sizes = sh.groupBy("source").agg(F.count("*").alias("n"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"source": "src_a", "n": "n_a"}), "src_a")
        .join(sizes.withColumnsRenamed({"source": "src_b", "n": "n_b"}), "src_b")
        .select(
            "src_a",
            "src_b",
            F.col("n_inter").cast("long").alias("n_inter"),
            frac4(
                F.col("n_inter"),
                F.col("n_a") + F.col("n_b") - F.col("n_inter"),
            ).alias("jaccard"),
        )
        .orderBy("src_a", "src_b")
    )


Q(QuerySpec(
    name="pl_source_overlap",
    doc="Source-pair mirror detection at the SET level: Jaccard overlap "
        "of each pair's distinct 3-gram vocabularies (cross_source_dups "
        "counts near-dup DOC pairs; this asks whether two feeds draw "
        "from the same underlying text at all). Shingle-key join over "
        "per-(source, shingle) distinct rows — the pair space is "
        "|sources|^2, never documents^2.",
    builder=_source_overlap,
    oracle_sql_str="""
        WITH sh AS (
          SELECT DISTINCT source, unnest(list_distinct(list_transform(
                 range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
                 i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))))
               AS shingle
          FROM documents
        ),
        sizes AS (SELECT source, COUNT(*) AS n FROM sh GROUP BY source),
        inter AS (
          SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_inter
          FROM sh a JOIN sh b
            ON a.shingle = b.shingle AND a.source < b.source
          GROUP BY a.source, b.source
        )
        SELECT i.src_a, i.src_b, CAST(i.n_inter AS BIGINT) AS n_inter,
               CAST((i.n_inter * 20000 + (sa.n + sb.n - i.n_inter))
                    // (2 * (sa.n + sb.n - i.n_inter)) AS DOUBLE) / 10000
                 AS jaccard
        FROM inter i
        JOIN sizes sa ON sa.source = i.src_a
        JOIN sizes sb ON sb.source = i.src_b
        ORDER BY i.src_a, i.src_b
    """,
))


def _val_coverage(spark, sf):
    from ..operators.curation import hash_split
    from ..operators.ngrams import word_ngrams
    from ..operators.text import frac4

    docs = hash_split(load_table(spark, sf, "documents"))
    grams = lambda d: d.select(  # noqa: E731
        "doc_id",
        F.explode(
            F.array_distinct(word_ngrams(F.col("text"), 5, lowercase=True))
        ).alias("gram"),
    )
    train_grams = (
        grams(docs.filter(F.col("split") == "train")).select("gram").distinct()
    )
    vg = grams(docs.filter(F.col("split") == "val"))
    covered = (
        vg.join(train_grams, "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_covered"))
    )
    totals = vg.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    return (
        totals.join(covered, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_grams").cast("long").alias("n_grams"),
            F.coalesce("n_covered", F.lit(0)).cast("long").alias("n_covered"),
            frac4(
                F.coalesce("n_covered", F.lit(0)), F.col("n_grams")
            ).alias("coverage"),
        )
        .orderBy("doc_id")
    )


Q(QuerySpec(
    name="pl_val_coverage",
    doc="Train->val n-gram coverage under the deterministic md5 split: "
        "per val doc, the share of its distinct 5-grams also present "
        "anywhere in the train split — the memorization-risk / "
        "generalization-gap audit (high coverage means val mostly "
        "re-tests training text). Gram-key semi-join, no pair "
        "expansion; composes hash_split + the decontaminate gram "
        "algebra.",
    builder=_val_coverage,
    oracle_sql_str="""
        WITH split AS (
          SELECT doc_id, text,
                 CASE
                   WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccd'
                     THEN 'train'
                   WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666'
                     THEN 'val'
                   ELSE 'test'
                 END AS split
          FROM documents
        ), g AS (
          SELECT doc_id, split, unnest(list_distinct(list_transform(
                 range(1, greatest(len(string_split(lower(text), ' ')) - 4,
                                   0) + 1),
                 i -> array_to_string(
                     string_split(lower(text), ' ')[i:i+4], ' '))))
               AS gram
          FROM split
        ),
        tg AS (SELECT DISTINCT gram FROM g WHERE split = 'train'),
        vg AS (SELECT doc_id, gram FROM g WHERE split = 'val'),
        cov AS (
          SELECT doc_id, COUNT(*) AS n_covered
          FROM vg WHERE gram IN (SELECT gram FROM tg)
          GROUP BY doc_id
        ),
        tot AS (
          SELECT doc_id, COUNT(*) AS n_grams FROM vg GROUP BY doc_id
        )
        SELECT t.doc_id, CAST(t.n_grams AS BIGINT) AS n_grams,
               CAST(COALESCE(c.n_covered, 0) AS BIGINT) AS n_covered,
               CAST((COALESCE(c.n_covered, 0) * 20000 + t.n_grams)
                    // (2 * t.n_grams) AS DOUBLE) / 10000 AS coverage
        FROM tot t LEFT JOIN cov c ON c.doc_id = t.doc_id
        ORDER BY t.doc_id
    """,
))


Q(QuerySpec(
    name="pl_jl_project",
    doc="Johnson-Lindenstrauss 64->16 reduction with the md5-derived "
        "Achlioptas sign matrix (operators/similarity.py:jl_project) — "
        "in-row left-fold sums make the float accumulation order "
        "engine-identical, so a random-projection operator carries a "
        "full oracle hash. Map-only; narrow (vec_id, dim, value) rows.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.similarity", fromlist=["jl_project"]
    ).jl_project(load_table(spark, sf, "embeddings"), out_dims=16)
    .orderBy("vec_id", "dim"),
    oracle_sql_str="""
        SELECT vec_id, CAST(j AS INT) AS dim,
               ROUND(list_reduce(list_transform(range(1, 65),
                     i -> CAST(embedding[i] AS DOUBLE) *
                          CASE WHEN substr(md5((i-1)::VARCHAR || '_'
                                               || j::VARCHAR), 1, 1) < '8'
                               THEN 1.0 ELSE -1.0 END),
                     (a, b) -> a + b) / 4.0, 4) + 0.0 AS value
        FROM embeddings, range(0, 16) t(j)
        ORDER BY vec_id, dim
    """,
))


Q(QuerySpec(
    name="pl_bloom_decontaminate",
    doc="Bloom-filter decontamination scale path (operators/curation.py:"
        "bloom_decontaminate): eval 5-grams folded into a broadcast 2^20-bit "
        "Bloom array, train grams probed MAP-ONLY (one array-literal "
        "element_at fold, zero shuffle), only survivors enter the exact "
        "verify semi-join — so the corpus-sized shuffle of the exact tier "
        "shrinks to ~contamination size. No false negatives + exact verify "
        "=> output is bit-identical to pl_decontaminate; the two tiers "
        "share one oracle (prune-never-loses, the trigram-index pattern).",
    builder=lambda spark, sf: _curation().bloom_decontaminate(
        load_table(spark, sf, "documents").filter(F.col("source") != "src0"),
        load_table(spark, sf, "documents").filter(F.col("source") == "src0"),
        n=5,
    ).select("doc_id").orderBy("doc_id"),
    oracle_sql_str="""
        WITH g AS (
          SELECT doc_id, source, unnest(list_distinct(list_transform(
                 range(1, greatest(len(string_split(lower(text), ' ')) - 4,
                                   0) + 1),
                 i -> array_to_string(
                     string_split(lower(text), ' ')[i:i+4], ' '))))
               AS gram
          FROM documents
        ),
        ev AS (SELECT DISTINCT gram FROM g WHERE source = 'src0'),
        bad AS (SELECT DISTINCT doc_id FROM g
                WHERE source <> 'src0' AND gram IN (SELECT gram FROM ev))
        SELECT doc_id FROM documents
        WHERE source <> 'src0' AND doc_id NOT IN (SELECT doc_id FROM bad)
        ORDER BY doc_id
    """,
))


Q(QuerySpec(
    name="pl_pagerank",
    doc="Integer-exact PageRank (operators/graph_rank.py:pagerank_int) "
        "over the symmetrized customer-supplier purchase graph (distinct "
        "(o_custkey, l_suppkey) pairs, both directions so outdeg >= 1 "
        "everywhere). 3 power iterations, each ONE rank⋈edges shuffle + "
        "ONE by-dst aggregation — the Pregel shape as DataFrames. Scaled-"
        "BIGINT truncating arithmetic makes the fixed-point iteration "
        "bit-identical across engines: the oracle unrolls the identical "
        "iterations as chained CTEs and the hash matches.",
    builder=lambda spark, sf: (lambda e0: __import__(
        "adenhq_hive_spark.operators.graph_rank", fromlist=["pagerank_int"]
    ).pagerank_int(
        e0.union(e0.select(F.col("dst").alias("src"),
                           F.col("src").alias("dst"))),
        iterations=3,
    ).orderBy("node"))(
        load_table(spark, sf, "orders")
        .join(
            load_table(spark, sf, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string"))
            .alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string"))
            .alias("dst"),
        )
        .distinct()
    ),
    oracle_sql_str="""
        WITH e0 AS (
          SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                          's' || CAST(l_suppkey AS VARCHAR) AS dst
          FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        ),
        e AS (SELECT src, dst FROM e0
              UNION ALL SELECT dst AS src, src AS dst FROM e0),
        nodes AS (SELECT DISTINCT src AS node FROM e),
        cnt AS (SELECT COUNT(*) AS n FROM nodes),
        deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
        pr0 AS (SELECT node, (1000000000000 // n) AS r
                FROM nodes CROSS JOIN cnt),
        m1 AS (SELECT e.dst AS node, CAST(SUM(p.r // deg.d) AS BIGINT) AS m
               FROM e JOIN pr0 p ON e.src = p.node
                      JOIN deg ON e.src = deg.src
               GROUP BY e.dst),
        pr1 AS (SELECT nodes.node,
                       (15 * (1000000000000 // cnt.n)) // 100
                       + (85 * COALESCE(m1.m, 0)) // 100 AS r
                FROM nodes CROSS JOIN cnt
                LEFT JOIN m1 ON nodes.node = m1.node),
        m2 AS (SELECT e.dst AS node, CAST(SUM(p.r // deg.d) AS BIGINT) AS m
               FROM e JOIN pr1 p ON e.src = p.node
                      JOIN deg ON e.src = deg.src
               GROUP BY e.dst),
        pr2 AS (SELECT nodes.node,
                       (15 * (1000000000000 // cnt.n)) // 100
                       + (85 * COALESCE(m2.m, 0)) // 100 AS r
                FROM nodes CROSS JOIN cnt
                LEFT JOIN m2 ON nodes.node = m2.node),
        m3 AS (SELECT e.dst AS node, CAST(SUM(p.r // deg.d) AS BIGINT) AS m
               FROM e JOIN pr2 p ON e.src = p.node
                      JOIN deg ON e.src = deg.src
               GROUP BY e.dst),
        pr3 AS (SELECT nodes.node,
                       (15 * (1000000000000 // cnt.n)) // 100
                       + (85 * COALESCE(m3.m, 0)) // 100 AS r
                FROM nodes CROSS JOIN cnt
                LEFT JOIN m3 ON nodes.node = m3.node)
        SELECT node, r AS rank_scaled FROM pr3 ORDER BY node
    """,
))


Q(QuerySpec(
    name="pl_zorder",
    doc="Z-order clustering math (operators/zorder.py): 16-bit Morton "
        "interleave of (user_id, floor(value)) via magic-mask bit "
        "spreading — pure JVM &/|/fixed-shift expressions, map-only. The "
        "rollup groups by the Z-curve cell (zkey >> 8) and reports each "
        "cell's x/y bounding box: the hash proves every cell covers a "
        "bounded RECTANGLE (<= 16x16), i.e. range-partitioning by zkey "
        "gives files whose parquet min/max stats prune on BOTH columns "
        "(Delta OPTIMIZE ZORDER; layout writer = zorder_layout, "
        "per-partition bounds pinned in tests/test_zorder.py).",
    builder=lambda spark, sf: (lambda Z: (
        load_table(spark, sf, "events")
        .select(
            F.col("user_id").alias("x"),
            F.floor("value").cast("long").alias("y"),
        )
        .withColumn("zkey", Z.morton_key(F.col("x"), F.col("y")))
        .groupBy(F.shiftright("zkey", 8).alias("zbucket"))
        .agg(
            F.count("*").alias("n"),
            F.min("x").alias("x_min"), F.max("x").alias("x_max"),
            F.min("y").alias("y_min"), F.max("y").alias("y_max"),
        )
        .orderBy("zbucket")
    ))(__import__("adenhq_hive_spark.operators.zorder",
                  fromlist=["morton_key"])),
    oracle_sql_str="""
        WITH base AS (
          SELECT user_id AS x, CAST(floor(value) AS BIGINT) AS y
          FROM events
        ),
        s1 AS (SELECT x, y, x & 65535 AS a, y & 65535 AS b FROM base),
        s2 AS (SELECT x, y, (a | (a << 8)) & 16711935 AS a,
                            (b | (b << 8)) & 16711935 AS b FROM s1),
        s3 AS (SELECT x, y, (a | (a << 4)) & 252645135 AS a,
                            (b | (b << 4)) & 252645135 AS b FROM s2),
        s4 AS (SELECT x, y, (a | (a << 2)) & 858993459 AS a,
                            (b | (b << 2)) & 858993459 AS b FROM s3),
        s5 AS (SELECT x, y, (a | (a << 1)) & 1431655765 AS a,
                            (b | (b << 1)) & 1431655765 AS b FROM s4),
        z AS (SELECT x, y, a | (b << 1) AS zkey FROM s5)
        SELECT zkey >> 8 AS zbucket, COUNT(*) AS n,
               MIN(x) AS x_min, MAX(x) AS x_max,
               MIN(y) AS y_min, MAX(y) AS y_max
        FROM z GROUP BY zbucket ORDER BY zbucket
    """,
))


Q(QuerySpec(
    name="pl_hll_registers",
    doc="Engine-portable HyperLogLog register table over o_custkey "
        "(operators/sketch.py:hll_registers — Flajolet 2007): register = "
        "md5-slice mod 64, rho = 1 + leading zeros of the next 32-bit "
        "slice via bin()-length (identical on DuckDB), dense 64 rows with "
        "empty registers at rho_max 0. The md5-portable twin of the "
        "production approx_count_distinct tier (pl_approx_distinct), same "
        "pattern as pl_minhash_portable: the sketch ALGEBRA carries a "
        "full oracle hash. One GROUP BY shuffle of 64 keys; MAX is the "
        "merge, so partial aggregation does the map-side combine.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.sketch", fromlist=["hll_registers"]
    ).hll_registers(load_table(spark, sf, "orders"), "o_custkey")
    .orderBy("register"),
    oracle_sql_str="""
        WITH h AS (
          SELECT md5(CAST(o_custkey AS VARCHAR)) AS h FROM orders
        ),
        rw AS (
          SELECT CAST(('0x' || substr(h, 1, 8)) AS BIGINT) % 64
                   AS register,
                 CAST(('0x' || substr(h, 9, 8)) AS BIGINT) AS w
          FROM h
        ),
        rho AS (
          SELECT register,
                 CASE WHEN w = 0 THEN 33 ELSE 33 - length(bin(w)) END
                   AS rho
          FROM rw
        ),
        got AS (SELECT register, MAX(rho) AS rho_max FROM rho
                GROUP BY register)
        SELECT r.range AS register,
               CAST(COALESCE(got.rho_max, 0) AS BIGINT) AS rho_max
        FROM range(0, 64) r LEFT JOIN got ON r.range = got.register
        ORDER BY register
    """,
))


Q(QuerySpec(
    name="pl_hll_estimate",
    doc="Raw HLL distinct estimate in exact integer arithmetic "
        "(operators/sketch.py:hll_estimate): S = sum over all 64 "
        "registers of 2^(33-rho) is an exact BIGINT, estimate = "
        "(709*m^2*2^33) DIV (1000*S) — alpha as the integer ratio "
        "709/1000, division truncating on both engines, so a "
        "probabilistic cardinality sketch produces a bit-reproducible "
        "value. n_exact rides along; the test gates |est-exact| within "
        "the m=64 error envelope.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.sketch", fromlist=["hll_estimate"]
    ).hll_estimate(load_table(spark, sf, "orders"), "o_custkey"),
    oracle_sql_str="""
        WITH h AS (
          SELECT md5(CAST(o_custkey AS VARCHAR)) AS h FROM orders
        ),
        rw AS (
          SELECT CAST(('0x' || substr(h, 1, 8)) AS BIGINT) % 64
                   AS register,
                 CAST(('0x' || substr(h, 9, 8)) AS BIGINT) AS w
          FROM h
        ),
        rho AS (
          SELECT register,
                 CASE WHEN w = 0 THEN 33 ELSE 33 - length(bin(w)) END
                   AS rho
          FROM rw
        ),
        got AS (SELECT register, MAX(rho) AS rho_max FROM rho
                GROUP BY register),
        dense AS (
          SELECT r.range AS register, COALESCE(got.rho_max, 0) AS rho_max
          FROM range(0, 64) r LEFT JOIN got ON r.range = got.register
        ),
        s AS (SELECT CAST(SUM(CAST(1 AS BIGINT) << (33 - rho_max))
                   AS BIGINT) AS s
              FROM dense),
        ex AS (SELECT COUNT(DISTINCT o_custkey) AS n_exact FROM orders)
        SELECT 64 AS n_registers,
               (709 * 64 * 64 * CAST(8589934592 AS BIGINT))
                 // (1000 * s.s) AS estimate,
               ex.n_exact
        FROM s CROSS JOIN ex
    """,
))


Q(QuerySpec(
    name="pl_int8_quant",
    doc="Symmetric per-vector int8 quantization of the embeddings table "
        "(operators/similarity.py:int8_quantize) — the FAISS-SQ8 4x "
        "compression for ANN serving: q = floor(v*127/max|v|), per-vector "
        "scale retained. floor-not-round discipline keeps the lossy code "
        "bit-identical across engines (pl_phash_portable pattern), so a "
        "quantizer carries a full oracle hash. Map-only, zero shuffle, "
        "narrow (id, dim, q, scale) rows.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.similarity", fromlist=["int8_quantize"]
    ).int8_quantize(load_table(spark, sf, "embeddings"))
    .orderBy("vec_id", "dim"),
    oracle_sql_str="""
        WITH m AS (
          SELECT vec_id, embedding,
                 list_max(list_transform(embedding,
                          x -> abs(CAST(x AS DOUBLE)))) AS mx
          FROM embeddings
        )
        SELECT vec_id, CAST(i - 1 AS INT) AS dim,
               CASE WHEN mx = 0 THEN 0
                    ELSE CAST(floor(CAST(embedding[i] AS DOUBLE)
                                    * 127 / mx) AS BIGINT)
               END AS q,
               ROUND(mx, 4) AS scale
        FROM m CROSS JOIN range(1, 65) t(i)
        ORDER BY vec_id, dim
    """,
))


Q(QuerySpec(
    name="pl_copurchase_lift",
    doc="Market-basket association mining (operators/basket.py:"
        "copurchase_lift — the pairwise/2-itemset Apriori tier): parts "
        "co-occurring in >= 2 orders with exact ppm-scaled lift. Pair "
        "space comes from a self-join ON THE BASKET KEY (cost sum of "
        "basket^2, never |items|^2), mega-baskets capped before the join "
        "(max_shingle_df discipline; testdata max basket 17 << 64 so the "
        "capless oracle hashes identically); lift stays in integer "
        "arithmetic: support * n_baskets * 1e6 DIV (n_a * n_b).",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.basket", fromlist=["copurchase_lift"]
    ).copurchase_lift(
        load_table(spark, sf, "lineitem"), "l_orderkey", "l_partkey",
        min_support=2,
    ).orderBy("item_a", "item_b"),
    oracle_sql_str="""
        WITH items AS (
          SELECT DISTINCT l_orderkey AS b, l_partkey AS item FROM lineitem
        ),
        nb AS (SELECT COUNT(DISTINCT b) AS n_baskets FROM items),
        item_n AS (SELECT item, COUNT(*) AS item_n FROM items
                   GROUP BY item),
        pairs AS (
          SELECT a.item AS item_a, b.item AS item_b,
                 COUNT(*) AS support
          FROM items a JOIN items b
            ON a.b = b.b AND a.item < b.item
          GROUP BY 1, 2
          HAVING COUNT(*) >= 2
        )
        SELECT p.item_a, p.item_b, p.support,
               (p.support * nb.n_baskets * CAST(1000000 AS BIGINT))
                 // (na.item_n * nbc.item_n) AS lift_ppm
        FROM pairs p
        JOIN item_n na ON na.item = p.item_a
        JOIN item_n nbc ON nbc.item = p.item_b
        CROSS JOIN nb
        ORDER BY item_a, item_b
    """,
))


Q(QuerySpec(
    name="pl_psi_drift",
    doc="Population Stability Index per source vs the rest of the corpus "
        "over 10 equal-width n_chars buckets (operators/profile.py:"
        "psi_drift) — the model-monitoring drift score complementing the "
        "rank-sensitive KS tier (pl_ks_drift). Integer-exact bucketing, "
        "add-one smoothing, and an order-fixed in-row fold for the "
        "double sum so the score hashes identically across engines. "
        "One count agg + one bucket rollup, no windows.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.profile", fromlist=["psi_drift"]
    ).psi_drift(load_table(spark, sf, "documents")),
    oracle_sql_str="""
        WITH bounds AS (
          SELECT MIN(n_chars) AS vmin, MAX(n_chars) AS vmax FROM documents
        ),
        b AS (
          SELECT source,
                 ((n_chars - vmin) * 10) // (vmax - vmin + 1) AS bucket
          FROM documents CROSS JOIN bounds
        ),
        counts AS (SELECT source, bucket, COUNT(*) AS c FROM b
                   GROUP BY 1, 2),
        grid AS (
          SELECT g.source, t.range AS bucket
          FROM (SELECT DISTINCT source FROM counts) g
          CROSS JOIN range(0, 10) t
        ),
        dense AS (
          SELECT grid.source, grid.bucket,
                 CAST(COALESCE(counts.c, 0) AS BIGINT) AS c
          FROM grid LEFT JOIN counts
            ON grid.source = counts.source AND grid.bucket = counts.bucket
        ),
        btot AS (SELECT bucket, CAST(SUM(c) AS BIGINT) AS c_all
                 FROM dense GROUP BY bucket),
        tot AS (SELECT source, COUNT(*) AS n_g FROM documents
                GROUP BY source),
        nt AS (SELECT COUNT(*) AS n FROM documents),
        terms AS (
          SELECT d.source, d.bucket, tot.n_g,
                 (CAST(d.c + 1 AS DOUBLE) / (tot.n_g + 10)
                  - CAST(btot.c_all - d.c + 1 AS DOUBLE)
                    / (nt.n - tot.n_g + 10))
                 * ln((CAST(d.c + 1 AS DOUBLE) / (tot.n_g + 10))
                      / (CAST(btot.c_all - d.c + 1 AS DOUBLE)
                         / (nt.n - tot.n_g + 10))) AS term
          FROM dense d
          JOIN btot ON d.bucket = btot.bucket
          JOIN tot ON d.source = tot.source
          CROSS JOIN nt
        )
        SELECT source, CAST(MIN(n_g) AS BIGINT) AS n_docs,
               ROUND(list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE),
                                list(term ORDER BY bucket)),
                   (a, x) -> a + x), 4) AS psi
        FROM terms
        GROUP BY source
        ORDER BY source
    """,
))


Q(QuerySpec(
    name="pl_ewma",
    doc="Trailing exponentially-decayed moving average of event value "
        "per user (decay 0.9, lookback 8) — the time-series feature-"
        "engineering primitive for event-stream training features. "
        "Single-form portable SQL: unrolled LAG terms with exact-"
        "rational weight literals (9^k/10^k — identical IEEE division "
        "on both engines) in a fixed left-to-right addition order, "
        "partial-window starts renormalized by the weight mass of the "
        "available lags. Named WINDOW clause exercised on both engines; "
        "partitioned window only — no global ordering.",
    engine_sql="""
        SELECT event_id, user_id,
               ROUND(((CAST(1 AS DOUBLE) / 1) * COALESCE(value, 0.0)
                 + (CAST(9 AS DOUBLE) / 10) * COALESCE(LAG(value, 1) OVER w, 0.0)
                 + (CAST(81 AS DOUBLE) / 100) * COALESCE(LAG(value, 2) OVER w, 0.0)
                 + (CAST(729 AS DOUBLE) / 1000) * COALESCE(LAG(value, 3) OVER w, 0.0)
                 + (CAST(6561 AS DOUBLE) / 10000) * COALESCE(LAG(value, 4) OVER w, 0.0)
                 + (CAST(59049 AS DOUBLE) / 100000) * COALESCE(LAG(value, 5) OVER w, 0.0)
                 + (CAST(531441 AS DOUBLE) / 1000000) * COALESCE(LAG(value, 6) OVER w, 0.0)
                 + (CAST(4782969 AS DOUBLE) / 10000000) * COALESCE(LAG(value, 7) OVER w, 0.0))
                 / ((CAST(1 AS DOUBLE) / 1) * (CASE WHEN value IS NOT NULL THEN 1.0 ELSE 0.0 END)
                 + (CAST(9 AS DOUBLE) / 10) * (CASE WHEN LAG(value, 1) OVER w IS NOT NULL THEN 1.0 ELSE 0.0 END)
                 + (CAST(81 AS DOUBLE) / 100) * (CASE WHEN LAG(value, 2) OVER w IS NOT NULL THEN 1.0 ELSE 0.0 END)
                 + (CAST(729 AS DOUBLE) / 1000) * (CASE WHEN LAG(value, 3) OVER w IS NOT NULL THEN 1.0 ELSE 0.0 END)
                 + (CAST(6561 AS DOUBLE) / 10000) * (CASE WHEN LAG(value, 4) OVER w IS NOT NULL THEN 1.0 ELSE 0.0 END)
                 + (CAST(59049 AS DOUBLE) / 100000) * (CASE WHEN LAG(value, 5) OVER w IS NOT NULL THEN 1.0 ELSE 0.0 END)
                 + (CAST(531441 AS DOUBLE) / 1000000) * (CASE WHEN LAG(value, 6) OVER w IS NOT NULL THEN 1.0 ELSE 0.0 END)
                 + (CAST(4782969 AS DOUBLE) / 10000000) * (CASE WHEN LAG(value, 7) OVER w IS NOT NULL THEN 1.0 ELSE 0.0 END)), 4) AS ewma
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY user_id, event_id
        LIMIT 2000
    """,
))


Q(QuerySpec(
    name="pl_hll_by_source",
    doc="Per-source distinct-word estimate via the portable HLL "
        "(operators/sketch.py:hll_estimate_grouped) — the vocabulary-"
        "size governance rollup at sketch cost: one (source, register) "
        "aggregation regardless of vocabulary size, vs the exact "
        "count-distinct's full word shuffle. Same md5/bin register "
        "algebra and integer estimator as pl_hll_estimate, so the "
        "grouped sketch carries a full oracle hash; n_exact rides "
        "along as the accuracy column.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.sketch",
        fromlist=["hll_estimate_grouped"],
    ).hll_estimate_grouped(
        load_table(spark, sf, "documents").select(
            "source",
            F.explode(F.split(F.lower("text"), " ")).alias("word"),
        ),
        "word",
        "source",
    ),
    oracle_sql_str="""
        WITH words AS (
          SELECT source, unnest(string_split(lower(text), ' ')) AS word
          FROM documents
        ),
        h AS (SELECT source, md5(CAST(word AS VARCHAR)) AS h FROM words),
        rw AS (
          SELECT source,
                 CAST(('0x' || substr(h, 1, 8)) AS BIGINT) % 64
                   AS register,
                 CAST(('0x' || substr(h, 9, 8)) AS BIGINT) AS w
          FROM h
        ),
        rho AS (
          SELECT source, register,
                 CASE WHEN w = 0 THEN 33 ELSE 33 - length(bin(w)) END
                   AS rho
          FROM rw
        ),
        got AS (SELECT source, register, MAX(rho) AS rho_max FROM rho
                GROUP BY source, register),
        grid AS (
          SELECT g.source, t.range AS register
          FROM (SELECT DISTINCT source FROM documents) g
          CROSS JOIN range(0, 64) t
        ),
        dense AS (
          SELECT grid.source, grid.register,
                 COALESCE(got.rho_max, 0) AS rho_max
          FROM grid LEFT JOIN got
            ON grid.source = got.source AND grid.register = got.register
        ),
        s AS (SELECT source,
                     CAST(SUM(CAST(1 AS BIGINT) << (33 - rho_max))
                          AS BIGINT) AS s
              FROM dense GROUP BY source),
        ex AS (SELECT source AS ex_source, COUNT(DISTINCT word) AS n_exact
               FROM words GROUP BY source)
        SELECT s.source,
               (709 * 64 * 64 * CAST(8589934592 AS BIGINT))
                 // (1000 * s.s) AS estimate,
               ex.n_exact
        FROM s JOIN ex ON s.source = ex.ex_source
        ORDER BY source
    """,
))


Q(QuerySpec(
    name="pl_es_sample",
    doc="Exact-k weighted sampling without replacement, 20 docs per "
        "source weighted by n_chars (operators/curation.py:"
        "es_weighted_sample_k — Efraimidis-Spirakis 2006 A-ES keys "
        "ln(u)/w with the md5-derived u, so the draw is reproducible "
        "across engines and the SAMPLE ITSELF is oracle-hashable). "
        "Completes the sampling tier: Bernoulli-weighted "
        "(pl_weighted_sample), exact-k stratified (pl_stratified_"
        "sample), now exact-k weighted. One partitioned window.",
    builder=lambda spark, sf: _curation().es_weighted_sample_k(
        load_table(spark, sf, "documents"),
        k=20, weight_col="n_chars", group_col="source",
    ).select(
        "source", "doc_id", "rank",
        F.round("es_key", 6).alias("es_key_r6"),
    ).orderBy("source", "rank"),
    oracle_sql_str="""
        WITH keyed AS (
          SELECT source, doc_id,
                 ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                          1, 12)) AS BIGINT) + 1.0)
                    / 281474976710656.0)
                 / CAST(n_chars AS DOUBLE) AS es_key
          FROM documents
          -- A-ES is defined for w > 0 only; the operator drops
          -- NULL/non-positive weights (curation.py es_weighted_sample_k),
          -- so the oracle must encode the same contract or a w<=0 row
          -- would rank first here while Spark excludes it.
          WHERE n_chars IS NOT NULL AND n_chars > 0
        ),
        ranked AS (
          SELECT source, doc_id, es_key,
                 ROW_NUMBER() OVER (PARTITION BY source
                                    ORDER BY es_key DESC, doc_id)
                   AS rank
          FROM keyed
        )
        SELECT source, doc_id, CAST(rank AS INT) AS rank,
               ROUND(es_key, 6) AS es_key_r6
        FROM ranked WHERE rank <= 20
        ORDER BY source, rank
    """,
))


Q(QuerySpec(
    name="pl_ppr",
    doc="Personalized PageRank from the s_suppkey<=3 supplier cohort "
        "over "
        "the symmetrized purchase graph (operators/graph_rank.py:"
        "personalized_pagerank_int — random walk with restart, "
        "Haveliwala 2002): teleport mass returns only to the seed set, "
        "so rank = proximity to the cohort (the similar-items / "
        "customer-affinity recommendation primitive). Same scaled-"
        "BIGINT exact iteration as pl_pagerank; oracle = 3 unrolled "
        "CTE iterations with the seed-cased teleport.",
    builder=lambda spark, sf: (lambda gr, e0: gr.personalized_pagerank_int(
        e0.union(e0.select(F.col("dst").alias("src"),
                           F.col("src").alias("dst"))),
        load_table(spark, sf, "supplier")
        .filter(F.col("s_suppkey") <= 3)
        .select(F.concat(F.lit("s"), F.col("s_suppkey").cast("string"))
                .alias("node")),
        iterations=3,
    ).orderBy("node"))(
        __import__("adenhq_hive_spark.operators.graph_rank",
                   fromlist=["personalized_pagerank_int"]),
        load_table(spark, sf, "orders")
        .join(load_table(spark, sf, "lineitem"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string"))
            .alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string"))
            .alias("dst"),
        )
        .distinct(),
    ),
    oracle_sql_str="""
        WITH e0 AS (
          SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                          's' || CAST(l_suppkey AS VARCHAR) AS dst
          FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        ),
        e AS (SELECT src, dst FROM e0
              UNION ALL SELECT dst AS src, src AS dst FROM e0),
        nodes AS (SELECT DISTINCT src AS node FROM e),
        sd AS (
          SELECT DISTINCT 's' || CAST(s_suppkey AS VARCHAR) AS node
          FROM supplier WHERE s_suppkey <= 3
        ),
        sd2 AS (SELECT sd.node FROM sd JOIN nodes USING (node)),
        ns AS (SELECT COUNT(*) AS n FROM sd2),
        deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
        pr0 AS (
          SELECT nodes.node,
                 CASE WHEN sd2.node IS NOT NULL
                      THEN (1000000000000 // ns.n) ELSE 0 END AS r
          FROM nodes CROSS JOIN ns
          LEFT JOIN sd2 ON nodes.node = sd2.node),
        m1 AS (SELECT e.dst AS node,
                      CAST(SUM(p.r // deg.d) AS BIGINT) AS m
               FROM e JOIN pr0 p ON e.src = p.node
                      JOIN deg ON e.src = deg.src
               GROUP BY e.dst),
        pr1 AS (
          SELECT nodes.node,
                 CASE WHEN sd2.node IS NOT NULL
                      THEN (15 * (1000000000000 // ns.n)) // 100
                      ELSE 0 END
                 + (85 * COALESCE(m1.m, 0)) // 100 AS r
          FROM nodes CROSS JOIN ns
          LEFT JOIN sd2 ON nodes.node = sd2.node
          LEFT JOIN m1 ON nodes.node = m1.node),
        m2 AS (SELECT e.dst AS node,
                      CAST(SUM(p.r // deg.d) AS BIGINT) AS m
               FROM e JOIN pr1 p ON e.src = p.node
                      JOIN deg ON e.src = deg.src
               GROUP BY e.dst),
        pr2 AS (
          SELECT nodes.node,
                 CASE WHEN sd2.node IS NOT NULL
                      THEN (15 * (1000000000000 // ns.n)) // 100
                      ELSE 0 END
                 + (85 * COALESCE(m2.m, 0)) // 100 AS r
          FROM nodes CROSS JOIN ns
          LEFT JOIN sd2 ON nodes.node = sd2.node
          LEFT JOIN m2 ON nodes.node = m2.node),
        m3 AS (SELECT e.dst AS node,
                      CAST(SUM(p.r // deg.d) AS BIGINT) AS m
               FROM e JOIN pr2 p ON e.src = p.node
                      JOIN deg ON e.src = deg.src
               GROUP BY e.dst),
        pr3 AS (
          SELECT nodes.node,
                 CASE WHEN sd2.node IS NOT NULL
                      THEN (15 * (1000000000000 // ns.n)) // 100
                      ELSE 0 END
                 + (85 * COALESCE(m3.m, 0)) // 100 AS r
          FROM nodes CROSS JOIN ns
          LEFT JOIN sd2 ON nodes.node = sd2.node
          LEFT JOIN m3 ON nodes.node = m3.node)
        SELECT node, r AS rank_scaled FROM pr3 ORDER BY node
    """,
))


Q(QuerySpec(
    name="pl_trend_slope",
    doc="Per-event-type ingest-volume trend: exact OLS slope over daily "
        "counts, all moments as BIGINT sums (x re-based to each type's "
        "first day so n*Sxx*1e6 stays far under 2^63) and only the "
        "final ratio divided — slope_ppm = (n*Sxy - Sx*Sy)*1e6 DIV "
        "(n*Sxx - Sx^2), NULLIF-guarded for single-day types on both "
        "engines. The is-this-source-growing governance signal with a "
        "full hash (regr_slope exists on both engines but accumulates "
        "doubles in engine-specific order — this formulation is "
        "order-free). Two aggregations, no windows.",
    engine_sql="""
        WITH daily AS (
          SELECT event_type,
                 CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01')
                      AS BIGINT) AS d,
                 COUNT(*) AS y
          FROM events
          GROUP BY event_type, CAST(ts AS DATE)
        ),
        based AS (
          SELECT event_type,
                 d - MIN(d) OVER (PARTITION BY event_type) AS x, y
          FROM daily
        ),
        mom AS (
          SELECT event_type,
                 COUNT(*) AS n,
                 SUM(x) AS sx, SUM(y) AS sy,
                 SUM(x * y) AS sxy, SUM(x * x) AS sxx
          FROM based
          GROUP BY event_type
        )
        SELECT event_type, n AS n_days,
               (n * sxy - sx * sy) * CAST(1000000 AS BIGINT)
                 DIV NULLIF(n * sxx - sx * sx, 0) AS slope_ppm
        FROM mom
        ORDER BY event_type
    """,
    oracle_sql_str="""
        WITH daily AS (
          SELECT event_type,
                 CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
                      AS BIGINT) AS d,
                 COUNT(*) AS y
          FROM events
          GROUP BY event_type, CAST(ts AS DATE)
        ),
        based AS (
          SELECT event_type,
                 d - MIN(d) OVER (PARTITION BY event_type) AS x, y
          FROM daily
        ),
        mom AS (
          SELECT event_type,
                 COUNT(*) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x * y) AS BIGINT) AS sxy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx
          FROM based
          GROUP BY event_type
        )
        SELECT event_type, n AS n_days,
               (n * sxy - sx * sy) * CAST(1000000 AS BIGINT)
                 // NULLIF(n * sxx - sx * sx, 0) AS slope_ppm
        FROM mom
        ORDER BY event_type
    """,
))


Q(QuerySpec(
    name="pl_itemsim",
    doc="Item-item collaborative filtering over order baskets "
        "(operators/basket.py:item_cosine_topk — Sarwar 2001, "
        "binarized): top-5 neighbors per part by co-occurrence cosine "
        "support/sqrt(n_a*n_b), symmetrized pair space from the "
        "basket-keyed self-join, PARTITIONED ranking window with "
        "rounded-score + id tiebreak so the neighbor table hashes "
        "identically across engines — the customers-also-bought table.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.basket", fromlist=["item_cosine_topk"]
    ).item_cosine_topk(
        load_table(spark, sf, "lineitem"), "l_orderkey", "l_partkey",
        k=5, min_support=2,
    ).orderBy("item_a", "rank"),
    oracle_sql_str="""
        WITH items AS (
          SELECT DISTINCT l_orderkey AS b, l_partkey AS item FROM lineitem
        ),
        item_n AS (SELECT item, COUNT(*) AS item_n FROM items
                   GROUP BY item),
        pairs AS (
          SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS support
          FROM items a JOIN items b ON a.b = b.b AND a.item < b.item
          GROUP BY 1, 2
          HAVING COUNT(*) >= 2
        ),
        sym AS (
          SELECT item_a, item_b, support FROM pairs
          UNION ALL
          SELECT item_b AS item_a, item_a AS item_b, support FROM pairs
        ),
        scored AS (
          SELECT s.item_a, s.item_b, s.support,
                 ROUND(CAST(s.support AS DOUBLE)
                       / sqrt(CAST(na.item_n AS DOUBLE)
                              * CAST(nb.item_n AS DOUBLE)), 4) AS cosine
          FROM sym s
          JOIN item_n na ON na.item = s.item_a
          JOIN item_n nb ON nb.item = s.item_b
        ),
        ranked AS (
          SELECT item_a, item_b, support, cosine,
                 ROW_NUMBER() OVER (PARTITION BY item_a
                                    ORDER BY cosine DESC, item_b)
                   AS rank
          FROM scored
        )
        SELECT item_a, item_b, support, cosine, CAST(rank AS INT) AS rank
        FROM ranked WHERE rank <= 5
        ORDER BY item_a, rank
    """,
))


Q(QuerySpec(
    name="pl_communities",
    doc="Deterministic label-propagation communities over the "
        "symmetrized purchase graph (operators/graph_rank.py:"
        "label_propagation — Raghavan 2007, synchronous min-label "
        "tiebreak so a classically-randomized algorithm is a pure "
        "function of the graph and hash-checkable; 2 rounds). "
        "Communities over similarity graphs = template families, the "
        "coarse grouping for dense near-dup graphs where connected "
        "components over-merge. One join + one count + one partitioned "
        "pick per round.",
    builder=lambda spark, sf: (lambda gr, e0: gr.label_propagation(
        e0.union(e0.select(F.col("dst").alias("src"),
                           F.col("src").alias("dst"))),
        iterations=2,
    ).orderBy("node"))(
        __import__("adenhq_hive_spark.operators.graph_rank",
                   fromlist=["label_propagation"]),
        load_table(spark, sf, "orders")
        .join(load_table(spark, sf, "lineitem"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string"))
            .alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string"))
            .alias("dst"),
        )
        .distinct(),
    ),
    oracle_sql_str="""
        WITH e0 AS (
          SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                          's' || CAST(l_suppkey AS VARCHAR) AS dst
          FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        ),
        e AS (SELECT src, dst FROM e0
              UNION ALL SELECT dst AS src, src AS dst FROM e0),
        nodes AS (SELECT DISTINCT src AS node FROM e),
        l0 AS (SELECT node, node AS label FROM nodes),
        c1 AS (SELECT e.dst AS node, l.label, COUNT(*) AS c
               FROM e JOIN l0 l ON e.src = l.node GROUP BY 1, 2),
        p1 AS (SELECT node, label FROM (
                 SELECT node, label,
                        ROW_NUMBER() OVER (PARTITION BY node
                                           ORDER BY c DESC, label) AS rn
                 FROM c1) WHERE rn = 1),
        l1 AS (SELECT n.node, COALESCE(p.label, n.node) AS label
               FROM nodes n LEFT JOIN p1 p ON n.node = p.node),
        c2 AS (SELECT e.dst AS node, l.label, COUNT(*) AS c
               FROM e JOIN l1 l ON e.src = l.node GROUP BY 1, 2),
        p2 AS (SELECT node, label FROM (
                 SELECT node, label,
                        ROW_NUMBER() OVER (PARTITION BY node
                                           ORDER BY c DESC, label) AS rn
                 FROM c2) WHERE rn = 1),
        l2 AS (SELECT n.node, COALESCE(p.label, n.node) AS label
               FROM nodes n LEFT JOIN p2 p ON n.node = p.node)
        SELECT node, label AS community FROM l2 ORDER BY node
    """,
))


Q(QuerySpec(
    name="pl_assoc_rules",
    doc="Directional association rules over order baskets "
        "(operators/basket.py:association_rules): confidence P(B|A) "
        "and lift as ppm-scaled exact integers, both directions of "
        "every min-support pair — the asymmetric half Apriori adds "
        "over raw co-occurrence (milk->bread != bread->milk). Rides "
        "the proven basket-keyed pair space.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.basket", fromlist=["association_rules"]
    ).association_rules(
        load_table(spark, sf, "lineitem"), "l_orderkey", "l_partkey",
        min_support=2,
    ).orderBy("antecedent", "consequent"),
    oracle_sql_str="""
        WITH items AS (
          SELECT DISTINCT l_orderkey AS b, l_partkey AS item FROM lineitem
        ),
        nb AS (SELECT COUNT(DISTINCT b) AS n_baskets FROM items),
        item_n AS (SELECT item, COUNT(*) AS item_n FROM items
                   GROUP BY item),
        pairs AS (
          SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS support
          FROM items a JOIN items b ON a.b = b.b AND a.item < b.item
          GROUP BY 1, 2
          HAVING COUNT(*) >= 2
        ),
        lifted AS (
          SELECT p.item_a, p.item_b, p.support,
                 (p.support * nb.n_baskets * CAST(1000000 AS BIGINT))
                   // (na.item_n * nbc.item_n) AS lift_ppm
          FROM pairs p
          JOIN item_n na ON na.item = p.item_a
          JOIN item_n nbc ON nbc.item = p.item_b
          CROSS JOIN nb
        ),
        sym AS (
          SELECT item_a AS antecedent, item_b AS consequent,
                 support, lift_ppm FROM lifted
          UNION ALL
          SELECT item_b AS antecedent, item_a AS consequent,
                 support, lift_ppm FROM lifted
        )
        SELECT s.antecedent, s.consequent, s.support,
               (s.support * CAST(1000000 AS BIGINT)) // na.item_n
                 AS conf_ppm,
               s.lift_ppm
        FROM sym s JOIN item_n na ON na.item = s.antecedent
        ORDER BY antecedent, consequent
    """,
))


Q(QuerySpec(
    name="pl_budget_fill",
    doc="Water-filling token-budget allocation across sources, budget = "
        "40% of corpus tokens (operators/curation.py:budget_waterfill): "
        "the unique level cap with sum(min(tokens_s, cap)) = B, found in "
        "an exact-integer closed form (ordered prefix sums, boundary "
        "rank, DIV + remainder distribution) so allocations sum to "
        "EXACTLY B and the whole mixture plan is engine-portable. The "
        "allocation side of temperature sampling — 'no crawl dominates "
        "the mix'. One corpus groupBy; everything else on the "
        "|sources|-row rollup.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.curation",
        fromlist=["budget_waterfill"],
    ).budget_waterfill(
        load_table(spark, sf, "documents"), budget_ppm=400_000
    ),
    oracle_sql_str="""
        WITH per AS (
          SELECT source AS grp,
                 CAST(SUM(len(list_filter(string_split(text, ' '),
                                          t -> t <> ''))) AS BIGINT)
                   AS n_tokens
          FROM documents GROUP BY source
        ),
        ordered AS (
          SELECT *, ROW_NUMBER() OVER (ORDER BY n_tokens, grp) AS rn,
                 CAST(SUM(n_tokens) OVER (ORDER BY n_tokens, grp
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS prefix
          FROM per
        ),
        tot AS (SELECT COUNT(*) AS n_src,
                       CAST(SUM(n_tokens) * 400000 // 1000000 AS BIGINT)
                         AS b
                FROM per),
        flagged AS (
          SELECT o.*, t.n_src, t.b,
                 (o.prefix - o.n_tokens)
                   + (t.n_src - o.rn + 1) * o.n_tokens > t.b AS over
          FROM ordered o CROSS JOIN tot t
        ),
        boundary AS (
          SELECT MIN(rn) AS k,
                 ARG_MIN(prefix - n_tokens, rn) AS prefix_k1
          FROM flagged WHERE over
        )
        SELECT f.grp AS source, f.n_tokens,
               CAST(CASE WHEN bd.k IS NULL OR f.rn < bd.k
                         THEN f.n_tokens
                    ELSE (f.b - bd.prefix_k1) // (f.n_src - bd.k + 1)
                         + CASE WHEN f.rn - bd.k <
                                  (f.b - bd.prefix_k1)
                                    % (f.n_src - bd.k + 1)
                                THEN 1 ELSE 0 END
               END AS BIGINT) AS alloc_tokens,
               (bd.k IS NOT NULL AND f.rn >= bd.k) AS capped
        FROM flagged f CROSS JOIN boundary bd
        ORDER BY source
    """,
))


Q(QuerySpec(
    name="pl_quantile_norm",
    doc="Cross-source quantile normalization of n_chars (operators/"
        "curation.py:quantile_normalize): each doc's score becomes the "
        "GLOBAL score at its within-source percentile (integer-ppm rank "
        "-> nearest-rank lookup), making heterogeneous per-source score "
        "scales comparable before one corpus-wide threshold — the CCNet "
        "per-bucket idea generalized. Global rank via the distributed "
        "exact_rank plan, not a single-partition window; full oracle "
        "hash (all integer arithmetic).",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.curation",
        fromlist=["quantile_normalize"],
    ).quantile_normalize(
        load_table(spark, sf, "documents"), score_col="n_chars"
    ),
    oracle_sql_str="""
        WITH s AS (
          SELECT doc_id, source, CAST(n_chars AS BIGINT) AS score
          FROM documents
        ),
        g AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                       ORDER BY score, doc_id) AS rn_g,
                 COUNT(*) OVER (PARTITION BY source) AS cnt_g
          FROM s
        ),
        r AS (
          SELECT *, CAST(CASE WHEN cnt_g > 1
                              THEN (rn_g - 1) * 1000000 // (cnt_g - 1)
                              ELSE 500000 END AS BIGINT) AS r_ppm
          FROM g
        ),
        gl AS (
          SELECT score AS norm_score,
                 ROW_NUMBER() OVER (ORDER BY score, doc_id) AS rn_glob
          FROM s
        ),
        n AS (SELECT COUNT(*) AS n_tot FROM s)
        SELECT r.doc_id, r.source, r.score, gl.norm_score
        FROM r CROSS JOIN n
        JOIN gl ON gl.rn_glob =
                   1 + (r.r_ppm * (n.n_tot - 1)) // 1000000
        ORDER BY r.doc_id
    """,
))


Q(QuerySpec(
    name="pl_interleave",
    doc="Deterministic proportional training-order interleave "
        "(operators/curation.py:interleave_order — stride scheduling): "
        "every source advances at pace src_rank*1e6 DIV count, the "
        "global merge orders by (pace, source, id), so no stretch of "
        "the training stream is dominated by one source and the order "
        "is a pure function of the corpus (md5 within-source shuffle). "
        "Global position via the distributed exact_rank plan. Full "
        "oracle hash.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.curation",
        fromlist=["interleave_order"],
    ).interleave_order(load_table(spark, sf, "documents")),
    oracle_sql_str="""
        WITH ranked AS (
          SELECT doc_id, source,
                 CAST(ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                      AS BIGINT) AS src_rank,
                 COUNT(*) OVER (PARTITION BY source) AS cnt_s
          FROM documents
        ),
        paced AS (
          SELECT doc_id, source, src_rank,
                 CAST(src_rank * 1000000 // cnt_s AS BIGINT) AS pace
          FROM ranked
        )
        SELECT doc_id, source, src_rank,
               CAST(ROW_NUMBER() OVER (ORDER BY pace, source, doc_id)
                    AS BIGINT) AS global_pos
        FROM paced
        ORDER BY global_pos
    """,
))


Q(QuerySpec(
    name="pl_mad_outliers",
    doc="Robust per-source length outliers: |n_chars - median| > "
        "1.5 * MAD (operators/curation.py:mad_outliers). Median/MAD "
        "resist the outliers a mean/stddev screen absorbs; the 2x/4x "
        "doubling trick keeps interpolated integer medians integral, so "
        "a robust-statistics filter carries a full oracle hash "
        "(percentile / quantile_cont dual form, q17/q90 pattern). Two "
        "grouped aggs; medians broadcast back.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.curation", fromlist=["mad_outliers"]
    ).mad_outliers(load_table(spark, sf, "documents"), "n_chars"),
    oracle_sql_str="""
        WITH med AS (
          SELECT source AS grp,
                 CAST(quantile_cont(n_chars * 2, 0.5) AS BIGINT) AS med2
          FROM documents GROUP BY source
        ),
        dev AS (
          SELECT d.doc_id, d.source,
                 CAST(d.n_chars AS BIGINT) AS v,
                 abs(2 * CAST(d.n_chars AS BIGINT) - m.med2) AS dev2
          FROM documents d JOIN med m ON d.source = m.grp
        ),
        mad AS (
          SELECT source AS grp,
                 CAST(quantile_cont(dev2 * 2, 0.5) AS BIGINT) AS mad4
          FROM dev GROUP BY source
        )
        SELECT dev.source, dev.doc_id, dev.v AS n_chars,
               CAST(2 * dev.dev2 AS BIGINT) AS dev_x4, mad.mad4
        FROM dev JOIN mad ON dev.source = mad.grp
        WHERE 2 * dev.dev2 * 1000000 > 1500000 * mad.mad4
        ORDER BY dev.source, dev.doc_id
    """,
))


Q(QuerySpec(
    name="pl_token_events",
    doc="LLM streaming-token event table over documents "
        "(functions/llm_stream.py:llm_stream_events; reference "
        "stream_events.py:14-96 discriminated union as one flat tagged-"
        "union row schema). The provider here is synthesize_stream over "
        "a DETERMINISTIC heuristic completion (first 60 chars of the "
        "prompt — a pure function of the text), so unlike a live LLM "
        "the full delta/end/finish event stream is SQL-expressible and "
        "this surface carries a FULL ORACLE HASH: 3 events per doc, "
        "content/snapshot/full_text/stop_reason/usage all pinned. "
        "Registered projection COALESCEs the tagged-union NULL slots "
        "so every hashed column is non-null in both engines.",
    builder=lambda spark, sf: (lambda ls: ls.llm_stream_events(
        load_table(spark, sf, "documents").select(
            F.col("doc_id").cast("string").alias("req_id"),
            F.col("text").alias("prompt"),
        ),
        ls.synthesize_stream(lambda prompts: [p[:60] for p in prompts]),
    ))(__import__(
        "adenhq_hive_spark.functions.llm_stream",
        fromlist=["llm_stream_events", "synthesize_stream"],
    )).select(
        "req_id", "event_idx", "event_type",
        F.coalesce("content", F.lit("")).alias("content"),
        F.coalesce("snapshot", F.lit("")).alias("snapshot"),
        F.coalesce("full_text", F.lit("")).alias("full_text"),
        F.coalesce("stop_reason", F.lit("")).alias("stop_reason"),
        F.coalesce("input_tokens", F.lit(-1)).alias("input_tokens"),
        F.coalesce("output_tokens", F.lit(-1)).alias("output_tokens"),
        F.coalesce("model", F.lit("")).alias("model"),
    ).orderBy("req_id", "event_idx"),
    oracle_sql_str="""
        WITH p AS (
          SELECT CAST(doc_id AS VARCHAR) AS req_id,
                 substr(text, 1, 60) AS c
          FROM documents
        ),
        ev AS (
          SELECT req_id, 0 AS event_idx, 'text_delta' AS event_type,
                 c AS content, c AS snapshot, '' AS full_text,
                 '' AS stop_reason,
                 CAST(-1 AS BIGINT) AS input_tokens,
                 CAST(-1 AS BIGINT) AS output_tokens, '' AS model
          FROM p
          UNION ALL
          SELECT req_id, 1, 'text_end', '', '', c, '',
                 CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), ''
          FROM p
          UNION ALL
          SELECT req_id, 2, 'finish', '', '', '', 'end_turn',
                 CAST(0 AS BIGINT), CAST(0 AS BIGINT), ''
          FROM p
        )
        SELECT req_id, CAST(event_idx AS INT) AS event_idx, event_type,
               content, snapshot, full_text, stop_reason,
               input_tokens, output_tokens, model
        FROM ev
        ORDER BY req_id, event_idx
    """,
))


Q(QuerySpec(
    name="pl_kappa",
    doc="Cohen's kappa per source between the declared lang column and "
        "the engine's own language-ID prediction (operators/profile.py:"
        "label_agreement over text.py:lang_id) — the labeled-data QC "
        "primitive: is the metadata trustworthy, and does agreement "
        "vary by source?  Exact BIGINT confusion/marginal counts, "
        "single-division IEEE doubles, ROUND(..,6) hash (chance "
        "agreement pe as (s_ab/n)/n so no product overflows at corpus "
        "row counts).",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.profile", fromlist=["label_agreement"]
    ).label_agreement(
        lang_id(load_table(spark, sf, "documents")),
        "lang", "lang_pred", group_col="source",
    ),
    oracle_sql_str=r"""
        WITH h AS (
          SELECT source, lang,
                 len(list_intersect(string_split_regex(text, '\s+'),
                     ['the','and','of','to','is'])) AS h_en,
                 len(list_intersect(string_split_regex(text, '\s+'),
                     ['der','die','und','ist','nicht'])) AS h_de,
                 len(list_intersect(string_split_regex(text, '\s+'),
                     ['el','la','que','de','es'])) AS h_es,
                 len(list_intersect(string_split_regex(text, '\s+'),
                     ['le','la','et','est','les'])) AS h_fr,
                 len(list_intersect(string_split_regex(text, '\s+'),
                     ['的','是','了','在','不'])) AS h_zh
          FROM documents
        ),
        p AS (
          SELECT source, lang,
                 CASE WHEN greatest(h_en,h_de,h_es,h_fr,h_zh) = 0 THEN 'und'
                      WHEN h_en = greatest(h_en,h_de,h_es,h_fr,h_zh) THEN 'en'
                      WHEN h_de = greatest(h_en,h_de,h_es,h_fr,h_zh) THEN 'de'
                      WHEN h_es = greatest(h_en,h_de,h_es,h_fr,h_zh) THEN 'es'
                      WHEN h_fr = greatest(h_en,h_de,h_es,h_fr,h_zh) THEN 'fr'
                      ELSE 'zh' END AS lang_pred
          FROM h
        ),
        cnt AS (SELECT source, lang AS la, lang_pred AS lb, COUNT(*) AS c
                FROM p GROUP BY 1, 2, 3),
        tot AS (SELECT source, SUM(c) AS n,
                       SUM(CASE WHEN la = lb THEN c ELSE 0 END) AS agree
                FROM cnt GROUP BY source),
        na AS (SELECT source, la AS cls, SUM(c) AS na
               FROM cnt GROUP BY 1, 2),
        nb AS (SELECT source, lb AS cls, SUM(c) AS nb
               FROM cnt GROUP BY 1, 2),
        s AS (SELECT na.source, SUM(na.na * nb.nb) AS s_ab
              FROM na JOIN nb ON na.source = nb.source AND na.cls = nb.cls
              GROUP BY na.source)
        SELECT t.source,
               CAST(t.n AS BIGINT) AS n,
               CAST(t.agree AS BIGINT) AS agree,
               ROUND(CAST(t.agree AS DOUBLE) / t.n, 6) AS po_r6,
               ROUND((CAST(s.s_ab AS DOUBLE) / t.n) / t.n, 6) AS pe_r6,
               ROUND(CASE
                 WHEN (CAST(s.s_ab AS DOUBLE) / t.n) / t.n = 1.0 THEN 1.0
                 ELSE (CAST(t.agree AS DOUBLE) / t.n
                       - (CAST(s.s_ab AS DOUBLE) / t.n) / t.n)
                      / (1.0 - (CAST(s.s_ab AS DOUBLE) / t.n) / t.n)
                 END, 6) AS kappa_r6
        FROM tot t JOIN s ON t.source = s.source
        ORDER BY t.source
    """,
))


Q(QuerySpec(
    name="pl_prf",
    doc="Per-class precision/recall/F1 of the language-ID heuristic vs "
        "the declared lang column (operators/profile.py:"
        "classification_report) — completes the labeled-data QC pair "
        "with pl_kappa: kappa says better-than-chance, this says where "
        "it fails. F1 from the integer identity 2*tp/(n_pred+n_truth), "
        "one IEEE division, zero-division pinned 0.0 (sklearn "
        "zero_division=0).",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.profile",
        fromlist=["classification_report"],
    ).classification_report(
        lang_id(load_table(spark, sf, "documents")), "lang", "lang_pred"
    ),
    oracle_sql_str=r"""
        WITH h AS (
          SELECT lang,
                 len(list_intersect(string_split_regex(text, '\s+'),
                     ['the','and','of','to','is'])) AS h_en,
                 len(list_intersect(string_split_regex(text, '\s+'),
                     ['der','die','und','ist','nicht'])) AS h_de,
                 len(list_intersect(string_split_regex(text, '\s+'),
                     ['el','la','que','de','es'])) AS h_es,
                 len(list_intersect(string_split_regex(text, '\s+'),
                     ['le','la','et','est','les'])) AS h_fr,
                 len(list_intersect(string_split_regex(text, '\s+'),
                     ['的','是','了','在','不'])) AS h_zh
          FROM documents
        ),
        p AS (
          SELECT lang AS t,
                 CASE WHEN greatest(h_en,h_de,h_es,h_fr,h_zh) = 0 THEN 'und'
                      WHEN h_en = greatest(h_en,h_de,h_es,h_fr,h_zh) THEN 'en'
                      WHEN h_de = greatest(h_en,h_de,h_es,h_fr,h_zh) THEN 'de'
                      WHEN h_es = greatest(h_en,h_de,h_es,h_fr,h_zh) THEN 'es'
                      WHEN h_fr = greatest(h_en,h_de,h_es,h_fr,h_zh) THEN 'fr'
                      ELSE 'zh' END AS pr
          FROM h
        ),
        cnt AS (SELECT t, pr, COUNT(*) AS c FROM p GROUP BY 1, 2),
        truth AS (SELECT t AS cls, CAST(SUM(c) AS BIGINT) AS n_truth
                  FROM cnt GROUP BY t),
        pred AS (SELECT pr AS cls, CAST(SUM(c) AS BIGINT) AS n_pred
                 FROM cnt GROUP BY pr),
        tp AS (SELECT t AS cls, CAST(c AS BIGINT) AS tp
               FROM cnt WHERE t = pr),
        m AS (
          SELECT COALESCE(truth.cls, pred.cls) AS cls,
                 COALESCE(n_truth, 0) AS n_truth,
                 COALESCE(n_pred, 0) AS n_pred
          FROM truth FULL OUTER JOIN pred ON truth.cls = pred.cls
        )
        SELECT m.cls, m.n_truth, m.n_pred,
               COALESCE(tp.tp, 0) AS tp,
               ROUND(CASE WHEN m.n_pred = 0 THEN 0.0
                     ELSE CAST(COALESCE(tp.tp, 0) AS DOUBLE) / m.n_pred
                     END, 6) AS precision_r6,
               ROUND(CASE WHEN m.n_truth = 0 THEN 0.0
                     ELSE CAST(COALESCE(tp.tp, 0) AS DOUBLE) / m.n_truth
                     END, 6) AS recall_r6,
               ROUND(CASE WHEN m.n_pred + m.n_truth = 0 THEN 0.0
                     ELSE (2.0 * CAST(COALESCE(tp.tp, 0) AS DOUBLE))
                          / (m.n_pred + m.n_truth)
                     END, 6) AS f1_r6
        FROM m LEFT JOIN tp ON m.cls = tp.cls
        ORDER BY m.cls
    """,
))


# ---- Count-Min / KMV sketch tier (round 7 continuation) ---------------------

Q(QuerySpec(
    name="pl_cms_registers",
    doc="Engine-portable Count-Min Sketch counter table over lineitem "
        "part demand (operators/sketch.py:cms_counters — Cormode & "
        "Muthukrishnan 2005): 4 rows x 256 buckets, hash_j = salted-md5 "
        "slice mod width, dense grid with empty buckets at cnt 0. Same "
        "pattern as pl_hll_registers: the mergeable sketch STATE carries "
        "a full oracle hash. The GROUP BY (row, bucket) shuffles at most "
        "d*w keys with map-side partial aggregation regardless of token "
        "cardinality — constant shuffle state at 100 TB where GROUP BY "
        "token ships one record per distinct key.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.sketch", fromlist=["cms_counters"]
    ).cms_counters(load_table(spark, sf, "lineitem"), "l_partkey",
                   depth=4, width=256)
    .orderBy("row", "bucket"),
    oracle_sql_str="""
        WITH v AS (SELECT CAST(l_partkey AS VARCHAR) AS v FROM lineitem),
        hj AS (
          SELECT j.range AS row,
                 CAST(('0x' || substr(
                     md5(v || '#' || CAST(j.range AS VARCHAR)), 1, 8))
                   AS BIGINT) % 256 AS bucket
          FROM v CROSS JOIN range(0, 4) j
        ),
        got AS (SELECT row, bucket, COUNT(*) AS cnt FROM hj
                GROUP BY row, bucket),
        grid AS (SELECT CAST(r.range AS INT) AS row, b.range AS bucket
                 FROM range(0, 4) r CROSS JOIN range(0, 256) b)
        SELECT grid.row, grid.bucket,
               CAST(COALESCE(got.cnt, 0) AS BIGINT) AS cnt
        FROM grid LEFT JOIN got
          ON grid.row = got.row AND grid.bucket = got.bucket
        ORDER BY grid.row, grid.bucket
    """,
))


Q(QuerySpec(
    name="pl_cms_estimate",
    doc="CMS point-query accuracy ledger (operators/sketch.py:"
        "cms_point_estimates): exact top-20 parts by demand next to "
        "their sketch estimate (min over the 4 rows of the bucket "
        "counter). The one-sided guarantee est >= exact is pinned in "
        "tests; with 2k parts in 256 buckets the overcount is visible "
        "and measured, which is the point of the ledger. Candidate side "
        "is 80 rows, broadcast; counters side is the d*w-key aggregate.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.sketch",
        fromlist=["cms_point_estimates"],
    ).cms_point_estimates(load_table(spark, sf, "lineitem"), "l_partkey",
                          depth=4, width=256, top_n=20),
    oracle_sql_str="""
        WITH v AS (SELECT CAST(l_partkey AS VARCHAR) AS v FROM lineitem),
        counters AS (
          SELECT j.range AS row,
                 CAST(('0x' || substr(
                     md5(v || '#' || CAST(j.range AS VARCHAR)), 1, 8))
                   AS BIGINT) % 256 AS bucket,
                 COUNT(*) AS cnt
          FROM v CROSS JOIN range(0, 4) j
          GROUP BY 1, 2
        ),
        cand AS (
          SELECT v, COUNT(*) AS n_exact FROM v GROUP BY v
          ORDER BY n_exact DESC, v LIMIT 20
        ),
        cand_h AS (
          SELECT v, n_exact, j.range AS row,
                 CAST(('0x' || substr(
                     md5(v || '#' || CAST(j.range AS VARCHAR)), 1, 8))
                   AS BIGINT) % 256 AS bucket
          FROM cand CROSS JOIN range(0, 4) j
        )
        SELECT cand_h.v AS value,
               CAST(cand_h.n_exact AS BIGINT) AS n_exact,
               CAST(MIN(counters.cnt) AS BIGINT) AS est_cms
        FROM cand_h JOIN counters
          ON cand_h.row = counters.row AND cand_h.bucket = counters.bucket
        GROUP BY cand_h.v, cand_h.n_exact
        ORDER BY n_exact DESC, value
    """,
))


Q(QuerySpec(
    name="pl_kmv_distinct",
    doc="KMV (K minimum values) distinct-count sketch over o_custkey "
        "(operators/sketch.py:kmv_distinct — Bar-Yossef 2002 / Beyer "
        "2007): k=256 smallest distinct 32-bit md5-slice hashes, "
        "estimate = (k-1)*2^32 DIV h_(k) in exact integer arithmetic "
        "(exact-path n_kept when distinct < k). Default prefilter="
        "'jvm': distinct -> TakeOrderedAndProject, map-side partial "
        "dedup keeps the shuffle per-partition-distinct-sized (the "
        "numpy k-min prefilter remains for distinct~rows regimes); "
        "driver traffic O(k). n_exact rides along as the accuracy "
        "ledger; the test gates the estimator inside the 1/sqrt(k) "
        "error envelope.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.sketch", fromlist=["kmv_distinct"]
    ).kmv_distinct(load_table(spark, sf, "orders"), "o_custkey", k=256),
    oracle_sql_str="""
        WITH h AS (
          SELECT DISTINCT CAST(('0x' || substr(
                   md5(CAST(o_custkey AS VARCHAR)), 1, 8)) AS BIGINT)
                 AS hv
          FROM orders
        ),
        topk AS (SELECT hv FROM h ORDER BY hv LIMIT 256),
        agg AS (SELECT COUNT(*) AS n_kept, MAX(hv) AS kth FROM topk),
        ex AS (SELECT COUNT(DISTINCT o_custkey) AS n_exact FROM orders)
        SELECT CAST(256 AS BIGINT) AS k,
               CAST(n_kept AS BIGINT) AS n_kept,
               CAST(kth AS BIGINT) AS kth_hash,
               CAST(CASE WHEN n_kept < 256 THEN n_kept
                    ELSE (255 * CAST(4294967296 AS BIGINT)) // kth
                    END AS BIGINT) AS estimate,
               CAST(n_exact AS BIGINT) AS n_exact
        FROM agg CROSS JOIN ex
    """,
))


Q(QuerySpec(
    name="pl_knn_purity",
    doc="Embedding-space label-health probe (operators/similarity.py:"
        "knn_label_purity): per-label kNN agreement — each vector's k=5 "
        "nearest neighbors by int8-code dot product vote on its label, "
        "rolled up as (label, n, n_correct, purity_ppm). Quantizing via "
        "the pl_int8_quant floor discipline makes the kNN graph "
        "integer-exact (ranking by float cosine admits cross-engine tie "
        "ambiguity; the int dot with (dot desc, cand_id) tie-break does "
        "not), so a geometry-vs-labels QC metric carries a full oracle "
        "hash. Broadcast code matrix + distributed batch-local top-k "
        "(shuffle k rows per query-batch, never n^2); corpora past the "
        "cap belong to the IVF tier.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.similarity",
        fromlist=["knn_label_purity"],
    ).knn_label_purity(load_table(spark, sf, "embeddings"), k=5),
    oracle_sql_str="""
        WITH m AS (
          SELECT vec_id, label,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                 list_max(list_transform(embedding,
                          x -> abs(CAST(x AS DOUBLE)))) AS mx
          FROM embeddings
        ),
        codes AS (
          SELECT vec_id, label,
                 CASE WHEN mx = 0 THEN list_transform(v, x -> 0.0)
                      ELSE list_transform(v, x -> floor(x * 127 / mx))
                 END AS c
          FROM m
        ),
        pairs AS (
          SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                 c.label AS cand_label,
                 CAST(list_inner_product(q.c, c.c) AS BIGINT) AS dot
          FROM codes q JOIN codes c ON q.vec_id <> c.vec_id
        ),
        ranked AS (
          SELECT query_id, cand_label,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY dot DESC, cand_id) AS rnk
          FROM pairs
        ),
        votes AS (
          SELECT query_id, cand_label, COUNT(*) AS votes
          FROM ranked WHERE rnk <= 5
          GROUP BY query_id, cand_label
        ),
        pred AS (
          SELECT query_id, cand_label AS pred_label
          FROM (SELECT query_id, cand_label,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY votes DESC, cand_label)
                         AS vr
                FROM votes) t
          WHERE vr = 1
        )
        SELECT m.label,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN pred.pred_label = m.label
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
               CAST(SUM(CASE WHEN pred.pred_label = m.label
                        THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
                    AS BIGINT) AS purity_ppm
        FROM m JOIN pred ON m.vec_id = pred.query_id
        GROUP BY m.label
        ORDER BY m.label
    """,
))


Q(QuerySpec(
    name="pl_winsorize",
    doc="Per-source winsorization report (operators/curation.py:"
        "winsorize): rows outside the exact nearest-rank [p05, p95] "
        "n_chars band with their clip target — the clip-don't-drop "
        "complement to pl_mad_outliers (winsorizing preserves the "
        "sample counts mixture planning relies on). Nearest-rank bounds "
        "are observed integers, so the contract is integer-exact; ranks "
        "via the distributed exact_rank plan, |sources|-row bounds "
        "broadcast back.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.curation", fromlist=["winsorize"]
    ).winsorize(load_table(spark, sf, "documents"), "n_chars"),
    oracle_sql_str="""
        WITH r AS (
          SELECT source, doc_id, n_chars,
                 ROW_NUMBER() OVER (PARTITION BY source
                                    ORDER BY n_chars, doc_id) AS rn,
                 COUNT(*) OVER (PARTITION BY source) AS n
          FROM documents
        ),
        b AS (
          SELECT source,
                 MAX(CASE WHEN rn = (5 * n + 99) // 100
                     THEN n_chars END) AS lo,
                 MAX(CASE WHEN rn = (95 * n + 99) // 100
                     THEN n_chars END) AS hi
          FROM r GROUP BY source
        )
        SELECT d.source, d.doc_id, d.n_chars,
               CAST(b.lo AS BIGINT) AS lo, CAST(b.hi AS BIGINT) AS hi,
               CAST(CASE WHEN d.n_chars < b.lo THEN b.lo
                    ELSE b.hi END AS BIGINT) AS clipped
        FROM documents d JOIN b USING (source)
        WHERE d.n_chars < b.lo OR d.n_chars > b.hi
        ORDER BY d.source, d.doc_id
    """,
))


Q(QuerySpec(
    name="pl_scd2",
    doc="SCD type-2 dimension build from the events change log "
        "(operators/scd.py:scd2_intervals): one row per maximal run of "
        "equal event_type per user in (ts, event_id) order, with "
        "valid_from / valid_to (NULL = open) / is_current — the batch "
        "complement to the CDC upsert/time-travel sink, encoding replay "
        "history as range predicates a point-in-time join can push. Two "
        "windows over ONE (user) x (ts, id) ordering = one shuffle, "
        "reused.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.scd", fromlist=["scd2_intervals"]
    ).scd2_intervals(
        load_table(spark, sf, "events"),
        "user_id", "event_type", "ts", "event_id",
    ),
    oracle_sql_str="""
        WITH changed AS (
          SELECT user_id, event_type, ts, event_id,
                 LAG(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev
          FROM events
        ),
        runs AS (
          -- LEAD ordered by (ts, event_id), same tiebreak as the LAG
          -- above and the Spark window — a duplicate (user_id, ts)
          -- would otherwise make valid_to nondeterministic
          SELECT user_id, event_type, ts AS valid_from,
                 LEAD(ts) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS valid_to
          FROM changed
          WHERE prev IS NULL OR event_type <> prev
        )
        SELECT user_id, event_type, valid_from, valid_to,
               valid_to IS NULL AS is_current
        FROM runs
        ORDER BY user_id, valid_from
    """,
))


Q(QuerySpec(
    name="pl_seq_motif",
    doc="Strict-funnel motif counting per user (operators/curation.py:"
        "seq_motif — MATCH_RECOGNIZE-lite): non-overlapping occurrences "
        "of the consecutive view->click->purchase run ('vcp' over "
        "first-letter symbols, (ts, event_id) order) with the 1-based "
        "position of the first match. Literal matching via length "
        "arithmetic + instr — regex-free, so Java-vs-RE2 semantics "
        "cannot drift. Sort-inside-aggregate like pl_event_sequences: "
        "one user-key shuffle, no window.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.curation", fromlist=["seq_motif"]
    ).seq_motif(load_table(spark, sf, "events"), "vcp"),
    oracle_sql_str="""
        WITH seqs AS (
          SELECT user_id, COUNT(*) AS n_events,
                 array_to_string(
                   list(substr(event_type, 1, 1) ORDER BY ts, event_id),
                   '') AS seq
          FROM events
          GROUP BY user_id
        )
        SELECT user_id, n_events,
               CAST((length(seq) - length(replace(seq, 'vcp', ''))) / 3
                    AS BIGINT) AS motif_n,
               CAST(strpos(seq, 'vcp') AS BIGINT) AS first_pos
        FROM seqs
        WHERE length(seq) - length(replace(seq, 'vcp', '')) > 0
        ORDER BY user_id
    """,
))


Q(QuerySpec(
    name="pl_label_errors",
    doc="Row-level label-error mining, confident-learning-lite "
        "(operators/similarity.py:label_error_candidates — Northcutt "
        "2021 shape): vectors whose k=5 quantized-kNN neighbors vote a "
        "DIFFERENT label with >= 3 agreement, strongest evidence first "
        "— the actionable complement to pl_knn_purity's rollup (purity "
        "says WHERE the geometry disagrees, this says WHICH rows to "
        "relabel). Shares the integer-exact _knn_vote kernel, so the "
        "candidate list carries a full oracle hash.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.similarity",
        fromlist=["label_error_candidates"],
    ).label_error_candidates(
        load_table(spark, sf, "embeddings"), k=5, min_votes=3
    ),
    oracle_sql_str="""
        WITH m AS (
          SELECT vec_id, label,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                 list_max(list_transform(embedding,
                          x -> abs(CAST(x AS DOUBLE)))) AS mx
          FROM embeddings
        ),
        codes AS (
          SELECT vec_id, label,
                 CASE WHEN mx = 0 THEN list_transform(v, x -> 0.0)
                      ELSE list_transform(v, x -> floor(x * 127 / mx))
                 END AS c
          FROM m
        ),
        pairs AS (
          SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                 c.label AS cand_label,
                 CAST(list_inner_product(q.c, c.c) AS BIGINT) AS dot
          FROM codes q JOIN codes c ON q.vec_id <> c.vec_id
        ),
        ranked AS (
          SELECT query_id, cand_label,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY dot DESC, cand_id) AS rnk
          FROM pairs
        ),
        votes AS (
          SELECT query_id, cand_label, COUNT(*) AS votes
          FROM ranked WHERE rnk <= 5
          GROUP BY query_id, cand_label
        ),
        pred AS (
          SELECT query_id, cand_label AS pred_label, votes
          FROM (SELECT query_id, cand_label, votes,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY votes DESC, cand_label)
                         AS vr
                FROM votes) t
          WHERE vr = 1
        )
        SELECT m.vec_id, m.label, pred.pred_label,
               CAST(pred.votes AS BIGINT) AS votes
        FROM m JOIN pred ON m.vec_id = pred.query_id
        WHERE pred.pred_label <> m.label AND pred.votes >= 3
        ORDER BY votes DESC, m.vec_id
    """,
))


# ---- round 8: quantile sketch, agreement, leakage-safe split, PMI -----------

def _hist_oracle() -> str:
    from ..operators.sketch import hist_bucket_lb_sql, hist_bucket_sql

    return f"""
        WITH base AS (
          SELECT source AS grp, doc_id AS _id,
                 CAST(length(text) AS BIGINT) AS v
          FROM documents
        ),
        hist AS (
          SELECT grp, {hist_bucket_sql("v")} AS bucket, COUNT(*) AS cnt
          FROM base GROUP BY grp, bucket
        ),
        cum AS (
          SELECT grp, bucket,
                 SUM(cnt) OVER (PARTITION BY grp ORDER BY bucket) AS cum
          FROM hist
        ),
        nn AS (SELECT grp, COUNT(*) AS n FROM base GROUP BY grp),
        targets AS (
          SELECT grp, n, pct,
                 greatest((pct * n + 99) // 100, 1) AS target
          FROM nn, (SELECT unnest([50, 90, 99]) AS pct)
        ),
        est AS (
          SELECT t.grp, t.pct, t.n,
                 MIN({hist_bucket_lb_sql("c.bucket")}) AS est
          FROM targets t JOIN cum c ON c.grp = t.grp AND c.cum >= t.target
          GROUP BY t.grp, t.pct, t.n
        ),
        ranked AS (
          SELECT grp, v,
                 ROW_NUMBER() OVER (PARTITION BY grp
                                    ORDER BY v, _id) AS rn
          FROM base
        ),
        ex AS (
          SELECT t.grp, t.pct, MAX(r.v) AS exact
          FROM targets t JOIN ranked r ON r.grp = t.grp
                                      AND r.rn = t.target
          GROUP BY t.grp, t.pct
        )
        SELECT e.grp AS source, CAST(e.pct AS INT) AS pct,
               CAST(e.n AS BIGINT) AS n, CAST(e.est AS BIGINT) AS est,
               CAST(x.exact AS BIGINT) AS exact
        FROM est e JOIN ex x ON x.grp = e.grp AND x.pct = e.pct
        ORDER BY source, pct
    """


def _hist_quantiles_q(spark, sf):
    from ..operators.sketch import hist_quantiles

    docs = load_table(spark, sf, "documents").select(
        "doc_id", "source", F.length("text").alias("n_chars")
    )
    return hist_quantiles(docs, "n_chars")


Q(QuerySpec(
    name="pl_hist_quantiles",
    doc="Per-source p50/p90/p99 document-length estimates from the HDR "
        "integer log-histogram quantile sketch, next to exact "
        "nearest-rank values (operators/sketch.py:hist_quantiles — the "
        "quantile member of the mergeable-summary tier: HdrHistogram/"
        "DDSketch bucketing, 8 sub-buckets per octave = <= 12.5% "
        "relative error by construction). All-integer bucket math "
        "(length(bin(v)) and >> — probed bit-identical on both "
        "engines), so sketch AND estimates carry a full oracle hash. "
        "Scale: one (group, bucket) shuffle with partial agg, <= ~500 "
        "buckets/group regardless of rows; shard merge = summing "
        "counts.",
    builder=_hist_quantiles_q,
    oracle_sql_str=_hist_oracle(),
))


Q(QuerySpec(
    name="pl_kripp_alpha",
    doc="Krippendorff's alpha (nominal, two raters) per source between "
        "the declared lang column and the engine's language-ID "
        "prediction (operators/profile.py:kripp_alpha) — completes the "
        "agreement pair with pl_kappa: kappa corrects chance with "
        "per-rater marginals (truth-vs-prediction), alpha with the "
        "POOLED distribution (interchangeable annotators). "
        "alpha = 1 - D(n-1)/(n^2 - S) over exact BIGINTs (D = 2x "
        "disagreeing units, n = pooled values, S = sum of squared "
        "pooled class counts); one double division at the end, "
        "ROUND(..,6) hash. One corpus scan, no joins.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.profile", fromlist=["kripp_alpha"]
    ).kripp_alpha(
        lang_id(load_table(spark, sf, "documents")),
        "lang", "lang_pred", group_col="source",
    ),
    oracle_sql_str=r"""
        WITH h AS (
          SELECT source, lang,
                 len(list_intersect(string_split_regex(text, '\s+'),
                     ['the','and','of','to','is'])) AS h_en,
                 len(list_intersect(string_split_regex(text, '\s+'),
                     ['der','die','und','ist','nicht'])) AS h_de,
                 len(list_intersect(string_split_regex(text, '\s+'),
                     ['el','la','que','de','es'])) AS h_es,
                 len(list_intersect(string_split_regex(text, '\s+'),
                     ['le','la','et','est','les'])) AS h_fr,
                 len(list_intersect(string_split_regex(text, '\s+'),
                     ['的','是','了','在','不'])) AS h_zh
          FROM documents
        ),
        p AS (
          SELECT source, lang,
                 CASE WHEN greatest(h_en,h_de,h_es,h_fr,h_zh) = 0 THEN 'und'
                      WHEN h_en = greatest(h_en,h_de,h_es,h_fr,h_zh) THEN 'en'
                      WHEN h_de = greatest(h_en,h_de,h_es,h_fr,h_zh) THEN 'de'
                      WHEN h_es = greatest(h_en,h_de,h_es,h_fr,h_zh) THEN 'es'
                      WHEN h_fr = greatest(h_en,h_de,h_es,h_fr,h_zh) THEN 'fr'
                      ELSE 'zh' END AS lang_pred
          FROM h
        ),
        cnt AS (SELECT source, lang AS la, lang_pred AS lb, COUNT(*) AS c
                FROM p GROUP BY 1, 2, 3),
        pooled AS (
          SELECT source, cls, SUM(c) AS n_c, SUM(dis) AS dis2
          FROM (
            SELECT source, c,
                   CASE WHEN la <> lb THEN c ELSE 0 END AS dis,
                   unnest([la, lb]) AS cls
            FROM cnt
          )
          GROUP BY source, cls
        ),
        tot AS (
          SELECT source, SUM(n_c) AS n, SUM(n_c * n_c) AS s,
                 SUM(dis2) AS d2
          FROM pooled GROUP BY source
        )
        SELECT source,
               CAST(n // 2 AS BIGINT) AS n_units,
               CAST(d2 // 2 AS BIGINT) AS disagree,
               ROUND(CASE WHEN n * n - s = 0 THEN 1.0
                     ELSE 1.0 - (CAST(d2 AS DOUBLE) * (n - 1))
                                / (n * n - s)
                     END, 6) AS alpha_r6
        FROM tot
        ORDER BY source
    """,
))


Q(QuerySpec(
    name="pl_cluster_split",
    doc="Leakage-safe train/val/test assignment: whole duplicate "
        "clusters routed to one split (operators/curation.py:"
        "cluster_split). hash_split routes rows independently, so a "
        "doc and its duplicate can straddle train/test and the eval "
        "measures memorization; here the md5-hex routing key is the "
        "cluster representative (min id per md5(text) content cluster "
        "in the oracle-checked exact mode; near-dup components via "
        "connected_components in the scale mode), so split fractions "
        "hold at the CLUSTER level and no content crosses splits.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.curation", fromlist=["cluster_split"]
    ).cluster_split(load_table(spark, sf, "documents")),
    oracle_sql_str="""
        WITH rep AS (
          SELECT doc_id,
                 MIN(doc_id) OVER (PARTITION BY md5(text)) AS rep_id
          FROM documents
        )
        SELECT doc_id, rep_id,
               CASE WHEN substr(md5(CAST(rep_id AS VARCHAR)), 1, 4)
                         < 'cccd' THEN 'train'
                    WHEN substr(md5(CAST(rep_id AS VARCHAR)), 1, 4)
                         < 'e666' THEN 'val'
                    ELSE 'test' END AS split
        FROM rep
        ORDER BY doc_id
    """,
))


Q(QuerySpec(
    name="pl_pmi_colloc",
    doc="Top-50 adjacent-bigram collocations by PMI with NPMI and a "
        "min-count floor (operators/text.py:pmi_collocations — Church "
        "& Hanks 1990; the word2vec phrase-mining pass): phrase/"
        "boilerplate discovery and tokenizer-merge candidates. Exact "
        "BIGINT counts; pmi/npmi as single fixed-shape double "
        "expressions + ROUND(4) (the ln portability device); "
        "min_count kills the hapax-pair explosion and bounds the "
        "scored relation; TakeOrderedAndProject top-50 total-ordered "
        "on (pmi desc, a, b).",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.text", fromlist=["pmi_collocations"]
    ).pmi_collocations(load_table(spark, sf, "documents")),
    oracle_sql_str="""
        WITH t AS (
          SELECT list_filter(string_split(lower(text), ' '),
                             x -> x <> '') AS tk
          FROM documents
        ),
        uni AS (
          SELECT tok, COUNT(*) AS c_uni
          FROM (SELECT unnest(tk) AS tok FROM t)
          GROUP BY tok
        ),
        nn AS (SELECT SUM(c_uni) AS n FROM uni),
        pairs AS (
          SELECT u.pr.a AS a, u.pr.b AS b FROM (
            SELECT unnest(list_transform(
                range(1, greatest(len(tk) - 1, 0) + 1),
                i -> struct_pack(a := tk[i], b := tk[i+1]))) AS pr
            FROM t WHERE len(tk) >= 2) u
        ),
        big AS (
          SELECT a, b, COUNT(*) AS c12 FROM pairs GROUP BY a, b
          HAVING COUNT(*) >= 5
        ),
        bt AS (SELECT COUNT(*) AS bb FROM pairs),
        scored AS (
          SELECT g.a, g.b, g.c12,
                 (CAST(g.c12 AS DOUBLE) / bt.bb) AS p12,
                 ln((CAST(g.c12 AS DOUBLE) / bt.bb)
                    / ((CAST(ua.c_uni AS DOUBLE) / nn.n)
                       * (CAST(ub.c_uni AS DOUBLE) / nn.n))) AS pmi
          FROM big g
          JOIN uni ua ON ua.tok = g.a
          JOIN uni ub ON ub.tok = g.b
          CROSS JOIN nn CROSS JOIN bt
        )
        SELECT a, b, CAST(c12 AS BIGINT) AS c12,
               ROUND(pmi, 4) AS pmi_r4,
               ROUND(pmi / -ln(p12), 4) AS npmi_r4
        FROM scored
        ORDER BY ROUND(pmi, 4) DESC, a, b
        LIMIT 50
    """,
))


Q(QuerySpec(
    name="pl_sessionize",
    doc="Batch gap-based sessionization of the event log (operators/"
        "sessions.py:sessionize, 30-min gap): lag-diff boundary flags "
        "-> running-sum session numbers -> per-session rollup, (ts, "
        "event_id)-tiebroken so replayed history matches the streaming "
        "session window's assignments (q58's batch complement). One "
        "user-key shuffle serves both windows; integer-second "
        "durations.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.sessions", fromlist=["sessionize"]
    ).sessionize(load_table(spark, sf, "events")),
    oracle_sql_str="""
        WITH flagged AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER (
                          PARTITION BY user_id ORDER BY ts, event_id))
                      > 1800000000 THEN 1 ELSE 0 END AS new_s
          FROM events
        ),
        sess AS (
          SELECT user_id, ts,
                 SUM(new_s) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) + 1
                   AS session_n
          FROM flagged
        )
        SELECT user_id, CAST(session_n AS BIGINT) AS session_n,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MIN(ts) AS start_ts, MAX(ts) AS end_ts,
               CAST((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000
                    AS BIGINT) AS duration_s
        FROM sess
        GROUP BY user_id, session_n
        ORDER BY user_id, session_n
    """,
))


Q(QuerySpec(
    name="pl_label_kl",
    doc="Per-source label-mix skew: KL(p(lang | source) || p(lang)) in "
        "nats (operators/profile.py:label_kl) — the confounding audit "
        "for labeled corpora; the n_g-weighted sum of these rows IS "
        "I(source; lang). Exact BIGINT counts, fixed-shape double "
        "terms, order-fixed in-row fold over labels (the psi_drift "
        "discipline), ROUND(..,6).",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.profile", fromlist=["label_kl"]
    ).label_kl(load_table(spark, sf, "documents"), "lang"),
    oracle_sql_str="""
        WITH cnt AS (
          SELECT source AS grp, lang AS lbl, COUNT(*) AS c_gl
          FROM documents GROUP BY 1, 2
        ),
        ng AS (SELECT grp, SUM(c_gl) AS n_g FROM cnt GROUP BY grp),
        cl AS (SELECT lbl, SUM(c_gl) AS c_l FROM cnt GROUP BY lbl),
        nn AS (SELECT SUM(c_gl) AS n FROM cnt),
        terms AS (
          SELECT c.grp, c.lbl, ng.n_g,
                 (CAST(c.c_gl AS DOUBLE) / ng.n_g)
                 * ln((CAST(c.c_gl AS DOUBLE) / ng.n_g)
                      / (CAST(cl.c_l AS DOUBLE) / nn.n)) AS term
          FROM cnt c
          JOIN ng ON ng.grp = c.grp
          JOIN cl ON cl.lbl = c.lbl
          CROSS JOIN nn
        )
        SELECT grp AS source,
               CAST(MIN(n_g) AS BIGINT) AS n_docs,
               ROUND(list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE),
                                list(term ORDER BY lbl)),
                   (a, x) -> a + x), 6) AS kl_r6
        FROM terms
        GROUP BY grp
        ORDER BY source
    """,
))


# ---- round 8 second batch: experiment-analysis + privacy tier ---------------
#
# Three inference primitives (Welch t-test, Poisson-bootstrap CI, CUSUM
# changepoints — operators/stats.py), two release audits (k-anonymity /
# l-diversity, DP noisy counts — operators/privacy.py), the KMV set-op
# (sketch.py:kmv_jaccard) and Flesch readability (text.py:readability).
# All seven are single-scan shapes with metadata-sized shuffles and full
# oracle hashes; every rounded double carries the + 0.0 signed-zero
# guard on BOTH sides (the r8 pl_jl_project discipline).


def _welch_q(spark, sf):
    from ..operators.stats import welch_ttest

    return welch_ttest(
        load_table(spark, sf, "events"),
        "value", "event_type", "purchase", "view",
    )


Q(QuerySpec(
    name="pl_welch_ttest",
    doc="Welch's unequal-variance t-test between the purchase and view "
        "cohorts' event values (operators/stats.py:welch_ttest) — the "
        "two-sample comparison primitive of the experiment-analysis "
        "tier. One conditional-aggregation scan (no per-cohort join); "
        "n/sum/sum-of-squares accumulate as exact DECIMAL(38,6) (the "
        "relational money-sum discipline — order-independent), then "
        "mean/variance/t and the Welch-Satterthwaite df are fixed-shape "
        "double expressions, ROUND 6/4 with the signed-zero guard. "
        "Scale: map-side combine reduces the shuffle to one row per "
        "partition at any corpus size.",
    builder=_welch_q,
    oracle_sql_str="""
        WITH agg AS (
          SELECT
            SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS n_a,
            SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n_b,
            SUM(CASE WHEN event_type = 'purchase'
                THEN CAST(value AS DECIMAL(38,6)) END) AS s_a,
            SUM(CASE WHEN event_type = 'view'
                THEN CAST(value AS DECIMAL(38,6)) END) AS s_b,
            SUM(CASE WHEN event_type = 'purchase'
                THEN CAST(value * value AS DECIMAL(38,6)) END) AS ss_a,
            SUM(CASE WHEN event_type = 'view'
                THEN CAST(value * value AS DECIMAL(38,6)) END) AS ss_b
          FROM events
          WHERE event_type IN ('purchase', 'view')
        ),
        stats AS (
          SELECT n_a, n_b,
                 CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS mean_a,
                 CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mean_b,
                 CASE WHEN n_a > 1 THEN
                   (CAST(ss_a AS DOUBLE)
                    - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE)
                      / CAST(n_a AS DOUBLE))
                   / (CAST(n_a AS DOUBLE) - 1.0) END AS var_a,
                 CASE WHEN n_b > 1 THEN
                   (CAST(ss_b AS DOUBLE)
                    - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE)
                      / CAST(n_b AS DOUBLE))
                   / (CAST(n_b AS DOUBLE) - 1.0) END AS var_b
          FROM agg
        ),
        se AS (
          SELECT *,
                 var_a / CAST(n_a AS DOUBLE) AS se2_a,
                 var_b / CAST(n_b AS DOUBLE) AS se2_b
          FROM stats
        )
        SELECT 'purchase' AS group_a, 'view' AS group_b,
               CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
               ROUND(mean_a, 6) + 0.0 AS mean_a_r6,
               ROUND(mean_b, 6) + 0.0 AS mean_b_r6,
               ROUND(var_a, 6) + 0.0 AS var_a_r6,
               ROUND(var_b, 6) + 0.0 AS var_b_r6,
               ROUND(CASE WHEN (se2_a + se2_b) > 0 THEN
                 (mean_a - mean_b) / sqrt(se2_a + se2_b) END, 6) + 0.0
                 AS t_r6,
               ROUND(CASE WHEN (se2_a + se2_b) > 0 THEN
                 ((se2_a + se2_b) * (se2_a + se2_b))
                 / (se2_a * se2_a / (CAST(n_a AS DOUBLE) - 1.0)
                    + se2_b * se2_b / (CAST(n_b AS DOUBLE) - 1.0))
                 END, 4) + 0.0 AS df_r4
        FROM se
    """,
))


def _bootstrap_q(spark, sf):
    from ..operators.stats import poisson_bootstrap_ci

    return poisson_bootstrap_ci(
        load_table(spark, sf, "events"),
        "event_id", "value", "event_type", b=64,
    )


Q(QuerySpec(
    name="pl_bootstrap_ci",
    doc="Per-event-type 95% bootstrap CI for the mean value via the "
        "POISSON bootstrap (operators/stats.py:poisson_bootstrap_ci; "
        "Chamandy et al. — each row enters replicate r with weight ~ "
        "Poisson(1), so no global resample pass exists: the at-scale "
        "bootstrap). Randomness is the md5 inverse-CDF integer ladder "
        "(POISSON1_THRESHOLDS), replayed bit-for-bit by the oracle; "
        "replicate means are exact-DECIMAL weighted sums; CI bounds are "
        "nearest-rank order statistics over the B=64 replicate means. "
        "Scale: ONE scan, explode(B) folded by map-side combine to "
        "O(groups x B) shuffle rows; per-row cost is B md5 calls (the "
        "portability tax — a deployment swaps in xxhash64).",
    builder=_bootstrap_q,
    oracle_sql_str="""
        WITH rep AS (
          SELECT e.event_type AS grp, r.r AS r, e.value AS v,
                 CAST(('0x' || substr(md5(
                   CAST(e.event_id AS VARCHAR) || '#'
                   || CAST(r.r // 4 AS VARCHAR)),
                   1 + CAST(r.r % 4 AS INT) * 8, 8)) AS BIGINT)
                 % 1000000 AS u6
          FROM events e CROSS JOIN range(0, 64) r(r)
        ),
        wtd AS (
          SELECT grp, r, v,
                 CASE WHEN u6 < 367879 THEN 0
                      WHEN u6 < 735758 THEN 1
                      WHEN u6 < 919698 THEN 2
                      WHEN u6 < 981011 THEN 3
                      WHEN u6 < 996340 THEN 4
                      WHEN u6 < 999405 THEN 5
                      WHEN u6 < 999916 THEN 6
                      WHEN u6 < 999989 THEN 7
                      WHEN u6 < 999998 THEN 8
                      ELSE 9 END AS w
          FROM rep
        ),
        means AS (
          SELECT grp, r,
                 CASE WHEN SUM(w) > 0 THEN
                   CAST(SUM(CAST(floor(CAST(w AS DOUBLE) * v
                     * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
                   / 1000000.0
                   / CAST(SUM(w) AS DOUBLE) END AS mean_r
          FROM wtd GROUP BY grp, r
        ),
        ranked AS (
          SELECT grp, mean_r,
                 ROW_NUMBER() OVER (PARTITION BY grp
                                    ORDER BY mean_r NULLS FIRST, r)
                   AS rn
          FROM means
        ),
        ci AS (
          SELECT grp,
                 MAX(CASE WHEN rn = 2 THEN mean_r END) AS lo,
                 MAX(CASE WHEN rn = 63 THEN mean_r END) AS hi
          FROM ranked GROUP BY grp
        ),
        base AS (
          SELECT event_type AS grp, COUNT(*) AS n,
                 CAST(SUM(CAST(floor(value * 1000000.0 + 0.5)
                   AS BIGINT)) AS DOUBLE)
                 / 1000000.0
                 / CAST(COUNT(*) AS DOUBLE) AS mean
          FROM events GROUP BY event_type
        )
        SELECT b.grp AS event_type, CAST(b.n AS BIGINT) AS n,
               CAST(64 AS BIGINT) AS b,
               ROUND(b.mean, 6) + 0.0 AS mean_r6,
               ROUND(c.lo, 6) + 0.0 AS lo_r6,
               ROUND(c.hi, 6) + 0.0 AS hi_r6
        FROM base b JOIN ci c ON c.grp = b.grp
        ORDER BY event_type
    """,
))


def _bootstrap_arrow_q(spark, sf):
    from ..operators.stats import poisson_bootstrap_ci

    return poisson_bootstrap_ci(
        load_table(spark, sf, "events"),
        "event_id", "value", "event_type", b=64, kernel="arrow",
    )


def _same_oracle(name: str) -> str:
    from . import _REGISTRY

    sql = _REGISTRY[name].oracle_sql_str
    assert sql is not None
    return sql


Q(QuerySpec(
    name="pl_bootstrap_ci_arrow",
    doc="Arrow-kernel form of pl_bootstrap_ci (operators/stats.py:"
        "_bootstrap_partials_arrow): hashlib md5 into a contiguous "
        "buffer + np.frombuffer word slicing + vectorized "
        "searchsorted Poisson ladder, aggregated to O(groups x B) "
        "partials INSIDE the worker so Arrow never ships the B x N "
        "explosion. BIT-EXACT to the JVM form (same digests, same "
        "word layout, same IEEE q = floor((w*v)*1e6+0.5), same "
        "trunc-div hi/lo split), so it shares pl_bootstrap_ci's "
        "oracle verbatim — the rare case where a Python stage beats "
        "codegen: the JVM's per-(row,replicate) md5+hex+conv+CASE "
        "ladder measured 26.8 s at sf10 vs 8.8 s for this kernel "
        "(AHEAD of the DuckDB oracle; BASELINE.md r9).",
    builder=_bootstrap_arrow_q,
    oracle_sql_str=_same_oracle("pl_bootstrap_ci"),
))


def _cusum_q(spark, sf):
    from ..operators.stats import cusum_changepoints

    return cusum_changepoints(
        load_table(spark, sf, "events"), "ts", "event_type",
    )


Q(QuerySpec(
    name="pl_cusum",
    doc="Two-sided CUSUM changepoint scan over each event type's daily "
        "volume (operators/stats.py:cusum_changepoints; Page 1954). "
        "The max-recursion S+ = max(0, S+ + z - k) is rewritten to "
        "window algebra via S+_t = P_t - min(0, min_prefix(P)) — a "
        "running sum and a running min; all accumulation runs in exact "
        "BIGINTs after z quantizes to ROUND(z*1e6) (a windowed double "
        "sum is association-order dependent: DuckDB uses a segment "
        "tree, a sequential fold does not). Scale: the daily rollup is "
        "the only data-sized shuffle; windows run over O(groups x "
        "days) rows.",
    builder=_cusum_q,
    oracle_sql_str="""
        WITH daily AS (
          SELECT event_type AS grp,
                 CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                 COUNT(*) AS x
          FROM events GROUP BY 1, 2
        ),
        st AS (
          SELECT grp, COUNT(*) AS n_days, SUM(x) AS s, SUM(x*x) AS ss
          FROM daily GROUP BY grp
        ),
        z AS (
          SELECT d.grp, d.day, d.x,
                 CASE WHEN (CAST(ss AS DOUBLE) / CAST(n_days AS DOUBLE)
                   - (CAST(s AS DOUBLE) / CAST(n_days AS DOUBLE))
                     * (CAST(s AS DOUBLE) / CAST(n_days AS DOUBLE))) > 0
                 THEN ROUND(
                   (CAST(d.x AS DOUBLE)
                    - CAST(s AS DOUBLE) / CAST(n_days AS DOUBLE))
                   / sqrt(CAST(ss AS DOUBLE) / CAST(n_days AS DOUBLE)
                     - (CAST(s AS DOUBLE) / CAST(n_days AS DOUBLE))
                       * (CAST(s AS DOUBLE) / CAST(n_days AS DOUBLE))),
                   6)
                 ELSE 0.0 END AS z6
          FROM daily d JOIN st USING (grp)
        ),
        steps AS (
          SELECT grp, day, x,
                 CAST(ROUND(z6 * 1000000.0, 0) AS BIGINT) - 500000
                   AS d_pos,
                 -CAST(ROUND(z6 * 1000000.0, 0) AS BIGINT) - 500000
                   AS d_neg
          FROM z
        ),
        p AS (
          SELECT grp, day, x,
                 SUM(d_pos) OVER w AS p_pos,
                 SUM(d_neg) OVER w AS p_neg
          FROM steps
          WINDOW w AS (PARTITION BY grp ORDER BY day
                       ROWS UNBOUNDED PRECEDING)
        ),
        s AS (
          SELECT grp, day, x,
                 p_pos - LEAST(0, MIN(p_pos) OVER w) AS sp,
                 p_neg - LEAST(0, MIN(p_neg) OVER w) AS sn
          FROM p
          WINDOW w AS (PARTITION BY grp ORDER BY day
                       ROWS UNBOUNDED PRECEDING)
        )
        SELECT grp AS event_type, day, CAST(x AS BIGINT) AS x,
               CAST(sp AS DOUBLE) / 1000000.0 AS s_pos_r6,
               CAST(sn AS DOUBLE) / 1000000.0 AS s_neg_r6,
               sp > 4000000 AS alarm_pos,
               sn > 4000000 AS alarm_neg
        FROM s ORDER BY event_type, day
    """,
))


def _kanon_q(spark, sf):
    from ..operators.privacy import k_anonymity

    orders = load_table(spark, sf, "orders").select(
        "o_orderstatus", "o_orderpriority",
        F.date_trunc("month", F.col("o_orderdate")).alias("month"),
        "o_custkey",
    )
    return k_anonymity(
        orders,
        ("o_orderstatus", "o_orderpriority", "month"),
        "o_custkey", k=5, l_div=5,
    )


Q(QuerySpec(
    name="pl_kanon",
    doc="k-anonymity + l-diversity audit over the (status, priority, "
        "order-month) quasi-identifier with customer key as the "
        "sensitive attribute (operators/privacy.py:k_anonymity; "
        "Sweeney 2002, Machanavajjhala 2007): per equivalence class, "
        "exact n and distinct-sensitive count with at_risk flags at "
        "k=5 / l=5 — the pre-release re-identification check next to "
        "the pl_pii_redact scrub tier. Scale: one class-tuple rollup "
        "(the DISTINCT expands x2, still keyed by class) — shuffle "
        "rows = |classes| at any corpus size.",
    builder=_kanon_q,
    oracle_sql_str="""
        SELECT o_orderstatus, o_orderpriority,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
                 AS month,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS l_distinct,
               COUNT(*) < 5 AS at_risk_k,
               COUNT(DISTINCT o_custkey) < 5 AS at_risk_l
        FROM orders
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3
    """,
))


def _dp_counts_q(spark, sf):
    from ..operators.privacy import dp_counts

    return dp_counts(
        load_table(spark, sf, "documents"), ("source", "lang"),
        epsilon=1.0,
    )


Q(QuerySpec(
    name="pl_dp_counts",
    doc="Per-(source, lang) counts released through the Laplace "
        "mechanism at epsilon=1 (operators/privacy.py:dp_counts; Dwork "
        "2006 — count sensitivity 1, scale b=1/epsilon). The draw is "
        "the Laplace inverse CDF on an md5-derived uniform in (-1,1), "
        "deterministic per group key (fixed-width per-part md5 tokens "
        "— NULL-safe, separator-collision-free) so the oracle replays "
        "it exactly "
        "(a release would salt with a sealed nonce; mechanism "
        "unchanged). ln is the bit-portable libm call the logprob "
        "tiers rely on; noisy counts ROUND 4 with the signed-zero "
        "guard. Scale: one count rollup, O(groups) everything.",
    builder=_dp_counts_q,
    oracle_sql_str="""
        WITH c AS (
          SELECT source, lang, COUNT(*) AS n FROM documents
          GROUP BY source, lang
        ),
        u AS (
          SELECT source, lang, n,
                 CAST(CAST(('0x' || substr(md5(
                     md5(coalesce('v' || source, 'n'))
                     || md5(coalesce('v' || lang, 'n'))),
                   1, 8)) AS BIGINT) % 1999999 - 999999 AS DOUBLE)
                 / 1000000.0 AS u
          FROM c
        )
        SELECT source, lang, CAST(n AS BIGINT) AS n,
               ROUND(CAST(n AS DOUBLE)
                 + (-1.0) * sign(u) * ln(1.0 - abs(u)), 4) + 0.0
                 AS noisy_r4,
               CAST(1.0 AS DOUBLE) AS epsilon
        FROM u ORDER BY source, lang
    """,
))


def _kmv_jaccard_q(spark, sf):
    from ..operators.sketch import _spread, kmv_jaccard

    # spread the COMPACT docs relation before the token explode (32x
    # cheaper shuffle than round-robining the exploded tokens; the
    # in-operator _spread then no-ops)
    toks = (
        _spread(load_table(spark, sf, "documents").select("source", "text"))
        .select(
            "source",
            F.explode(F.split(F.col("text"), r"\s+")).alias("token"),
        )
        .filter(F.col("token") != "")
    )
    return kmv_jaccard(toks, "token", "source", k=256)


Q(QuerySpec(
    name="pl_kmv_jaccard",
    doc="Pairwise vocabulary-overlap (Jaccard) estimates between all "
        "source pairs from per-source KMV signatures (operators/"
        "sketch.py:kmv_jaccard; Beyer et al. 2007) — the SET-operation "
        "member of the mergeable-summary tier: the k smallest hashes "
        "of a union are computable from the two signatures alone, and "
        "the both-sides fraction of that union signature estimates "
        "Jaccard. Partition-local numpy k-min prefilter bounds the "
        "shuffle to <= k rows per (partition, group); the pair stage "
        "is algebra over O(groups x k) signature rows — 190 pairs here "
        "never rescan the corpus. Exact integers except one ROUND-6 "
        "division with the signed-zero guard.",
    builder=_kmv_jaccard_q,
    oracle_sql_str=r"""
        WITH tok AS (
          SELECT source AS grp,
                 unnest(string_split_regex(text, '\s+')) AS t
          FROM documents
        ),
        h AS (
          SELECT DISTINCT grp,
                 CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) AS hv
          FROM tok WHERE t <> ''
        ),
        sig AS (
          SELECT grp, hv FROM (
            SELECT grp, hv,
                   ROW_NUMBER() OVER (PARTITION BY grp ORDER BY hv)
                     AS rn
            FROM h
          ) WHERE rn <= 256
        ),
        g AS (SELECT DISTINCT grp FROM sig),
        p AS (
          SELECT a.grp AS ga, b.grp AS gb
          FROM g a JOIN g b ON a.grp < b.grp
        ),
        e AS (
          SELECT p.ga, p.gb, s.hv,
                 MAX(CASE WHEN s.grp = p.ga THEN 1 ELSE 0 END) AS in_a,
                 MAX(CASE WHEN s.grp = p.gb THEN 1 ELSE 0 END) AS in_b
          FROM p JOIN sig s ON s.grp = p.ga OR s.grp = p.gb
          GROUP BY 1, 2, 3
        ),
        kept AS (
          SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY ga, gb
                                         ORDER BY hv) AS rn
            FROM e
          ) WHERE rn <= 256
        )
        SELECT ga AS src_a, gb AS src_b,
               CAST(COUNT(*) AS BIGINT) AS k_used,
               CAST(SUM(in_a * in_b) AS BIGINT) AS n_both,
               ROUND(CAST(SUM(in_a * in_b) AS DOUBLE)
                     / CAST(COUNT(*) AS DOUBLE), 6) + 0.0 AS jaccard_r6
        FROM kept GROUP BY ga, gb ORDER BY src_a, src_b
    """,
))


def _readability_q(spark, sf):
    from ..operators.text import readability

    return readability(load_table(spark, sf, "documents"))


Q(QuerySpec(
    name="pl_readability",
    doc="Flesch reading-ease + Flesch-Kincaid grade per document "
        "(operators/text.py:readability; Flesch 1948, Kincaid 1975) — "
        "the audience-level complexity feature next to the quality/"
        "gopher tiers. Word/sentence/vowel-group counts are identical "
        "regexp_extract_all aggregates on both engines; the scores are "
        "fixed-shape per-row double expressions over exact INTs, ROUND "
        "4 with the signed-zero guard (reading-ease is a difference "
        "and CAN round to -0.0); wordless docs emit NULLs, never a "
        "zero division. Scale: embarrassingly parallel map, no "
        "shuffle before the output sort.",
    builder=_readability_q,
    oracle_sql_str="""
        WITH base AS (
          SELECT doc_id,
                 len(regexp_extract_all(text, '[A-Za-z]+')) AS words,
                 greatest(1, len(regexp_extract_all(text, '[.!?]+')))
                   AS sentences,
                 len(regexp_extract_all(text, '[aeiouyAEIOUY]+'))
                   AS syllables
          FROM documents
        )
        SELECT doc_id,
               CAST(words AS BIGINT) AS words,
               CAST(sentences AS BIGINT) AS sentences,
               CAST(syllables AS BIGINT) AS syllables,
               CASE WHEN words > 0 THEN ROUND(
                 206.835
                 - 1.015 * (CAST(words AS DOUBLE)
                            / CAST(sentences AS DOUBLE))
                 - 84.6 * (CAST(syllables AS DOUBLE)
                           / CAST(words AS DOUBLE)), 4) END + 0.0
                 AS ease_r4,
               CASE WHEN words > 0 THEN ROUND(
                 0.39 * (CAST(words AS DOUBLE)
                         / CAST(sentences AS DOUBLE))
                 + 11.8 * (CAST(syllables AS DOUBLE)
                           / CAST(words AS DOUBLE)) - 15.59, 4) END
                 + 0.0 AS grade_r4
        FROM base ORDER BY doc_id
    """,
))


def _mannwhitney_q(spark, sf):
    from ..operators.stats import mann_whitney_u

    return mann_whitney_u(
        load_table(spark, sf, "events"),
        "value", "event_type", "purchase", "view",
    )


Q(QuerySpec(
    name="pl_mannwhitney",
    doc="Mann-Whitney U (Wilcoxon rank-sum) test between the purchase "
        "and view cohorts (operators/stats.py:mann_whitney_u) — the "
        "nonparametric partner to pl_welch_ttest. EXACT INTEGER rank "
        "algebra: doubled midranks 2*below + c + 1 per tie class; the "
        "doubled rank sum, 2*U_a, and the c^3 tie sum all carried in "
        "DECIMAL(38,0) (BIGINT products wrap around n~3e9 cohorts); "
        "z by interleaved double "
        "divisions (the kappa discipline) with the 0.5 continuity "
        "correction. The value-order prefix sum buckets on a deterministic "
        "equal-width grid with per-bucket prefix offsets — no "
        "single-task global window at any value cardinality, and no "
        "sampled range boundaries (which differ per plan branch).",
    builder=_mannwhitney_q,
    oracle_sql_str="""
        WITH per_v AS (
          SELECT value AS v,
                 SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                     END) AS c_a,
                 SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0
                     END) AS c_b
          FROM events
          WHERE event_type IN ('purchase', 'view')
          GROUP BY value
        ),
        cc AS (SELECT v, c_a, c_b, c_a + c_b AS c FROM per_v),
        ranked AS (
          SELECT *,
                 SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - c
                   AS below
          FROM cc
        ),
        agg AS (
          SELECT SUM(c_a) AS n_a, SUM(c_b) AS n_b,
                 SUM(CAST(c_a AS DECIMAL(38,0))
                     * CAST(2 * below + c + 1 AS DECIMAL(38,0)))
                   AS r2_a,
                 SUM(CAST(c AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0))
                     * CAST(c AS DECIMAL(38,0))
                     - CAST(c AS DECIMAL(38,0))) AS tie3
          FROM ranked
        ),
        fin AS (
          SELECT n_a, n_b,
                 r2_a - CAST(n_a AS DECIMAL(38,0))
                   * CAST(n_a + 1 AS DECIMAL(38,0)) AS u2,
                 CAST(r2_a - CAST(n_a AS DECIMAL(38,0))
                   * CAST(n_a + 1 AS DECIMAL(38,0)) AS DOUBLE) / 2.0
                   AS u,
                 CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0 AS mu,
                 (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0)
                 * ((CAST(n_a + n_b AS DOUBLE) + 1.0)
                    - CAST(tie3 AS DOUBLE)
                      / (CAST(n_a + n_b AS DOUBLE)
                         * (CAST(n_a + n_b AS DOUBLE) - 1.0)))
                   AS var
          FROM agg
        )
        SELECT 'purchase' AS group_a, 'view' AS group_b,
               CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
               CAST(u2 AS BIGINT) AS u2_a,
               ROUND(u, 1) + 0.0 AS u_a_r1,
               ROUND(CASE WHEN n_a > 0 AND n_b > 0 AND var > 0 THEN
                 (CASE WHEN u > mu THEN u - 0.5
                       WHEN u < mu THEN u + 0.5
                       ELSE u END - mu) / sqrt(var) END, 6) + 0.0
                 AS z_r6
        FROM fin
    """,
))


def _autocorr_q(spark, sf):
    from ..operators.stats import autocorr_daily

    return autocorr_daily(
        load_table(spark, sf, "events"), "ts", "event_type", max_lag=7,
    )


def _autocorr_oracle() -> str:
    leads = ",\n                 ".join(
        f"LEAD(x, {k}) OVER w AS x_{k}" for k in range(1, 8)
    )
    folds = []
    for k in range(1, 8):
        folds.append(
            f"SUM(CASE WHEN x_{k} IS NOT NULL THEN "
            f"CAST(x AS DECIMAL(38,0)) * CAST(x_{k} AS DECIMAL(38,0)) "
            f"END) AS s_xy_{k},\n                 "
            f"SUM(CASE WHEN x_{k} IS NOT NULL THEN "
            f"CAST(x + x_{k} AS DECIMAL(38,0)) END) AS s_pair_{k},\n"
            f"                 "
            f"SUM(CASE WHEN x_{k} IS NOT NULL THEN 1 ELSE 0 END) "
            f"AS n_pairs_{k}"
        )
    unions = "\n          UNION ALL\n          ".join(
        f"SELECT grp, n_days, s, s_xx, {k} AS lag, s_xy_{k} AS s_xy, "
        f"s_pair_{k} AS s_pair, n_pairs_{k} AS n_pairs FROM folded"
        for k in range(1, 8)
    )
    return f"""
        WITH daily AS (
          SELECT event_type AS grp,
                 CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                 COUNT(*) AS x
          FROM events GROUP BY 1, 2
        ),
        lagged AS (
          SELECT grp, x,
                 {leads}
          FROM daily
          WINDOW w AS (PARTITION BY grp ORDER BY day)
        ),
        folded AS (
          SELECT grp, COUNT(*) AS n_days, SUM(x) AS s,
                 SUM(CAST(x AS DECIMAL(38,0))
                     * CAST(x AS DECIMAL(38,0))) AS s_xx,
                 {",".join(folds)}
          FROM lagged GROUP BY grp
        ),
        lags AS (
          {unions}
        )
        SELECT grp AS event_type, CAST(lag AS INT) AS lag,
               CAST(n_days AS BIGINT) AS n_days,
               CAST(n_pairs AS BIGINT) AS n_pairs,
               CASE WHEN n_pairs > 1 AND
                 (CAST(n_days AS DECIMAL(38,0))
                  * CAST(n_days AS DECIMAL(38,0)) * s_xx
                  - CAST(n_days AS DECIMAL(38,0))
                    * CAST(s AS DECIMAL(38,0))
                    * CAST(s AS DECIMAL(38,0))) > 0
               THEN ROUND(
                 CAST(CAST(n_days AS DECIMAL(38,0))
                      * CAST(n_days AS DECIMAL(38,0)) * s_xy
                      - CAST(n_days AS DECIMAL(38,0))
                        * CAST(s AS DECIMAL(38,0)) * s_pair
                      + CAST(n_days - lag AS DECIMAL(38,0))
                        * CAST(s AS DECIMAL(38,0))
                        * CAST(s AS DECIMAL(38,0)) AS DOUBLE)
                 / CAST(CAST(n_days AS DECIMAL(38,0))
                        * CAST(n_days AS DECIMAL(38,0)) * s_xx
                        - CAST(n_days AS DECIMAL(38,0))
                          * CAST(s AS DECIMAL(38,0))
                          * CAST(s AS DECIMAL(38,0)) AS DOUBLE), 6)
                 + 0.0 END AS acf_r6
        FROM lags ORDER BY event_type, lag
    """


Q(QuerySpec(
    name="pl_autocorr",
    doc="Lag 1-7 autocorrelation of each event type's daily volume "
        "(operators/stats.py:autocorr_daily) — the seasonality/"
        "persistence diagnostic beside pl_cusum and pl_ewma (a weekly "
        "cycle shows as an acf_7 spike). The ACF numerator and "
        "denominator are assembled from exact BIGINT day-counts with "
        "denominators cleared by n^2 — every term a DECIMAL(38,0) "
        "product, ONE double division per (group, lag), ROUND 6 with "
        "the signed-zero guard. Scale: daily rollup is the only "
        "data-sized shuffle; the 7 lead-windows run over O(groups x "
        "days) rows.",
    builder=_autocorr_q,
    oracle_sql_str=_autocorr_oracle(),
))


def _srm_q(spark, sf):
    from ..operators.stats import srm_check

    return srm_check(
        load_table(spark, sf, "events"), "user_id", "event_type",
    )


Q(QuerySpec(
    name="pl_srm",
    doc="Sample-ratio-mismatch guardrail per event-type segment "
        "(operators/stats.py:srm_check; Fabijan et al. 2019 — the "
        "first check an experimentation platform runs). Arms by "
        "deterministic md5 parity of user_id; for 50/50 two-arm the "
        "chi-square collapses to (n0-n1)^2/n — exact BIGINTs, one "
        "double division, mismatch flag at the df=1 p=.05 critical "
        "value 3.841. Scale: one count rollup, O(groups).",
    builder=_srm_q,
    oracle_sql_str="""
        WITH a AS (
          SELECT event_type AS grp,
                 CAST(('0x' || substr(md5(
                   CAST(user_id AS VARCHAR) || '#srm'), 1, 8))
                   AS BIGINT) % 2 AS arm
          FROM events
        ),
        c AS (
          SELECT grp, COUNT(*) AS n,
                 SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n_arm0,
                 SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n_arm1
          FROM a GROUP BY grp
        )
        SELECT grp AS event_type, CAST(n AS BIGINT) AS n,
               CAST(n_arm0 AS BIGINT) AS n_arm0,
               CAST(n_arm1 AS BIGINT) AS n_arm1,
               ROUND(CAST((n_arm0 - n_arm1) * (n_arm0 - n_arm1)
                 AS DOUBLE) / CAST(n AS DOUBLE), 6) + 0.0 AS chi2_r6,
               CAST((n_arm0 - n_arm1) * (n_arm0 - n_arm1) AS DOUBLE)
                 / CAST(n AS DOUBLE) > 3.841 AS mismatch
        FROM c ORDER BY event_type
    """,
))


def _cuped_q(spark, sf):
    from ..operators.stats import cuped_adjust

    return cuped_adjust(
        load_table(spark, sf, "events"),
        "user_id", "value", "ts", "2024-01-16 00:00:00",
    )


Q(QuerySpec(
    name="pl_cuped",
    doc="CUPED variance reduction over the user metric (operators/"
        "stats.py:cuped_adjust; Deng, Xu, Kohavi & Walker WSDM 2013): "
        "theta = cov(pre, post)/var(pre) over per-user period means, "
        "var_adj = var_post - cov^2/var_pre — the experiment-"
        "sensitivity multiplier. Per-unit means are scaled-BIGINT "
        "averages quantized to 1e-6; cross-unit moments are n-cleared "
        "DECIMAL(38,0) integer products (the autocorr discipline), so "
        "both engines agree bit-for-bit before three double "
        "divisions. Scale: one (unit, period) rollup then a "
        "constant-size fold.",
    builder=_cuped_q,
    oracle_sql_str="""
        WITH per AS (
          SELECT user_id AS u,
                 CASE WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
                      THEN 1 ELSE 0 END AS post,
                 COUNT(*) AS c,
                 SUM(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT))
                   AS sq
          FROM events GROUP BY 1, 2
        ),
        m6 AS (
          SELECT u, post,
                 CAST(floor(CAST(sq AS DOUBLE) / CAST(c AS DOUBLE)
                      + 0.5) AS BIGINT) AS mean6
          FROM per
        ),
        wide AS (
          SELECT u,
                 MAX(CASE WHEN post = 0 THEN mean6 END) AS pre6,
                 MAX(CASE WHEN post = 1 THEN mean6 END) AS post6
          FROM m6 GROUP BY u
        ),
        coh AS (
          SELECT * FROM wide
          WHERE pre6 IS NOT NULL AND post6 IS NOT NULL
        ),
        mom AS (
          SELECT COUNT(*) AS n,
                 SUM(pre6) AS s_x, SUM(post6) AS s_y,
                 SUM(CAST(pre6 AS DECIMAL(38,0))
                     * CAST(pre6 AS DECIMAL(38,0))) AS s_xx,
                 SUM(CAST(post6 AS DECIMAL(38,0))
                     * CAST(post6 AS DECIMAL(38,0))) AS s_yy,
                 SUM(CAST(pre6 AS DECIMAL(38,0))
                     * CAST(post6 AS DECIMAL(38,0))) AS s_xy
          FROM coh
        ),
        ncl AS (
          SELECT n,
                 CAST(CAST(n AS DECIMAL(38,0)) * s_xx
                   - CAST(s_x AS DECIMAL(38,0))
                     * CAST(s_x AS DECIMAL(38,0)) AS DOUBLE) AS var_x,
                 CAST(CAST(n AS DECIMAL(38,0)) * s_yy
                   - CAST(s_y AS DECIMAL(38,0))
                     * CAST(s_y AS DECIMAL(38,0)) AS DOUBLE) AS var_y,
                 CAST(CAST(n AS DECIMAL(38,0)) * s_xy
                   - CAST(s_x AS DECIMAL(38,0))
                     * CAST(s_y AS DECIMAL(38,0)) AS DOUBLE) AS cov
          FROM mom
        )
        SELECT CAST(n AS BIGINT) AS n_units,
               ROUND(CASE WHEN var_x > 0 THEN cov / var_x END, 6)
                 + 0.0 AS theta_r6,
               ROUND(var_y / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                 * 1e12), 6) + 0.0 AS var_post_r6,
               ROUND(CASE WHEN var_x > 0 THEN
                   (var_y - cov * cov / var_x)
                   / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * 1e12)
                 ELSE var_y / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                   * 1e12) END, 6) + 0.0 AS var_adj_r6,
               ROUND(CASE WHEN var_y > 0 THEN
                   100.0 * (1.0 - (CASE WHEN var_x > 0 THEN
                     (var_y - cov * cov / var_x)
                     / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * 1e12)
                   ELSE var_y / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                     * 1e12) END)
                   / (var_y / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                      * 1e12)))
                 ELSE 0.0 END, 4) + 0.0 AS reduction_pct_r4
        FROM ncl
    """,
))


def _retention_q(spark, sf):
    from ..operators.sessions import retention_matrix

    return retention_matrix(
        load_table(spark, sf, "events"), "user_id", "ts",
    )


Q(QuerySpec(
    name="pl_retention",
    doc="Weekly cohort retention triangle over event users (operators/"
        "sessions.py:retention_matrix) — cohort = ISO Monday week of "
        "first activity; cell (cohort, offset) = fraction active that "
        "week. Exact BIGINT counts, one ROUND-6 division per cell. "
        "Scale: one (unit, week) distinct rollup keyed by unit; the "
        "triangle itself is O(cohorts x offsets) metadata.",
    builder=_retention_q,
    oracle_sql_str="""
        WITH uw AS (
          SELECT DISTINCT user_id AS u,
                 CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk
          FROM events
        ),
        fst AS (SELECT u, MIN(wk) AS cohort FROM uw GROUP BY u),
        cn AS (
          SELECT cohort, COUNT(*) AS cohort_n FROM fst GROUP BY cohort
        ),
        j AS (
          SELECT f.cohort,
                 date_diff('day', CAST(f.cohort AS DATE),
                           CAST(uw.wk AS DATE)) // 7 AS week_offset
          FROM uw JOIN fst f ON f.u = uw.u
        ),
        act AS (
          SELECT cohort, week_offset, COUNT(*) AS active_n
          FROM j GROUP BY 1, 2
        )
        SELECT act.cohort AS cohort_week,
               CAST(week_offset AS INT) AS week_offset,
               CAST(cohort_n AS BIGINT) AS cohort_n,
               CAST(active_n AS BIGINT) AS active_n,
               ROUND(CAST(active_n AS DOUBLE)
                     / CAST(cohort_n AS DOUBLE), 6) + 0.0
                 AS retention_r6
        FROM act JOIN cn USING (cohort)
        ORDER BY cohort_week, week_offset
    """,
))


def _km_q(spark, sf):
    from ..operators.sessions import kaplan_meier

    return kaplan_meier(
        load_table(spark, sf, "events"), "user_id", "ts", "event_type",
    )


Q(QuerySpec(
    name="pl_kaplan_meier",
    doc="Kaplan-Meier survival over user lifetimes per event type "
        "(operators/sessions.py:kaplan_meier; Kaplan & Meier 1958) — "
        "retention with right-censoring: units whose last event falls "
        "within 7 days of the corpus end leave the risk set without "
        "counting as deaths. The product-limit estimator runs as exp "
        "of an ordered prefix sum of ln(1 - d/n) terms quantized to "
        "1e-6 BIGINTs (the CUSUM discipline); a full-wipe step pins "
        "S = 0 with no ln(0). Scale: the (group, unit) rollup is the "
        "only data-sized stage; the curve is O(groups x lifetimes).",
    builder=_km_q,
    oracle_sql_str="""
        WITH pu AS (
          SELECT event_type AS grp, user_id AS u,
                 MIN(ts) AS first_ts, MAX(ts) AS last_ts
          FROM events GROUP BY 1, 2
        ),
        g AS (SELECT MAX(ts) AS gmax FROM events),
        units AS (
          SELECT grp,
                 date_diff('day', CAST(first_ts AS DATE),
                           CAST(last_ts AS DATE)) AS t,
                 CASE WHEN last_ts < gmax - INTERVAL 7 DAY
                      THEN 1 ELSE 0 END AS observed
          FROM pu CROSS JOIN g
        ),
        by_t AS (
          SELECT grp, t, COUNT(*) AS c_all, SUM(observed) AS deaths
          FROM units GROUP BY 1, 2
        ),
        risk AS (
          SELECT *,
                 SUM(c_all) OVER (PARTITION BY grp ORDER BY t DESC
                                  ROWS UNBOUNDED PRECEDING) AS n_risk
          FROM by_t
        ),
        st AS (
          SELECT *,
                 CASE WHEN deaths = 0 THEN 0
                      WHEN deaths < n_risk THEN
                        CAST(ROUND(ln(1.0 - CAST(deaths AS DOUBLE)
                          / CAST(n_risk AS DOUBLE)) * 1000000.0, 0)
                          AS BIGINT)
                 END AS term6
          FROM risk
        ),
        acc AS (
          SELECT *,
                 MAX(CASE WHEN term6 IS NULL THEN 1 ELSE 0 END)
                   OVER w AS wiped,
                 SUM(term6) OVER w AS lnsum6
          FROM st
          WINDOW w AS (PARTITION BY grp ORDER BY t
                       ROWS UNBOUNDED PRECEDING)
        )
        SELECT grp AS event_type, CAST(t AS INT) AS t_days,
               CAST(n_risk AS BIGINT) AS n_risk,
               CAST(deaths AS BIGINT) AS deaths,
               CASE WHEN wiped = 1 THEN 0.0
                    ELSE ROUND(exp(CAST(lnsum6 AS DOUBLE)
                                   / 1000000.0), 6) END + 0.0
                 AS surv_r6
        FROM acc WHERE deaths > 0
        ORDER BY event_type, t_days
    """,
))


Q(QuerySpec(
    name="pl_cramers_v",
    doc="Cramér's V association between source and language over the "
        "corpus (operators/profile.py:cramers_v) — the normalized "
        "chi-square partner to pl_label_kl. Exact integer contingency "
        "counts; each cell term is ((o*n - r*c) as DECIMAL(38,0) -> "
        "double)^2 / (n*r*c) so no rational expected count ever "
        "materializes; terms fold in fixed (a, b) order (the psi/"
        "label_kl discipline). Scale: one (a, b) aggregation, O(R x C) "
        "everything after.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.profile", fromlist=["cramers_v"]
    ).cramers_v(load_table(spark, sf, "documents"), "source", "lang"),
    oracle_sql_str="""
        WITH raw AS (
          SELECT source AS a, lang AS b, COUNT(*) AS o
          FROM documents GROUP BY 1, 2
        ),
        ra AS (SELECT a, SUM(o) AS r FROM raw GROUP BY a),
        cb AS (SELECT b, SUM(o) AS c FROM raw GROUP BY b),
        nn AS (SELECT SUM(o) AS n FROM raw),
        cnt AS (
          SELECT g.a, g.b, COALESCE(raw.o, 0) AS o
          FROM (SELECT a, b FROM ra CROSS JOIN cb) g
          LEFT JOIN raw ON raw.a = g.a AND raw.b = g.b
        ),
        cells AS (
          SELECT cnt.a, cnt.b, nn.n,
                 CAST(CAST(o AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0))
                      - CAST(r AS DECIMAL(38,0))
                        * CAST(c AS DECIMAL(38,0)) AS DOUBLE)
                 * CAST(CAST(o AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0))
                        - CAST(r AS DECIMAL(38,0))
                          * CAST(c AS DECIMAL(38,0)) AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(r AS DOUBLE)
                    * CAST(c AS DOUBLE)) AS term
          FROM cnt JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN nn
        ),
        folded AS (
          SELECT n, COUNT(*) AS n_cells,
                 COUNT(DISTINCT a) AS rows_a,
                 COUNT(DISTINCT b) AS cols_b,
                 list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE),
                                list(term ORDER BY a, b)),
                   (x, y) -> x + y) AS chi2
          FROM cells GROUP BY n
        )
        SELECT CAST(n AS BIGINT) AS n,
               CAST(rows_a AS BIGINT) AS rows_a,
               CAST(cols_b AS BIGINT) AS cols_b,
               ROUND(chi2, 6) + 0.0 AS chi2_r6,
               ROUND(CASE WHEN least(rows_a, cols_b) - 1 > 0 THEN
                 sqrt(chi2 / (CAST(n AS DOUBLE)
                   * CAST(least(rows_a, cols_b) - 1 AS DOUBLE)))
                 END, 6) + 0.0 AS v_r6
        FROM folded
    """,
))


def _gini_q(spark, sf):
    from ..operators.stats import gini_concentration

    return gini_concentration(
        load_table(spark, sf, "events"), "user_id", "value", "event_type",
    )


Q(QuerySpec(
    name="pl_gini",
    doc="Per-event-type Gini coefficient of per-user value "
        "concentration (operators/stats.py:gini_concentration) — the "
        "inequality audit beside pl_skew_report. Per-unit totals "
        "quantize to 1e-6 scaled BIGINTs; ranks come from the hardened "
        "distributed exact_rank (range partition + offsets — no group "
        "sorts in one task); the sorted-rank identity G = 2*sum(i*x_i)"
        "/(n*sum x) - (n+1)/n folds from exact DECIMAL(38,0) "
        "rank-weighted sums, one double expression per group.",
    builder=_gini_q,
    oracle_sql_str="""
        WITH pu AS (
          SELECT event_type AS grp, user_id AS u,
                 SUM(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT))
                   AS x
          FROM events GROUP BY 1, 2
        ),
        r AS (
          SELECT grp, u, x,
                 ROW_NUMBER() OVER (PARTITION BY grp ORDER BY x, u)
                   AS rk
          FROM pu
        ),
        a AS (
          SELECT grp, COUNT(*) AS n, SUM(x) AS sx,
                 SUM(CAST(rk AS DECIMAL(38,0))
                     * CAST(x AS DECIMAL(38,0))) AS srx
          FROM r GROUP BY grp
        )
        SELECT grp AS event_type, CAST(n AS BIGINT) AS n_units,
               ROUND(CASE WHEN n > 1 AND sx > 0 THEN
                 (2.0 * CAST(srx AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
                 - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE)
               END, 6) + 0.0 AS gini_r6
        FROM a ORDER BY event_type
    """,
))


# ---- xxhash64 deployment tier (round 9) -------------------------------------
#
# VERDICT r8: the md5 portability tax is the only floor class whose
# DuckDB ratio WIDENS with volume (JVM md5 ~3x slower per call).  The
# dual-mode contract (operators/sketch.py:_hash32): the md5 form of each
# sketch query stays registered and carries the full oracle hash row
# (the portable twin); the *_xxh form below is the DEPLOYMENT path —
# same algebra, hash swapped for the whole-stage-codegen xxhash64
# intrinsic.  DuckDB has no xxhash64, so these register rows-only and
# are gated in tests/test_sketch.py / test_stats.py by the invariants
# that hold for ANY uniform hash: CMS est >= exact, KMV inside the
# 1/sqrt(k) error envelope, SRM arm counts summing to n on a fair
# split.  Excluded from the driver's 50-slot correctness window by
# design (rows-only entries cannot produce hash rows — VERDICT r8 #3).


Q(QuerySpec(
    name="pl_cms_registers_xxh",
    doc="DEPLOYMENT form of pl_cms_registers: identical Count-Min "
        "algebra (4 x 256 dense counter grid over lineitem part "
        "demand) with the bucket hash swapped from the salted-md5 "
        "slice to the multi-argument xxhash64(v, row) codegen "
        "intrinsic — no concat, no digest string, no Python. The md5 "
        "twin carries the oracle hash row; this form is what a 100 TB "
        "run should execute (the md5 portability tax is linear in "
        "volume and exists only to let DuckDB replay the sketch).",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.sketch", fromlist=["cms_counters"]
    ).cms_counters(load_table(spark, sf, "lineitem"), "l_partkey",
                   depth=4, width=256, hash_mode="xxh")
    .orderBy("row", "bucket"),
    has_oracle=False,
))


Q(QuerySpec(
    name="pl_cms_estimate_xxh",
    doc="DEPLOYMENT form of pl_cms_estimate: exact top-20 parts next "
        "to their CMS estimate under the xxhash64 bucket hash. The "
        "one-sided guarantee est >= exact holds for ANY hash choice "
        "and is pinned for this form in tests/test_sketch.py; the md5 "
        "twin carries the oracle hash row.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.sketch",
        fromlist=["cms_point_estimates"],
    ).cms_point_estimates(load_table(spark, sf, "lineitem"), "l_partkey",
                          depth=4, width=256, top_n=20,
                          hash_mode="xxh"),
    has_oracle=False,
))


Q(QuerySpec(
    name="pl_kmv_distinct_xxh",
    doc="DEPLOYMENT form of pl_kmv_distinct: KMV over the low 32 bits "
        "of xxhash64(o_custkey) instead of the md5 slice — same jvm "
        "distinct->TakeOrdered k-min plan, same exact-integer "
        "estimator (k-1)*2^32 DIV h_(k), and include_exact=False: the "
        "n_exact audit column (a full two-exchange COUNT DISTINCT) is "
        "the md5 ledger twin's job, not the deployment sketch's. "
        "Estimator accuracy is hash-independent (any uniform 32-bit "
        "hash); the 1/sqrt(k) envelope gate in tests/test_sketch.py "
        "runs against THIS form, and the md5 twin carries the oracle "
        "hash row.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.sketch", fromlist=["kmv_distinct"]
    ).kmv_distinct(load_table(spark, sf, "orders"), "o_custkey", k=256,
                   hash_mode="xxh", include_exact=False),
    has_oracle=False,
))


def _kmv_jaccard_xxh_q(spark, sf):
    from ..operators.sketch import _spread, kmv_jaccard

    toks = (
        _spread(load_table(spark, sf, "documents").select("source", "text"))
        .select(
            "source",
            F.explode(F.split(F.col("text"), r"\s+")).alias("token"),
        )
        .filter(F.col("token") != "")
    )
    return kmv_jaccard(toks, "token", "source", k=256, hash_mode="xxh")


Q(QuerySpec(
    name="pl_kmv_jaccard_xxh",
    doc="DEPLOYMENT form of pl_kmv_jaccard: per-source KMV signatures "
        "over xxhash64(token) & 0xffffffff — the hash ladder that "
        "dominates the md5 form's wall clock collapses to one codegen "
        "intrinsic per token. Signature algebra, union-signature "
        "Jaccard estimator, and the single persisted corpus scan are "
        "unchanged; tests gate the estimates against the exact "
        "pairwise Jaccard envelope, and the md5 twin carries the "
        "oracle hash row.",
    builder=_kmv_jaccard_xxh_q,
    has_oracle=False,
))


Q(QuerySpec(
    name="pl_srm_xxh",
    doc="DEPLOYMENT form of pl_srm: unit-to-arm assignment by "
        "pmod(xxhash64(user_id, 'srm'), 2) instead of md5 parity — "
        "the assignment hash is the per-row cost of the guardrail, so "
        "the deployment path must not pay the digest-string tax. "
        "Chi-square algebra unchanged; tests pin arm-count "
        "conservation and the fair-split non-flag, and the md5 twin "
        "carries the oracle hash row.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.stats", fromlist=["srm_check"]
    ).srm_check(load_table(spark, sf, "events"), "user_id",
                "event_type", hash_mode="xxh"),
    has_oracle=False,
))


# ---- agentic-loop end-to-end demo (round 9, r8 verdict #8) ------------------


def _graph_agent_loop(spark, sf):
    """EventLoopNode-style iterate-judge-accept loop executed through
    GraphRunner (reference event_loop_node.py:227-1019): a generate
    node drafts a summary per document (first 15*2^(attempt-1) words —
    the deterministic stand-in for an LLM draft), the registered judge
    surface (functions/llm.py:judge_udf heuristic tier,
    conversation_judge.py:25-104) scores every draft ACCEPT / RETRY /
    ESCALATE, RETRY rows loop back through the generate node with a
    bigger budget via a CONDITIONAL feedback edge on scalar memory,
    and rows still RETRY after 3 attempts escalate (the reference's
    max-attempts rule, event_loop_node.py max_iterations).

    Loop control is a per-iteration count() on the shrinking pending
    relation — the driver-side event-loop heartbeat, bounded by the
    attempt cap (3 actions total); every per-row transformation stays
    a lazy DataFrame op.  The whole loop is deterministic, so the
    DuckDB oracle replays it as a 3-way unrolled CASE cascade and the
    driver row carries a full hash.
    """
    from ..functions.llm import judge_udf
    from ..plans.graph import EdgeSpec, GraphRunner, GraphSpec, NodeSpec

    judge = judge_udf("heuristic", min_chars=120)

    def load(memory):
        memory["attempt"] = 0
        memory["n_pending"] = -1
        return load_table(spark, sf, "documents").select("doc_id", "text")

    def step(pending, memory):
        a = memory["attempt"] + 1
        memory["attempt"] = a
        k = 15 * (2 ** (a - 1))
        judged = pending.select(
            "doc_id",
            "text",
            F.concat_ws(
                " ", F.slice(F.split(F.col("text"), " "), 1, k)
            ).alias("draft"),
        ).withColumn("verdict", judge(F.col("draft")))
        resolved = judged.filter(
            (F.col("verdict") != "RETRY") | F.lit(a >= 3)
        ).select(
            "doc_id",
            F.when(F.col("verdict") == "RETRY", F.lit("ESCALATE"))
            .otherwise(F.col("verdict"))
            .alias("verdict"),
            F.lit(a).cast("int").alias("n_attempts"),
            F.length("draft").cast("int").alias("draft_chars"),
        )
        done = memory.get("done")
        memory["done"] = (
            resolved if done is None else done.unionByName(resolved)
        )
        nxt = judged.filter(
            (F.col("verdict") == "RETRY") & F.lit(a < 3)
        ).select("doc_id", "text")
        # the event-loop heartbeat: ONE bounded action per iteration
        memory["n_pending"] = nxt.count() if a < 3 else 0
        return nxt

    def finalize(done, memory):
        # materialize before the global sort: rangepartitioning SAMPLES
        # its child first, which would run the judge_udf ArrowEvalPython
        # cascade twice (r12 range-sampling audit; per-run persist,
        # released between queries)
        from ..operators.dedup import _materialize

        return _materialize(done).orderBy("doc_id")

    g = GraphSpec(
        nodes={
            "load": NodeSpec("load", "python", fn=load, output="pending"),
            "step": NodeSpec("step", "python", fn=step,
                             inputs=["pending"], output="pending"),
            "finalize": NodeSpec("finalize", "python", fn=finalize,
                                 inputs=["done"], output="final"),
        },
        edges=[
            EdgeSpec("load", "step"),
            # the feedback loop: retry while anything is pending ...
            EdgeSpec("step", "step", condition="n_pending > 0",
                     priority=1),
            # ... else emit the accumulated verdicts
            EdgeSpec("step", "finalize", condition="n_pending == 0"),
        ],
        entry="load",
        terminals={"finalize"},
    )
    res = GraphRunner(spark).execute(g)
    assert res.completed
    return res.memory["final"]


Q(QuerySpec(
    name="pl_graph_agent_loop",
    doc="Agentic iterate-judge-accept loop end-to-end through "
        "GraphRunner + the registered judge surface (plans/graph.py "
        "conditional feedback edges + functions/llm.py judge_udf "
        "heuristic tier; reference event_loop_node.py:227-1019): "
        "per-document drafts grow 15 -> 30 -> 60 words until the "
        "judge ACCEPTs (>= 120 chars, no error/refusal marker), "
        "ESCALATEs (marker), or the 3-attempt cap escalates. "
        "Deterministic by construction, so the oracle replays the "
        "whole loop as an unrolled CASE cascade and the driver row "
        "carries a full hash. Emits (doc_id, verdict, n_attempts, "
        "draft_chars) ordered.",
    builder=_graph_agent_loop,
    oracle_sql_str="""
        WITH w AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ),
        d AS (
          SELECT doc_id,
                 array_to_string(ws[1:15], ' ') AS d1,
                 array_to_string(ws[1:30], ' ') AS d2,
                 array_to_string(ws[1:60], ' ') AS d3
          FROM w
        ),
        j AS (
          SELECT doc_id,
                 length(d1) AS l1, length(d2) AS l2, length(d3) AS l3,
                 CASE WHEN length(trim(d1)) < 120 THEN 'RETRY'
                      WHEN lower(d1) LIKE '%i cannot%'
                        OR lower(d1) LIKE '%error:%'
                        OR lower(d1) LIKE '%traceback%' THEN 'ESCALATE'
                      ELSE 'ACCEPT' END AS v1,
                 CASE WHEN length(trim(d2)) < 120 THEN 'RETRY'
                      WHEN lower(d2) LIKE '%i cannot%'
                        OR lower(d2) LIKE '%error:%'
                        OR lower(d2) LIKE '%traceback%' THEN 'ESCALATE'
                      ELSE 'ACCEPT' END AS v2,
                 CASE WHEN length(trim(d3)) < 120 THEN 'RETRY'
                      WHEN lower(d3) LIKE '%i cannot%'
                        OR lower(d3) LIKE '%error:%'
                        OR lower(d3) LIKE '%traceback%' THEN 'ESCALATE'
                      ELSE 'ACCEPT' END AS v3
          FROM d
        )
        SELECT doc_id,
               CASE WHEN v1 <> 'RETRY' THEN v1
                    WHEN v2 <> 'RETRY' THEN v2
                    WHEN v3 <> 'RETRY' THEN v3
                    ELSE 'ESCALATE' END AS verdict,
               CAST(CASE WHEN v1 <> 'RETRY' THEN 1
                         WHEN v2 <> 'RETRY' THEN 2
                         ELSE 3 END AS INT) AS n_attempts,
               CAST(CASE WHEN v1 <> 'RETRY' THEN l1
                         WHEN v2 <> 'RETRY' THEN l2
                         ELSE l3 END AS INT) AS draft_chars
        FROM j ORDER BY doc_id
    """,
))


def _graph_tool_loop(spark, sf):
    """Agentic TOOL-EXECUTION loop (reference event_loop_node.py's tool
    path): each iteration the agent calls the registered read-only SQL
    tool surface (engine.Engine.sql — the reference csv_sql envelope:
    success flag, rows, read-only gate) with a progressively BROADER
    search pattern, reads the envelope, and decides ACCEPT (enough
    hits), RETRY (broaden via the feedback edge), or ESCALATE (ladder
    exhausted).  The emitted relation is the loop TRACE — one row per
    tool call actually made — so the oracle pins not just the final
    answer but the control-flow path itself.
    """
    from ..engine import Engine
    from ..plans.graph import EdgeSpec, GraphRunner, GraphSpec, NodeSpec

    patterns = [
        "distributed query optimizer",
        "spark window",
        "window",
    ]
    want = 50
    # bind the Engine to THIS sf snapshot — its constructor registers
    # views for its sf_dir, and the default would shadow spec.run's
    eng = Engine(spark, sf)

    def init(memory):
        memory["attempt"] = 0
        memory["n_hits"] = -1
        memory["trace"] = []
        return load_table(spark, sf, "documents").select("doc_id")

    def search(df, memory):
        a = memory["attempt"] + 1
        memory["attempt"] = a
        pat = patterns[a - 1]
        res = eng.sql(
            "SELECT COUNT(*) AS n FROM documents WHERE text LIKE "
            f"'%{pat}%'"
        )
        assert res.success, res.error
        n = int(res.rows[0]["n"])
        memory["n_hits"] = n
        if n >= want:
            verdict = "ACCEPT"
        elif a < len(patterns):
            verdict = "RETRY"
        else:
            verdict = "ESCALATE"
        memory["trace"] = memory["trace"] + [(a, pat, n, verdict)]
        memory["resolved"] = 1 if verdict != "RETRY" else 0
        return df

    def report(df, memory):
        return spark.createDataFrame(
            memory["trace"],
            "attempt int, pattern string, n_hits bigint, verdict string",
        ).orderBy("attempt")

    g = GraphSpec(
        nodes={
            "init": NodeSpec("init", "python", fn=init, output="docs"),
            "search": NodeSpec("search", "python", fn=search,
                               inputs=["docs"], output="docs"),
            "report": NodeSpec("report", "python", fn=report,
                               inputs=["docs"], output="final"),
        },
        edges=[
            EdgeSpec("init", "search"),
            EdgeSpec("search", "search", condition="resolved == 0",
                     priority=1),
            EdgeSpec("search", "report", condition="resolved == 1"),
        ],
        entry="init",
        terminals={"report"},
    )
    res = GraphRunner(spark).execute(g)
    assert res.completed
    return res.memory["final"]


Q(QuerySpec(
    name="pl_graph_tool_loop",
    doc="Agentic tool-execution loop through GraphRunner + the "
        "read-only SQL tool surface (engine.Engine.sql envelope; "
        "reference event_loop_node.py tool path + csv_tool csv_sql): "
        "search patterns broaden 'distributed query optimizer' -> "
        "'spark window' -> 'window' until a pattern yields >= 50 "
        "documents (ACCEPT) or the ladder exhausts (ESCALATE); the "
        "feedback edge re-enqueues the tool node on RETRY. Emits the "
        "loop TRACE (attempt, pattern, n_hits, verdict) — the oracle "
        "replays the control flow as a recursive pattern-ladder CTE, "
        "pinning which tool calls were made, in what order, with what "
        "envelopes. Deterministic; full hash row.",
    builder=_graph_tool_loop,
    oracle_sql_str="""
        WITH pats AS (
          SELECT * FROM (VALUES
            (1, 'distributed query optimizer'),
            (2, 'spark window'),
            (3, 'window')) AS t(attempt, pattern)
        ),
        counts AS (
          SELECT p.attempt, p.pattern,
                 (SELECT COUNT(*) FROM documents d
                  WHERE d.text LIKE '%' || p.pattern || '%') AS n_hits
          FROM pats p
        ),
        verdicts AS (
          SELECT attempt, pattern, n_hits,
                 CASE WHEN n_hits >= 50 THEN 'ACCEPT'
                      WHEN attempt < 3 THEN 'RETRY'
                      ELSE 'ESCALATE' END AS verdict
          FROM counts
        ),
        first_stop AS (
          SELECT MIN(attempt) AS a FROM verdicts
          WHERE verdict <> 'RETRY'
        )
        SELECT v.attempt, v.pattern, CAST(v.n_hits AS BIGINT) AS n_hits,
               v.verdict
        FROM verdicts v, first_stop f
        WHERE v.attempt <= f.a
        ORDER BY v.attempt
    """,
))


def _bucketed_join_q(spark, sf):
    """Co-located fact-fact join over bucketed tables
    (operators/bucketing.py): orders and lineitem are each materialized
    ONCE per (session, sf) bucketed 16 ways on the order key, so the
    join plan has NO Exchange on either side — the shuffle moved to
    write time, where a 100 TB deployment pays it once instead of per
    query.  The no-shuffle shape is plan-gated in
    tests/test_plan_shapes.py; values are hash-checked against the
    plain-view join oracle, proving the bucketed layout changes the
    PLAN and not the answer."""
    import hashlib as _h
    import os as _os
    from urllib.parse import urlparse

    from ..operators.bucketing import (
        attach_bucketed_table,
        save_bucketed_table,
    )

    tag = _h.md5(sf.encode()).hexdigest()[:10]
    t_orders, t_line = f"bkt_orders_{tag}", f"bkt_lineitem_{tag}"
    # explicit-path external layout: a fresh session ATTACHES the
    # bucketed tables (one DDL each) instead of re-paying the write-
    # time shuffle — the cross-session amortization (r9 verdict #4)
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
    base = wh.path if wh.scheme in ("", "file") else "/tmp"
    for tbl, src, key in (
        (t_orders, "orders", "o_orderkey"),
        (t_line, "lineitem", "l_orderkey"),
    ):
        path = _os.path.join(base, f"{tbl}_ext")
        if not attach_bucketed_table(spark, path, tbl):
            save_bucketed_table(
                spark, load_table(spark, sf, src), path, tbl, [key],
            )
    o = spark.table(t_orders)
    l = spark.table(t_line)
    return (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
        )
        .orderBy("o_orderpriority")
    )


Q(QuerySpec(
    name="pl_bucketed_join",
    doc="Shuffle-free fact-fact join via bucketed tables (operators/"
        "bucketing.py:ensure_bucketed_table — Spark bucketBy, Hive-"
        "compatible layout): orders x lineitem both bucketed 16 ways "
        "on the order key at write time, so the SortMergeJoin's "
        "children are bare bucketed FileScans with NO Exchange "
        "(plan-gated). The write pays the shuffle once; every "
        "subsequent join of these tables reads co-located buckets — "
        "the repeated-big-join shape a 100 TB warehouse runs daily. "
        "Oracle: the identical join over the plain views.",
    builder=_bucketed_join_q,
    oracle_sql_str="""
        SELECT o.o_orderpriority, COUNT(*) AS n_items,
               CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT)
                 AS sum_qty
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
    """,
))


Q(QuerySpec(
    name="pl_shard_manifest",
    doc="Training-shard export manifest (operators/export.py:"
        "shard_manifest): deterministic shard = first-8-hex "
        "md5(doc_id) mod 8, per-shard (n_docs, n_tokens, "
        "content_crc32) where the checksum is an ORDER-INDEPENDENT "
        "sum of per-row 32-bit md5 content slices mod 2^32 — the "
        "integrity contract a training job verifies against "
        "(write_shards materializes it, verify_shards recomputes it "
        "from the files; round-trip pinned in tests/test_export.py). "
        "Scale: map-only projection + an n_shards-key aggregation.",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.export", fromlist=["shard_manifest"]
    ).shard_manifest(load_table(spark, sf, "documents")),
    oracle_sql_str=r"""
        WITH r AS (
          SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                   1, 8)) AS BIGINT) % 8 AS shard,
                 len(list_filter(string_split_regex(text, '\s+'),
                     t -> t <> '')) AS toks,
                 CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT)
                   AS crc
          FROM documents
        )
        SELECT CAST(shard AS BIGINT) AS shard,
               COUNT(*) AS n_docs,
               CAST(SUM(toks) AS BIGINT) AS n_tokens,
               CAST(SUM(crc) % 4294967296 AS BIGINT) AS content_crc32
        FROM r GROUP BY shard ORDER BY shard
    """,
))


Q(QuerySpec(
    name="pl_salted_topk",
    doc="Top-3 events by value per event_type via the two-phase SALTED "
        "window (operators/skew.py:salted_topk). Phase 1 ranks within "
        "(key, pmod(xxhash64(event_id), 16)) buckets and keeps local "
        "top-3; phase 2 re-ranks the <= 48 survivors per key. Exact by "
        "containment under the (value DESC, event_id ASC) total order; "
        "the oracle is the plain single-window SQL, so the hash proves "
        "the salted plan changes the task shape and not the answer. "
        "Measured scope (BASELINE.md r10, 50%-hot-key corpus): Spark "
        "4's WindowGroupLimit already de-skews rank-limit windows, so "
        "this operator's regime is window shapes that rule cannot "
        "rewrite (3.8x ahead with the rule off; ~matches with it on).",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.skew", fromlist=["salted_topk"]
    ).salted_topk(
        load_table(spark, sf, "events").select(
            "event_id", "event_type", "value"
        ),
        "event_type", "value", "event_id", k=3, salts=16,
    ).orderBy("event_type", "rank"),
    oracle_sql_str="""
        WITH r AS (
          SELECT event_id, event_type, value,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY value DESC NULLS LAST,
                                             event_id ASC) AS rank
          FROM events
        )
        SELECT event_id, event_type, value, CAST(rank AS INT) AS rank
        FROM r WHERE rank <= 3
        ORDER BY event_type, rank
    """,
))


Q(QuerySpec(
    name="pl_approx_quantile",
    doc="Greenwald-Khanna built-in quantile sketch witness (operators/"
        "sketch.py:approx_quantile_witness): percentile_approx(value, "
        "[.5,.9,.99], accuracy=10000) per event_type, with the GK rank "
        "guarantee RECOUNTED against the raw data in the same plan — "
        "n_lt <= target + 2n/accuracy and n_le >= target - "
        "2n/accuracy per (group, pct). Sketch internals can never "
        "hash-match another engine; the guarantee can (constant-TRUE "
        "oracle) — the pl_approx_distinct witness pattern, completing "
        "driver-visible coverage of Spark's built-in sketch family "
        "(HLL++ distinct + GK quantiles).",
    builder=lambda spark, sf: __import__(
        "adenhq_hive_spark.operators.sketch",
        fromlist=["approx_quantile_witness"],
    ).approx_quantile_witness(
        load_table(spark, sf, "events"), "value", "event_type",
    ),
    oracle_sql_str="""
        SELECT t.event_type, p.pct, t.n, TRUE AS rank_ok
        FROM (SELECT event_type, COUNT(*) AS n FROM events
              WHERE value IS NOT NULL GROUP BY event_type) t
        CROSS JOIN (VALUES (50), (90), (99)) AS p(pct)
        ORDER BY t.event_type, p.pct
    """,
))


def _toolcall_assembly_q(spark, sf):
    """Deterministic streamed-tool-call fragment corpus from documents,
    assembled by functions/llm_stream.py:assemble_tool_calls (reference
    litellm.py:903-970's mid-stream accumulation as one distributed
    groupBy). Two interleaved calls per doc (call 1 on evens), id/name
    on chunk 0 only, every 7th call-0 truncated mid-stream so the
    {"_raw"}-class fallback path (is_valid=false, raw fragments kept)
    is in the hashed result, and arg_doc re-extracted from the
    assembled JSON proves the joined string actually parses."""
    from ..functions.llm_stream import assemble_tool_calls

    d = load_table(spark, sf, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
    )
    args0 = F.concat(
        F.lit('{"doc": '), F.col("doc_id").cast("string"),
        F.lit(', "k": '), (F.col("n_chars") % 97).cast("string"),
        F.lit("}"),
    )
    args1 = F.concat(F.lit('{"q": "'), F.col("source"), F.lit('"}'))
    name0 = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("search"))
        .when(F.col("doc_id") % 3 == 1, F.lit("grep"))
        .otherwise(F.lit("write"))
    )
    null_s = F.lit(None).cast("string")

    def frag(ti, ci, cid, name, fr):
        return F.struct(
            F.lit(ti).alias("tool_idx"), F.lit(ci).alias("chunk_idx"),
            cid.alias("call_id"), name.alias("tool_name"),
            fr.alias("frag"),
        )

    cid0 = F.concat(F.lit("c"), F.col("doc_id").cast("string"), F.lit("_0"))
    cid1 = F.concat(F.lit("c"), F.col("doc_id").cast("string"), F.lit("_1"))
    arr = F.array_compact(F.array(
        frag(0, 0, cid0, name0, F.substring(args0, 1, 6)),
        frag(0, 1, null_s, null_s, F.substring(args0, 7, 5)),
        F.when(F.col("doc_id") % 7 != 0,
               frag(0, 2, null_s, null_s, F.substring(args0, 12, 1000000))),
        F.when(F.col("doc_id") % 2 == 0,
               frag(1, 0, cid1, F.lit("fetch"), F.substring(args1, 1, 5))),
        F.when(F.col("doc_id") % 2 == 0,
               frag(1, 1, null_s, null_s, F.substring(args1, 6, 1000000))),
    ))
    fragments = d.select(
        F.col("doc_id").cast("string").alias("req_id"), F.inline(arr)
    )
    return (
        assemble_tool_calls(fragments)
        .withColumn(
            "arg_doc", F.get_json_object(F.col("tool_input"), "$.doc")
        )
        .orderBy(F.col("req_id").cast("long"), "tool_idx")
    )


Q(QuerySpec(
    name="pl_toolcall_assembly",
    doc="Mid-stream tool-call assembly at table scale (functions/"
        "llm_stream.py:assemble_tool_calls; reference litellm.py:903-970"
        " accumulates streamed function-call argument fragments per call"
        " index and parses on finish). Here the per-request provider "
        "loop becomes ONE relational pass: order-preserving fragment "
        "concat via array_sort(collect_list(struct)) inside codegen, "
        "id/name null-safe MAX, JSON validity + field re-extraction "
        "(get_json_object / json_valid+json_extract_string dual form) "
        "in the hashed output — including the malformed-call fallback "
        "rows. Full oracle hash.",
    builder=_toolcall_assembly_q,
    oracle_sql_str="""
        WITH d AS (
          SELECT doc_id, source,
                 '{"doc": ' || CAST(doc_id AS VARCHAR) || ', "k": '
                   || CAST(n_chars % 97 AS VARCHAR) || '}' AS args0,
                 '{"q": "' || source || '"}' AS args1,
                 CASE CAST(doc_id % 3 AS INTEGER)
                   WHEN 0 THEN 'search' WHEN 1 THEN 'grep'
                   ELSE 'write' END AS name0
          FROM documents
        ),
        frags AS (
          SELECT CAST(doc_id AS VARCHAR) AS req_id,
                 0 AS tool_idx, 0 AS chunk_idx,
                 'c' || CAST(doc_id AS VARCHAR) || '_0' AS call_id,
                 name0 AS tool_name, substr(args0, 1, 6) AS frag
          FROM d
          UNION ALL
          SELECT CAST(doc_id AS VARCHAR), 0, 1, NULL, NULL,
                 substr(args0, 7, 5) FROM d
          UNION ALL
          SELECT CAST(doc_id AS VARCHAR), 0, 2, NULL, NULL,
                 substr(args0, 12, 1000000) FROM d WHERE doc_id % 7 <> 0
          UNION ALL
          SELECT CAST(doc_id AS VARCHAR), 1, 0,
                 'c' || CAST(doc_id AS VARCHAR) || '_1', 'fetch',
                 substr(args1, 1, 5) FROM d WHERE doc_id % 2 = 0
          UNION ALL
          SELECT CAST(doc_id AS VARCHAR), 1, 1, NULL, NULL,
                 substr(args1, 6, 1000000) FROM d WHERE doc_id % 2 = 0
        ),
        asm AS (
          SELECT req_id, tool_idx,
                 max(call_id) AS call_id,
                 max(tool_name) AS tool_name,
                 string_agg(frag, '' ORDER BY chunk_idx) AS tool_input,
                 CAST(count(frag) AS BIGINT) AS n_frags
          FROM frags GROUP BY req_id, tool_idx
        )
        SELECT req_id, tool_idx, call_id, tool_name, tool_input, n_frags,
               json_valid(tool_input) AS is_valid,
               CASE WHEN json_valid(tool_input)
                    THEN json_extract_string(tool_input, '$.doc')
               END AS arg_doc
        FROM asm
        ORDER BY CAST(req_id AS BIGINT), tool_idx
    """,
))
