"""Trigram-indexed literal search — the inverted-index alternative to a
full-scan LIKE, the standard technique for substring search over massive
corpora (public design: Google Code Search trigram index, R. Cox 2012,
"Regular Expression Matching with a Trigram Index").

A full-scan ``text LIKE '%needle%'`` reads every byte of a 100 TB corpus
per query. The trigram index inverts that: build once (char-3-gram →
posting list of doc ids), then a query touches ONLY the posting rows of
the needle's trigrams — candidates are docs containing EVERY needle
trigram, verified with an exact ``contains`` on just those docs. The
index build is one linear pass; at scale it would be written bucketed by
trigram so probes prune to matching buckets.

False positives (docs with all trigrams but not the contiguous needle)
are removed by the verify step; false negatives are impossible — a doc
containing the needle contains every one of its trigrams. Needles
shorter than 3 chars fall back to the scan (no trigram to probe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _trigrams_of(text: str) -> list[str]:
    return sorted({text[i : i + 3] for i in range(len(text) - 2)})


def build_trigram_postings(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(trigram, ids) posting lists over the corpus — distinct char
    trigrams per doc, JVM-side sequence expression, one shuffle on the
    trigram key. Persist/bucket this by ``trigram`` for repeated probes."""
    tris = F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(length({text_col}) - 2, 0)), "
            f"i -> substring({text_col}, i, 3))"
        )
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(tris).alias("trigram"))
        .groupBy("trigram")
        .agg(F.sort_array(F.collect_list("id")).alias("ids"))
    )


def trigram_search(
    df: DataFrame,
    needle: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    postings: DataFrame | None = None,
) -> DataFrame:
    """Exact literal-containment search via the trigram index.

    Probe: filter postings to the needle's trigrams (a tiny IN list —
    partition/bucket pruning at scale), explode, and keep docs holding
    ALL of them (count == n_trigrams); verify candidates with
    ``contains`` against the doc text. Result is EXACTLY the full-scan
    answer — the index only prunes, never decides.

    Output: (id_col) of matching docs, ordered.
    """
    if len(needle) < 3:
        return (
            df.filter(F.col(text_col).contains(F.lit(needle)))
            .select(id_col)
            .orderBy(id_col)
        )
    tris = _trigrams_of(needle)
    if postings is None:
        postings = build_trigram_postings(df, text_col, id_col)
    cand = (
        postings.filter(F.col("trigram").isin(tris))
        .select(F.explode("ids").alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("n_hit"))
        .filter(F.col("n_hit") == len(tris))
        .select("id")
    )
    return (
        df.join(cand.withColumnRenamed("id", id_col), id_col, "left_semi")
        .filter(F.col(text_col).contains(F.lit(needle)))
        .select(id_col)
        .orderBy(id_col)
    )


def save_trigram_index(
    df: DataFrame,
    table_name: str = "trigram_index",
    buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Persist the posting lists as a BUCKETED table so probes prune to
    the needle's buckets instead of scanning the whole index.

    ``bucketBy(buckets, trigram)`` hashes each trigram to one of
    ``buckets`` files; an equality/IN probe on ``trigram`` then reads
    only the matching buckets (Spark bucket pruning — the executed plan
    shows ``SelectedBucketsCount: m out of n``). The build is the one
    linear corpus pass; re-run to refresh (posting lists are derived
    state, idempotent by construction)."""
    (
        build_trigram_postings(df, text_col, id_col)
        .write.mode("overwrite")
        .bucketBy(buckets, "trigram")
        .sortBy("trigram")
        .saveAsTable(table_name)
    )


def trigram_search_indexed(
    df: DataFrame,
    needle: str,
    table_name: str = "trigram_index",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Probe a persisted bucketed index (:func:`save_trigram_index`) —
    same exact-answer contract as :func:`trigram_search`, but the probe
    reads only the needle's trigram buckets (bucket pruning) instead of
    rebuilding or rescanning posting lists: the amortized shape for a
    search service running many queries against one corpus snapshot.

    Operational note: set
    ``spark.sql.sources.bucketing.autoBucketedScan.enabled=false`` in
    the probe session — Spark's planner otherwise disables bucketed
    reading for filter-only scans (no join/agg on the bucket column),
    which forfeits the pruning this index exists for. Asserted in
    tests/test_search.py."""
    spark = df.sparkSession
    return trigram_search(
        df, needle, text_col, id_col, postings=spark.table(table_name)
    )


def update_trigram_postings(
    postings: DataFrame,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental index maintenance: merge a new document batch into
    existing posting lists without re-reading the indexed corpus — the
    operation that keeps a 100 TB index current as data arrives (a full
    rebuild re-reads everything; the merge reads the delta plus the
    index, which is a small multiple of the vocabulary).

    Shape: invert the delta, union with the existing lists, one
    re-group per trigram concatenating sorted lists (ids are appended
    pre-sorted per side, then flatten+sort merges — list sizes are
    per-trigram document frequencies, bounded by corpus df, not corpus
    size). Idempotence is the caller's contract: re-merging the same
    batch duplicates ids, so feed each batch once (the foreachBatch
    epoch-id pattern) or dedup ids downstream.
    """
    delta = build_trigram_postings(new_docs, text_col, id_col)
    return (
        postings.unionByName(delta)
        .groupBy("trigram")
        .agg(
            F.array_sort(
                F.flatten(F.collect_list("ids"))
            ).alias("ids")
        )
    )


def bm25_search(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents by BM25 for a bag-of-terms query — the
    classic ranked-retrieval scorer (Robertson-Sparck Jones):

        score(D) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1-b+b*|D|/avgdl))
        idf(t)   = ln((N - df_t + 0.5) / (df_t + 0.5) + 1)   (+1-smoothed)

    Shape: tokenize once, keep ONLY query-term postings (the filter
    lands before the aggregation, so the shuffled relation is
    query-sized, not corpus-sized), per-(doc, term) tf with map-side
    partials, per-term df + corpus stats (N, avgdl) on tiny broadcast
    relations, one scoring projection, TakeOrderedAndProject top-k.
    Document length uses whitespace tokens (the corpus contract).

    Output: (id_col, rank, score) — rank by (score desc, id) on values
    rounded to 4 (the pl_tfidf-proven cross-engine double contract).
    """
    from pyspark.sql import Window

    from .text import ws_token_count

    terms = sorted({t.lower() for t in query_terms})
    toks = F.explode(
        F.filter(F.split(F.lower(F.col(text_col)), " "), lambda t: t != "")
    ).alias("term")
    lens = df.select(
        F.col(id_col).alias("id"), ws_token_count(text_col).alias("dl")
    )
    stats = lens.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    # dl rides the postings row (first() per group) — joining the
    # corpus-sized lens relation back on id would shuffle one row per
    # document, exactly the corpus-sized exchange this shape avoids
    hits = (
        df.select(
            F.col(id_col).alias("id"),
            ws_token_count(text_col).alias("dl"),
            toks,
        )
        .filter(F.col("term").isin(terms))
        .groupBy("id", "term")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
    )
    dfreq = hits.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        hits.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5)
                + 1.0
            ),
        )
        .withColumn(
            "part",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    return (
        scored.groupBy("id")
        .agg(F.round(F.sum("part"), 4).alias("score"))
        .orderBy(F.col("score").desc(), "id")
        .limit(k)
        .select(
            F.col("id").alias(id_col),
            F.row_number()
            .over(Window.orderBy(F.col("score").desc(), "id"))
            .alias("rank"),
            "score",
        )
    )
