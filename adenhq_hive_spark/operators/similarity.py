"""Similarity search over embedding columns (driver north star).

Two tiers:

- ``cosine_topk``     — exact brute-force: broadcast the (small) query set,
  compute cosine with JVM-side array lambdas (zip_with + aggregate — no
  Python UDF), rank per query. The correctness baseline.
- ``lsh_cosine_topk`` — random-hyperplane LSH: sign-bit signatures from a
  fixed-seed projection matrix, candidates = same-bucket vectors, exact
  cosine re-rank within buckets. The scale path: candidate generation is
  bucket-local, so the pair space is sub-quadratic; multiple hash tables
  recover recall.

Determinism: projection matrix from numpy ``default_rng(42)``; all ranking
ties broken by vec_id.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: F.Column) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` has the same (id_col, vec_col) shape. The query side is
    broadcast (it is small by construction); the candidate scan stays
    distributed and Catalyst keeps the whole expression in codegen.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    v = vectors.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(
                _dot(F.col("qv"), F.col("cv"))
                / (_norm(F.col("qv")) * _norm(F.col("cv"))),
                4,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "cand_id", "cosine")
    )


def _hyperplane_signature(
    vec_col: str, planes: np.ndarray, table: int
) -> F.Column:
    """Sign-bit bucket id for one hash table: packed bits of dot(v, p_i) > 0."""
    bits = []
    for i, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        bits.append(
            F.when(_dot(F.col(vec_col), arr) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        )
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return (sig + F.lit(table * (1 << len(planes)))).cast("long")


def lsh_cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k cosine via random-hyperplane LSH + exact re-rank.

    Each vector lands in ``n_tables`` buckets (one per table of
    ``n_planes`` hyperplanes). Queries probe their buckets; exact cosine
    is computed only for bucket-mates. Recall grows with n_tables and
    shrinks with n_planes; the (4, 16) default hits ~0.9 recall@5 on the
    (unclustered, worst-case) random testdata embeddings — clustered
    real-world embeddings separate better with fewer tables. Measured
    against ``cosine_topk`` in tests/test_similarity.py.
    """
    rng = np.random.default_rng(seed)
    tables = [rng.standard_normal((n_planes, dim)) for _ in range(n_tables)]

    def bucketize(df: DataFrame, ident: str) -> DataFrame:
        sigs = F.array(
            *[_hyperplane_signature(vec_col, planes, t)
              for t, planes in enumerate(tables)]
        )
        return df.select(
            F.col(id_col).alias(ident),
            F.col(vec_col).alias(f"{ident}_v"),
            F.explode(sigs).alias("bucket"),
        )

    vb = bucketize(vectors, "cand_id")
    qb = bucketize(queries, "query_id")
    cand = (
        vb.join(F.broadcast(qb), on="bucket")
        .filter(F.col("cand_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "cand_id"])
    )
    scored = cand.select(
        "query_id",
        "cand_id",
        F.round(
            _dot(F.col("query_id_v"), F.col("cand_id_v"))
            / (_norm(F.col("query_id_v")) * _norm(F.col("cand_id_v"))),
            4,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "cand_id", "cosine")
    )


def ivf_cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k cosine via IVF (inverted-file) partitioning.

    Build: k-means over L2-normalized vectors (cosine == euclidean on the
    unit sphere), every vector assigned to its nearest centroid's posting
    list. Query: probe the ``n_probe`` nearest centroids and exact-re-rank
    only their posting lists — the scan fraction is ~n_probe/n_centroids,
    the knob real ANN systems (FAISS IVF) expose. Training is the one
    driver-coordinated step (iterative k-means); assignment, probing and
    re-ranking are pure DataFrame ops.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    def unit(df: DataFrame, ident: str) -> DataFrame:
        n = _norm(F.col(vec_col))
        return df.select(
            F.col(id_col).alias(ident),
            F.transform(vec_col, lambda x: x.cast("double") / n).alias(f"{ident}_v"),
        )

    v = unit(vectors, "cand_id")
    q = unit(queries, "query_id")

    train = v.select(array_to_vector("cand_id_v").alias("features"))
    model = KMeans(k=n_centroids, seed=seed, featuresCol="features").fit(train)
    centers = [[float(x) for x in c] for c in model.clusterCenters()]
    centroids = v.sparkSession.createDataFrame(
        [(i, c) for i, c in enumerate(centers)], ["centroid_id", "centroid"]
    )

    def assign(df: DataFrame, ident: str, probes: int) -> DataFrame:
        scored = df.crossJoin(F.broadcast(centroids)).select(
            ident,
            f"{ident}_v",
            "centroid_id",
            _dot(F.col(f"{ident}_v"), F.col("centroid")).alias("cdot"),
        )
        w = Window.partitionBy(ident).orderBy(
            F.col("cdot").desc(), F.col("centroid_id")
        )
        return (
            scored.withColumn("crank", F.row_number().over(w))
            .filter(F.col("crank") <= probes)
            .select(ident, f"{ident}_v", "centroid_id")
        )

    postings = assign(v, "cand_id", 1)           # each vector in ONE list
    probes = assign(q, "query_id", n_probe)      # each query probes n lists
    cand = (
        postings.join(F.broadcast(probes), on="centroid_id")
        .filter(F.col("cand_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "cand_id"])
    )
    scored = cand.select(
        "query_id",
        "cand_id",
        # inputs are unit vectors: cosine is the plain dot product
        F.round(_dot(F.col("query_id_v"), F.col("cand_id_v")), 4).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "cand_id", "cosine")
    )


def cosine_dedup_pairs(
    vectors: DataFrame,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "exact",
    **lsh_kwargs,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the semantic-dedup tier of
    an LLM data pipeline): all (id_a < id_b) pairs with cosine >= threshold.

    method='exact' — O(n²) self-join, the oracle-checkable baseline.
    method='lsh'   — hyperplane-LSH candidates (same tables/planes as
    lsh_cosine_topk) with exact verification: sub-quadratic at scale,
    no false positives, recall bounded by the LSH parameters.
    """
    v = vectors.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    )
    if method == "exact":
        return _cosine_pairs_matrix(v, threshold)
    elif method == "lsh":
        n_planes = lsh_kwargs.get("n_planes", 4)
        n_tables = lsh_kwargs.get("n_tables", 16)
        seed = lsh_kwargs.get("seed", 42)
        import numpy as np

        rng = np.random.default_rng(seed)
        tables = [rng.standard_normal((n_planes, 64)) for _ in range(n_tables)]
        sigs = F.array(
            *[_hyperplane_signature("v", planes, t)
              for t, planes in enumerate(tables)]
        )
        buck = v.select("id", "v", F.explode(sigs).alias("bucket"))
        cand = (
            buck.select(F.col("id").alias("id_a"), F.col("v").alias("va"),
                        "bucket")
            .join(
                buck.select(F.col("id").alias("id_b"), F.col("v").alias("vb"),
                            "bucket"),
                on="bucket",
            )
            .filter(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
    else:
        raise ValueError(f"unknown method: {method}")
    return (
        cand.select(
            "id_a",
            "id_b",
            F.round(
                _dot(F.col("va"), F.col("vb"))
                / (_norm(F.col("va")) * _norm(F.col("vb"))),
                4,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def _cosine_pairs_matrix(v: DataFrame, threshold: float) -> DataFrame:
    """Exact all-pairs cosine via blocked matrix products.

    Higher-order-function dot products are NOT whole-stage-codegen'd, so
    an n² expression-based pair scan is interpreted per element (~100 µs
    per 64-dim pair). The vectorized path broadcasts the (small) unit
    matrix and lets each Arrow batch do one BLAS matmul against it —
    O(n²·d) FLOPs at memory bandwidth instead of interpreter speed,
    >100× faster at n=2000. At larger n, switch method='lsh' (candidate
    pruning) — the broadcast matrix is the IVF/LSH re-rank building
    block, not an n²-forever strategy.
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    rows = v.select("id", "v").collect()
    ids = np.array([r.id for r in rows], dtype=np.int64)
    mat = np.array([r.v for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    spark = v.sparkSession
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)

    def block(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_ids, all_mat = b_ids.value, b_mat.value
        for pdf in it:
            bids = pdf["id"].to_numpy(dtype=np.int64)
            bmat = np.array(list(pdf["v"]), dtype=np.float64)
            bmat /= np.linalg.norm(bmat, axis=1, keepdims=True)
            sims = np.round(bmat @ all_mat.T, 4)
            keep = (bids[:, None] < all_ids[None, :]) & (sims >= threshold)
            ai, bj = np.nonzero(keep)
            yield pd.DataFrame(
                {
                    "id_a": bids[ai],
                    "id_b": all_ids[bj],
                    "cosine": sims[ai, bj],
                }
            )

    return v.mapInPandas(block, schema="id_a long, id_b long, cosine double")
