"""Link-graph centrality: integer-exact PageRank power iteration.

Curation motivation: over a document-similarity or citation/link graph,
PageRank-style centrality surfaces template hubs (boilerplate centers) and
authority pages — a standard quality/priority signal for pretraining-corpus
selection (the reference has no graph tier; this extends the engine the
way GraphX/Pregel users would expect, but in pure DataFrame operations).

Scale posture (100 TB / billions of edges):

- Each iteration is exactly ONE shuffle join (ranks ⋈ out-degree-annotated
  edges on ``src``) plus ONE aggregation (contributions by ``dst``) —
  the textbook Pregel/GraphX shape expressed as DataFrames, so AQE gets to
  re-plan per iteration and skew-join hot hub nodes.
- The edge relation is annotated with out-degrees ONCE and materialized
  via ``dedup._materialize`` — persist(MEMORY_AND_DISK) registered for
  deterministic release by ``dedup.release_persisted()`` between
  queries (bench.py and the oracle sweeps already call it). This
  replaced raw ``localCheckpoint(eager=True)``: its blocks are only
  reclaimed when the ContextCleaner notices the RDD is garbage, which
  the r10 sf10 spot-check measured NOT happening across repeated
  invocations in one JVM — run 1 of pl_pagerank at sf10 completed in
  189 s and run 2 OOM'd a 16 GB heap even with explicit System.gc()
  between runs; the corpus-sized edge blocks from run 1 were still
  resident. Persist blocks are also lineage-backed (executor loss
  recomputes instead of failing the job). The per-iteration state is a
  skinny (node, rank) relation.
- ``checkpoint_every=N`` (optional) cuts the rank-state lineage every
  N iterations via ``dedup._cut_lineage`` (reliable checkpoint when a
  checkpoint dir is configured, else localCheckpoint): the registered
  3-iteration forms don't need it, but a 20+-iteration walk unrolls
  one join+agg per iteration into a single plan and hits
  analyzer/codegen blowup without periodic truncation.
- Ranks are scaled BIGINTs with truncating division (``DIV``): integer
  sums are exact and order-independent, so the result is bit-identical
  across partitionings, engines, and cluster sizes — which is what lets a
  fixed-point iterative algorithm carry a full DuckDB oracle hash
  (oracle = the same iterations unrolled as chained CTEs).

Semantics notes (shared with the oracle formula):

- ``rank0 = SCALE // n_nodes`` for every node.
- ``rank_{t+1}(v) = ((100-d)% * rank0) // 100
                    + (d% * Σ_{u→v} (rank_t(u) DIV outdeg(u))) // 100``.
- Dangling nodes (no out-edges) contribute nothing — their mass is
  dropped, not redistributed (callers wanting the classic behavior can
  symmetrize the edge list, which guarantees outdeg ≥ 1 everywhere).
- All divisions truncate toward zero (Spark ``DIV`` == DuckDB ``//`` on
  the non-negative values that occur here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _cut_lineage, _materialize

SCALE = 10**12


def pagerank_int(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping_pct: int = 85,
    scale: int = SCALE,
    checkpoint_every: int | None = None,
) -> DataFrame:
    """PageRank over a directed edge list, integer-exact.

    Returns (node, rank_scaled) for every node appearing as src OR dst;
    ``rank_scaled`` is the rank times ``scale``, truncated. ``damping_pct``
    is the damping factor in percent (integer, so the teleport term stays
    in exact arithmetic). ``checkpoint_every`` bounds plan depth for long
    walks (see module docstring).
    """
    if not 0 <= damping_pct <= 100:
        raise ValueError("damping_pct must be in 0..100")
    if iterations < 1:
        raise ValueError("iterations must be >= 1")

    nodes = _materialize(
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    n = nodes.count()
    init = scale // n
    teleport = ((100 - damping_pct) * init) // 100

    deg = edges.groupBy(src).agg(F.count("*").alias("outdeg"))
    ed = _materialize(
        edges.join(deg, src)
        .select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"),
                "outdeg")
    )

    pr = nodes.withColumn("r", F.lit(init).cast("long"))
    for i in range(iterations):
        if checkpoint_every and i and i % checkpoint_every == 0:
            pr = _cut_lineage(pr)
        contrib = ed.join(pr, ed["e_src"] == pr["node"]).select(
            F.col("e_dst").alias("node"),
            F.expr("r DIV outdeg").alias("c"),
        )
        incoming = contrib.groupBy("node").agg(F.sum("c").alias("m"))
        pr = nodes.join(incoming, "node", "left").select(
            "node",
            (
                F.lit(teleport).cast("long")
                + F.expr(f"({damping_pct} * coalesce(m, CAST(0 AS BIGINT)))"
                         " DIV 100")
            ).alias("r"),
        )
    return pr.select("node", F.col("r").alias("rank_scaled"))


def personalized_pagerank_int(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
    iterations: int = 3,
    damping_pct: int = 85,
    scale: int = SCALE,
    checkpoint_every: int | None = None,
) -> DataFrame:
    """Personalized PageRank (random walk with restart): the teleport
    mass returns only to ``seeds``, so ranks measure proximity TO the
    seed set — the "similar items to X" / "importance relative to this
    cohort" recommendation primitive (Haveliwala 2002).

    Same integer-exact iteration discipline as :func:`pagerank_int`
    (scaled-BIGINT truncating arithmetic, one join + one aggregation per
    iteration, oracle = unrolled CTEs); the only change is the teleport
    vector: ``scale // n_seeds`` on seed nodes, 0 elsewhere — both for
    the initial distribution and the per-iteration restart term.
    """
    if not 0 <= damping_pct <= 100:
        raise ValueError("damping_pct must be in 0..100")
    if iterations < 1:
        raise ValueError("iterations must be >= 1")

    nodes = _materialize(
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    seed_nodes = _materialize(
        seeds.select(F.col(seed_col).alias("node")).distinct()
        .join(nodes, "node", "left_semi")
    )
    n_seeds = seed_nodes.count()
    if n_seeds == 0:
        raise ValueError("no seed overlaps the graph's node set")
    seed_share = scale // n_seeds
    teleport = ((100 - damping_pct) * seed_share) // 100

    deg = edges.groupBy(src).agg(F.count("*").alias("outdeg"))
    ed = _materialize(
        edges.join(deg, src)
        .select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"),
                "outdeg")
    )
    marked = nodes.join(
        seed_nodes.withColumn("is_seed", F.lit(True)), "node", "left"
    ).select(
        "node", F.coalesce("is_seed", F.lit(False)).alias("is_seed")
    )

    pr = marked.withColumn(
        "r",
        F.when(F.col("is_seed"), F.lit(seed_share).cast("long"))
        .otherwise(F.lit(0).cast("long")),
    ).select("node", "r")
    tele_expr = F.when(
        F.col("is_seed"), F.lit(teleport).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    for i in range(iterations):
        if checkpoint_every and i and i % checkpoint_every == 0:
            pr = _cut_lineage(pr)
        contrib = ed.join(pr, ed["e_src"] == pr["node"]).select(
            F.col("e_dst").alias("node"),
            F.expr("r DIV outdeg").alias("c"),
        )
        incoming = contrib.groupBy("node").agg(F.sum("c").alias("m"))
        pr = marked.join(incoming, "node", "left").select(
            "node",
            (
                tele_expr
                + F.expr(f"({damping_pct} * coalesce(m, CAST(0 AS BIGINT)))"
                         " DIV 100")
            ).alias("r"),
        )
    return pr.select("node", F.col("r").alias("rank_scaled"))


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 2,
    checkpoint_every: int | None = None,
) -> DataFrame:
    """Community detection by label propagation (Raghavan et al. 2007),
    made DETERMINISTIC: each node adopts the most frequent label among
    its in-neighbors, ties broken by the lexicographically smallest
    label, all nodes updating synchronously — so the result is a pure
    function of the graph and carries a full oracle hash (classic LPA
    randomizes update order; the synchronous min-tiebreak variant
    trades some convergence speed for reproducibility).

    Curation use: communities over a near-dup / similarity graph are
    template families — a coarser, faster grouping than connected
    components when the graph is dense.

    Per iteration: one join (labels onto edges by source) + one
    (node, label) count aggregation + one PARTITIONED row_number pick —
    the same one-shuffle-per-round Pregel shape as the rank operators.
    Initial label = the node's own id. Emits (node, community).
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    nodes = _materialize(
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    ed = _materialize(edges.select(
        F.col(src).alias("e_src"), F.col(dst).alias("e_dst")
    ))
    lab = nodes.withColumn("label", F.col("node"))
    w = Window.partitionBy("node").orderBy(
        F.col("c").desc(), F.col("label")
    )
    for i in range(iterations):
        if checkpoint_every and i and i % checkpoint_every == 0:
            lab = _cut_lineage(lab)
        counts = (
            ed.join(lab, ed["e_src"] == lab["node"])
            .select(F.col("e_dst").alias("node"), "label")
            .groupBy("node", "label")
            .agg(F.count("*").alias("c"))
        )
        pick = (
            counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", F.col("label").alias("new_label"))
        )
        lab = nodes.join(pick, "node", "left").select(
            "node",
            F.coalesce("new_label", F.col("node")).alias("label"),
        )
    return lab.select("node", F.col("label").alias("community"))
