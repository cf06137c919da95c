"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The actual engine lives in ``adenhq_hive_spark/``; this module is the thin
adapter: every declared query (SURVEY.md §2.11 Q1-Q60 + the LLM-pipeline
set) is registered in ``adenhq_hive_spark.queries``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from adenhq_hive_spark.queries import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (Q6, TPC-H Q1 pricing summary) on sf0.001."""
    spec = all_queries()["q06"]
    return spec.run(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.run for name, spec in sorted(all_queries().items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query; rows-only ops are omitted."""
    return {
        name: spec.oracle
        for name, spec in sorted(all_queries().items())
        if spec.oracle is not None
    }


# The driver's CORRECTNESS artifact records only the first 50 entries of
# queries() in alphabetical order; the remaining registered queries are
# verified by the full local gate (scripts/check_oracle.py, every entry,
# any SF). queries_core() exposes an explicit load-bearing ordering —
# one representative per operator family first — for any consumer that
# wants a capped-but-balanced subset instead of the alphabetical prefix.

_CORE = [
    # one per §2 family: scan, predicate, agg, distinct, cube, median,
    # string_agg, weighted agg, star/snowflake/outer/semi/anti/cross/
    # theta/self/asof/interval joins, topk-freq, order, topk, windows,
    # lag, frames, running, sets, bag sets, strings, dates, math, case,
    # arrays, maps, hash, streaming images, subqueries, pivot, percentile
    "q01", "q02", "q06", "q09", "q13", "q17", "q18", "q19", "q22",
    "q24", "q25", "q26", "q28", "q29", "q30", "q31", "q32", "q33",
    "q34", "q35", "q36", "q38", "q39", "q40", "q42", "q43", "q44",
    "q45", "q47", "q48", "q50", "q51", "q54", "q55", "q57", "q58",
    "q59", "q60", "q69", "q71", "q72", "q77", "q78",
    # LLM-pipeline tier
    "pl_dedup_exact", "pl_ngram_jaccard", "pl_cosine_dedup",
    "pl_cosine_topk", "pl_quality", "pl_sliding_window",
    "pl_asof_operator",
]


def queries_core() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """The 50 most load-bearing queries in priority order (one per
    operator family), then everything else — for capped consumers."""
    specs = all_queries()
    ordered = {n: specs[n].run for n in _CORE if n in specs}
    for name, spec in sorted(specs.items()):
        ordered.setdefault(name, spec.run)
    return ordered
