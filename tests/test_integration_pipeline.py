"""Capstone integration: an LLM training-data pipeline composed from the
engine's layers — graph orchestration over documents: normalize-score →
quality gate (safe_eval predicate) → exact dedup → near-dup pair removal
→ persisted, paginated output (DataStore). Every stage is a lazy
DataFrame op; the graph runner only orchestrates."""

from __future__ import annotations

from pyspark.sql import functions as F

from adenhq_hive_spark.catalog import load_table
from adenhq_hive_spark.operators.dedup import dedup_exact, ngram_jaccard_pairs
from adenhq_hive_spark.operators.text import quality_score
from adenhq_hive_spark.plans.graph import (
    EdgeSpec,
    GraphRunner,
    GraphSpec,
    NodeSpec,
)
from adenhq_hive_spark.sources.data_tools import DataStore

from .conftest import SF_SMOKE


def test_training_data_pipeline_as_graph(spark, tmp_path):
    store = DataStore(spark, str(tmp_path / "out"))

    def load(memory):
        return load_table(spark, SF_SMOKE, "documents")

    def score(df, memory):
        return quality_score(df)

    def drop_near_dups(df, memory):
        # remove the higher-id member of each >=0.9 near-dup pair
        pairs = ngram_jaccard_pairs(df, threshold=0.9)
        losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
        return df.join(losers, "doc_id", "left_anti")

    def persist(df, memory):
        store.save_data("clean_corpus", df)
        return df

    g = GraphSpec(
        nodes={
            "load": NodeSpec("load", "python", fn=load, output="docs"),
            "score": NodeSpec("score", "python", fn=score,
                              inputs=["docs"], output="scored"),
            "gate": NodeSpec("gate", "filter",
                             {"condition": "quality_score >= 0.5"},
                             inputs=["scored"], output="quality"),
            "exact": NodeSpec("exact", "python",
                              fn=lambda df, memory: dedup_exact(df),
                              inputs=["quality"], output="deduped"),
            "near": NodeSpec("near", "python", fn=drop_near_dups,
                             inputs=["deduped"], output="clean"),
            "save": NodeSpec("save", "python", fn=persist,
                             inputs=["clean"], output="final"),
        },
        edges=[
            EdgeSpec("load", "score"),
            EdgeSpec("score", "gate"),
            EdgeSpec("gate", "exact"),
            EdgeSpec("exact", "near"),
            EdgeSpec("near", "save"),
        ],
        entry="load",
        terminals={"save"},
    )
    res = GraphRunner(spark).execute(g)
    assert res.completed
    assert res.steps == ["load", "score", "gate", "exact", "near", "save"]

    n_in = load_table(spark, SF_SMOKE, "documents").count()
    final = res.memory["final"]
    n_out = final.count()
    assert 0 < n_out <= n_in
    # the gate held: every surviving doc meets the bar
    assert final.filter("quality_score < 0.5").count() == 0
    # near-dups removed: no >=0.9 pair remains among survivors
    assert ngram_jaccard_pairs(final, threshold=0.9).count() == 0
    # persisted output is pageable through the store
    page = store.load_data("clean_corpus", limit=10)
    assert page["success"] and page["total_rows"] == n_out
