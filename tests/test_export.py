"""Training-shard export tier (operators/export.py): deterministic
assignment, manifest round-trip, and corruption detection."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from adenhq_hive_spark.operators.export import (
    shard_manifest,
    verify_shards,
    write_shards,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )


def test_manifest_partitions_the_corpus_exactly(spark):
    docs = _docs(spark)
    m = shard_manifest(docs, n_shards=8).collect()
    assert [r.shard for r in m] == sorted({r.shard for r in m})
    assert sum(r.n_docs for r in m) == docs.count()
    assert all(0 <= r.content_crc32 < (1 << 32) for r in m)
    # deterministic: same corpus, same manifest, any partitioning
    m2 = shard_manifest(docs.repartition(13), n_shards=8).collect()
    assert m == m2


def test_write_verify_roundtrip_and_corruption_detection(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "shards")
    written = write_shards(docs, path, n_shards=4).collect()
    assert sum(r.n_docs for r in written) == docs.count()
    v = verify_shards(spark, path).collect()
    assert len(v) == 4 and all(r.ok for r in v)
    # corrupt one shard: rewrite shard=0's data with one doc dropped
    s0 = spark.read.parquet(f"{path}/data").filter("shard = 0")
    s0.limit(s0.count() - 1).write.mode("overwrite").parquet(
        f"{path}/data/shard=0"
    )
    v2 = {r.shard: r.ok for r in verify_shards(spark, path).collect()}
    assert v2[0] is False
    assert all(ok for s, ok in v2.items() if s != 0)


def test_manifest_rejects_bad_shard_count(spark):
    with pytest.raises(ValueError):
        shard_manifest(_docs(spark), n_shards=0)


def test_shard_assignment_is_row_pure(spark):
    """The same doc_id lands in the same shard regardless of which
    subset it is exported with — the re-export stability contract."""
    docs = _docs(spark)
    full = {
        r.doc_id: r.shard
        for r in docs.select(
            "doc_id",
            (
                F.conv(
                    F.substring(
                        F.md5(F.col("doc_id").cast("string")), 1, 8
                    ),
                    16,
                    10,
                ).cast("long")
                % 8
            ).alias("shard"),
        ).collect()
    }
    half = docs.filter("doc_id % 2 = 0")
    m_half = shard_manifest(half, n_shards=8).collect()
    # recompute the half-corpus manifest from the full assignment map
    from collections import Counter

    want = Counter(full[d] for d in
                   [r.doc_id for r in half.select("doc_id").collect()])
    got = {r.shard: r.n_docs for r in m_half}
    assert got == dict(want)
