"""Multimodal plumbing tests: binary column schema, Arrow-batched decode
determinism, honest stub behavior, frame sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from adenhq_hive_spark.catalog import load_table
from adenhq_hive_spark.operators.multimodal import (
    DECODED_SCHEMA,
    MEDIA_SCHEMA,
    decode_media,
    frame_sample,
    media_table_from_documents,
)

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    return media_table_from_documents(load_table(spark, SF_SMOKE, "documents"))


def _names_types(schema):
    # simpleString drops nullability (incl. nested struct fields), which is
    # computed for derived columns and not part of the contract
    return [(f.name, f.dataType.simpleString()) for f in schema.fields]


def test_media_schema(media):
    # nullability of computed columns differs from the declared contract;
    # names and types are what the contract pins
    assert _names_types(media.schema) == _names_types(MEDIA_SCHEMA)
    r = media.first()
    assert isinstance(r.content, (bytes, bytearray))
    assert r.meta.n_bytes == len(r.content)
    assert r.meta.mime.startswith("application/x-fake-")


def test_decode_deterministic(media):
    a = {r.media_id: r for r in decode_media(media).collect()}
    b = {r.media_id: r for r in decode_media(media.repartition(7)).collect()}
    assert len(a) == len(b) == media.count()
    for k in a:
        assert (a[k].width, a[k].height, a[k].n_frames) == (
            b[k].width, b[k].height, b[k].n_frames)
        assert a[k].feature == b[k].feature
        assert len(a[k].feature) == 16


def test_decode_schema_and_kinds(media):
    dec = decode_media(media)
    assert _names_types(dec.schema) == _names_types(DECODED_SCHEMA)
    kinds = {r.kind: r for r in dec.collect()}
    assert kinds["image"].n_frames == 1
    assert kinds["video"].n_frames >= 1


def test_decode_raise_stub(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        decode_media(media.limit(1), decode_stub="raise").collect()


def test_frame_sample_only_video(media):
    dec = decode_media(media)
    frames = frame_sample(dec, every_nth=4)
    rows = frames.collect()
    assert rows
    vids = {r.media_id for r in dec.filter(F.col("kind") == "video").collect()}
    assert {r.media_id for r in rows} <= vids
    for r in rows:
        assert r.frame_idx % 4 == 0


def test_real_decode_parses_synthetic_containers(spark):
    """synthetic_media_table emits structurally valid PNG/JPEG/GIF/WAV;
    decode_stub='real' must recover every dimension from the BYTES (the
    stdlib container parsers), matching the generation formulas."""
    from adenhq_hive_spark.operators.multimodal import synthetic_media_table

    docs = load_table(spark, SF_SMOKE, "documents").limit(60)
    media = synthetic_media_table(docs)
    rows = {r.media_id: r for r in
            decode_media(media, decode_stub="real").collect()}
    assert len(rows) == 60
    for mid, r in rows.items():
        if mid % 3 == 0:
            assert r.kind == "image"
            assert r.format == ("png", "jpeg", "gif")[(mid // 3) % 3]
            assert (r.width, r.height, r.n_frames) == (
                64 + mid % 192, 64 + (mid * 7) % 192, 1)
        elif mid % 3 == 1:
            assert (r.format, r.width, r.height) == ("wav", 0, 0)
            assert r.n_frames == 1000 + (mid % 50) * 100
        else:
            assert r.format == "gif"
            assert r.n_frames == 2 + mid % 10
        assert len(r.feature) == 16
        assert abs(sum(r.feature) - 1.0) < 1e-6  # normalized histogram


def test_real_decode_unknown_payload_reports_unknown(spark, media):
    """Non-media bytes through the real parser: honest 'unknown', no crash."""
    r = decode_media(media.limit(3), decode_stub="real").collect()
    assert all(x.format == "unknown" for x in r)
    assert all((x.width, x.height, x.n_frames) == (0, 0, 0) for x in r)


def test_annotate_media_shape_and_determinism(spark):
    """Vision-annotation analog (reference vision_tool.py:115-349):
    typed nested output, per-kind label vocabulary, exact geometry."""
    from adenhq_hive_spark.operators.multimodal import (
        annotate_media,
        decode_media,
        synthetic_media_table,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}", "src0") for i in range(12)],
        ["doc_id", "text", "source"],
    )
    out = annotate_media(decode_media(synthetic_media_table(docs),
                                      decode_stub="real"))
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 12
    # audio rows (doc_id % 3 == 1): single 'audio' annotation, zero box
    a = rows[1].annotations
    assert [x.label for x in a] == ["audio"] and a[0].w == 0
    # visual rows: orientation + motion, center-crop box halves the frame
    v = {x.label: x for x in rows[0].annotations}
    assert set(v) & {"landscape", "portrait", "square"}
    assert set(v) & {"animated", "still"}
    orient = next(x for x in rows[0].annotations
                  if x.label in ("landscape", "portrait", "square"))
    assert orient.w * 2 in (orient.x * 4, orient.x * 4 + 2)  # w//2 vs w//4
    # deterministic: re-running yields identical annotations
    again = {r.media_id: r for r in out.collect()}
    assert again[0].annotations == rows[0].annotations


def test_annotate_media_unparseable_visual_labeled_unknown(spark):
    """A visual payload whose container failed to parse (0x0 geometry)
    must be labeled 'unknown', not 'audio'."""
    from adenhq_hive_spark.operators.multimodal import (
        DECODED_SCHEMA,
        annotate_media,
    )

    decoded = spark.createDataFrame(
        [(1, "image", "unknown", 0, 0, 0, []),
         (2, "audio", "wav", 0, 0, 100, [])],
        schema=DECODED_SCHEMA,
    )
    out = {r.media_id: r for r in annotate_media(decoded).collect()}
    assert [a.label for a in out[1].annotations] == ["unknown"]
    assert [a.label for a in out[2].annotations] == ["audio"]
    assert out[1].annotations[0].w == 0


def test_media_phash_deterministic_and_banding_recall(spark):
    import numpy as np

    from adenhq_hive_spark.catalog import load_table
    from adenhq_hive_spark.operators.multimodal import (
        media_phash,
        phash_pairs,
        synthetic_media_table,
    )

    from .conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").limit(60)
    media = synthetic_media_table(docs)
    ph = {r.media_id: (r.kind, r.phash) for r in media_phash(media).collect()}
    again = {r.media_id: (r.kind, r.phash) for r in media_phash(media).collect()}
    assert ph == again                     # deterministic

    # banding recall: with n_bands=4, every same-kind pair at
    # hamming <= 3 MUST be found (pigeonhole) — brute-force check
    got = {
        (r.id_a, r.id_b)
        for r in phash_pairs(media, max_hamming=3).collect()
    }
    ids = sorted(ph)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if ph[a][0] != ph[b][0]:
                continue
            ham = bin(ph[a][1] ^ ph[b][1]).count("1")
            if ham <= 3:
                assert (a, b) in got, (a, b, ham)
    # and nothing above the radius or across kinds leaks in
    for a, b in got:
        assert ph[a][0] == ph[b][0]
        assert bin(ph[a][1] ^ ph[b][1]).count("1") <= 3


def test_phash_groups_cover_exact_duplicates(spark):
    from adenhq_hive_spark.catalog import load_table
    from adenhq_hive_spark.operators.multimodal import (
        media_phash,
        phash_groups,
        synthetic_media_table,
    )

    from .conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    media = synthetic_media_table(docs)
    groups = phash_groups(media).collect()
    assert len(groups) > 0
    ph = {r.media_id: (r.kind, r.phash) for r in media_phash(media).collect()}
    for g in groups:
        members = [
            m for m, (k, h) in ph.items()
            if k == g.kind and h == g.phash
        ]
        assert len(members) == g.n
        assert min(members) == g.keep_id


def test_phash_portable_golden_bits(spark):
    """Pin the quantize -> integer-mean-threshold -> split-halves algebra
    on hand-computed vectors (knife-edge component included)."""
    from adenhq_hive_spark.operators.multimodal import phash_portable

    # v1: q = [10000, 0, 0, 0], sum=10000, n=4 -> bit i set iff
    # q_i*4 > 10000: only component 0 (40000 > 10000). hash = 1.
    # v2: all equal -> q_i*n == sum for every i -> no bits (strict >).
    # v3: 40 components; component 35 dominant -> only bit 35 set
    # (phash_hi bit 3 = 8).
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.5] * 4),
        (3, [0.0] * 35 + [2.0] + [0.0] * 4),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r["id"]: (r["phash_hi"], r["phash_lo"], r["nbits"])
        for r in phash_portable(df).collect()
    }
    assert got[1] == (0, 1, 1)
    assert got[2] == (0, 0, 0)
    assert got[3] == (8, 0, 1)


def test_phash_portable_matches_media_phash_algebra(spark):
    """The twin's bit pattern equals media_phash's float mean-threshold
    on vectors where quantization can't flip a decision (components far
    from the mean) — same algebra, different portability device."""
    from adenhq_hive_spark.operators.multimodal import phash_portable

    rows = [(i, [float((i * 7 + j * 13) % 5) for j in range(16)])
            for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    twin = {r["id"]: r["phash_hi"] * (1 << 32) + r["phash_lo"]
            for r in phash_portable(df).collect()}
    # float mean-threshold reference, in python
    for i, vec in rows:
        mean = sum(vec) / len(vec)
        expected = sum(1 << j for j, x in enumerate(vec) if x > mean)
        assert twin[i] == expected, (i, vec)


def test_phash_portable_caps_at_64_components(spark):
    """Vectors past 64 dims: hash and threshold sum both come from the
    FIRST 64 components only (sliced on both engine and oracle sides),
    so the contract can't silently diverge when dimensionality grows."""
    from adenhq_hive_spark.operators.multimodal import phash_portable

    rows = [
        # dominant component OUTSIDE the 64-window: first 64 all equal
        # -> zero bits; tail is invisible to hash AND sum
        (1, [0.0] * 64 + [9.9] * 6),
        # dominant inside the window, noise outside
        (2, [0.0] * 3 + [5.0] + [0.0] * 60 + [7.7] * 6),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["id"]: (r["phash_hi"], r["phash_lo"], r["nbits"])
           for r in phash_portable(df).collect()}
    assert got[1] == (0, 0, 0)
    assert got[2] == (0, 8, 1)
