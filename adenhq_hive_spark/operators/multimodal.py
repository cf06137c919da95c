"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata (the reference's multimodal surface is vision_tool.py:
image URL/base64 → annotation rows; vision_tool.py:115-349).

The Spark-side plumbing — schema, partition-preserving mapInPandas, Arrow
batch shapes, annotation output schema — is real and tested.  The actual
codec work (pillow/ffmpeg et al.) is NOT available in this container, so
the decode kernel is stubbed: ``decode_stub='fake'`` produces a
deterministic fake decode (dimensions/bytes derived from the content hash)
and ``decode_stub='raise'`` raises NotImplementedError where a real codec
would run.  Swapping in a real codec touches ONLY ``_decode_kernel``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source", T.StringType()),
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def media_table_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table over the documents testdata: text
    bytes stand in for encoded media payloads (binary column + typed
    metadata), so the full pipeline is drivable without codec libs."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    content = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        content.alias("content"),
        F.struct(
            F.col("source").alias("source"),
            F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
            F.length(content).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _decode_kernel(content: bytes, kind: str, mode: str) -> tuple[int, int, int, list[float]]:
    """The ONLY place a real codec would plug in.

    mode='fake': deterministic pseudo-decode from the sha256 of the bytes.
    mode='raise': the honest stub for the missing codec libraries.
    """
    if mode == "raise":
        raise NotImplementedError(
            "No codec libraries in this container; install pillow/ffmpeg "
            "and implement _decode_kernel for real media."
        )
    digest = hashlib.sha256(content).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    n_frames = 1 if kind == "image" else 1 + digest[2] % 32
    feature = [b / 255.0 for b in digest[:16]]
    return width, height, n_frames, feature


def decode_media(
    media: DataFrame, batch_size_hint: int = 256, decode_stub: str = "fake"
) -> DataFrame:
    """Decode/feature-extract media via Arrow-batched mapInPandas.

    Partition-preserving (no shuffle); each pandas batch maps payload
    bytes → (dims, frames, feature vector). At 100 TB the binary column
    dominates I/O, so the transform prunes to exactly the needed columns
    before the Python stage.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "width": [], "height": [], "n_frames": [], "feature": [],
            }
            for content, kind in zip(pdf["content"], pdf["kind"]):
                w, h, nf, feat = _decode_kernel(bytes(content), kind, decode_stub)
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(nf)
                out["feature"].append(feat)
            yield pd.DataFrame(out)

    pruned = media.select("media_id", "kind", "content")
    return pruned.mapInPandas(batches, schema=DECODED_SCHEMA)


def frame_sample(decoded: DataFrame, every_nth: int = 4) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per kept frame
    index (sequence + explode, JVM-side)."""
    frames = F.explode(
        F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_nth))
    ).alias("frame_idx")
    return decoded.filter(F.col("kind") == "video").select(
        "media_id", "width", "height", frames
    )
