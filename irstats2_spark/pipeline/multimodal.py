"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side contract is real and tested — schema, partition-preserving
batch iteration, UDF signatures. The actual media decode is STUBBED
(`decode_image_stub`) because no image/audio libraries ship in this
container: it derives deterministic fake features from the bytes. Swap
`_fake_decode` for PIL/torchvision/ffmpeg calls in production; nothing
else changes.

Scale notes: mapInPandas streams Arrow batches — memory is bounded by
`spark.sql.execution.arrow.maxRecordsPerBatch` regardless of partition
size; binary columns never pass through Python row-at-a-time; decode
parallelism == partition count, so repartition by size before heavy
decodes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("content", T.BinaryType()),
        T.StructField("meta_format", T.StringType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
    ]
)


def _fake_decode(content: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in for an image decoder. REPLACE with a real
    decoder (PIL.Image.open etc.) in production."""
    n = len(content)
    width = (n * 7) % 1024 + 1
    height = (n * 13) % 1024 + 1
    mean_intensity = round((sum(content[:64]) / max(1, min(n, 64))) / 255.0, 6)
    return width, height, mean_intensity


def decode_image_stub(media: DataFrame) -> DataFrame:
    """Extract image features via mapInPandas (Arrow batches).

    Input: MEDIA_SCHEMA-shaped DataFrame. Output: IMAGE_FEATURES_SCHEMA.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [_fake_decode(c if c is not None else b"") for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf["content"]],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "mean_intensity": [f[2] for f in feats],
                }
            )

    return media.mapInPandas(batches, schema=IMAGE_FEATURES_SCHEMA)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Adapter for tests/benchmarks: treat each document's utf-8 bytes as
    an opaque media payload (MEDIA_SCHEMA)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.lit("fake/raw").alias("meta_format"),
    )


def media_with_magic(docs: DataFrame) -> DataFrame:
    """Adapter for tests/benchmarks: composite binary payloads carrying
    REAL container magic bytes (cycled by doc_id: PNG / JPEG-JFIF / GIF89a
    / bare), so the byte-level plumbing — sniffing, sizes, chunking — is
    value-verifiable against an oracle, not just stub-vs-stub."""
    prefix = (
        F.when(docs.doc_id % 4 == 0, F.unhex(F.lit("89504E470D0A1A0A")))
        .when(docs.doc_id % 4 == 1, F.unhex(F.lit("FFD8FFE000104A46")))
        .when(docs.doc_id % 4 == 2, F.unhex(F.lit("4749463839616161")))
        .otherwise(F.unhex(F.lit("")))
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.concat(prefix, F.encode(F.col("text"), "UTF-8")).alias("content"),
        F.lit("detect").alias("meta_format"),
    )


# (name, uppercase hex magic prefix) in sniff precedence order — PNG's full
# 8-byte signature before the shorter prefixes.
MAGIC_PREFIXES: tuple[tuple[str, str], ...] = (
    ("png", "89504E470D0A1A0A"),
    ("jpeg", "FFD8FF"),
    ("gif", "47494638"),
    ("riff", "52494646"),
    ("pdf", "25504446"),
)


def sniff_media_format(content) -> "F.Column":
    """Magic-byte container sniffing over a binary column — entirely
    JVM-side (hex prefix compare, fuses into the scan): the metadata step
    a real ingest runs BEFORE deciding which decoder a payload needs."""
    # hex only the first 8 bytes (16 hex chars cover the longest magic):
    # F.hex over the whole payload would materialize a string 2x the blob
    # size per row just to compare a prefix
    h = F.hex(F.substring(content, 1, 8))
    out = None
    for name, pfx in MAGIC_PREFIXES:
        cond = F.substring(h, 1, len(pfx)) == pfx
        out = F.when(cond, name) if out is None else out.when(cond, name)
    return out.otherwise("unknown")


def frame_sample(media: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """'Frame sampling' plumbing demo: slice the binary payload into
    fixed-size chunks with explode — the same pattern a video
    frame-sampler uses (one row per sampled frame), all JVM-side.
    Byte-exact: slicing uses substr over the BINARY column (no string
    cast, so multi-byte/non-utf8 payloads chunk by bytes, not chars)."""
    n = F.length("content")
    idx = F.sequence(F.lit(0), F.greatest((n - 1) / every_n_bytes, F.lit(0)).cast("int"))
    return media.select(
        "media_id",
        F.posexplode(
            F.transform(
                idx,
                lambda i: F.substr(
                    F.col("content"), i * every_n_bytes + 1, F.lit(every_n_bytes)
                ),
            )
        ).alias("frame_no", "frame_payload"),
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def resize_stub(
    media: DataFrame, width: int = 64, height: int = 64
) -> DataFrame:
    """Resize plumbing via mapInPandas: same Arrow-batched shape a real
    resampler (PIL/torchvision) would use. The stub 'resizes' by
    deterministic byte truncation/tiling to width*height bytes — REPLACE
    the inner transform with a real decoder+resampler in production;
    schema, batching, and partitioning stay as-is."""
    target = width * height

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_bytes = []
            for content in pdf["content"]:
                b = bytes(content or b"")
                if not b:
                    b = b"\x00"
                reps = (target + len(b) - 1) // len(b)
                out_bytes.append((b * reps)[:target])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "content": out_bytes,
                }
            )

    return media.mapInPandas(work, schema=RESIZED_SCHEMA)
