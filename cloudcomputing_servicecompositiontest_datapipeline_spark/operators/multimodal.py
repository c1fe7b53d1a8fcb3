"""Multimodal column carrier (SURVEY.md §2.12 X5): image/audio/video as
opaque ``binary`` columns with typed metadata, processed via Arrow-batched
``mapInPandas``.

The container has no image/audio codecs, so the decode kernels are STUBBED
with a clearly-marked deterministic fake (see :func:`_fake_decode`) — the
Spark-side plumbing (schema, batch iteration, partition behavior, UDF
signatures) is real and tested; swapping the fake for PIL/ffmpeg is a
one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Output schema of the decode stage: original id + typed media metadata.
DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("content_sha", StringType()),
    ]
)

HAVE_REAL_CODECS = False  # flipped if PIL / soundfile etc. become available


def attach_binary(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build a multimodal carrier table: payload as ``binary`` (here derived
    from text — stands in for image bytes), content-addressed metadata struct.
    At 100 TB payloads live in parquet binary columns (or pointers to object
    storage) partitioned by content-hash prefix."""
    from ..sources.star import ensure_parallelism

    payload = F.encode(F.col(text_col), "UTF-8")
    return ensure_parallelism(df).select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.length(payload).alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """DETERMINISTIC FAKE decode (no codecs in this container): pretend the
    payload is an image and derive plausible dimensions from its digest.
    Replace with e.g. ``PIL.Image.open(io.BytesIO(payload)).size`` when real
    codecs are present."""
    d = hashlib.sha256(payload).digest()
    width = 64 + d[0] % 192
    height = 64 + d[1] % 192
    channels = 1 + d[2] % 4
    return width, height, channels


def decode_media(df: DataFrame) -> DataFrame:
    """Decode/feature-extract over Arrow batches via ``mapInPandas`` — the
    real multimodal execution pattern: Python kernel, vectorized transfer,
    per-partition streaming (bounded memory regardless of corpus size)."""
    if not isinstance(df.schema["payload"].dataType, BinaryType):
        raise TypeError("payload column must be binary")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # NULL payload = missing/corrupt media: surface the row with
            # NULL decode fields (bytes(None) would kill the whole Arrow
            # task, and dropping the row would hide the corruption)
            payloads = pdf["payload"]
            dims = [
                _fake_decode(bytes(p)) if p is not None else (None, None, None)
                for p in payloads
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": [
                        m["mime"] if m is not None else None for m in pdf["meta"]
                    ],
                    "n_bytes": [
                        len(bytes(p)) if p is not None else None for p in payloads
                    ],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "channels": [d[2] for d in dims],
                    "content_sha": [
                        hashlib.sha256(bytes(p)).hexdigest() if p is not None else None
                        for p in payloads
                    ],
                }
            )

    return df.mapInPandas(batches, DECODE_SCHEMA)


#: Output schema of the feature-extract stage: id + fixed-width embedding.
FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("feature", StringType()),  # csv-joined floats: keeps the
        # driver canonicalizer array-free; parse with split+cast downstream
        StructField("dim", IntegerType()),
    ]
)


def extract_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """Feature extraction over the binary carrier via ``mapInPandas`` — the
    embedding stage of a multimodal pipeline (CLIP-style image encoder in
    production; DETERMINISTIC FAKE here: byte-histogram moments from the
    payload digest, stable across runs and engines).  Same Arrow-batch
    pattern as :func:`decode_media`: Python kernel, vectorized transfer,
    per-partition streaming, no shuffle introduced."""
    if not isinstance(df.schema["payload"].dataType, BinaryType):
        raise TypeError("payload column must be binary")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for p in pdf["payload"]:
                if p is None:  # missing media: NULL feature, row surfaced
                    feats.append(None)
                    continue
                d = hashlib.sha256(bytes(p)).digest()
                vec = [round(d[i] / 255.0, 6) for i in range(dim)]
                feats.append(",".join(f"{v:.6f}" for v in vec))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "feature": feats, "dim": [dim] * len(feats)}
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)


def resize_media(df: DataFrame, *, max_side: int = 128) -> DataFrame:
    """Resize stage: recompute target dimensions so the longest side is
    ``max_side`` (aspect preserved, integer floor) and pass the payload
    through.  The geometry math is JVM-side column arithmetic on the decoded
    dims; only the (stubbed) pixel resample would live in a Python kernel —
    at scale that keeps the common fast path (metadata-only resize planning)
    out of Python entirely."""
    decoded = decode_media(df).select("doc_id", "width", "height")
    carrier = df.join(decoded, "doc_id")
    longest = F.greatest("width", "height")
    scale = F.least(F.lit(1.0), F.lit(max_side) / longest)
    return carrier.select(
        "doc_id",
        "payload",
        "width",
        "height",
        F.floor(F.col("width") * scale).cast("int").alias("out_width"),
        F.floor(F.col("height") * scale).cast("int").alias("out_height"),
    )


def frame_sample(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling analogue for video payloads: emit one row per sampled
    offset (explode is the Spark-side fan-out a real frame sampler uses).
    Uses byte offsets as stand-in frame indexes — STUB per module docstring."""
    n_frames = F.greatest((F.length("payload") / every_n_bytes).cast("int"), F.lit(1))
    return (
        # NULL payload: no media to sample — zero frames, not one phantom
        # frame (greatest() SKIPS the NULL length and would emit offset 0)
        df.where(F.col("payload").isNotNull())
        .select(
            "doc_id", F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx")
        )
        .withColumn("byte_offset", F.col("frame_idx") * every_n_bytes)
    )
