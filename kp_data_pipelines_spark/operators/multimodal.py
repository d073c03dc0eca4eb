"""Multimodal column plumbing (north star).

Images/audio/video are opaque ``binary`` columns with typed metadata
structs. The Spark-side contract — schema, partitioning, Arrow batch shape,
UDF signatures — is real and tested; the actual codec calls are stubbed
behind ``DECODERS`` because media libraries aren't in this environment
(deterministic fake decode for tests, ``NotImplementedError`` for real
codecs until a library is wired in).

Scale notes: media rows are large and skew partition sizes — everything
here goes through ``mapInPandas`` (Arrow batches, no per-row Python
dispatch), and ``repartition_for_media`` targets a bytes-per-partition
budget instead of a row count.
"""

from __future__ import annotations

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

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),  # -1 when unknown/not applicable
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_sha", StringType()),
        StructField("feature", StringType()),
    ]
)


def _fake_decode(content: bytes, kind: str) -> str:
    """Deterministic stand-in for a codec: stable digest-derived token.
    Replace with a real decoder (PIL/ffmpeg/...) when available."""
    import hashlib

    return f"{kind}:{hashlib.sha256(content or b'').hexdigest()[:12]}"


def _real_decode(content: bytes, kind: str) -> str:
    """Real image decode via PIL when installed (this sandbox has no
    media libraries); raises NotImplementedError otherwise. Same
    contract as the fake — ``(bytes, kind) -> str feature token`` —
    pinned by the shared contract test. Audio/video stay stubbed even
    with PIL present (ffmpeg-class deps); the plumbing (schema,
    mapInPandas batching, partitioning) is identical for all kinds."""
    if kind == "image":
        try:
            import io

            from PIL import Image
        except ImportError as e:
            raise NotImplementedError(
                "PIL not installed; install pillow or register a decoder "
                "in DECODERS to enable real image decode"
            ) from e
        with Image.open(io.BytesIO(content)) as im:
            return f"image:{im.width}x{im.height}:{im.mode}"
    raise NotImplementedError(
        f"no real {kind} codec wired; register one in DECODERS "
        "(e.g. an ffmpeg probe for audio/video)"
    )


DECODERS = {"fake": _fake_decode, "real": _real_decode}


def extract_media_features(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode/feature-extract media content via Arrow-batched mapInPandas.

    One Python worker call per Arrow batch (not per row); binary payloads
    stay in Arrow buffers end-to-end. A single-file scan is spread to at
    least 8 partitions first so decode work parallelizes (no-op at scale,
    where media tables arrive with many partitions)."""
    from kp_data_pipelines_spark.operators.similarity import ensure_parallelism

    df = ensure_parallelism(df)
    decode = DECODERS[decoder]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": content.map(lambda b: len(b) if b is not None else 0),
                    "content_sha": content.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "feature": [
                        decode(b, k) for b, k in zip(content, pdf["kind"])
                    ],
                }
            )

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)


def repartition_for_media(df: DataFrame, target_partition_bytes: int = 128 << 20,
                          size_col: str | None = None) -> DataFrame:
    """Partition by a bytes budget, not a row budget: media rows are KB-GB
    each, so row-count partitioning skews executor memory. Uses the exact
    per-row payload size (or ``size_col`` if precomputed)."""
    size = F.length("content").cast("long") if size_col is None else F.col(size_col)
    total = df.agg(F.sum(size).alias("b")).collect()[0]["b"] or 1
    n = max(1, int(total // target_partition_bytes) + 1)
    return df.repartition(n)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: explode a per-row frame timeline from
    duration metadata (decode of each frame is the stubbed step). Output is
    one row per (media_id, frame_ts_ms) — the unit of downstream work."""
    n_frames = F.greatest((F.col("duration_ms") / every_ms).cast("int"), F.lit(1))
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), n_frames - 1), lambda i: i * every_ms
                )
            ).alias("frame_ts_ms"),
        )
    )


def chunk_media(df: DataFrame, chunk_bytes: int = 1 << 20,
                content_col: str = "content") -> DataFrame:
    """Split opaque media blobs into fixed-size chunks ENTIRELY JVM-side:
    chunk boundaries come from a generated index sequence and the slice is
    ``substring`` on the binary column — no Python boundary, no UDF. One
    row per (media_id, chunk_idx) with the chunk payload + offset/length
    metadata; the unit of parallel downstream decode at 100 TB (a 4 GB
    video becomes 4096 independently schedulable 1 MB tasks)."""
    n_chunks = F.greatest(
        F.ceil(F.length(content_col) / F.lit(chunk_bytes)).cast("int"), F.lit(1)
    )
    offset = F.col("chunk_idx") * chunk_bytes + 1  # substring is 1-based
    return (
        df.select(
            "media_id",
            F.length(content_col).cast("long").alias("total_bytes"),
            F.col(content_col),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        )
        .select(
            "media_id",
            "chunk_idx",
            "total_bytes",
            (offset - 1).cast("long").alias("offset"),
            F.expr(
                f"substring({content_col}, chunk_idx * {chunk_bytes} + 1, "
                f"{chunk_bytes})"
            ).alias("chunk"),
        )
        .withColumn("chunk_len", F.length("chunk").cast("long"))
    )
