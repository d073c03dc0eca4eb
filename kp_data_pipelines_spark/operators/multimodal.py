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


# --- perceptual fingerprints (media near-dup dedup) ------------------------
#
# dHash-style gradient fingerprint over opaque media bytes: pool the byte
# stream into an 8x9 grid of integer cell sums (the "resize" of classic
# dHash, with byte values standing in for decoded pixel luma — swap the
# byte array for a real decoder's pixel array when a codec is wired in),
# then emit one bit per horizontally-adjacent cell comparison (8 rows x 8
# comparisons = 64 bits). All integer arithmetic, so the Arrow kernel, the
# interpreted JVM expression twin, and the DuckDB oracle agree bit-for-bit.
# Reference basis: the reference's only media gesture is a directory
# traversal stub (Protocol Data Gathering.ipynb:23-33); this is north-star
# surface (near-dup detection for image/audio/video payloads at 100 TB).

_DHASH_ROWS, _DHASH_COLS = 8, 9  # 72 pooled cells -> 8 x 8 gradient bits
_DHASH_CELLS = _DHASH_ROWS * _DHASH_COLS
_I64_MIN = -(1 << 63)


def _dhash_from_cells(cells) -> int:
    """Pack the 64 gradient bits (cell[r][c+1] > cell[r][c]) into a signed
    64-bit int, bit b = r*8 + c; bit 63 contributes -2^63 (two's
    complement) so the value fits BIGINT on every engine."""
    fp = 0
    for r in range(_DHASH_ROWS):
        for c in range(_DHASH_COLS - 1):
            if cells[r * _DHASH_COLS + c + 1] > cells[r * _DHASH_COLS + c]:
                b = r * 8 + c
                fp += _I64_MIN if b == 63 else (1 << b)
    return fp


def media_dhash_kernel():
    """Arrow-batched numpy dHash over a binary column: bytes -> 72 exact
    integer cell sums (cumsum differences over floor(g*n/72) boundaries;
    empty cells sum to 0) -> packed 64-bit gradient fingerprint. Integer
    arithmetic end to end — bit-identical to the interpreted JVM
    expression twin (pinned by test_media_dhash_kernel_matches_jvm) and
    the DuckDB oracle."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    @pandas_udf(LongType())
    def _dhash(batch: pd.Series) -> pd.Series:
        out = []
        for buf in batch:
            if buf is None:
                out.append(None)
                continue
            b = np.frombuffer(bytes(buf), np.uint8).astype(np.int64)
            n = b.size
            cs = np.concatenate(([0], np.cumsum(b)))
            bounds = (np.arange(_DHASH_CELLS + 1, dtype=np.int64) * n) // _DHASH_CELLS
            cells = cs[bounds[1:]] - cs[bounds[:-1]]
            out.append(_dhash_from_cells(cells.tolist()))
        return pd.Series(out, dtype="object").astype("Int64")

    return _dhash


def with_media_dhash(df: DataFrame, content_col: str = "content",
                     out: str = "phash", impl: str = "kernel") -> DataFrame:
    """Attach the dHash perceptual fingerprint of a binary media column.

    ``impl='kernel'`` (default, the hot path) is the Arrow numpy kernel;
    ``impl='expr'`` is the interpreted JVM expression twin — same value,
    used by the pin test and as the zero-Python fallback."""
    if impl == "kernel":
        return df.withColumn(out, media_dhash_kernel()(F.col(content_col)))
    if impl != "expr":
        raise ValueError(f"unknown impl {impl!r}")
    hx = f"hex({content_col})"
    # sequence(1, 0) DESCENDS in Spark — guard the empty-payload case
    byts = (
        f"if(length({hx}) < 2, array(), "
        f"transform(sequence(1, length({hx}) div 2), "
        f"i -> cast(conv(substring({hx}, 2 * i - 1, 2), 16, 10) as bigint)))"
    )
    df = df.withColumn(
        "__mm_bytes",
        F.expr(f"case when {content_col} is null then null else {byts} end"),
    )
    cells = (
        f"transform(sequence(0, {_DHASH_CELLS - 1}), g -> aggregate("
        f"slice(__mm_bytes, (g * size(__mm_bytes)) div {_DHASH_CELLS} + 1, "
        f"((g + 1) * size(__mm_bytes)) div {_DHASH_CELLS} "
        f"- (g * size(__mm_bytes)) div {_DHASH_CELLS}), "
        f"0L, (acc, x) -> acc + x))"
    )
    df = df.withColumn(
        "__mm_cells",
        F.expr(f"case when __mm_bytes is null then null else {cells} end"),
    )
    fp = (
        "aggregate(transform(sequence(0, 63), bb -> "
        "if(element_at(__mm_cells, cast((bb div 8) * 9 + (bb % 8) + 2 as int)) > "
        "element_at(__mm_cells, cast((bb div 8) * 9 + (bb % 8) + 1 as int)), "
        f"if(bb = 63, {_I64_MIN}L, shiftleft(1L, bb)), 0L)), "
        "0L, (acc, x) -> acc + x)"
    )
    return df.withColumn(
        out, F.expr(f"case when __mm_cells is null then null else {fp} end")
    ).drop("__mm_bytes", "__mm_cells")


def constellation_landmarks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    w: int = 32,
    fan: int = 3,
) -> DataFrame:
    """Shazam-style landmark constellation keys over a char-stream
    payload (Wang 2003): frame the payload into ``w``-char windows,
    take each frame's peak (argmax char code, first-occurrence ties),
    and pair it with the next 1..``fan`` frames' peaks into integer
    constellation keys (peak position x peak position x delta x coarse
    code buckets). Returns ``(id_col, t, key)`` — one row per landmark,
    ``t`` the anchor frame index. Shared by q308 (cross-media matching)
    and q312 (clip retrieval); the DuckDB twin is
    ``oracles._constellation_lm_ctes``.

    Scale shape: frame explode linear in payload chars; the interpreted
    32-element peak fold is materialized ONCE per frame via stepwise
    projections; LEAD windows are per-payload. The production key packs
    quantized spectral peaks into the same integer contract.

    Per-(id, key) multiplicity is capped at 8 (earliest frames kept,
    deterministic — (id, key, t) is unique because the key encodes the
    delta): a periodic/constant payload repeats ONE key across its
    whole timeline, and without the cap a downstream key equi-join
    (q308/q312) would square that multiplicity per matching pair —
    10^11 rows for two 10 MB constant payloads. With the cap, per-key
    join fanout is bounded by (distinct-id cap x 8)^2 regardless of
    payload length. Empty payloads are filtered here (not at call
    sites): Spark's sequence(0, -1) would DESCEND and emit phantom
    frames the DuckDB twin's range() never produces."""
    from pyspark.sql import Window

    df = df.filter(F.length(text_col) > 0)
    nfr = F.expr(
        f"CAST((length({text_col}) + {w - 1}) div {w} AS INT)"
    )
    fr = df.select(
        id_col, text_col, F.explode(F.sequence(F.lit(0), nfr - 1)).alias("t")
    ).select(
        id_col,
        "t",
        F.expr(f"substring({text_col}, t * {w} + 1, {w})").alias("f"),
    )
    codes = F.transform(
        F.filter(F.split(F.col("f"), ""), lambda c: c != ""), F.ascii
    )
    pk = (
        fr.select(id_col, "t", codes.alias("codes"))
        .select(id_col, "t", "codes", F.array_max("codes").alias("v"))
        .select(
            id_col,
            "t",
            "v",
            F.array_position("codes", F.col("v")).alias("p"),
        )
    )
    win = Window.partitionBy(id_col).orderBy("t")
    lm0 = pk.select(
        id_col,
        "t",
        "p",
        "v",
        *[
            c
            for d in range(1, fan + 1)
            for c in (
                F.lead("p", d).over(win).alias(f"p{d}"),
                F.lead("v", d).over(win).alias(f"v{d}"),
            )
        ],
    )
    lm = None
    for d in range(1, fan + 1):
        part = lm0.filter(F.col(f"p{d}").isNotNull()).select(
            id_col,
            "t",
            F.expr(
                f"CAST((((p * {w + 1} + p{d}) * {fan} + {d - 1}) * 16"
                f" + (v div 64) * 4 + (v{d} div 64)) AS BIGINT)"
            ).alias("key"),
        )
        lm = part if lm is None else lm.unionByName(part)
    wcap = Window.partitionBy(id_col, "key").orderBy("t")
    return (
        lm.withColumn("__mrn", F.row_number().over(wcap))
        .filter(F.col("__mrn") <= 8)
        .drop("__mrn")
    )
