"""Structured Streaming equivalents of the reference's snapshot-folder
ingestion (SURVEY.md A8/S9) plus event-time analytics for the ``events``
table.

The reference's ``json_cleaning.ipynb:246-264`` loop — read each new file,
concat, drop_duplicates, bound memory — IS a hand-written micro-batch file
source with per-batch dedup. Here it's the real thing:

- file source (``readStream``) with ``Trigger.AvailableNow`` (process the
  backlog once, checkpoint, stop — the batch-ish drop-folder semantics),
- ``withWatermark`` + ``dropDuplicatesWithinWatermark`` for bounded-state
  dedup (the scale-safe version of "concat then drop_duplicates"),
- tumbling/sliding event-time window aggregation with late-data handling.

State scale note: watermark bounds the dedup/agg state; at 100 TB/day the
state store holds only the watermark horizon, not history — exactly the
memory bound the reference's loop was hand-approximating.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def stream_files(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """S6/S9 streaming twin: watch a drop-folder as an unbounded table."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.format(fmt).load(path)


def dedup_within_watermark(
    df: DataFrame, keys: list[str], ts_col: str, watermark: str = "1 hour"
) -> DataFrame:
    """A8 scale-safe dedup: state bounded by the watermark horizon."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def windowed_event_counts(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling (or sliding) event-time window counts + value sums with
    late-data tolerance. Batch twin: catalog q25_window_events."""
    w = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(w.alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n_events",
            "total_value",
        )
    )


def run_available_now(
    stream_df: DataFrame, checkpoint_dir: str, output_mode: str = "append"
) -> DataFrame:
    """Execute a streaming query over the current backlog (AvailableNow),
    collect results via an in-memory sink, and stop. Returns the sink table
    as a batch DataFrame. For production use write to parquet/Delta with the
    same checkpoint; memory sink is for tests/smoke."""
    import uuid

    name = f"sink_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def ingest_snapshot_folder(
    spark: SparkSession,
    source_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    schema: StructType,
    dedup_keys: list[str],
    ts_col: str,
    fmt: str = "parquet",
    watermark: str = "24 hours",
) -> None:
    """The complete A8 pipeline: drop-folder -> bounded dedup -> parquet
    table, exactly-once via checkpoint. Idempotent across reruns: files
    already checkpointed are skipped (the reference re-read everything)."""
    src = stream_files(spark, source_dir, schema, fmt)
    deduped = dedup_within_watermark(src, dedup_keys, ts_col, watermark)
    q = (
        deduped.writeStream.format("parquet")
        .option("path", target_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
