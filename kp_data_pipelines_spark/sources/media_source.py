"""Chunk-at-INGEST media source (Spark 4 Python DataSource API).

``multimodal.chunk_media`` splits an already-loaded binary COLUMN — which
requires each payload to exist as one row first, and a Spark row tops out
around 2 GB (byte-array/Arrow/parquet-page limits), so chunking-after-load
cannot be the 100 TB media ingest story. This source chunks BEFORE any row
materializes: the chunk plan (which file, which offset range) is computed
from file METADATA alone (path + size from the directory listing), one
task reads one bounded offset range with seek+read, and no row ever holds
more than ``chunk_bytes``. A 4 GB video therefore enters the engine as
4096 independently-scheduled 1 MB rows without any 4 GB row existing —
the claim chunk_media's docstring used to (wrongly) make for itself.

Output schema matches ``chunk_media``'s exactly (media_id, chunk_idx,
total_bytes, offset, chunk, chunk_len), so every downstream consumer
(q305's shared-segment pairs, chunk-hash dedup) runs on either path
unchanged — pinned by test_chunked_ingest_matches_chunk_media.

``media_id`` is the file's rank in the sorted listing by default, or the
stem's integer value with ``id_from_name=true`` (fixture files are written
as ``<media_id>.bin``). Listing uses the local filesystem here; a
production deployment swaps the listing call for its object-store API —
the plan/read split (metadata-only planning, bounded-range reads) is the
part that matters at scale.

Usage::

    spark.dataSource.register(ChunkedMediaDataSource)
    df = (spark.read.format("chunked_media")
          .option("path", "/data/media_dir")
          .option("chunk_bytes", 1 << 20)
          .load())
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

# One task reads at most this many bytes of one file — keeps task memory
# bounded and lets a single huge file fan out across the cluster.
TARGET_TASK_BYTES = 128 << 20


class ChunkedMediaDataSource(DataSource):
    """``format("chunked_media")`` — offset-range chunk rows planned from
    file metadata; no full payload ever materializes as one row."""

    @classmethod
    def name(cls) -> str:
        return "chunked_media"

    def schema(self) -> str:
        return (
            "media_id bigint, chunk_idx int, total_bytes bigint, "
            "offset bigint, chunk binary, chunk_len bigint"
        )

    def reader(self, schema) -> "ChunkedMediaReader":
        return ChunkedMediaReader(self.options)


class ChunkedMediaReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.path = options["path"]
        self.chunk_bytes = int(options.get("chunk_bytes", 1 << 20))
        self.id_from_name = str(
            options.get("id_from_name", "false")
        ).lower() in ("true", "1")
        self.task_bytes = int(options.get("task_bytes", TARGET_TASK_BYTES))

    def partitions(self):
        """The chunk PLAN: metadata only (listing + sizes), never file
        contents — the driver-side cost is one stat per file. Each
        InputPartition is (path, media_id, total, first_chunk,
        last_chunk_exclusive): a bounded byte range of one file."""
        chunks_per_task = max(1, self.task_bytes // self.chunk_bytes)
        parts = []
        names = sorted(
            n
            for n in os.listdir(self.path)
            if os.path.isfile(os.path.join(self.path, n))
        )
        for rank, name in enumerate(names):
            full = os.path.join(self.path, name)
            total = os.path.getsize(full)
            media_id = (
                int(os.path.splitext(name)[0]) if self.id_from_name else rank
            )
            n_chunks = max(1, -(-total // self.chunk_bytes))
            for first in range(0, n_chunks, chunks_per_task):
                parts.append(
                    InputPartition(
                        (
                            full,
                            media_id,
                            total,
                            first,
                            min(first + chunks_per_task, n_chunks),
                        )
                    )
                )
        return parts

    def read(self, partition: InputPartition):
        path, media_id, total, first, last = partition.value
        cb = self.chunk_bytes
        with open(path, "rb") as f:
            f.seek(first * cb)
            for ci in range(first, last):
                data = f.read(cb)
                yield (media_id, ci, total, ci * cb, data, len(data))


def chunked_media_ingest(spark, path: str, chunk_bytes: int = 1 << 20,
                         id_from_name: bool = False):
    """Read a directory of media files as chunk rows (the chunk-at-ingest
    path). Registers the datasource idempotently."""
    spark.dataSource.register(ChunkedMediaDataSource)
    return (
        spark.read.format("chunked_media")
        .option("path", path)
        .option("chunk_bytes", chunk_bytes)
        .option("id_from_name", str(id_from_name).lower())
        .load()
    )
