"""Custom Python DataSource (Spark 4 DataSource API): a deterministic
synthetic document corpus generated ON THE EXECUTORS.

Why it exists: load/perf testing the text operators at arbitrary scale
without materializing input files — `partitions × rows_per_partition`
scales to any size with zero driver involvement and no I/O, and the
seeded per-partition RNG makes every run bit-identical.

Reference seed: the reference's only "source generator" is hand-made
test frames inside notebooks; this is the engine-native equivalent
(SURVEY.md §2.1 S-family).

Usage::

    spark.dataSource.register(SyntheticCorpusDataSource)
    df = (spark.read.format("synthetic_corpus")
          .option("partitions", 16)
          .option("rows_per_partition", 10_000)
          .option("seed", 7)
          .load())
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_WORDS = (
    "key agg row scan slow fast table value part hash merge batch spark "
    "line sort window column join small customer query big group stream "
    "filter order data the a"
).split()
_LANGS = ["en", "de", "fr", "es", "it"]
_SOURCES = ["web", "books", "code", "news"]


class SyntheticCorpusDataSource(DataSource):
    """`format("synthetic_corpus")` — schema mirrors the testdata
    `documents` table so every text operator runs on it unchanged."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_corpus"

    def schema(self) -> str:
        return (
            "doc_id bigint, text string, lang string, source string, "
            "n_chars bigint"
        )

    def reader(self, schema) -> "SyntheticCorpusReader":
        return SyntheticCorpusReader(self.options)


class SyntheticCorpusReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_partitions = int(options.get("partitions", 8))
        self.rows_per_partition = int(options.get("rows_per_partition", 1000))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        # one InputPartition per generator shard -> Spark schedules them
        # as independent tasks; no partition reads driver state
        return [InputPartition(i) for i in range(self.n_partitions)]

    def read(self, partition: InputPartition):
        import random

        pid = partition.value
        rng = random.Random(f"{self.seed}:{pid}")
        base = pid * self.rows_per_partition
        for i in range(self.rows_per_partition):
            n_words = rng.randint(20, 120)
            text = " ".join(rng.choice(_WORDS) for _ in range(n_words))
            yield (
                base + i,
                text,
                rng.choice(_LANGS),
                rng.choice(_SOURCES),
                len(text),
            )
