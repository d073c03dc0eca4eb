"""Readers (SURVEY.md §2.1).

The reference infers schemas per file (``low_memory=False``); at 100 TB we
read with explicit schemas from the registry — inference is a full extra
pass and nondeterministic under drift. Encoding variants (UTF-16 CSV S2,
BOM S3, UTF-16 JSON S5, NDJSON S6) map to reader options.

Excel (S4) has no native Spark source: ``read_excel_via_pandas`` does the
driver-side pandas read (reference files are small report workbooks) and
ships rows through Arrow into a distributed DataFrame; at scale the ingest
layer converts workbooks to parquet on landing instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_parquet(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Parquet scan. ``merge_schema`` reconciles evolved schemas across
    files/partitions (columns added over time union in as nulls for old
    files) — the schema-evolution read for long-lived versioned or
    snapshot tables; off by default because footer merging costs one
    extra pass over file metadata."""
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", True)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


_NANOS_COLS_CACHE: dict[str, list[str]] = {}


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Parquet TIMESTAMP(NANOS) columns (footer-only metadata read).

    Spark's parquet reader rejects nano-precision timestamps; we read them
    as longs (legacy conf) and rebuild TimestampType at micro precision —
    a distributed per-row expression, never a driver collect."""
    if path not in _NANOS_COLS_CACHE:
        try:
            import pyarrow.parquet as pq

            schema = pq.read_schema(path)
            _NANOS_COLS_CACHE[path] = [
                f.name for f in schema if str(f.type) == "timestamp[ns]"
            ]
        except Exception:
            _NANOS_COLS_CACHE[path] = []
    return _NANOS_COLS_CACHE[path]


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Testdata convention: ``{sf_dir}/{name}.parquet``."""
    from pyspark.sql import functions as F

    path = f"{sf_dir}/{name}.parquet"
    # Micros-precision parquet timestamps with isAdjustedToUTC=false would
    # otherwise infer TIMESTAMP_NTZ (Spark 4 default), which watermarks
    # reject and whose epoch math (unix_micros) is session-tz-dependent.
    # Read them as classic TIMESTAMP: the stored int64 is taken as
    # epoch-UTC micros, independent of the session timezone.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    ns_cols = _nanos_timestamp_cols(path)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        # integer division: `/ 1000` is DOUBLE division, and 2024-era nano
        # values (~1.7e18) exceed double's 2^53 exact range — ~12% of true
        # nano-precision stamps would come back 1us off
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


TESTDATA_TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def register_views(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> None:
    """Register every testdata table as a temp view so users can drive the
    engine with plain ``spark.sql(...)`` — the SQL face of the same
    nanos-safe readers (each view goes through ``read_table``, so foreign
    sessions inherit the timestamp handling)."""
    for name in tables or TESTDATA_TABLES:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    encoding: str = "UTF-8",
    header: bool = True,
) -> DataFrame:
    """S1/S2/S3: CSV with explicit schema; UTF-16/BOM via ``encoding``."""
    reader = (
        spark.read.option("header", header)
        .option("encoding", encoding)
        .option("mode", "PERMISSIVE")
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_ndjson(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """S6: line-delimited JSON — Spark's native json source."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """ORC scan — Spark-native columnar source with the same predicate
    pushdown / column pruning / partition discovery as parquet (the
    interchange format warehouses emit; no reference equivalent, added
    for source-format parity with the parquet path)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def read_json_doc(
    spark: SparkSession, path: str, encoding: str = "UTF-8", schema: StructType | None = None
) -> DataFrame:
    """S5/S7: whole-document JSON (array or object), optionally UTF-16.

    Nested structs stay native (StructType/ArrayType); callers flatten with
    ``select("field.*")`` / ``inline`` — the Spark-native json_normalize."""
    reader = spark.read.option("multiLine", True).option("encoding", encoding)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def flatten_multiindex_columns(pdf):
    """The reference's ``tidy`` (Financial Snapshot Preprocess.ipynb:199-228):
    multi-row Excel headers flatten by joining levels with '_' and dropping
    pandas' 'Unnamed: …' placeholder slots. Pure pandas — testable without
    an xlsx engine."""
    import pandas as pd

    if isinstance(pdf.columns, pd.MultiIndex):
        pdf.columns = [
            "_".join(
                str(level)
                for level in tup
                if str(level) and not str(level).startswith("Unnamed")
            )
            for tup in pdf.columns
        ]
    return pdf


def read_excel_via_pandas(spark: SparkSession, path: str, **pandas_kwargs) -> DataFrame:
    """S4: Excel ingest. Driver-side pandas read + Arrow createDataFrame.

    Supports the reference's sheet_name / skiprows / multi-row header
    patterns via ``pandas_kwargs``; multi-row headers go through
    ``flatten_multiindex_columns``."""
    import pandas as pd

    pdf = pd.read_excel(path, **pandas_kwargs)
    return spark.createDataFrame(flatten_multiindex_columns(pdf))


def read_jdbc(
    spark: SparkSession, url: str, table: str, partition_options: dict | None = None
) -> DataFrame:
    """S8: JDBC scan (Study Startup Data Download.sql). ``partition_options``
    should carry partitionColumn/lowerBound/upperBound/numPartitions for
    parallel reads at scale."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (partition_options or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def read_binary_dir(spark: SparkSession, glob: str) -> DataFrame:
    """S10: directory-of-files source (Protocol Data Gathering.ipynb) —
    binaryFile gives (path, modificationTime, length, content)."""
    return spark.read.format("binaryFile").load(glob)
