"""Shared persistent-state parquet I/O for the streaming stores.

Every growing-store stream (cdc chunk store, media fingerprint store,
decontamination ledger, order watermarks) reads its state dir with the
same contract: a MISSING path means "first batch ever" (empty frame with
the explicit schema), anything else re-raises loudly — silently
resetting state would let cross-batch duplicates through. Missing-path
detection uses the Hadoop FileSystem API, which is deterministic across
Spark versions and locales; the previous pattern (substring-matching the
AnalysisException message for 'PATH_NOT_FOUND') would have turned every
first-batch run into a hard failure the day the wording changed
(round-8 ADVICE item, fixed here for all callers at once).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def path_exists(spark: SparkSession, path: str) -> bool:
    """Probe a path via the Hadoop FileSystem of the active session —
    works for any scheme the cluster's Hadoop conf resolves (local,
    HDFS, object stores)."""
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs.exists(hpath)


def write_marker(spark: SparkSession, path: str, text: str) -> None:
    """Write a tiny driver-side marker file (overwrite) via the Hadoop
    FileSystem — NO Spark job. A one-row parquet write costs a full job
    + commit protocol (~0.3-0.5 s); per-trigger scalars (order-guard
    watermarks) cannot afford that at streaming cadence (it quadrupled
    q310's bench time before this existed)."""
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def read_markers(spark: SparkSession, dir_path: str) -> dict[str, str]:
    """Read every marker file in a directory (driver-side, no Spark
    job): {file name -> content}. Missing dir = first run ({})."""
    jvm = spark.sparkContext._jvm
    hdir = jvm.org.apache.hadoop.fs.Path(dir_path)
    fs = hdir.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if not fs.exists(hdir):
        return {}
    out: dict[str, str] = {}
    for status in fs.listStatus(hdir):
        p = status.getPath()
        if not status.isFile():
            continue
        stream = fs.open(p)
        try:
            data = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        finally:
            stream.close()
        out[p.getName()] = bytes(data).decode("utf-8")
    return out


def read_state_parquet(
    spark: SparkSession, state_dir: str, schema: str
) -> DataFrame:
    """Read a persistent parquet state table; missing path = first
    batch (empty frame with the explicit schema — an existing-but-empty
    dir would otherwise raise UNABLE_TO_INFER_SCHEMA, which the explicit
    schema also prevents). Read errors on an EXISTING path (corrupt
    footer, permissions, transient IO) raise loudly."""
    if not path_exists(spark, state_dir):
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(state_dir)
