"""Sinks (SURVEY.md K1-K4).

``write_table`` is the scale path (partitioned parquet, versioned
overwrite). ``write_report_csv`` reproduces the reference's single-file CSV
contract (coalesce(1) — report outputs only, never the 100 TB path).
Excel report emission (K2/K3) collects small results to pandas by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_table(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """K1-scale: parquet sink; partition by date/snapshot columns so the S9
    latest-snapshot pattern becomes partition pruning."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_versioned(df: DataFrame, base_path: str, version: str) -> str:
    """K4: backup-before-overwrite becomes versioned immutable writes."""
    path = f"{base_path}/version={version}"
    df.write.mode("error").parquet(path)
    return path


def write_report_csv(df: DataFrame, path: str, header: bool = True) -> None:
    """K1: single-file CSV contract for report consumers (small outputs)."""
    df.coalesce(1).write.mode("overwrite").option("header", header).csv(path)


def write_report_excel(df: DataFrame, path: str, sheet_name: str = "Sheet1") -> None:
    """K2: Excel sink — collect-to-pandas, small report outputs only."""
    df.toPandas().to_excel(path, sheet_name=sheet_name, index=False)


def write_report_excel_multi(
    sheets: "dict[str, DataFrame]", path: str
) -> None:
    """K3: multi-sheet Excel reconciliation report (Summary / Matched /
    Detail — DOR VP Compare.ipynb:552-634). Collects each (small) sheet to
    pandas; requires an Excel engine (openpyxl/xlsxwriter) at runtime."""
    import pandas as pd

    with pd.ExcelWriter(path) as writer:
        for name, df in sheets.items():
            df.toPandas().to_excel(writer, sheet_name=name[:31], index=False)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: "list[str]",
    num_buckets: int = 32,
    sort_cols: "list[str] | None" = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed-table sink: co-locates join/agg keys at WRITE time
    so repeated joins on ``bucket_cols`` skip the shuffle entirely (both
    sides bucketed the same way -> SortMergeJoin with zero Exchange).
    The 100 TB pattern for fact-to-fact joins that broadcast can't cover."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def compact_table(
    spark, path: str, target_file_bytes: int = 128 << 20
) -> int:
    """Rewrite a parquet directory into ~target-size files (the
    small-files remedy: a streaming sink or over-parallel write leaves
    thousands of KB-scale files whose per-file open/footer cost dominates
    scans at 100 TB). Sizes from the actual on-disk bytes, rewrites via a
    temp dir then atomic-ish swap. Returns the new file count."""
    import math
    import os
    import shutil

    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compacting"
    df.repartition(n).write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + "__old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n
