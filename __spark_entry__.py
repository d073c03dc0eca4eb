"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship reconciliation pipeline (the reference's
core analytical pattern, DOP VP Compare.py) on sf0.001.
``queries()`` / ``oracle_sql()`` expose the operator catalog from
``kp_data_pipelines_spark.catalog`` — one entry per implemented operator
from SURVEY.md §2 plus the north-star text/dedup/similarity operators,
each with a DuckDB-oracle SQL twin where SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kp_data_pipelines_spark.catalog import ORACLE, QUERIES  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: two-source reconciliation summary at sf0.001."""
    return QUERIES["q04_reconcile_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
