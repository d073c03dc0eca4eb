"""Column-expression kits: pure ``Column -> Column`` functions.

These are the Spark-first re-expressions of the reference's scalar cleaning
surface (SURVEY.md §2.9, C1-C19). All run JVM-side inside whole-stage
codegen — no Python UDFs.
"""

from kp_data_pipelines_spark.functions.cleaning import (
    coerce_long,
    coerce_numeric,
    conditional_update,
    fill_from,
    null_count,
    sentinel_to_null,
)
from kp_data_pipelines_spark.functions.dates import (
    cascading_to_timestamp,
    compact_month_end,
    month_name,
    month_start,
    months_ago,
)
from kp_data_pipelines_spark.functions.strings import (
    collapse_whitespace,
    normalize_key,
    scrub_control_chars,
    strip_total_suffix,
)

__all__ = [
    "coerce_numeric",
    "coerce_long",
    "sentinel_to_null",
    "fill_from",
    "conditional_update",
    "null_count",
    "cascading_to_timestamp",
    "compact_month_end",
    "month_start",
    "months_ago",
    "month_name",
    "collapse_whitespace",
    "normalize_key",
    "scrub_control_chars",
    "strip_total_suffix",
]
