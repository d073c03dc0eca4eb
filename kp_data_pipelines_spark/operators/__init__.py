"""DataFrame-level operators (SURVEY.md §2.2-§2.8 + north-star extensions)."""

from kp_data_pipelines_spark.operators.aggregates import (
    collect_set_joined,
    control_sum,
    grouped_sum,
    pivot_sum,
)
from kp_data_pipelines_spark.operators.dedup import (
    dedup_exact,
    dedup_keep_first,
    duplicate_rows,
    row_fingerprint,
    with_duplicate_count,
)
from kp_data_pipelines_spark.operators.joins import (
    anti_join,
    containment_join,
    lookup_join,
    merge_indicator,
    semi_join,
)
from kp_data_pipelines_spark.operators.reconcile import reconcile

__all__ = [
    "lookup_join",
    "merge_indicator",
    "semi_join",
    "anti_join",
    "containment_join",
    "dedup_exact",
    "dedup_keep_first",
    "duplicate_rows",
    "with_duplicate_count",
    "row_fingerprint",
    "grouped_sum",
    "collect_set_joined",
    "pivot_sum",
    "control_sum",
    "reconcile",
]
