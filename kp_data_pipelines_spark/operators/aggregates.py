"""Aggregation helpers (SURVEY.md §2.5, A1-A7).

Scale notes: all of these are partial-aggregatable (map-side combine) —
Catalyst plans HashAggregate(partial) -> shuffle -> HashAggregate(final).
``pivot_sum`` takes an explicit value list (two-phase distinct+pivot) so the
pivot never collects unbounded distinct values at 100 TB; ``exact_sum``
aggregates in DECIMAL so results are order-independent bitwise — a
requirement for distributed reproducibility of financial control sums
(double summation is order-dependent; shuffle order is not deterministic).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_sum(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Order-independent money sum: sum(decimal) then cast back to double.

    Reference sums float64 then rounds (DOR VP Compare.ipynb:655); decimal
    aggregation gives the same value deterministically under any partition
    order.

    Contract: values are money at ``scale`` decimal places — each value is
    HALF_UP-rounded to ``scale`` BEFORE summing (the paired SQL oracles do
    the same per-value CAST, so both engines agree bit-for-bit). For
    sub-scale quantities (micropayments, rates) raise ``scale``; values at
    or beyond 10^(precision-scale) overflow and raise under ANSI — raise
    ``precision`` for such columns."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def grouped_sum(
    df: DataFrame, keys: Sequence[str], amounts: Sequence[str], exact: bool = True
) -> DataFrame:
    """A1: ``groupby(keys)[amounts].sum()`` (DOR VP Compare.ipynb:28)."""
    agg = [
        (exact_sum(a) if exact else F.sum(a)).alias(f"sum_{a}") for a in amounts
    ]
    return df.groupBy(*keys).agg(*agg)


def collect_set_joined(col: Column | str, sep: str = "; ") -> Column:
    """A2: sorted-distinct string collect — pandas
    ``lambda s: sep.join(sorted(set(s)))`` (DOP VP Compare.py:125-135) as a
    built-in (no UDAF): array_join(array_sort(collect_set(c)))."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_join(F.array_sort(F.collect_set(c)), sep)


def pivot_sum(
    df: DataFrame,
    key: str,
    pivot_col: str,
    value_col: str,
    values: Sequence[str] | None = None,
    exact: bool = True,
) -> DataFrame:
    """A7: dynamic SUM-PIVOT (Study Startup Data Extract.sql:14-32).

    The T-SQL builds its column list with STRING_AGG(DISTINCT); here, if
    ``values`` is not given, we run a distinct() on the pivot column first
    (one small job) and pass the explicit list — keeps the pivot single-pass
    and bounded at scale."""
    if values is None:
        values = [
            r[0] for r in df.select(pivot_col).distinct().orderBy(pivot_col).collect()
        ]
    vc = F.col(value_col).cast("decimal(18,2)") if exact else F.col(value_col)
    out = df.groupBy(key).pivot(pivot_col, list(values)).agg(F.sum(vc))
    if exact:
        # Spark names a NULL pivot value's column "null" (not str(None))
        names = ["null" if v is None else str(v) for v in values]
        out = out.withColumns({n: F.col(f"`{n}`").cast("double") for n in names})
    return out


def control_sum(df: DataFrame, *amounts: str) -> dict[str, float]:
    """A3: grand-total validation sums (Saoirse Automation.ipynb:563,860).
    Driver-side by design — this is a guard, not a pipeline stage."""
    row = df.agg(*[exact_sum(a).alias(a) for a in amounts]).collect()[0]
    return {a: row[a] for a in amounts}


def observed_control_sums(df: DataFrame, *amounts: str):
    """A3 control sums as OBSERVED METRICS: attach the grand-total /
    row-count / null-count guards to the DataFrame so they are computed
    DURING the pipeline's own action (the write), not by a second scan.

    The reference prints control sums around every transform
    (Saoirse Automation.ipynb:563,860; DOP VP Compare.py:199-209) —
    at 100 TB each printed total is another full pass. ``df.observe``
    rides the existing job: accumulator-style metrics collected per
    task, zero extra scans, available from the returned ``Observation``
    after the first action. Sums aggregate in DECIMAL(18,2) (the
    ``exact_sum`` rule) so the observed totals are partition-order
    independent and comparable across runs.

    Returns ``(df_with_observation, observation)``; read
    ``observation.get`` after an action.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation()
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for a in amounts:
        metrics.append(exact_sum(a).alias(f"sum_{a}"))
        metrics.append(
            F.sum(F.col(a).isNull().cast("long")).alias(f"nulls_{a}")
        )
    return df.observe(obs, *metrics), obs
