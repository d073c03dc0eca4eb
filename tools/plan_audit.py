"""Physical-plan audit over the whole query catalog.

For every ``queries()`` entry, builds the plan at the given sf dir and
flags scale anti-patterns:

- CartesianProduct            (always a bug)
- BroadcastNestedLoopJoin     (allowed only where declared intentional)
- missing PushedFilters on a filtered parquet scan is visible by eye --
  the audit prints the scan lines for any flagged query.

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# q18 runs the reference's substring-containment fallback join (J6):
# equi-pass first, nested-loop only on the unmatched remainder, with the
# lookup side broadcast -- the BNLJ there is the declared design.
# q135 is a banding join against a 4-row broadcast tier dimension: the
# range condition costs 4 comparisons per probe row with no shuffle,
# which is the correct physical plan for a tiny range dim (the same
# semantics switch to width_bucket equi-joins as the dim grows).
# q142 crossJoins its 10-row top-k against a 1-row global-stats
# aggregate -- both sides are bounded by construction (limit(10) and a
# scalar reduce), so the 10x1 BNLJ is the correct plan at any scale; a
# literal-key equi-join would constant-fold back to the same BNLJ.
INTENTIONAL_BNLJ = {
    "q18_containment_join",
    "q135_price_tier_join",
    "q142_join_skew_report",
    # q182: crossJoin(broadcast(<1-row scalar n_orders>)) — a broadcast of
    # exactly one row (the global order count) onto the top-100 pair set;
    # the candidate pairs themselves come from the basket equi-join.
    "q182_item_cooccurrence",
    # q186: crossJoin(broadcast(<1-row global prior>)) onto the 5-row
    # category aggregate — a scalar broadcast, not a pair generator.
    "q186_target_encoding",
    # q193: crossJoin(broadcast(<1-row corpus cap T>)) onto the |langs|-row
    # weight summary — a scalar broadcast, not a pair generator.
    "q193_mixture_quota_plan",
    # q199/q200: crossJoin(broadcast(<1-row totals/KS/chi2 scalars>)) —
    # scalar broadcasts onto histogram/digit summaries, not pair generators.
    "q199_distribution_drift",
    "q200_benford_audit",
    # q203/q204: crossJoin(broadcast(<1-row top5-sum / user-count scalar>))
    # onto key-histogram summaries — scalar broadcasts, not pair generators.
    "q203_join_cardinality_forecast",
    "q204_survival_curve",
    # q205: inherits q199's scalar broadcasts (1-row totals/KS/chi2) in the
    # shared _drift_stats_from_hist downstream — not a pair generator.
    "q205_streaming_drift_monitor",
    # q217/q218/q219: crossJoin(broadcast(<1-row bounds/funnel-counts/corpus
    # cardinality>)) — scalar broadcasts onto sketch partials / tiny
    # summaries, not pair generators.
    "q217_sliding_distinct_hll",
    "q218_funnel_timeout_steps",
    "q219_negative_sampling",
    # q224: crossJoin(broadcast(<1-row pooled-count scalar>)) onto the
    # per-group histogram — a scalar broadcast, not a pair generator.
    "q224_quantile_normalization",
    # q228: crossJoin(broadcast(<1-row exact-truth scalars>)) beside the
    # 1-row sketch estimates — a scalar broadcast, not a pair generator.
    "q228_sketch_set_algebra",
    # q231: crossJoin(broadcast(<1-row mixture-cap scalar>)) onto the
    # per-lang funnel summary (q193 pattern) — not a pair generator.
    "q231_curation_funnel",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from kp_data_pipelines_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("plan-audit")
    qs = entry_mod.queries()

    n_bad = 0
    for name, fn in sorted(qs.items()):
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # noqa: BLE001
            print(f"ERROR {name}: {ex}")
            n_bad += 1
            continue
        flags = []
        if "CartesianProduct" in plan:
            flags.append("CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan and name not in INTENTIONAL_BNLJ:
            flags.append("BroadcastNestedLoopJoin")
        if flags:
            print(f"FLAG {name}: {', '.join(flags)}")
            for line in plan.splitlines():
                if "Scan" in line or "Join" in line:
                    print(f"    {line.strip()[:160]}")
            n_bad += 1
    print(f"\n{len(qs)} queries audited, {n_bad} flagged")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
