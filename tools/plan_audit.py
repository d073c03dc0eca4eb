"""Physical-plan audit over the whole query catalog.

For every ``queries()`` entry, builds the plan at the given sf dir and
flags scale anti-patterns:

- CartesianProduct            (always a bug)
- BroadcastNestedLoopJoin     (allowed when the build side is PROVABLY
  bounded — see below — or where declared intentional)

A BNLJ is structurally safe when its broadcast (build) side is bounded by
construction: an ungrouped aggregate (<= 1 row) or a global limit(k)
reached through row-preserving nodes only. Those are the
``crossJoin(F.broadcast(<scalar agg>))`` sites the catalog uses to attach
corpus-level totals to summaries; recognizing them in the PLAN — not via a
hand-grown name allowlist — means a genuinely unbounded cartesian can
never hide behind a copy-pasted comment (round-3 verdict item 3). The
name allowlist below is reserved for true BNLJ designs whose build side
is bounded by *data knowledge* the plan can't see.

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
# semantics switch to width_bucket equi-joins as the dim grows). The
# build side is a 4-row parquet scan — bounded by data knowledge, not
# by plan structure, hence declared.
INTENTIONAL_BNLJ = {
    "q18_containment_join",
    "q135_price_tier_join",
}

# Max limit(k) accepted as a "bounded" broadcast build side.
BOUNDED_LIMIT = 1024

# Unary nodes that cannot increase the row count of their child — a
# bounded subtree stays bounded through them.
_ROW_PRESERVING = (
    "BroadcastExchange",
    "ReusedExchange",
    "Exchange",
    "ShuffleQueryStage",
    "BroadcastQueryStage",
    "AQEShuffleRead",
    "Project",
    "Filter",
    "Sort",
    "ColumnarToRow",
    "InputAdapter",
    "WholeStageCodegen",
    "Coalesce",
    "LocalLimit",
)

_BOUNDED_LIMIT_NODES = (
    "GlobalLimitExec",
    "CollectLimitExec",
    "TakeOrderedAndProjectExec",
)


def _children(node) -> list:
    """Children of a physical-plan node, descending through AQE wrappers
    (AdaptiveSparkPlan -> initialPlan, QueryStage -> plan)."""
    out = []
    try:
        cs = node.children()
        for i in range(cs.size()):
            out.append(cs.apply(i))
    except Exception:  # noqa: BLE001
        pass
    cls = node.getClass().getSimpleName()
    if cls == "AdaptiveSparkPlanExec":
        try:
            out.append(node.initialPlan())
        except Exception:  # noqa: BLE001
            pass
    elif "QueryStage" in cls:
        try:
            out.append(node.plan())
        except Exception:  # noqa: BLE001
            pass
    return out


def _iter_nodes(root):
    stack = [root]
    while stack:
        n = stack.pop()
        yield n
        stack.extend(_children(n))


def _is_bounded_subtree(node) -> bool:
    """True when the subtree provably produces a bounded number of rows:
    an ungrouped aggregate (<= 1 row) or a global limit(k <= 1024),
    reached through row-preserving unary nodes."""
    cls = node.getClass().getSimpleName()
    if "Aggregate" in cls:
        try:
            if node.groupingExpressions().isEmpty():
                return True
        except Exception:  # noqa: BLE001
            return False
        # grouped aggregate: bounded only if its input already is (a
        # regroup of a limited set) — recurse.
        kids = _children(node)
        return bool(kids) and all(_is_bounded_subtree(k) for k in kids)
    if cls in _BOUNDED_LIMIT_NODES:
        try:
            return int(node.limit()) <= BOUNDED_LIMIT
        except Exception:  # noqa: BLE001
            return False
    name = node.nodeName()
    if any(name.startswith(p) for p in _ROW_PRESERVING) or "QueryStage" in cls:
        kids = _children(node)
        return bool(kids) and all(_is_bounded_subtree(k) for k in kids)
    return False


def _unbounded_bnlj(root) -> list:
    """BroadcastNestedLoopJoin nodes whose build side is NOT provably
    bounded (these are the ones that must be declared or fixed)."""
    bad = []
    for n in _iter_nodes(root):
        if n.getClass().getSimpleName() != "BroadcastNestedLoopJoinExec":
            continue
        kids = _children(n)
        if len(kids) != 2:
            bad.append(n)
            continue
        build = kids[1] if "BuildRight" in n.buildSide().toString() else kids[0]
        if not _is_bounded_subtree(build):
            bad.append(n)
    return bad


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from kp_data_pipelines_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("plan-audit")
    qs = entry_mod.queries()

    n_bad = n_scalar_ok = 0
    for name, fn in sorted(qs.items()):
        try:
            qe = fn(spark, sf_dir)._jdf.queryExecution()
            root = qe.executedPlan()
            plan = root.toString()
        except Exception as ex:  # noqa: BLE001
            print(f"ERROR {name}: {ex}")
            n_bad += 1
            continue
        flags = []
        if "CartesianProduct" in plan:
            flags.append("CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan:
            unbounded = _unbounded_bnlj(root)
            if unbounded and name not in INTENTIONAL_BNLJ:
                flags.append(
                    f"BroadcastNestedLoopJoin ({len(unbounded)} with "
                    "unbounded build side)"
                )
            elif not unbounded:
                n_scalar_ok += 1
        if flags:
            print(f"FLAG {name}: {', '.join(flags)}")
            for line in plan.splitlines():
                if "Scan" in line or "Join" in line:
                    print(f"    {line.strip()[:160]}")
            n_bad += 1
    print(
        f"\n{len(qs)} queries audited, {n_bad} flagged "
        f"({n_scalar_ok} structurally-bounded broadcast joins accepted, "
        f"{len(INTENTIONAL_BNLJ)} declared intentional)"
    )
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
