"""Unpartitioned-window audit over the whole query catalog.

A ``Window`` with an EMPTY partition spec funnels every input row through
ONE task — fine over a dimension-bounded histogram (the q188
histogram-first rule), a genuine scale-killer over a fact table. This
tool walks every query's physical plan, finds each WindowExec with an
empty partitionSpec, and classifies it:

- AGG-BOUNDED: every path from the window's input down to a scan passes
  through an aggregate or a limit — the window runs over a grouped
  summary whose row count is the key domain, not the data volume.
  Auto-accepted (this is the histogram-first shape).
- DECLARED: a true global window over raw rows, listed in
  ``DECLARED_GLOBAL_WINDOWS`` with a justification and (where the input
  can grow) a pointer to its scale twin (the two-phase prefix_sum path).
- FLAG: anything else — an undeclared global window over an unbounded
  input. Exit code 1.

Usage: python tools/window_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.plan_audit import _BOUNDED_LIMIT_NODES, _children, _iter_nodes

# name -> justification. Keep SHORT and honest; every entry is a real
# global single-task sort at scale unless the justification says why not.
DECLARED_GLOBAL_WINDOWS = {
    # The reference's global row-id generation (P6/W3, Study Startup
    # Legacy Data merge.ipynb:41,1187) over the customer DIMENSION.
    # Scale twin: operators/prefix.py prefix_sum / assign_row_ids
    # (two-phase distributed prefix sum), equivalence-pinned by
    # tests/test_operators.py.
    "q29_global_rownum": "P6 global row-id over a dim; scale twin prefix.py",
    # NTILE decile profile over raw documents; q158_decile_stats_scale
    # is the distributed prefix-sum + tile-arithmetic form,
    # oracle-checked against this same twin.
    "q64_decile_stats": "NTILE over raw docs; scale twin q158",
    # Moving average over a LITERAL date spine (sequence('1995-01-01',
    # '2001-12-31')) left-joined to the daily aggregate: <= 2557 rows by
    # construction, data-independent — bounded, but by a generator the
    # plan walker can't size.
    "q108_moving_revenue": "literal date spine, <=2557 rows by construction",
    # Corpus-index rank over doc_id; the docstring pins the distributed
    # prefix_sum (q153 pattern) as the scale path, the ROW_NUMBER twin
    # is the semantic contract.
    "q219_negative_sampling": "doc index rank; prefix_sum scale path (q153)",
}


def _window_nodes(root):
    for n in _iter_nodes(root):
        if n.getClass().getSimpleName() in (
            "WindowExec",
            "WindowGroupLimitExec",
        ):
            yield n


def _partition_spec_empty(node) -> bool:
    try:
        return node.partitionSpec().isEmpty()
    except Exception:  # noqa: BLE001
        return False


def _agg_bounded(node) -> bool:
    """True when every path from ``node`` down to a leaf crosses an
    aggregate or a bounded limit — i.e. the subtree's row count is a key
    domain (histogram), not the raw data volume."""
    cls = node.getClass().getSimpleName()
    if "Aggregate" in cls:
        return True
    if cls in _BOUNDED_LIMIT_NODES:
        return True
    kids = _children(node)
    if not kids:
        return False
    return all(_agg_bounded(k) for k in kids)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from kp_data_pipelines_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("window-audit")
    qs = entry_mod.queries()

    n_flag = n_bounded = n_declared = 0
    flagged = []
    for name, fn in sorted(qs.items()):
        try:
            root = fn(spark, sf_dir)._jdf.queryExecution().executedPlan()
        except Exception as ex:  # noqa: BLE001
            print(f"ERROR {name}: {ex}")
            n_flag += 1
            continue
        global_windows = [
            w for w in _window_nodes(root) if _partition_spec_empty(w)
        ]
        if not global_windows:
            continue
        unbounded = [
            w for w in global_windows
            if not all(_agg_bounded(k) for k in _children(w))
        ]
        if not unbounded:
            n_bounded += 1
            print(f"OK   {name}: {len(global_windows)} global window(s), all agg-bounded")
        elif name in DECLARED_GLOBAL_WINDOWS:
            n_declared += 1
            print(
                f"DECL {name}: {len(unbounded)} global window(s) over raw "
                f"rows — {DECLARED_GLOBAL_WINDOWS[name]}"
            )
        else:
            n_flag += 1
            flagged.append(name)
            print(f"FLAG {name}: undeclared global window over unbounded input")
    print(
        f"\n{len(qs)} queries audited: {n_bounded} agg-bounded, "
        f"{n_declared} declared, {n_flag} flagged"
    )
    if flagged:
        print("flagged: " + ", ".join(flagged))
    return 1 if n_flag else 0


if __name__ == "__main__":
    raise SystemExit(main())
