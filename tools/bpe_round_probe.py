"""Capture the BPE per-round ranked job's physical plan and isolated
trainer timings (the per-round job is what dominates the BPE family;
plan_capture.py only sees the final merge-table frame).

Usage:
    python tools/bpe_round_probe.py <suffix>          # plan + trainer timings
    python tools/bpe_round_probe.py <suffix> --plan-only

Writes plans/r11/bpe_ranked_round_<suffix>.txt (the ranked job's
explain("formatted") over the round-1 chunk-syms frame at sf0.1) and
prints a JSON line with min-of-3 noop timings for the trainer queries.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES_TO_TIME = [
    "q315_bpe_batched_trainer",
    "q318_bpe_tokenize_batched",
    "q319_bpe_encode_holdout",
    "q304_bpe_trainer",
    "q327_bpe_artifact_deploy",
    "q321_bpe_adaptive_trainer",
    "q325_bpe_adaptive_tokenize",
    "q331_bpe_deep_trainer",
]


def main() -> None:
    args = sys.argv[1:]
    plan_only = "--plan-only" in args
    if plan_only:
        args.remove("--plan-only")
    suffix = args[0]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from kp_data_pipelines_spark.session import get_spark, release_pinned_rdds
    from kp_data_pipelines_spark.sources.readers import read_table
    from kp_data_pipelines_spark.operators import bpe
    from kp_data_pipelines_spark.catalog import QUERIES

    spark = get_spark("bpe_round_probe")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r11",
    )

    # The ranked frame exactly as _ranked_pairs builds it (round 1,
    # chunk units — the q321/q325/q331 shape), captured without the
    # .collect() so the plan shows the full job.
    docs = read_table(spark, sf_dir, "documents")
    syms = bpe._chunk_syms(docs, "text")
    ranked_df = bpe._ranked_frame(syms, bpe.BPE_ADAPTIVE_TOPK)
    plan = ranked_df._sc._jvm.PythonSQLUtils.explainString(
        ranked_df._jdf.queryExecution(), "formatted"
    )
    with open(
        os.path.join(out_dir, f"bpe_ranked_round_{suffix}.txt"), "w"
    ) as f:
        f.write(plan)
    release_pinned_rdds(spark, blocking=True)
    if plan_only:
        print(json.dumps({"suffix": suffix, "plan": "written"}))
        return

    # Warm the session the way bench.py does.
    next(iter(QUERIES.values()))(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    release_pinned_rdds(spark, blocking=True)

    timings = {}
    for name in QUERIES_TO_TIME:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"{name} [{suffix}]")
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            release_pinned_rdds(spark, blocking=True)
        spark.sparkContext.setJobDescription(None)
        timings[name] = round(best, 4)
    print(json.dumps({"suffix": suffix, "timings": timings}))


if __name__ == "__main__":
    main()
