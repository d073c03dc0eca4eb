"""End-to-end COMPOSED pipeline probe: run the q250 training-data-build
composition (Gopher repetition gate -> exact dedup -> stratified split
-> packing forecast) over a ~1M-doc executor-generated corpus and record
wall time, STAGE COUNT, and SHUFFLE BYTES — the cross-stage numbers
per-kernel probes (tools/stress.py) cannot see (checkpoint placement,
AQE coalescing, partial-agg effectiveness).

The pipeline body is q250's verbatim composition (catalog.py) pointed at
the synthetic source instead of read_table — same shuffle shapes, same
flags/reps/ledger chain.

Usage: python tools/e2e_stress.py [n_partitions rows_per_partition shuffle_partitions advisory_size]
Prints the ledger result row count + one JSON line with wall/stages/
shuffle totals pulled from the live UI's REST API.

``shuffle_partitions`` (default: the session's 32) is the probe's main
scale knob: the token explode fans ~300 rows/doc, so at 1M docs the
per-doc window/agg sort runs over ~300M rows — at 32 partitions each
sorter holds ~10M rows and SPILLS (measured 26 GB); sizing partitions
so sorts fit memory is exactly the spark.sql.shuffle.partitions /
maxPartitionBytes discipline SCALE.md prescribes per-operator, now
measured end-to-end.
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, ".")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from kp_data_pipelines_spark.operators.similarity import (  # noqa: E402
    _MERSENNE,
    _hash_params,
)
from kp_data_pipelines_spark.session import get_spark  # noqa: E402
from kp_data_pipelines_spark.sources.corpus_source import (  # noqa: E402
    SyntheticCorpusDataSource,
)


def _rest_totals(spark) -> dict:
    """Stage count + shuffle/spill byte totals from the live UI REST API."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app}/stages?status=complete"
    ) as r:
        stages = json.load(r)
    return {
        "n_stages": len(stages),
        "shuffle_write_bytes": sum(
            s.get("shuffleWriteBytes", 0) for s in stages
        ),
        "shuffle_read_bytes": sum(
            s.get("shuffleReadBytes", 0) for s in stages
        ),
        "spill_bytes": sum(
            s.get("memoryBytesSpilled", 0) + s.get("diskBytesSpilled", 0)
            for s in stages
        ),
        "input_bytes": sum(s.get("inputBytes", 0) for s in stages),
    }


def main() -> int:
    parts = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 32_000
    spark = get_spark("e2e-stress")
    spark.sparkContext.setLogLevel("ERROR")
    if len(sys.argv) > 3:
        spark.conf.set("spark.sql.shuffle.partitions", sys.argv[3])
    if len(sys.argv) > 4:
        # the AQE coalescing target — the lever §22 identifies as the
        # one that actually binds for explode-heavy stages (partition
        # count alone saturates because AQE re-coalesces toward this)
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", sys.argv[4]
        )
    spark.dataSource.register(SyntheticCorpusDataSource)
    docs = (
        spark.read.format("synthetic_corpus")
        .option("partitions", parts)
        .option("rows_per_partition", rows)
        .load()
    )

    # ---- q250's composition, verbatim shapes -------------------------
    budget = 4096
    (a, b) = _hash_params(1, 67)[0]
    bucket = (
        (F.lit(a) * F.pmod(F.col("doc_id"), F.lit(_MERSENNE)) + F.lit(b))
        % _MERSENNE
    ) % 10
    d = docs.select(
        "doc_id",
        "lang",
        "text",
        F.when(bucket < 8, "train")
        .when(bucket == 8, "val")
        .otherwise("test")
        .alias("split"),
    )
    toks = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    pt = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.count_distinct("tok").cast("bigint").alias("n_distinct"),
    )
    wlead = Window.partitionBy("doc_id").orderBy("pos")
    bs = (
        toks.withColumn("nxt", F.lead("tok").over(wlead))
        .filter(F.col("nxt").isNotNull())
        .groupBy("doc_id", F.concat_ws(" ", "tok", "nxt").alias("bgr"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.max("c").cast("bigint").alias("top_bg"),
            F.sum("c").cast("bigint").alias("n_bg"),
        )
    )
    z = F.lit(0).cast("bigint")
    flags = (
        d.join(pt, "doc_id")
        .join(bs, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            "split",
            "n_tokens",
            F.sha2(F.col("text"), 256).alias("f"),
            F.when(
                (
                    (F.col("n_tokens") - F.col("n_distinct")) * 2
                    > F.col("n_tokens")
                )
                | (F.coalesce("top_bg", z) * 5 > F.coalesce("n_bg", z)),
                0,
            )
            .otherwise(1)
            .alias("quality_pass"),
        )
    )
    reps = (
        flags.filter(F.col("quality_pass") == 1)
        .groupBy("f")
        .agg(F.min("doc_id").cast("bigint").alias("keeper"))
    )
    ledger = flags.join(reps, "f", "left").select(
        "lang",
        "split",
        "n_tokens",
        "quality_pass",
        F.when(
            (F.col("quality_pass") == 1)
            & (F.col("doc_id") != F.col("keeper")),
            1,
        )
        .otherwise(0)
        .alias("is_dup"),
    )
    kept_toks = F.sum(
        F.col("quality_pass") * (1 - F.col("is_dup")) * F.col("n_tokens")
    ).cast("bigint")
    n_bins = F.expr(f"(kept_tokens + {budget} - 1) div {budget}")
    out = (
        ledger.groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("candidates"),
            F.sum(1 - F.col("quality_pass")).cast("bigint").alias(
                "quality_drops"
            ),
            F.sum("is_dup").cast("bigint").alias("dup_drops"),
            F.sum(F.col("quality_pass") * (1 - F.col("is_dup")))
            .cast("bigint")
            .alias("kept_docs"),
            kept_toks.alias("kept_tokens"),
        )
        .withColumn("n_bins", n_bins.cast("bigint"))
        .withColumn(
            "pad_tokens",
            (F.col("n_bins") * budget - F.col("kept_tokens")).cast(
                "bigint"
            ),
        )
        .orderBy("lang", "split")
    )

    t0 = time.time()
    out.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    # REST totals FIRST: any further action re-executes the uncached
    # pipeline and would double every stage/shuffle/spill figure (the
    # round-11 first-cut bug — its recorded bytes were ~2x reality)
    stats = _rest_totals(spark)
    n_cells = out.count()  # re-executes, but only the ledger row count
    print(f"ledger cells: {n_cells}, wall {wall:.1f}s")
    print(
        json.dumps(
            {
                "metric": "e2e_training_build",
                "n_docs": parts * rows,
                "wall_sec": round(wall, 1),
                "docs_per_sec": round(parts * rows / wall),
                **stats,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
