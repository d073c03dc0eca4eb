"""Iterative graph operators for dedup clustering.

Near-dup pair lists (MinHash/SimHash/embedding candidates) only become a
deduplication POLICY once transitively closed: every document keeps one
canonical representative per connected component. The reference has no
graph surface (its dedup is exact `drop_duplicates`, SURVEY.md §2.8
D1-D3); this is the scale path for the fuzzy variants.

Algorithm: min-label propagation to fixpoint — each node repeatedly
adopts the smallest component id among itself and its neighbors.
Converges in O(graph diameter) rounds; near-dup graphs are overwhelmingly
tiny cliques/chains, so 3-5 rounds in practice. Each round is one
equi-join + one groupBy (two shuffles) on the edge list — no driver-side
data beyond the convergence counter. Lineage is truncated every round
with ``localCheckpoint`` so plan size stays O(1) across iterations.

For adversarial long-chain graphs at 100 TB, swap the body for the
alternating large-star/small-star rounds of Kiveris et al., "Connected
Components in MapReduce and Beyond" (SOCC'14) — same join/agg primitive,
fewer rounds on high-diameter graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Return ``(node, component)`` for every node in ``edges``, where
    ``component`` is the minimum node id reachable via undirected edges.

    ``edges`` may be directed / contain duplicates; it is symmetrized and
    deduplicated first. Nodes must be orderable (use numeric/string ids).
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        e.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            e.join(labels, e.b == labels.node)
            .select(F.col("a").alias("node"), "component")
            .union(labels)
            .groupBy("node")
            .agg(F.min("component").alias("new_component"))
        )
        updated = (
            labels.join(neighbor_min, "node")
            .select(
                "node",
                F.least("component", "new_component").alias("component"),
                (F.col("new_component") < F.col("component")).alias("_changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = updated.filter(F.col("_changed")).count()
        labels = updated.drop("_changed")
        if changed == 0:
            break
    return labels
