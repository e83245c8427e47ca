"""Distributed connected components (min-label propagation).

Used for near-duplicate CLUSTERING: LSH/simhash produce pairwise
edges; the duplicate groups are the connected components (a pair list
is not a dedup decision — A~B, B~C must collapse to one cluster even
when A~C was never emitted as a pair). No reference counterpart
(skyway has no joins — SURVEY.md §2.4).

Algorithm: iterative min-label propagation — each node adopts the
minimum label in its closed neighborhood until fixpoint. Per
iteration: one equi-join of the (symmetrized) edge list against the
label table + one min-aggregate — all shuffles are keyed by node id,
so AQE handles hub skew; lineage is truncated with localCheckpoint
each round so plans don't grow with iteration count. Converges in
O(max component diameter) rounds — for near-dup clusters (small,
dense) that is single digits; a ``max_iter`` guard raises rather than
silently returning partial labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    component = min node id reachable (deterministic canonical id)."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
    sym = e.unionByName(
        e.select(F.col("t").alias("s"), F.col("s").alias("t"))
    ).distinct()
    sym = sym.localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("s").alias("n"))
        .distinct()
        .withColumn("label", F.col("n"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(
                labels.select(F.col("n").alias("t"), F.col("label").alias("tl")), "t"
            )
            .groupBy("s")
            .agg(F.min("tl").alias("nbl"))
        )
        new_labels = (
            labels.join(nbr_min.select(F.col("s").alias("n"), "nbl"), "n", "left")
            .select(
                "n",
                F.least(F.col("label"), F.coalesce(F.col("nbl"), F.col("label"))).alias(
                    "label"
                ),
                (F.col("nbl") < F.col("label")).alias("__chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.where(F.col("__chg")).limit(1).count()
        labels = new_labels.drop("__chg")
        if changed == 0:
            return labels.select(F.col("n").alias("node"), F.col("label").alias("component"))
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
