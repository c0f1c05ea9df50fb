"""Iterative graph algorithms on DataFrames.

The near-dup operators emit PAIRS (edges); a training-data pipeline then
needs duplicate CLUSTERS — connected components — to pick one canonical
doc per group.  No GraphFrames dependency: min-label propagation with
POINTER JUMPING (label(x) <- label(label(x)) each round), so a chain of
length L converges in O(log L) joins instead of O(L).

Scale shape: every iteration is two shuffled equi-joins + an aggregate on
(node) — all spark-native, state bounded by |V| + |E|; intermediate
labels are cached and the previous iteration unpersisted so lineage
doesn't snowball.  The reference has no iterative surface at all.
"""

from __future__ import annotations

__all__ = ["connected_components"]


def connected_components(edges, src: str, dst: str, max_iter: int = 25):
    """Minimum-label connected components over an undirected edge list.

    Returns (node bigint, component bigint) — component = the smallest
    node id reachable.  Deterministic (unique fixpoint).
    """
    from pyspark.sql import functions as F

    sym = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    nodes = sym.select(F.col("a").alias("node")).distinct()
    labels = nodes.withColumn("label", F.col("node")).cache()
    labels.count()

    for _ in range(max_iter):
        neigh = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("nlabel"))
        )
        prop = (
            labels.join(neigh, labels.node == neigh.a, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("label"),
            )
        )
        # pointer jump: adopt your label's label
        l2 = prop.select(
            F.col("node").alias("pnode"), F.col("label").alias("plabel")
        )
        jumped = (
            prop.join(l2, prop.label == l2.pnode, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("plabel"), F.col("label"))
                ).alias("label"),
            )
            .cache()
        )
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = jumped
        if changed == 0:
            break
    return labels.select(F.col("node"), F.col("label").alias("component"))
