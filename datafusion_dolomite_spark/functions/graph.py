"""Iterative graph algorithms on DataFrames.

The near-dup operators emit PAIRS (edges); a training-data pipeline then
needs duplicate CLUSTERS — connected components — to pick one canonical
doc per group.  No GraphFrames dependency: min-label propagation with
POINTER JUMPING (label(x) <- label(label(x)) each round), so a chain of
length L converges in O(log L) joins instead of O(L).

Scale shape: every iteration is two shuffled equi-joins + an aggregate on
(node) — all spark-native, state bounded by |V| + |E|; intermediate
each round's labels are localCheckpoint-ed so lineage (and Catalyst
re-analysis time) stays CONSTANT per iteration instead of tripling.  The reference has no iterative surface at all.
"""

from __future__ import annotations

__all__ = ["connected_components", "pagerank"]


def connected_components(edges, src: str, dst: str, max_iter: int = 25):
    """Minimum-label connected components over an undirected edge list.

    Returns (node bigint, component bigint) — component = the smallest
    node id reachable.  Deterministic (unique fixpoint).
    """
    from pyspark.sql import functions as F

    # the edge list feeds every iteration — materialize it ONCE (without
    # this the whole upstream plan re-executes 2x per round)
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .cache()
    )
    sym.count()
    nodes = sym.select(F.col("a").alias("node")).distinct()
    labels = nodes.withColumn("label", F.col("node")).cache()
    # min-label propagation strictly decreases sum(label) whenever any
    # label changes — ONE cheap agg per round replaces a join+filter
    # convergence check (decimal(38,0) so the sum can't overflow bigint
    # at billion-node scale)
    _label_sum = F.sum(F.col("label").cast("decimal(38,0)"))
    prev_sum = labels.agg(_label_sum).first()[0]

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
        # localCheckpoint TRUNCATES LINEAGE — without it the logical plan
        # triples every round and Catalyst re-analysis dominates (the
        # classic iterative-DataFrame trap).  LAZY (eager=False): the
        # convergence agg below is the round's ONE driver action, and it
        # materializes the checkpoint as a side effect — two jobs per
        # round would double the fixed scheduling cost.  On a cluster
        # swap for checkpoint() on reliable storage.
        jumped = (
            prop.join(l2, prop.label == l2.pnode, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("plabel"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
        new_sum = jumped.agg(_label_sum).first()[0]
        labels.unpersist()
        labels = jumped
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    sym.unpersist()
    return labels.select(F.col("node"), F.col("label").alias("component"))


#: fixed-point scale for exact distributed PageRank: ranks live as
#: BIGINTs of rank·1e9, contributions use integer `div` (floor), so the
#: iteration is order-independent and replays BIT-IDENTICALLY in any
#: engine — a float PageRank would drift with partition/sum order and
#: could never hash-match an oracle.
_PR_SCALE = 1_000_000_000


def pagerank(edges, src: str, dst: str, iters: int = 3, damping_pct: int = 85):
    """Deterministic quantized PageRank over a DIRECTED edge list.

    rank'(v) = (100-d)%·S/N  +  Σ_{u→v} d%·rank(u) div outdeg(u),
    all in BIGINT fixed-point (S = 1e9) with integer floor division —
    every engine computes the same ranks exactly.  Returns
    (node bigint, rank_q bigint), rank_q ≈ rank·1e9.

    Assumes no dangling nodes (callers passing an undirected graph
    symmetrize first, which guarantees outdeg ≥ 1 everywhere).

    Scale shape: per iteration ONE join of ranks against the (cached)
    out-degree-annotated edge list and one (dst) aggregate — state is
    |V| rows, traffic |E| rows, no all-pairs step; lineage is truncated
    per round with a lazy localCheckpoint exactly like
    ``connected_components`` above (the final action materializes it).
    """
    from pyspark.sql import functions as F

    d = int(damping_pct)
    # edge list + outdegree feed every iteration — materialize once
    ed = edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst")).distinct()
    od = ed.groupBy("_src").agg(F.count(F.lit(1)).alias("_od"))
    ew = ed.join(od, "_src").cache()
    ew.count()
    nodes = ed.select(F.col("_src").alias("node")).distinct().cache()
    n_nodes = nodes.count()  # one scalar — the bounded driver touch-point
    base = (100 - d) * _PR_SCALE // (100 * n_nodes)
    ranks = nodes.withColumn("_r", F.lit(_PR_SCALE // n_nodes).cast("bigint"))

    for i in range(iters):
        contrib = (
            ew.join(ranks, ew._src == ranks.node)
            .select(
                F.col("_dst").alias("node"),
                F.expr(f"({d} * _r) div (100 * _od)").alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_s"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (F.lit(base) + F.coalesce(F.col("_s"), F.lit(0)))
                .cast("bigint")
                .alias("_r"),
            )
            .localCheckpoint(eager=False)
        )
    out = ranks.select("node", F.col("_r").alias("rank_q"))
    return out
