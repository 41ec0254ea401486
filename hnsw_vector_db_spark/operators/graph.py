"""Graph analytics over relational edge lists: PageRank.

The reference has exactly one graph — the HNSW index — and never runs
whole-graph analytics over it (its only traversal is per-query beam
search, `core/hnsw/graph.py:88-125`). A batch engine over the same data
wants the complementary capability: global importance scores over an
edge list derived from relational tables (who-bought-from-whom,
citation/link graphs for corpus quality weighting). Connected
components (the other classic) lives in dedup.py where it serves
near-dup collapse; PageRank lives here.

Scale shape: the edge list is the only large table. Each iteration is
one join (ranks to edges on src — both sides hash-partitioned on the
same key, so the partitioning is REUSED across iterations rather than
re-shuffled) plus one keyed aggregation on dst. Degrees are computed
once. Fixed iteration count keeps the lineage bounded; a production
loop checkpoints every ~5 iterations to cut lineage and re-uses the
AQE-coalesced partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bipartite_edges(
    orders: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """Customer<->supplier interaction graph from the order history.

    Nodes are namespaced into one integer id space (customer c ->
    node 2c, supplier s -> node 2s+1) so the two key domains can't
    collide. Each distinct (customer, supplier) trading pair
    contributes BOTH directed edges — PageRank on the undirected
    interaction graph — and the distinct collapses the per-lineitem
    multiplicity before any iteration sees it.
    """
    pairs = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("cust_node"),
            (F.col("l_suppkey") * 2 + 1).alias("supp_node"),
        )
        .distinct()
    )
    fwd = pairs.select(
        F.col("cust_node").alias("src"), F.col("supp_node").alias("dst")
    )
    rev = pairs.select(
        F.col("supp_node").alias("src"), F.col("cust_node").alias("dst")
    )
    return fwd.unionByName(rev)


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    materialize: bool = True,
) -> DataFrame:
    """PageRank with a fixed iteration count over a directed edge list
    (src, dst). Returns (node, rank) for every node that has at least
    one edge.

    rank_0 = 1/N; rank_{i+1}(v) = (1-d)/N + d * sum over in-edges of
    rank_i(u)/outdeg(u). Dangling nodes (no out-edges) leak their mass
    — the textbook simplified form; on a symmetrized edge list (both
    directions present, as bipartite_edges emits) there are none.

    The node set and out-degrees are one aggregation each, computed
    once. Each iteration joins ranks to edges on src and re-aggregates
    on dst — hash partitioning on the join key carries over, so
    per-iteration cost is one shuffle of (dst, contribution) pairs.
    N is derived from the node aggregation (a one-row broadcast, like
    tfidf's n_docs), not a driver count().
    """
    if iterations < 0:
        raise ValueError(f"iterations must be >= 0, got {iterations}")
    if materialize:
        # nodes, degrees, and every iteration's join all consume edges;
        # without persisting, the (possibly join+distinct) edge
        # derivation re-executes 2+iterations times inside ONE deep plan
        # — at 64x data that recomputation blew past executor memory.
        # Persist makes the docstring's "computed once" true; at cluster
        # scale this is checkpoint-to-storage instead. Lifecycle: the
        # cache lives while the returned ranks plan is referenced;
        # Spark's ContextCleaner reclaims it after the caller drops the
        # result (back-to-back large runs in ONE session see transient
        # memory pressure until then — measured and documented in
        # BASELINE.md's 64x table). Costs ~2x at toy scale vs the lazy
        # form; at 64x the lazy form re-derives the join+distinct per
        # consumer and OOMs, so materialize defaults True.
        from pyspark.storagelevel import StorageLevel

        edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
    nodes = edges.select(F.col("src").alias("node")).union(
        edges.select(F.col("dst").alias("node"))
    ).distinct()
    n = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))

    ranks = nodes.join(F.broadcast(n)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    for _ in range(iterations):
        contrib = (
            edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("contrib"))
            .withColumnRenamed("dst", "node")
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .join(F.broadcast(n))
            .select(
                "node",
                (
                    (1.0 - damping) / F.col("n")
                    + damping * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks
