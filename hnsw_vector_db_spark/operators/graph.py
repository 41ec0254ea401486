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

        # r12 (guide §2.4): persist the edge list ALREADY hash-partitioned
        # on the iteration join key. Every iteration joins edges on src
        # and re-aggregates deg on src; caching the partitioned layout
        # means no iteration ever shuffles the edge table again — the
        # only per-iteration exchange left is the O(nodes) rank table.
        edges = edges.repartition("src").persist(StorageLevel.MEMORY_AND_DISK)
    nodes = edges.select(F.col("src").alias("node")).union(
        edges.select(F.col("dst").alias("node"))
    ).distinct()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    if materialize:
        # nodes and deg are consumed by every iteration (left join /
        # contribution join); persisting them makes "computed once"
        # true for the derived tables too, not just the edges
        from pyspark.storagelevel import StorageLevel

        nodes = nodes.persist(StorageLevel.MEMORY_AND_DISK)
        deg = deg.persist(StorageLevel.MEMORY_AND_DISK)
    n = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))

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


def co_supply_edges(lineitem: DataFrame, min_shared: int = 1) -> DataFrame:
    """Supplier co-supply projection graph: an undirected edge between
    two suppliers who both shipped at least ``min_shared`` distinct
    parts in common (the one-mode projection of the part-supplier
    bipartite graph, with the standard co-occurrence threshold). The
    distinct (part, supplier) collapse happens FIRST, so per-part
    fan-out is bounded by suppliers-per-part (single digits in an
    orders stream), never by lineitem multiplicity.

    min_shared matters at scale: with 1 the projection of a random
    bipartite graph is near-dense (measured: avg degree ~220 on the
    sf0.1 supplier graph, which makes ANY triangle algorithm pay for
    ~40M wedges), while >= 2 keeps only repeat trading pairs — the
    graph practitioners actually analyze, and orders of magnitude
    sparser. Output canonical (u, v), u < v."""
    if min_shared < 1:
        raise ValueError(f"min_shared must be >= 1, got {min_shared}")
    ps = lineitem.select("l_partkey", "l_suppkey").distinct()
    a, b = ps.alias("a"), ps.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_partkey") == F.col("b.l_partkey"))
        & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
    ).select(F.col("a.l_suppkey").alias("u"), F.col("b.l_suppkey").alias("v"))
    return (
        pairs.groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("_shared"))
        .filter(F.col("_shared") >= min_shared)
        .select("u", "v")
    )


def triangle_count(
    edges: DataFrame, u_col: str = "u", v_col: str = "v", top_k: int | None = None
) -> DataFrame:
    """Per-node triangle counts via degree orientation (the classic
    MapReduce triangle algorithm, Suri & Vassilvitskii WWW'11): orient
    every undirected edge from its (degree, id)-smaller endpoint to the
    larger, enumerate wedges as pairs of out-edges at a common source,
    and close each wedge with one equi-join against the oriented edge
    list. Orientation bounds every out-degree by O(sqrt(m)), so the
    wedge stage is O(m^1.5) TOTAL regardless of skew — a naive
    neighbor-join explodes quadratically on hub nodes (a celebrity node
    with 1M neighbors makes 10^12 wedges; oriented, those wedges are
    charged to the low-degree endpoints instead). That bound is the
    whole reason this is the 100 TB formulation; the DuckDB oracle uses
    the naive a<b<c triple join, which is fine at oracle scale and
    provably the same triangle set.

    Each triangle is found exactly once (its orientation-ordered
    wedge), then exploded to its 3 corners for per-node counts.
    Output (node, n_triangles), optionally top_k by (count desc, node).
    """
    e = (
        edges.select(
            F.least(F.col(u_col), F.col(v_col)).alias("a"),
            F.greatest(F.col(u_col), F.col(v_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ed = (
        e.join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "da"), "a")
        .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "db"), "b")
    )
    fwd = F.struct(F.col("da"), F.col("a")) < F.struct(F.col("db"), F.col("b"))
    oriented = ed.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(fwd, F.col("db")).otherwise(F.col("da")).alias("dst_deg"),
    )
    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    wedges = o1.join(
        o2,
        (F.col("o1.src") == F.col("o2.src"))
        & (
            F.struct(F.col("o1.dst_deg"), F.col("o1.dst"))
            < F.struct(F.col("o2.dst_deg"), F.col("o2.dst"))
        ),
    ).select(
        F.col("o1.src").alias("x"),
        F.col("o1.dst").alias("y"),
        F.col("o2.dst").alias("z"),
    )
    closed = wedges.join(
        oriented.select(F.col("src").alias("y"), F.col("dst").alias("z")),
        ["y", "z"],
        "left_semi",
    )
    counts = (
        closed.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    if top_k is not None:
        counts = counts.orderBy(
            F.col("n_triangles").desc(), F.col("node").asc()
        ).limit(top_k)
    return counts


def label_propagation(
    edges: DataFrame,
    iterations: int = 3,
    u_col: str = "u",
    v_col: str = "v",
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007,
    arXiv:0709.2938 — the near-linear community-detection baseline)
    over an undirected edge list, made fully deterministic: every node
    starts labeled with its own id; each iteration every node adopts
    the most frequent label among its neighbors, ties broken by
    smallest label; a FIXED iteration count (the pagerank discipline)
    bounds lineage and makes the result an exact function of the graph
    — which is what lets the DuckDB oracle replay every iteration.

    Scale shape per iteration: one join of the (node, label) table to
    the symmetrized edge list on the node key + one (node, label)
    count aggregation + one per-node argmax (WindowGroupLimit top-1).
    The edge list is the only large table and its join key partitioning
    is reused across iterations. Output (node, label)."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    from pyspark.sql.window import Window as W

    fwd = edges.select(F.col(u_col).alias("src"), F.col(v_col).alias("dst"))
    rev = edges.select(F.col(v_col).alias("src"), F.col(u_col).alias("dst"))
    sym = fwd.unionByName(rev)
    labels = sym.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    w = W.partitionBy("node").orderBy(F.col("n").desc(), F.col("label").asc())
    for _ in range(iterations):
        labels = (
            sym.join(labels, sym["src"] == labels["node"])
            .select(F.col("dst").alias("node"), "label")
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "label")
        )
    return labels
