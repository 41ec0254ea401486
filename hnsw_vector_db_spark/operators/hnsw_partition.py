"""Partition-local HNSW: the reference's graph index, Spark-distributed.

The reference builds ONE global in-memory HNSW under a lock
(`core/hnsw/graph.py:66-70`) — bounded by one node's RAM (hard cap
1,000,000, `graph.py:54`). The Spark-native form shards the corpus into
cells (IVF/KMeans — the coarse analog of the reference's upper layers),
builds an independent small-world graph *per cell* inside
``applyInPandas`` workers, and routes each query to its nprobe nearest
cells. Per-cell indexes are the unbounded-scale path: 100 TB = many cells,
each cell a few hundred MB that fits one executor's memory; build is
embarrassingly parallel; a cell rebuild (after deletes, `graph.py:191-207`'s
stranded-edge problem) touches one cell, not the corpus.

``LocalHNSW`` is an original implementation of the published HNSW
algorithm (Malkov & Yashunin, arXiv:1603.09320): geometric level
assignment, greedy descent with ef=1 above the base layer, beam search at
the base layer. It differs deliberately from the reference implementation:
distances are evaluated as vectorized numpy batches over a neighbor
frontier (not per-node scalar calls), vectors live in one contiguous
matrix, and search state uses flat numpy visited masks.
"""

from __future__ import annotations

import heapq

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class LocalHNSW:
    """In-memory HNSW over a dense matrix; one instance per Spark cell."""

    def __init__(
        self,
        m: int = 8,
        ef_construction: int = 64,
        metric: str = "cosine",
        seed: int = 0,
    ) -> None:
        self.m = m
        self.m0 = 2 * m
        self.efc = ef_construction
        self.metric = metric
        self.rng = np.random.RandomState(seed)
        self.ml = 1.0 / np.log(m)
        self.X: np.ndarray | None = None
        self.levels: np.ndarray | None = None
        # adjacency: level -> {node -> list of neighbors}
        self.adj: list[dict[int, list[int]]] = []
        self.entry: int = -1

    # -- distance: batch row-block vs one query ---------------------------
    def _dist(self, q: np.ndarray, idx: np.ndarray) -> np.ndarray:
        block = self.X[idx]
        if self.metric == "cosine":
            # X rows pre-normalized at build; q normalized at query time
            return 1.0 - block @ q
        if self.metric == "dot_product":
            return -(block @ q)
        diff = block - q
        if self.metric == "manhattan":
            return np.abs(diff).sum(axis=1)
        return np.sqrt((diff * diff).sum(axis=1))  # euclidean

    def _search_level(
        self, q: np.ndarray, entries: list[int], ef: int, level: int
    ) -> list[tuple[float, int]]:
        """Beam search on one level; returns up to ef (dist, node) pairs."""
        visited = set(entries)
        dists = self._dist(q, np.array(entries))
        frontier = [(d, n) for d, n in zip(dists, entries)]
        heapq.heapify(frontier)
        # keep the ef SMALLEST distances = the ef LARGEST negated keys
        # (nsmallest here would seed the beam with the worst candidates —
        # latent only, since callers pass <= ef entry points, but wrong)
        best: list[tuple[float, int]] = heapq.nlargest(
            ef, ((-d, n) for d, n in frontier)
        )
        heapq.heapify(best)
        graph = self.adj[level]
        while frontier:
            d, node = heapq.heappop(frontier)
            if best and d > -best[0][0] and len(best) >= ef:
                break
            fresh = [x for x in graph.get(node, ()) if x not in visited]
            if not fresh:
                continue
            visited.update(fresh)
            fd = self._dist(q, np.array(fresh))
            for dd, nn in zip(fd, fresh):
                if len(best) < ef or dd < -best[0][0]:
                    heapq.heappush(best, (-dd, nn))
                    if len(best) > ef:
                        heapq.heappop(best)
                    heapq.heappush(frontier, (dd, nn))
        return sorted((-nd, n) for nd, n in best)

    def build(self, X: np.ndarray) -> None:
        """Sequential insert of all rows (per-cell => parallel across cells)."""
        X = np.ascontiguousarray(X, dtype=np.float64)
        if self.metric == "cosine":
            norms = np.linalg.norm(X, axis=1, keepdims=True)
            X = X / np.where(norms == 0, 1.0, norms)
        self.X = X
        n = X.shape[0]
        self.levels = np.minimum(
            (-np.log(self.rng.uniform(1e-12, 1.0, size=n)) * self.ml).astype(int), 32
        )
        top = int(self.levels.max()) if n else 0
        self.adj = [dict() for _ in range(top + 1)]
        self.entry = 0
        for i in range(n):
            self._insert(i)

    def _select(self, cands: list[tuple[float, int]], m: int) -> list[int]:
        return [n for _, n in sorted(cands)[:m]]

    def _insert(self, i: int) -> None:
        q = self.X[i]
        li = int(self.levels[i])
        if i == 0:
            for lv in range(li + 1):
                self.adj[lv][i] = []
            self.entry = i
            return
        ep = [self.entry]
        top = int(self.levels[self.entry])
        for lv in range(top, li, -1):
            ep = [self._search_level(q, ep, 1, lv)[0][1]]
        for lv in range(min(li, top), -1, -1):
            cands = self._search_level(q, ep, self.efc, lv)
            m = self.m0 if lv == 0 else self.m
            chosen = self._select(cands, m)
            self.adj[lv][i] = list(chosen)
            for c in chosen:
                lst = self.adj[lv].setdefault(c, [])
                lst.append(i)
                if len(lst) > m:
                    d = self._dist(self.X[c], np.array(lst))
                    keep = np.argsort(d)[:m]
                    self.adj[lv][c] = [lst[j] for j in keep]
            ep = [n for _, n in cands] or chosen
        for lv in range(top + 1, li + 1):
            self.adj[lv][i] = []
        if li > int(self.levels[self.entry]):
            self.entry = i

    def search(self, q: np.ndarray, k: int, ef: int = 64) -> list[tuple[int, float]]:
        """Top-k (row_index, dist); ef = max(ef, k) like the reference's
        `graph.py:180-181` knob."""
        if self.X is None or not len(self.X):
            return []
        q = np.asarray(q, dtype=np.float64)
        if self.metric == "cosine":
            nq = np.linalg.norm(q)
            if nq > 0:
                q = q / nq
        ef = max(ef, k)
        ep = [self.entry]
        for lv in range(int(self.levels[self.entry]), 0, -1):
            ep = [self._search_level(q, ep, 1, lv)[0][1]]
        res = self._search_level(q, ep, ef, 0)
        return [(n, d) for d, n in res[:k]]


def hnsw_edges(
    assigned: DataFrame,
    metric: str = "cosine",
    m: int = 8,
    ef_construction: int = 64,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
) -> DataFrame:
    """Materialize the per-cell HNSW topology as an edges DataFrame
    (cell, layer, src, dst) — the Spark-native form of the reference's
    in-memory adjacency dicts (`core/hnsw/graph.py:15,66`). Build is
    per-cell inside ``applyInPandas`` (embarrassingly parallel, one
    shuffle on cell id); deterministic for a fixed seed.
    """
    import pandas as pd

    from hnsw_vector_db_spark.session import ensure_package_shipped

    ensure_package_shipped(assigned.sparkSession)

    def per_cell(key, pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame(columns=["cell", "layer", "src", "dst"])
        X = np.vstack(pdf[vector_col].to_numpy())
        ids = pdf[id_col].to_numpy()
        index = LocalHNSW(m=m, ef_construction=ef_construction, metric=metric, seed=0)
        index.build(X)
        rows = []
        for layer, adj in enumerate(index.adj):
            for src, nbrs in adj.items():
                for dst in nbrs:
                    rows.append((int(key[0]), layer, int(ids[src]), int(ids[dst])))
        return pd.DataFrame(rows, columns=["cell", "layer", "src", "dst"])

    return (
        assigned.select("cell", id_col, vector_col)
        .groupBy("cell")
        .applyInPandas(per_cell, "cell int, layer int, src long, dst long")
    )


def hnsw_graph_stats(edges: DataFrame) -> DataFrame:
    """Per-layer graph statistics — the reference's ``get_stats``
    explode-then-group loop (`core/hnsw/graph.py:209-234`) as one
    two-level aggregation: per-(layer, node) out-degree, then per-layer
    node count / avg / max degree. Two narrow shuffles on small keys.
    Output: (layer, n_nodes, n_edges, avg_out_degree, max_out_degree).
    """
    deg = edges.groupBy("layer", "src").agg(F.count(F.lit(1)).alias("deg"))
    return (
        deg.groupBy("layer")
        .agg(
            F.countDistinct("src").alias("n_nodes"),
            F.sum("deg").alias("n_edges"),
            F.round(F.avg("deg"), 6).alias("avg_out_degree"),
            F.max("deg").alias("max_out_degree"),
        )
        .orderBy("layer")
    )


def assign_query_cells(
    queries: DataFrame,
    centroids: np.ndarray,
    nprobe: int = 4,
    metric: str = "cosine",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Route each query to its nprobe nearest cells (exploded rows).
    Centroids ride into executors as plain captured numpy (small)."""
    import pandas as pd

    from hnsw_vector_db_spark.session import ensure_package_shipped

    ensure_package_shipped(queries.sparkSession)
    C = np.asarray(centroids, dtype=np.float64)
    if metric == "cosine":
        cn = np.linalg.norm(C, axis=1, keepdims=True)
        Cn = C / np.where(cn == 0, 1.0, cn)

    def route(batches):
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                qv = np.asarray(row[query_vec_col], dtype=np.float64)
                if metric == "cosine":
                    nq = np.linalg.norm(qv)
                    sims = Cn @ (qv / nq if nq else qv)
                    cells = np.argsort(-sims)[:nprobe]
                else:
                    cells = np.argsort(np.linalg.norm(C - qv, axis=1))[:nprobe]
                for c in cells:
                    out.append((row[query_id_col], list(row[query_vec_col]), int(c)))
            yield pd.DataFrame(out, columns=[query_id_col, query_vec_col, "cell"])

    schema = f"{query_id_col} long, {query_vec_col} array<float>, cell int"
    return queries.select(query_id_col, query_vec_col).mapInPandas(route, schema)


def hnsw_topk(
    queries: DataFrame,
    assigned: DataFrame,
    centroids: np.ndarray,
    k: int = 10,
    ef: int = 64,
    nprobe: int = 4,
    metric: str = "cosine",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    id_col: str = "vec_id",
    vector_col: str = "embedding",
) -> DataFrame:
    """Distributed ANN: per-cell HNSW build+search via cogrouped
    applyInPandas, then a global per-query merge of the per-cell top-k.

    Output (query_id, vec_id, dist, rank). The cogroup shuffles each side
    once on cell id; per-cell candidate output is nprobe*k rows per query,
    so the final rank window is tiny.
    """
    import pandas as pd

    from hnsw_vector_db_spark.session import ensure_package_shipped

    ensure_package_shipped(queries.sparkSession)
    qcells = assign_query_cells(
        queries, centroids, nprobe, metric, query_id_col, query_vec_col
    )

    def per_cell(vec_pdf: pd.DataFrame, q_pdf: pd.DataFrame) -> pd.DataFrame:
        if vec_pdf.empty or q_pdf.empty:
            return pd.DataFrame(columns=[query_id_col, id_col, "dist"])
        X = np.vstack(vec_pdf[vector_col].to_numpy())
        ids = vec_pdf[id_col].to_numpy()
        index = LocalHNSW(metric=metric, seed=0)
        index.build(X)
        rows = []
        for _, qrow in q_pdf.iterrows():
            for local, dist in index.search(
                np.asarray(qrow[query_vec_col], dtype=np.float64), k, ef
            ):
                rows.append((qrow[query_id_col], int(ids[local]), float(dist)))
        return pd.DataFrame(rows, columns=[query_id_col, id_col, "dist"])

    out_schema = f"{query_id_col} long, {id_col} long, dist double"
    candidates = (
        assigned.select("cell", id_col, vector_col)
        .groupBy("cell")
        .cogroup(qcells.groupBy("cell"))
        .applyInPandas(lambda vk, qk: per_cell(vk, qk), out_schema)
    )
    from pyspark.sql import Window

    w = Window.partitionBy(query_id_col).orderBy(F.col("dist").asc(), F.col(id_col).asc())
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, F.round("dist", 6).alias("dist"), "rank")
    )
