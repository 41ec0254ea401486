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

Connectivity guarantee (the reference's documented stranded-edge defect,
`core/hnsw/graph.py:158-168` re-prune and `:191-207` delete, does NOT
recur here): every inserted node designates its nearest layer-0 neighbor
at insert time as its *parent*, and the bidirectional parent edge pair is
exempt from degree-cap trimming (a provable-connectivity form of the
paper's keepPrunedConnections). The protected edges form a bidirectional
spanning tree over insertion order, so the layer-0 digraph stays strongly
connected from ANY entry point — with ef >= n the beam search therefore
visits every node and top-1 is exact. Average degree overhead is +1 edge
per node, and protected FAN-IN is capped at m per node (a child whose m0
nearest candidates all sit at the cap falls back to its nearest anyway —
connectivity over economy), so worst-case layer-0 out-degree is bounded
by 2M (unprotected) + M + 1 (protected) outside that pathological
fallback; the cap still bounds the unprotected neighbors exactly.
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
        if m < 2:
            # m=1 degenerates ml to 1/log(1) (div-by-zero) and a 1-regular
            # graph cannot hold the small-world invariants.
            raise ValueError(f"m must be >= 2, got {m}")
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
        # layer-0 parent edges (unordered (lo, hi) pairs) exempt from
        # trimming — the bidirectional spanning tree that guarantees
        # strong connectivity at the base layer (module docstring).
        self.protected0: set[tuple[int, int]] = set()
        # protected fan-in per node (children that picked it as parent):
        # capped at m so a hub's worst-case layer-0 degree stays bounded
        # (<= m0 unprotected + 1 own-parent + m protected children); a
        # child whose nearest candidates are ALL at the cap still gets a
        # parent (connectivity beats the bound in that pathological
        # case — nearest-full fallback, cap then exceeded by 1 per such
        # child, which needs every one of its m0 nearest hubs saturated).
        self.prot_fanin: dict[int, int] = {}

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
        self.protected0 = set()
        self.prot_fanin = {}
        for i in range(n):
            self._insert(i)

    def _select(self, cands: list[tuple[float, int]], m: int) -> list[int]:
        return [n for _, n in sorted(cands)[:m]]

    def _trim(self, c: int, lst: list[int], cap: int, lv: int) -> list[int]:
        """Trim node ``c``'s adjacency to ~cap, never dropping a protected
        layer-0 parent edge (connectivity invariant, module docstring).
        Unprotected neighbors are kept nearest-first."""
        if lv == 0 and self.protected0:
            prot = [x for x in lst if (min(c, x), max(c, x)) in self.protected0]
            free = [x for x in lst if (min(c, x), max(c, x)) not in self.protected0]
        else:
            prot, free = [], lst
        room = max(cap - len(prot), 0)
        if len(free) > room:
            d = self._dist(self.X[c], np.array(free))
            keep = np.argsort(d, kind="stable")[:room]
            free = [free[j] for j in keep]
        return prot + free

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
            if lv == 0:
                # nearest neighbor at insert time (with protected fan-in
                # below the cap) becomes i's parent; the bidirectional
                # pair is never trimmed (spanning tree). Fallback to the
                # nearest regardless when every candidate is saturated —
                # connectivity is the invariant, the cap the economy.
                parent = next(
                    (c for c in chosen if self.prot_fanin.get(c, 0) < self.m),
                    chosen[0],
                )
                self.protected0.add((min(i, parent), max(i, parent)))
                self.prot_fanin[parent] = self.prot_fanin.get(parent, 0) + 1
            for c in chosen:
                lst = self.adj[lv].setdefault(c, [])
                lst.append(i)
                if len(lst) > m:
                    self.adj[lv][c] = self._trim(c, lst, m, lv)
            ep = [n for _, n in cands] or chosen
        for lv in range(top + 1, li + 1):
            self.adj[lv][i] = []
        if li > int(self.levels[self.entry]):
            self.entry = i

    def insert_batch(self, X_new: np.ndarray, seed: int | None = None) -> None:
        """Incremental insert — the reference's online ``insert`` path
        (`core/hnsw/graph.py:127-173`) without a rebuild: append rows,
        draw their levels from a seed derived from the CURRENT size (so
        the result is a pure function of (existing state, batch), not of
        rng history), extend the layer list if the new max level exceeds
        the old top, then run the standard `_insert` per new row."""
        X_new = np.ascontiguousarray(X_new, dtype=np.float64)
        if self.metric == "cosine":
            norms = np.linalg.norm(X_new, axis=1, keepdims=True)
            X_new = X_new / np.where(norms == 0, 1.0, norms)
        n0 = int(self.X.shape[0]) if self.X is not None and self.X.size else 0
        if n0 == 0:
            self.build(X_new)
            return
        rng = np.random.RandomState((seed if seed is not None else 0) + n0)
        k_new = X_new.shape[0]
        new_levels = np.minimum(
            (-np.log(rng.uniform(1e-12, 1.0, size=k_new)) * self.ml).astype(int), 32
        )
        self.X = np.vstack([self.X, X_new])
        self.levels = np.concatenate([self.levels, new_levels])
        top_needed = int(self.levels.max())
        while len(self.adj) <= top_needed:
            self.adj.append(dict())
        for i in range(n0, n0 + k_new):
            self._insert(i)

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

    # -- serialization: build once, search many ---------------------------
    def to_state(self) -> dict:
        """Flatten to plain arrays/bytes for a DataFrame row — the
        build-once/search-many split the reference gets from its snapshot
        files (`core/storage/engine.py:23-56`). Vectors are stored
        post-normalization (cosine), so a reloaded index searches
        bit-identically to the freshly built one."""
        e_layer: list[int] = []
        e_src: list[int] = []
        e_dst: list[int] = []
        e_prot: list[bool] = []
        for layer, adj in enumerate(self.adj):
            for src in sorted(adj):
                for dst in adj[src]:
                    e_layer.append(layer)
                    e_src.append(src)
                    e_dst.append(dst)
                    e_prot.append(
                        layer == 0
                        and (min(src, dst), max(src, dst)) in self.protected0
                    )
        return {
            "n": int(self.X.shape[0]),
            "dim": int(self.X.shape[1]) if self.X.size else 0,
            "metric": self.metric,
            "entry": int(self.entry),
            "levels": self.levels.astype(np.int32).tolist(),
            "vec_bytes": np.ascontiguousarray(self.X, dtype=np.float64).tobytes(),
            "e_layer": e_layer,
            "e_src": e_src,
            "e_dst": e_dst,
            "e_prot": e_prot,
        }

    @classmethod
    def from_state(
        cls,
        n: int,
        dim: int,
        metric: str,
        entry: int,
        levels,
        vec_bytes: bytes,
        e_layer,
        e_src,
        e_dst,
        e_prot=None,
    ) -> "LocalHNSW":
        """Reconstruct a searchable index from :meth:`to_state` output —
        O(edges) with numpy group-slicing, no graph CONSTRUCTION work
        (no distance evaluations, no neighbor selection). ``e_prot``
        restores the trim-exempt parent edges so incremental
        :meth:`insert_batch` on the reloaded index keeps the layer-0
        connectivity invariant."""
        idx = cls(metric=metric)
        idx.X = np.frombuffer(vec_bytes, dtype=np.float64).reshape(n, dim)
        idx.levels = np.asarray(levels, dtype=np.int64)
        idx.entry = int(entry)
        if e_prot is not None:
            pa = np.asarray(e_prot, dtype=bool)
            sp = np.asarray(e_src, dtype=np.int64)[pa]
            dp = np.asarray(e_dst, dtype=np.int64)[pa]
            idx.protected0 = {
                (int(min(s, d)), int(max(s, d))) for s, d in zip(sp, dp)
            }
            # parent of a pair is the LOWER index (parents are chosen
            # among already-inserted nodes, and insert order == row
            # order, also for insert_batch appends) — rebuild the fan-in
            # counts so incremental inserts keep honoring the cap
            for lo, _hi in idx.protected0:
                idx.prot_fanin[lo] = idx.prot_fanin.get(lo, 0) + 1
        la = np.asarray(e_layer, dtype=np.int64)
        sa = np.asarray(e_src, dtype=np.int64)
        da = np.asarray(e_dst, dtype=np.int64)
        top = int(idx.levels.max()) if n else 0
        idx.adj = [dict() for _ in range(top + 1)]
        if len(la):
            order = np.lexsort((sa, la))
            la, sa, da = la[order], sa[order], da[order]
            # group boundaries of the (layer, src) runs
            brk = np.flatnonzero((np.diff(la) != 0) | (np.diff(sa) != 0)) + 1
            starts = np.concatenate(([0], brk))
            ends = np.concatenate((brk, [len(la)]))
            for s, e in zip(starts, ends):
                idx.adj[int(la[s])][int(sa[s])] = da[s:e].tolist()
        # isolated nodes (no out-edges) still own an empty adjacency slot
        for i in range(n):
            for lv in range(int(idx.levels[i]) + 1):
                idx.adj[lv].setdefault(int(i), [])
        return idx


# One row per cell: the whole per-cell index as plain columns. Written to
# parquet this IS the persisted index artifact (build once, search many).
INDEX_SCHEMA = (
    "cell int, n int, dim int, metric string, entry int, "
    "ids array<long>, levels array<int>, vec_bytes binary, "
    "e_layer array<int>, e_src array<int>, e_dst array<int>, e_prot array<boolean>"
)


def hnsw_build(
    assigned: DataFrame,
    metric: str = "cosine",
    m: int = 8,
    ef_construction: int = 64,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
) -> DataFrame:
    """Build the per-cell HNSW graphs ONCE and materialize them as an
    index DataFrame (one row per cell, ``INDEX_SCHEMA``) — the reference's
    build-once/search-many lifecycle (`core/hnsw/graph.py:127-189` builds,
    `core/storage/engine.py:23-56` persists) in Spark-native form. Write
    the result to parquet (or ``.persist()`` it) and every subsequent
    :func:`hnsw_search` pays ZERO construction cost. Build is per-cell
    inside ``applyInPandas`` — embarrassingly parallel, one shuffle on
    cell id; deterministic for a fixed seed.
    """
    if m < 2:  # validate at the API edge, not deep inside an executor
        raise ValueError(f"m must be >= 2, got {m}")
    import pandas as pd

    from hnsw_vector_db_spark.session import ensure_package_shipped

    ensure_package_shipped(assigned.sparkSession)

    def per_cell(key, pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame(
                columns=[
                    "cell", "n", "dim", "metric", "entry", "ids", "levels",
                    "vec_bytes", "e_layer", "e_src", "e_dst", "e_prot",
                ]
            )
        X = np.vstack(pdf[vector_col].to_numpy())
        ids = pdf[id_col].to_numpy().astype(np.int64)
        index = LocalHNSW(m=m, ef_construction=ef_construction, metric=metric, seed=0)
        index.build(X)
        st = index.to_state()
        return pd.DataFrame(
            [
                {
                    "cell": int(key[0]),
                    "n": st["n"],
                    "dim": st["dim"],
                    "metric": st["metric"],
                    "entry": st["entry"],
                    "ids": ids.tolist(),
                    "levels": st["levels"],
                    "vec_bytes": st["vec_bytes"],
                    "e_layer": st["e_layer"],
                    "e_src": st["e_src"],
                    "e_dst": st["e_dst"],
                    "e_prot": st["e_prot"],
                }
            ]
        )

    return (
        assigned.select("cell", id_col, vector_col)
        .groupBy("cell")
        .applyInPandas(per_cell, INDEX_SCHEMA)
    )


def hnsw_insert(
    index: DataFrame,
    new_vectors: DataFrame,
    centroids: np.ndarray,
    metric: str = "cosine",
    m: int = 8,
    ef_construction: int = 64,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
) -> DataFrame:
    """Incremental index maintenance: merge a batch of new vectors into a
    MATERIALIZED per-cell index, touching ONLY the cells that receive new
    rows — every other index row passes through untouched (no
    deserialization, no distance evaluations, no rebuild).

    New rows are routed to cells by the existing centroids (broadcast
    argmin — no KMeans refit), then a cogroup pairs each affected cell's
    stored state with its new rows: reconstruct (O(edges) slicing), run
    the incremental `LocalHNSW.insert_batch`, re-serialize. A cell with
    new rows but no existing state is built fresh. This is the
    reference's online insert (`core/hnsw/graph.py:127-173`) — but
    batched, parallel across cells, and lock-free, where the reference
    serializes every insert under one global lock.

    Returns the new index DataFrame (same INDEX_SCHEMA); write it back to
    the index location to commit. Deterministic: level draws are seeded
    by (cell state size, batch), so re-running the same merge yields an
    identical index.
    """
    if m < 2:  # validate at the API edge, not deep inside an executor
        raise ValueError(f"m must be >= 2, got {m}")
    import pandas as pd

    from hnsw_vector_db_spark.operators.similarity import assign_to_centroids
    from hnsw_vector_db_spark.session import ensure_package_shipped

    ensure_package_shipped(index.sparkSession)

    cent_df = index.sparkSession.createDataFrame(
        [(i, [float(x) for x in centroids[i]]) for i in range(len(centroids))],
        "seed_id int, seed_vec array<double>",
    )
    routed = (
        assign_to_centroids(
            new_vectors, cent_df, metric=metric, id_col=id_col, vector_col=vector_col
        )
        .select(id_col, "cell")
        .join(new_vectors.select(id_col, vector_col), id_col)
    )

    idx_cols = [
        "cell", "n", "dim", "metric", "entry", "ids", "levels",
        "vec_bytes", "e_layer", "e_src", "e_dst", "e_prot",
    ]

    def per_cell(idx_pdf: pd.DataFrame, new_pdf: pd.DataFrame) -> pd.DataFrame:
        if new_pdf.empty:
            # untouched cell: pass the stored row through byte-identical
            # (reindex, not [], so legacy pre-e_prot rows emit null e_prot
            # instead of KeyError-ing the whole merge)
            return idx_pdf.reindex(columns=idx_cols) if not idx_pdf.empty else (
                pd.DataFrame(columns=idx_cols)
            )
        X_new = np.vstack(new_pdf[vector_col].to_numpy()).astype(np.float64)
        new_ids = new_pdf[id_col].to_numpy().astype(np.int64)
        order = np.argsort(new_ids, kind="stable")  # deterministic insert order
        X_new, new_ids = X_new[order], new_ids[order]
        if idx_pdf.empty:
            local = LocalHNSW(m=m, ef_construction=ef_construction, metric=metric, seed=0)
            local.build(X_new)
            ids = new_ids
            cell = int(new_pdf["cell"].iloc[0])
        else:
            st = idx_pdf.iloc[0]
            local = LocalHNSW.from_state(
                int(st["n"]), int(st["dim"]), st["metric"], int(st["entry"]),
                st["levels"], st["vec_bytes"], st["e_layer"], st["e_src"], st["e_dst"],
                st.get("e_prot"),  # None for legacy pre-e_prot artifacts
            )
            local.m, local.m0, local.efc = m, 2 * m, ef_construction
            # keep the level-draw geometric distribution consistent with a
            # fresh build at this m (from_state leaves the default ml)
            local.ml = 1.0 / np.log(m)
            local.insert_batch(X_new)
            ids = np.concatenate([np.asarray(st["ids"], dtype=np.int64), new_ids])
            cell = int(st["cell"])
        out = local.to_state()
        return pd.DataFrame(
            [
                {
                    "cell": cell,
                    "n": out["n"],
                    "dim": out["dim"],
                    "metric": out["metric"],
                    "entry": out["entry"],
                    "ids": ids.tolist(),
                    "levels": out["levels"],
                    "vec_bytes": out["vec_bytes"],
                    "e_layer": out["e_layer"],
                    "e_src": out["e_src"],
                    "e_dst": out["e_dst"],
                    "e_prot": out["e_prot"],
                }
            ]
        )

    return (
        index.groupBy("cell")
        .cogroup(routed.groupBy("cell"))
        .applyInPandas(lambda ik, qk: per_cell(ik, qk), INDEX_SCHEMA)
    )


def hnsw_delete(
    index: DataFrame,
    tombstones: DataFrame,
    m: int = 8,
    ef_construction: int = 64,
) -> DataFrame:
    """Compaction delete: rebuild ONLY the cells that contain tombstoned
    ids; every other index row passes through untouched.

    The tombstone set is collected driver-side (it is small by nature,
    like `table.delete_ids`' broadcast) and shipped as a plain set; the
    index itself never shuffles — one mapInPandas over the cell rows.
    Affected cells rebuild from their STORED vectors minus the deleted
    rows, so the result is a clean graph with no stranded edges — the
    reference's delete leaves dangling neighbors in every other node's
    lists (`core/hnsw/graph.py:191-207`, its documented flaw); a rebuild
    per affected cell is how Spark-scale compaction actually works
    (rewrite the files you touch, leave the rest).

    Cells whose every vector is deleted disappear from the index (their
    row is dropped); searches simply never probe them.
    """
    if m < 2:  # validate at the API edge, not deep inside an executor
        raise ValueError(f"m must be >= 2, got {m}")
    import pandas as pd

    from hnsw_vector_db_spark.session import ensure_package_shipped

    ensure_package_shipped(index.sparkSession)
    tomb = np.array(
        sorted({int(r[0]) for r in tombstones.select(tombstones.columns[0]).collect()}),
        dtype=np.int64,
    )

    idx_cols = [
        "cell", "n", "dim", "metric", "entry", "ids", "levels",
        "vec_bytes", "e_layer", "e_src", "e_dst", "e_prot",
    ]

    def per_rows(batches):
        for pdf in batches:
            out = []
            for _, st in pdf.iterrows():
                ids = np.asarray(st["ids"], dtype=np.int64)
                mask = ~np.isin(ids, tomb)
                if mask.all():
                    out.append({c: st.get(c) for c in idx_cols})
                    continue
                if not mask.any():
                    continue  # whole cell deleted -> drop the row
                n, dim = int(st["n"]), int(st["dim"])
                X = np.frombuffer(st["vec_bytes"], dtype=np.float64).reshape(n, dim)[mask]
                local = LocalHNSW(
                    m=m, ef_construction=ef_construction, metric=st["metric"], seed=0
                )
                local.build(X)
                s2 = local.to_state()
                out.append(
                    {
                        "cell": int(st["cell"]), "n": s2["n"], "dim": s2["dim"],
                        "metric": s2["metric"], "entry": s2["entry"],
                        "ids": ids[mask].tolist(), "levels": s2["levels"],
                        "vec_bytes": s2["vec_bytes"], "e_layer": s2["e_layer"],
                        "e_src": s2["e_src"], "e_dst": s2["e_dst"],
                        "e_prot": s2["e_prot"],
                    }
                )
            yield pd.DataFrame(out, columns=idx_cols)

    return index.mapInPandas(per_rows, INDEX_SCHEMA)


def hnsw_upsert(
    index: DataFrame,
    rows: DataFrame,
    centroids: np.ndarray,
    metric: str = "cosine",
    m: int = 8,
    ef_construction: int = 64,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
) -> DataFrame:
    """Index-tier upsert — the reference's overwrite-by-external-id
    (`core/hnsw/graph.py:131-139`) against the persisted index: compact
    any existing versions of the incoming ids out (:func:`hnsw_delete`),
    then merge the new rows in (:func:`hnsw_insert`). Cells touched =
    cells holding an old version plus cells the new vectors route to;
    everything else passes through both stages untouched. Last write
    wins, exactly once, no duplicate ids in the result (asserted in
    tests)."""
    compacted = hnsw_delete(
        index, rows.select(id_col), m=m, ef_construction=ef_construction
    )
    return hnsw_insert(
        compacted, rows, centroids, metric=metric, m=m,
        ef_construction=ef_construction, id_col=id_col, vector_col=vector_col,
    )


def hnsw_rebalance(
    index: DataFrame,
    assigned: DataFrame,
    metric: str = "cosine",
    m: int = 8,
    ef_construction: int = 64,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    cell_col: str = "cell",
    old_centroids: np.ndarray | None = None,
):
    """Drift maintenance for the persisted per-cell index: one Lloyd
    recentering step (:func:`~.similarity.ivf_recenter`) over the
    current membership, then MOVE only the vectors whose nearest
    centroid changed — compact them out of their old cells and insert
    them into their new ones (the :func:`hnsw_upsert` composition, which
    rebuilds only touched cells; untouched cells pass through
    byte-identical). The reference freezes its coarse structure at build
    time (`core/hnsw/graph.py:49-63` — parameters and layers never
    adapt); this keeps cell quality tracking the data at a cost of
    O(moved vectors + touched cells), never O(index).

    Returns ``(new_index, new_centroids, moves)`` — moves as in
    ``ivf_recenter``; search against the new index must use
    ``new_centroids`` (cell ids are stable, centroid VECTORS changed).
    Pass ``old_centroids`` when you have them so a cell that loses every
    member keeps its old centroid (Lloyd's no-members-no-update rule)
    instead of failing the recenter step.
    """
    from hnsw_vector_db_spark.operators.similarity import ivf_recenter

    moves, centroids = ivf_recenter(
        assigned, id_col=id_col, vector_col=vector_col, cell_col=cell_col,
        metric=metric, old_centroids=old_centroids,
    )
    # r12 (guide §5): ``moves`` is consumed THREE times — the delete
    # stage's tombstone collect, the insert stage's routing join, and by
    # the caller (the maintenance report) — and each lazy consumer
    # re-ran the full reassignment argmin over the membership. One eager
    # checkpoint of the (id, old_cell, new_cell, moved) table — four
    # narrow columns, O(index rows) — computes it once.
    moves = moves.localCheckpoint()
    moved_rows = assigned.join(
        moves.filter(F.col("moved")).select(id_col), id_col, "left_semi"
    ).select(id_col, vector_col)
    new_index = hnsw_upsert(
        index, moved_rows, centroids, metric=metric, m=m,
        ef_construction=ef_construction, id_col=id_col, vector_col=vector_col,
    )
    return new_index, centroids, moves


def hnsw_edges(
    assigned: DataFrame,
    metric: str = "cosine",
    m: int = 8,
    ef_construction: int = 64,
    id_col: str = "vec_id",
    vector_col: str = "embedding",
    index: DataFrame | None = None,
) -> DataFrame:
    """Per-cell HNSW topology as an edges DataFrame (cell, layer, src,
    dst) — the Spark-native form of the reference's in-memory adjacency
    dicts (`core/hnsw/graph.py:15,66`). Derived by exploding the
    materialized index (``index=`` reuses an existing :func:`hnsw_build`
    output; otherwise one is built), with local edge endpoints mapped back
    to global vector ids via the stored ``ids`` array.
    """
    if index is None:
        index = hnsw_build(assigned, metric, m, ef_construction, id_col, vector_col)
    # legacy pre-e_prot artifacts: a parquet written before the column
    # existed has NO e_prot at all (F.col would fail analysis) and one
    # written with it may carry nulls — add the column when absent, then
    # coalesce to all-False so arrays_zip doesn't null out (and explode
    # drop) the edges
    if "e_prot" not in index.columns:
        index = index.withColumn("e_prot", F.lit(None).cast("array<boolean>"))
    prot_arr = F.coalesce(
        F.col("e_prot"), F.transform("e_src", lambda _: F.lit(False))
    )
    exploded = index.select(
        "cell",
        "ids",
        F.explode(
            F.arrays_zip("e_layer", "e_src", "e_dst", prot_arr.alias("e_prot"))
        ).alias("e"),
    )
    return exploded.select(
        "cell",
        F.col("e.e_layer").alias("layer"),
        F.element_at("ids", F.col("e.e_src") + 1).alias("src"),
        F.element_at("ids", F.col("e.e_dst") + 1).alias("dst"),
        # trim-exempt parent edge (connectivity spanning tree) — excluded
        # from the degree-cap invariant, which bounds UNPROTECTED edges
        F.col("e.e_prot").alias("prot"),
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


def _route_cells(
    Q: np.ndarray, C: np.ndarray, nprobe: int, metric: str
) -> np.ndarray:
    """nprobe nearest cell ids per query row, (B, nb) int array. ONE
    (B x dim) @ (dim x n_cells) matmul + one stable argsort per call —
    deterministic min-cell-id tiebreak. Shared by the executor-side
    (:func:`assign_query_cells`) and driver-side (:func:`hnsw_search`)
    routing paths so the two are bit-identical by construction."""
    nb = min(nprobe, C.shape[0])
    if metric == "cosine":
        cn = np.linalg.norm(C, axis=1, keepdims=True)
        Cn = C / np.where(cn == 0, 1.0, cn)
        qn = np.linalg.norm(Q, axis=1, keepdims=True)
        Qn = Q / np.where(qn == 0, 1.0, qn)
        D = -(Qn @ Cn.T)  # (B, n_cells); smaller = nearer
    else:
        # argsort of ||c||^2 - 2 c.q == argsort of euclidean dist
        D = (C * C).sum(axis=1)[None, :] - 2.0 * (Q @ C.T)
    return np.argsort(D, axis=1, kind="stable")[:, :nb]


def assign_query_cells(
    queries: DataFrame,
    centroids: np.ndarray,
    nprobe: int = 4,
    metric: str = "cosine",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Route each query to its nprobe nearest cells (exploded rows).
    Centroids ride into executors as plain captured numpy (small).

    Vectorized per Arrow batch via :func:`_route_cells` — no per-row
    Python loop (the same BLAS-block shape ``knn_batch_twophase``
    uses)."""
    import pandas as pd

    from hnsw_vector_db_spark.session import ensure_package_shipped

    ensure_package_shipped(queries.sparkSession)
    C = np.asarray(centroids, dtype=np.float64)
    nb = min(nprobe, C.shape[0])

    def route(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            Q = np.vstack(pdf[query_vec_col].to_numpy()).astype(np.float64)
            cells = _route_cells(Q, C, nprobe, metric)  # (B, nb)
            yield pd.DataFrame(
                {
                    query_id_col: pdf[query_id_col].to_numpy().repeat(nb),
                    query_vec_col: pdf[query_vec_col].to_numpy().repeat(nb),
                    "cell": cells.reshape(-1),
                }
            )

    schema = f"{query_id_col} long, {query_vec_col} array<float>, cell int"
    return queries.select(query_id_col, query_vec_col).mapInPandas(route, schema)


def hnsw_search(
    index: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 10,
    ef: int = 64,
    nprobe: int = 4,
    metric: str = "cosine",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    id_col: str = "vec_id",
    max_collect_queries: int = 100_000,
    allowed: DataFrame | None = None,
    over_fetch: int = 4,
) -> DataFrame:
    """Search a MATERIALIZED per-cell index (:func:`hnsw_build` output —
    persisted, cached, or read back from parquet) without rebuilding
    anything: each probed cell reconstructs its graph from the stored
    state (O(edges) array slicing, no distance evaluations) and runs the
    beam search. The reference builds once and searches many
    (`core/hnsw/graph.py:127-189`); this is that lifecycle on Spark.

    Output (query_id, vec_id, dist, rank). The cogroup shuffles the index
    one row per cell and the routed queries once on cell id; per-cell
    candidate output is nprobe*k rows per query, so the final rank window
    is tiny.

    Probed-cell pushdown: the query batch is collected ONCE (bounded by
    ``max_collect_queries`` — exceeding it fails fast with guidance
    rather than silently turning a cogroup into a driver OOM) and routed
    DRIVER-SIDE against the local centroid matrix (:func:`_route_cells`
    — zero extra Spark jobs; the executor-side
    :func:`assign_query_cells` shares the same function so routing is
    bit-identical). The union of probed cells — at most n_queries *
    nprobe ids — is pushed as an ``isin`` filter on the index BEFORE the
    cogroup, so the index scan touches only the probed cells' rows, and
    the cogroup consumes the SAME literal routing the filter was derived
    from (re-evaluating the queries lineage in a second job could route
    differently and silently drop a probed cell the filter excluded).
    With the index stored ``partitionBy("cell")`` that filter becomes
    real partition pruning (asserted in tests/test_hnsw_index.py): a
    100k-cell index serves a 5-query search by reading ~nprobe*5
    partitions, not the index. For query batches beyond the cap, chunk
    the batch caller-side (the twophase-kNN pattern) or raise the cap
    explicitly — an unbounded silent collect is never the default.

    Filtered ANN: ``allowed`` (a DataFrame of admissible ``id_col``
    values — compute it with any metadata predicate, e.g.
    ``vectors.filter(F.col("lang") == "en").select("vec_id")``) restricts
    results to that set. The graph traversal itself is UNfiltered — a
    predicate-aware beam would have to walk through inadmissible nodes
    anyway to keep the graph connected — instead each cell over-fetches
    ``k * over_fetch`` candidates (ef inflated to match) and the
    admissibility semi-join prunes AFTER traversal, before the final
    rank window; recall then depends on over_fetch vs the predicate's
    selectivity (checked against exact filtered kNN by the
    hnsw_filtered_recall driver entry). The reference can only echo
    metadata back per hit (`api/rest/server.py:174`), never filter on
    it."""
    import pandas as pd

    from hnsw_vector_db_spark.session import ensure_package_shipped

    spark = queries.sparkSession
    ensure_package_shipped(spark)
    qin = queries.select(query_id_col, query_vec_col).limit(
        max_collect_queries + 1
    ).collect()
    if len(qin) > max_collect_queries:
        raise ValueError(
            f"hnsw_search collects the query batch for probed-cell routing; "
            f"got > {max_collect_queries} queries. Chunk the batch and union "
            f"results, or pass max_collect_queries= explicitly."
        )
    C = np.asarray(centroids, dtype=np.float64)
    nb = min(nprobe, C.shape[0])
    if qin:
        Q = np.array([list(r[query_vec_col]) for r in qin], dtype=np.float64)
        cells = _route_cells(Q, C, nprobe, metric)  # (B, nb)
        lit_rows = [
            (r[query_id_col], list(r[query_vec_col]), int(cells[i, j]))
            for i, r in enumerate(qin)
            for j in range(nb)
        ]
    else:
        lit_rows = []
    probed = sorted({c for _, _, c in lit_rows})
    qcells = spark.createDataFrame(
        lit_rows, f"{query_id_col} long, {query_vec_col} array<float>, cell int"
    )
    index = index.filter(F.col("cell").isin(probed))

    # filtered search over-fetches per cell so enough admissible
    # candidates survive the post-traversal semi-join
    k_fetch = k * max(over_fetch, 1) if allowed is not None else k
    ef_eff = max(ef, k_fetch)

    def per_cell(idx_pdf: pd.DataFrame, q_pdf: pd.DataFrame) -> pd.DataFrame:
        if idx_pdf.empty or q_pdf.empty:
            return pd.DataFrame(columns=[query_id_col, id_col, "dist"])
        st = idx_pdf.iloc[0]
        local = LocalHNSW.from_state(
            int(st["n"]), int(st["dim"]), st["metric"], int(st["entry"]),
            st["levels"], st["vec_bytes"], st["e_layer"], st["e_src"], st["e_dst"],
            st.get("e_prot"),  # None for legacy pre-e_prot artifacts
        )
        ids = np.asarray(st["ids"], dtype=np.int64)
        rows = []
        for qid, qvec in zip(q_pdf[query_id_col], q_pdf[query_vec_col]):
            for loc, dist in local.search(
                np.asarray(qvec, dtype=np.float64), k_fetch, ef_eff
            ):
                rows.append((qid, int(ids[loc]), float(dist)))
        return pd.DataFrame(rows, columns=[query_id_col, id_col, "dist"])

    out_schema = f"{query_id_col} long, {id_col} long, dist double"
    candidates = (
        index.groupBy("cell")
        .cogroup(qcells.groupBy("cell"))
        .applyInPandas(lambda ik, qk: per_cell(ik, qk), out_schema)
    )
    if allowed is not None:
        candidates = candidates.join(
            allowed.select(id_col), id_col, "left_semi"
        )
    from pyspark.sql import Window

    w = Window.partitionBy(query_id_col).orderBy(F.col("dist").asc(), F.col(id_col).asc())
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, F.round("dist", 6).alias("dist"), "rank")
    )


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
    index: DataFrame | None = None,
) -> DataFrame:
    """Distributed ANN over per-cell HNSW graphs. With ``index=`` (a
    :func:`hnsw_build` artifact) this is pure search — the build cost was
    paid once; without it a throwaway index is built inline (convenience
    for one-shot queries; any repeated caller should build and persist).
    """
    if index is None:
        index = hnsw_build(
            assigned, metric=metric, id_col=id_col, vector_col=vector_col
        )
    return hnsw_search(
        index, queries, centroids, k, ef, nprobe, metric,
        query_id_col, query_vec_col, id_col,
    )
