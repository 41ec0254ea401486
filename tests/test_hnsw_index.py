"""Build-once / search-many contract for the persisted HNSW index.

The reference builds its graph once and serves many searches from it
(`core/hnsw/graph.py:127-189`; persisted via `core/storage/engine.py:23-56`).
These tests lock the Spark-native equivalent: ``hnsw_build`` materializes
the per-cell index as a DataFrame, and ``hnsw_search`` over that artifact
(including a parquet round-trip) returns results identical to the inline
build path — with zero construction work at search time.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from hnsw_vector_db_spark.operators.hnsw_partition import (
    LocalHNSW,
    hnsw_build,
    hnsw_edges,
    hnsw_search,
    hnsw_topk,
)
from hnsw_vector_db_spark.operators.similarity import ivf_fit
from hnsw_vector_db_spark.sources.parquet import load_table


@pytest.fixture(scope="module")
def fitted(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, centroids = ivf_fit(emb, n_cells=4)
    assigned = assigned.cache()
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return assigned, centroids, queries


def test_state_roundtrip_search_identical():
    """from_state(to_state(idx)) searches bit-identically to the built
    index — the property that makes the persisted artifact trustworthy."""
    rng = np.random.RandomState(7)
    X = rng.randn(500, 16)
    built = LocalHNSW(m=6, ef_construction=32, metric="cosine", seed=0)
    built.build(X)
    st = built.to_state()
    loaded = LocalHNSW.from_state(
        st["n"], st["dim"], st["metric"], st["entry"], st["levels"],
        st["vec_bytes"], st["e_layer"], st["e_src"], st["e_dst"], st["e_prot"],
    )
    assert loaded.protected0 == built.protected0  # trim exemptions survive
    for qi in range(10):
        a = built.search(X[qi], 5, ef=48)
        b = loaded.search(X[qi], 5, ef=48)
        assert a == b


def test_build_once_search_many(spark, fitted, tmp_path):
    """Two searches over ONE materialized (parquet round-tripped) index
    return identical results, and both equal the inline-build path — no
    second build happens (the index rows are plain data; nothing in
    hnsw_search can reconstruct edges it wasn't given)."""
    assigned, centroids, queries = fitted
    path = str(tmp_path / "hnsw_index")
    hnsw_build(assigned).write.parquet(path)
    index = spark.read.parquet(path)

    r1 = sorted(map(tuple, hnsw_search(index, queries, centroids, k=5, ef=64, nprobe=2).collect()))
    r2 = sorted(map(tuple, hnsw_search(index, queries, centroids, k=5, ef=64, nprobe=2).collect()))
    assert r1 == r2 and len(r1) > 0

    inline = sorted(map(tuple, hnsw_topk(queries, assigned, centroids, k=5, ef=64, nprobe=2).collect()))
    assert r1 == inline


def test_edges_derived_from_index_match_fresh_build(spark, fitted):
    assigned, _, _ = fitted
    index = hnsw_build(assigned, m=4, ef_construction=16)
    e_idx = {
        tuple(r) for r in hnsw_edges(assigned, index=index).collect()
    }
    e_fresh = {
        tuple(r) for r in hnsw_edges(assigned, m=4, ef_construction=16).collect()
    }
    # same build params => identical topology; the index= variant avoids
    # the second build entirely
    assert e_idx == e_fresh and len(e_idx) > 0


def test_insert_batch_local_finds_new_rows():
    """Incremental LocalHNSW insert: inserted vectors are their own
    nearest neighbor, old rows stay searchable, and the merge is a pure
    function of (state, batch) — two identical merges agree exactly."""
    rng = np.random.RandomState(11)
    X = rng.randn(300, 16)
    idx = LocalHNSW(m=6, ef_construction=32, metric="cosine", seed=0)
    idx.build(X)
    X_new = rng.randn(20, 16)
    idx.insert_batch(X_new)
    for j in range(20):
        hits = idx.search(X_new[j], 1, ef=48)
        assert hits[0][0] == 300 + j  # exact copy is top-1
    assert idx.search(X[5], 1, ef=48)[0][0] == 5
    # determinism of the merge
    idx2 = LocalHNSW(m=6, ef_construction=32, metric="cosine", seed=0)
    idx2.build(X)
    idx2.insert_batch(X_new)
    assert idx.to_state() == idx2.to_state()


def test_hnsw_insert_touches_only_affected_cells(spark, fitted):
    """Distributed incremental maintenance: cells that receive no new
    vectors pass through BYTE-IDENTICAL (no rebuild), and searches for
    the inserted vectors return them as top-1."""
    from hnsw_vector_db_spark.operators.hnsw_partition import hnsw_insert

    assigned, centroids, _ = fitted
    index = hnsw_build(assigned, metric="cosine").cache()

    # new vectors = copies of three existing ones, offset ids
    base = assigned.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    merged = hnsw_insert(index, base, centroids, metric="cosine").cache()

    # which cells got the new rows?
    before = {r["cell"]: r for r in index.collect()}
    after = {r["cell"]: r for r in merged.collect()}
    assert set(before) == set(after)
    touched = {c for c in after if after[c]["n"] != before[c]["n"]}
    assert touched  # at least one cell grew
    for c in set(after) - touched:
        assert after[c] == before[c]  # untouched rows byte-identical

    # the inserted copies are found as their own nearest neighbor
    queries = base.select(
        (F.col("vec_id")).alias("query_id"), F.col("embedding").alias("query_vec")
    )
    hits = hnsw_search(merged, queries, centroids, k=1, ef=64, nprobe=2)
    got = {r["query_id"]: r["vec_id"] for r in hits.collect()}
    for qid, vid in got.items():
        assert vid in (qid, qid - 1_000_000)  # the copy or its twin (dist 0 tie)


def test_hnsw_delete_compacts_only_affected_cells(spark, fitted, tmp_path):
    """Tombstoned ids vanish from search results, their cells compact
    (n drops, no stranded ids), every other cell row passes through
    byte-identical, and the index never shuffles (single map stage)."""
    from hnsw_vector_db_spark.operators.hnsw_partition import hnsw_delete
    from hnsw_vector_db_spark.plans.explain import physical_plan

    assigned, centroids, queries = fitted
    idx_dir = str(tmp_path / "idx")
    hnsw_build(assigned, metric="cosine").write.parquet(idx_dir)
    index = spark.read.parquet(idx_dir)
    tomb_ids = [r["vec_id"] for r in assigned.limit(3).collect()]
    tomb = spark.createDataFrame([(i,) for i in tomb_ids], "vec_id long")

    compacted = hnsw_delete(index, tomb).cache()
    # over the materialized index the compaction is a single map stage
    assert "Exchange" not in physical_plan(hnsw_delete(index, tomb))

    before = {r["cell"]: r for r in index.collect()}
    after = {r["cell"]: r for r in compacted.collect()}
    tomb_set = set(tomb_ids)
    for c, row in before.items():
        if set(row["ids"]) & tomb_set:
            assert set(after[c]["ids"]) == set(row["ids"]) - tomb_set
            assert after[c]["n"] == row["n"] - len(set(row["ids"]) & tomb_set)
        else:
            assert after[c] == row  # untouched: byte-identical

    hits = hnsw_search(compacted, queries, centroids, k=10, ef=96, nprobe=4)
    got = {r["vec_id"] for r in hits.collect()}
    assert not (got & tomb_set)


def test_hnsw_upsert_last_write_wins(spark, fitted):
    """Upserting an EXISTING id with a new vector leaves exactly one
    version in the index, searches find the new vector (distance 0 to
    the new embedding), and no id appears twice."""
    from pyspark.sql import functions as F

    from hnsw_vector_db_spark.operators.hnsw_partition import hnsw_upsert

    assigned, centroids, _ = fitted
    index = hnsw_build(assigned, metric="cosine").cache()

    # replace vec_id 0's vector with vec_id 1's embedding
    new_vec = assigned.filter(F.col("vec_id") == 1).select(
        F.lit(0).cast("long").alias("vec_id"), "embedding"
    )
    merged = hnsw_upsert(index, new_vec, centroids, metric="cosine").cache()

    all_ids = [i for r in merged.collect() for i in r["ids"]]
    assert all_ids.count(0) == 1  # exactly one version
    assert sorted(all_ids) == sorted(
        i for r in index.collect() for i in r["ids"]
    )  # same id set overall

    q = new_vec.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    hits = hnsw_search(merged, q, centroids, k=2, ef=64, nprobe=4).collect()
    by_rank = sorted(hits, key=lambda r: r["rank"])
    # both id 0 (new vector) and id 1 (its source) sit at distance 0
    assert {r["vec_id"] for r in by_rank[:2]} == {0, 1}
    assert all(r["dist"] < 1e-6 for r in by_rank[:2])


def test_hnsw_api_rejects_degenerate_m(spark, fitted):
    """m < 2 fails at the API edge with a clean ValueError, not a
    worker-side traceback (m=1 divides by zero in the level draw)."""
    import numpy as np

    from hnsw_vector_db_spark.operators.hnsw_partition import (
        hnsw_build,
        hnsw_delete,
        hnsw_insert,
    )

    assigned, centroids, _ = fitted
    with pytest.raises(ValueError, match="m must be >= 2"):
        hnsw_build(assigned, m=1)
    idx = hnsw_build(assigned)
    with pytest.raises(ValueError, match="m must be >= 2"):
        hnsw_insert(idx, assigned.limit(1), centroids, m=0)
    with pytest.raises(ValueError, match="m must be >= 2"):
        hnsw_delete(idx, assigned.limit(1).select("vec_id"), m=1)


def test_hnsw_search_prunes_unprobed_cells(spark, fitted, tmp_path):
    """The probed-cell set is pushed down to the index scan: stored
    partitionBy('cell'), a search reads only the probed partitions
    (PartitionFilters in the scan), and results equal the unpartitioned
    path."""
    from hnsw_vector_db_spark.plans.explain import physical_plan

    assigned, centroids, queries = fitted
    flat_dir = str(tmp_path / "flat")
    part_dir = str(tmp_path / "by_cell")
    built = hnsw_build(assigned)
    built.write.parquet(flat_dir)
    built.write.partitionBy("cell").parquet(part_dir)

    flat = spark.read.parquet(flat_dir)
    part = spark.read.parquet(part_dir)
    one_q = queries.limit(1)

    r_flat = sorted(map(tuple, hnsw_search(flat, one_q, centroids, k=5, nprobe=2).collect()))
    r_part = sorted(map(tuple, hnsw_search(part, one_q, centroids, k=5, nprobe=2).collect()))
    assert r_flat == r_part and len(r_part) == 5

    plan = physical_plan(hnsw_search(part, one_q, centroids, k=5, nprobe=2))
    # partition-pruned scan: the cell isin filter reaches PartitionFilters
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters", 1)[1][:200], plan


def test_hnsw_search_filtered_matches_exact_filtered(spark, fitted):
    """Filtered index search (allowed-set semi-join + over-fetch) at
    nprobe=all-cells with a wide beam must equal EXACT filtered kNN:
    every cell is probed and ef >= cell size makes the per-cell beam
    exhaustive over the (strongly connected) layer-0 graph."""
    from hnsw_vector_db_spark.operators.knn import knn_batch
    from hnsw_vector_db_spark.sources.parquet import load_table

    assigned, centroids, queries = fitted
    emb = assigned.select("vec_id", "embedding", "label")
    allowed = emb.filter(F.col("label") % 2 == 0).select("vec_id")
    index = hnsw_build(assigned)
    got = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in hnsw_search(
            index, queries, centroids, k=5, ef=4096, nprobe=4,
            allowed=allowed, over_fetch=1000,
        ).collect()
    }
    exact = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in knn_batch(
            queries, emb.filter(F.col("label") % 2 == 0), k=5
        ).collect()
    }
    assert got == exact
    # all returned ids satisfy the predicate (trivially, via the semi-join)
    allowed_ids = {r["vec_id"] for r in allowed.collect()}
    assert set(got.values()) <= allowed_ids


def test_hnsw_search_query_collect_cap(spark, fitted):
    """Oversized query batches fail fast instead of silently collecting."""
    assigned, centroids, queries = fitted
    index = hnsw_build(assigned)
    with pytest.raises(ValueError, match="max_collect_queries"):
        hnsw_search(index, queries, centroids, k=3, max_collect_queries=2)
    # raising the cap restores service
    out = hnsw_search(index, queries, centroids, k=3, max_collect_queries=5)
    assert out.count() > 0


def test_ivf_topk_predicate_equals_exact_filtered(spark, sf_dir):
    """ivf_topk(predicate) at nprobe=n_cells is exactly filtered kNN —
    the predicate applies inside every (i.e. all) probed cells."""
    from hnsw_vector_db_spark.operators.knn import knn_point
    from hnsw_vector_db_spark.operators.similarity import ivf_fit_seeded, ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, centroids = ivf_fit_seeded(emb, n_cells=8)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    got = [
        (r["vec_id"], round(r["dist"], 6))
        for r in ivf_topk(
            assigned, centroids, qv, k=7, nprobe=8,
            predicate=F.col("label") % 2 == 0,
        ).collect()
    ]
    exact = [
        (r["vec_id"], round(r["dist"], 6))
        for r in knn_point(emb.filter(F.col("label") % 2 == 0), qv, k=7).collect()
    ]
    assert got == exact


def test_ivf_recenter_lloyd_monotone_and_metric_consistency(spark, sf_dir):
    """Recentering + reassignment never increases the total squared
    distance to the assigned centroid (Lloyd's monotonicity; rounded
    means add at most epsilon), and every new_cell is the true argmin of
    the new centroids under the requested metric."""
    import numpy as np

    from hnsw_vector_db_spark.operators.similarity import ivf_fit_seeded, ivf_recenter

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, old_cent = ivf_fit_seeded(emb, n_cells=8)
    moves, new_cent = ivf_recenter(assigned)
    rows = (
        assigned.select("vec_id", "embedding", "cell")
        .join(moves.select("vec_id", "new_cell"), "vec_id")
        .collect()
    )
    X = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    old_sse = sum(
        float(((x - old_cent[r["cell"]]) ** 2).sum()) for x, r in zip(X, rows)
    )
    new_sse = sum(
        float(((x - new_cent[r["new_cell"]]) ** 2).sum()) for x, r in zip(X, rows)
    )
    assert new_sse <= old_sse + 1e-6
    # argmin consistency: new_cell is the nearest new centroid (id tiebreak)
    D = ((X[:, None, :] - new_cent[None, :, :]) ** 2).sum(axis=2)
    expect = D.argmin(axis=1)  # numpy argmin takes first == lowest id on ties
    got = np.array([r["new_cell"] for r in rows])
    assert (got == expect).all()
    # something actually moved on the seeded (unconverged) assignment
    assert moves.filter(F.col("moved")).count() > 0


def test_hnsw_rebalance_touches_only_moved_cells(spark, sf_dir):
    """Rebalance preserves every vector, relocates exactly the moved
    ids, and leaves cells with no moved vectors byte-identical."""
    from hnsw_vector_db_spark.operators.hnsw_partition import hnsw_rebalance
    from hnsw_vector_db_spark.operators.similarity import ivf_fit_seeded

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, _ = ivf_fit_seeded(emb, n_cells=4)
    index = hnsw_build(assigned, metric="euclidean").cache()
    new_index, new_cent, moves = hnsw_rebalance(index, assigned, metric="euclidean")
    new_index = new_index.cache()
    assert index.agg(F.sum("n")).first()[0] == new_index.agg(F.sum("n")).first()[0]
    moved = {
        (r["vec_id"], r["old_cell"], r["new_cell"])
        for r in moves.filter(F.col("moved")).collect()
    }
    assert moved  # seeded assignment is unconverged -> something moves
    touched = {c for _, o, n in moved for c in (o, n)}
    before = {r["cell"]: r for r in index.collect()}
    after = {r["cell"]: r for r in new_index.collect()}
    for cell, row in after.items():
        if cell not in touched:
            assert bytes(row["vec_bytes"]) == bytes(before[cell]["vec_bytes"])
            assert row["ids"] == before[cell]["ids"]
    # every moved id lives in exactly its new cell now
    placement = {vid: c for c, r in after.items() for vid in r["ids"]}
    for vid, _o, n in moved:
        assert placement[vid] == n


def test_ivf_recenter_empty_cell_inherits_or_fails_fast(spark):
    """A memberless cell must keep positional == cell id: inherit the
    old centroid when provided, fail loudly otherwise — never silently
    compact positions (which would mis-route every later cell)."""
    import numpy as np

    from hnsw_vector_db_spark.operators.similarity import ivf_recenter

    # cells 0 and 2 populated; cell 1 empty
    assigned = spark.createDataFrame(
        [(0, [0.0, 0.0], 0), (1, [1.0, 1.0], 0), (10, [9.0, 9.0], 2)],
        "vec_id long, embedding array<double>, cell int",
    )
    with pytest.raises(ValueError, match="no members"):
        ivf_recenter(assigned)
    old = np.array([[0.0, 0.0], [5.0, 5.0], [9.0, 9.0]])
    moves, cent = ivf_recenter(assigned, old_centroids=old)
    assert cent.shape == (3, 2)
    assert list(cent[1]) == [5.0, 5.0]  # inherited, position preserved
    assert list(cent[2]) == [9.0, 9.0]  # the cell-2 member's own mean
    got = {r["vec_id"]: r["new_cell"] for r in moves.collect()}
    assert got[10] == 2  # still routed by true cell id, not position
