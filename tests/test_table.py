"""Table lifecycle: validate / insert / upsert / delete / id assignment
(reference semantics per SURVEY.md §2.1 #8-12)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hnsw_vector_db_spark.operators import table


@pytest.fixture(scope="module")
def base(spark):
    rows = [(i, [float(i), float(i + 1)], str(i % 3)) for i in range(10)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    ).cache()


def test_validate_splits_dim_mismatch(spark):
    rows = [(1, [1.0, 2.0]), (2, [1.0]), (3, None), (4, [1.0, 2.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    valid, rejects = table.validate_vectors(df, dim=2)
    assert sorted(r["vec_id"] for r in valid.collect()) == [1, 4]
    assert sorted(r["vec_id"] for r in rejects.collect()) == [2, 3]


def test_insert_batch_appends_only_valid(spark, base):
    new = spark.createDataFrame(
        [(100, [9.0, 9.0], "x"), (101, [9.0], "x")],
        "vec_id long, embedding array<double>, label string",
    )
    out, rejects = table.insert_batch(base, new, dim=2)
    assert out.count() == 11
    assert [r["vec_id"] for r in rejects.collect()] == [101]


def test_upsert_updates_win(spark, base):
    updates = spark.createDataFrame(
        [(3, [9.0, 9.0], "Z"), (99, [1.0, 1.0], "N")],
        "vec_id long, embedding array<double>, label string",
    )
    out = table.upsert(base, updates)
    assert out.count() == 11  # 10 base, 1 overwritten, 1 new
    got = {r["vec_id"]: r["label"] for r in out.collect()}
    assert got[3] == "Z" and got[99] == "N" and got[4] == "1"


def test_upsert_last_update_wins_within_batch(spark, base):
    """Reference graph.py:131-139 silently overwrites on id reuse; our
    upsert makes 'last wins' explicit and deterministic."""
    updates = spark.createDataFrame(
        [(5, [1.0, 1.0], "first"), (5, [2.0, 2.0], "second")],
        "vec_id long, embedding array<double>, label string",
    )
    out = table.upsert(base, updates)
    got = {r["vec_id"]: r["label"] for r in out.collect()}
    assert got[5] == "second"
    assert out.count() == 10


def test_delete_anti_join(spark, base):
    deletes = spark.createDataFrame([(2,), (4,), (999,)], "vec_id long")
    out = table.delete_ids(base, deletes)
    assert sorted(r["vec_id"] for r in out.collect()) == [0, 1, 3, 5, 6, 7, 8, 9]


def test_assign_ids_deterministic(spark):
    df = spark.createDataFrame([("c",), ("a",), ("b",)], "name string")
    out1 = table.assign_ids(df, start=100, id_col="vec_id", order_col="name")
    out2 = table.assign_ids(df, start=100, id_col="vec_id", order_col="name")
    got1 = {r["name"]: r["vec_id"] for r in out1.collect()}
    got2 = {r["name"]: r["vec_id"] for r in out2.collect()}
    assert got1 == got2 == {"a": 100, "b": 101, "c": 102}


def test_attach_metadata_left_join(spark, base):
    meta = spark.createDataFrame([(0, "m0"), (1, "m1")], "vec_id long, meta string")
    out = table.attach_metadata(base.select("vec_id"), meta)
    got = {r["vec_id"]: r["meta"] for r in out.collect()}
    assert got[0] == "m0" and got[5] is None  # .get(id, {}) semantics


def test_label_centroids_matches_numpy(spark, sf_dir):
    import numpy as np

    from hnsw_vector_db_spark.operators.stats import label_centroids
    from hnsw_vector_db_spark.sources.parquet import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    got = {r["label"]: (r["centroid"], r["n"]) for r in label_centroids(emb).collect()}
    rows = emb.collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(np.asarray(r["embedding"], dtype=np.float64))
    for label, vecs in by_label.items():
        cent, n = got[label]
        assert n == len(vecs)
        assert np.allclose(cent, np.round(np.mean(vecs, axis=0), 6), atol=1e-9)


def test_train_val_split_deterministic_and_append_stable(spark, sf_dir):
    from hnsw_vector_db_spark.operators.table import train_val_split
    from hnsw_vector_db_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    full = {r["doc_id"]: r["split"] for r in train_val_split(docs, val_pct=10).collect()}
    assert set(full.values()) == {"train", "val"}
    frac = sum(1 for v in full.values() if v == "val") / len(full)
    assert 0.03 < frac < 0.25  # ~10% with hash noise at 500 rows
    # append-stability: splitting any subset gives identical assignments
    sub = docs.filter("doc_id % 2 = 0")
    sub_split = {r["doc_id"]: r["split"] for r in train_val_split(sub, val_pct=10).collect()}
    assert all(full[k] == v for k, v in sub_split.items())


def test_assign_ids_scalable_matches_global_window(spark, sf_dir):
    """Two-phase id assignment returns EXACTLY the ids of the
    single-partition window form, with no single-partition stage."""
    from pyspark.sql import functions as F

    from hnsw_vector_db_spark.operators.table import assign_ids, assign_ids_scalable
    from hnsw_vector_db_spark.plans.explain import physical_plan
    from hnsw_vector_db_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    docs = docs.withColumn(
        "_ord", F.concat_ws("|", "lang", F.lpad(F.col("doc_id").cast("string"), 10, "0"))
    )
    a = assign_ids(docs, start=50, id_col="nid", order_col="_ord")
    b = assign_ids_scalable(docs, start=50, id_col="nid", order_col="_ord", num_partitions=8)
    got_a = {(r["doc_id"], r["nid"]) for r in a.collect()}
    got_b = {(r["doc_id"], r["nid"]) for r in b.collect()}
    assert got_a == got_b
    # Scoped lock: the corpus-side rank window is PARTITIONED (hash on
    # _pid), so the corpus never funnels through one task. The P-row
    # offsets cumsum legitimately plans ONE SinglePartition exchange over
    # the aggregated counts (O(partitions) rows, the zipWithIndex driver
    # pass) — that one is allowed, and only that one.
    plan = physical_plan(b)
    assert "hashpartitioning(_pid" in plan, plan
    # an executed AQE plan prints Final + Initial sections; count the
    # final one only
    final_section = plan.split("== Initial Plan ==")[0]
    assert final_section.count("SinglePartition") <= 1, plan


def test_salted_distinct_count_exact(spark, sf_dir):
    from pyspark.sql import functions as F

    from hnsw_vector_db_spark.operators.relational import salted_distinct_count
    from hnsw_vector_db_spark.sources.parquet import load_events

    ev = load_events(spark, sf_dir)
    got = {
        r["event_type"]: r["n_distinct"]
        for r in salted_distinct_count(ev, "event_type", "user_id").collect()
    }
    want = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == want


# ---- reference request-contract parity ------------------------------------

def test_validate_k_reference_bounds():
    """k in [1, 1000] — the reference validates this at the API edge
    (`api/rest/server.py:33`, Field(ge=1, le=1000)) before any search."""
    from hnsw_vector_db_spark.operators.table import MAX_K, validate_k

    assert MAX_K == 1000
    assert validate_k(1) == 1 and validate_k(1000) == 1000
    for bad in (0, -5, 1001, 10**9):
        with pytest.raises(ValueError):
            validate_k(bad)
    with pytest.raises(ValueError):
        validate_k("10")  # type: ignore[arg-type]


def test_knn_entry_points_reject_out_of_contract_k(spark):
    from hnsw_vector_db_spark.operators.knn import knn_batch, knn_point

    vecs = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(4)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError):
        knn_point(vecs, [1.0, 0.0], k=0)
    q = spark.createDataFrame(
        [(1, [1.0, 0.0])], "query_id long, query_vec array<float>"
    )
    with pytest.raises(ValueError):
        knn_batch(q, vecs, k=2000)


def test_insert_batch_capacity_guard(spark):
    """The reference refuses inserts past max_elements
    (`core/hnsw/graph.py:129-130`); the set-oriented form admits the
    lowest-id rows up to remaining capacity and routes the overflow to
    rejects — alongside the dim rejects."""
    from hnsw_vector_db_spark.operators.table import insert_batch_capacity

    base = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(3)], "vec_id long, embedding array<float>"
    )
    new = spark.createDataFrame(
        [(10, [1.0, 1.0]), (11, [2.0, 2.0]), (12, [3.0, 3.0]), (13, [9.0])],
        "vec_id long, embedding array<float>",
    )
    table_out, rejects = insert_batch_capacity(base, new, dim=2, max_elements=5)
    got_ids = sorted(r["vec_id"] for r in table_out.collect())
    assert got_ids == [0, 1, 2, 10, 11]  # room for 2, lowest ids first
    rej_ids = sorted(r["vec_id"] for r in rejects.collect())
    assert rej_ids == [12, 13]  # capacity overflow + dim reject

    # already at capacity: everything valid still rejects
    full_out, full_rej = insert_batch_capacity(table_out, new, dim=2, max_elements=5)
    assert full_out.count() == 5
    assert sorted(r["vec_id"] for r in full_rej.collect()) == [10, 11, 12, 13]


def test_local_hnsw_rejects_degenerate_m():
    """m=1 would divide by zero in the level draw (ml = 1/log m) and
    cannot form a small-world graph; validated at construction."""
    from hnsw_vector_db_spark.operators.hnsw_partition import LocalHNSW

    with pytest.raises(ValueError):
        LocalHNSW(m=1)
    with pytest.raises(ValueError):
        LocalHNSW(m=0)


def test_validate_k_numpy_ints_and_bool():
    """numpy integral k is valid (common when k derives from array ops);
    bool is rejected despite being an int subclass."""
    import numpy as np

    from hnsw_vector_db_spark.operators.table import validate_k

    assert validate_k(np.int64(10)) == 10
    assert validate_k(np.int32(1)) == 1
    with pytest.raises(ValueError):
        validate_k(True)
    with pytest.raises(ValueError):
        validate_k(np.int64(0))
