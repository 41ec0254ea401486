"""Degenerate-input semantics: empty tables, empty text, zero vectors,
k larger than the corpus — the edges a production engine must not crash
on (the reference raises or corrupts on several of these: inserting into
a full index raises `core/hnsw/graph.py:129-130`; searching an empty
index IndexErrors at the entry-point lookup)."""

from __future__ import annotations

import pytest

from hnsw_vector_db_spark.operators import dedup, text_analysis
from hnsw_vector_db_spark.operators.knn import knn_batch, knn_batch_twophase, knn_point
from hnsw_vector_db_spark.operators.similarity import similarity_join

EMB_SCHEMA = "vec_id long, embedding array<float>"
DOC_SCHEMA = "doc_id long, text string"


@pytest.fixture(scope="module")
def empty_emb(spark):
    return spark.createDataFrame([], EMB_SCHEMA)


def test_knn_point_empty_corpus(spark, empty_emb):
    assert knn_point(empty_emb, [1.0, 0.0], k=5).count() == 0


def test_knn_k_larger_than_corpus(spark):
    emb = spark.createDataFrame([(1, [1.0, 0.0]), (2, [0.0, 1.0])], EMB_SCHEMA)
    rows = knn_point(emb, [1.0, 0.0], k=100).collect()
    assert len(rows) == 2  # all rows, no padding, no crash


def test_knn_batch_empty_queries(spark):
    emb = spark.createDataFrame([(1, [1.0, 0.0])], EMB_SCHEMA)
    queries = spark.createDataFrame([], "query_id long, query_vec array<float>")
    assert knn_batch(queries, emb, k=5).count() == 0
    assert knn_batch_twophase(queries, emb, k=5).count() == 0


def test_knn_zero_vector_query(spark):
    emb = spark.createDataFrame([(1, [1.0, 0.0]), (2, [0.0, 0.0])], EMB_SCHEMA)
    rows = knn_point(emb, [0.0, 0.0], k=2, metric="cosine").collect()
    # zero-norm guard: all distances defined (cosine -> 1.0), nothing NaN
    assert len(rows) == 2
    assert all(r["dist"] is not None for r in rows)


def test_similarity_join_empty(spark, empty_emb):
    assert similarity_join(empty_emb, threshold=0.5).count() == 0


def test_dedup_empty_docs(spark):
    docs = spark.createDataFrame([], DOC_SCHEMA)
    assert dedup.exact_dedup(docs).count() == 0
    assert dedup.jaccard_pairs(docs).count() == 0
    assert dedup.minhash_signature_wide(docs).count() == 0
    assert dedup.simhash_near_dup(docs).count() == 0


def test_dedup_empty_and_whitespace_text(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "one two three four")], DOC_SCHEMA
    )
    # shingle-based ops drop shingle-less docs instead of crashing
    assert dedup.jaccard_pairs(docs, n=3, threshold=0.0).count() == 0
    sigs = {r["doc_id"] for r in dedup.minhash_signature_wide(docs, k=4).collect()}
    assert sigs == {3}
    # exact dedup keeps empty-text docs (they are rows like any other)
    kept = {r["doc_id"] for r in dedup.exact_dedup(docs).collect()}
    assert kept == {1, 2, 3}


def test_text_analysis_empty_text(spark):
    docs = spark.createDataFrame([(1, ""), (2, "hello world")], DOC_SCHEMA)
    tok = {r["doc_id"]: r["n_tokens"] for r in text_analysis.token_counts(docs).collect()}
    assert tok == {1: 0, 2: 2}
    q = {r["doc_id"]: r["quality"] for r in text_analysis.quality_score(docs).collect()}
    assert 0.0 <= q[1] <= 1.0  # no NaN / division by zero
    lang = {
        r["doc_id"]: r["pred_lang"] for r in text_analysis.language_id(docs).collect()
    }
    assert lang[1] == "und"


def test_embedding_neardup_no_pairs(spark):
    emb = spark.createDataFrame([(1, [1.0, 0.0]), (2, [0.0, 1.0])], EMB_SCHEMA)
    out = {r["vec_id"]: r["is_dup"] for r in dedup.embedding_neardup(emb, 0.99).collect()}
    assert out == {1: False, 2: False}


def test_neardup_components_no_edges(spark):
    nodes = spark.createDataFrame([(1,), (2,)], "vec_id long")
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    got = {r["vec_id"]: r["rep_id"] for r in dedup.neardup_components(nodes, pairs).collect()}
    assert got == {1: 1, 2: 2}


def test_corpus_ops_on_empty_table(spark):
    from pyspark.sql import functions as F

    from hnsw_vector_db_spark.operators import corpus

    empty = spark.createDataFrame([], "doc_id long, text string, source string")
    assert corpus.chunk_documents(empty).count() == 0
    assert corpus.shard_shuffle(empty).count() == 0
    w = spark.createDataFrame([], "source string, frac double")
    assert corpus.stratified_sample(empty, w).count() == 0
    assert corpus.pii_redact(empty).count() == 0


def test_hnsw_delete_empty_tombstones_is_identity(spark, sf_dir):
    from hnsw_vector_db_spark.operators.hnsw_partition import hnsw_build, hnsw_delete
    from hnsw_vector_db_spark.operators.similarity import ivf_fit
    from hnsw_vector_db_spark.sources.parquet import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, _ = ivf_fit(emb, n_cells=4)
    index = hnsw_build(assigned).cache()
    tomb = spark.createDataFrame([], "vec_id long")
    out = hnsw_delete(index, tomb)
    assert out.exceptAll(index).count() == 0
    assert index.exceptAll(out).count() == 0
