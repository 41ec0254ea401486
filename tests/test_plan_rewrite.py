"""The Catalyst-style naive-kNN rewrite (SURVEY.md §4 custom-work item 3).

Like a real optimizer rule the contract is two-sided: matched plans must be
rewritten WITHOUT changing results, and everything else must be left alone.
Reference contrast: the reference has exactly one traversal wired in
(`core/hnsw/graph.py:175-189`); here the naive shape is recognized and
replanned.
"""

import pytest
from pyspark.sql import functions as F, Window

from hnsw_vector_db_spark.functions.distance import distance
from hnsw_vector_db_spark.plans.explain import physical_plan
from hnsw_vector_db_spark.plans.rewrite import (
    match_naive_knn,
    rewrite_knn_topk,
    with_knn_rewrite,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[((F.col("id") * (i + 3)) % 17).cast("double") for i in range(4)]
        ).alias("embedding"),
    )


@pytest.fixture(scope="module")
def queries(spark):
    return spark.range(3).select(
        F.col("id").alias("query_id"),
        F.array(*[F.lit(float(i * 2)) for i in range(4)]).alias("query_vec"),
    )


def _naive(queries, corpus, metric, k=7, dist="d", rank="rk", keep_rank=True):
    w = Window.partitionBy("query_id").orderBy(F.col(dist).asc(), F.col("vec_id").asc())
    df = (
        queries.crossJoin(corpus)
        .withColumn(dist, distance(F.col("query_vec"), F.col("embedding"), metric))
        .withColumn(rank, F.row_number().over(w))
        .filter(F.col(rank) <= k)
    )
    cols = ["query_id", "vec_id", dist] + ([rank] if keep_rank else [])
    return df.select(*cols)


@pytest.mark.parametrize("metric", ["euclidean", "cosine", "manhattan", "dot_product"])
def test_rewrite_preserves_results(queries, corpus, metric):
    naive = _naive(queries, corpus, metric)
    m = match_naive_knn(naive)
    assert m is not None and m.metric == metric and m.k == 7
    rw = rewrite_knn_topk(naive)
    a = sorted(map(tuple, naive.collect()))
    b = sorted(map(tuple, rw.collect()))
    assert len(a) == len(b) == 21
    for x, y in zip(a, b):
        assert x[0] == y[0] and x[1] == y[1] and x[3] == y[3]
        assert abs(x[2] - y[2]) < 1e-9


def test_rewrite_handles_renames_and_dropped_rank(queries, corpus):
    naive = _naive(queries, corpus, "cosine", k=5, dist="distance", rank="r", keep_rank=False)
    rw = rewrite_knn_topk(naive)
    assert rw is not None
    assert rw.columns == ["query_id", "vec_id", "distance"]
    assert sorted(map(tuple, rw.collect())) == sorted(map(tuple, naive.collect()))


def test_rewrite_plan_is_broadcast_not_cartesian(queries, corpus):
    rw = rewrite_knn_topk(_naive(queries, corpus, "euclidean"))
    plan = physical_plan(rw)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_strict_less_than_becomes_k(queries, corpus):
    w = Window.partitionBy("query_id").orderBy("d")
    naive = (
        queries.crossJoin(corpus)
        .withColumn("d", distance("query_vec", "embedding", "euclidean"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") < 4)
        .select("query_id", "vec_id", "d")
    )
    m = match_naive_knn(naive)
    assert m is not None and m.k == 3
    assert rewrite_knn_topk(naive).count() == 9


def test_float_vectors_with_implicit_casts_still_match(spark, queries, corpus):
    fcorpus = corpus.withColumn("embedding", F.col("embedding").cast("array<float>"))
    naive = _naive(queries, fcorpus, "euclidean", k=3)
    rw = rewrite_knn_topk(naive)
    assert rw is not None
    assert sorted(map(tuple, rw.collect())) == sorted(map(tuple, naive.collect()))


def test_non_matching_plans_pass_through(spark, queries, corpus):
    base = queries.crossJoin(corpus).withColumn(
        "d", distance("query_vec", "embedding", "euclidean")
    )
    w = Window.partitionBy("query_id").orderBy("d")

    # rank() has different tie semantics than row_number() — must not match
    by_rank = (
        base.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") <= 5)
        .select("query_id", "vec_id", "d")
    )
    assert rewrite_knn_topk(by_rank) is None

    # keeping the vector payload is not plain kNN output
    keep_payload = base.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 5)
    assert rewrite_knn_topk(keep_payload) is None

    # an equi-join is not the naive cross-join shape
    joined = (
        queries.join(corpus, queries.query_id == corpus.vec_id)
        .withColumn("d", distance("query_vec", "embedding", "euclidean"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("query_id", "vec_id", "d")
    )
    assert rewrite_knn_topk(joined) is None

    # descending order is furthest-first, not kNN
    wd = Window.partitionBy("query_id").orderBy(F.col("d").desc())
    far = (
        base.withColumn("rk", F.row_number().over(wd))
        .filter(F.col("rk") <= 5)
        .select("query_id", "vec_id", "d")
    )
    assert rewrite_knn_topk(far) is None

    # a hand-written non-builder distance expression must not be claimed
    custom = (
        queries.crossJoin(corpus)
        .withColumn(
            "d",
            F.aggregate(
                F.zip_with("query_vec", "embedding", lambda x, y: (x - y) * (x - y) * 2),
                F.lit(0.0),
                lambda a, v: a + v,
            ),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("query_id", "vec_id", "d")
    )
    assert rewrite_knn_topk(custom) is None

    # with_knn_rewrite: unmatched frames come back unchanged
    assert with_knn_rewrite(by_rank) is by_rank


def test_output_roles_resolved_by_exprid_not_name(spark, queries):
    """An id column literally NAMED 'dist', with the distance column
    dropped from the output, must keep its id values — roles are bound
    by exprId, so the name collision is harmless."""
    corpus = spark.range(50).select(
        F.col("id").alias("dist"),
        F.array(*[(F.col("id") * (i + 1)).cast("double") for i in range(4)]).alias(
            "embedding"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("d").asc(), F.col("dist").asc())
    naive = (
        queries.crossJoin(corpus)
        .withColumn("d", distance("query_vec", "embedding", "euclidean"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("query_id", "dist")
    )
    rw = rewrite_knn_topk(naive)
    assert rw is not None
    assert sorted(map(tuple, rw.collect())) == sorted(map(tuple, naive.collect()))


def test_k_outside_request_contract_passes_through(queries, corpus):
    """k > MAX_K is outside the engine's request contract — the rule must
    leave the working naive plan untouched, never raise."""
    w = Window.partitionBy("query_id").orderBy("d")
    naive = (
        queries.crossJoin(corpus)
        .withColumn("d", distance("query_vec", "embedding", "euclidean"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 1500)
        .select("query_id", "vec_id", "d")
    )
    assert match_naive_knn(naive) is None
    assert with_knn_rewrite(naive) is naive


def test_auto_strategy_and_invalid_strategy(queries, corpus):
    naive = _naive(queries, corpus, "euclidean", k=4)
    auto = rewrite_knn_topk(naive, strategy="auto")
    assert sorted(map(tuple, auto.collect())) == sorted(map(tuple, naive.collect()))
    with pytest.raises(ValueError, match="strategy"):
        rewrite_knn_topk(naive, strategy="nope")


def test_with_knn_rewrite_rewrites_when_matched(queries, corpus):
    naive = _naive(queries, corpus, "euclidean")
    out = with_knn_rewrite(naive)
    assert out is not naive
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, naive.collect()))
