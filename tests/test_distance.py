"""Distance builders vs numpy ground truth + metric axioms (SURVEY.md §5)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

import importlib

D = importlib.import_module("hnsw_vector_db_spark.functions.distance")

RNG = np.random.RandomState(7)


def _pairs(n=20, dim=16):
    return [
        (RNG.randn(dim).tolist(), RNG.randn(dim).tolist()) for _ in range(n)
    ]


@pytest.fixture(scope="module")
def pair_df(spark):
    return spark.createDataFrame(
        _pairs(), "a array<double>, b array<double>"
    ).cache()


def _np_dist(metric, a, b):
    a, b = np.asarray(a), np.asarray(b)
    if metric == "euclidean":
        return float(np.linalg.norm(a - b))
    if metric == "manhattan":
        return float(np.abs(a - b).sum())
    if metric == "dot_product":
        return float(-np.dot(a, b))
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na == 0 or nb == 0:
        return 1.0
    return float(1.0 - np.dot(a, b) / (na * nb))


@pytest.mark.parametrize("metric", ["euclidean", "cosine", "manhattan", "dot_product"])
def test_matches_numpy(pair_df, metric):
    rows = pair_df.withColumn("d", D.distance("a", "b", metric)).collect()
    for r in rows:
        assert r["d"] == pytest.approx(_np_dist(metric, r["a"], r["b"]), abs=1e-9)


def test_zero_norm_guard(spark):
    """Reference graph.py:33-34: cosine vs zero vector -> 1.0."""
    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 2.0])], "a array<double>, b array<double>"
    )
    r = df.select(
        D.cosine("a", "b").alias("c1"), D.cosine("b", "a").alias("c2")
    ).first()
    assert r["c1"] == 1.0 and r["c2"] == 1.0


@pytest.mark.parametrize("metric", ["euclidean", "manhattan", "cosine"])
def test_symmetry_and_identity(pair_df, metric):
    rows = pair_df.select(
        D.distance("a", "b", metric).alias("ab"),
        D.distance("b", "a", metric).alias("ba"),
        D.distance("a", "a", metric).alias("aa"),
    ).collect()
    for r in rows:
        assert r["ab"] == pytest.approx(r["ba"], abs=1e-9)
        assert r["aa"] == pytest.approx(0.0, abs=1e-9)


def test_triangle_inequality(spark):
    trips = [
        (RNG.randn(8).tolist(), RNG.randn(8).tolist(), RNG.randn(8).tolist())
        for _ in range(30)
    ]
    df = spark.createDataFrame(trips, "a array<double>, b array<double>, c array<double>")
    for metric in ["euclidean", "manhattan"]:
        rows = df.select(
            D.distance("a", "b", metric).alias("ab"),
            D.distance("b", "c", metric).alias("bc"),
            D.distance("a", "c", metric).alias("ac"),
        ).collect()
        for r in rows:
            assert r["ac"] <= r["ab"] + r["bc"] + 1e-9


def test_normalize(spark):
    df = spark.createDataFrame([([3.0, 4.0],), ([0.0, 0.0],)], "a array<double>")
    rows = df.select(D.normalize("a").alias("n")).collect()
    assert rows[0]["n"] == pytest.approx([0.6, 0.8])
    assert rows[1]["n"] == [0.0, 0.0]
    # pre-normalized cosine == plain dot distance
    a, b = RNG.randn(8).tolist(), RNG.randn(8).tolist()
    df2 = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
    r = df2.select(
        D.cosine("a", "b").alias("cos"),
        (F.lit(1.0) - D.dot_raw(D.normalize("a"), D.normalize("b"))).alias("dotn"),
    ).first()
    assert r["cos"] == pytest.approx(r["dotn"], abs=1e-9)


def test_unknown_metric_raises():
    with pytest.raises(ValueError, match="unknown metric"):
        D.distance("a", "b", "chebyshev")


def test_squared_euclidean_ordering(pair_df):
    rows = pair_df.select(
        D.euclidean("a", "b").alias("e"), D.squared_euclidean("a", "b").alias("se")
    ).collect()
    for r in rows:
        assert r["se"] == pytest.approx(r["e"] ** 2, rel=1e-9)
