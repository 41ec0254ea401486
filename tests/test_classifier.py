"""Trainable quality classifier (operators/classifier.py): gradient
correctness vs a numpy twin, AUC identity on hand-checked rankings, and
the end-to-end planted-marker entry contract."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from hnsw_vector_db_spark.operators.classifier import (
    logreg_score,
    logreg_train,
    quality_classifier,
    rank_auc,
)

SF = "/root/testdata/sf0.001"


def _toy(spark, n=40, dim=4, seed=3):
    rng = np.random.RandomState(seed)
    X = rng.randn(n, dim)
    w_true = np.array([2.0, -1.5, 0.0, 0.5])
    y = (X @ w_true > 0).astype(float)
    rows = [(i, [float(v) for v in X[i]], float(y[i])) for i in range(n)]
    df = spark.createDataFrame(
        rows, "doc_id long, embedding array<double>, y double"
    )
    return df, X, y


def test_logreg_gradient_matches_numpy_twin(spark):
    """Spark's keyed-agg gradient loop == the same math in numpy, to
    float precision, iteration for iteration."""
    df, X, y = _toy(spark)
    w_spark = logreg_train(df, n_iters=4, lr=2.0, dim=4)
    w_np = np.zeros(4)
    for _ in range(4):
        p = 1.0 / (1.0 + np.exp(-(X @ w_np)))
        w_np -= 2.0 * (X.T @ (p - y)) / len(y)
    assert np.allclose(w_spark, w_np, atol=1e-9), (w_spark, w_np)


def test_logreg_learns_separable_toy(spark):
    """On linearly separable data the trained model must rank perfectly
    (AUC == 1.0 on the training set)."""
    df, X, y = _toy(spark)
    w = logreg_train(df, n_iters=10, lr=5.0, dim=4)
    scored = logreg_score(df, w).join(df.select("doc_id", "y"), "doc_id")
    row = rank_auc(scored).first()
    assert row["auc"] == pytest.approx(1.0)
    assert row["n_pos"] + row["n_neg"] == 40


def test_rank_auc_hand_checked(spark):
    """AUC via the rank-sum identity on a hand-computed example:
    scores 4,3,2,1 with labels 1,0,1,0 -> positives rank 4 and 2,
    AUC = (6 - 3) / (2*2) = 0.75."""
    df = spark.createDataFrame(
        [(1, 4.0, 1.0), (2, 3.0, 0.0), (3, 2.0, 1.0), (4, 1.0, 0.0)],
        "doc_id long, margin double, y double",
    )
    assert rank_auc(df).first()["auc"] == pytest.approx(0.75)


def test_logreg_validates_params(spark):
    df, _, _ = _toy(spark)
    with pytest.raises(ValueError):
        logreg_train(df, n_iters=0)
    with pytest.raises(ValueError):
        logreg_train(df, lr=0.0)
    with pytest.raises(ValueError):
        logreg_train(df.filter(F.col("doc_id") < 0), n_iters=1, dim=4)


def test_quality_classifier_planted_marker_end_to_end(spark):
    """The driver entry's shape on real testdata: 256 weight rows +
    4 summary rows, auc_ok true (planted 'spark' marker is learnable —
    measured 0.86-0.95 across SFs vs 0.5 for the random lang label)."""
    from hnsw_vector_db_spark.sources.parquet import load_table

    docs = load_table(spark, SF, "documents")
    label = F.array_contains(
        F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != ""), "spark"
    )
    out = quality_classifier(docs, label, dim=256, n_iters=8, lr=5.0).collect()
    parts = {}
    for r in out:
        parts.setdefault(r["part"], []).append((r["idx"], r["value"]))
    assert len(parts["weight"]) == 256
    assert parts["auc_ok"] == [(-1, 1.0)]
    assert 0.8 <= parts["auc"][0][1] <= 1.0
    # nonzero model: training actually moved weights
    assert any(v != 0.0 for _, v in parts["weight"])


def test_sample_filter_is_deterministic_and_nested(spark):
    """Hash-sample membership is a pure function of (id, salt): two runs
    agree exactly, raising frac only ADDS rows (nested samples), and the
    selected fraction lands near frac."""
    from hnsw_vector_db_spark.operators.classifier import sample_filter

    df = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    s1 = {r["doc_id"] for r in df.filter(sample_filter("doc_id", 0.3)).collect()}
    s2 = {r["doc_id"] for r in df.filter(sample_filter("doc_id", 0.3)).collect()}
    assert s1 == s2
    s_big = {r["doc_id"] for r in df.filter(sample_filter("doc_id", 0.6)).collect()}
    assert s1 <= s_big
    assert 0.2 < len(s1) / 2000 < 0.4 and 0.5 < len(s_big) / 2000 < 0.7
    with pytest.raises(ValueError):
        sample_filter("doc_id", 0.0)
    with pytest.raises(ValueError):
        sample_filter("doc_id", 1.1)


def test_logreg_sampled_equals_manual_subset(spark):
    """logreg_train(sample_frac=f) == logreg_train on the pre-filtered
    subset — sampling only selects rows, never changes the math."""
    from hnsw_vector_db_spark.operators.classifier import sample_filter

    df, _, _ = _toy(spark, n=80)
    w_s = logreg_train(df, n_iters=3, lr=2.0, dim=4, sample_frac=0.5)
    manual = df.filter(sample_filter("doc_id", 0.5))
    assert manual.count() < 80
    w_m = logreg_train(manual, n_iters=3, lr=2.0, dim=4)
    assert w_s == w_m


def test_quality_classifier_sampled_holdout_stays_full(spark):
    """sample_frac shrinks only the TRAIN side: holdout class counts
    (n_pos + n_neg) must equal the full-batch run's — score everything,
    train on a sample."""
    from hnsw_vector_db_spark.sources.parquet import load_table

    docs = load_table(spark, SF, "documents")
    label = F.array_contains(
        F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != ""), "spark"
    )
    full = {r["part"]: r["value"] for r in quality_classifier(
        docs, label, dim=64, n_iters=2, lr=5.0).filter("part != 'weight'").collect()}
    samp = {r["part"]: r["value"] for r in quality_classifier(
        docs, label, dim=64, n_iters=2, lr=5.0, sample_frac=0.5,
    ).filter("part != 'weight'").collect()}
    assert (samp["n_pos"], samp["n_neg"]) == (full["n_pos"], full["n_neg"])


def test_margin_chain_matches_hof_fold_bitwise(spark):
    """r12 optimization: _margin moved from a zip_with+aggregate HOF
    fold to a chained codegen sum. The chain must be BIT-identical
    (same IEEE op order) — the oracle replays every learned weight at
    6dp, so even last-ulp drift is a correctness risk. Also pins the
    zero-weight skip: terms with w_j == 0.0 contribute exactly nothing
    from a +0.0 accumulator."""
    import random

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from hnsw_vector_db_spark.operators.classifier import _margin

    random.seed(17)
    dim = 64
    rows = []
    for i in range(50):
        rows.append(
            Row(
                i=i,
                embedding=[
                    random.uniform(-1, 1) if random.random() > 0.2 else 0.0
                    for _ in range(dim)
                ],
            )
        )
    df = spark.createDataFrame(rows, "i long, embedding array<double>")
    for trial in range(4):
        w = [
            random.uniform(-5, 5) if random.random() > 0.3 else 0.0
            for _ in range(dim)
        ]
        if trial == 0:
            w = [0.0] * dim  # iteration-1 shape: all-zero weights
        wlit = F.array(*[F.lit(float(x)) for x in w])
        hof = F.aggregate(
            F.zip_with(F.col("embedding"), wlit, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bad = df.select(hof.alias("a"), _margin(w).alias("b")).filter(
            ~F.col("a").eqNullSafe(F.col("b"))
        )
        assert bad.count() == 0, f"trial {trial}: margin chain diverged"
