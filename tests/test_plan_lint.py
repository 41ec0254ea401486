"""The scale linter: each rule proven on a deliberately bad plan, and the
flagship queries kept clean (the executable form of this repo's plan-review
checklist — tfidf's corpus-vocabulary broadcast would have been caught)."""

import pytest
from pyspark.sql import functions as F

from hnsw_vector_db_spark.plans.lint import assert_scale_clean, lint_plan


@pytest.fixture(scope="module")
def tables(spark):
    a = spark.range(100).select(F.col("id"), (F.col("id") % 5).alias("k"))
    b = spark.range(40).select(F.col("id").alias("id2"), (F.col("id") % 5).alias("k"))
    return a, b


def _rules(df, level=None):
    return [
        f.rule for f in lint_plan(df) if level is None or f.level == level
    ]


def test_cartesian_product_flagged(spark, tables):
    a, b = tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bad = a.crossJoin(b)
        assert "cartesian-product" in _rules(bad, "error")
        with pytest.raises(AssertionError, match="cartesian-product"):
            assert_scale_clean(bad)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_hinted_broadcast_of_unfiltered_keyed_aggregate_is_error(tables):
    """The tfidf bug shape: broadcast() hint over a whole-domain groupBy."""
    a, b = tables
    vocab = a.groupBy("k").agg(F.count(F.lit(1)).alias("cnt"))
    bad = a.join(F.broadcast(vocab), "k")
    assert "hinted-broadcast-agg" in _rules(bad, "error")
    with pytest.raises(AssertionError, match="hinted-broadcast-agg"):
        assert_scale_clean(bad)


def test_incidental_row_filter_does_not_excuse_the_broadcast(tables):
    """A filter that reduces ROWS but not DISTINCT KEYS (non-null gates,
    quality cuts — present in nearly every real pipeline) must not
    downgrade the error: only a filter on the grouping key's own
    attributes, or on the aggregate's output, bounds the broadcast."""
    a, _ = tables
    vocab = (
        a.filter(F.col("id").isNotNull())   # incidental: not on key k
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    bad = a.join(F.broadcast(vocab), "k")
    assert "hinted-broadcast-agg" in _rules(bad, "error")


def test_post_aggregate_output_filter_is_warning(tables):
    """The exact-dedup collided shape: filtering the aggregate's OUTPUT
    (count > 1) subsets the broadcast itself — review, not rewrite."""
    a, _ = tables
    collided = (
        a.groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
    )
    df = a.join(F.broadcast(collided), "k")
    assert "hinted-broadcast-agg" in _rules(df, "warning")
    assert "hinted-broadcast-agg" not in _rules(df, "error")


def test_hinted_broadcast_of_filtered_keyed_aggregate_is_warning(tables):
    """The bm25 shape: the key domain is filtered before aggregating —
    the hint asserts boundedness, so the linter asks for review, not
    a rewrite."""
    a, b = tables
    vocab = (
        a.filter(F.col("k").isin(1, 2))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    df = a.join(F.broadcast(vocab), "k")
    assert "hinted-broadcast-agg" in _rules(df, "warning")
    assert "hinted-broadcast-agg" not in _rules(df, "error")
    assert_scale_clean(df)


def test_unhinted_planner_broadcast_never_flags(tables):
    """A stats-chosen broadcast (no hint) is AQE-revisable — must not
    flag even over a keyed aggregate."""
    a, b = tables
    vocab = a.groupBy("k").agg(F.count(F.lit(1)).alias("cnt"))
    df = a.join(vocab, "k")  # planner may broadcast; no hint
    assert "hinted-broadcast-agg" not in _rules(df)


def test_broadcast_of_keyless_aggregate_allowed(tables):
    """The n_docs pattern: a single-row global aggregate broadcast is the
    sanctioned use — must NOT flag."""
    a, _ = tables
    total = a.agg(F.count(F.lit(1)).alias("n"))
    ok = a.join(F.broadcast(total))
    assert "hinted-broadcast-agg" not in _rules(ok)
    # the nested-loop join itself is only a warning
    assert_scale_clean(ok)
    # ...even when the single row is computed OVER a keyed vocabulary
    # (the unigram `total` shape): the broadcast ships the one-row
    # OUTPUT, not its lineage
    vocab_total = (
        a.groupBy("k").agg(F.count(F.lit(1)).alias("cnt")).agg(F.sum("cnt").alias("n"))
    )
    ok2 = a.join(F.broadcast(vocab_total))
    assert "hinted-broadcast-agg" not in _rules(ok2)


def test_row_python_udf_flagged(spark, tables):
    from pyspark.sql.functions import udf

    a, _ = tables
    prev = spark.conf.get("spark.sql.execution.pythonUDF.arrow.enabled", "false")
    spark.conf.set("spark.sql.execution.pythonUDF.arrow.enabled", "false")
    try:
        inc = udf(lambda x: x + 1, "long")
        bad = a.select(inc("id").alias("v"))
        assert "row-python-udf" in _rules(bad, "error")
    finally:
        spark.conf.set("spark.sql.execution.pythonUDF.arrow.enabled", prev)


def test_pandas_boundary_is_info_not_error(spark, tables):
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    a, _ = tables

    @pandas_udf("long")
    def inc(s: pd.Series) -> pd.Series:
        return s + 1

    df = a.select(inc("id").alias("v"))
    assert "arrow-python-udf" in _rules(df, "info")
    assert_scale_clean(df)  # info never fails


def test_allowlist(spark, tables):
    a, b = tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bad = a.crossJoin(b)
        assert_scale_clean(bad, allow=("cartesian-product",))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_every_benched_query_lints_clean(spark, sf_dir):
    """EVERY query bench.py reports a number for must pass the linter —
    the executable form of the per-round plan audit. First run of this
    sweep caught a real one: stratified_sample's weights-broadcast hint
    (bounded for language recipes, unbounded for url-host strata),
    since dropped in favor of the planner's stats decision."""
    import bench
    import __spark_entry__ as em

    qs = em.queries()
    failures = []
    for names in bench.GROUPS.values():
        for name in names:
            try:
                assert_scale_clean(qs[name](spark, sf_dir))
            except AssertionError as ex:
                failures.append(f"{name}: {ex}")
    assert not failures, "\n".join(failures)
