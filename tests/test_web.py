"""URL canonicalization + url_dedup (operators/web.py): rule-by-rule
golden cases, idempotence, NULL propagation, and the dedup aggregate's
survivor rule."""

from __future__ import annotations

from pyspark.sql import functions as F

from hnsw_vector_db_spark.operators.web import canonicalize_url, url_dedup

GOLDEN = [
    # every rule at once: scheme+host case, default port, www.,
    # trailing slash, tracking params dropped, survivors sorted, fragment
    (
        "HTTP://WWW.Ex.COM:80/a/b/?utm_source=1&b=2&a=1#x",
        "http://ex.com/a/b?a=1&b=2",
    ),
    # https default port; root path's slash is KEPT (non-root rule only)
    ("https://ex.com:443/", "https://ex.com/"),
    # no path at all -> '/'
    ("http://ex.com", "http://ex.com/"),
    # non-default port kept
    ("https://Ex.com:8443/p", "https://ex.com:8443/p"),
    # :80 on https is NOT the default -> kept
    ("https://ex.com:80/p", "https://ex.com:80/p"),
    # www. stripped only as a leading label
    ("https://sub.www.ex.com/p", "https://sub.www.ex.com/p"),
    # all-tracking query drops the '?' entirely
    ("http://ex.com/p?utm_campaign=x&gclid=1", "http://ex.com/p"),
    # duplicate keys survive and sort byte-wise; path case preserved
    ("http://ex.com/A/B?b=2&a=1&a=0", "http://ex.com/A/B?a=0&a=1&b=2"),
    # valueless param keeps its key; fbclid dropped by exact name
    ("http://ex.com/p?flag&fbclid=Z", "http://ex.com/p?flag"),
    # REPEATED www. labels collapse in one pass (fixpoint, not one strip)
    ("https://www.www.ex.com/p", "https://ex.com/p"),
    # REPEATED trailing slashes collapse in one pass
    ("https://ex.com/a//", "https://ex.com/a"),
    # all-slash path reduces to root
    ("http://ex.com///", "http://ex.com/"),
]


def test_golden_canonical_forms(spark):
    df = spark.createDataFrame([(u,) for u, _ in GOLDEN], "url string")
    got = [
        r["c"]
        for r in df.select(
            canonicalize_url(F.col("url")).alias("c")
        ).collect()
    ]
    assert got == [want for _, want in GOLDEN]


def test_canonicalize_is_idempotent(spark):
    df = spark.createDataFrame([(u,) for u, _ in GOLDEN], "url string")
    once = canonicalize_url(F.col("url")).alias("c1")
    rows = (
        df.select(once)
        .select("c1", canonicalize_url(F.col("c1")).alias("c2"))
        .collect()
    )
    assert all(r["c1"] == r["c2"] for r in rows)


def test_null_propagates(spark):
    df = spark.createDataFrame([(None,)], "url string")
    assert (
        df.select(canonicalize_url(F.col("url")).alias("c")).collect()[0]["c"]
        is None
    )


def test_url_dedup_survivor_rule(spark):
    df = spark.createDataFrame(
        [
            (7, "HTTP://WWW.Ex.COM:80/a?b=2&a=1"),
            (3, "http://ex.com/a/?a=1&utm_s=9&b=2"),
            (9, "https://ex.com/a?a=1&b=2"),  # different scheme -> distinct
        ],
        "doc_id long, url string",
    )
    rows = {r["url_canon"]: r for r in url_dedup(df).collect()}
    assert rows["http://ex.com/a?a=1&b=2"]["n_docs"] == 2
    assert rows["http://ex.com/a?a=1&b=2"]["rep_id"] == 3  # min id survives
    assert rows["https://ex.com/a?a=1&b=2"]["n_docs"] == 1
    assert all(r["host"] == "ex.com" for r in rows.values())


def test_url_dedup_plan_is_one_keyed_agg(spark):
    df = spark.createDataFrame(
        [(1, "http://ex.com/a")], "doc_id long, url string"
    )
    plan = url_dedup(df)._jdf.queryExecution().executedPlan().toString()
    # narrow projection + partial/final HashAggregate pair; no join, no
    # window, no python
    assert "HashAggregate" in plan
    assert "Join" not in plan and "Window" not in plan
    assert "Python" not in plan
