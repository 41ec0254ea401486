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


# ---------------------------------------------------------------------------
# html_extract golden cases
# ---------------------------------------------------------------------------

def _extract_one(spark, html: str) -> tuple[str, str]:
    from hnsw_vector_db_spark.operators.web import html_extract

    df = spark.createDataFrame([(0, html)], "doc_id long, html string")
    r = html_extract(df).collect()[0]
    return r["title"], r["text"]


def test_html_extract_basic(spark):
    title, text = _extract_one(
        spark,
        "<html><head><title>T</title></head>"
        "<body><h1>Hi</h1><p>one two</p></body></html>",
    )
    assert title == "T"
    assert text == "Hi one two"


def test_html_extract_script_string_never_leaks(spark):
    _, text = _extract_one(
        spark,
        '<body><script>var x = "<p>FAKE</p>"; if (a < b) {}</script>'
        "<p>real</p></body>",
    )
    assert text == "real"


def test_html_extract_style_and_comment_dead(spark):
    _, text = _extract_one(
        spark,
        "<body><!-- <p>commented out</p> --><style>p { color: red }"
        "</style><p>kept</p></body>",
    )
    assert text == "kept"


def test_html_extract_block_vs_inline_tags(spark):
    _, text = _extract_one(
        spark, "<body>top<div>mid</div>bo<b>ld</b></body>"
    )
    # block boundary separates words even with no markup whitespace;
    # inline tags vanish without splitting the word
    assert text == "top mid bold"


def test_html_extract_entities(spark):
    _, text = _extract_one(
        spark,
        "<p>1 &lt; 2 &amp; &quot;q&quot; &#39;a&#39;&nbsp;end "
        "&amp;lt;literal</p>",
    )
    # &amp; decodes LAST: '&amp;lt;' is the literal text '&lt;', never '<'
    assert text == "1 < 2 & \"q\" 'a' end &lt;literal"


def test_html_extract_title_entity_decode_and_null(spark):
    from hnsw_vector_db_spark.operators.web import html_extract

    df = spark.createDataFrame(
        [(0, "<head><title> A &amp; B </title></head><p>x</p>"), (1, None)],
        "doc_id long, html string",
    )
    rows = {r["doc_id"]: r for r in html_extract(df).collect()}
    assert rows[0]["title"] == "A & B"
    assert rows[0]["text"] == "x"
    assert rows[1]["title"] is None and rows[1]["text"] is None


def test_html_extract_plan_is_pure_codegen(spark):
    from hnsw_vector_db_spark.operators.web import html_extract

    df = spark.createDataFrame([(0, "<p>x</p>")], "doc_id long, html string")
    plan = html_extract(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert "Exchange" not in plan  # narrow projection, zero shuffle
