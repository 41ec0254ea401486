"""Web-corpus URL operators — canonicalization and URL-level dedup,
the first gate of a crawl-derived training pipeline: the same page is
typically fetched under dozens of URL spellings (scheme/host case,
default ports, `www.`, trailing slashes, tracking parameters, param
order, fragments), and collapsing those BEFORE content dedup removes
the cheapest duplicate class at key-join cost instead of minhash cost.

Everything is pure Column expression code (regexp/split/array built-ins
inside whole-stage codegen — no UDFs), so canonicalization runs at scan
speed and the result is engine-portable for the DuckDB oracle.

Scale notes (100 TB):
- ``canonicalize_url`` is a narrow projection — zero shuffle; it
  composes with any scan and Catalyst pushes surrounding filters
  through it.
- ``url_dedup`` is ONE keyed aggregation on the canonical string —
  map-side partial combine collapses each task's repeats before the
  exchange, the exact_dedup shape (dedup.py) applied to the URL key.

The reference engine has no web tooling (it stores vectors only);
this module is part of the prompt-mandated training-pipeline tier.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# query parameters that never affect page identity — the standard
# tracking/attribution families stripped by crawl pipelines
DEFAULT_TRACKING_PREFIXES: tuple[str, ...] = ("utm_",)
DEFAULT_TRACKING_PARAMS: tuple[str, ...] = (
    "gclid",
    "fbclid",
    "msclkid",
    "ref",
    "referrer",
)


def canonicalize_url(
    url: Column,
    tracking_prefixes: Sequence[str] = DEFAULT_TRACKING_PREFIXES,
    tracking_params: Sequence[str] = DEFAULT_TRACKING_PARAMS,
) -> Column:
    """Canonical form of an absolute http(s) URL as a Column expression.

    Rules (the common-denominator set of crawl canonicalizers):
      1. drop the fragment (``#...``);
      2. lowercase the scheme and the host (never the path — path case
         is significant per RFC 3986);
      3. strip the default port (``:80`` for http, ``:443`` for https;
         non-default ports are kept);
      4. strip the leading ``www.`` labels from the host (repeated
         ``www.www.`` collapses too — one pass must be a fixpoint);
      5. strip trailing slashes from a non-root path (all of them, so
         ``/a//`` and ``/a/`` agree); empty path becomes ``/``;
      6. drop tracking query parameters (``utm_*`` prefixes and exact
         names like ``gclid``), sort the survivors byte-wise, and drop
         the ``?`` entirely when none survive.

    Idempotent by construction (canon(canon(u)) == canon(u) — pinned in
    tests). NULL input yields NULL.
    """
    no_frag = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(
        F.regexp_extract(no_frag, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1)
    )
    rest = F.regexp_replace(no_frag, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))
    hostport = (
        F.when(
            scheme == F.lit("http"),
            F.regexp_replace(hostport, r":80$", ""),
        )
        .when(
            scheme == F.lit("https"),
            F.regexp_replace(hostport, r":443$", ""),
        )
        .otherwise(hostport)
    )
    host = F.regexp_replace(hostport, r"^(www\.)+", "")
    path = F.regexp_extract(rest, r"^[^/?]*([^?]*)", 1)
    path = F.when(path == F.lit(""), F.lit("/")).otherwise(path)
    path = F.when(
        F.length(path) > 1, F.regexp_replace(path, r"/+$", "")
    ).otherwise(path)
    path = F.when(path == F.lit(""), F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)

    def _keep(p: Column) -> Column:
        key = F.element_at(F.split(p, "=", 2), 1)
        cond = p != F.lit("")
        for pre in tracking_prefixes:
            cond = cond & ~key.startswith(pre)
        for name in tracking_params:
            cond = cond & (key != F.lit(name))
        return cond

    params = F.filter(F.split(query, "&"), _keep)
    canon_q = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(canon_q != F.lit(""), F.concat(F.lit("?"), canon_q)).otherwise(
            F.lit("")
        ),
    )


# block-level elements whose boundaries must become whitespace — text on
# either side of a <div> is separate prose even with no space in the markup
_BLOCK_TAG_RE = (
    r"(?i)</?(?:br|p|div|li|ul|ol|tr|td|th|table|h[1-6]|section|article|"
    r"header|footer|nav|blockquote|pre|hr)\b[^>]*/?>"
)
# the named entities a crawl-text tier must decode; ordering contract:
# &amp; decodes LAST so '&amp;lt;' yields the literal '&lt;' (decoding it
# again would be double-unescaping, the classic injection bug)
_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def _decode_entities(c: Column) -> Column:
    for ent, ch in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def _collapse_ws(c: Column) -> Column:
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def html_extract(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """HTML -> visible text, one stage upstream of WET ingestion — the
    extraction step real crawl curation owns before ``wet_scan`` /
    ``boilerplate_strip`` ever see a byte (a WET file is precisely the
    OUTPUT of this stage, archived).

    Pure chained ``regexp_replace`` Column expressions — JVM regex
    inside whole-stage codegen, a narrow projection with zero shuffle
    and no Python; at 100 TB this runs at scan speed and composes with
    pushed filters. The strip order is part of the contract:

      1. comments (``<!-- -->``, markup view — so commented-out markup
         never resurrects);
      2. ``<script>``/``<style>`` ELEMENTS, contents and all
         (non-greedy to the first real closer) — a tag-only stripper
         would leak JavaScript strings and CSS into the corpus, the
         classic crawl-contamination bug (the driver entry plants a
         fake ``<p>`` inside a script string to prove the order);
      3. the entire ``<head>`` element (metadata, not prose; the page
         title is returned separately);
      4. block-element boundaries -> whitespace (text on either side of
         a ``<div>`` is separate prose even when the markup has no
         space), remaining inline tags -> empty (``bo<b>ld</b>`` stays
         one word);
      5. named-entity decode, ``&amp;`` LAST (``&amp;lt;`` must yield
         the literal ``&lt;``, never ``<`` — double-unescaping is how
         markup injection re-enters a corpus);
      6. whitespace collapse + trim.

    Known limit (documented, not defended): as a regex tier it assumes
    well-formed markup — an UNCLOSED comment opener inside a live
    script body can over-consume to a later ``-->``. Parser-grade
    extraction is a mapInPandas drop-in; the regex tier is the
    zero-dependency codegen path.

    Returns (id_col, *keep_cols, title, text) — ``keep_cols`` ride
    along so downstream stages don't pay an id self-join to recover
    them. NULL html yields NULL title/text.
    """
    h = F.col(html_col)
    title = _collapse_ws(
        _decode_entities(
            F.regexp_extract(h, r"(?is)<title[^>]*>(.*?)</title>", 1)
        )
    )
    t = F.regexp_replace(h, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, r"(?is)<script\b[^>]*>.*?</script>", " ")
    t = F.regexp_replace(t, r"(?is)<style\b[^>]*>.*?</style>", " ")
    t = F.regexp_replace(t, r"(?is)<head\b[^>]*>.*?</head>", " ")
    t = F.regexp_replace(t, _BLOCK_TAG_RE, " ")
    t = F.regexp_replace(t, r"<[^>]*>", "")
    t = _collapse_ws(_decode_entities(t))
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        title.alias("title"),
        t.alias("text"),
    )


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    tracking_prefixes: Sequence[str] = DEFAULT_TRACKING_PREFIXES,
    tracking_params: Sequence[str] = DEFAULT_TRACKING_PARAMS,
) -> DataFrame:
    """URL-level dedup: canonicalize, then ONE keyed aggregation per
    canonical URL — (url_canon, host, n_docs, rep_id) with the minimum
    id as the deterministic representative (the exact_dedup survivor
    rule). Partial aggregation collapses repeats map-side, so the
    shuffle carries one row per distinct canonical URL per task —
    never the raw crawl."""
    canon = canonicalize_url(
        F.col(url_col),
        tracking_prefixes=tracking_prefixes,
        tracking_params=tracking_params,
    )
    host = F.regexp_extract(canon, r"^[a-z][a-z0-9+.\-]*://([^/?]*)", 1)
    return (
        df.select(
            F.col(id_col),
            canon.alias("url_canon"),
            host.alias("host"),
        )
        .groupBy("url_canon", "host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("rep_id"),
        )
    )
