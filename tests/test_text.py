"""Text primitives + analysis operators: known-answer and edge cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hnsw_vector_db_spark.functions import text as T
from hnsw_vector_db_spark.operators import text_analysis as TA


@pytest.fixture(scope="module")
def one(spark):
    return spark.range(1)


def test_poly_hash_known_values(one):
    # 'ab' -> (0*131+97)*131+98 = 12805; '' -> 0
    r = one.select(
        T.poly_hash(F.lit("ab")).alias("ab"),
        T.poly_hash(F.lit("")).alias("empty"),
        T.poly_hash(F.lit("世")).alias("cjk"),
    ).first()
    assert r["ab"] == 97 * 131 + 98
    assert r["empty"] == 0
    assert r["cjk"] == 19990  # unicode codepoint


def test_tokens_collapse_whitespace(one):
    r = one.select(T.tokens(F.lit("  a  b\tc \n")).alias("t")).first()
    assert r["t"] == ["a", "b", "c"]


def test_word_ngrams(one):
    toks = F.array(F.lit("a"), F.lit("b"), F.lit("c"), F.lit("d"))
    r = one.select(T.word_ngrams(toks, 3).alias("g")).first()
    assert r["g"] == ["a b c", "b c d"]
    r2 = one.select(T.word_ngrams(F.array(F.lit("a")), 3).alias("g")).first()
    assert r2["g"] == []


def test_bpe_ish_tokens(one):
    r = one.select(T.bpe_ish_tokens(F.lit("abc123 def!x")).alias("t")).first()
    assert r["t"] == ["abc", "123", "def", "!", "x"]


def test_minhash_params_deterministic():
    assert T.minhash_params(4) == T.minhash_params(4)
    ab = T.minhash_params(8)
    assert len({a for a, _ in ab}) == 8  # distinct coefficients
    assert all(0 < a < T.HASH_MOD and 0 <= b < T.HASH_MOD for a, b in ab)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox and the lazy dog run to the hill"),
        (1, "x y"),
        (2, "el la de que los palabras aqui"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_counts(docs):
    out = {r["doc_id"]: r for r in TA.token_counts(docs).collect()}
    assert out[0]["n_tokens"] == 12
    assert out[1]["n_tokens"] == 2


def test_quality_score_ranges(docs):
    for r in TA.quality_score(docs).collect():
        assert 0.0 <= r["quality"] <= 1.0
        assert 0.0 <= r["punct_ratio"] <= 1.0
    out = {r["doc_id"]: r for r in TA.quality_score(docs).collect()}
    assert out[0]["quality"] > out[1]["quality"]  # too-short doc scores lower


def test_language_id(docs, spark):
    out = {r["doc_id"]: r["pred_lang"] for r in TA.language_id(docs).collect()}
    assert out[0] == "en"
    assert out[2] == "es"
    zh = spark.createDataFrame([(9, "这 是 中文 文本")], "doc_id long, text string")
    assert TA.language_id(zh).first()["pred_lang"] == "zh"


def test_fingerprint_normalization(spark):
    rows = [(0, "Hello  World"), (1, "hello world"), (2, "different")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in TA.fingerprint(df).collect()}
    assert out[0]["fp"] != out[1]["fp"]
    assert out[0]["fp_normalized"] == out[1]["fp_normalized"]
    assert out[0]["fp_normalized"] != out[2]["fp_normalized"]


def test_repetition_stats_flags_spam(spark):
    """A doc that is one phrase repeated scores dup_3gram_ratio near 1
    and top_token_ratio 1/3; diverse text scores near 0."""
    from pyspark.sql import Row

    from hnsw_vector_db_spark.operators.text_analysis import repetition_stats

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="buy cheap now " * 50),
            Row(doc_id=2, text="the quick brown fox jumps over a lazy dog today"),
            Row(doc_id=3, text="xy"),  # < 3 tokens -> ratio 0 by contract
        ]
    )
    got = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert got[1].dup_3gram_ratio > 0.95
    assert abs(got[1].top_token_ratio - 1 / 3) < 1e-6
    assert got[2].dup_3gram_ratio == 0.0
    assert got[2].top_token_ratio < 0.2
    assert got[3].dup_3gram_ratio == 0.0 and got[3].n_tokens == 1


def test_poly_hash_cross_engine_parity_fuzz(spark):
    """The portable hash must agree with its DuckDB twin on arbitrary
    unicode — BMP, CJK, combining marks, and astral-plane (emoji /
    surrogate-pair) inputs — or every hash-based oracle is built on
    sand. 60+ random strings, fixed seed."""
    import random

    import duckdb
    from pyspark.sql import Row

    from hnsw_vector_db_spark.functions.text import poly_hash

    random.seed(7)
    samples = [
        "", "a", "hello world", "héllo", "ümlaut ünïcode", "中文字符串",
        "日本語テキスト", "mixed 中文 and ascii", "tab\tnewline", "😀 emoji",
        "𝕏 math bold astral", "é combining",
    ]
    for _ in range(50):
        samples.append(
            "".join(chr(random.randint(32, 0x2FFF)) for _ in range(random.randint(0, 30)))
        )
    df = spark.createDataFrame([Row(i=i, s=s) for i, s in enumerate(samples)])
    got = {r["i"]: r["h"] for r in df.select("i", poly_hash(F.col("s")).alias("h")).collect()}
    con = duckdb.connect()
    duck_expr = (
        "SELECT CASE WHEN length($1) = 0 THEN 0 ELSE "
        "list_reduce(list_transform(string_split_regex($1, ''), "
        "c -> unicode(c)::BIGINT), (a, c) -> (a * 131 + c) % 2147483647) END"
    )
    for i, s in enumerate(samples):
        assert con.execute(duck_expr, [s]).fetchone()[0] == got[i], repr(s)


# ---- TF-IDF ----------------------------------------------------------------

def test_tfidf_vocabulary_side_never_hint_broadcast(spark):
    """The df table is one row per distinct corpus term — unbounded at
    100 TB — so it must not carry a broadcast HINT. With auto-broadcast
    disabled, only the single-row n_docs aggregate (explicit hint) may
    broadcast; the tf-x-df join must plan as a shuffle join."""
    from hnsw_vector_db_spark.plans.explain import (
        broadcast_join_count,
        physical_plan,
    )

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        docs = spark.createDataFrame(
            [(1, "a b c"), (2, "b c d")], "doc_id long, text string"
        )
        out = TA.tfidf_top_terms(docs, top_k=2)
        plan = physical_plan(out)
        # BroadcastNestedLoopJoin = the hinted single-row n_docs cross join;
        # zero BroadcastHashJoin = the term-keyed df side is NOT hinted.
        assert broadcast_join_count(out) == 1, plan
        assert plan.count("BroadcastHashJoin") == 0, plan
        assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan), plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_tfidf_max_df_cut_is_output_noop_when_loose(spark):
    """With max_df >= N no term is cut, so the result is bit-identical;
    a tight cut excludes high-df terms by policy (the cut is a quality
    dial and MAY change results in general — low-idf high-tf terms can
    hold top_k slots — which is exactly why it is opt-in)."""
    docs = spark.createDataFrame(
        [
            (1, "apple banana apple cherry"),
            (2, "banana cherry cherry date"),
            (3, "apple date date fig"),
        ],
        "doc_id long, text string",
    )
    base = sorted(map(tuple, TA.tfidf_top_terms(docs, top_k=2).collect()))
    loose = sorted(map(tuple, TA.tfidf_top_terms(docs, top_k=2, max_df=3).collect()))
    assert base == loose
    # a tight cut drops ubiquitous terms from contention entirely
    tight = TA.tfidf_top_terms(docs, top_k=2, max_df=1).collect()
    assert all(r["term"] not in () for r in tight)  # smoke: runs and returns
    terms = {r["term"] for r in tight}
    assert "apple" not in terms and "banana" not in terms  # df=2 > 1 cut


# ---- unigram LM quality ----------------------------------------------------

def test_unigram_logprob_known_values(spark):
    """3-doc corpus with hand-computed unigram probabilities: rare-token
    docs score higher (worse) than stereotypical ones."""
    import math

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a b"), (3, "zzz")],
        "doc_id long, text string",
    )
    # corpus counts: a=3, b=2, zzz=1, total=6
    out = {r["doc_id"]: r for r in TA.unigram_logprob(docs).collect()}
    p = {"a": 3 / 6, "b": 2 / 6, "zzz": 1 / 6}
    exp1 = -(2 * math.log(p["a"]) + math.log(p["b"])) / 3
    exp3 = -math.log(p["zzz"])
    assert out[1]["n_tokens"] == 3
    assert abs(out[1]["avg_neg_logprob"] - round(exp1, 6)) < 1e-9
    assert abs(out[3]["avg_neg_logprob"] - round(exp3, 6)) < 1e-9
    assert out[3]["avg_neg_logprob"] > out[1]["avg_neg_logprob"]


def test_unigram_vocab_side_never_hint_broadcast(spark):
    """Same contract as tfidf: the per-term vocabulary is unbounded at
    corpus scale, so only the single-row total may carry a broadcast
    hint; the token-vocab join must plan as a shuffle join."""
    from hnsw_vector_db_spark.plans.explain import (
        broadcast_join_count,
        physical_plan,
    )

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        docs = spark.createDataFrame(
            [(1, "a b c"), (2, "b c d")], "doc_id long, text string"
        )
        out = TA.unigram_logprob(docs)
        plan = physical_plan(out)
        assert broadcast_join_count(out) == 1, plan  # the 1-row total only
        assert plan.count("BroadcastHashJoin") == 0, plan
        assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan), plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


# ---- bigram LM quality -----------------------------------------------------

def test_bigram_logprob_known_values(spark):
    """Hand-computed MLE conditionals; docs with < 2 tokens drop out."""
    import math

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "a c"), (4, "x")],
        "doc_id long, text string",
    )
    # bigram counts: (a b)=3, (b a)=1, (a c)=1; context counts: a.=4, b.=1
    out = {r["doc_id"]: r for r in TA.bigram_logprob(docs).collect()}
    p_ab, p_ba, p_ac = 3 / 4, 1 / 1, 1 / 4
    exp1 = -(2 * math.log(p_ab) + math.log(p_ba)) / 3
    assert out[1]["n_bigrams"] == 3
    assert abs(out[1]["avg_neg_logprob"] - round(exp1, 6)) < 1e-9
    assert abs(out[2]["avg_neg_logprob"] - round(-math.log(p_ab), 6)) < 1e-9
    assert abs(out[3]["avg_neg_logprob"] - round(-math.log(p_ac), 6)) < 1e-9
    assert 4 not in out  # a single-token doc has no bigrams
    # rare continuation scores worse than the stereotypical one
    assert out[3]["avg_neg_logprob"] > out[2]["avg_neg_logprob"]


def test_bigram_joins_never_hint_broadcast(spark):
    """Bigram vocabularies are strictly larger than unigram ones — the
    probability joins must plan as shuffles, with NO hinted broadcast
    anywhere (there is no single-row side in this operator)."""
    from hnsw_vector_db_spark.plans.explain import (
        broadcast_join_count,
        physical_plan,
    )

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        docs = spark.createDataFrame(
            [(1, "a b c"), (2, "b c d")], "doc_id long, text string"
        )
        out = TA.bigram_logprob(docs)
        plan = physical_plan(out)
        assert broadcast_join_count(out) == 0, plan
        assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan), plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


# ---- BM25 ------------------------------------------------------------------

def test_bm25_golden_values(spark):
    """Hand-computed Okapi BM25 on a 3-doc corpus: tf saturation, length
    normalization and idf all verified against the public formula."""
    import math

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana"),        # dl=3, tf(apple)=2
            (2, "apple cherry cherry date"),  # dl=4, tf(apple)=1
            (3, "cherry date date fig fig"),  # dl=5, no apple
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["score"] for r in TA.bm25_score(docs, ["apple"], top_k=10).collect()}
    k1, b = 1.2, 0.75
    n, df, avgdl = 3, 2, 4.0
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))

    def s(tf, dl):
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert set(out) == {1, 2}  # doc 3 has no query term
    assert abs(out[1] - round(s(2, 3), 6)) < 1e-9
    assert abs(out[2] - round(s(1, 4), 6)) < 1e-9
    assert out[1] > out[2]  # higher tf, shorter doc wins


def test_bm25_multi_term_sums_and_topk_plan(spark, sf_dir):
    from hnsw_vector_db_spark.plans.explain import physical_plan
    from hnsw_vector_db_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = TA.bm25_score(docs, ["vector", "hash", "scan"], top_k=5)
    plan = physical_plan(out)
    assert "TakeOrderedAndProject" in plan  # top-k never a full sort
    rows = out.collect()
    assert 0 < len(rows) <= 5
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


# ---- feature-hashing embeddings --------------------------------------------

def test_hash_embed_unit_norm_and_determinism(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma alpha"), (2, "delta"), (3, "   ")],
        "doc_id long, text string",
    )
    import math

    out = {r["doc_id"]: r["embedding"] for r in TA.hash_embed(docs, dim=16).collect()}
    assert 3 not in out  # empty text -> no embedding row
    for v in out.values():
        assert len(v) == 16
        assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-9
    out2 = {r["doc_id"]: r["embedding"] for r in TA.hash_embed(docs, dim=16).collect()}
    assert out == out2  # pure function of the text
    # identical texts embed identically; cosine similarity respects overlap
    docs2 = spark.createDataFrame(
        [(10, "alpha beta gamma alpha")], "doc_id long, text string"
    )
    twin = TA.hash_embed(docs2, dim=16).first()["embedding"]
    assert list(twin) == list(out[1])


def test_hash_embed_similarity_orders_by_token_overlap(spark):
    """A query shares most tokens with doc 1, none with doc 2 — cosine
    against the hash embeddings must rank doc 1 first."""
    from hnsw_vector_db_spark.operators.knn import knn_point

    docs = spark.createDataFrame(
        [(1, "spark vector search engine"), (2, "completely unrelated words here")],
        "doc_id long, text string",
    )
    emb = TA.hash_embed(docs, dim=32)
    q = spark.createDataFrame([(0, "vector search")], "doc_id long, text string")
    qv = [float(x) for x in TA.hash_embed(q, dim=32).first()["embedding"]]
    hits = knn_point(emb, qv, k=2, metric="cosine", id_col="doc_id",
                     vector_col="embedding").collect()
    assert hits[0]["doc_id"] == 1
    assert hits[0]["dist"] < hits[1]["dist"]


def test_hash_embed_components_match_dense_nonzero(spark):
    """The sparse long form must equal the dense vectors' nonzero
    entries exactly (same v / same integer-exact norm) — it exists only
    because exploding the dense arrays re-evaluates the reconstruction
    per generated row (~10x slower, measured)."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma alpha"), (2, "delta epsilon zeta")],
        "doc_id long, text string",
    )
    dense = {
        (r["doc_id"], i): v
        for r in TA.hash_embed(docs, dim=32).collect()
        for i, v in enumerate(r["embedding"])
        if v != 0.0
    }
    comp = {
        (r["doc_id"], r["dim_idx"]): r["value"]
        for r in TA.hash_embed_components(docs, dim=32).collect()
    }
    assert comp == dense


# ---- unicode normalization -------------------------------------------------

def test_normalize_text_forms_and_flags(spark):
    """NFD composes to NFC; accents strip; lowercase applies; NFKC folds
    compatibility chars; nulls pass through; idempotent."""
    docs = spark.createDataFrame(
        [
            (1, "Café NOISE"),     # NFD e + combining acute
            (2, "École"),            # NFC É
            (3, "ﬁne"),              # ﬁ ligature (NFKC folds to fi)
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["norm_text"] for r in TA.normalize_text(docs).collect()}
    assert out[1] == "cafe noise"
    assert out[2] == "ecole"
    assert out[4] is None
    nfkc = {
        r["doc_id"]: r["norm_text"]
        for r in TA.normalize_text(docs, form="NFKC").collect()
    }
    assert nfkc[3] == "fine"
    # keep accents / case when asked
    keep = {
        r["doc_id"]: r["norm_text"]
        for r in TA.normalize_text(
            docs, lowercase=False, strip_accents=False
        ).collect()
    }
    assert keep[1] == "Café NOISE"  # NFD -> NFC composition only
    assert keep[2] == "École"
    # idempotence
    once = TA.normalize_text(docs).withColumnRenamed("norm_text", "text")
    twice = {r["doc_id"]: r["norm_text"] for r in TA.normalize_text(once).collect()}
    assert twice == out


def test_normalize_text_rejects_unknown_form(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="normalization form"):
        TA.normalize_text(docs, form="NFX")


def test_pmi_collocations_known_answer(spark):
    """A deliberately repeated phrase out-scores a phrase whose words
    are individually common; bigrams under min_count never appear; the
    PMI value matches the hand computation."""
    import math

    # "alpha beta" appears 5x and its words appear ONLY together;
    # "the cat" appears 5x but "the" also appears with other words.
    docs = [
        (1, "alpha beta " * 5 + "the cat sat"),
        (2, "the cat ran and the cat hid and the cat slept"),
        (3, "the dog the bird the fish " + "the cat " * 2),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = TA.pmi_collocations(df, min_count=5, top_k=10).collect()
    by_bigram = {r["bigram"]: r for r in out}
    assert "alpha beta" in by_bigram and "the cat" in by_bigram
    assert by_bigram["alpha beta"]["pmi"] > by_bigram["the cat"]["pmi"]
    assert by_bigram["alpha beta"]["rank"] == 1
    # hand computation for "alpha beta"
    toks = [t for _, text in docs for t in text.split()]
    bigrams = []
    for _, text in docs:
        ws = text.split()
        bigrams += [f"{a} {b}" for a, b in zip(ws, ws[1:])]
    T, B = len(toks), len(bigrams)
    c_ab = bigrams.count("alpha beta")
    c_a, c_b = toks.count("alpha"), toks.count("beta")
    expect = round(math.log((c_ab / B) / ((c_a / T) * (c_b / T))), 6)
    assert by_bigram["alpha beta"]["pmi"] == expect
    assert by_bigram["alpha beta"]["n_pair"] == 5
    # nothing below min_count
    assert all(r["n_pair"] >= 5 for r in out)


# ---- Kneser-Ney bigram LM ---------------------------------------------------

def _kn_p(c_ab, ctx, n1_fwd, n1_rev, n_types, d=0.75):
    return max(c_ab - d, 0.0) / ctx + d * n1_fwd / ctx * n1_rev / n_types


def test_kneser_ney_known_values(spark):
    """Hand-computed interpolated KN on a 3-doc corpus."""
    import math

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "a c"), (4, "x")],
        "doc_id long, text string",
    )
    # bigram types: (a b) c=3, (b a) c=1, (a c) c=1 -> n_types=3
    # contexts: a: ctx=4, N1+(a,.)=2 ; b: ctx=1, N1+(b,.)=1
    # continuations: N1+(.,b)=1, N1+(.,a)=1, N1+(.,c)=1
    p_ab = _kn_p(3, 4, 2, 1, 3)
    p_ba = _kn_p(1, 1, 1, 1, 3)
    p_ac = _kn_p(1, 4, 2, 1, 3)
    out = {r["doc_id"]: r for r in TA.kneser_ney_logprob(docs).collect()}
    exp1 = -(2 * math.log(p_ab) + math.log(p_ba)) / 3
    exp2 = -math.log(p_ab)
    exp3 = -math.log(p_ac)
    assert abs(out[1]["avg_neg_logprob"] - round(exp1, 6)) < 1e-9
    assert abs(out[2]["avg_neg_logprob"] - round(exp2, 6)) < 1e-9
    assert abs(out[3]["avg_neg_logprob"] - round(exp3, 6)) < 1e-9
    assert 4 not in out  # < 2 tokens -> no bigrams
    assert out[1]["n_bigrams"] == 3


def test_kneser_ney_distribution_normalizes(spark):
    """For every context a, sum over the FULL vocab of P(b|a) == 1 —
    the defining property interpolated KN must keep after discounting
    (mass removed from seen pairs returns via lam(a) * Pcont)."""
    import math

    docs = spark.createDataFrame(
        [(1, "a b a b c a"), (2, "b c a c"), (3, "c a b a")],
        "doc_id long, text string",
    )
    rows = docs.collect()
    from collections import Counter
    bi = Counter()
    for r in rows:
        t = r["text"].split()
        for x, y in zip(t, t[1:]):
            bi[(x, y)] += 1
    n_types = len(bi)
    ctx_cnt = Counter(); n1_fwd = Counter(); n1_rev = Counter()
    for (a, b), c in bi.items():
        ctx_cnt[a] += c; n1_fwd[a] += 1; n1_rev[b] += 1
    # cross-check the python model against the operator on one bigram
    out = {r["doc_id"]: r for r in TA.kneser_ney_logprob(docs).collect()}
    assert out  # operator ran
    vocab = {t for r in rows for t in r["text"].split()}
    # vocab tokens that never appear as a continuation get Pcont=0 here;
    # KN normalization holds over the continuation-supported vocab
    for a in ctx_cnt:
        total = 0.0
        for b in vocab:
            c_ab = bi.get((a, b), 0)
            total += _kn_p(c_ab, ctx_cnt[a], n1_fwd[a], n1_rev.get(b, 0), n_types)
        assert abs(total - 1.0) < 1e-12, (a, total)


def test_kneser_ney_validates_discount(spark):
    import pytest as _pytest

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        TA.kneser_ney_logprob(docs, discount=0.0)
    with _pytest.raises(ValueError):
        TA.kneser_ney_logprob(docs, discount=1.0)


# ---- window_chunks: built-in plan vs UDTF capability proof -----------------

def test_window_chunks_builtin_equals_udtf(spark, docs):
    """The r7 built-in plan (sequence/posexplode/slice — the benched
    driver entry) must be row-identical to the Python-UDTF form it
    replaced, including chunk_idx enumeration and the short final
    window."""
    sample = docs.limit(60)
    a = sorted(
        map(tuple, TA.window_chunks(sample, width=32, stride=24).collect())
    )
    b = sorted(
        map(
            tuple,
            TA.window_chunks(sample, width=32, stride=24, impl="udtf").collect(),
        )
    )
    assert a == b and a


def test_window_chunks_builtin_edge_cases(spark):
    """Zero-token and NULL docs emit no rows (UDTF generator parity);
    a doc shorter than width yields exactly one short chunk."""
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "   "), (3, None), (4, "")],
        "doc_id long, text string",
    )
    rows = TA.window_chunks(df, width=5, stride=3).collect()
    assert [(r["doc_id"], r["chunk_idx"], r["chunk"], r["n_words"]) for r in rows] == [
        (1, 0, "a b c", 3)
    ]
    # overlapping windows enumerate 0,1,2... at each stride offset
    df2 = spark.createDataFrame([(7, "w1 w2 w3 w4 w5")], "doc_id long, text string")
    got = sorted(
        (r["chunk_idx"], r["chunk"], r["n_words"])
        for r in TA.window_chunks(df2, width=3, stride=2).collect()
    )
    assert got == [(0, "w1 w2 w3", 3), (1, "w3 w4 w5", 3), (2, "w5", 1)]


def test_window_chunks_validates_params(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        TA.window_chunks(df, width=0)
    with _pytest.raises(ValueError):
        TA.window_chunks(df, stride=0)
    with _pytest.raises(ValueError):
        TA.window_chunks(df, impl="nope")


# ---- Arrow-vectorized hash twins (r12 optimization round) ------------------

def test_poly_hash_bulk_matches_hof_fold(spark):
    """poly_hash_bulk is the NumPy twin the fingerprint tier swaps in
    for whole-document hashing: it must agree with the interpreted HOF
    fold VALUE-FOR-VALUE on the same adversarial unicode set the
    cross-engine fuzz pins (BMP, CJK, astral plane), plus NULL and
    empty-string edges."""
    import random

    from pyspark.sql import Row

    from hnsw_vector_db_spark.functions.text import poly_hash, poly_hash_bulk

    random.seed(11)
    samples = [
        "", "a", "hello world", "héllo", "中文字符串", "😀 emoji",
        "𝕏 math bold astral", None, " ", "\t\n",
    ]
    for _ in range(60):
        samples.append(
            "".join(
                chr(random.randint(32, 0x2FFF))
                for _ in range(random.randint(0, 40))
            )
        )
    df = spark.createDataFrame(
        [Row(i=i, s=s) for i, s in enumerate(samples)],
        "i long, s string",
    )
    bad = df.select(
        poly_hash(F.col("s")).alias("a"),
        poly_hash_bulk(F.col("s")).alias("b"),
    ).filter(~F.col("a").eqNullSafe(F.col("b")))
    assert bad.count() == 0


def test_poly_fold_ids_bulk_matches_hof_fold(spark):
    """poly_fold_ids_bulk (the entry's token-stream seq_hash) must
    reproduce the higher-order aggregate fold exactly: empty array -> 0,
    NULL array -> NULL, NULL element -> NULL, and the same integer
    recurrence on random id streams up to vocab-scale values."""
    import random

    from pyspark.sql import Row

    from hnsw_vector_db_spark.functions.text import (
        HASH_MOD,
        poly_fold_ids_bulk,
    )

    random.seed(13)
    rows = [
        Row(i=0, ids=[]),
        Row(i=1, ids=None),
        Row(i=2, ids=[0]),
        Row(i=3, ids=[65535] * 128),
        Row(i=4, ids=[7, None, 9]),
    ]
    for i in range(60):
        rows.append(
            Row(
                i=5 + i,
                ids=[
                    random.randint(0, 70000)
                    for _ in range(random.randint(0, 200))
                ],
            )
        )
    df = spark.createDataFrame(rows, "i long, ids array<long>")
    hof = F.aggregate(
        F.col("ids"),
        F.lit(0).cast("long"),
        lambda a, x: (a * 131 + x + 1) % HASH_MOD,
    )
    bad = df.select(
        hof.alias("a"), poly_fold_ids_bulk(F.col("ids")).alias("b")
    ).filter(~F.col("a").eqNullSafe(F.col("b")))
    assert bad.count() == 0


def test_minhash_mins_bulk_matches_hof_form(spark):
    """The fused Arrow minhash kernel must reproduce the r11 HOF
    expression form value-for-value: hash each shingle with the
    portable char fold, take min((a_i*h + b_i) % mod) per permutation
    — including the empty-set (all-NULL minima) and NULL-array edges."""
    import random

    from pyspark.sql import Row

    from hnsw_vector_db_spark.functions.text import (
        minhash_mins_bulk,
        minhash_params,
        minhash_perm,
        poly_hash,
    )

    random.seed(19)
    k = 16
    rows = [Row(i=0, sh=[]), Row(i=1, sh=None), Row(i=2, sh=["a b c"])]
    for i in range(40):
        rows.append(
            Row(
                i=3 + i,
                sh=[
                    " ".join(
                        "".join(
                            chr(random.randint(97, 0x2FF))
                            for _ in range(random.randint(1, 8))
                        )
                        for _ in range(3)
                    )
                    for _ in range(random.randint(1, 30))
                ],
            )
        )
    df = spark.createDataFrame(rows, "i long, sh array<string>")
    hs = F.transform("sh", lambda s: poly_hash(s))
    params = minhash_params(k, 42)

    def _mk(a, b):
        # closure, not default-arg lambda: pyspark reads the callable's
        # arity to bind lambda variables
        return F.array_min(F.transform(hs, lambda h: minhash_perm(h, a, b)))

    hof_mins = F.array(*[_mk(a, b) for (a, b) in params])
    bad = df.select(
        F.when(F.col("sh").isNull(), F.lit(None)).otherwise(hof_mins).alias("a"),
        minhash_mins_bulk("sh", k).alias("b"),
    ).filter(~F.col("a").eqNullSafe(F.col("b")))
    assert bad.count() == 0
