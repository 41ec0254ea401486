"""BPE tokenizer training: the learned merge sequence must equal an
independent textbook implementation (Sennrich et al., ACL 2016, Alg. 1)
— supports included — on both a crafted corpus and the real documents
table."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from hnsw_vector_db_spark.operators import bpe
from hnsw_vector_db_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


def ref_bpe(word_freqs: dict[str, int], n: int) -> list[tuple[str, str, int]]:
    """Textbook BPE: greedy most-frequent adjacent pair, tie-break
    (count desc, left asc, right asc), leftmost-non-overlapping apply."""
    seg = {w: tuple(list(w) + [bpe.END]) for w in word_freqs}
    out: list[tuple[str, str, int]] = []
    for _ in range(n):
        pc: Counter = Counter()
        for w, f in word_freqs.items():
            s = seg[w]
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if c < 2:
            break
        out.append((a, b, c))
        for w in seg:
            s, i, ns = list(seg[w]), 0, []
            while i < len(s):
                if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            seg[w] = tuple(ns)
    return out


def test_bpe_train_matches_textbook_on_classic_corpus(spark):
    """The Sennrich paper's own example shape (low/lower/newest/widest)."""
    text = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = bpe.bpe_train(docs, n_merges=10)
    wf = Counter(text.split())
    assert got == ref_bpe(wf, 10)
    # first merge of this corpus is famously ('e','s') with support 9
    assert got[0] == ("e", "s", 9)


def test_bpe_train_matches_textbook_on_real_corpus(spark):
    """Full merge-sequence equality (pairs AND supports) on the real
    documents table — the strongest statement short of a SQL oracle,
    which an iterative argmax cannot be."""
    docs = load_table(spark, SF, "documents")
    wf = Counter(
        t
        for r in docs.select("text").collect()
        for t in r["text"].split()
    )
    got = bpe.bpe_train(docs, n_merges=16)
    assert got == ref_bpe(wf, 16)
    # support sequence is non-increasing (merge can only create pairs
    # bounded by its own support)
    sups = [c for _, _, c in got]
    assert all(a >= b for a, b in zip(sups, sups[1:]))


def test_bpe_segment_compression_consistency(spark):
    text = " ".join(["low"] * 5 + ["newest"] * 6)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    merges = bpe.bpe_train(docs, n_merges=8)
    row = bpe.bpe_segment(docs, merges).first()
    assert row["n_words"] == 11
    assert row["n_chars"] == 5 * 3 + 6 * 6
    # every word compresses to at least 1 symbol and at most chars+1
    assert row["n_words"] <= row["n_subwords"] <= row["n_chars"] + row["n_words"]
    # with enough merges the classic corpus collapses to ~1 symbol/word
    assert row["n_subwords"] <= 2 * row["n_words"]
    assert row["compression"] > 1.0


def test_bpe_validates_params(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bpe.bpe_train(docs, n_merges=0)


def test_tokenizer_stats_fallback_rate_hand_computed(spark):
    """One source, one doc 'low low lower'. This implementation keeps
    '</w>' as a STANDALONE initial symbol (classic Sennrich), so with
    merges (l,o) then (w,</w>): 'low' -> [lo, w</w>] (1 single: 'w');
    'lower' -> [lo, w, e, r, </w>] (singles w/e/r; the bare '</w>'
    marker has empty visible text and is NOT a fallback). Totals with
    tf(low)=2: 9 subwords, 5 singles."""
    docs = spark.createDataFrame(
        [(1, "low low lower", "a")], "doc_id long, text string, source string"
    )
    row = bpe.tokenizer_stats(docs, [("l", "o"), ("w", "</w>")]).first()
    assert row["source"] == "a"
    assert row["n_docs"] == 1
    assert row["n_words"] == 3
    assert row["n_chars"] == 11
    assert row["n_subwords"] == 2 * 2 + 5
    assert row["fallback_rate"] == round(5 / 9, 6)
    assert abs(row["chars_per_token"] - round(11 / 9, 6)) < 1e-9


def test_tokenizer_stats_separates_sources(spark):
    """Fallback differs per source when the vocabulary fits one source
    and not the other — the signal the report exists to surface.
    'low' fully fuses through (l,o)(lo,w)(low,</w>) -> zero fallback;
    zebra/quartz never merge -> 11 single chars over 13 symbols (the
    two bare '</w>' markers are not singles)."""
    docs = spark.createDataFrame(
        [(1, "low low low", "fits"), (2, "zebra quartz", "foreign")],
        "doc_id long, text string, source string",
    )
    rows = {
        r["source"]: r
        for r in bpe.tokenizer_stats(
            docs, [("l", "o"), ("lo", "w"), ("low", "</w>")]
        ).collect()
    }
    assert rows["fits"]["fallback_rate"] == 0.0
    assert rows["foreign"]["fallback_rate"] == round(11 / 13, 6)


def test_bpe_train_collect_guard_raises_with_advice(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="max_collect"):
        bpe.bpe_train(docs, n_merges=2, max_collect_words=3)


# ---------------------------------------------------------------------------
# byte-level tier
# ---------------------------------------------------------------------------


def test_byte_char_table_is_a_bijection():
    t = bpe.byte_char_table()
    assert len(t) == 256
    assert len(set(t.values())) == 256
    # printable latin-1 maps to itself; others land at 256+
    assert t[ord("A")] == "A" and t[ord("!")] == "!"
    assert ord(t[0x20]) >= 256 and ord(t[0x0A]) >= 256


UGLY = [
    (1, "the cat sat on the mat"),
    (2, "naïve café — résumé 😀 日本語テスト"),
    (3, "  leading and   multiple\tspaces\nnewlines  "),
    (4, ""),
    (5, "tabs\t\tand\r\nCRLF plus ctrl\x01byte"),
]


def test_byte_bpe_roundtrip_is_lossless_on_hostile_text(spark):
    """decode(encode(text)) == text exactly — unicode, control chars,
    repeated whitespace, CRLF, and the empty document included."""
    docs = spark.createDataFrame(UGLY, "doc_id long, text string")
    merges = bpe.byte_bpe_train(docs, n_merges=12)
    ids_df, vocab = bpe.byte_bpe_encode(docs, merges)
    got = {
        r["doc_id"]: r["text"]
        for r in bpe.byte_bpe_decode(ids_df, merges).collect()
    }
    assert got == dict(UGLY)
    # base vocab ids are the byte values themselves
    t = bpe.byte_char_table()
    assert vocab[t[ord("a")]] == ord("a")
    # encoding never expands: one id per byte is the worst case
    n_ids = {r["doc_id"]: len(r["ids"]) for r in ids_df.collect()}
    for d, text in UGLY:
        assert n_ids[d] <= len(text.encode("utf-8"))


def test_byte_bpe_merges_oracle_survives_non_ascii(spark):
    """The DuckDB training replay must track the Spark trainer on
    ARBITRARY byte content — multibyte UTF-8, control bytes, CRLF —
    not just printable ASCII (the r10 ADVICE item: the old oracle's
    CASE covered ASCII + 4 whitespace bytes and would diverge loudly
    on anything else; the hex-pair + full-256-table form must not)."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as em

    docs = spark.createDataFrame(UGLY, "doc_id long, text string")
    want = bpe.byte_bpe_train(docs, n_merges=10)
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(UGLY, columns=["doc_id", "text"])
    )
    got = con.execute(em._byte_bpe_merges_sql(10)).fetchdf()
    got = got.sort_values("step", ignore_index=True)
    assert [
        (r["left"], r["right"], int(r["support"]))
        for _, r in got.iterrows()
    ] == [(l, r, s) for l, r, s in want]
    assert bool(got["merged_ok"].all()) and bool(got["monotone_ok"].all())


def test_byte_bpe_eod_appended_and_dropped_on_decode(spark):
    docs = spark.createDataFrame(UGLY, "doc_id long, text string")
    merges = bpe.byte_bpe_train(docs, n_merges=8)
    ids_df, _ = bpe.byte_bpe_encode(docs, merges, append_eod=True)
    eod = 256 + len(merges)
    for r in ids_df.collect():
        assert r["ids"][-1] == eod
    got = {
        r["doc_id"]: r["text"]
        for r in bpe.byte_bpe_decode(ids_df, merges).collect()
    }
    assert got == dict(UGLY)


def test_byte_bpe_decode_raises_on_unknown_id(spark):
    ids_df = spark.createDataFrame(
        [(1, [ord("a"), 9999])], "doc_id long, ids array<long>"
    )
    with pytest.raises(Exception, match="unknown token id"):
        bpe.byte_bpe_decode(ids_df, [("a", "b")]).collect()


def test_byte_bpe_fallback_rate_from_ids(spark):
    """Byte fallback (the byte tier's OOV analog): an id < 256 IS a
    single-byte token by vocab construction, so the fallback rate reads
    straight off the id stream. In-vocab text fuses (rate < 1); text
    the merges never saw stays at rate 1.0 (every byte emitted raw) —
    but still encodes and round-trips, the whole point of byte level."""
    train = spark.createDataFrame(
        [(1, "low low low low lower")], "doc_id long, text string"
    )
    merges = bpe.byte_bpe_train(train, n_merges=6)
    rate = lambda df: {  # noqa: E731
        r["doc_id"]: (
            sum(1 for i in r["ids"] if i < 256) / max(len(r["ids"]), 1)
        )
        for r in df.collect()
    }
    fused, _ = bpe.byte_bpe_encode(train, merges)
    assert rate(fused)[1] < 1.0
    foreign = spark.createDataFrame(
        [(2, "zebra quartz")], "doc_id long, text string"
    )
    enc, _ = bpe.byte_bpe_encode(foreign, merges)
    assert rate(enc)[2] == 1.0  # full fallback: no learned pair applies
    got = bpe.byte_bpe_decode(enc, merges).collect()[0]["text"]
    assert got == "zebra quartz"  # ...and still lossless


def test_byte_tokenizer_stats_separates_sources(spark):
    """The curator table for the production tokenizer: a source the
    merges were trained on fuses (bytes_per_token > 1, single-byte rate
    < 1); a foreign source stays at full single-byte fallback; an
    all-empty source still appears with zero counts and NULL ratios;
    and the stats agree with counting ids straight off the encoder."""
    docs = spark.createDataFrame(
        [
            (1, "low low low low lower", "fits"),
            (2, "zebra quartz", "foreign"),
            (3, "", "empty"),
        ],
        "doc_id long, text string, source string",
    )
    train = docs.filter("source = 'fits'")
    merges = bpe.byte_bpe_train(train, n_merges=6)
    rows = {
        r["source"]: r
        for r in bpe.byte_tokenizer_stats(docs, merges).collect()
    }
    assert set(rows) == {"fits", "foreign", "empty"}
    assert rows["fits"]["bytes_per_token"] > 1.0
    assert rows["fits"]["single_byte_rate"] < 1.0
    assert rows["foreign"]["single_byte_rate"] == 1.0
    assert rows["foreign"]["bytes_per_token"] == 1.0
    assert rows["empty"]["n_docs"] == 1 and rows["empty"]["n_tokens"] == 0
    assert rows["empty"]["bytes_per_token"] is None
    # cross-check against the raw id stream (pieces include whitespace)
    enc, _ = bpe.byte_bpe_encode(docs.filter("source = 'fits'"), merges)
    ids = enc.collect()[0]["ids"]
    assert rows["fits"]["n_tokens"] == len(ids)
    assert rows["fits"]["single_byte_rate"] == round(
        sum(1 for i in ids if i < 256) / len(ids), 6
    )


def test_byte_tokenizer_stats_oracle_survives_non_ascii(spark):
    """The min-rank ENCODE replay (recursive CTE) must track the Spark
    encoder on arbitrary byte content, exactly like the training
    replay — same UGLY corpus, full stats comparison."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as em

    docs = spark.createDataFrame(
        [(d, t, f"s{d % 2}") for d, t in UGLY],
        "doc_id long, text string, source string",
    )
    merges = bpe.byte_bpe_train(docs, n_merges=10)
    want = {
        r["source"]: (
            r["n_docs"], r["n_pieces"], r["n_bytes"], r["n_tokens"],
            r["bytes_per_token"], r["single_byte_rate"],
        )
        for r in bpe.byte_tokenizer_stats(docs, merges).collect()
    }
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            [(d, t, f"s{d % 2}") for d, t in UGLY],
            columns=["doc_id", "text", "source"],
        ),
    )
    got = {
        r[0]: tuple(r[1:])
        for r in con.execute(em._byte_tokenizer_stats_sql(10)).fetchall()
    }
    assert got == want


def test_byte_tokenizer_artifact_roundtrip(spark, tmp_path):
    """save -> load is exact (merges, supports, order); a loaded
    tokenizer encodes identically to the in-memory one; corrupted
    artifacts raise with the path named."""
    docs = spark.createDataFrame(UGLY, "doc_id long, text string")
    merges = bpe.byte_bpe_train(docs, n_merges=10)
    p = str(tmp_path / "tok.json")
    bpe.save_byte_tokenizer(merges, p)
    loaded = bpe.load_byte_tokenizer(p)
    assert loaded == [tuple(m) for m in merges]
    a, va = bpe.byte_bpe_encode(docs, merges)
    b, vb = bpe.byte_bpe_encode(docs, loaded)
    assert va == vb
    ga = {r["doc_id"]: list(r["ids"]) for r in a.collect()}
    gb = {r["doc_id"]: list(r["ids"]) for r in b.collect()}
    assert ga == gb


def test_byte_tokenizer_artifact_validates(tmp_path):
    import json

    import pytest as _pytest

    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"format": "other", "merges": []}))
    with _pytest.raises(ValueError, match="byte-bpe-v1"):
        bpe.load_byte_tokenizer(str(bad))
    wrong = tmp_path / "wrong.json"
    wrong.write_text(
        json.dumps(
            {"format": "byte-bpe-v1", "merges": [["a", "b"]],
             "vocab_size": 999}
        )
    )
    with _pytest.raises(ValueError, match="vocab_size"):
        bpe.load_byte_tokenizer(str(wrong))
    # malformed merge ENTRIES must be named at load time, not crash
    # later inside byte_bpe_vocab/ranks with an opaque error
    for entry in (
        ["a"], [1, 2], ["a", "b", "x"], "ab", ["a", "b", 1, 2],
        ["a", "b", True],  # bool passes isinstance(..., int) — reject
    ):
        mal = tmp_path / "mal.json"
        mal.write_text(
            json.dumps(
                {"format": "byte-bpe-v1", "merges": [entry],
                 "vocab_size": 258}
            )
        )
        with _pytest.raises(ValueError, match=r"merges\[0\]"):
            bpe.load_byte_tokenizer(str(mal))


def test_min_freq_cut_behaviour(spark):
    """min_freq=1 is the identity; min_freq=2 drops hapax entries before
    the collect so the bounded-collect guard no longer fires on a corpus
    whose tail was the problem; and on a corpus where every word meets
    the threshold the cut is vacuously exact (same merges, same
    supports). The general approximation contract is documented on
    _min_freq_cut."""
    docs = spark.createDataFrame(
        [(1, "aa bb aa bb aa cc"), (2, "aa bb cc aa")],
        "doc_id long, text string",
    )
    base = bpe.bpe_train(docs, n_merges=4)
    assert bpe.bpe_train(docs, n_merges=4, min_freq=1) == base
    # every word occurs >= 2 times -> the cut is vacuous and exact
    assert bpe.bpe_train(docs, n_merges=4, min_freq=2) == base
    # hapax-heavy corpus: guard fires without the cut, not with it
    hapax = spark.createDataFrame(
        [(1, "xy xy xy qq ww ee rr tt zz uu")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="max_collect"):
        bpe.bpe_train(hapax, n_merges=1, max_collect_words=3)
    got = bpe.bpe_train(
        hapax, n_merges=1, max_collect_words=3, min_freq=2
    )
    assert got == [("x", "y", 3)]
    # byte tier: same knob over the piece histogram
    bbase = bpe.byte_bpe_train(docs, n_merges=4)
    assert bpe.byte_bpe_train(docs, n_merges=4, min_freq=2) == bbase
    with pytest.raises(ValueError, match="min_freq"):
        bpe.bpe_train(docs, n_merges=1, min_freq=0)


def test_byte_bpe_merges_learned_over_pieces(spark):
    """On a corpus dominated by one word, the first merges fuse that
    word's bytes; merges never cross piece boundaries (no symbol ever
    contains both whitespace and non-whitespace bytes)."""
    docs = spark.createDataFrame(
        [(1, "zag zag zag zag zig")], "doc_id long, text string"
    )
    merges = bpe.byte_bpe_train(docs, n_merges=4)
    # (z,a) and (a,g) tie at support 4; left-asc tie-break picks (a,g)
    assert merges[0] == ("a", "g", 4)
    t = bpe.byte_char_table()
    ws = {t[b] for b in range(256) if chr(b).isspace()}
    for left, right, _sup in merges:
        fused = left + right
        assert not (
            any(c in ws for c in fused)
            and any(c not in ws for c in fused)
        )


def test_tokenizer_stats_keeps_zero_word_source(spark):
    """A source whose docs tokenize to ZERO words (empty/whitespace-only
    text) must still appear in the readiness report — n_docs counted,
    counts 0, ratio columns NULL (0/0 has no honest number). The r8
    inner-join form silently dropped the source."""
    docs = spark.createDataFrame(
        [(1, "low low", "a"), (2, "   ", "empty"), (3, "", "empty")],
        "doc_id long, text string, source string",
    )
    rows = {
        r["source"]: r
        for r in bpe.tokenizer_stats(docs, [("l", "o")]).collect()
    }
    assert set(rows) == {"a", "empty"}
    e = rows["empty"]
    assert e["n_docs"] == 2
    assert e["n_words"] == 0 and e["n_chars"] == 0 and e["n_subwords"] == 0
    assert e["chars_per_token"] is None and e["fallback_rate"] is None
    assert rows["a"]["n_words"] == 2


def test_word_tokenizer_artifact_roundtrip(tmp_path):
    """Word-tier artifact parity with the byte tier (r12): loaded ==
    saved for both 2- and 3-tuple merges; format/shape/count
    validation raises with the path named."""
    import json

    import pytest as _pytest

    from hnsw_vector_db_spark.operators.bpe import (
        load_word_tokenizer,
        save_word_tokenizer,
    )

    p = str(tmp_path / "tok.json")
    merges3 = [("t", "h", 40), ("th", "e</w>", 17)]
    save_word_tokenizer(merges3, p)
    assert load_word_tokenizer(p) == merges3
    merges2 = [("a", "b"), ("ab", "c</w>")]
    save_word_tokenizer(merges2, p)
    assert load_word_tokenizer(p) == merges2

    bad = str(tmp_path / "bad.json")
    with open(bad, "w") as fh:
        json.dump({"format": "byte-bpe-v1", "merges": []}, fh)
    with _pytest.raises(ValueError, match="word-bpe-v1"):
        load_word_tokenizer(bad)
    with open(bad, "w") as fh:
        json.dump(
            {"format": "word-bpe-v1", "merges": [["a", 3]], "n_merges": 1},
            fh,
        )
    with _pytest.raises(ValueError, match="merges\\[0\\]"):
        load_word_tokenizer(bad)
    with open(bad, "w") as fh:
        json.dump(
            {"format": "word-bpe-v1", "merges": [["a", "b"]], "n_merges": 2},
            fh,
        )
    with _pytest.raises(ValueError, match="n_merges"):
        load_word_tokenizer(bad)


def test_segment_words_applied_matches_fold_chain(spark):
    """r12 optimization: the Arrow segmentation kernel
    (_segment_words_applied) must reproduce the retained _merge_fold
    chain symbol-for-symbol — the anchor pattern pack_best_fit uses for
    its histogram kernel. Random unicode words (incl. astral plane) x
    a cascade merge list with multi-level merges."""
    import random

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from hnsw_vector_db_spark.operators import bpe

    random.seed(23)
    words = ["a", "ab", "aaa", "the", "matcher", "😀ab", "中文", "ababab"]
    for _ in range(80):
        words.append(
            "".join(
                random.choice("abcdeth中😀")
                for _ in range(random.randint(1, 12))
            )
        )
    words = sorted(set(words))
    merges = [
        ("t", "h"), ("a", "b"), ("ab", "ab"), ("e", "</w>"),
        ("th", "e</w>"), ("a", "a"), ("aa", "a"), ("中", "文"),
    ]
    df = spark.createDataFrame([Row(word=w) for w in words], "word string")
    seg_fold = bpe._initial_seg(
        df.select("word", F.lit(1).alias("wf"))
    ).select("word", "syms")
    for left, right in merges:
        seg_fold = seg_fold.select(
            "word", bpe._merge_fold(F.col("syms"), left, right).alias("syms")
        )
    got_fold = {r["word"]: r["syms"] for r in seg_fold.collect()}
    got_arrow = {
        r["word"]: r["syms"]
        for r in bpe._segment_words_applied(df, merges).collect()
    }
    assert got_fold == got_arrow
