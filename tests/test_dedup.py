"""Dedup operators: known-answer fixtures + cross-operator consistency."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hnsw_vector_db_spark.operators import dedup
from hnsw_vector_db_spark.sources.parquet import load_table


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),   # near-dup of 0
        (2, "completely different words appear in this text here"),
        (3, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
        (4, "short text"),                                    # < 3 tokens: no shingles
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_dedup_keeps_min_id(docs):
    out = dedup.exact_dedup(docs)
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [0, 1, 2, 4]  # 3 collapsed into 0


def test_jaccard_known_value(docs):
    """docs 0/1 share 6 of 8 distinct 3-gram shingles => J = 6/(7+7-6)."""
    out = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.jaccard_pairs(docs, n=3, threshold=0.1).collect()
    }
    assert out[(0, 3)] == 1.0
    assert out[(0, 1)] == pytest.approx(0.75, abs=1e-6)
    assert (0, 2) not in out


def test_minhash_identical_docs_equal_sig(docs):
    sig = dedup.minhash_signature_wide(docs, k=8)
    rows = {r["doc_id"]: [r[f"mh{i}"] for i in range(8)] for r in sig.collect()}
    assert rows[0] == rows[3]
    assert rows[0] != rows[2]
    assert 4 not in rows  # no shingles -> dropped


def test_minhash_lsh_finds_near_dups(docs):
    out = dedup.minhash_lsh_near_dup(docs, k=16, bands=4, threshold=0.5)
    pairs = {(r["doc_a"], r["doc_b"]) for r in out.collect()}
    assert (0, 3) in pairs  # exact dup always bucket-collides
    assert (0, 1) in pairs  # 0.75 jaccard with 16/4 banding
    assert all(a < b for a, b in pairs)


def test_simhash_identical_docs_equal(docs):
    fp = {r["doc_id"]: r["simhash"] for r in dedup.simhash_fingerprint(docs).collect()}
    assert fp[0] == fp[3]
    assert 0 <= fp[0] < (1 << 61)


def test_simhash_neardup_includes_exact_dups(docs):
    out = dedup.simhash_near_dup(docs, max_hamming=3)
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in out.collect()}
    assert pairs[(0, 3)] == 0


def test_lsh_agrees_with_exact_on_testdata(spark, sf_dir):
    """LSH(16,4) at J>=0.5 should recover nearly all exact-jaccard pairs —
    the testdata's near-dups are J>=0.9 where band-collision prob is ~1."""
    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.jaccard_pairs(docs, n=3, threshold=0.5).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_near_dup(docs, k=16, bands=4, threshold=0.5).collect()
    }
    assert lsh.issubset(exact)
    high = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.jaccard_pairs(docs, n=3, threshold=0.9).collect()
    }
    recall = len(lsh & high) / max(len(high), 1)
    assert recall >= 0.9, f"LSH recall {recall} on J>=0.9 pairs"
