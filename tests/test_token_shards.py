"""Tokenized training-shard sink/source (sources/token_shards.py):
round-trip fidelity, layout determinism, and the corruption modes a
trainer must never read through silently — truncated .bin, orphaned
sidecars, bad magic, and out-of-range token ids."""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from hnsw_vector_db_spark.operators.bpe import bpe_token_ids
from hnsw_vector_db_spark.sources.token_shards import (
    MAGIC,
    read_token_shards,
    write_token_shards,
)

MERGES = [("t", "h"), ("e", "</w>"), ("th", "e</w>")]


def _ids_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, ids array<long>")


@pytest.fixture()
def small(spark):
    return _ids_df(
        spark,
        [
            (0, [1, 2, 3]),
            (1, [4]),
            (2, []),
            (5, [7, 8, 9, 10]),
            (9, [0]),
        ],
    )


def test_round_trip(spark, small, tmp_path):
    man = write_token_shards(small, str(tmp_path), n_shards=4).collect()
    assert sum(r["n_docs"] for r in man) == 5
    assert sum(r["n_tokens"] for r in man) == 9
    back = read_token_shards(spark, str(tmp_path)).orderBy("doc_id").collect()
    got = {r["doc_id"]: list(r["ids"]) for r in back}
    assert got == {0: [1, 2, 3], 1: [4], 2: [], 5: [7, 8, 9, 10], 9: [0]}
    # shard routing is id arithmetic and the file name carries it
    by_doc = {r["doc_id"]: r["file"] for r in back}
    assert by_doc[5] == "shard-00001"  # 5 % 4
    assert by_doc[9] == "shard-00001"
    # offsets are the within-shard prefix sum in doc_id order
    offs = {r["doc_id"]: r["offset"] for r in back}
    assert offs[1] == 0 and offs[5] == 1 and offs[9] == 5


def test_write_is_deterministic(spark, small, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_token_shards(small, a, n_shards=4).collect()
    write_token_shards(small, b, n_shards=4).collect()
    for fa in sorted(glob.glob(os.path.join(a, "*"))):
        fb = os.path.join(b, os.path.basename(fa))
        with open(fa, "rb") as f1, open(fb, "rb") as f2:
            assert f1.read() == f2.read(), os.path.basename(fa)


def test_uint16_bound_raises(spark, tmp_path):
    df = _ids_df(spark, [(0, [1, 70000])])
    with pytest.raises(Exception, match="outside \\[0, 65535\\]"):
        write_token_shards(df, str(tmp_path), n_shards=2, dtype="uint16").collect()
    ok = _ids_df(spark, [(0, [1, 65535])])
    write_token_shards(ok, str(tmp_path), n_shards=2, dtype="uint16").collect()
    back = read_token_shards(spark, str(tmp_path)).collect()
    assert list(back[0]["ids"]) == [1, 65535]


def test_negative_id_raises(spark, tmp_path):
    df = _ids_df(spark, [(0, [-1])])
    with pytest.raises(Exception, match="outside"):
        write_token_shards(df, str(tmp_path), n_shards=1).collect()


def test_truncated_bin_raises(spark, small, tmp_path):
    write_token_shards(small, str(tmp_path), n_shards=1).collect()
    bin_path = glob.glob(str(tmp_path / "*.bin"))[0]
    blob = open(bin_path, "rb").read()
    with open(bin_path, "wb") as f:
        f.write(blob[:-4])
    with pytest.raises(Exception, match="truncated|expects"):
        read_token_shards(spark, str(tmp_path)).collect()


def test_missing_bin_raises(spark, small, tmp_path):
    """A deleted .bin reads as 0 tokens; the index sum check names it."""
    write_token_shards(small, str(tmp_path), n_shards=1).collect()
    os.remove(glob.glob(str(tmp_path / "*.bin"))[0])
    with pytest.raises(Exception, match="expects"):
        read_token_shards(spark, str(tmp_path)).collect()


def test_orphan_bin_raises(spark, small, tmp_path):
    write_token_shards(small, str(tmp_path), n_shards=1).collect()
    os.remove(glob.glob(str(tmp_path / "*.idx"))[0])
    with pytest.raises(Exception, match="missing .idx"):
        read_token_shards(spark, str(tmp_path)).collect()


def test_empty_shard_round_trips(spark, tmp_path):
    """A shard whose only docs are empty writes a zero-byte .bin —
    binaryFile skips it, and the reader must still return the docs."""
    df = _ids_df(spark, [(0, []), (2, [])])
    write_token_shards(df, str(tmp_path), n_shards=2).collect()
    back = read_token_shards(spark, str(tmp_path)).orderBy("doc_id").collect()
    assert [(r["doc_id"], list(r["ids"]), r["n_tokens"]) for r in back] == [
        (0, [], 0),
        (2, [], 0),
    ]


def test_bad_magic_raises(spark, small, tmp_path):
    write_token_shards(small, str(tmp_path), n_shards=1).collect()
    idx_path = glob.glob(str(tmp_path / "*.idx"))[0]
    blob = open(idx_path, "rb").read()
    assert blob[:8] == MAGIC
    with open(idx_path, "wb") as f:
        f.write(b"NOTMAGIC" + blob[8:])
    with pytest.raises(Exception, match="bad magic"):
        read_token_shards(spark, str(tmp_path)).collect()


def test_bin_is_raw_little_endian(spark, tmp_path):
    """The .bin must be NOTHING but tokens — a trainer np.memmap's it."""
    df = _ids_df(spark, [(0, [3, 1, 4, 1, 5])])
    write_token_shards(df, str(tmp_path), n_shards=1, dtype="uint32").collect()
    raw = np.fromfile(glob.glob(str(tmp_path / "*.bin"))[0], dtype="<u4")
    assert raw.tolist() == [3, 1, 4, 1, 5]


def test_bpe_token_ids_decode_identity(spark):
    """Decoding ids through the returned vocab reproduces the exact
    segmentation: ids are a lossless encoding of the corpus."""
    docs = spark.createDataFrame(
        [(0, "the thermal test"), (1, "  "), (2, "thethe")],
        "doc_id long, text string",
    )
    ids_df, vocab = bpe_token_ids(docs, MERGES, append_eod=True)
    eod = len(vocab)
    inv = {v: k for k, v in vocab.items()}
    rows = {r["doc_id"]: list(r["ids"]) for r in ids_df.collect()}
    # whitespace-only doc has no tokens -> no row (same rule as the
    # posexplode pipeline everywhere else)
    assert set(rows) == {0, 2}
    assert all(r[-1] == eod for r in rows.values())
    # decode: symbol text concatenated, </w> back to spaces
    decoded = "".join(inv[i] for i in rows[0][:-1]).replace("</w>", " ").strip()
    assert decoded == "the thermal test"
    decoded2 = "".join(inv[i] for i in rows[2][:-1]).replace("</w>", " ").strip()
    assert decoded2 == "thethe"


def test_auto_dtype_picks_narrowest(spark, tmp_path):
    a, b = str(tmp_path / "small"), str(tmp_path / "big")
    small = _ids_df(spark, [(0, [1, 65535])])
    write_token_shards(small, a, n_shards=1, dtype="auto").collect()
    assert np.fromfile(glob.glob(a + "/*.bin")[0], dtype="<u2").tolist() == [
        1, 65535,
    ]
    big = _ids_df(spark, [(0, [1, 65536])])
    write_token_shards(big, b, n_shards=1, dtype="auto").collect()
    assert np.fromfile(glob.glob(b + "/*.bin")[0], dtype="<u4").tolist() == [
        1, 65536,
    ]
    # readers never guess: both round-trip through the recorded code
    got = {r["doc_id"]: list(r["ids"])
           for r in read_token_shards(spark, a).collect()}
    assert got == {0: [1, 65535]}
    got = {r["doc_id"]: list(r["ids"])
           for r in read_token_shards(spark, b).collect()}
    assert got == {0: [1, 65536]}


def test_audit_reports_instead_of_throwing(spark, small, tmp_path):
    from hnsw_vector_db_spark.sources.token_shards import audit_token_shards

    write_token_shards(small, str(tmp_path), n_shards=2).collect()
    rows = {r["file"]: r for r in audit_token_shards(spark, str(tmp_path)).collect()}
    assert all(r["ok"] for r in rows.values())
    assert sum(r["n_docs"] for r in rows.values()) == 5
    assert sum(r["n_tokens"] for r in rows.values()) == 9
    assert all(r["dtype"] == "uint32" for r in rows.values())
    # corrupt one shard's .bin: that shard flags bin_ok false, the
    # OTHER shard stays ok — the audit names the bad shard, not the farm
    bad_bin = sorted(glob.glob(str(tmp_path / "*.bin")))[0]
    blob = open(bad_bin, "rb").read()
    with open(bad_bin, "wb") as f:
        f.write(blob[:-4])
    rows = {r["file"]: r for r in audit_token_shards(spark, str(tmp_path)).collect()}
    bad = os.path.basename(bad_bin)[:-4]
    assert not rows[bad]["bin_ok"] and not rows[bad]["ok"]
    assert rows[bad]["magic_ok"] and rows[bad]["idx_ok"]
    good = [r for f, r in rows.items() if f != bad]
    assert all(r["ok"] for r in good)


def test_audit_flags_bad_magic_and_orphan(spark, small, tmp_path):
    from hnsw_vector_db_spark.sources.token_shards import audit_token_shards

    write_token_shards(small, str(tmp_path), n_shards=1).collect()
    idx_path = glob.glob(str(tmp_path / "*.idx"))[0]
    blob = open(idx_path, "rb").read()
    with open(idx_path, "wb") as f:
        f.write(b"NOTMAGIC" + blob[8:])
    rows = audit_token_shards(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert not r["magic_ok"] and not r["ok"] and r["n_docs"] is None
    # orphan .bin (idx deleted): unreadable shard, named, ok=false
    os.remove(idx_path)
    r = audit_token_shards(spark, str(tmp_path)).collect()[0]
    assert not r["ok"] and not r["idx_ok"] and r["n_docs"] is None


def test_selective_shard_read(spark, small, tmp_path):
    """shards=[...] prunes at the FILE LISTING (glob alternation): only
    the selected shards' docs come back, NULL rows for other shards
    never exist, and an empty selection raises instead of silently
    reading nothing."""
    write_token_shards(small, str(tmp_path), n_shards=4).collect()
    # shard 1 holds docs 1, 5, 9; shard 0 holds doc 0
    got = {
        r["doc_id"]: r["file"]
        for r in read_token_shards(spark, str(tmp_path), shards=[1]).collect()
    }
    assert set(got) == {1, 5, 9}
    assert set(got.values()) == {"shard-00001"}
    both = read_token_shards(spark, str(tmp_path), shards=[0, 1]).collect()
    assert {r["doc_id"] for r in both} == {0, 1, 5, 9}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="shards"):
        read_token_shards(spark, str(tmp_path), shards=[])
