"""WET source/sink (sources/wet.py): byte-exact round-trip,
Content-Length framing against planted fake headers, octet (not
character) lengths, warcinfo lead records, truncation fail-fast."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hnsw_vector_db_spark.sources.wet import (
    _parse_wet_bytes,
    _serialize_record,
    read_wet,
    write_wet,
)


def _roundtrip(spark, rows, tmp, n_files=3):
    df = spark.createDataFrame(rows, "url string, text string")
    manifest = write_wet(df, str(tmp), n_files=n_files).collect()
    assert sum(r["n_records"] for r in manifest) == len(rows)
    return read_wet(spark, str(tmp))


def test_roundtrip_byte_exact(spark, tmp_path):
    rows = [(f"http://ex.com/{i}", f"text {i}\nline two") for i in range(20)]
    rec = _roundtrip(spark, rows, tmp_path)
    conv = {
        r["url"]: r["text"]
        for r in rec.filter(F.col("rec_type") == "conversion").collect()
    }
    assert conv == dict(rows)


def test_warcinfo_lead_record_per_file(spark, tmp_path):
    rows = [(f"http://ex.com/{i}", "t") for i in range(20)]
    rec = _roundtrip(spark, rows, tmp_path, n_files=3).collect()
    infos = [r for r in rec if r["rec_type"] == "warcinfo"]
    n_files = len({r["file"] for r in rec})
    assert len(infos) == n_files
    assert all(r["url"] is None for r in infos)


def test_content_length_framing_survives_planted_header(spark, tmp_path):
    # a payload that CONTAINS a syntactically plausible record header:
    # delimiter-splitting parsers shatter this; length framing must not
    trap = "before\r\nWARC/1.0\r\nWARC-Type: conversion\r\n\r\nafter"
    rows = [("http://ex.com/trap", trap), ("http://ex.com/ok", "plain")]
    rec = _roundtrip(spark, rows, tmp_path, n_files=1)
    conv = {
        r["url"]: r["text"]
        for r in rec.filter(F.col("rec_type") == "conversion").collect()
    }
    assert conv["http://ex.com/trap"] == trap
    assert conv["http://ex.com/ok"] == "plain"


def test_content_length_is_octets_not_chars(spark, tmp_path):
    text = "café"  # 4 chars, 5 UTF-8 octets
    rec = _roundtrip(spark, [("http://ex.com/u", text)], tmp_path, n_files=1)
    row = rec.filter(F.col("rec_type") == "conversion").collect()[0]
    assert row["content_length"] == 5
    assert row["text"] == text


def test_truncated_payload_fails_fast():
    blob = _serialize_record("conversion", "http://x", b"full payload")
    with pytest.raises(ValueError, match="truncated payload"):
        _parse_wet_bytes("f", blob[:-10])


def test_bad_version_line_fails_fast():
    with pytest.raises(ValueError, match="bad record version"):
        _parse_wet_bytes("f", b"HTTP/1.1 200 OK\r\n\r\n\r\n\r\n")


def test_gzip_roundtrip_and_member_per_record(spark, tmp_path):
    """compress=True writes multi-member gzip (one member per record —
    the Common Crawl layout); the reader gunzips per member and parses
    identically, including the planted fake-header trap."""
    import zlib

    trap = "x\r\nWARC/1.0\r\nWARC-Type: conversion\r\n\r\ny"
    rows = [(f"http://ex.com/{i}", trap if i == 0 else f"t{i}")
            for i in range(6)]
    df = spark.createDataFrame(rows, "url string, text string")
    manifest = write_wet(df, str(tmp_path), n_files=1, compress=True).collect()
    assert sum(r["n_records"] for r in manifest) == len(rows)
    files = [f for f in os.listdir(tmp_path) if f.endswith(".warc.wet.gz")]
    assert len(files) == 1
    blob = (tmp_path / files[0]).read_bytes()
    # count gzip members: 6 conversion records + 1 warcinfo = 7
    members, rest = 0, blob
    while rest:
        d = zlib.decompressobj(wbits=47)
        d.decompress(rest)
        d.flush()
        members += 1
        rest = d.unused_data
    assert members == 7
    rec = read_wet(spark, str(tmp_path))
    conv = {
        r["url"]: r["text"]
        for r in rec.filter(F.col("rec_type") == "conversion").collect()
    }
    assert conv == dict(rows)


def test_gunzip_rejects_garbage():
    from hnsw_vector_db_spark.sources.wet import _gunzip_members

    with pytest.raises((ValueError, Exception)):
        _gunzip_members(b"definitely not gzip")


def test_write_is_deterministic_and_idempotent(spark, tmp_path):
    rows = [(f"http://ex.com/{i}", f"t{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "url string, text string")
    d1, d2 = tmp_path / "a", tmp_path / "b"
    write_wet(df, str(d1), n_files=2).collect()
    write_wet(df, str(d2), n_files=2).collect()
    files = sorted(os.listdir(d1))
    assert files == sorted(os.listdir(d2))
    for f in files:
        b1 = (d1 / f).read_bytes()
        b2 = (d2 / f).read_bytes()
        # identical apart from the per-run WARC-Record-ID uuids
        import re

        strip = lambda b: re.sub(rb"<urn:uuid:[0-9a-f\-]+>", b"", b)
        assert strip(b1) == strip(b2)


def test_write_wet_refuses_non_local_master():
    """Shard files are written with plain open() inside executor tasks —
    correct only when driver and executors share the filesystem. The
    guard refuses cluster masters instead of silently losing shards."""
    import pytest

    from hnsw_vector_db_spark.sources.wet import _check_local_master

    _check_local_master("local[32]")  # fine
    _check_local_master("local")  # fine
    for master in ("spark://host:7077", "yarn", "k8s://https://api:443"):
        with pytest.raises(ValueError, match="own disk"):
            _check_local_master(master)
