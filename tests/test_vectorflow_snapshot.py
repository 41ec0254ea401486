"""Migration source/sink for the reference's snapshot layout
(index.msgpack + vectors.bin + metadata.json, core/storage/engine.py)."""

from __future__ import annotations

import json
import struct

import numpy as np
import pytest

from hnsw_vector_db_spark.sources.vectorflow_snapshot import (
    msgpack_decode,
    msgpack_encode,
    read_snapshot_edges,
    read_snapshot_vectors,
    snapshot_params,
    write_snapshot,
)


def test_msgpack_roundtrip_all_types():
    obj = {
        "dim": 128,
        "ml": 1.4426950408889634,
        "neg": -7,
        "big": 2**40,
        "negbig": -(2**20),
        "none": None,
        "flag": True,
        "s" * 40: ["x", 0, 127, 255, 65535, {"nested": [1.5, False]}],
        "bin": b"\x00\x01\xff",
        "arr": list(range(20)),  # > fixarray
    }
    assert msgpack_decode(msgpack_encode(obj)) == obj


def test_msgpack_known_bytes():
    # spot-check byte-exact encodings from the public msgpack spec
    assert msgpack_encode(5) == b"\x05"
    assert msgpack_encode(-1) == b"\xff"
    assert msgpack_encode(200) == b"\xcc\xc8"
    assert msgpack_encode("abc") == b"\xa3abc"
    assert msgpack_encode([1, 2]) == b"\x92\x01\x02"
    assert msgpack_encode({"a": 1}) == b"\x81\xa1a\x01"
    assert msgpack_encode(1.5) == b"\xcb" + struct.pack(">d", 1.5)
    assert msgpack_decode(b"\xcd\x01\x00") == 256


def _fake_snapshot(path):
    """Write a snapshot the way the reference does (engine.py:23-68):
    msgpack graph + 'II' header float64 matrix + metadata.json."""
    X = np.array([[1.0, 0.0], [0.0, 1.0], [0.5, 0.5]])
    graph = {
        "dim": 2,
        "M": 16,
        "ef_construction": 200,
        "ef_search": 50,
        "ml": 1.4426950408889634,
        "max_elements": 1000000,
        "entry_point": 2,
        "current_id": 3,
        "nodes": {
            "0": {"id": 0, "level": 0, "connections": {"0": [1, 2]}, "vector_offset": 0},
            "1": {"id": 1, "level": 0, "connections": {"0": [0]}, "vector_offset": 1},
            "2": {"id": 2, "level": 1, "connections": {"0": [0], "1": []}, "vector_offset": 2},
        },
    }
    path.mkdir(parents=True, exist_ok=True)
    (path / "index.msgpack").write_bytes(msgpack_encode(graph))
    with open(path / "vectors.bin", "wb") as f:
        f.write(struct.pack("II", *X.shape))
        f.write(X.tobytes())
    (path / "metadata.json").write_text(
        json.dumps({"metadata_store": {"0": {"tag": "a"}}, "dimension": 2})
    )


def test_read_snapshot(spark, tmp_path):
    snap = tmp_path / "snap"
    _fake_snapshot(snap)
    vec = read_snapshot_vectors(spark, str(snap)).orderBy("id").collect()
    assert [r["id"] for r in vec] == [0, 1, 2]
    assert vec[0]["vector"] == [1.0, 0.0]
    assert json.loads(vec[0]["metadata"]) == {"tag": "a"}
    assert vec[1]["metadata"] is None
    assert vec[2]["level"] == 1
    edges = {
        (r["src"], r["dst"], r["layer"])
        for r in read_snapshot_edges(spark, str(snap)).collect()
    }
    assert edges == {(0, 1, 0), (0, 2, 0), (1, 0, 0), (2, 0, 0)}
    p = snapshot_params(str(snap))
    assert p["dim"] == 2 and p["entry_point"] == 2 and p["M"] == 16


def test_snapshot_roundtrip(spark, tmp_path):
    snap1, snap2 = tmp_path / "s1", tmp_path / "s2"
    _fake_snapshot(snap1)
    vec = read_snapshot_vectors(spark, str(snap1))
    edges = read_snapshot_edges(spark, str(snap1))
    write_snapshot(str(snap2), vec, edges, params={"entry_point": 2})
    vec2 = read_snapshot_vectors(spark, str(snap2)).orderBy("id").collect()
    assert [(r["id"], r["vector"], r["level"], r["metadata"]) for r in vec2] == [
        (r["id"], r["vector"], r["level"], r["metadata"])
        for r in vec.orderBy("id").collect()
    ]
    e1 = {(r["src"], r["dst"], r["layer"]) for r in edges.collect()}
    e2 = {
        (r["src"], r["dst"], r["layer"])
        for r in read_snapshot_edges(spark, str(snap2)).collect()
    }
    assert e1 == e2
    # the binary matrix is byte-identical modulo node order (both write
    # offset-ordered by id here)
    assert (snap2 / "vectors.bin").read_bytes() == (snap1 / "vectors.bin").read_bytes()
