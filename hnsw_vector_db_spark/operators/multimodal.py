"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded/feature-extracted via Arrow-batched mapInPandas.

The reference stores only float vectors; a training-data pipeline also
moves image/audio/video bytes. The Spark-side contract that matters at
100 TB is here and real: binary columns stay opaque (never interpreted by
the JVM), metadata is typed columns for pruning/filtering, and the decode
step is an Arrow-batched Python stage whose cost scales with bytes, not
rows. The actual codec call is STUBBED (no PIL/ffmpeg in this container):
``decode_features`` computes a deterministic fake feature vector from the
bytes, clearly marked; swap ``_decode_one`` for a real decoder in
production.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8


def _decode_one(payload: bytes, modality: str) -> np.ndarray:
    """STUB decoder: deterministic pseudo-features from a SHA-256 of the
    bytes. A real implementation decodes the media (PIL/torchaudio/ffmpeg)
    and pools features; the Spark plumbing around this call is identical.
    """
    if payload is None:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer(digest[: FEATURE_DIM * 4], dtype=np.uint32)
    return (raw / np.float64(2**32)).astype(np.float32)


def attach_payload(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Manufacture a binary payload column from text (testdata has no real
    media; encode() gives a deterministic stand-in) plus typed metadata —
    the schema a real media table would have."""
    return docs.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("text").alias("modality"),
        F.length(F.col(text_col)).alias("payload_bytes"),
    )


def decode_features(
    media: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    modality_col: str = "modality",
    batch_size: int = 256,
) -> DataFrame:
    """Arrow-batched decode/feature-extract: mapInPandas so each Python
    task streams record batches (bounded memory however large the table);
    repartition upstream if payloads skew. Output (id, features
    array<float>, feature_norm)."""
    import pandas as pd

    from hnsw_vector_db_spark.session import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)

    def run(batches):
        for pdf in batches:
            feats = [
                _decode_one(p, m)
                for p, m in zip(pdf[payload_col], pdf[modality_col])
            ]
            norms = [float(np.linalg.norm(f)) for f in feats]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "features": [f.tolist() for f in feats],
                    "feature_norm": norms,
                }
            )

    schema = f"{id_col} long, features array<float>, feature_norm double"
    return media.mapInPandas(run, schema)


def resize_media(
    media: DataFrame,
    target_w: int = 224,
    target_h: int = 224,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Resize plumbing: payload -> resized payload + output dims, as an
    Arrow-batched mapInPandas stage. The pixel transform is STUBBED (no
    PIL in this container): the fake 'resize' deterministically truncates/
    cycles the byte stream to w*h bytes so output sizes are exact and
    testable; a real decoder swaps ``_resize_one`` only. The contract that
    matters at scale is intact: binary in/binary out, per-batch Python
    cost, output size metadata as typed columns for downstream pruning."""
    import pandas as pd

    from hnsw_vector_db_spark.session import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)
    n_bytes = target_w * target_h

    def _resize_one(payload: bytes) -> bytes:
        if payload is None:
            return b""
        reps = -(-n_bytes // max(len(payload), 1))
        return (payload * reps)[:n_bytes]

    def run(batches):
        for pdf in batches:
            out = [_resize_one(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    payload_col: out,
                    "width": target_w,
                    "height": target_h,
                    "payload_bytes": [len(b) for b in out],
                }
            )

    schema = (
        f"{id_col} long, {payload_col} binary, width int, height int, "
        "payload_bytes long"
    )
    return media.mapInPandas(run, schema)


def frame_sample_plan(
    media: DataFrame,
    every_n: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame-sampling plumbing: explode a (stubbed) frame index per video
    payload — shows the row-explosion pattern (1 video -> n frames) whose
    fanout a real pipeline must budget shuffle partitions for."""
    n_frames = (F.col("payload_bytes") / 50).cast("int") + 1
    return media.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).alias("frame_idx"),
    )
