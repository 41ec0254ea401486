"""Streaming deduplication — the online form of operators/dedup.py.

A training-data ingest stream re-sees the same document (retries, crawler
revisits, replayed command logs — the reference replays its whole Raft log
on restart, `distributed/raft/node.py:298-309`, and its insert handler
silently overwrites re-used ids, `core/hnsw/graph.py:139`). Streaming
dedup keeps first-seen rows only, with state bounded by a watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hnsw_vector_db_spark.functions.text import poly_hash


def stream_dedup_exact(
    stream: DataFrame,
    key_cols: list[str],
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Keep the first row per key seen within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` stores one state row per key and
    evicts it once the watermark passes — bounded state, unlike a global
    ``dropDuplicates`` whose state grows forever on an unbounded stream.
    Duplicates farther apart than the watermark are NOT caught (that is
    the documented contract); catch those in the periodic batch dedup
    pass (operators/dedup.py) — the standard lambda-ish split.
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def stream_dedup_by_fingerprint(
    doc_stream: DataFrame,
    text_col: str = "text",
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Content dedup on a document stream: fingerprint the text with the
    engine's portable polynomial hash (pure codegen, same constants as the
    batch operators) and keep first-seen fingerprints. At 100 TB of
    stream state the key is the 8-byte hash, never the document body."""
    return stream_dedup_exact(
        doc_stream.withColumn("_fp", poly_hash(F.col(text_col))),
        ["_fp"],
        watermark,
        ts_col,
    ).drop("_fp")
