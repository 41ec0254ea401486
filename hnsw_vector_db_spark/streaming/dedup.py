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
    engine's portable polynomial hash (Arrow-vectorized whole-document
    form, same constants and values as the batch operators) and keeps
    first-seen fingerprints. At 100 TB of
    stream state the key is the 8-byte hash, never the document body."""
    from hnsw_vector_db_spark.functions.text import poly_hash_bulk

    return stream_dedup_exact(
        doc_stream.withColumn("_fp", poly_hash_bulk(F.col(text_col))),
        ["_fp"],
        watermark,
        ts_col,
    ).drop("_fp")


# ---- streaming incremental dedup vs a versioned persisted index -----------

def init_dedup_index_root(
    docs: DataFrame,
    index_root: str,
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    seed: int = 42,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Write the historical corpus's dedup index as version ``v_init``
    and commit the ``_LATEST`` pointer — the starting state for
    :func:`start_streaming_incremental_dedup`."""
    import os

    from hnsw_vector_db_spark.operators.dedup import build_dedup_index

    os.makedirs(index_root, exist_ok=True)
    build_dedup_index(
        docs, os.path.join(index_root, "v_init"), k, bands, n, seed,
        text_col, id_col,
    )
    tmp = os.path.join(index_root, "_LATEST.tmp")
    with open(tmp, "w") as fh:
        fh.write("v_init")
    os.replace(tmp, os.path.join(index_root, "_LATEST"))


def start_streaming_incremental_dedup(
    spark,
    doc_dir: str,
    doc_schema: str,
    index_root: str,
    verdict_dir: str,
    checkpoint_dir: str,
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
    seed: int = 42,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_files_per_trigger: int = 1,
):
    """Continuous corpus ingestion with ONLINE near-dup gating — the
    production loop between crawl drops, streaming: each micro-batch is
    scored against the newest committed index version
    (operators/dedup.incremental_dedup — batch-only hashing, band join,
    signature-estimated Jaccard), its verdicts land in
    ``verdict_dir/v<batch_id>``, and the ACCEPTED docs' signatures are
    appended as index version ``v<batch_id>`` — so a duplicate in batch
    N of a doc first accepted in batch M < N is caught. Within-batch
    self-dedup is deliberately out of scope here (run the batch-tier
    operator on each drop first — the lambda split documented on
    stream_dedup_exact).

    Crash safety is the index_maintenance discipline verbatim: merge
    input resolved as the newest version STRICTLY below this batch_id
    (never through the mutable pointer), output written to a
    batch_id-derived directory (a replay rewrites it identically), the
    ``_LATEST`` pointer swapped last, and a fresh-checkpoint /
    maintained-index mismatch fails loudly instead of rolling back."""
    import os

    from pyspark.sql import functions as F
    from pyspark import StorageLevel

    from hnsw_vector_db_spark.operators.dedup import (
        _band_keys,
        incremental_dedup,
        minhash_signature_wide,
    )
    from hnsw_vector_db_spark.streaming.index_maintenance import (
        _input_version_for_batch,
    )

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        import re as _re

        ahead = sorted(
            name
            for name in os.listdir(index_root)
            if (m_ := _re.fullmatch(r"v(\d+)", name)) and int(m_.group(1)) > batch_id
        )
        if ahead:
            raise RuntimeError(
                f"index_root {index_root} already contains versions {ahead} "
                f"ahead of batch {batch_id}: checkpoint/index_root mismatch "
                "(fresh checkpoint against a maintained index?)"
            )
        in_version = _input_version_for_batch(index_root, batch_id)
        sigs = spark.read.parquet(os.path.join(in_version, "sigs"))
        bands_df = spark.read.parquet(os.path.join(in_version, "bands"))
        verdict = incremental_dedup(
            batch_df, sigs, bands_df, k, bands, n, threshold, seed,
            text_col, id_col,
        ).withColumn("batch", F.lit(batch_id).cast("int"))
        verdict.write.mode("overwrite").parquet(
            os.path.join(verdict_dir, f"v{batch_id}")
        )
        acc = batch_df.join(
            spark.read.parquet(os.path.join(verdict_dir, f"v{batch_id}"))
            .filter(~F.col("is_dup"))
            .select(id_col),
            id_col,
            "left_semi",
        )
        # persisted for the same reason as incremental_dedup's wide_new:
        # it feeds both the sigs and the bands append
        wide = minhash_signature_wide(
            acc, k, n, seed, text_col, id_col
        ).persist(StorageLevel.MEMORY_AND_DISK)
        out_version = os.path.join(index_root, f"v{batch_id}")
        sigs.unionByName(wide).write.mode("overwrite").parquet(
            os.path.join(out_version, "sigs")
        )
        bands_df.unionByName(_band_keys(wide, k, bands, id_col)).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_version, "bands"))
        wide.unpersist()
        tmp = os.path.join(index_root, "_LATEST.tmp")
        with open(tmp, "w") as fh:
            fh.write(f"v{batch_id}")
        os.replace(tmp, os.path.join(index_root, "_LATEST"))

    return (
        spark.readStream.schema(doc_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(doc_dir)
        .writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
