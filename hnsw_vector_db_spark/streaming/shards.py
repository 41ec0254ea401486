"""Streaming APPEND of trainer shards: each micro-batch of tokenized
documents is packed into fixed-length sequences and written as a new
binary ``.bin``/``.idx`` shard GENERATION, with a ``_LATEST`` pointer
swapped last — continuous corpus growth ending at the mmappable trainer
artifact (the stream_incremental_dedup crash-safety discipline applied
to :mod:`~hnsw_vector_db_spark.sources.token_shards`).

Generation layout under ``out_root``::

    gen-00000/shard-00000.bin/.idx ... (batch 0's packed sequences)
    gen-00001/...                      (batch 1's)
    _LATEST                            (name of the newest generation)

Why generations, not in-place append: the binary format is
offset-addressed (an in-place append would rewrite every index), and a
generation directory is a pure function of its micro-batch — an
at-least-once REPLAY of batch N rewrites ``gen-N`` byte-identically
(deterministic routing, doc-order layout, exact prefix sums), so the
sink is effectively exactly-once without a commit log. The ``_LATEST``
pointer is written to a temp file and ``os.replace``d (atomic on POSIX)
AFTER the generation lands, the index_maintenance rule: readers resolve
a complete generation or the previous one, never a torn write.

FILESYSTEM REQUIREMENT: like the underlying
:func:`~hnsw_vector_db_spark.sources.token_shards.write_token_shards`
(which already refuses to run off ``local[...]``), the generation
LISTING (:func:`read_shard_generations`'s glob), the ``_LATEST``
pointer IO, and the atomic ``os.replace`` swap use driver-local
filesystem APIs — ``out_root`` must be a mount the driver and every
executor share. Object-store parity would route these through the
Hadoop FileSystem API (and give up POSIX-atomic rename for a
conditional put); that is out of scope for this sink by design.

Tokenization happens UPSTREAM (the source stream carries
``(doc_id, ids)``): packing/sharding is the operator under test, and a
streaming tokenizer must hold its vocab fixed anyway (the byte-level
tier's data-independent vocab, or a frozen word-level id map) — vocab
drift across micro-batches would make generations mutually unreadable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F


def start_streaming_token_shards(
    spark,
    src_dir: str,
    src_schema: str,
    out_root: str,
    checkpoint_dir: str,
    seq_len: int = 128,
    n_shards: int = 8,
    id_col: str = "doc_id",
    ids_col: str = "ids",
    dtype: str = "uint32",
    max_files_per_trigger: int = 1,
):
    """Run the generation sink to completion (``availableNow``) over a
    parquet stream of ``(id_col, ids_col)`` rows. Per micro-batch:
    :func:`~hnsw_vector_db_spark.operators.corpus.pack_token_ids`
    (shard = doc_id mod n_shards, doc-order concat, seq_len windows,
    tails dropped) → sequences keyed ``sid = seq_id*n_shards + shard``
    (so the binary routing preserves the pack shards) →
    :func:`~hnsw_vector_db_spark.sources.token_shards.write_token_shards`
    into ``out_root/gen-<batch_id>`` → ``_LATEST`` swap. Returns the
    started query; callers ``awaitTermination()``."""
    from hnsw_vector_db_spark.operators.corpus import pack_token_ids
    from hnsw_vector_db_spark.sources.token_shards import write_token_shards

    os.makedirs(out_root, exist_ok=True)

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        packed = pack_token_ids(
            batch_df,
            seq_len=seq_len,
            n_shards=n_shards,
            id_col=id_col,
            ids_col=ids_col,
        ).withColumn(
            "_sid", F.col("seq_id") * n_shards + F.col("shard")
        )
        gen = f"gen-{int(batch_id):05d}"
        write_token_shards(
            packed,
            os.path.join(out_root, gen),
            id_col="_sid",
            ids_col="ids",
            n_shards=n_shards,
            dtype=dtype,
        ).collect()  # bounded manifest — runs the write
        tmp = os.path.join(out_root, "_LATEST.tmp")
        with open(tmp, "w") as fh:
            fh.write(gen)
        os.replace(tmp, os.path.join(out_root, "_LATEST"))

    return (
        spark.readStream.schema(src_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
        .writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_shard_generations(spark, out_root: str) -> DataFrame:
    """Read EVERY generation back: one
    :func:`~hnsw_vector_db_spark.sources.token_shards.read_token_shards`
    scan per ``gen-*`` directory (one binaryFile task per shard inside
    each), unioned with the generation number parsed from the directory
    name. The directory listing is a bounded driver glob (one entry per
    micro-batch ever committed)."""
    import glob

    from hnsw_vector_db_spark.sources.token_shards import read_token_shards

    gens = sorted(glob.glob(os.path.join(out_root, "gen-*")))
    if not gens:
        raise ValueError(f"no generations under {out_root}")
    parts = []
    for g in gens:
        gen_no = int(os.path.basename(g).split("-")[1])
        parts.append(
            read_token_shards(spark, g).withColumn(
                "generation", F.lit(gen_no).cast("int")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def latest_generation(out_root: str) -> str:
    """Resolve the ``_LATEST`` pointer (the reader-facing entry point)."""
    with open(os.path.join(out_root, "_LATEST")) as fh:
        return fh.read().strip()
