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
sink is effectively exactly-once without a commit log.

POINTER / LISTING IO (object-store parity, r12): the ``_LATEST``
pointer and the generation listing go through the **Hadoop FileSystem
API** (``Path.getFileSystem`` on the session's Hadoop conf), not
driver-local ``open``/``glob`` — so ``out_root`` may be any Hadoop-
resolvable URI (``file:///``, ``hdfs://``, ``s3a://``, ...; bare local
paths resolve through the default ``file:`` scheme and behave exactly
as before). The swap discipline is write-temp-then-rename via
``FileContext.rename(..., Options.Rename.OVERWRITE)``; rename
semantics per store: ATOMIC on HDFS and local/POSIX (readers resolve a
complete generation or the previous one, never a torn write), while
object stores emulate rename as copy+delete — not atomic, so on
``s3a://``-class stores a reader can observe a missing pointer for the
copy window. :func:`latest_generation` therefore falls back to the
max ``gen-*`` directory when the pointer is absent, which is correct
under the generation invariant (a listed ``gen-N`` is only ever
written by batch N and re-written byte-identically on replay).

DATA-FILE REQUIREMENT (narrower than before): the generation PAYLOAD
still goes through
:func:`~hnsw_vector_db_spark.sources.token_shards.write_token_shards`,
whose executor tasks write with plain ``open()`` — so the shard
payload itself still needs a driver+executor-shared mount (that
function refuses to run off ``local[...]``); only the pointer and the
listing are store-agnostic here.

Tokenization happens UPSTREAM (the source stream carries
``(doc_id, ids)``): packing/sharding is the operator under test, and a
streaming tokenizer must hold its vocab fixed anyway (the byte-level
tier's data-independent vocab, or a frozen word-level id map) — vocab
drift across micro-batches would make generations mutually unreadable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def _hadoop(spark: SparkSession, path: str):
    """(FileSystem, Path, jvm) for ``path`` under the session's Hadoop
    conf — the one routing point for every pointer/listing operation."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath, jvm


def _local_payload_path(path: str) -> str:
    """The POSIX path for the generation PAYLOAD writer
    (:func:`write_token_shards` writes with plain ``open()`` in
    executor tasks — the documented local/shared-mount constraint).
    ``file://`` URIs strip to their path; any other scheme is refused
    with the constraint named rather than silently writing a literal
    ``scheme:`` directory."""
    if path.startswith("file:"):
        from urllib.parse import urlparse

        return urlparse(path).path
    if "://" in path:
        raise ValueError(
            f"{path}: generation payloads are written with plain open() "
            "inside executor tasks and need a local/shared POSIX mount "
            "(file:// or a bare path); only the _LATEST pointer and the "
            "gen-* listing are store-agnostic"
        )
    return path


def _active_spark() -> SparkSession:
    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            "no active SparkSession — generation pointer/listing IO "
            "resolves paths through the session's Hadoop configuration"
        )
    return spark


def _write_pointer(spark: SparkSession, out_root: str, gen: str) -> None:
    """Write ``_LATEST`` via temp-file + rename-OVERWRITE through the
    Hadoop FileSystem API (atomic on HDFS/local; copy+delete on object
    stores — see the module docstring for the reader-side fallback)."""
    fs, _, jvm = _hadoop(spark, out_root)
    tmp = jvm.org.apache.hadoop.fs.Path(out_root + "/_LATEST.tmp")
    dst = jvm.org.apache.hadoop.fs.Path(out_root + "/_LATEST")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(gen.encode("utf-8")))
    finally:
        out.close()
    fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
        dst.toUri(), spark._jsc.hadoopConfiguration()
    )
    opts = spark.sparkContext._gateway.new_array(
        jvm.org.apache.hadoop.fs.Options.Rename, 1
    )
    opts[0] = jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
    fc.rename(tmp, dst, opts)


def _list_generations(spark: SparkSession, out_root: str) -> list[str]:
    """Generation directory names under ``out_root``, sorted — one
    ``globStatus`` call against the store's listing API (bounded: one
    entry per micro-batch ever committed)."""
    fs, _, jvm = _hadoop(spark, out_root)
    glob = jvm.org.apache.hadoop.fs.Path(out_root + "/gen-*")
    statuses = fs.globStatus(glob)
    if statuses is None:
        return []
    return sorted(
        st.getPath().getName() for st in statuses if st.isDirectory()
    )


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
    into ``out_root/gen-<batch_id>`` → ``_LATEST`` swap (Hadoop
    FileContext rename — see the module docstring). Returns the
    started query; callers ``awaitTermination()``."""
    from hnsw_vector_db_spark.operators.corpus import pack_token_ids
    from hnsw_vector_db_spark.sources.token_shards import write_token_shards

    _local_payload_path(out_root)  # fail fast on an unwritable scheme
    fs, root, _ = _hadoop(spark, out_root)
    fs.mkdirs(root)

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
            os.path.join(_local_payload_path(out_root), gen),
            id_col="_sid",
            ids_col="ids",
            n_shards=n_shards,
            dtype=dtype,
        ).collect()  # bounded manifest — runs the write
        _write_pointer(spark, out_root, gen)

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
    name. The listing is one Hadoop ``globStatus`` call (bounded: one
    entry per micro-batch ever committed)."""
    from hnsw_vector_db_spark.sources.token_shards import read_token_shards

    gens = _list_generations(spark, out_root)
    if not gens:
        raise ValueError(f"no generations under {out_root}")
    parts = []
    for g in gens:
        gen_no = int(g.split("-")[1])
        parts.append(
            read_token_shards(spark, os.path.join(out_root, g)).withColumn(
                "generation", F.lit(gen_no).cast("int")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def latest_generation(out_root: str, spark: SparkSession | None = None) -> str:
    """Resolve the ``_LATEST`` pointer (the reader-facing entry point)
    through the Hadoop FileSystem API. If the pointer is absent — the
    copy+delete window on object-store renames, or a crash between the
    generation landing and the swap — fall back to the max listed
    ``gen-*`` directory, which the generation invariant makes safe
    (each gen-N is written only by batch N, byte-identically on
    replay)."""
    spark = spark or _active_spark()
    fs, _, jvm = _hadoop(spark, out_root)
    ptr = jvm.org.apache.hadoop.fs.Path(out_root + "/_LATEST")
    if fs.exists(ptr):
        stream = fs.open(ptr)
        try:
            chunks = []
            while True:
                b = stream.read()
                if b < 0:
                    break
                chunks.append(b)
            return bytes(chunks).decode("utf-8").strip()
        finally:
            stream.close()
    gens = _list_generations(spark, out_root)
    if not gens:
        raise ValueError(f"{out_root}: no _LATEST pointer and no gen-* dirs")
    return gens[-1]
