"""Streaming ANN-index maintenance — the reference's write path landing
in the index, continuously.

In the reference every insert mutates the HNSW graph inline under the
global lock (`api/rest/server.py:202-230` -> `core/hnsw/graph.py:127-173`
via the Raft log, `distributed/raft/node.py`). The Spark-native shape
splits that into the stream half (this module) and the merge half
(`operators/hnsw_partition.hnsw_insert`): a stream of new vectors is
folded into the PERSISTED per-cell index once per micro-batch — cells
that receive no vectors pass through untouched, so per-trigger work is
O(touched cells + batch), not O(index).

Crash safety: the merged index is written to a ``batch_id``-derived
directory and a tiny ``_LATEST`` pointer file is swapped last, so readers
always load a complete index version. Because foreachBatch is
at-least-once, a replayed batch must NOT read through the mutable
pointer (a crash after the pointer swap but before the checkpoint commit
would make the replay merge the batch into its own output): the merge
input is resolved deterministically as the newest version with id
strictly below the current ``batch_id``, so a replay always re-reads the
pre-batch state and rewrites ``v<batch_id>`` identically. This is the
streaming analog of the reference's snapshot-then-rename
(`core/storage/engine.py:23-56`).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

VECTOR_SCHEMA = "vec_id long, embedding array<float>"


def read_vector_stream(spark: SparkSession, vec_dir: str) -> DataFrame:
    return spark.readStream.schema(VECTOR_SCHEMA).parquet(vec_dir)


def latest_index_path(index_root: str) -> str:
    """Resolve the current committed index version via the pointer file."""
    import os

    with open(os.path.join(index_root, "_LATEST")) as fh:
        return os.path.join(index_root, fh.read().strip())


def load_latest_index(spark: SparkSession, index_root: str) -> DataFrame:
    return spark.read.parquet(latest_index_path(index_root))


def _input_version_for_batch(index_root: str, batch_id: int) -> str:
    """Deterministic merge input: newest version with id < ``batch_id``.

    ``v_init`` sorts below every batch id. Independent of the mutable
    ``_LATEST`` pointer, so an at-least-once replay of batch N re-reads
    the same pre-N state even if the pointer already advanced to vN
    before the crash.
    """
    import os
    import re

    best_id, best_name = None, None
    for name in os.listdir(index_root):
        if name == "v_init":
            vid = -1
        else:
            m = re.fullmatch(r"v(\d+)", name)
            if not m:
                continue
            vid = int(m.group(1))
        if vid < batch_id and (best_id is None or vid > best_id):
            best_id, best_name = vid, name
    if best_name is None:
        raise FileNotFoundError(
            f"no index version below batch {batch_id} in {index_root}; "
            "initialize with init_index_root"
        )
    return os.path.join(index_root, best_name)


def start_index_maintenance(
    spark: SparkSession,
    vec_dir: str,
    index_root: str,
    centroids: np.ndarray,
    checkpoint_dir: str,
    metric: str = "cosine",
    m: int = 8,
    ef_construction: int = 64,
):
    """Fold each micro-batch of new vectors into the persisted index.

    Per trigger: read the newest index version below this batch_id, run
    the incremental
    ``hnsw_insert`` (only routed cells deserialize/rebuild), write the
    merged index to ``v<batch_id>/``, then swap the ``_LATEST`` pointer.
    Searches (`hnsw_search`) always read a fully-written version through
    :func:`load_latest_index`; a crash mid-write leaves the pointer on
    the previous complete version.

    The initial index (``v_init`` + pointer) must exist — create it with
    ``hnsw_build`` + :func:`init_index_root`.
    """
    import os

    from hnsw_vector_db_spark.operators.hnsw_partition import hnsw_insert

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # Checkpoint/index_root mismatch guard: a FRESH checkpoint against
        # an index_root that already holds merged versions restarts batch
        # ids at 0 — the merge input would silently resolve to v_init and
        # the pointer re-swing to v0, DISCARDING every previously merged
        # version. Versions with id > batch_id (other than this batch's
        # own replay output, id == batch_id) can only mean that mismatch,
        # never an at-least-once replay — fail loudly instead of rolling
        # the index back.
        import re as _re

        ahead = sorted(
            name
            for name in os.listdir(index_root)
            if (m_ := _re.fullmatch(r"v(\d+)", name)) and int(m_.group(1)) > batch_id
        )
        if ahead:
            raise RuntimeError(
                f"index_root {index_root} already contains versions {ahead} "
                f"ahead of batch {batch_id}: the stream checkpoint does not "
                "match this index_root (fresh checkpoint against a "
                "previously maintained index?). Refusing to roll the index "
                "back; use a fresh index_root or the original checkpoint."
            )
        # resolve input by batch_id, NOT via _LATEST: a replay after a
        # crash between pointer swap and checkpoint commit must re-read
        # the pre-batch version, never its own prior output
        current = spark.read.parquet(_input_version_for_batch(index_root, batch_id))
        merged = hnsw_insert(
            current, batch_df, centroids, metric=metric, m=m,
            ef_construction=ef_construction,
        )
        version = f"v{batch_id}"
        merged.write.mode("overwrite").parquet(os.path.join(index_root, version))
        # pointer swap commits the version; replay re-swaps identically
        tmp = os.path.join(index_root, "_LATEST.tmp")
        with open(tmp, "w") as fh:
            fh.write(version)
        os.replace(tmp, os.path.join(index_root, "_LATEST"))

    return (
        read_vector_stream(spark, vec_dir)
        .writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def init_index_root(index: DataFrame, index_root: str) -> None:
    """Write the initial index version and commit the pointer."""
    import os

    index.write.mode("overwrite").parquet(os.path.join(index_root, "v_init"))
    tmp = os.path.join(index_root, "_LATEST.tmp")
    with open(tmp, "w") as fh:
        fh.write("v_init")
    os.replace(tmp, os.path.join(index_root, "_LATEST"))
