"""Streaming ANN serving — continuous top-k answering over a query stream.

The reference serves point queries over REST, one request at a time under
the index lock (`api/rest/server.py:159-186`, `core/hnsw/graph.py:70`).
The Spark-native serving shape is micro-batch: a stream of query vectors
(file drop / Kafka topic) is answered per trigger with the set-oriented
kNN operators against a static (periodically refreshed) corpus, results
appended to a sink. Latency is trigger-bound (seconds, not ms — this is
the near-line tier; see README limitations), but throughput scales with
executors and a 10^5-query burst costs the same plan as 10 queries.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

QUERY_SCHEMA = "query_id long, query_vec array<float>"


def read_query_stream(
    spark: SparkSession, query_dir: str, schema: str = QUERY_SCHEMA
) -> DataFrame:
    return spark.readStream.schema(schema).parquet(query_dir)


def start_knn_serving(
    spark: SparkSession,
    query_dir: str,
    corpus: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    k: int = 10,
    metric: str = "cosine",
    query_schema: str = QUERY_SCHEMA,
):
    """Answer each micro-batch of queries with exact batch kNN against the
    (cached) corpus and write (query_id, vec_id, dist, rank) to a parquet
    sink, one hive-partition directory per micro-batch. foreachBatch alone
    is at-least-once (a crash between the write and the checkpoint commit
    replays the batch), so each batch OVERWRITES its own
    ``batch_id=<id>`` directory — the replay is idempotent, restoring
    effective exactly-once output. At 100 TB the corpus side would be the
    bucketed/IVF-partitioned table and the per-batch operator an
    approximate path (knn_auto handles the switch).
    """
    from hnsw_vector_db_spark.operators.knn import knn_auto

    corpus = corpus.cache()
    n_corpus = corpus.count()  # materialize once; every micro-batch reuses it

    def _answer(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        res = knn_auto(batch_df, corpus, k=k, metric=metric, corpus_rows=n_corpus)
        # batch_id-derived path + overwrite => replaying a failed batch
        # rewrites the same files instead of appending duplicates
        res.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    return (
        # pass "query_id long, query_vec array<double>" as query_schema
        # when downstream consumers compare distances cross-engine: the
        # float32 default costs ~1e-7 relative on the query side, which
        # a 6dp-rounded oracle can see
        read_query_stream(spark, query_dir, schema=query_schema)
        .writeStream.foreachBatch(_answer)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def start_knn_serving_ann(
    spark: SparkSession,
    query_dir: str,
    index: DataFrame,
    centroids: np.ndarray,
    out_dir: str,
    checkpoint_dir: str,
    k: int = 10,
    ef: int = 64,
    nprobe: int = 2,
    metric: str = "cosine",
    index_version: int | None = None,
    table_version: int | None = None,
    query_schema: str = QUERY_SCHEMA,
):
    """ANN-backed streaming serving — the shape that survives 100 TB.

    :func:`start_knn_serving` answers each micro-batch with an EXACT
    scan of the corpus: correct, and fine while the corpus is cacheable,
    but the per-batch cost is O(corpus) forever. The reference's
    /search loop (`api/rest/server.py:159-186`) is an INDEX lookup; this
    is that lifecycle on a stream: each micro-batch runs
    :func:`~..operators.hnsw_partition.hnsw_search` against the
    PERSISTED per-cell index (built once by ``hnsw_build``, read back
    from parquet), so per-batch cost is O(probed cells), independent of
    corpus size. Same idempotent sink contract as the exact server
    (per-``batch_id`` directory overwrite = effective exactly-once
    under at-least-once foreachBatch replay).

    Staleness guard (the api.py ``search_approx`` contract,
    api.py:384): when ``index_version``/``table_version`` are supplied
    they must match, else we refuse to START serving — an index that
    predates the latest corpus write silently serves wrong neighbors
    (the reference happily does; we don't). Versionless callers (ad-hoc
    index + frozen corpus) may pass neither."""
    from hnsw_vector_db_spark.operators.hnsw_partition import hnsw_search

    if (index_version is None) != (table_version is None):
        raise ValueError(
            "pass BOTH index_version and table_version (or neither): a "
            "one-sided version can't prove freshness"
        )
    if index_version is not None and index_version != table_version:
        raise RuntimeError(
            f"index is stale (index_version={index_version} != "
            f"table_version={table_version}); rebuild before serving — a "
            "stale index silently drops every vector written since build"
        )
    index = index.cache()
    index.count()  # materialize once; every micro-batch probes the cache

    def _answer(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        res = hnsw_search(
            index, batch_df, centroids, k=k, ef=ef, nprobe=nprobe,
            metric=metric,
        )
        res.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    return (
        read_query_stream(spark, query_dir, schema=query_schema)
        .writeStream.foreachBatch(_answer)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
