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
