"""Streaming ingest — the Spark-native replacement for the reference's
replicated write path.

Reference parity: a write in the reference is (leader gate ->) append to a
replicated command log -> block until majority commit -> apply to the
index (`distributed/raft/node.py:280-309`, `api/rest/distributed_server.py:
268-320`). Structured Streaming gives the same contract with zero custom
consensus code: the source (a parquet/file drop directory standing in for
a Kafka topic) is the ordered command log; checkpointing + exactly-once
sink semantics replace commit-wait; "read from any replica, slightly
stale" (`distributed_server.py:323-356`) becomes "readers see the table as
of the last completed micro-batch".

Commands mirror the reference's log entries (`distributed_server.py:
95-118`): type in {insert, delete}, id, vector, metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

COMMAND_SCHEMA = StructType(
    [
        StructField("op", StringType()),        # 'insert' | 'delete'
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", StringType()),     # metadata analog
        StructField("seq", LongType()),         # log position
    ]
)


def read_command_stream(spark: SparkSession, log_dir: str) -> DataFrame:
    """Open the command-log directory as a stream (one file per appended
    micro-batch — the file-drop analog of a Kafka topic partition)."""
    return spark.readStream.schema(COMMAND_SCHEMA).parquet(log_dir)


def apply_commands_batch(table: DataFrame, commands: DataFrame) -> DataFrame:
    """Apply one micro-batch of commands to the vectors table — the
    set-oriented twin of the reference's ``apply_command`` loop
    (`distributed_server.py:95-121`): last command per id wins (log order),
    deletes drop, inserts upsert.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(F.col("seq").desc())
    latest = (
        commands.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    inserts = latest.filter(F.col("op") == "insert").select(
        "vec_id", "embedding", "label"
    )
    deletes = latest.filter(F.col("op") == "delete").select("vec_id")
    survived = table.join(
        F.broadcast(latest.select("vec_id")), "vec_id", "left_anti"
    )
    return survived.unionByName(inserts, allowMissingColumns=True).join(
        F.broadcast(deletes), "vec_id", "left_anti"
    )


def start_ingest(
    spark: SparkSession,
    log_dir: str,
    table_dir: str,
    checkpoint_dir: str,
):
    """Continuously fold the command stream into the vectors table via
    foreachBatch (read-modify-write per micro-batch; on a transactional
    table format this would be a MERGE). Exactly-once via checkpoint —
    the role Raft's commit index plays in the reference."""
    import os

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        if os.path.exists(table_dir):
            table = sp.read.parquet(table_dir)
        else:
            # bootstrap through the SAME fold as every other batch: a raw
            # "keep the inserts" shortcut would mishandle a first batch
            # holding duplicate ids or insert-then-delete sequences
            table = sp.createDataFrame(
                [], "vec_id long, embedding array<float>, label string"
            )
        new = apply_commands_batch(table, batch_df)
        # localCheckpoint materializes before overwriting the input path
        new.localCheckpoint(eager=True).write.mode("overwrite").parquet(table_dir)

    return (
        read_command_stream(spark, log_dir)
        .writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
