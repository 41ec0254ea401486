"""Parquet sources/sinks — the engine's entire storage layer.

Reference parity: ``core/storage/engine.py`` hand-rolls a snapshot format
(msgpack topology + raw float64 matrix with an 8-byte shape header + JSON
metadata, `engine.py:19-68`) and a loader that rebuilds per-node dicts
(`engine.py:70-115`). Parquet replaces all of it: columnar layout (the
reference's offset-addressed dense matrix, `engine.py:45-47`, is exactly a
poor man's column chunk), schema-on-read, predicate pushdown, column
pruning, and partition discovery come free. We deliberately do NOT
reproduce the reference's load bug where `distance_metric` is dropped on
restore (`engine.py:84-91` — a cosine index silently reloads as euclidean);
our metric is a per-query argument, never table state.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table (schema from the parquet footer)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def pin_event_time_confs(spark: SparkSession) -> None:
    """SESSION-WIDE side effect, applied on purpose: pin the session
    timezone to UTC and enable the legacy nanos-as-long parquet read.

    Sessions built by :mod:`hnsw_vector_db_spark.session` already carry
    ``spark.sql.session.timeZone=UTC`` from construction, making this a
    no-op there. For FOREIGN sessions (the correctness driver's own), the
    pin must still happen before the first events read or epoch
    arithmetic diverges from the DuckDB oracle's naive ``epoch(ts)`` —
    and because it is session state, every query run after this call
    sees UTC rendering/casting semantics. That is the engine's contract
    (all timestamps are UTC instants), not an accident; this helper
    exists so the mutation is one named, documented place instead of a
    hidden loader side effect."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # unconditional set (idempotent): conf.get with a sentinel default is
    # not usable here — Spark 4 validates the DEFAULT against the conf's
    # timezone validator and throws on non-timezone sentinels
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize the events table's ``ts`` to a session-UTC TIMESTAMP.

    The generator has shipped two physical types across rounds:
    TIMESTAMP(NANOS), which Spark's reader rejects ([PARQUET_TYPE_ILLEGAL])
    unless read as LONG via the legacy conf, and TIMESTAMP(MICROS)
    isAdjustedToUTC=false, which Spark reads as TIMESTAMP_NTZ (not castable
    to BIGINT, so lag/gap arithmetic breaks). Both are wall-clock times;
    :func:`pin_event_time_confs` (a documented session-wide pin) makes
    either form read as a plain UTC TIMESTAMP so every downstream
    epoch-seconds cast is deterministic and matches the DuckDB oracle."""
    pin_event_time_confs(spark)
    from pyspark.sql import functions as F

    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ts_type = dict(df.dtypes)["ts"]
    if ts_type == "bigint":  # nanos read as long
        df = df.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
    elif ts_type == "timestamp_ntz":  # micros, wall clock == UTC instant
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Scan every testdata table present in sf_dir."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = spark.read.parquet(path)
    return out


def snapshot_save(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Persist a vectors (or any) table — replaces `save_graph`
    (`engine.py:23-68`). ``partition_by`` enables partition pruning on
    read; at 100 TB partition on a coarse key (e.g. IVF cluster id or
    ingest date), never on a high-cardinality id.
    """
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def snapshot_load(spark: SparkSession, path: str) -> DataFrame:
    """Re-open a snapshot — replaces `load_graph` (`engine.py:70-115`)."""
    return spark.read.parquet(path)
