"""Bucketed tables — co-located joins without a shuffle.

At 100 TB the dominant cost of every id-keyed operation (metadata attach,
upsert-by-id, delete verification, vector-to-doc joins) is the shuffle of
the big fact table. Bucketing pre-hashes rows into a fixed number of
files per bucket key at WRITE time, so every later equi-join or groupBy
on that key reads co-located partitions and skips the exchange entirely —
the Spark-native equivalent of the reference keeping its whole keyed dict
in one process (`core/hnsw/graph.py:66`), except it scales.

Bucketed writes go through the session catalog (``saveAsTable``): bucket
metadata lives in the metastore, which is what lets the planner trust the
layout and elide the Exchange (assert via plans.explain.shuffle_count).
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def _managed_location(spark: SparkSession, table_name: str) -> Path:
    """Filesystem location a managed table of this name would occupy in
    the session warehouse (``db.table`` -> wh/db.db/table)."""
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    for prefix in ("file://", "file:"):
        if wh.startswith(prefix):
            wh = wh[len(prefix):]
            break
    parts = table_name.split(".")
    if len(parts) == 2:
        return Path(wh) / f"{parts[0]}.db" / parts[1]
    return Path(wh) / parts[-1]


def save_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed by ``bucket_col``. ``sort_col`` sorts
    within buckets (turns later merge joins into zipper scans). Pick
    n_buckets so one bucket of the table at target scale is a few hundred
    MB: 100 TB / 16384 buckets ~ 6 GB — size up with data, it cannot be
    changed without a rewrite.

    Re-run safe: an overwrite first drops the catalog entry AND any
    orphaned warehouse directory a killed prior run left behind (data dir
    without metastore entry -> ``saveAsTable`` throws
    LOCATION_ALREADY_EXISTS otherwise)."""
    spark = df.sparkSession
    if mode == "overwrite":
        spark.sql(f"DROP TABLE IF EXISTS {table_name}")
        loc = _managed_location(spark, table_name)
        if loc.exists():
            shutil.rmtree(loc)
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table_name)


def load_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Open a bucketed table through the catalog (a plain path read would
    lose the bucket spec and re-shuffle)."""
    return spark.table(table_name)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str,
    how: str = "inner",
) -> DataFrame:
    """Equi-join two same-bucketed tables on their bucket key: with
    matching bucket counts the planner reads bucket i of both sides into
    the same task — zero Exchange on either side."""
    return load_bucketed(spark, left_table).join(
        load_bucketed(spark, right_table), on, how
    )
