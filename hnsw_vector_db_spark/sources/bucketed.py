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


def _strip_file_scheme(uri: str) -> str:
    for prefix in ("file://", "file:"):
        if uri.startswith(prefix):
            return uri[len(prefix):]
    return uri


def _managed_location(spark: SparkSession, table_name: str) -> Path:
    """Filesystem location of a managed table of this name, resolved
    through the CATALOG — never by path arithmetic that assumes the
    default database: an unqualified name in a non-default current
    database must map into that database's directory, or an overwrite
    could rmtree a same-named default-db table's data. Resolution order:
    the table's own catalog location when it exists (also correct for
    databases created with a custom LOCATION), else the owning
    database's locationUri + table name."""
    parts = table_name.split(".")
    if len(parts) == 2:
        db, tbl = parts
    else:
        db, tbl = spark.catalog.currentDatabase(), parts[-1]
    try:
        if spark.catalog.tableExists(table_name):
            loc_rows = [
                r
                for r in spark.sql(f"DESCRIBE FORMATTED {table_name}").collect()
                if r["col_name"].strip() == "Location"
            ]
            if loc_rows:
                return Path(_strip_file_scheme(loc_rows[0]["data_type"].strip()))
    except Exception:
        pass  # fall through to the database-location derivation
    db_loc = _strip_file_scheme(spark.catalog.getDatabase(db).locationUri)
    return Path(db_loc) / tbl


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
        # resolve the location BEFORE the drop, while the catalog still
        # knows the table's true directory
        loc = _managed_location(spark, table_name)
        spark.sql(f"DROP TABLE IF EXISTS {table_name}")
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
