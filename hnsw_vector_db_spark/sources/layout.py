"""Data-layout optimization for scan pruning — the write-side half of
"push down and prune".

At 100 TB the cheapest query is the one that never reads most files:
parquet footers carry per-column min/max, and Spark skips whole files
(and row groups) whose range can't match a pushed filter. That only
works if the WRITE clustered the data — a randomly-laid-out table has
every file's min/max spanning the whole domain, so nothing prunes.

``cluster_write`` is the standard recipe: range-partition on the
cluster keys (each output file owns a contiguous key range), sort
within partitions (row groups inside the file are clustered too), and
cap rows per file. The reference has no layout story at all — its scan
is a full mmap of one snapshot file (`core/storage/engine.py:57-126`);
this module is what replaces it when the corpus outgrows one machine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def cluster_write(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int = 8,
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` range-clustered on ``cluster_cols``.

    Each output file owns a contiguous range of the cluster key
    (repartitionByRange) and is internally sorted (sortWithinPartitions)
    so row-group statistics prune within files as well. A later read
    with a filter on the leading cluster column touches ~1/n_files of
    the data (see tests/test_sources.py for the measured footer-range
    assertion).
    """
    cols = [F.col(c) for c in cluster_cols]
    writer = (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
    )
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def partitioned_write(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    files_per_partition: int = 4,
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` hive-partitioned on ``partition_cols`` — the
    standard 100 TB date/tenant layout: each distinct partition value
    becomes a directory, and a later read with a filter on the
    partition column PRUNES whole directories at planning time
    (`PartitionFilters` on the scan — no file is opened, no footer
    read; contrast `cluster_write`, which prunes via row-group stats
    INSIDE files).

    Skew tradeoff: a plain ``repartition(*partition_cols)`` hash-routes
    EVERY row of one partition value into a single task — for the
    low-cardinality date/tenant layout this is a one-task funnel
    writing one giant file per month. So the pre-shuffle key is
    (partition_cols + a deterministic row-hash salt mod
    ``files_per_partition``): each partition value fans out over up to
    ``files_per_partition`` writer tasks, i.e. that many files per
    directory instead of one unbounded file — the knob trades write
    parallelism against file count (`compact_table` cleans up if set
    too high). ``max_records_per_file`` additionally caps file size
    inside a task. The salt is xxhash64 over all columns, so re-runs
    place rows identically (deterministic retries, stable layouts).

    The repartition carries an EXPLICIT partition count (the session's
    shuffle-partition setting): a user-specified count opts the
    exchange out of AQE partition coalescing, which at small volumes
    would merge the salted fan-out right back into one writer task —
    the salt exists precisely to prevent that."""
    cols = [F.col(c) for c in partition_cols]
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns]),
        F.lit(max(1, files_per_partition)),
    )
    n_shuffle = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    writer = (
        df.repartition(n_shuffle, *cols, salt)
        .write.partitionBy(*partition_cols)
        .mode("overwrite")
    )
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def file_ranges(path: str, column: str) -> list[tuple]:
    """Per-file (min, max) footer statistics for ``column`` — the
    evidence that pruning will work. Driver-side pyarrow metadata read:
    O(files), no data scan."""
    import os

    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == column and col.statistics is not None:
                    s = col.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        out.append((lo, hi))
    return out


def table_file_stats(path: str) -> tuple[int, int]:
    """(n_files, total_bytes) of a parquet directory — driver-side
    listing, no data scan."""
    import os

    n, total = 0, 0
    for name in os.listdir(path):
        if name.endswith(".parquet"):
            n += 1
            total += os.path.getsize(os.path.join(path, name))
    return n, total


def compact_table(
    spark,
    path: str,
    target_file_mb: int = 256,
    cluster_cols: list[str] | None = None,
) -> dict:
    """Small-files compaction — the maintenance job every streaming
    ingest needs. Micro-batch sinks (``streaming/ingest.py``) land one
    file set per trigger; after a day a 100 TB table is millions of
    KB-sized files and every scan pays per-file open + footer costs that
    dwarf the data read. Compaction rewrites the table into
    ~``target_file_mb`` files (optionally re-clustered via the
    ``cluster_write`` recipe so footer pruning works again) and swaps
    the directory atomically-enough: write to a temp dir, rename old ->
    .bak, temp -> live, drop .bak. A transactional table format
    (Delta/Iceberg OPTIMIZE) does the swap with real isolation; on plain
    parquet there is a brief window where readers must not list the
    directory — run it from the table's maintenance owner, exactly like
    the index-version swap in ``streaming/index_maintenance.py``.

    Returns {files_before, files_after, bytes, target_files}.
    """
    import os
    import shutil

    n_before, total = table_file_stats(path)
    if n_before == 0:
        # nested/hive-partitioned layouts would size target=1 and funnel
        # the whole table through one task while flattening the layout
        raise ValueError(
            f"{path} has no top-level parquet files (partitioned/nested "
            "layout?) - compact each partition directory individually"
        )
    target = max(1, round(total / (target_file_mb * 1024 * 1024)) or 1)
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".compact.tmp"
    bak = path.rstrip("/") + ".compact.bak"
    if cluster_cols:
        cluster_write(df, tmp, cluster_cols, n_files=target)
    else:
        df.repartition(target).write.mode("overwrite").parquet(tmp)
    if os.path.exists(bak):
        shutil.rmtree(bak)
    os.rename(path, bak)
    os.rename(tmp, path)
    shutil.rmtree(bak)
    n_after, _ = table_file_stats(path)
    return {
        "files_before": n_before,
        "files_after": n_after,
        "bytes": total,
        "target_files": target,
    }


def zorder_key(xbucket, ybucket, bits: int = 16):
    """Morton (Z-order) interleave of two pre-bucketed non-negative int
    columns: bit b of x lands at position 2b, bit b of y at 2b+1 —
    locality in EITHER dimension maps to locality on the single z key.

    Pure bit arithmetic on JVM columns (shiftleft/shiftright/and/or —
    whole-stage codegen, no UDF), and the identical expression is
    SQL-portable, so the key itself is oracle-checkable cross-engine.
    """
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    x = xbucket.cast("long")
    y = ybucket.cast("long")
    for b in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), 2 * b)
        )
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(y, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        )
    return z


def zorder_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """The exact SQL twin of :func:`zorder_key` — one OR-chain of
    shifted bits, generated from the same loop so Spark and the oracle
    can never drift."""
    # every term is FULLY parenthesized: Postgres-family grammars give
    # `<<`, `&`, and `|` equal precedence left-to-right, so a bare
    # `a << 0 | b << 1` chain parses as `((a << 0) | b) << 1`
    parts = []
    for b in range(bits):
        parts.append(f"(((({x_expr}) >> {b}) & 1) << {2 * b})")
        parts.append(f"(((({y_expr}) >> {b}) & 1) << {2 * b + 1})")
    return "(" + " | ".join(parts) + ")"


def zorder_write(
    df: DataFrame,
    path: str,
    xbucket,
    ybucket,
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Write ``df`` clustered on the Morton key of two dimensions:
    range-partition on z (each file owns a contiguous z range == a
    bounded rectangle union in (x, y)), sort within partitions so row
    groups cluster too. Unlike ``cluster_write`` on (x, y) — which
    bounds only the LEADING column's footer range — every file's
    min/max is tight in BOTH dimensions, so a filter on either column
    alone prunes files (the multi-dimensional layout Delta/Iceberg call
    OPTIMIZE ZORDER BY; here it is 10 lines over the same
    repartitionByRange machinery)."""
    zdf = df.withColumn("_z", zorder_key(xbucket, ybucket, bits))
    (
        zdf.repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
