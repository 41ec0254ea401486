"""Snapshot sink/source (the reference's storage engine, SURVEY.md §2.1
#14-15) + the partition-pruning scale path for IVF cells."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hnsw_vector_db_spark.operators import similarity
from hnsw_vector_db_spark.plans.explain import physical_plan
from hnsw_vector_db_spark.sources.parquet import (
    load_table,
    snapshot_load,
    snapshot_save,
)


def test_snapshot_roundtrip(spark, sf_dir, tmp_path):
    """save_graph/load_graph equivalent: full-fidelity round trip,
    including the metric-survives-reload property the reference breaks
    (engine.py:84-91 drops distance_metric on load)."""
    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "snap")
    snapshot_save(emb, path)
    back = snapshot_load(spark, path)
    assert back.schema == emb.schema
    assert back.count() == emb.count()
    a = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    b = {r["vec_id"]: r["embedding"] for r in back.collect()}
    assert a == b


def test_ivf_snapshot_partition_pruning(spark, sf_dir, tmp_path):
    """Cell-partitioned snapshot: a cell-filtered scan must prune
    partitions at the source (the Spark analog of the reference's
    coarse-to-fine descent skipping graph regions)."""
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, centroids = similarity.ivf_fit(emb, n_cells=4)
    path = str(tmp_path / "ivf")
    snapshot_save(assigned, path, partition_by=["cell"])
    table = snapshot_load(spark, path)
    probed = table.filter(F.col("cell").isin([0, 1]))
    plan = physical_plan(probed)
    assert "PartitionFilters" in plan
    assert "cell" in plan.split("PartitionFilters")[1][:200], plan
    # pruned scan reads only the probed cells
    full, pruned = table.count(), probed.count()
    per_cell = {r["cell"]: r["n"] for r in table.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert pruned == per_cell.get(0, 0) + per_cell.get(1, 0)
    assert pruned < full


def test_bucketed_join_elides_shuffle(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key must join with ZERO exchanges
    (the 100 TB co-location story); the same join on plain tables
    shuffles both sides."""
    from hnsw_vector_db_spark.plans.explain import physical_plan, shuffle_count
    from hnsw_vector_db_spark.sources.bucketed import (
        colocated_join,
        save_bucketed,
    )

    # spark.sql.warehouse.dir is static config — managed tables land in the
    # session default; DROP TABLE below removes their data
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"), "lang"
    )
    save_bucketed(emb, "emb_b", "vec_id", n_buckets=8, sort_col="vec_id")
    save_bucketed(docs, "docs_b", "vec_id", n_buckets=8, sort_col="vec_id")
    # force the sort-merge path so the assertion is about bucketing, not
    # about the broadcast threshold hiding the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, "emb_b", "docs_b", "vec_id")
        assert shuffle_count(joined) == 0, physical_plan(joined)
        plain = emb.join(docs, "vec_id")
        assert shuffle_count(plain) >= 2
        # and the result is the same either way
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS emb_b")
        spark.sql("DROP TABLE IF EXISTS docs_b")


def test_bucketed_overwrite_respects_current_database(spark, sf_dir):
    """save_bucketed(mode='overwrite') on an UNQUALIFIED table name with a
    non-default current database must resolve (and delete) the CURRENT
    database's table directory — never the default database's same-named
    table (the wrong-table data-loss edge case)."""
    from hnsw_vector_db_spark.sources.bucketed import (
        _managed_location,
        save_bucketed,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    spark.sql("CREATE DATABASE IF NOT EXISTS altdb")
    try:
        # same-named table in BOTH databases
        save_bucketed(emb, "default.dual_t", "vec_id", n_buckets=4)
        spark.catalog.setCurrentDatabase("altdb")
        save_bucketed(emb.limit(10), "dual_t", "vec_id", n_buckets=4)
        default_loc = _managed_location(spark, "default.dual_t")
        alt_loc = _managed_location(spark, "dual_t")  # unqualified -> altdb
        assert default_loc != alt_loc
        assert "altdb.db" in str(alt_loc)
        # overwrite the altdb table while current db is altdb: the default
        # db's data must survive
        save_bucketed(emb.limit(20), "dual_t", "vec_id", n_buckets=4)
        assert spark.table("dual_t").count() == 20
        assert spark.table("default.dual_t").count() == emb.count()
        assert default_loc.exists()
    finally:
        spark.catalog.setCurrentDatabase("default")
        spark.sql("DROP TABLE IF EXISTS altdb.dual_t")
        spark.sql("DROP TABLE IF EXISTS default.dual_t")
        spark.sql("DROP DATABASE IF EXISTS altdb")


def test_cluster_write_produces_disjoint_file_ranges(spark, sf_dir, tmp_path):
    """Range-clustered layout: each parquet file owns a near-disjoint
    o_custkey range (footer min/max), so a pushed filter on the cluster
    key prunes ~(n-1)/n of the files without reading them. An unclustered
    write of the same data has every file spanning the whole domain."""
    from hnsw_vector_db_spark.sources.layout import cluster_write, file_ranges
    from hnsw_vector_db_spark.sources.parquet import load_table

    orders = load_table(spark, sf_dir, "orders")
    good = str(tmp_path / "clustered")
    bad = str(tmp_path / "unclustered")
    cluster_write(orders, good, ["o_custkey"], n_files=4)
    orders.repartition(4).write.mode("overwrite").parquet(bad)

    def overlap_count(ranges):
        n = 0
        for i, (lo1, hi1) in enumerate(ranges):
            for lo2, hi2 in ranges[i + 1 :]:
                if max(lo1, lo2) <= min(hi1, hi2):
                    n += 1
        return n

    clustered = file_ranges(good, "o_custkey")
    unclustered = file_ranges(bad, "o_custkey")
    assert len(clustered) >= 3
    # range partitioning: at most adjacent-boundary overlaps
    assert overlap_count(clustered) <= len(clustered) - 1
    # round-robin layout: every pair overlaps (nothing would prune)
    assert overlap_count(unclustered) == len(unclustered) * (len(unclustered) - 1) // 2
    # data integrity: same rows back
    assert spark.read.parquet(good).count() == orders.count()


def test_jsonl_roundtrip_and_quarantine(spark, sf_dir, tmp_path):
    """JSONL ingestion: explicit-schema single-pass read reproduces the
    parquet table exactly, and corrupt lines land in quarantine instead
    of failing the scan."""
    from hnsw_vector_db_spark.sources.jsonl import (
        read_documents_jsonl,
        write_documents_jsonl,
    )
    from hnsw_vector_db_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_jsonl")
    write_documents_jsonl(docs, out)

    # drop a file of corrupt lines into the corpus directory (appending
    # to a Spark-written part file would invalidate its .crc sidecar)
    with open(out + "/extra-bad.json", "w") as fh:
        fh.write('{"doc_id": 999999, "text": broken\n')
        fh.write("not json at all\n")

    good, bad = read_documents_jsonl(spark, out)
    assert bad.count() == 2
    assert good.count() == docs.count()
    # exact content round-trip
    assert good.exceptAll(docs).count() == 0
    assert docs.exceptAll(good).count() == 0


def test_compact_table_small_files(spark, sf_dir, tmp_path):
    """Compaction collapses a many-tiny-files table into the size target
    with the data intact, and re-clustering restores footer pruning
    (disjoint per-file ranges on the cluster key)."""
    from hnsw_vector_db_spark.sources.layout import (
        compact_table,
        file_ranges,
        table_file_stats,
    )
    from hnsw_vector_db_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "frag")
    # simulate a streaming sink's fragmentation: 40 tiny files
    docs.repartition(40).write.parquet(path)
    before_rows = docs.count()
    n_before, _ = table_file_stats(path)
    assert n_before >= 40

    stats = compact_table(spark, path, target_file_mb=256, cluster_cols=["doc_id"])
    assert stats["files_before"] == n_before
    assert stats["files_after"] <= 4  # tiny table -> ~1 file + range parts
    after = spark.read.parquet(path)
    assert after.count() == before_rows
    assert sorted(after.columns) == sorted(docs.columns)

    # re-clustered: per-file doc_id ranges must not overlap
    ranges = sorted(r for r in file_ranges(path, "doc_id") if r[0] is not None)
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2


def test_compact_table_idempotent_and_rerun_safe(spark, sf_dir, tmp_path):
    from hnsw_vector_db_spark.sources.layout import compact_table
    from hnsw_vector_db_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    path = str(tmp_path / "t")
    docs.repartition(10).write.parquet(path)
    s1 = compact_table(spark, path)
    s2 = compact_table(spark, path)  # second run: already compact, still safe
    assert s2["files_before"] == s1["files_after"]
    got = {r["doc_id"] for r in spark.read.parquet(path).collect()}
    assert got == {r["doc_id"] for r in docs.collect()}


def test_compact_table_rejects_partitioned_layout(spark, sf_dir, tmp_path):
    """Hive-partitioned directories have no top-level parquet files; the
    sizing would target one file and flatten the layout — refuse."""
    from hnsw_vector_db_spark.sources.layout import compact_table
    from hnsw_vector_db_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "parts")
    docs.write.partitionBy("lang").parquet(path)
    with pytest.raises(ValueError, match="no top-level parquet"):
        compact_table(spark, path)


def test_zorder_write_tightens_both_dimensions(spark, sf_dir, tmp_path):
    """Morton-clustered layout bounds footer ranges in BOTH dimensions:
    the per-file (span_x * span_y) rectangle area is a small fraction of
    the global domain area, so a filter on EITHER column prunes files —
    the property single-column range clustering cannot give the trailing
    dimension. Also: the z key is a bijection of the bucket pair (no
    row loss), and zorder_sql mirrors zorder_key bit-for-bit."""
    from pyspark.sql import functions as F

    from hnsw_vector_db_spark.sources.layout import (
        file_ranges,
        zorder_key,
        zorder_sql,
        zorder_write,
    )
    from hnsw_vector_db_spark.sources.parquet import load_table

    orders = load_table(spark, sf_dir, "orders")
    # both dims bucketed to the SAME 8-bit width — Morton interleaving
    # only clusters a dimension whose bucket actually uses the high
    # bits, so unequal widths leave the narrow dim unclustered
    bounds = orders.agg(
        F.max("o_custkey").alias("xhi"), F.max("o_totalprice").alias("yhi")
    ).first()
    x = F.least(F.floor(F.col("o_custkey") * 256.0 / (bounds["xhi"] + 1)), F.lit(255))
    y = F.least(F.floor(F.col("o_totalprice") * 256.0 / (bounds["yhi"] + 1)), F.lit(255))
    path = str(tmp_path / "zordered")
    zorder_write(orders, path, x, y, n_files=16, bits=8)

    assert spark.read.parquet(path).count() == orders.count()

    def mean_span(col):
        rs = file_ranges(path, col)
        return sum(hi - lo for lo, hi in rs) / len(rs), rs

    sx, rx = mean_span("o_custkey")
    sy, _ = mean_span("o_totalprice")
    gx = max(hi for _, hi in rx) - min(lo for lo, _ in rx)
    row = orders.agg(
        F.max("o_totalprice").alias("hi"), F.min("o_totalprice").alias("lo")
    ).first()
    gy = row["hi"] - row["lo"]
    # with 16 z-ordered files, each file's rectangle is a small slice of
    # the domain in the product — and BOTH single-dim spans shrink
    assert sx / gx < 0.8 and sy / gy < 0.8
    assert (sx / gx) * (sy / gy) < 0.30

    # spark zorder_key == duckdb zorder_sql on the same buckets
    import duckdb

    zs = (
        orders.select(
            "o_orderkey", zorder_key(x, y, 8).alias("z")
        )
        .orderBy("o_orderkey")
        .limit(200)
        .collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{sf_dir}/orders.parquet')"
    )
    zexpr = zorder_sql(
        f"CAST(least(floor(o_custkey * 256.0 / {bounds['xhi'] + 1}), 255) AS BIGINT)",
        f"CAST(least(floor(o_totalprice * 256.0 / {bounds['yhi'] + 1}), 255) AS BIGINT)",
        8,
    )
    dz = con.execute(
        f"SELECT o_orderkey, {zexpr} AS z FROM orders ORDER BY o_orderkey LIMIT 200"
    ).fetchall()
    assert [(r["o_orderkey"], r["z"]) for r in zs] == [tuple(t) for t in dz]


def test_partitioned_write_fans_out_and_preserves_rows(spark, sf_dir, tmp_path):
    """partitioned_write must NOT funnel a whole partition value into one
    task/file (the 100 TB one-file-per-month trap): with
    files_per_partition=4 each partition directory holds >1 and <=4
    files for a value with enough rows, and the read-back is lossless."""
    import os

    from hnsw_vector_db_spark.sources.layout import partitioned_write
    from hnsw_vector_db_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang"
    )
    path = str(tmp_path / "parts")
    partitioned_write(docs, path, ["lang"], files_per_partition=4)
    dirs = [d for d in os.listdir(path) if d.startswith("lang=")]
    assert dirs, "no partition directories written"
    biggest = max(
        dirs,
        key=lambda d: sum(
            os.path.getsize(os.path.join(path, d, f))
            for f in os.listdir(os.path.join(path, d))
            if f.endswith(".parquet")
        ),
    )
    n_files = len(
        [f for f in os.listdir(os.path.join(path, biggest)) if f.endswith(".parquet")]
    )
    assert 1 < n_files <= 4
    got = spark.read.parquet(path)
    assert got.count() == docs.count()
    assert {r["doc_id"] for r in got.select("doc_id").collect()} == {
        r["doc_id"] for r in docs.select("doc_id").collect()
    }
