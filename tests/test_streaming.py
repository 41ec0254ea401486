"""Structured Streaming: command-log ingest folds to the right table state;
streaming windowed agg == its batch twin."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hnsw_vector_db_spark.operators.events import windowed_agg
from hnsw_vector_db_spark.sources.parquet import load_events
from hnsw_vector_db_spark.streaming.ingest import (
    COMMAND_SCHEMA,
    apply_commands_batch,
    start_ingest,
)
from hnsw_vector_db_spark.streaming.windows import (
    run_stream_as_batch,
    stream_windowed_counts,
)


def test_apply_commands_batch(spark):
    table = spark.createDataFrame(
        [(1, [1.0], "a"), (2, [2.0], "b")],
        "vec_id long, embedding array<float>, label string",
    )
    commands = spark.createDataFrame(
        [
            ("insert", 3, [3.0], "c", 1),
            ("delete", 1, None, None, 2),
            ("insert", 2, [9.0], "b2", 3),   # upsert
            ("insert", 4, [4.0], "d", 4),
            ("delete", 4, None, None, 5),    # insert-then-delete: delete wins
        ],
        COMMAND_SCHEMA,
    )
    out = apply_commands_batch(table, commands)
    got = {r["vec_id"]: r["label"] for r in out.collect()}
    assert got == {2: "b2", 3: "c"}


def test_streaming_ingest_end_to_end(spark, tmp_path):
    log_dir = str(tmp_path / "log")
    table_dir = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(log_dir)
    batch1 = spark.createDataFrame(
        [("insert", 1, [1.0], "a", 1), ("insert", 2, [2.0], "b", 2)],
        COMMAND_SCHEMA,
    )
    batch1.coalesce(1).write.mode("append").parquet(log_dir)
    q = start_ingest(spark, log_dir, table_dir, ckpt)
    q.awaitTermination()
    got = {r["vec_id"]: r["label"] for r in spark.read.parquet(table_dir).collect()}
    assert got == {1: "a", 2: "b"}
    # second micro-batch: delete 1, upsert 2
    batch2 = spark.createDataFrame(
        [("delete", 1, None, None, 3), ("insert", 2, [9.0], "b2", 4)],
        COMMAND_SCHEMA,
    )
    batch2.coalesce(1).write.mode("append").parquet(log_dir)
    q2 = start_ingest(spark, log_dir, table_dir, ckpt)
    q2.awaitTermination()
    got2 = {r["vec_id"]: r["label"] for r in spark.read.parquet(table_dir).collect()}
    assert got2 == {2: "b2"}


def test_stream_window_equals_batch(spark, sf_dir, tmp_path):
    ev = load_events(spark, sf_dir)
    # batch twin
    batch = windowed_agg(ev, "15 minutes").select(
        "window_start", "event_type", "n_events", "sum_value"
    )
    # stream over the same rows via a file source
    src = str(tmp_path / "events_src")
    ev.write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    result = run_stream_as_batch(
        stream_windowed_counts(stream, "15 minutes", "30 minutes"),
        str(tmp_path / "ckpt"),
    )
    b = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in batch.collect()
    }
    s = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in result.collect()
    }
    assert b == s


def test_streaming_ingest_bootstrap_batch_folds_commands(spark, tmp_path):
    """The FIRST micro-batch must apply last-per-id + delete semantics,
    not just keep every insert row."""
    log_dir = str(tmp_path / "log0")
    table_dir = str(tmp_path / "table0")
    ckpt = str(tmp_path / "ckpt0")
    os.makedirs(log_dir)
    batch = spark.createDataFrame(
        [
            ("insert", 1, [1.0], "a", 1),
            ("insert", 1, [9.0], "a2", 2),   # same-id update in same batch
            ("insert", 2, [2.0], "b", 3),
            ("delete", 2, None, None, 4),    # insert-then-delete in same batch
        ],
        COMMAND_SCHEMA,
    )
    batch.coalesce(1).write.mode("append").parquet(log_dir)
    q = start_ingest(spark, log_dir, table_dir, ckpt)
    q.awaitTermination()
    got = {r["vec_id"]: r["label"] for r in spark.read.parquet(table_dir).collect()}
    assert got == {1: "a2"}


def test_streaming_knn_serving_matches_batch(spark, sf_dir, tmp_path):
    """Queries streamed in two micro-batches get the same answers as one
    batch knn over the union."""
    from pyspark.sql import functions as SF

    from hnsw_vector_db_spark.operators.knn import knn_batch
    from hnsw_vector_db_spark.sources.parquet import load_table
    from hnsw_vector_db_spark.streaming.serving import start_knn_serving

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(SF.col("vec_id") < 6).select(
        SF.col("vec_id").alias("query_id"), SF.col("embedding").alias("query_vec")
    )
    qdir, out, ckpt = (str(tmp_path / d) for d in ("q", "out", "ckpt"))
    queries.filter("query_id < 3").coalesce(1).write.mode("append").parquet(qdir)
    queries.filter("query_id >= 3").coalesce(1).write.mode("append").parquet(qdir)
    q = start_knn_serving(spark, qdir, emb, out, ckpt, k=5)
    q.awaitTermination()
    served = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in spark.read.parquet(out).collect()
    }
    batch = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in knn_batch(queries, emb, k=5).collect()
    }
    assert served == batch


def test_streaming_ann_serving_matches_batch_hnsw_search(spark, sf_dir, tmp_path):
    """ANN serving (start_knn_serving_ann): queries streamed in two
    micro-batches against the persisted index get EXACTLY the batch
    hnsw_search answers on the union (both are pure functions of the
    index + query set), and the staleness guard refuses a version skew."""
    import pytest as _pytest
    from pyspark.sql import functions as SF

    from hnsw_vector_db_spark.operators.hnsw_partition import (
        hnsw_build,
        hnsw_search,
    )
    from hnsw_vector_db_spark.operators.similarity import ivf_fit
    from hnsw_vector_db_spark.sources.parquet import load_table
    from hnsw_vector_db_spark.streaming.serving import start_knn_serving_ann

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, centroids = ivf_fit(emb, n_cells=4)
    index = hnsw_build(assigned).cache()
    queries = emb.filter(SF.col("vec_id") < 6).select(
        SF.col("vec_id").alias("query_id"), SF.col("embedding").alias("query_vec")
    )
    qdir, out, ckpt = (str(tmp_path / d) for d in ("q", "out", "ckpt"))
    queries.filter("query_id < 3").coalesce(1).write.mode("append").parquet(qdir)
    queries.filter("query_id >= 3").coalesce(1).write.mode("append").parquet(qdir)
    with _pytest.raises(RuntimeError, match="stale"):
        start_knn_serving_ann(
            spark, qdir, index, centroids, out, ckpt,
            index_version=1, table_version=2,
        )
    with _pytest.raises(ValueError, match="BOTH"):
        start_knn_serving_ann(
            spark, qdir, index, centroids, out, ckpt, index_version=1,
        )
    q = start_knn_serving_ann(
        spark, qdir, index, centroids, out, ckpt,
        k=5, ef=64, nprobe=2, index_version=3, table_version=3,
    )
    q.awaitTermination()
    served = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in spark.read.parquet(out).collect()
    }
    batch = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in hnsw_search(
            index, queries, centroids, k=5, ef=64, nprobe=2
        ).collect()
    }
    assert served == batch and len(served) == 30


def test_streaming_index_maintenance(spark, sf_dir, tmp_path):
    """Streamed vector batches fold into the persisted HNSW index via the
    incremental merge; the committed version serves searches that find
    every inserted vector at distance 0, and equals the same merge done
    in batch (both are pure functions of state+batch)."""
    from pyspark.sql import functions as F

    from hnsw_vector_db_spark.operators.hnsw_partition import (
        hnsw_build,
        hnsw_insert,
        hnsw_search,
    )
    from hnsw_vector_db_spark.operators.similarity import ivf_fit
    from hnsw_vector_db_spark.sources.parquet import load_table
    from hnsw_vector_db_spark.streaming.index_maintenance import (
        init_index_root,
        load_latest_index,
        start_index_maintenance,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, centroids = ivf_fit(emb, n_cells=4)
    index_root = str(tmp_path / "index")
    init_index_root(hnsw_build(assigned), index_root)

    new = emb.filter(F.col("vec_id") < 4).select(
        (F.col("vec_id") + 2_000_000).alias("vec_id"),
        F.col("embedding").cast("array<float>").alias("embedding"),
    )
    vec_dir = str(tmp_path / "incoming")
    new.coalesce(1).write.mode("overwrite").parquet(vec_dir)

    q = start_index_maintenance(
        spark, vec_dir, index_root, centroids, str(tmp_path / "ckpt")
    )
    q.awaitTermination()

    latest = load_latest_index(spark, index_root)
    # deterministic merge: streamed result == batch hnsw_insert result
    batch_merged = hnsw_insert(
        spark.read.parquet(index_root + "/v_init"), new, centroids
    )
    assert latest.exceptAll(batch_merged).count() == 0
    assert batch_merged.exceptAll(latest).count() == 0

    queries = new.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    hits = hnsw_search(latest, queries, centroids, k=1, ef=64, nprobe=2)
    for r in hits.collect():
        assert r["dist"] < 1e-6
        assert r["vec_id"] in (r["query_id"], r["query_id"] - 2_000_000)


def test_index_maintenance_fresh_checkpoint_mismatch_fails(spark, sf_dir, tmp_path):
    """A FRESH checkpoint pointed at an index_root that already holds
    merged versions must fail loudly, not silently roll the index back:
    restarted batch ids begin at 0, so without the guard the merge input
    resolves to v_init and the pointer re-swings to v0, discarding every
    previously merged version."""
    from pyspark.sql import functions as F

    from hnsw_vector_db_spark.operators.hnsw_partition import hnsw_build
    from hnsw_vector_db_spark.operators.similarity import ivf_fit
    from hnsw_vector_db_spark.sources.parquet import load_table
    from hnsw_vector_db_spark.streaming.index_maintenance import (
        init_index_root,
        start_index_maintenance,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, centroids = ivf_fit(emb, n_cells=4)
    index_root = str(tmp_path / "index")
    built = hnsw_build(assigned)
    init_index_root(built, index_root)
    # simulate a previously maintained index: a committed v1 ahead of the
    # fresh stream's batch 0
    built.write.mode("overwrite").parquet(index_root + "/v1")
    with open(index_root + "/_LATEST", "w") as fh:
        fh.write("v1")

    new = emb.filter(F.col("vec_id") < 2).select(
        (F.col("vec_id") + 3_000_000).alias("vec_id"),
        F.col("embedding").cast("array<float>").alias("embedding"),
    )
    vec_dir = str(tmp_path / "incoming")
    new.coalesce(1).write.mode("overwrite").parquet(vec_dir)

    q = start_index_maintenance(
        spark, vec_dir, index_root, centroids, str(tmp_path / "fresh_ckpt")
    )
    with pytest.raises(Exception, match="does not match this index_root"):
        q.awaitTermination()
    # the committed pointer was not rolled back
    with open(index_root + "/_LATEST") as fh:
        assert fh.read().strip() == "v1"


def test_stream_session_windows_equal_batch_sessionize(spark, sf_dir, tmp_path):
    """Declarative session_window sessions == batch lag+cumsum sessions
    on (user, session_start, n_events) — same gap rule, three
    implementations (built-in streaming / stateful pandas / batch
    window) one semantics."""
    from hnsw_vector_db_spark.operators.events import sessionize
    from hnsw_vector_db_spark.streaming.windows import (
        run_stream_as_batch,
        stream_session_windows,
    )

    ev = load_events(spark, sf_dir)
    batch = sessionize(ev, gap_minutes=30).select(
        "user_id", "session_start", "n_events"
    )
    src = str(tmp_path / "ev_src")
    ev.write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    got = run_stream_as_batch(
        stream_session_windows(stream, "30 minutes", "10 days"),
        str(tmp_path / "ckpt_sw"),
    ).select("user_id", "session_start", "n_events")
    b = {(r["user_id"], r["session_start"], r["n_events"]) for r in batch.collect()}
    s = {(r["user_id"], r["session_start"], r["n_events"]) for r in got.collect()}
    assert b == s


def test_corpus_stages_run_as_streaming_queries(spark, sf_dir, tmp_path):
    """The stateless corpus stages (PII redaction, chunking, quality
    scoring) are pure projections, so the SAME operator code runs
    unmodified inside a streaming query — batch output == streamed
    output row for row."""
    from pyspark.sql import functions as F

    from hnsw_vector_db_spark.operators import corpus
    from hnsw_vector_db_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents")
    src = str(tmp_path / "docs_src")
    docs.write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)

    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt_c")
    q = (
        corpus.pii_redact(corpus.chunk_documents(stream, chunk_chars=300, overlap=50)
                          .select("doc_id", F.col("chunk_text").alias("text")))
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    streamed = spark.read.parquet(out_dir)
    batch = corpus.pii_redact(
        corpus.chunk_documents(docs, chunk_chars=300, overlap=50)
        .select("doc_id", F.col("chunk_text").alias("text"))
    )
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0


def test_stream_stream_attribution_join_equals_batch(spark, tmp_path):
    """Event-time stream-stream join run to completion == the batch range
    join on the same rows; window boundaries inclusive on both ends."""
    import datetime as dt

    from hnsw_vector_db_spark.streaming.joins import stream_view_click_join

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def m(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    views = spark.createDataFrame(
        [(1, m(0), 7, 0.0), (2, m(60), 7, 0.0), (3, m(0), 8, 0.0)],
        "event_id long, ts timestamp, user_id long, value double",
    )
    clicks = spark.createDataFrame(
        [
            (10, m(10), 7, 1.5),   # matches view 1 (and not view 2: earlier)
            (11, m(30), 7, 2.5),   # matches view 1 at the exact boundary
            (12, m(85), 7, 3.5),   # matches view 2 only (25' after it)
            (13, m(31), 8, 4.5),   # 31' after view 3: outside the window
            (14, m(5), 9, 5.5),    # no view for user 9
        ],
        "event_id long, ts timestamp, user_id long, value double",
    )
    views.write.parquet(str(tmp_path / "v"))
    clicks.write.parquet(str(tmp_path / "c"))
    schema = "event_id long, ts timestamp, user_id long, value double"
    vs = spark.readStream.schema(schema).parquet(str(tmp_path / "v"))
    cs = spark.readStream.schema(schema).parquet(str(tmp_path / "c"))
    out = run_stream_as_batch(
        stream_view_click_join(vs, cs),
        str(tmp_path / "ckpt"),
        name="attr_test",
        output_mode="append",
    )
    got = sorted((r["view_id"], r["click_id"]) for r in out.collect())
    assert got == [(1, 10), (1, 11), (2, 12)]
    # batch twin: identical pairs from a plain range join
    cond = (
        (views.user_id == clicks.user_id)
        & (clicks.ts >= views.ts)
        & (clicks.ts <= views.ts + F.expr("INTERVAL 30 minutes"))
    )
    batch = sorted(
        (r["v"], r["c"])
        for r in views.join(clicks, cond)
        .select(views.event_id.alias("v"), clicks.event_id.alias("c"))
        .collect()
    )
    assert got == batch


def test_streaming_incremental_dedup_equals_sequential_batches(
    spark, sf_dir, tmp_path
):
    """Stream (foreachBatch + versioned index) verdicts == running
    incremental_dedup sequentially with manual index evolution — and the
    index root follows the v_init/v0/v1 + _LATEST pointer discipline."""
    import glob
    import time

    from hnsw_vector_db_spark.operators.dedup import (
        build_dedup_index,
        incremental_dedup,
        minhash_signature_wide,
        _band_keys,
    )
    from hnsw_vector_db_spark.sources.parquet import load_table
    from hnsw_vector_db_spark.streaming.dedup import (
        init_dedup_index_root,
        start_streaming_incremental_dedup,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    old = docs.filter(F.col("doc_id") % 5 != 0)
    b0 = docs.filter(F.col("doc_id") % 10 == 0)
    b1 = docs.filter(F.col("doc_id") % 10 == 5)

    src = str(tmp_path / "src")
    b0.coalesce(1).write.parquet(src, mode="append")
    first = set(glob.glob(f"{src}/*.parquet"))
    b1.coalesce(1).write.parquet(src, mode="append")
    t0 = time.time()
    for f in glob.glob(f"{src}/*.parquet"):
        os.utime(f, (t0, t0) if f in first else (t0 + 10, t0 + 10))

    root = str(tmp_path / "index")
    init_dedup_index_root(old, root)
    q = start_streaming_incremental_dedup(
        spark, src, "doc_id long, text string", root,
        str(tmp_path / "verdicts"), str(tmp_path / "ckpt"),
    )
    q.awaitTermination()

    assert {"v_init", "v0", "v1", "_LATEST"} <= set(os.listdir(root))
    with open(f"{root}/_LATEST") as fh:
        assert fh.read().strip() == "v1"

    streamed = sorted(
        map(tuple, spark.read.parquet(f"{root.rsplit('/',1)[0]}/verdicts/v0",
                                      f"{root.rsplit('/',1)[0]}/verdicts/v1")
            .select("doc_id", "batch", "best_match", "est_jaccard", "is_dup")
            .collect())
    )

    # manual sequential replay
    man_root = str(tmp_path / "manidx")
    build_dedup_index(old, man_root)
    sigs = spark.read.parquet(f"{man_root}/sigs")
    bands = spark.read.parquet(f"{man_root}/bands")
    v0 = incremental_dedup(b0, sigs, bands)
    acc0 = b0.join(v0.filter(~F.col("is_dup")).select("doc_id"),
                   "doc_id", "left_semi")
    w0 = minhash_signature_wide(acc0)
    v1 = incremental_dedup(
        b1, sigs.unionByName(w0),
        bands.unionByName(_band_keys(w0, 16, 4, "doc_id")),
    )
    manual = sorted(
        map(tuple,
            v0.withColumn("batch", F.lit(0))
            .unionByName(v1.withColumn("batch", F.lit(1)))
            .select("doc_id", "batch", "best_match", "est_jaccard", "is_dup")
            .collect())
    )
    assert streamed == manual


def test_streaming_token_shards_generations(spark, tmp_path):
    """Generation sink end to end: two micro-batches land as gen-00000 /
    gen-00001, _LATEST names the newest, the union read-back equals
    packing each batch separately, and a REPLAY of a batch rewrites its
    generation byte-identically (the exactly-once argument)."""
    import glob
    import time

    from hnsw_vector_db_spark.operators.corpus import pack_token_ids
    from hnsw_vector_db_spark.streaming.shards import (
        latest_generation,
        read_shard_generations,
        start_streaming_token_shards,
    )

    rows = [(d, [(d * 7 + j) % 50 for j in range(5 + d % 9)])
            for d in range(40)]
    ids_df = spark.createDataFrame(rows, "doc_id long, ids array<long>")
    src = str(tmp_path / "src")
    ids_df.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(
        src, mode="append"
    )
    first = set(glob.glob(f"{src}/*.parquet"))
    ids_df.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(
        src, mode="append"
    )
    t0 = time.time()
    for f in glob.glob(f"{src}/*.parquet"):
        os.utime(f, (t0, t0) if f in first else (t0 + 10, t0 + 10))
    out = str(tmp_path / "gens")
    q = start_streaming_token_shards(
        spark, src, "doc_id long, ids array<long>", out,
        str(tmp_path / "ckpt"), seq_len=16, n_shards=4,
    )
    q.awaitTermination()
    assert latest_generation(out) == "gen-00001"
    back = read_shard_generations(spark, out)
    got = {
        (r["generation"], r["doc_id"] % 4, r["doc_id"] // 4): list(r["ids"])
        for r in back.collect()
    }
    # stream == batch: pack each half independently
    expect = {}
    for gen in (0, 1):
        half = ids_df.filter(F.col("doc_id") % 2 == gen)
        for r in pack_token_ids(half, seq_len=16, n_shards=4).collect():
            expect[(gen, r["shard"], r["seq_id"])] = list(r["ids"])
    assert got == expect
    # replay idempotence: re-writing batch 1's generation is byte-equal
    blobs = {
        f: open(f, "rb").read()
        for f in glob.glob(f"{out}/gen-00001/*")
    }
    from hnsw_vector_db_spark.sources.token_shards import write_token_shards

    packed1 = pack_token_ids(
        ids_df.filter(F.col("doc_id") % 2 == 1), seq_len=16, n_shards=4
    ).withColumn("_sid", F.col("seq_id") * 4 + F.col("shard"))
    write_token_shards(
        packed1, f"{out}/gen-00001", id_col="_sid", ids_col="ids",
        n_shards=4,
    ).collect()
    for f, blob in blobs.items():
        assert open(f, "rb").read() == blob, f


def test_shard_generation_pointer_hadoop_path(spark, tmp_path):
    """Object-store-parity surface (r12): the _LATEST pointer and the
    generation listing go through the Hadoop FileSystem API — a
    file:/// URI out_root (a non-POSIX-path Hadoop URI) round-trips,
    and a missing pointer falls back to the max listed generation."""
    from hnsw_vector_db_spark.streaming.shards import (
        _list_generations,
        _write_pointer,
        latest_generation,
        read_shard_generations,
        start_streaming_token_shards,
    )

    rows = [(d, [d, d + 1, d + 2, d + 3]) for d in range(16)]
    ids_df = spark.createDataFrame(rows, "doc_id long, ids array<long>")
    src = str(tmp_path / "src")
    ids_df.coalesce(1).write.parquet(src)
    out_uri = "file://" + str(tmp_path / "gens")  # Hadoop URI, not a path
    q = start_streaming_token_shards(
        spark, src, "doc_id long, ids array<long>", out_uri,
        str(tmp_path / "ckpt"), seq_len=4, n_shards=2,
    )
    q.awaitTermination()
    assert latest_generation(out_uri, spark) == "gen-00000"
    assert _list_generations(spark, out_uri) == ["gen-00000"]
    assert read_shard_generations(spark, out_uri).count() == 16
    # pointer swap is rename-based: no torn temp file left behind
    assert not (tmp_path / "gens" / "_LATEST.tmp").exists()
    assert (tmp_path / "gens" / "_LATEST").read_text() == "gen-00000"
    # overwrite path: swapping again through the same rename succeeds
    _write_pointer(spark, out_uri, "gen-00000")
    assert latest_generation(out_uri, spark) == "gen-00000"
    # missing-pointer fallback (the object-store copy+delete window):
    # resolve via the listing instead of failing
    (tmp_path / "gens" / "_LATEST").unlink()
    assert latest_generation(out_uri, spark) == "gen-00000"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no _LATEST"):
        latest_generation("file://" + str(tmp_path / "empty"), spark)
