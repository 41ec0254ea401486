"""Custom stateful streaming operator (applyInPandasWithState
sessionization) + watermark late-data semantics."""

from __future__ import annotations

import datetime as dt
import time

from pyspark.sql import functions as F

from hnsw_vector_db_spark.operators.events import sessionize
from hnsw_vector_db_spark.sources.parquet import load_events
from hnsw_vector_db_spark.streaming.stateful import stream_sessionize
from hnsw_vector_db_spark.streaming.windows import stream_windowed_counts

T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def _min(m: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=m)


EV_SCHEMA = "user_id long, ts timestamp, value double"


def _run_files_stream(spark, tmp_path, batches, build, one_file_per_trigger=True):
    """Write each batch as one parquet file, stream with availableNow
    (maxFilesPerTrigger=1 => one micro-batch per file, so watermarks
    advance between batches), collect from a memory sink."""
    src = str(tmp_path / "src")
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(0.05)  # strictly increasing mtimes => deterministic file order
    reader = spark.readStream.schema(EV_SCHEMA)
    if one_file_per_trigger:
        reader = reader.option("maxFilesPerTrigger", 1)
    stream = reader.parquet(src)
    out = build(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("stateful_result")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("stateful_result").collect()


def test_stream_sessionize_exact(spark, tmp_path):
    # user 1: events at 0,10min (one session), then 120min (new session)
    # user 2: single event at 5min
    # sentinel user 99 far in the future advances the watermark in batch 2
    # so every real session times out and is emitted.
    batch1 = [
        (1, _min(0), 1.0),
        (1, _min(10), 2.0),
        (1, _min(120), 4.0),
        (2, _min(5), 8.0),
    ]
    batch2 = [(99, _min(10_000), 0.0)]
    rows = _run_files_stream(
        spark,
        tmp_path,
        [batch1, batch2],
        lambda s: stream_sessionize(s, gap="30 minutes", watermark="30 minutes"),
    )
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.sum_value)
        for r in rows
    }
    assert got == {
        (1, _min(0), _min(10), 2, 3.0),
        (1, _min(120), _min(120), 1, 4.0),
        (2, _min(5), _min(5), 1, 8.0),
    }


def test_stream_sessionize_matches_batch_twin(spark, sf_dir, tmp_path):
    """Closed stream sessions == the batch sessionize result for the same
    slice (a far-future sentinel closes everything)."""
    ev = (
        load_events(spark, sf_dir)
        .filter(F.col("user_id") < 10)
        .select("user_id", "ts", "value")
    )
    batch = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sessionize(ev, gap_minutes=30).collect()
    }
    max_ts = ev.agg(F.max("ts")).first()[0]
    sentinel = [(9999, max_ts + dt.timedelta(days=7), 0.0)]
    rows = _run_files_stream(
        spark,
        tmp_path,
        [[(r.user_id, r.ts, r.value) for r in ev.collect()], sentinel],
        lambda s: stream_sessionize(s, gap="30 minutes", watermark="30 minutes"),
    )
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in rows
        if r.user_id != 9999
    }
    assert got == batch


def test_watermark_drops_late_event(spark, tmp_path):
    """An event arriving after the watermark finalized its window is
    dropped. The drop guarantee needs the window EVICTED before the late
    row's batch: watermark advances at batch N's commit, state evicts
    during batch N+1, so the late row must land in batch N+2 (hence the
    spacer batch)."""
    on_time = [
        (1, _min(0), 1.0),
        (1, _min(5), 1.0),
        (1, _min(100), 1.0),  # advances watermark to 100-30=70min > window [0,15)
    ]
    spacer = [(2, _min(101), 1.0)]  # batch whose close evicts window [0,15)
    late = [(1, _min(1), 100.0)]  # belongs to the already-evicted [0,15) window
    flush = [(1, _min(10_000), 0.0)]
    rows = _run_files_stream(
        spark,
        tmp_path,
        [on_time, spacer, late, flush],
        lambda s: stream_windowed_counts(
            s.withColumn("event_type", F.lit("e")), "15 minutes", "30 minutes"
        ),
    )
    by_window = {r.window_start: (r.n_events, r.sum_value) for r in rows}
    assert by_window[_min(0)] == (2, 2.0)  # late row NOT counted


def test_stream_dedup_exact(spark, tmp_path):
    from hnsw_vector_db_spark.streaming.dedup import stream_dedup_exact

    batch1 = [(1, _min(0), 1.0), (1, _min(5), 2.0), (2, _min(3), 3.0)]
    batch2 = [(1, _min(8), 4.0), (3, _min(9), 5.0)]  # user 1 still duplicate
    rows = _run_files_stream(
        spark,
        tmp_path,
        [batch1, batch2],
        lambda s: stream_dedup_exact(s, ["user_id"], watermark="30 minutes"),
    )
    got = {(r.user_id, r.value) for r in rows}
    # first row per user wins, across micro-batches
    assert got == {(1, 1.0), (2, 3.0), (3, 5.0)}


def test_stream_dedup_by_fingerprint(spark, tmp_path):
    from hnsw_vector_db_spark.streaming.dedup import stream_dedup_by_fingerprint

    src = str(tmp_path / "docs_src")
    docs = [
        (1, _min(0), "hello world"),
        (2, _min(1), "something else"),
        (3, _min(2), "hello world"),   # content dup of 1, different id
    ]
    spark.createDataFrame(docs, "doc_id long, ts timestamp, text string").coalesce(
        1
    ).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, ts timestamp, text string").parquet(src)
    out = stream_dedup_by_fingerprint(stream, watermark="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("fp_dedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    kept = {r.doc_id for r in spark.table("fp_dedup").collect()}
    assert 2 in kept
    assert len(kept & {1, 3}) == 1  # exactly one copy of the duplicate text
    assert set(spark.table("fp_dedup").columns) == {"doc_id", "ts", "text"}


def test_stream_sessionize_late_in_watermark_event(spark, tmp_path):
    """A late event (within the watermark) arriving in a later micro-batch
    must widen the open session, not rewind it: final session is
    [2min, 20min] with all 4 events."""
    batch1 = [(1, _min(10), 1.0), (1, _min(20), 2.0)]
    late = [(1, _min(2), 4.0)]  # before the open session's start
    flush = [(9, _min(10_000), 0.0)]
    rows = _run_files_stream(
        spark,
        tmp_path,
        [batch1, late, flush],
        lambda s: stream_sessionize(s, gap="30 minutes", watermark="2 hours"),
    )
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.sum_value)
        for r in rows
        if r.user_id == 1
    }
    assert got == {(1, _min(2), _min(20), 3, 7.0)}


# -- stream_ema ------------------------------------------------------------

EMA_SCHEMA = "event_id long, user_id long, ts timestamp, value double"


def _run_ema_stream(spark, tmp_path, batches, alpha=0.3):
    from hnsw_vector_db_spark.streaming.stateful import stream_ema

    import glob
    import os

    src = str(tmp_path / "ema_src")
    batch_files = []
    for rows in batches:
        before = set(glob.glob(f"{src}/*.parquet"))
        spark.createDataFrame(rows, EMA_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        batch_files.append(set(glob.glob(f"{src}/*.parquet")) - before)
    # pin arrival order explicitly — mtime races would reorder batches
    t0 = time.time()
    for i, files in enumerate(batch_files):
        for f in files:
            os.utime(f, (t0 + 10 * i, t0 + 10 * i))
    stream = (
        spark.readStream.schema(EMA_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_ema(stream, alpha=alpha)
        .writeStream.format("memory")
        .queryName("ema_result")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ema_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("ema_result").collect()


def test_stream_ema_matches_batch_bit_exact(spark, tmp_path):
    import numpy as np

    from hnsw_vector_db_spark.operators.events import ema_smooth

    rng = np.random.default_rng(9)
    rows = [
        (i, int(i % 4), _min(i), float(v))
        for i, v in enumerate(rng.uniform(0, 100, 48))
    ]
    # three time-split batches: every key's events arrive in event order
    batches = [rows[:16], rows[16:32], rows[32:]]
    got = {
        r["event_id"]: r["ema"] for r in _run_ema_stream(spark, tmp_path, batches)
    }
    ev = spark.createDataFrame(rows, EMA_SCHEMA)
    want = {r["event_id"]: r["ema"] for r in ema_smooth(ev, alpha=0.3).collect()}
    assert got == want  # bit-exact: identical fold, state carried across batches


def test_stream_ema_state_carries_across_batches(spark, tmp_path):
    # one key, one event per batch: the second output MUST blend the
    # first batch's state (not restart the fold)
    batches = [
        [(1, 7, _min(0), 10.0)],
        [(2, 7, _min(1), 20.0)],
    ]
    got = {r["event_id"]: r["ema"] for r in _run_ema_stream(spark, tmp_path, batches)}
    assert got[1] == 10.0
    assert got[2] == 0.3 * 20.0 + (1.0 - 0.3) * 10.0
