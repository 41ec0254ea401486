"""Streaming windowed aggregation with watermarks + late-data handling.

New capability relative to the reference (its only "stream" is the Raft
apply loop, `distributed/raft/node.py:298-309`); driven by the events
table. The batch twins in operators/events.py share the same expressions,
so stream-vs-batch equivalence is testable (tests/test_streaming.py) and
the batch form has a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_windowed_counts(
    events_stream: DataFrame,
    duration: str = "15 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    group_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window counts with a watermark: state for a window is
    dropped once the watermark passes its end — bounded state at any
    scale; events later than the watermark are dropped (the reference has
    no late-data story at all: Raft applies in log order, wall-clock be
    damned)."""
    return (
        events_stream.withWatermark(ts_col, watermark)
        # group by the window STRUCT (not .start): the struct carries the
        # event-time metadata append-mode finalization keys off; project
        # .start only after the aggregate.
        .groupBy(F.window(F.col(ts_col), duration), F.col(group_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("window").start.alias("window_start"),
            group_col,
            "n_events",
            "sum_value",
        )
    )


def stream_sliding_avg(
    events_stream: DataFrame,
    duration: str = "30 minutes",
    slide: str = "10 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding-window average value per event_type."""
    return (
        events_stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), duration, slide), F.col("event_type"))
        .agg(F.round(F.avg("value"), 6).alias("avg_value"))
        .select(
            F.col("window").start.alias("window_start"), "event_type", "avg_value"
        )
    )


def run_stream_as_batch(
    stream_df: DataFrame,
    tmp_dir: str,
    name: str = "stream_result",
    output_mode: str = "complete",
) -> DataFrame:
    """Execute a streaming aggregation to completion (availableNow) and
    return the final result as a batch DataFrame — the harness used to
    assert stream == batch-twin."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", tmp_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def stream_session_windows(
    events_stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Built-in event-time session windows (``F.session_window``):
    per-key sessions that merge while events arrive within ``gap``, close
    once the watermark passes, and drop their state — the fully
    declarative third form of sessionization here, next to the batch
    lag+cumsum (`operators/events.sessionize`) and the custom
    applyInPandasWithState sessionizer (`streaming/stateful.py`).
    Catalyst owns the merge logic and state store layout; at scale state
    is keyed by (user, open window) and bounded by the watermark horizon.

    Note the boundary convention: session_window's window end is
    ``last event + gap`` and an event at exactly ``prev + gap`` starts a
    NEW session, while the batch sessionize keeps it (strict >). The
    stream==batch equivalence test pins both on data where no gap-exact
    tie occurs.
    """
    return (
        events_stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("session_window").start.alias("session_start"),
            key_col,
            "n_events",
            "sum_value",
        )
    )
