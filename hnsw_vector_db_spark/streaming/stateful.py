"""Custom stateful streaming: gap-based sessionization with
``applyInPandasWithState``.

This is the Structured-Streaming replacement for the reference's only
stateful loop — the Raft apply loop that folds an ordered command stream
into index state (`distributed/raft/node.py:298-309`). Here the state is
per-user open sessions, keyed by user_id, with event-time timeouts:

- State is partitioned by the group key, so it scales horizontally with
  executors — no global lock (the reference serializes all state behind
  one RLock, `core/hnsw/graph.py:70`).
- The event-time timeout + watermark bound the state size: a session
  whose gap has passed the watermark is emitted and its state removed.
  Without that bound, long-running streams accumulate state forever.
- Arithmetic on epoch **microseconds** (int64) inside the worker — no
  tz-dependent pandas Timestamp math.

The batch twin is ``operators/events.py::sessionize`` (same gap rule,
SQL-oracle-checked); tests assert stream == batch on closed sessions.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame

OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, sum_value double"
)
# open-session state: epoch-micros bounds + running aggregates
STATE_SCHEMA = "start long, last long, n long, s double"


def _session_fn(gap_us: int):
    def fn(
        key: tuple[Any, ...], pdf_iter: Iterator[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        user = key[0]
        closed: list[tuple] = []

        def emit(start: int, last: int, n: int, s: float) -> None:
            closed.append(
                (
                    user,
                    pd.Timestamp(start, unit="us"),
                    pd.Timestamp(last, unit="us"),
                    n,
                    float(s),
                )
            )

        if state.hasTimedOut:
            start, last, n, s = state.get
            emit(start, last, n, s)
            state.remove()
        else:
            if state.exists:
                start, last, n, s = state.get
            else:
                start = None
                last = n = 0
                s = 0.0
            events = pd.concat(list(pdf_iter), ignore_index=True)
            # micro-batches arrive unordered within the batch; sessionize
            # over event time
            events = events.sort_values("ts", kind="mergesort")
            ts_us = events["ts"].astype("int64") // 1000  # ns -> us
            for t, v in zip(ts_us.to_numpy(), events["value"].to_numpy()):
                t = int(t)
                if start is None:
                    start, last, n, s = t, t, 1, float(v)
                elif t - last > gap_us:
                    emit(start, last, n, s)
                    start, last, n, s = t, t, 1, float(v)
                else:
                    # a late-but-in-watermark event from a later micro-batch
                    # can precede the open session: widen the bounds instead
                    # of rewinding `last` (which would corrupt later gap
                    # decisions) — matches the batch twin's global sort
                    start, last = min(start, t), max(last, t)
                    n, s = n + 1, float(s + v)
            state.update((start, last, n, s))
            # close the open session once event time passes last + gap
            state.setTimeoutTimestamp((last + gap_us) // 1000)  # ms
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_start", "session_end", "n_events", "sum_value"],
        )

    return fn


def stream_sessionize(
    events_stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Gap-based sessions over a stream: emits one row per CLOSED session
    (append-mode). A session closes when a same-user event arrives more
    than ``gap`` later, or when the watermark passes its last event +
    gap (event-time timeout)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    n, unit = gap.split()
    per = {"minute": 60, "minutes": 60, "second": 1, "seconds": 1, "hour": 3600, "hours": 3600}
    gap_us = int(n) * per[unit] * 1_000_000
    return (
        events_stream.select(key_col, ts_col, "value")
        .withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            _session_fn(gap_us),
            OUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
