"""Event-time stream-stream joins.

The one headline Structured Streaming capability the rest of this package
didn't exercise: joining two LIVE streams on a key plus an event-time range,
with watermarks bounding how long each side's rows wait in the state store
for late matches. Reference contrast: the reference's only join is a
driver-side dict lookup enriching search hits with metadata
(`api/rest/server.py:174`); it has no notion of correlating two event
streams at all.

Scale shape: state is keyed by the join key and evicted by the watermark —
the view side holds each row until ``watermark + attribution_window`` past
its event time, the click side until ``watermark`` — so state size is
bounded by (arrival rate x horizon), independent of total history. The
range condition is what makes eviction possible: an unconstrained
stream-stream join would have to keep every row forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_view_click_join(
    views: DataFrame,
    clicks: DataFrame,
    attribution_window: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Inner event-time join: every (view, click) pair by the same user
    where the click lands in [view_ts, view_ts + attribution_window] —
    the raw attribution pair stream (ad-tech's view-through shape).

    Deliberately the RAW pair join: "last view before the click" needs an
    aggregation on top, which in streaming append mode means a second
    watermark pass — downstream's call, batch or stream. Emitted in
    append mode as matches become final. Output (user_id, view_id,
    click_id, v_ts, c_ts, value); equals the batch range-join on the
    same rows run to completion, which is what the oracle checks.
    """
    v = views.withWatermark(ts_col, watermark).select(
        F.col(key_col).alias("__v_user"),
        F.col(ts_col).alias("v_ts"),
        F.col(id_col).alias("view_id"),
    )
    c = clicks.withWatermark(ts_col, watermark).select(
        F.col(key_col).alias("__c_user"),
        F.col(ts_col).alias("c_ts"),
        F.col(id_col).alias("click_id"),
        F.col(value_col).alias("value"),
    )
    cond = (
        (F.col("__v_user") == F.col("__c_user"))
        & (F.col("c_ts") >= F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr(f"INTERVAL {attribution_window}"))
    )
    return v.join(c, cond, "inner").select(
        F.col("__v_user").alias(key_col),
        "view_id",
        "click_id",
        "v_ts",
        "c_ts",
        "value",
    )
