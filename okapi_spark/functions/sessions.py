"""Event sessionization — batch and streaming variants.

Batch: the classic lag-gap-cumsum window plan (no UDF, fully
codegen'd): a new session starts when the gap to the previous event of
the same user exceeds ``gap_minutes``. Streaming: the same semantics
via ``session_window`` over a watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """(user_id, session_id, n_events, started, ended, total_value) —
    deterministic ordering by (ts, event_id)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet timestamps may load as TIMESTAMP_NTZ, which Spark won't
    # cast straight to double — hop through TIMESTAMP (session tz=UTC)
    sec = F.col("ts").cast("timestamp").cast("double")
    new_sess = F.when(
        sec - F.lag(sec).over(w) > gap_minutes * 60.0, 1
    ).otherwise(0)
    with_sid = events.withColumn(
        "session_id",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    # decimal sum: exact, order-insensitive addition, so the result is
    # identical regardless of partition count / merge order (float sums
    # are not, which shows up as last-bit divergence vs serial oracles)
    return with_sid.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("started"),
        F.max("ts").alias("ended"),
        F.round(F.sum(F.col("value").cast("decimal(38,9)")), 9)
        .cast("double")
        .alias("total_value"),
    )


def sessionize_stream(events_stream: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Structured-Streaming equivalent using session_window + watermark;
    emits one row per closed session in append mode."""
    return (
        events_stream.withWatermark("ts", f"{gap_minutes * 2} minutes")
        .groupBy(F.session_window("ts", f"{gap_minutes} minutes"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("started"),
            F.col("session_window.end").alias("ended"),
            "n_events",
            "total_value",
        )
    )
