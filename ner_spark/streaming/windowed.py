"""Structured Streaming operators over the `events` shape
(event_id, ts, user_id, event_type, value, props).

The reference has no streaming (SURVEY §2.9); these are the engine's
incremental counterparts of the batch rollups (events_hourly /
user_sessions in __spark_entry__), built so the same aggregation logic
runs over `readStream` with watermarked state. Tests drive them with
`Trigger.AvailableNow` against a parquet directory and assert equality
with the batch plan — the standard batch/stream parity contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over a directory of event parquet files.

    `maxFilesPerTrigger` bounds micro-batch size so state stays
    predictable at scale; schema is explicit (required for streams).
    """
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(path)
    )


def hourly_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour windows per event_type with late-data watermark.

    The watermark bounds state: windows older than max(event time) -
    watermark are finalized and evicted — the mechanism that keeps a
    perpetual stream's state finite on a real cluster.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Hopping windows: 1-hour windows sliding every 30 minutes."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").alias("window_start"), "event_type", "n_events")
    )


def session_rollup(events: DataFrame, gap: str = "30 minutes",
                   watermark: str = "2 hours") -> DataFrame:
    """Session windows per user: sessions close after `gap` inactivity —
    the streaming-native form of the batch lag/cumsum sessionization
    (__spark_entry__.q_user_sessions)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def run_available_now(stream_df: DataFrame, query_name: str,
                      checkpoint_dir: str, timeout_s: int = 300) -> None:
    """Drain all currently-available input through the stream into an
    in-memory table named `query_name` (complete mode), then stop.

    AvailableNow processes the backlog in bounded micro-batches with
    full checkpointing — the batch-like execution mode used for
    backfills and for exactly this kind of parity test.
    """
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    q.stop()
