"""Structured Streaming variants of the event operators.

The reference has no streaming at all (SURVEY.md §2.11 — mentioned only
as future work in its report §5.2.5); these are north-star additions.
The logical aggregations match ``operators.events`` so the batch
versions serve as the correctness oracle (run the same input through
both; Structured Streaming's incremental plan must agree).

Design:
- file source (exactly-once, replayable) for tests; at scale the same
  code runs on Kafka by swapping ``readStream.format``;
- event-time tumbling windows with a watermark for late data;
- session windows via ``F.session_window`` (state-store backed);
- sinks: append/complete to memory (tests) or parquet (production),
  checkpointed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def events_stream_from_files(spark: SparkSession, path: str,
                             max_files_per_trigger: int = 1) -> DataFrame:
    """Replayable file-based event stream (parquet dir, events schema)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def tumbling_counts_stream(events: DataFrame, minutes: int = 5,
                           watermark: str = "10 minutes") -> DataFrame:
    """Streaming tumbling-window counts per event_type. Watermark bounds
    state: windows older than max(event time) − watermark are finalized
    and dropped from the store."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{minutes} minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


def sessionize_stream(events: DataFrame, gap_minutes: int = 30,
                      watermark: str = "60 minutes") -> DataFrame:
    """Streaming session windows per user (state-store backed
    ``session_window`` — the Structured Streaming native form of the
    batch gap-sessionization in ``operators.events.sessionize``)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", f"{gap_minutes} minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"), "n_events")
    )


def run_stream_to_memory(stream_df: DataFrame, query_name: str,
                         output_mode: str = "update",
                         timeout_s: float = 60.0):
    """Test helper: run a streaming query to a memory sink until all
    available input is processed; returns the StreamingQuery."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return q
