"""Watermarked tumbling-window aggregation over the events stream.

The batch analog is ``relational.q_tumbling_hourly``; this is the
Structured Streaming form a 100 TB ingest would run on a live event feed:
event-time windows via ``F.window``, late data bounded by
``withWatermark`` (rows later than the watermark are dropped, state for
closed windows is evicted — the state store stays O(open windows), not
O(stream length)).

Scale notes: the groupBy(window, event_type) shuffle is the only wide
stage; state is partitioned by the same key, so a 4N-executor cluster
splits both shuffle and state 4N ways.  No Python in the hot path — the
aggregation is pure Catalyst, so micro-batches run entirely JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_DDL = ("event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string")


def windowed_event_counts(events: DataFrame, *, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """(streaming or batch) events -> per-window per-type counts + value sum.

    On a streaming DataFrame the watermark bounds lateness: an event older
    than `max(ts seen) - watermark` is dropped and its window's state has
    already been evicted.  On a batch DataFrame withWatermark is a no-op,
    so the same function is its own batch oracle."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (src.groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 6).alias("total_value"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n_events", "total_value"))


def dedup_stream(events: DataFrame, *, key: str = "event_id",
                 watermark: str = "2 hours") -> DataFrame:
    """Streaming exact-dedup — the live-ingest counterpart of the batch
    ``dedup_exact`` operator: drop repeated `key` values arriving within
    the watermark interval via ``dropDuplicatesWithinWatermark``.  Unlike
    plain ``dropDuplicates`` (whose state grows with the stream forever),
    state per key is evicted once the event-time watermark passes its ts —
    O(keys within the watermark window), the only shape that survives an
    unbounded 10^12-event feed.  On a batch DataFrame falls back to plain
    dropDuplicates, so the same function is its own batch oracle."""
    if not events.isStreaming:
        return events.dropDuplicates([key])
    return (events.withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark([key]))


def start_windowed_stream(spark: SparkSession, input_dir: str,
                          checkpoint_dir: str, query_name: str,
                          *, window: str = "1 hour",
                          watermark: str = "2 hours",
                          max_files_per_trigger: int = 1,
                          available_now: bool = True):
    """File-source streaming query: parquet event files land in `input_dir`,
    each micro-batch updates the windowed aggregate; results go to an
    in-memory table named `query_name` in update mode (only changed windows
    re-emit).  Returns the StreamingQuery."""
    src = (spark.readStream.schema(EVENTS_DDL)
           .option("maxFilesPerTrigger", max_files_per_trigger)
           .parquet(input_dir))
    agg = windowed_event_counts(src, window=window, watermark=watermark)
    writer = (agg.writeStream.outputMode("update")
              .format("memory").queryName(query_name)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
