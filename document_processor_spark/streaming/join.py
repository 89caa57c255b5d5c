"""Watermarked stream-stream join: live click→purchase attribution.

The live-ingest counterpart of the batch as-of join
(relational.q_asof_attribution): two unbounded event streams joined on
user with a time-range condition.  Structured Streaming keeps BOTH sides'
rows in the state store until the other side can no longer produce a
match; the two ingredients that bound that state on an unbounded feed are

* a watermark on each side (how late either stream may arrive), and
* the time-range join condition (purchase within `max_gap` after the
  click) — together they let the engine compute, per micro-batch, the
  oldest click/purchase that could still match, and evict everything
  older.  Without the range condition the click state would grow with
  the stream forever.

Scale notes: the join shuffles both streams on user_id once; state is
partitioned by the same key, so a 4N-executor cluster splits shuffle and
state 4N ways.  Pure Catalyst — no Python in the micro-batch path.

On batch DataFrames ``withWatermark`` is a no-op and the same expression
is a plain range join, so the function is its own batch oracle
(tests/test_streaming_join.py compares final streaming state to it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .windowed import EVENTS_DDL


def attribution_join(clicks: DataFrame, purchases: DataFrame, *,
                     watermark: str = "2 hours",
                     max_gap: str = "1 hour") -> DataFrame:
    """All (click, purchase) pairs by the same user with the purchase in
    [click_ts, click_ts + max_gap].  One output row per qualifying pair —
    the windowed-attribution semantics; a latest-click-only reduction is
    a downstream aggregation, not part of the join."""
    c = (clicks.withWatermark("ts", watermark)
         .select("user_id", F.col("event_id").alias("click_id"),
                 F.col("ts").alias("click_ts")))
    p = (purchases.withWatermark("ts", watermark)
         .select(F.col("user_id").alias("p_user_id"),
                 F.col("event_id").alias("purchase_id"),
                 F.col("ts").alias("purchase_ts")))
    cond = ((c["user_id"] == p["p_user_id"])
            & (p["purchase_ts"] >= c["click_ts"])
            & (p["purchase_ts"] <= c["click_ts"] + F.expr(f"INTERVAL {max_gap}")))
    return (c.join(p, cond)
            .select("purchase_id", "user_id", "click_id",
                    F.expr("timestampdiff(MICROSECOND, click_ts, purchase_ts)")
                     .alias("gap_us")))


def start_attribution_stream(spark: SparkSession, clicks_dir: str,
                             purchases_dir: str, checkpoint_dir: str,
                             query_name: str, *,
                             watermark: str = "2 hours",
                             max_gap: str = "1 hour",
                             max_files_per_trigger: int = 1,
                             available_now: bool = True):
    """Two file-source streams joined per micro-batch; matched pairs land
    in an in-memory table named `query_name` (append mode — a joined pair
    is emitted exactly once).  Returns the StreamingQuery."""
    def src(d: str) -> DataFrame:
        return (spark.readStream.schema(EVENTS_DDL)
                .option("maxFilesPerTrigger", max_files_per_trigger)
                .parquet(d))

    joined = attribution_join(src(clicks_dir), src(purchases_dir),
                              watermark=watermark, max_gap=max_gap)
    writer = (joined.writeStream.outputMode("append")
              .format("memory").queryName(query_name)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
