"""Streaming exact-dedup (dropDuplicatesWithinWatermark): duplicate
event_ids arriving across micro-batches inside the watermark are dropped;
output equals the batch dropDuplicates over the same rows."""

import datetime as dt
import os

from document_processor_spark.streaming.windowed import EVENTS_DDL, dedup_stream

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(eid, minute, etype="click", value=1.0):
    return (eid, T0 + dt.timedelta(minutes=minute), eid % 7, etype,
            float(value), "{}")


# duplicates land both within a file and across files
FILES = [
    [_ev(1, 0), _ev(2, 5), _ev(2, 5)],
    [_ev(2, 5), _ev(3, 10), _ev(1, 0)],
    [_ev(4, 30), _ev(3, 10)],
]


def test_streaming_dedup_equals_batch(spark, tmp_path):
    incoming = tmp_path / "in"
    incoming.mkdir()
    for i, rows in enumerate(FILES):
        stage = tmp_path / f"stage{i}"
        spark.createDataFrame(rows, schema=EVENTS_DDL) \
             .coalesce(1).write.parquet(str(stage))
        dest = incoming / f"f{i}.parquet"
        next(stage.glob("part-*.parquet")).rename(dest)
        os.utime(dest, (1_000_000 + i, 1_000_000 + i))

    src = (spark.readStream.schema(EVENTS_DDL)
           .option("maxFilesPerTrigger", 1).parquet(str(incoming)))
    q = (dedup_stream(src).writeStream.format("memory")
         .queryName("dedup_out").outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)

    got = sorted((r["event_id"], r["ts"])
                 for r in spark.sql("SELECT * FROM dedup_out").collect())

    all_rows = [r for f in FILES for r in f]
    batch = spark.createDataFrame(all_rows, schema=EVENTS_DDL)
    want = sorted((r["event_id"], r["ts"])
                  for r in dedup_stream(batch).collect())
    assert got == want and len(got) == 4
