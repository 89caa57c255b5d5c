"""Watermarked tumbling-window streaming aggregation (streaming/windowed.py):
event-time windows over a file-source stream, late data inside the watermark
still counted, data later than the watermark dropped, final state equal to
the batch aggregate over the non-dropped rows."""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from document_processor_spark.streaming.windowed import (
    EVENTS_DDL, start_windowed_stream, windowed_event_counts)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(eid, hour, minute, etype, value):
    return (eid, T0 + dt.timedelta(hours=hour, minutes=minute),
            eid % 7, etype, float(value), "{}")


# file 1..3 arrive in order and advance event time to hour 10;
# file 4 carries one late-but-inside-watermark row (hour 9 against a
# watermark of max(10h) - 2h = 8h) and one too-late row (hour 1 < 8h).
ON_TIME_FILES = [
    [_ev(1, 0, 5, "click", 1.0), _ev(2, 1, 10, "click", 2.0),
     _ev(3, 1, 40, "view", 3.0)],
    [_ev(4, 5, 0, "click", 4.0), _ev(5, 5, 30, "view", 5.0)],
    [_ev(6, 10, 0, "click", 6.0)],
]
LATE_OK = _ev(7, 9, 15, "view", 7.0)      # > watermark(8h): counted
LATE_DROPPED = _ev(8, 1, 20, "click", 8.0)  # < watermark(8h): dropped


@pytest.fixture()
def event_dirs(spark, tmp_path):
    incoming = tmp_path / "events"
    incoming.mkdir()
    files = ON_TIME_FILES + [[LATE_OK, LATE_DROPPED]]
    for i, rows in enumerate(files):
        df = spark.createDataFrame(rows, schema=EVENTS_DDL)
        stage = tmp_path / f"stage{i}"
        df.coalesce(1).write.parquet(str(stage))
        # the file source doesn't recurse: move the part file flat into the
        # incoming dir, with mtimes forcing the processing order
        part = next(stage.glob("part-*.parquet"))
        dest = incoming / f"f{i}.parquet"
        part.rename(dest)
        os.utime(dest, (1_000_000 + i, 1_000_000 + i))
    return str(incoming), str(tmp_path / "ckpt")


def _final_state(spark, name):
    """Update-mode memory sink accumulates every re-emission; counts only
    grow per key, so the row with the max n_events is the final state."""
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    final = {}
    for r in rows:
        k = (r["window_start"], r["event_type"])
        if k not in final or r["n_events"] > final[k]["n_events"]:
            final[k] = r
    return {k: (r["n_events"], r["total_value"]) for k, r in final.items()}


def test_watermarked_window_equals_batch_minus_dropped(spark, event_dirs):
    input_dir, ckpt = event_dirs
    q = start_windowed_stream(spark, input_dir, ckpt, "win_agg",
                              max_files_per_trigger=1)
    q.awaitTermination(300)

    kept = [r for f in ON_TIME_FILES for r in f] + [LATE_OK]
    batch = windowed_event_counts(
        spark.createDataFrame(kept, schema=EVENTS_DDL))
    expected = {(r["window_start"], r["event_type"]):
                (r["n_events"], r["total_value"])
                for r in batch.collect()}

    got = _final_state(spark, "win_agg")
    assert got == expected

    # the too-late row never contributed: its window's click count stays
    # at the on-time value in every emission
    w = T0 + dt.timedelta(hours=1)
    late_rows = [r for r in spark.sql("SELECT * FROM win_agg").collect()
                 if r["window_start"] == w and r["event_type"] == "click"]
    assert late_rows and all(r["n_events"] == 1 for r in late_rows)


def test_windowed_batch_matches_sql(spark, event_dirs):
    """The same function on a batch DataFrame is its own oracle: spot-check
    against a hand-computed window."""
    rows = [r for f in ON_TIME_FILES for r in f]
    out = windowed_event_counts(spark.createDataFrame(rows, schema=EVENTS_DDL))
    got = {(r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
           for r in out.collect()}
    assert got[(T0 + dt.timedelta(hours=1), "click")] == (1, 2.0)
    assert got[(T0 + dt.timedelta(hours=5), "view")] == (1, 5.0)
    assert got[(T0, "click")] == (1, 1.0)
