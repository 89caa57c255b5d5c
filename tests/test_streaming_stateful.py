"""applyInPandasWithState sessionization vs a pure-Python oracle.

Events at sf0.001 are streamed through a file source in 4 micro-batches
plus a far-future sentinel batch that advances the event-time watermark
past every open session's timeout, flushing them — so the full session
list is comparable against a batch oracle."""

import pandas as pd
import pytest

from document_processor_spark.operators.relational import SESSION_GAP_S
from document_processor_spark.streaming.stateful import sessionize_stream

SF_DIR = "/root/testdata/sf0.001"
SENTINEL_USER = -1


def py_sessions(rows):
    """Oracle: gap-based sessionization, (user_id, seq, start, end, n)."""
    by_user = {}
    for r in sorted(rows, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        by_user.setdefault(r["user_id"], []).append(r["ts"])
    out = []
    for uid, tss in by_user.items():
        seq, start, last, n = 0, None, None, 0
        for t in tss:
            if start is None:
                seq, start, last, n = seq + 1, t, t, 1
            elif (t - last).total_seconds() > SESSION_GAP_S:
                out.append((uid, seq, start, last, n))
                seq, start, last, n = seq + 1, t, t, 1
            else:
                last, n = t, n + 1
        out.append((uid, seq, start, last, n))
    return sorted(out)


@pytest.mark.timeout(600)
def test_stateful_sessionize_equals_oracle(spark, tmp_path):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet") \
        .select("event_id", "ts", "user_id").orderBy("ts", "event_id")
    rows = [r.asDict() for r in ev.collect()]
    assert rows

    # 4 time-ordered micro-batch files + a sentinel far past every timeout
    src = tmp_path / "stream-in"
    src.mkdir()
    ddl = "event_id bigint, ts timestamp, user_id bigint"

    def write_batch(name, batch_rows):
        # write via Spark (pandas parquet timestamps don't round-trip into
        # the file source's expected type), then flatten the single part
        # file into the watched dir so maxFilesPerTrigger=1 sees one file
        # per batch in mtime order
        d = tmp_path / "w" / name
        (spark.createDataFrame(
            [(r["event_id"], r["ts"], r["user_id"]) for r in batch_rows], ddl)
         .coalesce(1).write.parquet(str(d)))
        part = next(d.glob("part-*.parquet"))
        part.rename(src / f"{name}.parquet")

    chunk = max(1, len(rows) // 4)
    for i in range(0, len(rows), chunk):
        write_batch(f"b{i:06d}", rows[i:i + chunk])
    max_ts = max(r["ts"] for r in rows)
    write_batch("zz-sentinel",
                [{"event_id": 0,
                  "ts": max_ts + pd.Timedelta(days=2).to_pytimedelta(),
                  "user_id": SENTINEL_USER}])

    stream = (spark.readStream.schema("event_id bigint, ts timestamp, user_id bigint")
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    q = (sessionize_stream(stream)
         .writeStream.format("memory").queryName("sessions_out")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)

    got = sorted(
        (r["user_id"], r["session_seq"], r["session_start"],
         r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM sessions_out").collect()
        if r["user_id"] != SENTINEL_USER)
    assert got == py_sessions(rows)


@pytest.mark.timeout(600)
def test_timeout_preserves_seq_and_out_of_order_absorbs(spark, tmp_path):
    """Two live-stream cases the corpus replay can't hit:

    1. a user's open session is flushed by the EventTime timeout BETWEEN
       micro-batches and the user later returns — session_seq must continue
       (2, 3, ...), never restart at 1 (the batch-contract numbering);
    2. an event arrives out of order ACROSS micro-batches (older than the
       session's last_ts but within allowed lateness) — it must absorb into
       the session without rewinding last_ts, so a later in-gap-of-true-last
       event does not falsely split the session."""
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    s = pd.Timedelta(seconds=1)
    gap = SESSION_GAP_S * s
    t9 = t0 + gap + 3600 * s          # advances watermark past user 1's timeout
    t1r = t0 + gap + 7200 * s         # user 1 returns after being flushed
    t6 = t1r + 60 * s + gap - 10 * s  # in-gap of true last (t1r+60), out-of-gap
    #                                   of the rewound last (t1r+30) — detects
    #                                   a last_ts rewind as a false split
    batches = [
        [(1, t0, 1), (2, t0 + 10 * s, 1), (3, t0 + 100 * s, 2)],
        [(4, t9, 9)],
        [(5, t1r, 1)],
        [(6, t1r + 60 * s, 1)],
        [(7, t1r + 30 * s, 1)],       # out-of-order, within 120 s lateness
        [(8, t6, 1)],
        [(9, t6 + pd.Timedelta(days=2), SENTINEL_USER)],
    ]

    src = tmp_path / "stream-in"
    src.mkdir()
    ddl = "event_id bigint, ts timestamp, user_id bigint"
    for i, b in enumerate(batches):
        d = tmp_path / "w" / f"b{i}"
        (spark.createDataFrame([(e, t.to_pydatetime(), u) for e, t, u in b], ddl)
         .coalesce(1).write.parquet(str(d)))
        next(d.glob("part-*.parquet")).rename(src / f"b{i:03d}.parquet")

    stream = (spark.readStream.schema(ddl)
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    q = (sessionize_stream(stream, watermark="120 seconds")
         .writeStream.format("memory").queryName("sessions_seq_out")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)

    got = sorted(
        (r["user_id"], r["session_seq"], r["session_start"],
         r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM sessions_seq_out").collect()
        if r["user_id"] != SENTINEL_USER)
    assert got == [
        (1, 1, t0, t0 + 10 * s, 2),       # flushed by timeout after batch 2
        (1, 2, t1r, t6, 4),               # seq CONTINUES; one unsplit session
        (2, 1, t0 + 100 * s, t0 + 100 * s, 1),
        (9, 1, t9, t9, 1),
    ]
