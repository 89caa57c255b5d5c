"""Watermarked stream-stream join (streaming/join.py): click→purchase
pairs across micro-batch boundaries, gap bound enforced, final streamed
state equal to the batch run of the same join."""

import datetime as dt
import os

import pytest

from document_processor_spark.streaming.join import (
    attribution_join, start_attribution_stream)
from document_processor_spark.streaming.windowed import EVENTS_DDL

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(eid, minutes, user, etype):
    return (eid, T0 + dt.timedelta(minutes=minutes), user, etype, 1.0, "{}")


# clicks and purchases arrive in separate files so matches must be found
# ACROSS micro-batches (the joined click sits in the state store until its
# purchase arrives).  user 1: purchase 30 min after click (match) and a
# second purchase 90 min after (outside the 1 h gap).  user 2: purchase
# with no click.  user 3: click with no purchase.
CLICK_FILES = [
    [_ev(1, 0, 1, "click")],
    [_ev(2, 10, 3, "click")],
]
PURCHASE_FILES = [
    [_ev(10, 30, 1, "purchase"), _ev(11, 90, 1, "purchase")],
    [_ev(12, 40, 2, "purchase")],
]


def _stage(spark, tmp_path, name, files):
    d = tmp_path / name
    d.mkdir()
    for i, rows in enumerate(files):
        stage = tmp_path / f"{name}_stage{i}"
        spark.createDataFrame(rows, schema=EVENTS_DDL) \
             .coalesce(1).write.parquet(str(stage))
        part = next(stage.glob("part-*.parquet"))
        dest = d / f"f{i}.parquet"
        part.rename(dest)
        os.utime(dest, (1_000_000 + i, 1_000_000 + i))
    return str(d)


@pytest.fixture()
def dirs(spark, tmp_path):
    return (_stage(spark, tmp_path, "clicks", CLICK_FILES),
            _stage(spark, tmp_path, "purchases", PURCHASE_FILES),
            str(tmp_path / "ckpt"))


def test_stream_stream_join_equals_batch(spark, dirs):
    clicks_dir, purchases_dir, ckpt = dirs
    q = start_attribution_stream(spark, clicks_dir, purchases_dir, ckpt,
                                 "attr_join")
    q.awaitTermination(300)
    got = {(r["purchase_id"], r["user_id"], r["click_id"], r["gap_us"])
           for r in spark.sql("SELECT * FROM attr_join").collect()}

    batch = attribution_join(
        spark.createDataFrame([r for f in CLICK_FILES for r in f],
                              schema=EVENTS_DDL),
        spark.createDataFrame([r for f in PURCHASE_FILES for r in f],
                              schema=EVENTS_DDL))
    expected = {(r["purchase_id"], r["user_id"], r["click_id"], r["gap_us"])
                for r in batch.collect()}

    assert got == expected
    # exactly the in-gap pair for user 1; the 90-min purchase, the
    # clickless purchase, and the purchaseless click never emit
    assert got == {(10, 1, 1, 30 * 60 * 1_000_000)}
