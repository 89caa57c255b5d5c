"""Invariants for the session-8 operators against independent pure-Python
recomputes: video scene-cut detection, Hilbert-curve layout keys, and the
streaming watermark late-data audit.
"""

from __future__ import annotations

from collections import defaultdict

SF_DIR = "/root/testdata/sf0.001"


def _load(spark, name):
    return spark.read.parquet(f"{SF_DIR}/{name}.parquet").collect()


# -- mm_scene_cut -------------------------------------------------------------------


def test_scene_cut_matches_python(spark):
    from document_processor_spark.operators.multimodal import (
        FRAME_BYTES, SCENE_CUT_T, q_scene_cut,
    )

    want = {}
    for r in _load(spark, "documents"):
        if r["n_chars"] % 3 != 2:
            continue
        px = r["text"][:16 + r["n_chars"] % 24].encode("utf-8")
        n_frames = len(px) // FRAME_BYTES
        for f in range(1, n_frames):
            prev = px[(f - 1) * FRAME_BYTES:f * FRAME_BYTES]
            cur = px[f * FRAME_BYTES:(f + 1) * FRAME_BYTES]
            delta = sum(abs(a - b) for a, b in zip(prev, cur))
            want[(r["doc_id"], f)] = (delta, delta >= SCENE_CUT_T)

    got = q_scene_cut(spark, SF_DIR).collect()
    assert len(got) == len(want)
    for r in got:
        assert want[(r["doc_id"], r["frame_idx"])] == (r["delta"],
                                                       r["is_cut"])
    # the detector must actually fire on this corpus (threshold sanity)
    assert any(r["is_cut"] for r in got)
    assert not all(r["is_cut"] for r in got)


# -- cur_hilbert_layout -------------------------------------------------------------


def test_hilbert_curve_adjacency_full_grid():
    """THE Hilbert property: consecutive keys are adjacent grid cells
    (unit Manhattan step) over the entire 256x256 grid — the locality
    guarantee Z-order does not have (Z jumps at quadrant seams)."""
    from document_processor_spark.operators.curation import hilbert_d

    pos = {}
    for x in range(256):
        for y in range(256):
            pos[hilbert_d(x, y)] = (x, y)
    assert len(pos) == 65536  # bijective on the grid
    for d in range(65535):
        (x1, y1), (x2, y2) = pos[d], pos[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_hilbert_layout_matches_python(spark):
    from document_processor_spark.operators.curation import (
        HILBERT_BUCKET_SHIFT, ZORDER_LEN_DIV, hilbert_d,
        q_cur_hilbert_layout,
    )

    got = q_cur_hilbert_layout(spark, SF_DIR).collect()
    docs = {r["doc_id"]: r for r in _load(spark, "documents")}
    assert len(got) == len(docs)
    for r in got:
        d = docs[r["doc_id"]]
        assert r["bx"] == min(d["n_chars"] // ZORDER_LEN_DIV, 255)
        assert 0 <= r["by"] <= 255
        assert r["hkey"] == hilbert_d(r["bx"], r["by"])
        assert r["hbucket"] == r["hkey"] >> HILBERT_BUCKET_SHIFT


# -- stream_late_data ---------------------------------------------------------------


def test_stream_late_data_drops_closed_windows(spark):
    """The full pipeline run at sf0.001: per-bucket counts must equal the
    pure-Python recompute of Spark's admitted set — on-time rows, the
    tick row, and only those late rows whose hour window was still open
    under the millisecond-floored watermark."""
    from document_processor_spark.operators.stream_ops import (
        LATE_DELAY_MS, LATE_MOD, q_stream_late_data,
    )

    HOUR_US = 3_600_000_000
    rows = _load(spark, "events")
    on = [r for r in rows if r["event_id"] % LATE_MOD != 0]
    late = [r for r in rows if r["event_id"] % LATE_MOD == 0]

    def us(ts):
        import calendar
        return (calendar.timegm(ts.timetuple()) * 1_000_000
                + ts.microsecond)

    onmax = max(us(r["ts"]) for r in on)
    wm_us = (onmax // 1000 - LATE_DELAY_MS) * 1000
    kept = [us(r["ts"]) for r in on]
    kept.append(onmax)  # the tick row
    n_dropped = 0
    for r in late:
        end = (us(r["ts"]) // HOUR_US) * HOUR_US + HOUR_US
        if end > wm_us:
            kept.append(us(r["ts"]))
        else:
            n_dropped += 1
    assert n_dropped > 0  # the fixture must actually exercise the drop

    t0h = (min(us(r["ts"]) for r in rows) // HOUR_US) * HOUR_US
    want = defaultdict(int)
    for t in kept:
        want[(t // HOUR_US) * HOUR_US // HOUR_US - t0h // HOUR_US] += 1

    got = q_stream_late_data(spark, SF_DIR).collect()
    assert {r["hour_bucket"]: r["n_events"] for r in got} == dict(want)
