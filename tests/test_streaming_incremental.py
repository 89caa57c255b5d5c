"""Streaming incremental dedup: micro-batches classify against the
fingerprint store, new fingerprints fold back in, intra-batch exact
copies never double-enter the store, and a second stream run resumes
from the same checkpoint without reclassifying old files."""

from __future__ import annotations

import pandas as pd
import pytest

from document_processor_spark.streaming.incremental_dedup import (
    start_incremental_dedup_stream,
)

BASE = ("alpha bravo charlie delta echo foxtrot golf hotel india "
        "juliet kilo lima mike november oscar papa quebec romeo "
        "sierra tango uniform victor whiskey xray yankee zulu " * 4)
TEXT_A = BASE + "one two three"
TEXT_B = BASE + "ending original"
TEXT_B_EDIT = BASE + "ending alternative"   # near-dup of TEXT_B (verified
                                            # deterministic band overlap)
TEXT_C = ("completely unrelated words about molten glass furnaces "
          "and tidal estuary sediment transport dynamics")


def _write_docs(path, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].str.len()
    pdf.to_parquet(path)


def _run(spark, dirs):
    q = start_incremental_dedup_stream(
        spark, str(dirs["in"]), str(dirs["store"]), str(dirs["out"]),
        str(dirs["ckpt"]), available_now=True)
    assert q.awaitTermination(180), "stream did not drain in time"


@pytest.mark.timeout(600)
def test_two_trigger_runs_share_the_store(spark, tmp_path):
    dirs = {k: tmp_path / k for k in ("in", "store", "out", "ckpt")}
    dirs["in"].mkdir()

    # trigger 1: two distinct docs + an intra-batch exact copy of the first
    _write_docs(dirs["in"] / "b1.parquet", [
        (1, TEXT_A, "en", "s1"),
        (2, TEXT_B, "en", "s1"),
        (3, TEXT_A, "en", "s1"),
    ])
    _run(spark, dirs)
    out = {r["doc_id"]: r for r in
           spark.read.parquet(str(dirs["out"])).collect()}
    assert out[1]["status"] == "new"
    assert out[2]["status"] == "new"
    # the copy resolves against its in-batch keeper, not the (empty) store
    assert out[3]["status"] == "exact_dup" and out[3]["exact_dup"]
    hashes = spark.read.parquet(str(dirs["store"] / "hashes"))
    assert hashes.count() == 2  # keeper fingerprints only

    # trigger 2 (new query, same checkpoint): old file is NOT re-read;
    # classification runs against the accumulated store
    _write_docs(dirs["in"] / "b2.parquet", [
        (10, TEXT_A, "en", "s2"),       # exact vs store
        (11, TEXT_B_EDIT, "en", "s2"),  # near-dup vs store
        (12, TEXT_C, "en", "s2"),       # fresh
    ])
    _run(spark, dirs)
    out = {r["doc_id"]: r for r in
           spark.read.parquet(str(dirs["out"])).collect()}
    assert sorted(out) == [1, 2, 3, 10, 11, 12]
    assert out[10]["status"] == "exact_dup"
    assert out[11]["status"] == "near_dup" and out[11]["n_shared_bands"] > 0
    assert out[12]["status"] == "new"
    # only the fresh doc's fingerprint joined the store
    assert spark.read.parquet(str(dirs["store"] / "hashes")).count() == 3

    # replay idempotency: re-running the processor body for batch 1
    # overwrites the same partitions with identical content
    from document_processor_spark.streaming.incremental_dedup import (
        make_dedup_processor,
    )
    before = sorted(
        tuple(r) for r in
        spark.read.parquet(str(dirs["out"]) + "/batch=1").collect())
    batch_df = spark.read.parquet(str(dirs["in"] / "b2.parquet"))
    make_dedup_processor(str(dirs["store"]), str(dirs["out"]))(batch_df, 1)
    after = sorted(
        tuple(r) for r in
        spark.read.parquet(str(dirs["out"]) + "/batch=1").collect())
    assert before == after
    assert spark.read.parquet(str(dirs["store"] / "hashes")).count() == 3


def test_corrupt_store_raises_instead_of_classifying_all_new(spark, tmp_path):
    """A store read failure that is NOT the store-missing case must raise:
    silently treating history as empty would mark every duplicate 'new'
    and pollute the store (review finding r3)."""
    store = tmp_path / "store"
    (store / "hashes" / "batch=0").mkdir(parents=True)
    (store / "hashes" / "batch=0" / "part-0.parquet").write_bytes(
        b"not a parquet file")
    from document_processor_spark.streaming.incremental_dedup import (
        HASH_DDL,
        _read_store,
    )
    # missing store -> empty frame (the legitimate first-batch path)
    empty = _read_store(spark, str(tmp_path / "nostore" / "hashes"),
                        HASH_DDL, before_batch=1)
    assert empty.count() == 0
    # corrupt store -> must raise, never silently empty
    with pytest.raises(Exception):
        _read_store(spark, str(store / "hashes"), HASH_DDL,
                    before_batch=1).count()
