"""Read-back contract of the shard-export writer: file row order IS the
curriculum order (pos ascending), offsets telescope inside every file,
the union of shards is exactly the corpus, and the manifest equals the
layout query's aggregates."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from document_processor_spark.export_job import run_shard_export
from document_processor_spark.operators.curation import (N_SHARDS,
                                                         q_cur_shard_export)

SF_DIR = "/root/testdata/sf0.001"


def test_shard_writer_roundtrip(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = str(tmp_path / "shards")
    m = run_shard_export(spark, docs, out)

    expect = {r["doc_id"]: r
              for r in q_cur_shard_export(spark, SF_DIR).collect()}
    assert m.n_shards == N_SHARDS
    assert m.n_docs == len(expect)
    assert m.total_tokens == sum(r["tokens"] for r in expect.values())

    seen: set = set()
    for shard in range(N_SHARDS):
        files = sorted(glob.glob(f"{out}/shard={shard}/*.parquet"))
        assert files, f"shard {shard} missing"
        rows = []
        for f in files:
            t = pq.read_table(f)  # pyarrow preserves file row order
            rows.extend(t.to_pylist())
        # files sorted by name == task order; pos must ascend across them
        poss = [r["pos"] for r in rows]
        assert poss == sorted(poss)
        assert poss == list(range(1, len(rows) + 1))
        off = 0
        for r in rows:
            e = expect[r["doc_id"]]
            assert (e["shard"], e["pos"], e["tokens"],
                    e["token_offset"]) == (shard, r["pos"], r["tokens"],
                                           r["token_offset"])
            assert r["token_offset"] == off
            off += r["tokens"]
            assert isinstance(r["text"], str) and r["text"]
            seen.add(r["doc_id"])
    assert seen == set(expect)
