"""Invariant tests for the composite corpus build (cur_corpus_build) and
the incremental snapshot dedup (dedup_incremental).  Value-level
correctness is carried by the driver's DuckDB oracle gate; these pin the
structural contracts — funnel predicates actually enforced, the exact-dup
path (the fixture corpus contains no exact duplicates, so only a crafted
corpus exercises it), and output scoped to the incoming batch."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from document_processor_spark.operators import curation, dedup

SF_DIR = "/root/testdata/sf0.001"


def test_corpus_build_funnel_invariants(spark):
    out = curation.q_cur_corpus_build(spark, SF_DIR).collect()
    assert out
    survivors = {r["doc_id"] for r in out}

    # stage 1+2: every survivor passed the gate; no eval-holdout doc survives
    gate = {r["doc_id"]: r["passed"]
            for r in curation.q_cur_quality_gate(spark, SF_DIR).collect()}
    assert all(gate[d] for d in survivors)
    assert all(d % curation.EVAL_MOD != 0 for d in survivors)

    # stage 3: survivors are exact-unique (min-doc_id keeper per hash)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    hashes = (docs.filter(F.col("doc_id").isin([int(d) for d in survivors]))
              .select("doc_id", F.md5("text").alias("h")).collect())
    by_hash: dict[str, list[int]] = {}
    for r in hashes:
        by_hash.setdefault(r["h"], []).append(r["doc_id"])
    assert all(len(v) == 1 for v in by_hash.values())

    # stage 5: packing — per source, in doc_id order, seq is the running
    # token sum div the budget (recomputed independently here)
    by_source: dict[str, list] = {}
    for r in out:
        by_source.setdefault(r["source"], []).append(r)
    for rs in by_source.values():
        rs.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in rs:
            assert r["seq"] == cum // curation.PACK_BUDGET
            cum += r["tokens"]


def _mini_corpus(tmp_path) -> str:
    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo "
            "sierra tango uniform victor whiskey xray yankee zulu " * 4)
    rows = [
        # batch doc 3 == history doc 4 byte-for-byte -> exact_dup
        (3, base + "one two three", "en", "s1"),
        (4, base + "one two three", "en", "s1"),
        # batch doc 7 = history doc 8 plus a one-word edit -> near_dup
        # (long shared prefix keeps most band minima identical; the texts
        # are fixed so the md5-derived signatures are deterministic)
        (7, base + "ending alternative", "en", "s1"),
        (8, base + "ending original", "en", "s1"),
        # batch doc 11 shares nothing with history -> new
        (11, "completely unrelated words about molten glass furnaces "
             "and tidal estuary sediment transport dynamics", "en", "s2"),
        # history-only doc: must not appear in the output
        (2, "some historical only content never emitted here", "en", "s2"),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].str.len()
    pdf.to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


def test_incremental_statuses_on_crafted_corpus(spark, tmp_path):
    out = {r["doc_id"]: r for r in
           dedup.q_dedup_incremental(spark, _mini_corpus(tmp_path)).collect()}
    # output rows = the incoming batch only (doc_id % 4 == 3)
    assert sorted(out) == [3, 7, 11]
    assert out[3]["exact_dup"] and out[3]["status"] == "exact_dup"
    assert not out[7]["exact_dup"]
    assert out[7]["status"] == "near_dup" and out[7]["n_shared_bands"] > 0
    assert out[11]["status"] == "new" and out[11]["n_shared_bands"] == 0


def test_incremental_fixture_has_no_false_exacts(spark):
    """The fixture corpus has zero exact duplicates, so the exact flag must
    never fire there — and every batch doc must be classified."""
    out = dedup.q_dedup_incremental(spark, SF_DIR).collect()
    assert out
    assert all(not r["exact_dup"] for r in out)
    assert all(r["status"] in ("new", "near_dup") for r in out)
