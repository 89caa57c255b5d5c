#!/usr/bin/env python
"""Regenerate PLANS.md: a physical-plan audit of every __spark_entry__
queries() entry at sf0.01.

Invariants asserted per plan (and summarized in the table):

* no `BatchEvalPython` (row-at-a-time Python UDF) anywhere;
* every cartesian-ish node (BroadcastNestedLoopJoin / CartesianProduct)
  must be one of the documented deliberate broadcasts (NOTES below),
  otherwise the script exits non-zero;
* global orderings plan as TakeOrderedAndProject;
* parquet scans carry PushedFilters where the query filters.

Usage: python tools/audit_plans.py [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import io
import re
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# Deliberate cartesian-shaped nodes: query name -> justification (also the
# table's note column).  A BNLJ/cross in any OTHER query fails the audit.
NOTES = {
    "ann_bruteforce_topk": (
        "BNLJ = broadcast QUERY side vs one corpus scan — the documented "
        "brute baseline shape"),
    "ann_sq8_topk": (
        "BNLJ = crossJoin with the broadcast 1-ROW per-dim [min,max] "
        "range ARRAY (narrow uint8 quantization — constant-size side) "
        "plus the broadcast QUERY-CODE side vs one corpus-codes scan — "
        "the brute-rerank shape over 8x smaller integer payload"),
    "ann_recall_eval": (
        "BNLJ inherited from its two composed subplans — the brute "
        "baseline's broadcast QUERY side and the IVF path's broadcast "
        "1-ROW centroid ARRAY (both documented above); the comparison "
        "join itself is equi on (query_id, vec_id) over k-bounded rows"),
    "dedup_lsh_recall": (
        "crossJoins of three broadcast 1-ROW count aggregates (truth/LSH/"
        "hit totals) — constant-size sides; the truth side itself is the "
        "documented block-pair equi-join exact baseline, the hit join is "
        "equi on (d1, d2)"),
    "rel_skyline_suppliers": (
        "BNLJ = the dominance inequality ANTI-join over the "
        "POST-AGGREGATION per-supplier table (dimension-sized, never "
        "corpus rows) — the corpus itself moves through one partial-agg "
        "groupBy only"),
    "ann_mips_topk": (
        "BNLJ = crossJoin with the broadcast 1-ROW max-norm aggregate "
        "(the augmented-transform constant M) plus the broadcast QUERY "
        "side vs one corpus scan — the documented exact-MIPS baseline "
        "(the LSH/IVF siblings are the scale path, unchanged by the "
        "transform)"),
    "ann_ivf_topk": (
        "BNLJ = crossJoin with the broadcast 1-ROW centroid ARRAY (narrow "
        "per-row argmin cell assignment — constant-size side); the "
        "candidate join is broadcast-hash equi on cent_id (probe side "
        "bounded by queries x nprobe)"),
    "rel_tumbling_hourly": (
        "crossJoin with a broadcast 1-ROW aggregate (corpus min ts) — "
        "constant-size side"),
    "rel_supplier_concentration": (
        "crossJoin with a broadcast 1-ROW aggregate (global revenue total "
        "+ supplier count, the Q11 scalar) — constant-size side"),
    "rel_rolling_1h": (
        "crossJoin with a broadcast 1-ROW aggregate (corpus min ts, the "
        "timezone-free order-key origin) — constant-size side; the frame "
        "itself is a RANGE window partitioned on user_id"),
    "cur_stratified_sample": (
        "crossJoin with a broadcast 1-ROW aggregate (global min stratum "
        "count) — constant-size side"),
    "ta_tfidf_topk": (
        "crossJoin with a broadcast 1-ROW aggregate (corpus doc count) — "
        "constant-size side"),
    "ta_bm25_topk": (
        "crossJoin with a broadcast 1-ROW aggregate (doc count + total "
        "doc length for avgdl) — constant-size side; the postings probe "
        "and df joins are equi on word"),
    "dedup_semantic": (
        "BNLJ = crossJoin with the broadcast 1-ROW centroid ARRAY (narrow "
        "argmax cell assignment, same shape as ann_ivf_topk); the prune "
        "join is equi on cent_id"),
    "rel_scd2_history": (
        "crossJoin with a broadcast 1-ROW aggregate (corpus min ts, the "
        "timezone-free interval origin) — constant-size side; versioning "
        "itself is a lead() window partitioned on user_id"),
    "rel_cohort_retention": (
        "crossJoin with a broadcast 1-ROW aggregate (corpus min ts, the "
        "hour-bucket origin) — constant-size side; cohort passes are "
        "mergeable aggregations keyed on user/cohort"),
    "cur_bloom_decontaminate": (
        "BNLJ = crossJoin with the broadcast 1-ROW dense Bloom bitset "
        "ARRAY (64 bigint words) — constant-size side; membership is a "
        "pure map-side projection over it, the only corpus shuffle is "
        "the per-doc aggregation"),
    "ann_kmeans_train": (
        "BNLJ = crossJoin with the broadcast 1-ROW K-centroid ARRAY in "
        "each Lloyd assignment step (narrow argmin, constant-size side); "
        "the centroid update is a (cent_id, dim) integer partial "
        "aggregation, never a join"),
    "ann_ivf_trained_topk": (
        "BNLJ = crossJoin with the broadcast 1-ROW trained-centroid ARRAY "
        "(Lloyd steps + narrow argmin assignment + probe; same shape as "
        "ann_ivf_topk); the candidate join is broadcast-hash equi on "
        "cent_id"),
    "ta_lm_xent": (
        "crossJoin with a broadcast 1-ROW aggregate (LM total count + "
        "vocab size) — constant-size side; the vocab join itself is equi "
        "on gram"),
    "cur_dsir_select": (
        "crossJoin with a broadcast 1-ROW aggregate (target/raw totals + "
        "vocab sizes) — constant-size side; the model join is equi on "
        "gram"),
    "cur_temperature_mix": (
        "crossJoin with a broadcast 1-ROW aggregate (global min language "
        "count) — constant-size side"),
    "ann_pq_adc_topk": (
        "BNLJ = broadcast of the 1-ROW PQ codebook (encode + query "
        "tables) and of the bounded query-side ADC tables vs one "
        "corpus-codes scan — the documented ADC shape"),
    "ann_ivf_pq_topk": (
        "BNLJ = crossJoin with the broadcast 1-ROW centroid ARRAY (narrow "
        "argmin cells) + the 1-ROW PQ codebook; the candidate join is "
        "broadcast-hash equi on cent_id (per-query dtab side bounded)"),
    "ann_rerank_exact": (
        "BNLJ inherited from the composed IVF-PQ stage-1 subplan (the "
        "broadcast 1-ROW centroid ARRAY + 1-ROW PQ codebook documented "
        "above); the stage-2 refinement joins are equi — co-partitioned "
        "on vec_id for the RERANK_C-bounded shortlist, broadcast on "
        "query_id for the bounded query-vector side"),
    "ta_kneser_ney": (
        "crossJoin with the broadcast 1-ROW (B, V) scalar pair — "
        "constant-size side; every model lookup (gram counts, context "
        "totals, continuation counts) is equi on its word key, never "
        "broadcast (10^9-vocab rule)"),
    "ta_pmi_collocations": (
        "crossJoin with a broadcast 1-ROW aggregate (total bigram count "
        "N) — constant-size side; the two unigram lookups are equi on "
        "word (vocab never broadcast)"),
    "ta_bpe_merges": (
        "crossJoin per unrolled round with two broadcast 1-ROW frames "
        "(max pair count, elected winner pair) — constant-size sides; "
        "the pair-count shuffle is the only data movement per round"),
    "rel_gapfill_locf": (
        "crossJoins with broadcast 1-ROW aggregates (corpus min ts; max "
        "hour bucket for spine generation) — constant-size sides; the "
        "spine join is equi on (event_type, hb) over dimension-sized "
        "data"),
    "rel_range_join": (
        "crossJoin with a broadcast 1-ROW aggregate (corpus min ts, the "
        "module's time-origin discipline); the interval join itself is "
        "EQUI on the time bucket with the range test as a residual "
        "filter — the explicit binning that keeps a range join a hash "
        "join instead of a nested loop"),
    "ta_bpe_encode": (
        "same per-round crossJoins as ta_bpe_merges for TRAINING, plus "
        "one crossJoin of the corpus with the broadcast 1-ROW pivoted "
        "merge table — constant-size side; encoding itself is map-side "
        "string algebra, the corpus is never shuffled"),
    "ta_tokenizer_fertility": (
        "BNLJ inherited from the composed ta_bpe_encode subplan (the "
        "per-round training crossJoins + the broadcast 1-ROW pivoted "
        "merge table, documented above); lang attaches by an equi-join "
        "on doc_id and the rollup is one tiny groupBy(lang)"),
    "rel_idle_customers": (
        "crossJoin with a broadcast 1-ROW aggregate (positive-balance "
        "sum + count for the cross-multiplied above-average test) — "
        "constant-size side; the no-recent-order check is a left ANTI "
        "equi-join"),
}

HEADER = '''# PLANS.md — physical-plan audit of the driver query surface

Generated from `df.explain("formatted")` over every `queries()` entry at
sf0.01 (tools/audit_plans.py).  Join *keys* are size-independent; join
*strategy* is not — the self-equi-joins below show as BroadcastHashJoin
only because an sf0.01 side fits the broadcast threshold, and at real
scale Catalyst/AQE picks a shuffle join on the SAME equi keys (the
property that matters — no plan here degrades to an all-pairs loop when
the broadcast no longer fits).  Invariants enforced across the surface:

* **No unintended cartesian products.** The only BroadcastNestedLoopJoin /
  crossJoin occurrences are deliberate broadcasts of provably tiny sides
  (1-row aggregates, bounded centroid/query sets) — each annotated below.
* **No per-row Python.** Every Python stage is Arrow-batched
  (`MapInPandas`/`MapInArrow`); `BatchEvalPython` (row-at-a-time UDF)
  appears in zero plans.
* **Distributed top-k.** Global orderings plan as `TakeOrderedAndProject`,
  never a single-task global window.
* **Scan pruning.** Parquet scans carry `PushedFilters`/narrow
  `ReadSchema` where the query filters/projects (Python-stage inputs
  read the payload column by necessity).

Caveat: the `stream_*` rows audit the POST-STREAM read-back plan (the
query functions run a real streaming job and return the materialized
sink) — the streaming dataflow itself (watermark/state/Python stages) is
not visible to a batch `explain` and is covered by the streaming pytest
suite instead.

| query | joins | properties | cartesian-flag note |
|---|---|---|---|
'''

FOOTER = """
Regenerate with `python tools/audit_plans.py`;
`tools/check_correctness.py` exercises the same surface end-to-end.
"""


def classify(plan: str) -> dict:
    joins = []
    for j, tag in (("SortMergeJoin", "SORT_MERGE"),
                   ("BroadcastHashJoin", "BHJ"),
                   ("ShuffledHashJoin", "SHJ")):
        if j in plan:
            joins.append(tag)
    return {
        "joins": joins,
        "cartesian": ("BroadcastNestedLoopJoin" in plan
                      or "CartesianProduct" in plan),
        "batch_eval": "BatchEvalPython" in plan,
        "arrow_stage": ("MapInArrow" in plan or "ArrowEvalPython" in plan
                        or "MapInPandas" in plan
                        or "FlatMapGroupsInPandas" in plan),
        "topk": "TakeOrderedAndProject" in plan,
        "pushed": bool(re.search(r"PushedFilters: \[[^\]]", plan)),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from document_processor_spark.session import build_spark

    spark = build_spark(app="audit-plans", cores=8)
    failures = []
    rows = []
    for name, q in sorted(entry.queries().items()):
        df = q(spark, args.sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        c = classify(plan)
        if c["batch_eval"]:
            failures.append(f"{name}: BatchEvalPython (per-row UDF) in plan")
        if c["cartesian"] and name not in NOTES:
            failures.append(f"{name}: undocumented cartesian-shaped join")
        flags = []
        if c["pushed"]:
            flags.append("pushed-filters")
        if c["topk"]:
            flags.append("TakeOrderedAndProject")
        if c["arrow_stage"]:
            flags.append("arrow-python-stage")
        cart = NOTES.get(name, "") if c["cartesian"] else ""
        rows.append(f"| {name} | {', '.join(c['joins']) or '—'} | "
                    f"{', '.join(flags) or '—'} | "
                    f"{cart or ('broadcast-nested-loop (see note)' if c['cartesian'] else 'none')} |")
        print(f"[plans] {name}: joins={c['joins']} cart={c['cartesian']}",
              file=sys.stderr, flush=True)

    (REPO / "PLANS.md").write_text(HEADER + "\n".join(rows) + "\n" + FOOTER)
    print(f"written: {REPO / 'PLANS.md'} ({len(rows)} queries)")
    if failures:
        print("AUDIT FAILURES:", *failures, sep="\n  ")
        return 1
    # second audit tier: no parked query may certify against code newer
    # than its driver row (tools/check_stale_certs.py, hard-fails on any)
    import subprocess
    rc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "check_stale_certs.py")],
        cwd=REPO).returncode
    if rc != 0:
        print("AUDIT FAILURES:\n  stale driver certification (see above)")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
