#!/usr/bin/env python
"""spark-submit entry point for the corpus-curation job.

Usage (sandbox)::

    spark-submit --py-files engine.zip jobs/curate.py \
        --input /root/testdata/sf0.1/documents.parquet \
        --warehouse /tmp/wh --run-id c1 --n-parts 64

Runs the corpus-build funnel (quality gate → eval holdout → exact dedup
→ decontamination → sequence packing) as ONE atomic snapshot commit with
stage-funnel lineage; re-submitting a completed run_id is a no-op (see
document_processor_spark/curation_job.py for why the commit unit is the
run, not the partition).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="parquet path with (doc_id, source, text)")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--n-parts", type=int, default=32)
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--executors", type=int, default=None)
    ap.add_argument("--exec-cores", type=int, default=4)
    args = ap.parse_args(argv)

    from document_processor_spark.curation_job import run_curation_job
    from document_processor_spark.session import build_spark

    spark = build_spark(app=f"curate-{args.run_id}", cores=args.cores,
                        executors=args.executors, exec_cores=args.exec_cores)
    docs = spark.read.parquet(args.input)
    summary = run_curation_job(spark, docs, args.warehouse, args.run_id,
                               n_parts=args.n_parts)
    print(json.dumps({"run_id": summary.run_id, "skipped": summary.skipped,
                      "snapshot_id": summary.snapshot_id,
                      "funnel": summary.funnel}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
