#!/usr/bin/env python
"""spark-submit entry point for the trainer-facing shard export.

Usage (sandbox)::

    spark-submit --py-files engine.zip jobs/export_shards.py \
        --input /root/testdata/sf0.1/documents.parquet \
        --out /tmp/shards --n-shards 8

Writes shard=K/ parquet directories in deterministic pseudo-random
(md5-hash) order with per-document token offsets; prints a JSON manifest
recomputed from the written files.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-shards", type=int, default=None)
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args(argv)

    from document_processor_spark.export_job import run_shard_export
    from document_processor_spark.operators.curation import N_SHARDS
    from document_processor_spark.session import build_spark

    spark = build_spark(app="export-shards", cores=args.cores)
    docs = spark.read.parquet(args.input)
    m = run_shard_export(spark, docs, args.out,
                         n_shards=args.n_shards or N_SHARDS)
    print(json.dumps({
        "n_shards": m.n_shards, "n_docs": m.n_docs,
        "total_tokens": m.total_tokens,
        "per_shard": {str(k): list(v) for k, v in sorted(m.per_shard.items())},
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
