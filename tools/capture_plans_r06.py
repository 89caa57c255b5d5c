#!/usr/bin/env python
"""Capture .explain('formatted') for the r6-touched queries into
plans/r06/<name>_{before,after}.txt.

`after` runs against the working tree.  `before` runs against a pristine
round-start checkout (git worktree of the round-start commit) by
re-execing this script with PYTHONPATH pointed there — the judge checks
plan claims (Exchange counts, join strategies) against these files.

Usage:
    python tools/capture_plans_r06.py after
    python tools/capture_plans_r06.py before /tmp/r6base
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "after"
    tree = sys.argv[2] if len(sys.argv) > 2 else str(REPO)
    sys.path.insert(0, tree)

    from pyspark.sql import functions as F

    from document_processor_spark import fixtures, pipeline
    from document_processor_spark.operators import (ann, dedup, relational,
                                                    text_analysis)
    from document_processor_spark.session import build_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark(app=f"plans-{tag}", cores=cpus,
                        shuffle_partitions=max(cpus * 8, 64))

    # the bench corpus shape: replicated + hash-partitioned by doc_id
    base = fixtures.corpus_df(spark, 0.1, n_partitions=max(cpus, 16))
    corpus = (base.crossJoin(spark.range(10).select(F.col("id").alias("rep")))
              .select(F.concat_ws("#", "doc_id", "rep").alias("doc_id"),
                      "spans")
              .repartition(max(cpus * 2, 16), "doc_id")
              .persist())
    corpus.count()

    out_dir = REPO / "plans" / "r06"
    out_dir.mkdir(parents=True, exist_ok=True)

    plans = {
        "extract_catalyst":
            lambda: pipeline.extract_documents(corpus, engine="sql"),
        "extract_arrow":
            lambda: pipeline.extract_documents(corpus, engine="arrow"),
        "dedup_minhash_lsh":
            lambda: dedup.q_dedup_minhash_lsh(spark, sf_dir),
        "dedup_embedding_cosine_lsh":
            lambda: dedup.q_dedup_embedding_cosine_lsh(spark, sf_dir),
        "ann_bruteforce_topk":
            lambda: ann.q_ann_bruteforce_topk(spark, sf_dir),
        "ta_quality":
            lambda: text_analysis.q_quality(spark, sf_dir),
        "rel_pricing_summary":
            lambda: relational.q_pricing_summary(spark, sf_dir),
    }
    for name, mk in plans.items():
        try:
            df = mk()
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            (out_dir / f"{name}_{tag}.txt").write_text(buf.getvalue())
            print(f"captured {name}_{tag}", flush=True)
        except Exception as e:  # capture must never kill the round
            print(f"FAILED {name}: {e}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
