#!/usr/bin/env python
"""A/B: extract_documents vs extract_with_metrics, many reps, CPU%."""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from document_processor_spark import fixtures, pipeline
from document_processor_spark.session import build_spark


def cpu_times():
    parts = open("/proc/stat").readline().split()
    vals = list(map(int, parts[1:]))
    return sum(vals), vals[3] + vals[4]


def main() -> int:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    spark = build_spark(app="diag", cores=cpus,
                        shuffle_partitions=max(cpus * 2, 16))
    base = fixtures.corpus_df(spark, 0.1, n_partitions=max(cpus, 16))
    corpus = (base.crossJoin(spark.range(rep).select(F.col("id").alias("rep")))
              .select(F.concat_ws("#", "doc_id", "rep").alias("doc_id"), "spans")
              .repartition(max(cpus * 2, 16), "doc_id")
              .persist())
    n = corpus.count()
    print(f"cpus={cpus} rep={rep} docs={n}", flush=True)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def run_plain():
        noop(pipeline.extract_documents(corpus, engine="sql"))

    def run_metrics():
        r, i, o = pipeline.extract_with_metrics(corpus, engine="sql")
        noop(r)

    for name, fn in (("plain  ", run_plain), ("metrics", run_metrics)):
        for i in range(n_runs):
            t0, (tt0, id0) = time.perf_counter(), cpu_times()
            fn()
            dt = time.perf_counter() - t0
            tt1, id1 = cpu_times()
            busy = 100.0 * (1 - (id1 - id0) / max(tt1 - tt0, 1))
            print(f"{name} run{i}: {dt:6.2f}s cpu={busy:5.1f}%", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
