#!/usr/bin/env python
"""Diagnostic: cached-DataFrame corpus vs parquet-on-tmpfs corpus.

Hypothesis: persist() keeps the replicated corpus as deserialized JVM
objects (millions of span structs) -> old-gen GC pressure + evictions =
the run-to-run variance and the idle cores at local[32].  A parquet scan
(vectorized, off-heap column batches) should be steadier and scale better.

SPARK_GRAFT_CPUS=32 python BENCH/diag_parquet_corpus.py [rep]
"""
from __future__ import annotations

import os
import shutil
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
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 100

    spark = build_spark(app="diag", cores=cpus,
                        shuffle_partitions=max(cpus * 8, 64))
    base = fixtures.corpus_df(spark, 0.1, n_partitions=max(cpus, 16))
    repl = (base.crossJoin(spark.range(rep).select(F.col("id").alias("rep")))
            .select(F.concat_ws("#", "doc_id", "rep").alias("doc_id"), "spans"))

    pq = "/dev/shm/diag-corpus"
    shutil.rmtree(pq, ignore_errors=True)
    t0 = time.perf_counter()
    repl.repartition(max(cpus * 2, 16), "doc_id").write.parquet(pq)
    print(f"parquet corpus write: {time.perf_counter()-t0:.1f}s "
          f"size={sum(f.stat().st_size for f in Path(pq).rglob('*'))/1e9:.2f}GB",
          flush=True)
    corpus_pq = spark.read.parquet(pq)

    corpus_cache = repl.repartition(max(cpus * 2, 16), "doc_id").persist()
    corpus_cache.count()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(name, fn, reps=3):
        for i in range(reps):
            t0, (tot0, idl0) = time.perf_counter(), cpu_times()
            fn()
            dt = time.perf_counter() - t0
            tot1, idl1 = cpu_times()
            busy = 100.0 * (1 - (idl1 - idl0) / max(tot1 - tot0, 1))
            print(f"{name} run{i}: {dt:6.2f}s  cpu_busy={busy:5.1f}%", flush=True)

    full_pq = pipeline.extract_documents(corpus_pq, engine="sql")
    full_cache = pipeline.extract_documents(corpus_cache, engine="sql")
    timed("full[parquet] ", lambda: noop(full_pq), reps=4)
    timed("full[cached ] ", lambda: noop(full_cache), reps=4)
    shutil.rmtree(pq, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
