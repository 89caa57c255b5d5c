#!/usr/bin/env python
"""Diagnostic: time each pipeline sub-plan and sample whole-host CPU%.

SPARK_GRAFT_CPUS=32 python BENCH/diag_stages.py [rep]
"""
from __future__ import annotations

import os
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from document_processor_spark import fixtures, pipeline
from document_processor_spark.session import build_spark


def cpu_times():
    parts = open("/proc/stat").readline().split()
    vals = list(map(int, parts[1:]))
    idle = vals[3] + vals[4]
    return sum(vals), idle


def main() -> int:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 40

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

    def timed(name, fn, reps=2):
        best = None
        for i in range(reps):
            t0, (tot0, idl0) = time.perf_counter(), cpu_times()
            fn()
            dt = time.perf_counter() - t0
            tot1, idl1 = cpu_times()
            busy_pct = 100.0 * (1 - (idl1 - idl0) / max(tot1 - tot0, 1))
            print(f"{name} run{i}: {dt:6.2f}s  cpu_busy={busy_pct:5.1f}%", flush=True)
            best = dt if best is None or dt < best else best
        return best

    exploded = pipeline.explode_spans(corpus)
    timed("V1 explode-only       ", lambda: noop(exploded))
    parsed = pipeline.parse_sql(pipeline.explode_spans(corpus))
    timed("V2 explode+shuf+parse ", lambda: noop(parsed))
    # page-level agg only (first half of assemble)
    def page_only():
        p = pipeline.parse_sql(pipeline.explode_spans(corpus))
        span_s = F.when(
            F.col("kind").isNotNull(),
            F.struct(F.col("block"), F.col("kind"), F.col("text"),
                     F.col("media_ref"), F.col("scan_only")))
        pl = p.groupBy("doc_id", "page").agg(
            F.collect_list(span_s).alias("arr"),
            F.max(F.when(F.col("kind").isin("heading", "paragraph")
                         & ~F.col("scan_only"), 1)
                  .otherwise(0)).alias("has_text"))
        noop(pl)
    timed("V3 ..+page-agg        ", page_only)
    full = pipeline.extract_documents(corpus, engine="sql")
    timed("V4 full pipeline      ", lambda: noop(full), reps=3)
    return 0


if __name__ == "__main__":
    sys.exit(main())
