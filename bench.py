#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].  Prints exactly ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": <sf>, ...extras}

The headline workload is the end-to-end extraction pipeline over the
deterministic fixture corpus at the dir's scale factor, replicated
REP× inside Spark (crossJoin with range — distributed, so generation
cost stays off the measured path), plus the heavy training-data
operators over the dir's parquet tables.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def _sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    rep = int(os.environ.get("SPARK_GRAFT_REP", "10"))
    executors = int(os.environ.get("SPARK_GRAFT_EXECUTORS", "0")) or None
    exec_cores = int(os.environ.get("SPARK_GRAFT_EXEC_CORES", "4"))
    sf = _sf_from_dir(sf_dir)

    from pyspark.sql import functions as F

    from document_processor_spark import fixtures, pipeline
    from document_processor_spark.operators import ann, dedup, relational, text_analysis
    from document_processor_spark.session import build_spark

    if executors:
        cpus = executors * exec_cores
    spark = build_spark(app="bench", cores=cpus,
                        shuffle_partitions=max(cpus * 2, 16),
                        executors=executors, exec_cores=exec_cores)

    # -- build the replicated corpus (cached: not part of measured time) ----
    base = fixtures.corpus_df(spark, sf, n_partitions=max(cpus, 16))
    corpus = (base.crossJoin(spark.range(rep).select(F.col("id").alias("rep")))
              .select(F.concat_ws("#", "doc_id", "rep").alias("doc_id"), "spans")
              .repartition(max(cpus * 2, 16), "doc_id")
              .persist())
    n_docs = corpus.count()  # materialize cache before timing

    queries: dict[str, float] = {}
    extras: dict[str, float] = {}
    if executors:
        extras["executors"] = executors
        extras["exec_cores"] = exec_cores

    def timed(name: str, fn):
        print(f"[bench] {name} ...", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        out = fn()
        queries[name] = round(time.perf_counter() - t0, 3)
        print(f"[bench] {name}: {queries[name]}s", file=sys.stderr, flush=True)
        return out

    # -- headline: end-to-end extraction, both engines ----------------------
    # Steady-state methodology (BASELINE.md): the first execution of a plan
    # pays one-time JVM/JIT warm-up of the generated code (~40s here,
    # irrelevant at real job scale where a run is hours); each engine runs
    # twice and the second, steady-state time is recorded.  Cold times are
    # reported alongside as extras.
    def run_extract(engine: str):
        result, in_obs, out_obs = pipeline.extract_with_metrics(
            corpus, engine=engine)
        result.write.format("noop").mode("overwrite").save()
        return out_obs.get

    t0 = time.perf_counter()
    m_sql = run_extract("sql")
    extras["extract_catalyst_cold"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    run_extract("arrow")
    extras["extract_arrow_cold"] = round(time.perf_counter() - t0, 3)

    # steady state = min of repeated runs (min is the standard noise-robust
    # estimator; the sandbox VM sees transient host interference)
    def steady(name: str, fn, n: int = 3):
        best = None
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        queries[name] = round(best, 3)
        print(f"[bench] {name}: {queries[name]}s (min of {n})",
              file=sys.stderr, flush=True)

    steady("extract_catalyst", lambda: run_extract("sql"))
    extras["docs_per_sec"] = round(n_docs / queries["extract_catalyst"], 1)
    extras["spans_per_sec"] = round(
        m_sql["spans_out"] / queries["extract_catalyst"], 1)
    extras["docs"] = n_docs
    extras["spans_out"] = int(m_sql["spans_out"])
    extras["ocr_fallback_rate"] = round(
        m_sql["fallback_pages"] / max(m_sql["pages_in"], 1), 5)

    steady("extract_arrow", lambda: run_extract("arrow"), n=2)

    if os.environ.get("SPARK_GRAFT_EXTRACT_ONLY"):
        total = round(sum(queries.values()), 3)
        print(json.dumps({
            "metric": "end-to-end extraction wall time (steady state)",
            "value": total, "unit": "sec", "queries": queries, "sf": sf,
            "cpus": cpus, "rep": rep, **extras,
        }))
        return 0

    # -- training-data operators over the dir's tables ----------------------
    timed("dedup_minhash_lsh",
          lambda: dedup.q_dedup_minhash_lsh(spark, sf_dir).count())
    timed("dedup_embedding_cosine_lsh",
          lambda: dedup.q_dedup_embedding_cosine_lsh(spark, sf_dir).count())
    timed("ann_bruteforce_topk",
          lambda: ann.q_ann_bruteforce_topk(spark, sf_dir).count())
    timed("ta_quality",
          lambda: text_analysis.q_quality(spark, sf_dir)
          .agg(F.sum("n_words")).collect())
    timed("rel_pricing_summary",
          lambda: relational.q_pricing_summary(spark, sf_dir).collect())

    total = round(sum(queries.values()), 3)
    print(json.dumps({
        "metric": "end-to-end extraction + training-data ops wall time",
        "value": total, "unit": "sec", "queries": queries, "sf": sf,
        "cpus": cpus, "rep": rep, **extras,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
