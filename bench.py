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
    # shuffle partitions scale with cores (a 4N cluster runs 4N-proportional
    # partitioning); AQE coalesces the small ones back together
    # pretouch: fault the whole heap in during (untimed) session start —
    # lazy heap growth on this VM causes kernel page-fault storms that
    # poison measured runs (see session.build_spark)
    spark = build_spark(app="bench", cores=cpus,
                        shuffle_partitions=max(cpus * 8, 64),
                        executors=executors, exec_cores=exec_cores,
                        pretouch=True)

    # -- build the replicated corpora (cached: not part of measured time) ---
    # `corpus` is the measured input; `warm_corpus` is a small same-shaped
    # corpus used only for JIT warm-up: the generated whole-stage code is
    # identical for any rep (same plan/schema), so warming on 1/8 of the
    # data compiles every hot method without paying interpreted execution
    # over the full input (cold-vs-steady is ~15x here).
    def replicated(n_rep: int):
        base = fixtures.corpus_df(spark, sf, n_partitions=max(cpus, 16))
        c = (base.crossJoin(spark.range(n_rep).select(F.col("id").alias("rep")))
             .select(F.concat_ws("#", "doc_id", "rep").alias("doc_id"), "spans")
             .repartition(max(cpus * 2, 16), "doc_id")
             .persist())
        return c, c.count()

    corpus, n_docs = replicated(rep)
    # C2 compile thresholds are invocation-based (~10k calls), not
    # data-size-based: a tiny corpus triggers every compile while paying
    # interpreted execution over 1/100 of the rows
    rep_warm = max(2, rep // 64)
    warm_corpus = corpus if rep_warm >= rep else replicated(rep_warm)[0]

    queries: dict[str, float] = {}
    extras: dict = {}
    if executors:
        extras["executors"] = executors
        extras["exec_cores"] = exec_cores

    def timed(name: str, fn, reps: int = 3):
        # min-of-reps: single-shot walls on this virtualized host vary 2-3x
        # run-to-run (noisy neighbors); min is the same noise-robust
        # steady-state estimator the extract phases use
        print(f"[bench] {name} ...", file=sys.stderr, flush=True)
        out, best, runs = None, None, []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            dt = round(time.perf_counter() - t0, 3)
            runs.append(dt)
            best = dt if best is None or dt < best else best
        queries[name] = best
        print(f"[bench] {name}: {best}s (runs {runs})", file=sys.stderr,
              flush=True)
        return out

    # -- headline: end-to-end extraction, both engines ----------------------
    def run_extract(engine: str, on=None):
        result, in_obs, out_obs = pipeline.extract_with_metrics(
            on if on is not None else corpus, engine=engine)
        result.write.format("noop").mode("overwrite").save()
        return out_obs.get

    # Steady-state methodology (BENCH/BASELINE.md): generated code runs
    # interpreted until C2 JIT compiles it (up to ~15x slower, and it takes
    # several executions to fully converge), which is irrelevant at real job
    # scale where one run is hours.  Warm-up therefore loops on the small
    # corpus until the wall time plateaus, then the measured runs hit fully
    # compiled code; steady state = min of the measured runs (min is the
    # standard noise-robust estimator on a shared/virtualized host).
    def warmup(engine: str, max_runs: int = 10) -> list[float]:
        series, best, stall = [], None, 0
        for _ in range(max_runs):
            t0 = time.perf_counter()
            run_extract(engine, on=warm_corpus)
            dt = time.perf_counter() - t0
            series.append(round(dt, 2))
            if best is not None and dt > best * 0.92:
                stall += 1
                if stall >= 2:
                    break
            else:
                stall = 0
            best = dt if best is None or dt < best else best
        print(f"[bench] warmup[{engine}]: {series}", file=sys.stderr, flush=True)
        return series

    def steady(name: str, engine: str, n: int = 7):
        # Estimators: `min` is the steady-state number (noise-robust on a
        # shared/virtualized host), but a scaling claim hung on the single
        # best of n runs is fragile when the series spreads 2-14x — so the
        # median and IQR are reported alongside and the scaling proof
        # (BENCH/run_scaling.py) computes efficiency on MEDIANS, with min
        # as the secondary view.
        runs = []
        last = None
        for _ in range(n):
            t0 = time.perf_counter()
            last = run_extract(engine)
            runs.append(round(time.perf_counter() - t0, 3))
        s = sorted(runs)
        med = s[len(s) // 2] if len(s) % 2 else (s[len(s)//2 - 1] + s[len(s)//2]) / 2
        q1, q3 = s[len(s) // 4], s[(3 * len(s)) // 4]
        queries[name] = min(runs)
        extras[f"{name}_runs"] = runs
        extras[f"{name}_median"] = round(med, 3)
        extras[f"{name}_iqr"] = [q1, q3]
        print(f"[bench] {name}: min={queries[name]}s median={med:.3f}s "
              f"iqr=[{q1}, {q3}] (runs {runs})", file=sys.stderr, flush=True)
        return last

    extras["warmup_catalyst"] = warmup("sql")
    m_sql = steady("extract_catalyst", "sql")
    extras["docs_per_sec"] = round(n_docs / queries["extract_catalyst"], 1)
    extras["spans_per_sec"] = round(
        m_sql["spans_out"] / queries["extract_catalyst"], 1)
    extras["docs"] = n_docs
    extras["spans_out"] = int(m_sql["spans_out"])
    extras["ocr_fallback_rate"] = round(
        m_sql["fallback_pages"] / max(m_sql["pages_in"], 1), 5)

    extras["warmup_arrow"] = warmup("arrow", max_runs=4)
    steady("extract_arrow", "arrow", n=5)

    if os.environ.get("SPARK_GRAFT_EXTRACT_ONLY"):
        total = round(sum(queries.values()), 3)
        print(json.dumps({
            "metric": "end-to-end extraction wall time (steady state)",
            "value": total, "unit": "sec", "queries": queries, "sf": sf,
            "cpus": cpus, "rep": rep, **extras,
        }))
        return 0

    # -- training-data operators over the dir's tables ----------------------
    # SPARK_GRAFT_FULL=1: time EVERY driver query (min-of-2) so a
    # regression in any of the operator queries surfaces in the bench line,
    # not only in the 7 headliners.
    if os.environ.get("SPARK_GRAFT_FULL"):
        import __spark_entry__ as entry

        # SPARK_GRAFT_FULL_ONLY=a,b,c: measure a subset with the identical
        # methodology — for delta sweeps of newly added queries, merged
        # into the committed baseline by tools/report_full_bench.py
        only = {n.strip() for n in os.environ.get(
            "SPARK_GRAFT_FULL_ONLY", "").split(",") if n.strip()}
        unknown = only - set(entry.queries())
        if unknown:
            print(f"[bench] FATAL: SPARK_GRAFT_FULL_ONLY names unknown "
                  f"queries: {sorted(unknown)}", file=sys.stderr)
            return 2
        full: dict[str, float] = {}
        for name, q in sorted(entry.queries().items()):
            if only and name not in only:
                continue
            print(f"[bench] full:{name} ...", file=sys.stderr, flush=True)
            walls = []
            for _ in range(2):
                t0 = time.perf_counter()
                q(spark, sf_dir).write.format("noop").mode("overwrite").save()
                walls.append(round(time.perf_counter() - t0, 3))
            full[name] = min(walls)
            print(f"[bench] full:{name}: {full[name]}s", file=sys.stderr,
                  flush=True)
        extras["full_queries"] = full
        extras["full_total"] = round(sum(full.values()), 3)

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
