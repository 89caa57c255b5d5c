#!/usr/bin/env python
"""Steady-state runs with GC time + per-stage wall from a status listener."""
from __future__ import annotations

import json
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
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    shuf = int(os.environ.get("SPARK_GRAFT_SHUF", str(max(cpus * 2, 16))))

    evdir = "/tmp/spark-events"
    os.makedirs(evdir, exist_ok=True)
    spark = build_spark(app="diag", cores=cpus, shuffle_partitions=shuf,
                        extra_conf={"spark.eventLog.enabled": "true",
                                    "spark.eventLog.dir": evdir})
    jvm = spark._jvm
    beans = jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()

    def gc_ms():
        return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))

    base = fixtures.corpus_df(spark, 0.1, n_partitions=max(cpus, 16))
    corpus = (base.crossJoin(spark.range(rep).select(F.col("id").alias("rep")))
              .select(F.concat_ws("#", "doc_id", "rep").alias("doc_id"), "spans")
              .repartition(shuf, "doc_id")
              .persist())
    n = corpus.count()
    print(f"cpus={cpus} rep={rep} shuf={shuf} docs={n}", flush=True)

    for i in range(n_runs):
        t0, (tt0, id0), g0 = time.perf_counter(), cpu_times(), gc_ms()
        r, _, _ = pipeline.extract_with_metrics(corpus, engine="sql")
        r.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        tt1, id1 = cpu_times()
        busy = 100.0 * (1 - (id1 - id0) / max(tt1 - tt0, 1))
        print(f"run{i}: {dt:6.2f}s cpu={busy:5.1f}% gc={(gc_ms()-g0)/1000:.2f}s",
              flush=True)
    spark.stop()
    time.sleep(2)
    # summarize stages of the last runs from the event log
    logs = sorted(Path(evdir).glob("*"), key=lambda p: p.stat().st_mtime)
    stages = []
    for line in open(logs[-1]):
        try:
            ev = json.loads(line)
        except Exception:
            continue
        if ev.get("Event") == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            dur = (si.get("Completion Time", 0) - si.get("Submission Time", 0)) / 1000
            stages.append((si["Stage ID"], si["Number of Tasks"], dur,
                           si.get("Stage Name", "")[:60]))
    for s in stages[-12:]:
        print(f"stage {s[0]:3d} tasks={s[1]:3d} wall={s[2]:6.2f}s  {s[3]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
