#!/usr/bin/env python
"""Interleaved A/B timing of arrow-parse configurations.

The block-sequential diagnostic (diag_arrow_stage.py) showed a 4x swing
between maxRecordsPerBatch settings — but this host's wall clock drifts
2-14x over minutes, so sequential blocks confound config with time.
This runs the variants ROUND-ROBIN for several rounds: a config effect
shows up as a consistent per-round ranking; host drift shows up as all
variants moving together.

Usage: SPARK_GRAFT_CPUS=32 python BENCH/diag_arrow_interleaved.py [rep] [rounds]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from document_processor_spark import fixtures, pipeline
    from document_processor_spark.session import build_spark

    spark = build_spark(app="diag-arrow-ab", cores=cpus,
                        shuffle_partitions=max(cpus * 8, 64), pretouch=True)

    base = fixtures.corpus_df(spark, 0.1, n_partitions=max(cpus, 16))
    corpus = (base.crossJoin(spark.range(rep).select(F.col("id").alias("rep")))
              .select(F.concat_ws("#", "doc_id", "rep").alias("doc_id"), "spans")
              .repartition(max(cpus * 2, 16), "doc_id")
              .persist())
    n = corpus.count()
    rows = pipeline.explode_spans(corpus)
    print(f"docs={n} cpus={cpus}", flush=True)

    def arrow_at(parts: int, mrpb: int):
        def run():
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                           str(mrpb))
            df = (rows.repartition(parts, "doc_id", "page")
                  .mapInArrow(_fn(), pipeline.PARSED_DDL))
            df.write.format("noop").mode("overwrite").save()
        return run

    variants = {
        "p192_b10k": arrow_at(192, 10_000),
        "p192_b50k": arrow_at(192, 50_000),
        "p32_b10k": arrow_at(32, 10_000),
        "p32_b50k": arrow_at(32, 50_000),
        "p64_b50k": arrow_at(64, 50_000),
    }

    # warm everything once (JIT + python worker imports)
    for name, fn in variants.items():
        fn()
    results = {k: [] for k in variants}
    for r in range(rounds):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            fn()
            results[name].append(round(time.perf_counter() - t0, 2))
        print(f"round {r}: " + "  ".join(
            f"{k}={results[k][-1]:6.2f}" for k in variants), flush=True)
    print("--- medians ---")
    for k, v in results.items():
        s = sorted(v)
        print(f"{k:12s} median={s[len(s)//2]:6.2f}  runs={v}", flush=True)
    return 0


def _fn():
    import pyarrow as pa

    from document_processor_spark.pipeline import _parse_pandas_batch

    def fn(batches):
        schema = pa.schema([
            pa.field("doc_id", pa.string()), pa.field("page", pa.int32()),
            pa.field("block", pa.int32()),
            *(pa.field(f"{p}_{c}", pa.string())
              for p in ("fast", "full") for c in ("kind", "text", "media_ref")),
        ])
        for batch in batches:
            res = _parse_pandas_batch(batch.to_pandas())
            yield pa.RecordBatch.from_pandas(res, schema=schema,
                                             preserve_index=False)
    return fn


if __name__ == "__main__":
    sys.exit(main())
