#!/usr/bin/env python
"""Standalone scaling probe of the arrow-engine parse kernel.

Runs `pipeline._parse_pandas_batch` over identical fixture-derived span
batches in N independent worker processes (no Spark, no JVM) and reports
aggregate rows/sec at each N.  Separates the two scaling hypotheses for the
arrow engine's flat multi-JVM curve:

* kernel-bound: if the BARE kernel stops scaling past ~8 processes, the
  limit is host-level (Python object churn saturating the memory
  bus/allocator) and the fix is a lighter kernel;
* plumbing-bound: if the bare kernel scales but the Spark stage doesn't,
  the fix is in Arrow batch sizing / worker reuse / serialization.

Usage: python BENCH/diag_kernel_scaling.py [rows_per_proc] [levels...]
"""

from __future__ import annotations

import multiprocessing as mp
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _build_batch(n_rows: int):
    import pandas as pd

    from document_processor_spark import contract as C
    from document_processor_spark import fixtures

    docs = fixtures.generate_corpus(0.01, include_skew=False)
    rows = []
    while len(rows) < n_rows:
        for d in docs:
            for s in d["spans"]:
                page, block = C.split_offset(s["offset"])
                rows.append((d["doc_id"], page, block, s["kind"],
                             s["text"], s["media_ref"]))
            if len(rows) >= n_rows:
                break
    return pd.DataFrame(rows[:n_rows], columns=[
        "doc_id", "page", "block", "raw_kind", "raw_text", "raw_media_ref"])


def _worker(q, pdf, reps, kernel):
    if kernel == "pandas":
        from document_processor_spark.pipeline import _parse_pandas_batch

        def run(b):
            _parse_pandas_batch(b)
        batch = pdf
        warm = pdf.head(1000)
    else:
        import pyarrow as pa

        from document_processor_spark.pipeline import _parse_arrow_batch

        def run(b):
            for _ in _parse_arrow_batch(b):
                pass
        batch = pa.RecordBatch.from_pandas(pdf, preserve_index=False)
        warm = pa.RecordBatch.from_pandas(pdf.head(1000), preserve_index=False)
    run(warm)  # warm imports/regex caches
    t0 = time.perf_counter()
    for _ in range(reps):
        run(batch)
    q.put(reps * len(pdf) / (time.perf_counter() - t0))


def main() -> int:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    levels = [int(x) for x in sys.argv[2:]] or [1, 4, 8, 16, 32]
    pdf = _build_batch(rows)
    print(f"batch: {len(pdf)} rows, kinds={dict(pdf.raw_kind.value_counts())}",
          file=sys.stderr)
    for kernel in ("arrow", "pandas"):
        print(f"--- kernel={kernel} ---", flush=True)
        for n in levels:
            q = mp.Queue()
            ps = [mp.Process(target=_worker, args=(q, pdf, 3, kernel))
                  for _ in range(n)]
            [p.start() for p in ps]
            agg = sum(q.get() for _ in ps)
            [p.join() for p in ps]
            print(f"procs={n:3d}  aggregate={agg/1e3:9.1f} krows/s  "
                  f"per-proc={agg/n/1e3:7.1f} krows/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
