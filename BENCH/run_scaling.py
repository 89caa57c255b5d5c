#!/usr/bin/env python
"""Two-parallelism scaling proof (BASELINE.json north_rule).

Runs the identical extraction job on the identical input at local[8] and
local[32] (the sandbox proxy for N vs 4N executors), computes throughput at
both and the scaling efficiency, and writes BENCH/BASELINE.md.

Each parallelism level runs bench.py in a fresh process (own JVM) so the
levels don't share JIT/cache state; bench.py itself reports steady-state
times (see its header for the warm-up methodology).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_level(executors: int, sf_dir: str, rep: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_EXECUTORS=str(executors),
               SPARK_GRAFT_EXEC_CORES="4",
               SPARK_GRAFT_REP=str(rep),
               SPARK_GRAFT_EXTRACT_ONLY="1",
               SPARK_DRIVER_MEM=os.environ.get("SPARK_DRIVER_MEM", "8g"))
    out = subprocess.run([sys.executable, str(REPO / "bench.py")],
                         env=env, capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # rep=40 → ~2.6M spans: large enough that per-stage fixed overheads
    # (scheduling, python worker fan-out) don't cap the 4N-level speedup
    rep = int(os.environ.get("SPARK_GRAFT_REP", "40"))
    # N vs 4N executors (north rule), same executor shape (4 cores / 6g),
    # each a separate JVM via Spark local-cluster mode
    low, high = 2, 8

    r_low = run_level(low, sf_dir, rep)
    r_high = run_level(high, sf_dir, rep)

    t_low = r_low["queries"]["extract_catalyst"]
    t_high = r_high["queries"]["extract_catalyst"]
    thr_low = r_low["docs_per_sec"]
    thr_high = r_high["docs_per_sec"]
    eff = thr_high / (thr_low * (high / low))

    ta_low = r_low["queries"]["extract_arrow"]
    ta_high = r_high["queries"]["extract_arrow"]
    eff_a = (ta_low / ta_high) / (high / low)

    md = f"""# BENCH/BASELINE.md — measured throughput & scaling efficiency

Methodology: identical extraction job, identical input (fixture corpus at
{r_low['sf']} SF × rep={rep} → {r_low['docs']} documents,
{r_low['spans_out']} output spans), run at **{low} executors vs {high}
executors** (N vs 4N, same 4-core/6 GiB executor shape) via Spark
local-cluster mode on the {os.cpu_count()}-core sandbox host — each
executor is a separate JVM with its own heap, GC, and Python workers,
the honest single-machine proxy for a multi-executor cluster.  Fresh
JVMs per level; steady-state times (min of repeated runs of the same
plan; cold-run times reported by bench.py as extras — JVM/JIT warm-up
amortizes to zero on real multi-hour jobs).

| metric | {low} executors | {high} executors | scaling efficiency (target ≥ 0.8) |
|---|---|---|---|
| extraction wall (catalyst engine) | {t_low:.2f} s | {t_high:.2f} s | **{eff:.3f}** |
| extraction throughput | {thr_low:.1f} docs/s | {thr_high:.1f} docs/s | |
| spans/sec | {r_low['spans_per_sec']:.0f} | {r_high['spans_per_sec']:.0f} | |
| extraction wall (arrow engine) | {ta_low:.2f} s | {ta_high:.2f} s | {eff_a:.3f} |
| OCR fallback rate | {r_low['ocr_fallback_rate']} | {r_high['ocr_fallback_rate']} | (metric parity) |

Raw bench lines:

```json
{json.dumps(r_low)}
{json.dumps(r_high)}
```
"""
    out_path = REPO / "BENCH" / "BASELINE.md"
    out_path.write_text(md)
    print(md)
    print(f"written: {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
