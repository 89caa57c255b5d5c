#!/usr/bin/env python
"""Two-parallelism scaling proof (BASELINE.json north_rule).

Runs the identical extraction job on the identical input at **local[8] and
local[32]** — the sandbox proxy for N vs 4N executors sanctioned by the
round-2 driver instructions ("run the same job at two parallelism levels
(e.g. local[8] and local[32]) on the same input and report throughput at
both plus the scaling efficiency").  Each level runs bench.py in a fresh
process (its own JVM, fully re-warmed from scratch) so no JIT/cache state
leaks between levels; bench.py warms the generated code to a plateau on a
small corpus, then measures the full corpus (steady state = min of the
measured runs).  rep is sized so the measured wall is >=30 s even at the
fast level, keeping fixed per-run overheads (planning, AQE, stage
scheduling) under a few percent of wall.

A secondary local-cluster mode (separate executor JVMs, 2x4 vs 8x4 cores)
can be enabled with SPARK_GRAFT_CLUSTER=1 for a multi-JVM cross-check.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_level(sf_dir: str, rep: int, *, cpus: int | None = None,
              executors: int | None = None) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_REP=str(rep),
               SPARK_GRAFT_EXTRACT_ONLY="1",
               SPARK_DRIVER_MEM=os.environ.get("SPARK_DRIVER_MEM", "48g"))
    if executors:
        env["SPARK_GRAFT_EXECUTORS"] = str(executors)
        env["SPARK_GRAFT_EXEC_CORES"] = "4"
    else:
        env["SPARK_GRAFT_CPUS"] = str(cpus)
        env.pop("SPARK_GRAFT_EXECUTORS", None)
    label = f"{executors}x4 executors" if executors else f"local[{cpus}]"
    print(f"[scaling] running level {label} rep={rep} ...",
          file=sys.stderr, flush=True)
    out = subprocess.run([sys.executable, str(REPO / "bench.py")],
                         env=env, capture_output=True, text=True, check=True)
    line = json.loads(out.stdout.strip().splitlines()[-1])
    print(f"[scaling] {label}: {line['queries']}", file=sys.stderr, flush=True)
    return line


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # rep sized so the FAST level's steady wall is >=30 s (fixed overheads
    # <10% of wall); both levels process the identical input
    rep = int(os.environ.get("SPARK_GRAFT_REP", "400"))
    cluster = bool(os.environ.get("SPARK_GRAFT_CLUSTER"))

    if cluster:
        r_low = run_level(sf_dir, rep, executors=2)
        r_high = run_level(sf_dir, rep, executors=8)
        low_name, high_name = "2×4-core executors", "8×4-core executors"
    else:
        r_low = run_level(sf_dir, rep, cpus=8)
        r_high = run_level(sf_dir, rep, cpus=32)
        low_name, high_name = "local[8] (N=8 cores)", "local[32] (4N=32 cores)"

    t_low = r_low["queries"]["extract_catalyst"]
    t_high = r_high["queries"]["extract_catalyst"]
    thr_low = r_low["docs_per_sec"]
    thr_high = r_high["docs_per_sec"]
    eff = thr_high / (thr_low * 4)

    ta_low = r_low["queries"]["extract_arrow"]
    ta_high = r_high["queries"]["extract_arrow"]
    eff_a = (ta_low / ta_high) / 4

    md = f"""# BENCH/BASELINE.md — measured throughput & scaling efficiency

North rule: throughput scaling efficiency >= 0.8 from N to 4N executors
(BASELINE.json).  Sandbox proxy per the driver instructions: the identical
extraction job on the identical input at two parallelism levels —
**{low_name} vs {high_name}** on the {os.cpu_count()}-core host.

Methodology: fixture corpus at SF={r_low['sf']} replicated rep={rep}× inside
Spark → {r_low['docs']} documents / {r_low['spans_out']} output spans
(measured input; corpus build + cache materialization are untimed).  Each
level runs in a fresh process/JVM.  Generated whole-stage code runs
interpreted until C2 compiles it (~15× slower), so each level first loops a
small same-plan corpus until wall time plateaus (warm-up series below),
then measures the full corpus; steady state = min of the measured runs.
rep is sized so the fast level's measured wall is >=30 s, keeping fixed
per-run overheads (planning, AQE, stage scheduling) at a few percent.

| metric | {low_name} | {high_name} | scaling efficiency (target ≥ 0.8) |
|---|---|---|---|
| extraction wall, catalyst engine | {t_low:.2f} s | {t_high:.2f} s | **{eff:.3f}** |
| extraction throughput | {thr_low:.1f} docs/s | {thr_high:.1f} docs/s | |
| spans/sec | {r_low['spans_per_sec']:.0f} | {r_high['spans_per_sec']:.0f} | |
| extraction wall, arrow engine | {ta_low:.2f} s | {ta_high:.2f} s | {eff_a:.3f} |
| OCR fallback rate | {r_low['ocr_fallback_rate']} | {r_high['ocr_fallback_rate']} | (metric parity) |

Measured-run series (catalyst): low {r_low.get('extract_catalyst_runs')},
high {r_high.get('extract_catalyst_runs')}.
Warm-up series (catalyst, small corpus): low {r_low.get('warmup_catalyst')},
high {r_high.get('warmup_catalyst')}.

Raw bench lines:

```json
{json.dumps(r_low)}
{json.dumps(r_high)}
```
"""
    out_path = REPO / "BENCH" / ("BASELINE_cluster.md" if cluster else "BASELINE.md")
    out_path.write_text(md)
    print(md)
    print(f"written: {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
