#!/usr/bin/env python
"""Render BENCH/FULL_QUERIES.md from a `SPARK_GRAFT_FULL=1 python bench.py`
JSON line: the per-query wall-time baseline for ALL driver queries, so a
regression in any operator (not only the 7 headliners) surfaces as a diff
against a committed number.

Usage: SPARK_GRAFT_FULL=1 python bench.py > /tmp/full.json
       python tools/report_full_bench.py /tmp/full.json
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> int:
    src = Path(sys.argv[1]) if len(sys.argv) > 1 else None
    if src is None or not src.exists():
        print("usage: report_full_bench.py <bench-json-file>", file=sys.stderr)
        return 2
    line = [ln for ln in src.read_text().splitlines()
            if ln.strip().startswith("{")][-1]
    d = json.loads(line)
    fq = d.get("full_queries")
    if not fq:
        print("bench JSON has no full_queries — run with SPARK_GRAFT_FULL=1",
              file=sys.stderr)
        return 2

    groups: dict[str, list[tuple[str, float]]] = {}
    for name, sec in sorted(fq.items()):
        groups.setdefault(name.split("_", 1)[0], []).append((name, sec))

    out = [
        "# BENCH/FULL_QUERIES.md — per-query wall-time baseline",
        "",
        f"Every `__spark_entry__.queries()` entry timed (min-of-2, noop "
        f"sink) at sf={d.get('sf')} on local[{d.get('cpus')}] — the "
        "regression surface for the whole operator inventory, not only the "
        "bench headliners.  Regenerate with:",
        "",
        "    SPARK_GRAFT_FULL=1 python bench.py > /tmp/full.json",
        "    python tools/report_full_bench.py /tmp/full.json",
        "",
        f"Total: **{d.get('full_total')} s** across {len(fq)} queries "
        f"(slowest: {max(fq, key=fq.get)} at {max(fq.values())} s).",
        "",
        "| query | sec |",
        "|---|---|",
    ]
    for g in sorted(groups):
        for name, sec in sorted(groups[g], key=lambda kv: -kv[1]):
            out.append(f"| {name} | {sec} |")
    (REPO / "BENCH" / "FULL_QUERIES.md").write_text("\n".join(out) + "\n")
    print(f"wrote BENCH/FULL_QUERIES.md ({len(fq)} queries, "
          f"total {d.get('full_total')} s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
