#!/usr/bin/env python
"""Render BENCH/FULL_QUERIES.md from a `SPARK_GRAFT_FULL=1 python bench.py`
JSON line: the per-query wall-time baseline for ALL driver queries, so a
regression in any operator (not only the 7 headliners) surfaces as a diff
against a committed number.

Usage: SPARK_GRAFT_FULL=1 python bench.py > /tmp/full.json
       python tools/report_full_bench.py /tmp/full.json [more.json ...]

Multiple JSON files merge element-wise by MIN: the per-query number is
then the best observed steady state over all sweeps — the same estimator
min-of-2 applies within one sweep, extended across sweeps.  On this
host's 2-14x run-to-run spread a single sweep misattributes co-tenant
noise to individual queries; the merged min converges to the real cost.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> int:
    argv = sys.argv[1:]
    note = ""
    if "--note" in argv:
        i = argv.index("--note")
        if i + 1 >= len(argv):
            print("usage: report_full_bench.py [--note TEXT] "
                  "<bench-json-file> [more ...]", file=sys.stderr)
            return 2
        note = argv[i + 1]
        del argv[i:i + 2]
    srcs = [Path(p) for p in argv]
    if not srcs or not all(p.exists() for p in srcs):
        print("usage: report_full_bench.py [--note TEXT] "
              "<bench-json-file> [more ...]", file=sys.stderr)
        return 2
    fq: dict[str, float] = {}
    d = {}
    seen: dict[Path, set[str]] = {}
    meta: dict[Path, tuple] = {}
    for src in srcs:
        line = [ln for ln in src.read_text().splitlines()
                if ln.strip().startswith("{")][-1]
        d = json.loads(line)
        part = d.get("full_queries")
        if not part:
            print(f"{src}: no full_queries — run with SPARK_GRAFT_FULL=1",
                  file=sys.stderr)
            return 2
        meta[src] = (d.get("sf"), d.get("cpus"))
        seen[src] = set(part)
        for name, sec in part.items():
            fq[name] = min(fq.get(name, sec), sec)
    # merged sweeps must measure the same thing: identical sf/cpus, and
    # every query present in every sweep — otherwise a stale sweep from an
    # older commit silently mixes scales or hides a missing baseline row
    if len(set(meta.values())) > 1:
        print(f"refusing to merge sweeps with differing sf/cpus: "
              f"{ {str(k): v for k, v in meta.items()} }", file=sys.stderr)
        return 2
    for src, names in seen.items():
        missing = set(fq) - names
        if missing:
            print(f"WARNING: {src} is missing {sorted(missing)} — its sweep "
                  "predates those queries; rerun it or drop it from the "
                  "merge so every query has a fresh number", file=sys.stderr)
    # ... and the merge must cover the LIVE query registry: a query added
    # after the sweeps ran would otherwise ship with no committed number
    sys.path.insert(0, str(REPO))
    import __spark_entry__ as entry
    unbenched = sorted(set(entry.queries()) - set(fq))
    if unbenched:
        print(f"ERROR: registry queries with no benched number: {unbenched} "
              "— rerun SPARK_GRAFT_FULL=1 python bench.py on the current "
              "code", file=sys.stderr)
        return 2
    stale = sorted(set(fq) - set(entry.queries()))
    if stale:
        print(f"WARNING: dropping queries no longer in the registry: "
              f"{stale}", file=sys.stderr)
        for name in stale:
            del fq[name]
    d["full_queries"] = fq
    d["full_total"] = round(sum(fq.values()), 3)

    groups: dict[str, list[tuple[str, float]]] = {}
    for name, sec in sorted(fq.items()):
        groups.setdefault(name.split("_", 1)[0], []).append((name, sec))

    out = [
        "# BENCH/FULL_QUERIES.md — per-query wall-time baseline",
        "",
        f"Every `__spark_entry__.queries()` entry timed (min-of-2 per "
        f"sweep, noop sink; element-wise min over {len(srcs)} full "
        f"sweep(s)) at sf={d.get('sf')} on local[{d.get('cpus')}] — the "
        "regression surface for the whole operator inventory, not only the "
        "bench headliners.  Regenerate with:",
        "",
        "    SPARK_GRAFT_FULL=1 python bench.py > /tmp/full.json",
        "    python tools/report_full_bench.py /tmp/full.json [more.json ...]",
        "",
        f"Total: **{d.get('full_total')} s** across {len(fq)} queries "
        f"(slowest: {max(fq, key=fq.get)} at {max(fq.values())} s).",
        "",
        *([note, ""] if note else []),
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
