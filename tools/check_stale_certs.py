#!/usr/bin/env python
"""Stale-certification guard: fail loudly when a query's implementing code
is NEWER than its newest driver CORRECTNESS row.

A driver row certifies the tree the driver ran on (the parent of the
"round N: verdict/advice/correctness/bench" commit).  If the function
behind a registry query is later edited but the query sits parked in the
registry tail as "long-stable green", its old row silently certifies code
that no longer exists — exactly the ann_ivf_pq_topk hole the round-4
judge flagged.  This tool makes that hole mechanical:

  for each registry query with >=1 green driver row:
      last_touch  = newest commit touching the implementing function's
                    current line range (git log -L)
      cert_commit = parent of the newest green row's verdict commit
      STALE if last_touch is not an ancestor of cert_commit
              and the query is not inside the current 50-slot driver
              window (window members get a fresh row this round)

Granularity caveat: -L covers the query's own function body.  A helper
refactor outside that range (the original ann_ivf_pq_topk case) surfaces
via the module-level tier instead: any query whose MODULE changed since
its cert round is listed as a WARNING, so a reviewer sees the superset
and the hard failure stays false-positive-free.  Uncommitted worktree
edits to a module are reported as PENDING (they have no driver row by
definition; they must be in the window before round end).

Usage: python tools/check_stale_certs.py   (exit 1 on any hard-stale)
Wired into the audit run next to tools/audit_plans.py.
"""

from __future__ import annotations

import inspect
import json
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

WINDOW = 50  # driver samples the first 50 registry entries


def _git(*args: str) -> str:
    return subprocess.run(["git", *args], cwd=REPO, capture_output=True,
                          text=True, check=False).stdout.strip()


def _green_rounds() -> dict[str, int]:
    """name -> newest round with an all-green driver row."""
    newest: dict[str, int] = {}
    for p in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", p.stem).group(1))
        for name, row in json.loads(p.read_text()).items():
            ok = (row.get("rows_match") and row.get("schema_match")
                  and row.get("hash_match", True) and not row.get("err"))
            if ok:
                newest[name] = max(newest.get(name, 0), rnd)
    return newest


def _cert_commits() -> dict[int, str]:
    """round -> commit the driver certified (parent of the verdict commit)."""
    out = _git("log", "--format=%H %s")
    certs: dict[int, str] = {}
    for line in out.splitlines():
        m = re.match(r"(\w+) round (\d+): verdict/", line)
        if m:
            certs[int(m.group(2))] = _git("rev-parse", m.group(1) + "^")
    return certs


def _is_ancestor(commit: str, ancestor_of: str) -> bool:
    return subprocess.run(
        ["git", "merge-base", "--is-ancestor", commit, ancestor_of],
        cwd=REPO, capture_output=True).returncode == 0


def _last_touch(path: str, start: int, end: int) -> str | None:
    """Newest commit touching path:start-end (committed history only)."""
    out = _git("log", "-1", "--format=%H", "-L", f"{start},{end}:{path}")
    for line in out.splitlines():
        if re.fullmatch(r"[0-9a-f]{40}", line.strip()):
            return line.strip()
    return None


def main() -> int:
    from document_processor_spark.operators.registry import all_queries

    greens = _green_rounds()
    certs = _cert_commits()
    dirty = set(_git("diff", "--name-only", "HEAD").splitlines())

    names = list(all_queries())
    window = set(names[:WINDOW])

    # module-level last-touch cache: path -> newest commit touching the file
    mod_touch: dict[str, str] = {}

    stale, warns, pending = [], [], []
    for name, (fn, _sql) in all_queries().items():
        fn = inspect.unwrap(fn)
        src = Path(inspect.getsourcefile(fn)).resolve()
        rel = str(src.relative_to(REPO))
        rnd = greens.get(name)
        if rnd is None or name in window:
            continue  # rotation's job / fresh row coming this round
        cert = certs.get(rnd)
        if cert is None:
            continue
        lines, start = inspect.getsourcelines(fn)
        touch = _last_touch(rel, start, start + len(lines) - 1)
        if touch and not _is_ancestor(touch, cert):
            stale.append((name, rel, rnd, touch[:9]))
            continue
        if rel not in mod_touch:
            mod_touch[rel] = _git("log", "-1", "--format=%H", "--", rel)
        mtouch = mod_touch[rel]
        if mtouch and not _is_ancestor(mtouch, cert):
            warns.append((name, rel, rnd, mtouch[:9]))
        if rel in dirty:
            pending.append((name, rel))

    for name, rel, rnd, touch in stale:
        print(f"STALE   {name}: {rel} function edited in {touch} after its "
              f"r{rnd:02d} driver row, and it is outside the 50-slot window")
    for name, rel, rnd, touch in warns:
        print(f"WARNING {name}: module {rel} changed ({touch}) since its "
              f"r{rnd:02d} row (function body unchanged — helper-level edit?)")
    for name, rel in sorted(set(pending)):
        print(f"PENDING {name}: {rel} has uncommitted edits")
    n_cov = len([n for n in names if n in greens or n in window])
    print(f"--- {len(stale)} stale / {len(warns)} module-warnings / "
          f"{len(set(pending))} pending; {n_cov}/{len(names)} queries have a "
          f"driver row or sit in the current window")
    return 1 if stale else 0


if __name__ == "__main__":
    raise SystemExit(main())
