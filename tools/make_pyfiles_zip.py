#!/usr/bin/env python
"""Package the engine for spark-submit --py-files.

Usage::

    python tools/make_pyfiles_zip.py [out.zip]
    spark-submit --py-files engine.zip jobs/extract.py ...
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> int:
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "engine.zip"
    pkg = REPO / "document_processor_spark"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted(pkg.rglob("*.py")):
            z.write(p, p.relative_to(REPO))
    print(f"wrote {out} ({out.stat().st_size} bytes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
