#!/usr/bin/env python
"""Local mirror of the driver's correctness gate: run each __spark_entry__
queries()[name] on Spark and oracle_sql()[name] on DuckDB over the same
parquet tables, compare row count, column names, and order-insensitive
values.

Usage: python tools/check_correctness.py [--sf-dir /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, bool):
        return str(bool(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(normalize(x) for x in v) + "]"
    return str(v)


def row_key(row, cols):
    return tuple(normalize(row[c]) for c in cols)


def _canon_type(t: str) -> str:
    """Canonical type tag shared by Spark DDL names and Arrow type names —
    the typed layer of the driver's value hash.  An un-cast DuckDB sum()
    returns HUGEINT (arrow decimal128(38,0)) which stringifies like a
    BIGINT but hashes differently: exactly the class of bug the r1 string-
    only comparison missed."""
    t = t.lower().strip()
    alias = {
        "utf8": "string", "large_string": "string", "large_utf8": "string",
        "bool": "boolean", "int64": "bigint", "long": "bigint",
        "int32": "int", "int16": "smallint", "int8": "tinyint",
        "float64": "double", "float32": "float", "float": "float",
        "halffloat": "float16", "binary": "binary", "large_binary": "binary",
        "date32[day]": "date", "timestamp[us]": "timestamp",
        "timestamp[ns]": "timestamp", "timestamp[us, tz=utc]": "timestamp",
    }
    if t in alias:
        return alias[t]
    t = t.replace("decimal128", "decimal").replace("decimal64", "decimal")
    for pre_arrow, pre_ddl in (("list<item: ", "array<"), ("list<", "array<")):
        if t.startswith(pre_arrow) and t.endswith(">"):
            return f"array<{_canon_type(t[len(pre_arrow):-1])}>"
    if t.startswith("array<") and t.endswith(">"):
        return f"array<{_canon_type(t[6:-1])}>"
    return t


def typed_cols(spark_df, duck_rel):
    """(col -> canonical type) maps for both engines; DuckDB side goes
    through Arrow so HUGEINT/DECIMAL widths surface."""
    s = {f.name: _canon_type(f.dataType.simpleString()) for f in spark_df.schema.fields}
    arr = duck_rel.fetch_arrow_table().schema
    d = {f.name: _canon_type(str(f.type)) for f in arr}
    return s, d


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entrymod
    from document_processor_spark.session import build_spark

    spark = build_spark(app="check-correctness", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{args.sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names or list(qs)
    failures = 0
    for name in names:
        fn = qs[name]
        try:
            sdf = fn(spark, args.sf_dir)
            srows = sdf.collect()
            scols = sorted(sdf.columns)
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e).splitlines()[0][:200]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"WEAK {name}: rows-only check, {len(srows)} rows")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = sorted(rel.columns)
            drows = rel.fetchall()
            dcolidx = {c: i for i, c in enumerate(rel.columns)}
            stypes, dtypes = typed_cols(sdf, rel)
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e).splitlines()[0][:200]}")
            failures += 1
            continue
        ok = True
        if scols != dcols:
            print(f"FAIL {name}: columns spark={scols} duckdb={dcols}")
            ok = False
        elif stypes != dtypes:
            bad = {c: (stypes.get(c), dtypes.get(c)) for c in stypes
                   if stypes.get(c) != dtypes.get(c)}
            print(f"FAIL {name}: column types differ (spark, duckdb): {bad}")
            ok = False
        elif len(srows) != len(drows):
            print(f"FAIL {name}: rows spark={len(srows)} duckdb={len(drows)}")
            ok = False
        else:
            skeys = sorted(row_key(r, scols) for r in srows)
            dkeys = sorted(tuple(normalize(r[dcolidx[c]]) for c in dcols)
                           for r in drows)
            if skeys != dkeys:
                ok = False
                diff = [(a, b) for a, b in zip(skeys, dkeys) if a != b][:3]
                print(f"FAIL {name}: value mismatch; first diffs:")
                for a, b in diff:
                    print(f"   spark : {a}")
                    print(f"   duckdb: {b}")
        if ok:
            print(f"OK   {name}: {len(srows)} rows, {len(scols)} cols")
        else:
            failures += 1
    print(f"--- {len(names) - failures}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
