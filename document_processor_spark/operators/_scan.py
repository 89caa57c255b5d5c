"""Scale-adaptive post-scan fan-out (optimization round 6).

Every operator's table helper used to append an unconditional
``.repartition(defaultParallelism)`` after the parquet scan.  That is the
right move for the sandbox fixtures — each table is ONE single-row-group
file, so the scan is one task and the round-robin repartition is the only
way the downstream CPU work parallelizes — but at production scale it is
exactly the anti-pattern the optimization guide warns about (§2.4, §6): a
table that already scans as hundreds of splits would pay a full shuffle of
every byte for nothing.

``fan_out`` keeps the local behaviour and removes the scale hazard by
deciding from input size: the scan's own task count is estimated as
``file_bytes / spark.sql.files.maxPartitionBytes`` (the same arithmetic
FilePartition uses, minus the 4 MB open-cost packing term — an
underestimate only for many-small-file layouts, which err on the safe
side here: an underestimate can only keep the repartition).  When the
scan already yields at least one task per core, the data is parallel
enough and no shuffle is added.

File sizes and the parsed maxPartitionBytes are cached per path/session —
the decision costs microseconds of driver time, not a py4j round trip per
query build.
"""

from __future__ import annotations

import os
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame

_SIZE_CACHE: dict[str, int] = {}
_MPB_CACHE: dict[int, int] = {}

_UNITS = {"b": 1, "k": 1 << 10, "kb": 1 << 10, "m": 1 << 20, "mb": 1 << 20,
          "g": 1 << 30, "gb": 1 << 30, "t": 1 << 40, "tb": 1 << 40}


def _parse_bytes(v: str) -> int:
    s = str(v).strip().lower()
    for suffix in sorted(_UNITS, key=len, reverse=True):
        if s.endswith(suffix):
            return int(float(s[: -len(suffix)]) * _UNITS[suffix])
    return int(float(s))


def _path_bytes(path: str) -> int:
    got = _SIZE_CACHE.get(path)
    if got is None:
        try:
            if os.path.isdir(path):
                got = sum(e.stat().st_size for e in os.scandir(path)
                          if e.is_file())
            else:
                got = os.path.getsize(path)
        except OSError:
            got = 0
        _SIZE_CACHE[path] = got
    return got


def _max_partition_bytes(spark) -> int:
    key = id(spark)
    got = _MPB_CACHE.get(key)
    if got is None:
        got = _parse_bytes(spark.conf.get(
            "spark.sql.files.maxPartitionBytes", str(128 << 20)))
        _MPB_CACHE[key] = got
    return got


def fan_out(df: DataFrame, path: str) -> DataFrame:
    """Round-robin fan-out after a parquet scan of `path`, skipped when the
    scan itself already produces >= one split per core."""
    spark = df.sparkSession
    cores = spark.sparkContext.defaultParallelism
    est_tasks = -(-_path_bytes(path) // _max_partition_bytes(spark))
    if est_tasks >= cores:
        return df
    return df.repartition(cores)


def scratch_dir(prefix: str) -> Path:
    """Per-run scratch (stream checkpoints, staging, interchange round
    trips) on the same fast local storage the session already uses for
    shuffle (spark.local.dir = /dev/shm on this sandbox — see
    session.build_spark): every stateful micro-batch commits one
    state-store delta per partition into the checkpoint, and on the
    virtio-disk-backed /tmp that metadata churn — not the computation —
    dominated the streaming harness fixed cost (r6 measurement,
    OPTIMIZATION_r06.md).  A real cluster points checkpoints at durable
    storage; these are per-run throwaways, the same trade
    spark.local.dir already makes."""
    root = os.environ.get("SPARK_GRAFT_STREAM_SCRATCH",
                          os.environ.get("SPARK_LOCAL_DIRS",
                                         "/dev/shm/spark-local"))
    base = Path(root)
    try:
        base.mkdir(parents=True, exist_ok=True)
    except OSError:
        return Path(tempfile.mkdtemp(prefix=prefix))
    return Path(tempfile.mkdtemp(prefix=prefix, dir=str(base)))
