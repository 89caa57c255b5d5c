"""SparkSession factory tuned for the extraction workload.

Local-mode knobs mirror what a 1000-executor cluster run would set via
spark-submit: AQE on (skewed fallback partitions re-balance at runtime,
SURVEY.md §4.2), Arrow transfer on (the parse UDF is Arrow-batched),
shuffle partitions sized to cores.  ANSI mode is disabled deliberately:
the reference never fails a whole request for one bad page
(content_extractor.py:85-99) and the engine must keep that tolerance —
malformed payloads yield null, not job-killing exceptions.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_spark(app: str = "document-processor-spark",
                cores: int | None = None,
                shuffle_partitions: int | None = None,
                extra_conf: dict | None = None) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
