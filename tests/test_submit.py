"""spark-submit launch path (north rule: `spark-submit --py-files` on a
multi-executor cluster): run jobs/extract.py via real spark-submit on
local-cluster (2 separate executor JVMs), then verify the written warehouse
matches the pure-Python oracle span-for-span."""

import os
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not Path(SPARK_SUBMIT).exists(),
                    reason="spark-submit not on this host")
def test_spark_submit_multi_executor_parity(spark, tmp_path):
    from document_processor_spark import fixtures, oracle
    from document_processor_spark.io.icelite import IceLite
    from document_processor_spark.session import _engine_zip

    wh = tmp_path / "wh"
    proc = subprocess.run(
        [SPARK_SUBMIT, "--py-files", _engine_zip(),
         str(REPO / "jobs" / "extract.py"),
         "--fixture-sf", "0.001", "--warehouse", str(wh),
         "--run-id", "submit-test", "--n-parts", "8",
         "--executors", "2", "--exec-cores", "2"],
        cwd=REPO, capture_output=True, text=True, timeout=600,
        env={**os.environ, "PYTHONPATH": str(REPO)})
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert '"partitions_done": 8' in proc.stdout

    golden, _ = oracle.extract_corpus(fixtures.generate_corpus(0.001))
    table = os.listdir(wh)[0]
    out = IceLite(wh, table).read_spans(spark).collect()
    got = {r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"])
                         for s in r["spans"]] for r in out}
    assert got == golden
    # quarantine rows (skip_reason set) stay queryable in the raw table
    raw = IceLite(wh, table).read(spark)
    assert raw.count() > len(golden)
