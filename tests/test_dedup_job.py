"""Cluster-resolution job: labels snapshot + CC telemetry in the manifest
(the no-silent-truncation rule made auditable), run_id idempotency, and
propagate/star parity through the job surface."""

from __future__ import annotations

import json

import pytest

from document_processor_spark.dedup_job import (
    CLUSTERS_TABLE,
    read_clusters,
    run_cluster_job,
)
from document_processor_spark.io.icelite import IceLite


def _fixture(spark):
    docs = spark.createDataFrame([(x,) for x in "abcdefg"], "doc_id string")
    pairs = spark.createDataFrame([("a", "b"), ("b", "c"), ("e", "f")],
                                  "d1 string, d2 string")
    return docs, pairs


EXPECT = {
    "a": ("a", 3), "b": ("a", 3), "c": ("a", 3),
    "d": ("d", 1),
    "e": ("e", 2), "f": ("e", 2),
    "g": ("g", 1),
}


@pytest.mark.parametrize("algo", ["propagate", "star"])
def test_job_commits_labels_and_cc_metrics(spark, tmp_path, algo):
    wh = str(tmp_path / "wh")
    docs, pairs = _fixture(spark)
    s = run_cluster_job(spark, docs, pairs, wh, "r1", algo=algo, n_parts=4)
    assert not s.skipped
    got = {r["doc_id"]: (r["cluster_id"], r["n_members"])
           for r in read_clusters(spark, wh).collect()}
    assert got == EXPECT
    # telemetry lives in the COMMITTED manifest, not just the summary
    manifest = IceLite(wh, CLUSTERS_TABLE).snapshots()[-1]
    cc = manifest["cc"]
    assert cc["algo"] == algo
    assert cc["converged"] is True
    assert cc["changed_per_round"][-1] == 0
    assert cc["n_rounds"] == len(cc["changed_per_round"])
    assert cc["n_clusters"] == 4
    assert cc["max_cluster_size"] == 3
    assert cc["docs_in_dup_clusters"] == 5
    # manifest must be JSON on disk (driver-readable lineage, not pickle)
    assert json.dumps(manifest)


def test_job_records_truncation_honestly(spark, tmp_path):
    """A capped, non-converged run must be visible in the manifest."""
    wh = str(tmp_path / "wh")
    nodes = [f"n{i:02d}" for i in range(12)]
    docs = spark.createDataFrame([(x,) for x in nodes], "doc_id string")
    pairs = spark.createDataFrame(list(zip(nodes, nodes[1:])),
                                  "d1 string, d2 string")
    s = run_cluster_job(spark, docs, pairs, wh, "r1", max_iters=3)
    cc = IceLite(wh, CLUSTERS_TABLE).snapshots()[-1]["cc"]
    assert cc["converged"] is False
    assert cc["n_rounds"] == 3
    assert s.cc["converged"] is False


def test_job_is_idempotent_on_run_id(spark, tmp_path):
    wh = str(tmp_path / "wh")
    docs, pairs = _fixture(spark)
    s1 = run_cluster_job(spark, docs, pairs, wh, "r1", n_parts=4)
    s2 = run_cluster_job(spark, docs, pairs, wh, "r1", n_parts=4)
    assert s2.skipped and s2.snapshot_id == s1.snapshot_id
    assert len(IceLite(wh, CLUSTERS_TABLE).snapshots()) == 1
    # the replayed summary still carries the committed telemetry
    assert s2.cc["converged"] is True
