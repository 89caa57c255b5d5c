"""Every driver-contract query must run under spark.sql.ansi.enabled=true.

build_spark deliberately disables ANSI mode (fault tolerance for malformed
payloads), but the DRIVER evaluates `__spark_entry__.queries()` in its own
session, which may have ANSI on — any unguarded cast, division, or
unbase64 that silently nulled under non-ANSI becomes a hard job failure
there.  This sweep forces full evaluation (noop sink) of every query and
the flagship entry under ANSI semantics."""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.timeout(900)
def test_all_queries_and_entry_run_under_ansi(spark):
    import __spark_entry__ as entry

    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        assert entry.entry(spark).count() >= 0
        for name, q in sorted(entry.queries().items()):
            try:
                q(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            except Exception as e:  # pragma: no cover - failure reporting
                raise AssertionError(f"{name} failed under ANSI: {e}") from e
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "false")
