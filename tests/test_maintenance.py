"""IceLite table maintenance: compaction (rewrite_data_files + replace
commit), snapshot expiration, and orphan-file cleanup — the Iceberg
procedures a long-running incremental extraction pipeline depends on."""

import pytest

from document_processor_spark.io.icelite import PART_COL, IceLite, with_part


@pytest.fixture()
def table(spark, tmp_path):
    t = IceLite(tmp_path, "spans")
    for i in range(3):
        df = with_part(
            spark.range(i * 10, i * 10 + 10)
            .selectExpr("cast(id as string) as doc_id", "id as v"), 4)
        t.append(df, run_id=f"r{i}", partitions=[0, 1, 2, 3],
                 metrics={p: {"docs": 10} for p in range(4)})
    return t


def _rows(df):
    return sorted((r["doc_id"], r["v"]) for r in df.collect())


def test_compact_preserves_view_and_reduces_files(spark, table):
    before = _rows(table.read(spark))
    n_files_before = len(list(table.data.rglob("*.parquet")))
    m = table.compact(spark, run_id="compact-1")
    assert m["replaces_through"] == 3
    assert _rows(table.read(spark)) == before
    # compacted view reads ONLY the new snapshot: one file per partition
    live = table._view()
    assert [s["snapshot_id"] for s in live] == [4]
    n_live_files = len(list((table.data / m["data_dir"]).rglob("*.parquet")))
    assert n_live_files == 4 < n_files_before
    # time travel into pre-compaction history still works before expiry
    assert len(_rows(table.read(spark, as_of=2))) == 20
    # resume safety: every committed partition still known
    assert table.committed_partitions() == {0, 1, 2, 3}


def test_append_after_compact(spark, table):
    table.compact(spark, run_id="compact-1")
    df = with_part(
        spark.range(100, 110)
        .selectExpr("cast(id as string) as doc_id", "id as v"), 4)
    table.append(df, run_id="r3", partitions=[0, 1, 2, 3])
    assert len(_rows(table.read(spark))) == 40
    assert [s["snapshot_id"] for s in table._view()] == [4, 5]


def test_expire_snapshots(spark, table):
    before = _rows(table.read(spark))
    table.compact(spark, run_id="compact-1")
    expired = table.expire_snapshots()
    assert expired == [1, 2, 3]
    # current view unaffected; expired data dirs gone, manifests kept
    assert _rows(table.read(spark)) == before
    assert not any((table.data / f"snap-{i:06d}").exists() for i in expired)
    assert len(table.lineage()) >= 12  # history survives in manifests
    with pytest.raises(FileNotFoundError, match="expired"):
        table.read(spark, as_of=2)
    # idempotent
    assert table.expire_snapshots() == []


def test_remove_orphans(spark, table):
    # simulate a crash between data write and manifest commit
    orphan = table.data / "snap-000099"
    (orphan / f"{PART_COL}=0").mkdir(parents=True)
    (orphan / f"{PART_COL}=0" / "x.parquet").write_bytes(b"junk")
    before = _rows(table.read(spark))
    assert table.remove_orphans() == ["snap-000099"]
    assert not orphan.exists()
    assert _rows(table.read(spark)) == before


def test_additive_schema_evolution(spark, table):
    """Iceberg add-column evolution: a new snapshot with an extra column
    reads alongside the old ones (null-filled), historical files are never
    rewritten, and a pre-evolution as_of view keeps its original schema."""
    df = with_part(
        spark.range(100, 110)
        .selectExpr("cast(id as string) as doc_id", "id as v",
                    "concat('en-', id) as lang"), 4)
    table.append(df, run_id="evolved", partitions=[0, 1, 2, 3])

    cur = table.read(spark)
    assert "lang" in cur.columns
    assert cur.count() == 40
    old_rows = cur.filter("v < 100")
    assert old_rows.count() == 30
    assert old_rows.filter("lang IS NOT NULL").count() == 0
    assert cur.filter("v >= 100 AND lang IS NULL").count() == 0

    before = table.read(spark, as_of=3)
    assert "lang" not in before.columns
    assert before.count() == 30
