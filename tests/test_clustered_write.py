"""Write-side clustering (IceLite append cluster_by): every committed
parquet file must be internally sorted on the cluster key so row-group
min/max stats are tight and non-overlapping — the property parquet
readers prune on."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from document_processor_spark import fixtures
from document_processor_spark.job import run_extraction_job


def _rowgroup_ranges(path: str, col: str):
    f = pq.ParquetFile(path)
    idx = f.schema_arrow.get_field_index(col)
    out = []
    for g in range(f.metadata.num_row_groups):
        st = f.metadata.row_group(g).column(idx).statistics
        out.append((st.min, st.max))
    return out


def test_extraction_snapshot_files_are_doc_id_clustered(spark, tmp_path):
    wh = str(tmp_path / "wh")
    docs = fixtures.corpus_df(spark, 0.001, include_skew=False,
                              n_partitions=8)
    run_extraction_job(spark, docs, wh, "clu", n_parts=4)
    files = glob.glob(f"{wh}/spans/data/snap-*/part=*/*.parquet")
    assert files
    checked = 0
    for path in files:
        ranges = _rowgroup_ranges(path, "doc_id")
        if not ranges:
            continue
        # non-overlapping and ordered across row groups, sorted within
        for (lo, hi) in ranges:
            assert lo <= hi
        for (_, hi), (lo2, _) in zip(ranges, ranges[1:]):
            assert hi <= lo2
        # spot-check: rows inside the file really are sorted
        col = pq.read_table(path, columns=["doc_id"])["doc_id"].to_pylist()
        assert col == sorted(col)
        checked += 1
    assert checked > 0
