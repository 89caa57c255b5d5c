"""`dps_synth` — a custom Python DataSource (the Spark 4 DataSource API)
that generates the deterministic fixture corpus PARTITION-PARALLEL on the
executors.

`fixtures.corpus_df` materializes every row on the driver and ships them
out — fine at fixture scale, a non-starter for a 10^12-doc synthetic load
test (the driver would build the whole corpus).  This source moves the
generation to where the data should be born: `gen_doc(i, n_docs, seed)` is
a pure function, so `partitions()` plans contiguous doc-id ranges and each
executor generates ONLY its slice — zero driver memory, zero shuffle,
scales with the cluster exactly like a parquet scan.  Edge docs (and the
50k-span skew doc when requested) ride in the LAST slice so every
partition's content is a function of the plan alone.

Usage::

    from document_processor_spark.sources import register_synth_source
    register_synth_source(spark)
    df = (spark.read.format("dps_synth")
          .option("sf", "0.001").option("numPartitions", "8").load())

Reference parity: the reference service has no bulk source at all (one
document per HTTP request, app/api.py) — this is the engine-side load
path a Spark user gets instead.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ..fixtures import INPUT_DDL, _edge_docs, _skew_doc, gen_doc

import random


class _Slice(InputPartition):
    def __init__(self, start: int, end: int, n_docs: int, seed: int,
                 with_extras: bool, include_skew: bool):
        self.start = start
        self.end = end
        self.n_docs = n_docs
        self.seed = seed
        self.with_extras = with_extras
        self.include_skew = include_skew


class SynthCorpusReader(DataSourceReader):
    def __init__(self, options: dict):
        self.sf = float(options.get("sf", "0.001"))
        self.n_parts = max(1, int(options.get("numPartitions", "8")))
        self.seed = int(options.get("seed", "42"))
        self.include_skew = (str(options.get("includeSkew", "false"))
                             .lower() == "true")

    def partitions(self):
        n_docs = max(1, round(10_000 * self.sf))
        n_parts = min(self.n_parts, n_docs)
        step = -(-n_docs // n_parts)  # ceil
        out = []
        for k in range(n_parts):
            start, end = k * step, min((k + 1) * step, n_docs)
            if start >= end:
                continue
            out.append(_Slice(start, end, n_docs, self.seed,
                              with_extras=False,
                              include_skew=self.include_skew))
        # extras ride the last NON-EMPTY slice: ceil-division can leave
        # trailing slices empty (10 docs / 8 parts -> 5 slices), and an
        # index-based flag on a skipped slice would silently drop them
        out[-1].with_extras = True
        return out

    def read(self, part: _Slice):
        def row(d: dict):
            return (d["doc_id"],
                    [(s["kind"], s["text"], s["media_ref"], s["offset"])
                     for s in d["spans"]])

        for i in range(part.start, part.end):
            yield row(gen_doc(i, part.n_docs, part.seed))
        if part.with_extras:
            for d in _edge_docs(part.seed):
                yield row(d)
            if part.include_skew:
                sk = _skew_doc(part.seed)
                random.Random(f"{part.seed}:skewshuffle").shuffle(sk["spans"])
                yield row(sk)


class SynthCorpusDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "dps_synth"

    def schema(self) -> str:
        return INPUT_DDL

    def reader(self, schema) -> SynthCorpusReader:
        return SynthCorpusReader(self.options)


def register_synth_source(spark) -> None:
    spark.dataSource.register(SynthCorpusDataSource)
