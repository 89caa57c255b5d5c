"""document_processor_spark — a from-scratch PySpark-native main-content
extraction engine with the extraction semantics of the reference service
``joanfabregat/document-processor`` (read-only snapshot at /root/reference).

This is NOT a port: the reference's per-request FastAPI/Docling service loop
(app/api.py:66-139) is replaced by a partition-parallel Spark batch dataflow
over an Iceberg-style table of interleaved text+media documents
(doc_id:string, spans:array<struct<kind,text,media_ref,offset>>).

Layout
------
contract.py    the canonical extraction semantics (T1-T7 of SURVEY.md §2.3)
               shared by the pure-Python oracle and both Spark engines
fixtures.py    deterministic synthetic corpus generator (seed=42, FIXTURES.md)
oracle.py      pure-Python reference implementation (the correctness anchor)
pipeline.py    the end-to-end Spark extraction pipeline (2 engines: native
               Catalyst expressions, and Arrow/pandas mapInArrow)
functions/     column-level building blocks (cleaning, classify, html, ...)
operators/     dataflow + training-data operators (dedup, ann, text analysis)
io/            Iceberg-semantics table layer (snapshots, lineage, resume)
session.py     SparkSession factory tuned for the workload
"""

__version__ = "0.1.0"
