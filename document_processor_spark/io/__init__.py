"""Table IO: Iceberg-semantics layer (snapshots, lineage, resume)."""
