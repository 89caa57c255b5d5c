"""Multimodal column handling: image/audio/video as opaque binary columns
with typed metadata.

The decode step is STUBBED (no image/audio libs in this container — the
`decode_media` stub raises NotImplementedError unless given the
deterministic fake codec used by the fixtures), but the Spark-side plumbing
is real: binary payload column, Arrow batch transfer, `mapInPandas` with an
explicit output schema, batch-shaped feature extraction.  The metadata
formulas are deterministic, so the whole mapInPandas path has an exact
DuckDB oracle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("doc_id bigint, media_ref string, media_type string, "
                "n_bytes bigint, width bigint, height bigint, "
                "payload_hash string")


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive an opaque-binary media table from the documents corpus:
    (doc_id, payload:binary, media_type, hint) — the input shape of a real
    multimodal pipeline."""
    d = (spark.read.parquet(f"{sf_dir}/documents.parquet")
         .repartition(spark.sparkContext.defaultParallelism))
    return d.select(
        "doc_id",
        F.encode(F.substring("text", 1, 64), "UTF-8").alias("payload"),
        F.when(F.col("n_chars") % 3 == 0, "image/png")
         .when(F.col("n_chars") % 3 == 1, "audio/wav")
         .otherwise("video/mp4").alias("media_type"),
        F.col("n_chars").alias("hint"),
    )


def decode_media(payload: bytes, media_type: str):
    """Decode stub: real decoders (PIL/libav) are not in this container.
    Raises NotImplementedError for real codecs; the deterministic fake
    codec below keeps the pipeline testable end-to-end."""
    raise NotImplementedError(
        f"no decoder for {media_type} in this environment; "
        "use extract_media_features (deterministic metadata path)")


def _feature_batches(it: Iterator["object"]) -> Iterator["object"]:
    """mapInPandas worker: batch-shaped metadata/feature extraction over the
    binary payload column.  Deterministic stand-in for decode+resize+
    feature-extract; the real implementation swaps the body, not the
    plumbing (schema, batching, partitioning stay identical)."""
    import pandas as pd
    for pdf in it:
        hint = pdf["hint"].astype("int64")
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "media_ref": "m-" + pdf["doc_id"].astype(str),
            "media_type": pdf["media_type"],
            "n_bytes": pdf["payload"].map(len).astype("int64"),
            "width": (64 + hint % 640).astype("int64"),
            "height": (64 + (hint * 7) % 480).astype("int64"),
            "payload_hash": pdf["payload"].map(
                lambda b: hashlib.md5(bytes(b)).hexdigest()),
        })


def extract_media_features(media: DataFrame) -> DataFrame:
    return media.mapInPandas(_feature_batches, MEDIA_SCHEMA)


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_media_features(media_table(spark, sf_dir))


SQL_MEDIA_FEATURES = """
SELECT doc_id,
       'm-' || CAST(doc_id AS VARCHAR) AS media_ref,
       CASE WHEN n_chars % 3 = 0 THEN 'image/png'
            WHEN n_chars % 3 = 1 THEN 'audio/wav'
            ELSE 'video/mp4' END AS media_type,
       CAST(octet_length(encode(substr(text, 1, 64))) AS BIGINT) AS n_bytes,
       64 + n_chars % 640 AS width,
       64 + (n_chars * 7) % 480 AS height,
       md5(substr(text, 1, 64)) AS payload_hash
FROM documents
"""


QUERIES = {
    "mm_media_features": (q_media_features, SQL_MEDIA_FEATURES),
}
