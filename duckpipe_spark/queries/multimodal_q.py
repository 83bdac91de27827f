"""Multimodal plumbing queries. Blob length is oracle-checkable; the byte
histogram/entropy and stub decodes are registered rows-only (no SQL
equivalent — the driver records the weaker check, per the contract)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from duckpipe_spark.functions.multimodal import (
    byte_histogram,
    decode_images,
    documents_as_blobs,
    with_blob_metadata,
)
from duckpipe_spark.queries.base import register
from duckpipe_spark.sources.tables import load_table

_BLOB_META_ORACLE = """
SELECT doc_id AS blob_id, octet_length(encode(text)) AS n_bytes
FROM documents
"""


@register("blob_metadata", _BLOB_META_ORACLE, "binary column + typed metadata (multimodal plumbing)")
def blob_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    blobs = documents_as_blobs(load_table(spark, sf_dir, "documents"))
    return with_blob_metadata(blobs).select("blob_id", "n_bytes")


@register("blob_byte_entropy", None, "byte histogram + entropy kernel (rows-only)")
def blob_byte_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    blobs = documents_as_blobs(load_table(spark, sf_dir, "documents"))
    return byte_histogram(blobs).select("blob_id", F.round("entropy", 6).alias("entropy"))


@register("image_decode_stub", None, "stubbed deterministic image decode (rows-only)")
def image_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    blobs = documents_as_blobs(load_table(spark, sf_dir, "documents"))
    return decode_images(blobs, fake_decode=True)
