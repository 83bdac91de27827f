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


# Real-codec round trip, oracle-checked: each document becomes a genuine PNG
# (greyscale, w = 8 + doc_id%8, h = 8 + doc_id%5, every pixel doc_id%256,
# encoded with the Sub scanline filter) and decode_images runs the vendored
# pure-python PNG decoder — no fake path. The oracle recomputes the
# dimensions and the (constant-image) mean analytically, so the whole
# encode→filter→zlib→unfilter→stats pipeline is hash-verified per row.
_IMAGE_PNG_ORACLE = """
SELECT doc_id AS blob_id,
       CAST(8 + doc_id % 8 AS INT) AS width,
       CAST(8 + doc_id % 5 AS INT) AS height,
       1 AS channels,
       CAST(doc_id % 256 AS DOUBLE) AS mean_pixel
FROM documents
"""


@register("image_decode_png", _IMAGE_PNG_ORACLE, "real PNG decode (vendored codec) round trip")
def image_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from duckpipe_spark.functions.png import encode_png

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for did in pdf["doc_id"]:
                d = int(did)
                img = np.full((8 + d % 5, 8 + d % 8), d % 256, dtype=np.uint8)
                blobs.append(encode_png(img, filter_type=1))
            yield pd.DataFrame({"blob_id": pdf["doc_id"], "blob": blobs})

    blobs = docs.mapInPandas(gen, "blob_id bigint, blob binary")
    return decode_images(blobs)  # real path: no PIL, no fake_decode
