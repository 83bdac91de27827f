"""Streaming corpus ingestion: continuous-crawl incremental dedup.

The batch operator (`functions.dedup.incremental_dedup`) answers "which of
these NEW docs are unseen?" against a static accepted corpus. A real crawl
pipeline runs that question forever: files land continuously, and a doc is
accepted exactly when its normalized content fingerprint has never been
accepted before — first arrival wins, acceptance is never retracted
(append-mode semantics; a pipeline cannot un-ship a doc it already
forwarded to training).

Spark-native shape: ``applyInPandasWithState`` keyed by the fingerprint.
State is ONE long per distinct accepted fingerprint (the accepting id) —
the same 16-byte-fingerprint key the batch exact-dedup shuffle uses, and
nothing else: document bodies are dropped before the shuffle, so 100 TB of
arriving text moves (fp, id) pairs only. On a cluster the state store is
RocksDB-backed and the fingerprint keyspace shards across executors; the
per-key state never grows with duplicate count.

Determinism: within one micro-batch the min id wins (so a batch containing
a duplicate pair resolves identically regardless of partitioning); across
micro-batches arrival order wins — the contract continuous ingestion
actually has. When files arrive in id order the accepted set is
bit-identical to batch ``exact_dedup_groups`` canonical ids (proven in
tests/test_streaming.py, including across a checkpoint crash-resume).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from duckpipe_spark.functions.text import fingerprint_col


def read_document_stream(
    spark: SparkSession,
    path: str,
    schema,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source document stream (the landing-directory pattern: each
    crawl dump is one parquet drop)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def _accept_fn(
    key: tuple[Any, ...], pdf_iter: Iterator[pd.DataFrame], state
) -> Iterator[pd.DataFrame]:
    (fp,) = key
    if state.exists:
        # fingerprint already accepted in an earlier micro-batch: the new
        # arrivals are duplicates; emit nothing, state unchanged
        return
    best = None
    for pdf in pdf_iter:
        for i in pdf["__id"]:
            i = int(i)
            if best is None or i < best:
                best = i
    if best is not None:
        state.update((best,))
        yield pd.DataFrame({"fp": [fp], "doc_id": [best]})


def incremental_dedup_stateful(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """First-arrival-wins exact dedup over an unbounded document stream
    → append-mode (fp, doc_id) rows, one per NEWLY accepted fingerprint.

    State per distinct fingerprint: one long (the accepting id). The only
    exchange is the groupBy on the fingerprint — identical to the batch
    exact-dedup shuffle; bodies never shuffle."""
    src = docs.select(
        fingerprint_col(F.col(text_col)).alias("fp"), F.col(id_col).alias("__id")
    )
    return src.groupBy("fp").applyInPandasWithState(
        _accept_fn,
        outputStructType="fp string, doc_id long",
        stateStructType="first_id long",
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def winnow_probe_static(
    docs: DataFrame,
    index: DataFrame,
    k: int = 3,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Probe (arriving) documents against a STATIC winnowed fingerprint
    index → (``id_col``, index_id, fp) match rows — the incremental-
    decontamination SERVING shape (VERDICT r10 item 7): the benchmark/
    blocklist index is winnowed once as a batch job (``index`` =
    (index_id, fp) rows, e.g. ``winnow_fingerprints(bench).select(
    F.col("id").alias("index_id"), "fp")``), and every newly crawled doc
    is fingerprinted on arrival and joined against it. Winnowing's
    guarantee carries over: an arriving doc sharing any verbatim run of
    ≥ w + k − 1 tokens with an index doc MUST emit at least one match row.

    Streaming-safe by construction: the winnow kernel is doc-local (one
    shuffle-free Arrow projection — pinned by the winnow_s twin in
    tests/test_streaming.py) and the probe is a stateless stream-static
    BROADCAST join, so the composition runs append-mode with no watermark
    or state store; per-doc aggregation/quarantine decisions belong to the
    downstream consumer. On batch inputs the same composition is the
    matching stage of ``winnow_decontaminate`` without the bucket split."""
    from duckpipe_spark.functions.dedup import winnow_fingerprints

    fps = winnow_fingerprints(docs, text_col, id_col, k, w).select("id", "fp")
    return fps.join(F.broadcast(index), "fp").select(
        F.col("id").alias(id_col), "index_id", "fp"
    )


def bm25_serve_stream(
    query_stream: DataFrame,
    index_path: str,
    sink_path: str,
    checkpoint: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
):
    """Serve BM25 retrieval over a STREAM of arriving queries against a
    `text.save_bm25_index` disk artifact — the retrieval serving shape
    (r11): the index is built once as a batch job; query batches arrive as
    (query_id int, terms array<string>) rows and each micro-batch scores
    through the SAME `bm25_topk_from_index` code path the batch twin uses
    (per-query top-k needs an aggregation + rank, which append-mode
    streaming cannot express — so the server is `foreachBatch`, the same
    micro-batch discipline as the CDC apply).

    Idempotence: each batch writes mode("overwrite") into its own
    ``batch_id=<n>`` subdirectory, so foreachBatch's at-least-once
    re-delivery replays in place instead of duplicating rows — read the
    sink with basePath-style recursive glob. Queries are independent rows,
    so batch composition cannot change any query's result (incremental ≡
    batch, pinned by the twin pytest).

    Returns the started StreamingQuery."""

    def _score(batch: DataFrame, batch_id: int) -> None:
        from duckpipe_spark.functions.text import bm25_topk_from_index

        qt = batch.select("query_id", F.explode("terms").alias("term"))
        out = bm25_topk_from_index(
            batch.sparkSession, index_path, qt, k=k, k1=k1, b=b
        )
        out.write.mode("overwrite").parquet(f"{sink_path}/batch_id={batch_id}")

    return (
        query_stream.writeStream.foreachBatch(_score)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def phash_probe_static(
    blobs: DataFrame,
    index: DataFrame,
    fingerprint,
    max_distance: int = 3,
    id_col: str = "blob_id",
) -> DataFrame:
    """Probe (arriving) media blobs against a STATIC perceptual-hash code
    index → (``id_col``, index_id, hamming) match rows — the incremental
    media-dedup SERVING shape (r11), the triad's analogue of
    `winnow_probe_static`: the blocklist/corpus codes are computed once as
    a batch job (``index`` = (index_id, h0, h1) rows from `image_dhash` /
    `audio_fingerprint` / `video_fingerprint`), and every newly crawled
    blob fingerprints on arrival (``fingerprint`` — any of the three
    kernels, all shuffle-free doc-local Arrow projections) and verifies by
    exact xor+popcount against the BROADCAST index.

    Streaming-safe by construction: stateless projections + one
    stream-static broadcast join, so the composition runs append-mode with
    no watermark or state store. The broadcast-index form fits the serving
    case (benchmark/blocklist-sized index); dedup WITHIN an unbounded
    arriving stream is the batch `phash_neardup_pairs`'s banded join over
    micro-batches via foreachBatch instead.

    Modality contract (r12): one call = one ``fingerprint`` kernel = one
    modality — pass a SAME-modality ``index``; matching an image probe
    against audio codes is numerology (see
    `phash_neardup_pairs(partition_col=)`, which enforces this inside the
    mixed-modality batch path)."""
    codes = fingerprint(blobs, id_col=id_col)
    ham = (
        F.bit_count(F.col("h0").bitwiseXOR(F.col("ih0")))
        + F.bit_count(F.col("h1").bitwiseXOR(F.col("ih1")))
    ).cast("bigint")
    idx = index.select(
        "index_id", F.col("h0").alias("ih0"), F.col("h1").alias("ih1")
    )
    return (
        codes.crossJoin(F.broadcast(idx))
        .withColumn("hamming", ham)
        .where(F.col("hamming") <= max_distance)
        .select(F.col("blob_id").alias(id_col), "index_id", "hamming")
    )


def hybrid_serve_stream(
    query_stream: DataFrame,
    index_path: str,
    embeddings: DataFrame,
    sink_path: str,
    checkpoint: str,
    k: int = 10,
    cand_k: int = 20,
    k_rrf: int = 60,
    scale: int = 1_000_000,
    k1: float = 1.2,
    b: float = 0.75,
):
    """Serve HYBRID retrieval over a stream of arriving queries (r14): each
    query row carries BOTH legs — ``terms array<string>`` for the BM25
    index artifact and ``qvec array<float>`` for the embedding corpus —
    and each micro-batch scores through the SAME batch code paths the
    hybrid twin test composes (`bm25_topk_from_index` +
    `brute_force_topk_queries` + `rrf_fuse`), so incremental == batch by
    construction and the twin pytest pins it.

    Same micro-batch discipline as ``bm25_serve_stream``: per-query top-k
    needs aggregation + rank, which append-mode streaming cannot express,
    so the server is ``foreachBatch``; each batch overwrites its own
    ``batch_id=<n>`` subdirectory so at-least-once re-delivery replays in
    place. Queries are independent rows — batch composition cannot change
    any query's result.

    Scale shape: the arriving query batch broadcasts in both legs; the
    embedding corpus and the BM25 postings are the static scan sides; the
    fusion only touches the two pre-bounded top-k lists.

    Returns the started StreamingQuery."""

    def _score(batch: DataFrame, batch_id: int) -> None:
        from duckpipe_spark.functions.similarity import (
            brute_force_topk_queries,
            rrf_fuse,
        )
        from duckpipe_spark.functions.text import bm25_topk_from_index

        qt = batch.select("query_id", F.explode("terms").alias("term"))
        sparse = bm25_topk_from_index(
            batch.sparkSession, index_path, qt, k=cand_k, k1=k1, b=b
        )
        dense = brute_force_topk_queries(
            embeddings, batch, cand_k, query_vec_col="qvec"
        )
        fused = rrf_fuse(
            [
                ("sparse", sparse.select("query_id", "rank", "doc_id")),
                (
                    "dense",
                    dense.select(
                        "query_id", "rank", F.col("neighbor_id").alias("doc_id")
                    ),
                ),
            ],
            k=k,
            k_rrf=k_rrf,
            scale=scale,
        )
        fused.write.mode("overwrite").parquet(f"{sink_path}/batch_id={batch_id}")

    return (
        query_stream.writeStream.foreachBatch(_score)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
