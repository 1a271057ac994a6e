"""Streaming near-dup screening with a growing LSH signature index.

The production shape of ``dedup.incremental_lsh_matches``: every
arriving micro-batch of documents is (1) signed (MinHash signatures),
(2) screened against everything indexed so far PLUS itself, and (3)
appended to the index — so each near-dup pair is emitted exactly once,
when its LATER member arrives. Work per batch is O(batch + collisions)
against the banded index, never a corpus re-pair; the index table
holds K small ints per document and appends immutably (no
read-modify-write races — parquet append only).

Exactness contract (pinned in tests/test_streaming_dedup_index.py):
replaying a corpus through the stream in ANY batch partitioning yields
verdicts whose (least, greatest) pair set EQUALS the batch
``dedup_minhash_lsh`` pair set, PROVIDED no LSH bucket exceeds the
hot-bucket cap (true at test scale). Where a bucket crosses the cap
mid-stream the two formulations legitimately diverge: the batch run
drops the whole bucket, while the stream has already flagged the
bucket's early arrivals — the correct ingest-time behavior (early
duplicates of later-hot boilerplate were real duplicates when seen).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.dedup import (
    LSH_BUCKET_CAP,
    _minhash_signatures,
    cross_matches_from_signatures,
    pairs_from_signatures,
)


def screen_and_index_batch(
    batch_docs: DataFrame,
    index_path: str,
    *,
    bucket_cap: int = LSH_BUCKET_CAP,
) -> DataFrame:
    """Screen one batch against the index + itself; append the batch's
    signatures to the index. Returns the verdict frame
    ``(doc_id, dup_of, est_jaccard)`` — ``dup_of`` is the previously
    seen (or same-batch, lower-id) near-duplicate."""
    spark = batch_docs.sparkSession
    sig_b = _minhash_signatures(batch_docs).localCheckpoint(eager=True)

    within = pairs_from_signatures(sig_b, bucket_cap=bucket_cap).select(
        F.col("doc_b").alias("doc_id"),
        F.col("doc_a").alias("dup_of"),
        "est_jaccard",
    )
    if os.path.exists(index_path):
        sig_i = spark.read.parquet(index_path)
        cross = cross_matches_from_signatures(
            sig_b, sig_i, bucket_cap=bucket_cap
        )
        verdicts = within.unionByName(cross)
    else:
        verdicts = within
    # materialize BEFORE the index append so the verdict join cannot
    # observe the batch's own signatures on the index side
    verdicts = verdicts.localCheckpoint(eager=True)
    sig_b.write.mode("append").parquet(index_path)
    return verdicts


def stream_dedup_index(
    docs_stream: DataFrame,
    index_path: str,
    verdicts_path: str,
    checkpoint: str,
    *,
    bucket_cap: int = LSH_BUCKET_CAP,
):
    """Start the ingest screen: per micro-batch verdicts append to
    ``verdicts_path``; the signature index grows at ``index_path``."""

    def handle(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        screen_and_index_batch(
            batch, index_path, bucket_cap=bucket_cap
        ).write.mode("append").parquet(verdicts_path)

    return (
        docs_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
