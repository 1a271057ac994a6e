"""Streaming near-dup screening with a growing LSH signature index.

The production shape of ``dedup.incremental_lsh_matches``: every
arriving micro-batch of documents is (1) signed (MinHash signatures),
(2) screened against everything indexed so far PLUS itself, and (3)
written into the index — so each near-dup pair is emitted exactly
once, when its LATER member arrives. Work per batch is
O(batch + collisions) against the banded index, never a corpus
re-pair; the index table holds K small ints per document.

Replay idempotence (at-least-once sources re-deliver batches): both
the signature index AND the verdict sink are partitioned by
``batch_id`` and written with dynamic partition overwrite — a
re-delivered batch REPLACES its own partitions instead of appending,
and the cross-screen reads the index with ``batch_id < current``
(strictly earlier) so a retry never matches a document against its
own first-attempt signatures, nor against batches that arrived after
its first attempt. This is the same idempotence carve as
``streaming/trend.py``; contrast ``streaming/funnel.py``, whose MIN
state needs none.

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


import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..pipeline.lake import read_parquet_index as _read_parquet_index
from ..pipeline.lake import write_batch_partition as _write_batch_partition
from ..operators.dedup import (
    LSH_BUCKET_CAP,
    _minhash_signatures,
    cross_matches_from_signatures,
    pairs_from_signatures,
)


def screen_and_index_batch(
    batch_docs: DataFrame,
    index_path: str,
    batch_id: int,
    *,
    bucket_cap: int = LSH_BUCKET_CAP,
) -> DataFrame:
    """Screen one batch against the index + itself; write the batch's
    signatures into its index partition. Returns the verdict frame
    ``(doc_id, dup_of, est_jaccard)`` — ``dup_of`` is the previously
    seen (or same-batch, lower-id) near-duplicate."""
    spark = batch_docs.sparkSession
    sig_b = _minhash_signatures(batch_docs).localCheckpoint(eager=True)

    within = pairs_from_signatures(sig_b, bucket_cap=bucket_cap).select(
        F.col("doc_b").alias("doc_id"),
        F.col("doc_a").alias("dup_of"),
        "est_jaccard",
    )
    idx_df = _read_parquet_index(spark, index_path)
    if idx_df is not None:
        # STRICTLY-EARLIER partitions only: a replay must neither
        # self-match its first-attempt signatures nor see batches that
        # arrived after its first attempt — the latter would emit
        # (this-batch, later-batch) pairs the later batch already
        # emitted, changing this partition's contents (review pass 4;
        # on the live path current == max id, so < and != agree)
        sig_i = idx_df.where(
            F.col("batch_id") < int(batch_id)
        ).drop("batch_id")
        # a re-ingested doc_id meets its own earlier signature in the
        # index — that is id-level re-arrival (the exact-dedup tier's
        # concern), not a near-dup verdict; drop the identity pairs
        cross = cross_matches_from_signatures(
            sig_b, sig_i, bucket_cap=bucket_cap
        ).where(F.col("doc_id") != F.col("dup_of"))
        verdicts = within.unionByName(cross)
    else:
        verdicts = within
    # materialize BEFORE the index write so the verdict join cannot
    # observe the batch's own signatures on the index side
    verdicts = verdicts.localCheckpoint(eager=True)
    _write_batch_partition(sig_b, index_path, batch_id)
    return verdicts


def stream_dedup_index(
    docs_stream: DataFrame,
    index_path: str,
    verdicts_path: str,
    checkpoint: str,
    *,
    bucket_cap: int = LSH_BUCKET_CAP,
):
    """Start the ingest screen: per micro-batch verdicts land in their
    ``batch_id`` partition of ``verdicts_path``; the signature index
    grows at ``index_path``. Both writes are replayable."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        verdicts = screen_and_index_batch(
            batch, index_path, batch_id, bucket_cap=bucket_cap
        )
        # a duplicate-free batch emits no verdicts; the empty-frame
        # guard inside _write_batch_partition skips the write
        _write_batch_partition(verdicts, verdicts_path, batch_id)

    return (
        docs_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
