"""Streaming conversion funnel: mergeable per-user stage state.

The batch funnel (``warehouse.events_funnel_steps``) reduces to three
conditional ``MIN(unix_micros)`` columns per user — and MIN is
associative/commutative, so the streaming form is a keyed state table
merged per micro-batch: each batch contributes its own per-user
conditional mins, the state upsert keeps the elementwise least, and
the funnel report recomputes from state at any time. Replayed batches
re-apply the same mins → idempotent under at-least-once delivery, the
same effectively-once argument as ``medallion.write_stream_merge_to_lake``.

At scale the state table is one row per user (three longs) — the
smallest sufficient statistic for the report — merged by a keyed join
against batch-grain aggregates, never against raw events.

Batch-vs-stream parity is pinned row-for-row in
tests/test_streaming_funnel.py.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def batch_user_mins(events: DataFrame) -> DataFrame:
    """Per-user conditional first-occurrence micros for one batch."""
    mic = F.expr("unix_micros(ts)")

    def first(evt: str, name: str):
        return F.min(F.when(F.col("event_type") == evt, mic)).alias(name)

    return events.groupBy("user_id").agg(
        first("view", "mv"), first("click", "mc"), first("purchase", "mp")
    )


def merge_state(state_path: str, batch_mins: DataFrame) -> None:
    """Elementwise-least merge of batch mins into the state table.

    Staged write + ``lake._atomic_swap`` (rename with rollback) so a
    concurrent reader sees either the old or the new state, never a
    partial write. A crash BETWEEN the swap's two renames leaves the
    previous state parked at ``._pre_swap``; the recovery branch here
    restores it on the next merge, and because the MIN-merge is
    idempotent the re-delivered batch then reconverges — no silent
    state loss."""
    from ..pipeline.lake import _atomic_swap, _recover_pre_swap

    spark = batch_mins.sparkSession
    # lake._recover_pre_swap owns the crash-window protocol (restore a
    # parked state with no live table, clear a stale park next to a
    # live one) — this function carried its own inline copy, which a
    # future fix to the swap protocol would silently miss (r08 review)
    _recover_pre_swap(state_path)
    if os.path.exists(state_path):
        prev = spark.read.parquet(state_path)
        merged = (
            prev.select("user_id", "mv", "mc", "mp")
            .unionByName(batch_mins)
            .groupBy("user_id")
            .agg(
                F.min("mv").alias("mv"),
                F.min("mc").alias("mc"),
                F.min("mp").alias("mp"),
            )
        )
        staged = state_path.rstrip("/") + "._merging"
        merged.write.mode("overwrite").parquet(staged)
        _atomic_swap(state_path, staged)
    else:
        # stage + rename even for the FIRST write: a crash mid-write
        # must not leave a half-written dir that the merge branch
        # would then fail to read on every retry
        staged = state_path.rstrip("/") + "._merging"
        batch_mins.write.mode("overwrite").parquet(staged)
        os.rename(staged, state_path)


def stream_funnel_state(
    events_stream: DataFrame, state_path: str, checkpoint: str
):
    """Start the stateful funnel: each arriving micro-batch folds its
    per-user mins into ``state_path``."""

    def handle(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        merge_state(state_path, batch_user_mins(batch))

    return (
        events_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def funnel_report(spark: SparkSession, state_path: str) -> DataFrame:
    """The 3-row funnel report from the state table — same schema and
    semantics as the batch ``events_funnel_steps``. Cold start (no
    non-empty batch processed yet) reports zero users, exactly as the
    batch query does on an empty events table."""
    # lake.read_table centralizes the parked-copy fallback this block
    # pioneered (r06 here, generalized r07): a mid-swap state_path is
    # served from ._pre_swap — the last COMMITTED state — instead of a
    # silent cold-start all-zero report; only a genuinely-absent state
    # (no live dir, no park) cold-starts.
    from ..pipeline.lake import read_table

    pre = state_path.rstrip("/") + "._pre_swap"
    if os.path.exists(state_path) or os.path.exists(pre):
        state = read_table(spark, state_path)
    else:
        state = spark.createDataFrame(
            [], "user_id bigint, mv bigint, mc bigint, mp bigint"
        )
    tot = state.agg(
        F.count_if(F.col("mv").isNotNull()).alias("n1"),
        F.count_if(
            F.col("mv").isNotNull() & (F.col("mc") > F.col("mv"))
        ).alias("n2"),
        F.count_if(
            F.col("mv").isNotNull()
            & (F.col("mc") > F.col("mv"))
            & (F.col("mp") > F.col("mc"))
        ).alias("n3"),
    )
    return tot.selectExpr(
        "stack(3, "
        "'view', n1, CAST(1000 AS BIGINT), "
        "'view_click', n2, (n2 * 1000L) div NULLIF(n1, 0), "
        "'view_click_purchase', n3, (n3 * 1000L) div NULLIF(n2, 0)"
        ") AS (stage, n_users, conv_permille)"
    )
