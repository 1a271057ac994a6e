"""Streaming multi-touch attribution with a growing click log.

The ingest twin of ``timeseries.events_attribution``: each arriving
micro-batch's PURCHASES are attributed at arrival against the click
touches seen so far (the click-log state plus the batch's own clicks),
emitting the per-(purchase, touch) split rows; the batch's clicks then
join the log. The channel report is a plain additive rollup over all
emitted split partitions (``attribution_report``).

At-arrival contract: a purchase is attributed against clicks that
ARRIVED no later than its own batch. Delivered in timestamp order
(every click precedes the purchases it can touch) this equals the
batch ``events_attribution`` EXACTLY — pinned in
tests/test_streaming_attribution.py. Out-of-order late clicks do not
retro-attribute already-emitted purchases: the correct serving-time
behavior (the money was attributed when the conversion landed), and
the documented divergence from an after-the-fact batch recompute —
the same honest-divergence style as the LSH/span index twins.

Replay idempotence: the click log AND the split sink are partitioned
by ``batch_id`` with dynamic partition overwrite, and the attribution
join reads the log with ``batch_id < current`` (strictly earlier) — a
re-delivered batch replaces its own partitions, never double-joins
its own first-attempt clicks, and never sees clicks that arrived
AFTER its first attempt (which would retro-attribute and break
idempotence). The carve is shared with streaming/dedup_index.py /
span_index.py / trend.py; the strict inequality is what the
at-arrival contract adds.

State growth: the click log only ever matters within ATTR_WINDOW_DAYS
of incoming purchases, so the read prunes to the batch's window
(``ts >= min(purchase ts) - window``); at 100 TB the log would be
day-partitioned so that prune is partition elimination, not a row
filter.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..operators.timeseries import (
    ATTR_WINDOW_DAYS,
    attribution_clicks,
    attribution_purchases,
    attribution_split,
)
from ..pipeline.lake import read_parquet_index as _read_parquet_index
from ..pipeline.lake import write_batch_partition as _write_batch_partition


def attribute_batch(
    batch_events: DataFrame, clicks_path: str, batch_id: int
) -> DataFrame:
    """Attribute this batch's purchases against the click log + the
    batch's own clicks; append the batch's clicks to their log
    partition. Returns the split frame
    ``(channel, purchase_id, attr_cents)``."""
    spark = batch_events.sparkSession
    bc = attribution_clicks(batch_events).localCheckpoint(eager=True)
    # checkpoint the purchase side too: the min(pts) bounds collect and
    # the attribution_split join each re-scanned the micro-batch source
    # for bp, a duplicate source read on the per-batch hot path (r08
    # review; bc one line up got its checkpoint for the same reason)
    bp = attribution_purchases(batch_events).localCheckpoint(eager=True)

    clicks = bc
    # cold-start semantics centralized in lake.read_parquet_index
    # (None = missing dir or legacy schema-less dir; real schema
    # drift propagates) — shared with the dedup/span index screens
    log = _read_parquet_index(spark, clicks_path)
    if log is not None:
        # STRICTLY-EARLIER batches only: on the live path the
        # current batch has the max id so < and != agree, but a
        # REPLAY of an old batch must not see clicks that arrived
        # after its first attempt — batch_id != current would let
        # a later-delivered out-of-order click retro-attribute the
        # replayed purchases and break idempotence (review pass 4)
        prior = log.where(
            F.col("batch_id") < int(batch_id)
        ).drop("batch_id")
        # window prune: clicks older than any possible touch are
        # dead weight for THIS batch's join (they stay in the log
        # for replays of later batches)
        bounds = bp.agg(F.min("pts").alias("lo")).collect()
        if bounds and bounds[0]["lo"] is not None:
            prior = prior.where(
                F.col("ts")
                >= F.lit(bounds[0]["lo"])
                - F.expr(f"INTERVAL {ATTR_WINDOW_DAYS} DAYS")
            )
        clicks = prior.unionByName(bc)

    split = attribution_split(clicks, bp).localCheckpoint(eager=True)
    # empty-frame handling (schema-less dir hazard) lives inside
    # _write_batch_partition — a second isEmpty() here was a
    # redundant Spark job per micro-batch (r06 review)
    _write_batch_partition(bc, clicks_path, batch_id)
    return split


def stream_attribution(
    events_stream: DataFrame,
    clicks_path: str,
    splits_path: str,
    checkpoint: str,
):
    """Start at-arrival attribution: per-batch split rows land in
    their ``batch_id`` partition of ``splits_path``; the click log
    grows at ``clicks_path``. Roll up with
    ``timeseries.attribution_report(spark.read.parquet(splits_path))``."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        split = attribute_batch(batch, clicks_path, batch_id)
        # clicks-only batches (normal at stream start) attribute
        # nothing; the empty-frame guard inside _write_batch_partition
        # skips the schema-less write
        _write_batch_partition(split, splits_path, batch_id)

    return (
        events_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
