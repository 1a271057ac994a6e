"""Streaming at-arrival attribution: timestamp-ordered delivery must
reproduce the batch events_attribution channel report exactly, and a
re-delivered batch must be idempotent."""

from __future__ import annotations

import pyspark.sql.functions as F

from energy_data_pipeline_project_spark.operators.timeseries import (
    attribution_report,
    events_attribution,
)
from energy_data_pipeline_project_spark.sources.tables import load_table
from energy_data_pipeline_project_spark.streaming.attribution import (
    attribute_batch,
)

from .conftest import SF_SMOKE

N_BATCHES = 4


def _report_set(df):
    return {
        (r.channel, r.n_touches, r.n_conversions, r.attributed_cents)
        for r in df.collect()
    }


def test_streamed_attribution_matches_batch(spark, tmp_path_factory):
    clicks = str(tmp_path_factory.mktemp("click-log")) + "/c"
    ev = load_table(spark, SF_SMOKE, "events")

    # timestamp-ordered delivery: contiguous ts ranges so every click
    # arrives no later than any purchase it can touch
    ts_sorted = [r.ts for r in ev.select("ts").orderBy("ts").collect()]
    cuts = [
        ts_sorted[(i + 1) * len(ts_sorted) // N_BATCHES - 1]
        for i in range(N_BATCHES)
    ]
    splits = []
    per_batch: dict[int, set] = {}
    lo = None
    for bid, hi in enumerate(cuts):
        cond = F.col("ts") <= F.lit(hi)
        if lo is not None:
            cond = cond & (F.col("ts") > F.lit(lo))
        batch = ev.where(cond)
        lo = hi
        sp = attribute_batch(batch, clicks, bid)
        per_batch[bid] = {
            (r.channel, r.purchase_id, r.attr_cents) for r in sp.collect()
        }
        splits.append(sp)
    union = splits[0]
    for sp in splits[1:]:
        union = union.unionByName(sp)

    streamed = _report_set(attribution_report(union))
    batch_ref = _report_set(events_attribution(spark, SF_SMOKE))
    assert streamed == batch_ref and batch_ref, (
        sorted(streamed), sorted(batch_ref),
    )

    # replay a middle batch: identical split rows (its click-log
    # partition is replaced; the join excludes the first attempt)
    replay_bid = 1
    batch = ev.where(
        (F.col("ts") > F.lit(cuts[0])) & (F.col("ts") <= F.lit(cuts[1]))
    )
    sp = attribute_batch(batch, clicks, replay_bid)
    got = {(r.channel, r.purchase_id, r.attr_cents) for r in sp.collect()}
    assert got == per_batch[replay_bid]


def test_attribution_is_at_arrival(spark, tmp_path_factory):
    """A click delivered AFTER the purchase it precedes in event time
    does not retro-attribute: the purchase keeps its at-arrival split.
    (The documented divergence from an after-the-fact batch run.)"""
    clicks = str(tmp_path_factory.mktemp("click-log2")) + "/c"
    ev = load_table(spark, SF_SMOKE, "events")
    purchases = ev.where("event_type = 'purchase'")
    click_rows = ev.where("event_type = 'click'")

    # batch 0: ALL purchases, no clicks -> nothing attributable
    sp0 = attribute_batch(purchases, clicks, 0)
    assert sp0.count() == 0
    # batch 1: the clicks arrive late -> still nothing, since batch 1
    # contains no purchases to attribute
    sp1 = attribute_batch(click_rows, clicks, 1)
    assert sp1.count() == 0


def test_replay_ignores_later_arrived_clicks(spark, tmp_path_factory):
    """The review-pass-4 scenario: a late click delivered in a LATER
    batch must not retro-attribute when an earlier batch is replayed —
    the replay joins strictly-earlier batches only, so its verdicts
    are bit-identical to the first attempt."""
    clicks = str(tmp_path_factory.mktemp("click-log3")) + "/c"
    ev = load_table(spark, SF_SMOKE, "events")
    purchases = ev.where("event_type = 'purchase'")
    click_rows = ev.where("event_type = 'click'")

    # batch 0: a few clicks; batch 1: ALL purchases (attributed against
    # batch 0 only); batch 2: the remaining clicks arrive late
    early = click_rows.where("event_id % 3 = 0")
    late = click_rows.where("event_id % 3 != 0")
    attribute_batch(early, clicks, 0)
    first = {
        (r.channel, r.purchase_id, r.attr_cents)
        for r in attribute_batch(purchases, clicks, 1).collect()
    }
    attribute_batch(late, clicks, 2)
    replay = {
        (r.channel, r.purchase_id, r.attr_cents)
        for r in attribute_batch(purchases, clicks, 1).collect()
    }
    assert replay == first
    # sanity: the late clicks WOULD have changed the attribution had
    # the replay been allowed to see them
    full = {
        (r.channel, r.purchase_id, r.attr_cents)
        for r in attribute_batch(purchases, clicks, 3).collect()
    }
    assert full != first
