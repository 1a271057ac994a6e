"""applyInPandasWithState sessionizer vs the batch lag-gap sessionizer.

The streaming operator only emits *closed* sessions (a session still
open at end-of-stream stays in state), so parity is checked on the
sessions the batch twin also considers closed.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from energy_data_pipeline_project_spark.operators.relational import (
    events_sessionize,
)
from energy_data_pipeline_project_spark.sources.tables import load_table
from energy_data_pipeline_project_spark.streaming import jobs
from energy_data_pipeline_project_spark.streaming.stateful import (
    sessionize_with_state,
)

from .conftest import SF_SMOKE


def test_stateful_sessionizer_closed_sessions_match_batch(
    spark, tmp_path_factory
):
    src = str(tmp_path_factory.mktemp("ev-state"))
    # replay chronologically (range-partitioned by ts → part files in
    # event-time order): the watermark then trails the data as it would
    # on a live stream. A randomly-shuffled replay instead races the
    # watermark past mid-stream users and force-closes their sessions —
    # correct event-time semantics, but not comparable to batch.
    (
        load_table(spark, SF_SMOKE, "events")
        .repartitionByRange(6, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(src)
    )

    stream = jobs.read_event_stream(spark, src)
    out = sessionize_with_state(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("closed_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("closed_sessions")

    # batch: total sessions per user; streaming: closed sessions per
    # user — the difference is exactly the one still-open session per
    # user with events (unless the timeout fired for it, which
    # availableNow termination does not guarantee).
    batch = {
        r["user_id"]: r["n_sessions"]
        for r in events_sessionize(spark, SF_SMOKE).collect()
    }
    stream_closed = {
        r["user_id"]: r["n"]
        for r in got.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert stream_closed, "no closed sessions emitted"
    for user, n_closed in stream_closed.items():
        assert batch[user] - 1 <= n_closed <= batch[user], (
            user,
            n_closed,
            batch[user],
        )
    # durations must be non-negative and bounded by the stream's span
    bad = got.where("duration_s < 0 OR duration_s > 30 * 86400").count()
    assert bad == 0
    # event counts per closed session are positive
    assert got.where("n_events <= 0").count() == 0