"""Stream-batch parity: the streaming jobs must reproduce the batch
operators exactly when the stream is fully replayed (availableNow)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from energy_data_pipeline_project_spark.operators.relational import (
    events_sessionize,
)
from energy_data_pipeline_project_spark.sources.tables import load_table
from energy_data_pipeline_project_spark.streaming import jobs

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def event_dir(spark, tmp_path_factory):
    """Re-materialize events as a multi-file parquet dir (stream source),
    with micro-batch replay forced by maxFilesPerTrigger."""
    path = str(tmp_path_factory.mktemp("events-stream"))
    ev = load_table(spark, SF_SMOKE, "events")
    ev.repartition(8).write.mode("overwrite").parquet(path)
    return path


def test_tumbling_daily_parity(spark, event_dir):
    stream = jobs.read_event_stream(spark, event_dir)
    got = jobs.run_to_memory(jobs.windowed_counts(stream), "daily_counts")

    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy(F.to_date("ts").alias("event_date"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 4).alias("avg_value"))
    )
    g = {(r[0], r[1]): (r[2], r[3]) for r in got.collect()}
    b = {(r[0], r[1]): (r[2], r[3]) for r in batch.collect()}
    assert g.keys() == b.keys()
    for k in b:
        assert g[k][0] == b[k][0], k  # counts exact
        # micro-batch partial aggs reorder the float sum → tolerance
        assert abs(g[k][1] - b[k][1]) < 1e-3, (k, g[k], b[k])


def test_sliding_window_counts(spark, event_dir):
    stream = jobs.read_event_stream(spark, event_dir)
    got = jobs.run_to_memory(jobs.sliding_avg(stream), "sliding")
    rows = got.collect()
    assert rows
    # every event is counted twice across overlapping 1h/30min windows
    total_events = load_table(spark, SF_SMOKE, "events").count()
    assert sum(r["n"] for r in rows) == 2 * total_events


def test_session_window_parity(spark, event_dir):
    """session_window(30min) must agree with the batch lag-gap
    sessionization on both session count and events per user."""
    stream = jobs.read_event_stream(spark, event_dir)
    got = jobs.run_to_memory(jobs.session_counts(stream), "sessions")
    stream_per_user = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in got.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").cast("bigint").alias("n_events"),
        )
        .collect()
    }
    batch_per_user = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in events_sessionize(spark, SF_SMOKE).collect()
    }
    assert stream_per_user == batch_per_user
