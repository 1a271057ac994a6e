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


def test_streaming_medallion_matches_batch_gold(spark, tmp_path_factory):
    """Bronze payloads streamed through the SAME silver plan + a
    watermarked daily window must reproduce the batch gold aggregate
    exactly (modulo float-sum ordering)."""
    import math

    from energy_data_pipeline_project_spark.pipeline.config import (
        default_datasets,
    )
    from energy_data_pipeline_project_spark.pipeline.gold import (
        power_daily_by_type,
    )
    from energy_data_pipeline_project_spark.pipeline.ingestion import (
        bronze_schema,
        ingest_dataset,
    )
    from energy_data_pipeline_project_spark.pipeline.silver import (
        extract_timeseries,
    )
    from energy_data_pipeline_project_spark.sources.fixtures import (
        fixture_payloads,
    )
    from energy_data_pipeline_project_spark.streaming import medallion

    days = [f"2025-01-0{i}" for i in range(1, 6)]
    payloads = fixture_payloads(days)
    power_ds = default_datasets()[0]

    import json as _json

    rows = [
        ("de", d, _json.dumps(payloads[power_ds.name][d])) for d in days
    ]
    bronze = (
        spark.createDataFrame(rows, schema=bronze_schema(power_ds))
        .withColumn("ingested_at", F.current_timestamp())
        .withColumn("source", F.lit("energy-charts"))
    )
    bronze_dir = str(tmp_path_factory.mktemp("bronze-stream"))
    bronze.repartition(5).write.mode("overwrite").parquet(bronze_dir)

    stream = medallion.read_bronze_stream(spark, bronze_dir)
    assert stream.isStreaming
    gold_stream = medallion.stream_power_daily(
        medallion.stream_silver(stream, power_ds)
    )
    got = {
        (r["date"], r["production_type"]): r["daily_net_production"]
        for r in jobs.run_to_memory(gold_stream, "stream_gold").collect()
    }
    want = {
        (r["date"], r["production_type"]): r["daily_net_production"]
        for r in power_daily_by_type(
            extract_timeseries(bronze, power_ds)
        ).collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=1e-9), k


def test_stream_gold_lake_sink_idempotent(spark, tmp_path_factory):
    """foreachBatch dynamic-partition-overwrite sink: streamed gold on
    disk equals batch gold, and re-running the stream over the same
    source leaves identical contents (idempotent refresh)."""
    import json as _json

    from energy_data_pipeline_project_spark.pipeline.config import (
        default_datasets,
    )
    from energy_data_pipeline_project_spark.pipeline.ingestion import (
        bronze_schema,
    )
    from energy_data_pipeline_project_spark.sources.fixtures import (
        fixture_payloads,
    )
    from energy_data_pipeline_project_spark.streaming import medallion

    days = [f"2025-02-0{i}" for i in range(1, 4)]
    ds = default_datasets()[0]
    payloads = fixture_payloads(days)
    rows = [("de", d, _json.dumps(payloads[ds.name][d])) for d in days]
    bronze = (
        spark.createDataFrame(rows, schema=bronze_schema(ds))
        .withColumn("ingested_at", F.current_timestamp())
        .withColumn("source", F.lit("energy-charts"))
    )
    bdir = str(tmp_path_factory.mktemp("bronze-sink"))
    bronze.repartition(3).write.mode("overwrite").parquet(bdir)
    gold_dir = str(tmp_path_factory.mktemp("gold-sink")) + "/power_daily"

    def run_once():
        q = medallion.write_gold_stream_to_lake(
            medallion.stream_power_daily(
                medallion.stream_silver(
                    medallion.read_bronze_stream(spark, bdir), ds
                )
            ),
            gold_dir,
        )
        q.awaitTermination()
        return sorted(
            (str(r["date"]), r["production_type"], round(r["daily_net_production"], 6))
            for r in spark.read.parquet(gold_dir).collect()
        )

    first = run_once()
    assert len(first) == len(days) * 8  # days × production types
    second = run_once()
    assert first == second


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


def test_partial_day_micro_batches_keep_all_types(spark, tmp_path_factory):
    """A day whose production types arrive in different micro-batches
    must keep ALL types on disk. Update mode re-emits only changed
    (date, type) aggregates, so the sink's overwrite granularity has to
    be (date, type) — partitioning by date alone wiped earlier types
    of the same day (round-1 ADVICE)."""
    import json as _json

    from energy_data_pipeline_project_spark.pipeline.config import (
        default_datasets,
    )
    from energy_data_pipeline_project_spark.pipeline.ingestion import (
        bronze_schema,
    )
    from energy_data_pipeline_project_spark.streaming import medallion

    ds = default_datasets()[0]
    day = "2025-03-01"
    epochs = [1740787200 + i * 900 for i in range(96)]

    def payload(types):
        return {
            "unix_seconds": [float(e) for e in epochs],
            "production_types": [
                {"name": t, "data": [100.0] * len(epochs)} for t in types
            ],
        }

    # same day, disjoint type subsets, one bronze file each
    batches = [["Solar", "Biomass"], ["Nuclear"]]
    bdir = str(tmp_path_factory.mktemp("bronze-partial"))
    for i, types in enumerate(batches):
        row = [("de", day, _json.dumps(payload(types)))]
        (
            spark.createDataFrame(row, schema=bronze_schema(ds))
            .withColumn("ingested_at", F.current_timestamp())
            .withColumn("source", F.lit("energy-charts"))
            .write.mode("append")
            .parquet(bdir)
        )
    gold_dir = str(tmp_path_factory.mktemp("gold-partial")) + "/power_daily"

    q = medallion.write_gold_stream_to_lake(
        medallion.stream_power_daily(
            medallion.stream_silver(
                medallion.read_bronze_stream(
                    spark, bdir, max_files_per_trigger=1
                ),
                ds,
            )
        ),
        gold_dir,
    )
    q.awaitTermination()

    got = {
        r["production_type"]: r["daily_net_production"]
        for r in spark.read.parquet(gold_dir).collect()
    }
    assert set(got) == {"Solar", "Biomass", "Nuclear"}
    assert all(abs(v - 96 * 100.0) < 1e-6 for v in got.values())


def test_checkpointed_sink_resumes_incrementally(spark, tmp_path_factory):
    """With a checkpoint dir, a restarted stream must pick up only new
    files (committed offsets), and the lake must reflect both runs."""
    import json as _json

    from energy_data_pipeline_project_spark.pipeline.config import (
        default_datasets,
    )
    from energy_data_pipeline_project_spark.pipeline.ingestion import (
        bronze_schema,
    )
    from energy_data_pipeline_project_spark.sources.fixtures import (
        fixture_payloads,
    )
    from energy_data_pipeline_project_spark.streaming import medallion

    ds = default_datasets()[0]
    bdir = str(tmp_path_factory.mktemp("bronze-ckpt"))
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    gold_dir = str(tmp_path_factory.mktemp("gold-ckpt")) + "/power_daily"

    def land(day):
        payloads = fixture_payloads([day])
        row = [("de", day, _json.dumps(payloads[ds.name][day]))]
        (
            spark.createDataFrame(row, schema=bronze_schema(ds))
            .withColumn("ingested_at", F.current_timestamp())
            .withColumn("source", F.lit("energy-charts"))
            .write.mode("append")
            .parquet(bdir)
        )

    def run():
        q = medallion.write_gold_stream_to_lake(
            medallion.stream_power_daily(
                medallion.stream_silver(
                    medallion.read_bronze_stream(spark, bdir), ds
                )
            ),
            gold_dir,
            checkpoint_dir=ckpt,
        )
        q.awaitTermination()
        return q

    land("2025-03-10")
    q1 = run()
    days_on_disk = {
        str(r["date"]) for r in spark.read.parquet(gold_dir).collect()
    }
    assert days_on_disk == {"2025-03-10"}

    land("2025-03-11")
    q2 = run()
    days_on_disk = {
        str(r["date"]) for r in spark.read.parquet(gold_dir).collect()
    }
    assert days_on_disk == {"2025-03-10", "2025-03-11"}
    # restart resumed from committed offsets: second run saw only the
    # new file, not a full replay
    progress = q2.recentProgress
    replayed = sum(p["numInputRows"] for p in progress)
    first_run_rows = sum(p["numInputRows"] for p in q1.recentProgress)
    assert replayed <= first_run_rows


def test_stream_dedup_exactly_once(spark, tmp_path_factory):
    """At-least-once file delivery (overlapping + fully duplicated
    files) must come out exactly-once, matching batch dropDuplicates.
    All timestamps sit inside one watermark interval so the guarantee
    is unconditional here; ts spread < WATERMARK keeps re-delivered
    rows above the watermark in later micro-batches."""
    import datetime as dt

    base = dt.datetime(2025, 5, 1, 12, 0, 0)
    rows = [
        (
            i,
            base + dt.timedelta(minutes=i % 50),
            i % 7,
            "click",
            float(i),
            "{}",
        )
        for i in range(150)
    ]
    sdir = str(tmp_path_factory.mktemp("dedup-stream"))
    mk = lambda sl: spark.createDataFrame(sl, schema=jobs.EVENT_SCHEMA)
    # file A: 0..99, file B: 50..149 (50 dups), file C: exact copy of A
    mk(rows[:100]).write.mode("append").parquet(sdir)
    mk(rows[50:]).write.mode("append").parquet(sdir)
    mk(rows[:100]).write.mode("append").parquet(sdir)

    stream = jobs.read_event_stream(spark, sdir)
    # maxFilesPerTrigger=4 in the reader, but parquet writes produce
    # several part-files; the result must hold regardless of batching
    got = jobs.run_to_memory(
        jobs.dedup_events(stream), "dedup_stream", output_mode="append"
    )
    ids = [r["event_id"] for r in got.select("event_id").collect()]
    assert sorted(ids) == list(range(150))  # every id exactly once

    batch = spark.read.parquet(sdir).dropDuplicates(["event_id"])
    assert batch.count() == 150


def test_stream_stream_join_parity(spark, event_dir):
    """Interval-joined conversions from the stream must equal the same
    range join run as a batch query (INTERVAL condition = bounded join
    state; this is the only stream-stream join shape that can run
    forever)."""
    stream = jobs.read_event_stream(spark, event_dir)
    got = jobs.run_to_memory(
        jobs.click_purchase_conversions(stream),
        "conversions",
        output_mode="append",
    )
    stream_rows = {
        (r["user_id"], r["click_id"], r["purchase_id"], r["gap_seconds"])
        for r in got.collect()
    }

    # batch twin: identical plan on the static frame (the function is
    # stream/batch agnostic — watermarks are no-ops on batch frames)
    ev = spark.read.parquet(event_dir)
    batch_rows = {
        (r["user_id"], r["click_id"], r["purchase_id"], r["gap_seconds"])
        for r in jobs.click_purchase_conversions(ev).collect()
    }
    assert stream_rows == batch_rows
    assert stream_rows, "expected at least one conversion in testdata"
    for _, _, _, gap in stream_rows:
        assert 0 < gap <= 30 * 60


def test_stream_merge_sink_keeps_latest_per_key(spark, tmp_path):
    """CDC-style merge sink: versioned records arriving across
    micro-batches leave the lake with exactly the newest version per
    key (write_stream_merge_to_lake → upsert_table per batch)."""
    import os

    from energy_data_pipeline_project_spark.streaming.medallion import (
        write_stream_merge_to_lake,
    )

    src = str(tmp_path / "changes")
    lake = str(tmp_path / "merged")
    os.makedirs(src)
    # batch files land in name order with maxFilesPerTrigger=1 →
    # deterministic micro-batch sequence
    spark.createDataFrame(
        [(1, 1, "a1"), (2, 1, "b1"), (2, 2, "b2")], "k long, ver long, v string"
    ).coalesce(1).write.parquet(src + "/f0")
    spark.createDataFrame(
        [(2, 3, "b3"), (3, 1, "c1")], "k long, ver long, v string"
    ).coalesce(1).write.parquet(src + "/f1")

    stream = (
        spark.readStream.schema("k long, ver long, v string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = write_stream_merge_to_lake(
        stream, lake, key_cols=("k",), order_col="ver"
    )
    q.awaitTermination()

    got = {
        r["k"]: (r["ver"], r["v"])
        for r in spark.read.parquet(lake).collect()
    }
    assert got == {1: (1, "a1"), 2: (3, "b3"), 3: (1, "c1")}


def test_stream_static_enrich_parity(spark, event_dir):
    """Stream-static dimension enrichment must equal the same join run
    as a batch query, cover every event exactly once (inner join on a
    complete dim), and never require watermarks or join state."""
    dim = jobs.type_dim(spark)
    stream = jobs.read_event_stream(spark, event_dir)
    got = jobs.run_to_memory(
        jobs.enrich_with_static(stream, dim),
        "enriched",
        output_mode="append",
    )
    stream_rows = {
        (r["event_id"], r["category"], r["weighted_cents"])
        for r in got.collect()
    }

    ev = spark.read.parquet(event_dir)
    batch_rows = {
        (r["event_id"], r["category"], r["weighted_cents"])
        for r in jobs.enrich_with_static(ev, dim).collect()
    }
    assert stream_rows == batch_rows
    assert len(stream_rows) == ev.count(), "dim must cover every type"


def test_stream_stream_left_outer_join_parity(spark, event_dir):
    """LEFT OUTER stream-stream interval join: matched rows must equal
    the batch twin exactly; unmatched clicks appear with NULL purchase
    once the watermark passes them (all of testdata is far behind the
    final watermark, so every click must be accounted for)."""
    stream = jobs.read_event_stream(spark, event_dir)
    got = jobs.run_to_memory(
        jobs.click_conversion_outcomes(stream),
        "conversion_outcomes",
        output_mode="append",
    )
    stream_rows = {
        (r["user_id"], r["click_id"], r["purchase_id"], r["converted"])
        for r in got.collect()
    }
    ev = spark.read.parquet(event_dir)
    batch_rows = {
        (r["user_id"], r["click_id"], r["purchase_id"], r["converted"])
        for r in jobs.click_conversion_outcomes(ev).collect()
    }
    # Matched rows are emitted eagerly — exact parity required.
    assert {r for r in stream_rows if r[3]} == {
        r for r in batch_rows if r[3]
    }
    # Null-extended rows are emitted only once the watermark passes
    # click_ts + window, so clicks inside the final
    # (watermark + window) tail of the stream are legitimately still
    # pending when the stream drains. Everything older must be present.
    import datetime

    import pyspark.sql.functions as F

    # the join's global watermark is the MIN of the two sides'
    # (max event time - delay); null emission further waits out the
    # 30-minute join interval
    max_click = (
        ev.where(F.col("event_type") == "click")
        .agg(F.max("ts"))
        .collect()[0][0]
    )
    max_purchase = (
        ev.where(F.col("event_type") == "purchase")
        .agg(F.max("ts"))
        .collect()[0][0]
    )
    cutoff = min(max_click, max_purchase) - datetime.timedelta(
        hours=1, minutes=30
    )
    click_ts = {
        r["event_id"]: r["ts"]
        for r in ev.where(F.col("event_type") == "click").collect()
    }
    stream_unmatched = {r for r in stream_rows if not r[3]}
    batch_unmatched = {r for r in batch_rows if not r[3]}
    assert stream_unmatched <= batch_unmatched
    late = batch_unmatched - stream_unmatched
    assert all(click_ts[r[1]] >= cutoff for r in late)
    assert stream_unmatched, "expected drained null-extended clicks"
    assert all(r[2] is None for r in stream_unmatched)


def test_windowed_distinct_users_parity(spark, event_dir):
    """Chained stateful dedup → windowed count must equal the batch
    per-day COUNT(DISTINCT user_id) exactly on full replay."""
    stream = jobs.read_event_stream(spark, event_dir)
    got = jobs.run_to_memory(
        jobs.windowed_distinct_users(stream), "daily_users",
        output_mode="append",
    )
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy(F.to_date("ts").alias("event_date"))
        .agg(F.countDistinct("user_id").alias("n_users"))
    )
    g = {r["event_date"]: r["n_users"] for r in got.collect()}
    b = {r["event_date"]: r["n_users"] for r in batch.collect()}
    # append mode only emits windows the watermark has closed; every
    # emitted day must match batch exactly, and most days must emit
    assert g and all(g[d] == b[d] for d in g)
    # the 24h dedup watermark (required for EXACT daily distinct —
    # same-day events can be 24h apart) holds the final two days open
    assert len(g) >= len(b) - 2


def test_late_rows_beyond_watermark_are_dropped(spark, tmp_path_factory):
    """The late-data policy, executed rather than documented — and
    pinned to Spark's REAL guarantee: a watermark-late row is only
    assuredly dropped once its window has been emitted and its state
    evicted. Batch 1 advances the watermark past day-1's window end;
    batch 2 (any row) lets the engine emit + evict day-1's state;
    batch 3 delivers a day-1 row the watermark passed long ago — it
    must NOT resurrect the closed window. maxFilesPerTrigger=1 with
    explicit mtimes forces the three files into ordered micro-batches.
    The batch control (same rows, one pass) counts the late row,
    proving the exclusion is the watermark, not a filter."""
    import datetime as dt
    import os
    import time

    path = str(tmp_path_factory.mktemp("late-stream"))

    def mk(rows, fname, mtime):
        df = spark.createDataFrame(
            [
                (100 * i + d, dt.datetime(2024, 1, d, h, 0, 0), 1, "click", 1.0, "{}")
                for i, (d, h) in enumerate(rows)
            ],
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
        f = os.path.join(path, fname)
        df.coalesce(1).write.mode("overwrite").parquet(f)
        for root, _dirs, files in os.walk(f):
            for x in files:
                os.utime(os.path.join(root, x), (mtime, mtime))
        os.utime(f, (mtime, mtime))

    now = time.time()
    # batch 1: three day-1 rows + a day-2 02:00 row → watermark advances
    # to day-2 01:00, past day-1's window end
    mk([(1, 9), (1, 10), (1, 11), (2, 2)], "a.parquet", now - 600)
    # batch 2: filler day-2 row; day-1's window is emitted and evicted
    mk([(2, 3)], "b.parquet", now - 300)
    # batch 3: a day-1 row the watermark passed — must stay dropped
    mk([(1, 12)], "c.parquet", now - 60)

    stream = (
        spark.readStream.schema(jobs.EVENT_SCHEMA)
        # ONE data file per micro-batch so watermark/eviction commit
        # between the three files
        .option("maxFilesPerTrigger", 1)
        .parquet(path + "/*")
    )
    got = jobs.run_to_memory(
        jobs.windowed_counts(stream), "late_probe", output_mode="append"
    )
    rows = got.collect()
    by_day = {r["event_date"]: r["n"] for r in rows}
    assert by_day[dt.date(2024, 1, 1)] == 3  # late row NOT counted
    # the closed window is emitted exactly once, never re-opened
    assert len([r for r in rows if r["event_date"] == dt.date(2024, 1, 1)]) == 1

    # control: same five+ rows in ONE batch pass count the "late" row —
    # proving the exclusion above was the watermark, not a filter
    batch_equiv = (
        spark.read.schema(jobs.EVENT_SCHEMA)
        .parquet(path + "/*")
        .groupBy(F.to_date("ts").alias("d"))
        .count()
        .collect()
    )
    counts = {r["d"]: r["count"] for r in batch_equiv}
    assert counts[dt.date(2024, 1, 1)] == 4


def test_stateful_jobs_run_on_rocksdb_state_store(spark, event_dir):
    """State-store portability: the windowed aggregation must produce
    identical results on the RocksDB state store provider (how large
    deployments keep streaming state off the JVM heap and restart
    fast). Provider is a per-query conf via the checkpoint'd session
    conf; results must match the default-HDFS-provider run exactly."""
    provider = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
    try:
        stream = jobs.read_event_stream(spark, event_dir)
        got = jobs.run_to_memory(jobs.windowed_counts(stream), "rocksdb_counts")
        rows = {
            (r["event_date"], r["event_type"]): (r["n"], r["avg_value"])
            for r in got.collect()
        }
    finally:
        if old is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", old
            )
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy(F.to_date("ts").alias("event_date"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 4).alias("avg_value"))
    )
    want = {
        (r["event_date"], r["event_type"]): (r["n"], r["avg_value"])
        for r in batch.collect()
    }
    assert rows.keys() == want.keys()
    for k in want:
        assert rows[k][0] == want[k][0], k
        assert abs(rows[k][1] - want[k][1]) < 1e-3, k


def test_windowed_histogram_parity(spark, event_dir):
    """The streamed daily histogram sketch must equal the batch daily
    stage bin-for-bin (pure integer counts — exact), proving the
    streamed sketches merge into the same weekly quantiles."""
    from energy_data_pipeline_project_spark.operators.timeseries import (
        HIST_BIN_WIDTH,
    )

    stream = jobs.read_event_stream(spark, event_dir)
    got = jobs.run_to_memory(
        jobs.windowed_value_histogram(stream), "daily_hist"
    )

    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy(
            F.to_date("ts").alias("d"),
            "event_type",
            F.floor(F.col("value") / HIST_BIN_WIDTH)
            .cast("bigint")
            .alias("bin"),
        )
        .agg(F.count("*").alias("cnt"))
    )
    g = {(r[0], r[1], r[2]): r[3] for r in got.collect()}
    b = {(r[0], r[1], r[2]): r[3] for r in batch.collect()}
    assert g == b


def test_price_dataset_streams_through_silver(spark, tmp_path_factory):
    """The PRICE dataset's bronze key column is 'market', not
    'country': a hardcoded country stream schema read market back as
    all-NULL country and stream_silver crashed with an unresolved
    market reference — the streaming path silently only worked for the
    power dataset (r08 review). Stream the price bronze and assert
    row-for-row silver parity with the batch plan."""
    import json as _json

    from energy_data_pipeline_project_spark.pipeline.config import (
        default_datasets,
    )
    from energy_data_pipeline_project_spark.pipeline.ingestion import (
        bronze_schema,
    )
    from energy_data_pipeline_project_spark.pipeline.silver import (
        extract_timeseries,
    )
    from energy_data_pipeline_project_spark.sources.fixtures import (
        fixture_payloads,
    )
    from energy_data_pipeline_project_spark.streaming import jobs, medallion

    days = ["2025-03-01", "2025-03-02"]
    price_ds = default_datasets()[1]
    assert price_ds.key_column == "market"
    payloads = fixture_payloads(days)
    rows = [
        ("DE-LU", d, _json.dumps(payloads[price_ds.name][d])) for d in days
    ]
    bronze = (
        spark.createDataFrame(rows, schema=bronze_schema(price_ds))
        .withColumn("ingested_at", F.current_timestamp())
        .withColumn("source", F.lit("energy-charts"))
    )
    bdir = str(tmp_path_factory.mktemp("bronze-price-stream"))
    bronze.repartition(3).write.mode("overwrite").parquet(bdir)

    stream = medallion.read_bronze_stream(
        spark, bdir, key_column=price_ds.key_column
    )
    silver_stream = medallion.stream_silver(stream, price_ds)
    got = sorted(
        (r["market"], str(r["timestamp"]), r["price_eur_mwh"])
        for r in jobs.run_to_memory(
            silver_stream, "silver_price", output_mode="append"
        ).collect()
    )
    want = sorted(
        (r["market"], str(r["timestamp"]), r["price_eur_mwh"])
        for r in extract_timeseries(bronze, price_ds).collect()
    )
    assert got == want and got
