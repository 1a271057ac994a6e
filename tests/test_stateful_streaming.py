"""applyInPandasWithState sessionizer vs the batch lag-gap sessionizer.

The streaming operator only emits *closed* sessions (a session still
open at end-of-stream stays in state), so parity is checked on the
sessions the batch twin also considers closed.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from energy_data_pipeline_project_spark.functions import money
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
    ckpt = str(tmp_path_factory.mktemp("ev-state-ckpt"))
    q = (
        out.writeStream.format("memory")
        .queryName("closed_sessions")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("closed_sessions")

    # EXACT accounting per user: every batch-twin session is either
    # emitted (closed) or still held in state (the open session plus
    # any parked not-yet-expired earlier runs — availableNow ends
    # before the watermark passes them). The state-store reader makes
    # the held runs countable, so the invariant is equality, stronger
    # than the old "closed within [batch-1, batch]" bound (which the
    # r07 parked-island fix legitimately broke: parked runs > 1).
    batch = {
        r["user_id"]: r["n_sessions"]
        for r in events_sessionize(spark, SF_SMOKE).collect()
    }
    stream_closed = {
        r["user_id"]: r["n"]
        for r in got.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert stream_closed, "no closed sessions emitted"
    state = (
        spark.read.format("statestore")
        .load(ckpt)
        .select(
            F.col("key.user_id").alias("user_id"),
            (
                F.lit(1)
                + F.size(
                    F.coalesce("value.groupState.parked_n", F.array())
                )
            ).alias("held"),
        )
    )
    held = {r["user_id"]: r["held"] for r in state.collect()}
    for user, total in batch.items():
        assert stream_closed.get(user, 0) + held.get(user, 0) == total, (
            user,
            stream_closed.get(user, 0),
            held.get(user, 0),
            total,
        )
    # durations must be non-negative and bounded by the stream's span
    bad = got.where("duration_s < 0 OR duration_s > 30 * 86400").count()
    assert bad == 0
    # event counts per closed session are positive
    assert got.where("n_events <= 0").count() == 0

def _protobuf_available() -> bool:
    """transformWithStateInPandas drives its state server over
    protobuf; this container ships a broken google.protobuf (no
    descriptor module) and installs are off-limits — same
    environment-gated pattern as the Delta-format probe."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


import pytest  # noqa: E402


@pytest.fixture()
def event_dir(spark, tmp_path_factory):
    from energy_data_pipeline_project_spark.sources.tables import load_table

    path = str(tmp_path_factory.mktemp("events-tws"))
    load_table(spark, SF_SMOKE, "events").repartition(8).write.mode(
        "overwrite"
    ).parquet(path)
    return path


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="google.protobuf unavailable in this container; "
    "transformWithStateInPandas needs it for the state-server protocol",
)
def test_tws_running_totals_match_batch(spark, event_dir):
    """transformWithStateInPandas lifetime totals must equal the batch
    aggregate exactly (int cents), taking each user's last emission."""
    import pyspark.sql.functions as F

    from energy_data_pipeline_project_spark.streaming import jobs, tws

    stream = jobs.read_event_stream(spark, event_dir)
    got_df = jobs.run_to_memory(
        tws.running_user_totals(stream), "tws_totals", output_mode="update"
    )
    # update mode re-emits a user's row per touching batch; the final
    # state is the row with the max n_events per user
    final = {}
    for r in got_df.collect():
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur[0]:
            final[r["user_id"]] = (r["n_events"], r["value_cents"])

    batch = {
        r["user_id"]: (r["n"], r["cents"])
        for r in spark.read.parquet(event_dir)
        # anonymous events are excluded from the lifetime rollup on
        # both sides (see running_user_totals, r11 review)
        .where(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            # the guarded template (NaN/Inf/out-of-domain → NULL) —
            # the handler masks the identical bounded domain
            F.sum(money.cents("value")).alias("cents"),
        )
        .collect()
    }
    assert final == batch


def test_late_event_does_not_split_session(spark, tmp_path_factory):
    """A late-but-within-watermark event must not move the session
    frontier backwards: with state last=10:00, delivering (9:45,
    10:20) in a later batch must NOT close a session — the true gap
    10:00→10:20 is 20 min < 30. The buggy frontier (last=9:45) saw a
    fake 35-min gap and emitted a spurious split (review-pass catch).
    Two sequential availableNow runs over one checkpoint pin the
    batch boundary deterministically."""
    root = tmp_path_factory.mktemp("late-ev")
    src, ckpt, out = str(root / "src"), str(root / "ckpt"), str(root / "out")

    def write_events(rows):
        # both batches append into ONE source dir; the checkpoint
        # between run_once() calls is what pins the batch boundary
        # (a subdir param here once suggested otherwise — r06 review)
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double, props string",
        ).coalesce(1).write.mode("append").parquet(src)

    def run_once():
        stream = jobs.read_event_stream(spark, src)
        q = (
            sessionize_with_state(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    import datetime as dt

    d = dt.datetime(1995, 6, 1)
    write_events([(1, d.replace(hour=10), 7, "view", 1.0, "{}")])
    run_once()
    write_events(
        [
            (2, d.replace(hour=9, minute=45), 7, "view", 1.0, "{}"),
            (3, d.replace(hour=10, minute=20), 7, "view", 1.0, "{}"),
        ]
    )
    run_once()

    try:
        closed = (
            spark.read.parquet(out).where("user_id = 7").collect()
        )
    except Exception:  # zero closed sessions -> schema-less file sink
        closed = []
    assert closed == [], f"spurious session split: {closed}"


def test_distant_late_event_forms_its_own_session(spark, tmp_path_factory):
    """A late event more than a gap BEFORE the open session must NOT
    merge into it (start = min would emit one session with an interior
    gap over the threshold — r06 review). With state start=10:00 and a
    9:15 event arriving late (within the 1h watermark, but 45 min
    before the session start), the 9:15 event becomes its own
    single-event session — PARKED until the watermark passes
    9:15 + gap = 9:45 (an in-watermark 9:40 event could still bridge
    it into the open session — r07 review), then emitted once a third
    batch advances the watermark. The open session is untouched."""
    root = tmp_path_factory.mktemp("distant-late")
    src, ckpt, out = str(root / "src"), str(root / "ckpt"), str(root / "out")

    def write_events(rows):
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double, props string",
        ).coalesce(1).write.mode("append").parquet(src)

    def run_once():
        stream = jobs.read_event_stream(spark, src)
        q = (
            sessionize_with_state(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    import datetime as dt

    d = dt.datetime(1995, 6, 1)
    write_events([(1, d.replace(hour=10), 9, "view", 1.0, "{}")])
    run_once()
    # 9:15 is within the 1h watermark (10:00 - 1h = 9:00) but 45 min
    # before the open session's start — more than the 30-min gap
    write_events([(2, d.replace(hour=9, minute=15), 9, "view", 1.0, "{}")])
    run_once()
    # nothing emitted yet: the island is parked until the watermark
    # passes 9:45 (a 9:40 bridge could still arrive — r07 review)
    try:
        early = spark.read.parquet(out).where("user_id = 9").collect()
    except Exception:  # zero rows -> schema-less file sink
        early = []
    assert early == [], f"island emitted before its bridge window: {early}"
    # advance the watermark (other user, 12:00 -> wm 11:00 after this
    # batch), then touch user 9 so its fn runs under wm=11:00: both
    # the 9:15 island (expired 9:45) and the 10:00 session (expired
    # 10:30) close as separate 1-event sessions
    write_events([(3, d.replace(hour=12), 10, "view", 1.0, "{}")])
    run_once()
    write_events([(4, d.replace(hour=12, minute=5), 9, "view", 1.0, "{}")])
    run_once()

    closed = spark.read.parquet(out).where("user_id = 9").collect()
    got = sorted((r["n_events"], r["duration_s"]) for r in closed)
    assert got == [(1, 0.0), (1, 0.0)], closed


def test_chained_late_events_merge_into_open_session(
    spark, tmp_path_factory
):
    """Session merging is transitive: with state start=10:00 and GAP
    30 min, late events at 9:20 and 9:45 CHAIN into the open session
    (9:20→9:45 is 25 min, 9:45→10:00 is 15 min) — the batch twin emits
    ONE 3-event session. A fixed cut at start-GAP=9:30 wrongly split
    9:20 into its own session (r07 advisor). Both events sit inside
    the 1h watermark (9:00). A third batch (other user, 12:00) pushes
    the watermark past last+gap so the merged session closes and its
    n_events proves the merge."""
    root = tmp_path_factory.mktemp("chained-late")
    src, ckpt, out = str(root / "src"), str(root / "ckpt"), str(root / "out")

    def write_events(rows):
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double, props string",
        ).coalesce(1).write.mode("append").parquet(src)

    def run_once():
        stream = jobs.read_event_stream(spark, src)
        q = (
            sessionize_with_state(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    import datetime as dt

    d = dt.datetime(1995, 6, 1)
    write_events([(1, d.replace(hour=10), 11, "view", 1.0, "{}")])
    run_once()
    write_events(
        [
            (2, d.replace(hour=9, minute=20), 11, "view", 1.0, "{}"),
            (3, d.replace(hour=9, minute=45), 11, "view", 1.0, "{}"),
        ]
    )
    run_once()
    # advance the watermark past last+gap (10:30) to time the merged
    # session out; different user so it can't touch user 11's state
    write_events([(4, d.replace(hour=12), 12, "view", 1.0, "{}")])
    run_once()

    closed = spark.read.parquet(out).where("user_id = 11").collect()
    # one 3-event session spanning 9:20→10:00 (2400 s); the fixed-cut
    # bug emitted an extra 1-event session for 9:20 and a 2-event one
    assert [(r["n_events"], r["duration_s"]) for r in closed] == [
        (3, 2400.0)
    ], closed


def test_state_schema_upgrade_fails_loudly_not_silently(
    spark, tmp_path_factory
):
    """Checkpoint-upgrade pin for the r07 3→6-field STATE_SCHEMA growth
    (r08 verdict #6): restoring a checkpoint written with the LEGACY
    3-field state schema under the current sessionizer must raise the
    documented STATE_STORE_VALUE_SCHEMA_NOT_COMPATIBLE error — never silently
    restore/corrupt state. The upgrade path (fresh checkpointLocation)
    is documented at streaming/stateful.py's UPGRADE NOTE; this test
    pins that the failure mode backing that note is loud."""
    import datetime as dt

    import pandas as pd
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    from energy_data_pipeline_project_spark.streaming.stateful import (
        OUTPUT_SCHEMA,
    )

    src = str(tmp_path_factory.mktemp("ev-upg"))
    ckpt = str(tmp_path_factory.mktemp("ev-upg-ckpt"))
    out = str(tmp_path_factory.mktemp("ev-upg-out"))

    def write_events(rows):
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double, props string",
        ).coalesce(1).write.mode("append").parquet(src)

    # The pre-r07 sessionizer shape: 3-field state, same grouping and
    # watermark, trivial handler (state content is irrelevant — only
    # the schema recorded in checkpoint metadata matters here).
    legacy_state = T.StructType(
        [
            T.StructField("n_events", T.LongType()),
            T.StructField("session_start", T.DoubleType()),
            T.StructField("last_seen", T.DoubleType()),
        ]
    )

    def legacy_fn(key, batches, state):
        n = sum(len(pdf) for pdf in batches)
        prev = state.get[0] if state.exists else 0
        state.update((prev + n, 0.0, 0.0))
        yield pd.DataFrame(
            {
                "user_id": pd.Series([], dtype="int64"),
                "n_events": pd.Series([], dtype="int64"),
                "duration_s": pd.Series([], dtype="float64"),
            }
        )

    d = dt.datetime(1995, 6, 1)
    write_events([(1, d.replace(hour=10), 11, "view", 1.0, "{}")])
    q = (
        jobs.read_event_stream(spark, src)
        .withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            legacy_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=legacy_state,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # New data + the CURRENT 6-field sessionizer over the legacy
    # checkpoint: the restore must abort before any handler runs.
    write_events([(2, d.replace(hour=11), 11, "view", 1.0, "{}")])
    q2 = (
        sessionize_with_state(jobs.read_event_stream(spark, src))
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException) as exc:
        q2.awaitTermination()
    msg = str(exc.value)
    assert "SCHEMA_NOT_COMPATIBLE" in msg, msg


def test_tws_handler_masks_cents_domain_like_batch_template(spark):
    """The RunningUserTotals handler must NULL the identical bounded
    domain as the batch side's guarded cents template (functions/
    money.CENTS_TPL): NaN, ±Inf, AND out-of-domain finite magnitudes
    (|x| > CENTS_ABS_MAX). Protobuf-free: the handler is driven
    directly with a stub state handle, so this guard is exercised even
    in containers where transformWithStateInPandas itself cannot run
    (the end-to-end parity test above is protobuf-skip-gated)."""
    import pandas as pd

    from energy_data_pipeline_project_spark.streaming import tws

    class _StubValueState:
        def __init__(self):
            self._v = None

        def get(self):
            return self._v

        def update(self, v):
            self._v = tuple(v)

    class _StubHandle:
        def getValueState(self, name, schema):
            self.state = _StubValueState()
            return self.state

    values = [
        1.0,
        float("nan"),
        float("inf"),
        -float("inf"),
        1.0e15,  # finite but far out of the cents domain
        money.CENTS_ABS_MAX,  # domain edge: kept
        -money.CENTS_ABS_MAX,
        money.CENTS_ABS_MAX + 1.0,  # just past the edge: NULLed
        0.005,  # exact half-cent: HALF-UP, not pandas half-even
        None,
    ]
    # ground truth: the guarded template over the same values
    exp = spark.createDataFrame(
        [(v,) for v in values], "value double"
    ).agg(
        F.count("*").alias("n"), F.sum(money.cents("value")).alias("c")
    ).collect()[0]

    proc = tws.RunningUserTotals()
    proc.init(_StubHandle())
    (out,) = proc.handleInputRows(
        (7,), iter([pd.DataFrame({"value": values})]), None
    )
    assert int(out["n_events"][0]) == exp["n"]
    assert int(out["value_cents"][0]) == exp["c"]

    # state accumulates across batches with the same mask applied
    (out2,) = proc.handleInputRows(
        (7,), iter([pd.DataFrame({"value": [2.0, float("nan")]})]), None
    )
    assert int(out2["n_events"][0]) == exp["n"] + 2
    assert int(out2["value_cents"][0]) == exp["c"] + 200
