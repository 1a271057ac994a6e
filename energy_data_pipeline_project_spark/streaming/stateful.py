"""Custom stateful streaming operator via ``applyInPandasWithState``.

``sessionize_with_state`` maintains per-user session state (event
count, session start, last-seen time) across micro-batches and emits
one row per *closed* session — sessions close after a 30-minute gap
(detected in-batch) or when the event-time timeout fires (watermark
passed last_seen + gap with no new data).

This is the escape hatch for stateful semantics Spark's built-in
windows can't express (here: emitting rich per-session summaries —
duration, event count, first/last values — rather than windowed aggs).
State is a plain tuple per user; the watermark bounds both state size
and timeout latency, which is what keeps it runnable forever at
100 TB/day event volumes.

Batch twin for testing: the lag/gap sessionizer
(operators/relational.py::events_sessionize).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_SECONDS = 30 * 60

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("session_start", T.DoubleType()),  # epoch seconds
        T.StructField("last_seen", T.DoubleType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
    ]
)


def _sessionize_fn(
    key: tuple,
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    closed: list[tuple[int, int, float]] = []

    if state.hasTimedOut:
        n, start, last = state.get
        closed.append((user_id, n, last - start))
        state.remove()
        yield pd.DataFrame(
            closed, columns=["user_id", "n_events", "duration_s"]
        )
        return

    if state.exists:
        n, start, last = state.get
    else:
        n, start, last = 0, None, None

    ts = sorted(
        t.timestamp()
        for pdf in batches
        for t in pd.to_datetime(pdf["ts"])
    )
    # Late events before the open session belong to it only if they
    # CHAIN into it: session merging is transitive, so an event at
    # start-35min followed by one at start-20min (gap 30min) both merge
    # with the open session in the batch twin — a fixed cut at
    # start-GAP would wrongly split the first into its own session
    # (r07 advisor). Walk the sorted pre-start events backwards from
    # `start` and split only at an actual >GAP gap between consecutive
    # events; everything before that gap forms earlier island
    # session(s) that close immediately and can never merge with the
    # open session.
    if start is not None:
        before = [t for t in ts if t < start]
        split = len(before)
        frontier = start
        while split > 0 and frontier - before[split - 1] <= SESSION_GAP_SECONDS:
            split -= 1
            frontier = before[split]
        pre = before[:split]
        ts = before[split:] + [t for t in ts if t >= start]
        p_n, p_start, p_last = 0, None, None
        for t in pre:
            if p_last is not None and t - p_last > SESSION_GAP_SECONDS:
                closed.append((user_id, p_n, p_last - p_start))
                p_n, p_start = 0, t
            if p_start is None:
                p_start = t
            p_n += 1
            p_last = t
        if p_n:
            closed.append((user_id, p_n, p_last - p_start))
    for t in ts:
        if last is not None and t - last > SESSION_GAP_SECONDS:
            closed.append((user_id, n, last - start))
            n, start = 0, t
        if start is None:
            start = t
        n += 1
        # A late-but-within-watermark event (t < last) must not move
        # the session frontier backwards: that would fake a gap against
        # the NEXT event and fire the event-time timeout early. The
        # frontier is monotone; late events that chain into the open
        # session (every consecutive gap ≤ GAP — older ones split off
        # above) only extend the count and pull `start` earlier.
        start = min(start, t)
        last = t if last is None else max(last, t)

    state.update((n, start, last))
    # event-time timeout: close the session once the watermark passes
    # last_seen + gap. On backlog replay the watermark may already be
    # beyond that point — a timeout timestamp must not be in the past,
    # so clamp to just after the current watermark.
    timeout_ms = max(
        int((last + SESSION_GAP_SECONDS) * 1000),
        state.getCurrentWatermarkMs() + 1,
    )
    state.setTimeoutTimestamp(timeout_ms)
    yield pd.DataFrame(closed, columns=["user_id", "n_events", "duration_s"])


def sessionize_with_state(events: DataFrame) -> DataFrame:
    """events (streaming, with ts watermark applied upstream) →
    closed-session summaries."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
