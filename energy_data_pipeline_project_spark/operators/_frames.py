"""Shared registry for frames persisted during plan construction.

Several operators persist an intermediate frame that feeds multiple
subplans (dedup signature/posting frames, the RI-audit key-only table
projections): without ``persist()`` each consumer re-scans the source,
and Spark has no cross-subtree common-subexpression elimination —
only identical *exchanges* are reused. A long-lived session must be
able to release these: callers invoke ``release_cached_frames()`` once
a query's result is consumed (bench does this after every query;
``dedup.release_cached_frames`` remains the public alias).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_CACHED_FRAMES: list[DataFrame] = []


def cached(df: DataFrame) -> DataFrame:
    df = df.persist()
    _CACHED_FRAMES.append(df)
    return df


def release_cached_frames() -> None:
    """Unpersist every frame cached during plan construction."""
    while _CACHED_FRAMES:
        _CACHED_FRAMES.pop().unpersist()
