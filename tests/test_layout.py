"""Z-order clustered writes must produce measurably tighter per-file
parquet footer stats on ALL clustered columns than a single-column
sort — verified on real row-group metadata via pyarrow."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pyspark.sql.functions as F

from energy_data_pipeline_project_spark.functions.layout import cluster_write


def _avg_normalized_range(path: str, col: str, lo: int, hi: int) -> float:
    """Mean (max-min)/global_span of `col` across the files' row groups."""
    spans = []
    for f in glob.glob(path + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            spans.append((st.max - st.min) / max(hi - lo, 1))
    assert spans
    return sum(spans) / len(spans)


def test_zorder_tightens_stats_on_both_columns(spark, tmp_path):
    # two independent uniform keys — the adversarial case for
    # single-column sorting
    n, files = 40_000, 16
    df = spark.range(n).select(
        (F.hash("id") % 10_000 + 10_000).alias("a"),
        (F.hash(F.col("id") + 1) % 10_000 + 10_000).alias("b"),
    )
    df.cache().count()
    try:
        sorted_path = str(tmp_path / "sorted_by_a")
        df.repartitionByRange(files, "a").sortWithinPartitions(
            "a"
        ).write.parquet(sorted_path)
        z_path = str(tmp_path / "zordered")
        cluster_write(df, z_path, ["a", "b"], n_files=files)

        lo, hi = 10_000 - 10_000, 10_000 + 10_000
        sa = _avg_normalized_range(sorted_path, "a", lo, hi)
        sb = _avg_normalized_range(sorted_path, "b", lo, hi)
        za = _avg_normalized_range(z_path, "a", lo, hi)
        zb = _avg_normalized_range(z_path, "b", lo, hi)

        # sort-by-a: a is tight, b spans ~everything
        assert sa < 0.2
        assert sb > 0.8
        # z-order: BOTH columns usefully narrow — each file is a tile
        assert za < 0.6, za
        assert zb < 0.6, zb
        # and the combined skipping power beats the single-column sort
        assert za + zb < sa + sb

        # contents unchanged
        back = spark.read.parquet(z_path)
        assert back.count() == n
        assert back.agg(F.sum("a"), F.sum("b")).collect() == df.agg(
            F.sum("a"), F.sum("b")
        ).collect()
    finally:
        # an assertion failure must not leak the cached frame into the
        # shared session (it would skew the persistent-RDD delta check
        # in test_dedup_skew — r06 review)
        df.unpersist()


def test_normalize_clamps_fractional_overflow(spark):
    """BIGINT-truncated bounds + fractional values: 999.9 with hi=999
    normalizes past 2^bits-1, and morton_key (low bits only) would
    wrap the MAX-valued row into a LOW tile, giving its file a
    full-range zone map (r06 review catch, confirmed empirically).
    The clamp must pin every normalized value inside [0, 2^bits-1]."""
    from energy_data_pipeline_project_spark.functions.layout import (
        _normalize,
    )

    df = spark.range(2_000).select(
        (900.0 + (F.hash("id") % 1000) / 10.01).alias("a")
    )
    lo, hi = df.agg(
        F.min("a").cast("bigint"), F.max("a").cast("bigint")
    ).collect()[0]
    norm = df.select(_normalize("a", lo, hi, 16).alias("n"))
    mn, mx = norm.agg(F.min("n"), F.max("n")).collect()[0]
    assert 0 <= mn and mx == (1 << 16) - 1, (mn, mx)


def test_cluster_write_empty_and_all_null_frames(spark, tmp_path):
    """Empty input (or an all-NULL cluster column) has no bounds;
    cluster_write must degrade to a plain write, not crash on None
    arithmetic (r06 review catch)."""
    empty = spark.range(0).select(
        F.col("id").alias("a"), F.col("id").alias("b")
    )
    p1 = str(tmp_path / "empty")
    cluster_write(empty, p1, ["a", "b"], n_files=4)
    assert spark.read.parquet(p1).count() == 0

    nulls = spark.range(10).select(
        F.lit(None).cast("bigint").alias("a"), F.col("id").alias("b")
    )
    p2 = str(tmp_path / "nulls")
    cluster_write(nulls, p2, ["a", "b"], n_files=4)
    assert spark.read.parquet(p2).count() == 10


def test_normalize_sends_null_to_bottom_tile(spark):
    """Spark GREATEST/LEAST *skip* NULL arguments, so an unguarded
    NULL cluster value clamped to the TOP tile (r07 advisor). The
    pinned placement is the bottom tile (0), matching NULLS-FIRST of
    a plain sort on the raw column."""
    from energy_data_pipeline_project_spark.functions.layout import (
        _normalize,
    )

    df = spark.createDataFrame(
        [(None,), (0,), (999,)], "a bigint"
    )
    rows = df.select(
        F.col("a"), _normalize("a", 0, 999, 16).alias("n")
    ).collect()
    by_a = {r["a"]: r["n"] for r in rows}
    assert by_a[None] == 0, by_a
    assert by_a[0] == 0 and by_a[999] == (1 << 16) - 1, by_a


def test_cluster_write_survives_nan_and_guards_key_collision(
    spark, tmp_path
):
    """One NaN sensor reading must not kill the layout pass: the ANSI
    CAST of NaN to BIGINT aborted both the bounds collect and the key
    build (r08 review); NaN now lands in the bottom tile with the
    NULLs. And a caller-owned column matching the internal key name
    must raise instead of being silently erased from the written
    table."""
    import math

    import pytest

    from energy_data_pipeline_project_spark.functions.layout import _ZKEY

    path = str(tmp_path / "nan_tiles")
    df = spark.createDataFrame(
        [
            (1.0, 10.0),
            (2.0, float("nan")),
            (3.0, 30.0),
            (None, 40.0),
            (float("inf"), 50.0),
            (4.0, float("-inf")),
        ],
        "a double, b double",
    )
    cluster_write(df, path, ["a", "b"], n_files=2)
    got = spark.read.parquet(path).collect()
    assert len(got) == 6
    assert sum(1 for r in got if r["b"] is not None and math.isnan(r["b"])) == 1
    # ±Inf rows survive the pass too (r08 advisor: Inf passed the
    # isnan-only filter, became the bound, and the ANSI BIGINT cast
    # aborted the write exactly like NaN used to)
    assert sum(1 for r in got if r["a"] == float("inf")) == 1
    assert sum(1 for r in got if r["b"] == float("-inf")) == 1

    with pytest.raises(ValueError, match="rename"):
        cluster_write(df.withColumn(_ZKEY, df.a), path, ["a"], n_files=1)
