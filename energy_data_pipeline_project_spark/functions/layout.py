"""Data-layout clustering: Z-order (Morton) keys for multi-column file
skipping.

Sorting a table by one column makes that column's per-file min/max
ranges tight (parquet scans skip files/row-groups via footer stats)
but leaves every other column's ranges spanning the whole table.
Interleaving the bits of several columns into one Morton key and
range-partitioning + sorting by it tiles the multi-dimensional space:
EVERY clustered column gets usefully narrow per-file ranges, so
predicates on any of them skip data. This is what Delta/Iceberg call
Z-ORDER clustering; on a plain-parquet lake the same effect comes from
``repartitionByRange(morton).sortWithinPartitions(morton)`` at write
time. Effectiveness is asserted on real parquet footer stats in
tests/test_layout.py.

Everything is codegen'd integer arithmetic (no UDFs): normalize each
column linearly to ``bits``-bit ints using its global min/max (one
tiny agg, broadcast as literals), then interleave bits with
shift/mask/OR terms generated at plan-build time.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

MORTON_BITS = 16  # per column; 2 cols × 16 bits = 32-bit key

from . import money as _money

# collision-proof internal key column (see skew.py's __skew_salt__)
_ZKEY = "__zorder_key__"

# corrupt-value magnitude bound for the normalization/bounds casts:
# values must survive a BIGINT cast (int64 max ≈ 9.22e18)
_LAYOUT_ABS_MAX = 9.0e18


def _normalize(col: str, lo: int, hi: int, bits: int) -> Column:
    """Scale [lo, hi] linearly onto [0, 2^bits - 1] as a BIGINT.

    The result is clamped to [0, 2^bits - 1]: the bounds are BIGINT-
    truncated, so a fractional column value above the truncated hi
    (e.g. 999.9 with hi=999) would otherwise normalize past the top
    and ``morton_key`` — which reads only the low ``bits`` bits —
    would silently wrap it into a LOW tile, giving that file a
    full-range zone map and defeating the skipping this module exists
    for (r06 review catch, confirmed empirically).

    NULL placement: a NULL column value normalizes to 0 (the bottom
    tile), pinned explicitly with NVL — Spark's GREATEST/LEAST *skip*
    NULL arguments, so without it a NULL would silently clamp to the
    TOP tile (r07 advisor). Bottom is chosen to match the
    NULLS-FIRST ordering a plain ``sortWithinPartitions`` on the raw
    column would give; NULL rows co-locate in the lowest-key files
    either way, keeping the other files' zone maps NULL-free.

    Corrupt-value placement: NaN, ±Infinity AND out-of-int64-domain
    magnitudes are nulled first (ONE spelling —
    functions/money.finite_sql with the int64 bound; the r09 diff
    review found three hand-rolled copies of the guard and a huge
    FINITE reading still aborting the BIGINT cast); one corrupt
    reading now lands in the bottom tile with the NULLs instead of
    failing the layout pass."""
    span = max(hi - lo, 1)
    top = (1 << bits) - 1
    finite = _money.finite_sql(col, bound=_LAYOUT_ABS_MAX)
    return F.expr(
        f"GREATEST(0, LEAST({top}, "
        f"NVL(CAST((({finite}"
        f" - {lo}) / {span}) * {top} "
        f"AS BIGINT), 0)))"
    )


def morton_key(norm_cols: list[Column], bits: int = MORTON_BITS) -> Column:
    """Interleave the low ``bits`` bits of the normalized columns.

    Column i's bit b lands at position ``b * n_cols + i`` — the
    classic Morton interleave, generated as a flat OR of shift/mask
    terms (pure codegen'd int ops, ~bits×cols terms).
    """
    n = len(norm_cols)
    # JVM shiftleft uses only the low 6 bits of the distance, so a key
    # wider than 63 bits would silently WRAP high bits of one column
    # into low positions of another — colliding tiles and a defeated
    # zone map, with no error (r07 review). Refuse instead.
    if bits * n > 63:
        raise ValueError(
            f"morton key needs {bits * n} bits for {n} columns x {bits}"
            " bits, over the 63-bit signed-long budget; lower `bits`"
            f" (max {63 // n} for {n} columns)"
        )
    key = F.lit(0).cast("bigint")
    for i, c in enumerate(norm_cols):
        for b in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(c, b).bitwiseAND(F.lit(1)), b * n + i
                )
            )
    return key


def cluster_write(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int,
    fmt: str = "parquet",
    bits: int = MORTON_BITS,
) -> None:
    """Write ``df`` tiled by the Morton key of ``cluster_cols``.

    One min/max aggregate over the cluster columns (a metadata-cheap
    scan) provides the normalization bounds; the write is
    range-partitioned AND sorted by the key, so each output file holds
    one contiguous Z-curve segment — a hyper-rectangle-ish tile whose
    per-column footer stats are narrow. At 100 TB, run per partition
    (e.g. per date) as part of compaction; the range partitioner's
    sampling replaces any global sort.
    """
    # keep the interleaved key inside the 63-bit signed-long budget for
    # any column count; fewer bits per column just means coarser tiles
    bits = min(bits, 63 // max(len(cluster_cols), 1))
    if _ZKEY in df.columns:
        # overwriting-then-dropping a caller-owned column would
        # silently erase it from the written table (r08 review; the
        # same collision guard skew.py carries for its salt column)
        raise ValueError(
            f"input already has a {_ZKEY} column — rename it before "
            "cluster_write"
        )
    # NaN-safe bounds: F.max treats NaN as the largest double and the
    # ANSI cast of NaN to BIGINT kills the job (verified, r08 review);
    # one corrupt sensor reading must not fail the whole layout pass.
    # nan-filtered per-column min/max keeps real bounds; NaN rows are
    # mapped to the bottom tile with the NULLs by _normalize's nanvl.
    def _finite(c: str):
        # the shared bounded guard (money.finite_sql): NaN (NOT
        # col == col — Spark SQL NaN equals itself), ±Infinity (r08
        # advisor), and out-of-int64-domain finite magnitudes (r09
        # diff review) all abort the ANSI BIGINT bounds cast; each
        # nulls out here instead
        return F.expr(_money.finite_sql(c, bound=_LAYOUT_ABS_MAX))

    bounds = df.agg(
        *[F.min(_finite(c)).cast("bigint").alias(f"lo_{c}") for c in cluster_cols],
        *[F.max(_finite(c)).cast("bigint").alias(f"hi_{c}") for c in cluster_cols],
    ).collect()[0]
    if any(
        bounds[f"lo_{c}"] is None or bounds[f"hi_{c}"] is None
        for c in cluster_cols
    ):
        # empty frame or all-NULL cluster column: there is nothing to
        # tile — write as-is instead of crashing on None arithmetic
        df.write.format(fmt).mode("overwrite").save(path)
        return
    norm = [
        _normalize(c, bounds[f"lo_{c}"], bounds[f"hi_{c}"], bits)
        for c in cluster_cols
    ]
    keyed = df.withColumn(_ZKEY, morton_key(norm, bits))
    (
        keyed.repartitionByRange(n_files, _ZKEY)
        .sortWithinPartitions(_ZKEY)
        .drop(_ZKEY)
        .write.format(fmt)
        .mode("overwrite")
        .save(path)
    )
