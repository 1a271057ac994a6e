"""Warehouse-maintenance and advanced-analytics operators (round 3).

The data-engineering surface around a table, not just over it: CDC
snapshot diffing, incremental aggregate maintenance (the merge algebra
behind materialized views), nested document assembly for export,
Pareto-skyline extraction, higher statistical moments, robust IQR
outlier screens, and rolling DAU/MAU engagement. All pure Catalyst
expression plans with DuckDB oracle twins; cross-engine float rules per
``operators/relational.py`` (exact integer cents / power sums, plain
division for ratios, ROUND only on continuous statistics).

Reference parity anchor: the reference's gold layer is a full-refresh
daily aggregate (``/root/reference/src/transformations/silver_to_gold.py:
29-41``); ``agg_incremental_maintenance`` is the incremental form of
exactly that aggregate, and ``cdc_snapshot_diff`` is the changeset an
incremental refresh would consume.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..sources.tables import load_table
from ._frames import cached as _cached_keys
from ._registry import make_registry

QUERIES, ORACLES, query = make_registry()


# single-source cents rule (r07 review: this module re-spelled it)
from .timeseries import _CENTS_TPL as _CENTS  # noqa: E402
from .timeseries import _cents  # noqa: E402,F401
from .timeseries import _rank, _rank_expr  # noqa: E402
from ..functions.hashing import md5_int64  # noqa: E402

# ---------------------------------------------------------------------------
# CDC snapshot diff
# ---------------------------------------------------------------------------
# Two deterministic "snapshots" carved from orders simulate a day-over-
# day table pair: rows keyed %97==0 are missing from the old snapshot
# (inserts), rows keyed %89==0 are missing from the new one (deletes),
# and rows keyed %7==0 get a +5.00 price mutation (updates). The diff
# is ONE full-outer join on the primary key; at 100 TB both snapshots
# are partitioned/bucketed by key so the join is co-partitioned, and
# the output is just the changeset (unchanged rows dropped before any
# further processing).
def cdc_snapshots(orders: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The deterministic (old, new) snapshot pair carved from orders."""
    old = orders.where(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey", _cents("o_totalprice").alias("cents")
    )
    new = orders.where(F.col("o_orderkey") % 89 != 0).select(
        "o_orderkey",
        (
            _cents("o_totalprice")
            + F.when(F.col("o_orderkey") % 7 == 0, 500).otherwise(0)
        ).alias("cents"),
    )
    return old, new


@query(
    "cdc_snapshot_diff",
    f"""
    WITH old AS (
      SELECT o_orderkey, {_CENTS.format("o_totalprice")} AS cents
      FROM orders WHERE o_orderkey % 97 != 0
    ),
    new AS (
      SELECT o_orderkey,
             {_CENTS.format("o_totalprice")}
               + CASE WHEN o_orderkey % 7 = 0 THEN 500 ELSE 0 END AS cents
      FROM orders WHERE o_orderkey % 89 != 0
    )
    SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
           CASE WHEN old.o_orderkey IS NULL THEN 'insert'
                WHEN new.o_orderkey IS NULL THEN 'delete'
                ELSE 'update' END AS change_type,
           old.cents AS old_cents, new.cents AS new_cents
    FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
    WHERE old.o_orderkey IS NULL OR new.o_orderkey IS NULL
       OR old.cents != new.cents
    """,
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classify per-key changes between two table snapshots."""
    orders = load_table(spark, sf_dir, "orders")
    old, new = cdc_snapshots(orders)
    o, n = old.alias("o"), new.alias("n")
    j = o.join(n, F.col("o.o_orderkey") == F.col("n.o_orderkey"), "full_outer")
    change = (
        F.when(F.col("o.o_orderkey").isNull(), "insert")
        .when(F.col("n.o_orderkey").isNull(), "delete")
        .otherwise("update")
    )
    return j.where(
        F.col("o.o_orderkey").isNull()
        | F.col("n.o_orderkey").isNull()
        | (F.col("o.cents") != F.col("n.cents"))
    ).select(
        F.coalesce(F.col("o.o_orderkey"), F.col("n.o_orderkey")).alias(
            "o_orderkey"
        ),
        change.alias("change_type"),
        F.col("o.cents").alias("old_cents"),
        F.col("n.cents").alias("new_cents"),
    )


# MERGE INTO, Spark-first: the changefeed from ``cdc_snapshot_diff``
# is applied to the base snapshot as (base ANTI-JOIN touched-keys)
# UNION ALL (changefeed inserts+updates) — one co-partitioned shuffle
# per side, and at 100 TB the changefeed side is typically small
# enough to broadcast, making the apply a scan-plus-broadcast rather
# than a full-table rewrite. The query proves round-trip correctness
# IN-PLAN: the reconstructed snapshot is full-outer-joined against the
# true new snapshot and any divergence is counted (must be 0).
_CDC_DIFF_SQL = """
      SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
             CASE WHEN old.o_orderkey IS NULL THEN 'insert'
                  WHEN new.o_orderkey IS NULL THEN 'delete'
                  ELSE 'update' END AS change_type,
             new.cents AS new_cents
      FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
      WHERE old.o_orderkey IS NULL OR new.o_orderkey IS NULL
         OR old.cents != new.cents
"""


@query(
    "cdc_merge_apply",
    f"""
    WITH old AS (
      SELECT o_orderkey, {_CENTS.format("o_totalprice")} AS cents
      FROM orders WHERE o_orderkey % 97 != 0
    ),
    new AS (
      SELECT o_orderkey,
             {_CENTS.format("o_totalprice")}
               + CASE WHEN o_orderkey % 7 = 0 THEN 500 ELSE 0 END AS cents
      FROM orders WHERE o_orderkey % 89 != 0
    ),
    diff AS ({_CDC_DIFF_SQL}),
    merged AS (
      SELECT o.o_orderkey, o.cents FROM old o
      WHERE NOT EXISTS (SELECT 1 FROM diff d
                        WHERE d.o_orderkey = o.o_orderkey)
      UNION ALL
      SELECT o_orderkey, new_cents AS cents FROM diff
      WHERE change_type != 'delete'
    ),
    mismatch AS (
      SELECT COUNT(*) AS n FROM merged m
      FULL OUTER JOIN new n ON m.o_orderkey = n.o_orderkey
      WHERE m.o_orderkey IS NULL OR n.o_orderkey IS NULL
         OR m.cents != n.cents
    )
    SELECT
      (SELECT COUNT(*) FILTER (WHERE change_type = 'insert') FROM diff)
        AS n_inserts,
      (SELECT COUNT(*) FILTER (WHERE change_type = 'update') FROM diff)
        AS n_updates,
      (SELECT COUNT(*) FILTER (WHERE change_type = 'delete') FROM diff)
        AS n_deletes,
      (SELECT COUNT(*) FROM old) AS n_base,
      (SELECT COUNT(*) FROM merged) AS n_merged,
      (SELECT COUNT(*) FROM new) AS n_target,
      (SELECT n FROM mismatch) AS n_mismatch
    """,
)
def cdc_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a CDC changefeed to the base snapshot (MERGE semantics:
    delete touched keys, re-insert inserts+updates) and prove in-plan
    that the reconstruction equals the true new snapshot.

    One row: change counts by type, base/merged/target cardinalities,
    and the mismatch count from a full-outer equality join (always 0
    — the merge algebra is exact, not approximate)."""
    orders = load_table(spark, sf_dir, "orders")
    old, new = cdc_snapshots(orders)
    # localCheckpoint: diff (a full-outer snapshot join) feeds three
    # consumers and merged feeds two more — without materializing,
    # each reference re-runs the orders scan + full-outer shuffle
    # (r06 review catch; the single-pass-aggregate comment below is
    # only true of the COUNTING, not of un-persisted inputs).
    diff = (
        cdc_snapshot_diff(spark, sf_dir)
        .select("o_orderkey", "change_type", "new_cents")
        .localCheckpoint(eager=True)
    )
    merged = (
        old.join(diff.select("o_orderkey"), "o_orderkey", "left_anti")
        .unionAll(
            diff.where(F.col("change_type") != "delete").select(
                "o_orderkey", F.col("new_cents").alias("cents")
            )
        )
        .localCheckpoint(eager=True)
    )
    m, n = merged.alias("m"), new.alias("n")
    mismatch_rows = m.join(
        n, F.col("m.o_orderkey") == F.col("n.o_orderkey"), "full_outer"
    ).where(
        F.col("m.o_orderkey").isNull()
        | F.col("n.o_orderkey").isNull()
        | (F.col("m.cents") != F.col("n.cents"))
    )
    # One tagged union + ONE aggregate instead of five scalar frames
    # cross-joined together: every count becomes a conditional sum over
    # the same map-side-combined pass, so the final plan has no
    # 1-row-scalar joins at all.
    tagged = (
        diff.select(F.concat(F.lit("chg_"), "change_type").alias("tag"))
        .unionAll(old.select(F.lit("base").alias("tag")))
        .unionAll(merged.select(F.lit("merged").alias("tag")))
        .unionAll(new.select(F.lit("target").alias("tag")))
        .unionAll(mismatch_rows.select(F.lit("mismatch").alias("tag")))
    )

    def _n(tag: str, name: str) -> F.Column:
        return (
            F.coalesce(F.sum((F.col("tag") == tag).cast("long")), F.lit(0))
            .cast("bigint")
            .alias(name)
        )

    return tagged.agg(
        _n("chg_insert", "n_inserts"),
        _n("chg_update", "n_updates"),
        _n("chg_delete", "n_deletes"),
        _n("base", "n_base"),
        _n("merged", "n_merged"),
        _n("target", "n_target"),
        _n("mismatch", "n_mismatch"),
    )


# ---------------------------------------------------------------------------
# Incremental aggregate maintenance (materialized-view merge algebra)
# ---------------------------------------------------------------------------
# The reference recomputes its gold daily aggregate from scratch every
# run (full overwrite, silver_to_gold.py:29-41). The incremental form
# keeps yesterday's partial aggregates (SUM + COUNT are the mergeable
# state; AVG is derived at read time) and folds in only the new
# partition. Here the "base" partials cover ship dates before the
# cutoff and the "delta" batch covers the rest; merging is a UNION of
# partial-agg rows re-aggregated by pure addition. The oracle computes
# the aggregate directly over all rows — the hash match is the proof
# that the merge algebra loses nothing. At 100 TB this is the
# difference between touching one day and touching seven years.
_MAINT_CUTOFF = "2001-06-01"


@query(
    "agg_incremental_maintenance",
    f"""
    WITH rev AS (SELECT CAST(l_shipdate AS DATE) AS ship_date,
                        {_CENTS.format("l_extendedprice * (1 - l_discount)")}
                          AS cents
                 FROM lineitem)
    SELECT ship_date,
           CAST(SUM(cents) AS BIGINT) AS revenue_cents,
           COUNT(*) AS n_items,
           CAST(SUM(cents) AS DOUBLE) / 100.0 / COUNT(*) AS avg_item_value
    FROM rev GROUP BY ship_date
    """,
)
def agg_incremental_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge base partial aggregates with a delta batch; prove the merge
    against a direct full recompute (the oracle)."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.select(
        F.to_date("l_shipdate").alias("ship_date"),
        _cents("l_extendedprice * (1 - l_discount)").alias("cents"),
    )
    cutoff = F.lit(_MAINT_CUTOFF).cast("date")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("ship_date").agg(
            F.sum("cents").cast("bigint").alias("s"),
            F.count("*").alias("c"),
        )

    # TOTAL partition: a NULL ship_date (unparseable date) satisfies
    # neither `< cutoff` nor `>= cutoff` and would silently vanish
    # from the merge while the oracle keeps its NULL group — the same
    # hazard join_incremental_maintenance guards (r06 review catch).
    base = partial(rev.where(F.col("ship_date") < cutoff))
    delta = partial(
        rev.where(
            ~(F.col("ship_date") < cutoff) | F.col("ship_date").isNull()
        )
    )
    merged = (
        base.unionByName(delta)
        .groupBy("ship_date")
        .agg(F.sum("s").cast("bigint").alias("s"), F.sum("c").alias("c"))
    )
    return merged.select(
        "ship_date",
        F.col("s").alias("revenue_cents"),
        F.col("c").alias("n_items"),
        (F.col("s").cast("double") / 100.0 / F.col("c")).alias(
            "avg_item_value"
        ),
    )


# ---------------------------------------------------------------------------
# Nested document assembly (training-data export shape)
# ---------------------------------------------------------------------------
# Fan a fact table's children into one deterministic per-parent record —
# the shape every JSONL training-data export needs. The line array is
# sorted inside the aggregate (array_sort over structs: field-order
# lexicographic over ALL fields — (partkey, linenumber) alone is not
# unique in this data, so the quantity participates in the order on
# both engines), making the fingerprint independent of shuffle arrival
# order. One shuffle on the parent key;
# payload assembly is codegen'd string work, no Python.
@query(
    "nest_order_lines",
    f"""
    SELECT l_orderkey,
           COUNT(*) AS n_lines,
           CAST(SUM({_CENTS.format("l_extendedprice * (1 - l_discount)")})
                AS BIGINT) AS total_cents,
           -- NULL-safe element build: a NULL quantity NULLed the
           -- whole element, which DuckDB's array_to_string turned
           -- into a NULL fp while Spark's array_join skipped it
           -- (md5('')) — both wrong for a real line (r09 sweep).
           -- NULLS FIRST matches Spark's struct sort. The guarded
           -- cents spelling (one template, both engines — r09
           -- advisor) degrades a corrupt quantity to the same ''
           -- component instead of crashing one engine's ANSI cast.
           md5(array_to_string(
             list(
               COALESCE(CAST(l_partkey AS VARCHAR), '') || ':'
                 || COALESCE(CAST(l_linenumber AS VARCHAR), '') || ':'
                 || COALESCE(CAST({_CENTS.format("l_quantity")}
                                  AS VARCHAR), '')
               ORDER BY l_partkey NULLS FIRST, l_linenumber NULLS FIRST,
                        {_CENTS.format("l_quantity")}
                          NULLS FIRST
             ), ',')) AS lines_fp
    FROM lineitem
    GROUP BY l_orderkey
    """,
)
def nest_order_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.count("*").alias("n_lines"),
        F.sum(_cents("l_extendedprice * (1 - l_discount)"))
        .cast("bigint")
        .alias("total_cents"),
        F.md5(
            # coalesced components: see the oracle comment (r09 sweep)
            F.expr(
                "array_join(transform("
                "  array_sort(collect_list(struct("
                "    l_partkey, l_linenumber,"
                f"    {_CENTS.format('l_quantity')} AS qc))),"
                "  x -> concat(coalesce(CAST(x.l_partkey AS STRING), ''),"
                "    ':', coalesce(CAST(x.l_linenumber AS STRING), ''),"
                "    ':', coalesce(CAST(x.qc AS STRING), ''))"
                "), ',')"
            )
        ).alias("lines_fp"),
    )


# ---------------------------------------------------------------------------
# Pareto skyline (banded running-min, no global single-partition window)
# ---------------------------------------------------------------------------
# A part is on the (cheapest, smallest) skyline iff no other part is <=
# on both price and size with at least one strict <. The naive form is
# the O(n²) NOT-EXISTS dominance join (that's the oracle); the engine
# plan is linear: (1) collapse to price-grain minimum size, (2) band
# the price axis and take per-band minima — the only single-partition
# window runs over O(bands) rows, (3) within each band a partitioned
# running min completes the strict-prefix minimum. Same banded
# prefix-scan decomposition as orders_abc_classification, with MIN as
# the monoid instead of SUM; the oracle hash match proves the
# decomposition exact.
_SKYLINE_BAND_CENTS = 10_000  # $100 price bands


@query(
    "skyline_parts",
    f"""
    WITH p AS (SELECT p_partkey,
                      {_CENTS.format("p_retailprice")} AS cents,
                      p_size
               FROM part
               -- both axes must be measured: a NULL price/size row is
               -- incomparable under dominance — NULL semantics made
               -- the NOT-EXISTS oracle KEEP it while the banded
               -- decomposition dropped it AND let its NULL band
               -- corrupt the prefix minima (r10 fourth-wave sweep)
               WHERE {_CENTS.format("p_retailprice")} IS NOT NULL
                 AND p_size IS NOT NULL)
    SELECT p.p_partkey, p.cents AS price_cents, p.p_size
    FROM p
    WHERE NOT EXISTS (
      SELECT 1 FROM p q
      WHERE q.cents <= p.cents AND q.p_size <= p.p_size
        AND (q.cents < p.cents OR q.p_size < p.p_size)
    )
    """,
)
def skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    p = part.select(
        "p_partkey",
        _cents("p_retailprice").alias("cents"),
        "p_size",
    ).where("cents IS NOT NULL AND p_size IS NOT NULL")  # see oracle note
    sky = pareto_skyline(p, band_width=_SKYLINE_BAND_CENTS)
    return sky.select(
        "p_partkey", F.col("cents").alias("price_cents"), "p_size"
    )


def pareto_skyline(p: DataFrame, *, band_width: int) -> DataFrame:
    """Minimize-both skyline of ``(p_partkey, cents, p_size)`` rows via
    the banded strict-prefix running-MIN decomposition (linear, no
    global window). Property-tested against brute-force dominance in
    tests/test_properties.py."""
    # price-grain minimum: at equal price only min-size rows can survive
    gm = p.groupBy("cents").agg(F.min("p_size").alias("gmin"))
    gm = gm.withColumn("band", F.expr(f"cents DIV {int(band_width)}"))
    bmin = gm.groupBy("band").agg(F.min("gmin").alias("bm"))
    wb = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, -1)
    prefix = bmin.select("band", F.min("bm").over(wb).alias("band_prev"))
    wg = (
        Window.partitionBy("band")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    surv = (
        gm.join(F.broadcast(prefix), "band")
        .withColumn(
            "prev_min",
            F.least(
                F.coalesce(F.min("gmin").over(wg), F.lit(2**31)),
                F.coalesce(F.col("band_prev"), F.lit(2**31)),
            ),
        )
        # dominated iff some strictly-cheaper price reached size <= gmin
        .where(F.col("gmin") < F.col("prev_min"))
        .select("cents", "gmin")
    )
    return p.join(surv, "cents").where(F.col("p_size") == F.col("gmin"))


# ---------------------------------------------------------------------------
# Higher statistical moments from exact integer power sums
# ---------------------------------------------------------------------------
# Skewness, excess kurtosis, and cross-correlation computed from exact
# int64 power sums (x ≤ 50 units, y ≤ ~2e5 dollars, so x⁴ and y² sums
# stay within int64 up to ~sf10) — one map-side-combined aggregation
# pass, then a fixed IEEE expression over the exact sums, identical
# text in both engines, ROUND(…, 4) on the continuous outputs only.
# This is the profile pass a curation pipeline runs per column to pick
# clipping/normalization constants.
#
# Guarded whole-unit spellings (one text, both engines — the same
# anti-drift contract as money.cents_sql; r10 diff review: these were
# the last raw money spellings, and a NaN/Inf reading crashed the ANSI
# BIGINT cast in BOTH engines — agreement-by-crash, the posture
# money.py names as wrong). Bounds are MOMENT bounds, not cast bounds:
# x⁴ at 5e4 is 6.25e18 and y² at 3e7 is 9e14 — each exact power
# product stays inside int64 at row grain.


def _whole_units(expr_sql: str, bound: float) -> str:
    from ..functions.money import finite_sql

    return f"CAST(ROUND({finite_sql(expr_sql, bound=bound)}, 0) AS BIGINT)"


# ONE named bound per column (r10 third review: the quantity bound was
# a magic literal at three sites — a future adjustment editing one
# copy would make discount-effect NULL a different domain than the
# moments query, the exact drift class the guarded templates end).
_QTY_ABS_MAX = 5.0e4
_MOM_X = _whole_units("l_quantity", _QTY_ABS_MAX)
_MOM_Y = _whole_units("l_extendedprice", 3.0e7)


# the moment doubles as ONE spelling each — the CASE gates below must
# evaluate the IDENTICAL IEEE tree the readouts divide by (the
# _OLS_SLOPE precedent; r11 fuzz seed 129)
_HM_MX = "(CAST(sx AS DOUBLE) / n)"
_HM_MY = "(CAST(sy AS DOUBLE) / n)"
_HM_M2X = f"(CAST(sxx AS DOUBLE) / n - {_HM_MX} * {_HM_MX})"
_HM_M2Y = f"(CAST(syy AS DOUBLE) / n - {_HM_MY} * {_HM_MY})"
_HM_M3 = (
    f"(CAST(sxxx AS DOUBLE) / n - 3 * {_HM_MX} * (CAST(sxx AS DOUBLE) / n)"
    f" + 2 * {_HM_MX} * {_HM_MX} * {_HM_MX})"
)
_HM_M4 = (
    f"(CAST(sxxxx AS DOUBLE) / n - 4 * {_HM_MX} * (CAST(sxxx AS DOUBLE) / n)"
    f" + 6 * {_HM_MX} * {_HM_MX} * (CAST(sxx AS DOUBLE) / n)"
    f" - 3 * pow({_HM_MX}, 4.0))"
)
_HM_X_VARIES = f"(mnx <> mxx AND {_HM_M2X} <> 0)"
_HM_Y_VARIES = f"(mny <> mxy AND {_HM_M2Y} <> 0)"


@query(
    "agg_higher_moments",
    f"""
    WITH s AS (
      SELECT l_returnflag, COUNT(*) AS n,
             SUM({_MOM_X}) AS sx,
             SUM({_MOM_X} * {_MOM_X}) AS sxx,
             SUM({_MOM_X} * {_MOM_X} * {_MOM_X}) AS sxxx,
             SUM({_MOM_X} * {_MOM_X} * {_MOM_X} * {_MOM_X}) AS sxxxx,
             SUM({_MOM_Y}) AS sy,
             SUM({_MOM_Y} * {_MOM_Y}) AS syy,
             SUM({_MOM_X} * {_MOM_Y}) AS sxy,
             MIN({_MOM_X}) AS mnx,
             MAX({_MOM_X}) AS mxx,
             MIN({_MOM_Y}) AS mny,
             MAX({_MOM_Y}) AS mxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           {_HM_MX} AS mean_qty,
           CASE WHEN {_HM_X_VARIES} THEN
             ROUND({_HM_M3} / pow({_HM_M2X}, 1.5), 4)
           END AS skew_qty,
           CASE WHEN {_HM_X_VARIES} THEN
             ROUND({_HM_M4} / pow({_HM_M2X}, 2.0) - 3.0, 4)
           END AS kurt_qty,
           CASE WHEN {_HM_X_VARIES} AND {_HM_Y_VARIES}
                 AND {_HM_M2X} * {_HM_M2Y} > 0 THEN
             ROUND((CAST(sxy AS DOUBLE) / n - {_HM_MX} * {_HM_MY})
                   / sqrt({_HM_M2X} * {_HM_M2Y}), 4)
           END AS corr_qty_price
    FROM s
    """,
)
def agg_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x = F.expr(_MOM_X)
    y = F.expr(_MOM_Y)

    # Power sums in DECIMAL(38,0): each per-row power product stays in
    # int64 at the guard bound (x⁴ = 6.25e18, y² = 9e14), but the SUM
    # does not — two max-domain readings in one group overflow a
    # BIGINT sxxxx, which Spark ANSI aborts while DuckDB's SUM(BIGINT)
    # silently promotes to HUGEINT and answers (r10 third review: the
    # crash-vs-answer split the guard was added to end). The sums are
    # consumed only through CAST(... AS DOUBLE), so DECIMAL(38,0) and
    # HUGEINT carry the same exact integers to the same doubles — the
    # z-score precedent (timeseries.anomaly_from_daily).
    def dsum(col: F.Column) -> F.Column:
        return F.sum(col.cast("decimal(38,0)"))

    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        dsum(x).alias("sx"),
        dsum(x * x).alias("sxx"),
        dsum(x * x * x).alias("sxxx"),
        dsum(x * x * x * x).alias("sxxxx"),
        dsum(y).alias("sy"),
        dsum(y * y).alias("syy"),
        dsum(x * y).alias("sxy"),
        F.min(x).alias("mnx"),
        F.max(x).alias("mxx"),
        F.min(y).alias("mny"),
        F.max(y).alias("mxy"),
    )
    d = lambda c: F.col(c).cast("double") / F.col("n")  # noqa: E731
    mx, my = d("sx"), d("sy")
    m2x = d("sxx") - mx * mx
    m2y = d("syy") - my * my
    m3 = d("sxxx") - 3 * mx * d("sxx") + 2 * mx * mx * mx
    m4 = (
        d("sxxxx")
        - 4 * mx * d("sxxx")
        + 6 * mx * mx * d("sxx")
        - 3 * F.pow(mx, F.lit(4.0))
    )
    # Zero-variance gates, the _OLS_SLOPE spelling (relational.py):
    # a constant-x group has pow(m2x, 1.5) = 0 and Spark's ANSI double
    # division aborts the job where DuckDB answers (r11 fuzz seed 129
    # — a fuzz returnflag seen on exactly one row). Exact MIN<>MAX
    # witness AND the IDENTICAL IEEE denominator tree both engines
    # evaluate; undefined moments are NULL, never a dead job.
    x_varies = (F.col("mnx") != F.col("mxx")) & (m2x != 0)
    y_varies = (F.col("mny") != F.col("mxy")) & (m2y != 0)
    return s.select(
        "l_returnflag",
        "n",
        mx.alias("mean_qty"),
        F.when(x_varies, F.round(m3 / F.pow(m2x, F.lit(1.5)), 4)).alias(
            "skew_qty"
        ),
        F.when(
            x_varies, F.round(m4 / F.pow(m2x, F.lit(2.0)) - 3.0, 4)
        ).alias("kurt_qty"),
        F.when(
            x_varies & y_varies & (m2x * m2y > 0),
            F.round((d("sxy") - mx * my) / F.sqrt(m2x * m2y), 4),
        ).alias("corr_qty_price"),
    )


# ---------------------------------------------------------------------------
# Robust IQR outlier screen (Tukey fences on exact integer ranks)
# ---------------------------------------------------------------------------
# The robust companion to events_anomaly_zscore: quartiles come off the
# value-grain CDF (same decomposition as events_quantile_histogram —
# windows partitioned by series, cum counts over the value grain, rank
# k = (q·n+99) DIV 100 in pure int arithmetic), fences are Tukey's
# 1.5×IQR kept exact by scaling the comparison by 2 (no float halves).
@query(
    "events_outlier_iqr",
    f"""
    WITH v AS (
      SELECT event_type, {_CENTS.format("value")} AS cents,
             COUNT(*) AS cnt
      FROM events
      WHERE {_CENTS.format("value")} IS NOT NULL
      GROUP BY 1, 2
    ),
    c AS (
      SELECT event_type, cents, cnt,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY cents) AS cum,
             SUM(cnt) OVER (PARTITION BY event_type) AS n
      FROM v
    ),
    q AS (
      SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
             MIN(CASE WHEN cum >= {_rank_expr(25, duck=True)}
                      THEN cents END) AS q1,
             MIN(CASE WHEN cum >= {_rank_expr(75, duck=True)}
                      THEN cents END) AS q3
      FROM c GROUP BY event_type
    )
    SELECT q.event_type, q.n, q.q1 AS q1_cents, q.q3 AS q3_cents,
           CAST(COALESCE(SUM(CASE WHEN 2 * v.cents > 2 * q.q3 + 3 * (q.q3 - q.q1)
                              OR 2 * v.cents < 2 * q.q1 - 3 * (q.q3 - q.q1)
                         THEN v.cnt ELSE 0 END), 0) AS BIGINT) AS n_outliers
    FROM q JOIN v ON q.event_type = v.event_type
    GROUP BY q.event_type, q.n, q.q1, q.q3
    """,
)
def events_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # persisted: the value-grain frame feeds BOTH the quartile
    # derivation and the final outlier join — without it the full
    # events aggregation ran twice (r07 review; the RI-audit lesson)
    # unmeasurable readings (NULL/NaN/Inf -> NULL cents) are excluded
    # from the CDF and its n: a NULL cents grain would rank NULLS FIRST
    # in Spark windows but NULLS LAST in DuckDB, shifting every
    # quartile (r09 degenerate sweep; oracle's v CTE carries the same
    # filter)
    v = _cached_keys(
        ev.where(_cents("value").isNotNull())
        .groupBy("event_type", _cents("value").alias("cents"))
        .agg(F.count("*").alias("cnt"))
    )
    # the CDF prefix runs range-SLICED (functions/windows, r11 window
    # audit): the value grain compresses events to distinct cents per
    # type, but at 100 TB one dominant type's grain is still too large
    # for a one-task-per-type sort; per-type totals come from a plain
    # aggregate joined back (broadcast — one row per type)
    from ..functions.windows import sliced_prefix_sum

    totals = v.groupBy("event_type").agg(F.sum("cnt").alias("n"))
    cdf = sliced_prefix_sum(
        v, ["event_type"], [F.col("cents")], "cnt", "cum"
    )
    # null-SAFE: NULL event_type is a group (the windowed form grouped
    # it; a plain equi-join would silently drop it — the r11 fuzz
    # lesson)
    c = cdf.join(
        F.broadcast(totals.withColumnRenamed("event_type", "__et")),
        cdf["event_type"].eqNullSafe(F.col("__et")),
    ).drop("__et")
    # quartile ranks via the ONE ceil-rank spelling (timeseries._rank,
    # single-sourced in r07 precisely so the convention can't drift per
    # copy — this was a fifth inline respelling, r08 review)
    qq = c.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.min(F.when(F.col("cum") >= _rank(25), F.col("cents"))).alias("q1"),
        F.min(F.when(F.col("cum") >= _rank(75), F.col("cents"))).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    is_out = (2 * F.col("cents") > 2 * F.col("q3") + 3 * iqr) | (
        2 * F.col("cents") < 2 * F.col("q1") - 3 * iqr
    )
    return (
        qq.join(v, "event_type")
        .groupBy("event_type", "n", "q1", "q3")
        .agg(
            F.coalesce(
                F.sum(F.when(is_out, F.col("cnt")).otherwise(0)), F.lit(0)
            )
            .cast("bigint")
            .alias("n_outliers")
        )
        .select(
            "event_type",
            "n",
            F.col("q1").alias("q1_cents"),
            F.col("q3").alias("q3_cents"),
            "n_outliers",
        )
    )


# ---------------------------------------------------------------------------
# Rolling 28-day DAU / MAU engagement (distinct-over-sliding-window)
# ---------------------------------------------------------------------------
# COUNT(DISTINCT) over a sliding window can't be windowed directly —
# distinct is not a mergeable frame aggregate. The distributed trick:
# dedup to the (user, day) grain, then each active day CONTRIBUTES to
# the 28 target days it falls inside (a bounded ×28 explode on the
# deduped grain, not on raw events), and the rolling distinct becomes a
# plain COUNT(DISTINCT user) per target day. Stickiness = DAU/MAU as a
# plain division of exact ints.
_DM_EPOCH = "2024-01-01"
_DM_WINDOW = 28


@query(
    "events_dau_mau",
    f"""
    WITH ud AS (
      -- a NULL user is not a user: COUNT(DISTINCT) skips it while
      -- COUNT(*) counted it, so a window whose only activity is
      -- anonymous rows divided DAU>0 by MAU=0 — Spark ANSI aborted
      -- the job (r11 fuzz hunt seed 37); with the filter, every
      -- contrib target has MAU >= 1 by construction
      SELECT DISTINCT user_id,
             date_diff('day', DATE '{_DM_EPOCH}', CAST(ts AS DATE)) AS day_no
      FROM events WHERE user_id IS NOT NULL
    ),
    b AS (SELECT MAX(day_no) AS hi FROM ud),
    contrib AS (
      SELECT ud.user_id, t.target
      FROM ud, b,
           LATERAL (SELECT unnest(generate_series(ud.day_no,
                                 ud.day_no + {_DM_WINDOW - 1})) AS target) t
      WHERE t.target <= b.hi
    ),
    mau AS (SELECT target, COUNT(DISTINCT user_id) AS mau
            FROM contrib GROUP BY target),
    dau AS (SELECT day_no, COUNT(*) AS dau FROM ud GROUP BY day_no)
    SELECT DATE '{_DM_EPOCH}' + CAST(mau.target AS INT) AS d,
           COALESCE(dau.dau, 0) AS dau, mau.mau,
           CAST(COALESCE(dau.dau, 0) AS DOUBLE) / mau.mau AS stickiness
    FROM mau LEFT JOIN dau ON mau.target = dau.day_no
    """,
)
def events_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # NULL users excluded — see the oracle's ud note (r11 fuzz hunt)
    ud = ev.where(F.col("user_id").isNotNull()).select(
        "user_id",
        F.datediff(
            F.to_date("ts"), F.lit(_DM_EPOCH).cast("date")
        ).alias("day_no"),
    ).distinct()
    bounds = ud.agg(F.max("day_no").alias("hi"))
    contrib = (
        ud.crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            F.explode(
                F.sequence(
                    F.col("day_no"), F.col("day_no") + (_DM_WINDOW - 1)
                )
            ).alias("target"),
            "hi",
        )
        .where(F.col("target") <= F.col("hi"))
    )
    mau = contrib.groupBy("target").agg(
        F.countDistinct("user_id").alias("mau")
    )
    dau = ud.groupBy("day_no").agg(F.count("*").alias("dau"))
    j = mau.join(dau, mau.target == dau.day_no, "left")
    dau_c = F.coalesce(F.col("dau"), F.lit(0))
    return j.select(
        F.date_add(
            F.lit(_DM_EPOCH).cast("date"), F.col("target").cast("int")
        ).alias("d"),
        dau_c.alias("dau"),
        "mau",
        (dau_c.cast("double") / F.col("mau")).alias("stickiness"),
    )


# The documented scale variant of events_dau_mau (VERDICT r03 flagged
# the exact formulation perf-weak at the 1000x bar: its ×28 explode
# grows with active (user, day) pairs). Here the ×28 explode runs on
# the DAILY HLL SKETCH frame — one KB-sized row per day regardless of
# corpus size — and the rolling 28-day distinct becomes
# hll_union_agg of 28 sketches per target day. At 100 TB the contrib
# frame is 365×28 rows/year of sketches vs billions of (user, day)
# pairs. No DuckDB oracle: DataSketches estimates are engine-specific
# (driver records the rows-only check); the estimate-vs-exact error
# is gated by tests/test_approx_estimators.py::test_dau_mau_sketch_error.
# Stickiness is emitted in basis points of the two estimates (both
# exact BIGINTs from hll_sketch_estimate) via integer division.
@query("events_dau_mau_sketch")
def events_dau_mau_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 28-day DAU/MAU from mergeable daily HLL sketches."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.datediff(F.to_date("ts"), F.lit(_DM_EPOCH).cast("date")).alias(
            "day_no"
        )
    ).agg(F.expr("hll_sketch_agg(user_id)").alias("sk"))
    bounds = daily.agg(F.max("day_no").alias("hi"))
    contrib = (
        daily.crossJoin(F.broadcast(bounds))
        .select(
            "sk",
            F.explode(
                F.sequence(
                    F.col("day_no"), F.col("day_no") + (_DM_WINDOW - 1)
                )
            ).alias("target"),
            "hi",
        )
        .where(F.col("target") <= F.col("hi"))
    )
    mau = contrib.groupBy("target").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("mau_est")
    )
    dau = daily.select(
        "day_no", F.expr("hll_sketch_estimate(sk)").alias("dau_est")
    )
    j = mau.join(dau, mau.target == dau.day_no, "left")
    dau_c = F.coalesce(F.col("dau_est"), F.lit(0))
    return j.select(
        F.date_add(
            F.lit(_DM_EPOCH).cast("date"), F.col("target").cast("int")
        ).alias("d"),
        dau_c.alias("dau_est"),
        "mau_est",
        F.expr(
            "(COALESCE(dau_est, 0) * 10000L) div mau_est"
        ).alias("stickiness_bp"),
    )


# ---------------------------------------------------------------------------
# RFM customer segmentation (fixed rubric, pure expressions)
# ---------------------------------------------------------------------------
# Recency / Frequency / Monetary scoring — the standard CRM
# segmentation. This variant uses a FIXED business rubric (day/count/
# cents thresholds), which is how RFM is deployed in practice and
# keeps the whole query one aggregation + one broadcast snapshot date
# with zero windows; a quantile-calibrated rubric would reuse the
# value-grain CDF machinery of events_quantile_histogram to derive
# the cut points first. All inputs exact ints.
_RFM_R = (180, 540, 1080)  # days: <=180 → 4, <=540 → 3, <=1080 → 2
_RFM_F = (12, 9, 6)  # orders: >=12 → 4, >=9 → 3, >=6 → 2
_RFM_M = (200_000_000, 120_000_000, 60_000_000)  # cents


@query(
    "orders_rfm_segments",
    f"""
    WITH snap AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS today FROM orders),
    c AS (
      SELECT o_custkey,
             date_diff('day', MAX(CAST(o_orderdate AS DATE)),
                       (SELECT today FROM snap)) AS r_days,
             COUNT(*) AS n_orders,
             CAST(SUM({_CENTS.format("o_totalprice")}) AS BIGINT)
               AS m_cents
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, r_days, n_orders, m_cents,
           CASE WHEN r_days <= {_RFM_R[0]} THEN 4
                WHEN r_days <= {_RFM_R[1]} THEN 3
                WHEN r_days <= {_RFM_R[2]} THEN 2 ELSE 1 END AS r_score,
           CASE WHEN n_orders >= {_RFM_F[0]} THEN 4
                WHEN n_orders >= {_RFM_F[1]} THEN 3
                WHEN n_orders >= {_RFM_F[2]} THEN 2 ELSE 1 END AS f_score,
           CASE WHEN m_cents >= {_RFM_M[0]} THEN 4
                WHEN m_cents >= {_RFM_M[1]} THEN 3
                WHEN m_cents >= {_RFM_M[2]} THEN 2 ELSE 1 END AS m_score
    FROM c
    """,
)
def orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    snap = orders.agg(F.max(F.to_date("o_orderdate")).alias("today"))
    c = (
        orders.groupBy("o_custkey")
        .agg(
            F.max(F.to_date("o_orderdate")).alias("last_order"),
            F.count("*").alias("n_orders"),
            F.sum(_cents("o_totalprice")).cast("bigint").alias("m_cents"),
        )
        .crossJoin(F.broadcast(snap))
        .withColumn("r_days", F.datediff("today", "last_order"))
    )

    def score(col: str, cuts: tuple, *, asc: bool) -> F.Column:
        op = (lambda a, b: a <= b) if asc else (lambda a, b: a >= b)
        return (
            F.when(op(F.col(col), cuts[0]), 4)
            .when(op(F.col(col), cuts[1]), 3)
            .when(op(F.col(col), cuts[2]), 2)
            .otherwise(1)
        )

    return c.select(
        "o_custkey",
        "r_days",
        "n_orders",
        "m_cents",
        score("r_days", _RFM_R, asc=True).alias("r_score"),
        score("n_orders", _RFM_F, asc=False).alias("f_score"),
        score("m_cents", _RFM_M, asc=False).alias("m_score"),
    )


# ---------------------------------------------------------------------------
# Year-over-year growth (month grain self-join on shifted key)
# ---------------------------------------------------------------------------
# The reporting staple: each month's revenue against the same month a
# year earlier. Month keys are exact integers (year*12 + month), the
# YoY pairing is an equi-join on key-12 over the TINY month-grain
# aggregate (83 months here; thousands at most in any corpus), and the
# growth ratio is a plain division of exact cents. Raw data is
# touched exactly once.
@query(
    "lineitem_yoy_growth",
    f"""
    WITH m AS (
      SELECT year(l_shipdate) * 12 + month(l_shipdate) - 1 AS mkey,
             MIN(CAST(date_trunc('month', l_shipdate) AS DATE)) AS month_start,
             CAST(SUM({_CENTS.format("l_extendedprice * (1 - l_discount)")})
                  AS BIGINT) AS rev_cents
      FROM lineitem GROUP BY 1
    )
    SELECT cur.month_start, cur.rev_cents, prev.rev_cents AS prev_rev_cents,
           -- NULLIF: a prior-year month netting to EXACTLY zero cents
           -- (credits cancel sales) made Spark's ANSI double division
           -- abort where DuckDB answered (r11 fuzz seed 81); an
           -- undefined ratio is NULL, never a dead job
           CAST(cur.rev_cents AS DOUBLE) / NULLIF(prev.rev_cents, 0)
             AS yoy_ratio
    FROM m cur JOIN m prev ON cur.mkey = prev.mkey + 12
    """,
)
def lineitem_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    m = li.groupBy(
        (
            F.year("l_shipdate") * 12 + F.month("l_shipdate") - 1
        ).alias("mkey")
    ).agg(
        F.min(F.date_trunc("month", "l_shipdate").cast("date")).alias(
            "month_start"
        ),
        F.sum(_cents("l_extendedprice * (1 - l_discount)"))
        .cast("bigint")
        .alias("rev_cents"),
    )
    cur, prev = m.alias("cur"), m.alias("prev")
    return cur.join(
        prev, F.col("cur.mkey") == F.col("prev.mkey") + 12
    ).select(
        F.col("cur.month_start").alias("month_start"),
        F.col("cur.rev_cents").alias("rev_cents"),
        F.col("prev.rev_cents").alias("prev_rev_cents"),
        (
            F.col("cur.rev_cents").cast("double")
            # see the oracle's NULLIF note (r11 fuzz seed 81)
            / F.nullif(F.col("prev.rev_cents"), F.lit(0))
        ).alias("yoy_ratio"),
    )


# ---------------------------------------------------------------------------
# Backlog aging report (open orders bucketed by age at snapshot)
# ---------------------------------------------------------------------------
# Operational aging: open orders ('O') bucketed by quarters outstanding
# at the corpus snapshot date (broadcast 1-row max — never a driver
# collect), counts and exposure per bucket, buckets capped so the
# report width is fixed regardless of history depth. Pure integer
# bucketing; one pushed-filter scan + one tiny aggregation.
_AGING_BUCKET_DAYS = 90
_AGING_MAX_BUCKET = 8


@query(
    "orders_backlog_aging",
    f"""
    WITH snap AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS today FROM orders),
    o AS (
      SELECT LEAST(date_diff('day', CAST(o_orderdate AS DATE),
                             (SELECT today FROM snap))
                   // {_AGING_BUCKET_DAYS}, {_AGING_MAX_BUCKET}) AS age_bucket,
             {_CENTS.format("o_totalprice")} AS cents
      FROM orders WHERE o_orderstatus = 'O'
    )
    SELECT age_bucket, COUNT(*) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM o GROUP BY age_bucket
    """,
)
def orders_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    snap = orders.agg(F.max(F.to_date("o_orderdate")).alias("today"))
    o = (
        orders.where(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(snap))
        .select(
            F.least(
                F.floor(
                    F.datediff("today", F.to_date("o_orderdate"))
                    / _AGING_BUCKET_DAYS
                ),
                F.lit(_AGING_MAX_BUCKET),
            )
            .cast("bigint")
            .alias("age_bucket"),
            _cents("o_totalprice").alias("cents"),
        )
    )
    return o.groupBy("age_bucket").agg(
        F.count("*").alias("n_orders"),
        F.sum("cents").cast("bigint").alias("total_cents"),
    )


# ---------------------------------------------------------------------------
# Shipping SLA breaches (order-to-first-ship lag by priority)
# ---------------------------------------------------------------------------
# Fulfilment ops: per priority class, how many orders shipped their
# first line late? First-ship is a MIN aggregate on the child table
# (one shuffle on the order key), the lag an exact integer day diff,
# and the breach share an exact-int ratio. The child aggregate joins
# the parent on its key — co-partitionable at scale like every
# PK/FK join here.
_SLA_DAYS = 60


@query(
    "orders_shipping_sla",
    f"""
    WITH fs AS (
      SELECT l_orderkey, MIN(CAST(l_shipdate AS DATE)) AS first_ship
      FROM lineitem GROUP BY l_orderkey
    ),
    lag AS (
      SELECT o.o_orderpriority,
             date_diff('day', CAST(o.o_orderdate AS DATE), fs.first_ship)
               AS lag_days
      FROM orders o JOIN fs ON o.o_orderkey = fs.l_orderkey
    )
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CASE WHEN lag_days > {_SLA_DAYS} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_breaches,
           CAST(SUM(CASE WHEN lag_days > {_SLA_DAYS} THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS breach_share,
           MAX(lag_days) AS max_lag_days
    FROM lag GROUP BY o_orderpriority
    """,
)
def orders_shipping_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    fs = li.groupBy("l_orderkey").agg(
        F.min(F.to_date("l_shipdate")).alias("first_ship")
    )
    lag = orders.join(
        fs, orders["o_orderkey"] == fs["l_orderkey"]
    ).select(
        "o_orderpriority",
        F.datediff("first_ship", F.to_date("o_orderdate")).alias("lag_days"),
    )
    breach = F.sum(F.when(F.col("lag_days") > _SLA_DAYS, 1).otherwise(0))
    return lag.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        breach.cast("bigint").alias("n_breaches"),
        (breach.cast("double") / F.count("*")).alias("breach_share"),
        F.max("lag_days").alias("max_lag_days"),
    )


# ---------------------------------------------------------------------------
# k-anonymity risk report (privacy screen before data release)
# ---------------------------------------------------------------------------
# Before a table (or training corpus) ships, the privacy question is:
# how many rows sit in quasi-identifier groups smaller than k — i.e.
# re-identifiable by combining public-ish attributes? The QI tuple
# here is (event_type, value decile band, day); the report gives, per
# event_type, the row count, the share of rows in sub-k groups, and
# the smallest group size. One groupBy to the QI grain, one roll-up —
# the grain is bounded by the QI domain product, never by row count —
# and every share is an exact-int ratio.
_KANON_K = 10
_KANON_BAND = 50_00  # value cents per band (~deciles of the 0-500 range)


@query(
    "events_kanonymity_risk",
    f"""
    WITH qi AS (
      SELECT event_type,
             {_CENTS.format("value")} // {_KANON_BAND} AS band,
             CAST(ts AS DATE) AS d,
             COUNT(*) AS grp
      FROM events GROUP BY 1, 2, 3
    )
    SELECT event_type,
           CAST(SUM(grp) AS BIGINT) AS n_rows,
           COUNT(*) AS n_groups,
           CAST(SUM(CASE WHEN grp < {_KANON_K} THEN grp ELSE 0 END)
                AS BIGINT) AS n_risky_rows,
           CAST(SUM(CASE WHEN grp < {_KANON_K} THEN grp ELSE 0 END)
                AS DOUBLE) / SUM(grp) AS risky_share,
           MIN(grp) AS min_group
    FROM qi GROUP BY event_type
    """,
)
def events_kanonymity_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    qi = ev.groupBy(
        "event_type",
        F.expr(f"{_CENTS.format('value')} DIV {_KANON_BAND}").alias(
            "band"
        ),
        F.to_date("ts").alias("d"),
    ).agg(F.count("*").alias("grp"))
    risky = F.sum(
        F.when(F.col("grp") < _KANON_K, F.col("grp")).otherwise(0)
    )
    return qi.groupBy("event_type").agg(
        F.sum("grp").cast("bigint").alias("n_rows"),
        F.count("*").alias("n_groups"),
        risky.cast("bigint").alias("n_risky_rows"),
        (risky.cast("double") / F.sum("grp")).alias("risky_share"),
        F.min("grp").alias("min_group"),
    )


# ---------------------------------------------------------------------------
# Item-item co-occurrence cosine (collaborative-filtering primitive)
# ---------------------------------------------------------------------------
# "Customers who bought A also bought B": cosine similarity between
# parts over order baskets, sim = c_ab / sqrt(n_a · n_b) from exact
# integer co-occurrence counts. Pair space is bounded per basket (the
# basket_part_pairs guard); part frequencies join back as two
# broadcastable id→count frames. Ranking runs on the exact integer
# key c_ab² vs n_a·n_b? No — the ROUNDED cosine + part ids order the
# output deterministically, and the top-k window partitions by part_a.
_CF_MIN_CO = 3
_CF_TOP_K = 5


@query(
    "basket_part_cosine",
    f"""
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    freq AS (SELECT l_partkey, COUNT(*) AS n FROM b GROUP BY l_partkey),
    co AS (
      SELECT a.l_partkey AS part_a, b2.l_partkey AS part_b,
             COUNT(*) AS c
      FROM b a JOIN b b2
        ON a.l_orderkey = b2.l_orderkey AND a.l_partkey != b2.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= {_CF_MIN_CO}
    ),
    scored AS (
      SELECT co.part_a, co.part_b, co.c,
             co.c / sqrt(CAST(fa.n AS DOUBLE) * fb.n) AS cosine
      FROM co JOIN freq fa ON co.part_a = fa.l_partkey
              JOIN freq fb ON co.part_b = fb.l_partkey
    ),
    ranked AS (
      SELECT part_a, part_b, c, cosine,
             ROW_NUMBER() OVER (PARTITION BY part_a
                                ORDER BY cosine DESC, part_b) AS rn
      FROM scored
    )
    SELECT part_a, part_b, c AS cooccur, cosine, CAST(rn AS INT) AS rank
    FROM ranked WHERE rn <= {_CF_TOP_K}
    """,
)
def basket_part_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select("l_orderkey", "l_partkey").distinct()
    freq = b.groupBy("l_partkey").agg(F.count("*").alias("n"))
    a = b.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a"))
    c2 = b.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b"))
    co = (
        a.join(c2, "ok")
        .where(F.col("part_a") != F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") >= _CF_MIN_CO)
    )
    fa = freq.select(F.col("l_partkey").alias("part_a"), F.col("n").alias("na"))
    fb = freq.select(F.col("l_partkey").alias("part_b"), F.col("n").alias("nb"))
    # RAW cosine, no ROUND: c/na/nb are exact ints and both engines run
    # the identical IEEE tree (cast, multiply, sqrt, divide), so the
    # raw double is bit-identical — while ROUND(double, 6) itself
    # diverges on decimal half-ties (Spark shortest-repr HALF_UP vs
    # DuckDB binary round; the r07-confirmed class this repo removed
    # from every ANN cosine in r08). The rounded value was also the
    # RANKING key, so a half-tie could flip top-5 membership (r08
    # review). freq is part-count sized (sf-GROWING): no broadcast
    # hint — AQE upgrades at test scale.
    scored = (
        co.join(fa, "part_a")
        .join(fb, "part_b")
        .select(
            "part_a",
            "part_b",
            "c",
            (
                F.col("c")
                / F.sqrt(F.col("na").cast("double") * F.col("nb"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("part_a").orderBy(F.desc("cosine"), "part_b")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _CF_TOP_K)
        .select(
            "part_a",
            "part_b",
            F.col("c").alias("cooccur"),
            "cosine",
            F.col("rn").cast("int").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# Behavioral signatures (event-type bitmask segmentation)
# ---------------------------------------------------------------------------
# Segment users by WHICH event types they ever emit, as a fixed-order
# bitmask — the compact behavioral fingerprint that feeds cohort
# dashboards ("how many users view+click but never purchase?"). One
# aggregation to (user, mask) via bitwise OR of fixed per-type bits,
# one roll-up per mask. Pure integer arithmetic; the mask bit order is
# a frozen constant list shared with the oracle.
_SIG_TYPES = ("click", "error", "purchase", "signup", "view")
# A 2-day observation slice: over the full 30-day corpus every user
# hits every type (one degenerate mask); a short window is also the
# realistic deployment (signatures are computed per recent period).
_SIG_CUTOFF = "2024-01-03"


def _sig_mask_sql() -> str:
    cases = " + ".join(
        f"MAX(CASE WHEN event_type = '{t}' THEN {1 << i} ELSE 0 END)"
        for i, t in enumerate(_SIG_TYPES)
    )
    return cases


@query(
    "events_behavior_signatures",
    f"""
    WITH u AS (
      SELECT user_id, {_sig_mask_sql()} AS mask
      FROM events
      WHERE ts < TIMESTAMP '{_SIG_CUTOFF} 00:00:00'
      GROUP BY user_id
    )
    SELECT mask, COUNT(*) AS n_users,
           CAST(SUM(CASE WHEN mask & {1 << _SIG_TYPES.index("purchase")} != 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_purchasers
    FROM u GROUP BY mask
    """,
)
def events_behavior_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = (
        ev.where(F.col("ts") < F.lit(f"{_SIG_CUTOFF} 00:00:00").cast("timestamp"))
        .groupBy("user_id")
        .agg(F.expr(_sig_mask_sql()).alias("mask"))
    )
    pbit = 1 << _SIG_TYPES.index("purchase")
    return u.groupBy("mask").agg(
        F.count("*").alias("n_users"),
        F.sum(
            F.when(F.expr(f"mask & {pbit}") != 0, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_purchasers"),
    )


# ---------------------------------------------------------------------------
# User lifecycle stages (new / active / lapsing / churned)
# ---------------------------------------------------------------------------
# Product-analytics staple: classify every user by first/last activity
# against the corpus snapshot — new (first seen recently), churned
# (silent too long), lapsing (quiet but not gone), active otherwise.
# One aggregation to (user, first, last), one broadcast snapshot, one
# expression; thresholds are exact integer day diffs. The stage
# report rolls up per stage with exact-int shares. Thresholds are
# config knobs; these values are calibrated to the synthetic corpus'
# dense 30-day span (every user spans nearly the whole window, so the
# discriminating signal is the 0-2-day tail gap) purely so all four
# CASE branches execute — a production deployment would use
# 7/7/14-day-style cuts.
_LC_NEW_DAYS = 28
_LC_LAPSE_DAYS = 0
_LC_CHURN_DAYS = 1


@query(
    "events_user_lifecycle",
    f"""
    WITH snap AS (SELECT MAX(CAST(ts AS DATE)) AS today FROM events),
    u AS (
      SELECT user_id,
             date_diff('day', MIN(CAST(ts AS DATE)),
                       (SELECT today FROM snap)) AS first_age,
             date_diff('day', MAX(CAST(ts AS DATE)),
                       (SELECT today FROM snap)) AS last_gap
      FROM events GROUP BY user_id
    ),
    staged AS (
      SELECT CASE WHEN last_gap > {_LC_CHURN_DAYS} THEN 'churned'
                  WHEN first_age <= {_LC_NEW_DAYS} THEN 'new'
                  WHEN last_gap > {_LC_LAPSE_DAYS} THEN 'lapsing'
                  ELSE 'active' END AS stage
      FROM u
    ),
    tot AS (SELECT COUNT(*) AS n FROM staged)
    SELECT stage, COUNT(*) AS n_users,
           CAST(COUNT(*) AS DOUBLE) / tot.n AS share
    FROM staged CROSS JOIN tot
    GROUP BY stage, tot.n
    """,
)
def events_user_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    snap = ev.agg(F.max(F.to_date("ts")).alias("today"))
    u = (
        ev.groupBy("user_id")
        .agg(
            F.min(F.to_date("ts")).alias("first_day"),
            F.max(F.to_date("ts")).alias("last_day"),
        )
        .crossJoin(F.broadcast(snap))
        .select(
            F.datediff("today", "first_day").alias("first_age"),
            F.datediff("today", "last_day").alias("last_gap"),
        )
    )
    stage = (
        F.when(F.col("last_gap") > _LC_CHURN_DAYS, "churned")
        .when(F.col("first_age") <= _LC_NEW_DAYS, "new")
        .when(F.col("last_gap") > _LC_LAPSE_DAYS, "lapsing")
        .otherwise("active")
    )
    staged = u.select(stage.alias("stage"))
    tot = staged.agg(F.count("*").alias("n"))
    return (
        staged.crossJoin(F.broadcast(tot))
        .groupBy("stage", "n")
        .agg(F.count("*").alias("n_users"))
        .select(
            "stage",
            "n_users",
            (F.col("n_users").cast("double") / F.col("n")).alias("share"),
        )
    )


# ---------------------------------------------------------------------------
# Discount-band effectiveness (pricing analytics)
# ---------------------------------------------------------------------------
# Does a deeper discount actually move more units? Quantity and
# revenue profiled per discount band (exact integer percent bands),
# with the volume lift vs the zero-discount band as an exact-int
# ratio pair — the read a pricing team checks before widening a
# promo. One aggregation + one broadcast baseline row.
@query(
    "lineitem_discount_effect",
    f"""
    WITH b AS (
      SELECT {_CENTS.format("l_discount")} AS disc_pct,
             {_MOM_X} AS q,
             {_CENTS.format("l_extendedprice * (1 - l_discount)")}
               AS rev_cents
      FROM lineitem
    ),
    g AS (
      SELECT disc_pct, COUNT(*) AS n_lines,
             CAST(SUM(q) AS BIGINT) AS total_qty,
             CAST(SUM(rev_cents) AS BIGINT) AS revenue_cents
      FROM b GROUP BY disc_pct
    ),
    base AS (SELECT total_qty AS q0, n_lines AS n0 FROM g WHERE disc_pct = 0)
    SELECT g.disc_pct, g.n_lines, g.total_qty, g.revenue_cents,
           CAST(g.total_qty AS DOUBLE) / g.n_lines AS avg_qty,
           (CAST(g.total_qty AS DOUBLE) * CAST(base.n0 AS DOUBLE))
             / (CAST(base.q0 AS DOUBLE) * CAST(g.n_lines AS DOUBLE))
             AS qty_lift_vs_base
    FROM g CROSS JOIN base
    """,
)
def lineitem_discount_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select(
        F.expr(_CENTS.format("l_discount")).alias("disc_pct"),
        F.expr(_MOM_X).alias("q"),
        _cents("l_extendedprice * (1 - l_discount)").alias("rev_cents"),
    )
    g = b.groupBy("disc_pct").agg(
        F.count("*").alias("n_lines"),
        F.sum("q").cast("bigint").alias("total_qty"),
        F.sum("rev_cents").cast("bigint").alias("revenue_cents"),
    )
    base = g.where(F.col("disc_pct") == 0).select(
        F.col("total_qty").alias("q0"), F.col("n_lines").alias("n0")
    )
    return g.crossJoin(F.broadcast(base)).select(
        "disc_pct",
        "n_lines",
        "total_qty",
        "revenue_cents",
        (F.col("total_qty").cast("double") / F.col("n_lines")).alias("avg_qty"),
        # each int64 is cast to DOUBLE BEFORE the multiplies: the int64
        # cross-product total_qty*n0 (~7.7e12*sf^2) silently wraps in
        # non-ANSI Spark past sf~1e3 while DuckDB raises on the BIGINT
        # multiply — a silent-wrong vs hard-error split (r08 review).
        # Double products of exact ints are correctly rounded and the
        # trees are identical in both engines, so the emitted ratio
        # stays bit-identical at every scale.
        (
            (F.col("total_qty").cast("double") * F.col("n0").cast("double"))
            / (F.col("q0").cast("double") * F.col("n_lines").cast("double"))
        ).alias("qty_lift_vs_base"),
    )


# ---------------------------------------------------------------------------
# Partition-skew diagnosis (the pre-salting health check)
# ---------------------------------------------------------------------------
# Before picking a shuffle key, measure it: hash the candidate key into
# N buckets (the cross-engine md5 hash, so the oracle sees identical
# buckets) and report per-bucket row counts plus the max/ideal skew
# multiple in exact per-mille. A skew multiple near 1000‰ means the
# key distributes evenly; multiples of several thousand flag the keys
# that need salting or AQE skew-join handling. This is the diagnostic
# behind functions/salting.py — run it on a sampled slab per candidate
# key at 100 TB.
_SKEW_BUCKETS = 32


def _skew_sql(*, duck: bool) -> str:
    h = md5_int64("CAST(l_suppkey AS " + ("VARCHAR" if duck else "STRING") + ")", duck=duck)
    return f"(({h}) % {_SKEW_BUCKETS})"


@query(
    "lineitem_partition_skew",
    f"""
    WITH b AS (
      SELECT {_skew_sql(duck=True)} AS bucket, COUNT(*) AS n
      FROM lineitem GROUP BY 1
    ),
    t AS (SELECT SUM(n) AS total, COUNT(*) AS nb, MAX(n) AS mx FROM b)
    SELECT b.bucket, b.n,
           CAST(b.n * 1000 * t.nb // t.total AS BIGINT) AS load_permille,
           CAST(t.mx * 1000 * t.nb // t.total AS BIGINT) AS max_skew_permille
    FROM b CROSS JOIN t
    """,
)
def lineitem_partition_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    b = li.groupBy(
        F.expr(_skew_sql(duck=False)).alias("bucket")
    ).agg(F.count("*").alias("n"))
    t = b.agg(
        F.sum("n").alias("total"),
        F.count("*").alias("nb"),
        F.max("n").alias("mx"),
    )
    return b.crossJoin(F.broadcast(t)).select(
        "bucket",
        "n",
        F.expr("CAST(n * 1000 * nb DIV total AS BIGINT)").alias(
            "load_permille"
        ),
        F.expr("CAST(mx * 1000 * nb DIV total AS BIGINT)").alias(
            "max_skew_permille"
        ),
    )


# ---------------------------------------------------------------------------
# First-touch conversion funnel (view → click → purchase)
# ---------------------------------------------------------------------------
# The product-analytics staple missing between the pairwise conversion
# join (events_conversion_join) and the lifecycle report: how many
# users progress through an ORDERED stage sequence. Semantics are the
# standard first-touch funnel — a user advances when their first
# occurrence of stage k+1 happens strictly after their first
# occurrence of stage k — which reduces to ONE hash aggregate per user
# over conditional MIN(unix_micros) columns (no joins, no windows,
# map-side combined) and a 3-row stacked report. Conversion rates are
# exact integer permille. At 100 TB this is a single shuffle on
# user_id; the per-user state is three longs.
@query(
    "events_funnel_steps",
    """
    WITH peruser AS (
      SELECT user_id,
             MIN(epoch_us(ts)) FILTER (WHERE event_type = 'view') AS mv,
             MIN(epoch_us(ts)) FILTER (WHERE event_type = 'click') AS mc,
             MIN(epoch_us(ts)) FILTER (WHERE event_type = 'purchase') AS mp
      FROM events GROUP BY 1
    ),
    flags AS (
      SELECT CASE WHEN mv IS NOT NULL THEN 1 ELSE 0 END AS s1,
             CASE WHEN mv IS NOT NULL AND mc > mv THEN 1 ELSE 0 END AS s2,
             CASE WHEN mv IS NOT NULL AND mc > mv AND mp > mc
                  THEN 1 ELSE 0 END AS s3
      FROM peruser
    ),
    tot AS (
      SELECT CAST(SUM(s1) AS BIGINT) AS n1, CAST(SUM(s2) AS BIGINT) AS n2,
             CAST(SUM(s3) AS BIGINT) AS n3
      FROM flags
    )
    SELECT u.stage, u.n_users, u.conv_permille
    FROM tot, LATERAL (
      SELECT * FROM (VALUES
        ('view', tot.n1, CAST(1000 AS BIGINT)),
        ('view_click', tot.n2, (tot.n2 * 1000) // NULLIF(tot.n1, 0)),
        ('view_click_purchase', tot.n3,
         (tot.n3 * 1000) // NULLIF(tot.n2, 0))
      ) AS t(stage, n_users, conv_permille)
    ) u
    """,
)
def events_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    mic = F.expr("unix_micros(ts)")

    def first(evt: str):
        return F.min(F.when(F.col("event_type") == evt, mic)).alias(
            "m" + evt[0]
        )

    peruser = ev.groupBy("user_id").agg(
        first("view"), first("click"), first("purchase")
    )
    tot = peruser.agg(
        F.count_if(F.col("mv").isNotNull()).alias("n1"),
        F.count_if(
            F.col("mv").isNotNull() & (F.col("mc") > F.col("mv"))
        ).alias("n2"),
        F.count_if(
            F.col("mv").isNotNull()
            & (F.col("mc") > F.col("mv"))
            & (F.col("mp") > F.col("mc"))
        ).alias("n3"),
    )
    return tot.selectExpr(
        "stack(3, "
        "'view', n1, CAST(1000 AS BIGINT), "
        "'view_click', n2, (n2 * 1000L) div NULLIF(n1, 0), "
        "'view_click_purchase', n3, (n3 * 1000L) div NULLIF(n2, 0)"
        ") AS (stage, n_users, conv_permille)"
    )


# ---------------------------------------------------------------------------
# Referential-integrity audit across the star schema
# ---------------------------------------------------------------------------
# The warehouse health check every load pipeline runs before promoting
# a batch: for each foreign-key edge, how many child rows point at a
# missing parent, and what share of the child is covered. Each edge is
# one LEFT ANTI join on the key (at 100 TB: co-partitioned or
# runtime-bloom-pruned; the dim-side edges broadcast) plus a COUNT —
# no row data moves, only keys. Shares are exact integer per-mille.
_RI_EDGES = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
)


def _ri_oracle() -> str:
    arms = []
    for child, fk, parent, pk in _RI_EDGES:
        arms.append(f"""
    SELECT '{child}.{fk}' AS fk_edge,
           CAST(COUNT(*) AS BIGINT) AS n_child,
           CAST(SUM(CASE WHEN p.{pk} IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_orphans,
           CAST(SUM(CASE WHEN p.{pk} IS NULL THEN 1 ELSE 0 END) * 1000
                // NULLIF(COUNT(*), 0) AS BIGINT) AS orphan_permille
    FROM {child} c
    LEFT JOIN (SELECT DISTINCT {pk} FROM {parent}) p
           ON c.{fk} = p.{pk}""")
    return "\n    UNION ALL\n".join(arms)


@query("dq_referential_integrity", _ri_oracle())
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan counts + exact per-mille share for every FK edge of the
    star schema — the pre-promotion warehouse health report.

    Each star table is scanned ONCE: a persisted key-only projection
    (every FK/PK column the audit needs — a few ints per row) serves
    all the edges that table participates in. Without the persist,
    lineitem was scanned three times and nation three (14 scans for 7
    edges, r06 verdict #4); Spark reuses identical *exchanges* but has
    no cross-subtree scan CSE, so the reuse must be explicit. Released
    by release_cached_frames() like the dedup posting frames."""
    need: dict[str, set[str]] = {}
    for child, fk, parent, pk in _RI_EDGES:
        need.setdefault(child, set()).add(fk)
        need.setdefault(parent, set()).add(pk)
    keys = {
        t: _cached_keys(load_table(spark, sf_dir, t).select(*sorted(cs)))
        for t, cs in need.items()
    }
    out = None
    for child, fk, parent, pk in _RI_EDGES:
        c = keys[child].select(fk)
        p = keys[parent].select(pk).distinct()
        arm = (
            c.join(p, c[fk] == p[pk], "left")
            .agg(
                F.count("*").alias("n_child"),
                F.sum(
                    F.when(F.col(pk).isNull(), 1).otherwise(0)
                ).cast("bigint").alias("n_orphans"),
            )
            .select(
                F.lit(f"{child}.{fk}").alias("fk_edge"),
                F.col("n_child").cast("bigint").alias("n_child"),
                "n_orphans",
                # NULLIF on BOTH sides: on an empty child table Spark
                # DIV yields NULL while DuckDB // raises div-by-zero —
                # the NULLIF keeps the engines' behavior identical
                F.expr("n_orphans * 1000 DIV NULLIF(n_child, 0)")
                .cast("bigint")
                .alias("orphan_permille"),
            )
        )
        out = arm if out is None else out.unionByName(arm)
    return out


# ---------------------------------------------------------------------------
# Cohort lifetime value (cumulative revenue per acquired customer)
# ---------------------------------------------------------------------------
# The revenue companion to orders_retention_cohorts: for each
# first-order-month cohort, cumulative order revenue by months-since,
# divided by cohort size — the LTV curve growth teams actually read.
# Months are exact integer year*12+month (the retention idiom — no
# months_between interval semantics); revenue is integer cents and the
# per-user LTV is floor division, so the whole curve is engine-exact.
# Plan: one cohort-anchor aggregate (shuffle on customer), one
# (cohort, month) revenue aggregate, then a cumulative window
# partitioned by cohort — frames bounded by the calendar, never by
# order volume.
@query(
    "orders_cohort_ltv",
    f"""
    WITH first AS (
      SELECT o_custkey,
             MIN(year(o_orderdate) * 12 + month(o_orderdate)) AS cohort_ym
      FROM orders GROUP BY o_custkey
    ),
    sizes AS (
      SELECT cohort_ym, COUNT(*) AS n_customers
      FROM first GROUP BY cohort_ym
    ),
    rev AS (
      -- an UNDATED order cannot sit on a months-since curve: its
      -- NULL months_since row ordered FIRST in Spark's cumulative
      -- window but LAST in DuckDB's, shifting every cum_cents after
      -- it (r11 fuzz hunt seed 39)
      SELECT f.cohort_ym,
             year(o.o_orderdate) * 12 + month(o.o_orderdate)
               - f.cohort_ym AS months_since,
             CAST(SUM({_CENTS.format("o.o_totalprice")}) AS BIGINT)
               AS month_cents
      FROM orders o JOIN first f ON o.o_custkey = f.o_custkey
      WHERE o.o_orderdate IS NOT NULL
      GROUP BY 1, 2
    ),
    cum AS (
      SELECT cohort_ym, months_since, month_cents,
             CAST(SUM(month_cents) OVER (PARTITION BY cohort_ym
                  ORDER BY months_since
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
      FROM rev
    )
    SELECT c.cohort_ym, c.months_since, s.n_customers,
           c.month_cents, c.cum_cents,
           c.cum_cents // s.n_customers AS ltv_cents_per_user
    FROM cum c JOIN sizes s ON c.cohort_ym = s.cohort_ym
    """,
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative per-user revenue by cohort and month offset."""
    orders = load_table(spark, sf_dir, "orders")
    ym = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    first = orders.groupBy("o_custkey").agg(F.min(ym).alias("cohort_ym"))
    sizes = first.groupBy("cohort_ym").agg(
        F.count("*").alias("n_customers")
    )
    rev = (
        orders.where(F.col("o_orderdate").isNotNull())  # see oracle note
        .join(first, "o_custkey")
        .groupBy(
            "cohort_ym",
            (ym - F.col("cohort_ym")).alias("months_since"),
        )
        .agg(
            F.sum(_cents("o_totalprice")).cast("bigint").alias("month_cents")
        )
    )
    w = (
        Window.partitionBy("cohort_ym")
        .orderBy("months_since")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = rev.withColumn(
        "cum_cents", F.sum("month_cents").over(w).cast("bigint")
    )
    return cum.join(sizes, "cohort_ym").select(
        "cohort_ym",
        "months_since",
        "n_customers",
        "month_cents",
        "cum_cents",
        F.expr("cum_cents DIV n_customers").alias("ltv_cents_per_user"),
    )


# ---------------------------------------------------------------------------
# Zone-map file-skipping effectiveness by physical layout
# ---------------------------------------------------------------------------
# The 100 TB knob this measures: a scan with a range predicate prunes
# a shard iff the shard's min/max zone map misses the range, so the
# fraction of data a query touches is a property of the LAYOUT, not
# the predicate. Scatter (hash-clustered) layouts keep every shard's
# zone wide open; range-clustered layouts shrink zones to the bucket
# width and let the scan skip everything else. Both layouts here are
# pure map-side shard assignments (no global sort, unlike ntile-style
# OPTIMIZE) so the measurement itself scales.

ZONE_HASH_SHARDS = 16
ZONE_RANGE_BUCKET_DAYS = 128
_ZONE_ANCHOR = "1992-01-01"
# Fixed 30-day shipdate window: days 1155..1184 since the anchor
# (1995-03-01 .. 1995-03-30).
ZONE_PRED_LO = 1155
ZONE_PRED_HI = 1184


@query(
    "layout_zonemap_skipping",
    f"""
    WITH base AS (
      SELECT l_orderkey,
             date_diff('day', DATE '{_ZONE_ANCHOR}',
                       CAST(l_shipdate AS DATE)) AS day_no
      FROM lineitem
    ),
    placed AS (
      SELECT 'hash' AS layout,
             {md5_int64("CAST(l_orderkey AS VARCHAR)", duck=True)}
               % {ZONE_HASH_SHARDS} AS shard,
             day_no
      FROM base
      UNION ALL
      SELECT 'range' AS layout,
             day_no // {ZONE_RANGE_BUCKET_DAYS} AS shard,
             day_no
      FROM base
    ),
    zones AS (
      SELECT layout, shard, MIN(day_no) AS mn, MAX(day_no) AS mx,
             COUNT(*) AS n_rows,
             COUNT(*) FILTER (WHERE day_no BETWEEN {ZONE_PRED_LO}
                              AND {ZONE_PRED_HI}) AS match_rows
      FROM placed GROUP BY layout, shard
    )
    SELECT layout,
           CAST(COUNT(*) AS BIGINT) AS n_shards,
           CAST(COUNT(*) FILTER (WHERE mx >= {ZONE_PRED_LO}
                                 AND mn <= {ZONE_PRED_HI}) AS BIGINT)
             AS shards_scanned,
           CAST(COALESCE(SUM(n_rows) FILTER (WHERE mx >= {ZONE_PRED_LO}
                                   AND mn <= {ZONE_PRED_HI}), 0) AS BIGINT)
             AS rows_scanned,
           CAST(SUM(match_rows) AS BIGINT) AS rows_matching,
           CAST((1000 * (COUNT(*) - COUNT(*) FILTER (
                  WHERE mx >= {ZONE_PRED_LO} AND mn <= {ZONE_PRED_HI})))
                // COUNT(*) AS BIGINT) AS skip_permille
    FROM zones GROUP BY layout
    """,
)
def layout_zonemap_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measure zone-map (min/max) file-skipping effectiveness of two
    physical layouts of lineitem under the same fixed 30-day shipdate
    range predicate: a hash-scattered layout (shard = md5(l_orderkey)
    mod 16) vs a range-clustered layout (shard = shipdate-day div 128).

    Per layout: shard count, shards whose [min, max] zone overlaps the
    predicate (must be scanned), rows inside those shards (scan
    amplification), true matching rows (identical across layouts), and
    the per-mille of shards skipped. Two group-bys, no windows, no
    sort: the shard assignment is a map-side expression, so this audit
    runs as a single pass even where re-clustering itself would not.
    """
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        "l_orderkey",
        F.datediff(
            F.to_date("l_shipdate"), F.lit(_ZONE_ANCHOR).cast("date")
        ).alias("day_no"),
    )
    h = md5_int64("CAST(l_orderkey AS STRING)", duck=False)
    placed = base.selectExpr(
        "'hash' AS layout",
        f"{h} % {ZONE_HASH_SHARDS} AS shard",
        "day_no",
    ).unionAll(
        base.selectExpr(
            "'range' AS layout",
            f"day_no div {ZONE_RANGE_BUCKET_DAYS} AS shard",
            "day_no",
        )
    )
    in_pred = F.col("day_no").between(ZONE_PRED_LO, ZONE_PRED_HI)
    zones = placed.groupBy("layout", "shard").agg(
        F.min("day_no").alias("mn"),
        F.max("day_no").alias("mx"),
        F.count("*").alias("n_rows"),
        F.sum(in_pred.cast("long")).alias("match_rows"),
    )
    overlaps = (F.col("mx") >= ZONE_PRED_LO) & (F.col("mn") <= ZONE_PRED_HI)
    return zones.groupBy("layout").agg(
        F.count("*").alias("n_shards"),
        F.sum(overlaps.cast("long")).alias("shards_scanned"),
        F.coalesce(
            F.sum(F.when(overlaps, F.col("n_rows"))), F.lit(0)
        ).cast("bigint").alias("rows_scanned"),
        F.sum("match_rows").cast("bigint").alias("rows_matching"),
    ).withColumn(
        "skip_permille",
        F.expr(
            "CAST((1000 * (n_shards - shards_scanned)) div n_shards"
            " AS BIGINT)"
        ),
    )


# ---------------------------------------------------------------------------
# Distribution drift (Population Stability Index)
# ---------------------------------------------------------------------------
# The train/serve drift monitor: compare a feature's distribution
# across two populations (here: order totals before vs from the split
# date) over a FIXED bucket grid with Laplace +1 smoothing, and report
# each bucket's PSI contribution. All counts are exact integers; the
# only floats are plain divisions of exact ints and ln of their
# ratios, with ROUND absorbing summation-order jitter (the entropy-op
# precedent). Two filtered aggregates + a 16-row bucket-grid join —
# the heavy input passes are pushed-filter scans, map-side combined.
PSI_BUCKETS = 16
PSI_BUCKET_CENTS = 3_200_000  # 32k-unit buckets over the ~500k range
PSI_SPLIT_DATE = "1998-01-01"


def psi_bucket_col() -> F.Column:
    """The fixed PSI bucket of an order row — shared by the batch
    monitor and the streaming drift screen so the grids never drift."""
    return F.greatest(
        F.lit(0),
        F.least(
            F.lit(PSI_BUCKETS - 1),
            F.expr(f"{_CENTS.format('o_totalprice')} div {PSI_BUCKET_CENTS}"),
        ),
    ).alias("bucket")


def psi_from_counts(c_old: list[int], c_new: list[int]) -> float:
    """Total PSI of two raw count vectors under the operator's
    Laplace +1 smoothing — the driver-side twin of the per-bucket
    terms, used by the streaming screen's alert decision."""
    n_old = sum(c_old) + PSI_BUCKETS
    n_new = sum(c_new) + PSI_BUCKETS
    total = 0.0
    import math

    for o, n in zip(c_old, c_new):
        p, q = (o + 1) / n_old, (n + 1) / n_new
        total += (p - q) * (math.log(p) - math.log(q))
    return total


@query(
    "dq_distribution_drift",
    f"""
    WITH olds AS (
      SELECT GREATEST(0, LEAST({PSI_BUCKETS - 1},
                   {_CENTS.format("o_totalprice")} // {PSI_BUCKET_CENTS}))
               AS bucket, COUNT(*) AS c
      FROM orders WHERE o_orderdate < DATE '{PSI_SPLIT_DATE}'
      GROUP BY 1
    ),
    news AS (
      SELECT GREATEST(0, LEAST({PSI_BUCKETS - 1},
                   {_CENTS.format("o_totalprice")} // {PSI_BUCKET_CENTS}))
               AS bucket, COUNT(*) AS c
      FROM orders WHERE o_orderdate >= DATE '{PSI_SPLIT_DATE}'
      GROUP BY 1
    ),
    grid AS (
      SELECT unnest(generate_series(0, {PSI_BUCKETS - 1})) AS bucket
    ),
    j AS (
      SELECT g.bucket,
             COALESCE(o.c, 0) AS c_old, COALESCE(n.c, 0) AS c_new
      FROM grid g
      LEFT JOIN olds o ON g.bucket = o.bucket
      LEFT JOIN news n ON g.bucket = n.bucket
    ),
    t AS (
      SELECT bucket, c_old, c_new,
             SUM(c_old) OVER () AS n_old, SUM(c_new) OVER () AS n_new
      FROM j
    )
    SELECT bucket, CAST(c_old AS BIGINT) AS c_old,
           CAST(c_new AS BIGINT) AS c_new,
           ROUND(
             ((c_old + 1) / (n_old + {PSI_BUCKETS})
               - (c_new + 1) / (n_new + {PSI_BUCKETS}))
             * (ln((c_old + 1) / (n_old + {PSI_BUCKETS}))
                - ln((c_new + 1) / (n_new + {PSI_BUCKETS}))), 6)
             AS psi_term
    FROM t
    """,
)
def dq_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bucket Population Stability Index between order-total
    distributions before vs from the split date, on a fixed 16-bucket
    cent grid with Laplace +1 smoothing (every bucket defined even
    when empty on one side).

    psi_term = (p_i - q_i) * (ln(p_i) - ln(q_i)); the total PSI is
    the sum of the 16 rows. Exact integer counts feed plain divisions
    before any ln — ROUND(6) absorbs float jitter. Scale: two
    pushed-filter scans with map-side-combined 16-cell aggregates; the
    grid join and global-sum window run on 16 rows."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = psi_bucket_col()
    split = F.col("o_orderdate") < F.lit(PSI_SPLIT_DATE).cast("timestamp")
    olds = orders.where(split).groupBy(bucket).agg(F.count("*").alias("c_old"))
    news = (
        orders.where(~split).groupBy(bucket).agg(F.count("*").alias("c_new"))
    )
    grid = spark.range(PSI_BUCKETS).select(F.col("id").alias("bucket"))
    j = (
        grid.join(olds, "bucket", "left")
        .join(news, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("c_old", F.lit(0)).alias("c_old"),
            F.coalesce("c_new", F.lit(0)).alias("c_new"),
        )
    )
    w = Window.partitionBy()
    t = j.select(
        "bucket",
        "c_old",
        "c_new",
        F.sum("c_old").over(w).alias("n_old"),
        F.sum("c_new").over(w).alias("n_new"),
    )
    b = PSI_BUCKETS
    return t.select(
        "bucket",
        F.col("c_old").cast("bigint").alias("c_old"),
        F.col("c_new").cast("bigint").alias("c_new"),
        F.round(
            (
                (F.col("c_old") + 1) / (F.col("n_old") + b)
                - (F.col("c_new") + 1) / (F.col("n_new") + b)
            )
            # ln(p) - ln(q) over the already-double smoothed ratios:
            # an integer cross-product spelling would overflow int64
            # once a population passes ~3e9 rows, exactly the scale
            # this monitor targets.
            * (
                F.log((F.col("c_old") + 1) / (F.col("n_old") + b))
                - F.log((F.col("c_new") + 1) / (F.col("n_new") + b))
            ),
            6,
        ).alias("psi_term"),
    )


# ---------------------------------------------------------------------------
# Incremental JOIN maintenance (delta-join algebra)
# ---------------------------------------------------------------------------
# The join companion of ``agg_incremental_maintenance``: a materialized
# join view V = O JOIN L is maintained under appends by the identity
#   (O0 + dO) JOIN (L0 + dL)
#     = O0 JOIN L0  (the stored view)
#     + O0 JOIN dL  + dO JOIN L0 + dO JOIN dL   (delta terms)
# — each delta term touches one delta-sized input, so at 100 TB the
# refresh cost scales with the day's append, not the table; the delta
# sides are broadcastable and every join is key-equi on o_orderkey.
# The oracle recomputes the view from scratch: hash equality IS the
# proof of the algebra.
@query(
    "join_incremental_maintenance",
    f"""
    SELECT CAST(l.l_shipdate AS DATE) AS ship_date,
           COUNT(*) AS n_pairs,
           CAST(SUM({_CENTS.format("l.l_extendedprice * (1 - l.l_discount)")})
                AS BIGINT) AS revenue_cents
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY 1
    """,
)
def join_incremental_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain a join view under appends via the 4-term delta
    algebra, then aggregate per ship day; the oracle's from-scratch
    recompute must hash-match, proving the incremental refresh exact."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit(_MAINT_CUTOFF)
    # The old/new split must be a TOTAL partition (a NULL date falling
    # out of both sides would silently drop its join pairs), so the
    # "new" side is the negation of the "old" predicate, not >=.
    o_old = orders.where(F.col("o_orderdate") < cutoff)
    o_new = orders.where(~(F.col("o_orderdate") < cutoff) | F.col("o_orderdate").isNull())
    l_old = li.where(F.col("l_shipdate") < cutoff)
    l_new = li.where(~(F.col("l_shipdate") < cutoff) | F.col("l_shipdate").isNull())

    def term(o: DataFrame, l: DataFrame) -> DataFrame:
        return o.select("o_orderkey").join(
            l.select(
                F.col("l_orderkey").alias("o_orderkey"),
                F.to_date("l_shipdate").alias("ship_date"),
                _cents("l_extendedprice * (1 - l_discount)").alias("cents"),
            ),
            "o_orderkey",
        )

    view = (
        term(o_old, l_old)  # the stored view (recomputed here once)
        .unionByName(term(o_old, l_new))
        .unionByName(term(o_new, l_old))
        .unionByName(term(o_new, l_new))
    )
    return view.groupBy("ship_date").agg(
        F.count("*").alias("n_pairs"),
        F.sum("cents").cast("bigint").alias("revenue_cents"),
    )


# ---------------------------------------------------------------------------
# Benford first-digit audit
# ---------------------------------------------------------------------------
# Fraud/quality screen for amount columns: natural multi-magnitude
# amounts follow Benford's law (P(d) = log10(1 + 1/d)); fabricated or
# truncated data does not. Everything here is integer: exact digit
# counts (first digit via decimal string, no float log10 edge cases),
# observed shares as per-mille floor division, and the published
# Benford per-mille constants — so the audit is bit-deterministic
# cross-engine. One aggregate over a pushed-projection scan; the
# 9-row share window is constant-size.
BENFORD_PERMILLE = {1: 301, 2: 176, 3: 125, 4: 97, 5: 79, 6: 67, 7: 58, 8: 51, 9: 46}

_BENFORD_CASE = "CASE digit " + " ".join(
    f"WHEN {d} THEN {p}" for d, p in BENFORD_PERMILLE.items()
) + " END"


@query(
    "dq_benford_audit",
    f"""
    WITH d AS (
      SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INTEGER) AS digit
      FROM (SELECT {_CENTS.format("o_totalprice")} AS cents FROM orders)
      WHERE cents > 0
    ),
    g AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
    t AS (SELECT digit, n, SUM(n) OVER () AS total FROM g)
    SELECT digit, CAST(n AS BIGINT) AS n,
           CAST((1000 * n) // total AS BIGINT) AS observed_permille,
           CAST({_BENFORD_CASE} AS BIGINT) AS benford_permille,
           CAST(ABS((1000 * n) // total - {_BENFORD_CASE}) AS BIGINT)
             AS abs_dev_permille
    FROM t
    """,
)
def dq_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-digit distribution of order totals vs Benford's law:
    per digit, the exact count, observed per-mille share, the Benford
    expectation, and the absolute deviation — the data-quality screen
    for fabricated or range-clipped amount columns.

    Only POSITIVE amounts are audited (Benford is undefined at zero
    and sign-dependent below it; non-positive rows belong to the
    dq_expectations screen, not this one) — the guard is mirrored in
    plan and oracle so a refund row can never diverge the engines.
    All integer arithmetic (digit from the decimal string, shares by
    floor division, fixed expectation constants): no float anywhere,
    so the audit hashes identically cross-engine and merges trivially
    across shards (counts are the only state)."""
    orders = load_table(spark, sf_dir, "orders")
    d = (
        orders.selectExpr(
            f"{_CENTS.format('o_totalprice')} AS cents"
        )
        .where(F.col("cents") > 0)
        .selectExpr("CAST(substr(CAST(cents AS STRING), 1, 1) AS INT) AS digit")
    )
    g = d.groupBy("digit").agg(F.count("*").alias("n"))
    t = g.select(
        "digit", "n", F.sum("n").over(Window.partitionBy()).alias("total")
    )
    return t.selectExpr(
        "digit",
        "CAST(n AS BIGINT) AS n",
        "CAST((1000 * n) div total AS BIGINT) AS observed_permille",
        f"CAST({_BENFORD_CASE} AS BIGINT) AS benford_permille",
        f"CAST(ABS((1000 * n) div total - {_BENFORD_CASE}) AS BIGINT)"
        " AS abs_dev_permille",
    )
