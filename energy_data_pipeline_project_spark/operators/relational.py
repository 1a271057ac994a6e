"""Core relational query surface (SURVEY.md §2 + §7 phases 0/1/3).

Every active operator in the reference — projection/alias (P1-P3),
null-drop filter (P4), normalized-equality filter (P5), casts (P6), the
date-keyed inner join (J1), group-by SUM/AVG (A1/A2), counts (A3),
distinct (A4), JSON path extraction + coalesce probing (F1-F3), explode
(F4), epoch→timestamp→date bucketing (F6/F7), string normalization (F8)
— re-expressed over the star-schema testdata, plus the wider relational
surface a real engine needs (outer/semi/anti joins, windows, rollup/
cube, top-k, set ops, sessionization).

Cross-engine determinism rules (the DuckDB oracle must hash-match):

- Money sums use integer cents: ``CAST(ROUND(expr*100, 0) AS BIGINT)``
  per row, then integer SUM. Float sums of ~1e5 rows differ between
  engines in the last bits, and rounding after the fact is unsafe at
  large magnitudes; per-row double math is bitwise deterministic, so
  cents are exact in both engines.
- Money averages are NEVER rounded: fixed-decimal inputs land exactly
  on half-way rounding boundaries (e.g. avg of cents over 8 rows ends
  in ...125) where Spark's BigDecimal HALF_UP and DuckDB's float round
  disagree. Instead: ``CAST(SUM(cents) AS DOUBLE) / 100.0 / COUNT(*)``
  — integer→double conversion and IEEE division are bitwise identical
  in both engines. Same for any ratio of exact integers (ttr, jaccard).
- ROUND(x, 4) only on genuinely continuous statistics (stddev, cosine,
  avg of continuous doubles) where a half-way tie has measure zero.
- Timestamps are never emitted directly: dates (DATE) and hour-of-day
  (INT) avoid ns-vs-µs precision mismatches with the oracle.
- Every computed column is aliased identically in both engines.

Scale posture (100 TB): filters are applied before joins so Catalyst
pushes them into the parquet scan; ONLY genuinely bounded frames carry
an explicit broadcast hint — fixed-size dims (nation, region), 1-row
scalar aggregates, and top-k/capped frames. sf-growing tables (part,
supplier, orders, lineitem) are never hinted: F.broadcast is obeyed
regardless of size and would OOM executors at scale, so those joins
stay shuffled-join territory where AQE upgrades to broadcast at small
scale on its own (r08 review removed four part/supplier hints that
violated this). No Python UDFs anywhere in this module — all
expressions are whole-stage-codegen'd.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..sources.tables import load_table
from ._registry import make_registry

QUERIES, ORACLES, query = make_registry()


from ..functions import jsontext as JT
from ..functions import money as _money


def _cents(expr_sql: str) -> F.Column:
    # non-finite-hardened since r09 (functions/money.py): one NaN/Inf
    # reading NULLs out instead of aborting the ANSI BIGINT cast. A
    # no-op for the fixed-decimal money columns; load-bearing for the
    # continuous events.value measure (degenerate-corpus sweep).
    return _money.cents(f"({expr_sql})")


REVENUE_SQL = "l_extendedprice * (1 - l_discount)"


def _cents_duck(expr_sql: str) -> str:
    # oracle twin of _cents(): SAME parenthesized argument, so both
    # engines instantiate literally identical guarded text — the
    # money.py one-spelling anti-drift contract (r09 advisor: the
    # TPC-H oracle spellings had stayed unguarded, so a NaN/Inf or
    # >$30M price would have crashed or diverged on the oracle side
    # only; latent on domain-bounded TPC-H data, fixed at the source).
    return _money.cents_sql(f"({expr_sql})")


_REV_CENTS_DUCK = _cents_duck(REVENUE_SQL)
_QTY_CENTS_DUCK = _cents_duck("l_quantity")
_TP_CENTS_DUCK = _cents_duck("o_totalprice")
# the continuous measure's oracle spelling carries the same guard
_VAL_CENTS_DUCK = _money.cents_sql("value")


# ---------------------------------------------------------------------------
# Flagship: the reference's gold join (silver_to_gold.py:78-123) mapped onto
# the star schema — daily aggregate ⋈ daily aggregate on a date key, with the
# normalized-string filter (P5) feeding one side.
# ---------------------------------------------------------------------------
@query(
    "gold_daily_join",
    f"""
    WITH rev AS (
      SELECT CAST(l_shipdate AS DATE) AS ship_date,
             CAST(SUM({_REV_CENTS_DUCK}) AS BIGINT) AS revenue_cents,
             COUNT(*) AS n_items
      FROM lineitem
      WHERE lower(trim(l_returnflag)) = 'n'
      GROUP BY 1
    ), avo AS (
      SELECT CAST(o_orderdate AS DATE) AS ship_date,
             CAST(SUM({_TP_CENTS_DUCK}) AS DOUBLE)
               / 100.0 / COUNT(*) AS avg_order_value
      FROM orders GROUP BY 1
    )
    SELECT r.ship_date, r.revenue_cents, r.n_items, a.avg_order_value
    FROM rev r JOIN avo a USING (ship_date)
    """,
)
def gold_daily_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    rev = (
        li.where(F.lower(F.trim("l_returnflag")) == "n")
        .groupBy(F.to_date("l_shipdate").alias("ship_date"))
        .agg(
            F.sum(_cents(REVENUE_SQL)).alias("revenue_cents"),
            F.count("*").alias("n_items"),
        )
    )
    avo = orders.groupBy(F.to_date("o_orderdate").alias("ship_date")).agg(
        (
            F.sum(_cents("o_totalprice")).cast("double") / 100.0 / F.count("*")
        ).alias("avg_order_value")
    )
    return rev.join(avo, "ship_date", "inner").select(
        "ship_date", "revenue_cents", "n_items", "avg_order_value"
    )


# ---------------------------------------------------------------------------
# TPC-H-flavored analytics (A1/A2/A3 at scale)
# ---------------------------------------------------------------------------
@query(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM({_QTY_CENTS_DUCK}) AS DOUBLE) / 100.0 AS sum_qty,
           CAST(SUM({_cents_duck('l_extendedprice')}) AS BIGINT) AS sum_base_cents,
           CAST(SUM({_REV_CENTS_DUCK}) AS BIGINT) AS sum_disc_cents,
           CAST(SUM({_cents_duck(REVENUE_SQL + ' * (1 + l_tax)')}) AS BIGINT) AS sum_charge_cents,
           CAST(SUM({_QTY_CENTS_DUCK}) AS DOUBLE) / 100.0 / COUNT(*) AS avg_qty,
           CAST(SUM({_cents_duck('l_extendedprice')}) AS DOUBLE) / 100.0 / COUNT(*) AS avg_price,
           CAST(SUM(CAST(ROUND(l_discount * 10000, 0) AS BIGINT)) AS DOUBLE) / 10000.0 / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        # raw timestamp bound, NOT to_date(col) <= date (the q6
        # lesson, r06 review): a function-wrapped column defeats
        # parquet row-group pushdown; ts < day+1 is day-exact for a
        # <= DATE predicate
        li.where(
            F.col("l_shipdate") < F.lit("2000-12-02").cast("timestamp")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(_cents("l_quantity")).cast("double") / 100.0).alias("sum_qty"),
            F.sum(_cents("l_extendedprice")).alias("sum_base_cents"),
            F.sum(_cents(REVENUE_SQL)).alias("sum_disc_cents"),
            F.sum(_cents(f"{REVENUE_SQL} * (1 + l_tax)")).alias("sum_charge_cents"),
            (F.sum(_cents("l_quantity")).cast("double") / 100.0 / F.count("*")).alias(
                "avg_qty"
            ),
            (
                F.sum(_cents("l_extendedprice")).cast("double") / 100.0 / F.count("*")
            ).alias("avg_price"),
            (
                F.sum(F.expr("CAST(ROUND(l_discount * 10000, 0) AS BIGINT)")).cast(
                    "double"
                )
                / 10000.0
                / F.count("*")
            ).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q3_top_revenue",
    f"""
    SELECT o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS order_date,
           o.o_orderpriority,
           CAST(SUM({_REV_CENTS_DUCK}) AS BIGINT) AS revenue_cents
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY 1, 2, 3
    ORDER BY revenue_cents DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_top_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            "o_orderkey",
            F.to_date("o_orderdate").alias("order_date"),
            "o_orderpriority",
        )
        .agg(F.sum(_cents(REVENUE_SQL)).alias("revenue_cents"))
        .orderBy(F.desc("revenue_cents"), "o_orderkey")
        .limit(10)
    )


@query(
    "q5_region_revenue",
    f"""
    SELECT n.n_name,
           CAST(SUM({_REV_CENTS_DUCK}) AS BIGINT) AS revenue_cents,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    # nation⋈region is a tiny dim: broadcast so the big fact join shuffles
    # only on the fact keys.
    dim = F.broadcast(
        nation.join(region, nation.n_regionkey == region.r_regionkey).select(
            "n_nationkey", "n_name"
        )
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(dim, cust.c_nationkey == dim.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(_cents(REVENUE_SQL)).alias("revenue_cents"),
            F.count("*").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Projection / filter / cast primitives (P1-P6)
# ---------------------------------------------------------------------------
@query(
    "proj_cast_alias",
    f"""
    SELECT p_partkey,
           upper(p_name) AS p_name_upper,
           CAST(p_size AS VARCHAR) AS size_str,
           {_cents_duck("p_retailprice")} * 11.0 / 1000.0
             AS uplift_price,
           'catalog' AS src,
           p_brand || ':' || p_type AS brand_type
    FROM part
    """,
)
def proj_cast_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("p_name_upper"),
        F.col("p_size").cast("string").alias("size_str"),
        (_cents("p_retailprice") * 11.0 / 1000.0).alias("uplift_price"),
        F.lit("catalog").alias("src"),
        # concat (not concat_ws): SQL || propagates NULL while
        # concat_ws silently skips NULL args — a latent divergence the
        # fixture's null-free columns masked (r07 review)
        F.concat("p_brand", F.lit(":"), "p_type").alias("brand_type"),
    )


@query(
    "filter_null_drop",
    """
    SELECT event_id, event_type, value
    FROM events
    WHERE value IS NOT NULL AND props IS NOT NULL
    """,
)
def filter_null_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.where(
        F.col("value").isNotNull() & F.col("props").isNotNull()
    ).select("event_id", "event_type", "value")


@query(
    "filter_normalized_eq",
    """
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE lower(trim(c_mktsegment)) = 'building'
    """,
)
def filter_normalized_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.where(F.lower(F.trim("c_mktsegment")) == "building").select(
        "c_custkey", "c_name", "c_acctbal"
    )


# ---------------------------------------------------------------------------
# Aggregation variants (A3/A4 + stats)
# ---------------------------------------------------------------------------
@query(
    "agg_distinct_pairs",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def agg_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus"
    ).distinct()


@query(
    "agg_order_stats",
    f"""
    WITH m AS (
      SELECT o_orderpriority,
             CAST(COUNT(*) AS DOUBLE) AS n,
             COUNT(*) AS n_orders,
             COUNT(DISTINCT o_custkey) AS n_customers,
             CAST(SUM({_TP_CENTS_DUCK})
                  AS DOUBLE) AS sc,
             CAST(SUM(CAST({_TP_CENTS_DUCK}
                  * {_TP_CENTS_DUCK}
                  AS DECIMAL(38, 0))) AS DOUBLE) AS sqc,
             MIN(o_totalprice) AS min_price,
             MAX(o_totalprice) AS max_price
      FROM orders
      GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, n_orders, n_customers,
           sc / 100.0 / n AS avg_price,
           min_price, max_price,
           CASE WHEN n_orders > 1 THEN
             SQRT(GREATEST((n * sqc - sc * sc) / (n * (n - 1.0)), 0.0))
               / 100.0
           END AS sd_price
    FROM m
    """,
)
def agg_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority order stats. The sample stddev is computed from
    EXACT integer-cents moments (the cents² sum rides DECIMAL(38,0) —
    it overflows int64 at test scale already) converted to double and
    pushed through the IDENTICAL expression tree in both engines, so
    the value is bit-identical. The previous ROUND(STDDEV_SAMP(x), 4)
    broke the no-ROUND-doubles rule twice over: the engines' native
    stddev accumulators are partition-order-dependent, and
    ROUND(double, n) itself splits on near-tie doubles (r07 review)."""
    orders = load_table(spark, sf_dir, "orders")
    c = _cents("o_totalprice")
    m = orders.groupBy("o_orderpriority").agg(
        F.count("*").cast("double").alias("n"),
        F.count("*").alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.sum(c).cast("double").alias("sc"),
        F.sum((c * c).cast("decimal(38,0)")).cast("double").alias("sqc"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )
    return m.select(
        "o_orderpriority",
        "n_orders",
        "n_customers",
        (F.col("sc") / 100.0 / F.col("n")).alias("avg_price"),
        "min_price",
        "max_price",
        F.when(
            F.col("n_orders") > 1,
            F.sqrt(
                F.greatest(
                    (F.col("n") * F.col("sqc") - F.col("sc") * F.col("sc"))
                    / (F.col("n") * (F.col("n") - F.lit(1.0))),
                    F.lit(0.0),
                )
            )
            / 100.0,
        ).alias("sd_price"),
    )


@query(
    "pivot_status_counts",
    """
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
           CAST(SUM(CASE WHEN o_orderstatus IN ('F', 'O', 'P') THEN 1 ELSE 0 END)
                AS BIGINT) AS n_total
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Real relational pivot: explicit value list so the plan is a single
    # pass (no extra job to discover pivot values — important at scale).
    # n_total is the sum of the pivoted columns (both engines define it
    # over the same explicit status domain), keeping this one scan + one
    # aggregation — no second pass over the fact table.
    orders = load_table(spark, sf_dir, "orders")
    pivoted = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    n_f = F.coalesce("F", F.lit(0)).cast("bigint")
    n_o = F.coalesce("O", F.lit(0)).cast("bigint")
    n_p = F.coalesce("P", F.lit(0)).cast("bigint")
    return pivoted.select(
        "o_orderpriority",
        n_f.alias("n_f"),
        n_o.alias("n_o"),
        n_p.alias("n_p"),
        (n_f + n_o + n_p).alias("n_total"),
    )


@query(
    "rollup_revenue",
    f"""
    SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
           CAST(month(l_shipdate) AS INT) AS ship_month,
           CAST(SUM({_REV_CENTS_DUCK}) AS BIGINT) AS revenue_cents,
           COUNT(*) AS n_items
    FROM lineitem
    GROUP BY ROLLUP (ship_year, ship_month)
    """,
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.year("l_shipdate").cast("int").alias("ship_year"),
        F.month("l_shipdate").cast("int").alias("ship_month"),
        _cents(REVENUE_SQL).alias("rev_cents"),
    )
    return li.rollup("ship_year", "ship_month").agg(
        F.sum("rev_cents").alias("revenue_cents"),
        F.count("*").alias("n_items"),
    )


@query(
    "cube_qty",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM({_QTY_CENTS_DUCK}) AS DOUBLE) / 100.0
             AS sum_qty,
           COUNT(*) AS n_items
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        (F.sum(_cents("l_quantity")).cast("double") / 100.0).alias("sum_qty"),
        F.count("*").alias("n_items"),
    )


# ---------------------------------------------------------------------------
# Join family beyond J1: outer / semi / anti
# ---------------------------------------------------------------------------
@query(
    "join_left_outer_counts",
    """
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def join_left_outer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_semi_nations",
    """
    SELECT c_nationkey, COUNT(*) AS n_customers_with_orders
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_nationkey
    """,
)
def join_semi_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_customers_with_orders"))
    )


@query(
    "join_anti_nations",
    """
    SELECT c_nationkey, COUNT(*) AS n_customers_without_orders
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_nationkey
    """,
)
def join_anti_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_customers_without_orders"))
    )


# ---------------------------------------------------------------------------
# Window functions, top-k, dedup-by-window
# ---------------------------------------------------------------------------
@query(
    "window_rank_topk",
    """
    SELECT p_brand, p_partkey, p_retailprice, rn FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY p_brand
                  ORDER BY p_retailprice DESC, p_partkey) AS INT) AS rn
      FROM part
    ) WHERE rn <= 3
    """,
)
def window_rank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.desc("p_retailprice"), F.asc("p_partkey")
    )
    return (
        part.select(
            "p_brand",
            "p_partkey",
            "p_retailprice",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 3)
    )


@query(
    "window_running_sum",
    f"""
    WITH daily AS (
      SELECT l_returnflag, CAST(l_shipdate AS DATE) AS ship_date,
             CAST(SUM({_REV_CENTS_DUCK}) AS BIGINT) AS day_cents
      FROM lineitem GROUP BY 1, 2
    )
    SELECT l_returnflag, ship_date, day_cents,
           -- NULLS FIRST pins the undated bucket's position: Spark
           -- windows default NULLS FIRST, DuckDB NULLS LAST (r09
           -- degenerate sweep)
           CAST(SUM(day_cents) OVER (PARTITION BY l_returnflag
                ORDER BY ship_date NULLS FIRST
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_cents
    FROM daily
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        "l_returnflag", F.to_date("l_shipdate").alias("ship_date")
    ).agg(F.sum(_cents(REVENUE_SQL)).alias("day_cents"))
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("ship_date")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.select(
        "l_returnflag",
        "ship_date",
        "day_cents",
        F.sum("day_cents").over(w).alias("cum_cents"),
    )


@query(
    "window_lag_delta",
    f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS order_date,
             CAST(SUM({_TP_CENTS_DUCK}) AS DOUBLE)
               / 100.0 / COUNT(*) AS avg_price
      FROM orders GROUP BY 1
    )
    SELECT order_date, avg_price,
           -- NULLS FIRST: see window_running_sum (r09 degenerate sweep)
           avg_price - LAG(avg_price) OVER (ORDER BY order_date NULLS FIRST)
             AS delta_vs_prev
    FROM daily
    """,
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("order_date")).agg(
        (F.sum(_cents("o_totalprice")).cast("double") / 100.0 / F.count("*")).alias(
            "avg_price"
        )
    )
    w = Window.orderBy("order_date")
    return daily.select(
        "order_date",
        "avg_price",
        (F.col("avg_price") - F.lag("avg_price").over(w)).alias("delta_vs_prev"),
    )


@query(
    "dedup_latest_order",
    """
    SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def dedup_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "o_custkey", "o_orderkey", F.to_date("o_orderdate").alias("order_date")
        )
    )


@query(
    "topk_orders",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # orderBy+limit compiles to TakeOrderedAndProject: a per-partition
    # top-k followed by a driver-side merge of k*num_partitions rows —
    # exactly the scalable plan for top-k at 100 TB.
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------
@query(
    "setop_union",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.union(supp).distinct()


@query(
    "setop_intersect",
    """
    SELECT c_custkey AS k FROM customer WHERE c_acctbal > 9000
    INTERSECT
    SELECT o_custkey FROM orders
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.where(F.col("c_acctbal") > 9000)
        .select(F.col("c_custkey").alias("k"))
        .intersect(orders.select(F.col("o_custkey").alias("k")))
    )


@query(
    "setop_except",
    """
    SELECT c_custkey AS k FROM customer
    EXCEPT
    SELECT o_custkey FROM orders
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k")
    )
    # subtract IS SQL EXCEPT (distinct semantics); exceptAll+distinct
    # only matched by accident of c_custkey uniqueness (r06 review)
    return cust.subtract(orders)


# ---------------------------------------------------------------------------
# JSON / semi-structured (F1-F3) and time bucketing (F6/F7) over events
# ---------------------------------------------------------------------------
# Probed-JSON integer domain guard (the cents-guard pattern): values
# past this are dirty-payload noise, not measures — NULLed before any
# SUM so the BIGINT aggregate keeps ~9e6 max-magnitude rows per group
# of exact headroom (same documented-envelope posture as DRIFT_Q and
# CENTS_ABS_MAX; found by r11 fuzz — near-2^63 JSON ints crashed Spark
# ANSI and DuckDB's INT128 readout in one stroke). Text-to-int
# conversion itself rides functions/jsontext (digit-string-only, both
# engines — DuckDB otherwise ROUNDS '0.5' where Spark NULLs it).
PROBE_ABS_MAX = 1_000_000_000_000

_K_TEXT_DUCK = (
    "json_extract_string(CASE WHEN json_valid(props) THEN props END,"
    " '$.k')"
)
_PROBE_TEXT_DUCK = (
    "COALESCE(json_extract_string(CASE WHEN json_valid(props) THEN props END, '$.k'),"
    " json_extract_string(CASE WHEN json_valid(props) THEN props END, '$.key'),"
    " json_extract_string(CASE WHEN json_valid(props) THEN props END, '$.data'),"
    " '-1')"
)


@query(
    "json_extract_events",
    f"""
    WITH p AS (
      SELECT event_type,
             {JT.int_text_duck(_K_TEXT_DUCK)} AS k
      FROM events
    )
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN k BETWEEN -{{K}} AND {{K}} THEN k END)
             AS BIGINT) AS sum_k,
           MIN(k) AS min_k,
           MAX(k) AS max_k
    FROM p GROUP BY event_type
    """.format(K=PROBE_ABS_MAX),
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # int_text guard (functions/jsontext): a non-scalar $.k (nested
    # object/array) extracts as its JSON text and must convert as
    # NULL, not abort the ANSI cast — and fractional/scientific text
    # ('0.5', '1e2') must be NULL in BOTH engines (Spark's try_cast
    # rejects it, DuckDB's ROUNDS it; r11 fuzz seeds 15/19). The SUM
    # additionally rides the PROBE_ABS_MAX domain guard so near-2^63
    # dirty values can't overflow the BIGINT aggregate (crash-vs-
    # INT128-answer split); min/max stay unguarded — single-row
    # readouts can't overflow.
    k = F.expr(JT.int_text_spark("get_json_object(props, '$.k')"))
    # stage k through ONE projection: inlining the guarded expression
    # into all four aggregates re-ran the JSON extraction + regex per
    # aggregate buffer (measured 2x on the bench after the r11 guard
    # landed); the HashAggregate now consumes a computed column
    staged = ev.select("event_type", k.alias("k"))
    # BETWEEN, not ABS: ABS(-2**63) itself overflows int64 under ANSI
    k_sum = F.when(
        F.col("k").between(-PROBE_ABS_MAX, PROBE_ABS_MAX), F.col("k")
    )
    return staged.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k_sum).cast("bigint").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )


@query(
    "json_coalesce_probe",
    f"""
    WITH p AS (
      SELECT event_type,
             {JT.int_text_duck(_PROBE_TEXT_DUCK)} AS v
      FROM events
    )
    SELECT event_type,
           CAST(SUM(CASE WHEN v BETWEEN -{{K}} AND {{K}} THEN v END)
             AS BIGINT) AS sum_probed
    FROM p GROUP BY event_type
    """.format(K=PROBE_ABS_MAX),
)
def json_coalesce_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Mirrors the reference's schema-drift tolerance (F3): probe several
    # candidate JSON paths, take the first non-null
    # (/root/reference/src/transformations/bronze_to_silver.py:124-132).
    ev = load_table(spark, sf_dir, "events")
    probed = F.expr(
        # int_text guard for the same degenerate-payload reason as
        # json_extract_events: a nested $.k probes as its JSON text
        # and must sum as NULL, not abort the cast — and fractional
        # text must NULL identically in both engines. The
        # PROBE_ABS_MAX domain guard (the cents-guard pattern) NULLs
        # values a dirty payload pushes toward int64: two near-2^63
        # k's in one group aborted Spark's ANSI BIGINT sum while
        # DuckDB answered in INT128 and crashed the readout cast (r11
        # fuzz seeds 5/17). BETWEEN, not ABS — ABS(-2^63) overflows.
        JT.int_text_spark(
            "coalesce(get_json_object(props, '$.k'),"
            " get_json_object(props, '$.key'),"
            " get_json_object(props, '$.data'), '-1')"
        )
    )
    guarded = F.when(
        F.col("__p").between(-PROBE_ABS_MAX, PROBE_ABS_MAX), F.col("__p")
    )
    return (
        ev.select("event_type", probed.alias("__p"))
        .groupBy("event_type")
        .agg(F.sum(guarded).cast("bigint").alias("sum_probed"))
    )


@query(
    "json_variant_agg",
    """
    SELECT ({K} % 10)
             AS k_bucket,
           COUNT(*) AS n_events,
           CAST(SUM({K})
             AS BIGINT) AS sum_k
    FROM events
    GROUP BY 1
    """.replace(
        "{K}", JT.int_text_duck(_K_TEXT_DUCK, "INTEGER", canon=True)
    ),
)
def json_variant_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON through Spark 4's VARIANT type: one
    ``parse_json`` per row, typed field access via ``variant_get``.

    Versus ``get_json_object`` (which re-parses the JSON string for
    EVERY path probed), variant parses once into a binary form and all
    subsequent extractions are offset lookups — at 100 TB with several
    probed paths that is the difference between k string parses per row
    and one.  The oracle speaks plain JSON SQL; results match because
    variant extraction is lossless for JSON scalars."""
    ev = load_table(spark, sf_dir, "events")
    # try_ forms: malformed JSON parses to NULL variant, and a
    # non-scalar $.k extracts as NULL instead of aborting the cast
    # (r09 degenerate sweep; oracle mirrors with json_valid+TRY_CAST).
    # Extract as STRING, then try_cast to int — NOT a typed "int"
    # variant_get: the typed path coerces JSON booleans (true → 1)
    # while the oracle's json_extract_string → TRY_CAST chain yields
    # NULL for 'true' (r10 third-wave sweep, a boolean-typed k). The
    # string hop keeps the one-parse variant showcase and makes both
    # engines apply the same text-to-int conversion.
    # canon=True: VARIANT renders JSON decimals canonically ('1.0' ->
    # '1', '-0.0' -> '0') while the oracle's json_extract_string keeps
    # a fractional zero — both sides strip it so every integral-valued
    # decimal converts identically (r11 fuzz seed 19; jsontext note)
    k = F.expr(
        JT.int_text_spark(
            "try_variant_get(try_parse_json(props), '$.k', 'string')",
            "INT",
            canon=True,
        )
    )
    return ev.select(k.alias("k")).groupBy(
        (F.col("k") % 10).alias("k_bucket")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum("k").cast("bigint").alias("sum_k"),
    )


@query(
    "events_hourly",
    f"""
    SELECT CAST(ts AS DATE) AS event_date,
           CAST(extract(hour FROM ts) AS INT) AS event_hour,
           event_type,
           COUNT(*) AS n,
           CAST(SUM({_VAL_CENTS_DUCK}) AS DOUBLE)
             / 100.0 / COUNT(*) AS avg_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.to_date("ts").alias("event_date"),
        F.hour("ts").alias("event_hour"),
        "event_type",
    ).agg(
        F.count("*").alias("n"),
        # events.value is fixed 2-decimal → cents rule, never ROUND(AVG)
        (F.sum(_cents("value")).cast("double") / 100.0 / F.count("*")).alias(
            "avg_value"
        ),
    )


@query(
    "events_daily",
    f"""
    SELECT CAST(ts AS DATE) AS event_date,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM({_VAL_CENTS_DUCK}) AS DOUBLE) / 100.0
             AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.to_date("ts").alias("event_date")).agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        (F.sum(_cents("value")).cast("double") / 100.0).alias("sum_value"),
    )


# No oracle: DataSketches HLL binaries/estimates are engine-specific
# (driver records the rows-only check); the estimate-vs-exact error is
# gated by tests/test_approx_estimators.py::test_sketch_rollup_error.
@query("events_sketch_rollup")
def events_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch-now-merge-later pattern that replaces COUNT(DISTINCT)
    at warehouse scale: build one HLL sketch of user_id per day
    (`hll_sketch_agg`), then roll weeks up by MERGING the daily
    sketches (`hll_union_agg`) — no re-scan of raw events at the
    coarser grain, which is how distinct-user dashboards stay cheap
    over years of data (daily sketches are KBs; raw events are TBs).
    Sketch union is commutative/associative, so the estimate is
    deterministic at any partitioning. Exact weekly distincts ride
    along for the error gate."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk")
    )
    weekly_est = daily.groupBy(F.trunc("d", "week").alias("week")).agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est_users")
    )
    weekly_exact = ev.groupBy(
        F.trunc(F.to_date("ts"), "week").alias("week")
    ).agg(F.countDistinct("user_id").alias("exact_users"))
    return weekly_est.join(weekly_exact, "week").select(
        "week", "est_users", "exact_users"
    )


@query(
    "events_sessionize",
    """
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts > LAG(ts) OVER w + INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      -- NULLS FIRST = Spark's window default; a user holding BOTH
      -- NULL and real timestamps otherwise counts one session more on
      -- the Spark side (NULL rows lead there, trail in DuckDB, and
      -- the lag-IS-NULL boundary lands on a different row — r11 fuzz
      -- seed 0)
      WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id)
    )
    SELECT user_id,
           CAST(SUM(new_session) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM flagged
    GROUP BY user_id
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Batch sessionization via gap detection — the batch oracle for the
    # streaming session_window job in streaming/jobs.py.
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "ts",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts") > F.lag("ts").over(w) + F.expr("INTERVAL '30' MINUTE")),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("new_session").cast("bigint").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


@query(
    "join_asof_prev_purchase",
    """
    -- NULL-time/NULL-user contract, explicit on BOTH sides (r11 fuzz +
    -- fifth degenerate wave): an event with no timestamp has no
    -- "before" (DuckDB's ASOF otherwise pairs it — its inequality
    -- treats the NULL as match-last), a purchase with no timestamp
    -- can never be anyone's most-recent, and NULL user ids join
    -- nothing (equi semantics; the Spark window formulation would
    -- otherwise GROUP them).
    SELECT e.event_id,
           CASE WHEN e.ts IS NOT NULL AND p.ts IS NOT NULL
                THEN 1 ELSE 0 END AS has_prior,
           CASE WHEN e.ts IS NOT NULL AND p.ts IS NOT NULL
                THEN (epoch_us(e.ts) - epoch_us(p.ts)) // 60000000
           END AS gap_minutes
    FROM events e
    ASOF LEFT JOIN (SELECT user_id, ts FROM events
                    WHERE event_type = 'purchase'
                      AND ts IS NOT NULL AND user_id IS NOT NULL) p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
)
def join_asof_prev_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join — an operator Spark lacks natively, composed from
    existing DataFrame ops (SURVEY.md §2.10 custom-operator path (a)).

    For every event, the most recent 'purchase' by the same user at or
    before the event time. Formulation: union the right side in as
    marker rows, then one forward-fill window (``last(..., ignorenulls)``)
    per user ordered by time with markers sorting before same-instant
    events. One shuffle on (user_id), no range explosion — this is the
    scalable shape for 100 TB as-of joins (vs. the O(n·m) theta-join a
    naive formulation produces). Oracle: DuckDB's native ASOF LEFT JOIN.
    """
    ev = load_table(spark, sf_dir, "events")
    # NULL-ts/NULL-user markers can never match under the ASOF
    # contract (see the oracle note) — and a NULL-user marker left in
    # would FILL the NULL-user events sharing its window partition,
    # where join semantics say NULL matches nothing (r11 fuzz)
    markers = ev.where(
        (F.col("event_type") == "purchase")
        & F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
    ).select(
        "user_id",
        "ts",
        F.lit(1).alias("is_marker"),
        F.col("ts").alias("pts"),
        F.lit(None).cast("long").alias("event_id"),
    )
    lefts = ev.select(
        "user_id",
        "ts",
        F.lit(0).alias("is_marker"),
        F.lit(None).cast("timestamp").alias("pts"),
        "event_id",
    )
    u = markers.unionByName(lefts)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.desc("is_marker"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn("prev_pts", F.last("pts", ignorenulls=True).over(w))
    return filled.where(F.col("is_marker") == 0).select(
        "event_id",
        F.col("prev_pts").isNotNull().cast("int").alias("has_prior"),
        F.expr(
            "(unix_micros(ts) - unix_micros(prev_pts)) div 60000000"
        ).alias("gap_minutes"),
    )


@query(
    "window_range_7day",
    f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS order_date,
             datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS day_no,
             COUNT(*) AS n_orders,
             CAST(SUM({_TP_CENTS_DUCK}) AS BIGINT)
               AS day_cents
      FROM orders GROUP BY 1, 2
    )
    SELECT order_date, n_orders,
           CAST(SUM(n_orders) OVER w AS BIGINT) AS n_orders_7d,
           CAST(SUM(day_cents) OVER w AS BIGINT) AS cents_7d
    FROM daily
    WINDOW w AS (ORDER BY day_no RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def window_range_7day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day RANGE frame (value-based, not row-based: gaps in
    the date sequence are handled correctly)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.to_date("o_orderdate").alias("order_date"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "day_no"
        ),
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum(_cents("o_totalprice")).alias("day_cents"),
    )
    w = Window.orderBy("day_no").rangeBetween(-6, Window.currentRow)
    return daily.select(
        "order_date",
        "n_orders",
        F.sum("n_orders").over(w).cast("bigint").alias("n_orders_7d"),
        F.sum("day_cents").over(w).cast("bigint").alias("cents_7d"),
    )


@query(
    "grouping_sets_revenue",
    f"""
    SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
           l_returnflag,
           CAST(SUM({_REV_CENTS_DUCK}) AS BIGINT) AS revenue_cents
    FROM lineitem
    GROUP BY GROUPING SETS ((ship_year), (l_returnflag), ())
    """,
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form behind rollup/cube):
    year totals, flag totals, and the grand total in one pass."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.year("l_shipdate").cast("int").alias("ship_year"),
        "l_returnflag",
        _cents(REVENUE_SQL).alias("rev_cents"),
    )
    li.createOrReplaceTempView("_li_gs")
    return spark.sql(
        """
        SELECT ship_year, l_returnflag,
               SUM(rev_cents) AS revenue_cents
        FROM _li_gs
        GROUP BY GROUPING SETS ((ship_year), (l_returnflag), ())
        """
    )


@query(
    "scalar_subquery_above_avg",
    f"""
    SELECT o_orderpriority, COUNT(*) AS n_above_avg
    FROM orders
    WHERE o_totalprice >
          (SELECT CAST(SUM({_TP_CENTS_DUCK}) AS DOUBLE)
                  / 100.0 / COUNT(*)
           FROM orders)
    GROUP BY o_orderpriority
    """,
)
def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Uncorrelated scalar subquery: computed once, broadcast into the
    # filter. The threshold is the exact cents-average (bitwise equal
    # in both engines) — a fixed-decimal price could otherwise sit
    # inside the fp noise of a plain AVG and flip the comparison.
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_orders_sq")
    return spark.sql(
        f"""
        SELECT o_orderpriority, COUNT(*) AS n_above_avg
        FROM _orders_sq
        WHERE o_totalprice >
              (SELECT CAST(SUM({_TP_CENTS_DUCK}) AS DOUBLE)
                      / 100.0 / COUNT(*)
               FROM _orders_sq)
        GROUP BY o_orderpriority
        """
    )


@query(
    "correlated_small_qty_revenue",
    f"""
    SELECT p_brand,
           COUNT(*) AS n_small_lines,
           CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS small_qty_total,
           CAST(SUM({_cents_duck("l_extendedprice")}) AS BIGINT)
             AS revenue_cents
    FROM lineitem l
    JOIN part ON p_partkey = l.l_partkey
    WHERE l_quantity <
          (SELECT 0.2 * (CAST(SUM(CAST(FLOOR(l2.l_quantity) AS BIGINT)) AS DOUBLE)
                         / COUNT(*))
           FROM lineitem l2
           WHERE l2.l_partkey = l.l_partkey)
    GROUP BY p_brand
    """,
)
def correlated_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q17-style correlated scalar subquery: line items whose
    quantity is below 20% of that part's average quantity, rolled up by
    brand.

    The oracle states it as a genuinely correlated subquery; the Spark
    plan is the decorrelated form Catalyst itself would rewrite to — a
    per-part aggregate joined back on ``l_partkey``.  Both lineitem
    passes shuffle on the same key, so AQE lines the exchanges up, and
    the 2000-row ``part`` dim is broadcast.  The threshold is an exact
    integer ratio (quantities are integral) times 0.2 — bitwise equal
    across engines; money is summed as integer cents.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    thr = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (
            F.lit(0.2)
            * (
                # FLOOR, one spelling both engines: a FRACTIONAL dirty
                # quantity (r11 fuzz) otherwise converts differently —
                # Spark CAST truncates toward zero, DuckDB CAST rounds
                # half-even (-9.6 -> -9 vs -10). Identity on the clean
                # integral domain.
                F.sum(F.floor("l_quantity").cast("bigint")).cast("double")
                / F.count("*")
            )
        ).alias("qty_thr")
    )
    return (
        li.join(thr, li["l_partkey"] == thr["t_partkey"])
        .where(F.col("l_quantity") < F.col("qty_thr"))
        # no broadcast hint: part GROWS with sf (unlike nation/region) —
        # a hard hint would OOM executors at 100 TB; AQE broadcasts it
        # at test scale on its own (r08 review)
        .join(part, li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_small_lines"),
            F.sum(F.floor("l_quantity").cast("bigint")).alias(
                "small_qty_total"
            ),
            F.sum(_cents("l_extendedprice")).alias("revenue_cents"),
        )
    )


@query(
    "q14_promo_revenue_share",
    f"""
    SELECT date_trunc('month', CAST(l_shipdate AS DATE)) AS ship_month,
           (100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN {_REV_CENTS_DUCK}
                     ELSE 0 END) AS DOUBLE))
             / CAST(SUM({_REV_CENTS_DUCK}) AS DOUBLE)
             AS promo_pct,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    GROUP BY 1
    """,
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q14 shape: monthly share of revenue from promo parts — a
    conditional-aggregate ratio riding one fact⋈dim join (dim broadcast,
    one shuffle for the month grain). Both sums are integer cents, so
    the percentage is a ratio of exact integers evaluated in the same
    IEEE order in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev_cents = _cents(REVENUE_SQL)
    promo_cents = F.when(F.col("p_type") == "PROMO", rev_cents).otherwise(
        F.lit(0).cast("bigint")
    )
    return (
        # part grows with sf: leave the strategy to AQE (r08 review)
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .groupBy(
            # F.trunc returns DATE (matching DuckDB's date_trunc on a
            # DATE); F.date_trunc would return a TIMESTAMP
            F.trunc(F.to_date("l_shipdate"), "month").alias("ship_month")
        )
        .agg(
            # try_divide: a month whose revenue nets to 0 cents has an
            # undefined promo share — NULL, matching DuckDB's /0
            # (r09 degenerate sweep)
            F.try_divide(
                F.lit(100.0) * F.sum(promo_cents).cast("double"),
                F.sum(rev_cents).cast("double"),
            ).alias("promo_pct"),
            F.count("*").alias("n_lines"),
        )
    )


# q19-style disjunctive predicate block: three (brand, size-range,
# qty-range) arms OR'd together. Shared by the Spark plan and oracle.
_Q19_ARMS = [
    ("Brand#12", 1, 15, 1, 11),
    ("Brand#23", 1, 25, 10, 20),
    ("Brand#34", 1, 35, 20, 30),
]
_Q19_SQL = " OR ".join(
    f"(p_brand = '{b}' AND p_size BETWEEN {s0} AND {s1} "
    f"AND l_quantity BETWEEN {q0} AND {q1})"
    for b, s0, s1, q0, q1 in _Q19_ARMS
)


@query(
    "q19_disjunctive_revenue",
    f"""
    SELECT COUNT(*) AS n_lines,
           CAST(SUM({_REV_CENTS_DUCK}) AS BIGINT) AS revenue_cents
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE {_Q19_SQL}
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q19 shape: an OR-of-ANDs predicate across both join sides.
    Catalyst extracts the common single-side conjuncts from the
    disjunction (p_brand/p_size arms prune `part` before the join;
    l_quantity bounds prune the fact scan via parquet min/max stats) —
    the classic test that disjunctive filters still reach the scans
    instead of evaluating post-join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    # part grows with sf: leave the strategy to AQE (r08 review)
    joined = li.join(part, li["l_partkey"] == part["p_partkey"])
    return joined.where(F.expr(_Q19_SQL)).agg(
        F.count("*").alias("n_lines"),
        F.sum(_cents(REVENUE_SQL)).alias("revenue_cents"),
    )


@query(
    "join_full_outer_days",
    """
    WITH r AS (
      SELECT CAST(l_shipdate AS DATE) AS d, COUNT(*) AS n_ship
      FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1
    ), o AS (
      SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n_ord
      FROM orders WHERE o_orderpriority = '5-LOW' GROUP BY 1
    )
    SELECT COALESCE(r.d, o.d) AS d,
           COALESCE(r.n_ship, 0) AS n_ship,
           COALESCE(o.n_ord, 0) AS n_ord,
           CAST(r.d IS NULL AS INT) AS only_orders,
           CAST(o.d IS NULL AS INT) AS only_ship
    FROM r FULL OUTER JOIN o ON r.d = o.d
    """,
)
def join_full_outer_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two filtered day-grain aggregates — the
    calendar-alignment shape (which days have shipments but no orders,
    and vice versa). Both inputs are already day-grain aggregates, so
    the outer join is thousands of rows at any input scale; COALESCE
    reconstitutes the key and zero-fills the measures.

    r06 review: the filter was lowercase 'r' (matches zero rows — the
    fixture domain is {'R','A','N'}), so the shipment side was always
    empty and the outer-join semantics silently dead; parity couldn't
    catch it because the oracle degenerated identically. Now 'R', so
    both join sides are live."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    r = (
        li.where(F.col("l_returnflag") == "R")
        .groupBy(F.to_date("l_shipdate").alias("d"))
        .agg(F.count("*").alias("n_ship"))
    )
    o = (
        orders.where(F.col("o_orderpriority") == "5-LOW")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.count("*").alias("n_ord"))
    )
    rj, oj = r.alias("r"), o.alias("o")
    return rj.join(oj, F.col("r.d") == F.col("o.d"), "full_outer").select(
        F.coalesce("r.d", "o.d").alias("d"),
        F.coalesce("r.n_ship", F.lit(0)).alias("n_ship"),
        F.coalesce("o.n_ord", F.lit(0)).alias("n_ord"),
        F.col("r.d").isNull().cast("int").alias("only_orders"),
        F.col("o.d").isNull().cast("int").alias("only_ship"),
    )


Q21_LATE_DAYS = 90
Q21_TOP_K = 20


@query(
    "q21_sole_late_supplier",
    f"""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM lineitem l1
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE CAST(l1.l_shipdate AS DATE)
            > CAST(o.o_orderdate AS DATE) + {Q21_LATE_DAYS}
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND CAST(l3.l_shipdate AS DATE)
                > CAST(o.o_orderdate AS DATE) + {Q21_LATE_DAYS})
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT {Q21_TOP_K}
    """,
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q21 shape — the hardest classic correlated form: per late
    line item, EXISTS another supplier on the same order AND NOT EXISTS
    another *late* supplier on it (i.e. this supplier alone held the
    order up), counted per supplier.

    The oracle keeps both correlated subqueries; the Spark plan is the
    decorrelated chain Catalyst produces for them — a left-SEMI join
    (some other supplier exists) then a left-ANTI join (no other late
    supplier) against the same two lineitem projections, all three
    passes shuffling on l_orderkey so AQE aligns the exchanges; the
    25-row supplier dim is broadcast and the top-k compiles to
    TakeOrderedAndProject. 'Late' is exact integer date arithmetic
    (date + 90 days, Q21_LATE_DAYS) in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")

    late = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .where(
            F.to_date("l_shipdate")
            > F.date_add(F.to_date("o_orderdate"), Q21_LATE_DAYS)
        )
        # od rides along: the NOT EXISTS is correlated on THIS joined
        # order row's date — a pre-filtered "late pairs" frame tested
        # l3's lateness against ANY duplicate order row's date, which
        # diverges when one o_orderkey carries two dates (r11 fuzz
        # seed 0; the permanent fixture's dup orderkey shares a date,
        # which hid it)
        .select(
            "l_orderkey",
            "l_suppkey",
            F.to_date("o_orderdate").alias("od"),
        )
    )
    all_pairs = li.select(
        F.col("l_orderkey").alias("k"), F.col("l_suppkey").alias("sk")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("k3"),
        F.col("l_suppkey").alias("sk3"),
        F.to_date("l_shipdate").alias("sd3"),
    )
    sole_late = late.join(
        all_pairs,
        (late["l_orderkey"] == all_pairs["k"])
        & (late["l_suppkey"] != all_pairs["sk"]),
        "left_semi",
    ).join(
        l3,
        (late["l_orderkey"] == l3["k3"])
        & (late["l_suppkey"] != l3["sk3"])
        & (l3["sd3"] > F.date_add(late["od"], Q21_LATE_DAYS)),
        "left_anti",
    )
    return (
        sole_late.join(
            # supplier grows with sf (the old hint called it a 25-row
            # dim — that is nation): AQE decides (r08 review)
            supplier,
            sole_late["l_suppkey"] == supplier["s_suppkey"],
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(Q21_TOP_K)
    )


@query(
    "null_semantics_probe",
    """
    SELECT l_returnflag,
           COUNT(*) AS n,
           COUNT(NULLIF(l_discount, 0.0)) AS n_discounted,
           CAST(SUM(CASE WHEN NULLIF(l_discount, 0.0) IS NOT DISTINCT FROM
                              CAST(NULL AS DOUBLE)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_disc,
           CAST(SUM(CAST(ROUND(COALESCE(NULLIF(l_discount, 0.0), 0.05)
                               * 100, 0) AS BIGINT)) AS BIGINT)
             AS imputed_disc_pct_sum
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def null_semantics_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL null semantics as data-cleaning ops: NULLIF turns sentinel
    values (zero discount) into real NULLs, COUNT(expr) skips them,
    null-safe equality (<=> / IS NOT DISTINCT FROM) counts them without
    the three-valued-logic trap (= NULL would yield NULL, dropping the
    row from a plain filter), and COALESCE imputes a default — the
    sentinel→NULL→impute round trip every ingest layer needs. The
    testdata itself ships null-free (pinned by filter_null_drop
    returning every row), so the NULLs here are *manufactured* by
    NULLIF, making the semantics observable. Single scan, one partial+
    final agg."""
    li = load_table(spark, sf_dir, "lineitem")
    s = F.expr("nullif(l_discount, 0.0d)")
    null_safe_is_null = F.expr(
        "nullif(l_discount, 0.0d) <=> CAST(NULL AS DOUBLE)"
    )
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.count(s).alias("n_discounted"),
        F.sum(F.when(null_safe_is_null, 1).otherwise(0))
        .cast("bigint")
        .alias("n_zero_disc"),
        F.sum(
            F.expr(
                "CAST(ROUND(COALESCE(nullif(l_discount, 0.0d), 0.05d)"
                " * 100, 0) AS BIGINT)"
            )
        )
        .cast("bigint")
        .alias("imputed_disc_pct_sum"),
    )


@query(
    "proj_string_ops",
    """
    SELECT p_partkey,
           substring(p_name, 1, 5) AS name_prefix,
           replace(p_type, ' ', '_') AS type_snake,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           -- DuckDB split_part(NULL,...) returns '' where Spark
           -- returns NULL; pin NULL-in-NULL-out (r09 degenerate sweep)
           CASE WHEN p_brand IS NULL THEN NULL
                ELSE split_part(p_brand, '_', 1) END AS brand_head,
           CAST(strpos(p_name, 'a') AS INT) AS first_a,
           reverse(p_brand) AS brand_rev,
           CAST(length(p_name) AS INT) AS name_len
    FROM part
    """,
)
def proj_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.split_part(F.col("p_brand"), F.lit("_"), F.lit(1)).alias("brand_head"),
        F.instr("p_name", "a").cast("int").alias("first_a"),
        F.reverse("p_brand").alias("brand_rev"),
        F.length("p_name").cast("int").alias("name_len"),
    )


@query(
    "proj_date_ops",
    """
    SELECT DISTINCT CAST(o_orderdate AS DATE) AS order_date,
           CAST(year(o_orderdate) AS INT) AS y,
           CAST(quarter(o_orderdate) AS INT) AS q,
           CAST(month(o_orderdate) AS INT) AS m,
           CAST(day(o_orderdate) AS INT) AS d,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           -- calendar-edge guard: +30 past 9999-12-01 leaves the
           -- proleptic-Gregorian range Python/Arrow can represent —
           -- both engines COMPUTE year 10000 happily and then crash
           -- at result conversion (r11 fuzz seed 12); an off-calendar
           -- shift is undefined -> NULL, same contract both sides
           CASE WHEN CAST(o_orderdate AS DATE) <= DATE '9999-12-01'
                THEN CAST(o_orderdate AS DATE) + 30 END AS plus_30,
           CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                AS INT) AS days_since_epoch_start
    FROM orders
    """,
)
def proj_date_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return orders.select(
        d.alias("order_date"),
        F.year(d).cast("int").alias("y"),
        F.quarter(d).cast("int").alias("q"),
        F.month(d).cast("int").alias("m"),
        F.dayofmonth(d).cast("int").alias("d"),
        F.last_day(d).alias("month_end"),
        # see the oracle's calendar-edge note (r11 fuzz seed 12)
        F.when(d <= F.lit("9999-12-01").cast("date"), F.date_add(d, 30))
        .alias("plus_30"),
        F.datediff(d, F.lit("1995-01-01").cast("date"))
        .cast("int")
        .alias("days_since_epoch_start"),
    ).distinct()


@query(
    "agg_percentiles",
    f"""
    WITH ranked AS (
      SELECT o_orderpriority,
             {_TP_CENTS_DUCK} AS c,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice) - 1 AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
      -- percentiles are over MEASURED prices only: a NULL price in
      -- the rank domain skewed n while contributing no value, and
      -- ranked NULLS FIRST in Spark vs LAST in DuckDB (r09 sweep)
      WHERE o_totalprice IS NOT NULL
    )
    SELECT o_orderpriority,
    """
    + ",\n".join(
        f"""
           CAST(MAX(CASE WHEN rn = ({q} * (n-1)) // 100 THEN c END) * 100
             + MAX(({q} * (n-1)) % 100)
               * (MAX(CASE WHEN rn = LEAST(({q} * (n-1)) // 100 + 1, n-1)
                      THEN c END)
                  - MAX(CASE WHEN rn = ({q} * (n-1)) // 100 THEN c END))
             AS BIGINT) AS p{q}_cents_x100"""
        for q in (50, 90, 99)
    )
    + """
    FROM ranked
    GROUP BY o_orderpriority
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles in pure integer arithmetic:
    rank positions over the sorted cents, linear interpolation as
    ``100·v_lo + frac·(v_hi − v_lo)`` where ``frac = (q·(n−1)) mod
    100`` — emitted as BIGINT hundredths-of-a-cent, so the value is
    engine-exact by construction. The earlier built-in
    percentile/quantile_cont pair rounded doubles to 4 decimals "to
    absorb 1-ulp interpolation noise" — the exact configuration where
    a 1-ulp difference straddles a ROUND half-tie and the engines'
    ROUND implementations split (r07 review). At 100 TB exact
    percentiles require a per-group sort either way — switch to
    ``approx_percentile`` (KLL/GK sketch) when groups stop fitting."""
    # measured prices only: see the oracle's WHERE comment (r09 sweep)
    orders = load_table(spark, sf_dir, "orders").where(
        "o_totalprice IS NOT NULL"
    )
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    wn = Window.partitionBy("o_orderpriority")
    ranked = orders.select(
        "o_orderpriority",
        _cents("o_totalprice").alias("c"),
        (F.row_number().over(w) - 1).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )

    def pct(q: int) -> F.Column:
        lo = F.expr(f"({q} * (n-1)) DIV 100")
        frac = F.expr(f"({q} * (n-1)) % 100")
        v_lo = F.max(F.when(F.col("rn") == lo, F.col("c")))
        v_hi = F.max(
            F.when(
                F.col("rn") == F.least(lo + 1, F.col("n") - 1), F.col("c")
            )
        )
        return (
            (v_lo * 100 + F.max(frac) * (v_hi - v_lo))
            .cast("bigint")
            .alias(f"p{q}_cents_x100")
        )

    return ranked.groupBy("o_orderpriority").agg(
        pct(50), pct(90), pct(99)
    )


# Rows-only (no oracle: approximate by construction). HyperLogLog++
# sketch — the 100 TB way to count distincts without a full shuffle of
# the distinct keys; relative error ~2.3% at the default rsd=0.05.
@query("agg_approx_distinct")
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey").alias("approx_customers"),
        F.count("*").alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# Explode / unnest (F4) over documents
# ---------------------------------------------------------------------------
@query(
    "explode_tokens",
    """
    SELECT tok, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS n_docs
    FROM (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x != '')) AS tok
      FROM documents
    )
    GROUP BY tok
    """,
)
def explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.expr("filter(split(text, ' '), x -> x != '')")).alias("tok"),
    )
    return toks.groupBy("tok").agg(
        F.count("*").alias("n_occurrences"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


# ---------------------------------------------------------------------------
# Round-2 breadth: TPC-H-flavored patterns the round-1 surface lacked —
# pushdown-friendly range scans, correlated (NOT) EXISTS as semi/anti
# joins, conditional aggregation, argmax (max_by), calendar rollup,
# ntile/percent_rank windows, unpivot, deterministic hash sampling.
# Same determinism rules as above (cents, exact-int ratios).
# ---------------------------------------------------------------------------
@query(
    "q6_discount_revenue",
    f"""
    SELECT CAST(SUM({_cents_duck("l_extendedprice * l_discount")})
                AS BIGINT) AS revenue_cents,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 24
    """,
)
def q6_discount_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q6 shape: every predicate is scan-pushable (range on date,
    between on discount, < on quantity) and the agg is a single partial
    +final SUM — the canonical 'filters must reach the parquet
    row-group stats' query. At 100 TB this reads a fraction of the
    table or it's wrong."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            # raw timestamp bounds, NOT to_date(col) >= date: a
            # function-wrapped column defeats parquet predicate
            # pushdown; ts >= d0 AND ts < d1 is day-exact anyway
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.04, 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_cents("l_extendedprice * l_discount"))
            .cast("bigint")
            .alias("revenue_cents"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "exists_high_qty_orders",
    """
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
    GROUP BY o_orderpriority
    """,
)
def exists_high_qty_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS == left-semi join (one shuffle, no row
    duplication — never an inner join + distinct)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    hits = li.where(F.col("l_quantity") > 45).select("l_orderkey")
    return (
        orders.join(
            hits, orders.o_orderkey == hits.l_orderkey, "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@query(
    "not_exists_big_order_customers",
    f"""
    SELECT c_mktsegment, COUNT(*) AS n_customers,
           CAST(SUM({_cents_duck("c_acctbal")}) AS DOUBLE)
             / 100.0 / COUNT(*) AS avg_acctbal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
    GROUP BY c_mktsegment
    """,
)
def not_exists_big_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated NOT EXISTS == left-anti join."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    big = orders.where(F.col("o_totalprice") > 300000).select("o_custkey")
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            (
                F.sum(_cents("c_acctbal")).cast("double") / 100.0 / F.count("*")
            ).alias("avg_acctbal"),
        )
    )


@query(
    "agg_conditional_shares",
    """
    SELECT l_returnflag,
           COUNT(*) AS n_items,
           COUNT(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
           CAST(COUNT(*) FILTER (WHERE l_quantity > 25) AS DOUBLE)
             / COUNT(*) AS bulk_share,
           COUNT(*) FILTER (WHERE l_discount = 0.0) AS n_undiscounted
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_conditional_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation: one scan, several filtered counts
    (count_if == map-side partial aggregation, never self-joins)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_items"),
        F.count_if(F.col("l_quantity") > 25).alias("n_bulk"),
        (
            F.count_if(F.col("l_quantity") > 25).cast("double") / F.count("*")
        ).alias("bulk_share"),
        F.count_if(F.col("l_discount") == 0.0).alias("n_undiscounted"),
    )


@query(
    "argmax_order_per_customer",
    f"""
    SELECT o_custkey,
           -MAX(struct_pack(
              c := {_TP_CENTS_DUCK},
              nk := -o_orderkey)).nk AS best_orderkey,
           MAX(struct_pack(
              c := {_TP_CENTS_DUCK},
              nk := -o_orderkey)).c AS best_price_cents
    FROM orders
    -- unpriced orders cannot be the argmax: NULL struct fields rank
    -- HIGHEST in DuckDB comparisons but LOWEST in Spark's, so a NULL
    -- price was silently "best" in one engine only (r09 sweep)
    WHERE {_TP_CENTS_DUCK} IS NOT NULL
    GROUP BY o_custkey
    """,
)
def argmax_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax via lexicographic MAX over a (price_cents, -orderkey)
    struct — both engines order structs field-by-field, so ties on
    price break deterministically on the SMALLEST orderkey (bare
    max_by/arg_max tie-breaking is undefined). One hash aggregate —
    no window, no self-join. A struct replaces the earlier
    cents*1e9+orderkey composite integer, whose orderkey slot silently
    overflowed into the price bits once orderkeys pass 1e9 — guaranteed
    at the advertised 100 TB scale (r07 review); struct comparison has
    no such bound."""
    orders = load_table(spark, sf_dir, "orders")
    # NULL-price exclusion: see the oracle's WHERE comment (r09 sweep)
    keyed = orders.where(_cents("o_totalprice").isNotNull()).select(
        "o_custkey",
        F.struct(
            _cents("o_totalprice").alias("c"),
            (-F.col("o_orderkey")).alias("nk"),
        ).alias("s"),
    )
    best = keyed.groupBy("o_custkey").agg(F.max("s").alias("m"))
    return best.select(
        "o_custkey",
        (-F.col("m.nk")).alias("best_orderkey"),
        F.col("m.c").alias("best_price_cents"),
    )


@query(
    "monthly_revenue",
    f"""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           CAST(SUM({_TP_CENTS_DUCK}) AS BIGINT)
             AS revenue_cents,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY 1
    """,
)
def monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar rollup to month grain (F7 generalized past days)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(
        F.trunc("o_orderdate", "month").alias("month")
    ).agg(
        F.sum(_cents("o_totalprice")).cast("bigint").alias("revenue_cents"),
        F.count("*").alias("n_orders"),
    )


@query(
    "ntile_customer_quartiles",
    f"""
    WITH t AS (
      SELECT c_acctbal,
             -- NULLS FIRST matches the Spark decomposition's running
             -- sum (Spark sorts NULLS FIRST, DuckDB LAST; r09 sweep)
             ntile(4) OVER (ORDER BY c_acctbal NULLS FIRST, c_custkey)
               AS quartile
      FROM customer
    )
    SELECT quartile, COUNT(*) AS n,
           CAST(SUM({_cents_duck("c_acctbal")}) AS DOUBLE)
             / 100.0 / COUNT(*) AS avg_acctbal
    FROM t GROUP BY quartile
    """,
)
def ntile_customer_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile over a deterministic total order (tie-broken on the key),
    computed WITHOUT a global single-partition window: each row's
    global position is (rows with a strictly smaller value) + (rank
    within its value group).  The strictly-below counts come from a
    running sum over DISTINCT c_acctbal values — bounded by the value
    domain (fixed range, 2 decimals), not by table size — and the
    intra-value rank is a window partitioned by c_acctbal, which
    distributes.  The bucket then follows arithmetically from ntile's
    spec: with n rows and 4 buckets the first n%4 buckets hold
    floor(n/4)+1 rows, the rest floor(n/4)."""
    cust = load_table(spark, sf_dir, "customer")
    vals = cust.groupBy("c_acctbal").agg(F.count("*").alias("cnt"))
    wv = Window.orderBy("c_acctbal").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    below = vals.select(
        "c_acctbal", (F.sum("cnt").over(wv) - F.col("cnt")).alias("below")
    )
    tot = cust.agg(F.count("*").alias("n_total"))
    wr = Window.partitionBy("c_acctbal").orderBy("c_custkey")
    q = F.floor(F.col("n_total") / 4)
    r = F.col("n_total") % 4
    pos = F.col("below") + F.col("rn")
    big = r * (q + 1)  # rows covered by the r oversized buckets
    bucket = (
        F.when(pos <= big, F.ceil(pos / (q + 1)))
        .otherwise(r + F.ceil((pos - big) / q))
        .cast("int")
    )
    ranked = cust.select(
        "c_acctbal", F.row_number().over(wr).alias("rn")
    )
    # eqNullSafe: a NULL-acctbal customer is a legitimate ranked group
    # (first under NULLS FIRST); the plain equi-join silently dropped
    # those rows from the quartiles (r09 degenerate sweep)
    t = (
        ranked.join(
            below, ranked["c_acctbal"].eqNullSafe(below["c_acctbal"])
        )
        .drop(below["c_acctbal"])
        .crossJoin(F.broadcast(tot))
        .select("c_acctbal", bucket.alias("quartile"))
    )
    return t.groupBy("quartile").agg(
        F.count("*").alias("n"),
        (
            F.sum(_cents("c_acctbal")).cast("double") / 100.0 / F.count("*")
        ).alias("avg_acctbal"),
    )


@query(
    "percent_rank_suppliers",
    """
    SELECT s_suppkey, s_acctbal,
           -- NULLS FIRST matches the Spark decomposition (r09 sweep)
           percent_rank() OVER (ORDER BY s_acctbal NULLS FIRST) AS pr
    FROM supplier
    """,
)
def percent_rank_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank = (rank-1)/(n-1) computed WITHOUT a global window
    over the table: rank-1 is exactly the count of rows with a strictly
    smaller value, taken from a running sum over DISTINCT s_acctbal
    values (bounded by the fixed value domain, not by table size) and
    equi-joined back.  The ratio is exact-int / exact-int → one IEEE
    division, bitwise identical cross-engine, ties sharing a rank by
    construction."""
    sup = load_table(spark, sf_dir, "supplier")
    vals = sup.groupBy("s_acctbal").agg(F.count("*").alias("cnt"))
    wv = Window.orderBy("s_acctbal").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    below = vals.select(
        "s_acctbal", (F.sum("cnt").over(wv) - F.col("cnt")).alias("below")
    )
    tot = sup.agg(F.count("*").alias("n_total"))
    # eqNullSafe: a NULL-acctbal supplier still gets a percent_rank
    # (0 under NULLS FIRST); the equi-join dropped its row entirely
    # (r09 degenerate sweep)
    return (
        sup.join(below, sup["s_acctbal"].eqNullSafe(below["s_acctbal"]))
        .drop(below["s_acctbal"])
        .crossJoin(F.broadcast(tot))
        .select(
            "s_suppkey",
            "s_acctbal",
            F.when(F.col("n_total") > 1,
                   F.col("below").cast("double") / (F.col("n_total") - 1))
            .otherwise(F.lit(0.0))
            .alias("pr"),
        )
    )


@query(
    "unpivot_lineitem_metrics",
    f"""
    SELECT l_orderkey, l_linenumber, 'quantity' AS metric,
           {_QTY_CENTS_DUCK} AS value_cents
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'price',
           {_cents_duck("l_extendedprice")}
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount',
           {_cents_duck("l_discount")}
    FROM lineitem
    """,
)
def unpivot_lineitem_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt via stack(): ONE scan emitting 3 rows per input
    row map-side (the oracle's UNION ALL re-scans per branch; stack is
    the scale shape — n metrics never mean n scans)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(3,"
            f" 'quantity', {_QTY_CENTS_DUCK},"
            f" 'price', {_cents_duck('l_extendedprice')},"
            f" 'discount', {_cents_duck('l_discount')}"
            ") AS (metric, value_cents)"
        ),
    )


@query(
    "events_regexp_bucket",
    """
    SELECT TRY_CAST(NULLIF(regexp_extract(props, '"k":\\s*([0-9]+)', 1),
                           '') AS INT) % 10
             AS k_bucket,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1
    """,
)
def events_regexp_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp extraction from the raw JSON string (the pattern-probe
    cousin of get_json_object), bucketed by modulus.

    No-match handling is NULL-safe on BOTH engines: regexp_extract
    returns '' on a non-matching row and under ANSI a plain
    CAST('' AS INT) would abort the whole job from one drifted props
    row — exactly the schema-drift class proj_try_arithmetic and
    json_coalesce_probe are designed around (r08 review). try_cast
    buckets such rows to NULL instead; the oracle's TRY_CAST(NULLIF)
    states the identical semantics (DuckDB regexp_extract also yields
    '' on no match)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.regexp_extract("props", r'"k":\s*([0-9]+)', 1).try_cast("int")
    return (
        ev.select((k % 10).alias("k_bucket"), "user_id")
        .groupBy("k_bucket")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@query(
    "events_value_histogram",
    f"""
    SELECT CASE WHEN {_money.finite_sql("value")} IS NULL THEN NULL
                ELSE CAST(GREATEST(LEAST(
                       FLOOR({_money.finite_sql("value")} / 50.0), 6),
                       -2147483648) AS INT) END AS bucket,
           COUNT(*) AS n,
           CAST(SUM({_VAL_CENTS_DUCK}) AS BIGINT)
             AS sum_cents
    FROM events
    GROUP BY 1
    """,
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram as integer bucket math (floor/least are
    exact on these fixed-decimal values — no float-boundary risk).

    NULL/NaN/Inf values land in a NULL bucket via an explicit CASE:
    LEAST() SKIPS NULL args in both engines, so without it a
    non-finite reading would silently clamp into bucket 6 — the
    agreement-on-wrong class (r09 degenerate sweep)."""
    ev = load_table(spark, sf_dir, "events")
    # clamp BEFORE the INT cast: a huge finite reading floors past
    # int32 and the ANSI cast aborts if LEAST runs after it (r09 diff
    # review); the GREATEST floor keeps a huge NEGATIVE reading's
    # bucket castable too (it stays its own out-of-range bucket)
    fin = F.expr(_money.finite_sql("value"))
    bucket = F.when(
        fin.isNull(), F.lit(None).cast("int")
    ).otherwise(
        F.greatest(
            F.least(F.floor(fin / 50.0), F.lit(6)),
            F.lit(-2147483648),
        ).cast("int")
    )
    return ev.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n"),
        F.sum(_cents("value")).cast("bigint").alias("sum_cents"),
    )


@query(
    "events_topk_users_per_type",
    """
    WITH c AS (
      SELECT event_type, user_id, COUNT(*) AS n_events
      FROM events GROUP BY 1, 2
    ),
    r AS (
      SELECT event_type, user_id, n_events,
             -- NULLS FIRST = Spark's asc default: a NULL user tying
             -- at the rank-3 boundary otherwise ranks differently
             -- (r11 window audit)
             ROW_NUMBER() OVER (PARTITION BY event_type
                  ORDER BY n_events DESC, user_id NULLS FIRST) AS rn
      FROM c
    )
    SELECT event_type, user_id, n_events, CAST(rn AS INT) AS rank
    FROM r WHERE rn <= 3
    """,
)
def events_topk_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k AFTER aggregation: the ranking runs over
    |types × users| aggregate rows, never raw events — but users per
    type is still corpus-scale, so the row_number is range-SLICED
    (functions/windows.sliced_row_number, r11 window audit) instead of
    one task per event_type; ties broken on user_id (NULLS FIRST both
    engines) for determinism."""
    from ..functions.windows import sliced_row_number

    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("event_type", "user_id").agg(
        F.count("*").alias("n_events")
    )
    ranked = sliced_row_number(
        c,
        ["event_type"],
        [F.desc("n_events"), F.asc_nulls_first("user_id")],
        "rank",
    )
    return ranked.where(F.col("rank") <= 3).select(
        "event_type",
        "user_id",
        "n_events",
        F.col("rank").cast("int").alias("rank"),
    )


@query(
    "events_conversion_join",
    """
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           CAST((epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS BIGINT)
             AS gap_seconds
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND p.ts > c.ts
     AND p.ts <= c.ts + INTERVAL 30 MINUTE
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
)
def events_conversion_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join: click → same-user purchase within 30
    minutes. Equality on user_id carries the shuffle; the time bound is
    a post-join filter per user partition, so cost is O(pairs within
    user), never a time-range theta join over the whole table. The
    streaming twin (streaming/jobs.py::click_purchase_conversions) is
    the same plan with watermark-evicted state."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    j = c.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")
        ),
    )
    # integer microseconds → integer div: exact in both engines
    # (epoch()/unix_timestamp round vs floor differently on sub-second
    # timestamps)
    gap = F.expr(
        "(unix_micros(purchase_ts) - unix_micros(click_ts)) DIV 1000000"
    )
    return j.select(
        "user_id",
        "click_id",
        "purchase_id",
        gap.cast("bigint").alias("gap_seconds"),
    )


@query(
    "q7_nation_trade_volume",
    f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS ship_year,
           CAST(SUM({_REV_CENTS_DUCK}) AS BIGINT) AS revenue_cents,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE n1.n_name IN ('NATION_1', 'NATION_2')
      AND n2.n_name IN ('NATION_1', 'NATION_2')
      AND n1.n_name <> n2.n_name
    GROUP BY 1, 2, 3
    """,
)
def q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q7 shape: two-fact five-way star join with BOTH dim arms
    filtered before joining. The nation filters cut the supplier and
    customer sides at the scan; both nation joins broadcast (25-row
    dim); the fact⋈fact joins shuffle on their keys under AQE. At
    100 TB the win is that filtered dims semi-reduce the fact tables
    before the expensive lineitem⋈orders shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    pair = ("NATION_1", "NATION_2")
    n1 = F.broadcast(
        nation.where(F.col("n_name").isin(*pair)).select(
            F.col("n_nationkey").alias("s_nkey"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    n2 = F.broadcast(
        nation.where(F.col("n_name").isin(*pair)).select(
            F.col("n_nationkey").alias("c_nkey"),
            F.col("n_name").alias("cust_nation"),
        )
    )
    s = supp.join(n1, supp.s_nationkey == n1.s_nkey).select(
        "s_suppkey", "supp_nation"
    )
    c = cust.join(n2, cust.c_nationkey == n2.c_nkey).select(
        "c_custkey", "cust_nation"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(c, orders.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(
            F.sum(_cents(REVENUE_SQL)).cast("bigint").alias("revenue_cents"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "window_first_last_order",
    """
    SELECT DISTINCT o_custkey,
           first_value(o_orderkey) OVER w AS first_orderkey,
           last_value(o_orderkey) OVER w AS last_orderkey,
           CAST(date_diff('day',
                          CAST(first_value(o_orderdate) OVER w AS DATE),
                          CAST(last_value(o_orderdate) OVER w AS DATE))
                AS INT) AS span_days
    FROM orders
    -- NULLS FIRST = Spark's default: a customer holding both NULL
    -- and real order dates otherwise picks different first/last rows
    -- (r11 fuzz hunt seeds 22/27/36/37)
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate NULLS FIRST, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value with an explicit full-partition frame —
    the default frame ends at CURRENT ROW, making bare last_value a
    classic silent bug (it returns the current row). Tie-broken
    ordering keeps both engines deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_orderkey"),
        F.last("o_orderkey").over(w).alias("last_orderkey"),
        F.datediff(
            F.to_date(F.last("o_orderdate").over(w)),
            F.to_date(F.first("o_orderdate").over(w)),
        )
        .cast("int")
        .alias("span_days"),
    ).distinct()


# ---------------------------------------------------------------------------
# Per-group linear regression from exact integer moments
# ---------------------------------------------------------------------------
# OLS of event value (cents) on event day, per event type — the
# time-trend profile an anomaly dashboard fits. All five sufficient
# moments (Sx, Sy, Sxy, Sxx, Syy) are EXACT integer sums carried in
# DECIMAL(38,0) (Spark) / HUGEINT (DuckDB's SUM promotion) — order-
# independent, so cross-engine bitwise-stable without any ROUND — and
# slope/intercept/r are derived from them with one identical
# double-precision expression tree in both engines. x is days since
# the corpus's min date (broadcast 1-row aggregate); per-row products
# fit int64 by the cents domain guard, and the wide sums absorb any
# group size.
# ONE spelling of the OLS readout per quantity, shared verbatim by the
# Spark select and the DuckDB oracle so the guards cannot drift. The
# denominator gates (seasonal_decompose precedent, found by the r10
# second-wave sweep): a group whose events all land on ONE day has
# zero x-variance — Spark's ANSI double division aborts the job while
# DuckDB emits ±Inf/NaN, the crash-vs-answer split again. Two layers
# (r10 advisor): the EXACT all-equal predicate (MIN=MAX of the int64
# input, the overflow-free stand-in for the sx² integer predicate that
# DECIMAL(38,0) can't hold past ~3e19) catches true zero variance even
# where the rounded double tree reads a tiny nonzero denominator — a
# garbage near-infinite slope under the IEEE gate alone — and the IEEE
# `<> 0` compare on the identical double tree both engines evaluate
# still blocks the rounded-to-zero ANSI divide. Both predicates are
# bit-identical cross-engine; undefined fits emit NULL.
_OLS_X_VARIES = "(mnx <> mxx)"
_OLS_Y_VARIES = "(mny <> mxy)"
_OLS_DEN_X = (
    "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
)
_OLS_DEN_Y = (
    "(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
    " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"
)
_OLS_NUM = (
    "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
)
_OLS_SLOPE = (
    f"CASE WHEN {_OLS_X_VARIES} AND {_OLS_DEN_X} <> 0"
    f" THEN {_OLS_NUM} / {_OLS_DEN_X} END"
)
_OLS_INTERCEPT = (
    f"CASE WHEN {_OLS_X_VARIES} AND {_OLS_DEN_X} <> 0 THEN"
    " (CAST(sy AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sxy AS DOUBLE))"
    f" / {_OLS_DEN_X} END"
)
_OLS_R = (
    f"CASE WHEN {_OLS_X_VARIES} AND {_OLS_Y_VARIES}"
    f" AND {_OLS_DEN_X} * {_OLS_DEN_Y} > 0 THEN"
    f" {_OLS_NUM} / sqrt({_OLS_DEN_X} * {_OLS_DEN_Y}) END"
)


def linear_trend(events: DataFrame) -> DataFrame:
    # rows with no usable (x, y) pair are excluded from ALL moments —
    # counting them in n while SUM skipped their NULL products made
    # every statistic silently inconsistent (both engines agreed on
    # the wrong slope; r09 degenerate sweep). NULL ts and non-finite
    # value (guarded _cents → NULL) both drop here, identically in
    # the oracle's ev CTE.
    ev = events.select(
        "event_type",
        F.to_date("ts").alias("d"),
        _cents("value").alias("y"),
    ).where("d IS NOT NULL AND y IS NOT NULL")
    base = ev.agg(F.min("d").alias("d0"))
    m = (
        ev.crossJoin(F.broadcast(base))
        .select(
            "event_type",
            F.datediff("d", "d0").cast("bigint").alias("x"),
            "y",
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            # Moment sums in DECIMAL(38,0) (the agg_higher_moments /
            # z-score precedent): every per-row product stays in int64
            # at the cents guard bound (y² = 9.0e18 at the 3e9-cent
            # edge, just under int64 max), but the SUM does not — TWO
            # max-domain readings in one group overflow a BIGINT syy,
            # which Spark ANSI aborts while DuckDB's SUM(BIGINT)
            # silently promotes to HUGEINT and answers (found by the
            # r10 second-wave degenerate sweep: ±3e7-unit readings at
            # the documented domain edge crashed only the Spark side).
            # All five sums are consumed through CAST(... AS DOUBLE),
            # so DECIMAL(38,0) and HUGEINT carry the same exact
            # integers to the same doubles.
            F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
            F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
            F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias(
                "sxy"
            ),
            F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias(
                "sxx"
            ),
            F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias(
                "syy"
            ),
            # exact zero-variance witnesses for the _OLS_*_VARIES gates
            F.min("x").alias("mnx"),
            F.max("x").alias("mxx"),
            F.min("y").alias("mny"),
            F.max("y").alias("mxy"),
        )
    )
    # Identical double expression tree on both engines: numerators and
    # denominators are doubles OF exact ints, every subsequent op is
    # deterministic IEEE; zero-variance groups gate to NULL (see the
    # _OLS_* constants above, shared verbatim with the oracle).
    return m.select(
        "event_type",
        "n",
        F.expr(_OLS_SLOPE).alias("slope_cents_per_day"),
        F.expr(_OLS_INTERCEPT).alias("intercept_cents"),
        F.expr(_OLS_R).alias("r"),
    )


@query(
    "events_linear_trend",
    f"""
    WITH ev AS MATERIALIZED (
      SELECT event_type, CAST(ts AS DATE) AS d,
             {_VAL_CENTS_DUCK} AS y
      FROM events
      WHERE ts IS NOT NULL AND {_VAL_CENTS_DUCK} IS NOT NULL
    ),
    base AS (SELECT MIN(d) AS d0 FROM ev),
    m AS (
      SELECT event_type, COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy,
             SUM(x*x) AS sxx, SUM(y*y) AS syy,
             MIN(x) AS mnx, MAX(x) AS mxx,
             MIN(y) AS mny, MAX(y) AS mxy
      FROM (SELECT event_type,
                   CAST(date_diff('day', d0, d) AS BIGINT) AS x, y
            FROM ev, base)
      GROUP BY 1
    )
    SELECT event_type, n,
           {_OLS_SLOPE} AS slope_cents_per_day,
           {_OLS_INTERCEPT} AS intercept_cents,
           {_OLS_R} AS r
    FROM m
    """,
)
def events_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type value-over-time OLS from exact integer moments (one
    scan + one map-side-combined aggregate; the min-date scalar is a
    broadcast 1-row frame, not a driver action). At 100 TB the same
    shape holds: the DECIMAL(38,0) moment sums stay exact to ~1e38
    (≈1e19 domain-edge rows per group); Spark's built-in
    regr_slope/regr_intercept/corr (double moments, same single-pass
    plan, approximate equality) remains the escape hatch beyond."""
    return linear_trend(load_table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# Data-quality expectation audit
# ---------------------------------------------------------------------------
# The validation pass a pipeline runs before promoting a batch: null
# keys, domain-range violations, duplicate primary keys, and
# referential orphans, emitted as one (check, bad_rows) frame. In-table
# checks fold into ONE aggregate per table (single scan, map-side
# combined); cross-table checks are anti-join counts on the key —
# every shape here is linear and shuffle-light at any scale.
@query(
    "dq_expectations",
    """
    SELECT 'lineitem_null_orderkey' AS check_name,
           COUNT(*) FILTER (WHERE l_orderkey IS NULL) AS bad_rows
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_qty_out_of_range',
           COUNT(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_nonpositive_price',
           COUNT(*) FILTER (WHERE l_extendedprice <= 0)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_orphan_orderkey',
           COUNT(*) FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'orders_orphan_custkey',
           COUNT(*) FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM customer c
                      WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'orders_duplicate_pk',
           CAST(COALESCE(SUM(cnt - 1), 0) AS BIGINT) FROM (
      SELECT COUNT(*) AS cnt FROM orders GROUP BY o_orderkey
    ) WHERE cnt > 1
    """,
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    # One scan of lineitem for all three in-table checks, then unpivot.
    li_checks = li.agg(
        F.count_if(F.col("l_orderkey").isNull()).alias(
            "lineitem_null_orderkey"
        ),
        F.count_if(
            (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)
        ).alias("lineitem_qty_out_of_range"),
        F.count_if(F.col("l_extendedprice") <= 0).alias(
            "lineitem_nonpositive_price"
        ),
    ).selectExpr(
        "stack(3, "
        "'lineitem_null_orderkey', lineitem_null_orderkey, "
        "'lineitem_qty_out_of_range', lineitem_qty_out_of_range, "
        "'lineitem_nonpositive_price', lineitem_nonpositive_price) "
        "AS (check_name, bad_rows)"
    )
    orphan_li = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti")
        .agg(F.count("*").alias("bad_rows"))
        .select(F.lit("lineitem_orphan_orderkey").alias("check_name"), "bad_rows")
    )
    orphan_orders = (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "left_anti")
        .agg(F.count("*").alias("bad_rows"))
        .select(F.lit("orders_orphan_custkey").alias("check_name"), "bad_rows")
    )
    dup_pk = (
        orders.groupBy("o_orderkey")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") > 1)
        .agg(F.coalesce(F.sum(F.col("cnt") - 1), F.lit(0)).alias("bad_rows"))
        .select(F.lit("orders_duplicate_pk").alias("check_name"), "bad_rows")
    )
    return li_checks.unionByName(orphan_li).unionByName(
        orphan_orders
    ).unionByName(dup_pk)


# ---------------------------------------------------------------------------
# Column-level statistical profile (the per-column companion of the
# expectation audit)
# ---------------------------------------------------------------------------
# The profiling pass an engine runs before onboarding a table: per
# column, row/null/distinct counts and min/max — what drives clipping
# constants, encoding choices, and partition-key selection. ONE
# aggregate computes every stat (multiple COUNT(DISTINCT)s compile to
# a single Expand + two-phase aggregate — one scan, map-side
# combined), then `stack` pivots to the long (column, stats) report.
# Values are normalized to strings (money via exact cents, dates via
# ISO-format cast) so the report schema is column-type-independent —
# and so the cross-engine hash stays exact. At 100 TB swap the exact
# distincts for approx_count_distinct (documented, not default: the
# oracle gate wants exact).
@query(
    "dq_column_profile",
    f"""
    WITH s AS (
      SELECT COUNT(*) AS n_rows,
             COUNT(o_orderkey) AS nn_key,
             COUNT(DISTINCT o_orderkey) AS nd_key,
             CAST(MIN(o_orderkey) AS VARCHAR) AS min_key,
             CAST(MAX(o_orderkey) AS VARCHAR) AS max_key,
             COUNT(o_totalprice) AS nn_price,
             COUNT(DISTINCT {_TP_CENTS_DUCK})
               AS nd_price,
             CAST(MIN({_TP_CENTS_DUCK})
                  AS VARCHAR) AS min_price,
             CAST(MAX({_TP_CENTS_DUCK})
                  AS VARCHAR) AS max_price,
             COUNT(o_orderdate) AS nn_date,
             COUNT(DISTINCT o_orderdate) AS nd_date,
             CAST(MIN(CAST(o_orderdate AS DATE)) AS VARCHAR) AS min_date,
             CAST(MAX(CAST(o_orderdate AS DATE)) AS VARCHAR) AS max_date,
             COUNT(o_orderpriority) AS nn_prio,
             COUNT(DISTINCT o_orderpriority) AS nd_prio,
             MIN(o_orderpriority) AS min_prio,
             MAX(o_orderpriority) AS max_prio
      FROM orders
    )
    SELECT u.col_name,
           s.n_rows,
           CAST(s.n_rows - u.nn AS BIGINT) AS n_null,
           CAST(u.nd AS BIGINT) AS n_distinct,
           u.min_s, u.max_s
    FROM s, LATERAL (
      SELECT * FROM (VALUES
        ('o_orderkey', s.nn_key, s.nd_key, s.min_key, s.max_key),
        ('o_totalprice_cents', s.nn_price, s.nd_price,
         s.min_price, s.max_price),
        ('o_orderdate', s.nn_date, s.nd_date, s.min_date, s.max_date),
        ('o_orderpriority', s.nn_prio, s.nd_prio, s.min_prio, s.max_prio)
      ) AS t(col_name, nn, nd, min_s, max_s)
    ) u
    """,
)
def dq_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cents = _cents("o_totalprice")
    s = orders.agg(
        F.count("*").alias("n_rows"),
        F.count("o_orderkey").alias("nn_key"),
        F.countDistinct("o_orderkey").alias("nd_key"),
        F.min("o_orderkey").cast("string").alias("min_key"),
        F.max("o_orderkey").cast("string").alias("max_key"),
        F.count("o_totalprice").alias("nn_price"),
        F.countDistinct(cents).alias("nd_price"),
        F.min(cents).cast("string").alias("min_price"),
        F.max(cents).cast("string").alias("max_price"),
        F.count("o_orderdate").alias("nn_date"),
        F.countDistinct("o_orderdate").alias("nd_date"),
        F.min(F.col("o_orderdate").cast("date")).cast("string").alias("min_date"),
        F.max(F.col("o_orderdate").cast("date")).cast("string").alias("max_date"),
        F.count("o_orderpriority").alias("nn_prio"),
        F.countDistinct("o_orderpriority").alias("nd_prio"),
        F.min("o_orderpriority").alias("min_prio"),
        F.max("o_orderpriority").alias("max_prio"),
    )
    return s.selectExpr(
        "stack(4, "
        "'o_orderkey', nn_key, nd_key, min_key, max_key, "
        "'o_totalprice_cents', nn_price, nd_price, min_price, max_price, "
        "'o_orderdate', nn_date, nd_date, min_date, max_date, "
        "'o_orderpriority', nn_prio, nd_prio, min_prio, max_prio"
        ") AS (col_name, nn, nd, min_s, max_s)",
        "n_rows",
    ).selectExpr(
        "col_name",
        "n_rows",
        "CAST(n_rows - nn AS BIGINT) AS n_null",
        "CAST(nd AS BIGINT) AS n_distinct",
        "min_s",
        "max_s",
    )


# ---------------------------------------------------------------------------
# Correlated LATERAL subquery join (SQL-native per-group top-k)
# ---------------------------------------------------------------------------
# The SQL-surface twin of the window-function per-group top-k
# (window_rank_topk / events_topk_users_per_type): each customer joins
# the top-3 of THEIR orders by price. Catalyst decorrelates the
# correlated ORDER BY ... LIMIT into WindowGroupLimit (a map-side
# partial top-k BEFORE the shuffle, then a final top-k after — verified
# in tests/test_plans.py), so the lateral form costs the same as the
# hand-written window plan at any scale: no per-customer re-execution,
# no O(customers × orders) anything. o_totalprice passes through with
# NO arithmetic, so the double stays bit-exact in both engines.
@query(
    "join_lateral_top_orders",
    """
    SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders
             WHERE o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey
             LIMIT 3) o
    """,
)
def join_lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_lat_cust")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_lat_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
        FROM _lat_cust c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM _lat_orders
                 WHERE o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey
                 LIMIT 3) o
        """
    )


# ---------------------------------------------------------------------------
# Spark 4 SQL-surface probes: collation, try_ arithmetic, XML extract
# ---------------------------------------------------------------------------
@query(
    "filter_collated_eq",
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE lower(c_mktsegment) = 'building'
    """,
)
def filter_collated_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive equality via Spark 4 collations: the predicate
    compares under UTF8_LCASE instead of wrapping the column in
    lower() — semantically the normalized-equality filter
    (filter_normalized_eq) expressed through the type system. The
    oracle runs the classic lower() form; for ASCII data the two are
    identical, which is exactly what the hash check certifies.
    Collated comparison stays codegen'd JVM like any other predicate —
    no scale difference from the lower() formulation."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.where(
        F.expr("c_mktsegment COLLATE UTF8_LCASE = 'building'")
    ).select("c_custkey", "c_name", "c_mktsegment")


@query(
    "proj_try_arithmetic",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice / nullif(l_quantity - 1, 0) AS price_per_extra_unit,
           TRY_CAST(l_returnflag AS INT) AS flag_as_int,
           l_quantity / nullif(l_discount, 0) AS qty_per_discount_point
    FROM lineitem
    """,
)
def proj_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode-safe defensive arithmetic: Spark 4 runs ANSI SQL by
    default, so a divide-by-zero or bad cast THROWS mid-job instead of
    yielding NULL — on a 100 TB run that's a dead job hours in, from
    one malformed row. try_divide/try_cast give per-row NULL fallback
    without disabling ANSI globally. The oracle expresses the same
    semantics via nullif (DuckDB divides NULL-safely); both l_quantity=1
    (divide-by-zero → NULL) and non-numeric casts are exercised by the
    data, so the hash check covers the fallback rows."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(
            F.col("l_extendedprice"), F.col("l_quantity") - 1
        ).alias("price_per_extra_unit"),
        F.col("l_returnflag").try_cast("int").alias("flag_as_int"),
        F.try_divide("l_quantity", "l_discount").alias(
            "qty_per_discount_point"
        ),
    )


# XML-invalid character class: C0 controls minus \t and \n (\x0B \x0C
# are unrepresentable in XML 1.0 even as char refs; \r is valid but
# line-ending-NORMALIZED by every conforming parser, so it can't
# round-trip either). One spelling — \x escapes parse identically in
# Java regex and RE2; no SQL-literal escaping needed (no backslash
# reaches a string literal: the Spark side passes the pattern via the
# Python API).
_XML_INVALID_RE = "[\\x00-\\x08\\x0B-\\x1F]"


@query(
    "events_xml_extract",
    f"""
    SELECT event_id,
           COALESCE(regexp_replace(event_type, '{_XML_INVALID_RE}', '', 'g'),
                    '') AS xml_type,
           CAST(user_id AS BIGINT) AS xml_user,
           value AS xml_value
    FROM events
    WHERE value IS NOT NULL
    """,
)
def events_xml_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingest path (Spark 4 from_xml): rows arrive as XML payloads
    and are parsed against an explicit schema — the XML twin of the
    from_json bronze→silver path. The payload is built deterministically
    from the row in-plan (the container ships no XML testdata), so the
    oracle can state the expected typed fields directly; what the hash
    check certifies is the from_xml round-trip: typed extraction,
    escaping, and NULL propagation. Parsing is JVM-side (StaxXmlParser),
    schema explicit — same scale posture as from_json with a pinned
    schema: one codegen'd map stage, no inference scan.

    The text field is XML-ESCAPED into the payload (& < > — exactly
    what a real producer must do) and from_xml unescapes it back, so
    the round-trip is lossless for metacharacter-bearing values; a raw
    concat built ill-formed XML that PERMISSIVE-parsed to an all-NULL
    struct while the oracle kept the raw value — a latent divergence
    the fixture's clean enum values masked (r08 review). A NULL
    event_type is emitted as an empty element (COALESCE to '' before
    the concat — otherwise the NULL nulls the entire payload and takes
    xml_user/xml_value with it); an empty element reads back as ''
    (verified), the inherent NULL→'' normalization of XML without
    xsi:nil, and the oracle states the same COALESCE."""
    ev = load_table(spark, sf_dir, "events")
    # XML 1.0 cannot carry C0 controls AT ALL (numeric char refs of
    # them are illegal too) and parsers normalize \\r line endings — a
    # control-char event_type PERMISSIVE-parsed to an all-NULL struct
    # while the oracle kept the raw bytes (r11 fuzz seeds 86-138). A
    # real producer must strip them before payload assembly; both
    # sides strip the identical class (\\t and \\n are valid XML text
    # and round-trip untouched).
    stripped = F.regexp_replace(
        F.col("event_type"), _XML_INVALID_RE, ""
    )
    escaped = F.replace(
        F.replace(
            F.replace(stripped, F.lit("&"), F.lit("&amp;")),
            F.lit("<"),
            F.lit("&lt;"),
        ),
        F.lit(">"),
        F.lit("&gt;"),
    )
    # user_id gets the SAME empty-element treatment as event_type: a
    # NULL anywhere in concat() NULLs the whole payload, so one
    # anonymous event silently erased its type and value after the
    # permissive parse (r09 degenerate sweep); <u></u> reads back as
    # NULL BIGINT, which is what the oracle states.
    xml = F.concat(
        F.lit("<e><t>"),
        F.coalesce(escaped, F.lit("")),
        F.lit("</t><u>"),
        F.coalesce(F.col("user_id").cast("string"), F.lit("")),
        F.lit("</u><v>"),
        F.col("value").cast("string"),
        F.lit("</v></e>"),
    )
    parsed = ev.where(F.col("value").isNotNull()).select(
        "event_id",
        # ignoreSurroundingSpaces defaults TRUE: the parser trimmed
        # leading/trailing \t\n from element text (a whitespace-only
        # type read back '' where the oracle kept '\t\n' — r11 fuzz
        # seed 99); false preserves text verbatim, the lossless
        # round-trip this probe certifies
        F.from_xml(
            xml,
            "t STRING, u BIGINT, v DOUBLE",
            {"ignoreSurroundingSpaces": "false"},
        ).alias("x"),
    )
    return parsed.select(
        "event_id",
        F.col("x.t").alias("xml_type"),
        F.col("x.u").alias("xml_user"),
        F.col("x.v").alias("xml_value"),
    )


# ---------------------------------------------------------------------------
# Window distribution functions (ntile / percent_rank / cume_dist /
# first_value / last_value / nth_value)
# ---------------------------------------------------------------------------
# Closes out the SQL window-function families: ranking (window_rank_topk),
# frames (window_range_7day, window_running_sum), offsets
# (window_lag_delta) are already pinned — this adds the distribution
# and value functions. Determinism: the window orders by
# (o_totalprice cents, o_orderkey) — the trailing unique key means
# every function below is tie-free and bitwise reproducible;
# percent_rank/cume_dist are exact-int divisions, value functions use
# an explicit full-partition frame (their default cumulative frame
# would make last/nth depend on the current row, a classic silent-bug
# default both engines share).
@query(
    "window_distribution_funcs",
    f"""
    SELECT o_orderkey, o_orderpriority,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd,
           first_value({_TP_CENTS_DUCK}) OVER wf
             AS min_cents,
           last_value({_TP_CENTS_DUCK}) OVER wf
             AS max_cents,
           nth_value({_TP_CENTS_DUCK}, 2) OVER wf
             AS second_cents
    FROM orders
    WINDOW
      -- NULLS FIRST pins NULL-price rows to Spark's default ordering
      -- (DuckDB defaults NULLS LAST; r09 degenerate sweep)
      w AS (PARTITION BY o_orderpriority
            ORDER BY {_TP_CENTS_DUCK}
              NULLS FIRST, o_orderkey),
      wf AS (PARTITION BY o_orderpriority
             ORDER BY {_TP_CENTS_DUCK}
               NULLS FIRST, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_distribution_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution + value window functions over per-priority partitions.

    One shuffle on the partition key, one in-partition sort shared by
    both window specs (Catalyst collapses same-ordering windows into a
    single Window node). Partition cardinality is bounded by the
    priority dimension — no single-partition global window."""
    orders = load_table(spark, sf_dir, "orders")
    cents = _cents("o_totalprice")
    w = Window.partitionBy("o_orderpriority").orderBy(
        cents.asc(), F.col("o_orderkey").asc()
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.first_value(cents).over(wf).alias("min_cents"),
        F.last_value(cents).over(wf).alias("max_cents"),
        F.nth_value(cents, 2).over(wf).alias("second_cents"),
    )


# ---------------------------------------------------------------------------
# Map-typed higher-order functions
# ---------------------------------------------------------------------------
# The map twin of hof_array_ops: metrics modeled as map<string,bigint>
# and processed entirely with map HOFs — map_from_arrays,
# transform_values, map_filter — then exploded back to rows for the
# cross-engine gate (map column ordering is engine-defined, exploded
# entries are not). The oracle computes the surviving (key, value)
# rows relationally: what the hash check certifies is that the map
# pipeline neither drops, duplicates, nor mis-scales entries.
MAP_OPS_MIN_CENTS = 2_000_00  # map_filter floor: metrics under $2000 drop


@query(
    "hof_map_ops",
    f"""
    WITH m AS (
      SELECT l_orderkey, l_linenumber,
             {_cents_duck("l_extendedprice")} AS price_cents,
             {_REV_CENTS_DUCK}
               AS net_cents,
             CAST(FLOOR(l_quantity) AS BIGINT) * 100 AS qty_centi
      FROM lineitem WHERE l_orderkey < 100
    ), e AS (
      SELECT l_orderkey, l_linenumber, 'price' AS metric,
             price_cents * 2 AS doubled FROM m
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'net', net_cents * 2 FROM m
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'qty', qty_centi * 2 FROM m
    )
    SELECT l_orderkey, l_linenumber, metric, doubled
    FROM e WHERE doubled >= {MAP_OPS_MIN_CENTS} * 2
    """,
)
def hof_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map_from_arrays → transform_values (×2) → map_filter (floor) →
    explode, all codegen'd JVM map expressions — no shuffle before the
    final explode, which is a narrow Generate."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 100)
    metrics = F.map_from_arrays(
        F.array(F.lit("price"), F.lit("net"), F.lit("qty")),
        F.array(
            _cents("l_extendedprice"),
            _cents(REVENUE_SQL),
            F.expr("CAST(FLOOR(l_quantity) AS BIGINT) * 100"),
        ),
    )
    doubled = F.transform_values(metrics, lambda _, v: v * 2)
    kept = F.map_filter(
        doubled, lambda _, v: v >= F.lit(MAP_OPS_MIN_CENTS * 2)
    )
    return (
        li.select("l_orderkey", "l_linenumber", F.explode(kept).alias("metric", "doubled"))
    )


# ---------------------------------------------------------------------------
# Ordered funnel analysis (view → click → purchase)
# ---------------------------------------------------------------------------
# The product-analytics staple: how many users complete each stage IN
# ORDER — a click only counts after that user's first view, a purchase
# only after that qualifying click. Set-intersection funnels (user did
# all three, any order) overcount; the ordered form needs each stage's
# anchor timestamp. Three narrow aggregations chained by user-key
# joins — at 100 TB each stage shuffles (user_id, one timestamp).
@query(
    "events_funnel_ordered",
    """
    WITH v AS MATERIALIZED (
      SELECT user_id, MIN(ts) AS v_ts FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS MATERIALIZED (
      SELECT e.user_id, MIN(e.ts) AS c_ts
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.v_ts
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS p_ts
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
      GROUP BY e.user_id
    )
    SELECT '1_view' AS stage, COUNT(*) AS n_users FROM v
    UNION ALL
    SELECT '2_click', COUNT(*) FROM c
    UNION ALL
    SELECT '3_purchase', COUNT(*) FROM p
    """,
)
def events_funnel_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def stage(etype, anchor):
        s = ev.where(F.col("event_type") == etype)
        if anchor is not None:
            prev, col = anchor
            s = s.join(prev, "user_id").where(F.col("ts") > F.col(col))
        return s.groupBy("user_id").agg(F.min("ts").alias(f"{etype}_ts"))

    v = stage("view", None)
    c = stage("click", (v, "view_ts"))
    p = stage("purchase", (c, "click_ts"))
    rows = [
        v.agg(F.count("*").alias("n_users")).select(
            F.lit("1_view").alias("stage"), "n_users"
        ),
        c.agg(F.count("*").alias("n_users")).select(
            F.lit("2_click").alias("stage"), "n_users"
        ),
        p.agg(F.count("*").alias("n_users")).select(
            F.lit("3_purchase").alias("stage"), "n_users"
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


# ---------------------------------------------------------------------------
# Retention cohorts (orders)
# ---------------------------------------------------------------------------
# Customers grouped by first-order month; each cohort's active-customer
# count tracked by months-since-first. Months are exact integers
# (year*12 + month) so the offset arithmetic is engine-identical —
# months_between()/date_diff('month') interval semantics differ and
# are avoided. Plan: one agg for cohort anchors, one distinct on
# (customer, month), one join + final agg — every shuffle keyed on
# customer or the small (cohort, offset) pair.
@query(
    "orders_retention_cohorts",
    """
    WITH first AS (
      SELECT o_custkey,
             MIN(year(o_orderdate) * 12 + month(o_orderdate)) AS cohort_ym
      FROM orders GROUP BY o_custkey
    ),
    activity AS (
      SELECT DISTINCT o_custkey,
             year(o_orderdate) * 12 + month(o_orderdate) AS ym
      FROM orders
    )
    SELECT f.cohort_ym, a.ym - f.cohort_ym AS months_since,
           COUNT(*) AS n_active
    FROM activity a JOIN first f ON a.o_custkey = f.o_custkey
    GROUP BY 1, 2
    """,
)
def orders_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    ym = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    first = orders.groupBy("o_custkey").agg(F.min(ym).alias("cohort_ym"))
    activity = orders.select("o_custkey", ym.alias("ym")).distinct()
    return (
        activity.join(first, "o_custkey")
        .groupBy(
            "cohort_ym", (F.col("ym") - F.col("cohort_ym")).alias("months_since")
        )
        .agg(F.count("*").alias("n_active"))
    )


# ---------------------------------------------------------------------------
# Ordered string aggregation (listagg / string_agg)
# ---------------------------------------------------------------------------
# The BI-report staple Spark only gained natively in 4.0: concatenate
# group members in a DEFINED order. Unordered listagg is
# nondeterministic under parallel aggregation (merge order follows
# task completion) — the WITHIN GROUP clause is what makes the result
# reproducible, and the oracle twin (DuckDB string_agg ... ORDER BY)
# hash-matching proves both engines apply it identically.
@query(
    "agg_string_concat",
    """
    SELECT s_nationkey, COUNT(*) AS n_suppliers,
           string_agg(s_name, '|' ORDER BY s_name) AS names
    FROM supplier
    GROUP BY s_nationkey
    """,
)
def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """listagg WITHIN GROUP: one partial+final agg; the sort is
    group-local (bounded by group size), never a global order."""
    sup = load_table(spark, sf_dir, "supplier")
    return sup.groupBy("s_nationkey").agg(
        F.count("*").alias("n_suppliers"),
        F.expr("listagg(s_name, '|') WITHIN GROUP (ORDER BY s_name)").alias(
            "names"
        ),
    )


# ---------------------------------------------------------------------------
# Market-basket co-occurrence (association mining support counts)
# ---------------------------------------------------------------------------
# The frequent-itemset building block: how often are two parts ordered
# together? Pair space is bounded per order (≤13 lineitems in this
# schema — Σ|basket|² per order, the same in-group quadratic bound the
# dedup bucket caps enforce), so the self-join on the order key is the
# correct distributed plan; dedup to DISTINCT (order, part) first so a
# part appearing twice in one order doesn't inflate support.
BASKET_MIN_SUPPORT = 2


@query(
    "basket_part_pairs",
    f"""
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
    SELECT a.l_partkey AS part_a, b2.l_partkey AS part_b,
           COUNT(*) AS support
    FROM b a JOIN b b2
      ON a.l_orderkey = b2.l_orderkey AND a.l_partkey < b2.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= {BASKET_MIN_SUPPORT}
    """,
)
def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select("l_orderkey", "l_partkey").distinct()
    a = b.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a"))
    c = b.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b"))
    return (
        a.join(c, "ok")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("support"))
        .where(F.col("support") >= BASKET_MIN_SUPPORT)
    )


# ---------------------------------------------------------------------------
# ABC / Pareto classification via banded (distributed) prefix sum
# ---------------------------------------------------------------------------
# "Class A parts = top sellers covering 80% of revenue" needs a GLOBAL
# cumulative sum in revenue order — the textbook single-partition
# window trap. The scalable decomposition: band parts by revenue
# magnitude, run the cumulative window WITHIN each band (parallel),
# and add each band's prefix (the total of all higher bands — a
# band-count-sized window, bounded, not corpus-sized). The oracle runs
# the naive global window; hash equality proves the decomposition
# exact. Class edges are exact integer cross-multiplications (80% =
# 4/5, 95% = 19/20) — no float share.
ABC_BAND_CENTS = 1_000_000  # revenue band width ($10k)


@query(
    "orders_abc_classification",
    f"""
    WITH r AS (
      -- a part with NO measurable revenue (every line NULL-priced)
      -- has no place on a revenue Pareto — and its NULL band silently
      -- dropped it from the Spark side's banded join while the plain
      -- window kept it here (r11 fuzz seed 16; skyline precedent)
      SELECT l_partkey,
             CAST(SUM({_REV_CENTS_DUCK}) AS BIGINT) AS rev
      FROM lineitem GROUP BY l_partkey
      HAVING SUM({_REV_CENTS_DUCK}) IS NOT NULL
    ),
    c AS (
      SELECT l_partkey, rev,
             SUM(rev) OVER (ORDER BY rev DESC, l_partkey
                            ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(rev) OVER () AS total
      FROM r
    )
    SELECT l_partkey, rev,
           CASE WHEN cum * 5 <= total * 4 THEN 'A'
                WHEN cum * 20 <= total * 19 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM c
    """,
)
def orders_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded prefix-sum Pareto classes, no single-partition window.

    Three bounded steps: per-part revenue (one shuffle); band totals
    (band count ≈ max_rev / band — tiny) with a band-level running
    prefix; within-band cumulative windows partitioned by band. Global
    cum = higher-bands prefix + in-band cum. Only the band-total frame
    ever passes through a 1-partition window, and it is O(bands)."""
    li = load_table(spark, sf_dir, "lineitem")
    # the ONE cents spelling (identical IEEE tree: precedence already
    # groups l_extendedprice*(1-l_discount) before the *100)
    rev = _cents(REVENUE_SQL)
    r = (
        li.groupBy("l_partkey")
        .agg(F.sum(rev).cast("bigint").alias("rev"))
        .where(F.col("rev").isNotNull())  # see oracle HAVING note
    )
    r = r.withColumn("band", F.expr(f"rev DIV {ABC_BAND_CENTS}"))
    btot = r.groupBy("band").agg(F.sum("rev").alias("brev"))
    wb = Window.orderBy(F.desc("band")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    prefix = btot.select(
        "band",
        F.coalesce(F.sum("brev").over(wb), F.lit(0)).alias("higher"),
        F.sum("brev").over(
            Window.orderBy(F.desc("band")).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total"),
    )
    win = (
        Window.partitionBy("band")
        .orderBy(F.desc("rev"), F.asc("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = (
        r.join(F.broadcast(prefix), "band")
        .withColumn("cum", F.col("higher") + F.sum("rev").over(win))
    )
    cls = (
        F.when(F.col("cum") * 5 <= F.col("total") * 4, "A")
        .when(F.col("cum") * 20 <= F.col("total") * 19, "B")
        .otherwise("C")
    )
    return c.select("l_partkey", "rev", cls.alias("abc_class"))


# ---------------------------------------------------------------------------
# SCD2 interval build (type-2 slowly-changing dimension)
# ---------------------------------------------------------------------------
# Turn an event log into validity intervals: each user's latest event
# type is their "status", valid from its timestamp until the next
# status event. The lead() build is the standard warehouse pattern;
# the open interval (valid_to NULL) marks the current row, flagged as
# an int for the hash gate.
@query(
    "events_scd2_intervals",
    """
    -- NULLS FIRST = Spark's window default; event_type makes the
    -- order total over replayed event_ids whose types differ — the
    -- tied rows carry different statuses, so which one takes the
    -- closing timestamp was engine-dependent (r11 fuzz seed 5)
    SELECT user_id, event_type AS status,
           epoch_us(ts) AS valid_from_us,
           LEAD(epoch_us(ts)) OVER w AS valid_to_us,
           CAST(LEAD(ts) OVER w IS NULL AS INT) AS is_current
    FROM events
    WHERE event_type IN ('signup', 'purchase', 'error')
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY ts NULLS FIRST, event_id, event_type)
    """,
)
def events_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval bounds surface as epoch MICROSECONDS (bigint), not raw
    timestamps — the module's 'timestamps are never emitted directly'
    rule (r06 review: this was the one query violating it, betting on
    both engines agreeing at sub-second precision forever)."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("signup", "purchase", "error")
    )
    w = Window.partitionBy("user_id").orderBy(
        "ts", "event_id", "event_type"  # see oracle ordering note
    )
    us = F.expr("unix_micros(ts)")
    nxt = F.lead(us).over(w)
    return ev.select(
        "user_id",
        F.col("event_type").alias("status"),
        us.alias("valid_from_us"),
        nxt.alias("valid_to_us"),
        nxt.isNull().cast("int").alias("is_current"),
    )


# ---------------------------------------------------------------------------
# Markov transition matrix over event sequences
# ---------------------------------------------------------------------------
# First-order behavioral model: P(next event type | current), counted
# per user sequence (lag/lead windows partitioned by user — state
# bounded per user, fully parallel) with transition probabilities as
# exact integer ratios.
@query(
    "events_markov_transitions",
    """
    WITH s AS (
      SELECT event_type,
             -- NULLS FIRST = Spark's window default (a user holding
             -- both NULL and real timestamps otherwise sequences
             -- differently); event_type closes the order over
             -- replayed event_ids whose types differ — rows tied on
             -- ALL three keys are interchangeable (r11 fuzz + fifth
             -- degenerate wave)
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts NULLS FIRST, event_id,
                                             event_type NULLS FIRST)
               AS nxt
      FROM events
    )
    SELECT event_type AS from_type, nxt AS to_type, COUNT(*) AS n,
           COUNT(*) * 1.0
             / SUM(COUNT(*)) OVER (PARTITION BY event_type) AS p
    FROM s WHERE nxt IS NOT NULL
    GROUP BY 1, 2
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        "ts", "event_id", "event_type"  # see oracle ordering note
    )
    s = ev.select(
        "event_type", F.lead("event_type").over(w).alias("to_type")
    ).where(F.col("to_type").isNotNull())
    counts = s.groupBy(
        F.col("event_type").alias("from_type"), "to_type"
    ).agg(F.count("*").alias("n"))
    wt = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n") * F.lit(1.0) / F.sum("n").over(wt)).alias("p"),
    )


@query("agg_approx_percentile")
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch) — the at-scale
    replacement for the exact `agg_percentiles` query (exact needs a
    per-group sort of raw values; GK holds a bounded sketch). No SQL
    oracle: the sketch is engine-specific, so the driver records a
    rows-only check and tests/test_curation_ops.py gates the error
    against the exact result (accuracy parameter 10000 → rank error
    ≤ 1/10000)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.expr(
            "approx_percentile(o_totalprice, array(0.5, 0.9, 0.99), 10000)"
        ).alias("approx_p"),
        F.count("*").alias("n"),
    ).select(
        "o_orderpriority",
        "n",
        F.col("approx_p")[0].alias("p50"),
        F.col("approx_p")[1].alias("p90"),
        F.col("approx_p")[2].alias("p99"),
    )


# ---------------------------------------------------------------------------
# A/B experiment readout: hash-assigned arms, exact counts, z-statistic
# ---------------------------------------------------------------------------
# The analytics-engine staple the events table was made for: users are
# assigned to arms by a deterministic key hash (the same
# hash-bucketing used for data splits — assignment is reproducible and
# engine-independent), conversion = "user emitted >= 1 purchase
# event with value >= 90" (a plain purchase is near-universal in the
# fixture, which would make the readout degenerate). Every output is
# an EXACT INTEGER per the repo-wide fixed-point policy (DESIGN.md
# float policy): rates become parts-per-million via truncating integer
# division (`div` / `//` both truncate toward zero in Spark and
# DuckDB), and the pooled two-proportion z-statistic is emitted as
# z^2 in basis points — z^2 is a RATIONAL function of the four counts
# (no sqrt needed: with K=k_a+k_b, N=n_a+n_b and
# D = k_b*n_a - k_a*n_b, z^2 = D^2*N / (n_a*n_b*K*(N-K))), so the
# whole readout is closed under int64 arithmetic and bitwise portable
# across engines. The round-3 driver stamp flagged the previous
# float-sqrt + ROUND formulation as the surface's one hash mismatch
# (engine-version-dependent decimal rounding of a binary double); this
# rewrite removes the only continuous output. Sign of the effect is
# `SIGN(D)`. int64 headroom: D^2*N*10^4 < 2^63 holds up to ~1.4e3
# users/arm at this conversion scale; beyond that, shift the readout
# to per-mille (10^1) or emit (D, z-squared numerator, denominator)
# unscaled — the two-aggregate plan shape is unchanged at any scale.
AB_ARM_MOD = 2


@query(
    "events_ab_lift",
    """
    WITH peruser AS (
      SELECT user_id,
             (('0x' || substr(md5(CAST(user_id AS VARCHAR)),1,8))::BIGINT) % 2
               AS arm,
             MAX(CASE WHEN event_type = 'purchase' AND value >= 90
                      THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY 1
    ),
    arms AS (
      SELECT arm, COUNT(*) AS n, SUM(conv) AS k
      FROM peruser GROUP BY 1
    ),
    wide AS (
      SELECT MAX(CASE WHEN arm = 0 THEN n END) AS n_a,
             MAX(CASE WHEN arm = 0 THEN k END) AS k_a,
             MAX(CASE WHEN arm = 1 THEN n END) AS n_b,
             MAX(CASE WHEN arm = 1 THEN k END) AS k_b
      FROM arms
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(k_a AS BIGINT) AS k_a,
           CAST(n_b AS BIGINT) AS n_b, CAST(k_b AS BIGINT) AS k_b,
           CAST((k_a * 1000000) // n_a AS BIGINT) AS rate_a_ppm,
           CAST((k_b * 1000000) // n_b AS BIGINT) AS rate_b_ppm,
           CAST(k_b * n_a - k_a * n_b AS BIGINT) AS lift_num,
           CAST(SIGN(k_b * n_a - k_a * n_b) AS BIGINT) AS lift_sign,
           CAST(((k_b * n_a - k_a * n_b) * (k_b * n_a - k_a * n_b)
                 * (n_a + n_b) * 10000)
                // NULLIF(n_a * n_b * (k_a + k_b)
                          * ((n_a + n_b) - (k_a + k_b)), 0)
                AS BIGINT) AS z_sq_bp
    FROM wide
    """,
)
def events_ab_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion experiment summary, exact-integer fixed-point.

    z^2 (basis points) replaces the float z-score: z^2 is rational in
    the counts, so the readout needs no sqrt and no decimal rounding
    of a double — the failure mode the round-3 driver stamp exposed.
    """
    events = load_table(spark, sf_dir, "events")
    peruser = (
        events.groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") >= 90),
                    1,
                ).otherwise(0)
            ).alias("conv")
        )
        .withColumn(
            "arm",
            F.expr(
                "CAST(conv(substr(md5(CAST(user_id AS STRING)),1,8),16,10)"
                " AS BIGINT) % 2"
            ),
        )
    )
    arms = peruser.groupBy("arm").agg(
        F.count("*").alias("n"), F.sum("conv").alias("k")
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("arm") == 0, F.col("k"))).alias("k_a"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("arm") == 1, F.col("k"))).alias("k_b"),
    )
    # All exact int64: `div` truncates toward zero exactly like
    # DuckDB's `//`. NULLIF guard: a degenerate experiment (pooled
    # rate 0 or 1) has zero variance — z^2 is undefined, reported as
    # NULL, not an error.
    return wide.selectExpr(
        "n_a",
        "k_a",
        "n_b",
        "k_b",
        "(k_a * 1000000L) div n_a AS rate_a_ppm",
        "(k_b * 1000000L) div n_b AS rate_b_ppm",
        "k_b * n_a - k_a * n_b AS lift_num",
        "CAST(SIGN(k_b * n_a - k_a * n_b) AS BIGINT) AS lift_sign",
        "((k_b * n_a - k_a * n_b) * (k_b * n_a - k_a * n_b)"
        " * (n_a + n_b) * 10000L)"
        " div NULLIF(n_a * n_b * (k_a + k_b)"
        "            * ((n_a + n_b) - (k_a + k_b)), 0) AS z_sq_bp",
    )


# ---------------------------------------------------------------------------
# Null-preserving explode (explode_outer / LATERAL VIEW OUTER)
# ---------------------------------------------------------------------------
# F4's sibling semantic: plain explode DROPS rows whose array is NULL
# or empty (the reference relies on that for its zip null-drop);
# explode_outer KEEPS them with a NULL element — the right default
# when unnesting optional child lists (an order with no line items
# must still appear in a per-order report). The probe derives a
# three-way array shape (NULL / empty / populated) from p_size so all
# branches are exercised; DuckDB has no outer unnest, so the oracle
# spells the semantic out: substitute [NULL] for null/empty before
# unnesting — making this query double as executable documentation of
# exactly what explode_outer does.
@query(
    "explode_outer_probe",
    """
    WITH p AS (
      -- non-negative mod: a negative p_size under plain % reaches the
      -- ELSE branch with a bound < 1, where Spark's sequence() counts
      -- DOWN while DuckDB's range() is empty (r11 fuzz seed 43)
      SELECT p_partkey,
             CASE WHEN ((p_size % 4) + 4) % 4 = 0 THEN NULL
                  WHEN ((p_size % 4) + 4) % 4 = 1 THEN []::BIGINT[]
                  ELSE range(1, ((p_size % 4) + 4) % 4 + 1) END AS arr
      FROM part
    )
    SELECT p_partkey,
           CAST(len(arr) AS INT) AS arr_len,
           unnest(CASE WHEN arr IS NULL OR len(arr) = 0
                       THEN [NULL]::BIGINT[] ELSE arr END) AS val
    FROM p
    """,
)
def explode_outer_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    p = part.select(
        "p_partkey",
        F.expr(
            "CASE WHEN pmod(p_size, 4) = 0 THEN NULL "
            "WHEN pmod(p_size, 4) = 1 THEN CAST(array() AS ARRAY<BIGINT>) "
            "ELSE sequence(CAST(1 AS BIGINT), CAST(pmod(p_size, 4) AS BIGINT)) "
            "END"
        ).alias("arr"),
    )
    return p.select(
        "p_partkey",
        F.size("arr").cast("int").alias("arr_len"),
        F.explode_outer("arr").alias("val"),
    )


# ---------------------------------------------------------------------------
# FIFO queue matching (k-th event to k-th event, per entity)
# ---------------------------------------------------------------------------
# Sequential pairing that joins can't express directly: match each
# purchase to its user's k-th click — the positional (FIFO) matching
# used for demand attribution and inventory consumption. The trick:
# ROW_NUMBER both sides within the entity (windows partitioned by
# user — bounded, parallel), then an equi-join on (user, k). Matched
# pairs may be "late" (purchase before its positional click) — those
# are flagged rather than dropped, keeping the accounting total. Gap
# is integer seconds.
@query(
    "events_fifo_match",
    """
    WITH c AS (
      -- NULLS FIRST = Spark's window default: a user holding both
      -- NULL and real timestamps otherwise k-numbers differently
      -- (r11 fuzz seed 16)
      SELECT user_id, event_id AS click_id, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts NULLS FIRST, event_id) AS k
      FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT user_id, event_id AS purchase_id, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts NULLS FIRST, event_id) AS k
      FROM events WHERE event_type = 'purchase'
    )
    SELECT c.user_id, c.k, c.click_id, p.purchase_id,
           CAST((epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS BIGINT)
             AS gap_s,
           CAST(p.ts < c.ts AS INT) AS out_of_order
    FROM c JOIN p ON c.user_id = p.user_id AND c.k = p.k
    """,
)
def events_fifo_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def ranked(etype: str, idcol: str) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        return ev.where(F.col("event_type") == etype).select(
            "user_id",
            F.col("event_id").alias(idcol),
            F.col("ts").alias(f"{idcol}_ts"),
            F.row_number().over(w).alias("k"),
        )

    c = ranked("click", "click_id")
    p = ranked("purchase", "purchase_id")
    gap = F.expr(
        "(unix_micros(purchase_id_ts) - unix_micros(click_id_ts)) DIV 1000000"
    )
    return c.join(p, ["user_id", "k"]).select(
        "user_id",
        "k",
        "click_id",
        "purchase_id",
        gap.cast("bigint").alias("gap_s"),
        (F.col("purchase_id_ts") < F.col("click_id_ts"))
        .cast("int")
        .alias("out_of_order"),
    )


# ---------------------------------------------------------------------------
# Supplier concentration (Herfindahl–Hirschman index per part)
# ---------------------------------------------------------------------------
# Supply-chain risk: how concentrated is each part's supplier base?
# HHI = Σ share_i² collapses algebraically to Σ v_i² / (Σ v_i)² — so
# both sums are EXACT int64 over quantity units and the index is one
# plain division (bitwise cross-engine), no per-share floats. Parts
# near 1.0 are single-sourced (the risk list); the exact-int
# formulation also makes the metric re-aggregatable from per-supplier
# partials.
@query(
    "parts_supplier_hhi",
    """
    WITH v AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS BIGINT) AS q
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT l_partkey,
           COUNT(*) AS n_suppliers,
           CAST(SUM(q) AS BIGINT) AS total_qty,
           CAST(SUM(q * q) AS DOUBLE) / (SUM(q) * SUM(q)) AS hhi
    FROM v GROUP BY l_partkey
    """,
)
def parts_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qexpr = F.expr("CAST(ROUND(l_quantity, 0) AS BIGINT)")
    v = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(qexpr).cast("bigint").alias("q")
    )
    return v.groupBy("l_partkey").agg(
        F.count("*").alias("n_suppliers"),
        F.sum("q").cast("bigint").alias("total_qty"),
        # try_divide: a part whose quantities sum to 0 has an undefined
        # concentration — NULL, matching DuckDB's /0 (Spark's ANSI
        # divide would abort the job instead; r09 degenerate sweep)
        F.try_divide(
            F.sum(F.col("q") * F.col("q")).cast("double"),
            F.sum("q") * F.sum("q"),
        ).alias("hhi"),
    )
