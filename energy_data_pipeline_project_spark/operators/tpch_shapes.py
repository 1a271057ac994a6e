"""The remaining classic TPC-H query shapes (completing all 22).

relational.py already carries q1/q3/q5/q6/q7/q14/q17(correlated avg
threshold)/q19/q21; this module adds the other thirteen — q2 q4 q8 q9
q10 q11 q12 q13 q15 q16 q18 q20 q22 — adapted to the testdata star
schema (which has no ``partsupp`` table and no comment/shipmode/commit
-date columns; the partsupp-dependent shapes are re-expressed over
``lineitem``'s (partkey, suppkey) pairs with the SAME plan shape:
correlated min, HAVING-vs-global-scalar, grouped NOT-IN, half-share
threshold).

Together with relational.py this gives the engine every canonical
analytic plan family: correlated scalar/EXISTS/NOT-EXISTS decorrelation
(q2 q4 q21 q22), multi-way star joins with broadcast dims (q8 q9 q10),
conditional-aggregate ratios (q8 q12 q14), two-level aggregation
(q13 q15 q18 q20), and global-scalar HAVING (q11 q22).

Cross-engine determinism follows the house rules (see relational.py
docstring): integer cents for money, exact int/int ratios as double
division, per-row double arithmetic (bitwise identical across engines)
before any aggregation, DATE-typed date emission, identical aliases.

Scale posture (100 TB): every query filters before joining (predicates
reach the parquet scans), and the fact-fact joins stay AQE-planned
shuffles on their natural keys. Broadcast hints come in two classes:
the fixed-size dims (nation, region) and sub-aggregated scalar frames
are broadcast-safe at ANY scale, while the part/supplier-derived arms
(q2 q8 q9 q11 q15 q20) and q18's data-dependent big-orders frame are
broadcast-safe at bench scale but GROW with sf — F.broadcast is a hard
hint Spark obeys regardless of size, so a true 100 TB deployment drops
those hints and lets AQE pick the join side from runtime sizes (r07
review: the earlier claim that only fixed-size dims are hinted was
wrong). Two-level aggregates reuse the first aggregation's
partitioning where the second groups by a subset key. No Python UDFs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..sources.tables import load_table
from ._registry import make_registry
from .relational import REVENUE_SQL, _cents, _cents_duck, _REV_CENTS_DUCK

QUERIES, ORACLES, query = make_registry()

# The cents-conversion rule is the repo's core determinism invariant:
# ONE definition per engine dialect, imported from relational.py —
# never re-spelled (r06 review: three inline copies had accreted;
# the quantity spelling itself moved there in r07).
from .relational import _QTY_CENTS_DUCK  # noqa: E402

Q2_SIZE = 15
Q2_REGION = "EUROPE"
Q2_TOP_K = 100

Q4_SHIP_LATE_DAYS = 60
Q8_TYPE = "PROMO"
Q8_REGION = "AMERICA"
Q8_NATION = "NATION_3"
Q9_COST_FRAC = "0.1"
Q10_TOP_K = 20
Q11_NATIONS = ("NATION_5", "NATION_6", "NATION_7")
Q11_FRACTION = "0.001"
Q16_EXCLUDED_BRAND = "Brand#1"
Q16_SIZES = (1, 7, 14, 23, 36, 45, 49, 50)
Q18_QTY_CENTS_MIN = 300 * 100
Q18_TOP_K = 100
Q20_NAME_PREFIX = "small"
Q20_SHARE_MULT = 10
Q20_REGION = "AMERICA"
Q22_MOD = 3
Q22_CUTOFF = "1999-01-01"


# ---------------------------------------------------------------------------
# q2 — min-cost supplier: correlated MIN subquery over a multi-join,
# decorrelated into a per-part window min.
# ---------------------------------------------------------------------------
@query(
    "q2_min_cost_supplier",
    f"""
    WITH cost AS MATERIALIZED (
      SELECT p.p_partkey, s.s_suppkey, s.s_name, s.s_acctbal, n.n_name,
             MIN(l.l_extendedprice / l.l_quantity) AS unit_cost
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey AND p.p_size = {Q2_SIZE}
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
                   AND r.r_name = '{Q2_REGION}'
      GROUP BY 1, 2, 3, 4, 5
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, unit_cost
    FROM cost c
    WHERE unit_cost = (SELECT MIN(unit_cost) FROM cost c2
                       WHERE c2.p_partkey = c.p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT {Q2_TOP_K}
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q2 shape — for each qualifying part, the supplier(s) in one
    region achieving the minimum unit cost; the correlated
    ``= (SELECT MIN ...)`` is decorrelated into a window MIN partitioned
    by part key (no extra shuffle beyond the grouped frame's own).

    Adaptation: the schema has no partsupp, so unit cost is
    MIN(l_extendedprice / l_quantity) over the part-supplier's line
    items — a per-row IEEE division, bitwise identical in both engines,
    so the MIN and the equality select the same rows.

    Scale: part (filtered on size, 1/50 selectivity) and the
    nation⋈region supplier arm are broadcast; the only big shuffle is
    the (partkey, suppkey) aggregation, and the window min rides that
    output partitioned by p_partkey."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_size") == Q2_SIZE)
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(
        F.col("r_name") == Q2_REGION
    )
    supp_arm = (
        supplier.join(
            F.broadcast(nation),
            supplier["s_nationkey"] == nation["n_nationkey"],
        )
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(supp_arm), li["l_suppkey"] == supp_arm["s_suppkey"])
        .groupBy("p_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "unit_cost"
            )
        )
    )
    w = Window.partitionBy("p_partkey")
    return (
        cost.withColumn("_min_cost", F.min("unit_cost").over(w))
        .where(F.col("unit_cost") == F.col("_min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "unit_cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(Q2_TOP_K)
    )


# ---------------------------------------------------------------------------
# q4 — order-priority checking: EXISTS against the fact table with a
# cross-table predicate, decorrelated to a left-semi join.
# ---------------------------------------------------------------------------
@query(
    "q4_priority_late_orders",
    f"""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= DATE '1996-07-01'
      AND o.o_orderdate < DATE '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND CAST(l.l_shipdate AS DATE)
                > CAST(o.o_orderdate AS DATE) + {Q4_SHIP_LATE_DAYS})
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_priority_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q4 shape — per-priority count of orders in one quarter that
    had at least one late-shipped line (EXISTS with a predicate joining
    the outer's o_orderdate to the inner's l_shipdate).

    Adaptation: no l_commitdate/l_receiptdate columns, so "late" is
    shipped more than 60 (Q4_SHIP_LATE_DAYS) days after the order date —
    same correlated-EXISTS-with-cross-table-comparison plan shape.

    Scale: the quarter filter reaches the orders scan before the join;
    the semi join shuffles both sides on orderkey and short-circuits on
    first match (no duplicate explosion however many lines are late)."""
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    with_late_line = orders.join(
        li,
        (orders["o_orderkey"] == li["l_orderkey"])
        & (
            F.to_date(li["l_shipdate"])
            > F.date_add(F.to_date(orders["o_orderdate"]), Q4_SHIP_LATE_DAYS)
        ),
        "left_semi",
    )
    return (
        with_late_line.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# q8 — national market share: conditional-aggregate ratio over a
# seven-table star join with both dimension arms filtered.
# ---------------------------------------------------------------------------
@query(
    "q8_market_share",
    f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = '{Q8_NATION}'
                         THEN volume_cents ELSE 0 END) AS DOUBLE)
             / CAST(SUM(volume_cents) AS DOUBLE) AS mkt_share
    FROM (
      SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
             {_REV_CENTS_DUCK} AS volume_cents,
             n2.n_name AS supp_nation
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = '{Q8_TYPE}'
      JOIN orders o ON o.o_orderkey = l.l_orderkey
                   AND o.o_orderdate >= DATE '1996-01-01'
                   AND o.o_orderdate < DATE '1998-01-01'
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n1.n_regionkey
                   AND r.r_name = '{Q8_REGION}'
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q8 — the target nation's share of PROMO (Q8_TYPE)-part trade
    volume sold into AMERICA (Q8_REGION) customers, per order year: a
    seven-table join where customer-nation-region filters one arm and
    supplier-nation labels the other, finished by a
    conditional-sum / total-sum ratio.

    Both sums are exact integer cents; the ratio is a single IEEE
    double division of two exact integers — bitwise identical across
    engines, so no rounding is needed (relational.py float rules).

    Scale: part (1/6 type selectivity) and the two nation dims are
    broadcast; orders carries the two-year window to its scan; the
    lineitem⋈orders backbone is the only large shuffle and AQE plans
    it; the final agg is 2 rows (years)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == Q8_TYPE)
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(
        F.col("r_name") == Q8_REGION
    )
    cust_arm = (
        customer.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    nation["n_regionkey"] == region["r_regionkey"],
                ).select("n_nationkey")
            ),
            customer["c_nationkey"] == F.col("n_nationkey"),
        )
    ).select("c_custkey")
    supp_arm = supplier.join(
        F.broadcast(nation),
        supplier["s_nationkey"] == nation["n_nationkey"],
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    joined = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust_arm, orders["o_custkey"] == cust_arm["c_custkey"])
        .join(F.broadcast(supp_arm), li["l_suppkey"] == supp_arm["s_suppkey"])
        .select(
            F.year("o_orderdate").alias("o_year"),
            _cents(REVENUE_SQL).alias("volume_cents"),
            "supp_nation",
        )
    )
    return (
        joined.groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(
                        F.col("supp_nation") == Q8_NATION,
                        F.col("volume_cents"),
                    ).otherwise(F.lit(0))
                ).cast("double")
                / F.sum("volume_cents").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# q9 — product-type profit: per-row compound money expression summed by
# (nation, year).
# ---------------------------------------------------------------------------
_Q9_AMOUNT_SQL = (
    f"l_extendedprice * (1 - l_discount)"
    f" - p_retailprice * l_quantity * {Q9_COST_FRAC}"
)


@query(
    "q9_product_profit",
    f"""
    SELECT n.n_name AS nation,
           EXTRACT(year FROM o.o_orderdate) AS o_year,
           CAST(SUM({_cents_duck(_Q9_AMOUNT_SQL)})
                AS BIGINT) AS profit_cents
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%red%'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY 1, 2
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q9 shape — profit on 'red' parts by supplier nation and
    order year. Adaptation: with no partsupp.ps_supplycost, cost is
    p_retailprice * quantity * 0.1 (Q9_COST_FRAC) — the same
    join-then-compound-arithmetic plan (part attribute × lineitem
    measure), and the whole amount is computed per row as doubles
    (bitwise identical cross-engine) then summed as integer cents.

    Scale: the LIKE filter prunes part before broadcast; supplier and
    nation broadcast; lineitem⋈orders is the backbone shuffle; the agg
    output is nations × years (bounded)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like("%red%")
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    supp_arm = supplier.join(
        F.broadcast(nation),
        supplier["s_nationkey"] == nation["n_nationkey"],
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(supp_arm), li["l_suppkey"] == supp_arm["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(_cents(_Q9_AMOUNT_SQL)).alias("profit_cents"))
        .orderBy("nation", F.desc("o_year"))
    )


# ---------------------------------------------------------------------------
# q10 — returned-item reporting: quarter × returnflag filter, 4-way
# join, top-k customers by lost revenue.
# ---------------------------------------------------------------------------
@query(
    "q10_returned_items",
    f"""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM({_REV_CENTS_DUCK}) AS BIGINT) AS revenue_cents,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
                 AND o.o_orderdate >= DATE '1996-01-01'
                 AND o.o_orderdate < DATE '1996-04-01'
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                   AND l.l_returnflag = 'R'
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY 1, 2, 4, 5
    ORDER BY revenue_cents DESC, c_custkey
    LIMIT {Q10_TOP_K}
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q10 — customers who returned the most revenue in one
    quarter: returnflag filter on the fact scan, quarter filter on the
    orders scan, nation broadcast for the label, top-20 (Q10_TOP_K) by
    summed cents with a unique-key tie-break (custkey) so the LIMIT is
    deterministic cross-engine.

    Scale: both filters push to their scans; lineitem⋈orders shuffles
    on orderkey, then the customer-grain agg re-shuffles on custkey;
    ORDER+LIMIT compiles to TakeOrderedAndProject (no global sort)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    )
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(
            F.broadcast(nation),
            customer["c_nationkey"] == nation["n_nationkey"],
        )
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_cents(REVENUE_SQL)).alias("revenue_cents"))
        .select(
            "c_custkey", "c_name", "revenue_cents", "c_acctbal", "n_name"
        )
        .orderBy(F.desc("revenue_cents"), "c_custkey")
        .limit(Q10_TOP_K)
    )


# ---------------------------------------------------------------------------
# q11 — important parts: grouped value vs a global-scalar fraction
# (HAVING against an uncorrelated subquery).
# ---------------------------------------------------------------------------
_Q11_NATIONS_SQL = ", ".join(f"'{n}'" for n in Q11_NATIONS)


@query(
    "q11_important_parts",
    f"""
    WITH pv AS MATERIALIZED (
      SELECT l.l_partkey AS p_partkey,
             CAST(SUM({_cents_duck("l_extendedprice")})
                  AS BIGINT) AS value_cents
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
                   AND n.n_name IN ({_Q11_NATIONS_SQL})
      GROUP BY 1
    )
    SELECT p_partkey, value_cents
    FROM pv
    WHERE value_cents > {Q11_FRACTION}
                        * (SELECT CAST(SUM(value_cents) AS DOUBLE) FROM pv)
    ORDER BY value_cents DESC, p_partkey
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q11 shape — parts whose held value (within a supplier
    nation group) exceeds a fixed fraction of the group's total value:
    grouped aggregate HAVING against an uncorrelated global scalar.

    Adaptation: value is summed l_extendedprice cents over the nations'
    line items (no partsupp availqty×supplycost). The threshold compare
    is exact-int > double(exact-int × fraction) — deterministic because
    both factors are bitwise identical cross-engine.

    Scale: the per-part frame is computed ONCE and reused for both the
    global sum (1-row agg, broadcast back via crossJoin) and the
    filter — no second scan of lineitem; the supplier-nation arm is a
    broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin(*Q11_NATIONS)
    )
    supp_arm = supplier.join(
        F.broadcast(nation),
        supplier["s_nationkey"] == nation["n_nationkey"],
    ).select("s_suppkey")
    pv = (
        li.join(F.broadcast(supp_arm), li["l_suppkey"] == supp_arm["s_suppkey"])
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(_cents("l_extendedprice")).alias("value_cents"))
    )
    total = pv.agg(
        F.sum("value_cents").cast("double").alias("_total_cents")
    )
    return (
        pv.crossJoin(F.broadcast(total))
        .where(
            F.col("value_cents")
            > F.expr(f"{Q11_FRACTION} * _total_cents")
        )
        .select("p_partkey", "value_cents")
        .orderBy(F.desc("value_cents"), "p_partkey")
    )


# ---------------------------------------------------------------------------
# q12 — shipping-delay buckets × order priority: conditional counts
# over a fact-fact join.
# ---------------------------------------------------------------------------
@query(
    "q12_delay_priority_counts",
    """
    SELECT CASE WHEN delay_days > 90 THEN 'SLOW'
                WHEN delay_days > 30 THEN 'MEDIUM'
                ELSE 'FAST' END AS delay_bucket,
           COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
             AS high_line_count,
           COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
             AS low_line_count
    FROM (
      SELECT o.o_orderpriority,
             CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE)
               AS delay_days
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE l.l_shipdate >= DATE '1996-01-01'
        AND l.l_shipdate < DATE '1997-01-01'
    )
    GROUP BY 1
    ORDER BY delay_bucket
    """,
)
def q12_delay_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q12 shape — high- vs low-priority line counts per shipping
    bucket. Adaptation: no l_shipmode/commitdate/receiptdate, so the
    bucket is the ship delay (days between order and ship date) binned
    SLOW/MEDIUM/FAST — the same join + CASE + two-conditional-counts
    plan. The delay is exact integer date arithmetic.

    Scale: the year filter reaches the lineitem scan; one shuffle join
    on orderkey; 3-row output."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    delay = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.when(delay > 90, "SLOW")
            .when(delay > 30, "MEDIUM")
            .otherwise("FAST")
            .alias("delay_bucket"),
            "o_orderpriority",
        )
        .groupBy("delay_bucket")
        .agg(
            F.count_if(high).alias("high_line_count"),
            F.count_if(~high).alias("low_line_count"),
        )
        .orderBy("delay_bucket")
    )


# ---------------------------------------------------------------------------
# q13 — customer order-count distribution: outer join with an ON-clause
# filter, then an aggregate OF an aggregate.
# ---------------------------------------------------------------------------
@query(
    "q13_order_count_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                        AND o.o_orderpriority <> '5-LOW'
      GROUP BY 1
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_order_count_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H q13 — how many customers placed how many (non-'5-LOW')
    orders, including zero: the filter must live in the LEFT JOIN's ON
    clause (a WHERE would silently drop the zero-order customers), then
    COUNT(col) skips the nulls the outer join injects, and a second
    aggregation builds the distribution.

    Scale: the first agg shuffles on custkey (the join's own key, so
    AQE coalesces into the join exchange); the second agg's input is
    one row per customer and its key space (distinct counts) is tiny —
    a cheap re-shuffle."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(
            orders,
            (customer["c_custkey"] == orders["o_custkey"])
            & (orders["o_orderpriority"] != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# q15 — top supplier: aggregate CTE reused for its own global max
# (scalar subquery on a derived table).
# ---------------------------------------------------------------------------
@query(
    "q15_top_supplier",
    f"""
    WITH revenue AS MATERIALIZED (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM({_REV_CENTS_DUCK}) AS BIGINT) AS total_revenue_cents
      FROM lineitem
      WHERE l_shipdate >= DATE '1996-01-01'
        AND l_shipdate < DATE '1996-04-01'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue_cents
    FROM supplier s
    JOIN revenue r ON r.supplier_no = s.s_suppkey
    WHERE r.total_revenue_cents = (SELECT MAX(total_revenue_cents)
                                   FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q15 — the supplier(s) with the quarter's maximum revenue:
    the revenue view is built once and compared against its own global
    MAX (uncorrelated scalar on a derived table — the reference pattern
    for "view + scalar subquery" without a CREATE VIEW step).

    Revenue is integer cents, so the equality against MAX is exact —
    ties (multiple top suppliers) resolve identically cross-engine.

    Scale: the revenue frame is supplier-grain (small) and reused for
    both the max (1-row broadcast) and the join; supplier is a dim-side
    broadcast; lineitem is scanned once with the quarter filter pushed."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    supplier = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_cents(REVENUE_SQL)).alias("total_revenue_cents")
    )
    max_rev = revenue.agg(
        F.max("total_revenue_cents").alias("_max_revenue_cents")
    )
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .where(F.col("total_revenue_cents") == F.col("_max_revenue_cents"))
        .join(
            F.broadcast(supplier),
            F.col("supplier_no") == supplier["s_suppkey"],
        )
        .select("s_suppkey", "s_name", "total_revenue_cents")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# q16 — supplier-part relationship counts: NOT IN exclusion + grouped
# COUNT DISTINCT.
# ---------------------------------------------------------------------------
_Q16_SIZES_SQL = ", ".join(str(s) for s in Q16_SIZES)


@query(
    "q16_part_supplier_counts",
    f"""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> '{Q16_EXCLUDED_BRAND}'
      AND p.p_size IN ({_Q16_SIZES_SQL})
      AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                               WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q16 shape — how many distinct (non-excluded) suppliers
    serve each qualifying (brand, type, size): a NOT IN exclusion
    list (suppliers with negative account balance standing in for the
    reference's complaint-comment scan), then grouped COUNT DISTINCT.

    Adaptation: the (partkey, suppkey) pairs come from DISTINCT over
    lineitem instead of partsupp — same downstream plan.

    Scale: the DISTINCT pair projection is the only wide shuffle and
    reads just two int columns off the fact scan; part (brand/size
    filtered) and the tiny exclusion list broadcast (NOT IN with a
    provably non-null subquery side is a left-anti join — no
    null-semantics hazard since s_suppkey is a key)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != Q16_EXCLUDED_BRAND)
        & (F.col("p_size").isin(*Q16_SIZES))
    )
    excluded = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(
            F.broadcast(excluded),
            pairs["l_suppkey"] == excluded["s_suppkey"],
            "left_anti",
        )
        .join(F.broadcast(part), pairs["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# q18 — large-volume orders: HAVING-filtered keys rejoined to the
# facts (IN over a grouped subquery).
# ---------------------------------------------------------------------------
@query(
    "q18_large_volume_customers",
    f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS order_date, o.o_totalprice,
           CAST(SUM({_QTY_CENTS_DUCK}) AS DOUBLE) / 100.0 AS sum_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM({_QTY_CENTS_DUCK}) > {Q18_QTY_CENTS_MIN})
    GROUP BY 1, 2, 3, 4, 5
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT {Q18_TOP_K}
    """,
)
def q18_large_volume_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H q18 — orders whose total quantity exceeds a threshold,
    with their customers: the IN-over-grouped-HAVING subquery becomes a
    semi join against the aggregated key set, then the surviving orders
    re-aggregate their lines. Quantities sum as integer cents (exact),
    emitted back as an exact double.

    Scale: the HAVING aggregate shuffles lineitem once on orderkey; the
    semi join and the final agg reuse that same key, so AQE lines the
    exchanges up; the qualifying-key set is tiny and broadcasts; the
    top-100 (Q18_TOP_K) is TakeOrderedAndProject with o_orderkey as the
    unique tie-break."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    qty_cents = _cents("l_quantity")
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty_cents).alias("_qty_cents"))
        .where(F.col("_qty_cents") > Q18_QTY_CENTS_MIN)
        .select("l_orderkey")
    )
    return (
        li.join(
            F.broadcast(big_orders.withColumnRenamed("l_orderkey", "_bok")),
            li["l_orderkey"] == F.col("_bok"),
            "left_semi",
        )
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(customer, orders["o_custkey"] == customer["c_custkey"])
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.to_date("o_orderdate").alias("order_date"),
            "o_totalprice",
        )
        .agg((F.sum(qty_cents).cast("double") / 100.0).alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(Q18_TOP_K)
    )


# ---------------------------------------------------------------------------
# q20 — dominant-share suppliers: nested per-key aggregate thresholds
# feeding a semi-join chain.
# ---------------------------------------------------------------------------
@query(
    "q20_dominant_share_suppliers",
    f"""
    WITH ps AS MATERIALIZED (
      SELECT l.l_partkey, l.l_suppkey,
             CAST(SUM({_QTY_CENTS_DUCK}) AS BIGINT) AS qty_cents
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
                 AND p.p_name LIKE '{Q20_NAME_PREFIX}%'
      GROUP BY 1, 2
    ), tot AS (
      SELECT l_partkey,
             CAST(SUM(qty_cents) AS BIGINT) AS total_cents
      FROM ps GROUP BY 1
    )
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
                 AND r.r_name = '{Q20_REGION}'
    WHERE s.s_suppkey IN (
      SELECT ps.l_suppkey FROM ps JOIN tot USING (l_partkey)
      WHERE ps.qty_cents * {Q20_SHARE_MULT} > tot.total_cents)
    ORDER BY s_name
    """,
)
def q20_dominant_share_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H q20 shape — suppliers (in one region) who shipped a
    dominant share of some qualifying part: per-(part, supplier)
    quantity vs per-part total, thresholded, then IN → semi join to the
    supplier dim. Adaptation: partsupp.ps_availqty > ½·sum(qty) becomes
    share > 1/10 (Q20_SHARE_MULT) of the part's shipped total; the
    comparison is pure integer arithmetic (qty_cents × 10 (Q20_SHARE_MULT)
    > total_cents) — no division, exact in both engines.

    Scale: the name-filtered part broadcast prunes lineitem before the
    (part, supplier) agg; the per-part total is a second agg OVER THE
    FIRST's output (partkey is a prefix of its grouping key, so the
    re-shuffle moves only the small aggregated frame); the qualifying
    supplier set broadcasts into a semi join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like(f"{Q20_NAME_PREFIX}%")
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(
        F.col("r_name") == Q20_REGION
    )
    qty_cents = _cents("l_quantity")
    ps = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(qty_cents).alias("qty_cents"))
    )
    tot = ps.groupBy("l_partkey").agg(
        F.sum("qty_cents").alias("total_cents")
    )
    dominant = (
        ps.join(tot, "l_partkey")
        .where(F.col("qty_cents") * Q20_SHARE_MULT > F.col("total_cents"))
        .select("l_suppkey")
    )
    region_supp = supplier.join(
        F.broadcast(
            nation.join(
                F.broadcast(region),
                nation["n_regionkey"] == region["r_regionkey"],
            ).select("n_nationkey")
        ),
        supplier["s_nationkey"] == F.col("n_nationkey"),
    )
    return (
        region_supp.join(
            dominant,
            region_supp["s_suppkey"] == dominant["l_suppkey"],
            "left_semi",
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# q22 — dormant high-balance customers: scalar-subquery threshold +
# NOT EXISTS, grouped report.
# ---------------------------------------------------------------------------
@query(
    "q22_dormant_customers",
    f"""
    WITH avg_pos AS (
      SELECT CAST(SUM({_cents_duck("c_acctbal")}) AS DOUBLE)
               / 100.0 / COUNT(*) AS a
      FROM customer WHERE c_acctbal > 0
    )
    SELECT CAST(c.c_custkey % {Q22_MOD} AS INT) AS cust_group,
           COUNT(*) AS numcust,
           CAST(SUM({_cents_duck("c.c_acctbal")}) AS DOUBLE)
             / 100.0 AS totacctbal
    FROM customer c, avg_pos
    WHERE c.c_acctbal > avg_pos.a
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= DATE '{Q22_CUTOFF}')
    GROUP BY 1
    ORDER BY cust_group
    """,
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q22 shape — above-average-balance customers with no recent
    orders, grouped: an uncorrelated scalar subquery (average positive
    balance, exact cents ratio) gates the filter, a NOT EXISTS (anti
    join on the date-filtered orders) selects the dormant, and the
    report groups by a customer-key bucket (standing in for the
    phone-prefix country code the schema lacks; every customer here has
    SOME order, so dormancy is date-scoped).

    Scale: the scalar is a 1-row agg broadcast via crossJoin; the anti
    join's right side carries the date filter to its scan; output is
    Q22_MOD rows."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit(Q22_CUTOFF)
    )
    acct_cents = _cents("c_acctbal")
    avg_pos = (
        customer.where(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(acct_cents).cast("double") / 100.0 / F.count("*")
            ).alias("_avg_pos")
        )
    )
    return (
        customer.crossJoin(F.broadcast(avg_pos))
        .where(F.col("c_acctbal") > F.col("_avg_pos"))
        .join(
            orders,
            customer["c_custkey"] == orders["o_custkey"],
            "left_anti",
        )
        .groupBy(
            (F.col("c_custkey") % Q22_MOD).cast("int").alias("cust_group")
        )
        .agg(
            F.count("*").alias("numcust"),
            (F.sum(acct_cents).cast("double") / 100.0).alias("totacctbal"),
        )
        .orderBy("cust_group")
    )
