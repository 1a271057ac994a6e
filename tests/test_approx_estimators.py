"""Approximate estimators are the 100 TB substitutes for exact
percentiles / COUNT(DISTINCT): pin their error against the exact
answers at test scale so a config regression (accuracy parameter, rsd)
can't silently degrade them."""

from __future__ import annotations

import pyspark.sql.functions as F

from energy_data_pipeline_project_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def test_approx_percentile_within_tolerance(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    row = orders.agg(
        F.expr(
            "percentile(o_totalprice, array(0.5, 0.9))"
        ).alias("exact"),
        F.expr(
            "approx_percentile(o_totalprice, array(0.5, 0.9), 1000)"
        ).alias("approx"),
    ).collect()[0]
    for exact, approx in zip(row["exact"], row["approx"]):
        # accuracy=1000 → rank error <= N/1000; translate loosely to a
        # 2% relative value tolerance on this distribution
        assert abs(approx - exact) <= 0.02 * abs(exact), (exact, approx)


def test_hll_distinct_within_rsd(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    row = li.agg(
        F.countDistinct("l_orderkey").alias("exact"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx"),
    ).collect()[0]
    # 0.02 rsd → 3-sigma bound of 6%
    assert abs(row["approx"] - row["exact"]) <= 0.06 * row["exact"], row


def test_sketch_rollup_error(spark):
    """Merged daily HLL sketches must estimate weekly distinct users
    within 5% of exact (default lgConfigK=12 → ~1.6% rsd; 5% is a
    3-sigma-ish gate)."""
    from energy_data_pipeline_project_spark.operators.relational import (
        QUERIES,
    )

    rows = QUERIES["events_sketch_rollup"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert abs(r["est_users"] - r["exact_users"]) <= max(
            0.05 * r["exact_users"], 2
        ), dict(r.asDict())


def test_dau_mau_sketch_error(spark):
    """The mergeable DAU/MAU (daily HLL sketches, x28 explode on the
    sketch frame) must track the exact (user, day)-grain formulation
    within 5% on both counts, per day — the gate that lets
    events_dau_mau_sketch stand in for events_dau_mau at scale."""
    from energy_data_pipeline_project_spark.operators.warehouse import (
        QUERIES,
    )

    exact = {
        r["d"]: r
        for r in QUERIES["events_dau_mau"](spark, SF_SMOKE).collect()
    }
    est = QUERIES["events_dau_mau_sketch"](spark, SF_SMOKE).collect()
    assert est and set(e["d"] for e in est) == set(exact)
    for e in est:
        x = exact[e["d"]]
        assert abs(e["mau_est"] - x["mau"]) <= max(0.05 * x["mau"], 2), (
            e,
            dict(x.asDict()),
        )
        assert abs(e["dau_est"] - x["dau"]) <= max(0.05 * x["dau"], 2), (
            e,
            dict(x.asDict()),
        )
