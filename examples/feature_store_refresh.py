#!/usr/bin/env python
"""End-to-end feature-store refresh: the warehouse + training
operators composed the way an ML-platform team would run a nightly
refresh.

    python examples/feature_store_refresh.py [sf_dir] [out_dir]

Stages (each an oracle-checked query from the engine surface):

1. CDC apply       — apply the day's changefeed to the base order
                     snapshot and PROVE the reconstruction equals the
                     true target in-plan (cdc_merge_apply; refuse to
                     publish on any mismatch)
2. view refresh    — refresh the orders-x-lineitem revenue view via
                     the 4-term delta-join algebra
                     (join_incremental_maintenance)
3. feature backfill— point-in-time-correct label features, strict
                     past by RANGE-frame construction
                     (training_feature_backfill)
4. drift gate      — Population Stability Index of the order-total
                     distribution; alert when total PSI crosses the
                     industry 0.25 action threshold
                     (dq_distribution_drift)

Outputs a feature lake under ``out_dir``:
    store/view/      refreshed revenue view (parquet)
    store/features/  label features (parquet)
    store/report/    one-row-per-stage refresh report

Everything is a Catalyst plan over the star schema — the script is
composition, not new computation; at 100 TB the same code runs with a
bigger session.
"""

from __future__ import annotations

import os
import sys

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from energy_data_pipeline_project_spark.operators.training import (
    training_feature_backfill,
)
from energy_data_pipeline_project_spark.operators.warehouse import (
    cdc_merge_apply,
    dq_distribution_drift,
    join_incremental_maintenance,
)
from energy_data_pipeline_project_spark.session import get_spark_session

# Industry convention: PSI < 0.1 stable, 0.1-0.25 watch, > 0.25 act.
PSI_ACTION_THRESHOLD = 0.25


def _write_report(spark, report: dict[str, object], out_dir: str) -> None:
    rows = [(k, str(v)) for k, v in sorted(report.items())]
    spark.createDataFrame(rows, "stage string, value string").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{out_dir}/store/report")


def refresh(spark, sf_dir: str, out_dir: str) -> dict[str, object]:
    report: dict[str, object] = {}

    # 1. CDC apply with in-plan proof: a non-zero mismatch means the
    # changefeed and base disagree — publishing would corrupt the
    # store, so the refresh refuses instead.
    merge = cdc_merge_apply(spark, sf_dir).collect()[0]
    report["1_cdc_applied"] = (
        merge.n_inserts + merge.n_updates + merge.n_deletes
    )
    report["1_cdc_mismatch"] = merge.n_mismatch
    if merge.n_mismatch != 0:
        report["status"] = "abort_cdc_mismatch"
        # the refusal IS the event monitoring most needs on disk: a
        # bare return would leave the previous run's "published"
        # report as the latest record (r06 review)
        _write_report(spark, report, out_dir)
        return report

    # 2. drift gate BEFORE any store write: PSI needs only sf_dir, and
    # gating after the view/features overwrites meant a drift_alert
    # report while consumers were already reading the drifted
    # artifacts — the alert protected nothing (r08 review; stage 1's
    # refuse-before-write is the pattern). COALESCE: a zero-row drift
    # frame (empty split populations) sums to NULL and
    # `None <= threshold` crashed the refresh with no report — the
    # stale-report hazard (r07 review); no rows means no observed
    # drift.
    psi = dq_distribution_drift(spark, sf_dir).agg(
        F.coalesce(F.sum("psi_term"), F.lit(0.0)).alias("psi")
    ).collect()[0].psi
    report["2_psi_total"] = psi
    if psi > PSI_ACTION_THRESHOLD:
        report["status"] = "abort_drift_alert"
        _write_report(spark, report, out_dir)
        return report

    # 3. refresh the revenue view through the delta-join algebra
    view = join_incremental_maintenance(spark, sf_dir)
    view.write.mode("overwrite").parquet(f"{out_dir}/store/view")
    report["3_view_days"] = spark.read.parquet(
        f"{out_dir}/store/view"
    ).count()

    # 4. point-in-time features for the label table
    feats = training_feature_backfill(spark, sf_dir)
    feats.write.mode("overwrite").parquet(f"{out_dir}/store/features")
    report["4_features_rows"] = spark.read.parquet(
        f"{out_dir}/store/features"
    ).count()

    report["status"] = "published"
    _write_report(spark, report, out_dir)
    return report


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/feature_store"
    spark = get_spark_session(app_name="feature-store-refresh")
    try:
        report = refresh(spark, sf_dir, out_dir)
    finally:
        spark.stop()
    for k, v in sorted(report.items()):
        print(f"{k}: {v}")
    # published = 0; every abort_* refusal (CDC mismatch, drift) = 1 so
    # a scheduler retries/alerts. The pre-r08 tuple kept a stale
    # 'drift_alert' member after the rename to abort_drift_alert,
    # silently flipping the drift exit code (r08 tests review); drift
    # now aborts BEFORE any write, so a nonzero exit is the correct
    # signal, stated explicitly instead of via a dead tuple.
    return 0 if report.get("status") == "published" else 1


if __name__ == "__main__":
    raise SystemExit(main())
