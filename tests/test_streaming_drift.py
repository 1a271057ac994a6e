"""Streaming PSI drift screen vs the batch monitor.

The integer bucket grid is the deterministic contract: the streamed
fold of the post-split population must equal the batch operator's
new-side counts exactly for any micro-batch slicing. The float PSI is
then identical by construction (same counts through the same
driver-side formula)."""

from __future__ import annotations

import pyspark.sql.functions as F

from energy_data_pipeline_project_spark.operators.warehouse import (
    PSI_BUCKETS,
    PSI_SPLIT_DATE,
    dq_distribution_drift,
    psi_from_counts,
)
from energy_data_pipeline_project_spark.sources.tables import load_table
from energy_data_pipeline_project_spark.streaming.drift import drift_stream

from .conftest import SF_SMOKE


def test_streaming_drift_counts_equal_batch_monitor(spark, tmp_path_factory):
    batch_rows = {
        r.bucket: (r.c_old, r.c_new)
        for r in dq_distribution_drift(spark, SF_SMOKE).collect()
    }
    ref = [batch_rows[b][0] for b in range(PSI_BUCKETS)]
    expected_new = [batch_rows[b][1] for b in range(PSI_BUCKETS)]

    src = str(tmp_path_factory.mktemp("orders-stream"))
    orders = load_table(spark, SF_SMOKE, "orders")
    post = orders.where(
        ~(F.col("o_orderdate") < F.lit(PSI_SPLIT_DATE).cast("timestamp"))
    )
    post.repartition(6).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    q = (
        drift_stream(stream, ref)
        .writeStream.format("memory")
        .queryName("drift_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    emitted = spark.sql("SELECT * FROM drift_stream").collect()
    assert emitted
    last_seen = max(r["n_seen"] for r in emitted)
    assert last_seen == post.count()
    final = {
        r["bucket"]: r["c_new"] for r in emitted if r["n_seen"] == last_seen
    }
    assert [final[b] for b in range(PSI_BUCKETS)] == expected_new
    # PSI and alert flag are functions of the (now proven equal)
    # counts through the same formula
    psi = psi_from_counts(ref, expected_new)
    final_psi = {r["psi"] for r in emitted if r["n_seen"] == last_seen}
    assert final_psi == {psi}
    final_alert = {r["alert"] for r in emitted if r["n_seen"] == last_seen}
    assert final_alert == {psi > 0.25}
    # intermediate emissions are monotone in n_seen and never exceed
    # the final counts (counts only grow)
    for r in emitted:
        assert r["c_new"] <= final[r["bucket"]]


def test_bucket_clamp_handles_out_of_range_amounts(spark):
    """Refund-like (negative) and giant amounts clamp into the grid at
    both ends, so the streamed fold can never wrap a negative index
    while the batch grid silently drops the row (review-pass catch)."""
    from energy_data_pipeline_project_spark.operators.warehouse import (
        psi_bucket_col,
    )

    df = spark.createDataFrame(
        [(-32000.0,), (-0.01,), (0.0,), (1.0,), (10**9 * 1.0,)],
        "o_totalprice double",
    )
    got = [r.bucket for r in df.select(psi_bucket_col()).collect()]
    assert got == [0, 0, 0, 0, PSI_BUCKETS - 1]
