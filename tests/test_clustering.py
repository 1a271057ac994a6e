"""k-means quality gates: the oracle parity test proves both engines
agree; these prove the algorithm actually CLUSTERS."""

from __future__ import annotations

import pyspark.sql.functions as F

from energy_data_pipeline_project_spark.operators import clustering

from .conftest import SF_SMOKE


def test_kmeans_uses_multiple_clusters(spark):
    df = clustering.QUERIES["kmeans_embeddings"](spark, SF_SMOKE)
    n_clusters = df.select("cluster").distinct().count()
    assert n_clusters > 1
    assert df.count() == 500  # every vector assigned exactly once
    assert df.select("vec_id").distinct().count() == 500


def test_kmeans_inertia_monotone_nonincreasing(spark):
    """Lloyd's guarantee: total squared distance never increases with
    more iterations (on the same integer grid + same init)."""
    inertia = {
        it: clustering._kmeans(spark, SF_SMOKE, it)
        .agg(F.sum("dist_sq").alias("s"))
        .collect()[0]["s"]
        for it in (1, 3)
    }
    assert inertia[3] <= inertia[1]
