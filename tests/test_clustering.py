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


def test_label_spectrum_matches_local_numpy(spark):
    """The grouped-map kernel must reproduce an in-process numpy
    computation exactly (same sort order, same float64 path)."""
    import numpy as np

    from energy_data_pipeline_project_spark.operators.clustering import (
        QUERIES as CQ,
    )
    from energy_data_pipeline_project_spark.sources.tables import load_table

    from .conftest import SF_CORRECT

    got = {
        r["label"]: r
        for r in CQ["embedding_label_spectrum"](spark, SF_CORRECT).collect()
    }
    rows = load_table(spark, SF_CORRECT, "embeddings").collect()
    by_label: dict = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append((r["vec_id"], r["embedding"]))
    assert set(got) == set(by_label)
    for label, vecs in by_label.items():
        vecs.sort()
        m = np.stack([v for _, v in vecs]).astype(np.float64)
        c = np.cov(m, rowvar=False)
        assert got[label]["n_vectors"] == len(vecs)
        assert got[label]["cov_trace"] == round(float(np.trace(c)), 6)
        assert got[label]["top_eigenvalue"] == round(
            float(np.linalg.eigvalsh(c)[-1]), 6
        )


def test_label_spectrum_degenerate_dims(spark):
    """Modal dim 1 and modal dim 0 label groups (r11 fuzz seed 162).

    np.cov(rowvar=False) of an (n, 1) matrix is a 0-D scalar —
    eigvalsh raised LinAlgError and killed the whole job; an all-empty
    group has no spectrum. dim-1 math: top eigenvalue == variance ==
    trace, share 1. The mixed group keeps only its modal (dim-1)
    members."""
    from energy_data_pipeline_project_spark.operators.clustering import (
        label_spectrum,
    )

    df = spark.createDataFrame(
        [
            (1, [0.5], 9),
            (2, [0.7], 9),
            (3, [], 10),
            (4, [], 10),
            # modal dim 1 with a ragged 2-dim outlier (dropped)
            (5, [0.1], 11),
            (6, [0.3], 11),
            (7, [0.1, 0.2], 11),
        ],
        "vec_id long, embedding array<double>, label int",
    )
    got = {r["label"]: r for r in label_spectrum(df).collect()}
    var9 = round(0.02, 6)  # np.cov ddof=1 of [0.5, 0.7]
    assert (got[9]["n_vectors"], got[9]["dim"]) == (2, 1)
    assert got[9]["cov_trace"] == var9
    assert got[9]["top_eigenvalue"] == var9
    assert got[9]["top_eig_share"] == 1.0
    assert (got[10]["n_vectors"], got[10]["dim"]) == (2, 0)
    assert (got[10]["cov_trace"], got[10]["top_eigenvalue"]) == (0.0, 0.0)
    assert (got[11]["n_vectors"], got[11]["dim"]) == (2, 1)
    assert got[11]["top_eig_share"] == 1.0
