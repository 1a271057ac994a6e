"""Embedding clustering: distributed Lloyd's k-means, oracle-checked.

The corpus-curation companion to `operators/similarity.py` — semantic
clustering is how large training corpora get grouped for mixture
balancing, topical dedup, and IVF index training (the `ann_topk_ivf`
centroids are exactly a 1-iteration version of this).

Determinism strategy (the whole point — k-means is normally
float-order-dependent): embeddings are quantized to an integer grid
(``floor(v * 10000)``) so every distance is EXACT integer arithmetic,
argmin ties break on the lowest cluster id via a composite
``dist * K + cluster`` BIGINT key (decoded with integer DIV/%), and
centroid updates floor the exact-integer mean. Every step is therefore
bitwise identical across engines, and the DuckDB oracle replays the
SAME three Lloyd iterations as a generated CTE chain — a full
iterative algorithm under the hash-equality gate, not a rows-only
check.

Scale posture (100 TB of embeddings): the melted frame shuffles once
per iteration on ``dim`` (assignment join) and once on ``vec_id``
(update join); centroids are K×D rows — always broadcast. Each
iteration ends in ``localCheckpoint(eager=True)`` because iterative
plans that reference the prior frame twice double per round and
eventually OOM the ANALYZER (same lesson as
``dedup.dedup_cluster_cc``). The melted frame is checkpointed once up
front so iterations re-read a materialized 3-column frame, not the
source parquet. For very high dim counts the melted formulation
trades 64× row inflation for exactness; the float fast path at scale
is the Arrow/BLAS kernel already in ``similarity.ann_topk_numpy``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table
from ._registry import make_registry

QUERIES, ORACLES, query = make_registry()

KMEANS_K = 8
KMEANS_ITERS = 3
KMEANS_QUANT = 10000


def _kmeans_oracle() -> str:
    """Generate the DuckDB twin: the same quantization, init, and
    {KMEANS_ITERS} assign/update rounds as the Spark plan, as one CTE
    chain."""
    from .similarity import VALID_VEC_DUCK

    k, q = KMEANS_K, KMEANS_QUANT
    parts = [
        f"""
    WITH m AS (
      -- VALID_VEC: a NaN/Inf element aborts the integer-grid cast in
      -- both engines (r10 third-wave sweep) — malformed vectors are
      -- not clustered, identically on both sides
      SELECT vec_id, u['d'] AS dim,
             CAST(FLOOR(CAST(u['v'] AS DOUBLE) * {q}) AS BIGINT) AS val
      FROM (SELECT vec_id,
                   unnest(list_transform(generate_series(1, len(embedding)),
                          i -> {{'d': i, 'v': embedding[i]}})) AS u
            FROM embeddings WHERE {VALID_VEC_DUCK})
    ), c0 AS (
      SELECT vec_id AS cluster, dim, val AS cval FROM m WHERE vec_id < {k}
    )"""
    ]
    for it in range(1, KMEANS_ITERS + 1):
        prev = f"c{it - 1}"
        parts.append(
            f""", a{it} AS (
      SELECT vec_id, MIN(dist * {k} + cluster) AS key
      FROM (SELECT m.vec_id, c.cluster,
                   SUM((m.val - c.cval) * (m.val - c.cval)) AS dist
            FROM m JOIN {prev} c USING (dim)
            GROUP BY 1, 2)
      GROUP BY 1
    )"""
        )
        if it < KMEANS_ITERS:
            parts.append(
                f""", c{it} AS (
      SELECT a.key % {k} AS cluster, m.dim,
             CAST(FLOOR(CAST(SUM(m.val) AS DOUBLE) / COUNT(*)) AS BIGINT)
               AS cval
      FROM m JOIN a{it} a USING (vec_id)
      GROUP BY 1, 2
    )"""
            )
    parts.append(
        f"""
    SELECT vec_id, CAST(key % {k} AS BIGINT) AS cluster,
           CAST(key // {k} AS BIGINT) AS dist_sq
    FROM a{KMEANS_ITERS}
    """
    )
    return "".join(parts)


@query("kmeans_embeddings", _kmeans_oracle())
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three Lloyd iterations of k-means (K={KMEANS_K}) over the
    embeddings table on an integer grid; returns every vector's final
    cluster and exact squared distance.

    Init: the first K vec_ids' quantized embeddings. Assignment:
    exact-integer distance argmin with lowest-cluster tie-break via a
    composite BIGINT key (``dist * K + cluster``; max |val| ~ 10^4,
    64 dims → dist < 10^10, so the composite fits comfortably).
    Update: floored exact-integer mean per (cluster, dim) — FLOOR, not
    ROUND, because an integer mean lands exactly on .5 often enough to
    hit the HALF_UP-vs-bankers divergence between engines.

    The DuckDB oracle replays the identical iteration chain (generated
    from the same constants), making this an iterative distributed
    algorithm under the exact hash gate."""
    return _kmeans(spark, sf_dir, KMEANS_ITERS)


def _kmeans(spark: SparkSession, sf_dir: str, iters: int) -> DataFrame:
    from .similarity import VALID_VEC_SPARK

    k = KMEANS_K
    # VALID_VEC mirrors the oracle melt (r10 third-wave sweep)
    emb = load_table(spark, sf_dir, "embeddings").where(VALID_VEC_SPARK)
    melted = (
        emb.select("vec_id", F.posexplode("embedding").alias("pos0", "v"))
        .select(
            "vec_id",
            (F.col("pos0") + 1).cast("bigint").alias("dim"),
            F.floor(F.col("v").cast("double") * KMEANS_QUANT)
            .cast("bigint")
            .alias("val"),
        )
        .localCheckpoint(eager=True)
    )
    cent = melted.where(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cluster"), "dim", F.col("val").alias("cval")
    )
    assign = None
    for it in range(iters):
        dist = (
            melted.join(F.broadcast(cent), "dim")
            .groupBy("vec_id", "cluster")
            .agg(
                F.sum(
                    (F.col("val") - F.col("cval"))
                    * (F.col("val") - F.col("cval"))
                ).alias("dist")
            )
        )
        assign = dist.groupBy("vec_id").agg(
            F.min(F.col("dist") * k + F.col("cluster")).alias("key")
        )
        if it < iters - 1:
            cent = (
                melted.join(
                    assign.select(
                        "vec_id", (F.col("key") % k).alias("cluster")
                    ),
                    "vec_id",
                )
                .groupBy("cluster", "dim")
                .agg(
                    F.floor(F.sum("val").cast("double") / F.count("*"))
                    .cast("bigint")
                    .alias("cval")
                )
                .localCheckpoint(eager=True)
            )
    return assign.select(
        "vec_id",
        (F.col("key") % k).alias("cluster"),
        F.expr(f"key DIV {k}").alias("dist_sq"),
    )


# ---------------------------------------------------------------------------
# Per-label covariance spectrum — the grouped-map (applyInPandas) kernel
# ---------------------------------------------------------------------------
# Embedding-space diagnostics a curation pipeline runs per class/source:
# covariance trace (total variance) and top eigenvalue (dominant-axis
# concentration). Eigen-decomposition is genuinely not expressible in
# SQL, so this is the repo's canonical GROUPED-MAP Pandas kernel: whole
# groups arrive as one Arrow-backed pandas frame, numpy does dense
# linear algebra per group, and the cluster-side contract (schema,
# group partitioning, determinism) is what the test pins. Rows are
# sorted by vec_id inside the kernel so results do not depend on
# shuffle arrival order. At 100 TB each group must fit one executor —
# labels are classes (dozens-hundreds), embeddings are 64-dim, so a
# group is rows×256B: fine. For million-class regimes switch the
# grouping key to (label, hash-bucket) and merge moments.
def label_spectrum(emb: DataFrame) -> DataFrame:
    import pandas as pd

    # a NULL label is not a profileable group: it reaches the kernel
    # as NaN and int(NaN) kills the task (r09 degenerate sweep) — the
    # same quarantine posture as the NULL/ragged embedding drop below
    emb = emb.where("label IS NOT NULL")

    schema = (
        "label int, n_vectors long, dim int, "
        "cov_trace double, top_eigenvalue double, top_eig_share double"
    )

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        pdf = pdf.sort_values("vec_id")
        # Drop NULL / ragged embeddings BEFORE np.stack: one NULL cell
        # (nullable by parquet default) or a truncated array raises
        # inside the kernel and kills the whole job after task retries
        # — the same degenerate-input class the n<2 / tr==0 branches
        # already handle deliberately (r08 review; the text kernels
        # got their NULL guards in r07). The modal length decides d so
        # a single corrupt row cannot redefine the group's dimension.
        arrs = [a for a in pdf["embedding"].to_numpy() if a is not None]
        if arrs:
            lens = pd.Series([len(a) for a in arrs])
            d_mode = int(lens.mode().iloc[0])
            # NULL elements arrive as NaN inside the Arrow array and
            # poison cov/eigvalsh (r09 extended sweep), and a ±Inf
            # element makes eigvalsh raise outright (r10 third wave) —
            # a vector with an unmeasured or non-finite component is
            # dropped like a NULL vector
            arrs = [
                a
                for a in arrs
                if len(a) == d_mode and np.isfinite(a).all()
            ]
        if not arrs:
            return pd.DataFrame(
                [[int(pdf["label"].iloc[0]), 0, 0, 0.0, 0.0, 0.0]],
                columns=[
                    "label", "n_vectors", "dim",
                    "cov_trace", "top_eigenvalue", "top_eig_share",
                ],
            )
        m = np.stack(arrs).astype(np.float64)
        n, d = m.shape
        if n < 2:
            return pd.DataFrame(
                [[int(pdf["label"].iloc[0]), n, d, 0.0, 0.0, 0.0]],
                columns=[
                    "label", "n_vectors", "dim",
                    "cov_trace", "top_eigenvalue", "top_eig_share",
                ],
            )
        if d == 0:
            # a label whose MODAL vector length is 0 (all-empty arrays
            # are valid, finite, uniform-length): there is no spectrum
            # — same zero readout as the no-valid-vectors branch, but
            # with the group's true n (r11 fuzz seed 162)
            return pd.DataFrame(
                [[int(pdf["label"].iloc[0]), n, 0, 0.0, 0.0, 0.0]],
                columns=[
                    "label", "n_vectors", "dim",
                    "cov_trace", "top_eigenvalue", "top_eig_share",
                ],
            )
        # d == 1: np.cov(rowvar=False) collapses an (n, 1) matrix to a
        # 0-D scalar and eigvalsh raises LinAlgError (r11 fuzz seed
        # 162 — a label group whose modal dim is 1). atleast_2d keeps
        # the same math: top eigenvalue == variance == trace, share 1.
        c = np.atleast_2d(np.cov(m, rowvar=False))
        ev = float(np.linalg.eigvalsh(c)[-1])
        tr = float(np.trace(c))
        # tr == 0 when every vector in the label is identical (dup
        # docs sharing one embedding): the spectrum is degenerate and
        # the share is 0 by the same convention as the n < 2 branch —
        # a bare ev/tr would raise ZeroDivisionError and abort the
        # whole job (r06 review catch)
        share = round(ev / tr, 6) if tr != 0.0 else 0.0
        return pd.DataFrame(
            [[int(pdf["label"].iloc[0]), n, d, round(tr, 6),
              round(ev, 6), share]],
            columns=[
                "label", "n_vectors", "dim",
                "cov_trace", "top_eigenvalue", "top_eig_share",
            ],
        )

    return emb.groupBy("label").applyInPandas(kernel, schema)


@query("embedding_label_spectrum")  # no oracle: eigendecomposition
def embedding_label_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label covariance trace / top eigenvalue / dominant-axis
    share over the embeddings table (rows-only driver check; exactness
    vs in-process numpy pinned by tests/test_clustering.py)."""
    return label_spectrum(load_table(spark, sf_dir, "embeddings"))
