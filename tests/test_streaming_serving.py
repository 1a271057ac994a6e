"""Online-vs-offline parity for PQ similarity serving: streaming the
query vectors through foreachBatch must reproduce the batch
``ann_topk_pq`` results row-for-row (same index, same math)."""

from __future__ import annotations

import pyspark.sql.functions as F

from energy_data_pipeline_project_spark.operators.pq import ann_topk_pq
from energy_data_pipeline_project_spark.operators.similarity import N_QUERY_VECS
from energy_data_pipeline_project_spark.sources.tables import load_table
from energy_data_pipeline_project_spark.streaming.serving import (
    build_pq_index,
    serve_ann_stream,
)

from .conftest import SF_SMOKE


def test_streamed_ann_matches_batch(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("ann-queries"))
    out = str(tmp_path_factory.mktemp("ann-results"))
    ckpt = str(tmp_path_factory.mktemp("ann-ckpt"))

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # several files → several micro-batches → the index answers each
    # batch independently
    queries.repartition(3).write.mode("overwrite").parquet(src)

    index = build_pq_index(spark, SF_SMOKE)
    stream = (
        spark.readStream.schema(queries.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = serve_ann_stream(stream, index, out, ckpt)
    q.awaitTermination()

    served = {
        (r.query_id, r.rank): (r.neighbor_id, r.dist_sq)
        for r in spark.read.parquet(out).collect()
    }
    batch = {
        (r.query_id, r.rank): (r.neighbor_id, r.dist_sq)
        for r in ann_topk_pq(spark, SF_SMOKE).collect()
    }
    assert served == batch


def test_saved_index_serves_identically(spark, tmp_path_factory):
    """Index persistence round-trip: serving from a saved+reloaded
    index answers exactly like the freshly trained one."""
    from energy_data_pipeline_project_spark.streaming.serving import (
        _serve_batch,
        load_pq_index,
        save_pq_index,
    )

    idx_dir = str(tmp_path_factory.mktemp("pq-index"))
    fresh = build_pq_index(spark, SF_SMOKE)
    save_pq_index(fresh, idx_dir)
    loaded = load_pq_index(spark, idx_dir, SF_SMOKE)

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = {tuple(r) for r in _serve_batch(queries, fresh).collect()}
    b = {tuple(r) for r in _serve_batch(queries, loaded).collect()}
    assert a == b and a
