"""Cross-engine parity on a corpus containing a ZERO embedding.

The raw-cosine rankings got positive-norm gates in r08: a zero-norm
vector's 0/0 cosine is NULL in Spark (sorts last under cos DESC) but
NaN in DuckDB (whose total order ranks it ABOVE every number — rank 1
for every query). The shipped fixtures contain no zero vectors, so
the driver's gate can never exercise this; this test builds a corpus
WITH one and runs the full driver-style compare on the three gated
queries, proving the engines agree on degenerate-but-legal data."""

from __future__ import annotations

import os

import pytest

SF_SMOKE = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_SMOKE), reason="testdata not generated"
)

GATED = ["ann_topk_bruteforce", "ann_topk_lsh", "retrieval_rrf_hybrid"]


@pytest.fixture(scope="module")
def zero_vec_dir(tmp_path_factory):
    import duckdb

    d = tmp_path_factory.mktemp("sf-zerovec")
    for t in os.listdir(SF_SMOKE):
        if t != "embeddings.parquet":
            os.symlink(os.path.join(SF_SMOKE, t), d / t)
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT vec_id, label,
                 CASE WHEN vec_id = 7
                      THEN list_transform(embedding, x -> CAST(0.0 AS FLOAT))
                      ELSE embedding END AS embedding
          FROM read_parquet('{SF_SMOKE}/embeddings.parquet')
        ) TO '{d}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    return str(d)


@pytest.mark.parametrize("name", GATED)
def test_gated_cosine_queries_agree_with_zero_vector(
    spark, zero_vec_dir, name
):
    from energy_data_pipeline_project_spark.operators import (
        all_oracles,
        all_queries,
    )
    from energy_data_pipeline_project_spark.testing import compare_query

    res = compare_query(
        spark, zero_vec_dir, name, all_queries()[name], all_oracles()[name]
    )
    assert res.ok, res.detail
    assert res.spark_rows > 0
