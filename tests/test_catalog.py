from __future__ import annotations

from energy_data_pipeline_project_spark.pipeline.lake import delta_available
from energy_data_pipeline_project_spark.sources.catalog import register_views

from .conftest import SF_SMOKE


def test_register_views_enables_sql(spark):
    names = register_views(spark, SF_SMOKE)
    assert "lineitem" in names
    got = spark.sql(
        """
        SELECT l_returnflag, COUNT(*) AS n
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY l_returnflag ORDER BY l_returnflag
        """
    ).collect()
    assert [r["l_returnflag"] for r in got] == ["A", "N", "R"]
    assert sum(r["n"] for r in got) > 0
    # events view must carry the converted timestamp (nanos handled)
    assert dict(spark.table("events").dtypes)["ts"] == "timestamp"


def test_delta_gating(spark):
    # delta-spark is not in this container: the probe must say so
    # gracefully (and lake IO stays on parquet).
    assert delta_available(spark) is False
