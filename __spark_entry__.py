"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's gold
daily-join shape, SURVEY.md §3.3, mapped onto the star schema) on
sf0.001. ``queries()`` exposes the full operator surface from
SURVEY.md §2 (+ §2.10 extensions); ``oracle_sql()`` gives each one's
DuckDB twin where ANSI-SQL-expressible (all but ``ann_topk_numpy``,
the Arrow/numpy fast path, which gets a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from energy_data_pipeline_project_spark.operators import all_oracles, all_queries
from energy_data_pipeline_project_spark.operators.relational import gold_daily_join


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return gold_daily_join(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
