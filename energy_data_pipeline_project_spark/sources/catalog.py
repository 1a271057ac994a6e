"""SQL catalog surface: register the testdata tables as temp views so
the engine is queryable through ``spark.sql(...)`` by name — the same
table names the DuckDB oracle uses, so any oracle SQL in this repo
(modulo DuckDB-specific functions) can be pasted against Spark SQL.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .tables import TABLES, load_table


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Create/replace one temp view per testdata table; returns names."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return list(TABLES)
