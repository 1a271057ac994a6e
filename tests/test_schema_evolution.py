"""Schema evolution on the lake: additive columns across parquet
batches must be readable as one table (mergeSchema), and the explicit-
schema read path must project old batches with nulls — the two
behaviors a long-lived 100 TB table depends on when its schema grows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _write_two_generations(spark, path):
    spark.range(0, 5).select(
        F.col("id"), F.lit("a").alias("source")
    ).write.parquet(path + "/batch=1")
    spark.range(5, 10).select(
        F.col("id"),
        F.lit("b").alias("source"),
        (F.col("id") * 1.5).alias("score"),  # new column in generation 2
    ).write.parquet(path + "/batch=2")


def test_merge_schema_unions_generations(spark, tmp_path):
    path = str(tmp_path / "evolving")
    _write_two_generations(spark, path)
    df = spark.read.option("mergeSchema", "true").parquet(
        path + "/batch=1", path + "/batch=2"
    )
    assert set(df.columns) == {"id", "source", "score"}
    rows = {r["id"]: r for r in df.collect()}
    assert rows[0]["score"] is None  # old files project the new col as null
    assert rows[9]["score"] == 13.5


def test_explicit_schema_projects_old_files(spark, tmp_path):
    """The engine's house style (explicit schemas, SURVEY §1.3) also
    solves evolution on read: declaring the superset schema makes old
    files yield nulls for missing columns without a merge pass."""
    path = str(tmp_path / "evolving2")
    _write_two_generations(spark, path)
    superset = StructType(
        [
            StructField("id", LongType()),
            StructField("source", StringType()),
            StructField("score", DoubleType()),
        ]
    )
    df = spark.read.schema(superset).parquet(path + "/batch=1")
    assert df.schema == superset
    assert all(r["score"] is None for r in df.collect())
