"""Lake layout + table IO for the medallion layers.

Path-addressed tables like the reference
(/root/reference/src/utils/paths.py): ``{root}/{layer}/{table}``.
Writes are full overwrites — every run is an idempotent refresh
(reference S6 semantics). Format is config-driven: parquet by default,
Delta when delta-spark is on the classpath (import-gated; the
container for this project ships parquet only).

Scale posture: silver/gold writes partition by ``date`` so a 100 TB
lake gets static + dynamic partition pruning on the day-keyed queries;
the reference leaves its tables unpartitioned (SURVEY.md §4.2).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

LAYERS = ("bronze", "silver", "gold")


def table_path(root: str, layer: str, name: str) -> str:
    assert layer in LAYERS, layer
    return os.path.join(root, layer, name)


def delta_available(spark: SparkSession) -> bool:
    # NB: plain attribute access on spark._jvm returns a lazy
    # JavaPackage even for classes that don't exist — only Class.forName
    # actually proves the Delta jars are on the classpath.
    try:
        spark._jvm.java.lang.Class.forName("io.delta.tables.DeltaTable")
        return True
    except Exception:
        return False


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: tuple[str, ...] = (),
) -> None:
    writer = df.write.format(fmt).mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def read_table(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    return spark.read.format(fmt).load(path)
