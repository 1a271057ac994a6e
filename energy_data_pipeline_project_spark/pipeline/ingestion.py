"""Bronze ingestion: payloads → raw append-only-shaped bronze tables.

Semantics preserved from the reference
(/root/reference/src/ingestion/power_ingestion.py:31-79,
price_ingestion.py:30-78): one payload dict per day, serialized to a
``payload_json`` string with ``ensure_ascii=False``, explicit
StructType (never inferred), ``ingested_at`` audit timestamp and a
constant ``source`` tag, skip-write on empty input (H6), full
overwrite per run (S6).

Generalized: one generic function serves any ``DatasetSpec``; the
per-day fetch loop is a pluggable ``PayloadSource``.
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..pipeline.config import DatasetSpec, PipelineConfig
from ..sources.payloads import PayloadSource
from .lake import table_path, write_table

SOURCE_TAG = "energy-charts"


def bronze_schema(dataset: DatasetSpec) -> T.StructType:
    return T.StructType(
        [
            T.StructField(dataset.key_column, T.StringType(), nullable=False),
            T.StructField("date", T.StringType(), nullable=False),
            T.StructField("payload_json", T.StringType()),
        ]
    )


def ingest_dataset(
    spark: SparkSession,
    config: PipelineConfig,
    dataset: DatasetSpec,
    source: PayloadSource,
) -> DataFrame | None:
    """Fetch every backfill day, build the bronze frame, write it.

    Returns the written DataFrame, or None when no day yielded a
    payload (empty-input guard: nothing is written, any previous
    bronze table is left untouched).
    """
    records = []
    for day in config.dates():
        d = day.isoformat()
        payload = source.fetch(dataset, d)
        if payload is None:
            continue
        records.append(
            {
                dataset.key_column: dataset.key_value,
                "date": d,
                "payload_json": json.dumps(payload, ensure_ascii=False),
            }
        )
    if not records:
        return None

    df = (
        spark.createDataFrame(records, schema=bronze_schema(dataset))
        .withColumn("ingested_at", F.current_timestamp())
        .withColumn("source", F.lit(SOURCE_TAG))
    )
    write_table(
        df,
        table_path(config.lake_root, "bronze", dataset.name),
        config.table_format,
    )
    return df
