"""Multi-format IO: csv/json/orc round-trips must be lossless against
the parquet original — same schema, same value multiset — with explicit
schemas (no inference)."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from energy_data_pipeline_project_spark.sources.formats import (
    NULL_TOKEN,
    read_format,
    write_format,
)
from energy_data_pipeline_project_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
def test_lineitem_roundtrip_lossless(spark, fmt, tmp_path):
    # lineitem covers bigint, int, double (fixed-decimal money values),
    # varchar, and timestamp columns
    src = load_table(spark, SF_SMOKE, "lineitem")
    path = str(tmp_path / f"lineitem_{fmt}")
    write_format(src, path, fmt)
    back = read_format(spark, path, src.schema, fmt)
    assert back.schema == src.schema
    assert _canon(back) == _canon(src)


def test_csv_null_vs_empty_string(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "x"), (4, NULL_TOKEN)],
        "id bigint, s string",
    )
    path = str(tmp_path / "nulls_csv")
    write_format(df, path, "csv")
    back = read_format(spark, path, df.schema, "csv")
    got = {r["id"]: r["s"] for r in back.collect()}
    # NULL round-trips as NULL, empty string as empty string; a string
    # that happens to EQUAL the null token is the one documented
    # casualty of CSV (it comes back as NULL)
    assert got[1] is None
    assert got[2] == ""
    assert got[3] == "x"
    assert got[4] is None


def test_avro_gated_roundtrip(spark, tmp_path):
    """Avro is an external Spark module not shipped in this container
    (same constraint as Delta): the probe must report truthfully, and
    where the jar exists the round-trip must be lossless — proven the
    day the classpath gains spark-avro, skipped (but collected) here.
    """
    from energy_data_pipeline_project_spark.sources.formats import (
        avro_available,
    )

    if not avro_available(spark):
        with pytest.raises(Exception, match="avro|Avro"):
            spark.range(3).write.format("avro").save(
                str(tmp_path / "avro_probe")
            )
        pytest.skip("spark-avro not on the classpath in this container")
    src = load_table(spark, SF_SMOKE, "lineitem")
    path = str(tmp_path / "lineitem_avro")
    src.write.format("avro").save(path)
    back = spark.read.format("avro").schema(src.schema).load(path)
    assert _canon(back) == _canon(src)
