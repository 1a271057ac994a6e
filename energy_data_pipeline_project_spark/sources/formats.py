"""Multi-format table IO: parquet / csv / json / orc with explicit
schemas.

The reference reads and writes exactly one format (Delta,
/root/reference/src/utils/paths.py + ingestion write sites); a usable
engine needs interchange formats too. House rules carried over from
the reference (SURVEY.md §1.3): **explicit schemas everywhere** — a
CSV/JSON scan never runs schema inference (inference costs an extra
full pass over the data and can silently type-drift between runs;
at 100 TB both are unacceptable).

Lossless round-trip notes:
- doubles: Spark writes shortest-repr decimals in csv/json (Jackson /
  UTF8String formatting), which parse back to the identical IEEE
  value.
- timestamps: written as ISO-8601 with microseconds; parsed back
  exactly under the pinned UTC session.
- nulls vs empty strings: CSV cannot distinguish them by default —
  ``NULL_TOKEN`` is written for SQL NULL so ``""`` stays a real empty
  string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

FORMATS = ("parquet", "csv", "json", "orc")

NULL_TOKEN = "\\N"

_CSV_OPTIONS = {
    "header": "true",
    "nullValue": NULL_TOKEN,
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
}
_JSON_OPTIONS = {
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
}


def _options(fmt: str) -> dict[str, str]:
    if fmt == "csv":
        return dict(_CSV_OPTIONS)
    if fmt == "json":
        return dict(_JSON_OPTIONS)
    return {}


def write_format(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    assert fmt in FORMATS, fmt
    df.write.format(fmt).options(**_options(fmt)).mode("overwrite").save(path)


def read_format(
    spark: SparkSession, path: str, schema: StructType, fmt: str = "parquet"
) -> DataFrame:
    """Explicit-schema scan. ``schema`` is mandatory by design — see
    module docstring. For parquet/orc the schema acts as a projection/
    assertion; for csv/json it replaces inference entirely."""
    assert fmt in FORMATS, fmt
    return (
        spark.read.format(fmt)
        .options(**_options(fmt))
        .schema(schema)
        .load(path)
    )


def avro_available(spark: SparkSession) -> bool:
    """Probe for the spark-avro module (external since Spark 2.4 —
    not bundled in the pip distribution this engine targets, same
    container constraint as Delta in pipeline/lake.py). The IO layer
    gates on this instead of assuming, so deployments that DO ship
    the jar get Avro round-trips with the same explicit-schema rules.

    The probe attempts a real DataSource lookup via a 0-row write
    plan — a Class.forName check is insufficient (parts of the avro
    classes ship in the main jars while the DataSource registration
    does not, and lookup is what `format("avro")` actually exercises).
    """
    import tempfile

    d = tempfile.mkdtemp(prefix="avro-probe-")
    try:
        spark.range(0).write.format("avro").mode("overwrite").save(
            f"{d}/probe"
        )
        return True
    except Exception:
        # FAIL CLOSED: only a successful probe write proves the module.
        # The previous English-substring gate ("Failed to find data
        # source" absent => available) returned a false POSITIVE for
        # any unrelated probe failure (disk full) and depends on avro's
        # legacy special-cased message — Spark 4's generic wording is
        # "Failed to find THE data source" (r07 review). A false
        # negative here merely skips the avro path; a false positive
        # crashes every gated caller on its real write.
        return False
    finally:
        import shutil

        shutil.rmtree(d, ignore_errors=True)
