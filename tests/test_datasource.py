"""The Spark 4 Python Data Source ingest path: planning and parity.

The custom ``energy_payloads`` source must (a) plan one InputPartition
per day-chunk so fetches parallelize across executors, and (b) produce
byte-identical bronze rows to the reference-faithful driver-loop
ingest on the same fixture payloads.
"""

from __future__ import annotations

import json
import os

from energy_data_pipeline_project_spark.sources.datasource import (
    EnergyPayloadDataSource,
    EnergyPayloadReader,
    _DayChunk,
)
from energy_data_pipeline_project_spark.sources.fixtures import (
    fixture_payloads,
)

DAYS = [f"2025-01-{d:02d}" for d in range(1, 8)]


def _fixture_root(tmp_path):
    payloads = fixture_payloads(DAYS)
    for ds_name, by_day in payloads.items():
        endpoint = "public_power" if "power" in ds_name else "price"
        d = tmp_path / endpoint
        d.mkdir(exist_ok=True)
        for day, payload in by_day.items():
            (d / f"{day}.json").write_text(json.dumps(payload))
    return str(tmp_path), payloads


def test_partition_planning_chunks_days():
    opts = {
        "start_date": DAYS[0],
        "end_date": DAYS[-1],
        "endpoint": "public_power",
        "days_per_task": "2",
        "payload_root": "/nonexistent-ok-for-planning",
    }
    r = EnergyPayloadReader(opts)
    parts = r.partitions()
    assert [len(p.days) for p in parts] == [2, 2, 2, 1]
    assert [d for p in parts for d in p.days] == DAYS


def test_reader_rejects_misconfiguration_loudly():
    """A reader with neither backend can only ever yield 0 rows, and a
    non-positive days_per_task either planned zero partitions (silent
    empty) or crashed deep in range() — both must be loud, named
    errors at plan time (r07 review)."""
    import pytest

    base = {
        "start_date": DAYS[0],
        "end_date": DAYS[-1],
        "endpoint": "public_power",
    }
    with pytest.raises(ValueError, match="payload_root"):
        EnergyPayloadReader(dict(base))
    for bad in ("0", "-1"):
        r = EnergyPayloadReader(
            dict(base, payload_root="/x", days_per_task=bad)
        )
        with pytest.raises(ValueError, match="days_per_task"):
            r.partitions()


def test_datasource_matches_driver_loop_ingest(spark, tmp_path):
    root, payloads = _fixture_root(tmp_path)
    spark.dataSource.register(EnergyPayloadDataSource)
    df = (
        spark.read.format("energy_payloads")
        .option("endpoint", "public_power")
        .option("key_column", "country")
        .option("key_value", "de")
        .option("start_date", DAYS[0])
        .option("end_date", DAYS[-1])
        .option("days_per_task", "2")
        .option("payload_root", root)
        .load()
    )
    assert df.columns == ["country", "date", "payload_json"]
    got = {(r["date"]): r["payload_json"] for r in df.collect()}
    # parity with the hermetic driver-loop payload serialization
    ds_name = next(n for n in payloads if "power" in n)
    want = {
        day: json.dumps(p, ensure_ascii=False)
        for day, p in payloads[ds_name].items()
    }
    assert got == want


def test_datasource_read_runs_partition_parallel(spark, tmp_path):
    root, _ = _fixture_root(tmp_path)
    spark.dataSource.register(EnergyPayloadDataSource)
    df = (
        spark.read.format("energy_payloads")
        .option("endpoint", "price")
        .option("key_column", "market")
        .option("key_value", "DE-LU")
        .option("start_date", DAYS[0])
        .option("end_date", DAYS[-1])
        .option("days_per_task", "3")
        .option("payload_root", root)
        .load()
    )
    assert df.rdd.getNumPartitions() == 3  # ceil(7/3)
    assert df.count() == len(DAYS)
