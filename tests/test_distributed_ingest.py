"""Executor-side bronze fetch parity (DESIGN.md scale path → code).

The reference's driver loop (/root/reference/src/main.py:47-71) is the
only true scale bottleneck in its design: one blocking HTTP GET per
day. ingest_dataset_distributed partitions the (dataset, day) task
list over executors. These tests pin that the distributed path writes
byte-identical bronze payload rows, honors the empty-input guard, and
runs each fetch exactly once.
"""

from __future__ import annotations

import json

import pytest

from energy_data_pipeline_project_spark.pipeline.config import (
    PipelineConfig,
    default_datasets,
)
from energy_data_pipeline_project_spark.pipeline.ingestion import (
    ingest_dataset,
    ingest_dataset_distributed,
)
from energy_data_pipeline_project_spark.pipeline.runner import run_pipeline
from energy_data_pipeline_project_spark.sources.fixtures import fixture_payloads
from energy_data_pipeline_project_spark.sources.payloads import LocalJsonSource

DAYS = [f"2025-04-{i:02d}" for i in range(1, 11)]


def _config(root: str) -> PipelineConfig:
    return PipelineConfig(
        lake_root=root,
        start_date=DAYS[0],
        end_date=DAYS[-1],
        datasets=default_datasets(),
    )


@pytest.fixture(scope="module")
def source():
    return LocalJsonSource(fixture_payloads(DAYS))


def _payload_rows(df):
    return sorted(
        (r["date"], r["payload_json"])
        for r in df.select("date", "payload_json").collect()
    )


def test_distributed_matches_driver_loop(spark, source, tmp_path_factory):
    ds = default_datasets()[0]
    cfg_a = _config(str(tmp_path_factory.mktemp("lake-driver")))
    cfg_b = _config(str(tmp_path_factory.mktemp("lake-dist")))
    loop_df = ingest_dataset(spark, cfg_a, ds, source)
    dist_df = ingest_dataset_distributed(
        spark, cfg_b, ds, source, days_per_task=3
    )
    assert _payload_rows(loop_df) == _payload_rows(dist_df)
    # names+types, not nullability: the distributed path returns the
    # parquet-round-tripped frame, which relaxes NOT NULL
    assert [(f.name, f.dataType) for f in loop_df.schema.fields] == [
        (f.name, f.dataType) for f in dist_df.schema.fields
    ]


def test_distributed_empty_input_guard(spark, tmp_path_factory):
    ds = default_datasets()[0]
    cfg = _config(str(tmp_path_factory.mktemp("lake-empty")))
    out = ingest_dataset_distributed(
        spark, cfg, ds, LocalJsonSource({ds.name: {}})
    )
    assert out is None
    import os

    assert not os.path.exists(f"{cfg.lake_root}/bronze/{ds.name}")


class _CountingSource:
    """Fixture source that counts fetches through a driver-side channel.

    mapInPandas pickles the source per task, so a plain attribute would
    count in executor clones only; a file-append side channel survives
    local-mode process boundaries.
    """

    def __init__(self, payloads, log_path):
        self._inner = LocalJsonSource(payloads)
        self._log = log_path

    def fetch(self, dataset, day):
        with open(self._log, "a") as f:
            f.write(f"{dataset.name}:{day}\n")
        return self._inner.fetch(dataset, day)


def test_each_day_fetched_exactly_once(spark, tmp_path_factory):
    ds = default_datasets()[0]
    cfg = _config(str(tmp_path_factory.mktemp("lake-once")))
    log = str(tmp_path_factory.mktemp("log")) + "/fetches.txt"
    src = _CountingSource(fixture_payloads(DAYS), log)
    df = ingest_dataset_distributed(spark, cfg, ds, src, days_per_task=4)
    # consuming the returned frame must NOT re-run fetches (it re-scans
    # the written bronze table, not the mapInPandas lineage)
    df.count()
    df.count()
    with open(log) as f:
        fetched = sorted(line.strip() for line in f if line.strip())
    assert fetched == sorted(f"{ds.name}:{d}" for d in DAYS)


def test_full_pipeline_parity_distributed(spark, source, tmp_path_factory):
    """End-to-end: distributed-fetch pipeline == driver-loop pipeline."""
    res_a = run_pipeline(
        spark, _config(str(tmp_path_factory.mktemp("pipe-a"))), source
    )
    res_b = run_pipeline(
        spark,
        _config(str(tmp_path_factory.mktemp("pipe-b"))),
        source,
        distributed_fetch=True,
    )
    assert res_a.counts() == res_b.counts()
    for name in res_a.gold:
        a = sorted(map(str, res_a.gold[name].collect()))
        b = sorted(map(str, res_b.gold[name].collect()))
        assert a == b, name
