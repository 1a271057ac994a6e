"""Local replica of the driver's correctness gate: every query with an
oracle must match DuckDB exactly (count + schema + value multiset) at
sf0.001. Queries without oracles just need to run and return rows."""

from __future__ import annotations

import pytest

from energy_data_pipeline_project_spark.operators import all_oracles, all_queries
from energy_data_pipeline_project_spark.testing import compare_query

from .conftest import SF_SMOKE

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, name):
    res = compare_query(spark, SF_SMOKE, name, QUERIES[name], ORACLES[name])
    assert res.ok, f"{name}: {res.detail} (spark={res.spark_rows} oracle={res.oracle_rows})"


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES) - set(ORACLES))
)
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_SMOKE)
    # >= 1, not >= 0 (which could never fail): the driver's rows-only
    # gate records the count, and a query regressing to an empty
    # result must fail HERE first (r06 review)
    assert df.count() >= 1


def test_no_forbidden_duckdb_output_types():
    """The driver's hasher fetches oracle results through a pandas/Arrow
    path where DuckDB HUGEINT (int128) degrades to float64 — hashing
    "5.0" against Spark's "5" (round-4 verdict: 6 red rows, 3 latent).
    int32-vs-int64 is fine (same Python int repr; r03 stamps prove it),
    so the gate is exactly the no-exact-twin types, not a full 1:1 map.
    """
    from energy_data_pipeline_project_spark.testing import (
        duck_connection,
        forbidden_type_columns,
    )

    con = duck_connection(SF_SMOKE)
    offenders = {}
    try:
        for name, sql in sorted(ORACLES.items()):
            cols = forbidden_type_columns(con, sql)
            if cols:
                offenders[name] = cols
    finally:
        con.close()
    assert not offenders, f"HUGEINT/DECIMAL oracle outputs: {offenders}"
