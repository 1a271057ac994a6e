"""Degenerate-corpus sweep: the parity-invisible bug hunt as a gate.

Hash-parity on clean data cannot catch the two engines AGREEING on a
wrong answer (r08's least()-skips-NULL bug) or availability bugs (one
corrupt row killing a job). This sweep runs the ENTIRE query surface
over ``testing.write_degenerate_corpus``'s adversarial fixture —
NULL/empty/whitespace text, NULL keys, duplicate primary keys, zero
and NULL and ragged vectors, NaN/Inf measures, malformed JSON, NULL
timestamps, all-tied groups — comparing against the DuckDB oracles.
A crash is an availability finding; a divergence is a semantics
finding. The r09 first run produced 26 crashes + 18 divergences, all
fixed (see DESIGN.md round-9 notes); this test keeps the surface at
zero.
"""

from __future__ import annotations

import pytest

from energy_data_pipeline_project_spark.operators import (
    all_oracles,
    all_queries,
)
from energy_data_pipeline_project_spark.testing import (
    compare_query,
    write_degenerate_corpus,
)

_Q = all_queries()
_O = all_oracles()


@pytest.fixture(scope="session")
def degen_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("degen-corpus"))
    write_degenerate_corpus(d)
    return d


@pytest.mark.parametrize("name", sorted(_Q))
def test_degenerate_sweep(name, spark, degen_dir):
    if name not in _O:
        # rows-only queries: the gate is availability — the operator
        # must survive the adversarial corpus (>= 0 rows, no crash)
        assert _Q[name](spark, degen_dir).count() >= 0
        return
    r = compare_query(spark, degen_dir, name, _Q[name], _O[name])
    assert r.ok, f"{name} diverges on degenerate corpus: {r.detail}"


def test_zscore_survives_large_in_domain_readings(spark):
    """One $50k (or $30M) reading is IN the cents domain but its
    windowed moments overflow int64 — the r09 second diff review's
    scenario. The DECIMAL(38,0) moments must score it exactly, and an
    astronomic spike against tiny variance must SATURATE at int64 max
    rather than abort the division."""
    import datetime as dt

    import pyspark.sql.functions as F

    from energy_data_pipeline_project_spark.operators.timeseries import (
        anomaly_from_daily,
    )

    d0 = dt.date(2024, 1, 1)
    rows = []
    # 30 quiet days (alternating so variance > 0), then the spike
    for i in range(30):
        rows.append(("a", d0 + dt.timedelta(days=i), i, 100 + (i % 2)))
    rows.append(("a", d0 + dt.timedelta(days=30), 30, 5_000_000 * 100))
    # a second series whose spike is the full $30M domain edge
    for i in range(30):
        rows.append(("b", d0 + dt.timedelta(days=i), i, 100 + (i % 2)))
    rows.append(("b", d0 + dt.timedelta(days=30), 30, 3_000_000_000 * 100))
    daily = spark.createDataFrame(
        rows, "event_type string, d date, day_no long, day_cents long"
    )
    got = {
        (r["event_type"], str(r["d"])): (r["z_sign"], r["z_sq_bp"])
        for r in anomaly_from_daily(daily).collect()
    }
    a = got[("a", "2024-01-31")]
    b = got[("b", "2024-01-31")]
    assert a[0] == 1 and a[1] > 0
    # the $50k z² in basis points, replayed exactly in Python ints
    xs = [100 + (i % 2) for i in range(30)]
    n, s, sq, x = 30, sum(xs), sum(v * v for v in xs), 5_000_000 * 100
    expect = ((n * x - s) ** 2 * 10000) // (n * sq - s * s)
    assert a[1] == min(expect, 2**63 - 1), (a, expect)
    # the $30M spike saturates (exact quotient is > int64 max)
    assert b == (1, 2**63 - 1), b
