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
