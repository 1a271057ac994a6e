"""ANN answer-quality gates: approximate paths vs exact brute force.

Hash-parity with the oracle proves the plumbing; these tests pin that
the approximate operators also return *good* answers. recall@k =
|approx top-k ∩ exact top-k| / k averaged over the query set.
"""

from __future__ import annotations

import pytest

from energy_data_pipeline_project_spark.operators import similarity

from .conftest import SF_SMOKE


def _topk_sets(df):
    out = {}
    for r in df.select("query_id", "neighbor_id").collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


@pytest.fixture(scope="module")
def exact(spark):
    return _topk_sets(similarity.QUERIES["ann_topk_bruteforce"](spark, SF_SMOKE))


def _recall(approx, exact):
    vals = [
        len(approx.get(q, set()) & hits) / len(hits)
        for q, hits in exact.items()
    ]
    return sum(vals) / len(vals)


def test_ivf_default_nprobe_recall(spark, exact):
    approx = _topk_sets(similarity.QUERIES["ann_topk_ivf"](spark, SF_SMOKE))
    assert _recall(approx, exact) >= 0.8


def test_ivf_nprobe_monotone(spark, exact):
    """More probes must never hurt recall; full probe = exact."""
    r1 = _recall(
        _topk_sets(similarity.ann_topk_ivf(spark, SF_SMOKE, nprobe=1)), exact
    )
    r_def = _recall(
        _topk_sets(similarity.ann_topk_ivf(spark, SF_SMOKE, nprobe=similarity.IVF_NPROBE)),
        exact,
    )
    r_all = _recall(
        _topk_sets(similarity.ann_topk_ivf(spark, SF_SMOKE, nprobe=10)), exact
    )
    assert r1 <= r_def <= r_all
    assert r_all == 1.0


def test_lsh_multitable_recall(spark, exact):
    """Multi-table LSH must clear the same recall gate as IVF (a
    single 8-bit table measured recall@5 ≈ 0.03 on this corpus)."""
    approx = _topk_sets(similarity.QUERIES["ann_topk_lsh"](spark, SF_SMOKE))
    assert _recall(approx, exact) >= 0.8
