"""Product-quantization semantics: recall gate, code-compression
invariants, Lloyd-improvement. Cross-engine exactness is covered by
the oracle-parity sweep (both pq queries are hash-checked)."""

from __future__ import annotations

from energy_data_pipeline_project_spark.operators.pq import (
    PQ_ITERS,
    PQ_K,
    PQ_M,
    _melted,
    _train_codes,
    ann_topk_pq,
    embedding_pq_codes,
)
from energy_data_pipeline_project_spark.operators.similarity import (
    ann_topk_bruteforce,
)

from .conftest import SF_SMOKE


def test_pq_recall_vs_bruteforce(spark):
    """ADC shortlist + exact refine must recover most true neighbors
    (measured 0.8 at sf0.001 and sf0.01; gate at 0.75)."""
    bf = {
        (r.query_id, r.neighbor_id)
        for r in ann_topk_bruteforce(spark, SF_SMOKE).collect()
    }
    pq = {
        (r.query_id, r.neighbor_id)
        for r in ann_topk_pq(spark, SF_SMOKE).collect()
    }
    assert len(bf & pq) / len(bf) >= 0.75


def test_pq_codes_invariants(spark):
    rows = embedding_pq_codes(spark, SF_SMOKE).collect()
    n_vecs = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").count()
    assert len(rows) == n_vecs, "one packed code per vector"
    for r in rows:
        assert 0 <= r["code_key"] < PQ_K**PQ_M
        assert r["total_sq_err"] >= 0


def test_pq_lloyd_rounds_reduce_error(spark):
    """More Lloyd rounds must not increase total quantization error
    (floored-integer-mean updates keep the descent property on this
    grid, same as the kmeans inertia pin)."""
    melted = _melted(spark, SF_SMOKE)

    def total_err(iters: int) -> int:
        import energy_data_pipeline_project_spark.operators.pq as pq_mod

        orig = pq_mod.PQ_ITERS
        pq_mod.PQ_ITERS = iters
        try:
            codes, _ = _train_codes(melted)
            return codes.groupBy().sum("sq_err").collect()[0][0]
        finally:
            pq_mod.PQ_ITERS = orig

    e1, e3 = total_err(1), total_err(PQ_ITERS)
    assert e3 <= e1


def test_pq_train_sample_knob(spark):
    """The PQ_TRAIN_SAMPLE knob: with a cap below the corpus size,
    codebooks train on a deterministic xxhash64 vector sample, but
    (a) every vector still gets a code, (b) codes are valid, and
    (c) the sampled codebook's total quantization error stays within
    2x of full training — the at-scale contract (DESIGN.md promises
    training saturates on a sample while encoding covers the corpus).
    With the cap inactive (every test/driver SF), _train_codes is
    bitwise the oracle formulation — pinned by the driver hash gate.
    """
    import energy_data_pipeline_project_spark.operators.pq as pq_mod

    melted = _melted(spark, SF_SMOKE)
    n_vecs = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").count()
    full_codes, _ = _train_codes(melted, n_vecs=n_vecs)
    full_err = full_codes.groupBy().sum("sq_err").collect()[0][0]

    orig = pq_mod.PQ_TRAIN_SAMPLE
    pq_mod.PQ_TRAIN_SAMPLE = max(n_vecs // 4, PQ_K)
    try:
        codes, _ = _train_codes(melted, n_vecs=n_vecs)
        rows = codes.groupBy("vec_id").count().collect()
        assert len(rows) == n_vecs, "sampling must never drop encodings"
        assert all(r["count"] == pq_mod.PQ_M for r in rows)
        err = codes.groupBy().sum("sq_err").collect()[0][0]
        assert err <= 2 * full_err, (err, full_err)
    finally:
        pq_mod.PQ_TRAIN_SAMPLE = orig


def test_ivfpq_recall_vs_bruteforce(spark):
    """IVF-PQ composes two approximations (cell pruning + residual
    ADC) yet must meet the house >= 0.8 recall bar (r01 IVF
    precedent): trained coarse cells (2 Lloyd rounds) + nprobe=7 +
    2x exact-refine shortlist measure 0.9 at sf0.001, 0.85 at
    sf0.01."""
    from energy_data_pipeline_project_spark.operators.pq import (
        ann_topk_ivfpq,
    )

    bf = {
        (r.query_id, r.neighbor_id)
        for r in ann_topk_bruteforce(spark, SF_SMOKE).collect()
    }
    iv = {
        (r.query_id, r.neighbor_id)
        for r in ann_topk_ivfpq(spark, SF_SMOKE).collect()
    }
    assert len(bf & iv) / len(bf) >= 0.8
