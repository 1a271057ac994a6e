"""Targeted semantics tests for operators/training.py (the oracle
parity sweep in test_oracle_parity.py covers cross-engine equality;
these pin the properties the oracles can't express)."""

from __future__ import annotations

from collections import Counter

from energy_data_pipeline_project_spark.operators.training import (
    HH_K,
    mg_partial,
    heavy_hitters_frame,
    train_linear_probe,
    corpus_token_budget_plan,
    split_leakage_audit,
)
from energy_data_pipeline_project_spark.sources.tables import load_table

from .conftest import SF_SMOKE


# ---------------------------------------------------------------------------
# Misra-Gries
# ---------------------------------------------------------------------------


def test_mg_partial_bounds():
    """est ∈ [true - n/(k+1), true] and ≤ k counters, on an
    adversarial stream (one heavy token in a sea of singletons)."""
    stream = ["hot"] * 400 + [f"u{i}" for i in range(1000)]
    # interleave so the heavy token isn't a prefix
    mixed = [t for pair in zip(stream[:700], stream[700:]) for t in pair]
    k = 9
    est = mg_partial(mixed, k)
    true = Counter(mixed)
    n = len(mixed)
    assert len(est) <= k
    for tok, c in est.items():
        assert c <= true[tok]
        assert c >= true[tok] - n // (k + 1)
    # the heavy hitter (400/1400 > n/(k+1)) must survive
    assert "hot" in est


def test_heavy_hitters_distributed_guarantees(spark):
    """Distributed merge keeps the MG contract: underestimates only,
    additive error ≤ n/(k+1), deterministic across runs."""
    docs = load_table(spark, SF_SMOKE, "documents")
    est = {
        r["token"]: r["est_count"]
        for r in heavy_hitters_frame(docs).collect()
    }
    texts = [r["text"] for r in docs.select("text").collect()]
    true = Counter(t for x in texts if x for t in x.split(" ") if t)
    n = sum(true.values())
    assert est, "expected at least one surviving counter"
    for tok, c in est.items():
        assert c <= true[tok], f"{tok}: est {c} > true {true[tok]}"
        assert c >= true[tok] - n // (HH_K + 1), f"{tok}: error too large"
    est2 = {
        r["token"]: r["est_count"]
        for r in heavy_hitters_frame(docs).collect()
    }
    assert est == est2


# ---------------------------------------------------------------------------
# Linear probe training
# ---------------------------------------------------------------------------


def test_linear_probe_loss_decreases(spark):
    """LR_DIV sits below the GD stability bound for the capped
    features, so the squared-loss objective Σ err² must drop from
    step 1 to step 2, and step 1 must move the weights."""
    rows = {r["iter"]: r for r in train_linear_probe(spark, SF_SMOKE).collect()}
    assert set(rows) == {1, 2}
    assert rows[2]["sum_sq_err"] < rows[1]["sum_sq_err"]
    w1 = (rows[1]["w_bias"], rows[1]["w_ntoks"], rows[1]["w_ndist"])
    assert any(w != 0 for w in w1), "first step left weights at zero"


# ---------------------------------------------------------------------------
# Token-budget mixing plan
# ---------------------------------------------------------------------------


def test_token_budget_plan_invariants(spark):
    rows = corpus_token_budget_plan(spark, SF_SMOKE).collect()
    assert rows
    allocs = {r["alloc_tokens"] for r in rows}
    assert len(allocs) == 1, "uniform mixing: every source same allocation"
    for r in rows:
        assert 0 <= r["residual_tokens"] < r["src_tokens"]
        assert (
            r["epochs_full"] * r["src_tokens"] + r["residual_tokens"]
            == r["alloc_tokens"]
        )
        assert 0 <= r["residual_keep_permille"] < 1000


# ---------------------------------------------------------------------------
# Split-leakage audit
# ---------------------------------------------------------------------------


def test_split_leakage_audit_shape(spark):
    rows = split_leakage_audit(spark, SF_SMOKE).collect()
    assert rows, "testdata corpus has planted near-dups; expected pairs"
    order = {"train": 0, "val": 1, "test": 2}
    for r in rows:
        assert order[r["split_a"]] <= order[r["split_b"]]
        assert r["n_pairs"] >= 1
        # each pair touches 2 docs; distinct docs can't exceed that
        assert 2 <= r["n_docs"] <= 2 * r["n_pairs"]


# ---------------------------------------------------------------------------
# Composed probe filter (train → score → filter, one plan)
# ---------------------------------------------------------------------------


def test_probe_filter_exercises_both_branches(spark):
    from energy_data_pipeline_project_spark.operators.training import (
        corpus_probe_filter,
    )

    rows = corpus_probe_filter(spark, SF_SMOKE).collect()
    assert rows
    kept = sum(r["n_kept"] for r in rows)
    total = sum(r["n_docs"] for r in rows)
    assert 0 < kept < total, "calibrated threshold must split the corpus"
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_docs"]
        assert r["kept_permille"] == (1000 * r["n_kept"]) // r["n_docs"]
