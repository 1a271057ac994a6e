"""Semantic tests for the round-2 operator additions: segment-level
corpus dedup, SimHash-Hamming pair join, per-source caps, exact-moment
linear regression, and the data-quality expectation audit."""

from __future__ import annotations

import pyspark.sql.functions as F

from energy_data_pipeline_project_spark.operators import dedup, text
from energy_data_pipeline_project_spark.operators.relational import (
    QUERIES as REL_QUERIES,
    linear_trend,
)
from energy_data_pipeline_project_spark.sources.tables import load_table

from .conftest import SF_CORRECT, SF_SMOKE


# --- text_segment_dedup -----------------------------------------------------
def test_segment_dedup_first_writer_wins(spark, tmp_path):
    """A segment appearing in several docs survives only at its
    corpus-global first position; fully duplicate docs end NULL."""
    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta epsilon zeta"),  # first segment duplicates doc 1
        (3, "alpha beta gamma delta"),  # fully duplicate of doc 1
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    # Reuse the registered query body by monkey-style: call the core
    # via the same plan on a temp table is overkill — just rebuild.
    out = {
        r["doc_id"]: r
        for r in _segment_dedup_frame(docs, tmp_path).collect()
    }
    assert out[1]["deduped_text"] == "alpha beta gamma delta"
    assert out[1]["kept_segments"] == 2
    assert out[2]["deduped_text"] == "epsilon zeta"
    assert out[2]["kept_segments"] == 1 and out[2]["total_segments"] == 2
    assert out[3]["deduped_text"] is None
    assert out[3]["kept_segments"] == 0 and out[3]["total_segments"] == 2


def _segment_dedup_frame(docs, tmp_path):
    """Run the text_segment_dedup plan on an arbitrary docs frame via a
    fixture-table swap (the query reads the documents table by path).
    Uses pytest tmp_path so the parquet fixture is retention-bounded
    instead of leaking into the system temp dir (r06 review)."""
    spark = docs.sparkSession

    d = str(tmp_path / "segdedup")
    docs.select(
        "doc_id", "text", F.lit("en").alias("lang"),
        F.lit("t").alias("source"), F.length("text").alias("n_chars"),
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return text.QUERIES["text_segment_dedup"](spark, d)


def test_segment_dedup_conserves_segments(spark):
    """Sum of kept segments == number of distinct segments in the
    corpus (each distinct segment survives exactly once)."""
    out = text.QUERIES["text_segment_dedup"](spark, SF_CORRECT)
    kept = out.agg(F.sum("kept_segments")).first()[0]
    docs = load_table(spark, SF_CORRECT, "documents")
    seg = docs.select(
        "doc_id",
        F.explode(
            F.expr(text._segments_sql(duck=False).replace(
                "toks", "filter(split(text, ' '), x -> x != '')"))
        ).alias("seg"),
    )
    assert kept == seg.select("seg").distinct().count()


# --- dedup_simhash_hamming --------------------------------------------------
def test_simhash_hamming_identical_docs_distance_zero(spark):
    rows = [
        (1, "quick brown fox jumps over the lazy dog again and again"),
        (2, "quick brown fox jumps over the lazy dog again and again"),
        (3, "entirely different words compose this unrelated document body"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dedup.simhash_hamming_pairs(docs).collect()
    }
    assert got.get((1, 2)) == 0
    assert all(k in ((1, 2),) for k in got)


def test_simhash_hamming_within_threshold(spark):
    out = dedup.QUERIES["dedup_simhash_hamming"](spark, SF_CORRECT)
    bad = out.where(
        (F.col("hamming") < 0)
        | (F.col("hamming") > dedup.SIMHASH64_HAMMING_MAX)
        | (F.col("doc_a") >= F.col("doc_b"))
    ).count()
    dedup.release_cached_frames()
    assert bad == 0


# --- docs_source_cap --------------------------------------------------------
def test_source_cap_respected_and_salting_transparent(spark):
    out = text.QUERIES["docs_source_cap"](spark, SF_CORRECT)
    per = out.groupBy("source").agg(
        F.count("*").alias("n"), F.max("source_rank").alias("mx")
    )
    assert per.where(F.col("n") > text.SOURCE_CAP_N).count() == 0
    assert per.where(F.col("mx") > text.SOURCE_CAP_N).count() == 0
    # salting transparency: equals the single-window formulation
    from energy_data_pipeline_project_spark.functions import hashing as H

    docs = load_table(spark, SF_CORRECT, "documents")
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy("rk", "doc_id")
    plain = (
        docs.select(
            "doc_id", "source",
            F.expr(H.md5_int64("CAST(doc_id AS STRING)", duck=False)).alias("rk"),
        )
        .withColumn("source_rank", F.row_number().over(w).cast("int"))
        .where(F.col("source_rank") <= text.SOURCE_CAP_N)
        .select("doc_id", "source", "source_rank")
    )
    assert out.exceptAll(plain).count() == 0
    assert plain.exceptAll(out).count() == 0


# --- events_linear_trend ----------------------------------------------------
def test_linear_trend_recovers_known_slope(spark):
    """y = 200 + 300*x cents, exactly on a line → slope/intercept exact
    and r == 1.0 (all arithmetic from exact integer moments)."""
    rows = [
        ("a", f"2024-01-{d:02d} 00:00:00", (200 + 300 * (d - 1)) / 100.0)
        for d in range(1, 11)
    ]
    ev = spark.createDataFrame(rows, ["event_type", "ts_s", "value"]).select(
        "event_type", F.to_timestamp("ts_s").alias("ts"), "value"
    )
    got = linear_trend(ev).collect()[0]
    assert got["slope_cents_per_day"] == 300.0
    assert got["intercept_cents"] == 200.0
    assert abs(got["r"] - 1.0) < 1e-12


# --- dq_expectations --------------------------------------------------------
def test_dq_expectations_clean_on_testdata(spark):
    out = {
        r["check_name"]: r["bad_rows"]
        for r in REL_QUERIES["dq_expectations"](spark, SF_CORRECT).collect()
    }
    assert len(out) == 6
    assert all(v == 0 for v in out.values()), out


# --- pagerank_dup_graph -----------------------------------------------------
def test_pagerank_star_graph_centers_rank_highest(spark):
    """On a star (0-1, 0-2, 0-3, 0-4) the hub must out-rank every leaf,
    and leaves must tie exactly (integer arithmetic is exact)."""
    from energy_data_pipeline_project_spark.operators.graph import (
        pagerank_exact,
    )

    pairs = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], ["doc_a", "doc_b"]
    )
    got = {r["doc_id"]: r["rank"] for r in pagerank_exact(pairs).collect()}
    leaves = {got[i] for i in range(1, 5)}
    assert len(leaves) == 1, "exact arithmetic must tie the leaves"
    assert got[0] > got[1]


def test_linear_trend_zero_variance_gates_to_null_exactly(spark):
    """All events of a type on ONE day → x-variance is exactly zero →
    slope/intercept/r must be NULL via the EXACT MIN=MAX witness (r10
    advisor: the rounded IEEE denominator alone can read a tiny
    nonzero value once n*sxx passes 2^53 and emit a garbage slope);
    constant y must likewise gate r but keep a defined (zero) slope."""
    rows = [("a", "2024-01-05 00:00:00", float(v)) for v in (1, 2, 3)]
    rows += [("b", f"2024-01-{d:02d} 00:00:00", 7.0) for d in (1, 3, 9)]
    ev = spark.createDataFrame(rows, ["event_type", "ts_s", "value"]).select(
        "event_type", F.to_timestamp("ts_s").alias("ts"), "value"
    )
    got = {r["event_type"]: r for r in linear_trend(ev).collect()}
    assert got["a"]["slope_cents_per_day"] is None
    assert got["a"]["intercept_cents"] is None
    assert got["a"]["r"] is None
    # constant-y group: slope exactly 0, r undefined (y never varies)
    assert got["b"]["slope_cents_per_day"] == 0.0
    assert got["b"]["r"] is None
