"""Streaming ingest decontamination: screen arriving documents against
a static benchmark set before they enter the lake.

The production moment for ``dedup_contamination_bloom`` is not a batch
audit but ingest time — every crawl batch must be checked against the
held-out eval suites BEFORE it lands in training storage. This module
runs exactly that: the benchmark posting list and its broadcastable
m-bit Bloom image are built once from the static table; each arriving
micro-batch shingles its documents, discards ~all clean postings
map-side via the Bloom probe, exact-verifies the survivors against
the benchmark postings, and appends per-document contamination
verdicts. Batch-vs-stream parity is pinned row-for-row in
tests/test_streaming_screening.py.

foreachBatch again (same reasoning as streaming/serving.py): the
verdict needs per-document COUNT(DISTINCT ...) with a HAVING gate —
legal on the bounded micro-batch, not on the unbounded stream. The
stream side is stateless; the benchmark state is static.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.dedup import (
    _contamination_postings,
    _contamination_report,
    bloom_build,
    bloom_prefilter,
)
from ..sources.tables import load_table


def build_benchmark(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(bench postings, bloom words) from the static documents table —
    the once-per-release artifact the screen runs against."""
    docs = load_table(spark, sf_dir, "documents")
    _, bench = _contamination_postings(docs)
    bench = bench.localCheckpoint(eager=True)
    bloom = bloom_build(bench.select("h").distinct()).localCheckpoint(
        eager=True
    )
    return bench, bloom


def screen_batch(
    batch_docs: DataFrame, bench: DataFrame, bloom: DataFrame
) -> DataFrame:
    """One micro-batch of documents → contamination verdicts.

    ``_contamination_postings`` applies the benchmark key-carve, so
    benchmark-keyed documents appearing in the stream screen out of
    the corpus side automatically (they ARE the benchmark)."""
    corp, _ = _contamination_postings(batch_docs)
    survivors = bloom_prefilter(corp, bloom)
    return _contamination_report(survivors.join(bench, "h"))


def screen_stream(
    docs_stream: DataFrame,
    bench: DataFrame,
    bloom: DataFrame,
    out_dir: str,
    checkpoint: str,
):
    """Start the screening query: contamination verdicts for each
    arriving batch append to ``out_dir`` as parquet."""

    def handle(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        screen_batch(batch, bench, bloom).write.mode("append").parquet(
            out_dir
        )

    return (
        docs_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
