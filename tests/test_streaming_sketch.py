"""Streaming sharded Misra-Gries vs exact counts.

The MG contract (underestimate; additive error ≤ shard-stream/(k+1))
holds for ANY arrival order, so the assertion is order-robust even
though the stream replays files in nondeterministic batch groupings.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pyspark.sql.functions as F

from energy_data_pipeline_project_spark.operators.training import HH_K
from energy_data_pipeline_project_spark.sources.tables import load_table
from energy_data_pipeline_project_spark.streaming.sketches import (
    N_SHARDS,
    heavy_hitters_stream,
)

from .conftest import SF_SMOKE


def test_streaming_mg_contract(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("docs-stream"))
    docs = load_table(spark, SF_SMOKE, "documents")
    docs.repartition(6).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 2)  # force several micro-batches
        .parquet(src)
    )
    q = (
        heavy_hitters_stream(stream)
        .writeStream.format("memory")
        .queryName("mg_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    emitted = spark.sql("SELECT * FROM mg_stream").collect()
    assert emitted, "stream emitted no summaries"
    # latest summary per shard = rows carrying that shard's max n_seen
    latest_seen: dict[int, int] = defaultdict(int)
    for r in emitted:
        latest_seen[r["shard"]] = max(latest_seen[r["shard"]], r["n_seen"])
    est: dict[str, int] = {}
    for r in emitted:
        if r["n_seen"] == latest_seen[r["shard"]]:
            est[r["token"]] = r["est_count"]

    # exact per-token counts + each token's shard stream size
    tok_rows = (
        docs.select(
            F.explode(
                F.expr("filter(split(text, ' '), x -> x != '')")
            ).alias("token")
        )
        .withColumn(
            "shard", F.pmod(F.xxhash64("token"), F.lit(N_SHARDS))
        )
        .collect()
    )
    true = Counter(r["token"] for r in tok_rows)
    shard_n = Counter(r["shard"] for r in tok_rows)
    shard_of = {r["token"]: r["shard"] for r in tok_rows}

    per_shard_counters = Counter()
    for tok, c in est.items():
        per_shard_counters[shard_of[tok]] += 1
        bound = shard_n[shard_of[tok]] // (HH_K + 1)
        assert c <= true[tok], f"{tok}: est {c} > true {true[tok]}"
        assert c >= true[tok] - bound, f"{tok}: error above n_shard/(k+1)"
    assert all(v <= HH_K for v in per_shard_counters.values())


def test_streaming_cms_equals_batch_grid(spark, tmp_path_factory):
    """CMS cells are exact counts (a commutative monoid), so the
    streamed fold must equal the batch grid bit-for-bit regardless of
    how the file replay slices micro-batches."""
    from energy_data_pipeline_project_spark.operators.timeseries import (
        cms_grid,
        cms_hashed,
    )
    from energy_data_pipeline_project_spark.streaming.sketches import cms_stream

    src = str(tmp_path_factory.mktemp("events-stream"))
    ev = load_table(spark, SF_SMOKE, "events")
    ev.repartition(6).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    q = (
        cms_stream(stream)
        .writeStream.format("memory")
        .queryName("cms_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    emitted = spark.sql("SELECT * FROM cms_stream").collect()
    assert emitted
    latest_seen = defaultdict(int)
    for r in emitted:
        latest_seen[r["i"]] = max(latest_seen[r["i"]], r["n_seen"])
    streamed = {
        (r["i"], r["col"]): r["cnt"]
        for r in emitted
        if r["n_seen"] == latest_seen[r["i"]]
    }
    batch = {
        (r["i"], r["col"]): r["cnt"]
        for r in cms_grid(cms_hashed(ev)).collect()
    }
    assert streamed == batch
