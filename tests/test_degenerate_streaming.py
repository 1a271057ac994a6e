"""Degenerate-corpus sweep, streaming tier: the adversarial fixture
(testing.write_degenerate_corpus) replayed through the highest-risk
streaming twins. The batch sweep (test_degenerate_corpus.py) proved
NULL/NaN/ragged rows kill jobs and split engines; the streaming twins
run the same operator logic inside foreachBatch / stateful handlers,
where a crash additionally poisons the CHECKPOINT (the stream cannot
restart past the bad batch) — so availability here is even more
load-bearing than in batch."""

from __future__ import annotations

import math

import pytest

from energy_data_pipeline_project_spark.testing import (
    write_degenerate_corpus,
)


@pytest.fixture(scope="module")
def degen_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("degen-stream"))
    write_degenerate_corpus(d)
    return d


def _replay(spark, schema, src, files_per_trigger=2):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(src)
    )


def test_sessionizer_survives_degenerate_events(
    spark, degen_dir, tmp_path_factory
):
    """NULL ts / NULL user_id / NaN value events must not kill the
    sessionizer or corrupt its state. NOTE the watermark does NOT
    filter NULL event-time rows before the stateful handler — they
    arrive as NaT and the pd.notna guard in stateful._sessionize_fn is
    what drops them (removing it reintroduces a checkpoint-poisoning
    crash; see the guard's comment)."""
    from energy_data_pipeline_project_spark.streaming import jobs
    from energy_data_pipeline_project_spark.streaming.stateful import (
        sessionize_with_state,
    )

    src = str(tmp_path_factory.mktemp("ev-degen"))
    docs = spark.read.parquet(f"{degen_dir}/events.parquet")
    docs.repartitionByRange(4, "ts").write.mode("overwrite").parquet(src)

    out = sessionize_with_state(jobs.read_event_stream(spark, src))
    ckpt = str(tmp_path_factory.mktemp("ev-degen-ckpt"))
    q = (
        out.writeStream.format("memory")
        .queryName("degen_sessions")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("degen_sessions").collect()
    # the replay MUST close sessions for the timestamped base events —
    # an empty result would mean the stream silently dropped everything
    # (vacuous-loop guard, r09 second diff review)
    assert got, "no sessions closed over the degenerate replay"
    for r in got:
        assert r["n_events"] > 0
        assert r["duration_s"] >= 0


def test_dedup_index_survives_degenerate_docs(
    spark, degen_dir, tmp_path_factory
):
    """NULL-text and duplicate/NULL doc_id documents flow through the
    streaming LSH ingest screen without killing a batch; the index
    stays consistent with what arrived."""
    from energy_data_pipeline_project_spark.streaming.dedup_index import (
        stream_dedup_index,
    )

    src = str(tmp_path_factory.mktemp("docs-degen"))
    index = str(tmp_path_factory.mktemp("lsh-degen")) + "/sig"
    verdicts = str(tmp_path_factory.mktemp("verdicts-degen")) + "/v"
    ckpt = str(tmp_path_factory.mktemp("ingest-degen-ckpt"))

    docs = spark.read.parquet(f"{degen_dir}/documents.parquet")
    docs.repartition(4).write.mode("overwrite").parquet(src)

    q = stream_dedup_index(_replay(spark, docs.schema, src), index, verdicts, ckpt)
    q.awaitTermination()

    # the exact-dup pair planted in the fixture must be caught
    caught = {
        (min(r.doc_id, r.dup_of), max(r.doc_id, r.dup_of))
        for r in spark.read.parquet(verdicts).collect()
        if r.doc_id is not None and r.dup_of is not None
    }
    assert (900005, 900006) in caught, sorted(caught)[-5:]


def test_cms_stream_survives_degenerate_events(
    spark, degen_dir, tmp_path_factory
):
    """The count-min fold over degenerate events (NULL user_id rows)
    equals the batch grid exactly — the mergeable-monoid contract must
    hold on adversarial input too."""
    from collections import defaultdict

    from energy_data_pipeline_project_spark.operators.timeseries import (
        cms_grid,
        cms_hashed,
    )
    from energy_data_pipeline_project_spark.streaming.sketches import (
        cms_stream,
    )

    src = str(tmp_path_factory.mktemp("ev-cms-degen"))
    ev = spark.read.parquet(f"{degen_dir}/events.parquet")
    ev.repartition(4).write.mode("overwrite").parquet(src)

    q = (
        cms_stream(_replay(spark, ev.schema, src))
        .writeStream.format("memory")
        .queryName("degen_cms")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.table("degen_cms").collect()
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
    assert streamed == batch and batch


def test_screening_survives_degenerate_docs(
    spark, degen_dir, tmp_path_factory
):
    """Contamination screening of a degenerate batch (NULL/empty text)
    neither crashes nor verdicts a keyless doc twice."""
    from energy_data_pipeline_project_spark.streaming.screening import (
        build_benchmark,
        screen_batch,
    )

    docs = spark.read.parquet(f"{degen_dir}/documents.parquet")
    bench, bloom = build_benchmark(spark, degen_dir)
    verdicts = screen_batch(
        docs, bench, bloom, carve_benchmark=False
    ).collect()
    assert isinstance(verdicts, list)  # ran to completion


def test_serving_survives_degenerate_query_vectors(
    spark, degen_dir, tmp_path_factory
):
    """An online ANN server fed NULL / empty / zero query vectors must
    answer the valid queries and never die on the rest."""
    import pyspark.sql.functions as F

    from energy_data_pipeline_project_spark.streaming.serving import (
        PQIndex,
        _serve_batch,
        build_pq_index,
    )

    index = build_pq_index(spark, degen_dir)
    emb = spark.read.parquet(f"{degen_dir}/embeddings.parquet")
    queries = emb.select(
        F.col("vec_id").alias("query_id"), "embedding"
    ).where("vec_id >= 900001")
    out = _serve_batch(queries, index).collect()
    # the VALID degenerate queries (identical/opposite/small vectors)
    # must be answered — an empty result would mean the server
    # silently dropped everything (vacuous-loop guard, r09 review)
    assert out, "no answers for the valid degenerate queries"
    answered = {r["query_id"] for r in out}
    assert 900003 in answered, sorted(answered)
    for r in out:
        assert r["rank"] >= 1


def test_trend_stream_survives_degenerate_events(
    spark, degen_dir, tmp_path_factory
):
    """Day-total trend fold over NaN/Inf/NULL-ts events: the stream
    must complete and its day totals must match the batch twin's
    guarded-cents day totals."""
    from energy_data_pipeline_project_spark.streaming import jobs
    from energy_data_pipeline_project_spark.streaming.trend import (
        stream_day_totals,
    )

    src = str(tmp_path_factory.mktemp("ev-trend-degen"))
    ev = spark.read.parquet(f"{degen_dir}/events.parquet")
    ev.repartition(4).write.mode("overwrite").parquet(src)
    out_dir = str(tmp_path_factory.mktemp("trend-out")) + "/t"
    ckpt = str(tmp_path_factory.mktemp("trend-ckpt"))

    q = stream_day_totals(
        jobs.read_event_stream(spark, src), out_dir, ckpt
    )
    q.awaitTermination()
    got = spark.read.parquet(out_dir)
    assert got.count() > 0
    # no NaN leaked into any numeric output column
    for r in got.collect():
        for v in r.asDict().values():
            if isinstance(v, float):
                assert not math.isnan(v) and not math.isinf(v)


def test_funnel_span_attribution_survive_degenerate_input(
    spark, degen_dir, tmp_path_factory
):
    """The remaining foreachBatch twins — funnel state, span index,
    attribution, heavy hitters, drift — each complete an availableNow
    replay of the adversarial fixture without a dead batch."""
    from energy_data_pipeline_project_spark.streaming import jobs
    from energy_data_pipeline_project_spark.streaming.attribution import (
        stream_attribution,
    )
    from energy_data_pipeline_project_spark.streaming.funnel import (
        funnel_report,
        stream_funnel_state,
    )
    from energy_data_pipeline_project_spark.streaming.span_index import (
        stream_span_index,
    )

    ev_src = str(tmp_path_factory.mktemp("ev-rest-degen"))
    ev = spark.read.parquet(f"{degen_dir}/events.parquet")
    ev.repartition(4).write.mode("overwrite").parquet(ev_src)
    docs_src = str(tmp_path_factory.mktemp("docs-rest-degen"))
    docs = spark.read.parquet(f"{degen_dir}/documents.parquet")
    docs.repartition(4).write.mode("overwrite").parquet(docs_src)

    fun_state = str(tmp_path_factory.mktemp("funnel-degen")) + "/state"
    q = stream_funnel_state(
        jobs.read_event_stream(spark, ev_src),
        fun_state,
        str(tmp_path_factory.mktemp("funnel-ckpt")),
    )
    q.awaitTermination()
    rep = {
        r["stage"]: r["n_users"]
        for r in funnel_report(spark, fun_state).collect()
    }
    assert len(rep) == 3 and all(v >= 0 for v in rep.values())

    idx = str(tmp_path_factory.mktemp("span-degen")) + "/idx"
    spans = str(tmp_path_factory.mktemp("span-degen-out")) + "/spans"
    q = stream_span_index(
        _replay(spark, docs.schema, docs_src),
        idx,
        spans,
        str(tmp_path_factory.mktemp("span-ckpt")),
    )
    q.awaitTermination()

    clicks = str(tmp_path_factory.mktemp("attr-degen")) + "/clicks"
    splits = str(tmp_path_factory.mktemp("attr-degen-out")) + "/splits"
    q = stream_attribution(
        jobs.read_event_stream(spark, ev_src),
        clicks,
        splits,
        str(tmp_path_factory.mktemp("attr-ckpt")),
    )
    q.awaitTermination()


def test_heavy_hitters_and_drift_survive_degenerate_input(
    spark, degen_dir, tmp_path_factory
):
    from energy_data_pipeline_project_spark.streaming.drift import (
        drift_stream,
    )
    from energy_data_pipeline_project_spark.streaming.sketches import (
        heavy_hitters_stream,
    )

    docs_src = str(tmp_path_factory.mktemp("docs-hh-degen"))
    docs = spark.read.parquet(f"{degen_dir}/documents.parquet")
    docs.repartition(4).write.mode("overwrite").parquet(docs_src)
    q = (
        heavy_hitters_stream(_replay(spark, docs.schema, docs_src))
        .writeStream.format("memory")
        .queryName("degen_hh")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.table("degen_hh").count() >= 0

    ord_src = str(tmp_path_factory.mktemp("ord-drift-degen"))
    orders = spark.read.parquet(f"{degen_dir}/orders.parquet")
    orders.repartition(4).write.mode("overwrite").parquet(ord_src)
    ref = [1] * 16
    q = (
        drift_stream(_replay(spark, orders.schema, ord_src), ref)
        .writeStream.format("memory")
        .queryName("degen_drift")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.table("degen_drift").count() >= 0
