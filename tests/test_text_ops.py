"""Semantic invariants of the text operators (beyond oracle parity)."""

from __future__ import annotations

import pyspark.sql.functions as F

from energy_data_pipeline_project_spark.operators import text
from energy_data_pipeline_project_spark.sources.tables import load_table

from .conftest import SF_CORRECT


def test_chunk_reconstruction_exact(spark):
    """Dechunking (drop the first `overlap` tokens of every chunk after
    the first) must rebuild every document's token sequence exactly."""
    ch = text.QUERIES["text_chunk"](spark, SF_CORRECT)
    rebuilt = (
        ch.withColumn(
            "part",
            F.when(F.col("chunk_id") == 0, F.split("chunk_text", " ")).otherwise(
                F.expr(
                    f"slice(split(chunk_text, ' '), {text.CHUNK_OVERLAP + 1}, "
                    f"{10**6})"
                )
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.expr(
                "flatten(transform(array_sort(collect_list(struct(chunk_id, part))),"
                " x -> x.part))"
            ).alias("rebuilt")
        )
    )
    docs = load_table(spark, SF_CORRECT, "documents").select(
        "doc_id", F.expr("filter(split(text, ' '), x -> x != '')").alias("toks")
    )
    assert docs.join(rebuilt, "doc_id").where("toks != rebuilt").count() == 0
    assert rebuilt.count() == docs.where(F.size("toks") > 0).count()


def test_no_chunk_contained_in_predecessor(spark):
    """Every doc with more than one chunk must have full-size non-final
    chunks (the start bound guarantees no fully-redundant chunk)."""
    ch = text.QUERIES["text_chunk"](spark, SF_CORRECT)
    bad = (
        ch.groupBy("doc_id")
        .agg(F.count("*").alias("n"), F.max("n_chunk_tokens").alias("mx"))
        .where(f"n > 1 AND mx < {text.CHUNK_TOKENS}")
        .count()
    )
    assert bad == 0


def test_fingerprint_is_order_sensitive(spark):
    """The positional fingerprint must distinguish permutations (unlike
    a bag-of-words hash)."""
    from energy_data_pipeline_project_spark.functions import hashing as H

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha")], "doc_id long, text string"
    )

    pos = df.select(
        "doc_id",
        F.posexplode(F.expr(H.tokens_sql("text", duck=False))).alias("p", "w"),
    ).select("doc_id", (F.col("p") + 1).alias("i"), "w")
    h = F.expr(H.md5_int64("w", duck=False))
    out = pos.groupBy("doc_id").agg(
        (F.sum((h % H.FINGERPRINT_MOD) * F.col("i")) % H.FINGERPRINT_MOD).alias("fp")
    )
    a, b = [r["fp"] for r in out.orderBy("doc_id").collect()]
    assert a != b
