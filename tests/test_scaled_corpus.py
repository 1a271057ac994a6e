"""Pins for testing.write_scaled_corpus (the scale-stress generator).

The ×N blow-up must preserve schema and distribution SHAPE exactly —
a generator bug (dropped column, unshifted key, doubled dimension
table) would silently invalidate every SCALE_STRESS.json conclusion.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from energy_data_pipeline_project_spark.sources.tables import (
    TABLES,
    load_table,
)
from energy_data_pipeline_project_spark.testing import (
    SCALE_KEY_STRIDE,
    write_scaled_corpus,
)

BASE = "/root/testdata/sf0.001"
N = 3


@pytest.fixture(scope="module")
def scaled_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("scaled"))
    write_scaled_corpus(spark, d, N, BASE, fact_partitions=4)
    return d


def test_row_counts_and_schemas(spark, scaled_dir):
    for name in TABLES:
        base = load_table(spark, BASE, name)
        sc = load_table(spark, scaled_dir, name)
        assert sc.schema == base.schema, name
        mult = 1 if name in ("region", "nation") else N
        assert sc.count() == base.count() * mult, name


def test_copy_zero_is_byte_identical(spark, scaled_dir):
    """Copy 0 must be the base corpus verbatim: keys unshifted, text
    untagged, embeddings unperturbed — scale conclusions drawn on the
    blow-up must embed the real corpus as a subset."""
    for table, cols in (
        ("documents", ["doc_id", "text"]),
        ("embeddings", ["vec_id", "embedding"]),
    ):
        key = cols[0]
        base = load_table(spark, BASE, table).select(cols)
        sc = (
            load_table(spark, scaled_dir, table)
            .where(F.col(key) < SCALE_KEY_STRIDE)
            .select(cols)
        )
        assert base.exceptAll(sc).count() == 0, table
        assert sc.exceptAll(base).count() == 0, table


def test_keys_shifted_and_joinable(spark, scaled_dir):
    """Every copy's lineitem must join its own copy's orders — the
    orphan count (lineitems with no order) must stay exactly N× the
    base orphan count, proving key remapping is consistent across
    tables."""

    def orphans(d):
        li = load_table(spark, d, "lineitem")
        o = load_table(spark, d, "orders").select("o_orderkey").distinct()
        return li.join(
            o, li.l_orderkey == o.o_orderkey, "left_anti"
        ).count()

    assert orphans(scaled_dir) == N * orphans(BASE)


def test_dup_rate_scales_with_copies(spark, scaled_dir):
    """Cross-copy documents are near-dups BY DESIGN (tagged, not
    identical): exact dedup must find no new exact dups beyond N×
    the base groups' blow-up, while distinct texts grow ~N×."""
    base_texts = (
        load_table(spark, BASE, "documents").select("text").distinct().count()
    )
    sc_texts = (
        load_table(spark, scaled_dir, "documents")
        .select("text")
        .distinct()
        .count()
    )
    # copy 0 identical + (N-1) tagged variants per non-null text
    assert sc_texts > base_texts * (N - 1)
