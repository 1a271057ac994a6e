"""Query surface registry.

Each operator module registers named queries (PySpark callables
``(spark, sf_dir) -> DataFrame``) and, where ANSI-SQL-expressible, a
DuckDB oracle twin. ``all_queries()`` / ``all_oracles()`` merge them for
``__spark_entry__.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def all_queries() -> dict[str, QueryFn]:
    from . import (
        clustering,
        curation,
        dedup,
        graph,
        multimodal,
        pq,
        relational,
        similarity,
        text,
        timeseries,
        tpch_shapes,
        training,
        warehouse,
    )

    out: dict[str, QueryFn] = {}
    for mod in (
        relational,
        tpch_shapes,
        timeseries,
        warehouse,
        dedup,
        similarity,
        clustering,
        graph,
        text,
        multimodal,
        curation,
        training,
        pq,
    ):
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    from . import (
        clustering,
        curation,
        dedup,
        graph,
        multimodal,
        pq,
        relational,
        similarity,
        text,
        timeseries,
        tpch_shapes,
        training,
        warehouse,
    )

    out: dict[str, str] = {}
    for mod in (
        relational,
        tpch_shapes,
        timeseries,
        warehouse,
        dedup,
        similarity,
        clustering,
        graph,
        text,
        multimodal,
        curation,
        training,
        pq,
    ):
        out.update(mod.ORACLES)
    return out
