"""Vector math over ``array<float>`` embedding columns — JVM-side.

Dot products / cosine similarity are expressed with ``zip_with`` +
``aggregate`` (Catalyst higher-order functions): whole-stage-codegen'd,
no Python in the loop. The numpy batch path for brute-force top-k lives
in ``operators/similarity.py`` as an Arrow-vectorized alternative.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def as_double(col: str) -> Column:
    """Cast array<float> → array<double> so accumulation is f64."""
    return F.expr(f"transform({col}, x -> CAST(x AS DOUBLE))")


def dot(a: str, b: str) -> Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def norm(a: str) -> Column:
    return F.sqrt(
        F.expr(
            f"aggregate({a}, CAST(0.0 AS DOUBLE), "
            f"(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
        )
    )


def cosine(a: str, b: str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
