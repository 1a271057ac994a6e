"""Fixed-point money/measure conversion, non-finite-hardened.

The house float rule converts every money-ish measure to integer cents
(``CAST(ROUND(x * 100, 0) AS BIGINT)``) before aggregation so sums are
exact and cross-engine hash-identical. That template had a 100 TB
robustness hole (found by the r09 degenerate-corpus sweep): ONE
NaN/Inf reading — a corrupt sensor value, a bad parse upstream —
aborted the whole job in BOTH engines (ANSI ``CAST(NaN AS BIGINT)``
in Spark, the same conversion error in DuckDB). Agreement-by-crash is
still the wrong posture: a corrupt reading must degrade to NULL (the
row stays countable; the measure is skipped by SUM) exactly like the
NULL it semantically is — the same lesson ``functions/layout.py``
learned for Z-order bounds.

``FINITE_TPL``/``CENTS_TPL`` are single SQL spellings valid VERBATIM
in BOTH Spark and DuckDB (isnan/abs/CASE/CAST('Infinity' AS DOUBLE)
are identical), so every consumer — Spark plan, oracle SQL, streaming
twin — instantiates literally the same text and cannot drift.
"""

from __future__ import annotations

import pyspark.sql.functions as F

# NULL out NaN and ±Inf; pass finite values through as DOUBLE.
FINITE_TPL = (
    "(CASE WHEN isnan(CAST({x} AS DOUBLE))"
    " OR abs(CAST({x} AS DOUBLE)) = CAST('Infinity' AS DOUBLE)"
    " THEN NULL ELSE CAST({x} AS DOUBLE) END)"
)

# measure → exact integer cents, non-finite → NULL.
CENTS_TPL = "CAST(ROUND(" + FINITE_TPL + " * 100, 0) AS BIGINT)"


def finite_sql(expr_sql: str) -> str:
    """SQL (both engines): ``expr`` as DOUBLE, NaN/±Inf → NULL."""
    return FINITE_TPL.format(x=expr_sql)


def cents_sql(expr_sql: str) -> str:
    """SQL (both engines): exact integer cents, NaN/±Inf → NULL."""
    return CENTS_TPL.format(x=expr_sql)


def cents(expr_sql: str) -> F.Column:
    """Spark Column form of :func:`cents_sql`."""
    return F.expr(cents_sql(expr_sql))
