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

# Cents-domain magnitude bound: |x| beyond this is a corrupt reading
# (as corrupt as NaN → NULL, never a dead job). The bound is set so a
# single guarded reading survives not just its own int64 cents cast
# (|x| ≤ 9.2e16) but every EXACT-INT MOMENT the tier computes on row
# grain: cents² at 3e9 cents is 9e18 ≈ int64 max, so 3.0e7 currency
# units ($30M per single reading) is the domain contract. The r09
# extended sweep proved the weaker cast-only bound just moved the
# crash into the second-moment products (zscore/ewma/OLS/seasonal) and
# past pandas' 2^53 integer-exactness. DAY-GRAIN sums of many legal
# readings can still outgrow int64 squares at extreme volume — that
# migration (DECIMAL/double moments) is documented per query.
CENTS_ABS_MAX = 3.0e7

# NULL out NaN, ±Inf, AND |x| > {bound}: the bounded-domain guard.
BOUNDED_TPL = (
    "(CASE WHEN isnan(CAST({x} AS DOUBLE))"
    " OR abs(CAST({x} AS DOUBLE)) = CAST('Infinity' AS DOUBLE)"
    " OR abs(CAST({x} AS DOUBLE)) > {bound}"
    " THEN NULL ELSE CAST({x} AS DOUBLE) END)"
)

# measure → exact integer cents; non-finite OR out-of-domain → NULL.
CENTS_TPL = (
    "CAST(ROUND("
    + BOUNDED_TPL.replace("{bound}", repr(CENTS_ABS_MAX))
    + " * 100, 0) AS BIGINT)"
)


def finite_sql(expr_sql: str, bound: float | None = None) -> str:
    """SQL (both engines): ``expr`` as DOUBLE; NaN/±Inf → NULL, and
    with ``bound`` also ``|x| > bound`` → NULL (pick the bound so the
    guarded value survives every downstream cast — e.g. int64 for
    Z-order grids, int64/100 for cents)."""
    if bound is None:
        return FINITE_TPL.format(x=expr_sql)
    return BOUNDED_TPL.replace("{bound}", repr(float(bound))).format(
        x=expr_sql
    )


def cents_sql(expr_sql: str) -> str:
    """SQL (both engines): exact integer cents; NaN/±Inf/out-of-domain
    → NULL."""
    return CENTS_TPL.format(x=expr_sql)


def cents(expr_sql: str) -> F.Column:
    """Spark Column form of :func:`cents_sql`."""
    return F.expr(cents_sql(expr_sql))
