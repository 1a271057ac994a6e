"""Oracle-parity harness replicating the driver's correctness gate.

Runs a Spark query and its DuckDB oracle over the same parquet tables
and compares row count, sorted column names, and the order-insensitive
multiset of row values. The engine's queries are designed for *exact*
cross-engine equality (integer cents, bounded rounding, no raw
timestamps), so the comparison is equality on canonical reprs — with
the single normalization of -0.0 → 0.0.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb

from .sources.tables import TABLES


def duck_connection(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


# DuckDB output types with no exact Spark twin. The driver's value hasher is
# type-aware: an uncast DuckDB SUM(BIGINT) yields HUGEINT (int128) and
# hash-mismatches Spark's BIGINT even when every value is equal (round-4
# verdict, 6 red rows). Oracles must CAST such aggregates to BIGINT/DOUBLE.
FORBIDDEN_DUCK_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def oracle_output_types(con, oracle_sql: str) -> list[tuple[str, str]]:
    """(column, duckdb_type) pairs for an oracle query's output schema."""
    rows = con.execute(f"DESCRIBE {oracle_sql}").fetchall()
    return [(r[0], r[1]) for r in rows]


def duck_to_spark_type(duck_type: str) -> str:
    """Map a DuckDB output type to the Spark ``simpleString`` twin.

    Only covers types the oracle surface is allowed to emit; anything
    unmapped returns ``"?<type>"`` so audits surface it as a mismatch.
    """
    t = duck_type.upper()
    base = {
        "BIGINT": "bigint",
        "INTEGER": "int",
        "SMALLINT": "smallint",
        "TINYINT": "tinyint",
        "UBIGINT": "bigint",
        "DOUBLE": "double",
        "FLOAT": "float",
        "REAL": "float",
        "VARCHAR": "string",
        "BOOLEAN": "boolean",
        "DATE": "date",
        "TIMESTAMP": "timestamp",
        "BLOB": "binary",
    }
    if t in base:
        return base[t]
    if t.endswith("[]"):
        return f"array<{duck_to_spark_type(t[:-2])}>"
    return f"?{duck_type}"


def _is_forbidden_duck_type(duck_type: str) -> bool:
    import re

    t = duck_type.upper()
    if any(f in t for f in FORBIDDEN_DUCK_TYPES):
        return True
    # Complex-typed outputs (lists/structs/maps) crash the driver's
    # pandas-based canonicalizer ("unhashable type: 'list'", r05
    # verdict) — the surface must stay scalar-output-only. The regex
    # also catches FIXED-SIZE arrays ('DOUBLE[64]'), which DESCRIBE
    # renders with a digit inside the brackets (r06 diff review).
    return bool(re.search(r"\[\d*\]$", t)) or t.startswith(
        ("STRUCT(", "MAP(", "LIST(")
    )


def forbidden_type_columns(con, oracle_sql: str) -> list[tuple[str, str]]:
    return [
        (c, t)
        for c, t in oracle_output_types(con, oracle_sql)
        if _is_forbidden_duck_type(t)
    ]


def _canon(v):
    """Canonical string form of one cell value.

    Normalizes -0.0/NaN recursively through lists (array<double>
    oracle outputs) and bytes vs bytearray (Spark collects BinaryType
    as bytearray, DuckDB returns bytes). Raw TIMESTAMP outputs rely on
    the container's UTC session+system timezone — Spark localizes
    collected datetimes while DuckDB returns UTC wall-clock, so a
    non-UTC machine would need engine-aware normalization here (the
    repo's oracles are exercised only in UTC containers)."""
    if isinstance(v, float):
        if v == 0.0:
            return "0.0"
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, bool):
        return repr(int(v))
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_canon(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return repr(bytes(v))
    return repr(v)


def canonical_rows(cols: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


@dataclass
class ParityResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""


def compare_query(spark, sf_dir: str, name: str, query_fn, oracle: str) -> ParityResult:
    sdf = query_fn(spark, sf_dir)
    s_cols = sdf.columns

    con = duck_connection(sf_dir)
    try:
        # metadata-only type gate FIRST: rejecting a HUGEINT/DECIMAL
        # oracle must not cost a full Spark execution
        offenders = forbidden_type_columns(con, oracle)
        if offenders:
            return ParityResult(
                name, False, -1, -1,
                "oracle exposes DuckDB types with no Spark twin "
                f"(driver hasher is type-aware): {offenders}",
            )
        res = con.execute(oracle)
        o_cols = [d[0] for d in res.description]
        o_rows = res.fetchall()
    finally:
        con.close()

    s_rows = [tuple(r) for r in sdf.collect()]

    if sorted(s_cols) != sorted(o_cols):
        return ParityResult(
            name, False, len(s_rows), len(o_rows),
            f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}",
        )
    if len(s_rows) != len(o_rows):
        return ParityResult(
            name, False, len(s_rows), len(o_rows), "row count differs"
        )
    cs, co = canonical_rows(s_cols, s_rows), canonical_rows(o_cols, o_rows)
    if cs != co:
        diffs = [
            (a, b) for a, b in zip(cs, co) if a != b
        ][:3]
        return ParityResult(
            name, False, len(s_rows), len(o_rows),
            f"values differ; first diffs (spark vs oracle): {diffs}",
        )
    return ParityResult(name, True, len(s_rows), len(o_rows))
