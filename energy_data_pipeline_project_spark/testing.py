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
    # threads=1: DuckDB 1.0.0's PARALLEL window operator sometimes
    # SPLITS a NULL-keyed partition across threads — on a corpus with
    # two NULL-week histogram rows, `SUM(cnt) OVER (PARTITION BY
    # event_type, week)` flakily reported n=1 per half instead of n=2
    # (r11 fuzz seed 10; reproduced 2 distinct outputs over 20 runs,
    # deterministic at threads=1). Oracle inputs here are sf0.01-sized,
    # so single-threaded execution costs nothing; the driver's own
    # DuckDB runs stay parallel but its clean fixtures carry no NULL
    # window-partition keys (the shape only exists in the adversarial
    # corpora this harness runs).
    con.execute("PRAGMA threads=1")
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


# ---------------------------------------------------------------------------
# Degenerate (adversarial) corpus — the parity-invisible bug hunt
# ---------------------------------------------------------------------------
def write_degenerate_corpus(out_dir: str, base_dir: str = "/root/testdata/sf0.001") -> None:
    """Write an adversarial variant of the driver testdata to ``out_dir``.

    Hash-parity proves Spark == oracle, but it cannot catch the two
    engines AGREEING on a wrong answer (r08's least()-skips-NULL bug:
    a NULL-text doc scored as CAP-length in both engines). This
    fixture attacks that blind spot with the degenerate shapes real
    100 TB ingest produces — NULL/empty/whitespace text, NULL keys,
    duplicate primary keys, zero vectors, NULL embeddings, identical
    and opposite vectors, single-member groups, all-tied groups,
    malformed JSON, NaN/Inf measures, NULL timestamps, lowercase
    status flags — appended to a slice of the real sf0.001 tables so
    every operator still has statistical mass to chew on. Running the
    full query surface over it (tests/test_degenerate_corpus.py)
    turns crashes and cross-engine divergence into findings; schemas
    (incl. events.ts TIMESTAMP[ns]) match the driver fixture exactly
    so the same load paths are exercised.

    Known deliberate limits: embedding magnitudes stay in the normal
    [-1, 1] band — the PQ integer grid (×1e4, squared-distance sums)
    documents unit-norm-ish input, and a 1e14 reading overflows int64
    there by design (the documented contract, not a silent wrong
    answer).
    """
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq_

    os.makedirs(out_dir, exist_ok=True)

    def emit(table: str, base_rows: int, extra: list[dict]) -> None:
        src = pq_.read_table(os.path.join(base_dir, f"{table}.parquet"))
        head = src.slice(0, base_rows)
        if extra:
            add = pa.Table.from_pylist(extra, schema=src.schema)
            head = pa.concat_tables([head, add])
        pq_.write_table(head, os.path.join(out_dir, f"{table}.parquet"))

    emit("region", 5, [
        {"r_regionkey": 90, "r_name": None},
        {"r_regionkey": 91, "r_name": "africa"},  # case-dup of AFRICA
    ])
    emit("nation", 25, [
        {"n_nationkey": 90, "n_name": None, "n_regionkey": 0},
        {"n_nationkey": 91, "n_name": "ZZ-ORPHAN", "n_regionkey": 77},
        {"n_nationkey": 92, "n_name": "DUPNAME", "n_regionkey": 0},
        {"n_nationkey": 93, "n_name": "DUPNAME", "n_regionkey": 1},
    ])
    emit("customer", 60, [
        {"c_custkey": 900001, "c_name": "dup-key-a", "c_nationkey": 0,
         "c_acctbal": 10.0, "c_mktsegment": "BUILDING"},
        {"c_custkey": 900001, "c_name": "dup-key-b", "c_nationkey": 1,
         "c_acctbal": 20.0, "c_mktsegment": "MACHINERY"},
        {"c_custkey": 900002, "c_name": "one-order", "c_nationkey": 2,
         "c_acctbal": None, "c_mktsegment": None},
        {"c_custkey": 900003, "c_name": "no-orders", "c_nationkey": None,
         "c_acctbal": -999.99, "c_mktsegment": "BUILDING"},
    ])
    emit("supplier", 10, [
        {"s_suppkey": 9001, "s_name": None, "s_nationkey": None,
         "s_acctbal": None},
        {"s_suppkey": 9002, "s_name": "lonely", "s_nationkey": 91,
         "s_acctbal": 0.0},
    ])
    emit("part", 80, [
        {"p_partkey": 90001, "p_name": None, "p_brand": None,
         "p_type": None, "p_size": 0, "p_retailprice": 0.0},
        {"p_partkey": 90002, "p_name": "twin part", "p_brand": "Brand#00",
         "p_type": "ECONOMY ANODIZED STEEL", "p_size": 1,
         "p_retailprice": -5.0},
        {"p_partkey": 90003, "p_name": "twin part", "p_brand": "Brand#00",
         "p_type": "ECONOMY ANODIZED STEEL", "p_size": 1,
         "p_retailprice": -5.0},
        # --- fourth-wave shape (r10): NULL retail price — incomparable
        # on the skyline's price axis (the NOT-EXISTS oracle KEPT it
        # via NULL semantics while the banded decomposition dropped it
        # and let its NULL band corrupt the prefix minima)
        {"p_partkey": 930001, "p_name": "null priced part",
         "p_brand": "Brand#9", "p_type": "ECONOMY BRASS", "p_size": 5,
         "p_retailprice": None},
        # --- sixth-wave shape (r11 fuzz seed 43): NEGATIVE p_size —
        # under plain %, -1 % 4 = -1 reaches a sequence/range bound
        # < 1 where Spark's sequence() counts DOWN and DuckDB's
        # range() is empty; derivations over p_size must use
        # non-negative mod (explode_outer_probe)
        {"p_partkey": 930002, "p_name": "negative sized part",
         "p_brand": "Brand#9", "p_type": "ECONOMY BRASS", "p_size": -1,
         "p_retailprice": 10.0},
        {"p_partkey": 930003, "p_name": "negative sized part 2",
         "p_brand": "Brand#9", "p_type": "ECONOMY BRASS", "p_size": -3,
         "p_retailprice": 10.0},
    ])
    import datetime as _dt

    d0 = _dt.datetime(1995, 6, 1)
    emit("orders", 300, [
        {"o_orderkey": 900001, "o_custkey": 900001, "o_orderstatus": "O",
         "o_totalprice": None, "o_orderdate": d0, "o_orderpriority": "1-URGENT"},
        {"o_orderkey": 900002, "o_custkey": 900002, "o_orderstatus": "o",
         "o_totalprice": 100.0, "o_orderdate": None, "o_orderpriority": None},
        {"o_orderkey": 900003, "o_custkey": None, "o_orderstatus": "F",
         "o_totalprice": 50.0, "o_orderdate": d0, "o_orderpriority": "5-LOW"},
        # duplicate orderkey pair (joins multiply; both engines must agree)
        {"o_orderkey": 900004, "o_custkey": 900003, "o_orderstatus": "F",
         "o_totalprice": 75.0, "o_orderdate": d0, "o_orderpriority": "5-LOW"},
        {"o_orderkey": 900004, "o_custkey": 900003, "o_orderstatus": "F",
         "o_totalprice": 75.0, "o_orderdate": d0, "o_orderpriority": "5-LOW"},
        # all-tied group: 3 same-date same-price orders for one customer
        {"o_orderkey": 900005, "o_custkey": 900001, "o_orderstatus": "O",
         "o_totalprice": 42.0, "o_orderdate": d0, "o_orderpriority": "3-MEDIUM"},
        {"o_orderkey": 900006, "o_custkey": 900001, "o_orderstatus": "O",
         "o_totalprice": 42.0, "o_orderdate": d0, "o_orderpriority": "3-MEDIUM"},
        {"o_orderkey": 900007, "o_custkey": 900001, "o_orderstatus": "O",
         "o_totalprice": 42.0, "o_orderdate": d0, "o_orderpriority": "3-MEDIUM"},
        # --- third-wave shapes (r10): calendar-extreme order dates (a
        # corrupt date lands here; EXTRACT/datediff/date_add must hold)
        {"o_orderkey": 920001, "o_custkey": 900001, "o_orderstatus": "O",
         "o_totalprice": 10.0, "o_orderdate": _dt.datetime(9999, 12, 1),
         "o_orderpriority": "1-URGENT"},
        {"o_orderkey": 920002, "o_custkey": 900001, "o_orderstatus": "F",
         "o_totalprice": 10.0, "o_orderdate": _dt.datetime(1, 1, 1),
         "o_orderpriority": "5-LOW"},
        # --- fourth-wave shape (r10): negative order total (credit)
        {"o_orderkey": 930001, "o_custkey": 900001, "o_orderstatus": "F",
         "o_totalprice": -50.0, "o_orderdate": _dt.datetime(1996, 4, 30),
         "o_orderpriority": "2-HIGH"},
        # --- fifth-wave shape (r11 fuzz seed 0): duplicate o_orderkey
        # with DIFFERENT dates — q21's correlated NOT EXISTS tests
        # other suppliers' lateness against THIS order row's date, so
        # a decorrelation that pre-computes "late pairs" against ANY
        # duplicate's date diverges (the wave-1 dup orderkey shares
        # one date, which hid it)
        {"o_orderkey": 940001, "o_custkey": 900001, "o_orderstatus": "F",
         "o_totalprice": 60.0, "o_orderdate": _dt.datetime(1995, 1, 1),
         "o_orderpriority": "5-LOW"},
        {"o_orderkey": 940001, "o_custkey": 900001, "o_orderstatus": "F",
         "o_totalprice": 60.0, "o_orderdate": _dt.datetime(1995, 6, 1),
         "o_orderpriority": "5-LOW"},
        # --- fifth-wave shape (r11 fuzz): a date within 30 days of the
        # calendar CEILING — date arithmetic lands in year 10000, which
        # both engines compute and then crash converting to a Python/
        # Arrow date (the wave-3 9999-12-01 row sat exactly AT the
        # safe bound, hiding it)
        {"o_orderkey": 940002, "o_custkey": 900001, "o_orderstatus": "O",
         "o_totalprice": 20.0, "o_orderdate": _dt.datetime(9999, 12, 15),
         "o_orderpriority": "1-URGENT"},
        # NULL date for a customer who ALSO has real dates: window
        # NULL ordering (Spark FIRST vs DuckDB LAST) otherwise picks
        # different first/last rows and shifts the LTV curve's
        # cumulative window (r11 fuzz hunt seeds 22/27/36/37/39)
        {"o_orderkey": 940003, "o_custkey": 900001, "o_orderstatus": "O",
         "o_totalprice": 33.0, "o_orderdate": None,
         "o_orderpriority": "3-MEDIUM"},
    ])
    emit("lineitem", 600, [
        {"l_orderkey": 900001, "l_partkey": 90001, "l_suppkey": 9001,
         "l_linenumber": 1, "l_quantity": None, "l_extendedprice": None,
         "l_discount": 0.0, "l_tax": None, "l_returnflag": "r",
         "l_linestatus": None, "l_shipdate": d0},
        {"l_orderkey": 900004, "l_partkey": 90002, "l_suppkey": 9002,
         "l_linenumber": 1, "l_quantity": 0.0, "l_extendedprice": 10.0,
         "l_discount": 1.0, "l_tax": 0.0, "l_returnflag": "R",
         "l_linestatus": "F", "l_shipdate": None},
        # duplicate (orderkey, linenumber)
        {"l_orderkey": 900004, "l_partkey": 90003, "l_suppkey": 9002,
         "l_linenumber": 1, "l_quantity": 2.0, "l_extendedprice": -3.0,
         "l_discount": 0.5, "l_tax": 0.1, "l_returnflag": "A",
         "l_linestatus": "O", "l_shipdate": d0},
        # orphan orderkey
        {"l_orderkey": 777777, "l_partkey": 90001, "l_suppkey": 9001,
         "l_linenumber": 1, "l_quantity": 1.0, "l_extendedprice": 1.0,
         "l_discount": 0.0, "l_tax": 0.0, "l_returnflag": "N",
         "l_linestatus": "O", "l_shipdate": d0},
        # --- third-wave shapes (r10): calendar-extreme ship dates
        # joined to the extreme orders above
        {"l_orderkey": 920001, "l_partkey": 90001, "l_suppkey": 9001,
         "l_linenumber": 1, "l_quantity": 1.0, "l_extendedprice": 10.0,
         "l_discount": 0.0, "l_tax": 0.0, "l_returnflag": "N",
         "l_linestatus": "O", "l_shipdate": _dt.datetime(9999, 12, 1)},
        {"l_orderkey": 920002, "l_partkey": 90001, "l_suppkey": 9001,
         "l_linenumber": 1, "l_quantity": 1.0, "l_extendedprice": 10.0,
         "l_discount": 0.0, "l_tax": 0.0, "l_returnflag": "N",
         "l_linestatus": "O", "l_shipdate": _dt.datetime(1, 1, 1)},
        # --- fourth-wave shapes (r10): returns/credit-memo rows —
        # negative quantity, negative discount, discount > 1 with a
        # negative price (all held across the surface)
        {"l_orderkey": 930001, "l_partkey": 90001, "l_suppkey": 9001,
         "l_linenumber": 1, "l_quantity": -5.0, "l_extendedprice": 100.0,
         "l_discount": -0.1, "l_tax": 0.0, "l_returnflag": "R",
         "l_linestatus": "F", "l_shipdate": _dt.datetime(1996, 5, 1)},
        {"l_orderkey": 930001, "l_partkey": 90001, "l_suppkey": 9001,
         "l_linenumber": 2, "l_quantity": 2.0, "l_extendedprice": -100.0,
         "l_discount": 1.5, "l_tax": 0.2, "l_returnflag": "A",
         "l_linestatus": "O", "l_shipdate": _dt.datetime(1996, 5, 2)},
        # --- fifth-wave shapes (r11): two suppliers on the dual-date
        # order above — supplier 9001 is late only against the EARLY
        # date copy, supplier 9002 against both, so q21's per-copy
        # correlation is actually exercised
        {"l_orderkey": 940001, "l_partkey": 90001, "l_suppkey": 9001,
         "l_linenumber": 1, "l_quantity": 1.0, "l_extendedprice": 10.0,
         "l_discount": 0.0, "l_tax": 0.0, "l_returnflag": "N",
         "l_linestatus": "O", "l_shipdate": _dt.datetime(1995, 5, 1)},
        {"l_orderkey": 940001, "l_partkey": 90002, "l_suppkey": 9002,
         "l_linenumber": 2, "l_quantity": 1.0, "l_extendedprice": 10.0,
         "l_discount": 0.0, "l_tax": 0.0, "l_returnflag": "N",
         "l_linestatus": "O", "l_shipdate": _dt.datetime(1995, 9, 15)},
        # FRACTIONAL negative quantity: Spark CAST(double->int)
        # truncates (-9.6 -> -9) while DuckDB CAST ROUNDS (-> -10);
        # the FLOOR spelling both sides is the contract (r11 fuzz)
        {"l_orderkey": 940002, "l_partkey": 90001, "l_suppkey": 9001,
         "l_linenumber": 1, "l_quantity": -9.6, "l_extendedprice": 5.0,
         "l_discount": 0.0, "l_tax": 0.0, "l_returnflag": "R",
         "l_linestatus": "F", "l_shipdate": _dt.datetime(1996, 2, 2)},
        # NULL-revenue-only part (930001 has no other lines): its
        # every priced line is NULL — it must drop from the revenue
        # Pareto identically in the banded and window formulations
        # (r11 fuzz; abc HAVING both sides)
        {"l_orderkey": 940002, "l_partkey": 930001, "l_suppkey": 9002,
         "l_linenumber": 2, "l_quantity": 1.0, "l_extendedprice": None,
         "l_discount": None, "l_tax": 0.0, "l_returnflag": "N",
         "l_linestatus": "O", "l_shipdate": _dt.datetime(1996, 2, 3)},
        # --- sixth-wave shapes (r11 fuzz seed 81): a prior-year month
        # netting to EXACTLY ZERO cents (credit cancels sale) with a
        # revenue month one year later — the YoY ratio divided by zero
        # (Spark ANSI abort vs DuckDB answer; both sides now NULLIF).
        # 1990 predates every base shipdate, so the pair is hermetic.
        {"l_orderkey": 940003, "l_partkey": 90002, "l_suppkey": 9002,
         "l_linenumber": 1, "l_quantity": 1.0, "l_extendedprice": 50.0,
         "l_discount": 0.0, "l_tax": 0.0, "l_returnflag": "N",
         "l_linestatus": "F", "l_shipdate": _dt.datetime(1990, 5, 10)},
        {"l_orderkey": 940003, "l_partkey": 90002, "l_suppkey": 9002,
         "l_linenumber": 2, "l_quantity": 1.0, "l_extendedprice": -50.0,
         "l_discount": 0.0, "l_tax": 0.0, "l_returnflag": "N",
         "l_linestatus": "F", "l_shipdate": _dt.datetime(1990, 5, 20)},
        {"l_orderkey": 940004, "l_partkey": 90002, "l_suppkey": 9002,
         "l_linenumber": 1, "l_quantity": 2.0, "l_extendedprice": 10.0,
         "l_discount": 0.0, "l_tax": 0.0, "l_returnflag": "N",
         "l_linestatus": "F", "l_shipdate": _dt.datetime(1991, 5, 15)},
        # --- sixth-wave shape (r11 fuzz seed 129): a returnflag seen
        # on exactly ONE row — zero variance in every moment, where
        # skew/kurt/corr divided by pow(0, 1.5) (ANSI abort vs DuckDB
        # answer; gated NULL via the exact MIN<>MAX witness now)
        {"l_orderkey": 940005, "l_partkey": 90002, "l_suppkey": 9002,
         "l_linenumber": 1, "l_quantity": 7.0, "l_extendedprice": 70.0,
         "l_discount": 0.0, "l_tax": 0.0, "l_returnflag": "Q",
         "l_linestatus": "F", "l_shipdate": _dt.datetime(1996, 3, 3)},
    ])
    t0 = _dt.datetime(2024, 3, 1, 12, 0, 0)
    emit("events", 200, [
        {"event_id": 900001, "ts": t0, "user_id": None, "event_type": "view",
         "value": 1.0, "props": '{"k": 1}'},
        {"event_id": 900002, "ts": t0, "user_id": 900001, "event_type": None,
         "value": None, "props": None},
        {"event_id": 900003, "ts": t0, "user_id": 900001, "event_type": "view",
         "value": float("nan"), "props": "{k:1"},
        {"event_id": 900004, "ts": t0, "user_id": 900001, "event_type": "view",
         "value": float("inf"), "props": "null"},
        {"event_id": 900005, "ts": None, "user_id": 900002, "event_type": "purchase",
         "value": 5.0, "props": "{}"},
        # same-instant pair for one user (tie on ts)
        {"event_id": 900006, "ts": t0, "user_id": 900003, "event_type": "view",
         "value": 2.0, "props": '{"k": {"a": 1}}'},
        {"event_id": 900007, "ts": t0, "user_id": 900003, "event_type": "view",
         "value": 2.0, "props": '{"k": [1, 2]}'},
        # single-event user
        {"event_id": 900008, "ts": t0, "user_id": 900004, "event_type": "error",
         "value": -1.0, "props": '{"k": 0}'},
        # huge FINITE values: ±1e18 overflows the cents int64 domain
        # (guarded NULL), 1e15 is in-domain but floors past int32 in
        # bucket expressions (r09 diff review)
        {"event_id": 900009, "ts": t0, "user_id": 900005, "event_type": "view",
         "value": 1e18, "props": '{"k": 2}'},
        {"event_id": 900010, "ts": t0, "user_id": 900005, "event_type": "view",
         "value": -1e18, "props": '{"k": 3}'},
        {"event_id": 900011, "ts": t0, "user_id": 900005, "event_type": "view",
         "value": 1e15, "props": '{"k": 4}'},
        # --- sixth-wave shape (r11 review): digits + trailing NEWLINE
        # in a JSON string value — Java regex lets '$' match before a
        # final newline (and Spark's int cast TRIMS whitespace) while
        # RE2 pins '$' to end-of-text, so '^...$' guards diverged;
        # the jsontext contract anchors with \A/\z
        {"event_id": 900012, "ts": t0, "user_id": 900005, "event_type": "view",
         "value": 1.0, "props": '{"k": "123\\n"}'},
        {"event_id": 900013, "ts": t0, "user_id": 900005, "event_type": "view",
         "value": 1.0, "props": '{"k": "9\\n9"}'},
        # --- sixth-wave shapes (r11 fuzz seeds 87/109/131): malformed
        # JSON on CLICK/PURCHASE rows — the attribution channel oracle
        # extracted props without a json_valid guard, and DuckDB's
        # json_extract_string THROWS where Spark's get_json_object
        # returns NULL (view-row malformed props never reached it)
        {"event_id": 900014, "ts": t0, "user_id": 900005,
         "event_type": "click", "value": 1.0, "props": "{k:1"},
        {"event_id": 900015, "ts": t0, "user_id": 900005,
         "event_type": "click", "value": 1.0, "props": ""},
        {"event_id": 900016, "ts": t0, "user_id": 900005,
         "event_type": "purchase", "value": 9.5, "props": "not json"},
        # --- sixth-wave shapes (r11 fuzz seeds 86-138 + 99): C0
        # controls in event_type (unrepresentable in XML 1.0 — both
        # sides strip the class) and a WHITESPACE-ONLY type (the
        # parser's default ignoreSurroundingSpaces trimmed it to '')
        {"event_id": 900017, "ts": t0, "user_id": 900006,
         "event_type": "bad\x1f\x0ctype", "value": 2.0, "props": None},
        {"event_id": 900018, "ts": t0, "user_id": 900006,
         "event_type": "\t\n", "value": 3.0, "props": None},
        # --- sixth-wave shape (r11 dense fuzz seeds 219/226): one day
        # holding TWO max-domain readings — day_cents = 6e9, whose
        # int64 SQUARE (3.6e19) overflowed the seasonal-decompose
        # moment where DuckDB promoted and answered (DECIMAL now)
        {"event_id": 900019, "ts": t0, "user_id": 900007,
         "event_type": "edgeday", "value": 3.0e7, "props": None},
        {"event_id": 900020, "ts": t0, "user_id": 900007,
         "event_type": "edgeday", "value": 3.0e7, "props": None},
        # --- second-wave shapes (r10): TIMESTAMP(NANOS) boundary
        # instants (a corrupt ns timestamp lands exactly here before it
        # wraps; both sit just inside the pandas ns range so the Arrow
        # paths are exercised, not short-circuited), JSON numbers past
        # int64/double, unicode event types and escapes, a negative
        # user id, and a PAIR of ±domain-edge readings whose squares
        # each fit int64 but whose SUM does not — this pair found the
        # events_linear_trend BIGINT-vs-HUGEINT moment-sum split.
        {"event_id": 910001, "ts": _dt.datetime(2262, 4, 11, 23, 47, 16),
         "user_id": 910001, "event_type": "view", "value": 1.0,
         "props": '{"k": 99999999999999999999}'},
        {"event_id": 910002, "ts": _dt.datetime(1677, 9, 21, 0, 12, 44),
         "user_id": 910001, "event_type": "view", "value": 2.0,
         "props": '{"k": 1e309}'},
        {"event_id": 910003, "ts": _dt.datetime(2024, 3, 2, 0, 0, 0),
         "user_id": 910002, "event_type": "purchäse", "value": 3.0,
         "props": '{"k": "\\u00e9"}'},
        {"event_id": 910004, "ts": _dt.datetime(2024, 3, 2, 0, 0, 1),
         "user_id": 910002, "event_type": "view", "value": 4.0,
         "props": '{"k": {"deep": {"deeper": [1, 2, {"x": 3}]}}}'},
        {"event_id": 910005, "ts": _dt.datetime(2024, 3, 2, 0, 0, 2),
         "user_id": -7, "event_type": "view", "value": -3.0e7,
         "props": '{"k": -1}'},
        {"event_id": 910006, "ts": _dt.datetime(2024, 3, 2, 0, 0, 3),
         "user_id": -7, "event_type": "view", "value": 3.0e7,
         "props": '{"k": -9223372036854775808}'},
        # --- third-wave shapes (r10): EMPTY-string event type (a
        # distinct group from NULL), boolean/padded-string/array JSON
        # values (a boolean-typed k caught Spark's typed variant cast
        # coercing true -> 1 where the oracle's string extraction
        # yields NULL)
        {"event_id": 920001, "ts": _dt.datetime(2024, 3, 3, 0, 0, 0),
         "user_id": 920001, "event_type": "", "value": 1.0,
         "props": '{"k": "00012"}'},
        {"event_id": 920002, "ts": _dt.datetime(2024, 3, 3, 0, 0, 1),
         "user_id": 920001, "event_type": "view", "value": 2.0,
         "props": '{"k": true}'},
        {"event_id": 920003, "ts": _dt.datetime(2024, 3, 3, 0, 0, 2),
         "user_id": 920001, "event_type": "view", "value": 3.0,
         "props": '[]'},
        # --- fourth-wave shapes (r10): a REPLAYED purchase (duplicate
        # event_id, different value) pairs the same click twice under
        # one purchase_id — (ts, event_id) alone stopped being a total
        # attribution order and which value-row took pos=1 was
        # engine-dependent
        {"event_id": 930001, "ts": _dt.datetime(2024, 3, 4, 12, 0, 0),
         "user_id": 930001, "event_type": "purchase", "value": 10.0,
         "props": '{"k": 1}'},
        {"event_id": 930001, "ts": _dt.datetime(2024, 3, 4, 12, 0, 5),
         "user_id": 930001, "event_type": "purchase", "value": 20.0,
         "props": '{"k": 2}'},
        {"event_id": 930002, "ts": _dt.datetime(2024, 3, 4, 11, 55, 0),
         "user_id": 930001, "event_type": "click", "value": 0.0,
         "props": '{"k": 3}'},
        # --- fifth-wave shapes (r11 fuzz seed 0): ONE user holding
        # both NULL and real timestamps — window NULL ordering defaults
        # differ (Spark FIRST, DuckDB LAST), so the lag-IS-NULL session
        # boundary lands on a different row unless the oracle pins
        # NULLS FIRST (the wave-1 NULL-ts row was its user's only
        # event, which hid it)
        {"event_id": 940001, "ts": None, "user_id": 940001,
         "event_type": "view", "value": 1.0, "props": '{"k": 1}'},
        {"event_id": 940002, "ts": _dt.datetime(2024, 3, 5, 10, 0, 0),
         "user_id": 940001, "event_type": "view", "value": 2.0,
         "props": '{"k": 2}'},
        {"event_id": 940003, "ts": _dt.datetime(2024, 3, 5, 11, 0, 0),
         "user_id": 940001, "event_type": "purchase", "value": 3.0,
         "props": '{"k": 3}'},
        # TWO NULL-ts rows of ONE event type: DuckDB 1.0.0's date_trunc
        # null-stats bug SPLITS the NULL-week window partition — the
        # split is invisible while every (type, NULL-week) group has
        # one row (r11 fuzz seed 16; oracle carries the CASE launder)
        {"event_id": 940004, "ts": None, "user_id": 940002,
         "event_type": "view", "value": 12.0, "props": '{"k": 4}'},
        # fractional and exponent JSON numbers: DuckDB TRY_CAST rounds
        # '0.5'->1 / accepts '1e2' where Spark try_cast NULLs both —
        # pinned by the functions/jsontext digit-string contract
        {"event_id": 940005, "ts": _dt.datetime(2024, 3, 5, 12, 0, 0),
         "user_id": 940002, "event_type": "view", "value": 1.0,
         "props": '{"k": 0.5}'},
        {"event_id": 940006, "ts": _dt.datetime(2024, 3, 5, 12, 0, 1),
         "user_id": 940002, "event_type": "view", "value": 2.0,
         "props": '{"k": 1e2}'},
        {"event_id": 940007, "ts": _dt.datetime(2024, 3, 5, 12, 0, 2),
         "user_id": 940002, "event_type": "view", "value": 3.0,
         "props": '{"k": 1.0}'},
        # an ISOLATED anonymous (NULL-user) event: its 28-day DAU/MAU
        # windows hold no identifiable user, so COUNT(*) counted it
        # while COUNT(DISTINCT) skipped it — DAU>0 / MAU=0 aborted
        # Spark's ANSI division (r11 fuzz hunt seed 37; NULL users now
        # excluded from the engagement frame on both sides)
        {"event_id": 940008, "ts": _dt.datetime(2024, 6, 1, 12, 0, 0),
         "user_id": None, "event_type": "view", "value": 1.0,
         "props": '{"k": 5}'},
    ])
    long_doc = " ".join(["longword%d" % (i % 7) for i in range(5000)])
    spam_doc = " ".join(["spam"] * 200)
    emit("documents", 120, [
        {"doc_id": 900001, "text": None, "lang": "en", "source": "srcX",
         "n_chars": None},
        {"doc_id": 900002, "text": "", "lang": None, "source": None,
         "n_chars": 0},
        {"doc_id": 900003, "text": "   ", "lang": "en", "source": "srcX",
         "n_chars": 3},
        {"doc_id": 900004, "text": "hello", "lang": "en", "source": "srcX",
         "n_chars": 5},
        # exact-dup pair
        {"doc_id": 900005, "text": "exact duplicate text body here",
         "lang": "en", "source": "srcX", "n_chars": 30},
        {"doc_id": 900006, "text": "exact duplicate text body here",
         "lang": "en", "source": "srcY", "n_chars": 30},
        # duplicate doc_id, same text (the r07 prefix-Jaccard trap)
        {"doc_id": 900007, "text": "dup id same words in both rows",
         "lang": "en", "source": "srcX", "n_chars": 30},
        {"doc_id": 900007, "text": "dup id same words in both rows",
         "lang": "en", "source": "srcX", "n_chars": 30},
        {"doc_id": 900008, "text": "!!! ??? ... ---", "lang": None,
         "source": "srcX", "n_chars": 15},
        {"doc_id": 900009, "text": "héllo wörld 你好 мир", "lang": "zh",
         "source": "srcY", "n_chars": 18},
        {"doc_id": 900010, "text": long_doc, "lang": "en", "source": "srcY",
         "n_chars": len(long_doc)},
        {"doc_id": 900011, "text": spam_doc, "lang": "en", "source": "srcY",
         "n_chars": len(spam_doc)},
        {"doc_id": None, "text": "null id document body", "lang": "en",
         "source": "srcX", "n_chars": 21},
        # --- sixth-wave shape (r11 fuzz seed 69): a NULL-id doc whose
        # text DUPLICATES a real doc's — its shingles land in the same
        # buckets/bands, and the positional bucket-pair expansions
        # emitted a (NULL, x) pair the a < b oracles reject; NULL ids
        # are now excluded from the pair-identity index on both sides
        # (_shingle_hashes and the oracle CTE heads)
        {"doc_id": None, "text": "exact duplicate text body here",
         "lang": "en", "source": "srcX", "n_chars": 30},
        # --- sixth-wave shape (r11 fuzz seed 125): DUPLICATE doc_id
        # whose two rows share the 24-char sort prefix — both rows
        # hold sorted-neighborhood positions, so (a, b) was emitted
        # per adjacency and (a, a) as a self-pair; the multiplicity-
        # counted intersection drove the Jaccard denominator to ZERO
        # (pair frames are DISTINCT a <> b sets now, both engines)
        {"doc_id": 950001, "text": "same id twin text body alpha one",
         "lang": "en", "source": "srcX", "n_chars": 32},
        {"doc_id": 950001, "text": "same id twin text body alpha two",
         "lang": "en", "source": "srcX", "n_chars": 32},
        # --- second-wave shapes (r10): unicode beyond the BMP,
        # combining characters, zero-width/RTL text, control
        # whitespace, fingerprint-separator characters, and LYING
        # n_chars metadata — all plausible 100 TB web-ingest rows.
        {"doc_id": 910001,
         "text": "\U0001F680 rocket \U0001D518\U0001D52B math \U0001F600",
         "lang": "en", "source": "srcU", "n_chars": 20},
        {"doc_id": 910002, "text": "éclair mélange",
         "lang": "fr", "source": "srcU", "n_chars": 16},
        {"doc_id": 910003, "text": "tab\tseparated\nnewline mixed",
         "lang": "en", "source": "srcU", "n_chars": 27},
        {"doc_id": 910004, "text": "​zero​width words",
         "lang": "en", "source": "srcU", "n_chars": 18},
        {"doc_id": 910005, "text": "مرحبا rtl text here",
         "lang": "ar", "source": "srcU", "n_chars": 19},
        {"doc_id": 910006, "text": "comma,colon:pipe|chars , : |",
         "lang": "en", "source": "srcU", "n_chars": 28},
        {"doc_id": 910007, "text": "short", "lang": "en", "source": "srcU",
         "n_chars": 999999},
        {"doc_id": 910008, "text": "short", "lang": "en", "source": "srcU",
         "n_chars": -5},
        # near-dup pair differing only by a combining accent
        {"doc_id": 910009,
         "text": "café terrace at night painting body words",
         "lang": "fr", "source": "srcU", "n_chars": 42},
        {"doc_id": 910010,
         "text": "café terrace at night painting body words",
         "lang": "fr", "source": "srcU", "n_chars": 43},
        # duplicate doc_id with DIFFERENT text (the same-text dup pair
        # above hid it): position alone stops being a total reassembly
        # key, which caught DuckDB's unspecified string_agg tie order
        # vs Spark's total struct sort (r10 third wave)
        {"doc_id": 920001, "text": "first body of the conflicted id",
         "lang": "en", "source": "srcV", "n_chars": 31},
        {"doc_id": 920001,
         "text": "second completely different body here",
         "lang": "de", "source": "srcW", "n_chars": 37},
        # --- fourth-wave shapes (r10): tabs-only text (ONE token under
        # the literal-space tokenizer, not zero) and a 200kB single
        # token with and without neighbors (hash/shingle/prefix paths
        # must not quadratically expand or crash on it)
        {"doc_id": 930001, "text": "\t\t", "lang": "en", "source": "srcT",
         "n_chars": 2},
        {"doc_id": 930002, "text": "x" * 200000, "lang": "en",
         "source": "srcT", "n_chars": 200000},
        {"doc_id": 930003, "text": "word " + "x" * 200000 + " word",
         "lang": "en", "source": "srcT", "n_chars": 200010},
    ])
    one = [0.0] * 64
    one[0] = 1.0
    neg = [0.0] * 64
    neg[0] = -1.0
    emit("embeddings", 120, [
        {"vec_id": 900001, "embedding": [0.0] * 64, "label": 0},
        {"vec_id": 900002, "embedding": None, "label": 1},
        # identical pair (cosine exactly 1.0 — rank tie)
        {"vec_id": 900003, "embedding": one, "label": 2},
        {"vec_id": 900004, "embedding": one, "label": 2},
        # exact opposite (cosine exactly -1.0)
        {"vec_id": 900005, "embedding": neg, "label": 2},
        # empty array (violates dim=64; both engines must agree on the drop)
        {"vec_id": 900006, "embedding": [], "label": 3},
        # single-member label
        {"vec_id": 900007, "embedding": [0.1] * 64, "label": 99},
        # duplicate vec_id
        {"vec_id": 900008, "embedding": [0.2] * 64, "label": 4},
        {"vec_id": 900008, "embedding": [0.3] * 64, "label": 4},
        {"vec_id": 900009, "embedding": [1e-30] * 64, "label": 5},
        {"vec_id": 900010, "embedding": None, "label": None},
        # dim-64 vector with one NULL ELEMENT: passes a length check
        # but poisons folds (Spark NULL-propagates, DuckDB list
        # kernels reject outright — r09 diff review)
        {"vec_id": 900011, "embedding": [0.1] * 32 + [None] + [0.1] * 31,
         "label": 6},
        # --- second-wave shapes (r10): NON-FINITE elements pass every
        # NULL/length check but abort the 1e4 integer-grid cast in
        # both engines, and Spark's FLOOR(±Inf) silently becomes a
        # Long extreme that overflows centroid sums — found 13 vector
        # queries crashing or diverging (now gated by VALID_VEC /
        # BAD_ELEM_LAMBDA everywhere embeddings fold).
        {"vec_id": 910001,
         "embedding": [0.1] * 32 + [float("nan")] + [0.1] * 31,
         "label": 7},
        {"vec_id": 910002,
         "embedding": [0.1] * 32 + [float("inf")] + [0.1] * 31,
         "label": 7},
        {"vec_id": 910003, "embedding": [float("-inf")] * 64, "label": 7},
        # --- fifth-wave shapes (r11 fuzz): RAGGED non-empty vectors.
        # A 65-dim candidate diverged the RRF semantic arm — Spark's
        # zip_with pads the 64-dim query side with NULL (cosine NULL)
        # while DuckDB's generate_series(1, len(q)) fold reads its
        # first 64 elements and ANSWERS; 63-dim agrees by luck (both
        # NULL). VALID_VEC's size=64 clause is the gate — these rows
        # pin that every vector consumer applies it.
        {"vec_id": 940001, "embedding": [0.1] * 63, "label": 8},
        {"vec_id": 940002, "embedding": [0.1] * 65, "label": 8},
        {"vec_id": 940003, "embedding": [0.2], "label": 8},
        # duplicate vec_id whose two vectors point at DIFFERENT
        # directions: per-row IVF cell assignment must index each row
        # under its own nearest cell — a per-vec_id window merged the
        # pair and gave both the joint best cell (r11 fuzz hunt seed
        # 25; the wave-1 dup pair 900008 shares a direction, hiding it)
        {"vec_id": 940004, "embedding": one, "label": 2},
        {"vec_id": 940004, "embedding": [0.0] * 32 + [1.0] + [0.0] * 31,
         "label": 5},
        # --- r11 fuzz seed 162: a label whose MODAL dim is 1 —
        # np.cov(rowvar=False) of an (n, 1) matrix is a 0-D scalar and
        # eigvalsh raised LinAlgError in the spectrum kernel; and a
        # label of all-EMPTY vectors (modal dim 0 — valid, finite,
        # uniform length) which has no spectrum at all. Both now take
        # explicit branches (dim-1: atleast_2d, ev == var == tr).
        {"vec_id": 950001, "embedding": [0.5], "label": 9},
        {"vec_id": 950002, "embedding": [0.7], "label": 9},
        {"vec_id": 950003, "embedding": [], "label": 10},
        {"vec_id": 950004, "embedding": [], "label": 10},
    ])


# ---------------------------------------------------------------------------
# Seeded random-corpus fuzz (r10 verdict #4): shapes nobody thought of
# ---------------------------------------------------------------------------
# Four hand-crafted degenerate waves hit diminishing returns; this
# generator samples corpora from the same DOCUMENTED domain envelopes
# (embedding band [-1,1] with NULL/NaN/Inf elements, the cents value
# domain plus its guarded overflow edges, years 1..9999, arbitrary
# unicode planes minus surrogates, ragged arrays, duplicate/NULL keys,
# arbitrary JSON) under one integer seed. Any failing seed's rows get
# promoted into write_degenerate_corpus as a permanent wave.

_FUZZ_CODE_RANGES = (
    (0x20, 0x7E),  # ASCII
    (0xA0, 0x2AF),  # Latin-1 + extensions (accents, IPA)
    (0x300, 0x36F),  # combining diacritics
    (0x590, 0x6FF),  # Hebrew + Arabic (RTL)
    (0x4E00, 0x9FFF),  # CJK
    (0x2000, 0x206F),  # unicode punctuation/zero-width/bidi controls
    (0x1F300, 0x1F6FF),  # astral-plane emoji
    (0x1D400, 0x1D7FF),  # astral-plane mathematical alphanumerics
    (0x01, 0x1F),  # C0 controls (tab/newline/carriage among them)
)

# Engine Unicode-version gap (r11 fuzz seeds 100/108, measured by
# exhaustive probe over every code point in the ranges above): the two
# engines' case-mapping tables disagree on exactly these six — the
# multi-char expansions (ß→SS, ŉ→ʼN, ǰ→J̌, İ→i̇) where one engine
# expands and the other 1:1-maps, and the case pairs Unicode 15/16
# added (ɤ→Ɤ U+A7CB, ƛ→Ƛ U+A7DC) that Spark's newer tables know and
# DuckDB's don't. No query spelling can reconcile differing engine
# case tables, so the fuzz envelope excludes them — the same
# harness-level pin as DuckDB's threads=1 (engine gap, not a defect
# in either plan). Real data containing them simply case-maps per the
# serving engine's Unicode version.
_CASEMAP_DIVERGENT = frozenset("ßİŉƛǰɤ")


def _fuzz_text(rnd, max_words: int = 40) -> str:
    words = []
    for _ in range(rnd.randrange(max_words + 1)):
        lo, hi = _FUZZ_CODE_RANGES[
            rnd.randrange(len(_FUZZ_CODE_RANGES))
        ]
        n = rnd.randrange(1, 12)
        words.append(
            "".join(
                c
                for c in (
                    chr(rnd.randrange(lo, hi + 1)) for _ in range(n)
                )
                if c not in _CASEMAP_DIVERGENT
            )
        )
    return " ".join(words)


def _fuzz_json(rnd, depth: int = 0) -> str:
    import json as _json

    def val(d):
        r = rnd.random()
        if r < 0.25:
            # numeric extremes under and past int64/double
            return rnd.choice(
                [0, 1, -1, 2**63 - 1, -(2**63), 10**20, 1e308, -1e308,
                 -0.0, 0.5, rnd.randrange(-100, 100)]
            )
        if r < 0.45:
            return _fuzz_text(rnd, 3)
        if r < 0.55:
            return rnd.choice([True, False, None])
        if r < 0.7 and d < 2:
            return [val(d + 1) for _ in range(rnd.randrange(3))]
        if r < 0.85 and d < 2:
            return {f"f{i}": val(d + 1) for i in range(rnd.randrange(3))}
        return rnd.randrange(-5, 5)

    r = rnd.random()
    if r < 0.1:
        return rnd.choice(["{k:1", "", "null", "[]", "{}", "not json"])
    # the surface's extraction key is $.k — usually present, not always
    body = {"k": val(0)} if rnd.random() < 0.8 else {"other": val(0)}
    return _json.dumps(body, ensure_ascii=rnd.random() < 0.5)


def write_fuzz_corpus(
    out_dir: str,
    seed: int,
    base_dir: str = "/root/testdata/sf0.001",
    n_extra: int = 30,
) -> None:
    """Append ``n_extra`` seeded-random adversarial rows per table to a
    slice of the driver fixture (same schema, same load paths). Fully
    deterministic per ``seed``."""
    import datetime as _dt
    import os
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq_

    rnd = random.Random(seed)
    os.makedirs(out_dir, exist_ok=True)

    def emit(table: str, base_rows: int, extra: list[dict]) -> None:
        src = pq_.read_table(os.path.join(base_dir, f"{table}.parquet"))
        head = src.slice(0, base_rows)
        if extra:
            add = pa.Table.from_pylist(extra, schema=src.schema)
            head = pa.concat_tables([head, add])
        pq_.write_table(head, os.path.join(out_dir, f"{table}.parquet"))

    def maybe(v, p_null=0.15):
        return None if rnd.random() < p_null else v

    def fuzz_date(safe=False):
        if safe or rnd.random() < 0.8:
            y = rnd.randrange(1992, 1999)
        else:
            y = rnd.choice([1, 100, 1677, 2262, 9999])
        return _dt.datetime(y, rnd.randrange(1, 13), rnd.randrange(1, 29))

    def fuzz_ts():
        # pandas-ns-safe instants (the NANOS column round-trips Arrow)
        base = _dt.datetime(2024, 3, 1)
        if rnd.random() < 0.1:
            return rnd.choice(
                [_dt.datetime(1677, 9, 21, 0, 12, 44),
                 _dt.datetime(2262, 4, 11, 23, 47, 16)]
            )
        return base + _dt.timedelta(
            seconds=rnd.randrange(0, 30 * 86400),
            microseconds=rnd.randrange(0, 1_000_000),
        )

    def fuzz_money():
        r = rnd.random()
        if r < 0.1:
            return None
        if r < 0.2:
            return rnd.choice([0.0, -0.0, -5.0, 1e6, -1e6])
        return round(rnd.uniform(-1000, 10000), 2)

    def fuzz_value():
        r = rnd.random()
        if r < 0.1:
            return None
        if r < 0.2:
            # non-finite and guarded-overflow extremes (documented)
            return rnd.choice(
                [float("nan"), float("inf"), float("-inf"),
                 1e18, -1e18, 3.0e7, -3.0e7, 1e15]
            )
        return round(rnd.uniform(-100, 100), 4)

    def fuzz_key(pool_hi: int):
        r = rnd.random()
        if r < 0.1:
            return None
        if r < 0.2:
            return rnd.choice([-1, 0, 777_777_777])
        return rnd.randrange(pool_hi)

    emit("region", 5, [])
    emit("nation", 25, [])
    emit("customer", 60, [
        {"c_custkey": 800_000 + rnd.randrange(8),
         "c_name": maybe(_fuzz_text(rnd, 4)),
         "c_nationkey": maybe(rnd.randrange(30)),
         "c_acctbal": fuzz_money(),
         "c_mktsegment": maybe(rnd.choice(
             ["BUILDING", "MACHINERY", "building", ""]))}
        for _ in range(n_extra // 3)
    ])
    emit("supplier", 10, [
        {"s_suppkey": 8000 + rnd.randrange(6),
         "s_name": maybe(_fuzz_text(rnd, 3)),
         "s_nationkey": maybe(rnd.randrange(30)),
         "s_acctbal": fuzz_money()}
        for _ in range(n_extra // 3)
    ])
    emit("part", 80, [
        {"p_partkey": 80_000 + rnd.randrange(10),
         "p_name": maybe(_fuzz_text(rnd, 4)),
         "p_brand": maybe(f"Brand#{rnd.randrange(10)}"),
         "p_type": maybe(rnd.choice(
             ["ECONOMY ANODIZED STEEL", "PROMO BRASS", "", "promo brass"])),
         "p_size": maybe(rnd.randrange(-1, 51)),
         "p_retailprice": fuzz_money()}
        for _ in range(n_extra // 3)
    ])
    order_keys = [800_000 + rnd.randrange(20) for _ in range(n_extra)]
    emit("orders", 300, [
        {"o_orderkey": k,
         "o_custkey": fuzz_key(800_008),
         "o_orderstatus": maybe(rnd.choice(["O", "F", "P", "o", ""])),
         "o_totalprice": fuzz_money(),
         "o_orderdate": maybe(fuzz_date()),
         "o_orderpriority": maybe(rnd.choice(
             ["1-URGENT", "5-LOW", "3-MEDIUM", ""]))}
        for k in order_keys
    ])
    emit("lineitem", 600, [
        {"l_orderkey": rnd.choice(order_keys + [777_777]),
         "l_partkey": maybe(80_000 + rnd.randrange(10)),
         "l_suppkey": maybe(8000 + rnd.randrange(6)),
         "l_linenumber": rnd.randrange(1, 4),
         "l_quantity": maybe(round(rnd.uniform(-10, 60), 1)),
         "l_extendedprice": fuzz_money(),
         "l_discount": maybe(round(rnd.uniform(-0.2, 1.5), 2)),
         "l_tax": maybe(round(rnd.uniform(0, 0.3), 2)),
         "l_returnflag": maybe(rnd.choice(["R", "A", "N", "r", ""])),
         "l_linestatus": maybe(rnd.choice(["O", "F", "o", ""])),
         "l_shipdate": maybe(fuzz_date())}
        for _ in range(n_extra)
    ])
    user_pool = [None, -7, 0] + [800_000 + i for i in range(6)]
    emit("events", 200, [
        {"event_id": 800_000 + rnd.randrange(max(n_extra - 5, 1)),
         "ts": maybe(fuzz_ts(), 0.08),
         "user_id": rnd.choice(user_pool),
         "event_type": maybe(rnd.choice(
             ["view", "click", "purchase", "error", "", "purchäse",
              _fuzz_text(rnd, 1)])),
         "value": fuzz_value(),
         "props": maybe(_fuzz_json(rnd), 0.1)}
        for _ in range(n_extra)
    ])
    texts = [maybe(_fuzz_text(rnd), 0.08) for _ in range(n_extra)]
    # plant near-dup pairs: a later row reuses an earlier text verbatim
    for i in range(2, n_extra, 7):
        if texts[i - 1]:
            texts[i] = texts[i - 1]
    emit("documents", 120, [
        {"doc_id": maybe(800_000 + rnd.randrange(max(n_extra - 4, 1)), 0.05),
         "text": t,
         "lang": maybe(rnd.choice(["en", "fr", "zh", "ar", "", "EN"])),
         "source": maybe(rnd.choice(["srcA", "srcB", ""])),
         "n_chars": maybe(rnd.choice(
             [len(t) if t else 0, -5, 0, 999_999, rnd.randrange(300)]))}
        for t in texts
    ])

    def fuzz_vec():
        r = rnd.random()
        if r < 0.08:
            return None
        dim = 64 if rnd.random() < 0.8 else rnd.choice([0, 1, 63, 65])
        v = [rnd.uniform(-1, 1) for _ in range(dim)]
        for _ in range(rnd.randrange(3)):
            if v:
                v[rnd.randrange(len(v))] = rnd.choice(
                    [None, float("nan"), float("inf"), float("-inf"),
                     0.0, 1e-30]
                )
        return v

    emit("embeddings", 120, [
        {"vec_id": 800_000 + rnd.randrange(max(n_extra - 4, 1)),
         "embedding": fuzz_vec(),
         "label": maybe(rnd.randrange(-1, 8))}
        for _ in range(n_extra)
    ])


# ---------------------------------------------------------------------------
# Scale-stress corpus: a xN blow-up of a fixture directory, generated
# DISTRIBUTED (crossJoin with spark.range(N), no driver-side rows), for
# measuring how query wall time scales with data volume. Correctness is
# verified at small sf by the oracle gates; this corpus exists to catch
# super-linear cliffs (quadratic candidate blow-ups, single-task sorts,
# broadcast thresholds crossed) before a real cluster does.
# ---------------------------------------------------------------------------

# Key stride between copies: far above any base-fixture key, far below
# int64 overflow at any plausible factor (32 copies -> max ~3.2e10).
SCALE_KEY_STRIDE = 1_000_000_000


def write_scaled_corpus(
    spark,
    out_dir: str,
    factor: int,
    base_dir: str = "/root/testdata/sf0.1",
    fact_partitions: int = 32,
) -> None:
    """Materialize a ``factor``x copy of ``base_dir`` under ``out_dir``.

    Fact tables are replicated ``factor`` times with per-copy key
    remapping (copy *i* shifts every entity key by ``i *
    SCALE_KEY_STRIDE``) so join fan-in per key, group cardinality per
    date, and null patterns all match the base corpus — volume scales,
    distribution shape doesn't. Dimensions (region, nation) stay
    fixed, as they would at any real scale factor.

    Deliberate exceptions, documented because they ARE the stress:

    - ``documents.text`` gains a per-copy marker token (copy 0 stays
      byte-identical), so cross-copy pairs are NEAR-duplicates: every
      dedup family sees its candidate clusters grow ~``factor``x —
      the adversarial-skew case for LSH bucket sizes and
      sorted-neighborhood slices.
    - ``embeddings.embedding`` is deterministically perturbed per
      (copy, dim), so ANN/kmeans see ``factor``x distinct vectors
      rather than ``factor`` exact stacks (exact stacks would make
      centroid training degenerate, which is not the interesting
      failure).
    - Timestamps are NOT shifted: copies land in the same time window,
      so date-grain groups keep their cardinality and grow in SIZE —
      the realistic shape for "same period, bigger fleet".
    """
    import os

    from pyspark.sql import functions as F

    from .sources.tables import TABLES, load_table

    os.makedirs(out_dir, exist_ok=True)
    s = SCALE_KEY_STRIDE

    def shift(col: str, cp="__cp__"):
        return (F.col(col) + F.col(cp) * F.lit(s)).alias(col)

    for name in TABLES:
        df = load_table(spark, base_dir, name)
        if name in ("region", "nation"):
            out = df
        else:
            cp = spark.range(factor).select(F.col("id").alias("__cp__"))
            x = df.crossJoin(cp)
            if name == "customer":
                out = x.select(shift("c_custkey"), "c_name", "c_nationkey",
                               "c_acctbal", "c_mktsegment")
            elif name == "supplier":
                out = x.select(shift("s_suppkey"), "s_name", "s_nationkey",
                               "s_acctbal")
            elif name == "part":
                out = x.select(shift("p_partkey"), "p_name", "p_brand",
                               "p_type", "p_size", "p_retailprice")
            elif name == "orders":
                out = x.select(shift("o_orderkey"), shift("o_custkey"),
                               "o_orderstatus", "o_totalprice",
                               "o_orderdate", "o_orderpriority")
            elif name == "lineitem":
                out = x.select(shift("l_orderkey"), shift("l_partkey"),
                               shift("l_suppkey"), "l_linenumber",
                               "l_quantity", "l_extendedprice", "l_discount",
                               "l_tax", "l_returnflag", "l_linestatus",
                               "l_shipdate")
            elif name == "events":
                out = x.select(shift("event_id"), "ts", shift("user_id"),
                               "event_type", "value", "props")
            elif name == "documents":
                tag = F.concat(F.lit(" copytag"), F.col("__cp__"))
                text = F.when(
                    F.col("text").isNull() | (F.col("__cp__") == 0),
                    F.col("text"),
                ).otherwise(F.concat(F.col("text"), tag))
                n_chars = F.when(
                    F.col("text").isNull() | (F.col("__cp__") == 0),
                    F.col("n_chars"),
                ).otherwise(F.col("n_chars") + F.length(tag))
                out = x.select(shift("doc_id"), text.alias("text"), "lang",
                               "source", n_chars.alias("n_chars"))
            elif name == "embeddings":
                # copy 0 stays bit-identical (the documents contract);
                # other copies perturb per (copy, dim)
                pert = F.transform(
                    "embedding",
                    lambda v, j: (
                        v * (1.0 + ((F.col("__cp__") * 31 + j) % 7 - 3)
                             * F.lit(0.001))
                    ).cast("float"),
                )
                emb = F.when(F.col("__cp__") == 0, F.col("embedding")).otherwise(pert)
                out = x.select(shift("vec_id"), emb.alias("embedding"),
                               "label")
            else:  # pragma: no cover — TABLES is closed
                raise ValueError(name)
            out = out.repartition(fact_partitions)
        out.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
