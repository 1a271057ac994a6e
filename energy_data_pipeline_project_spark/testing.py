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
    ])
