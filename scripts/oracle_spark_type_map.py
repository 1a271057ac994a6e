"""DIAGNOSTIC sweep (not a gate): compare every oracle's DuckDB output
schema against the Spark query's output schema, per (query, column).

int-width differences (Spark INT vs DuckDB BIGINT) are BENIGN — the
driver's hasher renders both as the same Python int (r03 stamps prove
it); the gate for genuinely hazardous types (HUGEINT/DECIMAL) lives in
testing.compare_query + test_no_forbidden_duckdb_output_types. Note
this sweep CONSTRUCTS every query DataFrame, which executes the eager
localCheckpoint training chains (PQ/IVF-PQ Lloyd, CC) — expect minutes,
not seconds. Exit code is always 0.

Run: python scripts/oracle_spark_type_map.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from energy_data_pipeline_project_spark.operators import all_oracles, all_queries
from energy_data_pipeline_project_spark.session import get_spark_session
from energy_data_pipeline_project_spark.testing import (
    duck_connection,
    duck_to_spark_type,
    oracle_output_types,
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark_session(app_name="type-map-audit", master="local[8]",
                              shuffle_partitions=8)
    con = duck_connection(sf_dir)
    queries, oracles = all_queries(), all_oracles()
    bad = 0
    try:
        for name in sorted(oracles):
            # per-query isolation (the plan_audit.py pattern): one
            # query failing to construct must not abort the sweep and
            # break the "exit code is always 0" contract (r06 review)
            try:
                duck_types = dict(oracle_output_types(con, oracles[name]))
                spark_types = {
                    f.name: f.dataType.simpleString()
                    for f in queries[name](spark, sf_dir).schema.fields
                }
            except Exception as e:  # noqa: BLE001 - diagnostic sweep
                print(f"ERROR {name}: {e!r:.300}")
                bad += 1
                continue
            for col, dt in sorted(duck_types.items()):
                mapped = duck_to_spark_type(dt)
                actual = spark_types.get(col)
                if actual is None:
                    print(f"MISSING-COL {name}.{col}")
                    bad += 1
                elif mapped != actual:
                    print(f"TYPE-DIFF {name}.{col}: duck={dt}->{mapped} spark={actual}")
                    bad += 1
    finally:
        con.close()
    print(f"done: {bad} diffs over {len(oracles)} oracles "
          "(int-width diffs are informational, not failures)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
