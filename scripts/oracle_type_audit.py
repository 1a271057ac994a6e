"""Audit every DuckDB oracle's output types.

The driver's correctness hasher is type-aware: a DuckDB HUGEINT (int128)
column from an uncast SUM(...) hash-mismatches against Spark's BIGINT even
when every value is numerically identical (see VERDICT.md round 4). This
script DESCRIBEs each oracle at sf0.001 and reports any column whose DuckDB
type has no exact Spark twin (HUGEINT/UHUGEINT/DECIMAL).

Run: python scripts/oracle_type_audit.py [sf_dir]
Exit code 1 if any offender is found.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from energy_data_pipeline_project_spark.operators import all_oracles
from energy_data_pipeline_project_spark.testing import (
    duck_connection,
    forbidden_type_columns,
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    con = duck_connection(sf_dir)
    bad = 0
    try:
        for name, sql in sorted(all_oracles().items()):
            try:
                offenders = forbidden_type_columns(con, sql)
            except Exception as exc:  # pragma: no cover - surfacing only
                print(f"ERROR {name}: {exc}")
                bad += 1
                continue
            if offenders:
                bad += 1
                print(f"HUGEINT-RISK {name}: {offenders}")
    finally:
        con.close()
    print(f"audited {len(all_oracles())} oracles, {bad} offenders")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
