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

import sys

sys.path.insert(0, ".")

from energy_data_pipeline_project_spark.operators import all_oracles
from energy_data_pipeline_project_spark.testing import (
    FORBIDDEN_DUCK_TYPES,
    duck_connection,
    oracle_output_types,
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    con = duck_connection(sf_dir)
    bad = 0
    try:
        for name, sql in sorted(all_oracles().items()):
            try:
                cols = oracle_output_types(con, sql)
            except Exception as exc:  # pragma: no cover - surfacing only
                print(f"ERROR {name}: {exc}")
                bad += 1
                continue
            offenders = [
                (c, t)
                for c, t in cols
                if any(f in t.upper() for f in FORBIDDEN_DUCK_TYPES)
            ]
            if offenders:
                bad += 1
                print(f"HUGEINT-RISK {name}: {offenders}")
    finally:
        con.close()
    print(f"audited {len(all_oracles())} oracles, {bad} offenders")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
