#!/usr/bin/env python
"""One-off fuzz HUNT over a seed range beyond the permanent gate.

The permanent gate (tests/test_fuzz_corpus.py) pins seeds 0-19 with
panels that union to the full surface once. This script explores NEW
seeds: each seed writes its deterministic adversarial corpus
(testing.write_fuzz_corpus) and runs a rotated slice of the query deck
so that, across the hunted range, every query is exercised against
several distinct corpus shapes. Findings are appended to a JSONL log
for triage; the script never stops on a failure.

Usage: python scripts/fuzz_hunt.py START END [PER_SEED] [LOG]
  e.g.  python scripts/fuzz_hunt.py 40 80 30 /tmp/fuzz_hunt.jsonl

Triage loop: fix the defect, re-run the failing (seed, query) with
  python scripts/fuzz_hunt.py SEED SEED+1 0 /dev/null QUERY...
then promote the triggering rows into write_degenerate_corpus so the
permanent waves pin it.
"""

from __future__ import annotations

import json
import os
import random
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

# Isolate the hunt's artifact store from the bench/parity lake: every
# fuzz seed is a fresh tmp corpus = a fresh fingerprint, and a 60-seed
# hunt mints far more than KEEP_FINGERPRINTS per kind — in the default
# repo store that churn evicts the sf0.1/sf0.01 fixture artifacts and
# silently turns the next bench's artifact-tier queries cold (the exact
# r10 pytest bug, via this script instead; tests/conftest.py got the
# same fixture). An explicit SPARK_GRAFT_ARTIFACTS still wins.
os.environ.setdefault(
    "SPARK_GRAFT_ARTIFACTS",
    os.path.join(_REPO, "spark-warehouse", "_artifacts_hunt"),
)

from energy_data_pipeline_project_spark.operators import all_oracles, all_queries
from energy_data_pipeline_project_spark.session import get_spark_session
from energy_data_pipeline_project_spark.testing import (
    compare_query,
    write_fuzz_corpus,
)


def main() -> int:
    start, end = int(sys.argv[1]), int(sys.argv[2])
    per_seed = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    log_path = sys.argv[4] if len(sys.argv) > 4 else "/tmp/fuzz_hunt.jsonl"
    only = sys.argv[5:]

    queries = all_queries()
    oracles = all_oracles()

    # one rotation deck, shuffled by the range start so a different
    # hunt range pairs queries with different corpus shapes than both
    # the permanent gate (seed-0 deck) and prior hunts
    deck = sorted(queries)
    random.Random(start).shuffle(deck)

    def panel(seed: int) -> list[str]:
        if only:
            return only
        lo = (seed - start) * per_seed
        fixed = [deck[i % len(deck)] for i in range(lo, lo + per_seed)]
        extras = random.Random(3000 + seed).sample(sorted(queries), 5)
        return sorted(set(fixed) | set(extras))

    spark = get_spark_session(
        app_name="fuzz-hunt", master="local[8]", shuffle_partitions=8
    )

    # density knob: more adversarial rows per table reach cap/boundary
    # interactions the default-density seeds miss
    n_extra = int(os.environ.get("FUZZ_N_EXTRA", "30"))

    n_fail = 0
    for seed in range(start, end):
        t0 = time.time()
        with tempfile.TemporaryDirectory(prefix=f"fuzz{seed}-") as d:
            write_fuzz_corpus(d, seed, n_extra=n_extra)
            fails = []
            for name in panel(seed):
                try:
                    if name not in oracles:
                        assert queries[name](spark, d).count() >= 0
                        continue
                    r = compare_query(
                        spark, d, name, queries[name], oracles[name]
                    )
                    if not r.ok:
                        fails.append((name, r.detail))
                except Exception as e:  # noqa: BLE001 — hunt, don't stop
                    fails.append((name, f"crash: {type(e).__name__}: {e}"))
            for name, detail in fails:
                n_fail += 1
                rec = {"seed": seed, "query": name, "detail": detail[:2000]}
                with open(log_path, "a") as f:
                    f.write(json.dumps(rec) + "\n")
                print(f"FAIL seed={seed} {name}: {detail[:200]}", flush=True)
        print(
            f"seed {seed} done in {time.time() - t0:.1f}s "
            f"({len(fails)} fail)",
            flush=True,
        )
    print(f"hunt complete: {n_fail} failures -> {log_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
